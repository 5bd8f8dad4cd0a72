"""Bloom-filter semi-join prefilter (ops/bloom.py): the no-false-negative
property that makes the bloom-join plan correct by construction, the
false-positive bound that makes it worth running, and plan equality
between the gated verify paths (broadcast exact set vs hash join)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_fp_bound():
    from wikipedia_wikidata_ray.ops.bloom import (
        bloom_contains, bloom_log2m, bloom_set_bits)

    rng = np.random.default_rng(7)
    members = rng.choice(10_000_000, size=20_000, replace=False).astype(
        np.int64
    )
    log2m = bloom_log2m(len(members), bits_per_key=16)
    k = 6
    words = np.zeros((1 << log2m) >> 6, dtype=np.uint64)
    bloom_set_bits(members, words, log2m, k)

    # every inserted key answers True — the correctness invariant the
    # downstream exact-verify step relies on
    assert bloom_contains(members, words, log2m, k).all()

    # absent keys answer True at ~(1 - e^{-kn/m})^k ≈ 0.05% for these
    # parameters; assert a generous 10× ceiling
    absent = (rng.choice(10_000_000, size=50_000, replace=False)
              .astype(np.int64) + 10_000_000)
    fp = bloom_contains(absent, words, log2m, k).mean()
    assert fp < 0.005, fp


def test_bloom_empty_and_singleton():
    from wikipedia_wikidata_ray.ops.bloom import bloom_contains

    words = np.zeros(4, dtype=np.uint64)
    assert bloom_contains(np.array([], dtype=np.int64), words, 8, 4).shape == (0,)
    assert not bloom_contains(np.array([42], dtype=np.int64), words, 8, 4)[0]


def test_bloom_semijoin_plans_equal(ray_session):
    """Broadcast-verify plan == forced hash-join-verify plan, and the
    result equals the direct (no-bloom) semi-join — the bloom only drops
    rows the verify would drop anyway."""
    import pyarrow.compute as pc
    import ray.data as rd

    from wikipedia_wikidata_ray.pipelines.relational import (
        q_bloom_semijoin_revenue)

    def sdf(ds) -> pd.DataFrame:
        df = ds.to_pandas()
        return df[sorted(df.columns)].sort_values(
            sorted(df.columns), ignore_index=True)

    got = sdf(q_bloom_semijoin_revenue(SF_DIR))
    forced = sdf(q_bloom_semijoin_revenue(SF_DIR, verify_broadcast_limit=0))
    pd.testing.assert_frame_equal(got, forced)

    # direct exact semi-join, no bloom anywhere
    import pyarrow as pa

    cust = rd.read_parquet(f"{SF_DIR}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    keys = pa.concat_tables(
        [b for b in cust.iter_batches(batch_format="pyarrow")]
    )
    keys = keys.filter(
        pc.equal(keys["c_mktsegment"], pa.scalar("BUILDING"))
    ).column("c_custkey").combine_chunks()
    orders = rd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    ).map_batches(
        lambda t: t.filter(pc.is_in(t["o_custkey"], value_set=keys)),
        batch_format="pyarrow",
    ).to_pandas()
    want = (
        orders.assign(
            total_cents=(orders.o_totalprice * 100.0).round().astype("int64"),
            n_orders=1,
        )
        .groupby("o_orderpriority", as_index=False)
        .agg(n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
    )
    want = want[sorted(want.columns)].sort_values(
        sorted(want.columns), ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fk_orphan_audit_plans_equal_and_orphans_found(ray_session):
    """Broadcast is_in plan == forced left_anti-join plan; the
    events→customer relation has a NONZERO orphan count (user_id 0) so
    the orphan branch is actually exercised; the real FK relations are
    clean."""
    from wikipedia_wikidata_ray.pipelines.profiling import q_fk_orphan_audit

    def sdf(ds):
        df = ds.to_pandas()
        return df.sort_values("relation", ignore_index=True)

    got = sdf(q_fk_orphan_audit("/root/testdata/sf0.001"))
    forced = sdf(
        q_fk_orphan_audit("/root/testdata/sf0.001",
                          parent_broadcast_limit=0)
    )
    pd.testing.assert_frame_equal(got, forced)

    by_rel = got.set_index("relation")
    assert by_rel.loc[
        "events.user_id->customer.c_custkey", "n_orphans"] > 0
    assert by_rel.loc[
        "orders.o_custkey->customer.c_custkey", "n_orphans"] == 0
    assert by_rel.loc[
        "lineitem.l_orderkey->orders.o_orderkey", "n_orphans"] == 0
    assert (by_rel.n_child > 0).all()


def test_column_stats_matches_pandas(ray_session):
    """Every profiled column's stats equal a pandas recomputation."""
    import pyarrow.parquet as pq

    from wikipedia_wikidata_ray.pipelines.profiling import (
        PROFILE_COLUMNS, q_column_stats)

    got = q_column_stats("/root/testdata/sf0.001").to_pandas()
    assert len(got) == len(PROFILE_COLUMNS)
    for tbl, col in PROFILE_COLUMNS:
        s = pq.read_table(
            f"/root/testdata/sf0.001/{tbl}.parquet", columns=[col]
        ).to_pandas()[col]
        r = got[(got.tbl == tbl) & (got.col == col)].iloc[0]
        assert r.n_rows == len(s)
        assert r.n_nulls == s.isna().sum()
        assert r.n_distinct == s.dropna().nunique()
        assert r.min_val == s.dropna().min()
        assert r.max_val == s.dropna().max()
