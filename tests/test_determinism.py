"""Determinism at any parallelism (SURVEY.md §5 item (e)): the same
pipeline at block-parallelism 1 vs 8 produces identical (order-insensitive)
results — the engine's deterministic rules (F5 tie-break, edge-safe
merges, salted aggregation) must not depend on block layout."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from wikipedia_wikidata_ray.config import DEFAULT_CONFIG
from wikipedia_wikidata_ray.pipelines import geopipeline as gp
from wikipedia_wikidata_ray.sources.pages_gen import ensure_pages_parquet
from wikipedia_wikidata_ray.stages.salted import (
    merge_group_sums,
    partial_count,
    salted_count,
)

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


def _tiles_at(parallelism: int) -> pd.DataFrame:
    cfg = DEFAULT_CONFIG
    pages = rd.read_parquet(
        ensure_pages_parquet(SF), override_num_blocks=parallelism
    )
    ds = gp.tile_aggregate(
        gp.pip_join(gp.geocode(gp.extract(pages, cfg), cfg), cfg), cfg
    )
    return _canon(ds.to_pandas())


def test_flagship_block_layout_invariant(ray_session):
    pd.testing.assert_frame_equal(_tiles_at(1), _tiles_at(8))


def test_merge_group_sums_block_layout_invariant(ray_session):
    docs1 = rd.read_parquet(f"{SF}/documents.parquet", override_num_blocks=1)
    docs8 = rd.read_parquet(f"{SF}/documents.parquet", override_num_blocks=8)
    a = _canon(partial_count(docs1, ["lang"], out="n").to_pandas())
    b = _canon(partial_count(docs8, ["lang"], out="n").to_pandas())
    pd.testing.assert_frame_equal(a, b)
    # salted two-stage agrees with the plain path
    c = _canon(
        salted_count(
            docs8.map_batches(lambda t: t.select(["lang", "doc_id"]), batch_format="pyarrow"),
            ["lang"],
            salt_from="doc_id",
            fanout=8,
            out="n",
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, c)


def test_merge_num_blocks_param_invariant(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet", override_num_blocks=8)

    def counts(nmb):
        part = docs.map_batches(
            lambda t: t.group_by(["lang"]).aggregate([([], "count_all")]).rename_columns(["lang", "n"]),
            batch_format="pyarrow",
        )
        return _canon(
            merge_group_sums(part, ["lang"], ["n"], num_merge_blocks=nmb).to_pandas()
        )

    pd.testing.assert_frame_equal(counts(1), counts(13))


def test_extreme_skew_exactness(ray_session):
    """I7: one key holding 99% of rows — partial combine and explicit
    salting both stay exact (the megacity/hot-title regime)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    n = 50_000
    keys = np.where(np.arange(n) % 100 == 0, np.arange(n) % 7, -1)  # 99% key=-1
    tables = [
        pa.table({"k": keys[s: s + 5000], "rid": np.arange(s, min(s + 5000, n))})
        for s in range(0, n, 5000)
    ]
    ds = rd.from_arrow(tables)
    got = _canon(partial_count(ds, ["k"], out="n").to_pandas())
    import pandas as pd

    want = _canon(
        pd.DataFrame({"k": keys}).groupby("k").size().rename("n").reset_index()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got_salted = _canon(
        salted_count(ds, ["k"], salt_from="rid", fanout=16, out="n").to_pandas()
    )
    pd.testing.assert_frame_equal(got_salted, want, check_dtype=False)


def test_ivf_recall_vs_exact(ray_session):
    """Scale-path quality evidence: IVF (nprobe=4/16 centroids) recall@5
    against the exact brute-force neighbors."""
    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        TRAININGDATA_QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    exact = TRAININGDATA_QUERIES["ann_topk"](sf).to_pandas()
    approx = TRAININGDATA_QUERIES["ann_topk_ivf"](sf).to_pandas()
    e = exact.groupby("vec_id")["neighbor_id"].apply(set)
    a = approx.groupby("vec_id")["neighbor_id"].apply(set)
    recalls = [
        len(e[q] & a.get(q, set())) / len(e[q]) for q in e.index
    ]
    import numpy as np

    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.6, mean_recall  # approximate, but not junk
    # determinism: same run twice → identical output
    approx2 = TRAININGDATA_QUERIES["ann_topk_ivf"](sf).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        approx.sort_values(["vec_id", "rank"], ignore_index=True),
        approx2.sort_values(["vec_id", "rank"], ignore_index=True),
    )


def test_ivf_partitioned_matches_broadcast(ray_session):
    """The sharded-index IVF (candidates partitioned by centroid bucket,
    queries routed by equality shuffle) returns exactly the broadcast
    IVF's rows — same centroids (corpus < fit_sample), same probe sets,
    same tie-breaks — at any parallelism."""
    import pandas as pd

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        TRAININGDATA_QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    broadcast = TRAININGDATA_QUERIES["ann_topk_ivf"](sf).to_pandas()
    sharded = TRAININGDATA_QUERIES["ann_topk_ivf_partitioned"](sf).to_pandas()
    canon = lambda df: df.sort_values(
        ["vec_id", "rank"], ignore_index=True
    ).astype({"rank": "int32"})
    pd.testing.assert_frame_equal(canon(broadcast), canon(sharded))


def test_blocked_neardups_match_broadcast(ray_session):
    """The blocked all-pairs near-dup path (no broadcast matrix) finds
    exactly the broadcast variant's pair set."""
    import pandas as pd

    from wikipedia_wikidata_ray.pipelines.trainingdata import (
        TRAININGDATA_QUERIES,
    )

    sf = "/root/testdata/sf0.001"
    a = TRAININGDATA_QUERIES["embedding_neardups"](sf).to_pandas()
    b = TRAININGDATA_QUERIES["embedding_neardups_blocked"](sf).to_pandas()
    canon = lambda df: df.sort_values(["vec_a", "vec_b"], ignore_index=True)
    pd.testing.assert_frame_equal(canon(a), canon(b))
