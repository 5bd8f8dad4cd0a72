"""Catalog profiling operators — the ANALYZE / data-quality layer every
engine ships: per-column statistics (the optimizer-stats primitive that
decides this repo's own broadcast-vs-join gates) and referential-
integrity audits across the star schema.

Scale notes are per-op; both keep raw rows where they are and move only
value-level or single-row partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from ..stages.salted import default_partitions, merge_group_sums

# ---------------------------------------------------------------------------
# Q: column_stats — exact per-column statistics (row count, null count,
# distinct count, lexicographic min/max) for the catalog's LOW-
# CARDINALITY string columns — the stats a planner's broadcast-vs-
# shuffle gates consume. Exactness is affordable because every profiled
# column is categorical BY SCHEMA (segments, priorities, flags, langs);
# for high-cardinality columns the same plan ships with the distinct
# piece on the HLL sketch (ops/sketch.py:138) instead — named fallback,
# not implemented here because exactness is the point of this op.
# Plan: per-batch VALUE-LEVEL partials ((table, column, value) → count,
# ≤ cardinality rows per batch regardless of batch size) → ONE null-safe
# combiner merge → a single-block finalize over the Σ-cardinality-
# bounded merged table. Raw rows never move; no driver pull.

PROFILE_COLUMNS = [
    ("documents", "lang"),
    ("documents", "source"),
    ("events", "event_type"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("customer", "c_mktsegment"),
]


def _branch_blocks(n_branches: int) -> int:
    """Per-branch read parallelism for multi-branch union plans: Ray's
    default splits EVERY tiny read to ~CPU blocks, so an 8-branch union
    feeds 8×64 micro-blocks into the one merge sort (measured 17 s of
    pure task overhead at sf0.1). Cap so the UNION totals ≈ cluster
    CPUs; at real scale per-file parallelism reappears naturally."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, cpus // max(1, n_branches))


def q_column_stats(sf_dir: str) -> Dataset:
    parts = []
    nb = _branch_blocks(len(PROFILE_COLUMNS))
    for tbl, col in PROFILE_COLUMNS:
        ds = rd.read_parquet(
            f"{sf_dir}/{tbl}.parquet", columns=[col], override_num_blocks=nb
        )

        def value_partial(t: pa.Table, _tbl=tbl, _col=col) -> pa.Table:
            g = pa.table({"val": t[_col]}).group_by(["val"]).aggregate(
                [([], "count_all")]
            )
            g = g.rename_columns(["val", "cnt"])
            n = len(g)
            return pa.table(
                {
                    "tbl": pa.array([_tbl] * n, type=pa.string()),
                    "col": pa.array([_col] * n, type=pa.string()),
                    "val": pc.cast(g["val"], pa.string()),
                    "cnt": pc.cast(g["cnt"], pa.int64()),
                }
            )

        parts.append(ds.map_batches(value_partial, batch_format="pyarrow"))

    union = parts[0]
    for p in parts[1:]:
        union = union.union(p)
    merged = merge_group_sums(union, ["tbl", "col", "val"], ["cnt"])

    def finalize(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        rows = []
        for (tbl, col), g in df.groupby(["tbl", "col"], sort=True):
            nn = g[g.val.isna()]["cnt"].sum()
            vals = g[g.val.notna()]
            rows.append(
                {
                    "tbl": tbl,
                    "col": col,
                    "n_rows": int(g.cnt.sum()),
                    "n_nulls": int(nn),
                    "n_distinct": int(len(vals)),
                    "min_val": vals.val.min() if len(vals) else None,
                    "max_val": vals.val.max() if len(vals) else None,
                }
            )
        out = pd.DataFrame(rows)
        return pa.Table.from_pandas(out, preserve_index=False)

    # Σ-cardinality-bounded single-block finalize (a handful of rows per
    # profiled column — pandas here is fine, it is not a hot path)
    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


SQL_COLUMN_STATS = "\nUNION ALL\n".join(
    f"""SELECT '{tbl}' AS tbl, '{col}' AS col,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
       MIN({col}) AS min_val, MAX({col}) AS max_val
FROM {tbl}"""
    for tbl, col in PROFILE_COLUMNS
)


# ---------------------------------------------------------------------------
# Q: fk_orphan_audit — referential-integrity audit over the star schema:
# for each declared child→parent relation, the child row count and the
# number of ORPHANS (child keys with no parent row) — the data-quality
# gate a 100-TB ingest runs before trusting its joins. The driver's
# fixtures are fully FK-consistent, so the events relation audits an
# AUGMENTED child (every event_id % 97 == 0 row re-emitted with
# user_id + 10,000,000 — a closed-form corruption layer mirrored
# exactly in the oracle SQL, the house `_augmented_docs` convention,
# trainingdata.py:53) so the orphan branch is exercised with a nonzero
# count instead of a vacuously-green zero.
# Plan per relation, gated on parent size: ≤ limit → the parent key set
# broadcasts once (ray.put) and a vectorized pc.is_in probe counts
# orphans per batch (single-row partials, one tiny merge); above →
# a left_anti hash join counts survivors (both sides shuffle once) —
# plan-equality pytest with the limit forced to 0.

# (child, key, parent, parent_key, augment) — augment=True re-emits
# every event_id % 97 == 0 row with user_id + 10_000_000 (see docstring)
FK_RELATIONS = [
    ("orders", "o_custkey", "customer", "c_custkey", False),
    ("lineitem", "l_orderkey", "orders", "o_orderkey", False),
    ("embeddings", "vec_id", "documents", "doc_id", False),
    ("events", "user_id", "customer", "c_custkey", True),
]

FK_BROADCAST_LIMIT = 20_000_000

_AUG_MOD = 97
_AUG_SHIFT = 10_000_000


def _augment_child(t: pa.Table, key: str) -> pa.Table:
    eid = t.column("event_id").to_numpy(zero_copy_only=False)
    bad_keys = (
        t.column(key).to_numpy(zero_copy_only=False)[eid % _AUG_MOD == 0]
        .astype(np.int64) + _AUG_SHIFT
    )
    return pa.concat_tables(
        [
            pa.table({key: pc.cast(t[key], pa.int64())}),
            pa.table({key: pa.array(bad_keys, type=pa.int64())}),
        ]
    )


def q_fk_orphan_audit(
    sf_dir: str, parent_broadcast_limit: int | None = None
) -> Dataset:
    import ray

    if parent_broadcast_limit is None:
        parent_broadcast_limit = FK_BROADCAST_LIMIT

    outs = []
    for child_tbl, child_key, parent_tbl, parent_key, augment in FK_RELATIONS:
        rel = f"{child_tbl}.{child_key}->{parent_tbl}.{parent_key}"
        cols = [child_key, "event_id"] if augment else [child_key]
        child = rd.read_parquet(
            f"{sf_dir}/{child_tbl}.parquet", columns=cols
        )
        if augment:
            child = child.map_batches(
                lambda t, _k=child_key: _augment_child(t, _k),
                batch_format="pyarrow",
            )
        # parent cardinality from the parquet FOOTER (zero-pass — the
        # footer-stats house pattern); a stats-free source would fall
        # back to a count() pass
        import pyarrow.parquet as pq

        n_parent = pq.read_metadata(
            f"{sf_dir}/{parent_tbl}.parquet"
        ).num_rows

        if n_parent <= parent_broadcast_limit:
            # bounded-by-the-gate driver column read (≤ limit keys by
            # construction), broadcast once
            keys = pq.read_table(
                f"{sf_dir}/{parent_tbl}.parquet", columns=[parent_key]
            ).column(parent_key).combine_chunks()
            keys_ref = ray.put(pc.cast(keys, pa.int64()))

            def orphan_partial(
                t: pa.Table, _rel=rel, _ck=child_key, _ref=keys_ref
            ) -> pa.Table:
                ks = ray.get(_ref)
                hit = pc.is_in(pc.cast(t[_ck], pa.int64()), value_set=ks)
                n = len(t)
                n_orph = n - pc.sum(pc.cast(hit, pa.int64())).as_py()
                return pa.table(
                    {
                        "relation": pa.array([_rel], type=pa.string()),
                        "n_child": pa.array([n], type=pa.int64()),
                        "n_orphans": pa.array([n_orph], type=pa.int64()),
                    }
                )

            outs.append(
                child.map_batches(orphan_partial, batch_format="pyarrow")
            )
        else:
            # >limit plan: child ∖ parent via left_anti hash join; the
            # orphan count partials from the join survivors
            def key_cast(t: pa.Table, _ck=child_key) -> pa.Table:
                return pa.table({_ck: pc.cast(t[_ck], pa.int64())})

            def pkey_cast(t: pa.Table, _pk=parent_key) -> pa.Table:
                return pa.table({_pk: pc.cast(t[_pk], pa.int64())})

            parent = rd.read_parquet(
                f"{sf_dir}/{parent_tbl}.parquet", columns=[parent_key]
            )
            n_child_total = child.count()
            orphans = child.map_batches(
                key_cast, batch_format="pyarrow"
            ).join(
                parent.map_batches(pkey_cast, batch_format="pyarrow"),
                "left_anti",
                num_partitions=default_partitions(),
                on=(child_key,),
                right_on=(parent_key,),
            )
            n_orph_total = orphans.count()
            outs.append(
                rd.from_arrow(
                    pa.table(
                        {
                            "relation": pa.array([rel], type=pa.string()),
                            "n_child": pa.array(
                                [n_child_total], type=pa.int64()
                            ),
                            "n_orphans": pa.array(
                                [n_orph_total], type=pa.int64()
                            ),
                        }
                    )
                )
            )

    union = outs[0]
    for o in outs[1:]:
        union = union.union(o)
    return merge_group_sums(union, ["relation"], ["n_child", "n_orphans"])


SQL_FK_ORPHAN_AUDIT = "\nUNION ALL\n".join(
    f"""SELECT '{ct}.{ck}->{pt}.{pk}' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN {ck} IN (SELECT {pk} FROM {pt})
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_orphans
FROM {'(SELECT user_id AS ' + ck + ' FROM events UNION ALL '
      'SELECT user_id + ' + str(_AUG_SHIFT) + ' FROM events '
      'WHERE event_id % ' + str(_AUG_MOD) + ' = 0)' if aug else ct}"""
    for ct, ck, pt, pk, aug in FK_RELATIONS
)


PROFILING_QUERIES = {
    "column_stats": q_column_stats,
    "fk_orphan_audit": q_fk_orphan_audit,
}

PROFILING_ORACLES = {
    "column_stats": SQL_COLUMN_STATS,
    "fk_orphan_audit": SQL_FK_ORPHAN_AUDIT,
}


# ---------------------------------------------------------------------------
# Q: numeric_column_stats — the numeric half of the ANALYZE layer:
# exact (n_rows, n_nulls, min, max, sum) for the catalog's measure
# columns. Money/ratio doubles are exact at 2 dp in this schema, so
# sums ride the integer-cents rule (×100 → int64 — order-free at any
# parallelism, the house float policy); int64 columns sum natively.
# min/max published ×100 too so every output cell is exact int64.
# Plan: single-row partials per batch (5 int64 cells each) → one
# null-safe combined merge per column → union. Raw rows never move.

NUMERIC_PROFILE_COLUMNS = [
    ("orders", "o_totalprice", True),
    ("lineitem", "l_quantity", True),
    ("lineitem", "l_extendedprice", True),
    ("customer", "c_acctbal", True),
    ("events", "value", True),
    ("documents", "n_chars", False),
]


def q_numeric_column_stats(sf_dir: str) -> Dataset:
    from ..stages.salted import merge_group_aggs

    parts = []
    nb = _branch_blocks(len(NUMERIC_PROFILE_COLUMNS))
    for tbl, col, is_money in NUMERIC_PROFILE_COLUMNS:
        ds = rd.read_parquet(
            f"{sf_dir}/{tbl}.parquet", columns=[col], override_num_blocks=nb
        )

        def one(t: pa.Table, _t=tbl, _c=col, _m=is_money) -> pa.Table:
            v = t[_c]
            nn = len(t) - pc.sum(
                pc.cast(pc.is_valid(v), pa.int64())
            ).as_py()
            if _m:
                iv = pc.cast(
                    pc.round(pc.multiply(pc.cast(v, pa.float64()),
                                         pa.scalar(100.0))),
                    pa.int64(),
                )
            else:
                iv = pc.cast(v, pa.int64())
            return pa.table(
                {
                    "tbl": pa.array([_t], type=pa.string()),
                    "col": pa.array([_c], type=pa.string()),
                    "n_rows": pa.array([len(t)], type=pa.int64()),
                    "n_nulls": pa.array([nn], type=pa.int64()),
                    "min_e2": pa.array(
                        [pc.min(iv).as_py()], type=pa.int64()
                    ),
                    "max_e2": pa.array(
                        [pc.max(iv).as_py()], type=pa.int64()
                    ),
                    "sum_e2": pa.array(
                        [pc.sum(iv).as_py() or 0], type=pa.int64()
                    ),
                }
            )

        parts.append(ds.map_batches(one, batch_format="pyarrow"))

    union = parts[0]
    for p in parts[1:]:
        union = union.union(p)
    return merge_group_aggs(
        union,
        ["tbl", "col"],
        [("n_rows", "sum"), ("n_nulls", "sum"), ("min_e2", "min"),
         ("max_e2", "max"), ("sum_e2", "sum")],
    )


SQL_NUMERIC_COLUMN_STATS = "\nUNION ALL\n".join(
    f"""SELECT '{tbl}' AS tbl, '{col}' AS col,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nulls,
       CAST(MIN({expr}) AS BIGINT) AS min_e2,
       CAST(MAX({expr}) AS BIGINT) AS max_e2,
       CAST(SUM({expr}) AS BIGINT) AS sum_e2
FROM {tbl}"""
    for tbl, col, money in NUMERIC_PROFILE_COLUMNS
    for expr in [
        f"CAST(ROUND({col} * 100.0, 0) AS BIGINT)" if money
        else f"CAST({col} AS BIGINT)"
    ]
)

PROFILING_QUERIES["numeric_column_stats"] = q_numeric_column_stats
PROFILING_ORACLES["numeric_column_stats"] = SQL_NUMERIC_COLUMN_STATS
