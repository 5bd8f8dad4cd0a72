"""Skew-aware aggregation (SURVEY.md §2.I7 hot-cell salting + §4 skew).

Two exact strategies for counts/sums over skewed keys (megacity tiles, the
"United States"-style hot link targets):

- ``partial_count`` / ``partial_sum``: combiner-style pre-aggregation —
  each ``map_batches`` call collapses its batch to one row per key
  (pyarrow ``Table.group_by``), so the all-to-all shuffle moves at most
  ``n_batches`` rows per key regardless of skew. This is the default for
  algebraic aggregates.
- ``salted_count``: explicit salting — append ``_salt = hash(key) %
  fanout``, aggregate by ``keys + _salt`` (hot key split across ``fanout``
  reducers), then a second tiny aggregate merges salt shards. Needed when
  the per-group computation cannot pre-combine (e.g. ``map_groups`` over
  full groups).

Both are provably exact for commutative/associative aggregates (the same
argument that validates re-shaping the reference's 1521 accumulating
UPDATEs, steps/wikipedia_process.sh:58-68, into one grouped sum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _partial_count_batch(keys: list[str], out: str):
    def fn(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + [out])

    return fn


def _partial_sum_batch(keys: list[str], col: str, out: str):
    def fn(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate([(col, "sum")])
        return g.rename_columns(keys + [out])

    return fn


def merge_group_aggs(
    partials: Dataset,
    keys: list[str],
    agg_spec: list[tuple[str, str]],
    num_merge_blocks: int | None = None,
) -> Dataset:
    """Exact distributed merge of per-batch partial aggregates, built ONLY
    on Dataset primitives (``sort`` + ``map_batches`` + tiny ``union``).

    ``agg_spec`` is ``[(col, fn), ...]`` with ``fn`` ∈ {"sum", "min",
    "max"} — any commutative/associative combine the pyarrow group_by
    kernel supports. ``merge_group_sums`` is the all-sums wrapper.

    Why not ``groupby().aggregate(Sum)``: Ray Data's aggregate pays a large
    per-block fixed cost in its shuffle (measured 6-7 s for a 400 K-row
    merge that this path does in ~1.5 s; polars range-partitioned sort is
    the fast primitive). Algorithm:

    0. coalesce the many tiny per-batch partial blocks into
       ``num_merge_blocks`` (default ≈ cluster CPUs, floor 4) — sort cost
       scales with block COUNT, and partials are far smaller than the
       input they summarize;
    1. range-partitioned global ``sort(keys)`` — equal keys land in the
       same or adjacent blocks;
    2. per sorted block, vectorized ``Table.group_by`` combine; rows whose
       key equals the block's first or last key are marked ``_edge`` (a key
       can only straddle *adjacent* block boundaries after a sort);
    3. the ≤ ``2·n_blocks`` edge rows are coalesced to one block and
       combined once more; interior rows pass through untouched.

    Exact for commutative/associative aggregates at any parallelism; every
    stage is retryable (no side-state), streaming, and shuffle-count = 1.
    """
    agg_cols = [c for c, _ in agg_spec]

    # Ray's sort cannot range-partition on columns containing nulls (its
    # boundary search compares None with values). Sort on derived null-safe
    # pairs (__v = validity as int8, __s = null-filled copy) — a function
    # of the key, so equal keys stay contiguous — and group on the
    # original (nullable) keys.
    vcols = [f"__v{i}" for i in range(len(keys))]
    scols = [f"__s{i}" for i in range(len(keys))]
    sort_cols = [c for pair in zip(vcols, scols) for c in pair]

    def presort(t: pa.Table) -> pa.Table:
        for i, k in enumerate(keys):
            c = t[k]
            if pa.types.is_null(c.type):
                raise TypeError(
                    f"merge_group_sums: key column {k!r} has untyped null "
                    "Arrow type (usually an all-null block inferred from "
                    "pandas) — declare an explicit schema upstream"
                )
            t = t.append_column(vcols[i], pc.cast(pc.is_valid(c), pa.int8()))
            fill = pa.scalar("", type=c.type) if pa.types.is_string(c.type) or pa.types.is_large_string(c.type) else pa.scalar(0, type=c.type)
            t = t.append_column(scols[i], pc.fill_null(c, fill))
        return t

    def combine_mark(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    **{k: t[k] for k in keys},
                    **{c: t[c] for c in agg_cols},
                    "_edge": pa.array([], type=pa.bool_()),
                }
            )
        g = t.group_by(keys).aggregate(agg_spec)
        g = g.rename_columns(keys + agg_cols)
        first_last = t.select(keys).take([0, len(t) - 1])
        edge = np.zeros(len(g), dtype=bool)
        for j in range(2):
            m = np.ones(len(g), dtype=bool)
            for k in keys:
                s = first_last[k][j]
                if not s.is_valid:  # null key groups compare null-safe
                    eq = pc.is_null(g[k])
                else:
                    eq = pc.fill_null(pc.equal(g[k], s), False)
                m &= eq.to_numpy(zero_copy_only=False)
            edge |= m
        return g.append_column("_edge", pa.array(edge))

    def combine_edges(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(agg_spec)
        return g.rename_columns(keys + agg_cols)

    if num_merge_blocks is None:
        try:
            import ray

            num_merge_blocks = max(4, int(ray.cluster_resources().get("CPU", 16)) // 4)
        except Exception:
            num_merge_blocks = 8
    marked = (
        partials.map_batches(presort, batch_format="pyarrow")
        .repartition(num_merge_blocks)
        .sort(sort_cols)
        .map_batches(combine_mark, batch_format="pyarrow")
        .materialize()
    )
    interior = marked.map_batches(
        lambda t: t.filter(pc.invert(t["_edge"])).drop_columns(["_edge"]),
        batch_format="pyarrow",
    )
    edges = marked.map_batches(
        lambda t: t.filter(t["_edge"]).drop_columns(["_edge"]),
        batch_format="pyarrow",
    ).repartition(1).map_batches(combine_edges, batch_format="pyarrow")
    return interior.union(edges)


def merge_group_sums(
    partials: Dataset,
    keys: list[str],
    sum_cols: list[str],
    num_merge_blocks: int | None = None,
) -> Dataset:
    """All-sums merge (see merge_group_aggs for the algorithm)."""
    return merge_group_aggs(
        partials, keys, [(c, "sum") for c in sum_cols], num_merge_blocks
    )


def partial_count(ds: Dataset, keys: list[str], out: str = "count") -> Dataset:
    """count(*) per key with per-batch combining; one shuffle over partials."""
    partial = ds.map_batches(_partial_count_batch(keys, out), batch_format="pyarrow")
    return merge_group_sums(partial, keys, [out])


def partial_sum(ds: Dataset, keys: list[str], col: str, out: str | None = None) -> Dataset:
    out = out or f"sum_{col}"
    partial = ds.map_batches(_partial_sum_batch(keys, col, out), batch_format="pyarrow")
    return merge_group_sums(partial, keys, [out])


def add_salt(ds: Dataset, salt_from: str, fanout: int, col: str = "_salt") -> Dataset:
    """Deterministic salt column: spreads one hot key over ``fanout``
    sub-keys. ``salt_from`` must be a high-cardinality column (e.g. the row
    id), NOT the hot key itself."""

    def fn(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(salt_from).to_numpy(zero_copy_only=False), dtype=np.int64)
        salt = ((v * np.int64(2654435761)) & np.int64((1 << 31) - 1)) % fanout
        return batch.append_column(col, pa.array(salt.astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def salted_count(ds: Dataset, keys: list[str], salt_from: str, fanout: int = 16, out: str = "count") -> Dataset:
    """Two-stage explicitly-salted count(*): groupby(keys+salt) → merge.

    Count is expressed as Sum of ones so both stages use the same algebraic
    aggregate (stable arrow types across ray versions)."""

    salted = add_salt(ds, salt_from, fanout)
    stage1 = partial_count(salted, keys + ["_salt"], out=out)
    return merge_group_sums(
        stage1.drop_columns(["_salt"]), keys, [out]
    )


def join_partitions(n_rows: int, rows_per_partition: int = 100_000,
                    lo: int = 2) -> int:
    """Partition count for Ray hash joins sized to DATA, not cluster
    width: Ray's join spawns per-partition shuffle actors whose fixed
    cost dominates small joins (measured on a 250K-pair × 50K-doc join:
    16 partitions = 21 s, 32 partitions = 58 s / 172 worker processes,
    4 partitions = 2 s). Grows linearly with the known row count and is
    capped at 4× cluster CPUs so huge joins still fan out."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    need = max(lo, n_rows // rows_per_partition + 1)
    return min(need, max(4, cpus * 4))


def default_partitions(lo: int = 2, hi: int = 16) -> int:
    """Shuffle/join partition count scaled to the session: cpus // 2
    clamped to [lo, hi]. Small sessions (4-CPU test fixtures) deadlocked
    with fixed large partition counts — every wide op should size itself
    from the cluster, never a constant."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(hi, cpus // 2))
