"""Exact distributed per-group top-k (the window-function ROW_NUMBER()
... WHERE rn <= k pattern, reference analog: the reference's psql
DISTINCT ON / LIMIT idioms generalized to k > 1).

Shape: a combiner stage bounds what the shuffle moves — within each input
block, at most k rows per group survive (vectorized pandas sort +
groupby.head, no Python row loop), so the per-group shuffle traffic is
≤ k rows per group per block regardless of group size; the final
per-group head(k) then runs on ONE range-partitioned sort with
per-block vectorized run processing + edge fixup (the
stages/salted.merge_group_aggs / ops/dedup._lsh_bucket_pairs pattern) —
NOT ``groupby().map_groups``: Ray's per-group pandas dispatch dominates
when groups are tiny (measured 6.3× on the LSH path; same effect here at
50 K doc groups). A group can straddle only ADJACENT sorted blocks, so
rows whose key equals a block's first or last key are re-ranked once in
a single coalesced edge block; a group that outgrows a block is entirely
edge-marked, so the fixup stays exact at any group size.

Determinism requirements: ``order_by`` must be a TOTAL order within each
group (append a unique tie-break column, e.g. the primary key), and the
``keys`` columns must be non-null (Ray's range sort rejects null keys —
route null-keyed groups through merge_group_aggs-style null lifting if
one ever appears).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..stages.salted import default_partitions


def grouped_topk(
    ds: Dataset,
    keys: list[str],
    order_by: list[tuple[str, bool]],
    k: int,
    rank_col: str | None = None,
) -> Dataset:
    """Keep the top ``k`` rows of each ``keys`` group under ``order_by``
    (list of ``(column, ascending)``), optionally emitting a 1-based
    ``rank_col``. Exact at any parallelism."""
    by = [c for c, _ in order_by]
    asc = [a for _, a in order_by]
    sort_cols = list(keys) + by
    sort_asc = [True] * len(keys) + asc

    def block_prune(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return (
            df.sort_values(by, ascending=asc, kind="mergesort")
            .groupby(keys, sort=False, as_index=False)
            .head(k)
        )

    def mark(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("_edge", pa.array([], type=pa.bool_()))
        first = np.ones(len(t), dtype=bool)
        last = np.ones(len(t), dtype=bool)
        for c in keys:
            v = t[c].to_numpy(zero_copy_only=False)
            first &= v == v[0]
            last &= v == v[-1]
        return t.append_column("_edge", pa.array(first | last))

    def head_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_edge"], errors="ignore")
        g = df.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        r = g.groupby(keys, sort=False).cumcount() + 1
        out = g[r <= k]
        if rank_col is not None:
            out = out.assign(**{rank_col: r[r <= k]})
        return out

    pruned = ds.map_batches(block_prune, batch_format="pandas")
    marked = (
        pruned.repartition(default_partitions())
        .sort(list(keys))
        .map_batches(mark, batch_format="pyarrow")
        .materialize()
    )
    interior = marked.map_batches(
        lambda t: t.filter(pa.compute.invert(t["_edge"])),
        batch_format="pyarrow",
    ).map_batches(head_rank, batch_format="pandas")
    edges = (
        marked.map_batches(
            lambda t: t.filter(t["_edge"]), batch_format="pyarrow"
        )
        .repartition(1)
        .map_batches(head_rank, batch_format="pandas")
    )
    return interior.union(edges)
