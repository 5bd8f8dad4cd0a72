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

    def head_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_edge", "_rk"], errors="ignore")
        g = df.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        r = g.groupby(keys, sort=False).cumcount() + 1
        out = g[r <= k]
        if rank_col is not None:
            out = out.assign(**{rank_col: r[r <= k]})
        return out

    def rank_block(df: pd.DataFrame) -> pd.DataFrame:
        """ONE call per sorted block (batch_size=None): mark edge rows
        (key equals the block's first or last key — those may straddle
        adjacent blocks) and rank the interior rows in the same call, so
        no later re-batching can ever split a group between its marking
        and its ranking (the merge_group_aggs pass-through idiom)."""
        if len(df) == 0:
            out = df.assign(_edge=pd.Series([], dtype=bool), _rk=pd.Series([], dtype="int64"))
            return out
        first = np.ones(len(df), dtype=bool)
        last = np.ones(len(df), dtype=bool)
        for c in keys:
            v = df[c].to_numpy()
            first &= v == v[0]
            last &= v == v[-1]
        edge = first | last
        interior = head_rank(df[~edge]).assign(_edge=False)
        if rank_col is None:
            interior = interior.assign(_rk=np.int64(0))
        else:
            interior = interior.rename(columns={rank_col: "_rk"})
        edges = df[edge].assign(_edge=True, _rk=np.int64(-1))
        return pd.concat([interior, edges], ignore_index=True)

    def finish_interior(df: pd.DataFrame) -> pd.DataFrame:
        out = df[~df["_edge"]].drop(columns=["_edge"])
        if rank_col is not None:
            out = out.rename(columns={"_rk": rank_col})
        else:
            out = out.drop(columns=["_rk"])
        return out

    pruned = ds.map_batches(block_prune, batch_format="pandas")
    ranked = (
        pruned.repartition(default_partitions())
        .sort(list(keys))
        .map_batches(rank_block, batch_format="pandas", batch_size=None)
        .materialize()
    )
    interior = ranked.map_batches(finish_interior, batch_format="pandas")
    edges = (
        ranked.map_batches(
            lambda df: df[df["_edge"]].drop(columns=["_rk"]),
            batch_format="pandas",
        )
        .repartition(1)
        .map_batches(head_rank, batch_format="pandas")
    )
    return interior.union(edges)
