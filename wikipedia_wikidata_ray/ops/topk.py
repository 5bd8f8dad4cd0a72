"""Exact distributed per-group top-k (the window-function ROW_NUMBER()
... WHERE rn <= k pattern, reference analog: the reference's psql
DISTINCT ON / LIMIT idioms generalized to k > 1).

Shape: a combiner stage bounds what the shuffle moves — within each input
block, at most k rows per group survive (vectorized pandas sort +
groupby.head, no Python row loop), so the per-group shuffle traffic is
≤ k rows per group per block regardless of group size; the final
per-group head(k) then runs over that shrunk set. Same partial-combine
argument as stages/salted.py: head-k under a total order is idempotent
and associative, so block-local pre-pruning is exact.

Determinism requirement: ``order_by`` must be a TOTAL order within each
group (append a unique tie-break column, e.g. the primary key).
"""

from __future__ import annotations

import pandas as pd
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

    def block_prune(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return (
            df.sort_values(by, ascending=asc, kind="mergesort")
            .groupby(keys, sort=False, as_index=False)
            .head(k)
        )

    def final_head(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(by, ascending=asc, kind="mergesort").head(k)
        if rank_col is not None:
            out = out.assign(**{rank_col: range(1, len(out) + 1)})
        return out

    pruned = ds.map_batches(block_prune, batch_format="pandas")
    return pruned.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        final_head, batch_format="pandas"
    )
