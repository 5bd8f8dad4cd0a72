"""Shared sorted-run group processing — the engine's signature idiom
(stages/salted.merge_group_aggs, ops/topk.grouped_topk,
ops/dedup._lsh_bucket_pairs all instantiate it by hand; this is the
generic form the round-2 verdict asked sessionize / as-of / range join to
move onto).

Why not ``groupby(key).map_groups``: Ray's per-group pandas dispatch
dominates when groups are MANY and TINY (measured 6.3× on LSH pairs,
6.1× on TF-IDF top-k at ~10⁵ groups; CLAUDE.md rule). At web scale the
keys here are users — hundreds of millions of tiny groups.

Shape: ONE range-partitioned sort on the group keys, then each sorted
block is processed in a single vectorized call over all its COMPLETE
groups. A group can straddle only ADJACENT sorted blocks, so rows whose
key equals a block's first or last key are routed to one coalesced edge
block and processed there by the same function — exact at any
parallelism and any group size (a group larger than a block is entirely
edge-marked).

Consistency note (the ops/topk.py round-2 advice): the edge mask is a
PURE function of each raw sorted block (first/last key equality), and
both consumers read the SAME materialized blocks with
``batch_size=None``, so any hypothetical re-blocking changes interior
and edge membership consistently — a group split across fragments
becomes entirely edge-marked, never half-processed.

Requirements: key columns must be non-null (Ray's range sort rejects
null keys — lift nulls first as merge_group_aggs does) and ``block_fn``
must be vectorized across groups, tolerate arbitrary intra-group row
order (sort inside), and return its output schema for empty input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _edge_mask(t: pa.Table, keys: list[str]) -> np.ndarray:
    first = np.ones(len(t), dtype=bool)
    last = np.ones(len(t), dtype=bool)
    for c in keys:
        v = t[c].to_numpy(zero_copy_only=False)
        first &= v == v[0]
        last &= v == v[-1]
    return first | last


def sorted_group_apply(
    ds: Dataset,
    keys: list[str],
    block_fn,
    num_blocks: int | None = None,
) -> Dataset:
    """Apply ``block_fn(table) -> table`` to tables containing only
    COMPLETE ``keys`` groups, via one range sort + coalesced edge block."""
    from ..stages.salted import default_partitions

    if num_blocks is None:
        num_blocks = default_partitions()
    srt = ds.repartition(num_blocks).sort(keys).materialize()

    def interior(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return block_fn(t)
        return block_fn(t.filter(pa.array(~_edge_mask(t, keys))))

    def edges_only(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        return t.filter(pa.array(_edge_mask(t, keys)))

    interior_ds = srt.map_batches(
        interior, batch_format="pyarrow", batch_size=None
    )
    edge_ds = (
        srt.map_batches(edges_only, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(block_fn, batch_format="pyarrow", batch_size=None)
    )
    return interior_ds.union(edge_ds)


def run_starts(sorted_keys: list[np.ndarray]) -> np.ndarray:
    """Boolean run-start mask over rows already sorted by the keys."""
    n = len(sorted_keys[0])
    new = np.zeros(n, dtype=bool)
    if n == 0:
        return new
    new[0] = True
    for v in sorted_keys:
        new[1:] |= v[1:] != v[:-1]
    return new
