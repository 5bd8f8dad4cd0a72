"""Windowed range join (temporal inequality join) — another operator Ray
Data lacks natively, built as the classic BUCKETIZED composition
(SURVEY.md §2 custom-operator path (a)):

1. derive an equality key: time bucket ``b = ts // W`` (W = window span);
2. replicate each RIGHT row to buckets ``b`` and ``b+1`` — any left row
   whose preceding-window ``(l.ts - W, l.ts]`` contains ``r.ts`` lives in
   one of those two buckets, so the equality shuffle on
   ``(key, bucket)`` co-locates every matching pair exactly once
   (left rows are NOT replicated → no double counting);
3. per group, vectorized two-sided ``searchsorted`` over the sorted right
   timestamps resolves the exact inequality.

Shuffle key is ``(key, bucket)`` — high cardinality, skew bounded by one
key×window's activity. Replication factor is exactly 2 regardless of data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


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
    ``r.ts ∈ (l.ts - window, l.ts]``. Left schema + ``out`` column."""

    from ..stages.salted import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()
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

    def resolve(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy(zero_copy_only=False)
        tsv = group[ts].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        lmask = side == 0
        lefts = group.filter(pa.array(lmask)).select(list(l_schema.names))
        l_ts = tsv[lmask]
        r_ts = np.sort(tsv[~lmask])
        hi = np.searchsorted(r_ts, l_ts, side="right")
        lo = np.searchsorted(r_ts, l_ts - w, side="right")
        return lefts.append_column(out, pa.array(hi - lo))

    return (
        unioned.groupby([key, "_bucket"], num_partitions=num_partitions)
        .map_groups(resolve, batch_format="pyarrow")
        .select_columns([*l_schema.names, out])
    )
