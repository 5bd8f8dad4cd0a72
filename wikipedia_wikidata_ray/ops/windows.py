"""Windowed/streaming-style aggregation operators.

``sessionize``: gap-based session windows — the classic event-stream
operator Ray Data lacks natively. Expressed as key-partitioned
``groupby(key).map_groups`` with vectorized numpy gap detection (SURVEY.md
§2 custom-operator path (a)). Partitioning assumption: one key's event
history fits in a worker heap (same assumption as ops/asof.py — at scale,
keys are users/sessions, the natural partitioning of the 100 TB layout).

Tumbling windows (per-hour etc.) need no custom operator — they are plain
key-derivation + groupby (see relational.events_hourly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def sessionize(
    events: Dataset,
    key: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
    gap_minutes: int = 30,
    num_partitions: int | None = None,
) -> Dataset:
    """Collapse each key's event stream into sessions separated by gaps
    > ``gap_minutes``. Output: one row per session with ordinal
    ``session_no`` (1-based per key), start/end, count and value sum."""
    from ..stages.salted import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions()
    gap_us = np.timedelta64(gap_minutes * 60_000_000, "us")

    def fn(group: pa.Table) -> pa.Table:
        tsv = group[ts].to_numpy(zero_copy_only=False)
        vals = group[value_col].to_numpy(zero_copy_only=False)
        order = np.argsort(tsv, kind="stable")
        tsv, vals = tsv[order], vals[order]
        new_sess = np.ones(len(tsv), dtype=np.int64)
        if len(tsv) > 1:
            new_sess[1:] = (np.diff(tsv) > gap_us).astype(np.int64)
        # sessions are contiguous runs over the sorted timestamps
        first = np.flatnonzero(new_sess)
        n_sessions = len(first)
        last = np.append(first[1:] - 1, len(tsv) - 1) if n_sessions else first
        starts, ends = tsv[first], tsv[last]
        counts = np.diff(np.append(first, len(tsv)))
        sums = (
            np.add.reduceat(vals, first)
            if n_sessions
            else np.array([], dtype=np.float64)
        )
        kv = group[key][0].as_py()
        return pa.table(
            {
                key: pa.array([kv] * n_sessions, type=group.schema.field(key).type),
                "session_no": pa.array(np.arange(1, n_sessions + 1)),
                "session_start": pa.array(starts),
                "session_end": pa.array(ends),
                "n_events": pa.array(counts),
                "sum_value": pa.array(np.round(sums, 6)),
            }
        )

    return events.groupby(key, num_partitions=num_partitions).map_groups(
        fn, batch_format="pyarrow"
    )
