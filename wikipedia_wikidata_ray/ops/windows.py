"""Windowed/streaming-style aggregation operators.

``sessionize``: gap-based session windows — the classic event-stream
operator Ray Data lacks natively. Expressed on the engine's sorted-run
idiom (ops/runs.sorted_group_apply): ONE range sort on the key, then each
block computes every complete key's sessions in a single vectorized pass
(lexsort + reduceat) — NOT ``groupby(key).map_groups``, whose per-group
pandas dispatch dominates at user-key cardinality (round-2 verdict
wrong #2; the 6× tiny-group wall measured on LSH/TF-IDF).

Partitioning assumption: one key's event history fits in a worker heap
(same as ops/asof.py — keys are users/sessions, the natural 100 TB
layout; a key bigger than a block still works via the coalesced edge
block, it just serializes that key).

Tumbling windows (per-hour etc.) need no custom operator — they are plain
key-derivation + groupby (see relational.events_hourly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .runs import run_starts, sorted_group_apply


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
    ``session_no`` (1-based per key), start/end, count and value sum.
    Exact at any parallelism (sorted-run + edge block)."""
    gap_us = np.timedelta64(gap_minutes * 60_000_000, "us")

    def block(t: pa.Table) -> pa.Table:
        kv_np = t[key].to_numpy(zero_copy_only=False) if len(t) else np.array([])
        tsv = t[ts].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False)
        if len(t) == 0:
            return pa.table(
                {
                    key: pa.array([], type=t.schema.field(key).type),
                    "session_no": pa.array([], type=pa.int64()),
                    "session_start": pa.array([], type=t.schema.field(ts).type),
                    "session_end": pa.array([], type=t.schema.field(ts).type),
                    "n_events": pa.array([], type=pa.int64()),
                    "sum_value": pa.array([], type=pa.float64()),
                }
            )
        order = np.lexsort((tsv, kv_np))
        kv_np, tsv, vals = kv_np[order], tsv[order], vals[order]
        new_key = run_starts([kv_np])
        new_sess = new_key.copy()
        new_sess[1:] |= (tsv[1:] - tsv[:-1]) > gap_us
        first = np.flatnonzero(new_sess)
        n_sessions = len(first)
        last = np.append(first[1:] - 1, len(tsv) - 1)
        counts = np.diff(np.append(first, len(tsv)))
        sums = np.add.reduceat(vals, first)
        # 1-based session ordinal within each key: session index minus the
        # index of its key's first session
        key_first_sess = np.flatnonzero(new_key[first])
        sess_run_id = np.cumsum(new_key[first]) - 1
        session_no = np.arange(n_sessions) - key_first_sess[sess_run_id] + 1
        return pa.table(
            {
                key: t[key].take(pa.array(order[first])),
                "session_no": pa.array(session_no, type=pa.int64()),
                "session_start": pa.array(tsv[first]),
                "session_end": pa.array(tsv[last]),
                "n_events": pa.array(counts, type=pa.int64()),
                "sum_value": pa.array(np.round(sums, 6)),
            }
        )

    return sorted_group_apply(events, [key], block, num_blocks=num_partitions)
