"""Temporal (as-of join) + multimodal queries with DuckDB oracles.

- ``events_asof_click``: for every purchase event, the same user's most
  recent click at-or-before it (ops/asof.py custom operator).
- ``media_features`` / ``media_frame_samples``: the multimodal actor-pool
  stages of ops/multimodal.py; the deterministic FakeCodec payload
  contract makes decode/resize/frame-sample SQL-replicable (pixel sums of
  ≤5376 ints are exact in float64 on both sides — bitwise-equal means).
"""

from __future__ import annotations

import ray.data as rd
from ray.data import Dataset

from ..ops.asof import asof_join
from ..ops.multimodal import frame_samples, media_features


def q_events_asof_click(sf_dir: str) -> Dataset:
    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    purchases = events.filter(
        expr="event_type == 'purchase'"
    ).drop_columns(["event_type"])
    clicks = events.filter(expr="event_type == 'click'").drop_columns(
        ["event_type"]
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        tie_col="event_id",
        right_value_cols=["event_id", "value"],
    )


SQL_EVENTS_ASOF_CLICK = """
WITH purchases AS (
  SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'click'
),
matched AS (
  SELECT p.event_id, p.ts, p.user_id, p.value,
         c.event_id AS asof_event_id, c.value AS asof_value,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC
         ) AS rn
  FROM purchases p JOIN clicks c
    ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT event_id, ts, user_id, value, asof_event_id, asof_value
FROM matched WHERE rn = 1
UNION ALL
SELECT p.event_id, p.ts, p.user_id, p.value, NULL, NULL
FROM purchases p
WHERE NOT EXISTS (
  SELECT 1 FROM clicks c WHERE c.user_id = p.user_id AND c.ts <= p.ts
)
"""


def q_media_features(sf_dir: str) -> Dataset:
    return media_features(sf_dir).select_columns(
        ["doc_id", "width", "height", "mean_px"]
    )


SQL_MEDIA_FEATURES = """
WITH dims AS (
  SELECT doc_id,
         32 + (doc_id % 5) * 16 AS width,
         24 + (doc_id % 3) * 16 AS height
  FROM documents
)
SELECT d.doc_id, d.width, d.height,
       AVG((d.doc_id * 31 + i.i * 7) % 256) AS mean_px
FROM dims d, range(0, 5376) i(i)
WHERE i.i < d.width * d.height
GROUP BY 1, 2, 3
"""


def q_media_frame_samples(sf_dir: str) -> Dataset:
    return frame_samples(sf_dir, stride=4)


SQL_MEDIA_FRAME_SAMPLES = """
WITH dims AS (
  SELECT doc_id,
         32 + (doc_id % 5) * 16 AS width,
         24 + (doc_id % 3) * 16 AS height
  FROM documents
)
SELECT d.doc_id, k.k AS frame_no,
       AVG((d.doc_id * 31 + (k.k * 8 * d.width + j.j) * 7) % 256) AS frame_mean
FROM dims d, range(0, 7) k(k), range(0, 768) j(j)
WHERE k.k % 4 = 0
  AND k.k < d.height // 8
  AND j.j < 8 * d.width
GROUP BY 1, 2
"""


TEMPORAL_MEDIA_QUERIES = {
    "events_asof_click": q_events_asof_click,
    "media_features": q_media_features,
    "media_frame_samples": q_media_frame_samples,
}

TEMPORAL_MEDIA_ORACLES = {
    "events_asof_click": SQL_EVENTS_ASOF_CLICK,
    "media_features": SQL_MEDIA_FEATURES,
    "media_frame_samples": SQL_MEDIA_FRAME_SAMPLES,
}


def q_event_sessions(sf_dir: str) -> Dataset:
    from ..ops.windows import sessionize

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return sessionize(events, gap_minutes=30)


SQL_EVENT_SESSIONS = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTES THEN 1 ELSE 0 END
           AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS session_no
  FROM g
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM s GROUP BY 1, 2
"""

TEMPORAL_MEDIA_QUERIES["event_sessions"] = q_event_sessions
TEMPORAL_MEDIA_ORACLES["event_sessions"] = SQL_EVENT_SESSIONS


def q_error_click_window(sf_dir: str) -> Dataset:
    """Range join: for every error event, how many clicks the same user
    made in the preceding 5 minutes (ops/rangejoin.py bucketized
    inequality join)."""
    from ..ops.rangejoin import preceding_window_count

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    errors = events.filter(expr="event_type == 'error'").drop_columns(["event_type"])
    clicks = events.filter(expr="event_type == 'click'").drop_columns(["event_type"])
    return preceding_window_count(
        errors, clicks, key="user_id", ts="ts",
        window_us=5 * 60 * 1_000_000, out="n_recent_clicks",
    )


SQL_ERROR_CLICK_WINDOW = """
SELECT e.event_id, e.ts, e.user_id, COUNT(c.event_id) AS n_recent_clicks
FROM events e
LEFT JOIN events c
  ON c.event_type = 'click' AND c.user_id = e.user_id
 AND c.ts <= e.ts AND c.ts > e.ts - INTERVAL 5 MINUTES
WHERE e.event_type = 'error'
GROUP BY 1, 2, 3
"""


def q_segment_median_balance(sf_dir: str) -> Dataset:
    """Exact grouped median (percentile_disc 0.5 — lower-middle element),
    via key-partitioned map_groups: the non-algebraic aggregate path."""
    import numpy as np
    import pyarrow as pa

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def med(group: pa.Table) -> pa.Table:
        v = np.sort(group["c_acctbal"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "c_mktsegment": [group["c_mktsegment"][0].as_py()],
                "median_acctbal": [float(v[(len(v) - 1) // 2])],
            }
        )

    return cust.groupby("c_mktsegment").map_groups(med, batch_format="pyarrow")


SQL_SEGMENT_MEDIAN_BALANCE = """
SELECT c_mktsegment,
       PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY c_acctbal) AS median_acctbal
FROM customer GROUP BY 1
"""

TEMPORAL_MEDIA_QUERIES["error_click_window"] = q_error_click_window
TEMPORAL_MEDIA_ORACLES["error_click_window"] = SQL_ERROR_CLICK_WINDOW
TEMPORAL_MEDIA_QUERIES["segment_median_balance"] = q_segment_median_balance
TEMPORAL_MEDIA_ORACLES["segment_median_balance"] = SQL_SEGMENT_MEDIAN_BALANCE
