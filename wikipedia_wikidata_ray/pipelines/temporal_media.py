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
    """Exact grouped median (PERCENTILE_DISC 0.5 — the 1-based element at
    ceil(n/2)) on the histogram-partials path (same machinery as
    webtext.q_length_percentiles): per-block (segment, cents, count)
    partials → ONE merge_group_sums shuffle of counts → the median read
    off the merged histogram. No group's raw values ever co-locate, so the
    aggregate is safe for high-cardinality group keys (the prior
    map_groups plan shuffled every raw row to its group; round-3 verdict
    next item #8).

    Fixed-point exactness: c_acctbal is a 2-decimal value, so
    round(v*100) → int64 cents is injective and cents/100.0 restores the
    ORIGINAL double bitwise (nearest-double of a 2-dp value; checked in
    tests/test_temporal_media.py)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.salted import merge_group_sums

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def hist(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["c_acctbal"], pa.scalar(100.0))), pa.int64()
        )
        g = (
            t.set_column(t.column_names.index("c_acctbal"), "cents", cents)
            .group_by(["c_mktsegment", "cents"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["c_mktsegment", "cents", "cnt"])

    merged = merge_group_sums(
        cust.map_batches(hist, batch_format="pyarrow"),
        ["c_mktsegment", "cents"],
        ["cnt"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        segs = np.asarray(t.column("c_mktsegment").to_pylist(), dtype=object)
        vals = t.column("cents").to_numpy()
        cnts = t.column("cnt").to_numpy()
        o = np.lexsort((vals, segs))
        segs, vals, cnts = segs[o], vals[o], cnts[o]
        out_seg, out_med = [], []
        for sg in np.unique(segs):
            m = segs == sg
            c = cnts[m]
            idx = max(1, int(np.ceil(0.5 * int(c.sum()))))  # 1-based rank
            out_seg.append(sg)
            out_med.append(vals[m][np.searchsorted(np.cumsum(c), idx)] / 100.0)
        return pa.table(
            {
                "c_mktsegment": pa.array(out_seg, type=pa.string()),
                "median_acctbal": pa.array(out_med, type=pa.float64()),
            }
        )

    # histogram-sized by construction (segments × distinct cents) —
    # single-block assembly is bounded
    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


SQL_SEGMENT_MEDIAN_BALANCE = """
SELECT c_mktsegment,
       PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY c_acctbal) AS median_acctbal
FROM customer GROUP BY 1
"""

TEMPORAL_MEDIA_QUERIES["error_click_window"] = q_error_click_window
TEMPORAL_MEDIA_ORACLES["error_click_window"] = SQL_ERROR_CLICK_WINDOW
TEMPORAL_MEDIA_QUERIES["segment_median_balance"] = q_segment_median_balance
TEMPORAL_MEDIA_ORACLES["segment_median_balance"] = SQL_SEGMENT_MEDIAN_BALANCE


# ---------------------------------------------------------------------------
# Q: user_path_length — geo × temporal composition: each event gets a
# deterministic point (the dispersed-point closed form of the pages geo
# contract, keyed by event_id), and each user's trajectory length is the
# sum of planar-degree legs between consecutive events in ts order.
# Rides ops/runs.sorted_group_apply (ONE range sort on user_id, per-block
# vectorized leg computation over all complete users). Legs round into
# exact int64 ``path_e10`` (sqrt is correctly rounded per IEEE, so the
# per-leg values are bitwise equal to DuckDB's; integer summation makes
# the per-user total order-free at any parallelism — the same policy as
# bm25_search). Users with fewer than 2 events have no legs and are
# absent, matching the SQL's LAG NULL drop.
# Scale: movement = the one range sort of (user_id, ts, lat, lon) rows;
# per-user output is a single row; no join, no broadcast.


def q_user_path_length(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..ops.runs import sorted_group_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def derive(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "lat": pa.array(((eid * 7919) % 1600001) / 10000.0 - 80.0),
                "lon": pa.array(((eid * 104729) % 3600001) / 10000.0 - 180.0),
            }
        )

    def path_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_legs": pa.array([], type=pa.int64()),
                "path_e10": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, uid))
        uid, lat, lon = uid[order], lat[order], lon[order]
        if len(uid) < 2:
            return empty
        same = uid[1:] == uid[:-1]
        # current − previous, the exact op order of the SQL LAG mirror
        dlat = lat[1:] - lat[:-1]
        dlon = lon[1:] - lon[:-1]
        leg = np.sqrt(dlat * dlat + dlon * dlon)[same]
        if len(leg) == 0:
            return empty
        gu = uid[1:][same]
        le = np.round(leg * 10000000000.0).astype(np.int64)
        part = pa.table(
            {
                "user_id": pa.array(gu),
                "n_legs": pa.array(np.ones(len(gu), dtype=np.int64)),
                "path_e10": pa.array(le),
            }
        )
        g = part.group_by(["user_id"]).aggregate(
            [("n_legs", "sum"), ("path_e10", "sum")]
        )
        return g.rename_columns(["user_id", "n_legs", "path_e10"])

    pts = events.map_batches(derive, batch_format="pyarrow")
    return sorted_group_apply(pts, ["user_id"], path_block)


SQL_USER_PATH_LENGTH = """
WITH ev AS (
  SELECT user_id, ts,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
legs AS (
  SELECT user_id,
         SQRT( (lat - LAG(lat) OVER w) * (lat - LAG(lat) OVER w)
             + (lon - LAG(lon) OVER w) * (lon - LAG(lon) OVER w) ) AS leg
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, CAST(COUNT(leg) AS BIGINT) AS n_legs,
       CAST(SUM(CAST(ROUND(leg * 10000000000.0, 0) AS BIGINT)) AS BIGINT) AS path_e10
FROM legs WHERE leg IS NOT NULL GROUP BY 1
"""

TEMPORAL_MEDIA_QUERIES["user_path_length"] = q_user_path_length
TEMPORAL_MEDIA_ORACLES["user_path_length"] = SQL_USER_PATH_LENGTH


# ---------------------------------------------------------------------------
# Q: tile_od_matrix — origin→destination tile transition counts, the
# mobility/flow primitive of spatiotemporal analytics: each user's events
# (dispersed-point closed form keyed by event_id, as user_path_length)
# are ordered by (ts, event_id) and every consecutive pair contributes
# one (from_tile → to_tile) transition at z12. Self-loops kept (the SQL
# keeps them too); deterministic under ts ties via the event_id
# tiebreaker ON BOTH SIDES.
# Plan: ONE range sort on user_id (ops/runs.sorted_group_apply — all
# complete users of a block vectorized at once, split users coalesced in
# the edge block) emitting per-block (from,to) COUNT PARTIALS, then one
# combiner-merged shuffle over OD-pair-sized rows (stages/salted).
# Scale: the sort moves (user_id, ts, event_id, tile) rows once; the
# merge moves at most (distinct OD pairs × blocks) partial rows; no join,
# no broadcast, points never co-locate beyond their own user's run.


def tile_od_matrix_pipeline(events: Dataset) -> Dataset:
    """OD transitions over any (event_id, ts, user_id) Dataset — the
    bench drives this at replicated-corpus scale; q_tile_od_matrix binds
    it to the sf fixture."""
    import numpy as np
    import pyarrow as pa

    from ..geo.tiles import latlng_to_tile
    from ..ops.runs import sorted_group_apply
    from ..stages.salted import merge_group_sums

    def derive(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        tx, ty = latlng_to_tile(lat, lon, 12)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_id": t.column("event_id"),
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
            }
        )

    empty = pa.table(
        {
            "from_x": pa.array([], type=pa.int32()),
            "from_y": pa.array([], type=pa.int32()),
            "to_x": pa.array([], type=pa.int32()),
            "to_y": pa.array([], type=pa.int32()),
            "n_trans": pa.array([], type=pa.int64()),
        }
    )

    def od_block(t: pa.Table) -> pa.Table:
        if len(t) < 2:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        tx = t.column("tile_x").to_numpy(zero_copy_only=False)
        ty = t.column("tile_y").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, tx, ty = uid[order], tx[order], ty[order]
        same = uid[1:] == uid[:-1]
        if not same.any():
            return empty
        part = pa.table(
            {
                "from_x": pa.array(tx[:-1][same]),
                "from_y": pa.array(ty[:-1][same]),
                "to_x": pa.array(tx[1:][same]),
                "to_y": pa.array(ty[1:][same]),
                "n_trans": pa.array(
                    np.ones(int(same.sum()), dtype=np.int64)
                ),
            }
        )
        g = part.group_by(["from_x", "from_y", "to_x", "to_y"]).aggregate(
            [("n_trans", "sum")]
        )
        return g.rename_columns(["from_x", "from_y", "to_x", "to_y", "n_trans"])

    pts = events.map_batches(derive, batch_format="pyarrow")
    partials = sorted_group_apply(pts, ["user_id"], od_block)
    return merge_group_sums(
        partials, ["from_x", "from_y", "to_x", "to_y"], ["n_trans"]
    )


def q_tile_od_matrix(sf_dir: str) -> Dataset:
    return tile_od_matrix_pipeline(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
        )
    )


SQL_TILE_OD_MATRIX = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
tiled AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS INTEGER) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 4096) AS INTEGER) AS tile_y
  FROM ev
),
tr AS (
  SELECT LAG(tile_x) OVER w AS from_x, LAG(tile_y) OVER w AS from_y,
         tile_x AS to_x, tile_y AS to_y
  FROM tiled WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT from_x, from_y, to_x, to_y, CAST(COUNT(*) AS BIGINT) AS n_trans
FROM tr WHERE from_x IS NOT NULL
GROUP BY 1, 2, 3, 4
"""

TEMPORAL_MEDIA_QUERIES["tile_od_matrix"] = q_tile_od_matrix
TEMPORAL_MEDIA_ORACLES["tile_od_matrix"] = SQL_TILE_OD_MATRIX


# ---------------------------------------------------------------------------
# Q: tile_dwell_time — spatiotemporal dwell aggregation: how long users
# linger per z12 tile. Each consecutive same-user event pair attributes
# (next_ts − ts) microseconds of dwell to the FROM tile (the standard
# stay-point attribution); per-tile totals are exact int64 microsecond
# sums — no float policy needed at all. Shares the OD machinery: ONE
# range sort on user_id (sorted_group_apply), per-block (tile, dwell_us,
# n_stays) partials, one combiner-merged shuffle. Deterministic under ts
# ties via the event_id tiebreaker on both sides.


def q_tile_dwell_time(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..geo.tiles import latlng_to_tile
    from ..ops.runs import sorted_group_apply
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def derive(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        tx, ty = latlng_to_tile(lat, lon, 12)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_id": t.column("event_id"),
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
            }
        )

    empty = pa.table(
        {
            "tile_x": pa.array([], type=pa.int32()),
            "tile_y": pa.array([], type=pa.int32()),
            "dwell_us": pa.array([], type=pa.int64()),
            "n_stays": pa.array([], type=pa.int64()),
        }
    )

    def dwell_block(t: pa.Table) -> pa.Table:
        if len(t) < 2:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        tx = t.column("tile_x").to_numpy(zero_copy_only=False)
        ty = t.column("tile_y").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, tx, ty = uid[order], ts[order], tx[order], ty[order]
        same = uid[1:] == uid[:-1]
        if not same.any():
            return empty
        dus = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(np.int64)
        part = pa.table(
            {
                "tile_x": pa.array(tx[:-1][same]),
                "tile_y": pa.array(ty[:-1][same]),
                "dwell_us": pa.array(dus[same]),
                "n_stays": pa.array(np.ones(int(same.sum()), dtype=np.int64)),
            }
        )
        g = part.group_by(["tile_x", "tile_y"]).aggregate(
            [("dwell_us", "sum"), ("n_stays", "sum")]
        )
        return g.rename_columns(["tile_x", "tile_y", "dwell_us", "n_stays"])

    pts = events.map_batches(derive, batch_format="pyarrow")
    partials = sorted_group_apply(pts, ["user_id"], dwell_block)
    return merge_group_sums(
        partials, ["tile_x", "tile_y"], ["dwell_us", "n_stays"]
    )


SQL_TILE_DWELL_TIME = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
tiled AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS INTEGER) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 4096) AS INTEGER) AS tile_y
  FROM ev
),
st AS (
  SELECT tile_x, tile_y,
         CAST(DATE_DIFF('microsecond', ts, LEAD(ts) OVER w) AS BIGINT)
           AS dwell_us
  FROM tiled WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT tile_x, tile_y,
       CAST(SUM(dwell_us) AS BIGINT) AS dwell_us,
       CAST(COUNT(*) AS BIGINT) AS n_stays
FROM st WHERE dwell_us IS NOT NULL
GROUP BY 1, 2
"""

TEMPORAL_MEDIA_QUERIES["tile_dwell_time"] = q_tile_dwell_time
TEMPORAL_MEDIA_ORACLES["tile_dwell_time"] = SQL_TILE_DWELL_TIME


# ---------------------------------------------------------------------------
# Q: tile_user_reach — exact distinct-user count per z12 tile (the
# audience-reach metric of spatial analytics). Exact DISTINCT via the
# zonal-stats two-pass idiom: (tile, user) pairs collapse IN-BATCH, one
# combiner-merged dedup shuffle (first-wins on the pair), then per-tile
# count partials through a second combiner merge — raw events never
# co-locate, movement is (tile × active-users)-bounded. The mergeable-
# sketch alternative for 10⁹-user tiles is ops/sketch.py's HLL with
# group=tile (named fallback; the exact path IS the oracle-checkable
# one).


def q_tile_user_reach(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..geo.tiles import latlng_to_tile
    from ..stages.salted import merge_group_aggs, merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )

    def pairs(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        tx, ty = latlng_to_tile(lat, lon, 12)
        p = pa.table(
            {
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "user_id": t["user_id"],
                "one": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )
        g = p.group_by(["tile_x", "tile_y", "user_id"]).aggregate(
            [("one", "min")]
        )
        return g.rename_columns(["tile_x", "tile_y", "user_id", "one"])

    dedup = merge_group_aggs(
        events.map_batches(pairs, batch_format="pyarrow"),
        ["tile_x", "tile_y", "user_id"],
        [("one", "min")],
    )

    def counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["tile_x", "tile_y"]).aggregate([("one", "sum")])
        return g.rename_columns(["tile_x", "tile_y", "n_users"])

    return merge_group_sums(
        dedup.map_batches(counts, batch_format="pyarrow"),
        ["tile_x", "tile_y"],
        ["n_users"],
    )


SQL_TILE_USER_REACH = """
WITH ev AS (
  SELECT user_id,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
tiled AS (
  SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS INTEGER) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 4096) AS INTEGER) AS tile_y,
         user_id
  FROM ev
)
SELECT tile_x, tile_y, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM tiled GROUP BY 1, 2
"""

TEMPORAL_MEDIA_QUERIES["tile_user_reach"] = q_tile_user_reach
TEMPORAL_MEDIA_ORACLES["tile_user_reach"] = SQL_TILE_USER_REACH


# ---------------------------------------------------------------------------
# Q: tile_retention — per-tile user retention across the two halves of the
# corpus time range (the returning-audience metric of spatial analytics;
# extends tile_user_reach's exact-DISTINCT idiom with a temporal split).
# The split point is the midpoint of the global [min(ts), max(ts)] read
# from PARQUET FOOTER STATISTICS — zero data passes, exact for timestamp
# columns at any file count (falls back to a one-column Ray min/max
# aggregate when a footer lacks stats). Plan: per-batch (tile, user) →
# 0/1 in_first/in_second flags collapse in-batch, ONE combiner-merged
# max-merge dedups users, then per-tile integer sums through a second
# combiner merge — raw events never co-locate, movement is
# (tile × active-users)-bounded, all arithmetic int64/order-free.


def _events_ts_bounds_us(sf_dir: str) -> tuple[int, int]:
    """Global [min, max] of events.ts in microseconds from parquet footer
    row-group statistics (exact for timestamps); Ray aggregate fallback."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    paths = sorted(glob.glob(f"{sf_dir}/events.parquet")) or sorted(
        glob.glob(f"{sf_dir}/events.parquet/*.parquet")
    )
    lo, hi = None, None
    for p in paths:
        md = pq.read_metadata(p)
        ts_idx = md.schema.names.index("ts")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ts_idx).statistics
            if st is None or st.min is None or st.max is None:
                lo = hi = None
                break
            mn = int(np.datetime64(st.min, "us").astype(np.int64))
            mx = int(np.datetime64(st.max, "us").astype(np.int64))
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        else:
            continue
        break
    if lo is None or hi is None:  # stats-free footer: one-column aggregate
        ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        lo = int(np.datetime64(ds.min("ts"), "us").astype(np.int64))
        hi = int(np.datetime64(ds.max("ts"), "us").astype(np.int64))
    return lo, hi


def q_tile_retention(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..geo.tiles import latlng_to_tile
    from ..stages.salted import merge_group_aggs, merge_group_sums

    lo, hi = _events_ts_bounds_us(sf_dir)
    mid = (lo + hi) // 2

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def flags(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        tx, ty = latlng_to_tile(lat, lon, 12)
        ts_us = t.column("ts").cast(pa.int64()).to_numpy()
        first = (ts_us < mid).astype(np.int64)
        p = pa.table(
            {
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "user_id": t["user_id"],
                "in_first": pa.array(first),
                "in_second": pa.array(1 - first),
            }
        )
        g = p.group_by(["tile_x", "tile_y", "user_id"]).aggregate(
            [("in_first", "max"), ("in_second", "max")]
        )
        return g.rename_columns(
            ["tile_x", "tile_y", "user_id", "in_first", "in_second"]
        )

    per_user = merge_group_aggs(
        events.map_batches(flags, batch_format="pyarrow"),
        ["tile_x", "tile_y", "user_id"],
        [("in_first", "max"), ("in_second", "max")],
    )

    def counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.append_column(
            "n_retained", pc.multiply(t["in_first"], t["in_second"])
        )
        g = t.group_by(["tile_x", "tile_y"]).aggregate(
            [("in_first", "sum"), ("in_second", "sum"), ("n_retained", "sum")]
        )
        return g.rename_columns(
            ["tile_x", "tile_y", "n_first", "n_second", "n_retained"]
        )

    return merge_group_sums(
        per_user.map_batches(counts, batch_format="pyarrow"),
        ["tile_x", "tile_y"],
        ["n_first", "n_second", "n_retained"],
    )


SQL_TILE_RETENTION = """
WITH b AS (
  SELECT (CAST(epoch_us(MIN(ts)) AS BIGINT)
          + CAST(epoch_us(MAX(ts)) AS BIGINT)) // 2 AS mid
  FROM events
),
ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
tiled AS (
  SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS INTEGER) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 4096) AS INTEGER) AS tile_y,
         user_id, ts_us
  FROM ev
),
pu AS (
  SELECT tile_x, tile_y, user_id,
         MAX(CASE WHEN ts_us < (SELECT mid FROM b) THEN 1 ELSE 0 END)
           AS in_first,
         MAX(CASE WHEN ts_us >= (SELECT mid FROM b) THEN 1 ELSE 0 END)
           AS in_second
  FROM tiled GROUP BY 1, 2, 3
)
SELECT tile_x, tile_y,
       CAST(SUM(in_first) AS BIGINT) AS n_first,
       CAST(SUM(in_second) AS BIGINT) AS n_second,
       CAST(SUM(in_first * in_second) AS BIGINT) AS n_retained
FROM pu GROUP BY 1, 2
"""

TEMPORAL_MEDIA_QUERIES["tile_retention"] = q_tile_retention
TEMPORAL_MEDIA_ORACLES["tile_retention"] = SQL_TILE_RETENTION


# ---------------------------------------------------------------------------
# Q: covisit_tile_pairs — tile co-visitation: for every unordered pair of
# z6 tiles (coarse enough that users genuinely share tiles), how many users visited BOTH (the place-correlation /
# recommendation signal of mobility analytics). Plan: (user, tile)
# dedups through the tile_user_reach two-pass idiom (in-batch collapse →
# one combiner-merged min-merge), then ONE sorted_group_apply over
# user_id emits each user's within-run pair fan-out fully vectorized
# (repeat/cumsum index arithmetic — no per-user Python), pre-counted
# in-block, and a final combiner-merged sum keyed by the packed
# (lo, hi) tile pair. Output keeps pairs with n_users ≥ 2 (the
# correlation threshold that bounds output size). Scale: movement before
# the fan-out is (user × distinct-tile)-bounded; the fan-out itself is
# quadratic in a user's DISTINCT TILE COUNT — per-user, not global, and
# a production deployment would cap each user at their top-M tiles
# (grouped_topk on visit counts — named, not gated: the fixture's
# per-user tile sets are small and output IS the pair-count set).


def q_covisit_tile_pairs(sf_dir: str, min_users: int = 2) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..geo.tiles import latlng_to_tile
    from ..ops.runs import run_starts, sorted_group_apply
    from ..stages.salted import merge_group_aggs, merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )

    def pairs(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        tx, ty = latlng_to_tile(lat, lon, 6)
        node = tx.astype(np.int64) * 8192 + ty.astype(np.int64) + 1
        p = pa.table(
            {
                "user_id": t["user_id"],
                "node": pa.array(node),
                "one": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )
        g = p.group_by(["user_id", "node"]).aggregate([("one", "min")])
        return g.rename_columns(["user_id", "node", "one"])

    visited = merge_group_aggs(
        events.map_batches(pairs, batch_format="pyarrow"),
        ["user_id", "node"],
        [("one", "min")],
    )

    def fanout(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pair": pa.array([], type=pa.int64()),
                "n_users": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        node = t.column("node").to_numpy(zero_copy_only=False)
        n = len(u)
        starts = run_starts([u])
        run_start_idx = np.maximum.accumulate(
            np.where(starts, np.arange(n), 0)
        )
        local = np.arange(n) - run_start_idx  # 0-based rank within the run
        total = int(local.sum())
        if total == 0:
            return empty
        b_idx = np.repeat(np.arange(n), local)
        offsets = np.concatenate(([0], np.cumsum(local)))[:-1]
        a_idx = (
            np.arange(total)
            - np.repeat(offsets, local)
            + np.repeat(run_start_idx, local)
        )
        na, nb = node[a_idx], node[b_idx]
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        # pack (lo, hi): lo, hi < 8192*8192+1 < 2^26 — pair fits int64
        packed = lo * (1 << 27) + hi
        p = pa.table(
            {
                "pair": pa.array(packed),
                "n_users": pa.array(np.ones(total, dtype=np.int64)),
            }
        )
        g = p.group_by(["pair"]).aggregate([("n_users", "sum")])
        return g.rename_columns(["pair", "n_users"])

    counts = merge_group_sums(
        sorted_group_apply(visited, ["user_id"], fanout),
        ["pair"],
        ["n_users"],
    )

    def unpack(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater_equal(t["n_users"], min_users))
        packed = t.column("pair").to_numpy(zero_copy_only=False)
        lo = packed >> 27
        hi = packed & ((1 << 27) - 1)
        return pa.table(
            {
                "a_x": pa.array((lo // 8192).astype(np.int64)),
                "a_y": pa.array((lo % 8192 - 1).astype(np.int64)),
                "b_x": pa.array((hi // 8192).astype(np.int64)),
                "b_y": pa.array((hi % 8192 - 1).astype(np.int64)),
                "n_users": t["n_users"],
            }
        )

    return counts.map_batches(unpack, batch_format="pyarrow")


SQL_COVISIT_TILE_PAIRS = """
WITH ev AS (
  SELECT user_id,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
tiled AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR((lon + 180.0) / 360.0 * 64) AS BIGINT) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 64) AS BIGINT) AS tile_y
  FROM ev
),
pk AS (
  SELECT user_id, tile_x, tile_y, tile_x * 8192 + tile_y + 1 AS node
  FROM tiled
)
SELECT a.tile_x AS a_x, a.tile_y AS a_y, b.tile_x AS b_x, b.tile_y AS b_y,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM pk a JOIN pk b ON a.user_id = b.user_id AND a.node < b.node
GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 2
"""

TEMPORAL_MEDIA_QUERIES["covisit_tile_pairs"] = q_covisit_tile_pairs
TEMPORAL_MEDIA_ORACLES["covisit_tile_pairs"] = SQL_COVISIT_TILE_PAIRS


# ---------------------------------------------------------------------------
# Q: event_funnel — ordered-sequence funnel analysis (view → click →
# purchase): how many users reach each stage IN ORDER (the conversion
# drop-off table of product analytics; J18 family — one more consumer of
# the sorted-run idiom). Per user the stage anchors are sequential
# first-match scans, but the whole block vectorizes: one lexsort by
# (user, ts, event_id) — the deterministic tie policy BOTH sides share
# (round-5 rule) — then three segmented `np.minimum.reduceat` passes
# (first view; first click after it; first purchase after that) over run
# offsets. Only (stage, n_users) count partials leave the block — output
# is 3 rows regardless of scale; movement is the one range sort of
# (user, type, ts, id) rows.

FUNNEL_STAGES = ("view", "click", "purchase")


def q_event_funnel(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..ops.runs import run_starts, sorted_group_apply
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def slim(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        code = pc.index_in(
            t["event_type"], value_set=pa.array(list(FUNNEL_STAGES))
        )
        keep = pc.is_valid(code)
        return pa.table(
            {
                "user_id": pc.filter(t["user_id"], keep),
                "ts_us": pc.filter(t["ts"].cast(pa.int64()), keep),
                "event_id": pc.filter(t["event_id"], keep),
                "stage": pc.filter(code.cast(pa.int8()), keep),
            }
        )

    def funnel_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "stage": pa.array([], type=pa.string()),
                "n_users": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        st = t.column("stage").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, st = u[order], st[order]
        n = len(u)
        starts = run_starts([u])
        offs = np.flatnonzero(starts)
        run_id = np.cumsum(starts) - 1
        r = np.arange(n, dtype=np.int64)
        BIG = np.int64(n + 1)
        first_a = np.minimum.reduceat(np.where(st == 0, r, BIG), offs)
        gate = first_a[run_id]
        first_b = np.minimum.reduceat(
            np.where((st == 1) & (r > gate), r, BIG), offs
        )
        gate = first_b[run_id]
        first_c = np.minimum.reduceat(
            np.where((st == 2) & (r > gate), r, BIG), offs
        )
        counts = [
            int((first_a < BIG).sum()),
            int((first_b < BIG).sum()),
            int((first_c < BIG).sum()),
        ]
        names = ["view", "view_click", "view_click_purchase"]
        keep = [i for i, c in enumerate(counts) if c]
        return pa.table(
            {
                "stage": pa.array([names[i] for i in keep]),
                "n_users": pa.array(
                    np.asarray([counts[i] for i in keep], dtype=np.int64)
                ),
            }
        )

    partials = sorted_group_apply(
        events.map_batches(slim, batch_format="pyarrow"),
        ["user_id"],
        funnel_block,
    )
    return merge_group_sums(partials, ["stage"], ["n_users"])


SQL_EVENT_FUNNEL = """
WITH seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS pos
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
fa AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN pos END) AS pa
  FROM seq GROUP BY 1
),
fb AS (
  SELECT s.user_id, MIN(s.pos) AS pb
  FROM seq s JOIN fa USING (user_id)
  WHERE s.event_type = 'click' AND fa.pa IS NOT NULL AND s.pos > fa.pa
  GROUP BY 1
),
fc AS (
  SELECT s.user_id, MIN(s.pos) AS pc2
  FROM seq s JOIN fb USING (user_id)
  WHERE s.event_type = 'purchase' AND s.pos > fb.pb
  GROUP BY 1
)
SELECT stage, n_users FROM (
  SELECT 'view' AS stage,
         CAST((SELECT COUNT(*) FROM fa WHERE pa IS NOT NULL) AS BIGINT)
           AS n_users
  UNION ALL
  SELECT 'view_click', CAST((SELECT COUNT(*) FROM fb) AS BIGINT)
  UNION ALL
  SELECT 'view_click_purchase', CAST((SELECT COUNT(*) FROM fc) AS BIGINT)
) WHERE n_users > 0
"""

TEMPORAL_MEDIA_QUERIES["event_funnel"] = q_event_funnel
TEMPORAL_MEDIA_ORACLES["event_funnel"] = SQL_EVENT_FUNNEL


# ---------------------------------------------------------------------------
# Q: idw_grid — inverse-distance-weighted spatial interpolation of the
# event `value` field at the centers of occupied 1°×1° cells (the
# kriging-lite surface-estimation op of spatial analytics). Same
# one-join shape as within_radius_pairs: occupied-cell CENTERS scatter
# to their 3×3 neighborhood, events stay exact, one hash join on the
# packed cell key, per-batch vectorized distance/weight math. Weights
# w = 1/(ε+d) (ε = 1e-3 dodges the d→0 singularity), cutoff d ≤ 1°.
# Float policy: w and w·value are rounded per-PAIR to e10 int64 and
# summed as integers (order-free at any parallelism; sqrt/divide are
# IEEE-correctly-rounded so per-pair values are bitwise equal to
# DuckDB's). The published result is the exact integer sums
# (cluster_centroids house norm) — the idw ratio wv/w is a trivial
# consumer-side epilogue, and publishing the sums keeps every column
# order-free and overflow-safe at any points-per-cell. Movement:
# (cell-center ×9 + event) rows into one join; only e10 partials
# shuffle after it.

IDW_EPS = 0.001
IDW_CUTOFF = 1.0


def q_idw_grid(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.salted import default_partitions, merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )

    def ev_side(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        cy = np.floor(lat).astype(np.int64)
        cx = np.floor(lon).astype(np.int64)
        return pa.table(
            {
                "ecell": pa.array((cy + 9000) * 100000 + (cx + 18000)),
                "lat": pa.array(lat),
                "lon": pa.array(lon),
                "value": t["value"],
            }
        )

    pts = events.map_batches(ev_side, batch_format="pyarrow").materialize()

    def cells(t: pa.Table) -> pa.Table:
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        cy = np.floor(lat).astype(np.int64)
        cx = np.floor(lon).astype(np.int64)
        p = pa.table(
            {
                "cy": pa.array(cy),
                "cx": pa.array(cx),
                "one": pa.array(np.ones(len(cy), dtype=np.int64)),
            }
        )
        g = p.group_by(["cy", "cx"]).aggregate([("one", "min")])
        return g.rename_columns(["cy", "cx", "one"])

    from ..stages.salted import merge_group_aggs

    occupied = merge_group_aggs(
        pts.map_batches(cells, batch_format="pyarrow"),
        ["cy", "cx"],
        [("one", "min")],
    )

    def scatter_centers(t: pa.Table) -> pa.Table:
        cy = t.column("cy").to_numpy(zero_copy_only=False)
        cx = t.column("cx").to_numpy(zero_copy_only=False)
        n = len(cy)
        d = np.array([-1, 0, 1], dtype=np.int64)
        rep = np.repeat(np.arange(n), 9)
        dy = np.tile(np.repeat(d, 3), n)
        dx = np.tile(np.tile(d, 3), n)
        cell = (cy[rep] + dy + 9000) * 100000 + (cx[rep] + dx + 18000)
        return pa.table(
            {
                "cell": pa.array(cell),
                "cy": pa.array(cy[rep]),
                "cx": pa.array(cx[rep]),
            }
        )

    joined = occupied.map_batches(scatter_centers, batch_format="pyarrow").join(
        pts,
        "inner",
        num_partitions=default_partitions(),
        on=("cell",),
        right_on=("ecell",),
    )

    def weigh(t: pa.Table) -> pa.Table:
        cy = t.column("cy").to_numpy(zero_copy_only=False)
        cx = t.column("cx").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        dlat = lat - (cy + 0.5)
        dlon = lon - (cx + 0.5)
        dist = np.sqrt(dlat * dlat + dlon * dlon)
        keep = dist <= IDW_CUTOFF
        w = 1.0 / (IDW_EPS + dist[keep])
        w_e10 = np.round(w * 10000000000.0).astype(np.int64)
        wv_e10 = np.round(w * val[keep] * 10000000000.0).astype(np.int64)
        p = pa.table(
            {
                "cy": pa.array(cy[keep]),
                "cx": pa.array(cx[keep]),
                "n_pts": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
                "w_e10": pa.array(w_e10),
                "wv_e10": pa.array(wv_e10),
            }
        )
        g = p.group_by(["cy", "cx"]).aggregate(
            [("n_pts", "sum"), ("w_e10", "sum"), ("wv_e10", "sum")]
        )
        return g.rename_columns(["cy", "cx", "n_pts", "w_e10", "wv_e10"])

    return merge_group_sums(
        joined.map_batches(weigh, batch_format="pyarrow"),
        ["cy", "cx"],
        ["n_pts", "w_e10", "wv_e10"],
    )


SQL_IDW_GRID = f"""
WITH ev AS (
  SELECT value,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
cells AS (
  SELECT DISTINCT CAST(FLOOR(lat) AS BIGINT) AS cy,
                  CAST(FLOOR(lon) AS BIGINT) AS cx
  FROM ev
),
pairs AS (
  SELECT c.cy, c.cx, e.value,
         SQRT((e.lat - (c.cy + 0.5)) * (e.lat - (c.cy + 0.5))
              + (e.lon - (c.cx + 0.5)) * (e.lon - (c.cx + 0.5))) AS d
  FROM cells c JOIN ev e
    ON CAST(FLOOR(e.lat) AS BIGINT) BETWEEN c.cy - 1 AND c.cy + 1
   AND CAST(FLOOR(e.lon) AS BIGINT) BETWEEN c.cx - 1 AND c.cx + 1
),
kept AS (
  SELECT cy, cx,
         CAST(ROUND((1.0 / ({IDW_EPS!r} + d)) * 10000000000.0, 0) AS BIGINT)
           AS w_e10,
         CAST(ROUND((1.0 / ({IDW_EPS!r} + d)) * value * 10000000000.0, 0)
           AS BIGINT) AS wv_e10
  FROM pairs WHERE d <= {IDW_CUTOFF!r}
),
agg AS (
  SELECT cy, cx, CAST(COUNT(*) AS BIGINT) AS n_pts,
         CAST(SUM(w_e10) AS BIGINT) AS w_e10,
         CAST(SUM(wv_e10) AS BIGINT) AS wv_e10
  FROM kept GROUP BY 1, 2
)
SELECT cy, cx, n_pts, w_e10, wv_e10 FROM agg
"""

TEMPORAL_MEDIA_QUERIES["idw_grid"] = q_idw_grid
TEMPORAL_MEDIA_ORACLES["idw_grid"] = SQL_IDW_GRID


# ---------------------------------------------------------------------------
# Q: tile_decayed_popularity — exponentially time-decayed popularity per
# z12 tile (the freshness-weighted ranking signal of spatial search /
# trending detection): each event contributes weight exp(−age/τ) with
# age measured back from the corpus's max timestamp and τ = 7 days. The
# reference time comes from the same zero-pass parquet FOOTER STATISTICS
# as tile_retention. Float policy: the per-event weight is one
# EXP(one double op) — IEEE-identical on both sides (same family as the
# LN/SQRT/TAN precedents) — rounded to e10 int64 per event and summed as
# integers (order-free at any parallelism). Movement: only
# (tile, w_e10, n) partials shuffle through one combiner merge.

DECAY_TAU_US = 7 * 24 * 3600 * 1_000_000  # 7 days


def q_tile_decayed_popularity(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..geo.tiles import latlng_to_tile
    from ..stages.salted import merge_group_sums

    _, t_max = _events_ts_bounds_us(sf_dir)

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )

    def weigh(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        tx, ty = latlng_to_tile(lat, lon, 12)
        age = (t_max - t.column("ts").cast(pa.int64()).to_numpy()).astype(
            np.float64
        )
        w = np.exp(-(age / float(DECAY_TAU_US)))
        w_e10 = np.round(w * 10000000000.0).astype(np.int64)
        p = pa.table(
            {
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "n_events": pa.array(np.ones(len(tx), dtype=np.int64)),
                "w_e10": pa.array(w_e10),
            }
        )
        g = p.group_by(["tile_x", "tile_y"]).aggregate(
            [("n_events", "sum"), ("w_e10", "sum")]
        )
        return g.rename_columns(["tile_x", "tile_y", "n_events", "w_e10"])

    return merge_group_sums(
        events.map_batches(weigh, batch_format="pyarrow"),
        ["tile_x", "tile_y"],
        ["n_events", "w_e10"],
    )


SQL_TILE_DECAYED_POPULARITY = f"""
WITH mx AS (SELECT CAST(epoch_us(MAX(ts)) AS BIGINT) AS t FROM events),
ev AS (
  SELECT epoch_us(ts) AS ts_us,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
w AS (
  SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS INTEGER) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 4096) AS INTEGER) AS tile_y,
         CAST(ROUND(
           EXP(-(CAST((SELECT t FROM mx) - ts_us AS DOUBLE)
                 / {float(DECAY_TAU_US)!r}))
           * 10000000000.0, 0) AS BIGINT) AS w_e10
  FROM ev
)
SELECT tile_x, tile_y, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(w_e10) AS BIGINT) AS w_e10
FROM w GROUP BY 1, 2
"""

TEMPORAL_MEDIA_QUERIES["tile_decayed_popularity"] = q_tile_decayed_popularity
TEMPORAL_MEDIA_ORACLES["tile_decayed_popularity"] = SQL_TILE_DECAYED_POPULARITY


# ---------------------------------------------------------------------------
# Q: tile_bearing_histogram — per-tile cardinal movement-direction
# histogram (the flow-field / commute-direction view of mobility
# analytics; third consumer of the OD sorted-run machinery). Each
# consecutive same-user event pair contributes one move, attributed to
# its FROM tile, binned into N/E/S/W by COMPARISON-ONLY rules (no
# atan2): E/W when |dlon| ≥ |dlat| (sign of dlon, ties → E side), else
# N/S by sign of dlat — every boundary decided by exact float
# comparisons on bitwise-identical derived coordinates, so the binning
# cannot drift between Ray and SQL. Zero-displacement pairs are skipped
# on both sides. One range sort, per-block lexsorted pair derivation,
# (tile, bearing) count partials through one combiner merge.


def q_tile_bearing_histogram(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..geo.tiles import latlng_to_tile
    from ..ops.runs import run_starts, sorted_group_apply
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def derive(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "lat": pa.array(lat),
                "lon": pa.array(lon),
            }
        )

    BEARINGS = np.array(["E", "W", "N", "S"])

    def moves_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tile_x": pa.array([], type=pa.int32()),
                "tile_y": pa.array([], type=pa.int32()),
                "bearing": pa.array([], type=pa.string()),
                "n_moves": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, lat, lon = u[order], lat[order], lon[order]
        same = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            same[:-1] = u[:-1] == u[1:]
        src = np.flatnonzero(same)
        if len(src) == 0:
            return empty
        dlat = lat[src + 1] - lat[src]
        dlon = lon[src + 1] - lon[src]
        nz = (dlat != 0.0) | (dlon != 0.0)
        src, dlat, dlon = src[nz], dlat[nz], dlon[nz]
        if len(src) == 0:
            return empty
        ew = np.abs(dlon) >= np.abs(dlat)
        code = np.where(
            ew,
            np.where(dlon >= 0.0, 0, 1),  # E / W
            np.where(dlat > 0.0, 2, 3),  # N / S
        )
        tx, ty = latlng_to_tile(lat[src], lon[src], 12)
        p = pa.table(
            {
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "bearing": pa.array(BEARINGS[code]),
                "n_moves": pa.array(np.ones(len(src), dtype=np.int64)),
            }
        )
        g = p.group_by(["tile_x", "tile_y", "bearing"]).aggregate(
            [("n_moves", "sum")]
        )
        return g.rename_columns(["tile_x", "tile_y", "bearing", "n_moves"])

    pts = events.map_batches(derive, batch_format="pyarrow")
    partials = sorted_group_apply(pts, ["user_id"], moves_block)
    return merge_group_sums(
        partials, ["tile_x", "tile_y", "bearing"], ["n_moves"]
    )


SQL_TILE_BEARING_HISTOGRAM = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
mv AS (
  SELECT lat, lon,
         LEAD(lat) OVER w - lat AS dlat,
         LEAD(lon) OVER w - lon AS dlon
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
binned AS (
  SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS INTEGER) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 4096) AS INTEGER) AS tile_y,
         CASE WHEN ABS(dlon) >= ABS(dlat)
              THEN CASE WHEN dlon >= 0.0 THEN 'E' ELSE 'W' END
              ELSE CASE WHEN dlat > 0.0 THEN 'N' ELSE 'S' END
         END AS bearing
  FROM mv
  WHERE dlat IS NOT NULL AND (dlat <> 0.0 OR dlon <> 0.0)
)
SELECT tile_x, tile_y, bearing, CAST(COUNT(*) AS BIGINT) AS n_moves
FROM binned GROUP BY 1, 2, 3
"""

TEMPORAL_MEDIA_QUERIES["tile_bearing_histogram"] = q_tile_bearing_histogram
TEMPORAL_MEDIA_ORACLES["tile_bearing_histogram"] = SQL_TILE_BEARING_HISTOGRAM


# ---------------------------------------------------------------------------
# Q: media_ahash — perceptual average-hash fingerprints for the media
# table (multimodal × dedup: the image analog of simhash_fingerprints;
# see ops/multimodal.AHasher for the exact-integer bit rule and the
# sign-safe two-half packing). Fully oracled because the FakeCodec
# pixel contract is closed-form; a real codec drops in behind the same
# actor seam and the op becomes rows-only like any fitted/model stage.


def q_media_ahash(sf_dir: str) -> Dataset:
    from ..ops.multimodal import media_ahash

    return media_ahash(sf_dir)


SQL_MEDIA_AHASH = """
WITH dims AS (
  SELECT doc_id,
         32 + (doc_id % 5) * 16 AS width,
         24 + (doc_id % 3) * 16 AS height
  FROM documents
),
px AS (
  SELECT d.doc_id, d.width, d.height, i.i,
         (d.doc_id * 31 + i.i * 7) % 256 AS v
  FROM dims d, range(0, 5376) i(i)
  WHERE i.i < d.width * d.height
),
blocks AS (
  SELECT doc_id, width, height,
         (i // width) // (height // 8) AS br,
         (i % width) // (width // 8) AS bc,
         CAST(SUM(v) AS BIGINT) AS bs
  FROM px GROUP BY 1, 2, 3, 4, 5
),
tot AS (SELECT doc_id, CAST(SUM(v) AS BIGINT) AS ts FROM px GROUP BY 1),
bits AS (
  SELECT b.doc_id, b.width, b.height, b.br, b.bc,
         CASE WHEN 64 * b.bs > t.ts THEN 1 ELSE 0 END AS bit
  FROM blocks b JOIN tot t USING (doc_id)
)
SELECT doc_id, width, height,
       CAST(SUM(CASE WHEN br >= 4
                     THEN bit << (br * 8 + bc - 32) ELSE 0 END) AS BIGINT)
         AS hash_hi,
       CAST(SUM(CASE WHEN br < 4
                     THEN bit << (br * 8 + bc) ELSE 0 END) AS BIGINT)
         AS hash_lo
FROM bits GROUP BY 1, 2, 3
"""

TEMPORAL_MEDIA_QUERIES["media_ahash"] = q_media_ahash
TEMPORAL_MEDIA_ORACLES["media_ahash"] = SQL_MEDIA_AHASH


# ---------------------------------------------------------------------------
# Q: media_ahash_neardups — near-duplicate IMAGE pairs by perceptual-hash
# Hamming distance ≤ 3 (the visual-dedup op: re-encoded / lightly-edited
# images collide in aHash space). Rides the EXACT simhash machinery
# (ops/dedup._lsh_bucket_pairs): the 64-bit fingerprint (hi≪32 | lo)
# bands into 4 × 16-bit chunks (pigeonhole: hamming ≤ 3 ⟹ ≥1 band
# equal), candidates verify in place, cross-band dedup on the min-merge.
# The fixture's closed-form pixels give a real pair population (hamming
# 0–3 pairs exist at both test scales). SQL verifies the pair set with
# the O(n²) bit_count self-join (oracle scale only).


def q_media_ahash_neardups(sf_dir: str, max_hamming: int = 3) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..ops.dedup import _lsh_bucket_pairs, merge_group_aggs

    fp = q_media_ahash(sf_dir).materialize()

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        hi = t.column("hash_hi").to_numpy().astype(np.uint64)
        lo = t.column("hash_lo").to_numpy().astype(np.uint64)
        h = (hi << np.uint64(32)) | lo
        n = len(ids)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        chunk = np.empty(4 * n, dtype=np.uint64)
        for bnd in range(4):
            chunk[bnd::4] = (h >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(np.repeat(h, 4)),
                "band_id": pa.array(band),
                "band_hash": pa.array(chunk),
            }
        )

    pairs = _lsh_bucket_pairs(
        fp.map_batches(explode, batch_format="pyarrow"),
        4096,
        value_col="simhash",
        max_hamming=max_hamming,
    )
    return merge_group_aggs(pairs, ["doc_a", "doc_b"], [("hamming", "min")])


SQL_MEDIA_AHASH_NEARDUPS = f"""
WITH h AS ({SQL_MEDIA_AHASH})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(CAST(xor(a.hash_hi, b.hash_hi) AS BIGINT))
            + bit_count(CAST(xor(a.hash_lo, b.hash_lo) AS BIGINT))
         AS BIGINT) AS hamming
FROM h a JOIN h b ON b.doc_id > a.doc_id
WHERE bit_count(CAST(xor(a.hash_hi, b.hash_hi) AS BIGINT))
      + bit_count(CAST(xor(a.hash_lo, b.hash_lo) AS BIGINT)) <= 3
"""

TEMPORAL_MEDIA_QUERIES["media_ahash_neardups"] = q_media_ahash_neardups
TEMPORAL_MEDIA_ORACLES["media_ahash_neardups"] = SQL_MEDIA_AHASH_NEARDUPS


# ---------------------------------------------------------------------------
# Q: props_extract_stats — semi-structured column handling: the events
# table's `props` JSON strings ({"k": N}) parse via ONE vectorized
# Arrow `pc.extract_regex` kernel (no per-row json.loads — the Python
# loop would be the hot-path sin on a 100-TB event stream; a full JSON
# decoder drops in as an actor stage only when the schema is truly
# dynamic — named), then per-event-type exact integer stats ride the
# combined min/max/sum combiner merge (I7 `merge_group_aggs`).


def q_props_extract_stats(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.salted import merge_group_aggs

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        p = pa.table(
            {
                "event_type": t["event_type"],
                "n_events": pa.array(np.ones(len(t), dtype=np.int64)),
                "sum_k": k,
                "min_k": k,
                "max_k": k,
            }
        )
        g = p.group_by(["event_type"]).aggregate(
            [
                ("n_events", "sum"),
                ("sum_k", "sum"),
                ("min_k", "min"),
                ("max_k", "max"),
            ]
        )
        return g.rename_columns(
            ["event_type", "n_events", "sum_k", "min_k", "max_k"]
        )

    return merge_group_aggs(
        events.map_batches(extract, batch_format="pyarrow"),
        ["event_type"],
        [
            ("n_events", "sum"),
            ("sum_k", "sum"),
            ("min_k", "min"),
            ("max_k", "max"),
        ],
    )


SQL_PROPS_EXTRACT_STATS = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1)
                AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1)
                AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1)
                AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1
"""

TEMPORAL_MEDIA_QUERIES["props_extract_stats"] = q_props_extract_stats
TEMPORAL_MEDIA_ORACLES["props_extract_stats"] = SQL_PROPS_EXTRACT_STATS


# ---------------------------------------------------------------------------
# Q: audio_features — the audio modality of the J17 multimodal family
# (image = media_features/media_ahash, video = media_frame_samples,
# audio = this): exact-integer waveform features through an actor-pool
# decode stage (ops/multimodal.AudioFeaturizer). Fully oracled under
# the closed-form FAKEAUD contract; a real soundfile/ffmpeg codec drops
# in behind the same seam.


def q_audio_features(sf_dir: str) -> Dataset:
    from ..ops.multimodal import audio_features

    return audio_features(sf_dir)


SQL_AUDIO_FEATURES = """
WITH dims AS (
  SELECT doc_id, 8000 + (doc_id % 7) * 1000 AS n FROM documents
),
sm AS (
  SELECT d.doc_id, d.n, i.i,
         (d.doc_id * 17 + i.i * 11) % 4096 - 2048 AS v,
         (d.doc_id * 17 + (i.i + 1) * 11) % 4096 - 2048 AS vnext
  FROM dims d, range(0, 14000) i(i)
  WHERE i.i < d.n
)
SELECT doc_id,
       CAST(MIN(n) AS BIGINT) AS n_samples,
       CAST(SUM(v * v) AS BIGINT) AS energy,
       CAST(SUM(CASE WHEN i < n - 1 AND ((v >= 0) <> (vnext >= 0))
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak
FROM sm GROUP BY 1
"""

TEMPORAL_MEDIA_QUERIES["audio_features"] = q_audio_features
TEMPORAL_MEDIA_ORACLES["audio_features"] = SQL_AUDIO_FEATURES


# ---------------------------------------------------------------------------
# Q: tile_dwell_median — per-tile MEDIAN stay duration (the robust
# central-tendency companion to tile_dwell_time's sums: median dwell is
# the standard "how long do people actually stay here" metric, immune
# to the one user who left a session open). Exact PERCENTILE_DISC(0.5)
# on the histogram-partials path (segment_median_balance machinery):
# dwell quantizes to MINUTES (dwell_us // 60e6 — the declared statistic;
# microsecond medians would degenerate the histogram to raw rows), so
# per-block (tile, dwell_min, count) partials merge in ONE shuffle and
# no tile's raw stays ever co-locate. Same (ts, event_id) tie rule as
# the whole OD family.


def q_tile_dwell_median(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..geo.tiles import latlng_to_tile
    from ..ops.runs import sorted_group_apply
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def derive(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        tx, ty = latlng_to_tile(lat, lon, 12)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
            }
        )

    def hist_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tile_x": pa.array([], type=pa.int32()),
                "tile_y": pa.array([], type=pa.int32()),
                "dwell_min": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        tx = t.column("tile_x").to_numpy(zero_copy_only=False)
        ty = t.column("tile_y").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, tx, ty = u[order], ts[order], tx[order], ty[order]
        same = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            same[:-1] = u[:-1] == u[1:]
        src = np.flatnonzero(same)
        if len(src) == 0:
            return empty
        dwell_min = (ts[src + 1] - ts[src]) // 60_000_000
        p = pa.table(
            {
                "tile_x": pa.array(tx[src]),
                "tile_y": pa.array(ty[src]),
                "dwell_min": pa.array(dwell_min),
                "cnt": pa.array(np.ones(len(src), dtype=np.int64)),
            }
        )
        g = p.group_by(["tile_x", "tile_y", "dwell_min"]).aggregate(
            [("cnt", "sum")]
        )
        return g.rename_columns(["tile_x", "tile_y", "dwell_min", "cnt"])

    pts = events.map_batches(derive, batch_format="pyarrow")
    partials = sorted_group_apply(pts, ["user_id"], hist_block)
    merged = merge_group_sums(
        partials, ["tile_x", "tile_y", "dwell_min"], ["cnt"]
    )

    def finalize(t: pa.Table) -> pa.Table:
        tx = t.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = t.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("dwell_min").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        key = tx * 8192 + ty
        o = np.lexsort((v, key))
        key, v, c, tx, ty = key[o], v[o], c[o], tx[o], ty[o]
        out_x, out_y, out_m = [], [], []
        starts = np.flatnonzero(
            np.concatenate(([True], key[1:] != key[:-1]))
        )
        bounds = np.append(starts, len(key))
        for a, b in zip(bounds[:-1], bounds[1:]):
            cs = np.cumsum(c[a:b])
            idx = max(1, int(np.ceil(0.5 * int(cs[-1]))))
            out_x.append(tx[a])
            out_y.append(ty[a])
            out_m.append(v[a:b][np.searchsorted(cs, idx)])
        return pa.table(
            {
                "tile_x": pa.array(np.asarray(out_x, dtype=np.int64)),
                "tile_y": pa.array(np.asarray(out_y, dtype=np.int64)),
                "median_dwell_min": pa.array(
                    np.asarray(out_m, dtype=np.int64)
                ),
            }
        )

    # histogram-sized by construction (tiles × distinct minutes)
    return merged.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


SQL_TILE_DWELL_MEDIAN = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
tiled AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS BIGINT) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 4096) AS BIGINT) AS tile_y
  FROM ev
),
st AS (
  SELECT tile_x, tile_y,
         CAST(DATE_DIFF('microsecond', ts, LEAD(ts) OVER w) AS BIGINT)
           // 60000000 AS dwell_min
  FROM tiled WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT tile_x, tile_y,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY dwell_min)
         AS BIGINT) AS median_dwell_min
FROM st WHERE dwell_min IS NOT NULL
GROUP BY 1, 2
"""

TEMPORAL_MEDIA_QUERIES["tile_dwell_median"] = q_tile_dwell_median
TEMPORAL_MEDIA_ORACLES["tile_dwell_median"] = SQL_TILE_DWELL_MEDIAN


# ---------------------------------------------------------------------------
# Q: event_transition_matrix — first-order Markov behavior model: counts
# of consecutive same-user (from_type → to_type) transitions (the
# behavioral fingerprint product analytics fits funnels and anomaly
# models against). Same OD sorted-run machinery and the same
# (ts, event_id) tie rule; in-block lexsorted pair derivation emits
# (from, to) count partials — output is |types|²-bounded.


def q_event_transition_matrix(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..ops.runs import sorted_group_apply
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "event_type": t["event_type"],
            }
        )

    def trans_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "from_type": pa.array([], type=pa.string()),
                "to_type": pa.array([], type=pa.string()),
                "n_trans": pa.array([], type=pa.int64()),
            }
        )
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        same = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            same[:-1] = u[:-1] == u[1:]
        src = np.flatnonzero(same)
        if len(src) == 0:
            return empty
        p = pa.table(
            {
                "from_type": pa.array(et[src], type=pa.string()),
                "to_type": pa.array(et[src + 1], type=pa.string()),
                "n_trans": pa.array(np.ones(len(src), dtype=np.int64)),
            }
        )
        g = p.group_by(["from_type", "to_type"]).aggregate(
            [("n_trans", "sum")]
        )
        return g.rename_columns(["from_type", "to_type", "n_trans"])

    partials = sorted_group_apply(
        events.map_batches(slim, batch_format="pyarrow"),
        ["user_id"],
        trans_block,
    )
    return merge_group_sums(
        partials, ["from_type", "to_type"], ["n_trans"]
    )


SQL_EVENT_TRANSITION_MATRIX = """
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
)
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
FROM seq WHERE to_type IS NOT NULL
GROUP BY 1, 2
"""

TEMPORAL_MEDIA_QUERIES["event_transition_matrix"] = q_event_transition_matrix
TEMPORAL_MEDIA_ORACLES["event_transition_matrix"] = SQL_EVENT_TRANSITION_MATRIX


# ---------------------------------------------------------------------------
# Q: haversine_path_length — user_path_length's GREAT-CIRCLE twin: per
# user, trajectory length on the unit sphere (central angle in radians —
# multiply by R≈6371 km downstream) instead of planar degrees. The
# haversine `a` term (sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)) is BITWISE
# equal between numpy and DuckDB (sin/cos/×/+ all correctly rounded;
# property-verified at 200K fixture legs), but the final asin is NOT
# (numpy's SIMD arcsin differs from libm/DuckDB by 1 ulp on ~25% of
# inputs), so per-leg central angles round to e8 integers on both sides
# (~0.06 mm on Earth; a 1-ulp ≈ 2e-16 discrepancy flips an e8 rounding
# only within 2e-16/1e-8 = 2e-8 of a boundary — negligible at any gate
# scale, vs ~2e-6 per leg had we kept the e10 policy here). Integer
# per-user sums stay order-free at any parallelism. Deterministic under
# ts ties via the event_id tiebreaker ON BOTH SIDES (the OD-matrix
# rule). Same movement shape as user_path_length: ONE range sort, no
# join, no broadcast.


def q_haversine_path_length(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..ops.runs import sorted_group_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def derive(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_id": t.column("event_id"),
                "lat": pa.array(((eid * 7919) % 1600001) / 10000.0 - 80.0),
                "lon": pa.array(((eid * 104729) % 3600001) / 10000.0 - 180.0),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_legs": pa.array([], type=pa.int64()),
            "path_e8": pa.array([], type=pa.int64()),
        }
    )

    def path_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, lat, lon = uid[order], lat[order], lon[order]
        if len(uid) < 2:
            return empty
        same = uid[1:] == uid[:-1]
        # the exact op order of the SQL mirror: RADIANS on each operand,
        # halves, sin², cos·cos product, one fused `a`, LEAST clamp
        rl1 = np.radians(lat[:-1])
        rl2 = np.radians(lat[1:])
        sdlat = np.sin(np.radians(lat[1:] - lat[:-1]) / 2.0)
        sdlon = np.sin(np.radians(lon[1:] - lon[:-1]) / 2.0)
        a = sdlat * sdlat + np.cos(rl1) * np.cos(rl2) * sdlon * sdlon
        a = np.minimum(a, 1.0)  # SQL LEAST(a, 1.0) — same bitwise input
        leg = (2.0 * np.arcsin(np.sqrt(a)))[same]
        if len(leg) == 0:
            return empty
        gu = uid[1:][same]
        le = np.round(leg * 100000000.0).astype(np.int64)
        part = pa.table(
            {
                "user_id": pa.array(gu),
                "n_legs": pa.array(np.ones(len(gu), dtype=np.int64)),
                "path_e8": pa.array(le),
            }
        )
        g = part.group_by(["user_id"]).aggregate(
            [("n_legs", "sum"), ("path_e8", "sum")]
        )
        return g.rename_columns(["user_id", "n_legs", "path_e8"])

    pts = events.map_batches(derive, batch_format="pyarrow")
    return sorted_group_apply(pts, ["user_id"], path_block)


SQL_HAVERSINE_PATH_LENGTH = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
pairs AS (
  SELECT user_id, lat, lon,
         LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
-- NB: the first-event NULL pair must be dropped BEFORE the LEAST clamp:
-- DuckDB's LEAST skips NULL arguments, so LEAST(NULL_a, 1.0) = 1.0 and
-- every user would gain a phantom π leg (caught by the gate first run)
legs AS (
  SELECT user_id,
         2.0 * ASIN(SQRT(LEAST(
             SIN(RADIANS(lat - plat) / 2.0) * SIN(RADIANS(lat - plat) / 2.0)
           + COS(RADIANS(plat)) * COS(RADIANS(lat))
               * SIN(RADIANS(lon - plon) / 2.0)
               * SIN(RADIANS(lon - plon) / 2.0),
           1.0))) AS leg
  FROM pairs WHERE plat IS NOT NULL
)
SELECT user_id, CAST(COUNT(leg) AS BIGINT) AS n_legs,
       CAST(SUM(CAST(ROUND(leg * 100000000.0, 0) AS BIGINT)) AS BIGINT)
         AS path_e8
FROM legs WHERE leg IS NOT NULL GROUP BY 1
"""

TEMPORAL_MEDIA_QUERIES["haversine_path_length"] = q_haversine_path_length
TEMPORAL_MEDIA_ORACLES["haversine_path_length"] = SQL_HAVERSINE_PATH_LENGTH


# ---------------------------------------------------------------------------
# Q: new_user_cumulative — the user-growth curve (hourly new users and
# the cumulative audience, the DAU/MAU-dashboard primitive): each
# user's FIRST-SEEN hour (min over a monotone per-row epoch-hour map —
# equal to hour-of-min-ts), hourly new-user counts, and the running
# total. Hour bins (the fixture spans days, not months — day bins gave
# 2 rows) via integer microsecond division, non-negative so trunc ==
# floor on both sides (the DuckDB // rule).
# Plan: per-batch (user, min hour) partials → one user-keyed combiner
# merge → per-hour count partials → one hour-keyed merge. The hour
# histogram is BOUNDED BY THE CALENDAR (≤ ~9K rows/year at any corpus
# size), so the cumulative sum finalizes in a single block — the same
# bounded-finalize shape as tile_gini.


def q_new_user_cumulative(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.salted import (merge_group_aggs, merge_group_sums,
                                 partial_count)

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def hour_partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, type=pa.int64()))
        g = pa.table(
            {"user_id": t["user_id"], "hour": hour}
        ).group_by(["user_id"]).aggregate([("hour", "min")])
        return g.rename_columns(["user_id", "hour"])

    first = merge_group_aggs(
        events.map_batches(hour_partials, batch_format="pyarrow"),
        ["user_id"],
        [("hour", "min")],
    )
    hist = merge_group_sums(
        partial_count(first, ["hour"], out="n_new"), ["hour"], ["n_new"]
    )

    def finalize(t: pa.Table) -> pa.Table:
        hour = t.column("hour").to_numpy(zero_copy_only=False)
        n = t.column("n_new").to_numpy(zero_copy_only=False)
        o = np.argsort(hour, kind="stable")
        hour, n = hour[o], n[o]
        return pa.table(
            {
                "hour": pa.array(hour, type=pa.int64()),
                "n_new": pa.array(n, type=pa.int64()),
                "cum_new": pa.array(np.cumsum(n).astype(np.int64)),
            }
        )

    # calendar-bounded single-block finalize
    return hist.repartition(1).map_batches(
        finalize, batch_format="pyarrow", batch_size=None
    )


SQL_NEW_USER_CUMULATIVE = """
WITH f AS (
  SELECT user_id, MIN(epoch_us(ts) // 3600000000) AS hour
  FROM events GROUP BY 1
),
d AS (SELECT hour, CAST(COUNT(*) AS BIGINT) AS n_new FROM f GROUP BY 1)
SELECT CAST(hour AS BIGINT) AS hour, n_new,
       CAST(SUM(n_new) OVER (ORDER BY hour) AS BIGINT) AS cum_new
FROM d
"""

TEMPORAL_MEDIA_QUERIES["new_user_cumulative"] = q_new_user_cumulative
TEMPORAL_MEDIA_ORACLES["new_user_cumulative"] = SQL_NEW_USER_CUMULATIVE


# ---------------------------------------------------------------------------
# Q: session_length_histogram — the engagement-distribution readout on
# top of sessionize (bounce-rate analytics: the n_events == 1 bucket IS
# the bounce count): how many sessions have exactly k events. Composes
# the oracled sessionize (ops/windows.py — one range sort, per-block
# complete users) with one count-partials merge over the histogram key;
# output is bounded by the longest session, not the corpus. Movement
# beyond sessionize: (k, count) partial rows only.


def q_session_length_histogram(sf_dir: str) -> Dataset:
    from ..ops.windows import sessionize
    from ..stages.salted import merge_group_sums, partial_count

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    sess = sessionize(events, gap_minutes=30)
    lens = sess.map_batches(
        lambda t: t.select(["n_events"]), batch_format="pyarrow"
    )
    return merge_group_sums(
        partial_count(lens, ["n_events"], out="n_sessions"),
        ["n_events"],
        ["n_sessions"],
    )


SQL_SESSION_LENGTH_HISTOGRAM = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTES THEN 1 ELSE 0 END
           AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS session_no
  FROM g
),
sess AS (
  SELECT user_id, session_no, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM sess GROUP BY 1
"""

TEMPORAL_MEDIA_QUERIES["session_length_histogram"] = (
    q_session_length_histogram
)
TEMPORAL_MEDIA_ORACLES["session_length_histogram"] = (
    SQL_SESSION_LENGTH_HISTOGRAM
)


# ---------------------------------------------------------------------------
# Q: hourly_events_ma3 — the 1-D TEMPORAL stencil (tile_heat_smooth's
# time-axis twin): hourly event counts plus the centered 3-hour moving
# sum, CALENDAR semantics (an hour with no events contributes 0 to its
# neighbors — the self-join mirror, not a ROWS window over present rows
# only). Exact ints. Plan: per-hour COUNT PARTIALS scatter to (h-1, h,
# h+1) before the ONE combiner merge — neighbor math happens on partial
# rows, the merged row count stays calendar-bounded; occupied hours
# filter at the end (c > 0 drops the phantom edge rows, the
# tile_lisa_stats rule).


def q_hourly_events_ma3(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        hour = pc.divide(
            us, pa.scalar(3_600_000_000, type=pa.int64())
        ).to_numpy(zero_copy_only=False)
        g = pa.table(
            {"hour": pa.array(hour),
             "c": pa.array(np.ones(len(hour), dtype=np.int64))}
        ).group_by(["hour"]).aggregate([("c", "sum")]).rename_columns(
            ["hour", "c"]
        )
        h = g.column("hour").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        off = np.array([-1, 0, 1], dtype=np.int64)
        self_slot = np.tile(np.array([0, 1, 0], dtype=np.int64), len(h))
        crep = np.repeat(c, 3)
        out = pa.table(
            {
                "hour": pa.array((h[:, None] + off[None, :]).ravel()),
                "c": pa.array(crep * self_slot),
                "ma3": pa.array(crep),
            }
        )
        g2 = out.group_by(["hour"]).aggregate([("c", "sum"), ("ma3", "sum")])
        return g2.rename_columns(["hour", "c", "ma3"])

    merged = merge_group_sums(
        events.map_batches(partials, batch_format="pyarrow"),
        ["hour"],
        ["c", "ma3"],
    )
    return merged.filter(expr="c > 0")


SQL_HOURLY_EVENTS_MA3 = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
)
SELECT CAST(a.hour AS BIGINT) AS hour, a.c,
       CAST(SUM(b.c) AS BIGINT) AS ma3
FROM h a JOIN h b ON b.hour BETWEEN a.hour - 1 AND a.hour + 1
GROUP BY 1, 2
"""

TEMPORAL_MEDIA_QUERIES["hourly_events_ma3"] = q_hourly_events_ma3
TEMPORAL_MEDIA_ORACLES["hourly_events_ma3"] = SQL_HOURLY_EVENTS_MA3


# ---------------------------------------------------------------------------
# Q: daily_active_users — exact DAU (the companion of
# new_user_cumulative: not first-seen but ACTIVE-that-day): per day,
# COUNT(DISTINCT user). Two combiner-merged passes — (day, user) dedup
# partials, then per-day counts — the tile_user_reach shape keyed by
# calendar day; at extreme user cardinality the same plan ships the
# distinct piece on per-day HLL registers (ops/sketch.py — named
# fallback). Movement: (day, user) int64 pairs once, then day-bounded
# counts. Day via the date32→int32 hop.


def q_daily_active_users(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.salted import merge_group_sums, partial_count

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def day_user_partials(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64()
        )
        g = pa.table(
            {"day": day, "user_id": t["user_id"]}
        ).group_by(["day", "user_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["day", "user_id", "_c"]).select(
            ["day", "user_id"]
        )

    pairs = events.map_batches(day_user_partials, batch_format="pyarrow")
    # pass 1: exact (day, user) dedup on the combiner path
    dedup = partial_count(pairs, ["day", "user_id"], out="_n")
    merged = merge_group_sums(dedup, ["day", "user_id"], ["_n"])
    days = merged.map_batches(
        lambda t: t.select(["day"]), batch_format="pyarrow"
    )
    # pass 2: per-day distinct counts
    return merge_group_sums(
        partial_count(days, ["day"], out="dau"), ["day"], ["dau"]
    )


SQL_DAILY_ACTIVE_USERS = """
SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
FROM events GROUP BY 1
"""

TEMPORAL_MEDIA_QUERIES["daily_active_users"] = q_daily_active_users
TEMPORAL_MEDIA_ORACLES["daily_active_users"] = SQL_DAILY_ACTIVE_USERS


# ---------------------------------------------------------------------------
# Q: event_trigram_paths — third-order user journeys (the length-3
# extension of event_transition_matrix): counts of consecutive
# (t1 → t2 → t3) event-type triples per user timeline, the
# journey-mining table funnels and UX flows read. Deterministic under
# ts ties via the event_id tiebreaker ON BOTH SIDES. Plan: ONE range
# sort on user_id (sorted_group_apply), per-block vectorized triple
# derivation over complete users, (t1,t2,t3) count partials through one
# combiner merge — output |types|³-bounded.


def q_event_trigram_paths(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..ops.runs import sorted_group_apply
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    empty = pa.table(
        {
            "t1": pa.array([], type=pa.string()),
            "t2": pa.array([], type=pa.string()),
            "t3": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def triples(t: pa.Table) -> pa.Table:
        if len(t) < 3:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        order = np.lexsort((eid, ts, uid))
        uid = uid[order]
        et = et.take(pa.array(order))
        same = (uid[2:] == uid[:-2]) & (uid[2:] == uid[1:-1])
        if not same.any():
            return empty
        idx = np.flatnonzero(same)
        part = pa.table(
            {
                "t1": et.take(pa.array(idx)),
                "t2": et.take(pa.array(idx + 1)),
                "t3": et.take(pa.array(idx + 2)),
                "n": pa.array(np.ones(len(idx), dtype=np.int64)),
            }
        )
        g = part.group_by(["t1", "t2", "t3"]).aggregate([("n", "sum")])
        return g.rename_columns(["t1", "t2", "t3", "n"])

    parts = sorted_group_apply(events, ["user_id"], triples)
    return merge_group_sums(parts, ["t1", "t2", "t3"], ["n"])


SQL_EVENT_TRIGRAM_PATHS = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS nxt,
         LEAD(event_type, 2) OVER w AS nxt2,
         LEAD(user_id, 2) OVER w AS u2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type AS t1, nxt AS t2, nxt2 AS t3,
       CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE u2 = user_id AND nxt2 IS NOT NULL
GROUP BY 1, 2, 3
"""

TEMPORAL_MEDIA_QUERIES["event_trigram_paths"] = q_event_trigram_paths
TEMPORAL_MEDIA_ORACLES["event_trigram_paths"] = SQL_EVENT_TRIGRAM_PATHS


# ---------------------------------------------------------------------------
# Q: trajectory_chord_deviation — the Douglas–Peucker SPLIT POINT per
# user trajectory: among the interior points of each user's (ts,
# event_id)-ordered path, the event maximizing the perpendicular-
# deviation proxy |cross(P0→P1, P0→Pi)| from the first→last chord (2×
# the triangle area — the quantity DP thresholds; reported un-divided by
# chord length to stay in the multiply/subtract bitwise-parity family).
# The first recursion level of trajectory simplification — the
# map-generalization primitive the tile renderer of the reference's
# consumers applies to GPS traces. Determinism: ts ties broken by
# event_id ON BOTH SIDES (round-5 rule), winner selection on e10-rounded
# int64 deviations (float argmax near-ties cannot flip an integer
# ranking), remaining ties → smallest event_id. Distribution: one
# range sort on user_id (`sorted_group_apply` — complete users per
# block, coalesced edge block); per block every user resolves in one
# vectorized reduceat pass; output is user-sized (one row per user with
# ≥3 events). Scale: the idiom holds at 10⁸ users (9.4× vs map_groups,
# CLAUDE.md).


def q_trajectory_chord_deviation(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..ops.runs import run_starts, sorted_group_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def derive(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_id": t.column("event_id"),
                "lat": pa.array(((eid * 7919) % 1600001) / 10000.0 - 80.0),
                "lon": pa.array(((eid * 104729) % 3600001) / 10000.0 - 180.0),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_points": pa.array([], type=pa.int64()),
            "split_event_id": pa.array([], type=pa.int64()),
            "dev_e10": pa.array([], type=pa.int64()),
        }
    )

    def split_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, eid, lat, lon = uid[order], eid[order], lat[order], lon[order]
        n = len(uid)
        starts = run_starts([uid])
        start_idx = np.flatnonzero(starts)
        sizes = np.diff(np.append(start_idx, n))
        end_idx = start_idx + sizes - 1
        sz = np.repeat(sizes, sizes)
        lat0 = np.repeat(lat[start_idx], sizes)
        lon0 = np.repeat(lon[start_idx], sizes)
        lat1 = np.repeat(lat[end_idx], sizes)
        lon1 = np.repeat(lon[end_idx], sizes)
        # the exact op order of the SQL mirror (multiply/subtract only)
        cross = (lon1 - lon0) * (lat0 - lat) - (lon0 - lon) * (lat1 - lat0)
        dev = np.round(np.abs(cross) * 10000000000.0).astype(np.int64)
        pos = np.arange(n) - np.repeat(start_idx, sizes)
        interior = (pos > 0) & (pos < sz - 1) & (sz >= 3)
        cand = np.flatnonzero(interior)
        if len(cand) == 0:
            return empty
        run_id = np.cumsum(starts) - 1
        o2 = np.lexsort((eid[cand], -dev[cand], run_id[cand]))
        cs = cand[o2]
        rid = run_id[cs]
        first = np.empty(len(cs), dtype=bool)
        first[0] = True
        first[1:] = rid[1:] != rid[:-1]
        w = cs[first]
        return pa.table(
            {
                "user_id": pa.array(uid[w].astype(np.int64)),
                "n_points": pa.array(sz[w].astype(np.int64)),
                "split_event_id": pa.array(eid[w].astype(np.int64)),
                "dev_e10": pa.array(dev[w]),
            }
        )

    pts = events.map_batches(derive, batch_format="pyarrow")
    return sorted_group_apply(pts, ["user_id"], split_block)


SQL_TRAJECTORY_CHORD_DEVIATION = """
WITH ev AS (
  SELECT user_id, ts, event_id,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
b AS (
  SELECT user_id, event_id, lat, lon,
         FIRST_VALUE(lat) OVER w AS lat0,
         FIRST_VALUE(lon) OVER w AS lon0,
         LAST_VALUE(lat) OVER w AS lat1,
         LAST_VALUE(lon) OVER w AS lon1,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS cnt
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
dev AS (
  SELECT user_id, event_id, cnt,
         CAST(ROUND(ABS((lon1 - lon0) * (lat0 - lat)
                        - (lon0 - lon) * (lat1 - lat0))
                    * 10000000000.0, 0) AS BIGINT) AS dev_e10
  FROM b WHERE rn > 1 AND rn < cnt AND cnt >= 3
),
pick AS (
  SELECT user_id, CAST(cnt AS BIGINT) AS n_points,
         event_id AS split_event_id, dev_e10,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY dev_e10 DESC, event_id) AS rk
  FROM dev
)
SELECT CAST(user_id AS BIGINT) AS user_id, n_points,
       CAST(split_event_id AS BIGINT) AS split_event_id, dev_e10
FROM pick WHERE rk = 1
"""

TEMPORAL_MEDIA_QUERIES["trajectory_chord_deviation"] = (
    q_trajectory_chord_deviation
)
TEMPORAL_MEDIA_ORACLES["trajectory_chord_deviation"] = (
    SQL_TRAJECTORY_CHORD_DEVIATION
)


# ---------------------------------------------------------------------------
# Q: interarrival_stats — per-user inter-arrival (burstiness) sufficient
# statistics: count / sum / sum-of-squares / min / max of the gaps
# between consecutive events, in WHOLE SECONDS (gap_us // 1e6 — floor ==
# truncate because sorted timestamps make gaps non-negative, the only
# regime where DuckDB's `//` and Python's agree; CLAUDE.md round-5
# rule). Exact int64 end-to-end: consumers derive mean/variance/CV (the
# burstiness coefficient) downstream — integer sums are order-free at
# any parallelism so no float policy is needed; sum_gap_sq is bounded by
# (retention window s)²·events/user, ≤1e14 here (documented). ts ties
# broken by event_id ON BOTH SIDES. One range sort on user_id
# (`sorted_group_apply`), complete users aggregate per block in one
# pyarrow group_by — user-sized output, no joins.


def q_interarrival_stats(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa

    from ..ops.runs import sorted_group_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_gaps": pa.array([], type=pa.int64()),
            "sum_gap_s": pa.array([], type=pa.int64()),
            "sum_gap_sq": pa.array([], type=pa.int64()),
            "min_gap_s": pa.array([], type=pa.int64()),
            "max_gap_s": pa.array([], type=pa.int64()),
        }
    )

    def gaps_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        if len(uid) < 2:
            return empty
        same = uid[1:] == uid[:-1]
        gap_s = (
            (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(np.int64)
            // 1_000_000
        )
        gu = uid[1:][same].astype(np.int64)
        gs = gap_s[same]
        if len(gu) == 0:
            return empty
        p = pa.table(
            {
                "user_id": pa.array(gu),
                "n_gaps": pa.array(np.ones(len(gu), dtype=np.int64)),
                "sum_gap_s": pa.array(gs),
                "sum_gap_sq": pa.array(gs * gs),
                "min_gap_s": pa.array(gs),
                "max_gap_s": pa.array(gs),
            }
        )
        g = p.group_by(["user_id"]).aggregate(
            [
                ("n_gaps", "sum"),
                ("sum_gap_s", "sum"),
                ("sum_gap_sq", "sum"),
                ("min_gap_s", "min"),
                ("max_gap_s", "max"),
            ]
        )
        return g.rename_columns(
            [
                "user_id",
                "n_gaps",
                "sum_gap_s",
                "sum_gap_sq",
                "min_gap_s",
                "max_gap_s",
            ]
        )

    return sorted_group_apply(events, ["user_id"], gaps_block)


SQL_INTERARRIVAL_STATS = """
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) // 1000000 AS gap_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s,
       CAST(SUM(gap_s * gap_s) AS BIGINT) AS sum_gap_sq,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
FROM g WHERE gap_s IS NOT NULL GROUP BY 1
"""

TEMPORAL_MEDIA_QUERIES["interarrival_stats"] = q_interarrival_stats
TEMPORAL_MEDIA_ORACLES["interarrival_stats"] = SQL_INTERARRIVAL_STATS


# ---------------------------------------------------------------------------
# Q: event_value_correlation — Pearson sufficient statistics between
# every event-type pair over per-user value totals (the "do users who
# spend on A also spend on B" correlation panel). Decomposition insight
# that kills the pivot shuffle: with absent types counting as 0, Σx and
# Σx² for a pair are the TYPE-GLOBAL sums (zeros contribute nothing) and
# n is the global user count — only Σxy is pair-specific, and only
# users with BOTH types present contribute to it. So: one (user, type)
# e2-integer total merge (ROUND(value·100) is exact for 2-decimal
# fixtures; int sums order-free), a type-global table pulled to the
# driver (≤|event-type taxonomy| rows BY DEFINITION; type-keyed join
# named as the unbounded fallback), and per-user pair fan-out on the
# sorted-run idiom for Σxy. Bound: Σx² ≤ (max user total·100)²·users —
# int64 to ~1e9-scale user totals (documented). Output: pair-space rows
# of pure integers; consumers derive r downstream.


def q_event_value_correlation(sf_dir: str) -> Dataset:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.runs import run_starts, sorted_group_apply
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )

    def totals_partial(t: pa.Table) -> pa.Table:
        v = np.round(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        p = pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_type": pc.cast(t["event_type"], pa.string()),
                "v": pa.array(v),
            }
        )
        g = p.group_by(["user_id", "event_type"]).aggregate([("v", "sum")])
        return g.rename_columns(["user_id", "event_type", "v"])

    totals = merge_group_sums(
        events.map_batches(totals_partial, batch_format="pyarrow"),
        ["user_id", "event_type"],
        ["v"],
    ).materialize()

    # type globals + user count: taxonomy-sized / scalar — bounded
    gdf = merge_group_sums(
        totals.map_batches(
            lambda t: pa.table(
                {
                    "event_type": t["event_type"],
                    "sx": t["v"],
                    "sxx": pc.multiply(t["v"], t["v"]),
                }
            ),
            batch_format="pyarrow",
        ),
        ["event_type"],
        ["sx", "sxx"],
    ).to_pandas()
    g_sx = dict(zip(gdf["event_type"], gdf["sx"].astype(np.int64)))
    g_sxx = dict(zip(gdf["event_type"], gdf["sxx"].astype(np.int64)))
    n_users = merge_group_sums(
        totals.map_batches(
            lambda t: pa.table(
                {
                    "user_id": t["user_id"],
                    "one": pa.array(np.ones(len(t), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["user_id"],
        ["one"],
    ).count()

    empty = pa.table(
        {
            "type_a": pa.array([], type=pa.string()),
            "type_b": pa.array([], type=pa.string()),
            "sxy": pa.array([], type=pa.int64()),
        }
    )

    def pair_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        ty = t.column("event_type")
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        rank = pc.rank(ty, sort_keys="ascending", tiebreaker="dense")
        rank = rank.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((rank, uid))
        uid, v, rank = uid[order], v[order], rank[order]
        ty = ty.take(pa.array(order))
        n = len(uid)
        starts = run_starts([uid])
        run_start = np.maximum.accumulate(np.where(starts, np.arange(n), 0))
        local = np.arange(n) - run_start
        total = int(local.sum())
        if total == 0:
            return empty
        b_idx = np.repeat(np.arange(n), local)
        offsets = np.concatenate(([0], np.cumsum(local)))[:-1]
        a_idx = (
            np.arange(total)
            - np.repeat(offsets, local)
            + np.repeat(run_start, local)
        )
        p = pa.table(
            {
                "type_a": ty.take(pa.array(a_idx)),
                "type_b": ty.take(pa.array(b_idx)),
                "sxy": pa.array(v[a_idx] * v[b_idx]),
            }
        )
        g = p.group_by(["type_a", "type_b"]).aggregate([("sxy", "sum")])
        return g.rename_columns(["type_a", "type_b", "sxy"])

    sxy = merge_group_sums(
        sorted_group_apply(totals, ["user_id"], pair_block),
        ["type_a", "type_b"],
        ["sxy"],
    )

    def finish(t: pa.Table) -> pa.Table:
        ta = t.column("type_a").to_pylist()
        tb = t.column("type_b").to_pylist()
        return pa.table(
            {
                "type_a": t["type_a"],
                "type_b": t["type_b"],
                "n_users": pa.array(
                    np.full(len(t), n_users, dtype=np.int64)
                ),
                "sx": pa.array(
                    np.array([g_sx[x] for x in ta], dtype=np.int64)
                ),
                "sy": pa.array(
                    np.array([g_sx[x] for x in tb], dtype=np.int64)
                ),
                "sxy": t["sxy"],
                "sxx": pa.array(
                    np.array([g_sxx[x] for x in ta], dtype=np.int64)
                ),
                "syy": pa.array(
                    np.array([g_sxx[x] for x in tb], dtype=np.int64)
                ),
            }
        )

    return sxy.map_batches(finish, batch_format="pyarrow")


SQL_EVENT_VALUE_CORRELATION = """
WITH t AS (
  SELECT user_id, event_type,
         CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT event_type, CAST(SUM(v) AS BIGINT) AS sx,
         CAST(SUM(v * v) AS BIGINT) AS sxx
  FROM t GROUP BY 1
),
nu AS (SELECT COUNT(DISTINCT user_id) AS n FROM events),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(SUM(a.v * b.v) AS BIGINT) AS sxy
  FROM t a JOIN t b ON b.user_id = a.user_id AND b.event_type > a.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       CAST((SELECT n FROM nu) AS BIGINT) AS n_users,
       ga.sx AS sx, gb.sx AS sy, p.sxy, ga.sxx AS sxx, gb.sxx AS syy
FROM p
JOIN g ga ON ga.event_type = p.type_a
JOIN g gb ON gb.event_type = p.type_b
"""

TEMPORAL_MEDIA_QUERIES["event_value_correlation"] = q_event_value_correlation
TEMPORAL_MEDIA_ORACLES["event_value_correlation"] = (
    SQL_EVENT_VALUE_CORRELATION
)


# ---------------------------------------------------------------------------
# Q: event_debounce — throttle filter: drop events that arrive within
# DEBOUNCE_US of the PREVIOUS event of the same (user, type) — the
# at-source dedup a clickstream ingest runs before sessionization
# (double-click suppression). Gap-from-previous-event semantics (one
# LAG), not gap-from-last-kept (a sequential recurrence) — the
# difference is documented because only the former is both one
# vectorized diff and one SQL window.

DEBOUNCE_US = 6 * 3_600_000_000  # 6 hours — sized to the fixture's rate


def q_event_debounce(sf_dir: str) -> Dataset:
    """Kept events after per-(user, type) debouncing.

    Distributed shape: ONE range sort on (user_id, event_type) via
    ``sorted_group_apply``; each block lexsorts its complete groups by
    (ts, event_id) — the round-5 deterministic-tiebreak rule, mirrored
    by the SQL window's ORDER BY ts, event_id — and keeps rows whose
    in-group predecessor is ≥ DEBOUNCE_US older (first row always
    kept). Zero joins; movement = the event rows once."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.runs import sorted_group_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    empty = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "ts_us": pa.array([], type=pa.int64()),
        }
    )

    def debounce_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        ety = t.column("event_type").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        # null-safe int proxy for the string type key (house rank rule)
        tk = pc.rank(
            pa.array(ety), sort_keys="ascending", tiebreaker="dense",
            null_placement="at_start",
        ).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, tk, uid))
        u, k, e, s = uid[order], tk[order], eid[order], ts[order]
        new = np.r_[True, (u[1:] != u[:-1]) | (k[1:] != k[:-1])]
        gap_ok = np.r_[True, (s[1:] - s[:-1]) >= DEBOUNCE_US]
        keep = new | gap_ok
        sel = order[keep]
        return pa.table(
            {
                "event_id": pa.array(eid[sel], type=pa.int64()),
                "user_id": pa.array(uid[sel], type=pa.int64()),
                "event_type": pa.array(ety[sel]),
                "ts_us": pa.array(ts[sel], type=pa.int64()),
            }
        )

    return sorted_group_apply(
        events.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "event_type"],
        debounce_block,
    )


SQL_EVENT_DEBOUNCE = f"""
WITH w AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts, event_id
         ) AS prev_us
  FROM events
)
SELECT event_id, user_id, event_type, ts_us
FROM w
WHERE prev_us IS NULL OR ts_us - prev_us >= {DEBOUNCE_US}
"""


TEMPORAL_MEDIA_QUERIES["event_debounce"] = q_event_debounce
TEMPORAL_MEDIA_ORACLES["event_debounce"] = SQL_EVENT_DEBOUNCE


# ---------------------------------------------------------------------------
# Q: markov_next_accuracy — next-event prediction eval: fit the
# first-order Markov argmax predictor on the first three stream weeks,
# score it on the rest. The full train-fit + test-score loop costs ONE
# shuffle: each (from, to) transition partial carries its split flag,
# so the |types|²×2 merged table IS both the model and the test tally.

MARKOV_TRAIN_US = 3 * 7 * 24 * 3_600_000_000  # 3-week train window


def q_markov_next_accuracy(sf_dir: str) -> Dataset:
    """Per from-type: the train-argmax next event (ties → smallest
    type), train/test pair counts, and test accuracy at e8 (exact
    integer half-up; 0 when a from-type has no test pairs). Transitions
    use the (ts, event_id) tiebreak on BOTH sides (round-5 rule); the
    split timestamp is footer-min + 3 weeks (zero-pass, the
    churn_features spine). Movement: one range sort of the events +
    one |types|²·2-bounded merge; the driver finish is model-sized."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_
    from datetime import datetime

    from ..ops.runs import sorted_group_apply
    from ..pipelines.analytics import _pull_merged
    from ..stages.salted import merge_group_sums

    meta = pq_.read_metadata(f"{sf_dir}/events.parquet")
    t0 = None
    for rg in range(meta.num_row_groups):
        mn = meta.row_group(rg).column(1).statistics.min
        if hasattr(mn, "year"):
            td = mn.replace(tzinfo=None) - datetime(1970, 1, 1)
            v = (td.days * 86_400_000_000
                 + td.seconds * 1_000_000 + td.microseconds)
        else:
            v = int(mn)
        t0 = v if t0 is None else min(t0, v)
    split_us = t0 + MARKOV_TRAIN_US

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
                "event_type": t["event_type"],
            }
        )

    empty = pa.table(
        {
            "f": pa.array([], type=pa.string()),
            "t": pa.array([], type=pa.string()),
            "tr": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def pair_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        same = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            same[:-1] = u[:-1] == u[1:]
        src = np.flatnonzero(same)
        if len(src) == 0:
            return empty
        tr = (ts[src + 1] < split_us).astype(np.int64)
        p = pa.table(
            {
                "f": pa.array(et[src], type=pa.string()),
                "t": pa.array(et[src + 1], type=pa.string()),
                "tr": pa.array(tr),
                "n": pa.array(np.ones(len(src), dtype=np.int64)),
            }
        )
        g = p.group_by(["f", "t", "tr"]).aggregate([("n", "sum")])
        return g.rename_columns(["f", "t", "tr", "n"])

    merged = _pull_merged(
        merge_group_sums(
            sorted_group_apply(
                events.map_batches(slim, batch_format="pyarrow"),
                ["user_id"], pair_block,
            ),
            ["f", "t", "tr"], ["n"],
        ),
        ["f", "t", "tr", "n"],
    )
    fs = merged.column("f").to_pylist()
    tts = merged.column("t").to_pylist()
    trs = merged.column("tr").to_numpy(zero_copy_only=False)
    ns = merged.column("n").to_numpy(zero_copy_only=False)
    train: dict[str, dict[str, int]] = {}
    test: dict[str, dict[str, int]] = {}
    for f, tt, tr, n in zip(fs, tts, trs, ns):
        (train if tr else test).setdefault(f, {})[tt] = int(n)
    rows = []
    for f in sorted(train):
        # argmax by (count desc, type asc) — the tie rule on both sides
        pred = min(train[f], key=lambda k: (-train[f][k], k))
        n_train = sum(train[f].values())
        n_test = sum(test.get(f, {}).values())
        n_correct = test.get(f, {}).get(pred, 0)
        acc = ((2 * n_correct * 10**8 + n_test) // (2 * n_test)
               if n_test else 0)
        rows.append((f, pred, n_train, n_test, n_correct, acc))
    return rd.from_arrow(
        pa.table(
            {
                "from_type": pa.array([r[0] for r in rows], type=pa.string()),
                "pred_next": pa.array([r[1] for r in rows], type=pa.string()),
                "n_train": pa.array([r[2] for r in rows], type=pa.int64()),
                "n_test": pa.array([r[3] for r in rows], type=pa.int64()),
                "n_correct": pa.array([r[4] for r in rows], type=pa.int64()),
                "acc_e8": pa.array([r[5] for r in rows], type=pa.int64()),
            }
        )
    )


SQL_MARKOV_NEXT_ACCURACY = f"""
WITH t0 AS (
  SELECT epoch_us(MIN(ts)) + {MARKOV_TRAIN_US} AS split FROM events
),
seq AS (
  SELECT event_type AS f,
         LEAD(event_type) OVER w AS t,
         LEAD(epoch_us(ts)) OVER w AS nts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
c AS (
  SELECT f, t, CASE WHEN nts < t0.split THEN 1 ELSE 0 END AS tr,
         COUNT(*) AS n
  FROM seq, t0 WHERE t IS NOT NULL
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT f, t AS p FROM (
    SELECT f, t,
           ROW_NUMBER() OVER (PARTITION BY f ORDER BY n DESC, t ASC) AS rn
    FROM c WHERE tr = 1
  ) WHERE rn = 1
),
trn AS (SELECT f, SUM(n) AS n_train FROM c WHERE tr = 1 GROUP BY 1),
tst AS (
  SELECT c.f, SUM(c.n) AS n_test,
         SUM(CASE WHEN c.t = pred.p THEN c.n ELSE 0 END) AS n_correct
  FROM c JOIN pred ON pred.f = c.f
  WHERE c.tr = 0 GROUP BY 1
)
SELECT pred.f AS from_type, pred.p AS pred_next,
       CAST(trn.n_train AS BIGINT) AS n_train,
       CAST(COALESCE(tst.n_test, 0) AS BIGINT) AS n_test,
       CAST(COALESCE(tst.n_correct, 0) AS BIGINT) AS n_correct,
       CAST(CASE WHEN COALESCE(tst.n_test, 0) = 0 THEN 0
            ELSE (2 * tst.n_correct * 100000000 + tst.n_test)
                 // (2 * tst.n_test) END AS BIGINT) AS acc_e8
FROM pred
JOIN trn ON trn.f = pred.f
LEFT JOIN tst ON tst.f = pred.f
"""


TEMPORAL_MEDIA_QUERIES["markov_next_accuracy"] = q_markov_next_accuracy
TEMPORAL_MEDIA_ORACLES["markov_next_accuracy"] = SQL_MARKOV_NEXT_ACCURACY


# ---------------------------------------------------------------------------
# Q: geofence_transitions — per-user ENTER/EXIT detection against a
# fixed geofence (the eastern hemisphere, lon ≥ 0): the state-transition
# primitive of any location-alerting pipeline (fleet geofencing). Event
# positions derive from event_id by the tile_dwell closed form.


def q_geofence_transitions(sf_dir: str) -> Dataset:
    """Rows where a user's fence state CHANGES between consecutive
    events ((ts, event_id) order — the deterministic-tiebreak rule):
    the event that lands on the new side is emitted with entered = 1
    (outside → inside) or 0. ONE range sort on user_id; the state test
    is an exact integer comparison on e4 longitudes (the closed-form
    position contract is 4-decimal); zero joins, zero floats."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.runs import sorted_group_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_id": t["event_id"],
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "event_id": pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "entered": pa.array([], type=pa.int64()),
        }
    )

    def trans_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        lon_e4 = (eid * 104729) % 3600001 - 1800000  # exact int e4
        inside = lon_e4 >= 0
        same_user = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            same_user[1:] = u[1:] == u[:-1]
        changed = np.zeros(len(u), dtype=bool)
        if len(u) > 1:
            changed[1:] = inside[1:] != inside[:-1]
        sel = same_user & changed
        return pa.table(
            {
                "user_id": pa.array(u[sel], type=pa.int64()),
                "event_id": pa.array(eid[sel], type=pa.int64()),
                "ts_us": pa.array(ts[sel], type=pa.int64()),
                "entered": pa.array(inside[sel].astype(np.int64)),
            }
        )

    return sorted_group_apply(
        events.map_batches(slim, batch_format="pyarrow"),
        ["user_id"], trans_block,
    )


SQL_GEOFENCE_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN (event_id * 104729) % 3600001 - 1800000 >= 0
              THEN 1 ELSE 0 END AS inside,
         LAG(CASE WHEN (event_id * 104729) % 3600001 - 1800000 >= 0
                  THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_inside
  FROM events
)
SELECT user_id, event_id, ts_us, CAST(inside AS BIGINT) AS entered
FROM s
WHERE prev_inside IS NOT NULL AND inside <> prev_inside
"""


TEMPORAL_MEDIA_QUERIES["geofence_transitions"] = q_geofence_transitions
TEMPORAL_MEDIA_ORACLES["geofence_transitions"] = SQL_GEOFENCE_TRANSITIONS


# ---------------------------------------------------------------------------
# Q: user_burst_rate — per-user maximum event count in any sliding
# 1-hour window (rate-limit / abuse-detection primitive: the spike a
# fixed-bucket hourly count smears across two buckets).

BURST_WINDOW_US = 3_600_000_000


def q_user_burst_rate(sf_dir: str) -> Dataset:
    """Per user: max #events in [t, t+1h] over all window starts t at
    event times, plus the earliest achieving start. Windows are CLOSED
    on both ends (RANGE frame semantics, mirrored in the SQL window
    frame). ONE range sort on user_id; per block, a single vectorized
    searchsorted over the block's timestamp column (clamped to each
    run's end) resolves every user's sliding count — no per-user loop,
    no joins. Ties on the max take the earliest start (integer argmax
    on first occurrence, deterministic on both sides)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.runs import sorted_group_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "max_rate_1h": pa.array([], type=pa.int64()),
            "burst_start_us": pa.array([], type=pa.int64()),
        }
    )

    def burst_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        n = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.append(starts[1:], n)
        # closed window [ts, ts+W]: per-run searchsorted (ts is sorted
        # only WITHIN a run — the _run_pairs small-numpy-per-run shape;
        # a global searchsorted over the block would read across users)
        best = np.empty(len(starts), dtype=np.int64)
        bstart = np.empty(len(starts), dtype=np.int64)
        for k, (s, e) in enumerate(zip(starts, ends)):
            seg = ts[s:e]
            cnt = np.searchsorted(
                seg, seg + BURST_WINDOW_US, side="right"
            ) - np.arange(e - s)
            i = int(np.argmax(cnt))  # first max = earliest start
            best[k] = cnt[i]
            bstart[k] = seg[i]
        return pa.table(
            {
                "user_id": pa.array(u[starts], type=pa.int64()),
                "max_rate_1h": pa.array(best, type=pa.int64()),
                "burst_start_us": pa.array(bstart, type=pa.int64()),
            }
        )

    return sorted_group_apply(
        events.map_batches(slim, batch_format="pyarrow"),
        ["user_id"], burst_block,
    )


SQL_USER_BURST_RATE = f"""
WITH w AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         COUNT(*) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN CURRENT ROW AND {BURST_WINDOW_US} FOLLOWING
         ) AS cnt
  FROM events
)
SELECT user_id,
       CAST(cnt AS BIGINT) AS max_rate_1h,
       CAST(ts_us AS BIGINT) AS burst_start_us
FROM w
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id ORDER BY cnt DESC, ts_us ASC) = 1
"""


TEMPORAL_MEDIA_QUERIES["user_burst_rate"] = q_user_burst_rate
TEMPORAL_MEDIA_ORACLES["user_burst_rate"] = SQL_USER_BURST_RATE


# ---------------------------------------------------------------------------
# Q: linear_attribution — multi-touch marketing attribution: every
# purchase distributes one unit of credit equally over the user's
# clicks in the 24h lookback window.

ATTR_WINDOW_US = 24 * 3_600_000_000


def q_linear_attribution(sf_dir: str) -> Dataset:
    """Per user: purchase count, purchases with ≥1 lookback click, and
    the total click credit at e8 — each purchase-click pair carries
    round_half_up(1e8/k) where k is that purchase's click count (the
    round-each-TERM-then-sum-integers policy: float credit sums would
    be order-dependent across purchases). Window is [t−24h, t) —
    clicks strictly before the purchase.

    Distributed shape: ONE range sort on user_id; per block each
    user's purchases resolve their click windows with two vectorized
    searchsorted calls against the user's click timestamps (no pair
    fan-out materializes — the SQL twin's purchase×click join exists
    only as counts here). Zero joins."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.runs import sorted_group_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )

    def slim(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array(["purchase", "click"])
        )
        t = t.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "is_p": pc.cast(
                    pc.equal(t["event_type"], pa.scalar("purchase")),
                    pa.int64(),
                ),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_purchases": pa.array([], type=pa.int64()),
            "n_attributed": pa.array([], type=pa.int64()),
            "credit_e8": pa.array([], type=pa.int64()),
        }
    )

    def attr_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        isp = t.column("is_p").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts, isp = u[order], ts[order], isp[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.append(starts[1:], len(u))
        out_u, out_np, out_na, out_cr = [], [], [], []
        for s, e in zip(starts, ends):  # small numpy per run
            seg_ts = ts[s:e]
            seg_p = isp[s:e] == 1
            p_ts = seg_ts[seg_p]
            if len(p_ts) == 0:
                continue
            cl_ts = seg_ts[~seg_p]
            lo = np.searchsorted(cl_ts, p_ts - ATTR_WINDOW_US, side="left")
            hi = np.searchsorted(cl_ts, p_ts, side="left")
            k = (hi - lo).astype(np.int64)
            pos = k > 0
            kk = k[pos]
            credit = int((kk * ((2 * 10**8 + kk) // (2 * kk))).sum())
            out_u.append(int(u[s]))
            out_np.append(len(p_ts))
            out_na.append(int(pos.sum()))
            out_cr.append(credit)
        if not out_u:
            return empty
        return pa.table(
            {
                "user_id": pa.array(out_u, type=pa.int64()),
                "n_purchases": pa.array(out_np, type=pa.int64()),
                "n_attributed": pa.array(out_na, type=pa.int64()),
                "credit_e8": pa.array(out_cr, type=pa.int64()),
            }
        )

    return sorted_group_apply(
        events.map_batches(slim, batch_format="pyarrow"),
        ["user_id"], attr_block,
    )


SQL_LINEAR_ATTRIBUTION = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts_us FROM e WHERE event_type = 'click'),
k AS (
  SELECT p.user_id, p.event_id, COUNT(c.ts_us) AS k
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id
   AND c.ts_us >= p.ts_us - {ATTR_WINDOW_US} AND c.ts_us < p.ts_us
  GROUP BY 1, 2
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN k > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_attributed,
       CAST(SUM(CASE WHEN k > 0
                THEN k * ((2 * 100000000 + k) // (2 * k)) ELSE 0 END)
            AS BIGINT) AS credit_e8
FROM k GROUP BY 1
"""


TEMPORAL_MEDIA_QUERIES["linear_attribution"] = q_linear_attribution
TEMPORAL_MEDIA_ORACLES["linear_attribution"] = SQL_LINEAR_ATTRIBUTION


# ---------------------------------------------------------------------------
# Q: media_dhash — gradient perceptual hash (aHash's difference-hash
# twin; see ops/multimodal.DHasher).


def q_media_dhash(sf_dir: str) -> Dataset:
    from ..ops.multimodal import media_dhash

    return media_dhash(sf_dir)


SQL_MEDIA_DHASH = """
WITH dims AS (
  SELECT doc_id,
         32 + (doc_id % 5) * 16 AS width,
         24 + (doc_id % 3) * 16 AS height
  FROM documents
),
px AS (
  SELECT d.doc_id, d.width, d.height, i.i,
         (d.doc_id * 31 + i.i * 7) % 256 AS v
  FROM dims d, range(0, 5376) i(i)
  WHERE i.i < d.width * d.height
),
blocks AS (
  SELECT doc_id, width, height,
         (i // width) // (height // 8) AS br,
         (i % width) // (width // 8) AS bc,
         CAST(SUM(v) AS BIGINT) AS bs
  FROM px GROUP BY 1, 2, 3, 4, 5
),
bits AS (
  SELECT doc_id, width, height, br, bc,
         CASE WHEN LEAD(bs) OVER (
                PARTITION BY doc_id, br ORDER BY bc) > bs
              THEN 1 ELSE 0 END AS bit
  FROM blocks
)
SELECT doc_id, width, height,
       CAST(SUM(CASE WHEN bc < 7 THEN bit << (br * 7 + bc) ELSE 0 END)
            AS BIGINT) AS dhash
FROM bits GROUP BY 1, 2, 3
"""


TEMPORAL_MEDIA_QUERIES["media_dhash"] = q_media_dhash
TEMPORAL_MEDIA_ORACLES["media_dhash"] = SQL_MEDIA_DHASH


# ---------------------------------------------------------------------------
# Q: audio_energy_hash — windowed-energy contour hash (the audio dedup
# fingerprint; see ops/multimodal.AudioEnergyHasher).


def q_audio_energy_hash(sf_dir: str) -> Dataset:
    from ..ops.multimodal import audio_energy_hash

    return audio_energy_hash(sf_dir)


SQL_AUDIO_ENERGY_HASH = """
WITH dims AS (
  SELECT doc_id, 8000 + (doc_id % 7) * 1000 AS n FROM documents
),
sm AS (
  SELECT d.doc_id, i.i // 1000 AS w,
         ((d.doc_id * 17 + i.i * 11) % 4096) - 2048 AS s
  FROM dims d, range(0, 14000) i(i)
  WHERE i.i < (d.n // 1000) * 1000
),
we AS (
  SELECT doc_id, w, CAST(SUM(s * s) AS BIGINT) AS e
  FROM sm GROUP BY 1, 2
),
bits AS (
  SELECT doc_id, w,
         CASE WHEN LEAD(e) OVER (PARTITION BY doc_id ORDER BY w) > e
              THEN 1 ELSE 0 END AS bit,
         LEAD(e) OVER (PARTITION BY doc_id ORDER BY w) AS nxt,
         e
  FROM we
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN nxt IS NOT NULL THEN bit << w ELSE 0 END)
            AS BIGINT) AS energy_hash,
       CAST(SUM(e) AS BIGINT) AS windowed_energy
FROM bits GROUP BY 1
"""


TEMPORAL_MEDIA_QUERIES["audio_energy_hash"] = q_audio_energy_hash
TEMPORAL_MEDIA_ORACLES["audio_energy_hash"] = SQL_AUDIO_ENERGY_HASH


# ---------------------------------------------------------------------------
# Q: log_compaction — CDC/Kafka-style log compaction: treat the event
# stream as upserts keyed (user, type) and keep each key's LATEST
# record (the materialize-a-changelog primitive).


def q_log_compaction(sf_dir: str) -> Dataset:
    """Per (user_id, event_type): the last event's (ts, event_id,
    value cents) under the (ts, event_id) order — one range sort via
    ``sorted_group_apply``, last row of each complete run, coalesced
    edge block; zero joins. The SQL twin is the standard QUALIFY
    rn = 1 DESC window."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.runs import sorted_group_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_id": t["event_id"],
                "value_e2": pc.cast(
                    pc.round(pc.multiply(t["value"], pa.scalar(100.0))),
                    pa.int64(),
                ),
            }
        )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "last_ts_us": pa.array([], type=pa.int64()),
            "last_event_id": pa.array([], type=pa.int64()),
            "last_value_e2": pa.array([], type=pa.int64()),
        }
    )

    def last_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        ety = t.column("event_type")
        tk = pc.rank(
            ety, sort_keys="ascending", tiebreaker="dense",
            null_placement="at_start",
        ).to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, tk, u))
        us, ks = u[order], tk[order]
        # last row of each (user, type) run
        is_last = np.r_[(us[1:] != us[:-1]) | (ks[1:] != ks[:-1]), True]
        sel = order[is_last]
        return pa.table(
            {
                "user_id": pa.array(u[sel], type=pa.int64()),
                "event_type": ety.take(pa.array(sel)),
                "last_ts_us": pa.array(ts[sel], type=pa.int64()),
                "last_event_id": pa.array(eid[sel], type=pa.int64()),
                "last_value_e2": pa.array(
                    t.column("value_e2").to_numpy(zero_copy_only=False)[sel],
                    type=pa.int64(),
                ),
            }
        )

    return sorted_group_apply(
        events.map_batches(slim, batch_format="pyarrow"),
        ["user_id", "event_type"], last_block,
    )


SQL_LOG_COMPACTION = """
SELECT user_id, event_type,
       epoch_us(ts) AS last_ts_us,
       event_id AS last_event_id,
       CAST(ROUND(value * 100) AS BIGINT) AS last_value_e2
FROM events
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
"""


TEMPORAL_MEDIA_QUERIES["log_compaction"] = q_log_compaction
TEMPORAL_MEDIA_ORACLES["log_compaction"] = SQL_LOG_COMPACTION


# ---------------------------------------------------------------------------
# Q: user_type_entropy — per-user behavioral diversity: Shannon entropy
# of the user's event-type distribution, in the order-free integer form
# H·n·1e10 ≈ round(n·ln n·1e10) − Σ round(c·ln c·1e10) (each term
# rounds to e10 int64 BEFORE summation — float term order across types
# would be plan-dependent; integer sums are not; LN is bitwise).


def q_user_type_entropy(sf_dir: str) -> Dataset:
    """Per user: event count, distinct types, Σ round(c·ln c·1e10) and
    the scaled entropy numerator (divide by n·1e10 downstream for H in
    nats; H = 0 iff the user does exactly one thing). ONE (user, type)
    count merge → sorted runs fold per-user terms in-block."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.runs import sorted_group_apply
    from ..stages.salted import merge_group_sums, partial_count

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    counts = merge_group_sums(
        partial_count(events, ["user_id", "event_type"], out="c"),
        ["user_id", "event_type"], ["c"],
    )

    empty = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "n_types": pa.array([], type=pa.int64()),
            "s_clnc_e10": pa.array([], type=pa.int64()),
            "h_num_e10": pa.array([], type=pa.int64()),
        }
    )

    def fold(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, cs = u[order], c[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        run_id = np.cumsum(np.r_[False, us[1:] != us[:-1]])
        n_runs = len(starts)
        n_ev = np.zeros(n_runs, dtype=np.int64)
        np.add.at(n_ev, run_id, cs)
        n_ty = np.bincount(run_id, minlength=n_runs).astype(np.int64)
        terms = np.round(cs * np.log(cs) * 1e10).astype(np.int64)
        s_clnc = np.zeros(n_runs, dtype=np.int64)
        np.add.at(s_clnc, run_id, terms)
        nlnn = np.array(
            [int(np.round(float(n) * math.log(float(n)) * 1e10))
             for n in n_ev],
            dtype=np.int64,
        )
        return pa.table(
            {
                "user_id": pa.array(us[starts], type=pa.int64()),
                "n_events": pa.array(n_ev, type=pa.int64()),
                "n_types": pa.array(n_ty, type=pa.int64()),
                "s_clnc_e10": pa.array(s_clnc, type=pa.int64()),
                "h_num_e10": pa.array(nlnn - s_clnc, type=pa.int64()),
            }
        )

    return sorted_group_apply(counts, ["user_id"], fold)


SQL_USER_TYPE_ENTROPY = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
p AS (
  SELECT user_id,
         SUM(c) AS n_events,
         COUNT(*) AS n_types,
         SUM(CAST(ROUND(c * LN(c) * 1e10) AS BIGINT)) AS s_clnc
  FROM c GROUP BY 1
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(s_clnc AS BIGINT) AS s_clnc_e10,
       CAST(CAST(ROUND(n_events * LN(n_events) * 1e10) AS BIGINT)
            - s_clnc AS BIGINT) AS h_num_e10
FROM p
"""


TEMPORAL_MEDIA_QUERIES["user_type_entropy"] = q_user_type_entropy
TEMPORAL_MEDIA_ORACLES["user_type_entropy"] = SQL_USER_TYPE_ENTROPY


# ---------------------------------------------------------------------------
# Q: solar_hour_histogram — the geo × temporal cross: bucket events by
# LOCAL SOLAR hour (UTC hour + longitude/15°) instead of UTC. A global
# product's "when are users active" question is meaningless in UTC;
# solar time recovers the diurnal cycle. Positions from the event_id
# closed form (tile_dwell contract).


def q_solar_hour_histogram(sf_dir: str) -> Dataset:
    """24 rows: events per solar hour next to events per UTC hour-of-
    day. The timezone offset is the pure-integer
    ((lon_e4 + 1875000) // 150000 − 12) — floor of (lon+7.5°)/15° via
    a non-negative rebase so numpy // == DuckDB // (the truncation
    rule) — added to the UTC hour mod 24. One 24-row count merge."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )

    def partials(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        utc_h = (us // 3_600_000_000) % 24
        lon_e4 = (eid * 104729) % 3600001 - 1800000
        # floor((lon+7.5°)/15°): rebase by +187.5° (non-negative //),
        # then remove the 12-bucket rebase bias — lon 0 keeps its hour
        off = (lon_e4 + 1_875_000) // 150_000 - 12
        solar = (utc_h + off + 24) % 24
        g = pa.table(
            {
                "hour": pa.array(solar, type=pa.int64()),
                "n_solar": pa.array(np.ones(len(eid), dtype=np.int64)),
                "n_utc": pa.array(np.zeros(len(eid), dtype=np.int64)),
            }
        )
        g2 = pa.table(
            {
                "hour": pa.array(utc_h, type=pa.int64()),
                "n_solar": pa.array(np.zeros(len(eid), dtype=np.int64)),
                "n_utc": pa.array(np.ones(len(eid), dtype=np.int64)),
            }
        )
        both = pa.concat_tables([g, g2]).combine_chunks()
        out = both.group_by(["hour"]).aggregate(
            [("n_solar", "sum"), ("n_utc", "sum")]
        )
        return out.rename_columns(["hour", "n_solar", "n_utc"])

    return merge_group_sums(
        events.map_batches(partials, batch_format="pyarrow"),
        ["hour"], ["n_solar", "n_utc"],
    )


SQL_SOLAR_HOUR_HISTOGRAM = """
WITH e AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS utc_h,
         ((((event_id * 104729) % 3600001 - 1800000) + 1875000)
          // 150000) - 12 AS off
  FROM events
),
s AS (
  SELECT (utc_h + off + 24) % 24 AS hour, COUNT(*) AS n_solar
  FROM e GROUP BY 1
),
u AS (SELECT utc_h AS hour, COUNT(*) AS n_utc FROM e GROUP BY 1)
SELECT COALESCE(s.hour, u.hour) AS hour,
       CAST(COALESCE(s.n_solar, 0) AS BIGINT) AS n_solar,
       CAST(COALESCE(u.n_utc, 0) AS BIGINT) AS n_utc
FROM s FULL OUTER JOIN u ON u.hour = s.hour
"""


TEMPORAL_MEDIA_QUERIES["solar_hour_histogram"] = q_solar_hour_histogram
TEMPORAL_MEDIA_ORACLES["solar_hour_histogram"] = SQL_SOLAR_HOUR_HISTOGRAM


# ---------------------------------------------------------------------------
# Q: tile_trending — trending locations: top tiles by SHARE growth
# between the first and second half of the stream (n₂/S₂ − n₁/S₁,
# ranked by the pure-integer cross-product n₂·S₁ − n₁·S₂ — the
# round-5 integer-ranking rule applied to rate ratios).

TREND_K = 20


def q_tile_trending(sf_dir: str) -> Dataset:
    """Top-{TREND_K} z12 tiles by share-growth score with (score desc,
    tile_x, tile_y) ranking. The stream split is the integer midpoint
    (min+max)//2 of the event timestamps (footer-free here: the
    min/max ride the same count merge as the tile partials via a
    sentinel — both sides non-negative, so // matches).

    Movement: (tile → n₁, n₂) partials through ONE occupied-tile-
    bounded merge; globals fold to two scalars; top-k rides
    grouped_topk's block-local prune."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_
    from datetime import datetime

    from ..geo.tiles import latlng_to_tile
    from ..ops.topk import grouped_topk
    from ..pipelines.analytics import _pull_merged
    from ..stages.salted import merge_group_sums

    meta = pq_.read_metadata(f"{sf_dir}/events.parquet")
    mn = mx = None
    for rg in range(meta.num_row_groups):
        st = meta.row_group(rg).column(1).statistics
        lo, hi = st.min, st.max
        if hasattr(lo, "year"):
            ep = datetime(1970, 1, 1)
            lo = ((lo.replace(tzinfo=None) - ep).days * 86_400_000_000
                  + (lo.replace(tzinfo=None) - ep).seconds * 1_000_000
                  + (lo.replace(tzinfo=None) - ep).microseconds)
            hi = ((hi.replace(tzinfo=None) - ep).days * 86_400_000_000
                  + (hi.replace(tzinfo=None) - ep).seconds * 1_000_000
                  + (hi.replace(tzinfo=None) - ep).microseconds)
        mn = lo if mn is None else min(mn, lo)
        mx = hi if mx is None else max(mx, hi)
    t_mid = (int(mn) + int(mx)) // 2

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )

    def partials(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        tx, ty = latlng_to_tile(lat, lon, 12)
        late = us > t_mid
        g = pa.table(
            {
                "tile_x": pa.array(tx.astype(np.int64)),
                "tile_y": pa.array(ty.astype(np.int64)),
                "n1": pa.array((~late).astype(np.int64)),
                "n2": pa.array(late.astype(np.int64)),
            }
        ).group_by(["tile_x", "tile_y"]).aggregate(
            [("n1", "sum"), ("n2", "sum")]
        )
        return g.rename_columns(["tile_x", "tile_y", "n1", "n2"])

    merged = merge_group_sums(
        events.map_batches(partials, batch_format="pyarrow"),
        ["tile_x", "tile_y"], ["n1", "n2"],
    ).materialize()

    totals = _pull_merged(
        merge_group_sums(
            merged.map_batches(
                lambda t: pa.table(
                    {
                        "k": pa.array([0], type=pa.int64()),
                        "s1": pa.array(
                            [int(t.column("n1").to_numpy(
                                zero_copy_only=False).sum())],
                            type=pa.int64()),
                        "s2": pa.array(
                            [int(t.column("n2").to_numpy(
                                zero_copy_only=False).sum())],
                            type=pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["k"], ["s1", "s2"],
        ),
        ["k", "s1", "s2"],
    )
    s1 = int(totals.column("s1")[0].as_py())
    s2 = int(totals.column("s2")[0].as_py())

    def score(t: pa.Table) -> pa.Table:
        n1 = t.column("n1").to_numpy(zero_copy_only=False)
        n2 = t.column("n2").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_x": t["tile_x"],
                "tile_y": t["tile_y"],
                "n1": t["n1"],
                "n2": t["n2"],
                "score": pa.array(n2 * s1 - n1 * s2, type=pa.int64()),
                "c": pa.array(np.zeros(len(n1), dtype=np.int64)),
            }
        )

    top = grouped_topk(
        merged.map_batches(score, batch_format="pyarrow"),
        ["c"],
        [("score", False), ("tile_x", True), ("tile_y", True)],
        TREND_K, rank_col="rank",
    )
    return top.map_batches(
        lambda t: t.drop_columns(["c"]), batch_format="pyarrow"
    )


SQL_TILE_TRENDING = f"""
WITH ev AS (
  SELECT epoch_us(ts) AS us,
         ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS m FROM ev),
tiled AS (
  SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS BIGINT) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 4096) AS BIGINT) AS tile_y,
         CASE WHEN us > mid.m THEN 1 ELSE 0 END AS late
  FROM ev, mid
),
c AS (
  SELECT tile_x, tile_y,
         SUM(1 - late) AS n1, SUM(late) AS n2
  FROM tiled GROUP BY 1, 2
),
tot AS (SELECT SUM(n1) AS s1, SUM(n2) AS s2 FROM c)
SELECT tile_x, tile_y,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(n2 * tot.s1 - n1 * tot.s2 AS BIGINT) AS score,
       CAST(ROW_NUMBER() OVER (
         ORDER BY n2 * tot.s1 - n1 * tot.s2 DESC, tile_x, tile_y)
         AS BIGINT) AS rank
FROM c, tot
ORDER BY score DESC, tile_x, tile_y
LIMIT {TREND_K}
"""


TEMPORAL_MEDIA_QUERIES["tile_trending"] = q_tile_trending
TEMPORAL_MEDIA_ORACLES["tile_trending"] = SQL_TILE_TRENDING


# ---------------------------------------------------------------------------
# Q: daily_value_percentiles — exact daily p50/p90 of the event value:
# the percentile-timeseries panel every metrics stack draws, computed
# from histogram partials (raw values never co-locate — the exact-
# percentile discipline of webtext's length_percentiles, extended to a
# calendar series).


def q_daily_value_percentiles(sf_dir: str) -> Dataset:
    """Per day: n, exact p50 and p90 of value cents (PERCENTILE_DISC:
    the 1-based element at ⌈p·n⌉ — the property-tested house rule).
    Movement: ONE (day, cent-value) count merge bounded by days ×
    value-domain; each day resolves from its cumulative histogram
    inside one sorted-run pass."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..ops.runs import sorted_group_apply
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        v = pc.cast(
            pc.round(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
        ).to_numpy(zero_copy_only=False)
        g = pa.table(
            {
                "day": pa.array(us // 86_400_000_000, type=pa.int64()),
                "v": pa.array(v, type=pa.int64()),
                "n": pa.array(np.ones(len(us), dtype=np.int64)),
            }
        ).group_by(["day", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["day", "v", "n"])

    hist = merge_group_sums(
        events.map_batches(partials, batch_format="pyarrow"),
        ["day", "v"], ["n"],
    )

    empty = pa.table(
        {
            "day": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
            "p50_e2": pa.array([], type=pa.int64()),
            "p90_e2": pa.array([], type=pa.int64()),
        }
    )

    def pct_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        d = t.column("day").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, d))
        ds_, vs, ns = d[order], v[order], n[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        ends = np.append(starts[1:], len(ds_))
        days, tot, p50, p90 = [], [], [], []
        for s, e in zip(starts, ends):  # small numpy per run
            cn = np.cumsum(ns[s:e])
            nn = int(cn[-1])
            # PERCENTILE_DISC: 1-based element at ceil(p*n)
            r50 = (nn + 1) // 2  # ceil(0.5n)
            r90 = (9 * nn + 9) // 10  # ceil(0.9n)
            days.append(int(ds_[s]))
            tot.append(nn)
            p50.append(int(vs[s:e][np.searchsorted(cn, r50, side="left")]))
            p90.append(int(vs[s:e][np.searchsorted(cn, r90, side="left")]))
        return pa.table(
            {
                "day": pa.array(days, type=pa.int64()),
                "n": pa.array(tot, type=pa.int64()),
                "p50_e2": pa.array(p50, type=pa.int64()),
                "p90_e2": pa.array(p90, type=pa.int64()),
            }
        )

    return sorted_group_apply(hist, ["day"], pct_block)


SQL_DAILY_VALUE_PERCENTILES = """
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT)
         AS p50_e2,
       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY v) AS BIGINT)
         AS p90_e2
FROM e GROUP BY day
"""


TEMPORAL_MEDIA_QUERIES["daily_value_percentiles"] = q_daily_value_percentiles
TEMPORAL_MEDIA_ORACLES["daily_value_percentiles"] = (
    SQL_DAILY_VALUE_PERCENTILES
)


# ---------------------------------------------------------------------------
# Q: tile_rate_shrinkage — empirical-Bayes (Gamma–Poisson) shrinkage of
# per-tile page counts toward the global mean: the small-area
# estimation fix for "this tile looks hot because it has 3 events" —
# sparse tiles pull hard toward the prior, dense tiles barely move.

SHRINK_K = 10  # prior strength (pseudo-observations)


def q_tile_rate_shrinkage(sf_dir: str) -> Dataset:
    """Per occupied z12 tile (event positions, tile_dwell contract):
    raw count n and the shrunk rate (n + K·S/T)/(1 + K) — published
    EXACTLY at e8 via the integer rational (n·T + K·S)·1e8/((1+K)·T)
    with the floored half-up identity (S = total events, T = occupied
    tiles; no float op anywhere). Movement: one occupied-tile count
    merge + a 2-scalar fold."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..geo.tiles import latlng_to_tile
    from ..pipelines.analytics import _pull_merged
    from ..stages.salted import merge_group_sums

    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def partials(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        lat = ((eid * 7919) % 1600001) / 10000.0 - 80.0
        lon = ((eid * 104729) % 3600001) / 10000.0 - 180.0
        tx, ty = latlng_to_tile(lat, lon, 12)
        g = pa.table(
            {
                "tile_x": pa.array(tx.astype(np.int64)),
                "tile_y": pa.array(ty.astype(np.int64)),
                "n": pa.array(np.ones(len(eid), dtype=np.int64)),
            }
        ).group_by(["tile_x", "tile_y"]).aggregate([("n", "sum")])
        return g.rename_columns(["tile_x", "tile_y", "n"])

    merged = merge_group_sums(
        events.map_batches(partials, batch_format="pyarrow"),
        ["tile_x", "tile_y"], ["n"],
    ).materialize()

    totals = _pull_merged(
        merge_group_sums(
            merged.map_batches(
                lambda t: pa.table(
                    {
                        "k": pa.array([0], type=pa.int64()),
                        "s": pa.array(
                            [int(t.column("n").to_numpy(
                                zero_copy_only=False).sum())],
                            type=pa.int64()),
                        "t": pa.array([t.num_rows], type=pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["k"], ["s", "t"],
        ),
        ["k", "s", "t"],
    )
    s_tot = int(totals.column("s")[0].as_py())
    t_tot = int(totals.column("t")[0].as_py())

    def shrink(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        num = n * t_tot + SHRINK_K * s_tot
        den = (1 + SHRINK_K) * t_tot
        shrunk = (2 * num * 10**8 + den) // (2 * den)
        return pa.table(
            {
                "tile_x": t["tile_x"],
                "tile_y": t["tile_y"],
                "n": t["n"],
                "shrunk_e8": pa.array(shrunk, type=pa.int64()),
            }
        )

    return merged.map_batches(shrink, batch_format="pyarrow")


SQL_TILE_RATE_SHRINKAGE = f"""
WITH ev AS (
  SELECT ((event_id * 7919) % 1600001) / 10000.0 - 80.0 AS lat,
         ((event_id * 104729) % 3600001) / 10000.0 - 180.0 AS lon
  FROM events
),
c AS (
  SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 4096) AS BIGINT) AS tile_x,
         CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat)))
                     / PI()) / 2.0 * 4096) AS BIGINT) AS tile_y,
         COUNT(*) AS n
  FROM ev GROUP BY 1, 2
),
tot AS (SELECT SUM(n) AS s, COUNT(*) AS t FROM c)
SELECT tile_x, tile_y, CAST(n AS BIGINT) AS n,
       CAST((2 * (n * tot.t + {SHRINK_K} * tot.s) * 100000000
             + (1 + {SHRINK_K}) * tot.t)
            // (2 * (1 + {SHRINK_K}) * tot.t) AS BIGINT) AS shrunk_e8
FROM c, tot
"""


TEMPORAL_MEDIA_QUERIES["tile_rate_shrinkage"] = q_tile_rate_shrinkage
TEMPORAL_MEDIA_ORACLES["tile_rate_shrinkage"] = SQL_TILE_RATE_SHRINKAGE
