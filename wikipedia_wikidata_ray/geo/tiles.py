"""Slippy-map (Web-Mercator z/x/y) tile assignment, vectorized numpy.

Raster↔vector tile operator of the north rule (SURVEY.md §2.I6). Pure
closed-form math — the standard OSM tile formulas — so a DuckDB SQL oracle
can replicate it exactly:

    xtile = floor((lon + 180) / 360 * 2^z)
    ytile = floor((1 - asinh(tan(lat_rad)) / pi) / 2 * 2^z)

Latitudes are clamped to the Web-Mercator limit ±85.05112878. Used inside
stateless ``map_batches`` stages; the per-tile groupby shuffles on
``(tile_z, tile_x, tile_y)`` with hot-tile salting (stages/salted.py).
"""

from __future__ import annotations

import numpy as np

MERCATOR_LAT_LIMIT = 85.05112878


def latlng_to_tile(lat_deg, lng_deg, zoom: int):
    """Arrays of degrees → (x, y) int32 tile coordinates at ``zoom``."""
    lat = np.clip(np.asarray(lat_deg, dtype=np.float64), -MERCATOR_LAT_LIMIT, MERCATOR_LAT_LIMIT)
    lng = np.asarray(lng_deg, dtype=np.float64)
    n = float(1 << zoom)
    x = np.floor((lng + 180.0) / 360.0 * n)
    lat_rad = np.radians(lat)
    y = np.floor((1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int32)
    y = np.clip(y, 0, n - 1).astype(np.int32)
    return x, y


def tile_bounds(x: int, y: int, zoom: int):
    """(lat_min, lat_max, lon_min, lon_max) of a tile — for tests."""
    n = float(1 << zoom)
    lon_min = x / n * 360.0 - 180.0
    lon_max = (x + 1) / n * 360.0 - 180.0
    lat_max = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
    lat_min = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (y + 1) / n))))
    return lat_min, lat_max, lon_min, lon_max


def tile_key(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    """Single uint64 key ``z(8b)|x(28b)|y(28b)`` — a convenient shuffle key."""
    return (
        (np.uint64(zoom) << np.uint64(56))
        | (x.astype(np.uint64) << np.uint64(28))
        | y.astype(np.uint64)
    )


def supercover_tiles(x0, y0, x1, y1):
    """True line rasterization (DDA supercover), vectorized across
    segments: every tile the straight line from continuous tile
    coordinate ``(x0, y0)`` to ``(x1, y1)`` passes through, per segment.

    Returns ``(seg_idx, tile_x, tile_y)`` int64 arrays — one row per
    visited tile, segments in order, tiles in traversal order. The path
    is 4-connected: when the line crosses a vertical and a horizontal
    grid line at the same parameter (an exact corner), the x-step is
    taken first (documented convention; both orderings are valid
    supercovers of the closed corner point).

    Fully vectorized: crossing parameters for all segments are generated
    with repeat/arange, ordered with ONE global lexsort on
    ``(segment, t, axis)``, and the tile walk is two segmented cumsums —
    no per-segment Python. This is the exact-coverage counterpart of the
    bbox cover used by ``pipelines/queries.q_segment_tile_cover`` (same
    distributed shape: in-batch expansion → per-tile count partials)."""
    x0 = np.asarray(x0, dtype=np.float64)
    y0 = np.asarray(y0, dtype=np.float64)
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    n = len(x0)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    tx0 = np.floor(x0).astype(np.int64)
    ty0 = np.floor(y0).astype(np.int64)
    tx1 = np.floor(x1).astype(np.int64)
    ty1 = np.floor(y1).astype(np.int64)
    dx = np.abs(tx1 - tx0)
    dy = np.abs(ty1 - ty0)
    sx = np.where(x1 >= x0, 1, -1).astype(np.int64)
    sy = np.where(y1 >= y0, 1, -1).astype(np.int64)

    # crossing parameters: k-th vertical grid line after the start is at
    # x = tx0 + k (sx>0) or tx0 + 1 - k (sx<0), k = 1..dx; same for y.
    # t = (line - x0) / (x1 - x0) ∈ (0, 1]; vectorized per segment via
    # repeat + global-arange offsets.
    def crossings(d, s, tile_start, delta, coord_start):
        total = int(d.sum())
        seg = np.repeat(np.arange(n), d)
        starts = np.concatenate(([0], np.cumsum(d)[:-1]))
        k = np.arange(total) - np.repeat(starts, d) + 1
        line = np.where(
            np.repeat(s, d) > 0,
            np.repeat(tile_start, d) + k,       # rightward: x = tx0 + k
            np.repeat(tile_start, d) + 1 - k,   # leftward:  x = tx0 + 1 - k
        ).astype(np.float64)
        # d > 0 guarantees delta != 0 for every generated crossing
        t = (line - np.repeat(coord_start, d)) / np.repeat(delta, d)
        return seg, t

    segx, tx_t = crossings(dx, sx, tx0, x1 - x0, x0)
    segy, ty_t = crossings(dy, sy, ty0, y1 - y0, y0)

    # event stream: axis 0 = x-step, 1 = y-step; corner ties x-first
    seg_all = np.concatenate((segx, segy))
    t_all = np.concatenate((tx_t, ty_t))
    ax_all = np.concatenate(
        (np.zeros(len(segx), dtype=np.int64), np.ones(len(segy), dtype=np.int64))
    )
    order = np.lexsort((ax_all, t_all, seg_all))
    seg_e, ax_e = seg_all[order], ax_all[order]

    # per-segment walk: tile j = start + cumsum(steps up to j); the first
    # emitted tile per segment is the start tile itself (no event).
    n_events = dx + dy
    n_tiles = n_events + 1
    total_tiles = int(n_tiles.sum())
    out_seg = np.repeat(np.arange(n), n_tiles)
    tile_starts = np.concatenate(([0], np.cumsum(n_tiles)[:-1]))
    is_start = np.zeros(total_tiles, dtype=bool)
    is_start[tile_starts] = True

    step_x = np.zeros(total_tiles, dtype=np.int64)
    step_y = np.zeros(total_tiles, dtype=np.int64)
    ev_pos = np.flatnonzero(~is_start)  # one output slot per event, in order
    step_x[ev_pos] = np.where(ax_e == 0, sx[seg_e], 0)
    step_y[ev_pos] = np.where(ax_e == 1, sy[seg_e], 0)

    # segmented cumsum: global cumsum minus the running total at each
    # segment's first slot
    cx = np.cumsum(step_x)
    cy = np.cumsum(step_y)
    base_x = np.repeat(cx[tile_starts], n_tiles)
    base_y = np.repeat(cy[tile_starts], n_tiles)
    tile_x = np.repeat(tx0, n_tiles) + (cx - base_x)
    tile_y = np.repeat(ty0, n_tiles) + (cy - base_y)
    return out_seg, tile_x, tile_y
