"""Raster-accelerated point-in-polygon join (I4 scale path #2).

The production answer to megacity skew in a spatial join: points pile
into a few hot z12 tiles, so classify each UNIQUE TILE once (memoized
per worker/actor) instead of ray-casting every point. A tile whose bbox
intersects no polygon edge is UNIFORM — every point in it has the same
containment wrt every polygon (crossing a boundary requires an edge in
the tile), so the tile's assignment is computed once from its center and
all its points take it via one vectorized gather. Only BOUNDARY tiles
(edge bbox overlaps tile bbox — a conservative, therefore exact, test)
fall through to the exact per-point crossing-number path (`pip.py`).

Exactness: bitwise-identical output to ``PIPMultiJoiner`` by
construction (pytest-asserted row equality; shares ``admin_counts``'
DuckDB oracle). Points outside the Mercator clip range are routed to the
exact path unconditionally — their clipped tile's bbox does not contain
them, so tile uniformity must not be applied.

At 100 TB: the memo converges to the occupied-tile set (bounded by
4096² at z12), hit rate → 1 on megacity batches; the edge STRtree is
built once per worker from the same broadcast ``PolygonSet`` as the
exact joiner. Movement: none — this is a drop-in per-batch stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .pip import PolygonSet, assign_codes
from .strtree import STRtree
from .tiles import MERCATOR_LAT_LIMIT, latlng_to_tile

_REFINE = "\x00REFINE"  # memo sentinel: tile straddles a polygon edge


def _edge_tree(polys: PolygonSet) -> STRtree:
    """STRtree over every polygon EDGE's bbox (closed rings)."""
    boxes = []
    for rx, ry in zip(polys.rings_x, polys.rings_y):
        x, y = rx, ry
        if not (x[0] == x[-1] and y[0] == y[-1]):
            x = np.concatenate([x, x[:1]])
            y = np.concatenate([y, y[:1]])
        x0, x1 = x[:-1], x[1:]
        y0, y1 = y[:-1], y[1:]
        boxes.append(
            np.stack(
                [np.minimum(x0, x1), np.minimum(y0, y1),
                 np.maximum(x0, x1), np.maximum(y0, y1)],
                axis=1,
            )
        )
    return STRtree(np.concatenate(boxes) if boxes else np.empty((0, 4)))


def _tile_bboxes(tx: np.ndarray, ty: np.ndarray, zoom: int) -> np.ndarray:
    """(n, 4) [lon_min, lat_min, lon_max, lat_max] per tile, vectorized."""
    n = float(1 << zoom)
    lon_min = tx / n * 360.0 - 180.0
    lon_max = (tx + 1) / n * 360.0 - 180.0
    lat_max = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * ty / n))))
    lat_min = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (ty + 1) / n))))
    return np.stack([lon_min, lat_min, lon_max, lat_max], axis=1)


class RasterPIPJoiner:
    """Drop-in replacement for ``pip.PIPMultiJoiner`` with per-tile
    memoized classification; ``specs`` is the same ``(level, out_col)``
    tuple. State (polygon subsets, edge trees, tile memos) lives once per
    worker/actor instance across batches."""

    def __init__(self, polygons_ref, specs: tuple[tuple[int, str], ...], zoom: int = 12):
        polys = (
            ray.get(polygons_ref)
            if isinstance(polygons_ref, ray.ObjectRef)
            else polygons_ref
        )
        self.zoom = zoom
        self.subs: list[tuple[PolygonSet, str, STRtree, dict]] = []
        for level, out_col in specs:
            idx = np.nonzero(polys.levels == level)[0]
            sub = PolygonSet(
                list(polys.codes[idx]),
                polys.levels[idx],
                [polys.rings_x[i] for i in idx],
                [polys.rings_y[i] for i in idx],
            )
            self.subs.append((sub, out_col, _edge_tree(sub), {}))
        # observability: exact-path point count vs total (tests assert the
        # fast path actually dominates on skewed data)
        self.n_points = 0
        self.n_refined = 0

    def _classify_missing(self, sub, etree, memo, keys, tx, ty):
        """Classify never-seen tiles: boundary → _REFINE, else the exact
        assignment of the tile center (uniform across the tile)."""
        qboxes = _tile_bboxes(tx.astype(np.float64), ty.astype(np.float64), self.zoom)
        qi, _ = etree.query_boxes(qboxes)
        boundary = np.zeros(len(keys), dtype=bool)
        boundary[qi] = True
        cx = (qboxes[:, 0] + qboxes[:, 2]) / 2.0
        cy = (qboxes[:, 1] + qboxes[:, 3]) / 2.0
        centers = assign_codes(sub, cx, cy).to_numpy(zero_copy_only=False)
        for i, k in enumerate(keys):
            memo[k] = _REFINE if boundary[i] else centers[i]

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lat) | np.isnan(lon))
        # Mercator-clipped coordinates land in a tile whose bbox does not
        # contain them — uniformity does not apply, force the exact path
        clipped = valid & (
            (np.abs(lat) > MERCATOR_LAT_LIMIT) | (lon >= 180.0) | (lon < -180.0)
        )
        vi = np.nonzero(valid & ~clipped)[0]
        tx, ty = latlng_to_tile(lat[vi], lon[vi], self.zoom)
        key = tx.astype(np.int64) * (1 << self.zoom) + ty
        if len(vi):
            uniq, inv = np.unique(key, return_inverse=True)

        for sub, out_col, etree, memo in self.subs:
            out = np.full(len(lat), None, dtype=object)
            if len(vi):
                missing = [k for k in uniq.tolist() if k not in memo]
                if missing:
                    marr = np.asarray(missing, dtype=np.int64)
                    self._classify_missing(
                        sub, etree, memo,
                        missing,
                        marr // (1 << self.zoom),
                        marr % (1 << self.zoom),
                    )
                codes = np.array([memo[k] for k in uniq.tolist()], dtype=object)
                assigned = codes[inv]
                refine_local = assigned == _REFINE
                fast = ~refine_local
                out[vi[fast]] = assigned[fast]
                refine_idx = vi[refine_local]
            else:
                refine_idx = np.empty(0, dtype=np.int64)
            exact_idx = np.concatenate([refine_idx, np.nonzero(clipped)[0]])
            if len(exact_idx):
                out[exact_idx] = assign_codes(
                    sub, lon[exact_idx], lat[exact_idx]
                ).to_numpy(zero_copy_only=False)
            self.n_points += int(valid.sum())
            self.n_refined += int(len(exact_idx))
            batch = batch.append_column(out_col, pa.array(out, type=pa.string()))
        return batch
