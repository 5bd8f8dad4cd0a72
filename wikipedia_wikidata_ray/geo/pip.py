"""Point-in-polygon spatial join (SURVEY.md §2.C4/D11/I4).

``PIPJoiner`` is the stateful actor-pool ``map_batches`` stage: polygon set
(rings + STRtree over their bboxes) is built ONCE per actor in
``__init__`` from a broadcast ``ray.put`` object ref, then every batch gets
vectorized candidate lookup + exact ray-casting containment tests.

Exact test: crossing-number (even-odd) ray casting — the classic public
algorithm — vectorized over all candidate points per polygon (the edge loop
runs per polygon, each iteration vectorized over points).

Boundary semantics: a point exactly on a polygon edge counts per the
half-open crossing rule (consistent + deterministic at any parallelism;
documented divergence from no-reference — the reference has no PIP).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .strtree import STRtree


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring_x: np.ndarray, ring_y: np.ndarray) -> np.ndarray:
    """Vectorized crossing-number test for many points vs one ring.

    ``ring_*`` are the polygon vertices (closed or open ring — handled).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x = np.asarray(ring_x, dtype=np.float64)
    y = np.asarray(ring_y, dtype=np.float64)
    if x[0] == x[-1] and y[0] == y[-1]:
        x, y = x[:-1], y[:-1]
    inside = np.zeros(len(px), dtype=bool)
    j = len(x) - 1
    for i in range(len(x)):
        cond = (y[i] > py) != (y[j] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x[j] - x[i]) * (py - y[i]) / (y[j] - y[i]) + x[i]
        inside ^= cond & (px < xint)
        j = i
    return inside


class PolygonSet:
    """Immutable polygon collection + STRtree; broadcast via ``ray.put``."""

    def __init__(self, codes: list[str], levels: np.ndarray, rings_x: list[np.ndarray], rings_y: list[np.ndarray]):
        self.codes = np.asarray(codes, dtype=object)
        self.levels = np.asarray(levels, dtype=np.int32)
        self.rings_x = [np.asarray(r, dtype=np.float64) for r in rings_x]
        self.rings_y = [np.asarray(r, dtype=np.float64) for r in rings_y]
        boxes = np.array(
            [
                (rx.min(), ry.min(), rx.max(), ry.max())
                for rx, ry in zip(self.rings_x, self.rings_y)
            ]
        ).reshape(-1, 4)
        self.tree = STRtree(boxes)

    @classmethod
    def from_arrow(cls, table: pa.Table) -> "PolygonSet":
        return cls(
            table.column("admin_code").to_pylist(),
            table.column("level").to_numpy(),
            [np.asarray(r) for r in table.column("ring_lon").to_pylist()],
            [np.asarray(r) for r in table.column("ring_lat").to_pylist()],
        )


class PIPJoiner:
    """Actor-pool stage: adds ``admin_code`` (+ per level) to geotagged rows.

    Parameters
    ----------
    polygons_ref : ray.ObjectRef | PolygonSet
        Broadcast once with ``ray.put`` on the driver; each actor fetches it
        a single time (plasma-shared per node — NOT re-shipped per batch).
    level : which admin level to assign (one output column per joiner).
    out_col : output column name.
    """

    def __init__(self, polygons_ref, level: int | None = None, out_col: str = "admin_code"):
        polys = (
            ray.get(polygons_ref)
            if isinstance(polygons_ref, ray.ObjectRef)
            else polygons_ref
        )
        if level is not None:
            keep = polys.levels == level
            idx = np.nonzero(keep)[0]
            polys = PolygonSet(
                list(polys.codes[idx]),
                polys.levels[idx],
                [polys.rings_x[i] for i in idx],
                [polys.rings_y[i] for i in idx],
            )
        self.polys = polys
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        return batch.append_column(
            self.out_col, assign_codes(self.polys, lon, lat)
        )


def assign_codes(polys: PolygonSet, lon: np.ndarray, lat: np.ndarray) -> pa.Array:
    """Vectorized PIP assignment of one polygon set over point arrays."""
    out = np.full(len(lon), None, dtype=object)
    assigned = np.zeros(len(lon), dtype=bool)
    valid = ~(np.isnan(lat) | np.isnan(lon))
    if valid.any():
        vi = np.nonzero(valid)[0]
        p_idx, b_idx = polys.tree.query_points(lon[vi], lat[vi])
        # exact test per candidate polygon, vectorized over its points;
        # np.unique ascends → lowest polygon id wins (deterministic)
        for poly in np.unique(b_idx):
            sel = p_idx[b_idx == poly]
            hit = points_in_polygon(
                lon[vi[sel]],
                lat[vi[sel]],
                polys.rings_x[poly],
                polys.rings_y[poly],
            )
            t = vi[sel[hit]]
            fresh = t[~assigned[t]]
            out[fresh] = polys.codes[poly]
            assigned[fresh] = True
    return pa.array(out, type=pa.string())


class PIPMultiJoiner:
    """One actor-pool stage assigning SEVERAL admin levels per batch
    (e.g. ``admin_code`` from level 0 + ``metro_code`` from level 1) — one
    actor pool instead of one per level, so cold-start cost and batch
    (de)serialization are paid once.

    ``specs`` is a tuple of ``(level, out_col)``; the per-level
    ``PolygonSet`` subsets are carved out once per actor in ``__init__``.
    """

    def __init__(self, polygons_ref, specs: tuple[tuple[int, str], ...]):
        polys = (
            ray.get(polygons_ref)
            if isinstance(polygons_ref, ray.ObjectRef)
            else polygons_ref
        )
        self.joiners: list[tuple[PolygonSet, str]] = []
        for level, out_col in specs:
            keep = polys.levels == level
            idx = np.nonzero(keep)[0]
            sub = PolygonSet(
                list(polys.codes[idx]),
                polys.levels[idx],
                [polys.rings_x[i] for i in idx],
                [polys.rings_y[i] for i in idx],
            )
            self.joiners.append((sub, out_col))

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        for sub, out_col in self.joiners:
            batch = batch.append_column(out_col, assign_codes(sub, lon, lat))
        return batch
