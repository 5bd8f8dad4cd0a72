"""Deterministic admin-polygon and places fixtures (FIXTURES.md §2 graft
rows).

Both are closed-form (no RNG) so DuckDB oracles can reproduce them:

- **admin level 0** ("countries"): the 6×12 grid of 30°×30° rectangles
  covering [-90,90]×[-180,180); code ``A{row}_{col}`` with
  ``row = floor((lat+90)/30)``, ``col = floor((lon+180)/30)``. Ray-casting
  on axis-aligned rectangles gives exactly half-open ``[lo, hi)`` semantics
  (tests/test_geo.py::TestPIP), so the floor expressions are an exact SQL
  oracle.
- **admin level 1** ("metros"): regular hexagons (circumradius R=1.0°,
  vertices at 0°,60°,…300°) centered on the 5 megacities
  (sources/pages_gen.MEGACITIES); code ``M{i}``. A regular hexagon is the
  intersection of 3 absolute-value band constraints → SQL-expressible:
  ``|dy| ≤ R√3/2 AND |√3·dx + dy| ≤ R√3 AND |√3·dx − dy| ≤ R√3``.
- **places**: ``N_PLACES`` rows, ``lat = ((place_id*9973) % 1600001)/1e4
  − 80``, ``lon = ((place_id*99991) % 3600001)/1e4 − 180``,
  ``rank = place_id % 30`` — reproducible in SQL via ``range(N_PLACES)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..schemas import ADMIN_POLYGONS, PLACES
from .pages_gen import MEGACITIES

METRO_RADIUS_DEG = 1.0
N_PLACES = 2000


def admin_polygons_table() -> pa.Table:
    codes: list[str] = []
    levels: list[int] = []
    ring_lon: list[list[float]] = []
    ring_lat: list[list[float]] = []

    for row in range(6):
        for col in range(12):
            lat0, lat1 = -90.0 + 30 * row, -90.0 + 30 * (row + 1)
            lon0, lon1 = -180.0 + 30 * col, -180.0 + 30 * (col + 1)
            codes.append(f"A{row}_{col}")
            levels.append(0)
            ring_lon.append([lon0, lon1, lon1, lon0, lon0])
            ring_lat.append([lat0, lat0, lat1, lat1, lat0])

    for i, (clat, clon) in enumerate(MEGACITIES):
        ang = np.radians(np.arange(0, 360, 60, dtype=np.float64))
        vx = clon + METRO_RADIUS_DEG * np.cos(ang)
        vy = clat + METRO_RADIUS_DEG * np.sin(ang)
        codes.append(f"M{i}")
        levels.append(1)
        ring_lon.append(list(vx) + [vx[0]])
        ring_lat.append(list(vy) + [vy[0]])

    return pa.Table.from_arrays(
        [
            pa.array(codes, type=pa.string()),
            pa.array(levels, type=pa.int32()),
            pa.array(ring_lon, type=pa.list_(pa.float64())),
            pa.array(ring_lat, type=pa.list_(pa.float64())),
        ],
        schema=ADMIN_POLYGONS,
    )


def places_table(n_places: int = N_PLACES) -> pa.Table:
    pid = np.arange(n_places, dtype=np.int64)
    lat = ((pid * 9973) % 1600001) / 10000.0 - 80.0
    lon = ((pid * 99991) % 3600001) / 10000.0 - 180.0
    return pa.Table.from_arrays(
        [
            pa.array(pid),
            pa.array([f"Place_{i}" for i in pid], type=pa.string()),
            pa.array(lat),
            pa.array(lon),
            pa.array((pid % 30).astype(np.int32)),
        ],
        schema=PLACES,
    )


def places_dict(n_places: int = N_PLACES) -> dict[str, np.ndarray]:
    """numpy-dict form for broadcasting to KNNJoiner actors via ray.put."""
    t = places_table(n_places)
    return {
        "place_id": t.column("place_id").to_numpy(),
        "lat": t.column("lat").to_numpy(),
        "lon": t.column("lon").to_numpy(),
        "rank": t.column("rank").to_numpy(),
    }
