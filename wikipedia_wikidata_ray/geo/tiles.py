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
