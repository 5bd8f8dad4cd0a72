"""Spatial cell/tile encoding stage (SURVEY.md §2.I2/I3/I6).

Stateless ``map_batches`` body adding ``s2_cell``, ``hex_r{5..9}`` and
``tile_x``/``tile_y``/``tile_key`` columns to any table with ``lat``/``lon``
float64 columns (nulls pass through as nulls). Pure numpy — zero Python
per-row work."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..geo import hexgrid, s2, tiles


class GeocodeStage:
    """Callable for ``map_batches(GeocodeStage(cfg), batch_format="pyarrow")``.

    Plain-function semantics (no heavy state) but kept as a class so the
    config is bound once; Ray treats argless callables fine as tasks when
    passed as an instance... we pass the bound method to stay a stateless
    task stage."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return encode_batch(batch, self.cfg)


def encode_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    valid = ~(np.isnan(lat) | np.isnan(lon))
    vlat = np.where(valid, lat, 0.0)
    vlon = np.where(valid, lon, 0.0)

    out = batch
    s2c = s2.latlng_to_cell(vlat, vlon, cfg.s2_level)
    out = out.append_column("s2_cell", pa.array(s2c, mask=~valid))
    for res in cfg.hex_resolutions:
        hc = hexgrid.latlng_to_cell(vlat, vlon, res)
        out = out.append_column(f"hex_r{res}", pa.array(hc, mask=~valid))
    tx, ty = tiles.latlng_to_tile(vlat, vlon, cfg.tile_zoom)
    out = out.append_column("tile_x", pa.array(tx, mask=~valid))
    out = out.append_column("tile_y", pa.array(ty, mask=~valid))
    out = out.append_column(
        "tile_key", pa.array(tiles.tile_key(tx, ty, cfg.tile_zoom), mask=~valid)
    )
    return out
