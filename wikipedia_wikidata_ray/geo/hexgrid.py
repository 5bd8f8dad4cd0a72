"""Multi-resolution hexagonal cell grid ("H3-style"), vectorized numpy.

The north rule asks for H3-res-5..9 cell encoding (SURVEY.md §2.I2). Uber's
H3 library is not available in this container and its icosahedral base-cell
tables cannot be reproduced from memory, so this module implements an
**honest, self-contained hexagonal hierarchy with the same API semantics**
(documented divergence — cell ids are NOT bit-compatible with Uber H3):

- pointy-top axial hex grid laid on the equirectangular (lon, lat) plane;
- resolution ``r`` has circumradius ``10/sqrt(7)^r`` degrees (aperture-7
  area scaling like H3; res 5 ≈ 8.6 km edge, close to H3 res 5);
- ``cell_to_parent`` maps a cell to the coarser cell containing its center
  (approximate containment — exactly H3's own parent/child semantics, which
  are also approximate);
- ``k_ring`` / ``neighbors`` via axial coordinate offsets;
- cell id packing: uint64 ``res(4b) | q+2^29 (30b) | r+2^29 (30b)``.

Everything is a pure vectorized function → used inside stateless
``map_batches`` stages; tests in tests/test_geo.py.
"""

from __future__ import annotations

import numpy as np

SQRT3 = np.sqrt(3.0)
_BASE_RADIUS_DEG = 10.0
_OFFSET = np.uint64(1 << 29)
_MASK30 = np.uint64((1 << 30) - 1)


def cell_size(res: int) -> float:
    """Hex circumradius in degrees at resolution ``res``."""
    return _BASE_RADIUS_DEG / (np.sqrt(7.0) ** res)


def _axial_round(qf: np.ndarray, rf: np.ndarray):
    """Cube-coordinate rounding (classic hex-grid algorithm), vectorized."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def latlng_to_axial(lat_deg, lng_deg, res: int):
    """(lat°, lon°) → integer axial (q, r) at ``res``."""
    size = cell_size(res)
    x = np.asarray(lng_deg, dtype=np.float64)
    y = np.asarray(lat_deg, dtype=np.float64)
    qf = (SQRT3 / 3.0 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    return _axial_round(qf, rf)


def axial_to_latlng(q: np.ndarray, r: np.ndarray, res: int):
    """Cell center (lat°, lon°)."""
    size = cell_size(res)
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    lng = size * SQRT3 * (q + r / 2.0)
    lat = size * 1.5 * r
    return lat, lng


def pack(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    qq = (q.astype(np.int64) + np.int64(1 << 29)).astype(np.uint64) & _MASK30
    rr = (r.astype(np.int64) + np.int64(1 << 29)).astype(np.uint64) & _MASK30
    return (np.uint64(res) << np.uint64(60)) | (qq << np.uint64(30)) | rr


def unpack(cell: np.ndarray):
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(60)).astype(np.int64)
    q = ((cell >> np.uint64(30)) & _MASK30).astype(np.int64) - (1 << 29)
    r = (cell & _MASK30).astype(np.int64) - (1 << 29)
    return q, r, res


def latlng_to_cell(lat_deg, lng_deg, res: int) -> np.ndarray:
    """Main entry: arrays of degrees → uint64 hex cell ids at ``res``."""
    q, r = latlng_to_axial(lat_deg, lng_deg, res)
    return pack(q, r, res)


def cell_to_latlng(cell: np.ndarray):
    q, r, res = unpack(cell)
    assert len(np.unique(res)) <= 1, "mixed resolutions in one call"
    return axial_to_latlng(q, r, int(res[0]) if len(res) else 0)


def cell_to_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarser cell containing this cell's center (H3-like approximate
    containment)."""
    lat, lng = cell_to_latlng(cell)
    return latlng_to_cell(lat, lng, parent_res)


_NEIGHBOR_OFFSETS = np.array(
    [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64
)


def k_ring(cell: int, k: int = 1) -> np.ndarray:
    """All cell ids within ``k`` hex steps of ``cell`` (incl. itself)."""
    q0, r0, res = unpack(np.array([cell], dtype=np.uint64))
    qs, rs = [], []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            qs.append(q0[0] + dq)
            rs.append(r0[0] + dr)
    return pack(np.array(qs), np.array(rs), int(res[0]))


def neighbors(cell: int) -> np.ndarray:
    q0, r0, res = unpack(np.array([cell], dtype=np.uint64))
    q = q0[0] + _NEIGHBOR_OFFSETS[:, 0]
    r = r0[0] + _NEIGHBOR_OFFSETS[:, 1]
    return pack(q, r, int(res[0]))


def ring_smooth_counts(cells: np.ndarray, counts: np.ndarray):
    """Sparse hex stencil: given (cell → count) pairs, return the k=1
    ring-smoothed pairs — every cell in some input cell's 7-cell ring
    (itself + 6 axial neighbors) with the sum of contributing counts.
    Fully vectorized (one 7× scatter + lexsort reduce); the distributed
    shape is the same as pipelines/queries.q_tile_heat_smooth — scatter
    COUNT PARTIALS in-batch, merge sums across blocks — so this kernel
    drops into a map_batches + merge_group_sums pipeline unchanged."""
    cells = np.asarray(cells, dtype=np.uint64)
    counts = np.asarray(counts)
    if len(cells) == 0:
        return cells, counts.astype(np.int64)
    q, r, res = unpack(cells)
    offs = np.vstack(([0, 0], _NEIGHBOR_OFFSETS))  # self + 6 neighbors
    qq = (q[:, None] + offs[None, :, 0]).ravel()
    rr = (r[:, None] + offs[None, :, 1]).ravel()
    out_cells = pack(qq, rr, int(res[0]))
    out_counts = np.repeat(counts.astype(np.int64), 7)
    order = np.argsort(out_cells, kind="stable")
    sc, scnt = out_cells[order], out_counts[order]
    new = np.ones(len(sc), dtype=bool)
    new[1:] = sc[1:] != sc[:-1]
    starts = np.flatnonzero(new)
    sums = np.add.reduceat(scnt, starts)
    return sc[starts], sums
