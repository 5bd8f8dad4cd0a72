"""S2 cell-id encoding, vectorized with numpy — implemented from scratch.

Public-domain algorithm per the S2 geometry spec (s2geometry.io: quadratic
ST projection, cube-face decomposition, Hilbert space-filling curve with
4-bit lookup tables). No S2 library exists in this container, so this is a
ground-up implementation; tests verify structural invariants (face mapping,
prefix-hierarchy, round-trip through the inverse transform) rather than
comparing against a third-party oracle.

Used by the spatial layer (SURVEY.md §2.I3) as a uint64 ``s2_cell`` column
computed inside stateless ``map_batches`` stages.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
LOOKUP_BITS = 4
SWAP_MASK = 0x01
INVERT_MASK = 0x02

_POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)
_POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped & inverted
)

_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup(level: int, i: int, j: int, orig: int, orientation: int, pos: int):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orientation]
    for idx in range(4):
        _init_lookup(
            level,
            i + (r[idx] >> 1),
            j + (r[idx] & 1),
            orig,
            orientation ^ _POS_TO_ORIENTATION[idx],
            pos + idx,
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, _o, 0)


def latlng_to_face_uv(lat_deg: np.ndarray, lng_deg: np.ndarray):
    """(lat°, lng°) → (face 0..5, u, v) on the unit cube."""
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cosphi = np.cos(phi)
    x = cosphi * np.cos(theta)
    y = cosphi * np.sin(theta)
    z = np.sin(phi)

    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(axis, [x, y, z])
    face = np.where(major >= 0, axis, axis + 3)

    # ValidFaceXyzToUv per face (s2geometry spec)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: -x / z),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ue(), u)
                v = np.where(m, ve(), v)
    return face.astype(np.uint64), u, v


def _st_from_uv(u: np.ndarray) -> np.ndarray:
    # quadratic projection (S2_QUADRATIC_PROJECTION); errstate: np.where
    # evaluates both branches, the untaken one may sqrt a negative
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _uv_from_st(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _ij_from_st(s: np.ndarray) -> np.ndarray:
    limit = (1 << MAX_LEVEL) - 1
    return np.clip(np.floor(s * (1 << MAX_LEVEL)), 0, limit).astype(np.uint64)


def cell_id_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Hilbert-curve leaf cell id (uint64) from face + 30-bit ij, vectorized."""
    face = face.astype(np.uint64)
    n = face << np.uint64(60)
    bits = face & np.uint64(SWAP_MASK)
    mask = np.uint64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = np.uint64(k * LOOKUP_BITS)
        bits += ((i >> kk) & mask) << np.uint64(LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << np.uint64(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return n * np.uint64(2) + np.uint64(1)


def face_ij_from_cell_id(cell_id: np.ndarray):
    """Inverse of cell_id_from_face_ij (leaf ids) — used for round-trip tests
    and cell-center decoding."""
    cid = np.asarray(cell_id, dtype=np.uint64)
    face = (cid >> np.uint64(61)).astype(np.uint64)
    n = cid >> np.uint64(1)  # drop trailing 1 bit of leaf id
    bits = face & np.uint64(SWAP_MASK)
    i = np.zeros(len(cid), dtype=np.uint64)
    j = np.zeros(len(cid), dtype=np.uint64)
    for k in range(7, -1, -1):
        # top iteration carries only 30-7*4=2 bits of i and j (60-bit position)
        nbits = MAX_LEVEL - 7 * LOOKUP_BITS if k == 7 else LOOKUP_BITS
        nbits_mask = np.uint64((1 << (2 * nbits)) - 1)
        bits += ((n >> np.uint64(k * 2 * LOOKUP_BITS)) & nbits_mask) << np.uint64(2)
        bits = _LOOKUP_IJ[bits]
        i |= (bits >> np.uint64(LOOKUP_BITS + 2)) << np.uint64(k * LOOKUP_BITS)
        j |= ((bits >> np.uint64(2)) & np.uint64((1 << LOOKUP_BITS) - 1)) << np.uint64(
            k * LOOKUP_BITS
        )
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return face, i, j


def parent_at_level(leaf_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell id at ``level`` (sets the sentinel lsb, clears below)."""
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    low = lsb - np.uint64(1)
    return (np.asarray(leaf_id, dtype=np.uint64) & ~low) | lsb


def latlng_to_cell(lat_deg, lng_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """Main entry: arrays of degrees → uint64 S2 cell ids at ``level``."""
    face, u, v = latlng_to_face_uv(lat_deg, lng_deg)
    i = _ij_from_st(_st_from_uv(u))
    j = _ij_from_st(_st_from_uv(v))
    leaf = cell_id_from_face_ij(face, i, j)
    if level >= MAX_LEVEL:
        return leaf
    return parent_at_level(leaf, level)


def cell_to_latlng(cell_id: np.ndarray):
    """Leaf-cell center → (lat°, lng°). For tests/decoding."""
    face, i, j = face_ij_from_cell_id(cell_id)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    u = _uv_from_st(s)
    v = _uv_from_st(t)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    # inverse of the face → (u, v) frames above (FaceUvToXyz)
    frames = [
        (lambda: (np.ones_like(u), u, v)),
        (lambda: (-u, np.ones_like(u), v)),
        (lambda: (-u, -v, np.ones_like(u))),
        (lambda: (-np.ones_like(u), -v, -u)),
        (lambda: (v, -np.ones_like(u), -u)),
        (lambda: (v, u, -np.ones_like(u))),
    ]
    for f, fr in enumerate(frames):
        m = face == f
        if m.any():
            fx, fy, fz = fr()
            x = np.where(m, fx, x)
            y = np.where(m, fy, y)
            z = np.where(m, fz, z)
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / norm))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng
