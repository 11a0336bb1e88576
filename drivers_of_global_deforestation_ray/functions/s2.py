"""S2 cell-id codec (from scratch, numpy only — no geo libs in this sandbox).

The north-star spec keys records to ~10-km analysis tiles "via batched H3
(res 5-7) / S2 cell encoding".  This module implements the public S2 cell
scheme (Google s2geometry design docs: quadrilateralized spherical cube +
Hilbert space-filling curve) as pure vectorized numpy:

- unit sphere -> cube **face** (0..5: +x,+y,+z,-x,-y,-z by largest axis);
- gnomonic face coordinates ``(u, v)`` in [-1, 1];
- the **quadratic** UV<->ST reparametrization (``S2_QUADRATIC_PROJECTION``)
  that equalizes cell areas: ``s = 0.5*sqrt(1+3u)`` for ``u >= 0`` else
  ``1 - 0.5*sqrt(1-3u)``;
- discrete ``(i, j)`` in ``[0, 2^30)`` and a per-level **Hilbert curve**
  position built from the public orientation tables
  (``kPosToIJ`` / ``kPosToOrientation``, swap/invert masks), with the
  face's initial orientation ``face & SWAP_MASK``;
- the 64-bit cell id layout ``face(3) | curve_pos(2*level) | 1 | 0...``
  and its hex **token** (trailing zeros stripped).

Everything is deterministic IEEE double math in a fixed operation order, so
the level-``L`` encode has an exact SQL twin (``pipelines/queries.py``
``s2_cells``: the same face/UV/ST algebra, with the Hilbert level loop
unrolled as chained CTEs over literal lookup CASEs).  Parity with Google's
C++ library cannot be *executed* in this sandbox (no s2 lib); fidelity is
pinned instead by the public constants above plus invariants tests
(``tests/test_s2.py``): face centers/tokens of the six level-0 cells,
ij<->curve bijectivity per face, Hilbert edge-adjacency of consecutive
positions, roundtrip through cell centers, parent/child containment, and
4-neighbor symmetry across face boundaries.

Reference-parity role: the reference keys every table by a positional 10-km
grid id (``Supplemental_Data_1.R:62-64``); S2 level 10 (~10 km edge) is the
spherical-cube analogue this engine exposes for the same tiling contract.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "MAX_LEVEL",
    "SWAP_MASK",
    "INVERT_MASK",
    "POS_TO_IJ",
    "IJ_TO_POS",
    "POS_TO_ORIENT",
    "latlng_to_cell",
    "cell_to_face_ij",
    "cell_level",
    "cell_to_center_latlng",
    "cell_parent",
    "cell_children",
    "cell_range",
    "cell_edge_neighbors",
    "cell_token",
    "token_to_cell",
]

MAX_LEVEL = 30
FACE_BITS = 3
POS_BITS = 2 * MAX_LEVEL + 1  # 61

SWAP_MASK = 1
INVERT_MASK = 2

# Public S2 Hilbert-curve sub-cell orderings.  POS_TO_IJ[orient][pos] gives
# the ij quadrant (ij = 2*i + j) visited at curve position `pos` when the
# parent cell has orientation `orient`; POS_TO_ORIENT[pos] is XORed into the
# orientation when descending into that position.
POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical:         (0,0) (0,1) (1,1) (1,0)
        [0, 2, 3, 1],  # axes swapped
        [3, 2, 0, 1],  # bits inverted
        [3, 1, 0, 2],  # swapped + inverted
    ],
    dtype=np.int64,
)
POS_TO_ORIENT = np.array([SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK], dtype=np.int64)

# IJ_TO_POS[orient][ij] — inverse permutation of each POS_TO_IJ row.
IJ_TO_POS = np.empty_like(POS_TO_IJ)
for _o in range(4):
    IJ_TO_POS[_o, POS_TO_IJ[_o]] = np.arange(4)
del _o


def _latlng_to_xyz(lat_deg, lng_deg):
    lat = np.asarray(lat_deg, dtype=np.float64) * (np.pi / 180.0)
    lng = np.asarray(lng_deg, dtype=np.float64) * (np.pi / 180.0)
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lng), cos_lat * np.sin(lng), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    """Largest-|axis| face selection + gnomonic (u, v) on that face."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # argmax with the same precedence as stacking order (x, then y, then z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(axis, (x, y, z))
    face = np.where(comp >= 0.0, axis, axis + 3).astype(np.int64)
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    for f, (ue, ve) in enumerate(_FACE_UV_EXPR):
        m = face == f
        if m.any():
            u[m] = ue(x[m], y[m], z[m])
            v[m] = ve(x[m], y[m], z[m])
    return face, u, v


# ValidFaceXYZtoUV: per-face gnomonic expressions (public table).
_FACE_UV_EXPR = (
    (lambda x, y, z: y / x, lambda x, y, z: z / x),      # 0: +x
    (lambda x, y, z: -x / y, lambda x, y, z: z / y),     # 1: +y
    (lambda x, y, z: -x / z, lambda x, y, z: -y / z),    # 2: +z
    (lambda x, y, z: z / x, lambda x, y, z: y / x),      # 3: -x
    (lambda x, y, z: z / y, lambda x, y, z: -x / y),     # 4: -y
    (lambda x, y, z: -y / z, lambda x, y, z: -x / z),    # 5: -z
)

# FaceUVtoXYZ: inverse frame (public table).
_FACE_XYZ_EXPR = (
    lambda u, v: (np.ones_like(u), u, v),
    lambda u, v: (-u, np.ones_like(u), v),
    lambda u, v: (-u, -v, np.ones_like(u)),
    lambda u, v: (-np.ones_like(u), -v, -u),
    lambda u, v: (v, -np.ones_like(u), -u),
    lambda u, v: (v, u, -np.ones_like(u)),
)


def _uv_to_st(u):
    """Quadratic projection (S2_QUADRATIC_PROJECTION).  Written with a
    single sqrt(1 + 3|u|) so np.where never feeds sqrt a negative operand;
    identical IEEE values to the two-branch form (|u| = ±u exactly)."""
    r = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))
    return np.where(u >= 0.0, r, 1.0 - r)


def _st_to_uv(s):
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _face_ij_to_curve_pos(face, i, j, level):
    """Hilbert curve position of level-`level` cell (i, j) on `face` —
    the canonical per-bit descent, vectorized over all rows at once
    (`level` iterations of O(n) table lookups)."""
    n = np.zeros_like(i, dtype=np.uint64)
    orient = (face & SWAP_MASK).astype(np.int64)
    for k in range(level - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        pos = IJ_TO_POS[orient, ij]
        n = (n << np.uint64(2)) | pos.astype(np.uint64)
        orient = orient ^ POS_TO_ORIENT[pos]
    return n


def _curve_pos_to_face_ij(face, pos, level):
    """Inverse Hilbert descent: curve position -> (i, j)."""
    i = np.zeros_like(pos, dtype=np.int64)
    j = np.zeros_like(pos, dtype=np.int64)
    orient = (face & SWAP_MASK).astype(np.int64)
    for k in range(level - 1, -1, -1):
        p = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        ij = POS_TO_IJ[orient, p]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        orient = orient ^ POS_TO_ORIENT[p]
    return i, j


def latlng_to_cell(lat_deg, lng_deg, level: int) -> np.ndarray:
    """Vectorized (lat, lng) degrees -> uint64 S2 cell id at `level`."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    x, y, z = _latlng_to_xyz(lat_deg, lng_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    n_cells = 1 << level
    i = np.clip(np.floor(_uv_to_st(u) * n_cells), 0, n_cells - 1).astype(np.int64)
    j = np.clip(np.floor(_uv_to_st(v) * n_cells), 0, n_cells - 1).astype(np.int64)
    return _face_ij_to_cell(face, i, j, level)


def _face_ij_to_cell(face, i, j, level):
    pos = _face_ij_to_curve_pos(face, i, j, level)
    # id = face(3 bits) | pos(2*level bits) | 1 | zeros
    shift = np.uint64(POS_BITS - 2 * level)  # bits below the marker's slot
    fid = face.astype(np.uint64) << np.uint64(POS_BITS)
    return fid | (((pos << np.uint64(1)) | np.uint64(1)) << (shift - np.uint64(1)))


def cell_level(cell: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit (the marker)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell & (~cell + np.uint64(1))
    # marker at bit (POS_BITS - 1 - 2*level)  =>  level from bit index
    bit = np.zeros(cell.shape, dtype=np.int64)
    v = lsb.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bit += np.where(big, s, 0)
        v = np.where(big, v >> np.uint64(s), v)
    return (POS_BITS - 1 - bit) >> 1


def cell_to_face_ij(cell: np.ndarray, level: int):
    """Decode level-`level` cell ids -> (face, i, j)."""
    cell = np.asarray(cell, dtype=np.uint64)
    face = (cell >> np.uint64(POS_BITS)).astype(np.int64)
    pos = (cell >> np.uint64(POS_BITS - 2 * level)) & (
        (np.uint64(1) << np.uint64(2 * level)) - np.uint64(1))
    i, j = _curve_pos_to_face_ij(face, pos, level)
    return face, i, j


def cell_to_center_latlng(cell: np.ndarray, level: int):
    """Center of each level-`level` cell as (lat_deg, lng_deg)."""
    face, i, j = cell_to_face_ij(cell, level)
    inv = 1.0 / (1 << level)
    u = _st_to_uv((i.astype(np.float64) + 0.5) * inv)
    v = _st_to_uv((j.astype(np.float64) + 0.5) * inv)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, expr in enumerate(_FACE_XYZ_EXPR):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = expr(u[m], v[m])
    lat = np.arctan2(z, np.sqrt(x * x + y * y)) * (180.0 / np.pi)
    lng = np.arctan2(y, x) * (180.0 / np.pi)
    return lat, lng


def cell_parent(cell: np.ndarray, level: int | None = None) -> np.ndarray:
    """Parent id at `level` (default: one level up)."""
    cell = np.asarray(cell, dtype=np.uint64)
    cur = cell_level(cell)
    new = cur - 1 if level is None else np.full_like(cur, level)
    if np.any(new < 0) or np.any(new > cur):
        raise ValueError("parent level must be in [0, cell_level]")
    lsb = np.uint64(1) << (np.uint64(POS_BITS - 1) - (np.uint64(2) * new.astype(np.uint64)))
    return (cell & (~lsb + np.uint64(1)) & ~lsb) | lsb  # clear below, set marker


def cell_children(cell: np.uint64) -> np.ndarray:
    """The four child ids of a single cell (curve order)."""
    cell = np.uint64(cell)
    lvl = int(cell_level(np.array([cell]))[0])
    if lvl >= MAX_LEVEL:
        raise ValueError("leaf cells have no children")
    old_lsb = np.uint64(1) << np.uint64(POS_BITS - 1 - 2 * lvl)
    new_lsb = old_lsb >> np.uint64(2)
    base = cell - old_lsb + new_lsb  # first child
    return base + np.arange(4, dtype=np.uint64) * (new_lsb << np.uint64(1))


def cell_range(cell: np.ndarray):
    """(range_min, range_max) of leaf ids covered by each cell — the
    containment test is ``range_min <= leaf <= range_max`` (ids at equal
    level sort in Hilbert order, so this is also the child-range test)."""
    cell = np.asarray(cell, dtype=np.uint64)
    lsb = cell & (~cell + np.uint64(1))
    return cell - lsb + np.uint64(1), cell + lsb - np.uint64(1)


def cell_edge_neighbors(cell: np.ndarray, level: int) -> np.ndarray:
    """The 4 edge neighbors of each level-`level` cell, shape (n, 4).

    Neighbors that cross a cube edge are resolved by stepping one cell pitch
    in (s, t), extending the quadratic ST->UV smoothly past [-1, 1], and
    re-projecting the resulting direction vector through the face frame —
    the same geometric wrap S2's FromFaceIJWrap performs discretely."""
    face, i, j = cell_to_face_ij(cell, level)
    n_cells = 1 << level
    inv = 1.0 / n_cells
    out = np.empty((len(face), 4), dtype=np.uint64)
    steps = ((0, -1), (0, 1), (-1, 0), (1, 0))
    for col, (di, dj) in enumerate(steps):
        ni, nj = i + di, j + dj
        inside = (ni >= 0) & (ni < n_cells) & (nj >= 0) & (nj < n_cells)
        res = np.empty(len(face), dtype=np.uint64)
        if inside.any():
            res[inside] = _face_ij_to_cell(face[inside], ni[inside], nj[inside], level)
        outside = ~inside
        if outside.any():
            fo = face[outside]
            u = _st_to_uv((ni[outside].astype(np.float64) + 0.5) * inv)
            v = _st_to_uv((nj[outside].astype(np.float64) + 0.5) * inv)
            x = np.empty_like(u)
            y = np.empty_like(u)
            z = np.empty_like(u)
            for f, expr in enumerate(_FACE_XYZ_EXPR):
                m = fo == f
                if m.any():
                    x[m], y[m], z[m] = expr(u[m], v[m])
            f2, u2, v2 = _xyz_to_face_uv(x, y, z)
            i2 = np.clip(np.floor(_uv_to_st(u2) * n_cells), 0, n_cells - 1).astype(np.int64)
            j2 = np.clip(np.floor(_uv_to_st(v2) * n_cells), 0, n_cells - 1).astype(np.int64)
            res[outside] = _face_ij_to_cell(f2, i2, j2, level)
        out[:, col] = res
    return out


_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def cell_token(cell: np.ndarray) -> np.ndarray:
    """Canonical hex token: 16 hex digits with trailing zeros stripped
    (vectorized; no Python per-row loop)."""
    cell = np.asarray(cell, dtype=np.uint64)
    nibbles = np.empty((len(cell), 16), dtype=np.uint8)
    for k in range(16):
        nibbles[:, k] = ((cell >> np.uint64(60 - 4 * k)) & np.uint64(0xF)).astype(np.uint8)
    chars = _HEX[nibbles]
    # token length = position of last nonzero nibble + 1 (id 0 -> "X" sentinel)
    nz = nibbles != 0
    length = 16 - np.argmax(nz[:, ::-1], axis=1)
    length[~nz.any(axis=1)] = 0
    flat = chars.tobytes().decode("ascii")
    return np.array([flat[16 * r: 16 * r + L] if L else "X"
                     for r, L in enumerate(length)], dtype=object)


def token_to_cell(tokens) -> np.ndarray:
    return np.array([np.uint64(int(t.ljust(16, "0"), 16)) if t != "X" else np.uint64(0)
                     for t in tokens], dtype=np.uint64)
