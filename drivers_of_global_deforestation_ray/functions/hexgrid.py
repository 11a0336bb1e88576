"""Aperture-7 icosahedral hexagonal index (from scratch, numpy only).

The north-star spec keys records to ~10-km analysis tiles "via batched H3
(res 5-7) / S2 cell encoding" and smooths with "H3 k-ring kNN".  The S2
half of that contract is ``functions/s2.py``; this module is the hexagonal
half, built from the *public H3 design family* (Uber H3 docs / Sahr's DGGS
papers: icosahedron + gnomonic projection + aperture-7 hexagon ladder)
with no geo libraries:

- a unit **icosahedron** from the golden ratio (12 vertices = cyclic
  permutations of ``(0, ±1, ±φ)``), 20 triangular faces enumerated
  deterministically, each with an orthonormal tangent frame;
- per-point **face selection** by max center dot product (first-max-wins
  tie-break, matching ``np.argmax``), then **gnomonic projection** into
  that face's plane — both scale-invariant (pure ratios), so any 3D point
  encodes without normalization;
- a **hexagonal lattice** per face whose resolution ladder is aperture 7:
  each step shrinks the lattice pitch by ``sqrt(7)`` and rotates by the
  classic aperture-7 angle ``atan(sqrt(3)/5) ≈ 19.1066°`` (Class II/III
  alternation, exactly H3's ladder geometry); pitch is calibrated so
  res 5 ≈ H3 res 5 (~10-km tile, the north star's working resolution);
- fractional axial coordinates snapped to the nearest hex center by
  **cube rounding** (half-away ``floor(x+0.5)`` + largest-residual fix,
  the same explicit tie rule on the engine and SQL side);
- a 64-bit id: ``res(4) | face(5) | i+2^26 (27) | j+2^26 (27)``.

Cell ids therefore follow H3's *design*, not its bit layout: H3's exact
base-cell numbering derives from library-internal orientation constants
that cannot be reproduced from public specification alone, so this codec
pins fidelity the same way ``functions/s2.py`` does — identical public
geometry + an exact SQL twin (``pipelines/queries.py:_hex_sql``) + the
invariant suite in ``tests/test_hexgrid.py``.

Semantics contract (documented, tested):

- ``encode`` induces a true deterministic **partition** of the sphere
  (every point -> exactly one id).  Away from icosahedron-face seams the
  cells are regular hexagons of the lattice; within ~one lattice pitch of
  a seam a cell is clipped by the face-selection boundary, so a *cell
  center* can land across the seam and re-encode to a neighboring face's
  cell.  ``tests/test_hexgrid.py`` measures that band (<2% of cells at
  res 5) and asserts exact center-roundtrip everywhere outside it.
- ``k_ring`` and ``parent`` are *geometric re-encodes* (neighbor/parent
  center -> ``encode``), which makes them total, deterministic, and
  seam-correct by construction: a neighbor across the seam snaps into the
  adjacent face's lattice.  Like real H3, the aperture-7 hierarchy is not
  strictly nested; ``parent`` is "cell of my center at res-1".

Reference-parity role: the reference keys every table by a positional
10-km grid id (``Supplemental_Data_1.R:62-64``); this index is the
hexagonal analogue of that tiling contract, sitting beside the
equirectangular ladder (``functions/grid.py``) and the spherical-cube one
(``functions/s2.py``).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "MAX_RES",
    "APERTURE_ANGLE",
    "PITCH0",
    "FACE_N",
    "FACE_EX",
    "FACE_EY",
    "FWD",
    "INV",
    "latlng_to_hex",
    "xyz_to_hex",
    "hex_to_center",
    "hex_to_latlng",
    "hex_pack",
    "hex_unpack",
    "hex_parent",
    "hex_k_ring",
    "hex_token",
    "ring_offsets",
    "CORNER_OFFSETS",
    "hex_boundary",
]

MAX_RES = 15
#: aperture-7 inter-resolution rotation: atan(sqrt(3)/5) ≈ 19.1066°
APERTURE_ANGLE = float(np.arctan2(np.sqrt(3.0), 5.0))
#: lattice pitch (center-to-center distance in gnomonic plane units) at
#: res 0 — calibrated so res 5 pitch ≈ 14.7 km on Earth ≈ H3 res 5.
PITCH0 = 0.3

_BIAS = 1 << 26
_SQ3 = float(np.sqrt(3.0))


def _build_icosahedron() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic 20-face icosahedron: unit vertices from the golden
    ratio, faces enumerated as sorted vertex triples in lexicographic
    order, per-face orthonormal tangent frame (ex toward the lowest-index
    vertex, ey = n × ex)."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    raw = []
    for a in (1.0, -1.0):
        for b in (phi, -phi):
            raw += [(0.0, a, b), (a, b, 0.0), (b, 0.0, a)]
    verts = np.array(raw, dtype=np.float64)
    verts /= np.sqrt(1.0 + phi * phi)
    # adjacent vertices are the closest pairs: dot == 1/sqrt(5)
    dots = verts @ verts.T
    adj = dots > 0.3  # adjacent dot ≈ 0.447; next level down is 0 (orthogonal)
    np.fill_diagonal(adj, False)
    faces = []
    for a in range(12):
        for b in range(a + 1, 12):
            if not adj[a, b]:
                continue
            for c in range(b + 1, 12):
                if adj[a, c] and adj[b, c]:
                    faces.append((a, b, c))
    faces.sort()
    assert len(faces) == 20
    n = np.empty((20, 3)); ex = np.empty((20, 3)); ey = np.empty((20, 3))
    for f, (a, b, c) in enumerate(faces):
        ctr = verts[a] + verts[b] + verts[c]
        ctr /= np.sqrt(ctr @ ctr)
        e = verts[a] - (verts[a] @ ctr) * ctr
        e /= np.sqrt(e @ e)
        n[f], ex[f], ey[f] = ctr, e, np.cross(ctr, e)
    return n, ex, ey


FACE_N, FACE_EX, FACE_EY = _build_icosahedron()


def _build_transforms() -> tuple[np.ndarray, np.ndarray]:
    """Per-resolution 2x2 forward (plane xy -> fractional axial ij) and
    inverse (integer ij -> plane xy) matrices.

    Inverse = pitch_r · R(r·α) · A with hex basis A = [[1, 1/2],
    [0, √3/2]]; forward is its exact inverse built from the same floats.
    """
    fwd = np.empty((MAX_RES + 1, 2, 2)); inv = np.empty((MAX_RES + 1, 2, 2))
    for r in range(MAX_RES + 1):
        pitch = PITCH0 / np.sqrt(7.0) ** r
        c, s = np.cos(r * APERTURE_ANGLE), np.sin(r * APERTURE_ANGLE)
        rot = np.array([[c, -s], [s, c]])
        basis = np.array([[1.0, 0.5], [0.0, _SQ3 / 2.0]])
        m = pitch * (rot @ basis)
        inv[r] = m
        det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
        fwd[r] = np.array([[m[1, 1], -m[0, 1]], [-m[1, 0], m[0, 0]]]) / det
    return fwd, inv


FWD, INV = _build_transforms()


def _round_half_away(v: np.ndarray) -> np.ndarray:
    """floor(x+0.5): the explicit half-away rule shared with the SQL twin."""
    return np.floor(v + 0.5)


def _cube_round(fi: np.ndarray, fj: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Snap fractional axial (i, j) to the nearest hex center.

    Standard cube rounding with an explicit, SQL-reproducible tie chain:
    round each of (x, y, z) = (i, -i-j, j) half-away, then recompute the
    coordinate with the largest rounding residual (x first, then y).
    """
    x, z = fi, fj
    y = -x - z
    rx, ry, rz = _round_half_away(x), _round_half_away(y), _round_half_away(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    # fix_x: x <- -y-z; fix_y: y changes (i, j unaffected); fix_z: z <- -x-y
    i = np.where(fix_x, -ry - rz, rx)
    j = np.where(fix_z, -rx - ry, rz)
    return i.astype(np.int64), j.astype(np.int64)


def hex_pack(res, face, i, j) -> np.ndarray:
    """(res, face, i, j) -> int64 id: res(4) | face(5) | i+2^26 | j+2^26."""
    res = np.asarray(res, dtype=np.int64)
    face = np.asarray(face, dtype=np.int64)
    return ((res << np.int64(59)) | (face << np.int64(54))
            | ((np.asarray(i, dtype=np.int64) + _BIAS) << np.int64(27))
            | (np.asarray(j, dtype=np.int64) + _BIAS))


def hex_unpack(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    ids = np.asarray(ids, dtype=np.int64)
    res = ids >> np.int64(59)
    face = (ids >> np.int64(54)) & np.int64(0x1F)
    i = ((ids >> np.int64(27)) & np.int64((1 << 27) - 1)) - _BIAS
    j = (ids & np.int64((1 << 27) - 1)) - _BIAS
    return res, face, i, j


def xyz_to_hex(x: np.ndarray, y: np.ndarray, z: np.ndarray, res: int) -> np.ndarray:
    """Encode arbitrary (not necessarily unit) 3D points.

    Scale-invariant by construction: face choice is an argmax of dot
    products and the gnomonic coordinates are ratios.  All arithmetic is
    elementwise in a fixed left-to-right order (no matmul) so the SQL twin
    reproduces it bit-for-bit.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    dots = (x[:, None] * FACE_N[:, 0] + y[:, None] * FACE_N[:, 1]
            + z[:, None] * FACE_N[:, 2])
    face = np.argmax(dots, axis=1)
    n, e1, e2 = FACE_N[face], FACE_EX[face], FACE_EY[face]
    d = x * n[:, 0] + y * n[:, 1] + z * n[:, 2]
    u = (x * e1[:, 0] + y * e1[:, 1] + z * e1[:, 2]) / d
    v = (x * e2[:, 0] + y * e2[:, 1] + z * e2[:, 2]) / d
    f = FWD[res]
    fi = f[0, 0] * u + f[0, 1] * v
    fj = f[1, 0] * u + f[1, 1] * v
    i, j = _cube_round(fi, fj)
    return hex_pack(np.full_like(i, res), face, i, j)


def latlng_to_hex(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """Encode degrees lat/lon at ``res`` (same trig form as the S2 codec)."""
    la = np.asarray(lat, dtype=np.float64) * (np.pi / 180.0)
    lo = np.asarray(lon, dtype=np.float64) * (np.pi / 180.0)
    return xyz_to_hex(np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                      np.sin(la), res)


def hex_to_center(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cell id -> 3D center point (on the gnomonic plane, NOT normalized —
    ``xyz_to_hex`` is scale-invariant so re-encoding needs no norm)."""
    res, face, i, j = hex_unpack(ids)
    m = INV[res]
    fi = i.astype(np.float64)
    fj = j.astype(np.float64)
    px = m[:, 0, 0] * fi + m[:, 0, 1] * fj
    py = m[:, 1, 0] * fi + m[:, 1, 1] * fj
    n, e1, e2 = FACE_N[face], FACE_EX[face], FACE_EY[face]
    return (n[:, 0] + px * e1[:, 0] + py * e2[:, 0],
            n[:, 1] + px * e1[:, 1] + py * e2[:, 1],
            n[:, 2] + px * e1[:, 2] + py * e2[:, 2])


def hex_to_latlng(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell center in degrees (normalized to the sphere)."""
    x, y, z = hex_to_center(ids)
    r = np.sqrt(x * x + y * y + z * z)
    return (np.degrees(np.arcsin(z / r)), np.degrees(np.arctan2(y, x)))


def hex_parent(ids: np.ndarray, parent_res: int) -> np.ndarray:
    """Geometric parent: the ``parent_res`` cell containing my center."""
    x, y, z = hex_to_center(ids)
    return xyz_to_hex(x, y, z, parent_res)


def ring_offsets(k: int) -> np.ndarray:
    """Axial (di, dj) offsets of the distance-<=k hex disk, deterministic
    order (center first, then rings outward, each ring walked the same
    way), shape (1+3k(k+1), 2)."""
    out = [(0, 0)]
    # walk order chosen so each leg traces the ring edge from the start
    # corner (ring, -ring): the walk closes back on the corner exactly
    dirs = [(0, 1), (-1, 1), (-1, 0), (0, -1), (1, -1), (1, 0)]
    for ring in range(1, k + 1):
        ci, cj = ring, -ring  # corner at direction (1, -1) * ring
        for d in range(6):
            for _ in range(ring):
                out.append((ci, cj))
                ci += dirs[d][0]
                cj += dirs[d][1]
    return np.array(out, dtype=np.int64)


def hex_k_ring(ids: np.ndarray, k: int) -> np.ndarray:
    """Distance-<=k disk around each cell, shape (n, 1+3k(k+1)).

    Neighbors are *geometric re-encodes*: offset centers are computed in
    the home face's lattice frame and pushed back through ``xyz_to_hex``,
    so a neighbor across an icosahedron seam snaps into the adjacent
    face's lattice (total and deterministic; interior cells get the exact
    lattice neighbors).  Rows may contain repeats near seams where two
    offsets collapse onto one clipped cell — callers that need set
    semantics dedup per row.
    """
    ids = np.asarray(ids, dtype=np.int64)
    res, face, i, j = hex_unpack(ids)
    offs = ring_offsets(k)
    ni = (i[:, None] + offs[:, 0]).ravel()
    nj = (j[:, None] + offs[:, 1]).ravel()
    rep = offs.shape[0]
    m = INV[np.repeat(res, rep)]
    fi = ni.astype(np.float64)
    fj = nj.astype(np.float64)
    px = m[:, 0, 0] * fi + m[:, 0, 1] * fj
    py = m[:, 1, 0] * fi + m[:, 1, 1] * fj
    fr = np.repeat(face, rep)
    n, e1, e2 = FACE_N[fr], FACE_EX[fr], FACE_EY[fr]
    out = xyz_to_hex(n[:, 0] + px * e1[:, 0] + py * e2[:, 0],
                     n[:, 1] + px * e1[:, 1] + py * e2[:, 1],
                     n[:, 2] + px * e1[:, 2] + py * e2[:, 2],
                     int(res[0]) if len(res) else 0)
    return out.reshape(len(ids), rep)


def hex_token(ids: np.ndarray) -> np.ndarray:
    """Lowercase 16-hex-digit token of the int64 id (stable string key)."""
    import binascii

    hx = binascii.hexlify(np.asarray(ids, dtype=np.int64).astype(">u8").tobytes()).decode()
    return np.array([hx[16 * i:16 * (i + 1)] for i in range(len(ids))], dtype=object)


#: fractional axial (di, dj) of a hex cell's 6 corners (triangle centroids
#: of the dual lattice), counter-clockwise from the -30 deg corner; each maps
#: under the lattice basis to distance pitch/sqrt(3) from the center.
CORNER_OFFSETS = np.array([
    (2.0 / 3.0, -1.0 / 3.0),
    (1.0 / 3.0, 1.0 / 3.0),
    (-1.0 / 3.0, 2.0 / 3.0),
    (-2.0 / 3.0, 1.0 / 3.0),
    (-1.0 / 3.0, -1.0 / 3.0),
    (1.0 / 3.0, -2.0 / 3.0),
], dtype=np.float64)


def hex_boundary(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> the 6 corner vertices in degrees, shape (n, 6) each.

    Corners are the dual-triangle centroids of the lattice pushed through
    the SAME face frame as the center (elementwise fixed op order, so the
    SQL twin reproduces every double).  Like cell centers, corner vertices
    of seam-clipped cells are nominal lattice corners — the *drawn* hexagon
    — which is the standard boundary-export convention (a clipped cell's
    true region is the intersection with the face's Voronoi region)."""
    ids = np.asarray(ids, dtype=np.int64)
    res, face, i, j = hex_unpack(ids)
    rep = 6
    m = INV[np.repeat(res, rep)]
    fi = np.repeat(i, rep).astype(np.float64) + np.tile(CORNER_OFFSETS[:, 0], len(ids))
    fj = np.repeat(j, rep).astype(np.float64) + np.tile(CORNER_OFFSETS[:, 1], len(ids))
    px = m[:, 0, 0] * fi + m[:, 0, 1] * fj
    py = m[:, 1, 0] * fi + m[:, 1, 1] * fj
    fr = np.repeat(face, rep)
    n, e1, e2 = FACE_N[fr], FACE_EX[fr], FACE_EY[fr]
    x = n[:, 0] + px * e1[:, 0] + py * e2[:, 0]
    y = n[:, 1] + px * e1[:, 1] + py * e2[:, 1]
    z = n[:, 2] + px * e1[:, 2] + py * e2[:, 2]
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.arcsin(z / r) * (180.0 / np.pi)
    lon = np.arctan2(y, x) * (180.0 / np.pi)
    return lat.reshape(len(ids), rep), lon.reshape(len(ids), rep)
