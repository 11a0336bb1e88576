"""S2 cell codec invariants (pure numpy — no Ray needed).

Parity with Google's s2geometry library cannot be executed in this sandbox
(no s2 lib); these tests pin the codec to the public spec instead: the six
level-0 face cells and their canonical tokens, Hilbert-curve bijectivity and
edge-adjacency per face, center roundtrips at several levels, parent/child
range containment, and 4-neighbor symmetry across cube faces.
"""

from __future__ import annotations

import numpy as np
import pytest

from drivers_of_global_deforestation_ray.functions import s2


def test_face_cells_and_tokens():
    # face centers -> the six level-0 cells; canonical tokens 1,3,5,7,9,b
    lats = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lngs = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    ids = s2.latlng_to_cell(lats, lngs, 0)
    assert list(s2.cell_token(ids)) == ["1", "3", "5", "7", "9", "b"]
    assert list(s2.cell_level(ids)) == [0] * 6
    # token roundtrip
    assert (s2.token_to_cell(s2.cell_token(ids)) == ids).all()


def test_leaf_at_origin():
    leaf = s2.latlng_to_cell(np.array([0.0]), np.array([0.0]), 30)
    # center of face 0: i = j = 2^29 -> curve pos 2 << 58 -> id 2^60 + 1
    assert s2.cell_token(leaf)[0] == "1000000000000001"
    assert s2.cell_level(leaf)[0] == 30


@pytest.mark.parametrize("level", [1, 5, 10, 17])
def test_center_roundtrip(level):
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89.99, 89.99, 5000)
    lng = rng.uniform(-180.0, 180.0, 5000)
    c = s2.latlng_to_cell(lat, lng, level)
    clat, clng = s2.cell_to_center_latlng(c, level)
    assert (s2.latlng_to_cell(clat, clng, level) == c).all()
    assert (s2.cell_level(c) == level).all()


def test_hilbert_bijective_and_adjacent_per_face():
    level = 5
    n = 1 << level
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    for f in range(6):
        face = np.full(n * n, f, dtype=np.int64)
        pos = s2._face_ij_to_curve_pos(face, ii.ravel(), jj.ravel(), level)
        assert len(np.unique(pos)) == n * n  # bijective
        i2, j2 = s2._curve_pos_to_face_ij(face, pos, level)
        assert (i2 == ii.ravel()).all() and (j2 == jj.ravel()).all()
        order = np.argsort(pos)
        si, sj = ii.ravel()[order], jj.ravel()[order]
        # Hilbert property: consecutive curve cells share an edge
        assert (np.abs(np.diff(si)) + np.abs(np.diff(sj)) == 1).all()


def test_parent_child_ranges():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89.0, 89.0, 2000)
    lng = rng.uniform(-180.0, 180.0, 2000)
    c10 = s2.latlng_to_cell(lat, lng, 10)
    p7 = s2.cell_parent(c10, 7)
    lo, hi = s2.cell_range(p7)
    assert ((c10 >= lo) & (c10 <= hi)).all()
    assert (s2.cell_level(p7) == 7).all()
    # parent-at-7 == independent direct encode at level 7 (Hilbert prefix)
    assert (s2.latlng_to_cell(lat, lng, 7) == p7).all()
    # children partition the parent range, in curve order
    ch = s2.cell_children(p7[0])
    assert (s2.cell_parent(ch, 7) == p7[0]).all()
    clo, chi = s2.cell_range(ch)
    plo, phi = s2.cell_range(p7[:1])
    assert clo[0] == plo[0] and chi[3] == phi[0]
    assert (clo[1:] == chi[:-1] + np.uint64(2)).all()  # adjacent, marker gap


def test_edge_neighbors_symmetric_across_faces():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89.9, 89.9, 3000)
    lng = rng.uniform(-180.0, 180.0, 3000)
    cells = np.unique(s2.latlng_to_cell(lat, lng, 6))
    nb = s2.cell_edge_neighbors(cells, 6)
    # 4 distinct neighbors, none equal to the cell itself
    assert (np.sort(nb, axis=1)[:, :-1] != np.sort(nb, axis=1)[:, 1:]).all()
    assert (nb != cells[:, None]).all()
    # symmetry: each neighbor lists the cell among ITS neighbors
    back = s2.cell_edge_neighbors(nb.ravel(), 6).reshape(len(cells), 4, 4)
    for k in range(4):
        assert (back[:, k, :] == cells[:, None]).any(axis=1).all()
    # cross-face coverage: the sample must actually exercise face crossings
    face_of = (nb >> np.uint64(61)).astype(np.int64)
    assert (face_of != (cells >> np.uint64(61)).astype(np.int64)[:, None]).any()
