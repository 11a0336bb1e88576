"""Tile codec properties: roundtrip, hierarchy containment, k-ring."""

import numpy as np

from drivers_of_global_deforestation_ray.functions import grid as G


RNG = np.random.default_rng(0)


def test_rowcol_roundtrip():
    g = G.MINI_GRID
    for res in (0, 1, 2):
        nrows, ncols = g.shape(res)
        tid = RNG.integers(1, nrows * ncols + 1, size=1000)
        r, c = G.tile_to_rowcol(tid, g, res)
        assert (G.rowcol_to_tile(r, c, g, res) == tid).all()
        assert (r >= 0).all() and (r < nrows).all() and (c >= 0).all() and (c < ncols).all()


def test_goode_grid_id_contract():
    # GoodeR.ID = (row-1)*4008 + col, 1-based (Supplemental_Data_1.R:62-64)
    g = G.GOODE_GRID
    assert g.num_tiles() == 6_961_896
    r, c = G.tile_to_rowcol(np.asarray([1, 4008, 4009, 6_961_896]), g)
    assert list(r) == [0, 0, 1, 1736]
    assert list(c) == [0, 4007, 0, 4007]


def test_latlon_roundtrip_center():
    g = G.MINI_GRID
    tid = RNG.integers(1, g.num_tiles() + 1, size=2000)
    lat, lon = G.tile_to_latlon_center(tid, g)
    assert (G.latlon_to_tile(lat, lon, g) == tid).all()


def test_latlon_edges_clamped():
    g = G.MINI_GRID
    t = G.latlon_to_tile(np.asarray([-90.0, 90.0]), np.asarray([-180.0, 180.0]), g)
    assert t[0] == (g.nrows - 1) * g.ncols + 1  # south-west corner
    assert t[1] == g.ncols  # north-east corner (clamped col)


def test_parent_child_containment():
    g = G.MINI_GRID
    for res, parent_res in ((2, 0), (2, 1), (3, 1)):
        tid = RNG.integers(1, g.num_tiles(res) + 1, size=500)
        parent = G.tile_to_parent(tid, g, res, parent_res)
        # every child of the parent at `res` contains tid
        for t, p in zip(tid[:50], parent[:50]):
            kids = G.tile_to_children(int(p), g, parent_res, res)
            assert t in kids
    # res->res is identity
    tid = RNG.integers(1, g.num_tiles(1) + 1, size=100)
    assert (G.tile_to_parent(tid, g, 1, 1) == tid).all()


def test_latlon_consistent_across_res():
    g = G.MINI_GRID
    lat = RNG.uniform(-89, 89, 500)
    lon = RNG.uniform(-179, 179, 500)
    fine = G.latlon_to_tile(lat, lon, g, res=3)
    coarse = G.latlon_to_tile(lat, lon, g, res=0)
    assert (G.tile_to_parent(fine, g, 3, 0) == coarse).all()


def test_k_ring_interior_and_edges():
    g = G.MINI_GRID
    center = G.rowcol_to_tile(np.asarray([10]), np.asarray([10]), g)[0]
    assert len(G.k_ring(int(center), 1, g)) == 9
    assert len(G.k_ring(int(center), 2, g)) == 25
    corner = 1  # (0,0)
    assert len(G.k_ring(corner, 1, g)) == 4
    edge = G.rowcol_to_tile(np.asarray([0]), np.asarray([10]), g)[0]
    assert len(G.k_ring(int(edge), 1, g)) == 6


def test_k_ring_symmetry():
    g = G.MINI_GRID
    tid = RNG.integers(1, g.num_tiles() + 1, size=100)
    for t in tid:
        ring = G.k_ring(int(t), 1, g)
        for n in ring:
            assert t in G.k_ring(int(n), 1, g)


def test_k_ring_table_matches_scalar():
    g = G.MINI_GRID
    tid = RNG.integers(1, g.num_tiles() + 1, size=200)
    centers, neigh, ring = G.k_ring_table(tid, 2, g)
    assert (ring <= 2).all() and (ring >= 0).all()
    for t in tid[:20]:
        got = np.sort(neigh[centers == t])
        want = G.k_ring(int(t), 2, g)
        assert (got == want).all()
