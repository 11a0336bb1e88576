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


# --- interrupted Goode homolosine (igh) ------------------------------------

from drivers_of_global_deforestation_ray.functions import goode as IGH


def test_igh_roundtrip():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89.9, 89.9, 50_000)
    lon = rng.uniform(-180.0, 180.0, 50_000)
    x, y = IGH.igh_forward(lat, lon)
    la2, lo2 = IGH.igh_inverse(x, y)
    assert np.abs(la2 - lat).max() < 1e-9
    assert np.abs(lo2 - lon).max() < 1e-8


def test_igh_family_continuity_at_boundary_parallel():
    """Sinusoidal and Mollweide sheets must meet at 40d44'11.8": y is
    continuous to sub-mm, x to the published boundary's meter-level scale
    mismatch (the 40d44'11.8" constant is itself a rounded value)."""
    b = np.rad2deg(IGH.PHI_BOUND)
    for lon in (-150.0, -70.0, 0.0, 100.0, 170.0):
        xs, ys = IGH.igh_forward(np.array([b - 1e-9]), np.array([lon]))
        xm, ym = IGH.igh_forward(np.array([b + 1e-9]), np.array([lon]))
        assert abs(ys[0] - ym[0]) < 1e-2
        assert abs(xs[0] - xm[0]) < 5.0


def test_igh_lobes_disjoint_and_in_extent():
    """Each lobe's x range stays inside its neighbors' boundary meridians
    (interruptions leave gaps, never overlaps) and inside the reference
    raster extent; y within the reference's vertical extent."""
    rng = np.random.default_rng(8)
    lat = rng.uniform(-89.9, 89.9, 100_000)
    lon = rng.uniform(-180.0, 180.0, 100_000)
    x, y = IGH.igh_forward(lat, lon)
    assert x.min() > -20037506.5671 and x.max() < 20042493.4328
    assert y.min() > -8683205.0209 and y.max() < 8686794.9791
    R = IGH.R_SPHERE
    north = lat >= 0
    # north lobes split at lon=-40: x on each side stays on its side
    west = north & (lon < -40.0)
    east = north & (lon >= -40.0)
    thr = np.deg2rad(-40.0) * R
    assert x[west].max() <= thr + 1e-6
    assert x[east].min() >= thr - 1e-6
    for t_deg, m in ((-100.0, lat < 0), (-20.0, lat < 0), (80.0, lat < 0)):
        t = np.deg2rad(t_deg) * R
        lw = m & (lon < t_deg)
        le = m & (lon >= t_deg)
        assert x[lw].max() <= t + 1e-6
        assert x[le].min() >= t - 1e-6


def test_igh_equator_is_plate_carree():
    """On the equator the sinusoidal lobes reduce to x = R*lon, y = 0."""
    lon = np.linspace(-179.9, 179.9, 999)
    x, y = IGH.igh_forward(np.zeros_like(lon), lon)
    assert np.abs(y).max() < 1e-9
    assert np.abs(x - np.deg2rad(lon) * IGH.R_SPHERE).max() < 1e-6


def test_igh_y_monotone_in_lat():
    lon = np.full(500, 12.3)
    lat = np.linspace(-89.9, 89.9, 500)
    _, y = IGH.igh_forward(lat, lon)
    assert (np.diff(y) > 0).all()
