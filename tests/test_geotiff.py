"""Pure-python GeoTIFF reader/writer: roundtrip, nodata, compression, formats."""

import numpy as np
import pytest

from drivers_of_global_deforestation_ray.state.geotiff import read_geotiff, write_geotiff
from drivers_of_global_deforestation_ray.state.raster import GeoRef

REF = GeoRef(nrows=20, ncols=30, lat_min=-10.0, lat_max=10.0, lon_min=5.0, lon_max=35.0)


def _grid(seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-100, 100, (20, 30))


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("dtype,tol", [("f8", 0.0), ("f4", 1e-4), ("i4", 1.0)])
def test_geotiff_roundtrip(tmp_path, compress, dtype, tol):
    g = _grid()
    if dtype == "i4":
        g = np.round(g)
    p = str(tmp_path / f"t_{dtype}_{compress}.tif")
    write_geotiff(p, g, REF, dtype=dtype, compress=compress)
    back, ref = read_geotiff(p)
    if tol == 0.0:
        assert (back == g).all()
    else:
        assert np.abs(back - g).max() <= tol
    assert (ref.nrows, ref.ncols) == (20, 30)
    assert ref.lat_max == pytest.approx(10.0)
    assert ref.lat_min == pytest.approx(-10.0)
    assert ref.lon_min == pytest.approx(5.0)
    assert ref.lon_max == pytest.approx(35.0)


def test_geotiff_nodata_nan_roundtrip(tmp_path):
    g = _grid(1)
    g[3:5, 7:9] = np.nan
    p = str(tmp_path / "nod.tif")
    write_geotiff(p, g, REF, dtype="f8", nodata=-9999.0)
    back, _ = read_geotiff(p)
    assert np.isnan(back[3, 7]) and np.isnan(back[4, 8])
    m = ~np.isnan(g)
    assert (back[m] == g[m]).all()


def test_geotiff_nan_without_nodata_raises(tmp_path):
    g = _grid(2)
    g[0, 0] = np.nan
    with pytest.raises(ValueError, match="nodata"):
        write_geotiff(str(tmp_path / "x.tif"), g, REF)


def test_geotiff_goode_grid_georef(tmp_path):
    """The reference raster extent survives a write/read cycle exactly
    (Supplemental_Data_1.R:66-70 constants)."""
    from drivers_of_global_deforestation_ray.functions.grid import GOODE_GRID

    ref = GeoRef.from_grid(GOODE_GRID)
    small = GeoRef(nrows=4, ncols=8, lat_min=ref.lat_min, lat_max=ref.lat_max,
                   lon_min=ref.lon_min, lon_max=ref.lon_max)
    g = np.arange(32, dtype=np.float64).reshape(4, 8)
    p = str(tmp_path / "goode.tif")
    write_geotiff(p, g, small, dtype="f8")
    back, got = read_geotiff(p)
    assert (back == g).all()
    assert got.lon_min == pytest.approx(ref.lon_min)
    assert got.lat_max == pytest.approx(ref.lat_max)


def test_geotiff_rejects_unsupported(tmp_path):
    p = tmp_path / "bad.tif"
    p.write_bytes(b"XX" + b"\0" * 20)
    with pytest.raises(ValueError, match="not a TIFF"):
        read_geotiff(str(p))


def test_registry_mixes_tif_and_npy(tmp_path):
    """A features.json manifest can point at .tif and .npy rasters together;
    gather() is format-agnostic."""
    import json

    from drivers_of_global_deforestation_ray.state.raster import (
        RasterRegistry, write_raster)

    ref = GeoRef(nrows=4, ncols=4, lat_min=-2, lat_max=2, lon_min=-2, lon_max=2)
    a = np.arange(16, dtype=np.float64).reshape(4, 4)
    b = a * 10
    write_raster(str(tmp_path / "a"), a, ref)
    write_geotiff(str(tmp_path / "b.tif"), b, ref, dtype="f8")
    manifest = tmp_path / "features.json"
    manifest.write_text(json.dumps([{"name": "a", "stem": "a"},
                                    {"name": "b", "stem": "b.tif"}]))
    reg = RasterRegistry(str(manifest))
    got = reg.gather(np.array([1, 6, 16]))
    assert got["a"].tolist() == [0.0, 5.0, 15.0]
    assert got["b"].tolist() == [0.0, 50.0, 150.0]
