"""Hypothesis property tests for the pure (no-Ray) codecs: grid ids, igh
projection, sketches, TIFF roundtrip."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from drivers_of_global_deforestation_ray.functions import goode as G
from drivers_of_global_deforestation_ray.functions import grid as GR


@settings(max_examples=200, deadline=None)
@given(lat=st.floats(-89.9, 89.9), lon=st.floats(-180.0, 179.999999))
def test_igh_roundtrip_property(lat, lon):
    x, y = G.igh_forward(np.array([lat]), np.array([lon]))
    la, lo = G.igh_inverse(x, y)
    assert abs(la[0] - lat) < 1e-8
    assert abs(lo[0] - lon) < 1e-7


@settings(max_examples=200, deadline=None)
@given(row=st.integers(0, 1736), col=st.integers(0, 4007), res=st.integers(0, 3))
def test_tile_id_roundtrip_property(row, col, res):
    g = GR.GOODE_GRID
    # scale row/col into the res-r grid
    nrows, ncols = g.shape(res)
    r = min(row << res, nrows - 1)
    c = min(col << res, ncols - 1)
    tid = GR.rowcol_to_tile(np.array([r]), np.array([c]), g, res)
    rr, cc = GR.tile_to_rowcol(tid, g, res)
    assert rr[0] == r and cc[0] == c
    # parent of a child is the original tile
    if res > 0:
        parent = GR.tile_to_parent(tid, g, res, 0)
        t0 = GR.rowcol_to_tile(np.array([r >> res]), np.array([c >> res]), g, 0)
        assert parent[0] == t0[0]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=2000))
def test_kll_quantiles_within_minmax(vals):
    from drivers_of_global_deforestation_ray.stages.sketch import (
        _kll_read_quantiles, kll_compact)

    arr = np.asarray(vals, dtype=np.float64)
    levels = kll_compact([arr], 64)
    q = _kll_read_quantiles(levels, [0.0, 0.5, 1.0])
    assert arr.min() <= q[1] <= arr.max()
    # retained mass tracks the input count: each odd-buffer compaction at
    # level li drifts the total by at most 2^li (parity compaction), so the
    # drift is bounded by one unit per compaction — ~1/m relative
    total = sum(len(lv) * (1 << li) for li, lv in enumerate(levels))
    assert abs(total - len(arr)) <= max(1, len(arr) // 32)


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 40), st.integers(2, 40))
def test_geotiff_roundtrip_property(nr, nc):
    import tempfile

    from drivers_of_global_deforestation_ray.state.geotiff import (
        read_geotiff, write_geotiff)
    from drivers_of_global_deforestation_ray.state.raster import GeoRef

    rng = np.random.default_rng(nr * 100 + nc)
    g = rng.uniform(-1e5, 1e5, (nr, nc))
    ref = GeoRef(nrows=nr, ncols=nc, lat_min=-1.0, lat_max=1.0,
                 lon_min=-2.0, lon_max=2.0)
    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/t.tif"
        write_geotiff(p, g, ref, dtype="f8", compress=(nr % 2 == 0))
        back, got_ref = read_geotiff(p)
        assert (back == g).all()
        assert (got_ref.nrows, got_ref.ncols) == (nr, nc)


@settings(max_examples=200, deadline=None)
@given(w=st.integers(1, 65535), h=st.integers(1, 65535),
       nc=st.integers(1, 4), prog=st.booleans())
def test_jpeg_shell_dims_property(w, h, nc, prog):
    from drivers_of_global_deforestation_ray.functions.jpegmeta import (
        encode_jpeg_shell, jpeg_dims)

    assert jpeg_dims(encode_jpeg_shell(w, h, nc, prog)) == (w, h, nc, prog)


@settings(max_examples=100, deadline=None)
@given(payloads=st.lists(st.binary(max_size=200), min_size=1, max_size=8))
def test_warc_stream_roundtrip_property(payloads):
    from drivers_of_global_deforestation_ray.sources.warcio import (
        parse_warc_stream, warc_record_bytes)

    recs = [(f"https://e.example/{i}", "2024-01-01T00:00:00Z", p)
            for i, p in enumerate(payloads)]
    stream = b"".join(warc_record_bytes(u, d, p) for u, d, p in recs)
    assert parse_warc_stream(stream) == recs


@settings(max_examples=100, deadline=None)
@given(vals=st.lists(st.integers(-1000, 1000), min_size=0, max_size=400),
       k=st.integers(2, 64))
def test_kmv_exact_below_k_property(vals, k):
    """Pure sketch math: below k distinct hashes the estimate is the exact
    distinct-hash count (collision-free for these small domains); k=1 is
    rejected loudly (the (k-1)/h_k estimator degenerates to 0)."""
    import hashlib

    from drivers_of_global_deforestation_ray.stages.sketch import kmv_estimate

    hv = np.unique(np.fromiter(
        (int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
         for v in set(vals)), dtype=np.int64, count=len(set(vals))))
    est = kmv_estimate(hv, k)
    if len(hv) < k:
        assert est == float(len(hv))
    else:
        assert est > 0.0
    with pytest.raises(ValueError):
        kmv_estimate(hv, 1)
