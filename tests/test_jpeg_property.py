"""Property-based codec invariants (hypothesis): the deterministic
fixtures in test_jpeg.py pin known shapes; these let the shrinker hunt
for shape/value corners the fixed seeds miss.  Bounded example counts —
the suite stays fast."""

import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra.numpy import arrays

from drivers_of_global_deforestation_ray.functions.jpeg import (
    decode_jpeg, encode_jpeg, encode_jpeg_progressive)

_gray = arrays(np.uint8, st.tuples(st.integers(1, 40), st.integers(1, 40)))
_rgb = arrays(np.uint8, st.tuples(st.integers(1, 24), st.integers(1, 24),
                                  st.just(3)))


@settings(max_examples=25, deadline=None)
@given(img=_gray, quality=st.sampled_from([25, 90, 100]))
def test_progressive_equals_baseline_gray(img, quality):
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    assert np.array_equal(base, prog)


@settings(max_examples=15, deadline=None)
@given(img=_rgb, subsample=st.sampled_from(["444", "420"]))
def test_progressive_equals_baseline_rgb(img, subsample):
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=90,
                                               subsample=subsample))
    assert np.array_equal(base, prog)


@settings(max_examples=15, deadline=None)
@given(img=_gray, ri=st.integers(1, 9))
def test_progressive_restart_invariance(img, ri):
    plain = decode_jpeg(encode_jpeg_progressive(img, quality=85))
    rst = decode_jpeg(encode_jpeg_progressive(img, quality=85,
                                              restart_interval=ri))
    assert np.array_equal(plain, rst)


@settings(max_examples=25, deadline=None)
@given(img=_gray)
def test_decode_shape_and_dtype(img):
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (*img.shape, 1) and out.dtype == np.uint8
