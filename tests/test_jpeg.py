"""Baseline JPEG codec (functions/jpeg.py): entropy-layer exactness,
transform-layer closed forms, roundtrip bounds, marker-syntax parity."""

import numpy as np
import pytest

from drivers_of_global_deforestation_ray.functions.jpeg import (
    _BitReader, _BitWriter, _build_decode, _build_encode, _read_block,
    _write_block, _AC_LUMA, _DC_LUMA, decode_jpeg, encode_jpeg,
    encode_jpeg_progressive)
from drivers_of_global_deforestation_ray.functions.jpegmeta import jpeg_dims


# ---------------------------------------------------------------------------
# entropy layer — exact roundtrip (no DCT involved)
# ---------------------------------------------------------------------------

def _random_blocks(rng, n):
    """Valid coefficient blocks: sparse AC in +-1023, DC walk within +-1016."""
    blocks = np.zeros((n, 64), np.int32)
    dc = 0
    for i in range(n):
        dc = int(np.clip(dc + rng.integers(-900, 901), -1016, 1016))
        blocks[i, 0] = dc
        nz = rng.integers(0, 20)
        pos = rng.choice(63, size=nz, replace=False) + 1
        vals = rng.integers(1, 1024, size=nz) * rng.choice([-1, 1], size=nz)
        blocks[i, pos] = vals
    return blocks


def test_entropy_layer_exact_roundtrip():
    rng = np.random.default_rng(42)
    blocks = _random_blocks(rng, 200)
    dc_e, ac_e = _build_encode(_DC_LUMA), _build_encode(_AC_LUMA)
    dc_d, ac_d = _build_decode(*_DC_LUMA), _build_decode(*_AC_LUMA)
    bw = _BitWriter()
    pred = 0
    for b in blocks:
        pred = _write_block(bw, b, pred, dc_e, ac_e)
    bw.byte_align()
    rd = _BitReader(bytes(bw.buf) + b"\xff\xd9", 0)
    out = np.zeros_like(blocks)
    pred = 0
    for i in range(len(blocks)):
        pred = _read_block(rd, pred, dc_d, ac_d, out[i])
    assert np.array_equal(out, blocks)


def test_entropy_layer_all_zero_and_zrl_runs():
    """EOB-only blocks and >16-zero runs (ZRL) roundtrip exactly."""
    blocks = np.zeros((3, 64), np.int32)
    blocks[1, 0] = -5
    blocks[2, 40] = 7    # 39 leading AC zeros -> 2x ZRL + run
    blocks[2, 63] = -1   # value in the last scan slot (no EOB after)
    dc_e, ac_e = _build_encode(_DC_LUMA), _build_encode(_AC_LUMA)
    dc_d, ac_d = _build_decode(*_DC_LUMA), _build_decode(*_AC_LUMA)
    bw = _BitWriter()
    pred = 0
    for b in blocks:
        pred = _write_block(bw, b, pred, dc_e, ac_e)
    bw.byte_align()
    rd = _BitReader(bytes(bw.buf) + b"\xff\xd9", 0)
    out = np.zeros_like(blocks)
    pred = 0
    for i in range(len(blocks)):
        pred = _read_block(rd, pred, dc_d, ac_d, out[i])
    assert np.array_equal(out, blocks)


# ---------------------------------------------------------------------------
# transform layer — closed forms and bounds
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("v", [0, 1, 77, 128, 200, 255])
@pytest.mark.parametrize("shape", [(8, 8), (24, 40), (17, 23)])
def test_flat_grayscale_quality100_exact(v, shape):
    """A flat block's DCT is pure DC; at quality=100 the luma table is all
    ones, so decode(encode(flat)) is bit-exact — pixel-decode ground truth
    that needs no external reference."""
    img = np.full(shape, v, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (*shape, 1)
    assert (out == v).all()


def test_gradient_grayscale_bounded():
    g = ((np.arange(33)[:, None] * 3 + np.arange(47)[None, :] * 2) % 256
         ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))[:, :, 0]
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 3


@pytest.mark.parametrize("subsample,tol", [("444", 6), ("420", 16)])
def test_rgb_roundtrip_bounded(subsample, tol):
    c = np.zeros((20, 30, 3), np.uint8)
    c[..., 0] = np.linspace(0, 255, 30, dtype=np.uint8)[None, :]
    c[..., 1] = 128
    c[..., 2] = np.linspace(255, 0, 20, dtype=np.uint8)[:, None]
    out = decode_jpeg(encode_jpeg(c, quality=95, subsample=subsample))
    assert out.shape == c.shape
    assert np.abs(out.astype(int) - c.astype(int)).max() <= tol


def test_noise_roundtrip_psnr():
    rng = np.random.default_rng(1)
    n = rng.integers(0, 256, (64, 64), np.uint8)
    out = decode_jpeg(encode_jpeg(n, quality=95))[:, :, 0]
    mse = np.mean((out.astype(float) - n.astype(float)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 35.0


# ---------------------------------------------------------------------------
# container syntax
# ---------------------------------------------------------------------------

def test_restart_intervals_do_not_change_pixels():
    g = ((np.arange(40)[:, None] + np.arange(40)[None, :]) % 256).astype(np.uint8)
    plain = encode_jpeg(g, quality=85)
    rst = encode_jpeg(g, quality=85, restart_interval=3)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst  # DRI + RST0 present
    assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain))


def test_dims_parity_with_marker_triage():
    """jpegmeta's decode-free triage agrees with the encoder's frame header."""
    img = np.zeros((31, 57, 3), np.uint8)
    data = encode_jpeg(img, quality=80, subsample="420")
    w, h, ncomp, progressive = jpeg_dims(data)
    assert (w, h, ncomp, progressive) == (57, 31, 3, False)


# ---------------------------------------------------------------------------
# progressive (SOF2) — spectral selection + successive approximation
# ---------------------------------------------------------------------------

def test_progressive_decodes_bit_identically_to_baseline():
    """Successive approximation reconstructs the exact quantized
    coefficients, so the progressive stream decodes to the SAME pixels as
    the baseline stream of the same image/quality/subsampling."""
    rng = np.random.default_rng(11)
    for shape in ((8, 16), (24, 24), (33, 17), (16, 16, 3), (40, 56, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for sub in (("444",) if len(shape) == 2 else ("444", "420")):
            for q in (25, 90, 100):
                base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
                prog = decode_jpeg(encode_jpeg_progressive(
                    img, quality=q, subsample=sub))
                assert np.array_equal(base, prog), (shape, sub, q)


def test_progressive_restart_intervals_do_not_change_pixels():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (40, 33, 3), dtype=np.uint8)
    ref = decode_jpeg(encode_jpeg_progressive(img, quality=85))
    for ri in (1, 3, 7):
        got = decode_jpeg(encode_jpeg_progressive(img, quality=85,
                                                  restart_interval=ri))
        assert np.array_equal(ref, got), ri


def test_progressive_flat_quality100_exact():
    """Flat blocks are pure DC with an all-ones quant row at q=100, so the
    DC bit-plane reassembly must recover the pixel value EXACTLY (the
    closed form the media_jpeg_progressive SQL oracle relies on)."""
    for v in (0, 1, 37, 128, 254, 255):
        img = np.full((19, 26), v, np.uint8)
        out = decode_jpeg(encode_jpeg_progressive(img, quality=100))
        assert out.shape == (19, 26, 1)
        assert np.array_equal(out[:, :, 0], img), v


def test_progressive_eobn_runs_decode():
    """The decoder accepts aggregated EOBn runs (real files emit them; the
    from-scratch encoder caps runs at one block): hand-build an AC first
    scan that covers 4 blocks with a single EOB3-style run."""
    from drivers_of_global_deforestation_ray.functions.jpeg import (
        _read_block_ac_first)

    # custom AC table: 3-bit codes for EOB1 (0x10), (0<<4)|1 and EOB0 (0x00)
    lut = {(3, 0b000): 0x10, (3, 0b001): 0x01, (3, 0b010): 0x00}
    bw = _BitWriter()
    # block 0: coefficient 1 at k=1 -> symbol 0x01 + value bit 1, then EOB0
    bw.write(0b001, 3)
    bw.write(1, 1)
    bw.write(0b010, 3)
    # block 1: EOB1 + 1 extra bit (1) -> run = (1<<1)-1+1 = 2 more blocks
    bw.write(0b000, 3)
    bw.write(1, 1)
    bw.byte_align()
    rd = _BitReader(bytes(bw.buf), 0)
    blocks = np.zeros((4, 64), np.int32)
    eobrun = 0
    for b in range(4):
        if eobrun > 0:
            eobrun -= 1
            continue
        eobrun = _read_block_ac_first(rd, blocks[b], 1, 63, 0, lut)
    assert blocks[0, 1] == 1
    assert not blocks[1:].any()
    assert eobrun == 0


def test_progressive_truncation_raises_never_hangs():
    """Truncated progressive streams (the crawl reality) must raise SOME
    exception promptly at every cut point — the media pipeline's
    on_error='flag' turns any raise into a decode_ok=False passthrough,
    but a hang or a silent wrong result would be unrecoverable."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    data = encode_jpeg_progressive(img, quality=85)
    ref = decode_jpeg(data)
    assert ref.shape == (24, 31, 1)
    for cut in range(30, len(data) - 1, max(1, len(data) // 40)):
        try:
            out = decode_jpeg(data[:cut])
        except Exception:
            continue  # any prompt raise is acceptable
        # a cut AFTER all scan data but before EOI may legitimately
        # decode; anything else returning silently would be a bug
        assert out.shape == ref.shape


def test_progressive_unsupported_processes_still_raise():
    img = np.zeros((16, 16), np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless)
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(data))


def test_bad_inputs_raise():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(np.zeros((8, 8), np.uint8))[:40])  # truncated
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(np.zeros((8, 8), np.uint8), quality=0)
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), subsample="422")


def test_multimodal_real_backend_sniffs_jpeg_and_png():
    """MediaFeaturizer/media_resize 'real' decode both container formats."""
    from drivers_of_global_deforestation_ray.functions.png import encode_png
    from drivers_of_global_deforestation_ray.stages.multimodal import (
        MediaFeaturizer, _MediaResizer)

    img = np.full((12, 20), 99, np.uint8)
    feat = MediaFeaturizer(media_col="p", backend="real")
    for payload in (encode_jpeg(img, quality=100), encode_png(img)):
        w, h, f = feat._real_decode(payload)
        assert (w, h) == (20, 12)
        assert f[0] == pytest.approx(99 / 255.0)
    rz = _MediaResizer(media_col="p", width=6, height=4, backend="real")
    thumb_j = rz._real_resize(encode_jpeg(img, quality=100))
    thumb_p = rz._real_resize(encode_png(img))
    assert thumb_j[:2] == b"\xff\xd8" and thumb_p[:4] == b"\x89PNG"
    assert (decode_jpeg(thumb_j) == 99).all()
