"""From-scratch PNG codec (functions/png.py): spec filters, roundtrips."""

import struct
import zlib

import numpy as np
import pytest

from drivers_of_global_deforestation_ray.functions.png import (decode_png, encode_png,
                                                 resize_nearest)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("shape", [(7, 5), (7, 5, 1), (9, 13, 2), (20, 30, 3), (8, 8, 4)])
def test_png_roundtrip(shape):
    img = _rand(shape, seed=sum(shape))
    back = decode_png(encode_png(img))
    want = img if img.ndim == 3 else img[:, :, None]
    assert np.array_equal(back, want)


def _filter_row(line, prev, bpp, ftype):
    """Reference (independent) scanline filterer from the PNG spec."""
    out = np.empty_like(line)
    for x in range(len(line)):
        a = int(line[x - bpp]) if x >= bpp else 0   # raw left (recon == raw here)
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (int(line[x]) - pred) & 0xFF
    return out


def _build_png(img, filters):
    """Hand-build a PNG applying a given filter type per scanline."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride)
    raw = bytearray()
    for r in range(h):
        prev = flat[r - 1] if r else np.zeros(stride, np.uint8)
        f = filters[r % len(filters)]
        raw.append(f)
        raw.extend(_filter_row(flat[r], prev, ch, f).tobytes())

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type(ftype):
    img = _rand((11, 9, 3), seed=ftype)
    assert np.array_equal(decode_png(_build_png(img, [ftype])), img)


def test_png_mixed_filters():
    img = _rand((15, 6, 4), seed=42)
    assert np.array_equal(decode_png(_build_png(img, [0, 1, 2, 3, 4])), img)


def test_png_palette():
    rng = np.random.default_rng(2)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(10, 7, 1), dtype=np.uint8)
    h, w = 10, 7
    raw = bytearray()
    for r in range(h):
        raw.append(0)
        raw.extend(idx[r].tobytes())

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", plte.tobytes())
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(data), plte[idx[:, :, 0]])


def test_png_rejects_bad_crc_and_interlace():
    img = _rand((4, 4, 3), seed=1)
    good = bytearray(encode_png(img))
    good[20] ^= 0xFF  # corrupt inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF" * 4)


def test_resize_nearest_identity_and_downscale():
    img = _rand((8, 6, 3), seed=3)
    assert np.array_equal(resize_nearest(img, 6, 8), img)
    up = resize_nearest(img, 12, 16)
    assert up.shape == (16, 12, 3)
    assert np.array_equal(up[::2, ::2], img)  # pixel-center 2x: even grid hits sources


def test_adam7_interlaced_roundtrip_all_shapes():
    """Adam7: encode interlaced -> decode == original, across shapes that
    exercise empty passes (1x1), non-multiples of 8, and every channel
    count; interlaced and sequential decodes agree bit-for-bit."""
    rng = np.random.default_rng(77)
    for h, w, ch in [(1, 1, 1), (3, 10, 3), (13, 7, 4), (8, 8, 1),
                     (9, 17, 2), (16, 5, 3)]:
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        data = encode_png(img, interlace=True)
        out = decode_png(data)
        np.testing.assert_array_equal(out, img)
        seq = decode_png(encode_png(img))
        np.testing.assert_array_equal(out, seq)


def test_adam7_truncated_pass_raises():
    img = np.zeros((9, 9, 3), np.uint8)
    data = bytearray(encode_png(img, interlace=True))
    # corrupt: re-encode with a short zlib payload but keep the Adam7 flag
    import struct as _s
    import zlib as _z
    short = _z.compress(b"\x00" * 10, 6)
    ihdr = _s.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 1)

    def chunk(ctype, body):
        return (_s.pack(">I", len(body)) + ctype + body
                + _s.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF))

    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", short) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="Adam7|truncated"):
        decode_png(bad)
