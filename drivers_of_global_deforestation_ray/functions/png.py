"""Pure-python PNG codec (stdlib zlib only) — de-stubs the multimodal
``backend="real"`` integration point (VERDICT r02 #6).

The sandbox has no image libraries, but PNG (RFC 2083 / ISO 15948) is zlib
DEFLATE + five byte-level scanline filters, both fully implementable from
the public spec — the same approach as the engine's from-scratch GeoTIFF
codec (``state/geotiff.py``).

Scope (documented, deliberate):

- decode: bit depth 8; color types 0 (gray), 2 (RGB), 3 (palette -> RGB),
  4 (gray+alpha), 6 (RGBA); filters 0-4; non-interlaced AND Adam7
  interlaced (each of the 7 passes is its own filtered sub-image inside the
  one zlib stream).  CRCs verified.  1-2-4-16 bit depths raise with a
  clear message.
- encode: uint8 (H, W) or (H, W, C) with C in {1, 2, 3, 4}; filter 0
  scanlines, one IDAT; ``interlace=True`` emits Adam7.  Round-trips
  bit-exactly through :func:`decode_png` either way.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "resize_nearest"]

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
#: channels per pixel by PNG color type (palette counts as 1 pre-expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per spec §8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _unfilter(raw: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. ``raw``: (H, 1+stride) uint8 rows of
    [filter_type, filtered bytes...]; returns (H, stride) reconstructed.

    Filters 0/1/2 are fully vectorized (uint8 wraparound arithmetic; Sub is
    a per-channel cumsum).  Average/Paeth have a true sequential dependence
    on the left neighbor, so they loop over x — across-channel ops stay
    vectorized and real encoders rarely emit them for the synthetic inputs
    this engine decodes."""
    height = raw.shape[0]
    out = np.zeros((height, stride), np.uint8)
    zero_row = np.zeros(stride, np.uint8)
    for r in range(height):
        ftype = int(raw[r, 0])
        line = raw[r, 1:]
        prev = out[r - 1] if r else zero_row
        if ftype == 0:  # None
            out[r] = line
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            out[r] = np.cumsum(line.reshape(-1, bpp), axis=0,
                               dtype=np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            out[r] = line + prev
        elif ftype == 3:  # Average
            rec = out[r]
            rec[:bpp] = line[:bpp] + (prev[:bpp] // 2)
            for x in range(bpp, stride):
                rec[x] = (int(line[x]) + (int(rec[x - bpp]) + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            rec = out[r]
            rec[:bpp] = line[:bpp] + prev[:bpp]  # a=c=0 -> predictor is b
            for x in range(bpp, stride):
                a, b, c = int(rec[x - bpp]), int(prev[x]), int(prev[x - bpp])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def png_dims(data: bytes) -> "tuple[int, int]":
    """(width, height) from the IHDR header WITHOUT decoding pixels — the
    triage counterpart of :func:`..jpegmeta.jpeg_dims` (IHDR is required
    to be the first chunk, so the dims sit at fixed offsets 16..24)."""
    if data[:8] != _SIGNATURE or len(data) < 24 or data[12:16] != b"IHDR":
        raise ValueError(f"not a PNG (header {data[:16]!r})")
    w = int.from_bytes(data[16:20], "big")
    h = int.from_bytes(data[20:24], "big")
    return w, h


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte payload to a (H, W, C) uint8 array (C = 1/2/3/4;
    palette images expand to RGB)."""
    if data[:8] != _SIGNATURE:
        raise ValueError(f"not a PNG (signature {data[:8]!r})")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (8 only)")
    if color not in _CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    ch = _CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if interlace == 1:
        # Adam7: 7 independently-filtered sub-images, concatenated in the
        # single zlib stream; scatter each back onto its pass grid.
        img = np.zeros((height, width, ch), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * ch
            need = ph * (1 + stride)
            sub = raw[pos : pos + need]
            if len(sub) != need:
                raise ValueError(f"PNG Adam7 pass truncated at byte {pos}")
            pos += need
            rec = _unfilter(sub.reshape(ph, 1 + stride), stride, ch)
            img[y0::dy, x0::dx] = rec.reshape(ph, pw, ch)
        if pos != len(raw):
            raise ValueError(f"PNG Adam7 trailing bytes: {len(raw) - pos}")
    else:
        stride = width * ch
        if len(raw) != height * (1 + stride):
            raise ValueError(f"PNG data length {len(raw)} != {height}x(1+{stride})")
        img = _unfilter(raw.reshape(height, 1 + stride), stride, ch)
        img = img.reshape(height, width, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode a (H, W) or (H, W, C) uint8 array as a PNG (filter 0);
    ``interlace=True`` emits Adam7 pass order."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    height, width, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            ph, pw = sub.shape[:2]
            rows = np.zeros((ph, 1 + pw * ch), np.uint8)
            rows[:, 1:] = sub.reshape(ph, pw * ch)
            parts.append(rows.tobytes())
        payload = b"".join(parts)
    else:
        rows = np.zeros((height, 1 + width * ch), np.uint8)
        rows[:, 1:] = img.reshape(height, width * ch)
        payload = rows.tobytes()
    idat = zlib.compress(payload, 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0,
                       1 if interlace else 0)
    return (_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling) of (H, W, C) uint8."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return img[ys][:, xs]
