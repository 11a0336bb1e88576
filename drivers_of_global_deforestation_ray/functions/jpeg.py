"""Baseline JPEG codec from scratch (ITU-T T.81, public spec) — stdlib+numpy.

Closes VERDICT r03 "What's missing #4": ``functions/jpegmeta.py`` triages
dimensions from marker syntax only; this module decodes (and encodes)
actual pixels so a JPEG-heavy multimodal corpus gets real
``media_features`` statistics, not just dimension filtering.

Scope — baseline sequential DCT (SOF0), the format of essentially every
web-crawl JPEG:

- encoder: grayscale or RGB, 4:4:4 or 4:2:0 chroma subsampling, Annex-K
  quantization tables scaled by ``quality`` (libjpeg's public 5000/q //
  200-2q convention), Annex-K Huffman tables, optional restart intervals;
- decoder: any component count/sampling the baseline syntax allows
  (sampling factors 1-2), multiple DQT/DHT segments, DRI + RSTn restart
  markers, stuffed-byte removal; arithmetic coding and hierarchical
  modes raise ``NotImplementedError`` with explicit messages.

Progressive DCT (SOF2, T.81 Annex G) is fully supported in the decoder —
spectral selection, successive approximation (DC bit-plane refinement and
the AC correction-bit protocol G.2), EOB runs, non-interleaved AC scans,
restarts — and :func:`encode_jpeg_progressive` emits a multi-scan
spectral-selection + successive-approximation stream (the libjpeg-style
script: DC at Al=1 + refinement, per-component AC bands at Al=2 + two
refinement passes).  Successive approximation reconstructs the EXACT
quantized coefficients (two's-complement bit reassembly for DC,
sign-magnitude for AC), so a progressive encode decodes bit-identically
to the same image's baseline encode — the property the roundtrip tests
pin.  The progressive encoder caps EOB runs at one block (symbol 0x00)
so the published Annex-K tables suffice; the decoder accepts arbitrary
EOBn runs as real files use them.

The DCT runs batched over all 8x8 blocks at once (orthonormal basis-matrix
sandwich, ``C @ blocks @ C.T`` — one matmul pair per plane, no per-pixel
Python).  Only the entropy layer is a per-symbol loop, as the bitstream is
inherently serial; it touches coefficients, never pixels.

Decode correctness strategy (mirrors ``functions/png.py``): the entropy
layer is pinned EXACTLY by encode->decode coefficient roundtrips on random
valid coefficient blocks, the transform layer by closed-form cases (flat
blocks quantize to pure DC and reconstruct exactly) and PSNR bounds on
smooth images; ``tests/test_jpeg.py`` holds the fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "encode_jpeg_progressive", "decode_jpeg"]

# --------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K — published example tables)
# --------------------------------------------------------------------------

# zigzag scan: block index (row-major 0..63) of each scan position
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Huffman specs: (bits[1..16], values) — Annex K.3
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

# orthonormal DCT-II basis: fwd F = C @ B @ C.T, inv B = C.T @ F @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else 0.5)


def _scaled_tables(quality: int) -> "tuple[np.ndarray, np.ndarray]":
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    luma = np.clip((_QT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((_QT_CHROMA * scale + 50) // 100, 1, 255)
    return luma, chroma


def _build_encode(spec) -> dict:
    """symbol -> (code, nbits) canonical Huffman table."""
    bits, vals = spec
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits, vals) -> dict:
    """(nbits, code) -> symbol."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# bit i/o
# --------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (code & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.n -= 8
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def byte_align(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


class _BitReader:
    """MSB-first reader over entropy-coded data; skips stuffed 0x00."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt != 0x00:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy data (truncated scan?)")
                self.pos += 2
            else:
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (F.2.1.3.1)."""
        self.n = 0
        if (self.data[self.pos] != 0xFF
                or not 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


def _symbol(rd: _BitReader, lut: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


# --------------------------------------------------------------------------
# transform layer (batched over all blocks)
# --------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float with H, W multiples of 8 -> (N, 8, 8) row-major blocks."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h, w))


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


# quant tables live in NATURAL (row-major) order in the encoder and ZIGZAG
# order in the decoder (as serialized in DQT); zigzag applies only at the
# coefficient-serialization boundary.

def _encode_plane_coeffs(plane: np.ndarray, qt_nat: np.ndarray) -> np.ndarray:
    """8-padded uint8 plane -> (N, 64) int32 quantized ZIGZAG coefficients."""
    blocks = _to_blocks(plane.astype(np.float64) - 128.0)
    coeff = (_C @ blocks @ _C.T).reshape(-1, 64)
    q = np.round(coeff / qt_nat.astype(np.float64)).astype(np.int32)
    return q[:, ZIGZAG]


def _decode_plane_pixels(zz: np.ndarray, qt_zz: np.ndarray,
                         bh: int, bw: int) -> np.ndarray:
    """(N, 64) int32 zigzag coefficients -> (8*bh, 8*bw) uint8 plane."""
    deq = zz.astype(np.float64) * qt_zz.astype(np.float64)  # zigzag domain
    nat = np.zeros_like(deq)
    nat[:, ZIGZAG] = deq  # undo zigzag
    blocks = _C.T @ nat.reshape(-1, 8, 8) @ _C
    px = np.clip(np.round(blocks + 128.0), 0, 255).astype(np.uint8)
    return _from_blocks(px, 8 * bh, 8 * bw)


# --------------------------------------------------------------------------
# entropy layer
# --------------------------------------------------------------------------

def _write_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                 dc_tab: dict, ac_tab: dict) -> int:
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff else 0
    code, nb = dc_tab[size]
    bw.write(code, nb)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    nz = np.nonzero(zz[1:])[0] + 1
    prev = 0
    for k in nz.tolist():
        run = k - prev - 1
        while run >= 16:
            zc, zn = ac_tab[0xF0]  # ZRL
            bw.write(zc, zn)
            run -= 16
        v = int(zz[k])
        size = abs(v).bit_length()
        code, nb = ac_tab[(run << 4) | size]
        bw.write(code, nb)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        prev = k
    if prev != 63:
        code, nb = ac_tab[0x00]  # EOB
        bw.write(code, nb)
    return int(zz[0])


def _read_block(rd: _BitReader, pred: int, dc_lut: dict, ac_lut: dict,
                out: np.ndarray) -> int:
    size = _symbol(rd, dc_lut)
    pred += _extend(rd.bits(size), size) if size else 0
    out[0] = pred
    k = 1
    while k < 64:
        rs = _symbol(rd, ac_lut)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        out[k] = _extend(rd.bits(size), size)
        k += 1
    return pred


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _rgb_to_ycbcr(img: np.ndarray) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    clip = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _box_half(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample (edge-replicated to even dims first)."""
    p = _pad_to(plane.astype(np.float64), 2, 2)
    h, w = p.shape
    q = (p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)))
    return np.clip(np.round(q), 0, 255).astype(np.uint8)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _prepare_frame(img: np.ndarray, quality: int, subsample: str):
    """Shared encoder front half: validate, color-convert, DCT+quantize.

    Returns (h, w, gray, comps, coeffs, qt_l, qt_c) where ``comps`` is
    [(hs, vs, qt_id)] and ``coeffs[ci]`` is (blocks_h, blocks_w, 64)
    quantized ZIGZAG coefficients."""
    img = np.asarray(img, dtype=np.uint8)
    if subsample not in ("444", "420"):
        raise ValueError(f"subsample must be '444' or '420', got {subsample!r}")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {img.shape}")
    h, w = img.shape[:2]
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError(f"dims out of JPEG range: {h}x{w}")
    qt_l, qt_c = _scaled_tables(quality)

    if gray:
        comps = [(1, 1, 0)]  # (hs, vs, qt_id)
        planes = [_pad_to(img, 8, 8)]
    elif subsample == "444":
        comps = [(1, 1, 0), (1, 1, 1), (1, 1, 1)]
        y, cb, cr = _rgb_to_ycbcr(img)
        planes = [_pad_to(p, 8, 8) for p in (y, cb, cr)]
    else:  # 420
        comps = [(2, 2, 0), (1, 1, 1), (1, 1, 1)]
        y, cb, cr = _rgb_to_ycbcr(img)
        planes = [_pad_to(y, 16, 16),
                  _pad_to(_box_half(cb), 8, 8), _pad_to(_box_half(cr), 8, 8)]

    coeffs = []
    for (hs, vs, qid), plane in zip(comps, planes):
        zz = _encode_plane_coeffs(plane, qt_l if qid == 0 else qt_c)
        coeffs.append(zz.reshape(plane.shape[0] // 8, plane.shape[1] // 8, 64))
    return h, w, gray, comps, coeffs, qt_l, qt_c


def _frame_headers(sof_marker: int, h: int, w: int, gray: bool, comps,
                   qt_l: np.ndarray, qt_c: np.ndarray) -> bytearray:
    """SOI + JFIF + DQT + SOFn + DHT marker prefix (tables are Annex K)."""
    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt_l[ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qt_c[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, (hs, vs, qid) in enumerate(comps):
        sof += bytes([i + 1, (hs << 4) | vs, qid])
    out += _seg(sof_marker, sof)
    for cls, tid, (bits, vals) in ((0, 0, _DC_LUMA), (1, 0, _AC_LUMA),
                                   (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)):
        if gray and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    return out


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 as baseline JPEG."""
    h, w, gray, comps, coeffs, qt_l, qt_c = _prepare_frame(
        img, quality, subsample)
    dc_l, ac_l = _build_encode(_DC_LUMA), _build_encode(_AC_LUMA)
    dc_c, ac_c = _build_encode(_DC_CHROMA), _build_encode(_AC_CHROMA)

    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    bw = _BitWriter()
    preds = [0] * len(comps)
    tabs = [(dc_l, ac_l) if i == 0 or gray else (dc_c, ac_c)
            for i in range(len(comps))]
    scan = bytearray()
    n_mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.byte_align()
                scan += bw.buf
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * len(comps)
            for ci, (hs, vs, _q) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        blk = coeffs[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _write_block(bw, blk, preds[ci], *tabs[ci])
            n_mcu += 1
    bw.byte_align()
    scan += bw.buf

    # ---- marker stream
    out = _frame_headers(0xC0, h, w, gray, comps, qt_l, qt_c)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        tid = 0 if (i == 0 or gray) else 1
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# progressive encoder (T.81 Annex G — spectral selection + successive
# approximation)
# --------------------------------------------------------------------------

def _write_block_dc_first(bw: _BitWriter, dc: int, pred: int, al: int,
                          dc_tab: dict) -> int:
    """DC first scan: diff-code the point-transformed DC (arith shift)."""
    v = dc >> al  # two's-complement arithmetic shift (G.1.2.1)
    diff = v - pred
    size = abs(diff).bit_length()
    code, nb = dc_tab[size]
    bw.write(code, nb)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    return v


def _write_block_ac_first(bw: _BitWriter, zz: np.ndarray, ss: int, se: int,
                          al: int, ac_tab: dict) -> None:
    """AC first scan over band [ss, se]: sign-magnitude point transform,
    EOB runs capped at one block (symbol 0x00) so Annex-K tables apply."""
    prev = ss - 1
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (abs(v) >> al) * (1 if v > 0 else -1)
        if t == 0:
            continue
        run = k - prev - 1
        while run >= 16:
            zc, zn = ac_tab[0xF0]  # ZRL
            bw.write(zc, zn)
            run -= 16
        size = abs(t).bit_length()
        code, nb = ac_tab[(run << 4) | size]
        bw.write(code, nb)
        bw.write(t if t > 0 else t + (1 << size) - 1, size)
        prev = k
    if prev != se:
        code, nb = ac_tab[0x00]  # EOB (run of exactly this block)
        bw.write(code, nb)


def _write_block_ac_refine(bw: _BitWriter, zz: np.ndarray, ss: int, se: int,
                           al: int, ac_tab: dict) -> None:
    """AC refinement scan (G.1.2.3): newly-significant coefficients are
    coded (run << 4) | 1 + sign bit, where the run counts ZERO-history
    positions only; correction bits of already-nonzero coefficients passed
    en route buffer up and flush after the next symbol (the libjpeg BE
    protocol); a trailing EOB flushes the rest."""
    band = [(abs(int(zz[k])) >> al, int(zz[k]) > 0) for k in range(ss, se + 1)]
    eob = 0  # index AFTER the last newly-significant coefficient
    for i, (t, _pos) in enumerate(band):
        if t == 1:
            eob = i + 1
    run = 0
    pending: "list[int]" = []  # buffered correction bits
    for i in range(eob):
        t, pos = band[i]
        if t == 0:
            run += 1
            continue
        # ZRL check happens at EVERY nonzero visit (correction bits flushed
        # with the ZRL must be exactly those the decoder's post-ZRL walk
        # consumes — the libjpeg BE protocol)
        while run > 15:
            zc, zn = ac_tab[0xF0]
            bw.write(zc, zn)
            run -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:  # already significant in a previous scan: correction bit
            pending.append(t & 1)
            continue
        # t == 1: newly significant here
        code, nb = ac_tab[(run << 4) | 1]
        bw.write(code, nb)
        bw.write(1 if pos else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        run = 0
    if eob != len(band):
        # correction bits beyond the last newly-significant coefficient
        for i in range(eob, len(band)):
            t, _pos = band[i]
            if t > 1:
                pending.append(t & 1)
        code, nb = ac_tab[0x00]  # EOB
        bw.write(code, nb)
        for b in pending:
            bw.write(b, 1)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 90,
                            subsample: str = "444",
                            restart_interval: int = 0) -> bytes:
    """Encode as progressive JPEG (SOF2) with the libjpeg-style scan script:

    1. DC, all components interleaved, Al=1
    2. per component: AC band 1-5 first scan, Al=2
    3. per component: AC band 6-63 first scan, Al=2
    4. per component: AC band 1-63 refinement, Ah=2 -> Al=1
    5. per component: AC band 1-63 refinement, Ah=1 -> Al=0
    6. DC refinement, all components interleaved, Ah=1 -> Al=0

    Successive approximation reconstructs the exact quantized coefficients,
    so ``decode_jpeg`` returns pixels bit-identical to the same image's
    ``encode_jpeg`` baseline stream at equal quality/subsampling.

    ``restart_interval`` (in scan units: MCUs for the interleaved DC scans,
    blocks for the non-interleaved AC scans) inserts RSTn markers into every
    scan, resetting DC predictors per T.81 F.2.1.3.1."""
    h, w, gray, comps, coeffs, qt_l, qt_c = _prepare_frame(
        img, quality, subsample)
    dc_l, ac_l = _build_encode(_DC_LUMA), _build_encode(_AC_LUMA)
    dc_c, ac_c = _build_encode(_DC_CHROMA), _build_encode(_AC_CHROMA)
    nc = len(comps)
    tabs = [(dc_l, ac_l) if i == 0 or gray else (dc_c, ac_c)
            for i in range(nc)]
    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # true (non-MCU-padded) per-component block dims for non-interleaved scans
    nblocks = []
    for hs, vs, _q in comps:
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        nblocks.append((-(-ch // 8), -(-cw // 8)))

    out = _frame_headers(0xC2, h, w, gray, comps, qt_l, qt_c)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    def _sos(comp_ids, ss, se, ah, al, table_ids) -> bytes:
        sos = bytes([len(comp_ids)])
        for ci, tid in zip(comp_ids, table_ids):
            sos += bytes([ci + 1, tid])
        return _seg(0xDA, sos + bytes([ss, se, (ah << 4) | al]))

    class _Scan:
        """Entropy stream of one scan: RSTn every restart_interval units."""

        def __init__(self) -> None:
            self.body = bytearray()
            self.bw = _BitWriter()
            self.n = 0
            self.rst = 0

        def boundary(self) -> bool:
            """Advance the unit counter; True = predictors must reset."""
            if (restart_interval and self.n
                    and self.n % restart_interval == 0):
                self.bw.byte_align()
                self.body += self.bw.buf
                self.body += bytes([0xFF, 0xD0 + self.rst])
                self.rst = (self.rst + 1) % 8
                self.bw = _BitWriter()
                self.n += 1
                return True
            self.n += 1
            return False

        def finish(self) -> bytearray:
            self.bw.byte_align()
            self.body += self.bw.buf
            return self.body

    # ---- DC scans, interleaved: first at Al=1, refinement to Al=0
    for ah, al in ((0, 1), (1, 0)):
        out += _sos(range(nc), 0, 0, ah, al,
                    [0x00 if (i == 0 or gray or ah) else 0x11
                     for i in range(nc)])
        sc = _Scan()
        preds = [0] * nc
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if sc.boundary():
                    preds = [0] * nc
                for ci, (hs, vs, _q) in enumerate(comps):
                    for by in range(vs):
                        for bx in range(hs):
                            dc = int(coeffs[ci][my * vs + by, mx * hs + bx, 0])
                            if ah == 0:
                                preds[ci] = _write_block_dc_first(
                                    sc.bw, dc, preds[ci], al, tabs[ci][0])
                            else:
                                sc.bw.write(dc & 1, 1)
        out += sc.finish()
        if ah == 0:
            # ---- AC scans per component: two first-scan bands at Al=2,
            # then two full-band refinement passes down to Al=0
            for ss, se, sah, sal in ((1, 5, 0, 2), (6, 63, 0, 2),
                                     (1, 63, 2, 1), (1, 63, 1, 0)):
                for ci in range(nc):
                    tid = 0x00 if (ci == 0 or gray) else 0x01
                    out += _sos([ci], ss, se, sah, sal, [tid])
                    sc = _Scan()
                    bh, bwid = nblocks[ci]
                    write = (_write_block_ac_first if sah == 0
                             else _write_block_ac_refine)
                    for by in range(bh):
                        for bx in range(bwid):
                            sc.boundary()  # AC scans carry no predictor
                            write(sc.bw, coeffs[ci][by, bx], ss, se, sal,
                                  tabs[ci][1])
                    out += sc.finish()

    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to (H, W, C)
    uint8 (C=1 grayscale, C=3 RGB)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: "dict[int, np.ndarray]" = {}
    huff: "dict[tuple[int, int], dict]" = {}
    frame = None
    progressive = False
    stores = None  # progressive: per-component zigzag coefficient arrays
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker sync at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            if progressive and stores is not None:
                return _assemble(frame, stores, qts)
            raise ValueError("EOI before SOS")
        (seglen,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    zz = np.frombuffer(payload, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    zz = np.frombuffer(payload, ">u2", 64, p).astype(np.int64)
                    p += 128
                qts[tq] = zz  # zigzag order, matching serialized coefficients
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                huff[(cls, tid)] = _build_decode(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", payload)
        elif marker in (0xC0, 0xC1, 0xC2):
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, sf, qid = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, sf >> 4, sf & 0x0F, qid))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"SOF{marker - 0xC0} coding process")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan_tabs = {}
            scan_comps = []
            for i in range(ns):
                cid, tt = payload[1 + 2 * i : 3 + 2 * i]
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            if not progressive:
                # baseline: exactly one interleaved full-band scan
                return _decode_scan(data, pos, frame, qts, huff, scan_tabs,
                                    restart_interval)
            ss, se, a = payload[1 + 2 * ns : 4 + 2 * ns]
            if stores is None:
                stores = _alloc_stores(frame)
            pos = _decode_prog_scan(data, pos, frame, stores, huff,
                                    scan_comps, ss, se, a >> 4, a & 0x0F,
                                    restart_interval)
    raise ValueError("no scan data (missing SOS)" if not progressive
                     else "progressive stream missing EOI")


def _decode_scan(data: bytes, pos: int, frame, qts, huff, scan_tabs,
                 restart_interval: int) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    # per-component coefficient stores, (blocks_y, blocks_x, 64)
    stores = []
    luts = []
    for cid, hs, vs, qid in comps:
        stores.append(np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int32))
        dc_id, ac_id = scan_tabs[cid]
        luts.append((huff[(0, dc_id)], huff[(1, ac_id)]))
    rd = _BitReader(data, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                rd.restart()
                preds = [0] * len(comps)
            for ci, (cid, hs, vs, qid) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        blk = stores[ci][my * vs + by, mx * hs + bx]
                        preds[ci] = _read_block(rd, preds[ci], *luts[ci], blk)
            n_mcu += 1
    return _assemble(frame, stores, qts)


def _assemble(frame, stores, qts) -> np.ndarray:
    """Dequantize + inverse DCT + chroma upsample + color convert."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, hs, vs, qid), st in zip(comps, stores):
        bh, bw_ = st.shape[0], st.shape[1]
        px = _decode_plane_pixels(st.reshape(-1, 64), qts[qid].astype(np.int64),
                                  bh, bw_)
        if hs != hmax or vs != vmax:
            px = np.repeat(np.repeat(px, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(px[:fh, :fw])
    if len(planes) == 1:
        return planes[0][:, :, None]
    if len(planes) == 3:
        return _ycbcr_to_rgb(*planes)
    return np.stack(planes, axis=-1)


# --------------------------------------------------------------------------
# progressive decoder (T.81 Annex G.2)
# --------------------------------------------------------------------------

def _alloc_stores(frame) -> "list[np.ndarray]":
    """Per-component MCU-padded (blocks_y, blocks_x, 64) zigzag coefficient
    arrays, accumulated across scans."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    return [np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int32)
            for _cid, hs, vs, _qid in comps]


def _true_blocks(frame, ci: int) -> "tuple[int, int]":
    """True (non-MCU-padded) block dims of component ci — the unit grid of
    non-interleaved scans (T.81 A.2.2)."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _cid, hs, vs, _qid = comps[ci]
    cw = -(-fw * hs // hmax)
    ch = -(-fh * vs // vmax)
    return -(-ch // 8), -(-cw // 8)


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Advance past any entropy-data remainder to the next non-RST marker."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("unterminated progressive scan")


def _read_block_ac_first(rd: _BitReader, out: np.ndarray, ss: int, se: int,
                         al: int, ac_lut: dict) -> int:
    """One block of an AC first scan (G.2.2); returns the remaining EOB run
    (blocks after this one that are entirely end-of-band)."""
    k = ss
    while k <= se:
        rs = _symbol(rd, ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rd.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        out[k] = _extend(rd.bits(s), s) << al
        k += 1
    return 0


def _read_block_ac_refine(rd: _BitReader, out: np.ndarray, ss: int, se: int,
                          al: int, ac_lut: dict, eobrun: int) -> int:
    """One block of an AC refinement scan (G.2.3: correction bits for
    already-nonzero coefficients, (run<<4)|1 + sign for newly-significant
    ones, EOB runs); returns the updated EOB run."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        hit_eob = False
        while k <= se:
            rs = _symbol(rd, ac_lut)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    # EOBn covers THIS block too: its remaining nonzero
                    # coefficients still take correction bits (below)
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    hit_eob = True
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                newval = p1 if rd.bit() else m1
            # advance: run counts zero-history positions only; nonzero-history
            # positions passed en route consume a correction bit each
            while k <= se:
                if out[k] != 0:
                    if rd.bit() and (out[k] & p1) == 0:
                        out[k] += p1 if out[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement run past band end")
                out[k] = newval
            k += 1
        if not hit_eob:
            return 0  # band fully coded, no EOB run
    # end-of-band region: correction bits for every remaining nonzero
    # coefficient of this block; the run covers eobrun-1 MORE whole blocks
    for kk in range(k, se + 1):
        if out[kk] != 0:
            if rd.bit() and (out[kk] & p1) == 0:
                out[kk] += p1 if out[kk] >= 0 else m1
    return eobrun - 1


def _decode_prog_scan(data: bytes, pos: int, frame, stores, huff,
                      scan_comps, ss: int, se: int, ah: int, al: int,
                      restart_interval: int) -> int:
    """Decode one progressive scan into the coefficient stores; returns the
    byte position of the next marker."""
    fh, fw, comps = frame
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    rd = _BitReader(data, pos)
    if ss == 0:  # ---- DC scan (interleaved over the scan's components)
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        members = []  # (ci, hs, vs, dc_lut|None)
        for cid, dc_tid, _ac_tid in scan_comps:
            ci = cid_to_ci[cid]
            _c, hs, vs, _q = comps[ci]
            lut = huff[(0, dc_tid)] if ah == 0 else None
            members.append((ci, hs, vs, lut))
        if len(scan_comps) == 1:
            # non-interleaved: iterate the single component's true blocks
            ci, _hs, _vs, lut = members[0]
            bh, bw_ = _true_blocks(frame, ci)
            units = [(ci, by, bx, lut) for by in range(bh)
                     for bx in range(bw_)]
        else:
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    mcu = []
                    for ci, hs, vs, lut in members:
                        for by in range(vs):
                            for bx in range(hs):
                                mcu.append((ci, my * vs + by, mx * hs + bx,
                                            lut))
                    units.append(mcu)
        preds = {ci: 0 for ci, *_rest in members}
        n = 0
        for unit in (units if len(scan_comps) > 1 else [[u] for u in units]):
            if restart_interval and n and n % restart_interval == 0:
                rd.restart()
                preds = {ci: 0 for ci in preds}
            for ci, by, bx, lut in unit:
                blk = stores[ci][by, bx]
                if ah == 0:  # first DC scan: diff-coded, point-transformed
                    size = _symbol(rd, lut)
                    preds[ci] += _extend(rd.bits(size), size) if size else 0
                    blk[0] = preds[ci] << al
                else:  # refinement: one raw bit per block
                    blk[0] |= rd.bit() << al
            n += 1
    else:  # ---- AC scan: exactly one component, non-interleaved
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cid, _dc_tid, ac_tid = scan_comps[0]
        ci = cid_to_ci[cid]
        ac_lut = huff[(1, ac_tid)]
        bh, bw_ = _true_blocks(frame, ci)
        eobrun = 0
        n = 0
        for by in range(bh):
            for bx in range(bw_):
                if restart_interval and n and n % restart_interval == 0:
                    rd.restart()
                    eobrun = 0
                blk = stores[ci][by, bx]
                if ah == 0:
                    if eobrun > 0:
                        eobrun -= 1
                    else:
                        eobrun = _read_block_ac_first(rd, blk, ss, se, al,
                                                      ac_lut)
                else:
                    eobrun = _read_block_ac_refine(rd, blk, ss, se, al,
                                                   ac_lut, eobrun)
                n += 1
    return _skip_to_marker(data, rd.pos)
