"""Pure-python single-band GeoTIFF reader/writer (SURVEY.md S2/S6 de-stub).

The reference's rasters are GeoTIFFs (``raster()`` / ``writeRaster(...,
type="GTIFF")``, ``Supplemental_Data_1.R:175,211,53-72``).  This sandbox has
no GDAL/rasterio, and the reference .tifs themselves are LFS pointers — but
the FORMAT is public (TIFF 6.0 spec + GeoTIFF 1.1, OGC 19-008r4), so the
engine owns a minimal implementation sufficient for the reference's data
model: one band, strip or tile layout, uncompressed or DEFLATE, int/uint/
float samples, georeferencing via ModelPixelScale + ModelTiepoint.

Scope (documented, deliberate):

- read: little/big endian classic TIFF AND BigTIFF (version 43: u64
  offsets, 20-byte IFD entries, LONG8/SLONG8/IFD8 types — the first
  format real-world >4 GB rasters hit); compression 1 (none), 5 (LZW,
  TIFF6 early-change variant — the most common real-world GeoTIFF
  compression), 8/32946 (zlib DEFLATE); horizontal-differencing predictor
  2; strips or tiles; multi-band via ``band=`` — chunky (PlanarConfig 1)
  and planar (PlanarConfig 2) strip layouts.  JPEG compression is out of
  scope — raises with a clear message.
- write: strip layout (classic or ``bigtiff=True``), optional DEFLATE or
  LZW, float32/float64/int32/uint8 samples, ModelPixelScale/Tiepoint +
  GDAL_NODATA; multi-band chunky via a (H, W, S) grid.

Interop with the engine's raster model: :func:`read_geotiff` returns the
(grid, GeoRef) pair ``state/raster.py`` uses everywhere, so a GeoTIFF can
drop into a ``features.json`` manifest next to .npy grids.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .raster import GeoRef

__all__ = ["read_geotiff", "write_geotiff", "lzw_decode", "lzw_encode"]


# ---------------------------------------------------------------------------
# TIFF LZW (compression 5) — TIFF 6.0 §13, MSB-first bit packing with the
# "early change" convention: code width bumps when table entry 510/1022/2046
# is ADDED (one code earlier than the natural 511/1023/2047), matching
# libtiff.  Pure python; used as the compatibility path for reading
# real-world GeoTIFFs (VERDICT r02 #9) — DEFLATE remains the fast default
# for engine-written rasters.
# ---------------------------------------------------------------------------

_LZW_CLEAR, _LZW_EOI = 256, 257


def lzw_decode(data: bytes) -> bytes:
    """Decode a TIFF-LZW code stream (one strip/tile's worth)."""
    out = bytearray()
    nbits = 9
    table: list[bytes] = []
    prev: "bytes | None" = None
    bitpos = 0
    total_bits = len(data) * 8
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    while bitpos + nbits <= total_bits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos & 7) - nbits)) & ((1 << nbits) - 1)
        bitpos += nbits
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = list(base)
            nbits = 9
            prev = None
            continue
        if prev is None:  # first code after a clear: always a literal
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            else:  # the KwKwK case
                entry = prev + prev[:1]
            table.append(prev + entry[:1])
            if len(table) == (1 << nbits) - 1 and nbits < 12:  # early change
                nbits += 1
        out += entry
        prev = entry
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """Encode bytes as a TIFF-LZW code stream readable by :func:`lzw_decode`
    and by libtiff/GDAL (early-change widths, table reset at code 4094)."""
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit(code: int, nbits: int) -> None:
        nonlocal acc, acc_bits
        acc = (acc << nbits) | code
        acc_bits += nbits
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    nbits = 9
    emit(_LZW_CLEAR, nbits)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], nbits)
        table[wc] = next_code
        next_code += 1
        # the encoder's table is one entry AHEAD of the decoder's, so its
        # natural boundary (next_code == 2^w) IS the decoder's early change
        # (decoder table hits 2^w - 1): both switch before the same code.
        if next_code == (1 << nbits) and nbits < 12:
            nbits += 1
        if next_code == 4094:  # leave room, reset like libtiff
            emit(_LZW_CLEAR, nbits)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
        w = bytes([byte])
    if w:
        emit(table[w], nbits)
    emit(_LZW_EOI, nbits)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)

# TIFF tags
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_PREDICTOR = 317
_TILE_WIDTH = 322
_TILE_LENGTH = 323
_TILE_OFFSETS = 324
_TILE_BYTE_COUNTS = 325
_SAMPLE_FORMAT = 339
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GDAL_NODATA = 42113

# types 16/17/18 are the BigTIFF additions (LONG8/SLONG8/IFD8)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q", 18: "Q"}


def _read_ifd_entries(buf: bytes, off: int, en: str,
                      big: bool = False) -> dict[int, tuple]:
    """IFD walk, classic (12-byte entries, u16 count, 4-byte value slot)
    or BigTIFF (20-byte entries, u64 count, 8-byte value slot)."""
    if big:
        (n,) = struct.unpack_from(en + "Q", buf, off)
        base, stride, inline = off + 8, 20, 8
    else:
        (n,) = struct.unpack_from(en + "H", buf, off)
        base, stride, inline = off + 2, 12, 4
    entries: dict[int, tuple] = {}
    for i in range(int(n)):
        e = base + i * stride
        tag, typ = struct.unpack_from(en + "HH", buf, e)
        (cnt,) = struct.unpack_from(en + ("Q" if big else "I"), buf, e + 4)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        voff = e + (12 if big else 8)
        if size > inline:
            (voff,) = struct.unpack_from(en + ("Q" if big else "I"), buf, voff)
        entries[tag] = (typ, int(cnt), int(voff))
    return entries


def _tag_values(buf: bytes, entry: tuple, en: str):
    typ, cnt, voff = entry
    if typ == 2:  # ASCII
        raw = buf[voff : voff + cnt]
        return raw.split(b"\0")[0].decode("ascii", "replace")
    if typ == 5 or typ == 10:  # RATIONAL
        out = []
        for i in range(cnt):
            a, b = struct.unpack_from(en + ("II" if typ == 5 else "ii"), buf, voff + 8 * i)
            out.append(a / b if b else float("nan"))
        return out
    fmt = _TYPE_FMT[typ]
    return list(struct.unpack_from(en + fmt * cnt, buf, voff))


def _dtype_of(bits: int, fmt: int, en: str) -> np.dtype:
    base = {(1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
            (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
            (3, 32): "f4", (3, 64): "f8"}.get((fmt, bits))
    if base is None:
        raise NotImplementedError(f"unsupported sample format/bits: {fmt}/{bits}")
    return np.dtype(("<" if en == "<" else ">") + base)


def _undo_predictor2(block: np.ndarray) -> np.ndarray:
    # horizontal differencing: cumulative sum along rows (integer wraparound)
    return np.cumsum(block, axis=1, dtype=block.dtype)


def read_geotiff(path: str, band: "int | None" = None) -> tuple[np.ndarray, GeoRef]:
    """Read one band of a GeoTIFF into (float64 grid, :class:`GeoRef`).

    Single-band files need no ``band``; multi-band files (chunky or planar
    strip layout) require ``band=0..spp-1`` — the engine's raster model is
    one grid per feature, so a multi-band file reads as spp separate
    gathers.  Nodata cells (GDAL_NODATA tag) come back as NaN — matching
    the engine's npy raster convention so both formats interchange freely."""
    with open(path, "rb") as f:
        buf = f.read()
    magic = buf[:2]
    if magic == b"II":
        en = "<"
    elif magic == b"MM":
        en = ">"
    else:
        raise ValueError(f"{path}: not a TIFF (magic {magic!r})")
    (version,) = struct.unpack_from(en + "H", buf, 2)
    if version == 43:  # BigTIFF: u64 offsets, 20-byte IFD entries
        osize, zero = struct.unpack_from(en + "HH", buf, 4)
        if osize != 8 or zero != 0:
            raise ValueError(f"{path}: bad BigTIFF header ({osize}, {zero})")
        (ifd_off,) = struct.unpack_from(en + "Q", buf, 8)
        big = True
    elif version == 42:
        (ifd_off,) = struct.unpack_from(en + "I", buf, 4)
        big = False
    else:
        raise ValueError(f"{path}: bad TIFF version {version}")
    tags = _read_ifd_entries(buf, ifd_off, en, big)

    def tagv(tag: int, default=None):
        if tag not in tags:
            if default is not None:
                return default
            raise ValueError(f"{path}: missing required TIFF tag {tag}")
        return _tag_values(buf, tags[tag], en)

    width = int(tagv(_IMAGE_WIDTH)[0])
    height = int(tagv(_IMAGE_LENGTH)[0])
    bits_list = [int(b) for b in tagv(_BITS_PER_SAMPLE, [8])]
    comp = int(tagv(_COMPRESSION, [1])[0])
    spp = int(tagv(_SAMPLES_PER_PIXEL, [1])[0])
    planar = int(tagv(_PLANAR_CONFIG, [1])[0])
    fmt_list = [int(x) for x in tagv(_SAMPLE_FORMAT, [1])]
    pred = int(tagv(_PREDICTOR, [1])[0])
    # BitsPerSample / SampleFormat may carry one value for all samples or
    # one per sample (mixed depths, e.g. u8 mask + f4 data planes)
    if len(bits_list) < spp:
        bits_list = bits_list * spp
    if len(fmt_list) < spp:
        fmt_list = fmt_list * spp
    if spp > 1 and band is None:
        raise ValueError(f"{path}: {spp} samples/pixel — pass band=0..{spp - 1}")
    bi = 0 if band is None else int(band)
    if not 0 <= bi < spp:
        raise ValueError(f"{path}: band {band} out of range (spp={spp})")
    if comp not in (1, 5, 8, 32946):
        raise NotImplementedError(f"{path}: compression {comp} (none/lzw/deflate only)")
    if any(b % 8 for b in bits_list[:spp]):
        raise NotImplementedError(f"{path}: bit-packed samples {bits_list}")
    bits, fmt = bits_list[bi], fmt_list[bi]
    dt = _dtype_of(bits, fmt, en)
    mixed = len(set(zip(bits_list[:spp], fmt_list[:spp]))) > 1
    pix_bytes = sum(b // 8 for b in bits_list[:spp])
    byte_off = sum(b // 8 for b in bits_list[:bi])

    def segment_band(seg: bytes, nrows: int, ncols: int, one_plane: bool) -> np.ndarray:
        """Band ``bi`` of one decoded strip/tile as a native-endian
        (nrows, ncols) array.  Handles homogeneous chunky/planar layouts and
        mixed-depth chunky pixels (byte-sliced out of the interleaved pixel).
        Predictor-2 undo is per sample component, so differencing commutes
        with band extraction."""
        if one_plane:
            arr = np.frombuffer(seg, dtype=dt)[: nrows * ncols].reshape(nrows, ncols)
        elif not mixed:
            arr = np.frombuffer(seg, dtype=dt)[: nrows * ncols * spp].reshape(
                nrows, ncols, spp)[:, :, bi]
        else:
            u8 = np.frombuffer(seg, dtype=np.uint8)[
                : nrows * ncols * pix_bytes].reshape(nrows, ncols, pix_bytes)
            arr = np.ascontiguousarray(
                u8[:, :, byte_off : byte_off + dt.itemsize]).view(dt).reshape(nrows, ncols)
        arr = arr.astype(dt.newbyteorder("="))
        if pred == 2:
            arr = _undo_predictor2(arr)
        return arr

    def decode(seg: bytes) -> bytes:
        if comp in (8, 32946):
            return zlib.decompress(seg)
        if comp == 5:
            return lzw_decode(seg)
        return seg

    grid = np.empty((height, width), dtype=dt.newbyteorder("="))
    one_plane = spp > 1 and planar == 2
    if _TILE_OFFSETS in tags:
        tw = int(tagv(_TILE_WIDTH)[0])
        th = int(tagv(_TILE_LENGTH)[0])
        offs = tagv(_TILE_OFFSETS)
        cnts = tagv(_TILE_BYTE_COUNTS)
        tiles_across = -(-width // tw)
        if one_plane:
            # planar tiles: all tiles of plane 0 (row-major), then plane 1, …
            tpp = tiles_across * (-(-height // th))
            offs = offs[bi * tpp : (bi + 1) * tpp]
            cnts = cnts[bi * tpp : (bi + 1) * tpp]
        for ti, (o, c) in enumerate(zip(offs, cnts)):
            block = segment_band(decode(buf[o : o + c]), th, tw, one_plane)
            r0 = (ti // tiles_across) * th
            c0 = (ti % tiles_across) * tw
            grid[r0 : r0 + th, c0 : c0 + tw] = block[: height - r0, : width - c0]
    else:
        rps = int(tagv(_ROWS_PER_STRIP, [height])[0])
        offs = tagv(_STRIP_OFFSETS)
        cnts = tagv(_STRIP_BYTE_COUNTS)
        if one_plane:
            # planar: all strips of plane 0, then plane 1, ... — slice ours
            spi = -(-height // rps)
            offs = offs[bi * spi : (bi + 1) * spi]
            cnts = cnts[bi * spi : (bi + 1) * spi]
        r = 0
        for o, c in zip(offs, cnts):
            nrows = min(rps, height - r)
            grid[r : r + nrows] = segment_band(decode(buf[o : o + c]), nrows, width,
                                               one_plane)
            r += nrows
    out = grid.astype(np.float64)
    if _GDAL_NODATA in tags:
        try:
            nod = float(tagv(_GDAL_NODATA))
            out[grid == np.asarray(nod).astype(grid.dtype)] = np.nan
        except ValueError:
            pass
    # georeferencing: raster-space (0,0) tied to world (tx, ty), scale (sx, sy)
    scale = tagv(_MODEL_PIXEL_SCALE, [1.0, 1.0, 0.0])
    tie = tagv(_MODEL_TIEPOINT, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    sx, sy = float(scale[0]), float(scale[1])
    tx, ty = float(tie[3]), float(tie[4])
    georef = GeoRef(
        nrows=height, ncols=width,
        lat_min=ty - sy * height, lat_max=ty,
        lon_min=tx, lon_max=tx + sx * width,
        crs="GTIFF",
    )
    return out, georef


def write_geotiff(
    path: str,
    grid: np.ndarray,
    georef: GeoRef,
    dtype: str = "f4",
    nodata: "float | None" = None,
    compress: "bool | str" = False,
    bigtiff: bool = False,
) -> None:
    """Write a GeoTIFF (strip layout, little-endian; ``compress`` is False,
    True/"deflate", or "lzw").  A 2-D grid writes single-band; a
    (H, W, S) grid writes S bands chunky-interleaved (PlanarConfig 1).
    NaN cells become ``nodata`` (required if the grid has NaNs).
    ``bigtiff=True`` writes the version-43 layout (u64 offsets/counts,
    20-byte IFD entries, LONG8 strip tags) — same pixel bytes, so the two
    containers round-trip identically.  Round-trips through
    :func:`read_geotiff` bit-exactly at the written dtype's precision."""
    grid = np.asarray(grid)
    spp = 1 if grid.ndim == 2 else int(grid.shape[2])
    if grid.shape[:2] != (georef.nrows, georef.ncols):
        raise ValueError(f"grid shape {grid.shape} != georef {(georef.nrows, georef.ncols)}")
    dt = np.dtype("<" + dtype)
    vals = grid.astype(np.float64)
    has_nan = bool(np.isnan(vals).any())
    if has_nan:
        if nodata is None:
            raise ValueError("grid contains NaN; pass nodata=")
        vals = np.where(np.isnan(vals), float(nodata), vals)
    data = np.ascontiguousarray(vals.astype(dt)).tobytes()
    if compress == "lzw":
        comp_code = 5
        data = lzw_encode(data)
    elif compress:
        comp_code = 8
        data = zlib.compress(data, 6)
    else:
        comp_code = 1
    height, width = grid.shape[:2]
    if dt.kind == "f":
        fmt_code = 3
    elif dt.kind == "i":
        fmt_code = 2
    else:
        fmt_code = 1
    bits = dt.itemsize * 8

    sx = (georef.lon_max - georef.lon_min) / georef.ncols
    sy = (georef.lat_max - georef.lat_min) / georef.nrows
    scale = struct.pack("<3d", sx, sy, 0.0)
    tie = struct.pack("<6d", 0.0, 0.0, 0.0, georef.lon_min, georef.lat_max, 0.0)
    nod_ascii = (f"{nodata}".encode("ascii") + b"\0") if nodata is not None else b""

    # layout: header(8 classic / 16 bigtiff) | strip data | external | IFD
    data_off = 16 if bigtiff else 8
    ext_off = data_off + len(data)
    ext: list[bytes] = []

    def ext_push(b: bytes) -> int:
        nonlocal ext_off
        off = ext_off
        ext.append(b)
        ext_off += len(b)
        return off

    scale_off = ext_push(scale)
    tie_off = ext_push(tie)
    nod_off = ext_push(nod_ascii) if nod_ascii else 0
    inline_shorts = 4 if bigtiff else 2  # value-slot width / sizeof(SHORT)
    if 1 < spp <= inline_shorts:  # SHORT arrays fitting the slot must inline
        bits_off = sum(bits << (16 * k) for k in range(spp))
        fmt_off = sum(fmt_code << (16 * k) for k in range(spp))
    elif spp > inline_shorts:  # longer per-sample SHORT arrays go external
        bits_off = ext_push(struct.pack(f"<{spp}H", *([bits] * spp)))
        fmt_off = ext_push(struct.pack(f"<{spp}H", *([fmt_code] * spp)))
    ifd_off = ext_off

    strip_typ = 16 if bigtiff else 4  # LONG8 exercises the BigTIFF types
    entries = [
        (_IMAGE_WIDTH, 4, 1, width),
        (_IMAGE_LENGTH, 4, 1, height),
        (_BITS_PER_SAMPLE, 3, spp, bits if spp == 1 else bits_off),
        (_COMPRESSION, 3, 1, comp_code),
        (_PHOTOMETRIC, 3, 1, 1),
        (_STRIP_OFFSETS, strip_typ, 1, data_off),
        (_SAMPLES_PER_PIXEL, 3, 1, spp),
        (_ROWS_PER_STRIP, 4, 1, height),
        (_STRIP_BYTE_COUNTS, strip_typ, 1, len(data)),
        (_PLANAR_CONFIG, 3, 1, 1),
        (_SAMPLE_FORMAT, 3, spp, fmt_code if spp == 1 else fmt_off),
        (_MODEL_PIXEL_SCALE, 12, 3, scale_off),
        (_MODEL_TIEPOINT, 12, 6, tie_off),
    ]
    if nod_ascii:
        entries.append((_GDAL_NODATA, 2, len(nod_ascii), nod_off))
    entries.sort(key=lambda e: e[0])

    if bigtiff:
        ifd = struct.pack("<Q", len(entries))
        for tag, typ, cnt, val in entries:
            ifd += struct.pack("<HHQQ", tag, typ, cnt, val)
        ifd += struct.pack("<Q", 0)  # no next IFD
        header = b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
    else:
        ifd = struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            ifd += struct.pack("<HHI", tag, typ, cnt)
            ifd += struct.pack("<I", val)
        ifd += struct.pack("<I", 0)  # no next IFD
        header = b"II" + struct.pack("<HI", 42, ifd_off)

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(data)
        for b in ext:
            f.write(b)
        f.write(ifd)
    import os

    os.replace(tmp, path)
