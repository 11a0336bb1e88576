"""Pure-python WAV (RIFF/PCM) codec — real audio decode for the multimodal
stages, same approach as the PNG codec (``functions/png.py``): the format is
fully implementable from the public spec (RIFF-1991 / RFC 2361) with stdlib
struct only.

Scope: PCM integer 8/16/32-bit and IEEE float32 (wFormatTag 1/3, plus the
WAVE_FORMAT_EXTENSIBLE wrapper), any channel count, standard ``fmt ``/
``data`` chunk layout.  Compressed codecs (ADPCM/MP3/...) are out of scope —
raise with a clear message.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav"]

_PCM, _FLOAT, _EXTENSIBLE = 1, 3, 0xFFFE
_DTYPES = {(_PCM, 8): np.uint8, (_PCM, 16): np.int16, (_PCM, 32): np.int32,
           (_FLOAT, 32): np.float32}


def decode_wav(data: bytes) -> "tuple[np.ndarray, int]":
    """Decode WAV bytes to ((n_frames, channels) float64 in [-1, 1],
    sample_rate).  8-bit PCM is unsigned-centered, 16/32-bit signed, float
    passes through — all normalized to [-1, 1] float64."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload (header {data[:12]!r})")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag == _EXTENSIBLE:
                if size < 40:
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
                # the real format tag leads the 16-byte SubFormat GUID
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, ch, rate, bits = fmt
    dt = _DTYPES.get((tag, bits))
    if dt is None:
        raise NotImplementedError(f"WAV format tag {tag} / {bits}-bit not supported "
                                  "(PCM 8/16/32 and float32 only)")
    raw = np.frombuffer(frames, dtype=np.dtype(dt).newbyteorder("<"))
    n = len(raw) - len(raw) % ch
    x = raw[:n].reshape(-1, ch).astype(np.float64)
    if tag == _PCM:
        if bits == 8:
            x = (x - 128.0) / 128.0
        else:
            x = x / float(2 ** (bits - 1))
    return x, int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode (n,) or (n, channels) float samples in [-1, 1] as PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    if bits not in (8, 16, 32):
        raise ValueError("bits must be 8, 16 or 32")
    if bits == 8:
        pcm = np.clip(np.round(x * 128.0 + 128.0), 0, 255).astype("<u1")
    else:
        lim = float(2 ** (bits - 1))
        pcm = np.clip(np.round(x * lim), -lim, lim - 1).astype(f"<i{bits // 8}")
    payload = np.ascontiguousarray(pcm).tobytes()
    align = ch * bits // 8
    fmt = struct.pack("<HHIIHH", _PCM, ch, sample_rate, sample_rate * align,
                      align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload
            + (b"\0" if len(payload) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body
