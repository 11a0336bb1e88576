"""YUV4MPEG2 (.y4m) video codec from scratch (stdlib + numpy only).

Y4M is the canonical *uncompressed* video interchange container (mjpegtools
lineage; what ffmpeg/x264 pipe raw video through): an ASCII stream header

    YUV4MPEG2 W<width> H<height> F<num>:<den> [Ip] [A1:1] [C<space>]\\n

followed by frames, each an ASCII ``FRAME[params]\\n`` marker plus packed
planar pixel data — ``C420``-family: Y (w*h) + Cb + Cr (w/2*h/2 each);
``Cmono``: Y only.  Because the format is raw, a complete, byte-exact codec
is implementable from the public spec with no codec libraries — the video
analogue of the engine's from-scratch WAV (audio) and PNG (image) codecs,
and what de-stubs ``frame_sample(backend="real")``.

Reference-parity role: the reference has no video path; this exists for the
graft's multimodal pipeline surface (SURVEY.md §2.9b).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_y4m", "parse_y4m_header", "decode_y4m"]

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: "tuple[int, int]" = (25, 1),
               colorspace: str = "C420jpeg") -> bytes:
    """Encode ``(n, h, w)`` uint8 luma frames.  For the C420 family the
    chroma planes are written neutral (128); ``Cmono`` writes luma only.
    Width and height must be even for C420 subsampling."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"frames must be (n, h, w), got {frames.shape}")
    n, h, w = frames.shape
    if colorspace.startswith("C420") and (w % 2 or h % 2):
        raise ValueError("C420 needs even dimensions")
    parts = [b"%s W%d H%d F%d:%d Ip A1:1 %s\n"
             % (_MAGIC, w, h, fps[0], fps[1], colorspace.encode())]
    chroma = (b"\x80" * ((w // 2) * (h // 2) * 2)
              if colorspace.startswith("C420") else b"")
    for f in frames:
        parts.append(b"FRAME\n")
        parts.append(f.tobytes())
        parts.append(chroma)
    return b"".join(parts)


def parse_y4m_header(data: bytes) -> dict:
    """Parse the stream header; returns width/height/fps/colorspace plus
    ``header_len`` and ``frame_size`` (pixel bytes per frame)."""
    if not data.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    end = data.index(b"\n")
    out = {"colorspace": "C420jpeg", "fps_num": 25, "fps_den": 1}
    for tok in data[len(_MAGIC) + 1:end].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            out["width"] = int(val)
        elif tag == b"H":
            out["height"] = int(val)
        elif tag == b"F":
            a, b = val.split(b":")
            out["fps_num"], out["fps_den"] = int(a), int(b)
        elif tag == b"C":
            out["colorspace"] = tok.decode()
    if "width" not in out or "height" not in out:
        raise ValueError("y4m header missing W/H")
    w, h = out["width"], out["height"]
    cs = out["colorspace"]
    if cs.startswith("C420"):
        out["frame_size"] = w * h + 2 * ((w // 2) * (h // 2))
    elif cs == "Cmono":
        out["frame_size"] = w * h
    else:
        raise ValueError(f"unsupported colorspace {cs!r} (C420*/Cmono)")
    out["header_len"] = end + 1
    return out


def decode_y4m(data: bytes) -> "tuple[dict, np.ndarray]":
    """Decode the full stream -> (params, (n, h, w) uint8 luma frames).
    Chroma is parsed past but not returned (the engine's features are
    luma-based); per-frame FRAME parameter strings are accepted."""
    p = parse_y4m_header(data)
    w, h, fsz = p["width"], p["height"], p["frame_size"]
    pos, planes = p["header_len"], []
    while pos < len(data):
        if not data.startswith(b"FRAME", pos):
            raise ValueError(f"bad FRAME marker at byte {pos}")
        nl = data.index(b"\n", pos)
        start = nl + 1
        if start + fsz > len(data):
            raise ValueError("truncated frame")
        planes.append(np.frombuffer(data[start:start + w * h], dtype=np.uint8)
                      .reshape(h, w))
        pos = start + fsz
    p["n_frames"] = len(planes)
    return p, (np.stack(planes) if planes else np.empty((0, h, w), np.uint8))
