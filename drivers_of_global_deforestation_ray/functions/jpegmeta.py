"""JPEG metadata extraction WITHOUT a decoder: walk the marker structure
(ITU-T T.81 syntax) to the frame header (SOF) and read dimensions,
component count and progressive-ness.

Why it exists: multimodal corpus triage wants per-image dimensions and
type LONG before anything decodes pixels — dimension filters prune most
of a crawl's image bytes at the metadata stage.  Full pixel decode lives
in ``functions/jpeg.py`` (baseline Huffman + DCT, from scratch); this
module stays decode-free because the MARKER SYNTAX alone answers the
triage questions on ANY JPEG, including the progressive/arithmetic ones
the decoder rejects: segments are ``FF <marker> <u16 len> <payload>``;
the first SOF0-SOF15 segment (excluding DHT/DAC/JPG/RST) carries
``precision:u8, height:u16, width:u16, ncomp:u8``.

``encode_jpeg_shell`` builds a structurally-valid header shell (SOI,
JFIF-APP0, DQT, SOF0, EOI — no scan data) for deterministic fixtures; the
parser itself never assumes shell-ness.
"""

from __future__ import annotations

import struct

__all__ = ["jpeg_dims", "jpeg_frame", "jpeg_process", "encode_jpeg_shell"]

# markers that are standalone (no length word)
_STANDALONE = {0xD8, 0xD9} | set(range(0xD0, 0xD8))  # SOI, EOI, RST0-7
# SOF markers carrying a frame header (T.81 table B.1); C4/C8/CC are
# DHT / JPG-extension / DAC, NOT frames
_SOF = ({0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
         0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF})
_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}


def jpeg_process(marker: int) -> str:
    """Coding-process class of an SOF marker: ``"baseline"`` (SOF0/SOF1,
    what the from-scratch decoder handles), ``"progressive"`` (SOF2 family)
    or ``"other"`` (lossless/hierarchical/arithmetic)."""
    if marker in (0xC0, 0xC1):
        return "baseline"
    if marker in _PROGRESSIVE:
        return "progressive"
    return "other"


def jpeg_dims(data: bytes) -> "tuple[int, int, int, bool]":
    """(width, height, n_components, progressive) from the first SOF.

    Raises ``ValueError`` on non-JPEG bytes or a truncated marker stream.
    """
    w, h, ncomp, marker = jpeg_frame(data)
    return w, h, ncomp, marker in _PROGRESSIVE


def jpeg_frame(data: bytes) -> "tuple[int, int, int, int]":
    """(width, height, n_components, sof_marker) from the first SOF —
    the marker byte lets triage distinguish decodable baseline frames
    from progressive/other coding processes (:func:`jpeg_process`).

    Raises ``ValueError`` on non-JPEG bytes or a truncated marker stream.
    """
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    n = len(data)
    while i < n:
        # skip fill bytes: markers may be preceded by any number of FFs
        if data[i] != 0xFF:
            raise ValueError(f"marker sync lost at byte {i}")
        while i < n and data[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = data[i]
        i += 1
        if marker in _STANDALONE:
            if marker == 0xD9:  # EOI before any SOF
                break
            continue
        if i + 2 > n:
            raise ValueError("truncated segment length")
        seg_len = struct.unpack(">H", data[i:i + 2])[0]
        if marker in _SOF:
            if i + 2 + 6 > n:
                raise ValueError("truncated SOF")
            height, width = struct.unpack(">HH", data[i + 3:i + 7])
            ncomp = data[i + 7]
            return width, height, ncomp, marker
        if marker == 0xDA:  # SOS: entropy data follows; no SOF seen yet
            raise ValueError("SOS before SOF (corrupt stream)")
        i += seg_len
    raise ValueError("no SOF marker found")


def encode_jpeg_shell(width: int, height: int, ncomp: int = 3,
                      progressive: bool = False,
                      sof_marker: "int | None" = None) -> bytes:
    """Structurally-valid JPEG header shell (no scan data) for fixtures.

    ``sof_marker`` overrides the frame marker (e.g. 0xC3 for a lossless
    shell exercising the ``jpeg_other`` triage class)."""
    app0 = b"JFIF\x00\x01\x02\x01\x00\x48\x00\x48\x00\x00"
    dqt = bytes([0]) + bytes(range(64))  # table 0, 64 fake entries
    comps = b"".join(bytes([cid + 1, 0x11, 0]) for cid in range(ncomp))
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp]) + comps
    marker = sof_marker if sof_marker is not None else (
        0xC2 if progressive else 0xC0)

    def seg(m: int, payload: bytes) -> bytes:
        return bytes([0xFF, m]) + struct.pack(">H", len(payload) + 2) + payload

    return (b"\xff\xd8" + seg(0xE0, app0) + seg(0xDB, dqt)
            + seg(marker, sof) + b"\xff\xd9")
