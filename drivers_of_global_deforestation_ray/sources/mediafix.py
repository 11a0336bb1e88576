"""Deterministic synthetic media corpus (single source of truth).

The registry's ``media_pipeline`` query and the media scaling bench both
generate payloads from this one function so their corpora agree byte-for-
byte at any scale: real JPEGs with planted near-dup pairs
(``i % 30 == 24`` copies ``i-6``'s content), alternating baseline and
PROGRESSIVE coding processes (``i % 12 == 6`` encodes SOF2 with spectral
selection + successive approximation; both decode via the from-scratch
T.81 codec, and since successive approximation reconstructs the exact
quantized coefficients, a baseline/progressive planted pair decodes to
identical pixels — a cross-coding-process near-dup), JPEG shells
(header-valid, no scan data — the decode-failure passthrough), real PNG
two-tone blocks with planted near-dup pairs (``i % 5 == 4`` copies
``i-1``), tiny PNGs (dimension-filtered at triage) and non-media
payloads (format-filtered).

Purely id-driven — no RNG state — so any partitioning of the id range
produces the identical corpus (the engine-wide determinism rule).
"""

from __future__ import annotations

import numpy as np


def _band_image(j: int, w: int, h: int) -> np.ndarray:
    """Deterministic 4-band grayscale texture for id ``j``: band tones and
    band heights come from a splitmix64-style bit mix, so the decoded
    pixel-statistics feature vector (mean/std/8-bin histogram) varies
    CONTINUOUSLY across ids — unlike a two-tone fill, whose tiny feature
    space makes a large corpus one giant near-dup cluster (an unrealistic
    dedup workload; a real crawl is mostly unique)."""
    x = (j * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 29
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 32
    b = [(x >> (8 * k)) & 0xFF for k in range(8)]
    tones = np.array(b[:4], np.uint8)
    weights = np.array([1 + b[4 + k] % 7 for k in range(4)], np.float64)
    bounds = np.round(np.cumsum(weights) / weights.sum() * h).astype(int)
    img = np.empty((h, w), np.uint8)
    top = 0
    for tone, bot in zip(tones, bounds):
        img[top:bot, :] = tone
        top = bot
    img[top:, :] = tones[-1]
    return img


def synth_media_payload(i: int) -> bytes:
    """The payload for document id ``i`` (deterministic, id-driven)."""
    from ..functions.jpeg import encode_jpeg, encode_jpeg_progressive
    from ..functions.jpegmeta import encode_jpeg_shell
    from ..functions.png import encode_png

    if i % 11 == 10:
        return b"not media " + str(i).encode()
    if i % 6 == 0:
        # real JPEG through the full decode -> LSH path; i % 12 == 6 takes
        # the progressive (SOF2) coding process, so planted pairs straddle
        # baseline/progressive and near-dup removal must cross them
        j = i - 6 if i % 30 == 24 else i  # planted near-dup partner
        w, h = 16 + j % 48, 16 + j % 32
        enc = encode_jpeg_progressive if i % 12 == 6 else encode_jpeg
        return enc(_band_image(j, w, h))
    if i % 3 == 0:
        return encode_jpeg_shell(64 + (i * 97) % 8000, 32 + i % 2000,
                                 ncomp=3)
    if i % 7 == 6:
        return encode_png(np.full((2, 2), i % 256, np.uint8))
    j = i - 1 if i % 5 == 4 else i  # planted near-dup partner
    w, h = 5 + j % 60, 7 + j % 40
    return encode_png(_band_image(j, w, h))


def synth_media_payloads(ids) -> list:
    """Payloads for an id array (list[bytes], order-aligned with ids)."""
    return [synth_media_payload(int(i)) for i in ids]
