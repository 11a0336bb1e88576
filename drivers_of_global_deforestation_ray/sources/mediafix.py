"""Deterministic synthetic media corpus (single source of truth).

The registry's ``media_pipeline`` query and the media scaling bench both
generate payloads from this one function so their corpora agree byte-for-
byte at any scale: real baseline JPEGs with planted near-dup pairs
(``i % 30 == 24`` copies ``i-6``'s content; encoded/decoded by the
from-scratch T.81 codec), JPEG shells (header-valid, no scan data — the
decode-failure passthrough), real PNG two-tone blocks with planted
near-dup pairs (``i % 5 == 4`` copies ``i-1``), tiny PNGs (dimension-
filtered at triage) and non-media payloads (format-filtered).

Purely id-driven — no RNG state — so any partitioning of the id range
produces the identical corpus (the engine-wide determinism rule).
"""

from __future__ import annotations

import numpy as np


def synth_media_payload(i: int) -> bytes:
    """The payload for document id ``i`` (deterministic, id-driven)."""
    from ..functions.jpeg import encode_jpeg
    from ..functions.jpegmeta import encode_jpeg_shell
    from ..functions.png import encode_png

    if i % 11 == 10:
        return b"not media " + str(i).encode()
    if i % 6 == 0:
        # real baseline JPEG through the full decode -> LSH path
        j = i - 6 if i % 30 == 24 else i  # planted near-dup partner
        w, h = 16 + j % 48, 16 + j % 32
        img = np.full((h, w), (j * 37) % 256, np.uint8)
        img[: 1 + (j % 7) * h // 8, :] = (j * 91 + 64) % 256
        return encode_jpeg(img)
    if i % 3 == 0:
        return encode_jpeg_shell(64 + (i * 97) % 8000, 32 + i % 2000,
                                 ncomp=3)
    if i % 7 == 6:
        return encode_png(np.full((2, 2), i % 256, np.uint8))
    j = i - 1 if i % 5 == 4 else i  # planted near-dup partner
    # two-tone blocks: base/top tones and split fraction vary per id,
    # spreading the feature cosines (gradients would all near-dup each
    # other)
    w, h = 5 + j % 60, 7 + j % 40
    img = np.full((h, w), (j * 37) % 256, np.uint8)
    img[: 1 + (j % 7) * h // 8, :] = (j * 91 + 64) % 256
    return encode_png(img)


def synth_media_payloads(ids) -> list:
    """Payloads for an id array (list[bytes], order-aligned with ids)."""
    return [synth_media_payload(int(i)) for i in ids]
