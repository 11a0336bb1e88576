"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride through the engine as ``binary`` columns with typed
metadata columns alongside (the pages corpus already carries ``html:binary``).
The decode kernels themselves need codec libraries that do NOT exist in this
sandbox, so the Ray-side contract is real and tested while the pixel/sample
decode is stubbed:

- :class:`MediaFeaturizer` is a genuine actor-pool stage: per-actor setup in
  ``__init__``, small ``batch_size`` (binary payloads are big), stable output
  schema.  With ``backend="fake"`` (default) it derives a deterministic
  feature vector + (width, height) from the payload *bytes* (blake2b-seeded),
  so tests pin schema/shape/determinism.  With ``backend="real"`` it raises
  ``NotImplementedError`` at construction — the marked integration point for
  a PIL/ffmpeg-style decoder.
- :func:`media_features` wires it with the batch/concurrency shape a real
  decoder needs (actor pool, num_cpus=1, small batches).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from ray.data import Dataset

__all__ = ["MediaFeaturizer", "media_features", "FEATURE_DIM"]

FEATURE_DIM = 16


class MediaFeaturizer:
    """Actor: decode a binary media column into features + dimensions."""

    def __init__(self, media_col: str = "html", backend: str = "fake"):
        if backend != "fake":
            raise NotImplementedError(
                "real media decode requires codec libraries not present in this "
                "environment; plug a decoder in here (load models/codecs ONCE per "
                "actor in __init__) and keep __call__'s output schema unchanged"
            )
        self.media_col = media_col

    @staticmethod
    def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
        """Deterministic stand-in: dims + FEATURE_DIM floats from the bytes."""
        d = hashlib.blake2b(payload or b"", digest_size=8 + 2 * FEATURE_DIM).digest()
        w = 64 + d[0] % 192
        h = 64 + d[1] % 192
        feats = np.frombuffer(d[8:], dtype=np.uint16).astype(np.float64) / 65535.0
        return w, h, feats

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ws, hs, fs = [], [], []
        for payload in batch[self.media_col]:
            w, h, f = self._fake_decode(payload)
            ws.append(w)
            hs.append(h)
            fs.append(f)
        batch["media_width"] = np.asarray(ws, dtype=np.int32)
        batch["media_height"] = np.asarray(hs, dtype=np.int32)
        batch["media_features"] = fs
        return batch


def media_features(
    ds: Dataset,
    media_col: str = "html",
    backend: str = "fake",
    batch_size: int = 256,   # binary payloads: keep batch x concurrency in heap
    concurrency=(1, 8),
) -> Dataset:
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"media_col": media_col, "backend": backend},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
