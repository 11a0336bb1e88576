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

__all__ = ["MediaFeaturizer", "media_features", "media_resize", "frame_sample",
           "FEATURE_DIM"]

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


class _MediaResizer:
    """Actor: payload -> fixed-target thumbnail payload + output dims.

    ``backend="fake"``: deterministic bytes of exactly ``width*height`` derived
    from the source payload (blake2b XOF-style chaining) — real plumbing shape
    (bounded output size per row, stable schema), stubbed pixels."""

    def __init__(self, media_col: str, width: int, height: int, backend: str = "fake"):
        if backend != "fake":
            raise NotImplementedError(
                "real resize needs an image library absent here; plug it in and "
                "keep the (thumb:binary, thumb_width, thumb_height) schema"
            )
        self.media_col, self.width, self.height = media_col, width, height

    def _fake_resize(self, payload: bytes) -> bytes:
        n = self.width * self.height
        out = bytearray()
        block = hashlib.blake2b(payload or b"", digest_size=64).digest()
        while len(out) < n:
            out.extend(block)
            block = hashlib.blake2b(block, digest_size=64).digest()
        return bytes(out[:n])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["thumb"] = [self._fake_resize(p) for p in batch[self.media_col]]
        batch["thumb_width"] = np.int32(self.width)
        batch["thumb_height"] = np.int32(self.height)
        return batch.drop(columns=[self.media_col])


def media_resize(
    ds: Dataset,
    media_col: str = "html",
    width: int = 32,
    height: int = 32,
    backend: str = "fake",
    batch_size: int = 256,
    concurrency=(1, 8),
) -> Dataset:
    """Resize/thumbnail stage: drops the (large) source payload from the
    output — downstream ships only the bounded thumbnail."""
    return ds.map_batches(
        _MediaResizer,
        fn_constructor_kwargs={"media_col": media_col, "width": width,
                               "height": height, "backend": backend},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class _FrameSampler:
    """Actor: one input row (a "video" payload) -> ``num_frames`` output rows
    (frame_idx, ts_ms, frame:binary).  Fake backend derives each frame's bytes
    from (payload, idx); a real decoder replaces ``_fake_frame`` only."""

    def __init__(self, media_col: str, key_col: str, num_frames: int,
                 frame_ms: int, backend: str = "fake"):
        if backend != "fake":
            raise NotImplementedError(
                "real frame sampling needs a video library absent here; plug it "
                "in and keep the (key, frame_idx, ts_ms, frame) schema"
            )
        self.media_col, self.key_col = media_col, key_col
        self.num_frames, self.frame_ms = num_frames, frame_ms

    @staticmethod
    def _fake_frame(payload: bytes, idx: int) -> bytes:
        return hashlib.blake2b((payload or b"") + idx.to_bytes(4, "little"),
                               digest_size=32).digest()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keys, idxs, tss, frames = [], [], [], []
        for key, payload in zip(batch[self.key_col], batch[self.media_col]):
            for i in range(self.num_frames):
                keys.append(key)
                idxs.append(i)
                tss.append(i * self.frame_ms)
                frames.append(self._fake_frame(payload, i))
        return pd.DataFrame({
            self.key_col: keys,
            "frame_idx": np.asarray(idxs, dtype=np.int32),
            "ts_ms": np.asarray(tss, dtype=np.int64),
            "frame": frames,
        })


def frame_sample(
    ds: Dataset,
    media_col: str = "html",
    key_col: str = "url",
    num_frames: int = 4,
    frame_ms: int = 1000,
    backend: str = "fake",
    batch_size: int = 64,   # row explosion: keep batches small
    concurrency=(1, 8),
) -> Dataset:
    """Frame-sampling explode (1 row -> num_frames rows), the video analogue
    of flat_map — done inside map_batches so the explosion stays batched."""
    return ds.map_batches(
        _FrameSampler,
        fn_constructor_kwargs={"media_col": media_col, "key_col": key_col,
                               "num_frames": num_frames, "frame_ms": frame_ms,
                               "backend": backend},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
