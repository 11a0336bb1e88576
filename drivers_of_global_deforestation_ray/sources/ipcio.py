"""Arrow IPC (Feather v2 stream) source/sink — the zero-parse interchange
format between engine stages and external Arrow-native tools.

Why beside parquet: IPC streams ARE the in-memory Arrow layout (no decode,
no statistics pass), which makes them the cheapest spill/handoff format for
intermediate tables whose lifetime is one pipeline.  The sink writes one
``.arrows`` stream per block (the engine's resumable one-part-per-block
layout); the reader is distributed — Ray lists and ships the file BYTES
(``read_binary_files``) and each task materializes its table with
``pa.ipc.open_stream`` over a zero-copy buffer.

NOTE on retries: part names are fresh uuids, so a RETRIED write task would
emit a second part (duplicate rows).  Use these sinks for terminal exports
(the roundtrip queries clear the directory first); retry-safe resumable
writes go through ``sources/checkpoint.py``'s manifest (fingerprint-keyed,
skip-complete) or ``Dataset.write_parquet`` (Ray-managed filenames).
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

__all__ = ["write_ipc_dir", "read_ipc_dir"]


def write_ipc_dir(ds: Dataset, path: str) -> int:
    """One IPC stream file per block under ``path``; returns rows written."""
    os.makedirs(path, exist_ok=True)

    def _write(b: pa.Table) -> pd.DataFrame:
        name = os.path.join(path, f"part-{uuid.uuid4().hex[:16]}.arrows")
        with pa.OSFile(name, "wb") as f:
            with pa.ipc.new_stream(f, b.schema) as w:
                w.write_table(b)
        return pd.DataFrame({"rows": [len(b)]})

    manifest = ds.map_batches(_write, batch_format="pyarrow")
    return int(sum(r["rows"] for r in manifest.take_all()))


def read_ipc_dir(path: str, **read_kwargs) -> Dataset:
    """Distributed IPC read: file bytes ship to tasks, tables materialize
    there (``pa.ipc.open_stream`` over a zero-copy buffer) — the schema is
    carried by the stream itself, no inference."""
    import ray.data as rd

    files = rd.read_binary_files(path, file_extensions=["arrows"],
                                 **read_kwargs)

    def _decode(b: pa.Table) -> pa.Table:
        tables = [pa.ipc.open_stream(pa.py_buffer(raw)).read_all()
                  for raw in b["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else pa.table({})

    return files.map_batches(_decode, batch_format="pyarrow")
