"""Apache ORC source/sink — the Hive-ecosystem columnar interchange format.

Why beside parquet: warehouse estates that predate the parquet consensus
(Hive/Trino/Presto deployments) publish ORC; an engine claiming to replace
their batch layer must read what they already have and write what their
downstream readers expect.  Layout mirrors the engine's other sinks: one
``.orc`` file per block (``pyarrow.orc``, ZLIB-compressed — the format's
portable default), resumable at the directory level; the reader is
distributed — Ray lists and ships the file BYTES (``read_binary_files``)
and each task materializes its table with ``pyarrow.orc.ORCFile`` over a
zero-copy buffer, so no driver-side parse ever happens.

Same retry caveat as ``ipcio``: part names are fresh uuids, so these sinks
are for terminal exports (roundtrip queries clear the directory first);
retry-safe resumable writes go through ``sources/checkpoint.py``.
"""

from __future__ import annotations

import io
import os
import uuid

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

__all__ = ["write_orc_dir", "read_orc_dir"]


def write_orc_dir(ds: Dataset, path: str) -> int:
    """One ORC file per block under ``path``; returns rows written."""
    from pyarrow import orc

    os.makedirs(path, exist_ok=True)

    def _write(b: pa.Table) -> pd.DataFrame:
        name = os.path.join(path, f"part-{uuid.uuid4().hex[:16]}.orc")
        orc.write_table(b, name, compression="zlib")
        return pd.DataFrame({"rows": [len(b)]})

    manifest = ds.map_batches(_write, batch_format="pyarrow")
    return int(sum(r["rows"] for r in manifest.take_all()))


def read_orc_dir(path: str, columns: "list[str] | None" = None,
                 **read_kwargs) -> Dataset:
    """Distributed ORC read: file bytes ship to tasks, tables materialize
    there (stripe decode inside the task); ``columns`` prunes at the
    reader, so only requested columns leave the decoder."""
    import ray.data as rd
    from pyarrow import orc

    files = rd.read_binary_files(path, file_extensions=["orc"],
                                 **read_kwargs)

    def _decode(b: pa.Table) -> pa.Table:
        tables = [orc.ORCFile(io.BytesIO(raw)).read(columns=columns)
                  for raw in b["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else pa.table({})

    return files.map_batches(_decode, batch_format="pyarrow")
