"""Typed JSONL source/sink (web-corpus interchange format).

CSV (``csvio.py``) covers the reference's typed tabular io; JSONL is the
crawl-pipeline staple this engine adds (page records, metadata sidecars).
Two properties Ray's built-in ``write_json`` does not give:

- **Lossless floats.** pandas ``to_json`` truncates doubles to 10 digits
  (measured: ``1/3 -> 0.3333333333``).  This sink formats float64 with
  numpy's shortest-roundtrip repr, so every finite double survives
  write -> parse bit-for-bit.
- **Schema-declared reads.** ``read_jsonl_typed`` hands pyarrow's JSON
  reader an ``explicit_schema`` — no sampling-based inference drift
  between shards (an all-integer shard of a float column stays float).

The writer is vectorized: per-column fragments via pandas str kernels
(escape pass touches only strings containing ``\\``, ``"`` or control
chars), one C-level join per block, one part file per block under the
directory — the resumable layout every sink in this engine uses.
Non-finite floats (nan/inf) serialize as JSON ``null``.

NOTE on retries: part names are fresh uuids, so a RETRIED write task would
emit a second part (duplicate rows).  Use these sinks for terminal exports
(the roundtrip queries clear the directory first); retry-safe resumable
writes go through ``sources/checkpoint.py``'s manifest (fingerprint-keyed,
skip-complete) or ``Dataset.write_parquet`` (Ray-managed filenames).
"""

from __future__ import annotations

import json
import os
import re
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

__all__ = ["read_jsonl_typed", "write_jsonl_dir", "jsonl_bytes"]

_ESCAPE = re.compile(r'[\\"\x00-\x1f]')


def _esc(m: "re.Match[str]") -> str:
    return json.dumps(m.group())[1:-1]


def _fragment(s: pd.Series) -> pd.Series:
    """One column -> its JSON value fragment per row (vectorized)."""
    kind = s.dtype.kind
    if kind in "iu":
        return pd.Series(s.to_numpy().astype(str), index=s.index)
    if kind == "f":
        arr = s.to_numpy()
        frag = pd.Series(arr.astype(str), index=s.index)
        return frag.mask(~np.isfinite(arr), "null")
    if kind == "b":
        return pd.Series(np.where(s.to_numpy(), "true", "false"), index=s.index)
    if kind == "M":
        return '"' + s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f") + '"'
    esc = s.astype("string").str.replace(_ESCAPE, _esc, regex=True)
    return ('"' + esc + '"').fillna("null")


def jsonl_bytes(df: pd.DataFrame) -> bytes:
    """Encode a DataFrame as JSON-lines bytes (column order preserved)."""
    if not len(df):
        return b""
    line = None
    for i, c in enumerate(df.columns):
        piece = (("{" if i == 0 else ",") + json.dumps(str(c)) + ":") + _fragment(df[c])
        line = piece if line is None else line + piece
    return ("\n".join(line + "}") + "\n").encode("utf-8")


def write_jsonl_dir(ds: Dataset, path: str, batch_size: int = 65536,
                    compression: "str | None" = None) -> int:
    """JSONL sink: one part file per block under ``path``; returns rows
    written.  Part names are fresh uuids — clear the directory before a
    re-run (the roundtrip query does).  ``compression="gzip"`` writes
    ``.jsonl.gz`` parts (stdlib zlib, mtime pinned to 0 so re-runs are
    byte-deterministic) — the wire format crawl dumps actually arrive in."""
    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported compression: {compression!r}")
    os.makedirs(path, exist_ok=True)
    suffix = ".jsonl.gz" if compression == "gzip" else ".jsonl"

    def _write(b: pd.DataFrame) -> pd.DataFrame:
        blob = jsonl_bytes(b)
        if compression == "gzip":
            import gzip
            import io

            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(blob)
            blob = buf.getvalue()
        name = os.path.join(path, f"part-{uuid.uuid4().hex[:16]}{suffix}")
        with open(name, "wb") as f:
            f.write(blob)
        return pd.DataFrame({"rows": [len(b)]})

    manifest = ds.map_batches(_write, batch_format="pandas", batch_size=batch_size)
    return int(sum(r["rows"] for r in manifest.take_all()))


def read_jsonl_typed(
    paths: "str | list[str]",
    schema: "dict[str, pa.DataType] | pa.Schema",
    **read_json_kwargs,
) -> Dataset:
    """Read JSONL with a DECLARED arrow schema (pyarrow ``explicit_schema``)."""
    import ray.data as rd
    from pyarrow import json as pajson

    if isinstance(schema, dict):
        schema = pa.schema(list(schema.items()))
    # pyarrow's JSON reader is newline-delimited by construction; Ray's
    # `lines=True` switches to a different (pandas) impl that rejects
    # arrow args, so the arrow path + explicit_schema is the typed one.
    # gzip parts (.jsonl.gz) decompress in the arrow open-stream layer.
    # Compression is ALL-OR-NOTHING per call (arrow_open_stream_args apply
    # to every file): a source mixing .gz and plain parts must be read as
    # two calls + union.  When gzip is inferred, file_extensions is
    # restricted to ["gz"] so a stray plain part fails loudly at listing
    # time instead of being mis-decompressed.
    plist = [paths] if isinstance(paths, str) else list(paths)
    leaves: "list[str]" = []
    for p in plist:
        if os.path.isdir(p):
            leaves.extend(os.path.join(p, f) for f in os.listdir(p))
        else:
            leaves.append(p)
    gz = [f for f in leaves if f.endswith(".gz")]
    if gz and len(gz) != len(leaves):
        plain = sorted(os.path.basename(f) for f in leaves if not f.endswith(".gz"))
        raise ValueError(
            "read_jsonl_typed: mixed compressed (.gz) and plain JSONL parts "
            f"in one call are unsupported (plain: {plain[:5]}...); read the "
            "two sets separately and union the Datasets")
    if gz:
        read_json_kwargs.setdefault("arrow_open_stream_args",
                                    {"compression": "gzip"})
        read_json_kwargs.setdefault("file_extensions", ["gz"])
    return rd.read_json(
        paths,
        parse_options=pajson.ParseOptions(explicit_schema=schema),
        **read_json_kwargs)
