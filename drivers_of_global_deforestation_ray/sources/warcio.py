"""WARC (ISO 28500) container source/sink — the wire format web crawls
actually arrive in (Common Crawl stores one gzip MEMBER per record,
concatenated into ``.warc.gz`` files, so readers can seek to a record
without decompressing the file).

From scratch on stdlib zlib: the writer emits one gzip member per record
(mtime pinned to 0 — byte-deterministic re-runs) and one ``.warc.gz`` part
per block (the engine's resumable sink layout); the reader ships file BYTES
to tasks (``read_binary_files``) and walks the concatenated members with a
multi-member decompress loop, then parses ``WARC/1.0`` headers
(Target-URI, Date, Record-ID, Content-Length) and slices the payload by
Content-Length — never splitting on payload bytes.

Only ``response``-type records are emitted by the reader (metadata /
request records skip), matching how CC-style pipelines consume WARCs.

NOTE on retries: part names are fresh uuids, so a RETRIED write task would
emit a second part (duplicate rows).  Use these sinks for terminal exports
(the roundtrip queries clear the directory first); retry-safe resumable
writes go through ``sources/checkpoint.py``'s manifest (fingerprint-keyed,
skip-complete) or ``Dataset.write_parquet`` (Ray-managed filenames).
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
import zlib

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

__all__ = ["write_warc_dir", "read_warc_dir", "warc_record_bytes",
           "parse_warc_stream"]

_CRLF = b"\r\n"


def warc_record_bytes(url: str, date: str, payload: bytes,
                      rec_type: str = "response",
                      record_id: "str | None" = None) -> bytes:
    """One uncompressed WARC/1.0 record (headers + payload + separator)."""
    rid = record_id or f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, url)}>"
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: " + rec_type.encode() + _CRLF
        + b"WARC-Record-ID: " + rid.encode() + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        + _CRLF)
    return head + payload + _CRLF + _CRLF


def _gzip_member(raw: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def parse_warc_stream(data: bytes) -> "list[tuple[str, str, bytes]]":
    """Concatenated gzip members (or one plain WARC stream) ->
    [(url, date, payload)] for every response record."""
    if data[:2] == b"\x1f\x8b":  # multi-member gzip walk
        chunks = []
        pos = 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=31)
            chunks.append(d.decompress(data[pos:]))
            if not d.eof:
                raise ValueError("truncated gzip member in WARC")
            consumed = len(data) - pos - len(d.unused_data)
            pos += consumed
        raw = b"".join(chunks)
    else:
        raw = data
    out = []
    i = 0
    n = len(raw)
    while i < n:
        if raw.startswith(_CRLF, i):  # inter-record separators
            i += 2
            continue
        if not raw.startswith(b"WARC/", i):
            raise ValueError(f"WARC version line expected at byte {i}")
        hdr_end = raw.index(_CRLF + _CRLF, i)
        headers = {}
        for line in raw[i:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b": ")
            headers[k.decode().lower()] = v.decode()
        length = int(headers["content-length"])
        payload = raw[hdr_end + 4:hdr_end + 4 + length]
        if headers.get("warc-type") == "response":
            out.append((headers.get("warc-target-uri", ""),
                        headers.get("warc-date", ""), payload))
        i = hdr_end + 4 + length
    return out


def write_warc_dir(ds: Dataset, path: str, url_col: str = "url",
                   date_col: str = "date", payload_col: str = "payload") -> int:
    """One ``.warc.gz`` part per block, one gzip member per record."""
    os.makedirs(path, exist_ok=True)

    def _write(b: pd.DataFrame) -> pd.DataFrame:
        members = [
            _gzip_member(warc_record_bytes(u, d, p))
            for u, d, p in zip(b[url_col], b[date_col], b[payload_col])]
        name = os.path.join(path, f"part-{uuid.uuid4().hex[:16]}.warc.gz")
        with open(name, "wb") as f:
            f.write(b"".join(members))
        return pd.DataFrame({"rows": [len(b)]})

    manifest = ds.map_batches(_write, batch_format="pandas")
    return int(sum(r["rows"] for r in manifest.take_all()))


def read_warc_dir(path: str, **read_kwargs) -> Dataset:
    """Distributed WARC read: file bytes -> per-task member walk ->
    (url, date, payload) rows for response records."""
    import numpy as np
    import ray.data as rd

    files = rd.read_binary_files(path, file_extensions=["gz", "warc"],
                                 **read_kwargs)

    def _decode(b: pa.Table) -> pd.DataFrame:
        urls, dates, payloads = [], [], []
        for blob in b["bytes"].to_pylist():
            for u, d, p in parse_warc_stream(blob):
                urls.append(u)
                dates.append(d)
                payloads.append(p)
        return pd.DataFrame({"url": np.asarray(urls, dtype=object),
                             "date": np.asarray(dates, dtype=object),
                             "payload": payloads})

    return files.map_batches(_decode, batch_format="pyarrow")
