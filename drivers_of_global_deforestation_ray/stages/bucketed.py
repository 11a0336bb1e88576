"""Bucketed tables — persist ONE hash-partitioned layout, reuse it across
stages with NO shuffle (the 100-TB discipline the brief names: "pick ONE
partitioning key and reuse it"; the Hive/Iceberg bucketed-table pattern).

:func:`write_bucketed` fans a Dataset into ``num_buckets`` hive-style
directories by a deterministic integer key hash and records a manifest.
:func:`bucketed_join` then joins two co-bucketed tables bucket-by-bucket:
every task reads ONE bucket directory from each side and joins locally
(``pyarrow.Table.join``) — matching keys are in matching buckets by
construction, so NOTHING moves between tasks; the cluster-wide cost is a
metadata-only task fan-out instead of an all-to-all exchange.  Repeated
joins against the same layout amortize the single bucketing write — the
shape ``Dataset.join`` cannot express (it re-shuffles both sides every
time).

The bucket function is Fibonacci hashing on int64 keys (golden-ratio
multiplier, top bits well-mixed for sequential keys) — cheap, vectorized,
and identical at write and read time by manifest contract.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from ray.data import Dataset

__all__ = ["write_bucketed", "bucketed_join", "bucketed_agg", "bucket_of"]

_MANIFEST = "_bucketing.json"
_HASH_NAME = "fib2654435761_mod31"


def bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic int64 key -> bucket id (Fibonacci hash then mod)."""
    h = (keys.astype(np.int64) * np.int64(2654435761)) & np.int64((1 << 31) - 1)
    return h % np.int64(num_buckets)


def write_bucketed(ds: Dataset, path: str, key_col: str,
                   num_buckets: int = 32) -> None:
    """One shuffle-free pass: tag each row's bucket, hive-partition-write
    (``path/__bucket=K/part-*.parquet``), record the manifest.  Layout is
    resumable/appendable (many part files per bucket, never one giant
    file); the key column itself stays in the data files."""

    def _tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["__bucket"] = bucket_of(b[key_col].to_numpy(), num_buckets)
        return b

    ds.map_batches(_tag, batch_format="pandas").write_parquet(
        path, partition_cols=["__bucket"])
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump({"key_col": key_col, "num_buckets": num_buckets,
                   "hash": _HASH_NAME}, f)


def _read_manifest(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f)


def bucketed_join(left_path: str, right_path: str,
                  how: str = "inner", num_partitions: int | None = None) -> Dataset:
    """Join two co-bucketed layouts bucket-by-bucket, no shuffle.

    Keys come from each side's manifest (they were fixed at write time);
    manifests must agree on ``num_buckets`` and hash (raises otherwise —
    a mis-bucketed join would silently drop matches).  Non-key columns of
    the two sides must be disjoint (loud error, not silent suffixing).
    ``how``: inner | left.  Each task reads one bucket directory per side
    (pruned read — only that bucket's files) and joins in Arrow."""
    import ray.data as rd

    lm, rm = _read_manifest(left_path), _read_manifest(right_path)
    if (lm["num_buckets"], lm["hash"]) != (rm["num_buckets"], rm["hash"]):
        raise ValueError(f"bucketing mismatch: {lm} vs {rm}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    nb = int(lm["num_buckets"])
    lkey, rkey = lm["key_col"], rm["key_col"]
    join_type = {"inner": "inner", "left": "left outer"}[how]
    # right-side schema so a left join against an ABSENT right bucket still
    # yields typed null columns, not a ragged concat.  NOTE pyarrow.dataset's
    # default ignore_prefixes=['.', '_'] would skip the '__bucket=' dirs
    # themselves — ignore only the manifest.
    import pyarrow as pa
    import pyarrow.dataset as pads

    r_fields = [f for f in pads.dataset(right_path, format="parquet",
                                        partitioning="hive",
                                        ignore_prefixes=[".", _MANIFEST]).schema
                if f.name != "__bucket"]
    r_empty = pa.table({f.name: pa.array([], type=f.type) for f in r_fields})

    def _join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b in df["b"].to_numpy():
            ldir = os.path.join(left_path, f"__bucket={int(b)}")
            if not os.path.isdir(ldir):
                continue
            lt = pq.read_table(ldir)
            rdir = os.path.join(right_path, f"__bucket={int(b)}")
            if os.path.isdir(rdir):
                rt = pq.read_table(rdir)
            elif how == "inner":
                continue
            else:  # left join, right bucket absent: typed all-null columns
                rt = r_empty
            overlap = (set(lt.column_names) & set(rt.column_names)) - (
                {lkey} if lkey == rkey else set())
            if overlap:
                raise ValueError(
                    f"bucketed_join non-key column collision: {sorted(overlap)}")
            j = lt.join(rt, keys=[lkey], right_keys=[rkey],
                        join_type=join_type)
            frames.append(j.to_pandas())
        if not frames:
            return pd.DataFrame()
        return pd.concat(frames, ignore_index=True)

    buckets = rd.from_items([{"b": i} for i in range(nb)]).repartition(
        num_partitions or nb)
    return buckets.map_batches(_join_bucket, batch_size=1,
                               batch_format="pandas")


def bucketed_agg(path: str, group_cols: "list[str]", specs: "dict",
                 num_partitions: "int | None" = None) -> Dataset:
    """Grouped aggregation over a bucketed layout with NO shuffle: the
    bucket key co-locates every group whose key it covers, so each task
    aggregates its bucket dirs to FINAL results locally (pandas groupby) —
    valid whenever ``group_cols[0]`` is the layout's bucket key (asserted
    from the manifest).  ``specs``: ``{out: (col, fn)}``, the
    :func:`~.relational.grouped_agg` shape.  The two-phase partial+combine
    of ``grouped_agg`` exists because groups straddle blocks; bucketing
    removes the straddle, so this is ONE pass, zero exchange."""
    import ray.data as rd

    m = _read_manifest(path)
    if group_cols[0] != m["key_col"]:
        raise ValueError(
            f"bucketed_agg needs group_cols[0] == bucket key "
            f"{m['key_col']!r}, got {group_cols[0]!r}")
    nb = int(m["num_buckets"])

    def _agg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b in df["b"].to_numpy():
            d = os.path.join(path, f"__bucket={int(b)}")
            if not os.path.isdir(d):
                continue
            t = pq.read_table(d).to_pandas()
            g = t.groupby(group_cols, sort=False)
            out = pd.DataFrame({o: g[c].agg(f) for o, (c, f) in specs.items()})
            frames.append(out.reset_index())
        if not frames:
            return pd.DataFrame()
        return pd.concat(frames, ignore_index=True)

    buckets = rd.from_items([{"b": i} for i in range(nb)]).repartition(
        num_partitions or nb)
    return buckets.map_batches(_agg_bucket, batch_size=1,
                               batch_format="pandas")
