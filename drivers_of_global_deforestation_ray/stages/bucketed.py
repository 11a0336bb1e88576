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

The bucket function is Fibonacci hashing on int64 keys: multiply by the
32-bit golden-ratio constant in uint64 (wraparound is the intended modular
arithmetic) and keep the HIGH bits (``>> 33``), which are the well-mixed
ones — low product bits are weakly mixed for stride-structured keys.  The
hash is named in the manifest and must be identical at write and read time
(joins check it and raise on mismatch).

Storage contract — bucket paths must be visible to every worker.  In this
single-node sandbox that is any local path (the demo queries use ``/tmp``);
on a multi-node cluster the layout MUST live on shared storage (NFS, S3,
HDFS...) or workers will see missing/partial buckets.  The read functions
only do ``os`` metadata calls plus ``pyarrow.parquet`` reads, so any
fsspec-mountable path works unchanged.

Sizing contract — one bucket (its whole directory) is one task's working
set, so ``num_buckets`` must scale with data: pick
``num_buckets ≈ ceil(total_bytes / target_bucket_bytes)`` rounded up to a
power of two (at 100 TB with the 256 MiB default that is ~2^19 buckets; at
that count switch the work-item fan-out from one row per bucket to ranges).
The manifest records ``target_bucket_bytes``; at read time
:func:`bucketed_join` splits an oversize PROBE (left) bucket into part-file
groups — per-left-row independence makes that exact — while an oversize
BUILD (right) bucket and an oversize :func:`bucketed_agg` bucket raise
loudly (splitting those would break the single-pass finality), telling the
caller to rewrite with more buckets.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from ray.data import Dataset

__all__ = ["write_bucketed", "bucketed_join", "bucketed_agg",
           "bucketed_final_agg", "bucket_of"]

_MANIFEST = "_bucketing.json"
_HASH_NAME = "fib2654435761_hi31"
_DEFAULT_TARGET_BYTES = 256 * 1024 * 1024


def bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic int64 key -> bucket id: Fibonacci hash keeping the
    HIGH product bits (uint64 multiply wraps mod 2^64 by design), then mod.
    """
    k = np.ascontiguousarray(keys, dtype=np.int64).view(np.uint64)
    h = (k * np.uint64(2654435761)) >> np.uint64(33)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def write_bucketed(ds: Dataset, path: str, key_col: str,
                   num_buckets: int = 32,
                   target_bucket_bytes: int = _DEFAULT_TARGET_BYTES) -> None:
    """One shuffle-free pass: tag each row's bucket, hive-partition-write
    (``path/__bucket=K/part-*.parquet``), record the manifest.  Layout is
    resumable/appendable (many part files per bucket, never one giant
    file); the key column itself stays in the data files.
    ``target_bucket_bytes`` is recorded in the manifest and enforced at
    read time (see module docstring's sizing contract)."""

    def _tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy(deep=False)
        b["__bucket"] = bucket_of(b[key_col].to_numpy(), num_buckets)
        return b

    ds.map_batches(_tag, batch_format="pandas").write_parquet(
        path, partition_cols=["__bucket"])
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump({"key_col": key_col, "num_buckets": num_buckets,
                   "hash": _HASH_NAME,
                   "target_bucket_bytes": int(target_bucket_bytes)}, f)


def _read_manifest(path: str) -> dict:
    with open(os.path.join(path, _MANIFEST)) as f:
        return json.load(f)


def _bucket_files(path: str, b: int) -> "list[str]":
    """Parquet part files of one bucket dir ([] if the bucket is absent)."""
    d = os.path.join(path, f"__bucket={b}")
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.endswith(".parquet"))


def _read_files(files: "list[str]"):
    """Read a part-file list; the writer keeps the ``__bucket`` tag in the
    data files, so drop it (directory-level dataset reads drop it too)."""
    t = pq.read_table(files)
    if "__bucket" in t.column_names:
        t = t.drop_columns(["__bucket"])
    return t


def _file_groups(files: "list[str]", target_bytes: int):
    """Greedily pack part files into groups of <= target_bytes (a single
    file larger than the target gets its own group — parquet part files
    are bounded by the writer's block size, so this stays rare)."""
    groups, cur, cur_bytes = [], [], 0
    for f in files:
        sz = os.path.getsize(f)
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


def bucketed_join(left_path: str, right_path: str,
                  how: str = "inner", num_partitions: int | None = None) -> Dataset:
    """Join two co-bucketed layouts bucket-by-bucket, no shuffle.

    Keys come from each side's manifest (they were fixed at write time);
    manifests must agree on ``num_buckets`` and hash (raises otherwise —
    a mis-bucketed join would silently drop matches).  Non-key columns of
    the two sides must be disjoint (loud error, not silent suffixing).
    ``how``: inner | left.  Each task reads one bucket directory per side
    (pruned read — only that bucket's files) and joins in Arrow.

    Sizing: a LEFT bucket over the manifest's ``target_bucket_bytes`` is
    split into part-file groups, one task each (each group joins against
    the full right bucket — exact, since inner/left output rows depend on
    left rows independently).  A RIGHT bucket over the target raises: the
    right side is the per-task build side and must fit task memory —
    re-bucket with more buckets or swap sides."""
    import ray.data as rd

    lm, rm = _read_manifest(left_path), _read_manifest(right_path)
    if (lm["num_buckets"], lm["hash"]) != (rm["num_buckets"], rm["hash"]):
        raise ValueError(f"bucketing mismatch: {lm} vs {rm}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    nb = int(lm["num_buckets"])
    l_target = int(lm.get("target_bucket_bytes", _DEFAULT_TARGET_BYTES))
    r_target = int(rm.get("target_bucket_bytes", _DEFAULT_TARGET_BYTES))
    lkey, rkey = lm["key_col"], rm["key_col"]
    join_type = {"inner": "inner", "left": "left outer"}[how]
    # right-side schema so a left join against an ABSENT right bucket still
    # yields typed null columns, not a ragged concat.  NOTE pyarrow.dataset's
    # default ignore_prefixes=['.', '_'] would skip the '__bucket=' dirs
    # themselves — ignore only the manifest.
    import pyarrow as pa
    import pyarrow.dataset as pads

    def _side_empty(path: str) -> pa.Table:
        fields = [f for f in pads.dataset(path, format="parquet",
                                          partitioning="hive",
                                          ignore_prefixes=[".", _MANIFEST]).schema
                  if f.name != "__bucket"]
        return pa.table({f.name: pa.array([], type=f.type) for f in fields})

    l_empty, r_empty = _side_empty(left_path), _side_empty(right_path)
    # joined schema once, reused for empty work items (a schema-less
    # DataFrame would break Ray's block schema unification)
    empty_out = l_empty.join(r_empty, keys=[lkey], right_keys=[rkey],
                             join_type=join_type).to_pandas()

    # Work items: (bucket, left part-file group).  Oversize left buckets
    # fan out to several tasks; the right bucket size check is per-task
    # (workers see the shared layout, the driver need not stat every file).
    items = []
    for b in range(nb):
        lf = _bucket_files(left_path, b)
        if not lf:
            continue
        for grp in _file_groups(lf, l_target):
            items.append({"b": b, "files": json.dumps(grp)})
    if not items:
        return rd.from_pandas(empty_out)

    def _join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b, files in zip(df["b"].to_numpy(), df["files"].to_numpy()):
            lt = _read_files(json.loads(files))
            rfiles = _bucket_files(right_path, int(b))
            if rfiles:
                if sum(os.path.getsize(f) for f in rfiles) > r_target:
                    raise ValueError(
                        f"bucketed_join: right bucket {int(b)} exceeds "
                        f"target_bucket_bytes={r_target}; rewrite the right "
                        f"layout with more buckets or swap join sides")
                rt = _read_files(rfiles)
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
            return empty_out
        return pd.concat(frames, ignore_index=True)

    buckets = rd.from_items(items).repartition(num_partitions or len(items))
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
    removes the straddle, so this is ONE pass, zero exchange.

    A bucket over the manifest's ``target_bucket_bytes`` raises loudly
    (splitting it would need a partial+combine, defeating the layout) —
    rewrite with more buckets."""
    import ray.data as rd

    m = _read_manifest(path)
    if group_cols[0] != m["key_col"]:
        raise ValueError(
            f"bucketed_agg needs group_cols[0] == bucket key "
            f"{m['key_col']!r}, got {group_cols[0]!r}")
    nb = int(m["num_buckets"])
    target = int(m.get("target_bucket_bytes", _DEFAULT_TARGET_BYTES))

    # typed empty output (group key dtypes from the layout schema; agg
    # columns from the same groupby applied to zero rows) so empty work
    # items unify with real blocks
    import pyarrow.dataset as pads

    schema = pads.dataset(path, format="parquet", partitioning="hive",
                          ignore_prefixes=[".", _MANIFEST]).schema
    src_empty = schema.empty_table().to_pandas().drop(columns=["__bucket"])
    ge = src_empty.groupby(group_cols, sort=False)
    empty_out = pd.DataFrame(
        {o: ge[c].agg(f) for o, (c, f) in specs.items()}).reset_index()

    def _agg_bucket(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for b in df["b"].to_numpy():
            files = _bucket_files(path, int(b))
            if not files:
                continue
            if sum(os.path.getsize(f) for f in files) > target:
                raise ValueError(
                    f"bucketed_agg: bucket {int(b)} exceeds "
                    f"target_bucket_bytes={target}; rewrite the layout with "
                    f"more buckets")
            t = _read_files(files).to_pandas()
            g = t.groupby(group_cols, sort=False)
            out = pd.DataFrame({o: g[c].agg(f) for o, (c, f) in specs.items()})
            frames.append(out.reset_index())
        if not frames:
            return empty_out
        return pd.concat(frames, ignore_index=True)

    buckets = rd.from_items([{"b": i} for i in range(nb)]).repartition(
        num_partitions or nb)
    return buckets.map_batches(_agg_bucket, batch_size=1,
                               batch_format="pandas")


def bucketed_final_agg(files_by_bucket: "dict[str, list[str]]",
                       keys: "list[str]", specs: "dict",
                       num_partitions: "int | None" = None):
    """Zero-shuffle FINAL combine over bucketed partial-aggregate files
    (the :func:`~.relational.grouped_agg_partial` format): each work item
    is one bucket's files across every producing shard — the key-hash
    bucketing guarantees a group's partials all live in that one bucket,
    so one local pandas groupby finalizes it (the
    :func:`~.relational._final_partition` combine), replacing the
    ``grouped_agg_final`` all-to-all exchange.

    Pairs with ``StageCheckpoint(partition_cols=["__bucket"])``: shards
    write ``part=<i>/__bucket=<b>/...`` and
    ``files_by_partition_value("__bucket")`` yields this function's input.
    Same storage contract as the rest of this module (paths visible to
    every worker)."""
    import ray.data as rd

    from .relational import _final_partition

    items = [{"files": json.dumps(v)} for _, v in
             sorted(files_by_bucket.items())]
    if not items:
        raise ValueError("bucketed_final_agg: no bucket files")

    def _finalize(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for files in df["files"].to_numpy():
            t = _read_files(json.loads(files)).to_pandas()
            frames.append(_final_partition(t, keys, specs))
        return pd.concat(frames, ignore_index=True)

    work = rd.from_items(items).repartition(num_partitions or len(items))
    return work.map_batches(_finalize, batch_size=1, batch_format="pandas")
