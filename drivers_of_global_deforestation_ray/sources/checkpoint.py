"""Per-partition checkpointing with lineage + throughput manifests.

The reference's "checkpoints" are manual cached CSVs and an interactive pause
(``Supplemental_Data_1.R:124-139,445-454``).  The engine formalizes them
(north rule: resumable runs, per-partition lineage + metrics):

- A *stage* writes its output under ``<root>/<stage>/part=<i>/`` (parquet),
  one partition per input shard, tmp-dir + atomic rename (idempotent under
  task retries).
- ``<root>/<stage>/_manifest.jsonl`` records one line per completed
  partition: partition id, input fingerprint (paths + sizes + mtimes hashed),
  rows, bytes, wall seconds, rows/s.
- Resume: a partition whose fingerprint matches is SKIPPED; changing an input
  shard invalidates exactly that partition.

Partitions are dispatched as independent Ray Data jobs over their shard's
files, several in flight at once; each is internally parallel.  On a cluster
the same layout lets a re-submitted driver continue where the last one died.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Callable

from ray.data import Dataset

__all__ = ["StageCheckpoint", "shard_files"]


def _fingerprint(paths: list[str]) -> str:
    h = hashlib.blake2b(digest_size=12)
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()


def shard_files(files: list[str], num_shards: int) -> list[list[str]]:
    """Round-robin file shards (deterministic order)."""
    files = sorted(files)
    num_shards = min(num_shards, len(files)) or 1
    return [files[i::num_shards] for i in range(num_shards)]


@dataclass
class PartitionRecord:
    partition: int
    fingerprint: str
    rows: int
    bytes: int
    wall_s: float
    rows_per_s: float
    inputs: list[str]


class StageCheckpoint:
    """Checkpointed execution of ``stage_fn: list[files] -> Dataset`` per shard."""

    def __init__(self, root: str, stage: str,
                 partition_cols: "list[str] | None" = None):
        """``partition_cols``: hive-partition each shard's output by these
        columns (``part=<i>/<col>=<v>/...``) — the bucketed-checkpoint
        layout: when a stage tags rows with a key-hash bucket, the final
        combine can read one bucket across ALL shards and aggregate it
        locally, with no shuffle (see ``stages/bucketed.py``)."""
        import threading

        self.dir = os.path.join(root, stage)
        os.makedirs(self.dir, exist_ok=True)
        self.manifest_path = os.path.join(self.dir, "_manifest.jsonl")
        self.partition_cols = list(partition_cols) if partition_cols else None
        self._lock = threading.Lock()  # concurrent run_partition threads
        self._done: dict[int, dict] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    rec = json.loads(line)
                    self._done[rec["partition"]] = rec

    def partition_dir(self, i: int) -> str:
        return os.path.join(self.dir, f"part={i}")

    def is_complete(self, i: int, input_files: list[str]) -> bool:
        rec = self._done.get(i)
        return bool(
            rec
            and rec["fingerprint"] == _fingerprint(input_files)
            and os.path.isdir(self.partition_dir(i))
        )

    def run_partition(self, i: int, input_files: list[str], stage_fn: Callable[[list[str]], Dataset]) -> dict:
        """Execute one partition unless already complete; returns its record."""
        if self.is_complete(i, input_files):
            return self._done[i]
        out_dir = self.partition_dir(i)
        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = stage_fn(input_files)
        if self.partition_cols:
            ds.write_parquet(tmp_dir, partition_cols=self.partition_cols)
        else:
            ds.write_parquet(tmp_dir)
        wall = time.perf_counter() - t0
        # an all-filtered partition writes NO directory at all — still a
        # completed partition (0 rows), so record it rather than crash
        os.makedirs(tmp_dir, exist_ok=True)
        os.replace(tmp_dir, out_dir)
        out_parquet = _walk_parquet(out_dir)
        rows = sum(_parquet_rows(f) for f in out_parquet)
        nbytes = sum(os.path.getsize(f) for f in out_parquet)
        rec = PartitionRecord(
            partition=i,
            fingerprint=_fingerprint(input_files),
            rows=rows,
            bytes=nbytes,
            wall_s=round(wall, 4),
            rows_per_s=round(rows / wall, 2) if wall > 0 else 0.0,
            inputs=sorted(input_files),
        ).__dict__
        with self._lock:
            self._done[i] = rec
            self._rewrite_manifest()
        return rec

    def _rewrite_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            for i in sorted(self._done):
                f.write(json.dumps(self._done[i]) + "\n")
        os.replace(tmp, self.manifest_path)

    def _prune_stale(self, num_shards: int) -> None:
        """Drop manifest rows AND part dirs whose index is outside the
        current sharding — re-running with fewer shards must not leave stale
        ``part=N..`` outputs that ``output_files`` would double-count (each
        old high-index partition covered a subset of inputs now re-covered
        by partitions 0..N-1)."""
        stale = [i for i in list(self._done) if i >= num_shards]
        for i in stale:
            shutil.rmtree(self.partition_dir(i), ignore_errors=True)
            del self._done[i]
        # orphan part dirs on disk (crash between write and manifest)
        for name in os.listdir(self.dir):
            if name.startswith("part="):
                try:
                    idx = int(name.split("=", 1)[1].split(".")[0])
                except ValueError:
                    continue
                if idx >= num_shards:
                    shutil.rmtree(os.path.join(self.dir, name), ignore_errors=True)
        if stale:
            with self._lock:
                self._rewrite_manifest()

    def run(self, shards: list[list[str]], stage_fn: Callable[[list[str]], Dataset],
            max_inflight: int = 4) -> list[dict]:
        """Run all partitions (skipping complete ones) and return records.

        Stale partitions from a previous run with MORE shards are pruned
        first (manifest + dirs), so ``output_files`` after ``run`` always
        covers each input exactly once.  Partitions whose recorded input
        fingerprint no longer matches re-run in place.

        Partitions run ``max_inflight`` at a time (thread-dispatched — each is
        its own internally-parallel Ray Data execution, so a few in flight
        keep the cluster full while bounding peak memory)."""
        from concurrent.futures import ThreadPoolExecutor

        self._prune_stale(len(shards))
        with ThreadPoolExecutor(max_workers=max(1, max_inflight)) as ex:
            futs = [ex.submit(self.run_partition, i, shard, stage_fn)
                    for i, shard in enumerate(shards)]
            return [f.result() for f in futs]

    def output_files(self) -> list[str]:
        out = []
        for i in sorted(self._done):
            out.extend(_walk_parquet(self.partition_dir(i)))
        return out

    def files_by_partition_value(self, col: str) -> "dict[str, list[str]]":
        """Hive sub-partition value -> its parquet files ACROSS all shard
        dirs (``part=*/<col>=<v>/*.parquet``) — the bucketed-final read
        pattern: one entry is one task's whole (shuffle-free) input."""
        out: dict[str, list[str]] = {}
        prefix = f"{col}="
        for i in sorted(self._done):
            d = self.partition_dir(i)
            if not os.path.isdir(d):
                continue
            for name in sorted(os.listdir(d)):
                if name.startswith(prefix):
                    v = name[len(prefix):]
                    out.setdefault(v, []).extend(
                        _walk_parquet(os.path.join(d, name)))
        return out


def _walk_parquet(root: str) -> list[str]:
    out = []
    for dirpath, _, names in os.walk(root):
        out.extend(os.path.join(dirpath, n) for n in sorted(names)
                   if n.endswith(".parquet"))
    return sorted(out)


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(path).num_rows
