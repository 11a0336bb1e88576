"""Checkpoint manifests: resume skips completed partitions, invalidation works."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from drivers_of_global_deforestation_ray.sources.checkpoint import StageCheckpoint, shard_files


@pytest.fixture()
def input_files(tmp_path):
    import pyarrow as pa

    files = []
    for i in range(6):
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}), p)
        files.append(p)
    return files


CALLS = {"n": 0}


def _stage(files):
    import ray.data as rd

    CALLS["n"] += 1
    return rd.read_parquet(files).map_batches(lambda df: df.assign(y=df["x"] * 2),
                                              batch_format="pandas")


def test_checkpoint_run_resume_invalidate(ray_session, input_files, tmp_path):
    root = str(tmp_path / "ckpt")
    shards = shard_files(input_files, 3)
    CALLS["n"] = 0

    ck = StageCheckpoint(root, "stage_a")
    recs = ck.run(shards, _stage)
    assert len(recs) == 3 and CALLS["n"] == 3
    assert all(r["rows"] == 20 for r in recs)
    assert all(r["rows_per_s"] > 0 for r in recs)
    total = sum(pq.read_table(f).num_rows for f in ck.output_files())
    assert total == 60

    # resume: fresh object, nothing recomputed
    ck2 = StageCheckpoint(root, "stage_a")
    recs2 = ck2.run(shards, _stage)
    assert CALLS["n"] == 3 and recs2 == recs

    # kill mid-run: drop one partition + manifest entry -> only it recomputes
    shutil.rmtree(ck2.partition_dir(1))
    ck3 = StageCheckpoint(root, "stage_a")
    ck3._done.pop(1, None)
    ck3.run(shards, _stage)
    assert CALLS["n"] == 4

    # input change invalidates exactly that partition
    import pyarrow as pa

    pq.write_table(pa.table({"x": [999] * 10}), shards[0][0])
    os.utime(shards[0][0], (0, 0))  # force mtime change regardless of clock
    ck4 = StageCheckpoint(root, "stage_a")
    ck4.run(shards, _stage)
    assert CALLS["n"] == 5
    # manifest carries lineage: inputs + fingerprint + metrics
    with open(os.path.join(root, "stage_a", "_manifest.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert {l["partition"] for l in lines} == {0, 1, 2}
    assert all(set(l) >= {"fingerprint", "rows", "bytes", "wall_s", "rows_per_s", "inputs"}
               for l in lines)


def test_sharding_deterministic():
    files = [f"/x/{i}.parquet" for i in range(10)]
    a = shard_files(files, 3)
    b = shard_files(list(reversed(files)), 3)
    assert a == b
    assert sorted(sum(a, [])) == sorted(files)


def test_checkpoint_reshard_prunes_stale_partitions(ray_session, input_files, tmp_path):
    """Re-running with FEWER shards must not double-count: stale part dirs
    and manifest rows beyond the new shard count are pruned before
    output_files aggregates (ADVICE r01 #2)."""
    import ray.data as rd

    root = str(tmp_path / "ckpt2")
    ck = StageCheckpoint(root, "stage")
    ck.run(shard_files(input_files, 4), _stage)
    assert len(ck.output_files()) > 0
    total_4 = rd.read_parquet(ck.output_files()).count()

    ck2 = StageCheckpoint(root, "stage")  # fresh handle, same root
    ck2.run(shard_files(input_files, 2), _stage)
    files = ck2.output_files()
    assert all("part=0" in f or "part=1" in f for f in files)
    total_2 = rd.read_parquet(files).count()
    assert total_2 == total_4 == 60  # each input row exactly once
    # on-disk stale dirs are gone too
    names = os.listdir(os.path.join(root, "stage"))
    assert not any(n.startswith("part=2") or n.startswith("part=3") for n in names)
