"""End-to-end pretraining pipeline: determinism, stage monotonicity,
checkpointed resume (no corpus-sized materialize)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from drivers_of_global_deforestation_ray.pipelines.pretrain import (
    PretrainConfig, run_pretrain)


@pytest.fixture(scope="module")
def pages_dir(ray_session):
    from drivers_of_global_deforestation_ray.sources.pages import (
        generate_pages_parquet)

    return generate_pages_parquet("/tmp/graft_pages_2000", 2000, seed=42)


@pytest.fixture(scope="module")
def pages_dir_sharded(ray_session):
    """Multi-file corpus (4 parquet parts) so per-shard resume is testable."""
    from drivers_of_global_deforestation_ray.sources.pages import (
        generate_pages_parquet)

    return generate_pages_parquet("/tmp/graft_pages_2000_s4", 2000, seed=42,
                                  num_blocks=4)


def test_pretrain_pipeline_counts_and_determinism(pages_dir, tmp_path):
    rpt1: dict = {}
    cfg = PretrainConfig(num_partitions=4, num_shards=4)
    c1 = run_pretrain(pages_dir, cfg, report=rpt1,
                      ckpt_root=str(tmp_path / "ck1")).to_pandas()
    # stage counts decrease monotonically through the filters (gate runs
    # BEFORE exact dedup — they commute, see pipelines/pretrain.py)
    assert (rpt1["pages"] >= rpt1["after_quality_lang_gate"]
            >= rpt1["after_exact_dedup"] >= rpt1["after_near_dedup"])
    assert rpt1["chunks"] >= rpt1["after_near_dedup"]  # chunking multiplies
    assert rpt1["after_near_dedup"] > 0 and len(c1) == rpt1["chunks"]
    # the near-dedup gate actually fired on this corpus (the synthetic
    # pages contain no EXACT text dups, so that stage is a checked no-op)
    assert rpt1["after_exact_dedup"] == rpt1["after_quality_lang_gate"]
    assert rpt1["after_near_dedup"] < rpt1["after_exact_dedup"]
    # PII masks applied: no raw emails survive
    assert not c1["chunk_text"].str.contains("@", regex=False).any()
    # determinism: a second full run (fresh checkpoints, different
    # partitioning AND sharding) yields the identical chunk set
    c2 = run_pretrain(pages_dir, PretrainConfig(num_partitions=8,
                                                num_shards=3),
                      ckpt_root=str(tmp_path / "ck2")).to_pandas()
    key = ["doc_id", "chunk_idx"]
    a = c1.sort_values(key).reset_index(drop=True)
    b = c2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_pretrain_resume_after_kill(pages_dir_sharded, tmp_path):
    """Kill/resume: wipe one gated partition from a completed run — the
    rerun recomputes exactly that shard (others skip via manifest
    fingerprints) and the chunk set is unchanged."""
    import shutil

    cfg = PretrainConfig(num_partitions=4, num_shards=4)
    root = str(tmp_path / "ck")
    c1 = run_pretrain(pages_dir_sharded, cfg, ckpt_root=root).to_pandas()

    stage_dirs = [d for d in os.listdir(root) if d.startswith("gated_docs_")]
    assert len(stage_dirs) == 1
    gate_dir = os.path.join(root, stage_dirs[0])
    parts = sorted(d for d in os.listdir(gate_dir) if d.startswith("part="))
    assert len(parts) == 4
    # simulate a mid-run kill: one partition's output vanishes
    shutil.rmtree(os.path.join(gate_dir, parts[1]))
    kept_mtimes = {p: os.path.getmtime(os.path.join(gate_dir, p))
                   for p in parts if p != parts[1]}

    c2 = run_pretrain(pages_dir_sharded, cfg, ckpt_root=root).to_pandas()
    # untouched partitions were skipped (files not rewritten)
    for p, mt in kept_mtimes.items():
        assert os.path.getmtime(os.path.join(gate_dir, p)) == mt
    assert os.path.isdir(os.path.join(gate_dir, parts[1]))  # recomputed
    key = ["doc_id", "chunk_idx"]
    a = c1.sort_values(key).reset_index(drop=True)
    b = c2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    # lineage manifests carry per-partition throughput metrics
    with open(os.path.join(gate_dir, "_manifest.jsonl")) as f:
        recs = [json.loads(ln) for ln in f]
    assert {r["partition"] for r in recs} == {0, 1, 2, 3}
    assert all(r["rows_per_s"] > 0 for r in recs)


def test_pretrain_config_fingerprint_isolates_checkpoints(pages_dir, tmp_path):
    """Different gate configs under ONE ckpt_root must not reuse each
    other's partials (stage names embed the config fingerprint)."""
    root = str(tmp_path / "ck")
    strict = PretrainConfig(min_tokens=200, num_partitions=4, num_shards=2)
    loose = PretrainConfig(min_tokens=20, num_partitions=4, num_shards=2)
    assert strict.fingerprint() != loose.fingerprint()
    r1: dict = {}
    r2: dict = {}
    run_pretrain(pages_dir, strict, report=r1, ckpt_root=root)
    run_pretrain(pages_dir, loose, report=r2, ckpt_root=root)
    assert r1["after_quality_lang_gate"] < r2["after_quality_lang_gate"]


def test_pretrain_tokenized_chain(pages_dir, tmp_path):
    """pages -> chunks -> BPE ids -> packed spans: rerun-deterministic,
    token-conserving, loader-consistent."""
    from drivers_of_global_deforestation_ray.pipelines.pretrain import (
        run_pretrain_tokenized)

    cfg = PretrainConfig(num_partitions=4, num_shards=2)
    outs = []
    for trial in range(2):
        rpt: dict = {}
        span, enc, vocab = run_pretrain_tokenized(
            pages_dir, cfg, num_merges=4, seq_len=128, report=rpt,
            ckpt_root=str(tmp_path / "ck"))
        sp = (span.to_pandas()
              .sort_values(["seq_id", "chunk_id"]).reset_index(drop=True))
        e = enc.to_pandas().sort_values("chunk_id").reset_index(drop=True)
        outs.append((sp, e, vocab, rpt))
    (sp1, e1, v1, r1), (sp2, e2, v2, r2) = outs
    pd.testing.assert_frame_equal(sp1, sp2)   # rerun-deterministic
    assert v1 == v2
    # token conservation: every encoded token lands in exactly one span
    assert int(sp1["n_tokens"].sum()) == int(e1["n_tokens"].sum())
    # per-chunk conservation too (a chunk's spans tile its token stream)
    per_chunk = sp1.groupby("chunk_id")["n_tokens"].sum()
    enc_counts = e1.set_index("chunk_id")["n_tokens"]
    nonzero = enc_counts[enc_counts > 0]
    assert per_chunk.sort_index().equals(nonzero.sort_index())
    # sequences are full except possibly the last
    per_seq = sp1.groupby("seq_id")["n_tokens"].sum()
    assert (per_seq.iloc[:-1] == 128).all() and per_seq.iloc[-1] <= 128
    # every token id is inside the vocab id space
    assert r1["vocab_size"] == len(v1)
    hi = max(max(t) for t in e1["token_ids"] if len(t))
    assert 0 <= hi < len(v1)
