#!/usr/bin/env python
"""Cluster entrypoint for the pretraining-data pipeline (``ray job submit``
target) — curation only, or the full tokenized chain.

On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/run_pretrain_job.py \
            --pages s3://bucket/pages/ --ckpt /shared/ckpt/run1 \
            --out /shared/out/run1 --tokenize --seq-len 2048

In this sandbox the same script runs single-node (``--local-cpus``).  The
script owns its Ray session (library code never calls ray.init); resumable
via the per-shard checkpoint manifests — re-submitting the identical
command skips complete shards and the fingerprint shuffle.

Outputs under ``--out``:

- ``chunks/``   curated text chunks (always)
- ``tokens/``   (chunk_id, token_ids, n_tokens) parquet  (``--tokenize``)
- ``spans/``    the loader-ready packing span map          (``--tokenize``)
- ``vocab.json`` the deterministic symbol -> id table      (``--tokenize``)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet dir")
    ap.add_argument("--ckpt", default=None, help="checkpoint root (resume)")
    ap.add_argument("--out", default=None, help="output root dir")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--tokenize", action="store_true",
                    help="run the full chain: BPE train -> encode -> pack")
    ap.add_argument("--num-merges", type=int, default=16)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--local-cpus", type=int, default=None,
                    help="force a local session with N CPUs (sandbox mode)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.local_cpus:
            ray.init(address="local", num_cpus=args.local_cpus,
                     include_dashboard=False, logging_level="ERROR")
        else:
            ray.init(address="auto")  # the ray job submit / cluster path

    from drivers_of_global_deforestation_ray.pipelines.pretrain import (
        PretrainConfig, run_pretrain, run_pretrain_tokenized)

    cfg = PretrainConfig(num_shards=args.shards)
    rpt: dict = {}
    t0 = time.perf_counter()
    if args.tokenize:
        span, enc, vocab = run_pretrain_tokenized(
            args.pages, cfg, num_merges=args.num_merges,
            seq_len=args.seq_len, report=rpt, ckpt_root=args.ckpt)
        if args.out:
            enc.write_parquet(os.path.join(args.out, "tokens"))
            span.write_parquet(os.path.join(args.out, "spans"))
            with open(os.path.join(args.out, "vocab.json"), "w") as f:
                json.dump(vocab, f, sort_keys=True)
        rows = rpt.get("sequences", span.count())
    else:
        chunks = run_pretrain(args.pages, cfg, report=rpt,
                              ckpt_root=args.ckpt)
        if args.out:
            chunks.write_parquet(os.path.join(args.out, "chunks"))
            rows = rpt.get("chunks", 0)
        else:
            rows = chunks.count()
    print(json.dumps({"rows": int(rows), "report": rpt,
                      "sec": round(time.perf_counter() - t0, 2),
                      "ckpt": args.ckpt, "out": args.out,
                      "tokenize": args.tokenize}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
