#!/usr/bin/env python
"""ANN-at-scale datapoints: PQ and IVF-PQ over 1M x 64-dim vectors.

Generates (once, cached) a 1M-vector parquet corpus under
``/tmp/graft_vectors_1m`` (deterministic seed, 16 shards), then times:

- ``pq_topk``: full PQ pipeline — fixed-point codebook training (m=8,
  16 codes, 2 iters = 3 corpus scans incl. search) + ADC shortlist +
  exact re-rank (refine=4000/block) top-10 for 8 queries;
- ``knn_ivfpq``: coarse 64-bucket quantizer (3 iters) + residual PQ +
  probe-4 ADC search + re-rank (refine=2000/block/bucket);
- ``knn_brute`` (metric="l2"): the exact baseline the approximations are
  measured against (recall@10 reported for both).

Prints ONE JSON line: seconds + vectors/s per path + recall.

Run: ``python tools/bench_ann_scale.py [--cpus 32] [--rows 1000000]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/graft_vectors_1m"
DIM = 64


def _build(rows: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(CORPUS, exist_ok=True)
    shards = 16
    per = rows // shards
    for s in range(shards):
        path = os.path.join(CORPUS, f"part-{s:05d}.parquet")
        if os.path.exists(path):
            continue
        rng = np.random.default_rng(1000 + s)
        # 32 soft clusters so IVF routing has real structure
        centers = np.random.default_rng(7).normal(scale=2.0, size=(32, DIM))
        ids = np.arange(s * per, (s + 1) * per, dtype=np.int64)
        X = (centers[ids % 32] + rng.normal(scale=0.6, size=(per, DIM))).astype(np.float32)
        pq.write_table(
            pa.table({"vec_id": ids, "embedding": list(X)}), path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()

    _build(args.rows)

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    from drivers_of_global_deforestation_ray.stages.similarity import (
        knn_brute, knn_ivfpq, pq_topk)

    # queries at the generator's cluster centers (+tiny jitter): in high-dim
    # a uniformly-random query has near-equidistant neighbors and recall is
    # meaningless for ANY index; centered queries measure real retrieval.
    centers = np.random.default_rng(7).normal(scale=2.0, size=(32, DIM))
    qs = centers[:8] + np.random.default_rng(99).normal(scale=0.05,
                                                        size=(8, DIM))
    out = {"rows": args.rows, "dim": DIM, "num_cpus": args.cpus, "paths": {}}

    def _run(name, fn):
        ds = rd.read_parquet(CORPUS)
        t0 = time.perf_counter()
        res = fn(ds).to_pandas()
        sec = round(time.perf_counter() - t0, 3)
        out["paths"][name] = {"sec": sec,
                              "vectors_per_s": round(args.rows / sec)}
        return res

    exact = _run("knn_brute_l2", lambda ds: knn_brute(ds, qs, k=10,
                                                       metric="l2"))
    pq_res = _run("pq_topk_refine", lambda ds: pq_topk(
        ds, qs, k=10, m=8, codes=16, iters=2, refine=4000))
    ivfpq = _run("knn_ivfpq_refine", lambda ds: knn_ivfpq(
        ds, qs, k=10, nlist=64, nprobe=4, m=8, codes=16,
        coarse_iters=3, pq_iters=2, refine=2000))

    def _recall(approx) -> float:
        r = []
        for qi in range(len(qs)):
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(approx[approx["query_id"] == qi]["vec_id"])
            r.append(len(e & a) / max(1, len(e)))
        return round(float(np.mean(r)), 3)

    out["paths"]["pq_topk_refine"]["recall_at_10"] = _recall(pq_res)
    out["paths"]["knn_ivfpq_refine"]["recall_at_10"] = _recall(ivfpq)
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
