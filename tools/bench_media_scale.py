#!/usr/bin/env python
"""8-vs-32 CPU scaling legs for the media curation pipeline (VERDICT r04 #9:
the scaling record should include one LLM-ops pipeline, not just flagship).

Same discipline as ``bench.py --scaling``: the corpus (the deterministic
``sources/mediafix.py`` payload scheme over a contiguous id range — real
baseline JPEGs + PNGs with planted near-dups, shells, junk) is generated
ONCE at full parallelism, then the full triage -> decode -> JL embed ->
LSH -> anti-join pipeline runs in FRESH processes at each CPU level, best
of 2 (shared-VM noise), with /proc/stat steal sampled around each timed
leg and a content hash over the sorted survivor set proving the two
parallelism levels produce the identical result.

Run: ``python tools/bench_media_scale.py [--rows 200000] [--low 8 --high 32]``
Worker mode (internal): ``--_worker`` with RAY_GRAFT_CPUS set.
Prints ONE JSON report; ``--out`` also writes it to a file.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus_dir(rows: int) -> str:
    return f"/tmp/graft_media_{rows}"


def _cpu_stat() -> "tuple[int, int]":
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def generate(rows: int) -> None:
    """Write the corpus parquet once (full parallelism, cached)."""
    out = corpus_dir(rows)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False)

    from drivers_of_global_deforestation_ray.sources.mediafix import synth_media_payloads

    def _mk(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["id"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": ids,
                             "payload": synth_media_payloads(ids)})

    (rd.range(rows, override_num_blocks=64)
       .map_batches(_mk, batch_format="pandas", batch_size=4096)
       .write_parquet(out))
    with open(done, "w") as f:
        f.write(str(rows))
    ray.shutdown()


def worker(rows: int) -> dict:
    """One fresh-process timed run of the curation pipeline."""
    import ray
    import ray.data as rd

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    # warm the worker pool: the measurement is the pipeline, not process spawn
    rd.range(100_000).map_batches(lambda b: b).count()

    from drivers_of_global_deforestation_ray.pipelines.media import (
        MediaCurationConfig, run_media_curation)

    ds = rd.read_parquet(corpus_dir(rows))
    # near-exact operating point for the at-scale corpus: the 16-dim pixel
    # statistics features are a LOW-diversity space (a crawl-realistic
    # embedding model is out of sandbox scope), so a loose 0.98 threshold
    # would mark several percent of ALL pairs as near-dups — an O(N^2)
    # OUTPUT no engine survives and no real crawl exhibits.  At 0.9999
    # with a tight quantized margin the candidate set collapses to the
    # content-identical pairs (planted dups + true repeats; measured ~2x
    # final pairs vs ~23x at a 0.998 floor); 16 planes keep buckets small
    # at 200k+ rows, and 4 tables are plenty — identical vectors collide
    # in EVERY table, so exact-dup recall is 1.0 by construction.
    cfg = MediaCurationConfig(lsh_threshold=0.9999, lsh_margin=0.0001,
                              num_planes=16, num_tables=4,
                              num_partitions=32)
    tot0, st0 = _cpu_stat()
    t0 = time.perf_counter()
    out = run_media_curation(ds, cfg)
    df = out.select_columns(["doc_id", "fmt", "width", "height"]).to_pandas()
    sec = time.perf_counter() - t0
    tot1, st1 = _cpu_stat()
    df = df.sort_values("doc_id").reset_index(drop=True)
    h = hashlib.blake2b(df.to_csv(index=False).encode(), digest_size=8).hexdigest()
    ray.shutdown()
    return {"num_cpus": cpus, "input_rows": rows, "survivors": len(df),
            "sec": round(sec, 4), "rows_per_s": round(rows / sec, 1),
            "steal_pct": round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 2),
            "result_hash": h}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--_worker", action="store_true")
    args = ap.parse_args()

    if args._worker:
        print(json.dumps(worker(args.rows)))
        return 0

    generate(args.rows)
    runs = []
    for cpus in (args.low, args.high):
        best = None
        for _trial in range(2):
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(cpus)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_worker",
                 "--rows", str(args.rows)],
                env=env, capture_output=True, text=True, timeout=3600)
            if p.returncode != 0:
                raise RuntimeError(f"worker cpus={cpus} failed:\n{p.stderr[-2000:]}")
            r = json.loads(p.stdout.strip().splitlines()[-1])
            if best is None or r["rows_per_s"] > best["rows_per_s"]:
                best = r
        runs.append(best)
    speedup = runs[1]["rows_per_s"] / runs[0]["rows_per_s"]
    report = {
        "metric": "media curation scaling efficiency (fresh sessions, same input)",
        "value": round(speedup / (args.high / args.low), 3),
        "unit": "efficiency",
        "input_rows": args.rows,
        "runs": runs,
        "speedup": round(speedup, 3),
        "cpus": [args.low, args.high],
        "hashes_match": runs[0]["result_hash"] == runs[1]["result_hash"],
    }
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
