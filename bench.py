#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) in ONE Ray session with
``ray.init(address="local", num_cpus=int($RAY_GRAFT_CPUS or 32))`` and prints
a single JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"flagship": sec, ...}, "sf": 0.1, "num_cpus": 32,
     "rows_per_s": {...}}

``--scaling``: runs the flagship pipeline twice in FRESH processes
(``num_cpus=8`` then ``num_cpus=32``) on the same input and reports both
throughputs plus scaling efficiency (sandbox stand-in for the N vs 4N node
criterion in BASELINE.json:north_rule).

This script OWNS its Ray session (init+shutdown); library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

# Benchmarked query subset: the flagship + one representative per operator
# family (shuffle agg, big-big join, broadcast join, geocode+tile encode,
# zonal shuffle, PIP join, LSH dedup, text analytics, ANN, extraction).
BENCH_QUERIES = [
    "flagship",
    "flagship_checkpointed",
    "flagship_hex",
    "extract_text",
    "groupby_agg",
    "hash_join",
    "broadcast_join",
    "geocode_tiles",
    "goode_tiles",
    "tile_zonal",
    "pip_region",
    "dedup_minhash",
    "dedup_spans",
    "skew_join",
    "doc_quality",
    "knn_brute",
    "sort_limit",
    "asof_join",
    "sessionize",
    "rolling_window",
    "range_join",
    # round-4 headliners
    "semantic_dedup",
    "pq_topk",
    "media_pipeline",
    "pack_sequences",
    # round-5 headliners
    "connected_components",
    "media_jpeg_progressive",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _consume(result) -> int:
    """Force execution; return row count."""
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.count()
    return len(result)


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")


def _prewarm(sf_dir: str) -> None:
    """Generate the deterministic pages corpus OUTSIDE the timed region (it is
    input synthesis, not engine work) and warm the miniworld fixture."""
    from drivers_of_global_deforestation_ray.pipelines.queries import _pages_dir_for
    from drivers_of_global_deforestation_ray.sources.miniworld import build_miniworld

    _pages_dir_for(sf_dir)
    build_miniworld("/tmp/graft_miniworld")


def run_bench(sf_dir: str, num_cpus: int, names: list[str]) -> dict:
    import ray

    _init_ray(num_cpus)
    import ray.data as rd

    from drivers_of_global_deforestation_ray.pipelines.queries import QUERIES

    _prewarm(sf_dir)
    # spin the worker pool up once so the first query isn't charged Ray's
    # cold start (the per-query numbers then measure the pipelines)
    rd.range(10_000).map_batches(lambda b: b).count()
    # Steal-aware best-of-N (VERDICT r02 #1): single runs on this shared VM
    # swing 1.2-7x with hypervisor steal / co-tenant load, so a one-shot
    # number is weather, not signal.  Each repeat times every query once;
    # per-query BEST across repeats is reported, with per-run totals and
    # steal% kept alongside so a polluted run is visible in the artifact.
    repeats = max(1, int(os.environ.get("GRAFT_BENCH_REPEATS", "2")))
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    run_meta = []
    for _ in range(repeats):
        tot0, st0 = _cpu_stat()
        run_total = 0.0
        for name in names:
            t0 = time.perf_counter()
            n = _consume(QUERIES[name](sf_dir))
            sec = round(time.perf_counter() - t0, 4)
            run_total += sec
            if name not in timings or sec < timings[name]:
                timings[name] = sec
            rows[name] = n
        tot1, st1 = _cpu_stat()
        run_meta.append({
            "total_sec": round(run_total, 4),
            "steal_pct": round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 2),
        })
    out = {
        "metric": "headline pipelines e2e wall-time",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        "rows": rows,
        "repeats": repeats,
        "runs": run_meta,
    }
    ray.shutdown()
    return out


def _gen_scale_corpus(rows: int) -> str:
    """Generate (once, cached) the dedicated scaling corpus; caller owns Ray."""
    from drivers_of_global_deforestation_ray.sources.pages import generate_pages_parquet
    from drivers_of_global_deforestation_ray.sources.miniworld import build_miniworld

    build_miniworld("/tmp/graft_miniworld")
    return generate_pages_parquet(f"/tmp/graft_pages_{rows}", rows, seed=42)


def _cpu_stat() -> tuple[int, int]:
    """(total_ticks, steal_ticks) from /proc/stat — measurements on this
    shared VM carry their own hypervisor-steal weather report."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def run_scale_worker(num_cpus: int, rows: int) -> dict:
    """One fresh-process flagship run; prints rows/s for the scaling report."""
    import ray

    _init_ray(num_cpus)
    import ray.data as rd

    from drivers_of_global_deforestation_ray.pipelines.flagship import (
        FlagshipConfig, run_flagship)

    pages_dir = _gen_scale_corpus(rows)
    # warm the worker pool: the measurement is the pipeline, not process spawn
    rd.range(100_000).map_batches(lambda b: b).count()
    cfg = FlagshipConfig(world_dir="/tmp/graft_miniworld")
    tot0, st0 = _cpu_stat()
    t0 = time.perf_counter()
    final = run_flagship(pages_dir, cfg)
    out = final.select_columns(["tile_id", "class_final"]).to_pandas()
    sec = time.perf_counter() - t0
    tot1, st1 = _cpu_stat()
    steal_pct = 100.0 * (st1 - st0) / max(1, tot1 - tot0)
    # content hash over sorted output: equal hashes across parallelism levels
    # prove bit-determinism, not just equal row counts
    import hashlib

    out = out.sort_values("tile_id")
    h = hashlib.blake2b(out.to_records(index=False).tobytes(), digest_size=8).hexdigest()
    ray.shutdown()
    return {"num_cpus": num_cpus, "input_rows": rows, "out_rows": len(out),
            "sec": round(sec, 4), "rows_per_s": round(rows / sec, 1),
            "steal_pct": round(steal_pct, 2), "result_hash": h}


def _calib_worker(args: "tuple[int, str]") -> float:
    """Pure-CPU calibration kernel: the actual page-feature work on a cached
    in-memory batch, NO Ray — measures what this box's cores deliver when K
    of them run flat out (turbo clocks drop and memory bandwidth saturates as
    more cores activate, which caps ANY engine's strong-scaling on one box).
    Reads a 4096-row slice of the ALREADY-GENERATED scaling corpus — no
    dependency on any other fixture existing (ADVICE r01 #1)."""
    n_iter, pages_dir = args
    import pyarrow.parquet as pq

    from drivers_of_global_deforestation_ray.functions.grid import MINI_GRID
    from drivers_of_global_deforestation_ray.pipelines.flagship import page_features_batch

    frag = sorted(
        os.path.join(pages_dir, f) for f in os.listdir(pages_dir)
        if f.endswith(".parquet"))[0]
    t = pq.read_table(frag, columns=["url", "html"]).slice(0, 4096)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        page_features_batch(t, MINI_GRID, 0)
    return n_iter * len(t) / (time.perf_counter() - t0)


def hw_ceiling(low: int, high: int, pages_dir: str, n_iter: int = 6,
               trials: int = 2) -> float:
    """Aggregate pure-CPU throughput ratio running `high` vs `low` parallel
    processes of the calibration kernel — the hardware's own scaling ceiling
    for this workload on this box.  Best of ``trials`` per level (shared-VM
    noise)."""
    import multiprocessing as mp

    rates = {}
    for k in (low, high):
        best = 0.0
        for _ in range(trials):
            with mp.get_context("spawn").Pool(k) as pool:
                per_proc = pool.map(_calib_worker, [(n_iter, pages_dir)] * k)
            best = max(best, sum(per_proc))
        rates[k] = best
    return rates[high] / rates[low]


def run_scaling(low: int, high: int, rows: int) -> dict:
    """Same job, same input, two fresh processes at two parallelism levels —
    the sandbox stand-in for the N vs 4N node criterion.  The corpus is sized
    so per-core work dominates fixed costs (scaling measurements need enough
    data per core), and is pre-generated at full parallelism so neither timed
    run pays generation."""
    runs = []
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--_gen_worker",
         "--scale-rows", str(rows)],
        env=env, capture_output=True, text=True, timeout=3600)
    if p.returncode != 0:
        raise RuntimeError(f"corpus generation failed:\n{p.stderr[-2000:]}")
    for cpus in (low, high):
        best = None
        for _trial in range(2):  # best of 2: shared-VM noise swings 30-40%
            env = dict(os.environ)
            env["RAY_GRAFT_CPUS"] = str(cpus)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_scale_worker",
                 "--scale-rows", str(rows)],
                env=env, capture_output=True, text=True, timeout=3600)
            if p.returncode != 0:
                raise RuntimeError(f"scale worker cpus={cpus} failed:\n{p.stderr[-2000:]}")
            r = json.loads(p.stdout.strip().splitlines()[-1])
            if best is None or r["rows_per_s"] > best["rows_per_s"]:
                best = r
        runs.append(best)
    thr_low, thr_high = runs[0]["rows_per_s"], runs[1]["rows_per_s"]
    speedup = thr_high / thr_low
    efficiency = speedup / (high / low)
    # hardware calibration: the same kernel with K plain processes, no Ray —
    # on one box, turbo clocks + memory bandwidth cap the achievable speedup
    # well below CPUs_high/CPUs_low; engine efficiency is reported both raw
    # and relative to that measured ceiling (the multi-NODE criterion this
    # stands in for has per-node clocks/bandwidth, so the ceiling does not
    # apply there).
    ceiling = hw_ceiling(low, high, f"/tmp/graft_pages_{rows}")
    return {
        "metric": "flagship scaling efficiency (fresh sessions, same input)",
        "value": round(efficiency, 3),
        "unit": "efficiency",
        "input_rows": rows,
        "runs": runs,
        "speedup": round(speedup, 3),
        "cpus": [low, high],
        "hw_ceiling_speedup": round(ceiling, 3),
        "efficiency_vs_hw_ceiling": round(speedup / ceiling, 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--_scale_worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--_gen_worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of query names")
    ap.add_argument("--cpus-low", type=int, default=8)
    ap.add_argument("--cpus-high", type=int, default=32)
    ap.add_argument("--scale-rows", type=int,
                    default=int(os.environ.get("GRAFT_SCALE_ROWS", "4000000")))
    ap.add_argument("--out", default=None,
                    help="also write the --scaling report to this JSON file "
                         "(the round's SCALING_r{N}.json machine artifact)")
    args = ap.parse_args()

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if args._gen_worker:
        _init_ray(num_cpus)
        _gen_scale_corpus(args.scale_rows)
        import ray
        ray.shutdown()
        print("{}")
        return 0
    if args._scale_worker:
        print(json.dumps(run_scale_worker(num_cpus, args.scale_rows)))
        return 0
    if args.scaling:
        report = run_scaling(args.cpus_low, args.cpus_high, args.scale_rows)
        print(json.dumps(report))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)
                f.write("\n")
        return 0
    names = args.queries.split(",") if args.queries else BENCH_QUERIES
    print(json.dumps(run_bench(args.sf_dir, num_cpus, names)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
