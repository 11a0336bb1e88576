#!/usr/bin/env python
"""Per-stage profile of a registry query: run it, print Ray Data's operator
stats (wall, blocks, rows, peak memory) so optimization targets the stage
that actually dominates.

Usage::

    python tools/profile_query.py <query_name> [sf_dir] [--cpus N]

Owns its Ray session (library code never does)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from drivers_of_global_deforestation_ray.pipelines.queries import QUERIES

    rd.range(10_000).map_batches(lambda b: b).count()  # warm the pool
    t0 = time.perf_counter()
    res = QUERIES[args.query](args.sf_dir)
    if isinstance(res, rd.Dataset):
        # count() takes a separate fast-path plan that leaves the original
        # dataset's stats empty — materialize to populate them
        m = res.materialize()
        print(f"# {args.query}: {m.count()} rows in "
              f"{time.perf_counter() - t0:.2f}s "
              f"({args.cpus} cpus, {args.sf_dir})\n")
        print(m.stats())
    else:
        print(f"# {args.query}: {len(res)} rows in "
              f"{time.perf_counter() - t0:.2f}s (driver-side result; "
              "stats cover the final dataset only)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
