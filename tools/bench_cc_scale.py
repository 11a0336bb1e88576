#!/usr/bin/env python
"""At-scale datapoint for pinned-BSP connected components (VERDICT r04 #3).

Synthetic chain graph: nodes ``0..N-1``, edge ``(i, i+1)`` unless ``i`` ends
a length-``L`` chain — ``N/L`` components of diameter ``L-1``, the shape
that stresses the pointer-jumping round count (``O(log L)`` supersteps).
Every component's true label is closed-form (``(i // L) * L``), so the run
verifies ALL labels exactly, not just a sample.

Prints ONE JSON line. Run: ``python tools/bench_cc_scale.py [--nodes 4000000]
[--chain 100] [--cpus 32]``
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4_000_000)
    ap.add_argument("--chain", type=int, default=100)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--shards", type=int, default=16)
    args = ap.parse_args()

    import pandas as pd
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    from drivers_of_global_deforestation_ray.stages.graph import (
        connected_components_pinned)

    n, L = args.nodes, args.chain

    def _edges(b: pd.DataFrame) -> pd.DataFrame:
        i = b["id"].to_numpy(np.int64)
        keep = (i % L) != (L - 1)
        a = i[keep]
        return pd.DataFrame({"a": a, "b": a + 1})

    pairs = rd.range(n, override_num_blocks=64).map_batches(
        _edges, batch_format="pandas")
    n_edges = n - n // L

    work = tempfile.mkdtemp(prefix="graft_cc_scale_", dir="/tmp")
    t0 = time.perf_counter()
    out = connected_components_pinned(pairs, work, num_shards=args.shards)

    def _check(b: pd.DataFrame) -> pd.DataFrame:
        node = b["node"].to_numpy(np.int64)
        ok = (b["label"].to_numpy(np.int64) == (node // L) * L)
        return pd.DataFrame({"n": [len(b)], "bad": [int((~ok).sum())]})

    agg = out.map_batches(_check, batch_format="pandas").to_pandas()
    sec = time.perf_counter() - t0
    shutil.rmtree(work, ignore_errors=True)
    report = {
        "metric": "pinned-BSP connected components wall-time",
        "value": round(sec, 3),
        "unit": "sec",
        "nodes": n,
        "edges": n_edges,
        "chain_len": L,
        "components": n // L,
        "labeled_nodes": int(agg["n"].sum()),
        "label_errors": int(agg["bad"].sum()),
        "edges_per_s": round(n_edges / sec, 1),
        "num_cpus": args.cpus,
        "num_shards": args.shards,
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
