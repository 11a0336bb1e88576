"""Measure the pandas vs arrow partial-aggregation kernels (VERDICT r03 #6).

Times ``grouped_agg`` end-to-end (partial + tiny final shuffle) with both
partial engines over the sf0.1 lineitem table, three key regimes:

- numeric high-cardinality key (l_orderkey — the flagship's tile_id shape)
- string low-cardinality keys (l_returnflag, l_linestatus — TPC-H Q1 shape)
- numeric low-cardinality key (l_linenumber)

Prints ONE JSON line; parity of the two engines' results is asserted
before any timing is reported.  Record the verdict in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    from drivers_of_global_deforestation_ray.stages.relational import (
        grouped_agg_final, grouped_agg_partial)

    DataContext.get_current().enable_progress_bars = False

    cases = {
        "numeric_hicard": (["l_orderkey"],
                           {"sum_qty": ("l_quantity", "sum"),
                            "mean_price": ("l_extendedprice", "mean"),
                            "n": ("l_quantity", "count")}),
        "string_locard": (["l_returnflag", "l_linestatus"],
                          {"sum_qty": ("l_quantity", "sum"),
                           "sum_price": ("l_extendedprice", "sum"),
                           "mean_disc": ("l_discount", "mean"),
                           "n": ("l_quantity", "size")}),
        "numeric_locard": (["l_linenumber"],
                           {"sum_qty": ("l_quantity", "sum"),
                            "max_price": ("l_extendedprice", "max"),
                            "min_disc": ("l_discount", "min")}),
    }
    path = os.path.join(sf_dir, "lineitem.parquet")
    out = {"sf_dir": sf_dir, "repeats": repeats, "cases": {}}
    for name, (keys, specs) in cases.items():
        cols = sorted({keys[0], *keys} | {c for c, _ in specs.values()})
        results = {}
        for engine in ("pandas", "arrow"):
            best = float("inf")
            for _ in range(repeats):
                ds = rd.read_parquet(path, columns=cols)
                t0 = time.perf_counter()
                res = grouped_agg_final(
                    grouped_agg_partial(ds, keys, specs, engine=engine),
                    keys, specs).to_pandas()
                best = min(best, time.perf_counter() - t0)
            results[engine] = {"best_sec": round(best, 4), "rows": len(res)}
            res = res.sort_values(keys).reset_index(drop=True)
            results[engine]["frame"] = res
        a = results["pandas"].pop("frame")
        b = results["arrow"].pop("frame")
        cols_sorted = sorted(a.columns)
        assert list(a.columns.sort_values()) == list(b.columns.sort_values())
        for c in cols_sorted:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating):
                # pandas and arrow reduce float sums in different orders —
                # few-ulp reassociation drift is expected (the engine's
                # hash-exact float sums ride as scaled int64, not floats)
                assert np.allclose(av, bv.astype(av.dtype),
                                   rtol=1e-9, atol=1e-12), c
            else:
                assert (av == bv.astype(av.dtype)).all(), c
        results["speedup_arrow"] = round(
            results["pandas"]["best_sec"] / results["arrow"]["best_sec"], 3)
        out["cases"][name] = results
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
