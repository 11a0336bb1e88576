#!/usr/bin/env python
"""Reference-scale flagship tail: the FULL 6,961,896-cell prediction pass.

Runs the production ``tiles_to_classes`` path (featurize -> PIP region join ->
CART scoring -> vote/gates -> k-ring smoothing -> final gates) over every cell
of the real 1737x4008 Goode grid with a 7-region world — the exact shape of
the reference's prediction universe (``Supplemental_Data_1.R:240-342``),
which the reference processes single-threaded with 85 sequential joins and
35 sequential model fits.

The world fixture is the deterministic miniworld generator pointed at
``GOODE_GRID`` (same code path as the tests, bigger numbers).  First run
builds ~6 GB of rasters under ``/tmp/graft_goodeworld`` (cached).

Run: ``python tools/bench_reference_scale.py [--cpus 32]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORLD = "/tmp/graft_goodeworld"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    from drivers_of_global_deforestation_ray.functions.grid import GOODE_GRID
    from drivers_of_global_deforestation_ray.pipelines.flagship import (
        FlagshipConfig, tiles_to_classes)
    from drivers_of_global_deforestation_ray.sources.miniworld import build_miniworld

    t0 = time.perf_counter()
    build_miniworld(WORLD, grid=GOODE_GRID, num_regions=7)
    build_s = time.perf_counter() - t0

    rd.range(1000).map_batches(lambda b: b).count()  # warm workers
    cfg = FlagshipConfig(world_dir=WORLD, grid=GOODE_GRID, num_regions=7)
    n_tiles = GOODE_GRID.num_tiles()

    def _universe(b) -> pd.DataFrame:
        ids = b["id"] + 1
        return pd.DataFrame({
            "tile_id": ids.astype(np.int64),
            "n_pages": np.int64(1),
            "sum_tokens": np.int64(100),
            "mean_quality": np.float64(1.0),
        })

    per_tile = rd.range(n_tiles, override_num_blocks=max(64, args.cpus * 4)).map_batches(
        _universe, batch_format="numpy")
    t0 = time.perf_counter()
    final = tiles_to_classes(per_tile, cfg)
    classified = final.filter(expr="class_final > 0").count()
    sec = time.perf_counter() - t0
    print(json.dumps({
        "metric": "reference-scale prediction pass (6.96M cells, 7 regions, "
                  "featurize+PIP+score+vote+smooth+gates)",
        "grid": [GOODE_GRID.nrows, GOODE_GRID.ncols],
        "universe_cells": n_tiles,
        "classified_cells": classified,
        "sec": round(sec, 2),
        "cells_per_s": round(n_tiles / sec, 1),
        "world_build_s": round(build_s, 2),
        "num_cpus": args.cpus,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
