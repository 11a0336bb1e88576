#!/usr/bin/env python
"""Reference-scale wide-gather benchmark (SURVEY.md §7.4 "wide gather").

The reference joins 85 feature rasters onto the full 1737x4008 Goode grid as
85 sequential whole-table joins (``Supplemental_Data_1.R:209-269``).  The
engine replaces that with ONE actor-pool `map_batches` pass over mmap'd grids
(ST3/M10).  This tool measures that stage at the reference's real dimensions:

- builds (once, cached) 85 formulaic float32 rasters on the full Goode grid
  (~2.4 GB on disk; values are pure functions of (feature, row, col) so the
  fixture is deterministic and verifiable),
- streams N random tile ids through the gather actor pool,
- prints rows/s and the effective column-value throughput.

Run: ``python tools/bench_wide_gather.py [--rows 2000000] [--cpus 32]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/graft_goode_rasters"
NUM_FEATURES = 85


def build_fixture() -> str:
    from drivers_of_global_deforestation_ray.functions.grid import GOODE_GRID
    from drivers_of_global_deforestation_ray.state.raster import GeoRef, write_raster

    marker = os.path.join(FIXTURE, "_SUCCESS")
    manifest = os.path.join(FIXTURE, "manifest.json")
    if os.path.exists(marker):
        return manifest
    os.makedirs(FIXTURE, exist_ok=True)
    nrows, ncols = GOODE_GRID.nrows, GOODE_GRID.ncols
    georef = GeoRef.from_grid(GOODE_GRID)
    rr = np.arange(nrows, dtype=np.float32)[:, None]
    cc = np.arange(ncols, dtype=np.float32)[None, :]
    entries = []
    for f in range(NUM_FEATURES):
        # deterministic, feature-distinct, cheap: verifiable at any cell
        grid = ((f + 1) * rr + 0.5 * cc + np.float32(f * 0.25)) % np.float32(1000.0)
        write_raster(os.path.join(FIXTURE, f"feat_{f:02d}"), grid.astype(np.float32), georef)
        entries.append({"name": f"feat_{f:02d}", "stem": f"feat_{f:02d}"})
    with open(manifest, "w") as fh:
        json.dump(entries, fh)
    with open(marker, "w") as fh:
        fh.write("ok")
    return manifest


class WideGather:
    """Actor: all 85 mmap'd Goode-size grids opened once, gathered per batch."""

    def __init__(self, manifest: str):
        from drivers_of_global_deforestation_ray.state.raster import RasterRegistry

        self.reg = RasterRegistry(manifest)
        self.names = list(self.reg.names) if hasattr(self.reg, "names") else None

    def __call__(self, batch):
        feats = self.reg.gather(batch["tile_id"].to_numpy())
        for name, vals in feats.items():
            batch[name] = vals
        return batch


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    from drivers_of_global_deforestation_ray.functions.grid import GOODE_GRID

    manifest = build_fixture()
    rd.range(1000).map_batches(lambda b: b).count()  # warm workers
    n_tiles = GOODE_GRID.num_tiles()

    def _ids(b):
        import pandas as pd

        rng = np.random.default_rng(b["id"][0])
        return pd.DataFrame({"tile_id": rng.integers(1, n_tiles + 1, len(b["id"]))})

    ds = rd.range(args.rows, override_num_blocks=max(32, args.cpus * 4)).map_batches(
        _ids, batch_format="numpy")
    t0 = time.perf_counter()
    out_rows = ds.map_batches(
        WideGather,
        fn_constructor_kwargs={"manifest": manifest},
        batch_format="pandas",
        batch_size=65_536,  # 85 float64 cols x 64k rows ~ 44 MB per batch
        concurrency=(1, max(2, args.cpus // 2)),
        num_cpus=1,
    ).count()
    sec = time.perf_counter() - t0
    print(json.dumps({
        "metric": "wide gather (85 features, full 1737x4008 Goode grid, random tiles)",
        "rows": out_rows,
        "sec": round(sec, 2),
        "rows_per_s": round(out_rows / sec, 1),
        "cell_values_per_s": round(out_rows * NUM_FEATURES / sec, 1),
        "num_cpus": args.cpus,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
