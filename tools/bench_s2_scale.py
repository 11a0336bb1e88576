#!/usr/bin/env python
"""Tiling contract at scale: geocode + cell encode + cell-keyed zonal
aggregate over the cached multi-million-page corpus, for EITHER codec.

This is the north star's "assign every record to a 10-km analysis tile via
batched H3 (res 5-7) / S2 cell encoding ... explicit cell-keyed
groupby-aggregate shuffle" measured end-to-end:

- ``--codec s2`` (default): read urls -> md5 geocode -> vectorized
  ``latlng_to_cell`` (level 10, ~10 km edge) -> ``cell_parent`` to level 7
  -> two-phase grouped aggregate.
- ``--codec hex``: same pages -> aperture-7 ``latlng_to_hex`` (res 7) ->
  geometric ``hex_parent`` to res 5 (~10-km tile; decode + full re-encode,
  the heavier half of the ladder) -> two-phase grouped aggregate.

Per-block partials mean one row per cell per block crosses the shuffle (the
skew remedy).  Prints ONE JSON line.

Run: ``python tools/bench_s2_scale.py [--codec hex] [--pages /tmp/graft_pages_4000000]``
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


def _steal_counters():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = list(map(int, parts[1:]))
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default="/tmp/graft_pages_4000000")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--level", type=int, default=None,
                    help="encode level/res (default: 10 for s2, 7 for hex)")
    ap.add_argument("--parent", type=int, default=None,
                    help="parent level/res (default: 7 for s2, 5 for hex)")
    ap.add_argument("--codec", choices=["s2", "hex"], default="s2")
    args = ap.parse_args()
    if args.level is None:
        args.level = 10 if args.codec == "s2" else 7
    if args.parent is None:
        args.parent = 7 if args.codec == "s2" else 5

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    from drivers_of_global_deforestation_ray.functions.extract import geocode_urls
    from drivers_of_global_deforestation_ray.stages import relational as R

    level, parent = args.level, args.parent

    if args.codec == "s2":
        from drivers_of_global_deforestation_ray.functions.s2 import (
            cell_parent, latlng_to_cell)

        encode, to_parent = latlng_to_cell, cell_parent
    else:
        from drivers_of_global_deforestation_ray.functions.hexgrid import (
            hex_parent, latlng_to_hex)

        encode, to_parent = latlng_to_hex, hex_parent

    def _encode(b) -> pd.DataFrame:
        urls = b["url"].to_pylist()
        lat, lon = geocode_urls(urls)
        cells = encode(lat, lon, level)
        return pd.DataFrame({"cell7": to_parent(cells, parent),
                             "one": np.ones(len(urls), dtype=np.int64)})

    rd.range(1000).map_batches(lambda b: b).count()  # warm workers
    s0, t0c = _steal_counters()
    t0 = time.perf_counter()
    pages = rd.read_parquet(args.pages, columns=["url"])
    zonal = R.grouped_agg(
        pages.map_batches(_encode, batch_format="pyarrow"),
        ["cell7"], {"n_pages": ("one", "sum")})
    df = zonal.to_pandas()
    wall = time.perf_counter() - t0
    s1, t1c = _steal_counters()
    n_pages = int(df["n_pages"].sum())
    print(json.dumps({
        "metric": f"{args.codec}-encode + cell-keyed zonal shuffle (pages/sec)",
        "value": round(n_pages / wall, 1),
        "unit": "pages/sec",
        "wall_sec": round(wall, 2),
        "pages": n_pages,
        "cells": int(len(df)),
        "level": level,
        "parent_level": parent,
        "num_cpus": args.cpus,
        "steal_pct": round(100.0 * (s1 - s0) / max(1, t1c - t0c), 2),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
