#!/usr/bin/env python
"""Cluster entrypoint for the flagship pipeline (``ray job submit`` target).

On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/run_flagship_job.py \
            --pages s3://bucket/pages/ --world-dir /shared/world \
            --ckpt /shared/ckpt/run1 --out /shared/out/run1 --shards 256

In this sandbox the same script runs single-node (``--local-cpus``).  The
script owns its Ray session (library code never calls ray.init); resumable
via the per-shard checkpoint manifest — re-submitting the identical command
skips complete shards.
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
    ap.add_argument("--world-dir", required=True, help="raster/polygon fixture dir")
    ap.add_argument("--ckpt", default=None, help="checkpoint root (enables resume)")
    ap.add_argument("--out", default=None, help="output dir (partitioned parquet)")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--tiling", choices=["grid", "hex"], default="grid",
                    help="analysis-tile index: positional grid (reference "
                         "parity) or aperture-7 hex cells + hex k-ring "
                         "smoothing (north-star H3 mode)")
    ap.add_argument("--hex-res", type=int, default=2)
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

    from drivers_of_global_deforestation_ray.pipelines.flagship import (
        FlagshipConfig, run_flagship, run_flagship_checkpointed,
        run_flagship_hex, run_flagship_hex_checkpointed)

    cfg = FlagshipConfig(world_dir=args.world_dir)
    t0 = time.perf_counter()
    if args.tiling == "hex":
        if args.ckpt:
            final = run_flagship_hex_checkpointed(
                args.pages, cfg, args.ckpt, hex_res=args.hex_res,
                num_shards=args.shards, out_dir=args.out)
        else:
            final = run_flagship_hex(args.pages, cfg, hex_res=args.hex_res,
                                     out_dir=args.out)
    elif args.ckpt:
        final = run_flagship_checkpointed(args.pages, cfg, args.ckpt,
                                          num_shards=args.shards, out_dir=args.out)
    else:
        final = run_flagship(args.pages, cfg, out_dir=args.out)
    rows = final.count()
    print(json.dumps({"rows": rows, "sec": round(time.perf_counter() - t0, 2),
                      "tiling": args.tiling, "ckpt": args.ckpt, "out": args.out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
