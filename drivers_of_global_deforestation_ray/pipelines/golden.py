"""Straight-line single-process reference implementation of the flagship.

The parity oracle for the distributed pipeline (SURVEY.md §5.2): identical
semantics, pandas/numpy only, one thread, no Ray.  Shares the *primitive*
kernels (extractor, geocoder, codec, CART fit, smoothing kernel) with the
engine so the end-to-end test isolates exactly what distribution could break:
batching, shuffles, join/group semantics, ordering assumptions, broadcast
state.  Output: the final per-tile table, compared exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.extract import extract_text_batch, geocode_urls
from ..functions.grid import GridSpec, latlon_to_tile, tile_to_latlon_center
from ..functions.text import quality_stats
from ..sources.miniworld import miniworld_paths
from ..state.geo import assign_regions
from ..state.raster import RasterRegistry, read_raster
from ..stages.score import DRIVERS, fit_region_trees
from ..stages.smooth import dense_class_array, smooth_batch
from ..state.cart import CartTree
from .flagship import FlagshipConfig, build_training_table

__all__ = ["run_flagship_golden", "run_flagship_hex_golden"]


def run_flagship_golden(pages: pa.Table, cfg: FlagshipConfig) -> pd.DataFrame:
    grid, res = cfg.grid, cfg.res
    paths = miniworld_paths(cfg.world_dir)

    # page map
    urls = pages["url"].to_pylist()
    texts = extract_text_batch(pages["html"].to_pylist())
    lat, lon = geocode_urls(urls)
    tiles = latlon_to_tile(lat, lon, grid, res)
    q = quality_stats(pd.Series(texts))
    per_page = pd.DataFrame(
        {"tile_id": tiles, "n_tokens": q["n_tokens"], "quality_score": q["quality_score"]}
    )

    # zonal page stats
    g = per_page.groupby("tile_id", sort=True)
    per_tile = pd.DataFrame(
        {
            "tile_id": np.asarray(list(g.groups), dtype=np.int64),
            "n_pages": g.size().to_numpy(),
            "sum_tokens": g["n_tokens"].sum().to_numpy(),
            "mean_quality": (g["quality_score"].sum() / g.size()).to_numpy(),
        }
    )

    # region + covariates + loss
    t_lat, t_lon = tile_to_latlon_center(per_tile["tile_id"].to_numpy(), grid, res)
    from ..sources.miniworld import load_polygons

    rings, region_ids = load_polygons(paths["polygons"])
    per_tile["region"] = assign_regions(np.stack([t_lon, t_lat], axis=1), rings, region_ids)
    registry = RasterRegistry(paths["manifest"], mmap=False)
    for name, vals in registry.gather(per_tile["tile_id"].to_numpy(), cfg.feature_names).items():
        per_tile[name] = np.nan_to_num(vals, nan=0.0)
    loss_grid, _ = read_raster(paths["loss"], mmap=False)
    per_tile["loss"] = np.nan_to_num(
        loss_grid.ravel()[per_tile["tile_id"].to_numpy() - 1], nan=0.0
    )

    # prediction universe
    universe = per_tile[(per_tile["region"] > 0) & (per_tile["loss"] > 0)].reset_index(drop=True)

    # fit + score
    training = build_training_table(cfg.world_dir, grid, res, cfg.feature_names)
    trees, _ = fit_region_trees(training, cfg.feature_names, list(range(1, cfg.num_regions + 1)))
    X = universe[cfg.feature_names].to_numpy(dtype=np.float64)
    region = universe["region"].to_numpy()
    out = np.zeros((len(universe), len(DRIVERS)))
    for (r, d), arrs in trees.items():
        mask = region == r
        if mask.any():
            out[mask, DRIVERS.index(d)] = CartTree.from_arrays(arrs).predict(X[mask])
    for j, d in enumerate(DRIVERS):
        universe[f"out{d}"] = out[:, j]

    # vote + gates
    cls = (out.argmax(axis=1) + 1).astype(np.int64)
    mx = out.max(axis=1)
    cls = np.where(mx < cfg.conf_threshold, 0, cls)
    cls = np.where(universe["loss"].to_numpy() < cfg.loss_threshold, 0, cls)
    universe["class"] = cls
    universe["max_value"] = mx

    # smoothing (same kernel as the engine stage)
    dense = dense_class_array(
        universe["tile_id"].to_numpy(), universe["class"].to_numpy(), grid.num_tiles(res)
    )
    universe["class_smoothed"] = smooth_batch(
        universe["tile_id"].to_numpy(), universe["class"].to_numpy(), dense, grid, res, cfg.smooth_k
    )

    # final gate + round
    loss = universe["loss"].to_numpy()
    gated = np.where((loss > 0) & (loss < cfg.loss_threshold), 0, universe["class_smoothed"])
    universe["class_final"] = np.round(gated).astype(np.int64)
    return universe.reset_index(drop=True)


def run_flagship_hex_golden(pages: pa.Table, cfg: FlagshipConfig,
                            hex_res: int = 2) -> pd.DataFrame:
    """Straight-line numpy reference for the HEX-keyed flagship
    (:func:`..pipelines.flagship.run_flagship_hex`) — the same whole-model
    semantics as :func:`run_flagship_golden`
    (``Supplemental_Data_1.R:293-342,370-382,496-498``) re-keyed to the
    aperture-7 hexagonal index: hex encode -> zonal page stats per cell ->
    PIP + raster gather at CELL CENTERS -> CART -> vote/gates -> hex k-ring
    majority smoothing -> final gate.  Shares every primitive kernel with
    the engine so the parity test isolates distribution only."""
    from ..functions.hexgrid import hex_to_latlng, latlng_to_hex
    from ..sources.miniworld import load_polygons
    from ..stages.smooth import _hex_smooth_batch

    grid, res = cfg.grid, cfg.res
    paths = miniworld_paths(cfg.world_dir)

    # page map (hex key)
    urls = pages["url"].to_pylist()
    texts = extract_text_batch(pages["html"].to_pylist())
    lat, lon = geocode_urls(urls)
    cells = latlng_to_hex(lat, lon, hex_res)
    q = quality_stats(pd.Series(texts))
    per_page = pd.DataFrame({"hex_id": cells, "n_tokens": q["n_tokens"],
                             "quality_score": q["quality_score"]})

    # zonal page stats per cell
    g = per_page.groupby("hex_id", sort=True)
    per_cell = pd.DataFrame({
        "hex_id": np.asarray(list(g.groups), dtype=np.int64),
        "n_pages": g.size().to_numpy(),
        "sum_tokens": g["n_tokens"].sum().to_numpy(),
        "mean_quality": (g["quality_score"].sum() / g.size()).to_numpy(),
    })

    # region + covariates + loss at the cell CENTER (decoded from the id —
    # the engine's HexCellFeaturizer rule)
    c_lat, c_lon = hex_to_latlng(per_cell["hex_id"].to_numpy())
    rings, region_ids = load_polygons(paths["polygons"])
    per_cell["region"] = assign_regions(
        np.stack([c_lon, c_lat], axis=1), rings, region_ids)
    tiles = latlon_to_tile(c_lat, c_lon, grid, res)
    registry = RasterRegistry(paths["manifest"], mmap=False)
    for name, vals in registry.gather(tiles, cfg.feature_names).items():
        per_cell[name] = np.nan_to_num(vals, nan=0.0)
    loss_grid, _ = read_raster(paths["loss"], mmap=False)
    per_cell["loss"] = np.nan_to_num(loss_grid.ravel()[tiles - 1], nan=0.0)

    # prediction universe
    universe = per_cell[(per_cell["region"] > 0)
                        & (per_cell["loss"] > 0)].reset_index(drop=True)

    # fit + score (identical training table and CART fits)
    training = build_training_table(cfg.world_dir, grid, res, cfg.feature_names)
    trees, _ = fit_region_trees(training, cfg.feature_names,
                                list(range(1, cfg.num_regions + 1)))
    X = universe[cfg.feature_names].to_numpy(dtype=np.float64)
    region = universe["region"].to_numpy()
    out = np.zeros((len(universe), len(DRIVERS)))
    for (r, d), arrs in trees.items():
        mask = region == r
        if mask.any():
            out[mask, DRIVERS.index(d)] = CartTree.from_arrays(arrs).predict(X[mask])
    for j, d in enumerate(DRIVERS):
        universe[f"out{d}"] = out[:, j]

    # vote + gates
    cls = (out.argmax(axis=1) + 1).astype(np.int64)
    mx = out.max(axis=1)
    cls = np.where(mx < cfg.conf_threshold, 0, cls)
    cls = np.where(universe["loss"].to_numpy() < cfg.loss_threshold, 0, cls)
    universe["class"] = cls
    universe["max_value"] = mx

    # hex k-ring majority smoothing (same kernel as the engine stage)
    ids = universe["hex_id"].to_numpy()
    order = np.argsort(ids, kind="stable")
    universe["class_smoothed"] = _hex_smooth_batch(
        ids, cls, ids[order], cls[order], cfg.smooth_k, 5)

    # final gate + round
    loss = universe["loss"].to_numpy()
    gated = np.where((loss > 0) & (loss < cfg.loss_threshold), 0,
                     universe["class_smoothed"])
    universe["class_final"] = np.round(gated).astype(np.int64)
    return universe.reset_index(drop=True)
