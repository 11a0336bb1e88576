"""Deterministic mini-world fixture: the reference's input universe at 64x64.

Builds, under a directory (idempotent via ``_SUCCESS`` marker):

- ``features/features.json`` + ``<name>.npy``/``.georef.json`` — seeded smooth
  covariate rasters (the reference's 85 GeoTIFFs, ``R_ModelInputs_*Data/``),
  with NaN holes to exercise NA->0 (``Supplemental_Data_1.R:229,270``);
- ``features_fine/`` — 4x finer grids whose zonal mean/max/sum rollups equal
  the coarse features (the ``_10kMean1kMax`` lineage, SURVEY.md A7);
- ``loss.npy`` — per-tile loss fraction in [0,1] with exact boundary values
  0, 0.004999, 0.005, 0.5 planted to pin the reference's ``<0.005`` and
  ``<0.5`` gates (``Supplemental_Data_1.R:382,407,496``);
- ``polygons.npz`` — region polygon rings + ids (the upstream ArcGIS layer
  behind ``GoodeR_Boundaries_Region.csv``);
- ``training_points.parquet`` — (tile_id, training_class 1..7), sparse, with
  classes 6 and 7 present to exercise the ``!= 7`` filter semantics
  (``Supplemental_Data_1.R:205``).

Everything derives from ``seed`` — no ambient randomness.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.grid import MINI_GRID, GridSpec, tile_to_latlon_center
from ..state import geo as geomod
from ..state.raster import GeoRef, write_raster, zonal_downsample

__all__ = ["build_miniworld", "FEATURE_NAMES", "miniworld_paths"]

FEATURE_NAMES = [
    "Fire_FRP_10kMean",
    "TreeCover2000_10kMean",
    "Population_10kSum",
    "CroplandFrac_10kMean",
    "SlopeDeg_10kMax",
    "RoadDist_10kMin",
]

_FINE_FACTOR = 4


def _smooth_field(nrows: int, ncols: int, seed: int, k: int) -> np.ndarray:
    """Deterministic smooth field: sum of a few seeded sinusoid bumps."""
    rng = np.random.default_rng(seed * 1000 + k)
    yy, xx = np.mgrid[0:nrows, 0:ncols]
    y = yy / nrows
    x = xx / ncols
    field = np.zeros((nrows, ncols))
    for _ in range(4):
        fx, fy = rng.uniform(1, 5, 2)
        px, py = rng.uniform(0, 2 * np.pi, 2)
        amp = rng.uniform(0.5, 1.5)
        field += amp * np.sin(2 * np.pi * fx * x + px) * np.cos(2 * np.pi * fy * y + py)
    return field


def miniworld_paths(root: str) -> dict[str, str]:
    return {
        "root": root,
        "manifest": os.path.join(root, "features", "features.json"),
        "fine_manifest": os.path.join(root, "features_fine", "features.json"),
        "loss": os.path.join(root, "loss"),
        "polygons": os.path.join(root, "polygons.npz"),
        "training": os.path.join(root, "training_points.parquet"),
    }


def build_miniworld(
    root: str,
    grid: GridSpec = MINI_GRID,
    num_regions: int = 3,
    seed: int = 42,
) -> dict[str, str]:
    paths = miniworld_paths(root)
    marker = os.path.join(root, "_SUCCESS")
    if os.path.exists(marker):
        return paths
    os.makedirs(os.path.join(root, "features"), exist_ok=True)
    os.makedirs(os.path.join(root, "features_fine"), exist_ok=True)
    nrows, ncols = grid.shape()
    georef = GeoRef.from_grid(grid)
    fine_ref = GeoRef(
        nrows * _FINE_FACTOR, ncols * _FINE_FACTOR,
        grid.lat_min, grid.lat_max, grid.lon_min, grid.lon_max,
    )
    rng = np.random.default_rng(seed)

    # --- covariate rasters: fine first, coarse = zonal rollup of fine -------
    manifest, fine_manifest = [], []
    coarse = {}
    for k, name in enumerate(FEATURE_NAMES):
        fine = _smooth_field(nrows * _FINE_FACTOR, ncols * _FINE_FACTOR, seed, k)
        agg = "max" if name.endswith("Max") else ("min" if name.endswith("Min") else
              ("sum" if name.endswith("Sum") else "mean"))
        cg = zonal_downsample(fine, _FINE_FACTOR, agg)
        # NaN holes in the coarse grid (~2% of cells)
        holes = rng.random(cg.shape) < 0.02
        cg = np.where(holes, np.nan, cg)
        write_raster(os.path.join(root, "features_fine", name), fine, fine_ref)
        write_raster(os.path.join(root, "features", name), cg, georef)
        manifest.append({"name": name, "stem": name})
        fine_manifest.append({"name": name, "stem": name})
        coarse[name] = cg
    with open(paths["manifest"], "w") as f:
        json.dump(manifest, f)
    with open(paths["fine_manifest"], "w") as f:
        json.dump(fine_manifest, f)

    # --- loss raster with planted gate-boundary values ----------------------
    loss = (0.5 + 0.5 * np.tanh(_smooth_field(nrows, ncols, seed, 99))) * 0.6
    loss = np.round(loss, 4)
    flat = loss.ravel()
    plant = rng.choice(flat.size, size=40, replace=False)
    flat[plant[:10]] = 0.0
    flat[plant[10:20]] = 0.004999
    flat[plant[20:30]] = 0.005
    flat[plant[30:]] = 0.5
    write_raster(paths["loss"], loss, georef)

    # --- region polygons ----------------------------------------------------
    rings, ids = geomod.make_region_polygons(
        num_regions, seed=seed, extent=(grid.lon_min, grid.lat_min, grid.lon_max, grid.lat_max)
    )
    np.savez(
        paths["polygons"],
        region_ids=ids,
        num_rings=np.asarray([len(r) for r in rings]),
        coords=np.concatenate(rings, axis=0),
    )

    # --- training points: labels from a deterministic "true" class field ----
    all_tiles = np.arange(1, nrows * ncols + 1, dtype=np.int64)
    lat, lon = tile_to_latlon_center(all_tiles, grid)
    region = geomod.assign_regions(np.stack([lon, lat], axis=1), rings, ids)
    # true class: argmax of 5 seeded linear combos of the features (+ a few 6/7)
    feats = np.stack([np.nan_to_num(coarse[n].ravel()) for n in FEATURE_NAMES], axis=1)
    w = np.random.default_rng(seed + 5).normal(size=(feats.shape[1], 5))
    scores = feats @ w
    true_class = scores.argmax(axis=1) + 1
    in_region = region > 0
    candidates = all_tiles[in_region]
    picks = np.sort(rng.choice(candidates, size=min(220, len(candidates)), replace=False))
    cls = true_class[picks - 1].astype(np.int32)
    # sprinkle deterministic 6s and 7s (other/excluded classes)
    cls[::17] = 6
    cls[::23] = 7
    pq.write_table(
        pa.table({"tile_id": picks, "training_class": cls.astype(np.int32)}),
        paths["training"],
    )

    with open(marker, "w") as f:
        f.write("ok")
    return paths


def load_polygons(path: str) -> tuple[list[np.ndarray], np.ndarray]:
    z = np.load(path)
    rings = []
    off = 0
    for n in z["num_rings"]:
        rings.append(z["coords"][off : off + n])
        off += n
    return rings, z["region_ids"]
