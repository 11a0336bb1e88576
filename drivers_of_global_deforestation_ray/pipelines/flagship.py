"""Flagship pipeline: pages corpus -> per-tile forest-loss-driver classes.

The engine lifecycle of SURVEY.md §3.4, mapping the reference's 14-stage R
script (``Supplemental_Data_1.R``) onto one streaming Ray Data graph:

  read pages parquet (column-pruned: url, html)
    -> PageFeaturizer        map_batches: extract text (M12), geocode url
                             (ST6), tile-encode (grid codec), token/quality
                             stats — one pass, Arrow in / Arrow out
    -> grouped_agg(tile_id)  zonal page stats (A3/A7): n_pages, sum_tokens,
                             mean_quality — two-phase partial agg, skew-proof
    -> TileFeaturizer        actor pool: region via STRtree PIP on tile
                             centers (ST5/J6), covariate gather from mmap'd
                             rasters (ST3/M10, replaces 85 sequential joins),
                             loss lookup; NA->0 (M6)
    -> filter                region assigned (:274) and loss > 0 (:241)
    -> TreeScorer            actor pool: 35 CART trees broadcast once (ST2)
    -> vote_and_gate         argmax first-wins, 0.5 + 0.005 gates (A5/M9)
    -> kring_smooth          Expand analog (J7), broadcast dense class array
    -> final loss gate       0 < loss < 0.005 -> 0, round (:496-498)
    -> sinks                 partitioned parquet by class (D3), per-class
                             grouped mean loss (A3, :516-521), raster (S6)

Model features are the raster covariates (training parity with the reference,
which trains on raster values at labeled cells); page-derived zonal stats ride
along into the output table.  Training runs driver-side (~200 rows — the
reference agrees, ``:293-342``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
from ray.data import Dataset

from ..functions.extract import extract_text_batch, geocode_urls
from ..functions.grid import MINI_GRID, GridSpec, latlon_to_tile, tile_to_latlon_center
from ..functions.text import quality_stats
from ..sources.miniworld import FEATURE_NAMES, load_polygons, miniworld_paths
from ..state.geo import assign_regions
from ..state.raster import RasterRegistry, assemble_grid, read_raster
from ..stages.relational import grouped_agg
from ..stages.score import fit_region_trees, score_with_trees, vote_and_gate
from ..stages.smooth import kring_smooth

__all__ = ["FlagshipConfig", "run_flagship", "run_flagship_checkpointed",
           "run_flagship_hex", "run_flagship_hex_checkpointed",
           "tiles_to_classes", "hex_cells_to_classes",
           "build_training_table", "page_features_batch"]


@dataclass
class FlagshipConfig:
    world_dir: str
    grid: GridSpec = MINI_GRID
    res: int = 0
    num_regions: int = 3
    conf_threshold: float = 0.5     # Supplemental_Data_1.R:382
    loss_threshold: float = 0.005   # Supplemental_Data_1.R:407,496
    smooth_k: int = 2               # Expand neighborhood depth (J7)
    batch_size: int = 8192
    # "linear" = equirect mini-grid (golden parity); "igh" = true
    # interrupted-Goode placement into a meters-extent grid (north star)
    projection: str = "linear"
    # None -> sized from the cluster at run time: (1, max(2, CPUs//4)) so the
    # two actor pools can't starve the page-map tasks on small clusters
    scorer_concurrency: tuple | None = None
    feature_names: list = field(default_factory=lambda: list(FEATURE_NAMES))


# ---------------------------------------------------------------------------
# stage callables
# ---------------------------------------------------------------------------

def page_features_batch(batch: pa.Table, grid: GridSpec, res: int,
                        projection: str = "linear") -> pa.Table:
    """Stateless page map: html -> text, url -> (lat, lon) -> tile_id, plus
    token/quality stats.  Pure function of the batch (determinism test).

    ``projection="igh"`` places pages through the TRUE interrupted-Goode
    forward transform into a meters-extent grid (the reference's CRS,
    ``Supplemental_Data_1.R:66-70``); ``"linear"`` keeps the equirect
    mini-grid mapping the goldens are pinned to.  Downstream stages are
    projection-agnostic: tile ids key everything, and region polygons live
    in the SAME plane as the grid (igh meters or degrees), exactly like the
    reference's igh-CRS boundary layer."""
    urls = batch["url"].to_pylist()
    texts = extract_text_batch(batch["html"].to_pylist())
    lat, lon = geocode_urls(urls)
    if projection == "igh":
        from ..functions.goode import igh_forward

        x, y = igh_forward(lat, lon)
        tiles = latlon_to_tile(y, x, grid, res)  # grid extent is igh meters
    else:
        tiles = latlon_to_tile(lat, lon, grid, res)
    q = quality_stats(pd.Series(texts))
    return pa.table(
        {
            "url": batch["url"],
            "tile_id": pa.array(tiles, pa.int64()),
            "n_tokens": pa.array(q["n_tokens"], pa.int64()),
            "quality_score": pa.array(q["quality_score"], pa.float64()),
        }
    )


class TileFeaturizer:
    """Actor: region PIP + raster gather + loss lookup for tile-keyed batches.

    State built once per actor from broadcast refs: polygon rings (STRtree-
    backed PIP), the mmap'd raster registry and the loss grid.
    """

    def __init__(self, world_dir: str, grid: GridSpec, res: int, feature_names: list[str]):
        paths = miniworld_paths(world_dir)
        self.grid, self.res = grid, res
        self.feature_names = feature_names
        self.registry = RasterRegistry(paths["manifest"])
        loss_grid, _ = read_raster(paths["loss"])
        self.loss_flat = np.asarray(loss_grid).ravel()
        self.rings, self.region_ids = load_polygons(paths["polygons"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        tiles = batch["tile_id"].to_numpy()
        lat, lon = tile_to_latlon_center(tiles, self.grid, self.res)
        batch["region"] = assign_regions(
            np.stack([lon, lat], axis=1), self.rings, self.region_ids
        )
        feats = self.registry.gather(tiles, self.feature_names)
        for name in self.feature_names:
            batch[name] = np.nan_to_num(feats[name], nan=0.0)  # NA->0 (:229,:270)
        batch["loss"] = np.nan_to_num(self.loss_flat[tiles - 1], nan=0.0)
        return batch


# ---------------------------------------------------------------------------
# training (driver-side, shared with the golden implementation)
# ---------------------------------------------------------------------------

def build_training_table(world_dir: str, grid: GridSpec, res: int = 0,
                         feature_names: list[str] | None = None) -> pd.DataFrame:
    """TrainingPoints -> + region + raster features (the reference's
    ``TrainingPoints_PrimaryData`` build, ``Supplemental_Data_1.R:192-231``)."""
    paths = miniworld_paths(world_dir)
    feature_names = feature_names or list(FEATURE_NAMES)
    tp = pq.read_table(paths["training"]).to_pandas()
    tp["training_id"] = np.arange(1, len(tp) + 1, dtype=np.int64)  # M4 (:192-196)
    tiles = tp["tile_id"].to_numpy()
    lat, lon = tile_to_latlon_center(tiles, grid, res)
    rings, region_ids = load_polygons(paths["polygons"])
    tp["region"] = assign_regions(np.stack([lon, lat], axis=1), rings, region_ids)
    registry = RasterRegistry(paths["manifest"], mmap=False)
    for name, vals in registry.gather(tiles, feature_names).items():
        tp[name] = np.nan_to_num(vals, nan=0.0)
    return tp[tp["region"] > 0].reset_index(drop=True)


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------

def run_flagship(pages: Dataset | str, cfg: FlagshipConfig, out_dir: str | None = None) -> Dataset:
    """Build and return the final per-tile Dataset (lazy until consumed).

    ``pages``: a Dataset or a parquet path; only ``url`` and ``html`` are read
    (prune at the read — the 100 TB corpus never ships ``text``/``warc_ts``
    through this pipeline).
    """
    import ray.data as rd

    if isinstance(pages, str):
        pages = rd.read_parquet(pages, columns=["url", "html"])

    grid, res, proj = cfg.grid, cfg.res, cfg.projection

    # stage 1-2: page map + zonal page stats
    per_page = pages.map_batches(
        lambda b: page_features_batch(b, grid, res, proj),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    per_tile = grouped_agg(
        per_page,
        ["tile_id"],
        _ZONAL_SPECS,
        batch_size=cfg.batch_size,
    )
    return tiles_to_classes(per_tile, cfg, out_dir)


_ZONAL_SPECS = {
    "n_pages": ("url", "count"),
    "sum_tokens": ("n_tokens", "sum"),
    "mean_quality": ("quality_score", "mean"),
}


def _pool_concurrency(cfg: FlagshipConfig) -> tuple:
    if cfg.scorer_concurrency is not None:
        return cfg.scorer_concurrency
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(2, cpus // 4))


def tiles_to_classes(per_tile: Dataset, cfg: FlagshipConfig, out_dir: str | None = None) -> Dataset:
    """Stages 3-8 over the (already aggregated) per-tile table — shared by the
    streaming and the checkpointed flagship runners."""
    grid, res = cfg.grid, cfg.res
    pool_conc = _pool_concurrency(cfg)

    # stage 3: region + covariates + loss (actor pool, state mmap'd once)
    per_tile = per_tile.map_batches(
        TileFeaturizer,
        fn_constructor_kwargs={
            "world_dir": cfg.world_dir, "grid": grid, "res": res,
            "feature_names": cfg.feature_names,
        },
        batch_format="pandas",
        batch_size=cfg.batch_size,
        concurrency=pool_conc,
    )

    # stage 4: prediction universe — region assigned (:274), loss > 0 (:241)
    universe = per_tile.filter(
        expr="region > 0 and loss > 0"
    )

    # stage 5: fit trees driver-side, broadcast, score (ST1/ST2)
    training = build_training_table(cfg.world_dir, grid, res, cfg.feature_names)
    trees, _importance = fit_region_trees(
        training, cfg.feature_names, regions=list(range(1, cfg.num_regions + 1))
    )
    scored = score_with_trees(
        universe, trees, cfg.feature_names,
        concurrency=pool_conc, batch_size=cfg.batch_size,
    )

    # stage 6: vote + confidence/loss gates (A5/M9)
    voted = vote_and_gate(scored, "loss", cfg.conf_threshold, cfg.loss_threshold)

    # stage 7: Expand-analog smoothing (J7)
    smoothed = kring_smooth(voted, grid, res, cfg.smooth_k)

    # stage 8: final loss gate + round (:496-498): 0 < loss < t -> 0
    def _final(batch: pd.DataFrame) -> pd.DataFrame:
        loss = batch["loss"].to_numpy()
        cls = batch["class_smoothed"].to_numpy()
        gated = np.where((loss > 0) & (loss < cfg.loss_threshold), 0, cls)
        batch["class_final"] = np.round(gated).astype(np.int64)
        return batch

    final = smoothed.map_batches(_final, batch_format="pandas")

    if out_dir is not None:
        final.write_parquet(os.path.join(out_dir, "classes"), partition_cols=["class_final"])
    return final


def hex_page_features_batch(batch: pa.Table, hex_res: int) -> pa.Table:
    """Stateless page map for the hex-keyed flagship: html -> text, url ->
    (lat, lon) -> aperture-7 hex cell (the north star's "assign every record
    to a 10-km analysis tile via batched H3 encoding")."""
    from ..functions.hexgrid import latlng_to_hex

    texts = extract_text_batch(batch["html"].to_pylist())
    lat, lon = geocode_urls(batch["url"].to_pylist())
    q = quality_stats(pd.Series(texts))
    return pa.table(
        {
            "url": batch["url"],
            "hex_id": pa.array(latlng_to_hex(lat, lon, hex_res), pa.int64()),
            "n_tokens": pa.array(q["n_tokens"], pa.int64()),
            "quality_score": pa.array(q["quality_score"], pa.float64()),
        }
    )


class HexCellFeaturizer:
    """Actor: region PIP + raster gather + loss lookup for HEX-keyed batches.

    The raster<->vector bridge: each hex cell's spherical center (decoded
    from the id) is projected to the covariate grid's (lat, lon) frame, PIP-
    assigned against the polygon layer, and the grid tile under the center
    supplies the raster covariates and loss — the same center-sampling rule
    the grid flagship uses, re-keyed to the hexagonal index.
    """

    def __init__(self, world_dir: str, grid: GridSpec, res: int, feature_names: list[str]):
        paths = miniworld_paths(world_dir)
        self.grid, self.res = grid, res
        self.feature_names = feature_names
        self.registry = RasterRegistry(paths["manifest"])
        loss_grid, _ = read_raster(paths["loss"])
        self.loss_flat = np.asarray(loss_grid).ravel()
        self.rings, self.region_ids = load_polygons(paths["polygons"])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hexgrid import hex_to_latlng

        lat, lon = hex_to_latlng(batch["hex_id"].to_numpy())
        batch["region"] = assign_regions(
            np.stack([lon, lat], axis=1), self.rings, self.region_ids
        )
        tiles = latlon_to_tile(lat, lon, self.grid, self.res)
        feats = self.registry.gather(tiles, self.feature_names)
        for name in self.feature_names:
            batch[name] = np.nan_to_num(feats[name], nan=0.0)
        batch["loss"] = np.nan_to_num(self.loss_flat[tiles - 1], nan=0.0)
        return batch


def run_flagship_hex(
    pages: Dataset | str,
    cfg: FlagshipConfig,
    hex_res: int = 2,
    out_dir: str | None = None,
) -> Dataset:
    """The north-star pipeline keyed by the aperture-7 hexagonal index
    (`functions/hexgrid.py`) instead of the positional grid: batched hex
    encode -> zonal page stats per cell -> STRtree PIP + raster gather at
    cell centers -> CART driver classifier -> vote/gates -> HEX K-RING
    majority smoothing (`stages/smooth.hex_majority_smooth`) -> final gate.

    ``hex_res=2`` matches the miniworld's 64x64 grid pitch (~2.8 deg); the
    100-TB configuration is res 5 (~10-km cells ≈ H3 res 5).  Stages reuse
    the grid flagship's actors and gates 1:1 — only the key (hex id vs
    positional tile id) and the smoothing lattice change, which is the point:
    the engine's tiling contract is pluggable.
    """
    import ray.data as rd

    if isinstance(pages, str):
        pages = rd.read_parquet(pages, columns=["url", "html"])

    per_cell = grouped_agg(
        pages.map_batches(
            lambda b: hex_page_features_batch(b, hex_res),
            batch_format="pyarrow", batch_size=cfg.batch_size,
        ),
        ["hex_id"], _ZONAL_SPECS_HEX,
        batch_size=cfg.batch_size,
    )
    return hex_cells_to_classes(per_cell, cfg, out_dir)


_ZONAL_SPECS_HEX = {
    "n_pages": ("url", "count"),
    "sum_tokens": ("n_tokens", "sum"),
    "mean_quality": ("quality_score", "mean"),
}


def hex_cells_to_classes(per_cell: Dataset, cfg: FlagshipConfig,
                         out_dir: str | None = None) -> Dataset:
    """Hex tail (featurize -> score -> vote -> HEX k-ring smooth -> gate),
    shared by the streaming and the checkpointed hex runners — the hex
    analogue of :func:`tiles_to_classes`."""
    from ..stages.smooth import hex_majority_smooth

    grid, res = cfg.grid, cfg.res
    pool_conc = _pool_concurrency(cfg)
    per_cell = per_cell.map_batches(
        HexCellFeaturizer,
        fn_constructor_kwargs={
            "world_dir": cfg.world_dir, "grid": grid, "res": res,
            "feature_names": cfg.feature_names,
        },
        batch_format="pandas", batch_size=cfg.batch_size, concurrency=pool_conc,
    )
    universe = per_cell.filter(expr="region > 0 and loss > 0")

    training = build_training_table(cfg.world_dir, grid, res, cfg.feature_names)
    trees, _importance = fit_region_trees(
        training, cfg.feature_names, regions=list(range(1, cfg.num_regions + 1))
    )
    scored = score_with_trees(
        universe, trees, cfg.feature_names,
        concurrency=pool_conc, batch_size=cfg.batch_size,
    )
    voted = vote_and_gate(scored, "loss", cfg.conf_threshold, cfg.loss_threshold)
    smoothed = hex_majority_smooth(voted, cfg.smooth_k, id_col="hex_id")

    def _final(batch: pd.DataFrame) -> pd.DataFrame:
        loss = batch["loss"].to_numpy()
        cls = batch["class_smoothed"].to_numpy()
        gated = np.where((loss > 0) & (loss < cfg.loss_threshold), 0, cls)
        batch["class_final"] = np.round(gated).astype(np.int64)
        return batch

    final = smoothed.map_batches(_final, batch_format="pandas")
    if out_dir is not None:
        final.write_parquet(os.path.join(out_dir, "classes"), partition_cols=["class_final"])
    return final


def run_flagship_hex_checkpointed(
    pages_dir: str,
    cfg: FlagshipConfig,
    ckpt_root: str,
    hex_res: int = 2,
    num_shards: int = 8,
    out_dir: str | None = None,
) -> Dataset:
    """Resumable hex-keyed flagship: identical shape to
    :func:`run_flagship_checkpointed` (per-shard page stage writes
    CELL-LEVEL partial aggregates + lineage manifest; a rerun skips
    complete shards; partials are associative so the combine is exact) —
    only the tiling key and the smoothing lattice differ."""
    import glob

    import ray.data as rd

    from ..sources.checkpoint import StageCheckpoint, shard_files
    from ..stages.relational import grouped_agg_final, grouped_agg_partial

    def _stage(files: list[str]) -> Dataset:
        nblocks = max(8, sum(os.path.getsize(f) for f in files) // (8 << 20))
        per_page = rd.read_parquet(
            files, columns=["url", "html"], override_num_blocks=int(nblocks)
        ).map_batches(
            lambda b: hex_page_features_batch(b, hex_res),
            batch_format="pyarrow", batch_size=cfg.batch_size,
        )
        return grouped_agg_partial(per_page, ["hex_id"], _ZONAL_SPECS_HEX, cfg.batch_size)

    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    ckpt = StageCheckpoint(ckpt_root, "page_hex_cells")
    ckpt.run(shard_files(files, num_shards), _stage)

    partials = rd.read_parquet(ckpt.output_files())
    per_cell = grouped_agg_final(partials, ["hex_id"], _ZONAL_SPECS_HEX)
    return hex_cells_to_classes(per_cell, cfg, out_dir)


def run_flagship_checkpointed(
    pages_dir: str,
    cfg: FlagshipConfig,
    ckpt_root: str,
    num_shards: int = 8,
    out_dir: str | None = None,
    bucket_final: bool = False,
    num_buckets: int = 32,
) -> Dataset:
    """Resumable flagship (north rule: per-partition lineage + metrics).

    The page-heavy stage (scan -> extract -> geocode -> tile -> PARTIAL zonal
    agg) runs per input-file shard through :class:`StageCheckpoint` — each
    shard writes compact tile-level partials under
    ``<ckpt_root>/page_tiles/part=<i>/`` with a ``_manifest.jsonl`` line
    (fingerprint, rows, bytes, wall, rows/s).  A re-run skips complete shards
    (kill the driver mid-corpus, rerun, only unfinished shards execute).
    Partial aggregates are associative, so the final combine over checkpoint
    files is exact.  The tile-level tail (featurize -> score -> vote ->
    smooth) is orders of magnitude cheaper than the page scan and recomputes.

    ``bucket_final=True`` adopts the BUCKETED layout (``stages/bucketed.py``)
    for the waist: each shard tags its partials with
    ``__bucket = bucket_of(tile_id)`` and the checkpoint hive-partitions by
    it, so the final combine reads one bucket ACROSS shards per task and
    finalizes locally (:func:`~..stages.bucketed.bucketed_final_agg`) —
    the ``grouped_agg_final`` all-to-all exchange is gone; the one
    persisted layout serves both resume AND the co-located combine.
    Result-identical to the shuffle path (parity pytest + recorded hash)."""
    import glob

    import ray.data as rd

    from ..sources.checkpoint import StageCheckpoint, shard_files
    from ..stages.relational import grouped_agg_final, grouped_agg_partial

    grid, res, proj = cfg.grid, cfg.res, cfg.projection

    def _stage(files: list[str]) -> Dataset:
        # a shard is often ONE file: force block splitting or the fused
        # read->map runs as a single near-serial task (~8 MB per block)
        nblocks = max(8, sum(os.path.getsize(f) for f in files) // (8 << 20))
        per_page = rd.read_parquet(
            files, columns=["url", "html"], override_num_blocks=int(nblocks)
        ).map_batches(
            lambda b: page_features_batch(b, grid, res, proj),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )
        partials = grouped_agg_partial(per_page, ["tile_id"], _ZONAL_SPECS,
                                       cfg.batch_size)
        if not bucket_final:
            return partials
        from ..stages.bucketed import bucket_of

        def _tag(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            df["__bucket"] = bucket_of(df["tile_id"].to_numpy(), num_buckets)
            return df

        return partials.map_batches(_tag, batch_format="pandas")

    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    if bucket_final:
        ckpt = StageCheckpoint(ckpt_root, f"page_tiles_b{num_buckets}",
                               partition_cols=["__bucket"])
    else:
        ckpt = StageCheckpoint(ckpt_root, "page_tiles")
    ckpt.run(shard_files(files, num_shards), _stage)

    if bucket_final:
        from ..stages.bucketed import bucketed_final_agg

        per_tile = bucketed_final_agg(
            ckpt.files_by_partition_value("__bucket"),
            ["tile_id"], _ZONAL_SPECS)
    else:
        partials = rd.read_parquet(ckpt.output_files())
        per_tile = grouped_agg_final(partials, ["tile_id"], _ZONAL_SPECS)
    return tiles_to_classes(per_tile, cfg, out_dir)


def per_class_loss_means(final: Dataset) -> Dataset:
    """Per-class grouped mean loss (``Supplemental_Data_1.R:516-521``)."""
    return grouped_agg(final, ["class_final"], {
        "loss_mean": ("loss", "mean"),
        "n_tiles": ("tile_id", "count"),
    })


def class_raster(final_df: pd.DataFrame, grid: GridSpec, res: int = 0) -> np.ndarray:
    """Dense class grid in id order, NaN where no tile (rastOut, S6)."""
    nrows, ncols = grid.shape(res)
    return assemble_grid(
        final_df["tile_id"].to_numpy(), final_df["class_final"].to_numpy(), nrows, ncols
    )
