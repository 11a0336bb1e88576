"""Raster <-> table duality: npy grids + georef sidecars, gather, zonal agg.

The reference's core data-model trick is that a raster and an id-keyed column
are interchangeable: rasters are flattened row-major to a ``GoodeR.ID``-indexed
vector (``Supplemental_Data_1.R:216-227``) and columns are written back with
``rastOut`` (``Supplemental_Data_1.R:53-72``).  This module owns that contract:

- **Format** (no GDAL in this sandbox): a raster = ``<name>.npy`` float64 grid
  + ``<name>.georef.json`` sidecar ``{nrows, ncols, lat_min, lat_max, lon_min,
  lon_max, crs}``; a directory + ``features.json`` manifest is a feature set
  (the reference's "schema = directory listing of ``*.tif``",
  ``Supplemental_Data_1.R:142-166``).
- **Gather** (SURVEY.md ST3/M10): :class:`RasterRegistry` memory-maps every
  grid once per actor; one ``map_batches`` pass emits all feature columns by
  positional fancy-indexing ``grid.ravel()[tile_id-1]`` — replacing the
  reference's 85 sequential full-table left joins with O(1) lookups.
- **Zonal aggregation** (SURVEY.md A7): fine-grid -> coarse-tile mean/max/sum
  rollups regenerate the reference's ``<src>_10kMean1kMax``-style variables.
- **Sink** (SURVEY.md S6/R1): assemble a (tile_id, value) table into a dense
  grid in id order, NaN where absent — the ``rastOut`` realign semantics.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np

from ..functions.grid import GridSpec

__all__ = [
    "GeoRef",
    "write_raster",
    "read_raster",
    "RasterRegistry",
    "zonal_downsample",
    "assemble_grid",
    "grid_to_table_arrays",
]


@dataclass(frozen=True)
class GeoRef:
    nrows: int
    ncols: int
    lat_min: float
    lat_max: float
    lon_min: float
    lon_max: float
    crs: str = "EPSG:4326"

    @classmethod
    def from_grid(cls, grid: GridSpec, res: int = 0, crs: str = "EPSG:4326") -> "GeoRef":
        nrows, ncols = grid.shape(res)
        return cls(nrows, ncols, grid.lat_min, grid.lat_max, grid.lon_min, grid.lon_max, crs)


def write_raster(path_stem: str, grid_values: np.ndarray, georef: GeoRef) -> None:
    """Write ``<stem>.npy`` + ``<stem>.georef.json`` atomically (tmp+rename —
    idempotent sink, safe under task retries)."""
    if grid_values.shape != (georef.nrows, georef.ncols):
        raise ValueError(f"grid shape {grid_values.shape} != georef {(georef.nrows, georef.ncols)}")
    tmp = path_stem + ".tmp.npy"
    np.save(tmp, np.ascontiguousarray(grid_values))
    os.replace(tmp, path_stem + ".npy")
    with open(path_stem + ".georef.json.tmp", "w") as f:
        json.dump(asdict(georef), f)
    os.replace(path_stem + ".georef.json.tmp", path_stem + ".georef.json")


def read_raster(path_stem: str, mmap: bool = True) -> tuple[np.ndarray, GeoRef]:
    """Read a raster by stem: ``<stem>.npy`` + georef sidecar, or — when the
    stem names a GeoTIFF (``.tif``/``.tiff`` suffix or a ``<stem>.tif`` file
    exists) — via the pure-python GeoTIFF reader, so ``features.json``
    manifests mix both formats freely (S2 de-stub)."""
    if path_stem.endswith((".tif", ".tiff")):
        from .geotiff import read_geotiff

        return read_geotiff(path_stem)
    if not os.path.exists(path_stem + ".npy") and os.path.exists(path_stem + ".tif"):
        from .geotiff import read_geotiff

        return read_geotiff(path_stem + ".tif")
    vals = np.load(path_stem + ".npy", mmap_mode="r" if mmap else None)
    with open(path_stem + ".georef.json") as f:
        georef = GeoRef(**json.load(f))
    if vals.shape != (georef.nrows, georef.ncols):
        # the reference's dimension validation gate (Supplemental_Data_1.R:174-186)
        raise ValueError(f"{path_stem}: shape {vals.shape} != georef {(georef.nrows, georef.ncols)}")
    return vals, georef


class RasterRegistry:
    """All feature grids of a manifest, memory-mapped once (per actor).

    ``manifest_path`` is a ``features.json``: ``[{"name": ..., "stem": ...}]``
    with stems relative to the manifest's directory.  ``gather(tile_ids)``
    returns ``{name: values}`` via positional lookup (1-based row-major ids,
    the reference contract).  NaN cells pass through; callers impute
    (NA->0, ``Supplemental_Data_1.R:229,270``).
    """

    def __init__(self, manifest_path: str, mmap: bool = True):
        base = os.path.dirname(manifest_path)
        with open(manifest_path) as f:
            entries = json.load(f)
        self.names: list[str] = []
        self.grids: dict[str, np.ndarray] = {}
        self.georef: GeoRef | None = None
        for e in entries:
            vals, ref = read_raster(os.path.join(base, e["stem"]), mmap=mmap)
            if self.georef is None:
                self.georef = ref
            elif (ref.nrows, ref.ncols) != (self.georef.nrows, self.georef.ncols):
                raise ValueError(f"raster {e['name']} shape mismatch within manifest")
            self.names.append(e["name"])
            self.grids[e["name"]] = vals

    def gather(self, tile_ids: np.ndarray, names: list[str] | None = None) -> dict[str, np.ndarray]:
        idx = np.asarray(tile_ids, dtype=np.int64) - 1
        out = {}
        for name in names or self.names:
            out[name] = np.asarray(self.grids[name]).ravel()[idx]
        return out


def zonal_downsample(fine: np.ndarray, factor: int, agg: str) -> np.ndarray:
    """Aggregate a fine grid to a coarse one, ``factor x factor`` cells per
    coarse cell.  ``agg`` in {mean, max, sum, min}; NaN-aware (all-NaN block ->
    NaN).  This regenerates the reference's two-level zonal lineage
    (``Fire_FRP_10kMean1kMax`` = 1-km max then 10-km mean) by chaining calls."""
    nr, nc = fine.shape
    if nr % factor or nc % factor:
        raise ValueError(f"shape {fine.shape} not divisible by factor {factor}")
    blocks = fine.reshape(nr // factor, factor, nc // factor, factor).swapaxes(1, 2)
    flat = blocks.reshape(nr // factor, nc // factor, factor * factor)
    with np.errstate(invalid="ignore"):
        if agg == "mean":
            return np.nanmean(flat, axis=2)
        if agg == "max":
            return np.nanmax(flat, axis=2)
        if agg == "min":
            return np.nanmin(flat, axis=2)
        if agg == "sum":
            return np.nansum(flat, axis=2)
    raise ValueError(f"unknown agg {agg!r}")


def assemble_grid(
    tile_ids: np.ndarray, values: np.ndarray, nrows: int, ncols: int, fill: float = np.nan
) -> np.ndarray:
    """Dense realign: (tile_id, value) -> full grid in scanline order, ``fill``
    where a tile id is absent — the ``rastOut`` join-onto-1..N semantics
    (``Supplemental_Data_1.R:54-64``)."""
    out = np.full(nrows * ncols, fill, dtype=np.float64)
    out[np.asarray(tile_ids, dtype=np.int64) - 1] = values
    return out.reshape(nrows, ncols)


def grid_to_table_arrays(grid_values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`assemble_grid`: grid -> (tile_id, value) arrays in
    scanline order (``as.vector(raster)``, ``Supplemental_Data_1.R:216-218``)."""
    flat = np.asarray(grid_values, dtype=np.float64).ravel()
    return np.arange(1, flat.size + 1, dtype=np.int64), flat
