"""Hierarchical global tile grid codec (from scratch, numpy only).

The reference keys every table by ``GoodeR.ID``, an integer cell id over a
fixed 1737x4008 10-km grid where ``GoodeR.ID = (row-1)*4008 + col`` in 1-based
row-major scanline order (reference ``Supplemental_Data_1.R:62-64,117-120``).
We generalize that contract into a hierarchical equirectangular tile index
(H3/S2-style resolution ladder built from scratch — no geo libs exist in this
sandbox):

- A :class:`GridSpec` fixes the base (resolution-0) grid shape and the lat/lon
  extent.  Resolution ``r`` subdivides every cell into ``2^r x 2^r`` children,
  so the res-``r`` grid is ``(nrows << r) x (ncols << r)``.
- ``tile_id`` is **1-based row-major** within its resolution's grid, exactly
  the reference's id<->pixel contract, so raster<->vector conversion stays
  purely positional (``Supplemental_Data_1.R:216-227``).
- ``parent`` / ``children`` walk the ladder by bit shifts on (row, col);
  ``k_ring`` is the Chebyshev-distance-<=k neighborhood clipped at the grid
  edge (the reference's Goode grid does not wrap either).

All functions are vectorized over numpy arrays and deterministic; the
float->index math is written so a SQL oracle can reproduce it bit-for-bit
(plain IEEE double ops in a fixed order, ``floor`` + clamp).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "GridSpec",
    "GOODE_GRID",
    "MINI_GRID",
    "rowcol_to_tile",
    "tile_to_rowcol",
    "latlon_to_rowcol",
    "latlon_to_tile",
    "tile_to_latlon_center",
    "tile_to_parent",
    "tile_to_children",
    "k_ring",
    "k_ring_table",
]


@dataclass(frozen=True)
class GridSpec:
    """Base-resolution grid shape + geographic extent.

    ``nrows``/``ncols`` are the resolution-0 shape; ``shape(res)`` scales by
    ``2^res``.  The extent defaults to the whole globe in degrees; the Goode
    parity grid reuses the same codec with a meters extent (only the *shape*
    matters for the positional id contract).
    """

    nrows: int
    ncols: int
    lat_min: float = -90.0
    lat_max: float = 90.0
    lon_min: float = -180.0
    lon_max: float = 180.0

    def shape(self, res: int = 0) -> tuple[int, int]:
        return (self.nrows << res, self.ncols << res)

    def num_tiles(self, res: int = 0) -> int:
        r, c = self.shape(res)
        return r * c


# Reference analysis grid: 1737 x 4008 10-km cells, interrupted Goode
# homolosine extent in meters (``Supplemental_Data_1.R:54,63-70,177-180``).
GOODE_GRID = GridSpec(
    nrows=1737,
    ncols=4008,
    lat_min=-8683205.0209,
    lat_max=8686794.9791,
    lon_min=-20037506.5671,
    lon_max=20042493.4328,
)

# Mini-world grid used by fixtures, the flagship default and the SQL oracles.
MINI_GRID = GridSpec(nrows=64, ncols=64)


def rowcol_to_tile(row: np.ndarray, col: np.ndarray, grid: GridSpec, res: int = 0) -> np.ndarray:
    """0-based (row, col) -> 1-based row-major tile id (reference contract)."""
    _, ncols = grid.shape(res)
    return (np.asarray(row, dtype=np.int64) * ncols + np.asarray(col, dtype=np.int64) + 1)


def tile_to_rowcol(tile_id: np.ndarray, grid: GridSpec, res: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """1-based tile id -> 0-based (row, col)."""
    _, ncols = grid.shape(res)
    t = np.asarray(tile_id, dtype=np.int64) - 1
    return t // ncols, t % ncols


def latlon_to_rowcol(
    lat: np.ndarray, lon: np.ndarray, grid: GridSpec, res: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized point->cell.  Row 0 is the *north* edge (scanline order).

    The expression order is fixed so the DuckDB oracle reproduces it exactly:
    ``row = min(floor((lat_max - lat) / extent * nrows), nrows - 1)`` etc.
    """
    nrows, ncols = grid.shape(res)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    row = np.floor((grid.lat_max - lat) / (grid.lat_max - grid.lat_min) * nrows)
    col = np.floor((lon - grid.lon_min) / (grid.lon_max - grid.lon_min) * ncols)
    row = np.minimum(np.maximum(row, 0.0), nrows - 1).astype(np.int64)
    col = np.minimum(np.maximum(col, 0.0), ncols - 1).astype(np.int64)
    return row, col


def latlon_to_tile(lat: np.ndarray, lon: np.ndarray, grid: GridSpec, res: int = 0) -> np.ndarray:
    row, col = latlon_to_rowcol(lat, lon, grid, res)
    return rowcol_to_tile(row, col, grid, res)


def tile_to_latlon_center(tile_id: np.ndarray, grid: GridSpec, res: int = 0) -> tuple[np.ndarray, np.ndarray]:
    nrows, ncols = grid.shape(res)
    row, col = tile_to_rowcol(tile_id, grid, res)
    dlat = (grid.lat_max - grid.lat_min) / nrows
    dlon = (grid.lon_max - grid.lon_min) / ncols
    lat = grid.lat_max - (row + 0.5) * dlat
    lon = grid.lon_min + (col + 0.5) * dlon
    return lat, lon


def tile_to_parent(tile_id: np.ndarray, grid: GridSpec, res: int, parent_res: int) -> np.ndarray:
    """Coarsen ids from ``res`` to ``parent_res`` (< res) by bit shifts."""
    if parent_res > res:
        raise ValueError(f"parent_res {parent_res} must be <= res {res}")
    shift = res - parent_res
    row, col = tile_to_rowcol(tile_id, grid, res)
    return rowcol_to_tile(row >> shift, col >> shift, grid, parent_res)


def tile_to_children(tile_id: int, grid: GridSpec, res: int, child_res: int) -> np.ndarray:
    """All child ids of one tile at a finer resolution (sorted ascending)."""
    if child_res < res:
        raise ValueError(f"child_res {child_res} must be >= res {res}")
    shift = child_res - res
    row, col = tile_to_rowcol(np.asarray([tile_id]), grid, res)
    rr = (row[0] << shift) + np.arange(1 << shift, dtype=np.int64)
    cc = (col[0] << shift) + np.arange(1 << shift, dtype=np.int64)
    rows = np.repeat(rr, 1 << shift)
    cols = np.tile(cc, 1 << shift)
    return np.sort(rowcol_to_tile(rows, cols, grid, child_res))


def k_ring(tile_id: int, k: int, grid: GridSpec, res: int = 0) -> np.ndarray:
    """All tile ids with Chebyshev distance <= k, clipped at grid edges.

    Includes the center tile; sorted ascending.  This is the engine analog of
    the reference's manual ArcGIS "Expand" nearest-neighbor step
    (``Supplemental_Data_1.R:445-454``) neighborhood.
    """
    nrows, ncols = grid.shape(res)
    row, col = tile_to_rowcol(np.asarray([tile_id]), grid, res)
    r0, c0 = int(row[0]), int(col[0])
    rr = np.arange(max(0, r0 - k), min(nrows, r0 + k + 1), dtype=np.int64)
    cc = np.arange(max(0, c0 - k), min(ncols, c0 + k + 1), dtype=np.int64)
    rows = np.repeat(rr, len(cc))
    cols = np.tile(cc, len(rr))
    return np.sort(rowcol_to_tile(rows, cols, grid, res))


def k_ring_table(
    tile_ids: np.ndarray, k: int, grid: GridSpec, res: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized k-ring for a batch of tiles.

    Returns ``(center_tile, neighbor_tile, ring)`` arrays where ``ring`` is the
    Chebyshev distance (0..k).  Off-grid neighbors are dropped (edge clip).
    Used by the k-ring smoothing join (SURVEY.md J7).
    """
    nrows, ncols = grid.shape(res)
    tile_ids = np.asarray(tile_ids, dtype=np.int64)
    row, col = tile_to_rowcol(tile_ids, grid, res)
    side = 2 * k + 1
    dr = np.repeat(np.arange(-k, k + 1, dtype=np.int64), side)
    dc = np.tile(np.arange(-k, k + 1, dtype=np.int64), side)
    rings = np.maximum(np.abs(dr), np.abs(dc))
    rr = row[:, None] + dr[None, :]
    cc = col[:, None] + dc[None, :]
    valid = (rr >= 0) & (rr < nrows) & (cc >= 0) & (cc < ncols)
    centers = np.repeat(tile_ids, side * side).reshape(-1, side * side)
    neigh = rr * ncols + cc + 1
    ring = np.broadcast_to(rings, rr.shape)
    return centers[valid], neigh[valid], ring[valid]
