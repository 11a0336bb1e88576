"""k-ring nearest-neighbor class smoothing (the ArcGIS "Expand" analog).

The reference pauses mid-pipeline for a human to run ArcGIS Expand — grow
classified cells into unclassified (class 0) neighbors
(``Supplemental_Data_1.R:445-454``) — then re-imports the raster (``:484``).
This stage internalizes it with *documented deterministic* tie-breaks
(ArcGIS's are unspecified, SURVEY.md J7):

for each class-0 tile, scan rings r = 1..k (Chebyshev distance, edge-clipped);
at the FIRST ring containing any classified neighbor, take the MAJORITY class,
ties -> LOWEST class id.  Tiles with no classified neighbor within k stay 0.

Implementation: the per-tile class vector for the whole grid is dense int8 —
7 MB even at the reference's 6.96M-cell grid — so it is ``ray.put`` ONCE and
every ``map_batches`` task smooths its batch against the shared dense array
with vectorized neighbor gathers.  No shuffle, no per-batch re-ship.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from ..functions.grid import GridSpec

__all__ = ["dense_class_array", "smooth_batch", "kring_smooth",
           "hex_majority_smooth"]


def dense_class_array(tile_ids: np.ndarray, classes: np.ndarray, num_tiles: int) -> np.ndarray:
    """(tile_id, class) -> dense int8 vector indexed by tile_id-1; 0 = unclassified."""
    dense = np.zeros(num_tiles, dtype=np.int8)
    dense[np.asarray(tile_ids, dtype=np.int64) - 1] = np.asarray(classes, dtype=np.int8)
    return dense


def smooth_batch(
    tile_ids: np.ndarray,
    classes: np.ndarray,
    dense: np.ndarray,
    grid: GridSpec,
    res: int,
    k: int,
    num_classes: int = 5,
) -> np.ndarray:
    """Vectorized smoothing of one batch against the dense class vector."""
    nrows, ncols = grid.shape(res)
    out = np.asarray(classes, dtype=np.int64).copy()
    todo = out == 0
    if not todo.any() or k <= 0:
        return out
    rows = (np.asarray(tile_ids[todo], dtype=np.int64) - 1) // ncols
    cols = (np.asarray(tile_ids[todo], dtype=np.int64) - 1) % ncols
    result = np.zeros(len(rows), dtype=np.int64)
    unresolved = np.ones(len(rows), dtype=bool)
    for ring in range(1, k + 1):
        if not unresolved.any():
            break
        # ring offsets at exact Chebyshev distance `ring`
        d = np.arange(-ring, ring + 1, dtype=np.int64)
        dr = np.concatenate([np.full(2 * ring + 1, -ring), np.full(2 * ring + 1, ring),
                             d[1:-1], d[1:-1]])
        dc = np.concatenate([d, d, np.full(2 * ring - 1, -ring), np.full(2 * ring - 1, ring)])
        ur = np.nonzero(unresolved)[0]
        rr = rows[ur][:, None] + dr[None, :]
        cc = cols[ur][:, None] + dc[None, :]
        valid = (rr >= 0) & (rr < nrows) & (cc >= 0) & (cc < ncols)
        idx = np.where(valid, rr * ncols + cc, 0)
        ncls = np.where(valid, dense[idx], 0).astype(np.int64)
        # majority vote per row over classes 1..num_classes; ties -> lowest id
        counts = np.zeros((len(ur), num_classes + 1), dtype=np.int64)
        for c in range(1, num_classes + 1):
            counts[:, c] = (ncls == c).sum(axis=1)
        has = counts[:, 1:].sum(axis=1) > 0
        winner = counts[:, 1:].argmax(axis=1) + 1  # argmax = first max = lowest class
        result[ur[has]] = winner[has]
        unresolved[ur[has]] = False
    out_vals = out[todo]
    out_vals[:] = np.where(result > 0, result, 0)
    out[todo] = out_vals
    return out


def kring_smooth(
    ds: Dataset,
    grid: GridSpec,
    res: int,
    k: int,
    tile_col: str = "tile_id",
    class_col: str = "class",
    out_col: str = "class_smoothed",
) -> Dataset:
    """Dataset combinator: needs the full (tile_id, class) map, which is tiny
    per tile (int8) — collected once, broadcast once (see module docstring).

    ``ds`` is consumed twice (the dense-map collect and the smoothing pass),
    so it is materialized first — otherwise the whole upstream pipeline
    (pages scan -> extract -> zonal agg -> featurize -> score) would execute
    twice.  The materialized set is tile-level (<= num_tiles rows), orders of
    magnitude smaller than the page corpus, so pinning it in the object store
    is safe even at full scale."""
    ds = ds.materialize()
    num_tiles = grid.num_tiles(res)
    pairs = ds.select_columns([tile_col, class_col]).to_pandas()
    dense = dense_class_array(pairs[tile_col].to_numpy(), pairs[class_col].to_numpy(), num_tiles)
    dense_ref = ray.put(dense)

    def _smooth(batch: pd.DataFrame) -> pd.DataFrame:
        dn = ray.get(dense_ref)
        batch[out_col] = smooth_batch(
            batch[tile_col].to_numpy(), batch[class_col].to_numpy(), dn, grid, res, k
        )
        return batch

    return ds.map_batches(_smooth, batch_format="pandas")


def _hex_smooth_batch(
    ids: np.ndarray,
    classes: np.ndarray,
    known_ids: np.ndarray,
    known_cls: np.ndarray,
    k: int,
    num_classes: int,
) -> np.ndarray:
    """Vectorized hex k-ring majority smoothing of one batch against the
    broadcast sorted (cell id, class) map.

    Deterministic SQL-reproducible rule (mirrors :func:`smooth_batch` on the
    hex lattice): for each class-0 cell, rings r = 1..k in order; neighbors
    of ring r are the DISTINCT geometric re-encodes of that ring's offsets
    excluding the home id (seam clipping can collapse offsets); at the FIRST
    ring containing any classified neighbor take the majority class, ties ->
    lowest class id.
    """
    from ..functions.hexgrid import hex_k_ring

    out = np.asarray(classes, dtype=np.int64).copy()
    todo = np.nonzero(out == 0)[0]
    if len(todo) == 0 or k <= 0 or len(known_ids) == 0:
        return out
    home = np.asarray(ids, dtype=np.int64)[todo]
    disk = hex_k_ring(home, k)  # (n0, 1 + 3k(k+1)), ring-major columns
    unresolved = np.ones(len(todo), dtype=bool)
    for ring in range(1, k + 1):
        if not unresolved.any():
            break
        lo, hi = 1 + 3 * (ring - 1) * ring, 1 + 3 * ring * (ring + 1)
        ur = np.nonzero(unresolved)[0]
        members = disk[ur, lo:hi]                       # (m, 6*ring)
        row = np.repeat(ur, hi - lo)
        mem = members.ravel()
        keep = mem != home[ur].repeat(hi - lo)          # exclude home (seams)
        row, mem = row[keep], mem[keep]
        # distinct (row, member): sort the composite, drop adjacent repeats
        order = np.lexsort((mem, row))
        row, mem = row[order], mem[order]
        first = np.ones(len(row), dtype=bool)
        first[1:] = (row[1:] != row[:-1]) | (mem[1:] != mem[:-1])
        row, mem = row[first], mem[first]
        # class lookup in the broadcast sorted map (missing -> 0)
        pos = np.clip(np.searchsorted(known_ids, mem), 0, len(known_ids) - 1)
        cls = np.where(known_ids[pos] == mem, known_cls[pos], 0).astype(np.int64)
        cls = np.where((cls >= 1) & (cls <= num_classes), cls, 0)
        counts = np.zeros((len(todo), num_classes + 1), dtype=np.int64)  # fresh per ring
        np.add.at(counts, (row, cls), 1)
        has = counts[ur, 1:].sum(axis=1) > 0
        winner = counts[ur, 1:].argmax(axis=1) + 1      # first max = lowest class
        out[todo[ur[has]]] = winner[has]
        unresolved[ur[has]] = False
    return out


def hex_majority_smooth(
    ds: Dataset,
    k: int,
    id_col: str = "hex_id",
    class_col: str = "class",
    out_col: str = "class_smoothed",
    num_classes: int = 5,
) -> Dataset:
    """The north star's "H3 k-ring kNN smoothing" on the aperture-7 hex
    index (`functions/hexgrid.py`): grow classified cells into class-0
    neighbors, ring by ring, majority with lowest-class tie-break.

    Same broadcast shape as :func:`kring_smooth`: the (cell id, class) map
    is cell-level — bounded by the grid (~2M cells globally at res 5), not
    the corpus — so it is collected once into two sorted numpy arrays,
    ``ray.put`` once, and every batch smooths against it with vectorized
    ``searchsorted`` lookups.  No shuffle; neighbor ids come from geometric
    re-encode, so smoothing is seam-correct across icosahedron faces.
    ``ds`` is materialized first (consumed twice; cell-level, bounded)."""
    ds = ds.materialize()
    pairs = ds.select_columns([id_col, class_col]).to_pandas()
    known_ids = pairs[id_col].to_numpy(dtype=np.int64)
    known_cls = pairs[class_col].to_numpy(dtype=np.int64)
    order = np.argsort(known_ids, kind="stable")
    known_ref = ray.put((known_ids[order], known_cls[order]))

    def _smooth(batch: pd.DataFrame) -> pd.DataFrame:
        kid, kcl = ray.get(known_ref)
        batch[out_col] = _hex_smooth_batch(
            batch[id_col].to_numpy(), batch[class_col].to_numpy(),
            kid, kcl, k, num_classes,
        )
        return batch

    return ds.map_batches(_smooth, batch_format="pandas")
