"""From-scratch planar geometry: STR-packed rectangle tree + point-in-polygon.

The reference consumes region membership as a precomputed CSV
(``GoodeR_Boundaries_Region.csv``, ``Supplemental_Data_1.R:112``) produced
upstream in ArcGIS; this engine owns that step (SURVEY.md ST5/J6): region
polygons are broadcast once (``ray.put``), every worker builds the STRtree in
``__init__``, and ``map_batches`` assigns a ``region`` column via candidate
lookup + exact even-odd ray-crossing PIP.

No shapely/rtree exist in this sandbox — both structures are numpy-native:

- :class:`STRtree` — classic Sort-Tile-Recursive bulk packing (Leutenegger et
  al. 1997): leaves of capacity ``cap`` packed in x-slabs sorted by y, parents
  packed recursively.  Query is an iterative bbox-overlap descent.
- :func:`points_in_polygon` — even-odd crossing number, vectorized over the
  point batch per edge (edges are few, points are many).

Simple rings only (no holes); multiple polygons may share a region id
(multi-part regions).  Containment ties (overlapping polygons) resolve to the
lowest region id — documented deterministic tie-break.
"""

from __future__ import annotations

import numpy as np

__all__ = ["STRtree", "points_in_polygon", "assign_regions", "make_region_polygons"]


def points_in_polygon(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test.  ``pts``: (M,2); ``ring``: (N,2) closed or open.

    Points exactly on an edge may land on either side (standard crossing-number
    caveat); fixtures avoid on-edge points, and tile *centers* (offset by half
    a cell) never sit on fixture polygon edges.
    """
    x = pts[:, 0]
    y = pts[:, 1]
    rx = ring[:, 0]
    ry = ring[:, 1]
    if rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    n = len(rx)
    inside = np.zeros(len(pts), dtype=bool)
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = rx[i], ry[i], rx[j], ry[j]
        cond = (yi > y) != (yj > y)
        if cond.any():
            xint = (xj - xi) * (y - yi) / (yj - yi) + xi
            inside ^= cond & (x < xint)
        j = i
    return inside


class STRtree:
    """Sort-Tile-Recursive packed rectangle tree over item bboxes.

    Stored as flat numpy level arrays: ``levels[0]`` are leaf-node bounds,
    the last level is the root.  ``query_point`` / ``query_rect`` return item
    indices whose bbox contains/overlaps the probe.
    """

    def __init__(self, bounds: np.ndarray, cap: int = 10):
        # bounds: (n, 4) as (xmin, ymin, xmax, ymax)
        self.item_bounds = np.asarray(bounds, dtype=np.float64)
        self.cap = cap
        n = len(self.item_bounds)
        self.levels: list[tuple[np.ndarray, np.ndarray]] = []  # (node_bounds, child_slices)
        self.leaf_items = self._pack(np.arange(n))

    def _str_order(self, bounds: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """STR ordering of ``idx``: x-slabs of ~sqrt(ceil(n/cap)) slices, each
        sorted by center-y."""
        n = len(idx)
        cx = (bounds[idx, 0] + bounds[idx, 2]) / 2
        cy = (bounds[idx, 1] + bounds[idx, 3]) / 2
        nleaf = -(-n // self.cap)
        nslabs = max(1, int(np.ceil(np.sqrt(nleaf))))
        slab_size = -(-n // nslabs)
        by_x = idx[np.argsort(cx, kind="stable")]
        out = []
        for s in range(0, n, slab_size):
            slab = by_x[s : s + slab_size]
            sy = (bounds[slab, 1] + bounds[slab, 3]) / 2
            out.append(slab[np.argsort(sy, kind="stable")])
        return np.concatenate(out) if out else idx

    def _pack(self, item_idx: np.ndarray) -> np.ndarray:
        ordered = self._str_order(self.item_bounds, item_idx)
        # leaf level: groups of cap consecutive items
        cur_bounds = []
        cur_children = []  # (start, stop) into `ordered` for leaves
        for s in range(0, len(ordered), self.cap):
            grp = ordered[s : s + self.cap]
            b = self.item_bounds[grp]
            cur_bounds.append([b[:, 0].min(), b[:, 1].min(), b[:, 2].max(), b[:, 3].max()])
            cur_children.append([s, s + len(grp)])
        node_bounds = np.asarray(cur_bounds, dtype=np.float64).reshape(-1, 4)
        self.levels.append((node_bounds, np.asarray(cur_children, dtype=np.int64)))
        # upper levels: pack node bboxes of the previous level
        while len(self.levels[-1][0]) > 1:
            prev_bounds = self.levels[-1][0]
            order = self._str_order(prev_bounds, np.arange(len(prev_bounds)))
            nb, nc = [], []
            for s in range(0, len(order), self.cap):
                grp = order[s : s + self.cap]
                b = prev_bounds[grp]
                nb.append([b[:, 0].min(), b[:, 1].min(), b[:, 2].max(), b[:, 3].max()])
                nc.append(grp)
            # store child index lists (ragged) as object array
            self.levels.append(
                (np.asarray(nb, dtype=np.float64).reshape(-1, 4), np.asarray(nc, dtype=object))
            )
        return ordered

    def query_point(self, x: float, y: float) -> np.ndarray:
        """Item indices whose bbox contains (x, y)."""
        if len(self.item_bounds) == 0:
            return np.empty(0, dtype=np.int64)
        top = len(self.levels) - 1
        nodes = [np.arange(len(self.levels[top][0]))]
        frontier = nodes[0]
        for lvl in range(top, 0, -1):
            bounds, children = self.levels[lvl]
            hit = frontier[
                (bounds[frontier, 0] <= x)
                & (bounds[frontier, 2] >= x)
                & (bounds[frontier, 1] <= y)
                & (bounds[frontier, 3] >= y)
            ]
            if len(hit) == 0:
                return np.empty(0, dtype=np.int64)
            frontier = np.concatenate([np.asarray(children[h], dtype=np.int64) for h in hit])
        bounds, leaf_slices = self.levels[0]
        hit = frontier[
            (bounds[frontier, 0] <= x)
            & (bounds[frontier, 2] >= x)
            & (bounds[frontier, 1] <= y)
            & (bounds[frontier, 3] >= y)
        ]
        if len(hit) == 0:
            return np.empty(0, dtype=np.int64)
        items = np.concatenate([self.leaf_items[s:e] for s, e in leaf_slices[hit]])
        ib = self.item_bounds[items]
        mask = (ib[:, 0] <= x) & (ib[:, 2] >= x) & (ib[:, 1] <= y) & (ib[:, 3] >= y)
        return np.sort(items[mask])

    def query_rect(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        """Item indices whose bbox overlaps the rect."""
        if len(self.item_bounds) == 0:
            return np.empty(0, dtype=np.int64)
        top = len(self.levels) - 1
        frontier = np.arange(len(self.levels[top][0]))
        for lvl in range(top, 0, -1):
            bounds, children = self.levels[lvl]
            hit = frontier[
                (bounds[frontier, 0] <= xmax)
                & (bounds[frontier, 2] >= xmin)
                & (bounds[frontier, 1] <= ymax)
                & (bounds[frontier, 3] >= ymin)
            ]
            if len(hit) == 0:
                return np.empty(0, dtype=np.int64)
            frontier = np.concatenate([np.asarray(children[h], dtype=np.int64) for h in hit])
        bounds, leaf_slices = self.levels[0]
        hit = frontier[
            (bounds[frontier, 0] <= xmax)
            & (bounds[frontier, 2] >= xmin)
            & (bounds[frontier, 1] <= ymax)
            & (bounds[frontier, 3] >= ymin)
        ]
        if len(hit) == 0:
            return np.empty(0, dtype=np.int64)
        items = np.concatenate([self.leaf_items[s:e] for s, e in leaf_slices[hit]])
        ib = self.item_bounds[items]
        mask = (ib[:, 0] <= xmax) & (ib[:, 2] >= xmin) & (ib[:, 1] <= ymax) & (ib[:, 3] >= ymin)
        return np.sort(items[mask])


def polygon_bounds(rings: list[np.ndarray]) -> np.ndarray:
    return np.asarray(
        [[r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()] for r in rings],
        dtype=np.float64,
    ).reshape(-1, 4)


def _assign_linear(pts: np.ndarray, rings: list[np.ndarray],
                   region_ids: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Small-P path: iterate polygons, vectorized bbox mask + PIP over the
    whole point batch.  O(P) full numpy passes — fine for a handful of
    polygons, wrong at country/ecoregion scale (100s-1000s)."""
    out = np.full(len(pts), -1, dtype=np.int64)
    order = np.argsort(region_ids, kind="stable")  # lowest region id wins
    for pi in order:
        b = bounds[pi]
        cand = (
            (pts[:, 0] >= b[0]) & (pts[:, 0] <= b[2]) & (pts[:, 1] >= b[1]) & (pts[:, 1] <= b[3])
        ) & (out == -1)
        if not cand.any():
            continue
        idx = np.nonzero(cand)[0]
        hit = points_in_polygon(pts[idx], rings[pi])
        out[idx[hit]] = region_ids[pi]
    return out


def assign_regions(
    pts: np.ndarray,
    rings: list[np.ndarray],
    region_ids: np.ndarray,
    tree: STRtree | None = None,
    cell_bits: int = 5,
    linear_threshold: int = 16,
) -> np.ndarray:
    """Assign each point the region id of the containing polygon (lowest id on
    overlap), -1 if none.

    Two strategies, chosen by polygon count:

    - ``P <= linear_threshold``: per-polygon vectorized pass (no tree needed).
    - ``P > linear_threshold``: batched STRtree descent — points are binned
      into a ``2^cell_bits x 2^cell_bits`` grid over the batch extent, ONE
      ``query_rect`` per occupied cell culls the polygon set to the few whose
      bbox overlaps that cell, then the vectorized PIP runs per (cell,
      candidate).  Cost is O(occupied_cells x avg_candidates) numpy passes
      instead of O(P) full-batch passes, so runtime grows with the LOCAL
      polygon density, not the global polygon count.

    ``tree`` may be prebuilt by an actor's ``__init__`` (the flagship
    featurizer does); when ``None`` and the tree path is taken, it is built
    here from the ring bboxes (cheap: STR bulk pack, no geometry copies).
    Ties (overlapping polygons) resolve to the lowest region id on both
    paths — identical, deterministic output.
    """
    region_ids = np.asarray(region_ids, dtype=np.int64)
    bounds = polygon_bounds(rings)
    if len(pts) == 0:
        return np.full(0, -1, dtype=np.int64)
    if len(rings) <= linear_threshold:
        return _assign_linear(pts, rings, region_ids, bounds)
    if tree is None:
        tree = STRtree(bounds)
    n_cells = 1 << cell_bits
    x, y = pts[:, 0], pts[:, 1]
    xmin, xmax = float(x.min()), float(x.max())
    ymin, ymax = float(y.min()), float(y.max())
    dx = (xmax - xmin) / n_cells or 1.0
    dy = (ymax - ymin) / n_cells or 1.0
    cx = np.minimum(((x - xmin) / dx).astype(np.int64), n_cells - 1)
    cy = np.minimum(((y - ymin) / dy).astype(np.int64), n_cells - 1)
    cell = cx * n_cells + cy
    order = np.argsort(cell, kind="stable")
    sorted_cells = cell[order]
    uniq, starts = np.unique(sorted_cells, return_index=True)
    ends = np.concatenate((starts[1:], [len(order)]))
    out = np.full(len(pts), -1, dtype=np.int64)
    for c, s, e in zip(uniq, starts, ends):
        gx, gy = c // n_cells, c % n_cells
        cand = tree.query_rect(xmin + gx * dx, ymin + gy * dy,
                               xmin + (gx + 1) * dx, ymin + (gy + 1) * dy)
        if len(cand) == 0:
            continue
        idx = order[s:e]
        sub = pts[idx]
        # ascending region id so the first (lowest) winner sticks
        for pi in cand[np.argsort(region_ids[cand], kind="stable")]:
            todo = out[idx] == -1
            if not todo.any():
                break
            b = bounds[pi]
            m = todo & (sub[:, 0] >= b[0]) & (sub[:, 0] <= b[2]) \
                & (sub[:, 1] >= b[1]) & (sub[:, 1] <= b[3])
            if not m.any():
                continue
            j = np.nonzero(m)[0]
            hit = points_in_polygon(sub[j], rings[pi])
            out[idx[j[hit]]] = region_ids[pi]
    return out


def make_region_polygons(
    num_regions: int, seed: int = 42, extent: tuple[float, float, float, float] = (-180, -90, 180, 90)
) -> tuple[list[np.ndarray], np.ndarray]:
    """Deterministic fixture polygons: seeded star-convex blobs around region
    centers spread over the extent.  Returns (rings, region_ids 1..R) — the
    analog of the reference's region boundary layer (7 regions,
    ``Supplemental_Data_1.R:112``)."""
    rng = np.random.default_rng(seed)
    xmin, ymin, xmax, ymax = extent
    rings = []
    ids = []
    for r in range(1, num_regions + 1):
        cx = rng.uniform(xmin + 0.15 * (xmax - xmin), xmax - 0.15 * (xmax - xmin))
        cy = rng.uniform(ymin + 0.15 * (ymax - ymin), ymax - 0.15 * (ymax - ymin))
        nv = int(rng.integers(6, 12))
        angles = np.sort(rng.uniform(0, 2 * np.pi, size=nv))
        radii_x = rng.uniform(0.08, 0.28) * (xmax - xmin) * rng.uniform(0.5, 1.0, size=nv)
        radii_y = rng.uniform(0.08, 0.28) * (ymax - ymin) * rng.uniform(0.5, 1.0, size=nv)
        ring = np.stack([cx + radii_x * np.cos(angles), cy + radii_y * np.sin(angles)], axis=1)
        ring[:, 0] = ring[:, 0].clip(xmin, xmax)
        ring[:, 1] = ring[:, 1].clip(ymin, ymax)
        rings.append(ring)
        ids.append(r)
    return rings, np.asarray(ids, dtype=np.int64)
