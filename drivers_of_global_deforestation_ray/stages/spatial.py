"""Geodesic radius self-join: all point pairs within ``radius_km`` on the
sphere — the spatial analogue of the engine's set-similarity joins.

Blocking discipline (the jaccard_join / LSH shape): the globe is cut into a
fixed lat/lon cell grid with cell height >= radius, every point replicates
into the 3-lat-band x (2*reach+1)-lon-cell neighborhood whose reach WIDENS
with latitude (lon degrees shrink by cos(lat); near the poles the reach
caps at the full ring, where points are rare under any realistic
distribution), pairs form inside one cell co-partition under the rule
"the pair forms in the SMALLER id's home cell" (each candidate pair exactly
once — no dedup shuffle), and exact haversine verifies.  Candidates are
provably complete: two points within ``radius_km`` differ by <= 1 lat band
and <= reach lon cells at the band of EITHER point.

Only (id, lat, lon, cell) rows shuffle; the verify is vectorized float64
with a fixed IEEE expression order (the SQL brute-force twin mirrors it;
distances round to 6 — borderline-radius ties are measure-zero for
continuous coordinates, the goode_tiles discipline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .relational import grouped_transform

__all__ = ["radius_join", "haversine_km"]

_R_EARTH_KM = 6371.0088  # IUGG mean earth radius


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized haversine, fixed expression order (SQL twin mirrors it)."""
    p1 = np.radians(lat1)
    p2 = np.radians(lat2)
    dp = np.radians(lat2 - lat1)
    dl = np.radians(lon2 - lon1)
    a = (np.sin(dp / 2.0) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2)
    return 2.0 * _R_EARTH_KM * np.arcsin(np.sqrt(a))


def radius_join(
    ds: Dataset,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    num_partitions: int = 32,
) -> Dataset:
    """All pairs (a < b) with haversine distance <= ``radius_km``; output
    ``(a, b, dist_km)`` with ``dist_km`` rounded to 6 decimals."""
    n_lat = max(2, int(np.floor(180.0 * 111.195 / radius_km)))  # cell >= R
    n_lat = min(n_lat, 180)
    n_lon = n_lat * 2
    lat_cell_deg = 180.0 / n_lat
    lon_cell_deg = 360.0 / n_lon
    # per-lat-band lon reach: widest |lat| edge of the band +- one band
    band_edges = -90.0 + lat_cell_deg * np.arange(n_lat + 1)
    max_abs = np.maximum(np.abs(band_edges[:-1]), np.abs(band_edges[1:]))
    # a neighbor pair can sit one band away -> use the worst |lat| reachable
    worst = np.minimum(max_abs + lat_cell_deg, 90.0)
    coslat = np.cos(np.radians(worst))
    km_per_lon_cell = 111.195 * lon_cell_deg * np.maximum(coslat, 1e-9)
    reach = np.minimum(np.ceil(radius_km / km_per_lon_cell).astype(np.int64),
                       n_lon // 2)

    def _cells(lat: np.ndarray, lon: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
        bi = np.clip(((lat + 90.0) / lat_cell_deg).astype(np.int64), 0, n_lat - 1)
        bj = np.clip(((lon + 180.0) / lon_cell_deg).astype(np.int64), 0, n_lon - 1)
        return bi, bj

    def _replicate(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        lat = df[lat_col].to_numpy(np.float64)
        lon = df[lon_col].to_numpy(np.float64)
        bi, bj = _cells(lat, lon)
        out_id, out_lat, out_lon, out_cell, out_home = [], [], [], [], []
        # per-point neighborhood explode; reach varies by band so the loop
        # is over the (tiny) set of distinct (band, reach) batches
        for di in (-1, 0, 1):
            ni = bi + di
            ok = (ni >= 0) & (ni < n_lat)
            if not ok.any():
                continue
            r = reach[ni[ok]]
            reps = 2 * r + 1
            idx = np.repeat(np.nonzero(ok)[0], reps)
            offs = np.concatenate([np.arange(-k, k + 1) for k in r])
            nj = (bj[idx] + offs) % n_lon
            cell = ni[ok].repeat(reps) * n_lon + nj
            home = (bi[idx] * n_lon + bj[idx])
            out_id.append(ids[idx]); out_lat.append(lat[idx])
            out_lon.append(lon[idx]); out_cell.append(cell)
            out_home.append(home)
        if not out_id:  # empty input block
            return pd.DataFrame({
                id_col: pd.Series(dtype=np.int64),
                lat_col: pd.Series(dtype=np.float64),
                lon_col: pd.Series(dtype=np.float64),
                "__cell": pd.Series(dtype=np.int64),
                "__home": pd.Series(dtype=np.int64)})
        return pd.DataFrame({
            id_col: np.concatenate(out_id),
            lat_col: np.concatenate(out_lat),
            lon_col: np.concatenate(out_lon),
            "__cell": np.concatenate(out_cell),
            "__home": np.concatenate(out_home)})

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cell, g in df.groupby("__cell", sort=False):
            g = g.drop_duplicates(id_col).sort_values(id_col, kind="stable")
            ids = g[id_col].to_numpy()
            if len(ids) < 2:
                continue
            la = g[lat_col].to_numpy(); lo = g[lon_col].to_numpy()
            home = g["__home"].to_numpy()
            ai, bi_ = np.triu_indices(len(ids), k=1)
            # form the pair ONLY in the smaller id's home cell
            keep = home[ai] == cell
            ai, bi_ = ai[keep], bi_[keep]
            if not len(ai):
                continue
            d = haversine_km(la[ai], lo[ai], la[bi_], lo[bi_])
            hit = d <= radius_km
            out.append(pd.DataFrame({
                "a": ids[ai][hit], "b": ids[bi_][hit],
                "dist_km": np.round(d[hit], 6)}))
        if not out:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "dist_km": pd.Series(dtype=np.float64)})
        return pd.concat(out, ignore_index=True)

    rep = ds.map_batches(_replicate, batch_format="pandas")
    return grouped_transform(rep, ["__cell"], _pairs, num_partitions)
