"""Mergeable streaming sketches: Misra-Gries heavy hitters, KLL-style
quantiles.

The 100-TB rationale: exact grouped counts/quantiles shuffle one row per
distinct key (``grouped_agg``/``grouped_quantiles``); at web cardinalities
(hosts, tokens, user ids) the DISTINCT set itself is the problem.  These
operators bound state to O(k) per block regardless of cardinality, and the
partials merge associatively — the same two-phase shape as
:func:`..stages.relational.grouped_agg` with sketches as the partial rows.

Both sketches are DETERMINISTIC (no RNG): Misra-Gries by construction; the
quantile sketch uses parity-alternating compaction instead of coin flips, so
re-runs and retries reproduce bit-identical summaries.

- :func:`heavy_hitters` — Misra-Gries/SpaceSaving-style top-k: counters are
  exact when ``k >= |distinct|`` (making an SQL group-count oracle valid),
  and within ``n/k`` absolute error otherwise (Misra & Gries 1982).
- :func:`quantile_sketch` — levelled compactor ladder (Karnin-Lang-Liberty
  shape): buffers of size ``m`` per level, full buffers sort + keep every
  other element at weight 2^level.  Rank error ~ O(levels/m).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .relational import grouped_transform

__all__ = ["heavy_hitters", "quantile_sketch", "grouped_quantile_sketch",
           "mg_merge", "kll_compact", "cms_estimates", "kmv_distinct",
           "kmv_overlap"]


def _mg_compress(values: np.ndarray, counts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Keep <= k counters: subtract the (k+1)-largest count from all, drop
    non-positive (the vectorized Misra-Gries decrement step)."""
    if len(values) <= k:
        return values, counts
    kth = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    keep = counts > kth
    return values[keep], counts[keep] - kth


def mg_merge(parts: "list[tuple[np.ndarray, np.ndarray]]", k: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge Misra-Gries partials: sum counters per value, re-compress.
    Total undercount stays <= n/k (errors add, bound doesn't grow past it)."""
    vals = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    s = pd.Series(cnts).groupby(pd.Series(vals), sort=False).sum()
    return _mg_compress(s.index.to_numpy(), s.to_numpy(), k)


def heavy_hitters(ds: Dataset, col: str, k: int = 64, top: int = 10,
                  out_val: str = "value", out_count: str = "est_count",
                  merge: str = "shuffle") -> Dataset:
    """Approximate top-``top`` values of ``col`` with Misra-Gries counters.

    Per-batch partial: exact value counts compressed to ``k`` counters
    (O(k) state, any cardinality).  Merge paths:

    - ``"shuffle"`` (default): partials land in ONE merge partition (k rows
      per block — tiny), counts sum, one final compression.  Driver holds
      nothing; right at any block count.
    - ``"driver"``: partials collect to the driver and merge there — skips
      the shuffle operator's fixed spin-up (~1 s), which dominates when the
      sketch is an advisory side-channel (skew_join's hot-key detection).
      Driver footprint is ``k x num_blocks`` rows — fine into the tens of
      thousands of blocks; prefer "shuffle" past that.

    Top rows by (count desc, value asc) either way.  Estimates are exact
    when the true distinct count <= k; otherwise each count is an
    undercount by at most n/k (the classic guarantee)."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].value_counts(sort=False)
        v, c = _mg_compress(vc.index.to_numpy(), vc.to_numpy().astype(np.int64), k)
        return pd.DataFrame({"__v": v, "__c": c, "__g": np.int8(0)})

    partial = ds.select_columns([col]).map_batches(_partial, batch_format="pandas")

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        v, c = mg_merge([(df["__v"].to_numpy(), df["__c"].to_numpy(np.int64))], k)
        out = pd.DataFrame({out_val: v, out_count: c})
        out = out.sort_values(out_val, kind="stable").sort_values(
            out_count, ascending=False, kind="stable").head(top)
        return out.reset_index(drop=True)

    if merge == "driver":
        import ray.data as rd

        return rd.from_pandas(_merge(partial.to_pandas()))
    return grouped_transform(partial, ["__g"], _merge, num_partitions=1)


# ---------------------------------------------------------------------------
# KLL-style quantile sketch
# ---------------------------------------------------------------------------

def kll_compact(levels: "list[np.ndarray]", m: int) -> "list[np.ndarray]":
    """Compact every over-full buffer upward: sort, keep alternating elements
    (offset = level parity — deterministic stand-in for KLL's coin flip),
    promote to the next level at doubled weight."""
    levels = [lv.copy() for lv in levels]
    li = 0
    while li < len(levels):
        if len(levels[li]) > m:
            buf = np.sort(levels[li])
            promoted = buf[(li % 2)::2]
            levels[li] = buf[:0]
            if li + 1 == len(levels):
                levels.append(promoted)
            else:
                levels[li + 1] = np.concatenate([levels[li + 1], promoted])
        li += 1
    return levels


def _kll_bytes(levels: "list[np.ndarray]") -> bytes:
    import struct

    out = [struct.pack("<I", len(levels))]
    for lv in levels:
        out.append(struct.pack("<I", len(lv)))
        out.append(np.ascontiguousarray(lv, dtype=np.float64).tobytes())
    return b"".join(out)


def _kll_from_bytes(b: bytes) -> "list[np.ndarray]":
    import struct

    (nlev,) = struct.unpack_from("<I", b, 0)
    off = 4
    levels = []
    for _ in range(nlev):
        (n,) = struct.unpack_from("<I", b, off)
        off += 4
        levels.append(np.frombuffer(b, dtype=np.float64, count=n, offset=off).copy())
        off += 8 * n
    return levels


def _kll_read_quantiles(levels: "list[np.ndarray]", qs: "list[float]") -> "list[float]":
    vals = np.concatenate(levels) if levels else np.empty(0)
    wts = (np.concatenate([np.full(len(lv), 1 << li, dtype=np.int64)
                           for li, lv in enumerate(levels)])
           if levels else np.empty(0, np.int64))
    if not len(vals):
        return [float("nan")] * len(qs)
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = cum[-1]
    out = []
    for q in qs:
        i = int(np.searchsorted(cum, q * total, side="left"))
        out.append(float(vals[min(i, len(vals) - 1)]))
    return out


def grouped_quantile_sketch(ds: Dataset, keys: "list[str]", col: str,
                            qs: "list[float]", m: int = 256,
                            prefix: str = "q",
                            num_partitions: int = 32) -> Dataset:
    """Per-KEY approximate quantiles from mergeable ladders — the skew-proof
    alternative to the exact holistic :func:`..stages.relational.grouped_quantiles`:
    a hot key ships one O(m log) sketch row per block through the shuffle
    instead of its raw rows, so a key owning 99% of the data costs the same
    as any other."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        grp = df.groupby(keys, sort=False, observed=True, dropna=False)
        gid = grp.ngroup().to_numpy()
        n_groups = int(gid.max()) + 1 if len(gid) else 0
        if not n_groups:
            return pd.DataFrame({**{k: df[k] for k in keys}, "__sk": []})
        vals = df[col].to_numpy(np.float64)
        order = np.argsort(gid, kind="stable")
        starts = np.concatenate(([0], np.cumsum(np.bincount(gid))[:-1]))
        ends = np.concatenate((starts[1:], [len(gid)]))
        _, first_idx = np.unique(gid, return_index=True)
        out = df.iloc[first_idx][keys].reset_index(drop=True)
        out["__sk"] = [_kll_bytes(kll_compact([vals[order[s:e]]], m))
                       for s, e in zip(starts, ends)]
        return out

    partial = ds.select_columns(keys + [col]).map_batches(_partial, batch_format="pandas")

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in df.groupby(keys, sort=False, observed=True, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            merged: list[np.ndarray] = []
            for b in g["__sk"]:
                for li, lv in enumerate(_kll_from_bytes(b)):
                    while len(merged) <= li:
                        merged.append(np.empty(0, dtype=np.float64))
                    merged[li] = np.concatenate([merged[li], lv])
            merged = kll_compact(merged, m)
            ests = _kll_read_quantiles(merged, qs)
            rows.append((*kv, *ests))
        cols = keys + [f"{prefix}{int(q * 100)}" for q in qs]
        return pd.DataFrame(rows, columns=cols)

    return grouped_transform(partial, keys, _merge, num_partitions)


def quantile_sketch(ds: Dataset, col: str, qs: "list[float]", m: int = 256,
                    prefix: str = "q") -> Dataset:
    """Approximate quantiles of ``col`` from a mergeable compactor ladder:
    O(m log(n/m)) retained samples regardless of n.  Per-batch partials
    serialize their ladders; one merge partition concatenates level-wise,
    re-compacts, and reads the weighted quantiles.  Deterministic (parity
    compaction), so retries/re-runs agree exactly.  Output: one row with
    columns ``<prefix><percent>``."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].to_numpy(np.float64)
        levels = kll_compact([vals], m)
        return pd.DataFrame({"__sk": [_kll_bytes(levels)], "__g": np.int8(0)})

    partial = ds.select_columns([col]).map_batches(_partial, batch_format="pandas")

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        merged: list[np.ndarray] = []
        for b in df["__sk"]:
            for li, lv in enumerate(_kll_from_bytes(b)):
                while len(merged) <= li:
                    merged.append(np.empty(0, dtype=np.float64))
                merged[li] = np.concatenate([merged[li], lv])
        merged = kll_compact(merged, m)
        vals = np.concatenate(merged) if merged else np.empty(0)
        wts = np.concatenate([np.full(len(lv), 1 << li, dtype=np.int64)
                              for li, lv in enumerate(merged)]) if merged else np.empty(0, np.int64)
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = cum[-1] if len(cum) else 0
        out = {}
        for q in qs:
            target = q * total
            i = int(np.searchsorted(cum, target, side="left")) if total else 0
            out[f"{prefix}{int(q * 100)}"] = [float(vals[min(i, len(vals) - 1)])] if len(vals) else [np.nan]
        return pd.DataFrame(out)

    return grouped_transform(partial, ["__g"], _merge, num_partitions=1)


def _cms_buckets(keys: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(len(keys), depth) bucket matrix: row i of hash family = md5 of
    ``"{i}:{key}"`` first-8-hex as u32, mod width — the repo's standard
    SQL-reproducible selection hash (``('0x' || substr(md5(i || ':' || k),
    1, 8))::UBIGINT % width`` in DuckDB)."""
    import hashlib

    out = np.empty((len(keys), depth), dtype=np.int64)
    for j, v in enumerate(keys):
        sv = str(v)
        for i in range(depth):
            out[j, i] = int(
                hashlib.md5(f"{i}:{sv}".encode()).hexdigest()[:8], 16) % width
    return out


def cms_estimates(ds: Dataset, col: str, query_keys: "list",
                  width: int = 1024, depth: int = 4) -> Dataset:
    """Count-Min sketch point-frequency estimates (Cormode & Muthukrishnan
    2005): ``est(k) = min_i counter[i][h_i(k)]``, an overestimate by at most
    ``e*n/width`` with probability ``1 - e^-depth``.

    100-TB shape: each block ships at most ``depth*width`` counter rows
    (the sketch, NOT the distinct keys — state is O(d*w) at any
    cardinality); counters merge by a tiny grouped sum; only the bounded
    ``query_keys`` buckets are looked up in the final one-partition pass.
    Deterministic: the hash family is md5-derived (no seeds), so re-runs,
    retries, and the SQL twin agree exactly.

    Per-batch partial: exact value counts (pandas groupby) scattered into
    the (depth, width) counter grid with ``np.add.at`` — one md5 per
    DISTINCT value per batch, not per row.
    """
    from .relational import grouped_agg

    qb = _cms_buckets(np.asarray(query_keys), depth, width)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col]
        cnt = s.groupby(s, sort=False).size()
        vals, n = cnt.index.to_numpy(), cnt.to_numpy(np.int64)
        grid = np.zeros((depth, width), dtype=np.int64)
        b = _cms_buckets(vals, depth, width)
        for i in range(depth):
            np.add.at(grid[i], b[:, i], n)
        nz = np.nonzero(grid)
        return pd.DataFrame({"__i": nz[0].astype(np.int64), "__b": nz[1],
                             "__n": grid[nz]})

    merged = grouped_agg(
        ds.select_columns([col]).map_batches(_partial, batch_format="pandas"),
        ["__i", "__b"], {"n": ("__n", "sum")}, num_partitions=4)

    keys_arr = np.asarray(query_keys)

    def _lookup(df: pd.DataFrame) -> pd.DataFrame:
        # one partition holds the whole merged sketch (<= depth*width rows)
        grid = np.zeros((depth, width), dtype=np.int64)
        grid[df["__i"].to_numpy(), df["__b"].to_numpy()] = df["n"].to_numpy()
        est = grid[np.arange(depth)[None, :], qb].min(axis=1)
        return pd.DataFrame({"key": keys_arr, "est": est})

    one = merged.map_batches(lambda d: d.assign(__g=np.int8(0)),
                             batch_format="pandas")
    return grouped_transform(one, ["__g"], _lookup, num_partitions=1)


def kmv_estimate(hv: np.ndarray, k: int) -> float:
    """Bottom-k estimator on a SORTED unique-hash array: ``(k-1)/(h_k/2^32)``
    once ``k`` hashes exist, else the exact distinct count.  ``k >= 2``
    required — for ``k=1`` the numerator is 0 on any non-empty input."""
    if k < 2:
        raise ValueError(f"kmv requires k >= 2 (got {k}): (k-1)/h_k is 0 for k=1")
    nd = len(hv)
    if nd >= k:
        return float(k - 1) / (float(hv[k - 1]) / 4294967296.0)
    return float(nd)


def kmv_distinct(ds: Dataset, keys: "list[str]", col: str, k: int = 32,
                 out_col: str = "est_distinct",
                 num_partitions: int = 8) -> Dataset:
    """Per-key approximate COUNT(DISTINCT ``col``) via a bottom-k (KMV /
    k-minimum-values) sketch (Bar-Yossef et al. 2002): keep the ``k``
    smallest md5-u32 hashes of the distinct values; with ``nd >= k``
    distinct hashes the estimate is ``(k-1) / (h_k / 2^32)``, else the
    exact distinct count.  Relative error ~ 1/sqrt(k).

    DETERMINISTIC (the engine's md5 selection-hash discipline): no seeds,
    so re-runs, retries and the SQL twin agree bit-for-bit — the reason a
    hash-exact oracle exists for an *approximate* operator.

    Scale shape: per-block partials ship at most ``k`` int64 hashes per
    key per block (state bounded at ANY cardinality — the same contract as
    ``heavy_hitters``); the merge is a per-key sorted-unique head, a
    vectorized transform per partition.

    ``k >= 2`` is required: the ``(k-1)/h_k`` estimator degenerates to 0
    for ``k=1`` on any non-empty input (h_1 > 0, numerator 0)."""
    import hashlib

    if k < 2:
        raise ValueError(f"kmv requires k >= 2 (got {k}): (k-1)/h_k is 0 for k=1")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[keys + [col]].drop_duplicates()
        hv = np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
             for v in d[col]), dtype=np.int64, count=len(d))
        out = d[keys].copy(deep=False)
        out["__hv"] = hv
        out = out.sort_values("__hv", kind="stable")
        return out.groupby(keys, sort=False).head(k)

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(keys + ["__hv"]).sort_values("__hv", kind="stable")
        rows = []
        for kv, g in d.groupby(keys, sort=False):
            est = kmv_estimate(g["__hv"].to_numpy(), k)
            rows.append((*(kv if isinstance(kv, tuple) else (kv,)), est))
        return pd.DataFrame(rows, columns=keys + [out_col])

    partial = ds.map_batches(_partial, batch_format="pandas")
    return grouped_transform(partial, keys, _merge, num_partitions)


def _kmv_bottom(ds: Dataset, col: str, k: int) -> np.ndarray:
    """Sorted bottom-k md5-u32 hashes of the distinct values of ``col`` —
    per-block k-bounded partials, one-partition merge, k ints to the
    driver.  ``k >= 2`` required (see :func:`kmv_distinct`)."""
    import hashlib

    if k < 2:
        raise ValueError(f"kmv requires k >= 2 (got {k}): (k-1)/h_k is 0 for k=1")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].drop_duplicates()
        hv = np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
             for v in vals), dtype=np.int64, count=len(vals))
        hv = np.unique(hv)[:k]
        return pd.DataFrame({"__hv": hv, "__g": np.full(len(hv), 0, np.int8)})

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__hv": np.unique(df["__hv"].to_numpy())[:k],
                             "__g": np.int8(0)})

    out = grouped_transform(ds.map_batches(_partial, batch_format="pandas"),
                            ["__g"], _merge, num_partitions=1).to_pandas()
    return out["__hv"].to_numpy() if len(out) else np.empty(0, np.int64)


def kmv_overlap(ds_a: Dataset, ds_b: Dataset, col_a: str, col_b: str,
                k: int = 256) -> pd.DataFrame:
    """KMV sketch SET ALGEBRA (Beyer et al. 2007): estimate the distinct
    union and intersection cardinalities of two columns from their bottom-k
    sketches alone — the corpus-overlap probe (shared urls / shared hosts
    between two crawls) without ever joining the corpora.

    The union's bottom-k is the bottom-k of the two sketches' union, and
    any of those hashes that belongs to side A is necessarily inside A's
    own bottom-k — so k-bounded sketches suffice and the result is
    IDENTICAL to what the full distinct sets would give (the property the
    SQL twin checks, rebuilding from the full sets).  Estimators:
    ``est_union = (k-1)/(h_k/2^32)`` (exact count below k),
    ``est_intersect = (both/k_eff) * est_union``.  Deterministic md5 hash
    family -> hash-exact-checkable despite being approximate.

    Driver footprint: 2k int64s."""
    ha = _kmv_bottom(ds_a, col_a, k)
    hb = _kmv_bottom(ds_b, col_b, k)
    u = np.unique(np.concatenate([ha, hb]))
    nd = len(u)
    keff = min(nd, k)
    s = u[:keff]
    both = int((np.isin(s, ha) & np.isin(s, hb)).sum())
    est_union = kmv_estimate(u, k)
    est_intersect = (float(both) / float(keff)) * est_union if keff else 0.0
    return pd.DataFrame({"est_union": [est_union],
                         "est_intersect": [est_intersect]})
