"""Windowed / ordered-by-time operators over a keyed event stream.

The reference is strictly batch (SURVEY.md §2.10), but a web-scale engine
needs the keyed-window family; each operator here is a Dataset combinator
built on :func:`..stages.relational.grouped_transform` — ONE key-hash
co-partition shuffle, then fully vectorized per-partition numpy/pandas:

- :func:`sessionize` — gap-based session ids per key (the classic
  sessionization operator; oracle: DuckDB ``lag`` + running ``sum`` window).
- :func:`rolling_agg` — trailing range-window aggregate per key (oracle:
  DuckDB ``RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW``); frame
  semantics match SQL RANGE exactly, including equal-timestamp peers.

Partitioning assumption (documented, same as the other keyed ops): all rows
of one key land in one partition; per-key row counts are bounded by that
partition's memory.  Determinism: all orderings tie-break on ``id_col``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .relational import grouped_transform

__all__ = ["sessionize", "rolling_agg", "rolling_rows", "lag_shift",
           "percent_rank", "ntile", "dense_rank", "cume_dist",
           "first_last_value", "hopping_window", "tumbling_window_late"]


def hopping_window(
    ds: Dataset,
    ts_col: str,
    val_col: str,
    size_s: int,
    step_s: int,
    num_partitions: int = 32,
) -> Dataset:
    """Hopping (sliding) event-time window aggregate: every window start is a
    multiple of ``step_s`` and covers ``[w, w + size_s)`` seconds; an event
    contributes to ceil(size/step) windows.  Output: (window_start:int64
    epoch-seconds, n_events, sum_value_scaled — x100 int64, exact).

    Scale shape: the explode happens INSIDE map_batches with a per-block
    partial aggregate, so the shuffle carries one row per (block, window) —
    never per (event, window); the final reduce is one small grouped sum.
    The streaming analogue of ``ts_bucket``'s tumbling window."""
    from .relational import grouped_agg

    m = -(-size_s // step_s)  # windows per event

    def _explode_partial(b: pd.DataFrame) -> pd.DataFrame:
        # normalize any datetime64 resolution (ns/us/ms) to epoch seconds
        ts = b[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)
        v = np.round(b[val_col].to_numpy() * 100).astype(np.int64)
        base = (ts // step_s) * step_s
        frames = []
        for k in range(m):
            w = base - k * step_s
            keep = w > ts - size_s  # w <= ts holds by construction
            frames.append(pd.DataFrame({"window_start": w[keep], "__v": v[keep]}))
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby("window_start", sort=False)["__v"]
        return pd.DataFrame({"window_start": g.size().index.to_numpy(),
                             "n_events": g.size().to_numpy(dtype=np.int64),
                             "sum_value_scaled": g.sum().to_numpy(dtype=np.int64)})

    partial = ds.map_batches(_explode_partial, batch_format="pandas")
    return grouped_agg(partial, ["window_start"],
                       {"n_events": ("n_events", "sum"),
                        "sum_value_scaled": ("sum_value_scaled", "sum")},
                       num_partitions=num_partitions)


def rolling_rows(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    preceding: int,
    out_col: str = "rows_sum",
    num_partitions: int = 32,
) -> Dataset:
    """ROW-frame trailing sum per key: SQL ``SUM(v) OVER (PARTITION BY key
    ORDER BY ts, id ROWS BETWEEN <preceding> PRECEDING AND CURRENT ROW)`` —
    exactly the previous ``preceding`` rows plus the current one (no
    equal-ts peer semantics; the deterministic (ts, id) order defines the
    frame).  One prefix sum + two gathers per partition, vectorized across
    all keys via per-segment position clamps."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        n = len(df)
        out = df[[id_col, key_col]].copy()
        if n == 0:
            out[out_col] = df[value_col]
            return out
        keys = df[key_col].to_numpy()
        vals = df[value_col].to_numpy()
        new_key = np.empty(n, dtype=bool)
        new_key[0:1] = True
        new_key[1:] = keys[1:] != keys[:-1]
        seg_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        prefix = np.concatenate(([0], np.cumsum(vals)))
        pos = np.arange(n)
        lo = np.maximum(pos - preceding, seg_start)
        out[out_col] = (prefix[pos + 1] - prefix[lo]).astype(vals.dtype)
        return out

    return grouped_transform(ds, [key_col], _part, num_partitions)


def ntile(
    ds: Dataset,
    key_col: str,
    value_col: str,
    id_col: str,
    n: int,
    out_col: str = "bucket",
    num_partitions: int = 32,
) -> Dataset:
    """SQL ``ntile(n) OVER (PARTITION BY key ORDER BY value, id)``: rows of
    each key split into ``n`` buckets by row position, the first
    ``count % n`` buckets one row larger (exact SQL sizing rule)."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, value_col, id_col], kind="stable")
        g = df.groupby(key_col, sort=False, observed=True, dropna=False)
        pos = g.cumcount().to_numpy()                      # 0-based row position
        cnt = g[value_col].transform("size").to_numpy()
        base, rem = cnt // n, cnt % n
        # first `rem` buckets get (base+1) rows; position threshold splits them
        big_span = (base + 1) * rem
        in_big = pos < big_span
        bucket = np.where(
            in_big,
            pos // np.maximum(base + 1, 1),
            rem + np.where(base > 0, (pos - big_span) // np.maximum(base, 1), 0),
        ) + 1
        out = df[[id_col, key_col]].copy()
        out[out_col] = bucket.astype(np.int64)
        return out

    return grouped_transform(ds, [key_col], _part, num_partitions)


def percent_rank(
    ds: Dataset,
    key_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "pct_rank",
    num_partitions: int = 32,
) -> Dataset:
    """SQL ``percent_rank() OVER (PARTITION BY key ORDER BY value)``:
    (rank-1)/(n-1) per key with gaps-rank tie semantics (pandas
    ``rank(method='min')``); 0.0 for single-row keys."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False, observed=True, dropna=False)
        rank = g[value_col].rank(method="min").to_numpy()
        n = g[value_col].transform("size").to_numpy().astype(np.float64)
        out = df[[id_col, key_col]].copy()
        out[out_col] = np.where(n > 1, (rank - 1.0) / (n - 1.0), 0.0)
        return out

    return grouped_transform(ds, [key_col], _part, num_partitions)


def lag_shift(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    periods: int = 1,
    out_col: str = "lag_value",
    num_partitions: int = 32,
) -> Dataset:
    """Ordered navigation: per-key ``lag(value, periods)`` over rows sorted by
    (ts, id) — NULL (NaN) for the first ``periods`` rows of each key, exactly
    SQL ``lag(...) OVER (PARTITION BY key ORDER BY ts, id)``.  Negative
    ``periods`` gives SQL ``lead`` (NULL for each key's LAST rows)."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        lagged = df.groupby(key_col, sort=False)[value_col].shift(periods)
        out = df[[id_col, key_col]].copy()
        out[out_col] = lagged.to_numpy()
        return out

    return grouped_transform(ds, [key_col], _part, num_partitions)


def dense_rank(
    ds: Dataset,
    key_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "dense_rank",
    num_partitions: int = 32,
) -> Dataset:
    """SQL ``dense_rank() OVER (PARTITION BY key ORDER BY value)`` — ties
    share a rank, no gaps."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False, observed=True, dropna=False)
        out = df[[id_col, key_col]].copy()
        out[out_col] = g[value_col].rank(method="dense").to_numpy().astype(np.int64)
        return out

    return grouped_transform(ds, [key_col], _part, num_partitions)


def cume_dist(
    ds: Dataset,
    key_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "cume_dist",
    num_partitions: int = 32,
) -> Dataset:
    """SQL ``cume_dist() OVER (PARTITION BY key ORDER BY value)``:
    rank(method='max') / count — the fraction of the key's rows with value
    <= this row's."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, sort=False, observed=True, dropna=False)
        mx = g[value_col].rank(method="max").to_numpy()
        n = g[value_col].transform("size").to_numpy().astype(np.float64)
        out = df[[id_col, key_col]].copy()
        out[out_col] = mx / n
        return out

    return grouped_transform(ds, [key_col], _part, num_partitions)


def first_last_value(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    num_partitions: int = 32,
) -> Dataset:
    """SQL ``first_value``/``last_value`` over the WHOLE key partition
    ordered by (ts, id) (frame = unbounded preceding..unbounded following):
    every row carries its key's first and last value."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        g = df.groupby(key_col, sort=False)
        out = df[[id_col, key_col]].copy()
        out["first_value"] = g[value_col].transform("first").to_numpy()
        out["last_value"] = g[value_col].transform("last").to_numpy()
        return out

    return grouped_transform(ds, [key_col], _part, num_partitions)


def _range_extreme(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                   maximize: bool) -> np.ndarray:
    """Vectorized variable-window range min/max via a sparse table (RMQ):
    O(n log n) build, O(1) per query, queries batched per doubling level —
    the exact-window companion to the prefix-sum path (sliding extremes
    have no prefix-sum identity)."""
    op = np.maximum if maximize else np.minimum
    n = len(vals)
    st = [vals]
    while (1 << len(st)) <= n:
        half = 1 << (len(st) - 1)
        prev = st[-1]
        st.append(op(prev[:-half], prev[half:]))
    span = hi - lo  # >= 1 (window always includes the row itself)
    k = np.floor(np.log2(span.astype(np.float64))).astype(np.int64)
    out = np.empty(len(lo), dtype=vals.dtype)
    for kk in np.unique(k):
        m = k == kk
        tbl = st[kk]
        out[m] = op(tbl[lo[m]], tbl[hi[m] - (1 << kk)])
    return out


def sessionize(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_s: float,
    out_col: str = "session_idx",
    num_partitions: int = 32,
) -> Dataset:
    """Assign 1-based per-key session indexes: a new session starts at the
    first event and whenever the gap to the previous event exceeds ``gap_s``
    seconds (strictly greater, matching the SQL oracle's ``> gap``)."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        ts = df[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        keys = df[key_col].to_numpy()
        new_key = np.empty(len(df), dtype=bool)
        new_key[0:1] = True
        new_key[1:] = keys[1:] != keys[:-1]
        gap_us = np.int64(round(gap_s * 1e6))
        delta = np.empty(len(df), dtype=np.int64)
        delta[0:1] = 0
        delta[1:] = ts[1:] - ts[:-1]
        starts = new_key | (delta > gap_us)
        # running count of session starts, reset per key: global cumsum minus
        # the cumsum value just before each key's first row
        g = np.cumsum(starts)
        key_base = np.maximum.accumulate(np.where(new_key, g - 1, 0))
        out = df[[id_col, key_col]].copy()
        out[out_col] = (g - key_base).astype(np.int64)
        return out

    return grouped_transform(ds, [key_col], _part, num_partitions)


def rolling_agg(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window_s: float,
    out_col: "str | None" = None,
    num_partitions: int = 32,
    agg: str = "sum",
    following_s: float = 0.0,
) -> Dataset:
    """Range-window aggregate per key: for each row, ``agg`` of
    ``value_col`` over that key's rows with ``row.ts - window_s <= ts <=
    row.ts + following_s`` — *inclusive of equal-timestamp peers on both
    edges*, exactly SQL ``RANGE BETWEEN <w> PRECEDING AND <f> FOLLOWING``
    (``following_s=0``, the default, is the classic trailing
    ``... AND CURRENT ROW`` frame; a positive value gives the centered /
    lookahead frame).

    ``agg``: ``sum``/``count``/``mean`` via prefix sums (O(n)); ``min``/
    ``max`` via a sparse-table RMQ (O(n log n) build, O(1) per row) — the
    sliding extremes have no prefix-sum identity.  ``value_col`` should be
    integer (scaled) for order-independent exact sums/means."""
    if agg not in ("sum", "count", "mean", "min", "max"):
        raise ValueError(f"unsupported agg {agg!r}")
    out_col = out_col or f"rolling_{agg}"

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col, id_col], kind="stable")
        ts = df[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        keys = df[key_col].to_numpy()
        vals = df[value_col].to_numpy()
        w_us = np.int64(round(window_s * 1e6))
        f_us = np.int64(round(following_s * 1e6))
        n = len(df)
        if n == 0:
            out = df[[id_col, key_col]].copy()
            out[out_col] = vals
            return out
        new_key = np.empty(n, dtype=bool)
        new_key[0:1] = True
        new_key[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(new_key) - 1  # 0-based key-segment index per row
        # Vectorized across ALL keys: remap each segment's timestamps onto a
        # disjoint strictly-increasing axis, so ONE global searchsorted finds
        # every row's window start without windows crossing segments.
        seg_starts = np.nonzero(new_key)[0]
        seg_min = ts[seg_starts]                          # per-segment min ts
        rel = ts - seg_min[seg_id]                        # >= 0 within segment
        seg_ends = np.concatenate((seg_starts[1:], [n])) - 1
        span = ts[seg_ends] - seg_min                     # per-segment ts span
        stride = span + w_us + f_us + 1                   # gap defeats carryover
        base = np.concatenate(([0], np.cumsum(stride)[:-1]))
        def _agg_windows(v: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
            if agg in ("sum", "count", "mean"):
                prefix = np.concatenate(([0], np.cumsum(v)))
                s = prefix[hi] - prefix[lo]
                if agg == "sum":
                    return s.astype(v.dtype)
                if agg == "count":
                    return (hi - lo).astype(np.int64)
                return s / (hi - lo)
            return _range_extreme(v, lo, hi, maximize=(agg == "max"))

        if int(base[-1]) + int(span[-1]) + int(w_us) + int(f_us) < (1 << 62):
            adj = rel + base[seg_id]
            lo = np.searchsorted(adj, adj - w_us, side="left")
            hi = np.searchsorted(adj, adj + f_us, side="right")  # incl. peers
            out = df[[id_col, key_col]].copy()
            out[out_col] = _agg_windows(vals, lo, hi)
            return out
        # int64-overflow fallback (astronomical spans x keys): per-key loop
        out_frames = []
        for _, g in df.groupby(key_col, sort=False):
            gts = g[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
            gv = g[value_col].to_numpy()
            lo = np.searchsorted(gts, gts - w_us, side="left")
            hi = np.searchsorted(gts, gts + f_us, side="right")
            o = g[[id_col, key_col]].copy()
            o[out_col] = _agg_windows(gv, lo, hi)
            out_frames.append(o)
        return pd.concat(out_frames, ignore_index=True)

    return grouped_transform(ds, [key_col], _part, num_partitions)


def tumbling_window_late(
    ds: Dataset,
    ts_col: str,
    arrival_col: str,
    id_col: str,
    size_s: int,
    allowed_lateness_s: int,
    num_partitions: int = 32,
) -> Dataset:
    """Event-time tumbling windows WITH WATERMARK / allowed-lateness
    semantics — the streaming-engine contract reconstructed exactly in
    batch: the watermark when an event arrives is the max event-time of
    everything that arrived at-or-before it (``MAX(ts) OVER (ORDER BY
    arrival, id)``) minus ``allowed_lateness_s``; an event is DROPPED iff
    its window had already closed (watermark >= window end) at its arrival.
    Output per window: ``(window_start, n_accepted, n_dropped)`` — what a
    Flink/Beam tumbling window with allowed lateness fires plus its
    late-data dead-letter count.

    The high-water mark is :func:`~.relational.running_max` over arrival
    order (range-histogram buckets, O(buckets) driver) — no single-node
    pass; everything after it is one stateless classify + a two-phase
    grouped sum.  All-integer output -> hash-exact vs the SQL window twin.
    ``(arrival, id)`` must be unique (id is the tie-break)."""
    from .relational import grouped_agg, running_max

    wm = running_max(ds, arrival_col, id_col, ts_col, out_col="__hwm")

    def _classify(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col].to_numpy(np.int64)
        ws = (t // size_s) * size_s
        closed = (df["__hwm"].to_numpy(np.int64) - allowed_lateness_s
                  >= ws + size_s)
        return pd.DataFrame({
            "window_start": ws,
            "n_accepted": (~closed).astype(np.int64),
            "n_dropped": closed.astype(np.int64),
        })

    return grouped_agg(wm.map_batches(_classify, batch_format="pandas"),
                       ["window_start"],
                       {"n_accepted": ("n_accepted", "sum"),
                        "n_dropped": ("n_dropped", "sum")},
                       num_partitions=num_partitions)
