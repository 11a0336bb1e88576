"""Generic relational operators as Ray-Data ``Dataset`` combinators.

Covers the reference's relational surface (SURVEY.md §2.2/2.5-2.8): filters,
projections, one-hot encode, NA->0 imputation, broadcast and big-big joins,
grouped aggregation, row-wise argmax vote, exact dedup, union-all, top-k,
stratified sampling, rank assignment, partitioned writes.

Scale design notes (the parts that matter at 100 TB):

- **Grouped aggregation is two-phase.**  :func:`grouped_agg` combines inside
  every ``map_batches`` call first (each batch collapses to <= |distinct keys|
  partial rows), then runs the small global ``groupby().map_groups`` combine.
  For *algebraic* aggregates (sum/count/min/max/mean) this makes key skew a
  non-issue — a hot key ships one partial row per block, never its raw rows —
  which is exactly the salted/partial-agg remedy SURVEY.md §4 calls for.
- **Sums are exact.**  Money-style measures are aggregated as scaled int64
  (:func:`scaled_int`), so results are independent of block order / combine
  order and bit-identical to the DuckDB oracle.  Plain float sums would depend
  on reduction order.
- **Broadcast joins never shuffle.**  The small side is ``ray.put`` once and
  joined per batch with pyarrow's hash join inside ``map_batches`` — the
  reference's dominant join shape (J2, ``Supplemental_Data_1.R:272`` etc.).
- **Big-big joins** use ``Dataset.join`` (hash shuffle on both sides, J1).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..functions.hashing import stable_hash64

__all__ = [
    "scaled_int",
    "grouped_transform",
    "grouped_agg",
    "grouped_agg_partial",
    "grouped_agg_final",
    "grouped_median",
    "grouped_quantiles",
    "grouped_count_distinct",
    "approx_count_distinct",
    "grouped_stats",
    "set_op",
    "grouped_string_agg",
    "grouped_mode",
    "broadcast_join",
    "hash_join",
    "copart_join",
    "asof_join",
    "range_join",
    "range_join_copartitioned",
    "distinct_keys",
    "build_bloom",
    "bloom_contains",
    "semi_join",
    "one_hot",
    "unpivot",
    "cross_join",
    "fill_null",
    "argmax_vote",
    "dedup_exact",
    "topk",
    "weighted_sample_topk",
    "grouped_sample_topk",
    "grouped_topk",
    "stratified_sample",
    "stratified_sample_allocated",
    "add_rank",
    "union_all",
    "partitioned_write",
]


def scaled_int(col: pa.ChunkedArray | pa.Array, scale: int = 100) -> pa.Array:
    """Deterministic money math: ``round(col * scale)`` as int64.

    For inputs with <= ``log10(scale)`` decimal digits the product is within
    float-ulp of an integer, so rounding mode can never flip a value and the
    result matches DuckDB's ``CAST(round(col * scale) AS BIGINT)`` exactly.
    """
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(float(scale)))), pa.int64())


# ---------------------------------------------------------------------------
# hash-partitioned grouped transform
# ---------------------------------------------------------------------------

def grouped_transform(
    ds: Dataset,
    keys: list[str],
    partition_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = 32,
) -> Dataset:
    """Hash-partition by ``keys``, then apply a VECTORIZED per-partition fn.

    Replaces ``groupby(keys).map_groups(per_group_fn)`` wherever the number of
    distinct keys is large: Ray's ``map_groups`` pays a Python call + DataFrame
    slice *per group* (~0.2 ms each — 60k LSH buckets cost ~12 s of pure
    overhead).  Here rows sharing a key tuple land in the same partition
    (deterministic cross-process siphash via ``pd.util.hash_pandas_object``),
    Ray only ever sees ``num_partitions`` groups, and ``partition_fn`` does its
    own pandas grouping internally — per-group cost becomes a vectorized
    pandas groupby, per-partition cost is O(num_partitions) scheduling.

    ``partition_fn`` receives every row of each of its key groups (never a
    split group) and must group by ``keys`` itself.

    Shuffle strategy: Ray's default sort-based groupby.  MEASURED against
    ``ShuffleStrategy.HASH_SHUFFLE`` on the heaviest consumer (dedup_spans'
    10.9M-row gram co-partition, 32 CPUs): sort 14.1 s vs hash 15.8 s —
    the aggregator-actor spin-up eats the win at this scale, so the
    default stays.
    """

    def _part(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch[keys], index=False).to_numpy()
        batch = batch.copy(deep=False)
        batch["__part"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return batch

    def _apply(g: pd.DataFrame) -> pd.DataFrame:
        return partition_fn(g.drop(columns="__part").reset_index(drop=True))

    return (
        ds.map_batches(_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(_apply, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# grouped aggregation (two-phase, exact)
# ---------------------------------------------------------------------------

_PARTIAL_AGGS = {"sum", "count", "size", "min", "max", "mean"}


def _partial_batch(batch: pd.DataFrame, keys: list[str], specs: dict) -> pd.DataFrame:
    """Per-batch combine: collapse to one partial row per distinct key."""
    agg_map: dict[str, tuple[str, str]] = {}
    for alias, (col, how) in specs.items():
        if how == "size":
            continue
        if how in ("sum", "mean"):
            agg_map[f"__{alias}_s"] = (col, "sum")
        if how == "mean":
            agg_map[f"__{alias}_c"] = (col, "count")
        if how == "count":  # SQL count(col): non-null rows
            agg_map[f"__{alias}_n"] = (col, "count")
        if how == "min":
            agg_map[f"__{alias}_m"] = (col, "min")
        if how == "max":
            agg_map[f"__{alias}_M"] = (col, "max")
    g = batch.groupby(keys, sort=False, observed=True, dropna=False)
    out = g.agg(**agg_map) if agg_map else g.size().to_frame("__drop").drop(columns="__drop")
    sizes = [a for a, (_, how) in specs.items() if how == "size"]
    if sizes:
        size = g.size()
        for alias in sizes:
            out[f"__{alias}_z"] = size
    return out.reset_index()


def _final_partition(df: pd.DataFrame, keys: list[str], specs: dict) -> pd.DataFrame:
    """Vectorized final combine over one hash partition of partials: one
    pandas groupby per partition instead of one Python call per key group."""
    g = df.groupby(keys, sort=False, observed=True, dropna=False)
    cols: dict[str, pd.Series] = {}
    for alias, (_, how) in specs.items():
        if how == "sum":
            cols[alias] = g[f"__{alias}_s"].sum()
        elif how == "count":
            cols[alias] = g[f"__{alias}_n"].sum().astype(np.int64)
        elif how == "size":
            cols[alias] = g[f"__{alias}_z"].sum().astype(np.int64)
        elif how == "mean":
            cols[alias] = g[f"__{alias}_s"].sum() / g[f"__{alias}_c"].sum()
        elif how == "min":
            cols[alias] = g[f"__{alias}_m"].min()
        elif how == "max":
            cols[alias] = g[f"__{alias}_M"].max()
    return pd.DataFrame(cols).reset_index()


def grouped_agg(
    ds: Dataset,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    batch_size: int = 65536,
    num_partitions: int = 32,
    engine: str = "pandas",
) -> Dataset:
    """``specs``: ``{alias: (column, agg)}`` with agg in sum/count/min/max/mean.

    Two-phase (partial per batch -> tiny global shuffle); see module docstring.
    ``mean`` is computed as total_sum / total_count — one IEEE division on
    exact operands when the column is integer-valued or scaled-int.

    ``engine="arrow"`` runs the partial via ``pyarrow.TableGroupBy`` on the
    zero-copy block — measured 1.3-1.5x faster than the pandas kernel
    (BASELINE.md §arrow-partials) and BIT-IDENTICAL whenever summed columns
    are integer, scaled-int, or integer-valued floats (associative exact
    sums).  True-float sums reassociate (few-ulp drift) and arrow
    propagates NaN where pandas skips it — callers pinned to a pandas-order
    golden (the flagship) or aggregating NaN-carrying floats keep the
    default."""
    unknown = {h for _, h in specs.values()} - _PARTIAL_AGGS
    if unknown:
        raise ValueError(f"unsupported aggs: {unknown}")
    return grouped_agg_final(grouped_agg_partial(ds, keys, specs, batch_size, engine),
                             keys, specs, num_partitions)


def _partial_batch_arrow(b: "pa.Table", keys: list[str], specs: dict) -> "pa.Table":
    """Arrow-native partial: ``pyarrow.TableGroupBy`` straight off the
    zero-copy block — no pandas conversion.  Emits the SAME partial schema
    as :func:`_partial_batch` so the final combine is shared.

    Scope note vs the pandas kernel: arrow ``sum``/``min``/``max`` skip
    NULLS but propagate float NaN, while pandas groupby skips NaN — on
    NaN-free columns (the engine's convention: NaN is imputed at ingest)
    the two partials are identical."""
    aggs, renames = [], {}
    seen: set = set()

    def want(col: str, how: str, out: str):
        if (col, how) not in seen:
            seen.add((col, how))
            aggs.append((col if how != "count_all" else [], how))
        src = "count_all" if how == "count_all" else f"{col}_{how}"
        renames.setdefault(src, []).append(out)

    for alias, (col, how) in specs.items():
        if how == "sum":
            want(col, "sum", f"__{alias}_s")
        elif how == "count":
            want(col, "count", f"__{alias}_n")
        elif how == "size":
            want("", "count_all", f"__{alias}_z")
        elif how == "mean":
            want(col, "sum", f"__{alias}_s")
            want(col, "count", f"__{alias}_c")
        elif how == "min":
            want(col, "min", f"__{alias}_m")
        elif how == "max":
            want(col, "max", f"__{alias}_M")
    g = pa.TableGroupBy(b, keys).aggregate(aggs)
    cols: dict = {k: g[k] for k in keys}
    for src, outs in renames.items():
        for out in outs:
            cols[out] = g[src]
    return pa.table(cols)


def grouped_agg_partial(ds: Dataset, keys: list[str], specs: dict[str, tuple[str, str]],
                        batch_size: int = 65536, engine: str = "pandas") -> Dataset:
    """Partial (per-batch) half of :func:`grouped_agg` — exposed so stages can
    checkpoint partial aggregates per input shard and resume (partials are
    associative: re-running the final over any sharding of them is exact).

    ``engine="arrow"`` runs the partial as ``pyarrow.TableGroupBy`` on the
    zero-copy Arrow block (no pandas conversion; VERDICT r03 #6 — measured
    verdict in BASELINE.md §arrow-partials); ``"pandas"`` remains the
    default pending that measurement's regime."""
    if engine == "arrow":
        return ds.map_batches(
            lambda b: _partial_batch_arrow(b, keys, specs),
            batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(
        lambda b: _partial_batch(b, keys, specs), batch_format="pandas", batch_size=batch_size
    )


def grouped_agg_final(partial: Dataset, keys: list[str], specs: dict[str, tuple[str, str]],
                      num_partitions: int = 32) -> Dataset:
    """Final combine half of :func:`grouped_agg` over partial outputs."""
    return grouped_transform(
        partial, keys, lambda df: _final_partition(df, keys, specs), num_partitions
    )


def salted_grouped_agg(
    ds: Dataset,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    num_salts: int = 16,
    batch_size: int = 65536,
    num_partitions: int = 32,
) -> Dataset:
    """Explicit salted hot-key aggregation (the north-rule's "salted
    hot-cell splitting").

    Stage 1 aggregates by ``(keys..., __salt)`` where ``__salt`` spreads
    every key's rows across ``num_salts`` independent reducer groups
    (deterministic round-robin within each batch — no RNG), so a hot key
    that would otherwise pin one reducer lands on ``num_salts`` of them.
    Stage 2 re-aggregates the per-salt partials by the bare keys (sum of
    sums, min of mins, counts re-summed).

    The result is identical to :func:`grouped_agg` for the re-aggregable
    aggs (sum/count/size/min/max) — ``mean`` is rejected (carry sum and
    count instead).  Note :func:`grouped_agg` already bounds hot-key
    traffic to one partial row per key per *block*; this operator is the
    explicit remedy for the remaining final-combine skew, where a single
    key's many partials must otherwise merge on one reducer."""
    if any(how == "mean" for _, how in specs.values()):
        raise ValueError("salted_grouped_agg: mean is not re-aggregable; carry sum and count")

    def _salt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__salt"] = np.arange(len(df), dtype=np.int64) % num_salts
        return df

    fine = grouped_agg(ds.map_batches(_salt, batch_format="pandas", batch_size=batch_size),
                       keys + ["__salt"], specs, batch_size, num_partitions)
    reagg = {a: (a, "sum" if how in ("count", "size") else how)
             for a, (_, how) in specs.items()}
    int_aliases = [a for a, (_, how) in specs.items() if how in ("count", "size")]
    merged = grouped_agg(fine, keys, reagg, batch_size,
                         max(2, num_partitions // 4))

    def _fix(df: pd.DataFrame) -> pd.DataFrame:
        for a in int_aliases:
            df[a] = df[a].astype(np.int64)
        return df[keys + list(specs)]

    return merged.map_batches(_fix, batch_format="pandas")


def grouping_sets_agg(
    ds: Dataset,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    sets: "list[list[str]]",
    batch_size: int = 65536,
    num_partitions: int = 32,
) -> Dataset:
    """SQL ``GROUP BY GROUPING SETS``: one aggregate per key subset, dropped
    keys emitted as typed nulls.  ``rollup_agg`` (prefixes) and ``cube_agg``
    (all subsets) are the conveniences.

    Scale shape: the raw input is scanned and shuffled ONCE (the finest
    :func:`grouped_agg` over ALL keys); that result — one row per fine
    group — is materialized and every requested set re-aggregates it (sum
    of sums, min of mins, counts re-summed), so a 100-TB cube costs one
    partial-agg shuffle plus re-aggs of an already-tiny table.  ``mean`` is
    rejected: it is not re-aggregable from finals (carry sum + count)."""
    if any(how == "mean" for _, how in specs.values()):
        raise ValueError("grouping sets: mean is not re-aggregable; carry sum and count")
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} has non-key columns {unknown}")
    aliases = list(specs)
    fine = grouped_agg(ds, keys, specs, batch_size, num_partitions).materialize()
    reagg = {a: (a, "sum" if how in ("count", "size") else how)
             for a, (_, how) in specs.items()}
    int_aliases = [a for a, (_, how) in specs.items() if how in ("count", "size")]
    key_dtype = {k: _pd_dtype_of(t) for k, t in
                 zip(fine.schema().names, fine.schema().types) if k in keys}

    def _order(df: pd.DataFrame) -> pd.DataFrame:
        return df[keys + aliases]

    levels = []
    for s in sets:
        if list(s) == list(keys):
            levels.append(fine.map_batches(_order, batch_format="pandas"))
            continue
        sub = [k for k in keys if k in s]  # canonical key order
        if sub:
            coarse = grouped_agg(fine, sub, reagg,
                                 num_partitions=max(2, num_partitions // 4))
        else:
            coarse = grouped_agg(
                fine.map_batches(lambda b: b.assign(__all=np.int64(0)),
                                 batch_format="pandas"),
                ["__all"], reagg, num_partitions=2,
            ).map_batches(lambda b: b.drop(columns="__all"), batch_format="pandas")

        def _fill(df: pd.DataFrame,
                  _nulls=tuple(k for k in keys if k not in s)) -> pd.DataFrame:
            for k in _nulls:
                df[k] = _typed_null_series(key_dtype[k], len(df))
            for a in int_aliases:
                df[a] = df[a].astype(np.int64)
            return df[keys + aliases]

        levels.append(coarse.map_batches(_fill, batch_format="pandas"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def rollup_agg(
    ds: Dataset,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    batch_size: int = 65536,
    num_partitions: int = 32,
) -> Dataset:
    """SQL ``GROUP BY ROLLUP(keys...)``: the prefix grouping sets, from the
    finest level down to the grand total (see :func:`grouping_sets_agg`)."""
    sets = [keys[:cut] for cut in range(len(keys), -1, -1)]
    return grouping_sets_agg(ds, keys, specs, sets, batch_size, num_partitions)


def cube_agg(
    ds: Dataset,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    batch_size: int = 65536,
    num_partitions: int = 32,
) -> Dataset:
    """SQL ``GROUP BY CUBE(keys...)``: every key subset (2^k sets), each
    re-aggregated from the ONE materialized finest level."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_agg(ds, keys, specs, sets, batch_size, num_partitions)


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

_JOIN_TYPES = {"left": "left outer", "inner": "inner", "right": "right outer", "full": "full outer"}


def _pd_dtype_of(t) -> str:
    """Type-preserving pandas dtype for a side-tagged union column: nullable
    Int64 for ints (pd.NA, no float upcast), NaT-able datetime64, float64,
    boolean, object — used by every operator that unions two differently-
    schemed sides before a co-partition shuffle.  Accepts arrow DataTypes
    (arrow-block datasets) or numpy dtypes (pandas-block datasets)."""
    if isinstance(t, pa.DataType):
        if pa.types.is_integer(t):
            return "Int64"
        if pa.types.is_floating(t):
            return "float64"
        if pa.types.is_timestamp(t):
            return "datetime64[us]"
        if pa.types.is_boolean(t):
            return "boolean"
        return "object"
    try:
        kind = np.dtype(t).kind
    except TypeError:
        return "object"
    return {"i": "Int64", "u": "Int64", "f": "float64",
            "M": "datetime64[us]", "b": "boolean"}.get(kind, "object")


def _typed_null_series(dtype: str, n: int) -> pd.Series:
    null = {"datetime64[us]": pd.NaT, "object": None, "float64": np.nan}.get(dtype, pd.NA)
    return pd.Series([null] * n, dtype=dtype)


def _broadcast_join_batch(batch: pa.Table, small_ref, on: list[str],
                          right_on: list[str], how) -> pa.Table:
    """Task-pool batch fn: the small side lives in the object store once
    (``ray.put``) and ``ray.get`` here is a zero-copy plasma-local read —
    never re-shipped per batch (SURVEY.md J2).  A plain function, not an
    actor pool: the only 'state' is that zero-copy get, and actor-pool
    spin-up (~2-4 s) dominated toy-scale broadcast joins (VERDICT r02 #1)."""
    small: pa.Table = ray.get(small_ref) if isinstance(small_ref, ray.ObjectRef) else small_ref
    return batch.join(small, keys=on, right_keys=right_on, join_type=how).combine_chunks()


def broadcast_join(
    ds: Dataset,
    small: pa.Table,
    on: str | list[str],
    how: str = "left",
    right_on: str | list[str] | None = None,
    concurrency: tuple[int, int] | int | None = None,
    batch_size: int = 65536,
) -> Dataset:
    """Join a Dataset against a driver-resident small table without a shuffle."""
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else ([right_on] if isinstance(right_on, str) else list(right_on))
    ref = ray.put(small.combine_chunks())
    kwargs = {"small_ref": ref, "on": on, "right_on": right_on,
              "how": _JOIN_TYPES[how]}
    if isinstance(concurrency, tuple):  # legacy actor-pool spec -> task cap
        concurrency = concurrency[1]
    return ds.map_batches(
        _broadcast_join_batch, fn_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


def hash_join(
    left: Dataset,
    right: Dataset,
    on: str | list[str],
    how: str = "inner",
    num_partitions: int = 32,
    right_on: str | list[str] | None = None,
) -> Dataset:
    """Big-big equi-join: ``Dataset.join`` hash-shuffles both sides (J1).

    ``num_partitions`` is clamped to the cluster's CPU budget: Ray Data's
    join operator spins up ``num_partitions`` hash-shuffle aggregator
    actors PER JOIN, and a topology whose aggregator demand exceeds the
    CPU budget stalls indefinitely (measured: two 32-partition joins in
    one streaming plan hang an 8-CPU cluster; clamped to 8 the same plan
    finishes in seconds).  Join results are partition-count-invariant, so
    the clamp is result-invisible; on a real multi-node cluster the CPU
    budget is large and the requested width passes through."""
    try:
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", num_partitions))
    except Exception:
        ncpu = num_partitions
    num_partitions = max(2, min(num_partitions, ncpu))
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    join_type = {"left": "left_outer", "inner": "inner", "right": "right_outer", "full": "full_outer"}[how]
    return left.join(right, join_type=join_type, num_partitions=num_partitions, on=on_t, right_on=r_t)


def skew_join(
    left: Dataset,
    right: Dataset,
    on: str,
    how: str = "inner",
    right_on: str | None = None,
    hot_k: int = 64,
    num_partitions: int = 32,
) -> Dataset:
    """Skew-aware hybrid equi-join (the north rule's salted-hot-key idea
    applied to joins): a Misra-Gries pass (O(hot_k) state, no extra
    shuffle) nominates the left side's hottest join keys; rows carrying a
    hot key take a BROADCAST path (the right side's hot-key rows ship once
    via ``ray.put`` — bounded by hot_k keys x the right side's per-key
    row count, the dimension-like contract), everything else takes the
    ordinary hash-shuffle join; the two streams union.

    A hot key that would pin one shuffle reducer (the classic web-scale
    failure: one viral URL / one mega-domain) never enters the shuffle at
    all.  The hot set is ADVISORY — any detection error only moves rows
    between two paths that produce identical results, which is exactly
    what the SQL oracle checks (strategy invariance vs a plain JOIN).

    ``inner`` and ``left`` joins: both sides split on the SAME key
    predicate, so every row lands in exactly one path and matches can only
    form within a path — the union is exact with no reconciliation.
    ``full``/``right`` would need the same argument on the right side
    (it holds) but broadcast_join's small side can't emit unmatched rows,
    so they stay unsupported."""
    if how not in ("inner", "left"):
        raise ValueError("skew_join supports how='inner'/'left' only")
    from .sketch import heavy_hitters

    r_on = right_on or on
    # driver merge: the hot set is an advisory side-channel — k x blocks
    # partial rows to the driver beat the merge shuffle's fixed spin-up
    hot = heavy_hitters(left, on, k=hot_k * 4, top=hot_k,
                        merge="driver").to_pandas()
    hot_keys = hot["value"].to_numpy()
    href = ray.put(hot_keys)

    def _split(key_col):
        def _f(b: pa.Table, keep_hot: bool) -> pa.Table:
            mask = np.isin(b[key_col].to_numpy(zero_copy_only=False),
                           ray.get(href))
            return b.filter(pa.array(mask if keep_hot else ~mask))
        return _f

    lsplit, rsplit = _split(on), _split(r_on)
    left_hot = left.map_batches(lambda b: lsplit(b, True), batch_format="pyarrow")
    left_cold = left.map_batches(lambda b: lsplit(b, False), batch_format="pyarrow")
    # Collect the hot-right rows as ARROW blocks (never via pandas: an
    # empty to_pandas() round-trip loses the schema, and hot keys absent
    # from the right side are ordinary for left joins / non-covering
    # dimension tables).  Empty or all-empty -> a typed empty table built
    # from the right side's own schema.
    right_hot_ds = right.map_batches(lambda b: rsplit(b, True),
                                     batch_format="pyarrow")
    hot_blocks = [t for t in ray.get(right_hot_ds.to_arrow_refs())
                  if t.num_rows > 0]
    if hot_blocks:
        right_hot_tbl = pa.concat_tables(hot_blocks).combine_chunks()
    else:
        right_hot_tbl = right.schema().base_schema.empty_table()
    right_cold = right.map_batches(lambda b: rsplit(b, False),
                                   batch_format="pyarrow")

    hot_joined = broadcast_join(left_hot, right_hot_tbl, on=on, how=how,
                                right_on=r_on)
    cold_joined = hash_join(left_cold, right_cold, on=on, how=how,
                            num_partitions=num_partitions, right_on=r_on)
    # The two paths may ORDER columns differently, but a column present in
    # only one path would mean silent data loss in the union — fail loudly
    # instead of intersecting (pa.Table.join vs Dataset.join differ in key
    # retention/suffixing when right_on != on or names collide).
    hot_cols, cold_cols = hot_joined.schema().names, cold_joined.schema().names
    if set(hot_cols) != set(cold_cols):
        raise ValueError(
            f"skew_join path schemas diverged: broadcast-only "
            f"{sorted(set(hot_cols) - set(cold_cols))}, shuffle-only "
            f"{sorted(set(cold_cols) - set(hot_cols))}")
    return hot_joined.select_columns(hot_cols).union(
        cold_joined.select_columns(hot_cols))


def grouped_median(ds: Dataset, keys: list[str], col: str, out_col: str = "median",
                   num_partitions: int = 32) -> Dataset:
    """Grouped exact median — a HOLISTIC aggregate (needs every value of a
    key, unlike the algebraic ones in :func:`grouped_agg`): hash-partition by
    key, one vectorized pandas median per partition.  Linear-interpolation
    semantics match SQL ``median()`` for even counts."""

    def _med(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, observed=True, dropna=False)[col].median()
        return g.rename(out_col).reset_index()

    return grouped_transform(ds.select_columns(keys + [col]), keys, _med, num_partitions)


def grouped_quantiles(ds: Dataset, keys: list[str], col: str,
                      qs: "list[float]", prefix: str = "q",
                      num_partitions: int = 32,
                      discrete: bool = False) -> Dataset:
    """Grouped exact quantiles — holistic like :func:`grouped_median`; one
    vectorized pandas pass per partition.  ``discrete=False``: linear
    interpolation (SQL ``quantile_cont``); ``discrete=True``: SQL
    ``quantile_disc`` semantics — the FIRST actual value whose cumulative
    row fraction reaches q (pandas ``interpolation='lower'`` matches for
    q*n never landing exactly on an integer boundary; the exact-boundary
    case is handled by the explicit index formula).  Output columns
    ``<prefix><percent>``."""

    def _q(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, observed=True, dropna=False)[col]
        out = None
        for q in qs:
            if discrete:
                # SQL quantile_disc: element at index ceil(q*n) - 1 (1-based
                # first value with cum fraction >= q), exact for boundaries
                s = g.apply(lambda v, _q=q: np.sort(v.to_numpy())[
                    max(int(np.ceil(_q * len(v))) - 1, 0)])
                s = s.rename(f"{prefix}{int(q * 100)}")
            else:
                s = g.quantile(q, interpolation="linear").rename(f"{prefix}{int(q * 100)}")
            out = s.to_frame() if out is None else out.join(s)
        return out.reset_index()

    return grouped_transform(ds.select_columns(keys + [col]), keys, _q, num_partitions)


def grouped_count_distinct(ds: Dataset, keys: list[str], col: str,
                           out_col: str = "n_distinct",
                           num_partitions: int = 32) -> Dataset:
    """Grouped exact count-distinct, two-phase: per-batch (key, value)
    dedup bounds shuffle traffic to |distinct pairs| per block, then a
    per-partition nunique."""
    proj = ds.select_columns(keys + [col])
    partial = proj.map_batches(
        lambda df: df.drop_duplicates(keys + [col]), batch_format="pandas")

    def _cd(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(keys + [col]).groupby(keys, sort=False, observed=True, dropna=False)[col].size()
        return g.rename(out_col).astype(np.int64).reset_index()

    return grouped_transform(partial, keys, _cd, num_partitions)


_HLL_P = 12  # 4096 registers, ~1.6% relative error
_HLL_M = 1 << _HLL_P


def _hll_registers_many(h: np.ndarray, gid: np.ndarray, n_groups: int) -> np.ndarray:
    """(n_groups, 4096) uint8 HLL registers from uint64 hashes with a group id
    per hash — one vectorized ``np.maximum.at`` scatter, no per-value loop."""
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = h << np.uint64(_HLL_P)
    # rank = leading zeros of the remaining 64-P bits + 1 (capped)
    rank = np.full(len(h), 64 - _HLL_P + 1, dtype=np.uint8)
    nz = rest != 0
    if nz.any():
        bits = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        rank[nz] = (bits + 1).clip(1, 64 - _HLL_P + 1).astype(np.uint8)
    regs = np.zeros((n_groups, _HLL_M), dtype=np.uint8)
    np.maximum.at(regs, (gid, idx), rank)
    return regs


def _hll_estimate_many(regs: np.ndarray) -> np.ndarray:
    """Row-wise HLL estimates for a (n_groups, 4096) register matrix."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)), axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    if small.any():  # small-range (linear counting) correction
        est[small] = m * np.log(m / zeros[small])
    return est


def approx_count_distinct(ds: Dataset, keys: list[str], col: str,
                          out_col: str = "approx_distinct",
                          num_partitions: int = 32) -> Dataset:
    """Grouped APPROXIMATE count-distinct via a from-scratch HyperLogLog
    sketch (p=12, ~1.6% error): per-batch registers per key (4 KB each,
    bounded regardless of cardinality), register-wise max merge per
    partition.  Fully vectorized — value hashing is one
    ``pd.util.hash_pandas_object`` pass (deterministic cross-process
    siphash), register build is one scatter-max, merge is one
    ``maximum.reduceat`` — this operator exists FOR high cardinality, so the
    per-row path must be C-speed."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[col], index=False).to_numpy(dtype=np.uint64)
        grp = df.groupby(keys, sort=False, observed=True, dropna=False)
        gid = grp.ngroup().to_numpy()
        n_groups = int(gid.max()) + 1 if len(gid) else 0
        if not n_groups:
            return pd.DataFrame({**{k: df[k] for k in keys}, "__regs": []})
        regs = _hll_registers_many(h, gid, n_groups)
        _, first_idx = np.unique(gid, return_index=True)  # gid g -> first row
        out = df.iloc[first_idx][keys].reset_index(drop=True)
        out["__regs"] = [regs[g].tobytes() for g in range(n_groups)]
        return out

    partial = ds.select_columns(keys + [col]).map_batches(_partial, batch_format="pandas")

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        grp = df.groupby(keys, sort=False, observed=True, dropna=False)
        gid = grp.ngroup().to_numpy()
        n_groups = int(gid.max()) + 1 if len(gid) else 0
        if not n_groups:
            return pd.DataFrame({**{k: df[k] for k in keys}, out_col: []})
        R = np.frombuffer(b"".join(df["__regs"]), dtype=np.uint8).reshape(len(df), _HLL_M)
        order = np.argsort(gid, kind="stable")
        starts = np.concatenate(([0], np.cumsum(np.bincount(gid))[:-1]))
        merged = np.maximum.reduceat(R[order], starts, axis=0)
        est = np.round(_hll_estimate_many(merged)).astype(np.int64)
        _, first_idx = np.unique(gid, return_index=True)
        out = df.iloc[first_idx][keys].reset_index(drop=True)
        out[out_col] = est
        return out

    return grouped_transform(partial, keys, _merge, num_partitions)


def distinct_keys(ds: Dataset, col: str, num_partitions: int = 32) -> Dataset:
    """Distributed distinct of one column.  Two-phase: a per-block dedup
    bounds shuffle traffic to |distinct-in-block| rows per block (a hot key
    ships ONE row per block, never its raw rows), then a per-partition dedup
    after the key-hash co-partition.  The result Dataset has exactly
    |distinct| rows and never touches the driver."""
    proj = ds.select_columns([col])
    partial = proj.map_batches(lambda df: df.drop_duplicates(col), batch_format="pandas")
    return grouped_transform(partial, [col], lambda df: df.drop_duplicates(col),
                             num_partitions)


def grouped_stats(ds: Dataset, keys: list[str], col: str, col2: str | None = None,
                  num_partitions: int = 32) -> Dataset:
    """Grouped variance/stddev (population) and, with ``col2``, covariance +
    Pearson correlation — ALGEBRAIC two-phase: the partials are exact int64
    power sums (n, Σx, Σx², [Σy, Σy², Σxy]) combined per batch, so key skew
    ships one partial row per block; the final moments are one fixed-order
    float expression per key, reproducible bit-for-bit by a SQL oracle that
    names the same primitives (inputs must be scaled ints; Σx² must stay
    below 2^63).  Output: ``n, var_pop, std_pop`` (+ ``cov_pop, corr``)."""
    cols = [col] + ([col2] if col2 else [])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[keys].copy()
        x = df[col].to_numpy(np.int64)
        d["__n"] = np.int64(1)
        d["__sx"] = x
        d["__sxx"] = x * x
        if col2:
            y = df[col2].to_numpy(np.int64)
            d["__sy"] = y
            d["__syy"] = y * y
            d["__sxy"] = x * y
        g = d.groupby(keys, sort=False, observed=True, dropna=False).sum()
        return g.reset_index()

    partial = ds.select_columns(keys + cols).map_batches(_partial, batch_format="pandas")

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, observed=True, dropna=False).sum().reset_index()
        n = g["__n"].to_numpy(np.float64)
        sx = g["__sx"].to_numpy(np.float64)
        sxx = g["__sxx"].to_numpy(np.float64)
        out = g[keys].copy()
        out["n"] = g["__n"].to_numpy(np.int64)
        var = (sxx - sx * sx / n) / n
        out["var_pop"] = var
        out["std_pop"] = np.sqrt(var)
        if col2:
            sy = g["__sy"].to_numpy(np.float64)
            syy = g["__syy"].to_numpy(np.float64)
            sxy = g["__sxy"].to_numpy(np.float64)
            cov = (sxy - sx * sy / n) / n
            out["cov_pop"] = cov
            vy = (syy - sy * sy / n) / n
            out["corr"] = cov / (np.sqrt(var) * np.sqrt(vy))
        return out

    return grouped_transform(partial, keys, _final, num_partitions)


def set_op(left: Dataset, right: Dataset, how: str = "intersect",
           num_partitions: int = 32) -> Dataset:
    """SQL ``INTERSECT`` / ``EXCEPT`` (distinct semantics) over same-schema
    sides.  Per-block dedup bounds the shuffle to distinct rows per block;
    one key-hash co-partition on the full row then decides membership —
    never a driver-side collect."""
    if how not in ("intersect", "except"):
        raise ValueError(f"how must be intersect/except, got {how!r}")
    cols = list(left.schema().names)
    if list(right.schema().names) != cols:
        raise ValueError("set_op sides must share an identical schema")

    def _tag(side: int):
        def _f(df: pd.DataFrame) -> pd.DataFrame:
            d = df.drop_duplicates(cols).copy(deep=False)
            d["__side"] = np.int8(side)
            return d
        return _f

    both = union_all([left.map_batches(_tag(0), batch_format="pandas"),
                      right.map_batches(_tag(1), batch_format="pandas")])

    def _decide(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(cols, sort=False, observed=True, dropna=False)["__side"]
        has_l = g.min() == 0
        has_r = g.max() == 1
        keep = (has_l & has_r) if how == "intersect" else (has_l & ~has_r)
        return keep[keep].reset_index()[cols]

    return grouped_transform(both, cols, _decide, num_partitions)


def grouped_string_agg(ds: Dataset, keys: list[str], col: str, order_col: str,
                       sep: str = ",", out_col: str = "agg",
                       num_partitions: int = 32) -> Dataset:
    """SQL ``string_agg(col, sep ORDER BY order_col)`` per key — holistic
    (needs every member), one vectorized pandas join per partition."""

    def _cat(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_col, kind="stable")
        g = df.groupby(keys, sort=False, observed=True, dropna=False)[col]
        return g.agg(lambda s: sep.join(s.astype(str))).rename(out_col).reset_index()

    proj = list(dict.fromkeys(keys + [col, order_col]))  # col may BE order_col
    return grouped_transform(ds.select_columns(proj), keys, _cat, num_partitions)


def grouped_mode(ds: Dataset, keys: list[str], col: str, out_col: str = "mode",
                 num_partitions: int = 32) -> Dataset:
    """Grouped most-frequent value, lowest value on frequency ties —
    skew-proof two-phase: per-batch (key, value) counts collapse before the
    shuffle, the final pass merges counts and takes the deterministic
    argmax per key."""

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys + [col], sort=False, observed=True, dropna=False).size()
        return g.rename("__n").reset_index()

    partial = ds.select_columns(keys + [col]).map_batches(_counts, batch_format="pandas")

    def _pick(df: pd.DataFrame) -> pd.DataFrame:
        merged = (df.groupby(keys + [col], sort=False, observed=True, dropna=False)["__n"]
                  .sum().reset_index())
        merged = merged.sort_values([col], kind="stable").sort_values(
            ["__n"], ascending=False, kind="stable")
        first = merged.groupby(keys, sort=False, observed=True, dropna=False).head(1)
        return first[keys + [col]].rename(columns={col: out_col})

    return grouped_transform(partial, keys, _pick, num_partitions)


_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _bloom_indices(h: np.ndarray, num_bits: int, num_hashes: int, i: int) -> np.ndarray:
    """i-th double-hash index stream: (h1 + i*h2) mod m, h2 forced odd."""
    h2 = (h * _BLOOM_MIX) | np.uint64(1)
    return ((h + np.uint64(i) * h2) % np.uint64(num_bits)).astype(np.int64)


def _bloom_hash_values(values: pd.Series) -> np.ndarray:
    """Dtype-kind-insensitive key hash for the Bloom build/probe pair.

    ``hash_pandas_object`` hashes float64 and int64 differently, so an int64
    build side probed with a float64 left column (or vice versa) would miss
    every key — silently violating the filter's no-false-negative contract.
    Canonicalizing every numeric kind to float64 before hashing makes equal
    values hash equally across kinds; int64 values beyond 2^53 that collide
    in float64 collide identically on BOTH sides, so this only ever adds
    false positives (which the exact join downstream removes)."""
    if values.dtype.kind in "iuf":
        values = values.astype(np.float64)
    return pd.util.hash_pandas_object(values, index=False).to_numpy(dtype=np.uint64)


def build_bloom(ds: Dataset, col: str, num_bits: int = 1 << 23,
                num_hashes: int = 7) -> np.ndarray:
    """Distributed Bloom filter over a key column: every block sets its keys'
    bits into a local bitmap (vectorized scatter-OR), bitmaps OR-merge down
    to one — a fully mergeable build, never a key collect.  At ~10 bits/key
    the broadcast is ~6x smaller than a raw int64 key array (the point:
    prefilter broadcasts stay cheap when the distinct-key set is huge).
    Hashing is the deterministic cross-process ``hash_pandas_object``."""
    nbytes = num_bits // 8

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _bloom_hash_values(df[col])
        bits = np.zeros(nbytes, dtype=np.uint8)
        for i in range(num_hashes):
            idx = _bloom_indices(h, num_bits, num_hashes, i)
            np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
        return pd.DataFrame({"__bm": [bits.tobytes()], "__g": np.int8(0)})

    partial = ds.select_columns([col]).map_batches(_partial, batch_format="pandas")

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in df["__bm"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"__bm": [acc.tobytes()], "__g": np.int8(0)})

    merged = grouped_transform(partial, ["__g"], _merge, num_partitions=1).to_pandas()
    return np.frombuffer(merged["__bm"].iloc[0], dtype=np.uint8).copy()


def bloom_contains(bits: np.ndarray, values: pd.Series, num_hashes: int = 7) -> np.ndarray:
    """Vectorized membership probe (no false negatives even across mixed
    numeric dtype kinds — see :func:`_bloom_hash_values`; fp rate set by
    bits-per-key and num_hashes)."""
    num_bits = len(bits) * 8
    h = _bloom_hash_values(values)
    out = np.ones(len(h), dtype=bool)
    for i in range(num_hashes):
        idx = _bloom_indices(h, num_bits, num_hashes, i)
        out &= (bits[idx >> 3] & (np.uint8(1) << (idx & 7).astype(np.uint8))) != 0
    return out


def semi_join(left: Dataset, right: Dataset, on: str, right_on: str,
              anti: bool = False, broadcast: bool = True,
              num_partitions: int = 32,
              bloom_bits: int | None = None) -> Dataset:
    """Semi join (keep left rows whose key appears on the right) or anti join
    (``anti=True``: keep rows whose key does NOT).

    The right side's distinct-key build is DISTRIBUTED either way
    (:func:`distinct_keys`: per-block dedup -> key-hash shuffle -> per-
    partition dedup), so no path ever materializes the raw right side on the
    driver.  Two execution shapes:

    - ``broadcast=True`` (default): the deduped key set — |distinct| rows,
      not |right| — is collected, ``ray.put`` once, and applied as an
      ``np.isin`` filter per batch; zero shuffle on the left.  Use when the
      distinct keys fit in one object-store value (the overwhelmingly common
      case: semi joins against id sets).
    - ``broadcast=False``: fully-distributed fallback for a huge distinct-key
      set — the deduped keys get a marker column and ``Dataset.join`` does a
      left outer hash join; semi keeps marked rows, anti keeps unmarked.
      Driver footprint is O(1).  With ``bloom_bits`` set, a distributed-
      built Bloom filter (:func:`build_bloom`, ~6x smaller broadcast than a
      key array) PREFILTERS the left side before the shuffle: semi-join
      left rows that cannot match never enter the join (no false
      negatives, so the exact join after the prefilter keeps the result
      exact; anti joins skip the prefilter — a Bloom 'maybe' cannot prove
      absence).
    """
    uniq = distinct_keys(right, right_on, num_partitions)
    if not broadcast and bloom_bits and not anti:
        bloom = build_bloom(uniq, right_on, num_bits=bloom_bits)
        bref = ray.put(bloom)

        def _pre(df: pd.DataFrame) -> pd.DataFrame:
            return df[bloom_contains(ray.get(bref), df[on])]

        left = left.map_batches(_pre, batch_format="pandas")
    if broadcast:
        keys = np.sort(uniq.to_pandas()[right_on].to_numpy())
        ref = ray.put(keys)

        def _filter(batch: pa.Table) -> pa.Table:
            mask = np.isin(batch[on].to_numpy(), ray.get(ref), invert=anti)
            return batch.filter(pa.array(mask))

        return left.map_batches(_filter, batch_format="pyarrow")

    marker, key_alias = "__semi_m", "__semi_k"  # private names: no collision
    out_cols = list(left.schema().names)

    # Arrow's hash join refuses mixed key types (int64 vs double).  When the
    # two sides' numeric kinds differ, join through a derived float64 key on
    # BOTH sides — the exact equality semantics np.isin gives the broadcast
    # path (it promotes to the common float64 type too).  (ADVICE r02.)
    _lsch, _rsch = left.schema(), uniq.schema()
    lt = _lsch.types[_lsch.names.index(on)]
    rt = _rsch.types[_rsch.names.index(right_on)]
    mixed_numeric = (lt != rt
                     and (pa.types.is_integer(lt) or pa.types.is_floating(lt))
                     and (pa.types.is_integer(rt) or pa.types.is_floating(rt)))
    join_on = on
    if mixed_numeric:
        join_on = "__semi_lk"

        def _lkey(batch: pa.Table) -> pa.Table:
            return batch.append_column(join_on, pc.cast(batch[on], pa.float64()))

        left = left.map_batches(_lkey, batch_format="pyarrow")

    def _mark(batch: pa.Table) -> pa.Table:
        k = batch[right_on]
        if mixed_numeric:
            k = pc.cast(k, pa.float64())
        return pa.table({key_alias: k,
                         marker: pa.array(np.ones(len(batch), dtype=np.int8))})

    marked = uniq.map_batches(_mark, batch_format="pyarrow")
    j = hash_join(left, marked, on=join_on, right_on=key_alias, how="left",
                  num_partitions=num_partitions)

    def _keep(batch: pa.Table) -> pa.Table:
        m = batch[marker]
        mask = pc.is_null(m) if anti else pc.is_valid(m)
        return batch.filter(mask).select(out_cols)

    return j.map_batches(_keep, batch_format="pyarrow")


def range_join(
    left: Dataset,
    intervals: "pd.DataFrame | Dataset",
    left_val: str,
    lo_col: str,
    hi_col: str,
) -> Dataset:
    """Broadcast interval (range) join: one output row per (left row,
    interval) pair with ``lo <= left_val <= hi`` (inclusive) — the non-equi
    join the Dataset API lacks (IP->geo ranges, price bands, time windows).

    The interval table is the SMALL side by contract: materialized once,
    ``ray.put`` once, fetched zero-copy per actor — never re-shipped per
    batch.  Matching is a vectorized mask per interval (O(|intervals| x
    batch_rows) numpy passes, the `assign_regions` pattern).  For a large
    interval side, co-partition both sides on a coarse band key and apply
    this within partitions instead."""
    if isinstance(intervals, Dataset):
        intervals = intervals.to_pandas()
    iv_payload = [c for c in intervals.columns if c not in (lo_col, hi_col)]
    overlap = set(iv_payload) & set(left.schema().names)
    if overlap:
        raise ValueError(f"interval payload columns collide with left side: {overlap}")
    ref = ray.put({
        "lo": intervals[lo_col].to_numpy(),
        "hi": intervals[hi_col].to_numpy(),
        **{c: intervals[c].to_numpy() for c in iv_payload},
    })

    def _join(batch: pd.DataFrame) -> pd.DataFrame:
        iv = ray.get(ref)
        v = batch[left_val].to_numpy()
        parts = []
        for j in range(len(iv["lo"])):
            m = (v >= iv["lo"][j]) & (v <= iv["hi"][j])
            if m.any():
                hit = batch[m].copy(deep=False)
                for c in iv_payload:
                    hit[c] = iv[c][j]
                parts.append(hit)
        if not parts:
            out = batch.iloc[0:0].copy()
            for c in iv_payload:
                out[c] = iv[c][:0]
            return out
        return pd.concat(parts, ignore_index=True)

    return left.map_batches(_join, batch_format="pandas")


def range_join_copartitioned(
    left: Dataset,
    intervals: Dataset,
    left_val: str,
    lo_col: str,
    hi_col: str,
    band_width: float,
    num_partitions: int = 32,
) -> Dataset:
    """Big-big interval join: one output row per (left row, interval) with
    ``lo <= left_val <= hi`` — the co-partitioned scale path
    :func:`range_join`'s docstring promises for interval sides too large to
    broadcast.

    Both sides band on ``floor(value / band_width)``: a point lands in
    exactly ONE band, an interval explodes to every band it overlaps, and
    one :func:`grouped_transform` shuffle co-locates them.  Within a band
    the match is fully vectorized (sorted points + two searchsorteds per
    interval batch, pair fan-out via repeat/arange) — no per-pair Python.

    A (point, interval) pair meets only in the point's band, so no dedup
    pass is needed.  Partitioning contract: shuffle volume for an interval
    is O(interval_length / band_width) rows — pick ``band_width`` on the
    order of the typical interval length; a band's content must fit one
    partition (hot-band bound, same as every keyed op here).
    """
    l_schema, i_schema = left.schema(), intervals.schema()
    iv_payload = [c for c in i_schema.names if c not in (lo_col, hi_col)]
    overlap = set(iv_payload) & set(l_schema.names)
    if overlap:
        raise ValueError(f"interval payload columns collide with left side: {overlap}")
    lcols = list(l_schema.names)
    dtypes = {c: _pd_dtype_of(t) for c, t in
              list(zip(l_schema.names, l_schema.types)) + list(zip(i_schema.names, i_schema.types))}

    def _band_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__band"] = np.floor(df[left_val].to_numpy(np.float64) / band_width).astype(np.int64)
        df["__side"] = np.int8(0)
        for c in lcols:  # agreed union dtype on both sides: no upcast
            df[c] = df[c].astype(dtypes[c])
        for c in (lo_col, hi_col, *iv_payload):
            df[c] = _typed_null_series(dtypes[c], len(df))
        return df

    def _band_iv(df: pd.DataFrame) -> pd.DataFrame:
        lo = df[lo_col].to_numpy(np.float64)
        hi = df[hi_col].to_numpy(np.float64)
        b0 = np.floor(lo / band_width).astype(np.int64)
        b1 = np.floor(hi / band_width).astype(np.int64)
        cnt = (b1 - b0 + 1).clip(min=0)
        idx = np.repeat(np.arange(len(df)), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        band = np.arange(int(cnt.sum())) - np.repeat(offs, cnt) + np.repeat(b0, cnt)
        out = df.iloc[idx].copy(deep=False)
        out["__band"] = band
        out["__side"] = np.int8(1)
        for c in i_schema.names:
            out[c] = out[c].astype(dtypes[c])
        for c in lcols:
            out[c] = _typed_null_series(dtypes[c], len(out))
        return out

    l2 = left.map_batches(_band_left, batch_format="pandas")
    i2 = intervals.map_batches(_band_iv, batch_format="pandas")
    out_cols = lcols + iv_payload

    def _match(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("__band", sort=False):
            pts = g[g["__side"] == 0]
            ivs = g[g["__side"] == 1]
            if len(pts) == 0 or len(ivs) == 0:
                continue
            order = np.argsort(pts[left_val].to_numpy(np.float64), kind="stable")
            p = pts.iloc[order]
            pv = p[left_val].to_numpy(np.float64)
            starts = np.searchsorted(pv, ivs[lo_col].to_numpy(np.float64), side="left")
            ends = np.searchsorted(pv, ivs[hi_col].to_numpy(np.float64), side="right")
            cnt = (ends - starts).clip(min=0)
            total = int(cnt.sum())
            if total == 0:
                continue
            iidx = np.repeat(np.arange(len(ivs)), cnt)
            offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            pidx = np.arange(total) - np.repeat(offs, cnt) + np.repeat(starts, cnt)
            out = p.iloc[pidx][lcols].reset_index(drop=True)
            ivp = ivs.iloc[iidx].reset_index(drop=True)
            for c in iv_payload:
                out[c] = ivp[c]
            outs.append(out)
        if not outs:
            res = pd.DataFrame({c: pd.Series(dtype=df[c].dtype) for c in out_cols})
        else:
            res = pd.concat(outs, ignore_index=True)
        # inner-join semantics: no nulls survive -> downcast the nullable
        # union dtypes back to plain numpy for downstream consumers
        for c in out_cols:
            dt = str(res[c].dtype)
            if dt == "Int64":
                res[c] = res[c].astype(np.int64)
            elif dt == "boolean":
                res[c] = res[c].astype(bool)
        return res

    return grouped_transform(union_all([l2, i2]), ["__band"], _match, num_partitions)


def copart_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: "str | None" = None,
    how: str = "inner",
    num_partitions: int = 32,
) -> Dataset:
    """Equi-join WITHOUT Ray's join-aggregator actors: side-tag both inputs,
    ONE key-hash co-partition shuffle (:func:`grouped_transform`), vectorized
    ``pandas.merge`` per partition.

    Why it exists: ``Dataset.join`` runs on HashShuffleAggregator ACTORS;
    this path is pure tasks over the existing grouped_transform shuffle —
    an alternative for environments where actor pools are constrained, and
    the building block asof/range joins already use.  MEASURED on this box
    (sf0.1 orders x lineitem, 32 CPUs): Dataset.join 5.0 s vs copart 6.5 s —
    the actor spin-up amortizes and the side-union (typed-null filler
    columns for schema alignment) roughly doubles shuffled column count, so
    ``hash_join`` (Dataset.join) remains the DEFAULT join everywhere; this
    is correctness-equivalent optionality, not the fast path.

    Constraints (same family as :func:`asof_join`): payload column names
    disjoint across sides; integer-like keys (transit as int64); ``how`` in
    inner/left.  Left-join output payloads are type-preserving nullable
    (Int64/NaT/NaN); inner-join outputs downcast back to their plain dtypes
    so value-hash comparators see int64."""
    if how not in ("inner", "left"):
        raise ValueError(f"copart_join supports inner/left, got {how!r}")
    r_on = right_on or on
    l_schema, r_schema = left.schema(), right.schema()
    lcols, rcols = list(l_schema.names), list(r_schema.names)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"side column names must be disjoint; overlap: {overlap}")
    dtypes = {c: _pd_dtype_of(t) for c, t in
              list(zip(l_schema.names, l_schema.types)) + list(zip(r_schema.names, r_schema.types))}
    plain = {c: {"Int64": "int64", "boolean": "bool"}.get(d) for c, d in dtypes.items()}
    _typed_null = _typed_null_series

    def _tag(side: int, key_col: str, own_cols: list[str], other_cols: list[str]):
        def _f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            df["__side"] = np.int8(side)
            df["__key"] = df[key_col].to_numpy(dtype=np.int64)
            for c in own_cols:
                if str(df[c].dtype) != dtypes[c]:
                    df[c] = df[c].astype(dtypes[c])
            for c in other_cols:
                df[c] = _typed_null(dtypes[c], len(df))
            return df

        return _f

    l2 = left.map_batches(_tag(0, on, lcols, rcols), batch_format="pandas")
    r2 = right.map_batches(_tag(1, r_on, rcols, lcols), batch_format="pandas")
    out_cols = lcols + rcols

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1]
        lf = l[lcols + ["__key"]]
        rf = r[rcols + ["__key"]]
        if len(lf) == 0:
            return df.iloc[0:0][out_cols]
        if len(rf) == 0:
            if how == "inner":
                return df.iloc[0:0][out_cols]
            out = lf.drop(columns="__key").copy()
            for c in rcols:
                out[c] = _typed_null(dtypes[c], len(out))
            return out[out_cols]
        merged = pd.merge(lf, rf, on="__key", how=how, sort=False)
        merged = merged[out_cols]
        if how == "inner":  # no nulls possible: hand back plain dtypes
            for c in out_cols:
                if plain[c]:
                    merged[c] = merged[c].astype(plain[c])
        return merged

    return grouped_transform(union_all([l2, r2]), ["__key"], _merge, num_partitions)


def asof_join(
    left: Dataset,
    right: Dataset,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    direction: str = "backward",
    num_partitions: int = 32,
) -> Dataset:
    """As-of join: each left row is matched to the single right row with the
    largest ``right_ts <= left_ts`` (direction='backward', inclusive) sharing
    the key — an operator the Dataset API lacks (DuckDB ``ASOF JOIN`` is the
    test oracle).

    Ray-Data-first implementation: both sides are side-tagged and
    co-partitioned by key hash through ONE :func:`grouped_transform` shuffle;
    each partition runs a vectorized ``pandas.merge_asof``.  Documented
    constraints:

    - column names of the two sides must be disjoint (rename upstream);
    - key columns are integer-like; both timestamps transit as int64 us;
    - output payload dtypes are TYPE-PRESERVING nullable: integer payloads
      come back as pandas ``Int64`` (``pd.NA`` where unmatched), timestamps
      as ``datetime64[us]`` (``NaT``), floats as float64 (``NaN``) — never
      a silent float upcast of either side's int columns; callers
      ``fillna``+``astype`` downstream;
    - the right side should be unique per (key, ts) — pre-aggregate ties
      upstream for deterministic output;
    - partitioning assumption: every row of one key lands in one partition
      (bounded by that partition's memory for a pathological hot key);
    - both sides' schemas are inspected up front: a SHUFFLE-rooted side
      (groupby/sort output) would execute once for the schema and again for
      the join — ``materialize()`` such a side first if it is bounded.
    """
    l_schema, r_schema = left.schema(), right.schema()
    lcols = list(l_schema.names)
    rcols = list(r_schema.names)
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"side column names must be disjoint; overlap: {overlap}")

    # one target dtype per payload column: BOTH sides' blocks carry it, so
    # the union never upcasts and unmatched rows get typed nulls
    dtypes = {c: _pd_dtype_of(t) for c, t in
              list(zip(l_schema.names, l_schema.types)) + list(zip(r_schema.names, r_schema.types))}
    _typed_null = _typed_null_series

    def _tag(side: int, ts_col: str, by_col: str, own_cols: list[str], other_cols: list[str]):
        def _f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            df["__side"] = np.int8(side)
            df["__key"] = df[by_col].to_numpy(dtype=np.int64)
            df["__ts"] = df[ts_col].astype("datetime64[us]").astype(np.int64)
            for c in own_cols:
                if str(df[c].dtype) != dtypes[c]:  # skip no-op casts
                    df[c] = df[c].astype(dtypes[c])
            for c in other_cols:  # the other side's payload: typed nulls
                df[c] = _typed_null(dtypes[c], len(df))
            return df

        return _f

    l2 = left.map_batches(_tag(0, left_ts, left_by, lcols, rcols), batch_format="pandas")
    r2 = right.map_batches(_tag(1, right_ts, right_by, rcols, lcols), batch_format="pandas")
    out_cols = lcols + rcols

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1]
        lf = l[lcols + ["__key", "__ts"]]
        rf = r[rcols + ["__key", "__ts"]]
        if len(lf) == 0:  # partition holds only right-side keys
            return df.iloc[0:0][out_cols]
        if len(rf) == 0:
            out = lf.drop(columns=["__key", "__ts"]).copy()
            for c in rcols:
                out[c] = _typed_null(dtypes[c], len(out))
            return out[out_cols]
        merged = pd.merge_asof(
            lf.sort_values("__ts", kind="stable"),
            rf.sort_values("__ts", kind="stable"),
            on="__ts", by="__key", direction=direction,
        )
        return merged[out_cols]

    return grouped_transform(union_all([l2, r2]), ["__key"], _merge, num_partitions)


# ---------------------------------------------------------------------------
# per-batch map helpers
# ---------------------------------------------------------------------------

def unpivot(ds: Dataset, id_cols: list[str], value_cols: list[str],
            key_col: str = "key", value_col: str = "value") -> Dataset:
    """Wide -> long (SQL ``UNPIVOT`` / pandas ``melt``): one output row per
    (input row, value column).  Stateless per-batch explode — no shuffle;
    the inverse of the pivot/one-hot composition."""

    def _melt(df: pd.DataFrame) -> pd.DataFrame:
        return df.melt(id_vars=id_cols, value_vars=value_cols,
                       var_name=key_col, value_name=value_col)

    return ds.select_columns(id_cols + value_cols).map_batches(
        _melt, batch_format="pandas")


def explode_list(ds: Dataset, id_cols: list[str], list_col: str,
                 pos_col: str = "pos", value_col: str = "value") -> Dataset:
    """List-column -> rows (SQL ``UNNEST WITH ORDINALITY``): one output row
    per (input row, list element), carrying the 0-based element position.

    Stateless per-batch explode on the Arrow buffers — ``list_flatten`` is
    zero-copy for the values, ids repeat by the offset deltas, positions are
    one ``arange`` minus the repeated list starts.  No shuffle, no Python
    loop; the multiplicative output size is the caller's contract (same rule
    as :func:`cross_join`)."""

    def _explode(b: pa.Table) -> pa.Table:
        col = b[list_col].combine_chunks()  # ChunkedArray -> one ListArray
        offs = np.asarray(col.offsets)
        lens = np.diff(offs)
        idx = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        pos = np.arange(int(offs[-1] - offs[0]), dtype=np.int64) - np.repeat(
            (offs[:-1] - offs[0]).astype(np.int64), lens)
        cols = {c: b[c].take(pa.array(idx)) for c in id_cols}
        cols[pos_col] = pa.array(pos)
        cols[value_col] = pc.list_flatten(col)
        return pa.table(cols)

    return ds.select_columns(id_cols + [list_col]).map_batches(
        _explode, batch_format="pyarrow")


def cross_join(left: Dataset, small: pa.Table) -> Dataset:
    """Broadcast cartesian product: every left row x every row of the small
    driver-resident side (``ray.put`` once).  Output size multiplies by
    ``len(small)`` — the caller owns that contract; useful for small
    calendar/parameter grids."""
    overlap = set(small.column_names) & set(left.schema().names)
    if overlap:
        raise ValueError(f"cross_join column collision: {overlap}")
    ref = ray.put(small)

    def _prod(batch: pa.Table) -> pa.Table:
        s: pa.Table = ray.get(ref)
        n, m = len(batch), len(s)
        big = batch.take(pa.array(np.repeat(np.arange(n), m)))
        rep = s.take(pa.array(np.tile(np.arange(m), n)))
        for name in rep.column_names:
            big = big.append_column(name, rep[name])
        return big

    return left.map_batches(_prod, batch_format="pyarrow")


def one_hot(ds: Dataset, col: str, values: Iterable, prefix: str | None = None) -> Dataset:
    """One-hot columns ``<prefix><v>`` as int64 0/1 — the reference's
    ``mutate(ifelse(Training.Class==k,1,0))`` x5 (``Supplemental_Data_1.R:195-201``)."""
    values = list(values)
    prefix = prefix if prefix is not None else f"{col}_"

    def _oh(batch: pa.Table) -> pa.Table:
        for v in values:
            name = f"{prefix}{v}"
            batch = batch.append_column(name, pc.cast(pc.equal(batch[col], pa.scalar(v)), pa.int64()))
        return batch

    return ds.map_batches(_oh, batch_format="pyarrow")


def fill_null(ds: Dataset, fills: dict[str, Any]) -> Dataset:
    """NA->value imputation per column (``df[is.na(df)] = 0``,
    ``Supplemental_Data_1.R:229,247,270``)."""

    def _fill(batch: pa.Table) -> pa.Table:
        for col, v in fills.items():
            i = batch.schema.get_field_index(col)
            filled = pc.fill_null(batch[col], pa.scalar(v, type=batch.schema.field(i).type))
            batch = batch.set_column(i, col, filled)
        return batch

    return ds.map_batches(_fill, batch_format="pyarrow")


def argmax_vote(
    ds: Dataset, prob_cols: list[str], class_col: str = "class", max_col: str = "max_value"
) -> Dataset:
    """Row-wise argmax vote with FIRST-index tie-break (R ``which.max``,
    ``Supplemental_Data_1.R:370,376-378``): class = 1-based index of the first
    maximal column; plus the row max."""

    def _vote(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[prob_cols].to_numpy()
        batch[class_col] = (m.argmax(axis=1) + 1).astype(np.int64)  # np.argmax = first max
        batch[max_col] = m.max(axis=1)
        return batch

    return ds.map_batches(_vote, batch_format="pandas")


# ---------------------------------------------------------------------------
# dedup / ordering / sampling / layout
# ---------------------------------------------------------------------------

def dedup_exact(ds: Dataset, keys: list[str], tie_col: str, num_partitions: int = 32) -> Dataset:
    """Exact dedup: hash-partition by ``keys``, keep the row with the minimal
    ``tie_col`` per group (deterministic ``distinct()``,
    ``Supplemental_Data_1.R:231``).  Vectorized per partition — one pandas
    idxmin per partition, not one Python call per distinct key.

    Skew-proof: a per-batch partial keeps at most one row per key per block
    BEFORE the shuffle, so a hot key ships one row per block — never its raw
    rows (min-of-mins == global min; the §4 salted-agg remedy for free)."""

    def _first(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df.groupby(keys, sort=False, observed=True, dropna=False)[tie_col].idxmin()]

    partial = ds.map_batches(lambda df: _first(df.reset_index(drop=True)),
                             batch_format="pandas")
    return grouped_transform(partial, keys, _first, num_partitions)


def topk(ds: Dataset, key: str | list[str], k: int, descending: bool | list[bool] = True) -> Dataset:
    """Global top-k = range-shuffle sort + limit.  Callers include a unique
    tie-break key so the boundary row is deterministic (SURVEY.md O4)."""
    return ds.sort(key, descending=descending).limit(k)


def grouped_topk(ds: Dataset, keys: list[str], order_col: str, k: int,
                 tie_col: str | None = None, descending: bool = True,
                 num_partitions: int = 32) -> Dataset:
    """Per-key top-k rows by ``order_col`` (ties broken by ``tie_col``
    ascending — pass a unique id for determinism).  Skew-proof two-phase:
    each block keeps its local top-k per key BEFORE the shuffle (local top-k
    superset contains the global top-k), so a hot key ships k rows per block."""
    by = [order_col] + ([tie_col] if tie_col else [])
    asc = [not descending] + ([True] if tie_col else [])

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(by, ascending=asc, kind="stable")
                .groupby(keys, sort=False, observed=True, dropna=False)
                .head(k))

    partial = ds.map_batches(_local, batch_format="pandas")
    return grouped_transform(partial, keys, _local, num_partitions)


def weighted_sample_topk(
    ds: Dataset,
    k: int,
    id_col: str,
    weight_col: str,
    batch_size: int = 65536,
) -> Dataset:
    """Deterministic weighted sampling WITHOUT replacement (the
    Efraimidis-Spirakis A-Res order-sampling scheme): each row gets key
    ``u ** (1/w)`` where ``u = (md5_u32(id) + 0.5) / 2**32`` is a FIXED
    uniform of the row id — P(selected) is proportional to weight, and the
    sample is identical at any partitioning, on resume, and in the SQL
    twin (no RNG state; the engine's md5 selection hash, cf.
    ``deterministic_mix``).  Rows with ``w <= 0`` get key 0 and are only
    drawn after every positive-weight row.

    Distributed shape: each block keeps its LOCAL k largest keys (a
    superset of the global top-k), so only ``k`` rows per block reach the
    final sort+limit — the importance-sampling primitive for building
    weighted data mixtures at corpus scale.  The key column is dropped
    from the output (float keys are libm-sensitive; selection flips at
    the k-boundary are measure-zero, the repo's goode_tiles discipline).
    """
    import hashlib

    def _key(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        u = np.empty(len(ids), dtype=np.float64)
        for i, v in enumerate(ids):
            u[i] = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        u = (u + 0.5) / 4294967296.0
        w = df[weight_col].to_numpy(dtype=np.float64)
        key = np.where(w > 0, np.power(u, 1.0 / np.where(w > 0, w, 1.0)), 0.0)
        df = df.copy(deep=False)
        df["__wkey"] = key
        if len(df) > k:
            # same (key desc, id asc) rule as the global phase, so exact
            # key ties (w <= 0 rows share key 0.0) resolve identically
            df = df.sort_values(["__wkey", id_col],
                                ascending=[False, True], kind="stable").head(k)
        return df

    local = ds.map_batches(_key, batch_format="pandas", batch_size=batch_size)
    top = local.sort(["__wkey", id_col], descending=[True, False]).limit(k)
    return top.map_batches(lambda df: df.drop(columns=["__wkey"]),
                           batch_format="pandas")


def grouped_sample_topk(
    ds: Dataset,
    keys: "list[str]",
    k: int,
    id_col: str,
    num_partitions: int = 32,
) -> Dataset:
    """Deterministic per-key k-sample WITHOUT replacement: within each key
    group, keep the k rows with the smallest ``(md5_u32(id), id)`` — a pure
    hash order, so the sample is identical at any partitioning, on resume,
    and in the SQL twin (``QUALIFY row_number() OVER (PARTITION BY keys
    ORDER BY md5_u32(id), id) <= k``; the integer hash ranks directly, no
    float key to disagree on).  The uniform-weights sibling of
    :func:`weighted_sample_topk`, per key: the primitive for per-source /
    per-domain corpus subsampling.

    Skew-proof two-phase (the :func:`grouped_topk` discipline): every block
    keeps its LOCAL k smallest per key before the shuffle — a hot key ships
    k rows per block, never its full group."""
    import hashlib

    def _key(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        u = np.empty(len(ids), dtype=np.int64)
        for i, v in enumerate(ids):
            u[i] = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        df = df.copy(deep=False)
        df["__skey"] = u
        return (df.sort_values(["__skey", id_col], kind="stable")
                .groupby(keys, sort=False, observed=True, dropna=False)
                .head(k))

    local = ds.map_batches(_key, batch_format="pandas")

    def _final(part: pd.DataFrame) -> pd.DataFrame:
        return (part.sort_values(["__skey", id_col], kind="stable")
                .groupby(keys, sort=False, observed=True, dropna=False)
                .head(k).drop(columns="__skey"))

    return grouped_transform(local, keys, _final, num_partitions)


def stratified_sample(
    ds: Dataset, stratum_col: str, n_per_stratum: int, seed: int, id_col: str
) -> Dataset:
    """Per-stratum sample WITHOUT replacement, ``min(n, |stratum|)`` rows.

    Deterministic regardless of partitioning: each group is sorted by
    ``id_col`` first, and the RNG seed is derived from (seed, stratum value) —
    the engine version of the reference's commented accuracy-assessment
    sampler (``sample_n``, ``Supplemental_Data_1.R:826-844``).
    """

    def _sample(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        sv = g.iloc[0][stratum_col]
        rng = np.random.default_rng((seed ^ stable_hash64(str(sv))) & 0x7FFFFFFFFFFFFFFF)
        take = min(n_per_stratum, len(g))
        idx = np.sort(rng.choice(len(g), size=take, replace=False))
        return g.iloc[idx]

    return ds.groupby(stratum_col).map_groups(_sample, batch_format="pandas")


def stratified_sample_allocated(
    ds: Dataset, stratum_col: str, id_col: str, total: int = 750,
    floor: int = 40, seed: int = 42, num_partitions: int = 32,
) -> Dataset:
    """Proportional stratified sampling with the reference's allocation rule
    (``Supplemental_Data_1.R:764-770,826-844``): each stratum gets
    ``round(count/total_rows * total)`` rows, clamped UP to ``floor`` unless
    the stratum is smaller than the floor (then all of it).  Deterministic:
    per-stratum RNG seeded from (seed, stratum), rows chosen over the
    id-sorted stratum — partitioning-invariant, like
    :func:`stratified_sample`.

    ``round`` is half-away-from-zero (``floor(x + 0.5)``) on BOTH the engine
    and the SQL-oracle side — an explicit, reproducible tie rule (R's own
    ``round`` is half-to-even; the ±1 allocation difference is immaterial,
    cross-engine determinism is not).  The drawn sample is further clamped
    to the stratum size (``take = min(alloc, len)``) — skew can push
    ``round(cnt/total_rows * total)`` above ``cnt``; the SQL oracle states
    the same clamp via ``LEAST(cnt, ...)`` (ADVICE r02).

    The allocation table is |strata| rows (small by the operator's nature) —
    computed distributed, collected once, broadcast into the per-group
    sampler."""
    counts = (grouped_agg(ds.select_columns([stratum_col, id_col]),
                          [stratum_col], {"cnt": (id_col, "size")})
              .to_pandas())
    n_total = float(counts["cnt"].sum())
    num = np.floor(counts["cnt"].to_numpy() / n_total * total + 0.5).astype(np.int64)
    cnt = counts["cnt"].to_numpy()
    alloc = np.where(cnt < floor, cnt, np.maximum(num, floor))
    alloc_ref = ray.put(dict(zip(counts[stratum_col].tolist(), alloc.tolist())))

    def _sample(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        sv = g.iloc[0][stratum_col]
        take = min(int(ray.get(alloc_ref)[sv]), len(g))
        rng = np.random.default_rng((seed ^ stable_hash64(str(sv))) & 0x7FFFFFFFFFFFFFFF)
        idx = np.sort(rng.choice(len(g), size=take, replace=False))
        return g.iloc[idx]

    return ds.groupby(stratum_col).map_groups(_sample, batch_format="pandas")


def add_rank(ds: Dataset, key: str, rank_col: str = "rank",
             num_buckets: int = 64, sample_per_block: int = 64) -> Dataset:
    """Global 1-based rank of ``key`` (row_number over key order; with tied
    keys, intra-key order is partition order — callers use unique keys).

    Range-partitioned histogram implementation — driver footprint is
    O(num_buckets), independent of row count AND key cardinality:

    1. sample ~``sample_per_block`` keys per block -> ``num_buckets-1``
       positional split points (works for any sortable dtype, no numeric
       quantiles needed);
    2. one distributed pass counts rows per bucket (per-batch ``bincount``
       partials -> tiny global combine -> num_buckets rows on the driver);
    3. cumulative bucket offsets broadcast via ``ray.put``; a key-range
       co-partition (:func:`grouped_transform` on the bucket id) sorts each
       bucket by key and emits ``offset + position + 1``.

    Equal keys always share a bucket (``searchsorted side='right'``), so the
    result is deterministic for unique keys regardless of block layout.  A
    single massively-hot key concentrates its bucket in one partition —
    documented skew bound, irrelevant under the unique-key contract.
    """
    proj = ds.select_columns([key])
    samp = proj.map_batches(
        lambda df: df.iloc[:: max(1, len(df) // sample_per_block)],
        batch_format="pandas").to_pandas()
    vals = np.sort(samp[key].to_numpy())
    if len(vals):
        cuts = vals[np.linspace(0, len(vals) - 1, num_buckets + 1).astype(np.int64)[1:-1]]
        bounds = np.unique(cuts)
    else:
        bounds = vals  # empty input: single bucket 0
    b_ref = ray.put(bounds)

    def _bucket_of(keys_arr: np.ndarray) -> np.ndarray:
        return np.searchsorted(ray.get(b_ref), keys_arr, side="right")

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        b = _bucket_of(df[key].to_numpy())
        n = np.bincount(b, minlength=len(bounds) + 1)
        return pd.DataFrame({"__bucket": np.arange(len(n), dtype=np.int64),
                             "__n": n.astype(np.int64)})

    counts = (grouped_agg(proj.map_batches(_count, batch_format="pandas"),
                          ["__bucket"], {"n": ("__n", "sum")})
              .to_pandas().sort_values("__bucket"))
    offsets = np.zeros(len(bounds) + 1, dtype=np.int64)
    cum = np.concatenate(([0], counts["n"].to_numpy().cumsum()[:-1]))
    offsets[counts["__bucket"].to_numpy()] = cum
    o_ref = ray.put(offsets)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__bucket"] = _bucket_of(df[key].to_numpy()).astype(np.int64)
        return df

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(o_ref)
        out = []
        for b, g in df.groupby("__bucket", sort=False):
            g = g.sort_values(key, kind="stable")
            g[rank_col] = off[int(b)] + np.arange(1, len(g) + 1, dtype=np.int64)
            out.append(g)
        return pd.concat(out, ignore_index=True).drop(columns="__bucket")

    tagged = ds.map_batches(_tag, batch_format="pandas")
    return grouped_transform(tagged, ["__bucket"], _rank)


def running_total(ds: Dataset, key_col: str, tiebreak_col: str,
                  value_col: str, out_col: str = "running_sum",
                  num_buckets: int = 64,
                  sample_per_block: int = 64) -> Dataset:
    """Distributed PREFIX SUM: cumulative sum of ``value_col`` over the
    global ``(key_col, tiebreak_col)`` order — SQL ``SUM(v) OVER (ORDER BY
    key, tiebreak)`` — without any single-node pass over the data.

    The :func:`add_rank` range-histogram pattern generalized from counts to
    value sums: sampled split points bucket the key range; one distributed
    pass computes per-bucket VALUE SUMS (per-batch ``np.add.at`` partials ->
    tiny combine -> O(num_buckets) rows on the driver); cumulative bucket
    offsets broadcast; a key-range co-partition sorts each bucket by
    ``(key, tiebreak)`` and emits ``offset + local cumsum``.  ``value_col``
    must be integer/scaled-int (associative exact sums — the engine's
    float-determinism contract); ``(key, tiebreak)`` must be unique.

    Equal keys always share a bucket (``searchsorted side='right'``), so
    intra-bucket sorting sees every tie and the result is deterministic at
    any partitioning."""
    proj = ds.select_columns([key_col])
    samp = proj.map_batches(
        lambda df: df.iloc[:: max(1, len(df) // sample_per_block)],
        batch_format="pandas").to_pandas()
    vals = np.sort(samp[key_col].to_numpy())
    if len(vals):
        cuts = vals[np.linspace(0, len(vals) - 1,
                                num_buckets + 1).astype(np.int64)[1:-1]]
        bounds = np.unique(cuts)
    else:
        bounds = vals
    b_ref = ray.put(bounds)

    def _bucket_of(keys_arr: np.ndarray) -> np.ndarray:
        return np.searchsorted(ray.get(b_ref), keys_arr, side="right")

    def _sums(df: pd.DataFrame) -> pd.DataFrame:
        b = _bucket_of(df[key_col].to_numpy())
        s = np.zeros(len(bounds) + 1, dtype=np.int64)
        np.add.at(s, b, df[value_col].to_numpy().astype(np.int64))
        return pd.DataFrame({"__bucket": np.arange(len(s), dtype=np.int64),
                             "__s": s})

    sums = (grouped_agg(ds.select_columns([key_col, value_col])
                        .map_batches(_sums, batch_format="pandas"),
                        ["__bucket"], {"s": ("__s", "sum")})
            .to_pandas().sort_values("__bucket"))
    offsets = np.zeros(len(bounds) + 1, dtype=np.int64)
    cum = np.concatenate(([0], sums["s"].to_numpy().cumsum()[:-1]))
    offsets[sums["__bucket"].to_numpy()] = cum
    o_ref = ray.put(offsets)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__bucket"] = _bucket_of(df[key_col].to_numpy()).astype(np.int64)
        return df

    def _cumsum(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(o_ref)
        out = []
        for b, g in df.groupby("__bucket", sort=False):
            g = g.sort_values([key_col, tiebreak_col], kind="stable")
            g[out_col] = off[int(b)] + g[value_col].to_numpy().astype(
                np.int64).cumsum()
            out.append(g)
        return pd.concat(out, ignore_index=True).drop(columns="__bucket")

    tagged = ds.map_batches(_tag, batch_format="pandas")
    return grouped_transform(tagged, ["__bucket"], _cumsum)


def running_max(ds: Dataset, key_col: str, tiebreak_col: str,
                value_col: str, out_col: str = "running_max",
                num_buckets: int = 64,
                sample_per_block: int = 64) -> Dataset:
    """Distributed PREFIX MAX: cumulative max of ``value_col`` over the
    global ``(key_col, tiebreak_col)`` order — SQL ``MAX(v) OVER (ORDER BY
    key, tiebreak)`` — the :func:`running_total` range-histogram pattern
    with max partials (int64; max is associative AND idempotent, so the
    same two-phase shape is exact).  The streaming-watermark primitive:
    with ``key=arrival_ts, value=event_ts`` the output is each event's
    high-water mark at its arrival.  ``(key, tiebreak)`` must be unique."""
    int_min = np.iinfo(np.int64).min
    proj = ds.select_columns([key_col])
    samp = proj.map_batches(
        lambda df: df.iloc[:: max(1, len(df) // sample_per_block)],
        batch_format="pandas").to_pandas()
    vals = np.sort(samp[key_col].to_numpy())
    if len(vals):
        cuts = vals[np.linspace(0, len(vals) - 1,
                                num_buckets + 1).astype(np.int64)[1:-1]]
        bounds = np.unique(cuts)
    else:
        bounds = vals
    b_ref = ray.put(bounds)

    def _bucket_of(keys_arr: np.ndarray) -> np.ndarray:
        return np.searchsorted(ray.get(b_ref), keys_arr, side="right")

    def _maxes(df: pd.DataFrame) -> pd.DataFrame:
        b = _bucket_of(df[key_col].to_numpy())
        s = np.full(len(bounds) + 1, int_min, dtype=np.int64)
        np.maximum.at(s, b, df[value_col].to_numpy().astype(np.int64))
        return pd.DataFrame({"__bucket": np.arange(len(s), dtype=np.int64),
                             "__s": s})

    maxes = (grouped_agg(ds.select_columns([key_col, value_col])
                         .map_batches(_maxes, batch_format="pandas"),
                         ["__bucket"], {"s": ("__s", "max")})
             .to_pandas().sort_values("__bucket"))
    offsets = np.full(len(bounds) + 1, int_min, dtype=np.int64)
    per_bucket = np.full(len(bounds) + 1, int_min, dtype=np.int64)
    per_bucket[maxes["__bucket"].to_numpy()] = maxes["s"].to_numpy()
    # prefix max of STRICTLY-PRECEDING buckets
    offsets[1:] = np.maximum.accumulate(per_bucket)[:-1]
    o_ref = ray.put(offsets)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__bucket"] = _bucket_of(df[key_col].to_numpy()).astype(np.int64)
        return df

    def _cummax(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(o_ref)
        out = []
        for b, g in df.groupby("__bucket", sort=False):
            g = g.sort_values([key_col, tiebreak_col], kind="stable")
            local = np.maximum.accumulate(
                g[value_col].to_numpy().astype(np.int64))
            g[out_col] = np.maximum(off[int(b)], local)
            out.append(g)
        return pd.concat(out, ignore_index=True).drop(columns="__bucket")

    tagged = ds.map_batches(_tag, batch_format="pandas")
    return grouped_transform(tagged, ["__bucket"], _cummax)


def union_all(datasets: list[Dataset]) -> Dataset:
    """``bind_rows`` (``Supplemental_Data_1.R:319,348``)."""
    first, *rest = datasets
    return first.union(*rest) if rest else first


def partitioned_write(ds: Dataset, path: str, partition_col: str) -> None:
    """One-pass disjoint partition fan-out (replaces the reference's six
    complementary ``Class.Final==k`` filter+write passes,
    ``Supplemental_Data_1.R:523-551``) — resumable layout: one directory per
    partition value, many part files, never one giant file."""
    ds.write_parquet(path, partition_cols=[partition_col])
