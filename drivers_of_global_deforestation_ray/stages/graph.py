"""Iterative graph algebra on Datasets: deterministic fixed-point PageRank.

The engine's second iterative-algorithm class (beside the distributed
connected components in ``stages/dedup.py``): K rounds of join -> grouped
sum -> rank update, each round expressed in Dataset ops and materialized so
the plan stays bounded.  All arithmetic is int64 FIXED-POINT (ranks scaled
by ``scale``; contributions are integer divisions; the damping update is
``(15*scale)//100 + (85*insum)//100``), which makes every sum
order-insensitive and the result bit-reproducible at any partitioning —
and lets a DuckDB twin with K unrolled CTEs hash-match exactly, which a
float PageRank never could (float sums depend on reduction order).

Scale shape: per iteration, one hash join (ranks onto edges, co-partitioned
by src) and one grouped aggregate (contributions by dst, per-block partials
first) — 2K shuffles of (id, int64) pairs total; the rank table is
node-sized, never collected to the driver.  Web-graph skew (a page with
millions of in-links) is absorbed by the partial aggregation: one partial
row per dst per block crosses the wire.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .relational import (copart_join, grouped_agg, grouped_transform, hash_join,
                         union_all)

__all__ = ["pagerank_fixed_point", "pagerank_pinned",
           "connected_components_pinned", "triangle_counts", "kcore_nodes"]


def pagerank_fixed_point(
    edges: Dataset,
    nodes: Dataset,
    num_iters: int = 5,
    scale: int = 10 ** 12,
    damping_pct: int = 85,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 8,
    batch_size: int = 65536,
    join_path: str = "auto",
) -> Dataset:
    """Integer fixed-point PageRank over (src, dst) edges.

    ``rank_0 = scale`` for every node; each round every node sends
    ``rank // outdeg`` along each out-edge and becomes
    ``((100-damping_pct)*scale)//100 + (damping_pct * insum)//100``.
    Nodes with no in-edges keep the base term; nodes with no out-edges
    (dangling) simply leak mass — documented, deterministic, and mirrored
    by the SQL twin.  Returns (node_col, rank) with int64 ranks.

    Join path (``join_path``: auto | copart | dataset): ``Dataset.join``
    spins an aggregator-actor pool PER JOIN, and this loop issues 2K+1
    joins — the spin-up/teardown churn hurts at BOTH ends (measured, 32
    CPUs: 4M nodes / 10M edges / 5 iters, dataset 209 s at 27% steal and
    ~260 churned workers vs copart 149 s at 6% steal, identical rank
    mass; sf0.01 toy scale 27 s vs 14 s).  ``auto`` therefore uses the
    task-based :func:`copart_join` everywhere; ``dataset`` remains as
    measured optionality for long-lived pipelines where one shared
    aggregator pool amortizes.
    """
    base = ((100 - damping_pct) * scale) // 100
    join = hash_join if join_path == "dataset" else copart_join

    deg = grouped_agg(edges, [src_col], {"outdeg": (dst_col, "size")},
                      batch_size, num_partitions).map_batches(
        lambda b: b.rename(columns={src_col: "__degkey"}), batch_format="pandas")
    edges_deg = join(edges, deg, on=src_col, right_on="__degkey",
                     num_partitions=num_partitions).select_columns(
        [src_col, dst_col, "outdeg"]).materialize()

    def _init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({node_col: b[node_col].to_numpy(),
                             "rank": np.full(len(b), scale, dtype=np.int64)})

    ranks = nodes.map_batches(_init, batch_format="pandas").materialize()

    def _contrib(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            dst_col: b[dst_col].to_numpy(),
            "c": b["rank"].to_numpy() // b["outdeg"].to_numpy(),
        })

    for _ in range(num_iters):
        sent = join(
            edges_deg, ranks, on=src_col, right_on=node_col,
            num_partitions=num_partitions,
        ).map_batches(_contrib, batch_format="pandas")
        insum = grouped_agg(sent, [dst_col], {"insum": ("c", "sum")},
                            batch_size, num_partitions)
        joined = join(
            nodes, insum, on=node_col, right_on=dst_col,
            num_partitions=num_partitions, how="left",
        )

        def _update(b: "pa.Table") -> pd.DataFrame:
            # fill_null in Arrow: int64 stays int64 (a pandas fillna would
            # round-trip through float64 and corrupt ranks above 2^53)
            # cast first: an all-miss partition arrives null-typed, and
            # fill_null cannot build a scalar of type null
            s = pc.fill_null(pc.cast(b["insum"], pa.int64()), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pd.DataFrame({
                node_col: b[node_col].to_numpy(),
                "rank": base + (damping_pct * s) // 100,
            })

        ranks = joined.map_batches(_update, batch_format="pyarrow").materialize()
    return ranks


# --- pinned-shard BSP variant ----------------------------------------------

import os as _os

import ray as _ray


@_ray.remote
class _EdgeShard:
    """One PageRank shard: owns the edge partition ``src % P == p`` ACROSS
    iterations — the big side is co-partitioned to storage ONCE and never
    moves again.  Rank shards are aligned on the same key, so an actor
    already holds the rank of every src it needs; the only per-superstep
    traffic is (dst, partial-sum) int64 tables routed between shards —
    node-bounded, skew pre-absorbed shard-side."""

    def __init__(self, shard_idx: int, num_shards: int, edge_dir: str):
        import glob

        import numpy as np
        import pyarrow.parquet as pq

        files = sorted(glob.glob(_os.path.join(edge_dir, "*.parquet")))
        if files:
            t = pq.read_table(files, columns=["src", "dst"])
            src = t["src"].to_numpy().astype(np.int64)
            dst = t["dst"].to_numpy().astype(np.int64)
        else:
            src = dst = np.empty(0, np.int64)
        order = np.argsort(src, kind="stable")
        self.src, self.dst = src[order], dst[order]
        # out-degree of this shard's srcs == global out-degree (src-sharded)
        self.deg_ids, counts = np.unique(self.src, return_counts=True)
        self.deg = counts.astype(np.int64)
        self.p, self.np_ = shard_idx, num_shards
        self.node_ids = None
        self.rank = None

    def init_ranks(self, node_dir: str, scale: int) -> int:
        import glob

        import numpy as np
        import pyarrow.parquet as pq

        files = sorted(glob.glob(_os.path.join(node_dir, "*.parquet")))
        ids = (pq.read_table(files).column(0).to_numpy().astype(np.int64)
               if files else np.empty(0, np.int64))
        self.node_ids = np.sort(ids)
        self.rank = np.full(len(self.node_ids), np.int64(scale), dtype=np.int64)
        return len(self.node_ids)

    def contribs(self) -> list:
        """One superstep send: my srcs' contributions, partial-summed by dst
        then split by destination shard."""
        import numpy as np

        if not len(self.src) or not len(self.node_ids):
            return [(np.empty(0, np.int64), np.empty(0, np.int64))] * self.np_
        pos = np.clip(np.searchsorted(self.node_ids, self.src), 0, len(self.node_ids) - 1)
        r = self.rank[pos]
        dpos = np.clip(np.searchsorted(self.deg_ids, self.src), 0, len(self.deg_ids) - 1)
        c = r // self.deg[dpos]
        uniq, inv = np.unique(self.dst, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, c)
        shard = uniq % self.np_
        return [(uniq[shard == q], sums[shard == q]) for q in range(self.np_)]

    def apply(self, partial_lists: list, scale: int, damping_pct: int) -> bool:
        """Merge the (dst, sum) partials addressed to me; damped update."""
        import numpy as np

        base = ((100 - damping_pct) * scale) // 100
        insum = np.zeros(len(self.node_ids), dtype=np.int64)
        for ids, sums in partial_lists:
            if len(ids):
                np.add.at(insum, np.searchsorted(self.node_ids, ids), sums)
        self.rank = base + (damping_pct * insum) // 100
        return True

    def write_result(self, out_dir: str, node_col: str) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = _os.path.join(out_dir, f"shard-{self.p:05d}.parquet")
        pq.write_table(pa.table({node_col: self.node_ids, "rank": self.rank}), path)
        return path


def pagerank_pinned(
    edges: Dataset,
    nodes: Dataset,
    work_dir: str,
    num_iters: int = 5,
    scale: int = 10 ** 12,
    damping_pct: int = 85,
    node_col: str = "node_id",
    src_col: str = "src",
    dst_col: str = "dst",
    num_shards: int = 8,
) -> Dataset:
    """BSP PageRank with PINNED edge shards — the 100-TB path.

    :func:`pagerank_fixed_point` re-shuffles the edge table every round (K x
    the biggest table through the wire).  Here both inputs are co-partitioned
    ONCE by ``id % num_shards`` into partitioned parquet under ``work_dir``
    (a streaming Dataset write — nothing touches the driver), then each
    :class:`_EdgeShard` actor loads its own shard and keeps it across all
    supersteps.  Per iteration the only traffic is P x P (dst, partial-sum)
    int64 tables — node-bounded, already combined shard-side.  The result is
    written shard-wise and read back as a Dataset (driver never holds ranks).

    Bit-identical to :func:`pagerank_fixed_point` and the SQL twin (same
    int64 fixed-point update; parity pytest).  This is the engine's one
    deliberate raw-actor operator — iterative pinned state across
    supersteps is exactly what ``map_batches`` cannot express.  The
    co-partitioned parquet doubles as a checkpoint: a rerun can reuse it.
    """

    def _tag(df: pd.DataFrame, col: str) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__shard"] = df[col].to_numpy() % num_shards
        return df

    e_dir = _os.path.join(work_dir, "edges")
    n_dir = _os.path.join(work_dir, "nodes")
    edges.map_batches(lambda b: _tag(b, src_col), batch_format="pandas") \
        .write_parquet(e_dir, partition_cols=["__shard"])
    nodes.map_batches(lambda b: _tag(b, node_col), batch_format="pandas") \
        .write_parquet(n_dir, partition_cols=["__shard"])

    actors = [_EdgeShard.remote(p, num_shards,
                                _os.path.join(e_dir, f"__shard={p}"))
              for p in range(num_shards)]
    try:
        _ray.get([a.init_ranks.remote(_os.path.join(n_dir, f"__shard={p}"), scale)
                  for p, a in enumerate(actors)])

        for _ in range(num_iters):
            sends = _ray.get([a.contribs.remote() for a in actors])
            _ray.get([a.apply.remote([sends[p][q] for p in range(num_shards)],
                                     scale, damping_pct)
                      for q, a in enumerate(actors)])

        out_dir = _os.path.join(work_dir, "ranks")
        _os.makedirs(out_dir, exist_ok=True)
        _ray.get([a.write_result.remote(out_dir, node_col) for a in actors])
    finally:
        for a in actors:
            _ray.kill(a)
    import ray.data as rd

    return rd.read_parquet(out_dir)


@_ray.remote
class _CCShard:
    """One connected-components shard: owns the symmetrized edges with
    ``node % P == p`` and those nodes' labels ACROSS supersteps — the edge
    table is co-partitioned to storage ONCE (the pagerank_pinned pattern:
    join-loop rebuilt ~5 shuffle operators per round; pinned shards move
    only node-bounded (id, label) int64 partials).  All updates are mins of
    int64 node ids — deterministic at any sharding."""

    def __init__(self, shard_idx: int, num_shards: int, edge_dir: str):
        import glob

        import numpy as np
        import pyarrow.parquet as pq

        files = sorted(glob.glob(_os.path.join(edge_dir, "*.parquet")))
        if files:
            t = pq.read_table(files, columns=["node", "nbr"])
            node = t["node"].to_numpy().astype(np.int64)
            nbr = t["nbr"].to_numpy().astype(np.int64)
        else:
            node = nbr = np.empty(0, np.int64)
        order = np.argsort(node, kind="stable")
        self.node, self.nbr = node[order], nbr[order]
        self.p, self.np_ = shard_idx, num_shards
        # init: label = min(self, neighbors) — edges are symmetrized, so
        # every endpoint appears as a 'node' row in exactly one shard
        self.ids = np.unique(self.node)
        self.label = self.ids.copy()
        if len(self.node):
            pos = np.searchsorted(self.ids, self.node)
            np.minimum.at(self.label, pos, self.nbr)
        self._start = self.label.copy()

    def nbr_candidates(self) -> list:
        """Superstep phase 1: for each edge, my node's label is a candidate
        for the neighbor — partial-min by neighbor, split by its shard."""
        import numpy as np

        self._start = self.label.copy()
        if not len(self.node):
            return [(np.empty(0, np.int64), np.empty(0, np.int64))] * self.np_
        c = self.label[np.searchsorted(self.ids, self.node)]
        uniq, inv = np.unique(self.nbr, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, c)
        shard = uniq % self.np_
        return [(uniq[shard == q], mins[shard == q]) for q in range(self.np_)]

    def apply_candidates(self, partial_lists: list) -> list:
        """Phase 2: fold in neighbor mins, then emit pointer-jump REQUESTS —
        the unique label values whose owners must report label[label[n]],
        split by owner shard.  (Labels are always ids of same-component
        nodes, so every request has an owner.)"""
        import numpy as np

        for ids, mins in partial_lists:
            if len(ids):
                pos = np.searchsorted(self.ids, ids)
                self.label[pos] = np.minimum(self.label[pos], mins)
        want = np.unique(self.label)
        shard = want % self.np_
        return [want[shard == q] for q in range(self.np_)]

    def answer_jumps(self, request_lists: list) -> list:
        """Phase 3: answer (m, label[m]) for each requested id m I own,
        addressed back to the requesting shard."""
        import numpy as np

        out = []
        for ids in request_lists:
            if len(ids):
                pos = np.searchsorted(self.ids, ids)
                out.append((ids, self.label[pos]))
            else:
                out.append((np.empty(0, np.int64), np.empty(0, np.int64)))
        return out

    def apply_jumps(self, reply_lists: list) -> int:
        """Phase 4: label[n] <- min(label[n], label[label[n]]) — the pointer
        jump that makes convergence O(log diameter).  Returns this round's
        changed-count (one scalar to the driver)."""
        import numpy as np

        ms = np.concatenate([r[0] for r in reply_lists])
        ls = np.concatenate([r[1] for r in reply_lists])
        if len(ms):
            order = np.argsort(ms, kind="stable")
            ms, ls = ms[order], ls[order]
            self.label = np.minimum(self.label,
                                    ls[np.searchsorted(ms, self.label)])
        return int((self.label != self._start).sum())

    def write_result(self, out_dir: str) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = _os.path.join(out_dir, f"shard-{self.p:05d}.parquet")
        pq.write_table(pa.table({"node": self.ids, "label": self.label}), path)
        return path


def connected_components_pinned(
    pairs: Dataset,
    work_dir: str,
    num_shards: int = 8,
    max_rounds: int = 64,
) -> Dataset:
    """Connected components (min-label + pointer jumping) on PINNED edge
    shards — the scale path for
    :func:`~.dedup.connected_components_distributed`, whose join-loop
    spins ~5 shuffle operators per round on a re-materialized label table
    (measured 35-39 s at sf0.01; same cure as ``pagerank_pinned``'s 5.5x).

    The (a, b) pair set is symmetrized and co-partitioned ONCE by
    ``node % num_shards`` into parquet under ``work_dir`` (streaming write);
    each :class:`_CCShard` actor pins its shard across supersteps.  One
    round = neighbor-min partials + a pointer-jump request/reply — four
    actor barriers shipping node-bounded int64 tables, no Dataset operator
    spin-up, O(log diameter) rounds, driver sees one scalar per round.

    Output (node, label=component-min id), only nodes appearing in a pair —
    identical to the Dataset-op variant (shared pytest + SQL oracle)."""

    def _sym(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy(dtype=np.int64)
        b = batch["b"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"node": np.concatenate([a, b]),
                            "nbr": np.concatenate([b, a])})
        out["__shard"] = out["node"].to_numpy() % num_shards
        return out

    e_dir = _os.path.join(work_dir, "cc_edges")
    pairs.select_columns(["a", "b"]).map_batches(
        _sym, batch_format="pandas").write_parquet(
        e_dir, partition_cols=["__shard"])

    actors = [_CCShard.remote(p, num_shards,
                              _os.path.join(e_dir, f"__shard={p}"))
              for p in range(num_shards)]
    try:
        for rnd in range(max_rounds):
            sends = _ray.get([a.nbr_candidates.remote() for a in actors])
            reqs = _ray.get(
                [a.apply_candidates.remote([sends[p][q]
                                            for p in range(num_shards)])
                 for q, a in enumerate(actors)])
            replies = _ray.get(
                [a.answer_jumps.remote([reqs[p][q]
                                        for p in range(num_shards)])
                 for q, a in enumerate(actors)])
            changed = sum(_ray.get(
                [a.apply_jumps.remote([replies[p][q]
                                       for p in range(num_shards)])
                 for q, a in enumerate(actors)]))
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected components did not converge in {max_rounds} rounds")
        out_dir = _os.path.join(work_dir, "cc_labels")
        _os.makedirs(out_dir, exist_ok=True)
        _ray.get([a.write_result.remote(out_dir) for a in actors])
    finally:
        for a in actors:
            _ray.kill(a)
    import ray.data as rd

    return rd.read_parquet(out_dir)


def triangle_counts(edges: Dataset, src_col: str = "src", dst_col: str = "dst",
                    num_partitions: int = 32) -> Dataset:
    """Per-node triangle counts over an undirected graph — degree-ordered
    wedge closing (the node-iterator family: Schank & Wagner '05; the
    MapReduce formulation of Suri & Vassilvitskii WWW'11).

    Every stage is a co-partition ``grouped_transform`` — NO ``Dataset.join``
    (aggregator pools would starve small-CPU runs) and NO broadcast (the
    degree table is node-bounded, which on a web graph is billions):

      1. canonicalize: (a < b), self-loops dropped, distinct via one pair
         co-partition (per-block pre-dedup first).
      2. degrees: endpoint explode -> grouped count (per-block partials).
      3. orient each edge from its lower-(deg, id) endpoint to the higher —
         the degree attaches ride the SAME union+co-partition pattern
         (lookup rows and edge rows land in one partition by key; a
         vectorized merge inside the partition replaces the join).  After
         orientation every node's out-degree is O(sqrt(2m)), which bounds
         the wedge phase on power-law graphs — THE reason this beats the
         naive neighbor-pair explode whose hot node emits deg^2 wedges.
      4. wedges: per center, rank-ordered out-neighbor pairs (x, y) — every
         triangle {x < y < z in (deg, id) order} is generated exactly once,
         as the wedge (y, z) centered at x.
      5. close: wedge rows and oriented-edge rows co-partition by (x, y);
         a wedge whose (x, y) is an edge is a triangle — credit all three
         corners with per-partition partial counts.
      6. grouped sum -> (node, n_tri), nodes in >= 1 triangle.

    Shuffle payloads are int64 id/degree tuples only.  Determinism: counts
    are integer sums — partitioning-invariant."""

    def _canon_block(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(dtype=np.int64)
        d = b[dst_col].to_numpy(dtype=np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        bb = np.maximum(s[keep], d[keep])
        return pd.DataFrame({"a": a, "b": bb}).drop_duplicates(["a", "b"])

    def _distinct(part: pd.DataFrame) -> pd.DataFrame:
        return part.drop_duplicates(["a", "b"])

    canon = grouped_transform(edges.map_batches(_canon_block, batch_format="pandas"),
                              ["a", "b"], _distinct, num_partitions)
    canon = canon.materialize()  # consumed three times (degrees + 2 attaches)

    def _endpoints(b: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()])
        u, c = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": u, "deg": c.astype(np.int64)})

    deg = grouped_agg(canon.map_batches(_endpoints, batch_format="pandas"),
                      ["node"], {"deg": ("deg", "sum")},
                      num_partitions=num_partitions)

    def _attach_deg(ds_edges: Dataset, key: str, out: str) -> Dataset:
        """Union+co-partition degree attach: lookup rows and edge rows land
        in one partition per key; a vectorized in-partition map replaces the
        join.  ``__lk`` tags row kind so every block shares one int schema
        (Arrow unions across blocks must agree on dtypes)."""

        def _as_lookup(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"a": np.full(len(b), -1, dtype=np.int64),
                                 "b": np.full(len(b), -1, dtype=np.int64),
                                 "deg_a": (b["deg_a"].to_numpy(dtype=np.int64)
                                           if "deg_a" in b else
                                           np.full(len(b), -1, dtype=np.int64)),
                                 "__k": b["node"].to_numpy(dtype=np.int64),
                                 "__deg": b["deg"].to_numpy(dtype=np.int64),
                                 "__lk": np.ones(len(b), dtype=np.int8)})

        def _as_edge(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"a": b["a"].to_numpy(dtype=np.int64),
                                 "b": b["b"].to_numpy(dtype=np.int64),
                                 "deg_a": (b["deg_a"].to_numpy(dtype=np.int64)
                                           if "deg_a" in b else
                                           np.full(len(b), -1, dtype=np.int64)),
                                 "__k": b[key].to_numpy(dtype=np.int64),
                                 "__deg": np.full(len(b), -1, dtype=np.int64),
                                 "__lk": np.zeros(len(b), dtype=np.int8)})

        def _merge(part: pd.DataFrame) -> pd.DataFrame:
            mask = part["__lk"].to_numpy() == 1
            look, ed = part[mask], part[~mask]
            m = pd.Series(look["__deg"].to_numpy(), index=look["__k"].to_numpy())
            res = ed[["a", "b", "deg_a"]].copy(deep=False)
            res[out] = m.reindex(ed["__k"].to_numpy()).to_numpy().astype(np.int64)
            return res

        unioned = union_all([
            ds_edges.map_batches(_as_edge, batch_format="pandas"),
            deg.map_batches(_as_lookup, batch_format="pandas"),
        ])
        return grouped_transform(unioned, ["__k"], _merge, num_partitions)

    with_da = _attach_deg(canon, "a", "deg_a")
    with_dab = _attach_deg(with_da, "b", "deg_b")

    def _orient(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        bb = b["b"].to_numpy(dtype=np.int64)
        da = b["deg_a"].to_numpy(dtype=np.int64)
        db = b["deg_b"].to_numpy(dtype=np.int64)
        a_first = (da < db) | ((da == db) & (a < bb))
        return pd.DataFrame({
            "src": np.where(a_first, a, bb),
            "dst": np.where(a_first, bb, a),
            "ddst": np.where(a_first, db, da),
        })

    oriented = with_dab.map_batches(_orient, batch_format="pandas").materialize()

    def _wedges(part: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for c, g in part.groupby("src", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values(["ddst", "dst"], kind="stable")
            nb = g["dst"].to_numpy()
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"x": nb[i], "y": nb[j],
                                      "c": np.int64(c)}))
        if not outs:
            return pd.DataFrame({"x": pd.Series(dtype=np.int64),
                                 "y": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    wedges = grouped_transform(oriented, ["src"], _wedges, num_partitions)

    def _edge_marker(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": b["src"].to_numpy(), "y": b["dst"].to_numpy(),
                             "c": np.int64(-1)})

    def _close(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"node": pd.Series(dtype=np.int64),
                              "n_tri": pd.Series(dtype=np.int64)})
        mark = part["c"].to_numpy() == -1
        if not mark.any() or mark.all():
            return empty
        # vectorized close: inner-merge wedges against the (distinct)
        # oriented edges sharing this partition's (x, y) keys
        tri = part[~mark].merge(part.loc[mark, ["x", "y"]], on=["x", "y"],
                                how="inner")
        if not len(tri):
            return empty
        nodes = np.concatenate([tri["x"].to_numpy(), tri["y"].to_numpy(),
                                tri["c"].to_numpy()])
        u, cnt = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": u.astype(np.int64),
                             "n_tri": cnt.astype(np.int64)})

    both = union_all([wedges,
                      oriented.map_batches(_edge_marker, batch_format="pandas")])
    partials = grouped_transform(both, ["x", "y"], _close, num_partitions)
    return grouped_agg(partials, ["node"], {"n_tri": ("n_tri", "sum")},
                       num_partitions=num_partitions)


def kcore_nodes(
    edges: Dataset,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 64,
    num_partitions: int = 8,
    batch_size: int = 65536,
) -> Dataset:
    """k-core decomposition (Seidman peeling): the maximal subgraph in which
    every surviving node has degree >= k in the SUBGRAPH — the standard
    dense-community / spam-cluster detector on link graphs.

    Iterative fixpoint like :func:`pagerank_fixed_point`: each round
    canonicalizes + dedups the surviving undirected edge set, computes
    degrees by one two-phase grouped count (per-block partials — skew-proof
    for hub nodes), collects ONLY the count of sub-k nodes (one scalar) to
    test the fixpoint, and prunes edges touching sub-k nodes through the
    scale-adaptive broadcast / marker anti-join machinery of
    :func:`~.dedup.drop_ids`-style filtering (here: sub-k node ids are
    degree-bounded, far fewer than nodes each round; they broadcast).  Each
    round materializes the pruned edge set so the plan stays bounded; the
    peel converges in at most the degeneracy-ordering depth (``max_rounds``
    caps adversarial chains, with an explicit error — no silent cap).

    Returns the surviving nodes ``(node_id, degree)`` — empty when no
    k-core exists.  Deterministic: set semantics only, no ordering
    dependence."""
    import ray

    def _canon(b: pd.DataFrame) -> pd.DataFrame:
        a = b[src_col].to_numpy(np.int64)
        c = b[dst_col].to_numpy(np.int64)
        lo, hi = np.minimum(a, c), np.maximum(a, c)
        keep = lo != hi  # self-loops add no core degree
        return pd.DataFrame({"a": lo[keep], "b": hi[keep]})

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a", "b"])

    cur = grouped_transform(
        edges.map_batches(_canon, batch_format="pandas"),
        ["a", "b"], _dedup, num_partitions).materialize()

    def _deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()])
        s = pd.Series(ids).groupby(ids, sort=False).size()
        return pd.DataFrame({"node_id": s.index.to_numpy(),
                             "n": s.to_numpy(np.int64)})

    for _ in range(max_rounds):
        deg = grouped_agg(cur.map_batches(_deg_partial, batch_format="pandas"),
                          ["node_id"], {"degree": ("n", "sum")},
                          num_partitions=num_partitions).materialize()
        weak = deg.filter(expr=f"degree < {k}")
        n_weak = weak.count()
        if n_weak == 0:
            return deg
        weak_ids = np.sort(weak.select_columns(["node_id"])
                           .to_pandas()["node_id"].to_numpy(np.int64))
        ref = ray.put(weak_ids)

        def _prune(b: pd.DataFrame) -> pd.DataFrame:
            w = ray.get(ref)
            keep = (~np.isin(b["a"].to_numpy(), w)
                    & ~np.isin(b["b"].to_numpy(), w))
            return b[keep]

        cur = cur.map_batches(_prune, batch_format="pandas").materialize()
        if cur.count() == 0:
            import pandas as _pd
            empty = _pd.DataFrame({"node_id": _pd.Series(dtype=np.int64),
                                   "degree": _pd.Series(dtype=np.int64)})
            import ray.data as rd
            return rd.from_pandas(empty)
    raise RuntimeError(f"kcore_nodes: no fixpoint after {max_rounds} rounds")
