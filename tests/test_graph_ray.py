"""Iterative graph ops: deterministic fixed-point PageRank (stages/graph.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from drivers_of_global_deforestation_ray.stages.graph import pagerank_fixed_point


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


def _reference(edges: pd.DataFrame, n_nodes: int, iters: int,
               scale: int = 10 ** 12, damping: int = 85) -> np.ndarray:
    """Direct numpy transcription of the documented integer update."""
    base = ((100 - damping) * scale) // 100
    outdeg = np.zeros(n_nodes, dtype=np.int64)
    np.add.at(outdeg, edges["src"].to_numpy(), 1)
    rank = np.full(n_nodes, scale, dtype=np.int64)
    for _ in range(iters):
        contrib = rank[edges["src"]] // outdeg[edges["src"]]
        insum = np.zeros(n_nodes, dtype=np.int64)
        np.add.at(insum, edges["dst"].to_numpy(), contrib)
        rank = base + (damping * insum) // 100
    return rank


def _run(rd, edges: pd.DataFrame, n_nodes: int, iters=5, parts=2,
         join_path="auto") -> np.ndarray:
    nodes = pd.DataFrame({"node_id": np.arange(n_nodes, dtype=np.int64)})
    got = pagerank_fixed_point(
        rd.from_pandas(edges).repartition(3), rd.from_pandas(nodes),
        num_iters=iters, num_partitions=parts, join_path=join_path,
    ).to_pandas().sort_values("node_id")
    assert got["rank"].dtype == np.int64
    return got["rank"].to_numpy()


def test_pagerank_matches_reference(rd):
    rng = np.random.default_rng(11)
    n = 200
    edges = pd.DataFrame({
        "src": rng.integers(0, n, 1500).astype(np.int64),
        "dst": rng.integers(0, n, 1500).astype(np.int64),
    })
    want = _reference(edges, n, 5)
    assert (_run(rd, edges, n) == want).all()


def test_pagerank_join_paths_agree(rd):
    # task-based copart path and Dataset.join actor path bit-agree, at
    # different partition counts too
    rng = np.random.default_rng(13)
    n = 120
    edges = pd.DataFrame({
        "src": rng.integers(0, n, 800).astype(np.int64),
        "dst": rng.integers(0, n, 800).astype(np.int64),
    })
    a = _run(rd, edges, n, parts=2, join_path="copart")
    b = _run(rd, edges, n, parts=8, join_path="dataset")
    assert (a == b).all()
    assert (a == _reference(edges, n, 5)).all()


def test_pagerank_sink_and_source_semantics(rd):
    # 0 -> 1 -> 2 (2 is dangling: mass leaks; 0 has no in-edges: stays base)
    scale, base = 10 ** 12, (15 * 10 ** 12) // 100
    edges = pd.DataFrame({"src": np.array([0, 1], dtype=np.int64),
                          "dst": np.array([1, 2], dtype=np.int64)})
    got = _run(rd, edges, 3, iters=2)
    # iter1: r = [base, base+.85*scale, base+.85*scale]
    r1 = np.array([base, base + (85 * scale) // 100, base + (85 * scale) // 100])
    # iter2: node1 gets 0's r1 (=base), node2 gets node1's r1
    want = np.array([base,
                     base + (85 * r1[0]) // 100,
                     base + (85 * r1[1]) // 100])
    assert (got == want).all()
    # total mass is bounded by N*scale (leak through the dangling node)
    assert got.sum() < 3 * scale


def test_pagerank_hub_concentration(rd):
    # everyone links to node 0: it must hold the overwhelmingly largest rank
    n = 50
    edges = pd.DataFrame({"src": np.arange(1, n, dtype=np.int64),
                          "dst": np.zeros(n - 1, dtype=np.int64)})
    got = _run(rd, edges, n, iters=5)
    assert got[0] > 10 * got[1:].max()
    assert (got[1:] == got[1]).all()  # all leaves identical by symmetry


def test_pagerank_pinned_parity(rd, tmp_path):
    """BSP pinned-shard variant is bit-identical to the Dataset version
    (and hence to the SQL twin), across shard counts."""
    from drivers_of_global_deforestation_ray.stages.graph import pagerank_pinned

    rng = np.random.default_rng(17)
    n = 300
    edges = pd.DataFrame({
        "src": rng.integers(0, n, 2000).astype(np.int64),
        "dst": rng.integers(0, n, 2000).astype(np.int64),
    })
    want = _reference(edges, n, 5)
    nodes = pd.DataFrame({"node_id": np.arange(n, dtype=np.int64)})
    for shards in (2, 5):
        got = pagerank_pinned(
            rd.from_pandas(edges).repartition(3), rd.from_pandas(nodes),
            work_dir=str(tmp_path / f"pr{shards}"), num_iters=5,
            num_shards=shards,
        ).to_pandas().sort_values("node_id")
        assert got["rank"].dtype == np.int64
        assert (got["rank"].to_numpy() == want).all(), shards


def _tri_reference(edges: pd.DataFrame) -> dict:
    """Brute-force per-node triangle counts over the canonical simple graph."""
    import itertools

    adj: dict = {}
    es = set()
    for s, d in zip(edges["src"], edges["dst"]):
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        if (a, b) in es:
            continue
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    for a, b in es:
        for c in adj[a] & adj[b]:
            if c > b:  # each triangle once (a < b < c)
                for v in (a, b, c):
                    counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangle_counts_k4_plus_tail(rd):
    from drivers_of_global_deforestation_ray.stages.graph import triangle_counts

    edges = pd.DataFrame({"src": [0, 0, 0, 1, 1, 2, 4, 1],
                          "dst": [1, 2, 3, 2, 3, 3, 5, 0]})  # K4 + path + dup
    out = triangle_counts(rd.from_pandas(edges).repartition(3),
                          num_partitions=4).to_pandas().sort_values("node")
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["n_tri"].tolist() == [3, 3, 3, 3]


def test_triangle_counts_random_graph_matches_bruteforce(rd):
    """Random multigraph incl. reversed duplicates and self-loops; the
    degree-ordered wedge closing must count every triangle exactly once per
    corner, at any partitioning."""
    from drivers_of_global_deforestation_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(3)
    n = 60
    edges = pd.DataFrame({"src": rng.integers(0, n, 900),
                          "dst": rng.integers(0, n, 900)})
    want = _tri_reference(edges)
    for reparts in (2, 7):
        out = triangle_counts(rd.from_pandas(edges).repartition(reparts),
                              num_partitions=5).to_pandas()
        got = dict(zip(out["node"].astype(int), out["n_tri"].astype(int)))
        assert got == want
    assert sum(want.values()) > 100  # dense enough to be a real exercise


# --- k-core decomposition -------------------------------------------------

def _kcore_reference(edges, k):
    """Pure-python Seidman peel on an undirected simple graph."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            lo, hi = min(a, b), max(a, b)
            adj[lo].add(hi)
            adj[hi].add(lo)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(s) for n, s in adj.items() if s}


def test_kcore_matches_reference(rd):
    from drivers_of_global_deforestation_ray.stages.graph import kcore_nodes

    rng = np.random.default_rng(43)
    # a K6 clique (5-core) + a chain (peels away) + random sparse edges
    clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    chain = [(10 + i, 11 + i) for i in range(20)]
    rand = [(int(rng.integers(40, 90)), int(rng.integers(40, 90)))
            for _ in range(60)]
    edges = clique + chain + rand
    df = pd.DataFrame(edges, columns=["src", "dst"])
    for k in (2, 3, 5):
        want = _kcore_reference(edges, k)
        got = (kcore_nodes(rd.from_pandas(df).repartition(4), k=k,
                           num_partitions=4).to_pandas())
        got_map = (dict(zip(got["node_id"], got["degree"]))
                   if len(got) else {})
        assert got_map == want, f"k={k}"
    # k high enough that nothing survives
    got = kcore_nodes(rd.from_pandas(df).repartition(4), k=6,
                      num_partitions=4).to_pandas()
    assert len(got) == 0


def test_connected_components_pinned_matches_dataset_variant(rd, tmp_path):
    """Pinned-shard BSP CC == the Dataset-op join-loop variant == a python
    union-find, on a random graph with chains, cliques and singleton-free
    edges; partition/shard-count invariant."""
    from drivers_of_global_deforestation_ray.stages.dedup import (
        connected_components_distributed)
    from drivers_of_global_deforestation_ray.stages.graph import (
        connected_components_pinned)

    rng = np.random.default_rng(11)
    a = rng.integers(0, 400, 300).astype(np.int64)
    b = (a + rng.integers(1, 50, 300)) % 400
    pairs = pd.DataFrame({"a": a, "b": b})

    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    nodes = sorted(set(a) | set(b))
    want = pd.DataFrame({"node": np.asarray(nodes, np.int64),
                         "label": np.asarray([find(int(n)) for n in nodes],
                                             np.int64)})

    outs = []
    for shards, sub in ((2, "p2"), (5, "p5")):
        got = connected_components_pinned(
            rd.from_pandas(pairs).repartition(3),
            str(tmp_path / sub), num_shards=shards).to_pandas()
        outs.append(got.sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])  # shard-count invariant
    pd.testing.assert_frame_equal(outs[0], want)

    # Dataset-op fallback parity on a smaller slice (its join-loop rounds
    # cost ~10 s each; the pinned variant above is the scale path)
    small = pairs.head(60)
    sp = {}

    def sfind(x):
        r = x
        while sp.get(r, r) != r:
            r = sp[r]
        return r

    for x, y in zip(small["a"], small["b"]):
        rx, ry = sfind(int(x)), sfind(int(y))
        if rx != ry:
            sp[max(rx, ry)] = min(rx, ry)
    snodes = sorted(set(small["a"]) | set(small["b"]))
    swant = pd.DataFrame({"node": np.asarray(snodes, np.int64),
                          "label": np.asarray([sfind(int(n)) for n in snodes],
                                              np.int64)})
    ds_variant = (connected_components_distributed(
        rd.from_pandas(small).repartition(3), num_partitions=2)
        .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(ds_variant, swant)
