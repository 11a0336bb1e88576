"""BM25 relevance search (stages/search.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from drivers_of_global_deforestation_ray.stages.search import bm25_topk, query_term_stats


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    words = "alpha beta gamma delta epsilon zeta".split()
    texts = [" ".join(rng.choice(words, size=rng.integers(5, 30))) for _ in range(200)]
    texts[7] = "alpha alpha alpha alpha beta"          # tf-heavy, short
    texts[11] = " ".join(["alpha"] + ["zeta"] * 60)    # tf=1, long doc
    return pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})


def _bm25_reference(df: pd.DataFrame, terms, k1=1.2, b=0.75, log=False):
    toks = [t.lower().split() for t in df["text"]]
    n = len(df)
    dl = np.array([len(t) for t in toks], dtype=np.float64)
    avgdl = dl.sum() / n
    score = np.zeros(n)
    for q in terms:
        dfq = sum(q in set(t) for t in toks)
        ratio = ((n - dfq) + 0.5) / (dfq + 0.5)
        idf = np.log1p(ratio) if log else ratio
        tf = np.array([t.count(q) for t in toks], dtype=np.float64)
        score = score + (idf * (tf * (k1 + 1.0))) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl))
    return score


def test_query_term_stats(rd, corpus):
    n, tot, dfs = query_term_stats(rd.from_pandas(corpus).repartition(4),
                                   ["alpha", "nosuchword"], "text")
    assert n == 200
    assert tot == sum(len(t.split()) for t in corpus["text"])
    assert dfs["alpha"] == sum("alpha" in t.split() for t in corpus["text"])
    assert dfs["nosuchword"] == 0


@pytest.mark.parametrize("log", [False, True])
def test_bm25_matches_reference_ranking(rd, corpus, log):
    terms = ["alpha", "beta"]
    ref = _bm25_reference(corpus, terms, log=log)
    order = np.lexsort((corpus["doc_id"].to_numpy(), -ref))[:25]
    want = [(int(corpus["doc_id"].iloc[i]), round(float(ref[i]), 6)) for i in order]
    out = bm25_topk(rd.from_pandas(corpus).repartition(4), terms, k=25,
                    idf="log" if log else "ratio").to_pandas()
    got = list(zip(out["doc_id"].astype(int), out["score"]))
    assert got == want


def test_bm25_tf_saturation_and_length_norm(rd, corpus):
    """The tf-heavy short doc must outrank the tf=1 long doc for 'alpha'."""
    out = bm25_topk(rd.from_pandas(corpus).repartition(3), ["alpha"], k=200).to_pandas()
    ranks = {int(d): i for i, d in enumerate(out["doc_id"])}
    assert ranks[7] < ranks[11]
    assert ranks[7] == 0  # 4x tf in a 5-token doc is the clear winner


def test_bm25_partitioning_invariance(rd, corpus):
    a = bm25_topk(rd.from_pandas(corpus).repartition(2), ["gamma", "zeta"], k=30).to_pandas()
    b = bm25_topk(rd.from_pandas(corpus).repartition(9), ["gamma", "zeta"], k=30).to_pandas()
    assert a.equals(b)
