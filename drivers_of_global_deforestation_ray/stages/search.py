"""Full-text relevance search over a documents table: BM25 scoring + top-k.

The 100-TB shape: the corpus is NEVER indexed on the driver — document
frequencies are computed distributed for the QUERY terms only (a
query-bounded table, collected and broadcast as a handful of scalars), and
scoring is one stateless vectorized pass over the corpus followed by a
per-block top-k prune + global sort-limit.  Nothing corpus-sized shuffles:
the only all-to-all is the final top-k merge of <= k rows per block.

Determinism contract (what lets the ``bm25_topk`` query hash-match a SQL
twin): with ``idf="ratio"`` every score is a fixed left-associated float64
expression tree — per-term idf ``((N - df) + 0.5) / (df + 0.5)``, term
score ``(idf * (tf * (k1 + 1))) / (tf + k1 * ((1 - b) + (b * dl) / avgdl))``,
document score ``(t1 + t2) + t3 ...`` in query order — evaluated with the
IDENTICAL operation order in numpy and in the SQL oracle, so every bit
agrees.  ``idf="log"`` is classic BM25 (``ln(1 + (N - df + .5)/(df + .5))``);
libm ``log`` bit-parity across engines is not guaranteed, so that variant is
pytest-verified against a python reference instead of a SQL oracle.

Token convention: lowercase whitespace split; ``dl`` counts ALL tokens (not
distinct).  Matches ``string_split(lower(text), ' ')`` on the single-space
fixture corpora (same convention the decontam/top_ngrams oracles rely on).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from .relational import topk

__all__ = ["bm25_topk", "query_term_stats"]


def query_term_stats(ds: Dataset, terms: "list[str]", text_col: str) -> "tuple[int, int, dict]":
    """One distributed pass -> (N, total_tokens, {term: df}).  The per-block
    partial is a dict of bounded size (|terms| + 2); only those partials
    reach the driver."""
    terms_set = set(terms)

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        dfs = dict.fromkeys(terms_set, 0)
        total = 0
        for t in batch[text_col]:
            toks = (t or "").lower().split()
            total += len(toks)
            for q in terms_set.intersection(toks):
                dfs[q] += 1
        out = {"__n": [len(batch)], "__tok": [total]}
        for q in terms:
            out[f"__df_{q}"] = [dfs[q]]
        return pd.DataFrame(out)

    agg = ds.map_batches(_partial, batch_format="pandas").sum(
        ["__n", "__tok"] + [f"__df_{q}" for q in terms])
    return (int(agg["sum(__n)"]), int(agg["sum(__tok)"]),
            {q: int(agg[f"sum(__df_{q})"]) for q in terms})


def bm25_topk(
    ds: Dataset,
    terms: "list[str]",
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "ratio",
) -> Dataset:
    """Top-``k`` documents by BM25 relevance to ``terms`` (score desc, id
    asc).  Returns ``(id_col, score)`` with score additionally rounded to 6
    decimals AFTER ranking (raw bits rank; the rounding is presentational).

    ``idf="ratio"``: Robertson's idf ratio without the log — monotone in df
    like the classic form, and bit-reproducible against SQL (see module
    docstring).  ``idf="log"``: classic ``ln(1 + ratio)``."""
    n_docs, total_tokens, dfs = query_term_stats(ds, terms, text_col)
    avgdl = total_tokens / n_docs if n_docs else 1.0

    idfs = []
    for q in terms:
        df_q = dfs[q]
        ratio = ((n_docs - df_q) + 0.5) / (df_q + 0.5)
        idfs.append(np.log1p(ratio) if idf == "log" else ratio)

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        dl = np.empty(len(batch), dtype=np.float64)
        tfs = np.zeros((len(terms), len(batch)), dtype=np.float64)
        pos = {q: i for i, q in enumerate(terms)}
        for r, t in enumerate(batch[text_col]):
            toks = (t or "").lower().split()
            dl[r] = len(toks)
            for w in toks:
                i = pos.get(w)
                if i is not None:
                    tfs[i, r] += 1.0
        score = None
        for i in range(len(terms)):
            tf = tfs[i]
            den = tf + k1 * ((1.0 - b) + (b * dl) / avgdl)
            term_score = (idfs[i] * (tf * (k1 + 1.0))) / den
            score = term_score if score is None else score + term_score
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(),
                            "score": score})
        # per-block prune: the global top-k is inside the union of local
        # top-ks, so the sort-limit merge sees <= k rows per block
        return (out.sort_values(["score", id_col], ascending=[False, True],
                                kind="stable").head(k))

    scored = ds.map_batches(_score, batch_format="pandas")
    ranked = topk(scored, ["score", id_col], k, descending=[True, False])

    def _round(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy(deep=False)
        batch["score"] = np.round(batch["score"].to_numpy(), 6)
        return batch

    return ranked.map_batches(_round, batch_format="pandas")
