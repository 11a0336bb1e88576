"""Distributed byte-pair-encoding tokenizer training (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword Units").

The classic algorithm trains on a WORD-FREQUENCY table, not the raw corpus:
one distributed pass collapses the corpus to ``(word, count)`` rows
(vocabulary-bounded — the same contract as ``term_doc_freq``), then each of
the K merge rounds is a small two-phase aggregate over that table:

    pair counts (per-block partials, weighted by word count)
      -> grouped sum -> global top-1 (count desc, pair asc — deterministic)
      -> broadcast the single winning pair -> rewrite symbol strings.

Driver footprint is O(K) (one winning pair per round); nothing corpus-sized
ever leaves the cluster after the first word-count shuffle.  The word table
is materialized once per round (vocabulary-bounded) so round N+1 does not
re-execute rounds 1..N through lazy lineage.

Merge application uses the standard leftmost-greedy, non-overlapping rule
(`` l r `` rewrites to `` lr `` scanning left to right) — the SAME
``_apply_merge`` kernel drives the distributed trainer, the sequential
reference used by the pytest, and :func:`bpe_encode_counts`, so the three
agree by construction on the rule and the test checks the *machinery*.

No SQL oracle: the training loop is iterative/stateful (each round's input
depends on the previous round's argmax) — the driver records a rows-only
check; the pytest compares against the in-memory sequential reference.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from ray.data import Dataset

from ..stages.relational import grouped_agg

__all__ = ["bpe_train", "bpe_reference", "bpe_encode_counts"]

_EOW = "</w>"


def _word_syms(word: str) -> str:
    """Initial symbol string of a word: chars + end-of-word marker, space
    separated (symbols never contain spaces — words come from whitespace
    tokenization)."""
    return " ".join(list(word) + [_EOW])


def _apply_merge(sym: str, left: str, right: str) -> str:
    """Leftmost-greedy non-overlapping merge of the adjacent pair."""
    pat = re.compile(
        r"(?<!\S)" + re.escape(left) + r" " + re.escape(right) + r"(?!\S)")
    return pat.sub(left + right, sym)


def _pair_counts_df(syms: pd.Series, counts: np.ndarray) -> pd.DataFrame:
    """Adjacent-pair counts over symbol strings, weighted by word count —
    the per-block partial.  Vectorized: one explode + shift per block."""
    toks = syms.str.split(" ")
    lens = toks.str.len().to_numpy()
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks]) \
        if len(toks) else np.empty(0, dtype=object)
    wid = np.repeat(np.arange(len(syms), dtype=np.int64), lens)
    l, r = flat[:-1], flat[1:]
    same = wid[:-1] == wid[1:]
    w = np.repeat(counts, lens)[:-1][same]
    df = pd.DataFrame({"left": l[same], "right": r[same], "n": w})
    g = df.groupby(["left", "right"], sort=False)["n"].sum().reset_index()
    return g


def bpe_train(ds: Dataset, text_col: str, num_merges: int,
              num_partitions: int = 4) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges over the corpus; returns a DataFrame
    ``(rank, left, right, pair_count)`` — the merge table, in order."""
    # 1. corpus -> (word, count): the only corpus-sized shuffle.
    def _words(df: pd.DataFrame) -> pd.DataFrame:
        w = df[text_col].str.split(" ").explode()
        w = w[w.str.len() > 0]
        g = w.groupby(w, sort=False).size()
        return pd.DataFrame({"word": g.index.to_numpy(),
                             "n": g.to_numpy(np.int64)})

    words = grouped_agg(ds.map_batches(_words, batch_format="pandas"),
                        ["word"], {"n": ("n", "sum")},
                        num_partitions=num_partitions)

    def _init(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"sym": df["word"].map(_word_syms),
                             "n": df["n"].to_numpy(np.int64)})

    table = words.map_batches(_init, batch_format="pandas").materialize()

    merges = []
    for rank in range(1, num_merges + 1):
        def _partial(df: pd.DataFrame) -> pd.DataFrame:
            return _pair_counts_df(df["sym"], df["n"].to_numpy(np.int64))

        pairs = grouped_agg(table.map_batches(_partial, batch_format="pandas"),
                            ["left", "right"], {"n": ("n", "sum")},
                            num_partitions=num_partitions)
        top = pairs.sort(["n", "left", "right"],
                         descending=[True, False, False]).limit(1).to_pandas()
        if top.empty or int(top["n"].iloc[0]) < 1:
            break
        left, right, cnt = str(top["left"].iloc[0]), str(top["right"].iloc[0]), int(top["n"].iloc[0])
        merges.append((rank, left, right, cnt))

        def _apply(df: pd.DataFrame, l=left, r=right) -> pd.DataFrame:
            df = df.copy(deep=False)
            df["sym"] = df["sym"].map(lambda s: _apply_merge(s, l, r))
            return df

        table = table.map_batches(_apply, batch_format="pandas").materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])


def bpe_reference(texts: "list[str]", num_merges: int) -> pd.DataFrame:
    """Sequential in-memory reference (same rule set) for the pytest."""
    from collections import Counter

    wc = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    syms = {w: _word_syms(w) for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        pc_: "dict[tuple[str, str], int]" = {}
        for w, s in syms.items():
            parts = s.split(" ")
            for a, b in zip(parts[:-1], parts[1:]):
                pc_[(a, b)] = pc_.get((a, b), 0) + wc[w]
        if not pc_:
            break
        # count desc, then (left, right) asc — the trainer's exact tie rule
        (left, right), cnt = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, cnt))
        syms = {w: _apply_merge(s, left, right) for w, s in syms.items()}
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])


def bpe_encode_counts(ds: Dataset, text_col: str, id_col: str,
                      merges: pd.DataFrame) -> Dataset:
    """Apply a learned merge table; emit ``(id, n_tokens)`` per document.

    The merge list broadcasts once (K rows); each block encodes its DISTINCT
    words once (dict-cached) and sums token counts per row — the standard
    inference path, vocabulary-bounded per block."""
    import ray

    mref = ray.put([(str(l), str(r)) for l, r in
                    zip(merges["left"], merges["right"])])

    def _encode(df: pd.DataFrame) -> pd.DataFrame:
        ms = ray.get(mref)
        cache: "dict[str, int]" = {}

        def ntok(word: str) -> int:
            got = cache.get(word)
            if got is None:
                s = _word_syms(word)
                for l, r in ms:
                    if l in s and r in s:
                        s = _apply_merge(s, l, r)
                got = cache[word] = s.count(" ") + 1
            return got

        counts = df[text_col].map(
            lambda t: sum(ntok(w) for w in t.split(" ") if w))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "n_tokens": counts.to_numpy(np.int64)})

    return ds.map_batches(_encode, batch_format="pandas")


def bpe_vocab(ds: Dataset, text_col: str, merges: pd.DataFrame,
              num_partitions: int = 4) -> "dict[str, int]":
    """Deterministic symbol -> id table for a learned merge list: the
    corpus's distinct base characters (one distributed distinct, sorted)
    and the end-of-word marker take the low ids, then merge OUTPUTS in
    merge order — the GPT-2-style convention where a tokenizer's id space
    is a pure function of (alphabet, merges).  Vocabulary-bounded driver
    state (|alphabet| + |merges| entries)."""
    def _chars(df: pd.DataFrame) -> pd.DataFrame:
        joined = "".join(df[text_col].tolist()).replace(" ", "")
        u = sorted(set(joined))
        return pd.DataFrame({"ch": np.asarray(u, dtype=object)})

    chars = grouped_agg(ds.map_batches(_chars, batch_format="pandas"),
                        ["ch"], {"n": ("ch", "count")},
                        num_partitions=num_partitions).to_pandas()
    alphabet = sorted(chars["ch"].tolist())
    vocab: "dict[str, int]" = {}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    vocab[_EOW] = len(vocab)
    for l, r in zip(merges["left"], merges["right"]):
        sym = str(l) + str(r)
        if sym not in vocab:
            vocab[sym] = len(vocab)
    return vocab


def bpe_encode_ids(ds: Dataset, text_col: str, id_col: str,
                   merges: pd.DataFrame, vocab: "dict[str, int]") -> Dataset:
    """Full tokenizer APPLY: text -> ``(id, token_ids list<int64>,
    n_tokens)`` under a learned merge table + vocab — the stage between
    ``bpe_train`` and ``pack_sequences`` in a real pretraining pipeline
    (pack on ``n_tokens`` via ``count_col``; ship ids to the trainer).

    The merge list and vocab broadcast once (vocabulary-bounded); each
    block encodes its DISTINCT words once (dict-cached — Zipf makes this
    the standard inference fast path) and concatenates per document.
    Unknown symbols (a character absent from the vocab's alphabet) raise:
    an id space that silently remaps is a training-data corruption."""
    import ray

    mref = ray.put(([(str(l), str(r)) for l, r in
                     zip(merges["left"], merges["right"])], dict(vocab)))

    def _encode(df: pd.DataFrame) -> pd.DataFrame:
        ms, vb = ray.get(mref)
        cache: "dict[str, list[int]]" = {}

        def ids_of(word: str) -> "list[int]":
            got = cache.get(word)
            if got is None:
                s = _word_syms(word)
                for l, r in ms:
                    if l in s and r in s:
                        s = _apply_merge(s, l, r)
                try:
                    got = cache[word] = [vb[t] for t in s.split(" ")]
                except KeyError as e:
                    raise ValueError(
                        f"bpe_encode_ids: symbol {e.args[0]!r} not in vocab "
                        f"(corpus drifted from the vocab's alphabet)") from e
            return got

        toks = [
            [t for w in text.split(" ") if w for t in ids_of(w)]
            for text in df[text_col]
        ]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "token_ids": toks,
            "n_tokens": np.asarray([len(t) for t in toks], np.int64),
        })

    return ds.map_batches(_encode, batch_format="pandas")
