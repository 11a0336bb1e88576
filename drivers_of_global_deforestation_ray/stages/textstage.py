"""Document enrichment stage: token stats, quality, language-ID, fingerprints.

One ``map_batches`` pass over a documents table adding the text-analytics
columns (SURVEY.md graft operators; kernels in ``functions/text.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset

from ..functions.text import (
    langid_batch,
    md5_fingerprints,
    quality_stats,
    rolling_fingerprints,
)

__all__ = ["enrich_documents", "repetition_stats", "pii_scrub", "nfc_normalize",
           "deterministic_mix", "chunk_documents", "decontaminate", "dsir_scores",
           "pack_sequences"]

# PII patterns (ASCII-explicit, no \b / \d shorthands: Python re and RE2
# treat those differently around non-ASCII word chars, and byte-identical
# behavior vs the DuckDB oracle is part of the operator contract).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PII_PHONE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4,}"


def pii_scrub(ds: Dataset, text_col: str = "text",
              out_col: str = "red_text", batch_size: int = 4096) -> Dataset:
    """Pretraining-pipeline PII redaction (C4/Dolma-style): count then mask
    emails, IPv4 addresses and international phone numbers.  Vectorized
    pandas-str kernels (compiled regex cache inside pandas); counts are
    taken on the raw text, masks applied email -> phone -> ip so nested
    matches resolve deterministically."""

    def _scrub(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col]
        batch["n_email"] = s.str.count(PII_EMAIL).astype(np.int64)
        batch["n_ip"] = s.str.count(PII_IPV4).astype(np.int64)
        batch["n_phone"] = s.str.count(PII_PHONE).astype(np.int64)
        red = s.str.replace(PII_EMAIL, "<EMAIL>", regex=True)
        red = red.str.replace(PII_PHONE, "<PHONE>", regex=True)
        batch[out_col] = red.str.replace(PII_IPV4, "<IP>", regex=True)
        return batch.drop(columns=[text_col])

    return ds.map_batches(_scrub, batch_format="pandas", batch_size=batch_size)


def nfc_normalize(ds: Dataset, text_col: str = "text",
                  out_col: str = "norm_text", batch_size: int = 4096) -> Dataset:
    """Unicode NFC normalization (combining sequences -> precomposed), the
    standard first step of web-corpus text cleaning.  ``Series.str.normalize``
    is the pandas-native kernel; codepoint lengths ride along so the oracle
    (DuckDB ``nfc_normalize`` + ``length``) checks both content and size."""

    def _norm(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col]
        batch["n_raw"] = s.str.len().astype(np.int64)
        batch[out_col] = s.str.normalize("NFC")
        batch["n_norm"] = batch[out_col].str.len().astype(np.int64)
        return batch.drop(columns=[text_col])

    return ds.map_batches(_norm, batch_format="pandas", batch_size=batch_size)


def repetition_stats(ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
                     batch_size: int = 4096) -> Dataset:
    """Gopher-style repetition signals per document: word count, distinct
    words, duplicate-word fraction, most-common-word fraction.  Fully
    vectorized (one explode + two groupbys per batch; tokenization is a
    plain single-space split so the DuckDB ``string_split`` oracle matches
    exactly — fractions are exact integer ratios, no rounding)."""

    def _rep(batch: pd.DataFrame) -> pd.DataFrame:
        words = (batch[[id_col]].assign(__w=batch[text_col].str.split(" "))
                 .explode("__w"))
        g = words.groupby(id_col, sort=False)["__w"]
        n = g.size()
        dist = g.nunique()
        top = words.groupby([id_col, "__w"], sort=False).size().groupby(
            id_col, sort=False).max()
        out = pd.DataFrame({
            id_col: n.index.to_numpy(),
            "n_words": n.to_numpy(dtype=np.int64),
            "n_distinct_words": dist.to_numpy(dtype=np.int64),
        })
        out["dup_word_frac"] = (out["n_words"] - out["n_distinct_words"]) / out["n_words"]
        out["top_word_frac"] = top.reindex(n.index).to_numpy(dtype=np.float64) / out["n_words"]
        return out

    return ds.map_batches(_rep, batch_format="pandas", batch_size=batch_size)


def enrich_documents(
    ds: Dataset,
    text_col: str = "text",
    langid: bool = True,
    fingerprints: bool = True,
    batch_size: int = 4096,
) -> Dataset:
    def _enrich(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_stats(batch[text_col])
        for k, v in q.items():
            batch[k] = v
        if langid:
            batch["lang_pred"] = langid_batch(batch[text_col])
        if fingerprints:
            batch["fingerprint_md5"] = md5_fingerprints(batch[text_col])
            batch["fingerprint_roll"] = rolling_fingerprints(batch[text_col]).astype(np.uint64)
        return batch

    return ds.map_batches(_enrich, batch_format="pandas", batch_size=batch_size)


# --- pretraining corpus assembly ops ---------------------------------------

def deterministic_mix(
    ds: Dataset,
    ratios: "dict[str, float]",
    id_col: str = "doc_id",
    source_col: str = "source",
    batch_size: int = 8192,
) -> Dataset:
    """Deterministic source-ratio corpus mixing (pretraining data-mixture
    weights): keep a row iff ``md5_u32(id) / 2^32 < ratios[source]``.

    The md5-derived uniform is the engine's established SQL-twin hash
    (``functions/extract.geocode_urls``), so the SAME rows are selected on
    every run, at every partitioning, and by the DuckDB oracle — corpus
    mixing as a pure, resumable filter (no RNG state, no sampling pass).
    Sources absent from ``ratios`` get 0.0 (dropped); ratio 1.0 keeps all.
    Stateless vectorized map — scale-safe at any corpus size."""
    import hashlib

    _u32 = 4294967296.0

    def _mix(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        u = np.empty(len(ids), dtype=np.float64)
        for i, v in enumerate(ids):
            u[i] = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        u /= _u32
        r = batch[source_col].map(ratios).fillna(0.0).to_numpy(dtype=np.float64)
        return batch[u < r]

    return ds.map_batches(_mix, batch_format="pandas", batch_size=batch_size)


def chunk_documents(
    ds: Dataset,
    size: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 2048,
) -> Dataset:
    """Sequence chunking/packing: split each document into windows of
    ``size`` chars stepping by ``size - overlap`` (training-sample prep).

    Exact integer chunk-count rule, shared verbatim with the SQL twin:
    ``n = 1 if len <= size else 1 + ceil_div(len - size, step)`` with
    integer ``ceil_div``; chunk ``k`` is ``text[k*step : k*step + size]``
    (1-based ``substr(text, k*step + 1, size)`` in SQL).  Empty documents
    produce one empty chunk.  Row-multiplying explode inside the batch —
    output rows never cross blocks, so the op streams."""
    if not 0 <= overlap < size:
        raise ValueError("chunk_documents: require 0 <= overlap < size")
    step = size - overlap

    def _chunk(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].to_numpy(dtype=object)
        lens = batch[text_col].str.len().to_numpy(dtype=np.int64)
        n = np.where(lens <= size, 1, 1 + (np.maximum(lens - size, 0) + step - 1) // step)
        rep = np.repeat(np.arange(len(texts)), n)
        idx = np.concatenate([np.arange(k) for k in n]) if len(n) else np.empty(0, np.int64)
        starts = idx * step
        chunks = [texts[r][s:s + size] for r, s in zip(rep, starts)]
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[rep],
            "chunk_idx": idx.astype(np.int64),
            "chunk_text": pd.array(chunks, dtype=object),
            "chunk_len": pd.Series(chunks).str.len().to_numpy(dtype=np.int64),
        })

    return ds.map_batches(_chunk, batch_format="pandas", batch_size=batch_size)


def _word_trigrams(ids: np.ndarray, texts: pd.Series) -> pd.DataFrame:
    """(doc_id, trigram) pairs via the vectorized shift explode
    (same kernel shape as the top-ngrams query)."""
    w = pd.DataFrame({"doc_id": ids}).assign(__w=texts.str.split(" ").to_numpy(dtype=object)).explode("__w")
    d = w["doc_id"].to_numpy()
    words = w["__w"].to_numpy(dtype=object)
    ok = (d == np.roll(d, -1)) & (d == np.roll(d, -2))
    if len(ok) >= 2:
        ok[-2:] = False
    tri = (pd.Series(words[ok]) + " " + pd.Series(np.roll(words, -1)[ok])
           + " " + pd.Series(np.roll(words, -2)[ok]))
    return pd.DataFrame({"doc_id": d[ok], "gram": tri.to_numpy(dtype=object)})


def decontaminate(
    ds: Dataset,
    benchmark_grams: "set[str] | frozenset[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 4096,
) -> Dataset:
    """Benchmark decontamination: per document, the number of DISTINCT word
    trigrams shared with the benchmark set, plus a contaminated flag.

    The benchmark side is broadcast (``ray.put`` once, read per actor task)
    — benchmarks are small by nature (MMLU-class eval sets are <<1 GB of
    n-grams), so this is the textbook small-side broadcast, never a
    shuffle.  The corpus side stays a stateless vectorized map: shift-based
    trigram explode, C-level ``isin`` against the broadcast set, per-doc
    distinct count — output is one row per input document."""
    import ray

    grams_ref = ray.put(frozenset(benchmark_grams))

    def _scan(batch: pd.DataFrame) -> pd.DataFrame:
        grams = ray.get(grams_ref)
        ids = batch[id_col].to_numpy()
        tri = _word_trigrams(ids, batch[text_col])
        hit = tri[tri["gram"].isin(grams)].drop_duplicates()
        n = hit.groupby("doc_id", sort=False).size()
        n_hits = pd.Series(ids).map(n).fillna(0).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            id_col: ids,
            "n_hits": n_hits,
            "contaminated": (n_hits > 0).astype(np.int64),
        })

    return ds.map_batches(_scan, batch_format="pandas", batch_size=batch_size)


def dsir_scores(
    raw: Dataset,
    target: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    round_to: int = 6,
) -> Dataset:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    each ``raw`` doc by how target-like its hashed n-gram distribution is.

    Features are unigrams + space-joined bigrams over ``split(' ')`` tokens,
    hashed ``md5_u32(feat) % num_buckets`` (the ``quality_linear`` SQL-twin
    hash, so the whole operator is DuckDB-checkable).  Two add-1-smoothed
    bag models are fit by distributed exact counts — p from ``target``, q
    from ``raw`` — and

        log w(doc) = sum_h  n_doc(h) * [ ln((c_p(h)+1)/(T_p+B))
                                       - ln((c_q(h)+1)/(T_q+B)) ]

    rounded to ``round_to`` decimals (the lm_score float discipline: the
    only float drift is ln/summation reassociation, ~1e-12 on 1e-6
    granularity).  Selection = a downstream top-k on (weight desc, id).

    Scale shape: both count passes emit (bucket, n) partials per block and
    collapse via two-phase grouped sum to AT MOST ``num_buckets`` rows —
    the model is bucket-bounded by construction (DSIR's core trick), so the
    broadcast score table is O(B) floats regardless of corpus size, and the
    scoring pass is a stateless vectorized scan.  Returns (id, dsir_weight).
    """
    import hashlib

    from .relational import grouped_agg

    B = num_buckets

    def _feat_rows(df: pd.DataFrame) -> pd.DataFrame:
        """(doc_id, h) one row per feature instance -> per-block partials."""
        parts = []
        for did, text in zip(df[id_col].to_numpy(), df[text_col]):
            ws = text.split(" ")
            feats = ws + [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)]
            uniq, counts = np.unique(np.asarray(feats, dtype=object),
                                     return_counts=True)
            hs = np.fromiter(
                (int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B
                 for f in uniq), dtype=np.int64, count=len(uniq))
            parts.append((did, hs, counts.astype(np.int64)))
        if not parts:
            return pd.DataFrame({id_col: np.empty(0, np.int64),
                                 "h": np.empty(0, np.int64),
                                 "n": np.empty(0, np.int64)})
        ids = np.concatenate([np.full(len(h), d, np.int64) for d, h, _ in parts])
        return pd.DataFrame({
            id_col: ids,
            "h": np.concatenate([h for _, h, _ in parts]),
            "n": np.concatenate([c for _, _, c in parts]),
        })

    def _bucket_counts(ds: Dataset) -> "tuple[np.ndarray, int]":
        rows = grouped_agg(ds.map_batches(_feat_rows, batch_format="pandas"),
                           ["h"], {"n": ("n", "sum")},
                           num_partitions=4).to_pandas()  # <= B rows
        c = np.zeros(B, np.int64)
        c[rows["h"].to_numpy()] = rows["n"].to_numpy()
        return c, int(c.sum())

    c_q, t_q = _bucket_counts(raw)
    c_p, t_p = _bucket_counts(target)
    logdiff = (np.log((c_p + 1.0) / (t_p + float(B)))
               - np.log((c_q + 1.0) / (t_q + float(B))))
    lref = ray.put(logdiff)

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        ld = ray.get(lref)
        f = _feat_rows(df)
        w = pd.Series(f["n"].to_numpy() * ld[f["h"].to_numpy()]).groupby(
            f[id_col].to_numpy(), sort=False).sum()
        return pd.DataFrame({id_col: w.index.to_numpy(),
                             "dsir_weight": np.round(w.to_numpy(), round_to)})

    return raw.map_batches(_score, batch_format="pandas")


def pack_sequences(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 128,
    count_col: "str | None" = None,
) -> Dataset:
    """Cross-document SEQUENCE PACKING — the GPT-style pretraining layout:
    conceptually concatenate every document's token stream in ``id_col``
    order and slice it into fixed ``seq_len`` windows, letting documents
    span sequence boundaries.  Emits the (sequence x document) span map —
    one row per overlap: ``(seq_id, doc_id, doc_offset, seq_offset,
    n_tokens)`` — which is exactly what a loader needs to assemble
    training sequences shard-by-shard without ever materializing the
    concatenated stream.

    Tokens are whitespace-split words (``split(' ')``, the engine's
    SQL-twin token rule); pass ``count_col`` to pack on PRE-COMPUTED token
    counts instead (the production shape — a tokenized corpus carries
    counts, and the text column never has to leave storage).  The only global coordination is the distributed
    prefix sum over per-doc token counts (:func:`~.relational.running_total`
    — range-histogram offsets, O(buckets) driver state); the span explosion
    is a stateless vectorized pass.  All-integer output -> hash-exact
    checkable.
    """
    from .relational import running_total

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        if count_col is not None:
            n = df[count_col].to_numpy(np.int64)
        else:
            n = df[text_col].str.split(" ").str.len().to_numpy(np.int64)
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "__n": n})

    counted = ds.map_batches(_count, batch_format="pandas")
    ends = running_total(counted, id_col, id_col, "__n", out_col="__e")

    def _spans(df: pd.DataFrame) -> pd.DataFrame:
        n = df["__n"].to_numpy(np.int64)
        e = df["__e"].to_numpy(np.int64)
        s = e - n
        keep = n > 0
        n, e, s = n[keep], e[keep], s[keep]
        ids = df[id_col].to_numpy()[keep]
        first = s // seq_len
        last = (e - 1) // seq_len
        reps = (last - first + 1).astype(np.int64)
        ridx = np.repeat(np.arange(len(ids)), reps)
        # per-row sequence index: first[doc] + position within the doc's run
        offs = np.concatenate([np.arange(r) for r in reps]) if len(reps) else \
            np.empty(0, np.int64)
        seq = first[ridx] + offs
        lo = np.maximum(s[ridx], seq * seq_len)
        hi = np.minimum(e[ridx], (seq + 1) * seq_len)
        return pd.DataFrame({
            "seq_id": seq.astype(np.int64),
            id_col: ids[ridx],
            "doc_offset": (lo - s[ridx]).astype(np.int64),
            "seq_offset": (lo - seq * seq_len).astype(np.int64),
            "n_tokens": (hi - lo).astype(np.int64),
        })

    return ends.map_batches(_spans, batch_format="pandas")
