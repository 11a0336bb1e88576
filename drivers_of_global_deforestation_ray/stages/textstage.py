"""Document enrichment stage: token stats, quality, language-ID, fingerprints.

One ``map_batches`` pass over a documents table adding the text-analytics
columns (SURVEY.md graft operators; kernels in ``functions/text.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from ..functions.text import (
    langid_batch,
    md5_fingerprints,
    quality_stats,
    rolling_fingerprints,
)

__all__ = ["enrich_documents", "repetition_stats", "pii_scrub", "nfc_normalize"]

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
