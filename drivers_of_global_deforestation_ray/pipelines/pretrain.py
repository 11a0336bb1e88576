"""End-to-end pretraining-data pipeline: raw crawl pages -> training-ready
text chunks — every stage one of the engine's first-class operators, chained
the way a production webtext pipeline (C4 / CCNet / RefinedWeb shape) runs:

    read (pruned columns)
      -> extract text + canonical-url identity (md5 doc ids)
      -> exact text dedup (16-byte fingerprints shuffle, min-id wins)
      -> quality gate (token window, mean-token-length, duplicate-word
         fraction — one vectorized pass, exact integer ratios)
      -> language filter (n-gram langid, keep the configured set)
      -> MinHash+LSH near-dedup (bands shuffle, texts stay put,
         scale-adaptive drop set)
      -> PII redaction (byte-deterministic regex masking)
      -> sequence chunking (char windows + overlap, in-batch explode)

Everything streams: the only corpus-sized shuffles are the two dedup key
exchanges; no stage materializes the corpus on the driver.  The pipeline is
deterministic end-to-end (md5 identities, no RNG), so reruns and different
partitionings produce identical chunk sets — asserted by the pytest.

Returns the chunk Dataset; the optional per-stage row-count report
RE-EXECUTES each stage's un-materialized lineage prefix (measured ~25%
slower e2e) — use it for auditing a corpus, not for benchmarking.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.extract import extract_text_batch
from ..functions.text import char_counts_nospace, langid_batch, token_counts
from ..stages.dedup import dedup_exact_text, minhash_lsh_dedup
from ..stages.textstage import chunk_documents, pii_scrub


@dataclass
class PretrainConfig:
    min_tokens: int = 20
    max_tokens: int = 100_000
    max_mean_token_len: float = 12.0
    max_dup_word_frac: float = 0.9
    keep_langs: tuple = ("en", "fr", "es")
    minhash_threshold: float = 0.85
    chunk_size: int = 512
    chunk_overlap: int = 64
    num_partitions: int = 32


def run_pretrain(pages_dir: str, cfg: PretrainConfig | None = None,
                 report: "dict | None" = None):
    """pages parquet -> training chunks Dataset (doc_id, chunk_idx, text).
    ``report`` (optional dict) receives per-stage row counts."""
    import hashlib

    import ray.data as rd

    cfg = cfg or PretrainConfig()
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])

    def _extract(b: pa.Table) -> pd.DataFrame:
        texts = extract_text_batch(b["html"].to_pylist())
        ids = np.fromiter(
            (int(hashlib.md5(u.encode()).hexdigest()[:12], 16)
             for u in b["url"].to_pylist()), dtype=np.int64, count=len(b))
        return pd.DataFrame({"doc_id": ids, "text": texts})

    docs = pages.map_batches(_extract, batch_format="pyarrow")
    exact = dedup_exact_text(docs, "text", "doc_id",
                             num_partitions=cfg.num_partitions)

    def _gate(b: pd.DataFrame) -> pd.DataFrame:
        nt = token_counts(b["text"])
        nc = char_counts_nospace(b["text"])
        words = (b[["doc_id"]].assign(__w=b["text"].str.split(" "))
                 .explode("__w").groupby("doc_id", sort=False)["__w"])
        n_w = words.size().reindex(b["doc_id"]).to_numpy()
        n_d = words.nunique().reindex(b["doc_id"]).to_numpy()
        mtl = nc / np.maximum(nt, 1)
        dwf = (n_w - n_d) / np.maximum(n_w, 1)
        lang = np.asarray(langid_batch(b["text"]), dtype=object)
        keep = ((nt >= cfg.min_tokens) & (nt <= cfg.max_tokens)
                & (mtl < cfg.max_mean_token_len)
                & (dwf < cfg.max_dup_word_frac)
                & np.isin(lang, np.asarray(cfg.keep_langs, dtype=object)))
        out = b[["doc_id", "text"]].copy(deep=False)
        out["lang"] = lang
        return out[keep]

    gated = exact.map_batches(_gate, batch_format="pandas")
    # near-dedup consumes its input twice (candidates + drop filter)
    gated = gated.materialize()
    neardup = minhash_lsh_dedup(gated, text_col="text", id_col="doc_id",
                                threshold=cfg.minhash_threshold,
                                num_partitions=cfg.num_partitions)
    scrubbed = pii_scrub(neardup, text_col="text")

    def _carry_lang(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                             "text": b["red_text"].to_numpy(dtype=object)})

    clean = scrubbed.map_batches(_carry_lang, batch_format="pandas")
    chunks = chunk_documents(clean, size=cfg.chunk_size,
                             overlap=cfg.chunk_overlap)

    if report is not None:
        report["pages"] = pages.count()
        report["after_exact_dedup"] = exact.count()
        report["after_quality_lang_gate"] = gated.count()
        report["after_near_dedup"] = neardup.count()
        report["chunks"] = chunks.count()
    return chunks
