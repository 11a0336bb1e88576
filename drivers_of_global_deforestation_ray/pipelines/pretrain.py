"""End-to-end pretraining-data pipeline: raw crawl pages -> training-ready
text chunks — every stage one of the engine's first-class operators, chained
the way a production webtext pipeline (C4 / CCNet / RefinedWeb shape) runs:

    read (pruned columns)
      -> extract text + canonical-url identity (md5 doc ids)
      -> quality gate (token window, mean-token-length, duplicate-word
         fraction — one vectorized pass, exact integer ratios)
         + language filter (n-gram langid, keep the configured set)
      -> exact text dedup (16-byte fingerprints shuffle, min-id wins)
      -> MinHash+LSH near-dedup (bands shuffle, texts stay put,
         scale-adaptive drop set)
      -> PII redaction (byte-deterministic regex masking)
      -> sequence chunking (char windows + overlap, in-batch explode)

The gate runs BEFORE exact dedup (they commute exactly: every gate predicate
is a function of the text alone, and exact duplicates share the text — so
gating a duplicate class keeps either all or none of it, and min-id-per-text
is unchanged), which makes the expensive page stage per-shard decomposable.

Nothing corpus-sized ever materializes in the object store or on the driver.
The two heavy prefixes run through :class:`~..sources.checkpoint
.StageCheckpoint` parquet partials instead:

- ``gated_docs`` — per input-file shard (extract -> gate), resumable
  per shard with lineage + throughput manifests; a killed run skips
  complete shards on rerun.
- ``exact_dedup`` — the global fingerprint shuffle, one fingerprinted
  partition over the gated files; a rerun with unchanged inputs skips it.

MinHash near-dedup consumes its input twice (candidate pass + drop filter);
both passes are now PRUNED RE-READS of the exact-dedup parquet — the fix the
round-3 review asked for (the previous ``gated.materialize()`` forced a
corpus-sized object-store spill at the pipeline's waist).

Checkpoint stage names embed a hash of the config, so runs with different
configs never reuse each other's partials even under a shared ``ckpt_root``.

The pipeline is deterministic end-to-end (md5 identities, no RNG), so reruns
and different partitionings produce identical chunk sets — asserted by the
pytest.  Returns the chunk Dataset; the optional per-stage row-count
``report`` reads the manifests/parquet metadata for the checkpointed stages
(free) and executes only the cheap post-dedup tail twice.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

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
    num_shards: int = 8

    def fingerprint(self) -> str:
        """Stable hash of every field that affects stage OUTPUTS — keyed
        into checkpoint stage names so config changes never reuse stale
        partials."""
        h = hashlib.blake2b(digest_size=8)
        for f in ("min_tokens", "max_tokens", "max_mean_token_len",
                  "max_dup_word_frac", "keep_langs"):
            h.update(f"{f}={getattr(self, f)!r};".encode())
        return h.hexdigest()


def run_pretrain(pages_dir: str, cfg: PretrainConfig | None = None,
                 report: "dict | None" = None,
                 ckpt_root: "str | None" = None):
    """pages parquet -> training chunks Dataset (doc_id, chunk_idx, text).

    ``ckpt_root`` holds the stage partials (and makes the run resumable);
    defaults to a deterministic per-corpus directory under /tmp, so an
    unchanged rerun resumes for free.  ``report`` (optional dict) receives
    per-stage row counts."""
    import glob

    import ray.data as rd

    from ..sources.checkpoint import StageCheckpoint, shard_files

    cfg = cfg or PretrainConfig()
    if ckpt_root is None:
        key = hashlib.blake2b(os.path.abspath(pages_dir).encode(),
                              digest_size=8).hexdigest()
        ckpt_root = f"/tmp/graft_pretrain_ckpt/{key}"

    def _extract(b: pa.Table) -> pd.DataFrame:
        import hashlib as _hl

        texts = extract_text_batch(b["html"].to_pylist())
        ids = np.fromiter(
            (int(_hl.md5(u.encode()).hexdigest()[:12], 16)
             for u in b["url"].to_pylist()), dtype=np.int64, count=len(b))
        return pd.DataFrame({"doc_id": ids, "text": texts})

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

    # stage 1: extract + gate, per input-file shard (resumable per shard)
    def _gate_stage(files: "list[str]") -> "rd.Dataset":
        nblocks = max(8, sum(os.path.getsize(f) for f in files) // (8 << 20))
        return (rd.read_parquet(files, columns=["url", "html"],
                                override_num_blocks=int(nblocks))
                .map_batches(_extract, batch_format="pyarrow")
                .map_batches(_gate, batch_format="pandas"))

    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    gate_ckpt = StageCheckpoint(ckpt_root, f"gated_docs_{cfg.fingerprint()}")
    gate_recs = gate_ckpt.run(shard_files(files, cfg.num_shards), _gate_stage)

    # stage 2: global exact dedup — ONE fingerprinted partition over the
    # gated files (the fingerprint shuffle is global, not per-shard; the
    # manifest skips it when the gated inputs are unchanged)
    def _dedup_stage(in_files: "list[str]") -> "rd.Dataset":
        return dedup_exact_text(rd.read_parquet(in_files), "text", "doc_id",
                                num_partitions=cfg.num_partitions)

    gate_files = gate_ckpt.output_files()
    if not gate_files:  # every page gated out — a typed empty chunk set
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "chunk_idx": pa.array([], pa.int64()),
                          "chunk_text": pa.array([], pa.string()),
                          "chunk_len": pa.array([], pa.int64())})
        if report is not None:
            import pyarrow.parquet as pq

            report.update(
                pages=sum(pq.read_metadata(f).num_rows for f in files),
                after_quality_lang_gate=0, after_exact_dedup=0,
                after_near_dedup=0, chunks=0)
        return rd.from_arrow(empty)

    dd_ckpt = StageCheckpoint(ckpt_root, f"exact_dedup_{cfg.fingerprint()}")
    dd_recs = dd_ckpt.run([gate_files], _dedup_stage)

    # near-dedup consumes its input twice (candidates + drop filter): both
    # passes re-read the exact-dedup parquet — no object-store residency
    deduped = rd.read_parquet(dd_ckpt.output_files())
    neardup = minhash_lsh_dedup(deduped, text_col="text", id_col="doc_id",
                                threshold=cfg.minhash_threshold,
                                num_partitions=cfg.num_partitions)
    scrubbed = pii_scrub(neardup, text_col="text")

    def _carry(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(),
                             "text": b["red_text"].to_numpy(dtype=object)})

    clean = scrubbed.map_batches(_carry, batch_format="pandas")
    chunks = chunk_documents(clean, size=cfg.chunk_size,
                             overlap=cfg.chunk_overlap)

    if report is not None:
        import pyarrow.parquet as pq

        report["pages"] = sum(pq.read_metadata(f).num_rows for f in files)
        report["after_quality_lang_gate"] = sum(r["rows"] for r in gate_recs)
        report["after_exact_dedup"] = sum(r["rows"] for r in dd_recs)
        report["after_near_dedup"] = neardup.count()
        report["chunks"] = chunks.count()
    return chunks


def run_pretrain_tokenized(pages_dir: str, cfg: "PretrainConfig | None" = None,
                           num_merges: int = 16, seq_len: int = 512,
                           report: "dict | None" = None,
                           ckpt_root: "str | None" = None):
    """The COMPLETE pretraining chain: pages -> curated chunks
    (:func:`run_pretrain`) -> BPE tokenizer trained on the surviving
    corpus -> every chunk encoded to token ids -> cross-document sequence
    packing on the stored counts.

    Returns ``(span_map Dataset, encoded Dataset, vocab dict)``:

    - ``span_map`` — ``(seq_id, chunk_id, doc_offset, seq_offset,
      n_tokens)``, the loader-ready packing layout (all-integer,
      deterministic);
    - ``encoded`` — ``(chunk_id, token_ids list<int64>, n_tokens)``, the
      shard-local payloads the loader gathers by ``chunk_id``;
    - ``vocab`` — the deterministic (alphabet + merge-order) id table.

    Tokenizer training sees only POST-curation text (the production
    order: dedup/PII first, or the tokenizer memorizes boilerplate and
    leaked identifiers).  Packing moves only ``(chunk_id, n_tokens)``
    through the prefix sum — token ids never ride a shuffle."""
    from ..functions.bpe import bpe_encode_ids, bpe_train, bpe_vocab
    from ..stages.textstage import pack_sequences

    chunks = run_pretrain(pages_dir, cfg, report=report, ckpt_root=ckpt_root)

    def _key(b: pd.DataFrame) -> pd.DataFrame:
        cid = [f"{d}:{i:06d}" for d, i in zip(b["doc_id"], b["chunk_idx"])]
        return pd.DataFrame({"chunk_id": np.asarray(cid, dtype=object),
                             "text": b["chunk_text"].to_numpy(dtype=object)})

    keyed = chunks.map_batches(_key, batch_format="pandas")
    merges = bpe_train(keyed, "text", num_merges=num_merges)
    vocab = bpe_vocab(keyed, "text", merges)
    encoded = bpe_encode_ids(keyed, "text", "chunk_id", merges, vocab)
    span_map = pack_sequences(
        encoded.select_columns(["chunk_id", "n_tokens"]),
        id_col="chunk_id", seq_len=seq_len, count_col="n_tokens")
    if report is not None:
        report["vocab_size"] = len(vocab)
        report["sequences"] = span_map.count()
    return span_map, encoded, vocab
