#!/usr/bin/env python
"""At-scale datapoints for the round-4 LLM-pipeline operators.

- ``semantic_dedup`` over the cached 1M x 64 vector corpus
  (``tools/bench_ann_scale.py`` builds it): kmeans trainer, 128 clusters —
  the SemDeDup paper shape (per-cluster all-pairs, N/k cluster sizes).
- ``pack_sequences`` over a synthetic 4M-document token-count corpus
  (cached parquet): seq_len 2048 — one distributed prefix sum + closed-form
  span map, no text ever shuffles.
- ``char_entropy`` + ``dsir_scores`` over the 200k-page extracted-text
  corpus if present (``/tmp/graft_pages_200000``), else a synthetic 1M-doc
  text table — both single stateless scans.

Prints ONE JSON line with seconds + rows/s per op.

Run: ``python tools/bench_llm_scale.py [--cpus 32]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VECTORS = "/tmp/graft_vectors_1m"
TOKDOCS = "/tmp/graft_tokdocs_4m"
TEXTS = "/tmp/graft_textdocs_1m"


def _build_tokdocs(rows: int = 4_000_000) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(TOKDOCS, exist_ok=True)
    shards, per = 16, rows // 16
    for s in range(shards):
        path = os.path.join(TOKDOCS, f"part-{s:05d}.parquet")
        if os.path.exists(path):
            continue
        ids = np.arange(s * per, (s + 1) * per, dtype=np.int64)
        # deterministic doc lengths 32..2080 tokens, skewed like web text
        n_tok = 32 + (ids * 2654435761 % 2048)
        text = ["w " * 3 for _ in range(per)]  # tiny stand-in text column
        pq.write_table(pa.table({"doc_id": ids, "text": text,
                                 "n_tokens": n_tok}), path)


def _build_texts(rows: int = 1_000_000) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(TEXTS, exist_ok=True)
    words = np.array(["the", "quick", "brown", "fox", "jumps", "over",
                      "lazy", "dog", "data", "engine", "ray", "arrow",
                      "le", "chat", "noir", "der", "hund"], dtype=object)
    shards, per = 16, rows // 16
    for s in range(shards):
        path = os.path.join(TEXTS, f"part-{s:05d}.parquet")
        if os.path.exists(path):
            continue
        rng = np.random.default_rng(500 + s)
        ids = np.arange(s * per, (s + 1) * per, dtype=np.int64)
        k = 20
        w = words[rng.integers(0, len(words), size=(per, k))]
        texts = [" ".join(r) for r in w]
        lang = np.where(ids % 3 == 0, "en", "other")
        pq.write_table(pa.table({"doc_id": ids, "text": texts,
                                 "lang": lang}), path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    _build_tokdocs()
    _build_texts()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import pandas as pd
    import ray.data as rd

    from drivers_of_global_deforestation_ray.functions.text import char_entropy
    from drivers_of_global_deforestation_ray.stages.similarity import semantic_dedup
    from drivers_of_global_deforestation_ray.stages.textstage import (
        dsir_scores, pack_sequences)

    out = {"num_cpus": args.cpus, "ops": {}}

    def _time(name, rows, fn):
        t0 = time.perf_counter()
        n = fn()
        sec = round(time.perf_counter() - t0, 3)
        out["ops"][name] = {"input_rows": rows, "out_rows": int(n),
                            "sec": sec, "rows_per_s": round(rows / sec)}

    if os.path.isdir(VECTORS):
        # cluster count is SemDeDup's scale knob (the paper uses k ~ N/1000
        # or more): per-cluster all-pairs is O((N/k)^2 * k), so k=1024 at 1M
        # keeps clusters ~1k rows.  k=128 measured 369 s (7.8k-row clusters,
        # the quadratic regime) — recorded as the counterexample.
        _time("semantic_dedup_1m", 1_000_000, lambda: semantic_dedup(
            rd.read_parquet(VECTORS), num_clusters=1024, threshold=0.9,
            trainer="kmeans", iters=3, num_partitions=32,
            max_cluster_rows=200_000).count())
        # trainer="ivf" (VERDICT r04 #7): coarse quantizer on a bounded
        # 64k sample instead of 3 full-corpus Lloyd scans — the 100-TB
        # shape at the same k ~ N/1000 cluster count
        _time("semantic_dedup_1m_ivf", 1_000_000, lambda: semantic_dedup(
            rd.read_parquet(VECTORS), num_clusters=1024, threshold=0.9,
            trainer="ivf", num_partitions=32,
            max_cluster_rows=200_000).count())

    _time("pack_sequences_4m", 4_000_000, lambda: pack_sequences(
        rd.read_parquet(TOKDOCS, columns=["doc_id", "text", "n_tokens"]),
        seq_len=2048, count_col="n_tokens").count())

    _time("char_entropy_1m", 1_000_000, lambda: rd.read_parquet(
        TEXTS, columns=["doc_id", "text"]).map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(),
             "entropy": char_entropy(b["text"])[1]}),
        batch_format="pandas").count())

    _time("dsir_scores_1m", 1_000_000, lambda: dsir_scores(
        rd.read_parquet(TEXTS),
        rd.read_parquet(TEXTS).filter(expr="lang == 'en'")).count())

    # MinHash-LSH near-dedup over REAL extracted page text (the scaling
    # corpus, if a prior --scaling run cached it): 200k pages through
    # shingle -> minhash -> band buckets -> windowed pair verify -> drop
    pages = "/tmp/graft_pages_4000000"
    if os.path.isdir(pages):
        from drivers_of_global_deforestation_ray.functions.extract import (
            extract_text_batch)
        from drivers_of_global_deforestation_ray.stages.dedup import (
            minhash_lsh_dedup)

        def _minhash_200k():
            import hashlib

            def _txt(b):
                urls = b["url"].to_numpy()
                ids = np.fromiter(
                    (int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
                     for u in urls), dtype=np.int64, count=len(urls))
                return pd.DataFrame({
                    "doc_id": ids,  # md5(url): globally unique, stable
                    "text": extract_text_batch(b["html"].to_numpy())})

            docs = (rd.read_parquet(pages, columns=["url", "html"])
                    .limit(200_000)
                    .map_batches(_txt, batch_format="pandas"))
            return minhash_lsh_dedup(docs, threshold=0.8).count()

        _time("minhash_dedup_200k_pages", 200_000, _minhash_200k)

        # full tokenizer train + encode-to-ids over the same real text:
        # 16 merges learned on the corpus word table, then every page
        # encoded through the per-block distinct-word cache
        def _bpe_200k():
            import hashlib

            from drivers_of_global_deforestation_ray.functions.bpe import (
                bpe_encode_ids, bpe_train, bpe_vocab)

            def _txt(b):
                urls = b["url"].to_numpy()
                ids = np.fromiter(
                    (int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
                     for u in urls), dtype=np.int64, count=len(urls))
                return pd.DataFrame({
                    "doc_id": ids,
                    "text": extract_text_batch(b["html"].to_numpy())})

            docs = (rd.read_parquet(pages, columns=["url", "html"])
                    .limit(200_000)
                    .map_batches(_txt, batch_format="pandas"))
            # no materialize: bpe_train consumes docs ONCE (word table),
            # the encode pass re-reads — 2 cheap extracts beat pinning
            # 200k texts in the object store
            merges = bpe_train(docs, "text", num_merges=16)
            vocab = bpe_vocab(docs, "text", merges)
            return bpe_encode_ids(docs, "text", "doc_id", merges,
                                  vocab).count()

        _time("bpe_train_encode_200k_pages", 200_000, _bpe_200k)

    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
