"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators over a documents table (id + text).  The
common scale shape: per-doc sketches are computed in ``map_batches`` actor
pools (hashers built once per actor), candidate generation is a groupby on
compact *bucket keys* (never on raw text), verification happens inside the
bucket groups, and the final keep-set is a broadcast filter.

Duplicate semantics (deterministic): a document is DROPPED iff it is
(near-)duplicate of some document with a smaller id — the minimal-id member of
every duplicate cluster survives.  For chained near-dup clusters (a~b, b~c,
a!~c) this keeps only the minimal id of each *pairwise-linked* component
reachable via lower ids, matching the common "keep first seen" crawl rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from ..functions.hashing import MinHasher, hash_tokens64, jaccard, simhash64, word_shingles
from ..functions.text import md5_fingerprints

__all__ = [
    "dedup_exact_text",
    "minhash_lsh_pairs",
    "minhash_lsh_dedup",
    "simhash_pairs",
    "simhash_dedup",
    "drop_ids",
]


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def dedup_exact_text(ds: Dataset, text_col: str, id_col: str) -> Dataset:
    """Keep the min-id row per exact text.  Shuffles md5 fingerprints (16 B),
    never the text bodies: hash -> groupby(hash) -> min id -> broadcast-join
    the winner ids back is unnecessary since we keep (id, hash) only —
    the group step directly emits the winner row ids + text."""

    def _fp(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__fp"] = md5_fingerprints(batch[text_col])
        return batch

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        return g.loc[[g[id_col].idxmin()]].drop(columns="__fp")

    return ds.map_batches(_fp, batch_format="pandas").groupby("__fp").map_groups(
        _first, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class _MinHashStage:
    """Actor: signature per doc, exploded to one row per LSH band."""

    def __init__(self, text_col: str, id_col: str, num_perms: int, num_bands: int,
                 shingle_k: int, seed: int, carry_text: bool):
        self.hasher = MinHasher(num_perms, seed)
        self.text_col, self.id_col = text_col, id_col
        self.num_bands = num_bands
        self.shingle_k = shingle_k
        self.carry_text = carry_text

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, sigs, texts = [], [], [], []
        for _, row in batch.iterrows():
            sh = word_shingles(row[self.text_col] or "", self.shingle_k)
            sig = self.hasher.signature(hash_tokens64(sh))
            for key in self.hasher.band_keys(sig, self.num_bands):
                ids.append(row[self.id_col])
                bands.append(key)
                sigs.append(sig.tobytes())
                texts.append(row[self.text_col] if self.carry_text else "")
        return pd.DataFrame(
            {"doc_id": ids, "band": bands, "sig": sigs, "text": texts}
        )


def _bucket_pairs(g: pd.DataFrame, threshold: float, num_perms: int, exact: bool,
                  shingle_k: int) -> pd.DataFrame:
    """Pairwise verify within one LSH bucket.  Buckets are tiny by
    construction (hash equality on a band); an adversarial giant bucket is
    capped and logged via truncation to the 256 smallest ids."""
    g = g.sort_values("doc_id", kind="stable").drop_duplicates("doc_id").head(256)
    n = len(g)
    if n < 2:
        return pd.DataFrame({"a": [], "b": [], "sim": []})
    ids = g["doc_id"].to_numpy()
    a_out, b_out, s_out = [], [], []
    if exact:
        shingle_sets = [set(word_shingles(t or "", shingle_k)) for t in g["text"]]
        for i in range(n):
            for j in range(i + 1, n):
                s = jaccard(shingle_sets[i], shingle_sets[j])
                if s >= threshold:
                    a_out.append(ids[i]); b_out.append(ids[j]); s_out.append(s)
    else:
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
        for i in range(n):
            est = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            hit = np.nonzero(est >= threshold)[0]
            for j in hit:
                a_out.append(ids[i]); b_out.append(ids[i + 1 + j]); s_out.append(float(est[j]))
    return pd.DataFrame({"a": np.asarray(a_out, dtype=np.int64),
                         "b": np.asarray(b_out, dtype=np.int64),
                         "sim": np.asarray(s_out, dtype=np.float64)})


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 128,
    num_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    seed: int = 7,
    exact_verify: bool = False,
    concurrency=(1, 8),
) -> Dataset:
    """Candidate near-dup pairs (a < b, sim >= threshold).

    ``exact_verify=False`` verifies by signature agreement (nothing but 1 KB
    sigs ever shuffles); ``True`` carries text into buckets and verifies true
    n-gram Jaccard (the "n-gram Jaccard dedup" operator)."""
    exploded = ds.map_batches(
        _MinHashStage,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perms=num_perms,
            num_bands=num_bands, shingle_k=shingle_k, seed=seed,
            carry_text=exact_verify,
        ),
        batch_format="pandas",
        concurrency=concurrency,
    )
    pairs = exploded.groupby("band").map_groups(
        lambda g: _bucket_pairs(g, threshold, num_perms, exact_verify, shingle_k),
        batch_format="pandas",
    )
    # a pair found in several bands must count once
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


def drop_ids(pairs: Dataset, ds: Dataset, id_col: str) -> Dataset:
    """Filter out every doc that near-duplicates a smaller id (pairs: a<b ->
    drop b).  The drop-set is compact (ids only) -> broadcast filter."""
    drop_df = pairs.select_columns(["b"]).to_pandas()  # pairs are compact: ids only
    drop_arr = np.unique(drop_df["b"].to_numpy().astype(np.int64))
    ref = ray.put(drop_arr)

    def _keep(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        mask = ~np.isin(batch[id_col].to_numpy(), d)
        return batch.filter(pa.array(mask))

    return ds.map_batches(_keep, batch_format="pyarrow")


def minhash_lsh_dedup(ds: Dataset, **kwargs) -> Dataset:
    """End-to-end near-dedup: survivors of :func:`minhash_lsh_pairs`."""
    id_col = kwargs.get("id_col", "doc_id")
    pairs = minhash_lsh_pairs(ds, **kwargs)
    return drop_ids(pairs, ds, id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class _SimHashStage:
    """Actor: 64-bit simhash per doc + one row per 16-bit chunk (4 chunks ->
    guaranteed candidate recall for Hamming distance <= 3)."""

    def __init__(self, text_col: str, id_col: str, seed: int):
        self.text_col, self.id_col, self.seed = text_col, id_col, seed

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, chunks, hashes = [], [], []
        for _, row in batch.iterrows():
            toks = (row[self.text_col] or "").lower().split()
            h = simhash64(hash_tokens64(toks, self.seed))
            for c in range(4):
                ids.append(row[self.id_col])
                chunks.append(f"{c}:{(h >> (16 * c)) & 0xFFFF:04x}")
                hashes.append(h)
        return pd.DataFrame({"doc_id": ids, "chunk": chunks, "simhash": np.asarray(hashes, dtype=np.uint64)})


def simhash_pairs(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, seed: int = 11, concurrency=(1, 8),
) -> Dataset:
    exploded = ds.map_batches(
        _SimHashStage,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col, seed=seed),
        batch_format="pandas",
        concurrency=concurrency,
    )

    def _verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable").drop_duplicates("doc_id").head(256)
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        a_out, b_out, d_out = [], [], []
        for i in range(len(g)):
            x = np.bitwise_xor(hs[i + 1 :], hs[i])
            dist = np.zeros(len(x), dtype=np.int64)
            xx = x.copy()
            while xx.any():
                dist += (xx & np.uint64(1)).astype(np.int64)
                xx >>= np.uint64(1)
            hit = np.nonzero(dist <= max_hamming)[0]
            for j in hit:
                a_out.append(ids[i]); b_out.append(ids[i + 1 + j]); d_out.append(int(dist[j]))
        return pd.DataFrame({"a": np.asarray(a_out, dtype=np.int64),
                             "b": np.asarray(b_out, dtype=np.int64),
                             "hamming": np.asarray(d_out, dtype=np.int64)})

    pairs = exploded.groupby("chunk").map_groups(_verify, batch_format="pandas")
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


def simhash_dedup(ds: Dataset, id_col: str = "doc_id", **kwargs) -> Dataset:
    pairs = simhash_pairs(ds, id_col=id_col, **kwargs)
    return drop_ids(pairs, ds, id_col)
