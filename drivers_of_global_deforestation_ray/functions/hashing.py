"""Sketching kernels for near-duplicate detection: MinHash, SimHash, shingles.

All hashes are stable across processes (blake2b-seeded, never Python's
``hash()``) so signatures computed in different Ray workers agree — a hard
requirement for LSH bucketing via a distributed groupby.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = [
    "stable_hash64",
    "hash_tokens64",
    "word_shingles",
    "MinHasher",
    "simhash64",
    "hamming64",
    "jaccard",
]

_MERSENNE61 = np.uint64((1 << 61) - 1)


def stable_hash64(s: str, seed: int = 0) -> int:
    """Deterministic 64-bit hash of a string (blake2b, process-independent)."""
    d = hashlib.blake2b(s.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(d.digest(), "little")


def hash_tokens64(tokens: list[str], seed: int = 0) -> np.ndarray:
    """Hash a token list to uint64 (one blake2b call per token)."""
    key = seed.to_bytes(8, "little")
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode("utf-8"), digest_size=8, key=key).digest(), "little")
            for t in tokens
        ),
        dtype=np.uint64,
        count=len(tokens),
    )


def word_shingles(text: str, k: int = 3) -> list[str]:
    """Word k-gram shingles (lowercased, whitespace-tokenized).  A document
    shorter than k words contributes its whole token string as one shingle."""
    words = text.lower().split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


class MinHasher:
    """MinHash signatures via universal hashing ``(a*h + b) mod p`` over the
    Mersenne prime 2^61-1, with ``num_perms`` fixed seeded permutations.

    Built once per actor (``__init__`` cost is two RNG draws); ``signature``
    is fully vectorized: perms x shingles matrix min-reduced per document.
    """

    def __init__(self, num_perms: int = 128, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.num_perms = num_perms
        self.a = rng.integers(1, int(_MERSENNE61), size=num_perms, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE61), size=num_perms, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(S,) uint64 shingle hashes -> (num_perms,) uint64 signature.

        Hash family: ``((a*h + b) mod 2^64) mod p`` — a multiply-mod family
        with explicit 64-bit wrap.  (Not strictly universal over the Mersenne
        field: the product wraps before the reduction.  That is fine here —
        MinHash needs a deterministic, well-mixing per-permutation hash, and
        candidate pairs are verified exactly downstream.  One wrap-multiply +
        one division-mod is ~4x cheaper than a full 128-bit modmul.)"""
        return self.signature_many([shingle_hashes])[0]

    def signature_many(self, shingle_hash_arrays: list[np.ndarray]) -> np.ndarray:
        """Signatures for a whole batch of documents at once -> (n_docs, P).

        One (P, S_chunk) wrap-multiply pass + ``np.minimum.reduceat`` over
        document boundaries (see :meth:`signature` for the hash family).
        Documents are processed in groups of ~4k total shingles so each
        intermediate stays L2/L3-resident — larger chunks go memory-bound.
        """
        n = len(shingle_hash_arrays)
        P = self.num_perms
        out = np.full((n, P), np.iinfo(np.uint64).max, dtype=np.uint64)
        sizes = np.array([len(a) for a in shingle_hash_arrays], dtype=np.int64)
        ne = np.nonzero(sizes > 0)[0]
        if len(ne) == 0:
            return out
        a = self.a[:, None]
        b = self.b[:, None]
        CHUNK = 4096
        start = 0
        while start < len(ne):
            stop = start
            tot = 0
            while stop < len(ne) and (tot == 0 or tot + sizes[ne[stop]] <= CHUNK):
                tot += sizes[ne[stop]]
                stop += 1
            docs = ne[start:stop]
            h = np.concatenate([shingle_hash_arrays[i] for i in docs]) % _MERSENNE61
            offsets = np.concatenate(([0], np.cumsum(sizes[docs])[:-1]))
            with np.errstate(over="ignore"):
                vals = (a * h[None, :] + b) % _MERSENNE61
            out[docs] = np.minimum.reduceat(vals, offsets, axis=1).T
            start = stop
        return out

    def band_keys(self, sig: np.ndarray, num_bands: int) -> list[str]:
        """Split a signature into ``num_bands`` bands; each band becomes a
        stable string bucket key ``"<band>:<hex>"`` usable as a groupby key."""
        rows = self.num_perms // num_bands
        keys = []
        for bi in range(num_bands):
            band = sig[bi * rows : (bi + 1) * rows]
            d = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
            keys.append(f"{bi}:{d}")
        return keys


def simhash64_batch(texts: "list[str]", seed: int = 0) -> np.ndarray:
    """(n,) uint64 SimHash per text, vectorized ACROSS the whole batch.

    One ``pd.util.hash_array`` pass hashes every token of every document
    (C-speed siphash, deterministic cross-process), one (T, 64) bit expand +
    ``np.add.reduceat`` over document offsets computes all bit votes — no
    per-document Python work beyond tokenization.  Token multiplicity counts
    (same semantics as :func:`simhash64` with unit weights).  Empty/blank
    documents hash to 0."""
    import pandas as pd

    token_lists = [(t or "").lower().split() for t in texts]
    sizes = np.array([len(t) for t in token_lists], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    ne = np.nonzero(sizes > 0)[0]
    if len(ne) == 0:
        return out
    flat = np.concatenate([np.asarray(token_lists[i], dtype=object) for i in ne])
    h = pd.util.hash_array(flat, hash_key=f"{seed % 10**16:016d}", categorize=False)
    # bytes -> unpackbits (any fixed bit order is a valid simhash basis).
    # Ones counts run per-document over small cache-resident slices: a full
    # (T, 64) int32 cumsum/reduceat is memory-bound and measured 5-30x
    # slower than this loop at 600k tokens on this box.
    hbytes = h.view(np.uint8).reshape(len(h), 8)
    offsets = np.concatenate(([0], np.cumsum(sizes[ne])[:-1]))
    ones = np.empty((len(ne), 64), dtype=np.int64)
    for j, (s, c) in enumerate(zip(offsets, sizes[ne])):
        ones[j] = np.unpackbits(hbytes[s:s + c], axis=1).sum(axis=0)
    maj = (2 * ones) > sizes[ne][:, None]  # ones > size/2  <=>  vote sum > 0
    out[ne] = np.packbits(maj, axis=1).view(np.uint64)[:, 0]
    return out


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash: weighted bit-vote over token hashes (vectorized)."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    w = np.ones(len(token_hashes), dtype=np.int64) if weights is None else weights.astype(np.int64)
    votes = ((2 * bits - 1) * w[:, None]).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays (broadcasts)."""
    x = np.bitwise_xor(a, b)
    return np.bitwise_count(x).astype(np.int64) if hasattr(np, "bitwise_count") else _popcount64(x)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    cnt = np.zeros(x.shape, dtype=np.int64)
    while x.any():
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
