"""Levenshtein edit distance — the fuzzy-string kernel (pure python/numpy).

Used for fuzzy matching / dedup QA (how far apart are two near-duplicate
titles?).  Two execution shapes, picked per pair:

- short strings (the common case: titles, hosts, names): classic two-row DP
  in plain Python — for n,m < ~64 the list version beats numpy (array-op
  overhead exceeds the O(nm) work);
- long strings: the same DP with the inner row vectorized in numpy
  (np.minimum chains over the whole row; the carry dependency is resolved
  by the standard prefix trick being unnecessary here — we keep the scalar
  carry loop only for the substitution diagonal, still O(n) numpy calls).

Semantics match DuckDB/PostgreSQL ``levenshtein`` (unit costs).
"""

from __future__ import annotations

import numpy as np

__all__ = ["levenshtein", "levenshtein_batch"]


def _lev_py(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, start=1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def _lev_np(a: str, b: str) -> int:
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(bb) + 1, dtype=np.int64)
    for i, ca in enumerate(a, start=1):
        sub = prev[:-1] + (bb != ord(ca))
        ins = prev[1:] + 1
        cand = np.minimum(sub, ins)
        cur = np.empty(len(bb) + 1, dtype=np.int64)
        cur[0] = i
        # deletion carries left-to-right (cur[j] = min(cand[j], cur[j-1]+1)):
        # unrolled, cur[j] = min_t<=j (cand[t] + (j-t)), plus the cur[0]+j
        # chain — both resolved with one cumulative min of (cand[t] - t)
        run = np.minimum.accumulate(cand - np.arange(len(bb)))
        j = np.arange(len(bb))
        cur[1:] = np.minimum(run + j, i + 1 + j)
        prev = cur
    return int(prev[-1])


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance (DuckDB ``levenshtein`` parity)."""
    if len(a) < 64 and len(b) < 64:
        return _lev_py(a, b)
    return _lev_np(a, b)


def levenshtein_batch(pairs_a: "list[str]", pairs_b: "list[str]") -> np.ndarray:
    return np.asarray([levenshtein(x or "", y or "")
                       for x, y in zip(pairs_a, pairs_b)], dtype=np.int64)
