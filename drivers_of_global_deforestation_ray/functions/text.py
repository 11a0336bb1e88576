"""Text analytics kernels: token stats, quality, language-ID, fingerprints.

These power the training-data-pipeline operators over the ``documents`` table
(token counting, quality scoring, language identification, document
fingerprinting).  Everything is deterministic and either vectorized (pandas
``.str`` / numpy) or a per-batch loop over strings with regexes compiled at
import time.  Where a DuckDB oracle exists, the semantics are written to match
it exactly (see docstrings).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

__all__ = [
    "token_counts",
    "char_counts_nospace",
    "quality_stats",
    "langid_batch",
    "md5_fingerprints",
    "rolling_fingerprints",
    "char_entropy",
    "compress_ratio",
]

_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[.,;:!?]")
_WORD_RE = re.compile(r"[a-zA-Z']+")


def token_counts(texts: pd.Series) -> np.ndarray:
    """Whitespace-token count.  Oracle: ``array_length(regexp_extract_all(text, '\\S+'))``."""
    return texts.str.count(r"\S+").to_numpy(dtype=np.int64)


def char_counts_nospace(texts: pd.Series) -> np.ndarray:
    """Non-whitespace char count.  Oracle: ``length(regexp_replace(text, '\\s', '', 'g'))``.

    Computed as ``len - count(\\s)``: regex count cost scales with MATCH
    count, and whitespace is ~7x rarer than non-whitespace in prose —
    measured 8us vs 18us per 700-char page, same exact value."""
    return (texts.str.len().to_numpy(dtype=np.int64)
            - texts.str.count(r"\s").to_numpy(dtype=np.int64))


# A tiny fixed stopword list — part of the engine contract, not tunable.
_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as at by it "
    "this that from not have has had but they you he she we i".split()
)
# Vectorized equivalent of "count \S+ tokens that equal a stopword": the
# lookarounds pin matches to whole whitespace-delimited tokens, so this counts
# exactly what `w in _STOPWORDS for w in _TOKEN_RE.findall(t)` counts.
_STOPWORD_RE = re.compile(
    r"(?:(?<=\s)|^)(?:" + "|".join(sorted(_STOPWORDS, key=len, reverse=True)) + r")(?=\s|$)"
)


def quality_stats(texts: pd.Series) -> dict[str, np.ndarray]:
    """Heuristic document-quality features (C4/Gopher-style length & symbol
    rules, computed vectorized):

    - ``n_tokens``, ``n_chars_nospace`` (exact ints, SQL-oracle-checkable)
    - ``mean_token_len`` = n_chars_nospace / n_tokens (IEEE double division,
      deterministic given the two exact ints)
    - ``punct_ratio`` = punct chars / n_chars_nospace
    - ``stop_ratio``  = stopword tokens / n_tokens
    - ``quality_score`` in [0,1]: penalty-free doc -> 1.0
    """
    n_tok = token_counts(texts)
    n_chr = char_counts_nospace(texts)
    n_punct = texts.str.count(_PUNCT_RE.pattern).to_numpy(dtype=np.int64)
    stop_hits = texts.str.lower().str.count(_STOPWORD_RE).to_numpy(dtype=np.int64)
    tok_safe = np.maximum(n_tok, 1)
    chr_safe = np.maximum(n_chr, 1)
    mean_len = n_chr / tok_safe
    punct_ratio = n_punct / chr_safe
    stop_ratio = stop_hits / tok_safe
    score = np.ones(len(texts))
    score -= 0.25 * (n_tok < 5)          # too short
    score -= 0.25 * (mean_len > 12.0)    # likely gibberish/URLs
    score -= 0.25 * (punct_ratio > 0.2)  # symbol-heavy
    score -= 0.25 * (stop_ratio < 0.01)  # no function words at all
    return {
        "n_tokens": n_tok,
        "n_chars_nospace": n_chr,
        "mean_token_len": mean_len,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "quality_score": np.maximum(score, 0.0),
    }


# Language-ID: tiny per-language marker-word + character profiles.  This is a
# deterministic n-gram/stopword heuristic (fastText-style but hand-rolled);
# profiles are a fixed engine constant.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to is in that it for with you this have are not".split()),
    "es": frozenset("el la de que y en los del las por un una para con es no se".split()),
    "fr": frozenset("le la de et les des en un une du que pour dans est qui ne".split()),
    "de": frozenset("der die das und ist von den nicht mit ein eine auf sich im".split()),
    "pt": frozenset("o a de que e do da em um uma para com os nao por mais".split()),
}


def langid_batch(texts) -> list[str]:
    """Predict a language code per text by marker-word voting; CJK by codepoint
    ranges; ``und`` when nothing matches."""
    out = []
    for t in texts:
        t = t or ""
        cjk = sum(1 for ch in t[:400] if "一" <= ch <= "鿿")
        kana = sum(1 for ch in t[:400] if "぀" <= ch <= "ヿ")
        hangul = sum(1 for ch in t[:400] if "가" <= ch <= "힯")
        if kana >= 2:
            out.append("ja")
            continue
        if hangul >= 2:
            out.append("ko")
            continue
        if cjk >= 2:
            out.append("zh")
            continue
        words = _WORD_RE.findall(t.lower())
        if not words:
            out.append("und")
            continue
        wset = words[:200]
        best_lang, best_hits = "und", 0
        for lang, markers in _LANG_MARKERS.items():  # dict order fixed -> deterministic ties
            hits = sum(1 for w in wset if w in markers)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        out.append(best_lang)
    return out


def md5_fingerprints(texts) -> list[str]:
    """Exact-dup fingerprint.  Oracle: ``md5(text)``."""
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


_ROLL_BASE = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


def rolling_fingerprints(texts) -> np.ndarray:
    """64-bit polynomial rolling hash over utf-8 bytes,
    ``h = sum(byte[i] * B^(n-1-i)) mod 2^64`` — the Karp-Rabin form a streaming
    reader can maintain incrementally (``h = h*B + byte``).  Vectorized per
    document with numpy wraparound uint64 arithmetic (no per-byte Python loop).
    Not SQL-expressible -> rows-only oracle."""
    out = np.empty(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            raw = (t or "").encode("utf-8")
            if not raw:
                out[i] = _FNV_OFFSET
                continue
            b = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
            # powers[j] = B^j mod 2^64; highest power multiplies the first byte
            powers = np.full(len(b), _ROLL_BASE, dtype=np.uint64)
            powers[0] = np.uint64(1)
            powers = np.cumprod(powers)[::-1]
            out[i] = np.sum(b * powers, dtype=np.uint64) + _FNV_OFFSET
    return out


def char_entropy(texts) -> "tuple[np.ndarray, np.ndarray]":
    """Per-document Shannon entropy over characters (codepoints) — the
    Gopher-family gibberish/boilerplate signal: low entropy flags repeated
    filler, high entropy flags encoded noise.  Returns
    ``(n_chars int64, entropy float64 rounded to 6)``.

    Vectorized across the whole batch: one utf-32 buffer for all docs, one
    ``np.unique`` over packed (doc, codepoint) keys (codepoints < 2^21 by
    Unicode), one scatter-add of ``p * log2(p)`` — no per-document Counter
    loop.  Rounding to 6 decimals absorbs the float summation-order noise
    (~1e-14 for realistic alphabets) so the value is comparable with a SQL
    GROUP BY twin; ``+ 0.0`` normalizes the ``-0.0`` single-character case
    on both sides.  Empty documents score (0, 0.0)."""
    texts = ["" if t is None else str(t) for t in texts]
    n = len(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    ent = np.zeros(n, dtype=np.float64)
    if lens.sum():
        buf = np.frombuffer("".join(texts).encode("utf-32-le"),
                            dtype=np.uint32).astype(np.int64)
        idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        uniq, cnt = np.unique((idx << 21) | buf, return_counts=True)
        d = uniq >> 21
        p = cnt / lens[d].astype(np.float64)
        np.add.at(ent, d, p * np.log2(p))
    ent = np.round(-ent, 6) + 0.0
    ent[lens == 0] = 0.0
    return lens, ent


def compress_ratio(texts, level: int = 6) -> "tuple[np.ndarray, np.ndarray]":
    """Per-document zlib compression ratio — the RefinedWeb/Gopher-family
    repetition signal complementing :func:`char_entropy`: heavily repeated
    boilerplate compresses far below ~0.4, encrypted/binary noise sits near
    1.0.  Returns ``(compressed_len int64, ratio float64 rounded to 6)``;
    empty documents score (0, 0.0).

    zlib at a FIXED level is deterministic for a given input, so the
    output is stable across partitioning/resume; there is no SQL twin
    (DuckDB has no zlib) -> rows-only oracle + pytest."""
    import zlib

    n = len(texts)
    comp = np.zeros(n, dtype=np.int64)
    raw = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        b = ("" if t is None else str(t)).encode("utf-8")
        raw[i] = len(b)
        if b:
            comp[i] = len(zlib.compress(b, level))
    ratio = np.zeros(n, dtype=np.float64)
    nz = raw > 0
    ratio[nz] = np.round(comp[nz] / raw[nz], 6)
    return comp, ratio
