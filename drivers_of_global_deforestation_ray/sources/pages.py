"""Deterministic Common-Crawl-style pages corpus generator.

Schema is exactly ``BASELINE.json.input_hint``:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.
The ``text`` column is *defined* as ``extract_text(html)`` so the extraction
invariant is a round-trip check.  Every row is a pure function of
``(seed, row_index)`` — generation is independent of batch boundaries and
parallelism, which the determinism test relies on.

Corpus features baked in (all index-triggered, deterministic):

- exact duplicates  (``i % 13 == 0``: body copied from row ``i-1``),
- near duplicates   (``i % 11 == 0``: body of ``i-1`` with one word swapped),
- re-crawls         (``hot_frac > 0``: that fraction of rows share ONE url,
  differing only in ``warc_ts`` — the realistic source of hot-tile skew, since
  geocoding is a pure function of url),
- multilingual bodies seeded with per-language marker words (for language-ID).

Large-scale generation runs through Ray (``range -> map_batches ->
write_parquet``); small fixtures come from :func:`pages_table` driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.extract import build_page_html, extract_text
from ..functions.hashing import stable_hash64

__all__ = ["pages_table", "generate_pages_parquet", "PAGES_SCHEMA"]

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_HOSTS = [
    "news.example.org", "blog.example.net", "shop.example.com", "wiki.example.io",
    "forum.example.co", "docs.example.dev", "media.example.tv", "data.example.ai",
]

_WORDS = {
    "en": ("the quick brown fox jumps over a lazy dog and runs through the green forest "
           "while rain falls on old stone paths near quiet rivers that flow to the sea").split(),
    "es": ("el rapido zorro salta sobre un perro y corre por el bosque verde mientras la "
           "lluvia cae en los caminos de piedra cerca de rios que fluyen hacia el mar").split(),
    "fr": ("le renard rapide saute sur un chien et court dans la foret verte pendant que la "
           "pluie tombe sur les chemins de pierre pres des rivieres qui coulent vers la mer").split(),
    "de": ("der schnelle fuchs springt uber einen hund und lauft durch den grunen wald wahrend "
           "der regen auf alte steinwege fallt die zu ruhigen flussen fuhren und im meer enden").split(),
    "pt": ("a raposa rapida salta sobre um cao e corre pela floresta verde enquanto a chuva "
           "cai nos caminhos de pedra perto dos rios que fluem para o mar").split(),
}
_LANGS = list(_WORDS)
_LANG_WEIGHTS = np.array([0.6, 0.12, 0.1, 0.1, 0.08])

_EPOCH_2024_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _row_rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(stable_hash64(f"pages:{seed}:{i}") & 0x7FFFFFFFFFFFFFFF)


def _body_and_lang(seed: int, i: int) -> tuple[str, str]:
    if i > 0 and i % 13 == 0:  # exact duplicate of previous row's body
        return _body_and_lang(seed, i - 1)
    if i > 0 and i % 11 == 0:  # near duplicate: one word swapped
        body, lang = _body_and_lang(seed, i - 1)
        words = body.split()
        rng = _row_rng(seed, i)
        words[int(rng.integers(0, len(words)))] = "altered"
        return " ".join(words), lang
    rng = _row_rng(seed, i)
    lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_WEIGHTS))]
    pool = _WORDS[lang]
    n_words = int(rng.integers(20, 80))
    body = " ".join(pool[j] for j in rng.integers(0, len(pool), size=n_words))
    return body, lang


def _make_row(seed: int, i: int, n: int, hot_frac: float) -> tuple:
    body, lang = _body_and_lang(seed, i)
    rng = _row_rng(seed, i)
    host = _HOSTS[int(rng.integers(0, len(_HOSTS)))]
    title_words = body.split()[:3]
    title = " ".join(title_words) if title_words else "untitled"
    if hot_frac > 0 and i < int(n * hot_frac):
        url = "https://hot.example.com/popular/0"  # re-crawled page -> one tile
    else:
        url = f"https://{host}/{lang}/{'-'.join(title_words[:2]) or 'p'}/{i}"
    ts = _EPOCH_2024_US + int(stable_hash64(f"ts:{seed}:{i}") % (365 * 86_400_000_000))
    html = build_page_html(url, title, body, lang, i, host)
    return url, ts, html, extract_text(html), lang


def pages_table(n: int, seed: int = 42, hot_frac: float = 0.0, offset: int = 0, total: int | None = None) -> pa.Table:
    """Rows [offset, offset+n) of the corpus as one Arrow table."""
    total = total if total is not None else n
    rows = [_make_row(seed, i, total, hot_frac) for i in range(offset, offset + n)]
    urls, tss, htmls, texts, langs = zip(*rows) if rows else ((),) * 5
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(np.asarray(tss, dtype="datetime64[us]") if rows else [], pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def generate_pages_parquet(
    out_dir: str, n: int, seed: int = 42, hot_frac: float = 0.0, num_blocks: int | None = None
) -> str:
    """Generate the corpus distributed (Ray range -> map_batches ->
    write_parquet).  Idempotent per (out_dir): skips if a ``_SUCCESS`` marker
    exists.  Caller owns the Ray session."""
    import os

    import ray.data as rd

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    num_blocks = num_blocks or max(4, n // 50_000)

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        rows = [_make_row(seed, int(i), n, hot_frac) for i in ids]
        urls, tss, htmls, texts, langs = zip(*rows)
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(np.asarray(tss, dtype="datetime64[us]"), pa.timestamp("us")),
                pa.array(htmls, pa.binary()),
                pa.array(texts, pa.string()),
                pa.array(langs, pa.string()),
            ],
            schema=PAGES_SCHEMA,
        )

    (
        rd.range(n, override_num_blocks=num_blocks)
        .map_batches(_gen, batch_format="pyarrow",
                     # batch <= block: a batch_size above the block size
                     # would coalesce small blocks and the writer would
                     # emit ONE file; shard-level resume tests (and honest
                     # multi-file reads) need a multi-file layout.  Capped
                     # at 8192 rows to bound per-task html payload memory.
                     batch_size=min(8192, max(1, -(-n // num_blocks))))
        .write_parquet(out_dir, min_rows_per_file=1)
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
