"""HTML -> text extraction and deterministic url geocoding (pure Python/numpy).

The graft's per-row invariant (``BASELINE.json.input_hint``): the engine's
batched extractor must produce **byte-identical** text per url versus the
straight-line reference implementation.  Both paths call the single pure
function :func:`extract_text` (compiled regexes at module import, no
locale/ambient dependence); the pytest invariant compares them row by row.

The geocoder maps a url deterministically to (lat, lon) via md5 so a DuckDB
oracle can reproduce it bit-for-bit:

    lat = int(md5(url)[0:8],  16) / 2^32 * 180 - 90
    lon = int(md5(url)[8:16], 16) / 2^32 * 360 - 180

(the reference corpus is "geocoded by url" per the north rule; the reference
repo itself consumes pre-geocoded cell ids, ``Supplemental_Data_1.R:112``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

__all__ = [
    "extract_text",
    "extract_text_batch",
    "geocode_urls",
    "build_page_html",
]

# --- extraction ------------------------------------------------------------
# One honest, small, deterministic HTML->text pipeline:
#   1. drop <script>/<style>/<!-- --> blocks entirely
#   2. block-level close tags become newlines (paragraph structure)
#   3. every remaining tag becomes a single space
#   4. decode the common named/numeric entities
#   5. collapse horizontal whitespace, trim line edges, collapse blank lines

_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_BLOCK_CLOSE_RE = re.compile(
    r"</(?:p|div|h[1-6]|li|ul|ol|table|tr|section|article|header|footer|blockquote)\s*>|<br\s*/?>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]*>")
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so "&amp;lt;" -> "&lt;" (standard single-pass order)
]
_NUM_ENTITY_RE = re.compile(r"&#(\d{1,7});")
_BLANKLINES_RE = re.compile(r"\n{2,}")
# Horizontal-whitespace collapse, byte-identical to subbing "[ \t\r\f\v]+"
# with " " but ~5x fewer matches: a lone regular space maps to itself, so
# only runs of >=2 or lone exotic whitespace need rewriting (regex sub cost
# scales with MATCH count; prose is mostly single spaces).
_HSPACE_RE = re.compile(r"[ \t\r\f\v]{2,}|[\t\r\f\v]")


def extract_text(html: bytes | str) -> str:
    """Extract visible text from an HTML document.  Pure + deterministic."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_CLOSE_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _NUM_ENTITY_RE.sub(lambda m: chr(int(m.group(1))) if int(m.group(1)) < 0x110000 else "", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _HSPACE_RE.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    s = "\n".join(lines)
    s = _BLANKLINES_RE.sub("\n", s)
    return s.strip()


def extract_text_batch(htmls) -> list[str]:
    """Batch extraction — the loop is over *strings in one Arrow batch*
    (string-shaped work has no pyarrow kernel; regexes are compiled once at
    import, so per-actor setup cost is zero)."""
    return [extract_text(h) for h in htmls]


# --- geocoding -------------------------------------------------------------

_U32 = 4294967296.0  # 2^32


def geocode_urls(urls) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic url -> (lat, lon), md5-based (see module docstring).

    DuckDB oracle equivalent:
      ``('0x' || substr(md5(url), 1, 8))::UBIGINT / 4294967296.0 * 180.0 - 90.0``
    """
    n = len(urls)
    h1 = np.empty(n, dtype=np.float64)
    h2 = np.empty(n, dtype=np.float64)
    for i, u in enumerate(urls):
        d = hashlib.md5(u.encode("utf-8")).hexdigest()
        h1[i] = int(d[0:8], 16)
        h2[i] = int(d[8:16], 16)
    lat = h1 / _U32 * 180.0 - 90.0
    lon = h2 / _U32 * 360.0 - 180.0
    return lat, lon


# --- synthetic page HTML ---------------------------------------------------

_PAGE_TEMPLATE = (
    "<html><head><title>{title}</title>"
    "<style>body {{ font: 12px serif; }}</style>"
    '<script type="text/javascript">var tracked = "{url}"; track(tracked);</script>'
    "</head><body>\n"
    "<header><h1>{title}</h1></header>\n"
    "<!-- generated page -->\n"
    "<div><p>{body}</p></div>\n"
    "<ul><li>lang: {lang}</li><li>source &amp; id: {page_id}</li></ul>\n"
    "<footer>&copy; synthetic corpus &#8212; {host}</footer>\n"
    "</body></html>"
)


def build_page_html(url: str, title: str, body: str, lang: str, page_id: int, host: str) -> bytes:
    """Deterministic page template used by the synthetic corpus generator.

    The pages table's ``text`` column is *defined* as ``extract_text`` of this
    html, so the extraction invariant is a true round-trip check.
    """
    return _PAGE_TEMPLATE.format(
        title=title, url=url, body=body, lang=lang, page_id=page_id, host=host
    ).encode("utf-8")
