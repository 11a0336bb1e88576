"""Minimal from-scratch PDF text-report sink (SURVEY.md S7 de-stub).

The reference renders its 35 fitted decision trees to a PDF
(``pdf(...); plot(fit); text(fit)``, ``Supplemental_Data_1.R:287,316-318,345``).
This sandbox has no plotting stack, but the PDF FORMAT is public (ISO
32000); a text-mode report — the tree dumps ``state/cart.py`` already
produces, one page per tree — needs only five objects: catalog, page tree,
page, an uncompressed text content stream, and the built-in Helvetica/
Courier fonts.  Output opens in any PDF viewer.
"""

from __future__ import annotations

import os

__all__ = ["write_text_pdf"]


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_text_pdf(path: str, pages: "list[tuple[str, list[str]]]",
                   font_size: int = 9, leading: int = 11) -> None:
    """Write a multi-page text PDF: ``pages`` = [(title, lines), ...].
    One content stream per page (Courier body, Helvetica-Bold title),
    US-Letter, 612x792 pt, margins 36 pt; long pages continue past the
    bottom margin rather than reflowing (report sink, not a typesetter)."""
    objs: "list[bytes]" = []  # 1-indexed

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font_body = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    font_title = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")

    page_ids: list[int] = []
    content_ids: list[int] = []
    for title, lines in pages:
        parts = [f"BT /F2 {font_size + 3} Tf 36 756 Td ({_esc(title)}) Tj ET"]
        y = 756 - 2 * leading
        body = [f"BT /F1 {font_size} Tf 36 {y} Td {leading} TL"]
        for ln in lines:
            body.append(f"({_esc(ln)}) Tj T*")
        body.append("ET")
        stream = ("\n".join(parts + body)).encode("latin-1", "replace")
        content_ids.append(add(
            b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
            + stream + b"\nendstream"))
        page_ids.append(0)  # placeholder; filled after pages obj id is known

    pages_id = len(objs) + len(pages) + 1  # page objs come next, then the tree
    for i, cid in enumerate(content_ids):
        page_ids[i] = add(
            (f"<< /Type /Page /Parent {pages_id} 0 R /MediaBox [0 0 612 792] "
             f"/Contents {cid} 0 R /Resources << /Font "
             f"<< /F1 {font_body} 0 R /F2 {font_title} 0 R >> >> >>").encode())
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    real_pages_id = add(
        (f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>").encode())
    assert real_pages_id == pages_id
    catalog_id = add((f"<< /Type /Catalog /Pages {pages_id} 0 R >>").encode())

    out = [b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"]
    offsets = [0]
    pos = sum(len(b) for b in out)
    for i, body in enumerate(objs, start=1):
        offsets.append(pos)
        chunk = f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        out.append(chunk)
        pos += len(chunk)
    xref_pos = pos
    xref = [f"xref\n0 {len(objs) + 1}\n".encode(), b"0000000000 65535 f \n"]
    for off in offsets[1:]:
        xref.append(f"{off:010d} 00000 n \n".encode())
    out.extend(xref)
    out.append((f"trailer\n<< /Size {len(objs) + 1} /Root {catalog_id} 0 R >>\n"
                f"startxref\n{xref_pos}\n%%EOF\n").encode())
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        for b in out:
            f.write(b)
    os.replace(tmp, path)
