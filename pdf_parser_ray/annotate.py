"""Annotated-PDF writer — the reference's mark-unsupported-characters
tool (S11, pdf_gui.py:1523-1648) as a corpus stage.

For every PDF row, finds extracted spans whose text contains characters
the rendering font never uses anywhere in the document (the same
char-inventory test the replace pipeline applies, replacer.py:546-560),
and draws a red ``/Square`` annotation over each such span's rect.  The
reference saves incrementally; minipdf re-serializes the whole document
(same visible result, simpler invariant).

Output per row: url, html (annotated or original), n_flagged:int32.
"""

from __future__ import annotations

import pyarrow as pa

from pdf_parser_ray.extract import extract_pdf, sniff_kind
from pdf_parser_ray.minipdf.document import PdfDocument, PdfError
from pdf_parser_ray.minipdf.objects import PdfName, PdfRef
from pdf_parser_ray.minipdf.serialize import serialize_document
from pdf_parser_ray.replace import build_char_inventory


def annotate_unsupported(payload: bytes, check_text: str,
                         cmap_cache: dict | None = None) -> tuple[bytes, int]:
    """Flag spans that could not render ``check_text``'s characters.

    A span is flagged when its font's document-wide char inventory lacks
    any non-whitespace character of ``check_text`` (the char-support
    check of replacer.py:546-560 / pdf_gui.py:1227-1307 applied per
    span-font).  Returns (annotated_payload, n_flagged); the original
    payload comes back unchanged when nothing is flagged.
    """
    try:
        doc = PdfDocument(payload)
    except PdfError:
        return payload, 0
    inventory = build_char_inventory(doc, cmap_cache)
    res = extract_pdf(payload, None, cmap_cache)
    if res["status"] != "ok":
        return payload, 0

    needed = [c for c in check_text if c not in " \t\n\r"]
    flagged: dict[int, list[tuple[float, float, float, float]]] = {}
    for span in res["spans"]:
        font = span.get("font")
        rect = span.get("rect")
        if font is None or rect is None:
            continue
        chars = inventory.get(font, {})
        if any(c not in chars for c in needed):
            flagged.setdefault(span["page"], []).append(tuple(rect))
    if not flagged:
        return payload, 0

    n = 0
    next_num = (max(doc.objects) if doc.objects else 0) + 1
    for page_idx, rects in flagged.items():
        page = doc.pages[page_idx]
        # doc.get resolves an indirect /Annots reference — a plain
        # page.get would see a PdfRef, fail isinstance(list) and silently
        # replace (drop) the document's existing annotations.
        annots = doc.get(page, "/Annots")
        if not isinstance(annots, list):
            annots = []
        for rect in rects:
            annot = {
                "/Type": PdfName("/Annot"),
                "/Subtype": PdfName("/Square"),
                "/Rect": [rect[0], rect[1], rect[2], rect[3]],
                "/C": [1, 0, 0],
                "/CA": 0.3,
            }
            doc.objects[next_num] = annot
            annots.append(PdfRef(next_num, 0))
            next_num += 1
            n += 1
        page["/Annots"] = annots
    try:
        return serialize_document(doc), n
    except Exception:
        return payload, 0


class AnnotateUnsupported:
    """Actor stage: corpus rows → annotated PDFs + flag counts."""

    def __init__(self, check_text: str):
        self.check_text = check_text
        self.cmap_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        out_payload, out_n = [], []
        for payload in payloads:
            payload = payload or b""
            if sniff_kind(payload) != "pdf":
                out_payload.append(payload)
                out_n.append(0)
                continue
            annotated, n = annotate_unsupported(payload, self.check_text, self.cmap_cache)
            out_payload.append(annotated)
            out_n.append(n)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(out_payload, pa.binary()),
                "n_flagged": pa.array(out_n, pa.int32()),
            }
        )


def annotate_corpus(ds, check_text: str, *,
                    concurrency: int | tuple[int, int] = (1, 8),
                    batch_size: int = 32):
    return ds.map_batches(
        AnnotateUnsupported,
        fn_constructor_kwargs={"check_text": check_text},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
