"""Per-document extraction: payload routing + the reference parse pipeline.

``extract_document(url, payload, fallback_text, cmap_cache)`` is the pure
per-row function the Ray actor stage (:mod:`pdf_parser_ray.stages`) maps
over Arrow batches.  It never raises: failures become ``status`` values
(errors are data — SURVEY.md §1.2 success/log row).

Pipeline per PDF payload (reference stage map, SURVEY.md §3.1):
  1. open from in-row bytes (minipdf; reference api.py:32/43 opens files),
  2. per page: font CMaps — /ToUnicode → parse_cmap, else synthetic
     WinAnsi (api.py:46-70),
  3. content-stream assembly → latin1 str (api.py:74-87),
  4. tokenize + decode (api.py:94-131; Tm/Td tracking pdf_gui.py:779-812),
  5. instance indexing + position claiming (api.py:136-195),
  6. page-scoped nested-box filter (api.py:337-388),
  7. document text = '\n'-join of per-page '\n'-joined filtered span texts;
     offsets computed over the document text.
Zero spans in the whole document → line-based fallback over the row's
pre-extracted ``text`` column, tagged ``source='fallback_text'`` — the
renderer-less analog of the reference's ``page.get_text()`` fallback
(api.py:197-262, ``source='pymupdf_basic'``).

HTML payloads route to :func:`pdf_parser_ray.html.strip.strip_html`.
"""

from __future__ import annotations

import hashlib
from typing import Any

from pdf_parser_ray.core.cmap import Cmap, parse_cmap, winansi_cmap_text
from pdf_parser_ray.core.spans import assemble_text, build_spans, nested_box_filter
from pdf_parser_ray.core.tokenizer import tokenize_content
from pdf_parser_ray.html.strip import strip_html
from pdf_parser_ray.minipdf.document import PdfDocument, PdfError

PDF_MAGIC = b"%PDF-"


def sniff_kind(payload: bytes) -> str:
    """Route a payload: 'pdf' | 'html' | 'empty' | 'text'."""
    if payload.startswith(PDF_MAGIC):
        return "pdf"
    if not payload:
        return "empty"
    head = payload[:512].lstrip()
    low = head[:256].lower()
    if head.startswith(b"<") or b"<html" in low or b"<!doctype" in low:
        return "html"
    return "text"


def page_font_cmaps(
    doc: PdfDocument,
    page: dict,
    cmap_cache: dict[bytes, dict[bytes, str]] | None = None,
) -> dict[str, dict[bytes, str]]:
    """Resolve every page font to a CMap (api.py:46-70).

    ``cmap_cache`` maps sha1(cmap_bytes) → parsed dict; across a CC-style
    corpus the same standard-font ToUnicode streams repeat constantly, so
    the actor-held cache (A1 in SURVEY.md §2.3) turns the parse into a
    dict hit.  The cache stores PARSED results only — plain picklable
    dicts, though they never leave the actor.
    """
    font_cmaps: dict[str, dict[bytes, str]] = {}
    for name, font in doc.page_fonts(page).items():
        tu_bytes = doc.font_tounicode_bytes(font)
        if tu_bytes is not None:
            key = hashlib.sha1(tu_bytes).digest()
            if cmap_cache is not None and key in cmap_cache:
                font_cmaps[name] = cmap_cache[key]
                continue
            # utf-8 lenient decode per api.py:56.
            cmap = Cmap(parse_cmap(tu_bytes.decode("utf-8", errors="ignore")))
            if cmap_cache is not None:
                cmap_cache[key] = cmap
            font_cmaps[name] = cmap
        else:
            enc_name = doc.font_encoding_name(font)
            key = b"winansi:" + enc_name.encode("latin1")
            if cmap_cache is not None and key in cmap_cache:
                font_cmaps[name] = cmap_cache[key]
                continue
            cmap = Cmap(parse_cmap(winansi_cmap_text(enc_name)))
            if cmap_cache is not None:
                cmap_cache[key] = cmap
            font_cmaps[name] = cmap
    return font_cmaps


def _fallback_from_text(fallback_text: str | None) -> tuple[str, list[dict[str, Any]], str]:
    """Line-based fallback over the row's pre-extracted text column.

    Mirrors the reference fallback loop api.py:197-262: splitlines → strip
    → drop empties → per-line instance indexing, rect=None.
    """
    if not fallback_text:
        return "", [], "empty"
    counts: dict[str, int] = {}
    spans: list[dict[str, Any]] = []
    parts: list[str] = []
    offset = 0
    for line in fallback_text.splitlines():
        line = line.strip()
        if not line:
            continue
        idx = counts.get(line, 0)
        counts[line] = idx + 1
        spans.append(
            {
                "text": line,
                "rect": None,
                "font": None,
                "encoded_bytes": None,
                "instance_index": idx,
                "offset_start": offset,
                "offset_end": offset + len(line),
                "page": 0,
            }
        )
        parts.append(line)
        offset += len(line) + 1
    text = "\n".join(parts)
    return text, spans, ("fallback" if text else "empty")


def extract_pdf(
    payload: bytes,
    fallback_text: str | None,
    cmap_cache: dict | None = None,
) -> dict[str, Any]:
    try:
        doc = PdfDocument(payload)
    except PdfError as e:
        text, spans, _ = _fallback_from_text(fallback_text)
        return {
            "extracted_text": text,
            "spans": spans,
            "status": f"error:{e.kind}",
            "n_pages": 0,
        }
    except Exception:
        text, spans, _ = _fallback_from_text(fallback_text)
        return {"extracted_text": text, "spans": spans, "status": "error:parse", "n_pages": 0}

    page_texts: list[str] = []
    all_spans: list[dict[str, Any]] = []
    offset = 0
    for page_idx, page in enumerate(doc.pages):
        try:
            font_cmaps = page_font_cmaps(doc, page, cmap_cache)
            content = doc.page_content_bytes(page)
            if not content:
                continue
            content_str = content.decode("latin1", errors="replace")  # api.py:87
            items = tokenize_content(content_str, font_cmaps)
            spans = build_spans(items)
            filtered = nested_box_filter(spans)
            page_text, page_spans = assemble_text(filtered)
        except Exception:
            continue  # poison page: skip, keep the document (SURVEY.md §4)
        if not page_text:
            continue
        for s in page_spans:
            s["page"] = page_idx
            s["offset_start"] += offset
            s["offset_end"] += offset
        all_spans.extend(page_spans)
        page_texts.append(page_text)
        offset += len(page_text) + 1

    extracted = "\n".join(page_texts)
    if not extracted:
        text, spans, status = _fallback_from_text(fallback_text)
        return {
            "extracted_text": text,
            "spans": spans,
            "status": status,
            "n_pages": len(doc.pages),
        }
    return {
        "extracted_text": extracted,
        "spans": all_spans,
        "status": "ok",
        "n_pages": len(doc.pages),
    }


def extract_document(
    url: str,
    payload: bytes | None,
    fallback_text: str | None = None,
    cmap_cache: dict | None = None,
) -> dict[str, Any]:
    """Route + extract one document.  Never raises.

    Returns a flat record: url, kind, status, n_pages, n_spans,
    extracted_text, spans (list of span dicts; rect flattened to
    x0..y1 nullable floats; encoded_bytes as hex string like the
    reference's output record api.py:193).
    """
    payload = payload or b""
    kind = sniff_kind(payload)

    if kind == "pdf":
        res = extract_pdf(payload, fallback_text, cmap_cache)
        n_pages = res.pop("n_pages", 0)
    elif kind == "html":
        res = strip_html(payload)
        n_pages = 1
        if not res["extracted_text"] and fallback_text:
            text, spans, status = _fallback_from_text(fallback_text)
            res = {"extracted_text": text, "spans": spans, "status": status}
    elif kind == "text":
        # Plain-text payload: the payload itself is the text.
        text, spans, status = _fallback_from_text(payload.decode("utf-8", errors="replace"))
        res = {
            "extracted_text": text,
            "spans": spans,
            "status": "ok" if text else "empty",
        }
        n_pages = 1
    else:  # empty payload
        text, spans, status = _fallback_from_text(fallback_text)
        res = {"extracted_text": text, "spans": spans, "status": status}
        n_pages = 0

    out_spans = []
    for s in res["spans"]:
        rect = s.get("rect")
        eb = s.get("encoded_bytes")
        out_spans.append(
            {
                "page": int(s.get("page", 0)),
                "text": s["text"],
                "x0": rect[0] if rect else None,
                "y0": rect[1] if rect else None,
                "x1": rect[2] if rect else None,
                "y1": rect[3] if rect else None,
                "font": s.get("font"),
                "encoded_hex": eb.hex() if isinstance(eb, (bytes, bytearray)) else None,
                "instance_index": int(s.get("instance_index", 0)),
                "offset_start": int(s.get("offset_start", 0)),
                "offset_end": int(s.get("offset_end", 0)),
            }
        )

    return {
        "url": url,
        "kind": kind,
        "status": res["status"],
        "n_pages": n_pages,
        "n_spans": len(out_spans),
        "extracted_text": res["extracted_text"],
        "spans": out_spans,
    }
