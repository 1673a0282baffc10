"""Grouped output shapes — the reference CLI's JSON writers (S6/S7).

Reference shapes (example.py):

* hierarchical (example.py:204-240, 349-382): ``{text: [detail, ...]}``
  insertion-ordered by first occurrence; detail = {rect, font,
  encoded_bytes, instance_index}.
* array+index (example.py:122-202, 280-347): ``[{text, count,
  details: [{..., index}]}]`` where ``index`` is the detail's position
  in the PRE-group span order (a per-document running counter).

Both are per-document groupings (SURVEY.md §2.5 G1/G2): a row-local
transform, no shuffle.  The grouped form is emitted as a JSON string
column so it round-trips through Parquet and feeds ``write_json`` sinks.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa
import ray.data


def _detail(span: dict[str, Any]) -> dict[str, Any]:
    rect = None
    if span.get("x0") is not None:
        rect = {"x0": span["x0"], "y0": span["y0"], "x1": span["x1"], "y1": span["y1"]}
    return {
        "rect": rect,
        "font": span.get("font"),
        "encoded_bytes": span.get("encoded_hex"),
        "instance_index": span.get("instance_index", 0),
        "page": span.get("page", 0),
    }


def group_spans_hierarchical(spans: list[dict[str, Any]]) -> dict[str, list]:
    """{text: [details...]}, insertion-ordered (example.py:349-362)."""
    grouped: dict[str, list] = {}
    for span in spans or []:
        grouped.setdefault(span["text"], []).append(_detail(span))
    return grouped


def group_spans_array(spans: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """[{text, count, details:[{..., index}]}] with the pre-group global
    index (example.py:280-329)."""
    grouped: dict[str, dict[str, Any]] = {}
    for global_index, span in enumerate(spans or []):
        entry = grouped.setdefault(span["text"], {"text": span["text"], "details": []})
        d = _detail(span)
        d["index"] = global_index
        entry["details"].append(d)
    out = list(grouped.values())
    for entry in out:
        entry["count"] = len(entry["details"])
    return out


def grouped_json_column(
    extracted: ray.data.Dataset, array_format: bool = False
) -> ray.data.Dataset:
    """Append a ``grouped_json`` string column to extraction output."""

    def add_grouped(batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans").to_pylist()
        out = []
        for spans in spans_col:
            grouped = (
                group_spans_array(spans) if array_format
                else group_spans_hierarchical(spans)
            )
            out.append(json.dumps(grouped, ensure_ascii=False, sort_keys=False))
        return batch.append_column("grouped_json", pa.array(out, pa.string()))

    return extracted.map_batches(add_grouped, batch_format="pyarrow")


def font_report(corpus: ray.data.Dataset) -> ray.data.Dataset:
    """Font analysis table — the reference's ``analyze_font_mappings``
    report (analysis.py:143-179) as data: one row per (url, font, code).

    Output: url, font, code:int32, char:string, codepoint:string
    ('U+XXXX'), sorted per font by code like the reference's report
    (analysis.py:169 sorted iteration).
    """
    from pdf_parser_ray.extract import page_font_cmaps, sniff_kind
    from pdf_parser_ray.minipdf.document import PdfDocument, PdfError

    def per_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        cache: dict = {}
        rows = {"url": [], "font": [], "code": [], "char": [], "codepoint": []}
        for url, payload in zip(urls, payloads):
            payload = payload or b""
            if sniff_kind(payload) != "pdf":
                continue
            try:
                doc = PdfDocument(payload)
            except PdfError:
                continue
            seen: dict[str, dict] = {}
            for page in doc.pages:
                try:
                    for font, cmap in page_font_cmaps(doc, page, cache).items():
                        seen.setdefault(font, {}).update(cmap)
                except Exception:
                    continue
            for font in sorted(seen):
                for code_bytes, char in sorted(seen[font].items()):
                    rows["url"].append(url)
                    rows["font"].append(font)
                    rows["code"].append(code_bytes[0])
                    rows["char"].append(char)
                    rows["codepoint"].append(f"U+{ord(char):04X}")
        return pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "font": pa.array(rows["font"], pa.string()),
                "code": pa.array(rows["code"], pa.int32()),
                "char": pa.array(rows["char"], pa.string()),
                "codepoint": pa.array(rows["codepoint"], pa.string()),
            }
        )

    return corpus.map_batches(per_batch, batch_format="pyarrow")
