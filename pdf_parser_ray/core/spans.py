"""Span assembly: instance indexing, position claiming, nested-box filter.

Semantics pinned (file:line into /root/reference/):

* Instance indexing — api.py:136-149: per page, a running count per
  identical decoded text in stream order becomes ``instance_index``.
* Position estimation — pdf_gui.py:841-875: with no renderer available the
  reference estimates rects from the tracked Tm/Td position with a fixed
  12pt font, 8pt char width, 1.2 line-height:
  ``rect = (x, y, x + 8*len(text), y + 14.4)``; positions at (0,0) are
  ghost-filtered (pdf_gui.py:867-869).  This deterministic estimator is
  our rect contract (PyMuPDF's renderer-derived ``search_for`` rects are
  out of scope in this build — see SURVEY.md §7 "two-library dependency").
* Forward-only claiming — api.py:151-186: for the k-th stream instance of
  a text, the candidate rect list is scanned in order and the first rect
  whose rounded-int position-hash is unclaimed wins; if every candidate is
  claimed the FIRST candidate is reused; no candidates → ``rect=None``
  (api.py:191 ``rect_dict``-unset case → None, SURVEY.md §2.11).
* Nested-box filter — api.py:337-388: rect area computed (0 when no
  rect); spans sorted area-DESC (Python stable sort → stream order within
  equal areas); a span fully contained in an earlier (larger) rect is
  dropped; rect-less spans always kept; OUTPUT ORDER IS THE AREA-DESC
  ORDER, not stream order (api.py:352-388 — pinned by fixtures).
* ``extracted_text`` — the ordered concatenation ('\\n'-joined) of the
  filtered span texts, with per-span [offset_start, offset_end) computed
  on it.  This is the byte-identical-per-url contract column.
"""

from __future__ import annotations

from typing import Any

from pdf_parser_ray.core.tokenizer import TextShow

CHAR_WIDTH = 8.0      # pdf_gui.py:849
FONT_SIZE = 12.0      # pdf_gui.py:848
LINE_HEIGHT = FONT_SIZE * 1.2  # pdf_gui.py:854


def estimate_rect(item: TextShow) -> tuple[float, float, float, float] | None:
    """Deterministic rect estimate (pdf_gui.py:845-869); (0,0) → ghost None."""
    x0, y0 = item.x, item.y
    if x0 == 0 and y0 == 0:
        return None
    return (x0, y0, x0 + CHAR_WIDTH * len(item.text), y0 + LINE_HEIGHT)


def build_spans(items: list[TextShow]) -> list[dict[str, Any]]:
    """Instance indexing + forward-only position claiming (api.py:134-195).

    The reference asks the renderer for every on-page rect of a text
    (``page.search_for``); our candidate list is the estimated rects of
    every stream occurrence of that exact text, in stream order — the
    deterministic analog.  Claiming semantics are identical: first
    unclaimed candidate by rounded-int position hash, else reuse
    candidate[0], else ``rect=None``.
    """
    # Candidate rects per text, in stream order (ghosts excluded), computed
    # once up front like the reference's one search_for call per text.
    candidates: dict[str, list[tuple[float, float, float, float]]] = {}
    for item in items:
        rect = estimate_rect(item)
        if rect is not None:
            candidates.setdefault(item.text, []).append(rect)

    text_instance_counts: dict[str, int] = {}
    processed_positions: dict[str, set[tuple[int, int, int, int]]] = {}
    spans: list[dict[str, Any]] = []

    for item in items:
        text_str = item.text
        if not text_str:
            continue
        if text_str not in text_instance_counts:
            text_instance_counts[text_str] = 0
            processed_positions[text_str] = set()
        current_instance_index = text_instance_counts[text_str]
        text_instance_counts[text_str] += 1

        text_instances = candidates.get(text_str, [])
        rect: tuple[float, float, float, float] | None = None

        available = []
        for instance in text_instances:
            pos_hash = (
                round(instance[0]),
                round(instance[1]),
                round(instance[2]),
                round(instance[3]),
            )
            if pos_hash not in processed_positions[text_str]:
                available.append((instance, pos_hash))

        if available:
            rect, pos_hash = available[0]
            processed_positions[text_str].add(pos_hash)
        elif text_instances:
            rect = text_instances[0]  # api.py:176-186 reuse-first fallback

        spans.append(
            {
                "text": text_str,
                "rect": rect,
                "font": item.font,
                "encoded_bytes": item.encoded_bytes,
                "instance_index": current_instance_index,
            }
        )
    return spans


def nested_box_filter(spans: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Area-desc sort + containment drop (api.py:337-388).

    Output order is area-desc (stable within ties).  Rect-less spans carry
    area 0 and are always kept.
    """
    if not spans:
        return spans

    def area(s: dict[str, Any]) -> float:
        r = s.get("rect")
        if not r:
            return 0.0
        return (r[2] - r[0]) * (r[3] - r[1])

    sorted_spans = sorted(spans, key=area, reverse=True)
    filtered: list[dict[str, Any]] = []
    for i, s in enumerate(sorted_spans):
        r1 = s.get("rect")
        if not r1:
            filtered.append(s)
            continue
        contained = False
        # Checked against EVERY earlier (larger-or-equal-area) entry of the
        # sorted list, kept or dropped — api.py:365-377.
        for larger in sorted_spans[:i]:
            r2 = larger.get("rect")
            if not r2:
                continue
            if r1[0] >= r2[0] and r1[1] >= r2[1] and r1[2] <= r2[2] and r1[3] <= r2[3]:
                contained = True
                break
        if not contained:
            filtered.append(s)
    return filtered


def assemble_text(filtered_spans: list[dict[str, Any]]) -> tuple[str, list[dict[str, Any]]]:
    """'\\n'-join filtered span texts; attach [offset_start, offset_end).

    The joined string is the per-url byte-identity target
    (BASELINE.json input_hint; SURVEY.md §3.1 extracted-text contract).
    """
    parts: list[str] = []
    offset = 0
    out_spans: list[dict[str, Any]] = []
    for s in filtered_spans:
        t = s["text"]
        start = offset
        end = start + len(t)
        s2 = dict(s)
        s2["offset_start"] = start
        s2["offset_end"] = end
        out_spans.append(s2)
        parts.append(t)
        offset = end + 1  # the '\n' separator
    return "\n".join(parts), out_spans
