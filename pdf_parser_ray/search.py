"""Search pipeline — the reference's `search` entry point over a corpus.

Reference semantics (api.py:395-479): per page, find occurrences of the
query; each hit carries the matched text, the containing block's text as
``context``, the rect, and ``block_order``; hits sorted by block order
within a page (api.py:477).

Corpus mapping: the extraction output's SPANS play the role of blocks
(span containment IS the reference's block-contains-hit lookup, J4 in
SURVEY.md §2.4).  A hit = a span whose text contains the query;
``block_order`` = the span's position among the url's spans.

Efficiency: a vectorized ``match_substring`` prefilter on
``extracted_text`` skips non-matching documents before any per-row span
walk — on a 10^12-doc corpus virtually every row exits in the Arrow
kernel.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

HIT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("page", pa.int32()),
        ("text", pa.string()),
        ("context", pa.string()),
        ("x0", pa.float64()),
        ("y0", pa.float64()),
        ("x1", pa.float64()),
        ("y1", pa.float64()),
        ("block_order", pa.int32()),
    ]
)


def font_for_text(spans: list[dict], text: str) -> str | None:
    """First span whose text contains ``text`` → its font (M24,
    pdf_gui.py:1787-1798); None when absent."""
    for span in spans or []:
        if text in (span.get("text") or ""):
            return span.get("font")
    return None


def search_corpus(
    extracted: ray.data.Dataset,
    query: str,
    *,
    case_sensitive: bool = False,
) -> ray.data.Dataset:
    """Hits dataset over extraction output (must include ``spans``)."""

    import re as _re

    # Match on the ORIGINAL text (not an index computed on a lowercased
    # copy): for chars whose lowercase changes length ('İ' → 'i̇') a
    # lowered-string offset would slice the wrong characters.
    needle_re = _re.compile(
        _re.escape(query), 0 if case_sensitive else _re.IGNORECASE
    )

    def find_hits(batch: pa.Table) -> pa.Table:
        mask = pc.match_substring(
            batch.column("extracted_text"), query, ignore_case=not case_sensitive
        )
        mask = pc.fill_null(mask, False)
        t = batch.filter(mask)
        urls = t.column("url").to_pylist()
        spans_col = t.column("spans").to_pylist()

        rows = {name: [] for name in HIT_SCHEMA.names}
        for url, spans in zip(urls, spans_col):
            for order, span in enumerate(spans or []):
                m = needle_re.search(span["text"] or "")
                if m is not None:
                    rows["url"].append(url)
                    rows["page"].append(span["page"])
                    # the matched text as it appears in the span
                    rows["text"].append(m.group(0))
                    rows["context"].append(span["text"])
                    rows["x0"].append(span["x0"])
                    rows["y0"].append(span["y0"])
                    rows["x1"].append(span["x1"])
                    rows["y1"].append(span["y1"])
                    rows["block_order"].append(order)
        return pa.table(
            {n: pa.array(rows[n], HIT_SCHEMA.field(n).type) for n in HIT_SCHEMA.names}
        )

    return extracted.map_batches(find_hits, batch_format="pyarrow")
