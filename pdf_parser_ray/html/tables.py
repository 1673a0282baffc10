"""HTML table extraction — the structured-data side of the extraction
tier (WAT/structured-harvest family, alongside html.meta and html.links).

From-scratch on stdlib ``html.parser`` like the boilerplate stripper
(html/strip.py rationale: no reference implementation exists for the
webtext path; determinism is the contract).

Semantics (deterministic, pinned by tests/test_html_tables.py):

* every ``<table>`` gets an index in document order (the order its
  opening tag appears); NESTED tables are separate tables — their text
  belongs to the inner table only, never to the outer cell;
* a row is a ``<tr>``; cells are ``<td>``/``<th>`` in order, with
  ``is_header`` true for ``<th>``; implicit closures follow the HTML5
  rule (a new ``<td>``/``<tr>``/``</table>`` closes any open cell/row);
* cell text is the character data inside the cell (inline markup
  stripped, ``script/style`` dropped), whitespace-collapsed like the
  stripper; ``colspan``/``rowspan`` are reported as parsed ints but NOT
  expanded (col_idx counts source cells — the raw-harvest convention;
  expansion is a downstream transform);
* empty rows and cell-less tables still emit nothing (no phantom rows).

Output of :func:`extract_tables`: one row per cell —
(url, table_idx:int64, row_idx:int64, col_idx:int64, is_header:bool,
colspan:int64, rowspan:int64, cell_text:string).  Row-local map_batches,
zero shuffle at any scale.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pdf_parser_ray.html.strip import decode_html

_WS_RE = re.compile(r"\s+")
_DROP_TAGS = {"script", "style", "noscript", "template", "svg"}


def _span_of(attrs, name: str) -> int:
    for k, v in attrs:
        if k == name and v is not None:
            try:
                n = int(v.strip())
                return n if n >= 1 else 1
            except ValueError:
                return 1
    return 1


class _Cell:
    __slots__ = ("row", "col", "header", "colspan", "rowspan", "chars")

    def __init__(self, row, col, header, colspan, rowspan):
        self.row, self.col = row, col
        self.header = header
        self.colspan, self.rowspan = colspan, rowspan
        self.chars: list[str] = []


class _Table:
    __slots__ = ("idx", "row", "col", "in_row", "cells", "open_cell")

    def __init__(self, idx: int):
        self.idx = idx
        self.row = -1
        self.col = -1
        self.in_row = False
        self.cells: list[_Cell] = []
        self.open_cell: _Cell | None = None


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.n_tables = 0
        self.stack: list[_Table] = []  # innermost last (nested tables)
        self.done: list[_Cell] = []
        self.table_of_cell: list[int] = []
        self.drop_depth = 0

    # -- helpers ---------------------------------------------------
    def _close_cell(self):
        t = self.stack[-1]
        if t.open_cell is not None:
            self.done.append(t.open_cell)
            self.table_of_cell.append(t.idx)
            t.open_cell = None

    def _close_row(self):
        t = self.stack[-1]
        self._close_cell()
        t.in_row = False

    # -- parser events ---------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self.drop_depth += 1
            return
        if tag == "table":
            t = _Table(self.n_tables)
            self.n_tables += 1
            self.stack.append(t)
            return
        if not self.stack:
            return
        t = self.stack[-1]
        if tag == "tr":
            self._close_row()
            t.row += 1
            t.col = -1
            t.in_row = True
        elif tag in ("td", "th"):
            self._close_cell()
            if not t.in_row:  # cell outside <tr>: implicit row
                t.row += 1
                t.col = -1
                t.in_row = True
            t.col += 1
            t.open_cell = _Cell(
                t.row, t.col, tag == "th",
                _span_of(attrs, "colspan"), _span_of(attrs, "rowspan"),
            )

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self.drop_depth = max(0, self.drop_depth - 1)
            return
        if not self.stack:
            return
        if tag == "table":
            self._close_row()
            self.stack.pop()
        elif tag == "tr":
            self._close_row()
        elif tag in ("td", "th"):
            self._close_cell()

    def handle_data(self, data):
        if self.drop_depth or not self.stack:
            return
        cell = self.stack[-1].open_cell
        if cell is not None:
            cell.chars.append(data)

    def close(self):
        super().close()
        while self.stack:  # unclosed tables at EOF
            self._close_row()
            self.stack.pop()


def parse_tables(html: str) -> list[dict]:
    """Parse one page's tables into flat cell dicts (serial kernel —
    the unit under test; :func:`extract_tables` maps it per batch)."""
    p = _TableParser()
    p.feed(html)
    p.close()
    out = []
    for tidx, c in zip(p.table_of_cell, p.done):
        text = _WS_RE.sub(" ", "".join(c.chars)).strip()
        out.append(
            {
                "table_idx": tidx,
                "row_idx": c.row,
                "col_idx": c.col,
                "is_header": c.header,
                "colspan": c.colspan,
                "rowspan": c.rowspan,
                "cell_text": text,
            }
        )
    # document order: by table, then row, then col (nested tables emit
    # interleaved with their outer table's cells — sort restores the
    # per-table rectangle)
    out.sort(key=lambda d: (d["table_idx"], d["row_idx"], d["col_idx"]))
    return out


def extract_tables(ds) -> "object":
    """Corpus-wide table harvest: (url, html) → one row per cell.
    Row-local; payloads never shuffle."""
    import pandas as pd
    import pyarrow as pa

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("table_idx", pa.int64()),
            ("row_idx", pa.int64()),
            ("col_idx", pa.int64()),
            ("is_header", pa.bool_()),
            ("colspan", pa.int64()),
            ("rowspan", pa.int64()),
            ("cell_text", pa.string()),
        ]
    )

    def harvest(df: pd.DataFrame):
        rows = {n: [] for n in schema.names}
        for url, payload in zip(df["url"], df["html"]):
            if payload is None:
                continue
            html = decode_html(bytes(payload))
            for cell in parse_tables(html):
                rows["url"].append(url)
                for k, v in cell.items():
                    rows[k].append(v)
        return pa.table(
            {n: pa.array(rows[n], schema.field(n).type) for n in schema.names}
        )

    return ds.map_batches(harvest, batch_format="pandas")
