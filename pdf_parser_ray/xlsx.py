"""Minimal from-scratch .xlsx sheet reader (S9 — reference
pdf_gui.py:1671-1690 ``pd.read_excel(path, header=None)``).

The environment has no openpyxl, so the Excel rules workbook the
reference's batch-replace mode consumes is read here directly from the
OOXML container: an ``.xlsx`` file is a ZIP holding XML parts, and the
subset a rules sheet needs — shared strings, inline strings, numbers,
booleans, cached formula values — is small enough to parse with
``zipfile`` + ``xml.etree`` alone.  Only the public, ECMA-376-documented
layout is touched:

- ``xl/workbook.xml``       sheet name → r:id order
- ``xl/_rels/workbook.xml.rels``  r:id → worksheet part path
- ``xl/sharedStrings.xml``  the ``t="s"`` string table
- ``xl/worksheets/sheetN.xml``  rows of ``<c r="A1" t="..."><v>``

Output matches ``pd.read_excel(path, header=None)`` for that subset: a
rectangular object-dtype frame, integer column labels, ``None`` holes.
This is a driver-side reader for SMALL side tables (rule sheets,
configs) that are then broadcast into actor pools — never a corpus
path.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = (
    "{http://schemas.openxmlformats.org/package/2006/relationships}"
)
_R_ID = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships}id"
)
_CELL_REF = re.compile(r"^([A-Z]+)([0-9]+)$")


def _col_index(letters: str) -> int:
    """'A' → 0, 'Z' → 25, 'AA' → 26 (base-26 bijective)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _cell_text(c: ET.Element) -> str:
    """Concatenated text of every <t> run under an <is> or <v> value."""
    return "".join(t.text or "" for t in c.iter(f"{_NS}t"))


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    # each <si> may hold one <t> or rich-text <r><t> runs — concat runs
    return [
        "".join(t.text or "" for t in si.iter(f"{_NS}t"))
        for si in root.iter(f"{_NS}si")
    ]


def _sheet_paths(zf: zipfile.ZipFile) -> list[str]:
    """Worksheet part paths in workbook sheet order."""
    rels = {}
    for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")).iter(
        f"{_NS_REL}Relationship"
    ):
        target = rel.get("Target", "")
        if target.startswith("/"):
            target = target.lstrip("/")
        else:
            target = "xl/" + target
        rels[rel.get("Id")] = target
    paths = []
    for sh in ET.fromstring(zf.read("xl/workbook.xml")).iter(f"{_NS}sheet"):
        rid = sh.get(_R_ID)
        if rid in rels:
            paths.append(rels[rid])
    return paths


def _convert(raw: str, ctype: str | None):
    if ctype == "b":
        return raw == "1"
    if ctype in ("str", "inlineStr", "s"):
        return raw
    # default cell type is number; ints come back int like read_excel
    try:
        f = float(raw)
    except ValueError:
        return raw
    return int(f) if f.is_integer() else f


def read_xlsx(path: str, sheet: int = 0) -> pd.DataFrame:
    """Read one worksheet of an ``.xlsx`` file with ``header=None``
    semantics: returns a rectangular object-dtype frame with integer
    column labels and ``None`` in absent cells."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        paths = _sheet_paths(zf)
        if not paths:
            raise ValueError(f"{path}: workbook has no sheets")
        if sheet >= len(paths):
            raise ValueError(
                f"{path}: sheet {sheet} out of range ({len(paths)} sheets)"
            )
        root = ET.fromstring(zf.read(paths[sheet]))

    rows: dict[int, dict[int, object]] = {}
    next_row = 0
    for row in root.iter(f"{_NS}row"):
        r_attr = row.get("r")
        ri = int(r_attr) - 1 if r_attr else next_row
        next_row = ri + 1
        cells: dict[int, object] = {}
        next_col = 0
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r")
            if ref:
                m = _CELL_REF.match(ref)
                ci = _col_index(m.group(1)) if m else next_col
            else:
                ci = next_col
            next_col = ci + 1
            ctype = c.get("t")
            if ctype == "inlineStr":
                raw = _cell_text(c)
            else:
                v = c.find(f"{_NS}v")
                if v is None:
                    continue  # empty / style-only cell
                raw = v.text or ""
            if ctype == "s":
                cells[ci] = strings[int(raw)]
            else:
                cells[ci] = _convert(raw, ctype)
        if cells:
            rows[ri] = cells

    if not rows:
        return pd.DataFrame()
    n_rows = max(rows) + 1
    n_cols = max(max(c) for c in rows.values()) + 1
    data = [
        [rows.get(r, {}).get(c) for c in range(n_cols)]
        for r in range(n_rows)
    ]
    return pd.DataFrame(data, dtype=object)
