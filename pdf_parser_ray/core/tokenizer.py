"""Content-stream tokenizer — the reference's core scan loop, reimplemented.

Semantics pinned (file:line into /root/reference/):

* Combined alternation regex over the latin1-decoded stream —
  api.py:94-96 for the parse path (``Tj/TJ`` + ``Tf``), extended with the
  ``Tm`` / ``Td`` alternatives of the GUI position path pdf_gui.py:779-781.
* Font switches: ``font_pattern.search(match.group(0))`` over the WHOLE
  matched text — api.py:98-101.  (Yes: a shown string that happens to
  contain ``/F1 12 Tf`` is treated as a font switch.  Faithful.)
* ``Tm``: last two floats become the current position — pdf_gui.py:789-800.
* ``Td``: deltas added to the current position — pdf_gui.py:802-812.
* TJ flattening: whitespace-split, keep only ``(...)`` parts, drop kerning
  numbers; empty result keeps the raw inner text — api.py:109-118.
  Note this drops spaces BETWEEN TJ parts (SURVEY.md §7 hard parts).
* Unescape ``\\( \\) \\\\`` then latin1-encode — api.py:121-122.
* Decode via the current font's CMap; skip if the current font has no
  CMap; keep only if ``decoded.strip()`` non-empty; the *stripped* text is
  recorded — api.py:104, api.py:124-128.

Everything here is pure-Python per document row; it runs inside
``map_batches`` actors (regexes compiled once at module import, shared by
every actor — the A5 state of SURVEY.md §2.3).
"""

from __future__ import annotations

import re
from typing import NamedTuple

# Parse-path pieces (api.py:90-91).
TEXT_RE = re.compile(r"(?:\(((?:[^()\\]|\\.)*)\)|\[((?:[^][\\()]|\\.)*)\])\s*T[Jj]")
FONT_RE = re.compile(r"/([A-Za-z0-9]+)\s+\d+\s+Tf")
# Position-path pieces (pdf_gui.py:769-770).
MATRIX_RE = re.compile(r"(?:[-\d.]+\s+){5}[-\d.]+\s+Tm")
TD_RE = re.compile(r"([-\d.]+)\s+([-\d.]+)\s+Td")

# The combined alternation: text-show | font-select | Tm | Td
# (api.py:95 extended with pdf_gui.py:780's Tm/Td alternatives).
SCAN_RE = re.compile(
    r"(?:\(((?:[^()\\]|\\.)*)\)|\[((?:[^][\\()]|\\.)*)\])\s*T[Jj]"
    r"|/[A-Za-z0-9]+\s+\d+\s+Tf"
    r"|(?:[-\d.]+\s+){5}[-\d.]+\s+Tm"
    r"|(?:[-\d.]+)\s+(?:[-\d.]+)\s+Td"
)


class TextShow(NamedTuple):
    """One decoded text-show operation, in stream order."""

    font: str            # "/F1" — the current font at show time
    text: str            # decoded, stripped (api.py:128)
    encoded_bytes: bytes  # raw code bytes after unescape (api.py:122)
    x: float             # current position when shown (Tm/Td tracking)
    y: float
    stream_pos: int      # match start offset in the content string


def flatten_tj(inner_text: str) -> str:
    """TJ-array flattening, api.py:109-118.

    Whitespace-split; keep only parts that both start with ``(`` and end
    with ``)``; strip the parens and concatenate.  If nothing qualifies the
    raw inner text is used unchanged (the reference's ``if processed``
    guard).
    """
    processed = ""
    for part in inner_text.split():
        if part.startswith("(") and part.endswith(")"):
            processed += part[1:-1]
    return processed if processed else inner_text


def tokenize_content(
    content_str: str,
    font_cmaps: dict[str, dict[bytes, str]],
) -> list[TextShow]:
    """Scan a latin1-decoded content stream into decoded TextShow items.

    Reproduces the api.py:94-131 loop (with pdf_gui.py Tm/Td position
    tracking folded in).  The scan state (current font, current position)
    is local to one document page — no cross-row state.
    """
    from pdf_parser_ray.core.cmap import Cmap, decode_pdf_string, unescape_pdf_string

    # C-speed decode tables where available (byte-identical results;
    # see cmap.decode_pdf_string_fast).
    tables = {
        f: (c.table if isinstance(c, Cmap) else None) for f, c in font_cmaps.items()
    }
    items: list[TextShow] = []
    current_font: str | None = None
    current_pos = (0.0, 0.0)  # pdf_gui.py:773

    for match in SCAN_RE.finditer(content_str):
        whole = match.group(0)

        # Suffix dispatch (performance only — equivalence argument):
        # each alternation branch ends with its own operator token, and
        # the Tf/Tm/Td branches cannot contain any OTHER branch's
        # pattern ('/name int Tf' has no Tm/Td; '... Tm'/'... Td' admit
        # only [-\d.] and whitespace, so no '/...Tf' and no foreign
        # operator), so running only that branch's handler produces
        # exactly the reference's search-cascade outcome.  Text-show
        # matches (suffix Tj/TJ) keep the FULL cascade below because a
        # shown string CAN contain the other patterns (reference quirks
        # pinned in tests/test_tokenizer.py).
        if whole.endswith("Tf") and not whole.endswith(("Tj", "TJ")):
            fm = FONT_RE.search(whole)
            if fm:
                current_font = "/" + fm.group(1)
                continue
        elif whole.endswith("Tm"):
            mm = MATRIX_RE.search(whole)
            if mm:
                parts = mm.group(0).strip().split()
                if len(parts) >= 6:
                    try:
                        current_pos = (float(parts[-2]), float(parts[-1]))
                    except ValueError:
                        pass
                continue
        elif whole.endswith("Td"):
            tm_ = TD_RE.search(whole)
            if tm_:
                try:
                    dx, dy = float(tm_.group(1)), float(tm_.group(2))
                    current_pos = (current_pos[0] + dx, current_pos[1] + dy)
                except ValueError:
                    pass
                continue

        # Font switch takes priority (api.py:98-101): searched anywhere in
        # the matched text, faithful to the reference.
        font_match = FONT_RE.search(whole)
        if font_match:
            current_font = "/" + font_match.group(1)
            continue

        # Tm — take the last two floats as (x, y) (pdf_gui.py:789-800).
        matrix_match = MATRIX_RE.search(whole)
        if matrix_match:
            parts = matrix_match.group(0).strip().split()
            if len(parts) >= 6:
                try:
                    current_pos = (float(parts[-2]), float(parts[-1]))
                except ValueError:
                    pass
            continue

        # Td — relative move (pdf_gui.py:802-812).
        td_match = TD_RE.search(whole)
        if td_match:
            try:
                dx, dy = float(td_match.group(1)), float(td_match.group(2))
                current_pos = (current_pos[0] + dx, current_pos[1] + dy)
            except ValueError:
                pass
            continue

        # Text show (api.py:103-128).
        text_match = TEXT_RE.search(whole)
        if text_match and current_font in font_cmaps:
            is_tj = whole.strip().endswith("TJ")
            inner_text = text_match.group(2) if is_tj else text_match.group(1)
            if is_tj:
                inner_text = flatten_tj(inner_text)

            unescaped = unescape_pdf_string(inner_text)
            try:
                encoded_bytes = unescaped.encode("latin1")
            except UnicodeEncodeError:
                continue  # cannot happen for latin1-decoded input; guard anyway
            table = tables[current_font]
            if table is not None:
                decoded_text = unescaped.translate(table)
            else:
                decoded_text = decode_pdf_string(encoded_bytes, font_cmaps[current_font])
            if decoded_text.strip():
                items.append(
                    TextShow(
                        font=current_font,
                        text=decoded_text.strip(),
                        encoded_bytes=encoded_bytes,
                        x=current_pos[0],
                        y=current_pos[1],
                        stream_pos=match.start(),
                    )
                )

    return items
