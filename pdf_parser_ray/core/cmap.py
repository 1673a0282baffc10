"""ToUnicode CMap parsing / decoding — semantics pinned to the reference.

Reference behavior reproduced here (file:line into /root/reference/):

* ``parse_cmap``        — pdf_parser/core/cmap.py:4-40.  Line-oriented scan;
  a 3-hex-group line is a ``bfrange`` entry (codes > 0xFF skipped
  individually), a 2-hex-group line is a ``bfchar`` entry (code > 0xFF
  skipped).  Single-byte codes only; multi-byte CID fonts therefore decode
  to ``?`` per byte — that is part of the contract (SURVEY.md §2.11), do
  not "fix" it.
* ``decode_pdf_string`` — pdf_parser/core/cmap.py:43-54.  Per-byte lookup
  with ``'?'`` fallback.
* ``encode_pdf_string`` — pdf_parser/core/cmap.py:57-77.
* ``escape_pdf_string`` — pdf_parser/core/cmap.py:80-104.
* ``winansi_cmap_text`` — pdf_parser/core/cmap.py:107-165
  (``create_tounicode_cmap``): only WinAnsi (printable ASCII 0x20-0x7E) is
  actually implemented; every other encoding name falls back to it.

All functions are pure and cheap; they run inside ``map_batches`` workers.
The expensive part — parsing the same CMap text again and again across a
corpus where standard fonts repeat — is avoided by the actor-level cache
in :mod:`pdf_parser_ray.stages` keyed on the CMap byte hash.
"""

from __future__ import annotations

import re

# bfrange: <start> <end> <target>   (3 hex groups anywhere in the line)
_RANGE_RE = re.compile(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
# bfchar: <code> <target>           (2 hex groups)
_CHAR_RE = re.compile(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")


def parse_cmap(cmap_str: str) -> dict[bytes, str]:
    """Parse a ToUnicode CMap into ``{single_byte: unicode_char}``.

    Matches reference cmap.py:4-40 exactly, including:
    - bfrange lines take priority over the bfchar pattern (the 3-group
      match short-circuits the 2-group one via ``continue``);
    - range members above 0xFF are skipped one by one;
    - bfchar codes above 0xFF are skipped;
    - later lines overwrite earlier mappings for the same code.
    """
    cmap: dict[bytes, str] = {}
    for line in cmap_str.splitlines():
        range_match = _RANGE_RE.search(line)
        if range_match:
            start_hex, end_hex, target_hex = range_match.groups()
            start = int(start_hex, 16)
            end = int(end_hex, 16)
            target = int(target_hex, 16)
            for i in range(start, end + 1):
                if i > 0xFF:
                    continue
                cmap[bytes([i])] = chr(target + (i - start))
            continue

        char_match = _CHAR_RE.search(line)
        if char_match:
            code_hex, target_hex = char_match.groups()
            code = int(code_hex, 16)
            target = int(target_hex, 16)
            if code > 0xFF:
                continue
            cmap[bytes([code])] = chr(target)

    return cmap


def decode_pdf_string(pdf_bytes: bytes, cmap: dict[bytes, str]) -> str:
    """Decode content-stream string bytes via the CMap; unmapped byte → '?'.

    Reference cmap.py:43-54; the ``'?'`` fallback is part of the
    byte-exact extraction contract.
    """
    return "".join(cmap.get(bytes([b]), "?") for b in pdf_bytes)


def translation_table(cmap: dict[bytes, str]) -> dict[int, str]:
    """``str.translate`` table equivalent to :func:`decode_pdf_string`.

    Hot-path twin: ``raw.decode('latin1').translate(table)`` produces the
    exact same string as the reference per-byte loop, at C speed.  Build
    once per CMap and cache next to it (see extract.page_font_cmaps).
    """
    return {i: cmap.get(bytes([i]), "?") for i in range(256)}


def decode_pdf_string_fast(pdf_bytes: bytes, table: dict[int, str]) -> str:
    """Byte-identical fast path for :func:`decode_pdf_string`."""
    return pdf_bytes.decode("latin1").translate(table)


class Cmap(dict):
    """A CMap dict with a lazily-built, cached translate table.

    Behaves exactly like the plain ``{bytes: str}`` mapping everywhere
    (reverse maps, membership, parity with the reference), while giving
    the tokenizer hot loop its C-speed decode table for free.
    """

    __slots__ = ("_table",)

    @property
    def table(self) -> dict[int, str]:
        t = getattr(self, "_table", None)
        if t is None:
            t = translation_table(self)
            self._table = t
        return t


def encode_pdf_string(unicode_text: str, cmap: dict[bytes, str]) -> bytes:
    """Reverse-map chars to code bytes; ValueError on unmapped char.

    Reference cmap.py:57-77 (replacement path only).
    """
    reverse = {v: k for k, v in cmap.items()}
    encoded = []
    for c in unicode_text:
        if c not in reverse:
            raise ValueError(f"Character {c} not found in CMap, cannot encode.")
        encoded.append(reverse[c])
    return b"".join(encoded)


_ESCAPES = {
    "(": "\\(",
    ")": "\\)",
    "\\": "\\\\",
    "\r": "\\r",
    "\n": "\\n",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}


def escape_pdf_string(text: str) -> str:
    """Escape special chars for writing back into a literal string.

    Reference cmap.py:80-104.
    """
    return "".join(_ESCAPES.get(c, c) for c in text)


def unescape_pdf_string(text: str) -> str:
    """The parse-path unescape: ``\\( \\) \\\\`` only, in that order.

    Reference api.py:121 (and pdf_gui.py:630).  NOTE: the reference's
    *replace* path instead strips every backslash (replacer.py:199,356,487)
    — extraction byte-identity requires this parse-path behavior
    (SURVEY.md §2.11).
    """
    return text.replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")


def winansi_cmap_text(encoding_name: str = "/WinAnsiEncoding") -> str:
    """Synthesize a ToUnicode CMap for fonts without one.

    Reference cmap.py:107-165 ``create_tounicode_cmap``: identity ASCII
    0x20-0x7E; any encoding name other than /WinAnsiEncoding also falls
    back to this table.  The generated text round-trips through
    :func:`parse_cmap` to the same mapping the reference gets.
    """
    # 0x20-0x7E identity (chr(code) == the WinAnsi char on this range).
    codes = range(32, 127)
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange",
        f"{len(list(codes))} beginbfchar",
    ]
    lines += [f"<{code:02X}> <{code:04X}>" for code in range(32, 127)]
    lines += ["endbfchar", "endcmap", "CMapName currentdict /CMap defineresource pop", "end", "end"]
    return "\n".join(lines)


def winansi_cmap() -> dict[bytes, str]:
    """The parsed WinAnsi fallback mapping as the reference sees it.

    Printable ASCII 0x20-0x7E identity PLUS the quirk entry
    ``0x00 → 'ÿ'``: the reference's generated CMap puts the
    codespacerange ``<00> <FF>`` on its own line (cmap.py:151), which its
    own line-scanning parser then reads as a bfchar pair.  Faithful.
    """
    out = {b"\x00": "\xff"}
    out.update({bytes([c]): chr(c) for c in range(32, 127)})
    return out
