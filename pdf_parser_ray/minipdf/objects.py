"""PDF object-syntax parser (ISO 32000 §7.3) — recursive descent over bytes.

Public knowledge only: the grammar is from the published PDF spec.  Scope
is what the extraction/replace pipelines touch: no encryption, no object
streams (fixtures and CC-style payloads in this corpus don't use them;
unknown constructs degrade to a ``status`` column, never an exception
escaping the batch — SURVEY.md §4 stragglers row).
"""

from __future__ import annotations

import re
from typing import Any

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"


class PdfName(str):
    """A /Name.  Subclass of str holding the name WITH the leading slash,
    matching how the reference compares names as strings ('/F1')."""

    __slots__ = ()


class PdfRef:
    """Indirect reference ``num gen R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int = 0):
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:  # pragma: no cover
        return f"PdfRef({self.num},{self.gen})"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, PdfRef) and (self.num, self.gen) == (other.num, other.gen)

    def __hash__(self) -> int:
        return hash((self.num, self.gen))


class PdfStream:
    """A stream object: dict + raw (still-encoded) data bytes."""

    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in WHITESPACE:
            pos += 1
        elif c == 0x25:  # '%' comment → to EOL
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def parse_object(data: bytes, pos: int) -> tuple[Any, int]:
    """Parse one object at ``pos`` (whitespace skipped); return (obj, end)."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise ValueError("unexpected end of data")
    c = data[pos]

    if c == 0x2F:  # '/'
        return _parse_name(data, pos)
    if c == 0x28:  # '('
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # '<'
        if data[pos : pos + 2] == b"<<":
            return _parse_dict_or_stream(data, pos)
        return _parse_hex_string(data, pos)
    if c == 0x5B:  # '['
        return _parse_array(data, pos)
    if data[pos : pos + 4] == b"true":
        return True, pos + 4
    if data[pos : pos + 5] == b"false":
        return False, pos + 5
    if data[pos : pos + 4] == b"null":
        return None, pos + 4

    m = _NUM_RE.match(data, pos)
    if m:
        # Could be "num gen R" indirect reference — lookahead.
        ref = _try_parse_ref(data, pos)
        if ref is not None:
            return ref
        tok = m.group(0)
        end = m.end()
        if b"." in tok:
            return float(tok), end
        return int(tok), end

    raise ValueError(f"cannot parse object at {pos}: {data[pos:pos+20]!r}")


_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R(?![A-Za-z0-9])")


def _try_parse_ref(data: bytes, pos: int) -> tuple[PdfRef, int] | None:
    m = _REF_RE.match(data, pos)
    if m:
        return PdfRef(int(m.group(1)), int(m.group(2))), m.end()
    return None


_NAME_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")
_NAME_ESC_RE = re.compile(rb"#([0-9A-Fa-f]{2})")


def _parse_name(data: bytes, pos: int) -> tuple[PdfName, int]:
    m = _NAME_RE.match(data, pos + 1)
    tok = m.group(0)
    if b"#" in tok:  # '#xx' escapes (invalid hex pairs stay literal)
        tok = _NAME_ESC_RE.sub(lambda e: bytes([int(e.group(1), 16)]), tok)
    return PdfName("/" + tok.decode("latin1")), m.end()


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    # Balanced parens with backslash escapes (spec §7.3.4.2).
    depth = 1
    i = pos + 1
    n = len(data)
    out = bytearray()
    escapes = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C,
               0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
    while i < n:
        c = data[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = data[i + 1]
            if nxt in escapes:
                out.append(escapes[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                val = 0
                while j < n and j < i + 4 and 0x30 <= data[j] <= 0x37:
                    val = val * 8 + (data[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
                continue
            if nxt in b"\r\n":  # line continuation
                i += 2
                if nxt == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
                continue
            out.append(nxt)
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out.append(c)
        i += 1
    raise ValueError("unterminated literal string")


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.index(b">", pos + 1)
    hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos + 1 : end])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    return bytes.fromhex(hexdigits.decode("ascii")), end + 1


def _parse_array(data: bytes, pos: int) -> tuple[list, int]:
    items: list[Any] = []
    pos += 1
    while True:
        pos = _skip_ws(data, pos)
        if pos >= len(data):
            raise ValueError("unterminated array")
        if data[pos] == 0x5D:  # ']'
            return items, pos + 1
        obj, pos = parse_object(data, pos)
        items.append(obj)


def _parse_dict_or_stream(data: bytes, pos: int) -> tuple[Any, int]:
    d: dict[str, Any] = {}
    pos += 2
    while True:
        pos = _skip_ws(data, pos)
        if pos >= len(data):
            raise ValueError("unterminated dict")
        if data[pos : pos + 2] == b">>":
            pos += 2
            break
        key, pos = _parse_name(data, pos)
        val, pos = parse_object(data, pos)
        d[str(key)] = val

    # Stream follows?
    after = _skip_ws(data, pos)
    if data[after : after + 6] == b"stream":
        i = after + 6
        if data[i : i + 2] == b"\r\n":
            i += 2
        elif i < len(data) and data[i] in b"\n\r":
            i += 1
        # /Length may be an int or an indirect ref (resolved by the
        # document layer); when unusable, fall back to searching endstream.
        length = d.get("/Length")
        if isinstance(length, int) and 0 <= length <= len(data) - i:
            raw = data[i : i + length]
            end = i + length
            tail = _skip_ws(data, end)
            if data[tail : tail + 9] == b"endstream":
                return PdfStream(d, raw), tail + 9
        # Robust fallback: scan for the nearest endstream keyword.
        endpos = data.find(b"endstream", i)
        if endpos == -1:
            raise ValueError("unterminated stream")
        raw = data[i:endpos]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
        return PdfStream(d, raw), endpos + 9

    return d, pos
