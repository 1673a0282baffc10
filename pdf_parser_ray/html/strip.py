"""DOM-heuristic HTML boilerplate stripper (tag-density + text-block scoring).

The webtext half of the extraction engine (BASELINE.json north_star: "a
DOM-heuristic HTML boilerplate stripper (tag-density + text-block scoring)
for web pages").  There is no upstream reference implementation for this
path — determinism IS the contract (FIXTURES.md §3); goldens are frozen by
this repo's own fixtures.

Algorithm (public-knowledge heuristics in the boilerpipe / trafilatura
family, built from scratch on stdlib ``html.parser``):

1. Decode bytes: declared ``<meta charset>`` / ``http-equiv`` charset if
   present (first 2048 bytes), else UTF-8; always ``errors="replace"``.
2. Parse into text BLOCKS: a block is the text accumulated inside one
   block-level element (p, h1-h6, li, td, pre, blockquote, div, article,
   section, main).  Character data inside ``script/style/noscript/
   template/svg/head`` is dropped outright.
3. Per block, track: total text chars, chars inside <a> (link chars), tag
   count inside the block, whether any ancestor is a semantic-boilerplate
   container (nav, header, footer, aside, form, button, menu) and whether
   any ancestor is semantic-content (article, main).
4. Score = keep iff:
     - not inside a boilerplate container, and
     - link_density = link_chars/chars < 0.5, and
     - (chars >= MIN_CHARS, or heading h1-h6 with chars >= 3,
        or inside article/main with chars >= MIN_CONTENT_CHARS)
   Tag density (tags per text char) > MAX_TAG_DENSITY also rejects.
5. Output: blocks in document order; ``extracted_text`` = '\n'-joined
   normalized block texts; spans carry [offset_start, offset_end), the
   block's dominant tag (in the ``font`` column, unifying the span schema
   with the PDF path), and per-duplicate ``instance_index`` mirroring the
   PDF path's indexing (api.py:136-149 semantics applied to blocks).

Whitespace normalization: runs of whitespace inside a block collapse to a
single space; leading/trailing stripped.  Empty blocks are dropped.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any

MIN_CHARS = 25           # minimum chars for a generic kept block
MIN_CONTENT_CHARS = 3    # minimum chars when inside <article>/<main>
MAX_LINK_DENSITY = 0.5
MAX_TAG_DENSITY = 0.25   # tags per text char within the block

_BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "pre",
    "blockquote", "div", "article", "section", "main", "figcaption", "dd", "dt",
}
_DROP_TAGS = {"script", "style", "noscript", "template", "svg", "head", "iframe"}
_BOILER_TAGS = {"nav", "header", "footer", "aside", "form", "button", "menu", "select"}
_CONTENT_TAGS = {"article", "main"}
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_VOID_TAGS = {
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr", "param",
}

_WS_RE = re.compile(r"\s+")
_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.IGNORECASE
)


def decode_html(payload: bytes) -> str:
    """Charset-declared decode with lenient UTF-8 fallback (H4 family)."""
    m = _CHARSET_RE.search(payload[:2048])
    if m:
        enc = m.group(1).decode("ascii", "ignore").lower()
        try:
            return payload.decode(enc, errors="replace")
        except LookupError:
            pass
    return payload.decode("utf-8", errors="replace")


class _Block:
    __slots__ = ("tag", "chars", "link_chars", "tags", "boiler", "content", "heading", "order")

    def __init__(self, tag: str, boiler: bool, content: bool, order: int):
        self.tag = tag
        self.chars: list[str] = []
        self.link_chars = 0
        self.tags = 0
        self.boiler = boiler
        self.content = content
        self.heading = tag in _HEADING_TAGS
        self.order = order


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.drop_depth = 0
        self.boiler_depth = 0
        self.content_depth = 0
        self.link_depth = 0
        self.blocks: list[_Block] = []
        self.block_stack: list[_Block] = []
        self._order = 0

    # -- tag events ------------------------------------------------------

    def handle_starttag(self, tag: str, attrs: list) -> None:
        tag = tag.lower()
        if tag in _VOID_TAGS:
            if self.block_stack and not self.drop_depth:
                self.block_stack[-1].tags += 1
            return
        self.stack.append(tag)
        if tag in _DROP_TAGS:
            self.drop_depth += 1
        if tag in _BOILER_TAGS:
            self.boiler_depth += 1
        if tag in _CONTENT_TAGS:
            self.content_depth += 1
        if tag == "a":
            self.link_depth += 1
        if self.block_stack and not self.drop_depth:
            self.block_stack[-1].tags += 1
        if tag in _BLOCK_TAGS and not self.drop_depth:
            blk = _Block(tag, self.boiler_depth > 0, self.content_depth > 0, self._order)
            self._order += 1
            self.blocks.append(blk)
            self.block_stack.append(blk)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in _VOID_TAGS:
            return
        # Pop the stack back to the matching open tag (recover from
        # unclosed tags deterministically — H5 malformed family).
        if tag in self.stack:
            while self.stack:
                top = self.stack.pop()
                if top in _DROP_TAGS:
                    self.drop_depth = max(0, self.drop_depth - 1)
                if top in _BOILER_TAGS:
                    self.boiler_depth = max(0, self.boiler_depth - 1)
                if top in _CONTENT_TAGS:
                    self.content_depth = max(0, self.content_depth - 1)
                if top == "a":
                    self.link_depth = max(0, self.link_depth - 1)
                if top in _BLOCK_TAGS and self.block_stack:
                    self.block_stack.pop()
                if top == tag:
                    break

    def handle_data(self, data: str) -> None:
        if self.drop_depth or not data:
            return
        if self.block_stack:
            blk = self.block_stack[-1]
        else:
            # Text outside any block element → an implicit block.
            stripped = data.strip()
            if not stripped:
                return
            blk = _Block("body", self.boiler_depth > 0, self.content_depth > 0, self._order)
            self._order += 1
            self.blocks.append(blk)
            self.block_stack.append(blk)
            self.block_stack.pop()  # implicit blocks don't stay open
        blk.chars.append(data)
        if self.link_depth:
            blk.link_chars += len(_WS_RE.sub(" ", data).strip())


def strip_html(payload: bytes) -> dict[str, Any]:
    """Extract main content from HTML bytes.

    Returns ``{"extracted_text": str, "spans": [...], "status": str}`` with
    the same span layout as the PDF path (rect=None, font=block tag).
    """
    text = decode_html(payload)
    parser = _Extractor()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        # html.parser is already lenient; absolute failures → empty.
        return {"extracted_text": "", "spans": [], "status": "error:html_parse"}

    kept: list[tuple[str, str]] = []  # (tag, normalized_text)
    for blk in parser.blocks:
        raw = "".join(blk.chars)
        norm = _WS_RE.sub(" ", raw).strip()
        if not norm:
            continue
        if blk.boiler:
            continue
        n = len(norm)
        link_density = blk.link_chars / n if n else 1.0
        tag_density = blk.tags / n if n else 1.0
        if link_density >= MAX_LINK_DENSITY:
            continue
        if tag_density > MAX_TAG_DENSITY:
            continue
        if n >= MIN_CHARS or (blk.heading and n >= 3) or (blk.content and n >= MIN_CONTENT_CHARS):
            kept.append((blk.tag, norm))

    spans: list[dict[str, Any]] = []
    instance_counts: dict[str, int] = {}
    offset = 0
    parts: list[str] = []
    for tag, t in kept:
        idx = instance_counts.get(t, 0)
        instance_counts[t] = idx + 1
        spans.append(
            {
                "text": t,
                "rect": None,
                "font": tag,
                "encoded_bytes": None,
                "instance_index": idx,
                "offset_start": offset,
                "offset_end": offset + len(t),
            }
        )
        parts.append(t)
        offset += len(t) + 1

    extracted = "\n".join(parts)
    status = "ok" if extracted else "empty"
    return {"extracted_text": extracted, "spans": spans, "status": status}
