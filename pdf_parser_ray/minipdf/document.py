"""Robust in-memory PDF document model (no xref trust, no file handles).

Design notes
------------
Objects are discovered by scanning the whole byte payload for
``N G obj ... endobj`` spans instead of walking the xref table.  This is
the corpus-scale analog of the reference GUI's multi-level content
recovery (pdf_gui.py:251-451): web-crawled PDFs routinely have broken or
truncated xrefs, and a scan always finds whatever objects survive.  The
cost is one ``re.finditer`` pass over bytes that are already in memory —
negligible next to content-stream tokenization.

Failure contract: constructors and accessors raise :class:`PdfError` with
a short machine-usable ``kind``; the extraction stage converts these to
``status='error:<kind>'`` columns (errors are data — SURVEY.md §1.2).
"""

from __future__ import annotations

import re
import zlib
from typing import Any

from pdf_parser_ray.minipdf.objects import PdfName, PdfRef, PdfStream, parse_object


class PdfError(Exception):
    def __init__(self, kind: str, msg: str = ""):
        self.kind = kind
        super().__init__(f"{kind}: {msg}" if msg else kind)


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_TRAILER_RE = re.compile(rb"trailer\b")


class PdfDocument:
    """Parse a PDF byte payload into an object map + page list."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("not_pdf", "missing %PDF- header")
        self.data = data
        self.objects: dict[int, Any] = {}
        self._parse_all_objects()
        if not self.objects:
            raise PdfError("no_objects", "no parseable objects")
        self.pages: list[dict[str, Any]] = self._collect_pages()

    # -- object discovery ------------------------------------------------

    def _parse_all_objects(self) -> None:
        data = self.data
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            try:
                obj, _end = parse_object(data, m.end())
            except Exception:
                continue  # truncated / garbage object: skip, keep the rest
            self.objects[num] = obj
        self._expand_object_streams()

    def _expand_object_streams(self) -> None:
        """Unpack /Type /ObjStm streams (ISO 32000 §7.5.7).

        Modern PDFs keep most indirect objects inside compressed object
        streams; the top-level scan only sees the container.  Layout:
        decoded stream = N pairs of ``objnum offset`` integers, then the
        object bodies starting at /First.  Direct (top-level) objects win
        on number conflicts.
        """
        containers = [
            obj for obj in list(self.objects.values())
            if isinstance(obj, PdfStream)
            and obj.dict.get("/Type") == PdfName("/ObjStm")
        ]
        for stream in containers:
            try:
                n = self.resolve(stream.dict.get("/N"))
                first = self.resolve(stream.dict.get("/First"))
                if not isinstance(n, int) or not isinstance(first, int):
                    continue
                body = self.stream_bytes(stream)
                header = body[:first].split()
                pairs = [
                    (int(header[2 * i]), int(header[2 * i + 1]))
                    for i in range(min(n, len(header) // 2))
                ]
                for objnum, offset in pairs:
                    if objnum in self.objects:
                        continue  # direct objects take precedence
                    try:
                        obj, _ = parse_object(body, first + offset)
                        self.objects[objnum] = obj
                    except Exception:
                        continue
            except (PdfError, ValueError, IndexError):
                continue

    # -- resolution ------------------------------------------------------

    def resolve(self, obj: Any, _depth: int = 0) -> Any:
        """Follow indirect references (bounded depth, missing → None)."""
        while isinstance(obj, PdfRef):
            if _depth > 32:
                raise PdfError("ref_cycle")
            obj = self.objects.get(obj.num)
            _depth += 1
        return obj

    def get(self, d: dict | None, key: str) -> Any:
        """dict lookup + resolve; tolerant of None dicts."""
        if not isinstance(d, dict):
            return None
        return self.resolve(d.get(key))

    # -- page tree -------------------------------------------------------

    def _collect_pages(self) -> list[dict[str, Any]]:
        root = self._find_root()
        pages: list[dict[str, Any]] = []
        if root is not None:
            tree = self.get(root, "/Pages")
            if isinstance(tree, dict):
                self._walk_pages(tree, pages, depth=0)
        if not pages:
            # Last-resort recovery: any object with /Type /Page, in object
            # number order (the scan analog of pdf_gui.py:251-451).
            for num in sorted(self.objects):
                obj = self.objects[num]
                if isinstance(obj, dict) and obj.get("/Type") == PdfName("/Page"):
                    pages.append(obj)
        return pages

    def _find_root(self) -> dict | None:
        # Prefer the trailer's /Root; fall back to scanning for a catalog.
        m = None
        for m in _TRAILER_RE.finditer(self.data):
            pass  # keep the LAST trailer (incremental updates)
        if m is not None:
            try:
                tdict, _ = parse_object(self.data, m.end())
                root = self.get(tdict, "/Root")
                if isinstance(root, dict):
                    return root
            except Exception:
                pass
        for num in sorted(self.objects):
            obj = self.objects[num]
            if isinstance(obj, dict) and obj.get("/Type") == PdfName("/Catalog"):
                return obj
        return None

    def _walk_pages(self, node: dict, out: list, depth: int) -> None:
        if depth > 64:
            return
        ntype = node.get("/Type")
        if ntype == PdfName("/Page"):
            out.append(node)
            return
        kids = self.get(node, "/Kids")
        if isinstance(kids, list):
            for kid in kids:
                kid = self.resolve(kid)
                if isinstance(kid, dict):
                    self._walk_pages(kid, out, depth + 1)

    # -- inherited attributes (pdf_gui.py:1515-1521) ---------------------

    def page_attr(self, page: dict, key: str) -> Any:
        """Page attribute with /Parent inheritance (Resources etc.)."""
        node: Any = page
        for _ in range(64):
            if not isinstance(node, dict):
                return None
            val = self.get(node, key)
            if val is not None:
                return val
            node = self.get(node, "/Parent")
            if node is None:
                return None
        return None

    # -- streams ---------------------------------------------------------

    def stream_bytes(self, stream: PdfStream) -> bytes:
        """Decode a stream's data (FlateDecode via zlib, else raw).

        Unknown filters raise PdfError('filter') — surfaced as a status,
        like the reference's swallowed per-item exceptions (api.py:266).
        """
        raw = stream.raw
        length = self.resolve(stream.dict.get("/Length"))
        if isinstance(length, int) and 0 <= length <= len(raw):
            raw = raw[:length] if length != len(raw) else raw
        filt = self.resolve(stream.dict.get("/Filter"))
        filters: list[Any]
        if filt is None:
            filters = []
        elif isinstance(filt, list):
            filters = [self.resolve(f) for f in filt]
        else:
            filters = [filt]
        for f in filters:
            name = str(f)
            if name in ("/FlateDecode", "/Fl"):
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    # Tolerate trailing garbage the way crawlers see it.
                    try:
                        d = zlib.decompressobj()
                        raw = d.decompress(raw)
                    except zlib.error:
                        raise PdfError("flate", str(e)) from e
            else:
                raise PdfError("filter", name)
        return raw

    # -- content (S3/S4: api.py:74-82 + pdf_gui.py:251-451 fallbacks) ----

    def page_content_bytes(self, page: dict) -> bytes:
        """Concatenated decoded /Contents bytes for a page.

        Array-of-streams concatenation per api.py:77-82; single stream per
        api.py:82; inherited lookup fallback per pdf_gui.py:1515-1521.
        Missing/broken content → b'' (caller records status), matching the
        reference's none-found fallthrough.
        """
        contents = self.get(page, "/Contents")
        if contents is None:
            contents = self.page_attr(page, "/Contents")
        if contents is None:
            return b""
        out = b""
        items = contents if isinstance(contents, list) else [contents]
        for item in items:
            item = self.resolve(item)
            if isinstance(item, PdfStream):
                try:
                    out += self.stream_bytes(item)
                except PdfError:
                    continue
        return out

    # -- fonts (api.py:46-70) --------------------------------------------

    def page_fonts(self, page: dict) -> dict[str, dict]:
        """``{'/F1': font_dict}`` from /Resources /Font (with inheritance)."""
        resources = self.page_attr(page, "/Resources")
        font_dict = self.get(resources, "/Font")
        fonts: dict[str, dict] = {}
        if isinstance(font_dict, dict):
            for name, ref in font_dict.items():
                font = self.resolve(ref)
                if isinstance(font, dict):
                    fonts[str(name)] = font
        return fonts

    def font_tounicode_bytes(self, font: dict) -> bytes | None:
        """Raw decoded /ToUnicode CMap bytes, or None."""
        tu = self.get(font, "/ToUnicode")
        if isinstance(tu, PdfStream):
            try:
                return self.stream_bytes(tu)
            except PdfError:
                return None
        return None

    def font_encoding_name(self, font: dict) -> str:
        """The /Encoding name if it is a bare name (api.py:62-65);
        defaults to /WinAnsiEncoding like the reference."""
        enc = self.get(font, "/Encoding")
        if isinstance(enc, PdfName):
            return str(enc)
        return "/WinAnsiEncoding"
