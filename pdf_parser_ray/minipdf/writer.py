"""Minimal PDF writer — fixture/corpus construction + replace-pipeline output.

Produces small, spec-valid PDFs (header, objects, xref, trailer) from a
declarative page description.  Used by:

* the synthetic corpus generator (:mod:`pdf_parser_ray.corpus`) — builds
  deterministic PDF payloads exercising every tokenizer/CMap behavior in
  FIXTURES.md §2 (families F1-F15);
* unit tests;
* the replace pipeline (rewriting /Contents — reference
  replacer.py:824-827 swaps the stream and saves; we re-serialize).
"""

from __future__ import annotations

import zlib


def _tounicode_stream(bfchars: dict[int, str] | None = None,
                      bfranges: list[tuple[int, int, int]] | None = None) -> bytes:
    """Build a ToUnicode CMap stream body.

    ``bfchars``: {code: unicode_char}; ``bfranges``: [(start, end, target)].
    """
    lines = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def",
        "/CMapName /Adobe-Identity-UCS def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<00> <FF>",
        "endcodespacerange",
    ]
    if bfranges:
        lines.append(f"{len(bfranges)} beginbfrange")
        for start, end, target in bfranges:
            lines.append(f"<{start:02X}> <{end:02X}> <{target:04X}>")
        lines.append("endbfrange")
    if bfchars:
        lines.append(f"{len(bfchars)} beginbfchar")
        for code, ch in sorted(bfchars.items()):
            lines.append(f"<{code:02X}> <{ord(ch):04X}>")
        lines.append("endbfchar")
    lines += ["endcmap", "CMapName currentdict /CMap defineresource pop", "end", "end"]
    return "\n".join(lines).encode("latin1")


class PdfBuilder:
    """Assemble a PDF from numbered objects, then serialize with xref."""

    def __init__(self) -> None:
        self.objects: list[bytes] = []  # body of object i+1

    def add(self, body: bytes) -> int:
        """Add an object body (without 'N 0 obj'/'endobj'); returns obj num."""
        self.objects.append(body)
        return len(self.objects)

    def add_stream(self, data: bytes, extra_dict: str = "", compress: bool = False) -> int:
        if compress:
            data = zlib.compress(data)
            extra_dict += " /Filter /FlateDecode"
        head = f"<< /Length {len(data)}{extra_dict} >>".encode("latin1")
        return self.add(head + b"\nstream\n" + data + b"\nendstream")

    def serialize(self, root_num: int) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, body in enumerate(self.objects, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode("latin1") + body + b"\nendobj\n"
        xref_pos = len(out)
        n = len(self.objects) + 1
        out += f"xref\n0 {n}\n".encode("latin1")
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode("latin1")
        out += (
            f"trailer\n<< /Size {n} /Root {root_num} 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n"
        ).encode("latin1")
        return bytes(out)


def build_pdf(
    pages: list[dict],
    compress: bool = False,
) -> bytes:
    """Build a multi-page PDF.

    Each page dict:
      ``content``: bytes | str — the content stream (str encoded latin1), or
      ``contents_list``: list[bytes] — split into an array of streams;
      ``fonts``: {'/F1': font_spec} where font_spec is a dict with optional
          ``bfchars`` {code: char}, ``bfranges`` [(s,e,t)],
          ``encoding`` ('/WinAnsiEncoding'...), ``no_tounicode`` bool.
    """
    b = PdfBuilder()
    catalog_num = 1
    pages_num = 2
    b.add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode("latin1"))
    pages_placeholder = b.add(b"PLACEHOLDER")  # patched below

    page_nums: list[int] = []
    for page in pages:
        # Fonts
        font_entries = []
        for fname, spec in (page.get("fonts") or {}).items():
            spec = spec or {}
            font_dict = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            if not spec.get("no_tounicode"):
                tu = _tounicode_stream(spec.get("bfchars"), spec.get("bfranges"))
                tu_num = b.add_stream(tu, compress=compress)
                font_dict += f" /ToUnicode {tu_num} 0 R"
            if spec.get("encoding"):
                font_dict += f" /Encoding {spec['encoding']}"
            font_dict += " >>"
            fnum = b.add(font_dict.encode("latin1"))
            font_entries.append(f"{fname} {fnum} 0 R")

        # Content stream(s)
        if "contents_list" in page:
            snums = [b.add_stream(c if isinstance(c, bytes) else c.encode("latin1"),
                                  compress=compress)
                     for c in page["contents_list"]]
            contents_ref = "[" + " ".join(f"{n} 0 R" for n in snums) + "]"
        else:
            content = page.get("content", b"")
            if isinstance(content, str):
                content = content.encode("latin1")
            snum = b.add_stream(content, compress=compress)
            contents_ref = f"{snum} 0 R"

        res = f"<< /Font << {' '.join(font_entries)} >> >>" if font_entries else "<< >>"
        pnum = b.add(
            (
                f"<< /Type /Page /Parent {pages_num} 0 R "
                f"/MediaBox [0 0 612 792] /Resources {res} "
                f"/Contents {contents_ref} >>"
            ).encode("latin1")
        )
        page_nums.append(pnum)

    kids = "[" + " ".join(f"{n} 0 R" for n in page_nums) + "]"
    b.objects[pages_placeholder - 1] = (
        f"<< /Type /Pages /Kids {kids} /Count {len(page_nums)} >>".encode("latin1")
    )
    return b.serialize(catalog_num)
