"""minipdf writer→reader roundtrips + robustness."""

import pytest

from pdf_parser_ray.minipdf import PdfDocument, PdfError, build_pdf
from pdf_parser_ray.minipdf.objects import PdfName, PdfRef, PdfStream, parse_object

IDENTITY_SPEC = {"bfchars": {c: chr(c) for c in range(32, 127)}}


class TestObjects:
    def test_scalars(self):
        assert parse_object(b" 42 ", 0)[0] == 42
        assert parse_object(b"-3.5", 0)[0] == -3.5
        assert parse_object(b"true", 0)[0] is True
        assert parse_object(b"null", 0)[0] is None

    def test_name_with_hex_escape(self):
        assert parse_object(b"/A#20B", 0)[0] == PdfName("/A B")

    def test_ref_vs_number(self):
        obj, _ = parse_object(b"3 0 R", 0)
        assert obj == PdfRef(3, 0)
        obj, _ = parse_object(b"3 0 RG", 0)  # RG operator, not a ref
        assert obj == 3

    def test_literal_string_escapes(self):
        assert parse_object(rb"(a\(b\)c\\d\n\102)", 0)[0] == b"a(b)c\\d\nB"

    def test_nested_parens(self):
        assert parse_object(b"(a(b)c)", 0)[0] == b"a(b)c"

    def test_hex_string(self):
        assert parse_object(b"<48 65 6C6C6F>", 0)[0] == b"Hello"
        assert parse_object(b"<486>", 0)[0] == b"H`"  # odd digit → pad 0

    def test_array_and_dict(self):
        arr, _ = parse_object(b"[1 /N (s) [2 3]]", 0)
        assert arr == [1, PdfName("/N"), b"s", [2, 3]]
        d, _ = parse_object(b"<< /A 1 /B << /C 2 0 R >> >>", 0)
        assert d["/A"] == 1 and d["/B"]["/C"] == PdfRef(2, 0)

    def test_stream_with_length(self):
        obj, _ = parse_object(b"<< /Length 5 >>\nstream\nabcde\nendstream", 0)
        assert isinstance(obj, PdfStream) and obj.raw == b"abcde"

    def test_stream_bad_length_falls_back_to_endstream_scan(self):
        obj, _ = parse_object(b"<< /Length 9999 >>\nstream\nabcde\nendstream", 0)
        assert obj.raw == b"abcde"


class TestDocument:
    def test_roundtrip_single_page(self):
        pdf = build_pdf([{"fonts": {"/F1": IDENTITY_SPEC},
                          "content": "BT /F1 12 Tf (Hi) Tj ET"}])
        doc = PdfDocument(pdf)
        assert len(doc.pages) == 1
        assert b"(Hi) Tj" in doc.page_content_bytes(doc.pages[0])
        fonts = doc.page_fonts(doc.pages[0])
        assert "/F1" in fonts
        tu = doc.font_tounicode_bytes(fonts["/F1"])
        assert b"beginbfchar" in tu

    def test_compressed_streams(self):
        pdf = build_pdf([{"fonts": {"/F1": IDENTITY_SPEC},
                          "content": "BT /F1 12 Tf (Zip) Tj ET"}], compress=True)
        assert b"FlateDecode" in pdf
        doc = PdfDocument(pdf)
        assert b"(Zip) Tj" in doc.page_content_bytes(doc.pages[0])

    def test_contents_array_concatenated(self):
        pdf = build_pdf([{"fonts": {"/F1": IDENTITY_SPEC},
                          "contents_list": ["BT /F1 12 Tf (He", "llo) Tj ET"]}])
        doc = PdfDocument(pdf)
        assert b"(Hello) Tj" in doc.page_content_bytes(doc.pages[0])

    def test_multipage_order(self):
        pdf = build_pdf(
            [{"fonts": {"/F1": IDENTITY_SPEC}, "content": f"BT /F1 12 Tf (p{i}) Tj ET"}
             for i in range(3)]
        )
        doc = PdfDocument(pdf)
        assert [doc.page_content_bytes(p) for p in doc.pages] == [
            f"BT /F1 12 Tf (p{i}) Tj ET".encode() for i in range(3)
        ]

    def test_not_pdf_and_truncated(self):
        with pytest.raises(PdfError) as e:
            PdfDocument(b"<html></html>")
        assert e.value.kind == "not_pdf"
        with pytest.raises(PdfError) as e:
            PdfDocument(b"%PDF-1.4\n1 0 obj\n<< /Type /Cat")
        assert e.value.kind == "no_objects"

    def test_broken_xref_still_finds_pages(self):
        pdf = build_pdf([{"fonts": {"/F1": IDENTITY_SPEC},
                          "content": "BT /F1 12 Tf (x) Tj ET"}])
        # Corrupt the xref offsets entirely; the object scan must survive.
        broken = pdf.replace(b"xref", b"xref-broken", 1)
        doc = PdfDocument(broken)
        assert len(doc.pages) == 1

    def test_missing_trailer_falls_back_to_catalog_scan(self):
        pdf = build_pdf([{"fonts": {"/F1": IDENTITY_SPEC},
                          "content": "BT /F1 12 Tf (x) Tj ET"}])
        cut = pdf[: pdf.rindex(b"trailer")]
        doc = PdfDocument(cut)
        assert len(doc.pages) == 1

    def test_winansi_font_encoding_name(self):
        pdf = build_pdf([{"fonts": {"/F1": {"no_tounicode": True,
                                            "encoding": "/MacRomanEncoding"}},
                          "content": "BT /F1 12 Tf (x) Tj ET"}])
        doc = PdfDocument(pdf)
        fonts = doc.page_fonts(doc.pages[0])
        assert doc.font_tounicode_bytes(fonts["/F1"]) is None
        assert doc.font_encoding_name(fonts["/F1"]) == "/MacRomanEncoding"
