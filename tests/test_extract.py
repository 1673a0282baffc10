"""Document-level extraction: FIXTURES.md §2 families F1-F15 + routing."""

from pdf_parser_ray.extract import extract_document, sniff_kind
from pdf_parser_ray.minipdf import build_pdf

IDENTITY = {"bfchars": {c: chr(c) for c in range(32, 127)}}


def pdf_one_page(content, fonts=None, **kw):
    return build_pdf([{"fonts": fonts or {"/F1": IDENTITY}, "content": content}], **kw)


class TestPdfFamilies:
    def test_f1_simple_tj(self):
        r = extract_document("u", pdf_one_page("BT /F1 12 Tf 72 720 Td (Hello) Tj ET"))
        assert r["status"] == "ok"
        assert r["extracted_text"] == "Hello"
        s = r["spans"][0]
        assert s["font"] == "/F1" and s["encoded_hex"] == b"Hello".hex()
        assert (s["x0"], s["y0"]) == (72.0, 720.0)
        assert s["x1"] == 72.0 + 8 * 5 and s["y1"] == 720.0 + 14.4
        assert (s["offset_start"], s["offset_end"]) == (0, 5)

    def test_f2_bfrange_nonidentity(self):
        fonts = {"/F1": {"bfranges": [(0x41, 0x5A, 0x0061)]}}
        r = extract_document("u", pdf_one_page("BT /F1 12 Tf 10 10 Td (ABC) Tj ET", fonts))
        assert r["extracted_text"] == "abc"

    def test_f3_tj_kerning_array_dropped_unescaped(self):
        # Reference regex cannot match TJ arrays with unescaped parens;
        # document falls back (no spans at all).
        r = extract_document(
            "u", pdf_one_page("BT /F1 12 Tf 10 10 Td [(Hel) -20 (lo)] TJ ET"),
            fallback_text="plain",
        )
        assert r["status"] == "fallback"
        assert r["extracted_text"] == "plain"

    def test_f4_escapes(self):
        r = extract_document(
            "u", pdf_one_page(r"BT /F1 12 Tf 10 10 Td (a\(b\)c\\d) Tj ET")
        )
        assert r["extracted_text"] == "a(b)c\\d"

    def test_f5_winansi_no_tounicode(self):
        fonts = {"/F1": {"no_tounicode": True, "encoding": "/WinAnsiEncoding"}}
        r = extract_document("u", pdf_one_page("BT /F1 12 Tf 10 10 Td (Win) Tj ET", fonts))
        assert r["extracted_text"] == "Win"

    def test_f6_unmapped_byte_question_mark(self):
        fonts = {"/F1": {"bfchars": {0x41: "A"}}}
        r = extract_document("u", pdf_one_page("BT /F1 12 Tf 10 10 Td (AB) Tj ET", fonts))
        assert r["extracted_text"] == "A?"

    def test_f7_multi_font_state_machine(self):
        fonts = {
            "/F1": {"bfchars": {0x41: "x"}},
            "/F2": {"bfchars": {0x41: "y"}},
        }
        r = extract_document(
            "u",
            pdf_one_page("BT /F1 12 Tf 10 10 Td (A) Tj /F2 9 Tf 0 -16 Td (A) Tj ET", fonts),
        )
        assert r["extracted_text"] == "x\ny"

    def test_f8_duplicate_text_instance_indexing(self):
        content = "BT /F1 12 Tf 72 720 Td (dup) Tj 0 -16 Td (dup) Tj 0 -16 Td (dup) Tj ET"
        r = extract_document("u", pdf_one_page(content))
        assert [s["instance_index"] for s in r["spans"]] == [0, 1, 2]
        # Forward-only claiming: each instance gets its own Td position.
        assert [s["y0"] for s in r["spans"]] == [720.0, 704.0, 688.0]

    def test_f8b_same_position_duplicates_collapse_via_nested_box(self):
        # Two identical shows at one position: 2nd claims no new rect,
        # reuses rect[0]; equal rects satisfy containment → one span out.
        content = "BT /F1 12 Tf 72 720 Td (dup) Tj (dup) Tj ET"
        r = extract_document("u", pdf_one_page(content))
        assert r["extracted_text"] == "dup"
        assert len(r["spans"]) == 1 and r["spans"][0]["instance_index"] == 0

    def test_f9_nested_box_filter_and_area_order(self):
        # Shorter text at the same pen position → rect contained in the
        # longer one's rect → dropped; output order is area-desc.
        content = "BT /F1 12 Tf 72 720 Td (tiny) Tj (longer text here) Tj ET"
        r = extract_document("u", pdf_one_page(content))
        assert r["extracted_text"] == "longer text here"

    def test_f9b_area_desc_output_order(self):
        # Non-overlapping rects, bigger area LAST in stream → FIRST in output.
        content = "BT /F1 12 Tf 72 720 Td (ab) Tj 200 0 Td (a much longer line) Tj ET"
        r = extract_document("u", pdf_one_page(content))
        assert r["extracted_text"] == "a much longer line\nab"
        offs = [(s["offset_start"], s["offset_end"]) for s in r["spans"]]
        assert offs == [(0, 18), (19, 21)]

    def test_f10_contents_array_token_split(self):
        pdf = build_pdf(
            [{"fonts": {"/F1": IDENTITY},
              "contents_list": ["BT /F1 12 Tf 10 10 Td (Hel", "lo) Tj ET"]}]
        )
        r = extract_document("u", pdf)
        assert r["extracted_text"] == "Hello"

    def test_f11_td_positions_ghost_filter(self):
        # No Td before the show → position (0,0) → ghost → rect None.
        r = extract_document("u", pdf_one_page("BT /F1 12 Tf (ghost) Tj ET"))
        assert r["extracted_text"] == "ghost"
        assert r["spans"][0]["x0"] is None

    def test_f12_no_text_page_falls_back(self):
        r = extract_document(
            "u", pdf_one_page("0 0 100 100 re f"), fallback_text="line1\n\n line2 "
        )
        assert r["status"] == "fallback"
        assert r["extracted_text"] == "line1\nline2"
        assert [s["instance_index"] for s in r["spans"]] == [0, 0]

    def test_f13_cid_two_byte_codes_skipped(self):
        fonts = {"/F1": {"bfchars": {0x41: "A"}, "bfranges": [(0x0100, 0x0105, 0x4E00)]}}
        r = extract_document("u", pdf_one_page("BT /F1 12 Tf 10 10 Td (A\x01) Tj ET", fonts))
        assert r["extracted_text"] == "A?"

    def test_f14_multipage_scoping(self):
        pdf = build_pdf(
            [
                {"fonts": {"/F1": IDENTITY},
                 "content": "BT /F1 12 Tf 72 720 Td (same) Tj ET"},
                {"fonts": {"/F1": IDENTITY},
                 "content": "BT /F1 12 Tf 72 720 Td (same) Tj ET"},
            ]
        )
        r = extract_document("u", pdf)
        assert r["extracted_text"] == "same\nsame"
        # instance counting is page-scoped (reference: per-page parse calls)
        assert [s["instance_index"] for s in r["spans"]] == [0, 0]
        assert [s["page"] for s in r["spans"]] == [0, 1]
        assert [(s["offset_start"], s["offset_end"]) for s in r["spans"]] == [
            (0, 4), (5, 9)
        ]

    def test_f15_compressed(self):
        pdf = pdf_one_page("BT /F1 12 Tf 10 10 Td (Zipped) Tj ET", compress=True)
        r = extract_document("u", pdf)
        assert r["extracted_text"] == "Zipped"


class TestRouting:
    def test_sniff(self):
        assert sniff_kind(b"%PDF-1.4 x") == "pdf"
        assert sniff_kind(b"  <html><body>") == "html"
        assert sniff_kind(b"<!DOCTYPE html><p>x</p>") == "html"
        assert sniff_kind(b"") == "empty"
        assert sniff_kind(b"just some text") == "text"

    def test_empty_payload_uses_fallback_text(self):
        r = extract_document("u", b"", fallback_text="a\nb")
        assert r["kind"] == "empty" and r["status"] == "fallback"
        assert r["extracted_text"] == "a\nb"

    def test_empty_payload_no_fallback(self):
        r = extract_document("u", b"")
        assert r["status"] == "empty" and r["extracted_text"] == ""

    def test_plain_text_payload(self):
        r = extract_document("u", b"hello\nworld")
        assert r["kind"] == "text" and r["extracted_text"] == "hello\nworld"

    def test_truncated_pdf_error_status_with_fallback(self):
        r = extract_document("u", b"%PDF-1.4\n1 0 obj\n<< /Type /Cat", fallback_text="t")
        assert r["status"] == "error:no_objects"
        assert r["extracted_text"] == "t"

    def test_never_raises_on_garbage(self):
        for payload in [b"%PDF-", b"\x00" * 64, b"%PDF-1.4\nxref\n%%EOF", b"<"]:
            r = extract_document("u", payload)
            assert isinstance(r["status"], str)
