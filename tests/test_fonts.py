"""fonts.py: analysis semantics (M9-M12, G5) + the documented stub."""

import pandas as pd
import pytest

from pdf_parser_ray.fonts import (
    allocate_safe_code,
    font_encoding_mapping,
    is_safe_code,
    truetype_font_names,
    update_pdf_font_mapping,
    width_ratio_mean,
)
from pdf_parser_ray.minipdf import PdfDocument, build_pdf
from pdf_parser_ray.minipdf.objects import PdfName, parse_object
from pdf_parser_ray.replace import rule_columns
from pdf_parser_ray.search import font_for_text


def _doc():
    return PdfDocument(
        build_pdf([{"fonts": {"/F1": {"bfchars": {0x41: "A"}}},
                    "content": "BT /F1 12 Tf (A) Tj ET"}])
    )


class TestAnalysis:
    def test_truetype_detection_by_subtype(self):
        doc = _doc()
        fd, _ = parse_object(b"<< /Fx << /Subtype /TrueType >> /Fy << /Subtype /Type1 >> >>", 0)
        assert truetype_font_names(doc, fd) == ["/Fx"]

    def test_truetype_detection_by_fontfile2(self):
        doc = _doc()
        fd, _ = parse_object(
            b"<< /Fz << /Subtype /Type0 /FontDescriptor << /FontFile2 1 0 R >> >> >>", 0
        )
        assert truetype_font_names(doc, fd) == ["/Fz"]

    def test_differences_walk(self):
        doc = _doc()
        font, _ = parse_object(
            b"<< /Encoding << /Differences [ 65 /Alpha /Beta 100 /Delta ] >> >>", 0
        )
        assert font_encoding_mapping(doc, font) == {
            65: "/Alpha", 66: "/Beta", 100: "/Delta"
        }

    def test_bare_name_encoding_yields_empty(self):
        # the reference's standard-encoding branch is an unimplemented
        # TODO (analysis.py:48-50) — faithful empty result
        doc = _doc()
        font, _ = parse_object(b"<< /Encoding /WinAnsiEncoding >>", 0)
        assert font_encoding_mapping(doc, font) == {}

    def test_is_safe_code(self):
        for bad in (0x00, 0x1F, 0x20, 0x22, 0x27, 0x28, 0x29, 0x2C, 0x2E,
                    0x3A, 0x3B, 0x3F, 0x5B, 0x5D, 0x7B, 0x7D):
            assert not is_safe_code(bad)
        for ok in (0x21, 0x30, 0x41, 0x61, 0xB0, 0xFF):
            assert is_safe_code(ok)

    def test_allocate_safe_code_scan(self):
        code = allocate_safe_code(set(), set(), {})
        assert code == 0xB0
        code = allocate_safe_code({0xB0}, {0xB1}, {"/F1": {0xB2: "/g"}})
        assert code == 0xB3

    def test_allocate_extended_fallback(self):
        all_used = set(range(0xB0, 0x100))
        code = allocate_safe_code(all_used, set(), {}, existing_cmap_codes={0x00})
        assert code == 0x01  # 0x100 & 0xFF == 0x00 is taken → 0x101 & 0xFF

    def test_width_ratio_mean(self):
        assert width_ratio_mean({"a": 500}, {"a": 1000}) == pytest.approx(0.485)
        assert width_ratio_mean({"a": 1}, {"b": 1}) is None

    def test_update_font_mapping_stub(self):
        with pytest.raises(NotImplementedError):
            update_pdf_font_mapping()


class TestHelpers:
    def test_font_for_text(self):
        spans = [{"text": "hello world", "font": "/F1"},
                 {"text": "goodbye", "font": "/F2"}]
        assert font_for_text(spans, "world") == "/F1"
        assert font_for_text(spans, "goodbye") == "/F2"
        assert font_for_text(spans, "absent") is None

    def test_rule_columns(self):
        df = pd.DataFrame(
            [["alpha", "A1", "A2"], ["beta", "B1", None], [None, "x", "y"]]
        )
        cols = rule_columns(df)
        assert cols[1] == [("alpha", "A1"), ("beta", "B1")]
        assert cols[2] == [("alpha", "A2")]
