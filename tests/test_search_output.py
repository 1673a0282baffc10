"""Search pipeline + grouped-output shapes + font report."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_parser_ray.minipdf import build_pdf
from pdf_parser_ray.output import (
    font_report,
    group_spans_array,
    group_spans_hierarchical,
    grouped_json_column,
)

IDENTITY = {"bfchars": {c: chr(c) for c in range(32, 127)}}


@pytest.fixture(scope="module")
def extracted(ray_session, tmp_path_factory):
    import ray.data

    from pdf_parser_ray.pipelines import extract_corpus

    d = tmp_path_factory.mktemp("sc")
    pdf = build_pdf(
        [{"fonts": {"/F1": IDENTITY},
          "content": "BT /F1 12 Tf 72 720 Td (alpha target beta) Tj"
                     " 0 -16 Td (no hit here) Tj 0 -16 Td (target again) Tj ET"}]
    )
    tbl = pa.table(
        {
            "url": ["u1", "u2"],
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
            "html": pa.array(
                [pdf, b"<html><body><article><p>plain html paragraph without "
                      b"the term, long enough to keep</p></article></body></html>"],
                pa.binary(),
            ),
            "text": ["", ""],
            "lang": ["en", "en"],
        }
    )
    pq.write_table(tbl, str(d / "c.parquet"))
    return extract_corpus(ray.data.read_parquet(str(d / "c.parquet")))


class TestSearch:
    def test_hits_with_context_and_order(self, extracted):
        from pdf_parser_ray.search import search_corpus

        hits = search_corpus(extracted, "target").take_all()
        assert len(hits) == 2
        by_ctx = {h["context"]: h for h in hits}
        assert "alpha target beta" in by_ctx and "target again" in by_ctx
        assert all(h["text"] == "target" for h in hits)
        assert all(h["url"] == "u1" for h in hits)
        orders = sorted(h["block_order"] for h in hits)
        assert orders[0] < orders[1]

    def test_case_insensitive_default(self, extracted):
        from pdf_parser_ray.search import search_corpus

        assert len(search_corpus(extracted, "TARGET").take_all()) == 2
        assert len(search_corpus(extracted, "TARGET", case_sensitive=True).take_all()) == 0

    def test_no_hits(self, extracted):
        from pdf_parser_ray.search import search_corpus

        assert search_corpus(extracted, "zzznope").count() == 0


class TestGrouped:
    def test_hierarchical_shape(self):
        spans = [
            {"text": "a", "x0": 1.0, "y0": 2.0, "x1": 3.0, "y1": 4.0,
             "font": "/F1", "encoded_hex": "61", "instance_index": 0, "page": 0},
            {"text": "b", "x0": None, "y0": None, "x1": None, "y1": None,
             "font": "/F1", "encoded_hex": "62", "instance_index": 0, "page": 0},
            {"text": "a", "x0": 5.0, "y0": 6.0, "x1": 7.0, "y1": 8.0,
             "font": "/F1", "encoded_hex": "61", "instance_index": 1, "page": 0},
        ]
        g = group_spans_hierarchical(spans)
        assert list(g.keys()) == ["a", "b"]  # insertion order
        assert len(g["a"]) == 2 and g["a"][1]["instance_index"] == 1
        assert g["b"][0]["rect"] is None

    def test_array_format_global_index(self):
        spans = [
            {"text": "a", "x0": None, "y0": None, "x1": None, "y1": None,
             "font": None, "encoded_hex": None, "instance_index": 0, "page": 0},
            {"text": "b", "x0": None, "y0": None, "x1": None, "y1": None,
             "font": None, "encoded_hex": None, "instance_index": 0, "page": 0},
            {"text": "a", "x0": None, "y0": None, "x1": None, "y1": None,
             "font": None, "encoded_hex": None, "instance_index": 1, "page": 0},
        ]
        arr = group_spans_array(spans)
        assert [e["text"] for e in arr] == ["a", "b"]
        assert [d["index"] for d in arr[0]["details"]] == [0, 2]  # pre-group order
        assert arr[0]["count"] == 2 and arr[1]["count"] == 1

    def test_grouped_json_column(self, extracted):
        rows = grouped_json_column(extracted).take_all()
        row = next(r for r in rows if r["url"] == "u1")
        g = json.loads(row["grouped_json"])
        assert "alpha target beta" in g


class TestFontReport:
    def test_font_report_rows(self, ray_session, tmp_path):
        import ray.data

        pdf = build_pdf(
            [{"fonts": {"/F1": {"bfchars": {0x41: "A", 0x42: "B"}}},
              "content": "BT /F1 12 Tf (AB) Tj ET"}]
        )
        tbl = pa.table({"url": ["u1"], "html": pa.array([pdf], pa.binary())})
        pq.write_table(tbl, str(tmp_path / "c.parquet"))
        out = font_report(ray.data.read_parquet(str(tmp_path / "c.parquet"))).take_all()
        got = {(r["font"], r["code"], r["char"], r["codepoint"]) for r in out}
        assert ("/F1", 0x41, "A", "U+0041") in got
        assert ("/F1", 0x42, "B", "U+0042") in got
