"""WARC/1.0 container: writer, streaming parser, Ray datasource + sink.

Pins the Common-Crawl conventions the module claims: per-record gzip
members (splittable archives), binary-safe Content-Length framing, HTTP
payload unwrapping, and byte-identical html per url through a full
Dataset write -> read round trip.
"""

import gzip
import io
import os

import pyarrow as pa
import pytest

from pdf_parser_ray.corpus import generate_corpus_table
from pdf_parser_ray.warc import (
    WarcError,
    build_record,
    format_warc_date,
    iter_warc_records,
    parse_warc_date,
    read_warc,
    split_http_payload,
    warc_to_corpus,
    write_warc_dataset,
    write_warc_file,
)


def _rows(n, start=0):
    t = generate_corpus_table(n, start=start)
    rows = t.to_pylist()
    for r in rows:
        ts = r["warc_ts"]
        r["warc_ts"] = int(ts.timestamp() * 1e6) if hasattr(ts, "timestamp") else ts
    return rows


class TestFraming:
    def test_roundtrip_gzip_byte_identical(self, tmp_path):
        rows = _rows(40)
        path = str(tmp_path / "a.warc.gz")
        assert write_warc_file(path, rows) == 40
        got = {}
        with open(path, "rb") as f:
            for h, p in iter_warc_records(f):
                if h["warc-type"] != "response":
                    continue
                status, hh, body = split_http_payload(p)
                assert status == 200
                got[h["warc-target-uri"]] = (body, parse_warc_date(h["warc-date"]))
        assert len(got) == 40
        for r in rows:
            body, ts = got[r["url"]]
            assert body == (r["html"] or b"")
            # writer emits second precision
            assert ts == (r["warc_ts"] // 1_000_000) * 1_000_000

    def test_roundtrip_plain(self, tmp_path):
        rows = _rows(6)
        path = str(tmp_path / "a.warc")
        write_warc_file(path, rows, compress=False)
        with open(path, "rb") as f:
            types = [h["warc-type"] for h, _ in iter_warc_records(f)]
        assert types == ["warcinfo"] + ["response"] * 6

    def test_multi_member_gzip_concat(self, tmp_path):
        a, b = _rows(5), _rows(5, start=5)
        pa_, pb = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
        write_warc_file(pa_, a)
        write_warc_file(pb, b, warcinfo=None)
        blob = open(pa_, "rb").read() + open(pb, "rb").read()
        n = sum(
            1
            for h, _ in iter_warc_records(io.BytesIO(blob))
            if h["warc-type"] == "response"
        )
        assert n == 10

    def test_binary_payload_with_crlf_crlf_survives(self):
        body = b"A\r\n\r\nB\x00\x1f\x8b\r\n\r\nC"
        rec = build_record(
            "response",
            {"WARC-Target-URI": "u", "WARC-Date": format_warc_date(0)},
            body,
        )
        (h, p), = list(iter_warc_records(io.BytesIO(rec)))
        assert p == body

    def test_folded_header_continuation(self):
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: http://a/\r\n"
            b"  continued-bit\r\n"
            b"Content-Length: 2\r\n"
            b"\r\nhi\r\n\r\n"
        )
        (h, p), = list(iter_warc_records(io.BytesIO(rec)))
        assert h["warc-target-uri"] == "http://a/ continued-bit"
        assert p == b"hi"

    def test_truncated_record_raises(self):
        rec = build_record("response", {"WARC-Date": format_warc_date(0)}, b"x" * 100)
        with pytest.raises(WarcError, match="truncated"):
            list(iter_warc_records(io.BytesIO(rec[:-60])))

    def test_non_warc_input_raises(self):
        with pytest.raises(WarcError, match="version line"):
            list(iter_warc_records(io.BytesIO(b"HTTP/1.1 200 OK\r\n\r\n")))

    def test_http_split_lenient_on_raw_body(self):
        status, hh, body = split_http_payload(b"just bytes")
        assert (status, hh, body) == (0, {}, b"just bytes")

    def test_warc_date_roundtrip(self):
        us = 1735689600_000_000
        assert parse_warc_date(format_warc_date(us)) == us
        # fractional seconds accepted on parse
        assert parse_warc_date("2025-01-01T00:00:00.500000Z") == us + 500_000


class TestRayDatasource:
    def test_read_warc_byte_identical(self, ray_session, tmp_path):
        rows = _rows(30)
        write_warc_file(str(tmp_path / "a.warc.gz"), rows[:15])
        write_warc_file(str(tmp_path / "b.warc.gz"), rows[15:])
        ds = read_warc(str(tmp_path))
        got = {r["url"]: r for r in ds.take_all()}
        assert len(got) == 30  # warcinfo records filtered out
        for r in rows:
            g = got[r["url"]]
            assert bytes(g["html"]) == (r["html"] or b"")
            assert g["http_status"] == 200
            assert g["record_type"] == "response"
        pdfs = [r for r in rows if (r["html"] or b"")[:5] == b"%PDF-"]
        if pdfs:
            assert got[pdfs[0]["url"]]["content_type"] == "application/pdf"

    def test_warc_to_corpus_schema(self, ray_session, tmp_path):
        rows = _rows(8)
        write_warc_file(str(tmp_path / "a.warc.gz"), rows)
        ds = warc_to_corpus(read_warc(str(tmp_path)))
        t = pa.Table.from_pylist(ds.take_all())
        assert set(t.column_names) == {"url", "warc_ts", "html", "text", "lang"}
        assert t.num_rows == 8

    def test_sink_manifest_and_resume_skip(self, ray_session, tmp_path):
        import ray.data

        rows = _rows(20)
        src = ray.data.from_arrow(
            pa.Table.from_pylist(rows)
        ).repartition(2)
        out = str(tmp_path / "out")
        m1 = write_warc_dataset(src, out).take_all()
        assert sum(r["n_records"] for r in m1) == 20
        files = sorted(os.listdir(out))
        mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
        # rerun: content-addressed names -> same files, skipped (not rewritten)
        m2 = write_warc_dataset(src, out).take_all()
        assert sorted(os.listdir(out)) == files
        assert {r["path"] for r in m1} == {r["path"] for r in m2}
        for f in files:
            assert os.path.getmtime(os.path.join(out, f)) == mtimes[f]
        # and the archives read back to the full corpus
        ds = read_warc(out)
        assert ds.count() == 20

    def test_extraction_over_warc_matches_direct(self, ray_session, tmp_path):
        """Flagship parity: extract over WARC-read corpus == extract over
        the parquet-style corpus table, byte-identical text per url."""
        import ray.data

        from pdf_parser_ray.pipelines import extract_corpus

        t = generate_corpus_table(24)
        write_warc_file(str(tmp_path / "a.warc.gz"), _rows(24))
        direct = {
            r["url"]: r["extracted_text"]
            for r in extract_corpus(
                ray.data.from_arrow(t), include_spans=False
            ).take_all()
        }
        via_warc = {
            r["url"]: r["extracted_text"]
            for r in extract_corpus(
                warc_to_corpus(read_warc(str(tmp_path))), include_spans=False
            ).take_all()
        }
        assert set(direct) == set(via_warc)
        diffs = {u for u in direct if direct[u] != via_warc[u]}
        # edge rows whose extraction falls back to the `text` column can
        # differ (WARC has no text column); everything else must match.
        for u in diffs:
            assert direct[u] != "" and via_warc[u] == "", u


class TestCdxWet:
    def test_surt_key_rules(self):
        from pdf_parser_ray.warc import surt_key

        assert surt_key("https://www.Example.org/A/b?z=1&a=2") == \
            "org,example)/a/b?a=2&z=1"
        assert surt_key("http://sub.host.com:80/") == "com,host,sub)/"
        assert surt_key("https://user@Host.io:443/P") == "io,host)/p"

    def test_gzip_member_offsets_random_access(self, tmp_path):
        from pdf_parser_ray.warc import fetch_record, iter_gzip_members

        rows = _rows(12)
        path = str(tmp_path / "a.warc.gz")
        write_warc_file(path, rows)
        with open(path, "rb") as f:
            members = [(o, n) for o, n, _ in iter_gzip_members(f)]
        assert len(members) == 13  # warcinfo + 12
        # spans tile the file exactly
        assert members[0][0] == 0
        for (o1, n1), (o2, _) in zip(members, members[1:]):
            assert o1 + n1 == o2
        assert members[-1][0] + members[-1][1] == os.path.getsize(path)
        by_url = {r["url"]: r for r in rows}
        for off, length in members[1:]:
            h, p = fetch_record(path, off, length)
            _, _, body = split_http_payload(p)
            assert body == (by_url[h["warc-target-uri"]]["html"] or b"")

    def test_cdx_index_dataset(self, ray_session, tmp_path):
        from pdf_parser_ray.warc import fetch_record, index_warc_files, surt_key

        rows = _rows(16)
        write_warc_file(str(tmp_path / "a.warc.gz"), rows[:8])
        write_warc_file(str(tmp_path / "b.warc.gz"), rows[8:])
        idx = index_warc_files(str(tmp_path)).take_all()
        resp = [r for r in idx if r["record_type"] == "response"]
        assert len(resp) == 16
        assert {r["url"] for r in resp} == {r["url"] for r in rows}
        for r in resp[:4]:
            assert r["urlkey"] == surt_key(r["url"])
            h, p = fetch_record(r["filename"], r["offset"], r["length"])
            assert h["warc-target-uri"] == r["url"]
        pdfs = [r for r in resp if r["mime"] == "application/pdf"]
        assert pdfs  # mime came from the HTTP headers

    def test_wet_dataset_roundtrip(self, ray_session, tmp_path):
        import ray.data

        from pdf_parser_ray.pipelines import extract_corpus
        from pdf_parser_ray.warc import read_wet, write_wet_dataset

        t = generate_corpus_table(16)
        extracted = extract_corpus(ray.data.from_arrow(t), include_spans=False)
        out = str(tmp_path / "wet")
        m = write_wet_dataset(extracted, out).take_all()
        assert sum(r["n_records"] for r in m) == 16
        back = {r["url"]: r["text"] for r in read_wet(out).take_all()}
        exp = {r["url"]: r["extracted_text"] for r in extracted.take_all()}
        assert back == exp
