"""Replace pipeline: rewrite semantics, instance gating, char support,
round-trip through minipdf serialization."""

from pdf_parser_ray.extract import extract_document
from pdf_parser_ray.minipdf import build_pdf
from pdf_parser_ray.replace import (
    build_char_inventory,
    replace_text_in_pdf,
    rewrite_content,
)

IDENTITY = {"bfchars": {c: chr(c) for c in range(32, 127)}}
IDENTITY_CMAPS = {"/F1": {bytes([c]): chr(c) for c in range(32, 127)}}


def one_page(content, fonts=None, **kw):
    return build_pdf([{"fonts": fonts or {"/F1": IDENTITY}, "content": content}], **kw)


def full_inventory():
    # every printable ASCII char observed at its own code
    return {"/F1": {chr(c): {c} for c in range(32, 127)}}


class TestRewrite:
    def test_basic_replace(self):
        new, n = rewrite_content(
            "BT /F1 12 Tf (Hello) Tj ET", IDENTITY_CMAPS, full_inventory(),
            "Hello", "World",
        )
        assert n == 1 and "(World) Tj" in new and "Hello" not in new

    def test_non_matching_segments_verbatim(self):
        src = "BT /F1 12 Tf 1 0 0 1 7 9 Tm (keep) Tj (Hello) Tj 0 5 Td (keep) Tj ET"
        new, n = rewrite_content(src, IDENTITY_CMAPS, full_inventory(), "Hello", "Bye")
        assert n == 1
        assert new == src.replace("(Hello)", "(Bye)")

    def test_exact_equality_no_strip(self):
        # Replace path compares decoded == target WITHOUT strip
        # (replacer.py:491) — ' Hello ' does not match 'Hello'.
        new, n = rewrite_content(
            "BT /F1 12 Tf ( Hello ) Tj ET", IDENTITY_CMAPS, full_inventory(),
            "Hello", "World",
        )
        assert n == 0

    def test_instance_gating(self):
        src = "BT /F1 12 Tf (x) Tj (x) Tj (x) Tj ET"
        new, n = rewrite_content(src, IDENTITY_CMAPS, full_inventory(), "x", "y", 1)
        assert n == 1
        assert new == "BT /F1 12 Tf (x) Tj (y) Tj (x) Tj ET"

    def test_unsupported_char_preserves_segment(self):
        inv = {"/F1": {"H": {0x48}, "e": {0x65}, "l": {0x6C}, "o": {0x6F}}}
        new, n = rewrite_content(
            "BT /F1 12 Tf (Hello) Tj ET", IDENTITY_CMAPS, inv, "Hello", "Bye"
        )
        assert n == 0 and "(Hello) Tj" in new

    def test_replacement_escaped(self):
        new, n = rewrite_content(
            "BT /F1 12 Tf (abc) Tj ET", IDENTITY_CMAPS, full_inventory(),
            "abc", "a(b)c",
        )
        assert n == 1 and r"(a\(b\)c) Tj" in new

    def test_tj_array_splice_form(self):
        # escaped-paren TJ arrays decode via strip-all-backslashes
        src = r"BT /F1 12 Tf [\(ab\)] TJ ET"
        new, n = rewrite_content(src, IDENTITY_CMAPS, full_inventory(), "(ab)", "xy")
        assert n == 1 and "[(xy)] TJ" in new


class TestInventory:
    def test_inventory_collects_doc_wide(self):
        pdf = build_pdf(
            [
                {"fonts": {"/F1": IDENTITY}, "content": "BT /F1 12 Tf (abc) Tj ET"},
                {"fonts": {"/F1": IDENTITY}, "content": "BT /F1 12 Tf (xyz) Tj ET"},
            ]
        )
        from pdf_parser_ray.minipdf import PdfDocument

        inv = build_char_inventory(PdfDocument(pdf))
        assert set(inv["/F1"]) == set("abcxyz")
        assert inv["/F1"]["a"] == {0x61}


class TestEndToEnd:
    def test_replace_and_reextract(self):
        pdf = one_page("BT /F1 12 Tf 72 720 Td (Hello) Tj 0 -16 Td (World) Tj ET")
        res = replace_text_in_pdf(pdf, "Hello", "World")
        assert res["status"] == "ok" and res["n_replaced"] == 1
        r = extract_document("u", res["html"])
        assert r["status"] == "ok"
        assert r["extracted_text"] == "World\nWorld"

    def test_replace_compressed_source(self):
        # Replacement may only use chars OBSERVED in the doc's font
        # (replacer.py:546-560) — "Zip pie" reuses Z,i,p,e,space.
        pdf = one_page("BT /F1 12 Tf 10 10 Td (Zip me) Tj ET", compress=True)
        res = replace_text_in_pdf(pdf, "Zip me", "Zip pie")
        assert res["status"] == "ok"
        assert extract_document("u", res["html"])["extracted_text"] == "Zip pie"

    def test_no_match_returns_original(self):
        pdf = one_page("BT /F1 12 Tf (abc) Tj ET")
        res = replace_text_in_pdf(pdf, "zzz", "yyy")
        assert res["status"] == "no_match" and res["html"] == pdf

    def test_same_text_guard(self):
        pdf = one_page("BT /F1 12 Tf (abc) Tj ET")
        assert replace_text_in_pdf(pdf, "a", "a")["status"] == "error:same_text"

    def test_page_range_guard(self):
        pdf = one_page("BT /F1 12 Tf (abc) Tj ET")
        assert replace_text_in_pdf(pdf, "abc", "x", page_num=5)["status"] == "error:page_range"

    def test_unsupported_replacement_chars_rejected(self):
        # 'Q' never appears in the document → not in the font inventory.
        pdf = one_page("BT /F1 12 Tf (abc) Tj ET")
        res = replace_text_in_pdf(pdf, "abc", "Q")
        assert res["status"] == "no_match" and res["html"] == pdf


class TestLogging:
    def test_log_lines_collected(self):
        pdf = one_page("BT /F1 12 Tf 72 720 Td (hello world) Tj ET")
        log = []
        r = replace_text_in_pdf(pdf, "hello world", "world hello", log=log)
        assert r["status"] == "ok"
        assert log and log[0].startswith("INFO: replaced 1")
        log2 = []
        replace_text_in_pdf(pdf, "nope", "x", log=log2)
        assert log2 and log2[0].startswith("WARNING: no matching")

    def test_auto_insert_guarded(self):
        import pytest as _pytest

        pdf = one_page("BT /F1 12 Tf (a) Tj ET")
        with _pytest.raises(NotImplementedError):
            replace_text_in_pdf(pdf, "a", "b", allow_auto_insert=True)

    def test_verbosity_gates_log_column(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from pdf_parser_ray.replace import replace_corpus

        pdf = one_page("BT /F1 12 Tf 72 720 Td (alpha beta) Tj ET")
        tbl = pa.table({"url": ["u1"], "html": pa.array([pdf], pa.binary())})
        pq.write_table(tbl, str(tmp_path / "c.parquet"))
        ds = ray.data.read_parquet(str(tmp_path / "c.parquet"))
        silent = replace_corpus(ds, [("zzz", "yyy")], verbosity=0).take_all()[0]
        assert silent["log"] == ""
        warn = replace_corpus(ds, [("zzz", "yyy")], verbosity=1).take_all()[0]
        assert warn["log"].startswith("WARNING")
        full = replace_corpus(ds, [("alpha beta", "beta alpha")], verbosity=2).take_all()[0]
        assert "INFO" in full["log"]


class TestRayStage:
    def test_replace_corpus(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from pdf_parser_ray.replace import replace_corpus

        pdf = one_page("BT /F1 12 Tf 72 720 Td (alpha beta) Tj ET")
        tbl = pa.table(
            {
                "url": ["u1", "u2"],
                "html": pa.array([pdf, b"<html><p>nope</p></html>"], pa.binary()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "c.parquet"))
        ds = ray.data.read_parquet(str(tmp_path / "c.parquet"))
        out = {r["url"]: r for r in
               replace_corpus(ds, [("alpha beta", "beta alpha")]).take_all()}
        assert out["u1"]["replace_status"] == "ok" and out["u1"]["n_replaced"] == 1
        assert out["u2"]["replace_status"] == "skip:not_pdf"
        assert extract_document("u1", out["u1"]["html"])["extracted_text"] == "beta alpha"


def _write_xlsx(path, sheets):
    """Hand-build a minimal OOXML workbook: sheets = list of row-lists;
    strings alternate between shared-string and inline-string encoding
    to exercise both paths."""
    import zipfile

    shared: list[str] = []

    def cell_xml(ref, v, inline):
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, str):
            if inline:
                return (f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>')
            if v not in shared:
                shared.append(v)
            return f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    def sheet_xml(rows):
        body = []
        for ri, row in enumerate(rows):
            cells = "".join(
                cell_xml(f"{chr(65 + ci)}{ri + 1}", v, inline=(ci + ri) % 2)
                for ci, v in enumerate(row)
            )
            body.append(f'<row r="{ri + 1}">{cells}</row>')
        return (
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(body) + "</sheetData></worksheet>"
        )

    sheet_parts = [sheet_xml(rows) for rows in sheets]
    sst = (
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared) + "</sst>"
    )
    wb_sheets = "".join(
        f'<sheet name="S{i}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i in range(len(sheets))
    )
    workbook = (
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, xml in enumerate(sheet_parts):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)


class TestXlsxReader:
    def test_reads_strings_numbers_and_gaps(self, tmp_path):
        from pdf_parser_ray.xlsx import read_xlsx

        p = str(tmp_path / "rules.xlsx")
        _write_xlsx(p, [[
            ["alpha", "ALPHA", "αλφα"],
            ["beta", None, "βήτα"],
            [42, 2.5, True],
        ]])
        df = read_xlsx(p)
        assert df.shape == (3, 3)
        assert df.iloc[0].tolist() == ["alpha", "ALPHA", "αλφα"]
        assert df.iloc[1, 1] is None
        assert df.iloc[2].tolist() == [42, 2.5, True]

    def test_sheet_selection(self, tmp_path):
        from pdf_parser_ray.xlsx import read_xlsx

        p = str(tmp_path / "two.xlsx")
        _write_xlsx(p, [[["first"]], [["second"]]])
        assert read_xlsx(p, sheet=0).iloc[0, 0] == "first"
        assert read_xlsx(p, sheet=1).iloc[0, 0] == "second"

    def test_matches_csv_route_through_rule_columns(self, tmp_path):
        import pandas as pd

        from pdf_parser_ray.replace import load_rules, rule_columns

        rows = [["foo", "FOO", "f00"], ["bar", "BAR", "b4r"]]
        px = str(tmp_path / "r.xlsx")
        _write_xlsx(px, [rows])
        pc = str(tmp_path / "r.csv")
        pd.DataFrame(rows).to_csv(pc, index=False, header=False)
        rx = rule_columns(load_rules(px))
        rc = rule_columns(load_rules(pc))
        assert rx == rc
        assert rx[1] == [("foo", "FOO"), ("bar", "BAR")]
        assert rx[2] == [("foo", "f00"), ("bar", "b4r")]

    def test_unsupported_suffix_raises(self, tmp_path):
        import pytest

        from pdf_parser_ray.replace import load_rules

        with pytest.raises(ValueError):
            load_rules(str(tmp_path / "rules.txt"))
