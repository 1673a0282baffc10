"""HTML table extraction: serial-kernel edge cases + generator↔parser
parity over the deterministic table corpus."""

import pandas as pd
import pytest

from pdf_parser_ray.html.tables import parse_tables


class TestParseTables:
    def test_basic_with_header(self):
        cells = parse_tables(
            "<table><tr><th>A</th><th>B</th></tr>"
            "<tr><td>1</td><td>2</td></tr></table>"
        )
        assert [(c["row_idx"], c["col_idx"], c["cell_text"], c["is_header"])
                for c in cells] == [
            (0, 0, "A", True), (0, 1, "B", True),
            (1, 0, "1", False), (1, 1, "2", False),
        ]

    def test_implicit_closures_and_case(self):
        # no </td>/</tr>; uppercase tags; a new <td>/<tr> closes the
        # previous one (HTML5 implied end tags)
        cells = parse_tables(
            "<TABLE><TR><TD>a<TD>b<TR><TD>c</TABLE>"
        )
        assert [(c["row_idx"], c["col_idx"], c["cell_text"])
                for c in cells] == [(0, 0, "a"), (0, 1, "b"), (1, 0, "c")]

    def test_nested_table_is_separate(self):
        cells = parse_tables(
            "<table><tr><td>outer"
            "<table><tr><td>inner</td></tr></table>"
            "</td></tr></table>"
        )
        by_table = {}
        for c in cells:
            by_table.setdefault(c["table_idx"], []).append(c["cell_text"])
        assert by_table == {0: ["outer"], 1: ["inner"]}

    def test_inline_markup_script_and_spans(self):
        cells = parse_tables(
            "<table><tr><td colspan='2' rowspan='3'> a <b>bold</b>\n"
            "  text <script>var t='<td>no</td>';</script></td></tr></table>"
        )
        assert len(cells) == 1
        c = cells[0]
        assert c["cell_text"] == "a bold text"
        assert (c["colspan"], c["rowspan"]) == (2, 3)

    def test_cell_outside_tr_and_unclosed_table(self):
        # td directly under table → implicit row; EOF closes the table
        cells = parse_tables("<table><td>x</td><td>y")
        assert [(c["row_idx"], c["col_idx"], c["cell_text"])
                for c in cells] == [(0, 0, "x"), (0, 1, "y")]

    def test_no_tables(self):
        assert parse_tables("<html><body><p>plain</p></body></html>") == []

    def test_entity_refs(self):
        cells = parse_tables("<table><tr><td>a &amp; b &lt;c&gt;</td></tr></table>")
        assert cells[0]["cell_text"] == "a & b <c>"


class TestExtractTablesCorpus:
    def test_generator_parser_parity(self, ray_session):
        import ray.data

        from pdf_parser_ray.corpus import ensure_table_corpus, make_table_cells
        from pdf_parser_ray.html.tables import extract_tables

        corpus = ensure_table_corpus(300, seed=11)
        out = extract_tables(ray.data.read_parquet(corpus)).to_pandas()

        # reconstruct every page's expected cells from the pure
        # generator function and compare cell-for-cell
        expect_rows = []
        for doc_id in range(300):
            url = f"https://tables.example.com/page/{doc_id:06d}"
            for t, table in enumerate(make_table_cells(doc_id, 11)):
                for r, row in enumerate(table):
                    for c, text in enumerate(row):
                        expect_rows.append((url, t, r, c, r == 0, text))
        expect = pd.DataFrame(
            expect_rows,
            columns=["url", "table_idx", "row_idx", "col_idx",
                     "is_header", "cell_text"],
        )
        got = (
            out[["url", "table_idx", "row_idx", "col_idx",
                 "is_header", "cell_text"]]
            .sort_values(["url", "table_idx", "row_idx", "col_idx"])
            .reset_index(drop=True)
        )
        expect = (
            expect.sort_values(["url", "table_idx", "row_idx", "col_idx"])
            .reset_index(drop=True)
        )
        got = got.astype({"table_idx": "int64", "row_idx": "int64",
                          "col_idx": "int64"})
        expect = expect.astype({"table_idx": "int64", "row_idx": "int64",
                                "col_idx": "int64"})
        pd.testing.assert_frame_equal(got, expect)
