"""WAT-style link extraction: serial kernel semantics, distributed
parity, and a DuckDB regexp twin over the deterministic link corpus."""

import duckdb
import pandas as pd
import pytest

from pdf_parser_ray.corpus import ensure_link_corpus, make_link_document
from pdf_parser_ray.html.links import (
    extract_links,
    extract_links_batch,
    host_link_graph,
    parse_links,
)
from pdf_parser_ray.pipelines import read_corpus

URL = "https://example.com/a/b/page.html"


def hrefs(payload: bytes, url: str = URL):
    return [r["href"] for r in parse_links(url, payload)]


# ------------------------------------------------------------- kernel

def test_basic_extraction_and_resolution():
    recs = parse_links(
        URL,
        b'<a href="/root">one</a> <a href="rel.html">two</a> '
        b'<a href="https://other.net/x">three</a>',
    )
    assert [r["target"] for r in recs] == [
        "https://example.com/root",
        "https://example.com/a/b/rel.html",
        "https://other.net/x",
    ]
    assert [r["is_internal"] for r in recs] == [True, True, False]
    assert [r["link_no"] for r in recs] == [0, 1, 2]
    assert [r["anchor"] for r in recs] == ["one", "two", "three"]


def test_base_href_wins():
    recs = parse_links(
        URL, b'<base href="https://cdn.example.org/lib/"><a href="x.js">x</a>'
    )
    assert recs[0]["target"] == "https://cdn.example.org/lib/x.js"
    assert recs[0]["dst_host"] == "cdn.example.org"
    assert not recs[0]["is_internal"]


def test_skipped_schemes_and_fragments():
    assert (
        hrefs(
            b'<a href="javascript:void(0)">j</a><a href="MAILTO:a@b.c">m</a>'
            b'<a href="#top">f</a><a href="tel:123">t</a><a href="">e</a>'
            b'<a href="/ok">k</a>'
        )
        == ["/ok"]
    )


def test_entities_quotes_and_unclosed_tags():
    # single quotes, entity-encoded ampersand in href, unclosed <a>
    recs = parse_links(
        URL,
        b"<a href='/q?a=1&amp;b=2'>q <b>bold</b> text<p><a href=\"/two\">2",
    )
    assert [r["href"] for r in recs] == ["/q?a=1&b=2", "/two"]
    # anchor text of the unclosed first link ends where the next <a> opens
    assert recs[0]["anchor"] == "q bold text"


def test_scheme_relative_and_whitespace_href():
    recs = parse_links(URL, b'<a href=" //cdn.net/x ">c</a>')
    assert recs[0]["target"] == "https://cdn.net/x"
    assert recs[0]["dst_host"] == "cdn.net"


def test_non_html_payloads_yield_nothing():
    assert parse_links(URL, b"") == []
    assert parse_links(URL, b"%PDF-1.4\n1 0 obj\n<< /Type /Cat") == []
    assert parse_links(URL, b"\xff\xfe plain bytes") == []


def test_non_utf8_link_farm_still_parses():
    # the corpus edge family: latin-1-ish bytes around valid anchors
    recs = parse_links(
        URL, b"<html><body><a href='/a'>\xff\xfe one</a> <a href='/b'>two</a>"
    )
    assert [r["href"] for r in recs] == ["/a", "/b"]


def test_batch_explode_matches_serial():
    docs = [make_link_document(i, seed=7) for i in range(40)]
    df = pd.DataFrame(docs)
    out = extract_links_batch(df)
    serial = [
        (d["url"], r["link_no"], r["href"], r["target"], r["anchor"])
        for d in docs
        for r in parse_links(d["url"], d["html"])
    ]
    got = list(
        zip(out["url"], out["link_no"], out["href"], out["target"], out["anchor"])
    )
    assert got == serial
    assert out["link_no"].dtype == "int64"


# -------------------------------------------------- distributed + oracle

N = 300


@pytest.fixture(scope="module")
def link_corpus(ray_session):
    return ensure_link_corpus(N, seed=42)


def test_links_duckdb_regexp_parity(ray_session, link_corpus):
    """The generated corpus uses double-quoted hrefs only, so a regexp
    twin is exact there — pinning the distributed parse end to end."""
    links = extract_links(read_corpus(link_corpus)).to_pandas()
    got = (
        links[["url", "link_no", "href"]]
        .sort_values(["url", "link_no"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.execute(
        f"""
        WITH raw AS (
          SELECT url,
                 regexp_extract_all(decode(html), '<a href="([^"]*)"', 1)
                   AS hs
          FROM read_parquet('{link_corpus}/*.parquet')
        ),
        ex AS (
          SELECT url, unnest(hs) AS href,
                 generate_subscripts(hs, 1) AS pos
          FROM raw
        ),
        kept AS (
          SELECT url, href,
                 row_number() OVER (PARTITION BY url ORDER BY pos) - 1
                   AS link_no
          FROM ex
          WHERE href <> '' AND href NOT LIKE '#%'
            AND lower(href) NOT SIMILAR TO
                '(javascript|mailto|data|tel):.*'
        )
        SELECT url, link_no, href FROM kept ORDER BY url, link_no
        """
    ).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(got, exp)


def test_host_graph_duckdb_parity(ray_session, link_corpus):
    links = extract_links(read_corpus(link_corpus))
    got = (
        host_link_graph(links)
        .to_pandas()
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    got["n_links"] = got["n_links"].astype("int64")
    # independent rollup of the SAME extraction via pandas (the graph
    # aggregation itself, not the parse, is under test here)
    lp = extract_links(read_corpus(link_corpus)).to_pandas()
    from urllib.parse import urlparse

    lp["src_host"] = lp["url"].map(lambda u: urlparse(u).netloc.lower())
    exp = (
        lp.groupby(["src_host", "dst_host"], as_index=False)
        .size()
        .rename(columns={"size": "n_links"})
        .sort_values(["src_host", "dst_host"])
        .reset_index(drop=True)
    )
    exp["n_links"] = exp["n_links"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
    # spot semantics: internal edges exist (relative links), graph is
    # bounded by 16x(16+1) host pairs
    assert (got["src_host"] == got["dst_host"]).any()
    assert len(got) <= 16 * 17


class TestAnchorTextIndex:
    def test_topk_with_duckdb_twin(self, ray_session):
        import duckdb
        import ray.data

        from pdf_parser_ray.html.links import anchor_text_index, extract_links

        pages = pd.DataFrame(
            {
                "url": [f"https://src{i}.test/p" for i in range(6)],
                "html": [
                    b'<a href="https://t.example.com/a">alpha beta</a>'
                    b'<a href="https://t.example.com/b">alpha beta</a>'
                    b'<a href="https://t.example.com/c">gamma</a>'
                    b'<a href="https://u.example.com/">delta</a>'
                    b'<a href="https://t.example.com/d"></a>'  # empty anchor
                    for _ in range(6)
                ],
            }
        )
        links = extract_links(ray.data.from_pandas(pages))
        ldf = links.to_pandas()
        out = (
            anchor_text_index(links, k=2)
            .to_pandas()
            .sort_values(["dst_host", "rank"])
            .reset_index(drop=True)
        )
        twin = duckdb.sql(
            """
            WITH c AS (
              SELECT dst_host, anchor, count(*)::BIGINT AS n
              FROM ldf WHERE anchor <> '' AND dst_host <> ''
              GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (
                     PARTITION BY dst_host ORDER BY n DESC, anchor) AS rank
                  FROM c)
            SELECT dst_host, anchor, n, rank FROM r WHERE rank <= 2
            ORDER BY dst_host, rank
            """
        ).df()
        twin["rank"] = twin["rank"].astype("int64")
        pd.testing.assert_frame_equal(out, twin)
        assert (out.loc[out["dst_host"] == "t.example.com", "anchor"]
                .tolist() == ["alpha beta", "gamma"])
