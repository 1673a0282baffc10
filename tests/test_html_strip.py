"""HTML boilerplate stripper — FIXTURES.md §3 families H1-H5.

No upstream reference exists for this path; determinism is the contract
and these goldens freeze it.
"""

from pdf_parser_ray.html.strip import decode_html, strip_html

H1 = b"""<html><head><title>t</title><script>nav()</script></head><body>
<nav><a href="/">home</a> <a href="/x">links</a></nav>
<article>
<p>First paragraph with plenty of characters to pass the block scorer.</p>
<p>Second paragraph, also comfortably above the minimum threshold.</p>
<p>Third paragraph closing out the main article body content here.</p>
</article>
<footer><a href="/tos">terms</a> and conditions</footer>
</body></html>"""


def test_h1_article_only():
    r = strip_html(H1)
    assert r["status"] == "ok"
    assert r["extracted_text"] == (
        "First paragraph with plenty of characters to pass the block scorer.\n"
        "Second paragraph, also comfortably above the minimum threshold.\n"
        "Third paragraph closing out the main article body content here."
    )
    assert [s["font"] for s in r["spans"]] == ["p", "p", "p"]
    s0 = r["spans"][0]
    assert (s0["offset_start"], s0["offset_end"]) == (0, 67)


def test_h2_link_density_rejects_sidebars():
    html = b"""<html><body>
    <div><a href="/1">one link</a> <a href="/2">two link</a> <a href="/3">three link</a></div>
    <div>A genuine content block of prose with no links at all, long enough to keep.</div>
    </body></html>"""
    r = strip_html(html)
    assert r["extracted_text"] == (
        "A genuine content block of prose with no links at all, long enough to keep."
    )


def test_h3_links_only_page_empty():
    r = strip_html(b"<html><body><a href='/a'>one</a> <a href='/b'>two</a></body></html>")
    assert r["status"] == "empty" and r["extracted_text"] == ""


def test_h4_declared_charset():
    body = "<html><head><meta charset=\"latin-1\"></head><body><p>caf\xe9 content block long enough to be kept around</p></body></html>"
    payload = body.encode("latin-1")
    assert "café" in decode_html(payload)
    r = strip_html(payload)
    assert "café" in r["extracted_text"]


def test_h4b_unknown_charset_falls_back_utf8():
    payload = b"<html><head><meta charset=\"no-such-enc\"></head><body><p>plain ascii long enough to be kept in the output</p></body></html>"
    r = strip_html(payload)
    assert "plain ascii" in r["extracted_text"]


def test_h5_malformed_unclosed_tags_recover():
    html = b"""<html><body>
    <p>Unclosed paragraph one that is long enough to be kept here
    <p>Second paragraph also long enough to be kept by the scorer
    <div>Trailing div content block long enough to be kept as well</body></html>"""
    r = strip_html(html)
    lines = r["extracted_text"].split("\n")
    assert len(lines) == 3
    assert lines[0].startswith("Unclosed paragraph one")


def test_boilerplate_containers_stripped():
    html = b"""<html><body>
    <header><h1>Site Title Banner Text Long Enough To Keep</h1></header>
    <main><p>Main content paragraph long enough to pass the scorer.</p></main>
    <aside><p>Sidebar advertisement text that is also long enough.</p></aside>
    <form><p>Form help text that is definitely long enough too.</p></form>
    </body></html>"""
    r = strip_html(html)
    assert r["extracted_text"] == "Main content paragraph long enough to pass the scorer."


def test_headings_kept_short():
    html = b"<html><body><article><h2>Title</h2><p>Body paragraph long enough to be kept by the scorer.</p></article></body></html>"
    r = strip_html(html)
    assert r["extracted_text"].split("\n")[0] == "Title"


def test_duplicate_blocks_instance_indexed():
    html = (b"<html><body><article><p>repeat me enough characters okay</p>"
            b"<p>repeat me enough characters okay</p></article></body></html>")
    r = strip_html(html)
    assert [s["instance_index"] for s in r["spans"]] == [0, 1]


def test_tables_and_lists_block_granularity():
    html = (b"<html><body><article>"
            b"<table><tr><td>cell one content long enough to keep here</td>"
            b"<td>cell two content also long enough to keep here</td></tr></table>"
            b"<ul><li>list item one long enough to survive the scorer</li>"
            b"<li>list item two long enough to survive the scorer</li></ul>"
            b"</article></body></html>")
    r = strip_html(html)
    lines = r["extracted_text"].split("\n")
    assert len(lines) == 4
    assert [s["font"] for s in r["spans"]] == ["td", "td", "li", "li"]


def test_figcaption_dd_dt_blocks():
    html = (b"<html><body><article>"
            b"<figure><figcaption>caption text long enough for keeping</figcaption></figure>"
            b"<dl><dt>term kept</dt><dd>definition body long enough for keeping</dd></dl>"
            b"</article></body></html>")
    r = strip_html(html)
    fonts = [s["font"] for s in r["spans"]]
    assert "figcaption" in fonts and "dd" in fonts and "dt" in fonts


def test_comment_content_ignored():
    html = (b"<html><body><article>"
            b"<!-- hidden comment text that must never ever appear -->"
            b"<p>visible paragraph content long enough to keep here</p>"
            b"</article></body></html>")
    r = strip_html(html)
    assert "hidden comment" not in r["extracted_text"]
    assert r["extracted_text"].startswith("visible paragraph")


def test_script_style_dropped():
    html = (b"<html><head><style>p{color:red}</style></head><body>"
            b"<script>var boilerplate_long_enough_to_keep = 12345678;</script>"
            b"<p>Real visible paragraph content long enough to keep.</p></body></html>")
    r = strip_html(html)
    assert r["extracted_text"] == "Real visible paragraph content long enough to keep."
