"""Sitemap / RSS / Atom extraction kernels + corpus harvest."""

import pandas as pd
import pytest

from pdf_parser_ray.html.feeds import parse_feed, parse_sitemap


class TestParseSitemap:
    def test_urlset(self):
        xml = """<?xml version="1.0"?>
        <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
          <url><loc>https://a.test/1</loc><lastmod>2025-01-02</lastmod>
               <priority>0.8</priority></url>
          <url><loc>https://a.test/2</loc></url>
        </urlset>"""
        rows = parse_sitemap(xml)
        assert [(r["loc"], r["lastmod"], r["priority"], r["is_index"])
                for r in rows] == [
            ("https://a.test/1", "2025-01-02", "0.8", False),
            ("https://a.test/2", "", "", False),
        ]

    def test_sitemap_index(self):
        xml = ("<sitemapindex><sitemap><loc>https://a.test/sm1.xml</loc>"
               "</sitemap><sitemap><loc>https://a.test/sm2.xml</loc>"
               "</sitemap></sitemapindex>")
        rows = parse_sitemap(xml)
        assert [r["loc"] for r in rows] == [
            "https://a.test/sm1.xml", "https://a.test/sm2.xml"]
        assert all(r["is_index"] for r in rows)

    def test_entry_without_loc_dropped(self):
        assert parse_sitemap("<urlset><url><lastmod>x</lastmod></url></urlset>") == []


class TestParseFeed:
    def test_rss(self):
        xml = """<rss version="2.0"><channel>
          <title>chan</title>
          <item><title>first &amp; post</title>
                <link>https://b.test/p1</link>
                <guid>g-1</guid><pubDate>Mon, 06 Jan 2025</pubDate></item>
          <item><title>second</title><link>https://b.test/p2</link></item>
        </channel></rss>"""
        rows = parse_feed(xml)
        assert rows[0] == {"title": "first & post", "link": "https://b.test/p1",
                           "guid": "g-1", "ts": "Mon, 06 Jan 2025", "kind": "rss"}
        assert rows[1]["link"] == "https://b.test/p2"
        # channel-level <title> must NOT leak into items
        assert rows[1]["title"] == "second"

    def test_atom_link_attribute(self):
        xml = """<feed xmlns="http://www.w3.org/2005/Atom">
          <title>feed title</title>
          <entry><title>e1</title>
                 <link href="https://c.test/e1"/>
                 <id>tag:1</id><updated>2025-02-03</updated></entry>
        </feed>"""
        rows = parse_feed(xml)
        assert rows == [{"title": "e1", "link": "https://c.test/e1",
                         "guid": "tag:1", "ts": "2025-02-03", "kind": "atom"}]


class TestCorpusHarvest:
    def test_generator_parser_parity(self, ray_session):
        import ray.data

        from pdf_parser_ray.html.feeds import (
            extract_feed_items,
            extract_sitemap_entries,
        )

        pages = []
        expect_sm, expect_it = [], []
        for d in range(40):
            url = f"https://feeds.test/{d}"
            if d % 2 == 0:
                locs = [f"https://feeds.test/{d}/p{j}" for j in range(d % 5)]
                body = "".join(
                    f"<url><loc>{u}</loc><lastmod>2025-01-{(d % 27) + 1:02d}"
                    f"</lastmod></url>" for u in locs
                )
                pages.append((url, f"<urlset>{body}</urlset>".encode()))
                expect_sm.extend((url, j, u) for j, u in enumerate(locs))
            else:
                items = [f"t{d}-{j}" for j in range(d % 4)]
                body = "".join(
                    f"<item><title>{t}</title><link>https://x.test/{t}"
                    f"</link><guid>{t}</guid></item>" for t in items
                )
                pages.append(
                    (url, f"<rss><channel>{body}</channel></rss>".encode())
                )
                expect_it.extend((url, j, t) for j, t in enumerate(items))

        ds = ray.data.from_pandas(
            pd.DataFrame(pages, columns=["url", "html"])
        )
        sm = extract_sitemap_entries(ds).to_pandas()
        it = extract_feed_items(ds).to_pandas()
        got_sm = sorted(zip(sm["url"], sm["entry_no"], sm["loc"]))
        got_it = sorted(zip(it["url"], it["entry_no"], it["title"]))
        assert got_sm == sorted(expect_sm)
        assert got_it == sorted(expect_it)
        assert (it["kind"] == "rss").all()
