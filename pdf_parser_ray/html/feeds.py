"""Sitemap / RSS / Atom extraction — the crawl-discovery side of the
extraction tier (alongside html.links for in-page discovery).

From-scratch on stdlib ``html.parser`` (same rationale as html/strip.py
and html/tables.py: no reference implementation exists for the webtext
path; determinism is the contract, pinned by generator↔parser parity in
tests/test_feeds.py).

Supported shapes (the public formats a crawler actually meets):

* **XML sitemap urlset** — ``<urlset><url><loc/><lastmod/>
  <priority/></url>…`` → one row per ``<url>``;
* **sitemap index** — ``<sitemapindex><sitemap><loc/></sitemap>…`` →
  rows flagged ``is_index=True`` (the fetch frontier expands them);
* **RSS 2.0** — ``<channel><item><title/><link/><guid/>…`` ;
* **Atom** — ``<feed><entry><title/><link href=…/><id/>…`` (link is an
  ATTRIBUTE — the classic parser gotcha, covered by tests).

Both ops are row-local ``map_batches`` harvests — payloads never
shuffle.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pdf_parser_ray.html.strip import decode_html


class _SitemapParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.rows: list[dict] = []
        self._in_index = False
        self._entry: dict | None = None
        self._field: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "sitemapindex":
            self._in_index = True
        elif tag in ("url", "sitemap"):
            self._entry = {"loc": "", "lastmod": "", "priority": "",
                           "is_index": tag == "sitemap" or self._in_index}
        elif tag in ("loc", "lastmod", "priority") and self._entry is not None:
            self._field = tag

    def handle_endtag(self, tag):
        if tag in ("url", "sitemap") and self._entry is not None:
            if self._entry["loc"]:
                self.rows.append(self._entry)
            self._entry = None
        elif tag in ("loc", "lastmod", "priority"):
            self._field = None

    def handle_data(self, data):
        if self._entry is not None and self._field:
            self._entry[self._field] = (
                self._entry[self._field] + data.strip()
            )


def parse_sitemap(xml: str) -> list[dict]:
    """One sitemap (urlset or index) → entry dicts
    (loc, lastmod, priority, is_index)."""
    p = _SitemapParser()
    p.feed(xml)
    p.close()
    return p.rows


_FEED_FIELDS_RSS = {"title": "title", "link": "link", "guid": "guid",
                    "pubdate": "ts"}
_FEED_FIELDS_ATOM = {"title": "title", "id": "guid", "updated": "ts"}


class _FeedParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.kind = ""  # "rss" | "atom"
        self.rows: list[dict] = []
        self._entry: dict | None = None
        self._field: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "rss" or tag == "channel":
            self.kind = self.kind or "rss"
        elif tag == "feed":
            self.kind = self.kind or "atom"
        elif tag in ("item", "entry"):
            self._entry = {"title": "", "link": "", "guid": "", "ts": ""}
        elif self._entry is not None:
            if self.kind == "atom" and tag == "link":
                # Atom: <link href="..."/> — attribute, not char data
                for k, v in attrs:
                    if k == "href" and v:
                        self._entry["link"] = v
            else:
                fields = (_FEED_FIELDS_RSS if self.kind == "rss"
                          else _FEED_FIELDS_ATOM)
                self._field = fields.get(tag)

    def handle_endtag(self, tag):
        if tag in ("item", "entry") and self._entry is not None:
            self.rows.append({**self._entry, "kind": self.kind})
            self._entry = None
        else:
            self._field = None

    def handle_data(self, data):
        if self._entry is not None and self._field:
            self._entry[self._field] = self._entry[self._field] + data.strip()


def parse_feed(xml: str) -> list[dict]:
    """One RSS/Atom document → item dicts (title, link, guid, ts, kind)."""
    p = _FeedParser()
    p.feed(xml)
    p.close()
    return p.rows


def _harvest(ds, kernel, schema):
    import pandas as pd
    import pyarrow as pa

    def run(df: pd.DataFrame):
        rows = {n: [] for n in schema.names}
        for url, payload in zip(df["url"], df["html"]):
            if payload is None:
                continue
            for i, rec in enumerate(kernel(decode_html(bytes(payload)))):
                rows["url"].append(url)
                rows["entry_no"].append(i)
                for k, v in rec.items():
                    rows[k].append(v)
        return pa.table(
            {n: pa.array(rows[n], schema.field(n).type) for n in schema.names}
        )

    return ds.map_batches(run, batch_format="pandas")


def extract_sitemap_entries(ds):
    """Corpus-wide sitemap harvest: (url, entry_no, loc, lastmod,
    priority, is_index).  Row-local."""
    import pyarrow as pa

    schema = pa.schema(
        [("url", pa.string()), ("entry_no", pa.int64()),
         ("loc", pa.string()), ("lastmod", pa.string()),
         ("priority", pa.string()), ("is_index", pa.bool_())]
    )
    return _harvest(ds, parse_sitemap, schema)


def extract_feed_items(ds):
    """Corpus-wide feed harvest: (url, entry_no, title, link, guid, ts,
    kind).  Row-local."""
    import pyarrow as pa

    schema = pa.schema(
        [("url", pa.string()), ("entry_no", pa.int64()),
         ("title", pa.string()), ("link", pa.string()),
         ("guid", pa.string()), ("ts", pa.string()),
         ("kind", pa.string())]
    )
    return _harvest(ds, parse_feed, schema)
