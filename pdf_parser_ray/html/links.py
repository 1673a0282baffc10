"""WAT-style hyperlink extraction — the link-graph tier of a web corpus.

The reference engine parses documents for their text; a Common-Crawl
scale twin also harvests link STRUCTURE (WAT records): per-page outlinks
with resolved targets and anchor text, rolled up into a host→host graph.
This module does both as plain Ray Data stages:

* :func:`extract_links` — row-local ``map_batches`` parse (same HTML
  tolerance rules as :mod:`pdf_parser_ray.html.strip`: charset sniff,
  lenient decode, recovery from unclosed tags).  The exploded link rows
  carry only narrow columns — never the html payload — so the stream
  into any downstream shuffle stays small.
* :func:`host_link_graph` — (src_host, dst_host) edge weights via the
  partial-count combiner (host-pair cardinality ≪ link rows), one
  bounded groupby.

Determinism: output order within a page is document order (``link_no``);
resolution uses RFC 3986 ``urljoin`` against the page url (or the
page's first ``<base href>``), scheme-relative and relative hrefs
included; ``javascript:``/``mailto:``/``data:``/``tel:`` and
fragment-only hrefs are dropped (the WAT convention).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Any
from urllib.parse import urljoin, urlparse

import numpy as np
import pandas as pd

from pdf_parser_ray.html.strip import decode_html

_SKIP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:")


class _LinkParser(HTMLParser):
    """Collect (href, anchor text) for every <a href=...>, plus the
    page's first <base href>.  A new <a> implicitly closes an open one
    (nested anchors are invalid HTML; browsers do the same)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, list[str]]] = []
        self.base: str | None = None
        self._open: list[str] | None = None

    def handle_starttag(self, tag: str, attrs: list) -> None:
        tag = tag.lower()
        if tag == "base" and self.base is None:
            for k, v in attrs:
                if k.lower() == "href" and v:
                    self.base = v
                    break
            return
        if tag == "a":
            self._open = None  # implicit close of any dangling anchor
            for k, v in attrs:
                if k.lower() == "href" and v is not None:
                    chars: list[str] = []
                    self.links.append((v, chars))
                    self._open = chars
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag.lower() == "a":
            self._open = None

    def handle_data(self, data: str) -> None:
        if self._open is not None and data:
            self._open.append(data)


def parse_links(url: str, payload: bytes) -> list[dict[str, Any]]:
    """Serial reference kernel: WAT link records for one page.

    Resolution base = first <base href> resolved against the page url,
    else the page url.  Returns [] for non-HTML payloads (no <a> ever
    parses out of PDF/binary bytes)."""
    if not payload:
        return []
    p = _LinkParser()
    try:
        p.feed(decode_html(payload))
        p.close()
    except Exception:
        return []  # pathological markup: no links rather than a crash
    base = urljoin(url, p.base) if p.base else url
    src_host = urlparse(url).netloc.lower()
    out: list[dict[str, Any]] = []
    for href, chars in p.links:
        href = href.strip()
        low = href.lower()
        if not href or low.startswith(_SKIP_SCHEMES) or href.startswith("#"):
            continue
        target = urljoin(base, href)
        dst_host = urlparse(target).netloc.lower()
        anchor = " ".join("".join(chars).split())
        out.append(
            {
                "link_no": len(out),
                "href": href,
                "target": target,
                "dst_host": dst_host,
                "anchor": anchor,
                "is_internal": dst_host == src_host,
            }
        )
    return out


def extract_links_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Exploded WAT rows for a batch of (url, html) pages."""
    urls: list[str] = []
    recs: list[dict[str, Any]] = []
    for url, payload in zip(df["url"], df["html"]):
        for rec in parse_links(url, payload or b""):
            urls.append(url)
            recs.append(rec)
    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="object"),
            "link_no": np.asarray([r["link_no"] for r in recs], dtype=np.int64),
            "href": pd.Series([r["href"] for r in recs], dtype="object"),
            "target": pd.Series([r["target"] for r in recs], dtype="object"),
            "dst_host": pd.Series([r["dst_host"] for r in recs], dtype="object"),
            "anchor": pd.Series([r["anchor"] for r in recs], dtype="object"),
            "is_internal": np.asarray(
                [r["is_internal"] for r in recs], dtype=bool
            ),
        }
    )


def extract_links(ds, *, url_col: str = "url", html_col: str = "html"):
    """Distributed WAT extraction: one exploded link-record stream.

    Output: (url, link_no:int64, href, target, dst_host, anchor,
    is_internal:bool), document order per page.
    """
    cols = [url_col, html_col]

    def run(df: pd.DataFrame) -> pd.DataFrame:
        if url_col != "url" or html_col != "html":
            df = df.rename(columns={url_col: "url", html_col: "html"})
        return extract_links_batch(df)

    return ds.select_columns(cols).map_batches(run, batch_format="pandas")


def host_link_graph(links, *, drop_internal: bool = False):
    """Host→host edge weights from a link stream: per-batch partial
    counts (host-pair cardinality, not link cardinality, enters the
    shuffle) → one grouped sum.

    Output: (src_host, dst_host, n_links:int64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame) -> "object":
        if drop_internal:
            df = df[~df["is_internal"].to_numpy()]
        src = df["url"].map(lambda u: urlparse(u).netloc.lower())
        g = (
            pd.DataFrame({"src_host": src, "dst_host": df["dst_host"]})
            .groupby(["src_host", "dst_host"], as_index=False)
            .size()
            .rename(columns={"size": "n_links"})
        )
        g["n_links"] = g["n_links"].astype("int64")
        return arrow_out(g)

    return (
        links.map_batches(partial, batch_format="pandas")
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("n_links", alias_name="n_links"))
    )


def anchor_text_index(links, *, k: int = 3):
    """Anchor-text index: for every destination host, the top-``k``
    anchor strings pointing at it (count DESC, anchor ASC) — the link-
    text signal search/quality pipelines aggregate from WAT records
    (how the web describes a page, vs how the page describes itself).

    Empty anchors drop (image links, empty <a>); counts partial-
    aggregate per batch, ONE bounded (host, anchor) groupby, then
    per-batch partial top-k → tiny per-host final (the
    top_events_per_type rule — no unbounded per-host frame).

    Output: (dst_host, anchor, n:int64, rank:int64), rank 1-based.
    """
    import pandas as pd

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def partial(df: pd.DataFrame):
        g = df.loc[
            (df["anchor"].fillna("") != "") & (df["dst_host"].fillna("") != ""),
            ["dst_host", "anchor"],
        ]
        c = g.groupby(["dst_host", "anchor"], as_index=False).size()
        return arrow_out(
            c.rename(columns={"size": "n"}).astype({"n": "int64"})
        )

    counts = grouped_sum(
        links.map_batches(partial, batch_format="pandas"),
        ["dst_host", "anchor"], ["n"],
    )

    def local_topk(df: pd.DataFrame):
        df = df.sort_values(
            ["dst_host", "n", "anchor"],
            ascending=[True, False, True], kind="mergesort",
        )
        return arrow_out(df.groupby("dst_host", sort=False).head(k))

    def final_topk(df: pd.DataFrame):
        df = df.sort_values(
            ["dst_host", "n", "anchor"],
            ascending=[True, False, True], kind="mergesort",
        )
        top = df.groupby("dst_host", sort=False).head(k).copy()
        top["rank"] = top.groupby("dst_host", sort=False).cumcount() + 1
        return arrow_out(top.astype({"rank": "int64"}))

    from pdf_parser_ray.ops.shuffle import partitioned_map

    pruned = counts.map_batches(local_topk, batch_format="pandas")
    return partitioned_map(pruned, ["dst_host"], final_topk)
