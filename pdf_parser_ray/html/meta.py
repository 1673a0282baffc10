"""WAT-style page-metadata extraction (head fields, not content).

Common-Crawl's WAT records carry per-page metadata harvested from the
HTML head — title, meta description, canonical link, OpenGraph fields,
robots directives.  This module is that harvest as a row-local Ray
stage: compiled regexes over the charset-decoded payload (the same
``decode_html`` the boilerplate stripper uses), no DOM build — the
head fields are shallow enough that anchored patterns are both faster
and byte-stable.

Reference parity note: the reference engine has no WAT tier; this is
part of the corpus/web tier the task brief adds (link extraction's
sibling — see html/links.py).
"""

from __future__ import annotations

import re
from typing import Any

from pdf_parser_ray.html.strip import decode_html

_FLAGS = re.IGNORECASE | re.DOTALL

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", _FLAGS)
_H1_RE = re.compile(r"<h1[^>]*>(.*?)</h1\s*>", _FLAGS)
# <meta name=... content=...> with either attribute order
_META_NC_RE = re.compile(
    r"""<meta\s+[^>]*?name\s*=\s*["']?(?P<name>[A-Za-z:_\-]+)["']?
        [^>]*?content\s*=\s*["'](?P<content>[^"']*)["']""",
    _FLAGS | re.VERBOSE,
)
_META_CN_RE = re.compile(
    r"""<meta\s+[^>]*?content\s*=\s*["'](?P<content>[^"']*)["']
        [^>]*?name\s*=\s*["']?(?P<name>[A-Za-z:_\-]+)["']?""",
    _FLAGS | re.VERBOSE,
)
_META_PROP_RE = re.compile(
    r"""<meta\s+[^>]*?property\s*=\s*["']?(?P<name>og:[A-Za-z:_\-]+)["']?
        [^>]*?content\s*=\s*["'](?P<content>[^"']*)["']""",
    _FLAGS | re.VERBOSE,
)
_META_PROP_CN_RE = re.compile(
    r"""<meta\s+[^>]*?content\s*=\s*["'](?P<content>[^"']*)["']
        [^>]*?property\s*=\s*["']?(?P<name>og:[A-Za-z:_\-]+)["']?""",
    _FLAGS | re.VERBOSE,
)
_CANONICAL_RE = re.compile(
    r"""<link\s+[^>]*?rel\s*=\s*["']?canonical["']?
        [^>]*?href\s*=\s*["']?([^"'\s>]+)""",
    _FLAGS | re.VERBOSE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _clean(s: str | None) -> str | None:
    if s is None:
        return None
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", s)).strip() or None


def extract_metadata(payload: bytes) -> dict[str, Any]:
    """Head-field harvest for one page.  Returns title, first h1, meta
    description, canonical href, og:title, and a robots-noindex flag —
    every field ``None`` when absent (and all ``None`` for non-HTML
    payloads, which simply match nothing)."""
    html = decode_html(payload) if payload else ""
    head = html[:65536]  # head fields live up front; bound the scan

    metas: dict[str, str] = {}
    for rx in (_META_NC_RE, _META_CN_RE):
        for m in rx.finditer(head):
            metas.setdefault(m.group("name").lower(), m.group("content"))
    for rx in (_META_PROP_RE, _META_PROP_CN_RE):
        for m in rx.finditer(head):
            metas.setdefault(m.group("name").lower(), m.group("content"))

    t = _TITLE_RE.search(head)
    h1 = _H1_RE.search(html)
    c = _CANONICAL_RE.search(head)
    robots = (metas.get("robots") or "").lower()
    return {
        "title": _clean(t.group(1) if t else None),
        "h1": _clean(h1.group(1) if h1 else None),
        "description": _clean(metas.get("description")),
        "canonical": c.group(1).strip() if c else None,
        "og_title": _clean(metas.get("og:title")),
        "noindex": "noindex" in robots,
    }


def page_metadata(ds) -> "object":
    """Ray stage: (url, html) corpus → one metadata row per page.

    Row-local map (no shuffle); per-row regex harvest with
    module-compiled patterns, same execution shape as the boilerplate
    stripper.  Output: url, title, h1, description, canonical,
    og_title, noindex.
    """
    import pandas as pd

    from pdf_parser_ray.io_utils import arrow_out

    def harvest(df: pd.DataFrame):
        rows = [extract_metadata(p) for p in df["html"]]
        out = pd.DataFrame(rows)
        out.insert(0, "url", df["url"].to_numpy())
        out["noindex"] = out["noindex"].astype(bool)
        return arrow_out(out)

    return ds.select_columns(["url", "html"]).map_batches(
        harvest, batch_format="pandas"
    )
