"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1-§3).

Schema (BASELINE.json input_hint):
  url:string  warc_ts:timestamp[us]  html:binary  text:string  lang:string

Every document is a pure function of ``(seed, doc_id)`` — independent of
partitioning, block order, or worker count — so any subset regenerates
identically (this is what makes checkpoint reruns idempotent and lets the
bench corpus be produced in parallel with Ray and cached on disk).

Payload mix (seeded, FIXTURES.md §1): ~40% synthetic PDFs exercising the
tokenizer/CMap families of FIXTURES.md §2, ~50% HTML pages with
boilerplate (families of §3), ~10% edge cases (empty, truncated PDF,
non-UTF8 bytes, plain text), plus ~0.1% oversized (~1.2 MB) payloads for
the skew-routing path (F15).

The ``text`` column carries the plain text a perfect extractor would see
for the MAIN families (and is the fallback input for edge rows); exotic
families (non-identity bfrange) intentionally diverge so tests cannot
cheat by reading ``text``.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa

from pdf_parser_ray.minipdf.writer import build_pdf

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data stream batch arrow block shuffle actor corpus crawl "
    "page content text span font glyph token index offset filter extract"
).split()

_LANGS = ["en", "de", "fr", "zh", "es", "ru", "ja", "pt"]

BASE_TS_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds

CORPUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def _sentence(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def _pdf_content_for_lines(lines: list[str], rng: random.Random) -> str:
    """Content stream showing each line via Td-positioned Tj ops.

    Positions use Td only (the reference's Tm tracking is inert —
    pdf_gui.py:793-799 always ValueErrors on the trailing 'Tm' token), so
    rects are deterministic functions of the Td chain.
    """
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i > 0:
            ops.append("0 -16 Td")
        # Only ()\ need escaping for our ASCII wordlist lines.
        esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"({esc}) Tj")
    ops.append("ET")
    return " ".join(ops)


def _make_pdf_doc(rng: random.Random) -> tuple[bytes, str]:
    """Build a PDF payload + its expected plain text."""
    n_pages = rng.choice([1, 1, 1, 2, 3])
    compress = rng.random() < 0.5
    family = rng.random()
    pages = []
    page_texts = []
    for _ in range(n_pages):
        n_lines = rng.randint(2, 8)
        lines = [_sentence(rng, rng.randint(3, 9)) for _ in range(n_lines)]
        if rng.random() < 0.25 and lines:
            lines.append(lines[0])  # duplicate text → instance_index > 0 (F8)
        content = _pdf_content_for_lines(lines, rng)
        if family < 0.70:  # identity bfchar ToUnicode CMap (F1)
            fonts = {"/F1": {"bfchars": {c: chr(c) for c in range(32, 127)}}}
        elif family < 0.90:  # WinAnsi fallback, no ToUnicode (F5)
            fonts = {"/F1": {"no_tounicode": True, "encoding": "/WinAnsiEncoding"}}
        else:  # non-identity bfrange: A-Z → a-z (F2; text column diverges)
            fonts = {
                "/F1": {
                    "bfchars": {c: chr(c) for c in range(32, 65)}
                    | {c: chr(c) for c in range(91, 127)},
                    "bfranges": [(0x41, 0x5A, 0x0061)],
                }
            }
        page: dict = {"fonts": fonts}
        if rng.random() < 0.10:  # /Contents array split (F10)
            half = max(1, len(content) // 2)
            # split on a space so no token is cut across stream parts
            cut = content.rfind(" ", 0, half)
            cut = cut if cut > 0 else half
            page["contents_list"] = [content[:cut], content[cut:]]
        else:
            page["content"] = content
        pages.append(page)
        page_texts.append("\n".join(lines))
    return build_pdf(pages, compress=compress), "\n".join(page_texts)


_HTML_TMPL = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>body {{ margin:0 }}</style><script>var x = 1;</script></head>
<body>
<header><h1>{site}</h1><nav><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav></header>
<aside><ul><li><a href="/l1">related one</a></li><li><a href="/l2">related two</a></li></ul></aside>
<article>
{paras}
</article>
<footer><p><a href="/tos">terms</a> <a href="/privacy">privacy</a> copyright example</p></footer>
</body></html>"""


def _make_html_doc(rng: random.Random) -> tuple[bytes, str]:
    n_paras = rng.randint(1, 6)
    paras = [_sentence(rng, rng.randint(12, 40)) for _ in range(n_paras)]
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    html = _HTML_TMPL.format(
        title=_sentence(rng, 3), site=_sentence(rng, 2), paras=body
    )
    return html.encode("utf-8"), "\n".join(paras)


def _make_edge_doc(rng: random.Random) -> tuple[bytes, str]:
    kind = rng.random()
    text = _sentence(rng, rng.randint(5, 20))
    if kind < 0.25:  # empty payload → fallback to text column
        return b"", text
    if kind < 0.50:  # truncated PDF
        return b"%PDF-1.4\n1 0 obj\n<< /Type /Cat", text
    if kind < 0.75:  # non-UTF8 link-farm HTML (near-empty extraction)
        return (
            b"<html><body><a href='/a'>\xff\xfe one</a> <a href='/b'>two</a>"
            b"</body></html>"
        ), text
    # plain-text payload
    return text.encode("utf-8"), text


def _make_oversized_doc(rng: random.Random) -> tuple[bytes, str]:
    """~1.2 MB single-page PDF (F15) for the skew-routing pool."""
    lines = [_sentence(rng, 10) for _ in range(40)]
    content = _pdf_content_for_lines(lines, rng)
    # Pad with a comment stream the tokenizer must scan past.
    pad = "% " + "x" * 64 + "\n"
    content = content + "\n" + pad * 18000
    pdf = build_pdf(
        [{"fonts": {"/F1": {"bfchars": {c: chr(c) for c in range(32, 127)}}},
          "content": content}],
        compress=False,
    )
    return pdf, "\n".join(lines)


def make_document(doc_id: int, seed: int = 42) -> dict:
    """One corpus row, a pure function of (seed, doc_id)."""
    rng = random.Random(f"{seed}:{doc_id}")
    r = rng.random()
    if r < 0.001:
        payload, text = _make_oversized_doc(rng)
    elif r < 0.40:
        payload, text = _make_pdf_doc(rng)
    elif r < 0.90:
        payload, text = _make_html_doc(rng)
    else:
        payload, text = _make_edge_doc(rng)
    return {
        "url": f"https://example.org/doc/{doc_id:08d}",
        "warc_ts": BASE_TS_US + doc_id * 1_000_000,
        "html": payload,
        "text": text,
        "lang": _LANGS[doc_id % len(_LANGS)],
    }


def generate_corpus_table(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    """In-memory table for tests/small runs."""
    rows = [make_document(i, seed) for i in range(start, start + n_docs)]
    return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)


def _gen_batch(batch: pa.Table, seed: int) -> pa.Table:
    ids = batch.column("id").to_pylist()
    return pa.Table.from_pylist([make_document(i, seed) for i in ids], schema=CORPUS_SCHEMA)


def generate_corpus(n_docs: int, out_dir: str, seed: int = 42,
                    num_files: int | None = None) -> str:
    """Generate the corpus in parallel with Ray Data and write Parquet.

    Content is deterministic per doc_id; Ray only parallelizes the work.
    """
    import ray.data

    parallelism = num_files or max(8, min(64, n_docs // 2000 or 8))
    (
        ray.data.range(n_docs, override_num_blocks=parallelism)
        .map_batches(_gen_batch, fn_kwargs={"seed": seed},
                     batch_format="pyarrow", batch_size=2000)
        .write_parquet(out_dir)
    )
    return out_dir


def ensure_corpus(n_docs: int, seed: int = 42,
                  cache_root: str = "/tmp/ppr_corpus") -> str:
    """Generate-once disk cache keyed by (n_docs, seed)."""
    out_dir = os.path.join(cache_root, f"n{n_docs}_s{seed}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    generate_corpus(n_docs, out_dir, seed)
    with open(marker, "w") as f:
        f.write(f"{n_docs} {seed}\n")
    return out_dir


def sf_to_n_docs(sf: float) -> int:
    """Match the driver's table scaling: sf0.001→500 docs (TESTDATA.md)."""
    return max(20, int(round(sf * 500_000)))


# ------------------------------------------------------------ link corpus
# A SECOND deterministic generator (the frozen extraction corpus above is
# a test anchor and must not drift): pages with a varied host mix and
# absolute / relative / scheme-relative / skippable outlinks, for the
# WAT link-extraction + host-graph tier.  Pure per (seed, doc_id).

_LINK_HOSTS = tuple(f"https://site{i:02d}.example" for i in range(16))


def make_link_document(doc_id: int, seed: int = 42) -> dict:
    rng = random.Random(f"link:{seed}:{doc_id}")
    host = _LINK_HOSTS[doc_id % len(_LINK_HOSTS)]
    url = f"{host}/page/{doc_id:06d}"
    parts: list[str] = []
    for _ in range(rng.randint(0, 8)):
        r = rng.random()
        if r < 0.50:  # absolute cross-host
            tgt = (f"{_LINK_HOSTS[rng.randrange(len(_LINK_HOSTS))]}"
                   f"/page/{rng.randrange(100_000):06d}")
        elif r < 0.80:  # relative → internal
            tgt = f"/rel/{rng.randrange(50)}"
        elif r < 0.90:  # scheme-relative
            tgt = (f"//{_LINK_HOSTS[rng.randrange(len(_LINK_HOSTS))][8:]}"
                   f"/x/{rng.randrange(100)}")
        else:  # WAT-skipped schemes / fragment-only (must NOT extract)
            tgt = rng.choice(["javascript:void(0)", "mailto:a@b.c", "#top"])
        parts.append(f'<a href="{tgt}">{_sentence(rng, rng.randint(1, 3))}</a>')
    paras = " ".join(_sentence(rng, 8) for _ in range(2))
    html = (f"<html><head><title>{_sentence(rng, 2)}</title></head>"
            f"<body><p>{paras}</p>{' '.join(parts)}</body></html>")
    return {
        "url": url,
        "warc_ts": BASE_TS_US + doc_id * 1_000_000,
        "html": html.encode("utf-8"),
        "text": paras,
        "lang": _LANGS[doc_id % len(_LANGS)],
    }


def _gen_link_batch(batch: pa.Table, seed: int) -> pa.Table:
    ids = batch.column("id").to_pylist()
    return pa.Table.from_pylist(
        [make_link_document(i, seed) for i in ids], schema=CORPUS_SCHEMA
    )


def ensure_link_corpus(n_docs: int, seed: int = 42,
                       cache_root: str = "/tmp/ppr_corpus") -> str:
    """Generate-once disk cache for the link corpus."""
    import ray.data

    out_dir = os.path.join(cache_root, f"links_n{n_docs}_s{seed}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    parallelism = max(8, min(64, n_docs // 2000 or 8))
    (
        ray.data.range(n_docs, override_num_blocks=parallelism)
        .map_batches(_gen_link_batch, fn_kwargs={"seed": seed},
                     batch_format="pyarrow", batch_size=2000)
        .write_parquet(out_dir)
    )
    with open(marker, "w") as f:
        f.write(f"{n_docs} {seed}\n")
    return out_dir


def make_table_cells(doc_id: int, seed: int = 42) -> list[list[list[str]]]:
    """The ground-truth cell matrices for one table-corpus page —
    tables[t][r][c] = cell text.  Pure function of (seed, doc_id); the
    generator renders these to HTML and the parser must invert the
    rendering exactly (tests/test_html_tables.py parity check)."""
    rng = random.Random(f"tables:{seed}:{doc_id}")
    tables = []
    for _ in range(rng.randint(0, 3)):
        n_rows = rng.randint(1, 5)
        n_cols = rng.randint(1, 4)
        tables.append(
            [
                [_sentence(rng, rng.randint(1, 3)) for _ in range(n_cols)]
                for _ in range(n_rows)
            ]
        )
    return tables


def make_table_document(doc_id: int, seed: int = 42) -> dict:
    """A CC-style page whose body carries 0-3 HTML tables (first row is
    a <th> header row), prose between them, plus a <script> decoy the
    extractor must drop."""
    rng = random.Random(f"tablesdoc:{seed}:{doc_id}")
    cells = make_table_cells(doc_id, seed)
    parts: list[str] = []
    for t in cells:
        rows_html = []
        for r, row in enumerate(t):
            tag = "th" if r == 0 else "td"
            rows_html.append(
                "<tr>" + "".join(f"<{tag}>{c}</{tag}>" for c in row) + "</tr>"
            )
        parts.append(f"<table>{''.join(rows_html)}</table>")
        parts.append(f"<p>{_sentence(rng, 10)}</p>")
    paras = " ".join(_sentence(rng, 8) for _ in range(2))
    html = (
        f"<html><head><title>{_sentence(rng, 2)}</title>"
        f"<script>var x = '<td>not a cell</td>';</script></head>"
        f"<body><p>{paras}</p>{''.join(parts)}</body></html>"
    )
    return {
        "url": f"https://tables.example.com/page/{doc_id:06d}",
        "warc_ts": BASE_TS_US + doc_id * 1_000_000,
        "html": html.encode("utf-8"),
        "text": paras,
        "lang": _LANGS[doc_id % len(_LANGS)],
    }


def _gen_table_batch(batch: pa.Table, seed: int) -> pa.Table:
    ids = batch.column("id").to_pylist()
    return pa.Table.from_pylist(
        [make_table_document(i, seed) for i in ids], schema=CORPUS_SCHEMA
    )


def ensure_table_corpus(n_docs: int, seed: int = 42,
                        cache_root: str = "/tmp/ppr_corpus") -> str:
    """Generate-once disk cache for the table-bearing corpus."""
    import ray.data

    out_dir = os.path.join(cache_root, f"tables_n{n_docs}_s{seed}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    parallelism = max(8, min(64, n_docs // 2000 or 8))
    (
        ray.data.range(n_docs, override_num_blocks=parallelism)
        .map_batches(_gen_table_batch, fn_kwargs={"seed": seed},
                     batch_format="pyarrow", batch_size=2000)
        .write_parquet(out_dir)
    )
    with open(marker, "w") as f:
        f.write(f"{n_docs} {seed}\n")
    return out_dir


def make_feed_document(doc_id: int, seed: int = 42) -> dict:
    """A discovery-tier page: XML sitemap (even ids; every 8th an
    index), RSS (odd, id%4==1) or Atom (id%4==3), deterministic from
    (seed, doc_id)."""
    rng = random.Random(f"feeds:{seed}:{doc_id}")
    host = f"https://feeds{doc_id % 7}.example.com"
    url = f"{host}/feed/{doc_id:06d}"
    if doc_id % 8 == 0:
        inner = "".join(
            f"<sitemap><loc>{host}/sm/{doc_id}/{j}.xml</loc></sitemap>"
            for j in range(rng.randint(1, 4))
        )
        xml = f"<sitemapindex>{inner}</sitemapindex>"
        text = ""
    elif doc_id % 2 == 0:
        inner = "".join(
            f"<url><loc>{host}/page/{doc_id}/{j}</loc>"
            f"<lastmod>2025-01-{rng.randint(1, 28):02d}</lastmod>"
            f"<priority>0.{rng.randint(1, 9)}</priority></url>"
            for j in range(rng.randint(0, 6))
        )
        xml = f'<?xml version="1.0"?><urlset>{inner}</urlset>'
        text = ""
    elif doc_id % 4 == 1:
        inner = "".join(
            f"<item><title>{_sentence(rng, 3)}</title>"
            f"<link>{host}/post/{doc_id}/{j}</link>"
            f"<guid>g-{doc_id}-{j}</guid>"
            f"<pubDate>2025-02-{rng.randint(1, 28):02d}</pubDate></item>"
            for j in range(rng.randint(1, 5))
        )
        xml = f"<rss version=\"2.0\"><channel><title>c</title>{inner}</channel></rss>"
        text = ""
    else:
        inner = "".join(
            f"<entry><title>{_sentence(rng, 3)}</title>"
            f'<link href="{host}/e/{doc_id}/{j}"/>'
            f"<id>tag:{doc_id}:{j}</id>"
            f"<updated>2025-03-{rng.randint(1, 28):02d}</updated></entry>"
            for j in range(rng.randint(1, 5))
        )
        xml = f"<feed>{inner}</feed>"
        text = ""
    return {
        "url": url,
        "warc_ts": BASE_TS_US + doc_id * 1_000_000,
        "html": xml.encode("utf-8"),
        "text": text,
        "lang": _LANGS[doc_id % len(_LANGS)],
    }


def _gen_feed_batch(batch: pa.Table, seed: int) -> pa.Table:
    ids = batch.column("id").to_pylist()
    return pa.Table.from_pylist(
        [make_feed_document(i, seed) for i in ids], schema=CORPUS_SCHEMA
    )


def ensure_feed_corpus(n_docs: int, seed: int = 42,
                       cache_root: str = "/tmp/ppr_corpus") -> str:
    """Generate-once disk cache for the discovery (sitemap/feed) corpus."""
    import ray.data

    out_dir = os.path.join(cache_root, f"feeds_n{n_docs}_s{seed}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    parallelism = max(8, min(64, n_docs // 2000 or 8))
    (
        ray.data.range(n_docs, override_num_blocks=parallelism)
        .map_batches(_gen_feed_batch, fn_kwargs={"seed": seed},
                     batch_format="pyarrow", batch_size=2000)
        .write_parquet(out_dir)
    )
    with open(marker, "w") as f:
        f.write(f"{n_docs} {seed}\n")
    return out_dir


# --------------------------------------------------------- charset corpus

# every body carries non-ASCII (latin-1-encodable) chars — the ascii
# tier (case 3) supplies its own body, so expected_charset stays exact
_CHARSET_BODIES = [
    "café déjà vu — naïve façade résumé",
    "Zürich München Straße Äpfel Öl",
    "señor año corazón música jalapeño",
]


def make_charset_document(doc_id: int, seed: int = 42) -> dict:
    """A byte-encoding test page, deterministic from (seed, doc_id):
    the five cases a crawler's charset sniffer must get right —
    declared+valid UTF-8, declared windows-1252, BOM'd UTF-16LE,
    bare ASCII, and the LYING meta (UTF-8 bytes declaring 1252)."""
    rng = random.Random(f"charset:{seed}:{doc_id}")
    body = _CHARSET_BODIES[rng.randrange(len(_CHARSET_BODIES))]
    title = f"Page {doc_id}"
    case = doc_id % 5
    if case == 0:
        html = (
            f'<html><head><meta charset="utf-8"><title>{title}</title>'
            f"</head><body><p>{body}</p></body></html>"
        )
        payload, expected = html.encode("utf-8"), "utf-8"
    elif case == 1:
        html = (
            '<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=windows-1252">'
            f"<title>{title}</title></head><body><p>{body}</p></body></html>"
        )
        payload, expected = html.encode("windows-1252"), "windows-1252"
    elif case == 2:
        html = f"<html><head><title>{title}</title></head><body><p>{body}</p></body></html>"
        payload = b"\xff\xfe" + html.encode("utf-16-le")
        expected = "utf-16le"
    elif case == 3:
        html = (
            f"<html><head><title>{title}</title></head>"
            "<body><p>plain ascii only</p></body></html>"
        )
        payload, expected = html.encode("ascii"), "ascii"
    else:
        html = (
            '<html><head><meta charset="windows-1252">'
            f"<title>{title}</title></head><body><p>{body}</p></body></html>"
        )
        payload, expected = html.encode("utf-8"), "utf-8"
    return {
        "url": f"https://charset{doc_id % 5}.example.com/p/{doc_id:06d}",
        "doc_id": doc_id,
        "payload": payload,
        "expected_charset": expected,
    }


def _gen_charset_batch(batch, seed: int = 42):
    import pyarrow as pa

    ids = batch.column("id").to_pylist()
    rows = [make_charset_document(i, seed) for i in ids]
    return pa.Table.from_pylist(rows)


def ensure_charset_corpus(n_docs: int, seed: int = 42,
                          cache_root: str = "/tmp/ppr_corpus") -> str:
    """Generate-once disk cache for the charset-detection corpus."""
    import ray.data

    out_dir = os.path.join(cache_root, f"charset_n{n_docs}_s{seed}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    parallelism = max(8, min(64, n_docs // 2000 or 8))
    (
        ray.data.range(n_docs, override_num_blocks=parallelism)
        .map_batches(_gen_charset_batch, fn_kwargs={"seed": seed},
                     batch_format="pyarrow", batch_size=2000)
        .write_parquet(out_dir)
    )
    with open(marker, "w") as f:
        f.write(f"{n_docs} {seed}\n")
    return out_dir
