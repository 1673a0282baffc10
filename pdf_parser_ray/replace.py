"""Text replacement pipeline — the reference's `replace` entry point,
re-expressed over corpus rows.

Semantics pinned to /root/reference/pdf_parser/core/replacer.py:

* Whole-document char/code inventory pre-pass (replacer.py:119-214):
  per font, every decoded char maps to the set of code bytes observed in
  the streams.  REPLACE-path decode strips ALL backslashes
  (replacer.py:199/356/487) — intentionally different from the parse
  path (SURVEY.md §2.11).
* Rewrite scan (replacer.py:470-801): alternation over Tj/TJ/Tf/Tm;
  unmatched spans copied verbatim; matched show ops whose decoded text
  == target (exact equality, no strip) are spliced with the re-encoded
  replacement; everything else passes through byte-for-byte.
* Instance gate (replacer.py:492-500): ``instance_index >= 0`` replaces
  only that occurrence (counting matches in stream order).
* Char resolution (replacer.py:546-761), auto-insert DISABLED (the
  reference's auto-insert→font-embedding path is broken — imports a
  nonexistent symbol, embedding.py:68 / SURVEY.md §2.11): every
  replacement char must resolve via the font's observed codes
  (deterministically the smallest observed code; the reference takes an
  unspecified set-iteration pick, replacer.py:631-633) or the CMap
  reverse map; otherwise the segment is preserved unchanged.  Divergence
  (documented): when an unsupported char aborts a segment the reference
  can append the original segment TWICE (replacer.py:616+746-749 — the
  "should never reach here" path) — we preserve it once.
* Splice (replacer.py:780-791): ``escape_pdf_string`` of the latin1
  re-encoded bytes; TJ arrays collapse to ``[(new)]``.
* Save (replacer.py:824-827): the page's /Contents swaps to a new
  uncompressed stream; minipdf re-serializes the whole document.
"""

from __future__ import annotations

import re
from typing import Any

from pdf_parser_ray.core.cmap import decode_pdf_string, escape_pdf_string
from pdf_parser_ray.extract import page_font_cmaps
from pdf_parser_ray.minipdf.document import PdfDocument, PdfError
from pdf_parser_ray.minipdf.objects import PdfRef, PdfStream
from pdf_parser_ray.minipdf.serialize import serialize_document

# Rewrite-scan alternation (replacer.py:470-472).
REPLACE_SCAN_RE = re.compile(
    r"(?:\(((?:[^()\\]|\\.)*)\)|\[((?:[^][\\()]|\\.)*)\])\s*T[Jj]"
    r"|/[A-Za-z0-9]+\s+\d+\s+Tf"
    r"|(?:[-\d.]+\s+){5}[-\d.]+\s+Tm"
)
TEXT_RE = re.compile(r"(?:\(((?:[^()\\]|\\.)*)\)|\[((?:[^][\\()]|\\.)*)\])\s*T[Jj]")
FONT_RE = re.compile(r"/([A-Za-z0-9]+)\s+\d+\s+Tf")

WHITESPACE_OK = set(" \t\n\r")  # replacer.py:552


def build_char_inventory(
    doc: PdfDocument, cmap_cache: dict | None = None
) -> dict[str, dict[str, set[int]]]:
    """Whole-document ``font → char → {codes}`` pre-pass
    (replacer.py:119-214, replace-path decode)."""
    inventory: dict[str, dict[str, set[int]]] = {}
    for page in doc.pages:
        font_cmaps = page_font_cmaps(doc, page, cmap_cache)
        content = doc.page_content_bytes(page)
        if not content:
            continue
        content_str = content.decode("latin1", errors="replace")
        current_font = None
        for m in REPLACE_SCAN_RE.finditer(content_str):
            fm = FONT_RE.search(m.group(0))
            if fm:
                current_font = "/" + fm.group(1)
                continue
            tm = TEXT_RE.search(m.group(0))
            if tm and current_font in font_cmaps:
                is_tj = m.group(0).strip().endswith("TJ")
                inner = tm.group(2) if is_tj else tm.group(1)
                raw = inner.replace("\\", "")  # replace-path unescape
                encoded = raw.encode("latin1")
                decoded = decode_pdf_string(encoded, font_cmaps[current_font])
                slot = inventory.setdefault(current_font, {})
                for ch, code in zip(decoded, encoded):
                    slot.setdefault(ch, set()).add(code)
    return inventory


def rewrite_content(
    content_str: str,
    font_cmaps: dict[str, dict[bytes, str]],
    inventory: dict[str, dict[str, set[int]]],
    target_text: str,
    replacement_text: str,
    instance_index: int = -1,
) -> tuple[str, int]:
    """The replacer.py:470-801 loop; returns (new_content, n_replaced)."""
    new_segments: list[str] = []
    current_pos = 0
    current_font: str | None = None
    current_instance = 0
    n_replaced = 0

    for segment in REPLACE_SCAN_RE.finditer(content_str):
        if segment.start() > current_pos:
            new_segments.append(content_str[current_pos : segment.start()])
        whole = segment.group(0)

        fm = FONT_RE.search(whole)
        if fm:
            current_font = "/" + fm.group(1)
            new_segments.append(whole)
            current_pos = segment.end()
            continue

        tm = TEXT_RE.search(whole)
        replaced_here = False
        if tm and current_font in font_cmaps:
            is_tj = whole.strip().endswith("TJ")
            inner = tm.group(2) if is_tj else tm.group(1)
            raw = inner.replace("\\", "")
            encoded = raw.encode("latin1")
            decoded = decode_pdf_string(encoded, font_cmaps[current_font])

            if decoded == target_text:
                gate_ok = True
                if instance_index >= 0:
                    gate_ok = current_instance == instance_index
                    current_instance += 1
                if gate_ok:
                    new_codes = _resolve_codes(
                        replacement_text,
                        inventory.get(current_font, {}),
                        font_cmaps[current_font],
                    )
                    if new_codes is not None:
                        new_str = escape_pdf_string(bytes(new_codes).decode("latin1"))
                        if is_tj:
                            seg_txt = whole.replace(f"[{tm.group(2)}]", f"[({new_str})]")
                        else:
                            seg_txt = whole.replace(f"({tm.group(1)})", f"({new_str})")
                        new_segments.append(seg_txt)
                        n_replaced += 1
                        replaced_here = True

        if not replaced_here:
            new_segments.append(whole)
        current_pos = segment.end()

    if current_pos < len(content_str):
        new_segments.append(content_str[current_pos:])
    return "".join(new_segments), n_replaced


def _resolve_codes(
    replacement_text: str,
    font_inventory: dict[str, set[int]],
    cmap: dict[bytes, str],
) -> list[int] | None:
    """Char→code resolution, auto-insert disabled (replacer.py:546-657).

    None → segment must be preserved (unsupported char present).
    """
    # Support gate (replacer.py:546-560): every char must be in the
    # font's observed chars or be whitespace.
    for ch in replacement_text:
        if ch not in font_inventory and ch not in WHITESPACE_OK:
            return None
    char_to_code = {v: k[0] for k, v in cmap.items()}
    codes: list[int] = []
    for ch in replacement_text:
        if ch in font_inventory and font_inventory[ch]:
            codes.append(min(font_inventory[ch]))  # deterministic pick
        elif ch in char_to_code:
            codes.append(char_to_code[ch])
        else:
            return None  # whitespace with no observed code / cmap entry
    if not codes:
        return None
    return codes


def replace_text_in_pdf(
    payload: bytes,
    target_text: str,
    replacement_text: str,
    page_num: int = 0,
    instance_index: int = -1,
    cmap_cache: dict | None = None,
    allow_auto_insert: bool = False,
    log: list[str] | None = None,
) -> dict[str, Any]:
    """One document replace; returns {html, status, n_replaced}.

    On any failure (or no match) the ORIGINAL payload is returned —
    mirroring the reference's copy-input-to-output fallbacks
    (replacer.py:439-467, replacer.py:830-832).

    ``allow_auto_insert`` mirrors the reference flag (replacer.py:43-45)
    but only False is implemented: the True path is dead code upstream
    (its font-embedding step raises ImportError internally,
    embedding.py:68 / SURVEY.md §2.11).  ``log`` collects reference-style
    audit lines (the replace_log.txt surface, replacer.py:834-839) as
    data instead of a shared file.
    """
    if allow_auto_insert:
        raise NotImplementedError(
            "allow_auto_insert=True is outside the byte-exact contract "
            "(the reference's auto-insert path is broken: embedding.py:68)"
        )
    if log is None:
        log = []
    if target_text == replacement_text:
        log.append("ERROR: target and replacement are identical")
        return {"html": payload, "status": "error:same_text", "n_replaced": 0}
    try:
        doc = PdfDocument(payload)
    except PdfError as e:
        log.append(f"ERROR: cannot open document ({e.kind})")
        return {"html": payload, "status": f"error:{e.kind}", "n_replaced": 0}
    if page_num < 0 or page_num >= len(doc.pages):
        log.append(f"ERROR: page {page_num} out of range (document has {len(doc.pages)})")
        return {"html": payload, "status": "error:page_range", "n_replaced": 0}

    inventory = build_char_inventory(doc, cmap_cache)
    page = doc.pages[page_num]
    font_cmaps = page_font_cmaps(doc, page, cmap_cache)
    content = doc.page_content_bytes(page)
    if not content:
        return {"html": payload, "status": "error:no_content", "n_replaced": 0}

    content_str = content.decode("latin1", errors="replace")
    new_content, n_replaced = rewrite_content(
        content_str, font_cmaps, inventory, target_text, replacement_text,
        instance_index,
    )
    if not n_replaced:
        log.append(f"WARNING: no matching text found on page {page_num + 1}, nothing replaced")
        return {"html": payload, "status": "no_match", "n_replaced": 0}
    log.append(f"INFO: replaced {n_replaced} occurrence(s) of target on page {page_num + 1}")

    # Swap /Contents to a fresh uncompressed stream object.
    new_stream = PdfStream(
        {"/Length": len(new_content)}, new_content.encode("latin1")
    )
    new_num = (max(doc.objects) if doc.objects else 0) + 1
    doc.objects[new_num] = new_stream
    page["/Contents"] = PdfRef(new_num, 0)
    try:
        out = serialize_document(doc)
    except Exception:
        return {"html": payload, "status": "error:serialize", "n_replaced": 0}
    return {"html": out, "status": "ok", "n_replaced": n_replaced}


def load_rules(path: str):
    """Rules-table file reader (S9, reference pdf_gui.py:1671-1690
    ``pd.read_excel(path, header=None)``): ``.xlsx`` workbooks through
    the from-scratch OOXML reader (no openpyxl in the environment),
    plus ``.csv`` (header=None) and ``.parquet`` equivalents.  Returns
    the headerless frame :func:`rule_columns` consumes.  Driver-side by
    design — rule sheets are tiny side tables broadcast into the actor
    pool, never corpus data."""
    import pandas as pd

    if path.endswith(".xlsx"):
        from pdf_parser_ray.xlsx import read_xlsx

        return read_xlsx(path)
    if path.endswith(".csv"):
        return pd.read_csv(path, header=None)
    if path.endswith(".parquet"):
        import pyarrow.parquet as pq

        return pq.read_table(path).to_pandas()
    raise ValueError(f"unsupported rules file (need .xlsx/.csv/.parquet): {path}")


def rule_columns(df) -> dict[int, list[tuple[str, str]]]:
    """Batch-replace rule table → per-variant-column rule lists (S9/J1).

    The reference reads an Excel sheet with no header: column 0 is the
    template text, columns 1..n are replacement variants; each variant
    column drives one full fold over the document
    (pdf_gui.py:1671-1690, fold at pdf_gui.py:1704-1758).  We accept any
    pandas DataFrame of that shape (CSV/Parquet-sourced — no Excel dep).
    """
    out: dict[int, list[tuple[str, str]]] = {}
    ncols = df.shape[1]
    for col in range(1, ncols):
        rules = []
        for _, row in df.iterrows():
            target = row.iloc[0]
            repl = row.iloc[col]
            if isinstance(target, str) and isinstance(repl, str) and target:
                rules.append((target, repl))
        out[col] = rules
    return out


class ReplaceDocuments:
    """Actor-pool stage: fold a rule list over every PDF row.

    Rules fold SEQUENTIALLY per document — the reference's Excel batch
    mode folds (target, replacement) pairs in column order over one file
    (pdf_gui.py:1704-1758, J1 in SURVEY.md §2.4).  The rules list is tiny
    and broadcast via the actor constructor args (shipped once per actor,
    not per batch).
    """

    def __init__(self, rules: list[tuple[str, str]], page_num: int = 0,
                 verbosity: int = 0):
        self.rules = rules
        self.page_num = page_num
        self.verbosity = verbosity  # 0 = no log column content (S8/§2.10)
        self.cmap_cache: dict = {}

    def __call__(self, batch):
        import pyarrow as pa

        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        out_payload, out_status, out_n, out_log = [], [], [], []
        for payload in payloads:
            payload = payload or b""
            if not payload.startswith(b"%PDF-"):
                out_payload.append(payload)
                out_status.append("skip:not_pdf")
                out_n.append(0)
                out_log.append("")
                continue
            total = 0
            status = "no_match"
            log: list[str] = []
            for target, replacement in self.rules:
                res = replace_text_in_pdf(
                    payload, target, replacement, self.page_num,
                    cmap_cache=self.cmap_cache, log=log,
                )
                if res["n_replaced"]:
                    payload = res["html"]
                    total += res["n_replaced"]
                    status = "ok"
                elif res["status"].startswith("error:") and status != "ok":
                    status = res["status"]
            out_payload.append(payload)
            out_status.append(status)
            out_n.append(total)
            # verbosity gates log classes like the reference CLI levels
            # (replacer.py:68-79): 0 = off, 1 = WARN/ERROR, 2+ = all.
            if self.verbosity <= 0:
                out_log.append("")
            elif self.verbosity == 1:
                out_log.append("\n".join(
                    ln for ln in log if not ln.startswith("INFO")))
            else:
                out_log.append("\n".join(log))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(out_payload, pa.binary()),
                "replace_status": pa.array(out_status, pa.string()),
                "n_replaced": pa.array(out_n, pa.int32()),
                "log": pa.array(out_log, pa.string()),
            }
        )


def replace_corpus(
    ds,
    rules: list[tuple[str, str]],
    *,
    page_num: int = 0,
    verbosity: int = 0,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 32,
):
    """Corpus-level replace: Dataset in → (url, html, replace_status,
    n_replaced, log) Dataset out.  ``verbosity`` gates the log column
    (0 off, 1 warnings+errors, 2 all — reference CLI levels)."""
    return ds.map_batches(
        ReplaceDocuments,
        fn_constructor_kwargs={"rules": rules, "page_num": page_num,
                               "verbosity": verbosity},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
