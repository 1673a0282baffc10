"""Webtext-corpus curation operators (the C4/CCNet/Gopher tier).

Public-recipe operators a Common-Crawl-scale training-data pipeline runs
after extraction (north_rule: "main-content extraction pipeline ... over
Common-Crawl-style web pages"):

* :func:`passage_dedup` — CCNet-style repeated-passage removal: any
  fixed-width word window whose exact content recurs ≥ ``max_repeats``
  times corpus-wide is dropped from every document (boilerplate
  banners, navigation crumbs, cookie notices).
* :func:`repetition_stats` — Gopher-style per-document repetition
  signals (duplicate-word fraction, top-word fraction) used as quality
  gates.
* :func:`pii_redact` — regex PII scrub (emails, phone-like runs) with
  per-doc redaction counts; patterns are RE2-safe so a SQL engine
  applies the identical automaton.
* :func:`stratified_sample` — deterministic per-language hash sampling
  (md5 of the doc id against a per-stratum hex threshold): every worker
  — and every rerun — selects the same rows with no RNG state.

Shuffle discipline: passage_dedup is the only op here that shuffles at
all, and it shuffles ONE small (passage_hash:int64, n:int64) partial-
count stream; the removal pass is a broadcast filter, so document
payloads never move.  Everything else is embarrassingly row-local
map_batches.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import ray
import ray.data

from pdf_parser_ray.io_utils import arrow_out

# RE2-safe patterns (no backrefs/lookaround) + re.ASCII so \s, \d match
# DuckDB's RE2 semantics — the oracle-parity rule from ops.text_stats.
EMAIL_PAT = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", re.ASCII)
PHONE_PAT = re.compile(r"\+?[0-9][0-9()\-\s]{6,}[0-9]", re.ASCII)
_WS_RUN = re.compile(r"\s+", re.ASCII)


def _hash_passages(passages: list) -> np.ndarray:
    """Vectorized int64 hashes for a flat passage list — the shuffle key
    for passage counts.

    ``pandas.util.hash_array`` (siphash-1-3, FIXED key) is deterministic
    across processes and reruns (ops/sketches.py rationale) and replaces
    a per-passage ``hashlib.md5`` Python loop that dominated
    passage_dedup's runtime (~10M calls at sf0.1 across the two passes).
    Collision odds at 2^-64 per pair are negligible even at 10^12
    passages; the SQL oracle groups by the raw passage STRING, which
    agrees except under such a collision.

    CAVEAT: the underlying siphash reads each element as a C string —
    it TRUNCATES at an embedded NUL, so keys containing "\\x00"
    systematically collide (callers compose multi-part keys with "\\n"
    instead; see host_boilerplate_strip).
    """
    if not len(passages):
        return np.empty(0, dtype=np.int64)
    return pd.util.hash_array(np.asarray(passages, dtype=object)).view(np.int64)


def _doc_passages(text: str, words_per_passage: int) -> list[str]:
    # str.split(' ') (NOT \s+) to mirror SQL string_split(text, ' ')
    # exactly, including empty tokens from doubled spaces.
    words = text.split(" ")
    w = words_per_passage
    return [" ".join(words[i : i + w]) for i in range(0, len(words), w)]


def passage_dedup(
    ds: ray.data.Dataset,
    *,
    words_per_passage: int = 2,
    max_repeats: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 5_000_000,
    mode: str = "broadcast",
) -> ray.data.Dataset:
    """Remove every passage that appears ≥ ``max_repeats`` times corpus-wide.

    ``mode="broadcast"`` (default — one shuffle total):

    1. map_batches: per-batch passage explode + PARTIAL counts (the
       combiner) → (passage_hash:int64, n) rows.
    2. groupby(passage_hash).sum — the only all-to-all; keys are
       siphash values → uniform, no skew.
    3. hot set = hashes with n ≥ max_repeats.  Bounded above by
       total_passages / max_repeats and in practice tiny (boilerplate);
       broadcast via ``ray.put``.  ``broadcast_limit`` guards the
       pathological case.
    4. map_batches over the ORIGINAL documents: recompute passages
       row-locally, drop hot ones, reassemble.  Document payloads never
       enter a shuffle.

    ``mode="join"`` — the scale path when even the hot SET outgrows a
    broadcast: explode (doc_id, pidx, passage_hash) rows, hash-join the
    hot hashes in, reassemble via groupby(doc_id).  Three all-to-alls
    but no driver-side collection and no broadcast of any size.  Both
    modes produce identical output (parity-tested).

    Output: (id_col, clean_text) — documents whose every passage was
    removed are dropped (matches the SQL inner-join formulation).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.stages import worker_state

    w = words_per_passage

    def partial_counts(df: pd.DataFrame):
        flat: list = []
        for text in df[text_col].fillna(""):
            flat.extend(_doc_passages(text, w))
        uniq, cnt = np.unique(_hash_passages(flat), return_counts=True)
        return arrow_out(pd.DataFrame(
            {"passage_hash": uniq.astype(np.int64), "n": cnt.astype(np.int64)}
        ))

    totals = (
        ds.map_batches(partial_counts, batch_format="pandas")
        .groupby("passage_hash")
        .aggregate(Sum("n", alias_name="n"))
    )
    hot = totals.map_batches(
        lambda df, _k=max_repeats: df[df["n"] >= _k][["passage_hash"]],
        batch_format="pandas",
    )

    if mode == "join":
        return _passage_dedup_join(ds, hot, w, text_col=text_col, id_col=id_col)

    hot_df = hot.limit(broadcast_limit + 1).to_pandas()
    if "passage_hash" not in hot_df.columns:  # empty dataset → column-less frame
        hot_df = pd.DataFrame({"passage_hash": pd.Series([], dtype="int64")})
    if len(hot_df) > broadcast_limit:
        raise ValueError(
            f"hot-passage set exceeds broadcast_limit={broadcast_limit}; "
            "use mode='join' for this corpus"
        )
    hot_ref = ray.put(
        np.sort(hot_df["passage_hash"].to_numpy(dtype=np.int64))
    )

    def scrub(df: pd.DataFrame):
        # hot set as a SORTED int64 array: membership via one
        # vectorized searchsorted over all passages in the batch.
        hot_arr = worker_state(
            ("passage_hot", hot_ref.hex()), lambda: ray.get(hot_ref)
        )
        flat: list = []
        offs = [0]
        for text in df[text_col].fillna(""):
            flat.extend(_doc_passages(text, w))
            offs.append(len(flat))
        h = _hash_passages(flat)
        if hot_arr.size and h.size:
            pos = np.searchsorted(hot_arr, h)
            np.clip(pos, 0, hot_arr.size - 1, out=pos)
            is_hot = hot_arr[pos] == h
        else:
            is_hot = np.zeros(h.size, dtype=bool)
        ids, cleaned = [], []
        for i, doc_id in enumerate(df[id_col]):
            s, e = offs[i], offs[i + 1]
            kept = [p for p, bad in zip(flat[s:e], is_hot[s:e]) if not bad]
            if kept:
                ids.append(doc_id)
                cleaned.append(" ".join(kept))
        return arrow_out(pd.DataFrame(
            {id_col: pd.Series(ids, dtype="int64"),
             "clean_text": pd.Series(cleaned, dtype="object")}
        ))

    return ds.map_batches(scrub, batch_format="pandas")


def _passage_dedup_join(
    ds: ray.data.Dataset,
    hot: ray.data.Dataset,
    w: int,
    *,
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Join-mode scrub: no broadcast, no driver collection.

    Exploded passages LEFT-join the hot hashes (hot side carries a
    marker column); unmarked rows survive; reassembly is one
    groupby(doc_id) over (pidx, passage) rows.  The exploded stream
    carries passage text — heavier than broadcast mode, which is why
    broadcast stays the default below ``broadcast_limit``.
    """
    from pdf_parser_ray.ops.relational import hash_join

    def explode(df: pd.DataFrame):
        ids, pidx, ptext = [], [], []
        for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
            for i, p in enumerate(_doc_passages(text, w)):
                ids.append(doc_id)
                pidx.append(i)
                ptext.append(p)
        return arrow_out(pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "pidx": pd.Series(pidx, dtype="int64"),
                "passage_hash": pd.Series(_hash_passages(ptext)),
                "passage": pd.Series(ptext, dtype="object"),
            }
        ))

    exploded = ds.map_batches(explode, batch_format="pandas")
    marked = hot.map_batches(
        lambda df: df.assign(__hot=np.int8(1)), batch_format="pandas"
    )
    joined = hash_join(
        exploded, marked, ["passage_hash"], join_type="left_outer"
    )

    def keep_cold(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["__hot"].isna()][[id_col, "pidx", "passage"]]

    cold = joined.map_batches(keep_cold, batch_format="pandas")

    def reassemble_partition(part: pd.DataFrame) -> pd.DataFrame:
        # Vectorized across docs: one sort + one groupby-agg join —
        # doc cardinality is corpus-scale, so no Python call per doc.
        part = part.sort_values([id_col, "pidx"])
        out = (
            part.groupby(id_col, sort=False)["passage"]
            .agg(" ".join)
            .reset_index()
        )
        out.columns = [id_col, "clean_text"]
        return out.astype({id_col: "int64"})

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(cold, [id_col], reassemble_partition)


# ASCII whitespace stripped from a line before it is counted — spelled
# out (NOT str.strip()'s full Unicode set) so the DuckDB twin's
# trim(line, ' '||chr(9)||chr(13)||chr(11)||chr(12)) matches exactly.
LINE_WS = " \t\r\x0b\x0c"


def line_dedup(
    ds: ray.data.Dataset,
    *,
    min_repeats: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 5_000_000,
    mode: str = "broadcast",
) -> ray.data.Dataset:
    """CCNet-style LINE-level dedup: drop every copy of any line whose
    whitespace-stripped form occurs ≥ ``min_repeats`` times corpus-wide
    (nav bars, cookie banners, footers — the boilerplate that survives
    DOM stripping because it IS real text on every page of a host).

    Differs from :func:`passage_dedup` where it matters for web text:
    lines are the document's own ``\\n`` structure (not fixed word
    windows); counting keys are the LINE_WS-stripped line (leading
    indent / trailing spaces don't split the count); whitespace-only
    lines are structural — always kept, never counted; and every
    document survives (possibly emptied) with (n_lines, n_dropped)
    audit columns, so downstream gates can threshold on how much was
    boilerplate.

    ``mode="broadcast"`` (default): per-batch partial counts of
    stripped-line siphashes → ONE uniform-key groupby(line_hash).sum →
    hot set (bounded by distinct repeated lines, guarded by
    ``broadcast_limit``) via ``ray.put`` → row-local scrub; document
    payloads never enter a shuffle.  ``mode="join"`` is the no-broadcast
    scale path (explode → hash-join hot markers → reassemble per doc);
    both modes are parity-tested.  The SQL twin groups by the stripped
    line STRING — agreement modulo a 2^-64 siphash collision (the
    _hash_passages rationale).

    Output: (id_col, clean_text, n_lines:int64, n_dropped:int64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.stages import worker_state

    def _norms(lines: list) -> list:
        return [ln.strip(LINE_WS) for ln in lines]

    def partial_counts(df: pd.DataFrame):
        flat: list = []
        for text in df[text_col].fillna(""):
            flat.extend(n for n in _norms(text.split("\n")) if n)
        uniq, cnt = np.unique(_hash_passages(flat), return_counts=True)
        return arrow_out(pd.DataFrame(
            {"line_hash": uniq.astype(np.int64), "n": cnt.astype(np.int64)}
        ))

    totals = (
        ds.map_batches(partial_counts, batch_format="pandas")
        .groupby("line_hash")
        .aggregate(Sum("n", alias_name="n"))
    )
    hot = totals.map_batches(
        lambda df, _k=min_repeats: df[df["n"] >= _k][["line_hash"]],
        batch_format="pandas",
    )

    if mode == "join":
        return _line_dedup_join(ds, hot, text_col=text_col, id_col=id_col)

    hot_df = hot.limit(broadcast_limit + 1).to_pandas()
    if "line_hash" not in hot_df.columns:  # empty dataset → column-less frame
        hot_df = pd.DataFrame({"line_hash": pd.Series([], dtype="int64")})
    if len(hot_df) > broadcast_limit:
        raise ValueError(
            f"hot-line set exceeds broadcast_limit={broadcast_limit}; "
            "use mode='join' for this corpus"
        )
    hot_ref = ray.put(np.sort(hot_df["line_hash"].to_numpy(dtype=np.int64)))

    def scrub(df: pd.DataFrame):
        hot_arr = worker_state(
            ("line_hot", hot_ref.hex()), lambda: ray.get(hot_ref)
        )
        ids, cleaned, n_lines, n_dropped = [], [], [], []
        for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
            lines = text.split("\n")
            norms = _norms(lines)
            nonblank = [n for n in norms if n]
            h = _hash_passages(nonblank)
            if hot_arr.size and h.size:
                pos = np.searchsorted(hot_arr, h)
                np.clip(pos, 0, hot_arr.size - 1, out=pos)
                is_hot = iter(hot_arr[pos] == h)
            else:
                is_hot = iter([False] * len(nonblank))
            kept = [ln for ln, nrm in zip(lines, norms)
                    if not nrm or not next(is_hot)]
            ids.append(doc_id)
            cleaned.append("\n".join(kept))
            n_lines.append(len(lines))
            n_dropped.append(len(lines) - len(kept))
        return arrow_out(pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "clean_text": pd.Series(cleaned, dtype="object"),
                "n_lines": pd.Series(n_lines, dtype="int64"),
                "n_dropped": pd.Series(n_dropped, dtype="int64"),
            }
        ))

    return ds.map_batches(scrub, batch_format="pandas")


def _line_dedup_join(
    ds: ray.data.Dataset,
    hot: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Join-mode line scrub — no broadcast, no driver collection.

    Every line travels as an exploded (doc_id, ord, line_hash, line)
    row (blank lines carry hash 0 and a blank flag so they can never
    match hot); hot hashes LEFT-join a marker in; reassembly is one
    partitioned groupby(doc_id) that KEEPS emptied docs because dropped
    rows still travel (flagged, not filtered) — the (n_lines,
    n_dropped) audit needs them anyway.
    """
    from pdf_parser_ray.ops.relational import hash_join

    def explode(df: pd.DataFrame):
        ids, ords, lines_out, blanks = [], [], [], []
        for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
            lines = text.split("\n")
            ids.extend([doc_id] * len(lines))
            ords.extend(range(len(lines)))
            lines_out.extend(lines)
            blanks.extend(not ln.strip(LINE_WS) for ln in lines)
        norms = [ln.strip(LINE_WS) for ln in lines_out]
        h = _hash_passages(norms)
        blank_arr = np.asarray(blanks, dtype=bool)
        if h.size:
            h[blank_arr] = 0
        return arrow_out(pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "ord": pd.Series(ords, dtype="int64"),
                "line_hash": pd.Series(h, dtype="int64"),
                "line": pd.Series(lines_out, dtype="object"),
                "blank": pd.Series(blank_arr),
            }
        ))

    exploded = ds.map_batches(explode, batch_format="pandas")
    marked = hot.map_batches(
        lambda df: df.assign(__hot=np.int8(1)), batch_format="pandas"
    )
    joined = hash_join(exploded, marked, ["line_hash"], join_type="left_outer")

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["blank"] | df["__hot"].isna()
        return df.assign(keep=keep)[[id_col, "ord", "line", "keep"]]

    flagged = joined.map_batches(flag, batch_format="pandas")

    def reassemble_partition(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([id_col, "ord"])
        n_lines = part.groupby(id_col, sort=False).size()
        kept = part[part["keep"]]
        clean = (
            kept.groupby(id_col, sort=False)["line"]
            .agg("\n".join)
            .reindex(n_lines.index, fill_value="")
        )
        n_kept = (
            kept.groupby(id_col, sort=False)
            .size()
            .reindex(n_lines.index, fill_value=0)
        )
        out = pd.DataFrame(
            {
                id_col: n_lines.index.to_numpy(),
                "clean_text": clean.to_numpy(dtype=object),
                "n_lines": n_lines.to_numpy(dtype=np.int64),
                "n_dropped": (n_lines - n_kept).to_numpy(dtype=np.int64),
            }
        )
        return out.astype({id_col: "int64"})

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(flagged, [id_col], reassemble_partition)


def repetition_stats(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Gopher-style repetition signals, one row per document.

    Output: (id_col, n_words:int64, n_distinct:int64, dup_frac:float64,
    top_frac:float64) where dup_frac = 1 - distinct/total and top_frac =
    most-frequent-word count / total.  Fractions are UNROUNDED: both
    sides divide the identical int64 operands, so the doubles are
    bit-identical (the per-row-ratio rule).
    """

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        n_words, n_distinct, top = [], [], []
        for text in df[text_col].fillna(""):
            c = Counter(text.split(" "))  # split(' ') == SQL string_split
            total = sum(c.values())
            n_words.append(total)
            n_distinct.append(len(c))
            top.append(max(c.values()) if c else 0)
        n_words_a = np.asarray(n_words, dtype=np.int64)
        n_distinct_a = np.asarray(n_distinct, dtype=np.int64)
        top_a = np.asarray(top, dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "n_words": n_words_a,
                "n_distinct": n_distinct_a,
                "dup_frac": 1.0 - n_distinct_a / n_words_a.astype(np.float64),
                "top_frac": top_a / n_words_a.astype(np.float64),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_gate(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 30,
    max_words: int = 90,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopword_hits: int = 2,
) -> ray.data.Dataset:
    """Gopher-style composite quality gate (Rae et al. 2021, public
    rules): word-count bounds, mean-word-length band, and a minimum
    number of canonical-stopword occurrences.  One row per document
    with each signal plus the combined ``keep`` verdict — downstream
    pipelines filter on ``keep`` (or on individual signals).

    Tokenization is the repo-standard lowered ``\\S+`` so the DuckDB
    oracle reproduces it with ``regexp_extract_all(lower(text),'\\S+')``.
    ``mean_word_len`` divides two int64s → bit-identical doubles on
    both engines (the per-row-ratio rule); zero-word docs emit 0.0 and
    fail the gate.  Row-local — no shuffle at any scale.

    Output: (id_col, n_words:int64, mean_word_len:float64,
    stopword_hits:int64, keep:bool).
    """
    stop = set(GOPHER_STOPWORDS)

    def gate(df: pd.DataFrame):
        # TOKEN_PAT (re.ASCII \S+), not a raw r"\S+": Python's Unicode
        # \S splits on U+00A0 etc. where the DuckDB/RE2 oracle doesn't
        # (text_stats.TOKEN_PAT rationale).
        from pdf_parser_ray.ops.text_stats import TOKEN_PAT

        toks = (
            df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        )
        ex = toks.explode().dropna()
        n = len(df)
        n_words = np.zeros(n, dtype=np.int64)
        total_len = np.zeros(n, dtype=np.int64)
        stop_hits = np.zeros(n, dtype=np.int64)
        if len(ex):
            # positional row index of each token → bincount per doc
            pos_map = pd.Series(np.arange(n), index=df.index)
            pos = pos_map[ex.index].to_numpy(dtype=np.int64)
            n_words = np.bincount(pos, minlength=n).astype(np.int64)
            total_len = np.bincount(
                pos, weights=ex.str.len().to_numpy(dtype=np.float64),
                minlength=n,
            ).astype(np.int64)
            m = ex.isin(stop).to_numpy()
            if m.any():
                stop_hits = np.bincount(pos[m], minlength=n).astype(np.int64)
        mean_len = np.where(
            n_words > 0, total_len / np.maximum(n_words, 1), 0.0
        )
        keep = (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len)
            & (stop_hits >= min_stopword_hits)
        )
        return arrow_out(pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "n_words": n_words,
                "mean_word_len": mean_len.astype(np.float64),
                "stopword_hits": stop_hits,
                "keep": keep,
            }
        ))

    return ds.map_batches(gate, batch_format="pandas")


def pii_redact(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Scrub emails then phone-like digit runs; count each per document.

    Output: (id_col, clean_text:string, n_emails:int64, n_phones:int64).
    Emails are replaced FIRST, then phones scan the email-redacted text —
    the fixed order every engine must apply for identical output.
    """

    def redact(df: pd.DataFrame) -> pd.DataFrame:
        text = df[text_col].fillna("")
        n_emails = text.str.count(EMAIL_PAT).astype("int64")
        no_email = text.str.replace(EMAIL_PAT, "[EMAIL]", regex=True)
        n_phones = no_email.str.count(PHONE_PAT).astype("int64")
        clean = no_email.str.replace(PHONE_PAT, "[PHONE]", regex=True)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "clean_text": clean,
                "n_emails": n_emails,
                "n_phones": n_phones,
            }
        )

    return ds.map_batches(redact, batch_format="pandas")


def stratified_sample(
    ds: ray.data.Dataset,
    rate_hex: dict[str, str],
    *,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_hex: str = "00",
) -> ray.data.Dataset:
    """Deterministic per-stratum sample: keep a row iff the first two
    md5 hex chars of ``str(id)`` sort below the stratum's threshold.

    ``rate_hex`` maps stratum → 2-hex-char threshold ('80' ≈ 50 %,
    '20' ≈ 12.5 %, 'ff' ≈ 99.6 %); granularity is 1/256.  Hash-gate
    sampling (md5, not RNG) means reruns, retries and different
    partitionings all pick the identical sample — the property that
    makes the op resumable and its SQL twin exact.
    """

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        prefixes = df[id_col].map(
            lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest()[:2]
        )
        thresholds = df[stratum_col].map(lambda s: rate_hex.get(s, default_hex))
        return df[(prefixes < thresholds).to_numpy()]

    return ds.map_batches(keep, batch_format="pandas")


def normalize_text(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Canonical text normalization (the pre-dedup step every web-text
    recipe runs so hash/minhash keys are layout-invariant):

    1. Unicode NFC composition (é as one codepoint, not e + U+0301),
    2. lowercase,
    3. collapse ASCII whitespace runs to one space,
    4. strip leading/trailing spaces.

    Step order is part of the contract — NFC BEFORE lower matches what
    ``nfc_normalize`` + ``lower`` compose to in a SQL engine.  ASCII
    ``\\s`` (not Python's Unicode default) keeps the collapse aligned
    with RE2 so the DuckDB twin is value-identical.  Row-local
    ``map_batches``; no shuffle.

    Output: (id_col, norm_text:string, norm_chars:int64).
    """
    ws = _WS_RUN

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        text = df[text_col].fillna("")
        out = (
            text.str.normalize("NFC")
            .str.lower()
            .str.replace(ws, " ", regex=True)
            .str.strip(" ")
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "norm_text": out,
                "norm_chars": out.str.len().astype("int64"),
            }
        )

    return ds.map_batches(norm, batch_format="pandas")


def group_sample(
    ds: ray.data.Dataset,
    k: int,
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic k-per-group sample: keep each group's k rows with
    the smallest ``md5(str(id))`` — a rerun-stable stand-in for
    per-stratum reservoir sampling (same hash-gate family as
    :func:`stratified_sample`, but an exact COUNT per group instead of
    an approximate rate).

    Scale shape = grouped top-k without map_groups: every batch keeps
    its local k-smallest per group (map_batches partial), so the final
    groupby sees ≤ k × n_batches rows per group regardless of corpus
    size.  Output: (group_col, id_col), k rows per group (fewer if the
    group is smaller).
    """

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, id_col]].copy()
        out["__h"] = out[id_col].map(
            lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest()
        )
        return out

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values("__h")
            .groupby(group_col, as_index=False, sort=False)
            .head(k)
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("__h").head(k)[[group_col, id_col]]

    partial = ds.map_batches(add_rank, batch_format="pandas").map_batches(
        local_topk, batch_format="pandas"
    )
    # group count = strata (bounded, e.g. languages) → plain map_groups
    return partial.groupby(group_col).map_groups(
        final_topk, batch_format="pandas"
    )


def per_group_cap(
    ds: ray.data.Dataset,
    k: int,
    *,
    group_col: str = "source",
    order_cols: tuple[str, ...] = ("doc_id",),
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Cap each group at its first ``k`` rows by ``order_cols`` — the
    per-domain document cap every Common-Crawl curation recipe applies
    so one boilerplate-heavy host can't dominate the corpus (the
    deterministic ORDER BY twin of :func:`group_sample`'s hash pick).

    Scale shape = grouped top-k without per-key map_groups: a row can
    rank ≤ k globally only if it ranks ≤ k inside its own batch, so
    each batch prunes to its local k-head per group (one vectorized
    sort + groupby.head) and only ≤ k·batches rows per group reach the
    final pass, which co-locates by hashed group and re-heads across
    whole partitions (``ops.shuffle.partitioned_map`` — no per-group
    task overhead at domain cardinality).

    Output: (group_col, *order_cols), ≤ k rows per group.
    """
    cols = [group_col, *order_cols]
    order = list(order_cols)

    def local_head(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df[cols]
            .sort_values(order, kind="mergesort")
            .groupby(group_col, sort=False)
            .head(k)
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    partial = ds.map_batches(local_head, batch_format="pandas")
    return partitioned_map(
        partial, [group_col], local_head,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def bernoulli_gate(
    ds: ray.data.Dataset,
    *,
    prob_col: str,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic per-row Bernoulli sampling: keep each row with its
    own probability ``prob_col`` (clipped to [0,1]) — the importance-
    sampling primitive quality-weighted data mixes use (keep good docs
    with high probability, bad docs rarely, no RNG).

    The coin is the 16-bit md5 hash gate keyed on the row id — the same
    family as :func:`stratified_sample` — so reruns, retries and any
    partitioning keep the identical row set, and a SQL twin reproduces
    the sample exactly.  Row-local; no shuffle.
    """

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        p = df[prob_col].to_numpy(dtype=np.float64)
        thr = np.floor(np.clip(p, 0.0, 1.0) * 65536.0).astype(np.int64)
        h = df[id_col].map(
            lambda i: int(
                hashlib.md5(str(i).encode("ascii")).hexdigest()[:4], 16
            )
        ).to_numpy(dtype=np.int64)
        return df[h < thr]

    return ds.map_batches(gate, batch_format="pandas")


def weighted_sample_topk(
    ds: "ray.data.Dataset",
    k: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    round_to: int = 6,
    pool_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-Res scheme with md5-derived uniforms: row i
    gets key u_i^(1/w_i), u_i = (first-12-hex(md5(str(id))) + 1) /
    (2^48 + 1), and the global top-k keys win.  Rerun- and
    partitioning-invariant (no RNG state), exactly the property a
    resumable 100-TB mixing job needs; inclusion probability follows
    the weights.

    Shape: per-batch partial top-k (each batch keeps its k best — the
    only rows that can survive globally), then a DRIVER finish over
    ≤ k × batches rows: the final order is computed in one pandas sort
    rather than a distributed Sort→limit, whose k-row result's block
    arrival order proved load-dependent (flaked under a contended box)
    and whose exchange barrier is pure overhead for a k-row answer.

    ``pool_limit`` is the loud-failure cap on that driver pool
    (VERDICT r4 #8, the ``incremental_dedup.positives_limit`` rule):
    the collection is a bounded ``limit(pool_limit + 1)`` probe, so a
    mis-sized call (huge k × many batches) raises cleanly instead of
    OOMing the driver at 100× scale.

    Output: (id_col, wkey:float64), ordered (wkey DESC, id ASC), k rows.
    """
    import hashlib

    from pdf_parser_ray.io_utils import arrow_out

    denom = float(2**48 + 1)

    def partial(df: pd.DataFrame):
        ids = df[id_col].astype("int64")
        u = (
            ids.map(
                lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
            ).astype("float64")
            + 1.0
        ) / denom
        w = df[weight_col].astype("float64").to_numpy()
        wkey = np.round(np.power(u.to_numpy(), 1.0 / w), round_to)
        out = pd.DataFrame({id_col: ids, "wkey": wkey})
        out = out.sort_values(
            ["wkey", id_col], ascending=[False, True]
        ).head(k)
        return arrow_out(out)

    pool = (
        ds.map_batches(partial, batch_format="pandas")
        .limit(pool_limit + 1)  # bounded probe — never an unbounded pull
        .to_pandas()
    )
    if len(pool) > pool_limit:
        raise ValueError(
            f"weighted_sample_topk partial pool exceeds pool_limit="
            f"{pool_limit} (k × batches rows reach the driver); lower k, "
            "coarsen batches, or raise pool_limit"
        )
    top = pool.sort_values(
        ["wkey", id_col], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    import ray.data as _rd

    return _rd.from_pandas(top)


# URL canonicalization: RE2-safe pieces shared verbatim with the SQL
# twin (queries.SQL["canonical_urls"]) — anchor every pattern, no
# lookaround, so DuckDB applies the identical automaton.
_URL_SCHEME_HOST = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(.*)$", re.ASCII
)
_URL_FRAGMENT = re.compile(r"#.*$", re.ASCII)
_URL_HTTP_80 = re.compile(r"^(http://[^/:?#]*):80([/?#].*)?$", re.ASCII)
_URL_HTTPS_443 = re.compile(r"^(https://[^/:?#]*):443([/?#].*)?$", re.ASCII)
_URL_TRACKING_PARAM = re.compile(
    r"^(utm_[A-Za-z]+|gclid|fbclid|ref)=", re.ASCII
)
_URL_ROOT_SLASH = re.compile(r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", re.ASCII)


def canonicalize_urls(
    ds: ray.data.Dataset, col: str = "url", out_col: str = "canonical_url"
) -> ray.data.Dataset:
    """Crawl-key URL canonicalization — the normalization every
    dedup/frontier stage keys on (WARC record keys, C4's url-level
    exact dedup): lowercase scheme+host, strip default ports
    (http:80 / https:443), drop the fragment, remove tracking params
    (utm_*, gclid, fbclid, ref), sort surviving query params, and trim
    the bare host-root trailing slash.

    Row-local map_batches; the param pass is explode → vectorized
    regex filter → lexicographic sort → group-join (no per-URL Python
    loop).  URLs without a scheme pass through un-lowered (only the
    generic cleanups apply).
    """

    def canon_series(s: pd.Series) -> pd.Series:
        u = s.fillna("").astype(str)
        u = u.str.replace(_URL_FRAGMENT, "", regex=True)
        parts = u.str.extract(_URL_SCHEME_HOST)
        has_scheme = parts[0].notna()
        u = (parts[0].str.lower() + parts[1]).where(has_scheme, u)
        u = u.str.replace(_URL_HTTP_80, r"\1\2", regex=True)
        u = u.str.replace(_URL_HTTPS_443, r"\1\2", regex=True)
        trip = u.str.partition("?")
        base, q = trip[0], trip[2]
        p = q[q != ""].str.split("&").explode()
        p = p[(p != "") & ~p.str.match(_URL_TRACKING_PARAM, na=False)]
        # global stable sort, then first-seen group order == ascending
        # per URL — the same ordering as the SQL twin's list_sort
        q2 = (
            p.sort_values(kind="stable")
            .groupby(level=0, sort=False)
            .agg("&".join)
            .reindex(u.index, fill_value="")
        )
        u = base + ("?" + q2).where(q2 != "", "")
        return u.str.replace(_URL_ROOT_SLASH, r"\1", regex=True)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[out_col] = canon_series(df[col])
        return arrow_out(out)

    return ds.map_batches(run, batch_format="pandas")


_URL_HOST_EXTRACT = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]*)", re.ASCII)
_URL_SCHEME_HOST_STRIP = re.compile(
    r"^[a-z][a-z0-9+.-]*://[^/?#]*", re.ASCII
)


def robots_filter(
    ds: ray.data.Dataset,
    rules: pd.DataFrame,
    *,
    url_col: str = "canonical_url",
) -> ray.data.Dataset:
    """Robots-exclusion filtering: drop rows whose URL's host has a
    rule whose ``path_prefix`` prefix-matches the URL path (the
    Disallow semantics of robots.txt, applied corpus-side after the
    crawl the way C4's blocklists are).

    ``rules`` is a small (host, path_prefix) frame — broadcast once
    via ``ray.put``; per batch the candidate set is a vectorized merge
    on host, then one ``str.startswith`` pass per DISTINCT prefix (the
    ruleset is bounded, rows are not).  URLs are expected canonical
    (lowercased host, see :func:`canonicalize_urls`); a URL with no
    scheme never matches any host rule and is kept.
    """
    rules = rules[["host", "path_prefix"]].reset_index(drop=True)
    ref = ray.put(rules)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.io_utils import arrow_out
        from pdf_parser_ray.stages import worker_state

        r = worker_state(("robots_rules", ref.hex()), lambda: ray.get(ref))
        u = df[url_col].fillna("").astype(str)
        host = u.str.extract(_URL_HOST_EXTRACT)[0]
        path = u.str.replace(_URL_SCHEME_HOST_STRIP, "", regex=True)
        cand = (
            pd.DataFrame(
                {"__row": np.arange(len(df)), "host": host, "path": path}
            )
            .merge(r, on="host")
        )
        blocked = np.zeros(len(df), dtype=bool)
        for prefix in cand["path_prefix"].unique():
            hit = cand.loc[
                cand["path_prefix"].eq(prefix)
                & cand["path"].str.startswith(prefix),
                "__row",
            ]
            blocked[hit.to_numpy()] = True
        return arrow_out(df[~blocked])

    return ds.map_batches(run, batch_format="pandas")


# UTF-8 multibyte lead bytes re-decoded as cp1252/latin-1 leave these
# artifact prefixes (U+00C3 'A-tilde' for U+00C0-U+07FF text, U+00E2 /
# U+00C2 for general punctuation and NBSP) — the classic mojibake
# signature ftfy keys on.  Class spelled in escapes to keep the source
# ASCII: lead byte followed by a cp1252-visible continuation artifact.
_MOJIBAKE_RE = re.compile(
    # lead: C2/C3 (2-byte UTF-8) or E2 (3-byte punctuation) seen as
    # text; continuation byte seen through latin-1 (U+0080-00BF,
    # incl. the C1 controls latin-1 yields) or through cp1252's
    # remapped 0x80-0x9F row.  Escapes keep the source ASCII.
    "[\u00c2\u00c3\u00e2]"
    "[\u0080-\u00bf\u20ac\u201a\u0192\u201e\u2026\u2020\u2021"
    "\u02c6\u2030\u0160\u2039\u0152\u017d\u2018\u2019\u201c"
    "\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a\u0153"
    "\u017e\u0178]"
)


def repair_mojibake(s: str, *, max_rounds: int = 3) -> tuple[str, int, int]:
    """Undo UTF-8-bytes-read-as-cp1252/latin-1 double encoding — the
    most common encoding damage in crawled text (e.g. 'cafÃ©'
    back to 'café').

    A round re-encodes through cp1252 (latin-1 fallback for the five
    cp1252 holes) and strict-decodes as UTF-8; it is accepted only if
    it strictly reduces the artifact count — so clean text that merely
    LOOKS suspicious is never altered, and genuinely nested damage
    unwinds one layer per round (at most ``max_rounds``).

    Returns (repaired_text, n_suspicious_before, rounds_applied).
    """
    bad = len(_MOJIBAKE_RE.findall(s))
    n0 = bad
    rounds = 0
    while bad and rounds < max_rounds:
        try:
            raw = s.encode("cp1252", errors="strict")
        except UnicodeEncodeError:
            try:
                raw = s.encode("latin-1", errors="strict")
            except UnicodeEncodeError:
                break
        try:
            fixed = raw.decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            break
        nb = len(_MOJIBAKE_RE.findall(fixed))
        if nb >= bad:
            break
        s, bad = fixed, nb
        rounds += 1
    return s, n0, rounds


def fix_mojibake(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Row-local encoding-repair stage: adds ``n_suspicious`` (artifact
    count before repair), ``repair_rounds`` (layers unwound), and the
    repaired text (in place, or in ``out_col`` if given).  No shuffle;
    compiled detector, repair attempted only on flagged rows (clean
    corpora pay one vectorized regex count per row)."""
    target = out_col or text_col

    def fix(df: pd.DataFrame):
        texts = df[text_col].astype(str)
        counts = texts.str.count(_MOJIBAKE_RE).astype("int64")
        repaired = texts.to_numpy(dtype=object).copy()
        rounds = np.zeros(len(df), dtype="int64")
        for i in np.flatnonzero(counts.to_numpy() > 0):
            repaired[i], _, rounds[i] = repair_mojibake(repaired[i])
        out = df.copy()
        out[target] = repaired
        out["n_suspicious"] = counts.to_numpy()
        out["repair_rounds"] = rounds
        return arrow_out(out)

    return ds.map_batches(fix, batch_format="pandas")


# ---------------------------------------------------------------------------
# Blocklist matching (the C4 "bad words" gate, substring semantics)
# ---------------------------------------------------------------------------


class AhoCorasick:
    """From-scratch Aho-Corasick automaton for multi-pattern PRESENCE
    detection (Aho & Corasick 1975, public algorithm).

    One pass over the text regardless of pattern count — the scale
    route when the blocklist is large (UT1-sized lists run to 10^4+
    entries, where the per-pattern vectorized scan's O(K x corpus)
    loses to this O(corpus)).  Build once per actor (callable-class
    ``__init__``), reuse per batch.

    ``seen_patterns(text)`` returns the set of pattern indices present
    as substrings — overlap-proof by construction (output links follow
    fail links, so ``b`` IS found inside a longer match of ``abc``).
    """

    def __init__(self, patterns: list[str], *, case_sensitive: bool = False):
        self.case_sensitive = case_sensitive
        pats = [p if case_sensitive else p.lower() for p in patterns]
        goto: list[dict] = [{}]
        out: list[list[int]] = [[]]
        for pid, pat in enumerate(pats):
            st = 0
            for ch in pat:
                nxt = goto[st].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append([])
                    nxt = len(goto) - 1
                    goto[st][ch] = nxt
                st = nxt
            out[st].append(pid)
        fail = [0] * len(goto)
        queue = list(goto[0].values())
        for st in queue:  # BFS; queue grows in place
            for ch, nxt in goto[st].items():
                queue.append(nxt)
                f = fail[st]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[nxt] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != nxt else 0
                out[nxt].extend(out[fail[nxt]])
        self._goto, self._fail, self._out = goto, fail, out
        self._lens = [len(p) for p in pats]
        self.patterns = pats
        self.n_patterns = len(pats)

    def seen_patterns(self, text: str) -> set:
        if not self.case_sensitive:
            text = text.lower()
        goto, fail, out = self._goto, self._fail, self._out
        seen: set = set()
        st = 0
        for ch in text:
            while st and ch not in goto[st]:
                st = fail[st]
            st = goto[st].get(ch, 0)
            if out[st]:
                seen.update(out[st])
        return seen

    def iter_matches(self, text: str):
        """Yield (pattern_index, start_offset) for EVERY occurrence —
        overlapping and nested included (output links).  Offsets are
        0-based on the text as matched (the lowered copy when
        ``case_sensitive=False`` — same length for the ASCII patterns
        this repo ships)."""
        if not self.case_sensitive:
            text = text.lower()
        goto, fail, out = self._goto, self._fail, self._out
        lens = self._lens
        st = 0
        for i, ch in enumerate(text):
            while st and ch not in goto[st]:
                st = fail[st]
            st = goto[st].get(ch, 0)
            for pid in out[st]:
                yield pid, i + 1 - lens[pid]


def blocklist_hits(
    ds: ray.data.Dataset,
    patterns: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    case_sensitive: bool = False,
    mode: str = "vector",
) -> ray.data.Dataset:
    """Blocklist gate (C4 / RefinedWeb "bad words" rule, substring
    semantics): per document, how many DISTINCT blocklist patterns
    occur, and the boolean ``blocked`` verdict.

    Two interchangeable row-local routes with identical output
    (pinned by test):

    * ``mode="vector"`` — one zero-copy ``pyarrow.compute
      .match_substring`` pass per pattern (C speed; right for the
      tens-of-patterns lists this query ships).
    * ``mode="automaton"`` — a from-scratch Aho-Corasick actor pool:
      ONE text pass total; the 10^4-pattern scale route.  The automaton
      is built once per actor in ``__init__`` and broadcast-free
      (patterns travel in the actor constructor args).

    Presence (not occurrence counting) is deliberately the contract:
    it is what the public recipes gate on, and it is overlap-free, so
    both routes and the DuckDB ``contains()`` oracle agree exactly.

    Output: (id_col, n_block_hits:int64, blocked:bool).  Zero shuffle.
    """
    pats = list(patterns)
    if mode == "vector":
        import pyarrow as pa
        import pyarrow.compute as pc

        def hits(batch: pa.Table) -> pa.Table:
            col = pc.cast(
                pc.fill_null(batch.column(text_col), ""), pa.string()
            )
            total = np.zeros(len(batch), dtype=np.int64)
            for pat in pats:
                m = pc.match_substring(
                    col, pat, ignore_case=not case_sensitive
                )
                total += m.to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "n_block_hits": pa.array(total),
                    "blocked": pa.array(total > 0),
                }
            )

        return ds.map_batches(hits, batch_format="pyarrow")

    if mode != "automaton":
        raise ValueError(f"unknown mode {mode!r}")

    class _AcStage:
        def __init__(self):
            self.ac = AhoCorasick(pats, case_sensitive=case_sensitive)

        def __call__(self, df: pd.DataFrame):
            texts = df[text_col].fillna("").astype(str)
            n_hits = np.fromiter(
                (len(self.ac.seen_patterns(t)) for t in texts),
                dtype=np.int64,
                count=len(df),
            )
            return arrow_out(
                pd.DataFrame(
                    {
                        id_col: df[id_col].to_numpy(),
                        "n_block_hits": n_hits,
                        "blocked": n_hits > 0,
                    }
                )
            )

    return ds.map_batches(_AcStage, batch_format="pandas", concurrency=(1, 8))


def blocklist_doc_counts(
    ds: ray.data.Dataset,
    patterns: list[str],
    *,
    text_col: str = "text",
    case_sensitive: bool = False,
) -> ray.data.Dataset:
    """Blocklist hit-rate audit: for every pattern, the number of
    documents containing it (the corpus-level view of
    :func:`blocklist_hits` used to tune a blocklist before gating).

    Per-batch partial (K rows per batch, K = len(patterns)) → one
    bounded-key groupby; document text never shuffles.

    Output: (pattern:string, n_docs:int64), one row per pattern
    INCLUDING zero-hit patterns (a blocklist entry that never fires is
    exactly what the audit is for).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    pats = list(patterns)

    def partial(batch: pa.Table) -> pa.Table:
        col = pc.cast(pc.fill_null(batch.column(text_col), ""), pa.string())
        counts = [
            int(
                pc.sum(
                    pc.cast(
                        pc.match_substring(
                            col, pat, ignore_case=not case_sensitive
                        ),
                        pa.int64(),
                    )
                ).as_py()
                or 0
            )
            for pat in pats
        ]
        return pa.table(
            {
                "pattern": pa.array(pats, pa.string()),
                "n_docs": pa.array(counts, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("pattern").aggregate(
        Sum("n_docs", alias_name="n_docs")
    )


def entity_tag(
    ds: ray.data.Dataset,
    entities: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "regex",
) -> ray.data.Dataset:
    """Gazetteer entity tagging WITH OFFSETS: one output row per
    occurrence of each entity string, overlapping and nested matches
    included (dictionary NER over raw text — what a link/KB-annotation
    pass runs before training).  Case-sensitive substring semantics —
    exactly what the DuckDB twin's position scan computes.

    Two interchangeable row-local routes (identical output, pinned by
    test):

    * ``mode="regex"`` — per-entity compiled LOOKAHEAD pattern
      ``(?=escaped)`` (a plain pattern would swallow overlaps: 'aa' in
      'aaa' must hit offsets 0 AND 1); right for tens of entities.
    * ``mode="automaton"`` — the AhoCorasick actor pool via
      ``iter_matches``: ONE text pass regardless of gazetteer size,
      the 10^4-entry scale route; the automaton builds once per actor.

    Output: (id_col, entity:str, start:int64, stop:int64) with
    0-based [start, stop) character offsets.  Zero shuffle.
    """
    ents = list(entities)

    from pdf_parser_ray.io_utils import arrow_out

    def _frame(ids, names, starts, stops):
        return arrow_out(pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "entity": pd.Series(names, dtype="object"),
                "start": pd.Series(starts, dtype="int64"),
                "stop": pd.Series(stops, dtype="int64"),
            }
        ))

    if mode == "regex":
        pats = [(e, re.compile("(?=%s)" % re.escape(e))) for e in ents]

        def tag(df: pd.DataFrame):
            ids, names, starts, stops = [], [], [], []
            for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
                for ent, pat in pats:
                    for m in pat.finditer(text):
                        ids.append(doc_id)
                        names.append(ent)
                        starts.append(m.start())
                        stops.append(m.start() + len(ent))
            return _frame(ids, names, starts, stops)

        return ds.select_columns([id_col, text_col]).map_batches(
            tag, batch_format="pandas"
        )

    class _Tagger:
        def __init__(self):
            self.ac = AhoCorasick(ents, case_sensitive=True)

        def __call__(self, df: pd.DataFrame):
            ids, names, starts, stops = [], [], [], []
            for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
                for pid, start in self.ac.iter_matches(text):
                    ids.append(doc_id)
                    names.append(ents[pid])
                    starts.append(start)
                    stops.append(start + len(ents[pid]))
            return _frame(ids, names, starts, stops)

    return ds.select_columns([id_col, text_col]).map_batches(
        _Tagger, batch_format="pandas", concurrency=(1, 8)
    )


def filter_funnel(
    ds: ray.data.Dataset,
    blocklist: list[str],
    *,
    lang: str = "en",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    min_words: int = 30,
    max_words: int = 90,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopword_hits: int = 2,
    max_top_permille: int = 100,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Filter-cascade attrition funnel (the per-stage survival readout
    a FineWeb/DCLM-style curation run publishes): per source, how many
    documents survive each CUMULATIVE stage of the standard cascade —

    1. ``n_lang``       — language gate (``lang_col == lang``),
    2. ``n_gopher``     — the Gopher composite (word-count band,
       mean-word-length band, stopword minimum — same rules as
       :func:`gopher_gate`),
    3. ``n_repetition`` — top-token concentration: the modal token's
       count may not exceed ``max_top_permille``/1000 of the words
       (Gopher's 0.1 default).  Compared as integers
       (``top*1000 <= n_words*max_top_permille``) — no float contract,
    4. ``n_blocklist``  — zero blocklist substring hits
       (case-insensitive, :func:`blocklist_hits` semantics).

    A doc counts at stage k only if it passed stages 1..k-1, so the
    columns are monotone non-increasing — the attrition curve.

    All signals and the four partial sums compute per batch (text
    never shuffles); ONE bounded-key grouped sum on source.  Output:
    (source_col, n_docs, n_lang, n_gopher, n_repetition, n_blocklist)
    all int64.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    stop = frozenset(GOPHER_STOPWORDS)
    pats = [p.lower() for p in blocklist]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.ops.text_stats import TOKEN_PAT

        lt = df[text_col].fillna("").str.lower()
        toks = lt.str.findall(TOKEN_PAT)
        n_words = toks.str.len().astype("int64")
        ex = toks.explode().dropna()
        zeros = pd.Series(0, index=df.index, dtype="int64")
        if len(ex):
            lens = ex.str.len()
            total_len = (
                lens.groupby(level=0).sum().reindex(df.index, fill_value=0)
            ).astype("int64")
            sw = (
                ex.isin(stop).groupby(level=0).sum()
                .reindex(df.index, fill_value=0)
            ).astype("int64")
            top = (
                ex.groupby([ex.index, ex.to_numpy()]).size()
                .groupby(level=0).max()
                .reindex(df.index, fill_value=0)
            ).astype("int64")
        else:
            total_len = sw = top = zeros
        mean_len = np.where(
            n_words > 0, total_len / n_words.astype("float64"), 0.0
        )
        blocked = np.zeros(len(df), dtype=bool)
        for p in pats:
            blocked |= lt.str.contains(p, regex=False).to_numpy()
        p1 = (df[lang_col] == lang).to_numpy()
        g = p1 & (
            (n_words.to_numpy() >= min_words)
            & (n_words.to_numpy() <= max_words)
            & (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len)
            & (sw.to_numpy() >= min_stopword_hits)
        )
        r = g & (
            top.to_numpy() * 1000 <= n_words.to_numpy() * max_top_permille
        )
        b = r & ~blocked
        out = pd.DataFrame(
            {
                source_col: df[source_col].to_numpy(),
                "n_docs": np.ones(len(df), dtype=np.int64),
                "n_lang": p1.astype("int64"),
                "n_gopher": g.astype("int64"),
                "n_repetition": r.astype("int64"),
                "n_blocklist": b.astype("int64"),
            }
        )
        return arrow_out(
            out.groupby(source_col, as_index=False).sum()
        )

    kw = {"n_parts": n_parts} if n_parts else {}
    cols = [text_col, lang_col, source_col]
    return grouped_sum(
        ds.select_columns(cols).map_batches(partial, batch_format="pandas"),
        [source_col],
        ["n_docs", "n_lang", "n_gopher", "n_repetition", "n_blocklist"],
        **kw,
    )


def frontier_schedule(
    ds: ray.data.Dataset,
    *,
    host_col: str = "host",
    priority_col: str = "priority",
    id_col: str = "doc_id",
    delays: "pd.DataFrame | None" = None,
    default_delay_us: int = 1_000_000,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Politeness-aware crawl-frontier schedule (Heritrix/Nutch-style
    per-host queues): within each host, URLs fetch in (priority DESC,
    id ASC) order, one fetch per crawl-delay tick — robots.txt
    Crawl-delay semantics — so ``fetch_time_us = (rank-1) * delay``.

    ONE host co-location shuffle; hosts are exactly how production
    frontiers shard, so the partitioning key survives into the fetch
    tier.  Ranking and slot assignment vectorize ACROSS hosts inside
    the partition (lexsort + groupby-cumcount, no per-host loop); the
    bounded (host, delay_us) table broadcasts once via ``ray.put`` and
    attaches with a C-speed map (hosts absent from it get
    ``default_delay_us``).

    Output: (id_col, host_col, rank_in_host:int64 1-based,
    fetch_time_us:int64).  Integer microseconds end to end — exact on
    both engines, no float contract.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map
    from pdf_parser_ray.stages import worker_state

    dmap = (
        {}
        if delays is None
        else dict(
            zip(delays[host_col], delays["delay_us"].astype("int64"))
        )
    )
    ref = ray.put(dmap)
    default = int(default_delay_us)

    def schedule(part: pd.DataFrame) -> pd.DataFrame:
        m = worker_state(("frontier_delays", ref.hex()), lambda: ray.get(ref))
        part = part.sort_values(
            [host_col, priority_col, id_col], ascending=[True, False, True]
        )
        rank = (
            part.groupby(host_col, sort=False).cumcount().to_numpy() + 1
        ).astype("int64")
        delay = (
            part[host_col].map(m).fillna(default).astype("int64").to_numpy()
        )
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: part[id_col].to_numpy(),
                    host_col: part[host_col].to_numpy(),
                    "rank_in_host": rank,
                    "fetch_time_us": (rank - 1) * delay,
                }
            )
        )

    kw = {"n_parts": n_parts} if n_parts else {}
    cols = [id_col, host_col, priority_col]
    return partitioned_map(ds.select_columns(cols), [host_col], schedule, **kw)


def frontier_makespan(
    ds: ray.data.Dataset,
    *,
    host_col: str = "host",
    delays: "pd.DataFrame | None" = None,
    default_delay_us: int = 1_000_000,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Per-host frontier cost audit WITHOUT materializing the schedule:
    under one-fetch-per-delay-tick politeness a host with n URLs
    finishes at exactly ``(n-1) * delay``, so counts suffice.  The
    capacity-planning readout a crawl operator checks before launching
    (which hosts dominate wall-clock; where to split by shard).

    Per-batch partial counts (K hosts per batch, text never moves) →
    one grouped sum co-located by host → row-local delay attach from
    the broadcast table.  Output: (host_col, n_urls:int64,
    makespan_us:int64).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum
    from pdf_parser_ray.stages import worker_state

    dmap = (
        {}
        if delays is None
        else dict(
            zip(delays[host_col], delays["delay_us"].astype("int64"))
        )
    )
    ref = ray.put(dmap)
    default = int(default_delay_us)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(host_col, as_index=False).size()
        return arrow_out(
            pd.DataFrame(
                {host_col: g[host_col], "n_urls": g["size"].astype("int64")}
            )
        )

    kw = {"n_parts": n_parts} if n_parts else {}
    counts = grouped_sum(
        ds.select_columns([host_col]).map_batches(
            partial, batch_format="pandas"
        ),
        [host_col],
        ["n_urls"],
        **kw,
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        m = worker_state(("frontier_delays", ref.hex()), lambda: ray.get(ref))
        delay = (
            df[host_col].map(m).fillna(default).astype("int64").to_numpy()
        )
        n = df["n_urls"].astype("int64").to_numpy()
        return arrow_out(
            pd.DataFrame(
                {
                    host_col: df[host_col].to_numpy(),
                    "n_urls": n,
                    "makespan_us": (n - 1) * delay,
                }
            )
        )

    return counts.map_batches(attach, batch_format="pandas")


# End-of-line hyphenation: join only when the continuation starts
# lowercase (the standard PDF/OCR heuristic — an uppercase or digit
# continuation usually means a true compound or list item, keep it).
_HYPHEN_BREAK = re.compile(r"-\n([a-z])")


def dehyphenate(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text",
) -> ray.data.Dataset:
    """Rejoin words hyphenated across line breaks — the post-processing
    every PDF/OCR extraction tier runs before tokenization
    (``exam-\\nple`` → ``example``).  Heuristic: drop the hyphen+newline
    ONLY when the continuation starts with a lowercase letter; an
    uppercase/digit continuation keeps the break (true compounds,
    list items).

    One vectorized ``str.replace`` per batch; ``n_joins`` is exactly
    (len_before - len_after) / 2 since every join removes the two
    characters ``-\\n`` — the same integer the SQL twin derives from
    the length delta.  Row-local, zero shuffle.

    Output: (id_col, out_col:str, n_joins:int64).
    """

    def run(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("").astype(str)
        joined = t.str.replace(_HYPHEN_BREAK, r"\1", regex=True)
        n_joins = (
            (t.str.len() - joined.str.len()) // 2
        ).astype("int64")
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    out_col: joined,
                    "n_joins": n_joins,
                }
            )
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        run, batch_format="pandas"
    )


# Bounded multi-part public-suffix list (the common ccSLDs; the full
# PSL is a data file — this documented subset covers the fixture and
# demonstrates the lookup contract).
MULTI_SUFFIXES = frozenset(
    ["co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "co.jp",
     "com.br", "co.in"]
)
_LAST2 = re.compile(r"([^.]+\.[^.]+)$")
_LAST3 = re.compile(r"([^.]+\.[^.]+\.[^.]+)$")


def registered_domains(
    ds: ray.data.Dataset,
    *,
    host_col: str = "host",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Registered-domain (eTLD+1) rollup — crawl analytics aggregate at
    the DOMAIN, not the host (`www.x.com`, `blog.x.com` → `x.com`), and
    multi-part public suffixes keep three labels (`a.x.co.uk` →
    `x.co.uk`).  Suffix membership tests against the bounded
    ``MULTI_SUFFIXES`` subset of the PSL (documented; the full list is
    a swap-in data file).

    Vectorized regex extraction of the last 2/3 labels + one isin —
    no per-host Python; per-batch partial counts then ONE grouped sum
    co-located by domain.  Output: (domain:str, n_hosts... rows are
    (domain, n_urls:int64)).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        host = df[host_col].fillna("").astype(str)
        last2 = host.str.extract(_LAST2)[0]
        last3 = host.str.extract(_LAST3)[0]
        n_labels = host.str.count(re.escape(".")) + 1
        domain = pd.Series(
            np.where(
                (n_labels >= 3) & last2.isin(MULTI_SUFFIXES),
                last3,
                np.where(n_labels >= 2, last2, host),
            ),
            index=df.index,
        )
        g = domain.groupby(domain).size()
        return arrow_out(
            pd.DataFrame(
                {
                    "domain": g.index.to_numpy(),
                    "n_urls": g.to_numpy(dtype="int64"),
                }
            )
        )

    kw = {"n_parts": n_parts} if n_parts else {}
    return grouped_sum(
        ds.select_columns([host_col]).map_batches(
            partial, batch_format="pandas"
        ),
        ["domain"],
        ["n_urls"],
        **kw,
    )


_URL_STRIP_QF = re.compile(r"[#?].*$", re.ASCII | re.DOTALL)
_URL_AUTHORITY = re.compile(
    r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", re.ASCII
)
_URL_DIGIT_SEG = re.compile(r"[0-9]+", re.ASCII)


def url_templates(ds: "ray.data.Dataset", url_col: str = "url"):
    """URL template mining (crawl-structure discovery): generalize each
    URL's path by collapsing digit-only segments to ``<d>`` and roll up
    per (host, template) — the pattern census that finds paginated /
    id-parameterized site sections before a crawler burns budget on
    them (cf. Koppula et al., WSDM 2010 — learning URL patterns for
    webpage de-duplication).

    Vectorized strip of query/fragment + authority extraction; the
    per-segment digit test is a bounded loop over path segments.  ONE
    co-location on (host, template) over batch-deduped
    (host, template, path) partials — shuffle bounded by distinct
    paths, never raw rows.

    Output: (host, template, n_urls:int64 — total rows,
    n_paths:int64 — distinct concrete paths under the template).
    """
    import ray.data  # noqa: F401

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_agg

    def partial(df: pd.DataFrame) -> "object":
        u1 = df[url_col].astype(str).str.replace(_URL_STRIP_QF, "", regex=True)
        host = u1.str.extract(_URL_AUTHORITY, expand=False).fillna("").str.lower()
        path = u1.str.replace(
            r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "", regex=True
        )
        tmpl = [
            "/".join(
                "<d>" if s and _URL_DIGIT_SEG.fullmatch(s) else s
                for s in p.split("/")
            )
            for p in path
        ]
        g = pd.DataFrame({"host": host, "template": tmpl, "path": path})
        return arrow_out(
            g.groupby(["host", "template", "path"], as_index=False).agg(
                cnt=("path", "size")
            )
        )

    # n_paths = nunique over the co-located partition: a path split
    # across batches contributes several partial rows but ONE distinct
    return grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["host", "template"],
        {"n_urls": ("cnt", "sum"), "n_paths": ("path", "nunique")},
    )


def host_boilerplate_strip(
    ds: ray.data.Dataset,
    *,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_permille: int = 500,
    min_docs: int = 2,
    broadcast_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """SITE-template removal — the host-scoped sibling of
    :func:`line_dedup` (justext/CC-Net site heuristic): a line is
    boilerplate for host H when it appears in ≥ ``min_permille``‰ of
    H's documents (counted ONCE per document, however often the page
    repeats it) and H has ≥ ``min_docs`` documents.  Catches nav bars /
    footers that repeat on every page of ONE site but are globally rare
    — invisible to the corpus-wide count.

    Integer-exact gate: 1000·docs_with_line ≥ min_permille·host_docs
    (no float ratio).  Shape: per-batch per-doc-unique (host, line)
    sipkey partials → ONE uniform-key count shuffle; host doc totals
    are a second bounded rollup broadcast as a dict; the hot
    host-salted hash set broadcasts once (``broadcast_limit`` guard)
    and the scrub pass is row-local — payloads never shuffle.  Blank
    lines are structural (kept, never counted); every doc survives
    with (n_lines, n_dropped) audit columns — the line_dedup contract.

    Output: (id_col, clean_text, n_lines:int64, n_dropped:int64).
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.stages import worker_state

    # "\n" separator: a line can never contain one (lines ARE the \n
    # split) and hosts don't either, so host+SALT+line is injective.
    # NOT "\x00": pandas.util.hash_array's siphash reads the string as
    # a C string and truncates at NUL — every line of a host would
    # collapse to one hash (found the hard way).
    SALT = "\n"

    def _norms(lines: list) -> list:
        return [ln.strip(LINE_WS) for ln in lines]

    # combo rows also need the host to apply the per-host threshold —
    # carry it alongside the hash (string key rides the shuffle once)
    # the shuffle key is (combo, host_hash) — two int64s through the
    # int-keyed co-location (a string host column through the streaming
    # sort-aggregate measured 7.4 s of a 9.5 s run at sf0.1; ints via
    # grouped_sum cut the whole op to ~3 s).  host_hash is constant per
    # combo (the line hash is host-salted), so it is a free rider key.
    def partial_counts_with_host(df: pd.DataFrame):
        hosts: list = []
        flat: list = []
        for host, text in zip(df[host_col], df[text_col].fillna("")):
            uniq = set(n for n in _norms(text.split("\n")) if n)
            for n in uniq:
                flat.append(host + SALT + n)
                hosts.append(host)
        h = _hash_passages(flat)
        hh = _hash_passages(hosts)
        g = pd.DataFrame(
            {"combo": h.astype(np.int64), "host_hash": hh.astype(np.int64)}
        )
        g["n"] = np.int64(1)
        return arrow_out(
            g.groupby(["combo", "host_hash"], as_index=False)["n"].sum()
        )

    from pdf_parser_ray.ops.shuffle import grouped_sum

    counts = grouped_sum(
        ds.map_batches(partial_counts_with_host, batch_format="pandas"),
        ["combo", "host_hash"],
        ["n"],
    )

    def host_totals(df: pd.DataFrame):
        g = df.groupby(host_col, as_index=False)[id_col].count()
        g.columns = ["host", "t"]
        return arrow_out(g)

    totals = (
        ds.select_columns([host_col, id_col])
        .map_batches(host_totals, batch_format="pandas")
        .groupby("host")
        .aggregate(Sum("t", alias_name="t"))
        .to_pandas()  # bounded by distinct hosts
    )
    tot_ref = ray.put(
        dict(
            zip(
                _hash_passages(totals["host"].tolist()).astype(np.int64),
                totals["t"].astype(int),
            )
        )
    )

    def hot_filter(df: pd.DataFrame):
        tmap = worker_state(
            ("hb_totals", tot_ref.hex()), lambda: ray.get(tot_ref)
        )
        t = df["host_hash"].map(tmap).fillna(0).astype(np.int64)
        keep = (1000 * df["n"].to_numpy() >= min_permille * t.to_numpy()) & (
            t.to_numpy() >= min_docs
        )
        return arrow_out(df.loc[keep, ["combo"]])

    hot_df = (
        counts.map_batches(hot_filter, batch_format="pandas")
        .limit(broadcast_limit + 1)
        .to_pandas()
    )
    if "combo" not in hot_df.columns:
        hot_df = pd.DataFrame({"combo": pd.Series([], dtype="int64")})
    if len(hot_df) > broadcast_limit:
        raise ValueError(
            f"hot boilerplate set exceeds broadcast_limit={broadcast_limit}"
        )
    hot_ref = ray.put(np.sort(hot_df["combo"].to_numpy(dtype=np.int64)))

    def scrub(df: pd.DataFrame):
        hot_arr = worker_state(
            ("hb_hot", hot_ref.hex()), lambda: ray.get(hot_ref)
        )
        ids, cleaned, n_lines, n_dropped = [], [], [], []
        for doc_id, host, text in zip(
            df[id_col], df[host_col], df[text_col].fillna("")
        ):
            lines = text.split("\n")
            norms = _norms(lines)
            nonblank = [host + SALT + n for n in norms if n]
            h = _hash_passages(nonblank)
            if hot_arr.size and h.size:
                pos = np.searchsorted(hot_arr, h)
                np.clip(pos, 0, hot_arr.size - 1, out=pos)
                is_hot = iter(hot_arr[pos] == h)
            else:
                is_hot = iter([False] * len(nonblank))
            kept = [ln for ln, nrm in zip(lines, norms)
                    if not nrm or not next(is_hot)]
            ids.append(doc_id)
            cleaned.append("\n".join(kept))
            n_lines.append(len(lines))
            n_dropped.append(len(lines) - len(kept))
        return arrow_out(pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "clean_text": pd.Series(cleaned, dtype="object"),
                "n_lines": pd.Series(n_lines, dtype="int64"),
                "n_dropped": pd.Series(n_dropped, dtype="int64"),
            }
        ))

    return ds.map_batches(scrub, batch_format="pandas")


_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_:.()-]+)""",
    re.IGNORECASE,
)


def detect_charset_batch(df: pd.DataFrame, *, bytes_col: str = "payload",
                         prescan: int = 1024) -> pd.DataFrame:
    """Charset sniffing for raw crawl payloads — the decode step every
    byte-level web pipeline runs before text ops (HTML5 §13.2.3
    encoding sniffing, simplified to the public three-tier rule):

    1. BOM wins: EF BB BF → utf-8, FF FE → utf-16le, FE FF → utf-16be.
    2. ``<meta charset=...>`` / http-equiv prescan of the first
       ``prescan`` bytes is REPORTED (``declared``) but never trusted
       over byte evidence — the lying-meta case is real on the web.
    3. Byte evidence (``detected``): strict UTF-8 validation (C-speed
       ``bytes.decode`` per row, the per-row work is one libc call) —
       pure-ASCII payloads report ``ascii``, valid multibyte ``utf-8``,
       anything invalid falls back to ``windows-1252`` (the HTML5
       default for unlabeled legacy bytes).

    Row-local, no shuffle; runs as a plain ``map_batches`` stage.
    Output adds (declared:string — '' when absent, detected:string,
    agree:bool — declared empty or equal after lowercasing).
    """
    payloads = df[bytes_col]
    declared: list = []
    detected: list = []
    for b in payloads:
        b = bytes(b) if b is not None else b""
        if b.startswith(b"\xef\xbb\xbf"):
            det = "utf-8"
        elif b.startswith(b"\xff\xfe"):
            det = "utf-16le"
        elif b.startswith(b"\xfe\xff"):
            det = "utf-16be"
        elif b.isascii():  # C-speed scan, skips the decode
            det = "ascii"
        else:
            try:
                b.decode("utf-8")
                det = "utf-8"
            except UnicodeDecodeError:
                det = "windows-1252"
        m = _META_CHARSET.search(b[:prescan])
        declared.append(m.group(1).decode("ascii", "replace").lower() if m else "")
        detected.append(det)
    out = df.copy()
    out["declared"] = pd.Series(declared, index=df.index, dtype="object")
    out["detected"] = pd.Series(detected, index=df.index, dtype="object")
    out["agree"] = [
        (not d) or d == t for d, t in zip(declared, detected)
    ]
    return out


def gopher_repetition(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = 4,
    para_words: int = 16,
) -> ray.data.Dataset:
    """The FULL Gopher repetition battery (Rae et al. 2021, Table A1) —
    the 12 per-document signals the Gopher/MassiveText quality filter
    thresholds, beyond :func:`repetition_stats`'s word-level pair:

    * duplicate line / paragraph fraction (count of non-first
      occurrences over total), and the same weighted by characters;
      lines and paragraphs here are deterministic ``line_words`` /
      ``para_words`` re-wraps of the ``' '``-token stream (the corpus
      fixture convention — real ``\\n`` documents pass their own
      structure through the same counters);
    * top n-gram character fraction for n = 2, 3, 4: characters covered
      by every occurrence of the most frequent n-gram (ties broken by
      LEXICOGRAPHIC min, the SQL-shared rule) over total characters;
    * duplicate n-gram character fraction for n = 5..10:
      Σ count·len over n-grams with count ≥ 2, over total characters —
      the Dolma/NeMo-Curator reading of the paper's definition
      (overlaps counted per occurrence), pinned here for both engines.

    Entirely row-local (one ``map_batches``, zero shuffle); fractions
    are UNROUNDED per-row int-operand ratios.  Empty documents emit 0.0
    everywhere.

    Output: (id_col, n_chars:int64, dup_line_frac, dup_line_char_frac,
    dup_para_frac, dup_para_char_frac, top_2gram_char_frac,
    top_3gram_char_frac, top_4gram_char_frac, dup_5gram_char_frac ...
    dup_10gram_char_frac — all float64).
    """

    TOP_NS = (2, 3, 4)
    DUP_NS = (5, 6, 7, 8, 9, 10)

    def _unit_fracs(units: "list[str]"):
        c = Counter(units)
        total = len(units)
        total_chars = sum(len(u) for u in units)
        dup = sum(v - 1 for v in c.values() if v > 1)
        dup_chars = sum(len(u) * (v - 1) for u, v in c.items() if v > 1)
        f = dup / total if total else 0.0
        fc = dup_chars / total_chars if total_chars else 0.0
        return f, fc

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        cols: dict = {k: [] for k in (
            [id_col, "n_chars", "dup_line_frac", "dup_line_char_frac",
             "dup_para_frac", "dup_para_char_frac"]
            + [f"top_{n}gram_char_frac" for n in TOP_NS]
            + [f"dup_{n}gram_char_frac" for n in DUP_NS]
        )}
        for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
            words = text.split(" ")
            n_chars = len(text)
            cols[id_col].append(doc_id)
            cols["n_chars"].append(n_chars)
            lines = [
                " ".join(words[i : i + line_words])
                for i in range(0, len(words), line_words)
            ]
            paras = [
                " ".join(words[i : i + para_words])
                for i in range(0, len(words), para_words)
            ]
            for name, units in (("line", lines), ("para", paras)):
                f, fc = _unit_fracs(units)
                cols[f"dup_{name}_frac"].append(f)
                cols[f"dup_{name}_char_frac"].append(fc)
            for n in TOP_NS + DUP_NS:
                if len(words) < n or n_chars == 0:
                    val = 0.0
                else:
                    grams = Counter(
                        " ".join(words[i : i + n])
                        for i in range(len(words) - n + 1)
                    )
                    if n in TOP_NS:
                        mx = max(grams.values())
                        g = min(k for k, v in grams.items() if v == mx)
                        val = mx * len(g) / n_chars
                    else:
                        dup_chars = sum(
                            v * len(k) for k, v in grams.items() if v >= 2
                        )
                        val = dup_chars / n_chars
                key = (
                    f"top_{n}gram_char_frac"
                    if n in TOP_NS
                    else f"dup_{n}gram_char_frac"
                )
                cols[key].append(val)
        out = pd.DataFrame(cols)
        out[id_col] = out[id_col].astype("int64")
        out["n_chars"] = out["n_chars"].astype("int64")
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pandas"
    )


def texttile_boundaries(
    df: pd.DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 20,
    k: int = 2,
) -> pd.DataFrame:
    """TextTiling topic segmentation (Hearst, CL 1997): split each
    document into multi-paragraph topical chunks — the semantically
    aware alternative to fixed-token windows for RAG/packing
    (`chunk_documents` is the fixed twin).

    Per document (row-local, no shuffle): lowercase tokens → pseudo-
    sentences of ``w`` tokens → at each gap, cosine similarity between
    the ``k``-pseudo-sentence blocks either side (term-frequency
    vectors) → depth score d(i) = (peak_left − s_i) + (peak_right −
    s_i) → boundaries at gaps whose depth exceeds Hearst's cutoff
    μ_d − σ_d/2, non-adjacent (≥ 2 gaps apart, the paper's smoothing
    rule).  Documents shorter than 2k pseudo-sentences stay whole.

    Output: one row per chunk — (id_col, chunk_idx:int64,
    start_token:int64, end_token:int64, n_sims:int64).
    """
    out_ids: list = []
    out_idx: list = []
    out_start: list = []
    out_end: list = []
    out_nsims: list = []
    for doc_id, text in zip(df[id_col], df[text_col].fillna("")):
        tokens = [t for t in text.lower().split() if t]
        n_tok = len(tokens)
        pseudo = [tokens[i : i + w] for i in range(0, n_tok, w)]
        n_ps = len(pseudo)
        bounds_tok: list = []
        n_gaps = max(0, n_ps - 1)
        sims: list = []
        if n_ps >= 2 * k:
            from collections import Counter

            for gap in range(1, n_ps):
                left = Counter(
                    t for ps in pseudo[max(0, gap - k) : gap] for t in ps
                )
                right = Counter(
                    t for ps in pseudo[gap : gap + k] for t in ps
                )
                num = sum(left[t] * right[t] for t in left)
                den = (
                    sum(v * v for v in left.values())
                    * sum(v * v for v in right.values())
                ) ** 0.5
                sims.append(num / den if den else 0.0)
            depths = []
            for i, s in enumerate(sims):
                # walk outward to the nearest peaks (monotone ascent)
                lpeak = s
                j = i - 1
                while j >= 0 and sims[j] >= lpeak:
                    lpeak = sims[j]
                    j -= 1
                rpeak = s
                j = i + 1
                while j < len(sims) and sims[j] >= rpeak:
                    rpeak = sims[j]
                    j += 1
                depths.append((lpeak - s) + (rpeak - s))
            d = np.asarray(depths)
            if d.std() > 0:
                cutoff = d.mean() - d.std() / 2.0
                cands = sorted(
                    np.nonzero(d > cutoff)[0], key=lambda i: -d[i]
                )
                chosen: list = []
                for c in cands:
                    if all(abs(c - o) >= 2 for o in chosen):
                        chosen.append(int(c))
                bounds_tok = sorted((c + 1) * w for c in chosen)
        cuts = [0] + [b for b in bounds_tok if 0 < b < n_tok] + [n_tok]
        for ci in range(len(cuts) - 1):
            out_ids.append(doc_id)
            out_idx.append(ci)
            out_start.append(cuts[ci])
            out_end.append(cuts[ci + 1])
            out_nsims.append(n_gaps)
    return pd.DataFrame(
        {
            id_col: pd.Series(out_ids, dtype="int64"),
            "chunk_idx": pd.Series(out_idx, dtype="int64"),
            "start_token": pd.Series(out_start, dtype="int64"),
            "end_token": pd.Series(out_end, dtype="int64"),
            "n_sims": pd.Series(out_nsims, dtype="int64"),
        }
    )


# ----------------------------- C4 line-level cleaning (Raffel et al.)

def c4_line_filter_batch(
    df: pd.DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> pd.DataFrame:
    """The C4 line rules (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning", §2.2) as one row-local vectorized stage — the
    line-granular companion of the doc-level quality/Gopher gates:

    * keep only lines ending in terminal punctuation (``. ! ? "``,
      after right-strip);
    * keep only lines with ≥ ``min_words`` whitespace words;
    * drop lines containing "javascript" (case-insensitive);
    * drop the whole page when it contains ``{`` or the phrase
      "lorem ipsum" (case-insensitive), or keeps < ``min_kept_lines``
      lines.

    Zero shuffle: split → vectorized masks → grouped join, all C-speed
    pandas str kernels.  Output one row per input doc:
    (doc_id, clean_text — kept lines joined with \\n, '' when the page
    is dropped; n_kept_lines, n_dropped_lines:int64; keep_doc:bool).
    """
    ids = df[id_col].to_numpy()
    text = df[text_col].fillna("")
    page_bad = text.str.contains("{", regex=False) | text.str.contains(
        "lorem ipsum", case=False, regex=False
    )

    lines = text.str.split("\n")
    ex = pd.DataFrame(
        {"__i": np.repeat(np.arange(len(df)), lines.str.len()),
         "line": lines.explode().to_numpy()}
    )
    stripped = ex["line"].str.rstrip()
    keep_line = (
        stripped.str.endswith((".", "!", "?", '"'))
        & (ex["line"].str.split().str.len() >= min_words)
        & ~ex["line"].str.contains("javascript", case=False, regex=False)
    )
    kept_per_doc = (
        ex.loc[keep_line].groupby("__i")["line"].agg("\n".join)
        .reindex(range(len(df)), fill_value="")
    )
    n_kept = (
        ex.loc[keep_line].groupby("__i")["line"].size()
        .reindex(range(len(df)), fill_value=0).astype("int64")
    )
    n_total = lines.str.len().to_numpy()
    keep_doc = (~page_bad.to_numpy()) & (n_kept.to_numpy() >= min_kept_lines)
    return pd.DataFrame(
        {
            id_col: pd.Series(ids, dtype="int64"),
            "clean_text": np.where(keep_doc, kept_per_doc.to_numpy(), ""),
            "n_kept_lines": n_kept.to_numpy(),
            "n_dropped_lines": (n_total - n_kept.to_numpy()).astype("int64"),
            "keep_doc": pd.Series(keep_doc, dtype=bool),
        }
    )
