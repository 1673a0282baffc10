"""Training-data curation operators: split assignment, benchmark
decontamination, sequence packing, TF-IDF term selection.

The tier a web-scale pipeline runs BETWEEN cleaning (ops.webtext) and
training: decide which split each document lands in, drop documents
that contain evaluation-benchmark text, bin documents into
token-budget packs for the trainer, and pick each document's most
characteristic terms.  All four are deterministic (hash gates and
total orders, no RNG) so reruns, retries and different partitionings
produce identical output — the property that makes them resumable and
their SQL twins exact.

Shuffle discipline:

* :func:`assign_splits` — row-local; zero shuffle.
* :func:`decontaminate` — row-local scan against a BROADCAST probe
  set; zero shuffle (probe sets are benchmark suites: thousands of
  strings, not corpus-scale).
* :func:`pack_sequences` — ONE groupby on a bounded synthetic group
  key (``doc_id // group_size``), so every group is ≤ group_size rows
  by construction — the map_groups frame can never blow up on skew.
  Document payloads are pruned before the shuffle; only
  (id, grp, n_tokens) rows move.
* :func:`tfidf_top_terms` — reuses the word_counts-style partial
  combiner for document frequencies (one vocabulary-sized shuffle),
  broadcasts the bounded df model, then scores row-locally.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray
import ray.data


def assign_splits(
    ds: ray.data.Dataset,
    boundaries: tuple[tuple[str, str], ...] = (("train", "d0"), ("val", "e8")),
    *,
    last: str = "test",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment by md5 hash gate.

    A row's split is the first ``(name, hex2)`` boundary whose 2-char
    hex threshold exceeds ``md5(str(id))[:2]``, else ``last`` — e.g.
    the default ('d0', 'e8') splits ≈ 81.25 / 9.4 / 9.4 %.  Hash-gated
    (not RNG) for the same reason as :func:`webtext.stratified_sample`:
    every rerun and every partitioning assigns identically, and a SQL
    CASE over the same md5 prefix is value-identical.

    Adds a ``split:string`` column; all input columns pass through.
    Row-local map_batches — no shuffle.
    """
    bounds = tuple(boundaries)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        prefixes = df[id_col].map(
            lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest()[:2]
        )
        out = df.copy()
        split = pd.Series(np.full(len(df), last, dtype=object), index=df.index)
        remaining = pd.Series(True, index=df.index)
        for name, hex2 in bounds:
            hit = remaining & (prefixes < hex2)
            split[hit] = name
            remaining &= ~hit
        out["split"] = split
        return out

    return ds.map_batches(tag, batch_format="pandas")


def decontaminate(
    ds: ray.data.Dataset,
    probes: list[str],
    *,
    mode: str = "substring",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Benchmark decontamination: count, per document, how many probe
    strings (n-grams lifted from an evaluation set) occur in its text.
    Training-data recipes drop rows with ``n_probe_hits > 0``; the
    count (not a bool) is emitted so the caller can grade contamination
    severity.  The probe set is broadcast once via ``ray.put``
    (benchmark suites are thousands-to-millions of strings —
    worker-heap-sized at any corpus scale).

    ``mode="substring"`` — verbatim substring containment, a vectorized
    scan per probe: per-batch cost O(probes × batch_bytes).  Exact and
    SQL-mirrorable, right for small probe sets.

    ``mode="wordgram"`` — the scale route for big suites: every probe
    must tokenize to the same word count w (true of fixed-width n-gram
    probes); probes become a broadcast md5 HASH SET, each document
    hashes its own word w-grams once, and n_probe_hits = distinct
    probes present.  Per-batch cost O(batch_words), INDEPENDENT of
    probe count.  Semantics differ from substring only on matches that
    cross word boundaries (wordgram requires ``' '``-aligned hits and
    counts a probe once per doc).

    Output: (id_col, n_probe_hits:int64), one row per input document.
    """
    from pdf_parser_ray.stages import worker_state

    if mode == "wordgram":
        widths = {len(p.split(" ")) for p in probes}
        if len(widths) > 1:
            raise ValueError(
                f"wordgram mode needs equal-width probes, got widths {sorted(widths)}"
            )
        w = widths.pop() if widths else 1
        # pd.util.hash_array (siphash, fixed key): ONE vectorized call
        # replaces a per-gram hashlib.md5 Python loop — the same hotspot
        # webtext._hash_passages removed (~40× on passage hashing).
        # Both sides (probes here, doc grams below) use the identical
        # function; 2^-64-per-pair collision odds, as documented there.
        probe_hashes = (
            np.unique(
                pd.util.hash_array(np.asarray(list(probes), dtype=object)).view(
                    np.int64
                )
            )
            if probes
            else np.empty(0, dtype=np.int64)
        )
        set_ref = ray.put(probe_hashes)

        def scan_grams(df: pd.DataFrame) -> pd.DataFrame:
            sp: np.ndarray = worker_state(  # sorted probe-hash array
                ("decontam_grams", set_ref.hex()), lambda: ray.get(set_ref)
            )
            texts = df[text_col].fillna("")
            grams: list = []
            bounds = np.zeros(len(df) + 1, dtype=np.int64)
            for i, text in enumerate(texts):
                words = text.split(" ")
                grams.extend(
                    " ".join(words[j : j + w])
                    for j in range(max(0, len(words) - w + 1))
                )
                bounds[i + 1] = len(grams)
            hits = np.zeros(len(df), dtype=np.int64)
            if grams and len(sp):
                h = pd.util.hash_array(
                    np.asarray(grams, dtype=object)
                ).view(np.int64)
                idx = np.searchsorted(sp, h)
                idx[idx == len(sp)] = 0  # out-of-range probe → compare sp[0]
                member = sp[idx] == h
                for i in range(len(df)):  # distinct matched probes per doc
                    seg = h[bounds[i] : bounds[i + 1]]
                    hits[i] = len(np.unique(seg[member[bounds[i] : bounds[i + 1]]]))
            return pd.DataFrame(
                {id_col: df[id_col].to_numpy(), "n_probe_hits": hits}
            )

        return ds.map_batches(scan_grams, batch_format="pandas")

    probes_ref = ray.put(list(probes))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        plist: list[str] = worker_state(
            ("decontam_probes", probes_ref.hex()), lambda: ray.get(probes_ref)
        )
        text = df[text_col].fillna("")
        hits = np.zeros(len(df), dtype=np.int64)
        for p in plist:
            hits += text.str.contains(p, regex=False).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "n_probe_hits": hits}
        )

    return ds.map_batches(scan, batch_format="pandas")


def probe_ngrams(
    ds: ray.data.Dataset,
    *,
    max_probe_docs: int,
    probe_words: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[str]:
    """Build a probe set from the first ``probe_words`` words of every
    document with id < ``max_probe_docs`` (the stand-in for "load the
    benchmark's questions").  The filter runs distributed and column-
    pruned; only the ≤ max_probe_docs surviving rows reach the driver.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column(id_col), max_probe_docs)).select(
            [id_col, text_col]
        )

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    # words[:k] == SQL list_slice(string_split(text,' '), 1, k)
    return [
        " ".join((r[text_col] or "").split(" ")[:probe_words]) for r in rows
    ]


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    budget: int = 2000,
    group_size: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Token-budget sequence packing (the trainer-facing batching step):
    documents are sharded into deterministic groups of ``group_size``
    consecutive ids, and within each group (ordered by id) a document
    joins pack ``floor(prior_tokens / budget)`` where prior_tokens is
    the running token total of the documents before it — fixed-capacity
    block packing.  A pack may overflow ``budget`` by at most one
    document (the rule every engine can replay: prior-sum division,
    not a greedy reset, so a SQL window ``SUM ... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING`` reproduces it exactly).

    Scale shape: token counts are computed (and text DROPPED) before
    the one groupby; groups are ≤ group_size rows by construction, so
    the per-group pandas frame is bounded regardless of corpus size or
    skew.

    Output: (grp:int64, pack_id:int64, n_docs:int64, sum_tokens:int64),
    one row per pack.
    """

    def tokens(df: pd.DataFrame) -> pd.DataFrame:
        n = (
            df[text_col]
            .fillna("")
            .str.split(" ")
            .str.len()
            .astype("int64")
        )
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "grp": (df[id_col] // group_size).astype("int64").to_numpy(),
                "n_tokens": n.to_numpy(),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        prior = g["n_tokens"].cumsum().shift(fill_value=0)
        g = g.assign(pack_id=(prior // budget).astype("int64"))
        out = (
            g.groupby("pack_id", as_index=False)
            .agg(n_docs=(id_col, "size"), sum_tokens=("n_tokens", "sum"))
        )
        out.insert(0, "grp", np.int64(g["grp"].iloc[0]))
        return out.astype(
            {"pack_id": "int64", "n_docs": "int64", "sum_tokens": "int64"}
        )

    from pdf_parser_ray.ops.shuffle import grouped_map

    sized = ds.map_batches(tokens, batch_format="pandas")
    # grp cardinality = corpus/group_size → bounded-partition execution
    return grouped_map(sized, ["grp"], pack, **({"n_parts": n_parts} if n_parts else {}))


def tfidf_top_terms(
    ds: ray.data.Dataset,
    *,
    k: int = 3,
    round_to: int = 6,
    broadcast_limit: int = 5_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "auto",
) -> ray.data.Dataset:
    """Per-document top-k terms by TF-IDF — the classic "what is this
    page about" selector.

    Two passes, same shape as :func:`text_stats.doc_familiarity`:
    document frequencies come from the word_counts-style partial
    combiner (one vocabulary-sized shuffle), are bounded by VOCABULARY
    (``broadcast_limit`` guards the pathological case) and broadcast;
    scoring is then row-local.  score = tf × ln(N / df), ROUNDED to
    ``round_to`` BEFORE the (score DESC, token ASC) top-k tie-break so
    the selection operates on the same values a SQL oracle ordering by
    the rounded alias sees (the knn_cosine lesson).

    ``mode="join"`` (VERDICT r4 #1 — the web-vocabulary scale path,
    the :func:`text_stats.doc_familiarity` pattern): the tf table is
    built batch-locally (a doc's row never splits, so tf needs no
    shuffle), hash-joins the postings on token, scores row-local, and
    finishes with a per-doc top-k — a batch-local partial top-k first,
    so the id_col co-location exchange carries ≤ k rows per (doc,
    batch), never the full term list.  No driver collection of any
    size; identical output (parity-tested — the float expression is
    evaluated in the same order on both routes).

    ``mode="auto"`` (default): bounded ``take(broadcast_limit + 1)``
    probe of the postings — within the limit the probe already IS the
    broadcast table; beyond it fall through to the join route instead
    of raising (the re-run is one extra postings aggregation,
    vocabulary-sized).

    Output: (id_col, token:string, score:float64), ≤ k rows per doc;
    docs with no tokens emit nothing.
    """
    from pdf_parser_ray.ops.text_stats import TOKEN_PAT, token_postings
    from pdf_parser_ray.stages import worker_state

    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"mode must be auto|broadcast|join, got {mode!r}")
    n_docs = ds.count()

    df_rows = None
    if mode != "join":
        df_rows = (
            token_postings(ds)
            .select_columns(["token", "doc_freq"])
            .take(broadcast_limit + 1)  # bounded probe, not take_all
        )
        if len(df_rows) > broadcast_limit:
            if mode == "broadcast":
                raise ValueError(
                    f"vocabulary exceeds broadcast_limit={broadcast_limit}; "
                    "use mode='join' to score via a hash join on token"
                )
            df_rows = None  # mode == "auto": fall through to the join

    if df_rows is None:
        return _tfidf_join_route(
            ds, n_docs=n_docs, k=k, round_to=round_to,
            text_col=text_col, id_col=id_col,
        )
    df_ref = ray.put({r["token"]: r["doc_freq"] for r in df_rows})

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dfreq: dict[str, int] = worker_state(
            ("tfidf_df", df_ref.hex()), lambda: ray.get(df_ref)
        )
        # Vectorized across the batch: explode tokens once, one grouped
        # size for tf, one dict map for df, one sort + grouped head for
        # the per-doc top-k — no Python loop over documents.
        df = df.reset_index(drop=True)
        ex = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT).explode().dropna()
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype="int64"),
                "token": pd.Series([], dtype="object"),
                "score": pd.Series([], dtype="float64"),
            }
        )
        if ex.empty:
            return empty
        tf = (
            pd.DataFrame(
                {
                    id_col: df.loc[ex.index, id_col].to_numpy(),
                    "token": ex.to_numpy(),
                }
            )
            .groupby([id_col, "token"], as_index=False)
            .size()
        )
        idf = np.log(n_docs / tf["token"].map(dfreq).to_numpy(dtype=np.float64))
        tf["score"] = np.round(tf["size"].to_numpy(dtype=np.float64) * idf, round_to)
        top = (
            tf.sort_values([id_col, "score", "token"], ascending=[True, False, True])
            .groupby(id_col, sort=False)
            .head(k)
        )
        return pd.DataFrame(
            {
                id_col: top[id_col].to_numpy(dtype=np.int64),
                "token": top["token"].to_numpy(),
                "score": top["score"].to_numpy(dtype=np.float64),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def _tfidf_join_route(
    ds: ray.data.Dataset,
    *,
    n_docs: int,
    k: int,
    round_to: int,
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """The no-broadcast TF-IDF scale path: tf is batch-local (a doc
    never splits across batches), df rides a token hash join, the
    per-doc top-k runs as partial (batch) + final (id-co-located)
    selection — the exchanges are the token join (tf-table-sized) and
    the id co-location (≤ k rows per doc per batch), never the corpus
    and never a driver-side vocabulary."""
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.relational import hash_join
    from pdf_parser_ray.ops.shuffle import partitioned_map
    from pdf_parser_ray.ops.text_stats import TOKEN_PAT, token_postings

    def tf_partial(df: pd.DataFrame):
        df = df.reset_index(drop=True)
        ex = (
            df[text_col].fillna("").str.lower()
            .str.findall(TOKEN_PAT).explode().dropna()
        )
        if ex.empty:
            return arrow_out(pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "token": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int64"),
            }))
        tf = (
            pd.DataFrame({
                id_col: df.loc[ex.index, id_col].to_numpy(),
                "token": ex.to_numpy(),
            })
            .groupby([id_col, "token"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        return arrow_out(tf.astype({id_col: "int64", "tf": "int64"}))

    tf = ds.map_batches(tf_partial, batch_format="pandas")
    postings = token_postings(ds).select_columns(["token", "doc_freq"])
    # Empty corpus / no tokens: the postings table is schema-less and
    # Acero cannot plan the join — emit the typed empty result (from an
    # Arrow table so the schema survives the zero-row dataset).
    if not len(postings.limit(1).to_pandas()):
        import pyarrow as pa

        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            "token": pa.array([], type=pa.string()),
            "score": pa.array([], type=pa.float64()),
        }))
    joined = hash_join(tf, postings, ["token"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                [id_col, "score", "token"], ascending=[True, False, True]
            )
            .groupby(id_col, sort=False)
            .head(k)
        )

    def score_partial(df: pd.DataFrame):
        # Same expression, same evaluation order as the broadcast
        # route: ln(N / df) in float64, tf × idf, THEN round — so both
        # routes (and the SQL twin) select on identical doubles.
        idf = np.log(n_docs / df["doc_freq"].to_numpy(dtype=np.float64))
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(dtype=np.int64),
            "token": df["token"].to_numpy(),
            "score": np.round(df["tf"].to_numpy(dtype=np.float64) * idf,
                              round_to),
        })
        # Partial top-k: the id co-location exchange ships ≤ k rows per
        # (doc, batch) instead of the doc's whole term list.
        return arrow_out(topk(out))

    scored = joined.map_batches(score_partial, batch_format="pandas")

    def final_topk(part: pd.DataFrame) -> pd.DataFrame:
        top = topk(part)
        return pd.DataFrame({
            id_col: top[id_col].to_numpy(dtype=np.int64),
            "token": top["token"].to_numpy(),
            "score": top["score"].to_numpy(dtype=np.float64),
        })

    return partitioned_map(scored, [id_col], final_topk)


def deterministic_shuffle(
    ds,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
    n_parts: int | None = None,
):
    """Deterministic global shuffle for training-data export: every row
    gets a shard and a position within it, both pure functions of the
    row id — md5-ordered, so the "random" order is rerun-stable across
    retries, partitionings and resumes (the same hash-gate family as
    :func:`assign_splits`; an RNG shuffle would make a resumed export
    disagree with the original).

    Shard = first md5 byte mod ``n_shards`` (uniform); position =
    ascending md5 rank inside the shard.  The one shuffle co-locates by
    shard hash; the per-partition kernel is a vectorized sort +
    cumcount.  Position is shard-local by design — a global position
    would serialize the corpus through one task.

    Output: (id_col, shard:int64, pos:int64).
    """
    import hashlib

    import pandas as pd

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        h = df[id_col].map(
            lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest()
        )
        shard = h.str[:2].map(lambda x: int(x, 16)).astype("int64") % n_shards
        return pd.DataFrame({id_col: df[id_col], "__h": h, "shard": shard})

    def order(part: pd.DataFrame) -> pd.DataFrame:
        s = part.sort_values(["shard", "__h", id_col], kind="mergesort")
        pos = s.groupby("shard", sort=False).cumcount().astype("int64")
        return pd.DataFrame(
            {id_col: s[id_col], "shard": s["shard"], "pos": pos.to_numpy()}
        )

    from pdf_parser_ray.ops.shuffle import partitioned_map

    return partitioned_map(
        ds.select_columns([id_col]).map_batches(tag, batch_format="pandas"),
        ["shard"],
        order,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def rebalance_sources(
    ds: ray.data.Dataset,
    targets: dict[str, float],
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic data-mixing: down-sample each source so the kept
    corpus matches the ``targets`` proportions (the mixture-weights
    step of a training-data recipe — e.g. 30 % web, 20 % books, ...).

    T = min_s(count_s / target_s) is the largest total the targets
    admit without up-sampling; each source then keeps
    rate_s = target_s·T / count_s of its rows through the md5
    hash-gate family (16-bit granularity): reruns, retries and any
    partitioning pick the identical sample, and the SQL twin is exact.
    Sources missing from ``targets`` drop entirely.

    The per-source counts are a dimension-bounded groupby (|sources|
    rows on the driver); the gate itself is row-local — one scan, no
    data shuffle.

    Output: the kept rows, original columns.
    """
    from ray.data.aggregate import Count

    counts = (
        ds.groupby(source_col)
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # |sources| rows — dimension-bounded
    )
    counts = counts[counts[source_col].isin(targets)]
    if len(counts) == 0:
        return ds.filter(lambda r: False)
    n = counts["n"].to_numpy(dtype=np.float64)
    tgt = counts[source_col].map(targets).to_numpy(dtype=np.float64)
    total = (n / tgt).min()
    rates = tgt * total / n
    # 16-bit hash-gate thresholds; rate >= 1 keeps everything (the
    # argmin source) — comparing a 4-hex prefix against the 5-char
    # '10000' would corrupt the gate lexicographically.
    thresholds = {
        s: format(int(r * 65536.0), "04x") if r < 1.0 else None
        for s, r in zip(counts[source_col], rates)
    }
    thr_ref = ray.put(thresholds)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        thr: dict = worker_state(
            ("rebalance_thr", thr_ref.hex()), lambda: ray.get(thr_ref)
        )
        src = df[source_col]
        known = src.isin(thr).to_numpy()
        prefixes = df[id_col].map(
            lambda i: hashlib.md5(str(i).encode("ascii")).hexdigest()[:4]
        )
        limits = src.map(lambda s: thr.get(s))
        keep = known & (limits.isna().to_numpy() | (prefixes < limits).to_numpy())
        return df[keep]

    return ds.map_batches(gate, batch_format="pandas")


def chunk_documents(
    ds: ray.data.Dataset,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Split documents into fixed-token chunks with overlap — the
    context-window splitter every RAG / training-ingest pipeline runs
    before embedding or packing.

    Row-local flat-map (one doc → ceil(tokens/stride) chunk rows), no
    shuffle; tokenization is the corpus-wide ASCII ``\\S+`` contract so
    the SQL twin (list slicing over the same token arrays) reproduces
    chunk boundaries exactly.  Zero-token docs emit no chunks; the last
    chunk may be shorter than ``chunk_tokens`` (never empty).

    Output: (id_col, chunk_idx:int64, chunk_text, n_tokens:int64).
    """
    from pdf_parser_ray.ops.text_stats import TOKEN_PAT

    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap

    def split(df: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        idxs: list = []
        texts: list = []
        lens: list = []
        for doc, text in zip(df[id_col], df[text_col].fillna("")):
            toks = TOKEN_PAT.findall(text)
            for j, start in enumerate(range(0, len(toks), stride)):
                piece = toks[start : start + chunk_tokens]
                ids.append(doc)
                idxs.append(j)
                texts.append(" ".join(piece))
                lens.append(len(piece))
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int64"),
                "chunk_text": pd.Series(texts, dtype=str),
                "n_tokens": pd.Series(lens, dtype="int64"),
            }
        )

    return ds.map_batches(split, batch_format="pandas")


def validate_rows(
    ds: ray.data.Dataset,
    rules: list[dict],
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Declarative data-quality validation: evaluate rules per row and
    emit one violation row per (row, failed rule) — the expectation-
    suite gate an ingest pipeline runs before accepting a batch.

    Rule forms (each a dict with ``name`` and ``col``):
    * ``{"kind": "not_null"}``                 — value must not be null
    * ``{"kind": "range", "lo": x, "hi": y}``  — lo ≤ value ≤ y (nulls fail)
    * ``{"kind": "regex", "pattern": p}``      — full-match (ASCII, RE2-safe;
      nulls fail)
    * ``{"kind": "in_set", "values": [...]}``  — membership (nulls fail)

    Row-local, zero shuffle; every check is one vectorized pandas op.
    The long output shape (id, rule) is SQL-twin-friendly (a UNION of
    per-rule SELECTs) and feeds a tiny groupby for per-rule totals.

    Output: (id_col, rule:string), one row per violation.
    """
    compiled = []
    for r in rules:
        rr = dict(r)
        if rr["kind"] == "regex":
            rr["_re"] = re.compile(rr["pattern"], re.ASCII)
        compiled.append(rr)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        ids: list = []
        names: list = []
        for r in compiled:
            col = df[r["col"]]
            if r["kind"] == "not_null":
                bad = col.isna()
            elif r["kind"] == "range":
                bad = ~((col >= r["lo"]) & (col <= r["hi"]))
                bad = bad | col.isna()
            elif r["kind"] == "regex":
                bad = ~col.fillna("").str.fullmatch(r["_re"]).astype(bool)
                bad = bad | col.isna()
            elif r["kind"] == "in_set":
                bad = ~col.isin(r["values"]) | col.isna()
            else:
                raise ValueError(f"unknown rule kind {r['kind']!r}")
            b = df.loc[bad.to_numpy(), id_col]
            ids.extend(b.tolist())
            names.extend([r["name"]] * len(b))
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "rule": pd.Series(names, dtype=str),
            }
        )

    return ds.map_batches(check, batch_format="pandas")


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    key: str = "doc_id",
    fp_col: str = "fp",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Corpus-version diff: which keys were added, removed, or changed
    between two snapshots — the primitive an iterating curation
    pipeline runs before re-training (what did this filter tweak
    actually touch?).

    Both inputs carry only (key, fp_col) where fp_col is any equality
    fingerprint (md5 of the payload — never the payload itself; the
    shuffle moves 2 small columns per row regardless of document size).
    Shape: tag each side, one int-keyed co-location on ``key``
    (ops.shuffle.partitioned_map), vectorized per-partition compare.
    Unchanged keys are dropped.

    Output: (key, change:str in {'added','removed','changed'}).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def tag(side: int):
        def fn(df: pd.DataFrame) -> "object":
            return arrow_out(
                pd.DataFrame(
                    {key: df[key].astype("int64"),
                     fp_col: df[fp_col].astype(str),
                     "__src": np.int64(side)}
                )
            )

        return fn

    tagged = old.map_batches(tag(0), batch_format="pandas").union(
        new.map_batches(tag(1), batch_format="pandas")
    )

    def diff_partition(part: pd.DataFrame) -> pd.DataFrame:
        # every row of a key is in this partition: pivot by side
        o = part[part["__src"] == 0].set_index(key)[fp_col]
        n = part[part["__src"] == 1].set_index(key)[fp_col]
        both = o.index.intersection(n.index)
        changed = both[(o[both] != n[both]).to_numpy()]
        added = n.index.difference(o.index)
        removed = o.index.difference(n.index)
        return pd.DataFrame(
            {
                key: np.concatenate(
                    [added.to_numpy(), removed.to_numpy(), changed.to_numpy()]
                ).astype("int64"),
                "change": (["added"] * len(added)
                           + ["removed"] * len(removed)
                           + ["changed"] * len(changed)),
            }
        )

    return partitioned_map(
        tagged, [key], diff_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def pseudonymize(
    ds: "ray.data.Dataset",
    col: str,
    *,
    pepper: str = "pepper",
    token_len: int = 16,
    out_col: str = "token",
) -> "ray.data.Dataset":
    """Deterministic PII pseudonymization: replace an identifier column
    with the md5 prefix of ``pepper + ':' + value`` — the keyed-token
    shape (stable across reruns/partitions so joins on the token still
    work, irreversible without the pepper).  Any SQL engine re-derives
    the identical token (``substr(md5(pepper || ':' || v), 1, n)``).

    Row-local map_batches; hashing loops over DISTINCT values per
    batch (``Series.map`` over a unique-value dict), so repeated ids
    cost one hash.
    """
    import hashlib

    def run(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.io_utils import arrow_out

        uniq = df[col].drop_duplicates()
        lut = {
            v: hashlib.md5(
                f"{pepper}:{v}".encode("utf-8")
            ).hexdigest()[:token_len]
            for v in uniq
        }
        out = df.copy()
        out[out_col] = df[col].map(lut)
        return arrow_out(out)

    return ds.map_batches(run, batch_format="pandas")


def winsorize(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    *,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Per-group winsorization: clip ``value_col`` into its group's
    [q_lo, q_hi] discrete-quantile band — the outlier-taming transform
    applied before revenue/duration aggregates.

    Fit-small/apply-wide: the exact per-group edges come from
    :func:`ops.quantiles.grouped_quantile_disc` (bounded: one row per
    group, values straight from the data — so the clipped output is
    bit-exact cross-engine), broadcast once, and applied as one
    vectorized clip per batch.  Two passes over ``ds`` (quantile fit +
    apply), both streaming.
    """
    from pdf_parser_ray.ops.quantiles import grouped_quantile_disc
    from pdf_parser_ray.ops.relational import broadcast_merge

    out_col = out_col or value_col + "_w"
    edges = grouped_quantile_disc(
        ds, group_col, value_col, {"__lo": lo, "__hi": hi}
    )

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.io_utils import arrow_out

        out = df.assign(
            **{out_col: df[value_col].clip(df["__lo"], df["__hi"])}
        )
        return arrow_out(out.drop(columns=["__lo", "__hi"]))

    return broadcast_merge(ds, edges, on=group_col, how="left").map_batches(
        clip, batch_format="pandas"
    )


def token_budget_cap(
    ds: ray.data.Dataset,
    budget: int,
    *,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Per-group token budget: walking each group in ``order_col``
    order, keep documents while the running token total stays within
    ``budget`` — the data-mixing step that caps how much any one
    source contributes to a training run (by tokens, not documents).

    This is a DISTRIBUTED PREFIX SUM, not a per-group sort: a per-group
    ordered cumsum done with ``groupby(group).map_groups`` would drag a
    whole source (possibly 20 % of the corpus) into one worker frame.
    Instead:

    1. one streaming pass computes per (group, order-range bucket)
       token subtotals — a bounded partial (``groups × n_buckets``
       rows) collected on the driver;
    2. the driver turns subtotals into EXCLUSIVE per-bucket offsets
       (cumsum in bucket order — buckets are monotone in
       ``order_col``, so cross-bucket order is already resolved) and
       broadcasts the offset map via ``ray.put``;
    3. a second pass co-locates rows by (group, bucket) — bounded
       partitions of ~N/n_buckets rows — sorts locally, adds the
       bucket offset to the local cumsum, and keeps rows with
       ``offset + local_cum <= budget``.

    Token rule matches :data:`pdf_parser_ray.ops.text_stats.TOKEN_PAT`
    (lowered ``\\S+``) so the DuckDB window-sum twin is exact.

    Output: (group_col, order_col, n_tok:int64, cum_tokens:int64),
    only rows within budget.
    """
    from ray.data.aggregate import Max, Min

    from pdf_parser_ray.ops.shuffle import partitioned_map
    from pdf_parser_ray.ops.text_stats import TOKEN_PAT

    bounds = ds.select_columns([order_col]).aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi")
    )
    lo = int(bounds["lo"])
    width = max(1, -(-(int(bounds["hi"]) - lo + 1) // n_buckets))

    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        # \S+ counts are case-insensitive by construction — no lower()
        n_tok = df[text_col].fillna("").str.count(TOKEN_PAT).astype("int64")
        return pd.DataFrame(
            {
                group_col: df[group_col],
                order_col: df[order_col].astype("int64"),
                "__bucket": ((df[order_col].astype("int64") - lo) // width),
                "n_tok": n_tok,
            }
        )

    counted = ds.select_columns([group_col, order_col, text_col]).map_batches(
        count_tokens, batch_format="pandas"
    )

    # pass 1: bounded partial -> driver-side exclusive offsets
    def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([group_col, "__bucket"], as_index=False)["n_tok"]
            .sum()
            .astype({"n_tok": "int64"})
        )

    subtotals = (
        counted.map_batches(bucket_partial, batch_format="pandas")
        .to_pandas()
        .groupby([group_col, "__bucket"], as_index=False)["n_tok"]
        .sum()
        .sort_values([group_col, "__bucket"])
    )
    subtotals["offset"] = (
        subtotals.groupby(group_col)["n_tok"].cumsum() - subtotals["n_tok"]
    )
    offsets_ref = ray.put(
        subtotals[[group_col, "__bucket", "offset"]].reset_index(drop=True)
    )

    # pass 2: co-locate by (group, bucket), local ordered cumsum + offset
    def within_budget(part: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        offs = worker_state(("budget_offsets", offsets_ref.hex()),
                            lambda: ray.get(offsets_ref))
        part = part.sort_values([group_col, "__bucket", order_col])
        cum = part.groupby([group_col, "__bucket"], sort=False)["n_tok"].cumsum()
        base = (
            part[[group_col, "__bucket"]]
            .merge(offs, on=[group_col, "__bucket"], how="left")["offset"]
            .fillna(0)
            .astype("int64")
            .to_numpy()
        )
        part = part.assign(cum_tokens=(cum.to_numpy() + base).astype("int64"))
        keep = part[part["cum_tokens"] <= budget]
        return keep[[group_col, order_col, "n_tok", "cum_tokens"]].reset_index(
            drop=True
        )

    return partitioned_map(
        counted, [group_col, "__bucket"], within_budget,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def dsir_logweights(
    ds: ray.data.Dataset,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    round_to: int = 6,
) -> ray.data.Dataset:
    """DSIR-style importance log-weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how much more likely its hashed-unigram features
    are under the TARGET distribution (rows where ``target_col ==
    target_value``) than under the raw corpus distribution —
    ``logweight = Σ_tokens ln p̂_tgt(bucket) / p̂_raw(bucket)`` with
    add-one smoothing over ``n_buckets`` md5 feature buckets.

    Two streaming passes, no corpus shuffle: pass 1 reduces to a
    ``n_buckets``-row count table (per-batch partials, driver merge —
    bounded regardless of corpus size); the log-ratio vector is
    broadcast once via ``ray.put``; pass 2 scores each document
    row-locally.  Token→bucket md5 hashes are cached per worker across
    batches (vocabulary-bounded dict), everything else is vectorized
    explode/groupby/dot.

    md5 bucketing (``int(md5(token)[:8], 16) % n_buckets``) is
    reproducible in DuckDB as ``('0x' || substr(md5(t),1,8))::BIGINT %
    n_buckets`` — the register-exact-oracle trick.  Cross-row float
    sum → rounded on BOTH engines.

    Output: (id_col, n_tokens:int64, logweight:float64), zero-token
    documents dropped (they have no feature mass on either side).
    """
    import hashlib
    import math

    from pdf_parser_ray.ops.text_stats import TOKEN_PAT

    def _bucketize(tokens: pd.Series) -> pd.Series:
        """token Series -> bucket Series via a worker-cached md5 map."""
        from pdf_parser_ray.stages import worker_state

        cache = worker_state(("dsir_md5", n_buckets), dict)
        uniq = tokens.unique()
        missing = [t for t in uniq if t not in cache]
        for t in missing:
            cache[t] = (
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % n_buckets
            )
        return tokens.map(cache)

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        is_tgt = (df[target_col] == target_value).to_numpy()
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int64"),
                 "n_all": pd.Series([], dtype="int64"),
                 "n_tgt": pd.Series([], dtype="int64")}
            )
        pos = df.index.get_indexer(ex.index)
        out = pd.DataFrame(
            {"bucket": _bucketize(ex).astype("int64").to_numpy(),
             "n_tgt": is_tgt[pos].astype("int64")}
        )
        g = out.groupby("bucket", as_index=False).agg(
            n_all=("n_tgt", "size"), n_tgt=("n_tgt", "sum")
        )
        return g.astype({"n_all": "int64", "n_tgt": "int64"})

    counts = (
        ds.select_columns([target_col, text_col])
        .map_batches(bucket_counts, batch_format="pandas")
        .to_pandas()
        .groupby("bucket", as_index=False)
        .sum()
    )
    A = int(counts["n_all"].sum())
    T = int(counts["n_tgt"].sum())
    lw = np.zeros(n_buckets, dtype=np.float64)
    base = math.log(1.0 / (T + n_buckets)) - math.log(1.0 / (A + n_buckets))
    lw[:] = base  # buckets with zero observed mass: both sides smooth to 1
    for b, na, nt in zip(counts["bucket"], counts["n_all"], counts["n_tgt"]):
        lw[int(b)] = math.log((int(nt) + 1) / (T + n_buckets)) - math.log(
            (int(na) + 1) / (A + n_buckets)
        )
    lw_ref = ray.put(lw)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        w = worker_state(("dsir_lw", lw_ref.hex()), lambda: ray.get(lw_ref))
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "n_tokens": pd.Series([], dtype="int64"),
                 "logweight": pd.Series([], dtype="float64")}
            )
        b = _bucketize(ex).astype("int64").to_numpy()
        sc = pd.DataFrame(
            {id_col: df.loc[ex.index, id_col].to_numpy(), "__w": w[b]}
        )
        g = sc.groupby(id_col, as_index=False).agg(
            n_tokens=("__w", "size"), logweight=("__w", "sum")
        )
        g["logweight"] = np.round(g["logweight"], round_to) + 0.0
        return g.astype({id_col: "int64", "n_tokens": "int64"})

    return ds.select_columns([id_col, target_col, text_col]).map_batches(
        score, batch_format="pandas"
    )


def split_contamination(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Cross-split leakage audit: how many val/test documents share at
    least one word ``ngram``-gram with ANY train document — the check
    that the deterministic split (:func:`assign_splits`) didn't leak
    benchmark-style verbatim text across the boundary.

    Unlike :func:`decontaminate` (broadcast probe set — right when the
    probe side is benchmark-sized), the train side here is most of the
    corpus, so membership goes through ONE gram-hash co-location:
    distinct (gram md5, split, doc) rows shuffle by gram, a gram's
    group reveals train∧eval collisions locally, and only the distinct
    contaminated doc_ids come back (bounded by eval-split size).
    Documents shorter than ``ngram`` tokens carry no grams (no
    short-doc collapse — a 3-token doc can't leak an 8-gram).

    Output: (split, n_docs:int64, n_contaminated:int64) for each
    non-train split.
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.ops.shuffle import grouped_map, partitioned_map

    def explode_grams(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib as _h

        rows_doc, rows_split, rows_gh = [], [], []
        splits = [_split_of(i) for i in df[id_col]]
        for doc_id, split, text in zip(df[id_col], splits, df[text_col].fillna("")):
            toks = [t for t in _SPLIT_WS.split(text.lower().strip()) if t]
            if len(toks) < ngram:
                continue
            grams = {
                " ".join(toks[i : i + ngram])
                for i in range(len(toks) - ngram + 1)
            }
            for g in grams:
                rows_doc.append(int(doc_id))
                rows_split.append(split)
                # 8-byte md5-prefix ints, not 32-char hex strings: 4×
                # less shuffle volume, same SQL twin via
                # ('0x' || substr(md5(g),1,16))::UBIGINT
                rows_gh.append(
                    int(_h.md5(g.encode("utf-8")).hexdigest()[:16], 16)
                )
        return pd.DataFrame(
            {
                "doc_id": pd.Series(rows_doc, dtype="int64"),
                "split": pd.Series(rows_split, dtype="object"),
                "gh": pd.Series(rows_gh, dtype="uint64"),
            }
        )

    def collisions(part: pd.DataFrame) -> pd.DataFrame:
        # a gram's rows are all here: eval rows sharing a gram with a
        # train row are contaminated
        has_train = part.groupby("gh")["split"].transform(
            lambda s: (s == "train").any()
        )
        hit = part[(part["split"] != "train") & has_train]
        return hit[["doc_id", "split"]].drop_duplicates()

    def split_totals(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.Series([_split_of(i) for i in df[id_col]], dtype="object")
        out = (
            pd.DataFrame({"split": s[s != "train"]})
            .groupby("split", as_index=False)
            .size()
            .rename(columns={"size": "n_docs"})
        )
        return out.astype({"n_docs": "int64"})

    grams = ds.select_columns([id_col, text_col]).map_batches(
        explode_grams, batch_format="pandas"
    )
    kw = {"n_parts": n_parts} if n_parts else {}
    hits = partitioned_map(grams, ["gh"], collisions, **kw)

    def count_hits(part: pd.DataFrame) -> pd.DataFrame:
        g = (
            part.drop_duplicates()
            .groupby("split", as_index=False)
            .size()
            .rename(columns={"size": "n_contaminated"})
        )
        return g.astype({"n_contaminated": "int64"})

    per_split_hits = (
        partitioned_map(hits, ["doc_id"], lambda p: p.drop_duplicates(), **kw)
        .map_batches(count_hits, batch_format="pandas")
        .groupby("split")
        .aggregate(Sum("n_contaminated", alias_name="n_contaminated"))
    )
    totals = (
        ds.select_columns([id_col])
        .map_batches(split_totals, batch_format="pandas")
        .groupby("split")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    hits_df = per_split_hits.to_pandas()
    out = totals.merge(hits_df, on="split", how="left")
    out["n_contaminated"] = out["n_contaminated"].fillna(0).astype("int64")
    out = out.sort_values("split").reset_index(drop=True)
    import ray.data as _rd

    return _rd.from_pandas(out.astype({"n_docs": "int64"}))


_SPLIT_WS = re.compile(r"\s+", re.ASCII)


def _split_of(doc_id) -> str:
    """The assign_splits default gate, shared so audit and assignment
    can never disagree: md5(str(id))[:2] < 'd0' → train, < 'e8' → val,
    else test."""
    p = hashlib.md5(str(doc_id).encode("ascii")).hexdigest()[:2]
    return "train" if p < "d0" else ("val" if p < "e8" else "test")


def temperature_mix(
    ds: ray.data.Dataset,
    *,
    alpha_num: int = 1,
    alpha_den: int = 2,
    target_num: int = 1,
    target_den: int = 2,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Temperature-scaled source re-sampling (the multilingual-LM
    mixing rule, w_s ∝ n_s^α with α = alpha_num/alpha_den, here fixed
    to the classic α = 1/2): derives the per-source keep rates from
    the observed counts — :func:`rebalance_sources` with the targets
    computed, not given.

    rate_s = min(1, (target · N · w_s) / (Σw · n_s)) with
    w_s = ⌊√n_s⌋, so small sources are up-weighted toward uniform and
    the expected kept total is target·N.

    EXACT integer contract: w_s is the integer square root (floor of
    the correctly-rounded IEEE sqrt — exact for n < 2^52, so numpy and
    DuckDB agree bit-for-bit), and the 64-bit hash-gate threshold
    floor(2^64 · target_num · N · w_s / (target_den · Σw · n_s)) is
    evaluated in arbitrary-precision ints (HUGEINT on the SQL side) —
    no float ever crosses the engine boundary, unlike a pow(n, α)
    formulation whose libm rounding is engine-specific.

    Scale plan: counts are a dimension-bounded groupby (|sources| rows
    to the driver); the gate is row-local (md5-prefix uint64 per id vs
    a broadcast per-source threshold).  One scan, zero data shuffle.

    Output: (source, n_total:int64, n_kept:int64) per source, plus the
    threshold-implied exact keep decision on every row folded into the
    counts (the kept rows themselves are a `.filter`-shaped variant —
    this op reports the mix audit table).
    """
    import math

    from ray.data.aggregate import Sum

    if (alpha_num, alpha_den) != (1, 2):
        raise NotImplementedError(
            "exact integer contract implemented for alpha = 1/2"
        )

    from ray.data.aggregate import Count

    counts = (
        ds.groupby(source_col).aggregate(Count(alias_name="n")).to_pandas()
    )
    n_by_src = dict(zip(counts[source_col], counts["n"].astype(int)))
    total = int(sum(n_by_src.values()))
    w = {s: math.isqrt(n) for s, n in n_by_src.items()}
    sw = sum(w.values())
    thr = {
        s: min(
            1 << 64,
            ((1 << 64) * target_num * total * w[s])
            // (target_den * sw * n_by_src[s]),
        )
        for s in n_by_src
    }
    thr_ref = ray.put(thr)

    def gate_counts(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        t: dict = worker_state(
            ("tempmix_thr", thr_ref.hex()), lambda: ray.get(thr_ref)
        )
        h = df[id_col].map(
            lambda i: int(
                hashlib.md5(str(i).encode("ascii")).hexdigest()[:16], 16
            )
        )
        limits = df[source_col].map(t)
        kept = (h < limits).astype("int64")
        g = pd.DataFrame(
            {source_col: df[source_col], "n_total": 1, "n_kept": kept}
        )
        return g.groupby(source_col, as_index=False)[
            ["n_total", "n_kept"]
        ].sum()

    agg = (
        ds.select_columns([source_col, id_col])
        .map_batches(gate_counts, batch_format="pandas")
        .groupby(source_col)
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_kept", alias_name="n_kept"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.astype({"n_total": "int64", "n_kept": "int64"})

    return agg.map_batches(finish, batch_format="pandas")


def k_anonymity_audit(
    ds: ray.data.Dataset,
    *,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 10,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Privacy audit of a release candidate: for every quasi-identifier
    combination, the group size (k-anonymity — groups under ``k`` are
    re-identifiable) and the number of DISTINCT sensitive values
    (l-diversity — a large group whose sensitive attribute is constant
    still leaks).  The pre-release gate that pairs with
    :func:`pseudonymize` / ``pii_redact``.

    Both statistics key on ONE packed quasi-identifier string (unit
    separator) and ride ONE __qid co-location exchange (r5): the
    per-batch combiner emits (combo, hash64(sensitive), count) — so
    the sensitive PAYLOAD never shuffles and volume is O(distinct
    pairs) of 8-byte hashes, never O(rows × payload) — and with every
    row of a combo in one partition, the row count (Σ count) and the
    distinct-sensitive count (nunique) are both partition-local.  The
    previous staging (a count sort-aggregate + the distinct-pair
    exchange + a union merge Sort) paid three barrier operators for
    the same answer — measured 12.1 s → ~4 s at sf0.1/32.

    Output: (quasi_cols… as strings, n_rows:int64, l_diversity:int64,
    k_anonymous:bool) with ``k_anonymous = n_rows >= k``.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    sep = "\x1f"

    def pack(df: pd.DataFrame):
        key = df[quasi_cols[0]].astype(str)
        for c in quasi_cols[1:]:
            key = key + sep + df[c].astype(str)
        # hash the sensitive value to 64 bits BEFORE the distinct-pair
        # shuffle: l-diversity only needs the distinct COUNT, and the
        # raw column (document text) would make the pair shuffle
        # corpus-sized.  Within-group birthday collision odds at even
        # 10^6 distinct values/group are ~3e-8 — an undercount of 1,
        # never a privacy-optimistic direction at the k/l scales audited.
        sv = pd.util.hash_array(
            df[sensitive_col].to_numpy(dtype=object)
        ).astype("uint64").view("int64")
        return arrow_out(pd.DataFrame({"__qid": key, "__sv": sv}))

    def pair_partial(df: pd.DataFrame):
        # combiner: one row per distinct (combo, sv-hash) per batch,
        # carrying its in-batch multiplicity — the only thing shuffled
        g = df.groupby(["__qid", "__sv"], as_index=False).size()
        return arrow_out(
            pd.DataFrame(
                {"__qid": g["__qid"],
                 "__sv": g["__sv"].astype("int64"),
                 "c": g["size"].astype("int64")}
            )
        )

    pairs = (
        ds.select_columns(quasi_cols + [sensitive_col])
        .map_batches(pack, batch_format="pandas")
        .map_batches(pair_partial, batch_format="pandas")
    )

    def finish(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame(
                {**{c: pd.Series(dtype=str) for c in quasi_cols},
                 "n_rows": pd.Series(dtype="int64"),
                 "l_diversity": pd.Series(dtype="int64"),
                 "k_anonymous": pd.Series(dtype=bool)}
            )
        agg = part.groupby("__qid", as_index=False).agg(
            n_rows=("c", "sum"), l_diversity=("__sv", "nunique")
        )
        cols = agg["__qid"].str.split(sep, expand=True)
        res = pd.DataFrame(
            {c: cols[i].astype(str) for i, c in enumerate(quasi_cols)}
        )
        res["n_rows"] = agg["n_rows"].astype("int64").to_numpy()
        res["l_diversity"] = agg["l_diversity"].astype("int64").to_numpy()
        res["k_anonymous"] = res["n_rows"] >= k
        return res

    return partitioned_map(
        pairs, ["__qid"], finish,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def shard_plan(
    ds: ray.data.Dataset,
    target_size: int,
    *,
    size_col: str = "n_chars",
    order_col: str = "doc_id",
    n_buckets: int = 256,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Compaction / shard-layout planner: walking the corpus in
    ``order_col`` order, assign each row an output shard id so every
    shard holds ~``target_size`` bytes (sorted first-fit: a shard takes
    rows until the running total crosses the budget; one row may
    overflow it — the classic size-targeted Parquet compaction rule).

    shard = exclusive_prefix_sum(size) // target_size — a GLOBAL
    ordered prefix sum, computed with the :func:`token_budget_cap`
    histogram plan (per order-range-bucket subtotals → driver
    exclusive offsets → bucket co-location + local cumsum), never a
    global sort and never one worker holding the corpus.

    Output: (order_col, size_col:int64, shard:int64).
    """
    from ray.data.aggregate import Max, Min

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    bounds = ds.select_columns([order_col]).aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi")
    )
    lo = int(bounds["lo"])
    width = max(1, -(-(int(bounds["hi"]) - lo + 1) // n_buckets))

    def tag(df: pd.DataFrame):
        order = df[order_col].astype("int64")
        return arrow_out(
            pd.DataFrame(
                {
                    order_col: order,
                    "__bucket": ((order - lo) // width),
                    "sz": df[size_col].astype("int64"),
                }
            )
        )

    tagged = ds.select_columns([order_col, size_col]).map_batches(
        tag, batch_format="pandas"
    )

    def bucket_partial(df: pd.DataFrame):
        return arrow_out(
            df.groupby("__bucket", as_index=False)["sz"].sum()
        )

    subtotals = (
        tagged.map_batches(bucket_partial, batch_format="pandas")
        .to_pandas()  # ≤ batches × n_buckets rows — bounded
        .groupby("__bucket", as_index=False)["sz"].sum()
        .sort_values("__bucket")
    )
    subtotals["offset"] = subtotals["sz"].cumsum() - subtotals["sz"]
    offsets_ref = ray.put(
        dict(zip(subtotals["__bucket"], subtotals["offset"]))
    )

    def assign(part: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        offs: dict = worker_state(
            ("shard_offsets", offsets_ref.hex()), lambda: ray.get(offsets_ref)
        )
        out = []
        for b, g in part.groupby("__bucket"):
            g = g.sort_values(order_col).reset_index(drop=True)
            sz = g["sz"].to_numpy(dtype=np.int64)
            excl = np.cumsum(sz) - sz + int(offs.get(b, 0))
            out.append(
                pd.DataFrame(
                    {
                        order_col: g[order_col].to_numpy(),
                        size_col: sz,
                        "shard": excl // int(target_size),
                    }
                )
            )
        empty = pd.DataFrame(
            {
                order_col: pd.Series([], dtype="int64"),
                size_col: pd.Series([], dtype="int64"),
                "shard": pd.Series([], dtype="int64"),
            }
        )
        return arrow_out(pd.concat(out, ignore_index=True) if out else empty)

    return partitioned_map(
        tagged, ["__bucket"], assign,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def shard_plan_summary(
    plan: ray.data.Dataset,
    *,
    size_col: str = "n_chars",
    order_col: str = "doc_id",
) -> ray.data.Dataset:
    """Audit rollup of a :func:`shard_plan`: per shard the row count,
    total bytes, and the covered ``order_col`` range — the view an
    operator reads to sanity-check a compaction before launching it.
    Per-batch partial → capped DRIVER reduce (r5: shards × batches
    tiny rows; Ray's sort-aggregate barrier cost ~4 s at sf0.1/32 for
    a 75-row answer — the calibration_bins rule)."""
    from pdf_parser_ray.io_utils import arrow_out

    def partial(df: pd.DataFrame):
        g = df.groupby("shard", as_index=False).agg(
            n_docs=(order_col, "size"),
            total_bytes=(size_col, "sum"),
            first_doc=(order_col, "min"),
            last_doc=(order_col, "max"),
        )
        return arrow_out(g.astype({"n_docs": "int64", "total_bytes": "int64"}))

    pool_limit = 5_000_000
    pool = (
        plan.map_batches(partial, batch_format="pandas")
        .limit(pool_limit + 1)
        .to_pandas()
    )
    if len(pool) > pool_limit:
        raise ValueError(
            f"shard_plan_summary partial pool exceeds {pool_limit} rows "
            "(shards × batches); restore a distributed grouped_agg finish"
        )
    out = pool.groupby("shard", as_index=False).agg(
        n_docs=("n_docs", "sum"),
        total_bytes=("total_bytes", "sum"),
        first_doc=("first_doc", "min"),
        last_doc=("last_doc", "max"),
    ).astype({"n_docs": "int64", "total_bytes": "int64"})
    import ray.data as _rd

    return _rd.from_pandas(out.reset_index(drop=True))


def epoch_repeats(
    ds: ray.data.Dataset,
    total: int,
    *,
    weight_col: str = "n_chars",
    order_col: str = "doc_id",
    n_buckets: int = 256,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Deterministic epoch plan: integer repeat counts per document
    proportional to an integer weight column, summing to EXACTLY
    ``total`` — systematic (stride) resampling,
    ``repeats_i = floor(cum_i·T/W) − floor(cum_{i−1}·T/W)`` over the
    inclusive weight prefix sum in ``order_col`` order.  The step that
    turns mixing weights (temperature mix, dup-aware weights, source
    rebalance) into a concrete repeat-per-doc table for one training
    epoch, with no RNG state and no float drift.

    Same distributed-prefix-sum plan as :func:`shard_plan` (bucket
    subtotals → driver exclusive offsets → bucket co-location).  The
    boundary products ``cum·T`` run through Python big ints when
    ``W·T`` approaches int64 range (exactness over speed on that one
    multiply; the int64 fast path covers bench scale).

    Output: (order_col, weight_col:int64, repeats:int64); rows with
    repeats == 0 are kept (the plan is total — auditing zeros is the
    point).
    """
    from ray.data.aggregate import Max, Min

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    bounds = ds.select_columns([order_col]).aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi")
    )
    lo = int(bounds["lo"])
    width = max(1, -(-(int(bounds["hi"]) - lo + 1) // n_buckets))

    def tag(df: pd.DataFrame):
        order = df[order_col].astype("int64")
        return arrow_out(
            pd.DataFrame(
                {
                    order_col: order,
                    "__bucket": ((order - lo) // width),
                    "wt": df[weight_col].astype("int64"),
                }
            )
        )

    tagged = ds.select_columns([order_col, weight_col]).map_batches(
        tag, batch_format="pandas"
    )

    def bucket_partial(df: pd.DataFrame):
        return arrow_out(df.groupby("__bucket", as_index=False)["wt"].sum())

    subtotals = (
        tagged.map_batches(bucket_partial, batch_format="pandas")
        .to_pandas()  # bounded
        .groupby("__bucket", as_index=False)["wt"].sum()
        .sort_values("__bucket")
    )
    W = int(subtotals["wt"].sum())
    if W <= 0:
        raise ValueError("epoch_repeats needs positive total weight")
    subtotals["offset"] = subtotals["wt"].cumsum() - subtotals["wt"]
    offsets_ref = ray.put(dict(zip(subtotals["__bucket"], subtotals["offset"])))
    T = int(total)
    exact_int64 = W < 2**62 // max(T, 1)

    def assign(part: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        offs: dict = worker_state(
            ("epoch_offsets", offsets_ref.hex()), lambda: ray.get(offsets_ref)
        )
        out = []
        for b, g in part.groupby("__bucket"):
            g = g.sort_values(order_col).reset_index(drop=True)
            wt = g["wt"].to_numpy(dtype=np.int64)
            cum = np.cumsum(wt) + int(offs.get(b, 0))
            excl = cum - wt
            if exact_int64:
                reps = (cum * T) // W - (excl * T) // W
            else:  # big-int exact path (W·T would overflow int64)
                reps = np.array(
                    [int(c) * T // W - int(e) * T // W
                     for c, e in zip(cum, excl)],
                    dtype=np.int64,
                )
            out.append(
                pd.DataFrame(
                    {
                        order_col: g[order_col].to_numpy(),
                        weight_col: wt,
                        "repeats": reps.astype(np.int64),
                    }
                )
            )
        empty = pd.DataFrame(
            {
                order_col: pd.Series([], dtype="int64"),
                weight_col: pd.Series([], dtype="int64"),
                "repeats": pd.Series([], dtype="int64"),
            }
        )
        return arrow_out(pd.concat(out, ignore_index=True) if out else empty)

    return partitioned_map(
        tagged, ["__bucket"], assign,
        **({"n_parts": n_parts} if n_parts else {}),
    )


_SPAN_T32 = 2**32


def span_corruption(
    ds: ray.data.Dataset,
    *,
    mask_ratio: float = 0.15,
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_text: bool = False,
) -> ray.data.Dataset:
    """T5-style span corruption with NO RNG state: word ``i`` of doc
    ``d`` is masked iff ``int(md5(f"{d}:{i}")[:8], 16) < mask_ratio·2³²``
    — every worker, every rerun, every engine selects the same spans
    (the stratified_sample hash-gate rule applied positionally).
    Runs of masked words collapse into sentinel spans
    ``<extra_id_k>`` (the public T5 convention).

    Row-local, zero shuffle; the per-position md5 is the honest cost
    (bounded per word, same class as the MinHash per-doc loop).

    Output: (id_col, n_words, n_masked, n_spans[, corrupted:string]).
    The stats triple is SQL-exact (DuckDB list-lambda twin re-derives
    every mask bit); the corrupted text is pinned by tests.
    """
    thresh = int(mask_ratio * _SPAN_T32)

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.text_stats import TOKEN_PAT

    def corrupt(df: pd.DataFrame):
        ids = df[id_col].astype("int64").to_numpy()
        n_words = np.zeros(len(df), dtype=np.int64)
        n_masked = np.zeros(len(df), dtype=np.int64)
        n_spans = np.zeros(len(df), dtype=np.int64)
        texts = []
        for r, (d, t) in enumerate(zip(ids, df[text_col].fillna(""))):
            words = TOKEN_PAT.findall(t)
            n_words[r] = len(words)
            prev = False
            out_words = []
            k = 0
            for i, w in enumerate(words):
                h = int(
                    hashlib.md5(f"{d}:{i}".encode()).hexdigest()[:8], 16
                )
                m = h < thresh
                if m:
                    n_masked[r] += 1
                    if not prev:
                        n_spans[r] += 1
                        if emit_text:
                            out_words.append(f"<extra_id_{k}>")
                            k += 1
                elif emit_text:
                    out_words.append(w)
                prev = m
            if emit_text:
                texts.append(" ".join(out_words))
        cols = {
            id_col: ids,
            "n_words": n_words,
            "n_masked": n_masked,
            "n_spans": n_spans,
        }
        if emit_text:
            cols["corrupted"] = pd.Series(texts, dtype="object")
        return arrow_out(pd.DataFrame(cols))

    return ds.select_columns([id_col, text_col]).map_batches(
        corrupt, batch_format="pandas"
    )


def dp_group_counts(
    ds,
    key_col: str,
    *,
    epsilon: float = 1.0,
    salt: str = "dp",
    round_to: int = 6,
    n_parts: int | None = None,
):
    """Differentially-private group counts with DETERMINISTIC seeded
    Laplace noise: each key's exact count gets Laplace(0, 1/epsilon)
    drawn by inverse-CDF from an md5-derived uniform of (salt, key) —
    the md5-12-hex uniform idiom the sampling queries already share
    with their DuckDB twins, so the NOISE itself is value-checked.

    Determinism is a test/replay property: reruns, retries and
    repartitions emit identical noise for identical keys.  A real DP
    deployment must swap the seeded uniform for fresh randomness per
    release (and drop the exact ``n`` column this audit variant keeps
    for inspection) — noise reuse across releases spends no additional
    privacy budget but reveals the original counts once, and the seed
    must stay secret.

    Exact partial counts per batch -> ONE co-located grouped sum ->
    row-local noise attach (sign/ln on float64, round-6 +0.0 contract;
    the 1-2|u-0.5| log argument clamps at 2^-52 exactly as the SQL twin
    does, so the two engines agree on the measure-zero edge).

    Output: (key_col, n:int64, noisy_n:float64).
    """
    import hashlib

    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    inv_eps = 1.0 / float(epsilon)
    eps_floor = 2.220446049250313e-16

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, as_index=False).size()
        return arrow_out(
            pd.DataFrame(
                {key_col: g[key_col], "n": g["size"].astype("int64")}
            )
        )

    kw = {"n_parts": n_parts} if n_parts else {}
    counts = grouped_sum(
        ds.select_columns([key_col]).map_batches(
            partial, batch_format="pandas"
        ),
        [key_col],
        ["n"],
        **kw,
    )

    def noise(df: pd.DataFrame) -> pd.DataFrame:
        u = np.array(
            [
                (
                    int(
                        hashlib.md5(
                            f"{salt}|{k}".encode("utf-8")
                        ).hexdigest()[:12],
                        16,
                    )
                    + 1
                )
                / 281474976710657.0
                for k in df[key_col]
            ]
        )
        c = u - 0.5
        lap = -inv_eps * np.sign(c) * np.log(
            np.maximum(1.0 - 2.0 * np.abs(c), eps_floor)
        )
        n = df["n"].astype("int64").to_numpy()
        return arrow_out(
            pd.DataFrame(
                {
                    key_col: df[key_col].to_numpy(),
                    "n": n,
                    "noisy_n": np.round(n + lap, round_to) + 0.0,
                }
            )
        )

    return counts.map_batches(noise, batch_format="pandas")


def waterfill_cap(
    ds: "ray.data.Dataset",
    group_col: str,
    *,
    budget: int,
) -> pd.DataFrame:
    """Max-min fair-share cap (the water-filling allocation of classic
    congestion control, applied to per-source crawl/training budgets):
    find the integer level c such that Σ_h min(n_h, c) just reaches
    ``budget`` — small sources keep everything, large ones are cut to
    a COMMON ceiling instead of proportionally (the fairness property
    proportional caps lack).

    Exact integer solve: per-group counts from one bounded grouped
    shuffle; sort ascending, prefix sums, then the level where
    remaining budget / remaining groups lands between consecutive
    counts — plus the exact leftover (budget − Σ min(n_h, c), spread
    < #groups) reported instead of silently dropped.

    Output (eager, one row per group): (group_col, n:int64,
    cap:int64 = min(n, c), level:int64 — the common c, leftover:int64
    — identical on every row).
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def count_partial(df: pd.DataFrame):
        g = pd.DataFrame({group_col: df[group_col]})
        g["n"] = np.int64(1)
        return arrow_out(g.groupby(group_col, as_index=False)["n"].sum())

    counts = (
        grouped_sum(
            ds.select_columns([group_col]).map_batches(
                count_partial, batch_format="pandas"
            ),
            [group_col],
            ["n"],
        )
        .to_pandas()  # bounded: one row per group
        .sort_values([group_col])
        .reset_index(drop=True)
    )
    n = counts["n"].to_numpy(dtype=np.int64)
    total = int(n.sum())
    m = len(n)
    if total <= budget or m == 0:
        level = int(n.max()) if m else 0
        leftover = budget - total if m else budget
        caps = n
    else:
        order = np.argsort(n, kind="stable")
        ns = n[order]
        prefix = np.cumsum(ns)
        level = None
        for i in range(m):
            # groups 0..i-1 keep all; the rest capped at c
            below = int(prefix[i - 1]) if i > 0 else 0
            remaining = m - i
            c = (budget - below) // remaining
            if c < int(ns[i]):
                level = c
                break
        if level is None:
            level = int(ns[-1])
        caps = np.minimum(n, level)
        leftover = budget - int(caps.sum())
    return pd.DataFrame(
        {
            group_col: counts[group_col],
            "n": pd.Series(n, dtype="int64"),
            "cap": pd.Series(caps, dtype="int64"),
            "level": pd.Series(np.full(m, level), dtype="int64"),
            "leftover": pd.Series(np.full(m, leftover), dtype="int64"),
        }
    )
