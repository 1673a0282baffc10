"""Text analysis operators over a documents table (doc_id, text, lang, ...).

All per-row and embarrassingly parallel: one vectorized ``map_batches``
each, no shuffle.  The token/punct/fingerprint definitions are chosen to
be EXACTLY expressible in DuckDB SQL (same regex class semantics) so the
driver's oracle can verify them value-for-value:

* tokens     = non-overlapping matches of ``\\S+``
* punct      = ASCII punctuation ``[!-/:-@[-`{-~]`` (== RE2 [[:punct:]])
* fingerprint = md5(trim(collapse_ws(lower(text))))
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from pdf_parser_ray.io_utils import arrow_out

# re.ASCII keeps \s/\S aligned with RE2 (DuckDB) semantics — without it
# Python treats U+00A0 etc. as whitespace and the oracle comparison drifts.
TOKEN_PAT = re.compile(r"\S+", re.ASCII)
PUNCT_PAT = re.compile(r"[!-/:-@\[-`{-~]")
WS_ONE = re.compile(r"\s", re.ASCII)
_WS = re.compile(r"\s+", re.ASCII)

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language ID (public-knowledge approach; deterministic, no model files).
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for was with as his on be at by".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von auf für den".split()),
    "fr": frozenset("le la les et des est une dans que pour qui sur pas au du".split()),
    "es": frozenset("el la los las y es una en que por para con del se su".split()),
    "pt": frozenset("o a os as e de que do da em um uma para com não por".split()),
}


def token_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens, n_chars, n_punct, avg_token_len (vectorized)."""
    text = df["text"].fillna("")
    n_tokens = text.str.count(TOKEN_PAT).astype("int64")
    n_chars = text.str.len().astype("int64")
    n_punct = text.str.count(PUNCT_PAT).astype("int64")
    # total non-ws chars / tokens; 0-token docs → 0.0 (SQL-mirrored CASE).
    non_ws = (n_chars - text.str.count(WS_ONE)).astype("float64")
    avg = (non_ws / n_tokens.where(n_tokens > 0, 1)).where(n_tokens > 0, 0.0)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": n_tokens,
            "n_chars": n_chars,
            "n_punct": n_punct,
            "avg_token_len": avg,
        }
    )


# GPT-2-family pretokenizer shape, restricted to RE2-compatible
# constructs (no lookahead) and ASCII classes (re.ASCII keeps \s RE2-
# aligned): contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs, whitespace runs.  Both engines (Python re and
# DuckDB's RE2) use leftmost-first alternation, so the token streams —
# and therefore the counts — are identical.
BPE_PAT = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+", re.ASCII
)


def bpe_token_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_bpe_tokens: BPE-ish pretokenizer match count (the
    'token counting' tier beyond whitespace splitting).  Vectorized;
    SQL-oracled with the same pattern via regexp_extract_all."""
    text = df["text"].fillna("")
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_bpe_tokens": text.str.count(BPE_PAT).astype("int64"),
        }
    )


def quality_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Quality-score columns: ratios + a composite keep/drop flag.

    Heuristics in the C4/Gopher family (public rules): very short docs,
    punctuation-free docs, and symbol-heavy docs are low quality.
    """
    text = df["text"].fillna("")
    n_chars = text.str.len().astype("int64")
    n_tokens = text.str.count(TOKEN_PAT).astype("int64")
    n_punct = text.str.count(PUNCT_PAT).astype("int64")
    denom = n_chars.where(n_chars > 0, 1)
    punct_ratio = (n_punct / denom).astype("float64")
    digit_ratio = (text.str.count(r"[0-9]") / denom).astype("float64")
    upper_ratio = (text.str.count(r"[A-Z]") / denom).astype("float64")
    keep = (
        (n_tokens >= 5)
        & (n_chars >= 20)
        & (punct_ratio < 0.3)
        & (digit_ratio < 0.5)
    )
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": n_tokens,
            "punct_ratio": punct_ratio,
            "digit_ratio": digit_ratio,
            "upper_ratio": upper_ratio,
            "keep": keep.astype("bool"),
        }
    )


def layout_fingerprint(text: pd.Series) -> pd.Series:
    """md5-hex of whitespace/case-normalized text — THE fingerprint rule.

    Every fingerprint producer (fingerprint_batch, export_training_data,
    incremental_dedup, the ingest CLI bootstrap) must call this one
    helper: persisted fingerprint indexes are only compatible across
    commands if the normalization contract never forks.
    """
    # strip(" ") not strip(): DuckDB's trim removes spaces only.
    norm = (
        text.fillna("").str.lower().str.replace(_WS, " ", regex=True).str.strip(" ")
    )
    return norm.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    """doc_id, fingerprint = md5 of whitespace-normalized lowercase text."""
    return pd.DataFrame(
        {"doc_id": df["doc_id"], "fingerprint": layout_fingerprint(df["text"])}
    )


def word_counts(ds) -> "object":
    """Canonical distributed wordcount over the documents table.

    Per-batch partial counts (the combiner) shrink the shuffle to
    (token, n) partial rows — the groupby moves O(vocab × batches)
    rows, never one row per word occurrence.
    Output: (token:string, n:int64).
    """
    import ray.data
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame):
        toks = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT)
        vc = toks.explode().dropna().value_counts()
        # Arrow block out: pandas blocks aggregate ~11x slower in the
        # high-cardinality token shuffle (io_utils.arrow_out rationale).
        return arrow_out(pd.DataFrame(
            {"token": vc.index.astype(str), "n": vc.to_numpy().astype("int64")}
        ))

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )


def _profile_hits(text: "pd.Series", word_re, profiles) -> "object":
    """Vectorized per-doc stopword-hit matrix (rows × profiles):
    explode tokens once, then one isin + bincount per profile instead
    of a Python loop per document.  Shared by LangId and the
    confident-learning label-noise audit so scorer semantics can never
    drift between them."""
    import numpy as np

    text = text.fillna("").reset_index(drop=True)
    ex = text.str.lower().str.findall(word_re).explode().dropna()
    hits = np.zeros((len(text), len(profiles)), dtype=np.int64)
    if len(ex):
        pos = ex.index.to_numpy(dtype=np.int64)
        for j, (_lang, prof) in enumerate(profiles):
            m = ex.isin(prof).to_numpy()
            if m.any():
                hits[:, j] = np.bincount(pos[m], minlength=len(text))
    return hits


class LangId:
    """Actor-pool stage: stopword-profile language ID.

    Profiles are built once per actor in ``__init__`` (the A5
    compiled-state pattern); scoring is a vectorized token-set lookup.
    Deterministic tie-break: highest hit-ratio wins, ties by language
    code order; no hits → 'und'.
    """

    def __init__(self) -> None:
        self.word_re = re.compile(r"[a-zA-Zà-ÿÀ-ß]+")
        self.profiles = sorted(_LANG_PROFILES.items())  # deterministic order

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # argmax keeps the classify() tie-break exactly: first language
        # (alphabetical profile order) holding the max; max 0 → 'und'.
        hits = _profile_hits(df["text"], self.word_re, self.profiles)
        langs = np.array([lang for lang, _ in self.profiles])
        pred = np.where(hits.max(axis=1) > 0, langs[hits.argmax(axis=1)], "und")
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "lang_pred": pred}
        )


def token_postings(ds) -> "object":
    """Inverted-index statistics: per token, its document frequency and
    doc-id range — the distributed index-build shape.

    Per-batch: per-doc DISTINCT tokens (each document lives wholly in
    one row, so row-local dedup is exact — no cross-batch double count)
    → (token, doc_id) rows → ONE ``groupby(token)`` shuffle whose row
    count = Σ per-doc vocab, far below total occurrences.  Tokenizer
    matches :func:`word_counts` (lowered ``\\S+``).

    Output: (token:string, doc_freq:int64, min_doc:int64, max_doc:int64).
    """
    import numpy as np
    from ray.data.aggregate import Count, Max, Min

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT)
        tokens: list = []
        ids: list = []
        for doc_id, toks in zip(df["doc_id"], toks_per_doc):
            uniq = set(toks)
            tokens.extend(uniq)
            ids.extend([doc_id] * len(uniq))
        return arrow_out(pd.DataFrame(
            {"token": pd.Series(tokens, dtype="object"),
             "doc_id": np.asarray(ids, dtype=np.int64)}
        ))

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("token")
        .aggregate(
            Count(alias_name="doc_freq"),
            Min("doc_id", alias_name="min_doc"),
            Max("doc_id", alias_name="max_doc"),
        )
    )


def doc_familiarity(
    ds, *, broadcast_limit: int = 5_000_000, mode: str = "broadcast"
) -> "object":
    """Corpus-frequency familiarity score per document — the two-pass
    LM-scoring shape (train pass → broadcast model → score pass) with
    integer-exact semantics so a SQL engine reproduces it bit-for-bit.

    Pass 1 reuses :func:`word_counts` (partial-count combiner, one
    small shuffle) to build the global token→count model; the model is
    bounded by VOCABULARY size, not corpus size (``broadcast_limit``
    guards the pathological case — beyond it, swap the broadcast for a
    hash join on token).  Pass 2 re-reads the documents and scores each
    row locally: familiarity = Σ global count over the doc's token
    occurrences.  Documents with zero tokens emit no row (inner-join
    semantics).

    ``mode="join"`` is the vocabulary-outgrows-broadcast path: explode
    (doc_id, token) occurrence rows, hash-join the counts in, aggregate
    per doc.  Identical output (parity-tested); heavier — the exploded
    occurrence stream shuffles once more.

    Output: (doc_id, n_tokens:int64, familiarity:int64).
    """
    import numpy as np
    import ray as _ray

    from pdf_parser_ray.stages import worker_state

    if mode == "join":
        from ray.data.aggregate import Count, Sum

        from pdf_parser_ray.ops.relational import hash_join

        def explode(df: pd.DataFrame) -> pd.DataFrame:
            ids: list = []
            toks: list = []
            per_doc = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT)
            for doc_id, t in zip(df["doc_id"], per_doc):
                ids.extend([doc_id] * len(t))
                toks.extend(t)
            return pd.DataFrame(
                {"doc_id": np.asarray(ids, dtype=np.int64),
                 "token": pd.Series(toks, dtype="object")}
            )

        exploded = ds.map_batches(explode, batch_format="pandas")
        joined = hash_join(exploded, word_counts(ds), ["token"], join_type="inner")
        return joined.groupby("doc_id").aggregate(
            Count(alias_name="n_tokens"), Sum("n", alias_name="familiarity")
        )

    counts_df = word_counts(ds).limit(broadcast_limit + 1).to_pandas()
    if len(counts_df) > broadcast_limit:
        raise ValueError(
            f"vocabulary exceeds broadcast_limit={broadcast_limit}; "
            "use a hash join on token for this corpus"
        )
    vocab_ref = _ray.put(dict(zip(counts_df["token"], counts_df["n"].astype(int))))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        vocab = worker_state(("familiarity_vocab", vocab_ref.hex()),
                             lambda: _ray.get(vocab_ref))
        ids, n_tokens, fam = [], [], []
        toks_per_doc = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT)
        for doc_id, toks in zip(df["doc_id"], toks_per_doc):
            if not toks:
                continue
            ids.append(doc_id)
            n_tokens.append(len(toks))
            fam.append(sum(vocab[t] for t in toks))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "n_tokens": np.asarray(n_tokens, dtype=np.int64),
                "familiarity": np.asarray(fam, dtype=np.int64),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def lang_id_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Task-mode LangId stage: the compiled word regex + sorted profiles
    are built once per worker process (worker_state), so the stage runs
    as an elastic task pool with no actor-pool ramp."""
    from pdf_parser_ray.stages import worker_state

    lid = worker_state("lang_id", LangId)
    return lid(df)


def rolling_fingerprint_batch(df: pd.DataFrame, window: int = 64) -> pd.DataFrame:
    """Rabin-Karp-style rolling document fingerprint (winnowing flavor).

    Emits the minimum 64-bit rolling hash over byte windows — a cheap
    content-defined fingerprint robust to small edits at the ends.
    SQL-oracled (queries.py builds the DuckDB twin from the same B and
    precomputed B^k mod 2^64 powers; valid for ASCII corpora where
    code points == UTF-8 bytes — true of the driver testdata).  Output
    dtype is pinned uint64 to match the oracle's ``::UBIGINT``.
    """
    import numpy as np

    B = np.uint64(1000003)
    # Modular inverse of B mod 2^64 (B is odd), via Newton iteration
    # (wraparound overflow is the point — suppress the warning).
    inv = np.uint64(1)
    with np.errstate(over="ignore"):
        for _ in range(6):
            inv = inv * (np.uint64(2) - B * inv)  # doubles correct bits/step

    def fp(s: str) -> int:
        data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        n = len(data)
        if n == 0:
            return 0
        w = min(window, n)
        # Fully vectorized rolling hash in wraparound uint64 arithmetic.
        # Window [s, e] (w bytes) hash = sum_{j=s..e} b_j B^{e-j}
        #   = B^e * (S_e - S_{s-1})  with  S_i = cumsum(b_j * invB^j)
        #   = B^{w-1} * B^s * (S_e - S_{s-1}).
        with np.errstate(over="ignore"):
            inv_pows = np.empty(n, dtype=np.uint64)
            inv_pows[0] = 1
            if n > 1:
                np.cumprod(np.full(n - 1, inv, dtype=np.uint64), out=inv_pows[1:])
            pows = np.empty(n, dtype=np.uint64)
            pows[0] = 1
            if n > 1:
                np.cumprod(np.full(n - 1, B, dtype=np.uint64), out=pows[1:])
            S = np.cumsum(data * inv_pows, dtype=np.uint64)
            ends = np.arange(w - 1, n)
            starts = ends - w + 1
            diffs = S[ends] - np.where(starts > 0, S[starts - 1], np.uint64(0))
            window_hashes = diffs * pows[w - 1] * pows[starts]
        return int(window_hashes.min())

    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "rolling_fp": df["text"].fillna("").map(fp).astype("uint64"),
        }
    )


def bigram_counts(ds, top_k: int | None = None) -> "object":
    """Corpus-wide word-bigram counts (the n-gram statistics step of a
    web-text LM pipeline, one n up from :func:`word_counts`).

    Per-batch partial counts combine bigram occurrences BEFORE the
    shuffle, so the groupby moves O(distinct-bigrams × batches) partial
    rows, never one row per occurrence; with ``top_k`` the final
    sort-limit runs on the (small) aggregated vocabulary only.
    Tokenization matches :func:`word_counts` (lowercase, ``\\S+`` with
    ASCII semantics) so the DuckDB oracle can reproduce it exactly.

    Output: (bigram:string, n:int64); with ``top_k``, ordered by
    (n DESC, bigram ASC) and limited.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT)
        # Vectorized adjacency: explode keeps the row index, so a
        # group-wise shift(-1) pairs each token with its in-doc successor
        # (the cross-doc boundary pair is NaN and drops out).
        s = toks.explode().dropna().astype(str)
        if s.empty:
            return arrow_out(pd.DataFrame({"bigram": pd.Series([], dtype=str),
                                           "n": pd.Series([], dtype="int64")}))
        nxt = s.groupby(level=0).shift(-1)
        vc = (s + " " + nxt).dropna().value_counts()
        return arrow_out(pd.DataFrame(
            {"bigram": vc.index.astype(str), "n": vc.to_numpy().astype("int64")}
        ))

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )
    if top_k is not None:
        counts = counts.sort(["n", "bigram"], descending=[True, False]).limit(top_k)
    return counts


def lm_score(
    ds,
    *,
    round_to: int = 6,
    broadcast_limit: int = 5_000_000,
    mode: str = "broadcast",
) -> "object":
    """Bigram-LM quality scoring — the CCNet-style "perplexity against a
    language model" gate, with the model trained ON the corpus so the
    whole operator is self-contained and SQL-reproducible.

    Model: add-one-smoothed bigram LM over lowercased ``\\S+`` tokens,
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), where c(w1 ·) counts
    bigrams STARTING with w1 and V = corpus-wide distinct-token count.
    Per document: avg_logp = mean ln P over its bigrams, ppl =
    exp(-avg_logp).  Both are cross-row float aggregates → rounded to
    ``round_to`` on both engine sides (summation order differs).

    Scale shape: ONE model pass over the corpus — each batch emits a
    TAGGED UNION of partial counts (kind='b' bigram rows AND kind='u'
    unigram rows from the same tokenization), so a single
    ``groupby(kind, key)`` shuffle builds both the bigram model and the
    vocabulary (V = number of kind='u' keys); context counts derive
    from the collected bigram rows driver-side.  The shuffle is bounded
    by BIGRAM VOCABULARY, not corpus size; ``broadcast_limit`` guards
    pathological vocabularies.  The scoring pass is row-local.

    ``mode="join"`` is the vocabulary-outgrows-broadcast path: no
    driver-side model at all.  Per-doc bigram counts explode to
    (doc_id, key, cnt) rows; TWO hash joins pull in the bigram count
    and the context (w1·) count; V rides along as one scalar; per-doc
    partial logprob sums collapse in one groupby(doc_id).  Every stage
    is bounded by vocab or per-doc-bigram rows — nothing driver-sized.
    Both modes emit identical rows after rounding (parity-tested).

    Output: (doc_id, n_bigrams:int64, avg_logp:float64, ppl:float64);
    docs with < 2 tokens emit nothing (no bigrams — inner semantics).
    """
    import numpy as np
    import ray as _ray
    from ray.data.aggregate import Sum

    from pdf_parser_ray.stages import worker_state

    def tagged_partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT)
        s = toks.explode().dropna().astype(str)
        if s.empty:
            return arrow_out(pd.DataFrame(
                {"kind": pd.Series([], dtype=str),
                 "key": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64")}
            ))
        uni = s.value_counts()
        nxt = s.groupby(level=0).shift(-1)
        big = (s + " " + nxt).dropna().value_counts()
        return arrow_out(pd.DataFrame(
            {
                "kind": ["u"] * len(uni) + ["b"] * len(big),
                "key": list(uni.index) + list(big.index),
                "n": np.concatenate(
                    [uni.to_numpy(), big.to_numpy()]
                ).astype("int64"),
            }
        ))

    model = (
        ds.map_batches(tagged_partials, batch_format="pandas")
        .groupby(["kind", "key"])
        .aggregate(Sum("n", alias_name="n"))
    )
    if mode == "join":
        return _lm_score_join(ds, model, round_to=round_to)
    if mode != "broadcast":
        raise ValueError(f"mode must be broadcast|join, got {mode!r}")
    model_rows = model.take_all()
    if len(model_rows) > broadcast_limit:
        raise ValueError(
            f"model vocabulary {len(model_rows)} exceeds broadcast_limit; "
            "use mode='join' for this corpus"
        )
    bg: dict[str, int] = {}
    vocab_size = 0.0
    for r in model_rows:
        if r["kind"] == "b":
            bg[r["key"]] = r["n"]
        else:
            vocab_size += 1.0
    ctx: dict[str, int] = {}
    for bigram, n in bg.items():
        w1 = bigram.split(" ", 1)[0]
        ctx[w1] = ctx.get(w1, 0) + n
    model_ref = _ray.put((bg, ctx, vocab_size))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bg_m, ctx_m, v = worker_state(
            ("lm_model", model_ref.hex()), lambda: _ray.get(model_ref)
        )
        # Vectorized across the batch: one token explode, one in-doc
        # shift for bigram adjacency, two dict maps (C-speed Series.map)
        # for the model lookups, one grouped sum — no Python loop over
        # documents or bigrams.
        df = df.reset_index(drop=True)
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_bigrams": pd.Series([], dtype="int64"),
                "avg_logp": pd.Series([], dtype="float64"),
                "ppl": pd.Series([], dtype="float64"),
            }
        )
        s = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT).explode().dropna()
        if s.empty:
            return empty
        s = s.astype(str)
        nxt = s.groupby(level=0).shift(-1)
        has_next = nxt.notna()
        if not has_next.any():
            return empty
        w1 = s[has_next]
        bigram = w1 + " " + nxt[has_next]
        p = (bigram.map(bg_m).to_numpy(dtype=np.float64) + 1.0) / (
            w1.map(ctx_m).to_numpy(dtype=np.float64) + v
        )
        agg = (
            pd.DataFrame({"row": bigram.index.to_numpy(), "lnp": np.log(p)})
            .groupby("row")["lnp"]
            .agg(["sum", "count"])
        )
        avg = (agg["sum"] / agg["count"]).to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "doc_id": df.loc[agg.index, "doc_id"].to_numpy(dtype=np.int64),
                "n_bigrams": agg["count"].to_numpy(dtype=np.int64),
                "avg_logp": np.round(avg, round_to),
                "ppl": np.round(np.exp(-avg), round_to),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def _lm_score_join(ds, model, *, round_to: int) -> "object":
    """Join-mode LM scoring (see :func:`lm_score` ``mode="join"``).

    model: the aggregated (kind, key, n) dataset.  V (distinct-token
    count) is the one driver-side scalar — a tiny count aggregate.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.ops.relational import hash_join

    # The model subtree feeds THREE consumers (bigram join, context
    # join, V count); without this the lazy plan re-runs the whole
    # corpus model pass per consumer.  Safe to pin: the model is
    # vocab-bounded, never corpus-sized.
    model = model.materialize()

    # bigram rows and their w1-context sums, both vocab-bounded
    def bigrams_only(df: pd.DataFrame):
        b = df[df["kind"] == "b"]
        return arrow_out(pd.DataFrame({"key": b["key"], "nb": b["n"]}))

    bmodel = model.map_batches(bigrams_only, batch_format="pandas")

    def ctx_partial(df: pd.DataFrame):
        w1 = df["key"].str.split(" ", n=1).str[0]
        g = df.assign(w1=w1).groupby("w1", as_index=False)["nb"].sum()
        return arrow_out(g.rename(columns={"nb": "nc"}))

    ctx = (
        bmodel.map_batches(ctx_partial, batch_format="pandas")
        .groupby("w1")
        .aggregate(Sum("nc", alias_name="nc"))
    )

    def vocab_partial(df: pd.DataFrame):
        return arrow_out(pd.DataFrame({"v": [int((df["kind"] == "u").sum())]}))

    v_rows = model.map_batches(vocab_partial, batch_format="pandas").take_all()
    v = float(sum(r["v"] for r in v_rows))

    # per-doc bigram occurrence counts (the row-local combiner)
    def doc_bigrams(df: pd.DataFrame):
        toks = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT)
        s = toks.explode().dropna().astype(str)
        empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "key": pd.Series([], dtype=str),
             "cnt": pd.Series([], dtype="int64")}
        )
        if s.empty:
            return arrow_out(empty)
        nxt = s.groupby(level=0).shift(-1)
        big = (s + " " + nxt).dropna()
        if big.empty:
            return arrow_out(empty)
        ids = df["doc_id"].reset_index(drop=True)
        pos = pd.Series(np.arange(len(df)), index=df.index)
        out = (
            pd.DataFrame({"doc_id": ids[pos[big.index].to_numpy()].to_numpy(),
                          "key": big.to_numpy()})
            .groupby(["doc_id", "key"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        return arrow_out(out.astype({"doc_id": "int64", "cnt": "int64"}))

    exploded = ds.map_batches(doc_bigrams, batch_format="pandas")
    # join 1: bigram count; join 2: context count keyed on w1.  Inner
    # joins are exact here: the model was trained on this corpus, so
    # every scored bigram (and its w1) exists in the model.
    j1 = hash_join(exploded, bmodel, ["key"])

    def add_w1(df: pd.DataFrame):
        return arrow_out(df.assign(w1=df["key"].str.split(" ", n=1).str[0]))

    j2 = hash_join(j1.map_batches(add_w1, batch_format="pandas"), ctx, ["w1"])

    def logp_partial(df: pd.DataFrame):
        p = (df["nb"].to_numpy(np.float64) + 1.0) / (
            df["nc"].to_numpy(np.float64) + v
        )
        part = pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(),
             "s_lnp": np.log(p) * df["cnt"].to_numpy(np.float64),
             "n_bigrams": df["cnt"].to_numpy(np.int64)}
        ).groupby("doc_id", as_index=False).sum()
        return arrow_out(part.astype({"doc_id": "int64", "n_bigrams": "int64"}))

    agg = (
        j2.map_batches(logp_partial, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Sum("s_lnp", alias_name="s_lnp"),
                   Sum("n_bigrams", alias_name="n_bigrams"))
    )

    def finalize(df: pd.DataFrame):
        avg = df["s_lnp"].to_numpy(np.float64) / df["n_bigrams"].to_numpy(np.float64)
        return arrow_out(pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "n_bigrams": df["n_bigrams"].astype("int64"),
             "avg_logp": np.round(avg, round_to),
             "ppl": np.round(np.exp(-avg), round_to)}
        ))

    return agg.map_batches(finalize, batch_format="pandas")


# Sentence boundary = a RUN of ASCII sentence-final punctuation, so an
# ellipsis or "?!" counts once; identical to the RE2 twin
# regexp_extract_all(text, '[.!?]+') (re.ASCII keeps semantics aligned).
SENT_PAT = re.compile(r"[.!?]+", re.ASCII)


def sentence_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-document sentence statistics: sentence count and mean words
    per sentence — the length-shape signal quality classifiers (Gopher
    repetition rules, C4 line filters) gate on.

    Row-local and fully vectorized; words_per_sentence divides the two
    int64 counts each engine computes identically → bit-identical
    float64, no rounding needed (0-sentence docs → 0.0).

    Output: (doc_id, n_sentences:int64, words_per_sentence:float64).
    """
    text = df["text"].fillna("")
    n_sent = text.str.count(SENT_PAT).astype("int64")
    n_tokens = text.str.count(TOKEN_PAT).astype("int64")
    wps = (
        n_tokens.astype("float64") / n_sent.where(n_sent > 0, 1)
    ).where(n_sent > 0, 0.0)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_sentences": n_sent,
            "words_per_sentence": wps,
        }
    )


# Script profiling uses EXPLICIT codepoint ranges (not \p{Script}) so
# the Python re kernel and the DuckDB/RE2 oracle compile the identical
# character classes; each count is a row-local vectorized str.count.
SCRIPT_RANGES = (
    ("n_latin", "[A-Za-zÀ-ɏ]"),
    ("n_cyrillic", "[Ѐ-ӿ]"),
    ("n_greek", "[Ͱ-Ͽ]"),
    ("n_cjk", "[一-鿿぀-ヿ가-힯]"),
    ("n_arabic", "[؀-ۿ]"),
)


def script_profile_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Per-document writing-script character counts plus the majority
    script — the mixed-script signal webtext curation uses to flag
    keyword-stuffed spam and mislabeled languages (a doc tagged ``en``
    that is 40% Cyrillic is noise or an attack, not English).

    majority_script is the first range in SCRIPT_RANGES order with the
    maximum count ('none' when all counts are zero) — a deterministic
    tie-break both engines can express.

    Output: (doc_id, n_latin, n_cyrillic, n_greek, n_cjk, n_arabic,
    majority_script:string).
    """
    import numpy as np

    text = df["text"].fillna("")
    out = {"doc_id": df["doc_id"]}
    counts = []
    for name, rng in SCRIPT_RANGES:
        c = text.str.count(rng).astype("int64")
        out[name] = c
        counts.append(c.to_numpy())
    mat = np.stack(counts, axis=1)
    best = mat.argmax(axis=1)  # first max wins = SCRIPT_RANGES order
    names = np.array([n for n, _ in SCRIPT_RANGES], dtype=object)
    maj = np.where(mat.max(axis=1) > 0, names[best], "none")
    out["majority_script"] = maj
    return pd.DataFrame(out)

def pmi_bigrams(
    ds, min_count: int = 5, k: int = 50, broadcast_limit: int = 5_000_000
):
    """Collocation mining: top-k bigrams by pointwise mutual
    information, the phrase-detection step of a web-text pipeline.

    Shape: the corpus feeds the existing combiners (:func:`word_counts`,
    :func:`bigram_counts`); scalar totals come from one cheap no-shuffle
    pass.  Attaching unigram counts to the min-count-pruned candidates
    is size-routed (the lm_score rule): a vocabulary within
    ``broadcast_limit`` rows broadcasts as a lookup map — zero join
    shuffles; a web-scale vocabulary that outgrows it flows through two
    hash joins instead, nothing ever driver-sized.

    Exactness: PMI ordering == ratio ordering (log is monotone), so the
    score is the raw probability ratio (cb·N²)/(NB·c1·c2) — every
    operand an exact int64 count widened to float64, the same
    expression tree the SQL twin computes — rounded to 6dp before the
    (ratio DESC, w1, w2) tie-broken sort.  No transcendental functions
    cross engine boundaries.

    Output: (w1, w2, cb:int64, pmi_ratio:float64), k rows.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.ops.relational import hash_join

    # The two scalar totals come from ONE cheap corpus pass (per-batch
    # int sums, no groupby) — aggregating them off the materialized
    # rollups would add two more passes over vocabulary-sized shuffles
    # (measured: 14.5 s → ~9 s at sf0.1/32cpu for the whole query).
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].fillna("").str.lower().str.count(TOKEN_PAT)
        n = n.to_numpy(dtype="int64")
        return arrow_out(pd.DataFrame({
            "n_tok": [int(n.sum())],
            "n_bg": [int(np.maximum(n - 1, 0).sum())]}))

    totals = ds.map_batches(count_partial, batch_format="pandas").aggregate(
        Sum("n_tok", alias_name="n_tok"), Sum("n_bg", alias_name="n_bg")
    )
    n_tok = float(totals["n_tok"])
    n_bg = float(totals["n_bg"])

    # wc is consumed twice on the join route (c1, c2) → materialize
    # once at vocab cardinality; the bigram rollup has a single
    # consumer either way and stays streaming.
    wc = word_counts(ds).materialize()
    bg = bigram_counts(ds)
    vocab_rows = wc.count()

    def split_bigram(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["n"].to_numpy() >= min_count]
        if len(m) == 0:
            return arrow_out(pd.DataFrame({
                "w1": pd.Series([], dtype=str), "w2": pd.Series([], dtype=str),
                "cb": pd.Series([], dtype="int64")}))
        parts = m["bigram"].str.split(" ", n=1, expand=True)
        return arrow_out(pd.DataFrame({
            "w1": parts[0], "w2": parts[1],
            "cb": m["n"].to_numpy(dtype="int64")}))

    cand = bg.map_batches(split_bigram, batch_format="pandas")

    def score_frame(df: pd.DataFrame, c1: "np.ndarray", c2) -> pd.DataFrame:
        cb = df["cb"].to_numpy(dtype=np.float64)
        num = cb * n_tok
        num = num * n_tok
        den = n_bg * np.asarray(c1, dtype=np.float64)
        den = den * np.asarray(c2, dtype=np.float64)
        return pd.DataFrame({
            "w1": df["w1"], "w2": df["w2"],
            "cb": df["cb"].astype("int64"),
            "pmi_ratio": np.round(num / den, 6)})

    if vocab_rows <= broadcast_limit:
        # broadcast route: one (token → count) map, zero join shuffles
        import ray as _ray

        from pdf_parser_ray.stages import worker_state

        wdf = wc.to_pandas()
        counts_ref = _ray.put(
            dict(zip(wdf["token"], wdf["n"].to_numpy(dtype="int64")))
        )

        def attach_and_score(df: pd.DataFrame) -> pd.DataFrame:
            cm: dict = worker_state(
                ("pmi_counts", counts_ref.hex()), lambda: _ray.get(counts_ref)
            )
            return score_frame(df, df["w1"].map(cm), df["w2"].map(cm))

        scored = cand.map_batches(attach_and_score, batch_format="pandas")
    else:
        def rename(to: str, cnt: str):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                return arrow_out(pd.DataFrame({
                    to: df["token"], cnt: df["n"].to_numpy(dtype="int64")}))
            return fn

        c1 = wc.map_batches(rename("w1", "c1"), batch_format="pandas")
        c2 = wc.map_batches(rename("w2", "c2"), batch_format="pandas")
        j = hash_join(hash_join(cand, c1, on=("w1",)), c2, on=("w2",))
        scored = j.map_batches(
            lambda df: score_frame(df, df["c1"], df["c2"]),
            batch_format="pandas",
        )

    return (
        scored
        .sort(["pmi_ratio", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def distinctive_terms(
    ds,
    group_col: str = "source",
    *,
    k: int = 5,
    round_to: int = 6,
    text_col: str = "text",
):
    """Distinctive vocabulary per group — for each group, the terms
    most over-represented relative to the REST of the corpus (the
    Monroe et al. "fightin' words" analysis, smoothed-ratio form).

    score = (c_gt / n_g) / ((c_t − c_gt + 1) / (N − n_g + 1)) — in-group
    rate over smoothed out-of-group rate.  Ratio ordering ==
    log-odds ordering, so no transcendental crosses engines (the PMI
    rule); every operand is an exact int64 count and the SQL twin
    computes the identical expression tree, rounded before the
    (score DESC, token ASC) top-k tie-break.

    Shape (r5 rewrite): ONE token-hash exchange total.  Per-batch
    (group, token) partial counts materialize once (combiner output —
    vocabulary × batches, not corpus); group totals reduce from them
    on the driver (group-cardinality, capped probe) and broadcast;
    then a single ``partitioned_map`` on token makes EVERYTHING else
    partition-local — the (group, token) merge, the token totals
    (every row of a token is in the partition), the scoring, and the
    per-group prune to k.  The bounded prune stream (≤ k × groups ×
    partitions rows) finishes on the driver.  The previous staging
    (sort-aggregate gt + tt + ng, a token hash join, a final group
    sort) paid FIVE barrier operators for the same answer — measured
    15.0 s vs ~4 s at sf0.1/32 on the same box.

    Output: (group_col, token, score:float64), ≤ k rows per group.
    """
    import numpy as np
    import ray as _ray
    import ray.data as _rd

    from pdf_parser_ray.ops.shuffle import partitioned_map
    from pdf_parser_ray.stages import worker_state

    pool_limit = 5_000_000

    def partial(df: pd.DataFrame):
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        long = pd.DataFrame(
            {group_col: df[group_col], "token": toks}
        ).explode("token").dropna(subset=["token"])
        if long.empty:
            return arrow_out(pd.DataFrame({
                group_col: pd.Series([], dtype=str),
                "token": pd.Series([], dtype=str),
                "c": pd.Series([], dtype="int64")}))
        g = long.groupby([group_col, "token"], as_index=False).size()
        return arrow_out(g.rename(columns={"size": "c"}).astype({"c": "int64"}))

    partials = ds.map_batches(partial, batch_format="pandas").materialize()

    # group totals: group-cardinality × batches rows — capped driver
    # reduce (the pool-cap rule), broadcast into the scoring closure
    gpool = (
        partials.map_batches(
            lambda df: arrow_out(
                df.groupby(group_col, as_index=False)["c"].sum()
            ),
            batch_format="pandas",
        )
        .limit(pool_limit + 1)
        .to_pandas()
    )
    if len(gpool) > pool_limit:
        raise ValueError(
            f"distinctive_terms group-total pool exceeds {pool_limit}; "
            "group cardinality is no longer tiny — restore a distributed "
            "grouped_sum for n_g"
        )
    ng = gpool.groupby(group_col, as_index=False)["c"].sum()
    n_total = int(ng["c"].sum())
    ng_map = dict(zip(ng[group_col], ng["c"].astype("int64")))
    ngm_ref = _ray.put((ng_map, n_total))

    def per_part(part: pd.DataFrame) -> pd.DataFrame:
        # partitioned by token ⇒ every row of a token is here: the
        # (group, token) merge, the token totals AND the score are all
        # partition-local.
        ngm, n = worker_state(
            ("dt_ng", ngm_ref.hex()), lambda: _ray.get(ngm_ref)
        )
        gt = part.groupby([group_col, "token"], as_index=False)["c"].sum()
        ct = gt.groupby("token")["c"].transform("sum")
        n_g = gt[group_col].map(ngm).to_numpy(dtype=np.float64)
        c = gt["c"].to_numpy(dtype=np.float64)
        a = c / n_g
        b = (ct.to_numpy(dtype=np.float64) - c + 1.0) / (
            float(n) - n_g + 1.0
        )
        out = pd.DataFrame({
            group_col: gt[group_col], "token": gt["token"],
            "score": np.round(a / b, round_to)})
        # per-partition prune to k best per group — only these can win
        return (
            out.sort_values(["score", "token"], ascending=[False, True])
            .groupby(group_col, as_index=False, sort=False)
            .head(k)
        )

    pruned = partitioned_map(partials, ["token"], per_part)
    pool = pruned.limit(pool_limit + 1).to_pandas()  # ≤ k·groups·parts
    if len(pool) > pool_limit:
        raise ValueError(
            f"distinctive_terms prune pool exceeds {pool_limit}; raise "
            "the cap or finish with a distributed per-group pass"
        )
    final = (
        pool.sort_values(
            [group_col, "score", "token"], ascending=[True, False, True]
        )
        .groupby(group_col, as_index=False, sort=False)
        .head(k)
        .reset_index(drop=True)
    )
    return _rd.from_pandas(final)


def bm25_topk(
    ds,
    query_terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Okapi BM25 ranked retrieval: top-``k`` documents for a bag of
    query terms — the search-index twin of :func:`tfidf_top_terms`.

    Scale shape (the part that matters at 100 TB):

    * **Pass 1 is query-bounded, not vocabulary-bounded.** A plain
      map_batches partial emits ONE tiny row per batch — (n_docs,
      sum_dl, df per query term) — reduced on the driver.  No shuffle;
      state is O(|query|), independent of corpus vocabulary.
    * **Pass 2 is row-local scoring + partial top-k.** Each batch keeps
      only its local best ``k`` rows, so the final ``sort().limit(k)``
      sees ≤ k × n_batches rows, never the corpus.

    Determinism contract (mirrors the knn_cosine lesson): per-term
    contributions are accumulated in SORTED-TERM order and the summed
    score is rounded to ``round_to`` BEFORE the (score DESC, id ASC)
    top-k, so a SQL twin ordering by the rounded alias selects the same
    rows.  idf uses the Lucene/ATIRE form ln((N - df + 0.5)/(df + 0.5)
    + 1) which is non-negative for any df ≤ N.

    Output (pandas, ≤ k rows): (id_col, score:float64), docs containing
    no query term never appear.
    """
    import numpy as np

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")

    # ---- pass 1: corpus stats, one tiny row per batch -----------------
    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        row = {
            "n_docs": np.int64(len(df)),
            "sum_dl": np.int64(toks.map(len).sum()),
        }
        for i, t in enumerate(terms):
            row[f"df_{i}"] = np.int64(sum(t in s for s in toks.map(set)))
        return pd.DataFrame([row])

    parts = ds.map_batches(stats_partial, batch_format="pandas").to_pandas()
    n = float(parts["n_docs"].sum())
    if n == 0:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )
    avgdl = float(parts["sum_dl"].sum()) / n
    idf = {
        t: float(np.log((n - float(parts[f"df_{i}"].sum()) + 0.5)
                        / (float(parts[f"df_{i}"].sum()) + 0.5) + 1.0))
        for i, t in enumerate(terms)
    }

    # ---- pass 2: row-local scoring, partial top-k per batch -----------
    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        dl = toks.map(len).to_numpy(dtype=np.float64)
        total = np.zeros(len(df), dtype=np.float64)
        denom_norm = k1 * (1.0 - b + b * dl / avgdl)
        for t in terms:  # sorted order == the SQL twin's summation order
            tf = toks.map(lambda s, t=t: s.count(t)).to_numpy(dtype=np.float64)
            total += idf[t] * tf * (k1 + 1.0) / (tf + denom_norm)
        out = pd.DataFrame(
            {id_col: df[id_col].to_numpy(dtype=np.int64),
             "score": np.round(total, round_to)}
        )
        out = out[out["score"] > 0.0]
        return out.sort_values(
            ["score", id_col], ascending=[False, True]
        ).head(k)

    scored = ds.map_batches(score, batch_format="pandas")
    top = scored.sort(["score", id_col], descending=[True, False]).limit(k)
    out = top.to_pandas()
    out[id_col] = out[id_col].astype("int64")
    out["score"] = out["score"].astype("float64")
    return out[[id_col, "score"]]


def oov_rate(
    ds: "object", *, vocab_size: int = 1000, n_parts: int | None = None
) -> "object":
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` token vocabulary — the coverage check run before
    fixing a tokenizer/vocab for training.

    Two streaming passes: (1) the :func:`word_counts` combiner rollup
    → one bounded sort-limit picks the vocabulary (ties broken by
    token ASC, so the cut is deterministic cross-engine), broadcast
    once; (2) per-doc token membership, vectorized explode + isin.
    The rate is an exact int/int ratio — identical doubles on both
    engines, no rounding contract.  At vocabularies beyond broadcast
    size, swap pass 1 for ``ops.sketches.top_k_frequent`` (bounded
    Misra-Gries) — same interface.

    Output: (doc_id, n_tokens:int64, n_oov:int64, oov_rate:float64).
    """
    import numpy as np
    import ray

    from pdf_parser_ray.stages import worker_state

    vocab = (
        word_counts(ds)
        .sort(["n", "token"], descending=[True, False])
        .limit(int(vocab_size))
        .to_pandas()["token"]
        .to_numpy()
    )
    vref = ray.put(np.sort(vocab))

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        v = worker_state(("oov_vocab", vref.hex()), lambda: ray.get(vref))
        toks = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT)
        n_tokens = toks.str.len().astype("int64")
        ex = toks.explode().dropna()
        if len(ex):
            pos = np.searchsorted(v, ex.to_numpy())
            pos = np.clip(pos, 0, len(v) - 1)
            oov = (v[pos] != ex.to_numpy()).astype("int64")
            n_oov = (
                pd.Series(oov, index=ex.index)
                .groupby(level=0)
                .sum()
                .reindex(df.index, fill_value=0)
                .astype("int64")
            )
        else:
            n_oov = pd.Series(0, index=df.index, dtype="int64")
        rate = np.where(
            n_tokens.to_numpy() > 0,
            n_oov.to_numpy() / np.maximum(n_tokens.to_numpy(), 1),
            0.0,
        )
        return arrow_out(
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "n_tokens": n_tokens,
                    "n_oov": n_oov,
                    "oov_rate": rate,
                }
            )
        )

    return ds.map_batches(per_doc, batch_format="pandas")


SEQ_LEN_EDGES = [1 << k for k in range(12)]  # 1,2,4,...,2048


def seq_len_histogram(ds: "object") -> "object":
    """Power-of-two histogram of per-document token counts — the
    sequence-length planning table a packing stage (pack_sequences) is
    sized from.  Bucket = largest edge ≤ n_tokens (0 for empty docs,
    top edge open-ended).

    Pure partial aggregation: per-batch bucket value_counts → one
    bounded (≤ len(edges)+1 keys) groupby.  Exact integer counts.

    Output: (bucket_lo:int64, n_docs:int64).
    """
    import numpy as np
    import ray.data
    from ray.data.aggregate import Sum

    edges = np.asarray(SEQ_LEN_EDGES, dtype=np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(TOKEN_PAT)
        n = toks.str.len().to_numpy(dtype=np.int64)
        idx = np.searchsorted(edges, n, side="right") - 1
        lo = np.where(idx < 0, 0, edges[np.maximum(idx, 0)])
        vc = pd.Series(lo).value_counts()
        return arrow_out(
            pd.DataFrame(
                {
                    "bucket_lo": vc.index.to_numpy(dtype=np.int64),
                    "n_docs": vc.to_numpy(dtype=np.int64),
                }
            )
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket_lo")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def source_kl(
    ds: "object",
    *,
    group_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 256,
    round_to: int = 6,
) -> pd.DataFrame:
    """Per-source KL divergence (bits) from the corpus token
    distribution — the domain-drift score: how far each source's
    hashed-unigram distribution sits from the corpus average (0 =
    indistinguishable; the sources worth inspecting or re-weighting
    rank first).

    ``KL(p_s ‖ p_c) = Σ_b p_s(b) · log2(p_s(b) / p_c(b))`` with
    add-one smoothing over ``n_buckets`` md5 buckets; the corpus
    distribution is the sum of the per-source counts, so ONE scan
    feeds both sides.  Per-batch (source, bucket) partials bound the
    reduce at |sources| × n_buckets rows regardless of corpus size;
    the KL arithmetic runs on that driver-sized table.  md5 buckets
    (``int(md5(tok)[:8],16) % n_buckets``) make the DuckDB twin
    register-exact; the cross-bucket float sum is rounded on BOTH
    engines.

    Returns (group_col, n_tokens:int64, kl_bits:float64), one row per
    source, kl_bits rounded.
    """
    import numpy as np

    piv = _hashed_token_matrix(ds, group_col, text_col, n_buckets)
    mat = piv.to_numpy(dtype=np.float64)
    n_s = mat.sum(axis=1)
    corpus = mat.sum(axis=0)
    big_n = corpus.sum()
    p_s = (mat + 1.0) / (n_s + n_buckets)[:, None]
    p_c = (corpus + 1.0) / (big_n + n_buckets)
    kl = np.round((p_s * np.log2(p_s / p_c[None, :])).sum(axis=1), round_to) + 0.0
    return pd.DataFrame(
        {
            group_col: piv.index.to_numpy(),
            "n_tokens": n_s.astype("int64"),
            "kl_bits": kl,
        }
    ).sort_values(group_col).reset_index(drop=True)


def source_jsd(
    ds: "object",
    *,
    group_col: str = "source",
    text_col: str = "text",
    n_buckets: int = 256,
    round_to: int = 6,
) -> pd.DataFrame:
    """Per-source Jensen–Shannon divergence (bits) from the corpus
    token distribution — the SYMMETRIC, bounded-[0,1] companion to
    :func:`source_kl` (KL explodes when a source has mass where the
    corpus has almost none; JSD saturates instead, so it ranks extreme
    outlier sources more stably).

    ``JSD(p_s ‖ p_c) = ½·Σ_b p_s·log2(p_s/m) + ½·Σ_b p_c·log2(p_c/m)``
    with ``m = (p_s + p_c)/2``, add-one smoothing over the same md5
    buckets (one scan, same bounded partials — see source_kl for the
    scale argument).  The per-bucket term tree is written identically
    in the DuckDB twin; the cross-bucket float sum is rounded on BOTH
    engines.

    Returns (group_col, n_tokens:int64, jsd_bits:float64), one row per
    source.
    """
    import numpy as np

    piv = _hashed_token_matrix(ds, group_col, text_col, n_buckets)
    mat = piv.to_numpy(dtype=np.float64)
    n_s = mat.sum(axis=1)
    corpus = mat.sum(axis=0)
    big_n = corpus.sum()
    p_s = (mat + 1.0) / (n_s + n_buckets)[:, None]
    p_c = ((corpus + 1.0) / (big_n + n_buckets))[None, :]
    m = (p_s + p_c) / 2.0
    jsd = np.round(
        (0.5 * p_s * np.log2(p_s / m) + 0.5 * p_c * np.log2(p_c / m)).sum(axis=1),
        round_to,
    ) + 0.0
    return pd.DataFrame(
        {
            group_col: piv.index.to_numpy(),
            "n_tokens": n_s.astype("int64"),
            "jsd_bits": jsd,
        }
    ).sort_values(group_col).reset_index(drop=True)


def vocab_growth(
    ds: "object",
    n_docs: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_steps: int = 10,
) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth curve: distinct-token vocabulary
    size and total token count after each 1/n_steps prefix of the
    corpus in ``id_col`` order — the tokenizer-sizing / corpus-novelty
    audit (a flattening curve means new data stops adding vocabulary).

    Shape: the global first-occurrence doc of every token is a min
    aggregation over a HIGH-cardinality key, so tokens co-locate via
    the hash-partition route (ops/shuffle.py rationale); each partition
    reduces its tokens to one n_steps-row histogram, so the driver
    merge is n_parts × n_steps rows no matter the vocabulary size.
    Per-batch pre-min partials keep the shuffle at (token, step, n)
    uniques per batch.  A doc with id x belongs to prefix step
    ``x·n_steps // n_docs`` — all-integer, so the DuckDB twin
    (min(doc_id) per token + the same floor-division bucket) is
    value-exact; cum_vocab/cum_tokens are exact int64 prefix sums.

    Returns n_steps rows: (step:int64 1-based, n_docs:int64 prefix
    size, cum_tokens:int64, cum_vocab:int64), step ascending.
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return arrow_out(
                pd.DataFrame(
                    {"token": pd.Series([], dtype="object"),
                     "step": pd.Series([], dtype="int64"),
                     "n_occ": pd.Series([], dtype="int64")}
                )
            )
        doc = df.loc[ex.index, id_col].to_numpy(dtype=np.int64)
        step = doc * n_steps // n_docs
        # the global first doc of a token is recoverable from its min
        # STEP (all of a token's rows co-locate), so the doc id itself
        # never rides the shuffle.
        g = (
            pd.DataFrame({"token": ex.to_numpy(), "step": step})
            .groupby(["token", "step"], as_index=False)
            .size()
            .rename(columns={"size": "n_occ"})
        )
        return arrow_out(g.astype({"step": "int64", "n_occ": "int64"}))

    def fold_partition(part: pd.DataFrame) -> pd.DataFrame:
        # all rows of a token are here: its global first step is the
        # min; occurrences sum per step independently of firsts.
        occ = np.zeros(n_steps, dtype=np.int64)
        occ_g = part.groupby("step")["n_occ"].sum()
        occ[occ_g.index.to_numpy(dtype=np.int64)] = occ_g.to_numpy()
        first_step = part.groupby("token")["step"].min()
        vocab = np.zeros(n_steps, dtype=np.int64)
        vc = first_step.value_counts()
        vocab[vc.index.to_numpy(dtype=np.int64)] = vc.to_numpy()
        return pd.DataFrame(
            {"step": np.arange(n_steps, dtype=np.int64),
             "new_vocab": vocab, "n_occ": occ}
        )

    hist = (
        partitioned_map(
            ds.select_columns([id_col, text_col]).map_batches(
                partial, batch_format="pandas"
            ),
            ["token"],
            fold_partition,
            n_parts=64,
        )
        .to_pandas()  # bounded: 64 partitions x n_steps rows
        .groupby("step", as_index=False)[["new_vocab", "n_occ"]]
        .sum()
        .sort_values("step")
    )
    return pd.DataFrame(
        {
            "step": (hist["step"] + 1).astype("int64").to_numpy(),
            "n_docs": np.minimum(
                (hist["step"].to_numpy(dtype=np.int64) + 1) * n_docs
                // n_steps
                + ((hist["step"].to_numpy(dtype=np.int64) + 1) * n_docs
                   % n_steps != 0).astype(np.int64),
                n_docs,
            ),
            "cum_tokens": hist["n_occ"].cumsum().astype("int64").to_numpy(),
            "cum_vocab": hist["new_vocab"].cumsum().astype("int64").to_numpy(),
        }
    ).reset_index(drop=True)


def _hashed_token_matrix(
    ds: "object", group_col: str, text_col: str, n_buckets: int
) -> pd.DataFrame:
    """Dense (group × md5-bucket) token-count matrix, collected on the
    driver — bounded at |groups| × n_buckets regardless of corpus size
    (per-batch (group, bucket) partials do the reduction)."""
    import hashlib

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        cache = worker_state(("srckl_md5", n_buckets), dict)
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return pd.DataFrame(
                {group_col: pd.Series([], dtype="object"),
                 "bucket": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        for t in ex.unique():
            if t not in cache:
                cache[t] = (
                    int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
                    % n_buckets
                )
        out = pd.DataFrame(
            {
                group_col: df.loc[ex.index, group_col].to_numpy(),
                "bucket": ex.map(cache).astype("int64").to_numpy(),
            }
        )
        g = out.groupby([group_col, "bucket"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    counts = (
        ds.select_columns([group_col, text_col])
        .map_batches(bucket_counts, batch_format="pandas")
        .to_pandas()  # bounded: |sources| x n_buckets x batches partials
        .groupby([group_col, "bucket"], as_index=False)["n"]
        .sum()
    )
    # dense (source x bucket) matrix on the driver — both axes bounded
    return counts.pivot_table(
        index=group_col, columns="bucket", values="n", fill_value=0,
        aggfunc="sum",
    ).reindex(columns=range(n_buckets), fill_value=0)


def bpe_pair_counts(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    k: int = 20,
) -> pd.DataFrame:
    """The first BPE merge decision: corpus-wide counts of adjacent
    character pairs inside whitespace tokens, top-k by (count DESC,
    pair ASC) — tokenizer induction's inner loop as a dataflow op.

    Fully vectorized per batch (the no-row-loop contract): all of a
    batch's words join into one '\\n'-separated string, the code-point
    array is viewed as uint32 via UTF-32, adjacent pairs pack into one
    uint64, separator-touching pairs mask out, and ``np.unique`` counts
    the rest — one C pass per batch, no per-word Python loop.  Partials
    are alphabet²-bounded, so the groupby is tiny and the top-k is a
    driver afterthought.

    Output (eager, k rows): (pair:str, cnt:int64).
    """
    import re as _re

    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out

    word_re = _re.compile(r"\S+")
    SEP = 10  # '\n' — whitespace, so it can never appear inside a token

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words: list[str] = []
        for t in df[text_col]:
            words.extend(word_re.findall((t or "").lower()))
        if not words:
            return arrow_out(
                pd.DataFrame(
                    {"p": pd.Series([], dtype="uint64"),
                     "cnt": pd.Series([], dtype="int64")}
                )
            )
        big = "\n".join(words)
        arr = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
        a, b = arr[:-1], arr[1:]
        m = (a != SEP) & (b != SEP)
        packed = (a[m].astype(np.uint64) << np.uint64(32)) | b[m].astype(
            np.uint64
        )
        u, c = np.unique(packed, return_counts=True)
        return arrow_out(pd.DataFrame({"p": u, "cnt": c.astype(np.int64)}))

    agg = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pandas")
        .groupby("p")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # alphabet²-bounded
    )
    agg["pair"] = [
        chr(int(p) >> 32) + chr(int(p) & 0xFFFFFFFF) for p in agg["p"]
    ]
    out = agg.sort_values(
        ["cnt", "pair"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pd.DataFrame(
        {"pair": out["pair"].to_numpy(), "cnt": out["cnt"].astype("int64").to_numpy()}
    )


def label_noise_audit(
    ds: "object",
    *,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
) -> "object":
    """Confident-learning label-noise audit (Northcutt's confident-
    joint count): for every (given label, suggested label) pair, how
    many docs the classifier is CONFIDENT belong to the suggested
    class — the off-diagonal is the estimated label-error map, the
    training-data triage every labeled corpus needs before a cleanup
    pass.

    Semantics: per-doc class scores are stopword-hit RATIOS
    ``p_j = hits_j / total_hits`` (exact int64 ratios — the same
    division both engines execute); the per-class confidence threshold
    ``t_j`` is the MEDIAN self-confidence of docs labeled j — a
    selected element (ceil(n/2) rank), not a mean, so no cross-engine
    float-sum-order contract exists anywhere in the pipeline.  A doc
    counts toward (given, j*) where j* is its highest-scoring class
    among those with ``p_j ≥ t_j`` (ties → alphabetical class, the
    argmax-first rule LangId pins); docs with no profile hits or no
    qualifying class are excluded, classes with no labeled docs get no
    threshold and are never suggested.

    Scale shape: ONE tokenize+score scan materializes a slim
    (id, label, 5×int) projection (the quantile-family pattern — the
    projection is ~2 % of corpus bytes and spills, the scan is the
    expensive part and runs once); thresholds come from the exact
    grouped-median selection (|classes| groups); the second pass is
    row-local against the ≤|classes| broadcast thresholds, reduced by
    per-batch (given, suggested) partials into a |classes|²-bounded
    groupby.

    Returns a Dataset: (given_lang, suggested_lang, n:int64).
    """
    import re as _re

    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.quantiles import grouped_quantile_disc

    classes = sorted(_LANG_PROFILES)
    profiles = sorted(_LANG_PROFILES.items())
    word_re = _re.compile(r"[a-zA-Zà-ÿÀ-ß]+")
    hit_cols = [f"h_{c}" for c in classes]

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        hits = _profile_hits(df[text_col], word_re, profiles)
        out = {id_col: df[id_col].to_numpy(),
               label_col: df[label_col].to_numpy()}
        for j, c in enumerate(classes):
            out[f"h_{c}"] = hits[:, j]
        out["total"] = hits.sum(axis=1)
        return arrow_out(pd.DataFrame(out))

    scores = (
        ds.select_columns([id_col, label_col, text_col])
        .map_batches(score_batch, batch_format="pandas")
        .materialize()
    )

    def self_conf(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["total"].to_numpy() > 0) & df[label_col].isin(classes)
        sub = df.loc[keep]
        if not len(sub):
            return pd.DataFrame(
                {"plang": pd.Series([], dtype="object"),
                 "p": pd.Series([], dtype="float64")}
            )
        h = np.stack(
            [sub[f"h_{c}"].to_numpy(dtype=np.int64) for c in classes], axis=1
        )
        idx = pd.Categorical(
            sub[label_col], categories=classes
        ).codes.astype(np.int64)
        own = h[np.arange(len(sub)), idx]
        return arrow_out(
            pd.DataFrame(
                {"plang": sub[label_col].to_numpy(),
                 "p": own / sub["total"].to_numpy(dtype=np.float64)}
            )
        )

    thr_df = grouped_quantile_disc(
        scores.map_batches(self_conf, batch_format="pandas"), "plang", "p",
        {"t": 0.5},
    )
    thr = dict(zip(thr_df["plang"], thr_df["t"]))
    t_vec = np.array(
        [thr.get(c, np.inf) for c in classes], dtype=np.float64
    )  # class without labeled docs -> unreachable threshold

    def suggest(df: pd.DataFrame) -> pd.DataFrame:
        tot = df["total"].to_numpy(dtype=np.float64)
        keep = tot > 0
        sub = df.loc[keep]
        if not len(sub):
            return pd.DataFrame(
                {"given_lang": pd.Series([], dtype="object"),
                 "suggested_lang": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}
            )
        h = np.stack(
            [sub[f"h_{c}"].to_numpy(dtype=np.int64) for c in classes], axis=1
        )
        p = h / tot[keep][:, None]
        qual = p >= t_vec[None, :]
        p_masked = np.where(qual, p, -1.0)
        best = p_masked.argmax(axis=1)  # first max = alphabetical tie
        has = p_masked.max(axis=1) >= 0.0
        g = (
            pd.DataFrame(
                {
                    "given_lang": sub[label_col].to_numpy()[has],
                    "suggested_lang": np.array(classes)[best[has]],
                }
            )
            .groupby(["given_lang", "suggested_lang"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return arrow_out(g.astype({"n": "int64"}))

    return (
        scores.map_batches(suggest, batch_format="pandas")
        .groupby(["given_lang", "suggested_lang"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["given_lang", "suggested_lang"])
    )


def nb_classify(
    ds: "ray.data.Dataset",
    *,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    round_to: int = 6,
) -> "ray.data.Dataset":
    """Multinomial Naive Bayes over hashed-unigram features — the
    classic learned quality/language gate a curation pipeline trains ON
    the corpus and then applies TO the corpus (McCallum & Nigam 1998;
    the hashing trick bounds the model at ``n_buckets`` weights per
    class, Weinberger et al. 2009).  Train and score are two streaming
    passes over the same table; no label file, no external model.

    Pass 1 reduces to a (classes × n_buckets) count matrix plus
    per-class doc counts — per-batch partials, bounded driver merge
    (the dsir_logweights plan; reference has no analog, cited pattern
    is replacer.py:119-214's whole-corpus inventory pre-pass made
    distributed).  The add-one-smoothed log-likelihood matrix and the
    ln-prior vector are broadcast once via ``ray.put``; pass 2 scores
    each document row-locally and picks ``argmax_c [prior_c +
    Σ_tokens w_c(bucket)]``.

    Cross-engine determinism: buckets are the md5-prefix trick
    (``int(md5(token)[:8],16) % n_buckets`` == DuckDB ``('0x' ||
    substr(md5(t),1,8))::BIGINT % n``); per-(class,bucket) weights are
    computed once from identical integer operands so both engines hold
    bit-identical weight tables; the per-doc score is a cross-row float
    sum → rounded to ``round_to`` on BOTH sides BEFORE the
    (score DESC, class ASC) argmax tie-break (the knn_cosine rule).

    Output: (id_col, pred:string, score:float64, correct:int64) — one
    row per document with ≥1 token.  ``correct`` compares against the
    document's own ``label_col`` (self-training readout: the confusion
    companion to lang_id_kappa).
    """
    import math

    import numpy as np
    import ray

    from pdf_parser_ray.stages import worker_state

    def _bucketize(tokens: pd.Series) -> pd.Series:
        cache = worker_state(("nb_md5", n_buckets), dict)
        for t in tokens.unique():
            if t not in cache:
                cache[t] = (
                    int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
                    % n_buckets
                )
        return tokens.map(cache)

    # ---- pass 1: (class, bucket) token counts + per-class doc counts.
    # bucket == -1 rows carry the doc counts so ONE scan feeds both.
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        ex = toks.explode().dropna()
        labels = df[label_col].astype(str)
        frames = [
            pd.DataFrame(
                {"c": labels, "bucket": np.int64(-1), "n": np.int64(1)}
            )
        ]
        if len(ex):
            pos = df.index.get_indexer(ex.index)
            frames.append(
                pd.DataFrame(
                    {
                        "c": labels.to_numpy()[pos],
                        "bucket": _bucketize(ex).astype("int64").to_numpy(),
                        "n": np.int64(1),
                    }
                )
            )
        g = (
            pd.concat(frames, ignore_index=True)
            .groupby(["c", "bucket"], as_index=False)["n"]
            .sum()
        )
        return g.astype({"bucket": "int64", "n": "int64"})

    counts = (
        ds.select_columns([label_col, text_col])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # bounded: ≤ blocks × classes × (n_buckets+1) rows
        .groupby(["c", "bucket"], as_index=False)["n"]
        .sum()
    )
    doc_n = (
        counts[counts["bucket"] == -1].set_index("c")["n"].astype("int64")
    )
    tok = counts[counts["bucket"] != -1]
    classes = sorted(doc_n.index)
    d_tot = int(doc_n.sum())
    n_cls = len(classes)
    weights = np.zeros((n_cls, n_buckets), dtype=np.float64)
    priors = np.zeros(n_cls, dtype=np.float64)
    by_class = {c: g for c, g in tok.groupby("c")}
    for i, c in enumerate(classes):
        priors[i] = math.log(int(doc_n[c]) / d_tot)
        g = by_class.get(c)
        n_c = int(g["n"].sum()) if g is not None else 0
        # identical operand tree to the SQL twin:
        # ln((n_cb + 1) / (n_c + n_buckets)) per bucket, zeros included
        row = np.full(n_buckets, math.log(1.0 / (n_c + n_buckets)))
        if g is not None:
            for b, n in zip(g["bucket"], g["n"]):
                row[int(b)] = math.log((int(n) + 1) / (n_c + n_buckets))
        weights[i] = row
    model_ref = ray.put((classes, priors, weights))

    # ---- pass 2: row-local scoring against the broadcast model.
    def score(df: pd.DataFrame) -> pd.DataFrame:
        cls, pri, w = worker_state(
            ("nb_model", model_ref.hex()), lambda: ray.get(model_ref)
        )
        empty = pd.DataFrame(
            {
                id_col: pd.Series([], dtype="int64"),
                "pred": pd.Series([], dtype="object"),
                "score": pd.Series([], dtype="float64"),
                "correct": pd.Series([], dtype="int64"),
            }
        )
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        ex = toks.explode().dropna()
        if not len(ex):
            return empty
        b = _bucketize(ex).astype("int64").to_numpy()
        pos = df.index.get_indexer(ex.index)
        per_tok = pd.DataFrame(w[:, b].T, columns=range(len(cls)))
        per_tok["__row"] = pos
        sums = per_tok.groupby("__row").sum()  # (docs × classes)
        scores = np.round(sums.to_numpy() + pri[None, :], round_to)
        best = np.argmax(scores, axis=1)  # ties → lowest index = class ASC
        rows = sums.index.to_numpy()
        pred = np.array(cls, dtype=object)[best]
        actual = df[label_col].astype(str).to_numpy()[rows]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy()[rows],
                "pred": pred,
                "score": scores[np.arange(len(best)), best] + 0.0,
                "correct": (pred == actual).astype("int64"),
            }
        )

    return ds.select_columns([id_col, label_col, text_col]).map_batches(
        score, batch_format="pandas"
    )


def vocab_coverage(
    ds: "ray.data.Dataset",
    *,
    pct: int = 95,
    text_col: str = "text",
    group_col: str = "lang",
) -> pd.DataFrame:
    """Tokenizer-design readout: per group, the smallest vocabulary
    size whose most-frequent tokens cover ≥ ``pct``% of all token
    occurrences — the curve every vocab-size decision (BPE/WordPiece
    budget) reads off.  Greedy-by-frequency is optimal for this
    objective, so the answer is exact.

    Scale plan: per-batch (group, token) partial counts → ONE
    grouped_sum co-location at vocab cardinality (the word_counts
    plan) → a second partial collapse to the (group, count)
    HISTOGRAM — bounded by distinct count VALUES, not vocab — →
    driver walk in count-descending order.  The threshold test and the
    within-class remainder use pure integer math (``cum·100 ≥
    pct·total`` and a ceiling division), so no float contract exists
    at all.  Inside one count-class every token contributes equally;
    the class is entered only as far as needed.

    Output (driver-sized, one row per group): (group_col,
    total_tokens:int64, distinct_tokens:int64, vocab_size:int64,
    covered_tokens:int64).
    """
    import numpy as np

    from pdf_parser_ray.ops.shuffle import grouped_sum

    def partial(df: pd.DataFrame):
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        ex = toks.explode().dropna()
        if not len(ex):
            return arrow_out(pd.DataFrame(
                {group_col: pd.Series([], dtype="object"),
                 "token": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}
            ))
        pos = df.index.get_indexer(ex.index)
        vc = (
            pd.DataFrame(
                {group_col: df[group_col].astype(str).to_numpy()[pos],
                 "token": ex.astype(str).to_numpy()}
            )
            .groupby([group_col, "token"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        vc["n"] = vc["n"].astype("int64")
        return arrow_out(vc)

    counts = grouped_sum(
        ds.select_columns([group_col, text_col]).map_batches(
            partial, batch_format="pandas"
        ),
        [group_col, "token"],
        ["n"],
    )

    def to_hist(df: pd.DataFrame):
        g = df.groupby([group_col, "n"], as_index=False).size()
        g = g.rename(columns={"n": "c", "size": "k"})
        return arrow_out(g.astype({"c": "int64", "k": "int64"}))

    hist = (
        counts.map_batches(to_hist, batch_format="pandas")
        .groupby([group_col, "c"])
        .aggregate(_hist_sum())
        .to_pandas()  # bounded: groups × distinct count values
    )
    rows = []
    for grp, g in hist.groupby(group_col):
        g = g.sort_values("c", ascending=False)
        c = g["c"].to_numpy(dtype=np.int64)
        k = g["k"].to_numpy(dtype=np.int64)
        total = int((c * k).sum())
        need = pct * total  # compare cum*100 >= pct*total in ints
        cum = 0
        size = 0
        covered = 0
        for ci, ki in zip(c, k):
            class_mass = int(ci) * int(ki)
            if (cum + class_mass) * 100 >= need:
                remaining = need - cum * 100
                # ceil(remaining / (100*ci)) tokens from this class
                take = -(-remaining // (100 * int(ci)))
                size += int(take)
                covered = cum + int(take) * int(ci)
                break
            cum += class_mass
            size += int(ki)
        else:
            covered = cum
        rows.append(
            {group_col: grp, "total_tokens": total,
             "distinct_tokens": int(k.sum()), "vocab_size": size,
             "covered_tokens": covered}
        )
    out = pd.DataFrame(rows).sort_values(group_col).reset_index(drop=True)
    return out.astype(
        {"total_tokens": "int64", "distinct_tokens": "int64",
         "vocab_size": "int64", "covered_tokens": "int64"}
    )


def _hist_sum():
    from ray.data.aggregate import Sum

    return Sum("k", alias_name="k")


def bpe_train(
    ds: "ray.data.Dataset",
    n_merges: int,
    *,
    text_col: str = "text",
    max_vocab: int | None = None,
) -> pd.DataFrame:
    """Train a BPE merge table over the corpus (Sennrich et al. 2016,
    the public learn-BPE recipe): ``n_merges`` rounds of "merge the
    most frequent adjacent symbol pair".

    The distributed part is ONE :func:`word_counts` pass — BPE training
    only ever needs the word-frequency histogram, so the corpus scan
    cost is independent of ``n_merges`` and the iteration runs on the
    vocabulary-bounded histogram (10^8 distinct tokens ≈ GBs at
    10^12-doc scale; ``max_vocab`` keeps the top-M tokens by (count
    DESC, token ASC) when the full tail must not land on the driver —
    an explicit approximation knob, exact when None).

    Determinism: pair selection breaks count ties on the pair's
    (left, right) strings ascending; merge application inside a word
    is leftmost-first (the standard rule).  Words carry an end-of-word
    sentinel '</w>' so merges cannot cross word boundaries (the public
    convention).

    Output (eager, ≤ n_merges rows): (rank:int64, left:str, right:str,
    cnt:int64) — rank is the merge order, cnt the winning pair's
    weighted count at selection time.
    """
    hist = word_counts(ds.select_columns([text_col])).to_pandas()
    hist = hist.sort_values(
        ["n", "token"], ascending=[False, True], kind="mergesort"
    )
    if max_vocab is not None:
        hist = hist.head(max_vocab)

    # word -> symbol tuple (chars + the end-of-word sentinel)
    words: list[list[str]] = [
        list(t) + ["</w>"] for t in hist["token"].astype(str)
    ]
    freqs = hist["n"].astype("int64").to_list()

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in zip(words, freqs):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, int(cnt)))
        joined = left + right
        for w, syms in enumerate(words):
            i, out = 0, []
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    return pd.DataFrame(
        {
            "rank": pd.Series([m[0] for m in merges], dtype="int64"),
            "left": pd.Series([m[1] for m in merges], dtype=str),
            "right": pd.Series([m[2] for m in merges], dtype=str),
            "cnt": pd.Series([m[3] for m in merges], dtype="int64"),
        }
    )


def bpe_encode(
    ds: "ray.data.Dataset",
    merges: pd.DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Apply a trained BPE merge table (from :func:`bpe_train`) to the
    corpus and report per-document BPE token counts — the tokenizer
    APPLICATION side at scale: the merge table is broadcast once per
    actor, encoding is word-histogram-memoized per batch (each distinct
    word in a batch is encoded once, then weighted by its in-batch
    frequency).  Row-local, zero shuffle.

    Output: (id_col, n_bpe_tokens:int64, n_words:int64).
    """
    import ray as _ray

    from pdf_parser_ray.io_utils import arrow_out

    table = [
        (str(l), str(r)) for l, r in zip(merges["left"], merges["right"])
    ]
    table_ref = _ray.put(table)

    class _Encoder:
        def __init__(self):
            self.merges: list[tuple[str, str]] = _ray.get(table_ref)
            self.cache: dict[str, int] = {}

        def encode_len(self, word: str) -> int:
            n = self.cache.get(word)
            if n is not None:
                return n
            syms = list(word) + ["</w>"]
            for left, right in self.merges:
                i, out = 0, []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
                if len(syms) == 1:
                    break
            n = len(syms)
            if len(self.cache) < 1_000_000:
                self.cache[word] = n
            return n

        def __call__(self, df: pd.DataFrame):
            import numpy as np

            toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
            n_bpe = np.zeros(len(df), dtype=np.int64)
            n_words = np.zeros(len(df), dtype=np.int64)
            for i, words in enumerate(toks):
                n_words[i] = len(words)
                vc: dict[str, int] = {}
                for w in words:
                    vc[w] = vc.get(w, 0) + 1
                n_bpe[i] = sum(
                    self.encode_len(w) * c for w, c in vc.items()
                )
            return arrow_out(
                pd.DataFrame(
                    {
                        id_col: df[id_col].to_numpy(),
                        "n_bpe_tokens": n_bpe,
                        "n_words": n_words,
                    }
                )
            )

    return ds.select_columns([id_col, text_col]).map_batches(
        _Encoder, batch_format="pandas", concurrency=(1, 8)
    )


def _viterbi_segment(
    word: str, logp: dict, max_len: int, unk_logp: float
) -> list[str]:
    """Best unigram-LM segmentation of ``word`` (max sum of piece
    logprobs).  Deterministic tie-break: positions scan left→right and
    candidate start offsets scan in INCREASING order with strict ``>``,
    so the first-found optimum wins — i.e. among equal-score paths the
    one whose pieces end earliest (shortest-last-piece) is chosen.
    Characters absent from the vocab segment as themselves at
    ``unk_logp`` (can't happen when encoding the training corpus —
    every seed char is kept — but keeps the encoder total on unseen
    text)."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None:
                if j - i != 1:
                    continue
                lp = unk_logp
            s = best[i] + lp
            if s > best[j]:
                best[j] = s
                back[j] = i
    out: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def unigram_train(
    ds: "ray.data.Dataset",
    vocab_size: int,
    *,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_rounds: int = 4,
    max_vocab: int | None = None,
) -> pd.DataFrame:
    """Train a SentencePiece-style unigram-LM tokenizer vocabulary
    (Kudo 2018, the public unigram recipe, deterministically
    simplified): seed with frequent substrings, alternate Viterbi
    E-steps with count-renormalizing M-steps, prune to ``vocab_size``.

    Like :func:`bpe_train`, the distributed part is ONE
    :func:`word_counts` pass — unigram training only consumes the
    word-frequency histogram, so corpus-scan cost is independent of
    ``em_rounds`` and the EM loop runs on the vocabulary-bounded
    histogram (``max_vocab`` caps the tail landing on the driver, an
    explicit approximation knob).

    Simplifications vs the paper, all pinned by tests: hard-EM
    (Viterbi counts, not lattice posteriors); pruning keeps the top
    pieces by (usage DESC, piece ASC) instead of the likelihood-loss
    ranking; single-character pieces are never pruned (lossless
    coverage of the training corpus is an invariant).

    Output (eager, ≤ vocab_size rows): (piece:str, cnt:int64 — Viterbi
    usage at the last E-step, logprob:float64), sorted (cnt DESC,
    piece ASC).
    """
    import math

    hist = word_counts(ds.select_columns([text_col])).to_pandas()
    hist = hist.sort_values(
        ["n", "token"], ascending=[False, True], kind="mergesort"
    )
    if max_vocab is not None:
        hist = hist.head(max_vocab)
    words = [str(t) for t in hist["token"]]
    freqs = hist["n"].astype("int64").to_list()

    # -- seed: substring counts (weighted by word freq), chars always in
    sub_counts: dict[str, int] = {}
    for w, f in zip(words, freqs):
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                p = w[i:j]
                sub_counts[p] = sub_counts.get(p, 0) + f
    chars = {p for p in sub_counts if len(p) == 1}
    if seed_size is None:
        seed_size = max(4 * vocab_size, vocab_size + len(chars))
    multi = sorted(
        ((p, c) for p, c in sub_counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, seed_size - len(chars))]
    vocab = {p: sub_counts[p] for p in chars}
    vocab.update(dict(multi))

    def _renorm(counts: dict) -> dict:
        total = sum(counts.values())
        return {
            p: math.log(c) - math.log(total)
            for p, c in counts.items()
            if c > 0
        }

    logp = _renorm(vocab)
    usage: dict[str, int] = {}
    for r in range(em_rounds):
        # E-step: Viterbi-segment the distinct words, weight by freq
        usage = {}
        for w, f in zip(words, freqs):
            for p in _viterbi_segment(w, logp, max_piece_len, -1e9):
                usage[p] = usage.get(p, 0) + f
        # keep single chars alive even when Viterbi never picks them
        for c in chars:
            usage.setdefault(c, 0)
        floor = {p: max(c, 1) if len(p) == 1 else c for p, c in usage.items()}
        # prune: chars + best multis by (usage DESC, piece ASC); the
        # final round prunes to vocab_size, earlier rounds shrink 25%
        keep_multi = sorted(
            ((p, c) for p, c in floor.items() if len(p) > 1 and c > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )
        if r == em_rounds - 1:
            target = max(0, vocab_size - len(chars))
        else:
            target = max(
                max(0, vocab_size - len(chars)), int(len(keep_multi) * 0.75)
            )
        floor = {
            **{p: c for p, c in floor.items() if len(p) == 1},
            **dict(keep_multi[:target]),
        }
        logp = _renorm(floor)
        usage = floor

    pieces = sorted(logp, key=lambda p: (-usage.get(p, 0), p))
    return pd.DataFrame(
        {
            "piece": pd.Series(pieces, dtype=str),
            "cnt": pd.Series(
                [int(usage.get(p, 0)) for p in pieces], dtype="int64"
            ),
            "logprob": pd.Series([logp[p] for p in pieces], dtype="float64"),
        }
    )


def unigram_encode(
    ds: "ray.data.Dataset",
    pieces: pd.DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Apply a trained unigram-LM vocabulary (from
    :func:`unigram_train`) to the corpus: per-document piece counts
    plus total Viterbi log-likelihood — the SentencePiece application
    side at scale.  The (piece, logprob) table is broadcast once per
    actor; encoding is word-memoized per batch like :func:`bpe_encode`.
    Row-local, zero shuffle.

    Output: (id_col, n_pieces:int64, n_words:int64, loglik:float64).
    """
    import ray as _ray

    from pdf_parser_ray.io_utils import arrow_out

    logp = dict(zip(pieces["piece"].astype(str), pieces["logprob"]))
    max_len = max((len(p) for p in logp), default=1)
    unk = min(logp.values(), default=0.0) - 10.0
    table_ref = _ray.put((logp, max_len, unk))

    class _Encoder:
        def __init__(self):
            self.logp, self.max_len, self.unk = _ray.get(table_ref)
            self.cache: dict[str, tuple[int, float]] = {}

        def encode(self, word: str) -> tuple[int, float]:
            hit = self.cache.get(word)
            if hit is not None:
                return hit
            segs = _viterbi_segment(word, self.logp, self.max_len, self.unk)
            ll = sum(self.logp.get(p, self.unk) for p in segs)
            hit = (len(segs), ll)
            if len(self.cache) < 1_000_000:
                self.cache[word] = hit
            return hit

        def __call__(self, df: pd.DataFrame):
            import numpy as np

            toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
            n_pieces = np.zeros(len(df), dtype=np.int64)
            n_words = np.zeros(len(df), dtype=np.int64)
            loglik = np.zeros(len(df), dtype=np.float64)
            for i, words in enumerate(toks):
                n_words[i] = len(words)
                vc: dict[str, int] = {}
                for w in words:
                    vc[w] = vc.get(w, 0) + 1
                np_i = 0
                ll_i = 0.0
                for w, c in vc.items():
                    n, ll = self.encode(w)
                    np_i += n * c
                    ll_i += ll * c
                n_pieces[i] = np_i
                loglik[i] = ll_i
            return arrow_out(
                pd.DataFrame(
                    {
                        id_col: df[id_col].to_numpy(),
                        "n_pieces": n_pieces,
                        "n_words": n_words,
                        "loglik": loglik,
                    }
                )
            )

    return ds.select_columns([id_col, text_col]).map_batches(
        _Encoder, batch_format="pandas", concurrency=(1, 8)
    )


def _perceptron_batch_features(df: pd.DataFrame, text_col: str, n_buckets: int):
    """Per-batch sparse hashed features: (row_pos, bucket, count) with
    the repo-standard md5 bucket rule (int(md5(tok)[:8],16) % D) and a
    per-worker token→bucket memo."""
    import numpy as np

    from pdf_parser_ray.stages import worker_state

    cache = worker_state(("pcp_md5", n_buckets), dict)
    toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
    ex = toks.explode().dropna()
    if len(ex) == 0:
        return (
            np.array([], dtype=np.int64),
            np.array([], dtype=np.int64),
            np.array([], dtype=np.int64),
        )
    for t in ex.unique():
        if t not in cache:
            cache[t] = (
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
                % n_buckets
            )
    pos_map = pd.Series(
        np.arange(len(df), dtype=np.int64), index=df.index
    )
    tmp = pd.DataFrame(
        {
            "row": pos_map[ex.index].to_numpy(),
            "b": ex.map(cache).astype("int64").to_numpy(),
        }
    )
    g = tmp.groupby(["row", "b"], as_index=False).size()
    return (
        g["row"].to_numpy(dtype=np.int64),
        g["b"].to_numpy(dtype=np.int64),
        g["size"].to_numpy(dtype=np.int64),
    )


def perceptron_train(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    label_col: str = "lang",
    positive: str = "en",
    n_buckets: int = 64,
    rounds: int = 3,
) -> pd.DataFrame:
    """Train a linear text classifier DISTRIBUTED with full-batch
    perceptron updates (Rosenblatt rule, batch form): per round, every
    misclassified document (margin ``y·(w·x + w_bias) <= 0``) adds
    ``y·x`` to the weights.  Features are md5 hash-trick unigram
    COUNTS (the source_kl/nb_classify bucket rule), labels
    ``+1 if label_col == positive else -1``.

    Everything is int64 — counts, weights, margins — so the unrolled
    DuckDB twin is value-EXACT despite the iterative training loop (no
    sigmoid, no float tree; the fastText-shaped quality/language gate
    with a hard oracle).

    Each round is one corpus scan emitting (bucket, grad) partials
    (bounded at (n_buckets+1) × batches); the driver adds the summed
    gradient into ``w`` and re-broadcasts.  ``rounds`` scans total —
    features are cheaper to recompute than to materialize corpus-wide.

    Output (eager, n_buckets+1 rows): (bucket:int64, w:int64) with
    bucket == n_buckets holding the bias.
    """
    import numpy as np

    w = np.zeros(n_buckets + 1, dtype=np.int64)

    for _ in range(rounds):
        w_now = w.copy()

        def grad_partial(df: pd.DataFrame, _w=w_now):
            rows, buckets, counts = _perceptron_batch_features(
                df, text_col, n_buckets
            )
            y = np.where(
                df[label_col].fillna("").to_numpy() == positive, 1, -1
            ).astype(np.int64)
            scores = np.full(len(df), int(_w[n_buckets]), dtype=np.int64)
            if len(rows):
                np.add.at(scores, rows, _w[buckets] * counts)
            mis = (y * scores) <= 0
            g = np.zeros(n_buckets + 1, dtype=np.int64)
            if len(rows):
                keep = mis[rows]
                np.add.at(
                    g[:n_buckets], buckets[keep], y[rows[keep]] * counts[keep]
                )
            g[n_buckets] = int(y[mis].sum())
            nz = np.flatnonzero(g)
            return arrow_out(
                pd.DataFrame(
                    {"bucket": nz.astype("int64"), "g": g[nz]}
                )
            )

        parts = (
            ds.select_columns([text_col, label_col])
            .map_batches(grad_partial, batch_format="pandas")
            .to_pandas()  # bounded: (n_buckets+1) × batches rows
        )
        if len(parts):
            agg = parts.groupby("bucket")["g"].sum()
            w[agg.index.to_numpy(dtype=np.int64)] += agg.to_numpy(
                dtype=np.int64
            )

    return pd.DataFrame(
        {
            "bucket": np.arange(n_buckets + 1, dtype=np.int64),
            "w": w,
        }
    )


def perceptron_predict(
    ds: "ray.data.Dataset",
    weights: pd.DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    keep_cols: tuple = (),
) -> "ray.data.Dataset":
    """Score documents with a :func:`perceptron_train` weight table:
    integer margin ``w·x + bias`` and the boolean prediction
    ``margin > 0``.  Weights broadcast once (tiny); row-local, zero
    shuffle.  ``keep_cols`` pass extra input columns through alongside
    the scores — a label column riding here costs nothing, where a
    post-hoc doc_id join to reattach it is a full co-location exchange
    (the r5 margin_calibration fix).  Output: (id_col, margin:int64,
    pred:bool, *keep_cols)."""
    import numpy as np

    w = np.zeros(n_buckets + 1, dtype=np.int64)
    w[weights["bucket"].to_numpy(dtype=np.int64)] = weights["w"].to_numpy(
        dtype=np.int64
    )
    keep = list(keep_cols)

    def score(df: pd.DataFrame):
        rows, buckets, counts = _perceptron_batch_features(
            df, text_col, n_buckets
        )
        margins = np.full(len(df), int(w[n_buckets]), dtype=np.int64)
        if len(rows):
            np.add.at(margins, rows, w[buckets] * counts)
        out = {
            id_col: df[id_col].to_numpy(),
            "margin": margins,
            "pred": margins > 0,
        }
        for c in keep:
            out[c] = df[c].to_numpy()
        return arrow_out(pd.DataFrame(out))

    return ds.select_columns([id_col, text_col, *keep]).map_batches(
        score, batch_format="pandas"
    )


def char_entropy(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
):
    """Per-document character Shannon entropy (bits) — the cheap
    gibberish/diversity signal curation pipelines pair with the
    word-level Gopher rules (near-zero = repeated filler; anomalously
    high = random noise / binary junk).  CHARACTER semantics (UTF-32
    codepoints), matching the DuckDB twin's substr() scan.

    Fully vectorized across the batch: ONE utf-32 decode of the
    concatenated batch text, (row, codepoint) keys folded via
    np.unique, per-row entropy terms accumulated with np.add.at — no
    per-row Python loop.  Entropy rounds to ``round_to`` dp and adds
    +0.0 (kills -0.0) — the sum-order rounding contract established by
    windows.grouped_entropy.  Row-local, zero shuffle.

    Output: (id_col, n_chars:int64, entropy_bits:float64); empty/null
    text emits (0, 0.0).
    """
    import numpy as np

    def run(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").astype(str)
        joined = "".join(texts.tolist())
        codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        lens = texts.str.len().to_numpy(dtype=np.int64)
        ent = np.zeros(len(df))
        if len(codes):
            rows = np.repeat(np.arange(len(df), dtype=np.int64), lens)
            # codepoints < 2^21, so (row, char) packs into one int64 key
            keys = (rows << 21) | codes.astype(np.int64)
            uniq, cnt = np.unique(keys, return_counts=True)
            urow = (uniq >> 21).astype(np.int64)
            p = cnt / lens[urow]
            np.add.at(ent, urow, -p * np.log2(p))
        ent = np.round(ent, round_to) + 0.0
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    "n_chars": lens,
                    "entropy_bits": ent,
                }
            )
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        run, batch_format="pandas"
    )


def compression_ratio(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
):
    """Per-document deflate compression ratio — the RefinedWeb/MADLAD
    style repetition+boilerplate signal: templated or looped text
    compresses far below typical prose, random junk barely compresses
    at all, so both curation tails are visible in one number.

    No SQL twin exists (DuckDB has no deflate), so the query is
    rows-only; the semantics are pinned by tests instead (ordering
    between repetitive / prose / noise, empty/null handling,
    determinism across calls).  zlib is a C-speed kernel, so the
    per-row loop is bounded by compression itself, not Python
    overhead.  Row-local, zero shuffle.

    Output: (id_col, raw_bytes:int64, compressed_bytes:int64,
    ratio:float64 = compressed/raw rounded 6dp, 0.0 for empty).
    """
    import zlib

    import numpy as np

    def run(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("").astype(str)
        raw = np.empty(len(df), dtype=np.int64)
        comp = np.empty(len(df), dtype=np.int64)
        for i, t in enumerate(texts):
            b = t.encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, level))
        ratio = np.round(
            np.where(raw > 0, comp / np.maximum(raw, 1), 0.0), 6
        ) + 0.0
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy(),
                    "raw_bytes": raw,
                    "compressed_bytes": comp,
                    "ratio": ratio,
                }
            )
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        run, batch_format="pandas"
    )


def s_stem(word: str) -> str:
    """Harman (1991) S-removal stemmer — the three-rule suffix stemmer
    (first matching rule wins):

    1. ``-ies`` → ``-y``   unless the word ends ``-eies``/``-aies``
    2. ``-es``  → ``-e``   unless it ends ``-aes``/``-ees``/``-oes``
    3. ``-s``   → drop     unless it ends ``-us``/``-ss``

    Chosen over heavier stemmers because every rule is a suffix test —
    the DuckDB twin reproduces it with LIKE/substr CASE arms, so
    stemmed rollups are value-oracled end to end.
    """
    if word.endswith("ies") and not word.endswith(("eies", "aies")):
        return word[:-3] + "y"
    if word.endswith("es") and not word.endswith(("aes", "ees", "oes")):
        return word[:-1]
    if word.endswith("s") and not word.endswith(("us", "ss")):
        return word[:-1]
    return word


def stem_vocab(
    ds,
    *,
    text_col: str = "text",
    n_parts: int | None = None,
):
    """Stemmed-vocabulary rollup: per S-stem, total token occurrences
    and the number of DISTINCT raw types that merged into it — the
    index-building conflation audit (how much does stemming shrink the
    vocabulary, and which stems absorb the most types).

    Per-batch partial (stem, raw, n) combiners — stemming is a bounded
    dict-cached map over the batch's distinct tokens, not per token —
    then ONE stem co-location computing both the occurrence sum and
    the distinct-type count inside the partition.  Shuffle is
    vocabulary-sized.

    Output: (stem:str, n_tokens:int64, n_types:int64).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.findall(TOKEN_PAT)
        ex = toks.explode().dropna()
        if ex.empty:
            return arrow_out(pd.DataFrame({
                "stem": pd.Series([], dtype=str),
                "raw": pd.Series([], dtype=str),
                "n": pd.Series([], dtype="int64")}))
        g = ex.groupby(ex.to_numpy()).size()
        raw = g.index.to_numpy()
        stems = [s_stem(w) for w in raw]  # distinct tokens only
        return arrow_out(pd.DataFrame({
            "stem": stems, "raw": raw,
            "n": g.to_numpy(dtype="int64")}))

    def finish(part: pd.DataFrame) -> pd.DataFrame:
        raw_sum = part.groupby(["stem", "raw"], as_index=False)["n"].sum()
        g = raw_sum.groupby("stem", as_index=False).agg(
            n_tokens=("n", "sum"), n_types=("raw", "size")
        )
        return arrow_out(pd.DataFrame({
            "stem": g["stem"],
            "n_tokens": g["n_tokens"].astype("int64"),
            "n_types": g["n_types"].astype("int64")}))

    kw = {"n_parts": n_parts} if n_parts else {}
    return partitioned_map(
        ds.select_columns([text_col]).map_batches(
            partial, batch_format="pandas"
        ),
        ["stem"],
        finish,
        **kw,
    )


def _kgram_hashes(s: str, k: int) -> "object":
    """All k-gram rolling hashes of ``s`` (UTF-8 bytes; ASCII corpora
    contract as :func:`rolling_fingerprint_batch`), uint64 wraparound:
    hash(s..s+k-1) = Σ b_j · B^(k-1-j) mod 2^64 — the exact value the
    generated DuckDB twins recompute with precomputed powers."""
    import numpy as np

    B = np.uint64(1000003)
    inv = np.uint64(1)
    with np.errstate(over="ignore"):
        for _ in range(6):
            inv = inv * (np.uint64(2) - B * inv)
    data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        inv_pows = np.empty(n, dtype=np.uint64)
        inv_pows[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, inv, dtype=np.uint64), out=inv_pows[1:])
        pows = np.empty(n, dtype=np.uint64)
        pows[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, B, dtype=np.uint64), out=pows[1:])
        S = np.cumsum(data * inv_pows, dtype=np.uint64)
        ends = np.arange(k - 1, n)
        starts = ends - k + 1
        diffs = S[ends] - np.where(starts > 0, S[starts - 1], np.uint64(0))
        return diffs * pows[k - 1] * pows[starts]


def winnow_fingerprint_batch(
    df: pd.DataFrame, *, k: int = 8, w: int = 4
) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): over the sequence of k-gram
    rolling hashes, each window of ``w`` consecutive hashes selects its
    minimum (RIGHTMOST occurrence on ties, the paper's robust-winnowing
    rule); the deduplicated selections are the document's fingerprint
    set.  Guarantee: any substring match of length ≥ w + k − 1 shares
    at least one fingerprint — the local-selection property uniform
    random sampling lacks.

    Row-local and fully vectorized per document (sliding_window_view +
    reversed argmin for the rightmost-tie rule); documents shorter than
    k characters emit no fingerprints, and documents with fewer than
    ``w`` k-grams winnow a single window spanning all of them.

    Output: one row per DISTINCT (doc_id, fingerprint) — the exploded
    fingerprint relation downstream cross-doc grouping consumes.
    """
    import numpy as np

    doc_ids: list = []
    fps: list = []
    for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
        hs = _kgram_hashes(text, k)
        nh = len(hs)
        if nh == 0:
            continue
        if nh < w:
            windows = hs[None, :]
        else:
            windows = np.lib.stride_tricks.sliding_window_view(hs, w)
        rev = windows[:, ::-1]
        off = np.argmin(rev, axis=1)
        sel = np.arange(len(windows)) + (windows.shape[1] - 1 - off)
        uniq = np.unique(hs[np.unique(sel)])
        doc_ids.append(np.full(len(uniq), doc_id, dtype=np.int64))
        fps.append(uniq)
    if not doc_ids:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "fp": pd.Series([], dtype="uint64"),
            }
        )
    return pd.DataFrame(
        {
            "doc_id": np.concatenate(doc_ids),
            "fp": np.concatenate(fps).astype("uint64"),
        }
    )


def kneser_ney_score(
    ds,
    *,
    discount_cents: int = 75,
    round_to: int = 6,
    broadcast_limit: int = 5_000_000,
) -> "object":
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1999's fixed-discount form) — the stronger sibling
    of :func:`lm_score`'s add-one gate: continuation probability
    P_cont(w) = N1+(·,w)/T replaces raw unigram frequency, so
    boilerplate-frequent-but-context-bound tokens ("Francisco") stop
    inflating fluency scores.

    P(w|u) = max(c(u,w) − d, 0)/c(u·) + (d·N1+(u,·)/c(u·))·P_cont(w),
    d = ``discount_cents``/100 (the shared exact literal); unseen
    context backs off to P_cont alone, unseen word floors at d/T —
    both pinned for the scoring-held-out case (training on the corpus
    itself sees every bigram).

    Scale shape (the lm_score broadcast tier): per-batch (u,w) partial
    counts → ONE bounded bigram-vocabulary groupby → driver model
    (guarded by ``broadcast_limit``; the lm_score join-mode blueprint
    is the outgrow path) → ``ray.put`` once → row-local scoring.
    Per-doc sums of log2 P round to ``round_to``.

    Output: (doc_id, n_bigrams:int64, kn_logprob:float64 — Σ log2 P,
    rounded; docs with no bigram drop).
    """
    import math

    import ray

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum
    from pdf_parser_ray.stages import worker_state

    d = discount_cents / 100.0

    def _doc_bigrams(text: str) -> list:
        toks = [t.lower() for t in TOKEN_PAT.findall(text or "")]
        return list(zip(toks, toks[1:]))

    def bigram_partial(df: pd.DataFrame):
        rows: dict = {}
        for text in df["text"].fillna(""):
            for uw in _doc_bigrams(text):
                rows[uw] = rows.get(uw, 0) + 1
        out = pd.DataFrame(
            {
                "u": [u for u, _ in rows],
                "w": [w for _, w in rows],
                "c": pd.Series(list(rows.values()), dtype="int64"),
            }
        )
        return arrow_out(out)

    bigrams = (
        grouped_sum(
            ds.select_columns(["doc_id", "text"]).map_batches(
                bigram_partial, batch_format="pandas"
            ),
            ["u", "w"],
            ["c"],
        )
        .limit(broadcast_limit + 1)
        .to_pandas()  # bounded: bigram vocabulary (guarded)
    )
    if len(bigrams) > broadcast_limit:
        raise ValueError(
            f"bigram vocabulary exceeds broadcast_limit={broadcast_limit}; "
            "use the lm_score join-mode pattern for this corpus"
        )
    cu = bigrams.groupby("u")["c"].sum()          # c(u ·)
    n1u = bigrams.groupby("u")["w"].size()        # N1+(u, ·)
    n1w = bigrams.groupby("w")["u"].size()        # N1+(·, w)
    T = len(bigrams)
    logp: dict = {}
    lam: dict = {}
    pcont: dict = {}
    for u, cnt in cu.items():
        lam[u] = d * float(n1u[u]) / float(cnt)
    for w, cnt in n1w.items():
        pcont[w] = float(cnt) / T if T else 0.0
    for u, w, c in zip(bigrams["u"], bigrams["w"], bigrams["c"]):
        p = max(float(c) - d, 0.0) / float(cu[u]) + lam[u] * pcont[w]
        logp[(u, w)] = math.log2(p)
    model_ref = ray.put((logp, lam, pcont, T))

    def score(df: pd.DataFrame):
        logp_m, lam_m, pcont_m, t_total = worker_state(
            ("kn_model", model_ref.hex()), lambda: ray.get(model_ref)
        )
        floor = math.log2(d / t_total) if t_total else 0.0
        ids, nbg, lp = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
            pairs = _doc_bigrams(text)
            if not pairs:
                continue
            s = 0.0
            for uw in pairs:
                v = logp_m.get(uw)
                if v is None:  # held-out backoff tiers, pinned
                    pc = pcont_m.get(uw[1])
                    if uw[0] in lam_m and pc:
                        v = math.log2(lam_m[uw[0]] * pc)
                    elif pc:
                        v = math.log2(pc)
                    else:
                        v = floor
                s += v
            ids.append(doc_id)
            nbg.append(len(pairs))
            lp.append(round(s, round_to))
        return arrow_out(
            pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bigrams": pd.Series(nbg, dtype="int64"),
                    "kn_logprob": pd.Series(lp, dtype="float64"),
                }
            )
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )


def good_turing_counts(ds, *, max_r: int = 10) -> "object":
    """Good-Turing frequency-of-frequencies table (Good 1953; the
    Gale-Sampson presentation): for word-count r ≤ ``max_r``, the
    number of types N_r seen exactly r times and the discounted
    estimate r* = (r+1)·N_{r+1}/N_r — the unseen-mass view (N_1/N
    Σ-mass goes to novel words) that motivates every smoothing
    scheme KN refines.

    Reported rows are the ``max_r`` SMALLEST frequency classes
    PRESENT in the corpus (not r ≤ max_r absolutely — a small-vocab
    corpus whose rarest word still occurs hundreds of times would
    otherwise report nothing).  Two bounded shuffles: word partial
    counts → vocabulary-bounded grouped sum; count-of-counts partials
    → a grouped sum bounded by distinct frequency VALUES (~O(√corpus)).
    r* is a per-row ratio of exact int64s (unrounded); rows with no
    r+1 class report r* = 0.0 (pinned: undefined there, callers
    smooth).

    Output: (r:int64, n_r:int64, r_star:float64), r ascending.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    def word_partial(df: pd.DataFrame):
        from collections import Counter

        c: Counter = Counter()
        for text in df["text"].fillna(""):
            c.update(t.lower() for t in TOKEN_PAT.findall(text))
        return arrow_out(
            pd.DataFrame(
                {
                    "w": list(c.keys()),
                    "c": pd.Series(list(c.values()), dtype="int64"),
                }
            )
        )

    words = grouped_sum(
        ds.select_columns(["doc_id", "text"]).map_batches(
            word_partial, batch_format="pandas"
        ),
        ["w"],
        ["c"],
    )

    def coc_partial(df: pd.DataFrame):
        g = df.groupby("c", as_index=False).size()
        g.columns = ["r", "n"]
        return arrow_out(g.astype({"r": "int64", "n": "int64"}))

    coc = (
        grouped_sum(
            words.map_batches(coc_partial, batch_format="pandas"),
            ["r"],
            ["n"],
        )
        .to_pandas()  # bounded: distinct frequency values
        .sort_values("r")
        .reset_index(drop=True)
    )
    nr = dict(zip(coc["r"].astype(int), coc["n"].astype(int)))
    rows = []
    for r in [int(x) for x in coc["r"].head(max_r)]:
        n_r = nr[r]
        n_r1 = nr.get(r + 1, 0)
        r_star = (r + 1) * n_r1 / n_r if n_r1 else 0.0
        rows.append((r, n_r, r_star))
    return pd.DataFrame(
        rows, columns=["r", "n_r", "r_star"]
    ).astype({"r": "int64", "n_r": "int64"})
