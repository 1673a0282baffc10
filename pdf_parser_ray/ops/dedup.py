"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Shuffle strategy (ray_guide "Aggregation at scale"):
* exact:   hash in ``map_batches`` (vectorized md5) → per-batch partial
           min → one small ``groupby(text_hash).min(doc_id)`` shuffle.
           Key = content hash (uniform by construction).
* minhash: per-batch signature computation (numpy, no shuffle) → explode
           to (band_id, band_hash, doc_id, sig) rows → ONE
           ``groupby(band_id, band_hash)`` shuffle → per-bucket pair
           emission with estimated-Jaccard filter → pair dedup groupby.
           Hot buckets (boilerplate-identical docs) are capped at
           MAX_BUCKET pairs-source docs — a documented skew guard.
* simhash: 64-bit signature per doc in ``map_batches`` → exact-match
           groups via one groupby on the signature.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import ray.data

from pdf_parser_ray.io_utils import arrow_out
from pdf_parser_ray.stages import task_kwargs as _task_kwargs
from pdf_parser_ray.stages import worker_state

_WS = re.compile(r"\s+", re.ASCII)  # RE2-aligned, see ops.text_stats
_TOKEN_PAT = re.compile(r"\S+", re.ASCII)  # lowered \S+ tokens, ditto

MERSENNE = np.uint64((1 << 61) - 1)
MAX_BUCKET = 64  # skew guard: max docs considered per LSH bucket


# ---------------------------------------------------------------- exact

def exact_hash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Partial stage: (text_hash, doc_id) with per-batch min-combine."""
    norm = df["text"].fillna("").str.lower().str.replace(_WS, " ", regex=True).str.strip(" ")
    h = norm.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
    out = pd.DataFrame({"text_hash": h, "doc_id": df["doc_id"]})
    # pre-aggregate inside the batch before the global shuffle; Arrow
    # block out — pandas blocks aggregate ~11x slower in a
    # high-cardinality shuffle (io_utils.arrow_out rationale).
    return arrow_out(out.groupby("text_hash", as_index=False)["doc_id"].min())


def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """One surviving doc_id (the min) per normalized-text hash.

    Mirrors reference-D5's keep-first semantics at corpus scale
    (SURVEY.md §2.7); SQL oracle: GROUP BY md5(normalized) → min(doc_id).
    """
    from pdf_parser_ray.ops.shuffle import grouped_agg

    partial = ds.map_batches(exact_hash_batch, batch_format="pandas")
    # hash keys are corpus-cardinality → co-location min, not the
    # streaming sort-aggregate (ops/shuffle.grouped_sum rationale)
    return grouped_agg(partial, ["text_hash"], {"doc_id": ("doc_id", "min")})


# ---------------------------------------------------------------- shingles

def _word_ngrams(text: str, n: int = 3) -> list[str]:
    toks = _WS.split(text.lower().strip())
    toks = [t for t in toks if t]
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    grams = _word_ngrams(text, n)
    if not grams:
        return np.empty(0, dtype=np.uint64)
    # crc32 is a fast, process-stable 32-bit hash (Python str hash is
    # salted per process — never use it across Ray workers).
    return np.unique(
        np.fromiter(
            (zlib.crc32(g.encode("utf-8")) for g in grams),
            dtype=np.uint64,
            count=len(grams),
        )
    )


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity (the verify kernel)."""
    a, b = set(_word_ngrams(text_a, n)), set(_word_ngrams(text_b, n))
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def grouped_jaccard_pairs(
    ds: ray.data.Dataset,
    group_col: str = "pair_id",
    *,
    ngram: int = 3,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard for every (a < b) doc pair inside a group.

    The distributed form of the verify kernel: candidate pairs arrive
    co-grouped under ``group_col`` (from LSH buckets, a pairing rule, a
    prior candidate generator), ONE groupby shuffle co-locates each
    group, and the in-group work is all-pairs exact Jaccard — callers
    must keep groups bounded (they're candidate sets, not the corpus).

    Input columns: (group_col, doc_id, text).
    Output: (a:int64, b:int64, jaccard:float64).
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        grams = [set(_word_ngrams(t, ngram)) for t in g["text"].fillna("")]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ga, gb = grams[i], grams[j]
                if not ga and not gb:
                    jac = 1.0
                elif not ga or not gb:
                    jac = 0.0
                else:
                    jac = len(ga & gb) / len(ga | gb)
                a_out.append(int(ids[i]))
                b_out.append(int(ids[j]))
                j_out.append(jac)
        return pd.DataFrame({"a": a_out, "b": b_out, "jaccard": j_out}).astype(
            {"a": "int64", "b": "int64", "jaccard": "float64"}
        )

    from pdf_parser_ray.ops.shuffle import grouped_map

    # pair groups are corpus-cardinality → bounded-partition execution
    return grouped_map(
        ds, [group_col], per_group, **({"n_parts": n_parts} if n_parts else {})
    )


# ---------------------------------------------------------------- minhash

class MinHasher:
    """Stateful signature stage: permutation coefficients built once
    per actor (seeded, identical on every worker).

    ``hash_fn="md5"`` swaps crc32 shingle hashes for md5-prefix uint64
    (SQL-reproducible; min over a multiset == min over its set, so the
    signatures stay well-defined either way)."""

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 1337,
                 hash_fn: str = "crc32"):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram
        self.hash_fn = hash_fn

    def _sh(self, grams: list[str]) -> np.ndarray:
        if self.hash_fn == "md5":
            return np.fromiter(
                (int(hashlib.md5(g.encode("utf-8")).hexdigest()[:16], 16)
                 for g in grams),
                dtype=np.uint64,
                count=len(grams),
            )
        return np.fromiter(
            (zlib.crc32(g.encode("utf-8")) for g in grams),
            dtype=np.uint64,
            count=len(grams),
        )

    def signature(self, text: str) -> np.ndarray:
        h = self._sh(_word_ngrams(text, self.ngram))
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal hashing mod Mersenne prime
            v = (self.a[:, None] * h[None, :] + self.b[:, None]) % MERSENNE
        return v.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # Transport as uint32 (low 32 bits): halves the shuffled payload
        # (sig rides along in every band row, ×bands inflation); slot
        # equality — all the LSH ever tests — collides only at 2^-32.
        #
        # Batched: one (num_perm × Σ shingles) universal-hash matrix for
        # the whole batch, then a per-doc segmented min via
        # np.minimum.reduceat — replaces num_docs separate numpy calls.
        # No per-doc np.unique: min over a multiset == min over its set.
        texts = df["text"].fillna("")
        per_doc: list[np.ndarray] = []
        for t in texts:
            per_doc.append(self._sh(_word_ngrams(t, self.ngram)))
        lens = np.fromiter((len(h) for h in per_doc), dtype=np.int64,
                           count=len(per_doc))
        sigs = np.zeros((len(per_doc), self.num_perm), dtype=np.uint64)
        nonempty = np.nonzero(lens > 0)[0]
        if len(nonempty):
            concat = np.concatenate([per_doc[i] for i in nonempty])
            with np.errstate(over="ignore"):
                v = (self.a[:, None] * concat[None, :] + self.b[:, None]) % MERSENNE
            offsets = np.zeros(len(nonempty), dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=offsets[1:])
            sigs[nonempty] = np.minimum.reduceat(v, offsets, axis=1).T
        sig32 = sigs.astype(np.uint32)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "sig": [s.tobytes() for s in sig32]}
        )


_MIX = np.uint64(0x9E3779B97F4A7C15)   # splitmix64 multiplier
_MIX_SEED = np.uint64(0x243F6A8885A308D3)


def _explode_bands(
    df: pd.DataFrame, bands: int, rows_per_band: int, *, carry_sig: bool = True
) -> pd.DataFrame:
    """(band_id:int32, band_hash:int64, doc_id[, sig]) — one row per band.

    Band hash = vectorized xor-multiply mix of the band's sig slots
    (int64, 8 bytes — replaces the former 16-char md5 hex string); the
    whole explode is numpy-vectorized across the batch.  With
    ``carry_sig=False`` the rows are 20 bytes each instead of
    ~276 — the join-payload scale path.
    """
    n = len(df)
    if n == 0:
        cols = {"band_id": pd.Series([], dtype="int32"),
                "band_hash": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64")}
        if carry_sig:
            cols["sig"] = pd.Series([], dtype=object)
        return pd.DataFrame(cols)
    sig_mat = np.vstack(
        [np.frombuffer(s, dtype=np.uint32) for s in df["sig"]]
    ).astype(np.uint64)
    band_hashes = np.empty((bands, n), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            acc = np.full(n, _MIX_SEED, dtype=np.uint64)
            for r in range(rows_per_band):
                acc = (acc ^ sig_mat[:, b * rows_per_band + r]) * _MIX
            band_hashes[b] = acc
    cols = {
        "band_id": np.repeat(np.arange(bands, dtype="int32"), n),
        "band_hash": band_hashes.reshape(-1).view(np.int64),
        "doc_id": np.tile(df["doc_id"].to_numpy(), bands),
    }
    if carry_sig:
        cols["sig"] = list(df["sig"]) * bands
    return pd.DataFrame(cols)


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    concurrency: int | tuple[int, int] | None = None,
    payload: str = "sig",
    sig_cache_path: str | None = None,
    hash_fn: str = "crc32",
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    Output: (a:int64, b:int64, est_jaccard:float64), a < b, deduped.
    Partitioning: the only all-to-all is groupby(band_id, band_hash);
    band hashes of non-near-dup docs are uniform → no skew except true
    duplicate clusters, which MAX_BUCKET caps (logged in docstring:
    capped buckets under-report pairs inside giant duplicate cliques —
    by then one exemplar pair is enough to mark the clique).

    ``payload="sig"`` (default, single-shuffle): each of the ``bands``
    rows per doc carries the uint32-truncated signature (num_perm×4 B =
    256 B at defaults) so the bucket pass verifies in place.  Measured
    at sf0.1 / 32 CPUs: minhash_pairs 10.08 s → 9.31 s end-to-end vs
    the md5-string/uint64 round-1 form.

    ``payload="join"`` (the 100-TB path): band rows are 20 bytes
    (band_id, band_hash, doc_id) — a ×13 shuffle-payload cut at
    defaults — candidate pairs dedup FIRST, then two hash joins pull
    each side's signature back for verification; join traffic is
    O(candidate pairs + 2×sig table), beating ×bands sig inflation
    whenever candidates ≪ corpus×bands (always, post-LSH).  The sig
    table feeds three consumers, so it is staged once: to
    ``sig_cache_path`` as Parquet when given (resumable, the
    production choice), else ``materialize()`` into the object store.
    Both payload modes emit identical rows (pinned by test parity).

    Measured crossover honesty (sf0.1 = 5 k docs, 32 CPUs): sig ≈ 3 s,
    join ≈ 20 s — at toy scale the two extra hash-join actor pools ARE
    the cost, so "join" only wins once the ×bands sig bytes dominate
    the fixed pool ramp (≳10^8 docs); default stays "sig".
    """
    rows_per_band = num_perm // bands

    def minhash_sig(df: pd.DataFrame) -> pd.DataFrame:
        # permutation coefficients are seeded-deterministic → build once
        # per worker process (task-mode twin of actor __init__ state)
        mh = worker_state(
            ("minhasher", num_perm, hash_fn),
            lambda: MinHasher(num_perm=num_perm, hash_fn=hash_fn),
        )
        return mh(df)

    sigs = ds.map_batches(
        minhash_sig, batch_format="pandas", **_task_kwargs(concurrency)
    )
    if payload == "join":
        return _minhash_pairs_join(
            sigs, bands=bands, rows_per_band=rows_per_band,
            threshold=threshold, sig_cache_path=sig_cache_path,
        )
    if payload != "sig":
        raise ValueError(f"payload must be 'sig' or 'join', got {payload!r}")
    exploded = sigs.map_batches(
        _explode_bands,
        fn_kwargs={"bands": bands, "rows_per_band": rows_per_band},
        batch_format="pandas",
    )

    def emit_pairs_partition(part: pd.DataFrame) -> pd.DataFrame:
        """One hash PARTITION of buckets per call (not one bucket):
        map_groups pays ~70 µs of Python per group, and almost every
        (band_id, band_hash) bucket is a singleton — 80 k buckets cost
        ~6 s at sf0.1 while the pairing kernel itself is <1 s.  Keying
        the shuffle by hash(band_hash) % P instead gives P bounded
        groups; singletons drop in ONE vectorized duplicated() pass and
        only true candidate buckets reach the Python loop."""
        a_out: list = []
        b_out: list = []
        est: list = []
        part = part[
            part.duplicated(["band_id", "band_hash"], keep=False)
        ]
        for _, g in part.groupby(["band_id", "band_hash"], sort=False):
            g = g.sort_values("doc_id").head(MAX_BUCKET)
            ids = g["doc_id"].to_numpy()
            sig_mat = np.vstack(
                [np.frombuffer(s, dtype=np.uint32) for s in g["sig"]]
            )
            for i in range(len(ids)):
                eq = (sig_mat[i + 1 :] == sig_mat[i]).mean(axis=1)
                for j, e in enumerate(eq, start=i + 1):
                    if e >= threshold:
                        a_out.append(int(ids[i]))
                        b_out.append(int(ids[j]))
                        est.append(float(e))
        return arrow_out(
            pd.DataFrame({"a": a_out, "b": b_out, "est_jaccard": est}).astype(
                {"a": "int64", "b": "int64", "est_jaccard": "float64"}
            )
        )

    def add_part(df: pd.DataFrame, n_parts: int):
        df = df.copy()
        # band_hash is already a uniform int64 hash → cheap modulo key.
        df["part"] = (df["band_hash"].to_numpy() % n_parts).astype("int64")
        return arrow_out(df)  # Arrow block into the part shuffle

    n_parts = 512  # groups stay bounded: rows/512 per partition, uniform keys
    pairs = (
        exploded.map_batches(
            add_part, fn_kwargs={"n_parts": n_parts}, batch_format="pandas"
        )
        .groupby("part")
        .map_groups(emit_pairs_partition, batch_format="pandas")
    )
    # A pair can surface from several bands → keep one row (max estimate);
    # pair-cardinality keys → co-location max, not the streaming
    # sort-aggregate (ops/shuffle.grouped_sum rationale)
    from pdf_parser_ray.ops.shuffle import grouped_agg

    return grouped_agg(pairs, ["a", "b"], {"est_jaccard": ("est_jaccard", "max")})


def _minhash_pairs_join(
    sigs: ray.data.Dataset,
    *,
    bands: int,
    rows_per_band: int,
    threshold: float,
    sig_cache_path: str | None,
) -> ray.data.Dataset:
    """payload="join" body: bare-id band explode → distinct candidate
    pairs → two hash joins against the staged signature table → exact
    slot-agreement estimate → threshold filter."""
    import ray as _ray

    from pdf_parser_ray.ops.relational import hash_join

    if sig_cache_path:
        sigs.write_parquet(sig_cache_path)
        sigs = _ray.data.read_parquet(sig_cache_path)
    else:
        sigs = sigs.materialize()

    exploded = sigs.map_batches(
        _explode_bands,
        fn_kwargs={"bands": bands, "rows_per_band": rows_per_band,
                   "carry_sig": False},
        batch_format="pandas",
    )

    def emit_candidates(part: pd.DataFrame) -> pd.DataFrame:
        """Same bounded-partition shape as the sig path, minus the sig
        payload: vectorized singleton drop, per-bucket id pairing."""
        a_out: list = []
        b_out: list = []
        part = part[part.duplicated(["band_id", "band_hash"], keep=False)]
        for _, g in part.groupby(["band_id", "band_hash"], sort=False):
            ids = np.sort(g["doc_id"].to_numpy())[:MAX_BUCKET]
            ii, jj = np.triu_indices(len(ids), k=1)
            a_out.append(ids[ii])
            b_out.append(ids[jj])
        if not a_out:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"),
                 "b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"a": np.concatenate(a_out).astype("int64"),
             "b": np.concatenate(b_out).astype("int64")}
        )

    def add_part(df: pd.DataFrame, n_parts: int) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (df["band_hash"].to_numpy() % n_parts).astype("int64")
        return df

    from pdf_parser_ray.ops.shuffle import partitioned_map

    def pair_distinct(part: pd.DataFrame):
        return arrow_out(part.drop_duplicates())  # distinct across bands

    n_parts = 512
    cand = partitioned_map(
        exploded.map_batches(
            add_part, fn_kwargs={"n_parts": n_parts}, batch_format="pandas"
        )
        .groupby("part")
        .map_groups(emit_candidates, batch_format="pandas"),
        ["a", "b"],
        pair_distinct,
    )

    def rename(col_from: str, col_to: str, sig_to: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={col_from: col_to, "sig": sig_to})

        return fn

    sa = sigs.map_batches(rename("doc_id", "a", "sig_a"), batch_format="pandas")
    sb = sigs.map_batches(rename("doc_id", "b", "sig_b"), batch_format="pandas")
    j = hash_join(cand, sa, ["a"], join_type="inner")
    j = hash_join(j, sb, ["b"], join_type="inner")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"),
                 "b": pd.Series([], dtype="int64"),
                 "est_jaccard": pd.Series([], dtype="float64")}
            )
        ma = np.vstack([np.frombuffer(s, dtype=np.uint32) for s in df["sig_a"]])
        mb = np.vstack([np.frombuffer(s, dtype=np.uint32) for s in df["sig_b"]])
        est = (ma == mb).mean(axis=1)
        out = pd.DataFrame(
            {"a": df["a"].to_numpy().astype("int64"),
             "b": df["b"].to_numpy().astype("int64"),
             "est_jaccard": est.astype("float64")}
        )
        return out[out["est_jaccard"] >= threshold]

    return j.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash per doc (token bit-vote), one map_batches.

    ``hash_fn="crc32"`` (default) widens crc32 to 64 bits — fast.
    ``hash_fn="md5"`` uses md5-prefix token hashes, reproducible in SQL
    (the hll_users_md5 trick) so the signature itself can be oracled.
    """

    def __init__(self, ngram: int = 1, hash_fn: str = "crc32"):
        self.ngram = ngram
        self.hash_fn = hash_fn

    def _hashes(self, toks: list[str]) -> np.ndarray:
        if self.hash_fn == "md5":
            return np.fromiter(
                (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
                 for t in toks),
                dtype=np.uint64,
                count=len(toks),
            )
        h = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) for t in toks),
            dtype=np.uint64,
            count=len(toks),
        )
        # widen to 64 bits by mixing crc with itself shifted
        return h | (h << np.uint64(32))

    def simhash(self, text: str) -> int:
        # ngram=1 degenerates to whitespace unigrams (the default tier);
        # ngram>1 votes on word-shingle hashes like the MinHash tier.
        toks = _word_ngrams(text, self.ngram)
        if not toks:
            return 0
        h = self._hashes(toks)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                sim |= np.uint64(1) << np.uint64(i)
        return int(sim)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # int64 reinterpretation of the 64-bit signature: Arrow-native
        # (uint64 > 2^63-1 would fall back to pickled python objects).
        #
        # Batched: token hashes for the whole batch concatenate into one
        # array; per-doc bit votes are a segmented sum (np.add.reduceat)
        # over the ±1 bit matrix — one numpy pass instead of per-doc.
        texts = df["text"].fillna("")
        per_doc: list[np.ndarray] = []
        for t in texts:
            per_doc.append(self._hashes(_word_ngrams(t, self.ngram)))
        lens = np.fromiter((len(h) for h in per_doc), dtype=np.int64,
                           count=len(per_doc))
        sigs = np.zeros(len(per_doc), dtype=np.uint64)
        nonempty = np.nonzero(lens > 0)[0]
        if len(nonempty):
            h = np.concatenate([per_doc[i] for i in nonempty])
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
                    ).astype(np.int8)
            pm = (2 * bits - 1).astype(np.int32)
            offsets = np.zeros(len(nonempty), dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=offsets[1:])
            votes = np.add.reduceat(pm, offsets, axis=0)  # (n_nonempty, 64)
            packed = (
                (votes > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)[None, :]
            ).sum(axis=1, dtype=np.uint64)
            sigs[nonempty] = packed
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "simhash": sigs.view(np.int64)}
        )


def _simhash_batch(
    df: pd.DataFrame, ngram: int = 1, hash_fn: str = "crc32"
) -> pd.DataFrame:
    """Task-mode SimHasher stage (instance cached per worker process)."""
    sh = worker_state(
        ("simhasher", ngram, hash_fn),
        lambda: SimHasher(ngram=ngram, hash_fn=hash_fn),
    )
    return sh(df)


def _emb_matrix(col) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def _pair_frame(a, b, c) -> pd.DataFrame:
    return pd.DataFrame({"a": a, "b": b, "cosine": c}).astype(
        {"a": "int64", "b": "int64", "cosine": "float64"}
    )


def _rows_estimate_no_exec(ds: ray.data.Dataset):
    """Row-count estimate that NEVER executes the plan (None = unknown).

    ``ds.count()`` on a lazy plan runs the whole upstream pipeline —
    using it as a route probe means the chosen route then runs the
    pipeline a second time.  Instead: computed output → cheap count;
    metadata-only count when the plan is a bare read; else walk the
    logical DAG to the Read ops and sum parquet-footer row counts
    (row-preserving transforms keep the estimate exact; filters make it
    an upper bound, which only ever biases the route toward "lsh" — the
    safe direction).  Any op that can INCREASE row count (FlatMap, an
    arbitrary MapBatches, Zip, aggregates…) makes the footer sum an
    UNDERestimate — which could route a too-big dataset into the O(n²)
    exact path — so the walk returns None (unknown → safe route) unless
    every op on the path is in the row-preserving/reducing allowlist.
    Same no-exec discipline as relational._size_estimate_no_exec.
    """
    try:
        if ds._plan.has_computed_output():
            return ds.count()
    except Exception:
        pass
    try:
        n = ds._meta_count()
        if n is not None:
            return int(n)
    except Exception:
        pass
    # Logical ops that can NEVER yield more rows than their inputs.
    # (Union is row-additive across inputs, which the walk sums; Read /
    # InputData are the leaves the counts come from.)
    _NON_EXPANDING = {
        "Read", "InputData", "Filter", "Project", "MapRows", "Limit",
        "Union", "Sort", "RandomShuffle", "RandomizeBlocks",
        "Repartition", "StreamingRepartition", "MaterializedDataset",
    }
    try:
        total, seen = 0, False
        stack = [ds._plan._logical_plan.dag]
        while stack:
            op = stack.pop()
            kind = type(op).__name__
            is_leaf = (
                getattr(op, "_datasource", None) is not None
                or getattr(op, "input_data", None)
            )
            if not is_leaf and kind not in _NON_EXPANDING:
                return None  # potentially row-expanding → unknown
            dsrc = getattr(op, "_datasource", None)
            if dsrc is not None:
                metas = getattr(dsrc, "_metadata", None) or []
                n = sum(int(getattr(m, "num_rows", 0) or 0) for m in metas)
                if n:
                    total += n
                    seen = True
            # in-memory inputs (from_pandas / from_arrow): RefBundles
            # already carry exact block row counts
            bundles = getattr(op, "input_data", None)
            if bundles:
                n = sum(int(b.num_rows() or 0) for b in bundles)
                if n:
                    total += n
                    seen = True
            stack.extend(op.input_dependencies)
        return total if seen else None
    except Exception:
        return None


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.9,
    round_to: int = 6,
    mode: str = "auto",
    exact_max_rows: int = 200_000,
    chunk_rows: int = 16_384,
    bands: int = 16,
    band_planes: int = 4,
    seed: int = 113,
    max_bucket: int = 4096,
    concurrency: int | tuple[int, int] | None = None,
    n_parts: int | None = None,
    n_rows: int | None = None,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    Routes (``mode="auto"`` picks by a NO-EXECUTION row estimate —
    ``n_rows`` hint if given, else parquet-footer metadata via
    :func:`_rows_estimate_no_exec` — vs ``exact_max_rows``; an unknown
    estimate routes to "lsh", the side that stays safe at any scale):

    * ``"exact"`` — chunked broadcast all-pairs.  The matrix is staged
      into the object store ONE bounded chunk at a time (the driver heap
      never holds the full table; the object store can spill), then one
      ``map_batches`` pass matmuls each batch against every chunk ref.
      O(N²) compute — exact, for bounded N.
    * ``"lsh"`` — the 10^12-row path: ``bands`` independent random-
      hyperplane codes (``band_planes`` planes each) per row → ONE
      groupby(band_id, code) shuffle → bucket-local pairwise with an
      EXACT cosine gate (no false positives).  Recall for a pair at
      angle θ is 1-(1-p^band_planes)^bands with p = 1-θ/π — e.g.
      ≈1-1e-15 at cosine 0.99 with 16×4, but LOW for weakly-similar
      pairs (≈0.33 at cosine 0.4); widen bands / shrink band_planes for
      low thresholds.  ``max_bucket`` caps boilerplate-clique skew.

    Output: (a:int64, b:int64, cosine:float64 rounded to ``round_to``).
    """
    import ray as _ray

    ds = ds.select_columns(["vec_id", "embedding"])
    if mode == "auto":
        est = n_rows if n_rows is not None else _rows_estimate_no_exec(ds)
        mode = "exact" if est is not None and est <= exact_max_rows else "lsh"

    if mode == "exact":
        chunk_refs = []
        for df in ds.iter_batches(batch_size=chunk_rows, batch_format="pandas"):
            ids = df["vec_id"].to_numpy().astype("int64")
            mat = _emb_matrix(df["embedding"])
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            chunk_refs.append(_ray.put((ids, mat, norms)))

        def pair_finder(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0 or not chunk_refs:  # empty batch / empty ds
                return _pair_frame([], [], [])
            rows = _emb_matrix(df["embedding"])
            row_ids = df["vec_id"].to_numpy().astype("int64")
            rnorms = np.linalg.norm(rows, axis=1)
            rnorms[rnorms == 0] = 1.0
            frames = []
            for ref in chunk_refs:  # zero-copy plasma fetch per chunk
                ids, mat, norms = _ray.get(ref)
                cos = (rows @ mat.T) / (rnorms[:, None] * norms[None, :])
                mask = (cos >= threshold) & (ids[None, :] > row_ids[:, None])
                ii, jj = np.nonzero(mask)
                frames.append(
                    _pair_frame(row_ids[ii], ids[jj], np.round(cos[ii, jj], round_to))
                )
            return pd.concat(frames, ignore_index=True)

        return ds.map_batches(
            pair_finder, batch_format="pandas", **_task_kwargs(concurrency)
        )

    # ------------------------------------------------------- lsh route
    def band_coder(df: pd.DataFrame) -> pd.DataFrame:
        """bands × band_planes hyperplanes, seeded → identical planes on
        every worker, built once per worker process."""
        if len(df) == 0:  # np.vstack on an empty column raises
            return pd.DataFrame(
                {
                    "band_id": pd.Series([], dtype="int32"),
                    "code": pd.Series([], dtype="int32"),
                    "vec_id": pd.Series([], dtype="int64"),
                    "embedding": pd.Series([], dtype="object"),
                }
            )
        mat = _emb_matrix(df["embedding"])
        planes = worker_state(
            ("emb_band_planes", seed, bands, band_planes, mat.shape[1]),
            lambda: np.random.RandomState(seed).standard_normal(
                (mat.shape[1], bands * band_planes)
            ),
        )
        bits = (mat @ planes) > 0
        codes = bits.reshape(len(df), bands, band_planes)
        codes = (codes * (1 << np.arange(band_planes))).sum(axis=2).astype("int32")
        n = len(df)
        return pd.DataFrame(
            {
                "band_id": np.repeat(np.arange(bands, dtype="int32"), n),
                "code": codes.T.reshape(-1),
                "vec_id": np.tile(df["vec_id"].to_numpy().astype("int64"), bands),
                "embedding": list(df["embedding"]) * bands,
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _pair_frame([], [], [])
        g = g.sort_values("vec_id").head(max_bucket)
        ids = g["vec_id"].to_numpy().astype("int64")
        mat = _emb_matrix(g["embedding"])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ mat.T) / (norms[:, None] * norms[None, :])
        mask = (cos >= threshold) & (ids[None, :] > ids[:, None])
        ii, jj = np.nonzero(mask)
        return _pair_frame(ids[ii], ids[jj], np.round(cos[ii, jj], round_to))

    coded = ds.map_batches(
        band_coder, batch_format="pandas", **_task_kwargs(concurrency)
    )
    from pdf_parser_ray.ops.shuffle import grouped_map

    # LSH buckets are overwhelmingly singletons → vectorized pre-drop
    pairs = grouped_map(
        coded, ["band_id", "code"], bucket_pairs, drop_singletons=True,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    # a pair surfaces once per agreeing band → keep one row (cosines equal);
    # pair-cardinality keys → co-location max
    from pdf_parser_ray.ops.shuffle import grouped_agg

    return grouped_agg(pairs, ["a", "b"], {"cosine": ("cosine", "max")})


def simhash_groups(
    ds: ray.data.Dataset,
    concurrency: int | tuple[int, int] | None = None,
    *,
    hash_fn: str = "crc32",
) -> ray.data.Dataset:
    """Groups of docs with IDENTICAL simhash (strict near-dup tier).

    Output: (simhash:uint64, n_docs:int64, min_doc_id:int64), n_docs > 1.
    For near-matches beyond exact signature equality see
    :func:`simhash_near_pairs` (Hamming-band variant).
    """
    from ray.data.aggregate import Count, Min

    sigs = ds.map_batches(
        _simhash_batch, batch_format="pandas",
        fn_kwargs={"hash_fn": hash_fn}, **_task_kwargs(concurrency)
    )
    grouped = sigs.groupby("simhash").aggregate(
        Count(alias_name="n_docs"), Min("doc_id", alias_name="min_doc_id")
    )
    return grouped.map_batches(
        lambda df: df[df["n_docs"] > 1], batch_format="pandas"
    )


def simhash_near_pairs(
    ds: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    bands: int = 4,
    ngram: int = 1,
    max_bucket: int = 4096,
    hash_fn: str = "crc32",
    concurrency: int | tuple[int, int] | None = None,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs at Hamming distance ≤ ``max_hamming`` over
    the 64-bit SimHash (the near-dup tier beyond exact-signature match).

    Pigeonhole guarantee: splitting the signature into ``bands`` equal
    slices, any pair differing in ≤ bands-1 bits agrees on ≥1 whole
    slice — so for ``max_hamming ≤ bands-1`` (default 3 ≤ 3) recall is
    EXACTLY 1.0, not probabilistic.  One groupby(band_id, band_val)
    shuffle carrying only (int32, int64, doc_id, simhash) rows; the
    in-bucket Hamming matrix is a vectorized xor + unpackbits popcount,
    and identical-signature cliques are capped at ``max_bucket``.

    Output: (a:int64, b:int64, hamming:int64), a < b, deduped across
    bands via a min-hamming groupby (hamming is band-invariant; Min is
    just the dedup combiner).
    """
    from ray.data.aggregate import Min

    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    sigs = ds.map_batches(
        _simhash_batch, fn_kwargs={"ngram": ngram, "hash_fn": hash_fn},
        batch_format="pandas", **_task_kwargs(concurrency),
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        sim_i64 = df["simhash"].to_numpy()
        sim = sim_i64.view(np.uint64)
        vals = np.concatenate(
            [((sim >> np.uint64(b * width)) & mask).view(np.int64)
             for b in range(bands)]
        )
        return pd.DataFrame(
            {
                "band_id": np.repeat(np.arange(bands, dtype="int32"), n),
                "band_val": vals,
                "doc_id": np.tile(df["doc_id"].to_numpy(), bands),
                "simhash": np.tile(sim_i64, bands),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype="int64"),
             "b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64")}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values("doc_id").head(max_bucket)
        ids = g["doc_id"].to_numpy().astype("int64")
        sim = g["simhash"].to_numpy().view(np.uint64)
        n = len(ids)
        xor = (sim[:, None] ^ sim[None, :])
        ham = np.unpackbits(
            xor.view(np.uint8).reshape(n, n, 8), axis=2
        ).sum(axis=2).astype("int64")
        keep = (ham <= max_hamming) & (ids[None, :] > ids[:, None])
        ii, jj = np.nonzero(keep)
        return pd.DataFrame(
            {"a": ids[ii], "b": ids[jj], "hamming": ham[ii, jj]}
        ).astype({"a": "int64", "b": "int64", "hamming": "int64"})

    exploded = sigs.map_batches(explode, batch_format="pandas")
    from pdf_parser_ray.ops.shuffle import grouped_map

    pairs = grouped_map(
        exploded, ["band_id", "band_val"], bucket_pairs, drop_singletons=True,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    from pdf_parser_ray.ops.shuffle import grouped_agg

    return grouped_agg(pairs, ["a", "b"], {"hamming": ("hamming", "min")})


# ------------------------------------------------- connected components

def connected_components(
    edges: ray.data.Dataset,
    *,
    src: str = "a",
    dst: str = "b",
    max_iters: int = 25,
    mode: str = "auto",
    local_max_edges: int = 5_000_000,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Connected components over an undirected edge set — the final step
    of near-dup clustering (pairs from :func:`minhash_lsh_pairs`,
    :func:`simhash_near_pairs` or :func:`embedding_dup_pairs` → one
    canonical cluster id per doc).

    Routes (``mode="auto"`` picks by ``edges.count()`` vs
    ``local_max_edges``):

    * ``"local"`` — path-compressed union-find on the collected edge
      list.  The input here is the *already-reduced* output of near-dup
      detection (pairs), never the corpus; 5 M edges ≈ 80 MB of int64 —
      comfortably driver-sized, exact, and ~1000× faster than paying
      per-round shuffle latency on a small frontier.
    * ``"shuffle"`` — the unbounded-edge-set path: hash-min label
      propagation (the MapReduce-CC family, Kiveris et al. 2014,
      reduced to min-label rounds).  Each round is a repartition join
      expressed as one ``groupby(key).map_groups`` over the union of
      (static, materialized) edge rows and current label rows — each
      group holds one node's label plus its out-edges and emits the
      label to every neighbor — followed by ONE
      ``groupby(node).min(label)`` combine.  (A ``Dataset.join`` would
      express the same thing, but Acero cannot infer schemas for empty
      join partitions, which small inputs hit; the groupby shuffle has
      no such edge case.)  The frontier is re-materialized per round so
      the lazy lineage stays one round deep.  Round count = graph
      diameter (near-dup clusters are dense cliques-ish, so typically
      2–3); labels only ever decrease, so an unchanged label-sum is a
      sound fixed-point test.

    Output: (node:int64, component:int64), component = min reachable
    node id, one row per endpoint node.
    """
    import pyarrow as pa
    from ray.data.aggregate import Min, Sum

    # Materialize once: the edge lineage (often a full LSH pipeline) is
    # otherwise re-executed by auto-routing's count() AND by each
    # consumer below (to_pandas, or both _tag directions).
    edges = edges.materialize()
    if mode == "auto":
        mode = "local" if edges.count() <= local_max_edges else "shuffle"

    if mode == "local":
        df = edges.select_columns([src, dst]).to_pandas()
        if len(df) == 0:  # empty ds → schema-less frame; df[src] raises
            return ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "node": pd.Series([], dtype="int64"),
                        "component": pd.Series([], dtype="int64"),
                    }
                )
            )
        a = df[src].to_numpy(dtype="int64")
        b = df[dst].to_numpy(dtype="int64")
        nodes = np.unique(np.concatenate([a, b]))
        parent = np.arange(len(nodes), dtype=np.int64)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]  # path halving
                i = parent[i]
            return i

        # Union by MIN root index: nodes is sorted, so a component's
        # root index is its min index ⇒ nodes[root] == min node id,
        # matching the shuffle route's hash-min fixed point exactly.
        for i, j in zip(np.searchsorted(nodes, a), np.searchsorted(nodes, b)):
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)

        comp = nodes[[find(i) for i in range(len(nodes))]]
        return ray.data.from_pandas(
            pd.DataFrame(
                {"node": nodes.astype("int64"), "component": comp.astype("int64")}
            )
        )

    _TAGGED = pa.schema(
        [("key", pa.int64()), ("val", pa.int64()), ("is_label", pa.int64())]
    )

    # Tag helper on Arrow batches (Dataset.rename_columns in 2.49 calls
    # Arrow methods on raw blocks and crashes on pandas-format blocks;
    # empty pandas-origin blocks also lose their schema entirely — so
    # every block is rebuilt against the pinned int64 schema).
    def _tag(ds: ray.data.Dataset, key_col: str, val_col: str, flag: int):
        def f(t: pa.Table, k=key_col, v=val_col, fl=flag) -> pa.Table:
            if t.num_rows == 0 or not {k, v} <= set(t.column_names):
                return _TAGGED.empty_table()
            return pa.Table.from_arrays(
                [
                    t.column(k).cast(pa.int64()),
                    t.column(v).cast(pa.int64()),
                    pa.array(np.full(t.num_rows, fl, dtype=np.int64)),
                ],
                schema=_TAGGED,
            )

        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    # Static per-round input: both edge directions, tagged is_label=0.
    bidir = _tag(edges, src, dst, 0).union(_tag(edges, dst, src, 0)).materialize()

    # Initial frontier: every endpoint labels itself.
    labels = (
        bidir.groupby("key")
        .aggregate(Min("key", alias_name="label"))
        .map_batches(
            lambda t: pa.Table.from_arrays(
                [t.column("key").cast(pa.int64()), t.column("label").cast(pa.int64())],
                names=["node", "label"],
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def _label_sum(ds: ray.data.Dataset) -> int:
        # Dataset.aggregate returns None on an empty dataset — an empty
        # edge set (clean corpus pinned to mode="shuffle") is legal and
        # must converge immediately, not TypeError on None["s"].
        row = ds.aggregate(Sum("label", alias_name="s"))
        return int(row["s"]) if row and row.get("s") is not None else 0

    def _attach(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["is_label"] == 1, "val"]
        if lab.empty:  # node with edges but no label row cannot occur
            return pd.DataFrame({"node": [], "label": []}).astype("int64")
        m = int(lab.min())
        nbrs = g.loc[g["is_label"] == 0, "val"].to_numpy()
        nodes = np.append(nbrs, g["key"].iloc[0]).astype("int64")
        return pd.DataFrame({"node": nodes, "label": np.full(len(nodes), m, dtype="int64")})

    from pdf_parser_ray.ops.shuffle import grouped_map

    prev_sum = _label_sum(labels)
    converged = False
    # per-round label state is node-bounded: coalesce its blocks each
    # round (union + grouped ops fragment block count geometrically —
    # the pointer_jump lesson) and size the exchange to the data
    from pdf_parser_ray.ops.shuffle import size_parts

    parts_state = n_parts or size_parts(labels.count())
    for _ in range(max_iters):
        tagged = bidir.union(_tag(labels, "node", "label", 1))
        # node cardinality = near-dup population → bounded partitions
        msgs = grouped_map(tagged, ["key"], _attach, n_parts=parts_state)
        labels = (
            msgs.groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(parts_state)
            .materialize()
        )
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Labels only decrease, so a changing sum after max_iters means
        # the min-label has not reached every node: silently returning
        # would split one true component into several. Rounds needed =
        # graph diameter; near-dup clusters are dense (2-3 rounds), so
        # hitting this means chain-shaped input — raise max_iters.
        raise RuntimeError(
            f"connected_components(mode='shuffle') did not converge in "
            f"{max_iters} rounds (graph diameter exceeds max_iters); "
            f"raise max_iters for chain-shaped duplicate graphs"
        )

    return labels.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("node").cast(pa.int64()), t.column("label").cast(pa.int64())],
            names=["node", "component"],
        ),
        batch_format="pyarrow",
    )


def duplicate_windows(
    ds: ray.data.Dataset,
    *,
    w: int = 8,
    stride: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    k: int | None = 50,
) -> ray.data.Dataset:
    """ExactSubstr-lite: fixed-width token windows duplicated ACROSS
    documents (the Lee et al. "Deduplicating Training Data" signal at
    window granularity — catches mid-paragraph templating that
    paragraph-level passage_dedup misses, without a suffix array).

    Every doc emits md5 fingerprints of its ``w``-token windows at
    ``stride`` spacing — (2/stride)·tokens rows per doc, each 16 bytes
    of hash + ids, never the text.  One uniform-key groupby(win_hash)
    counts distinct docs (rows are already per (hash, doc): one corpus
    row = one doc, and in-doc repeats fold into ``cnt`` pre-shuffle).
    Windows shared by ≥ ``min_docs`` docs survive.  A tiny final
    (n_docs DESC, win_hash) sort-limit caps the report.

    Output: (win_hash, n_docs:int64, n_occ:int64), k rows.
    """
    from ray.data.aggregate import Count, Sum

    from pdf_parser_ray.ops.text_stats import TOKEN_PAT

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        ids: list = []
        hashes: list = []
        counts: list = []
        for doc, text in zip(df[id_col], df[text_col].fillna("")):
            toks = TOKEN_PAT.findall(text.lower())
            if len(toks) < w:
                continue
            seen: dict = {}
            for i in range(0, len(toks) - w + 1, stride):
                h = hashlib.md5(
                    " ".join(toks[i : i + w]).encode("utf-8")
                ).hexdigest()
                seen[h] = seen.get(h, 0) + 1
            ids.extend([doc] * len(seen))
            hashes.extend(seen.keys())
            counts.extend(seen.values())
        import pyarrow as pa

        return pa.table(
            {
                "win_hash": pa.array(hashes, pa.string()),
                id_col: pa.array(ids, pa.int64()),
                "cnt": pa.array(counts, pa.int64()),
            }
        )

    from pdf_parser_ray.ops.shuffle import grouped_agg

    def gate(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("n_docs"), min_docs))

    # win_hash is window-cardinality → co-location aggregate
    agg = grouped_agg(
        ds.map_batches(emit, batch_format="pandas"),
        ["win_hash"],
        {"n_docs": ("win_hash", "size"), "n_occ": ("cnt", "sum")},
    ).map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "win_hash": df["win_hash"],
                "n_docs": df["n_docs"].astype("int64"),
                "n_occ": df["n_occ"].astype("int64"),
            }
        )

    out = agg.map_batches(cast, batch_format="pandas")
    if k is not None:
        out = out.sort(["n_docs", "win_hash"], descending=[True, False]).limit(k)
    return out


_ESS_B = np.uint64(1000003)  # shared with rolling_fingerprint's oracle powers


def _char_window_hashes(text: str, w: int) -> "np.ndarray":
    """All stride-1 Rabin-Karp hashes of ``w``-CODE-POINT windows
    (uint64 wraparound, base 1000003) — the per-position generalization
    of text_stats.rolling_fingerprint_batch's kernel.  Hashes CODE
    POINTS (utf-32 elements), not UTF-8 bytes, so array index i is the
    true character offset of window i — duplicate_spans reports and
    scrub_duplicate_spans slices Python strings with these positions,
    and the DuckDB twin re-derives the identical values from
    ``ord(text[i])`` for ANY Unicode input (for ASCII, code point ==
    byte, so hash values match the byte-domain fingerprint kernel too).
    Returns an empty array when len(text) < w.
    """
    data = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(data)
    if n < w:
        return np.empty(0, dtype=np.uint64)
    B = _ESS_B
    inv = np.uint64(1)
    with np.errstate(over="ignore"):
        for _ in range(6):
            inv = inv * (np.uint64(2) - B * inv)
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
        return diffs * pows[w - 1] * pows[starts]


def _collect_dup_hashes(counts: ray.data.Dataset, min_count: int) -> "np.ndarray":
    """Sorted uint64 array of window hashes with total count ≥ min_count
    (empty-safe: Ray drops columns from an empty filtered dataset)."""
    pdf = counts.filter(expr=f"cnt >= {min_count}").to_pandas()
    if "wh" not in pdf.columns or not len(pdf):
        return np.empty(0, dtype=np.uint64)
    return np.sort(pdf["wh"].to_numpy(dtype=np.int64).view(np.uint64))


def _merge_positions(pos: "np.ndarray", w: int) -> "list[tuple[int, int]]":
    """Merge sorted duplicate window START positions into maximal
    [start, end) character spans (windows are width ``w``; touching or
    overlapping windows chain — the gaps-and-islands rule, identical to
    the SQL twin's ``s > lag(s) + w`` break test)."""
    if len(pos) == 0:
        return []
    breaks = np.flatnonzero(pos[1:] > pos[:-1] + w) + 1
    starts = np.concatenate([[0], breaks])
    ends = np.concatenate([breaks, [len(pos)]])
    return [(int(pos[s]), int(pos[e - 1]) + w) for s, e in zip(starts, ends)]


def duplicate_spans(
    ds: ray.data.Dataset,
    *,
    window: int = 32,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "broadcast",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """ExactSubstr duplicated-span REPORT (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — the
    removal-grade signal :func:`duplicate_windows` only counts): every
    maximal character span covered by ``window``-char substrings that
    occur ≥ ``min_count`` times in the corpus (in-document repeats
    included, as in the paper's self-repetition handling).

    Guarantee: any duplicated substring of length ≥ ``window`` is
    covered exactly (stride-1 windows need no alignment assumption —
    the suffix-array-free formulation); hash collisions (64-bit
    Rabin-Karp) can only ADD a span, odds ~positions²/2⁶⁴, documented
    in lieu of the paper's exact suffix array.

    Routes:
    * ``"broadcast"`` — per-batch partial hash counts → ONE grouped
      count shuffle of 16-byte partials → the ≥min_count hash set
      broadcast once → pass 2 recomputes positions ROW-LOCALLY and
      merges spans (zero further shuffle).  Right whenever the distinct
      duplicated-window set is broadcast-sized (boilerplate-heavy
      corpora: dup windows ≪ positions).
    * ``"join"`` — unbounded dup sets: positions (wh, doc, s) co-locate
      by hash (every row of a hash in one partition → the partition-
      local count IS the global count), survivors co-locate by doc for
      the span merge.  TWO shuffles, payload O(positions × 24 B) — the
      honest linear cost of exact substring dedup, analogous to the
      paper's suffix-array sort.

    Output: (doc_id:int64, start:int64, end:int64) — [start, end) char
    offsets, value-identical across routes (parity-tested) and to the
    DuckDB islands twin.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum, partitioned_map

    part_kw = {"n_parts": n_parts} if n_parts else {}

    def span_frame(ids, starts, ends) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "start": pd.Series(starts, dtype="int64"),
            "end": pd.Series(ends, dtype="int64"),
        })

    if mode == "broadcast":
        def count_partial(df: pd.DataFrame):
            hs = [
                _char_window_hashes(t, window)
                for t in df[text_col].fillna("")
            ]
            allh = (
                np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
            )
            vals, cnts = np.unique(allh, return_counts=True)
            return arrow_out(pd.DataFrame(
                {"wh": vals.view(np.int64), "cnt": cnts.astype("int64")}
            ))

        counts = grouped_sum(
            ds.select_columns([text_col]).map_batches(
                count_partial, batch_format="pandas"
            ),
            ["wh"], ["cnt"], **part_kw,
        )
        # driver-held ONLY in this route (bounded by distinct duplicated
        # windows); the join route below has no driver state
        dup_ref = ray.put(_collect_dup_hashes(counts, min_count))

        def spans_local(df: pd.DataFrame) -> pd.DataFrame:
            from pdf_parser_ray.stages import worker_state

            d = worker_state(("dup_spans", dup_ref.hex()),
                             lambda: ray.get(dup_ref))
            ids, ss, es = [], [], []
            if len(d) == 0:
                return span_frame(ids, ss, es)
            for doc, t in zip(df[id_col], df[text_col].fillna("")):
                h = _char_window_hashes(t, window)
                if len(h) == 0:
                    continue
                pos_idx = np.searchsorted(d, h)
                hit = (pos_idx < len(d)) & (d[np.minimum(pos_idx, len(d) - 1)] == h)
                pos = np.flatnonzero(hit)
                for s, e in _merge_positions(pos, window):
                    ids.append(doc); ss.append(s); es.append(e)
            return span_frame(ids, ss, es)

        return ds.select_columns([id_col, text_col]).map_batches(
            spans_local, batch_format="pandas"
        )

    # ------------------------------------------------------ join route
    def emit_positions(df: pd.DataFrame):
        whs, ids, ss = [], [], []
        for doc, t in zip(df[id_col], df[text_col].fillna("")):
            h = _char_window_hashes(t, window)
            if len(h) == 0:
                continue
            whs.append(h.view(np.int64))
            ids.append(np.full(len(h), doc, dtype=np.int64))
            ss.append(np.arange(len(h), dtype=np.int64))
        if not whs:
            return arrow_out(pd.DataFrame({
                "wh": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "s": pd.Series([], dtype="int64")}))
        return arrow_out(pd.DataFrame({
            "wh": np.concatenate(whs),
            "doc_id": np.concatenate(ids),
            "s": np.concatenate(ss)}))

    positions = ds.select_columns([id_col, text_col]).map_batches(
        emit_positions, batch_format="pandas"
    )

    def keep_dup(part: pd.DataFrame) -> pd.DataFrame:
        # every row of a hash is in this partition → local size == global
        c = part.groupby("wh")["wh"].transform("size")
        out = part[c >= min_count]
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype("int64"),
            "s": out["s"].astype("int64")})

    survivors = partitioned_map(positions, ["wh"], keep_dup, **part_kw)

    def merge_doc(part: pd.DataFrame) -> pd.DataFrame:
        ids, ss, es = [], [], []
        for doc, g in part.groupby("doc_id", sort=False):
            pos = np.sort(g["s"].to_numpy(dtype=np.int64))
            for s, e in _merge_positions(pos, window):
                ids.append(doc); ss.append(s); es.append(e)
        return span_frame(ids, ss, es)

    return partitioned_map(survivors, ["doc_id"], merge_doc, **part_kw)


def scrub_duplicate_spans(
    ds: ray.data.Dataset,
    *,
    window: int = 32,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """ExactSubstr removal: delete every duplicated span found by
    :func:`duplicate_spans` (broadcast route) from the text — the
    cleaned-corpus half of Lee et al. 2021.  Row-local pass 2 keeps the
    doc intact in one place, so surgery is a single vectorized slice
    concatenation.  Output: (doc_id, clean_text, n_removed_spans:int64,
    n_removed_chars:int64), every doc present (unscathed docs pass
    through whole).
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum

    part_kw = {"n_parts": n_parts} if n_parts else {}

    def count_partial(df: pd.DataFrame):
        hs = [
            _char_window_hashes(t, window) for t in df[text_col].fillna("")
        ]
        allh = np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
        vals, cnts = np.unique(allh, return_counts=True)
        return arrow_out(pd.DataFrame(
            {"wh": vals.view(np.int64), "cnt": cnts.astype("int64")}
        ))

    counts = grouped_sum(
        ds.select_columns([text_col]).map_batches(
            count_partial, batch_format="pandas"
        ),
        ["wh"], ["cnt"], **part_kw,
    )
    dup_ref = ray.put(_collect_dup_hashes(counts, min_count))

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        d = worker_state(("dup_spans", dup_ref.hex()),
                         lambda: ray.get(dup_ref))
        ids, texts, nsp, nch = [], [], [], []
        for doc, t in zip(df[id_col], df[text_col].fillna("")):
            h = _char_window_hashes(t, window)
            spans: list = []
            if len(h) and len(d):
                idx = np.searchsorted(d, h)
                hit = (idx < len(d)) & (d[np.minimum(idx, len(d) - 1)] == h)
                spans = _merge_positions(np.flatnonzero(hit), window)
            if spans:
                pieces, cur = [], 0
                for s, e in spans:
                    pieces.append(t[cur:s])
                    cur = e
                pieces.append(t[cur:])
                clean = "".join(pieces)
            else:
                clean = t
            ids.append(doc)
            texts.append(clean)
            nsp.append(len(spans))
            nch.append(len(t) - len(clean))
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "clean_text": pd.Series(texts, dtype="object"),
            "n_removed_spans": pd.Series(nsp, dtype="int64"),
            "n_removed_chars": pd.Series(nch, dtype="int64"),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        scrub, batch_format="pandas"
    )


def _levenshtein(a: str, b: str) -> int:
    """Plain edit distance (insert/delete/substitute, unit costs) — the
    same function DuckDB's ``levenshtein`` computes, so bucket verify
    and the SQL oracle agree exactly."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_string_pairs(
    ds: ray.data.Dataset,
    col: str,
    *,
    max_dist: int = 1,
    max_bucket: int = 1024,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Fuzzy self-join: pairs of DISTINCT ``col`` values within
    Levenshtein distance ``max_dist`` — entity resolution / typo
    clustering without the O(N²) cross join.

    SymSpell blocking: every value emits its deletion neighborhood
    (itself + all strings reachable by deleting ≤ ``max_dist`` chars);
    two values within distance d ≤ max_dist are GUARANTEED to share a
    variant (delete the edited positions from both sides), so recall is
    exactly 1.0.  One groupby(variant) shuffle at distinct-value
    cardinality; in-bucket exact verify; a (a, b) min-groupby dedupes
    candidates found via multiple shared variants.  Intended for
    short-label columns (names, codes) — the neighborhood is
    C(len, max_dist) per value, so long-text columns belong in
    minhash/simhash, not here.

    Output: (a, b, dist:int64), a < b lexicographically.
    """
    from itertools import combinations

    from ray.data.aggregate import Count, Min

    from pdf_parser_ray.ops.shuffle import grouped_map

    distinct = (
        ds.select_columns([col])
        .groupby(col)
        .aggregate(Count(alias_name="_n"))
    )

    def explode(df: pd.DataFrame) -> "object":
        import pyarrow as pa

        variants: list = []
        values: list = []
        for s in df[col]:
            if s is None:
                continue
            keys = {s}
            for d in range(1, min(max_dist, len(s)) + 1):
                for pos in combinations(range(len(s)), d):
                    drop = set(pos)
                    keys.add(
                        "".join(c for i, c in enumerate(s) if i not in drop)
                    )
            variants.extend(keys)
            values.extend([s] * len(keys))
        return pa.table(
            {"variant": pa.array(variants, pa.string()),
             "val": pa.array(values, pa.string())}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        vs = sorted(set(g["val"]))[:max_bucket]
        a_out: list = []
        b_out: list = []
        d_out: list = []
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                d = _levenshtein(vs[i], vs[j])
                if d <= max_dist:
                    a_out.append(vs[i])
                    b_out.append(vs[j])
                    d_out.append(d)
        return pd.DataFrame(
            {"a": pd.Series(a_out, dtype=str),
             "b": pd.Series(b_out, dtype=str),
             "dist": pd.Series(d_out, dtype="int64")}
        )

    exploded = distinct.map_batches(explode, batch_format="pandas")
    pairs = grouped_map(
        exploded, ["variant"], bucket_pairs, drop_singletons=True,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    from pdf_parser_ray.ops.shuffle import grouped_agg

    deduped = grouped_agg(pairs, ["a", "b"], {"dist": ("dist", "min")})

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "a": df["a"], "b": df["b"], "dist": df["dist"].astype("int64")})

    return deduped.map_batches(cast, batch_format="pandas")


def _jaro_winkler(s1: str, s2: str) -> float:
    """Textbook Jaro-Winkler (match window max(l)/2-1, half-transposition
    count, Winkler prefix boost 0.1 over ≤4 chars gated at jaro > 0.7).

    Bit-identical to DuckDB's ``jaro_winkler_similarity`` — verified by
    exact float equality over every blocked part-name pair at sf0.1 plus
    8k random fuzz strings (the one divergence found and mirrored:
    DuckDB scores two EMPTY strings 0.0, not 1.0).  That exactness is
    what lets the SQL twin share a round-6 contract.
    """
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - window), min(l2, i + window + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    half_t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                half_t += 1
            k += 1
    t = half_t // 2
    j = (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        j += prefix * 0.1 * (1.0 - j)
    return j


def jw_link_pairs(
    ds: ray.data.Dataset,
    col: str,
    *,
    threshold: float = 0.8,
    round_to: int = 6,
    max_bucket: int = 4096,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Record-linkage candidate pairs: DISTINCT ``col`` values sharing a
    blocking key (the first whitespace token) scored with Jaro-Winkler,
    kept at similarity ≥ ``threshold`` — the classic entity-resolution
    block-then-verify plan (census-style name matching), complementing
    :func:`fuzzy_string_pairs`'s edit-distance tier.

    Scale shape: ONE groupby at blocking-key cardinality (vocabulary-
    bounded, never O(rows) — the distinct pre-aggregate collapses the
    value column first); in-bucket O(b²) scoring is the standard
    blocking trade-off, capped at ``max_bucket`` values per block (a
    documented skew guard — an oversized block means the blocking key
    is too coarse, not that the engine should OOM).  Each value carries
    exactly ONE blocking key, so no cross-bucket pair dedup pass is
    needed (unlike the SymSpell neighborhood explode).

    The gate compares the UNROUNDED score (matching the SQL twin's
    WHERE on ``jaro_winkler_similarity`` itself); the emitted ``jw``
    column is rounded to ``round_to``.

    Output: (a, b, jw:float64), a < b lexicographically.
    """
    from ray.data.aggregate import Count

    from pdf_parser_ray.ops.shuffle import grouped_map

    distinct = (
        ds.select_columns([col]).groupby(col).aggregate(Count(alias_name="_n"))
    )

    def add_block(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].astype(str)
        return pd.DataFrame(
            {"val": vals, "blk": vals.str.split(" ").str[0]}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        vs = sorted(set(g["val"]))[:max_bucket]
        a_out: list = []
        b_out: list = []
        s_out: list = []
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                s = _jaro_winkler(vs[i], vs[j])
                if s >= threshold:
                    a_out.append(vs[i])
                    b_out.append(vs[j])
                    s_out.append(round(s, round_to))
        return pd.DataFrame(
            {"a": pd.Series(a_out, dtype=str),
             "b": pd.Series(b_out, dtype=str),
             "jw": pd.Series(s_out, dtype="float64")}
        )

    blocked = distinct.map_batches(add_block, batch_format="pandas")
    return grouped_map(
        blocked, ["blk"], bucket_pairs, drop_singletons=True,
        **({"n_parts": n_parts} if n_parts else {}),
    )


PAGERANK_BROADCAST_MAX_EDGES = 50_000_000


def pagerank(
    edges: ray.data.Dataset,
    *,
    src: str = "a",
    dst: str = "b",
    damping: float = 0.85,
    n_iters: int = 10,
    directed: bool = False,
    n_parts: int | None = None,
    round_iters: int | None = None,
    ranks_mode: str = "auto",
) -> ray.data.Dataset:
    """PageRank over an edge set — the canonical iterative-dataflow
    algorithm (rank mass flows along edges each round), e.g. for
    centrality inside near-dup clusters or a link graph.

    Dataflow per iteration: ONE groupby shuffle.  The edge list is
    normalized once (degree attached, MATERIALIZED — ranks and edges
    are re-consumed every round, recomputing the lineage would rescan
    the input per iteration); each round joins current ranks to edges
    by co-location (``grouped_map`` over src), emits rank/degree
    contributions, and a grouped sum + damping produces the next rank
    vector.  Undirected graphs mirror edges up front.  Ranks use the
    uniform 1/N initialization and the standard (1-d)/N teleport; with
    no dangling-node correction — every node here has degree ≥ 1 by
    construction of an edge list.

    Three rank-vector routes, sized by where the ranks can live
    (``ranks_mode``: "auto" | "driver" | "broadcast" | "distributed"):

    * **driver** — edge list ≤ 8M rows and inter-iteration rounding on:
      collapse to weighted pairs once, all mat-vecs on the driver.
    * **broadcast** — node cardinality fits a broadcast (cluster-sized
      graphs): rank vector rides driver ↔ ``ray.put`` each round, the
      contribute/grouped-sum dataflow stays distributed.
    * **distributed** — the full-web shape: ranks STAY a Dataset; each
      round is one hash join (ranks ⋈ edges on src) plus one grouped
      sum by dest — no corpus-scale state ever touches the driver.
      "auto" takes this route above ``PAGERANK_BROADCAST_MAX_EDGES``
      mirrored edges (the cheap no-extra-pass proxy for node count:
      nodes ≤ 2·edges, and a graph too big to broadcast is too big on
      either measure); parity with the broadcast form is pinned by test
      on the same rounding contract.

    Output: (node:int64, rank:float64 rounded 6), sums to ~1.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum, partitioned_map

    def mirror(df: pd.DataFrame) -> "object":
        out = pd.DataFrame(
            {"s": df[src].astype("int64"), "d": df[dst].astype("int64")}
        )
        if directed:
            return arrow_out(out)
        rev = pd.DataFrame({"s": out["d"], "d": out["s"]})
        return arrow_out(pd.concat([out, rev], ignore_index=True))

    # materialize: e feeds BOTH the degree aggregate and the union
    # below — lazy, the upstream edge build (cooccur_edges' pair
    # explosion for co-purchase graphs) would execute twice
    e = edges.select_columns([src, dst]).map_batches(
        mirror, batch_format="pandas"
    ).materialize()

    if ranks_mode == "distributed" or (
        ranks_mode == "auto" and e.count() > PAGERANK_BROADCAST_MAX_EDGES
    ):
        return _pagerank_distributed(
            e,
            damping=damping,
            n_iters=n_iters,
            n_parts=n_parts,
            round_iters=round_iters,
        )

    # Fast path (the hits_bipartite collapse): when the edge list is
    # driver-bounded AND inter-iteration rounding is on (the snapping
    # that makes summation-tree changes value-invisible), collapse the
    # mirrored edges ONCE into weighted distinct (s, d) pairs and run
    # everything else locally: degrees are the pair-weight row sums
    # (exact integers), nodes the distinct sources, and all n_iters
    # sparse mat-vecs are driver np.add.at passes.  This skips the
    # degree aggregate, the union+attach co-location shuffle, its
    # materialize, the unique() pass, and n_iters sequential Ray
    # executions (~1 s fixed cost each) — one grouped_sum pass total
    # (measured: part_pagerank 11.2 s -> 6.4 s warm at sf0.1/32 CPUs).
    # Larger graphs / round_iters=None keep the distributed loop.
    MAX_DRIVER_EDGES = 8_000_000
    if (
        ranks_mode in ("auto", "driver")
        and round_iters is not None
        and e.count() <= MAX_DRIVER_EDGES
    ):
        def pair_partial(df: pd.DataFrame) -> "object":
            g = df.groupby(["s", "d"], as_index=False).size()
            return arrow_out(g.rename(columns={"size": "w"}))

        pairs = grouped_sum(
            e.map_batches(pair_partial, batch_format="pandas"),
            ["s", "d"], ["w"],
        ).to_pandas()
        if not len(pairs):
            import pyarrow as pa

            return ray.data.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "rank": pa.array([], pa.float64())}))
        s_arr = pairs["s"].to_numpy(np.int64)
        d_arr = pairs["d"].to_numpy(np.int64)
        w = pairs["w"].to_numpy(np.float64)
        node_keys = np.unique(s_arr)
        n = len(node_keys)
        teleport = (1.0 - damping) / n
        si = np.searchsorted(node_keys, s_arr)
        di = np.searchsorted(node_keys, d_arr)
        deg_vec = np.zeros(n, dtype=np.float64)
        np.add.at(deg_vec, si, w)  # integer-valued -> exact
        wd = w / deg_vec[si]
        rank_vals = np.full(n, 1.0 / n, dtype=np.float64)
        for _ in range(n_iters):
            vec = np.zeros(n, dtype=np.float64)
            np.add.at(vec, di, rank_vals[si] * wd)
            rank_vals = np.round(teleport + damping * vec, round_iters)
        out = pd.DataFrame({"node": pd.Series(node_keys, dtype="int64")})
        out["rank"] = np.round(rank_vals, 6)
        return ray.data.from_pandas(out)

    # degree per source, attached once; the annotated edge list is the
    # loop invariant → materialize (edge-cardinality, not corpus)
    def deg_partial(df: pd.DataFrame) -> "object":
        g = df.groupby("s", as_index=False).size()
        return arrow_out(g.rename(columns={"size": "deg"}))

    deg = (
        e.map_batches(deg_partial, batch_format="pandas")
        .groupby("s")
        .aggregate(Sum("deg", alias_name="deg"))
    )

    def to_union_edges(df: pd.DataFrame) -> "object":
        return arrow_out(pd.DataFrame({
            "s": df["s"].astype("int64"),
            "d": df["d"].astype("float64"),
            "deg": pd.Series(np.nan, index=df.index, dtype="float64"),
        }))

    def to_union_deg(df: pd.DataFrame) -> "object":
        return arrow_out(pd.DataFrame({
            "s": df["s"].astype("int64"),
            "d": pd.Series(np.nan, index=df.index, dtype="float64"),
            "deg": df["deg"].astype("float64"),
        }))

    def attach(part: pd.DataFrame) -> pd.DataFrame:
        dd = part.loc[part["deg"].notna(), ["s", "deg"]]
        ed = part.loc[part["deg"].isna(), ["s", "d"]]
        out = ed.merge(dd, on="s")
        return pd.DataFrame({
            "s": out["s"].astype("int64"),
            "d": out["d"].astype("int64"),
            "deg": out["deg"].astype("int64"),
        })

    annotated = partitioned_map(
        e.map_batches(to_union_edges, batch_format="pandas").union(
            deg.map_batches(to_union_deg, batch_format="pandas")
        ),
        ["s"],
        attach,
        **({"n_parts": n_parts} if n_parts else {}),
    ).materialize()

    # unique() on an empty dataset returns None (the near_dedup_corpus
    # lesson); an empty edge set must yield an empty rank table
    nodes = annotated.unique("s") or []
    n = len(nodes)
    if n == 0:
        import pyarrow as pa

        # from_pandas drops columns of an empty frame; an explicit
        # Arrow schema keeps the (node, rank) contract
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    rank = {int(v): 1.0 / n for v in nodes}
    teleport = (1.0 - damping) / n

    node_keys = np.array(sorted(rank), dtype=np.int64)

    for _ in range(n_iters):
        # broadcast the rank VECTOR (sorted keys + values), not a dict:
        # a pandas .map(dict) pays a Python hash per edge — measured
        # 2-3 s/iteration over the 4.4M-edge co-purchase graph; the
        # searchsorted gather is one C pass.
        rank_vals = np.array([rank[int(k)] for k in node_keys],
                             dtype=np.float64)
        rank_ref = ray.put((node_keys, rank_vals))

        def contribute(df: pd.DataFrame) -> "object":
            from pdf_parser_ray.stages import worker_state

            keys, vals = worker_state(
                ("pr_ranks", rank_ref.hex()), lambda: ray.get(rank_ref)
            )
            s = df["s"].to_numpy(dtype=np.int64)
            contrib = vals[np.searchsorted(keys, s)] / df["deg"].to_numpy(
                dtype=np.float64
            )
            g = pd.DataFrame({"node": df["d"].to_numpy(), "m": contrib})
            return arrow_out(g.groupby("node", as_index=False)["m"].sum())

        # Per-iteration aggregation, size-routed.  The rank vector is
        # driver-resident by this op's contract (see Scale note), so a
        # driver-held graph (n ≤ 100k) skips the per-iteration SHUFFLE
        # entirely: each block's contribute() already pre-sums by dest
        # (≤ n rows per block), and the driver np.add.at-merges the
        # blocks×n partials — a distributed sparse mat-vec (measured
        # 23 s -> 7 s cold for the 6-round 20k-node / 4.4M-edge
        # part_pagerank at sf0.1/32 CPUs).  Bigger node sets keep the
        # co-located grouped_sum (the streaming sort-aggregate degrades
        # at high key cardinality).
        contribs = annotated.map_batches(contribute, batch_format="pandas")
        if n <= 100_000:
            parts = contribs.to_pandas()  # ≤ blocks × n rows — bounded
            vec = np.zeros(n, dtype=np.float64)
            np.add.at(
                vec,
                np.searchsorted(
                    node_keys, parts["node"].to_numpy(dtype=np.int64)
                ),
                parts["m"].to_numpy(dtype=np.float64),
            )
            sums = pd.DataFrame({"node": node_keys, "m": vec})
        else:
            sums = grouped_sum(contribs, ["node"], ["m"]).to_pandas()
        if round_iters is None:
            rank = {
                int(k): teleport + damping * float(v)
                for k, v in zip(sums["node"], sums["m"])
            }
        else:
            # Inter-iteration rounding SYNCHRONIZES the rank vector
            # across engines (the kmeans-oracle trick): summation order
            # drifts only ~1 ulp per round, so rounding to round_iters
            # decimals snaps both sides back to the identical double —
            # what makes an unrolled-CTE SQL twin value-exact.
            rank = {
                int(k): round(teleport + damping * float(v), round_iters)
                for k, v in zip(sums["node"], sums["m"])
            }

    out = pd.DataFrame({
        "node": pd.Series(sorted(rank), dtype="int64"),
    })
    out["rank"] = out["node"].map(rank).round(6)
    return ray.data.from_pandas(out)


def _pagerank_distributed(
    e: ray.data.Dataset,
    *,
    damping: float,
    n_iters: int,
    n_parts: int | None,
    round_iters: int | None,
) -> ray.data.Dataset:
    """Distributed-ranks PageRank: the full-web formulation the
    broadcast route's scale note promised.  ``e`` is the mirrored
    (s:int64, d:int64) edge Dataset, already materialized.

    Ranks are a DATASET (s, rank) end to end — nothing node- or
    edge-cardinality ever lands on the driver (the only driver scalars
    are node count n and the loop counter).  Per iteration:

    1. ``hash_join(edges+deg, ranks, on=s)`` — ONE co-location
       exchange; partitioning assumption: out-degree per source is
       bounded enough that one source's edges fit a partition (salt
       hot sources upstream if a super-node dominates).
    2. per-batch partial contribution sums by dest, then ONE
       ``grouped_sum(node)`` exchange → next rank Dataset
       (materialized: it is re-consumed by the next join).

    With ``round_iters`` set, the inter-iteration rounding snap makes
    this value-identical to the broadcast/driver routes (summation
    order drifts ~1 ulp per round, snapped away) — parity is pinned in
    tests on all three routes.
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.relational import hash_join
    from pdf_parser_ray.ops.shuffle import grouped_sum, size_parts

    def deg_partial(df: pd.DataFrame) -> "object":
        g = df.groupby("s", as_index=False).size()
        return arrow_out(g.rename(columns={"size": "deg"}))

    deg = (
        e.map_batches(deg_partial, batch_format="pandas")
        .groupby("s")
        .aggregate(Sum("deg", alias_name="deg"))
        .materialize()  # node-cardinality; consumed by join init + count
    )
    n = deg.count()
    # exchanges + per-round rank state sized to node cardinality
    # (the pointer_jump block-fragmentation lesson)
    parts_state = n_parts or size_parts(n)
    part_kw = {"n_parts": parts_state}
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    teleport = (1.0 - damping) / n
    init = 1.0 / n

    annotated = hash_join(e, deg, on=("s",)).materialize()  # (s, d, deg)

    def init_ranks(df: pd.DataFrame) -> "object":
        return arrow_out(pd.DataFrame({
            "s": df["s"].astype("int64"),
            "rank": np.full(len(df), init, dtype=np.float64)}))

    ranks = deg.map_batches(init_ranks, batch_format="pandas").materialize()

    def contribute(df: pd.DataFrame) -> "object":
        m = df["rank"].to_numpy(dtype=np.float64) / df["deg"].to_numpy(
            dtype=np.float64
        )
        g = pd.DataFrame({"node": df["d"].astype("int64"), "m": m})
        return arrow_out(g.groupby("node", as_index=False)["m"].sum())

    def update(df: pd.DataFrame) -> "object":
        r = teleport + damping * df["m"].to_numpy(dtype=np.float64)
        if round_iters is not None:
            r = np.round(r, round_iters)
        return arrow_out(pd.DataFrame({
            "s": df["node"].astype("int64"), "rank": r}))

    # Zero-contribution row per node: a DIRECTED source-only node
    # receives no mass, so rebuilding ranks from the dest-keyed sums
    # alone would drop it (and its outgoing mass) after round 1 —
    # diverging from the driver/broadcast routes, which keep every
    # source node at teleport rank.  Unioning (node, 0.0) for all of
    # ``deg`` keeps the node universe = distinct sources, identical to
    # the other routes; adding 0.0 to a real sum is IEEE-exact, so
    # undirected parity is bit-unchanged.
    def zero_contrib(df: pd.DataFrame) -> "object":
        return arrow_out(pd.DataFrame({
            "node": df["s"].astype("int64"),
            "m": np.zeros(len(df), dtype=np.float64)}))

    zeros = deg.map_batches(zero_contrib, batch_format="pandas")

    for _ in range(n_iters):
        joined = hash_join(annotated, ranks, on=("s",))
        contribs = joined.map_batches(
            contribute, batch_format="pandas"
        ).union(zeros)
        sums = grouped_sum(contribs, ["node"], ["m"], **part_kw)
        ranks = (
            sums.map_batches(update, batch_format="pandas")
            .repartition(parts_state)
            .materialize()
        )

    def finalize(df: pd.DataFrame) -> "object":
        return arrow_out(pd.DataFrame({
            "node": df["s"].astype("int64"),
            "rank": np.round(df["rank"].to_numpy(dtype=np.float64), 6)}))

    return ranks.map_batches(finalize, batch_format="pandas").sort("node")


def canonicalize_strings(
    ds: ray.data.Dataset,
    col: str,
    *,
    max_dist: int = 1,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Entity resolution end to end: cluster DISTINCT ``col`` values
    within Levenshtein ``max_dist`` (:func:`fuzzy_string_pairs` →
    :func:`connected_components`) and map every value to its cluster's
    canonical form — the lexicographically smallest member, so the
    choice is engine- and partitioning-independent.

    Node ids are fixed-key siphash int64s of the strings (collision
    odds ~2^-64 per pair at vocabulary scale; a collision could only
    merge two clusters, never corrupt values).  Every stage is bounded
    by distinct-value cardinality.  Values in no fuzzy pair map to
    themselves.

    r5 shape: distinct values come from a per-batch pre-dedupe
    (combiner) with the EXACT dedupe folded into the node co-location
    that attaches components (each value's duplicates land in one
    partition); the canonical-min and the value→canonical attach share
    ONE component co-location (min is a partition-local transform once
    a component's members are together).  The previous staging paid a
    distinct sort-aggregate, a Min sort-aggregate, a materialize and a
    second Sort for the same answer — all barrier machinery at
    distinct-value cardinality.

    Output: (value, canonical), one row per distinct value.
    """

    def h64(s: pd.Series) -> np.ndarray:
        return (
            pd.util.hash_array(s.to_numpy(dtype=object))
            .astype(np.uint64)
            .view(np.int64)
        )

    # per-batch pre-dedupe only — exact dedupe happens node-locally in
    # attach, where every copy of a value is co-located anyway
    distinct = ds.select_columns([col]).map_batches(
        lambda df: arrow_out(df.drop_duplicates(col)),
        batch_format="pandas",
    )

    pairs = fuzzy_string_pairs(ds, col, max_dist=max_dist, n_parts=n_parts)

    def pair_ids(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": h64(df["a"]), "b": h64(df["b"])})

    comp = connected_components(
        pairs.map_batches(pair_ids, batch_format="pandas"),
        **({"n_parts": n_parts} if n_parts else {}),
    )

    # (node → component) ⋈ (node → value): co-locate by node id, then
    # the canonical per component is a grouped min over member values
    def val_rows(df: pd.DataFrame) -> "object":
        return arrow_out(pd.DataFrame({
            "node": h64(df[col]),
            "value": df[col],
            "component": pd.Series(np.nan, index=df.index, dtype="float64"),
        }))

    def comp_rows(df: pd.DataFrame) -> "object":
        return arrow_out(pd.DataFrame({
            "node": df["node"].astype("int64"),
            "value": pd.Series(None, index=df.index, dtype=object),
            "component": df["component"].astype("float64"),
        }))

    from pdf_parser_ray.ops.shuffle import partitioned_map

    def attach(part: pd.DataFrame) -> pd.DataFrame:
        # every copy of a value co-locates here — this drop_duplicates
        # IS the exact distinct (the upstream map only pre-deduped)
        vals = part[part["value"].notna()][["node", "value"]] \
            .drop_duplicates("node")
        comps = part[part["component"].notna()][["node", "component"]]
        out = vals.merge(comps, on="node", how="left")
        # unpaired values: singleton component = own node
        cid = out["component"].fillna(out["node"]).astype("int64")
        return pd.DataFrame({
            "value": out["value"], "component": cid})

    labeled = partitioned_map(
        distinct.map_batches(val_rows, batch_format="pandas").union(
            comp.map_batches(comp_rows, batch_format="pandas")
        ),
        ["node"],
        attach,
        **({"n_parts": n_parts} if n_parts else {}),
    )

    def resolve(part: pd.DataFrame) -> pd.DataFrame:
        # a component's members are all here: the lexicographic-min
        # canonical is a partition-local transform — no Min aggregate,
        # no second exchange to attach it back
        can = part.groupby("component")["value"].transform("min")
        return pd.DataFrame({"value": part["value"], "canonical": can})

    return partitioned_map(
        labeled,
        ["component"],
        resolve,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def cooccur_edges(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    item_col: str,
    min_count: int = 2,
    max_items_per_group: int = 256,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Undirected co-occurrence edge list: items appearing together in
    ≥ ``min_count`` groups (part pairs sharing an order, users sharing
    a day, ...).

    Shape: per-batch (group,item) dedup -> one co-location by group ->
    vectorized C(k,2) pair emission per group (k capped at
    ``max_items_per_group`` — a mega-group would emit O(k²) rows; the
    cap keeps the explode bounded and is reported per the no-silent-cap
    rule via the dropped-group guard below) -> per-batch partial pair
    counts -> grouped sum -> threshold filter.

    Output: (a:int64, b:int64, n:int64) with a < b.
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    _EMPTY = {
        "a": pd.Series([], dtype="int64"),
        "b": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
    }

    def pair_partition(part: pd.DataFrame):
        # Vectorized ACROSS groups: one sort, then every pair of every
        # segment emitted with repeat/cumsum index arithmetic — no
        # Python call per group (group cardinality is corpus-scale).
        # Arrow out: the pair stream feeds the count shuffle and pandas
        # blocks would combine ~11x slower (io_utils.arrow_out).
        part = part[[group_col, item_col]].drop_duplicates()
        part = part.sort_values([group_col, item_col], kind="mergesort")
        gvals = part[group_col].to_numpy()
        items = part[item_col].to_numpy(dtype="int64")
        n = len(items)
        if n == 0:
            return arrow_out(pd.DataFrame(_EMPTY))
        starts = np.flatnonzero(np.r_[True, gvals[1:] != gvals[:-1]])
        sizes = np.diff(np.append(starts, n))
        # per-element pair fan-out = elements after it in its segment;
        # capped mega-groups emit nothing (documented no-silent-cap)
        seg_end = np.repeat(starts + sizes, sizes)
        rep = seg_end - 1 - np.arange(n)
        rep[np.repeat(sizes > max_items_per_group, sizes)] = 0
        total = int(rep.sum())
        if total == 0:
            return arrow_out(pd.DataFrame(_EMPTY))
        left = np.repeat(np.arange(n), rep)
        cums = np.concatenate([[0], np.cumsum(rep)[:-1]])
        within = np.arange(total) - np.repeat(cums, rep)
        right = left + within + 1
        pairs = pd.DataFrame({"a": items[left], "b": items[right]})
        g = pairs.groupby(["a", "b"], as_index=False).size()
        return arrow_out(g.rename(columns={"size": "n"}).astype({"n": "int64"}))

    def batch_dedup(df: pd.DataFrame):
        return arrow_out(df[[group_col, item_col]].drop_duplicates())

    pairs = partitioned_map(
        ds.map_batches(batch_dedup, batch_format="pandas"),
        [group_col],
        pair_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )

    # exact pair counts via a second int-keyed co-location (a direct
    # groupby([a, b]).aggregate sort-shuffles on the two-column key —
    # measured slower than hash-partition + C-speed pandas count)
    def count_partition(part: pd.DataFrame):
        g = part.groupby(["a", "b"], as_index=False)["n"].sum()
        g = g[g["n"] >= min_count]
        return arrow_out(g.astype({"n": "int64"}))

    return partitioned_map(
        pairs, ["a", "b"], count_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def clustering_coefficients(
    edges: "ray.data.Dataset",
    *,
    a_col: str = "a",
    b_col: str = "b",
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Local clustering coefficient per node — how close each node's
    neighborhood is to a clique (``lcc = 2·tri(v) / deg(v)·(deg(v)−1)``
    for deg ≥ 2): the per-node refinement of :func:`triangle_count`'s
    global statistic, the standard community-tightness signal on
    co-occurrence / near-dup graphs.

    Same node-iterator shape and broadcast contract as triangle_count
    (edges co-locate by lower endpoint; wedges probe the sorted encoded
    edge array broadcast once) — but each FOUND triangle credits all
    THREE corners, partitions emit per-node partial counts (bounded by
    node count), and degrees come straight from the driver-held edge
    list the broadcast already paid for.  The lcc float is one division
    of exact int64 products, so the DuckDB twin needs no rounding
    contract.

    Returns (node:int64, deg:int64, n_tri:int64, lcc:float64), one row
    per node with deg ≥ 2, node ascending.
    """
    import numpy as np

    from pdf_parser_ray.ops.shuffle import partitioned_map

    # materialize: consumed twice (broadcast + wedge co-location);
    # triangle_count rationale.
    eds = edges.select_columns([a_col, b_col]).materialize()
    edf = eds.to_pandas()  # bounded: thresholded graph, broadcast-sized
    cols = ["node", "deg", "n_tri", "lcc"]
    if len(edf) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="float64" if c == "lcc" else "int64")
             for c in cols}
        )
    a = edf[a_col].to_numpy(dtype="int64")
    b = edf[b_col].to_numpy(dtype="int64")
    if (a >= 2**32).any() or (b >= 2**32).any() or (a < 0).any() or (b < 0).any():
        raise ValueError("clustering_coefficients encodes node ids as uint32 pairs")
    enc = np.sort((a << np.int64(32)) | b)
    enc_ref = ray.put(enc)

    def tri_partition(part: pd.DataFrame) -> pd.DataFrame:
        ed = ray.get(enc_ref)
        part = part.sort_values([a_col, b_col], kind="mergesort")
        av = part[a_col].to_numpy(dtype="int64")
        bv = part[b_col].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, av[1:] != av[:-1]])
        sizes = np.diff(np.append(starts, len(av)))
        probes, anchors = [], []
        for s, k in zip(starts, sizes):
            if k < 2:
                continue
            nbrs = bv[s:s + k]  # sorted, all > a
            ii, jj = np.triu_indices(k, 1)
            probes.append(np.stack(
                [np.full(len(ii), av[s], dtype=np.int64), nbrs[ii], nbrs[jj]]
            ))
        hit_nodes = np.array([], dtype=np.int64)
        if probes:
            tri = np.concatenate(probes, axis=1)
            probe = (tri[1] << np.int64(32)) | tri[2]
            pos = np.minimum(np.searchsorted(ed, probe), len(ed) - 1)
            hits = ed[pos] == probe
            hit_nodes = tri[:, hits].ravel()  # every corner credited
        u, c = np.unique(hit_nodes, return_counts=True)
        return pd.DataFrame(
            {"node": u.astype("int64"), "t": c.astype("int64")}
        )

    tri_parts = partitioned_map(
        eds, [a_col], tri_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    ).to_pandas()  # bounded: <= node count x partitions touched
    if "node" not in tri_parts.columns:  # triangle-free graph
        tri_parts = pd.DataFrame(
            {"node": pd.Series([], dtype="int64"),
             "t": pd.Series([], dtype="int64")}
        )
    tri = tri_parts.groupby("node", as_index=False)["t"].sum()
    nodes, deg = np.unique(np.concatenate([a, b]), return_counts=True)
    out = pd.DataFrame(
        {"node": nodes.astype("int64"), "deg": deg.astype("int64")}
    ).merge(tri, on="node", how="left")
    out["n_tri"] = out["t"].fillna(0).astype("int64")
    out = out[out["deg"] >= 2].copy()
    out["lcc"] = (2 * out["n_tri"]).to_numpy(dtype="float64") / (
        out["deg"] * (out["deg"] - 1)
    ).to_numpy(dtype="float64")
    return out[cols].sort_values("node").reset_index(drop=True)


def triangle_count(
    edges: "ray.data.Dataset",
    *,
    a_col: str = "a",
    b_col: str = "b",
    n_parts: int | None = None,
) -> pd.DataFrame:
    """Exact triangle count over an undirected edge list (a < b per
    row, deduped) — the standard graph-health statistic for near-dup /
    co-occurrence graphs (clustering coefficient numerator).

    Node-iterator shape: edges co-locate by their LOWER endpoint; each
    node a with sorted higher-neighbors N enumerates C(|N|,2) wedges
    (b,c), b<c, vectorized, and probes (b,c) membership against the
    edge set broadcast ONCE as a sorted encoded int64 array
    (a·2³² | b — node ids must fit uint32).  Each triangle a<b<c is
    counted exactly once, at its minimum node.  Partial counts sum on
    the driver.

    The broadcast bounds this to cluster-sized edge sets (near-dup /
    thresholded co-occurrence graphs — millions of edges = 8 MB);
    beyond broadcast, replace the probe with an edge⋈wedge hash join —
    same wedge stage, one more shuffle.

    Returns a one-row DataFrame (n_edges:int64, n_triangles:int64).
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import partitioned_map

    # materialize: the edge list is consumed TWICE (driver broadcast +
    # the wedge co-location below) and its lineage — the C(k,2) pair
    # explosion + count shuffle of cooccur_edges — would re-execute in
    # full on the second consumption (measured 16 s → 9 s for
    # part_triangles at sf0.1/32 CPUs)
    eds = edges.select_columns([a_col, b_col]).materialize()
    edf = eds.to_pandas()  # bounded: thresholded graph, broadcast-sized
    n_edges = len(edf)
    if n_edges == 0:
        return pd.DataFrame({"n_edges": [0], "n_triangles": [0]}).astype("int64")
    a = edf[a_col].to_numpy(dtype="int64")
    b = edf[b_col].to_numpy(dtype="int64")
    if (a >= 2**32).any() or (b >= 2**32).any() or (a < 0).any() or (b < 0).any():
        raise ValueError("triangle_count encodes node ids as uint32 pairs")
    enc = np.sort((a << np.int64(32)) | b)
    enc_ref = ray.put(enc)

    def wedges_partition(part: pd.DataFrame) -> pd.DataFrame:
        ed = ray.get(enc_ref)
        part = part.sort_values([a_col, b_col], kind="mergesort")
        av = part[a_col].to_numpy(dtype="int64")
        bv = part[b_col].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, av[1:] != av[:-1]])
        sizes = np.diff(np.append(starts, len(av)))
        # enumerate all wedges of the partition first, probe ONCE — a
        # per-node searchsorted pays call overhead x node count
        probes = []
        for s, k in zip(starts, sizes):
            if k < 2:
                continue
            nbrs = bv[s:s + k]  # sorted, all > a
            ii, jj = np.triu_indices(k, 1)
            probes.append((nbrs[ii] << np.int64(32)) | nbrs[jj])
        total = 0
        if probes:
            probe = np.concatenate(probes)
            pos = np.searchsorted(ed, probe)
            pos = np.minimum(pos, len(ed) - 1)
            total = int((ed[pos] == probe).sum())
        return pd.DataFrame({"t": pd.Series([total], dtype="int64")})

    parts = partitioned_map(
        eds, [a_col], wedges_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    )
    tri = int(parts.sum("t") or 0)
    return pd.DataFrame(
        {"n_edges": [n_edges], "n_triangles": [tri]}
    ).astype("int64")


def clustering_coefficient(
    edges: "ray.data.Dataset",
    *,
    a_col: str = "a",
    b_col: str = "b",
    top_k: int = 20,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Per-node local clustering coefficient 2T(v) / (d(v)·(d(v)−1))
    over an undirected (a < b, deduped) edge list — the node-level
    companion of :func:`triangle_count` (how clique-like each node's
    neighborhood is; near-dup graphs use it to separate template
    boilerplate cliques from chance collisions).

    Same wedge enumeration as triangle_count, but every hit credits all
    THREE corners (vectorized bincount per partition); degrees come
    from a (node)-co-located count over both endpoints.  The
    coefficient is the exact float expression (2.0·T)/(d·(d−1.0)) —
    identical operand trees across engines, so no rounding contract.
    Nodes with d < 2 are excluded (undefined denominator).

    Output: (node:int64, n_tri:int64, degree:int64, coef:float64),
    ordered (coef DESC, node ASC), ≤ top_k rows.
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.shuffle import grouped_sum, partitioned_map

    # materialize: consumed three times (driver broadcast copy, wedge
    # co-location, degree partials) — lazy, the upstream edge build
    # (cooccur_edges' two-shuffle pair pipeline) would execute thrice
    eds = edges.select_columns([a_col, b_col]).materialize()
    edf = eds.to_pandas()  # bounded: thresholded graph (triangle_count note)
    if len(edf) == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "n_tri": pd.Series([], dtype="int64"),
                 "degree": pd.Series([], dtype="int64"),
                 "coef": pd.Series([], dtype="float64")}
            )
        )
    a = edf[a_col].to_numpy(dtype="int64")
    b = edf[b_col].to_numpy(dtype="int64")
    enc = np.sort((a << np.int64(32)) | b)
    enc_ref = ray.put(enc)

    def tri_partition(part: pd.DataFrame):
        ed = ray.get(enc_ref)
        part = part.sort_values([a_col, b_col], kind="mergesort")
        av = part[a_col].to_numpy(dtype="int64")
        bv = part[b_col].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, av[1:] != av[:-1]])
        sizes = np.diff(np.append(starts, len(av)))
        probes, wa, wb, wc = [], [], [], []
        for s, k in zip(starts, sizes):
            if k < 2:
                continue
            nbrs = bv[s:s + k]
            ii, jj = np.triu_indices(k, 1)
            probes.append((nbrs[ii] << np.int64(32)) | nbrs[jj])
            wa.append(np.full(len(ii), av[s], dtype="int64"))
            wb.append(nbrs[ii])
            wc.append(nbrs[jj])
        if not probes:
            return arrow_out(pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "n_tri": pd.Series([], dtype="int64"),
                 "degree": pd.Series([], dtype="int64")}
            ))
        probe = np.concatenate(probes)
        pos = np.minimum(np.searchsorted(ed, probe), len(ed) - 1)
        hit = ed[pos] == probe
        corners = np.concatenate(
            [np.concatenate(wa)[hit], np.concatenate(wb)[hit],
             np.concatenate(wc)[hit]]
        )
        nodes, counts = np.unique(corners, return_counts=True)
        return arrow_out(pd.DataFrame(
            {"node": nodes, "n_tri": counts.astype("int64"),
             "degree": np.zeros(len(nodes), dtype="int64")}
        ))

    def deg_partial(part: pd.DataFrame):
        both = np.concatenate(
            [part[a_col].to_numpy(dtype="int64"),
             part[b_col].to_numpy(dtype="int64")]
        )
        nodes, counts = np.unique(both, return_counts=True)
        return arrow_out(pd.DataFrame(
            {"node": nodes,
             "n_tri": np.zeros(len(nodes), dtype="int64"),
             "degree": counts.astype("int64")}
        ))

    # triangle partials (co-located wedge pass) and degree partials
    # (plain map) share one schema and ONE grouped sum — this fuses the
    # former three exchanges (tri sum, deg sum, node co-location join)
    # into a single node-keyed sum over exact int partials (r2 PLANS.md
    # outlier: 7 shuffles → 5)
    partials = partitioned_map(
        eds, [a_col], tri_partition,
        **({"n_parts": n_parts} if n_parts else {}),
    ).union(eds.map_batches(deg_partial, batch_format="pandas"))
    joined = grouped_sum(partials, ["node"], ["n_tri", "degree"])

    def coef(df: pd.DataFrame):
        df = df[df["degree"] >= 2].copy()
        d = df["degree"].astype("float64")
        df["coef"] = (2.0 * df["n_tri"].astype("float64")) / (d * (d - 1.0))
        return arrow_out(
            df[["node", "n_tri", "degree", "coef"]].astype(
                {"node": "int64", "n_tri": "int64", "degree": "int64"}
            )
        )

    return (
        joined.map_batches(coef, batch_format="pandas")
        .sort(["coef", "node"], descending=[True, False])
        .limit(top_k)
    )


def containment_pairs(
    ds: ray.data.Dataset,
    *,
    ngram: int = 3,
    n_parts: int | None = None,
) -> ray.data.Dataset:
    """Shingle-containment near-dup pairs: candidates are documents
    sharing their MINIMUM md5 shingle hash (a 1-permutation MinHash
    anchor — cheap, deterministic, and guaranteed to co-bucket exact
    and mostly-overlapping texts), scored with the asymmetric
    CONTAINMENT coefficient |A∩B| / |A| (A = the smaller doc_id's
    shingle set).  Containment, unlike Jaccard, catches a short
    document embedded inside a longer one — quote farms, boilerplate
    wrappers, page-of-pages rollups.

    ONE groupby shuffle on the anchor hash; singleton buckets are
    dropped wholesale before the per-group Python pair loop
    (``drop_singletons``).  Each row carries its deduped shingle-hash
    array into the shuffle — the documented signature-rides-along
    trade-off; at 100 TB swap the array for a second-pass hydration of
    hot buckets.  md5 shingle hashes make the DuckDB twin exact
    (same ``('0x' || substr(md5(gram),1,16))::UBIGINT`` values).

    Input columns: (doc_id, text).
    Output: (a:int64, b:int64, containment:float64) — exact ratio of
    two ints, bit-identical across engines (no rounding contract).
    """
    import hashlib

    def add_shingles(df: pd.DataFrame) -> pd.DataFrame:
        ids, anchors, sets_ = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"].fillna("")):
            grams = _word_ngrams(text, ngram)
            if not grams:
                continue  # empty docs have no shingle mass on either engine
            h = np.unique(
                np.fromiter(
                    (
                        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:16], 16)
                        for g in set(grams)
                    ),
                    dtype=np.uint64,
                    count=len(set(grams)),
                )
            )
            ids.append(int(doc_id))
            anchors.append(int(h.min()))
            sets_.append(h)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "anchor": pd.Series(anchors, dtype="uint64"),
                "shingles": pd.Series(sets_, dtype="object"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sets_ = list(g["shingles"])
        a_out, b_out, c_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = np.intersect1d(sets_[i], sets_[j], assume_unique=True)
                a_out.append(int(ids[i]))
                b_out.append(int(ids[j]))
                c_out.append(len(inter) / len(sets_[i]))
        return pd.DataFrame({"a": a_out, "b": b_out, "containment": c_out}).astype(
            {"a": "int64", "b": "int64", "containment": "float64"}
        )

    from pdf_parser_ray.ops.shuffle import grouped_map

    shingled = ds.select_columns(["doc_id", "text"]).map_batches(
        add_shingles, batch_format="pandas"
    )
    return grouped_map(
        shingled, ["anchor"], per_bucket, drop_singletons=True,
        **({"n_parts": n_parts} if n_parts else {}),
    )


def rare_token_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    max_bucket: int = 256,
    n_parts: int | None = None,
    mode: str = "broadcast",
    vocab_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """Set-similarity join with RAREST-TOKEN blocking (the prefix-
    filtering idea behind PPJoin, Xiao et al. 2008, reduced to its
    1-token prefix): candidate pairs are documents sharing their
    globally rarest token under the total order (document frequency,
    token), scored with exact distinct-token Jaccard; only pairs at or
    above ``threshold`` are emitted.

    Why it complements MinHash/containment blocking: the anchor is
    FREQUENCY-AWARE — a bucket's size is bounded by its anchor token's
    df, the MINIMUM over the doc's vocabulary, so a rare identifying
    term beats hot boilerplate.  A corpus with fully shared vocabulary
    still produces hot anchors (every blocking scheme degrades there),
    hence ``max_bucket``: buckets cap deterministically to their
    ``max_bucket`` lowest doc_ids — same rule in the SQL twin, so the
    cap is oracle-checked, not silent.

    Two routes, identical output (route parity pinned in tests):

    * ``mode="broadcast"`` (default) — the df table is VOCABULARY-
      bounded, not corpus-bounded, so: per-batch distinct (token,
      partial-df) combiners → one vocab-sized grouped sum → collect
      (guarded by ``vocab_limit``; raises with advice to use the colo
      route if exceeded) → broadcast dict → each batch picks its docs'
      (df, token)-min anchors LOCALLY and ships (anchor, doc_id, text)
      straight into ONE anchor groupby.  2 shuffles total, and the
      only one that carries text is the final bucket co-location
      (measured 13.3 s → 3.8 s at sf0.1/32 cpus vs the colo route).
    * ``mode="colo"`` — no driver-side vocabulary at any size:
      distinct (doc, token) rows → token co-location attaches df
      in-place (the group IS the df) → doc co-location picks the
      anchor → colo_join brings text back → the same anchor groupby.
      4 shuffles; the 100-TB route when the vocabulary itself is too
      large to broadcast.

    Jaccard divides the same two int64s on both engines — bit-identical,
    no rounding contract (the threshold compare sees identical values).

    Input columns: (doc_id, text).  Output: (a, b, jaccard:float64).
    """
    from pdf_parser_ray.ops.relational import colo_join
    from pdf_parser_ray.ops.shuffle import grouped_map, partitioned_map

    def explode_distinct(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(_TOKEN_PAT)
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "token": pd.Series([], dtype="object")}
            )
        out = pd.DataFrame(
            {"doc_id": df.loc[ex.index, "doc_id"].to_numpy(), "token": ex.to_numpy()}
        ).drop_duplicates()
        return out.astype({"doc_id": "int64"})

    def attach_df(part: pd.DataFrame) -> pd.DataFrame:
        # all rows of a token are in this partition: group size == df
        part = part.copy()
        part["df"] = part.groupby("token")["token"].transform("size").astype("int64")
        return part

    def pick_anchor(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["doc_id", "df", "token"])
        first = part.groupby("doc_id", sort=False).head(1)
        return pd.DataFrame(
            {"doc_id": first["doc_id"].to_numpy(),
             "anchor": first["token"].to_numpy()}
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").head(max_bucket)
        ids = g["doc_id"].to_numpy()
        sets_ = [
            set(_TOKEN_PAT.findall(str(t).lower())) for t in g["text"].fillna("")
        ]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets_[i] & sets_[j])
                union = len(sets_[i]) + len(sets_[j]) - inter
                jac = inter / union
                if jac >= threshold:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    j_out.append(jac)
        return pd.DataFrame({"a": a_out, "b": b_out, "jaccard": j_out}).astype(
            {"a": "int64", "b": "int64", "jaccard": "float64"}
        )

    kw = {"n_parts": n_parts} if n_parts else {}
    docs = ds.select_columns(["doc_id", "text"])

    if mode == "broadcast":
        from pdf_parser_ray.ops.shuffle import grouped_sum

        def df_partial(df: pd.DataFrame) -> pd.DataFrame:
            ex = explode_distinct(df)
            g = ex.groupby("token", as_index=False).size()
            return pd.DataFrame(
                {"token": g["token"], "df": g["size"].astype("int64")}
            )

        vocab = grouped_sum(
            docs.map_batches(df_partial, batch_format="pandas"),
            ["token"],
            ["df"],
            **kw,
        ).limit(vocab_limit + 1).to_pandas()
        if len(vocab) > vocab_limit:
            raise ValueError(
                f"vocabulary exceeds vocab_limit={vocab_limit}; "
                "use mode='colo' (no driver-side vocabulary)"
            )
        ref = ray.put(dict(zip(vocab["token"], vocab["df"])))

        def anchor_local(df: pd.DataFrame) -> pd.DataFrame:
            from pdf_parser_ray.stages import worker_state

            m = worker_state(("rtp_df", ref.hex()), lambda: ray.get(ref))
            ex = explode_distinct(df)
            if len(ex) == 0:
                return pd.DataFrame(
                    {
                        "anchor": pd.Series([], dtype="object"),
                        "doc_id": pd.Series([], dtype="int64"),
                        "text": pd.Series([], dtype="object"),
                    }
                )
            ex = ex.assign(df=ex["token"].map(m).astype("int64"))
            first = (
                ex.sort_values(["doc_id", "df", "token"])
                .groupby("doc_id", sort=False)
                .head(1)
            )
            texts = df.set_index("doc_id")["text"]
            return pd.DataFrame(
                {
                    "anchor": first["token"].to_numpy(),
                    "doc_id": first["doc_id"].to_numpy(),
                    "text": texts.loc[first["doc_id"]].to_numpy(),
                }
            )

        anchored = docs.map_batches(anchor_local, batch_format="pandas")
        return grouped_map(
            anchored, ["anchor"], per_bucket, drop_singletons=True, **kw
        )

    tok = docs.map_batches(explode_distinct, batch_format="pandas")
    with_df = partitioned_map(tok, ["token"], attach_df, **kw)
    anchors = partitioned_map(with_df, ["doc_id"], pick_anchor, **kw)
    joined = colo_join(
        anchors, docs, ["doc_id"], ["anchor"], ["text"], **kw
    )
    return grouped_map(joined, ["anchor"], per_bucket, drop_singletons=True, **kw)


def semdedup(
    ds: ray.data.Dataset,
    centroids,
    *,
    threshold: float = 0.4,
    round_to: int = 6,
) -> ray.data.Dataset:
    """SemDeDup-style semantic dedup (the Abbas et al. 2023 pattern,
    public): k-means-bucket the embedding space, compute pairwise
    cosine ONLY within a bucket, and drop every vector that has a
    smaller-id neighbor at/above the threshold in its bucket.

    Scale plan: assignment is row-local against broadcast centroids
    (``_assign_ids`` — direct (x−c)² float64, low-id tie-break, the
    clustering.py contract a SQL ``list_distance`` oracle matches
    bit-exactly); the ONLY shuffle is one groupby(cluster)
    co-location.  The SemDeDup trick is that k grows with N so the
    per-cluster frame stays bounded (k ≈ N/target_cluster_size at
    10^12 rows — pairwise work is (N/k)² per cluster, not N²); the
    embedding payload ships once into its cluster and survivors leave
    as bare (vec_id, cluster) rows.

    Drop rule is NOT transitive-closure (a vector is dropped iff a
    smaller-id in-cluster neighbor clears the threshold, whether or
    not that neighbor itself survives) — deterministic, partitioning-
    invariant, and exactly re-derivable in SQL.

    Output: survivors (vec_id:int64, cluster:int64).
    """
    from pdf_parser_ray.ops.clustering import _assign_ids

    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        if len(df) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "cluster": pd.Series([], dtype="int64"),
                    "embedding": pd.Series([], dtype="object"),
                }
            )
        cent = worker_state(
            ("semdedup_cent", cent_ref.hex()), lambda: ray.get(cent_ref)
        )
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy().astype("int64"),
                "cluster": _assign_ids(_emb_matrix(df["embedding"]), cent),
                "embedding": df["embedding"],
            }
        )

    assigned = ds.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pandas"
    )

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="mergesort")
        ids = g["vec_id"].to_numpy()
        mat = _emb_matrix(g["embedding"])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ mat.T) / (norms[:, None] * norms[None, :])
        # strict upper triangle: column j > row i means larger vec_id
        hit = np.triu(cos >= threshold, k=1)
        dropped = hit.any(axis=0)
        keep = g.loc[~dropped, ["vec_id", "cluster"]]
        return pd.DataFrame(
            {
                "vec_id": keep["vec_id"].to_numpy().astype("int64"),
                "cluster": keep["cluster"].to_numpy().astype("int64"),
            }
        )

    return assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pandas"
    )


def kcore_filter(
    edges: "ray.data.Dataset",
    k: int,
    *,
    rounds: int = 8,
    a_col: str = "a",
    b_col: str = "b",
) -> pd.DataFrame:
    """k-core peeling: ``rounds`` iterations of "drop every node with
    degree < k, keep edges between survivors" — the dense-community
    extractor (a near-dup or co-occurrence CLIQUE survives any k below
    its size; chains and stars peel away).  With enough rounds the
    result IS the k-core; the op is DEFINED as the fixed-round filter
    so both engines compute the identical set whether or not the graph
    has converged (the pagerank unrolled-CTE trick applied to
    peeling).

    Scale shape per round: one node-bounded degree count (per-batch
    endpoint partials → driver merge, the source_kl pattern) + one
    row-local broadcast-filter of the edge list — the edge list itself
    never leaves the cluster and is re-materialized per round to keep
    lineage flat.  Rounds are sequential by nature (each peel exposes
    new under-degree nodes).

    Returns (node:int64, deg:int64): every node of the peeled edge set
    with its degree THERE (all ≥ k once the peel has converged), node
    ascending.
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(
            np.concatenate(
                [df[a_col].to_numpy(dtype=np.int64),
                 df[b_col].to_numpy(dtype=np.int64)]
            ),
            return_counts=True,
        )
        return arrow_out(
            pd.DataFrame({"node": u.astype("int64"), "d": c.astype("int64")})
        )

    def degrees(ds: "ray.data.Dataset") -> pd.DataFrame:
        parts = ds.map_batches(deg_partial, batch_format="pandas").to_pandas()
        if "node" not in parts.columns or not len(parts):
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "d": pd.Series([], dtype="int64")}
            )
        return parts.groupby("node", as_index=False)["d"].sum()  # node-bounded

    # compact blocks once: peeling re-materializes the edge list every
    # round, and co-location upstreams leave 512 tiny blocks — 8 rounds
    # of that exhausts driver fds (plasma mmaps per object) for zero
    # parallelism gain on a broadcast-sized graph.
    cur = (
        edges.select_columns([a_col, b_col])
        .repartition(16)
        .materialize()
    )
    deg = degrees(cur)
    for _ in range(rounds):
        keep = deg.loc[deg["d"] >= k, "node"].to_numpy(dtype=np.int64)
        if len(keep) == len(deg):
            break  # fixpoint: every node qualifies, later rounds no-op
        keep.sort()
        kref = ray.put(keep)

        def filt(df: pd.DataFrame) -> pd.DataFrame:
            from pdf_parser_ray.stages import worker_state

            kp = worker_state(("kcore_keep", kref.hex()), lambda: ray.get(kref))
            if not len(kp):
                return arrow_out(df.head(0))
            ia = np.minimum(np.searchsorted(kp, df[a_col].to_numpy(np.int64)),
                            len(kp) - 1)
            ib = np.minimum(np.searchsorted(kp, df[b_col].to_numpy(np.int64)),
                            len(kp) - 1)
            m = (kp[ia] == df[a_col].to_numpy(np.int64)) & (
                kp[ib] == df[b_col].to_numpy(np.int64)
            )
            return arrow_out(df.loc[m])

        cur = cur.map_batches(filt, batch_format="pandas").materialize()
        deg = degrees(cur)
        if not len(deg):
            break
    out = deg.rename(columns={"d": "deg"})
    return (
        out.astype({"node": "int64", "deg": "int64"})
        .sort_values("node")
        .reset_index(drop=True)
    )


def hits_bipartite(
    edges: "ray.data.Dataset",
    *,
    src: str = "c",
    dst: str = "s",
    n_iters: int = 6,
    round_iters: int = 8,
) -> pd.DataFrame:
    """HITS hubs-and-authorities over a directed (bipartite) edge list
    — Kleinberg's mutual-reinforcement centrality: a good hub points at
    good authorities and vice versa.  MAX-normalized per iteration
    (score / max(score)) instead of the textbook L2: the max is a
    SELECTED element, so no cross-engine float-sum-order contract hides
    in the normalizer, and inter-iteration rounding (the pagerank /
    kmeans oracle trick) snaps both engines to the identical vector
    each round.  Edges count with multiplicity (no dedup pass — the
    twin simply omits DISTINCT), which also weights repeat
    relationships, usually what a strength signal wants.

    Scale shape per iteration: two gather-scatter halves, each ONE
    map_batches whose blocks pre-sum contributions by destination
    (≤ |side| rows per block) + a driver np.add.at merge — the
    pagerank driver-held mat-vec, bounded by the EDGE SET's node
    cardinality, never the corpus.

    Returns (kind:{'hub','auth'}, node:int64, score:float64), sorted
    (kind, node).
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out

    e = edges.select_columns([src, dst]).materialize()
    c_nodes = np.array(sorted(e.unique(src) or []), dtype=np.int64)
    s_nodes = np.array(sorted(e.unique(dst) or []), dtype=np.int64)
    if not len(c_nodes) or not len(s_nodes):
        return pd.DataFrame(
            {"kind": pd.Series([], dtype="object"),
             "node": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )

    def half_step(vec_keys, vec_vals, from_col, to_col, to_keys):
        ref = ray.put((vec_keys, vec_vals))

        def contribute(df: pd.DataFrame) -> "object":
            from pdf_parser_ray.stages import worker_state

            keys, vals = worker_state(
                ("hits_vec", ref.hex()), lambda: ray.get(ref)
            )
            v = vals[np.searchsorted(keys, df[from_col].to_numpy(np.int64))]
            g = pd.DataFrame({"node": df[to_col].to_numpy(np.int64), "m": v})
            return arrow_out(g.groupby("node", as_index=False)["m"].sum())

        parts = e.map_batches(contribute, batch_format="pandas").to_pandas()
        out = np.zeros(len(to_keys), dtype=np.float64)
        np.add.at(
            out,
            np.searchsorted(to_keys, parts["node"].to_numpy(np.int64)),
            parts["m"].to_numpy(np.float64),
        )
        return np.round(out / out.max(), round_iters)

    h = np.ones(len(c_nodes), dtype=np.float64)
    a = np.zeros(len(s_nodes), dtype=np.float64)

    # Fast path: the driver already holds per-node vectors, so when the
    # edge multiset is driver-bounded too, collapse it ONCE into weighted
    # distinct pairs (one grouped_sum pass) and run the 2×n_iters
    # mat-vec halves locally — 12 sequential Ray executions (~1 s fixed
    # cost each, 13.9 s total on the sf0.1 bench) become one (3.4 s).
    # Value-identical to the scan path: per-half sums of the same term
    # multiset, snapped by the round-8 normalization each half.  Larger
    # graphs keep the per-iteration Ray scan below.
    MAX_DRIVER_PAIRS = 2_000_000
    if e.count() <= MAX_DRIVER_PAIRS:
        from pdf_parser_ray.ops.shuffle import grouped_sum

        def pair_partial(df: pd.DataFrame) -> "object":
            from pdf_parser_ray.io_utils import arrow_out as _ao

            g = df.groupby([src, dst], as_index=False).size()
            return _ao(g.rename(columns={"size": "w"}))

        pdf = grouped_sum(
            e.map_batches(pair_partial, batch_format="pandas"),
            [src, dst], ["w"],
        ).to_pandas()
        ci = np.searchsorted(c_nodes, pdf[src].to_numpy(np.int64))
        si = np.searchsorted(s_nodes, pdf[dst].to_numpy(np.int64))
        w = pdf["w"].to_numpy(np.float64)
        for _ in range(n_iters):
            a = np.zeros(len(s_nodes), dtype=np.float64)
            np.add.at(a, si, w * h[ci])
            a = np.round(a / a.max(), round_iters)
            h = np.zeros(len(c_nodes), dtype=np.float64)
            np.add.at(h, ci, w * a[si])
            h = np.round(h / h.max(), round_iters)
    else:
        for _ in range(n_iters):
            a = half_step(c_nodes, h, src, dst, s_nodes)
            h = half_step(s_nodes, a, dst, src, c_nodes)
    return pd.DataFrame(
        {
            "kind": ["auth"] * len(s_nodes) + ["hub"] * len(c_nodes),
            "node": np.concatenate([s_nodes, c_nodes]),
            "score": np.concatenate([a, h]),
        }
    ).sort_values(["kind", "node"]).reset_index(drop=True)


def label_prop_communities(
    edges: "ray.data.Dataset",
    *,
    rounds: int = 4,
) -> pd.DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over a weighted undirected edge list (a, b, n) — the
    cheap community finder for co-purchase / co-click / near-dup
    graphs where connected components are too coarse (one giant
    component) and modularity methods too expensive.

    Deterministic synchronous variant: every round, each node adopts
    the label with the greatest incident edge weight among its
    neighbors' CURRENT labels, ties → smallest label; labels start as
    the node ids.  A FIXED round count runs on both engines, so the
    oracle twin matches converged or not (the part_kcore contract;
    synchronous LPA may oscillate on bipartite structures — parity
    still holds because both sides unroll the same rounds).

    Scale shape: the edge list arrives already collapsed to weighted
    pairs (cooccur_edges: per-group pair emission + grouped count),
    i.e. bounded by the thresholded graph, not the corpus — the
    triangle_count/pagerank broadcast contract; iteration is a
    driver-side vectorized gather over that bounded table.  All
    weights are int64 — no float contract.

    Output (driver-sized): (node:int64, community:int64) sorted by
    node.
    """
    import numpy as np

    edf = edges.to_pandas()  # bounded: thresholded graph, broadcast-sized
    und = pd.concat(
        [
            edf.rename(columns={"a": "node", "b": "nbr"}),
            edf.rename(columns={"b": "node", "a": "nbr"}),
        ],
        ignore_index=True,
    )[["node", "nbr", "n"]]
    nodes = np.unique(und["node"].to_numpy(dtype=np.int64))
    labels = pd.Series(nodes, index=nodes)  # label(v) = v
    for _ in range(rounds):
        w = pd.DataFrame(
            {
                "node": und["node"].to_numpy(dtype=np.int64),
                "lbl": labels[und["nbr"].to_numpy(dtype=np.int64)].to_numpy(),
                "n": und["n"].to_numpy(dtype=np.int64),
            }
        )
        g = w.groupby(["node", "lbl"], as_index=False)["n"].sum()
        g = g.sort_values(
            ["node", "n", "lbl"], ascending=[True, False, True]
        ).drop_duplicates("node", keep="first")
        labels = pd.Series(
            g["lbl"].to_numpy(dtype=np.int64),
            index=g["node"].to_numpy(dtype=np.int64),
        )
    return pd.DataFrame(
        {"node": labels.index.to_numpy(dtype=np.int64),
         "community": labels.to_numpy(dtype=np.int64)}
    ).sort_values("node").reset_index(drop=True)


def bfs_distances(
    edges: "ray.data.Dataset",
    sources: list[int],
    *,
    rounds: int = 4,
    n_parts: int | None = None,
    frontier_broadcast_max: int = 5_000_000,
) -> "ray.data.Dataset":
    """Distributed breadth-first distances over an undirected edge list
    (a, b): minimum hop count from any of ``sources``, capped at
    ``rounds`` hops — the Pregel superstep pattern expressed in Ray
    Data (frontier expansion per round, never the whole graph in one
    worker).

    Per round the frontier's neighbors are found by the cheaper of two
    routes, then the expanded candidates union into the known-distance
    table and a grouped min (exchange sized to the node-bounded state)
    closes the superstep:

    * **broadcast** — frontier ≤ ``frontier_broadcast_max`` rows (the
      common case: a frontier is ≤ |V|): the frontier set rides
      ``ray.put`` once and each adjacency block filters ROW-LOCALLY —
      the (edge-sized!) adjacency never re-shuffles.  Measured: the
      per-round adjacency co-location on the 4.4M-edge sf0.1
      co-purchase graph was ~25 s/round of pure exchange; this route
      runs the same superstep in ~1 s.
    * **co-location** — frontiers beyond the broadcast limit (billions
      of nodes mid-BFS on a web graph): the original
      frontier ⋈ adjacency partition shuffle.

    The per-round state (node, dist) is node-bounded — materializing it
    is the superstep barrier, NOT a corpus materialization (the
    documented exception: iterative graph state, size ≤ |V|).

    Unreached nodes are absent from the output (dist is a partial
    function, the BFS convention).  Output: (node:int64, dist:int64).
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.relational import colo_join
    from pdf_parser_ray.ops.shuffle import grouped_agg, size_parts
    from pdf_parser_ray.stages import worker_state

    def explode(df: pd.DataFrame):
        return arrow_out(
            pd.DataFrame(
                {
                    "node": np.concatenate(
                        [df["a"].to_numpy(dtype=np.int64),
                         df["b"].to_numpy(dtype=np.int64)]
                    ),
                    "nbr": np.concatenate(
                        [df["b"].to_numpy(dtype=np.int64),
                         df["a"].to_numpy(dtype=np.int64)]
                    ),
                }
            )
        )

    und = (
        edges.select_columns(["a", "b"])
        .map_batches(explode, batch_format="pandas")
        .materialize()  # reused every superstep
    )

    dist = ray.data.from_pandas(
        pd.DataFrame(
            {"node": pd.Series(sorted(set(sources)), dtype="int64"),
             "dist": pd.Series([0] * len(set(sources)), dtype="int64")}
        )
    )
    frontier = dist.select_columns(["node"])
    # state-sized exchanges: dist ≤ |V| ≤ 2·|edges| rows
    kw = {"n_parts": n_parts} if n_parts else {
        "n_parts": size_parts(und.count())
    }

    for r in range(1, rounds + 1):
        # Bounded probe, NOT take_all: limit pushdown means the driver
        # never holds more than frontier_broadcast_max + 1 rows even on
        # a web-graph frontier — deciding the route after a full
        # collection would defeat the guard (ADVICE r4).  On the small
        # branch the probe already IS the frontier, so nothing re-runs.
        f_rows = frontier.take(frontier_broadcast_max + 1)
        if len(f_rows) <= frontier_broadcast_max:
            f_arr = np.sort(np.fromiter(
                (row["node"] for row in f_rows), dtype=np.int64,
                count=len(f_rows),
            ))
            f_ref = ray.put(f_arr)

            def nbrs_local(df: pd.DataFrame, _ref=f_ref):
                fa = worker_state(
                    ("bfs_frontier", _ref.hex()), lambda: ray.get(_ref)
                )
                nodes = df["node"].to_numpy(dtype=np.int64)
                if not len(fa) or not len(nodes):
                    hit = np.zeros(len(nodes), dtype=bool)
                else:
                    pos = np.searchsorted(fa, nodes)
                    np.clip(pos, 0, len(fa) - 1, out=pos)
                    hit = fa[pos] == nodes
                return arrow_out(pd.DataFrame(
                    {"nbr": df["nbr"].to_numpy(dtype=np.int64)[hit]}
                ))

            cand_nbrs = und.map_batches(nbrs_local, batch_format="pandas")
        else:  # the over-limit web-graph route (parity-tested at max=1)
            cand_nbrs = colo_join(
                frontier, und, ["node"], [], ["nbr"], **kw
            ).select_columns(["nbr"])

        def to_dist(df: pd.DataFrame, _r=r):
            return arrow_out(
                pd.DataFrame(
                    {
                        "node": df["nbr"].to_numpy(dtype=np.int64),
                        "dist": np.full(len(df), _r, dtype=np.int64),
                    }
                )
            )

        cand = cand_nbrs.map_batches(to_dist, batch_format="pandas")
        # repartition = block coalesce (pointer_jump rationale: union
        # doubles block count per round, grouped-map outputs track
        # input blocks → geometric fragmentation without it)
        dist = grouped_agg(
            dist.union(cand), ["node"], {"dist": ("dist", "min")}, **kw
        ).repartition(kw["n_parts"]).materialize()  # superstep barrier
        frontier = dist.filter(
            expr=f"dist == {r}"
        ).select_columns(["node"])

    return dist


def pointer_jump(
    edges: "ray.data.Dataset",
    *,
    src_col: str = "node",
    dst_col: str = "ptr",
    rounds: int = 3,
    n_parts: int | None = None,
) -> "ray.data.Dataset":
    """Resolve pointer CHAINS (redirect chains, canonical-url chains,
    symlink forests) by pointer doubling: after round r every node
    points ``2^r`` hops ahead (or at its chain's terminal), so chains
    up to ``2^rounds`` long resolve in ``rounds`` co-location shuffles
    — never a per-hop walk, never the chain in one worker.

    ``edges`` is a FUNCTIONAL graph (≤1 outgoing pointer per src;
    terminals simply have no row).  Each round left-joins the pointer
    table against itself (ptr → that node's own pointer) and keeps the
    old pointer where the target is terminal.  State is node-bounded —
    the superstep materialization rule (bfs_distances rationale).

    Cycles never diverge (rounds are fixed) but land on an arbitrary
    in-cycle node — the documented convention; redirect data is
    expected to be a forest.

    Output: (src_col, final:int64) for every non-terminal node.
    """
    import numpy as np

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.relational import colo_join

    kw = {"n_parts": n_parts} if n_parts else {}

    def norm(df: pd.DataFrame):
        return arrow_out(
            pd.DataFrame(
                {
                    "node": df[src_col].to_numpy(dtype=np.int64),
                    "ptr": df[dst_col].to_numpy(dtype=np.int64),
                }
            )
        )

    ptr = edges.select_columns([src_col, dst_col]).map_batches(
        norm, batch_format="pandas"
    ).materialize()

    if not kw:
        # node-bounded per-round state: size the exchange to the data
        # (512-way machinery on a 10^4-row table is ~5x fixed cost;
        # ops/shuffle.size_parts rationale).  Explicit n_parts wins.
        from pdf_parser_ray.ops.shuffle import size_parts

        kw = {"n_parts": size_parts(ptr.count())}

    for _ in range(rounds):
        # right side re-keyed: (ptr=node, nxt=that node's pointer)
        def rekey(df: pd.DataFrame):
            return arrow_out(
                pd.DataFrame(
                    {
                        "ptr": df["node"].to_numpy(dtype=np.int64),
                        "nxt": df["ptr"].to_numpy(dtype=np.int64),
                    }
                )
            )

        right = ptr.map_batches(rekey, batch_format="pandas")
        joined = colo_join(
            ptr, right, ["ptr"], ["node"], ["nxt"], how="left", **kw
        )

        def advance(df: pd.DataFrame):
            nxt = df["nxt"]
            return arrow_out(
                pd.DataFrame(
                    {
                        "node": df["node"].to_numpy(dtype=np.int64),
                        "ptr": nxt.fillna(df["ptr"]).astype("int64").to_numpy(),
                    }
                )
            )

        # repartition (block coalesce, no shuffle): the union doubles
        # block count each round and the grouped map's output blocks
        # track its INPUT blocks, so without this the state fragments
        # geometrically (64 → 512 micro-blocks by round 3 — measured
        # 18 s for a 4k-row round) and every later stage pays
        # per-block task overhead.
        ptr = joined.map_batches(
            advance, batch_format="pandas"
        ).repartition(kw["n_parts"]).materialize()  # superstep barrier

    def out(df: pd.DataFrame):
        return arrow_out(
            pd.DataFrame(
                {
                    src_col: df["node"].to_numpy(dtype=np.int64),
                    "final": df["ptr"].to_numpy(dtype=np.int64),
                }
            )
        )

    return ptr.map_batches(out, batch_format="pandas")


def snm_candidate_pairs(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    *,
    window: int = 8,
    min_common: int = 1,
) -> ray.data.Dataset:
    """Sorted-neighborhood record linkage (Hernández & Stolfo 1995):
    sort by the blocking key, slide a ``window``-record pane, emit
    candidate pairs gated by distinct-token overlap — the sort-based
    classic next to the token-blocking tier of
    :func:`fuzzy_string_pairs`.

    Distributed shape: ONE slim (key, id) sort — the algorithm's
    inherent shuffle — materialized once; within-block pairs come from
    vectorized shifted frames (batch == sorted block), and the
    cross-block pane positions are reconstructed EXACTLY at the driver
    from each block's first/last ``window−1`` rows + block length
    (bounded: blocks × 2(window−1) rows).  Blocks shorter than the pane
    are fully contained in that edge sample, so multi-block chains
    resolve exactly too.  Total order (key, id) makes block key ranges
    disjoint and the pane deterministic under any partitioning.

    Output: (id_a, id_b:int64 — pane order, rank_a < rank_b;
    n_common:int64 ≥ ``min_common`` distinct shared ``' '``-split
    tokens, the ``list_intersect`` contract of the SQL twin).
    """
    slim = (
        ds.select_columns([key_col, id_col])
        .sort([key_col, id_col])
        .materialize()  # reused by both passes; key+id columns only
    )
    w = window

    def toks(keys: "list[str]") -> "list[set]":
        return [set(("" if k is None else k).split(" ")) for k in keys]

    def within(df: pd.DataFrame) -> pa.Table:
        keys = df[key_col].tolist()
        ids = df[id_col].to_numpy(dtype=np.int64)
        ts = toks(keys)
        n = len(df)
        frames = []
        for d in range(1, w):
            if d >= n:
                break
            common = np.fromiter(
                (len(ts[i] & ts[i + d]) for i in range(n - d)),
                dtype=np.int64,
                count=n - d,
            )
            m = common >= min_common
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": ids[: n - d][m],
                        "id_b": ids[d:][m],
                        "n_common": common[m],
                    }
                )
            )
        out = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "n_common": pd.Series([], dtype="int64"),
                }
            )
        )
        return arrow_out(out)

    pairs_within = slim.map_batches(
        within, batch_format="pandas", batch_size=None
    )

    def edges(df: pd.DataFrame) -> pa.Table:
        import uuid

        n = len(df)
        off = np.arange(n)
        keep = (off < w - 1) | (off >= n - (w - 1))
        out = pd.DataFrame(
            {
                "block": uuid.uuid4().hex,
                "n": np.int64(n),
                "off": off[keep],
                "key": df[key_col].to_numpy()[keep],
                "id": df[id_col].to_numpy(dtype=np.int64)[keep],
            }
        )
        return arrow_out(out)

    edf = (
        slim.map_batches(edges, batch_format="pandas", batch_size=None)
        .to_pandas()  # bounded: blocks × 2(window−1) rows
    )
    cross = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "n_common": pd.Series([], dtype="int64"),
        }
    )
    if len(edf):
        # global ranks: blocks ordered by their minimum (key, id)
        # block order = order of each block's FIRST sorted row (off == 0)
        # — tuple (key, id) order; independent min(key), min(id) would
        # misorder blocks that share boundary keys
        starts = (
            edf[edf["off"] == 0]
            .rename(columns={"key": "key0", "id": "id0"})
            .loc[:, ["block", "n", "key0", "id0"]]
            .sort_values(["key0", "id0"])
            .reset_index(drop=True)
        )
        starts["start"] = starts["n"].cumsum() - starts["n"]
        base = dict(zip(starts["block"], starts["start"]))
        edf = edf.assign(rank=[base[b] for b in edf["block"]] + edf["off"])
        edf = edf.sort_values("rank").reset_index(drop=True)
        ts = toks(edf["key"].tolist())
        ranks = edf["rank"].to_numpy()
        blocks = edf["block"].to_numpy()
        ids = edf["id"].to_numpy(dtype=np.int64)
        rows = []
        for i in range(len(edf)):
            j = i + 1
            while j < len(edf) and ranks[j] - ranks[i] < w:
                if blocks[j] != blocks[i]:
                    c = len(ts[i] & ts[j])
                    if c >= min_common:
                        rows.append((ids[i], ids[j], c))
                j += 1
        if rows:
            cross = pd.DataFrame(
                rows, columns=["id_a", "id_b", "n_common"]
            ).astype("int64")

    import pyarrow as _pa

    return pairs_within.union(
        ray.data.from_arrow(_pa.Table.from_pandas(cross, preserve_index=False))
    )


# --------------------------------------------------- content-defined chunking

# 256-entry gear table, frozen via the legacy RandomState byte stream
# (guaranteed stable across numpy versions) — both the vectorized and
# the serial-reference hash read this exact table.
_GEAR = np.frombuffer(
    np.random.RandomState(0x9E3779B9 & 0x7FFFFFFF).bytes(256 * 8),
    dtype=np.uint64,
).copy()


def _gear_hashes(data: np.ndarray) -> np.ndarray:
    """Gear rolling hash at every byte position (FastCDC, Xia et al.,
    USENIX ATC 2016): h_i = Σ_{j=0..63} gear[b_{i-j}] << j mod 2^64 —
    the serial ``h = (h << 1) + gear[b]`` recurrence computed as 64
    vectorized shifted adds instead of a per-byte Python loop."""
    g = _GEAR[data]
    n = len(g)
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(min(64, n)):
            h[j:] += g[: n - j] << np.uint64(j)
    return h


def fastcdc_boundaries(
    data: bytes,
    *,
    min_size: int = 256,
    normal_size: int = 1024,
    max_size: int = 4096,
) -> "list[int]":
    """FastCDC chunk boundaries with normalized chunking: a STRICT mask
    before ``normal_size`` (harder to match → pushes cuts toward the
    target) and an EASY mask after (guarantees cuts well before
    ``max_size``), hard cut at ``max_size``.  Returns end offsets
    (exclusive), last == len(data).

    The candidate positions for each mask are precomputed vectorized
    (they are ~1/2^bits sparse); the walk visits one candidate lookup
    per CHUNK via searchsorted, not one per byte.
    """
    if min_size < 64:
        # _gear_hashes uses one GLOBAL 64-bit rolling recurrence; prior-
        # chunk bytes only shift out of the hash after 64 positions, so
        # per-chunk-restart FastCDC semantics hold ONLY when every chunk
        # start is ≥64 bytes from the previous boundary.
        raise ValueError(f"min_size must be >= 64 (got {min_size})")
    n = len(data)
    if n == 0:
        return []
    bits = max(1, int(normal_size).bit_length() - 1)
    mask_s = np.uint64((1 << (bits + 2)) - 1)  # strict: bits+2 zeros
    mask_l = np.uint64((1 << (bits - 2)) - 1)  # easy: bits-2 zeros
    h = _gear_hashes(np.frombuffer(data, dtype=np.uint8))
    cand_s = np.nonzero((h & mask_s) == 0)[0]  # cut AFTER this byte
    cand_l = np.nonzero((h & mask_l) == 0)[0]
    out: list[int] = []
    cur = 0
    while cur < n:
        if n - cur <= min_size:
            out.append(n)
            break
        lo = cur + min_size - 1          # earliest byte a cut may follow
        mid = min(cur + normal_size - 1, n - 1)
        hi = min(cur + max_size - 1, n - 1)
        cut = -1
        i = np.searchsorted(cand_s, lo)
        if i < len(cand_s) and cand_s[i] < mid:
            cut = int(cand_s[i])
        else:
            i = np.searchsorted(cand_l, mid)
            if i < len(cand_l) and cand_l[i] < hi:
                cut = int(cand_l[i])
        end = cut + 1 if cut >= 0 else min(cur + max_size, n)
        out.append(end)
        cur = end
    return out


def cdc_chunk_batch(
    df: pd.DataFrame,
    *,
    bytes_col: str = "payload",
    id_col: str = "url",
    min_size: int = 256,
    normal_size: int = 1024,
    max_size: int = 4096,
) -> pd.DataFrame:
    """Explode each binary payload into content-defined chunks — the
    storage-dedup primitive (identical regions chunk identically even
    when shifted by inserts, which fixed-size blocking cannot do).
    Row-local ``map_batches`` stage; downstream dedup is one uniform
    hash-key rollup over (chunk_hash, n_bytes) pairs, payloads never
    shuffle.

    Output: one row per chunk — (id_col, chunk_idx:int64,
    offset:int64, n_bytes:int64, chunk_hash:string md5-hex).
    """
    ids: list = []
    idxs: list = []
    offs: list = []
    lens: list = []
    hashes: list = []
    for rid, payload in zip(df[id_col], df[bytes_col]):
        b = bytes(payload) if payload is not None else b""
        prev = 0
        for k, end in enumerate(
            fastcdc_boundaries(
                b,
                min_size=min_size,
                normal_size=normal_size,
                max_size=max_size,
            )
        ):
            ids.append(rid)
            idxs.append(k)
            offs.append(prev)
            lens.append(end - prev)
            hashes.append(hashlib.md5(b[prev:end]).hexdigest())
            prev = end
    return pd.DataFrame(
        {
            id_col: pd.Series(ids, dtype="object"),
            "chunk_idx": pd.Series(idxs, dtype="int64"),
            "offset": pd.Series(offs, dtype="int64"),
            "n_bytes": pd.Series(lens, dtype="int64"),
            "chunk_hash": pd.Series(hashes, dtype="object"),
        }
    )


def cdc_dedup_stats(
    ds: ray.data.Dataset,
    *,
    bytes_col: str = "payload",
    id_col: str = "url",
    **chunk_kw,
) -> pd.DataFrame:
    """Corpus-wide content-defined dedup readout: how many bytes would
    a chunk store keep?  Per-batch chunking + LOCAL (hash → bytes,
    count) rollup, ONE uniform-key co-location on chunk_hash, driver
    finish on four scalars.

    Output (eager, one row): (n_chunks, n_unique, bytes_total,
    bytes_unique:int64, dedup_ratio:float64 = bytes_total/bytes_unique,
    unrounded per-row-ratio contract)."""
    from pdf_parser_ray.ops.shuffle import grouped_agg

    def partial(df: pd.DataFrame):
        c = cdc_chunk_batch(
            df, bytes_col=bytes_col, id_col=id_col, **chunk_kw
        )
        g = c.groupby("chunk_hash", as_index=False).agg(
            n=("n_bytes", "size"), b=("n_bytes", "first")
        )
        return arrow_out(g.astype({"n": "int64", "b": "int64"}))

    per_hash = grouped_agg(
        ds.select_columns([id_col, bytes_col]).map_batches(
            partial, batch_format="pandas"
        ),
        ["chunk_hash"],
        {"n": ("n", "sum"), "b": ("b", "first")},
    )

    # the distinct-chunk table is CORPUS-sized — reduce it to four
    # scalars per partition before anything reaches the driver
    def reduce_part(df: pd.DataFrame):
        return arrow_out(
            pd.DataFrame(
                {
                    "n_chunks": [int(df["n"].sum())],
                    "n_unique": [len(df)],
                    "bytes_total": [int((df["n"] * df["b"]).sum())],
                    "bytes_unique": [int(df["b"].sum())],
                }
            ).astype("int64")
        )

    parts = per_hash.map_batches(reduce_part, batch_format="pandas").to_pandas()
    n_chunks = int(parts["n_chunks"].sum())
    n_unique = int(parts["n_unique"].sum())
    bytes_total = int(parts["bytes_total"].sum())
    bytes_unique = int(parts["bytes_unique"].sum())
    ratio = bytes_total / bytes_unique if bytes_unique else float("nan")
    return pd.DataFrame(
        {
            "n_chunks": pd.Series([n_chunks], dtype="int64"),
            "n_unique": pd.Series([n_unique], dtype="int64"),
            "bytes_total": pd.Series([bytes_total], dtype="int64"),
            "bytes_unique": pd.Series([bytes_unique], dtype="int64"),
            "dedup_ratio": pd.Series([ratio], dtype="float64"),
        }
    )


def rolling_cdc_boundaries(
    text: str,
    *,
    window: int = 16,
    min_size: int = 32,
    max_size: int = 256,
    mod: int = 512,
    thr: int = 4,
) -> "list[int]":
    """Content-defined chunk END offsets over CHARACTERS using the
    repo's shared Rabin-Karp window hash (:func:`_char_window_hashes`,
    base 1000003 over code points) as the boundary test: a chunk may
    end at char offset ``e`` iff the hash of window [e-window, e)
    satisfies ``h % mod < thr`` (cut probability thr/mod).  The walk is
    the classic CDC recurrence — smallest eligible end in
    [cur+min_size, cur+max_size-1], hard cut at cur+max_size.

    This is the SQL-DERIVABLE sibling of :func:`fastcdc_boundaries`
    (same dataflow, deterministic hash DuckDB re-derives from the
    ExactSubstr precomputed-powers tree + a recursive-CTE walk —
    queries.py q:cdc_chunks); the gear-hash tier stays the
    bytes-domain scale path, serial-reference-pinned in tests.
    Returns end offsets (exclusive), last == len(text); [] for "".
    """
    n = len(text)
    if n == 0:
        return []
    h = _char_window_hashes(text, window)  # index s → window [s, s+w)
    elig = np.flatnonzero(h % np.uint64(mod) < np.uint64(thr)) + window
    out: list[int] = []
    cur = 0
    while True:
        if n - cur <= min_size:
            out.append(n)
            break
        lo, hi = cur + min_size, min(cur + max_size - 1, n)
        i = int(np.searchsorted(elig, lo))
        if i < len(elig) and elig[i] <= hi:
            end = int(elig[i])
        else:
            end = min(cur + max_size, n)
        out.append(end)
        cur = end
        if cur >= n:
            break
    return out


def rolling_cdc_chunk_batch(
    df: pd.DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    **cdc_kw,
) -> pd.DataFrame:
    """Explode each text into rolling-hash content-defined chunks — the
    character-domain, SQL-oracled sibling of :func:`cdc_chunk_batch`.

    Output: (id_col:int64, chunk_idx:int64, offset:int64,
    n_chars:int64, chunk_hash:string md5-hex of the chunk text)."""
    ids: list = []
    idxs: list = []
    offs: list = []
    lens: list = []
    hashes: list = []
    for rid, text in zip(df[id_col], df[text_col].fillna("")):
        prev = 0
        for k, end in enumerate(rolling_cdc_boundaries(text, **cdc_kw)):
            ids.append(rid)
            idxs.append(k)
            offs.append(prev)
            lens.append(end - prev)
            hashes.append(hashlib.md5(text[prev:end].encode()).hexdigest())
            prev = end
    return pd.DataFrame(
        {
            id_col: pd.Series(ids, dtype="int64"),
            "chunk_idx": pd.Series(idxs, dtype="int64"),
            "offset": pd.Series(offs, dtype="int64"),
            "n_chars": pd.Series(lens, dtype="int64"),
            "chunk_hash": pd.Series(hashes, dtype="object"),
        }
    )


def rolling_cdc_dedup_stats(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    **cdc_kw,
) -> pd.DataFrame:
    """Corpus dedup readout over rolling-hash CDC chunks — same
    dataflow as :func:`cdc_dedup_stats` (per-batch chunk + local
    rollup, ONE uniform chunk-hash co-location, scalar partials to the
    driver), char-counted and value-oracled.

    Output (eager, one row): (n_chunks, n_unique, chars_total,
    chars_unique:int64, dedup_ratio:float64)."""
    from pdf_parser_ray.ops.shuffle import grouped_agg

    def partial(df: pd.DataFrame):
        c = rolling_cdc_chunk_batch(
            df, text_col=text_col, id_col=id_col, **cdc_kw
        )
        g = c.groupby("chunk_hash", as_index=False).agg(
            n=("n_chars", "size"), b=("n_chars", "first")
        )
        return arrow_out(g.astype({"n": "int64", "b": "int64"}))

    per_hash = grouped_agg(
        ds.select_columns([id_col, text_col]).map_batches(
            partial, batch_format="pandas"
        ),
        ["chunk_hash"],
        {"n": ("n", "sum"), "b": ("b", "first")},
    )

    def reduce_part(df: pd.DataFrame):
        return arrow_out(
            pd.DataFrame(
                {
                    "n_chunks": [int(df["n"].sum())],
                    "n_unique": [len(df)],
                    "chars_total": [int((df["n"] * df["b"]).sum())],
                    "chars_unique": [int(df["b"].sum())],
                }
            ).astype("int64")
        )

    parts = per_hash.map_batches(reduce_part, batch_format="pandas").to_pandas()
    n_chunks = int(parts["n_chunks"].sum())
    n_unique = int(parts["n_unique"].sum())
    chars_total = int(parts["chars_total"].sum())
    chars_unique = int(parts["chars_unique"].sum())
    ratio = chars_total / chars_unique if chars_unique else float("nan")
    return pd.DataFrame(
        {
            "n_chunks": pd.Series([n_chunks], dtype="int64"),
            "n_unique": pd.Series([n_unique], dtype="int64"),
            "chars_total": pd.Series([chars_total], dtype="int64"),
            "chars_unique": pd.Series([chars_unique], dtype="int64"),
            "dedup_ratio": pd.Series([ratio], dtype="float64"),
        }
    )


def lsh_band_plan(
    *,
    n_perm: int = 128,
    threshold_permille: int = 700,
) -> pd.DataFrame:
    """MinHash-LSH band planner — the closed-form S-curve analysis that
    picks (bands, rows_per_band) before :func:`minhash_lsh_pairs` runs
    (Leskovec-Rajaraman-Ullman, Mining of Massive Datasets §3.4): for
    every factorization n_perm = b·r, the probability a pair with
    Jaccard s shares ≥ 1 band bucket is 1 − (1 − s^r)^b.

    Emits one row per factorization with the curve evaluated at the
    target threshold and ±0.1 around it (false-positive mass below,
    false-negative mass above), the threshold approximation
    (1/b)^(1/r), and ``chosen`` marking the b whose approximation sits
    closest to the target — pure float math on identical literal
    operands, shared with the SQL twin expression for expression.

    Output: (bands, rows_per_band:int64, approx_threshold,
    p_at_target, p_minus, p_plus:float64, chosen:bool).
    """
    t = threshold_permille / 1000.0
    rows = []
    for b in range(1, n_perm + 1):
        if n_perm % b:
            continue
        r = n_perm // b
        approx = (1.0 / b) ** (1.0 / r)

        def p(s: float, b=b, r=r) -> float:
            return 1.0 - (1.0 - s**r) ** b

        rows.append((b, r, approx, p(t), p(t - 0.1), p(t + 0.1)))
    out = pd.DataFrame(
        rows,
        columns=[
            "bands", "rows_per_band", "approx_threshold",
            "p_at_target", "p_minus", "p_plus",
        ],
    ).astype({"bands": "int64", "rows_per_band": "int64"})
    gap = (out["approx_threshold"] - t).abs()
    # closest approximation; bands ASC tie-break
    best = out.loc[gap == gap.min(), "bands"].min()
    out["chosen"] = out["bands"] == best
    return out
