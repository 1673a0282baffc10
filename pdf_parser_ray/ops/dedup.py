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

_WS = re.compile(r"\s+", re.ASCII)  # RE2-aligned, see ops.text_stats

MERSENNE = np.uint64((1 << 61) - 1)
MAX_BUCKET = 64  # skew guard: max docs considered per LSH bucket


# ---------------------------------------------------------------- exact

def exact_hash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """Partial stage: (text_hash, doc_id) with per-batch min-combine."""
    norm = df["text"].fillna("").str.lower().str.replace(_WS, " ", regex=True).str.strip(" ")
    h = norm.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
    out = pd.DataFrame({"text_hash": h, "doc_id": df["doc_id"]})
    # pre-aggregate inside the batch before the global shuffle
    return out.groupby("text_hash", as_index=False)["doc_id"].min()


def exact_dedup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """One surviving doc_id (the min) per normalized-text hash.

    Mirrors reference-D5's keep-first semantics at corpus scale
    (SURVEY.md §2.7); SQL oracle: GROUP BY md5(normalized) → min(doc_id).
    """
    from ray.data.aggregate import Min

    partial = ds.map_batches(exact_hash_batch, batch_format="pandas")
    return partial.groupby("text_hash").aggregate(Min("doc_id", alias_name="doc_id"))


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


# ---------------------------------------------------------------- minhash

class MinHasher:
    """Stateful signature stage: permutation coefficients built once
    per actor (seeded, identical on every worker)."""

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 1337):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.ngram)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal hashing mod Mersenne prime
            v = (self.a[:, None] * h[None, :] + self.b[:, None]) % MERSENNE
        return v.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in df["text"].fillna("")]
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "sig": [s.tobytes() for s in sigs]}
        )


def _explode_bands(df: pd.DataFrame, bands: int, rows_per_band: int) -> pd.DataFrame:
    out_band, out_hash, out_doc, out_sig = [], [], [], []
    for doc_id, sig in zip(df["doc_id"], df["sig"]):
        arr = np.frombuffer(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = arr[b * rows_per_band : (b + 1) * rows_per_band]
            out_band.append(b)
            out_hash.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
            out_doc.append(doc_id)
            out_sig.append(sig)
    return pd.DataFrame(
        {"band_id": out_band, "band_hash": out_hash, "doc_id": out_doc, "sig": out_sig}
    )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    Output: (a:int64, b:int64, est_jaccard:float64), a < b, deduped.
    Partitioning: the only all-to-all is groupby(band_id, band_hash);
    band hashes of non-near-dup docs are uniform → no skew except true
    duplicate clusters, which MAX_BUCKET caps (logged in docstring:
    capped buckets under-report pairs inside giant duplicate cliques —
    by then one exemplar pair is enough to mark the clique).
    """
    rows_per_band = num_perm // bands

    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pandas",
        concurrency=concurrency,
    )
    exploded = sigs.map_batches(
        _explode_bands,
        fn_kwargs={"bands": bands, "rows_per_band": rows_per_band},
        batch_format="pandas",
    )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []}).astype(
                {"a": "int64", "b": "int64", "est_jaccard": "float64"}
            )
        g = g.sort_values("doc_id").head(MAX_BUCKET)
        ids = g["doc_id"].to_numpy()
        sig_mat = np.vstack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
        a_out, b_out, est = [], [], []
        for i in range(len(ids)):
            eq = (sig_mat[i + 1 :] == sig_mat[i]).mean(axis=1)
            for j, e in enumerate(eq, start=i + 1):
                if e >= threshold:
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    est.append(float(e))
        return pd.DataFrame({"a": a_out, "b": b_out, "est_jaccard": est}).astype(
            {"a": "int64", "b": "int64", "est_jaccard": "float64"}
        )

    pairs = exploded.groupby(["band_id", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas"
    )
    # A pair can surface from several bands → keep one row (max estimate).
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


# ---------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash per doc (token crc32 bit-vote), one map_batches."""

    def __init__(self, ngram: int = 1):
        self.ngram = ngram

    def simhash(self, text: str) -> int:
        toks = _WS.split(text.lower().strip())
        toks = [t for t in toks if t]
        if not toks:
            return 0
        h = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) for t in toks),
            dtype=np.uint64,
            count=len(toks),
        )
        # widen to 64 bits by mixing crc with itself shifted
        h = h | (h << np.uint64(32))
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
        sigs = np.array(
            [self.simhash(t) for t in df["text"].fillna("")], dtype=np.uint64
        ).view(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": sigs})


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.9,
    round_to: int = 6,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    Exact variant: the full (vec_id, matrix) is broadcast once via
    ``ray.put`` and every batch does one float64 matmul against it —
    correct and oracle-checkable at driver scale (N ≤ ~1M rows,
    N×dim×8 bytes broadcast).  At 10^12 rows swap the broadcast for the
    LSH bucket route (:func:`pdf_parser_ray.ops.similarity.lsh_knn`'s
    ``_Bucketer`` + per-bucket pairwise), which bounds the pairwise work
    to bucket-local comparisons.

    Output: (a:int64, b:int64, cosine:float64 rounded to ``round_to``).
    """
    import ray as _ray

    all_df = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = all_df["vec_id"].to_numpy().astype("int64")
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in all_df["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    ref = _ray.put((ids, mat, norms))

    class PairFinder:
        def __init__(self) -> None:
            self.ids, self.mat, self.norms = _ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in df["embedding"]]
            )
            row_ids = df["vec_id"].to_numpy().astype("int64")
            rnorms = np.linalg.norm(rows, axis=1)
            rnorms[rnorms == 0] = 1.0
            cos = (rows @ self.mat.T) / (rnorms[:, None] * self.norms[None, :])
            a_out, b_out, c_out = [], [], []
            for i, rid in enumerate(row_ids):
                mask = (cos[i] >= threshold) & (self.ids > rid)
                for j in np.nonzero(mask)[0]:
                    a_out.append(rid)
                    b_out.append(int(self.ids[j]))
                    c_out.append(round(float(cos[i, j]), round_to))
            return pd.DataFrame({"a": a_out, "b": b_out, "cosine": c_out}).astype(
                {"a": "int64", "b": "int64", "cosine": "float64"}
            )

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        PairFinder, batch_format="pandas", concurrency=(1, 8)
    )


def simhash_groups(
    ds: ray.data.Dataset, concurrency: int | tuple[int, int] = (1, 8)
) -> ray.data.Dataset:
    """Groups of docs with IDENTICAL simhash (strict near-dup tier).

    Output: (simhash:uint64, n_docs:int64, min_doc_id:int64), n_docs > 1.
    Hamming-distance buckets (4×16-bit bands) are the scale-out variant —
    compose ``SimHasher`` with the LSH band explode above.
    """
    from ray.data.aggregate import Count, Min

    sigs = ds.map_batches(SimHasher, batch_format="pandas", concurrency=concurrency)
    grouped = sigs.groupby("simhash").aggregate(
        Count(alias_name="n_docs"), Min("doc_id", alias_name="min_doc_id")
    )
    return grouped.map_batches(
        lambda df: df[df["n_docs"] > 1], batch_format="pandas"
    )
