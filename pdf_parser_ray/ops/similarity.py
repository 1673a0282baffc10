"""Similarity search over an embedding column (list<float>).

* ``knn_brute_force`` — the correctness baseline: per-batch numpy matmul
  against a broadcast query matrix (``ray.put`` once, read per task),
  per-batch partial top-k, tiny final top-k.  No shuffle at all.
* ``lsh_knn`` — the scale path: random-hyperplane bucket codes; only the
  query's bucket (plus optional neighbor probes) is scanned.  At 10^12
  rows the bucket column becomes the partition key so a query touches a
  handful of partitions instead of the whole corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _to_matrix(col: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def _batch_topk(
    df: pd.DataFrame, *, query_ref, k: int, round_to: int | None = None
) -> pd.DataFrame:
    """Partial top-k per batch against a broadcast query vector.

    Task-mode stage: the query is ``ray.put`` once on the driver; the
    normalized copy is cached per worker process via ``worker_state``
    (the plasma fetch itself is a zero-copy local read after the first
    task on a node).  ``round_to`` rounds the cosine BEFORE the top-k
    selection so the (cosine DESC, vec_id ASC) tie-break operates on the
    same values the final sort (and a SQL oracle ordering by the rounded
    alias) sees — otherwise neighbors differing only past the rounding
    digit can be selected/ordered differently at the k boundary.
    """
    from pdf_parser_ray.stages import worker_state

    def _build():
        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        return q / np.linalg.norm(q)

    if len(df) == 0:  # typed empty → stable block schema downstream
        return pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    qn = worker_state(("knn_qn", query_ref.hex()), _build)
    mat = _to_matrix(df["embedding"])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    cos = (mat @ qn) / norms
    if round_to is not None:
        cos = np.round(cos, round_to)
    k = min(k, len(df))
    # lexsort: primary -cosine, tie-break vec_id ascending
    vec_ids = df["vec_id"].to_numpy()
    idx = np.lexsort((vec_ids, -cos))[:k]
    return pd.DataFrame(
        {
            "vec_id": vec_ids[idx],
            "cosine": cos[idx].astype("float64"),
        }
    )


def knn_brute_force(
    ds: ray.data.Dataset,
    query_vec,
    k: int = 10,
    *,
    exclude_vec_id: int | None = None,
    round_to: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Exact cosine top-k: partial top-k per batch → global sort-limit.

    The final sort runs over ≤ k·num_batches rows — tiny.  Deterministic
    tie-break: (-cosine, vec_id), computed on the ``round_to``-rounded
    cosine when given (matching a SQL oracle that orders by the rounded
    alias).  Runs as a task pool (state is one broadcast vector —
    worker_state-cached), which skips the per-execution actor-pool ramp;
    ``concurrency`` survives as an optional max-concurrent-tasks cap.
    """
    query_ref = ray.put(np.asarray(query_vec, dtype=np.float64))
    if exclude_vec_id is not None:
        # vectorized Arrow predicate — per-row ds.filter(fn) is a scale
        # pitfall, and pyarrow keeps empty result blocks cheap to size
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t, _x=exclude_vec_id: t.filter(pc.not_equal(t.column("vec_id"), _x)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    partial = ds.map_batches(
        _batch_topk,
        fn_kwargs={"query_ref": query_ref, "k": k, "round_to": round_to},
        batch_format="pandas",
        **_task_kwargs(concurrency),
    )
    return partial.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)


def _task_kwargs(concurrency) -> dict:
    from pdf_parser_ray.stages import task_kwargs

    return task_kwargs(concurrency)


def embedding_centroids(
    ds: ray.data.Dataset, group_col: str = "grp", *, round_to: int = 6
) -> ray.data.Dataset:
    """Per-group mean embedding, emitted LONG — (grp, dim, centroid) —
    so the result is flat-typed and oracle-comparable.

    Per-batch numpy column sums + counts are the combiner; the shuffle
    moves O(groups × dims × batches) partial rows.  Centroid = rounded
    sum/count (cross-row aggregate → rounded on both sides per the
    driver-contract convention).
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for g, sub in df.groupby(group_col):
            mat = _to_matrix(sub["embedding"])
            frames.append(
                pd.DataFrame(
                    {
                        group_col: np.full(mat.shape[1], g),
                        "dim": np.arange(mat.shape[1], dtype="int64"),
                        "s": mat.sum(axis=0),
                        "c": np.full(mat.shape[1], len(sub), dtype="int64"),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([group_col, "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, "dim"]].copy()
        out["centroid"] = np.round(df["s"] / df["c"], round_to)
        return out

    return agg.map_batches(finalize, batch_format="pandas")


class _IvfIndex:
    """IVF coarse quantizer: k-means-lite centroids from a seeded sample.

    Centroids are trained ONCE on the driver from a bounded sample (the
    classic IVF recipe: a few k-means iterations suffice for a coarse
    quantizer) and broadcast; assignment is one matmul per batch.
    """

    def __init__(self, sample: np.ndarray, n_lists: int, seed: int = 53,
                 iters: int = 8):
        rng = np.random.RandomState(seed)
        n = len(sample)
        n_lists = min(n_lists, n)
        centroids = sample[rng.choice(n, size=n_lists, replace=False)].copy()
        for _ in range(iters):
            # assign
            d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            # update (empty list keeps its centroid)
            for c in range(n_lists):
                members = sample[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
        self.centroids = centroids

    def assign(self, mat: np.ndarray) -> np.ndarray:
        d2 = ((mat[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1).astype("int64")

    def probe_lists(self, q: np.ndarray, n_probe: int) -> np.ndarray:
        d2 = ((self.centroids - q[None, :]) ** 2).sum(axis=1)
        return np.argsort(d2)[:n_probe].astype("int64")


class _SignIndex:
    """SQL-derivable coarse quantizer: list id = packed sign bits of
    the FIRST log2(n_lists) dimensions (bit d set iff v[d] > 0) — no
    training, no data-dependent state, so a DuckDB twin re-derives the
    assignment, the probe order (hamming distance to the query's code,
    ties by list id) and therefore the exact candidate set of a
    PARTIAL-probe query.  The deterministic sibling of the k-means
    quantizer: same inverted-list machinery and partition pruning, a
    coarser space partition (axis-aligned orthants instead of learned
    cells)."""

    def __init__(self, n_lists: int):
        b = int(np.log2(n_lists))
        if (1 << b) != n_lists:
            raise ValueError(f"sign quantizer needs n_lists = 2^b, got {n_lists}")
        self.b = b
        self.n_lists = n_lists

    def assign(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat[:, : self.b] > 0).astype(np.int64)
        return (bits << np.arange(self.b, dtype=np.int64)).sum(axis=1)

    def probe_lists(self, q: np.ndarray, n_probe: int) -> np.ndarray:
        qc = int(self.assign(q[None, :])[0])
        ham = np.array(
            [bin(l ^ qc).count("1") for l in range(self.n_lists)],
            dtype=np.int64,
        )
        order = np.lexsort((np.arange(self.n_lists), ham))
        return order[:n_probe].astype("int64")


def _make_quantizer(
    quantizer: str,
    n_lists: int,
    sample: "np.ndarray | None",
    seed: int,
):
    if quantizer == "sign":
        return _SignIndex(n_lists)
    if quantizer == "kmeans":
        return _IvfIndex(sample, n_lists, seed)
    raise ValueError(f"quantizer must be kmeans|sign, got {quantizer!r}")


def ivf_knn(
    ds: ray.data.Dataset,
    query_vec,
    k: int = 10,
    *,
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    seed: int = 53,
    round_to: int | None = None,
    quantizer: str = "kmeans",
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """IVF approximate top-k: train a coarse quantizer on a seeded sample,
    scan only the query's ``n_probe`` nearest inverted lists.

    The batch-side work is one assignment matmul + a filter; at corpus
    scale the stored table should be PARTITIONED by the list id so a
    query prunes to n_probe/n_lists of the data at the read.  Recall
    rises with n_probe (n_probe = n_lists degenerates to brute force).

    ``quantizer="sign"`` swaps the k-means cells for the training-free
    sign-bit orthant quantizer (:class:`_SignIndex`) — identical probe
    machinery, fully SQL-derivable, so a PARTIAL-probe query gets a
    value-exact DuckDB twin (queries.py q:ivf_knn_fast).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    if quantizer == "kmeans":
        sample_df = ds.limit(train_sample).to_pandas()
        sample = _to_matrix(sample_df["embedding"])
    else:
        sample = None
    index = _make_quantizer(quantizer, n_lists, sample, seed)
    probe = set(index.probe_lists(q, n_probe).tolist())
    index_ref = ray.put(index)
    probe_arr = np.fromiter(sorted(probe), dtype=np.int64)

    def assign_filter(batch):
        import pyarrow as pa

        from pdf_parser_ray.stages import worker_state

        if batch.num_rows == 0:
            return batch
        idx = worker_state(
            ("ivf_index", index_ref.hex()), lambda: ray.get(index_ref)
        )
        mat = np.vstack(
            [np.asarray(v, dtype=np.float64) for v in batch.column("embedding").to_pylist()]
        )
        lists = idx.assign(mat)
        return batch.filter(pa.array(np.isin(lists, probe_arr)))

    candidates = ds.map_batches(
        assign_filter,
        batch_format="pyarrow",
        zero_copy_batch=True,
        **_task_kwargs(concurrency),
    )
    return knn_brute_force(candidates, q, k, round_to=round_to, concurrency=concurrency)


class _Bucketer:
    """Random-hyperplane LSH code per row (seeded → identical planes on
    every worker; planes built once per actor)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 97):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def code(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype("int64")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(df["embedding"])
        out = df[["vec_id", "embedding"]].copy()
        out["bucket"] = self.code(mat)
        return out


def lsh_knn(
    ds: ray.data.Dataset,
    query_vec,
    k: int = 10,
    *,
    dim: int | None = None,
    n_planes: int = 8,
    round_to: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Approximate top-k: scan only rows sharing the query's LSH bucket.

    Recall/efficiency trade: with B = 2^n_planes buckets the scan
    touches ~1/B of the corpus.  Partition/cluster the stored corpus by
    ``bucket`` to make this a partition-pruned read at scale.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    dim = dim or q.shape[0]
    bucketer = _Bucketer(dim, n_planes)
    qcode = int(bucketer.code(q[None, :])[0])

    def bucket_code(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        # planes are seeded-deterministic → rebuild once per worker
        b = worker_state(
            ("lsh_planes", dim, n_planes), lambda: _Bucketer(dim, n_planes)
        )
        return b(df)

    bucketed = ds.map_batches(
        bucket_code, batch_format="pandas", **_task_kwargs(concurrency)
    )
    import pyarrow.compute as pc

    candidates = bucketed.map_batches(
        lambda t, _c=qcode: t.filter(pc.equal(t.column("bucket"), _c)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return knn_brute_force(
        candidates.drop_columns(["bucket"]), q, k, round_to=round_to,
        concurrency=concurrency,
    )


def embedding_quantize(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 127,
) -> ray.data.Dataset:
    """Scalar int8 quantization per vector (the storage-compression step
    an ANN index runs before sharding 100 TB of embeddings): each vector
    is scaled by its own max-|x| so q = floor(x·levels/scale + 0.5),
    q ∈ [-levels, levels], a 4× size cut at ~0.4 % cosine error.

    The FLOOR(+0.5) form (not banker's or away-from-zero rounding) is
    the contract: both numpy and a SQL engine evaluate it identically on
    the same doubles, so the oracle is exact — plain round() would
    diverge on .5 ties (numpy half-even vs DuckDB half-away).

    Output: (id_col, scale:float64, q:string — comma-joined ints; a
    string so engine list renderings can't differ).  Zero vectors emit
    scale 0 and all-zero codes.  Row-local map_batches; no shuffle.
    """
    import numpy as np
    import pandas as pd

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        ids, scales, qs = [], [], []
        for vid, vec in zip(df[id_col], df[vec_col]):
            x = np.asarray(vec, dtype=np.float64)
            scale = float(np.max(np.abs(x))) if len(x) else 0.0
            if scale == 0.0:
                q = np.zeros(len(x), dtype=np.int64)
            else:
                q = np.floor(x * levels / scale + 0.5).astype(np.int64)
            ids.append(vid)
            scales.append(scale)
            qs.append(",".join(str(int(v)) for v in q))
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "scale": pd.Series(scales, dtype="float64"),
                "q": pd.Series(qs, dtype="object"),
            }
        )

    return ds.map_batches(quant, batch_format="pandas")


def embed_documents(
    ds: ray.data.Dataset,
    *,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "siphash",
) -> ray.data.Dataset:
    """Deterministic hashed bag-of-words document embeddings — the
    feature-hashing trick (Weinberger et al., ICML 2009): token t
    contributes sign(h(t)) to dimension h(t) mod dim; rows are
    L2-normalized.

    Purpose: bridge the documents table into the similarity tier
    (kNN / embedding dedup / centroids run unchanged on the output)
    WITHOUT a model dependency.  Fixed-key siphash (pandas
    ``hash_array``) makes every worker and every rerun produce the same
    vectors; the per-batch kernel is one explode + one vectorized hash
    + one ``np.add.at`` scatter — no Python loop over tokens.
    Row-local: no shuffle at any scale.

    Output: (vec_id:int64 [= id_col], embedding:list<float64>).
    """
    import re

    token_re = re.compile(r"\S+", re.ASCII)

    def embed(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.lower().str.findall(token_re)
        ex = toks.explode().dropna()
        n = len(df)
        mat = np.zeros((n, dim), dtype=np.float64)
        if len(ex):
            pos_map = pd.Series(np.arange(n), index=df.index)
            rows = pos_map[ex.index].to_numpy(dtype=np.int64)
            if hash_fn == "md5":
                # SQL-reproducible token hashes (the hll_users_md5
                # trick) so the embedding itself can be oracled
                from pdf_parser_ray.ops.sketches import _hash_strings_md5

                h = _hash_strings_md5(ex.tolist())
            else:
                h = pd.util.hash_array(ex.to_numpy(dtype=object))
            cols = (h % np.uint64(dim)).astype(np.int64)
            signs = np.where((h >> np.uint64(63)).astype(bool), -1.0, 1.0)
            np.add.at(mat, (rows, cols), signs)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        mat /= norms[:, None]
        return pd.DataFrame(
            {"vec_id": df[id_col].to_numpy(dtype=np.int64), "embedding": list(mat)}
        )

    return ds.map_batches(embed, batch_format="pandas")


class _PqCodebook:
    """Product-quantization codebooks (the Jégou/PQ recipe): the D-dim
    space splits into ``m`` subspaces; each gets its own small k-means
    codebook trained ONCE on a bounded driver-side sample and broadcast.
    A vector encodes to ``m`` uint8 code indices — a 4·D-byte float32
    embedding compresses to m bytes (32× at D=32, m=4).
    """

    def __init__(self, sample: np.ndarray, m: int = 4, n_codes: int = 16,
                 seed: int = 53, iters: int = 8):
        n, d = sample.shape
        if d % m:
            raise ValueError(f"dim {d} not divisible by m={m} subspaces")
        self.m = m
        self.d_sub = d // m
        self.n_codes = min(n_codes, n)
        rng = np.random.RandomState(seed)
        books = []
        for s in range(m):
            sub = sample[:, s * self.d_sub:(s + 1) * self.d_sub]
            cents = sub[rng.choice(n, size=self.n_codes, replace=False)].copy()
            for _ in range(iters):
                d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for c in range(self.n_codes):
                    members = sub[assign == c]
                    if len(members):
                        cents[c] = members.mean(axis=0)
            books.append(cents)
        self.books = np.stack(books)  # (m, n_codes, d_sub)

    def encode(self, mat: np.ndarray) -> np.ndarray:
        """(n, D) → (n, m) uint8 code matrix; m small argmin matmuls."""
        codes = np.empty((len(mat), self.m), dtype=np.uint8)
        for s in range(self.m):
            sub = mat[:, s * self.d_sub:(s + 1) * self.d_sub]
            d2 = ((sub[:, None, :] - self.books[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
        return codes

    def adc_table(self, q: np.ndarray) -> np.ndarray:
        """Asymmetric-distance table: (m, n_codes) squared L2 of the
        query's subvectors to every codeword — one tiny precompute per
        query; batch distances become m table lookups + a sum."""
        t = np.empty((self.m, self.n_codes), dtype=np.float64)
        for s in range(self.m):
            qs = q[s * self.d_sub:(s + 1) * self.d_sub]
            t[s] = ((self.books[s] - qs[None, :]) ** 2).sum(axis=1)
        return t

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(n, m) codes → (n, D) reconstruction (codeword concat)."""
        return np.concatenate(
            [self.books[s][codes[:, s]] for s in range(self.m)], axis=1
        )


def pq_encode(
    ds: ray.data.Dataset,
    *,
    m: int = 4,
    n_codes: int = 16,
    train_sample: int = 2048,
    seed: int = 53,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Compress the embedding column to PQ codes (vec_id, code:list<uint8>).

    Codebooks train on a bounded seeded sample (the IVF pattern) and
    broadcast once; encoding is m small matmuls per batch.  The output
    is the compressed table a 100-TB ANN store would persist — 32×
    smaller than float32 embeddings at the defaults, scanned by
    :func:`pq_knn` without ever touching the originals.
    """
    sample = _to_matrix(ds.limit(train_sample).to_pandas()["embedding"])
    book = _PqCodebook(sample, m=m, n_codes=n_codes, seed=seed)
    book_ref = ray.put(book)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        bk: _PqCodebook = worker_state(
            ("pq_book", book_ref.hex()), lambda: ray.get(book_ref)
        )
        codes = bk.encode(_to_matrix(df["embedding"]))
        return pd.DataFrame(
            {"vec_id": df["vec_id"].to_numpy(), "code": list(codes)}
        )

    return ds.map_batches(encode, batch_format="pandas", **_task_kwargs(concurrency))


def pq_knn(
    ds: ray.data.Dataset,
    query_vec,
    k: int = 10,
    *,
    m: int = 4,
    n_codes: int = 16,
    train_sample: int = 2048,
    seed: int = 53,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Approximate top-k by asymmetric PQ distance (ADC scan).

    The third ANN scale path next to :func:`lsh_knn` / :func:`ivf_knn`:
    every batch encodes to (n, m) uint8 codes and scores via m
    table-lookups + a row sum — no full-dimension arithmetic in the
    scan.  At corpus scale the codes come precomputed from
    :func:`pq_encode`'s persisted table and the scan reads m bytes per
    vector instead of 4·D.  Approximate by design → no SQL oracle; the
    pytest fixture pins recall vs brute force on the driver embeddings.

    Output: (vec_id:int64, approx_dist:float64) — squared-L2 ADC
    distance, ascending, deterministic (dist, vec_id) tie-break, k rows.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    sample = _to_matrix(ds.limit(train_sample).to_pandas()["embedding"])
    book = _PqCodebook(sample, m=m, n_codes=n_codes, seed=seed)
    table_ref = ray.put((book, book.adc_table(q)))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        bk, tab = worker_state(
            ("pq_adc", table_ref.hex()), lambda: ray.get(table_ref)
        )
        codes = bk.encode(_to_matrix(df["embedding"]))
        # ADC: dist = sum_s tab[s, code_s] — pure lookups
        dist = tab[np.arange(bk.m)[None, :], codes].sum(axis=1)
        out = pd.DataFrame(
            {"vec_id": df["vec_id"].to_numpy(), "approx_dist": dist}
        )
        return out.nsmallest(k, ["approx_dist", "vec_id"])

    partial = ds.map_batches(scan, batch_format="pandas", **_task_kwargs(concurrency))
    return partial.sort(["approx_dist", "vec_id"]).limit(k)


def ivf_store_build(
    ds: ray.data.Dataset,
    store_dir: str,
    *,
    n_lists: int = 16,
    train_sample: int = 2048,
    seed: int = 53,
    quantizer: str = "kmeans",
    concurrency: int | tuple[int, int] | None = None,
) -> "object":
    """Persist the embedding table as an IVF STORE: Parquet partitioned
    by inverted-list id (``list_id=K/`` directories) plus the trained
    centroids — the layout that makes :func:`ivf_store_query` prune at
    the READ instead of scanning and filtering (the difference between
    an ANN demo and a 100-TB ANN table; ``ivf_knn``'s docstring caveat,
    resolved).

    Build is one assignment matmul per batch + a partitioned write; the
    write is also resumable per list directory (the partitioned-sink
    rule).  Returns the index (also saved to ``<store>/centroids.npy``-
    style parquet so queries need no retraining).
    """
    import pyarrow as pa

    if quantizer == "kmeans":
        sample = _to_matrix(ds.limit(train_sample).to_pandas()["embedding"])
    else:
        sample = None
    index = _make_quantizer(quantizer, n_lists, sample, seed)
    index_ref = ray.put(index)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        idx: _IvfIndex = worker_state(
            ("ivf_index", index_ref.hex()), lambda: ray.get(index_ref)
        )
        out = df.copy()
        out["list_id"] = idx.assign(_to_matrix(df["embedding"]))
        return out

    ds.map_batches(assign, batch_format="pandas", **_task_kwargs(concurrency)).write_parquet(
        store_dir, partition_cols=["list_id"]
    )
    # quantizer state rides along so a query session needs no
    # retraining (flattened row-major + shape columns, the multimodal
    # layout rule); the sign quantizer is stateless — only its kind and
    # list count persist
    if quantizer == "kmeans":
        cents = index.centroids
        flat, nl, dim = cents.ravel().tolist(), cents.shape[0], cents.shape[1]
    else:
        flat, nl, dim = [], index.n_lists, 0
    pa.parquet.write_table(
        pa.table(
            {
                "flat": pa.array([flat], pa.list_(pa.float64())),
                "n_lists": pa.array([nl], pa.int64()),
                "dim": pa.array([dim], pa.int64()),
                "quantizer": pa.array([quantizer], pa.string()),
            }
        ),
        f"{store_dir}/centroids.parquet",
    )
    return index


def ivf_store_query(
    store_dir: str,
    query_vec,
    k: int = 10,
    *,
    n_probe: int = 4,
    round_to: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Top-k over an :func:`ivf_store_build` store, reading ONLY the
    ``n_probe`` nearest list partitions — I/O scales with
    n_probe/n_lists of the table, the read never touches the rest.

    Equivalent by construction to ``ivf_knn`` with the same centroids:
    rows whose assignment is in the probe set are exactly the rows
    stored under those ``list_id=`` directories.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{store_dir}/centroids.parquet")
    n_lists = int(t.column("n_lists")[0].as_py())
    quant = (
        t.column("quantizer")[0].as_py()
        if "quantizer" in t.column_names else "kmeans"  # pre-r4 stores
    )
    q = np.asarray(query_vec, dtype=np.float64)
    if quant == "sign":
        probe = _SignIndex(n_lists).probe_lists(q, n_probe)
    else:
        dim = int(t.column("dim")[0].as_py())
        cents = np.asarray(
            t.column("flat")[0].as_py(), dtype=np.float64
        ).reshape(n_lists, dim)
        d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
        probe = np.argsort(d2)[:n_probe]

    from pdf_parser_ray.io_utils import read_parquet_clean

    # expand to files: pyarrow accepts one directory but not a LIST of
    # directories, and empty lists wrote no directory at all
    import glob as _glob

    paths = sorted(
        f
        for p in sorted(probe.tolist())
        for f in _glob.glob(f"{store_dir}/list_id={int(p)}/*.parquet")
    )
    if not paths:
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})
        )
    candidates = read_parquet_clean(paths, columns=["vec_id", "embedding"])
    return knn_brute_force(
        candidates, q, k, round_to=round_to, concurrency=concurrency
    )


def hard_negatives(
    ds: ray.data.Dataset,
    anchors: pd.DataFrame,
    *,
    k: int = 5,
    label_col: str = "label",
    round_to: int = 6,
) -> pd.DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the top-``k`` most-similar vectors that do NOT share the
    anchor's label — the negatives that actually teach the model
    (Robinson et al. 2021 contrastive-negatives shape).

    ``anchors`` is a driver-sized frame (vec_id, embedding, label) —
    the query set, broadcast ONCE via ``ray.put`` and cached per worker.
    Per batch: one matmul against all anchors, a label-mismatch mask,
    and a per-anchor partial top-k; the driver reduces
    ≤ anchors × k × batches rows.  No shuffle.  Cosines are rounded
    BEFORE selection so the (cosine DESC, vec_id ASC) tie-break matches
    a SQL oracle ordering by the rounded alias.

    Returns (anchor_id:int64, vec_id:int64, cosine:float64), k rows per
    anchor, ordered (anchor_id, cosine DESC, vec_id).
    """
    from pdf_parser_ray.stages import worker_state

    a_mat = _to_matrix(anchors["embedding"])
    a_norm = np.linalg.norm(a_mat, axis=1, keepdims=True)
    a_norm[a_norm == 0] = 1.0
    a_ref = ray.put(
        {
            "mat": (a_mat / a_norm).T,  # D x A
            "ids": anchors["vec_id"].to_numpy().astype(np.int64),
            "labels": anchors[label_col].to_numpy(),
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"anchor_id": pd.Series([], dtype="int64"),
                 "vec_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        a = worker_state(("hardneg", a_ref.hex()), lambda: ray.get(a_ref))
        mat = _to_matrix(df["embedding"])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cos = np.round((mat / norms) @ a["mat"], round_to)  # B x A
        vec_ids = df["vec_id"].to_numpy().astype(np.int64)
        labels = df[label_col].to_numpy()
        frames = []
        for ai in range(cos.shape[1]):
            ok = (labels != a["labels"][ai]) & (vec_ids != a["ids"][ai])
            if not ok.any():
                continue
            c, v = cos[ok, ai], vec_ids[ok]
            idx = np.lexsort((v, -c))[: min(k, len(v))]
            frames.append(
                pd.DataFrame(
                    {"anchor_id": np.full(len(idx), a["ids"][ai], dtype=np.int64),
                     "vec_id": v[idx], "cosine": c[idx].astype(np.float64)}
                )
            )
        if not frames:
            return partial(df.head(0))
        return pd.concat(frames, ignore_index=True)

    pooled = ds.select_columns(["vec_id", "embedding", label_col]).map_batches(
        partial, batch_format="pandas"
    ).to_pandas()  # bounded: anchors x k x batches rows
    out = (
        pooled.sort_values(
            ["anchor_id", "cosine", "vec_id"], ascending=[True, False, True]
        )
        .groupby("anchor_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def coreset_kcenter(
    ds: "ray.data.Dataset",
    k: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int = 6,
) -> pd.DataFrame:
    """Greedy k-center coreset (farthest-point traversal) — the classic
    diversity-maximizing data-selection rule (Gonzalez 2-approximation
    to the k-center cover): start from the min-id point, repeatedly add
    the point FARTHEST from its nearest chosen center.  The standard
    seed-selection / coverage-subset pass for embedding corpora.

    Deterministic and engine-exact: every candidate distance is rounded
    to ``round_to`` BEFORE the min-over-centers and the (dist DESC, id
    ASC) argmax — the knn_cosine selection lesson — and embeddings are
    cast float32→float64 up front (exact) so both engines do double
    arithmetic.  Each of the k rounds is ONE map_batches scan emitting
    a 1-row per-block candidate (the farthest point it holds); the
    driver reduces blocks×1 rows.  Centers broadcast once per round
    (k×d floats).

    Returns (step:int64 1..k, vec_id:int64, gain:float64) — gain is the
    chosen point's covering distance at selection time (0.0 for the
    seed); gain is non-increasing from step 2 on.
    """
    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.stages import worker_state

    seed = (
        ds.select_columns([id_col, emb_col])
        .sort(id_col)
        .limit(1)
        .to_pandas()
    )
    centers = [
        (int(seed[id_col].iloc[0]),
         np.asarray(seed[emb_col].iloc[0], dtype=np.float64), 0.0)
    ]

    for _step in range(2, k + 1):
        cmat = np.stack([c[1] for c in centers])
        cref = ray.put(cmat)

        def far_partial(df: pd.DataFrame) -> pd.DataFrame:
            cm = worker_state(("kcenter", cref.hex()), lambda: ray.get(cref))
            x = _to_matrix(df[emb_col])
            # rounded distance per center, THEN min — mirrors the
            # twin's least(round(list_distance(...)), ...) chain.
            d = np.round(
                np.sqrt(
                    ((x[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
                ),
                round_to,
            ).min(axis=1)
            ids = df[id_col].to_numpy(np.int64)
            order = np.lexsort((ids, -d))  # dist DESC, id ASC
            j = order[0]
            return arrow_out(
                pd.DataFrame(
                    {id_col: [ids[j]], "d": [float(d[j])],
                     emb_col: [x[j].tolist()]}
                )
            )

        cand = (
            ds.select_columns([id_col, emb_col])
            .map_batches(far_partial, batch_format="pandas")
            .to_pandas()  # blocks x 1 rows
            .sort_values(["d", id_col], ascending=[False, True])
        )
        best = cand.iloc[0]
        centers.append(
            (int(best[id_col]),
             np.asarray(best[emb_col], dtype=np.float64),
             float(best["d"]))
        )

    return pd.DataFrame(
        {
            "step": pd.Series(range(1, k + 1), dtype="int64"),
            "vec_id": pd.Series([c[0] for c in centers], dtype="int64"),
            "gain": pd.Series([c[2] for c in centers], dtype="float64"),
        }
    )


def bitext_margin_pairs(
    ds: ray.data.Dataset,
    *,
    src_lang: str,
    tgt_lang: str,
    k: int = 4,
    n_index: int = 64,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    round_to: int = 6,
) -> ray.data.Dataset:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the ratio
    margin used to mine parallel corpora like CCMatrix): for every
    source-language document, find the target-language candidate that
    maximizes ``margin(x,y) = 2·cos(x,y) / (knn_avg(x) + knn_avg(y))``
    — cosine relative to how close each side is to its OTHER nearest
    neighbors, which suppresses hub documents that are merely close to
    everything.

    The target index is a BOUNDED deterministic anchor set (the
    ``n_index`` smallest ``id_col`` values of ``tgt_lang`` — the IVF
    seeded-sample pattern): its (n_index × dim) matrix broadcasts via
    ``ray.put`` and every stage stays row-local over the source side.
    Pass A streams the source once to collect, per target anchor, the
    top-``k`` source cosines (≤ n_index·k rows per batch, driver-merged
    — bounded); pass B re-streams it to pick each source doc's best
    margin against the broadcast per-anchor averages.  At 100-TB the
    anchor set shards into IVF lists (similarity.ivf_knn) and pass A/B
    run per list; the per-stage shapes are unchanged.

    Determinism contract (driver-oracle grade): embeddings are the md5
    hash-trick vectors (``embed_documents(hash_fn="md5")``, SQL-
    rederivable); every cosine is rounded to ``round_to`` BEFORE any
    ranking, averaging, or margin math; top-k selection breaks ties by
    id ASC; the final candidate picks (margin DESC, tgt ASC).  Zero
    denominators (all-zero vectors) yield margin 0.

    Output: (src_id:int64, tgt_id:int64, cosine:float64,
    margin:float64) — one row per source doc whose best margin clears
    ``threshold``.
    """
    import ray

    from pdf_parser_ray.stages import worker_state

    # ---- bounded deterministic anchor ids: n_index smallest tgt ids
    def id_partial(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        f = t.filter(pc.equal(t.column(lang_col), tgt_lang))
        ids = pc.sort_indices(f.column(id_col))[:n_index]
        return f.take(ids).select([id_col])

    anchor_ids = sorted(
        ds.select_columns([lang_col, id_col])
        .map_batches(id_partial, batch_format="pyarrow")
        .to_pandas()[id_col]  # bounded: ≤ blocks × n_index rows
        .nsmallest(n_index)
        .tolist()
    )
    id_set = set(anchor_ids)

    def keep_anchors(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        return t.filter(
            pc.is_in(t.column(id_col), value_set=pa.array(sorted(id_set)))
        )

    import pyarrow as pa

    tgt_pdf = (
        embed_documents(
            ds.select_columns([id_col, text_col, lang_col]).map_batches(
                keep_anchors, batch_format="pyarrow"
            ),
            hash_fn="md5",
            text_col=text_col,
            id_col=id_col,
        )
        .to_pandas()  # bounded: ≤ n_index rows by construction
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    tgt_ids = tgt_pdf["vec_id"].to_numpy(dtype=np.int64)
    T = _to_matrix(tgt_pdf["embedding"])
    t_ref = ray.put((tgt_ids, T))

    def src_only(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column(lang_col), src_lang))

    src_embedded = embed_documents(
        ds.select_columns([id_col, text_col, lang_col]).map_batches(
            src_only, batch_format="pyarrow"
        ),
        hash_fn="md5",
        text_col=text_col,
        id_col=id_col,
    ).materialize()  # consumed twice (pass A + pass B)

    # ---- pass A: per-anchor top-k source cosines (bounded partials)
    def y_topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, t = worker_state(("bitext_t", t_ref.hex()), lambda: ray.get(t_ref))
        if not len(df):
            return pd.DataFrame(
                {"ti": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64"),
                 "src_id": pd.Series([], dtype="int64")}
            )
        c = np.round(_to_matrix(df["embedding"]) @ t.T, round_to)
        sid = df["vec_id"].to_numpy(dtype=np.int64)
        frames = []
        for ti in range(t.shape[0]):
            col = pd.DataFrame({"cosine": c[:, ti], "src_id": sid})
            col = col.sort_values(
                ["cosine", "src_id"], ascending=[False, True]
            ).head(k)
            col.insert(0, "ti", np.int64(ti))
            frames.append(col)
        return pd.concat(frames, ignore_index=True)

    parts = (
        src_embedded.map_batches(y_topk_partial, batch_format="pandas")
        .to_pandas()  # bounded: ≤ blocks × n_index × k rows
    )
    y_avg = np.zeros(len(tgt_ids), dtype=np.float64)
    for ti, g in parts.groupby("ti"):
        top = g.sort_values(
            ["cosine", "src_id"], ascending=[False, True]
        ).head(k)
        y_avg[int(ti)] = float(np.mean(top["cosine"].to_numpy()))
    y_ref = ray.put(y_avg)

    # ---- pass B: per-source best-margin candidate
    def best_margin(df: pd.DataFrame) -> pd.DataFrame:
        tids, t = worker_state(
            ("bitext_t", t_ref.hex()), lambda: ray.get(t_ref)
        )
        ya = worker_state(("bitext_y", y_ref.hex()), lambda: ray.get(y_ref))
        empty = pd.DataFrame(
            {"src_id": pd.Series([], dtype="int64"),
             "tgt_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64"),
             "margin": pd.Series([], dtype="float64")}
        )
        if not len(df):
            return empty
        c = np.round(_to_matrix(df["embedding"]) @ t.T, round_to)
        # x's own-side kNN average over the anchor set (ties at the k
        # boundary have equal rounded values — tie-break-insensitive)
        xa = -np.sort(-c, axis=1)[:, :k].mean(axis=1)
        denom = xa[:, None] + ya[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            m = np.where(denom == 0.0, 0.0, 2.0 * c / denom)
        m = np.round(m, round_to)
        best = np.argmax(m, axis=1)  # ties -> lowest index = tgt_id ASC
        rows = np.arange(len(df))
        out = pd.DataFrame(
            {"src_id": df["vec_id"].to_numpy(dtype=np.int64),
             "tgt_id": tids[best],
             "cosine": c[rows, best] + 0.0,
             "margin": m[rows, best] + 0.0}
        )
        return out[out["margin"] >= threshold].reset_index(drop=True)

    return src_embedded.map_batches(best_margin, batch_format="pandas")


def recall_at_k(exact_ids, approx_ids, k: int):
    """Recall@k of an ANN result against the exact top-k: |∩| / k —
    two ints, so any twin composed from both sides' oracles is exact.
    Single-probe hyperplane LSH on isotropic (unclustered) vectors is
    EXPECTED to score ~0 here at small N (the bucket holds random
    points, not neighbors): the audit exists to expose that before an
    index ships — see tests/test_clustering.py TestRecallAtK for the
    clustered case where the same index scores high.  Production ANN
    for this repo is the IVF store (ivf_store_build/query)."""
    import pandas as pd

    hit = len(set(map(int, exact_ids)) & set(map(int, approx_ids)))
    return pd.DataFrame(
        {
            "k": pd.Series([k], dtype="int64"),
            "n_hit": pd.Series([hit], dtype="int64"),
            "recall": pd.Series([hit / k], dtype="float64"),
        }
    )


def mmr_topk(
    ds: ray.data.Dataset,
    query_vec,
    k: int = 10,
    *,
    lam: float = 0.5,
    pool: int = 50,
    round_to: int = 6,
) -> pd.DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` results maximizing
    ``lam·cos(q,d) − (1−lam)·max_{s∈S} cos(d,s)`` — relevance minus
    redundancy, the diversity-aware retrieval head.

    Distributed part: ONE brute-force pass selects the top-``pool``
    candidate ids (partial top-k per batch, tiny driver merge), one
    broadcast-filter pass fetches their embeddings (pool-bounded).
    The greedy loop runs on the driver over the pool — k·pool dot
    products, driver-sized by construction.  Scores round to
    ``round_to`` before every argmax; ties break on vec_id ascending —
    fully deterministic.

    Output (eager, k rows): (rank:int64, vec_id:int64,
    relevance:float64, mmr_score:float64).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)

    top = knn_brute_force(ds, q, k=pool, round_to=round_to).to_pandas()
    ids = set(int(v) for v in top["vec_id"])
    import pyarrow as pa
    import pyarrow.compute as pc

    cand = ds.map_batches(
        lambda t, _ids=sorted(ids): t.filter(
            pc.is_in(t.column("vec_id"), value_set=pa.array(_ids))
        ),
        batch_format="pyarrow",
    ).to_pandas()  # pool-bounded by construction
    cand = cand.sort_values("vec_id").reset_index(drop=True)
    mat = _to_matrix(cand["embedding"])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    rel = np.round(unit @ qn, round_to)
    vec_ids = cand["vec_id"].to_numpy(dtype=np.int64)

    chosen: list[int] = []
    out_rows = []
    remaining = np.ones(len(cand), dtype=bool)
    for rank in range(min(k, len(cand))):
        if chosen:
            red = np.round(unit @ unit[chosen].T, round_to).max(axis=1)
        else:
            red = np.zeros(len(cand))
        score = np.round(lam * rel - (1.0 - lam) * red, round_to)
        score_masked = np.where(remaining, score, -np.inf)
        best_score = score_masked.max()
        tied = np.flatnonzero(score_masked == best_score)
        pick = tied[np.argmin(vec_ids[tied])]
        chosen.append(pick)
        remaining[pick] = False
        out_rows.append(
            (rank + 1, int(vec_ids[pick]), float(rel[pick]),
             float(score[pick]))
        )
    return pd.DataFrame(
        out_rows, columns=["rank", "vec_id", "relevance", "mmr_score"]
    ).astype({"rank": "int64", "vec_id": "int64"})


def jl_project(
    ds: ray.data.Dataset,
    *,
    out_dim: int = 8,
    seed: str = "jl",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> ray.data.Dataset:
    """Johnson-Lindenstrauss random projection — the dimensionality cut
    an ANN tier runs before index build (D -> out_dim at bounded
    distance distortion, Achlioptas 2003 sign-matrix variant).

    The projection matrix is DETERMINISTIC: entry (j, i) is a
    Rademacher ±1 drawn from the parity of the first md5 hex digit of
    ``"{seed}|{j}|{i}"``, scaled by 1/sqrt(out_dim) — no RNG state, so
    every worker rebuilds the identical matrix in ``__init__``-style
    module cache, reruns are stable, and the DuckDB twin re-derives the
    exact same signs.  y_j = sum_i x_i*sign(j,i) / sqrt(out_dim),
    float64 end to end, rounded to ``round_to`` (cross-term sum-order
    contract).

    Output LONG format (one row per output dim — list renderings can't
    diverge): (id_col, j:int64, y:float64).  Row-local, zero shuffle.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    def signs(d_in: int) -> "np.ndarray":
        m = np.empty((d_in, out_dim), dtype=np.float64)
        for j in range(out_dim):
            for i in range(d_in):
                h = hashlib.md5(f"{seed}|{j}|{i}".encode()).hexdigest()
                m[i, j] = 1.0 if int(h[0], 16) % 2 == 0 else -1.0
        return m

    state: dict = {}

    def project(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.io_utils import arrow_out

        vecs = [np.asarray(v, dtype=np.float64) for v in df[vec_col]]
        if not vecs:
            return arrow_out(pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "j": pd.Series([], dtype="int64"),
                "y": pd.Series([], dtype="float64")}))
        d_in = len(vecs[0])
        if d_in not in state:
            state[d_in] = signs(d_in)
        x = np.stack(vecs)
        y = np.round(x @ state[d_in] / np.sqrt(float(out_dim)), round_to) + 0.0
        n = len(df)
        return arrow_out(pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), out_dim),
            "j": np.tile(np.arange(out_dim, dtype=np.int64), n),
            "y": y.ravel(),
        }))

    return ds.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pandas"
    )
