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


class _BatchTopK:
    """Partial top-k per batch against a broadcast query vector."""

    def __init__(self, query_ref, k: int):
        # ray.put'ed once on the driver; fetched once per actor.
        self.q = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.qn = self.q / np.linalg.norm(self.q)
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(df["embedding"])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ self.qn) / norms
        k = min(self.k, len(df))
        idx = np.argpartition(-cos, k - 1)[:k]
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy()[idx],
                "cosine": cos[idx].astype("float64"),
            }
        )


def knn_brute_force(
    ds: ray.data.Dataset,
    query_vec,
    k: int = 10,
    *,
    exclude_vec_id: int | None = None,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Exact cosine top-k: partial top-k per batch → global sort-limit.

    The final sort runs over ≤ k·num_batches rows — tiny.  Deterministic
    tie-break: (-cosine, vec_id).
    """
    query_ref = ray.put(np.asarray(query_vec, dtype=np.float64))
    if exclude_vec_id is not None:
        ds = ds.filter(
            lambda r, _x=exclude_vec_id: r["vec_id"] != _x
        )
    partial = ds.map_batches(
        _BatchTopK,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pandas",
        concurrency=concurrency,
    )
    return partial.sort(["cosine", "vec_id"], descending=[True, False]).limit(k)


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
    concurrency: int | tuple[int, int] = (1, 8),
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
    bucketed = ds.map_batches(
        _Bucketer,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pandas",
        concurrency=concurrency,
    )
    candidates = bucketed.filter(lambda r, _c=qcode: r["bucket"] == _c)
    return knn_brute_force(
        candidates.drop_columns(["bucket"]), q, k, concurrency=concurrency
    )
