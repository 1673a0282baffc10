"""Distributed k-means clustering over an embedding column.

The classic iterative-refinement pattern on Ray Data: centroids are
DRIVER-sized state (k × dim floats), broadcast once per iteration via
``ray.put``; each Lloyd iteration is ONE streaming pass —

    map_batches(assign + per-cluster partial sums)   # combiner, no shuffle
      → groupby("cluster").aggregate(Sum × (dim+1))  # k·num_blocks rows in,
      → to_pandas()                                  # k rows out (tiny)

so the only data that ever reaches the driver is the k×(dim+1) partial
table.  Nothing corpus-sized is materialized; at 10^12 rows each
iteration is a full scan (re-read from Parquet — the storage layer is
the cheapest place to "persist" the input), and the recipe degrades
gracefully to minibatch k-means by passing a pre-sampled dataset.

Assignment math runs in float64 with the direct (x−c)² form — NOT the
‖x‖²−2x·c+‖c‖² matmul expansion, which loses the low bits that decide
argmin near-ties — so a SQL oracle computing ``list_distance`` per
(vector, centroid) pair selects identical clusters.  Ties (bit-equal
distances) break toward the LOWER cluster id on both sides (numpy
argmin keeps the first minimum; the oracle orders by (dist, cluster)).

The reference repo has no clustering; this is part of the
training-data tier (corpus bucketing / IVF coarse quantizers / topic
sharding) the brief asks for beyond reference parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from pdf_parser_ray.ops.similarity import _task_kwargs, _to_matrix


def _assign_ids(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Argmin Euclidean cluster id per row, float64, first-min tie-break."""
    d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return d2.argmin(axis=1).astype("int64")


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """One assignment pass: (id_col, cluster) per row.  Row-local —
    centroids broadcast once, no shuffle."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        if len(df) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "cluster": pd.Series([], dtype="int64")}
            )
        cent = worker_state(("kmeans_cent", cent_ref.hex()),
                            lambda: ray.get(cent_ref))
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "cluster": _assign_ids(_to_matrix(df[vec_col]), cent),
            }
        )

    return ds.map_batches(assign, batch_format="pandas",
                          **_task_kwargs(concurrency))


def kmeans_cluster_sizes(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """Per-cluster member counts for a fixed centroid set: assignment +
    per-batch count combiner → k-row groupby.  (cluster, n_vecs)."""
    from ray.data.aggregate import Sum

    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from pdf_parser_ray.stages import worker_state

        if len(df) == 0:
            return pd.DataFrame(
                {"cluster": pd.Series([], dtype="int64"),
                 "n_vecs": pd.Series([], dtype="int64")}
            )
        cent = worker_state(("kmeans_cent", cent_ref.hex()),
                            lambda: ray.get(cent_ref))
        ids = _assign_ids(_to_matrix(df[vec_col]), cent)
        c = np.bincount(ids, minlength=len(cent))
        nz = np.flatnonzero(c)
        return pd.DataFrame(
            {"cluster": nz.astype("int64"), "n_vecs": c[nz].astype("int64")}
        )

    return (
        ds.map_batches(partial, batch_format="pandas",
                       **_task_kwargs(concurrency))
        .groupby("cluster")
        .aggregate(Sum("n_vecs", alias_name="n_vecs"))
    )


def kmeans_fit(
    ds: ray.data.Dataset,
    init_centroids: np.ndarray,
    *,
    n_iter: int = 5,
    vec_col: str = "embedding",
    concurrency: int | tuple[int, int] | None = None,
    round_between: int | None = None,
    partial_limit: int = 2_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd's iterations over the full dataset.

    Returns (centroids: k×dim float64, counts: k int64 — final-iteration
    member counts).  Each iteration: one streaming pass with a per-batch
    sums/count combiner, one k-cardinality groupby, and a k-row driver
    update.  A cluster that loses all members keeps its centroid (the
    same convention as the in-module IVF trainer).

    ``round_between`` rounds the updated centroids to that many decimals
    after EVERY iteration.  That makes the multi-iteration trajectory
    engine-portable: a SQL twin that rounds its per-iteration means the
    same way sees bit-identical centroid INPUTS each round, so cross-
    engine summation-order noise cannot compound across iterations
    (the oracle contract behind queries.q_kmeans_train).

    ``ds`` is re-executed per iteration; at corpus scale that re-read is
    the intended behavior (don't ``materialize()`` 100 TB — Parquet IS
    the cache).  A KNOWN-small input (no-exec footer estimate ≤ 2M
    rows) is pinned once instead — five re-reads of a 30 MB table were
    pure fixed cost (measured ~3 s at sf0.1/32).  For minibatch
    k-means, pass a sampled dataset.

    ``partial_limit`` caps the per-iteration driver reduce (≤ k ×
    batches partial rows) with a bounded ``limit + 1`` probe (VERDICT
    r4 #8): a mis-sized call (huge k over many blocks) raises with
    guidance instead of OOMing the driver.
    """
    from ray.data.aggregate import Sum

    from pdf_parser_ray.ops.dedup import _rows_estimate_no_exec

    est = _rows_estimate_no_exec(ds)
    if est is not None and est <= 2_000_000:
        ds = ds.materialize()

    centroids = np.asarray(init_centroids, dtype=np.float64).copy()
    k, dim = centroids.shape
    sum_cols = [f"s{d}" for d in range(dim)]
    counts = np.zeros(k, dtype=np.int64)

    for _ in range(n_iter):
        cent_ref = ray.put(centroids)

        def partial(df: pd.DataFrame, _ref=cent_ref) -> pd.DataFrame:
            from pdf_parser_ray.stages import worker_state

            if len(df) == 0:
                data = {"cluster": pd.Series([], dtype="int64")}
                for c in sum_cols:
                    data[c] = pd.Series([], dtype="float64")
                data["n"] = pd.Series([], dtype="int64")
                return pd.DataFrame(data)
            cent = worker_state(("kmeans_cent", _ref.hex()),
                                lambda: ray.get(_ref))
            mat = _to_matrix(df[vec_col])
            ids = _assign_ids(mat, cent)
            # segmented per-cluster sums: sort rows by cluster, reduceat
            order = np.argsort(ids, kind="stable")
            sids = ids[order]
            smat = mat[order]
            uniq, starts = np.unique(sids, return_index=True)
            sums = np.add.reduceat(smat, starts, axis=0)
            n = np.diff(np.append(starts, len(sids)))
            data = {"cluster": uniq.astype("int64")}
            for d, c in enumerate(sum_cols):
                data[c] = sums[:, d]
            data["n"] = n.astype("int64")
            return pd.DataFrame(data)

        # driver reduce of ≤ k × batches partial rows: a Ray groupby
        # over 65 aggregate columns at cluster cardinality k paid ~1 s
        # of sort-aggregate machinery per iteration for a k-row answer
        pool = (
            ds.map_batches(partial, batch_format="pandas",
                           **_task_kwargs(concurrency))
            .limit(partial_limit + 1)  # ≤ k rows per batch; bounded pull
            .to_pandas()
        )
        if len(pool) > partial_limit:
            raise ValueError(
                f"kmeans_fit partial pool exceeds partial_limit="
                f"{partial_limit} (k × batches rows reach the driver); "
                "lower k, coarsen blocks, or raise partial_limit"
            )
        small = pool.groupby("cluster", as_index=False)[sum_cols + ["n"]].sum()
        counts = np.zeros(k, dtype=np.int64)
        for _, row in small.iterrows():
            c = int(row["cluster"])
            counts[c] = int(row["n"])
            if counts[c]:
                centroids[c] = (
                    np.array([row[sc] for sc in sum_cols], dtype=np.float64)
                    / counts[c]
                )
        if round_between is not None:
            centroids = np.round(centroids, round_between)
    return centroids, counts


def centroids_long(
    centroids: np.ndarray, counts: np.ndarray, *, round_to: int = 6
) -> pd.DataFrame:
    """Flatten a centroid matrix to oracle-friendly long form:
    (cluster, dim, centroid — rounded cross-row aggregate, n_vecs)."""
    k, dim = centroids.shape
    return pd.DataFrame(
        {
            "cluster": np.repeat(np.arange(k, dtype=np.int64), dim),
            "dim": np.tile(np.arange(dim, dtype=np.int64), k),
            "centroid": np.round(centroids, round_to).ravel(),
            "n_vecs": np.repeat(counts.astype(np.int64), dim),
        }
    )


def grid_dbscan(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    id_col: str = "vec_id",
    *,
    eps: float = 0.5,
    min_pts: int = 8,
) -> "ray.data.Dataset":
    """Density clustering without choosing K — the grid-cell DBSCAN
    approximation (cell-based variants of Ester et al. 1996; cf.
    GriDBSCAN/GriT-style decompositions): project every vector onto the
    learned top-2 principal components (:func:`~pdf_parser_ray.ops.\
profile.embedding_pca` fit, broadcast once), snap to an ``eps``-sized
    grid, call a cell DENSE when it holds ≥ ``min_pts`` points, and
    connect dense cells through their 8-neighborhood; each connected
    component is a cluster, points in sparse cells are noise (-1).

    Distributed shape: ONE bounded grouped count over occupied cells
    (partial counts per batch first — shuffle rows are cells, never
    points); the dense-cell union-find runs at the driver (dense cells
    ≤ occupied cells, a broadcast-scale table by construction) and the
    label map ships back via ``ray.put`` for a zero-shuffle assignment
    pass.  Deterministic: cluster ids are renumbered by their minimum
    cell (row-major), so any partitioning yields identical labels.

    Output: (id_col, cell_x:int64, cell_y:int64, cluster:int64 — dense
    component id, or -1 for noise).
    """
    import ray as _ray

    from pdf_parser_ray.io_utils import arrow_out
    from pdf_parser_ray.ops.profile import _pca_fit
    from pdf_parser_ray.ops.shuffle import grouped_sum
    from pdf_parser_ray.stages import worker_state

    mean, comps, _ = _pca_fit(ds, col, 2)
    fit_ref = _ray.put((mean, comps))

    def cells(df: "pd.DataFrame"):
        mu, cs = worker_state(
            ("dbscan_fit", fit_ref.hex()), lambda: _ray.get(fit_ref)
        )
        m = np.vstack(df[col].to_numpy()).astype(np.float64)
        proj = (m - mu) @ cs.T
        cx = np.floor(proj[:, 0] / eps).astype(np.int64)
        cy = np.floor(proj[:, 1] / eps).astype(np.int64)
        g = pd.DataFrame({"cell_x": cx, "cell_y": cy})
        g["n"] = np.int64(1)
        return arrow_out(
            g.groupby(["cell_x", "cell_y"], as_index=False)["n"].sum()
        )

    occupied = grouped_sum(
        ds.select_columns([col]).map_batches(cells, batch_format="pandas"),
        ["cell_x", "cell_y"],
        ["n"],
    ).to_pandas()  # bounded: occupied grid cells
    dense = occupied[occupied["n"] >= min_pts]

    # driver union-find over dense cells through the 8-neighborhood
    keys = {
        (int(x), int(y)): i
        for i, (x, y) in enumerate(zip(dense["cell_x"], dense["cell_y"]))
    }
    parent = list(range(len(keys)))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (x, y), i in keys.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                j = keys.get((x + dx, y + dy))
                if j is not None:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)

    # renumber components by their minimum (row-major) member cell
    roots: dict = {}
    cell_label: dict = {}
    for xy in sorted(keys):
        r = find(keys[xy])
        if r not in roots:
            roots[r] = len(roots)
        cell_label[xy] = roots[r]
    label_ref = _ray.put(cell_label)

    def assign(df: "pd.DataFrame"):
        mu, cs = worker_state(
            ("dbscan_fit", fit_ref.hex()), lambda: _ray.get(fit_ref)
        )
        labels = worker_state(
            ("dbscan_labels", label_ref.hex()), lambda: _ray.get(label_ref)
        )
        m = np.vstack(df[col].to_numpy()).astype(np.float64)
        proj = (m - mu) @ cs.T
        cx = np.floor(proj[:, 0] / eps).astype(np.int64)
        cy = np.floor(proj[:, 1] / eps).astype(np.int64)
        lab = np.fromiter(
            (labels.get((int(x), int(y)), -1) for x, y in zip(cx, cy)),
            dtype=np.int64,
            count=len(cx),
        )
        return arrow_out(
            pd.DataFrame(
                {
                    id_col: df[id_col].astype("int64"),
                    "cell_x": cx,
                    "cell_y": cy,
                    "cluster": lab,
                }
            )
        )

    return ds.select_columns([id_col, col]).map_batches(
        assign, batch_format="pandas"
    )
