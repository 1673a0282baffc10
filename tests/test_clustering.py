"""Distributed k-means (ops/clustering.py) pinned against a local numpy
Lloyd's reference on the real sf0.001 embeddings table."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from pdf_parser_ray.ops.clustering import (
    centroids_long,
    kmeans_assign,
    kmeans_cluster_sizes,
    kmeans_fit,
)

SF_DIR = "/root/testdata/sf0.001"
K = 4


@pytest.fixture(scope="module")
def emb():
    df = (
        pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    return df, mat


def _ref_lloyd(mat, init, n_iter):
    cent = init.copy()
    counts = np.zeros(len(cent), dtype=np.int64)
    for _ in range(n_iter):
        d2 = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        counts = np.bincount(a, minlength=len(cent))
        for c in range(len(cent)):
            if counts[c]:
                cent[c] = mat[a == c].mean(axis=0)
    return cent, counts, a


def test_assign_matches_reference(emb, ray_session):
    df, mat = emb
    init = mat[:K]
    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = (
        kmeans_assign(ds, init)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    _, _, a = _ref_lloyd(mat, init, 1)
    assert got["vec_id"].tolist() == df["vec_id"].tolist()
    assert got["cluster"].tolist() == a.tolist()


def test_cluster_sizes_match(emb, ray_session):
    _, mat = emb
    init = mat[:K]
    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = (
        kmeans_cluster_sizes(ds, init)
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    _, counts, _ = _ref_lloyd(mat, init, 1)
    expect = {c: int(n) for c, n in enumerate(counts) if n}
    assert dict(zip(got["cluster"], got["n_vecs"])) == expect
    assert got["n_vecs"].sum() == len(mat)


@pytest.mark.parametrize("n_iter", [1, 5])
def test_fit_matches_reference(emb, ray_session, n_iter):
    _, mat = emb
    init = mat[:K]
    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cent, counts = kmeans_fit(ds, init, n_iter=n_iter)
    rcent, rcounts, _ = _ref_lloyd(mat, init, n_iter)
    assert counts.tolist() == rcounts.tolist()
    # distributed sums reassociate the float adds → tolerance, not equality
    np.testing.assert_allclose(cent, rcent, rtol=1e-9, atol=1e-12)


def test_centroids_long_shape():
    cent = np.arange(8, dtype=np.float64).reshape(2, 4)
    counts = np.array([3, 5])
    df = centroids_long(cent, counts)
    assert list(df.columns) == ["cluster", "dim", "centroid", "n_vecs"]
    assert len(df) == 8
    assert df[df["cluster"] == 1]["n_vecs"].unique().tolist() == [5]
    row = df[(df["cluster"] == 1) & (df["dim"] == 2)]
    assert row["centroid"].iloc[0] == 6.0


def test_fit_moves_centroids(emb, ray_session):
    _, mat = emb
    init = mat[:K]
    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cent, _ = kmeans_fit(ds, init, n_iter=1)
    assert not np.allclose(cent, init)


def test_fit_partial_limit_trips_loudly(emb, ray_session):
    """VERDICT r4 #8: the per-iteration driver reduce is a bounded
    limit+1 probe — an over-limit k × batches pool raises cleanly."""
    import pytest

    _, mat = emb
    init = mat[:K]
    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="partial_limit"):
        kmeans_fit(ds, init, n_iter=1, partial_limit=1)


class TestProductQuantization:
    def test_decode_reconstruction_improves_with_codes(self, ray_session):
        import numpy as np

        from pdf_parser_ray.ops.similarity import _PqCodebook

        rng = np.random.RandomState(7)
        x = rng.randn(256, 16)
        small = _PqCodebook(x, m=4, n_codes=4, seed=1)
        big = _PqCodebook(x, m=4, n_codes=32, seed=1)
        err_small = ((small.decode(small.encode(x)) - x) ** 2).mean()
        err_big = ((big.decode(big.encode(x)) - x) ** 2).mean()
        assert err_big < err_small

    def test_adc_equals_exact_distance_to_reconstruction(self, ray_session):
        import numpy as np

        from pdf_parser_ray.ops.similarity import _PqCodebook

        rng = np.random.RandomState(11)
        x = rng.randn(128, 8)
        book = _PqCodebook(x, m=2, n_codes=8, seed=2)
        q = rng.randn(8)
        codes = book.encode(x)
        adc = book.adc_table(q)[np.arange(2)[None, :], codes].sum(axis=1)
        exact = ((book.decode(codes) - q[None, :]) ** 2).sum(axis=1)
        assert np.allclose(adc, exact)

    def test_pq_knn_recall_on_clustered_data(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.similarity import pq_knn

        # 8 well-separated clusters: PQ must retrieve the query's own
        # cluster (near-orthogonal noise data has no neighbor structure
        # for ANY quantizer to preserve — wrong fixture for recall).
        rng = np.random.RandomState(3)
        centers = rng.randn(8, 16) * 10.0
        labels = np.repeat(np.arange(8), 25)
        x = centers[labels] + rng.randn(200, 16) * 0.1
        df = pd.DataFrame(
            {"vec_id": np.arange(200, dtype="int64"), "embedding": list(x)}
        )
        ds = ray.data.from_pandas(df)
        q = x[0]  # member of cluster 0
        approx = pq_knn(ds, q, k=10, m=4, n_codes=16).to_pandas()
        got = set(approx["vec_id"].astype(int))
        same_cluster = set(np.where(labels == 0)[0].tolist())
        assert len(got & same_cluster) >= 9, got
        assert approx["approx_dist"].is_monotonic_increasing

    def test_pq_encode_emits_m_codes(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import pq_encode

        sf = "/root/testdata/sf0.001"
        from pdf_parser_ray.io_utils import read_parquet_clean

        ds = read_parquet_clean(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        out = pq_encode(ds, m=4, n_codes=16).to_pandas()
        assert len(out) == ds.count()
        assert all(len(c) == 4 for c in out["code"].head(20))


class TestIvfStore:
    def test_store_query_matches_scan_filter_ivf(self, ray_session, tmp_path):
        import ray.data

        from pdf_parser_ray.io_utils import read_parquet_clean
        from pdf_parser_ray.ops.similarity import (
            ivf_knn,
            ivf_store_build,
            ivf_store_query,
        )

        sf = "/root/testdata/sf0.001"
        ds = read_parquet_clean(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        store = str(tmp_path / "ivf_store")
        ivf_store_build(ds, store, n_lists=8, seed=53)
        import pyarrow.parquet as pq_

        qv = (
            pq_.read_table(f"{sf}/embeddings.parquet")
            .to_pandas()
            .pipe(lambda d: d.loc[d["vec_id"] == 0, "embedding"].iloc[0])
        )
        got = ivf_store_query(store, qv, k=10, n_probe=3).to_pandas()
        want = ivf_knn(
            ds, qv, k=10, n_lists=8, n_probe=3, train_sample=2048, seed=53
        ).to_pandas()
        assert list(got["vec_id"]) == list(want["vec_id"])

    def test_sign_quantizer_store_matches_scan_and_prunes(
        self, ray_session, tmp_path
    ):
        """Sign-bit quantizer tier (r4): store route == scan-filter
        route at a PARTIAL probe, the probe genuinely prunes (reads
        fewer than all list directories), and assignment matches the
        documented orthant rule."""
        import glob

        import numpy as np
        import pyarrow.parquet as pq_

        from pdf_parser_ray.io_utils import read_parquet_clean
        from pdf_parser_ray.ops.similarity import (
            _SignIndex,
            ivf_knn,
            ivf_store_build,
            ivf_store_query,
        )

        sf = "/root/testdata/sf0.001"
        ds = read_parquet_clean(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        store = str(tmp_path / "sign_store")
        ivf_store_build(ds, store, n_lists=8, quantizer="sign")
        assert len(glob.glob(f"{store}/list_id=*")) >= 2
        qv = (
            pq_.read_table(f"{sf}/embeddings.parquet")
            .to_pandas()
            .pipe(lambda d: d.loc[d["vec_id"] == 0, "embedding"].iloc[0])
        )
        got = ivf_store_query(store, qv, k=10, n_probe=3).to_pandas()
        want = ivf_knn(
            ds, qv, k=10, n_lists=8, n_probe=3, quantizer="sign"
        ).to_pandas()
        assert list(got["vec_id"]) == list(want["vec_id"])
        # orthant rule: bit d set iff v[d] > 0 on the first 3 dims
        idx = _SignIndex(8)
        v = np.array([[1.0, -2.0, 3.0, 9.9], [-1.0, -1.0, -1.0, 5.0]])
        assert list(idx.assign(v)) == [0b101, 0]
        # hamming probe order from code 0b101: itself first, then
        # 1-bit flips by list id (100, 111, 001), ...
        assert list(idx.probe_lists(v[0], 4)) == [0b101, 0b001, 0b100, 0b111]

    def test_store_prunes_partitions(self, ray_session, tmp_path):
        import glob

        import ray.data

        from pdf_parser_ray.io_utils import read_parquet_clean
        from pdf_parser_ray.ops.similarity import ivf_store_build

        sf = "/root/testdata/sf0.001"
        ds = read_parquet_clean(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        store = str(tmp_path / "store2")
        ivf_store_build(ds, store, n_lists=8, seed=53)
        parts = glob.glob(f"{store}/list_id=*")
        assert len(parts) >= 2  # hive layout exists → the read CAN prune
        files = glob.glob(f"{store}/list_id=*/*.parquet")
        total = ray.data.read_parquet(files).count()
        assert total == ds.count()  # every vector landed in one list


class TestCoresetKcenter:
    def test_farthest_point_traversal(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.similarity import coreset_kcenter

        # three tight clusters far apart: the first 3 picks must cover
        # all 3 clusters (that's the k-center guarantee at its core).
        rng = np.random.default_rng(5)
        pts, labels = [], []
        for ci, center in enumerate([0.0, 100.0, -100.0]):
            for _ in range(20):
                pts.append(center + rng.normal(0, 0.1, 4))
                labels.append(ci)
        df = pd.DataFrame(
            {"vec_id": np.arange(60, dtype="int64"),
             "embedding": [p.tolist() for p in pts]}
        )
        out = coreset_kcenter(
            ray.data.from_pandas(df).repartition(4), 4
        )
        assert out["step"].tolist() == [1, 2, 3, 4]
        first3 = {labels[v] for v in out["vec_id"].iloc[:3]}
        assert first3 == {0, 1, 2}
        # gain non-increasing from step 2, and the step-4 gain (intra-
        # cluster) is tiny vs the step-2/3 gains (inter-cluster).
        g = out["gain"].to_numpy()
        assert (np.diff(g[1:]) <= 0).all()
        assert g[3] < g[1] / 100

    def test_partition_invariant(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.similarity import coreset_kcenter

        rng = np.random.default_rng(9)
        df = pd.DataFrame(
            {"vec_id": np.arange(200, dtype="int64"),
             "embedding": [rng.normal(0, 1, 8).tolist() for _ in range(200)]}
        )
        a = coreset_kcenter(ray.data.from_pandas(df), 5)
        b = coreset_kcenter(ray.data.from_pandas(df).repartition(7), 5)
        pd.testing.assert_frame_equal(a, b)


class TestBitextMarginPairs:
    def _corpus(self):
        rows = [
            # exact translation pair shares every token -> cosine 1
            {"doc_id": 0, "lang": "de", "text": "alpha beta gamma"},
            {"doc_id": 10, "lang": "en", "text": "alpha beta gamma"},
            # near pair
            {"doc_id": 1, "lang": "de", "text": "delta epsilon zeta"},
            {"doc_id": 11, "lang": "en", "text": "delta epsilon eta"},
            # distractor anchors
            {"doc_id": 12, "lang": "en", "text": "one two three four"},
            {"doc_id": 13, "lang": "en", "text": "five six seven"},
            # other-language noise must be ignored entirely
            {"doc_id": 20, "lang": "fr", "text": "alpha beta gamma"},
        ]
        return ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)

    def test_identical_doc_wins_with_cosine_one(self, ray_session):
        from pdf_parser_ray.ops.similarity import bitext_margin_pairs

        out = (
            bitext_margin_pairs(
                self._corpus(), src_lang="de", tgt_lang="en",
                k=2, n_index=4, threshold=0.0,
            )
            .to_pandas()
            .set_index("src_id")
            .sort_index()
        )
        assert out.loc[0, "tgt_id"] == 10
        assert out.loc[0, "cosine"] == 1.0
        # margin rewards standing out from the other anchors
        assert out.loc[0, "margin"] > 1.0
        assert out.loc[1, "tgt_id"] == 11

    def test_threshold_prunes_and_anchor_bound_respected(self, ray_session):
        from pdf_parser_ray.ops.similarity import bitext_margin_pairs

        out = bitext_margin_pairs(
            self._corpus(), src_lang="de", tgt_lang="en",
            k=2, n_index=2, threshold=10.0,
        ).to_pandas()
        # impossible threshold -> empty, and the n_index=2 anchor set
        # (two smallest en ids) never surfaces ids 12/13
        assert len(out) == 0


class TestRecallAtK:
    def test_lsh_recall_high_on_clustered_data(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.similarity import (
            knn_brute_force,
            lsh_knn,
            recall_at_k,
        )

        rng = np.random.default_rng(3)
        q = rng.normal(size=16).astype(np.float32)
        q /= np.linalg.norm(q)
        # 20 vectors tightly around the query + 400 far-away noise
        cluster = q + rng.normal(scale=0.01, size=(20, 16)).astype(np.float32)
        noise = rng.normal(size=(400, 16)).astype(np.float32) - 3 * q
        emb = np.vstack([cluster, noise])
        df = pd.DataFrame(
            {"vec_id": np.arange(len(emb), dtype="int64"),
             "embedding": [v.astype(np.float32) for v in emb]}
        )
        ds = ray.data.from_pandas(df)
        exact = knn_brute_force(ds, q, k=10).to_pandas()
        approx = lsh_knn(ds, q, k=10).to_pandas()
        rec = recall_at_k(exact["vec_id"], approx["vec_id"], 10)
        assert rec.loc[0, "recall"] >= 0.8  # the metric moves when
        # neighbors actually share the query's bucket

    def test_exact_counts(self):
        from pdf_parser_ray.ops.similarity import recall_at_k

        out = recall_at_k([1, 2, 3, 4], [3, 4, 5, 6], 4)
        assert out.loc[0, "n_hit"] == 2 and out.loc[0, "recall"] == 0.5


class TestMmrTopk:
    def test_matches_serial_twin_and_diversifies(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.similarity import mmr_topk

        rng = np.random.default_rng(5)
        q = np.array([1.0, 0, 0, 0])
        # two tight clusters, both relevant; pure top-k would take all
        # of cluster A — MMR must interleave
        a = np.array([0.9, 0.1, 0, 0]) + rng.normal(scale=0.003, size=(6, 4))
        b = np.array([0.9, -0.1, 0, 0]) + rng.normal(scale=0.003, size=(6, 4))
        emb = np.vstack([a, b])
        df = pd.DataFrame(
            {"vec_id": np.arange(12, dtype="int64"),
             "embedding": [v for v in emb]}
        )
        out = mmr_topk(ray.data.from_pandas(df), q, k=4, lam=0.5, pool=12)

        # serial twin
        unit = emb / np.linalg.norm(emb, axis=1)[:, None]
        qn = q / np.linalg.norm(q)
        rel = np.round(unit @ qn, 6)
        chosen, rem = [], list(range(12))
        for _ in range(4):
            red = (np.round(unit @ unit[chosen].T, 6).max(axis=1)
                   if chosen else np.zeros(12))
            sc = np.round(0.5 * rel - 0.5 * red, 6)
            best = max(rem, key=lambda i: (sc[i], -i))
            # tie-break on vec_id asc == max over (score, -id)
            chosen.append(best)
            rem.remove(best)
        assert out["vec_id"].tolist() == chosen
        # diversity: both clusters represented in the top 4
        assert {v // 6 for v in out["vec_id"]} == {0, 1}


class TestJlProject:
    def _embeds(self, n=60, d=32, seed=5):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [rng.normal(size=d).astype(np.float32) for _ in range(n)],
            }
        )

    def test_matches_scalar_twin(self, ray_session):
        import hashlib

        import ray.data

        from pdf_parser_ray.ops.similarity import jl_project

        df = self._embeds(n=8)
        out = (
            jl_project(ray.data.from_pandas(df), out_dim=4, seed="t")
            .to_pandas()
            .sort_values(["vec_id", "j"])
            .reset_index(drop=True)
        )
        # independent per-entry reimplementation
        for r in out.itertuples(index=False):
            x = np.asarray(df.loc[df["vec_id"] == r.vec_id, "embedding"].iloc[0],
                           dtype=np.float64)
            acc = 0.0
            for i, xi in enumerate(x):
                h = hashlib.md5(f"t|{r.j}|{i}".encode()).hexdigest()
                acc += xi * (1.0 if int(h[0], 16) % 2 == 0 else -1.0)
            assert r.y == round(acc / np.sqrt(4.0), 6) + 0.0

    def test_partitioning_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import jl_project

        df = self._embeds()
        a = (
            jl_project(ray.data.from_pandas(df))
            .to_pandas().sort_values(["vec_id", "j"]).reset_index(drop=True)
        )
        b = (
            jl_project(ray.data.from_pandas(df).repartition(7))
            .to_pandas().sort_values(["vec_id", "j"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_distance_preservation_in_expectation(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import jl_project

        df = self._embeds(n=40)
        proj = (
            jl_project(ray.data.from_pandas(df), out_dim=16)
            .to_pandas()
            .pivot(index="vec_id", columns="j", values="y")
            .sort_index()
        )
        X = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        Y = proj.to_numpy()
        rng = np.random.default_rng(0)
        ratios = []
        for _ in range(200):
            i, k = rng.integers(0, len(df), 2)
            if i == k:
                continue
            dx = np.sum((X[i] - X[k]) ** 2)
            dy = np.sum((Y[i] - Y[k]) ** 2)
            ratios.append(dy / dx)
        m = float(np.mean(ratios))
        # E[|y_a - y_b|^2] = |x_a - x_b|^2; k=16 keeps the mean near 1
        assert 0.7 < m < 1.3


class TestGridDbscan:
    def _blobs(self, seed=3):
        rng = np.random.RandomState(seed)
        a = rng.randn(300, 8) * 0.2 + np.r_[np.array([6.0, 6.0]), np.zeros(6)]
        b = rng.randn(300, 8) * 0.2 - np.r_[np.array([6.0, 6.0]), np.zeros(6)]
        noise = rng.uniform(-15, 15, size=(30, 8))
        m = np.vstack([a, b, noise])
        return pd.DataFrame(
            {"vec_id": range(len(m)), "embedding": list(m)}
        )

    def test_two_blobs_and_noise(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.clustering import grid_dbscan

        df = self._blobs()
        out = (
            grid_dbscan(
                ray.data.from_pandas(df).repartition(5),
                eps=1.0,
                min_pts=10,
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        lab_a = out.loc[:299, "cluster"]
        lab_b = out.loc[300:599, "cluster"]
        # each blob's dominant label covers ≥95% (edge points in sparse
        # cells are legitimately noise in the grid approximation) and
        # the two blobs land in different clusters
        dom_a = lab_a[lab_a >= 0].mode().iloc[0]
        dom_b = lab_b[lab_b >= 0].mode().iloc[0]
        assert (lab_a == dom_a).mean() > 0.95
        assert (lab_b == dom_b).mean() > 0.95
        assert dom_a != dom_b
        # scattered noise is mostly unlabeled
        assert (out.loc[600:, "cluster"] == -1).mean() > 0.8

    def test_partition_invariance(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.clustering import grid_dbscan

        df = self._blobs(seed=11)
        outs = [
            grid_dbscan(
                ray.data.from_pandas(df).repartition(p), eps=1.0, min_pts=10
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
            for p in (1, 6)
        ]
        pd.testing.assert_frame_equal(outs[0], outs[1])
