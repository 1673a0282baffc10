"""Table profiling + referential-integrity audit (ops/profile.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from pdf_parser_ray.ops.profile import (
    grouped_corr,
    orphan_count,
    profile_table,
    ri_audit,
)


@pytest.fixture()
def mixed_df():
    return pd.DataFrame(
        {
            "k": np.arange(10, dtype="int64"),
            "grp": ["a", "b"] * 5,
            "score": [1.5, 2.5, 1.5, None, 0.0, -3.25, 1.5, 2.5, None, 7.0],
            "when": pd.to_datetime(
                ["2024-01-01 00:00:00.000001"] * 3
                + ["2024-06-30 12:00:00"] * 6
                + [None],
                format="mixed",
            ),
            "all_null": pd.Series([None] * 10, dtype="Float64"),
        }
    )


def test_profile_table_counts_and_ranges(ray_session, mixed_df):
    ds = ray.data.from_pandas([mixed_df.iloc[:4], mixed_df.iloc[4:]])
    out = profile_table(ds)

    assert list(out.columns) == [
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_num", "max_num",
    ]
    assert list(out["col_name"]) == sorted(mixed_df.columns)
    prof = out.set_index("col_name")

    assert (prof["n_rows"] == 10).all()
    assert prof.loc["score", "n_nulls"] == 2
    assert prof.loc["all_null", "n_nulls"] == 10
    assert prof.loc["when", "n_nulls"] == 1

    # distincts exclude nulls
    assert prof.loc["k", "n_distinct"] == 10
    assert prof.loc["grp", "n_distinct"] == 2
    assert prof.loc["score", "n_distinct"] == 5
    assert prof.loc["when", "n_distinct"] == 2
    assert prof.loc["all_null", "n_distinct"] == 0

    # numeric ranges; string column carries the 0.0 sentinel
    assert prof.loc["score", "min_num"] == -3.25
    assert prof.loc["score", "max_num"] == 7.0
    assert prof.loc["k", "max_num"] == 9.0
    assert prof.loc["grp", "min_num"] == 0.0 and prof.loc["grp", "max_num"] == 0.0

    # timestamps on the epoch-MICROSECOND scale regardless of pandas unit
    expect_min = pd.Timestamp("2024-01-01 00:00:00.000001").value // 1000
    assert prof.loc["when", "min_num"] == float(expect_min)

    # dtypes are the declared contract (driver hashes by dtype)
    assert prof["n_rows"].dtype == "int64"
    assert prof["n_distinct"].dtype == "int64"


def test_orphan_count_with_planted_orphans(ray_session):
    parent = ray.data.from_pandas(
        pd.DataFrame({"pk": np.array([1, 2, 3, 5], dtype="int64")})
    )
    child = ray.data.from_pandas(
        pd.DataFrame(
            {"fk": pd.array([1, 1, 4, 5, None, 2], dtype="Int64"),
             "payload": list("abcdef")}
        )
    )
    n, orphans = orphan_count(child, "fk", parent, "pk")
    assert n == 6
    assert orphans == 2  # fk=4 has no parent; NULL fk references nothing


def test_grouped_corr_matches_numpy(ray_session):
    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], n // 2),
            "x": rng.randn(n),
        }
    )
    df["y"] = 0.7 * df["x"] + 0.3 * rng.randn(n)
    # nulls excluded pairwise; a constant group is dropped
    df.loc[5, "x"] = None
    df.loc[7, "y"] = None
    const = pd.DataFrame({"g": ["c"] * 4, "x": [1.0] * 4, "y": rng.randn(4)})
    full = pd.concat([df, const], ignore_index=True)

    ds = ray.data.from_pandas([full.iloc[:150], full.iloc[150:]])
    out = grouped_corr(ds, "x", "y", "g").to_pandas().set_index("g")

    assert "c" not in out.index  # zero x-variance -> dropped
    for g in ["a", "b"]:
        sub = full[(full["g"] == g)].dropna(subset=["x", "y"])
        expect = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert out.loc[g, "n"] == len(sub)
        assert abs(out.loc[g, "corr"] - round(expect, 4)) <= 1e-4


def test_ri_audit_shape(ray_session):
    parent = ray.data.from_pandas(
        pd.DataFrame({"pk": np.array([1, 2], dtype="int64")})
    )
    child = ray.data.from_pandas(
        pd.DataFrame({"fk": np.array([1, 2, 9], dtype="int64")})
    )
    out = ri_audit(
        [
            ("b_rel", child, "fk", parent, "pk"),
            ("a_rel", child, "fk", child, "fk"),
        ]
    )
    assert list(out["relation"]) == ["a_rel", "b_rel"]  # sorted
    assert list(out["n_orphans"]) == [0, 1]
    assert out["n_rows"].dtype == "int64"


def _ri_relations(sf_dir):
    from pdf_parser_ray.io_utils import read_parquet_clean

    def t(name, cols):
        return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=cols)

    nation_keys = t("nation", ["n_nationkey"])
    return [
        ("customer_nation", t("customer", ["c_nationkey"]), "c_nationkey",
         nation_keys, "n_nationkey"),
        ("lineitem_orders", t("lineitem", ["l_orderkey"]), "l_orderkey",
         t("orders", ["o_orderkey"]), "o_orderkey"),
        ("orders_customer", t("orders", ["o_custkey"]), "o_custkey",
         t("customer", ["c_custkey"]), "c_custkey"),
        ("supplier_nation", t("supplier", ["s_nationkey"]), "s_nationkey",
         nation_keys, "n_nationkey"),
    ]


def test_ri_audit_join_route_matches_broadcast_on_tpch(ray_session):
    """VERDICT r3 #1 parity gate: the co-partitioned join route must be
    value-identical to the broadcast route on the TPC-H fixture."""
    sf = "/root/testdata/sf0.001"
    bc = ri_audit(_ri_relations(sf), mode="broadcast")
    jn = ri_audit(_ri_relations(sf), mode="join")
    pd.testing.assert_frame_equal(bc, jn)


def test_ri_audit_auto_routes_fact_parent_without_driver_keys(
    ray_session, tmp_path
):
    """A fact-sized parent (footer estimate above broadcast_max_keys)
    must take the join route under auto — the driver never collects the
    parent key set — and produce the broadcast answer; a dimension-
    sized parent stays broadcast in the same call."""
    import ray.data

    from pdf_parser_ray.ops import profile as profile_mod

    rng = np.random.RandomState(17)
    fact_parent = pd.DataFrame(
        {"pk": np.arange(1000, dtype="int64")}
    )
    child = pd.DataFrame(
        {"fk": np.concatenate([
            rng.randint(0, 1000, 5000),        # valid
            np.full(37, 100_000),              # orphans
        ]).astype("int64")}
    )
    dim_parent = pd.DataFrame({"pk": np.array([0, 1, 2], dtype="int64")})
    dim_child = pd.DataFrame(
        {"fk": np.array([0, 1, 2, 2, 9], dtype="int64")}
    )
    pp, cp = str(tmp_path / "p.parquet"), str(tmp_path / "c.parquet")
    dp, dc = str(tmp_path / "dp.parquet"), str(tmp_path / "dc.parquet")
    fact_parent.to_parquet(pp)
    child.to_parquet(cp)
    dim_parent.to_parquet(dp)
    dim_child.to_parquet(dc)

    collected = []
    orig_put = profile_mod.ray.put

    def spy_put(obj, *a, **kw):
        collected.append(obj)
        return orig_put(obj, *a, **kw)

    rels = lambda: [
        ("fact_rel", ray.data.read_parquet(cp), "fk",
         ray.data.read_parquet(pp), "pk"),
        ("dim_rel", ray.data.read_parquet(dc), "fk",
         ray.data.read_parquet(dp), "pk"),
    ]
    profile_mod.ray.put = spy_put
    try:
        # force the 1000-key parent over the line; the 3-key dim under it
        auto = ri_audit(rels(), mode="auto", broadcast_max_keys=100)
    finally:
        profile_mod.ray.put = orig_put
    # the fact parent's keys were never ray.put by the audit (only the
    # dim parent's 3-key array was broadcast)
    assert all(
        not (isinstance(o, np.ndarray) and len(o) >= 1000) for o in collected
    )
    assert any(isinstance(o, np.ndarray) and len(o) == 3 for o in collected)
    bc = ri_audit(rels(), mode="broadcast")
    pd.testing.assert_frame_equal(auto, bc)
    got = auto.set_index("relation")
    assert got.loc["fact_rel", "n_orphans"] == 37
    assert got.loc["fact_rel", "n_rows"] == 5037
    assert got.loc["dim_rel", "n_orphans"] == 1


def test_ri_audit_null_fk_is_orphan_on_both_routes(ray_session):
    parent = ray.data.from_pandas(
        pd.DataFrame({"pk": np.array([1, 2, 3], dtype="int64")})
    )
    child = ray.data.from_pandas(
        pd.DataFrame({"fk": pd.array([1, None, 3, None, 7],
                                     dtype="Int64")})
    )
    for mode in ("broadcast", "join"):
        out = ri_audit(
            [("r", child, "fk", parent, "pk")], mode=mode
        ).set_index("relation")
        assert out.loc["r", "n_rows"] == 5, mode
        assert out.loc["r", "n_orphans"] == 3, mode  # 2 NULLs + fk=7


def test_key_skew_top_and_ties(ray_session):
    from pdf_parser_ray.ops.profile import key_skew

    df = pd.DataFrame({"k": [7] * 5 + [3] * 5 + [1] * 2 + [9]})
    out = key_skew(
        ray.data.from_pandas([df.iloc[:6], df.iloc[6:]]), "k", top_k=3
    ).to_pandas()
    # ties broken by key ASC; counts summed across partitions
    assert out["k"].tolist() == [3, 7, 1]
    assert out["n"].tolist() == [5, 5, 2]


class TestEmbeddingDimStats:
    def test_matches_numpy(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import embedding_dim_stats

        rng = np.random.RandomState(5)
        vecs = rng.randn(40, 8).astype(np.float32)
        df = pd.DataFrame({"embedding": list(vecs)})
        out = (
            embedding_dim_stats(
                ray.data.from_pandas([df.iloc[:17], df.iloc[17:]])
            )
            .to_pandas()
            .sort_values("dim")
        )
        m = vecs.astype(np.float64)
        exp_mean = np.round(m.mean(axis=0), 4)
        s, ss, n = m.sum(axis=0), (m * m).sum(axis=0), m.shape[0]
        exp_var = np.round((ss - s * s / n) / n, 4)
        assert out["dim"].tolist() == list(range(1, 9))
        assert np.allclose(out["mean"].to_numpy(), exp_mean, atol=1e-9)
        assert np.allclose(out["variance"].to_numpy(), exp_var, atol=1e-9)


class TestGroupedZscoreOutliers:
    def test_flags_the_planted_spike(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import grouped_zscore_outliers

        # user 1: 20 values at ~10.00 and one 99.99 spike; user 2 flat
        vals = [10.0 + 0.01 * i for i in range(20)] + [99.99]
        rows = pd.DataFrame(
            {
                "event_id": range(1, len(vals) + 3),
                "user_id": [1] * len(vals) + [2, 2],
                "value": vals + [5.0, 5.0],
            }
        )
        out = (
            grouped_zscore_outliers(ray.data.from_pandas(rows))
            .to_pandas()
            .sort_values("event_id")
        )
        assert out["is_outlier"].tolist() == [False] * 20 + [True, False, False]


class TestDupRatioBySource:
    def test_exact_ratio(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import dup_ratio_by_source

        df = pd.DataFrame(
            {
                "source": ["a"] * 4 + ["b"] * 2,
                "text": ["x", "x", "y", "x", "p", "q"],
            }
        )
        out = (
            dup_ratio_by_source(ray.data.from_pandas([df.iloc[:3], df.iloc[3:]]))
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert out["n_docs"].tolist() == [4, 2]
        assert out["n_distinct"].tolist() == [2, 2]
        assert out["dup_ratio"].tolist() == [0.5, 0.0]


class TestTableChecksum:
    def test_order_insensitive_and_sensitive_to_change(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import table_checksum

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "source": ["a", "a", "a"],
                "text": ["t1", "t2", "t3"],
            }
        )
        c1 = table_checksum(
            ray.data.from_pandas(df), "doc_id", "text"
        ).to_pandas()["checksum_hex"].iloc[0]
        # row order / partitioning must not matter
        c2 = table_checksum(
            ray.data.from_pandas(
                [df.iloc[::-1].iloc[:2], df.iloc[::-1].iloc[2:]]
            ),
            "doc_id",
            "text",
        ).to_pandas()["checksum_hex"].iloc[0]
        assert c1 == c2 and len(c1) == 16
        # any row change must change the checksum
        df2 = df.assign(text=["t1", "t2", "t4"])
        c3 = table_checksum(
            ray.data.from_pandas(df2), "doc_id", "text"
        ).to_pandas()["checksum_hex"].iloc[0]
        assert c3 != c1


class TestIsotonicCalibration:
    def test_hand_worked_pava(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import isotonic_calibration

        # bins 0..2 (width 1): rates 0.2, 0.8, 0.5 -> last two pool to
        # (4+1)/ (5+2) = 5/7; bin 0 stays 1/5.
        rows = (
            [(0, True)] * 1 + [(0, False)] * 4
            + [(1, True)] * 4 + [(1, False)] * 1
            + [(2, True)] * 1 + [(2, False)] * 1
        )
        df = pd.DataFrame(rows, columns=["score", "pos"])
        out = (
            isotonic_calibration(
                ray.data.from_pandas(df), "score", "pos", bin_width=1
            )
            .sort_values("bin")
            .reset_index(drop=True)
        )
        assert out["fitted"].tolist() == [1 / 5, 5 / 7, 5 / 7]
        assert out["frac_pos"].tolist() == [1 / 5, 4 / 5, 1 / 2]

    def test_monotone_and_mass_preserving(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import isotonic_calibration

        rng = np.random.default_rng(3)
        score = rng.integers(0, 200, 2000)
        pos = rng.random(2000) < (score / 400 + rng.normal(0, 0.2, 2000))
        df = pd.DataFrame({"score": score.astype(np.int64), "pos": pos})
        out = (
            isotonic_calibration(ray.data.from_pandas(df), "score", "pos")
            .sort_values("bin")
            .reset_index(drop=True)
        )
        f = out["fitted"].to_numpy()
        assert np.all(np.diff(f) >= 0)
        assert 0.0 <= f.min() and f.max() <= 1.0
        # PAVA preserves weighted mass: sum n*fitted == sum positives
        assert abs((out["n"] * out["fitted"]).sum() - out["n_pos"].sum()) < 1e-9


class TestNdcgAtK:
    def test_hand_computed(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import ndcg_at_k

        # ranking by score DESC: ids 3(rel1), 2(rel0), 1(rel1), 0(rel0)
        df = pd.DataFrame(
            {
                "id": [0, 1, 2, 3],
                "score": [1, 2, 3, 4],
                "rel": [0, 1, 0, 1],
            }
        )
        out = ndcg_at_k(
            ray.data.from_pandas(df), "score", "rel", "id", k=3
        )
        dcg = 1 / np.log2(2) + 0 / np.log2(3) + 1 / np.log2(4)
        idcg = 1 / np.log2(2) + 1 / np.log2(3)
        assert out["dcg"].iloc[0] == round(dcg, 6)
        assert out["idcg"].iloc[0] == round(idcg, 6)
        assert out["ndcg"].iloc[0] == round(
            round(dcg, 6) / round(idcg, 6), 6
        )

    def test_perfect_and_zero_rankings(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import ndcg_at_k

        # perfect: score == rel ordering -> ndcg 1.0
        df = pd.DataFrame(
            {"id": range(6), "score": [6, 5, 4, 3, 2, 1],
             "rel": [1, 1, 1, 0, 0, 0]}
        )
        out = ndcg_at_k(ray.data.from_pandas(df), "score", "rel", "id", k=3)
        assert out["ndcg"].iloc[0] == 1.0
        # all-zero relevance -> idcg 0 -> ndcg defined as 0.0
        df0 = df.assign(rel=0)
        out0 = ndcg_at_k(ray.data.from_pandas(df0), "score", "rel", "id", k=3)
        assert out0["idcg"].iloc[0] == 0.0 and out0["ndcg"].iloc[0] == 0.0

    def test_partitioning_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import ndcg_at_k

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                "id": np.arange(500, dtype=np.int64),
                "score": rng.integers(0, 50, 500),  # heavy score ties
                "rel": rng.integers(0, 3, 500),     # graded relevance
            }
        )
        a = ndcg_at_k(ray.data.from_pandas(df), "score", "rel", "id", k=10)
        b = ndcg_at_k(
            ray.data.from_pandas(df).repartition(9),
            "score", "rel", "id", k=10,
        )
        pd.testing.assert_frame_equal(a, b)


class TestRankingMetrics:
    def test_hand_computed(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import ranking_metrics

        # ranking: ids by score desc -> rel pattern 0,1,0,1,0
        df = pd.DataFrame(
            {
                "id": [0, 1, 2, 3, 4],
                "score": [5, 4, 3, 2, 1],
                "rel": [0, 1, 0, 1, 0],
            }
        )
        out = ranking_metrics(
            ray.data.from_pandas(df), "score", "rel", "id", k=3
        )
        assert out["hits"].iloc[0] == 1           # only rank-2 hit in top-3
        assert out["n_relevant"].iloc[0] == 2
        assert out["mrr"].iloc[0] == 0.5          # first hit at position 2
        assert out["precision"].iloc[0] == round(1 / 3, 6)
        assert out["recall"].iloc[0] == 0.5

    def test_no_relevant_in_topk(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import ranking_metrics

        df = pd.DataFrame(
            {"id": range(6), "score": [6, 5, 4, 3, 2, 1],
             "rel": [0, 0, 0, 0, 1, 1]}
        )
        out = ranking_metrics(
            ray.data.from_pandas(df), "score", "rel", "id", k=3
        )
        assert out["mrr"].iloc[0] == 0.0          # MRR@k truncation
        assert out["hits"].iloc[0] == 0
        assert out["recall"].iloc[0] == 0.0
        assert out["n_relevant"].iloc[0] == 2

    def test_partitioning_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import ranking_metrics

        rng = np.random.default_rng(9)
        df = pd.DataFrame(
            {
                "id": np.arange(400, dtype=np.int64),
                "score": rng.integers(0, 30, 400),
                "rel": (rng.random(400) < 0.2).astype(np.int64),
            }
        )
        a = ranking_metrics(ray.data.from_pandas(df), "score", "rel", "id")
        b = ranking_metrics(
            ray.data.from_pandas(df).repartition(11), "score", "rel", "id"
        )
        pd.testing.assert_frame_equal(a, b)


class TestMannWhitneyU:
    def _serial(self, a, b):
        # textbook twin: average ranks over the pooled sample
        pooled = pd.Series(list(a) + list(b))
        ranks = pooled.rank(method="average")
        ra = ranks.iloc[: len(a)].sum()
        na, nb = len(a), len(b)
        u = ra - na * (na + 1) / 2
        n = na + nb
        t = pooled.value_counts().to_numpy()
        tie = float((t**3 - t).sum())
        var = na * nb / 12.0 * ((n + 1) - tie / (n * (n - 1)))
        z = (u - na * nb / 2.0) / np.sqrt(var)
        return u, z

    def test_vs_serial_twin_with_ties(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import mann_whitney_u

        rng = np.random.RandomState(7)
        a = np.round(rng.gamma(2.0, 5.0, 400), 2)  # shifted population
        b = np.round(rng.gamma(2.0, 4.0, 300), 2)  # heavy ties at 2dp
        df = pd.DataFrame(
            {
                "grp": ["a"] * len(a) + ["b"] * len(b),
                "value": np.concatenate([a, b]),
            }
        )
        out = mann_whitney_u(
            ray.data.from_pandas(df).repartition(7),
            "value",
            "grp",
            "a",
            "b",
        )
        u_ref, z_ref = self._serial(
            np.rint(a * 100).astype(int), np.rint(b * 100).astype(int)
        )
        assert out["n_a"].iloc[0] == 400 and out["n_b"].iloc[0] == 300
        assert out["u"].iloc[0] == u_ref
        assert abs(out["z"].iloc[0] - z_ref) < 1e-6

    def test_other_labels_ignored_and_sign(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import mann_whitney_u

        df = pd.DataFrame(
            {
                "grp": ["a", "a", "a", "b", "b", "b", "x", "x"],
                "value": [10.0, 11.0, 12.0, 1.0, 2.0, 3.0, 99.0, 98.0],
            }
        )
        out = mann_whitney_u(
            ray.data.from_pandas(df), "value", "grp", "a", "b"
        )
        # every a beats every b: U = na*nb = 9, z positive
        assert out["n_a"].iloc[0] == 3 and out["n_b"].iloc[0] == 3
        assert out["u"].iloc[0] == 9.0
        assert out["z"].iloc[0] > 0


class TestEmbeddingPca:
    def _data(self, n=300, dim=6, seed=3):
        rng = np.random.RandomState(seed)
        # anisotropic: variance concentrated on two known directions
        scale = np.linspace(5.0, 0.1, dim)
        base = rng.randn(n, dim) * scale
        return pd.DataFrame(
            {"vec_id": range(n), "embedding": list(base + rng.randn(dim))}
        )

    def test_matches_numpy_pca(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import embedding_pca

        df = self._data()
        out = (
            embedding_pca(
                ray.data.from_pandas(df).repartition(5), n_components=2
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        m = np.vstack(df["embedding"].to_numpy())
        mu = m.mean(axis=0)
        cov = (m - mu).T @ (m - mu) / len(m)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(evals)[::-1][:2]
        comps = evecs[:, order].T.copy()
        for c in comps:
            if c[np.argmax(np.abs(c))] < 0:
                c *= -1.0
        exp = (m - mu) @ comps.T
        # moment-pass covariance differs from the centered two-pass one
        # only in float summation order -> projections agree to ~1e-6
        assert np.allclose(out[["pc1", "pc2"]].to_numpy(), exp, atol=1e-4)

    def test_partitioning_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import embedding_pca

        df = self._data(n=120, dim=4, seed=9)
        outs = []
        for parts in (1, 7):
            outs.append(
                embedding_pca(
                    ray.data.from_pandas(df).repartition(parts),
                    n_components=2,
                )
                .to_pandas()
                .sort_values("vec_id")
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1], atol=1e-9, rtol=0)

    def test_scree_invariants(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import embedding_pca_variance

        df = self._data(n=200, dim=5, seed=1)
        out = embedding_pca_variance(
            ray.data.from_pandas(df), n_components=5
        )
        ev = out["eigenvalue"].to_numpy()
        assert (np.diff(ev) <= 1e-12).all()  # descending
        assert (ev >= -1e-9).all()
        assert abs(out["evr"].sum() - 1.0) < 1e-4  # all 5 of 5 dims


class TestBcubedEval:
    def _run(self, pred, truth, parts=4):
        import ray.data

        from pdf_parser_ray.ops.profile import bcubed_eval

        df = pd.DataFrame(
            {"id": range(len(pred)), "pred": pred, "truth": truth}
        )
        return bcubed_eval(
            ray.data.from_pandas(df).repartition(parts), "pred", "truth"
        )

    def test_perfect_clustering(self, ray_session):
        out = self._run(["a", "a", "b", "b", "c"], ["x", "x", "y", "y", "z"])
        assert out["precision"].iloc[0] == 1.0
        assert out["recall"].iloc[0] == 1.0
        assert out["f1"].iloc[0] == 1.0

    def test_textbook_case(self, ray_session):
        # all items in ONE predicted cluster, truth = two classes 3+2:
        # precision = (3·(3/5) + 2·(2/5))/5 = 13/25; recall = 1
        out = self._run(["p"] * 5, ["x", "x", "x", "y", "y"])
        assert out["precision"].iloc[0] == round(13 / 25, 6)
        assert out["recall"].iloc[0] == 1.0
        # and the symmetric split: singletons predicted, recall drops
        out2 = self._run(list("abcde"), ["x", "x", "x", "y", "y"])
        assert out2["precision"].iloc[0] == 1.0
        assert out2["recall"].iloc[0] == round(
            (3 * (1 / 3) + 2 * (1 / 2)) / 5, 6
        )

    def test_partition_invariance(self, ray_session):
        rng = np.random.RandomState(0)
        pred = rng.randint(0, 20, 500).astype(str)
        truth = rng.randint(0, 15, 500).astype(str)
        a = self._run(pred, truth, parts=1)
        b = self._run(pred, truth, parts=9)
        pd.testing.assert_frame_equal(a, b)


class TestConformalOlsIntervals:
    def test_coverage_and_quantile_rule(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import conformal_ols_intervals

        rng = np.random.RandomState(4)
        n = 2000
        x = rng.randint(1, 50, n)
        noise = rng.randn(n) * 3.0
        y = 2.5 * x + 10 + noise  # dollars
        df = pd.DataFrame(
            {"id": range(n), "g": ["b"] * n, "x": x, "y": np.round(y, 2)}
        )
        out = conformal_ols_intervals(
            ray.data.from_pandas(df).repartition(6),
            "x", "y", "g", "id", alpha_permille=100,
        ).to_pandas()
        assert len(out) == 1
        r = out.iloc[0]
        assert r["n_fit"] + r["n_cal"] == n
        # slope recovered near 2.5 (cents domain: 250 per size unit)
        assert abs(r["slope"] - 250) < 10
        # conformal guarantee on the calibration residuals themselves:
        # ≥ (1-α) of them fall within q_hat
        cal = df[df["id"] % 2 == 1]
        yc = np.rint(cal["y"].to_numpy() * 100)
        pred = r["slope"] * cal["x"].to_numpy() + r["intercept"]
        res = np.rint(np.abs(yc - pred))
        frac = (res <= r["q_hat_cents"]).mean()
        n_cal = int(r["n_cal"])
        rank = min(n_cal, -(-((n_cal + 1) * 900) // 1000))
        assert frac >= rank / n_cal - 1e-12
        # and q_hat is EXACTLY the rank-th smallest snapped residual
        assert r["q_hat_cents"] == int(np.sort(res)[rank - 1])

    def test_degenerate_group_dropped(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import conformal_ols_intervals

        # constant x in the fit half -> zero denominator -> group absent
        df = pd.DataFrame(
            {
                "id": range(8),
                "g": ["z"] * 8,
                "x": [5] * 8,
                "y": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
            }
        )
        out = conformal_ols_intervals(
            ray.data.from_pandas(df), "x", "y", "g", "id"
        ).to_pandas()
        assert len(out) == 0


class TestGroupedWelchFdr:
    def test_normal_tail_polynomial_accuracy(self):
        import math

        from pdf_parser_ray.ops.profile import _norm_sf

        for x in (0.0, 0.5, 1.0, 1.96, 2.58, 4.0):
            exact = 0.5 * math.erfc(x / math.sqrt(2))
            assert abs(_norm_sf(x) - exact) < 1e-7, x  # A&S 26.2.17 bound

    def test_planted_effect_and_bh(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import grouped_welch_fdr

        rng = np.random.RandomState(2)
        frames = []
        # group 'shift': even users pay 2 units more; 3 null groups
        for g, delta in [("shift", 2.0), ("n1", 0), ("n2", 0), ("n3", 0)]:
            n = 1200
            uid = np.arange(n)
            val = np.round(rng.gamma(4, 2, n) + delta * (uid % 2 == 0), 2)
            frames.append(
                pd.DataFrame({"g": g, "uid": uid, "val": val})
            )
        df = pd.concat(frames, ignore_index=True)
        out = grouped_welch_fdr(
            ray.data.from_pandas(df).repartition(5), "val", "g", "uid"
        ).set_index("g")
        assert bool(out.loc["shift", "significant"])
        assert out.loc["shift", "p_adj"] <= 0.05
        # BH invariants: p_adj >= p, p_adj monotone in p-rank
        s = out.sort_values("p")
        assert (s["p_adj"].to_numpy() >= s["p"].to_numpy() - 1e-12).all()
        assert (np.diff(s["p_adj"].to_numpy()) >= -1e-12).all()

    def test_bh_hand_case(self, ray_session):
        # verify the suffix-min rule on a crafted p vector via the op's
        # own output: groups engineered to produce distinct p values
        import ray.data

        from pdf_parser_ray.ops.profile import grouped_welch_fdr

        rng = np.random.RandomState(7)
        frames = []
        for g, delta in [("a", 3.0), ("b", 0.6), ("c", 0.0)]:
            n = 400
            uid = np.arange(n)
            val = np.round(rng.gamma(4, 2, n) + delta * (uid % 2 == 0), 2)
            frames.append(pd.DataFrame({"g": g, "uid": uid, "val": val}))
        out = grouped_welch_fdr(
            ray.data.from_pandas(pd.concat(frames)), "val", "g", "uid"
        )
        m = len(out)
        s = out.sort_values(["p", "g"]).reset_index(drop=True)
        raw = [p * m / (i + 1) for i, p in enumerate(s["p"])]
        exp = []
        run = float("inf")
        for i in range(m - 1, -1, -1):
            run = min(run, raw[i])
            exp.append(round(min(1.0, run), 6))
        exp.reverse()
        assert s["p_adj"].tolist() == exp


class TestDiffInDiff:
    def test_planted_interaction_recovered(self, ray_session):
        import hashlib

        import ray.data

        from pdf_parser_ray.ops.profile import diff_in_diff

        rng = np.random.RandomState(6)
        n = 4000
        uid = rng.randint(0, 500, n)
        ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
            rng.randint(0, 30, n), unit="D"
        )
        treat = np.array([
            hashlib.md5(str(u).encode()).hexdigest()[0] < "8" for u in uid
        ])
        post = ts >= pd.Timestamp("2024-01-16")
        base = rng.gamma(4, 2, n)
        val = np.round(base + 5.0 * (treat & post), 2)  # +5 units planted
        df = pd.DataFrame({"ts": ts, "uid": uid, "val": val})
        out = diff_in_diff(
            ray.data.from_pandas(df).repartition(5),
            "ts", "val", "uid", split_ts=pd.Timestamp("2024-01-16"),
        )
        r = out.iloc[0]
        assert r[["n_tp", "n_tq", "n_cp", "n_cq"]].sum() == n
        assert abs(r["did"] - 500) < 60  # cents
        assert r["z"] > 5

    def test_null_effect_small_z(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import diff_in_diff

        rng = np.random.RandomState(1)
        n = 4000
        df = pd.DataFrame(
            {
                "ts": pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.randint(0, 30, n), unit="D"),
                "uid": rng.randint(0, 500, n),
                "val": np.round(rng.gamma(4, 2, n), 2),
            }
        )
        out = diff_in_diff(
            ray.data.from_pandas(df), "ts", "val", "uid",
            split_ts=pd.Timestamp("2024-01-16"),
        )
        assert abs(out["z"].iloc[0]) < 3


class TestJamesSteinMeans:
    def test_shrinks_toward_grand_and_order_preserved(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import james_stein_means

        rng = np.random.RandomState(8)
        frames = []
        # five sparse groups with noisy means around 10, true equal
        for g in "abcde":
            frames.append(pd.DataFrame({
                "g": g, "val": np.round(rng.gamma(4, 2.5, 12), 2)
            }))
        df = pd.concat(frames, ignore_index=True)
        out = james_stein_means(
            ray.data.from_pandas(df).repartition(3), "val", "g"
        ).to_pandas()
        c = out["shrink_c"].iloc[0]
        assert (out["shrink_c"] == c).all()
        assert 0.0 < c <= 1.0  # sparse noisy groups shrink substantially
        grand = (df["val"] * 100).round().sum() / len(df)
        for _, r in out.iterrows():
            # shrunk lies between raw and grand
            lo, hi = sorted([r["raw_mean"], grand])
            assert lo - 1e-6 <= r["shrunk_mean"] <= hi + 1e-6

    def test_large_samples_barely_shrink(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import james_stein_means

        rng = np.random.RandomState(3)
        frames = []
        for i, mu in enumerate([5.0, 10.0, 20.0, 40.0, 80.0]):
            frames.append(pd.DataFrame({
                "g": f"g{i}", "val": np.round(rng.normal(mu, 1.0, 5000), 2)
            }))
        out = james_stein_means(
            ray.data.from_pandas(pd.concat(frames)), "val", "g"
        ).to_pandas()
        assert out["shrink_c"].iloc[0] < 1e-3
        assert np.allclose(out["shrunk_mean"], out["raw_mean"], atol=1.0)


class TestTheilSenSlope:
    def test_robust_to_outliers_vs_ols(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import theil_sen_slope

        rng = np.random.RandomState(2)
        n = 60
        x = rng.randint(1, 40, n)
        y = 3.0 * x + 5 + rng.randn(n) * 0.5
        y[:6] += 500.0  # gross outliers that wreck OLS
        df = pd.DataFrame(
            {"id": range(n), "g": "b", "x": x, "y": np.round(y, 2)}
        )
        out = theil_sen_slope(
            ray.data.from_pandas(df).repartition(4), "x", "y", "g", "id"
        )
        # cents domain: true slope 300; the 10% outliers barely move it
        assert abs(out["theil_slope"].iloc[0] - 300) < 40
        assert out["n_sample"].iloc[0] == 40
        assert out["n_pairs"].iloc[0] <= 40 * 39 // 2

    def test_partition_invariance_and_small_group(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import theil_sen_slope

        rng = np.random.RandomState(9)
        df = pd.DataFrame(
            {
                "id": range(25),
                "g": "s",
                "x": rng.randint(1, 10, 25),
                "y": np.round(rng.gamma(3, 2, 25), 2),
            }
        )
        outs = [
            theil_sen_slope(
                ray.data.from_pandas(df).repartition(p), "x", "y", "g", "id"
            )
            for p in (1, 6)
        ]
        pd.testing.assert_frame_equal(outs[0], outs[1])
        assert outs[0]["n_sample"].iloc[0] == 25  # < k keeps all


class TestAndersonDarling:
    def _run(self, frames, parts=4):
        import ray.data

        from pdf_parser_ray.ops.profile import grouped_anderson_darling

        df = pd.concat(frames, ignore_index=True)
        return (
            grouped_anderson_darling(
                ray.data.from_pandas(df).repartition(parts), "val", "g"
            )
            .to_pandas()
            .set_index("g")
        )

    def test_normal_small_uniform_large(self, ray_session):
        rng = np.random.RandomState(5)
        normal = pd.DataFrame(
            {"g": "norm", "val": np.round(rng.normal(50, 10, 4000), 2)}
        )
        uniform = pd.DataFrame(
            {"g": "unif", "val": np.round(rng.uniform(0, 100, 4000), 2)}
        )
        bimodal = pd.DataFrame(
            {"g": "bimo", "val": np.round(np.concatenate([
                rng.normal(20, 2, 2000), rng.normal(80, 2, 2000)
            ]), 2)}
        )
        out = self._run([normal, uniform, bimodal])
        # A² small for the true normal, large for the others
        assert out.loc["norm", "a2"] < 2.5
        assert out.loc["unif", "a2"] > 10
        assert out.loc["bimo", "a2"] > 100

    def test_vs_rowwise_reference(self, ray_session):
        # the histogram-run formula must equal the textbook per-row sum
        import math

        from pdf_parser_ray.ops.profile import _norm_sf

        rng = np.random.RandomState(1)
        vals = np.round(rng.gamma(4, 3, 500), 2)
        out = self._run([pd.DataFrame({"g": "x", "val": vals})])
        cents = np.rint(vals * 100).astype(np.int64)
        n = len(cents)
        mean = int(cents.sum()) / n
        std = np.sqrt(n * int((cents.astype(object) ** 2).sum())
                      - int(cents.sum()) ** 2) / n
        zs = np.sort((cents - mean) / std)

        def log_phi(z):
            q = _norm_sf(abs(z))
            return math.log(1 - q) if z >= 0 else math.log(q)

        def log_sf(z):
            q = _norm_sf(abs(z))
            return math.log(q) if z >= 0 else math.log(1 - q)

        s = sum(
            (2 * (i + 1) - 1) * (log_phi(zs[i]) + log_sf(zs[n - 1 - i]))
            for i in range(n)
        )
        a2_ref = -n - s / n
        assert abs(out.loc["x", "a2"] - round(a2_ref, 4)) < 2e-4

    def test_constant_group_drops(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import grouped_anderson_darling

        ds = ray.data.from_pandas(
            pd.DataFrame({"g": ["c"] * 40, "val": [5.0] * 40})
        )
        # zero variance → no testable group (empty result; Ray's
        # to_pandas drops columns on empty datasets, so assert count)
        assert grouped_anderson_darling(ds, "val", "g").count() == 0
