"""Semantic pins for the session-8 statistical ops (skyline, OLS,
skew/kurt, rank-AUC, lag-1 ACF) — hand-computable fixtures, plus the
partitioning-invariance properties their distributed plans rely on.
(Oracle parity at sf0.001 is covered by tests/test_queries.py's
parametrized sweep.)"""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data


def _ds(df: pd.DataFrame, blocks: int = 1) -> ray.data.Dataset:
    ds = ray.data.from_pandas(df)
    return ds.repartition(blocks) if blocks > 1 else ds


# ------------------------------------------------------------- skyline

def test_skyline_basic(ray_session):
    from pdf_parser_ray.ops.relational import skyline

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "price": [10.0, 10.0, 12.0, 8.0, 15.0, 8.0],
            "size": [5, 7, 9, 3, 9, 3],
        }
    )
    # fronts: (8,3) both ties survive; (10,7) beats (10,5); (12,9)
    # survives; (15,9) dominated by (12,9).
    out = (
        skyline(_ds(df), "price", "size", keep_cols=["id"])
        .to_pandas()
        .sort_values("id")
    )
    assert sorted(out["id"]) == [2, 3, 4, 6]


def test_skyline_partition_invariant(ray_session):
    from pdf_parser_ray.ops.relational import skyline

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "id": np.arange(400),
            "price": rng.integers(0, 50, 400).astype("float64"),
            "size": rng.integers(0, 50, 400),
        }
    )
    fronts = []
    for blocks in (1, 7):
        out = skyline(_ds(df, blocks), "price", "size", keep_cols=["id"])
        fronts.append(sorted(out.to_pandas()["id"].tolist()))
    assert fronts[0] == fronts[1]
    # brute-force dominance check
    front = set(fronts[0])
    pts = df.set_index("id")
    for i in df["id"]:
        dominated = any(
            (pts.loc[j, "price"] <= pts.loc[i, "price"])
            and (pts.loc[j, "size"] >= pts.loc[i, "size"])
            and (
                (pts.loc[j, "price"] < pts.loc[i, "price"])
                or (pts.loc[j, "size"] > pts.loc[i, "size"])
            )
            for j in df["id"]
            if j != i
        )
        assert (i in front) == (not dominated), f"id {i}"


# ----------------------------------------------------------------- OLS

def test_grouped_ols_exact_line(ray_session):
    from pdf_parser_ray.ops.profile import grouped_ols

    # y = 2.5x + 10 exactly -> slope 2.5, intercept 10
    x = np.array([1, 2, 3, 4, 5, 6], dtype="int64")
    df = pd.DataFrame({"g": ["a"] * 6, "x": x, "y": 2.5 * x + 10.0})
    out = grouped_ols(_ds(df, 3), "x", "y", "g", y_cents=True).to_pandas()
    assert len(out) == 1
    assert out["slope"].iloc[0] == pytest.approx(2.5, abs=1e-6)
    assert out["intercept"].iloc[0] == pytest.approx(10.0, abs=1e-6)
    assert out["n"].iloc[0] == 6


def test_grouped_ols_matches_numpy(ray_session):
    from pdf_parser_ray.ops.profile import grouped_ols

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 300),
            "x": rng.integers(1, 40, 300),
            "y": np.round(rng.normal(100, 20, 300), 2),
        }
    )
    out = (
        grouped_ols(_ds(df, 4), "x", "y", "g", y_cents=True)
        .to_pandas()
        .set_index("g")
    )
    for g, grp in df.groupby("g"):
        slope, intercept = np.polyfit(grp["x"], grp["y"], 1)
        assert out.loc[g, "slope"] == pytest.approx(slope, abs=1e-4)
        assert out.loc[g, "intercept"] == pytest.approx(intercept, abs=1e-4)


# ----------------------------------------------------------- skew/kurt

def test_grouped_skew_kurt_matches_scipy_formulas(ray_session):
    from pdf_parser_ray.ops.profile import grouped_skew_kurt

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 500),
            "v": np.round(rng.gamma(2.0, 10.0, 500), 2),
        }
    )
    out = (
        grouped_skew_kurt(_ds(df, 5), "v", "g").to_pandas().set_index("g")
    )
    for g, grp in df.groupby("g"):
        x = grp["v"].to_numpy()
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        assert out.loc[g, "skewness"] == pytest.approx(
            m3 / m2**1.5, abs=1e-3
        )
        assert out.loc[g, "kurtosis"] == pytest.approx(
            m4 / m2**2 - 3.0, abs=1e-3
        )
        assert out.loc[g, "n"] == len(grp)


def test_grouped_skew_kurt_drops_constant_group(ray_session):
    from pdf_parser_ray.ops.profile import grouped_skew_kurt

    df = pd.DataFrame({"g": ["c"] * 5 + ["v"] * 5,
                       "v": [7.0] * 5 + [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = grouped_skew_kurt(_ds(df), "v", "g").to_pandas()
    assert set(out["g"]) == {"v"}  # zero-variance group dropped


# ------------------------------------------------------------ rank AUC

def test_rank_auc_hand_case(ray_session):
    from pdf_parser_ray.ops.profile import rank_auc

    # scores: pos {3, 5}, neg {1, 3}; pairs: (3>1)=1, (3=3)=.5,
    # (5>1)=1, (5>3)=1  -> AUC = 3.5/4 = 0.875
    df = pd.DataFrame({"s": [3, 5, 1, 3], "pos": [True, True, False, False]})
    out = rank_auc(_ds(df, 2), "s", "pos")
    assert out["auc"].iloc[0] == pytest.approx(0.875)
    assert out["n_pos"].iloc[0] == 2 and out["n_neg"].iloc[0] == 2


def test_rank_auc_matches_sklearn_style_ranksum(ray_session):
    from pdf_parser_ray.ops.profile import rank_auc

    rng = np.random.default_rng(5)
    s = rng.integers(0, 30, 400)
    pos = rng.random(400) < (s / 40.0)  # higher score => more positives
    df = pd.DataFrame({"s": s, "pos": pos})
    out = rank_auc(_ds(df, 4), "s", "pos")
    # reference: Mann-Whitney U via average ranks
    ranks = pd.Series(s).rank(method="average").to_numpy()
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    u = ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0
    assert out["auc"].iloc[0] == pytest.approx(u / (n_pos * n_neg), abs=1e-6)


def test_rank_auc_degenerate_single_class(ray_session):
    from pdf_parser_ray.ops.profile import rank_auc

    df = pd.DataFrame({"s": [1, 2, 3], "pos": [True, True, True]})
    out = rank_auc(_ds(df), "s", "pos")
    assert math.isnan(out["auc"].iloc[0])
    assert out["n_neg"].iloc[0] == 0


# ------------------------------------------------------------ ACF lag1

def _acf_reference(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for k, g in df.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        x = np.rint(g["value"].to_numpy() * 100).astype("int64")
        if len(x) < 2:
            continue
        prev, cur = x[:-1].astype(float), x[1:].astype(float)
        c = np.corrcoef(prev, cur)[0, 1]
        rows.append((k, len(cur), round(c, 6)))
    return pd.DataFrame(rows, columns=["event_type", "n_pairs", "acf1"])


def test_acf_lag1_matches_reference_across_days(ray_session):
    from pdf_parser_ray.ops.windows import acf_lag1

    rng = np.random.default_rng(9)
    n = 600
    # spread over ~6 days so cross-midnight stitching is exercised
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 6 * 86400, n), unit="s"
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "event_type": rng.choice(["x", "y"], n),
            "value": np.round(rng.normal(50, 10, n), 2),
        }
    )
    out = acf_lag1(_ds(df, 5)).set_index("event_type")
    ref = _acf_reference(df).set_index("event_type")
    assert sorted(out.index) == sorted(ref.index)
    for k in ref.index:
        assert out.loc[k, "n_pairs"] == ref.loc[k, "n_pairs"]
        assert out.loc[k, "acf1"] == pytest.approx(
            ref.loc[k, "acf1"], abs=2e-6
        )


def test_acf_lag1_positive_on_trending_series(ray_session):
    from pdf_parser_ray.ops.windows import acf_lag1

    n = 200
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(n) * 3600, unit="s"),
            "event_type": ["t"] * n,
            "value": np.linspace(1.0, 200.0, n),
        }
    )
    out = acf_lag1(_ds(df, 3))
    assert out["acf1"].iloc[0] > 0.99


# ------------------------------------------------------- chi2 / benford / zipf

def test_contingency_chi2_hand_case(ray_session):
    from pdf_parser_ray.ops.profile import contingency_chi2

    # 2x2: rows A/B, cols X/Y with counts [[10, 20], [20, 10]]
    df = pd.DataFrame(
        {
            "r": ["A"] * 30 + ["B"] * 30,
            "c": ["X"] * 10 + ["Y"] * 20 + ["X"] * 20 + ["Y"] * 10,
        }
    )
    out = contingency_chi2(_ds(df, 3), "r", "c")
    # expected all cells 15 -> chi2 = 4 * 25/15 = 6.666667
    assert out["chi2"].iloc[0] == pytest.approx(20.0 / 3.0, abs=1e-5)
    assert out["dof"].iloc[0] == 1
    assert out["cramers_v"].iloc[0] == pytest.approx(
        math.sqrt((20.0 / 3.0) / 60.0), abs=1e-5
    )
    assert out["n"].iloc[0] == 60


def test_contingency_chi2_independent_is_zero(ray_session):
    from pdf_parser_ray.ops.profile import contingency_chi2

    # perfectly proportional table -> chi2 == 0
    df = pd.DataFrame(
        {
            "r": ["A"] * 40 + ["B"] * 20,
            "c": (["X"] * 10 + ["Y"] * 30) + (["X"] * 5 + ["Y"] * 15),
        }
    )
    out = contingency_chi2(_ds(df, 2), "r", "c")
    assert out["chi2"].iloc[0] == pytest.approx(0.0, abs=1e-9)


def test_benford_digit_counts_exact(ray_session):
    from pdf_parser_ray.ops.profile import benford_digit_counts

    # cents: 100->digit 1, 999->9, 1000->1, 95->9, 0/neg dropped
    df = pd.DataFrame(
        {
            "g": ["a"] * 6,
            "v": [1.00, 9.99, 10.00, 0.95, 0.0, -3.5],
        }
    )
    out = (
        benford_digit_counts(_ds(df, 2), "v", "g")
        .to_pandas()
        .sort_values("digit")
    )
    assert dict(zip(out["digit"], out["n"])) == {1: 2, 9: 2}


def test_benford_power_of_ten_boundaries(ray_session):
    from pdf_parser_ray.ops.profile import benford_digit_counts

    # exact powers of ten in cents (the float-log10 danger zone)
    vals = [10.0**k for k in range(-2, 7)]  # cents: 1, 10, ..., 10^8
    df = pd.DataFrame({"g": ["p"] * len(vals), "v": vals})
    out = benford_digit_counts(_ds(df), "v", "g").to_pandas()
    assert set(out["digit"]) == {1}
    assert int(out["n"].sum()) == len(vals)


def test_hill_alpha_recovers_pareto_exponent(ray_session):
    from pdf_parser_ray.ops.profile import hill_alpha

    rng = np.random.default_rng(13)
    # Pareto with TAIL index 2.0 (x = xmin * U^(-1/2)) has density
    # exponent a = 1 + 2 = 3 — the Clauset-MLE convention hill_alpha
    # reports.
    x = 100.0 * rng.random(20000) ** (-1.0 / 2.0)
    df = pd.DataFrame({"g": ["z"] * len(x), "v": x})
    out = hill_alpha(_ds(df, 6), "v", "g", xmin=100.0).to_pandas()
    assert out["alpha"].iloc[0] == pytest.approx(3.0, abs=0.05)
    assert out["n"].iloc[0] == len(x)


def test_hill_alpha_drops_empty_tail(ray_session):
    from pdf_parser_ray.ops.profile import hill_alpha

    df = pd.DataFrame({"g": ["small"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = hill_alpha(_ds(df), "v", "g", xmin=100.0).to_pandas()
    assert len(out) == 0


# ------------------------------------------------- rfm / readability / theil

def test_readability_hand_case(ray_session):
    import __ray_entry__ as entrymod

    # craft via the query on real testdata: spot-verify one row's
    # formula from its own integer counts
    df = entrymod.queries()["readability"]("/root/testdata/sf0.001")
    df = df.to_pandas().head(20)
    w = df["n_words"].to_numpy(float)
    s = np.maximum(df["n_sentences"].to_numpy(float), 1.0)
    y = df["n_syllables"].to_numpy(float)
    expect = np.round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4)
    assert np.allclose(df["flesch"], expect)


def test_spend_theil_zero_for_equal_spend(ray_session):
    from pdf_parser_ray.ops.shuffle import grouped_agg  # noqa: F401

    # direct formula check: equal values => Theil == 0
    import math as m

    c = np.array([500, 500, 500, 500], dtype="int64")
    cf = c.astype(float)
    n, sx, sxlnx = len(c), cf.sum(), (cf * np.log(cf)).sum()
    mu = sx / n
    assert sxlnx / (n * mu) - m.log(mu) == pytest.approx(0.0, abs=1e-12)


def test_rfm_segments_cells_partition_the_customers(ray_session):
    import __ray_entry__ as entrymod

    out = (
        entrymod.queries()["rfm_segments"]("/root/testdata/sf0.001")
        .to_pandas()
    )
    # every quintile id in 1..5; total customers = distinct o_custkey
    assert out[["r_q", "f_q", "m_q"]].isin([1, 2, 3, 4, 5]).all().all()
    import duckdb

    n = duckdb.sql(
        "SELECT count(DISTINCT o_custkey) FROM "
        "read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).fetchone()[0]
    assert int(out["n_customers"].sum()) == n
    # marginals: each r_q stratum holds n/5 +- 1 customers
    marg = out.groupby("r_q")["n_customers"].sum()
    assert marg.min() >= n // 5 and marg.max() <= n // 5 + 1


# ------------------------------------------------------- ks / mi / trimmed

def test_two_sample_ks_hand_case(ray_session):
    from pdf_parser_ray.ops.profile import two_sample_ks

    # a: {1,2,3}, b: {3,4,5} (in dollars) — D = 2/3 at x=2
    df = pd.DataFrame(
        {
            "g": ["a"] * 3 + ["b"] * 3,
            "v": [1.0, 2.0, 3.0, 3.0, 4.0, 5.0],
        }
    )
    out = two_sample_ks(_ds(df, 2), "v", "g", "a", "b")
    assert out["d_stat"].iloc[0] == pytest.approx(2.0 / 3.0, abs=1e-6)
    assert out["n_a"].iloc[0] == 3 and out["n_b"].iloc[0] == 3


def test_two_sample_ks_identical_distributions(ray_session):
    from pdf_parser_ray.ops.profile import two_sample_ks

    v = [1.0, 2.0, 3.0, 4.0]
    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 4, "v": v + v})
    out = two_sample_ks(_ds(df, 3), "v", "g", "a", "b")
    assert out["d_stat"].iloc[0] == pytest.approx(0.0, abs=1e-9)


def test_contingency_mi_independent_and_dependent(ray_session):
    from pdf_parser_ray.ops.profile import contingency_mi

    # perfectly dependent 2x2 -> MI = ln 2; independent -> 0
    dep = pd.DataFrame(
        {"r": ["A"] * 10 + ["B"] * 10, "c": ["X"] * 10 + ["Y"] * 10}
    )
    out = contingency_mi(_ds(dep, 2), "r", "c")
    assert out["mi"].iloc[0] == pytest.approx(math.log(2.0), abs=1e-6)
    ind = pd.DataFrame(
        {
            "r": ["A"] * 20 + ["B"] * 20,
            "c": (["X"] * 10 + ["Y"] * 10) * 2,
        }
    )
    out2 = contingency_mi(_ds(ind, 2), "r", "c")
    assert out2["mi"].iloc[0] == pytest.approx(0.0, abs=1e-9)


def test_grouped_trimmed_mean_matches_reference(ray_session):
    from pdf_parser_ray.ops.quantiles import grouped_trimmed_mean

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 500),
            "v": np.round(rng.normal(100, 30, 500), 2),
        }
    )
    # plant outliers that a 10% trim must neutralize
    df.loc[:4, "v"] = 10_000.0
    out = grouped_trimmed_mean(_ds(df, 4), "g", "v").set_index("g")
    for g, grp in df.groupby("g"):
        x = np.sort(np.rint(grp["v"].to_numpy() * 100).astype("int64"))
        n = len(x)
        lo = int(n * 0.1)
        kept = x[lo: n - lo]
        ref = kept.sum() / len(kept) / 100.0
        assert out.loc[g, "trimmed_mean"] == pytest.approx(ref, abs=1e-6)
        assert out.loc[g, "n_kept"] == len(kept)


def test_grouped_trimmed_mean_resists_outliers(ray_session):
    from pdf_parser_ray.ops.quantiles import grouped_trimmed_mean

    v = [50.0] * 18 + [1e6, -1e6]
    df = pd.DataFrame({"g": ["x"] * 20, "v": v})
    out = grouped_trimmed_mean(_ds(df, 2), "g", "v")
    assert out["trimmed_mean"].iloc[0] == pytest.approx(50.0, abs=1e-6)


# ------------------------------------------- spearman / grouped ranks / kappa

def test_grouped_spearman_matches_pandas(ray_session):
    from pdf_parser_ray.ops.profile import grouped_spearman

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 400),
            "x": rng.integers(1, 20, 400),
            "y": np.round(rng.normal(50, 10, 400), 2),
        }
    )
    out = (
        grouped_spearman(_ds(df, 4), "x", "y", "g", y_cents=True)
        .to_pandas()
        .set_index("g")
    )
    for g, grp in df.groupby("g"):
        # snap exactly as the op does; Spearman = Pearson over average
        # ranks (no scipy in this environment)
        rx = pd.Series(np.rint(grp["x"]).astype("int64")).rank(
            method="average"
        )
        ry = pd.Series(np.rint(grp["y"] * 100).astype("int64")).rank(
            method="average"
        )
        assert out.loc[g, "spearman"] == pytest.approx(
            rx.corr(ry), abs=1e-3
        )


def test_grouped_spearman_perfect_monotone(ray_session):
    from pdf_parser_ray.ops.profile import grouped_spearman

    x = np.arange(1, 51)
    df = pd.DataFrame({"g": ["m"] * 50, "x": x, "y": (x ** 3).astype(float)})
    out = grouped_spearman(_ds(df, 3), "x", "y", "g").to_pandas()
    assert out["spearman"].iloc[0] == pytest.approx(1.0, abs=1e-9)


def test_grouped_value_ranks_matches_sql_rule(ray_session):
    from pdf_parser_ray.ops.quantiles import grouped_value_ranks

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "id": np.arange(300, dtype="int64"),
            "g": rng.choice(["a", "b", "c"], 300),
            "v": rng.integers(0, 40, 300).astype("float64"),
        }
    )
    out = (
        grouped_value_ranks(
            _ds(df, 5), "v", "id", "g",
            bucket_width={"a": 1.0, "b": 4.0, "c": 13.0}, n_tiles=4
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    import duckdb

    ref = duckdb.sql(
        """
        SELECT id, g, v,
               row_number() OVER (PARTITION BY g ORDER BY v, id) AS rnk,
               percent_rank() OVER (PARTITION BY g ORDER BY v, id)
                 AS pct_rank,
               ntile(4) OVER (PARTITION BY g ORDER BY v, id) AS tile
        FROM df ORDER BY id
        """
    ).fetchdf()
    assert (out["rnk"].to_numpy() == ref["rnk"].to_numpy()).all()
    assert (out["tile"].to_numpy() == ref["tile"].to_numpy()).all()
    assert np.allclose(out["pct_rank"], ref["pct_rank"])


# ------------------------------------------------- source JSD / vocab / ddsketch

class TestSourceJsd:
    def test_single_source_is_zero(self, ray_session):
        # one source IS the corpus: p_s == p_c, so JSD == 0 exactly.
        from pdf_parser_ray.ops.text_stats import source_jsd

        df = pd.DataFrame(
            {"source": ["a"] * 6,
             "text": ["alpha beta", "beta gamma", "delta", "alpha",
                      "gamma gamma", "epsilon zeta"]}
        )
        out = source_jsd(_ds(df, 3))
        assert out["jsd_bits"].tolist() == [0.0]

    def test_bounded_and_ranks_disjoint_higher(self, ray_session):
        # JSD is bounded by 1 bit; a token-disjoint source must score
        # above a source that matches the corpus mix.
        from pdf_parser_ray.ops.text_stats import source_jsd

        rows = []
        for i in range(50):
            rows.append({"source": "mixed", "text": f"tok{i % 7} tok{i % 11}"})
            rows.append({"source": "alien", "text": f"zz{i} qq{i} ww{i}"})
        out = source_jsd(_ds(pd.DataFrame(rows), 4)).set_index("source")
        assert (out["jsd_bits"] <= 1.0).all() and (out["jsd_bits"] >= 0.0).all()
        assert out.loc["alien", "jsd_bits"] > out.loc["mixed", "jsd_bits"]


class TestVocabGrowth:
    def test_hand_computed_curve(self, ray_session):
        from pdf_parser_ray.ops.text_stats import vocab_growth

        # 5 docs -> steps 0,2,4,6,8 occupied (doc*10//5); firsts:
        # doc0 {a,b}, doc1 {c}, doc2 {} (repeat a), doc3 {d}, doc4 {}.
        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": ["a b", "c a", "a a", "d b", "b c"],
            }
        )
        out = vocab_growth(_ds(df, 2), 5)
        assert out["step"].tolist() == list(range(1, 11))
        assert out["cum_vocab"].tolist() == [2, 2, 3, 3, 3, 3, 4, 4, 4, 4]
        assert out["cum_tokens"].tolist() == [2, 2, 4, 4, 6, 6, 8, 8, 10, 10]
        assert out["n_docs"].tolist() == [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]

    def test_partition_invariant(self, ray_session):
        from pdf_parser_ray.ops.text_stats import vocab_growth

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(120),
                "text": [
                    " ".join(f"w{rng.integers(0, 40)}" for _ in range(8))
                    for _ in range(120)
                ],
            }
        )
        a = vocab_growth(_ds(df, 1), 120)
        b = vocab_growth(_ds(df, 9), 120)
        pd.testing.assert_frame_equal(a, b)
        assert a["cum_vocab"].is_monotonic_increasing


class TestLogBucketQuantiles:
    def test_bucket_midpoints(self, ray_session):
        from pdf_parser_ray.ops.sketches import log_bucket_quantiles

        # cents 1,2,4,8 -> buckets 0,1,2,3; p50 rank ceil(.5*4)=2 ->
        # bucket 1 -> 1.5*2 cents = 0.03.
        df = pd.DataFrame(
            {"g": ["x"] * 4, "v": [0.01, 0.02, 0.04, 0.08]}
        )
        out = log_bucket_quantiles(_ds(df, 2), "g", "v", [0.5, 0.99])
        assert out["n"].tolist() == [4]
        assert out["q50_est"].tolist() == [3.0 * 2.0 / 200.0]
        assert out["q99_est"].tolist() == [3.0 * 8.0 / 200.0]

    def test_relative_error_bound(self, ray_session):
        from pdf_parser_ray.ops.sketches import log_bucket_quantiles

        rng = np.random.default_rng(11)
        vals = np.round(rng.lognormal(mean=2.0, sigma=1.5, size=4000), 2) + 0.01
        df = pd.DataFrame({"g": ["a"] * 4000, "v": vals})
        out = log_bucket_quantiles(_ds(df, 5), "g", "v", [0.5, 0.9, 0.99])
        for q in (0.5, 0.9, 0.99):
            true = float(np.quantile(vals, q, method="inverted_cdf"))
            est = float(out[f"q{int(q * 100)}_est"].iloc[0])
            # bucket spans a factor of 2; the midpoint is within
            # [0.75x, 1.5x] of every value in the bucket.
            assert 0.74 <= est / true <= 1.51, (q, est, true)


class TestLabelNoiseAudit:
    def test_flags_planted_mislabel(self, ray_session):
        # 6 clean en docs, 6 clean de docs, and 2 docs with PURE en
        # stopword text labeled 'de' — the audit must suggest 'en' for
        # the planted pair and keep the clean docs on the diagonal.
        from pdf_parser_ray.ops.text_stats import label_noise_audit

        en = "and as at be by for his in is it of on"
        de = "auf das den der die ein eine für ist mit nicht und"
        rows = [{"doc_id": i, "lang": "en", "text": en} for i in range(6)]
        rows += [{"doc_id": 6 + i, "lang": "de", "text": de} for i in range(6)]
        rows += [{"doc_id": 12 + i, "lang": "de", "text": en} for i in range(2)]
        out = (
            label_noise_audit(_ds(pd.DataFrame(rows), 3))
            .to_pandas()
            .set_index(["given_lang", "suggested_lang"])["n"]
        )
        assert out.loc[("de", "en")] == 2
        assert out.loc[("en", "en")] == 6
        assert out.loc[("de", "de")] == 6

    def test_no_hit_docs_excluded(self, ray_session):
        from pdf_parser_ray.ops.text_stats import label_noise_audit

        rows = [
            {"doc_id": 0, "lang": "en", "text": "and of in is it"},
            {"doc_id": 1, "lang": "en", "text": "zzz qqq www"},  # no hits
        ]
        out = label_noise_audit(_ds(pd.DataFrame(rows))).to_pandas()
        assert out["n"].sum() == 1


class TestClusteringCoefficients:
    def test_hand_computed(self, ray_session):
        from pdf_parser_ray.ops.dedup import clustering_coefficients

        # triangles (1,2,3) and (2,3,4); deg 1:2 2:3 3:3 4:2.
        edges = pd.DataFrame(
            {"a": [1, 1, 2, 2, 3], "b": [2, 3, 3, 4, 4]}
        )
        out = clustering_coefficients(_ds(edges, 2)).set_index("node")
        assert out["deg"].to_dict() == {1: 2, 2: 3, 3: 3, 4: 2}
        assert out["n_tri"].to_dict() == {1: 1, 2: 2, 3: 2, 4: 1}
        assert out.loc[1, "lcc"] == 1.0 and out.loc[4, "lcc"] == 1.0
        assert out.loc[2, "lcc"] == pytest.approx(2 / 3)

    def test_degree_one_excluded_and_empty(self, ray_session):
        from pdf_parser_ray.ops.dedup import clustering_coefficients

        edges = pd.DataFrame({"a": [1], "b": [2]})
        out = clustering_coefficients(_ds(edges))
        assert len(out) == 0
        out2 = clustering_coefficients(_ds(pd.DataFrame({"a": [], "b": []})))
        assert list(out2.columns) == ["node", "deg", "n_tri", "lcc"]


class TestKcoreFilter:
    def test_clique_survives_chain_peels(self, ray_session):
        from pdf_parser_ray.ops.dedup import kcore_filter

        # K4 on {1,2,3,4} plus a pendant chain 4-5-6: the chain peels
        # (deg 1 and 2 < k), node 4 drops back to deg 3 and the clique
        # survives intact.
        edges = pd.DataFrame(
            {"a": [1, 1, 1, 2, 2, 3, 4, 5],
             "b": [2, 3, 4, 3, 4, 4, 5, 6]}
        )
        out = kcore_filter(_ds(edges, 2), 3, rounds=8)
        assert out["node"].tolist() == [1, 2, 3, 4]
        assert out["deg"].tolist() == [3, 3, 3, 3]

    def test_everything_peels(self, ray_session):
        from pdf_parser_ray.ops.dedup import kcore_filter

        chain = pd.DataFrame({"a": [1, 2, 3], "b": [2, 3, 4]})
        out = kcore_filter(_ds(chain), 2, rounds=8)
        assert len(out) == 0


class TestQuantileNorm:
    def test_aligns_shifted_groups(self, ray_session):
        from pdf_parser_ray.ops.quantiles import quantile_norm

        # source B is source A shifted by +1000: after normalization the
        # k-th smallest of each group must land on the SAME global value.
        df = pd.DataFrame(
            {
                "id": np.arange(20),
                "src": ["a"] * 10 + ["b"] * 10,
                "v": list(range(1, 11)) + list(range(1001, 1011)),
            }
        ).astype({"v": "float64"})
        out = (
            quantile_norm(_ds(df, 3), "v", "id", "src", out_col="norm")
            .to_pandas()
            .sort_values(["src", "v"])
        )
        a = out[out["src"] == "a"]["norm"].to_numpy()
        b = out[out["src"] == "b"]["norm"].to_numpy()
        assert (a == b).all()
        assert (np.diff(a) >= 0).all()  # monotone
        assert set(out["norm"]) <= set(df["v"])  # selection, not interpolation


class TestHitsBipartite:
    def test_mutual_reinforcement(self, ray_session):
        from pdf_parser_ray.ops.dedup import hits_bipartite

        # cust 1 buys from both suppliers, cust 2 only from supplier 10:
        # 10 out-authorities 20, 1 out-hubs 2, and max-norm tops are 1.0.
        edges = pd.DataFrame({"c": [1, 1, 2], "s": [10, 20, 10]})
        out = hits_bipartite(_ds(edges, 2)).set_index(["kind", "node"])[
            "score"
        ]
        assert out.loc[("auth", 10)] == 1.0
        assert out.loc[("hub", 1)] == 1.0
        assert out.loc[("auth", 20)] < 1.0
        assert out.loc[("hub", 2)] < out.loc[("hub", 1)]

    def test_multiplicity_weights(self, ray_session):
        from pdf_parser_ray.ops.dedup import hits_bipartite

        # repeat edges strengthen: with 2x (1,10), supplier 10 must
        # out-score supplier 20 even though both have one distinct buyer.
        edges = pd.DataFrame({"c": [1, 1, 1], "s": [10, 10, 20]})
        out = hits_bipartite(_ds(edges)).set_index(["kind", "node"])["score"]
        assert out.loc[("auth", 10)] > out.loc[("auth", 20)]


class TestAbExperiment:
    @staticmethod
    def _arm(uid) -> int:
        import hashlib

        return 0 if hashlib.md5(str(uid).encode("ascii")).hexdigest()[0] < "8" else 1

    def test_welch_matches_numpy(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.profile import ab_welch_srm

        rng = np.random.default_rng(3)
        rows = []
        for uid in range(1, 101):
            for _ in range(rng.integers(1, 5)):
                rows.append({"user_id": uid, "value": float(rng.integers(1, 500)) / 1.0})
        df = pd.DataFrame(rows)
        out = ab_welch_srm(ray.data.from_pandas(df))
        per_user = df.assign(c=(df["value"] * 100).round().astype("int64"))
        totals = per_user.groupby("user_id")["c"].sum()
        arms = totals.index.map(self._arm)
        ya = totals[arms == 0].to_numpy()
        yb = totals[arms == 1].to_numpy()
        assert out["n_a"][0] == len(ya) and out["n_b"][0] == len(yb)
        z_exp = (ya.mean() - yb.mean()) / np.sqrt(
            ya.var(ddof=1) / len(ya) + yb.var(ddof=1) / len(yb)
        )
        assert abs(out["z"][0] - z_exp) < 1e-6
        n = len(ya) + len(yb)
        assert abs(out["srm_chi2"][0] - (len(ya) - len(yb)) ** 2 / n) < 1e-9

    def test_cuped_kills_pre_period_noise(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.profile import ab_cuped

        # y perfectly proportional to x per user → adjusted diff ≈ 0
        # even when raw arm means differ by luck of the hash split.
        rng = np.random.default_rng(5)
        t0 = pd.Timestamp("2024-01-01")
        t1 = pd.Timestamp("2024-02-01")  # post-period (mid falls between)
        rows = []
        for uid in range(1, 81):
            base = float(rng.integers(10, 1000))
            rows.append({"user_id": uid, "value": base, "ts": t0})
            rows.append({"user_id": uid, "value": 2.0 * base, "ts": t1})
        out = ab_cuped(ray.data.from_pandas(pd.DataFrame(rows)))
        assert abs(out["theta"][0] - 2.0) < 1e-9
        assert abs(out["diff_adj"][0]) < 1e-6
        assert out["n_a"][0] + out["n_b"][0] == 80


class TestNbClassify:
    def test_separable_classes_and_prior_fallback(self, ray_session):
        # Two token-disjoint classes: every doc must classify to its
        # own class; a doc of UNSEEN tokens falls back to the prior
        # (majority class wins because all per-bucket weights equalize
        # only when the unseen buckets miss both classes' vocab).
        from pdf_parser_ray.ops.text_stats import nb_classify

        rows = []
        for i in range(8):
            rows.append(
                {"doc_id": i, "lang": "aa", "text": "apple apple banana"}
            )
        for i in range(8, 12):
            rows.append({"doc_id": i, "lang": "bb", "text": "zebra yak"})
        df = pd.DataFrame(rows)
        out = (
            nb_classify(_ds(df, 3))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert len(out) == 12
        assert (out.loc[:7, "pred"] == "aa").all()
        assert (out.loc[8:, "pred"] == "bb").all()
        assert out["correct"].sum() == 12

    def test_tie_breaks_to_lowest_class_name(self, ray_session):
        # Perfectly symmetric corpus: both classes give any doc the
        # same rounded score, so argmax must pick the ASC-first class.
        from pdf_parser_ray.ops.text_stats import nb_classify

        df = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "lang": ["bb", "aa"],
                "text": ["same same", "same same"],
            }
        )
        out = nb_classify(_ds(df)).to_pandas()
        assert (out["pred"] == "aa").all()


class TestCmsCounts:
    def test_exact_when_wide(self, ray_session):
        # width >> keys: collisions are (near) impossible at depth 4,
        # so every estimate is exact and overcount == 0.
        from pdf_parser_ray.ops.sketches import cms_counts

        df = pd.DataFrame({"user_id": [1, 1, 1, 2, 2, 3] * 5})
        out = (
            cms_counts(_ds(df, 3), "user_id", depth=4, width=4096)
            .to_pandas()
            .set_index("user_id")
            .sort_index()
        )
        assert out["exact"].tolist() == [15, 10, 5]
        assert out["overcount"].tolist() == [0, 0, 0]

    def test_one_sided_overcount_when_narrow(self, ray_session):
        # width 1 forces every key into one counter: est == total rows
        # for every key — the one-sided error bound est >= exact.
        from pdf_parser_ray.ops.sketches import cms_counts

        df = pd.DataFrame({"user_id": list(range(10)) * 3})
        out = cms_counts(_ds(df, 2), "user_id", depth=2, width=1).to_pandas()
        assert (out["est"] == 30).all()
        assert (out["overcount"] == 27).all()
        assert (out["est"] >= out["exact"]).all()


class TestVocabCoverage:
    def test_hand_computed_partial_class(self, ray_session):
        # lang x: 'a'×90, b/c/d ×3 each, 'e'×1  → total 100.  95% needs
        # 95 tokens: 'a' (90) + 2 of the three count-3 tokens (96 ≥ 95)
        # → vocab_size 3, covered 96 — the cut lands INSIDE the
        # count-3 class, exercising the ceiling-division remainder.
        from pdf_parser_ray.ops.text_stats import vocab_coverage

        text_x = " ".join(["a"] * 90 + ["b", "c", "d"] * 3 + ["e"])
        # lang y: uniform 'p q r s' ×1 → 95% of 4 = 3.8 → 4 tokens
        df = pd.DataFrame(
            {"lang": ["x", "x", "y"],
             "text": [text_x[: len(text_x) // 2],
                      text_x[len(text_x) // 2:], "p q r s"]}
        )
        # splitting text_x across two rows must not change the answer
        # (counts merge in the co-location) — but the split point can
        # cut a token in half, so rebuild from whole tokens instead:
        toks = text_x.split()
        df.loc[0, "text"] = " ".join(toks[:50])
        df.loc[1, "text"] = " ".join(toks[50:])
        out = vocab_coverage(_ds(df, 2)).set_index("lang")
        assert out.loc["x", "total_tokens"] == 100
        assert out.loc["x", "vocab_size"] == 3
        assert out.loc["x", "covered_tokens"] == 96
        assert out.loc["y", "vocab_size"] == 4
        assert out.loc["y", "covered_tokens"] == 4


class TestLabelPropCommunities:
    def test_two_cliques_with_weak_bridge(self, ray_session):
        # Two triangles {1,2,3} and {7,8,9} joined by one weak edge:
        # LPA must settle each triangle on its min node id and never
        # merge across the bridge (intra weight 5 >> bridge weight 1).
        from pdf_parser_ray.ops.dedup import label_prop_communities

        e = pd.DataFrame(
            {"a": [1, 1, 2, 7, 7, 8, 3],
             "b": [2, 3, 3, 8, 9, 9, 7],
             "n": [5, 5, 5, 5, 5, 5, 1]}
        )
        out = label_prop_communities(
            ray.data.from_pandas(e), rounds=4
        ).set_index("node")
        assert set(out.loc[[1, 2, 3], "community"]) == {1}
        assert set(out.loc[[7, 8, 9], "community"]) == {7}

    def test_weighted_majority_and_tie_break(self, ray_session):
        # Node 5 borders label-1 mass (weight 2) and label-9 mass
        # (weight 3): after round 1 it must take 9; equal weights on
        # node 6 break to the SMALLER label.
        from pdf_parser_ray.ops.dedup import label_prop_communities

        e = pd.DataFrame(
            {"a": [1, 5, 2, 6], "b": [5, 9, 6, 9], "n": [2, 3, 4, 4]}
        )
        out = label_prop_communities(
            ray.data.from_pandas(e), rounds=1
        ).set_index("node")
        assert out.loc[5, "community"] == 9
        assert out.loc[6, "community"] == 2


class TestPoissonBootstrapCi:
    def test_interval_brackets_mean_and_weights_poisson(self, ray_session):
        from pdf_parser_ray.ops.profile import poisson_bootstrap_ci

        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {"event_type": ["a"] * 400,
             "event_id": np.arange(400),
             "value": np.round(rng.uniform(1, 99, 400), 2)}
        )
        out = poisson_bootstrap_ci(_ds(df, 3)).iloc[0]
        exact = np.rint(df["value"].to_numpy() * 100).astype("int64")
        assert out["n"] == 400
        assert out["mean"] == exact.sum() / 400
        # bootstrap interval must bracket the point estimate and be
        # tight-ish for n=400 (σ/√n ≈ 1.4 cents·100)
        assert out["boot_lo"] < out["mean"] < out["boot_hi"]
        assert (out["boot_hi"] - out["boot_lo"]) < 0.25 * out["mean"]

    def test_partition_invariant(self, ray_session):
        from pdf_parser_ray.ops.profile import poisson_bootstrap_ci

        df = pd.DataFrame(
            {"event_type": ["a", "b"] * 100,
             "event_id": np.arange(200),
             "value": np.linspace(1, 50, 200).round(2)}
        )
        a = poisson_bootstrap_ci(_ds(df, 1))
        b = poisson_bootstrap_ci(_ds(df, 7))
        pd.testing.assert_frame_equal(a, b)


class TestBfsDistances:
    def test_path_graph_cap_and_isolation(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import bfs_distances

        edges = ray.data.from_pandas(
            pd.DataFrame({"a": [0, 1, 2, 3, 4, 10], "b": [1, 2, 3, 4, 5, 11]})
        )
        out = (
            bfs_distances(edges, [0], rounds=3)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        # nodes beyond 3 hops and the disconnected pair are absent
        assert out["node"].tolist() == [0, 1, 2, 3]
        assert out["dist"].tolist() == [0, 1, 2, 3]

    def test_multi_source_min(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import bfs_distances

        edges = ray.data.from_pandas(
            pd.DataFrame({"a": [0, 1, 2, 3], "b": [1, 2, 3, 4]})
        )
        out = (
            bfs_distances(edges, [0, 4], rounds=4)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        # distances are the MIN over both sources
        assert out["dist"].tolist() == [0, 1, 2, 1, 0]

    def test_colo_route_parity_and_bounded_probe(self, ray_session):
        """ADVICE r4: the frontier size check must not take_all() first —
        the probe is take(max+1), so an over-limit frontier routes to
        colo_join with the driver never holding more than max+1 rows.
        Forcing max=1 exercises the colo route end-to-end; distances
        must match the broadcast route exactly."""
        import ray.data

        from pdf_parser_ray.ops.dedup import bfs_distances

        edges = ray.data.from_pandas(
            pd.DataFrame({"a": [0, 0, 1, 2, 3, 4], "b": [1, 2, 3, 4, 5, 5]})
        )
        bc = (
            bfs_distances(edges, [0], rounds=3)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        colo = (
            bfs_distances(edges, [0], rounds=3, frontier_broadcast_max=1)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(bc, colo)
        assert bc["node"].tolist() == [0, 1, 2, 3, 4, 5]
        assert bc["dist"].tolist() == [0, 1, 1, 2, 2, 3]


class TestPointerJump:
    def test_chain_forest_and_terminal_keep(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import pointer_jump

        # two chains: 3->2->1->0 (terminal 0), 7->6 (terminal 6)
        edges = ray.data.from_pandas(
            pd.DataFrame({"node": [3, 2, 1, 7], "ptr": [2, 1, 0, 6]})
        )
        out = (
            pointer_jump(edges, rounds=2)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert out["node"].tolist() == [1, 2, 3, 7]
        assert out["final"].tolist() == [0, 0, 0, 6]

    def test_doubling_depth(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import pointer_jump

        # chain of length 8: resolves in 3 rounds (2^3), not in 2
        edges = ray.data.from_pandas(
            pd.DataFrame({"node": list(range(1, 9)), "ptr": list(range(8))})
        )
        full = pointer_jump(edges, rounds=3).to_pandas()
        assert (full["final"] == 0).all()
        partial = pointer_jump(edges, rounds=2).to_pandas()
        top = partial.loc[partial["node"] == 8, "final"].iloc[0]
        assert top == 4  # 2^2 hops only


class TestLooGroupEffect:
    def test_totals_minus_group(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.profile import loo_group_effect

        df = pd.DataFrame(
            {"source": ["a", "a", "b", "c"], "v": [10, 20, 60, 10]}
        )
        out = (
            loo_group_effect(ray.data.from_pandas(df), "source", "v")
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        # overall mean 25; drop a -> 70/2=35; drop b -> 40/3; drop c -> 30
        assert out["group_mean"].tolist() == [15.0, 60.0, 10.0]
        assert out["loo_mean"].tolist() == [35.0, 40 / 3, 30.0]
        assert out["delta"].tolist() == [10.0, 40 / 3 - 25.0, 5.0]


class TestWinnowFingerprints:
    K, W = 8, 4

    def _serial(self, text):
        # naive winnowing: k-gram polynomial hashes mod 2^64, window of
        # W hash positions, rightmost minimum, dedup selections
        B, M = 1000003, 1 << 64
        data = text.encode("utf-8")
        if len(data) < self.K:
            return set()
        hs = []
        for s in range(len(data) - self.K + 1):
            h = 0
            for j in range(self.K):
                h = (h * B + data[s + j]) % M
            hs.append(h)
        sel = set()
        if len(hs) < self.W:
            windows = [range(len(hs))]
        else:
            windows = [range(t, t + self.W) for t in range(len(hs) - self.W + 1)]
        for win in windows:
            m = min(hs[i] for i in win)
            sel.add(max(i for i in win if hs[i] == m))
        return {hs[i] for i in sel}

    def _run(self, texts):
        from pdf_parser_ray.ops.text_stats import winnow_fingerprint_batch

        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = winnow_fingerprint_batch(df, k=self.K, w=self.W)
        return {
            d: set(g["fp"].tolist()) for d, g in out.groupby("doc_id")
        }

    def test_vs_serial_naive(self):
        rng = np.random.RandomState(11)
        texts = [
            "".join(rng.choice(list("abcdef "), size=n))
            for n in [0, 3, 8, 10, 11, 40, 200, 500]
        ]
        got = self._run(texts)
        for i, t in enumerate(texts):
            exp = self._serial(t)
            assert got.get(i, set()) == exp, f"doc {i} ({len(t)} chars)"

    def test_match_guarantee(self):
        # any shared substring of length >= W + K - 1 = 11 must share
        # at least one fingerprint (the winnowing guarantee)
        shared = "THE-COMMON-PASSAGE"
        a = "xxxxyyyyzzzz" + shared + "qqqqrrrr"
        b = "123456789012345" + shared + "abcdabcd"
        got = self._run([a, b])
        assert got[0] & got[1], "winnowing guarantee violated"

    def test_degenerate_uniform_text(self):
        # all k-grams identical -> exactly one fingerprint
        got = self._run(["a" * 100])
        assert len(got[0]) == 1


class TestSnmCandidatePairs:
    def _serial(self, df, window=8, min_common=1):
        s = df.sort_values(["key", "id"]).reset_index(drop=True)
        toks = [set(k.split(" ")) for k in s["key"]]
        ids = s["id"].to_numpy()
        out = set()
        for i in range(len(s)):
            for j in range(i + 1, min(i + window, len(s))):
                c = len(toks[i] & toks[j])
                if c >= min_common:
                    out.add((int(ids[i]), int(ids[j]), c))
        return out

    def _run(self, df, parts, window=8):
        import ray.data

        from pdf_parser_ray.ops.dedup import snm_candidate_pairs

        got = snm_candidate_pairs(
            ray.data.from_pandas(df).repartition(parts),
            "key",
            "id",
            window=window,
        ).to_pandas()
        return {
            (int(a), int(b), int(c))
            for a, b, c in zip(got["id_a"], got["id_b"], got["n_common"])
        }

    def _data(self, n, seed):
        rng = np.random.RandomState(seed)
        words = ["cold", "hot", "small", "large", "widget", "bolt", "rod"]
        keys = [
            " ".join(rng.choice(words, size=2, replace=False)) for _ in range(n)
        ]
        return pd.DataFrame({"id": range(n), "key": keys})

    def test_multiblock_parity(self, ray_session):
        df = self._data(400, 5)
        assert self._run(df, 9) == self._serial(df)

    def test_blocks_smaller_than_window(self, ray_session):
        # ~2-row sorted blocks force cross-pane chains over MANY blocks
        df = self._data(90, 8)
        assert self._run(df, 40) == self._serial(df)

    def test_single_partition(self, ray_session):
        df = self._data(60, 2)
        assert self._run(df, 1) == self._serial(df)


class TestFastCdc:
    def _serial_boundaries(self, data, min_size=256, normal_size=1024,
                           max_size=4096):
        # per-byte reference: h = (h << 1) + gear[b] mod 2^64
        from pdf_parser_ray.ops.dedup import _GEAR

        bits = max(1, int(normal_size).bit_length() - 1)
        mask_s = (1 << (bits + 2)) - 1
        mask_l = (1 << (bits - 2)) - 1
        M = 1 << 64
        out, cur, n = [], 0, len(data)
        while cur < n:
            if n - cur <= min_size:
                out.append(n)
                break
            h, cut = 0, -1
            end_default = min(cur + max_size, n)
            for i in range(cur, end_default):
                h = ((h << 1) + int(_GEAR[data[i]])) % M
                length = i - cur + 1
                if length < min_size:
                    continue
                if length < normal_size and (h & mask_s) == 0:
                    cut = i
                    break
                if length >= normal_size and (h & mask_l) == 0:
                    cut = i
                    break
            out.append(cut + 1 if cut >= 0 else end_default)
            cur = out[-1]
        return out

    def test_vs_serial_reference(self):
        from pdf_parser_ray.ops.dedup import fastcdc_boundaries

        rng = np.random.RandomState(4)
        for n in (0, 100, 256, 1000, 5000, 20000):
            data = rng.bytes(n)
            got = fastcdc_boundaries(data)
            exp = self._serial_boundaries(data)
            assert got == exp, f"n={n}"

    def test_size_bounds(self):
        from pdf_parser_ray.ops.dedup import fastcdc_boundaries

        data = np.random.RandomState(9).bytes(100_000)
        b = fastcdc_boundaries(data)
        sizes = np.diff([0] + b)
        assert b[-1] == len(data)
        assert (sizes[:-1] >= 256).all() and (sizes <= 4096).all()

    def test_min_size_below_window_rejected(self):
        """min_size < 64 would let prior-chunk bytes linger in the
        global rolling gear hash and silently diverge from per-chunk-
        restart FastCDC — must raise, not misbehave (ADVICE r2)."""
        import pytest

        from pdf_parser_ray.ops.dedup import fastcdc_boundaries

        with pytest.raises(ValueError, match="min_size"):
            fastcdc_boundaries(b"x" * 1000, min_size=32)

    def test_rolling_cdc_bounds_and_shift_resilience(self):
        """The SQL-derivable rolling-hash CDC tier (r4): size bounds
        hold, a prefix insert re-chunks only a bounded prefix, and the
        chunk rows cover the text exactly."""
        import string

        from pdf_parser_ray.ops.dedup import (
            rolling_cdc_boundaries,
            rolling_cdc_chunk_batch,
        )

        rng = np.random.RandomState(8)
        text = "".join(rng.choice(list(string.ascii_lowercase + " "), 20_000))
        b = rolling_cdc_boundaries(text)
        sizes = np.diff([0] + b)
        assert b[-1] == len(text)
        assert (sizes[:-1] >= 32).all() and (sizes <= 256).all()
        # shift resilience: tails re-align after an insert
        shifted = "INSERTED PREFIX " + text
        b2 = rolling_cdc_boundaries(shifted)
        chunks1 = {text[s:e] for s, e in zip([0] + b, b)}
        chunks2 = {shifted[s:e] for s, e in zip([0] + b2, b2)}
        assert len(chunks1 & chunks2) >= len(chunks1) * 0.8
        # batch explode covers the text exactly, hashes match content
        import hashlib as _h

        df = pd.DataFrame({"doc_id": [1], "text": [text[:1000]]})
        rows = rolling_cdc_chunk_batch(df)
        assert rows["n_chars"].sum() == 1000
        assert (rows["offset"] + rows["n_chars"]).iloc[-1] == 1000
        for _, r in rows.iterrows():
            piece = text[: 1000][int(r["offset"]): int(r["offset"]) + int(r["n_chars"])]
            assert _h.md5(piece.encode()).hexdigest() == r["chunk_hash"]

    def test_insert_shift_resilience(self):
        # CDC's reason to exist: a prefix insert must not re-chunk the
        # whole stream (fixed-size blocking would)
        import hashlib

        from pdf_parser_ray.ops.dedup import fastcdc_boundaries

        data = np.random.RandomState(2).bytes(50_000)
        shifted = b"INSERTED-PREFIX-BYTES" + data

        def hashes(d):
            bs = fastcdc_boundaries(d)
            prev, out = 0, set()
            for e in bs:
                out.add(hashlib.md5(d[prev:e]).hexdigest())
                prev = e
            return out

        a, b = hashes(data), hashes(shifted)
        assert len(a & b) / len(a) > 0.5

    def test_dedup_stats_planted_duplicates(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import cdc_dedup_stats

        blob = np.random.RandomState(1).bytes(30_000)
        df = pd.DataFrame(
            {
                "url": [f"u{i}" for i in range(6)],
                "payload": [blob] * 5 + [np.random.RandomState(3).bytes(8_000)],
            }
        )
        out = cdc_dedup_stats(
            ray.data.from_pandas(df).repartition(4)
        )
        assert out["bytes_total"].iloc[0] == 5 * 30_000 + 8_000
        # five identical payloads chunk identically -> unique ≈ one copy
        assert out["bytes_unique"].iloc[0] == 30_000 + 8_000
        assert out["dedup_ratio"].iloc[0] > 4.0
        # partition invariance
        out2 = cdc_dedup_stats(ray.data.from_pandas(df).repartition(1))
        pd.testing.assert_frame_equal(out, out2)


class TestLshBandPlan:
    def test_scurve_properties_and_choice(self):
        from pdf_parser_ray.ops.dedup import lsh_band_plan

        out = lsh_band_plan(n_perm=128, threshold_permille=700)
        # all factorizations of 128 present
        assert (out["bands"] * out["rows_per_band"] == 128).all()
        # S-curve: hit prob increases with similarity for every plan
        assert (out["p_plus"] >= out["p_at_target"]).all()
        assert (out["p_at_target"] >= out["p_minus"]).all()
        # textbook: b=16, r=8 approximates (1/16)^(1/8) ≈ 0.707 — the
        # closest factorization to a 0.7 target
        chosen = out[out["chosen"]]
        assert chosen["bands"].tolist() == [16]
        assert abs(chosen["approx_threshold"].iloc[0] - 0.7071) < 1e-3


class TestKneserNeyScore:
    def _run(self, texts, parts=3):
        import ray.data

        from pdf_parser_ray.ops.text_stats import kneser_ney_score

        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        return (
            kneser_ney_score(ray.data.from_pandas(df).repartition(parts))
            .to_pandas()
            .set_index("doc_id")
        )

    def test_hand_computed_tiny_model(self, ray_session):
        import math

        # corpus bigrams: (a,b)x2, (b,a)x1, (b,c)x1  -> T=3
        out = self._run(["a b a b c"])
        # c(a·)=2 n1(a)=1; c(b·)=2 n1(b)=2; pcont: a=1/3 b=1/3 c=1/3
        d = 0.75
        p_ab = (2 - d) / 2 + (d * 1 / 2) * (1 / 3)
        p_ba = (1 - d) / 2 + (d * 2 / 2) * (1 / 3)
        p_bc = (1 - d) / 2 + (d * 2 / 2) * (1 / 3)
        exp = round(
            2 * math.log2(p_ab) + math.log2(p_ba) + math.log2(p_bc), 6
        )
        assert out.loc[0, "n_bigrams"] == 4
        assert abs(out.loc[0, "kn_logprob"] - exp) < 1e-9

    def test_continuation_beats_raw_frequency(self, ray_session):
        # 'francisco' is FREQUENT but only ever follows 'san' ->
        # continuation prob low; 'the' follows many contexts.  A
        # held-out bigram (u seen, (u,w) unseen) must score higher
        # for the versatile word.
        import math

        corpus = [
            "san francisco " * 10 + "the cat the dog the bird the fish",
        ]
        from pdf_parser_ray.ops.text_stats import kneser_ney_score
        import ray.data

        df = pd.DataFrame({"doc_id": [0], "text": corpus})
        # score held-out docs against the model trained on `corpus`:
        # emulate via the op's backoff by scoring new docs appended
        out = self._run(corpus + ["cat francisco", "cat the"])
        # doc1 = bigram (cat, francisco); doc2 = (cat, the) — both
        # unseen with seen context 'cat': P = lam(cat)*pcont(w)
        assert out.loc[2, "kn_logprob"] > out.loc[1, "kn_logprob"]

    def test_empty_and_single_token_drop(self, ray_session):
        out = self._run(["a b c", "", "solo"])
        assert list(out.index) == [0]


class TestGoodTuring:
    def test_hand_counts(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import good_turing_counts

        # counts: a=1 b=1 c=2 d=3 -> N1=2, N2=1, N3=1
        df = pd.DataFrame(
            {"doc_id": [0, 1], "text": ["a b c d", "c d d"]}
        )
        out = good_turing_counts(
            ray.data.from_pandas(df).repartition(2)
        ).set_index("r")
        assert out.loc[1, "n_r"] == 2 and out.loc[2, "n_r"] == 1
        assert out.loc[1, "r_star"] == 2 * 1 / 2   # (1+1)*N2/N1
        assert out.loc[2, "r_star"] == 3 * 1 / 1
        assert out.loc[3, "r_star"] == 0.0         # no N4 class
        # weight conservation sanity: GT total mass Σ N_r·r* ≤ Σ N_r·r
        tot = (out["n_r"] * out.index).sum()
        gt = (out["n_r"] * out["r_star"]).sum()
        assert gt <= tot
