"""HLL sketch accuracy + semi/anti broadcast joins + distinct."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from pdf_parser_ray.ops.sketches import HLL, _hash_strings, hll_distinct


class TestHLL:
    def test_exactish_small_range(self):
        h = HLL(b=12)
        h.add_hashes(_hash_strings([f"v{i}" for i in range(100)]))
        assert abs(h.estimate() - 100) / 100 < 0.05

    def test_accuracy_large(self):
        h = HLL(b=12)
        h.add_hashes(_hash_strings([f"value-{i}" for i in range(50000)]))
        assert abs(h.estimate() - 50000) / 50000 < 0.05

    def test_merge_equals_union(self):
        a, b = HLL(12), HLL(12)
        a.add_hashes(_hash_strings([f"x{i}" for i in range(1000)]))
        b.add_hashes(_hash_strings([f"x{i}" for i in range(500, 1500)]))
        merged = a.merge(b)
        both = HLL(12)
        both.add_hashes(_hash_strings([f"x{i}" for i in range(1500)]))
        assert merged.estimate() == both.estimate()

    def test_duplicates_dont_inflate(self):
        h = HLL(12)
        h.add_hashes(_hash_strings(["same"] * 10000))
        assert h.estimate() < 3

    def test_hll_distinct_dataset(self, ray_session):
        import ray.data

        df = pd.DataFrame({"k": [f"k{i % 700}" for i in range(5000)]})
        est = hll_distinct(ray.data.from_pandas(df), "k")
        assert abs(est - 700) / 700 < 0.05


class TestSemiAntiJoin:
    @pytest.fixture()
    def orders(self, ray_session):
        import ray.data

        return ray.data.from_pandas(
            pd.DataFrame({"o_orderkey": range(10), "o_custkey": [i % 4 for i in range(10)]})
        )

    def test_semi(self, orders):
        from pdf_parser_ray.ops.relational import broadcast_semi_join

        out = broadcast_semi_join(orders, {1, 2}, "o_custkey").to_pandas()
        assert set(out["o_custkey"]) == {1, 2}

    def test_anti(self, orders):
        from pdf_parser_ray.ops.relational import broadcast_semi_join

        out = broadcast_semi_join(orders, {1, 2}, "o_custkey", anti=True).to_pandas()
        assert set(out["o_custkey"]) == {0, 3}

    def test_bloom_no_false_negatives_and_bounded_fp(self):
        from pdf_parser_ray.ops.relational import BloomFilter

        rng = np.random.RandomState(11)
        members = rng.randint(0, 1 << 60, size=5000)
        bf = BloomFilter(len(members), fp_rate=0.01)
        bf.add_many(members)
        assert bf.contains_many(members).all()  # the hard guarantee
        probes = np.setdiff1d(rng.randint(0, 1 << 60, size=20000), members)
        assert bf.contains_many(probes).mean() < 0.03  # ~3x over 1% target

    def test_bloom_prefilter_superset_then_exact(self, orders):
        from pdf_parser_ray.ops.relational import (
            bloom_prefilter,
            broadcast_semi_join,
        )

        keys = {1, 2}
        exact = broadcast_semi_join(orders, keys, "o_custkey").to_pandas()
        pre = bloom_prefilter(orders, keys, "o_custkey").to_pandas()
        # prefilter never loses a true member…
        assert set(exact["o_orderkey"]) <= set(pre["o_orderkey"])
        # …and composing with the exact join restores exact semantics
        both = broadcast_semi_join(
            bloom_prefilter(orders, keys, "o_custkey"), keys, "o_custkey"
        ).to_pandas()
        assert sorted(both["o_orderkey"]) == sorted(exact["o_orderkey"])


class TestMisraGries:
    def test_exact_when_under_capacity(self):
        from pdf_parser_ray.ops.sketches import MisraGries

        rng = np.random.RandomState(3)
        vals = rng.randint(0, 50, size=5000)
        mg = MisraGries(64)
        for i in range(0, len(vals), 997):  # batched partials
            chunk = pd.Series(vals[i : i + 997]).value_counts().to_dict()
            mg.add_counts(chunk)
        truth = pd.Series(vals).value_counts()
        top = mg.top(10)
        expect = sorted(
            ((int(v), int(n)) for v, n in truth.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
        assert [(int(v), int(n)) for v, n in top] == expect

    def test_undercount_bound_when_over_capacity(self):
        from pdf_parser_ray.ops.sketches import MisraGries

        rng = np.random.RandomState(4)
        # heavy value 0 plus a long tail exceeding capacity
        vals = np.concatenate([np.zeros(2000, dtype=int), rng.randint(1, 500, 3000)])
        mg = MisraGries(64)
        mg.add_counts(pd.Series(vals).value_counts().to_dict())
        est = dict(mg.counts).get(0, 0)
        n = len(vals)
        assert est >= 2000 - n / 65  # MG undercount bound
        assert len(mg.counts) <= 64

    def test_top_k_frequent_dataset(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import top_k_frequent

        df = pd.DataFrame({"u": [i % 7 for i in range(700)] + [3] * 50})
        out = top_k_frequent(ray.data.from_pandas(df), "u", k=3)
        assert out["value"].iloc[0] == 3 and out["n"].iloc[0] == 150


class TestIntervalCountJoin:
    def test_matches_pandas(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.relational import interval_count_join

        rng = np.random.RandomState(5)
        base = pd.Timestamp("2024-03-01")
        left = pd.DataFrame(
            {
                "event_id": range(40),
                "user_id": rng.randint(0, 4, 40),
                "ts": [base + pd.Timedelta(seconds=int(s))
                       for s in rng.randint(0, 7200, 40)],
            }
        )
        right = pd.DataFrame(
            {
                "user_id": rng.randint(0, 4, 200),
                "ts": [base + pd.Timedelta(seconds=int(s))
                       for s in rng.randint(0, 7200, 200)],
            }
        )
        out = interval_count_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            by="user_id", on="ts", lower_s=600, upper_s=0, out_col="n",
        ).to_pandas().set_index("event_id").sort_index()
        for _, row in left.iterrows():
            rr = right[right["user_id"] == row["user_id"]]
            expect = (
                (rr["ts"] >= row["ts"] - pd.Timedelta(seconds=600))
                & (rr["ts"] <= row["ts"])
            ).sum()
            assert out.loc[row["event_id"], "n"] == expect


class TestSparseJoinPriming:
    """Regression: Ray 2.49's hash shuffle loses the one-shot schema
    broadcast when an input's first submitted block is empty, leaving
    row-less join partitions as zero-column tables (ArrowInvalid
    `FieldRef.Name(<key>)`).  hash_join primes every partition with
    reserved-range sentinel rows so sparse filtered sides join safely
    in any block order."""

    def _sparse_left(self):
        import pyarrow as pa

        import ray.data

        ne = lambda ks: pa.table(
            {"k": pa.array(ks, pa.int64()),
             "v": pa.array([f"n{x}" for x in ks])}
        )
        # empty block FIRST + a single key: without priming, 3 of 4
        # partitions receive no left shard at all
        return ray.data.from_arrow([ne([]), ne([205])])

    @pytest.mark.parametrize("jt", ["inner", "left_outer", "full_outer"])
    def test_empty_first_block_sparse_key(self, ray_session, jt):
        import pandas as pd

        import ray.data
        from pdf_parser_ray.ops.relational import hash_join

        right = ray.data.from_pandas(
            pd.DataFrame({"k": [205, 9999], "w": [2, 5]})
        )
        out = hash_join(
            self._sparse_left(), right, ["k"], join_type=jt, num_partitions=4
        ).to_pandas()
        expect = {"inner": 1, "left_outer": 1, "full_outer": 2}[jt]
        assert len(out) == expect
        assert set(out["k"]).issubset({205, 9999})

    @pytest.mark.parametrize("jt", ["inner", "left_outer"])
    def test_reexecution_keeps_priming(self, ray_session, jt):
        """Consuming a lazy join result twice must work (regression:
        the once-per-session latch election emitted sentinels only on
        the FIRST execution, so count() followed by to_pandas()
        re-exposed the zero-column partition crash)."""
        import pandas as pd

        import ray.data
        from pdf_parser_ray.ops.relational import hash_join

        right = ray.data.from_pandas(
            pd.DataFrame({"k": [205, 9999], "w": [2, 5]})
        )
        out = hash_join(
            self._sparse_left(), right, ["k"], join_type=jt, num_partitions=4
        )
        n_first = out.count()           # execution 1
        df = out.to_pandas()            # execution 2 of the same plan
        assert len(df) == n_first == 1
        assert set(df["k"]) == {205}

    def test_string_key_sparse_join_primed(self, ray_session):
        """String join keys get sentinel coverage too (the old prime
        stage skipped non-integer keys entirely)."""
        import pyarrow as pa

        import ray.data
        from pdf_parser_ray.ops.relational import hash_join

        ne = lambda ks: pa.table(
            {"k": pa.array(ks, pa.string()),
             "v": pa.array([f"n{x}" for x in ks], pa.string())}
        )
        left = ray.data.from_arrow([ne([]), ne(["u205"])])
        right = ray.data.from_pandas(
            pd.DataFrame({"k": ["u205", "u9999"], "w": [2, 5]})
        )
        out = hash_join(
            left, right, ["k"], join_type="inner", num_partitions=4
        ).to_pandas()
        assert len(out) == 1 and out["k"].iloc[0] == "u205"

    def test_priming_does_not_change_dense_join(self, ray_session):
        import pandas as pd

        import ray.data
        from pdf_parser_ray.ops.relational import hash_join

        l = ray.data.range(200).map_batches(
            lambda df: pd.DataFrame({"k": df["id"], "a": df["id"] * 2}),
            batch_format="pandas",
        )
        r = ray.data.range(100).map_batches(
            lambda df: pd.DataFrame({"k": df["id"], "b": df["id"] * 3}),
            batch_format="pandas",
        )
        out = hash_join(l, r, ["k"], join_type="inner", num_partitions=4).to_pandas()
        assert len(out) == 100
        assert (out.sort_values("k")["b"].to_numpy() == out.sort_values("k")["k"].to_numpy() * 3).all()


class TestGroupedDistinct:
    def _events(self):
        import numpy as np

        rng = np.random.RandomState(3)
        return pd.DataFrame(
            {
                "event_type": np.repeat(["a", "b", "c"], 400),
                # group a: 50 distinct users, b: 200, c: 1
                "user_id": np.concatenate(
                    [rng.randint(0, 50, 400), rng.randint(1000, 1200, 400),
                     np.full(400, 7)]
                ),
            }
        )

    def test_exact_twin(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import grouped_distinct_exact

        df = self._events()
        out = (
            grouped_distinct_exact(
                ray.data.from_pandas(df), "event_type", "user_id"
            )
            .to_pandas()
            .set_index("event_type")["n_distinct"]
        )
        exp = df.groupby("event_type")["user_id"].nunique()
        assert out.to_dict() == exp.to_dict()

    def test_hll_close_to_exact(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import grouped_hll_distinct

        df = self._events()
        out = (
            grouped_hll_distinct(
                ray.data.from_pandas(df), "event_type", "user_id"
            )
            .to_pandas()
            .set_index("event_type")["n_distinct_est"]
        )
        exp = df.groupby("event_type")["user_id"].nunique()
        for g, true_n in exp.items():
            assert abs(out[g] - true_n) / true_n < 0.05, (g, out[g], true_n)


class TestEmbedDocuments:
    def test_deterministic_normalized_and_knn(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.similarity import embed_documents, knn_brute_force

        docs = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "alpha beta gamma delta",
                    "alpha beta gamma delta",      # identical to doc 0
                    "alpha beta gamma epsilon",    # near doc 0
                    "zeta eta theta iota kappa",   # disjoint
                ],
            }
        )
        out = (
            embed_documents(ray.data.from_pandas(docs), dim=16)
            .to_pandas()
            .set_index("vec_id")["embedding"]
        )
        v0, v1, v2, v3 = (np.asarray(out[i]) for i in range(4))
        # identical text → identical vector; all unit-norm
        assert np.allclose(v0, v1)
        for v in (v0, v2, v3):
            assert np.isclose(np.linalg.norm(v), 1.0)
        # rerun-stable (fresh dataset, same result)
        out2 = (
            embed_documents(ray.data.from_pandas(docs), dim=16)
            .to_pandas()
            .set_index("vec_id")["embedding"]
        )
        assert np.allclose(np.vstack(out.to_numpy()), np.vstack(out2.to_numpy()))
        # knn over the embeddings ranks the duplicate first
        emb_ds = embed_documents(ray.data.from_pandas(docs), dim=16)
        top = knn_brute_force(emb_ds, v0, k=2, exclude_vec_id=0).to_pandas()
        assert top.iloc[0]["vec_id"] == 1
        assert np.isclose(top.iloc[0]["cosine"], 1.0)


class TestTpchJoinShapes:
    """Semantic pins for the Q9/Q10/Q12-shaped pipelines beyond the
    oracle parametrization: conservation laws that hold regardless of
    the data."""

    SF = "/root/testdata/sf0.001"

    def test_priority_counts_conserve_lineitem_rows(self, ray_session):
        import pyarrow.parquet as pq

        from pdf_parser_ray.ops.relational import priority_flag_counts

        df = priority_flag_counts(self.SF).to_pandas()
        n_li = pq.read_metadata(f"{self.SF}/lineitem.parquet").num_rows
        # inner join on a key orders holds exactly once per lineitem →
        # every line lands in exactly one (flag, high|low) cell
        assert int(df["high_count"].sum() + df["low_count"].sum()) == n_li
        assert set(df["l_returnflag"]) == {"A", "N", "R"}

    def test_returned_revenue_is_descending_unique_topk(self, ray_session):
        from pdf_parser_ray.ops.relational import returned_revenue_topk

        df = returned_revenue_topk(self.SF, k=20).to_pandas()
        assert len(df) == 20
        assert df["c_custkey"].is_unique
        rev = df["revenue"].to_numpy()
        assert (rev[:-1] >= rev[1:]).all()

    def test_returned_revenue_routes_agree(self, ray_session):
        """r4 fused-exchange rewrite: the driver-finish route (custkey
        partials finished driver-side, one exchange) must equal the
        distributed grouped_sum route row for row."""
        import pandas as pd

        from pdf_parser_ray.ops.relational import returned_revenue_topk

        a = returned_revenue_topk(self.SF, k=20).to_pandas()
        b = returned_revenue_topk(
            self.SF, k=20, driver_finish=False
        ).to_pandas()
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )

    def test_returned_revenue_pool_limit_trips_loudly(self, ray_session):
        """VERDICT r4 #8: the driver finish pulls through a bounded
        limit+1 probe and raises (pointing at driver_finish=False)
        instead of OOMing when the partial pool outgrows the cap."""
        import pytest

        from pdf_parser_ray.ops.relational import returned_revenue_topk

        with pytest.raises(ValueError, match="driver_finish=False"):
            returned_revenue_topk(self.SF, k=20, pool_limit=3)

    def test_nation_profit_matches_driverless_pandas(self, ray_session):
        import numpy as np
        import pandas as pd

        from pdf_parser_ray.ops.relational import nation_profit

        got = (
            nation_profit(self.SF)
            .to_pandas()
            .sort_values(["n_name", "o_year"])
            .reset_index(drop=True)
        )
        li = pd.read_parquet(self.SF + "/lineitem.parquet")
        o = pd.read_parquet(self.SF + "/orders.parquet")
        s = pd.read_parquet(self.SF + "/supplier.parquet")
        n = pd.read_parquet(self.SF + "/nation.parquet")
        j = (
            li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
            .merge(s, left_on="l_suppkey", right_on="s_suppkey")
            .merge(n, left_on="s_nationkey", right_on="n_nationkey")
        )
        j["o_year"] = j["o_orderdate"].dt.year.astype("int64")
        j["profit_i"] = np.rint(j["l_extendedprice"] * 100).astype(
            "int64"
        ) * (100 - np.rint(j["l_discount"] * 100).astype("int64"))
        want = (
            j.groupby(["n_name", "o_year"], as_index=False)["profit_i"]
            .sum()
            .sort_values(["n_name", "o_year"])
            .reset_index(drop=True)
        )
        want["profit"] = ((want["profit_i"] + 50) // 100) / 100.0
        pd.testing.assert_frame_equal(
            got, want[["n_name", "o_year", "profit"]]
        )


class TestNewTpchShapes:
    """Semantic pins for the Q11/Q15/Q17/Q18/Q22-shaped pipelines (the
    oracle parametrization in test_queries covers value equality)."""

    SF = "/root/testdata/sf0.001"

    def test_top_supplier_is_argmax(self, ray_session):
        import pandas as pd

        from pdf_parser_ray.ops.relational import top_supplier_revenue

        df = top_supplier_revenue(self.SF).to_pandas()
        assert len(df) >= 1
        # recompute the window rollup serially; winner must be the max
        li = pd.read_parquet(f"{self.SF}/lineitem.parquet")
        m = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
               & (li["l_shipdate"] < pd.Timestamp("1996-04-01"))]
        rev = (m["l_extendedprice"] * (1 - m["l_discount"])).groupby(
            m["l_suppkey"]).sum()
        assert set(df["s_suppkey"]) == set(
            rev[rev == rev.max()].index.astype("int64"))

    def test_large_orders_threshold_and_order(self, ray_session):
        from pdf_parser_ray.ops.relational import large_order_customers

        df = large_order_customers(self.SF, min_qty=250).to_pandas()
        assert (df["sum_qty"] > 250).all()
        tp = df["o_totalprice"].to_numpy()
        assert (tp[:-1] >= tp[1:]).all()
        assert df["o_orderkey"].is_unique

    def test_idle_rich_excludes_recent_buyers(self, ray_session):
        import pandas as pd

        from pdf_parser_ray.ops.relational import idle_rich_customers

        df = idle_rich_customers(self.SF, since="2000-01-01").to_pandas()
        cust = pd.read_parquet(f"{self.SF}/customer.parquet")
        orders = pd.read_parquet(f"{self.SF}/orders.parquet")
        recent = set(orders.loc[
            orders["o_orderdate"] >= pd.Timestamp("2000-01-01"), "o_custkey"])
        pos = cust[cust["c_acctbal"] > 0]
        thr = pos["c_acctbal"].round(2).mul(100).round().sum() / len(pos) / 100.0
        exp = cust[(cust["c_acctbal"] > thr)
                   & ~cust["c_custkey"].isin(recent)]
        got_n = int(df["numcust"].sum()) if len(df) else 0
        assert got_n == len(exp)

    def test_brand_share_sums_to_leq_one(self, ray_session):
        from pdf_parser_ray.ops.relational import brand_revenue_share

        df = brand_revenue_share(self.SF, min_share=0.0).to_pandas()
        # with no share floor every brand appears and shares sum to 1
        assert abs(df["share"].sum() - 1.0) < 1e-9
        assert (df["share"] > 0).all()

    def test_small_qty_revenue_nonnegative_scalar(self, ray_session):
        from pdf_parser_ray.ops.relational import small_quantity_revenue

        df = small_quantity_revenue(self.SF)
        assert list(df.columns) == ["avg_yearly"]
        assert len(df) == 1 and df["avg_yearly"].iloc[0] >= 0.0


class TestGroupedTopK:
    def test_exact_when_under_capacity(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.sketches import grouped_top_k_frequent

        df = pd.DataFrame({
            "g": ["a"] * 10 + ["b"] * 6,
            "v": ["x"] * 5 + ["y"] * 3 + ["z"] * 2 + ["p"] * 4 + ["q"] * 2,
        })
        out = grouped_top_k_frequent(
            ray.data.from_pandas(df), "g", "v", k=2, capacity=100
        ).to_pandas().sort_values(["g", "n"], ascending=[True, False])
        a = out[out["g"] == "a"]
        assert list(zip(a["value"], a["n"])) == [("x", 5), ("y", 3)]
        b = out[out["g"] == "b"]
        assert list(zip(b["value"], b["n"])) == [("p", 4), ("q", 2)]

    def test_undercount_bound_when_over_capacity(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.sketches import grouped_top_k_frequent

        # one dominant value + 50 distinct noise values, capacity 8:
        # the heavy value must survive with count >= true - N/(cap+1)
        vals = ["hot"] * 200 + [f"n{i}" for i in range(50)] * 2
        df = pd.DataFrame({"g": ["only"] * len(vals), "v": vals})
        out = grouped_top_k_frequent(
            ray.data.from_pandas(df), "g", "v", k=1, capacity=8
        ).to_pandas()
        assert out["value"].iloc[0] == "hot"
        assert out["n"].iloc[0] >= 200 - len(vals) // 9


class TestApproxQuantiles:
    def test_accuracy_vs_exact_on_real_values(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from pdf_parser_ray.io_utils import read_parquet_clean
        from pdf_parser_ray.ops.sketches import approx_quantiles

        sf = "/root/testdata/sf0.01"
        ds = read_parquet_clean(
            f"{sf}/events.parquet", columns=["event_id", "value"]
        )
        got = approx_quantiles(
            ds, "value", [0.5, 0.9], k=4096, id_col="event_id"
        )
        vals = pd.read_parquet(f"{sf}/events.parquet", columns=["value"])[
            "value"
        ].to_numpy()
        for q, name in [(0.5, "q50"), (0.9, "q90")]:
            exact = np.quantile(vals, q)
            est = got[name].iloc[0]
            # rank error O(1/sqrt(k)); translate via a generous value band
            lo, hi = np.quantile(vals, max(0, q - 0.05)), np.quantile(
                vals, min(1, q + 0.05)
            )
            assert lo <= est <= hi, (name, est, exact)

    def test_rerun_stable_and_merge_invariant(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.sketches import approx_quantiles

        df = pd.DataFrame({
            "event_id": range(5000),
            "value": [float((i * 37) % 1000) for i in range(5000)],
        })
        one = approx_quantiles(
            ray.data.from_pandas(df), "value", [0.5], k=512, id_col="event_id"
        )
        # different partitioning, same sample (hash-determined)
        two = approx_quantiles(
            ray.data.from_pandas(df).repartition(7), "value", [0.5],
            k=512, id_col="event_id",
        )
        assert one["q50"].iloc[0] == two["q50"].iloc[0]


class TestColoJoin:
    def test_matches_pandas_merge_multikey(self, ray_session):
        from pdf_parser_ray.ops.relational import colo_join

        rng = np.random.RandomState(3)
        left = pd.DataFrame(
            {
                "k1": rng.randint(0, 20, 300).astype("int64"),
                "k2": rng.randint(0, 3, 300).astype("int64"),
                "lv": rng.randn(300),
                "flag": rng.rand(300) > 0.5,
            }
        )
        right = pd.DataFrame(
            {
                "k1": rng.randint(0, 20, 120).astype("int64"),
                "k2": rng.randint(0, 3, 120).astype("int64"),
                "rv": rng.randint(0, 1000, 120).astype("int64"),
            }
        ).drop_duplicates(["k1", "k2"])

        out = (
            colo_join(
                ray.data.from_pandas([left.iloc[:150], left.iloc[150:]]),
                ray.data.from_pandas(right),
                ("k1", "k2"),
                ["lv", "flag"],
                ["rv"],
            )
            .to_pandas()
            .sort_values(["k1", "k2", "lv"], ignore_index=True)
        )
        expect = left.merge(right, on=["k1", "k2"]).sort_values(
            ["k1", "k2", "lv"], ignore_index=True
        )
        assert len(out) == len(expect)
        assert (out["rv"].to_numpy() == expect["rv"].to_numpy()).all()
        # dtype restoration: bool stays usable under numpy semantics
        assert (~out["flag"].to_numpy(dtype=bool)).sum() == (
            ~expect["flag"].to_numpy()
        ).sum()

    def test_empty_side_yields_empty(self, ray_session):
        from pdf_parser_ray.ops.relational import colo_join

        left = pd.DataFrame({"k": pd.Series([1, 2], dtype="int64"),
                             "lv": [0.5, 1.5]})
        right = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                              "rv": pd.Series([], dtype="int64")})
        out = colo_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            ("k",), ["lv"], ["rv"],
        )
        assert out.count() == 0


class TestColoJoinOuter:
    def _frames(self):
        rng = np.random.RandomState(7)
        left = pd.DataFrame(
            {
                "k": rng.randint(0, 30, 200).astype("int64"),
                "lv": rng.randint(0, 100, 200).astype("int64"),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.randint(15, 45, 80).astype("int64"),
                "rv": rng.randint(0, 100, 80).astype("int64"),
            }
        )
        return left, right

    @pytest.mark.parametrize("how", ["left", "outer"])
    def test_matches_pandas_merge(self, ray_session, how):
        from pdf_parser_ray.ops.relational import colo_join

        left, right = self._frames()
        out = (
            colo_join(
                ray.data.from_pandas([left.iloc[:100], left.iloc[100:]]),
                ray.data.from_pandas(right),
                ("k",),
                ["lv"],
                ["rv"],
                how=how,
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"], ignore_index=True)
        )
        expect = left.merge(right, on="k", how=how).sort_values(
            ["k", "lv", "rv"], ignore_index=True
        )
        assert len(out) == len(expect)
        for c in ("lv", "rv"):
            a = pd.to_numeric(out[c]).fillna(-1).to_numpy()
            b = expect[c].fillna(-1).to_numpy()
            assert (a == b).all(), c

    def test_rejects_unknown_how(self, ray_session):
        from pdf_parser_ray.ops.relational import colo_join

        left, right = self._frames()
        with pytest.raises(ValueError):
            colo_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                ("k",),
                ["lv"],
                ["rv"],
                how="right",
            )


class TestRendezvousAssign:
    def _run(self, shards, n=300):
        import ray.data

        from pdf_parser_ray.ops.shuffle import rendezvous_assign

        df = pd.DataFrame({"key": [f"k{i}" for i in range(n)]})
        return (
            rendezvous_assign(ray.data.from_pandas(df), "key", shards)
            .to_pandas()
            .set_index("key")["shard"]
        )

    def test_minimal_disruption_on_shard_removal(self, ray_session):
        full = self._run(["s1", "s2", "s3", "s4"])
        # every shard gets a reasonable share (md5 uniformity)
        counts = full.value_counts()
        assert set(counts.index) == {"s1", "s2", "s3", "s4"}
        assert counts.min() > 30
        # remove s3: ONLY s3's keys move — the HRW property
        reduced = self._run(["s1", "s2", "s4"])
        stayed = full[full != "s3"]
        pd.testing.assert_series_equal(reduced.loc[stayed.index], stayed)
        moved = reduced.loc[full[full == "s3"].index]
        assert set(moved.unique()) <= {"s1", "s2", "s4"}

    def test_deterministic_and_order_independent(self, ray_session):
        a = self._run(["s1", "s2", "s3", "s4"])
        b = self._run(["s4", "s3", "s2", "s1"])  # shard order irrelevant
        pd.testing.assert_series_equal(a, b)


class TestHllOverlapPairs:
    def test_overlap_tracks_truth(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import hll_overlap_pairs

        # A = 0..5999, B = 3000..8999 (3000 shared), C disjoint 1000
        rows = (
            [("A", i) for i in range(6000)]
            + [("B", i) for i in range(3000, 9000)]
            + [("C", i) for i in range(20000, 21000)]
        )
        df = pd.DataFrame(rows, columns=["grp", "uid"])
        df["uid"] = df["uid"].astype(str)
        out = hll_overlap_pairs(
            ray.data.from_pandas(df).repartition(6), "grp", "uid"
        ).set_index(["type_a", "type_b"])
        ab = out.loc[("A", "B"), "est_overlap"]
        assert abs(ab - 3000) / 3000 < 0.15  # HLL b=12 ≈ 1.6% σ
        assert abs(out.loc[("A", "C"), "est_overlap"]) < 6000 * 0.1
        assert out.loc[("B", "C"), "est_union"] > 6500

    def test_partition_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import hll_overlap_pairs

        rows = [(f"t{i%3}", str(i % 500)) for i in range(2000)]
        df = pd.DataFrame(rows, columns=["grp", "uid"])
        outs = [
            hll_overlap_pairs(
                ray.data.from_pandas(df).repartition(p), "grp", "uid"
            )
            for p in (1, 7)
        ]
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestMisraGries:
    def test_guarantee_vs_exact(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import misra_gries_heavy

        # zipf-ish stream: few heavy users + long tail
        rng = np.random.RandomState(5)
        vals = np.concatenate(
            [
                np.repeat([f"heavy{i}" for i in range(5)], 800),
                rng.randint(0, 3000, 6000).astype(str),
            ]
        )
        rng.shuffle(vals)
        df = pd.DataFrame({"u": vals})
        k = 32
        out = misra_gries_heavy(
            ray.data.from_pandas(df).repartition(7), "u", k=k
        )
        n = len(vals)
        assert (out["n"] == n).all() and (out["err_bound"] == n // k).all()
        exact = pd.Series(vals).value_counts()
        items = set(out["item"])
        # every item with true freq > n/k must be present
        for item, c in exact.items():
            if c > n // k:
                assert item in items, item
        # each kept counter lower-bounds truth within n/k
        for item, est in zip(out["item"], out["est"]):
            assert est <= exact[item]
            assert exact[item] - est <= n // k
        assert len(out) <= k

    def test_small_stream_exact(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import misra_gries_heavy

        df = pd.DataFrame({"u": ["a"] * 5 + ["b"] * 3 + ["c"]})
        out = misra_gries_heavy(ray.data.from_pandas(df), "u", k=16)
        got = dict(zip(out["item"], out["est"]))
        assert got == {"a": 5, "b": 3, "c": 1}  # no prune below k

    def test_pruned_empty_batch_still_counts_n(self, ray_session):
        """A batch whose prune empties its summary (all-distinct values,
        every count equal to the (k+1)-th) must STILL contribute its
        stream length — n rode only on kept rows, so such batches
        silently understated n_total and err_bound (ADVICE r2)."""
        import ray.data

        from pdf_parser_ray.ops.sketches import misra_gries_heavy

        k = 4
        # block 1: 10 all-distinct values -> per-batch prune drops every
        # counter (counts all 1, sub 1); block 2: one heavy value
        distinct = pd.DataFrame({"u": [f"d{i}" for i in range(10)]})
        heavy = pd.DataFrame({"u": ["h"] * 20})
        ds = ray.data.from_pandas([distinct, heavy])
        out = misra_gries_heavy(ds, "u", k=k)
        assert (out["n"] == 30).all()          # 10 distinct + 20 heavy
        assert (out["err_bound"] == 30 // k).all()
        assert "h" in set(out["item"])
        assert out["item"].notna().all()       # sentinels never surface


class TestKllSketch:
    def test_weight_conservation_invariant(self):
        from pdf_parser_ray.ops.sketches import KLLSketch

        rng = np.random.RandomState(3)
        s = KLLSketch(k=64)
        total = 0
        for _ in range(20):
            chunk = rng.randn(1000)
            s.update_many(chunk)
            total += len(chunk)
            got = sum((1 << h) * len(lv) for h, lv in enumerate(s.levels))
            assert got == total == s.n

    def test_rank_error_uniform_and_sorted(self):
        from pdf_parser_ray.ops.sketches import KLLSketch

        rng = np.random.RandomState(9)
        for data in (rng.uniform(0, 1, 50_000), np.arange(50_000.0)):
            s = KLLSketch(k=200)
            for i in range(0, len(data), 2048):
                s.update_many(data[i : i + 2048])
            srt = np.sort(data)
            for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
                est = s.quantile(q)
                true_rank = np.searchsorted(srt, est) / len(data)
                assert abs(true_rank - q) < 0.025, (q, true_rank)

    def test_merge_matches_single_stream_error(self):
        from pdf_parser_ray.ops.sketches import KLLSketch

        rng = np.random.RandomState(1)
        a_data, b_data = rng.gamma(2, 3, 20_000), rng.gamma(5, 1, 20_000)
        a, b = KLLSketch(200), KLLSketch(200)
        a.update_many(a_data)
        b.update_many(b_data)
        m = a.merge(b)
        assert m.n == 40_000
        assert sum((1 << h) * len(lv) for h, lv in enumerate(m.levels)) == m.n
        srt = np.sort(np.concatenate([a_data, b_data]))
        for q in (0.1, 0.5, 0.9):
            true_rank = np.searchsorted(srt, m.quantile(q)) / len(srt)
            assert abs(true_rank - q) < 0.03

    def test_distributed_vs_exact(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import kll_quantiles

        rng = np.random.RandomState(7)
        vals = rng.lognormal(0, 1, 30_000)
        df = pd.DataFrame({"value": vals})
        out = kll_quantiles(
            ray.data.from_pandas(df).repartition(8), "value"
        )
        assert out["n"].iloc[0] == 30_000
        srt = np.sort(vals)
        for q, est in zip(out["q"], out["value"]):
            true_rank = np.searchsorted(srt, est) / len(srt)
            assert abs(true_rank - q) < 0.03
        # quantile estimates are monotone in q
        assert (np.diff(out["value"]) >= 0).all()


class TestExactCapacityGates:
    """ADVICE r4: the MG/KLL SQL oracles assume the exact-capacity tier;
    at a bigger sf the sketches would silently compact and the twins
    would diverge with no signal.  The query layer now asserts the
    precondition at runtime — these tests trip both gates."""

    def _events(self, tmp_path, n_users=8, rows=24):
        import pandas as pd

        # Skewed: user 0 dominates, so an undersized MG summary keeps a
        # decremented (under-counted) survivor rather than pruning to
        # empty — both shapes must trip the gate (the empty-summary
        # shape is covered by the ds.count() witness in the query).
        uid = [0] * (rows - n_users + 1) + list(range(1, n_users))
        df = pd.DataFrame({
            "user_id": pd.Series(uid, dtype="int64"),
            "value": pd.Series(
                [float(i) for i in range(rows)], dtype="float64"
            ),
        })
        df.to_parquet(tmp_path / "events.parquet")
        return str(tmp_path)

    def test_mg_gate_trips_on_overflow(self, ray_session, tmp_path, monkeypatch):
        import pytest

        import pdf_parser_ray.queries as q

        sf_dir = self._events(tmp_path)
        monkeypatch.setattr(q, "_MG_EXACT_K", 3)  # < 8 distinct users
        with pytest.raises(AssertionError, match="exact-capacity tier"):
            q.q_mg_heavy_users(sf_dir)

    def test_mg_gate_passes_at_capacity(self, ray_session, tmp_path):
        import pdf_parser_ray.queries as q

        out = q.q_mg_heavy_users(self._events(tmp_path))
        assert len(out) == 8 and int(out["est"].sum()) == 24
        assert int(out["est"].iloc[0]) == 17  # dominant user exact

    def test_kll_gate_trips_on_overflow(self, ray_session, tmp_path, monkeypatch):
        import pytest

        import pdf_parser_ray.queries as q

        sf_dir = self._events(tmp_path)
        monkeypatch.setattr(q, "_KLL_EXACT_K", 10)  # < 24 rows
        with pytest.raises(AssertionError, match="exact-capacity tier"):
            q.q_kll_quantiles(sf_dir)

    def test_kll_gate_passes_at_capacity(self, ray_session, tmp_path):
        import pdf_parser_ray.queries as q

        out = q.q_kll_quantiles(self._events(tmp_path))
        assert int(out["n"].iloc[0]) == 24
