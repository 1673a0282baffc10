"""HLL sketch accuracy + semi/anti broadcast joins + distinct."""

import numpy as np
import pandas as pd
import pytest

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
