"""Unit tests for ops/curation.py (split assignment, decontamination,
sequence packing, TF-IDF)."""

import hashlib

import numpy as np
import pandas as pd
import pytest


def _docs_ds(rows):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(rows))


class TestAssignSplits:
    def test_boundaries_partition_by_md5_prefix(self, ray_session):
        from pdf_parser_ray.ops.curation import assign_splits

        df = pd.DataFrame({"doc_id": pd.Series(range(200), dtype="int64")})
        out = assign_splits(_docs_ds(df)).to_pandas().set_index("doc_id")
        for i in range(200):
            p = hashlib.md5(str(i).encode()).hexdigest()[:2]
            want = "train" if p < "d0" else ("val" if p < "e8" else "test")
            assert out.loc[i, "split"] == want

    def test_passthrough_and_all_splits_nonempty(self, ray_session):
        from pdf_parser_ray.ops.curation import assign_splits

        df = pd.DataFrame(
            {"doc_id": pd.Series(range(300), dtype="int64"), "x": 1.5}
        )
        out = assign_splits(_docs_ds(df)).to_pandas()
        assert set(out.columns) == {"doc_id", "x", "split"}
        assert set(out["split"].unique()) == {"train", "val", "test"}

    def test_partitioning_invariance(self, ray_session):
        """The hash gate ignores block layout: 1 block vs 8 blocks
        assign identically (the resumability property)."""
        from pdf_parser_ray.ops.curation import assign_splits

        df = pd.DataFrame({"doc_id": pd.Series(range(64), dtype="int64")})
        one = assign_splits(_docs_ds(df)).to_pandas().sort_values("doc_id")
        many = (
            assign_splits(_docs_ds(df).repartition(8))
            .to_pandas()
            .sort_values("doc_id")
        )
        assert one["split"].tolist() == many["split"].tolist()


class TestDecontaminate:
    def test_counts_verbatim_hits(self, ray_session):
        from pdf_parser_ray.ops.curation import decontaminate

        ds = _docs_ds(
            {
                "doc_id": pd.Series([0, 1, 2], dtype="int64"),
                "text": [
                    "the quick brown fox",
                    "quick brown shoes and brown fox",
                    "nothing here",
                ],
            }
        )
        out = (
            decontaminate(ds, ["quick brown", "brown fox"])
            .to_pandas()
            .set_index("doc_id")["n_probe_hits"]
        )
        assert out.loc[0] == 2      # both probes occur
        assert out.loc[1] == 2      # each probe counted once per doc
        assert out.loc[2] == 0

    def test_null_text_is_zero_hits(self, ray_session):
        from pdf_parser_ray.ops.curation import decontaminate

        ds = _docs_ds(
            {"doc_id": pd.Series([0], dtype="int64"), "text": [None]}
        )
        out = decontaminate(ds, ["x"]).to_pandas()
        assert out["n_probe_hits"].tolist() == [0]

    def test_probe_ngrams_rule(self, ray_session):
        from pdf_parser_ray.ops.curation import probe_ngrams

        ds = _docs_ds(
            {
                "doc_id": pd.Series([2, 0, 1], dtype="int64"),
                "text": ["c c c", "a b c d e f g h", "x y"],
            }
        )
        probes = probe_ngrams(ds, max_probe_docs=2, probe_words=6)
        assert probes == ["a b c d e f", "x y"]  # id-ordered, ≤6 words


class TestPackSequences:
    def test_block_packing_rule(self, ray_session):
        """Docs of 600 tokens, budget 1000: doc i has prior 600·i, so
        pack_id = floor(600·i / 1000) — the exact prior-sum contract."""
        from pdf_parser_ray.ops.curation import pack_sequences

        text = " ".join(["w"] * 600)
        ds = _docs_ds(
            {
                "doc_id": pd.Series(range(10), dtype="int64"),
                "text": [text] * 10,
            }
        )
        out = (
            pack_sequences(ds, budget=1000, group_size=100)
            .to_pandas()
            .sort_values(["grp", "pack_id"])
            .reset_index(drop=True)
        )
        want = pd.Series([600 * i // 1000 for i in range(10)])
        expected = want.value_counts().sort_index()
        assert out["grp"].unique().tolist() == [0]
        assert out["pack_id"].tolist() == expected.index.tolist()
        assert out["n_docs"].tolist() == expected.tolist()
        assert (out["sum_tokens"] == out["n_docs"] * 600).all()

    def test_groups_bound_the_shuffle_key(self, ray_session):
        from pdf_parser_ray.ops.curation import pack_sequences

        ds = _docs_ds(
            {
                "doc_id": pd.Series([0, 99, 100, 250], dtype="int64"),
                "text": ["a b", "a b", "a b", "a b"],
            }
        )
        out = pack_sequences(ds, budget=10, group_size=100).to_pandas()
        assert sorted(out["grp"].unique()) == [0, 1, 2]

    def test_conservation(self, ray_session):
        """Every doc lands in exactly one pack; token totals conserve."""
        from pdf_parser_ray.ops.curation import pack_sequences

        rng = np.random.RandomState(3)
        texts = [" ".join(["t"] * int(n)) for n in rng.randint(1, 50, 57)]
        ds = _docs_ds(
            {"doc_id": pd.Series(range(57), dtype="int64"), "text": texts}
        )
        out = pack_sequences(ds, budget=100, group_size=20).to_pandas()
        assert out["n_docs"].sum() == 57
        assert out["sum_tokens"].sum() == sum(len(t.split(" ")) for t in texts)


class TestTfidfTopTerms:
    def test_rare_term_wins(self, ray_session):
        from pdf_parser_ray.ops.curation import tfidf_top_terms

        ds = _docs_ds(
            {
                "doc_id": pd.Series([0, 1, 2], dtype="int64"),
                "text": [
                    "common common zebra",
                    "common yak",
                    "common common common",
                ],
            }
        )
        out = tfidf_top_terms(ds, k=1).to_pandas().set_index("doc_id")
        # 'common' has df=3 → idf=0; the rare terms win their docs.
        assert out.loc[0, "token"] == "zebra"
        assert out.loc[1, "token"] == "yak"
        assert out.loc[2, "token"] == "common" and out.loc[2, "score"] == 0.0

    def test_tie_break_token_ascending(self, ray_session):
        from pdf_parser_ray.ops.curation import tfidf_top_terms

        ds = _docs_ds(
            {
                "doc_id": pd.Series([0, 1], dtype="int64"),
                "text": ["bb aa", "cc"],
            }
        )
        out = tfidf_top_terms(ds, k=2).to_pandas()
        d0 = out[out["doc_id"] == 0]
        # aa and bb both df=1, tf=1 → equal score; token asc decides.
        assert d0["token"].tolist() == ["aa", "bb"]

    def test_k_limits_rows(self, ray_session):
        from pdf_parser_ray.ops.curation import tfidf_top_terms

        ds = _docs_ds(
            {
                "doc_id": pd.Series([0], dtype="int64"),
                "text": ["a b c d e f"],
            }
        )
        assert tfidf_top_terms(ds, k=3).to_pandas().shape[0] == 3

    def test_join_route_matches_broadcast(self, ray_session):
        """VERDICT r4 #1 parity gate: the hash-join-on-token scale path
        must select the exact rows (and bit-identical scores) the
        broadcast route selects, and auto must fall through to it when
        the vocabulary outgrows the broadcast limit."""
        import numpy as np
        import pytest

        from pdf_parser_ray.ops.curation import tfidf_top_terms

        rng = np.random.RandomState(11)
        words = ("red green blue slate amber coral lilac olive pearl "
                 "onyx quartz topaz jade ruby beryl agate").split()
        texts = [" ".join(rng.choice(words, 12)) + f" rare{i % 7}"
                 for i in range(40)]
        ds = _docs_ds({
            "doc_id": pd.Series(range(40), dtype="int64"),
            "text": texts,
        })
        key = ["doc_id", "token"]
        bc = tfidf_top_terms(ds, k=3, mode="broadcast").to_pandas() \
            .sort_values(key).reset_index(drop=True)
        jn = tfidf_top_terms(ds, k=3, mode="join").to_pandas() \
            .sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(bc, jn)  # scores bit-identical
        # Explicit broadcast raises over the limit; auto falls through.
        with pytest.raises(ValueError, match="mode='join'"):
            tfidf_top_terms(ds, k=3, mode="broadcast", broadcast_limit=2)
        au = tfidf_top_terms(ds, k=3, broadcast_limit=2).to_pandas() \
            .sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(bc, au)

    def test_join_route_empty_corpus(self, ray_session):
        from pdf_parser_ray.ops.curation import tfidf_top_terms

        ds = _docs_ds({
            "doc_id": pd.Series([0, 1], dtype="int64"),
            "text": ["", ""],
        })
        out = tfidf_top_terms(ds, k=3, mode="join")
        # Zero rows, but the dataset keeps the typed result schema
        # (to_pandas drops columns on any empty Dataset — Ray behavior,
        # same on the broadcast route).
        assert out.schema().names == ["doc_id", "token", "score"]
        assert len(out.to_pandas()) == 0


class TestExportTrainingData:
    def test_end_to_end_partitioned_export(self, ray_session, tmp_path):
        import hashlib

        import ray.data

        from pdf_parser_ray.pipelines import export_training_data

        rows = []
        for i in range(40):
            rows.append({"doc_id": i, "text": f"alpha beta gamma delta epsilon {i}"})
        # dup pair: same text normalized, different case/spacing → min id wins
        rows.append({"doc_id": 100, "text": "Same   Text here ok five"})
        rows.append({"doc_id": 101, "text": "same text here ok five"})
        # low quality: too few tokens
        rows.append({"doc_id": 102, "text": "too short"})
        # repetitive: dup_frac = 1 - 1/8 > 0.6
        rows.append({"doc_id": 103, "text": "x x x x x x x x"})
        ds = ray.data.from_pandas(pd.DataFrame(rows).astype({"doc_id": "int64"}))

        out = str(tmp_path / "export")
        counts = export_training_data(ds, out)
        # 40 uniques + 1 dedup winner survive; 102/103 gated out
        assert sum(counts.values()) == 41
        surviving = ray.data.read_parquet(out).to_pandas()
        assert 100 in surviving["doc_id"].tolist()       # min-id winner
        assert 101 not in surviving["doc_id"].tolist()
        assert 102 not in surviving["doc_id"].tolist()
        assert 103 not in surviving["doc_id"].tolist()
        assert "fp" not in surviving.columns
        # hive partition dirs exist and match the hash-gate assignment
        import os

        for name, n in counts.items():
            d = os.path.join(out, f"split={name}")
            assert (os.path.isdir(d)) == (n > 0)
        p = hashlib.md5(b"100").hexdigest()[:2]
        want = "train" if p < "d0" else ("val" if p < "e8" else "test")
        row = surviving[surviving["doc_id"] == 100]
        assert row["split"].iloc[0] == want

    def test_dedup_rare_order_col_winner_both_routes(self, ray_session):
        import ray.data

        from pdf_parser_ray.pipelines import dedup_rare

        df = pd.DataFrame(
            {
                "k": ["a", "a", "b", "c", "a"],
                "doc_id": pd.Series([5, 2, 9, 1, 7], dtype="int64"),
            }
        )
        for rare in (True, False):
            out = (
                dedup_rare(
                    ray.data.from_pandas(df),
                    "k",
                    order_col="doc_id",
                    assume_rare_dups=rare,
                )
                .to_pandas()
                .sort_values("k")
            )
            assert out["doc_id"].tolist() == [2, 9, 1]

    def test_dedup_rare_no_duplicates_short_circuit(self, ray_session):
        """Zero repeated keys: rows stream through (regression — an
        empty broadcast array was null-typed and broke is_in)."""
        import ray.data

        from pdf_parser_ray.pipelines import dedup_rare

        df = pd.DataFrame(
            {"k": ["a", "b", "c"], "doc_id": pd.Series([1, 2, 3], dtype="int64")}
        )
        out = dedup_rare(ray.data.from_pandas(df), "k", order_col="doc_id")
        assert out.count() == 3


class TestDecontaminateWordgram:
    def test_wordgram_counts_distinct_aligned_probes(self, ray_session):
        from pdf_parser_ray.ops.curation import decontaminate

        ds = _docs_ds(
            {
                "doc_id": pd.Series([0, 1, 2], dtype="int64"),
                "text": [
                    "the quick brown fox jumps",
                    "quick brown quick brown",   # probe repeats → counted once
                    "ba b c",                    # substring-only match for 'a b'
                ],
            }
        )
        probes = ["quick brown", "brown fox"]
        out = (
            decontaminate(ds, probes, mode="wordgram")
            .to_pandas()
            .set_index("doc_id")["n_probe_hits"]
        )
        assert out.loc[0] == 2
        assert out.loc[1] == 1   # distinct probes present, not occurrences
        assert out.loc[2] == 0   # 'a b' would substring-match but not word-align

    def test_wordgram_matches_substring_on_aligned_corpus(self, ray_session):
        """On word-aligned text with probes occurring at most once per
        doc, the scale route agrees with the exact substring scan."""
        from pdf_parser_ray.ops.curation import decontaminate

        ds = _docs_ds(
            {
                "doc_id": pd.Series(range(4), dtype="int64"),
                "text": [
                    "alpha beta gamma delta",
                    "gamma delta epsilon",
                    "zeta eta theta",
                    "beta gamma",
                ],
            }
        )
        probes = ["alpha beta", "gamma delta", "beta gamma"]
        a = decontaminate(ds, probes).to_pandas().sort_values("doc_id")
        b = (
            decontaminate(ds, probes, mode="wordgram")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert a["n_probe_hits"].tolist() == b["n_probe_hits"].tolist()

    def test_mixed_width_probes_rejected(self, ray_session):
        from pdf_parser_ray.ops.curation import decontaminate

        ds = _docs_ds({"doc_id": pd.Series([0], dtype="int64"), "text": ["x"]})
        with pytest.raises(ValueError, match="equal-width"):
            decontaminate(ds, ["a b", "a b c"], mode="wordgram")


class TestIncrementalDedup:
    def test_second_increment_drops_only_seen(self, ray_session, tmp_path):
        """Export batch 1's fingerprints as the index; ingest a second
        batch overlapping batch 1 → only genuinely-new rows survive."""
        import hashlib

        import ray.data

        from pdf_parser_ray.pipelines import incremental_dedup
        from pdf_parser_ray.ops.text_stats import _WS

        def fp(t):
            norm = " ".join(t.lower().split())
            return hashlib.md5(norm.encode()).hexdigest()

        batch1 = [f"first batch document number {i} body" for i in range(30)]
        pd.DataFrame({"fp": [fp(t) for t in batch1]}).to_parquet(
            tmp_path / "index.parquet"
        )

        batch2_rows = []
        for i in range(10, 40):   # 10-29 overlap batch1, 30-39 new
            batch2_rows.append(
                {"doc_id": 1000 + i, "text": f"first batch document number {i} body"}
            )
        batch2_rows.append({"doc_id": 2000, "text": "Entirely   new page"})
        batch2_rows.append({"doc_id": 2001, "text": "entirely new page"})  # intra dup
        ds = ray.data.from_pandas(
            pd.DataFrame(batch2_rows).astype({"doc_id": "int64"})
        )

        out = incremental_dedup(ds, str(tmp_path / "index.parquet")).to_pandas()
        ids = sorted(out["doc_id"].tolist())
        # 30-39 are new (10 rows) + one winner of the 2000/2001 intra-dup
        assert ids == [1000 + i for i in range(30, 40)] + [2000]
        assert "fp" in out.columns  # caller can append these to the index

    def test_all_new_when_index_disjoint(self, ray_session, tmp_path):
        import ray.data

        from pdf_parser_ray.pipelines import incremental_dedup

        pd.DataFrame({"fp": ["0" * 32, "f" * 32]}).to_parquet(
            tmp_path / "idx.parquet"
        )
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([1, 2], dtype="int64"),
                    "text": ["alpha beta", "gamma delta"],
                }
            )
        )
        assert incremental_dedup(ds, str(tmp_path / "idx.parquet")).count() == 2

    def test_sharded_route_matches_driver(self, ray_session, tmp_path):
        """VERDICT r3 #3: the sharded-Bloom route (keys co-partitioned
        by shard, filters built and probed partition-locally) must keep
        exactly the driver-OR route's survivors, with NO full bit array
        on the driver and per-shard filters bounded by
        shard_filter_bytes."""
        import hashlib

        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.relational import BloomFilter
        from pdf_parser_ray.pipelines import _bloom_bytes, incremental_dedup

        def fp(t):
            norm = " ".join(t.lower().split())
            return hashlib.md5(norm.encode()).hexdigest()

        idx_texts = [f"indexed page number {i} content" for i in range(200)]
        pd.DataFrame({"fp": [fp(t) for t in idx_texts]}).to_parquet(
            tmp_path / "index.parquet"
        )
        rows = [
            {"doc_id": 5000 + i, "text": f"indexed page number {i} content"}
            for i in range(150, 230)           # 150-199 overlap, 200-229 new
        ]
        ds = lambda: ray.data.from_pandas(
            pd.DataFrame(rows).astype({"doc_id": "int64"})
        )
        idx = str(tmp_path / "index.parquet")

        drv = incremental_dedup(ds(), idx, bloom_mode="driver").to_pandas()
        # shard-forcing parameters: the full filter is ~360 B at 200
        # keys / 0.001 → cap shards at 64 B each → several shards
        shard_cap = 64
        shr = incremental_dedup(
            ds(), idx, bloom_mode="sharded", shard_filter_bytes=shard_cap
        ).to_pandas()
        key = ["doc_id"]
        pd.testing.assert_frame_equal(
            drv.sort_values(key).reset_index(drop=True)[["doc_id", "fp"]],
            shr.sort_values(key).reset_index(drop=True)[["doc_id", "fp"]],
        )
        assert sorted(shr["doc_id"]) == [5000 + i for i in range(200, 230)]
        # per-message bound: each partition-local shard filter is sized
        # for n_index/n_shards keys → its byte size ≤ the full filter's
        # and shrinks with the shard count
        full_bytes = _bloom_bytes(200, 0.001)
        n_shards = max(2, -(-full_bytes // shard_cap))
        shard_items = -(-200 // n_shards)
        assert len(BloomFilter(shard_items, 0.001).bits) < full_bytes
        assert n_shards >= 4
        # auto with a tiny driver budget must take the sharded route
        # (same survivors), never allocating the full driver filter
        auto = incremental_dedup(
            ds(), idx, driver_filter_bytes=shard_cap,
            shard_filter_bytes=shard_cap,
        ).to_pandas()
        assert sorted(auto["doc_id"]) == sorted(shr["doc_id"])


class TestLmScoreJoinMode:
    def test_parity_with_broadcast(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from pdf_parser_ray.ops.text_stats import lm_score

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "alpha beta alpha beta gamma",
                    "alpha beta",
                    "gamma alpha beta",
                    "solo",  # <2 tokens → emits nothing (inner semantics)
                ],
            }
        )
        a = (
            lm_score(rd.from_pandas(docs))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            lm_score(rd.from_pandas(docs), mode="join")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(a["doc_id"]) == [1, 2, 3]
        pd.testing.assert_frame_equal(a, b[a.columns])


class TestDeterministicShuffle:
    def test_rerun_and_partitioning_invariant(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.curation import deterministic_shuffle

        df = pd.DataFrame({"doc_id": list(range(200))})
        a = (
            deterministic_shuffle(ray.data.from_pandas(df).repartition(7))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            deterministic_shuffle(ray.data.from_pandas(df).repartition(2))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        # every shard's positions are exactly 0..len(shard)-1
        for _, g in a.groupby("shard"):
            assert sorted(g["pos"]) == list(range(len(g)))
        # shards are reasonably balanced (uniform hash, 200 rows / 8)
        sizes = a["shard"].value_counts()
        assert sizes.min() >= 10 and sizes.max() <= 45


class TestRebalanceSources:
    def test_targets_respected_and_deterministic(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.curation import rebalance_sources

        # 3 sources with very different sizes; big-n so gate noise is small
        df = pd.DataFrame(
            {
                "doc_id": np.arange(7000),
                "source": ["web"] * 4000 + ["books"] * 2000 + ["wiki"] * 1000,
            }
        )
        ds = ray.data.from_pandas(df)
        targets = {"web": 0.5, "books": 0.25, "wiki": 0.25}
        out = rebalance_sources(ds, targets).to_pandas()
        got = out.groupby("source").size()
        # wiki is the binding source (1000/0.25 = 4000 = min T) → keeps all
        assert got["wiki"] == 1000
        # others downsample to ~ target*T with 16-bit gate noise
        assert abs(got["web"] - 2000) < 150
        assert abs(got["books"] - 1000) < 120
        # rerun identical (hash gate, no RNG)
        out2 = rebalance_sources(ds, targets).to_pandas()
        assert sorted(out2["doc_id"]) == sorted(out["doc_id"])

    def test_missing_source_drops(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.curation import rebalance_sources

        df = pd.DataFrame(
            {"doc_id": range(100), "source": ["a"] * 50 + ["b"] * 50}
        )
        out = rebalance_sources(
            ray.data.from_pandas(df), {"a": 1.0}
        ).to_pandas()
        assert set(out["source"]) == {"a"} and len(out) == 50


class TestChunkDocuments:
    def test_boundaries_overlap_and_tail(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.curation import chunk_documents

        words = [f"w{i}" for i in range(10)]
        df = pd.DataFrame({
            "doc_id": pd.Series([1, 2], dtype="int64"),
            "text": [" ".join(words), ""],
        })
        out = chunk_documents(
            ray.data.from_pandas(df), chunk_tokens=4, overlap=1
        ).to_pandas().sort_values(["doc_id", "chunk_idx"])
        # stride 3: starts 0,3,6,9 -> chunks w0-3, w3-6, w6-9, w9
        assert list(out["doc_id"].unique()) == [1]  # empty doc emits nothing
        assert list(out["chunk_text"]) == [
            "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9",
        ]
        assert list(out["n_tokens"]) == [4, 4, 4, 1]
        assert list(out["chunk_idx"]) == [0, 1, 2, 3]

    def test_overlap_validation(self, ray_session):
        import pytest as _pt

        from pdf_parser_ray.ops.curation import chunk_documents

        with _pt.raises(ValueError):
            chunk_documents(None, chunk_tokens=4, overlap=4)


class TestValidateRows:
    def test_each_rule_kind_fires(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.curation import validate_rows

        df = pd.DataFrame({
            "doc_id": pd.Series([1, 2, 3, 4], dtype="int64"),
            "n": [5.0, None, 500.0, 50.0],
            "lang": ["en", "xx", "en", None],
            "code": ["A1", "A2", "bad!", "A4"],
        })
        out = validate_rows(
            ray.data.from_pandas(df),
            [
                {"name": "n_range", "col": "n", "kind": "range",
                 "lo": 0.0, "hi": 100.0},
                {"name": "lang_known", "col": "lang", "kind": "in_set",
                 "values": ["en", "de"]},
                {"name": "lang_set", "col": "lang", "kind": "not_null"},
                {"name": "code_fmt", "col": "code", "kind": "regex",
                 "pattern": r"[A-Z][0-9]"},
            ],
        ).to_pandas()
        got = set(zip(out["doc_id"], out["rule"]))
        assert got == {
            (2, "n_range"),        # null fails range
            (3, "n_range"),        # 500 out of range
            (2, "lang_known"),     # 'xx' not in set
            (4, "lang_known"),     # null fails in_set
            (4, "lang_set"),       # null fails not_null
            (3, "code_fmt"),       # 'bad!' no fullmatch
        }


class TestSnapshotDiff:
    def test_added_removed_changed(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import snapshot_diff

        old = pd.DataFrame(
            {"doc_id": [1, 2, 3, 4], "fp": ["a", "b", "c", "d"]}
        )
        new = pd.DataFrame(
            {"doc_id": [2, 3, 4, 9], "fp": ["b", "CHANGED", "d", "z"]}
        )
        out = (
            snapshot_diff(
                ray.data.from_pandas([old.iloc[:2], old.iloc[2:]]),
                ray.data.from_pandas(new),
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert list(out["doc_id"]) == [1, 3, 9]
        assert list(out["change"]) == ["removed", "changed", "added"]

    def test_identical_snapshots_empty(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import snapshot_diff

        df = pd.DataFrame({"doc_id": [1, 2], "fp": ["a", "b"]})
        out = snapshot_diff(
            ray.data.from_pandas(df), ray.data.from_pandas(df.copy())
        )
        assert out.count() == 0


def test_group_keyed_split_is_leakage_free(ray_session):
    import ray.data

    from pdf_parser_ray.ops.curation import assign_splits

    df = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype="int64"),
            "source": [f"host{i % 17}" for i in range(200)],
        }
    )
    out = assign_splits(
        ray.data.from_pandas([df.iloc[:90], df.iloc[90:]]), id_col="source"
    ).to_pandas()
    # every domain maps to exactly one split regardless of partitioning
    assert (out.groupby("source")["split"].nunique() == 1).all()
    assert set(out["split"]) <= {"train", "val", "test"}


class TestPseudonymize:
    def test_token_stable_and_keyed(self, ray_session):
        import hashlib

        import ray.data

        from pdf_parser_ray.ops.curation import pseudonymize

        df = pd.DataFrame({"user_id": [7, 7, 42]})
        out = (
            pseudonymize(ray.data.from_pandas(df), "user_id")
            .to_pandas()
            .sort_values("user_id")
        )
        exp7 = hashlib.md5(b"pepper:7").hexdigest()[:16]
        assert out["token"].tolist() == [exp7, exp7,
                                         hashlib.md5(b"pepper:42").hexdigest()[:16]]
        # a different pepper changes every token
        out2 = pseudonymize(
            ray.data.from_pandas(df), "user_id", pepper="other"
        ).to_pandas()
        assert set(out2["token"]) != set(out["token"])


class TestWinsorize:
    def test_clips_to_group_band(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import winsorize

        # group A: 1..20 (p05=1, p95=19 under the ceil(q*n) disc rule);
        # group B: constant
        df = pd.DataFrame(
            {
                "g": ["A"] * 20 + ["B"] * 4,
                "v": [float(x) for x in range(1, 21)] + [5.0] * 4,
            }
        )
        out = (
            winsorize(ray.data.from_pandas(df), "g", "v")
            .to_pandas()
            .sort_values(["g", "v"])
        )
        a = out[out["g"] == "A"]["v_w"]
        assert a.min() == 1.0 and a.max() == 19.0  # 20.0 clipped to 19
        assert (a == 19.0).sum() == 2
        b = out[out["g"] == "B"]["v_w"]
        assert (b == 5.0).all()


class TestTokenBudgetCap:
    def test_matches_pandas_window_cumsum(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import token_budget_cap

        rng = np.random.default_rng(11)
        n = 120
        df = pd.DataFrame(
            {
                "source": [f"s{i % 3}" for i in range(n)],
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [" ".join(["w"] * int(k)) for k in rng.integers(0, 9, n)],
            }
        )
        # tiny buckets force cross-bucket offset arithmetic
        out = (
            token_budget_cap(
                ray.data.from_pandas(df), budget=50, n_buckets=7
            )
            .to_pandas()
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )
        exp = df.assign(n_tok=df["text"].str.split().str.len().astype("int64"))
        exp = exp.sort_values(["source", "doc_id"])
        exp["cum_tokens"] = exp.groupby("source")["n_tok"].cumsum()
        exp = (
            exp[exp["cum_tokens"] <= 50][["source", "doc_id", "n_tok", "cum_tokens"]]
            .reset_index(drop=True)
            .astype({"n_tok": "int64", "cum_tokens": "int64"})
        )
        pd.testing.assert_frame_equal(out, exp)

    def test_budget_boundary_inclusive(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import token_budget_cap

        df = pd.DataFrame(
            {
                "source": ["a", "a", "a"],
                "doc_id": [0, 1, 2],
                "text": ["x y z", "p q", "r"],  # cum: 3, 5, 6
            }
        )
        out = token_budget_cap(
            ray.data.from_pandas(df), budget=5
        ).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1]  # cum==budget kept, next dropped


class TestDsirLogweights:
    def test_target_tokens_score_higher(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import dsir_logweights

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4, 5],
                "lang": ["en", "en", "en", "de", "de", "de"],
                "text": [
                    "alpha alpha beta", "alpha beta", "alpha alpha alpha",
                    "zeta eta", "zeta zeta", "eta eta eta",
                ],
            }
        )
        out = (
            dsir_logweights(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("doc_id")
        )
        # docs made of target-only vocabulary outweigh source-only ones
        assert out.loc[2, "logweight"] > out.loc[4, "logweight"]
        assert (out.loc[[0, 1, 2], "logweight"] > 0).all()
        assert (out.loc[[3, 4, 5], "logweight"] < 0).all()
        assert out.loc[0, "n_tokens"] == 3

    def test_zero_token_docs_drop(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import dsir_logweights

        df = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "lang": ["en", "en"],
                "text": ["hello world", "   "],
            }
        )
        out = dsir_logweights(ray.data.from_pandas(df)).to_pandas()
        assert out["doc_id"].tolist() == [0]


class TestKAnonymityAudit:
    def test_group_sizes_and_l_diversity(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.curation import k_anonymity_audit

        df = pd.DataFrame(
            {
                "lang": ["en"] * 3 + ["fr"] * 2,
                "source": ["a"] * 3 + ["b"] * 2,
                "text": ["t1", "t1", "t2", "u1", "u2"],
            }
        )
        out = (
            k_anonymity_audit(
                ray.data.from_pandas(df),
                quasi_cols=["lang", "source"],
                sensitive_col="text",
                k=3,
            )
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        en = out[out["lang"] == "en"].iloc[0]
        fr = out[out["lang"] == "fr"].iloc[0]
        assert (en["n_rows"], en["l_diversity"], en["k_anonymous"]) == (3, 2, True)
        assert (fr["n_rows"], fr["l_diversity"], fr["k_anonymous"]) == (2, 2, False)


class TestShardPlan:
    def test_sorted_first_fit_assignment(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import shard_plan

        # sizes 60,50,40,30,20,10 target 100:
        # exclusive cumsums 0,60,110,150,180,200 -> shards 0,0,1,1,1,2
        df = pd.DataFrame(
            {"doc_id": [0, 1, 2, 3, 4, 5],
             "n_chars": [60, 50, 40, 30, 20, 10]}
        )
        out = (
            shard_plan(ray.data.from_pandas(df), 100, n_buckets=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert out["shard"].tolist() == [0, 0, 1, 1, 1, 2]

    def test_partitioning_invariant(self, ray_session):
        # same plan regardless of block layout (the prefix sum is
        # global, not per-block)
        import ray.data

        from pdf_parser_ray.ops.curation import shard_plan

        df = pd.DataFrame(
            {"doc_id": np.arange(200), "n_chars": (np.arange(200) % 7 + 1) * 10}
        )
        a = (
            shard_plan(ray.data.from_pandas(df), 300, n_buckets=16)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            shard_plan(
                ray.data.from_pandas(df).repartition(13), 300, n_buckets=4
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        # exact serial twin
        excl = df["n_chars"].cumsum() - df["n_chars"]
        assert a["shard"].tolist() == (excl // 300).tolist()

    def test_summary_rollup(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import shard_plan, shard_plan_summary

        df = pd.DataFrame(
            {"doc_id": [0, 1, 2], "n_chars": [100, 100, 100]}
        )
        out = (
            shard_plan_summary(shard_plan(ray.data.from_pandas(df), 150))
            .to_pandas().sort_values("shard").reset_index(drop=True)
        )
        assert out["shard"].tolist() == [0, 1]
        assert out["n_docs"].tolist() == [2, 1]
        assert out["total_bytes"].tolist() == [200, 100]


class TestEpochRepeats:
    def test_exact_total_and_proportionality(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import epoch_repeats

        df = pd.DataFrame(
            {"doc_id": np.arange(100), "n_chars": (np.arange(100) % 9 + 1)}
        )
        out = (
            epoch_repeats(ray.data.from_pandas(df), 777, n_buckets=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert int(out["repeats"].sum()) == 777  # exact epoch size
        # systematic rule: repeats within floor/ceil of the ideal share
        ideal = df["n_chars"].to_numpy() * 777 / df["n_chars"].sum()
        assert (out["repeats"].to_numpy() >= np.floor(ideal) - 1).all()
        assert (out["repeats"].to_numpy() <= np.ceil(ideal) + 1).all()

    def test_bigint_path_matches_serial(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import epoch_repeats

        # W*T > 2^62 forces the python-int exact branch
        w = np.array([2**31, 2**32, 2**33, 2**31 + 7], dtype=np.int64)
        df = pd.DataFrame({"doc_id": [0, 1, 2, 3], "n_chars": w})
        T = 2**31
        out = (
            epoch_repeats(ray.data.from_pandas(df), T, n_buckets=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        cum = np.cumsum([int(x) for x in w])
        W = cum[-1]
        expect = [
            int(c) * T // W - int(c - x) * T // W
            for c, x in zip(cum, [int(x) for x in w])
        ]
        assert out["repeats"].tolist() == expect
        assert int(out["repeats"].sum()) == T

    def test_partitioning_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import epoch_repeats

        df = pd.DataFrame(
            {"doc_id": np.arange(60), "n_chars": (np.arange(60) * 13 % 50 + 1)}
        )
        a = (
            epoch_repeats(ray.data.from_pandas(df), 500, n_buckets=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            epoch_repeats(
                ray.data.from_pandas(df).repartition(9), 500, n_buckets=16
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestSpanCorruption:
    def test_sentinels_and_counts(self, ray_session):
        import hashlib

        import ray.data

        from pdf_parser_ray.ops.curation import span_corruption

        text = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": [7], "text": [text]})
        )
        out = span_corruption(ds, mask_ratio=0.4, emit_text=True).to_pandas()
        # serial twin of the positional gate
        T = int(0.4 * 2**32)
        mask = [
            int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:8], 16) < T
            for i in range(10)
        ]
        n_spans = sum(
            1 for i in range(10) if mask[i] and (i == 0 or not mask[i - 1])
        )
        assert out.loc[0, "n_words"] == 10
        assert out.loc[0, "n_masked"] == sum(mask)
        assert out.loc[0, "n_spans"] == n_spans
        # sentinel layout: masked runs collapse to numbered sentinels
        expect, k, prev = [], 0, False
        for i in range(10):
            if mask[i]:
                if not prev:
                    expect.append(f"<extra_id_{k}>")
                    k += 1
            else:
                expect.append(f"w{i}")
            prev = mask[i]
        assert out.loc[0, "corrupted"] == " ".join(expect)

    def test_mask_rate_close_to_ratio(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import span_corruption

        df = pd.DataFrame(
            {"doc_id": range(50), "text": [" ".join(["x"] * 100)] * 50}
        )
        out = span_corruption(
            ray.data.from_pandas(df), mask_ratio=0.15
        ).to_pandas()
        rate = out["n_masked"].sum() / out["n_words"].sum()
        assert 0.10 < rate < 0.20


class TestDpGroupCounts:
    def _events(self, n_keys=200, reps=3):
        rows = pd.DataFrame(
            {"user_id": [k for k in range(n_keys) for _ in range(reps)]}
        )
        return _docs_ds(rows)

    def test_exact_counts_and_determinism(self, ray_session):
        from pdf_parser_ray.ops.curation import dp_group_counts

        a = (
            dp_group_counts(self._events(), "user_id")
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        assert (a["n"] == 3).all()
        b = (
            dp_group_counts(self._events(), "user_id")
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)  # seeded noise: rerun-stable

    def test_noise_is_laplace_scaled(self, ray_session):
        from pdf_parser_ray.ops.curation import dp_group_counts

        out = dp_group_counts(
            self._events(n_keys=500), "user_id", epsilon=1.0
        ).to_pandas()
        noise = out["noisy_n"] - out["n"]
        # Laplace(0, 1/eps): E|X| = 1/eps; 500 draws -> loose band
        assert 0.6 < noise.abs().mean() < 1.6
        assert (noise > 0).mean() > 0.3 and (noise < 0).mean() > 0.3
        half = dp_group_counts(
            self._events(n_keys=500), "user_id", epsilon=2.0
        ).to_pandas()
        ratio = (half["noisy_n"] - half["n"]).abs().mean() / noise.abs().mean()
        # same uniforms -> scale halves (up to the 6dp output rounding)
        assert abs(ratio - 0.5) < 1e-6

    def test_salt_changes_noise_not_counts(self, ray_session):
        from pdf_parser_ray.ops.curation import dp_group_counts

        a = dp_group_counts(
            self._events(), "user_id", salt="a"
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        b = dp_group_counts(
            self._events(), "user_id", salt="b"
        ).to_pandas().sort_values("user_id").reset_index(drop=True)
        assert (a["n"] == b["n"]).all()
        assert (a["noisy_n"] != b["noisy_n"]).mean() > 0.99


class TestWaterfillCap:
    def _run(self, counts, budget):
        import ray.data

        from pdf_parser_ray.ops.curation import waterfill_cap

        rows = [
            (g, i) for g, n in counts.items() for i in range(n)
        ]
        df = pd.DataFrame(rows, columns=["g", "i"])
        return waterfill_cap(
            ray.data.from_pandas(df).repartition(4), "g", budget=budget
        ).set_index("g")

    def test_waterfill_level_exact(self, ray_session):
        # counts 10/20/100/200, budget 120: level c solves
        # 10+20+min(100,c)+min(200,c)=120 -> c=45, caps 10/20/45/45
        out = self._run({"a": 10, "b": 20, "c": 100, "d": 200}, 120)
        assert out["cap"].to_dict() == {"a": 10, "b": 20, "c": 45, "d": 45}
        assert (out["level"] == 45).all()
        assert (out["leftover"] == 0).all()

    def test_leftover_reported(self, ray_session):
        # budget 121 -> same level 45 (raising to 46 would need +2),
        # leftover 1
        out = self._run({"a": 10, "b": 20, "c": 100, "d": 200}, 121)
        assert (out["level"] == 45).all()
        assert (out["leftover"] == 1).all()

    def test_budget_exceeds_total(self, ray_session):
        out = self._run({"a": 5, "b": 7}, 100)
        assert out["cap"].to_dict() == {"a": 5, "b": 7}
        assert (out["leftover"] == 88).all()

    def test_fairness_vs_proportional(self, ray_session):
        # max-min: the small source is NEVER cut while a bigger one
        # keeps more (proportional capping would cut both)
        out = self._run({"small": 8, "huge": 992}, 500)
        assert out.loc["small", "cap"] == 8
        assert out.loc["huge", "cap"] == 492
