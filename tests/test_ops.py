"""Operator tests: dedup, text stats, similarity, windows — with numpy /
pandas oracles on deterministic inputs."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_df():
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),       # exact dup of 0
        (2, "The  Quick  Brown  Fox jumps over the lazy dog"),    # ws/case variant
        (3, "the quick brown fox jumps over the sleepy dog"),     # near-dup (1 word)
        (4, "completely different content about ray data engines"),
        (5, ""),
        (6, "short"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


class TestTextStats:
    def test_token_stats(self, docs_df):
        from pdf_parser_ray.ops.text_stats import token_stats_batch

        out = token_stats_batch(docs_df).set_index("doc_id")
        assert out.loc[0, "n_tokens"] == 9
        assert out.loc[5, "n_tokens"] == 0 and out.loc[5, "avg_token_len"] == 0.0
        assert out.loc[6, "n_chars"] == 5

    def test_fingerprint_normalizes_ws_and_case(self, docs_df):
        from pdf_parser_ray.ops.text_stats import fingerprint_batch

        out = fingerprint_batch(docs_df).set_index("doc_id")["fingerprint"]
        assert out[0] == out[1] == out[2]
        assert out[0] != out[3]

    def test_quality_flags(self, docs_df):
        from pdf_parser_ray.ops.text_stats import quality_batch

        out = quality_batch(docs_df).set_index("doc_id")
        assert bool(out.loc[0, "keep"]) is True
        assert bool(out.loc[5, "keep"]) is False
        assert bool(out.loc[6, "keep"]) is False

    def test_lang_id(self):
        from pdf_parser_ray.ops.text_stats import LangId

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "the cat is on the mat and it is happy",
                    "der hund ist nicht auf der matte und das ist gut",
                    "zzz qqq xxx",
                ],
            }
        )
        out = LangId()(df)
        assert list(out["lang_pred"]) == ["en", "de", "und"]

    def test_lang_id_accuracy_all_profiles(self):
        # accuracy fixture: 3 natural-ish sentences per supported
        # language, all classified correctly (15/15)
        from pdf_parser_ray.ops.text_stats import LangId

        samples = {
            "en": [
                "the dog is in the house and it was happy to be at home",
                "it is that time of the year for all of us to be on the road",
                "he sat by the fire with his book as the rain fell on the roof",
            ],
            "de": [
                "der mann ist mit dem hund auf der strasse und das ist gut",
                "eine frau und ein kind sind nicht zu hause geblieben",
                "die sonne ist für den garten und die blumen wichtig",
            ],
            "fr": [
                "le chien est dans la maison et les enfants sont dans le jardin",
                "une femme qui marche dans la rue pour acheter du pain",
                "il est dans les montagnes et pas au bord de la mer",
            ],
            "es": [
                "el perro esta en la casa y los ninos estan en el jardin",
                "una mujer camina por la calle para comprar pan con su madre",
                "es por eso que el campo es importante para los abuelos",
            ],
            "pt": [
                "o cachorro esta em casa e as criancas estao no jardim",
                "uma mulher caminha pela rua para comprar pao com a avo",
                "não é por isso que o campo é importante para um avô",
            ],
        }
        rows = [(lang, s) for lang, ss in samples.items() for s in ss]
        df = pd.DataFrame(
            {"doc_id": range(len(rows)), "text": [s for _, s in rows]}
        )
        out = LangId()(df)
        expected = [lang for lang, _ in rows]
        assert list(out["lang_pred"]) == expected

    def test_rolling_fp_deterministic_and_content_sensitive(self):
        from pdf_parser_ray.ops.text_stats import rolling_fingerprint_batch

        texts = ["same doc body here", "same doc body here", "other doc body here"]
        df = pd.DataFrame({"doc_id": [0, 1, 2], "text": texts})
        out = rolling_fingerprint_batch(df, window=8)
        assert out["rolling_fp"][0] == out["rolling_fp"][1]
        assert out["rolling_fp"][0] != out["rolling_fp"][2]

    def test_rolling_fp_matches_naive(self):
        from pdf_parser_ray.ops.text_stats import rolling_fingerprint_batch

        # Naive O(n*w) reference for the vectorized rolling hash.
        def naive(s: str, w: int) -> int:
            data = s.encode("utf-8")
            if not data:
                return 0
            w = min(w, len(data))
            B, M = 1000003, 1 << 64
            best = None
            for i in range(len(data) - w + 1):
                h = 0
                for b in data[i : i + w]:
                    h = (h * B + b) % M
                best = h if best is None else min(best, h)
            return best

        texts = ["hello world, rolling hashes!", "abc", "", "a" * 100]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = rolling_fingerprint_batch(df, window=16)
        for i, t in enumerate(texts):
            assert out["rolling_fp"][i] == naive(t, 16), repr(t)


class TestCharEntropy:
    def test_known_entropies(self, ray_session):
        from pdf_parser_ray.ops.text_stats import char_entropy

        rows = [
            (0, "aabb"),    # two symbols, uniform -> 1 bit
            (1, "abcd"),    # four symbols, uniform -> 2 bits
            (2, "aaaa"),    # one symbol -> 0
            (3, ""),        # empty -> (0, 0.0)
            (4, None),      # null -> (0, 0.0)
            (5, "aab"),     # -(2/3 lg 2/3 + 1/3 lg 1/3) = 0.918296
            (6, "éé"),  # non-ASCII counts as ONE symbol, not bytes
        ]
        import ray.data

        out = (
            char_entropy(
                ray.data.from_pandas(
                    pd.DataFrame(rows, columns=["doc_id", "text"])
                )
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out["n_chars"].tolist() == [4, 4, 4, 0, 0, 3, 2]
        assert out["entropy_bits"].tolist() == [
            1.0, 2.0, 0.0, 0.0, 0.0, 0.918296, 0.0,
        ]
        assert out["entropy_bits"].dtype == "float64"
        assert out["n_chars"].dtype == "int64"

    def test_matches_scalar_twin(self, ray_session):
        # independent per-row Counter implementation on random-ish text
        import collections
        import math

        import ray.data

        from pdf_parser_ray.ops.text_stats import char_entropy

        texts = [
            "the quick brown fox",
            "zzzzzzzz yyy x",
            "a" * 100 + "b",
            "mixed CASE And 123 !!!",
        ]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = (
            char_entropy(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        for i, t in enumerate(texts):
            c = collections.Counter(t)
            n = len(t)
            exp = -sum(v / n * math.log2(v / n) for v in c.values())
            assert out.loc[i, "entropy_bits"] == round(exp, 6) + 0.0
            assert out.loc[i, "n_chars"] == n


class TestCompressionRatio:
    def test_ordering_and_edges(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import compression_ratio

        prose = (
            "the quick brown fox jumps over the lazy dog while birds "
            "watch from above in warm evening light near the old gate"
        )
        rows = [
            (0, "spam " * 60),        # highly repetitive -> smallest ratio
            (1, prose),               # typical prose -> middle
            (2, "kq9x7z2m4w8v1c3n" * 2),  # near-random -> largest ratio
            (3, ""),                  # empty -> (0, ratio 0.0)
            (4, None),                # null == empty
        ]
        out = (
            compression_ratio(
                ray.data.from_pandas(
                    pd.DataFrame(rows, columns=["doc_id", "text"])
                )
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "ratio"] < out.loc[1, "ratio"] < out.loc[2, "ratio"]
        assert out.loc[3, "raw_bytes"] == 0 and out.loc[3, "ratio"] == 0.0
        assert out.loc[4, "raw_bytes"] == 0 and out.loc[4, "ratio"] == 0.0
        assert out.loc[1, "raw_bytes"] == len(prose.encode())
        # deterministic across runs
        again = (
            compression_ratio(
                ray.data.from_pandas(
                    pd.DataFrame(rows, columns=["doc_id", "text"])
                )
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        pd.testing.assert_frame_equal(out, again)


class TestDedup:
    def test_exact_dedup(self, docs_df, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import exact_dedup

        ds = ray.data.from_pandas(docs_df)
        out = exact_dedup(ds).to_pandas()
        # docs 0,1,2 share a hash → min doc_id 0 survives
        assert len(out) == 5
        surviving = set(out["doc_id"])
        assert 0 in surviving and 1 not in surviving and 2 not in surviving

    def test_ngram_jaccard(self):
        from pdf_parser_ray.ops.dedup import ngram_jaccard

        assert ngram_jaccard("a b c d", "a b c d") == 1.0
        assert ngram_jaccard("a b c d", "x y z w") == 0.0
        assert 0.0 < ngram_jaccard("a b c d e", "a b c d x") < 1.0
        assert ngram_jaccard("", "") == 1.0

    def test_minhash_estimates_jaccard(self):
        from pdf_parser_ray.ops.dedup import MinHasher, ngram_jaccard

        mh = MinHasher(num_perm=256)
        a = "the quick brown fox jumps over the lazy dog again and again today"
        b = "the quick brown fox jumps over the sleepy dog again and again today"
        est = (mh.signature(a) == mh.signature(b)).mean()
        true = ngram_jaccard(a, b)
        assert abs(est - true) < 0.2

    def test_batched_minhash_matches_per_doc_signature(self, docs_df):
        # __call__'s reduceat batching must equal the per-doc reference
        from pdf_parser_ray.ops.dedup import MinHasher

        mh = MinHasher(num_perm=64)
        out = mh(docs_df)
        for doc_id, sig_bytes in zip(out["doc_id"], out["sig"]):
            expected = mh.signature(
                docs_df.set_index("doc_id").loc[doc_id, "text"]
            ).astype(np.uint32)
            assert np.frombuffer(sig_bytes, dtype=np.uint32).tolist() == expected.tolist()

    def test_batched_simhash_matches_per_doc(self, docs_df):
        from pdf_parser_ray.ops.dedup import SimHasher

        sh = SimHasher()
        out = sh(docs_df)
        for doc_id, sig in zip(out["doc_id"], out["simhash"]):
            expected = sh.simhash(docs_df.set_index("doc_id").loc[doc_id, "text"])
            assert int(np.uint64(np.int64(sig))) == expected

    def test_simhash_ngram_changes_signature(self, docs_df):
        """ngram must actually change tokenization (regression: the
        parameter was stored but never read — ngram=2 silently produced
        ngram=1 signatures)."""
        from pdf_parser_ray.ops.dedup import SimHasher

        text = "the quick brown fox jumps over the lazy dog"
        uni, bi = SimHasher(ngram=1), SimHasher(ngram=2)
        assert uni.simhash(text) != bi.simhash(text)
        # batched path honors ngram too, and matches per-doc
        df = pd.DataFrame({"doc_id": [0], "text": [text]})
        assert int(np.uint64(np.int64(bi(df)["simhash"].iloc[0]))) == bi.simhash(text)

    def test_minhash_lsh_pairs(self, docs_df, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import minhash_lsh_pairs

        ds = ray.data.from_pandas(docs_df)
        pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
        got = {(int(a), int(b)) for a, b in zip(pairs["a"], pairs["b"])}
        assert (0, 1) in got  # exact dup must be found
        assert all(a < b for a, b in got)

    def test_minhash_payload_modes_agree(self, ray_session, tmp_path):
        """payload='join' (bare-id bands + sig join-back) must emit
        exactly the same verified pairs as payload='sig'."""
        import ray.data

        from pdf_parser_ray.ops.dedup import minhash_lsh_pairs

        rows = []
        for i in range(40):
            base = f"document number {i} " + " ".join(
                f"w{(i * 7 + k) % 23}" for k in range(30)
            )
            rows.append({"doc_id": 2 * i, "text": base})
            # near-dup partner: one token changed
            rows.append({"doc_id": 2 * i + 1, "text": base + " tail"})
        df = pd.DataFrame(rows)

        def canon(p):
            return (
                p.sort_values(["a", "b"]).reset_index(drop=True)
                [["a", "b", "est_jaccard"]]
            )

        sig = canon(
            minhash_lsh_pairs(ray.data.from_pandas(df), threshold=0.5).to_pandas()
        )
        join = canon(
            minhash_lsh_pairs(
                ray.data.from_pandas(df), threshold=0.5, payload="join"
            ).to_pandas()
        )
        assert len(sig) >= 40  # every planted pair found
        pd.testing.assert_frame_equal(sig, join)
        # the cached-parquet staging path is identical too
        join_cached = canon(
            minhash_lsh_pairs(
                ray.data.from_pandas(df), threshold=0.5, payload="join",
                sig_cache_path=str(tmp_path / "sigs"),
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(sig, join_cached)

    def test_simhash_groups(self, docs_df, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import simhash_groups

        ds = ray.data.from_pandas(docs_df)
        out = simhash_groups(ds).to_pandas()
        # docs 0 and 1 are identical → one group with n_docs >= 2
        assert (out["n_docs"] >= 2).all()
        assert 0 in set(out["min_doc_id"])


class TestSimilarity:
    def test_knn_matches_numpy(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import knn_brute_force

        rng = np.random.RandomState(0)
        mat = rng.standard_normal((200, 16))
        df = pd.DataFrame({"vec_id": range(200), "embedding": list(mat)})
        q = mat[0]
        out = knn_brute_force(
            ray.data.from_pandas(df), q, k=5, exclude_vec_id=0
        ).to_pandas()

        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        order = np.argsort(-sims)
        expected = [i for i in order if i != 0][:5]
        assert list(out["vec_id"]) == expected
        np.testing.assert_allclose(out["cosine"], sims[expected], rtol=1e-12)

    def test_ivf_knn_self_and_recall(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import ivf_knn, knn_brute_force

        rng = np.random.RandomState(3)
        mat = rng.standard_normal((400, 16))
        df = pd.DataFrame({"vec_id": range(400), "embedding": list(mat)})
        ds = ray.data.from_pandas(df)
        out = ivf_knn(ds, mat[11], k=5, n_lists=8, n_probe=3).to_pandas()
        # the query vector is in the corpus and must survive pruning
        assert out["vec_id"].iloc[0] == 11
        assert abs(out["cosine"].iloc[0] - 1.0) < 1e-9
        # full probe degenerates to exact brute force
        full = ivf_knn(ds, mat[11], k=5, n_lists=8, n_probe=8).to_pandas()
        exact = knn_brute_force(ds, mat[11], k=5).to_pandas()
        assert list(full["vec_id"]) == list(exact["vec_id"])

    def test_lsh_knn_self_bucket(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import lsh_knn

        rng = np.random.RandomState(1)
        mat = rng.standard_normal((300, 16))
        df = pd.DataFrame({"vec_id": range(300), "embedding": list(mat)})
        out = lsh_knn(ray.data.from_pandas(df), mat[7], k=3).to_pandas()
        # the query vector itself is in the corpus → must be its own NN
        assert out["vec_id"].iloc[0] == 7
        assert abs(out["cosine"].iloc[0] - 1.0) < 1e-9


class TestWindows:
    def test_running_window(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import running_window

        ts = pd.to_datetime(
            ["2025-01-01 00:10", "2025-01-01 00:05", "2025-01-01 00:20"]
        )
        df = pd.DataFrame(
            {"event_id": [1, 2, 3], "ts": ts, "user_id": [7, 7, 7],
             "value": [1.5, 2.0, 3.0]}
        )
        out = (
            running_window(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        # ordered by ts: event 2 (00:05) first, then 1, then 3
        assert list(out["event_id"]) == [2, 1, 3]
        assert list(out["rn"]) == [1, 2, 3]
        assert list(out["cum_value"]) == [2.0, 3.5, 6.5]

    def test_event_type_pivot(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import event_type_pivot

        df = pd.DataFrame(
            {"user_id": [1, 1, 1, 2], "event_type": ["click", "click", "view", "error"]}
        )
        out = (
            event_type_pivot(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("user_id")
        )
        assert out.loc[1, "n_click"] == 2 and out.loc[1, "n_view"] == 1
        assert out.loc[2, "n_error"] == 1 and out.loc[2, "n_click"] == 0
        assert out.loc[1, "n_purchase"] == 0

    def test_tumbling_counts(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import tumbling_counts

        ts = pd.to_datetime(
            ["2025-01-01 00:10", "2025-01-01 00:50", "2025-01-01 01:10"]
        )
        df = pd.DataFrame({"ts": ts, "event_type": ["a", "a", "a"], "value": [1.0, 2.0, 4.0]})
        out = tumbling_counts(ray.data.from_pandas(df)).to_pandas()
        out = out.sort_values("window_start").reset_index(drop=True)
        assert list(out["n_events"]) == [2, 1]
        assert list(out["sum_value"]) == [3.0, 4.0]

    def test_sessionize(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import sessionize

        ts = pd.to_datetime(
            ["2025-01-01 00:00", "2025-01-01 00:10", "2025-01-01 02:00",
             "2025-01-01 00:00"]
        )
        df = pd.DataFrame(
            {"event_id": [1, 2, 3, 4], "ts": ts, "user_id": [7, 7, 7, 8]}
        )
        out = sessionize(ray.data.from_pandas(df), gap_seconds=1800).to_pandas()
        out = out.set_index("user_id")
        assert out.loc[7, "n_sessions"] == 2 and out.loc[7, "n_events"] == 3
        assert out.loc[8, "n_sessions"] == 1

    def _power_user_events(self):
        """One planted power user (80% of all rows, spanning weeks) plus
        a normal population — the skew shape that turns a single-key
        co-location partition into the stage straggler."""
        rng = np.random.RandomState(13)
        n_hot, n_cold = 4000, 1000
        base = pd.Timestamp("2025-01-01").value // 1000  # us
        hot_ts = base + np.sort(rng.randint(0, 45 * 86400, n_hot)) * 1_000_000
        cold_ts = base + rng.randint(0, 45 * 86400, n_cold) * 1_000_000
        return pd.DataFrame(
            {
                "event_id": np.arange(n_hot + n_cold, dtype=np.int64),
                "user_id": np.concatenate(
                    [np.full(n_hot, 999, dtype=np.int64),
                     rng.randint(0, 50, n_cold)]
                ),
                "ts": pd.to_datetime(
                    np.concatenate([hot_ts, cold_ts]), unit="us"
                ),
                "value": np.round(rng.uniform(0, 100, n_hot + n_cold), 2),
            }
        )

    def test_sessionize_salted_parity(self, ray_session):
        """The auto-salting path (time-bucketed two-phase) must be
        value-identical to the single-pass plan on a planted power
        user, with per-partition rows bounded by the bucket width
        (VERDICT r2 #8)."""
        import ray.data

        from pdf_parser_ray.ops.windows import sessionize

        df = self._power_user_events()
        ds = ray.data.from_pandas(df)
        plain = (
            sessionize(ds, gap_seconds=1800, salt="off")
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        salted = (
            sessionize(
                ds, gap_seconds=1800, salt="auto", salt_threshold=1000,
                salt_bucket_seconds=86400,
            )
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(plain, salted)
        # the detector must actually have fired (hot user > threshold)
        from pdf_parser_ray.ops.shuffle import detect_hot_keys

        assert detect_hot_keys(ds, "user_id", threshold=1000) == [999]

    def test_misra_gries_shed_bounds_undercount(self):
        """MG.shed is the exact total decremented mass: for every value
        true_count ∈ [est, est + shed] — across merges too."""
        from pdf_parser_ray.ops.sketches import MisraGries

        rng = np.random.RandomState(5)
        true = {}
        sketches = []
        for _ in range(20):
            mg = MisraGries(8)
            vals = list(rng.randint(0, 300, 120)) + ["hot"] * 3
            vc = pd.Series(vals).value_counts().to_dict()
            for v, n in vc.items():
                true[v] = true.get(v, 0) + n
            mg.add_counts(vc)
            sketches.append(mg)
        merged = sketches[0]
        for s in sketches[1:]:
            merged = merged.merge(s)
        assert merged.shed > 0  # capacity genuinely overflowed
        for v, n in true.items():
            est = merged.counts.get(v, 0)
            assert est <= n <= est + merged.shed, (v, est, n, merged.shed)

    def test_detect_hot_keys_is_miss_proof_under_shed(self, ray_session):
        """Advisor r3: once N exceeds ~threshold×capacity, a genuinely
        hot key's MG estimate can dip below an absolute threshold and
        the unsalted plan silently wins — at exactly the scale salting
        exists for.  The candidate gate (est + shed ≥ threshold) must
        keep the hot key in the answer even with a starved capacity."""
        import ray.data

        from pdf_parser_ray.ops.shuffle import detect_hot_keys

        rng = np.random.RandomState(9)
        # 25 blocks; in each, the hot key appears 3× among ~120 mostly-
        # distinct cold keys → per-block MG (capacity 8) sheds mass off
        # the hot counter every block.  true(hot)=75 ≥ threshold 60,
        # but the merged estimate lands well under 60.
        frames = []
        for b in range(25):
            cold = rng.randint(1000, 1_000_000, 120)
            keys = np.concatenate([cold, np.full(3, 7, dtype=np.int64)])
            frames.append(pd.DataFrame({"user_id": keys}))
        ds = ray.data.from_pandas(frames)
        hot = detect_hot_keys(ds, "user_id", threshold=60, capacity=8)
        assert 7 in hot  # would be silently missed by the est-only gate

    def test_running_window_salted_parity(self, ray_session):
        """Distributed-prefix-sum route == single-pass route on the
        planted power user (VERDICT r2 #8)."""
        import ray.data

        from pdf_parser_ray.ops.windows import running_window

        df = self._power_user_events()
        ds = ray.data.from_pandas(df)
        key = ["user_id", "rn"]
        plain = (
            running_window(ds, salt="off")
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        salted = (
            running_window(
                ds, salt="force", salt_bucket_seconds=86400,
            )
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(plain, salted)


class TestSimhashNearPairs:
    def test_planted_near_pair(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import SimHasher, simhash_near_pairs

        base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliet kilo lima mike november oscar papa quebec romeo")
        near = base.replace("quebec", "quibec")  # one token changed
        far = "entirely unrelated words about streams shuffles and actors"
        df = pd.DataFrame(
            {"doc_id": [0, 1, 2, 3], "text": [base, base, near, far]}
        )
        sh = SimHasher()
        ham_near = bin(sh.simhash(base) ^ sh.simhash(near)).count("1")
        out = simhash_near_pairs(
            ray.data.from_pandas(df), max_hamming=max(3, ham_near)
        ).to_pandas()
        got = {(int(a), int(b)): int(h)
               for a, b, h in zip(out["a"], out["b"], out["hamming"])}
        assert got[(0, 1)] == 0                      # identical docs
        assert (0, 2) in got and got[(0, 2)] == ham_near
        assert all(b != 3 and a != 3 for a, b in got)  # far doc pairs with no one

    def test_pigeonhole_recall_is_exact(self, ray_session):
        """Every pair within max_hamming=3 of each other MUST be found
        (recall 1.0 by the band pigeonhole, not probabilistically)."""
        import itertools

        import ray.data

        from pdf_parser_ray.ops.dedup import SimHasher, simhash_near_pairs

        rng = np.random.RandomState(7)
        words = ["w%d" % i for i in range(50)]
        texts = [" ".join(rng.choice(words, size=12)) for _ in range(20)]
        texts += texts[:10]  # exact copies → guaranteed hamming-0 pairs
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        sh = SimHasher()
        sigs = [sh.simhash(t) for t in texts]
        expected = {
            (i, j)
            for i, j in itertools.combinations(range(len(texts)), 2)
            if bin(sigs[i] ^ sigs[j]).count("1") <= 3
        }
        assert len(expected) >= 10
        out = simhash_near_pairs(ray.data.from_pandas(df), max_hamming=3).to_pandas()
        got = (
            {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
            if len(out)
            else set()
        )
        assert got == expected


class TestEmbeddingDupRoutes:
    @pytest.fixture(scope="class")
    def near_dup_vectors(self):
        rng = np.random.RandomState(11)
        base = rng.standard_normal((60, 32))
        rows = [(i, base[i]) for i in range(60)]
        # plant 12 near-dups: copy of base[i] + tiny noise (cosine ≈ 0.999)
        for k in range(12):
            rows.append((100 + k, base[k] + 0.01 * rng.standard_normal(32)))
        return pd.DataFrame(
            {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}
        )

    def test_exact_and_lsh_routes_agree(self, near_dup_vectors, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import embedding_dup_pairs

        ds = ray.data.from_pandas(near_dup_vectors)
        exact = embedding_dup_pairs(ds, threshold=0.95, mode="exact").to_pandas()
        lsh = embedding_dup_pairs(ds, threshold=0.95, mode="lsh").to_pandas()
        key = lambda df: sorted(
            (int(a), int(b), float(c))
            for a, b, c in zip(df["a"], df["b"], df["cosine"])
        )
        assert len(exact) >= 12           # all planted pairs found
        assert key(exact) == key(lsh)     # bucket route == broadcast route

    def test_auto_mode_picks_exact_below_threshold(self, near_dup_vectors, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import embedding_dup_pairs

        ds = ray.data.from_pandas(near_dup_vectors)
        auto = embedding_dup_pairs(ds, threshold=0.95).to_pandas()
        exact = embedding_dup_pairs(ds, threshold=0.95, mode="exact").to_pandas()
        assert len(auto) == len(exact)

    def test_rows_estimate_unknown_for_row_expanding_ops(
        self, ray_session, tmp_path
    ):
        """Advisor r3: a row-expanding op (flat_map / arbitrary
        map_batches) upstream makes the parquet-footer sum an
        UNDERestimate, which could route an oversized dataset into the
        O(n²) exact path — the walk must return None (unknown → safe
        'lsh' route) instead.  Filters/projections stay estimable."""
        import ray.data

        from pdf_parser_ray.ops.dedup import _rows_estimate_no_exec

        path = str(tmp_path / "est.parquet")
        pd.DataFrame({"x": range(100)}).to_parquet(path)
        ds = ray.data.read_parquet(path)
        assert _rows_estimate_no_exec(ds) == 100
        # row-preserving/reducing ops keep the (upper-bound) estimate
        assert _rows_estimate_no_exec(ds.select_columns(["x"])) == 100
        assert _rows_estimate_no_exec(ds.filter(expr="x < 10")) == 100
        assert _rows_estimate_no_exec(ds.limit(7)) == 7  # exact via meta
        # row-EXPANDING ops → unknown
        assert _rows_estimate_no_exec(
            ds.flat_map(lambda r: [r, r])
        ) is None
        assert _rows_estimate_no_exec(
            ds.map_batches(lambda b: b)
        ) is None

    def test_auto_route_does_not_execute_plan(
        self, near_dup_vectors, ray_session, tmp_path
    ):
        """mode="auto" must pick its route WITHOUT executing the
        upstream plan (regression: a ds.count() probe ran the pipeline
        once just to choose, then the chosen route ran it again).  An
        upstream stage counts its invocations via marker files; auto
        must cost exactly as many stage calls as the explicit route.
        The upstream map_batches makes the row count UNKNOWN (advisor
        r3: it could expand rows), so bare auto takes the safe lsh
        route; auto with an explicit n_rows hint takes exact."""
        import os
        import uuid

        import ray.data

        from pdf_parser_ray.ops.dedup import embedding_dup_pairs

        def run(marker_dir, **kwargs):
            os.makedirs(marker_dir, exist_ok=True)

            def counting(df: pd.DataFrame) -> pd.DataFrame:
                open(os.path.join(marker_dir, uuid.uuid4().hex), "w").close()
                return df

            ds = ray.data.from_pandas(near_dup_vectors).map_batches(
                counting, batch_format="pandas"
            )
            embedding_dup_pairs(ds, threshold=0.95, **kwargs).to_pandas()
            return len(os.listdir(marker_dir))

        calls_lsh = run(str(tmp_path / "lsh"), mode="lsh")
        calls_auto = run(str(tmp_path / "auto"), mode="auto")
        assert calls_auto == calls_lsh
        calls_exact = run(str(tmp_path / "exact"), mode="exact")
        calls_auto_known = run(
            str(tmp_path / "auto_known"), mode="auto",
            n_rows=len(near_dup_vectors),
        )
        assert calls_auto_known == calls_exact

    def test_exact_route_chunks(self, near_dup_vectors, ray_session):
        """Chunked staging (chunk_rows < N) must not change results."""
        import ray.data

        from pdf_parser_ray.ops.dedup import embedding_dup_pairs

        ds = ray.data.from_pandas(near_dup_vectors)
        one = embedding_dup_pairs(ds, threshold=0.95, mode="exact").to_pandas()
        many = embedding_dup_pairs(
            ds, threshold=0.95, mode="exact", chunk_rows=16
        ).to_pandas()
        key = lambda df: sorted(
            (int(a), int(b), float(c))
            for a, b, c in zip(df["a"], df["b"], df["cosine"])
        )
        assert key(one) == key(many)

    def test_embedding_dup_pairs_empty_input(self, ray_session):
        """0-row datasets must yield 0 pairs, not np.vstack/pd.concat
        ValueError (regression: missing empty guards in both routes)."""
        import ray.data

        from pdf_parser_ray.ops.dedup import embedding_dup_pairs

        empty = ray.data.from_pandas(
            pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                          "embedding": pd.Series([], dtype="object")})
        )
        for mode in ("exact", "lsh"):
            out = embedding_dup_pairs(empty, mode=mode).to_pandas()
            assert len(out) == 0


class TestAsofJoin:
    def test_backward_asof_matches_pandas(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.relational import asof_join_backward

        ts = pd.to_datetime(
            ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 12:00",
             "2024-01-01 10:30", "2024-01-01 09:00"]
        )
        left = pd.DataFrame(
            {"event_id": [1, 2, 3, 4, 5],
             "user_id": [7, 7, 7, 8, 8],
             "ts": ts}
        )
        right = pd.DataFrame(
            {"user_id": [7, 7, 8],
             "ts": pd.to_datetime(
                 ["2024-01-01 10:00", "2024-01-01 11:30", "2024-01-01 10:30"])}
        )
        out = asof_join_backward(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            by="user_id", on="ts", out_col="prev_ts",
        ).to_pandas().set_index("event_id").sort_index()
        # user 7: 10:00 -> 10:00 (ties match), 11:00 -> 10:00, 12:00 -> 11:30
        assert out.loc[1, "prev_ts"] == pd.Timestamp("2024-01-01 10:00")
        assert out.loc[2, "prev_ts"] == pd.Timestamp("2024-01-01 10:00")
        assert out.loc[3, "prev_ts"] == pd.Timestamp("2024-01-01 11:30")
        # user 8: 10:30 -> 10:30; 09:00 -> no prior view -> NaT
        assert out.loc[4, "prev_ts"] == pd.Timestamp("2024-01-01 10:30")
        assert pd.isna(out.loc[5, "prev_ts"])

    def test_backward_asof_int_on_with_misses(self, ray_session):
        """Integer `on` columns with no-prior-row misses must yield null,
        not raise IntCastingNaNError (regression: pd.NA assignment
        upcast int64→float64, then .astype(int64) raised)."""
        import ray.data

        from pdf_parser_ray.ops.relational import asof_join_backward

        left = pd.DataFrame(
            {"event_id": [1, 2, 3], "u": [7, 7, 9], "seq": [5, 50, 3]}
        )
        right = pd.DataFrame({"u": [7, 8], "seq": [10, 1]})
        out = (
            asof_join_backward(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                by="u", on="seq", out_col="prev_seq",
            )
            .to_pandas().set_index("event_id").sort_index()
        )
        assert pd.isna(out.loc[1, "prev_seq"])  # 5 < all right seqs for u=7
        assert out.loc[2, "prev_seq"] == 10
        assert pd.isna(out.loc[3, "prev_seq"])  # u=9 has no right rows

    def test_backward_asof_null_left_ts(self, ray_session):
        """A left row with a null `on` must yield null, not the max
        right value (regression: searchsorted places NaT last)."""
        import ray.data

        from pdf_parser_ray.ops.relational import asof_join_backward

        left = pd.DataFrame(
            {
                "event_id": [1, 2],
                "u": [7, 7],
                "ts": pd.to_datetime(["2024-01-02", None]),
            }
        )
        right = pd.DataFrame(
            {"u": [7, 7], "ts": pd.to_datetime(["2024-01-01", "2024-03-01"])}
        )
        out = (
            asof_join_backward(
                ray.data.from_pandas(left), ray.data.from_pandas(right),
                by="u", on="ts", out_col="prev",
            )
            .to_pandas().set_index("event_id").sort_index()
        )
        assert out.loc[1, "prev"] == pd.Timestamp("2024-01-01")
        assert pd.isna(out.loc[2, "prev"])  # null ts ⋈ anything = null

    def test_left_int_dtypes_survive_union_upcast(self, ray_session):
        """Round-2 driver failure: the tag-union block carries typed int
        nulls for right-side rows, the grouped_map pandas handoff
        upcasts those columns to float64, and the merge output shipped
        `event_id: double` while the oracle said int64.  Every left
        int/bool column (and an int `on`'s out_col) must come back in
        the left side's Arrow type."""
        import pyarrow as pa

        import ray.data
        from pdf_parser_ray.ops.relational import (
            asof_join_backward,
            interval_count_join,
        )

        left = pd.DataFrame(
            {
                "event_id": pd.array([1, 2, 3], dtype="int64"),
                "small": pd.array([10, 20, 30], dtype="int32"),
                "flag": [True, False, True],
                "u": [7, 7, 8],
                "ts": pd.to_datetime(
                    ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 10:30"]
                ),
            }
        )
        right = pd.DataFrame(
            {"u": [7, 8], "ts": pd.to_datetime(["2024-01-01 09:00"] * 2)}
        )

        def arrow_types(ds):
            # the driver hashes the Arrow form of the result — check that,
            # not the intermediate pandas block schema
            t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
            return dict(zip(t.schema.names, t.schema.types))

        asof = asof_join_backward(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            by="u", on="ts", out_col="prev_ts",
        )
        types = arrow_types(asof)
        assert types["event_id"] == pa.int64()
        assert types["small"] == pa.int32()
        assert pa.types.is_boolean(types["flag"])

        rng = interval_count_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            by="u", on="ts", lower_s=7200, upper_s=0, out_col="n",
        )
        types = arrow_types(rng)
        assert types["event_id"] == pa.int64()
        assert types["small"] == pa.int32()
        assert types["n"] == pa.int64()

        # int `on`: out_col must be int-typed even with misses present
        ileft = pd.DataFrame({"event_id": [1, 2], "u": [7, 9], "seq": [50, 3]})
        iright = pd.DataFrame({"u": [7], "seq": [10]})
        iasof = asof_join_backward(
            ray.data.from_pandas(ileft), ray.data.from_pandas(iright),
            by="u", on="seq", out_col="prev_seq",
        )
        assert pa.types.is_integer(arrow_types(iasof)["prev_seq"])


class TestQuantiles:
    def test_exact_vs_numpy(self, ray_session):
        import math

        import ray.data

        from pdf_parser_ray.ops.quantiles import grouped_quantile_disc

        rng = np.random.RandomState(9)
        df = pd.DataFrame(
            {
                "g": np.repeat(["a", "b", "c"], 400),
                "v": rng.standard_normal(1200) * 10,
            }
        )
        out = grouped_quantile_disc(
            ray.data.from_pandas(df), "g", "v", {"p50": 0.5, "p90": 0.9}
        ).set_index("g")
        for g in ["a", "b", "c"]:
            v = np.sort(df[df["g"] == g]["v"].to_numpy())
            n = len(v)
            assert out.loc[g, "p50"] == v[math.ceil(0.5 * n) - 1]
            assert out.loc[g, "p90"] == v[math.ceil(0.9 * n) - 1]

    def test_degenerate_constant_group(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.quantiles import grouped_quantile_disc

        df = pd.DataFrame({"g": ["x"] * 50, "v": [3.25] * 50})
        out = grouped_quantile_disc(ray.data.from_pandas(df), "g", "v", {"p50": 0.5})
        assert out["p50"].iloc[0] == 3.25

    def test_null_values_excluded(self, ray_session):
        """Nulls must be excluded from every pass (regression: the
        histogram pass binned NaN rows into bin 0, desynchronizing
        cumulative counts from the null-excluding n of pass 1), and an
        all-null group yields NULL like DuckDB's quantile_disc."""
        import math

        import ray.data

        from pdf_parser_ray.ops.quantiles import grouped_quantile_disc

        rng = np.random.RandomState(4)
        v = rng.standard_normal(300)
        v[::3] = np.nan  # a third of group 'a' is null
        df = pd.DataFrame(
            {
                "g": ["a"] * 300 + ["z"] * 5,
                "v": np.concatenate([v, [np.nan] * 5]),
            }
        )
        out = grouped_quantile_disc(
            ray.data.from_pandas(df), "g", "v", {"p50": 0.5, "p90": 0.9}
        ).set_index("g")
        clean = np.sort(df[df["g"] == "a"]["v"].dropna().to_numpy())
        n = len(clean)
        assert out.loc["a", "p50"] == clean[math.ceil(0.5 * n) - 1]
        assert out.loc["a", "p90"] == clean[math.ceil(0.9 * n) - 1]
        assert pd.isna(out.loc["z", "p50"]) and pd.isna(out.loc["z", "p90"])


class TestWordCountsAndCentroids:
    def test_word_counts(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import word_counts

        df = pd.DataFrame(
            {"doc_id": [0, 1], "text": ["a b a", "A  b\tc"]}
        )
        out = word_counts(ray.data.from_pandas(df)).to_pandas().set_index("token")
        assert out.loc["a", "n"] == 3 and out.loc["b", "n"] == 2 and out.loc["c", "n"] == 1

    def test_centroids_match_numpy(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import embedding_centroids

        rng = np.random.RandomState(2)
        mat = rng.standard_normal((40, 8))
        df = pd.DataFrame({"grp": [i % 3 for i in range(40)], "embedding": list(mat)})
        out = embedding_centroids(ray.data.from_pandas(df)).to_pandas()
        for g in range(3):
            expect = np.round(mat[np.arange(40) % 3 == g].mean(axis=0), 6)
            got = out[out["grp"] == g].sort_values("dim")["centroid"].to_numpy()
            assert np.array_equal(got, expect)


class TestConnectedComponents:
    @pytest.mark.parametrize("mode", ["local", "shuffle"])
    def test_chain_needs_multiple_rounds(self, mode, ray_session):
        """A path graph 9-8-7-...-0 has diameter 9: exercises the
        iterative propagation, not just the one-hop case."""
        import ray.data

        from pdf_parser_ray.ops.dedup import connected_components

        edges = pd.DataFrame({"a": list(range(9)), "b": list(range(1, 10))})
        out = (
            connected_components(ray.data.from_pandas(edges), mode=mode)
            .to_pandas()
            .sort_values("node")
        )
        assert out["node"].tolist() == list(range(10))
        assert (out["component"] == 0).all()

    @pytest.mark.parametrize("mode", ["local", "shuffle"])
    def test_two_components_and_isolated_edge(self, mode, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import connected_components

        edges = pd.DataFrame({"a": [5, 6, 20], "b": [6, 7, 21]})
        out = (
            connected_components(ray.data.from_pandas(edges), mode=mode)
            .to_pandas()
            .set_index("node")["component"]
        )
        assert out.loc[5] == 5 and out.loc[6] == 5 and out.loc[7] == 5
        assert out.loc[20] == 20 and out.loc[21] == 20

    @pytest.mark.parametrize("mode", ["local", "shuffle"])
    def test_empty_edge_set(self, mode, ray_session):
        """A clean corpus (zero near-dup pairs) must yield an empty
        component map in both routes (regression: the shuffle route's
        aggregate returned None and int(None['s']) raised)."""
        import ray.data

        from pdf_parser_ray.ops.dedup import connected_components

        edges = pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
        )
        out = connected_components(
            ray.data.from_pandas(edges), mode=mode
        ).to_pandas()
        assert len(out) == 0

    def test_shuffle_raises_on_non_convergence(self, ray_session):
        """A diameter-9 chain can't converge in 3 min-label rounds —
        the shuffle route must raise rather than silently return split
        components (regression: non-convergence was silent)."""
        import ray.data

        from pdf_parser_ray.ops.dedup import connected_components

        edges = pd.DataFrame({"a": list(range(9)), "b": list(range(1, 10))})
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                ray.data.from_pandas(edges), mode="shuffle", max_iters=3
            ).to_pandas()

    def test_routes_agree_on_random_graph(self, ray_session):
        """local union-find and shuffle hash-min give identical
        (node, component) maps on a seeded random graph."""
        import ray.data

        from pdf_parser_ray.ops.dedup import connected_components

        rng = np.random.RandomState(11)
        edges = pd.DataFrame(
            {"a": rng.randint(0, 60, 80), "b": rng.randint(0, 60, 80)}
        )
        edges = edges[edges["a"] != edges["b"]].reset_index(drop=True)
        got = {}
        for mode in ("local", "shuffle"):
            got[mode] = (
                connected_components(ray.data.from_pandas(edges), mode=mode)
                .to_pandas()
                .sort_values("node")
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(got["local"], got["shuffle"])


class TestBigramsNormalize:
    def test_bigram_counts(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import bigram_counts

        df = pd.DataFrame(
            {"doc_id": [0, 1, 2], "text": ["a b a b", "b  a\tb", "solo"]}
        )
        out = bigram_counts(ray.data.from_pandas(df)).to_pandas().set_index("bigram")
        # doc0: "a b","b a","a b"; doc1: "b a","a b"; doc2: none
        assert out.loc["a b", "n"] == 3
        assert out.loc["b a", "n"] == 2
        assert len(out) == 2  # no cross-doc "b solo" pair

    def test_top_k_ordering(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import bigram_counts

        df = pd.DataFrame({"doc_id": [0], "text": ["x y x y z a z a"]})
        out = bigram_counts(ray.data.from_pandas(df), top_k=3).to_pandas()
        # counts: "x y":2, "y x":1, "y z":1, "z a":2, "a z":1 → top3 by
        # (n desc, bigram asc): ("x y",2), ("z a",2), ("a z",1)
        assert list(zip(out["bigram"], out["n"])) == [("x y", 2), ("z a", 2), ("a z", 1)]

    def test_normalize_text(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.webtext import normalize_text

        df = pd.DataFrame(
            {"doc_id": [0, 1], "text": ["  Héllo\t\tWORLD \n", "café"]}
        )
        out = normalize_text(ray.data.from_pandas(df)).to_pandas().set_index("doc_id")
        assert out.loc[0, "norm_text"] == "héllo world"
        # NFC composes e + U+0301 into é (1 codepoint)
        assert out.loc[1, "norm_text"] == "café"
        assert out.loc[1, "norm_chars"] == 4


class TestLmScore:
    def test_hand_computed_bigram_model(self, ray_session):
        """docs: 'a b a', 'b a', 'z' → model c('a b')=1, c('b a')=2,
        ctx a=1 b=2, V=3 distinct tokens; 'z' has no bigrams → no row
        but still counts into V."""
        import math

        import ray.data

        from pdf_parser_ray.ops.text_stats import lm_score

        ds = ray.data.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([0, 1, 2], dtype="int64"),
                    "text": ["a b a", "b a", "z"],
                }
            )
        )
        out = lm_score(ds).to_pandas().set_index("doc_id")
        assert 2 not in out.index
        # doc0: ln((1+1)/(1+3)) + ln((2+1)/(2+3)), averaged
        avg0 = (math.log(2 / 4) + math.log(3 / 5)) / 2
        avg1 = math.log(3 / 5)
        assert out.loc[0, "n_bigrams"] == 2
        assert out.loc[0, "avg_logp"] == round(avg0, 6)
        assert out.loc[0, "ppl"] == round(math.exp(-avg0), 6)
        assert out.loc[1, "n_bigrams"] == 1
        assert out.loc[1, "avg_logp"] == round(avg1, 6)
        assert out.loc[1, "ppl"] == round(math.exp(-avg1), 6)

    def test_repetitive_text_scores_better(self, ray_session):
        """A doc made of the corpus's dominant bigram gets higher
        avg_logp (lower ppl) than a doc of one-off bigrams."""
        import ray.data

        from pdf_parser_ray.ops.text_stats import lm_score

        common = "x y " * 20
        rare = "q w e r t u i o p s"
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([0, 1], dtype="int64"),
                    "text": [common.strip(), rare],
                }
            )
        )
        out = lm_score(ds).to_pandas().set_index("doc_id")
        assert out.loc[0, "ppl"] < out.loc[1, "ppl"]


class TestQuantileCont:
    def test_matches_numpy_linear(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.quantiles import grouped_quantile_cont

        rng = np.random.RandomState(5)
        df = pd.DataFrame(
            {
                "g": np.repeat(["a", "b"], 101),
                "v": np.concatenate(
                    [rng.uniform(0, 100, 101), rng.uniform(-5, 5, 101)]
                ),
            }
        )
        out = grouped_quantile_cont(
            ray.data.from_pandas(df).repartition(6), "g", "v",
            {"p25": 0.25, "p50": 0.5, "p99": 0.99},
        ).set_index("g")
        for g in ("a", "b"):
            v = df[df["g"] == g]["v"].to_numpy()
            for col, q in (("p25", 0.25), ("p50", 0.5), ("p99", 0.99)):
                assert out.loc[g, col] == round(
                    float(np.quantile(v, q, method="linear")), 6
                )

    def test_exact_rank_no_interpolation(self, ray_session):
        """q·(n−1) integral → the raw element (rounded), single rank."""
        import ray.data

        from pdf_parser_ray.ops.quantiles import grouped_quantile_cont

        df = pd.DataFrame({"g": ["x"] * 5, "v": [10.0, 20.0, 30.0, 40.0, 50.0]})
        out = grouped_quantile_cont(
            ray.data.from_pandas(df), "g", "v", {"p50": 0.5}
        )
        assert out["p50"].tolist() == [30.0]


class TestLagDelta:
    def test_per_user_ordered_deltas(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import lag_delta

        df = pd.DataFrame(
            {
                "event_id": pd.Series([1, 2, 3, 4, 5], dtype="int64"),
                "user_id": pd.Series([7, 7, 7, 9, 9], dtype="int64"),
                "ts": pd.to_datetime(
                    ["2026-01-01 10:00", "2026-01-01 10:05", "2026-01-01 09:00",
                     "2026-01-02 00:00", "2026-01-02 01:00"]
                ),
                "value": [10.0, 25.0, 4.0, 100.0, 40.0],
            }
        )
        out = (
            lag_delta(ray.data.from_pandas(df).repartition(3))
            .to_pandas()
            .set_index("event_id")
        )
        # user 7 order by ts: e3(4.0) -> e1(10.0) -> e2(25.0)
        assert 3 not in out.index          # first of user 7
        assert out.loc[1, "delta"] == 6.0
        assert out.loc[2, "delta"] == 15.0
        # user 9: e4 first (dropped), e5 delta = -60
        assert 4 not in out.index
        assert out.loc[5, "delta"] == -60.0


class TestGroupSampleHistogram:
    def test_group_sample_deterministic_and_k_bounded(self, ray_session):
        import hashlib

        import ray.data

        from pdf_parser_ray.ops.webtext import group_sample

        df = pd.DataFrame(
            {
                "doc_id": pd.Series(range(100), dtype="int64"),
                "lang": ["en"] * 60 + ["de"] * 38 + ["fr"] * 2,
            }
        )
        out = (
            group_sample(ray.data.from_pandas(df).repartition(7), 5)
            .to_pandas()
        )
        assert out[out["lang"] == "en"].shape[0] == 5
        assert out[out["lang"] == "de"].shape[0] == 5
        assert out[out["lang"] == "fr"].shape[0] == 2   # smaller group
        # matches the explicit rule: k smallest md5(doc_id) per group
        en_ids = df[df["lang"] == "en"]["doc_id"]
        want = sorted(en_ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:5]
        assert sorted(out[out["lang"] == "en"]["doc_id"]) == sorted(want)

    def test_value_histogram_counts(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import value_histogram

        df = pd.DataFrame(
            {
                "event_type": ["a", "a", "a", "b"],
                "value": [5.0, 99.9, 100.0, -1.0],
            }
        )
        out = (
            value_histogram(ray.data.from_pandas(df), bin_width=100.0)
            .to_pandas()
            .set_index(["event_type", "bin"])["n"]
        )
        assert out.loc[("a", 0)] == 2
        assert out.loc[("a", 1)] == 1
        assert out.loc[("b", -1)] == 1


class TestEmbeddingQuantize:
    def test_floor_half_contract_and_roundtrip(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import embedding_quantize

        ds = ray.data.from_items(
            [
                {"vec_id": 0, "embedding": [1.0, -0.5, 0.25]},
                {"vec_id": 1, "embedding": [0.0, 0.0]},
            ]
        )
        out = embedding_quantize(ds).to_pandas().set_index("vec_id")
        assert out.loc[0, "scale"] == 1.0
        # floor(-0.5*127 + 0.5) = floor(-63.0) = -63;
        # floor(0.25*127 + 0.5) = floor(32.25) = 32
        assert out.loc[0, "q"] == "127,-63,32"
        assert out.loc[1, "scale"] == 0.0 and out.loc[1, "q"] == "0,0"

    def test_dequantize_error_small(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import embedding_quantize

        rng = np.random.RandomState(2)
        vecs = rng.uniform(-1, 1, (20, 16)).astype("float32")
        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(20)]
        )
        out = embedding_quantize(ds).to_pandas().set_index("vec_id")
        for i in range(20):
            q = np.array([int(v) for v in out.loc[i, "q"].split(",")])
            back = q * out.loc[i, "scale"] / 127.0
            assert np.abs(back - vecs[i].astype("float64")).max() < out.loc[i, "scale"] / 127.0


class TestSetOps:
    def _sides(self):
        import ray.data

        left = pd.DataFrame({"k": [1, 2, 3, 4, 4]})
        right = pd.DataFrame({"k": [3, 4, 5]})
        return ray.data.from_pandas(left), ray.data.from_pandas(right)

    def test_intersect_distinct(self, ray_session):
        from pdf_parser_ray.ops.relational import key_set_op

        l, r = self._sides()
        out = key_set_op(l, r, ["k"], "intersect").to_pandas()
        assert sorted(out["k"]) == [3, 4]  # distinct semantics: 4 once

    def test_except_distinct(self, ray_session):
        from pdf_parser_ray.ops.relational import key_set_op

        l, r = self._sides()
        out = key_set_op(l, r, ["k"], "except").to_pandas()
        assert sorted(out["k"]) == [1, 2]

    def test_bad_op_rejected(self, ray_session):
        from pdf_parser_ray.ops.relational import key_set_op

        l, r = self._sides()
        with pytest.raises(ValueError):
            key_set_op(l, r, ["k"], "union")


class TestGroupingSets:
    def _ds(self):
        import ray.data

        df = pd.DataFrame(
            {
                "a": ["x", "x", "y", "y"],
                "b": ["p", "q", "p", "q"],
                "v": [1.0, 2.0, 3.0, 4.0],
            }
        )
        return ray.data.from_pandas(df)

    def test_cube_levels(self, ray_session):
        from pdf_parser_ray.ops.relational import cube_aggregate

        out = cube_aggregate(self._ds(), ["a", "b"], ["v"])
        # 4 finest + 2 a-level + 2 b-level + 1 grand = 9
        assert len(out) == 9
        grand = out[(out["a"] == "ALL") & (out["b"] == "ALL")]
        assert grand["v"].iloc[0] == 10.0 and grand["n_rows"].iloc[0] == 4
        b_only = out[(out["a"] == "ALL") & (out["b"] == "p")]
        assert b_only["v"].iloc[0] == 4.0  # 1 + 3

    def test_grouping_set_validation(self, ray_session):
        from pdf_parser_ray.ops.relational import grouping_sets_aggregate

        with pytest.raises(ValueError):
            grouping_sets_aggregate(self._ds(), ["a"], ["v"], [["b"]])


class TestNewWindows:
    def _events(self):
        ts = pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:02:00",
             "2024-01-01 00:03:00", "2024-01-01 00:00:30"]
        )
        return pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                "ts": ts,
                "user_id": [7, 7, 7, 7, 8],
                "event_type": ["a", "a", "a", "b", "b"],
                "value": [10.0, 20.0, 60.0, 5.0, 5.0],
            }
        )

    def test_moving_avg_frame(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import moving_avg

        out = (
            moving_avg(ray.data.from_pandas(self._events()), window=3)
            .to_pandas()
            .set_index("event_id")["mov_avg"]
        )
        assert out[1] == 10.0          # frame = [10]
        assert out[2] == 15.0          # frame = [10, 20]
        assert out[3] == 30.0          # frame = [10, 20, 60]
        assert out[4] == pytest.approx((20 + 60 + 5) / 3, abs=1e-4)
        assert out[5] == 5.0           # other user: own frame

    def test_dense_ranks_distinct_values(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import dense_value_ranks

        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                "event_type": ["a"] * 5,
                "value": [9.0, 9.0, 8.0, 7.0, 6.0],
            }
        )
        out = dense_value_ranks(ray.data.from_pandas(df), k=3).to_pandas()
        # ties share rank 1; 6.0 (4th distinct value) excluded
        assert sorted(out["event_id"]) == [1, 2, 3, 4]
        assert set(out.loc[out["value"] == 9.0, "rank"]) == {1}
        assert out.loc[out["event_id"] == 4, "rank"].iloc[0] == 3

    def test_dispersion_matches_pandas(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import grouped_dispersion

        ev = self._events()
        out = (
            grouped_dispersion(ray.data.from_pandas(ev))
            .to_pandas()
            .set_index("event_type")
        )
        expected_sd = ev[ev["event_type"] == "a"]["value"].std(ddof=1)
        assert out.loc["a", "sd_value"] == pytest.approx(expected_sd, abs=1e-6)
        assert out.loc["a", "n"] == 3

    def test_dispersion_degenerate_groups_null(self, ray_session):
        """Single-row and constant-valued groups must yield NULL like
        stddev_samp/corr (regression: 0/0 → NaN warnings, cov/√0 → inf)."""
        import ray.data

        from pdf_parser_ray.ops.windows import grouped_dispersion

        ev = pd.DataFrame(
            {
                "event_type": ["solo", "flat", "flat", "flat"],
                "value": [5.0, 2.0, 2.0, 2.0],
                "ts": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
                ),
            }
        )
        out = (
            grouped_dispersion(ray.data.from_pandas(ev))
            .to_pandas()
            .set_index("event_type")
        )
        assert pd.isna(out.loc["solo", "sd_value"])  # n=1 → NULL
        assert pd.isna(out.loc["solo", "corr_vt"])
        assert out.loc["flat", "sd_value"] == 0.0    # n≥2, constant → 0
        assert pd.isna(out.loc["flat", "corr_vt"])   # zero variance → NULL
        assert not np.isinf(out["corr_vt"].fillna(0)).any()

    def test_above_group_avg(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import above_group_avg

        out = (
            above_group_avg(ray.data.from_pandas(self._events()))
            .to_pandas()
            .set_index("event_type")
        )
        # type a: avg = 30 → only 60 qualifies; type b: avg = 5 → none > 5
        assert out.loc["a", "n_above"] == 1
        assert out.loc["a", "sum_above"] == 60.0
        assert "b" not in out.index


class TestFactSemiJoin:
    def test_order_priority_counts(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as papq

        from pdf_parser_ray.ops.relational import order_priority_counts

        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3],
                "o_orderdate": pd.to_datetime(["2000-01-10", "2000-02-10", "2000-03-10"]),
                "o_orderpriority": ["HIGH", "HIGH", "LOW"],
            }
        )
        li = pd.DataFrame(
            {
                # order 1: shipped after orderdate; order 2: same day (not
                # after); order 3: no line items at all
                "l_orderkey": [1, 1, 2],
                "l_shipdate": pd.to_datetime(["2000-01-09", "2000-01-12", "2000-02-10"]),
            }
        )
        papq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
        papq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
        out = order_priority_counts(str(tmp_path)).to_pandas()
        assert out.to_dict("records") == [{"o_orderpriority": "HIGH", "n_orders": 1}]


class TestRankWindows:
    def test_ntile_pct_cume(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import rank_windows

        # user 7: 5 rows in ts order, values with a tie (20.0 twice)
        ts = pd.to_datetime(
            ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
             "2024-01-01 00:02:00", "2024-01-01 00:03:00",
             "2024-01-01 00:04:00", "2024-01-01 00:00:10"]
        )
        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6],
                "ts": ts,
                "user_id": [7, 7, 7, 7, 7, 8],
                "value": [10.0, 20.0, 20.0, 60.0, 5.0, 9.0],
            }
        )
        out = (
            rank_windows(ray.data.from_pandas(df), n_tiles=4)
            .to_pandas()
            .set_index("event_id")
        )
        # NTILE(4) over 5 rows in ts order → sizes 2,1,1,1 (first tile
        # takes the extra row)
        assert list(out.loc[[1, 2, 3, 4, 5], "tile"]) == [1, 1, 2, 3, 4]
        # percent_rank over value: 5.0→0, 10.0→1/4, 20.0 (tie, min
        # rank 3)→2/4, 60.0→4/4
        assert out.loc[5, "pct_rank"] == 0.0
        assert out.loc[1, "pct_rank"] == 0.25
        assert out.loc[2, "pct_rank"] == 0.5
        assert out.loc[3, "pct_rank"] == 0.5
        assert out.loc[4, "pct_rank"] == 1.0
        # cume_dist: max-rank/n — the tied 20.0s both get 4/5
        assert out.loc[2, "cume_dist"] == 0.8
        assert out.loc[3, "cume_dist"] == 0.8
        # single-row partition: pct_rank 0, cume_dist 1, tile 1
        assert out.loc[6, "tile"] == 1
        assert out.loc[6, "pct_rank"] == 0.0
        assert out.loc[6, "cume_dist"] == 1.0


class TestGopherGate:
    def test_rules(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.webtext import gopher_gate

        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    # 30 words incl. 2 stopwords, mean len in band → keep
                    "the and " + " ".join(["word"] * 28),
                    # too short
                    "the and tiny",
                    # no stopword hits
                    " ".join(["word"] * 30),
                    # empty
                    "",
                ],
            }
        )
        out = (
            gopher_gate(ray.data.from_pandas(docs))
            .to_pandas()
            .set_index("doc_id")
        )
        assert bool(out.loc[1, "keep"]) is True
        assert out.loc[1, "n_words"] == 30
        assert out.loc[1, "stopword_hits"] == 2
        assert bool(out.loc[2, "keep"]) is False
        assert bool(out.loc[3, "keep"]) is False   # stopword rule
        assert out.loc[3, "stopword_hits"] == 0
        assert bool(out.loc[4, "keep"]) is False
        assert out.loc[4, "mean_word_len"] == 0.0

    def test_nbsp_not_a_separator(self, ray_session):
        """U+00A0 must NOT split tokens (RE2/DuckDB \\S semantics;
        regression: a raw Python \\S+ treated it as whitespace and the
        oracle comparison drifted)."""
        import ray.data

        from pdf_parser_ray.ops.webtext import gopher_gate

        docs = pd.DataFrame({"doc_id": [1], "text": ["foo bar baz"]})
        out = gopher_gate(ray.data.from_pandas(docs)).to_pandas()
        assert out["n_words"].iloc[0] == 2  # "foo\xa0bar" is one token


class TestOrderCountDistribution:
    def test_includes_zero_customers(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as papq

        from pdf_parser_ray.ops.relational import order_count_distribution

        cust = pd.DataFrame({"c_custkey": [1, 2, 3, 4]})
        orders = pd.DataFrame({"o_custkey": [1, 1, 1, 2]})
        papq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
        papq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
        out = order_count_distribution(str(tmp_path))
        assert out.to_dict("records") == [
            {"n_orders": 0, "n_customers": 2},
            {"n_orders": 1, "n_customers": 1},
            {"n_orders": 3, "n_customers": 1},
        ]


class TestSkewJoin:
    def test_parity_with_hash_join(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.relational import hash_join, skew_join

        rng = np.random.RandomState(5)
        # key 777 dominates: 3000 of 4000 left rows
        left = pd.DataFrame(
            {
                "k": np.concatenate(
                    [np.full(3000, 777), rng.randint(0, 50, 1000)]
                ),
                "lv": np.arange(4000),
            }
        )
        right = pd.DataFrame(
            {"k": np.arange(0, 800), "rv": np.arange(0, 800) * 10}
        )
        l_ds = ray.data.from_pandas(left)
        r_ds = ray.data.from_pandas(right)
        expected = (
            hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right), ["k"])
            .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
        )
        got = (
            skew_join(l_ds, r_ds, ["k"], hot_key_threshold=1000)
            .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
        )
        assert len(expected) == 4000  # every left key matches
        pd.testing.assert_frame_equal(got[expected.columns], expected)

    def test_no_hot_keys_delegates(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.relational import skew_join

        left = pd.DataFrame({"k": np.arange(100), "lv": np.arange(100)})
        right = pd.DataFrame({"k": np.arange(50), "rv": np.arange(50)})
        out = (
            skew_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right), ["k"],
                hot_key_threshold=1000,
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert len(out) == 50
        assert list(out["rv"]) == [k * 1 for k in range(50)]


class TestAutoJoin:
    def test_broadcast_route_for_small_parquet(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as papq
        import ray.data

        from pdf_parser_ray.ops import relational as R

        left = pd.DataFrame({"k": list(range(100)) * 2, "lv": range(200)})
        right = pd.DataFrame({"k": range(50), "rv": range(50)})
        lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
        papq.write_table(pa.Table.from_pandas(left), lp)
        papq.write_table(pa.Table.from_pandas(right), rp)

        calls = {"hash": 0}
        orig = R.hash_join

        def spy(*a, **k):
            calls["hash"] += 1
            return orig(*a, **k)

        R.hash_join = spy
        try:
            out = (
                R.auto_join(
                    R.read_parquet_clean(lp), R.read_parquet_clean(rp), ["k"]
                )
                .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
            )
        finally:
            R.hash_join = orig
        assert calls["hash"] == 0          # tiny right side → broadcast route
        assert len(out) == 100             # 50 matched keys x 2 left rows
        exp = left.merge(right, on="k").sort_values(["k", "lv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(out[exp.columns], exp)

    def test_unknown_size_falls_back_to_hash(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.relational import auto_join

        left = pd.DataFrame({"k": range(30), "lv": range(30)})
        right = pd.DataFrame({"k": range(10), "rv": range(10)})
        # from_pandas inputs have no datasource estimate → hash route;
        # result must still be correct.
        out = (
            auto_join(
                ray.data.from_pandas(left), ray.data.from_pandas(right), ["k"]
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert len(out) == 10 and list(out["rv"]) == list(range(10))


class TestRangePartitionedWrite:
    def test_ranges_are_disjoint_and_complete(self, ray_session, tmp_path):
        import os

        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.shuffle import write_range_partitioned

        rng = np.random.RandomState(9)
        df = pd.DataFrame({"k": np.arange(5000), "value": rng.rand(5000) * 100})
        out = str(tmp_path / "ranged")
        bounds = write_range_partitioned(
            ray.data.from_pandas(df), out, "value", n_ranges=8
        )
        assert len(bounds) == 7 and bounds == sorted(bounds)

        dirs = sorted(d for d in os.listdir(out) if d.startswith("range_id="))
        assert len(dirs) == 8
        total = 0
        prev_max = -np.inf
        for i in range(8):
            part = ray.data.read_parquet(os.path.join(out, f"range_id={i}")).to_pandas()
            total += len(part)
            # boundary invariant: strictly ordered between adjacent ranges
            assert part["value"].min() >= prev_max or i == 0
            prev_max = part["value"].max()
            if i < 7:
                assert part["value"].max() <= bounds[i]
            if i > 0:
                assert part["value"].min() > bounds[i - 1]
        assert total == 5000
        # approximate balance: no range holds more than 3x its fair share
        sizes = [
            ray.data.read_parquet(os.path.join(out, d)).count() for d in dirs
        ]
        assert max(sizes) < 3 * (5000 / 8)


def test_sentence_stats_edges():
    import pandas as pd

    from pdf_parser_ray.ops.text_stats import sentence_stats_batch

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "One. Two! Three?",      # 3 sentences, 3 words
                "Wait... what?!",         # runs collapse: 2 sentences
                "no terminal punctuation",  # 0 sentences -> wps 0.0
                None,                      # null text -> 0 / 0.0
            ],
        }
    )
    out = sentence_stats_batch(df)
    assert out["n_sentences"].tolist() == [3, 2, 0, 0]
    assert out["words_per_sentence"].tolist() == [1.0, 1.0, 0.0, 0.0]


def test_first_last_value_skew_immune_partials(ray_session):
    """A power user spread over many blocks still reduces to one
    (first, last) pair, and batch-local extremes pick the global ones."""
    import pandas as pd
    import ray.data

    from pdf_parser_ray.ops.windows import first_last_value

    df = pd.DataFrame(
        {
            "user_id": [1] * 8 + [2],
            "ts": pd.to_datetime(
                ["2024-01-05", "2024-01-03", "2024-01-08", "2024-01-01",
                 "2024-01-07", "2024-01-02", "2024-01-06", "2024-01-04",
                 "2024-01-09"]
            ),
            "event_id": list(range(9)),
            "value": [50.0, 30.0, 80.0, 10.0, 70.0, 20.0, 60.0, 40.0, 99.0],
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    out = (
        first_last_value(ds)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2]
    assert out["first_value"].tolist() == [10.0, 99.0]  # 2024-01-01
    assert out["last_value"].tolist() == [80.0, 99.0]   # 2024-01-08


def test_script_profile_majority_and_ranges():
    import pandas as pd

    from pdf_parser_ray.ops.text_stats import script_profile_batch

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "hello naïve café",         # latin incl. accented
                "привет мир",               # cyrillic
                "你好世界 ok",               # cjk beats 2-char latin
                "αβγ abc",                  # 3-3 tie -> first range wins
                "12345 !!!",                # no script chars -> none
            ],
        }
    )
    out = script_profile_batch(df)
    assert out["majority_script"].tolist() == [
        "n_latin", "n_cyrillic", "n_cjk", "n_latin", "none",
    ]
    assert out.loc[1, "n_cyrillic"] == 9
    assert out.loc[2, "n_cjk"] == 4


def test_grouped_mode_tiebreak_and_merge(ray_session):
    """Counts split across blocks must merge before the winner pick;
    equal counts break to the smaller value."""
    import pandas as pd
    import ray.data

    from pdf_parser_ray.ops.windows import grouped_mode

    df = pd.DataFrame(
        {
            "event_type": ["a"] * 6 + ["b"] * 4,
            "user_id": [7, 7, 7, 2, 2, 2, 9, 9, 1, 1],  # a: 3-3 tie -> 2
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = (
        grouped_mode(ds)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [2, 1]
    assert out["n"].tolist() == [3, 2]


def test_grouped_concat_order(ray_session):
    import pandas as pd
    import ray.data

    from pdf_parser_ray.ops.windows import grouped_concat

    df = pd.DataFrame(
        {
            "source": ["s1", "s2", "s1", "s1", "s2"],
            "doc_id": [30, 5, 10, 20, 1],
            "lang": ["c", "y", "a", "b", "x"],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = (
        grouped_concat(ds)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert out["vals"].tolist() == ["a,b,c", "x,y"]


class TestNormalizeAndPmi:
    def test_pmi_ranks_exclusive_pair_over_frequent_pair(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import pmi_bigrams

        # "san francisco" only ever co-occur; "the cat" words also appear
        # in many other contexts -> PMI(san francisco) > PMI(the cat).
        docs = ["san francisco"] * 6 + ["the cat"] * 6 + [
            "the dog", "the bird", "a cat", "one cat", "the end", "the sea"
        ]
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        )
        out = pmi_bigrams(ds, min_count=5, k=10).to_pandas()
        pairs = list(zip(out["w1"], out["w2"]))
        assert ("san", "francisco") in pairs and ("the", "cat") in pairs
        assert pairs.index(("san", "francisco")) < pairs.index(("the", "cat"))
        sf = out[(out["w1"] == "san")]["cb"].iloc[0]
        assert sf == 6


class TestDuplicateWindows:
    def test_shared_window_found_unique_text_not(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import duplicate_windows

        shared = "one two three four five six seven eight"
        docs = [
            f"{shared} unique tail alpha",
            f"prefix words here {shared}",
            "completely different text with no overlap at all whatsoever",
        ]
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1, 2, 3], "text": docs})
        )
        out = duplicate_windows(ds, w=8, stride=1, k=None).to_pandas()
        # the shared 8-token window appears in docs 1 and 2
        assert (out["n_docs"] >= 2).all()
        assert len(out) >= 1
        assert (out["n_occ"] >= out["n_docs"]).all()

    def test_in_doc_repeat_counts_occurrences_not_docs(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import duplicate_windows

        block = "a b c d e f g h"
        ds = ray.data.from_pandas(pd.DataFrame({
            "doc_id": [1, 2],
            # doc 1 contains the window twice (positions 0 and 8)
            "text": [f"{block} {block}", block],
        }))
        out = duplicate_windows(ds, w=8, stride=8, k=None).to_pandas()
        row = out[out["n_docs"] == 2]
        assert len(row) == 1
        assert int(row["n_occ"].iloc[0]) == 3  # 2 in doc1 + 1 in doc2


class TestDuplicateSpans:
    """ExactSubstr span report + removal (Lee et al. 2021 shape)."""

    def _corpus(self):
        import numpy as np

        rng = np.random.RandomState(3)
        alpha = "abcdefghijklmnopqrstuvwxyz "
        rand = lambda n: "".join(rng.choice(list(alpha), n))
        shared = "THE EXACT SAME SIXTY CHARACTER BOILERPLATE PASSAGE REPEATS.."
        assert len(shared) == 60
        docs = [
            rand(80) + shared + rand(50),           # doc 0: shared at 80
            shared + rand(120),                     # doc 1: shared at 0
            rand(200),                              # doc 2: unique
            rand(30) + shared + rand(10) + shared,  # doc 3: in-doc repeat too
        ]
        return pd.DataFrame({"doc_id": range(4), "text": docs}), shared

    def test_spans_cover_planted_passage_exactly(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import duplicate_spans

        df, shared = self._corpus()
        out = (
            duplicate_spans(ray.data.from_pandas(df), window=32)
            .to_pandas().sort_values(["doc_id", "start"]).reset_index(drop=True)
        )
        by_doc = {d: list(zip(g["start"], g["end"]))
                  for d, g in out.groupby("doc_id")}
        # every duplicated 32-window lies inside the shared passage, and
        # stride-1 coverage recovers it exactly: span == its occurrence
        assert by_doc[0] == [(80, 140)]
        assert by_doc[1] == [(0, 60)]
        assert 2 not in by_doc                       # unique doc untouched
        # doc 3: occurrences at 30 and 100, gap 10 < window → they chain
        # into one span only if 100 <= (30+60-32)+32 = 90? no: 100 > 90,
        # so two separate maximal spans
        assert by_doc[3] == [(30, 90), (100, 160)]

    def test_join_route_matches_broadcast(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import duplicate_spans

        df, _ = self._corpus()
        ds = ray.data.from_pandas(df)
        key = ["doc_id", "start", "end"]
        bc = duplicate_spans(ds, window=32).to_pandas().sort_values(
            key).reset_index(drop=True)
        jn = duplicate_spans(ds, window=32, mode="join").to_pandas(
        ).sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(bc, jn)

    def test_scrub_removes_passage_and_reports_stats(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import scrub_duplicate_spans

        df, shared = self._corpus()
        out = (
            scrub_duplicate_spans(ray.data.from_pandas(df), window=32)
            .to_pandas().set_index("doc_id")
        )
        for d in (0, 1, 3):
            assert shared not in out.loc[d, "clean_text"]
        assert out.loc[2, "clean_text"] == df["text"][2]  # untouched
        assert out.loc[2, "n_removed_spans"] == 0
        assert out.loc[0, "n_removed_chars"] == 60
        assert out.loc[3, "n_removed_spans"] == 2
        # surgery is consistent: removed chars == length delta
        for d in range(4):
            assert (
                len(df["text"][d]) - len(out.loc[d, "clean_text"])
                == out.loc[d, "n_removed_chars"]
            )

    def test_multibyte_offsets_are_char_true(self, ray_session):
        """Non-ASCII regression (advisor r3): window hashes run over
        CODE POINTS, so reported offsets slice the Python str correctly
        even when multibyte characters precede (or sit inside) the
        duplicated passage, and both routes agree."""
        import ray.data

        from pdf_parser_ray.ops.dedup import (
            duplicate_spans,
            scrub_duplicate_spans,
        )

        shared = "duplicated—passage with émojis 🎉 and ünïcode padding!!"
        assert len(shared) >= 40
        # boundary chars around the passage differ per doc, so the
        # maximal duplicated substring is exactly `shared`
        docs = [
            "préfix with åccents ·A" + shared + "B sûffix",
            "日本語のテキストが先頭にあるC" + shared + "D",
            "all-ascii unique filler text that repeats nothing at all……",
        ]
        df = pd.DataFrame({"doc_id": range(3), "text": docs})
        ds = ray.data.from_pandas(df)
        out = duplicate_spans(ds, window=32).to_pandas()
        assert len(out) == 2
        for _, r in out.iterrows():
            t = docs[int(r["doc_id"])]
            # char-true: slicing the str at the reported offsets
            # recovers a span that contains the planted passage
            assert shared in t[int(r["start"]):int(r["end"])]
        exp0 = docs[0].index(shared)
        got0 = out[out["doc_id"] == 0].iloc[0]
        assert int(got0["start"]) == exp0
        assert int(got0["end"]) == exp0 + len(shared)
        jn = duplicate_spans(ds, window=32, mode="join").to_pandas()
        key = ["doc_id", "start", "end"]
        pd.testing.assert_frame_equal(
            out.sort_values(key).reset_index(drop=True),
            jn.sort_values(key).reset_index(drop=True),
        )
        sc = scrub_duplicate_spans(ds, window=32).to_pandas().set_index(
            "doc_id")
        for d in (0, 1):
            assert shared not in sc.loc[d, "clean_text"]
            assert sc.loc[d, "n_removed_chars"] == len(shared)
        assert sc.loc[2, "clean_text"] == docs[2]

    def test_multibyte_matches_duckdb_ord_twin(self, ray_session):
        """The code-point kernel reproduces the DuckDB ord()-based twin
        byte for byte on non-ASCII input (the r3 advisor divergence)."""
        import duckdb
        import ray.data

        from pdf_parser_ray.ops.dedup import duplicate_spans
        from pdf_parser_ray.queries import SQL

        shared = "duplicated—passage with émojis 🎉 and ünïcode padding!!"
        docs = [
            "préfix with åccents ·A" + shared + "B sûffix",
            "日本語のテキストが先頭にあるC" + shared + "D",
        ]
        documents = pd.DataFrame({"doc_id": range(2), "text": docs})
        con = duckdb.connect()
        con.register("documents", documents)
        # NOTE: DuckDB indexes text[i] by code point and ord() yields the
        # code point — the exact domain the kernel now hashes.
        oracle = con.execute(SQL["dup_spans"]).df().sort_values(
            ["doc_id", "start"]).reset_index(drop=True)
        got = duplicate_spans(
            ray.data.from_pandas(documents), window=32
        ).to_pandas().sort_values(["doc_id", "start"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64"), oracle.astype("int64")
        )

    def test_no_duplicates_is_a_clean_passthrough(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import (
            duplicate_spans,
            scrub_duplicate_spans,
        )

        df = pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["totally unique first document text here",
                     "and a second one that shares nothing long"],
        })
        ds = ray.data.from_pandas(df)
        assert duplicate_spans(ds, window=32).to_pandas().empty
        out = scrub_duplicate_spans(ds, window=32).to_pandas()
        assert list(out["clean_text"]) == list(df["text"])
        assert (out["n_removed_chars"] == 0).all()


class TestPmiRoutesAndGates:
    def test_pmi_join_route_matches_broadcast(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import pmi_bigrams

        docs = (["san francisco bay"] * 6 + ["the cat sat"] * 6
                + ["the dog ran", "a cat here", "the end is", "the sea was"])
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
        )
        bc = pmi_bigrams(ds, min_count=3, k=20).to_pandas()
        jn = pmi_bigrams(ds, min_count=3, k=20, broadcast_limit=0).to_pandas()
        pd.testing.assert_frame_equal(
            bc.reset_index(drop=True), jn.reset_index(drop=True)
        )

    def test_bernoulli_gate_is_deterministic_and_monotone(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.webtext import bernoulli_gate

        df = pd.DataFrame({
            "doc_id": np.arange(4000),
            "p": np.where(np.arange(4000) < 2000, 0.9, 0.1),
        })
        ds = ray.data.from_pandas(df)
        out = bernoulli_gate(ds, prob_col="p").to_pandas()
        out2 = bernoulli_gate(ds, prob_col="p").to_pandas()
        assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
        hi = (out["doc_id"] < 2000).sum()
        lo = (out["doc_id"] >= 2000).sum()
        assert abs(hi - 1800) < 120 and abs(lo - 200) < 80
        # p=0 keeps nothing, p=1 keeps everything
        edge = pd.DataFrame({"doc_id": range(100), "p": [0.0] * 50 + [1.0] * 50})
        kept = bernoulli_gate(
            ray.data.from_pandas(edge), prob_col="p"
        ).to_pandas()
        assert set(kept["doc_id"]) == set(range(50, 100))

    def test_psi_zero_on_identical_windows_positive_on_shift(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.sketches import psi_drift

        ts_ref = pd.date_range("2024-01-01", periods=2000, freq="min")
        ts_cur = pd.date_range("2024-01-20", periods=2000, freq="min")
        vals = np.tile(np.linspace(1, 99, 1000), 2)
        same = pd.DataFrame({
            "ts": ts_ref.append(ts_cur),
            "value": np.concatenate([vals[:2000], vals[:2000]]),
        })
        out = psi_drift(
            ray.data.from_pandas(same), split_ts="2024-01-16",
            lo=0.0, hi=100.0, n_bins=10,
        )
        assert out["psi"].iloc[0] == 0.0
        shifted = same.copy()
        shifted.loc[shifted["ts"] >= "2024-01-16", "value"] += 40.0
        out2 = psi_drift(
            ray.data.from_pandas(shifted), split_ts="2024-01-16",
            lo=0.0, hi=100.0, n_bins=10,
        )
        assert out2["psi"].iloc[0] > 0.5
        assert int(out2["n_ref"].iloc[0]) == int(out2["n_cur"].iloc[0]) == 2000


class TestFuzzyStringPairs:
    def test_levenshtein_kernel(self, ray_session):
        from pdf_parser_ray.ops.dedup import _levenshtein

        assert _levenshtein("kitten", "sitting") == 3
        assert _levenshtein("abc", "abc") == 0
        assert _levenshtein("abc", "ab") == 1
        assert _levenshtein("", "xyz") == 3
        assert _levenshtein("ab", "ba") == 2  # transposition = 2 edits

    def test_recall_is_exact_for_d1(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import fuzzy_string_pairs

        vals = ["cold ring", "old ring", "bold ring", "gold ring",
                "hot gear", "hot bear", "unrelated thing", "cold ring"]
        ds = ray.data.from_pandas(pd.DataFrame({"name": vals}))
        out = fuzzy_string_pairs(ds, "name", max_dist=1).to_pandas()
        got = set(zip(out["a"], out["b"]))
        # brute-force truth over distinct values
        from pdf_parser_ray.ops.dedup import _levenshtein

        dv = sorted(set(vals))
        want = {(a, b) for i, a in enumerate(dv) for b in dv[i + 1:]
                if _levenshtein(a, b) <= 1}
        assert got == want
        assert (out["dist"] <= 1).all()

    def test_d2_substitutions_covered(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import fuzzy_string_pairs

        ds = ray.data.from_pandas(
            pd.DataFrame({"name": ["abcdef", "azcdez", "abcdef!"]})
        )
        out = fuzzy_string_pairs(ds, "name", max_dist=2).to_pandas()
        got = set(zip(out["a"], out["b"]))
        assert ("abcdef", "azcdez") in got       # two substitutions
        assert ("abcdef", "abcdef!") in got      # one insertion


class TestFunnel:
    def test_order_matters_and_stages_gate(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import funnel_counts

        ev = pd.DataFrame({
            "user_id": [1, 1, 1,   2, 2,   3, 3,   4],
            "event_type": ["view", "click", "purchase",
                           "click", "view",          # click BEFORE view
                           "view", "purchase",       # skipped click
                           "view"],
            "ts": pd.to_datetime([
                "2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 12:00",
                "2024-01-01 10:00", "2024-01-01 11:00",
                "2024-01-01 10:00", "2024-01-01 11:00",
                "2024-01-01 10:00",
            ]),
        })
        out = funnel_counts(
            ray.data.from_pandas(ev), ["view", "click", "purchase"]
        ).to_pandas().set_index("stage")
        assert out.loc["view", "n_users"] == 4       # users 1,2,3,4
        assert out.loc["click", "n_users"] == 1      # only user 1 in order
        assert out.loc["purchase", "n_users"] == 1   # user 3 lacks click
        assert list(out["stage_idx"]) == [0, 1, 2]

    def test_same_timestamp_is_not_after(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import funnel_counts

        ev = pd.DataFrame({
            "user_id": [1, 1],
            "event_type": ["view", "click"],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),  # equal
        })
        out = funnel_counts(
            ray.data.from_pandas(ev), ["view", "click"]
        ).to_pandas().set_index("stage")
        assert out.loc["view", "n_users"] == 1
        assert out.loc["click", "n_users"] == 0  # strictly-after contract


class TestTimeWeightedAvg:
    def test_matches_hand_computation(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import time_weighted_avg

        # user 7: value 10 for 3 s, then 20 for 1 s -> twa = 12.5
        ev = pd.DataFrame({
            "user_id": [7, 7, 7, 9],
            "ts": pd.to_datetime([
                "2024-01-01 00:00:00", "2024-01-01 00:00:03",
                "2024-01-01 00:00:04",
                "2024-01-01 00:00:00",  # user 9: single event -> dropped
            ]),
            "value": [10.0, 20.0, 99.0, 5.0],
        })
        out = time_weighted_avg(ray.data.from_pandas(ev)).to_pandas()
        assert set(out["user_id"]) == {7}
        assert out["twa"].iloc[0] == (10.0 * 3 + 20.0 * 1) / 4


class TestTimeRangeSum:
    def test_clock_frame_and_tie_peers(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import time_range_sum

        ev = pd.DataFrame({
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 7, 9],
            "ts": pd.to_datetime([
                "2024-01-01 10:00:00",
                "2024-01-01 10:30:00",
                "2024-01-01 11:00:00",  # exactly 1h after #1 -> included
                "2024-01-01 11:00:00",  # tie peer of #3
                "2024-01-01 10:00:00",
            ]),
            "value": [1.0, 2.0, 4.0, 8.0, 100.0],
        })
        out = (
            time_range_sum(ray.data.from_pandas(ev), window_s=3600)
            .to_pandas().set_index("event_id")
        )
        assert out.loc[1, "win_sum"] == 1.0
        assert out.loc[2, "win_sum"] == 3.0
        # rows 3 and 4 are RANGE peers: both frames include BOTH peers
        # plus rows 1 (exactly 1h back, inclusive) and 2
        assert out.loc[3, "win_sum"] == 15.0
        assert out.loc[4, "win_sum"] == 15.0
        assert out.loc[5, "win_sum"] == 100.0  # other user isolated


class TestDedupEventsInWindow:
    def test_kept_anchor_rate_limiter_rule(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import dedup_events_in_window

        # events at t, t+40m, t+80m with a 1h window: the 40m event is
        # suppressed and does NOT extend the window -> t+80m is kept
        ev = pd.DataFrame({
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 7, 8],
            "event_type": ["click"] * 4,
            "ts": pd.to_datetime([
                "2024-01-01 10:00", "2024-01-01 10:40",
                "2024-01-01 11:20", "2024-01-01 10:00",
            ]),
        })
        out = dedup_events_in_window(
            ray.data.from_pandas(ev), window_s=3600
        ).to_pandas()
        assert sorted(out["event_id"]) == [1, 3, 4]

    def test_matches_serial_reference_on_real_events(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import dedup_events_in_window

        sf = "/root/testdata/sf0.001"
        ev = pd.read_parquet(
            f"{sf}/events.parquet",
            columns=["event_id", "user_id", "event_type", "ts"],
        )
        got = (
            dedup_events_in_window(
                ray.data.from_pandas(ev), window_s=1800
            ).to_pandas()["event_id"].sort_values().tolist()
        )
        # serial greedy reference
        keep = []
        for _, g in ev.sort_values(
            ["user_id", "event_type", "ts", "event_id"]
        ).groupby(["user_id", "event_type"]):
            anchor = None
            for _, row in g.iterrows():
                if anchor is None or (
                    (row["ts"] - anchor).total_seconds() >= 1800
                ):
                    keep.append(row["event_id"])
                    anchor = row["ts"]
        assert got == sorted(keep)


class TestCooccurrence:
    def test_pairs_and_cap(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import cooccurrence_counts

        ev = pd.DataFrame({
            "user_id": [1, 1, 1, 2, 2, 3, 1],
            "event_type": ["a", "b", "c", "a", "b", "a", "a"],  # dup (1,a)
        })
        out = cooccurrence_counts(
            ray.data.from_pandas(ev), by="user_id", item_col="event_type"
        ).to_pandas().set_index(["t1", "t2"])["n_keys"]
        assert out.loc[("a", "b")] == 2     # users 1 and 2
        assert out.loc[("a", "c")] == 1     # user 1
        assert out.loc[("b", "c")] == 1
        assert len(out) == 3                # dedup kept (1,a) single

    def test_cap_bounds_quadratic_blowup(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import cooccurrence_counts

        # one bot key with 50 items, cap at 5 -> at most C(5,2) pairs
        ev = pd.DataFrame({
            "user_id": [1] * 50,
            "event_type": [f"i{j:02d}" for j in range(50)],
        })
        out = cooccurrence_counts(
            ray.data.from_pandas(ev), max_items_per_key=5
        ).to_pandas()
        assert len(out) == 10


class TestUpsertLatest:
    def test_latest_wins_updates_beat_base_on_tie(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.relational import upsert_latest

        base = pd.DataFrame({
            "k": pd.Series([1, 2, 3], dtype="int64"),
            "v": ["b1", "b2", "b3"],
            "ver": pd.Series([5, 5, 5], dtype="int64"),
        })
        upd = pd.DataFrame({
            "k": pd.Series([2, 2, 3, 4], dtype="int64"),
            "v": ["u2a", "u2b", "u3", "u4"],
            # k=2: two updates, highest version wins; k=3: TIE with base
            # -> update wins; k=4: insert
            "ver": pd.Series([6, 7, 5, 1], dtype="int64"),
        })
        out = (
            upsert_latest(
                ray.data.from_pandas(base), ray.data.from_pandas(upd),
                key="k", version_col="ver",
            )
            .to_pandas().set_index("k").sort_index()
        )
        assert out.loc[1, "v"] == "b1"      # untouched base row
        assert out.loc[2, "v"] == "u2b"     # max version among updates
        assert out.loc[3, "v"] == "u3"      # tie -> update side wins
        assert out.loc[4, "v"] == "u4"      # pure insert
        assert len(out) == 4


class TestRetentionCohorts:
    def test_triangle_counts(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import retention_cohorts

        ev = pd.DataFrame({
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": pd.to_datetime([
                "2024-01-01 09:00", "2024-01-01 18:00",  # same day -> one
                "2024-01-03 08:00",
                "2024-01-02 10:00", "2024-01-03 10:00",
                "2024-01-01 23:00",
            ]),
        })
        out = (
            retention_cohorts(ray.data.from_pandas(ev))
            .to_pandas()
            .set_index(["cohort_day", "day_offset"])["n_users"]
        )
        d1 = pd.Timestamp("2024-01-01")
        d2 = pd.Timestamp("2024-01-02")
        assert out.loc[(d1, 0)] == 2   # users 1 and 3 started Jan 1
        assert out.loc[(d1, 2)] == 1   # user 1 returned on day +2
        assert out.loc[(d2, 0)] == 1   # user 2's cohort
        assert out.loc[(d2, 1)] == 1
        assert out.sum() == 5          # distinct (user, day) pairs


class TestPagerank:
    def test_matches_numpy_reference(self, ray_session):
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.dedup import pagerank

        # small undirected graph: star (0-1,0-2,0-3) plus edge 2-3
        edges = pd.DataFrame({"a": [0, 0, 0, 2], "b": [1, 2, 3, 3]})
        got = (
            pagerank(ray.data.from_pandas(edges), n_iters=20)
            .to_pandas().set_index("node")["rank"]
        )
        # dense reference
        nodes = [0, 1, 2, 3]
        adj = np.zeros((4, 4))
        for a, b in [(0, 1), (0, 2), (0, 3), (2, 3)]:
            adj[a, b] = adj[b, a] = 1
        deg = adj.sum(axis=1)
        r = np.full(4, 0.25)
        for _ in range(20):
            r = 0.15 / 4 + 0.85 * (adj.T @ (r / deg))
        for i in nodes:
            assert abs(got.loc[i] - r[i]) < 1e-5, (i, got.loc[i], r[i])
        # hub outranks leaves; leaf 1 (degree 1) is the smallest
        assert got.loc[0] == got.max() and got.loc[1] == got.min()

    def test_rank_mass_conserved(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import pagerank

        edges = pd.DataFrame({"a": [1, 2, 3, 4], "b": [2, 3, 4, 1]})
        got = pagerank(ray.data.from_pandas(edges), n_iters=5).to_pandas()
        assert abs(got["rank"].sum() - 1.0) < 1e-6

    def test_three_routes_value_identical(self, ray_session):
        """driver / broadcast / distributed rank routes must agree
        value-exactly under the inter-iteration rounding contract —
        the distributed route (ranks stay a Dataset, one hash join +
        one grouped sum per round) is the full-web formulation the
        broadcast route's scale note promised (VERDICT r2 #5)."""
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.dedup import pagerank

        rng = np.random.RandomState(7)
        edges = pd.DataFrame(
            {"a": rng.randint(0, 120, 900), "b": rng.randint(0, 120, 900)}
        )
        edges = edges[edges["a"] != edges["b"]]
        ds = ray.data.from_pandas(edges)
        outs = {
            mode: pagerank(ds, n_iters=4, round_iters=8, ranks_mode=mode)
            .to_pandas().sort_values("node").reset_index(drop=True)
            for mode in ("driver", "broadcast", "distributed")
        }
        pd.testing.assert_frame_equal(outs["driver"], outs["broadcast"])
        pd.testing.assert_frame_equal(outs["driver"], outs["distributed"])
        assert abs(outs["distributed"]["rank"].sum() - 1.0) < 1e-4

    def test_directed_routes_keep_source_only_nodes(self, ray_session):
        """Directed-graph parity (advisor r3): a node with out-edges but
        ZERO in-edges must keep teleport rank in the distributed route
        (it previously vanished from the rank Dataset after round 1,
        taking its outgoing mass with it)."""
        import numpy as np
        import ray.data

        from pdf_parser_ray.ops.dedup import pagerank

        # node 0 is source-only (out-edges, no in-edges); node 5 too.
        edges = pd.DataFrame({
            "a": [0, 0, 1, 2, 3, 4, 5, 5],
            "b": [1, 2, 2, 3, 4, 1, 3, 4],
        })
        ds = ray.data.from_pandas(edges)
        outs = {
            mode: pagerank(ds, n_iters=4, round_iters=8, directed=True,
                           ranks_mode=mode)
            .to_pandas().sort_values("node").reset_index(drop=True)
            for mode in ("broadcast", "distributed")
        }
        # source-only nodes present in BOTH routes, at teleport rank
        for mode, out in outs.items():
            assert set(out["node"]) >= {0, 5}, mode
        n = len(outs["broadcast"])
        teleport = round((1 - 0.85) / n, 6)
        dist = outs["distributed"].set_index("node")["rank"]
        assert dist.loc[0] == teleport
        assert dist.loc[5] == teleport
        pd.testing.assert_frame_equal(outs["broadcast"], outs["distributed"])


class TestAssignSessions:
    def test_labels_consistent_with_sessionize(self, ray_session):
        import ray.data

        from pdf_parser_ray.io_utils import read_parquet_clean
        from pdf_parser_ray.ops.windows import assign_sessions, sessionize

        sf = "/root/testdata/sf0.001"
        ds = read_parquet_clean(
            f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
        )
        labels = assign_sessions(ds, gap_seconds=1800).to_pandas()
        counts = sessionize(ds, gap_seconds=1800).to_pandas()
        got = labels.groupby("user_id")["session_id"].max().sort_index()
        want = counts.set_index("user_id")["n_sessions"].sort_index()
        assert got.index.tolist() == want.index.tolist()
        assert (got.to_numpy() == want.to_numpy()).all()
        assert labels["session_id"].min() == 1


class TestCanonicalizeStrings:
    def test_clusters_map_to_lexicographic_min(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import canonicalize_strings

        vals = ["cold ring", "old ring", "bold ring",
                "hot gear", "hot bear", "standalone value",
                "cold ring"]  # duplicate row collapses
        ds = ray.data.from_pandas(pd.DataFrame({"name": vals}))
        out = (
            canonicalize_strings(ds, "name", max_dist=1)
            .to_pandas().set_index("value")["canonical"]
        )
        # {cold,old,bold,gold? no gold} ring all within lev<=1 of each
        # other through 'old ring' -> one component, min = 'bold ring'
        assert out.loc["cold ring"] == "bold ring"
        assert out.loc["old ring"] == "bold ring"
        assert out.loc["bold ring"] == "bold ring"
        assert out.loc["hot gear"] == "hot bear"   # lev 2? b<->g = 1 sub
        assert out.loc["standalone value"] == "standalone value"
        assert len(out) == 6  # one row per distinct value


class TestDistinctiveTerms:
    def test_group_marker_word_wins(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import distinctive_terms

        # "zebra" appears only in group A; common words spread evenly
        docs = pd.DataFrame({
            "source": ["A"] * 4 + ["B"] * 4,
            "text": ["the zebra runs fast"] * 4
            + ["the horse runs fast"] * 4,
        })
        out = distinctive_terms(
            ray.data.from_pandas(docs), "source", k=2
        ).to_pandas()
        a_top = out[out["source"] == "A"].iloc[0]
        b_top = out[out["source"] == "B"].iloc[0]
        assert a_top["token"] == "zebra"
        assert b_top["token"] == "horse"
        # shared words score near 1, markers far above
        assert a_top["score"] > 2.0


class TestPagerankEmpty:
    def test_empty_edge_set_yields_empty_ranks(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import pagerank

        edges = pd.DataFrame({
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
        })
        out = pagerank(ray.data.from_pandas(edges), n_iters=3).to_pandas()
        # Ray's to_pandas() drops the schema of a fully-empty dataset,
        # so only emptiness is assertable here
        assert len(out) == 0


class TestTriangles:
    def test_cooccur_edges_threshold_and_order(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import cooccur_edges

        df = pd.DataFrame(
            {
                "g": [1, 1, 1, 2, 2, 2, 3, 3, 3],
                "i": [10, 20, 30, 10, 20, 40, 20, 10, 10],  # dup (3,10)
            }
        )
        out = (
            cooccur_edges(
                ray.data.from_pandas([df.iloc[:5], df.iloc[5:]]),
                group_col="g", item_col="i", min_count=2,
            )
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        # (10,20) appears in groups 1,2,3; nothing else repeats
        assert out.to_dict("list") == {"a": [10], "b": [20], "n": [3]}

    def test_triangle_count_known_graph(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import triangle_count

        # K4 on {1,2,3,4} (4 triangles) plus a pendant edge (4,9)
        edges = pd.DataFrame(
            {"a": [1, 1, 1, 2, 2, 3, 4], "b": [2, 3, 4, 3, 4, 4, 9]}
        )
        out = triangle_count(
            ray.data.from_pandas([edges.iloc[:4], edges.iloc[4:]])
        )
        assert out.loc[0, "n_edges"] == 7
        assert out.loc[0, "n_triangles"] == 4

    def test_triangle_count_empty(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import triangle_count

        empty = pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
        )
        out = triangle_count(ray.data.from_pandas(empty))
        assert out.loc[0, "n_edges"] == 0 and out.loc[0, "n_triangles"] == 0

    def test_clustering_coefficient_known_graph(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import clustering_coefficient

        # K4 on {1,2,3,4} plus pendant (4,9): nodes 1-3 have coef 1.0
        # (all 3 neighbors mutually linked); node 4 has d=4, T=3 -> 0.5
        edges = pd.DataFrame(
            {"a": [1, 1, 1, 2, 2, 3, 4], "b": [2, 3, 4, 3, 4, 4, 9]}
        )
        out = (
            clustering_coefficient(
                ray.data.from_pandas([edges.iloc[:4], edges.iloc[4:]])
            )
            .to_pandas()
            .set_index("node")
        )
        assert out.loc[1, "coef"] == 1.0
        assert out.loc[2, "coef"] == 1.0
        assert out.loc[3, "coef"] == 1.0
        assert out.loc[4, "coef"] == 0.5
        assert out.loc[4, "n_tri"] == 3 and out.loc[4, "degree"] == 4
        assert 9 not in out.index  # pendant: no triangles -> inner join drops
        # ordering: coef DESC then node ASC
        assert out.index.tolist() == [1, 2, 3, 4]


class TestLateEvents:
    def test_watermark_flags_exact(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import late_events

        t = pd.Timestamp("2026-01-01 10:00:00")
        m = pd.Timedelta(minutes=1)
        rows = pd.DataFrame(
            {
                # arrival order = event_id; user 1's third arrival has
                # event time 30 min behind the watermark
                "event_id": [1, 2, 3, 4, 5],
                "user_id": [1, 1, 1, 2, 2],
                "ts": [t, t + 60 * m, t + 30 * m, t, t - 120 * m],
            }
        )
        out = (
            late_events(ray.data.from_pandas(rows), lateness_seconds=600)
            .to_pandas()
            .sort_values("event_id")
        )
        # ev3: wm=11:00, ts=10:30 -> 30 min late > 10 min allowance.
        # ev5 belongs to user 2: wm=10:00, ts=08:00 -> late.
        # first arrivals (1, 4) never late; ev2 advances the watermark.
        assert out["is_late"].tolist() == [False, False, True, False, True]

    def test_boundary_is_not_late(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import late_events

        t = pd.Timestamp("2026-01-01 10:00:00")
        rows = pd.DataFrame(
            {
                "event_id": [1, 2],
                "user_id": [1, 1],
                # exactly lateness behind: strict < means NOT late
                "ts": [t, t - pd.Timedelta(seconds=600)],
            }
        )
        out = late_events(
            ray.data.from_pandas(rows), lateness_seconds=600
        ).to_pandas().sort_values("event_id")
        assert out["is_late"].tolist() == [False, False]


class TestScd2History:
    def test_collapses_runs_and_closes_intervals(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import scd2_history

        t = pd.Timestamp("2026-01-01")
        d = pd.Timedelta(days=1)
        rows = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                "user_id": [1, 1, 1, 1, 2],
                "event_type": ["view", "view", "buy", "view", "buy"],
                "ts": [t, t + d, t + 2 * d, t + 3 * d, t],
            }
        )
        out = (
            scd2_history(ray.data.from_pandas(rows))
            .to_pandas()
            .sort_values(["user_id", "effective_from"])
            .reset_index(drop=True)
        )
        sentinel = pd.Timestamp("2100-01-01")
        assert out["user_id"].tolist() == [1, 1, 1, 2]
        assert out["event_type"].tolist() == ["view", "buy", "view", "buy"]
        assert out["effective_from"].tolist() == [t, t + 2 * d, t + 3 * d, t]
        assert out["effective_to"].tolist() == [
            t + 2 * d, t + 3 * d, sentinel, sentinel,
        ]

    def test_ts_tie_breaks_by_event_id(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import scd2_history

        t = pd.Timestamp("2026-01-01")
        rows = pd.DataFrame(
            {
                "event_id": [2, 1],
                "user_id": [1, 1],
                "event_type": ["b", "a"],
                "ts": [t, t],  # tied: event_id order decides a -> b
            }
        )
        out = (
            scd2_history(ray.data.from_pandas(rows))
            .to_pandas()
            .sort_values("effective_to")
            .reset_index(drop=True)
        )
        assert out["event_type"].tolist() == ["a", "b"]
        assert out["effective_to"].iloc[0] == t  # a's interval is empty


class TestOovRate:
    def test_rate_against_planted_vocab(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import oov_rate

        # vocab_size=2 -> vocab = {'a', 'b'} (counts 3 and 2); 'z'/'q' OOV
        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["a a b", "a b z", "q"],
            }
        )
        out = (
            oov_rate(ray.data.from_pandas(df), vocab_size=2)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["n_tokens"].tolist() == [3, 3, 1]
        assert out["n_oov"].tolist() == [0, 1, 1]
        assert out["oov_rate"].tolist() == [0.0, 1 / 3, 1.0]


class TestSeqLenHistogram:
    def test_pow2_buckets(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import seq_len_histogram

        df = pd.DataFrame(
            {
                "doc_id": range(5),
                "text": ["", "one", "a b c", "w " * 8, "t " * 3000],
            }
        )
        out = (
            seq_len_histogram(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("bucket_lo")
        )
        got = dict(zip(out["bucket_lo"], out["n_docs"]))
        # 0 tokens -> 0; 1 -> 1; 3 -> 2; 8 -> 8; 3000 -> 2048 (open top)
        assert got == {0: 1, 1: 1, 2: 1, 8: 1, 2048: 1}


class TestTransitionCounts:
    def test_matches_pandas_lag(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import transition_counts

        rng = np.random.default_rng(7)
        n = 400
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.integers(0, 12, n).astype(np.int64),
                "ts": pd.Timestamp("2026-01-01")
                + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
                "event_type": rng.choice(list("abcd"), n),
            }
        )
        out = (
            transition_counts(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values(["prev_type", "next_type"])
            .reset_index(drop=True)
        )
        g = df.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id")["event_type"].shift()
        exp = (
            pd.DataFrame({"prev_type": prev, "next_type": g["event_type"]})
            .dropna()
            .groupby(["prev_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .sort_values(["prev_type", "next_type"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, exp.astype({"n": "int64"}))

    def test_transitions_cross_block_boundaries(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import transition_counts

        # one user whose events land in different input blocks: the
        # co-location shuffle must reunite them before the shift
        df = pd.DataFrame(
            {
                "event_id": [0, 1, 2, 3],
                "user_id": [9, 9, 9, 9],
                "ts": pd.date_range("2026-01-01", periods=4, freq="h"),
                "event_type": ["a", "b", "a", "b"],
            }
        )
        ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:]])
        out = transition_counts(ds).to_pandas()
        got = dict(zip(zip(out["prev_type"], out["next_type"]), out["n"]))
        assert got == {("a", "b"): 2, ("b", "a"): 1}


class TestGroupedEntropy:
    def test_uniform_and_degenerate(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import grouped_entropy

        df = pd.DataFrame(
            {
                "user_id": [1] * 4 + [2] * 3,
                "event_type": ["a", "b", "c", "d", "x", "x", "x"],
            }
        )
        out = (
            grouped_entropy(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("user_id")
        )
        assert out.loc[1, "entropy_bits"] == 2.0  # uniform over 4
        ent2 = out.loc[2, "entropy_bits"]
        # single category: exactly +0.0, never -0.0
        assert ent2 == 0.0 and not np.signbit(ent2)
        assert out["n_events"].sort_index().tolist() == [4, 3]


class TestConversionLag:
    def test_first_purchase_after_first_view(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import conversion_lag

        t = pd.Timestamp("2026-01-01 10:00:00")
        s = pd.Timedelta(seconds=1)
        df = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2, 2, 3],
                "event_type": [
                    "purchase",  # before the first view: must not count
                    "view",
                    "purchase",
                    "view",
                    "click",
                    "purchase",  # user 3 never views: dropped
                ],
                "ts": [t - 50 * s, t, t + 90 * s, t, t + 5 * s, t],
            }
        )
        out = conversion_lag(ray.data.from_pandas(df)).to_pandas()
        assert out.set_index("user_id")["lag_s"].to_dict() == {1: 90}

    def test_purchase_at_view_instant_counts(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import conversion_lag

        t = pd.Timestamp("2026-01-01")
        df = pd.DataFrame(
            {
                "user_id": [5, 5],
                "event_type": ["view", "purchase"],
                "ts": [t, t],  # ts >= fmin is inclusive
            }
        )
        out = conversion_lag(ray.data.from_pandas(df)).to_pandas()
        assert out["lag_s"].tolist() == [0]


class TestContainmentPairs:
    def _oracle(self, df):
        import hashlib

        from pdf_parser_ray.ops.dedup import _word_ngrams

        sets_, anchors = {}, {}
        for d, t in zip(df["doc_id"], df["text"]):
            grams = _word_ngrams(t, 3)
            if not grams:
                continue
            h = {int(hashlib.md5(g.encode()).hexdigest()[:16], 16) for g in grams}
            sets_[d], anchors[d] = h, min(h)
        rows = []
        ids = sorted(sets_)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if anchors[a] == anchors[b]:
                    rows.append((a, b, len(sets_[a] & sets_[b]) / len(sets_[a])))
        return sorted(rows)

    def test_matches_python_oracle_with_planted_dups(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import containment_pairs

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = pd.DataFrame(
            {
                "doc_id": range(6),
                "text": [
                    base,
                    base,                       # exact dup -> containment 1.0
                    base + " extra tail words",  # superset
                    "totally different content here now",
                    base,                        # triple
                    "",                          # empty: excluded
                ],
            }
        )
        out = containment_pairs(ray.data.from_pandas(df)).to_pandas()
        got = sorted(zip(out["a"], out["b"], out["containment"]))
        assert got == self._oracle(df)
        full = {(a, b): c for a, b, c in got}
        assert full[(0, 1)] == 1.0 and full[(0, 4)] == 1.0
        # the superset pair appears iff the shared region holds the min
        # shingle of BOTH docs; when it does, containment of 0 in 2 is 1.0
        if (0, 2) in full:
            assert full[(0, 2)] == 1.0


class TestCmsTopK:
    def test_never_undercounts_and_finds_heavy_hitter(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import cms_top_k

        rng = np.random.default_rng(3)
        vals = np.concatenate(
            [np.full(500, 7), rng.integers(100, 140, 800)]
        ).astype(np.int64)
        df = pd.DataFrame({"user_id": vals})
        out = cms_top_k(ray.data.from_pandas(df), "user_id", k=5)
        exact = df["user_id"].value_counts()
        assert out.iloc[0]["user_id"] == 7
        for _, r in out.iterrows():
            assert r["est_n"] >= exact[r["user_id"]]  # CMS never undercounts
        # 41 distinct values in 1024-wide rows: collisions are possible in
        # one row but min-over-4-rows recovers the exact count here
        assert out.iloc[0]["est_n"] == 500


class TestHardNegatives:
    def test_same_label_excluded(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.similarity import hard_negatives

        # anchor 0 (label A): nearest vector 1 shares the label -> must
        # be skipped; vectors 2/3 (label B) are the admissible negatives
        emb = pd.DataFrame(
            {
                "vec_id": [0, 1, 2, 3],
                "embedding": [
                    [1.0, 0.0], [0.99, 0.1], [0.8, 0.6], [0.0, 1.0],
                ],
                "label": ["A", "A", "B", "B"],
            }
        )
        out = hard_negatives(
            ray.data.from_pandas(emb), emb[emb["vec_id"] == 0], k=2
        )
        assert out["anchor_id"].unique().tolist() == [0]
        assert out["vec_id"].tolist() == [2, 3]  # cosine order among label B
        assert out["cosine"].is_monotonic_decreasing


class TestSessionSpans:
    def test_islands_and_durations(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import session_spans

        t = pd.Timestamp("2026-01-01 00:00:00")
        m = pd.Timedelta(minutes=1)
        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                "user_id": [1, 1, 1, 1, 2],
                # user 1: [0, 10] then a 40-min gap -> new session [50, 55]
                "ts": [t, t + 10 * m, t + 50 * m, t + 55 * m, t],
            }
        )
        out = (
            session_spans(ray.data.from_pandas(df), gap_seconds=1800)
            .to_pandas()
            .sort_values(["user_id", "session_idx"])
            .reset_index(drop=True)
        )
        assert out["n_events"].tolist() == [2, 2, 1]
        assert out["duration_s"].tolist() == [600, 300, 0]
        assert out["session_idx"].tolist() == [1, 2, 1]

    def test_gap_boundary_exclusive(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import session_spans

        t = pd.Timestamp("2026-01-01")
        df = pd.DataFrame(
            {
                "event_id": [1, 2],
                "user_id": [1, 1],
                "ts": [t, t + pd.Timedelta(seconds=1800)],  # gap == 1800: same
            }
        )
        out = session_spans(ray.data.from_pandas(df)).to_pandas()
        assert len(out) == 1 and out["n_events"].iloc[0] == 2


class TestUserAcquisition:
    def test_first_event_day_only(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import user_acquisition

        df = pd.DataFrame(
            {
                "user_id": [1, 1, 2, 3, 3],
                "ts": pd.to_datetime(
                    ["2026-01-01 05:00", "2026-01-03 07:00",  # u1: day 1
                     "2026-01-02 09:00",                        # u2: day 2
                     "2026-01-02 01:00", "2026-01-02 02:00"]    # u3: day 2
                ),
            }
        )
        out = user_acquisition(ray.data.from_pandas(df))
        assert out["n_new"].tolist() == [1, 2]
        assert out["cum_users"].tolist() == [1, 3]
        assert out["day"].dt.day.tolist() == [1, 2]


class TestSourceKl:
    def test_identical_sources_have_equal_low_kl(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import source_kl

        df = pd.DataFrame(
            {
                "source": ["a"] * 3 + ["b"] * 3 + ["c"] * 3,
                "text": ["tok tok tok"] * 6
                + ["zig zag zog completely different words here"] * 3,
            }
        )
        out = source_kl(ray.data.from_pandas(df)).set_index("source")
        # a and b share an identical distribution -> identical KL
        assert out.loc["a", "kl_bits"] == out.loc["b", "kl_bits"]
        # the divergent source sits strictly farther from the corpus
        assert out.loc["c", "kl_bits"] > out.loc["a", "kl_bits"]
        assert (out["kl_bits"] >= 0).all()


class TestGroupedMad:
    def test_matches_numpy_median_of_deviations(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.quantiles import grouped_mad

        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "event_type": rng.choice(["x", "y"], 501),
                "value": rng.normal(100, 20, 501),
            }
        )
        out = grouped_mad(
            ray.data.from_pandas(df), "event_type", "value"
        ).set_index("event_type")
        for t, g in df.groupby("event_type")["value"]:
            v = np.sort(g.to_numpy())
            med = v[max(0, int(np.ceil(0.5 * len(v))) - 1)]  # quantile_disc
            dev = np.sort(np.abs(g.to_numpy() - med))
            mad = dev[max(0, int(np.ceil(0.5 * len(dev))) - 1)]
            assert out.loc[t, "med"] == med
            assert out.loc[t, "mad"] == mad

    def test_outlier_robustness(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.quantiles import grouped_mad

        vals = [10.0] * 9 + [10_000.0]  # one wild outlier
        df = pd.DataFrame({"event_type": ["a"] * 10, "value": vals})
        out = grouped_mad(ray.data.from_pandas(df), "event_type", "value")
        assert out["med"].iloc[0] == 10.0 and out["mad"].iloc[0] == 0.0


class TestRareTokenPairs:
    def test_rare_anchor_blocks_and_scores(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import rare_token_pairs

        # df: unusualword/cat/sat/mat/today = 2; hill/dog/ran/over = 1.
        # docs 0 and 1: every token df=2 -> anchor = min token 'cat',
        # shared.  doc 2's rarest is its own df-1 token -> isolated.
        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "unusualword cat sat mat",
                    "unusualword cat sat mat today",
                    "today hill dog ran over",
                ],
            }
        )
        out = rare_token_pairs(
            ray.data.from_pandas(df), threshold=0.3
        ).to_pandas()
        assert {(a, b) for a, b in zip(out["a"], out["b"])} == {(0, 1)}
        assert out["jaccard"].iloc[0] == 4 / 5

    def test_threshold_filters(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import rare_token_pairs

        df = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["rare alpha beta gamma", "rare zeta eta theta"],
            }
        )
        # shared anchor 'rare' (or any df-2 tie) but jaccard 1/7 < 0.5
        out = rare_token_pairs(ray.data.from_pandas(df)).to_pandas()
        assert len(out) == 0

    def test_broadcast_and_colo_routes_agree(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import rare_token_pairs

        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(30)] + ["rareone", "raretwo"]
        texts = [
            " ".join(rng.choice(vocab[:30], 12)) for _ in range(40)
        ]
        # planted dup pair sharing the df-2 anchor 'rareone' (all their
        # other tokens also occur in doc 3, so df >= 3 there)
        texts[7] = texts[3] + " rareone"
        texts[9] = texts[3] + " rareone"
        df = pd.DataFrame({"doc_id": range(40), "text": texts})

        def run(mode):
            return (
                rare_token_pairs(
                    ray.data.from_pandas(df), threshold=0.4, mode=mode
                )
                .to_pandas()
                .sort_values(["a", "b"])
                .reset_index(drop=True)
            )

        bro, colo = run("broadcast"), run("colo")
        pd.testing.assert_frame_equal(bro, colo)
        pairs = set(zip(bro["a"], bro["b"]))
        assert (7, 9) in pairs

    def test_vocab_limit_guard(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import rare_token_pairs

        df = pd.DataFrame(
            {"doc_id": [0], "text": ["a b c d e f g h"]}
        )
        with pytest.raises(ValueError, match="vocab_limit"):
            rare_token_pairs(
                ray.data.from_pandas(df), vocab_limit=3
            ).to_pandas()


class TestPathTrigrams:
    def test_matches_pandas_double_lag(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import path_trigrams

        rng = np.random.default_rng(13)
        n = 300
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.integers(0, 9, n).astype(np.int64),
                "ts": pd.Timestamp("2026-01-01")
                + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
                "event_type": rng.choice(list("abc"), n),
            }
        )
        out = (
            path_trigrams(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values(["t1", "t2", "t3"])
            .reset_index(drop=True)
        )
        g = df.sort_values(["user_id", "ts", "event_id"])
        by = g.groupby("user_id")["event_type"]
        exp = (
            pd.DataFrame(
                {"t1": by.shift(2), "t2": by.shift(1), "t3": g["event_type"]}
            )
            .dropna()
            .groupby(["t1", "t2", "t3"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .sort_values(["t1", "t2", "t3"])
            .reset_index(drop=True)
            .astype({"n": "int64"})
        )
        pd.testing.assert_frame_equal(out, exp)


class TestGapQuantiles:
    def test_same_type_gaps_only(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import gap_quantiles

        t = pd.Timestamp("2026-01-01")
        s = pd.Timedelta(seconds=1)
        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [1, 1, 1, 1],
                # clicks at 0 and 10s (gap 10); the view between them
                # must NOT split the click stream
                "event_type": ["click", "view", "click", "click"],
                "ts": [t, t + 3 * s, t + 10 * s, t + 14 * s],
            }
        )
        out = gap_quantiles(ray.data.from_pandas(df)).set_index("event_type")
        assert out.loc["click", "p50_gap_s"] == 4.0   # gaps {10, 4} -> p50=4
        assert out.loc["click", "p90_gap_s"] == 10.0
        assert "view" not in out.index  # single event: no gap row


class TestMadOutliersQuery:
    def test_gate_matches_fit(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from pdf_parser_ray.queries import q_event_mad, q_mad_outliers

        # reuse the real sf0.001 fixture tables
        sf = "/root/testdata/sf0.001"
        fit = q_event_mad(sf).set_index("event_type")
        out = q_mad_outliers(sf).set_index("event_type")
        ev = pq.read_table(f"{sf}/events.parquet",
                           columns=["event_type", "value"]).to_pandas()
        for t, g in ev.groupby("event_type")["value"]:
            med, mad = fit.loc[t, "med"], fit.loc[t, "mad"]
            exp = int(((g - med).abs() > 3.0 * mad).sum())
            assert out.loc[t, "n_outliers"] == exp
            assert out.loc[t, "n_events"] == len(g)


class TestContainmentSurvivors:
    def test_drops_larger_of_contained_pair(self, ray_session):
        import ray.data

        from pdf_parser_ray.queries import QUERIES  # noqa: F401  (registry import)
        from pdf_parser_ray.ops.dedup import containment_pairs

        base = "alpha beta gamma delta epsilon zeta eta theta"
        df = pd.DataFrame(
            {"doc_id": [0, 1, 2], "text": [base, base, "unrelated words here"]}
        )
        pairs = containment_pairs(ray.data.from_pandas(df)).to_pandas()
        # sanity for the survivor rule this query applies
        assert ((pairs["a"] == 0) & (pairs["b"] == 1)).any()
        assert pairs.set_index(["a", "b"]).loc[(0, 1), "containment"] == 1.0


class TestLastTouchAttribution:
    def test_credits_most_recent_non_target(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import last_touch_attribution

        t = pd.Timestamp("2026-01-01")
        s = pd.Timedelta(seconds=1)
        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6],
                "user_id": [1, 1, 1, 2, 2, 3],
                "event_type": [
                    "view", "click", "purchase",   # u1 -> click
                    "purchase", "purchase",        # u2 -> none, none
                    "purchase",                    # u3 -> none
                ],
                "ts": [t, t + s, t + 2 * s, t, t + s, t],
            }
        )
        out = last_touch_attribution(ray.data.from_pandas(df)).to_pandas()
        got = dict(zip(out["attributed_type"], out["n"]))
        assert got == {"click": 1, "none": 3}

    def test_purchase_never_credits_purchase(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import last_touch_attribution

        t = pd.Timestamp("2026-01-01")
        s = pd.Timedelta(seconds=1)
        df = pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "user_id": [1, 1, 1],
                "event_type": ["view", "purchase", "purchase"],
                "ts": [t, t + s, t + 2 * s],  # 2nd purchase skips the 1st
            }
        )
        out = last_touch_attribution(ray.data.from_pandas(df)).to_pandas()
        assert dict(zip(out["attributed_type"], out["n"])) == {"view": 2}


class TestSplitContamination:
    def test_counts_leaked_eval_docs(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import _split_of, split_contamination

        # find ids for each split under the real gate
        train_id = next(i for i in range(1000) if _split_of(i) == "train")
        val_id = next(i for i in range(1000) if _split_of(i) == "val")
        test_id = next(i for i in range(1000) if _split_of(i) == "test")
        val_id2 = next(
            i for i in range(val_id + 1, 2000) if _split_of(i) == "val"
        )
        leaked = "one two three four five six seven eight nine"
        df = pd.DataFrame(
            {
                "doc_id": [train_id, val_id, test_id, val_id2],
                "text": [
                    leaked,                       # train source
                    leaked + " trailing words",   # val: shares the 8-gram
                    "completely different content with no overlap at all ok",
                    "short doc",                  # < 8 tokens: no grams
                ],
            }
        )
        out = (
            split_contamination(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("split")
        )
        assert out.loc["val", "n_contaminated"] == 1
        assert out.loc["val", "n_docs"] == 2
        assert out.loc["test", "n_contaminated"] == 0
        assert out.loc["test", "n_docs"] == 1


class TestHourlyProfile:
    def test_exact_cents_mean(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import hourly_profile

        df = pd.DataFrame(
            {
                "event_type": ["a", "a", "a", "b"],
                "ts": pd.to_datetime(
                    ["2026-01-01 09:10", "2026-01-01 09:50",
                     "2026-01-01 10:00", "2026-01-01 09:00"]
                ),
                "value": [1.01, 2.02, 5.00, 7.77],
            }
        )
        out = hourly_profile(ray.data.from_pandas(df)).to_pandas()
        out = out.set_index(["event_type", "hour"])
        assert out.loc[("a", 9), "n"] == 2
        assert out.loc[("a", 9), "avg_value"] == (101 + 202) / 200.0
        assert out.loc[("b", 9), "avg_value"] == 7.77


class TestMaxStreaks:
    def test_longest_run_and_tiebreak(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import max_streaks

        t = pd.Timestamp("2026-01-01")
        s = pd.Timedelta(seconds=1)
        df = pd.DataFrame(
            {
                "event_id": range(7),
                "user_id": [1, 1, 1, 1, 1, 2, 2],
                # u1: a a b b c  -> runs (a,2) (b,2) (c,1); tie a vs b -> a
                "event_type": ["a", "a", "b", "b", "c", "z", "z"],
                "ts": [t + i * s for i in range(7)],
            }
        )
        out = (
            max_streaks(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("user_id")
        )
        assert out.loc[1, "streak_type"] == "a" and out.loc[1, "streak_len"] == 2
        assert out.loc[2, "streak_type"] == "z" and out.loc[2, "streak_len"] == 2

    def test_runs_do_not_cross_users(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import max_streaks

        t = pd.Timestamp("2026-01-01")
        df = pd.DataFrame(
            {
                "event_id": [0, 1],
                "user_id": [1, 2],
                "event_type": ["a", "a"],  # same type, different users
                "ts": [t, t],
            }
        )
        out = max_streaks(ray.data.from_pandas(df)).to_pandas()
        assert out["streak_len"].tolist() == [1, 1]


class TestTypeBurstiness:
    def test_fano_from_moment_sums(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import type_burstiness

        # type 'a': hourly counts 3 and 1 -> mean 2, var 2, fano 1.0
        # type 'b': one window -> NaN fano
        ts = (
            [pd.Timestamp("2026-01-01 10:00")] * 3
            + [pd.Timestamp("2026-01-01 11:00")]
            + [pd.Timestamp("2026-01-01 09:30")]
        )
        df = pd.DataFrame(
            {"event_type": ["a"] * 4 + ["b"], "ts": ts}
        )
        out = type_burstiness(ray.data.from_pandas(df)).to_pandas()
        out = out.set_index("event_type")
        assert out.loc["a", "n_windows"] == 2
        assert out.loc["a", "mean_per_window"] == 2.0
        assert out.loc["a", "fano"] == 1.0
        assert np.isnan(out.loc["b", "fano"])


class TestGroupedKmvQuantiles:
    def test_small_groups_are_exact(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import grouped_kmv_quantiles

        # groups smaller than k: the "sample" is the full group, so the
        # nearest-rank pick equals the exact discrete quantile
        rng = np.random.default_rng(2)
        df = pd.DataFrame(
            {
                "event_id": np.arange(400, dtype=np.int64),
                "event_type": rng.choice(["p", "q"], 400),
                "value": rng.normal(50, 10, 400),
            }
        )
        out = grouped_kmv_quantiles(
            ray.data.from_pandas(df), "event_type", "value", [0.5],
            k=1024, id_col="event_id", hash_fn="md5",
        ).set_index("event_type")
        for t, g in df.groupby("event_type")["value"]:
            v = np.sort(g.to_numpy())
            exact = v[int(np.ceil(0.5 * len(v))) - 1]
            assert out.loc[t, "q50"] == exact


class TestApproxPctRank:
    def test_rank_accuracy_and_bounds(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import approx_pct_rank

        rng = np.random.default_rng(17)
        n = 2000
        df = pd.DataFrame(
            {"doc_id": np.arange(n, dtype=np.int64),
             "v": rng.normal(0, 1, n)}
        )
        out = approx_pct_rank(
            ray.data.from_pandas(df), "v", id_col="doc_id", k=512
        ).to_pandas()
        assert out["pct"].between(0.0, 1.0).all()
        # sample-CDF estimate within O(1/sqrt(k)) of the exact rank
        exact = df["v"].rank(method="max").to_numpy() / n
        got = out.sort_values("doc_id")["pct"].to_numpy()
        assert np.abs(got - exact).max() < 0.1  # ~2.3/sqrt(512)

    def test_sample_smaller_than_k_is_exact(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import approx_pct_rank

        df = pd.DataFrame(
            {"doc_id": [0, 1, 2, 3], "v": [10.0, 20.0, 30.0, 40.0]}
        )
        out = (
            approx_pct_rank(ray.data.from_pandas(df), "v",
                            id_col="doc_id", k=100)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["pct"].tolist() == [0.25, 0.5, 0.75, 1.0]


class TestSemdedup:
    def test_planted_near_dup_drops_larger_id(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import semdedup

        rng = np.random.default_rng(5)
        base = rng.normal(size=(6, 8))
        # vec 4 = vec 1 + tiny noise (same cluster, cosine ~1);
        # vec 5 orthogonal-ish
        base[4] = base[1] + 0.01 * rng.normal(size=8)
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": range(6), "embedding": [list(r) for r in base]}
            )
        )
        cents = base[:2]
        out = (
            semdedup(ds, cents, threshold=0.95)
            .to_pandas()
            .sort_values("vec_id")
        )
        kept = set(out["vec_id"])
        assert 1 in kept and 4 not in kept  # larger id of the pair drops
        assert len(kept) == 5

    def test_partitioning_invariance(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.dedup import semdedup

        rng = np.random.default_rng(11)
        mat = rng.normal(size=(40, 8))
        mat[30:] = mat[:10] + 0.001 * rng.normal(size=(10, 8))
        df = pd.DataFrame(
            {"vec_id": range(40), "embedding": [list(r) for r in mat]}
        )
        cents = mat[:4]
        a = (
            semdedup(ray.data.from_pandas(df), cents, threshold=0.9)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        b = (
            semdedup(
                ray.data.from_pandas(df).repartition(7), cents, threshold=0.9
            )
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        assert set(range(30, 40)).isdisjoint(set(a["vec_id"]))


class TestVocabOverlap:
    def test_shared_vocab_fraction(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import vocab_overlap

        # src a: tokens t0..t19; src b: t10..t29 -> true jaccard = 10/30
        docs = []
        docs.append(("a", " ".join(f"t{i}" for i in range(20))))
        docs.append(("b", " ".join(f"t{i}" for i in range(10, 30))))
        ds = ray.data.from_pandas(
            pd.DataFrame(docs, columns=["source", "text"])
        )
        out = vocab_overlap(ds, k=256)
        assert len(out) == 1
        row = out.iloc[0]
        # k > |union| -> the sketch IS the full set -> exact jaccard
        assert row["k_eff"] == 30 and row["n_common"] == 10
        assert abs(row["jaccard_est"] - 10 / 30) < 1e-12

    def test_sketch_bounded_at_k(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import vocab_overlap

        docs = [
            ("a", " ".join(f"w{i}" for i in range(500))),
            ("b", " ".join(f"w{i}" for i in range(250, 750))),
        ]
        out = vocab_overlap(
            ray.data.from_pandas(pd.DataFrame(docs, columns=["source", "text"])),
            k=64,
        )
        row = out.iloc[0]
        assert row["k_eff"] == 64
        # true jaccard = 250/750 = 1/3; KMV with k=64 should land nearby
        assert 0.15 < row["jaccard_est"] < 0.55


class TestTemperatureMix:
    def test_small_source_upweighted(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import temperature_mix

        df = pd.DataFrame(
            {
                "doc_id": range(1100),
                "source": ["big"] * 1000 + ["small"] * 100,
            }
        )
        out = (
            temperature_mix(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("source")
        )
        # alpha=1/2: keep-rate ratio small/big = sqrt(big/small) ~ 3.16x
        rate_big = out.loc["big", "n_kept"] / out.loc["big", "n_total"]
        rate_small = out.loc["small", "n_kept"] / out.loc["small", "n_total"]
        assert rate_small > 1.8 * rate_big
        total_kept = int(out["n_kept"].sum())
        assert 0.35 * 1100 < total_kept < 0.65 * 1100  # target ~ N/2

    def test_partitioning_invariance(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.curation import temperature_mix

        df = pd.DataFrame(
            {"doc_id": range(400), "source": [f"s{i % 3}" for i in range(400)]}
        )
        a = (
            temperature_mix(ray.data.from_pandas(df))
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        b = (
            temperature_mix(ray.data.from_pandas(df).repartition(9))
            .to_pandas().sort_values("source").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestGlobalValueRanks:
    def test_matches_pandas_and_partition_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.quantiles import global_value_ranks

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "event_id": np.arange(200, dtype=np.int64),
                "value": np.round(rng.uniform(0, 37, 200), 2),
            }
        )
        out = (
            global_value_ranks(
                ray.data.from_pandas(df), "value", "event_id",
                bucket_width=5.0, n_tiles=7,
            )
            .to_pandas()
            .sort_values("rnk")
            .reset_index(drop=True)
        )
        exp = df.sort_values(["value", "event_id"]).reset_index(drop=True)
        assert (out["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()
        assert (out["rnk"].to_numpy() == np.arange(1, 201)).all()
        # ntile rule: 200 = 7*28 + 4 -> first 4 tiles of 29, then 28
        sizes = out.groupby("tile").size()
        assert sizes.loc[1] == 29 and sizes.loc[5] == 28
        out2 = (
            global_value_ranks(
                ray.data.from_pandas(df).repartition(9), "value", "event_id",
                bucket_width=5.0, n_tiles=7,
            )
            .to_pandas().sort_values("rnk").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, out2)

    def test_fewer_rows_than_tiles(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.quantiles import global_value_ranks

        df = pd.DataFrame(
            {"event_id": [10, 20, 30], "value": [3.0, 1.0, 2.0]}
        )
        out = (
            global_value_ranks(
                ray.data.from_pandas(df), "value", "event_id", n_tiles=10
            )
            .to_pandas().sort_values("rnk").reset_index(drop=True)
        )
        assert list(out["tile"]) == [1, 2, 3]
        assert list(out["event_id"]) == [20, 30, 10]


class TestIntervalJoinPairs:
    def test_matches_bruteforce(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import interval_join_pairs

        rng = np.random.default_rng(9)
        n = 300
        base = pd.Timestamp("2024-01-01").value // 1000
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 5, n),
                "event_type": rng.choice(["view", "purchase", "click"], n),
                "ts": pd.to_datetime(
                    base + rng.integers(0, 86_400_000_000, n), unit="us"
                ),
            }
        )
        out = (
            interval_join_pairs(ray.data.from_pandas(df), window_s=3600)
            .to_pandas().set_index("user_id").sort_index()
        )
        # brute force
        us = df["ts"].astype("datetime64[us]").astype("int64")
        exp = {}
        for u in sorted(df["user_id"].unique()):
            g = df[df["user_id"] == u]
            f = us[g.index[g["event_type"] == "view"]].to_numpy()
            t = us[g.index[g["event_type"] == "purchase"]].to_numpy()
            pairs = [
                (tv, tp) for tv in f for tp in t
                if 0 <= tp - tv <= 3_600_000_000
            ]
            if pairs:
                exp[u] = (len(pairs), sum(tp - tv for tv, tp in pairs))
        assert dict(zip(out.index, zip(out["n_pairs"], out["lag_us_total"]))) \
            == {u: (n_, l_) for u, (n_, l_) in exp.items()}

    def test_partitioning_invariance(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import interval_join_pairs

        rng = np.random.default_rng(17)
        n = 500
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 40, n),
                "event_type": rng.choice(["view", "purchase"], n),
                "ts": pd.to_datetime(
                    rng.integers(0, 10**9, n) * 1000, unit="us"
                ),
            }
        )
        a = (
            interval_join_pairs(ray.data.from_pandas(df))
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        b = (
            interval_join_pairs(ray.data.from_pandas(df).repartition(11))
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestCmsSelfjoinSize:
    def test_upper_bound_and_convergence(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.sketches import cms_selfjoin_size

        rng = np.random.default_rng(2)
        vals = rng.zipf(1.7, 4000) % 500
        ds = ray.data.from_pandas(pd.DataFrame({"k": vals}))
        exact = int((pd.Series(vals).value_counts() ** 2).sum())
        est_narrow = int(cms_selfjoin_size(ds, "k", width=64)["est"][0])
        est_wide = int(cms_selfjoin_size(ds, "k", width=4096)["est"][0])
        assert est_wide >= exact and est_narrow >= exact  # never undercounts
        assert est_wide - exact <= est_narrow - exact     # width tightens
        assert est_wide <= exact * 1.05                   # near-exact when wide


class TestGiniAndWeightedMedian:
    def test_gini_known_values(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.quantiles import gini_coefficient

        # perfectly equal -> 0
        eq = pd.DataFrame({"id": range(10), "v": [100.0] * 10})
        g0 = gini_coefficient(
            ray.data.from_pandas(eq), "v", "id", bucket_width=50.0
        ).to_pandas()
        assert abs(g0["gini"][0]) < 1e-12
        # one holder of everything among n -> (n-1)/n
        skew = pd.DataFrame(
            {"id": range(10), "v": [0.0] * 9 + [1000.0]}
        )
        g1 = gini_coefficient(
            ray.data.from_pandas(skew), "v", "id", bucket_width=50.0
        ).to_pandas()
        assert abs(g1["gini"][0] - 0.9) < 1e-12

    def test_weighted_median_matches_numpy(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.quantiles import weighted_median

        rng = np.random.default_rng(8)
        df = pd.DataFrame(
            {
                "v": np.round(rng.uniform(0, 90, 400), 2),
                "w": rng.integers(1, 9, 400),
            }
        )
        out = weighted_median(
            ray.data.from_pandas(df), "v", "w", bucket_width=7.0
        ).to_pandas()
        s = df.sort_values("v")
        cum = s["w"].cumsum().to_numpy()
        exp = float(s["v"].to_numpy()[np.searchsorted(2 * cum, cum[-1])])
        assert out["median"][0] == exp
        assert int(out["total_weight"][0]) == int(df["w"].sum())


class TestCusumChangepoint:
    def test_planted_level_shift_and_invariance(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import cusum_changepoint

        rng = np.random.default_rng(4)
        n = 400
        # level shift at event 200: mean jumps 10 -> 60 => max |cusum|
        # lands at the boundary
        vals = np.concatenate(
            [rng.uniform(9, 11, 200), rng.uniform(59, 61, 200)]
        ).round(2)
        df = pd.DataFrame(
            {
                "event_type": ["a"] * n,
                "ts": pd.to_datetime(np.arange(n) * 3_600_000_000, unit="us"),
                "value": vals,
                "event_id": np.arange(n, dtype=np.int64),
            }
        )
        out = cusum_changepoint(ray.data.from_pandas(df)).to_pandas()
        assert len(out) == 1
        # argmax of |cumsum(n*x - S)| is at the shift boundary (row 199)
        x = np.rint(vals * 100).astype(np.int64)
        d = n * x - x.sum()
        expect_i = int(np.abs(np.cumsum(d)).argmax())
        assert out["change_ts"][0] == df["ts"].iloc[expect_i]
        out2 = cusum_changepoint(
            ray.data.from_pandas(df).repartition(7)
        ).to_pandas()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), out2.reset_index(drop=True)
        )


class TestKmConversion:
    def test_censoring_and_survival(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.windows import km_conversion

        T = pd.Timestamp("2024-01-01")
        D = pd.Timedelta("1d")
        rows = [
            # A: signup day0, purchase day1 -> observed day 1
            {"user_id": 1, "ts": T, "event_type": "signup"},
            {"user_id": 1, "ts": T + D, "event_type": "purchase"},
            # B: signup day0, never purchases, last click day2 -> censored day 2
            {"user_id": 2, "ts": T, "event_type": "signup"},
            {"user_id": 2, "ts": T + 2 * D, "event_type": "click"},
            # C: purchase BEFORE signup only -> censored at signup day (day 0)
            {"user_id": 3, "ts": T - D, "event_type": "purchase"},
            {"user_id": 3, "ts": T, "event_type": "signup"},
            # D: no signup -> excluded entirely
            {"user_id": 4, "ts": T, "event_type": "purchase"},
        ]
        df = pd.DataFrame(rows)
        out = km_conversion(ray.data.from_pandas(df).repartition(3))
        # day 0: C censored (n=3, d=0, c=1) -> S=1.0
        # day 1: A converts (n=2, d=1)     -> S=0.5
        # day 2: B censored (n=1, d=0, c=1)-> S=0.5
        assert out["day"].tolist() == [0, 1, 2]
        assert out["n_risk"].tolist() == [3, 2, 1]
        assert out["n_events"].tolist() == [0, 1, 0]
        assert out["n_censored"].tolist() == [1, 0, 1]
        assert out["survival"].tolist() == [1.0, 0.5, 0.5]

    def test_all_convert_kills_curve(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.windows import km_conversion

        T = pd.Timestamp("2024-01-01")
        rows = []
        for u in (1, 2):
            rows.append({"user_id": u, "ts": T, "event_type": "signup"})
            rows.append({"user_id": u, "ts": T, "event_type": "purchase"})
        out = km_conversion(ray.data.from_pandas(pd.DataFrame(rows)))
        assert out["survival"].tolist() == [0.0]
        assert out["n_events"].tolist() == [2]


class TestJwLinkPairs:
    def test_kernel_textbook_values(self):
        from pdf_parser_ray.ops.dedup import _jaro_winkler as jw

        # the canonical Winkler example
        assert round(jw("martha", "marhta"), 6) == 0.961111
        assert jw("abc", "abc") == 1.0
        # DuckDB's empty-vs-empty rule (0.0, not 1.0) is mirrored
        assert jw("", "") == 0.0
        assert jw("abc", "") == 0.0
        assert jw("abc", "xyz") == 0.0

    def test_kernel_matches_duckdb_exactly(self):
        import random
        import string

        import duckdb

        from pdf_parser_ray.ops.dedup import _jaro_winkler as jw

        con = duckdb.connect()
        rng = random.Random(11)
        alphabet = string.ascii_lowercase + "  "
        for _ in range(500):
            a = "".join(rng.choices(alphabet, k=rng.randint(0, 12)))
            b = "".join(rng.choices(alphabet, k=rng.randint(0, 12)))
            exp = con.execute(
                "select jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            assert jw(a, b) == exp, (a, b)
        con.close()

    def test_blocked_pairs_end_to_end(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.dedup import jw_link_pairs

        df = pd.DataFrame(
            {"name": ["cold widget", "cold widgets", "cold bolt",
                      "hot widget", "cold widget", "solo thing"]}
        )
        out = (
            jw_link_pairs(ray.data.from_pandas(df), "name", threshold=0.8)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        # "hot widget" is in a different block despite high similarity;
        # duplicates collapse via the distinct pre-aggregate.
        pairs = set(zip(out["a"], out["b"]))
        assert ("cold widget", "cold widgets") in pairs
        assert all(a.split(" ")[0] == b.split(" ")[0] for a, b in pairs)
        assert (out["jw"] >= 0.8).all()


class TestEwmaDaily:
    def test_hand_weights(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.windows import ewma_daily

        rows = [
            {"event_type": "view", "ts": pd.Timestamp("2024-01-01"), "value": 1.0},
            {"event_type": "view", "ts": pd.Timestamp("2024-01-02"), "value": 3.0},
            # day 3 absent, day 4 present — absent day joins neither sum
            {"event_type": "view", "ts": pd.Timestamp("2024-01-04"), "value": 5.0},
        ]
        out = ewma_daily(ray.data.from_pandas(pd.DataFrame(rows)))
        out = out.sort_values("day").reset_index(drop=True)
        # day1: 100
        # day2: (100·2^14 + 300·2^15)/(2^14+2^15) = 700/3
        # day4: (100·2^12 + 300·2^13 + 500·2^15)/(2^12+2^13+2^15)
        assert out["ewma"][0] == 100.0
        assert abs(out["ewma"][1] - 700.0 / 3.0) < 1e-6
        w1, w2, w4 = 1 << 12, 1 << 13, 1 << 15
        exp = (100 * w1 + 300 * w2 + 500 * w4) / (w1 + w2 + w4)
        assert abs(out["ewma"][2] - exp) < 1e-6

    def test_window_truncates(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.windows import ewma_daily

        rows = [
            {"event_type": "x", "ts": pd.Timestamp("2024-01-01"), "value": 999.0},
            {"event_type": "x", "ts": pd.Timestamp("2024-03-01"), "value": 7.0},
        ]
        out = ewma_daily(ray.data.from_pandas(pd.DataFrame(rows)))
        late = out.sort_values("day").iloc[-1]
        assert late["ewma"] == 700.0  # the 60-day-old spike is outside the window


class TestZoneMapStats:
    def test_min_max_and_prune_flags(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.relational import zone_map_stats

        df = pd.DataFrame(
            {
                "k": [0, 1, 2, 1024, 1025, 2048],
                "ts": pd.to_datetime(
                    ["1994-06-01", "1994-07-01", "1994-08-01",
                     "1995-03-01", "1995-04-01", "1997-01-01"]
                ),
            }
        )
        out = (
            zone_map_stats(
                ray.data.from_pandas(df), "k", "ts",
                bucket_width=1024,
                prune_lo="1995-01-01", prune_hi="1996-01-01",
            )
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        assert out["bucket"].tolist() == [0, 1, 2]
        assert out["n_rows"].tolist() == [3, 2, 1]
        assert out["prunable"].tolist() == [1, 0, 1]
        assert out.loc[0, "lo"] == pd.Timestamp("1994-06-01")
        assert out.loc[0, "hi"] == pd.Timestamp("1994-08-01")


class TestZorderLayout:
    def test_morton_rectangles(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.relational import zorder_layout

        # bits=2, cell_shift=0, widths=1 → z is the plain 2-bit interleave:
        # (x=1,y=0) → z=0b10=2 ; (x=0,y=1) → z=1 ; (x=3,y=3) → z=0b1111=15.
        df = pd.DataFrame({"x": [1, 0, 3, 1], "y": [0, 1, 3, 0]})
        out = (
            zorder_layout(
                ray.data.from_pandas(df), "x", "y",
                x_width=1, y_width=1, bits=2, cell_shift=0,
            )
            .to_pandas()
            .sort_values("zbucket")
            .reset_index(drop=True)
        )
        assert out["zbucket"].tolist() == [1, 2, 15]
        assert out["n_rows"].tolist() == [1, 2, 1]
        # every bucket's rectangle is tight around its members
        row = out[out["zbucket"] == 2].iloc[0]
        assert (row["x_lo"], row["x_hi"], row["y_lo"], row["y_hi"]) == (1, 1, 0, 0)

    def test_cell_shift_coarsens(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.relational import zorder_layout

        df = pd.DataFrame({"x": list(range(16)), "y": [0] * 16})
        out = zorder_layout(
            ray.data.from_pandas(df), "x", "y",
            x_width=1, y_width=1, bits=4, cell_shift=4,
        ).to_pandas()
        # shifting 4 bits off an 8-bit z key leaves ≤2^4 buckets
        assert len(out) <= 16
        assert int(out["n_rows"].sum()) == 16


class TestGapfillDaily:
    def test_missing_days_appear_as_zero(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.windows import gapfill_daily

        rows = [
            {"event_type": "a", "ts": pd.Timestamp("2024-01-01"), "value": 1.5},
            {"event_type": "a", "ts": pd.Timestamp("2024-01-03"), "value": 2.0},
            {"event_type": "b", "ts": pd.Timestamp("2024-01-02"), "value": 0.25},
        ]
        out = gapfill_daily(ray.data.from_pandas(pd.DataFrame(rows)))
        # dense grid: 2 types × 3 days
        assert len(out) == 6
        a2 = out[(out["event_type"] == "a")
                 & (out["day"] == pd.Timestamp("2024-01-02"))].iloc[0]
        assert (a2["n_events"], a2["cents"]) == (0, 0)
        a1 = out[(out["event_type"] == "a")
                 & (out["day"] == pd.Timestamp("2024-01-01"))].iloc[0]
        assert (a1["n_events"], a1["cents"]) == (1, 150)
        # type b exists on the full global range, not just its own days
        assert (out["event_type"] == "b").sum() == 3


class TestDecayAttribution:
    def test_dyadic_bucket_weights(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.windows import decay_attribution

        t0 = pd.Timestamp("2024-01-01 12:00:00")
        rows = [
            {"user_id": 1, "event_type": "view", "ts": t0, "value": 0.0},
            # lag 10 min → bucket 0 (weight 8), 20 min → bucket 1 (4),
            # 50 min → bucket 3 (1), 70 min → outside the 1 h window.
            {"user_id": 1, "event_type": "purchase",
             "ts": t0 + pd.Timedelta(minutes=10), "value": 1.0},
            {"user_id": 1, "event_type": "purchase",
             "ts": t0 + pd.Timedelta(minutes=20), "value": 1.0},
            {"user_id": 1, "event_type": "purchase",
             "ts": t0 + pd.Timedelta(minutes=50), "value": 1.0},
            {"user_id": 1, "event_type": "purchase",
             "ts": t0 + pd.Timedelta(minutes=70), "value": 1.0},
            # a user with no views never appears
            {"user_id": 2, "event_type": "purchase", "ts": t0, "value": 9.9},
        ]
        out = decay_attribution(
            ray.data.from_pandas(pd.DataFrame(rows))
        ).to_pandas()
        assert out["user_id"].tolist() == [1]
        assert out["n_pairs"].tolist() == [3]
        assert out["credit_num"].tolist() == [8 * 100 + 4 * 100 + 1 * 100]

    def test_exact_window_boundary_excluded(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.windows import decay_attribution

        t0 = pd.Timestamp("2024-01-01")
        rows = [
            {"user_id": 7, "event_type": "view", "ts": t0, "value": 0.0},
            # lag exactly 3600 s → strict < window, excluded
            {"user_id": 7, "event_type": "purchase",
             "ts": t0 + pd.Timedelta(hours=1), "value": 5.0},
            # lag 0 → bucket 0, included
            {"user_id": 7, "event_type": "purchase", "ts": t0, "value": 2.0},
        ]
        out = decay_attribution(
            ray.data.from_pandas(pd.DataFrame(rows))
        ).to_pandas()
        assert out["n_pairs"].tolist() == [1]
        assert out["credit_num"].tolist() == [8 * 200]


class TestRollingDistinct:
    def test_overlapping_windows_share_members(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.windows import rolling_distinct

        rows = [
            # day 1: users 1,2 ; day 2: user 2 ; day 5: user 3
            {"user_id": 1, "ts": pd.Timestamp("2024-01-01 03:00")},
            {"user_id": 2, "ts": pd.Timestamp("2024-01-01 04:00")},
            {"user_id": 2, "ts": pd.Timestamp("2024-01-02 05:00")},
            {"user_id": 3, "ts": pd.Timestamp("2024-01-05")},
        ]
        out = (
            rolling_distinct(
                ray.data.from_pandas(pd.DataFrame(rows)), window_days=3
            )
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        # anchors only on observed days (1, 2, 5)
        assert out["day"].tolist() == [
            pd.Timestamp("2024-01-01"),
            pd.Timestamp("2024-01-02"),
            pd.Timestamp("2024-01-05"),
        ]
        # day1 window {1,2}; day2 window {1,2} (user 2 counted once);
        # day5 window (jan 3-5) sees only user 3
        assert out["n_users"].tolist() == [2, 2, 1]


class TestDailyNewReturning:
    def test_first_day_splits(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.windows import daily_new_returning

        rows = [
            {"user_id": 1, "ts": pd.Timestamp("2024-01-01 01:00")},
            {"user_id": 1, "ts": pd.Timestamp("2024-01-01 02:00")},  # dup day
            {"user_id": 1, "ts": pd.Timestamp("2024-01-02")},
            {"user_id": 2, "ts": pd.Timestamp("2024-01-02")},
        ]
        out = (
            daily_new_returning(ray.data.from_pandas(pd.DataFrame(rows)))
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        assert out["n_new"].tolist() == [1, 1]        # u1 on d1, u2 on d2
        assert out["n_returning"].tolist() == [0, 1]  # u1 returns on d2


class TestIncrementalViewMaintain:
    def test_deltas_apply_and_zero_groups_vanish(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.relational import incremental_view_maintain

        base = pd.DataFrame(
            {"g": ["a", "b", "c"], "n_rows": [2, 1, 3],
             "cents": [200, 50, 900]}
        )
        deltas = pd.DataFrame(
            {
                # a: +1 insert of 100 ; b: delete its only row → vanishes
                # c: value-only update (+25, count 0) ; d: fresh group
                "g": ["a", "b", "c", "d"],
                "n_rows": [1, -1, 0, 2],
                "cents": [100, -50, 25, 70],
            }
        )
        out = (
            incremental_view_maintain(
                ray.data.from_pandas(base),
                ray.data.from_pandas(deltas),
                group_cols=["g"],
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert out["g"].tolist() == ["a", "c", "d"]
        assert out["n_rows"].tolist() == [3, 3, 2]
        assert out["cents"].tolist() == [300, 925, 70]


class TestSStem:
    def test_rule_table(self):
        from pdf_parser_ray.ops.text_stats import s_stem

        cases = {
            "ponies": "pony",       # rule 1
            "ties": "ty",           # rule 1 (no exception)
            "movies": "movy",       # rule 1 fires blindly — documented
            "eies": "eie",          # rule-1 exception falls through to rule 2
            "tables": "table",      # rule 2
            "caresses": "caresse",  # rule 2 ('sses' not excepted)
            "shoes": "shoe",        # rule-2 exception falls THROUGH to rule 3
            "sees": "see",          # 'ees' blocked in rule 2, 's' after 'e'... rule 3: ends 'es'->'s' not us/ss -> drop
            "cats": "cat",          # rule 3
            "bus": "bus",           # rule-3 exception
            "glass": "glass",       # rule-3 exception (ss)
            "dog": "dog",           # no suffix
        }
        for raw, want in cases.items():
            got = s_stem(raw)
            assert got == want, (raw, got, want)

    def test_stem_vocab_rollup(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import stem_vocab

        df = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["cat cats CATS table tables", "cat glass bus"],
            }
        )
        out = (
            stem_vocab(ray.data.from_pandas(df))
            .to_pandas()
            .set_index("stem")
            .sort_index()
        )
        # 'cat','cats','CATS'(lowered) all stem to 'cat': 4 tokens, 2 types
        assert out.loc["cat", "n_tokens"] == 4
        assert out.loc["cat", "n_types"] == 2
        assert out.loc["table", "n_tokens"] == 2
        assert out.loc["table", "n_types"] == 2
        assert out.loc["glass", "n_tokens"] == 1
        assert out.loc["bus", "n_tokens"] == 1


class TestPeakConcurrency:
    def test_hand_worked(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import peak_concurrency

        # intervals: [0,10) [5,15) [9,12) overlap 3 at t=9; [12,20)
        # starts as 9-interval ends... half-open: at t=12, [9,12)
        # closes BEFORE [12,20) opens -> concurrency 2 there, not 3.
        df = pd.DataFrame(
            {"s": [0, 5, 9, 12], "e": [10, 15, 12, 20]}
        )
        out = peak_concurrency(ray.data.from_pandas(df), "s", "e")
        assert out["peak"].iloc[0] == 3
        assert out["at_us"].iloc[0] == 9

    def test_half_open_touching_intervals(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import peak_concurrency

        # back-to-back [0,5) [5,10): never concurrent
        df = pd.DataFrame({"s": [0, 5], "e": [5, 10]})
        out = peak_concurrency(ray.data.from_pandas(df), "s", "e")
        assert out["peak"].iloc[0] == 1
        assert out["at_us"].iloc[0] == 0

    def test_matches_serial_sweep(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import peak_concurrency

        rng = np.random.default_rng(17)
        s = rng.integers(0, 10_000, 3000).astype(np.int64)
        e = s + rng.integers(1, 500, 3000).astype(np.int64)
        df = pd.DataFrame({"s": s, "e": e})
        out = peak_concurrency(
            ray.data.from_pandas(df).repartition(8), "s", "e"
        )
        # serial reference sweep
        bounds = sorted(
            [(t, 1) for t in s] + [(t, -1) for t in e]
        )
        c = peak = 0
        at = None
        for t, d in bounds:
            c += d
            if c > peak:
                peak, at = c, t
        assert out["peak"].iloc[0] == peak
        assert out["at_us"].iloc[0] == at


class TestIntervalCoverage:
    def test_union_semantics(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import interval_coverage

        # [0,5)+[5,10) touch -> ONE run of 10; [20,25) separate
        df = pd.DataFrame({"s": [0, 5, 20], "e": [5, 10, 25]})
        out = interval_coverage(ray.data.from_pandas(df), "s", "e")
        assert out["covered_us"].iloc[0] == 15
        assert out["n_runs"].iloc[0] == 2

    def test_overlap_counts_once(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import interval_coverage

        df = pd.DataFrame({"s": [0, 2, 4], "e": [10, 6, 12]})
        out = interval_coverage(ray.data.from_pandas(df), "s", "e")
        assert out["covered_us"].iloc[0] == 12
        assert out["n_runs"].iloc[0] == 1

    def test_matches_serial_sweep(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import interval_coverage

        rng = np.random.default_rng(23)
        # sparse starts force empty histogram buckets (gap-fill path)
        s = np.sort(rng.choice(1_000_000, 800, replace=False)).astype(np.int64)
        e = s + rng.integers(1, 3000, 800).astype(np.int64)
        df = pd.DataFrame({"s": s, "e": e})
        out = interval_coverage(
            ray.data.from_pandas(df).repartition(7), "s", "e"
        )
        bounds = sorted(
            [(t, 1) for t in s] + [(t, -1) for t in e],
            key=lambda p: (p[0], -p[1]),
        )
        c = covered = runs = 0
        for (t, d), nxt in zip(bounds, bounds[1:] + [None]):
            if c == 0 and d > 0:
                runs += 1
            c += d
            if nxt is not None and c > 0:
                covered += nxt[0] - t
        assert out["covered_us"].iloc[0] == covered
        assert out["n_runs"].iloc[0] == runs


class TestSeasonalDecomposeDaily:
    def test_planted_weekly_pattern(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import seasonal_decompose_daily

        days = pd.date_range("2024-01-01", periods=70, freq="D")
        dow_effect = {0: 5.0, 1: 0, 2: 0, 3: 0, 4: 0, 5: -3.0, 6: -3.0}
        base = 100.0 + np.arange(70) * 0.5  # linear trend
        vals = [
            b + dow_effect[d.dayofweek] for b, d in zip(base, days)
        ]
        df = pd.DataFrame({"ts": days, "v": np.round(vals, 2)})
        out = seasonal_decompose_daily(
            ray.data.from_pandas(df).repartition(4), "ts", "v"
        )
        assert len(out) == 70 - 6  # centered 7-window edge rule
        # additive identity: value == trend + seasonal + resid (cents)
        recon = out["trend"] + out["seasonal"] + out["resid"]
        assert np.allclose(recon, out["value_cents"], atol=1e-6)
        # Monday's seasonal sits ~500 cents above the weekend's
        mon = out[out["day"].dt.dayofweek == 0]["seasonal"].iloc[0]
        sat = out[out["day"].dt.dayofweek == 5]["seasonal"].iloc[0]
        assert mon - sat > 600  # 5 - (-3) dollars = 800 cents planted
        # pure linear trend + exact weekly pattern -> tiny residuals
        assert np.abs(out["resid"]).max() < 60

    def test_short_series_empty(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.windows import seasonal_decompose_daily

        days = pd.date_range("2024-01-01", periods=5, freq="D")
        df = pd.DataFrame({"ts": days, "v": [1.0] * 5})
        out = seasonal_decompose_daily(ray.data.from_pandas(df), "ts", "v")
        assert len(out) == 0


class TestCharWindowHashes:
    def test_matches_serial_polynomial(self):
        """The vectorized wraparound kernel must equal the direct
        polynomial sum_j b[s+j] * B^(w-1-j) mod 2^64 — the definition
        the DuckDB twins spell out with precomputed powers."""
        import numpy as np

        from pdf_parser_ray.ops.dedup import _char_window_hashes

        rng = np.random.RandomState(17)
        B, M = 1000003, 1 << 64
        for n, w in [(0, 8), (5, 8), (8, 8), (9, 8), (64, 32), (200, 32)]:
            s = "".join(chr(rng.randint(32, 127)) for _ in range(n))
            got = _char_window_hashes(s, w)
            data = s.encode("utf-8")
            if n < w:
                assert len(got) == 0
                continue
            exp = [
                sum(data[st + j] * pow(B, w - 1 - j, M) for j in range(w)) % M
                for st in range(n - w + 1)
            ]
            assert [int(x) for x in got] == exp, (n, w)

    def test_merge_positions_islands(self):
        from pdf_parser_ray.ops.dedup import _merge_positions
        import numpy as np

        w = 10
        # touching (gap == w) chains; gap > w breaks
        pos = np.array([0, 5, 15, 40, 50, 61])
        assert _merge_positions(pos, w) == [(0, 25), (40, 60), (61, 71)]
        assert _merge_positions(np.array([], dtype=int), w) == []
        assert _merge_positions(np.array([3]), w) == [(3, 13)]
