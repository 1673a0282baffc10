"""Webtext-curation operator tests: passage dedup, repetition stats,
PII redaction (fixtures with real emails/phones — the driver corpus has
none), stratified hash sampling."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data


def _ds(rows, columns):
    return ray.data.from_pandas(pd.DataFrame(rows, columns=columns))


class TestPassageDedup:
    def test_removes_hot_passages_and_drops_empty_docs(self, ray_session):
        from pdf_parser_ray.ops.webtext import passage_dedup

        # 'x y' appears in 5 docs -> hot at max_repeats=5; doc 4 is
        # nothing but the hot passage -> dropped entirely.
        rows = [
            (0, "x y a b"),
            (1, "x y c d"),
            (2, "x y e f"),
            (3, "x y g h"),
            (4, "x y"),
        ]
        out = (
            passage_dedup(
                _ds(rows, ["doc_id", "text"]), words_per_passage=2, max_repeats=5
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [0, 1, 2, 3]
        assert out["clean_text"].tolist() == ["a b", "c d", "e f", "g h"]

    def test_below_threshold_keeps_everything(self, ray_session):
        from pdf_parser_ray.ops.webtext import passage_dedup

        rows = [(0, "p q r s"), (1, "p q t u")]  # 'p q' ×2 < 3
        out = (
            passage_dedup(
                _ds(rows, ["doc_id", "text"]), words_per_passage=2, max_repeats=3
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["clean_text"].tolist() == ["p q r s", "p q t u"]

    def test_join_mode_matches_broadcast_mode(self, ray_session):
        # mode="join" is the no-broadcast scale path; outputs must be
        # identical to the default broadcast route
        from pdf_parser_ray.ops.webtext import passage_dedup

        rows = [
            (0, "x y a b"), (1, "x y c d"), (2, "x y e f"),
            (3, "x y g h"), (4, "x y"), (5, "u v w"),
        ]
        kw = dict(words_per_passage=2, max_repeats=5)
        b = (
            passage_dedup(_ds(rows, ["doc_id", "text"]), **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        j = (
            passage_dedup(_ds(rows, ["doc_id", "text"]), mode="join", **kw)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert b.equals(j)
        assert 4 not in set(b["doc_id"])  # all-hot doc dropped in both

    def test_tail_passage_shorter_than_window(self, ray_session):
        from pdf_parser_ray.ops.webtext import passage_dedup

        # odd word count -> final 1-word passage survives reassembly
        rows = [(0, "a b c")]
        out = passage_dedup(
            _ds(rows, ["doc_id", "text"]), words_per_passage=2, max_repeats=9
        ).to_pandas()
        assert out["clean_text"].tolist() == ["a b c"]


class TestRepetitionStats:
    def test_known_fractions(self, ray_session):
        from pdf_parser_ray.ops.webtext import repetition_stats

        rows = [(0, "a a a b"), (1, "u v w x")]
        out = (
            repetition_stats(_ds(rows, ["doc_id", "text"]))
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "n_words"] == 4 and out.loc[0, "n_distinct"] == 2
        assert out.loc[0, "dup_frac"] == 0.5 and out.loc[0, "top_frac"] == 0.75
        assert out.loc[1, "dup_frac"] == 0.0 and out.loc[1, "top_frac"] == 0.25

    def test_empty_text_counts_one_empty_token(self, ray_session):
        # str.split(' ') on '' -> [''] — pinned to match SQL string_split
        from pdf_parser_ray.ops.webtext import repetition_stats

        out = repetition_stats(_ds([(0, "")], ["doc_id", "text"])).to_pandas()
        assert out.loc[0, "n_words"] == 1 and out.loc[0, "n_distinct"] == 1


class TestPiiRedact:
    def test_emails_and_phones(self, ray_session):
        from pdf_parser_ray.ops.webtext import pii_redact

        rows = [
            (0, "mail bob.smith+x@corp.example.org or call +1 (555) 123-4567 now"),
            (1, "two mails: a@b.co c@d.io"),
            (2, "no pii here"),
        ]
        out = (
            pii_redact(_ds(rows, ["doc_id", "text"])).to_pandas().set_index("doc_id")
        )
        assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_phones"] == 1
        assert out.loc[0, "clean_text"] == "mail [EMAIL] or call [PHONE] now"
        assert out.loc[1, "n_emails"] == 2
        assert out.loc[1, "clean_text"] == "two mails: [EMAIL] [EMAIL]"
        assert out.loc[2, "clean_text"] == "no pii here"
        assert out.loc[2, "n_emails"] == 0 and out.loc[2, "n_phones"] == 0

    def test_email_redacted_before_phone_scan(self, ray_session):
        # digits inside an email must not double-count as a phone
        from pdf_parser_ray.ops.webtext import pii_redact

        rows = [(0, "reach 12345678@numeric-domain.com today")]
        out = pii_redact(_ds(rows, ["doc_id", "text"])).to_pandas()
        assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_phones"] == 0
        assert out.loc[0, "clean_text"] == "reach [EMAIL] today"


class TestTokenPostings:
    def test_doc_freq_and_range(self, ray_session):
        from pdf_parser_ray.ops.text_stats import token_postings

        rows = [(1, "A a b"), (2, "b c"), (3, "")]
        out = (
            token_postings(_ds(rows, ["doc_id", "text"]))
            .to_pandas()
            .set_index("token")
        )
        # 'A' lowers into 'a'; within-doc repeats count once
        assert out.loc["a", "doc_freq"] == 1
        assert out.loc["b", "doc_freq"] == 2
        assert out.loc["b", "min_doc"] == 1 and out.loc["b", "max_doc"] == 2
        assert len(out) == 3  # empty doc contributes nothing


class TestDocFamiliarity:
    def test_sum_of_global_counts(self, ray_session):
        from pdf_parser_ray.ops.text_stats import doc_familiarity

        rows = [(1, "a a b"), (2, "b c"), (3, "")]
        out = (
            doc_familiarity(_ds(rows, ["doc_id", "text"]))
            .to_pandas()
            .set_index("doc_id")
        )
        # global: a=2, b=2, c=1 → doc1 = 2+2+2, doc2 = 2+1
        assert out.loc[1, "familiarity"] == 6 and out.loc[1, "n_tokens"] == 3
        assert out.loc[2, "familiarity"] == 3 and out.loc[2, "n_tokens"] == 2
        assert 3 not in out.index  # token-less docs drop (inner-join semantics)

    def test_join_mode_matches_broadcast_mode(self, ray_session):
        from pdf_parser_ray.ops.text_stats import doc_familiarity

        rows = [(1, "a a b"), (2, "b c"), (3, ""), (4, "c c c a")]
        ds = _ds(rows, ["doc_id", "text"])
        b = (
            doc_familiarity(ds).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        j = (
            doc_familiarity(ds, mode="join").to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(b, j[b.columns])


class TestStratifiedSample:
    def test_threshold_gate_matches_manual_md5(self, ray_session):
        from pdf_parser_ray.ops.webtext import stratified_sample

        rows = [(i, "en" if i % 2 == 0 else "de") for i in range(200)]
        out = stratified_sample(
            _ds(rows, ["doc_id", "lang"]), {"en": "80"}, default_hex="20"
        ).to_pandas()
        expected = {
            i
            for i, lang in rows
            if hashlib.md5(str(i).encode()).hexdigest()[:2]
            < ("80" if lang == "en" else "20")
        }
        assert set(out["doc_id"]) == expected
        assert len(expected) > 0

    def test_deterministic_across_runs(self, ray_session):
        from pdf_parser_ray.ops.webtext import stratified_sample

        rows = [(i, "en") for i in range(100)]
        a = stratified_sample(_ds(rows, ["doc_id", "lang"]), {"en": "40"}).to_pandas()
        b = stratified_sample(_ds(rows, ["doc_id", "lang"]), {"en": "40"}).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])


class TestPerGroupCap:
    def test_cap_picks_first_k_by_order(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.webtext import per_group_cap

        # group 'a': 7 rows, 'b': 2 rows (smaller than k), shuffled ids
        df = pd.DataFrame(
            {
                "source": ["a"] * 7 + ["b"] * 2,
                "doc_id": [13, 5, 9, 1, 30, 2, 21, 100, 50],
            }
        ).sample(frac=1.0, random_state=3)
        ds = ray.data.from_pandas(df).repartition(4)
        out = (
            per_group_cap(ds, 3, group_col="source", order_cols=("doc_id",))
            .to_pandas()
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )
        want = pd.DataFrame(
            {"source": ["a", "a", "a", "b", "b"], "doc_id": [1, 2, 5, 50, 100]}
        )
        pd.testing.assert_frame_equal(out, want)


class TestWeightedSampleTopk:
    def test_partition_invariant_and_weight_biased(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.webtext import weighted_sample_topk

        n = 600
        df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64")})
        # second half gets 50x the weight
        df["w"] = np.where(df["doc_id"] >= n // 2, 50.0, 1.0)

        one = weighted_sample_topk(
            ray.data.from_pandas(df), 30, weight_col="w"
        ).to_pandas()
        many = weighted_sample_topk(
            ray.data.from_pandas([df.iloc[:100], df.iloc[100:350], df.iloc[350:]]),
            30, weight_col="w",
        ).to_pandas()

        # identical rows in identical order regardless of partitioning
        pd.testing.assert_frame_equal(one, many)
        assert len(one) == 30
        # keys ordered descending with id tie-break
        assert list(one["wkey"]) == sorted(one["wkey"], reverse=True)
        # the 50x-weighted half should dominate the sample
        assert (one["doc_id"] >= n // 2).sum() >= 25

    def test_pool_limit_trips_loudly(self, ray_session):
        """VERDICT r4 #8: the driver finish is a bounded limit+1 probe —
        a mis-sized k × batches pool raises instead of OOMing."""
        import pytest
        import ray.data

        from pdf_parser_ray.ops.webtext import weighted_sample_topk

        df = pd.DataFrame({"doc_id": np.arange(50, dtype="int64")})
        df["w"] = 1.0
        with pytest.raises(ValueError, match="pool_limit"):
            weighted_sample_topk(
                ray.data.from_pandas(df), 10, weight_col="w", pool_limit=3
            )


class TestCanonicalizeUrls:
    def test_pins_canonical_forms(self, ray_session):
        from pdf_parser_ray.ops.webtext import canonicalize_urls

        rows = [
            (0, "HTTP://Example3.COM:80/Path/7?utm_source=f&id=9&utm_campaign=x#frag"),
            (1, "https://A.com:443/"),
            (2, "https://a.com/x?b=2&a=1&fbclid=zz"),
            (3, "https://a.com/x?ref=home"),
            (4, "plainhost/path?a=1"),
            (5, "http://h.io:8080/keep-port"),
        ]
        out = (
            canonicalize_urls(_ds(rows, ["doc_id", "url"]))
            .to_pandas()
            .sort_values("doc_id")["canonical_url"]
            .tolist()
        )
        assert out == [
            "http://example3.com/Path/7?id=9",
            "https://a.com",          # default port + root slash stripped
            "https://a.com/x?a=1&b=2",  # tracking dropped, params sorted
            "https://a.com/x",        # all params tracking -> no '?'
            "plainhost/path?a=1",     # no scheme: generic cleanups only
            "http://h.io:8080/keep-port",  # non-default port kept
        ]


class TestRobotsFilter:
    def test_prefix_disallow(self, ray_session):
        from pdf_parser_ray.ops.webtext import robots_filter

        rules = pd.DataFrame(
            {"host": ["a.com", "b.com"], "path_prefix": ["/private", "/"]}
        )
        rows = [
            (0, "https://a.com/public/x"),
            (1, "https://a.com/private/x"),   # blocked (prefix)
            (2, "https://a.com/privateer"),   # blocked: prefix semantics
            (3, "https://b.com/anything"),    # blocked: disallow all
            (4, "https://c.com/private"),     # no rule for host
            (5, "noscheme/private"),          # schemeless: kept
        ]
        out = (
            robots_filter(
                _ds(rows, ["doc_id", "canonical_url"]), rules
            )
            .to_pandas()["doc_id"]
            .sort_values()
            .tolist()
        )
        assert out == [0, 4, 5]


class TestPageMetadata:
    def test_handcrafted_head_fields(self, ray_session):
        from pdf_parser_ray.html.meta import extract_metadata

        html = (
            b"<!DOCTYPE html><html><head><meta charset='utf-8'>"
            b"<title> My  <b>Page</b> </title>"
            b'<meta name="description" content="a short summary">'
            b'<meta content="OG TITLE" property="og:title">'
            b'<meta name="robots" content="NOINDEX, nofollow">'
            b'<link rel="canonical" href="https://example.org/canon">'
            b"</head><body><h1>Main Heading</h1><p>x</p></body></html>"
        )
        m = extract_metadata(html)
        assert m["title"] == "My Page"
        assert m["h1"] == "Main Heading"
        assert m["description"] == "a short summary"
        assert m["canonical"] == "https://example.org/canon"
        assert m["og_title"] == "OG TITLE"
        assert m["noindex"] is True
        empty = extract_metadata(b"%PDF-1.4 not html")
        assert empty["title"] is None and empty["noindex"] is False

    def test_duckdb_regexp_twin_on_corpus(self, ray_session):
        """Title extraction agrees with a DuckDB regexp twin per url."""
        import duckdb
        import ray.data

        from pdf_parser_ray.corpus import ensure_corpus
        from pdf_parser_ray.html.meta import page_metadata
        from pdf_parser_ray.pipelines import read_corpus

        corpus = ensure_corpus(300, seed=7)
        got = (
            page_metadata(read_corpus(corpus))
            .to_pandas()
            .set_index("url")["title"]
            .sort_index()
        )
        twin = duckdb.sql(
            f"""
            SELECT url,
                   nullif(trim(regexp_replace(regexp_extract(
                       CAST(html AS VARCHAR), '<title[^>]*>(.*?)</title',
                       1), '\\s+', ' ', 'g')), '') AS title
            FROM read_parquet('{corpus}/*.parquet') ORDER BY url
            """
        ).df().set_index("url")["title"]
        twin = twin.where(twin.notna(), None)
        assert (got.fillna("~") == twin.fillna("~")).all()


class TestMojibakeRepair:
    def test_repairs_and_leaves_clean_text_alone(self, ray_session):
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.webtext import fix_mojibake

        orig = "café — “quoted” naïve"
        moji = orig.encode("utf-8").decode("latin-1")
        df = pd.DataFrame(
            {"doc_id": [1, 2], "text": [moji, "plain ascii stays"]}
        )
        out = (
            fix_mojibake(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.loc[0, "text"] == orig
        assert out.loc[0, "n_suspicious"] > 0
        assert out.loc[0, "repair_rounds"] == 1
        assert out.loc[1, "text"] == "plain ascii stays"
        assert out.loc[1, "n_suspicious"] == 0

    def test_query_invariants(self, ray_session):
        from pdf_parser_ray.queries import QUERIES

        out = QUERIES["mojibake_repair"]("/root/testdata/sf0.001").to_pandas()
        assert out["roundtrip_ok"].all()
        corrupted = out[out["was_corrupted"]]
        assert len(corrupted) > 0
        assert (corrupted["n_suspicious"] > 0).all()
        assert (corrupted["repair_rounds"] == 1).all()
        clean = out[~out["was_corrupted"]]
        assert (clean["repair_rounds"] == 0).all()


class TestBlocklist:
    ROWS = [
        (0, "the slow brown fox"),          # slow
        (1, "BIG QUERY engines"),            # big query (case-insensitive)
        (2, "table table table stakes"),     # table table (overlapping runs)
        (3, "clean document here"),          # nothing
        (4, None),                           # null text -> nothing
        (5, "spark particle slowly"),        # spark part + slow (substring)
    ]

    def _run(self, mode):
        from pdf_parser_ray.ops.webtext import blocklist_hits

        pats = ["slow", "big query", "table table", "spark part", "zz-no"]
        out = (
            blocklist_hits(
                _ds(self.ROWS, ["doc_id", "text"]), pats, mode=mode
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return out

    def test_vector_route(self, ray_session):
        out = self._run("vector")
        assert out["n_block_hits"].tolist() == [1, 1, 1, 0, 0, 2]
        assert out["blocked"].tolist() == [True, True, True, False, False, True]

    def test_automaton_route_agrees(self, ray_session):
        vec = self._run("vector")
        ac = self._run("automaton")
        pd.testing.assert_frame_equal(vec, ac)

    def test_automaton_finds_pattern_inside_longer_match(self):
        # alternation regexes miss 'b' inside a consumed 'abc' match;
        # Aho-Corasick (output links via fail links) must not.
        from pdf_parser_ray.ops.webtext import AhoCorasick

        ac = AhoCorasick(["abc", "b"], case_sensitive=True)
        assert ac.seen_patterns("xabcy") == {0, 1}

    def test_doc_counts_keeps_zero_rows(self, ray_session):
        from pdf_parser_ray.ops.webtext import blocklist_doc_counts

        out = (
            blocklist_doc_counts(
                _ds(self.ROWS, ["doc_id", "text"]), ["slow", "zz-no"]
            )
            .to_pandas()
            .sort_values("pattern")
            .reset_index(drop=True)
        )
        assert out["pattern"].tolist() == ["slow", "zz-no"]
        assert out["n_docs"].tolist() == [2, 0]


class TestEntityTag:
    ROWS = [
        (0, "aaa"),                       # 'aa' overlaps itself: 0 and 1
        (1, "table table table stakes"),  # nested + repeated bigram
        (2, "Table case matters"),        # case-SENSITIVE: no hit
        (3, None),                        # null text -> nothing
    ]
    ENTS = ["aa", "table", "table table", "zz-no"]

    def _run(self, mode):
        from pdf_parser_ray.ops.webtext import entity_tag

        out = (
            entity_tag(_ds(self.ROWS, ["doc_id", "text"]), self.ENTS, mode=mode)
            .to_pandas()
            .sort_values(["doc_id", "entity", "start"])
            .reset_index(drop=True)
        )
        return out

    def test_offsets_overlapping_and_nested(self, ray_session):
        out = self._run("regex")
        got = list(
            out[["doc_id", "entity", "start", "stop"]].itertuples(index=False)
        )
        assert got == [
            (0, "aa", 0, 2),
            (0, "aa", 1, 3),             # lookahead keeps the overlap
            (1, "table", 0, 5),
            (1, "table", 6, 11),
            (1, "table", 12, 17),
            (1, "table table", 0, 11),   # nested bigram, both offsets
            (1, "table table", 6, 17),
        ]

    def test_automaton_route_agrees(self, ray_session):
        pd.testing.assert_frame_equal(self._run("regex"), self._run("automaton"))

    def test_iter_matches_emits_every_occurrence(self):
        from pdf_parser_ray.ops.webtext import AhoCorasick

        ac = AhoCorasick(["abc", "b", "bc"], case_sensitive=True)
        hits = sorted(ac.iter_matches("xabcb"))
        # pattern ids: 0='abc', 1='b', 2='bc'
        assert hits == [(0, 1), (1, 2), (1, 4), (2, 2)]

    def test_slice_roundtrip(self, ray_session):
        # [start, stop) must slice the original text back to the entity
        out = self._run("automaton")
        texts = dict(self.ROWS)
        for r in out.itertuples(index=False):
            assert texts[r.doc_id][r.start:r.stop] == r.entity


class TestRegisteredDomains:
    def test_etld_plus_one_rules(self, ray_session):
        from pdf_parser_ray.ops.webtext import registered_domains

        rows = [
            (0, "www.example.com"),      # subdomain strips
            (1, "example.com"),          # already registered
            (2, "a.b.example.com"),      # deep subdomain strips
            (3, "blog.site.co.uk"),      # multi-suffix keeps 3 labels
            (4, "site.co.uk"),           # exactly 3 labels w/ suffix
            (5, "localhost"),            # single label passes through
            (6, "co.uk"),                # bare suffix: 2 labels -> itself
        ]
        out = (
            registered_domains(_ds(rows, ["doc_id", "host"]))
            .to_pandas()
            .set_index("domain")["n_urls"]
            .to_dict()
        )
        assert out == {
            "example.com": 3,
            "site.co.uk": 2,
            "localhost": 1,
            "co.uk": 1,
        }


class TestDehyphenate:
    def test_join_rules(self, ray_session):
        from pdf_parser_ray.ops.webtext import dehyphenate

        rows = [
            (0, "exam-\nple text"),            # classic join
            (1, "state-\nOf the art"),          # uppercase: keep break
            (2, "multi-\nline hy-\nphens"),     # two joins in one doc
            (3, "no hyphens here"),             # nothing to do
            (4, None),                          # null -> empty, 0 joins
            (5, "trailing dash-\n"),            # no continuation: keep
            (6, "num-\n42 stays"),              # digit: keep break
        ]
        out = (
            dehyphenate(_ds(rows, ["doc_id", "text"]))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "text"] == "example text"
        assert out.loc[0, "n_joins"] == 1
        assert out.loc[1, "text"] == "state-\nOf the art"
        assert out.loc[1, "n_joins"] == 0
        assert out.loc[2, "text"] == "multiline hyphens"
        assert out.loc[2, "n_joins"] == 2
        assert out.loc[3, "n_joins"] == 0
        assert out.loc[4, "text"] == "" and out.loc[4, "n_joins"] == 0
        assert out.loc[5, "text"] == "trailing dash-\n"
        assert out.loc[6, "text"] == "num-\n42 stays"


class TestFilterFunnel:
    GOOD = (
        "the quick brown fox jumps over the lazy dog and then "
        "walks back home with a bone that it found near some gate "
        "while birds watch from above in the warm evening light ok"
    )  # 34 words, mean len in band, stopwords >=2, 'the' x3 <= 10%

    def _rows(self):
        rep = ("spam " * 20 + "the be to of and that have with " * 2).strip()
        return [
            (0, self.GOOD, "en", "s1"),                    # survives all
            (1, self.GOOD, "de", "s1"),                    # dies at lang
            (2, "too short text here", "en", "s1"),        # dies at gopher
            (3, rep, "en", "s2"),                          # dies at repetition
            (4, self.GOOD + " slow", "en", "s2"),          # dies at blocklist
            (5, None, "en", "s2"),                         # null text: gopher
        ]

    def test_attrition_stages(self, ray_session):
        from pdf_parser_ray.ops.webtext import filter_funnel

        out = (
            filter_funnel(
                _ds(self._rows(), ["doc_id", "text", "lang", "source"]),
                ["slow", "zz-no"],
            )
            .to_pandas()
            .set_index("source")
            .sort_index()
        )
        assert out.loc["s1"].tolist() == [3, 2, 1, 1, 1]
        assert out.loc["s2"].tolist() == [3, 3, 2, 1, 0]
        # monotone non-increasing across the cascade
        stages = ["n_docs", "n_lang", "n_gopher", "n_repetition", "n_blocklist"]
        for _, row in out.iterrows():
            vals = row[stages].tolist()
            assert vals == sorted(vals, reverse=True)

    def test_repetition_gate_is_integer_exact(self, ray_session):
        # 40 words, modal token exactly 4 -> 4*1000 <= 40*100 passes;
        # 5 occurrences -> 5000 > 4000 fails.  No float epsilon.
        from pdf_parser_ray.ops.webtext import filter_funnel

        filler = " ".join(f"aa{i:02d}" for i in range(36))  # 36 distinct
        at_limit = "the the the the " + filler       # 'the' x4 / 40 = 0.1
        over = "the the the the the " + filler       # 'the' x5 / 41 > 0.1
        rows = [(0, at_limit, "en", "a"), (1, over, "en", "b")]
        out = (
            filter_funnel(
                _ds(rows, ["doc_id", "text", "lang", "source"]),
                ["zz-no"],
                min_words=30,
                max_words=90,
            )
            .to_pandas()
            .set_index("source")
        )
        assert out.loc["a", "n_repetition"] == 1
        assert out.loc["b", "n_repetition"] == 0


class TestFrontierSchedule:
    # two known hosts (fast + slow) and one host missing from the
    # delay table (default applies); a priority tie inside a.com
    # resolves by doc_id ASC.
    ROWS = [
        (10, "a.com", 5),
        (11, "a.com", 9),   # highest priority on a.com -> rank 1
        (12, "a.com", 5),   # ties doc 10 on priority; 10 wins by id
        (20, "b.com", 1),
        (21, "b.com", 2),
        (30, "c.com", 3),   # not in the delay table -> default delay
    ]
    COLS = ["doc_id", "host", "priority"]

    def _delays(self):
        return pd.DataFrame(
            {"host": ["a.com", "b.com"], "delay_us": [100, 1000]}
        )

    def test_schedule_order_and_slots(self, ray_session):
        from pdf_parser_ray.ops.webtext import frontier_schedule

        out = (
            frontier_schedule(
                _ds(self.ROWS, self.COLS),
                delays=self._delays(),
                default_delay_us=7,
            )
            .to_pandas()
            .sort_values(["host", "rank_in_host"])
            .reset_index(drop=True)
        )
        got = list(out.itertuples(index=False))
        assert got == [
            (11, "a.com", 1, 0),
            (10, "a.com", 2, 100),    # tie broken by doc_id: 10 before 12
            (12, "a.com", 3, 200),
            (21, "b.com", 1, 0),      # priority DESC within host
            (20, "b.com", 2, 1000),
            (30, "c.com", 1, 0),
        ]
        assert out["rank_in_host"].dtype == "int64"
        assert out["fetch_time_us"].dtype == "int64"

    def test_makespan_matches_schedule_max(self, ray_session):
        from pdf_parser_ray.ops.webtext import frontier_makespan, frontier_schedule

        kw = dict(delays=self._delays(), default_delay_us=7)
        sched = (
            frontier_schedule(_ds(self.ROWS, self.COLS), **kw)
            .to_pandas()
            .groupby("host")["fetch_time_us"]
            .max()
        )
        span = (
            frontier_makespan(_ds(self.ROWS, self.COLS), **kw)
            .to_pandas()
            .set_index("host")
        )
        assert span["n_urls"].to_dict() == {"a.com": 3, "b.com": 2, "c.com": 1}
        for host, m in sched.items():
            assert span.loc[host, "makespan_us"] == m


class TestDupAwareWeights:
    def test_planted_clique_downweighted(self, ray_session):
        from pdf_parser_ray.pipelines import dup_aware_weights

        base = "alpha bravo charlie delta echo foxtrot golf hotel " * 6
        rows = [
            (0, base),                     # clique of 3 identical docs
            (1, base),
            (2, base),
            (3, "totally different text about streams and batches " * 6),
            (4, "another unique document mentioning arrow blocks " * 6),
        ]
        out = (
            dup_aware_weights(
                _ds(rows, ["doc_id", "text"]), threshold=0.5
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert out["cluster_size"].tolist() == [3, 3, 3, 1, 1]
        assert out["weight"].tolist() == [1 / 3, 1 / 3, 1 / 3, 1.0, 1.0]
        # weights of a cluster sum to 1: soft dedup keeps unit mass
        assert abs(out["weight"][:3].sum() - 1.0) < 1e-12


def _naive_bpe(texts, n_merges):
    """Independent reference: classic learn-BPE over raw texts."""
    import re

    vocab = {}
    for t in texts:
        for w in re.findall(r"\S+", t.lower()):
            vocab[w] = vocab.get(w, 0) + 1
    words = {w: list(w) + ["</w>"] for w in vocab}
    merges = []
    for rank in range(n_merges):
        counts = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + vocab[w]
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


class TestBpeTrain:
    TEXTS = [
        "low low low low low",
        "lower lower newest newest newest newest",
        "newest newest widest widest",
        "the newest gadget is the widest",
    ]

    def test_matches_independent_reference(self, ray_session):
        from pdf_parser_ray.ops.text_stats import bpe_train

        ds = _ds(list(enumerate(self.TEXTS)), ["doc_id", "text"])
        got = bpe_train(ds, 8)
        want, _ = _naive_bpe(self.TEXTS, 8)
        assert list(
            zip(got["rank"], got["left"], got["right"], got["cnt"])
        ) == want

    def test_merges_never_cross_words(self, ray_session):
        from pdf_parser_ray.ops.text_stats import bpe_train

        # corpus "ab ab ab": pairs (a,b) and (b,</w>) tie at 3 ->
        # ascending pair tie-break picks ('a','b'); a cross-word
        # pairing ('b','a') would have count 2 and must never win.
        ds = _ds([(0, "ab ab ab")], ["doc_id", "text"])
        got = bpe_train(ds, 1)
        assert (got.loc[0, "left"], got.loc[0, "right"]) == ("a", "b")

    def test_encode_counts(self, ray_session):
        from pdf_parser_ray.ops.text_stats import bpe_encode, bpe_train

        ds = _ds(list(enumerate(self.TEXTS)), ["doc_id", "text"])
        merges = bpe_train(ds, 8)
        out = (
            bpe_encode(ds, merges)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # independent check: encode each word with the reference's
        # final symbol table
        _, words = _naive_bpe(self.TEXTS, 8)
        import re
        for i, t in enumerate(self.TEXTS):
            ws = re.findall(r"\S+", t.lower())
            expect = sum(len(words[w]) for w in ws)
            assert out.loc[i, "n_bpe_tokens"] == expect
            assert out.loc[i, "n_words"] == len(ws)


class TestPerceptron:
    ROWS = [
        (0, "yes yes yes good", "en"),
        (1, "yes good fine yes", "en"),
        (2, "nein nein schlecht", "de"),
        (3, "nein schlecht nein nein", "de"),
        (4, "yes fine good yes yes", "en"),
        (5, "schlecht nein", "de"),
    ]

    @staticmethod
    def _naive(rows, d=64, rounds=3):
        """Independent serial twin of the batch perceptron."""
        import hashlib
        import re

        def feats(t):
            v = {}
            for tok in re.findall(r"\S+", t.lower(), re.ASCII):
                b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % d
                v[b] = v.get(b, 0) + 1
            v[d] = v.get(d, 0) + 1  # bias feature
            return v

        data = [(feats(t), 1 if lang == "en" else -1) for _, t, lang in rows]
        w = [0] * (d + 1)
        for _ in range(rounds):
            g = [0] * (d + 1)
            for v, y in data:
                m = y * sum(w[b] * c for b, c in v.items())
                if m <= 0:
                    for b, c in v.items():
                        g[b] += y * c
            w = [a + b for a, b in zip(w, g)]
        return w

    def test_matches_serial_twin_and_separates(self, ray_session):
        from pdf_parser_ray.ops.text_stats import (
            perceptron_predict,
            perceptron_train,
        )

        ds = _ds(self.ROWS, ["doc_id", "text", "lang"])
        got = perceptron_train(ds, rounds=3)
        assert got["w"].tolist() == self._naive(self.ROWS)

        pred = (
            perceptron_predict(ds, got)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        # disjoint vocab -> 3 rounds fully separate the classes
        assert pred["pred"].tolist() == [
            lang == "en" for _, _, lang in self.ROWS
        ]

    def test_partitioning_invariant(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.text_stats import perceptron_train

        df = pd.DataFrame(self.ROWS * 10, columns=["doc_id", "text", "lang"])
        a = perceptron_train(ray.data.from_pandas(df), rounds=2)
        b = perceptron_train(
            ray.data.from_pandas(df).repartition(7), rounds=2
        )
        pd.testing.assert_frame_equal(a, b)


class TestCalibrationBins:
    def test_exact_bins_and_ratios(self, ray_session):
        from pdf_parser_ray.ops.profile import calibration_bins

        rows = [
            (-15, True), (-11, False),   # bin -2
            (-5, False), (-1, False),    # bin -1 (floor division!)
            (0, False), (7, True),       # bin 0
            (10, True), (19, True),      # bin 1
        ]
        out = (
            calibration_bins(
                _ds(rows, ["margin", "pos"]), "margin", "pos", bin_width=10
            )
            .to_pandas().sort_values("bin").reset_index(drop=True)
        )
        assert out["bin"].tolist() == [-2, -1, 0, 1]
        assert out["n"].tolist() == [2, 2, 2, 2]
        assert out["n_pos"].tolist() == [1, 0, 1, 2]
        assert out["mean_score"].tolist() == [-13.0, -3.0, 3.5, 14.5]
        assert out["frac_pos"].tolist() == [0.5, 0.0, 0.5, 1.0]


class TestLineDedup:
    ROWS = [
        # "nav  home" (stripped form) appears in docs 0,1,2 -> hot.
        # Doc 1's copy carries leading indentation: it must COUNT with
        # the others (LINE_WS-stripped key) and be dropped.
        (0, "nav  home\nunique zero\n\nend zero"),
        (1, "  nav  home\t\nunique one"),
        (2, "nav  home"),
        # within-doc repeat alone crosses min_repeats=2
        (3, "twice here\ntwice here\nkeep three"),
        # whitespace-only line: structural, kept, never counted
        (4, "   \nunique four\n   "),
    ]

    def _run(self, ray_session, **kw):
        from pdf_parser_ray.ops.webtext import line_dedup

        return (
            line_dedup(_ds(self.ROWS, ["doc_id", "text"]), min_repeats=2, **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_semantics(self, ray_session):
        out = self._run(ray_session)
        assert out["doc_id"].tolist() == [0, 1, 2, 3, 4]
        # doc 0: hot line dropped, blank line KEPT
        assert out["clean_text"][0] == "unique zero\n\nend zero"
        assert out["n_lines"][0] == 4 and out["n_dropped"][0] == 1
        # doc 1: indented copy dropped too (stripped key)
        assert out["clean_text"][1] == "unique one"
        # doc 2 fully emptied but RETAINED
        assert out["clean_text"][2] == "" and out["n_dropped"][2] == 1
        # doc 3: within-doc repeat -> both copies dropped
        assert out["clean_text"][3] == "keep three"
        assert out["n_dropped"][3] == 2
        # doc 4: whitespace-only lines survive verbatim
        assert out["clean_text"][4] == "   \nunique four\n   "
        assert out["n_dropped"][4] == 0

    def test_join_mode_parity(self, ray_session):
        a = self._run(ray_session)
        b = self._run(ray_session, mode="join")
        pd.testing.assert_frame_equal(a, b)

    def test_query_matches_duckdb_twin(self, ray_session):
        import sys

        sys.path.insert(0, "tests")
        from oracle_utils import compare, duckdb_con, to_pandas

        from pdf_parser_ray.queries import QUERIES, SQL

        sf = "/root/testdata/sf0.001"
        ray_df = to_pandas(QUERIES["line_dedup"](sf))
        sql_df = duckdb_con(sf).execute(SQL["line_dedup"]).df()
        assert compare(ray_df, sql_df) == []


class TestUnigramLm:
    def test_hand_computed_vocab(self, ray_session):
        """Fully hand-derived EM trace: corpus words aaaa(x2), ab(x1);
        both rounds Viterbi-pick the whole-word pieces, single chars
        survive on the usage floor."""
        import math

        from pdf_parser_ray.ops.text_stats import unigram_train

        out = unigram_train(
            _ds([(0, "aaaa aaaa ab")], ["doc_id", "text"]),
            4,
            em_rounds=2,
        )
        assert out["piece"].tolist() == ["aaaa", "a", "ab", "b"]
        assert out["cnt"].tolist() == [2, 1, 1, 1]
        assert out["logprob"].tolist() == [
            math.log(2 / 5), math.log(1 / 5), math.log(1 / 5), math.log(1 / 5)
        ]

    def test_encode_counts_and_loglik(self, ray_session):
        import math

        from pdf_parser_ray.ops.text_stats import unigram_encode, unigram_train

        docs = _ds([(0, "aaaa aaaa ab"), (1, "zz")], ["doc_id", "text"])
        pieces = unigram_train(
            _ds([(0, "aaaa aaaa ab")], ["doc_id", "text"]), 4, em_rounds=2
        )
        out = (
            unigram_encode(docs, pieces)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert out["n_words"].tolist() == [3, 1]
        assert out["n_pieces"].tolist() == [3, 2]
        unk = math.log(1 / 5) - 10.0
        assert out["loglik"][0] == pytest.approx(
            2 * math.log(2 / 5) + math.log(1 / 5)
        )
        assert out["loglik"][1] == pytest.approx(2 * unk)

    def test_corpus_invariants_and_coverage(self, ray_session):
        """Over a generated corpus: vocab bounded, every corpus char
        kept, and Viterbi round-trips every distinct word losslessly."""
        from pdf_parser_ray.ops.text_stats import (
            TOKEN_PAT,
            _viterbi_segment,
            unigram_train,
        )

        rows = [
            (i, f"the quick brown fox {i % 7} jumps over lazy dogs "
                f"pack my box with five dozen liquor jugs {i % 3}")
            for i in range(40)
        ]
        out = unigram_train(_ds(rows, ["doc_id", "text"]), 48, em_rounds=3)
        assert len(out) <= 48
        corpus_chars = set()
        words = set()
        for _i, t in rows:
            for w in TOKEN_PAT.findall(t.lower()):
                words.add(w)
                corpus_chars |= set(w)
        pieces = set(out["piece"])
        assert corpus_chars <= pieces
        logp = dict(zip(out["piece"], out["logprob"]))
        max_len = max(len(p) for p in logp)
        for w in sorted(words):
            segs = _viterbi_segment(w, logp, max_len, -1e9)
            assert "".join(segs) == w


class TestUrlTemplates:
    def test_edge_cases(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.webtext import url_templates

        urls = [
            "https://Ex.COM:443/blog/2024/05/post-1?q=1#top",  # digits collapse
            "https://ex.com:443/blog/2019/11/post-2",          # same template
            "http://ex.com/blog/2019/11/post-2",               # port differs -> host differs
            "https://a.org/12/34/",                            # consecutive digit segs + trailing slash
            "https://a.org/x12/7",                             # mixed seg stays literal
            "https://a.org",                                   # no path at all
        ]
        out = (
            url_templates(
                ray.data.from_pandas(
                    pd.DataFrame({"url": urls})
                ).repartition(3)
            )
            .to_pandas()
            .sort_values(["host", "template"])
            .reset_index(drop=True)
        )
        got = {
            (r.host, r.template): (r.n_urls, r.n_paths)
            for r in out.itertuples()
        }
        assert got[("ex.com:443", "/blog/<d>/<d>/post-1")] == (1, 1)
        assert got[("ex.com:443", "/blog/<d>/<d>/post-2")] == (1, 1)
        assert got[("ex.com", "/blog/<d>/<d>/post-2")] == (1, 1)
        assert got[("a.org", "/<d>/<d>/")] == (1, 1)
        assert got[("a.org", "/x12/<d>")] == (1, 1)
        assert got[("a.org", "")] == (1, 1)

    def test_distinct_paths_across_batches(self, ray_session):
        import ray.data

        from pdf_parser_ray.ops.webtext import url_templates

        # same path replicated over many partitions must count ONE
        # distinct path; different ids under one template accumulate
        urls = ["https://h.com/item/%d" % (i % 4) for i in range(40)]
        out = url_templates(
            ray.data.from_pandas(pd.DataFrame({"url": urls})).repartition(8)
        ).to_pandas()
        assert len(out) == 1
        assert out["n_urls"].iloc[0] == 40 and out["n_paths"].iloc[0] == 4


class TestHostBoilerplate:
    def _run(self, df, parts=4, **kw):
        import ray.data

        from pdf_parser_ray.ops.webtext import host_boilerplate_strip

        return (
            host_boilerplate_strip(
                ray.data.from_pandas(df).repartition(parts), **kw
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_host_scoped_and_per_doc_once(self, ray_session):
        # footer on every page of h1 (even repeated twice in doc 0 —
        # counts once); same line appears on ONE h2 page only
        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "host": ["h1", "h1", "h2", "h2"],
                "text": [
                    "body a\nFOOT\nFOOT",
                    "body b\nFOOT",
                    "body c\nFOOT",
                    "body d\nother",
                ],
            }
        )
        out = self._run(df, min_permille=600, min_docs=2)
        assert out.loc[0, "clean_text"] == "body a"
        assert out.loc[0, "n_dropped"] == 2  # both copies scrubbed
        assert out.loc[1, "clean_text"] == "body b"
        # h2: FOOT on 1/2 docs = 500 permille < 600 -> kept
        assert out.loc[2, "clean_text"] == "body c\nFOOT"
        assert out.loc[3, "n_dropped"] == 0

    def test_blank_lines_structural_and_min_docs(self, ray_session):
        # single-doc host: nothing strips (min_docs=2); blanks survive
        df = pd.DataFrame(
            {
                "doc_id": [0],
                "host": ["solo"],
                "text": ["a\n\n  \na"],
            }
        )
        out = self._run(df, min_permille=100, min_docs=2)
        assert out.loc[0, "clean_text"] == "a\n\n  \na"
        assert out.loc[0, "n_lines"] == 4 and out.loc[0, "n_dropped"] == 0

    def test_exact_permille_boundary(self, ray_session):
        # BP on exactly 2 of 4 docs; gate 500 permille ->
        # 1000*2 >= 500*4 drops (>= is inclusive); x/y/z/w at 250 stay
        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "host": ["h"] * 4,
                "text": ["x\nBP", "y\nBP", "z", "w"],
            }
        )
        out = self._run(df, min_permille=500, min_docs=2)
        assert out["clean_text"].tolist() == ["x", "y", "z", "w"]


class TestDetectCharset:
    def _detect(self, payloads):
        from pdf_parser_ray.ops.webtext import detect_charset_batch

        df = pd.DataFrame(
            {"doc_id": range(len(payloads)), "payload": payloads}
        )
        return detect_charset_batch(df)

    def test_all_branches(self):
        out = self._detect(
            [
                b"\xef\xbb\xbfhello",                       # utf-8 BOM
                b"\xff\xfeh\x00i\x00",                      # utf-16le BOM
                b"\xfe\xff\x00h\x00i",                      # utf-16be BOM
                b"plain ascii",                             # ascii
                "café".encode("utf-8"),                # valid multibyte
                "café".encode("windows-1252"),         # invalid utf-8
                b"",                                        # empty -> ascii
            ]
        )
        assert out["detected"].tolist() == [
            "utf-8", "utf-16le", "utf-16be", "ascii",
            "utf-8", "windows-1252", "ascii",
        ]

    def test_meta_prescan_and_lying_meta(self):
        lying = (
            b'<html><head><meta charset="windows-1252"></head>'
            + "body café".encode("utf-8")
        )
        http_equiv = (
            b'<head><META HTTP-EQUIV="Content-Type" '
            b'CONTENT="text/html; charset=UTF-8"></head>ascii body'
        )
        none = b"<html>no declaration caf\xc3\xa9</html>"
        out = self._detect([lying, http_equiv, none])
        assert out["declared"].tolist() == ["windows-1252", "utf-8", ""]
        assert out["detected"].tolist() == ["utf-8", "ascii", "utf-8"]
        assert out["agree"].tolist() == [False, False, True]

    def test_prescan_window_bound(self):
        # declaration beyond the prescan window is not seen
        far = b" " * 2000 + b'<meta charset="utf-8">'
        out = self._detect([far])
        assert out["declared"].iloc[0] == ""

    def test_corpus_ground_truth(self, ray_session):
        import ray.data

        from pdf_parser_ray.corpus import ensure_charset_corpus
        from pdf_parser_ray.ops.webtext import detect_charset_batch

        corpus = ensure_charset_corpus(200, seed=7)
        out = (
            ray.data.read_parquet(corpus)
            .map_batches(detect_charset_batch, batch_format="pandas")
            .to_pandas()
        )
        assert (out["detected"] == out["expected_charset"]).all()
        # the lying-meta tier (doc_id%5==4) must disagree
        liars = out[out["doc_id"] % 5 == 4]
        assert len(liars) and (~liars["agree"]).all()


class TestGopherRepetition:
    def _run(self, texts):
        import ray.data

        from pdf_parser_ray.ops.webtext import gopher_repetition

        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        return (
            gopher_repetition(ray.data.from_pandas(df).repartition(2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_hand_computed_signals(self, ray_session):
        # 8 words -> lines(4): ['a b c a', 'a b c d'] distinct;
        # 2-grams: 'a b'x2,'b c'x2,'c a'x1,'a a'x1,'c d'x1 -> top 'a b' (min tie)
        text = "a b c a a b c d"
        out = self._run([text])
        r = out.iloc[0]
        assert r["n_chars"] == len(text) == 15
        assert r["dup_line_frac"] == 0.0
        assert r["dup_para_frac"] == 0.0
        assert r["top_2gram_char_frac"] == 2 * 3 / 15
        # 5..10-grams each occur once -> dup fracs all 0
        for n in range(5, 11):
            assert r[f"dup_{n}gram_char_frac"] == 0.0

    def test_duplicate_lines_and_ngrams(self, ray_session):
        # 12 words = 3 identical 4-word lines 'x y z w'
        text = " ".join(["x y z w"] * 3)
        out = self._run([text])
        r = out.iloc[0]
        assert r["dup_line_frac"] == 2 / 3          # 2 non-first of 3
        assert r["dup_line_char_frac"] == 2 / 3     # equal-length units
        # every 5-gram occurs... '(x y z w x)', '(y z w x y)' etc:
        # sequence is periodic with period 4 -> 5-grams repeat
        assert r["dup_5gram_char_frac"] > 0.5
        assert r["dup_para_frac"] == 0.0            # single 16-word para

    def test_empty_doc_all_zero(self, ray_session):
        out = self._run([""])
        r = out.iloc[0]
        for c in out.columns:
            if c.endswith("frac"):
                assert r[c] == 0.0, c


class TestTextTiling:
    def _run(self, texts):
        from pdf_parser_ray.ops.webtext import texttile_boundaries

        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        return texttile_boundaries(df)

    def test_two_topic_boundary_near_join(self):
        rng = np.random.RandomState(3)
        topic_a = ["cat", "dog", "pet", "fur", "tail", "paw"]
        topic_b = ["stock", "bond", "yield", "market", "trade", "fund"]
        words = [rng.choice(topic_a) for _ in range(200)] + [
            rng.choice(topic_b) for _ in range(200)
        ]
        out = self._run([" ".join(words)])
        # chunks tile the doc exactly
        assert out["start_token"].iloc[0] == 0
        assert out["end_token"].iloc[-1] == 400
        assert (
            out["start_token"].iloc[1:].to_numpy()
            == out["end_token"].iloc[:-1].to_numpy()
        ).all()
        # at least one boundary within 40 tokens of the true topic flip
        bounds = out["start_token"].iloc[1:].to_numpy()
        assert len(bounds) >= 1
        assert (np.abs(bounds - 200) <= 40).any()

    def test_uniform_doc_often_whole_and_short_doc_whole(self):
        # single-vocab doc: no strong valleys required, but whatever
        # chunks come out must tile; short doc stays whole
        rng = np.random.RandomState(5)
        uni = " ".join(rng.choice(["alpha", "beta"]) for _ in range(300))
        short = "just a few words here"
        out = self._run([uni, short])
        short_rows = out[out["doc_id"] == 1]
        assert len(short_rows) == 1
        assert short_rows["start_token"].iloc[0] == 0
        assert short_rows["end_token"].iloc[0] == 5
        for d in (0, 1):
            rows = out[out["doc_id"] == d]
            assert (
                rows["start_token"].iloc[1:].to_numpy()
                == rows["end_token"].iloc[:-1].to_numpy()
            ).all()

    def test_empty_doc_single_empty_chunk(self):
        out = self._run([""])
        assert len(out) == 1
        assert out["end_token"].iloc[0] == 0


class TestC4LineFilter:
    def test_each_rule(self, ray_session):
        import numpy as np

        from pdf_parser_ray.ops.webtext import c4_line_filter_batch

        good = "this line has five words."
        docs = {
            # 3 good lines -> kept intact
            0: "\n".join([good, "another proper sentence right here!",
                          'a third quoted keeper line."']),
            # line rules: no terminal punct / too few words / javascript
            1: "\n".join([good, "no terminal punctuation here",
                          "too short.", "enable JavaScript to view this.",
                          "yet another fine long sentence?",
                          "and one more to clear the bar."]),
            # page rules: curly brace kills the page
            2: "\n".join([good, good, good]) + "\nfunction() { return; }",
            # page rules: lorem ipsum kills the page
            3: "\n".join([good, good, "Lorem Ipsum dolor sit amet."]),
            # under min_kept_lines
            4: "\n".join([good, "only two keeper lines exist here."]),
        }
        df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
        out = c4_line_filter_batch(df).set_index("doc_id")
        assert out.loc[0, "keep_doc"] and out.loc[0, "n_kept_lines"] == 3
        assert out.loc[0, "clean_text"] == docs[0]
        assert out.loc[1, "keep_doc"] and out.loc[1, "n_kept_lines"] == 3
        assert "javascript" not in out.loc[1, "clean_text"].lower()
        assert "no terminal" not in out.loc[1, "clean_text"]
        for d in (2, 3, 4):
            assert not out.loc[d, "keep_doc"]
            assert out.loc[d, "clean_text"] == ""
        assert out["n_dropped_lines"].to_numpy().tolist() == [0, 3, 1, 0, 0]
