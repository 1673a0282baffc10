"""Property-based tests (hypothesis) for the parsing/encoding invariants."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.core.cmap import (
    decode_pdf_string,
    decode_pdf_string_fast,
    encode_pdf_string,
    escape_pdf_string,
    parse_cmap,
    translation_table,
    unescape_pdf_string,
)
from pdf_parser_ray.minipdf.objects import parse_object


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64),
       st.dictionaries(st.integers(0, 255), st.characters(min_codepoint=32), max_size=64))
def test_fast_decode_matches_slow(data, raw_cmap):
    cmap = {bytes([k]): v for k, v in raw_cmap.items()}
    assert decode_pdf_string_fast(data, translation_table(cmap)) == decode_pdf_string(
        data, cmap
    )


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable, max_size=64))
def test_escape_then_unescape_parse_path(text):
    """The parse-path unescape inverts escaping of ( ) \\ — the only
    escapes the parse path handles (api.py:121)."""
    limited = text.replace("\r", "").replace("\n", "").replace("\t", "")
    limited = limited.replace("\x0b", "").replace("\x0c", "")
    escaped = (
        limited.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    )
    assert unescape_pdf_string(escaped) == limited


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=32))
def test_pdf_literal_string_roundtrip(text):
    """escape_pdf_string output parses back to the same bytes via the
    minipdf literal-string parser."""
    escaped = escape_pdf_string(text)
    payload = b"(" + escaped.encode("latin1") + b")"
    obj, end = parse_object(payload, 0)
    assert obj == text.encode("latin1")
    assert end == len(payload)


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(st.integers(0, 255),
                       st.characters(min_codepoint=33, max_codepoint=0x2FFF),
                       min_size=1, max_size=80))
def test_encode_decode_roundtrip(raw):
    # make the mapping injective so encode is well-defined
    seen = {}
    for k, v in raw.items():
        if v not in seen.values():
            seen[k] = v
    cmap = {bytes([k]): v for k, v in seen.items()}
    text = "".join(seen.values())
    assert decode_pdf_string(encode_pdf_string(text, cmap), cmap) == text


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(32, 0xFFF0)),
                max_size=32))
def test_parse_cmap_bfchar_lines(entries):
    text = "\n".join(f"<{c:02X}> <{t:04X}>" for c, t in entries)
    cmap = parse_cmap(text)
    expected = {}
    for c, t in entries:  # later lines overwrite earlier (reference dict set)
        expected[bytes([c])] = chr(t)
    assert cmap == expected


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 300), st.integers(0, 40), st.integers(32, 0xFFF0))
def test_parse_cmap_bfrange_skips_multibyte(start, span, target):
    end = start + span
    cmap = parse_cmap(f"<{start:02X}> <{end:02X}> <{target:04X}>")
    expected = {
        bytes([i]): chr(target + (i - start))
        for i in range(start, end + 1)
        if i <= 0xFF
    }
    assert cmap == expected


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400))
def test_extract_document_never_raises(payload):
    """The per-row contract: any byte garbage → a status row, never an
    exception (poison rows must not kill blocks — SURVEY.md §4)."""
    from pdf_parser_ray.extract import extract_document

    r = extract_document("u", payload, "fallback")
    assert isinstance(r["status"], str) and isinstance(r["extracted_text"], str)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=300))
def test_extract_pdf_prefixed_garbage_never_raises(payload):
    from pdf_parser_ray.extract import extract_document

    r = extract_document("u", b"%PDF-1.4\n" + payload)
    assert isinstance(r["status"], str)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200), st.integers(1, 64))
def test_rolling_fingerprint_vs_naive(data, window):
    import pandas as pd

    from pdf_parser_ray.ops.text_stats import rolling_fingerprint_batch

    text = data.decode("latin1")
    # ensure utf-8 round-trip determinism for the naive model
    encoded = text.encode("utf-8")

    def naive(s_bytes, w):
        if not s_bytes:
            return 0
        w = min(w, len(s_bytes))
        B, M = 1000003, 1 << 64
        best = None
        for i in range(len(s_bytes) - w + 1):
            h = 0
            for b in s_bytes[i : i + w]:
                h = (h * B + b) % M
            best = h if best is None else min(best, h)
        return best

    df = pd.DataFrame({"doc_id": [0], "text": [text]})
    got = rolling_fingerprint_batch(df, window=window)["rolling_fp"][0]
    assert got == naive(encoded, window)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(-1000, 1000)),
        min_size=1, max_size=300,
    ),
    st.integers(1, 7),
)
def test_grouped_agg_matches_pandas(ray_session, rows, n_splits):
    """grouped_agg == plain pandas groupby for any frame + partitioning."""
    import pandas as pd
    import ray.data

    from pdf_parser_ray.ops.shuffle import grouped_agg

    df = pd.DataFrame(rows, columns=["k", "v"]).astype("int64")
    cuts = sorted({min(len(df), (i + 1) * max(1, len(df) // n_splits))
                   for i in range(n_splits)})
    parts, lo = [], 0
    for c in cuts:
        if c > lo:
            parts.append(df.iloc[lo:c])
            lo = c
    if lo < len(df):
        parts.append(df.iloc[lo:])

    out = (
        grouped_agg(
            ray.data.from_pandas(parts),
            ["k"],
            {"s": ("v", "sum"), "mn": ("v", "min"),
             "mx": ("v", "max"), "n": ("v", "size")},
            n_parts=5,
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    exp = (
        df.groupby("k", as_index=False)
        .agg(s=("v", "sum"), mn=("v", "min"), mx=("v", "max"), n=("v", "size"))
        .sort_values("k", ignore_index=True)
    )
    assert out["k"].tolist() == exp["k"].tolist()
    for c in ["s", "mn", "mx", "n"]:
        assert out[c].tolist() == exp[c].tolist(), c


class TestTokenBudgetCapInvariance:
    def test_bucket_count_and_partitioning_invariant(self, ray_session):
        """The distributed prefix sum must give the SAME kept set for
        any bucket width and any input block layout — the property
        that makes the cap rerun/resume-safe."""
        import numpy as np
        import pandas as pd
        import ray.data

        from pdf_parser_ray.ops.curation import token_budget_cap

        rng = np.random.default_rng(23)
        n = 150
        df = pd.DataFrame(
            {
                "source": [f"s{i % 4}" for i in range(n)],
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [" ".join(["w"] * int(k)) for k in rng.integers(1, 12, n)],
            }
        )
        outs = []
        for n_buckets, blocks in [(1, 1), (7, 3), (64, 5), (256, 2)]:
            parts = np.array_split(df.sample(frac=1, random_state=n_buckets), blocks)
            ds = ray.data.from_pandas([p.reset_index(drop=True) for p in parts])
            out = (
                token_budget_cap(ds, budget=60, n_buckets=n_buckets)
                .to_pandas()
                .sort_values(["source", "doc_id"])
                .reset_index(drop=True)
            )
            outs.append(out)
        for other in outs[1:]:
            pd.testing.assert_frame_equal(outs[0], other)
