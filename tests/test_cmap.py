"""CMap semantics, pinned to /root/reference/pdf_parser/core/cmap.py.

Goldens verified once against a transcription of the reference functions
(see the equivalence note in tests/test_tokenizer.py).
"""

import pytest

from pdf_parser_ray.core.cmap import (
    decode_pdf_string,
    encode_pdf_string,
    escape_pdf_string,
    parse_cmap,
    unescape_pdf_string,
    winansi_cmap,
    winansi_cmap_text,
)


def test_bfchar_basic():
    cmap = parse_cmap("<41> <0061>\n<42> <0062>")
    assert cmap == {b"A": "a", b"B": "b"}


def test_bfrange_expansion():
    cmap = parse_cmap("<41> <43> <0061>")
    assert cmap == {b"A": "a", b"B": "b", b"C": "c"}


def test_bfrange_takes_priority_over_bfchar_on_same_line():
    # A 3-group line must parse as a range, not fall through to bfchar.
    cmap = parse_cmap("<41> <42> <0030>")
    assert cmap == {b"A": "0", b"B": "1"}


def test_multibyte_codes_skipped():
    # cmap.py:24-25 and 35-37: codes above 0xFF are skipped (CID contract).
    assert parse_cmap("<0100> <0041>") == {}
    cmap = parse_cmap("<FE> <0101> <0041>")  # range straddling 0xFF
    assert set(cmap) == {b"\xfe", b"\xff"}


def test_later_lines_overwrite():
    cmap = parse_cmap("<41> <0061>\n<41> <0062>")
    assert cmap == {b"A": "b"}


def test_decode_question_mark_fallback():
    cmap = {b"A": "a"}
    assert decode_pdf_string(b"A_B", cmap) == "a??"
    assert decode_pdf_string(b"", cmap) == ""


def test_encode_roundtrip_and_error():
    cmap = {b"A": "a", b"B": "b"}
    assert encode_pdf_string("ab", cmap) == b"AB"
    with pytest.raises(ValueError):
        encode_pdf_string("az", cmap)


def test_escape_unescape():
    assert escape_pdf_string("a(b)c\\d\n") == "a\\(b\\)c\\\\d\\n"
    # Parse-path unescape handles only \( \) \\ (api.py:121).
    assert unescape_pdf_string("a\\(b\\)c\\\\d") == "a(b)c\\d"
    assert unescape_pdf_string("keep\\n") == "keep\\n"


def test_fast_decode_identical_to_reference_loop():
    import random

    from pdf_parser_ray.core.cmap import (
        Cmap,
        decode_pdf_string_fast,
        translation_table,
    )

    rng = random.Random(5)
    for _ in range(50):
        cmap = {
            bytes([rng.randrange(256)]): chr(rng.randrange(32, 0x3000))
            for _ in range(rng.randrange(0, 120))
        }
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        slow = decode_pdf_string(data, cmap)
        assert decode_pdf_string_fast(data, translation_table(cmap)) == slow
        assert data.decode("latin1").translate(Cmap(cmap).table) == slow


def test_winansi_fallback_printable_ascii_only():
    cmap = parse_cmap(winansi_cmap_text())
    assert cmap == winansi_cmap()
    assert cmap[b"A"] == "A" and cmap[b" "] == " " and cmap[b"~"] == "~"
    assert b"\x1f" not in cmap and b"\x7f" not in cmap
    # Reference quirk: its own codespacerange line parses as a bfchar
    # (cmap.py:151 + cmap.py:30-38) → 0x00 maps to U+00FF.
    assert cmap[b"\x00"] == "\xff"
    # Any unknown encoding name falls back to WinAnsi (cmap.py:138-142).
    assert parse_cmap(winansi_cmap_text("/MacRomanEncoding")) == cmap
