"""Tokenizer goldens — frozen from a one-time equivalence run.

Each expected list below was produced by running a verbatim transcription
of the reference scan loop (/root/reference/pdf_parser/api.py:94-131) side
by side with ``tokenize_content`` over these exact inputs (0 mismatches
across these cases plus 200 randomized CMap fuzz trials).  The quirks are
intentional reference behavior and part of the byte-identity contract:

* TJ arrays whose parts use UNESCAPED parens never match the scan regex
  (the bracket alternative excludes ``()``) — the whole show op is
  dropped.
* Escaped-paren TJ arrays match, but the parts don't pass the
  ``startswith('(')`` check, so the RAW inner text (unescaped) is decoded.
* A fractional font size (``12.5 Tf``) does not match ``\\d+`` — no font
  switch happens.
* A shown string CONTAINING ``/F9 99 Tf`` is treated as a font switch
  (the reference searches the whole matched text, api.py:98).
* ``Tm`` matrices are consumed but NEVER update the position: the
  reference parses ``float('Tm')`` (pdf_gui.py:793-799) which always
  raises — only ``Td`` moves the pen.
"""

from pdf_parser_ray.core.tokenizer import tokenize_content

IDENTITY = {bytes([c]): chr(c) for c in range(32, 127)}
FONTS = {"/F1": IDENTITY}


def items(content, fonts=FONTS):
    return [(t.font, t.text, t.encoded_bytes) for t in tokenize_content(content, fonts)]


def texts(content, fonts=FONTS):
    return [t.text for t in tokenize_content(content, fonts)]


def test_simple_tj():
    assert items("BT /F1 12 Tf (Hello) Tj ET") == [("/F1", "Hello", b"Hello")]


def test_duplicate_shows_kept_in_stream_order():
    assert texts("BT /F1 12 Tf (Hello) Tj (Hello) Tj ET") == ["Hello", "Hello"]


def test_tj_array_with_unescaped_parens_is_dropped():
    assert texts("BT /F1 12 Tf [(Wo) -20 (rld)] TJ ET") == []


def test_tj_array_with_escaped_parens_decodes_raw_inner():
    assert texts("BT /F1 12 Tf [\\(Wo\\) -20 \\(rld\\)] TJ ET") == ["(Wo) -20 (rld)"]


def test_tj_array_numbers_only():
    assert texts("BT /F1 12 Tf [ -20 ] TJ ET") == ["-20"]


def test_literal_escapes_unescaped_before_decode():
    assert items("BT /F1 12 Tf (a\\(b\\)c\\\\d) Tj ET") == [
        ("/F1", "a(b)c\\d", b"a(b)c\\d")
    ]


def test_font_without_cmap_skipped():
    got = items("BT /F2 10 Tf (skip no cmap) Tj /F1 9 Tf (kept) Tj ET")
    assert got == [("/F1", "kept", b"kept")]


def test_tm_consumed_but_position_inert():
    toks = tokenize_content(
        "BT /F1 12 Tf 1 0 0 1 72 700 Tm (at Tm) Tj 5 -12 Td (after Td) Tj ET", FONTS
    )
    assert [(t.text, t.x, t.y) for t in toks] == [
        ("at Tm", 0.0, 0.0),       # Tm never updates the pen (reference bug)
        ("after Td", 5.0, -12.0),  # Td accumulates from (0,0)
    ]


def test_show_before_any_font_dropped():
    assert texts("(orphan before font) Tj BT /F1 12 Tf (x y z) Tj") == ["x y z"]


def test_string_containing_tf_treated_as_font_switch():
    assert texts("BT /F1 12 Tf (contains /F9 99 Tf inside) Tj ET") == []


def test_unmapped_bytes_decode_to_question_marks():
    assert texts("BT /F1 12 Tf (multi\nline) Tj ET") == ["multi?line"]


def test_tight_spacing_and_fractional_size():
    assert texts("BT /F1 1 Tf(tight)Tj ET") == ["tight"]
    # 12.5 does not match \d+\s+Tf → no font switch → show dropped.
    assert texts("BT /F1 12.5 Tf (frac size) Tj ET") == []


def test_whitespace_only_strings_dropped_and_strip_applied():
    got = items("BT /F1 12 Tf ( ) Tj (  a  ) Tj ET")
    assert got == [("/F1", "a", b"  a  ")]  # text stripped, bytes raw


def test_hex_string_show_ignored():
    assert texts("BT /F1 12 Tf <48656c6c6f> Tj ET") == []


def test_td_accumulates_across_shows():
    toks = tokenize_content(
        "BT /F1 12 Tf 72 720 Td (l1) Tj 0 -16 Td (l2) Tj 0 -16 Td (l3) Tj ET", FONTS
    )
    assert [(t.text, t.x, t.y) for t in toks] == [
        ("l1", 72.0, 720.0),
        ("l2", 72.0, 704.0),
        ("l3", 72.0, 688.0),
    ]
