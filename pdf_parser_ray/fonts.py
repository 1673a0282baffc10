"""Font analysis + (stubbed) subsetting — the reference's fonts/ package.

Semantics pinned to /root/reference/pdf_parser/fonts/:

* ``truetype_font_names``     — analysis.py:8-28 (M10): a font is TT if
  ``/Subtype == /TrueType`` or its descriptor has ``/FontFile2``.
* ``font_encoding_mapping``   — analysis.py:31-67 (M9): walk
  ``/Encoding /Differences``; ints move the cursor, names assign
  ``code → glyphname``.  Bare-name encodings yield {} (the reference's
  standard-encoding branch is an unimplemented TODO — faithful).
* ``is_safe_code``            — analysis.py:70-100 (M11).
* ``allocate_safe_code``      — the replacer's safe-code scan
  (replacer.py:687-741, M12): 0xB0..0xFF, skipping used codes, every
  ``/Differences`` map, and unsafe codes; extended 0x100..0x10F range
  masked to one byte as last resort.
* ``width_ratio_mean``        — embedding.py:149-171 (G5): mean of
  (pdf_width / ttf_width · 0.97) over mapped chars.
* ``update_pdf_font_mapping`` — STUB.  The reference's implementation is
  broken (embedding.py:68 imports ``create_cmap_string`` which does not
  exist — SURVEY.md §2.11), and fonttools is not available in this
  environment; auto-insert font embedding is outside the byte-exact
  contract.  Raises NotImplementedError with that explanation.
"""

from __future__ import annotations

from pdf_parser_ray.minipdf.document import PdfDocument
from pdf_parser_ray.minipdf.objects import PdfName


def truetype_font_names(doc: PdfDocument, font_dict: dict) -> list[str]:
    """Names of TrueType fonts in a ``/Font`` resource dict (M10)."""
    tt_names: list[str] = []
    try:
        for name, ref in font_dict.items():
            font = doc.resolve(ref)
            if not isinstance(font, dict):
                continue
            if font.get("/Subtype") == PdfName("/TrueType"):
                tt_names.append(str(name))
            else:
                desc = doc.get(font, "/FontDescriptor")
                if isinstance(desc, dict) and "/FontFile2" in desc:
                    tt_names.append(str(name))
    except Exception:
        pass
    return tt_names


def font_encoding_mapping(doc: PdfDocument, font: dict) -> dict[int, str]:
    """``/Differences`` walk → {code: glyphname} (M9)."""
    encoding_map: dict[int, str] = {}
    try:
        encoding = doc.get(font, "/Encoding")
        if isinstance(encoding, dict):
            differences = doc.get(encoding, "/Differences")
            if isinstance(differences, list):
                current_code = 0
                for item in differences:
                    item = doc.resolve(item)
                    if isinstance(item, int):
                        current_code = item
                    elif isinstance(item, PdfName):
                        encoding_map[current_code] = str(item)
                        current_code += 1
        # bare-Name encodings: reference TODO branch — intentionally {}
    except Exception:
        pass
    return encoding_map


_UNSAFE_RANGES = [
    (0x00, 0x1F), (0x20, 0x20), (0x22, 0x22), (0x27, 0x27), (0x28, 0x29),
    (0x2C, 0x2C), (0x2E, 0x2E), (0x3A, 0x3B), (0x3F, 0x3F), (0x5B, 0x5D),
    (0x7B, 0x7D),
]


def is_safe_code(code: int) -> bool:
    """Replacement-code safety predicate (M11, analysis.py:70-100)."""
    for start, end in _UNSAFE_RANGES:
        if start <= code <= end:
            return False
    return True


def allocate_safe_code(
    used_codes: set[int],
    already_used_codes: set[int],
    encoding_maps: dict[str, dict[int, str]],
    existing_cmap_codes: set[int] | None = None,
) -> int | None:
    """Find a free, safe single-byte code (M12, replacer.py:687-741).

    Scan 0xB0..0xFF skipping codes used anywhere; fall back to
    0x100..0x10F masked to one byte (the reference's extended range).
    None if nothing is free.
    """
    for code in range(0xB0, 0x100):
        if code in used_codes or code in already_used_codes:
            continue
        if any(code in m for m in encoding_maps.values()):
            continue
        if is_safe_code(code):
            return code
    existing = existing_cmap_codes or set()
    for code in range(0x100, 0x110):
        masked = code & 0xFF
        if masked in existing:
            continue
        return masked
    return None


def width_ratio_mean(
    pdf_widths: dict[str, float], ttf_widths: dict[str, float]
) -> float | None:
    """Mean of pdf/ttf width ratios · 0.97 over shared chars (G5,
    embedding.py:149-171); None when no char overlaps."""
    ratios = [
        (pdf_widths[c] / ttf_widths[c]) * 0.97
        for c in pdf_widths
        if c in ttf_widths and ttf_widths[c]
    ]
    if not ratios:
        return None
    return sum(ratios) / len(ratios)


def update_pdf_font_mapping(*_args, **_kwargs):
    """STUB — auto-insert font re-embedding.

    Not implemented: (a) the reference's own implementation raises
    ImportError at runtime (embedding.py:68 imports a nonexistent
    symbol; the caller swallows it, replacer.py:807-811 /
    embedding.py:228-230), so the path is dead code upstream too;
    (b) fonttools is unavailable in this environment.  The replace
    pipeline runs with auto-insert disabled, which is the only path the
    reference actually exercises successfully.
    """
    raise NotImplementedError(
        "auto-insert font embedding is outside the byte-exact contract "
        "(broken in the reference: embedding.py:68) and fonttools is "
        "not available in this environment"
    )
