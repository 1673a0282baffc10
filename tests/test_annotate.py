"""Annotated-PDF writer (S11): flagging + annotation round-trip."""

from pdf_parser_ray.annotate import annotate_unsupported
from pdf_parser_ray.extract import extract_document
from pdf_parser_ray.minipdf import PdfDocument, build_pdf

IDENTITY = {"bfchars": {c: chr(c) for c in range(32, 127)}}


def one_page(content):
    return build_pdf([{"fonts": {"/F1": IDENTITY}, "content": content}])


def test_flags_spans_missing_probe_char():
    pdf = one_page("BT /F1 12 Tf 72 720 Td (hello there) Tj ET")
    annotated, n = annotate_unsupported(pdf, "Ω")
    assert n == 1
    doc = PdfDocument(annotated)
    annots = doc.get(doc.pages[0], "/Annots")
    assert isinstance(annots, list) and len(annots) == 1
    annot = doc.resolve(annots[0])
    assert str(annot["/Subtype"]) == "/Square"
    rect = annot["/Rect"]
    assert rect[0] == 72.0 and rect[1] == 720.0
    # annotation does not change extraction
    assert extract_document("u", annotated)["extracted_text"] == "hello there"


def test_supported_probe_not_flagged():
    pdf = one_page("BT /F1 12 Tf 72 720 Td (hello) Tj ET")
    annotated, n = annotate_unsupported(pdf, "hello")
    assert n == 0 and annotated == pdf


def test_non_pdf_passthrough():
    out, n = annotate_unsupported(b"not a pdf", "x")
    assert n == 0 and out == b"not a pdf"


def test_multiple_spans_flagged():
    pdf = one_page(
        "BT /F1 12 Tf 72 720 Td (one) Tj 0 -16 Td (two) Tj ET"
    )
    annotated, n = annotate_unsupported(pdf, "Ω")
    assert n == 2
    doc = PdfDocument(annotated)
    assert len(doc.get(doc.pages[0], "/Annots")) == 2
