"""Hand-built raw PDFs exercising structure the fixture writer doesn't
emit: inherited /Resources from the /Pages node (pdf_gui.py:1515-1521
analog), indirect /Contents arrays, indirect font dicts, deep page
trees."""

from pdf_parser_ray.extract import extract_document
from pdf_parser_ray.minipdf import PdfDocument


def raw_pdf(objects: dict[int, bytes], root: int = 1) -> bytes:
    out = bytearray(b"%PDF-1.4\n")
    for num in sorted(objects):
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    out += f"trailer\n<< /Size {max(objects)+1} /Root {root} 0 R >>\n".encode()
    out += b"startxref\n0\n%%EOF\n"
    return bytes(out)


TOUNICODE = (
    b"<< /Length 58 >>\nstream\n"
    b"1 beginbfrange\n<20> <7E> <0020>\nendbfrange\nendcmap\n"
    b"\nendstream"
)


def test_inherited_resources_from_pages_node():
    # /Resources lives on the /Pages parent, NOT the page.
    pdf = raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
           b"/Resources << /Font << /F1 4 0 R >> >> >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
        4: b"<< /Type /Font /Subtype /Type1 /ToUnicode 6 0 R >>",
        5: b"<< /Length 36 >>\nstream\nBT /F1 12 Tf 9 9 Td (Inherit) Tj ET\nendstream",
        6: TOUNICODE,
    })
    r = extract_document("u", pdf)
    assert r["status"] == "ok"
    assert r["extracted_text"] == "Inherit"


def test_indirect_contents_array_elements():
    pdf = raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents [5 0 R 7 0 R] "
           b"/Resources << /Font << /F1 4 0 R >> >> >>",
        4: b"<< /Type /Font /ToUnicode 6 0 R >>",
        5: b"<< /Length 24 >>\nstream\nBT /F1 12 Tf 9 9 Td (spl\nendstream",
        6: TOUNICODE,
        7: b"<< /Length 9 >>\nstream\nit) Tj ET\nendstream",
    })
    r = extract_document("u", pdf)
    # token '(split)' spans the two streams → concat before scan
    assert r["extracted_text"] == "split"


def test_deep_pages_tree():
    pdf = raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 8 0 R] /Count 2 >>",
        3: b"<< /Type /Pages /Parent 2 0 R /Kids [9 0 R] /Count 1 >>",
        8: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
           b"/Resources << /Font << /F1 4 0 R >> >> >>",
        9: b"<< /Type /Page /Parent 3 0 R /Contents 7 0 R "
           b"/Resources << /Font << /F1 4 0 R >> >> >>",
        4: b"<< /Type /Font /ToUnicode 6 0 R >>",
        5: b"<< /Length 33 >>\nstream\nBT /F1 12 Tf 9 9 Td (two) Tj ET\nendstream",
        6: TOUNICODE,
        7: b"<< /Length 33 >>\nstream\nBT /F1 12 Tf 9 9 Td (one) Tj ET\nendstream",
    })
    doc = PdfDocument(pdf)
    assert len(doc.pages) == 2
    # kid order: the nested subtree's page (obj 9) comes first
    r = extract_document("u", pdf)
    assert r["extracted_text"] == "one\ntwo"


def test_ref_cycle_does_not_hang():
    pdf = raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 /Parent 2 0 R >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 3 0 R >>",  # self-ref
    })
    r = extract_document("u", pdf, fallback_text="fb")
    assert isinstance(r["status"], str)


def test_object_stream_expansion():
    """Catalog/pages/page/font dicts packed in a compressed /ObjStm."""
    import zlib

    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
           b"/Resources << /Font << /F1 4 0 R >> >> >>",
        4: b"<< /Type /Font /ToUnicode 6 0 R >>",
    }
    header, body = [], b""
    for num, objbytes in inner.items():
        header.append(f"{num} {len(body)}")
        body += objbytes + b"\n"
    head = (" ".join(header) + "\n").encode()
    payload = zlib.compress(head + body)
    objstm = (
        f"<< /Type /ObjStm /N {len(inner)} /First {len(head)} "
        f"/Length {len(payload)} /Filter /FlateDecode >>\n".encode()
        + b"stream\n" + payload + b"\nendstream"
    )
    pdf = raw_pdf({
        10: objstm,
        5: b"<< /Length 35 >>\nstream\nBT /F1 12 Tf 9 9 Td (objstm) Tj ET\nendstream",
        6: TOUNICODE,
    }, root=1)
    r = extract_document("u", pdf)
    assert r["status"] == "ok"
    assert r["extracted_text"] == "objstm"


def test_garbage_between_objects_survives():
    pdf = raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
           b"/Resources << /Font << /F1 4 0 R >> >> >>",
        4: b"<< /Type /Font /ToUnicode 6 0 R >>",
        5: b"<< /Length 32 >>\nstream\nBT /F1 12 Tf 9 9 Td (ok) Tj ET\nendstream",
        6: TOUNICODE,
    })
    # splice binary garbage between two objects
    broken = pdf.replace(b"\nendobj\n2 0 obj", b"\nendobj\n\xff\xfe\x00GARBAGE\n2 0 obj")
    r = extract_document("u", broken)
    assert r["extracted_text"] == "ok"
