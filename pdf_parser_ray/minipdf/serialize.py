"""Re-serialize a parsed PdfDocument back to bytes (replace pipeline).

The reference mutates documents through pikepdf (`page['/Contents'] =
pikepdf.Stream(...)`, `pdf.save(...)` — replacer.py:824-827).  minipdf's
equivalent: mutate the in-memory object map, then dump every object with
a fresh xref/trailer.  Unknown constructs survive because objects are
kept as parsed (dict/array/stream/ref) and written back 1:1.
"""

from __future__ import annotations

from typing import Any

from pdf_parser_ray.minipdf.document import PdfDocument
from pdf_parser_ray.minipdf.objects import PdfName, PdfRef, PdfStream


def dumps_object(obj: Any) -> bytes:
    if isinstance(obj, PdfStream):
        d = dict(obj.dict)
        d["/Length"] = len(obj.raw)
        return dumps_object(d) + b"\nstream\n" + obj.raw + b"\nendstream"
    if isinstance(obj, PdfName):
        return str(obj).encode("latin1")
    if isinstance(obj, PdfRef):
        return f"{obj.num} {obj.gen} R".encode("latin1")
    if isinstance(obj, bool):
        return b"true" if obj else b"false"
    if obj is None:
        return b"null"
    if isinstance(obj, int):
        return str(obj).encode("latin1")
    if isinstance(obj, float):
        out = f"{obj:.6f}".rstrip("0").rstrip(".")
        return (out or "0").encode("latin1")
    if isinstance(obj, bytes):
        # Hex string form: unambiguous, no escaping decisions.
        return b"<" + obj.hex().encode("ascii") + b">"
    if isinstance(obj, list):
        return b"[ " + b" ".join(dumps_object(x) for x in obj) + b" ]"
    if isinstance(obj, dict):
        parts = []
        for k, v in obj.items():
            key = k if k.startswith("/") else "/" + k
            parts.append(key.encode("latin1") + b" " + dumps_object(v))
        return b"<< " + b" ".join(parts) + b" >>"
    raise TypeError(f"cannot serialize {type(obj)}")


def serialize_document(doc: PdfDocument) -> bytes:
    """Dump the (possibly mutated) object map with a rebuilt xref."""
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    nums = sorted(doc.objects)
    offsets: dict[int, int] = {}
    for num in nums:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("latin1")
        out += dumps_object(doc.objects[num])
        out += b"\nendobj\n"

    root_num = None
    root = doc._find_root()
    for num in nums:
        if doc.objects[num] is root:
            root_num = num
            break
    if root_num is None:  # extremely defensive; scan found pages w/o catalog
        root_num = nums[0]

    xref_pos = len(out)
    maxnum = nums[-1] if nums else 0
    out += f"xref\n0 {maxnum + 1}\n".encode("latin1")
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode("latin1")
        else:
            out += b"0000000000 65535 f \n"
    out += (
        f"trailer\n<< /Size {maxnum + 1} /Root {root_num} 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode("latin1")
    return bytes(out)
