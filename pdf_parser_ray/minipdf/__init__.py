"""minipdf — a from-scratch, dependency-free PDF structure reader/writer.

The reference (herryqg/pdf-parser) leans on pikepdf for document structure
(api.py:43, replacer.py:101) and PyMuPDF for rendering.  Neither library
exists in this environment, and this engine is a ground-up rebuild anyway —
so minipdf implements just the slice of ISO 32000 the extraction contract
needs:

* object syntax (names, numbers, strings, hex strings, arrays, dicts,
  indirect references, streams, booleans, null);
* a ROBUST document model that never trusts the xref table: objects are
  discovered by scanning for ``N G obj … endobj`` spans (the analog of the
  reference GUI's 4-level content-recovery chain, pdf_gui.py:251-451);
* page-tree walk with inherited ``/Resources`` via ``/Parent``
  (pdf_gui.py:1515-1521 ``find_inherited``);
* stream decoding (``/FlateDecode`` via zlib, or raw), with indirect
  ``/Length`` resolution;
* a tiny writer used by fixtures and the replace pipeline.

Everything is pure-Python over in-memory bytes: handles never cross Ray
task boundaries (SURVEY.md §7 non-serializable state) — each map_batches
call re-opens from the in-row ``html`` binary column.
"""

from pdf_parser_ray.minipdf.document import PdfDocument, PdfError  # noqa: F401
from pdf_parser_ray.minipdf.objects import PdfName, PdfRef, PdfStream, parse_object  # noqa: F401
from pdf_parser_ray.minipdf.writer import build_pdf  # noqa: F401
