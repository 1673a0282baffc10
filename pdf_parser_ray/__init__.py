"""pdf_parser_ray — a Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the *semantics* of herryqg/pdf-parser
(reference at /root/reference, read-only) on an idiomatic Ray Data
execution model:

    ray.data.read_parquet(corpus)                       # (url, warc_ts, html, text, lang)
      -> map_batches(Extract, batch_format="pyarrow",   # actor pool, CMap cache in __init__
                     concurrency=..., batch_size=...)
      -> write_parquet(out/part=...)                    # partitioned, resumable

The reference is a single-process, one-document-at-a-time tool; nothing of
its execution model is carried over.  What IS carried over, byte-for-byte,
is the extraction contract: PDF content-stream tokenization
(reference: pdf_parser/api.py:90-131), ToUnicode CMap decoding
(pdf_parser/core/cmap.py:4-54), WinAnsi fallback CMaps (cmap.py:107-165),
instance indexing and forward-only position claiming (api.py:136-195),
and the nested-box filter (api.py:337-388).  See each module's docstring
for the exact file:line citations of the behavior it pins.
"""

__version__ = "0.1.0"

from pdf_parser_ray.extract import extract_document  # noqa: F401
