"""Ray Data stages: the actor-pool extraction stage + skew routing helpers.

Execution model (idiomatic Ray Data, BASELINE.json north_star):

    ray.data.read_parquet(corpus)            # (url, warc_ts, html, text, lang)
      -> map_batches(ExtractDocuments,       # CALLABLE CLASS → actor pool
                     batch_format="pyarrow", # zero-copy Arrow blocks
                     batch_size=DOC_BATCH,   # docs are heavy rows: small batches
                     concurrency=N)
      -> write_parquet(...)

``ExtractDocuments.__init__`` holds the per-actor CMap cache (SURVEY.md
§2.3 A1) — across a Common-Crawl-style corpus the same standard-font
ToUnicode streams repeat constantly, so CMap parsing amortizes to a dict
hit.  Compiled regexes are module-level in core.tokenizer (A5), shared by
every actor at import time.

The per-batch body necessarily loops documents in Python: parsing a PDF
byte payload IS the useful compute (there is no vectorized kernel for
"interpret a content stream").  Everything around it — column access,
output assembly — is Arrow-native with an explicit schema so block
schemas stay stable across batches (no inference drift).
"""

from __future__ import annotations

import pyarrow as pa

from pdf_parser_ray.extract import extract_document

# Default knobs (overridable per pipeline; see pipelines.extract_corpus).
DOC_BATCH_SIZE = 64          # heavy binary rows → small batches (ray_guide: memory-aware)
OVERSIZE_THRESHOLD = 1 << 20  # 1 MiB payload → dedicated pool (SURVEY.md §4 skew row)

SPAN_TYPE = pa.struct(
    [
        ("page", pa.int32()),
        ("text", pa.string()),
        ("x0", pa.float64()),
        ("y0", pa.float64()),
        ("x1", pa.float64()),
        ("y1", pa.float64()),
        ("font", pa.string()),
        ("encoded_hex", pa.string()),
        ("instance_index", pa.int32()),
        ("offset_start", pa.int64()),
        ("offset_end", pa.int64()),
    ]
)

EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("kind", pa.string()),
        ("status", pa.string()),
        ("n_pages", pa.int32()),
        ("n_spans", pa.int32()),
        ("extracted_text", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)


class ExtractDocuments:
    """Actor-pool stage: one batch of corpus rows in → extraction records out.

    State held per actor (built once in ``__init__``, reused per batch):
    the CMap cache keyed by ToUnicode byte hash.  Use with::

        ds.map_batches(ExtractDocuments, batch_format="pyarrow",
                       batch_size=DOC_BATCH_SIZE, concurrency=(1, n))
    """

    def __init__(self, include_spans: bool = True):
        self.cmap_cache: dict = {}
        self.include_spans = include_spans

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        texts = (
            batch.column("text").to_pylist()
            if "text" in batch.column_names
            else [None] * len(urls)
        )
        warc_ts = (
            batch.column("warc_ts")
            if "warc_ts" in batch.column_names
            else pa.nulls(len(urls), pa.timestamp("us"))
        )
        langs = (
            batch.column("lang")
            if "lang" in batch.column_names
            else pa.nulls(len(urls), pa.string())
        )

        records = [
            extract_document(u, p, t, self.cmap_cache)
            for u, p, t in zip(urls, payloads, texts)
        ]

        cols: dict = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": warc_ts,
            "lang": langs,
            "kind": pa.array([r["kind"] for r in records], pa.string()),
            "status": pa.array([r["status"] for r in records], pa.string()),
            "n_pages": pa.array([r["n_pages"] for r in records], pa.int32()),
            "n_spans": pa.array([r["n_spans"] for r in records], pa.int32()),
            "extracted_text": pa.array(
                [r["extracted_text"] for r in records], pa.string()
            ),
        }
        names = list(EXTRACT_SCHEMA.names)
        if self.include_spans:
            cols["spans"] = pa.array(
                [r["spans"] for r in records], pa.list_(SPAN_TYPE)
            )
        else:
            names.remove("spans")
        return pa.table({n: cols[n] for n in names})


class StripHtml:
    """Actor-pool stage for pure-HTML corpora (north_star: "compiled DOM
    heuristics" as actor state).

    The block-scoring heuristics' regexes/tag-sets are module-level
    constants compiled at import (A5); the actor form exists for
    pipelines that want per-stage resource isolation for the HTML path
    (e.g. a separate pool with its own concurrency next to a PDF pool).
    Output schema matches :class:`ExtractDocuments` minus PDF-only
    columns.
    """

    def __init__(self, include_spans: bool = True):
        from pdf_parser_ray.html.strip import strip_html  # bind once

        self.strip_html = strip_html
        self.include_spans = include_spans

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = batch.column("html").to_pylist()
        texts, statuses, spans_out = [], [], []
        for payload in payloads:
            res = self.strip_html(payload or b"")
            texts.append(res["extracted_text"])
            statuses.append(res["status"])
            if self.include_spans:
                spans_out.append(
                    [
                        {
                            "page": 0,
                            "text": s["text"],
                            "x0": None, "y0": None, "x1": None, "y1": None,
                            "font": s["font"],
                            "encoded_hex": None,
                            "instance_index": s["instance_index"],
                            "offset_start": s["offset_start"],
                            "offset_end": s["offset_end"],
                        }
                        for s in res["spans"]
                    ]
                )
        cols = {
            "url": pa.array(urls, pa.string()),
            "status": pa.array(statuses, pa.string()),
            "extracted_text": pa.array(texts, pa.string()),
        }
        if self.include_spans:
            cols["spans"] = pa.array(spans_out, pa.list_(SPAN_TYPE))
        return pa.table(cols)


# Worker-process-global CMap cache for the stateless-task execution mode.
# Ray reuses worker processes across map_batches tasks, so a module-level
# dict gives the same amortization as actor state (A1) without paying
# actor-pool creation on every dataset execution.  Heavyweight state
# (models, font blobs) should still use the actor class above.
_WORKER_CMAP_CACHE: dict = {}

# Generic process-global store for light task-mode stage state (seeded
# hyperplanes, compiled profiles, broadcast-ref fetches).  Measured on
# this box: an actor-pool stage pays ~1.5-4 s of pool ramp per dataset
# execution that a task-pool stage with worker_state does not, while the
# once-per-process build cost is identical.  Heavy state (models, font
# blobs, multi-GB indexes) should still use an actor pool so placement
# and teardown are explicit.
from collections import OrderedDict

_WORKER_STATE: OrderedDict = OrderedDict()

# LRU bound: unlike actor state (freed at pool teardown), a worker
# process outlives every job on the node — an unbounded dict would pin
# one deserialized copy of every broadcast table / centroid set / vocab
# ever used, growing worker RSS monotonically across a long session.
# Evicted entries rebuild cheaply (seeded numpy state) or re-fetch from
# plasma (broadcast refs), so the cap trades a rare rebuild for a hard
# memory ceiling.  64 distinct live states per stage-mix is far above
# any single job's working set.
_WORKER_STATE_MAX = 64


def worker_state(key, builder):
    """Build-once-per-worker-process state for task-mode stages.

    The task-mode analog of actor ``__init__`` state: Ray reuses worker
    processes across map_batches tasks, so ``builder()`` runs once per
    process and every later task reuses the cached value.  ``key`` must
    uniquely identify the state (include seeds/dims/ObjectRef hex).
    LRU-bounded to ``_WORKER_STATE_MAX`` entries per worker process.
    """
    try:
        _WORKER_STATE.move_to_end(key)
        return _WORKER_STATE[key]
    except KeyError:
        val = builder()
        _WORKER_STATE[key] = val
        while len(_WORKER_STATE) > _WORKER_STATE_MAX:
            _WORKER_STATE.popitem(last=False)
        return val


def task_kwargs(concurrency) -> dict:
    """map_batches kwargs for a task-pool stage from an actor-style spec.

    ``None`` → elastic (no cap, streaming executor schedules); an int
    caps concurrent tasks; a legacy (min, max) actor-pool tuple degrades
    to its max as the task cap.
    """
    if concurrency is None:
        return {}
    if isinstance(concurrency, int):
        return {"concurrency": concurrency}
    return {"concurrency": max(concurrency)}


def extract_batch_task(batch: pa.Table, include_spans: bool = True) -> pa.Table:
    """Stateless-task twin of :class:`ExtractDocuments` (same output)."""
    worker = ExtractDocuments.__new__(ExtractDocuments)
    worker.cmap_cache = _WORKER_CMAP_CACHE
    worker.include_spans = include_spans
    return worker(batch)


def payload_size_mask(batch: pa.Table, threshold: int, keep_small: bool) -> pa.Table:
    """Vectorized size filter used for skew routing (pure pyarrow.compute)."""
    import pyarrow.compute as pc

    sizes = pc.binary_length(batch.column("html"))
    mask = pc.less_equal(sizes, threshold) if keep_small else pc.greater(sizes, threshold)
    # binary_length(null) → null; route null/empty payloads with the small side.
    mask = pc.fill_null(mask, keep_small)
    return batch.filter(mask)
