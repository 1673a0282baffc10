"""Declarative pipeline specs: a JSON/dict description of
source → stages → sink, compiled onto the SAME library operators the
Python API exposes — the configuration surface a curation team points
at new corpora without writing driver code (the role the reference's
GUI + batch Excel rules play for its users; cf. pdf_gui.py's
rule-driven batch flow, /root/reference/pdf_gui.py:1671-1742).

A spec is data, so it ships in a job queue, diffs in review, and
replays byte-identically.  Example:

    {"source": {"kind": "parquet", "path": ".../documents.parquet",
                "columns": ["doc_id", "text"]},
     "stages": [{"op": "quality"},
                {"op": "filter", "expr": "n_tokens >= 5"},
                {"op": "limit", "n": 1000}],
     "sink": {"kind": "parquet", "path": "/tmp/out"}}

Design rules:

* ``build_pipeline`` returns the LAZY Dataset (streaming semantics
  preserved end-to-end); only the sink consumes it.
* Every stage resolves through ``STAGE_OPS`` — a registry of thin
  adapters over ops/* functions.  Unknown ops or parameters fail fast
  with the valid choices in the error (specs are user input).
* Stages that need whole-pipeline context (dedup's hot-set broadcast,
  extraction's skew split) call the library pipelines unchanged — the
  spec layer adds NO new dataflow of its own.
"""

from __future__ import annotations

import glob
import json
import os

import ray.data

__all__ = ["build_pipeline", "run_spec", "STAGE_OPS"]


# --------------------------------------------------------------- stages


def _stage_select(ds, columns: list):
    return ds.select_columns(list(columns))


def _stage_filter(ds, expr: str):
    return ds.filter(expr=expr)


def _stage_limit(ds, n: int):
    return ds.limit(int(n))


def _stage_repartition(ds, n: int):
    return ds.repartition(int(n))


def _stage_rename(ds, mapping: dict):
    import pandas as pd

    from pdf_parser_ray.io_utils import arrow_out

    def ren(df: pd.DataFrame):
        return arrow_out(df.rename(columns=dict(mapping)))

    return ds.map_batches(ren, batch_format="pandas")


def _stage_sort(ds, keys: list, descending: list | None = None):
    if descending is None:
        descending = [False] * len(keys)
    return ds.sort(list(keys), descending=list(descending))


def _stage_extract(ds):
    from pdf_parser_ray.pipelines import extract_corpus

    return extract_corpus(ds)


def _pandas_batch_stage(fn):
    def stage(ds):
        return ds.map_batches(fn, batch_format="pandas")

    return stage


def _stage_token_stats(ds):
    from pdf_parser_ray.ops.text_stats import token_stats_batch

    return _pandas_batch_stage(token_stats_batch)(ds)


def _stage_quality(ds):
    from pdf_parser_ray.ops.text_stats import quality_batch

    return _pandas_batch_stage(quality_batch)(ds)


def _stage_lang_id(ds):
    from pdf_parser_ray.ops.text_stats import lang_id_batch

    return _pandas_batch_stage(lang_id_batch)(ds)


def _stage_fingerprint(ds):
    from pdf_parser_ray.ops.text_stats import fingerprint_batch

    return _pandas_batch_stage(fingerprint_batch)(ds)


def _stage_gopher_repetition(ds, **kw):
    from pdf_parser_ray.ops.webtext import gopher_repetition

    return gopher_repetition(ds, **kw)


def _stage_repetition_stats(ds):
    from pdf_parser_ray.ops.webtext import repetition_stats

    return repetition_stats(ds)


def _stage_pii_redact(ds):
    from pdf_parser_ray.ops.webtext import pii_redact

    return pii_redact(ds)


def _stage_line_dedup(ds, **kw):
    from pdf_parser_ray.ops.webtext import line_dedup

    return line_dedup(ds, **kw)


def _stage_dedup_exact(ds):
    from pdf_parser_ray.ops.dedup import exact_dedup

    return exact_dedup(ds)


def _stage_charset_detect(ds, **kw):
    from pdf_parser_ray.ops.webtext import detect_charset_batch

    def run(df):
        return detect_charset_batch(df, **kw)

    return ds.map_batches(run, batch_format="pandas")


def _stage_url_templates(ds, **kw):
    from pdf_parser_ray.ops.webtext import url_templates

    return url_templates(ds, **kw)


STAGE_OPS = {
    "select": _stage_select,
    "filter": _stage_filter,
    "limit": _stage_limit,
    "repartition": _stage_repartition,
    "rename": _stage_rename,
    "sort": _stage_sort,
    "extract": _stage_extract,
    "token_stats": _stage_token_stats,
    "quality": _stage_quality,
    "lang_id": _stage_lang_id,
    "fingerprint": _stage_fingerprint,
    "gopher_repetition": _stage_gopher_repetition,
    "repetition_stats": _stage_repetition_stats,
    "pii_redact": _stage_pii_redact,
    "line_dedup": _stage_line_dedup,
    "dedup_exact": _stage_dedup_exact,
    "charset_detect": _stage_charset_detect,
    "url_templates": _stage_url_templates,
}


# --------------------------------------------------------------- compile


def _read_source(source: dict) -> ray.data.Dataset:
    kind = source.get("kind")
    if kind == "parquet":
        from pdf_parser_ray.io_utils import read_parquet_clean

        return read_parquet_clean(
            source["path"], columns=source.get("columns")
        )
    if kind == "corpus":
        from pdf_parser_ray.pipelines import read_corpus

        return read_corpus(source["path"])
    raise ValueError(
        f"unknown source kind {kind!r}; valid: ['parquet', 'corpus']"
    )


def build_pipeline(spec: dict) -> ray.data.Dataset:
    """Compile a spec dict to the LAZY Dataset it describes.  Raises
    ``ValueError`` naming the valid choices on any unknown op/kind, and
    ``TypeError`` (from the adapter) on bad stage parameters."""
    if "source" not in spec:
        raise ValueError("spec needs a 'source'")
    ds = _read_source(spec["source"])
    for i, stage in enumerate(spec.get("stages", [])):
        stage = dict(stage)
        op = stage.pop("op", None)
        fn = STAGE_OPS.get(op)
        if fn is None:
            raise ValueError(
                f"stage {i}: unknown op {op!r}; valid: "
                f"{sorted(STAGE_OPS)}"
            )
        ds = fn(ds, **stage)
    return ds


def run_spec(spec: dict | str) -> dict:
    """Execute a spec (dict, JSON string, or path to a JSON file) and
    consume its sink.  Returns a summary dict: rows written / counted
    plus the sink target."""
    if isinstance(spec, str):
        try:
            spec = json.loads(spec)
        except json.JSONDecodeError:
            with open(spec) as f:
                spec = json.load(f)
    ds = build_pipeline(spec)
    sink = spec.get("sink", {"kind": "count"})
    kind = sink.get("kind")
    if kind == "parquet":
        # refuse a non-empty target: write_parquet doesn't truncate, so
        # re-running a spec at the same path would mix old and new part
        # files (and the old re-read-the-directory row count silently
        # counted the stale ones)
        stale = glob.glob(os.path.join(sink["path"], "**", "*.parquet"),
                          recursive=True)
        if stale:
            raise ValueError(
                f"sink path {sink['path']!r} already contains "
                f"{len(stale)} parquet file(s); write_parquet does not "
                "truncate — point the sink at an empty directory"
            )
        # STREAMING write (advisor r3: a materialize() here pinned the
        # whole output in the object store before the first file hit
        # disk); the row count comes from the freshly written parquet
        # FOOTERS — metadata-only, and exact because the empty-dir
        # refusal above guarantees every file present is ours
        ds.write_parquet(sink["path"])
        import pyarrow.parquet as pq

        written = glob.glob(os.path.join(sink["path"], "**", "*.parquet"),
                            recursive=True)
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in written)
        return {"rows": rows, "out": sink["path"]}
    if kind == "count":
        return {"rows": ds.count(), "out": None}
    raise ValueError(
        f"unknown sink kind {kind!r}; valid: ['parquet', 'count']"
    )
