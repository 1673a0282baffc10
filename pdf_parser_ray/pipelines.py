"""Corpus-level extraction pipelines (Dataset-in → Dataset-out, lazy).

These functions never call ``ray.init`` and never materialize the corpus:
they compose lazy Dataset transforms and hand the stream back to the
caller (who consumes via ``write_parquet`` / ``iter_batches`` / an
aggregate).  See :mod:`pdf_parser_ray.checkpoint` for the resumable,
partition-manifested job runner.
"""

from __future__ import annotations

from typing import Any

import ray.data

from pdf_parser_ray.stages import (
    DOC_BATCH_SIZE,
    OVERSIZE_THRESHOLD,
    ExtractDocuments,
    payload_size_mask,
)

CORPUS_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_corpus(path: str | list[str], **kwargs: Any) -> ray.data.Dataset:
    """Read a CC-style corpus with column pruning at the read."""
    return ray.data.read_parquet(path, columns=CORPUS_COLUMNS, **kwargs)


def extract_corpus(
    ds: ray.data.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DOC_BATCH_SIZE,
    include_spans: bool = True,
    split_oversized: bool = True,
    oversize_threshold: int = OVERSIZE_THRESHOLD,
    oversize_concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """The flagship: corpus Dataset → extraction Dataset.

    Skew handling (SURVEY.md §4): payloads above ``oversize_threshold``
    route to a dedicated actor pool with ``batch_size=1`` so one multi-MB
    document never stalls a batch of small ones; the two branches are
    unioned.  Disable with ``split_oversized=False`` (e.g. when the corpus
    is known uniform — saves the second pass over the input).

    ``concurrency=None`` defaults to an autoscaling actor pool
    ``(1, cluster_CPUs)`` — the streaming executor's backpressure then
    decides how many actors actually materialize; pin a value for
    benchmark reproducibility.
    """
    if concurrency is None:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(1, ncpu))
    fn_kwargs = {"include_spans": include_spans}
    if not split_oversized:
        return ds.map_batches(
            ExtractDocuments,
            fn_constructor_kwargs=fn_kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    small = ds.map_batches(
        payload_size_mask,
        fn_kwargs={"threshold": oversize_threshold, "keep_small": True},
        batch_format="pyarrow",
    ).map_batches(
        ExtractDocuments,
        fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    big = ds.map_batches(
        payload_size_mask,
        fn_kwargs={"threshold": oversize_threshold, "keep_small": False},
        batch_format="pyarrow",
    ).map_batches(
        ExtractDocuments,
        fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow",
        batch_size=1,  # one oversized doc per task invocation
        concurrency=oversize_concurrency,
    )
    return small.union(big)


def dedup_urls(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact per-url dedup (SURVEY.md §2.7 D5): hash-partition on url,
    keep the first row per group.  This is the one corpus-level shuffle
    the extraction flagship may need; key = url (uniform hash)."""
    import pandas as pd

    def first_row(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return ds.groupby("url").map_groups(first_row, batch_format="pandas")


def status_counts(ds: ray.data.Dataset):
    """Small corpus-stats groupby: rows per status (metrics surface)."""
    from ray.data.aggregate import Count

    return ds.groupby("status").aggregate(Count(alias_name="n"))
