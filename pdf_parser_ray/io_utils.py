"""Shared parquet-read helper for the driver-table pipelines."""

from __future__ import annotations

import ray.data


def read_parquet_clean(path: str, columns=None, **kwargs) -> ray.data.Dataset:
    """``read_parquet`` + schema-metadata strip.

    Parquet files written by pandas carry ``b'pandas'`` schema metadata;
    pa.Schema objects holding it are UNHASHABLE ("unhashable type:
    'dict'"), which floods shuffle reduce / join aggregator tasks with
    Ray's "Failed to hash the schemas (for deduplication)" warning
    (ray transform_pyarrow.py:181) and defeats its schema-dedup fast
    path.  ``replace_schema_metadata(None)`` is zero-copy.
    """
    ds = ray.data.read_parquet(path, columns=columns, **kwargs)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
