"""Shared parquet-read helper for the driver-table pipelines."""

from __future__ import annotations

import os

import ray.data


def unreserve(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Disable Ray Data's per-operator resource reservation for THIS
    dataset's execution (each Dataset captures a private DataContext
    copy at creation; mutating it affects nothing else).

    Rationale (measured, bench notes in BASELINE.md): the reservation
    allocator (default ratio 0.5) holds CPU slots for every branch of a
    union-shaped plan even while those branches are idle, starving the
    active ones — skew-split extraction ran 16.5 s reserved vs 10.97 s
    unreserved at 32 CPUs, and the union'd ri_audit probe pass 10.3 s
    vs 5.2 s.  Hash-JOIN plans are the opposite (join aggregators
    starve without reservation: 13 s vs 44 s) — only unreserve
    union-of-maps plans, never joins."""
    ds.context.op_resource_reservation_enabled = False
    return ds


def _probe_file(path) -> str | None:
    """A representative parquet file for schema probing."""
    if isinstance(path, (list, tuple)):
        return _probe_file(path[0]) if path else None
    if isinstance(path, str) and os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith(".parquet"):
                return os.path.join(path, name)
        return None
    return path if isinstance(path, str) else None


def read_parquet_clean(path, columns=None, **kwargs) -> ray.data.Dataset:
    """``read_parquet`` that strips pandas schema metadata.

    Parquet files written by pandas carry ``b'pandas'`` schema metadata;
    pa.Schema objects holding it are UNHASHABLE ("unhashable type:
    'dict'"), which floods shuffle reduce / join aggregator tasks with
    Ray's "Failed to hash the schemas (for deduplication)" warning
    (ray transform_pyarrow.py:181) and defeats its schema-dedup fast
    path.

    The strip happens by passing an explicit metadata-free ``schema=``
    to the READ (pruned to ``columns``), NOT by appending a map stage:
    a transformed dataset loses metadata-based ``size_bytes()`` /
    ``count()``, and ``hash_join``'s partition sizing would silently
    EXECUTE the whole read just to estimate size (measured: 0.002 s →
    1.08 s on sf0.1 lineitem).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    if "schema" not in kwargs:
        probe = _probe_file(path)
        if probe is not None:
            try:
                file_schema = pq.read_schema(probe)
                if columns is not None:
                    file_schema = pa.schema(
                        [file_schema.field(c) for c in columns]
                    )
                kwargs["schema"] = pa.schema(
                    [f.remove_metadata() for f in file_schema]
                )
            except Exception:
                pass  # fall through to a plain read
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def arrow_out(df) -> "object":
    """Convert a partial-stage pandas result to an Arrow table so the
    emitted BLOCK is Arrow-format.

    Rationale: a ``map_batches`` stage that returns pandas frames makes
    Ray store pandas blocks, and a downstream high-cardinality
    ``groupby().aggregate()`` shuffle combines pandas blocks ~11x slower
    than Arrow blocks (measured 83 s vs 7.6 s on the Q4 max-collapse at
    sf0.1/32 CPUs — ops/relational.order_priority_counts).  Partials
    whose logic wants pandas should ``return arrow_out(out)`` whenever a
    groupby / sort / join consumes them.
    """
    import pyarrow as pa

    # replace_schema_metadata(None): from_pandas attaches b'pandas'
    # schema metadata whose dict is UNHASHABLE and floods shuffle tasks
    # with "Failed to hash the schemas" (read_parquet_clean rationale).
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def compact_parquet(
    in_dir: str,
    out_dir: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-files compaction: rewrite a directory of (typically
    shuffle-produced) parquet fragments into ~``target_bytes`` files.

    The maintenance pass every long-running lake needs — a 100 TB job
    that writes one file per reduce task leaves millions of small files
    whose per-file open/footer cost dominates downstream reads.  Sizing
    uses ON-DISK bytes (exact, no execution); the rewrite is a
    ``repartition`` WITHOUT shuffle (block coalescing — data moves at
    most once, no all-to-all) followed by a streaming write.

    Returns {"files_in", "files_out", "rows", "bytes_in"}.
    """
    import math
    import os

    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(in_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {in_dir}")
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_in / target_bytes))

    ds = read_parquet_clean(in_dir)
    ds.repartition(n_out).write_parquet(out_dir)

    out_files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(out_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    rows = sum(pq.read_metadata(f).num_rows for f in out_files)
    return {
        "files_in": len(files),
        "files_out": len(out_files),
        "rows": int(rows),
        "bytes_in": int(bytes_in),
    }
