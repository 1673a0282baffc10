"""Resumable, partition-manifested extraction jobs (SURVEY.md §4 rows
"Checkpoint / resume" and "Counters / metrics").

Unit of work = a PARTITION: a fixed slice of the input file list.  Each
partition runs as one streaming Ray Data job (read → extract → write) into
``out_dir/part=<k>/`` via a write-to-temp-then-rename protocol, and is
sealed by a ``manifest.json`` recording lineage (the exact input files)
plus counters (docs in/ok/fallback/failed, spans, text bytes).  A rerun
skips every sealed partition — per-row determinism makes the rerun
idempotent.

At cluster scale each partition should be much larger than the cluster
(e.g. 100 TB / 1024 partitions ≈ 100 GB: the streaming executor saturates
all nodes within one partition job, and checkpoint granularity stays
useful).  Partitions run sequentially by design — concurrency lives
INSIDE a partition, resumability BETWEEN partitions.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

import ray.data

from pdf_parser_ray.pipelines import extract_corpus, read_corpus


def plan_partitions(input_files: list[str], num_partitions: int) -> list[list[str]]:
    """Deterministic round-robin assignment of files to partitions."""
    input_files = sorted(input_files)
    num_partitions = max(1, min(num_partitions, len(input_files)))
    parts: list[list[str]] = [[] for _ in range(num_partitions)]
    for i, f in enumerate(input_files):
        parts[i % num_partitions].append(f)
    return parts


def partition_done(out_dir: str, part_id: int) -> bool:
    return os.path.exists(os.path.join(out_dir, f"part={part_id}", "manifest.json"))


def _counters_from(ds: ray.data.Dataset) -> dict[str, Any]:
    """Small metrics groupby over the written partition output."""
    import pandas as pd

    pdf: pd.DataFrame = ds.groupby("status").count().to_pandas()
    by_status = dict(zip(pdf["status"], pdf["count()"].astype(int)))
    return {
        "docs_out": int(sum(by_status.values())),
        "by_status": by_status,
    }


def load_metrics(out_dir: str):
    """Job observability: one row per sealed partition from the
    manifests (part_id, docs_out, elapsed_sec, per-status counts).

    This is the engine's metrics surface (SURVEY.md §4 "Counters /
    metrics" row): counters live in the output layout itself, so any
    later session — or a monitoring job — can read progress without the
    original driver.
    """
    import glob

    import pandas as pd

    rows = []
    for path in sorted(glob.glob(os.path.join(out_dir, "part=*", "manifest.json"))):
        with open(path) as f:
            m = json.load(f)
        row = {
            "part_id": m["part_id"],
            "docs_out": m["docs_out"],
            "elapsed_sec": m["elapsed_sec"],
            "n_input_files": len(m.get("input_files", [])),
        }
        for status, n in m.get("by_status", {}).items():
            row[f"status_{status}"] = n
        rows.append(row)
    return pd.DataFrame(rows)


def run_extract_job(
    input_files: list[str],
    out_dir: str,
    *,
    num_partitions: int = 8,
    extract_kwargs: dict | None = None,
) -> dict[str, Any]:
    """Run (or resume) the extraction job; returns a job summary.

    Layout::

        out_dir/part=<k>/*.parquet       extraction output
        out_dir/part=<k>/manifest.json   lineage + counters (seal marker)
    """
    extract_kwargs = extract_kwargs or {}
    parts = plan_partitions(input_files, num_partitions)
    summary: dict[str, Any] = {"partitions": len(parts), "skipped": 0, "ran": 0}

    for part_id, files in enumerate(parts):
        if partition_done(out_dir, part_id):
            summary["skipped"] += 1
            continue
        final_dir = os.path.join(out_dir, f"part={part_id}")
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)

        t0 = time.monotonic()
        ds = extract_corpus(read_corpus(files), **extract_kwargs)
        ds.write_parquet(tmp_dir)
        elapsed = time.monotonic() - t0

        out_ds = ray.data.read_parquet(tmp_dir, columns=["status"])
        counters = _counters_from(out_ds)
        manifest = {
            "part_id": part_id,
            "input_files": files,
            "elapsed_sec": round(elapsed, 3),
            **counters,
        }
        # Seal: write manifest into tmp, then atomic rename of the dir.
        with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp_dir, final_dir)
        summary["ran"] += 1

    summary["manifests"] = [
        json.load(open(os.path.join(out_dir, f"part={k}", "manifest.json")))
        for k in range(len(parts))
        if partition_done(out_dir, k)
    ]
    return summary
