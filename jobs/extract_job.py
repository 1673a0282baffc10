"""Cluster job entrypoint for the extraction pipeline — the script a
fixed-size multi-node deployment submits with ``ray job submit``:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python jobs/extract_job.py \
           --input 's3://bucket/crawl/*.parquet' \
           --out   's3://bucket/extracted/' \
           --partitions 4096

Inside a job-server container ``ray.init(address="auto")`` attaches to
the running cluster; standalone (no cluster) it falls back to a local
session so the same script is testable single-node.  The body is the
library's resumable partition runner (`checkpoint.run_extract_job`):
``out/part=<k>/`` + ``manifest.json`` lineage per partition, sealed
partitions skipped on resubmit — so a preempted or failed job is
re-submitted with the SAME command line and only unfinished partitions
run.  Per-partition counters land in the manifests; the job prints one
JSON summary line for the submitter's log.

Sizing guidance (100 TB / 10^12 docs, 256 nodes): ``--partitions``
should be ≫ cluster size (each partition a file-list slice of
~50-100 GB); concurrency lives INSIDE a partition via the streaming
executor, resumability BETWEEN partitions.  See README "Scale design".
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

# no install step (see README): make the repo importable — for this
# driver AND for local-mode Ray workers (which inherit the environment;
# under `ray job submit --working-dir .` the job server ships the repo
# instead) — when invoked as a file path rather than from the repo root
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="resumable corpus extraction job")
    ap.add_argument("--input", required=True,
                    help="input parquet glob or directory")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--partitions", type=int, default=64,
                    help="checkpoint partitions (file-list slices)")
    ap.add_argument("--no-spans", action="store_true",
                    help="skip span reconstruction (text-only extraction)")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        try:
            # under `ray job submit` / an existing cluster
            ray.init(address="auto", logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", include_dashboard=False,
                     logging_level="ERROR")

    from pdf_parser_ray.checkpoint import run_extract_job

    if os.path.isdir(args.input):
        files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    else:
        files = sorted(glob.glob(args.input))
    if not files:
        print(json.dumps({"error": f"no parquet files match {args.input}"}))
        return 2

    summary = run_extract_job(
        files,
        args.out,
        num_partitions=args.partitions,
        extract_kwargs={"include_spans": not args.no_spans},
    )
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
