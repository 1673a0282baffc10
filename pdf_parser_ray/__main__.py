"""CLI — the reference's `replace / search / parse` subcommands
(example.py:11-61), re-expressed as corpus pipelines.

    python -m pdf_parser_ray extract  --input DIR --out DIR [--resume]
    python -m pdf_parser_ray search   --input DIR --query TEXT --out DIR
    python -m pdf_parser_ray replace  --input DIR --target T --replacement R --out DIR
    python -m pdf_parser_ray gen      --n-docs N --out DIR [--seed S]

On a real deployment these run under ``ray job submit``; standalone they
initialise a local session themselves (guarded — never when a driver
already owns the session).
"""

from __future__ import annotations

import argparse
import json
import sys


def _as_docs(df):
    """(url, extracted_text) → (doc_id, text): stable int64 doc id from
    the url (the corpus key).  ONE id rule shared by curate / dedup /
    ingest — cross-command fingerprint indexes stay compatible.  (abs of
    the 2^-64-probability INT64_MIN hash stays negative; ids are opaque,
    only stability matters.)"""
    import pandas as pd

    ids = (
        pd.util.hash_array(df["url"].to_numpy(dtype=object))
        .astype("int64")
        .__abs__()
    )
    return pd.DataFrame({"doc_id": ids, "text": df["extracted_text"]})


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # See pipelines.extract_corpus: the skew-split union plan is starved
    # by per-operator resource reservation (measured 16.7 s → 10.2 s).
    ctx.op_resource_reservation_enabled = False


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pdf_parser_ray")
    parser.add_argument("--num-cpus", type=int, default=None)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract", help="corpus extraction (the flagship)")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--resume", action="store_true",
                   help="partition-manifested resumable job")
    p.add_argument("--partitions", type=int, default=8)

    p = sub.add_parser("search", help="find a term across the corpus")
    p.add_argument("--input", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--case-sensitive", action="store_true")

    p = sub.add_parser("replace", help="content-stream text replacement")
    p.add_argument("--input", required=True)
    p.add_argument("--target")
    p.add_argument("--replacement")
    p.add_argument("--rules", help="rules table (.xlsx/.csv/.parquet): "
                   "col 0 = target, cols 1..n = replacement variants")
    p.add_argument("--variant", type=int, default=1,
                   help="which variant column of --rules to fold")
    p.add_argument("--out", required=True)
    p.add_argument("--page", type=int, default=0)

    p = sub.add_parser("gen", help="deterministic synthetic corpus")
    p.add_argument("--n-docs", type=int, required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=42)

    p = sub.add_parser(
        "curate",
        help="extract → quality gate → dedup → split → partitioned parquet",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-dup-frac", type=float, default=0.6)

    p = sub.add_parser(
        "dedup",
        help="corpus deduplication: exact winners or near-dup pairs",
    )
    p.add_argument("--input", required=True,
                   help="documents parquet (doc_id,text) or a raw corpus dir")
    p.add_argument("--out", required=True)
    p.add_argument("--mode", choices=["exact", "minhash", "simhash"],
                   default="exact")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="minhash: min estimated Jaccard for a pair")
    p.add_argument("--scrub", action="store_true",
                   help="minhash: write the surviving corpus (pairs -> "
                        "components -> drop non-canonical members) "
                        "instead of the pair list")

    p = sub.add_parser(
        "ingest",
        help="append a corpus increment, deduped against a fingerprint index",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--index", required=True,
                   help="fingerprint-index dir; created on first ingest")
    p.add_argument("--out", required=True)

    p = sub.add_parser(
        "pipeline",
        help="run a declarative JSON pipeline spec (source → stages → sink)",
    )
    p.add_argument("--spec", required=True, help="path to the spec JSON")
    p.add_argument("--out", default=None,
                   help="override the spec's sink with a parquet dir")

    p = sub.add_parser(
        "curate-web",
        help="boilerplate strip → Gopher gate → dedup → versioned table",
    )
    p.add_argument("--input", required=True,
                   help="documents parquet (doc_id,host,text) or corpus dir")
    p.add_argument("--table", required=True, help="TableLog root dir")
    p.add_argument("--permille", type=int, default=500,
                   help="host-boilerplate gate (line in ≥N‰ of host docs)")
    p.add_argument("--min-stopwords", type=int, default=0,
                   help="Gopher stopword floor (0 for non-English or "
                        "synthetic corpora; the library default is 2)")

    p = sub.add_parser(
        "compact",
        help="rewrite a directory of small parquet fragments into "
             "~target-size files (no shuffle — block coalescing)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--target-mb", type=int, default=128)

    args = parser.parse_args(argv)
    _ensure_ray(args.num_cpus)

    import ray.data

    from pdf_parser_ray.pipelines import extract_corpus, read_corpus

    if args.cmd == "extract":
        if args.resume:
            import glob
            import os

            from pdf_parser_ray.checkpoint import run_extract_job

            files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
            summary = run_extract_job(files, args.out, num_partitions=args.partitions)
            summary.pop("manifests", None)
            print(json.dumps(summary))
        else:
            ds = extract_corpus(read_corpus(args.input))
            ds.write_parquet(args.out)
            n = ray.data.read_parquet(args.out, columns=["url"]).count()
            print(json.dumps({"docs_out": n, "out": args.out}))
    elif args.cmd == "search":
        from pdf_parser_ray.search import search_corpus

        hits = search_corpus(
            extract_corpus(read_corpus(args.input)),
            args.query,
            case_sensitive=args.case_sensitive,
        )
        hits.write_parquet(args.out)
        print(json.dumps({"hits": ray.data.read_parquet(args.out).count()}))
    elif args.cmd == "replace":
        from pdf_parser_ray.replace import replace_corpus

        if args.rules:
            from pdf_parser_ray.replace import load_rules, rule_columns

            rules = rule_columns(load_rules(args.rules)).get(
                args.variant, []
            )
        elif args.target is not None and args.replacement is not None:
            rules = [(args.target, args.replacement)]
        else:
            raise SystemExit(
                "replace: need --rules or both --target and --replacement"
            )
        out = replace_corpus(
            read_corpus(args.input),
            rules,
            page_num=args.page,
        )
        out.write_parquet(args.out)
        import pyarrow.compute as pc

        n = (
            ray.data.read_parquet(args.out, columns=["n_replaced"])
            .map_batches(
                lambda t: t.filter(pc.greater(t.column("n_replaced"), 0)),
                batch_format="pyarrow",
            )
            .count()
        )
        print(json.dumps({"docs_changed": n}))
    elif args.cmd == "gen":
        from pdf_parser_ray.corpus import generate_corpus

        generate_corpus(args.n_docs, args.out, seed=args.seed)
        print(json.dumps({"generated": args.n_docs, "out": args.out}))
    elif args.cmd == "curate":
        import pandas as pd

        from pdf_parser_ray.pipelines import export_training_data

        extracted = extract_corpus(read_corpus(args.input)).select_columns(
            ["url", "extracted_text"]
        )

        counts = export_training_data(
            extracted.map_batches(_as_docs, batch_format="pandas"),
            args.out,
            min_tokens=args.min_tokens,
            max_dup_frac=args.max_dup_frac,
        )
        print(json.dumps({"splits": counts, "out": args.out}))
    elif args.cmd == "dedup":
        import pandas as pd
        import pyarrow.parquet as _pq

        import glob as _glob
        import os as _os

        # documents-style input (doc_id,text) is used directly; a raw
        # corpus dir (url/html/text) goes through extraction first.
        if _os.path.isfile(args.input):
            sample = [args.input]
        else:
            sample = sorted(
                _glob.glob(
                    _os.path.join(args.input, "**", "*.parquet"), recursive=True
                )
            )
        names = set(_pq.read_schema(sample[0]).names) if sample else set()
        if {"doc_id", "text"} <= names:
            from pdf_parser_ray.io_utils import read_parquet_clean

            docs = read_parquet_clean(args.input, columns=["doc_id", "text"])
        else:
            extracted = extract_corpus(read_corpus(args.input)).select_columns(
                ["url", "extracted_text"]
            )

            docs = extracted.map_batches(_as_docs, batch_format="pandas")

        # two consumers follow (the count + the dedup pass): materialize
        # so the extraction lineage runs once, not per consumer
        docs = docs.materialize()
        n_in = docs.count()
        if args.mode == "exact":
            from pdf_parser_ray.ops.dedup import exact_dedup

            winners = exact_dedup(docs)
            winners.write_parquet(args.out)
            n = ray.data.read_parquet(args.out, columns=["doc_id"]).count()
            print(json.dumps({"mode": "exact", "in_docs": n_in,
                              "survivors": n, "out": args.out}))
        elif args.mode == "minhash" and args.scrub:
            from pdf_parser_ray.pipelines import near_dedup_corpus

            survivors = near_dedup_corpus(
                docs, method="minhash", threshold=args.threshold
            )
            survivors.write_parquet(args.out)
            n = ray.data.read_parquet(args.out, columns=["doc_id"]).count()
            print(json.dumps({"mode": "minhash-scrub", "in_docs": n_in,
                              "survivors": n, "out": args.out}))
        elif args.mode == "minhash":
            from pdf_parser_ray.ops.dedup import minhash_lsh_pairs

            pairs = minhash_lsh_pairs(docs, threshold=args.threshold)
            pairs.write_parquet(args.out)
            n = ray.data.read_parquet(args.out, columns=["a"]).count()
            print(json.dumps({"mode": "minhash", "in_docs": n_in,
                              "pairs": n, "out": args.out}))
        else:
            from pdf_parser_ray.ops.dedup import simhash_near_pairs

            pairs = simhash_near_pairs(docs)
            pairs.write_parquet(args.out)
            n = ray.data.read_parquet(args.out, columns=["a"]).count()
            print(json.dumps({"mode": "simhash", "in_docs": n_in,
                              "pairs": n, "out": args.out}))
    elif args.cmd == "ingest":
        import glob
        import os

        import pandas as pd

        from pdf_parser_ray.pipelines import incremental_dedup

        extracted = extract_corpus(read_corpus(args.input)).select_columns(
            ["url", "extracted_text"]
        )

        docs = extracted.map_batches(_as_docs, batch_format="pandas")
        have_index = bool(
            glob.glob(os.path.join(args.index, "**", "*.parquet"), recursive=True)
        )
        if have_index:
            fresh = incremental_dedup(docs, args.index)
        else:
            # bootstrap: no prior index — only intra-increment dedup
            from pdf_parser_ray.ops.text_stats import layout_fingerprint

            def add_fp(df: pd.DataFrame) -> pd.DataFrame:
                return df.assign(fp=layout_fingerprint(df["text"]))

            from pdf_parser_ray.pipelines import dedup_rare

            fresh = dedup_rare(
                docs.map_batches(add_fp, batch_format="pandas"),
                "fp",
                order_col="doc_id",
            )
        fresh.write_parquet(args.out)
        wrote = glob.glob(os.path.join(args.out, "**", "*.parquet"), recursive=True)
        n = 0
        if wrote:  # an all-duplicate increment writes nothing
            # extend the index with the survivors' fingerprints (one part
            # dir per ingest, named by the output path — process-stable)
            import hashlib as _hl

            part = _hl.md5(args.out.encode("utf-8")).hexdigest()[:12]
            ray.data.read_parquet(args.out, columns=["fp"]).write_parquet(
                os.path.join(args.index, f"ingest_{part}")
            )
            n = ray.data.read_parquet(args.out, columns=["doc_id"]).count()
        print(json.dumps({"new_docs": n, "out": args.out, "index": args.index}))
    elif args.cmd == "curate-web":
        import re as _re

        import pandas as pd
        import pyarrow.parquet as _pq

        import glob as _glob
        import os as _os

        from pdf_parser_ray.pipelines import curate_web_corpus

        if _os.path.isfile(args.input):
            sample = [args.input]
        else:
            sample = sorted(_glob.glob(
                _os.path.join(args.input, "**", "*.parquet"), recursive=True
            ))
        names = set(_pq.read_schema(sample[0]).names) if sample else set()
        if {"doc_id", "text", "host"} <= names:
            from pdf_parser_ray.io_utils import read_parquet_clean

            docs = read_parquet_clean(
                args.input, columns=["doc_id", "host", "text"]
            )
        else:
            # raw corpus: extract, then derive host from the url
            extracted = extract_corpus(read_corpus(args.input)).select_columns(
                ["url", "extracted_text"]
            )
            host_re = _re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)")

            def to_docs(df: pd.DataFrame) -> pd.DataFrame:
                from pdf_parser_ray.io_utils import arrow_out

                return arrow_out(pd.DataFrame({
                    "doc_id": pd.util.hash_array(
                        df["url"].to_numpy(dtype=object)
                    ).view("int64"),
                    "host": df["url"].str.extract(host_re, expand=False)
                                     .fillna("").str.lower(),
                    "text": df["extracted_text"].fillna(""),
                }))

            docs = extracted.map_batches(to_docs, batch_format="pandas")
        summary = curate_web_corpus(
            docs, args.table, boiler_permille=args.permille,
            gate_kwargs={"min_stopword_hits": args.min_stopwords},
        )
        print(json.dumps(summary))
    elif args.cmd == "pipeline":
        from pdf_parser_ray.spec import run_spec

        with open(args.spec) as f:
            spec = json.load(f)
        if args.out:
            spec["sink"] = {"kind": "parquet", "path": args.out}
        print(json.dumps(run_spec(spec)))
    elif args.cmd == "compact":
        from pdf_parser_ray.io_utils import compact_parquet

        stats = compact_parquet(
            args.input, args.out, target_bytes=args.target_mb * 1024 * 1024
        )
        print(json.dumps({**stats, "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
