"""CLI subcommands driven in-process (the session fixture owns Ray)."""

import json

import pytest

from pdf_parser_ray.__main__ import main


@pytest.fixture(scope="module")
def cli_corpus(ray_session, tmp_path_factory, capsys=None):
    d = str(tmp_path_factory.mktemp("cli") / "corpus")
    assert main(["gen", "--n-docs", "60", "--out", d]) == 0
    return d


def run_cli(capsys, args):
    assert main(args) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_extract_cmd(cli_corpus, tmp_path, capsys):
    res = run_cli(capsys, ["extract", "--input", cli_corpus,
                           "--out", str(tmp_path / "out")])
    assert res["docs_out"] == 60


def test_search_cmd(cli_corpus, tmp_path, capsys):
    res = run_cli(capsys, ["search", "--input", cli_corpus, "--query", "alpha",
                           "--out", str(tmp_path / "hits")])
    assert res["hits"] >= 0


def test_replace_cmd(cli_corpus, tmp_path, capsys):
    res = run_cli(capsys, ["replace", "--input", cli_corpus,
                           "--target", "zzz-not-there", "--replacement", "x",
                           "--out", str(tmp_path / "rep")])
    assert res["docs_changed"] == 0


def test_resume_cmd(cli_corpus, tmp_path, capsys):
    out = str(tmp_path / "job")
    r1 = run_cli(capsys, ["extract", "--input", cli_corpus, "--out", out,
                          "--resume", "--partitions", "2"])
    assert r1["ran"] >= 1
    r2 = run_cli(capsys, ["extract", "--input", cli_corpus, "--out", out,
                          "--resume", "--partitions", "2"])
    assert r2["ran"] == 0 and r2["skipped"] == r1["ran"] + r1["skipped"]


def test_curate_cmd(cli_corpus, tmp_path, capsys):
    out = str(tmp_path / "cur")
    res = run_cli(capsys, ["curate", "--input", cli_corpus, "--out", out])
    assert sum(res["splits"].values()) > 0
    # deterministic: a second run over the same corpus gives identical splits
    res2 = run_cli(capsys, ["curate", "--input", cli_corpus,
                            "--out", str(tmp_path / "cur2")])
    assert res2["splits"] == res["splits"]


def test_ingest_cmd_incremental(cli_corpus, tmp_path, capsys):
    """Bootstrap ingest takes everything; re-ingesting the same corpus
    against the now-populated index yields zero new docs."""
    idx = str(tmp_path / "fpidx")
    r1 = run_cli(capsys, ["ingest", "--input", cli_corpus,
                          "--index", idx, "--out", str(tmp_path / "b1")])
    assert r1["new_docs"] > 0
    r2 = run_cli(capsys, ["ingest", "--input", cli_corpus,
                          "--index", idx, "--out", str(tmp_path / "b2")])
    assert r2["new_docs"] == 0


def test_dedup_cmd_exact_and_pairs(cli_corpus, tmp_path, capsys):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    # documents-style input with one exact duplicate pair
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta gamma", "alpha beta gamma", "delta epsilon"],
        }
    )
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(docs), str(d / "docs.parquet"))

    res = run_cli(capsys, ["dedup", "--input", str(d),
                           "--out", str(tmp_path / "winners"), "--mode", "exact"])
    assert res["in_docs"] == 3 and res["survivors"] == 2

    res = run_cli(capsys, ["dedup", "--input", str(d),
                           "--out", str(tmp_path / "pairs"), "--mode", "minhash"])
    assert res["pairs"] == 1  # the identical pair

    # raw-corpus input goes through extraction first
    res = run_cli(capsys, ["dedup", "--input", cli_corpus,
                           "--out", str(tmp_path / "cw"), "--mode", "exact"])
    assert res["in_docs"] == 60 and 0 < res["survivors"] <= 60


def test_compact_cmd(cli_corpus, tmp_path, capsys):
    res = run_cli(capsys, ["compact", "--input", cli_corpus,
                           "--out", str(tmp_path / "compacted"),
                           "--target-mb", "64"])
    assert res["rows"] == 60
    assert res["files_out"] >= 1


def test_job_entrypoint(cli_corpus, tmp_path, capsys):
    """jobs/extract_job.py — the `ray job submit` entrypoint — runs and
    resumes in-process (the session fixture owns Ray; the script's
    ray.init fallback is a no-op when a session exists)."""
    import jobs.extract_job as job

    out = str(tmp_path / "jobout")
    assert job.main(["--input", cli_corpus, "--out", out,
                     "--partitions", "2"]) == 0
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["ran"] >= 1
    assert job.main(["--input", cli_corpus, "--out", out,
                     "--partitions", "2"]) == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["ran"] == 0 and r2["skipped"] == r1["ran"] + r1["skipped"]


def test_replace_cmd_rules_file(cli_corpus, tmp_path, capsys):
    from test_replace import _write_xlsx

    rules = str(tmp_path / "rules.xlsx")
    _write_xlsx(rules, [[["zzz-not-there", "x", "y"]]])
    res = run_cli(capsys, ["replace", "--input", cli_corpus,
                           "--rules", rules, "--variant", "2",
                           "--out", str(tmp_path / "rep")])
    assert res["docs_changed"] == 0


class TestPipelineSpec:
    def test_build_and_run_quality_gate(self, ray_session):
        from pdf_parser_ray.spec import build_pipeline, run_spec

        spec = {
            "source": {
                "kind": "parquet",
                "path": "/root/testdata/sf0.001/documents.parquet",
                "columns": ["doc_id", "text"],
            },
            "stages": [
                {"op": "quality"},
                {"op": "filter", "expr": "n_tokens >= 5"},
                {"op": "limit", "n": 50},
            ],
        }
        ds = build_pipeline(spec)
        import ray.data as rd

        assert isinstance(ds, rd.Dataset)  # lazy until consumed
        out = run_spec(spec)
        assert 0 < out["rows"] <= 50

    def test_parquet_sink_and_corpus_source(self, ray_session, tmp_path):
        from pdf_parser_ray.corpus import ensure_corpus
        from pdf_parser_ray.spec import run_spec

        corpus = ensure_corpus(60, seed=7)
        spec = {
            "source": {"kind": "corpus", "path": corpus},
            "stages": [
                {"op": "extract"},
                {"op": "select", "columns": ["url", "status", "extracted_text"]},
            ],
            "sink": {"kind": "parquet", "path": str(tmp_path / "o")},
        }
        out = run_spec(spec)
        assert out["rows"] == 60
        # re-running at the same path must refuse, not count stale files
        # from the previous run as freshly written rows (ADVICE r2)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="does not truncate"):
            run_spec(spec)
        import ray.data as rd

        assert set(rd.read_parquet(out["out"]).schema().names) == {
            "url", "status", "extracted_text",
        }

    def test_unknown_op_lists_choices(self):
        from pdf_parser_ray.spec import build_pipeline

        spec = {
            "source": {
                "kind": "parquet",
                "path": "/root/testdata/sf0.001/documents.parquet",
            },
            "stages": [{"op": "frobnicate"}],
        }
        with pytest.raises(ValueError) as e:
            build_pipeline(spec)
        assert "frobnicate" in str(e.value) and "quality" in str(e.value)

    def test_cli_pipeline_cmd(self, tmp_path):
        import json as _json
        import subprocess
        import sys

        spec = {
            "source": {
                "kind": "parquet",
                "path": "/root/testdata/sf0.001/documents.parquet",
                "columns": ["doc_id", "text"],
            },
            "stages": [{"op": "token_stats"}],
        }
        spec_file = tmp_path / "spec.json"
        spec_file.write_text(_json.dumps(spec))
        r = subprocess.run(
            [sys.executable, "-m", "pdf_parser_ray", "--num-cpus", "4",
             "pipeline", "--spec", str(spec_file),
             "--out", str(tmp_path / "out")],
            capture_output=True, text=True, cwd="/root/repo", timeout=180,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = _json.loads(r.stdout.strip().splitlines()[-1])
        assert payload["rows"] == 500


def test_curate_web_cmd(tmp_path):
    import json as _json
    import subprocess
    import sys

    gen = subprocess.run(
        [sys.executable, "-m", "pdf_parser_ray", "--num-cpus", "4",
         "gen", "--n-docs", "60", "--out", str(tmp_path / "c")],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert gen.returncode == 0, gen.stderr[-1500:]
    r = subprocess.run(
        [sys.executable, "-m", "pdf_parser_ray", "--num-cpus", "4",
         "curate-web", "--input", str(tmp_path / "c"),
         "--table", str(tmp_path / "t")],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    payload = _json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["in"] == 60 and payload["version"] == 0
    assert 0 < payload["after_dedup"] <= payload["after_gate"] <= 60
    # rerun appends version 1
    r2 = subprocess.run(
        [sys.executable, "-m", "pdf_parser_ray", "--num-cpus", "4",
         "curate-web", "--input", str(tmp_path / "c"),
         "--table", str(tmp_path / "t")],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    payload2 = _json.loads(r2.stdout.strip().splitlines()[-1])
    assert payload2["version"] == 1
