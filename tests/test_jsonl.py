"""JSONL / JSONL.gz shard sink + reader (pdf_parser_ray/jsonl.py):
round-trip fidelity, idempotent reruns, deterministic bytes."""

import gzip
import os

import pandas as pd
import pytest
import ray.data

from pdf_parser_ray.jsonl import read_jsonl, write_jsonl_dataset


@pytest.fixture()
def frame():
    return pd.DataFrame(
        {
            "doc_id": range(50),
            "text": [
                f"doc {i} with unicode é and\nnewline \"quoted\"" for i in range(50)
            ],
            "score": [i / 7 for i in range(50)],
        }
    )


def _write(frame, out, **kw):
    ds = ray.data.from_pandas(frame).repartition(4)
    return write_jsonl_dataset(ds, str(out), **kw).to_pandas()


class TestJsonlRoundtrip:
    def test_gzip_roundtrip_exact(self, ray_session, tmp_path, frame):
        man = _write(frame, tmp_path / "j")
        assert man["n_records"].sum() == 50
        back = (
            read_jsonl(str(tmp_path / "j"))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(back[["doc_id", "text", "score"]], frame)

    def test_uncompressed_roundtrip(self, ray_session, tmp_path, frame):
        _write(frame, tmp_path / "p", compress=False)
        names = os.listdir(tmp_path / "p")
        assert all(n.endswith(".jsonl") for n in names)
        back = read_jsonl(str(tmp_path / "p")).to_pandas()
        assert len(back) == 50

    def test_null_text_roundtrips(self, ray_session, tmp_path):
        df = pd.DataFrame({"doc_id": [0, 1], "text": ["x", None]})
        _write(df, tmp_path / "n")
        back = (
            read_jsonl(str(tmp_path / "n"))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert back.loc[0, "text"] == "x"
        assert pd.isna(back.loc[1, "text"])

    def test_idempotent_rerun_same_shards(self, ray_session, tmp_path, frame):
        _write(frame, tmp_path / "j")
        first = sorted(os.listdir(tmp_path / "j"))
        bytes_first = {
            n: (tmp_path / "j" / n).read_bytes() for n in first
        }
        _write(frame, tmp_path / "j")  # rerun: skip-existing, no dupes
        assert sorted(os.listdir(tmp_path / "j")) == first
        for n in first:  # mtime=0 gzip => byte-identical shards
            assert (tmp_path / "j" / n).read_bytes() == bytes_first[n]

    def test_shard_bytes_are_valid_ndjson(self, ray_session, tmp_path, frame):
        _write(frame, tmp_path / "j")
        import json

        n = 0
        for name in os.listdir(tmp_path / "j"):
            raw = gzip.decompress((tmp_path / "j" / name).read_bytes())
            lines = raw.decode("utf-8").splitlines()
            for line in lines:
                json.loads(line)
            n += len(lines)
        assert n == 50


def test_query_roundtrip_matches_source(ray_session):
    from pdf_parser_ray.queries import QUERIES

    out = (
        QUERIES["jsonl_roundtrip"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import hashlib

    import pyarrow.parquet as pq

    src = (
        pq.read_table("/root/testdata/sf0.001/documents.parquet")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == src["doc_id"].tolist()
    exp = src["text"].fillna("").map(
        lambda t: hashlib.md5(t.encode()).hexdigest()
    )
    assert out["text_md5"].tolist() == exp.tolist()
