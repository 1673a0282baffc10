"""JSONL / JSONL.gz shard I/O — the LLM-training interchange format
(The Pile, RedPajama, Dolma all ship newline-delimited-JSON shards).

Same sink contract as :mod:`pdf_parser_ray.warc`'s archive writer
(reference parity: the reference's JSON writers, main.py save paths —
see SURVEY §2 S6/S7 — emit per-document JSON; here the corpus-scale
equivalent is sharded NDJSON):

* one shard per batch, written by the map task that holds the batch —
  no driver funnel, no shuffle;
* content-addressed file names (sha1 of the serialized payload), so a
  rerun over identical input skips finished shards idempotently
  (tmp + atomic rename, the checkpoint.py sealed-partition contract);
* deterministic bytes: ``json.dumps`` with sorted keys + fixed
  separators, gzip with ``mtime=0`` so identical rows give identical
  shard bytes AND identical names across runs.

Reading goes through ``ray.data.read_json`` (Arrow's NDJSON reader) —
one task per shard, streaming; gzip is declared via
``arrow_open_stream_args`` keyed off the file extension.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os

import pyarrow as pa


def write_jsonl_dataset(
    ds,
    out_dir: str,
    *,
    compress: bool = True,
):
    """Write a Dataset as NDJSON shards, one per batch.

    Non-JSON-native values (timestamps, binary) serialize via
    ``default=str`` — round-trip fidelity is guaranteed for the JSON
    scalar types (int/float/str/bool/null), which is what training
    shards carry.  Returns the manifest Dataset
    (path, n_records, n_bytes) — consume it to drive the write.
    """
    os.makedirs(out_dir, exist_ok=True)
    ext = "jsonl.gz" if compress else "jsonl"

    def write_batch(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        payload = ("\n".join(
            json.dumps(r, sort_keys=True, ensure_ascii=False,
                       separators=(",", ":"), default=str)
            for r in rows
        ) + "\n").encode("utf-8")
        key = hashlib.sha1(payload).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{key}.{ext}")
        if not os.path.exists(path):
            data = (
                gzip.compress(payload, mtime=0) if compress else payload
            )
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, path)
        return pa.Table.from_pylist(
            [{"path": path, "n_records": len(rows), "n_bytes": len(payload)}]
        )

    return ds.map_batches(write_batch, batch_format="pyarrow")


def read_jsonl(paths, **kwargs):
    """``ray.data.read_json`` over NDJSON shards; ``.gz`` shards are
    decompressed by declaring gzip on the Arrow input stream.  One read
    task per shard — streaming, no driver materialization."""
    import ray.data

    probe = paths if isinstance(paths, str) else paths[0]
    if os.path.isdir(probe):
        names = os.listdir(probe)
        gz = any(n.endswith(".gz") for n in names)
    else:
        gz = str(probe).endswith(".gz")
    if gz:
        kwargs.setdefault("arrow_open_stream_args", {"compression": "gzip"})
        kwargs.setdefault("file_extensions", ["gz"])
    return ray.data.read_json(paths, **kwargs)
