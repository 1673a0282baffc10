"""From-scratch WARC/1.0 container support — Common Crawl's native format.

The reference engine (herryqg/pdf-parser, pdf_gui.py:1560-1620) ingests
loose files from a local directory; at web scale the corpus arrives as
WARC archives, so the Ray engine grows the container format itself:

* a record-level writer (each record its OWN gzip member, the Common
  Crawl convention that makes archives splittable at member boundaries),
* a streaming record parser (plain or multi-member gzip, folded headers,
  binary-safe Content-Length framing, HTTP payload unwrapping),
* a Ray Data ``FileBasedDatasource`` that turns a directory of
  ``.warc``/``.warc.gz`` files into a streaming Dataset of corpus-schema
  rows (``url, warc_ts, html, ...``) in bounded Arrow blocks,
* a Dataset sink that writes one archive per batch with a manifest row
  each, so a resumable job can skip finished archives.

Format per ISO 28500 (public spec):
    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...            (headers; folded continuations)
    \\r\\n
    <payload: exactly Content-Length bytes>
    \\r\\n\\r\\n                            (record terminator)

Scale notes: the datasource yields blocks capped by record count AND
payload bytes, so a 1 GB archive streams through the object store as
~32 MB blocks instead of one giant block; gzip members are decoded
sequentially (one pass, no seek), which is exactly how Common Crawl
readers operate on S3 ranges.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime, timezone
from typing import Iterator

import pyarrow as pa

__all__ = [
    "WarcError",
    "build_record",
    "format_warc_date",
    "parse_warc_date",
    "write_warc_file",
    "iter_warc_records",
    "split_http_payload",
    "read_warc",
    "warc_to_corpus",
    "write_warc_dataset",
]


class WarcError(ValueError):
    """Malformed WARC framing."""


# ---------------------------------------------------------------- dates

def format_warc_date(ts_us: int) -> str:
    """Microseconds-since-epoch -> WARC-Date (ISO 8601, second precision, Z)."""
    dt = datetime.fromtimestamp(ts_us // 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def parse_warc_date(s: str) -> int:
    """WARC-Date -> microseconds since epoch (fractional seconds kept)."""
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


# --------------------------------------------------------------- writer

def _record_id(seed: bytes) -> str:
    """Deterministic urn:uuid record id (seeded, so archives are
    byte-reproducible for checkpoint reruns — same reason corpus.py keys
    every row on (seed, doc_id))."""
    h = hashlib.sha1(seed).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def build_record(warc_type: str, headers: dict, payload: bytes) -> bytes:
    """Serialize one WARC/1.0 record (headers + exact-length payload)."""
    out = [b"WARC/1.0\r\n"]
    base = {"WARC-Type": warc_type}
    base.update(headers)
    base["Content-Length"] = str(len(payload))
    if "WARC-Record-ID" not in base:
        base["WARC-Record-ID"] = _record_id(
            warc_type.encode() + payload[:64] + str(len(payload)).encode()
        )
    for k, v in base.items():
        out.append(f"{k}: {v}\r\n".encode("utf-8"))
    out.append(b"\r\n")
    out.append(payload)
    out.append(b"\r\n\r\n")
    return b"".join(out)


def _http_wrap(body: bytes, content_type: str) -> bytes:
    """Wrap a body as a minimal HTTP/1.1 200 response (what a crawler
    stores in a WARC ``response`` record)."""
    head = (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"
    )
    return head + body


def write_warc_file(
    path: str,
    rows: list[dict],
    compress: bool = True,
    warcinfo: str | None = "pdf_parser_ray warc writer",
) -> int:
    """Write corpus-schema rows (url, warc_ts, html) as WARC response
    records.  ``compress=True`` gzips EACH record as its own member
    (Common Crawl layout — archives stay splittable).  Returns the
    number of response records written."""

    def emit(f, rec: bytes):
        if compress:
            f.write(gzip.compress(rec, 6, mtime=0))
        else:
            f.write(rec)

    n = 0
    with open(path, "wb") as f:
        if warcinfo is not None:
            info = f"software: {warcinfo}\r\nformat: WARC/1.0\r\n".encode()
            emit(
                f,
                build_record(
                    "warcinfo",
                    {
                        "WARC-Date": format_warc_date(0),
                        "Content-Type": "application/warc-fields",
                    },
                    info,
                ),
            )
        for row in rows:
            body = row["html"] if row["html"] is not None else b""
            ctype = (
                "application/pdf"
                if body[:5] == b"%PDF-"
                else "text/html"
            )
            payload = _http_wrap(body, ctype)
            emit(
                f,
                build_record(
                    "response",
                    {
                        "WARC-Target-URI": row["url"],
                        "WARC-Date": format_warc_date(int(row["warc_ts"])),
                        "Content-Type": "application/http; msgtype=response",
                    },
                    payload,
                ),
            )
            n += 1
    return n


# --------------------------------------------------------------- parser

class _BufReader:
    """Minimal buffered reader over any ``.read(n)`` object — gives us
    binary-safe readline/read-exactly without io-module subclassing, and
    supports pushback of sniffed magic bytes."""

    def __init__(self, raw, initial: bytes = b""):
        self._raw = raw
        self._buf = bytearray(initial)
        self._pos = 0
        self._eof = False

    def _fill(self, want: int) -> None:
        while not self._eof and len(self._buf) - self._pos < want:
            chunk = self._raw.read(1 << 16)
            if not chunk:
                self._eof = True
                break
            self._buf += chunk
        if self._pos > (1 << 20) and self._pos * 2 > len(self._buf):
            del self._buf[: self._pos]
            self._pos = 0

    def readline(self) -> bytes:
        while True:
            i = self._buf.find(b"\n", self._pos)
            if i >= 0:
                line = bytes(self._buf[self._pos : i + 1])
                self._pos = i + 1
                return line
            if self._eof:
                line = bytes(self._buf[self._pos :])
                self._pos = len(self._buf)
                return line
            self._fill(len(self._buf) - self._pos + (1 << 16))

    def read(self, n: int) -> bytes:
        self._fill(n)
        out = bytes(self._buf[self._pos : self._pos + n])
        self._pos += len(out)
        return out


def _parse_headers(r: _BufReader) -> dict | None:
    """Read one header block.  Returns lower-cased-key dict (values keep
    case) or None at EOF.  Folded continuation lines (leading SP/HT) are
    joined per the spec."""
    line = r.readline()
    while line in (b"\r\n", b"\n"):
        line = r.readline()
    if not line:
        return None
    if not line.startswith(b"WARC/"):
        raise WarcError(f"expected WARC/ version line, got {line[:40]!r}")
    headers: dict[str, str] = {"__version__": line.strip().decode("latin-1")}
    last = None
    while True:
        line = r.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise WarcError(f"malformed header line {line[:40]!r}")
        last = k.strip().decode("latin-1").lower()
        headers[last] = v.strip().decode("latin-1")
    return headers


def iter_warc_records(fileobj) -> Iterator[tuple[dict, bytes]]:
    """Stream ``(headers, payload)`` from a WARC file object.

    Accepts plain or gzip input (multi-member — Python's gzip reader
    chains members, matching the per-record-member CC layout).  Header
    keys arrive lower-cased; payload is exactly Content-Length bytes, so
    binary payloads containing ``\\r\\n\\r\\n`` survive untouched."""
    magic = fileobj.read(2)
    if magic == b"\x1f\x8b":
        stream = gzip.GzipFile(fileobj=_FileWithPushback(fileobj, magic))
    else:
        stream = _FileWithPushback(fileobj, magic)
    r = _BufReader(stream)
    while True:
        headers = _parse_headers(r)
        if headers is None:
            return
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError as e:
            raise WarcError(f"bad Content-Length: {e}") from None
        payload = r.read(length)
        if len(payload) != length:
            raise WarcError(
                f"truncated record: wanted {length} payload bytes, "
                f"got {len(payload)}"
            )
        yield headers, payload


class _FileWithPushback:
    """Tiny ``.read`` shim that replays sniffed magic bytes first."""

    def __init__(self, raw, head: bytes):
        self._raw = raw
        self._head = head

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n is None or n < 0 or n >= len(self._head):
                out, self._head = self._head, b""
                rest = self._raw.read(n - len(out) if n and n > 0 else n)
                return out + (rest or b"")
            out, self._head = self._head[:n], self._head[n:]
            return out
        return self._raw.read(n)


def split_http_payload(payload: bytes) -> tuple[int, dict, bytes]:
    """Split an ``application/http`` payload into (status, headers, body).

    Lenient: a payload that doesn't start with ``HTTP/`` is returned
    whole as the body with status 0 (some archives store raw bodies)."""
    if not payload.startswith(b"HTTP/"):
        return 0, {}, payload
    cut = payload.find(b"\r\n\r\n")
    if cut < 0:
        return 0, {}, payload
    head, body = payload[:cut], payload[cut + 4 :]
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = 0
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return status, headers, body


# ------------------------------------------------------- Ray datasource

READ_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("record_type", pa.string()),
        ("http_status", pa.int32()),
        ("content_type", pa.string()),
    ]
)

# Block caps: a CC archive is ~1 GB with ~50k records; capping blocks at
# 256 records / 32 MB keeps batch x concurrency inside a worker heap and
# lets downstream stages pipeline while the file is still being read.
_BLOCK_RECORDS = 256
_BLOCK_BYTES = 32 << 20


def _rows_to_block(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=READ_SCHEMA)


try:  # Ray is always present in this repo, but keep the module importable
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        """Streaming WARC reader: one read task per file (files are the
        split unit, exactly like read_parquet's row groups), blocks
        yielded incrementally so a big archive never materializes."""

        _FILE_EXTENSIONS = ["warc", "warc.gz"]

        def __init__(self, paths, record_types=("response",), **kwargs):
            kwargs.setdefault("file_extensions", None)
            super().__init__(paths, **kwargs)
            self._record_types = set(record_types)

        def _read_stream(self, f, path: str):
            rows: list[dict] = []
            nbytes = 0
            for headers, payload in iter_warc_records(f):
                rtype = headers.get("warc-type", "")
                if rtype not in self._record_types:
                    continue
                status, http_headers, body = split_http_payload(payload)
                rows.append(
                    {
                        "url": headers.get("warc-target-uri", ""),
                        "warc_ts": parse_warc_date(
                            headers.get("warc-date", "1970-01-01T00:00:00Z")
                        ),
                        "html": body,
                        "record_type": rtype,
                        "http_status": status,
                        "content_type": http_headers.get(
                            "content-type", headers.get("content-type", "")
                        ),
                    }
                )
                nbytes += len(body)
                if len(rows) >= _BLOCK_RECORDS or nbytes >= _BLOCK_BYTES:
                    yield _rows_to_block(rows)
                    rows, nbytes = [], 0
            if rows:
                yield _rows_to_block(rows)

except ImportError:  # pragma: no cover
    WarcDatasource = None  # type: ignore[assignment]


def read_warc(paths, record_types=("response",), **kwargs):
    """``ray.data.read_datasource`` over WARC files.  One task per file;
    pass a directory or list of files like read_parquet."""
    import ray.data

    return ray.data.read_datasource(
        WarcDatasource(paths, record_types=record_types), **kwargs
    )


def warc_to_corpus(ds):
    """Adapt a read_warc Dataset to the corpus schema expected by the
    extraction pipeline (text/lang unknown in a raw crawl -> empty)."""

    def adapt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("warc_ts"),
                batch.column("html"),
                pa.array([""] * n, pa.string()),
                pa.array([""] * n, pa.string()),
            ],
            names=["url", "warc_ts", "html", "text", "lang"],
        )

    return ds.map_batches(adapt, batch_format="pyarrow")


# ------------------------------------------------------------ Ray sink

def write_warc_dataset(ds, out_dir: str, compress: bool = True):
    """Write a corpus-schema Dataset as WARC archives, one per batch.

    File names are content-addressed (sha1 of the batch's urls), so a
    rerun over identical input produces identical file names and a
    resumable job can skip archives that already exist — the same
    sealed-partition contract as checkpoint.py.  Returns the manifest
    Dataset (path, n_records, n_bytes)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        rows = batch.select(["url", "warc_ts", "html"]).to_pylist()
        key = hashlib.sha1(
            "\n".join(r["url"] for r in rows).encode()
        ).hexdigest()[:16]
        ext = "warc.gz" if compress else "warc"
        path = os.path.join(out_dir, f"part-{key}.{ext}")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            write_warc_file(tmp, rows, compress=compress)
            os.replace(tmp, path)
        return pa.Table.from_pylist(
            [
                {
                    "path": path,
                    "n_records": len(rows),
                    "n_bytes": sum(len(r["html"] or b"") for r in rows),
                }
            ]
        )

    def to_us(batch: pa.Table) -> pa.Table:
        # normalize warc_ts to raw int64 us for the writer
        col = batch.column("warc_ts")
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        return batch.set_column(
            batch.schema.get_field_index("warc_ts"), "warc_ts", col
        )

    return ds.map_batches(to_us, batch_format="pyarrow").map_batches(
        write_batch, batch_format="pyarrow"
    )


# ----------------------------------------------- CDX index + random access

def iter_gzip_members(fileobj) -> Iterator[tuple[int, int, bytes]]:
    """Yield ``(offset, compressed_length, decompressed_bytes)`` per gzip
    member.  This is what makes per-record-member archives randomly
    accessible: a CDX row stores (offset, length) and a reader later
    fetches exactly that byte range — no scan, which is how Common Crawl
    serves single pages out of 1 GB archives."""
    import zlib

    offset = 0
    buf = b""
    eof = False
    while True:
        if not buf and eof:
            return
        d = zlib.decompressobj(31)
        out = []
        consumed = 0
        while True:
            if not buf:
                chunk = fileobj.read(1 << 16)
                if not chunk:
                    eof = True
                    if consumed or out:
                        raise WarcError("truncated gzip member")
                    return
                buf = chunk
            out.append(d.decompress(buf))
            if d.eof:
                tail = d.unused_data
                consumed += len(buf) - len(tail)
                buf = tail
                yield offset, consumed, b"".join(out)
                offset += consumed
                break
            consumed += len(buf)
            buf = b""


def surt_key(url: str) -> str:
    """Sort-friendly URI Reordering Transform (public CDX convention):
    ``https://www.Example.org/A/b?z=1`` -> ``org,example)/a/b?z=1``.
    Host reversed comma-wise, lower-cased, leading www. dropped, scheme
    and default ports dropped, query params sorted."""
    u = url.strip()
    for scheme in ("https://", "http://"):
        if u.lower().startswith(scheme):
            u = u[len(scheme):]
            break
    host, slash, rest = u.partition("/")
    host = host.lower()
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    if host.endswith(":80") or host.endswith(":443"):
        host = host.rsplit(":", 1)[0]
    if host.startswith("www."):
        host = host[4:]
    path, q, query = rest.partition("?")
    key = ",".join(reversed(host.split("."))) + ")/" + path.lower()
    if q:
        key += "?" + "&".join(sorted(query.lower().split("&")))
    return key


def fetch_record(path: str, offset: int, length: int) -> tuple[dict, bytes]:
    """Random access: read one record by its CDX (offset, length).  For
    ``.gz`` archives the range is one gzip member; plain archives store
    raw record bytes at the offset."""
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    for headers, payload in iter_warc_records(io.BytesIO(blob)):
        return headers, payload
    raise WarcError(f"no record at {path}:{offset}+{length}")


CDX_SCHEMA = pa.schema(
    [
        ("urlkey", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("mime", pa.string()),
        ("http_status", pa.int32()),
        ("filename", pa.string()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
        ("record_type", pa.string()),
    ]
)


def index_warc_files(paths) -> "object":
    """Build a CDX index Dataset over WARC archives: one task per file,
    each streaming its members once (payload bodies are decompressed to
    locate boundaries but never shipped — only offsets leave the task).
    At fleet scale this is the classic index job: output is tiny
    (~100 B/record) regardless of archive size."""
    import os

    import ray.data

    if isinstance(paths, str):
        root = paths
        if os.path.isdir(root):
            paths = sorted(
                os.path.join(root, p)
                for p in os.listdir(root)
                if p.endswith((".warc", ".warc.gz"))
            )
        else:
            paths = [root]

    def index_file(batch: pa.Table) -> pa.Table:
        rows = []
        for path in batch.column("path").to_pylist():
            with open(path, "rb") as f:
                if path.endswith(".gz"):
                    members = iter_gzip_members(f)
                else:
                    members = _plain_member_spans(f)
                for offset, length, blob in members:
                    for headers, payload in iter_warc_records(
                        io.BytesIO(blob)
                    ):
                        status, hh, _body = split_http_payload(payload)
                        url = headers.get("warc-target-uri", "")
                        rows.append(
                            {
                                "urlkey": surt_key(url) if url else "",
                                "url": url,
                                "warc_ts": parse_warc_date(
                                    headers.get(
                                        "warc-date", "1970-01-01T00:00:00Z"
                                    )
                                ),
                                "mime": hh.get(
                                    "content-type",
                                    headers.get("content-type", ""),
                                ),
                                "http_status": status,
                                "filename": path,
                                "offset": offset,
                                "length": length,
                                "record_type": headers.get("warc-type", ""),
                            }
                        )
                        break  # one record per member
        return pa.Table.from_pylist(rows, schema=CDX_SCHEMA)

    src = ray.data.from_items([{"path": p} for p in paths])
    return src.map_batches(index_file, batch_format="pyarrow", batch_size=1)


def _plain_member_spans(f) -> Iterator[tuple[int, int, bytes]]:
    """Record spans for an UNcompressed archive: parse sequentially,
    tracking byte offsets (record end = terminator after payload)."""
    data = f.read()
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] in (b"\r\n",) or (
            pos < n and data[pos : pos + 1] == b"\n"
        ):
            pos += 2 if data[pos : pos + 2] == b"\r\n" else 1
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise WarcError("truncated header block")
        head = data[pos : head_end + 4]
        length = 0
        for line in head.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                length = int(line.split(b":", 1)[1])
        end = head_end + 4 + length + 4  # payload + \r\n\r\n
        yield pos, end - pos, data[pos:end]
        pos = end


# ------------------------------------------------------------ WET output

def write_wet_file(path: str, rows: list[dict], compress: bool = True,
                   text_col: str = "extracted_text") -> int:
    """Write extracted text as WET-style ``conversion`` records (payload
    is bare UTF-8 text, no HTTP wrapper — the Common Crawl WET layout)."""

    def emit(f, rec: bytes):
        f.write(gzip.compress(rec, 6, mtime=0) if compress else rec)

    n = 0
    with open(path, "wb") as f:
        for row in rows:
            body = (row.get(text_col) or "").encode("utf-8")
            emit(
                f,
                build_record(
                    "conversion",
                    {
                        "WARC-Target-URI": row["url"],
                        "WARC-Date": format_warc_date(int(row["warc_ts"])),
                        "Content-Type": "text/plain",
                    },
                    body,
                ),
            )
            n += 1
    return n


def write_wet_dataset(ds, out_dir: str, compress: bool = True,
                      text_col: str = "extracted_text"):
    """WET sink mirroring write_warc_dataset (content-addressed names,
    skip-if-exists, manifest rows)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        cols = ["url", "warc_ts", text_col]
        sub = batch.select(cols)
        ts = sub.column("warc_ts")
        if pa.types.is_timestamp(ts.type):
            sub = sub.set_column(1, "warc_ts", ts.cast(pa.int64()))
        rows = sub.to_pylist()
        key = hashlib.sha1(
            "\n".join(r["url"] for r in rows).encode()
        ).hexdigest()[:16]
        path = os.path.join(
            out_dir, f"part-{key}.warc.wet" + (".gz" if compress else "")
        )
        if not os.path.exists(path):
            tmp = path + ".tmp"
            write_wet_file(tmp, rows, compress=compress, text_col=text_col)
            os.replace(tmp, path)
        return pa.Table.from_pylist(
            [{"path": path, "n_records": len(rows),
              "n_bytes": sum(len(r[text_col] or "") for r in rows)}]
        )

    return ds.map_batches(write_batch, batch_format="pyarrow")


def read_wet(paths, **kwargs):
    """Read WET archives back as (url, warc_ts, text) — conversion
    records, payload decoded as UTF-8."""
    ds = read_warc(paths, record_types=("conversion",), **kwargs)

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("warc_ts"),
                pc.cast(batch.column("html"), pa.string()),
            ],
            names=["url", "warc_ts", "text"],
        )

    return ds.map_batches(decode, batch_format="pyarrow")
