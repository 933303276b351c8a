"""WARC 1.0 reader/writer (pure stdlib) — the web-archive interchange
format (ISO 28500; Common Crawl's container format).

Layout follows the standard archive convention: ONE GZIP MEMBER PER
RECORD, so readers can split a .warc.gz at member boundaries and a
100 TB archive shards record-aligned without decompressing upstream
bytes.  Response records carry an HTTP/1.1 envelope (status line +
headers + body), like real crawler output.

Reference parity: the reference appends crawled page corpora via
crawl/write (crawler.clj); this module gives that same corpus a
standards-compliant interchange surface.  Ray-side shape:

- ``write_warc_corpus(ds, out_dir)`` writes one ``.warc.gz`` per input
  block FROM INSIDE map_batches — each worker writes its own files,
  nothing routes through the driver, and file names are content-hashed
  so re-runs are idempotent (the resumable-output contract).
- ``read_warc_dataset(paths)`` parses WARC files into a Dataset via
  ``ray.data.read_binary_files`` + a vectorized record explode.

Corruption posture matches stages/codecs.py: a truncated gzip member,
short content block, or malformed header raises ValueError — never a
silent partial record.
"""
from __future__ import annotations

import gzip
import hashlib
import os
import zlib

import pyarrow as pa

_CRLF = b"\r\n"
_WARC_VERSION = b"WARC/1.0"
# fixed default so artifacts are deterministic; callers pass real dates
_DEFAULT_DATE = "2026-01-01T00:00:00Z"


def _record_id(url: str, payload: bytes) -> str:
    h = hashlib.md5(url.encode("utf-8") + b"\x00" + payload).hexdigest()
    return f"<urn:md5:{h}>"


def warc_record_bytes(
    url: str,
    payload: bytes,
    date: str = _DEFAULT_DATE,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    extra_headers: dict[str, str] | None = None,
    warc_type: str = "response",
) -> bytes:
    """One uncompressed WARC record: WARC header block, CRLF, content
    block (Content-Length bytes), CRLF CRLF.

    ``warc_type="response"`` wraps the payload in an HTTP/1.1 envelope
    (a crawler capture).  ``warc_type="conversion"`` stores the payload
    bare with Content-Type text/plain — the WET convention (extracted
    text derived from a capture, ISO 28500 §6.8)."""
    if warc_type == "response":
        http_head = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii")
        block = http_head + payload
        block_ctype = "application/http;msgtype=response"
    else:
        block = payload
        block_ctype = "text/plain"
    headers = [
        (_WARC_VERSION.decode(), None),
        ("WARC-Type", warc_type),
        ("WARC-Target-URI", url),
        ("WARC-Date", date),
        ("WARC-Record-ID", _record_id(url, payload)),
        ("Content-Type", block_ctype),
        ("Content-Length", str(len(block))),
    ]
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    lines = [headers[0][0].encode("ascii")]
    for k, v in headers[1:]:
        lines.append(f"{k}: {v}".encode("utf-8"))
    return _CRLF.join(lines) + _CRLF + _CRLF + block + _CRLF + _CRLF


def write_warc(records, path: str) -> int:
    """Write ``(url, payload_bytes)`` pairs (or dicts with url/payload/
    optional date/status/extra_headers) as a .warc.gz with one gzip
    member per record.  Returns the record count."""
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            if isinstance(rec, dict):
                raw = warc_record_bytes(
                    rec["url"],
                    rec["payload"],
                    date=rec.get("date", _DEFAULT_DATE),
                    status=rec.get("status", 200),
                    extra_headers=rec.get("extra_headers"),
                )
            else:
                url, payload = rec
                raw = warc_record_bytes(url, payload)
            # mtime=0: byte-deterministic members -> idempotent reruns
            f.write(gzip.compress(raw, mtime=0))
            n += 1
    return n


def _split_members(data: bytes) -> list[bytes]:
    """Decompress a multi-member gzip stream into per-member payloads.
    Truncated or corrupt members raise ValueError."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member at offset {pos}: {e}") from e
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        out.append(chunk)
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"gzip member at offset {pos} consumed no bytes")
        pos += consumed
    return out


def _split_uncompressed(data: bytes) -> list[bytes]:
    """Split concatenated uncompressed WARC records by walking each
    header's Content-Length."""
    members = []
    pos = 0
    while pos < len(data):
        sep = data.find(_CRLF + _CRLF, pos)
        if sep < 0:
            raise ValueError("trailing garbage after last WARC record")
        head = data[pos:sep]
        clen = -1
        for ln in head.split(_CRLF):
            if ln.lower().startswith(b"content-length:"):
                clen = int(ln.split(b":", 1)[1])
        if clen < 0:
            raise ValueError("WARC record missing Content-Length")
        end = sep + 4 + clen + 4
        if end > len(data):
            raise ValueError("WARC content block truncated")
        members.append(data[pos:end])
        pos = end
    return members


def split_records(data: bytes) -> list[bytes]:
    """Split a WARC byte stream into uncompressed records, whether it
    arrives gzip-membered or already decompressed (readers like
    ray.data.read_binary_files auto-decompress by .gz extension, which
    concatenates the members)."""
    if data[:2] == b"\x1f\x8b":
        return _split_members(data)
    return _split_uncompressed(data)


def parse_warc_record(raw: bytes) -> dict:
    """Parse one uncompressed WARC record into
    {url, type, date, status, payload, headers}."""
    sep = raw.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("WARC record missing header terminator")
    head, rest = raw[:sep], raw[sep + 4 :]
    lines = head.split(_CRLF)
    if lines[0] != _WARC_VERSION:
        raise ValueError(f"unsupported WARC version line: {lines[0]!r}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if not _:
            raise ValueError(f"malformed WARC header line: {ln!r}")
        headers[k.decode("utf-8").strip()] = v.decode("utf-8").strip()
    try:
        clen = int(headers["Content-Length"])
    except (KeyError, ValueError) as e:
        raise ValueError("WARC record missing valid Content-Length") from e
    if len(rest) < clen:
        raise ValueError(
            f"WARC content block truncated: {len(rest)} < {clen} bytes"
        )
    block = rest[:clen]
    status, payload = 0, block
    if headers.get("Content-Type", "").startswith("application/http"):
        hsep = block.find(_CRLF + _CRLF)
        if hsep < 0:
            raise ValueError("HTTP envelope missing header terminator")
        status_line = block[:hsep].split(_CRLF)[0]
        parts = status_line.split(b" ")
        if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
            raise ValueError(f"malformed HTTP status line: {status_line!r}")
        status = int(parts[1])
        payload = block[hsep + 4 :]
    return {
        "url": headers.get("WARC-Target-URI", ""),
        "type": headers.get("WARC-Type", ""),
        "date": headers.get("WARC-Date", ""),
        "status": status,
        "payload": payload,
        "headers": headers,
    }


def read_warc(path: str) -> list[dict]:
    """Read every record of one .warc.gz (or uncompressed .warc)."""
    with open(path, "rb") as f:
        data = f.read()
    return [parse_warc_record(m) for m in split_records(data)]


def records_to_table(records: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in records], type=pa.string()),
            "warc_type": pa.array([r["type"] for r in records], type=pa.string()),
            "status": pa.array([r["status"] for r in records], type=pa.int32()),
            "payload": pa.array([r["payload"] for r in records], type=pa.large_binary()),
            "lang": pa.array(
                [
                    r["headers"].get("WARC-Identified-Content-Language", "")
                    for r in records
                ],
                type=pa.string(),
            ),
        }
    )


def read_warc_dataset(paths):
    """Ray Dataset over WARC file(s)/dir: read_binary_files (workers
    read whole record-aligned archives — the unit WARC shards at) then
    a vectorized record explode per file."""
    import ray.data

    files = ray.data.read_binary_files(paths)

    def explode(t: pa.Table) -> pa.Table:
        tables = []
        for data in t["bytes"].to_pylist():
            members = split_records(bytes(data))
            tables.append(records_to_table([parse_warc_record(m) for m in members]))
        return pa.concat_tables(tables) if tables else records_to_table([])

    return files.map_batches(explode, batch_format="pyarrow")


def write_warc_corpus(
    ds,
    out_dir: str,
    url_col: str = "url",
    payload_col: str = "payload",
    lang_col: str | None = None,
    warc_type: str = "response",
):
    """Sink a Dataset to ``out_dir`` as .warc.gz files, ONE PER BLOCK,
    written worker-side inside map_batches.  File names are the md5 of
    the member bytes, so a re-run overwrites identical files in place
    (idempotent, resume-safe — the crawl checkpoint convention).
    Returns a small Dataset of (warc_file, n_records, n_bytes) rows."""

    def sink(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "warc_file": pa.array([], type=pa.string()),
                    "n_records": pa.array([], type=pa.int64()),
                    "n_bytes": pa.array([], type=pa.int64()),
                }
            )
        urls = t[url_col].to_pylist()
        payloads = t[payload_col].to_pylist()
        extra = None
        if lang_col is not None:
            extra = [
                {"WARC-Identified-Content-Language": v}
                for v in t[lang_col].to_pylist()
            ]
        buf = b"".join(
            gzip.compress(
                warc_record_bytes(
                    u,
                    bytes(p),
                    extra_headers=extra[i] if extra else None,
                    warc_type=warc_type,
                ),
                mtime=0,
            )
            for i, (u, p) in enumerate(zip(urls, payloads))
        )
        name = f"part-{hashlib.md5(buf).hexdigest()}.warc.gz"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)  # atomic publish
        return pa.table(
            {
                "warc_file": pa.array([name], type=pa.string()),
                "n_records": pa.array([len(urls)], type=pa.int64()),
                "n_bytes": pa.array([len(buf)], type=pa.int64()),
            }
        )

    return ds.map_batches(sink, batch_format="pyarrow")
