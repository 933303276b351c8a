"""JSONL (newline-delimited JSON) source/sink — THE LLM-corpus
interchange format (Dolma, RedPajama, The Pile, OpenWebText all ship
as .jsonl/.jsonl.gz shards).

Ray-side shape mirrors sources/warc.py:

- ``write_jsonl_corpus(ds, out_dir)`` writes one ``.jsonl.gz`` per
  input block FROM INSIDE map_batches — each worker writes its own
  shard, nothing routes through the driver, names are content-hashed
  so re-runs are idempotent (the resumable-output contract).
  Serialization is pandas ``to_json(orient="records", lines=True)``
  (C-level, deterministic column order), gzip mtime=0 so shard bytes
  are byte-deterministic.
- ``read_jsonl_dataset(paths)`` reads whole shards via
  ``ray.data.read_binary_files`` (shards are the split unit — a
  100 TB corpus shards at file granularity) and parses each with
  ``pyarrow.json.read_json`` — the vectorized C++ NDJSON parser, no
  per-line Python loop.

Corruption posture: a truncated gzip stream or malformed JSON line
raises (ValueError / ArrowInvalid) — never a silent partial shard.
"""
from __future__ import annotations

import gzip
import hashlib
import io
import os

import pyarrow as pa


def write_jsonl_corpus(ds, out_dir: str, columns: list[str] | None = None):
    """Sink a Dataset to ``out_dir`` as .jsonl.gz shards, ONE PER BLOCK,
    written worker-side inside map_batches.  Returns a small Dataset of
    (jsonl_file, n_records, n_bytes) rows — consume it to drive the
    sink."""

    def sink(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "jsonl_file": pa.array([], type=pa.string()),
                    "n_records": pa.array([], type=pa.int64()),
                    "n_bytes": pa.array([], type=pa.int64()),
                }
            )
        df = t.select(columns).to_pandas() if columns else t.to_pandas()
        text = df.to_json(orient="records", lines=True, force_ascii=True)
        buf = gzip.compress(text.encode("utf-8"), mtime=0)
        name = f"part-{hashlib.md5(buf).hexdigest()}.jsonl.gz"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, path)  # atomic publish
        return pa.table(
            {
                "jsonl_file": pa.array([name], type=pa.string()),
                "n_records": pa.array([t.num_rows], type=pa.int64()),
                "n_bytes": pa.array([len(buf)], type=pa.int64()),
            }
        )

    return ds.map_batches(sink, batch_format="pyarrow")


def parse_jsonl_bytes(data: bytes) -> pa.Table:
    """Parse one shard's bytes (gzip or plain) with the vectorized
    Arrow NDJSON reader."""
    from pyarrow import json as pajson

    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return pajson.read_json(io.BytesIO(data))


def read_jsonl_dataset(paths):
    """Ray Dataset over .jsonl[.gz] file(s)/dir: whole-shard binary read
    + per-shard vectorized parse."""
    import ray.data

    files = ray.data.read_binary_files(paths)

    def explode(t: pa.Table) -> pa.Table:
        tables = [parse_jsonl_bytes(bytes(d)) for d in t["bytes"].to_pylist()]
        return pa.concat_tables(tables, promote_options="default")

    return files.map_batches(explode, batch_format="pyarrow")
