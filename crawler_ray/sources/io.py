"""Table I/O — Lance when available, Parquet otherwise.

The north_rule persists frontier/corpus state in Lance tables; the
``lance`` package is not installed in this sandbox, so every read/write
goes through this shim: identical call sites, format chosen by probe.
Layout is always a DIRECTORY per logical table (one file per partition)
so a failed run can skip finished partitions (resumable output).
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - environment probe
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def table_uri(root: str, name: str) -> str:
    ext = "lance" if HAVE_LANCE else "parquet"
    return os.path.join(root, f"{name}.{ext}")


def write_table(table: pa.Table, uri: str, mode: str = "overwrite") -> None:
    """Write one Arrow table (driver-side small state: frontier deltas,
    checkpoints, manifests). Large outputs go through
    ``Dataset.write_parquet`` in the pipelines instead."""
    if HAVE_LANCE:
        lance.write_dataset(table, uri, mode=mode)
        return
    os.makedirs(uri, exist_ok=True)
    if mode == "overwrite":
        for f in os.listdir(uri):
            if f.endswith(".parquet"):
                os.remove(os.path.join(uri, f))
        part = 0
    else:  # append
        part = sum(1 for f in os.listdir(uri) if f.endswith(".parquet"))
    tmp = os.path.join(uri, f".part-{part:05d}.parquet.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(uri, f"part-{part:05d}.parquet"))  # atomic publish


def read_table(uri: str) -> pa.Table:
    if HAVE_LANCE:
        return lance.dataset(uri).to_table()
    files = sorted(
        os.path.join(uri, f) for f in os.listdir(uri) if f.endswith(".parquet")
    )
    return pa.concat_tables([pq.read_table(f) for f in files])


def read_dataset(uri: str, **kwargs):
    """Ray Data reader over a table uri (streaming path)."""
    import ray.data as rd

    if HAVE_LANCE:
        return rd.read_lance(uri, **kwargs)
    return rd.read_parquet(uri, **kwargs)
