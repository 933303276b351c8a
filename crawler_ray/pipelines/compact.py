"""Small-file compaction — the table-maintenance pass every long-lived
100 TB corpus needs (crawl rounds and streaming ingest write one parquet
part per worker per round; a year of rounds is millions of tiny files
whose open/footer costs dominate reads).

Shape: stream the fragmented directory (``read_parquet`` plans one read
task per file group, so the input never concentrates), re-bucket rows
into ``target_rows_per_file`` blocks, and write back worker-parallel.
Atomic publish: output lands in ``<out_dir>.tmp`` and is renamed into
place only after a row-count audit, so a killed compaction never
replaces good fragments with a partial output (the same publish
convention as state/checkpoint.py).  A pre-existing compacted output
is parked at ``<out_dir>.old`` across the swap and deleted last, so no
crash point loses it either.

Compaction preserves ROWS, not order — callers that need an order have
a sort key in the data (the repo convention; e.g. the corpus carries
discovery_seq).
"""
from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq


def compact_dir(
    in_dir: str,
    out_dir: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Compact every ``*.parquet`` under ``in_dir`` into ``out_dir``.

    Returns {"rows", "files_before", "files_after"}.  Row preservation
    is audited before publish; raises if the compacted output lost or
    duplicated rows.

    Reader-visible gap note: the publish swap is two renames; a reader
    racing the swap (or a crash between them) can observe ``out_dir``
    absent for an instant even though the previous output survives at
    ``<out_dir>.old``.  Entry self-heals that state: if ``out_dir`` is
    missing but ``.old`` exists, the parked copy is renamed back into
    place before recompacting."""
    import ray.data

    # self-heal a crash between the publish renames: the previous
    # output was parked at <out_dir>.old but never republished
    old = out_dir.rstrip("/") + ".old"
    if not os.path.isdir(out_dir) and os.path.isdir(old):
        os.rename(old, out_dir)

    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(in_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    rows_before = sum(pq.read_metadata(f).num_rows for f in files)

    tmp = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    ds = ray.data.read_parquet(files)
    n_blocks = max(1, -(-rows_before // target_rows_per_file))  # ceil
    ds.repartition(n_blocks).write_parquet(tmp)

    out_files = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
    rows_after = sum(
        pq.read_metadata(os.path.join(tmp, f)).num_rows for f in out_files
    )
    if rows_after != rows_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} in, {rows_after} out"
        )
    # publish: park any previous output aside FIRST, then rename the
    # audited tmp into place, then drop the parked copy — no crash
    # point loses the previous output (a crash between the renames
    # leaves it recoverable under <out_dir>.old)
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    if os.path.isdir(out_dir):
        os.rename(out_dir, old)
    os.rename(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return {
        "rows": rows_after,
        "files_before": len(files),
        "files_after": len(out_files),
    }
