"""Corpus snapshot diffing — the incremental-recrawl companion to
pipelines/ingest.py (reference analog: the dump-state-model-corpus /
read-corpus round-trip in crawl.clj — the reference re-reads whole
corpora to compare runs; here two 100 TB snapshots diff with a
24-bytes-per-page exchange).

Given two crawl checkpoints (state/checkpoint.py layout: worker-written
parquet parts carrying ``url`` + interleaved ``spans``), classify every
URL as added / removed / changed / unchanged by CONTENT fingerprint:

  * each side is reduced batch-side to (url, side, fp) — fp is a
    blake2b over the span sequence's (kind, text, media_ref) triples,
    matching the input_hint span-equality contract (offsets excluded:
    layout shifts that preserve content are "unchanged"),
  * one hash-partitioned union-aggregate on url joins the sides —
    span payloads never cross the shuffle,
  * per-key sums classify (side 1 = old only, 2 = new only, 3 = both,
    fingerprints compared for 3).

Assumes each side holds one row per URL (the crawl's URL-seen set
guarantees it for checkpoint corpora); duplicate rows within a side
would double that side's sum and misclassify — audit with
``assert_unique`` if the input is not a crawl checkpoint.

The SQL-oracle-checked twin of this shuffle shape is
queries.py::snapshot_diff (driver-gated at sf0.01).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_FP_MASK = (1 << 62) - 1  # keep sums comfortably inside int64


def _span_fingerprints(spans_col) -> np.ndarray:
    """Content fingerprint per row over (kind, text, media_ref)
    sequences — offset-free, matching the reference's span-sequence
    equality invariant."""
    out = np.empty(len(spans_col), dtype=np.int64)
    for i, spans in enumerate(spans_col.to_pylist()):
        h = hashlib.blake2b(digest_size=8)
        for s in spans or ():
            for part in (s.get("kind") or "", s.get("text") or "", s.get("media_ref") or ""):
                h.update(part.encode("utf-8", "surrogatepass"))
                h.update(b"\x00")
            h.update(b"\x01")
        out[i] = int.from_bytes(h.digest(), "little") & _FP_MASK
    return out


def _side_triples(side: int):
    def fn(t: pa.Table) -> pa.Table:
        fp = _span_fingerprints(t["spans"])
        n = t.num_rows
        zeros = np.zeros(n, dtype=np.int64)
        return pa.table(
            {
                "url": t["url"],
                "side": pa.array(np.full(n, side, dtype=np.int64)),
                "fp_old": pa.array(fp if side == 1 else zeros),
                "fp_new": pa.array(fp if side == 2 else zeros),
            }
        )

    return fn


def diff_corpus_datasets(old_ds, new_ds):
    """(url, status) Dataset: status in added/removed/changed/unchanged.

    Both inputs are Ray Data Datasets with ``url`` + ``spans`` columns
    (e.g. ``CheckpointStore(dir).corpus_dataset()``)."""
    from ..stages.relational import bucketed_agg

    triples = old_ds.map_batches(
        _side_triples(1), batch_format="pyarrow"
    ).union(new_ds.map_batches(_side_triples(2), batch_format="pyarrow"))
    agg = bucketed_agg(
        triples,
        keys=["url"],
        sum_cols={"side": "side_sum", "fp_old": "fp_old", "fp_new": "fp_new"},
        key_dtypes={"url": "object"},
    )

    def classify(t: pa.Table) -> pa.Table:
        side = t["side_sum"].to_numpy()
        fo = t["fp_old"].to_numpy()
        fn_ = t["fp_new"].to_numpy()
        status = np.where(
            side == 2,
            "added",
            np.where(side == 1, "removed", np.where(fo == fn_, "unchanged", "changed")),
        )
        return pa.table(
            {
                "url": t["url"],
                "status": pa.array(status.astype(object), type=pa.string()),
            }
        )

    return agg.map_batches(classify, batch_format="pyarrow")


def diff_checkpoints(old_dir: str, new_dir: str, upto_round_old: int | None = None,
                     upto_round_new: int | None = None):
    """Diff two crawl checkpoint directories (or two round-prefixes of
    the same checkpoint: ``diff_checkpoints(d, d, upto_round_old=1)``
    shows what later rounds added)."""
    from ..state.checkpoint import CheckpointStore

    old_ds = CheckpointStore(old_dir).corpus_dataset(upto_round=upto_round_old)
    new_ds = CheckpointStore(new_dir).corpus_dataset(upto_round=upto_round_new)
    return diff_corpus_datasets(old_ds, new_ds)
