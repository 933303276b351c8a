"""Incremental corpus ingest — the streaming-append pattern a living
100 TB corpus runs daily: each round a batch of new documents arrives,
is exact-deduped against EVERYTHING already ingested (and within
itself, first-wins by doc_id), and the survivors are appended as a new
round partition.

State layout under ``corpus_dir``:
    round=NNNN/*.parquet      accepted docs, one dir per round (the
                              resume/skip unit, worker-written)
    fingerprints.parquet      md5-128 of every ingested text (two
                              int64 columns — the only cross-round
                              state; text itself never re-read)
    _manifest.json            {"rounds": {round: rows}} — a round is
                              committed only when recorded here

Crash recovery (re-running an uncommitted round whose dir exists):
the commit order is data -> fingerprints -> manifest, each step an
atomic rename, so exactly two orphan states are possible and both
converge without data loss:
  * dir written, fingerprints NOT yet updated — the dir is deleted
    and the round redone from the input (nothing blocks re-ingest);
  * dir written AND fingerprints updated, manifest lost — the dir is
    READ BACK and committed as-is (its fps provably cover it), never
    deleted: deleting here would lose the only accepted copies while
    the committed fps block the texts from ever re-ingesting.

Dedup shape (the dataprep rule: bytes don't move): fingerprints are
computed per batch where the text already is; the existing-fp set is
broadcast as one packed sorted array while the table holds <=
fp_broadcast_cap rows; past the cap the IMPLEMENTED join regime
hash-joins new fps against the fingerprint parquet and collects only
hit doc_ids (forced-regime test asserts equality); within-round
winners resolve in 64 fp-hash buckets shuffling (fp, doc_id) only.
"""
from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_FP_SCHEMA = pa.schema([pa.field("h1", pa.int64()), pa.field("h2", pa.int64())])


def _fp_batch(t: pa.Table) -> pa.Table:
    """md5-128 text fingerprints: (doc_id, h1, h2)."""
    import hashlib

    h1s, h2s = [], []
    for txt in t["text"].to_pylist():
        dg = hashlib.md5(txt.encode()).digest()
        h1s.append(int.from_bytes(dg[:8], "little", signed=False) - (1 << 63))
        h2s.append(int.from_bytes(dg[8:], "little", signed=False) - (1 << 63))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "h1": pa.array(h1s, type=pa.int64()),
            "h2": pa.array(h2s, type=pa.int64()),
        }
    )


def _manifest_path(corpus_dir: str) -> str:
    return os.path.join(corpus_dir, "_manifest.json")


def _read_manifest(corpus_dir: str) -> dict:
    p = _manifest_path(corpus_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"rounds": {}}


def _anti_filter_existing(fps, fp_path: str, n_existing: int, fp_broadcast_cap: int):
    """Rows of ``fps`` (doc_id, h1, h2) whose fingerprint is NOT in the
    committed table.  Broadcast regime (packed sorted arrays) under the
    cap; hash-join hits-only collect past it."""
    import ray
    import ray.data

    if n_existing == 0:
        return fps

    if n_existing > fp_broadcast_cap:
        # JOIN REGIME: membership via hash join, hits-only collect
        fps = fps.materialize()
        old_ds = ray.data.read_parquet(fp_path)
        num_partitions = int(np.clip(n_existing // 25_000, 2, 32))
        hits = fps.join(
            old_ds, join_type="inner", num_partitions=num_partitions,
            on=("h1", "h2"),
        ).to_pandas()
        hit_ids = np.sort(np.unique(hits["doc_id"].to_numpy().astype(np.int64))) if len(hits) else np.array([], dtype=np.int64)
        href = ray.put(hit_ids)

        def not_hit(t: pa.Table) -> pa.Table:
            ids = ray.get(href)
            d = t["doc_id"].to_numpy()
            if len(ids) == 0:
                return t
            pos = np.clip(np.searchsorted(ids, d), 0, len(ids) - 1)
            return t.filter(pa.array(ids[pos] != d))

        return fps.map_batches(not_hit, batch_format="pyarrow")

    old = pq.read_table(fp_path)
    # packed sorted (h1, h2) membership array — broadcast once.
    o1 = old["h1"].to_numpy()
    o2 = old["h2"].to_numpy()
    order = np.lexsort((o2, o1))
    o1, o2 = o1[order], o2[order]
    eref = ray.put((o1, o2))

    def not_in_existing(t: pa.Table) -> pa.Table:
        e1, e2 = ray.get(eref)
        h1 = t["h1"].to_numpy()
        h2 = t["h2"].to_numpy()
        if len(e1) == 0:
            return t
        lo = np.searchsorted(e1, h1, side="left")
        hi = np.searchsorted(e1, h1, side="right")
        hit = np.zeros(len(h1), dtype=bool)
        # existing duplicate groups are tiny (md5-128): scan the run
        for i in np.flatnonzero(hi > lo):
            hit[i] = bool((e2[lo[i] : hi[i]] == h2[i]).any())
        return t.filter(pa.array(~hit))

    return fps.map_batches(not_in_existing, batch_format="pyarrow")


def _try_recover_round(
    corpus_dir: str, round_dir: str, round_id: int, manifest: dict,
    fp_broadcast_cap: int,
) -> dict | None:
    """If ``round_dir`` holds a complete prior attempt whose fingerprints
    are already committed (crash landed between the fp rename and the
    manifest rename), commit it as-is and return its stats.  Returns
    None when the dir is unreadable/partial or its fps are not yet
    committed — the caller then deletes it and redoes the round, which
    is safe precisely because the fps don't cover it."""
    import ray.data

    fp_path = os.path.join(corpus_dir, "fingerprints.parquet")
    if not os.path.exists(fp_path):
        return None
    try:
        existing = ray.data.read_parquet(round_dir)
        n_rows = existing.count()
    except Exception:
        return None  # partial/corrupt dir from a mid-write crash: redo
    if n_rows == 0:
        return None  # empty orphan: redoing from the input is strictly safer
    n_existing = pq.read_metadata(fp_path).num_rows
    fps = existing.map_batches(_fp_batch, batch_format="pyarrow")
    n_uncovered = _anti_filter_existing(
        fps, fp_path, n_existing, fp_broadcast_cap
    ).count()
    if n_uncovered > 0:
        return None  # fp commit never happened: the dir is deletable
    stats = {
        "ingested": int(n_rows),
        "dup_existing": 0,
        "dup_within": 0,
        "recovered": True,
        "skipped": False,
    }
    manifest["rounds"][str(round_id)] = {
        k: v for k, v in stats.items() if k != "skipped"
    }
    mtmp = _manifest_path(corpus_dir) + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, _manifest_path(corpus_dir))
    return stats


def incremental_ingest(
    new_docs, corpus_dir: str, round_id: int, fp_broadcast_cap: int = 50_000_000
) -> dict:
    """Ingest ``new_docs`` (a Ray Dataset with doc_id/text/... columns)
    as ``round_id``.  Returns {"ingested", "dup_existing", "dup_within",
    "skipped"}; idempotent per round (a committed round is skipped).

    Existing-membership check: broadcast (packed sorted fp arrays)
    while the fingerprint table holds <= ``fp_broadcast_cap`` rows;
    past the cap the JOIN REGIME fires — new fps hash-join the
    fingerprint parquet on (h1, h2), only HIT doc_ids (bounded by
    cross-round duplicate volume, not corpus size) come back, and the
    batch anti-filters on them.  Forced-regime test asserts equality."""
    import ray
    import ray.data

    os.makedirs(corpus_dir, exist_ok=True)
    manifest = _read_manifest(corpus_dir)
    if str(round_id) in manifest["rounds"]:
        return {"skipped": True, **manifest["rounds"][str(round_id)]}

    fp_path = os.path.join(corpus_dir, "fingerprints.parquet")
    n_existing = pq.read_metadata(fp_path).num_rows if os.path.exists(fp_path) else 0

    round_dir = os.path.join(corpus_dir, f"round={round_id:04d}")
    if os.path.isdir(round_dir):
        recovered = _try_recover_round(
            corpus_dir, round_dir, round_id, manifest, fp_broadcast_cap
        )
        if recovered is not None:
            return recovered

    fps = new_docs.map_batches(_fp_batch, batch_format="pyarrow")
    fresh = _anti_filter_existing(fps, fp_path, n_existing, fp_broadcast_cap)
    n_total = new_docs.count()
    n_fresh = fresh.count()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            df = pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("doc_id", "h1", "h2")}
            )
        df = df.copy()
        df["__b"] = (df["h1"].to_numpy() % 64).astype("int32")
        return df

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("doc_id", "h1", "h2")}
            )
        mn = g.groupby(["h1", "h2"])["doc_id"].transform("min")
        w = g[g["doc_id"].to_numpy() == mn.to_numpy()]
        return w[["doc_id", "h1", "h2"]]

    win = (
        fresh.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(winners, batch_format="pandas")
        .to_pandas()
    )
    if "doc_id" not in win.columns:  # zero-row datasets lose their schema
        win = pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("doc_id", "h1", "h2")}
        )
    win_ids = np.sort(win["doc_id"].to_numpy().astype(np.int64))
    wref = ray.put(win_ids)

    def keep_winners(t: pa.Table) -> pa.Table:
        ids = ray.get(wref)
        d = t["doc_id"].to_numpy()
        pos = np.searchsorted(ids, d)
        pos = np.clip(pos, 0, max(len(ids) - 1, 0))
        ok = (ids[pos] == d) if len(ids) else np.zeros(len(d), dtype=bool)
        return t.filter(pa.array(ok))

    # only a pre-fp-commit orphan reaches here (recovery handled the
    # committed case above) — deleting it cannot lose accepted data
    shutil.rmtree(round_dir, ignore_errors=True)
    accepted = new_docs.map_batches(keep_winners, batch_format="pyarrow")
    accepted.write_parquet(round_dir)
    n_accepted = len(win_ids)

    # commit order: data -> fingerprints -> manifest (atomic renames);
    # a crash between the fp rename and the manifest rename is healed
    # by _try_recover_round (the dir is read back and committed, never
    # deleted); a crash before the fp rename leaves a deletable orphan
    new_fps = pa.table(
        {
            "h1": pa.array(win["h1"].to_numpy().astype(np.int64)),
            "h2": pa.array(win["h2"].to_numpy().astype(np.int64)),
        },
        schema=_FP_SCHEMA,
    )
    merged = (
        pa.concat_tables([pq.read_table(fp_path), new_fps])
        if os.path.exists(fp_path)
        else new_fps
    )
    tmp = fp_path + ".tmp"
    pq.write_table(merged, tmp)
    os.replace(tmp, fp_path)

    stats = {
        "ingested": int(n_accepted),
        "dup_existing": int(n_total - n_fresh),
        "dup_within": int(n_fresh - n_accepted),
        "skipped": False,
    }
    manifest["rounds"][str(round_id)] = {
        k: v for k, v in stats.items() if k != "skipped"
    }
    mtmp = _manifest_path(corpus_dir) + ".tmp"
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, _manifest_path(corpus_dir))
    return stats
