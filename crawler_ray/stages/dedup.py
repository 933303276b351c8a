"""Near-duplicate detection stages.

Scale path (SURVEY.md §2.8): per-row MinHash signature column computed
in map_batches, banded-LSH groupby for candidate pairs, exact-Jaccard
verify inside map_groups — replacing the reference's O(corpus) ``seen?``
scan per page (crawl.clj:237-244) while preserving the Jaccard ≥ 0.9
threshold on token 4-gram shingles (shingles.clj:31-36).

For the *incremental* crawl loop the index must be queryable against
all PREVIOUS documents in crawl order, so it lives in an actor
(NearDupIndex).  Single actor here; the scale path shards by band key
(one owner shard per band → no cross-shard races) at the cost of
two-phase query/insert per wave — documented divergence: intra-wave
duplicate attribution becomes set-based instead of sequence-based.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions import shingles


def minhash_stage(num_perm: int = 64, ngram: int = 4, text_col: str = "text", out_col: str = "minhash"):
    """map_batches stage adding a MinHash signature column."""
    params = shingles.minhash_params(num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        sigs = [
            shingles.minhash_signature(t, num_perm=num_perm, ngram=ngram, params=params)
            for t in batch[text_col].to_pylist()
        ]
        return batch.append_column(
            out_col, pa.array([s.tolist() for s in sigs], type=pa.list_(pa.uint64()))
        )

    return fn


def _check_shingle_wire(got: int) -> None:
    """Refuse to restore a near-dup snapshot written under a DIFFERENT
    gram-hash family: mixed families compare near-zero Jaccard and
    silently miss duplicates (ADVICE r3).  Rebuild the index from the
    corpus (re-crawl or re-ingest the checkpointed rounds) instead."""
    from ..functions.shingles import SHINGLE_WIRE_VERSION

    if got != SHINGLE_WIRE_VERSION:
        raise RuntimeError(
            f"near-dup snapshot uses shingle wire format v{got}, this build "
            f"writes v{SHINGLE_WIRE_VERSION}; restoring would mix gram-hash "
            "families and silently miss duplicates — rebuild the index from "
            "the corpus instead of restoring this snapshot"
        )


@ray.remote
class NearDupIndex:
    """Incremental LSH index: band_key → [(url, shingle set)].

    ``process(entries)`` handles entries IN ORDER: each is checked
    against everything already indexed (LSH candidates + exact Jaccard
    ≥ threshold), then inserted — reproducing the reference's
    sequential old-corpus scan semantics exactly."""

    def __init__(self, threshold: float = 0.9, bands: int = 16):
        self.threshold = threshold
        self.bands = bands
        self.index: dict[int, list[tuple[str, frozenset]]] = {}

    def process(self, entries) -> list[bool]:
        """entries: [(url, sorted-unique uint64 shingle hashes,
        band_keys)] in crawl order → near_dup flag per entry.  Exact
        Jaccard via vectorized np.intersect1d on the hash arrays."""
        import numpy as np

        out = []
        for url, grams, keys in entries:
            grams = np.asarray(grams, dtype=np.uint64)
            cand: dict[str, np.ndarray] = {}
            for k in keys:
                for u2, g2 in self.index.get(k, []):
                    cand[u2] = g2
            dup = any(
                shingles.jaccard_hashes(grams, g2) >= self.threshold
                for g2 in cand.values()
            )
            out.append(dup)
            for k in keys:
                self.index.setdefault(k, []).append((url, grams))
        return out

    def snapshot(self) -> dict:
        from ..functions.shingles import SHINGLE_WIRE_VERSION

        return {
            "threshold": self.threshold,
            "bands": self.bands,
            "wire": SHINGLE_WIRE_VERSION,
            "index": {k: [(u, g.tolist()) for u, g in v] for k, v in self.index.items()},
        }

    def restore(self, snap: dict) -> None:
        _check_shingle_wire(snap.get("wire", 1))
        self.threshold = snap["threshold"]
        self.bands = snap["bands"]
        import numpy as np

        self.index = {
            int(k): [(u, np.asarray(g, dtype=np.uint64)) for u, g in v]
            for k, v in snap["index"].items()
        }


def simhash_stage(ngram: int = 2, text_col: str = "text", out_col: str = "simhash"):
    """map_batches stage adding a 64-bit SimHash column (stored int64
    via two's complement for Arrow friendliness)."""

    def fn(batch: pa.Table) -> pa.Table:
        hs = [
            np.int64(np.uint64(shingles.simhash64(t, ngram)).astype(np.int64))
            for t in batch[text_col].to_pylist()
        ]
        return batch.append_column(out_col, pa.array(hs, type=pa.int64()))

    return fn


@ray.remote
class NearDupShardActor:
    """One band-key partition of the incremental LSH index: owns the
    band keys with ``key % n_shards == shard_id``.

    Sequential-equivalence: a near-dup pair (A, B) is LSH-detectable iff
    they share ≥1 band key; that key lives in exactly ONE shard, which
    processes its entries in global crawl order — so sharding changes
    nothing about which documents get flagged, only who does the work.

    Memory model: when a wave arrives as worker-plasma chunk refs
    (``process_table_refs``), each chunk is processed WITHOUT
    concat/combine — the retained gram arrays are then zero-copy numpy
    views into the single plasma buffer, so all N shards share ONE
    copy of every wave's grams (object-store memory, not N× actor
    heap).  This supersedes the earlier url-sharded-gram-store plan:
    same single-copy property, no two-hop verify RPC.  The driver-side
    ``process_table`` path (one concatenated table) still copies once
    per shard and remains for tests/small runs."""

    def __init__(self, shard_id: int, n_shards: int, threshold: float = 0.9):
        self.sid = shard_id
        self.n = n_shards
        self.threshold = threshold
        self.index: dict[int, list[np.ndarray]] = {}

    def _prep(self, tbl: pa.Table):
        """Zero-copy extraction of per-row gram views + owned band keys.

        For a single-chunk table (the plasma chunk objects the fetch
        workers put), the gram views retained in the index alias the
        SHARED plasma buffer via ``ListArray.values`` — pc.list_flatten
        would materialize a private copy per shard, multiplying wave
        memory by n_shards."""
        import pyarrow.compute as pc

        n_rows = tbl.num_rows
        gcol = tbl.column("grams")
        if gcol.num_chunks == 1:
            ch = gcol.chunk(0)
            try:
                gflat = ch.values.to_numpy(zero_copy_only=True)
                goffs = ch.offsets.to_numpy(zero_copy_only=False)
                grams_list = [gflat[goffs[i]:goffs[i + 1]] for i in range(n_rows)]
            except pa.ArrowInvalid:  # nulls etc. — fall back to copy path
                gcol = None
        else:
            gcol = None
        if gcol is None:
            gcol = tbl.column("grams").combine_chunks()
            gflat = pc.list_flatten(gcol).to_numpy(zero_copy_only=False)
            glens = pc.list_value_length(gcol).fill_null(0).to_numpy(zero_copy_only=False)
            grams_list = np.split(gflat, np.cumsum(glens)[:-1]) if len(glens) else []
        kcol = tbl.column("band_keys").combine_chunks()
        kflat = pc.list_flatten(kcol).to_numpy(zero_copy_only=False)
        klens = pc.list_value_length(kcol).fill_null(0).to_numpy(zero_copy_only=False)
        # vectorized ownership filter: keep only the band keys this
        # shard owns, split back per entry
        mask = (kflat % np.uint64(self.n)) == np.uint64(self.sid)
        rows = np.repeat(np.arange(n_rows), klens)
        own_lens = np.bincount(rows[mask], minlength=n_rows)
        own_keys = np.split(kflat[mask], np.cumsum(own_lens)[:-1]) if n_rows else []
        return grams_list, own_keys, own_lens

    def _check_insert(self, grams: np.ndarray, mine: list) -> bool:
        """Check one entry against the index via its owned band keys
        (in crawl order), then insert it."""
        dup = False
        checked = set()
        for k in mine:
            for g2 in self.index.get(k, []):
                gid = id(g2)
                if gid in checked:
                    continue
                checked.add(gid)
                if shingles.jaccard_hashes(grams, g2) >= self.threshold:
                    dup = True
                    break
            if dup:
                break
        for k in mine:
            self.index.setdefault(k, []).append(grams)
        return dup

    def process_table(self, tbl: pa.Table) -> np.ndarray:
        """Arrow handoff: tbl(grams:list<u64>, band_keys:list<u64>) in
        crawl order → bool array (dup detected via a band THIS shard
        owns).  Flatten/split happens here, in parallel across shards,
        not on the driver."""
        grams_list, own_keys, own_lens = self._prep(tbl)
        n_rows = tbl.num_rows
        out = np.zeros(n_rows, dtype=bool)
        for i in range(n_rows):
            if own_lens[i]:
                out[i] = self._check_insert(grams_list[i], own_keys[i].tolist())
        return out

    def process_table_refs(self, refs: list, perm=None) -> np.ndarray:
        """Chunked-wave variant: ``refs`` are ObjectRefs of per-chunk
        (grams, band_keys) tables put in plasma BY THE FETCH WORKERS —
        the grams never pass through the driver.  Chunks are prepped
        WITHOUT concatenation (zero-copy views into each chunk's plasma
        buffer, see ``_prep``); ``perm`` — the wave's global
        (depth, seq) priority permutation over the chunk-concatenated
        row order — is honoured by ITERATING rows in perm order across
        the prepped chunks, so exact crawl-order semantics cost no
        gather and no private gram copies."""
        to_get = [r for r in refs if not isinstance(r, pa.Table)]
        got = iter(ray.get(to_get)) if to_get else iter(())  # ONE batched get:
        # per-ref gets pay an owner-lookup RPC each (refs are owned by
        # many different fetch workers), which dominates at 100+ chunks
        tables = [r if isinstance(r, pa.Table) else next(got) for r in refs]
        if not tables:
            return np.zeros(0, dtype=bool)
        if perm is None:
            return np.concatenate([self.process_table(t) for t in tables])
        preps = [self._prep(t) for t in tables]
        sizes = np.array([t.num_rows for t in tables], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(sizes)])
        perm = np.asarray(perm, dtype=np.int64)
        cis = np.searchsorted(offs, perm, side="right") - 1
        lis = perm - offs[cis]
        out = np.zeros(len(perm), dtype=bool)
        for j in range(len(perm)):
            grams_list, own_keys, own_lens = preps[cis[j]]
            i = lis[j]
            if own_lens[i]:
                out[j] = self._check_insert(grams_list[i], own_keys[i].tolist())
        return out

    def process(self, entries) -> np.ndarray:
        """List-of-tuples variant (tests): [(grams, keys)] in crawl
        order → bool array."""
        if not entries:
            return np.zeros(0, dtype=bool)
        tbl = pa.table(
            {
                "grams": pa.array([np.asarray(g, dtype=np.uint64).tolist() for g, _ in entries], type=pa.list_(pa.uint64())),
                "band_keys": pa.array([list(map(int, k)) for _, k in entries], type=pa.list_(pa.uint64())),
            }
        )
        return self.process_table(tbl)

    def snapshot(self) -> dict:
        from ..functions.shingles import SHINGLE_WIRE_VERSION

        return {
            "sid": self.sid,
            "n": self.n,
            "threshold": self.threshold,
            "wire": SHINGLE_WIRE_VERSION,
            "index": {k: [g.tolist() for g in v] for k, v in self.index.items()},
        }

    def restore(self, snap: dict) -> None:
        _check_shingle_wire(snap.get("wire", 1))
        self.sid, self.n, self.threshold = snap["sid"], snap["n"], snap["threshold"]
        self.index = {
            int(k): [np.asarray(g, dtype=np.uint64) for g in v]
            for k, v in snap["index"].items()
        }

    def snapshot_to(self, path: str) -> int:
        """Write this shard's index as ONE compact npz — written BY the
        shard (shared storage), never shipped through the driver: the
        list-of-lists ``snapshot()`` form cost gigabytes of driver heap
        and minutes of pickling at 10^5-leaf indexes.  Gram arrays that
        appear under several band keys are stored once (identity
        dedup)."""
        arr_pos: dict[int, int] = {}
        arrs: list[np.ndarray] = []
        band_keys, band_counts, refs = [], [], []
        for k, v in self.index.items():
            band_keys.append(k)
            band_counts.append(len(v))
            for g in v:
                gid = id(g)
                if gid not in arr_pos:
                    arr_pos[gid] = len(arrs)
                    arrs.append(g)
                refs.append(arr_pos[gid])
        from ..functions.shingles import SHINGLE_WIRE_VERSION

        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        flat = np.concatenate(arrs) if arrs else np.zeros(0, dtype=np.uint64)
        with open(path, "wb") as f:
            np.savez(
                f,
                wire=np.array([SHINGLE_WIRE_VERSION], dtype=np.int64),
                meta=np.array([self.sid, self.n], dtype=np.int64),
                threshold=np.array([self.threshold], dtype=np.float64),
                band_keys=np.array(band_keys, dtype=np.uint64),
                band_counts=np.array(band_counts, dtype=np.int64),
                refs=np.array(refs, dtype=np.int64),
                lens=lens,
                flat=flat.astype(np.uint64, copy=False),
            )
        import os

        return os.path.getsize(path)

    def restore_from(self, path: str) -> None:
        z = np.load(path)
        _check_shingle_wire(int(z["wire"][0]) if "wire" in z else 1)
        self.sid, self.n = (int(x) for x in z["meta"])
        self.threshold = float(z["threshold"][0])
        lens = z["lens"]
        flat = z["flat"]
        arrs = np.split(flat, np.cumsum(lens)[:-1]) if len(lens) else []
        refs = z["refs"]
        self.index = {}
        pos = 0
        for k, c in zip(z["band_keys"], z["band_counts"]):
            self.index[int(k)] = [arrs[r] for r in refs[pos:pos + c]]
            pos += c

    def restore_resharded_from(self, paths: list[str], sid: int, n_new: int) -> None:
        """Shard-count elasticity (mirrors stages/seen.py): band keys
        are fully enumerable in the snapshots, so a checkpoint written
        at n_old shards restores EXACTLY at n_new — this shard keeps
        the bands it owns under the new ``key % n_new`` routing.
        Within-band gram order only affects the early-break, never a
        future verdict (membership OR).

        Callers should pass PRE-SPLIT part files (see
        ``_split_neardup_snapshot``) so total restore I/O is
        O(snapshot bytes), not O(n_new × snapshot bytes); passing full
        old snapshots still restores correctly (the modulo filter
        below drops foreign bands), just with redundant reads."""
        self.sid, self.n = sid, n_new
        self.index = {}
        for p in paths:
            z = np.load(p)
            _check_shingle_wire(int(z["wire"][0]) if "wire" in z else 1)
            self.threshold = float(z["threshold"][0])
            lens = z["lens"]
            arrs = np.split(z["flat"], np.cumsum(lens)[:-1]) if len(lens) else []
            refs = z["refs"]
            pos = 0
            for k, c in zip(z["band_keys"], z["band_counts"]):
                if int(k) % n_new == sid:
                    self.index.setdefault(int(k), []).extend(
                        arrs[r] for r in refs[pos:pos + c]
                    )
                pos += c


@ray.remote(num_cpus=1)
def _split_neardup_snapshot(path: str, n_new: int, out_dir: str, tag: int) -> list:
    """Re-shard pre-pass: read ONE old snapshot file and partition its
    band keys by the new ``key % n_new`` routing into per-new-shard part
    files (same npz layout).  One task per old file ⇒ total re-shard
    I/O is O(snapshot bytes); each new shard then reads only the parts
    that can contain its bands (vs every shard parsing every old file,
    which is O(n_new × bytes)).  Returns a length-n_new list of part
    paths (None where a shard gets nothing from this file)."""
    import os

    z = np.load(path)
    _check_shingle_wire(int(z["wire"][0]) if "wire" in z else 1)
    threshold = float(z["threshold"][0])
    band_keys = z["band_keys"]
    band_counts = z["band_counts"]
    refs = z["refs"]
    lens = z["lens"]
    arrs = np.split(z["flat"], np.cumsum(lens)[:-1]) if len(lens) else []
    starts = np.concatenate([[0], np.cumsum(band_counts)]).astype(np.int64)
    route = (band_keys % np.uint64(n_new)).astype(np.int64)
    from ..functions.shingles import SHINGLE_WIRE_VERSION

    out: list = [None] * n_new
    for sid in range(n_new):
        sel = np.nonzero(route == sid)[0]
        if len(sel) == 0:
            continue
        remap: dict[int, int] = {}
        part_arrs: list[np.ndarray] = []
        part_refs: list[int] = []
        for bi in sel:
            for r in refs[starts[bi]:starts[bi + 1]]:
                r = int(r)
                if r not in remap:
                    remap[r] = len(part_arrs)
                    part_arrs.append(arrs[r])
                part_refs.append(remap[r])
        part_lens = np.array([len(a) for a in part_arrs], dtype=np.int64)
        flat = np.concatenate(part_arrs) if part_arrs else np.zeros(0, dtype=np.uint64)
        pp = os.path.join(out_dir, f"part_{tag}_{sid}.npz")
        with open(pp, "wb") as f:
            np.savez(
                f,
                wire=np.array([SHINGLE_WIRE_VERSION], dtype=np.int64),
                meta=np.array([sid, n_new], dtype=np.int64),
                threshold=np.array([threshold], dtype=np.float64),
                band_keys=band_keys[sel],
                band_counts=band_counts[sel],
                refs=np.array(part_refs, dtype=np.int64),
                lens=part_lens,
                flat=flat.astype(np.uint64, copy=False),
            )
        out[sid] = pp
    return out


class NearDupShards:
    """Driver-side handle: fan a wave's (ordered) entries to every band
    shard in parallel, OR the per-shard verdicts."""

    def __init__(self, n_shards: int = 4, threshold: float = 0.9, bands: int = 16):
        self.n = n_shards
        self.bands = bands
        self.shards = [
            NearDupShardActor.options(num_cpus=0).remote(i, n_shards, threshold)
            for i in range(n_shards)
        ]

    def process(self, entries) -> list[bool]:
        """entries: [(url, grams, keys)] in crawl order."""
        if not entries:
            return []
        block = ray.put([(g, k) for _, g, k in entries])
        flags = ray.get([s.process.remote(block) for s in self.shards])
        return list(np.logical_or.reduce(flags))

    def submit(self, tbl) -> list:
        """Async variant: enqueue the block on every shard (actor
        mailboxes are FIFO per caller, so crawl order is preserved
        across rounds) and return the futures."""
        if tbl.num_rows == 0:
            return []
        ref = ray.put(tbl)
        return [s.process_table.remote(ref) for s in self.shards]

    def submit_refs(self, refs: list, perm=None) -> list:
        """Async variant over worker-plasma chunk refs (grams stay off
        the driver); refs in chunk order, ``perm`` restores wave
        priority order when chunking was host-grouped."""
        if not refs:
            return []
        return [s.process_table_refs.remote(refs, perm) for s in self.shards]

    @staticmethod
    def resolve(futs) -> np.ndarray:
        if not futs:
            return np.zeros(0, dtype=bool)
        return np.logical_or.reduce(ray.get(futs))

    def process_table(self, tbl) -> np.ndarray:
        """Arrow handoff variant: one plasma object, shards parse in
        parallel."""
        if tbl.num_rows == 0:
            return np.zeros(0, dtype=bool)
        return self.resolve(self.submit(tbl))

    def snapshot(self) -> list[dict]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list[dict]) -> None:
        ray.get([self.shards[s["sid"]].restore.remote(s) for s in snaps])

    def snapshot_to(self, dir_path: str, prefix: str = "neardup_shard") -> list[str]:
        """Each shard writes its own compact snapshot file (parallel,
        driver sees only filenames)."""
        import os

        names = [f"{prefix}_{i}.npz" for i in range(self.n)]
        ray.get(
            [
                s.snapshot_to.remote(os.path.join(dir_path, nm))
                for s, nm in zip(self.shards, names)
            ]
        )
        return names

    def restore_from(self, dir_path: str, names: list[str]) -> None:
        """Restore shard snapshots; a checkpoint written at a DIFFERENT
        shard count re-shards exactly (band keys are enumerable).  The
        re-shard path runs a split pre-pass — one task per OLD file
        partitions its bands into per-new-shard part files — so total
        restore I/O is O(snapshot bytes), not O(n_new × bytes)."""
        import os
        import shutil

        if len(names) == self.n:
            ray.get(
                [
                    self.shards[i].restore_from.remote(os.path.join(dir_path, nm))
                    for i, nm in enumerate(names)
                ]
            )
            return
        split_dir = os.path.join(dir_path, f"_reshard_{self.n}")
        os.makedirs(split_dir, exist_ok=True)
        try:
            parts = ray.get(
                [
                    _split_neardup_snapshot.remote(
                        os.path.join(dir_path, nm), self.n, split_dir, t
                    )
                    for t, nm in enumerate(names)
                ]
            )
            per_shard = [[p[i] for p in parts if p[i]] for i in range(self.n)]
            ray.get(
                [
                    self.shards[i].restore_resharded_from.remote(per_shard[i], i, self.n)
                    for i in range(self.n)
                ]
            )
        finally:
            shutil.rmtree(split_dir, ignore_errors=True)


# =====================================================================
# Corpus-wide batch dedup pipelines (Ray Data, offline sweeps)
# =====================================================================


def grams4_raw(text: str) -> set[str]:
    """Token 4-grams over a plain single-space split (the SQL-mirrorable
    variant used by oracle-checked dedup queries; the crawl's near-dup
    path uses the reference's normalized shingles instead)."""
    tk = text.split(" ")
    if len(tk) < 4:
        return {" ".join(tk)} if text else set()
    return {" ".join(tk[i : i + 4]) for i in range(len(tk) - 3)}


def lsh_neardup_pairs(
    ds,
    threshold: float = 0.9,
    num_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    grams_ds=None,
):
    """Corpus-wide MinHash-LSH candidate generation:

        minhash per batch → explode (band_key, id) → groupby(band) →
        candidate pairs → distinct

    LSH recall at J=0.9 with 16 bands × 4 rows: miss ≈ (1−0.9⁴)¹⁶ ≈
    4e-8 — the sweep is exact for practical purposes (the oracle-checked
    query relies on this).  Returns a DATASET of distinct (doc_a, doc_b)
    rows — the pairs never materialize on the driver; verify them with
    ``verify_pairs_joined`` (hash-join back to the grams table).

    ``grams_ds``: a ``doc_grams_table(..., with_minhash_input=True)``
    Dataset — band keys then derive from its precomputed ``gb31``
    column (byte-identical 31-bit gram hashes), skipping the second
    corpus-wide gram pass entirely; ``ds``/``text_col`` are ignored."""
    import pandas as pd
    import pyarrow.compute as pc

    params = shingles.minhash_params(num_perm)

    N_BUCKETS = 32

    def _bands_from_hashes(pairs_iter):
        ids, keys = [], []
        for did, h in pairs_iter:
            sig = shingles.minhash_from_hashes(h, num_perm=num_perm, params=params)
            for k in shingles.lsh_band_keys(sig, bands=bands):
                ids.append(did)
                keys.append(k)
        out = pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "band": pa.array(keys, type=pa.uint64()),
            }
        )
        return out.append_column(
            "bucket",
            pc.cast(
                pc.bit_wise_and(out["band"], pa.scalar(N_BUCKETS - 1, type=pa.uint64())),
                pa.int32(),
            ),
        )

    def band_rows(t: pa.Table) -> pa.Table:
        return _bands_from_hashes(
            (
                did,
                np.unique(
                    np.fromiter(
                        (shingles.stable_hash64(g) & 0x7FFFFFFF for g in grams4_raw(txt)),
                        dtype=np.uint64,
                    )
                ) if txt else np.zeros(0, dtype=np.uint64),
            )
            for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist())
        )

    def band_rows_precomputed(t: pa.Table) -> pa.Table:
        return _bands_from_hashes(
            (did, np.frombuffer(gb, dtype=np.uint64))
            for did, gb in zip(t[id_col].to_pylist(), t["gb31"].to_pylist())
        )

    band_tbl = (
        grams_ds.map_batches(band_rows_precomputed, batch_format="pyarrow")
        if grams_ds is not None
        else ds.map_batches(band_rows, batch_format="pyarrow")
    )

    # band→bucket coarsening: one vectorized self-merge per BUCKET of
    # bands (a Ray group per distinct band key would pay ~2 ms/group on
    # tens of thousands of near-singleton groups)
    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g[[id_col, "band"]].drop_duplicates()
        m = df.merge(df, on="band", suffixes=("_a", "_b"))
        a = m[f"{id_col}_a"].to_numpy()
        b = m[f"{id_col}_b"].to_numpy()
        keep = a < b
        a, b = a[keep], b[keep]
        if len(a) and 0 <= a.min() and b.max() < (1 << 31):
            pk = np.unique((a << 32) | b)  # packed distinct: one int64 sort
            a, b = pk >> 32, pk & 0xFFFFFFFF
            return pd.DataFrame({"doc_a": a.astype("int64"), "doc_b": b.astype("int64")})
        return pd.DataFrame({"doc_a": a, "doc_b": b}).drop_duplicates().astype("int64")

    from .relational import bucketed_agg

    return bucketed_agg(
        band_tbl.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas"),
        keys=["doc_a", "doc_b"],
        sum_cols={"__count__": "_n"},
    ).select_columns(["doc_a", "doc_b"])


def doc_grams_table(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_minhash_input: bool = False,
):
    """(doc_id, gb, sz) Dataset: gb = the doc's sorted unique 63-bit
    gram hashes serialized to bytes (Arrow joins reject list columns),
    sz = gram-set cardinality.  The join-side payload for distributed
    pair verification.

    ``with_minhash_input`` additionally emits ``gb31`` — the sorted
    unique 31-bit masks of the SAME base hashes, byte-identical to what
    ``lsh_neardup_pairs`` computes from raw text — so one gram pass
    (grams4_raw + blake2b per gram, the dominant cost) feeds BOTH LSH
    candidate generation and pair verification (r3 verdict: the two
    passes doubled the corpus-wide gram work)."""

    def fn(t: pa.Table) -> pa.Table:
        ids, gbs, szs, g31s = [], [], [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            base = np.fromiter(
                (shingles.stable_hash64(g) for g in grams4_raw(txt)),
                dtype=np.uint64,
            ) if txt else np.zeros(0, dtype=np.uint64)
            h = np.unique(base & np.uint64(0x7FFFFFFFFFFFFFFF))
            ids.append(did)
            gbs.append(h.tobytes())
            szs.append(len(h))
            if with_minhash_input:
                g31s.append(np.unique(base & np.uint64(0x7FFFFFFF)).tobytes())
        cols = {
            id_col: pa.array(ids, type=pa.int64()),
            "gb": pa.array(gbs, type=pa.binary()),
            "sz": pa.array(szs, type=pa.int64()),
        }
        if with_minhash_input:
            cols["gb31"] = pa.array(g31s, type=pa.binary())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def pair_intersection_counts(ga: list, gb: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized per-pair set-intersection counts over serialized
    sorted-unique uint64 gram buffers: ONE global sort instead of a
    Python ``np.intersect1d`` loop (r2 verdict item).

    Maps grams to compact vocab codes, packs (pair_id, code) into one
    int64 key per element, sorts the union, and counts adjacent
    duplicates — an element appears twice iff both sides of its pair
    contain it.  Returns (inter, |a|, |b|) arrays."""
    n = len(ga)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    A = [np.frombuffer(x, dtype=np.uint64) for x in ga]  # zero-copy views
    B = [np.frombuffer(x, dtype=np.uint64) for x in gb]
    la = np.array([len(x) for x in A], dtype=np.int64)
    lb = np.array([len(x) for x in B], dtype=np.int64)
    flatA = np.concatenate(A) if la.sum() else np.zeros(0, dtype=np.uint64)
    flatB = np.concatenate(B) if lb.sum() else np.zeros(0, dtype=np.uint64)
    uni = np.unique(np.concatenate([flatA, flatB]))
    V = np.int64(max(len(uni), 1))
    assert n * V < (1 << 62), "pair×vocab key packing overflow"
    keyA = np.repeat(np.arange(n, dtype=np.int64), la) * V + np.searchsorted(uni, flatA)
    keyB = np.repeat(np.arange(n, dtype=np.int64), lb) * V + np.searchsorted(uni, flatB)
    allk = np.concatenate([keyA, keyB])
    allk.sort(kind="stable")
    dup = allk[1:] == allk[:-1]
    inter = np.bincount(allk[1:][dup] // V, minlength=n).astype(np.int64)
    return inter, la, lb


def _pair_jaccard(inter: np.ndarray, sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    denom = sa + sb - inter
    return np.where(denom > 0, inter / np.maximum(denom, 1), 1.0)


def verify_pairs_joined(pairs, grams_ds, threshold: float, num_partitions: int = 8, small_limit: int = 20_000):
    """Distributed exact-Jaccard verification: hash-join the candidate
    pairs back to the grams table (both sides Datasets — no driver
    materialization of grams).  The corpus-side grams are first
    semi-filtered to candidate ids (a broadcast of the SMALL candidate
    id set), so each join shuffles only candidate-doc rows.

    Returns a Dataset of (doc_a, doc_b, jaccard ≥ threshold)."""
    import ray

    pairs = pairs.materialize()  # join finalize chokes on schemaless empties
    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )
    if pairs.count() == 0:
        import ray.data as rd

        return rd.from_arrow(empty)

    # candidate id set: tiny relative to the corpus — safe to reduce on
    # the driver and broadcast
    id_parts = pairs.map_batches(
        lambda t: pa.table(
            {"id": np.unique(np.concatenate([t["doc_a"].to_numpy(), t["doc_b"].to_numpy()]))}
        ),
        batch_format="pyarrow",
    )
    cand_ids = np.unique(id_parts.to_pandas()["id"].to_numpy())
    ref = ray.put(cand_ids)
    # small candidate sets don't amortize a wide hash join — scale the
    # partition count with the pair volume (fixed shuffle overhead is
    # ~0.5-1 s per extra partition wave at sandbox sizes)
    num_partitions = int(np.clip(pairs.count() // 25_000, 2, num_partitions))

    class SemiFilter:
        def __init__(self):
            self.ids = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["doc_id"].to_numpy()
            idx = np.clip(np.searchsorted(self.ids, keys), 0, len(self.ids) - 1)
            return t.filter(pa.array(self.ids[idx] == keys))

    cand_grams = grams_ds.map_batches(
        SemiFilter, batch_format="pyarrow", concurrency=2
    ).materialize()

    if len(cand_ids) <= small_limit:
        # bounded small-side path: the grams of CANDIDATE docs only
        # (already semi-filtered — not the corpus) fit a driver map;
        # two joins don't amortize at this size.  The join path below
        # is the same computation for candidate sets past the cap.
        import ray.data as rd

        cg = cand_grams.to_pandas()
        gmap = {i: g for i, g in zip(cg["doc_id"], cg["gb"])}
        outs = [empty]
        for t in ray.get(pairs.to_arrow_refs()):
            if t.num_rows == 0 or "doc_a" not in t.column_names:
                continue
            a = t["doc_a"].to_numpy()
            b = t["doc_b"].to_numpy()
            inter, sa, sb = pair_intersection_counts(
                [gmap[x] for x in a], [gmap[x] for x in b]
            )
            js = _pair_jaccard(inter, sa, sb)
            keep = js >= threshold
            outs.append(
                pa.table(
                    {
                        "doc_a": pa.array(a[keep], type=pa.int64()),
                        "doc_b": pa.array(b[keep], type=pa.int64()),
                        "jaccard": pa.array(js[keep], type=pa.float64()),
                    }
                )
            )
        return rd.from_arrow(pa.concat_tables(outs))

    j1 = pairs.join(
        cand_grams, join_type="inner", num_partitions=num_partitions,
        on=("doc_a",), right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table(
            {"doc_a": t["doc_a"], "doc_b": t["doc_b"], "gb_a": t["gb"], "sz_a": t["sz"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    j2 = j1.join(
        cand_grams, join_type="inner", num_partitions=num_partitions,
        on=("doc_b",), right_on=("doc_id",),
    )

    def jaccard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        a = t["doc_a"].to_numpy()
        b = t["doc_b"].to_numpy()
        inter, sa, sb = pair_intersection_counts(t["gb_a"].to_pylist(), t["gb"].to_pylist())
        js = _pair_jaccard(inter, sa, sb)
        keep = js >= threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep]),
                "doc_b": pa.array(b[keep]),
                "jaccard": pa.array(js[keep]),
            }
        )

    return j2.map_batches(jaccard, batch_format="pyarrow")


def verify_jaccard_pairs(pairs, id_to_grams: dict, threshold: float):
    """Small-scale exact-Jaccard verification against an in-memory
    id→gram-set map (tests / driver-side spot checks; the scale path is
    ``verify_pairs_joined``).  Accepts a pandas frame or a Dataset."""
    import pandas as pd

    if not isinstance(pairs, pd.DataFrame):
        pairs = pairs.to_pandas()
    rows = []
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ga, gb = id_to_grams[a], id_to_grams[b]
        inter = len(ga & gb)
        denom = len(ga) + len(gb) - inter
        j = inter / denom if denom else 1.0
        if j >= threshold:
            rows.append((a, b, j))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


def simhash_neardup_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text", ngram: int = 2, simhash_fn=None):
    """SimHash near-dup sweep with the pigeonhole chunk trick: split the
    64-bit hash into 4 × 16-bit chunks — any pair within hamming ≤ 3
    must agree exactly on ≥ 1 chunk, so groupby(chunk_id, chunk_value)
    generates candidates with guaranteed recall; exact hamming verifies.

    ``simhash_fn(text, ngram) -> int`` overrides the hash family: the
    default is the reference-normalized blake2b variant
    (shingles.simhash64); the oracle-checked query passes
    ``shingles.simhash64_md5`` (DuckDB-mirrorable)."""
    import pandas as pd

    hash_fn = simhash_fn or shingles.simhash64

    def sim_rows(t: pa.Table) -> pa.Table:
        ids, chunk_ids, chunk_vals, full = [], [], [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            h = hash_fn(txt, ngram)
            for ci in range(4):
                ids.append(did)
                chunk_ids.append(ci)
                chunk_vals.append((h >> (16 * ci)) & 0xFFFF)
                full.append(h - (1 << 64) if h >= (1 << 63) else h)  # int64 2c
        out = pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "chunk_id": pa.array(chunk_ids, type=pa.int32()),
                "chunk_val": pa.array(chunk_vals, type=pa.int32()),
                "simhash": pa.array(full, type=pa.int64()),
            }
        )
        # coarse shuffle key: a Ray group per raw (chunk_id, chunk_val)
        # would mean up to 4×2^16 near-singleton groups at ~2 ms each.
        # Odd multiplier mixes chunk_id into the low bits ((id<<16)%64
        # would be a no-op) so a hot chunk value spreads across buckets
        cb = (
            np.asarray(chunk_ids, dtype=np.int64) * 16381
            + np.asarray(chunk_vals, dtype=np.int64)
        ) % 64
        return out.append_column("cbkt", pa.array(cb.astype(np.int32)))

    rows = ds.map_batches(sim_rows, batch_format="pyarrow")

    POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def popcount64(x: np.ndarray) -> np.ndarray:
        return POP8[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1).astype(np.int64)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs within one (chunk_id, chunk_value) bucket.

        Skew-safe: identical full hashes are grouped FIRST (a 16-bit
        chunk value shared by millions of near-empty docs is typically
        one or few distinct 64-bit hashes — their all-pairs emission is
        output, not wasted comparisons), then hamming runs vectorized
        over the DISTINCT hash values in 512-wide XOR/popcount tiles
        instead of a per-doc-pair Python loop."""
        d = g.drop_duplicates(id_col)
        ids = d[id_col].to_numpy().astype(np.int64)
        hs = d["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        order = np.argsort(hs, kind="stable")
        ids, hs = ids[order], hs[order]
        uvals, first, counts = np.unique(hs, return_index=True, return_counts=True)
        groups = [np.sort(ids[f:f + c]) for f, c in zip(first, counts)]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        # pairs inside identical-hash groups: hamming 0, all qualify
        for mem in groups:
            if len(mem) > 1:
                iu = np.triu_indices(len(mem), k=1)
                out_a.append(mem[iu[0]])
                out_b.append(mem[iu[1]])
                out_h.append(np.zeros(len(iu[0]), dtype=np.int64))
        # distinct-value pairwise hamming, tiled
        m = len(uvals)
        for i0 in range(0, m, 512):
            tile = uvals[i0:i0 + 512]
            ham = popcount64(tile[:, None] ^ uvals[None, :])
            sel_i, sel_j = np.nonzero(ham <= max_hamming)
            keep = (sel_i + i0) < sel_j  # strict upper triangle, globally
            for ti, tj in zip(sel_i[keep], sel_j[keep]):
                ga, gb = groups[ti + i0], groups[tj]
                aa = np.repeat(ga, len(gb))
                bb = np.tile(gb, len(ga))
                lo = np.minimum(aa, bb)
                hi = np.maximum(aa, bb)
                out_a.append(lo)
                out_b.append(hi)
                out_h.append(np.full(len(aa), ham[ti, tj], dtype=np.int64))
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    def pairs_in_coarse(g: pd.DataFrame) -> pd.DataFrame:
        outs = [
            pairs_in_bucket(sub)
            for _, sub in g.groupby(["chunk_id", "chunk_val"], sort=False)
        ]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    return (
        rows.groupby("cbkt")
        .map_groups(pairs_in_coarse, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def dense_bitset_jaccard_pairs(
    grams_ds,
    vocab: np.ndarray,
    ids_sorted: np.ndarray,
    sz_sorted: np.ndarray,
    threshold: float,
    n_blocks: int = 8,
):
    """Exact Jaccard pair join for the DENSE-VOCABULARY regime: when the
    distinct-gram vocabulary fits a broadcast (≤ ~2^14), every doc
    becomes a packed bitset row and pairwise intersection counts come
    from blocked int8 matmul tiles (BLAS) instead of an inverted-index
    shuffle — in this regime candidate pairs ≈ all pairs, so the
    Σdf² pair-row materialization the index pays is pure overhead.

    ``grams_ds``: Dataset of (doc_id, gh) rows, whole docs per batch.
    Tiles are raw Ray tasks over the bitset Dataset's BLOCK REFS — the
    Dataset API has no block cross-product; blocks stay in plasma and
    each tile reads exactly two of them (documented partitioning
    assumption: tile count = P(P+1)/2 for P blocks).

    Returns a Dataset of (doc_a, doc_b, jaccard ≥ threshold)."""
    import ray
    import ray.data as rd

    vref = ray.put((vocab, ids_sorted, sz_sorted))

    def to_bits(t: pa.Table) -> pa.Table:
        vocab_l, ids_l, _ = ray.get(vref)
        rk = np.searchsorted(ids_l, t["doc_id"].to_numpy()).astype(np.int64)
        gh = t["gh"].to_numpy()
        order = np.argsort(rk, kind="stable")
        rk, gh = rk[order], gh[order]
        uids, first = np.unique(rk, return_index=True)
        nbytes = (len(vocab_l) + 7) // 8
        rows = []
        for i, start in enumerate(first):
            end = first[i + 1] if i + 1 < len(first) else len(rk)
            bits = np.zeros(len(vocab_l), dtype=np.uint8)
            bits[np.searchsorted(vocab_l, gh[start:end])] = 1
            rows.append(np.packbits(bits).tobytes())
        return pa.table(
            {
                "rk": pa.array(uids, type=pa.int64()),
                "bits": pa.array(rows, type=pa.binary()),
            }
        )

    # batch_size=None → whole blocks: a doc's gram rows are contiguous
    # within a block, so each doc folds into exactly one bitset row
    bits_ds = grams_ds.map_batches(
        to_bits, batch_format="pyarrow", batch_size=None
    ).repartition(n_blocks).materialize()
    block_refs = bits_ds.to_arrow_refs()

    @ray.remote
    def tile(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        vocab_l, ids_l, sz_l = ray.get(vref)
        nv = len(vocab_l)

        def unpack(t):
            rk = t["rk"].to_numpy()
            raw = np.frombuffer(b"".join(t["bits"].to_pylist()), dtype=np.uint8).reshape(len(rk), -1)
            return rk, np.unpackbits(raw, axis=1, count=nv).astype(np.float32)

        ra, ma = unpack(ta)
        rb, mb = unpack(tb)
        if not len(ra) or not len(rb):
            return pa.table(
                {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64()),
                 "jaccard": pa.array([], type=pa.float64())}
            )
        inter = np.rint(ma @ mb.T).astype(np.int64)  # exact: counts < 2^24
        sa = sz_l[ra][:, None]
        sb = sz_l[rb][None, :]
        j = inter / (1.0 * (sa + sb - inter))
        mask = j >= threshold
        if same:  # keep each unordered pair once
            mask &= ra[:, None] < rb[None, :]
        ia, ib = np.nonzero(mask)
        jv = j[ia, ib]
        aa, bb = ra[ia], rb[ib]
        if not same:  # blocks are rk-disjoint; emit smaller rank first
            flip = aa > bb
            aa, bb = np.where(flip, bb, aa), np.where(flip, aa, bb)
        return pa.table(
            {
                "doc_a": pa.array(ids_l[aa]),
                "doc_b": pa.array(ids_l[bb]),
                "jaccard": pa.array(jv),
            }
        )

    futs = []
    for i in range(len(block_refs)):
        for jj in range(i, len(block_refs)):
            futs.append(tile.remote(block_refs[i], block_refs[jj], i == jj))
    return rd.from_arrow_refs(futs)


def dense_bitset_containment_pairs(
    grams_ds,
    vocab: np.ndarray,
    ids_sorted: np.ndarray,
    sz_sorted: np.ndarray,
    theta_num: int = 4,
    theta_den: int = 5,
    n_blocks: int = 8,
):
    """DIRECTED set-containment pair join for the DENSE-VOCABULARY
    regime (sibling of dense_bitset_jaccard_pairs; same bitset/tile
    partitioning assumption).  The PPJoin prefix filter is powerless
    here: with a ~1k-gram vocabulary every gram's df is in the
    hundreds, so prefix probes regenerate near-all-pairs anyway
    (measured 12M pairs / 60 s at sf0.1) — the blocked int matmul
    computes exactly those intersections at BLAS speed instead.

    Emits (containee, container, containment = inter/sz_containee)
    for every ordered pair with inter * theta_den >= theta_num * sz_a.
    Each tile reads two bitset blocks and emits BOTH directions from
    one intersection matrix."""
    import ray
    import ray.data as rd

    vref = ray.put((vocab, ids_sorted, sz_sorted))

    def to_bits(t: pa.Table) -> pa.Table:
        vocab_l, ids_l, _ = ray.get(vref)
        rk = np.searchsorted(ids_l, t["doc_id"].to_numpy()).astype(np.int64)
        gh = t["gh"].to_numpy()
        order = np.argsort(rk, kind="stable")
        rk, gh = rk[order], gh[order]
        uids, first = np.unique(rk, return_index=True)
        rows = []
        for i, start in enumerate(first):
            end = first[i + 1] if i + 1 < len(first) else len(rk)
            bits = np.zeros(len(vocab_l), dtype=np.uint8)
            bits[np.searchsorted(vocab_l, gh[start:end])] = 1
            rows.append(np.packbits(bits).tobytes())
        return pa.table(
            {
                "rk": pa.array(uids, type=pa.int64()),
                "bits": pa.array(rows, type=pa.binary()),
            }
        )

    bits_ds = grams_ds.map_batches(
        to_bits, batch_format="pyarrow", batch_size=None
    ).repartition(n_blocks).materialize()
    block_refs = bits_ds.to_arrow_refs()

    EMPTY = pa.table(
        {"containee": pa.array([], type=pa.int64()),
         "container": pa.array([], type=pa.int64()),
         "containment": pa.array([], type=pa.float64())}
    )

    @ray.remote
    def tile(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        vocab_l, ids_l, sz_l = ray.get(vref)
        nv = len(vocab_l)

        def unpack(t):
            rk = t["rk"].to_numpy()
            raw = np.frombuffer(b"".join(t["bits"].to_pylist()), dtype=np.uint8).reshape(len(rk), -1)
            return rk, np.unpackbits(raw, axis=1, count=nv).astype(np.float32)

        ra, ma = unpack(ta)
        rb, mb = unpack(tb)
        if not len(ra) or not len(rb):
            return EMPTY
        inter = np.rint(ma @ mb.T).astype(np.int64)  # exact: counts < 2^24
        sa = sz_l[ra][:, None]
        sb = sz_l[rb][None, :]
        ident = ra[:, None] == rb[None, :]
        outs = []
        for contain_mask, ca_rk, co_rk, ca_sz, it in (
            (inter * theta_den >= theta_num * sa, ra, rb, sa, inter),
            (inter.T * theta_den >= theta_num * sb.T, rb, ra, sb.T, inter.T),
        ):
            m = contain_mask & ~(ident if it is inter else ident.T)
            ia, ib = np.nonzero(m)
            if not len(ia):
                continue
            outs.append(
                pa.table(
                    {
                        "containee": pa.array(ids_l[ca_rk[ia]]),
                        "container": pa.array(ids_l[co_rk[ib]]),
                        "containment": pa.array(
                            it[ia, ib] / ca_sz[ia, 0].astype(np.float64)
                        ),
                    }
                )
            )
            if same:
                break  # same-block tile: the full matrix covers both directions
        if not outs:
            return EMPTY
        return pa.concat_tables(outs)

    futs = []
    for i in range(len(block_refs)):
        for jj in range(i, len(block_refs)):
            futs.append(tile.remote(block_refs[i], block_refs[jj], i == jj))
    return rd.from_arrow_refs(futs)


def try_hybrid_jaccard(
    grams_ds,
    ids_sorted: np.ndarray,
    sz_sorted: np.ndarray,
    threshold: float,
    n_agg_buckets: int = 32,
    hot_floor: int = 64,
    hot_cap: int = 16_384,
    cold_cost_cap: int = 24_000_000,
    cold_pair_cap: int = 8_000_000,
    n_blocks: int = 8,
):
    """SKEW-SPLIT (hybrid) regime of the exact n-gram Jaccard self-join,
    for corpora whose vocabulary is too large for the dense bitset path
    but whose document-frequency distribution is zipfian: a few HOT
    grams carry most of the Σdf² pair volume (each hot gram alone
    implies df² candidate pairs through an inverted index — the
    all-to-all blowup the "salt hot keys" rule warns about), while the
    long COLD tail has small df and a cheap index.

    Split: the top-``hot_cap`` grams with df ≥ ``hot_floor`` become a
    per-doc bitset (BLAS intersection tiles, like the dense regime but
    over the hot vocabulary only); the cold remainder runs the bucketed
    inverted index, whose per-pair counts are SMALL by construction
    (Σ cold df² ≤ ``cold_cost_cap``, checked before any heavy work) and
    are broadcast into the tiles; each tile thresholds on the exact
    union i_hot + i_cold.  Every doc pair appears in exactly one tile —
    including i_hot = 0 pairs — so no pair is missed, and sizes are the
    TOTAL per-doc gram counts, so the Jaccard value is exact (same
    float expression as the oracle SQL).

    Returns a Dataset of (doc_a, doc_b, jaccard) or ``None`` when the
    split isn't viable (no hot grams, or the cold side exceeds its
    caps) — the caller falls back to the pure inverted-index regime.
    The all-pairs tile grid bounds this regime to corpora where n_docs²
    BLAS is feasible (caller gates on doc count)."""
    import ray
    import ray.data as rd

    from .relational import bucketed_agg

    # ---- df per gram (vocab-sized bucketed shuffle, 16 B rows) -------
    df_ds = bucketed_agg(grams_ds, ["gh"], {"__count__": "df"}).materialize()

    # ---- hot selection: per-block top-k, driver merges block winners -
    def local_top(t: pa.Table) -> pa.Table:
        gh = t["gh"].to_numpy()
        df = t["df"].to_numpy()
        keep = df >= hot_floor
        gh, df = gh[keep], df[keep]
        if len(gh) > hot_cap:
            idx = np.argsort(-df, kind="stable")[:hot_cap]
            gh, df = gh[idx], df[idx]
        return pa.table({"gh": pa.array(gh), "df": pa.array(df)})

    cand = df_ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    if len(cand) == 0:
        return None  # no skew — the pure index is already cheap
    order = np.lexsort((cand["gh"].to_numpy(), -cand["df"].to_numpy()))[:hot_cap]
    hot = np.sort(cand["gh"].to_numpy()[order])
    hot_ref = ray.put(hot)

    # ---- cold Σdf² gate BEFORE any pair work -------------------------
    def cold_cost_part(t: pa.Table) -> pa.Table:
        hot_l = ray.get(hot_ref)
        gh = t["gh"].to_numpy()
        df = t["df"].to_numpy().astype(np.int64)
        pos = np.clip(np.searchsorted(hot_l, gh), 0, len(hot_l) - 1)
        cold = hot_l[pos] != gh
        return pa.table({"c": pa.array([int((df[cold] ** 2).sum())])})

    cold_cost = int(
        df_ds.map_batches(cold_cost_part, batch_format="pyarrow")
        .to_pandas()["c"]
        .sum()
    )
    if cold_cost > cold_cost_cap:
        return None

    # ---- cold inverted index → per-pair cold intersection counts -----
    def cold_pairs_in_bucket(g, hot_l, ids_l):
        import pandas as pd

        gh = g["gh"].to_numpy()
        pos = np.clip(np.searchsorted(hot_l, gh), 0, len(hot_l) - 1)
        cold = hot_l[pos] != gh
        if not cold.any():
            return pd.DataFrame({"pk": np.zeros(0, dtype=np.int64), "pi": np.zeros(0, dtype=np.int64), "abkt": np.zeros(0, dtype=np.int32)})
        df = pd.DataFrame(
            {
                "rk": np.searchsorted(ids_l, g["doc_id"].to_numpy()[cold]).astype(np.int64),
                "gh": gh[cold],
            }
        )
        m = df.merge(df, on="gh", suffixes=("_a", "_b"))
        a, b = m["rk_a"].to_numpy(), m["rk_b"].to_numpy()
        keep = a < b
        if keep.any():
            assert b[keep].max() < (1 << 32), "cold-pair rank packing overflow"
        packed = (a[keep] << 32) | b[keep]
        pk, pi = np.unique(packed, return_counts=True)
        return pd.DataFrame(
            {
                "pk": pk.astype("int64"),
                "pi": pi.astype("int64"),
                "abkt": ((pk >> 32) % n_agg_buckets).astype("int32"),
            }
        )

    ids_ref = ray.put(ids_sorted)

    def _cp(g):
        return cold_pairs_in_bucket(g, ray.get(hot_ref), ray.get(ids_ref))

    def agg_bucket(g):
        import pandas as pd

        pk = g["pk"].to_numpy()
        pi = g["pi"].to_numpy()
        order = np.argsort(pk, kind="stable")
        pk, pi = pk[order], pi[order]
        first = np.ones(len(pk), dtype=bool)
        if len(pk):
            first[1:] = pk[1:] != pk[:-1]
        starts = np.where(first)[0]
        return pd.DataFrame(
            {"pk": pk[starts], "i": np.add.reduceat(pi, starts) if len(starts) else pi[:0]}
        )

    cold_counts = (
        grams_ds.groupby("bucket")
        .map_groups(_cp, batch_format="pandas")
        .groupby("abkt")
        .map_groups(agg_bucket, batch_format="pandas")
        .materialize()
    )
    if cold_counts.count() > cold_pair_cap:
        return None  # broadcast would be too large; pure index instead
    cdf = cold_counts.to_pandas()
    if len(cdf):
        co = np.argsort(cdf["pk"].to_numpy(), kind="stable")
        cold_pk = cdf["pk"].to_numpy()[co]
        cold_i = cdf["i"].to_numpy()[co].astype(np.int64)
    else:
        cold_pk = np.zeros(0, dtype=np.int64)
        cold_i = np.zeros(0, dtype=np.int64)
    cold_ref = ray.put((cold_pk, cold_i))
    sz_ref = ray.put(sz_sorted)

    # ---- hot bitsets + BLAS tiles with the cold counts folded in -----
    def to_bits(t: pa.Table) -> pa.Table:
        hot_l = ray.get(hot_ref)
        ids_l = ray.get(ids_ref)
        rk = np.searchsorted(ids_l, t["doc_id"].to_numpy()).astype(np.int64)
        gh = t["gh"].to_numpy()
        order = np.argsort(rk, kind="stable")
        rk, gh = rk[order], gh[order]
        uids, first = np.unique(rk, return_index=True)
        rows = []
        for i, start in enumerate(first):
            end = first[i + 1] if i + 1 < len(first) else len(rk)
            sel = gh[start:end]
            pos = np.clip(np.searchsorted(hot_l, sel), 0, len(hot_l) - 1)
            pos = pos[hot_l[pos] == sel]  # hot grams only; doc row kept
            bits = np.zeros(len(hot_l), dtype=np.uint8)
            bits[pos] = 1
            rows.append(np.packbits(bits).tobytes())
        return pa.table(
            {"rk": pa.array(uids, type=pa.int64()), "bits": pa.array(rows, type=pa.binary())}
        )

    bits_ds = grams_ds.map_batches(
        to_bits, batch_format="pyarrow", batch_size=None
    ).repartition(n_blocks).materialize()
    block_refs = bits_ds.to_arrow_refs()
    nv = len(hot)

    @ray.remote
    def tile(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        ids_l = ray.get(ids_ref)
        sz_l = ray.get(sz_ref)
        cpk, ci = ray.get(cold_ref)

        def unpack(t):
            rk = t["rk"].to_numpy()
            if not len(rk):  # repartition can emit empty blocks
                return rk, np.zeros((0, nv), dtype=np.float32)
            raw = np.frombuffer(b"".join(t["bits"].to_pylist()), dtype=np.uint8).reshape(len(rk), -1)
            return rk, np.unpackbits(raw, axis=1, count=nv).astype(np.float32)

        empty = pa.table(
            {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64()),
             "jaccard": pa.array([], type=pa.float64())}
        )
        ra, ma = unpack(ta)
        rb, mb = unpack(tb)
        if not len(ra) or not len(rb):
            return empty
        inter = np.rint(ma @ mb.T).astype(np.int64)  # exact: counts < 2^24
        if len(cpk):
            lo = np.minimum(ra[:, None], rb[None, :]).astype(np.int64)
            hi = np.maximum(ra[:, None], rb[None, :]).astype(np.int64)
            assert int(hi.max(initial=0)) < (1 << 32), "grid rank packing overflow"
            grid = (lo << 32) | hi
            pos = np.clip(np.searchsorted(cpk, grid), 0, len(cpk) - 1)
            hit = cpk[pos] == grid
            inter = inter + np.where(hit, ci[pos], 0)
        sa = sz_l[ra][:, None]
        sb = sz_l[rb][None, :]
        j = inter / (1.0 * (sa + sb - inter))
        mask = j >= threshold
        if same:
            mask &= ra[:, None] < rb[None, :]
        ia, ib = np.nonzero(mask)
        if not len(ia):
            return empty
        jv = j[ia, ib]
        aa, bb = ra[ia], rb[ib]
        if not same:
            flip = aa > bb
            aa, bb = np.where(flip, bb, aa), np.where(flip, aa, bb)
        return pa.table(
            {
                "doc_a": pa.array(ids_l[aa]),
                "doc_b": pa.array(ids_l[bb]),
                "jaccard": pa.array(jv),
            }
        )

    futs = []
    for i in range(len(block_refs)):
        for jj in range(i, len(block_refs)):
            futs.append(tile.remote(block_refs[i], block_refs[jj], i == jj))
    return rd.from_arrow_refs(futs)


def connected_components(pairs) -> dict:
    """Union-find over verified pairs → id → component representative.
    Driver-side because the verified-pair set is tiny relative to the
    corpus; at scale: iterative min-label propagation with groupby."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in set(pairs["doc_a"]) | set(pairs["doc_b"])}
