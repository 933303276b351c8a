"""Partitioned URL-seen set: bloom/cuckoo test-and-set shard actors.

The visited-set union of the reference (crawl.clj:136-139 et al.)
becomes N shard actors, each owning the keys with
``url_hash64(url) % N == shard_id`` — one owner per key means
test-and-set needs no cross-shard coordination (SURVEY.md §7.5).

This is one of the few places raw Ray actors are justified: a shared
*mutable* membership index that every round must read AND write; the
Dataset API has no primitive for incremental test-and-set.  The BSP
loop uses the driver-side ``SeenSet`` handle; Dataset pipelines use
``make_seen_filter_stage`` — a map_batches function that routes each
batch through the shards (one remote call per shard per batch, NOT
per URL).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.urlnorm import url_hash64
from ..state.bloom import BloomFilter, CuckooFilter, bloom_add_batch, bloom_contains_batch


# Routing wire version: embedded in seen-shard snapshots; restore
# refuses a mismatch (a filter built under different routing would
# serve false negatives — same failure mode the near-dup shingle wire
# version guards against).
ROUTING_VERSION = "range32-v1"


def shard_route(urls: list[str], n: int) -> np.ndarray:
    """Stable url → shard-id routing (pandas siphash — identical across
    processes, so workers and the driver handle agree on key ownership
    and resume keeps the same shard assignment).

    RANGE routing on the hash's top 32 bits (shard = h32·n >> 32), not
    modulo: each shard owns a contiguous hash interval, so a checkpoint
    written at n shards restores into n' shards by mapping each new
    shard to the handful of old intervals overlapping its own
    (shard_route_bounds) — the basis of shard-count elasticity."""
    import pandas as pd

    h = pd.util.hash_pandas_object(pd.Series(urls, dtype=object), index=False).to_numpy()
    return (((h >> np.uint64(32)) * np.uint64(n)) >> np.uint64(32)).astype(np.int64)


def shard_route_bounds(s: int, n: int) -> tuple[int, int]:
    """[lo, hi) interval of shard s in the 32-bit routed hash space:
    shard(h32) = h32·n >> 32 ≥ s  ⇔  h32 ≥ ceil(s·2³² / n)."""
    lo = (s * (1 << 32) + n - 1) // n
    hi = ((s + 1) * (1 << 32) + n - 1) // n
    return lo, hi


def overlapping_shards(i: int, n_new: int, n_old: int) -> list[int]:
    """Old shard ids whose hash interval intersects new shard i's."""
    lo_i, hi_i = shard_route_bounds(i, n_new)
    out = []
    for s in range(n_old):
        lo_s, hi_s = shard_route_bounds(s, n_old)
        if lo_i < hi_s and lo_s < hi_i:
            out.append(s)
    return out


# Candidate-link tables offered to a shard carry these columns; prio is
# the global first-wins key: parent_discovery_seq × 2^24 + within-page
# link index.  Candidate ordering is lexicographic (depth, prio), which
# equals the sequential oracle's (parent_depth, parent_seq, link_index)
# processing order (candidate depth = parent depth + 1, monotone).
LINK_CANDIDATE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("xpath", pa.string()),
        pa.field("src_url", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("prio", pa.int64()),
    ]
)

# Frontier rows held INSIDE the shards (round-3 north-rule change: a
# 10^10-URL frontier never lives on, or is sorted by, the driver).
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("discovery_seq", pa.int64()),
        pa.field("src_url", pa.string()),
        pa.field("src_xpath", pa.list_(pa.string())),
    ]
)

# packed wave-selection key = depth << SEQ_BITS | discovery_seq: lets the
# driver pick a global (depth, seq) cutoff from per-shard int64 arrays
SEQ_BITS = 40


def pack_keys(depth: np.ndarray, seq: np.ndarray) -> np.ndarray:
    d = depth.astype(np.int64)
    s = seq.astype(np.int64)
    assert (len(d) == 0) or (d.max() < (1 << (62 - SEQ_BITS)) and s.max() < (1 << SEQ_BITS)), \
        "frontier key packing overflow (depth/seq out of documented bounds)"
    return (d << SEQ_BITS) | s


# Session convention of the synthetic web (stages/fetch.py
# SYNTH_LOGIN_PATH): a frontier URL ending in "/login" establishes its
# host's session on fetch.  Each wave pop reports the per-host MIN
# (depth, seq) key of the logins it contains, so the Fetcher can decide
# gated-page visibility deterministically (sequential-equivalent at any
# wave parallelism — see Fetcher.__call__).  Redirect aliases of a
# login page are not detected by this scan; the synthetic graph never
# aliases /login (documented assumption).
LOGIN_URL_SUFFIX = "/login"


def login_wave_keys(wave: pa.Table) -> dict[str, int]:
    """{host: min packed (depth, seq) key} over the wave's login URLs
    (empty for session-free graphs — one vectorized suffix scan)."""
    import pyarrow.compute as pc

    mask = pc.ends_with(wave.column("url"), pattern=LOGIN_URL_SUFFIX)
    if not pc.any(mask).as_py():
        return {}
    from ..functions.urlnorm import url_host

    sel = wave.filter(mask)
    keys = pack_keys(
        sel.column("depth").to_numpy(zero_copy_only=False),
        sel.column("discovery_seq").to_numpy(zero_copy_only=False),
    )
    out: dict[str, int] = {}
    for u, k in zip(sel.column("url").to_pylist(), keys):
        h = url_host(u)
        if h not in out or int(k) < out[h]:
            out[h] = int(k)
    return out


@ray.remote
class SeenShard:
    """One URL-seen partition: approximate filter + (small-scale only)
    exact audit set for conformance checks."""

    def __init__(self, shard_id: int, capacity: int = 1_000_000, kind: str = "bloom", exact_audit: bool = True):
        self.shard_id = shard_id
        self.filter = BloomFilter(capacity) if kind == "bloom" else CuckooFilter(capacity)
        self.exact = set() if exact_audit else None
        # read-only membership layers from a re-sharded restore (filters
        # checkpointed under a DIFFERENT shard count whose hash interval
        # overlaps this shard's) — consulted by test_and_set/contains,
        # never written.  Empty in the common same-count lifecycle.
        self.base_filters: list = []
        self._offers: list[pa.Table] = []
        # shard-resident frontier: depth → [seq-sorted tables in append
        # order] (appends carry monotonically increasing seqs, so each
        # bucket is fully sorted without ever re-sorting)
        self._buckets: dict[int, list[pa.Table]] = {}
        self._fcount = 0
        self._pending: pa.Table | None = None

    # ---- distributed link path (BSP round offer/commit) --------------
    # Workers offer their chunk's candidate links directly (no driver
    # hop); commit() makes the round's first-wins winner deterministic
    # regardless of RPC arrival order by sorting on the global priority
    # key before test-and-set.

    def offer(self, tbl: pa.Table) -> int:
        """Buffer a candidate-link table (LINK_CANDIDATE_SCHEMA) for the
        current round.  Returns rows buffered (ack)."""
        if tbl.num_rows:
            self._offers.append(tbl)
        return tbl.num_rows

    def _commit_winners(self) -> pa.Table:
        """Shared commit kernel: sort buffered candidates by the global
        (depth, prio) priority, first-wins dedup on url, test-and-set;
        returns the winning NEW rows (priority-sorted)."""
        if not self._offers:
            return pa.Table.from_pylist([], schema=LINK_CANDIDATE_SCHEMA)
        t = pa.concat_tables(self._offers, promote_options="default")
        self._offers = []
        order = np.lexsort(
            (t.column("prio").to_numpy(), t.column("depth").to_numpy())
        )
        t = t.take(pa.array(order))
        import pandas as pd

        urls = t.column("url").to_pylist()
        first = ~pd.Series(urls, dtype=object).duplicated(keep="first").to_numpy()
        if not first.all():
            t = t.filter(pa.array(first))
            urls = [u for u, f in zip(urls, first) if f]
        new = self.test_and_set(urls)
        return t.filter(pa.array(new))

    def commit(self) -> pa.Table:
        """Winners shipped back to the caller (legacy/driver path;
        the BSP crawl uses commit_keys/finalize_commit so winner ROWS
        never leave the shard)."""
        return self._commit_winners()

    # ---- shard-resident frontier (round 3: 10^10-URL north rule) -----
    # The driver only ever sees integer key arrays and counts; winner
    # rows are born here (commit), live here (depth buckets), and leave
    # here as plasma chunk refs straight to the fetch workers.

    def commit_keys(self):
        """Phase 1 of the round's link commit: run the first-wins
        commit, hold the winner rows pending seq assignment, and return
        ONLY their (depth:int32, prio:int64) key arrays — the driver
        ranks these globally to assign dense discovery seqs without
        touching a single URL string."""
        t = self._commit_winners()
        self._pending = t
        return (
            t.column("depth").to_numpy(zero_copy_only=False).astype(np.int32),
            t.column("prio").to_numpy(zero_copy_only=False).astype(np.int64),
        )

    def finalize_commit(self, seqs: np.ndarray) -> int:
        """Phase 2: attach the globally-ranked discovery seqs (aligned
        with commit_keys order), compute host, append to the shard's
        frontier buckets."""
        from ..functions.urlnorm import url_host as _host

        t, self._pending = self._pending, None
        if t is None or t.num_rows == 0:
            return 0
        urls = t.column("url").to_pylist()
        rows = pa.table(
            {
                "url": t.column("url"),
                "host": pa.array([_host(u) for u in urls], type=pa.string()),
                "depth": t.column("depth"),
                "discovery_seq": pa.array(np.asarray(seqs, dtype=np.int64), type=pa.int64()),
                "src_url": t.column("src_url"),
                "src_xpath": pa.array(
                    [[x] for x in t.column("xpath").to_pylist()],
                    type=pa.list_(pa.string()),
                ),
            },
            schema=FRONTIER_SCHEMA,
        )
        self._append_frontier(rows, presorted=True)
        return rows.num_rows

    def _append_frontier(self, rows: pa.Table, presorted: bool = False) -> None:
        """Split (depth, seq)-sorted rows into per-depth bucket tables."""
        if rows.num_rows == 0:
            return
        d = rows.column("depth").to_numpy(zero_copy_only=False)
        if not presorted:
            s = rows.column("discovery_seq").to_numpy(zero_copy_only=False)
            order = np.lexsort((s, d))
            if not np.array_equal(order, np.arange(rows.num_rows)):
                rows = rows.take(pa.array(order))
                d = rows.column("depth").to_numpy(zero_copy_only=False)
        uds, first = np.unique(d, return_index=True)
        bounds = list(first) + [rows.num_rows]
        for i, depth in enumerate(uds):
            self._buckets.setdefault(int(depth), []).append(
                rows.slice(bounds[i], bounds[i + 1] - bounds[i])
            )
        self._fcount += rows.num_rows

    def add_frontier(self, rows: pa.Table) -> int:
        """Seed / resume path: insert arbitrary frontier rows."""
        self._append_frontier(rows, presorted=False)
        return rows.num_rows

    def frontier_count(self) -> int:
        return self._fcount

    def peek_keys(self, k: int) -> np.ndarray:
        """Packed (depth << SEQ_BITS | seq) keys of this shard's k
        smallest frontier entries — the driver's wave-cutoff input."""
        out = []
        remaining = int(k)
        for depth in sorted(self._buckets):
            for t in self._buckets[depth]:
                s = t.column("discovery_seq").to_numpy(zero_copy_only=False)[:remaining]
                out.append(pack_keys(np.full(len(s), depth), s))
                remaining -= len(s)
                if remaining <= 0:
                    break
            if remaining <= 0:
                break
        return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)

    def pop_wave(self, cutoff: int | None, chunk_size: int):
        """Remove and return this shard's wave rows — every frontier
        entry with packed key ≤ ``cutoff`` (None = all) — as plasma
        ObjectRefs of chunk tables in (depth, seq) order.  The rows go
        shard → plasma → fetch worker; the driver passes refs only."""
        wave = self._pop_rows(cutoff)
        if wave is None:
            return [], 0, {}
        refs = [
            ray.put(wave.slice(o, chunk_size))
            for o in range(0, wave.num_rows, chunk_size)
        ]
        return refs, wave.num_rows, login_wave_keys(wave)

    def pop_wave_parts(self, cutoff: int | None, n_partitions: int, hot_threshold: int):
        """Polite-mode wave pop: rows leave this shard already grouped
        by salted host partition (state/frontier.py) — partition ids are
        host-deterministic, so the same host lands in the same partition
        id on EVERY shard and the fetch worker that concats a
        partition's per-shard pieces sees all of that host's wave rows
        in one chunk (one politeness-clock reserve per chunk).  Returns
        ({partition_id: plasma ref of this shard's piece}, rows popped);
        the driver merges ref lists by id and never touches a row.
        ``hot_threshold`` is the PER-SHARD salting threshold: URL-hash
        routing spreads a host evenly over shards, so the caller divides
        the global threshold by the shard count."""
        wave = self._pop_rows(cutoff)
        if wave is None:
            return {}, 0, {}
        from ..state.frontier import partition_frontier

        wp = partition_frontier(wave, n_partitions=n_partitions, hot_threshold=hot_threshold)
        part = wp.column("partition").to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        sorted_wave = wave.take(pa.array(order))
        spart = part[order]
        uids, first = np.unique(spart, return_index=True)
        bounds = list(first) + [len(spart)]
        out = {
            int(pid): ray.put(sorted_wave.slice(bounds[i], bounds[i + 1] - bounds[i]))
            for i, pid in enumerate(uids)
        }
        return out, wave.num_rows, login_wave_keys(wave)

    def _pop_rows(self, cutoff: int | None) -> pa.Table | None:
        """Detach and return this shard's wave rows in (depth, seq)
        order (None if nothing qualifies)."""
        takes: list[pa.Table] = []
        for depth in sorted(self._buckets):
            if cutoff is not None and (depth << SEQ_BITS) > cutoff:
                break
            tables = self._buckets[depth]
            if cutoff is None:
                takes.extend(tables)
                self._fcount -= sum(t.num_rows for t in tables)
                del self._buckets[depth]
                continue
            seq_limit = cutoff - (depth << SEQ_BITS)
            keep: list[pa.Table] = []
            for t in tables:
                s = t.column("discovery_seq").to_numpy(zero_copy_only=False)
                n = int(np.searchsorted(s, seq_limit, side="right"))
                if n:
                    takes.append(t.slice(0, n))
                    self._fcount -= n
                if n < t.num_rows:
                    keep.append(t.slice(n))
            if keep:
                self._buckets[depth] = keep
            else:
                del self._buckets[depth]
        if not takes:
            return None
        return pa.concat_tables(takes, promote_options="default")

    def seq_bounds(self):
        """(min_seq, max_seq) of this shard's frontier, or None.  The
        reference's crawl-random queue (crawl.clj:781-801) is always
        seq-SORTED (appends carry fresh max seqs; head/tail pops keep
        order), so head ≡ global min seq and tail ≡ global max seq."""
        if self._fcount == 0:
            return None
        mins, maxs = [], []
        for tables in self._buckets.values():
            s_first = tables[0].column("discovery_seq")
            s_last = tables[-1].column("discovery_seq")
            mins.append(s_first[0].as_py())
            maxs.append(s_last[len(s_last) - 1].as_py())
        return (min(mins), max(maxs))

    def pop_seq(self, seq: int):
        """Remove and return the frontier row with this discovery_seq
        (None if not owned here) — the crawl-random dequeue."""
        for depth, tables in list(self._buckets.items()):
            for ti, t in enumerate(tables):
                s = t.column("discovery_seq").to_numpy(zero_copy_only=False)
                j = int(np.searchsorted(s, seq))
                if j < len(s) and s[j] == seq:
                    row = t.slice(j, 1)
                    pieces = tables[:ti]
                    if j:
                        pieces.append(t.slice(0, j))
                    if j + 1 < t.num_rows:
                        pieces.append(t.slice(j + 1))
                    pieces.extend(tables[ti + 1:])
                    if pieces:
                        self._buckets[depth] = pieces
                    else:
                        del self._buckets[depth]
                    self._fcount -= 1
                    return row
        return None

    def write_frontier(self, path: str) -> int:
        """Checkpoint: this shard writes its own frontier part file —
        the driver sees only the row count."""
        import pyarrow.parquet as pq

        tables = [
            t for depth in sorted(self._buckets) for t in self._buckets[depth]
        ]
        tbl = (
            pa.concat_tables(tables, promote_options="default")
            if tables
            else pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
        )
        pq.write_table(tbl, path)
        return tbl.num_rows

    def _in_base(self, urls: list[str]) -> np.ndarray:
        """Membership in the read-only re-shard base layers (all-False
        when there are none — the common case costs one branch)."""
        if not self.base_filters or not urls:
            return np.zeros(len(urls), dtype=bool)
        out = np.zeros(len(urls), dtype=bool)
        for bf in self.base_filters:
            if isinstance(bf, BloomFilter):
                out |= bloom_contains_batch(bf, urls)
            else:
                out |= np.array([u in bf for u in urls], dtype=bool)
        return out

    def test_and_set(self, urls: list[str]) -> np.ndarray:
        """Insert all; return bool array: True where the URL was new."""
        if self.exact is None and isinstance(self.filter, BloomFilter):
            new = bloom_add_batch(self.filter, urls)  # vectorized path
            if self.base_filters and new.any():
                new &= ~self._in_base(urls)
            return new
        base = self._in_base(urls)
        out = np.zeros(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            if self.exact is not None:
                new = u not in self.exact
                if new:
                    self.exact.add(u)
                    self.filter.add(u)
                out[i] = new and not base[i]
            else:
                out[i] = self.filter.add(u) and not base[i]
        return out

    def contains(self, urls: list[str]) -> np.ndarray:
        if self.exact is None and isinstance(self.filter, BloomFilter):
            out = bloom_contains_batch(self.filter, urls)  # vectorized
        else:
            src = self.exact if self.exact is not None else self.filter
            out = np.array([u in src for u in urls], dtype=bool)
        return out | self._in_base(urls)

    def size(self) -> int:
        return len(self.exact) if self.exact is not None else self.filter.count

    def members(self) -> list[str]:
        """Exact membership (audit mode only) — conformance tests."""
        return sorted(self.exact) if self.exact is not None else []

    def snapshot(self) -> dict:
        if self.base_filters:
            # base layers are read-only restores of OLD-count filters; a
            # snapshot taken now must stay self-contained, so they are
            # carried along (their total size is one old checkpoint's).
            base = [bf.snapshot() for bf in self.base_filters]
        else:
            base = []
        return {
            "shard_id": self.shard_id,
            "routing": ROUTING_VERSION,
            "filter": self.filter.snapshot(),
            "base_filters": base,
            "exact": sorted(self.exact) if self.exact is not None else None,
        }

    def _check_routing(self, snap: dict) -> None:
        rv = snap.get("routing")
        if rv != ROUTING_VERSION:
            raise RuntimeError(
                f"seen-shard snapshot routing version {rv!r} != {ROUTING_VERSION!r}: "
                "a filter built under different url→shard routing would serve "
                "false negatives — rebuild the seen set from the corpus instead"
            )

    def restore(self, snap: dict) -> None:
        self._check_routing(snap)
        kind = snap["filter"]["kind"]
        self.filter = (BloomFilter if kind == "bloom" else CuckooFilter).restore(snap["filter"])
        self.base_filters = [
            (BloomFilter if b["kind"] == "bloom" else CuckooFilter).restore(b)
            for b in snap.get("base_filters", [])
        ]
        self.exact = set(snap["exact"]) if snap["exact"] is not None else None

    def restore_resharded(self, snaps: list[dict], n_new: int, n_old: int | None = None) -> None:
        """Restore from OLD-count snapshots whose hash intervals overlap
        this shard's (shard-count elasticity).  Two regimes:

          * every snapshot carries exact membership (audit mode):
            re-partition members by the new routing and rebuild a fresh
            filter — exact, no approximation cost;
          * filter-only snapshots (the 10^10-URL posture — members are
            not enumerable): keep each old filter as a read-only BASE
            layer.  Queries OR over the layers; no false negatives, and
            false positives stay bounded by the sum of the layers' own
            rates (each layer holds only what it held at checkpoint).
        """
        for s in snaps:
            self._check_routing(s)
        if all(s["exact"] is not None for s in snaps):
            members = sorted(
                {u for s in snaps for u in s["exact"]}
            )
            mine = (
                [u for u, sid in zip(members, shard_route(members, n_new)) if sid == self.shard_id]
                if members
                else []
            )
            if isinstance(self.filter, BloomFilter):
                # re-sized in case old shards merged (n_new < n_old)
                self.filter = BloomFilter(max(self.filter.capacity, int(len(mine) * 1.2) + 64))
                bloom_add_batch(self.filter, mine)
            else:
                self.filter = CuckooFilter(max(self.filter.count + len(mine), int(len(mine) * 1.2) + 64))
                for u in mine:
                    self.filter.add(u)
            self.exact = set(mine)
            self.base_filters = []
            return
        self.base_filters = [
            (BloomFilter if s["filter"]["kind"] == "bloom" else CuckooFilter).restore(s["filter"])
            for s in snaps
        ] + [
            (BloomFilter if b["kind"] == "bloom" else CuckooFilter).restore(b)
            for s in snaps
            for b in s.get("base_filters", [])
        ]
        self.exact = None
        # Shards MERGED (n_new < n_old): this shard now owns an interval
        # ~n_old/n_new times wider than the per-shard capacity the live
        # filter was sized for, and the base layers only cover members
        # known at checkpoint time — continued crawling would push the
        # live filter past its design load and degrade its FP rate
        # (silently dropped URLs).  Scale the fresh live filter by the
        # interval-overlap factor.
        factor = (
            -(-n_old // n_new) if n_old is not None and n_old > n_new
            else max(1, len(snaps) - 1)  # overlap count bounds the factor
        )
        if factor > 1 and self.filter.count == 0:
            if isinstance(self.filter, BloomFilter):
                self.filter = BloomFilter(self.filter.capacity * factor, self.filter.fp_rate)
            else:
                self.filter = CuckooFilter(self.filter.n_buckets * CuckooFilter.SLOTS * factor)

    def restore_resharded_from(self, paths: list[str], n_new: int, n_old: int | None = None) -> None:
        import pickle

        snaps = []
        for p in paths:
            with open(p, "rb") as f:
                snaps.append(pickle.load(f))
        self.restore_resharded(snaps, n_new, n_old)

    def snapshot_to(self, path: str) -> int:
        """Shard-side snapshot write (shared storage) — the driver only
        sees the filename."""
        import os
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self.snapshot(), f)
        return os.path.getsize(path)

    def restore_from(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            self.restore(pickle.load(f))


class SeenSet:
    """Driver-side handle over the shard actors."""

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1_000_000, kind: str = "bloom", exact_audit: bool = True):
        self.n = n_shards
        # zero CPU reservation: shards are light index holders; a
        # fractional reservation can deadlock actor creation when the
        # session's num_cpus budget is small (scaling runs at N=2)
        self.shards = [
            SeenShard.options(num_cpus=0).remote(i, capacity_per_shard, kind, exact_audit)
            for i in range(n_shards)
        ]

    def _route(self, urls: list[str]) -> tuple[list[list[str]], list[list[int]]]:
        """Vectorized shard routing (shard_route — stable across
        processes, so resume keeps the same shard ownership)."""
        shard = shard_route(urls, self.n)
        per, idx = [], []
        arr = np.asarray(urls, dtype=object)
        for s in range(self.n):
            sel = np.where(shard == s)[0]
            per.append(arr[sel].tolist())
            idx.append(sel)
        return per, idx

    def test_and_set(self, urls: list[str]) -> np.ndarray:
        """Batch test-and-set across shards (one RPC per non-empty shard)."""
        per, idx = self._route(urls)
        futs = {s: self.shards[s].test_and_set.remote(per[s]) for s in range(self.n) if per[s]}
        out = np.zeros(len(urls), dtype=bool)
        for s, fut in futs.items():
            out[np.array(idx[s], dtype=np.int64)] = ray.get(fut)
        return out

    def contains(self, urls: list[str]) -> np.ndarray:
        per, idx = self._route(urls)
        futs = {s: self.shards[s].contains.remote(per[s]) for s in range(self.n) if per[s]}
        out = np.zeros(len(urls), dtype=bool)
        for s, fut in futs.items():
            out[np.array(idx[s], dtype=np.int64)] = ray.get(fut)
        return out

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def members(self) -> set[str]:
        out: set[str] = set()
        for m in ray.get([s.members.remote() for s in self.shards]):
            out.update(m)
        return out

    # ---- shard-resident frontier fan-out -----------------------------

    def add_frontier_routed(self, rows: pa.Table) -> int:
        """Route frontier rows to their owner shards (seed + resume
        path; the per-round path is commit_keys/finalize_commit, which
        never moves rows at all)."""
        if rows.num_rows == 0:
            return 0
        sid = shard_route(rows.column("url").to_pylist(), self.n)
        futs = []
        for s in range(self.n):
            sel = np.where(sid == s)[0]
            if len(sel):
                futs.append(self.shards[s].add_frontier.remote(rows.take(pa.array(sel))))
        return sum(ray.get(futs)) if futs else 0

    def frontier_count(self) -> int:
        return sum(ray.get([s.frontier_count.remote() for s in self.shards]))

    def commit_and_rank(self, next_seq: int):
        """The round's link commit: every shard commits locally and
        reports ONLY (depth, prio) int arrays; the driver ranks them
        globally (np.lexsort over ints — flat memory wrt frontier size)
        and sends back dense discovery seqs.  Returns new-URL count."""
        keys = ray.get([s.commit_keys.remote() for s in self.shards])
        lens = [len(d) for d, _ in keys]
        n_new = int(sum(lens))
        if n_new == 0:
            return 0
        dall = np.concatenate([d for d, _ in keys])
        pall = np.concatenate([p for _, p in keys])
        order = np.lexsort((pall, dall))
        ranks = np.empty(n_new, dtype=np.int64)
        ranks[order] = np.arange(n_new, dtype=np.int64)
        seqs = next_seq + ranks
        offs = np.cumsum([0] + lens)
        ray.get(
            [
                self.shards[i].finalize_commit.remote(seqs[offs[i]:offs[i + 1]])
                for i in range(self.n)
                if lens[i]
            ]
        )
        return n_new

    @staticmethod
    def _merge_logins(dicts) -> dict[str, int]:
        out: dict[str, int] = {}
        for d in dicts:
            for h, k in d.items():
                if h not in out or k < out[h]:
                    out[h] = k
        return out

    def pop_wave(self, cutoff: int | None, chunk_size: int):
        """Pop the wave from every shard; returns (chunk refs in shard
        order, rows popped, per-host min login keys in the wave)."""
        pops = ray.get(
            [s.pop_wave.remote(cutoff, chunk_size) for s in self.shards]
        )
        refs = [r for rs, _, _ in pops for r in rs]
        return (
            refs,
            int(sum(c for _, c, _ in pops)),
            self._merge_logins(lk for _, _, lk in pops),
        )

    def pop_wave_hosted(self, cutoff: int | None, n_partitions: int, hot_threshold: int = 1024):
        """Polite-mode pop: every shard partitions its own wave rows by
        salted host (pop_wave_parts); the driver merges per-partition
        ref LISTS by partition id — refs only, no frontier rows here.
        Returns (list of ref-lists, one per non-empty partition in
        partition-id order, rows popped, per-host min login keys)."""
        per_shard_hot = max(1, hot_threshold // max(1, self.n))
        pops = ray.get(
            [
                s.pop_wave_parts.remote(cutoff, n_partitions, per_shard_hot)
                for s in self.shards
            ]
        )
        by_part: dict[int, list] = {}
        for d, _, _ in pops:
            for pid, ref in d.items():
                by_part.setdefault(pid, []).append(ref)
        chunks = [by_part[pid] for pid in sorted(by_part)]
        return (
            chunks,
            int(sum(c for _, c, _ in pops)),
            self._merge_logins(lk for _, _, lk in pops),
        )

    def peek_cutoff(self, wave_n: int) -> int:
        """Global (depth, seq) cutoff for a wave of ``wave_n`` rows:
        k-way merge of per-shard packed key arrays (ints only)."""
        peeks = ray.get([s.peek_keys.remote(wave_n) for s in self.shards])
        allk = np.concatenate([p for p in peeks if len(p)])
        allk = np.partition(allk, wave_n - 1)[:wave_n]
        return int(allk.max())

    def write_frontier(self, dir_path: str) -> int:
        import os

        return int(
            sum(
                ray.get(
                    [
                        s.write_frontier.remote(
                            os.path.join(dir_path, f"part-{i:05d}.parquet")
                        )
                        for i, s in enumerate(self.shards)
                    ]
                )
            )
        )

    def commit_offers(self) -> pa.Table:
        """Commit every shard's buffered candidate links (one RPC per
        shard, in parallel) and return the union of winners sorted by
        the global priority key — deterministic first-wins."""
        tables = ray.get([s.commit.remote() for s in self.shards])
        t = pa.concat_tables(tables, promote_options="default")
        if t.num_rows:
            order = np.argsort(t.column("prio").to_numpy(), kind="stable")
            t = t.take(pa.array(order))
        return t

    def snapshot(self) -> list[dict]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list[dict]) -> None:
        ray.get([self.shards[s["shard_id"]].restore.remote(s) for s in snaps])

    def snapshot_to(self, dir_path: str, prefix: str = "seen_shard") -> list[str]:
        import os

        names = [f"{prefix}_{i}.pkl" for i in range(self.n)]
        ray.get(
            [
                s.snapshot_to.remote(os.path.join(dir_path, nm))
                for s, nm in zip(self.shards, names)
            ]
        )
        return names

    def restore_from(self, dir_path: str, names: list[str]) -> None:
        """Restore shard snapshots; a checkpoint written at a DIFFERENT
        shard count re-shards (range routing: each new shard loads only
        the old snapshots overlapping its hash interval — exact member
        re-partition in audit mode, read-only base layers otherwise)."""
        import os

        n_old = len(names)
        if n_old == self.n:
            ray.get(
                [
                    self.shards[i].restore_from.remote(os.path.join(dir_path, nm))
                    for i, nm in enumerate(names)
                ]
            )
            return
        ray.get(
            [
                self.shards[i].restore_resharded_from.remote(
                    [
                        os.path.join(dir_path, names[s])
                        for s in overlapping_shards(i, self.n, n_old)
                    ],
                    self.n,
                    n_old,
                )
                for i in range(self.n)
            ]
        )


def make_seen_filter_stage(seen: SeenSet):
    """map_batches stage: links batch → only rows whose url is NEW
    (test-and-set).  The shard actors are the state; this function is a
    stateless task that routes to them."""

    shards = seen.shards
    n = seen.n
    route = seen._route  # SAME routing as the driver-side handle —
    # mixed routing would send a URL to two different owner shards

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        if not urls:
            return batch
        per, idx = route(urls)
        futs = {s: shards[s].test_and_set.remote(per[s]) for s in range(n) if per[s]}
        new = np.zeros(len(urls), dtype=bool)
        for s, fut in futs.items():
            new[np.asarray(idx[s], dtype=np.int64)] = ray.get(fut)
        return batch.filter(pa.array(new))

    return fn
