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
from ..state.bloom import BloomFilter, CuckooFilter, bloom_add_batch


def shard_route(urls: list[str], n: int) -> np.ndarray:
    """Stable url → shard-id routing (pandas siphash — identical across
    processes, so workers and the driver handle agree on key ownership
    and resume keeps the same shard assignment)."""
    import pandas as pd

    h = pd.util.hash_pandas_object(pd.Series(urls, dtype=object), index=False).to_numpy()
    return (h % n).astype(np.int64)


# Candidate-link tables offered to a shard carry these columns; prio is
# the global first-wins key (wave priority order × document link order).
LINK_CANDIDATE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("xpath", pa.string()),
        pa.field("src_url", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("prio", pa.int64()),
    ]
)


@ray.remote
class SeenShard:
    """One URL-seen partition: approximate filter + (small-scale only)
    exact audit set for conformance checks."""

    def __init__(self, shard_id: int, capacity: int = 1_000_000, kind: str = "bloom", exact_audit: bool = True):
        self.shard_id = shard_id
        self.filter = BloomFilter(capacity) if kind == "bloom" else CuckooFilter(capacity)
        self.exact = set() if exact_audit else None
        self._offers: list[pa.Table] = []

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

    def commit(self) -> pa.Table:
        """Apply all buffered candidates in global priority order:
        first-wins dedup on url, then test-and-set against the filter;
        returns the winning NEW rows (still priority-sorted)."""
        if not self._offers:
            return pa.Table.from_pylist([], schema=LINK_CANDIDATE_SCHEMA)
        t = pa.concat_tables(self._offers, promote_options="default")
        self._offers = []
        order = np.argsort(t.column("prio").to_numpy(), kind="stable")
        t = t.take(pa.array(order))
        import pandas as pd

        urls = t.column("url").to_pylist()
        first = ~pd.Series(urls, dtype=object).duplicated(keep="first").to_numpy()
        if not first.all():
            t = t.filter(pa.array(first))
            urls = [u for u, f in zip(urls, first) if f]
        new = self.test_and_set(urls)
        return t.filter(pa.array(new))

    def test_and_set(self, urls: list[str]) -> np.ndarray:
        """Insert all; return bool array: True where the URL was new."""
        if self.exact is None and isinstance(self.filter, BloomFilter):
            return bloom_add_batch(self.filter, urls)  # vectorized path
        out = np.zeros(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            if self.exact is not None:
                new = u not in self.exact
                if new:
                    self.exact.add(u)
                    self.filter.add(u)
                out[i] = new
            else:
                out[i] = self.filter.add(u)
        return out

    def contains(self, urls: list[str]) -> np.ndarray:
        src = self.exact if self.exact is not None else self.filter
        return np.array([u in src for u in urls], dtype=bool)

    def size(self) -> int:
        return len(self.exact) if self.exact is not None else self.filter.count

    def members(self) -> list[str]:
        """Exact membership (audit mode only) — conformance tests."""
        return sorted(self.exact) if self.exact is not None else []

    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "filter": self.filter.snapshot(),
            "exact": sorted(self.exact) if self.exact is not None else None,
        }

    def restore(self, snap: dict) -> None:
        kind = snap["filter"]["kind"]
        self.filter = (BloomFilter if kind == "bloom" else CuckooFilter).restore(snap["filter"])
        self.exact = set(snap["exact"]) if snap["exact"] is not None else None

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
        import os

        ray.get(
            [
                self.shards[i].restore_from.remote(os.path.join(dir_path, nm))
                for i, nm in enumerate(names)
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
