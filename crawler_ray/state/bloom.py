"""Bloom + cuckoo filters for the partitioned URL-seen set.

The reference keeps visited URLs as one in-heap Clojure set unioned
after every step (crawl.clj:136-139, 178-181, 520-521).  At 10^10-URL
frontier scale an exact set per shard is impossible; the north_rule
prescribes a bloom/cuckoo filter sharded by canonical-URL hash.  Each
SeenFilter shard (stages/seen.py) owns one filter + (optionally) an
exact audit set used by conformance tests at small scale.

Both filters are numpy-backed, deterministic, and snapshot/restore
EXACTLY (byte-identical state) — required for resumable checkpoints
with per-partition lineage.

Sizing: a 10^10-URL frontier over 256 seen-shards is ~4×10^7 URLs per
shard; at 10 bits/key a shard's bloom is ~50 MB — comfortably actor-
sized, which is exactly why the seen set is sharded by url-hash rather
than kept global.
"""
from __future__ import annotations

import hashlib

import numpy as np


def _h2(key: str) -> tuple[int, int]:
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


class BloomFilter:
    """Standard bloom with Kirsch-Mitzenmacher double hashing:
    h_i = h1 + i*h2 (mod m)."""

    def __init__(self, capacity: int, fp_rate: float = 1e-4):
        self.capacity = capacity
        self.fp_rate = fp_rate
        m = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2))
        self.m = max(64, m)
        self.k = max(1, int(round(self.m / capacity * np.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, key: str) -> np.ndarray:
        h1, h2 = _h2(key)
        i = np.arange(self.k, dtype=np.uint64)
        return (np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.m)

    def add(self, key: str) -> bool:
        """Insert; returns True if the key was (probably) new."""
        pos = self._positions(key)
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        mask = np.uint64(1) << bit
        present = bool(np.all((self.bits[word] & mask) != 0))
        if not present:
            # unbuffered scatter-OR: two hash positions can land in the
            # same 64-bit word, and `bits[word] |= mask` silently drops
            # one of the duplicate-index updates
            np.bitwise_or.at(self.bits, word, mask)
            self.count += 1
        return not present

    def __contains__(self, key: str) -> bool:
        pos = self._positions(key)
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        return bool(np.all((self.bits[word] & (np.uint64(1) << bit)) != 0))

    # -- exact snapshot / restore (checkpointing) ----------------------
    def snapshot(self) -> dict:
        return {
            "kind": "bloom",
            "capacity": self.capacity,
            "fp_rate": self.fp_rate,
            "count": self.count,
            "bits": self.bits.tobytes(),
        }

    @classmethod
    def restore(cls, snap: dict) -> "BloomFilter":
        bf = cls(snap["capacity"], snap["fp_rate"])
        bf.bits = np.frombuffer(snap["bits"], dtype=np.uint64).copy()
        bf.count = snap["count"]
        return bf


class CuckooFilter:
    """Cuckoo filter (Fan et al., CoNEXT'14): 4-slot buckets, 16-bit
    fingerprints, partial-key eviction.  Supports delete (blooms don't),
    which matters for frontier retraction/repair at scale."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 7):
        nb = 1
        while nb * self.SLOTS < capacity * 1.1:
            nb <<= 1
        self.n_buckets = nb
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)  # 0 = empty
        self.count = 0
        self._rng = np.random.RandomState(seed)

    def _fp_and_index(self, key: str) -> tuple[int, int]:
        h1, h2 = _h2(key)
        fp = (h2 & 0xFFFF) or 1
        return fp, h1 % self.n_buckets

    def _alt_index(self, i: int, fp: int) -> int:
        # index XOR hash(fingerprint)
        fh = int.from_bytes(hashlib.blake2b(fp.to_bytes(2, "little"), digest_size=8).digest(), "little")
        return (i ^ fh) % self.n_buckets

    def add(self, key: str) -> bool:
        """Insert; returns True if newly added, False if already present.
        Raises RuntimeError when full (caller resizes / splits shard)."""
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        if fp in self.table[i1] or fp in self.table[i2]:
            return False
        for i in (i1, i2):
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = fp
                self.count += 1
                return True
        # evict
        i = i1 if self._rng.rand() < 0.5 else i2
        cur = fp
        for _ in range(self.MAX_KICKS):
            slot = self._rng.randint(self.SLOTS)
            cur, self.table[i, slot] = int(self.table[i, slot]), cur
            i = self._alt_index(i, cur)
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = cur
                self.count += 1
                return True
        raise RuntimeError("cuckoo filter full — resize or split the shard")

    def __contains__(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        return fp in self.table[i1] or fp in self.table[i2]

    def delete(self, key: str) -> bool:
        fp, i1 = self._fp_and_index(key)
        for i in (i1, self._alt_index(i1, fp)):
            hit = np.where(self.table[i] == fp)[0]
            if len(hit):
                self.table[i, hit[0]] = 0
                self.count -= 1
                return True
        return False

    def snapshot(self) -> dict:
        return {
            "kind": "cuckoo",
            "n_buckets": self.n_buckets,
            "count": self.count,
            "table": self.table.tobytes(),
            "rng": self._rng.get_state(),
        }

    @classmethod
    def restore(cls, snap: dict) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.n_buckets = snap["n_buckets"]
        cf.table = np.frombuffer(snap["table"], dtype=np.uint16).reshape(cf.n_buckets, cls.SLOTS).copy()
        cf.count = snap["count"]
        cf._rng = np.random.RandomState()
        cf._rng.set_state(snap["rng"])
        return cf


def _hash_batch(keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    h1 = np.empty(len(keys), dtype=np.uint64)
    h2 = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        d = hashlib.blake2b(k.encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    return h1, h2


def bloom_contains_batch(bf: BloomFilter, keys: list[str]) -> np.ndarray:
    """Vectorized membership probe (no insertion) — the read-only
    base-layer path of a re-sharded restore (stages/seen.py)."""
    if not keys:
        return np.zeros(0, dtype=bool)
    h1, h2 = _hash_batch(keys)
    i = np.arange(bf.k, dtype=np.uint64)
    pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(bf.m)
    word, bit = pos >> np.uint64(6), pos & np.uint64(63)
    return ((bf.bits[word] & (np.uint64(1) << bit)) != 0).all(axis=1)


def bloom_add_batch(bf: BloomFilter, keys: list[str]) -> np.ndarray:
    """Vectorized test-and-set for a batch: one (n × k) position matrix,
    one gather for membership, one scatter-OR for insertion — ~40 µs/URL
    for the scalar path becomes ~1.5 µs/URL.  Intra-batch duplicates:
    only the first occurrence reports new (np.unique first-index)."""
    if not keys:
        return np.zeros(0, dtype=bool)
    uniq, first_idx, inverse = np.unique(np.asarray(keys, dtype=object), return_index=True, return_inverse=True)
    h1, h2 = _hash_batch(list(uniq))
    i = np.arange(bf.k, dtype=np.uint64)
    pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(bf.m)  # (u, k)
    word, bit = pos >> np.uint64(6), pos & np.uint64(63)
    mask = np.uint64(1) << bit
    present = ((bf.bits[word] & mask) != 0).all(axis=1)
    new_unique = ~present
    if new_unique.any():
        np.bitwise_or.at(bf.bits, word[new_unique].ravel(), mask[new_unique].ravel())
        bf.count += int(new_unique.sum())
    # map back: a key is "new" iff its unique row was new AND this is
    # the first occurrence in the batch
    out = np.zeros(len(keys), dtype=bool)
    out[first_idx[new_unique]] = True
    return out
