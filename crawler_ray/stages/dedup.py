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

    def process(self, entries: list[tuple[str, list[str], list[int]]]) -> list[bool]:
        """entries: [(url, shingle_list, band_keys)] in crawl order →
        near_dup flag per entry."""
        out = []
        for url, grams_list, keys in entries:
            grams = frozenset(grams_list)
            cand: dict[str, frozenset] = {}
            for k in keys:
                for u2, g2 in self.index.get(k, []):
                    cand[u2] = g2
            dup = any(
                shingles.jaccard(grams, g2) >= self.threshold for g2 in cand.values()
            )
            out.append(dup)
            for k in keys:
                self.index.setdefault(k, []).append((url, grams))
        return out

    def snapshot(self) -> dict:
        return {
            "threshold": self.threshold,
            "bands": self.bands,
            "index": {k: [(u, sorted(g)) for u, g in v] for k, v in self.index.items()},
        }

    def restore(self, snap: dict) -> None:
        self.threshold = snap["threshold"]
        self.bands = snap["bands"]
        self.index = {
            int(k): [(u, frozenset(g)) for u, g in v] for k, v in snap["index"].items()
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
