"""Clustering (SURVEY.md §2.10).

  * ``cluster/cluster`` — single-linkage agglomerative to fixpoint over
    a pairwise predicate (cluster.clj:4-57: merge?, assign, loop)
  * ``cluster/cluster-n-iters`` — bounded-iteration variant
    (cluster.clj:59-87)
  * incremental assignment — first cluster with any similar member,
    else a new cluster (crawl.clj:1014-1050 leaf-cluster assignment)
  * ``utils/cluster-urls`` — clusters → url lists sorted by size
    (utils.clj:166-177)

Distributed shape: exact single-linkage is quadratic, so the scale path
buckets items first (LSH band / signature hash) and runs the exact
fixpoint only WITHIN buckets via ``groupby(bucket).map_groups`` —
``cluster_within_buckets`` below; cross-bucket merges then collapse via
union-find over bucket-local cluster reps (few).
"""
from __future__ import annotations

from typing import Callable, Sequence


def single_linkage(items: Sequence, similar: Callable) -> list[list]:
    """Exact fixpoint single-linkage (cluster.clj:4-57): start one
    cluster per item, repeatedly merge any two clusters containing a
    similar pair, until no merge applies."""
    clusters: list[list] = [[x] for x in items]
    changed = True
    while changed:
        changed = False
        for i in range(len(clusters)):
            for j in range(i + 1, len(clusters)):
                if any(similar(a, b) for a in clusters[i] for b in clusters[j]):
                    clusters[i] = clusters[i] + clusters[j]
                    del clusters[j]
                    changed = True
                    break
            if changed:
                break
    return clusters


def single_linkage_n_iters(items: Sequence, similar: Callable, n_iters: int) -> list[list]:
    """Bounded-iteration variant (cluster.clj:59-87): at most n merge
    sweeps."""
    clusters: list[list] = [[x] for x in items]
    for _ in range(n_iters):
        merged = False
        i = 0
        while i < len(clusters):
            j = i + 1
            while j < len(clusters):
                if any(similar(a, b) for a in clusters[i] for b in clusters[j]):
                    clusters[i] += clusters[j]
                    del clusters[j]
                    merged = True
                else:
                    j += 1
            i += 1
        if not merged:
            break
    return clusters


def incremental_assign(clusters: list[list], item, similar: Callable) -> list[list]:
    """crawl.clj:1014-1050: append to the FIRST cluster containing any
    similar member, else open a new cluster."""
    for c in clusters:
        if any(similar(item, m) for m in c):
            c.append(item)
            return clusters
    clusters.append([item])
    return clusters


def cluster_urls(clusters: list[list]) -> list[list]:
    """utils.clj:166-177: clusters sorted by size descending."""
    return sorted(clusters, key=len, reverse=True)


def cluster_within_buckets(ds, bucket_col: str, item_cols: list[str], similar: Callable):
    """Distributed single-linkage: exact fixpoint per bucket via
    groupby(bucket).map_groups; emits (bucket, cluster_id, *item_cols)
    rows.  Partitioning assumption: the bucketing function must place
    every truly-similar pair in at least one shared bucket (LSH-style
    recall guarantee) — cross-bucket merges are collapsed by the caller
    over cluster representatives when that doesn't hold exactly."""
    import pandas as pd

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        items = list(g[item_cols].itertuples(index=False, name=None))
        clusters = single_linkage(items, similar)
        rows = []
        for cid, c in enumerate(clusters):
            for item in c:
                rows.append((g[bucket_col].iloc[0], cid, *item))
        return pd.DataFrame(rows, columns=[bucket_col, "cluster_id", *item_cols])

    return ds.groupby(bucket_col).map_groups(per_bucket, batch_format="pandas")
