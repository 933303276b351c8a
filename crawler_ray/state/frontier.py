"""Frontier partitioning with hot-host salting (SURVEY.md §4, §7.4).

The frontier is hash-partitioned by host — politeness locality: all of
a host's URLs land in one partition, so its fetch pacing is local.  A
Zipf-hot host would then make one partition arbitrarily large (the
reference has no answer: hot sites just run longer, one queue per JVM);
the north_rule requires explicit skew handling: a host whose frontier
share exceeds ``hot_threshold`` rows is SALTED — split round-robin into
``host#0 … host#k`` sub-partitions that different workers drain in
parallel — while politeness stays keyed by the TRUE host (one
PolitenessClock bucket per host regardless of salt, stages/fetch.py),
so rate limits are never violated by the split.

``partition_frontier`` is used when checkpointing the frontier (one
parquet dir per partition → resumable, per-partition lineage) and when
handing waves to the fetch pool.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urlnorm import host_hash


def partition_frontier(
    frontier: pa.Table,
    n_partitions: int = 16,
    hot_threshold: int = 1024,
) -> pa.Table:
    """Append a ``partition`` column: ``host_hash % n_partitions``, with
    hot hosts salted across ceil(count/hot_threshold) sub-partitions
    (round-robin by row, so each sub-partition gets an even share)."""
    hosts = frontier.column("host").to_pylist()
    base = np.fromiter(
        (host_hash(h, n_partitions) for h in hosts), dtype=np.int64, count=len(hosts)
    )
    # per-host counts + per-row ordinal within host (vectorized-ish)
    from collections import Counter, defaultdict

    counts = Counter(hosts)
    ordinal: dict[str, int] = defaultdict(int)
    part = np.empty(len(hosts), dtype=np.int64)
    for i, h in enumerate(hosts):
        c = counts[h]
        if c > hot_threshold:
            n_salt = -(-c // hot_threshold)
            salt = ordinal[h] % n_salt
            ordinal[h] += 1
            # spread the salted sub-queues over distinct partitions
            part[i] = (host_hash(h, 1 << 62) + salt) % n_partitions
        else:
            part[i] = base[i]
    return frontier.append_column("partition", pa.array(part))


def partition_sizes(frontier: pa.Table) -> dict[int, int]:
    vc = pc.value_counts(frontier.column("partition").combine_chunks())
    return dict(
        zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
    )


def write_partitioned(frontier: pa.Table, out_dir: str) -> list[str]:
    """One parquet file per partition (resumable layout: finished
    partitions skippable on rerun)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for p in sorted(set(frontier.column("partition").to_pylist())):
        sub = frontier.filter(pc.equal(frontier.column("partition"), p))
        path = os.path.join(out_dir, f"partition={p:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(sub, tmp)
        os.replace(tmp, path)
        paths.append(path)
    return paths
