"""Embedding-operator scale smoke: 200k x 32-d vectors (100x the sf0.1
embeddings fixture) through the ANN / k-means / semantic-dedup path —
evidence the broadcast-assign + per-bucket top-k shapes hold when the
vector table stops being toy-sized.

Synthetic mixture: 64 Gaussian clusters (so IVF bucketing and k-means
have real structure) + planted near-duplicates (every 50th vector is a
jittered copy of its predecessor).

Usage: python tools/embedding_smoke.py [n_vecs]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth(n: int, d: int, out_dir: str) -> str:
    rng = np.random.default_rng(777)
    centers = rng.normal(size=(64, d)) * 4.0
    labels = rng.integers(0, 64, size=n)
    m = centers[labels] + rng.normal(size=(n, d))
    dup = np.arange(n) % 50 == 0
    src = np.maximum(np.arange(n) - 1, 0)
    m[dup] = m[src[dup]] + rng.normal(size=(int(dup.sum()), d)) * 0.01
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [row for row in m.astype(np.float32)], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), type=pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(t, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf = synth(n, 32, "/tmp/embedding_smoke")
    from crawler_ray import queries as q

    results = {}
    for name in ("ann_cosine_topk", "ann_ivf_topk", "kmeans_clusters", "semantic_dedup"):
        t0 = time.time()
        res = q.REGISTRY[name].fn(sf)
        import ray.data

        rows = res.count() if isinstance(res, ray.data.Dataset) else len(res)
        dt = time.time() - t0
        results[name] = {"sec": round(dt, 2), "rows": int(rows), "vecs_per_sec": int(n / dt)}
        print(name, results[name], flush=True)
    print(json.dumps({"n_vecs": n, "ops": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
