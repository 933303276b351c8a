"""Above-fixture-scale smoke for the corpus-hygiene operators.

Synthesizes a deterministic 100k-doc corpus (~12M tokens, with planted
cross-doc duplicate segments and repetition-pathological docs) in /tmp,
runs the round-3 hygiene operators over it, and reports wall time plus
driver-RSS deltas — the evidence that these stages stream (per-batch
kernels + combiner shuffles) rather than concentrate.

Usage: python tools/hygiene_smoke.py [n_docs]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def synth_corpus(n_docs: int, out_dir: str) -> str:
    rng = np.random.default_rng(12345)
    vocab = np.array([f"w{i}" for i in range(50_000)], dtype=object)
    boiler = " ".join(f"b{i}" for i in range(10))  # a shared 10-token segment
    texts = []
    langs = []
    for i in range(n_docs):
        toks = vocab[rng.integers(0, len(vocab), size=120)]
        body = " ".join(toks.tolist())
        if i % 7 == 0:  # plant the duplicate segment at a segment boundary
            body = boiler + " " + body
        if i % 997 == 0:  # repetition-pathological doc
            body = "spam ham " * 60
        texts.append(body.strip())
        langs.append(["en", "fr", "de", "es", "pt"][i % 5])
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(["smoke"] * n_docs, type=pa.string()),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))
    return out_dir


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf = synth_corpus(n_docs, "/tmp/hygiene_smoke")
    from crawler_ray import queries as q

    results = {}
    for name in (
        "segment_dedup",
        "tfidf_top_terms",
        "repetition_stats",
        "chunk_documents",
        "text_normalize",
        "pii_scrub",
        "mixture_resample",
        "typo_pairs",
        "distinct_kmv",
        "token_rarity_buckets",
        "host_quality_filter",
        "dsir_resample",
        "temperature_resample",
        "bm25_topk",
        "cms_registers",
        "overlap_stitch",
        "source_overlap_matrix",
        "kwic_contexts",
    ):
        r0 = _rss_mb()
        t0 = time.time()
        res = q.REGISTRY[name].fn(sf)
        if hasattr(res, "count") and not hasattr(res, "to_pandas"):
            n = res.count()
        else:
            # consume WITHOUT driver materialization where possible:
            # count() executes the streamed pipeline
            n = res.count() if hasattr(res, "count") else len(res)
        dt = time.time() - t0
        results[name] = {
            "sec": round(dt, 2),
            "rows": int(n),
            "docs_per_sec": int(n_docs / dt),
            "driver_rss_delta_mb": round(_rss_mb() - r0, 1),
        }
        print(name, results[name], flush=True)
    import json

    print(json.dumps({"n_docs": n_docs, "ops": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
