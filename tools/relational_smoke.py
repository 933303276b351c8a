"""10x relational scale smoke: replicate the sf0.1 tables with id
offsets (lineitem 6M rows, orders 1.5M, events 1M, documents 50k) into
/tmp and time the headline relational / time-series operators — the
"would this hold at 10x" evidence between fixture scale and cluster
scale.

Replication preserves every distribution (keys, skew, value ranges);
id columns are offset per copy so joins and first-wins stay meaningful
(each copy is its own key space — results are 10 disjoint copies of the
sf0.1 answer, which also makes correctness eyeballable: row counts
scale exactly 10x for per-key outputs).

Usage: python tools/relational_smoke.py [copies]
"""
from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/relational_smoke"

# id columns to offset per copy, per table (disjoint key spaces)
OFFSETS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": [],
    "region": [],
}


def replicate(copies: int):
    os.makedirs(DST, exist_ok=True)
    for table, id_cols in OFFSETS.items():
        src = os.path.join(SRC, f"{table}.parquet")
        t = pq.read_table(src)
        if not id_cols or copies == 1:
            parts = [t] * (copies if id_cols else 1)
        else:
            step = 10 ** 9  # far above any sf0.1 id
            parts = []
            for c in range(copies):
                tc = t
                for col in id_cols:
                    idx = tc.schema.get_field_index(col)
                    tc = tc.set_column(
                        idx, col, pc.add(tc[col], pa.scalar(c * step, type=tc[col].type))
                    )
                parts.append(tc)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(DST, f"{table}.parquet"))
        print(f"{table}: {t.num_rows} -> {out.num_rows}", flush=True)


def main():
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    replicate(copies)
    from crawler_ray import queries as q

    ops = [
        "pricing_summary",
        "corpus_self_join",
        "group_topk",
        "global_rank",
        "asof_join",
        "running_window",
        "session_coverage",
        "rolling_hour_sum",
        "event_transitions",
        "funnel_conversion",
        "pivot_events",
        "token_stats",
    ]
    results = {}
    for name in ops:
        t0 = time.time()
        res = q.REGISTRY[name].fn(DST)
        n = res.count() if hasattr(res, "count") and not isinstance(res, pa.Table) else len(res)
        dt = time.time() - t0
        results[name] = {"sec": round(dt, 2), "rows": int(n)}
        print(name, results[name], flush=True)
    print(json.dumps({"copies": copies, "ops": results}))
    ray.shutdown()


if __name__ == "__main__":
    main()
