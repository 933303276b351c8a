"""Local replica of the driver's queries-vs-DuckDB correctness gate.

Runs every REGISTRY entry at the given sf dir, runs its oracle SQL in
DuckDB over the same parquet views, and compares: row count, column
names, and order-insensitive values (rows sorted by all columns after
sorting columns by name).  Usage:

    python tools/check_queries.py [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    # The driver's value-hash is dtype-sensitive (r1: 5 queries matched
    # value-exact but hashed red because DuckDB returned HUGEINT->float64
    # where Ray returned int64).  Mirror that: require kind-identical dtypes.
    for c in sorted(a.columns):
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb:
            return f"col {c} dtype kind {a[c].dtype} vs {b[c].dtype}"
    ca, cb = canon(a), canon(b)
    for c in ca.columns:
        va, vb = ca[c].to_numpy(), cb[c].to_numpy()
        if va.dtype.kind == "f":
            if not np.array_equal(va, vb) and not np.allclose(va, vb, rtol=0, atol=0, equal_nan=True):
                mism = np.where(va != vb)[0][:3]
                return f"col {c} float mismatch at {mism}: {va[mism]} vs {vb[mism]}"
        else:
            if not (va == vb).all():
                mism = np.where(va != vb)[0][:3]
                return f"col {c} mismatch at {mism}: {va[mism]} vs {vb[mism]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from crawler_ray.queries import REGISTRY

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rowsonly = 0
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(qd.fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if qd.sql is None:
            print(f"ROWS-ONLY {name}: {len(got)} rows  [{dt:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            want = con.sql(qd.sql).df()
        except Exception as e:
            print(f"FAIL {name}: sql error {e}")
            n_fail += 1
            continue
        err = compare(got, want)
        if err:
            print(f"FAIL {name}: {err}  [{dt:.1f}s]")
            print("  ray:\n", got.head(5).to_string())
            print("  sql:\n", want.head(5).to_string())
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows  [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
