"""Verify-skill step-1 drive: entry() + oracle spot-checks for the
named queries at sf0.001 (run from /root/repo)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as e

r = e.entry()
n = r.count() if not hasattr(r, "shape") else len(r)
print("entry rows:", n)
assert n > 0
qs, sql = e.queries(), e.oracle_sql()
import duckdb

con = duckdb.connect()
SF = "/root/testdata/sf0.001"
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
for name in sys.argv[1:]:
    got = qs[name](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    if name not in sql:
        print(name, "rows", len(got), "(rows-only)")
        continue
    want = con.sql(sql[name]).df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    ok = len(g) == len(w) and all(
        (g[c].to_numpy() == w[c].to_numpy()).all() for c in cols
    )
    print(name, "rows", len(g), "MATCH" if ok else "MISMATCH")
    assert ok, name
ray.shutdown()
print("VERIFY DRIVE OK")
