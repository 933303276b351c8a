"""Similarity search over an embedding column (list<float>).

  * ``brute_force_topk`` — the exactness baseline: query matrix
    broadcast once (``ray.put``), per-batch numpy matmul + local top-k
    prune, then one tiny global sort.
  * ``ivf_topk`` — the scale path: coarse quantizer (k-means-lite
    centroids trained on a driver-side sample), vectors bucketed by
    nearest centroid (ONE shuffle, reused across queries), queries
    probe only the ``nprobe`` nearest buckets.

Both return (query_id, vec_id, rank).  IVF recall vs brute force is
asserted in tests; at 100 TB the bucketed table is written partitioned
by centroid id so probes read only their buckets' files.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def list_col_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float> column → (n, dim) matrix WITHOUT the to_pylist
    Python-object explosion: one flat buffer copy + a reshape (rows are
    uniform-length by construction for embedding columns).  Falls back
    to the object path for ragged rows."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    offs = arr.offsets.to_numpy()
    w = offs[1] - offs[0]
    if not (np.diff(offs) == w).all():  # ragged — not an embedding col
        return np.array(arr.to_pylist(), dtype=dtype)
    vals = arr.values.to_numpy(zero_copy_only=False)
    return vals[offs[0] : offs[-1]].astype(dtype).reshape(n, w)


def brute_force_topk(ds, query_vecs: np.ndarray, k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Dataset + (q, d) query matrix → pandas (query_id, vec_id, rank)."""
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qref = ray.put(qn)

    class Score:
        def __init__(self):
            self.qn = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy()
            m = _normalize(list_col_to_matrix(t[vec_col]))
            cos = self.qn @ m.T  # (q, batch)
            out_q, out_id, out_cos = [], [], []
            kk = min(k, cos.shape[1])
            for qi in range(cos.shape[0]):
                top = np.argpartition(-cos[qi], kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(ids[top])
                out_cos.extend(cos[qi][top])
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "vec_id": pa.array(out_id, type=pa.int64()),
                    "cos": pa.array(out_cos, type=pa.float64()),
                }
            )

    local = ds.map_batches(Score, batch_format="pyarrow", concurrency=2).to_pandas()
    local = local.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    top = local.groupby("query_id").head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "vec_id", "rank", "cos"]].reset_index(drop=True)


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 0) -> np.ndarray:
    """k-means-lite (Lloyd, fixed iters, seeded) on a driver-side
    sample — the coarse quantizer."""
    rng = np.random.RandomState(seed)
    m = _normalize(np.asarray(sample, dtype=np.float64))
    cents = m[rng.choice(len(m), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(n_centroids):
            sel = m[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_bucket(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Add a ``bucket`` column = nearest centroid id (the one shuffle;
    write partitioned by bucket for reuse)."""
    import ray

    cref = ray.put(_normalize(centroids))

    class Assign:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(list_col_to_matrix(t[vec_col]))
            b = np.argmax(m @ self.c.T, axis=1)
            return t.append_column("bucket", pa.array(b.astype(np.int32)))

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=2)


def ivf_topk(bucketed_ds, centroids: np.ndarray, query_vecs: np.ndarray, k: int = 10, nprobe: int = 3, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Probe only the ``nprobe`` nearest buckets per query.

    Scale topology: per-bucket local top-k runs IN the bucket groups
    (groupby(bucket).map_groups — each group scores only the queries
    probing it), and the driver merges just q × nprobe × k candidate
    rows.  The probed vectors themselves never materialize centrally."""
    import pandas as pd
    import pyarrow.compute as pc_
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    cn = _normalize(centroids)
    probes = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]  # (q, nprobe)
    wanted = sorted({int(b) for row in probes for b in row})
    qref = ray.put((qn, probes))

    sub = bucketed_ds.map_batches(
        lambda t: t.filter(pc_.is_in(t["bucket"], value_set=pa.array(wanted, type=pa.int32()))),
        batch_format="pyarrow",
    )

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                              "vec_id": pd.Series([], dtype="int64"),
                              "cos": pd.Series([], dtype="float64")})
        if len(g) == 0 or "bucket" not in g.columns:
            return empty
        qn_l, probes_l = ray.get(qref)
        b = int(g["bucket"].iloc[0])
        qids = np.where((probes_l == b).any(axis=1))[0]
        if len(qids) == 0:
            return empty
        m = _normalize(np.array(g[vec_col].to_list(), dtype=np.float64))
        ids = g[id_col].to_numpy()
        cos = qn_l[qids] @ m.T  # (nq, n_bucket)
        kk = min(k, cos.shape[1])
        out_q, out_id, out_cos = [], [], []
        for row, qi in enumerate(qids):
            # deterministic tie-break matching the global merge rule:
            # cos desc, then vec_id asc (argpartition would pick an
            # arbitrary subset among ties)
            top = np.lexsort((ids, -cos[row]))[:kk]
            out_q.extend([int(qi)] * kk)
            out_id.extend(ids[top])
            out_cos.extend(cos[row][top])
        return pd.DataFrame(
            {"query_id": pd.array(out_q, dtype="int64"),
             "vec_id": pd.array(out_id, dtype="int64"),
             "cos": pd.array(out_cos, dtype="float64")}
        )

    local = sub.groupby("bucket").map_groups(local_topk, batch_format="pandas").to_pandas()
    local = local.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    top = local.groupby("query_id").head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "vec_id", "rank", "cos"]].reset_index(drop=True)
