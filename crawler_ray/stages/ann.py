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


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): the memory-bounded scale path.  A 64-dim
# float32 vector (256 B) compresses to m_sub uint8 codes (8 B at
# m_sub=8) — at 100 TB of embeddings the code table fits in cluster
# RAM when the raw vectors never could.  ADC (asymmetric distance
# computation) scans codes with per-query lookup tables; an optional
# refine step reranks the ADC shortlist with exact cosine.
# ---------------------------------------------------------------------------


def train_pq(sample: np.ndarray, m_sub: int = 8, k_sub: int = 16, iters: int = 10, seed: int = 0) -> np.ndarray:
    """Seeded Lloyd per contiguous subspace over a driver-side sample →
    codebooks (m_sub, k_sub, dsub).  Vectors are unit-normalized first
    so inner-product ADC ranks like cosine."""
    m = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = m.shape
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    dsub = d // m_sub
    rng = np.random.RandomState(seed)
    books = np.zeros((m_sub, k_sub, dsub), dtype=np.float64)
    for s in range(m_sub):
        sub = m[:, s * dsub : (s + 1) * dsub]
        cents = sub[rng.choice(n, size=min(k_sub, n), replace=False)].copy()
        if len(cents) < k_sub:  # degenerate tiny sample: pad by repeat
            cents = np.tile(cents, (int(np.ceil(k_sub / len(cents))), 1))[:k_sub]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k_sub):
                sel = sub[assign == c]
                if len(sel):
                    cents[c] = sel.mean(axis=0)
        books[s] = cents
    return books


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding"):
    """Append ``pq_code`` (list<uint8>, one code per subspace).  The
    codebooks are broadcast once (ray.put) and installed per actor; the
    original vector column is retained so a refine pass can rerank —
    at scale you'd write codes+ids hot and vectors cold."""
    import ray

    bref = ray.put(np.asarray(codebooks, dtype=np.float64))

    class Encode:
        def __init__(self):
            self.b = ray.get(bref)  # (m_sub, k_sub, dsub)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(list_col_to_matrix(t[vec_col]))
            m_sub, k_sub, dsub = self.b.shape
            codes = np.zeros((len(m), m_sub), dtype=np.uint8)
            for s in range(m_sub):
                sub = m[:, s * dsub : (s + 1) * dsub]
                # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2 ; argmin over c
                d2 = -2.0 * (sub @ self.b[s].T) + (self.b[s] ** 2).sum(axis=1)[None, :]
                codes[:, s] = np.argmin(d2, axis=1)
            return t.append_column(
                "pq_code", pa.array(list(codes), type=pa.list_(pa.uint8()))
            )

    return ds.map_batches(Encode, batch_format="pyarrow", concurrency=2)


def pq_topk(encoded_ds, codebooks: np.ndarray, query_vecs: np.ndarray, k: int = 10, refine: int = 0, vec_col: str = "embedding", id_col: str = "vec_id"):
    """ADC scan over PQ codes → (query_id, vec_id, rank[, cos]).

    Per batch each query's (m_sub, k_sub) inner-product table is
    gathered against the code matrix (pure numpy, no per-vector
    loop); a per-block top-R prune keeps driver traffic at
    O(q × R × blocks).  With ``refine`` > 0 the global ADC shortlist
    of R candidates per query is reranked with EXACT cosine from the
    retained vector column (IVFADC-refine), which restores
    brute-force-grade recall while still scanning only codes."""
    import pandas as pd
    import ray

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    books = np.asarray(codebooks, dtype=np.float64)
    m_sub, k_sub, dsub = books.shape
    r_keep = max(k, refine)
    # T[qi, s, j] = q_sub · codebook[s, j]
    tables = np.einsum("qsd,sjd->qsj", qn.reshape(len(qn), m_sub, dsub), books)
    tref = ray.put((tables, r_keep))

    class Scan:
        def __init__(self):
            self.t, self.r = ray.get(tref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy()
            codes = list_col_to_matrix(t["pq_code"], dtype=np.int64)
            out_q, out_id, out_s = [], [], []
            if len(ids):
                sub_idx = np.arange(m_sub)[None, :]
                for qi in range(self.t.shape[0]):
                    score = self.t[qi][sub_idx, codes].sum(axis=1)
                    rr = min(self.r, len(ids))
                    top = np.lexsort((ids, -score))[:rr]
                    out_q.extend([qi] * rr)
                    out_id.extend(ids[top])
                    out_s.extend(score[top])
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "vec_id": pa.array(out_id, type=pa.int64()),
                    "adc": pa.array(out_s, type=pa.float64()),
                }
            )

    cand = encoded_ds.map_batches(Scan, batch_format="pyarrow", concurrency=2).to_pandas()
    cand = cand.sort_values(["query_id", "adc", "vec_id"], ascending=[True, False, True])
    short = cand.groupby("query_id").head(r_keep)

    if not refine:
        top = short.groupby("query_id").head(k).copy()
        top["rank"] = top.groupby("query_id").cumcount() + 1
        return top[["query_id", "vec_id", "rank"]].reset_index(drop=True)

    # exact rerank of the shortlist: fetch ONLY shortlist vectors
    import pyarrow.compute as pc_

    want = pa.array(sorted(short["vec_id"].unique()), type=pa.int64())
    sub = encoded_ds.map_batches(
        lambda t: t.filter(pc_.is_in(t[id_col], value_set=want)),
        batch_format="pyarrow",
    ).to_pandas()
    vecs = _normalize(np.array(sub[vec_col].to_list(), dtype=np.float64))
    pos = {int(v): i for i, v in enumerate(sub[id_col].to_numpy())}
    rows = []
    for qi, grp in short.groupby("query_id"):
        idx = np.array([pos[int(v)] for v in grp["vec_id"]], dtype=np.int64)
        cos = vecs[idx] @ qn[int(qi)]
        # deterministic: cos desc then vec_id asc
        ids_g = grp["vec_id"].to_numpy()
        top = np.lexsort((ids_g, -cos))[:k]
        for rank, j in enumerate(top, 1):
            rows.append((int(qi), int(ids_g[j]), rank, float(cos[j])))
    out = pd.DataFrame(rows, columns=["query_id", "vec_id", "rank", "cos"])
    return out.reset_index(drop=True)


def ivfpq_topk(enc_bucketed_ds, centroids: np.ndarray, codebooks: np.ndarray, query_vecs: np.ndarray, k: int = 10, nprobe: int = 4, refine: int = 100, vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF + PQ composed (the FAISS IVFADC layout — the 100 TB answer):
    vectors live bucketed by coarse centroid AND PQ-encoded, so a query
    reads only its ``nprobe`` buckets' *code* files (bucket pruning ×
    16x compression), ADC-scans them, and reranks the shortlist with
    exact cosine.  Compose the input as
    ``pq_encode(ivf_bucket(ds, centroids), codebooks)``; at scale,
    write it partitioned by bucket once and reuse across query sets."""
    import pyarrow.compute as pc_

    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    cn = _normalize(centroids)
    probes = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]
    wanted = sorted({int(b) for row in probes for b in row})

    sub = enc_bucketed_ds.map_batches(
        lambda t: t.filter(
            pc_.is_in(t["bucket"], value_set=pa.array(wanted, type=pa.int32()))
        ),
        batch_format="pyarrow",
    )
    return pq_topk(sub, codebooks, qn, k=k, refine=refine, vec_col=vec_col, id_col=id_col)
