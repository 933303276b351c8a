"""Batch dedup sweeps + ANN: self-verification against brute force."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_lsh_sweep_matches_bruteforce(ray_session):
    import ray.data as rd

    from crawler_ray.stages.dedup import (
        connected_components,
        grams4_raw,
        lsh_neardup_pairs,
        verify_jaccard_pairs,
    )

    texts = [
        "a b c d e f g h i j k l",
        "a b c d e f g h i j k l",          # exact dup of 0
        "a b c d e f g h i j k CHANGED",    # near dup of 0
        "z y x w v u t s r q p o",
    ]
    tbl = pa.table({"doc_id": pa.array(range(4), type=pa.int64()), "text": texts})
    ds = rd.from_arrow(tbl)
    pairs = lsh_neardup_pairs(ds, threshold=0.8)
    grams = {i: grams4_raw(t) for i, t in enumerate(texts)}
    verified = verify_jaccard_pairs(pairs, grams, threshold=0.8)
    got = set(zip(verified["doc_a"], verified["doc_b"]))
    # brute force
    want = set()
    for i in range(4):
        for j in range(i + 1, 4):
            gi, gj = grams[i], grams[j]
            inter = len(gi & gj)
            if inter / (len(gi) + len(gj) - inter) >= 0.8:
                want.add((i, j))
    assert got == want and (0, 1) in got and (0, 2) in got
    comp = connected_components(verified)
    assert comp[1] == 0 and comp[2] == 0


def test_simhash_sweep_matches_bruteforce(ray_session):
    import ray.data as rd

    from crawler_ray.functions import shingles
    from crawler_ray.stages.dedup import simhash_neardup_pairs

    base = " ".join(f"tok{i}" for i in range(150))
    t2 = base.replace("tok40", "changed")
    far = " ".join(f"other{i}" for i in range(150))
    texts = [base, base, t2, far]
    tbl = pa.table({"doc_id": pa.array(range(4), type=pa.int64()), "text": texts})
    got = simhash_neardup_pairs(rd.from_arrow(tbl), max_hamming=6)
    gotset = set(zip(got["doc_a"], got["doc_b"]))
    want = set()
    hs = [shingles.simhash64(t, 2) for t in texts]
    for i in range(4):
        for j in range(i + 1, 4):
            if shingles.hamming64(hs[i], hs[j]) <= 6:
                want.add((i, j))
    assert gotset == want and (0, 1) in gotset


def test_ivf_matches_bruteforce(ray_session):
    import ray.data as rd

    from crawler_ray.stages.ann import (
        brute_force_topk,
        ivf_bucket,
        ivf_topk,
        train_centroids,
    )

    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    queries = mat[:3]
    ds = rd.from_arrow(emb)
    bf = brute_force_topk(ds, queries, k=10)
    cents = train_centroids(mat, n_centroids=8, seed=0)
    ivf = ivf_topk(ivf_bucket(ds, cents), cents, queries, k=10, nprobe=8)
    # with nprobe = all buckets, IVF must equal brute force exactly
    for qi in range(3):
        b = bf[bf["query_id"] == qi]["vec_id"].tolist()
        v = ivf[ivf["query_id"] == qi]["vec_id"].tolist()
        assert b == v, (qi, b, v)
    # with nprobe=4, recall@10 should be high
    ivf4 = ivf_topk(ivf_bucket(ds, cents), cents, queries, k=10, nprobe=4)
    rec = np.mean(
        [
            len(
                set(bf[bf["query_id"] == qi]["vec_id"])
                & set(ivf4[ivf4["query_id"] == qi]["vec_id"])
            )
            / 10
            for qi in range(3)
        ]
    )
    assert rec >= 0.6


def test_verify_pairs_join_path_equals_small_path(ray_session):
    """verify_pairs_joined: the distributed hash-join path (forced via
    small_limit=0) returns exactly the bounded small-side path's pairs."""
    import ray.data as rd

    from crawler_ray.stages.dedup import (
        doc_grams_table,
        lsh_neardup_pairs,
        verify_pairs_joined,
    )

    texts = [
        "a b c d e f g h i j k l",
        "a b c d e f g h i j k l",
        "a b c d e f g h i j k CHANGED",
        "z y x w v u t s r q p o",
        "a b c d e f g h i j k l m",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    ds = rd.from_arrow(tbl).materialize()
    pairs = lsh_neardup_pairs(ds, threshold=0.8)
    grams = doc_grams_table(ds)

    def norm(res):
        df = res.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        return df

    small = norm(verify_pairs_joined(pairs, grams, threshold=0.8))
    joined = norm(verify_pairs_joined(pairs, grams, threshold=0.8, small_limit=0))
    assert len(small) > 0
    assert small.equals(joined)


def test_prepare_training_data_pipeline(ray_session, tmp_path):
    """End-to-end data prep: quality filter, exact dedup first-wins,
    near-dup drop (larger id), stats, partitioned export + idempotent
    rerun."""
    import os

    import ray.data as rd

    from crawler_ray.pipelines.dataprep import prepare_training_data

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",   # 0 keep
        "the quick brown fox jumps over the lazy dog again and again",   # 1 exact dup of 0
        "the quick brown fox jumps over the lazy dog again and AGAIN2",  # 2 near dup of 0
        "tiny",                                                          # 3 quality-dropped (<5 toks)
        "completely different words forming another document here now",  # 4 keep
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts})
    out = str(tmp_path / "kept")
    kept, drop_ids, stats = prepare_training_data(
        rd.from_arrow(tbl), neardup_threshold=0.8, out_dir=out
    )
    kept_ids = sorted(kept.to_pandas()["doc_id"])
    assert kept_ids == [0, 4]
    assert list(drop_ids) == [2]
    assert stats["n_kept"] == 2 and stats["n_neardup_dropped"] == 1
    before = sorted(os.listdir(out))
    assert any(f.endswith(".parquet") for f in before)
    # idempotent rerun: same params + marker → identical file listing
    prepare_training_data(rd.from_arrow(tbl), neardup_threshold=0.8, out_dir=out)
    assert sorted(os.listdir(out)) == before
    got = pq.read_table(out)
    assert sorted(got["doc_id"].to_pylist()) == [0, 4]
    # changed params invalidate the marker → output rewritten to match
    prepare_training_data(
        rd.from_arrow(tbl), min_tokens=11, neardup_threshold=0.8, out_dir=out
    )
    got2 = pq.read_table(out)
    assert sorted(got2["doc_id"].to_pylist()) == [0]  # doc 4 has 8 tokens


def test_cc_label_propagation_matches_union_find(ray_session):
    """Distributed sharded min-label CC == driver union-find on random
    graphs spanning singleton pairs, chains (worst-case diameter),
    stars, and dense blobs."""
    import ray.data as rd

    from crawler_ray.stages.cc import cc_label_propagation
    from crawler_ray.stages.dedup import connected_components

    rng = np.random.default_rng(99)
    edges = []
    # chains: long diameter exercises multi-round convergence
    base = 10_000
    for c in range(5):
        ids = base + c * 100 + np.arange(40)
        edges += [(int(ids[i]), int(ids[i + 1])) for i in range(len(ids) - 1)]
    # stars
    for s in range(5):
        hub = 20_000 + s * 100
        edges += [(hub, hub + i) for i in range(1, 15)]
    # random blobs
    for b in range(10):
        ids = 30_000 + b * 50 + rng.integers(0, 30, size=40)
        edges += [
            (int(ids[i]), int(ids[j]))
            for i, j in rng.integers(0, len(ids), size=(25, 2))
            if ids[i] != ids[j]
        ]
    # isolated pairs
    edges += [(40_000 + 2 * i, 40_001 + 2 * i) for i in range(20)]

    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    pairs_ds = rd.from_arrow(
        pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})
    ).repartition(7)

    got = (
        cc_label_propagation(pairs_ds, n_shards=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # driver oracle: union-find over the same pairs
    want_map = connected_components({"doc_a": a.tolist(), "doc_b": b.tolist()})
    # normalize: component rep = min id per component on both sides
    import collections

    groups = collections.defaultdict(list)
    for n, r in want_map.items():
        groups[r].append(n)
    want = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            want[n] = m
    assert len(got) == len(want)
    got_map = dict(zip(got["doc_id"], got["component"]))
    assert got_map == want


def test_pq_recall_compression_determinism(ray_session):
    """PQ contract: (a) refined recall@10 vs brute force >= 0.9,
    (b) ADC-only recall well above chance, (c) codes are m_sub uint8
    per vector (16x compression vs float32), (d) byte-exact
    determinism across two independent train+encode+search runs."""
    import ray.data as rd

    from crawler_ray.stages.ann import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        train_pq,
    )

    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    queries = mat[:3]
    n, dim = mat.shape
    ds = rd.from_arrow(emb)
    bf = brute_force_topk(ds, queries, k=10)

    books = train_pq(mat[:256], m_sub=16, k_sub=32, seed=0)
    assert books.shape == (16, 32, dim // 16)
    enc = pq_encode(ds, books)

    # (c) compression: one uint8 code per subspace
    codes = enc.take(5)
    for r in codes:
        assert len(r["pq_code"]) == 16
        assert all(0 <= c < 32 for c in r["pq_code"])

    ref = pq_topk(enc, books, queries, k=10, refine=100)
    adc = pq_topk(enc, books, queries, k=10, refine=0)

    def recall(approx):
        return np.mean(
            [
                len(
                    set(bf[bf["query_id"] == qi]["vec_id"])
                    & set(approx[approx["query_id"] == qi]["vec_id"])
                )
                / 10
                for qi in range(3)
            ]
        )

    assert recall(ref) >= 0.9
    assert recall(adc) >= 0.3
    # rank-1 self-hit: each query IS a corpus vector
    for qi in range(3):
        top1 = ref[(ref["query_id"] == qi) & (ref["rank"] == 1)]["vec_id"].iloc[0]
        assert top1 == emb["vec_id"][qi].as_py()

    # (d) determinism end-to-end
    books2 = train_pq(mat[:256], m_sub=16, k_sub=32, seed=0)
    assert (books == books2).all()
    ref2 = pq_topk(pq_encode(ds, books2), books2, queries, k=10, refine=100)
    assert ref[["query_id", "vec_id", "rank"]].equals(
        ref2[["query_id", "vec_id", "rank"]]
    )


def test_ivfpq_composed_recall(ray_session):
    """IVFADC composition: bucket pruning x PQ codes, refined rerank.
    nprobe=all must equal the PQ-only result exactly; nprobe=4 keeps
    recall@10 >= 0.8 vs brute force."""
    import ray.data as rd

    from crawler_ray.stages.ann import (
        brute_force_topk,
        ivf_bucket,
        ivfpq_topk,
        pq_encode,
        pq_topk,
        train_centroids,
        train_pq,
    )

    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    queries = mat[:3]
    ds = rd.from_arrow(emb)
    bf = brute_force_topk(ds, queries, k=10)

    cents = train_centroids(mat, n_centroids=8, seed=0)
    books = train_pq(mat[:256], m_sub=16, k_sub=32, seed=0)
    enc = pq_encode(ivf_bucket(ds, cents), books)

    full = ivfpq_topk(enc, cents, books, queries, k=10, nprobe=8, refine=100)
    pq_only = pq_topk(enc, books, queries, k=10, refine=100)
    assert full[["query_id", "vec_id", "rank"]].equals(
        pq_only[["query_id", "vec_id", "rank"]]
    )

    pruned = ivfpq_topk(enc, cents, books, queries, k=10, nprobe=4, refine=100)
    rec = np.mean(
        [
            len(
                set(bf[bf["query_id"] == qi]["vec_id"])
                & set(pruned[pruned["query_id"] == qi]["vec_id"])
            )
            / 10
            for qi in range(3)
        ]
    )
    assert rec >= 0.8, rec
