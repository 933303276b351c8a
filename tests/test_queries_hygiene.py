"""Semantic property tests for the corpus-hygiene operators (the
DuckDB-oracle equivalence is covered by test_queries.py + the driver
sweep; these pin the *behavioral* contracts on adversarial corpora)."""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _write_docs(tmp_path, texts, langs=None):
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs or ["en"] * n, type=pa.string()),
            "source": pa.array(["s"] * n, type=pa.string()),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_segment_dedup_exact_copy_loses_everything(ray_session, tmp_path):
    base = " ".join(f"w{i}" for i in range(30))  # 3 full segments
    other = " ".join(f"x{i}" for i in range(25))  # unique doc
    sf = _write_docs(tmp_path, [base, other, base])
    from crawler_ray.queries import segment_dedup

    out = segment_dedup(sf).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_removed"] == 0 and out.loc[0, "new_text"] == base
    assert out.loc[1, "n_removed"] == 0 and out.loc[1, "new_text"] == other
    # doc 2 is a byte-copy of doc 0: every segment is a loser
    assert out.loc[2, "n_removed"] == out.loc[2, "n_segs"] == 3
    assert out.loc[2, "new_text"] == ""


def test_segment_dedup_partial_overlap_keeps_order(ray_session, tmp_path):
    seg_a = " ".join(f"a{i}" for i in range(10))
    seg_b = " ".join(f"b{i}" for i in range(10))
    seg_c = " ".join(f"c{i}" for i in range(10))
    sf = _write_docs(tmp_path, [f"{seg_a} {seg_b}", f"{seg_b} {seg_c}"])
    from crawler_ray.queries import segment_dedup

    out = segment_dedup(sf).to_pandas().set_index("doc_id")
    # doc 1 loses its first segment (seg_b, owned by doc 0) but keeps
    # seg_c, re-joined without a dangling separator
    assert out.loc[1, "n_removed"] == 1
    assert out.loc[1, "new_text"] == seg_c


def test_repetition_stats_flags_pathological_docs(ray_session, tmp_path):
    loop = "spam ham " * 20  # one bigram dominates, few distinct tokens
    clean = " ".join(f"tok{i}" for i in range(40))
    sf = _write_docs(tmp_path, [loop.strip(), clean], langs=["en", "en"])
    from crawler_ray.queries import repetition_stats

    out = repetition_stats(sf).to_pandas()
    row = out[out["lang"] == "en"].iloc[0]
    assert row["n_docs"] == 2
    assert row["flag_bigram"] == 1  # only the loop doc
    assert row["flag_unique"] == 1


def test_mixture_resample_keeps_all_of_min_language(ray_session, tmp_path):
    texts = [f"doc {i}" for i in range(40)]
    langs = ["en"] * 30 + ["fr"] * 10
    sf = _write_docs(tmp_path, texts, langs=langs)
    from crawler_ray.queries import mixture_resample

    out = mixture_resample(sf).to_pandas()
    # the minority language keeps every row (rate == 1); the majority
    # is hash-thinned toward min_count in expectation
    assert (out["lang"] == "fr").sum() == 10
    assert (out["lang"] == "en").sum() < 30


def test_pii_scrub_counts_and_redacts(ray_session, tmp_path):
    # doc_id 0 hits both the %3 (email+phone) and %5 (ip) augmentations
    sf = _write_docs(tmp_path, ["plain text here", "more text"], langs=["en", "fr"])
    from crawler_ray.queries import pii_scrub

    out = pii_scrub(sf).to_pandas().set_index("lang")
    assert out.loc["en", "n_emails"] == 1
    assert out.loc["en", "n_phones"] == 1
    assert out.loc["en", "n_ips"] == 1
    assert out.loc["fr", "n_emails"] == 0
    # redaction shrank the augmented text (emails are longer than <EMAIL>)
    aug_len = len("plain text here contact u0@ex.com or +1-555-0000 ip 10.0.0.1")
    assert out.loc["en", "redacted_chars"] < aug_len


def test_tfidf_rare_term_outranks_common(ray_session, tmp_path):
    # 'rare' appears in one doc only; 'common' in all — the doc holding
    # 'rare' must rank it first even at equal tf
    texts = ["common rare", "common alpha", "common beta"]
    sf = _write_docs(tmp_path, texts)
    from crawler_ray.queries import tfidf_top_terms

    out = tfidf_top_terms(sf).to_pandas()
    top0 = out[(out["doc_id"] == 0) & (out["rk"] == 1)].iloc[0]
    assert top0["term"] == "rare" and top0["df"] == 1


def test_group_topk_matches_pandas(ray_session):
    import pandas as pd

    from crawler_ray.queries import group_topk

    sf = "/root/testdata/sf0.001"
    got = (
        group_topk(sf)
        .to_pandas()
        .sort_values(["o_custkey", "rk"])
        .reset_index(drop=True)
    )
    orders = pq.read_table(
        os.path.join(sf, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    ).to_pandas()
    orders = orders.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
    )
    want = orders.groupby("o_custkey", as_index=False).head(3)
    want = want.assign(rk=want.groupby("o_custkey").cumcount() + 1).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        got[["o_custkey", "o_orderkey", "o_totalprice", "rk"]].astype(
            {"rk": "int64"}
        ),
        want[["o_custkey", "o_orderkey", "o_totalprice", "rk"]].astype(
            {"rk": "int64"}
        ),
    )


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts_us, user_id, event_type, value)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_asof_join_semantics(ray_session, tmp_path):
    # user 1: click@10 — purchase@10 matches exactly (gap 0),
    # purchase@5 precedes every click (-1), purchase@30 picks the
    # LATEST prior click (20, not 10); user 2 never clicks (-1)
    rows = [
        (0, 10, 1, "click", 0.0),
        (1, 10, 1, "purchase", 1.0),
        (2, 5, 1, "purchase", 1.0),
        (3, 20, 1, "click", 0.0),
        (4, 30, 1, "purchase", 1.0),
        (5, 30, 2, "purchase", 1.0),
        (6, 40, 2, "click", 0.0),  # click AFTER the purchase: ignored
    ]
    sf = _write_events(tmp_path, rows)
    from crawler_ray.queries import asof_join

    out = asof_join(sf).to_pandas().set_index("event_id").sort_index()
    assert out.loc[1, "gap_us"] == 0 and out.loc[1, "matched"] == 1
    assert out.loc[2, "gap_us"] == -1 and out.loc[2, "matched"] == 0
    assert out.loc[4, "gap_us"] == 10
    assert out.loc[5, "gap_us"] == -1
    assert len(out) == 4  # one row per purchase, none for clicks


def test_running_window_cross_batch_order(ray_session, tmp_path):
    # rows arrive shuffled; the running sum must follow (ts, event_id)
    # order per user, with exact-cents accumulation (0.005 floors up)
    rows = [
        (3, 40, 1, "view", 1.0),
        (1, 20, 1, "view", 0.105),  # cents: floor(10.5+0.5)=11
        (2, 30, 2, "view", 2.0),
        (0, 10, 1, "view", 0.2),
        (4, 30, 2, "view", 3.0),  # same user+ts as event 2: id breaks tie
    ]
    sf = _write_events(tmp_path, rows)
    from crawler_ray.queries import running_window

    out = running_window(sf).to_pandas().set_index("event_id").sort_index()
    assert out.loc[0, "run_value"] == 0.2 and out.loc[0, "rn"] == 1
    assert out.loc[1, "run_value"] == (20 + 11) / 100.0 and out.loc[1, "rn"] == 2
    assert out.loc[3, "run_value"] == (20 + 11 + 100) / 100.0 and out.loc[3, "rn"] == 3
    assert out.loc[2, "rn"] == 1 and out.loc[4, "rn"] == 2
    assert out.loc[4, "run_value"] == 5.0


def test_semantic_dedup_first_wins(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    m = rng.normal(size=(40, 16)).astype(np.float32)
    m[25] = m[3]          # exact copy of an earlier vector
    m[30] = m[3] * 2.0    # same direction (cos == 1), different norm
    t = pa.table(
        {
            "vec_id": pa.array(range(40), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * 40, type=pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "embeddings.parquet"))
    from crawler_ray.queries import semantic_dedup

    out = semantic_dedup(str(tmp_path)).to_pandas().set_index("vec_id")
    assert out.loc[3, "is_dup"] == 0          # first occurrence survives
    assert out.loc[25, "is_dup"] == 1         # byte-copy dropped
    assert out.loc[30, "is_dup"] == 1         # scaled copy dropped too
    # copies land in the first occurrence's cluster (same direction)
    assert out.loc[25, "bucket"] == out.loc[3, "bucket"]
    assert len(out) == 40


def test_tfidf_join_regime_matches_broadcast(ray_session):
    """Force the past-the-vocab-cap join regime (df as a Dataset +
    term-keyed hash join) and assert row equality with the broadcast
    path over the real fixture."""
    import pandas as pd

    from crawler_ray.queries import tfidf_top_terms

    sf = "/root/testdata/sf0.001"

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(["doc_id", "rk"]).reset_index(drop=True)[
            ["doc_id", "term", "tf", "df", "rk"]
        ]

    a = norm(tfidf_top_terms(sf))
    b = norm(tfidf_top_terms(sf, vocab_broadcast_cap=0))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_partitioned_export_resume_layout(ray_session, tmp_path):
    """The export must land one hive-style dir per partition key (the
    resume skip-unit) and the read-back stats must match the source."""
    texts = ["a b", "c d", "e f", "g h"]
    src = tmp_path / "src"
    os.makedirs(str(src), exist_ok=True)
    sf = _write_docs(src, texts, langs=["en", "fr", "en", "de"])
    out = str(tmp_path / "exp")
    os.makedirs(out, exist_ok=True)
    from crawler_ray.queries import partitioned_export

    res = partitioned_export(sf, out_dir=out).to_pandas().set_index("lang")
    assert sorted(os.listdir(out)) == ["lang=de", "lang=en", "lang=fr"]
    assert res.loc["en", "n_docs"] == 2 and res.loc["de", "n_docs"] == 1
    # files are per-partition (never one giant file)
    for d in os.listdir(out):
        assert any(f.endswith(".parquet") for f in os.listdir(os.path.join(out, d)))


def test_asof_and_running_window_fuzz_vs_bruteforce(ray_session, tmp_path):
    """Seeded random event streams (duplicate timestamps, clickless
    users, purchase-first users) vs pure-Python brute force."""
    rng = np.random.default_rng(99)
    n = 400
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                int(rng.integers(0, 50)) * 1000,  # coarse ts: forces ties
                int(rng.integers(0, 12)),
                ["click", "purchase", "view"][int(rng.integers(0, 3))],
                float(rng.integers(0, 10000)) / 100.0,
            )
        )
    sf = _write_events(tmp_path, rows)

    from crawler_ray.queries import asof_join, running_window

    got = asof_join(sf).to_pandas().set_index("event_id").sort_index()
    purchases = [r for r in rows if r[3] == "purchase"]
    assert len(got) == len(purchases)
    for eid, ts, uid, _, _ in purchases:
        prior = [r[1] for r in rows if r[3] == "click" and r[2] == uid and r[1] <= ts]
        want = (ts - max(prior)) if prior else -1
        assert got.loc[eid, "gap_us"] == want, eid

    rw = running_window(sf).to_pandas().set_index("event_id").sort_index()
    assert len(rw) == n
    by_user = {}
    for eid, ts, uid, _, val in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        cents_v = int(np.floor(val * 100 + 0.5))
        acc, cnt = by_user.get(uid, (0, 0))
        acc, cnt = acc + cents_v, cnt + 1
        by_user[uid] = (acc, cnt)
        assert rw.loc[eid, "run_value"] == acc / 100.0, eid
        assert rw.loc[eid, "rn"] == cnt, eid


def test_distinct_kmv_estimates_large_vocab(ray_session, tmp_path):
    """Vocab >> k forces the real sketch path (the fixture's 31-token
    vocab stays below k); estimate must match the DuckDB mirror exactly
    and land within 15% of truth at k=256."""
    import duckdb

    rng = np.random.default_rng(31337)
    texts = [
        " ".join(f"tok{v}" for v in rng.integers(0, 20000, size=200))
        for _ in range(300)
    ]
    sf = _write_docs(tmp_path, texts)
    from crawler_ray.queries import REGISTRY, distinct_kmv

    got = distinct_kmv(sf).to_pandas().set_index("lang")
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.sql(REGISTRY["distinct_kmv"].sql).df().set_index("lang")
    assert int(got.loc["en", "exact_distinct"]) == int(want.loc["en", "exact_distinct"])
    assert int(got.loc["en", "kmv_estimate"]) == int(want.loc["en", "kmv_estimate"])
    exact = int(got.loc["en", "exact_distinct"])
    est = int(got.loc["en", "kmv_estimate"])
    assert exact > 256  # the sketch path actually fired
    assert abs(est - exact) / exact < 0.15


def test_typo_pairs_deletion_neighborhood(ray_session, tmp_path):
    """All three edit-distance-1 shapes must surface (substitution,
    insertion, deletion) and distance-2 pairs must not."""
    words = ["alpha", "alphq", "alph", "alphas", "beta", "betq", "gamma"]
    # alpha~alphq (sub), alpha~alph (del), alpha~alphas (ins),
    # beta~betq (sub); alphq~alph also dist 1 (del); alph~alphas dist 2
    sf = _write_docs(tmp_path, [" ".join(words)])
    from crawler_ray.queries import typo_pairs

    got = typo_pairs(sf).to_pandas()
    pairs = {tuple(r) for r in got[["term_a", "term_b"]].itertuples(index=False)}
    base = {p for p in pairs if not (p[0].endswith("x") or p[1].endswith("x"))}
    assert ("alph", "alpha") in base
    assert ("alpha", "alphq") in base
    assert ("alpha", "alphas") in base
    assert ("beta", "betq") in base
    assert ("alph", "alphq") in base
    assert ("alph", "alphas") not in base  # distance 2
    assert ("alpha", "beta") not in base


def test_islands_and_range_window_fuzz_vs_bruteforce(ray_session, tmp_path):
    """Both interval kernels were bitten once by vectorization bugs the
    tiny fixture missed (int64 banding overflow; cross-span clamps) —
    fuzz them against pure-Python brute force at many-users scale."""
    rng = np.random.default_rng(2024)
    W_COV = 300_000_000
    W_SUM = 3_600_000_000
    n = 1500
    rows = [
        (
            i,
            int(rng.integers(0, 10_000_000_000)),  # dense ts: many ties/overlaps
            int(rng.integers(0, 200)),              # 200 users → >2 per bucket
            "view",
            float(rng.integers(0, 10000)) / 100.0,
        )
        for i in range(n)
    ]
    sf = _write_events(tmp_path, rows)
    from crawler_ray.queries import rolling_hour_sum, session_coverage

    cov = session_coverage(sf).to_pandas().set_index("user_id").sort_index()
    by_user: dict[int, list[int]] = {}
    for _eid, ts, uid, _t, _v in rows:
        by_user.setdefault(uid, []).append(ts)
    for uid, tss in by_user.items():
        tss.sort()
        islands, cur_start, cur_end = [], tss[0], tss[0] + W_COV
        for t in tss[1:]:
            if t > cur_end:
                islands.append(cur_end - cur_start)
                cur_start, cur_end = t, t + W_COV
            else:
                cur_end = max(cur_end, t + W_COV)
        islands.append(cur_end - cur_start)
        assert cov.loc[uid, "n_islands"] == len(islands), uid
        assert cov.loc[uid, "covered_us"] == sum(islands), uid

    rh = rolling_hour_sum(sf).to_pandas().set_index("event_id").sort_index()
    assert len(rh) == n
    for eid, ts, uid, _t, val in rng.choice(rows, size=200, replace=False):
        eid, ts, uid = int(eid), int(ts), int(uid)
        want = sum(
            int(np.floor(float(v) * 100 + 0.5))
            for _e, t2, u2, _ty, v in rows
            if u2 == uid and ts - W_SUM <= t2 <= ts
        )
        assert rh.loc[eid, "hour_sum"] == want / 100.0, eid


def test_bloom_semi_join_false_positives_settled_by_exact_join(ray_session):
    """A 64-bit Bloom filter saturates (nearly every probe is a false
    positive); the result must STILL equal the full-size-filter result
    because the exact hash join settles membership."""
    import pandas as pd

    from crawler_ray.queries import bloom_semi_join

    sf = "/root/testdata/sf0.001"

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values("l_linestatus").reset_index(drop=True)

    big = norm(bloom_semi_join(sf))
    tiny = norm(bloom_semi_join(sf, m_bits_log2=6))
    pd.testing.assert_frame_equal(big, tiny)
    assert len(big) > 0


def test_pagerank_dataset_regime_matches_broadcast(ray_session):
    """The past-vector-fits regime (ranks as a Dataset, zero broadcast)
    must be row-identical to the dense-vector regime."""
    import pandas as pd

    from crawler_ray.queries import pagerank

    sf = "/root/testdata/sf0.001"
    a = pagerank(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        pagerank(sf, dataset_regime=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "rank_scaled": "int64"})
    )
    pd.testing.assert_frame_equal(a.astype(b.dtypes.to_dict()), b)

    # auto-dispatch: past the node cap the DEFAULT call must pick the
    # dataset regime (data decides, not the caller)
    import crawler_ray.queries as Q

    old = Q.PAGERANK_BROADCAST_CAP_NODES
    try:
        Q.PAGERANK_BROADCAST_CAP_NODES = 0
        c = (
            pagerank(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype(b.dtypes.to_dict())
        )
        pd.testing.assert_frame_equal(c, b)
    finally:
        Q.PAGERANK_BROADCAST_CAP_NODES = old


def test_segment_dedup_join_regime_matches_broadcast(ray_session, tmp_path):
    """Force the past-cap loser-join regime; identical output to the
    broadcast regime including docs with no losers (left-outer null)."""
    import pandas as pd

    base = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"x{i}" for i in range(25))
    sf = _write_docs(tmp_path, [base, other, base])
    from crawler_ray.queries import segment_dedup

    a = segment_dedup(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        segment_dedup(sf, loser_broadcast_cap=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_funnel_and_transitions_fuzz_vs_bruteforce(ray_session, tmp_path):
    """Random event streams: funnel conversion (extreme-timestamp
    associativity across batch splits) and transition counts vs pure
    Python."""
    rng = np.random.default_rng(7777)
    types = ["click", "purchase", "view", "signup", "error"]
    rows = [
        (
            i,
            int(rng.integers(0, 1_000_000)),
            int(rng.integers(0, 60)),
            types[int(rng.integers(0, len(types)))],
            1.0,
        )
        for i in range(800)
    ]
    sf = _write_events(tmp_path, rows)
    from crawler_ray.queries import event_transitions, funnel_conversion

    f = funnel_conversion(sf).to_pandas().iloc[0]
    first_click, last_purchase = {}, {}
    for _e, ts, uid, ty, _v in rows:
        if ty == "click":
            first_click[uid] = min(first_click.get(uid, ts), ts)
        if ty == "purchase":
            last_purchase[uid] = max(last_purchase.get(uid, ts), ts)
    conv = sum(
        1 for u, fc in first_click.items() if u in last_purchase and last_purchase[u] >= fc
    )
    assert f["n_clickers"] == len(first_click)
    assert f["n_purchasers"] == len(last_purchase)
    assert f["n_converted"] == conv

    tr = event_transitions(sf).to_pandas()
    got = {(r.from_type, r.to_type): r.n for r in tr.itertuples()}
    want: dict[tuple, int] = {}
    by_user: dict[int, list] = {}
    for eid, ts, uid, ty, _v in rows:
        by_user.setdefault(uid, []).append((ts, eid, ty))
    for uid, evs in by_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_distinct_kmv_sketch_only_estimate_unchanged(ray_session, tmp_path):
    """Per-batch k-pruning (the scale posture) must not change the
    estimate: the global k smallest hashes survive any per-batch
    k-smallest pruning."""
    rng = np.random.default_rng(90210)
    texts = [
        " ".join(f"tok{v}" for v in rng.integers(0, 30000, size=150))
        for _ in range(400)
    ]
    sf = _write_docs(tmp_path, texts)
    from crawler_ray.queries import distinct_kmv

    full = distinct_kmv(sf).to_pandas().set_index("lang")
    sk = distinct_kmv(sf, sketch_only=True).to_pandas().set_index("lang")
    assert int(sk.loc["en", "kmv_estimate"]) == int(full.loc["en", "kmv_estimate"])
    assert int(sk.loc["en", "exact_distinct"]) == -1  # exact leg dropped


def test_semantic_dedup_auto_scales_centroids(ray_session, tmp_path):
    """r4 verdict: the DEFAULT posture must bound within-cluster work —
    n_centroids auto-scales as ceil(n_vecs / target_cluster) (floor 8),
    and the auto path at a given k is row-identical to pinning that k
    explicitly.  The oracle wrapper stays pinned at k=8."""
    rng = np.random.default_rng(11)
    n = 60
    m = rng.normal(size=(n, 12)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float32())),
            "label": pa.array([0] * n, type=pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "embeddings.parquet"))
    from crawler_ray.queries import _semantic_dedup_oracle, semantic_dedup

    sf = str(tmp_path)

    def norm(ds):
        return ds.to_pandas().sort_values("vec_id").reset_index(drop=True)

    # target_cluster=5 → k = ceil(60/5) = 12 > floor; auto == pinned-12
    auto = norm(semantic_dedup(sf, target_cluster=5))
    pinned = norm(semantic_dedup(sf, n_centroids=12))
    assert auto.equals(pinned)
    assert auto["bucket"].max() >= 8  # actually used more than the floor

    # corpus below the target → floor of 8 == the oracle wrapper
    small = norm(semantic_dedup(sf))  # 60 vecs, default target 4096
    oracle = norm(_semantic_dedup_oracle(sf))
    assert small.equals(oracle)


def test_snapshot_diff_classifies_all_four_statuses(ray_session, tmp_path):
    # doc_id 0..13: old side = id%10<8, new side = id%10>=2, edit on id%7==0.
    # id 0,10 -> old only? no: 0%10<8 and 0%10<2 -> removed; 0%7==0 edit
    # irrelevant (not on new side).  id 8,9 -> added.  id 7 -> both sides,
    # 7%7==0 -> changed.  id 2..6 -> both, unchanged.
    texts = [f"doc body number {i} stable content" for i in range(14)]
    sf = _write_docs(tmp_path, texts)
    from crawler_ray.queries import snapshot_diff

    out = snapshot_diff(sf).to_pandas().set_index("doc_id")["status"]
    expect = {}
    for i in range(14):
        old, new = i % 10 < 8, i % 10 >= 2
        if old and not new:
            expect[i] = "removed"
        elif new and not old:
            expect[i] = "added"
        elif old and new:
            expect[i] = "changed" if i % 7 == 0 else "unchanged"
    assert dict(out) == expect
    # every status class is actually exercised by this corpus
    assert set(expect.values()) == {"added", "removed", "changed", "unchanged"}


def test_term_cooccurrence_counts_and_caps(ray_session, tmp_path):
    # "alpha beta" co-occur in docs 0 and 1 (count 2); "gamma" only in
    # doc 1; short tokens (<4 chars) never pair; the 12-term cap keeps
    # the pair space bounded for a pathological wide-vocab doc.
    texts = [
        "alpha beta xy z",
        "alpha beta gamma",
        " ".join(f"word{i:02d}" for i in range(40)),  # 40 distinct terms
    ]
    sf = _write_docs(tmp_path, texts)
    from crawler_ray.queries import term_cooccurrence

    out = term_cooccurrence(sf).to_pandas()
    top = out.iloc[0]
    assert (top["t1"], top["t2"], top["n"]) == ("alpha", "beta", 2)
    assert not ((out["t1"] == "xy") | (out["t2"] == "xy")).any()
    # wide doc contributes exactly C(12,2)=66 pairs, not C(40,2)
    wide = out[out["t1"].str.startswith("word")]
    assert len(wide) == 66 and (wide["n"] == 1).all()
    assert ((out["t1"] < out["t2"]).all())


def test_leakage_safe_split_is_group_atomic(ray_session, tmp_path):
    # all docs of one source land in ONE split — the no-leakage contract
    import pyarrow.parquet as pq_

    n = 60
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(["x"] * n, type=pa.string()),
            "lang": pa.array(["en", "fr"] * (n // 2), type=pa.string()),
            "source": pa.array([f"host{i % 6}.example" for i in range(n)], type=pa.string()),
            "n_chars": pa.array([1] * n, type=pa.int64()),
        }
    )
    pq_.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    from crawler_ray.functions.shingles import md5_hash64
    from crawler_ray.queries import leakage_safe_split

    out = leakage_safe_split(str(tmp_path)).to_pandas()
    # recompute the expected per-(split,lang) counts from the contract
    exp = {}
    for i in range(n):
        b = md5_hash64(f"host{i % 6}.example") % 10
        split = "train" if b < 8 else ("valid" if b == 8 else "test")
        key = (split, "en" if i % 2 == 0 else "fr")
        exp[key] = exp.get(key, 0) + 1
    got = {(r["split"], r["lang"]): r["n_docs"] for _, r in out.iterrows()}
    assert got == exp
    assert int(out["n_docs"].sum()) == n and int(out["total_chars"].sum()) == n


def test_cross_corpus_neardup_flags_only_cross_side(ray_session, tmp_path):
    # doc 0 (eval twin exists): long doc -> one-token rewrite keeps J>=0.9
    # doc 1 (id%3!=0): NEVER flagged even though doc 2 is its exact copy
    # (same-side train-train near-dups are out of scope for this sweep)
    long = " ".join(f"tok{i}" for i in range(60))
    texts = [long, long + " tail", long + " tail"]  # ids 0,1,2
    sf = _write_docs(tmp_path, texts)
    from crawler_ray.queries import cross_corpus_neardup

    out = cross_corpus_neardup(sf).to_pandas().set_index("doc_id")
    # id 0's eval twin matches id 0 (and ids 1,2, which share its prefix)
    assert 0 in out.index
    # every flagged id is a TRAIN id (no offset eval ids leak through)
    assert (out.index < 10_000_000).all()
    assert (out["n_eval_matches"] >= 1).all()


def test_bigram_lm_join_regime_matches_broadcast(ray_session):
    """Force the past-the-bigram-cap join regime (pair table as a
    Dataset + pair-keyed hash join, distributed mean_c fold) and assert
    row equality with the broadcast path over the real fixture; also
    pin that short docs (<2 tokens) are excluded like the oracle's doc
    CTE."""
    import pandas as pd

    from crawler_ray.queries import bigram_lm_score

    sf = "/root/testdata/sf0.001"

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(["lang", "bucket"]).reset_index(drop=True)[
            ["lang", "bucket", "n_docs", "total_pairs"]
        ]

    a = norm(bigram_lm_score(sf))
    b = norm(bigram_lm_score(sf, bigram_broadcast_cap=0))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # score/bucket are bounded by construction: q <= q_gran => score <=
    # q_gran and bucket in [0, 7]
    assert a["bucket"].between(0, 7).all()


def test_bigram_lm_short_doc_exclusion(ray_session, tmp_path):
    """Docs with <2 tokens yield no pairs and must not appear in any
    bucket's n_docs (matching the SQL doc CTE), while multi-token docs
    all do."""
    import os

    from crawler_ray.queries import bigram_lm_score

    src = tmp_path / "src"
    os.makedirs(str(src), exist_ok=True)
    sf = _write_docs(
        src,
        ["a b a b a", "solo", "a a a a", "b", "b a b a"],
        langs=["en", "en", "fr", "fr", "fr"],
    )
    out = bigram_lm_score(sf).to_pandas()
    assert int(out["n_docs"].sum()) == 3  # the two 1-token docs excluded
    assert int(out["total_pairs"].sum()) == 4 + 3 + 3


def test_triangle_count_join_regime_matches_broadcast(ray_session):
    """The past-cap union-shuffle regime (splitmix64 orientation, closure
    bucket-side) must be row-identical to the broadcast regime (degree
    orientation, searchsorted against the broadcast edge array) — the
    orientation only moves wedge generation, never the result.  Also pin
    the auto-dispatch: with the cap forced to 0 the DEFAULT call takes
    the join regime."""
    import pandas as pd

    import crawler_ray.queries as Q
    from crawler_ray.queries import triangle_count

    sf = "/root/testdata/sf0.001"

    def norm(res):
        return res.to_pandas().sort_values("triangles").reset_index(drop=True)

    a = norm(triangle_count(sf, broadcast=True))
    b = norm(triangle_count(sf, broadcast=False))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0 and a["n_nodes"].sum() > 0

    old = Q.TRIANGLE_BROADCAST_CAP_EDGES
    try:
        Q.TRIANGLE_BROADCAST_CAP_EDGES = 0
        c = norm(triangle_count(sf))
        pd.testing.assert_frame_equal(c, a)
    finally:
        Q.TRIANGLE_BROADCAST_CAP_EDGES = old


def test_group_pairs_vectorized_kernel():
    """_group_pairs must enumerate exactly the within-group unordered
    pairs, in predecessor order, for ragged group layouts."""
    import numpy as np

    from crawler_ray.queries import _group_pairs

    key = np.array([0, 0, 0, 2, 5, 5], dtype=np.int64)
    val = np.array([10, 11, 12, 20, 30, 31], dtype=np.int64)
    owner, v, w = _group_pairs(key, val)
    got = sorted(zip(v.tolist(), w.tolist()))
    assert got == [(10, 11), (10, 12), (11, 12), (30, 31)]
    assert (key[owner] == np.array([0, 0, 0, 5])[np.argsort([0, 1, 2, 3])]).all()

    # empty and singleton-groups-only inputs
    for k, vv in (
        (np.array([], dtype=np.int64), np.array([], dtype=np.int64)),
        (np.array([1, 2, 3], dtype=np.int64), np.array([7, 8, 9], dtype=np.int64)),
    ):
        o2, v2, w2 = _group_pairs(k, vv)
        assert len(o2) == len(v2) == len(w2) == 0


def _seq_coreness_hist(n):
    """Exact sequential min-degree peeling (the textbook k-core
    algorithm) over the same triangle-test graph — the oracle for the
    distributed h-index fixpoint."""
    import heapq

    import pyarrow as pa

    from crawler_ray.queries import _explode_edge_keys

    t = pa.table({"doc_id": pa.array(range(n), type=pa.int64())})
    adj = {v: set() for v in range(n)}
    for k in _explode_edge_keys(t, n).tolist():
        a, b = divmod(int(k), n)
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(adj[v]) for v in range(n)}
    heap = [(d, v) for v, d in deg.items()]
    heapq.heapify(heap)
    removed, core, cur = set(), {}, 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != deg[v]:
            continue
        cur = max(cur, d)
        core[v] = cur
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    hist = {}
    for v in range(n):
        hist[core[v]] = hist.get(core[v], 0) + 1
    return hist


def test_kcore_matches_sequential_peel_and_regimes_agree(ray_session, tmp_path):
    """Distributed h-index fixpoint == exact sequential peeling, at the
    fixture graph AND an off-size graph (different wraparound
    structure); broadcast and dataset regimes row-identical."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from crawler_ray.queries import kcore_decomposition

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values("coreness").reset_index(drop=True)

    sf = "/root/testdata/sf0.001"
    a = norm(kcore_decomposition(sf, dataset_regime=False))
    b = norm(kcore_decomposition(sf, dataset_regime=True))
    pd.testing.assert_frame_equal(a, b)
    want = _seq_coreness_hist(500)
    got = dict(zip(a["coreness"].tolist(), a["n_nodes"].tolist()))
    assert got == want
    assert max(want) >= 2  # the graph has a non-trivial core

    # off-size corpus: n=137 exercises different modular wraparound
    d = str(tmp_path / "k137")
    os.makedirs(d, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(137), type=pa.int64()),
                "lang": pa.array(["en"] * 137),
                "source": pa.array(["s"] * 137),
                "text": pa.array(["t"] * 137),
                "n_chars": pa.array([1] * 137, type=pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    a2 = norm(kcore_decomposition(d, dataset_regime=False))
    b2 = norm(kcore_decomposition(d, dataset_regime=True))
    pd.testing.assert_frame_equal(a2, b2)
    got2 = dict(zip(a2["coreness"].tolist(), a2["n_nodes"].tolist()))
    assert got2 == _seq_coreness_hist(137)


def test_weighted_sample_topk_is_weight_biased(ray_session, tmp_path):
    """Inclusion must track weight: with half the docs at w=2000 and
    half at w=20, the heavy half dominates the k=100 sample."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from crawler_ray.queries import weighted_sample_topk

    n = 2000
    w = [2000 if i < n // 2 else 20 for i in range(n)]
    d = str(tmp_path / "ws")
    os.makedirs(d, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "lang": pa.array(["en"] * n),
                "text": pa.array(["t"] * n),
                "n_chars": pa.array(w, type=pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = weighted_sample_topk(d).to_pandas()
    assert len(got) == 100
    heavy = int((got["doc_id"] < n // 2).sum())
    # E[heavy] ≈ 100·(2000·1000)/(2000·1000+20·1000) ≈ 99
    assert heavy >= 90
    # priorities are exactly h>>1 // w (spot-check determinism)
    from crawler_ray.functions import shingles

    r = got.iloc[0]
    h = shingles.md5_hash64(str(int(r["doc_id"])))
    assert int(r["p"]) == (h >> 1) // int(r["w"])


def _seq_bfs_hist(n, source=0, max_depth=32):
    """Exact sequential BFS over the triangle-test graph."""
    from collections import deque

    import pyarrow as pa

    from crawler_ray.queries import _explode_edge_keys

    t = pa.table({"doc_id": pa.array(range(n), type=pa.int64())})
    adj = {v: [] for v in range(n)}
    for k in _explode_edge_keys(t, n).tolist():
        a, b = divmod(int(k), n)
        adj[a].append(b)
        adj[b].append(a)
    dist = {source: 0}
    q = deque([source])
    while q:
        v = q.popleft()
        if dist[v] >= max_depth:
            continue
        for u in adj[v]:
            if u not in dist:
                dist[u] = dist[v] + 1
                q.append(u)
    hist = {}
    for d in dist.values():
        hist[d] = hist.get(d, 0) + 1
    return hist


def test_graph_bfs_layers_matches_sequential_and_regimes_agree(
    ray_session, tmp_path
):
    """Distributed BFS == exact sequential BFS at two graph shapes;
    broadcast and dataset regimes row-identical; a tight max_depth cap
    truncates identically in both regimes (the cap is CONTRACT)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from crawler_ray.queries import graph_bfs_layers

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values("dist").reset_index(drop=True)

    sf = "/root/testdata/sf0.001"
    a = norm(graph_bfs_layers(sf, dataset_regime=False))
    b = norm(graph_bfs_layers(sf, dataset_regime=True))
    pd.testing.assert_frame_equal(a, b)
    want = _seq_bfs_hist(500)
    assert dict(zip(a["dist"].tolist(), a["n_nodes"].tolist())) == want
    assert len(want) >= 3  # non-trivial layering

    # tight cap truncates identically (cap semantics, both regimes)
    a1 = norm(graph_bfs_layers(sf, max_depth=2, dataset_regime=False))
    b1 = norm(graph_bfs_layers(sf, max_depth=2, dataset_regime=True))
    pd.testing.assert_frame_equal(a1, b1)
    want1 = _seq_bfs_hist(500, max_depth=2)
    assert dict(zip(a1["dist"].tolist(), a1["n_nodes"].tolist())) == want1

    # off-size graph (different wraparound), non-zero source
    d = str(tmp_path / "b137")
    os.makedirs(d, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(137), type=pa.int64()),
                "lang": pa.array(["en"] * 137),
                "source": pa.array(["s"] * 137),
                "text": pa.array(["t"] * 137),
                "n_chars": pa.array([1] * 137, type=pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    a2 = norm(graph_bfs_layers(d, source_node=5, dataset_regime=False))
    b2 = norm(graph_bfs_layers(d, source_node=5, dataset_regime=True))
    pd.testing.assert_frame_equal(a2, b2)
    assert dict(zip(a2["dist"].tolist(), a2["n_nodes"].tolist())) == _seq_bfs_hist(
        137, source=5
    )


def test_per_source_cap_exact_and_batch_invariant(ray_session, tmp_path):
    """The kept set must be EXACTLY the cap-smallest (md5, doc_id) per
    source — independent of batch/block layout — and a source smaller
    than the cap keeps everything."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from crawler_ray.functions import shingles
    from crawler_ray.queries import per_source_cap

    n = 1000
    src = [f"s{i % 7}" for i in range(n - 3)] + ["tiny"] * 3
    d = str(tmp_path / "cap")
    os.makedirs(d, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "source": pa.array(src),
                "lang": pa.array(["en"] * n),
                "text": pa.array(["t"] * n),
                "n_chars": pa.array([1] * n, type=pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = per_source_cap(d, cap=10).to_pandas()
    # exact expected set, computed independently
    by_src = {}
    for i, s in enumerate(src):
        by_src.setdefault(s, []).append((shingles.md5_hash64(str(i)), i))
    want = set()
    for s, rows in by_src.items():
        for _, i in sorted(rows)[:10]:
            want.add((i, s))
    assert set(zip(got["doc_id"].tolist(), got["source"].tolist())) == want
    assert (got["source"] == "tiny").sum() == 3  # under-cap source intact


def test_srp_lsh_neardup_regimes_and_margins(ray_session):
    """Broadcast and join verify regimes are row-identical; the result
    is exactly the planted pair set; the float margins the oracle
    relies on hold (planted cosine >= 0.999, best non-planted <= 0.7)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq_

    from crawler_ray.queries import SRP_AUG_OFF, _srp_aug, srp_lsh_neardup

    sf = "/root/testdata/sf0.001"

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    a = norm(srp_lsh_neardup(sf, broadcast=True))
    b = norm(srp_lsh_neardup(sf, broadcast=False))
    pd.testing.assert_frame_equal(a, b)

    t = pq_.read_table(sf + "/embeddings.parquet")
    want = {
        (int(v), int(v) + SRP_AUG_OFF)
        for v in t["vec_id"].to_pylist()
        if v % 4 == 0
    }
    assert set(zip(a["id_a"].tolist(), a["id_b"].tolist())) == want

    # margin audit: exhaustive cosine over the augmented corpus
    ids, m = _srp_aug(t)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn.T
    np.fill_diagonal(cos, -1)
    planted = np.array(
        [cos[i, np.flatnonzero(ids == ids[i] + SRP_AUG_OFF)[0]]
         for i in range(len(ids)) if ids[i] < SRP_AUG_OFF and ids[i] % 4 == 0]
    )
    assert planted.min() >= 0.999
    for i, vid in enumerate(ids):
        j = np.flatnonzero(ids == vid + SRP_AUG_OFF)
        if len(j):
            cos[i, j[0]] = -1
            cos[j[0], i] = -1
    assert cos.max() <= 0.7


def test_containment_join_regimes_and_planted_excerpts(ray_session):
    """The join-verify regime (gram buffers attached to pair rows via
    two hash joins) must be row-identical to the broadcast-gmap regime;
    every planted excerpt doc (doc_id%10==0, first 3n/5 tokens) must be
    reported fully contained (containment == 1.0) in its source — the
    prefix filter's guaranteed-superset recall means no planted pair
    can be missed by candidate generation."""
    import pandas as pd

    from crawler_ray.queries import containment_join

    sf = "/root/testdata/sf0.001"

    def norm(res):
        return (
            res.to_pandas()
            .sort_values(["containee", "container"])
            .reset_index(drop=True)
        )

    a = norm(containment_join(sf, forced_regime="broadcast"))
    b = norm(containment_join(sf, forced_regime="join"))
    pd.testing.assert_frame_equal(a, b)
    # dense-vocabulary bitset regime (the default on this corpus) must
    # emit the exact same directed pairs as the PPJoin prefix path
    c = norm(containment_join(sf, forced_regime="dense"))
    pd.testing.assert_frame_equal(a, c)

    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    planted = {(d + 10_000_000, d) for d in ids if d % 10 == 0}
    got = set(zip(a["containee"], a["container"]))
    assert planted <= got
    by_pair = dict(zip(zip(a["containee"], a["container"]), a["containment"]))
    assert all(by_pair[p] == 1.0 for p in planted)


def test_cms_registers_overestimate_contract(ray_session, tmp_path):
    """CMS point estimate (min over rows) is >= the true count for
    every token, and exact for heavy tokens that own their cells."""
    import hashlib
    import collections

    texts = ["alpha beta alpha gamma"] * 20 + ["delta epsilon"] * 3
    sf = _write_docs(tmp_path, texts)
    from crawler_ray.queries import cms_registers

    regs = cms_registers(sf).to_pandas()
    grid = {(int(r), int(c)): int(v)
            for r, c, v in zip(regs["row_id"], regs["cell"], regs["register"])}
    true = collections.Counter(
        tok for txt in texts for tok in txt.split(" "))
    n_total = sum(true.values())
    assert sum(v for (r, _), v in grid.items() if r == 0) == n_total

    def estimate(tok):
        vals = []
        for r in range(4):
            c = int.from_bytes(
                hashlib.md5(f"{r}:{tok}".encode()).digest()[8:16], "little"
            ) % 256
            vals.append(grid.get((r, c), 0))
        return min(vals)

    for tok, cnt in true.items():
        assert estimate(tok) >= cnt
    # 5 tokens in 1024 cells: the heavy token collides with nothing
    # in at least one row w.h.p. -> estimate is exact
    assert estimate("alpha") == true["alpha"]


def test_overlap_stitch_finds_planted_continuations(ray_session, tmp_path):
    """Every planted continuation (doc_id%7==0 -> id+20M opening with
    the parent's 32-char tail) is recovered as (parent, continuation);
    unrelated docs never pair."""
    texts = [
        " ".join(f"doc{i}word{j}" for j in range(12)) for i in range(9)
    ]
    sf = _write_docs(tmp_path, texts)
    from crawler_ray.queries import overlap_stitch

    out = overlap_stitch(sf).to_pandas()
    pairs = set(zip(out["a_id"], out["b_id"]))
    for did in (0, 7):
        assert (did, did + 20_000_000) in pairs
    # per-doc-unique tokens: no natural 32-char tail==head collision
    assert all(b - a == 20_000_000 for a, b in pairs)


def test_label_prop_regimes_agree_and_match_sequential(ray_session):
    """Dataset regime == broadcast regime, and both equal a sequential
    synchronous-LPA reference over the same derived graph."""
    import pyarrow.parquet as pq2

    from crawler_ray.queries import (
        _explode_edge_keys, label_prop_rounds)

    SF = "/root/testdata/sf0.001"

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(["label"]).reset_index(drop=True)

    bc = norm(label_prop_rounds(SF, dataset_regime=False))
    ds = norm(label_prop_rounds(SF, dataset_regime=True))
    assert len(bc) == len(ds)
    assert (bc["label"].to_numpy() == ds["label"].to_numpy()).all()
    assert (bc["n_nodes"].to_numpy() == ds["n_nodes"].to_numpy()).all()

    # sequential reference: same edge formula, 3 sync rounds,
    # (count desc, label asc) vote
    t = pq2.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    n = t.num_rows
    keys = _explode_edge_keys(t, n)
    a, b = keys // n, keys % n
    nbrs = [[] for _ in range(n)]
    for x, y in zip(a, b):
        nbrs[int(x)].append(int(y))
        nbrs[int(y)].append(int(x))
    lab = list(range(n))
    for _ in range(3):
        nxt = list(lab)
        for v in range(n):
            votes = {}
            for u in nbrs[v]:
                votes[lab[u]] = votes.get(lab[u], 0) + 1
            nxt[v] = min(votes, key=lambda L: (-votes[L], L))
        lab = nxt
    import collections

    want = collections.Counter(lab)
    got = dict(zip(bc["label"], bc["n_nodes"]))
    assert got == dict(want)
    # propagation actually coarsened: fewer communities than nodes
    assert len(got) < n


def test_embedding_gram_matches_numpy_and_pca_sane(ray_session):
    """Pipeline Gram == sequential numpy Q^T Q, and the driver-side
    PCA read of the result is sane (symmetric PSD, eigenvalues
    descending, top eigenvalue carries positive variance)."""
    import pyarrow.parquet as pq2

    from crawler_ray.queries import embedding_gram
    from crawler_ray.stages.ann import list_col_to_matrix

    SF = "/root/testdata/sf0.001"
    out = embedding_gram(SF).to_pandas()
    d = 64
    G = np.zeros((d, d), dtype=np.int64)
    G[out["i"], out["j"]] = out["g"]
    G[out["j"], out["i"]] = out["g"]

    M = list_col_to_matrix(
        pq2.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])[
            "embedding"
        ].combine_chunks()
    )
    Q = np.floor(M.astype(np.float64) * 1024.0).astype(np.int64)
    assert np.array_equal(G, Q.T @ Q)

    w = np.linalg.eigvalsh(G.astype(np.float64))
    assert w[0] >= -1e-6 * abs(w[-1])  # PSD up to fp eigensolver noise
    assert w[-1] > 0


def test_cohort_retention_and_event_paths_behavior(ray_session, tmp_path):
    """Cohort ages are user-relative (not global), path trigrams never
    cross user boundaries, and both ops survive single-event users."""
    DAY = 86_400_000_000
    rows = [
        # user 1: days 0, 1, 3 -> cohort 0, ages {0,1,3}
        (0, 1 * 1000, 1, "view", 0.0),
        (1, DAY + 5, 1, "click", 0.0),
        (2, 3 * DAY + 5, 1, "purchase", 0.0),
        # user 2: first seen day 1; two same-day events dedup to ONE
    # (cohort 1, age 0) active-user row
        (3, DAY + 7, 2, "view", 0.0),
        (4, DAY + 9, 2, "view", 0.0),
        # user 3: single event, no trigram
        (5, 2 * DAY, 3, "error", 0.0),
    ]
    sf = _write_events(tmp_path, rows)
    from crawler_ray.queries import cohort_retention, event_path_topk

    ret = cohort_retention(sf).to_pandas()
    got = {(r.cohort_day, r.age): r.n_users for r in ret.itertuples()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1, (2, 0): 1}

    paths = event_path_topk(sf).to_pandas()
    assert list(paths["path"]) == ["view>click>purchase"]
    assert list(paths["n"]) == [1]


def test_source_overlap_matrix_counts_distinct_shared_segments(
    ray_session, tmp_path
):
    """A segment shared by sources A and B counts ONCE regardless of
    how many docs repeat it; disjoint sources never pair."""
    seg = " ".join(f"w{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_c = " ".join(f"c{i}" for i in range(10))
    n = 5
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(
                [seg, f"{seg} {uniq_a}", seg, seg, uniq_c], type=pa.string()
            ),
            "lang": pa.array(["en"] * n, type=pa.string()),
            # A holds the segment twice, B twice, C is disjoint
            "source": pa.array(["A", "A", "B", "B", "C"], type=pa.string()),
            "n_chars": pa.array([len(seg)] * n, type=pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    from crawler_ray.queries import source_overlap_matrix

    out = source_overlap_matrix(str(tmp_path)).to_pandas()
    got = {(r.sa, r.sb): r.n_shared for r in out.itertuples()}
    assert got == {("A", "B"): 1}


def test_media_context_stats_tail_and_windows(ray_session, tmp_path):
    """Hand-constructed doc where the media span is the LAST span:
    next_chars = 0 and it counts as tail; a mid-doc media span gets
    both windows."""
    # doc_id 0: (0*31 + j) % 5 == 0 at j=0; 100 chars -> k=2 text spans
    # media after text span 0 -> prev=64, next=min(64, 100-64)=36, not tail
    # doc_id 5: (155 + j) % 5 == 0 at j=0; 60 chars -> k=1 -> tail media
    texts = {0: "x" * 100, 5: "y" * 60}
    n = 2
    t = pa.table(
        {
            "doc_id": pa.array([0, 5], type=pa.int64()),
            "text": pa.array([texts[0], texts[5]], type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
            "source": pa.array(["s"] * n, type=pa.string()),
            "n_chars": pa.array([100, 60], type=pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    from crawler_ray.queries import media_context_stats

    out = media_context_stats(str(tmp_path)).to_pandas().set_index("kind")
    # doc 0 j=0: kind (0+0)%3 = image; doc 5 j=0: kind (5+0)%3 = video
    assert out.loc["image", "prev_chars"] == 64
    assert out.loc["image", "next_chars"] == 36
    assert out.loc["image", "n_tail"] == 0
    assert out.loc["video", "prev_chars"] == 60
    assert out.loc["video", "next_chars"] == 0
    assert out.loc["video", "n_tail"] == 1
