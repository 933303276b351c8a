"""Fast sample of the queries-vs-DuckDB oracle gate (full sweep lives in
tools/check_queries.py; the driver runs the whole registry at sf0.01)."""

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = "/root/testdata/sf0.001"
SAMPLE = [
    # one per operator family — the driver sweeps the FULL registry at
    # sf0.01 every round (tools/check_queries.py mirrors it); this
    # sample keeps pytest fast while guarding the harness plumbing
    "frequencies_model", "pricing_summary", "token_stats",
    "duplicate_substrings", "kmeans_clusters",
    "group_topk", "segment_dedup", "pii_scrub",
    "asof_join", "running_window", "semantic_dedup",
    "pagerank", "distinct_kmv", "session_coverage", "typo_pairs", "rolling_hour_sum", "pivot_events", "shuffle_shards", "ohlc_hourly",
    "media_decode_stats",
    "snapshot_diff", "term_cooccurrence", "leakage_safe_split",
    "cross_corpus_neardup", "dsir_resample", "bm25_topk",
    "temperature_resample", "bigram_lm_score", "image_dhash_neardup",
    "triangle_count", "interleaved_span_stats", "url_pattern_topk",
    "containment_join", "rrf_fusion", "anchor_text_agg",
    "image_text_pairs", "interleaved_doc_filter", "interleaved_serialize",
    "boilerplate_removal", "dedup_keep_longest", "memorization_scan",
    "mutual_nn_pairs", "cocitation_pairs", "hll_registers",
    "interleaved_data_prep", "graph_random_walks", "pmi_topk",
    "dataset_card_stats", "cms_registers", "overlap_stitch",
    "label_prop_rounds", "embedding_gram", "cohort_retention",
    "event_path_topk", "source_overlap_matrix", "media_context_stats",
    "kwic_contexts", "skyline_pareto", "timeseries_gapfill",
    "winsorized_stats", "event_debounce", "rank_agreement",
    "two_hop_reach", "colbert_maxsim", "cdc_upsert_merge",
    "media_layout_dedup", "basket_rules", "dup_size_histogram",
    "personalized_pagerank", "growth_accounting", "jsonl_roundtrip_stats",
    "custdist_histogram", "session_stats", "funnel_stages",
    "mg_topk_terms", "terasort_rank", "shipping_priority",
    "span_integrity_audit", "politeness_schedule", "crawl_budget_allocation",
    "edit_distance_neardup", "ngram_novelty",
    "hits_scores", "semantic_decontamination", "corpus_diversity",
    "retrieval_eval", "recrawl_priority",
    "alias_resolution", "edge_reciprocity", "host_graph_condense",
    "corpus_drift", "host_burstiness",
    "weak_label_vote", "calibration_bins",
    "regional_volume", "large_order_customers",
    "late_shipment_priority", "props_json_stats",
    "returned_item_report", "brand_supplier_counts",
    "promo_revenue_share", "link_prediction_ra",
    "waiting_suppliers", "small_qty_revenue",
    "nation_trade_volume", "idle_customer_balance",
    "top_supplier_revenue", "clustering_coefficient",
    "degree_assortativity", "cusum_change_points",
    "late_event_audit", "zipf_slope", "ks_length_drift",
    "market_share", "power_iteration_embed",
]


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_sampled_queries_match_oracle(ray_session):
    from crawler_ray.queries import REGISTRY

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(SF, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    for name in SAMPLE:
        qd = REGISTRY[name]
        got = qd.fn(SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        want = con.sql(qd.sql).df()
        assert len(got) == len(want), name
        ca, cb = _canon(got), _canon(want)
        for c in ca.columns:
            va, vb = ca[c].to_numpy(), cb[c].to_numpy()
            if va.dtype.kind == "f":
                assert np.allclose(va.astype(np.float64), vb.astype(np.float64), rtol=0, atol=0), (name, c)
            else:
                assert (va == vb).all(), (name, c)


def test_registry_complete(ray_session):
    from crawler_ray.queries import REGISTRY

    assert len(REGISTRY) >= 22
    for name, qd in REGISTRY.items():
        assert callable(qd.fn), name


def test_ngram_jaccard_dense_and_sparse_paths_agree(ray_session):
    """The dense-vocabulary bitset path and the sparse inverted-index
    path are alternative executions of the same exact join — force each
    via the dispatch limit and compare pair-for-pair."""
    from crawler_ray.queries import ngram_jaccard_neardup

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    dense = norm(ngram_jaccard_neardup(SF))                        # dense fires (tiny vocab)
    sparse = norm(ngram_jaccard_neardup(SF, dense_vocab_limit=0))  # forced inverted index
    # forced past-the-broadcast-cap regime: sizes as a Dataset + 2 joins
    joined = norm(ngram_jaccard_neardup(SF, dense_vocab_limit=0, size_broadcast_cap=0))
    assert len(dense) == len(sparse) and len(dense) > 0
    assert (dense["doc_a"].to_numpy() == sparse["doc_a"].to_numpy()).all()
    assert (dense["doc_b"].to_numpy() == sparse["doc_b"].to_numpy()).all()
    assert np.allclose(dense["jaccard"], sparse["jaccard"], rtol=0, atol=0)
    assert len(joined) == len(dense)
    assert (joined["doc_a"].to_numpy() == dense["doc_a"].to_numpy()).all()
    assert (joined["doc_b"].to_numpy() == dense["doc_b"].to_numpy()).all()
    assert np.allclose(joined["jaccard"], dense["jaccard"], rtol=0, atol=0)


def test_ngram_jaccard_hybrid_skew_split_regime(ray_session, tmp_path):
    """Zipfian corpus: a few HOT grams (df ≈ corpus size) + a sparse
    cold tail too large for the dense bitset.  The skew-split regime
    (hot bitset BLAS tiles + cold inverted index) must fire and be
    pair-exact vs the pure inverted index and the DuckDB oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.queries import REGISTRY, ngram_jaccard_neardup
    from crawler_ray.stages import dedup as dd

    rng = np.random.default_rng(4242)
    # grams are BIGRAMS: hot grams need shared phrases, not hot tokens.
    # 5 boilerplate phrases × ~37 docs each → 35 hot bigrams with df≈37;
    # 120 random cold tokens/doc from a 300k vocab → ~21k distinct cold
    # bigrams (past the 16,384 dense cap), df≈1 (cheap cold index).
    phrases = [[f"p{p}t{i}" for i in range(8)] for p in range(5)]
    cold_vocab = [f"c{i}" for i in range(300_000)]
    texts = []
    for i in range(160):
        toks = list(phrases[int(rng.integers(0, 5))])
        toks += [cold_vocab[v] for v in rng.integers(0, 300_000, size=120)]
        texts.append(" ".join(toks))
    for i in range(25):  # plant near-dups
        base = texts[i].split(" ")
        base[-1] = "Z"
        texts.append(" ".join(base))
    d = str(tmp_path / "skew")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}),
        os.path.join(d, "documents.parquet"),
    )

    calls = []
    orig = dd.try_hybrid_jaccard

    def spy(*a, **k):
        res = orig(*a, hot_floor=16, **k)  # fixture dfs ≈ 40; prod floor is 64
        calls.append(res is not None)
        return res

    dd.try_hybrid_jaccard = spy
    try:
        got = ngram_jaccard_neardup(d)
    finally:
        dd.try_hybrid_jaccard = orig
    assert calls == [True], "hybrid regime did not fire on the skewed corpus"
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)

    pure = ngram_jaccard_neardup(d, hybrid=False)
    pure = (pure.to_pandas() if hasattr(pure, "to_pandas") else pure).sort_values(
        ["doc_a", "doc_b"]
    ).reset_index(drop=True)
    assert len(got) == len(pure) and len(got) >= 25
    assert (got["doc_a"].to_numpy() == pure["doc_a"].to_numpy()).all()
    assert (got["doc_b"].to_numpy() == pure["doc_b"].to_numpy()).all()
    assert np.array_equal(got["jaccard"].to_numpy(), pure["jaccard"].to_numpy())

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    want = con.sql(REGISTRY["ngram_jaccard_neardup"].sql).df()
    want = want.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)[got.columns]
    assert len(got) == len(want)
    assert (got["doc_a"].to_numpy() == want["doc_a"].to_numpy()).all()
    assert np.array_equal(got["jaccard"].to_numpy(), want["jaccard"].to_numpy())


def test_qcont_matches_duckdb_quantile_cont_fuzz(ray_session):
    """token_quantiles' interpolation must be BIT-equal to DuckDB
    quantile_cont (the oracle gate is exact): seeded fuzz over random
    integer histograms.  Guards the v_lo*(1-frac)+v_hi*frac form — the
    algebraically-equal variant diverges by 1 ULP on ~5% of cases."""
    import duckdb

    from crawler_ray.queries import qcont  # the PRODUCTION interpolation

    rng = np.random.default_rng(1234)
    con = duckdb.connect()
    for _ in range(40):
        vals = np.unique(rng.integers(1, 200, size=int(rng.integers(1, 15))))
        counts = rng.integers(1, 8, size=len(vals))
        expanded = np.repeat(vals, counts)
        con.execute("DROP TABLE IF EXISTS t")
        con.execute("CREATE TABLE t(v BIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", [(int(x),) for x in expanded])
        for q in (0.5, 0.9, 0.99):
            want = con.sql(f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
            got = qcont(vals.astype(np.int64), counts.astype(np.int64), q)
            assert got == want, (vals, counts, q, got, want)


def test_ngram_jaccard_random_corpora_both_paths(ray_session, tmp_path):
    """Property: dense-bitset and sparse inverted-index paths agree
    with DuckDB on RANDOM corpora at both vocabulary regimes."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.queries import REGISTRY, ngram_jaccard_neardup

    rng = np.random.default_rng(77)
    for regime, vocab_n in (("dense", 40), ("sparse", 50_000)):
        vocab = [f"w{i}" for i in range(vocab_n)]
        texts = []
        for i in range(120):
            toks = [vocab[v] for v in rng.integers(0, vocab_n, size=12)]
            texts.append(" ".join(toks))
        # plant near-dups
        for i in range(20):
            base = texts[i].split(" ")
            base[-1] = "X"
            texts.append(" ".join(base))
        d = str(tmp_path / regime)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}),
            os.path.join(d, "documents.parquet"),
        )
        got = ngram_jaccard_neardup(d)
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        got = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
        want = con.sql(REGISTRY["ngram_jaccard_neardup"].sql).df()
        want = want.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)[got.columns]
        assert len(got) == len(want) and len(got) >= 20, regime
        assert (got["doc_a"].to_numpy() == want["doc_a"].to_numpy()).all(), regime
        assert np.array_equal(got["jaccard"].to_numpy(), want["jaccard"].to_numpy()), regime


def test_quantile_disc_index_rule_fuzz(ray_session):
    """value_quantiles assumes quantile_disc picks the 1-based
    ceil(q*n)-th order statistic; fuzz the rule against DuckDB over
    random double multisets (dup-heavy included)."""
    import math

    import duckdb

    rng = np.random.default_rng(555)
    con = duckdb.connect()
    for _ in range(40):
        n = int(rng.integers(1, 60))
        vals = np.round(rng.normal(0, 50, size=n), 2)
        if rng.random() < 0.3:
            vals[: n // 2] = vals[0]  # heavy duplicate mass
        con.execute("DROP TABLE IF EXISTS t")
        con.execute("CREATE TABLE t(v DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(float(x),) for x in vals])
        s = np.sort(vals)
        for q in (0.5, 0.9, 0.99, 0.25, 1.0):
            want = con.sql(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            got = s[math.ceil(q * n) - 1]
            assert got == want, (n, q, got, want)


def test_value_quantiles_negative_and_dup_heavy(ray_session, tmp_path):
    """The order-preserving bit transform must handle negatives, zeros
    and duplicate-heavy bins; compare against quantile_disc on a
    synthetic events table the fixture (all-positive) can't cover."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.queries import value_quantiles

    rng = np.random.default_rng(31337)
    vals = np.concatenate([
        rng.normal(-100, 50, size=400),          # negatives
        np.zeros(50), -np.zeros(25),             # signed zeros
        np.full(200, -7.25),                     # heavy duplicate mass
        rng.exponential(1000, size=300),
    ])
    types = rng.choice(["a", "b", "c"], size=len(vals))
    d = str(tmp_path / "ev")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(len(vals)), type=pa.int64()),
            "event_type": pa.array(types.tolist()),
            "value": pa.array(vals, type=pa.float64()),
        }),
        os.path.join(d, "events.parquet"),
    )
    got = value_quantiles(d)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got).sort_values(
        "event_type"
    ).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    want = con.sql("""
        SELECT event_type, count(*) AS n,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.9) AS p90,
               quantile_disc(value, 0.99) AS p99
        FROM events GROUP BY event_type
    """).df().sort_values("event_type").reset_index(drop=True)[got.columns]
    assert len(got) == len(want) == 3
    for c in got.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_value_quantiles_degenerate_bounded(ray_session, tmp_path):
    """Degenerate distributions (constant column, 3-value column) must
    resolve via bounded prefix recursion — with collect_cap=1 NO bin is
    ever collected wholesale (a constant column recurses to the full
    64-bit key, where the prefix IS the value), so driver memory stays
    O(bins) whatever the skew.  Results stay bit-exact vs quantile_disc."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray.queries import value_quantiles

    rng = np.random.default_rng(99)
    cases = {
        "const": np.full(5000, 3.141592653589793),
        "three": rng.choice([-1.5, 0.0, 7e300], size=5000),
        "mixed": np.concatenate([np.full(4000, -2.5), rng.normal(0, 1, 1000)]),
    }
    vals = np.concatenate(list(cases.values()))
    types = np.concatenate([np.full(len(v), k, dtype=object) for k, v in cases.items()])
    d = str(tmp_path / "ev")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(len(vals)), type=pa.int64()),
            "event_type": pa.array(types.tolist()),
            "value": pa.array(vals, type=pa.float64()),
        }),
        os.path.join(d, "events.parquet"),
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    want = con.sql("""
        SELECT event_type, count(*) AS n,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.9) AS p90,
               quantile_disc(value, 0.99) AS p99
        FROM events GROUP BY event_type
    """).df().sort_values("event_type").reset_index(drop=True)
    for cap in (1, 64, 65536):  # full recursion / mixed / default
        got = value_quantiles(d, collect_cap=cap)
        got = (got.to_pandas() if hasattr(got, "to_pandas") else got).sort_values(
            "event_type"
        ).reset_index(drop=True)[want.columns]
        for c in got.columns:
            assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), (cap, c)


def test_token_rarity_buckets_crafted(ray_session, tmp_path):
    """Hand-computed Zipf-rank buckets on a crafted corpus: ranks by
    (count desc, tok asc), cap at v_cap, unk=v_cap+1, integer bucket
    floor(8*sum_rank/(n_tokens*(v_cap+1))) clamped to 7."""
    import pyarrow.parquet as pq_

    from crawler_ray.queries import REGISTRY

    texts = ["a a a a", "x1 x2 x3 x4", "a b c c", "a x1 a x1"]
    # counts: a=7? -> a: 4+1+2=7, c=2, b=1, x1=3?? -> x1: 1+2=3
    # recount: doc1 a*4; doc2 x1,x2,x3,x4; doc3 a,b,c,c; doc4 a,x1,a,x1
    # a=7, x1=3, c=2, b=1, x2=x3=x4=1
    # v_cap=3 ranks: a=1, x1=2, c=3; unk=4 (b, x2..x4)
    d = str(tmp_path / "rar")
    os.makedirs(d, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * 4, type=pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = REGISTRY["token_rarity_buckets"].fn(d, v_cap=3).to_pandas()
    got = got.sort_values("bucket").reset_index(drop=True)
    # doc1: s=4,n=4 -> 32//16=2 ; doc2: s=2+4+4+4=14 -> 112//16=7
    # doc3: s=1+4+3+3=11 -> 88//16=5 ; doc4: s=1+2+1+2=6 -> 48//16=3
    assert list(got["bucket"]) == [2, 3, 5, 7]
    assert list(got["n_docs"]) == [1, 1, 1, 1]
    assert list(got["total_tokens"]) == [4, 4, 4, 4]
    assert set(got["lang"]) == {"en"}


def test_token_rarity_buckets_empty_docs(ray_session, tmp_path):
    """Zero-token docs (empty / whitespace text) anywhere in the batch
    must neither crash reduceat nor poison neighbouring sums; they land
    in bucket 0 with 0 tokens."""
    import pyarrow.parquet as pq_

    from crawler_ray.queries import REGISTRY

    texts = ["", "a a a a", " ", "a b", ""]
    d = str(tmp_path / "rar2")
    os.makedirs(d, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * 5, type=pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = (
        REGISTRY["token_rarity_buckets"].fn(d, v_cap=3)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # ranks: a=1 (count 5), b=2 (count 1); docs: "a a a a" s=4,n=4 ->
    # 32//16=2 ; "a b" s=3,n=2 -> 24//8=3 ; three empty docs -> bucket 0
    assert list(got["bucket"]) == [0, 2, 3]
    assert list(got["n_docs"]) == [3, 1, 1]
    assert list(got["total_tokens"]) == [0, 4, 2]


def test_host_quality_filter_whole_host_atomicity(ray_session, tmp_path):
    """The filter unit is the HOST: a stopword-rich doc on a spam host
    is dropped with its host; a stopword-poor doc on a good host is
    kept with its host."""
    import pyarrow.parquet as pq_

    from crawler_ray.queries import REGISTRY

    good = "the a of to and the a of to and"   # ratio 1.0
    bad = "zz yy xx ww vv uu tt ss rr qq"      # ratio 0.0
    texts  = [good, good, bad,   bad, bad, good]
    source = ["h1", "h1", "h1",  "h2", "h2", "h2"]
    # h1 ratio = 20/30 >= 0.065 -> kept (incl. its bad doc)
    # h2 ratio = 10/30 ... wait: h2 = bad,bad,good = 10 stop / 30 -> 0.33 kept too
    # make h2 truly spammy: all bad
    texts  = [good, good, bad,   bad, bad, bad]
    d = str(tmp_path / "hq")
    os.makedirs(d, exist_ok=True)
    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(6), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * 6, type=pa.string()),
                "source": pa.array(source, type=pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = REGISTRY["host_quality_filter"].fn(d).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    # h1 kept WITH its zero-stopword doc; h2 dropped entirely
    assert (r["kept_docs"], r["dropped_docs"]) == (3, 3)
    assert r["kept_tokens"] == 30


def test_boilerplate_removal_regimes_agree(ray_session):
    """Broadcast regime vs forced past-cap join regime must be
    row-identical; and unlike segment_dedup's first-wins, a
    boilerplate segment is removed from EVERY doc (even the min
    doc_id occurrence)."""
    from crawler_ray.queries import boilerplate_removal

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    bc = norm(boilerplate_removal(SF))
    jn = norm(boilerplate_removal(SF, boiler_broadcast_cap=0))
    assert len(bc) == len(jn) > 0
    for c in bc.columns:
        assert (bc[c].to_numpy() == jn[c].to_numpy()).all(), c
    assert bc["n_removed"].sum() > 0  # corpus has real per-source dups
    # all-docs removal: every boilerplate group loses ALL occurrences,
    # so removed-count per (source, seg) is >= min_docs — check via the
    # aggregate: total removed across the corpus must be even (each
    # group contributes >= 2 at min_docs=2 and synthetic dups are pairs)
    assert bc["n_removed"].sum() >= 2


def test_hll_estimate_within_standard_error(ray_session):
    """The HLL cardinality estimate derived from the oracle-pinned
    registers must land within ~3 standard errors (1.04/sqrt(64) ~ 13%)
    of the exact per-group distinct count."""
    import duckdb

    from crawler_ray.queries import hll_registers

    regs = hll_registers(SF).to_pandas()
    con = duckdb.connect()
    exact = con.execute(
        "SELECT event_type, count(DISTINCT user_id) AS nd "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY 1"
    ).df().set_index("event_type")["nd"]
    m = 64
    alpha = 0.709
    for et, g in regs.groupby("event_type"):
        # absent buckets have register 0
        r = np.zeros(m)
        r[g["bucket"].to_numpy()] = g["register"].to_numpy()
        est = alpha * m * m / np.sum(2.0 ** -r)
        if est <= 2.5 * m and (r == 0).any():  # small-range correction
            est = m * np.log(m / (r == 0).sum())
        nd = exact[et]
        assert abs(est - nd) / nd < 0.40, (et, est, nd)


def test_graph_random_walks_regimes_agree(ray_session):
    """Broadcast-frontier regime vs forced Dataset-join regime must
    emit identical (seed, step, node) walk rows; every seed walks
    n_steps (the synthetic graph has min out-degree >= 2 after
    self-loop removal, so no walk dies early)."""
    import pandas as pd

    from crawler_ray.queries import graph_random_walks

    def norm(r):
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        return df.sort_values(["seed", "step", "node"]).reset_index(drop=True)

    a = norm(graph_random_walks(SF))
    b = norm(graph_random_walks(SF, forced_regime="join"))
    pd.testing.assert_frame_equal(a, b)
    n_seeds = a[a["step"] == 0].shape[0]
    assert n_seeds > 0
    assert len(a) == n_seeds * 5  # 0..4 steps, no dead ends


def test_pmi_topk_regimes_agree(ray_session):
    """Broadcast unigram-table regime vs forced two-hash-join regime
    must produce the identical ranked top-k."""
    import pandas as pd

    from crawler_ray.queries import pmi_topk

    def norm(r):
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        return df.reset_index(drop=True)

    a = norm(pmi_topk(SF))
    b = norm(pmi_topk(SF, forced_regime="join"))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0 and (a["c_ab"] >= 2).all()
