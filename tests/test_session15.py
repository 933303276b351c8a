"""Session-15 operator invariants: span-integrity audit fires on
deliberately corrupted span columns, politeness schedule equals a
sequential per-host clock replay, budget apportionment sums exactly
and stays within one unit of the proportional share."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _docs() -> pa.Table:
    return pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )


def test_span_audit_clean_corpus_has_zero_violations(ray_session):
    from crawler_ray.queries import span_integrity_audit

    out = span_integrity_audit(SF).to_pandas()
    assert set(out["kind"]) <= {"text", "image", "audio", "video"}
    assert (out["n_nonmono"] == 0).all()
    # text spans tile each doc exactly: total text chars == sum(n_chars)
    docs = _docs()
    total = int(docs["n_chars"].to_numpy().sum())
    assert int(out.loc[out["kind"] == "text", "total_chars"].iloc[0]) == total
    # media spans carry no text
    med = out[out["kind"] != "text"]
    assert (med["total_chars"] == 0).all()


def test_span_audit_kernel_detects_corruption():
    """Feed the REAL measurement kernel a span column whose offsets were
    deliberately swapped inside one document — the monotonicity counter
    must fire (proves the audit measures, not merely re-derives)."""
    from crawler_ray.queries import _audit_spans, _build_span_column

    t = _build_span_column(_docs().slice(0, 8))
    spans = t["spans"].chunk(0) if t["spans"].num_chunks == 1 else t["spans"].combine_chunks()
    flat = spans.flatten()
    off = flat.field("offset").to_numpy().astype(np.int32).copy()
    offsets = spans.offsets.to_numpy()
    # first doc with >= 3 spans: reverse its span offsets
    for i in range(len(offsets) - 1):
        a, b = offsets[i], offsets[i + 1]
        if b - a >= 3:
            off[a:b] = off[a:b][::-1]
            break
    corrupted_struct = pa.StructArray.from_arrays(
        [flat.field("kind"), flat.field("text"), flat.field("media_ref"),
         pa.array(off, type=pa.int32())],
        names=["kind", "text", "media_ref", "offset"],
    )
    corrupted = pa.ListArray.from_arrays(spans.offsets, corrupted_struct)
    t2 = pa.table({"doc_id": t["doc_id"], "spans": corrupted})
    clean = _audit_spans(t)
    bad = _audit_spans(t2)
    assert int(clean["n_nonmono"].to_pandas().sum()) == 0
    assert int(bad["n_nonmono"].to_pandas().sum()) > 0
    # counts/docs unchanged by the corruption — only ordering fired
    assert bad["n_spans"].to_pandas().sum() == clean["n_spans"].to_pandas().sum()


def test_politeness_schedule_equals_sequential_clock(ray_session):
    from crawler_ray.queries import politeness_schedule

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id"]
    ).to_pandas()
    ev["tus"] = ev["ts"].astype("int64")
    ev["host"] = ev["user_id"].to_numpy().astype(np.int64) % 64
    ev["d"] = 50 + (ev["event_id"].to_numpy().astype(np.int64) % 97)
    ev = ev.sort_values(["host", "tus", "event_id"])

    # sequential reference: one politeness clock per host
    ref = {}
    for h, g in ev.groupby("host"):
        clock = 0
        waits = []
        for d in g["d"].to_numpy():
            waits.append(clock)  # fetch starts when the clock frees
            clock += int(d)
        ref[int(h)] = (len(waits), max(waits), sum(waits))

    out = politeness_schedule(SF).to_pandas().set_index("host")
    assert len(out) == len(ref)
    for h, (n, mk, tw) in ref.items():
        row = out.loc[h]
        assert int(row["n_urls"]) == n
        assert int(row["makespan_ms"]) == mk
        assert int(row["total_wait_ms"]) == tw


def test_budget_allocation_exact_sum_and_fairness(ray_session):
    from crawler_ray.queries import crawl_budget_allocation

    budget = 1_000_000
    out = crawl_budget_allocation(SF, budget=budget).to_pandas()
    assert int(out["quota"].sum()) == budget  # apportionment is EXACT
    c = out["n_pages"].to_numpy().astype(np.int64)
    q = out["quota"].to_numpy().astype(np.int64)
    total = int(c.sum())
    base = (budget * c) // total
    bonus = q - base
    # quota is the floor share plus at most one largest-remainder unit
    assert set(np.unique(bonus)) <= {0, 1}
    assert int(bonus.sum()) == budget - int(base.sum())
    # winners are exactly the largest remainders (ties -> smaller host)
    rem = (budget * c) % total
    host = out["host"].to_numpy().astype(np.int64)
    order = np.lexsort((host, -rem))
    expect = np.zeros(len(host), dtype=np.int64)
    expect[order[: int(bonus.sum())]] = 1
    assert (bonus == expect).all()


def test_myers_levenshtein_equals_dp_fuzz():
    import random

    from crawler_ray.functions.similarity import levenshtein

    def dp(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    rnd = random.Random(13)
    for _ in range(300):
        a = "".join(rnd.choice("abcz ") for _ in range(rnd.randint(0, 80)))
        b = "".join(rnd.choice("abcz ") for _ in range(rnd.randint(0, 80)))
        assert levenshtein(a, b) == dp(a, b)
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "") == 3
    assert levenshtein("", "abc") == 3


def test_edit_distance_neardup_finds_all_planted_pairs(ray_session):
    from crawler_ray.queries import edit_distance_neardup

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    planted = [int(i) for i in docs["doc_id"].to_numpy() if i % 10 == 0]
    out = edit_distance_neardup(SF)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    got = set(zip(df["id_a"].astype(int), df["id_b"].astype(int)))
    for i in planted:
        assert (i, i + 40_000_000) in got
    sub = df.set_index(["id_a", "id_b"])
    for i in planted:
        assert int(sub.loc[(i, i + 40_000_000), "dist"]) <= 4


def test_edit_distance_neardup_forced_regime_equality(ray_session):
    from crawler_ray.queries import edit_distance_neardup

    def norm(res):
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if not isinstance(df, pd.DataFrame):
            df = df.to_pandas()
        return (df.astype({"id_a": "int64", "id_b": "int64", "dist": "int64"})
                  .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    bcast = norm(edit_distance_neardup(SF))
    joined = norm(edit_distance_neardup(SF, verify_broadcast_cap=0))
    pd.testing.assert_frame_equal(bcast, joined)


def test_ngram_novelty_conservation_and_bounds(ray_session):
    from crawler_ray.queries import ngram_novelty

    out = ngram_novelty(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    # sequential reference
    all_grams = set()
    per_doc = {}
    for _, r in docs.sort_values("doc_id").iterrows():
        tk = r["text"].split(" ")
        gs = {" ".join(tk[j:j + 4]) for j in range(len(tk) - 3)}
        novel = len(gs - all_grams)
        all_grams |= gs
        per_doc[int(r["doc_id"])] = (len(gs), novel)
    assert len(out) == len(per_doc)
    for _, r in out.iterrows():
        n, nov = per_doc[int(r["doc_id"])]
        assert int(r["n_grams"]) == n
        assert int(r["n_novel"]) == nov
    # conservation: novel grams across docs partition the corpus vocab
    assert int(out["n_novel"].sum()) == len(all_grams)


def test_hits_equals_sequential_two_rounds(ray_session):
    from crawler_ray.queries import hits_scores

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    n_docs = docs.num_rows
    ids = docs["doc_id"].to_numpy().astype(np.int64)
    # sequential reference over the same deterministic link graph
    edges = set()
    for d in ids:
        for j in range(int(d % 5 + 3)):
            t = (d * 131 + j * 37 + j * j * 11 + 7) % n_docs
            if t != d:
                edges.add((int(d), int(t)))
    a1 = np.zeros(n_docs, dtype=np.int64)
    for s, t in edges:
        a1[t] += 1000
    h1 = np.zeros(n_docs, dtype=np.int64)
    for s, t in edges:
        h1[s] += a1[t]
    a2 = np.zeros(n_docs, dtype=np.int64)
    for s, t in edges:
        a2[t] += h1[s]

    out = hits_scores(SF).to_pandas().set_index("node")
    want = {v for v in range(n_docs) if h1[v] != 0 or a2[v] != 0}
    assert set(out.index) == want
    for v in want:
        assert int(out.loc[v, "hub"]) == int(h1[v])
        assert int(out.loc[v, "auth"]) == int(a2[v])


def test_semantic_decontamination_flags_scaled_plants(ray_session):
    from crawler_ray.queries import semantic_decontamination

    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])
    eids = [int(v) for v in emb["vec_id"].to_numpy() if v % 37 == 0]
    out = semantic_decontamination(SF).to_pandas()
    flagged = set(out["did"].astype(int))
    # every x2-scaled planted copy must be flagged — cosine is scale
    # invariant only if the verify cross-multiplies norms correctly
    for e in eids:
        assert e + 50_000_000 in flagged
    assert (out["n_hits"] >= 1).all()


def test_corpus_diversity_counts_all_pairs_including_disjoint(ray_session):
    from crawler_ray.queries import corpus_diversity

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    k = int(((docs["doc_id"].to_numpy() % 17 == 0)
             & (docs["doc_id"].to_numpy() < 1700)).sum())
    out = corpus_diversity(SF).to_pandas()
    assert int(out["n_pairs"].sum()) == k * (k - 1) // 2
    assert out["bucket"].between(0, 8).all()


def test_retrieval_eval_equals_bruteforce(ray_session):
    from crawler_ray.queries import retrieval_eval

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    probes = []
    for _, r in docs.iterrows():
        did = int(r["doc_id"])
        tk = r["text"].split(" ")
        if did % 23 == 0 and did < 2300 and len(tk) >= 15:
            probes.append((did, " ".join(tk[10:15])))
    n_hit, mrr = 0, 0
    for qid, phrase in probes:
        matches = [(d["text"].count(phrase), int(d["doc_id"]))
                   for _, d in docs.iterrows() if phrase in d["text"]]
        matches.sort(key=lambda t: (-t[0], t[1]))
        rank = next(i + 1 for i, (_, d) in enumerate(matches) if d == qid)
        if rank <= 10:
            n_hit += 1
            mrr += 1024 // rank
    out = retrieval_eval(SF).to_pandas().iloc[0]
    assert int(out["n_queries"]) == len(probes)
    assert int(out["n_hit_at_10"]) == n_hit
    assert int(out["mrr_q"]) == mrr


def test_recrawl_priority_equals_sequential_decay(ray_session):
    from crawler_ray.queries import recrawl_priority

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    tus = ev["ts"].astype("int64").to_numpy()
    mx = int(tus.max())
    host = ev["user_id"].to_numpy().astype(np.int64) % 64
    ref = {}
    for h, t in zip(host, tus):
        age = (mx - int(t)) // 86_400_000_000
        n, s = ref.get(int(h), (0, 0))
        ref[int(h)] = (n + 1, s + (1 << max(0, 9 - age)))
    out = recrawl_priority(SF).to_pandas().set_index("host")
    assert len(out) == len(ref)
    for h, (n, s) in ref.items():
        assert int(out.loc[h, "n_events"]) == n
        assert int(out.loc[h, "score"]) == s


def test_alias_resolution_equals_sequential_eight_hops(ray_session):
    from crawler_ray.queries import alias_resolution

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    n = docs.num_rows
    ids = docs["doc_id"].to_numpy().astype(np.int64)

    def f(v):
        return (v * 17 + 3) % n if v % 7 == 0 else v

    out = alias_resolution(SF).to_pandas().set_index("v")
    aliases = [int(v) for v in ids if v % 7 == 0]
    assert set(out.index) == set(aliases)
    for v in aliases:
        r = v
        for _ in range(8):  # f^8, cycles and all
            r = f(r)
        assert int(out.loc[v, "resolved"]) == r


def test_edge_reciprocity_equals_bruteforce(ray_session):
    from crawler_ray.queries import edge_reciprocity

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    n = docs.num_rows
    edges = set()
    for d in docs["doc_id"].to_numpy().astype(np.int64):
        for j in range(int(d % 5 + 3)):
            t = (d * 131 + j * 37 + j * j * 11 + 7) % n
            if t != d:
                edges.add((int(d), int(t)))
    recip = sum(1 for s, t in edges if (t, s) in edges)
    out = edge_reciprocity(SF).to_pandas().iloc[0]
    assert int(out["n_edges"]) == len(edges)
    assert int(out["n_reciprocal"]) == recip


def test_corpus_drift_equals_exact_l1(ray_session):
    from crawler_ray.queries import corpus_drift

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    from collections import Counter, defaultdict
    cnt = defaultdict(Counter)
    for _, r in docs.iterrows():
        cnt[r["source"]].update(r["text"].split(" "))
    sources = sorted(cnt)
    out = corpus_drift(SF).to_pandas().set_index(["sa", "sb"])
    assert len(out) == len(sources) * (len(sources) - 1) // 2
    import itertools
    for sa, sb in itertools.combinations(sources, 2):
        na = sum(cnt[sa].values())
        nb = sum(cnt[sb].values())
        vocab = set(cnt[sa]) | set(cnt[sb])
        dev = sum(abs(cnt[sa][w] * nb - cnt[sb][w] * na) for w in vocab)
        assert int(out.loc[(sa, sb), "drift_q"]) == (1024 * dev) // (na * nb)
    # self-drift sanity: a source against itself would be 0 (identity)
    sa = sources[0]
    na = sum(cnt[sa].values())
    assert sum(abs(cnt[sa][w] * na - cnt[sa][w] * na) for w in cnt[sa]) == 0


def test_host_burstiness_equals_sequential(ray_session):
    from crawler_ray.queries import host_burstiness

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_id"]).to_pandas()
    ev["tus"] = ev["ts"].astype("int64")
    ev["host"] = ev["user_id"].to_numpy().astype(np.int64) % 64
    ref = {}
    for h, g in ev.sort_values(["host", "tus", "event_id"]).groupby("host"):
        t = g["tus"].to_numpy()
        d = [(int(t[i]) - int(t[i - 1])) // 1_000_000 for i in range(1, len(t))]
        if d and sum(d) > 0:
            n, sd, sdd = len(d), sum(d), sum(x * x for x in d)
            ref[int(h)] = (n, (1024 * n * sdd) // (sd * sd))
    out = host_burstiness(SF).to_pandas().set_index("host")
    assert len(out) == len(ref)
    for h, (n, cv) in ref.items():
        assert int(out.loc[h, "n_gaps"]) == n
        assert int(out.loc[h, "cv2_q"]) == cv


def test_weak_label_vote_equals_sequential(ray_session):
    from crawler_ray.queries import weak_label_vote

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    ref = {}
    for _, r in docs.iterrows():
        tk = r["text"].split(" ")
        def sgn(a, b):
            return (tk.count(a) > tk.count(b)) - (tk.count(a) < tk.count(b))
        r1, r2, r3 = sgn("fast", "slow"), sgn("big", "small"), sgn("batch", "row")
        v = (r1 + r2 + r3 > 0) - (r1 + r2 + r3 < 0)
        unan = r1 != 0 and r1 == r2 and r2 == r3
        p, ng, ab, un = ref.get(r["lang"], (0, 0, 0, 0))
        ref[r["lang"]] = (p + (v == 1), ng + (v == -1), ab + (v == 0),
                          un + bool(unan))
    out = weak_label_vote(SF).to_pandas().set_index("lang")
    assert len(out) == len(ref)
    for lang, (p, ng, ab, un) in ref.items():
        row = out.loc[lang]
        assert (int(row["n_pos"]), int(row["n_neg"]),
                int(row["n_abstain"]), int(row["n_unanimous"])) == (p, ng, ab, un)


def test_calibration_bins_partition_and_bounds(ray_session):
    from crawler_ray.queries import calibration_bins

    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["label"])
    out = calibration_bins(SF).to_pandas()
    assert int(out["n"].sum()) == emb.num_rows          # bins partition
    assert (out["n_pos"] <= out["n"]).all()             # rates bounded
    assert out["bin"].between(0, 7).all()
    n_pos_total = int((emb["label"].to_numpy() == 0).sum())
    assert int(out["n_pos"].sum()) == n_pos_total       # positives conserved
