"""Session-13 operator invariants: skyline merge exactness, debounce vs
sequential rule, tie-aware Spearman vs a direct reference, gap-fill
density, winsorize thresholds vs explicit rank definition."""

import numpy as np
import pandas as pd

from crawler_ray.queries import _pareto_skyline_df


def _brute_skyline(df: pd.DataFrame) -> set[int]:
    keys = set()
    price = df["price_c"].to_numpy()
    size = df["p_size"].to_numpy()
    pk = df["p_partkey"].to_numpy()
    for i in range(len(df)):
        dominated = (
            (price <= price[i])
            & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))
        ).any()
        if not dominated:
            keys.add(int(pk[i]))
    return keys


def test_skyline_of_skylines_equals_global():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 400
        df = pd.DataFrame(
            {
                "p_partkey": np.arange(n, dtype=np.int64),
                # small value ranges force heavy ties (the hard case)
                "p_size": rng.integers(0, 12, n).astype(np.int64),
                "price_c": rng.integers(0, 25, n).astype(np.int64),
            }
        )
        want = _brute_skyline(df)
        # global kernel alone
        got_global = set(_pareto_skyline_df(df)["p_partkey"].tolist())
        assert got_global == want
        # skyline-of-skylines over random chunking
        parts = np.array_split(df.sample(frac=1, random_state=trial), 7)
        merged = pd.concat([_pareto_skyline_df(p) for p in parts])
        got_merged = set(_pareto_skyline_df(merged)["p_partkey"].tolist())
        assert got_merged == want


def test_skyline_keeps_duplicate_frontier_points():
    df = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4],
            "p_size": [10, 10, 5, 10],
            "price_c": [100, 100, 100, 200],
        }
    )
    # identical frontier points (1,2) both survive; 3 dominated by 1;
    # 4 dominated by 1 (same size, cheaper).
    assert set(_pareto_skyline_df(df)["p_partkey"].tolist()) == {1, 2}


def test_debounce_matches_sequential_rule(ray_session):
    from crawler_ray.queries import event_debounce

    sf = "/root/testdata/sf0.001"
    got = (
        event_debounce(sf)
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )

    import pyarrow.parquet as pq

    t = pq.read_table(sf + "/events.parquet",
                      columns=["user_id", "event_type", "ts", "event_id"])
    df = t.to_pandas()
    df["us"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "event_type", "us", "event_id"])
    rows = {}
    prev = {}
    W = 86_400_000_000
    for u, e, us in zip(df["user_id"], df["event_type"], df["us"]):
        k = (u, e)
        kept, dropped = rows.get(k, (0, 0))
        if k in prev and us - prev[k] <= W:
            dropped += 1
        else:
            kept += 1
        prev[k] = us  # lag semantics: previous OCCURRENCE, kept or not
        rows[k] = (kept, dropped)
    want = pd.DataFrame(
        [(u, e, k, d) for (u, e), (k, d) in sorted(rows.items())],
        columns=["user_id", "event_type", "kept", "dropped"],
    )
    pd.testing.assert_frame_equal(
        got.astype({"kept": "int64", "dropped": "int64"}), want
    )


def test_rank_agreement_matches_direct_spearman(ray_session):
    from crawler_ray.queries import rank_agreement

    sf = "/root/testdata/sf0.001"
    got = rank_agreement(sf).to_pandas().set_index("p_brand")

    import pyarrow.parquet as pq

    df = pq.read_table(
        sf + "/part.parquet", columns=["p_brand", "p_size", "p_retailprice"]
    ).to_pandas()
    df["y"] = np.floor(df["p_retailprice"] * 100 + 0.5).astype(np.int64)
    for brand, g in df.groupby("p_brand"):
        n = len(g)
        if n < 2:
            assert brand not in got.index
            continue

        def dbl_avg_rank(v):
            v = np.asarray(v)
            order = np.argsort(v, kind="stable")
            r = np.empty(n, dtype=np.int64)
            # doubled average rank: 2*min_rank + ties - 1
            sv = v[order]
            out = np.empty(n, dtype=np.int64)
            i = 0
            while i < n:
                j = i
                while j < n and sv[j] == sv[i]:
                    j += 1
                out[i:j] = 2 * (i + 1) + (j - i) - 1
                i = j
            r[order] = out
            return r

        dx = dbl_avg_rank(g["p_size"].to_numpy())
        dy = dbl_avg_rank(g["y"].to_numpy())
        d2x4 = int(((dx - dy) ** 2).sum())
        rho_q = 1024 - (1536 * d2x4) // (n * (n * n - 1))
        row = got.loc[brand]
        assert int(row["n"]) == n
        assert int(row["d2x4"]) == d2x4
        assert int(row["rho_q"]) == rho_q


def test_gapfill_is_dense_and_count_preserving(ray_session):
    from crawler_ray.queries import timeseries_gapfill

    sf = "/root/testdata/sf0.001"
    got = timeseries_gapfill(sf).to_pandas()

    import pyarrow.parquet as pq

    ev = pq.read_table(sf + "/events.parquet", columns=["user_id", "ts"]).to_pandas()
    assert got["n"].sum() == len(ev)  # zero rows add nothing
    for u, g in got.groupby("user_id"):
        days = np.sort(g["day"].to_numpy())
        assert (np.diff(days) == 1).all()  # dense grid, no holes
        assert g.iloc[0]["n"] >= 0
        # boundary days are observed (min/max are real activity days)
        assert g.loc[g["day"] == days[0], "n"].iloc[0] > 0
        assert g.loc[g["day"] == days[-1], "n"].iloc[0] > 0


def test_winsorize_bounds_are_exact_rank_stats(ray_session):
    from crawler_ray.queries import winsorized_stats

    sf = "/root/testdata/sf0.001"
    got = winsorized_stats(sf).to_pandas().set_index("lang")

    import pyarrow.parquet as pq

    df = pq.read_table(sf + "/documents.parquet", columns=["lang", "n_chars"]).to_pandas()
    for lang, g in df.groupby("lang"):
        v = np.sort(g["n_chars"].to_numpy())
        n = len(v)
        lo = v[(n + 19) // 20 - 1]
        hi = v[(19 * n + 19) // 20 - 1]
        clipped = np.clip(g["n_chars"].to_numpy(), lo, hi)
        row = got.loc[lang]
        assert int(row["clipped_sum"]) == int(clipped.sum())
        assert int(row["n_clipped"]) == int(
            ((g["n_chars"] < lo) | (g["n_chars"] > hi)).sum()
        )


def test_two_hop_reach_matches_sequential_bfs(ray_session):
    from crawler_ray.queries import two_hop_reach

    sf = "/root/testdata/sf0.001"
    got = two_hop_reach(sf).to_pandas().set_index("node").sort_index()

    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(sf + "/documents.parquet").num_rows
    adj = {}
    for did in range(n_docs):
        k = did % 5 + 3
        tgts = {(did * 131 + j * 37 + j * j * 11 + 7) % n_docs for j in range(k)}
        tgts.discard(did)
        adj[did] = tgts
    for node in range(n_docs):
        n1set = adj[node]
        n2set = set()
        for mid in n1set:
            if len(adj[mid]) <= 64:
                n2set |= adj[mid]
        n2set -= n1set
        n2set.discard(node)
        row = got.loc[node]
        assert int(row["n1"]) == len(n1set)
        assert int(row["n2"]) == len(n2set)
        assert int(row["harmonic_q"]) == 1024 * len(n1set) + 512 * len(n2set)


def test_colbert_maxsim_matches_brute_numpy(ray_session):
    from crawler_ray.queries import colbert_maxsim
    from crawler_ray.stages.ann import list_col_to_matrix
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = colbert_maxsim(sf).to_pandas().set_index(["qlabel", "dlabel"])

    emb = pq.read_table(sf + "/embeddings.parquet")
    vid = emb["vec_id"].to_numpy()
    lab = emb["label"].to_numpy().astype(np.int64)
    M = np.floor(list_col_to_matrix(emb["embedding"]).astype(np.float64) * 1024.0
                 ).astype(np.int64)
    qm = vid % 37 == 0
    dots = M[qm] @ M.T  # Q x N
    qlab = lab[qm]
    for ql in np.unique(qlab):
        for dl in np.unique(lab):
            sub = dots[np.ix_(qlab == ql, lab == dl)]
            want = int(sub.max(axis=1).sum())
            assert int(got.loc[(ql, dl), "score"]) == want


def test_cdc_merge_matches_sequential_replay(ray_session):
    from crawler_ray.queries import cdc_upsert_merge
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = (
        cdc_upsert_merge(sf)
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    df = pq.read_table(sf + "/events.parquet").to_pandas()
    df["us"] = df["ts"].astype("int64")
    df = df.sort_values(["us", "event_id"])  # log order
    state = {}
    for _, r in df.iterrows():
        k = (r["user_id"], r["event_type"])
        if r["event_id"] % 10 == 0:
            state.pop(k, None)
        else:
            state[k] = int(np.floor(r["value"] * 100 + 0.5))
    want = pd.DataFrame(
        [(u, e, v) for (u, e), v in sorted(state.items())],
        columns=["user_id", "event_type", "value_c"],
    )
    pd.testing.assert_frame_equal(got, want)


def test_media_layout_dedup_groups_are_real_layouts(ray_session):
    from crawler_ray.queries import media_layout_dedup
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = media_layout_dedup(sf).to_pandas()
    n_docs = pq.read_metadata(sf + "/documents.parquet").num_rows
    assert got["n_docs"].sum() == n_docs  # partition of the corpus
    # keeper belongs to its own group: recompute its signature
    docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    nc = dict(zip(docs["doc_id"], docs["n_chars"]))
    kinds = ["image", "audio", "video"]
    for _, r in got.iterrows():
        did = int(r["keeper"])
        k = (nc[did] + 63) // 64
        sig = ",".join(
            kinds[(did + j) % 3] for j in range(k) if (did * 31 + j) % 5 == 0
        )
        assert sig == r["msig"]


def test_basket_rules_quotients_are_exact(ray_session):
    from crawler_ray.queries import basket_rules
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = basket_rules(sf).to_pandas()
    li = pq.read_table(sf + "/lineitem.parquet", columns=["l_orderkey", "l_partkey"]).to_pandas()
    part = pq.read_table(sf + "/part.parquet", columns=["p_partkey", "p_brand"]).to_pandas()
    li = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    li = li[["l_orderkey", "p_brand"]].drop_duplicates()
    n = li["l_orderkey"].nunique()
    ca = li.groupby("p_brand").size().to_dict()
    pairs = li.merge(li, on="l_orderkey")
    pairs = pairs[pairs["p_brand_x"] != pairs["p_brand_y"]]
    pc = pairs.groupby(["p_brand_x", "p_brand_y"]).size()
    assert len(got) > 0
    for _, r in got.iterrows():
        sup = int(pc.loc[(r["antecedent"], r["consequent"])])
        assert sup == int(r["support"]) and sup >= 5
        assert int(r["conf_q"]) == (sup * 1024) // ca[r["antecedent"]]
        assert int(r["lift_q"]) == (sup * n * 1024) // (
            ca[r["antecedent"]] * ca[r["consequent"]]
        )
    # every qualifying pair is present (no silent cap)
    assert len(got) == int((pc >= 5).sum())


def test_dup_size_histogram_partitions_corpus(ray_session):
    from crawler_ray.queries import dup_size_histogram
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = dup_size_histogram(sf).to_pandas()
    n_docs = pq.read_metadata(sf + "/documents.parquet").num_rows
    assert (got["sz"] * got["n_clusters"]).sum() == n_docs
    assert (got["sz"] >= 1).all()


def test_personalized_pagerank_matches_sequential(ray_session):
    from crawler_ray.queries import personalized_pagerank
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = personalized_pagerank(sf).to_pandas().set_index("node")["r"].to_dict()

    n_docs = pq.read_metadata(sf + "/documents.parquet").num_rows
    adj = {}
    for did in range(n_docs):
        k = did % 5 + 3
        tgts = {(did * 131 + j * 37 + j * j * 11 + 7) % n_docs for j in range(k)}
        tgts.discard(did)
        adj[did] = sorted(tgts)
    seeds = set(range(0, n_docs, 97))
    r = {v: 1_000_000 for v in seeds}
    for _ in range(2):
        inflow = {}
        for v, s in r.items():
            if s > 0 and adj[v]:
                c = s // len(adj[v])
                for t in adj[v]:
                    inflow[t] = inflow.get(t, 0) + c
        nxt = {v: (85 * i) // 100 for v, i in inflow.items()}
        for v in seeds:
            nxt[v] = nxt.get(v, 0) + 150_000
        r = {v: s for v, s in nxt.items() if s > 0}
    assert got == r
    # seeds always retain restart mass
    for v in seeds:
        assert got[v] >= 150_000


def test_growth_accounting_invariants(ray_session):
    from crawler_ray.queries import growth_accounting
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = growth_accounting(sf).to_pandas().sort_values("day").reset_index(drop=True)
    ev = pq.read_table(sf + "/events.parquet", columns=["user_id", "ts"]).to_pandas()
    total_users = ev["user_id"].nunique()
    assert got["new_users"].sum() == total_users
    assert got["cum_users"].iloc[-1] == total_users
    assert (got["cum_users"].diff().fillna(got["cum_users"].iloc[0]) ==
            got["new_users"]).all()
    assert (got["dau"] >= got["new_users"]).all()


def test_jsonl_shards_roundtrip_and_are_idempotent(ray_session, tmp_path):
    import gzip
    from crawler_ray.sources.jsonl import (
        parse_jsonl_bytes, read_jsonl_dataset, write_jsonl_corpus,
    )
    import ray.data as rd

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ['he said "hi"\nthen left', "naïve café ☕", "plain"],
            "lang": ["en", "fr", "en"],
        }
    )
    out = tmp_path / "shards"
    out.mkdir()
    stats = write_jsonl_corpus(rd.from_pandas(df), str(out)).to_pandas()
    assert stats["n_records"].sum() == 3
    files1 = sorted(p.name for p in out.iterdir())
    # idempotent: same content -> same content-hashed names
    write_jsonl_corpus(rd.from_pandas(df), str(out)).to_pandas()
    assert sorted(p.name for p in out.iterdir()) == files1

    back = read_jsonl_dataset(str(out)).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True)[["doc_id", "text", "lang"]], df
    )

    # corruption: truncated gzip raises, never a silent partial shard
    shard = next(out.iterdir())
    data = shard.read_bytes()
    try:
        parse_jsonl_bytes(data[: len(data) // 2])
        raised = False
    except Exception:
        raised = True
    assert raised
