"""Session-17 operator invariants: the Q21/Q17/Q7/Q22 relational
shapes equal brute-force pandas replications of their semantics."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

GRACE_US = 60 * 86400 * 1_000_000


def _t(name, cols=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=cols).to_pandas()


def _cents(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 100 + 0.5).astype(np.int64)


def test_waiting_suppliers_equals_bruteforce(ray_session):
    from crawler_ray.queries import waiting_suppliers

    out = waiting_suppliers(SF)

    li = _t("lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _t("orders", ["o_orderkey", "o_orderdate", "o_orderstatus"])
    orders = orders[orders["o_orderstatus"] == "F"]
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    m["late"] = (
        m["l_shipdate"].astype("int64").to_numpy()
        > m["o_orderdate"].astype("int64").to_numpy() + GRACE_US
    ).astype(np.int64)
    per = m.groupby(["l_orderkey", "l_suppkey"], as_index=False)["late"].max()
    g = per.groupby("l_orderkey")["late"].agg(["size", "sum"])
    ok = set(g[(g["size"] >= 2) & (g["sum"] == 1)].index)
    win = per[(per["late"] == 1) & per["l_orderkey"].isin(ok)]
    ref = win.groupby("l_suppkey").size()
    got = dict(zip(out["s_suppkey"].astype(int), out["numwait"].astype(int)))
    assert got == {int(k): int(v) for k, v in ref.items()}
    # descending numwait, name ascending tie-break
    nw = out["numwait"].to_numpy()
    assert (nw[:-1] >= nw[1:]).all()


def test_small_qty_revenue_equals_bruteforce(ray_session):
    from crawler_ray.queries import small_qty_revenue

    out = small_qty_revenue(SF)
    li = _t("lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    qc = _cents(li["l_quantity"])
    epc = _cents(li["l_extendedprice"])
    g = pd.DataFrame({"pk": li["l_partkey"].to_numpy(), "qc": qc, "epc": epc})
    st = g.groupby("pk")["qc"].agg(["size", "sum"])
    cnt = g["pk"].map(st["size"]).to_numpy().astype(np.int64)
    sq = g["pk"].map(st["sum"]).to_numpy().astype(np.int64)
    keep = qc * 5 * cnt < sq
    assert int(out["n_items"].iloc[0]) == int(keep.sum())
    assert int(out["revenue_cents"].iloc[0]) == int(epc[keep].sum())


def test_nation_trade_volume_equals_bruteforce(ray_session):
    from crawler_ray.queries import nation_trade_volume

    out = nation_trade_volume(SF)
    li = _t("lineitem")
    orders = _t("orders", ["o_orderkey", "o_custkey"])
    cust = _t("customer", ["c_custkey", "c_nationkey"])
    supp = _t("supplier", ["s_suppkey", "s_nationkey"])
    nat = _t("nation", ["n_nationkey", "n_name"])
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    m = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    m = m[m["c_nationkey"] != m["s_nationkey"]]
    rev = _cents(m["l_extendedprice"].to_numpy()
                 * (1 - m["l_discount"].to_numpy()))
    ref = pd.DataFrame({
        "sn": m["s_nationkey"].to_numpy(), "cn": m["c_nationkey"].to_numpy(),
        "yr": m["l_shipdate"].dt.year.to_numpy(), "rev": rev,
    }).groupby(["sn", "cn", "yr"])["rev"].sum()
    got = {(r["supp_nation"], r["cust_nation"], int(r["l_year"])):
           int(r["revenue_cents"]) for _, r in out.iterrows()}
    assert len(got) == len(ref)
    for (sn, cn, yr), v in ref.items():
        assert got[(nmap[int(sn)], nmap[int(cn)], int(yr))] == int(v)


def test_idle_customer_balance_equals_bruteforce(ray_session):
    from crawler_ray.queries import idle_customer_balance

    out = idle_customer_balance(SF)
    out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    cust = _t("customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    orders = _t("orders", ["o_custkey", "o_orderpriority"])
    bal = _cents(cust["c_acctbal"])
    pos = bal[cust["c_acctbal"].to_numpy() > 0]
    c, s = len(pos), int(pos.sum())
    cand = cust[bal * c > s].copy()
    cand["bal"] = bal[bal * c > s]
    urgent = set(orders.loc[orders["o_orderpriority"] == "1-URGENT",
                            "o_custkey"].astype(int))
    idle = cand[~cand["c_custkey"].astype(int).isin(urgent)]
    ref = idle.groupby("c_nationkey")["bal"].agg(["size", "sum"])
    assert len(out) == len(ref)
    for nk, r in ref.iterrows():
        row = out[out["nationkey"] == int(nk)].iloc[0]
        assert int(row["n_cust"]) == int(r["size"])
        assert int(row["total_bal_cents"]) == int(r["sum"])
    # threshold is strict: every idle candidate is strictly above average
    assert (idle["bal"].to_numpy() * c > s).all()


def test_top_supplier_revenue_equals_bruteforce(ray_session):
    from crawler_ray.queries import top_supplier_revenue

    out = top_supplier_revenue(SF)
    li = _t("lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice",
                         "l_discount"])
    w = li[(li["l_shipdate"] >= pd.Timestamp("1996-01-01"))
           & (li["l_shipdate"] < pd.Timestamp("1996-04-01"))]
    rev = _cents(w["l_extendedprice"].to_numpy()
                 * (1 - w["l_discount"].to_numpy()))
    per = pd.DataFrame({"sk": w["l_suppkey"].to_numpy(), "rev": rev}
                       ).groupby("sk")["rev"].sum()
    mx = per.max()
    winners = sorted(int(k) for k, v in per.items() if v == mx)
    assert list(out["s_suppkey"].astype(int)) == winners
    assert (out["total_revenue_cents"].astype(int) == int(mx)).all()


def _session17_edges(augment_strides):
    docs = _t("documents", ["doc_id"])
    n = len(docs)
    ids = docs["doc_id"].to_numpy().astype(np.int64)
    kk = ids % 5 + 3
    src = np.repeat(ids, kk)
    j = np.arange(len(src)) - np.repeat(np.cumsum(kk) - kk, kk)
    tgt = (src * 131 + j * 37 + j * j * 11 + 7) % n
    if augment_strides:
        src = np.concatenate([src, ids, ids])
        tgt = np.concatenate([tgt, (ids + 50) % n, (ids + 100) % n])
    keep = src != tgt
    lo = np.minimum(src[keep], tgt[keep])
    hi = np.maximum(src[keep], tgt[keep])
    return n, set(zip(lo.tolist(), hi.tolist()))


def test_clustering_coefficient_equals_bruteforce(ray_session):
    from crawler_ray.queries import clustering_coefficient

    out = clustering_coefficient(SF).to_pandas()
    n, edges = _session17_edges(augment_strides=True)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hist = {}
    for u, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        nbl = sorted(nb)
        tri = sum(1 for i, x in enumerate(nbl) for y in nbl[i + 1:]
                  if (min(x, y), max(x, y)) in edges)
        ccq = (2048 * tri) // (d * (d - 1))
        hist[ccq] = hist.get(ccq, 0) + 1
    got = dict(zip(out["ccq"].astype(int), out["n_nodes"].astype(int)))
    assert got == hist
    assert max(hist) <= 1024  # cc <= 1 quantized


def test_degree_assortativity_matches_float_pearson(ray_session):
    from crawler_ray.queries import degree_assortativity

    out = degree_assortativity(SF)
    n, edges = _session17_edges(augment_strides=False)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    dx = np.array([deg[a] for a, b in edges] + [deg[b] for a, b in edges],
                  dtype=np.float64)
    dy = np.array([deg[b] for a, b in edges] + [deg[a] for a, b in edges],
                  dtype=np.float64)
    r = np.corrcoef(dx, dy)[0, 1]
    assert int(out["n_edges"].iloc[0]) == len(edges)
    # quantized integer ratio tracks the float Pearson within 1/1024 + fp slop
    assert abs(int(out["r_q"].iloc[0]) / 1024 - r) < 2e-3


def test_cusum_equals_sequential_recurrence(ray_session):
    from crawler_ray.queries import cusum_change_points

    out = cusum_change_points(SF).to_pandas()
    ev = _t("events", ["user_id", "ts"])
    host = ev["user_id"].to_numpy().astype(np.int64) % 64
    day = ev["ts"].astype("int64").to_numpy() // 86400000000
    c = (pd.DataFrame({"host": host, "day": day})
         .groupby(["host", "day"]).size().rename("x").reset_index())
    ref = {}
    for h, g in c.groupby("host"):
        g = g.sort_values("day")
        k = int(g["x"].sum()) // len(g)
        s, smax, peak = 0, 0, int(g["day"].iloc[0])
        first = True
        for _, row in g.iterrows():
            s = max(0, s + int(row["x"]) - k)
            if first or s > smax:
                smax, peak, first = s, int(row["day"]), False
        ref[int(h)] = (smax, peak)
    got = {int(r["host"]): (int(r["s_max"]), int(r["peak_day"]))
           for _, r in out.iterrows()}
    assert got == ref


def test_late_event_audit_equals_sequential_watermark(ray_session):
    from crawler_ray.queries import late_event_audit

    out = late_event_audit(SF).to_pandas()
    ev = _t("events", ["event_id", "ts", "user_id"])
    HOUR = 3_600_000_000
    tus = ev["ts"].astype("int64").to_numpy()
    eid = ev["event_id"].to_numpy().astype(np.int64)
    host = ev["user_id"].to_numpy().astype(np.int64) % 64
    arr = tus + (eid % 7) * HOUR
    order = np.lexsort((eid, arr))
    ref = {}
    wm = None
    for i in order:
        if wm is not None and wm - tus[i] > HOUR:
            h = int(host[i])
            n, mx = ref.get(h, (0, 0))
            ref[h] = (n + 1, max(mx, int(wm - tus[i])))
        wm = int(tus[i]) if wm is None else max(wm, int(tus[i]))
    got = {int(r["host"]): (int(r["n_late"]), int(r["max_late_us"]))
           for _, r in out.iterrows()}
    assert got == ref
    assert len(ref) > 0  # the delay model produces real late events


def test_zipf_slope_equals_bruteforce_and_is_negative(ray_session):
    from crawler_ray.queries import zipf_slope

    out = zipf_slope(SF).to_pandas()
    docs = _t("documents", ["source", "text"])
    ref = {}
    for src, g in docs.groupby("source"):
        from collections import Counter
        c = Counter()
        for txt in g["text"]:
            c.update(txt.split(" "))
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:64]
        k = len(top)
        lr = [r.bit_length() - 1 for r in range(1, k + 1)]
        lf = [f.bit_length() - 1 for _, f in top]
        sl, sf2 = sum(lr), sum(lf)
        slf = sum(a * b for a, b in zip(lr, lf))
        sl2 = sum(a * a for a in lr)
        num = 1024 * (k * slf - sl * sf2)
        den = k * sl2 - sl * sl
        q = abs(num) // den
        ref[src] = (k, q if num >= 0 else -q)
    got = {r["source"]: (int(r["k"]), int(r["slope_q"]))
           for _, r in out.iterrows()}
    assert got == ref
    # rank-frequency curves never slope upward; most sources decay
    assert all(s <= 0 for _, s in ref.values())
    assert any(s < 0 for _, s in ref.values())


def test_ks_length_drift_equals_bruteforce(ray_session):
    from crawler_ray.queries import ks_length_drift

    out = ks_length_drift(SF)
    docs = _t("documents", ["source", "text"])
    v = docs["text"].str.len().to_numpy().astype(np.int64) // 16
    by_src = {s: np.sort(v[docs["source"].to_numpy() == s])
              for s in np.unique(docs["source"])}
    grid = np.sort(np.unique(v))
    ref = {}
    for a in by_src:
        for b in by_src:
            if a >= b:
                continue
            ca = np.searchsorted(by_src[a], grid, side="right")
            cb = np.searchsorted(by_src[b], grid, side="right")
            na, nb = len(by_src[a]), len(by_src[b])
            d = int(np.abs(ca * nb - cb * na).max())
            ref[(a, b)] = (1024 * d) // (na * nb)
    top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [((r["src_a"], r["src_b"]), int(r["ks_q"]))
           for _, r in out.iterrows()]
    assert got == top


def test_market_share_equals_bruteforce(ray_session):
    from crawler_ray.queries import market_share

    out = market_share(SF)
    li = _t("lineitem")
    orders = _t("orders", ["o_orderkey", "o_custkey"])
    cust = _t("customer", ["c_custkey", "c_nationkey"])
    supp = _t("supplier", ["s_suppkey", "s_nationkey"])
    nat = _t("nation")
    reg = _t("region")
    rk = int(reg.loc[reg["r_name"] == "AMERICA", "r_regionkey"].iloc[0])
    nk = set(nat.loc[nat["n_regionkey"] == rk, "n_nationkey"].astype(int))
    tgt = int(nat.loc[nat["n_name"] == "NATION_1", "n_nationkey"].iloc[0])
    m = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(supp, left_on="l_suppkey", right_on="s_suppkey"))
    m = m[m["c_nationkey"].isin(nk)]
    rev = _cents(m["l_extendedprice"].to_numpy()
                 * (1 - m["l_discount"].to_numpy()))
    yr = m["l_shipdate"].dt.year.to_numpy()
    is_t = (m["s_nationkey"].to_numpy() == tgt)
    ref = pd.DataFrame({"yr": yr, "rev": rev, "t": rev * is_t}
                       ).groupby("yr")[["t", "rev"]].sum()
    assert len(out) == len(ref)
    for _, r in out.iterrows():
        rr = ref.loc[int(r["l_year"])]
        assert int(r["target_cents"]) == int(rr["t"])
        assert int(r["total_cents"]) == int(rr["rev"])
        assert int(r["share_permille"]) == (1000 * int(rr["t"])) // int(rr["rev"])


def test_power_iteration_matches_numpy_eigvec(ray_session):
    from crawler_ray.queries import power_iteration_embed

    out = power_iteration_embed(SF)
    emb = _t("embeddings", ["embedding"])
    M = np.stack(emb["embedding"].to_numpy())
    Q = np.floor(M.astype(np.float64) * 1024)
    G = Q.T @ Q
    # two power rounds from ones, float reference
    v2 = G @ (G @ np.ones(64))
    vq = out["v_q"].to_numpy().astype(np.float64)
    # direction agreement with the exact integer result: cosine ~ 1
    # (quantization to 1/1024 of max|component| bounds the error)
    cos = (v2 @ vq) / (np.linalg.norm(v2) * np.linalg.norm(vq))
    assert cos > 0.99999
    assert int(np.abs(out["v_q"].to_numpy()).max()) == 1024
    # power iteration on a PSD Gram matrix: the Rayleigh quotient is
    # non-decreasing along the iterates (ones -> G*1 -> G^2*1)
    def rq(v):
        return (v @ G @ v) / (v @ v)
    v0 = np.ones(64)
    v1 = G @ v0
    assert rq(v1) >= rq(v0) * (1 - 1e-12)
    assert rq(v2) >= rq(v1) * (1 - 1e-12)
