"""Session-16 operator invariants: the multi-join TPC-H shapes
(Q5/Q18/Q4) equal brute-force pandas replications of their join
semantics, and JSON props extraction equals a per-row json.loads
replay."""

import json

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _t(name, cols=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=cols).to_pandas()


def test_regional_volume_equals_bruteforce(ray_session):
    from crawler_ray.queries import regional_volume

    out = regional_volume(SF).to_pandas().set_index("n_name")

    reg = _t("region")
    nat = _t("nation")
    cust = _t("customer")
    supp = _t("supplier")
    orders = _t("orders")
    li = _t("lineitem")
    rk = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    nk = set(nat.loc[nat["n_regionkey"] == rk, "n_nationkey"].astype(int))
    nk_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    c = cust[cust["c_nationkey"].isin(nk)]
    s = supp[supp["s_nationkey"].isin(nk)]
    o = orders[(orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
               & (orders["o_orderdate"] < pd.Timestamp("1999-01-01"))]
    m = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    m["rev"] = np.floor(
        m["l_extendedprice"].to_numpy()
        * (1 - m["l_discount"].to_numpy()) * 100 + 0.5).astype(np.int64)
    ref = m.groupby("c_nationkey")["rev"].sum()
    assert len(out) == len(ref)
    for nkey, rev in ref.items():
        assert int(out.loc[nk_name[int(nkey)], "revenue_cents"]) == int(rev)


def test_large_order_customers_winners_and_order(ray_session):
    from crawler_ray.queries import large_order_customers

    out = large_order_customers(SF)
    li = _t("lineitem", ["l_orderkey", "l_quantity"])
    li["q"] = np.floor(li["l_quantity"].to_numpy() * 100 + 0.5).astype(np.int64)
    sums = li.groupby("l_orderkey")["q"].sum()
    winners = sums[sums > 25000]
    assert len(out) == min(20, len(winners))
    # every returned order is a true winner with the exact qty sum
    for _, r in out.iterrows():
        assert int(winners.loc[int(r["o_orderkey"])]) == int(r["qty_q"])
    # ordering: qty desc, orderkey asc on ties
    q = out["qty_q"].to_numpy()
    assert (q[:-1] >= q[1:]).all()
    ok = out["o_orderkey"].to_numpy()
    ties = q[:-1] == q[1:]
    assert (ok[:-1][ties] < ok[1:][ties]).all()
    # order/customer enrichment is faithful
    orders = _t("orders").set_index("o_orderkey")
    cust = _t("customer").set_index("c_custkey")
    for _, r in out.iterrows():
        orow = orders.loc[int(r["o_orderkey"])]
        assert int(orow["o_custkey"]) == int(r["c_custkey"])
        assert cust.loc[int(r["c_custkey"]), "c_name"] == r["c_name"]
        assert int(np.floor(orow["o_totalprice"] * 100 + 0.5)) == int(
            r["totalprice_cents"])


def test_late_shipment_priority_equals_sequential(ray_session):
    from crawler_ray.queries import late_shipment_priority

    out = late_shipment_priority(SF).to_pandas().set_index("o_orderpriority")
    orders = _t("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _t("lineitem", ["l_orderkey", "l_shipdate"])
    mx = li.groupby("l_orderkey")["l_shipdate"].max()
    ref: dict[str, int] = {}
    for _, r in orders.iterrows():
        ms = mx.get(int(r["o_orderkey"]))
        if ms is not None and ms > r["o_orderdate"] + pd.Timedelta(days=60):
            ref[r["o_orderpriority"]] = ref.get(r["o_orderpriority"], 0) + 1
    assert len(out) == len(ref)
    for prio, n in ref.items():
        assert int(out.loc[prio, "n_late"]) == n


def test_props_json_stats_equals_json_loads_replay(ray_session):
    from crawler_ray.queries import props_json_stats

    out = props_json_stats(SF).to_pandas().set_index("event_type")
    ev = _t("events", ["event_type", "props"])
    ref: dict[str, list[int]] = {}
    for _, r in ev.iterrows():
        k = int(json.loads(r["props"])["k"])
        ref.setdefault(r["event_type"], []).append(k)
    assert len(out) == len(ref)
    for et, ks in ref.items():
        assert int(out.loc[et, "n"]) == len(ks)
        assert int(out.loc[et, "sum_k"]) == sum(ks)
        assert int(out.loc[et, "max_k"]) == max(ks)


def test_returned_item_report_equals_bruteforce(ray_session):
    from crawler_ray.queries import returned_item_report

    out = returned_item_report(SF)
    li = _t("lineitem", ["l_orderkey", "l_extendedprice", "l_discount",
                         "l_returnflag"])
    orders = _t("orders", ["o_orderkey", "o_custkey"])
    cust = _t("customer", ["c_custkey", "c_name", "c_nationkey"])
    nat = _t("nation")
    r = li[li["l_returnflag"] == "R"].copy()
    r["rev"] = np.floor(r["l_extendedprice"].to_numpy()
                        * (1 - r["l_discount"].to_numpy()) * 100 + 0.5
                        ).astype(np.int64)
    m = r.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    per = m.groupby("o_custkey", as_index=False)["rev"].sum()
    per = per.sort_values(["rev", "o_custkey"], ascending=[False, True],
                          kind="stable").head(20)
    ref = (per.merge(cust, left_on="o_custkey", right_on="c_custkey")
              .merge(nat, left_on="c_nationkey", right_on="n_nationkey"))
    ref = ref.sort_values(["rev", "c_custkey"], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
    assert len(out) == len(ref)
    for i in range(len(ref)):
        assert int(out.loc[i, "c_custkey"]) == int(ref.loc[i, "c_custkey"])
        assert int(out.loc[i, "revenue_cents"]) == int(ref.loc[i, "rev"])
        assert out.loc[i, "c_name"] == ref.loc[i, "c_name"]
        assert out.loc[i, "n_name"] == ref.loc[i, "n_name"]


def test_brand_supplier_counts_equals_bruteforce(ray_session):
    from crawler_ray.queries import brand_supplier_counts

    out = brand_supplier_counts(SF).set_index(["p_brand", "p_type"])
    li = _t("lineitem", ["l_partkey", "l_suppkey"])
    part = _t("part", ["p_partkey", "p_brand", "p_type"])
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    ref = m.groupby(["p_brand", "p_type"])["l_suppkey"].nunique()
    assert len(out) == len(ref)
    for key, n in ref.items():
        assert int(out.loc[key, "supplier_cnt"]) == int(n)


def test_promo_revenue_share_equals_bruteforce(ray_session):
    from crawler_ray.queries import promo_revenue_share

    out = promo_revenue_share(SF)
    li = _t("lineitem", ["l_partkey", "l_extendedprice", "l_discount",
                         "l_shipdate"])
    part = _t("part", ["p_partkey", "p_type"])
    w = li[(li["l_shipdate"] >= pd.Timestamp("1997-01-01"))
           & (li["l_shipdate"] < pd.Timestamp("1998-01-01"))].copy()
    w["rev"] = np.floor(w["l_extendedprice"].to_numpy()
                        * (1 - w["l_discount"].to_numpy()) * 100 + 0.5
                        ).astype(np.int64)
    promo_pk = set(part.loc[part["p_type"] == "PROMO", "p_partkey"].astype(int))
    p = int(w.loc[w["l_partkey"].isin(promo_pk), "rev"].sum())
    s = int(w["rev"].sum())
    assert int(out["promo_cents"].iloc[0]) == p
    assert int(out["total_cents"].iloc[0]) == s
    assert int(out["promo_permille"].iloc[0]) == (1000 * p) // s


def test_link_prediction_ra_equals_bruteforce(ray_session):
    from crawler_ray.queries import link_prediction_ra

    out = link_prediction_ra(SF).to_pandas()
    docs = _t("documents", ["doc_id"])
    n = len(docs)
    # deterministic link graph, symmetrized distinct edges
    edges = set()
    for d in docs["doc_id"].astype(int):
        for j in range(d % 5 + 3):
            t = (d * 131 + j * 37 + j * j * 11 + 7) % n
            if t != d:
                edges.add((min(d, t), max(d, t)))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores: dict[tuple, int] = {}
    for z, nb in adj.items():
        if len(nb) > 64:
            continue
        w = 1048576 // len(nb)
        snb = sorted(nb)
        for i in range(len(snb)):
            for j in range(i + 1, len(snb)):
                pr = (snb[i], snb[j])
                if pr in edges:
                    continue
                scores[pr] = scores.get(pr, 0) + w
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert len(out) == min(50, len(ranked))
    for i, ((a, b), s) in enumerate(ranked):
        assert int(out.loc[i, "a"]) == a
        assert int(out.loc[i, "b"]) == b
        assert int(out.loc[i, "ra_q"]) == s
