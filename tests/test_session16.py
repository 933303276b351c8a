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
