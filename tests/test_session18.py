"""Session-18 operator invariants: the Q12/Q19 relational shapes plus
the interval-union / concentration / autocorrelation statistics equal
brute-force pandas replications of their semantics."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"

DAY_US = 86400_000_000


def _t(name, cols=None):
    return pq.read_table(f"{SF}/{name}.parquet", columns=cols).to_pandas()


def _cents(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 100 + 0.5).astype(np.int64)


def test_shipmode_priority_equals_bruteforce(ray_session):
    from crawler_ray.queries import _SHIP_MODES, shipmode_priority

    out = shipmode_priority(SF)

    li = _t("lineitem", ["l_orderkey", "l_linenumber", "l_partkey",
                         "l_suppkey", "l_shipdate"])
    orders = _t("orders", ["o_orderkey", "o_orderpriority"])
    ok = li["l_orderkey"].to_numpy().astype(np.int64)
    mode_i = (ok * 7 + li["l_linenumber"].to_numpy().astype(np.int64)) % 5
    cd = li["l_partkey"].to_numpy().astype(np.int64) % 30
    rd = li["l_suppkey"].to_numpy().astype(np.int64) % 45
    recv = li["l_shipdate"].astype("int64").to_numpy() + rd * DAY_US
    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1998-01-01").value // 1000)
    keep = (np.isin(mode_i, [1, 3]) & (cd > 0) & (cd < rd)
            & (recv >= lo) & (recv < hi))
    sel = pd.DataFrame({"ok": ok[keep],
                        "mode": np.array(_SHIP_MODES, dtype=object)[mode_i[keep]]})
    m = sel.merge(orders, left_on="ok", right_on="o_orderkey")
    m["high"] = m["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    ref = m.groupby("mode")["high"].agg(["sum", "size"])
    got = {r["shipmode"]: (int(r["high_line_count"]), int(r["low_line_count"]))
           for _, r in out.iterrows()}
    assert got == {k: (int(v["sum"]), int(v["size"] - v["sum"]))
                   for k, v in ref.iterrows()}
    assert len(out) > 0  # predicate must be non-vacuous on the testdata


def test_disjunctive_revenue_equals_bruteforce(ray_session):
    from crawler_ray.queries import disjunctive_revenue

    out = disjunctive_revenue(SF)

    part = _t("part", ["p_partkey", "p_brand", "p_size"])
    li = _t("lineitem", ["l_partkey", "l_quantity", "l_extendedprice",
                         "l_discount"])
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    ci = m["p_partkey"].to_numpy().astype(np.int64) % 12
    sz = m["p_size"].to_numpy().astype(np.int64)
    qty = m["l_quantity"].to_numpy()
    br = m["p_brand"].to_numpy(dtype=object)
    keep = np.zeros(len(m), dtype=bool)
    for brand, clo, chi, qlo, qhi, slo, shi in [
        ("Brand#12", 0, 3, 1, 11, 1, 5),
        ("Brand#23", 4, 7, 10, 20, 1, 10),
        ("Brand#24", 8, 11, 20, 30, 1, 15),
    ]:
        keep |= ((br == brand) & (ci >= clo) & (ci <= chi)
                 & (qty >= qlo) & (qty <= qhi) & (sz >= slo) & (sz <= shi))
    rev = _cents(m["l_extendedprice"].to_numpy()
                 * (1.0 - m["l_discount"].to_numpy()))
    assert int(out["n_lines"].iloc[0]) == int(keep.sum())
    assert int(out["revenue_cents"].iloc[0]) == int(rev[keep].sum())
    assert int(keep.sum()) > 0  # clauses must hit on the testdata
