"""Session-14 operator invariants: sessionization vs a sequential gap
walk, ordered funnel vs a per-user replay, Misra-Gries certificate +
exactness, TeraSort rank vs row_number and partition-count invariance,
Q3 star join vs a pandas 3-table merge."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
GAP_US = 1_800_000_000


def _events() -> pd.DataFrame:
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["tus"] = df["ts"].astype("int64")
    return df


def test_session_stats_equals_sequential_gap_walk(ray_session):
    from crawler_ray.queries import session_stats

    ev = _events().sort_values(["user_id", "tus", "event_id"])
    # sequential reference: walk each user's timeline, split at >30 min
    sessions = []  # (n_events, duration)
    for _, g in ev.groupby("user_id"):
        t = g["tus"].to_numpy()
        start = 0
        for i in range(1, len(t) + 1):
            if i == len(t) or t[i] - t[i - 1] > GAP_US:
                sessions.append((i - start, int(t[i - 1] - t[start])))
                start = i
    ref = (
        pd.DataFrame(sessions, columns=["session_events", "dur"])
        .groupby("session_events")
        .agg(n_sessions=("dur", "size"), total_duration_us=("dur", "sum"))
        .reset_index()
    )
    got = (
        session_stats(SF)
        .to_pandas()
        .sort_values("session_events")
        .reset_index(drop=True)
    )
    ref = ref.sort_values("session_events").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), ref.astype("int64"), check_like=True
    )


def test_funnel_stages_equals_per_user_replay(ray_session):
    from crawler_ray.queries import funnel_stages

    steps = ("signup", "click", "purchase")
    ev = _events()
    counts = []
    prev: dict[int, int] = {}
    for i, step in enumerate(steps):
        sub = ev[ev["event_type"] == step]
        cur: dict[int, int] = {}
        for uid, g in sub.groupby("user_id"):
            if i == 0:
                cur[uid] = int(g["tus"].min())
            elif uid in prev:
                after = g[g["tus"] > prev[uid]]
                if len(after):
                    cur[uid] = int(after["tus"].min())
        counts.append(len(cur))
        prev = cur
    got = funnel_stages(SF).to_pandas().sort_values("stage")
    assert got["n_users"].tolist() == counts
    assert got["step"].tolist() == list(steps)
    # funnel must be monotone non-increasing by construction
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_mg_topk_certificate_and_exactness(ray_session):
    from crawler_ray.queries import mg_topk_terms

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    toks = pd.Series(
        np.concatenate([t.split(" ") for t in docs["text"]]), dtype="object"
    )
    exact = toks.value_counts()
    want = (
        exact.rename_axis("term")
        .reset_index(name="n")
        .sort_values(["n", "term"], ascending=[False, True], kind="stable")
        .head(20)
        .reset_index(drop=True)
    )
    got = (
        mg_topk_terms(SF)
        .to_pandas()
        .sort_values(["n", "term"], ascending=[False, True], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["term", "n"]], want[["term", "n"]])
    # MG certificate at a TINY capacity: decrements Delta bound the
    # undercount, so any term with true count > Delta is a candidate.
    # Verify the bound by replaying MG over crafted batches.
    cap = 8
    delta = 0
    est: dict[str, int] = {}
    rng = np.random.default_rng(3)
    arr = toks.to_numpy()
    order = rng.permutation(len(arr))
    for chunk in np.array_split(arr[order], 17):
        vc = pd.Series(chunk, dtype="object").value_counts()
        d = 0
        if len(vc) > cap:
            d = int(vc.iloc[cap])
            vc = vc - d
            vc = vc[vc > 0]
        delta += d
        for k, v in vc.items():
            est[k] = est.get(k, 0) + int(v)
    for term, n in exact.items():
        if n > delta:
            assert term in est, f"heavy term {term!r} ({n} > Δ={delta}) lost"
        if term in est:
            assert est[term] <= n  # underestimates only


def test_terasort_rank_equals_row_number_any_partition_count(ray_session):
    from crawler_ray.queries import terasort_rank

    ev = _events()
    want = ev.sort_values(["value", "event_id"], kind="stable")
    want = pd.DataFrame(
        {"event_id": want["event_id"].to_numpy(),
         "rnk": np.arange(1, len(want) + 1, dtype=np.int64)}
    ).sort_values("event_id").reset_index(drop=True)
    for n_parts in (1, 5, 32):
        got = (
            terasort_rank(SF, n_parts=n_parts)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["event_id", "rnk"]], want)


def test_shipping_priority_equals_pandas_star_join(ray_session):
    from crawler_ray.queries import shipping_priority

    D = pd.Timestamp("1998-06-01")
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    c = cust[cust["c_mktsegment"] == "BUILDING"][["c_custkey"]]
    o = orders[orders["o_orderdate"] < D].merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    l = li[li["l_shipdate"] > D].copy()
    l["rev"] = np.floor(
        l["l_extendedprice"].to_numpy() * (1 - l["l_discount"].to_numpy()) * 100
        + 0.5
    ).astype(np.int64)
    m = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    ref = (
        m.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"], as_index=False)[
            "rev"
        ]
        .sum()
        .rename(columns={"rev": "revenue_cents"})
        .sort_values(
            ["revenue_cents", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
            kind="stable",
        )
        .head(10)
        .reset_index(drop=True)
    )
    got = shipping_priority(SF).to_pandas().reset_index(drop=True)
    cols = ["l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority"]
    pd.testing.assert_frame_equal(
        got[cols], ref[cols], check_dtype=False
    )
