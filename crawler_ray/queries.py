"""Query registry: Ray Data pipelines + DuckDB oracle SQL.

One entry per implemented operator family from SURVEY.md §2, exercised
over the driver testdata tables (region nation customer supplier part
orders lineitem events documents embeddings).  Each Ray pipeline and
its oracle compute the SAME names/expressions; float aggregates go
through exact integer cents (see stages/relational.py) so distributed
summation order cannot cause hash mismatches.

Entries whose semantics DuckDB cannot mirror exactly (SimHash,
language-ID heuristic, rolling fingerprints, IVF-ANN, the crawl
itself) have ``sql=None`` → the driver records a weaker rows-only
check.  MinHash-LSH near-dup IS oracle-checked: at J≥0.9 its miss
probability (~1e-25) makes the sweep equal the exhaustive SQL
similarity join.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Callable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .functions import shingles, textstats
from .stages.relational import cents, make_partial_agg
from .stages.ann import list_col_to_matrix


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(_pq(sf_dir, name), columns=columns)


@dataclass
class QueryDef:
    fn: Callable
    sql: Optional[str]
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, sql: Optional[str], doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, sql, doc)
        return fn

    return deco


# =====================================================================
# Relational core — groupby/count, joins, anti-join, dedup, top-k
# =====================================================================


@register(
    "frequencies_model",
    "SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source",
    doc="The learned-model build: (frequencies leaf-paths) groupby+count "
    "(reference crawl.clj:108) over the documents table.",
)
def frequencies_model(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    from ray.data.aggregate import Count

    return ds.groupby(["lang", "source"]).aggregate(Count(alias_name="n"))


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))/100.0 AS sum_qty,
           sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))/100.0 AS sum_base_price,
           sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))/100.0 AS sum_disc_price,
           count(*) AS n
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-shaped scan+filter+aggregate with per-batch partial "
    "aggregation (combiner) before the groupby shuffle.",
)
def pricing_summary(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1999-01-01"))))
        qty_c = cents(t["l_quantity"])
        price_c = cents(t["l_extendedprice"])
        disc_c = cents(pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])))
        out = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
                "price_c": price_c,
                "disc_c": disc_c,
            }
        )
        return make_partial_agg(["l_returnflag", "l_linestatus"], ["qty_c", "price_c", "disc_c"])(out)

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c_sum", alias_name="qty"),
            Sum("price_c_sum", alias_name="price"),
            Sum("disc_c_sum", alias_name="disc"),
            Sum("partial_n", alias_name="n"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.divide(pc.cast(t["qty"], pa.float64()), 100.0),
                "sum_base_price": pc.divide(pc.cast(t["price"], pa.float64()), 100.0),
                "sum_disc_price": pc.divide(pc.cast(t["disc"], pa.float64()), 100.0),
                "n": t["n"],
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "revenue_by_nation",
    """
    SELECT n_name,
           sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))/100.0 AS revenue,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Broadcast join: small sides (customer→nation map) shipped once "
    "via ray.put, looked up per batch (SURVEY.md §2.5 join strategy).",
)
def revenue_by_nation(sf_dir: str):
    import ray

    cust = pq.read_table(_pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    cmap = {
        ck: nmap[nk]
        for ck, nk in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    ref = ray.put(cmap)

    class JoinNation:
        def __init__(self):
            self.cmap = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            names = pd.Series(t["o_custkey"].to_numpy()).map(self.cmap)
            out = pa.table(
                {
                    "n_name": pa.array(names, type=pa.string()),
                    "price_c": cents(t["o_totalprice"]),
                }
            )
            return make_partial_agg(["n_name"], ["price_c"])(out)

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(JoinNation, batch_format="pyarrow", concurrency=2)
        .groupby("n_name")
        .aggregate(Sum("price_c_sum", alias_name="rev_c"), Sum("partial_n", alias_name="n_orders"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "n_name": t["n_name"],
                "revenue": pc.divide(pc.cast(t["rev_c"], pa.float64()), 100.0),
                "n_orders": t["n_orders"],
            }
        ),
        batch_format="pyarrow",
    )


@register(
    "corpus_self_join",
    """
    SELECT o_orderstatus,
           count(*) AS n_items,
           sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))/100.0 AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    doc="Large-large hash join (Dataset.join, hash-partitioned on the "
    "key) — the corpus self-join on src_url analog (corpus.clj:33-36).",
)
def corpus_self_join(sf_dir: str):
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({"o_orderstatus": t["o_orderstatus"], "qty_c": cents(t["l_quantity"])})
        return make_partial_agg(["o_orderstatus"], ["qty_c"])(out)

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Sum("partial_n", alias_name="n_items"), Sum("qty_c_sum", alias_name="qty_c"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "n_items": t["n_items"],
                "sum_qty": pc.divide(pc.cast(t["qty_c"], pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


@register(
    "anti_join_seen",
    """
    SELECT o_orderpriority, count(*) AS n,
           sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))/100.0 AS total
    FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    GROUP BY o_orderpriority
    """,
    doc="URL-seen anti-join semantics (crawl.clj:124-129): broadcast the "
    "seen-set, filter inside map_batches — no shuffle.",
)
def anti_join_seen(sf_dir: str):
    import ray

    cust = pq.read_table(_pq(sf_dir, "customer"), columns=["c_custkey", "c_acctbal"])
    seen = set(
        ck
        for ck, bal in zip(cust["c_custkey"].to_pylist(), cust["c_acctbal"].to_pylist())
        if bal < 0
    )
    ref = ray.put(np.array(sorted(seen), dtype=np.int64))

    class AntiJoin:
        def __init__(self):
            self.seen = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_custkey"].to_numpy()
            idx = np.searchsorted(self.seen, keys)
            idx = np.clip(idx, 0, len(self.seen) - 1)
            hit = (len(self.seen) > 0) & (self.seen[idx] == keys)
            t = t.filter(pa.array(~hit))
            out = pa.table(
                {"o_orderpriority": t["o_orderpriority"], "price_c": cents(t["o_totalprice"])}
            )
            return make_partial_agg(["o_orderpriority"], ["price_c"])(out)

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority", "o_totalprice"])
        .map_batches(AntiJoin, batch_format="pyarrow", concurrency=2)
        .groupby("o_orderpriority")
        .aggregate(Sum("partial_n", alias_name="n"), Sum("price_c_sum", alias_name="price_c"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "n": t["n"],
                "total": pc.divide(pc.cast(t["price_c"], pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


@register(
    "exact_dedup_first",
    "SELECT lang, source, min(doc_id) AS doc_id_first, count(*) AS n "
    "FROM documents GROUP BY lang, source",
    doc="Exact dedup distinct-by-key semantics (utils.clj:300-308, "
    "crawl.clj:25-36): hash-partition by key, keep first per group.",
)
def exact_dedup_first(sf_dir: str):
    from ray.data.aggregate import Count, Min

    return (
        _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
        .groupby(["lang", "source"])
        .aggregate(Min("doc_id", alias_name="doc_id_first"), Count(alias_name="n"))
    )


@register(
    "topk_orders",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    doc="Distributed top-k (sort + limit) — plan-ordering analog "
    "(execute.clj:10-17).",
)
def topk_orders(sf_dir: str):
    return (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


@register(
    "mean_var_score",
    """
    WITH g AS (
      SELECT l_partkey, count(*) AS n,
             sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS s1,
             sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)
                 * CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS s2
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, n,
           (s1/100.0/n) * ((s2/10000.0 - (s1/100.0)*(s1/100.0)/n)/(n-1)) AS score
    FROM g WHERE n >= 2 ORDER BY score DESC, l_partkey LIMIT 20
    """,
    doc="rank/score-xpaths-1 mean×variance ranking (rank.clj:132-170) "
    "computed from exact integer moments (sum, sum-of-squares).",
)
def mean_var_score(sf_dir: str):
    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        qc = cents(t["l_quantity"])
        out = pa.table(
            {"l_partkey": t["l_partkey"], "s1": qc, "s2": pc.multiply(qc, qc)}
        )
        return make_partial_agg(["l_partkey"], ["s1", "s2"])(out)

    from crawler_ray.stages.relational import bucketed_agg

    # l_partkey is high-cardinality (~20k groups at sf0.1): Ray's
    # groupby().aggregate() pays ~2 ms/group of per-group overhead, so
    # the final aggregate goes through the bucketed pandas path instead
    # (one shuffle on 32 coarse buckets, vectorized groupby per bucket)
    agg = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        keys=["l_partkey"],
        sum_cols={"s1_sum": "s1", "s2_sum": "s2", "partial_n": "n"},
    )

    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], 2))
        n = t["n"].to_numpy().astype(np.float64)
        s1 = t["s1"].to_numpy().astype(np.float64)
        s2 = t["s2"].to_numpy().astype(np.float64)
        mean = s1 / 100.0 / n
        var = (s2 / 10000.0 - (s1 / 100.0) * (s1 / 100.0) / n) / (n - 1)
        out = pa.table(
            {"l_partkey": t["l_partkey"], "n": t["n"], "score": pa.array(mean * var)}
        )
        # local top-k prune: only ≤20 rows per block reach the global
        # sort, so the all-to-all sorts ~20×blocks rows, not 20k keys
        order = np.lexsort((out["l_partkey"].to_numpy(), -out["score"].to_numpy()))[:20]
        return out.take(pa.array(np.sort(order)))

    return agg.map_batches(score, batch_format="pyarrow").sort(
        ["score", "l_partkey"], descending=[True, False]
    ).limit(20)


@register(
    "nunique_histogram",
    """
    WITH d AS (SELECT o_custkey, count(DISTINCT o_orderpriority) AS np
               FROM orders GROUP BY o_custkey)
    SELECT np AS n_priorities, count(*) AS n_customers FROM d GROUP BY np
    """,
    doc="rank/rank-cluster-url-entry-point nunique aggregation "
    "(rank.clj:46-52): distinct-count per key, then histogram.",
)
def nunique_histogram(sf_dir: str):
    from ray.data.aggregate import Count

    pairs = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
        .groupby(["o_custkey", "o_orderpriority"])
        .aggregate(Count(alias_name="_c"))
    )
    per_cust = pairs.groupby("o_custkey").aggregate(Count(alias_name="n_priorities"))
    return per_cust.groupby("n_priorities").aggregate(Count(alias_name="n_customers"))


@register(
    "rollup_revenue",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))/100.0 AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Multi-level aggregation (GROUP BY ROLLUP): one per-batch "
    "combiner pass at the finest grain, then the coarser levels fold "
    "from the FINE aggregate (tiny) instead of re-scanning the input — "
    "the rollup-from-partials shape.",
)
def rollup_revenue(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "status": t["o_orderstatus"],
                "priority": t["o_orderpriority"],
                "price_c": cents(t["o_totalprice"]),
            }
        )
        return make_partial_agg(["status", "priority"], ["price_c"])(out)

    from ray.data.aggregate import Sum

    fine = (
        _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["status", "priority"])
        .aggregate(Sum("price_c_sum", alias_name="c"), Sum("partial_n", alias_name="n"))
        .to_pandas()  # finest grain: |status|×|priority| rows — tiny
    )
    # 'ALL' is the rollup subtotal sentinel: safe for TPC-H-shaped
    # status/priority domains, asserted absent so a data value equal to
    # the sentinel can never masquerade as a subtotal row
    assert "ALL" not in set(fine["status"]) | set(fine["priority"]), (
        "rollup sentinel 'ALL' collides with a data value"
    )
    mid = fine.groupby("status", as_index=False)[["n", "c"]].sum()
    mid["priority"] = "ALL"
    total = pd.DataFrame(
        {"status": ["ALL"], "priority": ["ALL"], "n": [fine["n"].sum()], "c": [fine["c"].sum()]}
    )
    alll = pd.concat([fine, mid, total], ignore_index=True)
    return pa.table(
        {
            "status": pa.array(alll["status"], type=pa.string()),
            "priority": pa.array(alll["priority"], type=pa.string()),
            "n": pa.array(alll["n"].astype("int64")),
            "revenue": pa.array((alll["c"].astype("int64") / 100.0).astype("float64")),
        }
    )


@register(
    "tpch_q3_like",
    """
    SELECT o_orderkey, o_orderdate,
           sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))/100.0 AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    doc="3-way join + aggregate + top-k: broadcast the filtered "
    "customer/order side, shuffle only the final small groupby.",
)
def tpch_q3_like(sf_dir: str):
    import ray

    # build side computed DISTRIBUTED (r2 verdict: the old driver-side
    # pq.read_table(orders) was an OOM at scale): BUILDING customer keys
    # are reduced per batch and broadcast, then the orders fact table is
    # semi-filtered IN map_batches — only the filtered (orderkey, date)
    # pairs reach the driver.  At 100 TB, if the filtered side outgrew
    # the driver, the same plan switches to Dataset.join on l_orderkey
    # (the corpus_self_join primitive); the broadcast path is the
    # documented small-side regime.
    def bld_keys(t: pa.Table) -> pa.Table:
        k = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))["c_custkey"].to_numpy()
        return pa.table({"k": pa.array(np.unique(k))})

    bld = np.unique(
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(bld_keys, batch_format="pyarrow")
        .to_pandas()["k"]
        .to_numpy()
    )
    bref = ray.put(bld)

    class SemiOrders:
        def __init__(self):
            self.bld = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t["o_custkey"].to_numpy()
            if len(self.bld):
                idx = np.clip(np.searchsorted(self.bld, ck), 0, len(self.bld) - 1)
                keep = self.bld[idx] == ck
            else:
                keep = np.zeros(len(ck), dtype=bool)
            keep &= t["o_orderdate"].to_numpy(zero_copy_only=False) < np.datetime64("1998-01-01")
            t = t.filter(pa.array(keep))
            return t.select(["o_orderkey", "o_orderdate"])

    filt = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(SemiOrders, batch_format="pyarrow", concurrency=2)
        .to_pandas()
    )
    okeys = filt["o_orderkey"].to_numpy()
    odates = filt["o_orderdate"].to_numpy().astype("datetime64[us]")
    osort = np.argsort(okeys)
    ref = ray.put((okeys[osort], odates[osort]))

    class JoinOrders:
        def __init__(self):
            self.okeys, self.odates = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t["l_orderkey"].to_numpy()
            if len(self.okeys):
                idx = np.clip(np.searchsorted(self.okeys, k), 0, len(self.okeys) - 1)
                hit = self.okeys[idx] == k
            else:
                hit = np.zeros(len(k), dtype=bool)
            t = t.filter(pa.array(hit))
            k2 = t["l_orderkey"].to_numpy()
            dates = self.odates[np.searchsorted(self.okeys, k2)]
            disc_c = cents(
                pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
            )
            out = pa.table(
                {
                    "o_orderkey": t["l_orderkey"],
                    "o_orderdate": pa.array(dates, type=pa.timestamp("us")),
                    "rev_c": disc_c,
                }
            )
            return make_partial_agg(["o_orderkey", "o_orderdate"], ["rev_c"])(out)

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(JoinOrders, batch_format="pyarrow", concurrency=2)
        .groupby(["o_orderkey", "o_orderdate"])
        .aggregate(Sum("rev_c_sum", alias_name="rev_c"))
    )
    return (
        agg.map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_orderdate": t["o_orderdate"],
                    "revenue": pc.divide(pc.cast(t["rev_c"], pa.float64()), 100.0),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["revenue", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


# =====================================================================
# Stream-shaped operators over the events table (SURVEY.md §2.11)
# =====================================================================


@register(
    "event_histogram",
    """
    SELECT event_type, count(*) AS n,
           sum(CAST(floor(value*100 + 0.5) AS BIGINT))/100.0 AS sum_value
    FROM events GROUP BY event_type
    """,
    doc="xpath-histogram analog (dom.clj:264-286) over the event log.",
)
def event_histogram(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({"event_type": t["event_type"], "v_c": cents(t["value"])})
        return make_partial_agg(["event_type"], ["v_c"])(out)

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "events", columns=["event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("partial_n", alias_name="n"), Sum("v_c_sum", alias_name="v_c"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "n": t["n"],
                "sum_value": pc.divide(pc.cast(t["v_c"], pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


@register(
    "windowed_agg",
    """
    SELECT event_type, date_trunc('hour', ts) AS window_start, count(*) AS n,
           sum(CAST(floor(value*100 + 0.5) AS BIGINT))/100.0 AS sum_value
    FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    doc="Tumbling 1-hour window aggregate: window key computed "
    "vectorized per batch, then a small groupby — no per-row state.",
)
def windowed_agg(sf_dir: str):
    US_PER_H = 3_600_000_000

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        ws = pc.multiply(pc.divide(us, US_PER_H), US_PER_H)  # integer floor div
        out = pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pc.cast(ws, pa.timestamp("us")),
                "v_c": cents(t["value"]),
            }
        )
        return make_partial_agg(["event_type", "window_start"], ["v_c"])(out)

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "events", columns=["event_type", "ts", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("partial_n", alias_name="n"), Sum("v_c_sum", alias_name="v_c"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "window_start": t["window_start"],
                "n": t["n"],
                "sum_value": pc.divide(pc.cast(t["v_c"], pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


@register(
    "sessionize",
    """
    WITH s AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    u AS (SELECT user_id, CAST(sum(brk) AS BIGINT) AS ns FROM s GROUP BY user_id)
    SELECT ns AS n_sessions, count(*) AS n_users FROM u GROUP BY ns
    """,
    doc="Session windows (30-min gap): partition by user, sort by ts "
    "within group, count gap breaks — groupby().map_groups pattern.",
)
def sessionize(sf_dir: str):
    GAP = pd.Timedelta(minutes=30)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        breaks = (ts.diff() > GAP).sum() + 1
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "ns": [int(breaks)]})

    from ray.data.aggregate import Count

    per = (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )
    return per.groupby("ns").aggregate(Count(alias_name="n_users")).map_batches(
        lambda t: pa.table({"n_sessions": t["ns"], "n_users": t["n_users"]}),
        batch_format="pyarrow",
    )



# =====================================================================
# Text analysis over documents (training-data pipeline operators)
# =====================================================================


@register(
    "token_stats",
    """
    SELECT lang, count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           sum(len(string_split(text, ' ')))/(1.0*count(*)) AS avg_tokens
    FROM documents GROUP BY lang
    """,
    doc="Token counting (utils/tokenize analog, utils.clj:179-189) — "
    "vectorized space counting per batch, integer partials.",
)
def token_stats(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        toks = pc.add(pc.count_substring(t["text"], " "), 1)
        out = pa.table(
            {
                "lang": t["lang"],
                "toks": pc.cast(toks, pa.int64()),
                "chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )
        return make_partial_agg(["lang"], ["toks", "chars"])(out)

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("toks_sum", alias_name="total_tokens"),
            Sum("chars_sum", alias_name="total_chars"),
            Sum("partial_n", alias_name="n_docs"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        tt = t["total_tokens"].to_numpy().astype(np.float64)
        n = t["n_docs"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": t["n_docs"],
                "total_tokens": t["total_tokens"],
                "total_chars": t["total_chars"],
                "avg_tokens": pa.array(tt / (1.0 * n)),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def qcont(vals: np.ndarray, counts: np.ndarray, q: float) -> float:
    """DuckDB quantile_cont over a value-count histogram: linear
    interpolation at pos = q·(n−1).  The v_lo*(1-frac) + v_hi*frac
    form is DuckDB's exact fp expression — the algebraically-equal
    v_lo + frac*(v_hi−v_lo) diverges by 1 ULP on ~5% of histograms
    (guarded by a seeded fuzz test against DuckDB)."""
    order = np.argsort(vals)
    vals, counts = vals[order], counts[order]
    n = counts.sum()
    pos = q * (n - 1)
    lo, frac = int(np.floor(pos)), pos - np.floor(pos)
    cum = np.cumsum(counts)
    v_lo = vals[np.searchsorted(cum, lo + 1)]
    v_hi = vals[np.searchsorted(cum, min(lo + 1, n - 1) + 1)]
    return float(v_lo * (1.0 - frac) + v_hi * frac)


@register(
    "token_quantiles",
    """
    SELECT lang,
           quantile_cont(len(string_split(text, ' ')), 0.5) AS p50,
           quantile_cont(len(string_split(text, ' ')), 0.9) AS p90,
           quantile_cont(len(string_split(text, ' ')), 0.99) AS p99
    FROM documents GROUP BY lang
    """,
    doc="Distributed EXACT quantiles (token-length p50/p90/p99 per "
    "language) via per-batch value histograms: integer token counts "
    "make the distribution a small (lang, ntok)→count table, so the "
    "all-to-all moves histogram partials, never rows; the driver "
    "interpolates with quantile_cont's pos = q·(n−1) linear rule over "
    "the merged counts (module-level ``qcont``, fuzz-guarded against "
    "DuckDB).  The percentile operator most engines approximate "
    "(t-digest) is exact here by exploiting the bounded integer "
    "domain.",
)
def token_quantiles(sf_dir: str):
    def hist(t: pa.Table) -> pa.Table:
        toks = pc.cast(pc.add(pc.count_substring(t["text"], " "), 1), pa.int64())
        tt = pa.table({"lang": t["lang"], "ntok": toks})
        return make_partial_agg(["lang", "ntok"], [])(tt)

    from ray.data.aggregate import Sum

    h = (
        _read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(hist, batch_format="pyarrow")
        .groupby(["lang", "ntok"])
        .aggregate(Sum("partial_n", alias_name="n"))
        .to_pandas()  # merged histogram: |langs| × |distinct lengths| — tiny
    )

    rows = []
    for lang, g in h.groupby("lang"):
        v = g["ntok"].to_numpy(dtype=np.int64)
        c = g["n"].to_numpy(dtype=np.int64)
        rows.append(
            {
                "lang": lang,
                "p50": qcont(v, c, 0.5),
                "p90": qcont(v, c, 0.9),
                "p99": qcont(v, c, 0.99),
            }
        )
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r["lang"]))


@register(
    "sequence_packing",
    """
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents),
    s AS (
      SELECT doc_id, ntok,
             sum(ntok) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - ntok AS cb
      FROM t),
    c AS (
      SELECT doc_id, ntok, cb,
             cb // 2048 AS first_chunk,
             (cb + ntok - 1) // 2048 AS last_chunk
      FROM s)
    SELECT CAST((max(cb + ntok) + 2047) // 2048 AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN first_chunk != last_chunk THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddlers,
           CAST(max(last_chunk - first_chunk + 1) AS BIGINT) AS max_span
    FROM c
    """,
    doc="LLM sequence packing (concat-and-chunk, context 2048): each "
    "doc's token span [cum_before, cum_before+ntok) maps to training "
    "chunks via a distributed EXCLUSIVE PREFIX SUM "
    "(stages/relational.add_prefix_sum — two-phase scan: per-block "
    "totals to the driver, offsets broadcast back, within-block "
    "cumsum).  Emits chunk count, boundary-straddling docs and the "
    "max chunks one doc spans — all exact integers.",
)
def sequence_packing(sf_dir: str):
    L = 2048

    def toks(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "ntok": pc.cast(pc.add(pc.count_substring(t["text"], " "), 1), pa.int64()),
            }
        )

    from crawler_ray.stages.relational import add_prefix_sum

    ds = add_prefix_sum(
        _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            toks, batch_format="pyarrow"
        ),
        col="ntok",
        out_col="cb",
        order_col="doc_id",
    )

    def part_stats(t: pa.Table) -> pa.Table:
        cb = t["cb"].to_numpy()
        nt = t["ntok"].to_numpy()
        first = cb // L
        last = (cb + nt - 1) // L
        return pa.table(
            {
                "end_max": pa.array([int((cb + nt).max()) if len(cb) else 0], type=pa.int64()),
                "straddlers": pa.array([int((first != last).sum())], type=pa.int64()),
                "span_max": pa.array([int((last - first + 1).max()) if len(cb) else 0], type=pa.int64()),
            }
        )

    sp = ds.map_batches(part_stats, batch_format="pyarrow", batch_size=None).to_pandas()
    return pa.table(
        {
            "n_chunks": pa.array([int((sp["end_max"].max() + L - 1) // L)], type=pa.int64()),
            "n_straddlers": pa.array([int(sp["straddlers"].sum())], type=pa.int64()),
            "max_span": pa.array([int(sp["span_max"].max())], type=pa.int64()),
        }
    )


@register(
    "quality_score",
    """
    SELECT lang,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(sum(len(list_filter(string_split(text, ' '),
                               x -> x IN ('the','a','of','to','and')))) AS BIGINT)
             AS n_stopwords,
           CAST(sum(length(text) - length(regexp_replace(text,
               '[.,;:!?''"()\\[\\]{}-]', '', 'g'))) AS BIGINT) AS n_punct,
           sum(len(list_filter(string_split(text, ' '),
                               x -> x IN ('the','a','of','to','and'))))
             /(1.0*sum(len(string_split(text, ' ')))) AS stopword_ratio
    FROM documents GROUP BY lang
    """,
    doc="Quality scoring (stopword/punctuation ratios) — integer "
    "partial counts per batch; single final division.",
)
def quality_score(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        # tokens: single-space field count, same as the SQL string_split
        toks = pc.cast(pc.add(pc.count_substring(txt, " "), 1), pa.int64())
        # stopwords: split → flatten → is_in → per-row segment sum
        tok_list = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(tok_list)
        isstop = pc.is_in(
            flat, value_set=pa.array(list(textstats.STOPWORDS))
        ).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(tok_list).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(len(lens)), lens)
        stop = np.bincount(rows, weights=isstop, minlength=len(lens)).astype(np.int64)
        # punctuation: chars removed by the same regex as the oracle
        stripped = pc.replace_substring_regex(txt, r"[.,;:!?'\"()\[\]{}-]", "")
        punct = pc.cast(
            pc.subtract(pc.utf8_length(txt), pc.utf8_length(stripped)), pa.int64()
        )
        out = pa.table(
            {
                "lang": t["lang"],
                "toks": toks,
                "stop": pa.array(stop, type=pa.int64()),
                "punct": punct,
            }
        )
        return make_partial_agg(["lang"], ["toks", "stop", "punct"])(out)

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("toks_sum", alias_name="total_tokens"),
            Sum("stop_sum", alias_name="n_stopwords"),
            Sum("punct_sum", alias_name="n_punct"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        s = t["n_stopwords"].to_numpy().astype(np.float64)
        tt = t["total_tokens"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "lang": t["lang"],
                "total_tokens": t["total_tokens"],
                "n_stopwords": t["n_stopwords"],
                "n_punct": t["n_punct"],
                "stopword_ratio": pa.array(s / (1.0 * tt)),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "df_top_terms",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents)
    SELECT term, count(*) AS df FROM toks GROUP BY term
    ORDER BY df DESC, term LIMIT 20
    """,
    doc="Vocabulary statistics: per-term document frequency (distinct "
    "terms per doc exploded in map_batches, bucketed count "
    "aggregation, local top-k prune before the tiny global sort) — "
    "the inverted-vocabulary operator of a training-data pipeline; "
    "IDF = ln(N/df) derives from the exact integer df (ln itself is "
    "libm-dependent, so the oracle-compared columns stay integral).",
)
def df_top_terms(sf_dir: str):
    def explode(t: pa.Table) -> pa.Table:
        ids, terms = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w in set(txt.split(" ")):
                ids.append(did)
                terms.append(w)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "term": pa.array(terms, type=pa.string())}
        )

    from crawler_ray.stages.relational import bucketed_agg

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    df_ds = bucketed_agg(
        docs.map_batches(explode, batch_format="pyarrow"),
        keys=["term"],
        sum_cols={"__count__": "df"},
        key_dtypes={"term": "object"},
    )

    def local_topk(t: pa.Table) -> pa.Table:
        order = np.lexsort(
            (np.asarray(t["term"].to_pylist(), dtype=object), -t["df"].to_numpy())
        )[:20]
        return t.take(pa.array(np.sort(order)))

    return (
        df_ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["df", "term"], descending=[True, False])
        .limit(20)
    )


@register(
    "fingerprint_docs",
    """
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))))
             AS n_unique_fp
    FROM documents GROUP BY source
    """,
    doc="Document fingerprinting (md5 of whitespace-normalized text) + "
    "distinct count per source — exact-dedup key computation.",
)
def fingerprint_docs(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        fps = [textstats.fingerprint(x) for x in t["text"].to_pylist()]
        return pa.table({"source": t["source"], "fp": pa.array(fps, type=pa.string())})

    from ray.data.aggregate import Count, Sum

    pairs = (
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["source", "fp"])
        .aggregate(Count(alias_name="n"))
    )
    return (
        pairs.groupby("source")
        .aggregate(Sum("n", alias_name="n_docs"), Count(alias_name="n_unique_fp"))
        .map_batches(
            lambda t: pa.table(
                {"source": t["source"], "n_docs": t["n_docs"], "n_unique_fp": t["n_unique_fp"]}
            ),
            batch_format="pyarrow",
        )
    )


# =====================================================================
# Embedding operators — similarity search + near-dup (SURVEY.md extras)
# =====================================================================


@register(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT embedding FROM embeddings
               WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
    ranked AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY list_cosine_similarity(embedding, (SELECT embedding FROM q)) DESC,
                        vec_id) AS rank
      FROM embeddings
      WHERE vec_id != (SELECT min(vec_id) FROM embeddings))
    SELECT vec_id, rank FROM ranked WHERE rank <= 10
    """,
    doc="Brute-force cosine top-k similarity search: query vector "
    "broadcast once, per-batch numpy matmul + local top-k, global "
    "sort+limit.  Output is (vec_id, rank) — ranks are FP-stable "
    "because adjacent true cosines differ by ≥3e-4 in this data while "
    "engine disagreement is ≤2e-7.",
)
def ann_cosine_topk(sf_dir: str):
    import ray

    emb = pq.read_table(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    qid = int(ids.min())
    qvec = np.array(emb["embedding"].to_pylist()[int(np.argmin(ids))], dtype=np.float64)
    qref = ray.put(qvec)

    class Score:
        def __init__(self):
            self.q = ray.get(qref)
            self.qn = self.q / np.linalg.norm(self.q)

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = t["vec_id"].to_numpy()
            mask = vids != qid
            m = list_col_to_matrix(t["embedding"])[mask]
            vids = vids[mask]
            if len(vids) == 0:
                return pa.table({"vec_id": pa.array([], type=pa.int64()), "cos": pa.array([], type=pa.float64())})
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            cos = mn @ self.qn
            k = min(10, len(cos))  # local top-k prune before the global sort
            top = np.argpartition(-cos, k - 1)[:k]
            return pa.table({"vec_id": pa.array(vids[top]), "cos": pa.array(cos[top])})

    top = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(Score, batch_format="pyarrow", concurrency=2)
        .sort(["cos", "vec_id"], descending=[True, False])
        .limit(10)
    )
    df = top.to_pandas()
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["vec_id", "rank"]]


@register(
    "embedding_neardup",
    """
    SELECT a.label AS label, count(*) AS n_pairs
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
    GROUP BY a.label
    """,
    doc="Embedding-cosine near-duplicate pairs within label buckets "
    "(IVF-style bucketing: only same-bucket pairs compared).  "
    "Threshold 0.4 sits ≥1.7e-3 from every pair in this data, so "
    "float32 (DuckDB) vs float64 (numpy) disagreement (≤2e-7) cannot "
    "flip a pair.",
)
def embedding_neardup(sf_dir: str):
    def per_label(g: pd.DataFrame) -> pd.DataFrame:
        m = np.array(g["embedding"].to_list(), dtype=np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        cos = mn @ mn.T
        iu = np.triu_indices(len(m), k=1)
        n = int((cos[iu] >= 0.4).sum())
        if n == 0:
            return pd.DataFrame(
                {"label": pd.Series([], dtype="int64"), "n_pairs": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame({"label": [int(g["label"].iloc[0])], "n_pairs": [n]})

    out = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
        .groupby("label")
        .map_groups(per_label, batch_format="pandas")
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "label": pc.cast(t["label"], pa.int32()),
                "n_pairs": pc.cast(t["n_pairs"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# =====================================================================
# Link-graph operators (derived deterministically from documents —
# the crawl frontier shape with an exact SQL oracle)
# =====================================================================

_LINK_SQL_CTE = """
    WITH n AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j))
"""


def _explode_links(t: pa.Table, n_docs: int) -> np.ndarray:
    ids = t["doc_id"].to_numpy()
    k = (ids % 5 + 3).astype(np.int64)
    src = np.repeat(ids, k)
    # per-row j = 0..k_i-1 via cumulative offsets
    j = np.arange(len(src)) - np.repeat(np.cumsum(k) - k, k)
    return (src * 131 + j * 37 + j * j * 11 + 7) % n_docs


@register(
    "link_graph_degree",
    _LINK_SQL_CTE
    + """,
    deg AS (SELECT target, count(*) AS indeg FROM l GROUP BY target)
    SELECT indeg, count(*) AS n_docs FROM deg GROUP BY indeg
    """,
    doc="Link explode → in-degree → histogram: the link-extraction + "
    "frontier-count shape (dom.clj:304-376 explode, groupby target).",
)
def link_graph_degree(sf_dir: str):
    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pa.Table:
        tgt = _explode_links(t, n_docs)
        out = pa.table({"target": pa.array(tgt)})
        return out.group_by(["target"]).aggregate([([], "count_all")]).rename_columns(["target", "pn"])

    from ray.data.aggregate import Count, Sum

    deg = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("target")
        .aggregate(Sum("pn", alias_name="indeg"))
    )
    return deg.groupby("indeg").aggregate(Count(alias_name="n_docs"))


@register(
    "frontier_discovery",
    _LINK_SQL_CTE
    + """
    SELECT count(DISTINCT target) AS n_new FROM l WHERE target >= 10
    """,
    doc="Frontier discovery count: exploded links, anti-join vs the "
    "seed set (doc_id < 10), exact distinct — the URL-seen test-and-set "
    "result cardinality.",
)
def frontier_discovery(sf_dir: str):
    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pa.Table:
        tgt = _explode_links(t, n_docs)
        tgt = np.unique(tgt[tgt >= 10])  # per-batch pre-dedup
        return pa.table({"target": pa.array(tgt)})

    uniq = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow")
        .unique("target")
    )
    n = len(uniq)
    return pa.table({"n_new": pa.array([n], type=pa.int64())})


@register(
    "ngram_jaccard_neardup",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, t[j] || ' ' || t[j+1] AS g
      FROM toks, unnest(generate_series(1, len(t)-1)) AS s(j)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           i/(1.0*(sa.sz + sb.sz - i)) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE i/(1.0*(sa.sz + sb.sz - i)) >= 0.09
    """,
    doc="Exact n-gram-Jaccard similarity join (token bigrams, θ=0.09): "
    "explode distinct grams → bucketed inverted-index self-merge → "
    "packed-rank pair keys (a<<32|b, one int64 per pair) → bucketed "
    "count aggregation → exact Jaccard from integer counts.  At θ=0.09 "
    "prefix/df pruning is powerless on dense vocabularies (the prefix "
    "budget is ⌈θ·n⌉−1 grams/doc — measured here: candidates ≈ "
    "all-pairs either way), so the exact count pipeline is the honest "
    "shape; the packed keys keep every kernel a single numpy/pandas "
    "op and the pair shuffle at 8 bytes/key.",
)
def ngram_jaccard_neardup(
    sf_dir: str,
    dense_vocab_limit: int = 16_384,
    size_broadcast_cap: int = 100_000_000,
    hybrid: bool = True,
):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).repartition(32)
    return _ngram_jaccard_pipeline(
        docs,
        dense_vocab_limit=dense_vocab_limit,
        size_broadcast_cap=size_broadcast_cap,
        hybrid=hybrid,
    )


def _ngram_jaccard_pipeline(
    docs,
    dense_vocab_limit: int = 16_384,
    theta: float = 0.09,
    size_broadcast_cap: int = 100_000_000,
    hybrid: bool = True,
    allpairs_cap: int = 65_536,
):
    import ray

    THETA = theta

    def bigram_hashes(txt: str) -> np.ndarray:
        tk = txt.split(" ")
        gs = {tk[i] + " " + tk[i + 1] for i in range(len(tk) - 1)} if len(tk) >= 2 else set(tk)
        # stable 63-bit gram hash: cheaper to shuffle than strings;
        # collision over ~1e5 grams is ~1e-9 — negligible vs oracle
        return np.fromiter(
            (shingles.stable_hash64(g) & 0x7FFFFFFFFFFFFFFF for g in gs),
            dtype=np.int64, count=len(gs),
        )

    N_GH_BUCKETS = 64
    N_AGG_BUCKETS = 32

    def explode(t: pa.Table) -> pa.Table:
        ids, ghs = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            h = bigram_hashes(txt)
            ids.append(np.full(len(h), did, dtype=np.int64))
            ghs.append(h)
        did = np.concatenate(ids) if ids else np.zeros(0, dtype=np.int64)
        gh = np.concatenate(ghs) if ghs else np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did),
                "gh": pa.array(gh),
                "bucket": pa.array((gh % N_GH_BUCKETS).astype(np.int32)),
            }
        )

    # ONE bigram-hashing pass: sizes derive from the materialized grams
    # (doc rows are contiguous per block → per-batch unique counts, a
    # defensive driver-side sum handles any split)
    grams = docs.map_batches(explode, batch_format="pyarrow").materialize()

    def sizes_kernel(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["doc_id"].to_numpy(), return_counts=True)
        return pa.table(
            {"doc_id": pa.array(u), "sz": pa.array(c.astype(np.int64))}
        )

    sizes_parts = grams.map_batches(
        sizes_kernel, batch_format="pyarrow", batch_size=None
    ).materialize()
    # regime crossover: the (id, size) broadcast is 16 B/doc — ~1.6 GB
    # at 10^8 docs, the stated cap.  Past it, sizes stay a Dataset and
    # pair rows pick them up via two hash joins (same math, one extra
    # shuffle, no driver table).  sizes_parts.count() bounds the doc
    # count (partials per (block, doc); docs are block-contiguous so
    # it's within 2× of the true count — fine for a regime switch).
    if sizes_parts.count() > size_broadcast_cap:
        return _ngram_jaccard_join_regime(
            grams, sizes_parts, theta, n_agg_buckets=N_AGG_BUCKETS
        )
    sizes_df = (
        sizes_parts
        .to_pandas()
        .groupby("doc_id", as_index=False)["sz"].sum()
        .sort_values("doc_id")
    )
    ids_sorted = sizes_df["doc_id"].to_numpy(dtype=np.int64)
    sz_sorted = sizes_df["sz"].to_numpy(dtype=np.int64)
    assert len(ids_sorted) < (1 << 31), "packed pair keys need rank < 2^31"
    sref = ray.put((ids_sorted, sz_sorted))

    # regime dispatch: measure the distinct-gram vocabulary from cheap
    # per-batch uniques.  A DENSE corpus (vocabulary fits a broadcast)
    # makes candidate pairs ≈ all pairs, so the inverted index's Σdf²
    # pair-row shuffle is pure overhead — blocked bitset tiles (BLAS
    # intersection counts) are exact and output-bound there.  Sparse
    # vocabularies take the inverted-index path below.
    uniq = grams.map_batches(
        lambda t: pa.table({"gh": pa.array(np.unique(t["gh"].to_numpy()))}),
        batch_format="pyarrow",
    ).materialize()
    if dense_vocab_limit and uniq.count() <= max(262_144, dense_vocab_limit * 16):
        vocab = np.unique(uniq.to_pandas()["gh"].to_numpy())
        if len(vocab) <= dense_vocab_limit:
            from crawler_ray.stages.dedup import dense_bitset_jaccard_pairs

            return dense_bitset_jaccard_pairs(
                grams, vocab, ids_sorted, sz_sorted, THETA
            )

    # SKEW-SPLIT regime: vocabulary too large for one dense bitset, but
    # a zipfian df distribution makes the inverted index's Σdf² pair
    # volume explode on the hot head (each hot gram alone implies df²
    # candidate rows).  Put the top hot grams in a SMALL bitset (BLAS
    # tiles) and run the index only over the cheap cold tail; exact-
    # equal to the other regimes (tested).  Gated on doc count — the
    # tile grid is all-pairs in docs — and self-gated on measured cold
    # cost (returns None → fall through to the pure index).
    if hybrid and len(ids_sorted) <= allpairs_cap:
        from crawler_ray.stages.dedup import try_hybrid_jaccard

        res = try_hybrid_jaccard(
            grams, ids_sorted, sz_sorted, THETA, n_agg_buckets=N_AGG_BUCKETS
        )
        if res is not None:
            return res

    # bucket-parallel inverted-index pair generation: one vectorized
    # pandas self-merge per gh bucket; pairs packed to int64,
    # pre-counted with np.unique, and tagged with their aggregation
    # bucket before leaving — the downstream shuffle needs no extra scan
    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids_s, _ = ray.get(sref)
        df = pd.DataFrame(
            {
                "rk": np.searchsorted(ids_s, g["doc_id"].to_numpy()).astype(np.int64),
                "gh": g["gh"].to_numpy(),
            }
        )
        m = df.merge(df, on="gh", suffixes=("_a", "_b"))
        a = m["rk_a"].to_numpy()
        b = m["rk_b"].to_numpy()
        keep = a < b
        if keep.any():
            assert b[keep].max() < (1 << 32), "pair rank packing overflow"
        packed = (a[keep] << 32) | b[keep]
        pk, pi = np.unique(packed, return_counts=True)
        return pd.DataFrame(
            {
                "pk": pk.astype("int64"),
                "pi": pi.astype("int64"),
                "abkt": ((pk >> 32) % N_AGG_BUCKETS).astype("int32"),
            }
        )

    partials = grams.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")

    # global pair-count aggregation: sort+reduceat per agg bucket (the
    # keys are already ints; np beats a pandas groupby here)
    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pk = g["pk"].to_numpy()
        pi = g["pi"].to_numpy()
        order = np.argsort(pk, kind="stable")
        pk, pi = pk[order], pi[order]
        first = np.ones(len(pk), dtype=bool)
        first[1:] = pk[1:] != pk[:-1]
        starts = np.where(first)[0]
        return pd.DataFrame(
            {"pk": pk[starts], "i": np.add.reduceat(pi, starts) if len(starts) else pi[:0]}
        )

    pair_counts = partials.groupby("abkt").map_groups(
        lambda g: agg_bucket(g), batch_format="pandas"
    )

    class Jaccard:
        def __init__(self):
            self.ids, self.sz = ray.get(sref)

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = t["pk"].to_numpy().astype(np.int64)
            i = t["i"].to_numpy().astype(np.int64)
            ra = pk >> 32
            rb = pk & 0x7FFFFFFF
            sa = self.sz[ra]
            sb = self.sz[rb]
            j = i / (1.0 * (sa + sb - i))
            keep = j >= THETA
            return pa.table(
                {
                    "doc_a": pa.array(self.ids[ra[keep]]),
                    "doc_b": pa.array(self.ids[rb[keep]]),
                    "jaccard": pa.array(j[keep]),
                }
            )

    # concurrency=2: an actor pool ≥ session CPUs would starve the
    # upstream sort tasks and deadlock small sessions
    return pair_counts.map_batches(Jaccard, batch_format="pyarrow", concurrency=2)


def _ngram_jaccard_join_regime(
    grams, sizes_parts, theta: float, n_agg_buckets: int = 32, num_partitions: int = 32
):
    """Past-the-broadcast-cap regime of the n-gram Jaccard self-join:
    per-doc gram counts stay a Dataset and each surviving pair row picks
    up (sz_a, sz_b) via two hash joins — no driver-resident size table,
    no global rank array (that array is exactly what can't exist at
    10^9+ docs).  Candidate generation is the same per-gh-bucket
    inverted-index self-merge, carrying doc ids verbatim; pair partial
    counts aggregate under a mixed-hash bucket before the joins.
    Exact-equal to the broadcast regime (tested both ways)."""
    from ray.data.aggregate import Sum

    sizes_ds = (
        sizes_parts.groupby("doc_id").aggregate(Sum("sz", alias_name="sz")).materialize()
    )
    MIX = np.int64(-7046029254386353131)  # 0x9E3779B97F4A7C15 as signed

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "did": g["doc_id"].to_numpy().astype(np.int64),
                "gh": g["gh"].to_numpy(),
            }
        )
        m = df.merge(df, on="gh", suffixes=("_a", "_b"))
        a = m["did_a"].to_numpy()
        b = m["did_b"].to_numpy()
        keep = a < b
        a, b = a[keep], b[keep]
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.ones(len(a), dtype=bool)
        if len(a):
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.where(first)[0]
        ua, ub = a[starts], b[starts]
        cnt = (
            np.add.reduceat(np.ones(len(a), dtype=np.int64), starts)
            if len(starts)
            else np.zeros(0, dtype=np.int64)
        )
        with np.errstate(over="ignore"):
            mix = (ua * MIX) ^ ub
        return pd.DataFrame(
            {
                "doc_a": ua,
                "doc_b": ub,
                "pi": cnt,
                "abkt": ((mix & 0x7FFFFFFFFFFFFFFF) % n_agg_buckets).astype("int32"),
            }
        )

    partials = grams.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g["doc_a"].to_numpy()
        b = g["doc_b"].to_numpy()
        pi = g["pi"].to_numpy()
        order = np.lexsort((b, a))
        a, b, pi = a[order], b[order], pi[order]
        first = np.ones(len(a), dtype=bool)
        if len(a):
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.where(first)[0]
        return pd.DataFrame(
            {
                "doc_a": a[starts],
                "doc_b": b[starts],
                "i": np.add.reduceat(pi, starts) if len(starts) else pi[:0],
            }
        )

    # materialize() between shuffle stages: two hash-shuffle
    # JoinOperators (4-CPU aggregator pools each) plus the upstream
    # sorts in ONE streaming plan starve each other's task slots and
    # deadlock small sessions — the barrier lets each all-to-all own
    # the cluster in turn (same pattern as dedup.verify_pairs_joined)
    pair_counts = partials.groupby("abkt").map_groups(
        agg_bucket, batch_format="pandas"
    ).materialize()
    # adaptive partition count (same rule as dedup.verify_pairs_joined):
    # a 32-partition hash join demands a 4-CPU aggregator pool, which a
    # 4-CPU test session can't grant — scale partitions with the data
    num_partitions = int(np.clip(pair_counts.count() // 25_000, 2, num_partitions))

    j1 = pair_counts.join(
        sizes_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_a",),
        right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table(
            {"doc_a": t["doc_a"], "doc_b": t["doc_b"], "i": t["i"], "sz_a": t["sz"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    j2 = j1.join(
        sizes_ds,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_b",),
        right_on=("doc_id",),
    )

    empty = pa.table(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )

    def jaccard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        i = t["i"].to_numpy().astype(np.float64)
        sa = t["sz_a"].to_numpy().astype(np.float64)
        sb = t["sz"].to_numpy().astype(np.float64)
        j = i / (sa + sb - i)
        keep = j >= theta
        return pa.table(
            {
                "doc_a": pa.array(t["doc_a"].to_numpy()[keep], type=pa.int64()),
                "doc_b": pa.array(t["doc_b"].to_numpy()[keep], type=pa.int64()),
                "jaccard": pa.array(j[keep], type=pa.float64()),
            }
        )

    return j2.map_batches(jaccard, batch_format="pyarrow")


@register(
    "ngram_jaccard_sparse",
    """
    WITH junk AS (
      SELECT d.doc_id,
             (SELECT string_agg('w' || CAST((d.doc_id*37 + j*13) % 40000 AS VARCHAR),
                                ' ' ORDER BY j)
              FROM unnest(generate_series(0, 59)) s(j)) AS extra
      FROM documents d),
    aug AS (
      SELECT d.doc_id, d.text || ' ' || junk.extra AS text
      FROM documents d JOIN junk ON junk.doc_id = d.doc_id),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM aug),
    grams AS (
      SELECT DISTINCT doc_id, t[j] || ' ' || t[j+1] AS g
      FROM toks, unnest(generate_series(1, len(t)-1)) AS s(j)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           i/(1.0*(sa.sz + sb.sz - i)) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE i/(1.0*(sa.sz + sb.sz - i)) >= 0.09
    """,
    doc="The SPARSE-vocabulary regime of the exact n-gram-Jaccard "
    "similarity join: each document is augmented with 60 deterministic "
    "pseudo-unique tokens (doc_id*37 + j*13 mod 40000 — mirrored in "
    "SQL), blowing the distinct-bigram vocabulary past the dense "
    "bitset cap so the bucketed inverted-index path (pandas self-merge "
    "per gram bucket → packed-int64 pair counts) is exercised and "
    "ORACLE-CHECKED; dense dispatch is disabled explicitly.  The "
    "per-doc size broadcast carries a documented 10^8-doc cap (join "
    "regime beyond).",
)
def ngram_jaccard_sparse(sf_dir: str):
    def aug(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        txts = t["text"].to_pylist()
        out = [
            x + " " + " ".join(f"w{(did * 37 + j * 13) % 40000}" for j in range(60))
            for did, x in zip(ids, txts)
        ]
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(out)}
        )

    docs = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .repartition(32)
        .map_batches(aug, batch_format="pyarrow")
    )
    # hybrid off: this entry exists to exercise the pure inverted-index
    # regime at bench scale (the skew-split would grab the corpus's hot
    # natural-language bigrams and change what is being measured)
    return _ngram_jaccard_pipeline(docs, dense_vocab_limit=0, hybrid=False)


# =====================================================================
# Dedup / ANN / text / crawl pipelines (training-data operators)
# =====================================================================

_AUG_SQL = """
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             regexp_replace(text, '^[^ ]+', 'dupword') AS text
      FROM documents)
"""


def _augmented_docs(sf_dir: str):
    """documents ∪ deterministic near-dup copies (first token replaced)
    — same construction as the oracle's SQL ``aug`` CTE."""
    import re

    def dup(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        txts = t["text"].to_pylist()
        out_ids = list(ids) + [i + 100000 for i in ids]
        out_txt = list(txts) + [re.sub(r"^[^ ]+", "dupword", x, count=1) for x in txts]
        return pa.table(
            {"doc_id": pa.array(out_ids, type=pa.int64()), "text": pa.array(out_txt)}
        )

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        dup, batch_format="pyarrow"
    )


@register(
    "minhash_lsh_neardup",
    _AUG_SQL
    + """,
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM aug),
    grams AS (
      SELECT DISTINCT doc_id, t[j]||' '||t[j+1]||' '||t[j+2]||' '||t[j+3] AS g
      FROM toks, unnest(generate_series(1, len(t)-3)) AS s(j)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b, i/(1.0*(sa.sz + sb.sz - i)) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE i/(1.0*(sa.sz + sb.sz - i)) >= 0.9
    """,
    doc="MinHash+LSH near-duplicate detection (shingle→minhash→band→"
    "bucket groupby→exact-Jaccard verify) over documents plus "
    "deterministic near-dup copies.  ORACLE-CHECKED: at J≥0.9 with "
    "16 bands × 4 rows LSH miss probability is ~1e-25, so the sweep "
    "equals the oracle's exhaustive similarity join.",
)
def minhash_lsh_neardup(sf_dir: str):
    from crawler_ray.stages.dedup import doc_grams_table, lsh_neardup_pairs, verify_pairs_joined

    # ONE gram pass (and one materialize — of the small grams table,
    # not the full text corpus) feeds both candidate generation (gb31)
    # and verification (gb/sz); r3 verdict items 3 + 6
    grams = doc_grams_table(
        _augmented_docs(sf_dir), with_minhash_input=True
    ).materialize()
    pairs = lsh_neardup_pairs(None, threshold=0.9, grams_ds=grams)
    # distributed verify: candidate pairs hash-join back to the grams
    # table (semi-filtered to candidate ids) — no corpus-sized driver
    # materialization anywhere in the plan
    return verify_pairs_joined(
        pairs, grams.select_columns(["doc_id", "gb", "sz"]), threshold=0.9
    )


@register(
    "training_data_prep",
    _AUG_SQL
    + """,
    t AS (SELECT doc_id, text,
                 len(string_split(text, ' ')) AS ntok,
                 md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
          FROM aug),
    q AS (SELECT * FROM t WHERE ntok >= 5 AND ntok <= 100000),
    d1 AS (SELECT * FROM q
           QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
    toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM d1),
    grams AS (
      SELECT DISTINCT doc_id, tk[j]||' '||tk[j+1]||' '||tk[j+2]||' '||tk[j+3] AS g
      FROM toks, unnest(generate_series(1, len(tk)-3)) AS s(j)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    drops AS (
      SELECT DISTINCT doc_b
      FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                 JOIN sizes sb ON doc_b = sb.doc_id
      WHERE i/(1.0*(sa.sz + sb.sz - i)) >= 0.9),
    kept AS (SELECT * FROM d1 WHERE doc_id NOT IN (SELECT doc_b FROM drops))
    SELECT count(*) AS n_kept,
           CAST(sum(ntok) AS BIGINT) AS total_tokens,
           (SELECT count(*) FROM drops) AS n_neardup_dropped
    FROM kept
    """,
    doc="END-TO-END training-data prep (the flagship LLM-pipeline "
    "composite): quality filter (token bounds) → exact dedup "
    "(fingerprint first-wins) → MinHash-LSH near-dup removal (drop "
    "the larger id of each J≥0.9 pair) → corpus stats.  Every stage "
    "is a Dataset transform (pipelines/dataprep.py); ORACLE-CHECKED "
    "end to end against the equivalent SQL (LSH recall argument as "
    "minhash_lsh_neardup).",
)
def training_data_prep(sf_dir: str):
    from crawler_ray.pipelines.dataprep import prepare_training_data

    # NO materialize: prepare_training_data's quality stage is the one
    # consumer and it materializes its own output — pinning aug too is
    # a pure extra corpus copy (r3 verdict item 3; A/B: 7.5→6.6 s)
    aug = _augmented_docs(sf_dir)
    _, drop_ids, stats = prepare_training_data(aug)
    return pa.table(
        {
            "n_kept": pa.array([stats["n_kept"]], type=pa.int64()),
            "total_tokens": pa.array([stats["total_tokens"]], type=pa.int64()),
            "n_neardup_dropped": pa.array([stats["n_neardup_dropped"]], type=pa.int64()),
        }
    )


@register(
    "simhash_neardup",
    _AUG_SQL
    + r""",
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM aug),
    grams AS (
      SELECT DISTINCT doc_id, tk[j] || ' ' || tk[j+1] AS g
      FROM toks, unnest(generate_series(1, len(tk) - 1)) AS s(j)
      WHERE len(tk) >= 2
      UNION
      SELECT doc_id, tk[1] AS g FROM toks WHERE len(tk) = 1),
    bits AS (
      SELECT doc_id, b.b AS bit,
             sum(CASE WHEN (md5_number_lower(g) >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS acc
      FROM grams, unnest(generate_series(0, 63)) AS b(b)
      GROUP BY doc_id, b.b),
    sim0 AS (
      SELECT doc_id,
             sum(CASE WHEN acc > 0 THEN (CAST(1 AS HUGEINT) << bit) ELSE CAST(0 AS HUGEINT) END) AS h
      FROM bits GROUP BY doc_id),
    allsim AS (
      SELECT a.doc_id, CAST(coalesce(s.h, 0) AS UBIGINT) AS h
      FROM aug a LEFT JOIN sim0 s ON s.doc_id = a.doc_id),
    chunks AS (
      SELECT doc_id, c.ci AS ci, CAST((h >> (16 * c.ci)) & 65535 AS INTEGER) AS cv
      FROM allsim, unnest(generate_series(0, 3)) AS c(ci)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id),
    ham AS (
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(sa.h, sb.h)) AS BIGINT) AS hamming
      FROM cand JOIN allsim sa ON sa.doc_id = cand.doc_a
                JOIN allsim sb ON sb.doc_id = cand.doc_b)
    SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
    """,
    doc="SimHash near-dup sweep (64-bit, whitespace-token bigrams, "
    "md5_number_lower gram hash) with the pigeonhole 4×16-bit chunk "
    "trick for guaranteed-recall candidates at hamming ≤ 3.  "
    "ORACLE-CHECKED: the gram hash is DuckDB's md5_number_lower "
    "(shingles.md5_hash64, byte-order verified), so the SQL computes "
    "the bit-identical simhash, the same chunk-equality candidate set "
    "(recall is exact by pigeonhole on both sides), and the same "
    "Hamming verdicts.  The reference-normalized blake2b variant "
    "(shingles.simhash64) remains the crawl-side default, "
    "brute-force-checked in tests.",
)
def simhash_neardup(sf_dir: str):
    from crawler_ray.functions.shingles import simhash64_md5
    from crawler_ray.stages.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(
        _augmented_docs(sf_dir), max_hamming=3, simhash_fn=simhash64_md5
    )


_LANGID_PROF_VALUES = ", ".join(
    f"('{lang}', {prio}, '{bg}')"
    for prio, (lang, prof) in enumerate(
        [(l, p) for l, p in textstats._LANG_PROFILES.items() if p]
    )
    for bg in prof
)

@register(
    "langid_heuristic",
    f"""
    WITH base AS (
      SELECT doc_id,
             regexp_matches(substr(text, 1, 400), '[一-鿿]') AS cjk,
             regexp_replace(substr(lower(text), 1, 1000), '[^a-z ]', '', 'g') AS t
      FROM documents),
    bg AS (
      SELECT doc_id, substr(t, j, 2) AS b
      FROM base, unnest(generate_series(1, len(t) - 1)) AS s(j)
      WHERE NOT cjk AND strpos(substr(t, j, 2), ' ') = 0),
    cnt AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b),
    top AS (
      SELECT doc_id, b FROM (
        SELECT doc_id, b,
               row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, b) AS rk
        FROM cnt) WHERE rk <= 20),
    prof(lang, prio, b) AS (VALUES {_LANGID_PROF_VALUES}),
    langs AS (SELECT DISTINCT lang, prio FROM prof),
    score AS (
      SELECT d.doc_id, l.lang, l.prio, count(t2.b) AS s
      FROM base d CROSS JOIN langs l
      LEFT JOIN prof p ON p.lang = l.lang
      LEFT JOIN top t2 ON t2.doc_id = d.doc_id AND t2.b = p.b
      WHERE NOT d.cjk
      GROUP BY d.doc_id, l.lang, l.prio),
    best AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, prio) AS rk
        FROM score) WHERE rk = 1),
    pred AS (
      SELECT doc_id, 'zh' AS pred_lang FROM base WHERE cjk
      UNION ALL
      SELECT doc_id, lang AS pred_lang FROM best)
    SELECT pred_lang, count(*) AS n FROM pred GROUP BY pred_lang
    """,
    doc="Language-ID heuristic (char-bigram profiles + CJK codepoint "
    "check, functions/textstats.py:96) over the text column → "
    "predicted-language histogram.  ORACLE-CHECKED: the heuristic is "
    "pure string arithmetic, mirrored exactly in SQL (same 1000-char "
    "prefix, same top-20 tie-break on (count desc, bigram asc), same "
    "profile-priority argmax en<es<fr<de).",
)
def langid_heuristic(sf_dir: str):
    from ray.data.aggregate import Count

    def pred(t: pa.Table) -> pa.Table:
        langs = [textstats.detect_lang(x) for x in t["text"].to_pylist()]
        return pa.table({"pred_lang": pa.array(langs, type=pa.string())})

    return (
        _read(sf_dir, "documents", columns=["text"])
        .map_batches(pred, batch_format="pyarrow")
        .groupby("pred_lang")
        .aggregate(Count(alias_name="n"))
    )


@register(
    "rolling_fingerprints",
    r"""
    WITH toks AS (
      SELECT source,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM documents),
    wins AS (
      SELECT source, md5(array_to_string(tk[j:j+7], ' ')) AS fp
      FROM toks, unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS s(j)
      WHERE len(tk) >= 1),
    kept AS (SELECT DISTINCT source, fp FROM wins WHERE substr(fp, 32, 1) = '0')
    SELECT source, count(*) AS n_fingerprints FROM kept GROUP BY source
    """,
    doc="Winnowing-style window document fingerprints (8-token windows, "
    "md5 window hash, keep ≡0 mod 16 sparse sketch) → distinct kept "
    "fingerprint count per source.  ORACLE-CHECKED: the window hash is "
    "md5 of the space-joined run (textstats.md5_window_fingerprints), "
    "which DuckDB computes verbatim; the fast rolling-polynomial "
    "variant (textstats.rolling_fingerprints) remains for hot paths "
    "and is pytest-equivalence-checked on the keep-set semantics.",
)
def rolling_fingerprints_q(sf_dir: str):
    from ray.data.aggregate import Count

    def fp(t: pa.Table) -> pa.Table:
        srcs, fps = [], []
        for s, x in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for h in set(textstats.md5_window_fingerprints(x, window=8)):
                if h.endswith("0"):  # low-nibble-zero sparse sketch (mod 16)
                    srcs.append(s)
                    fps.append(h)
        return pa.table(
            {"source": pa.array(srcs), "fp": pa.array(fps, type=pa.string())}
        )

    pairs = (
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(fp, batch_format="pyarrow")
        .groupby(["source", "fp"])
        .aggregate(Count(alias_name="_n"))
    )
    return pairs.groupby("source").aggregate(Count(alias_name="n_fingerprints"))


@register(
    "ann_ivf_topk",
    """
    WITH ranked AS (
      SELECT vec_id, embedding,
             row_number() OVER (ORDER BY vec_id) - 1 AS rn
      FROM embeddings),
    cents AS (SELECT rn AS cid, embedding FROM ranked WHERE rn < 8),
    qs    AS (SELECT rn AS qid, embedding FROM ranked WHERE rn < 5),
    assign AS (
      SELECT vec_id, bucket FROM (
        SELECT e.vec_id, c.cid AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.embedding) DESC,
                          c.cid) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
    probe AS (
      SELECT qid, cid FROM (
        SELECT q.qid, c.cid,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                          c.cid) AS rk
        FROM qs q CROSS JOIN cents c) WHERE rk <= 4),
    topk AS (
      SELECT p.qid AS query_id, a.vec_id,
             row_number() OVER (PARTITION BY p.qid
               ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                        a.vec_id) AS rank
      FROM probe p
      JOIN assign a ON a.bucket = p.cid
      JOIN qs q ON q.qid = p.qid
      JOIN embeddings e ON e.vec_id = a.vec_id)
    SELECT query_id, vec_id, rank FROM topk WHERE rank <= 10
    """,
    doc="IVF approximate nearest neighbour CONTRACT, oracle-checked: "
    "vectors bucketed by nearest centroid (one shuffle, "
    "stages/ann.py ivf_bucket), queries probe the nprobe=4 nearest "
    "buckets, exact top-k within probed cells.  Centroids here are the "
    "deterministic seed set (first 8 vectors by vec_id) so DuckDB can "
    "derive the identical quantizer; the k-means-trained path "
    "(train_centroids) keeps its recall-vs-brute-force pytest.  Ranks "
    "are FP-stable per the ann_cosine_topk margin argument (adjacent "
    "cosines ≥3e-4 apart vs ≤2e-7 engine disagreement).",
)
def ann_ivf_topk(sf_dir: str):
    import numpy as np

    from crawler_ray.stages.ann import ivf_bucket, ivf_topk

    head = _head_by_id(sf_dir, 8)
    cents = np.array(head["embedding"].to_list(), dtype=np.float64)
    queries = cents[:5]
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    bucketed = ivf_bucket(ds, cents)
    out = ivf_topk(bucketed, cents, queries, k=10, nprobe=4)
    return out[["query_id", "vec_id", "rank"]]


@register(
    "crawl_bfs",
    """
    WITH RECURSIVE docs AS (
      SELECT source, doc_id,
             CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS BIGINT) AS rk,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents),
    pages AS (
      SELECT source, doc_id, rk, n,
             'http://' || source || '.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
             (rk % 5 = 0) AS is_index
      FROM docs),
    tgt AS (
      SELECT p.source, p.rk AS src, (p.rk * 131 + t.j * 17 + 7) % p.n AS dst
      FROM pages p, unnest(generate_series(0, 7)) AS t(j)
      WHERE p.is_index),
    edges AS (
      SELECT source, rk AS src, CAST(0 AS BIGINT) AS dst FROM pages
      UNION ALL
      SELECT source, src, dst FROM tgt
      UNION ALL
      SELECT source, rk AS src, rk + 5 AS dst FROM pages WHERE is_index AND rk + 5 < n),
    bfs AS (
      SELECT source, CAST(0 AS BIGINT) AS rk, 0 AS depth FROM pages WHERE rk = 0
      UNION
      SELECT e.source, e.dst, b.depth + 1
      FROM bfs b JOIN edges e ON e.source = b.source AND e.src = b.rk
      WHERE b.depth < (SELECT count(*) FROM documents)),
    reach AS (SELECT source, rk, min(depth) AS depth FROM bfs GROUP BY source, rk),
    cdist AS (SELECT source, src AS rk, count(DISTINCT dst) AS c FROM tgt GROUP BY source, src)
    SELECT p.url,
           CAST(r.depth AS INTEGER) AS depth,
           'ok' AS status,
           CASE WHEN p.is_index THEN coalesce(cd.c, 0) <= 3 ELSE TRUE END AS is_leaf,
           CAST(CASE WHEN p.is_index
                     THEN 9 + CASE WHEN p.rk + 5 < p.n THEN 1 ELSE 0 END
                     ELSE 1 END AS INTEGER) AS n_links
    FROM reach r
    JOIN pages p ON p.source = r.source AND p.rk = r.rk
    LEFT JOIN cdist cd ON cd.source = p.source AND cd.rk = p.rk
    """,
    doc="The flagship BSP crawl (frontier + sharded URL-seen + "
    "politeness + robots + near-dup) over the site graph derived "
    "deterministically from the documents table; returns the crawl "
    "trace.  ORACLE-CHECKED: synth.derive_from_documents is pure "
    "arithmetic over (source, doc_id-rank) — per-source rank rk, "
    "index pages at rk%5==0 linking Home→rk0, 8 targets "
    "(rk*131+j*17+7)%n and a pager rk+5 — so DuckDB rebuilds the "
    "same edge set, a bounded recursive-CTE BFS reproduces the "
    "wave-level depths (depth-then-discovery frontier ≡ BFS at "
    "wave_size=None), is_leaf mirrors the extractor's "
    "max-distinct-href-group ≤ 3 richness rule, and n_links the raw "
    "extract_links count.  Per-URL ORDER conformance (not just the "
    "depth partial order) is asserted separately in "
    "tests/test_crawl_conformance.py.",
)
def crawl_bfs(sf_dir: str):
    from crawler_ray import synth
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl

    docs = pq.read_table(_pq(sf_dir, "documents"))
    pages = synth.derive_from_documents(docs)
    # seeds: the first index page of every source host
    rows = pages.to_pylist()
    first_per_host: dict[str, str] = {}
    for r in rows:
        if not r["is_leaf"] and r["host"] not in first_per_host:
            first_per_host[r["host"]] = r["doc_id"]
    seeds = sorted(first_per_host.values())
    res = crawl(pages, seeds, CrawlConfig(wave_size=None, n_seen_shards=4, fetch_concurrency=4))
    t = res.trace_table()
    return t.select(["url", "depth", "status", "is_leaf", "n_links"])


@register(
    "window_rank",
    """
    WITH r AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders)
    SELECT o_custkey, o_orderkey, rk FROM r WHERE rk <= 2
    """,
    doc="Windowed rank (top-2 orders per customer): high-cardinality "
    "partition-by via coarse bucket shuffle + vectorized pandas "
    "rank within buckets (the >10^4-group groupby pattern).",
)
def window_rank(sf_dir: str):
    import pandas as pd

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["o_custkey"], index=False).to_numpy()
        df = df.copy()
        df["__b"] = (h % 32).astype("int32")
        return df

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True])
        g["rk"] = g.groupby("o_custkey").cumcount() + 1
        out = g[g["rk"] <= 2][["o_custkey", "o_orderkey", "rk"]]
        return out.astype({"rk": "int64"})

    return (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(lambda g: rank_bucket(g.drop(columns="__b")), batch_format="pandas")
    )


@register(
    "union_distinct",
    """
    SELECT count(DISTINCT k) AS n
    FROM (SELECT l_orderkey AS k FROM lineitem
          UNION ALL
          SELECT o_orderkey AS k FROM orders)
    """,
    doc="Union + global distinct count (ds.union + unique — the "
    "observed∪crawled set-union metric shape, crawl.clj:736-737).",
)
def union_distinct(sf_dir: str):
    li = _read(sf_dir, "lineitem", columns=["l_orderkey"]).map_batches(
        lambda t: t.rename_columns(["k"]), batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        lambda t: t.rename_columns(["k"]), batch_format="pyarrow"
    )
    # per-batch pre-dedup, then one distinct shuffle
    import numpy as np

    pre = li.union(orders).map_batches(
        lambda t: pa.table({"k": pa.array(np.unique(t["k"].to_numpy()))}),
        batch_format="pyarrow",
    )
    n = len(pre.unique("k"))
    return pa.table({"n": pa.array([n], type=pa.int64())})


@register(
    "json_props_stats",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
    FROM events GROUP BY k_bucket
    """,
    doc="Semi-structured property extraction: parse the JSON props "
    "column per batch, bucket the extracted field, aggregate — the "
    "schema-on-read operator shape (integer outputs, exact oracle).",
)
def json_props_stats(sf_dir: str):
    import json

    def extract(t: pa.Table) -> pa.Table:
        ks = [int(json.loads(p)["k"]) for p in t["props"].to_pylist()]
        out = pa.table(
            {
                "k_bucket": pa.array([k // 10 for k in ks], type=pa.int64()),
                "k": pa.array(ks, type=pa.int64()),
            }
        )
        return make_partial_agg(["k_bucket"], ["k"])(out)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "events", columns=["props"])
        .map_batches(extract, batch_format="pyarrow")
        .groupby("k_bucket")
        .aggregate(Sum("partial_n", alias_name="n"), Sum("k_sum", alias_name="k_sum"))
    )


@register(
    "filter_sum_scan",
    """
    SELECT count(*) AS n,
           sum(CAST(floor(l_extendedprice*l_discount*100 + 0.5) AS BIGINT))/100.0
             AS discount_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H-Q6-shaped predicate scan + global sum: column-pruned "
    "read, vectorized Arrow filter, integer-cents reduction.",
)
def filter_sum_scan(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
                pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        rev_c = cents(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        return pa.table(
            {
                "k": pa.array([0] * t.num_rows, type=pa.int32()),
                "rev_c": rev_c,
                "one": pa.array([1] * t.num_rows, type=pa.int64()),
            }
        ).group_by(["k"]).aggregate([("rev_c", "sum"), ("one", "sum")])

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "lineitem", columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("rev_c_sum", alias_name="rev_c"), Sum("one_sum", alias_name="n"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "n": t["n"],
                "discount_revenue": pc.divide(pc.cast(t["rev_c"], pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


@register(
    "semi_join_exists",
    """
    SELECT o_orderstatus, count(*) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderstatus
    """,
    doc="Semi-join (EXISTS): distinct qualifying keys pre-aggregated "
    "per batch, broadcast as a sorted array, searchsorted membership "
    "filter — no row-level shuffle.",
)
def semi_join_exists(sf_dir: str):
    import ray

    # build side computed DISTRIBUTED: lineitem (the largest fact table)
    # never touches the driver — each batch emits its distinct qualifying
    # keys, and only that small filtered key set is collected + broadcast
    # (r2 verdict: the old driver-side pq.read_table was an OOM at scale)
    def qual(t: pa.Table) -> pa.Table:
        k = t.filter(pc.greater(t["l_quantity"], pa.scalar(45.0)))["l_orderkey"].to_numpy()
        return pa.table({"k": pa.array(np.unique(k))})

    key_parts = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
        .map_batches(qual, batch_format="pyarrow")
        .to_pandas()
    )
    keys = np.unique(key_parts["k"].to_numpy())
    ref = ray.put(keys)

    class Semi:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ok = t["o_orderkey"].to_numpy()
            idx = np.clip(np.searchsorted(self.keys, ok), 0, max(len(self.keys) - 1, 0))
            hit = (len(self.keys) > 0) & (self.keys[idx] == ok)
            t = t.filter(pa.array(hit))
            return pa.table({"o_orderstatus": t["o_orderstatus"]}).group_by(
                ["o_orderstatus"]
            ).aggregate([([], "count_all")]).rename_columns(["o_orderstatus", "pn"])

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
        .map_batches(Semi, batch_format="pyarrow", concurrency=2)
        .groupby("o_orderstatus")
        .aggregate(Sum("pn", alias_name="n"))
    )


# =====================================================================
# Round-3 training-data operators: substring dedup, stratified sample,
# k-means semantic clustering, heavy hitters
# =====================================================================


@register(
    "duplicate_substrings",
    r"""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             regexp_replace(text, '^[^ ]+', 'dupword') AS text
      FROM documents),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM aug),
    wins AS (
      SELECT doc_id, md5(array_to_string(tk[j:j+7], ' ')) AS fp
      FROM toks, unnest(generate_series(1, greatest(len(tk) - 7, 1))) AS s(j)
      WHERE len(tk) >= 1),
    kept AS (SELECT DISTINCT doc_id, fp FROM wins WHERE substr(fp, 32, 1) = '0'),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b, shared_fps FROM pairs WHERE shared_fps >= 2
    """,
    doc="Cross-document duplicated-SUBSTRING detection (the suffix-level "
    "exact dedup of 'Deduplicating Training Data Makes Language Models "
    "Better', Lee et al. 2022, done the winnowing way): every 8-token "
    "window is fingerprinted (md5, SQL-mirrorable), a deterministic "
    "1/16 sparse keep (low hex nibble 0) samples each doc's windows, "
    "and docs sharing >=2 kept fingerprints are reported with their "
    "shared-window count.  A shared run of R tokens yields ~(R-7)/16 "
    "kept windows, so long verbatim overlaps are caught w.h.p. while "
    "the shuffle carries 1/16th of the corpus windows, 24 B/row.  "
    "Fingerprints group in hash buckets (one shuffle); genuine "
    "duplication is the only df>1 source, so per-bucket self-merge "
    "volume tracks true overlap, not corpus size.",
)
def duplicate_substrings(sf_dir: str):
    from .stages.relational import bucketed_agg

    N_FP_BUCKETS = 32

    def kept_fps(t: pa.Table) -> pa.Table:
        ids, fps = [], []
        for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for h in set(textstats.md5_window_fingerprints(x, window=8)):
                if h.endswith("0"):
                    ids.append(did)
                    fps.append(h)
        b = (
            np.array([int(f[:8], 16) for f in fps], dtype=np.int64) % N_FP_BUCKETS
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "fp": pa.array(fps, type=pa.string()),
                "fpb": pa.array(b),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="fp", suffixes=("_a", "_b"))
        a = m["doc_id_a"].to_numpy()
        b = m["doc_id_b"].to_numpy()
        keep = a < b
        if keep.any():
            assert a[keep].min() >= 0 and b[keep].max() < (1 << 32), \
                "doc_id pair packing overflow"
        pk, c = np.unique((a[keep] << 32) | b[keep], return_counts=True)
        return pd.DataFrame(
            {
                "doc_a": (pk >> 32).astype("int64"),
                "doc_b": (pk & 0xFFFFFFFF).astype("int64"),
                "c": c.astype("int64"),
            }
        )

    fps = _augmented_docs(sf_dir).map_batches(kept_fps, batch_format="pyarrow")
    partials = fps.groupby("fpb").map_groups(pairs_in_bucket, batch_format="pandas")
    counts = bucketed_agg(partials, ["doc_a", "doc_b"], {"c": "shared_fps"})

    def thresh(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["shared_fps"], pa.scalar(2)))

    return counts.map_batches(thresh, batch_format="pyarrow")


@register(
    "stratified_sample",
    """
    WITH pri AS (
      SELECT lang, doc_id,
             md5_number_lower(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    r AS (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
          FROM pri)
    SELECT lang, doc_id FROM r WHERE rk <= 40
    """,
    doc="Deterministic stratified sampling for training-mix rebalancing: "
    "per language stratum, keep the 40 documents with the smallest "
    "(md5(doc_id), doc_id) priority — a hash-priority sample, i.e. a "
    "uniform random sample that is REPRODUCIBLE and mergeable: each "
    "batch keeps its local 40-smallest per stratum (a combiner, so the "
    "shuffle carries <= strata*40 rows per batch), and a per-stratum "
    "merge keeps the global 40-smallest.  The same idea scales to "
    "billions of rows per stratum because no stratum is ever "
    "materialized.  Hash is md5_number_lower-compatible "
    "(shingles.md5_hash64) so DuckDB derives identical priorities.",
)
def stratified_sample(sf_dir: str, cap: int = 40):
    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [shingles.md5_hash64(str(i)) for i in df["doc_id"].to_numpy()],
            dtype=np.uint64,
        )
        df = df.assign(__h=h)
        df = df.sort_values(["lang", "__h", "doc_id"], kind="stable")
        return df.groupby("lang", as_index=False, sort=False).head(cap)

    def final_top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", "doc_id"], kind="stable").head(cap)
        return g[["lang", "doc_id"]]

    return (
        _read(sf_dir, "documents", columns=["lang", "doc_id"])
        .map_batches(local_top, batch_format="pandas")
        .groupby("lang")
        .map_groups(final_top, batch_format="pandas")
    )


@register(
    "kmeans_clusters",
    """
    WITH ranked AS (
      SELECT vec_id, embedding,
             row_number() OVER (ORDER BY vec_id) - 1 AS rn
      FROM embeddings),
    c0 AS (SELECT rn AS cid, embedding FROM ranked WHERE rn < 8),
    a1 AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.embedding) DESC,
                          c.cid) AS rk
        FROM embeddings e CROSS JOIN c0 c) WHERE rk = 1),
    flat AS (
      SELECT a1.cid, j AS idx, avg(CAST(e.embedding[j] AS DOUBLE)) AS m
      FROM embeddings e JOIN a1 USING (vec_id),
           unnest(generate_series(1, len(e.embedding))) AS s(j)
      GROUP BY a1.cid, j),
    c1 AS (SELECT cid, array_agg(m ORDER BY idx) AS embedding FROM flat GROUP BY cid)
    SELECT vec_id, cid AS cluster FROM (
      SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.embedding, c.embedding) DESC,
                        c.cid) AS rk
      FROM embeddings e CROSS JOIN c1 c) WHERE rk = 1
    """,
    doc="Distributed k-means (one Lloyd refinement from the deterministic "
    "seed set: first 8 vectors by vec_id) — the clustering stage of "
    "SemDeDup-style semantic dedup and of IVF index training.  Each "
    "assignment pass is a broadcast of the 8 x dim centroid matrix + "
    "one vectorized argmax per batch; the centroid update is the "
    "combiner pattern (per-batch per-cluster vector sums + counts, "
    "8 rows/batch, merged on the driver) so nothing corpus-sized "
    "moves.  Cosine ranking mirrors DuckDB list_cosine_similarity; "
    "stability per the ann_cosine_topk margin argument (cluster "
    "separation >> 1e-12 engine FP disagreement on the means).",
)
def kmeans_clusters(sf_dir: str, k: int = 8):
    import ray

    head = _head_by_id(sf_dir, k)
    cents0 = np.array(head["embedding"].to_list(), dtype=np.float64)

    def assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
        # cosine argmax, ties to the lower cid (matches ORDER BY ... cid)
        sims = (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ (
            cents / np.linalg.norm(cents, axis=1, keepdims=True)
        ).T
        return np.argmax(sims, axis=1).astype(np.int64)  # first max wins

    c0_ref = ray.put(cents0)

    def partial_sums(t: pa.Table) -> pa.Table:
        cents = ray.get(c0_ref)
        mat = list_col_to_matrix(t["embedding"])
        cid = assign(mat, cents)
        sums = np.zeros((len(cents), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, cid, mat)
        n = np.bincount(cid, minlength=len(cents)).astype(np.int64)
        return pa.table(
            {
                "cid": pa.array(np.arange(len(cents), dtype=np.int64)),
                "s": pa.array(list(sums)),
                "n": pa.array(n),
            }
        )

    parts = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(partial_sums, batch_format="pyarrow")
        .to_pandas()
    )
    sums = np.zeros_like(cents0)
    ns = np.zeros(k, dtype=np.int64)
    for cid, s, n in zip(parts["cid"], parts["s"], parts["n"]):
        sums[cid] += np.asarray(s, dtype=np.float64)
        ns[cid] += n
    # empty clusters keep their seed (cannot happen with seed vectors
    # assigned to themselves at sim=1, but guard the division)
    cents1 = np.where(ns[:, None] > 0, sums / np.maximum(ns, 1)[:, None], cents0)
    c1_ref = ray.put(cents1)

    def final_assign(t: pa.Table) -> pa.Table:
        cents = ray.get(c1_ref)
        mat = list_col_to_matrix(t["embedding"])
        return pa.table(
            {"vec_id": t["vec_id"], "cluster": pa.array(assign(mat, cents))}
        )

    return _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        final_assign, batch_format="pyarrow"
    )


@register(
    "heavy_hitters",
    r"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM documents),
    grams AS (
      SELECT tk[j] || ' ' || tk[j+1] AS g
      FROM toks, unnest(generate_series(1, len(tk) - 1)) AS s(j)),
    tot AS (SELECT count(*) AS n FROM grams),
    cnt AS (SELECT g, count(*) AS c FROM grams GROUP BY g)
    SELECT g, c FROM cnt, tot WHERE c >= greatest(n // 1000 + 1, 10)
    """,
    doc="Heavy hitters over token-bigram OCCURRENCES with a bounded-"
    "memory sketch + exact verify (the sketch-then-recount pattern): "
    "pass 1 keeps each batch's top-4000 bigrams by exact batch count "
    "(dropping a non-top item loses <= N_batch/4000, so summed sketch "
    "counts undercount by <= N/4000 total); candidates are sketch "
    "counts >= T - N/4000 with T = max(N//1000 + 1, 10), which "
    "provably contains every true heavy hitter; pass 2 recounts ONLY "
    "the broadcast candidate set exactly.  Both passes are per-batch "
    "np.unique + a key-bucketed sum — no vocabulary-sized shuffle, "
    "sketch state is O(batches x 4000) rows, and the driver only ever "
    "sees the candidate list.",
)
def heavy_hitters(sf_dir: str, sketch_k: int = 4000, divisor: int = 1000):
    import ray

    from .stages.relational import bucketed_agg

    def bigrams(txt: str) -> list[str]:
        tk = [t for t in txt.lower().split() if t]
        return [tk[i] + " " + tk[i + 1] for i in range(len(tk) - 1)]

    def sketch(t: pa.Table) -> pa.Table:
        allg: list[str] = []
        for x in t["text"].to_pylist():
            allg.extend(bigrams(x))
        g, c = np.unique(np.array(allg, dtype=object), return_counts=True)
        if len(g) > sketch_k:
            keep = np.argsort(-c, kind="stable")[:sketch_k]
            g, c = g[keep], c[keep]
        out = pa.table(
            {"g": pa.array(g, type=pa.string()), "c": pa.array(c.astype(np.int64))}
        )
        return out.append_column("nb", pa.array(np.full(len(g), len(allg), dtype=np.int64) if len(g) else np.zeros(0, dtype=np.int64)))

    docs = _read(sf_dir, "documents", columns=["text"]).materialize()
    sk = docs.map_batches(sketch, batch_format="pyarrow").materialize()
    # total N: each sketch row repeats its batch total; distinct per
    # batch is overkill at this row count — sum nb/rows via first-row
    # trick is fragile, so recompute N exactly from a cheap scan
    ntot = int(
        docs.map_batches(
            lambda t: pa.table(
                {"n": pa.array([sum(len(bigrams(x)) for x in t["text"].to_pylist())])}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["n"]
        .sum()
    )
    T = max(ntot // divisor + 1, 10)
    approx = bucketed_agg(
        sk.drop_columns(["nb"]), ["g"], {"c": "ac"}, key_dtypes={"g": "object"}
    )
    cand = approx.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["ac"], pa.scalar(max(T - ntot // sketch_k, 1)))
        ).select(["g"]),
        batch_format="pyarrow",
    ).to_pandas()
    cand_sorted = np.sort(cand["g"].to_numpy(dtype=object))
    cref = ray.put(cand_sorted)

    def recount(t: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        allg: list[str] = []
        for x in t["text"].to_pylist():
            allg.extend(bigrams(x))
        g, c = np.unique(np.array(allg, dtype=object), return_counts=True)
        if len(cs) and len(g):
            idx = np.clip(np.searchsorted(cs, g), 0, len(cs) - 1)
            hit = cs[idx] == g
            g, c = g[hit], c[hit]
        else:
            g, c = g[:0], c[:0]
        return pa.table(
            {"g": pa.array(g, type=pa.string()), "c": pa.array(c.astype(np.int64))}
        )

    exact = bucketed_agg(
        docs.map_batches(recount, batch_format="pyarrow"),
        ["g"],
        {"c": "c"},
        key_dtypes={"g": "object"},
    )
    return exact.map_batches(
        lambda t: t.filter(pc.greater_equal(t["c"], pa.scalar(T))),
        batch_format="pyarrow",
    )


@register(
    "dedup_components",
    r"""
    WITH RECURSIVE aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             regexp_replace(text, '^[^ ]+', 'dupword') AS text
      FROM documents),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM aug),
    grams AS (
      SELECT DISTINCT doc_id, t[j]||' '||t[j+1]||' '||t[j+2]||' '||t[j+3] AS g
      FROM toks, unnest(generate_series(1, len(t)-3)) AS s(j)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                 JOIN sizes sb ON doc_b = sb.doc_id
      WHERE i/(1.0*(sa.sz + sb.sz - i)) >= 0.9),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b AS u, doc_a AS v FROM pairs),
    r(n, lbl) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, r.lbl FROM r JOIN edges e ON e.u = r.n)
    SELECT n AS doc_id, min(lbl) AS component FROM r GROUP BY n
    """,
    doc="Near-dup CLUSTER formation at scale: MinHash-LSH verified "
    "pairs (J>=0.9, the oracle-equal sweep) -> DISTRIBUTED connected "
    "components via sharded-actor delta min-label propagation "
    "(stages/cc.py): adjacency lives sharded as CSR, each round only "
    "CHANGED nodes push their label to neighbours shard->shard through "
    "the object store, and the driver sees per-shard changed-counts "
    "only — the scale path replacing the driver union-find "
    "(dedup.connected_components) for 10^9-edge pair sets.  Component "
    "label = min reachable doc_id, mirrored by the oracle's recursive "
    "CTE.",
)
def dedup_components(sf_dir: str):
    from crawler_ray.stages.cc import cc_label_propagation
    from crawler_ray.stages.dedup import (
        doc_grams_table,
        lsh_neardup_pairs,
        verify_pairs_joined,
    )

    grams = doc_grams_table(
        _augmented_docs(sf_dir), with_minhash_input=True
    ).materialize()  # one gram pass + one small materialize (see minhash_lsh_neardup)
    pairs = verify_pairs_joined(
        lsh_neardup_pairs(None, threshold=0.9, grams_ds=grams),
        grams.select_columns(["doc_id", "gb", "sz"]),
        threshold=0.9,
    )
    return cc_label_propagation(pairs)


@register(
    "interval_join",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click')
    SELECT p.event_id, count(c.cts) AS n_clicks
    FROM p LEFT JOIN c ON c.user_id = p.user_id
      AND c.cts >= p.ts - INTERVAL 1 DAY AND c.cts < p.ts
    GROUP BY p.event_id
    """,
    doc="Range/interval join (custom operator Ray Data lacks): clicks "
    "in the day before each purchase, per purchase.  Implemented as "
    "EPOCH BUCKETING — time is cut into epochs the width of the "
    "interval, so each interval replicates to at most 2 epochs and "
    "each point lands in exactly 1 (no pair can match twice); epochs "
    "coarsen into 64 hash buckets (the repo's standard coarse-group "
    "trick — Ray per-group overhead amortizes over many epochs) and a "
    "vectorized pandas merge on (epoch, user_id) + range mask joins "
    "within each bucket.  Per-epoch partial counts (zeros included via "
    "the left merge) sum per purchase in a bucketed aggregation.  "
    "Partitioning assumption: one interval spans O(1) epochs; salt hot "
    "epochs by a user-hash suffix if a single epoch's volume exceeds a "
    "worker (documented, not needed at fixture skew).",
)
def interval_join(sf_dir: str):
    from .stages.relational import bucketed_agg

    W = 86_400_000_000  # epoch width == interval width (1 day in us)
    N_EPOCH_BUCKETS = 64

    def explode(t: pa.Table) -> pa.Table:
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        us = t["ts"].cast(pa.int64()).to_numpy()
        uid = t["user_id"].to_numpy()
        eid = t["event_id"].to_numpy()
        out = []
        is_p = typ == "purchase"
        if is_p.any():
            t1 = us[is_p]
            t0 = t1 - W
            e_lo = t0 // W
            e_hi = (t1 - 1) // W
            for ep in (e_lo, e_hi):  # <=2 epochs per interval; dedup below
                out.append(
                    pd.DataFrame(
                        {
                            "role": 0,
                            "epoch": ep,
                            "user_id": uid[is_p],
                            "t0": t0,
                            "t1": t1,
                            "event_id": eid[is_p],
                        }
                    )
                )
            both = pd.concat(out, ignore_index=True)
            both = both.drop_duplicates(subset=["event_id", "epoch"])
            out = [both]
        is_c = typ == "click"
        if is_c.any():
            out.append(
                pd.DataFrame(
                    {
                        "role": 1,
                        "epoch": us[is_c] // W,
                        "user_id": uid[is_c],
                        "t0": us[is_c],
                        "t1": np.int64(0),
                        "event_id": np.int64(-1),
                    }
                )
            )
        df = (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {
                    "role": pd.Series([], dtype="int64"),
                    "epoch": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "t0": pd.Series([], dtype="int64"),
                    "t1": pd.Series([], dtype="int64"),
                    "event_id": pd.Series([], dtype="int64"),
                }
            )
        )
        df["eb"] = (df["epoch"].to_numpy() % N_EPOCH_BUCKETS).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        iv = g[g["role"] == 0]
        ck = g[g["role"] == 1][["epoch", "user_id", "t0"]].rename(columns={"t0": "cts"})
        m = iv.merge(ck, on=["epoch", "user_id"], how="left")
        hit = (m["cts"] >= m["t0"]) & (m["cts"] < m["t1"])
        cnt = (
            pd.DataFrame({"event_id": m["event_id"], "h": hit.astype("int64")})
            .groupby("event_id", as_index=False)["h"].sum()
        )
        # an interval's 2 epoch copies both produce a row here; matched
        # clicks live in one epoch only, so summing downstream is exact
        return cnt.rename(columns={"h": "pn"})

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    partials = ev.map_batches(explode, batch_format="pyarrow").groupby("eb").map_groups(
        join_bucket, batch_format="pandas"
    )
    return bucketed_agg(partials, ["event_id"], {"pn": "n_clicks"})


@register(
    "bpe_token_stats",
    r"""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+')))
             AS BIGINT) AS total_bpe
    FROM documents GROUP BY lang
    """,
    doc="BPE-ish token counting: a GPT-2-style pre-tokenizer regex "
    "(contraction suffixes | space-prefixed letter runs | digit runs | "
    "punctuation runs | whitespace), made lookahead-free so Python re "
    "and DuckDB RE2 tokenize identically (verified: equal counts per "
    "doc).  The regex compiles ONCE per actor (__init__), matching is "
    "per-doc C-loop, and per-lang totals use the integer-partial "
    "combiner so the shuffle is lang-cardinality rows per batch.",
)
def bpe_token_stats(sf_dir: str):
    from ray.data.aggregate import Sum

    class BpeCount:
        def __init__(self):
            import re

            self.rx = re.compile(
                r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            n = np.fromiter(
                (len(self.rx.findall(x)) for x in t["text"].to_pylist()),
                dtype=np.int64,
                count=t.num_rows,
            )
            out = pa.table({"lang": t["lang"], "toks": pa.array(n)})
            return make_partial_agg(["lang"], ["toks"])(out)

    parts = _read(sf_dir, "documents", columns=["lang", "text"]).map_batches(
        BpeCount, batch_format="pyarrow", concurrency=4
    )
    agg = parts.groupby("lang").aggregate(
        Sum("toks_sum", alias_name="total_bpe"), Sum("partial_n", alias_name="n_docs")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": t["n_docs"],
                "total_bpe": t["total_bpe"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


@register(
    "decontaminate",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, tk[j]||' '||tk[j+1]||' '||tk[j+2] AS g
      FROM toks, unnest(generate_series(1, len(tk)-2)) AS s(j)),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id < 5)
    SELECT g.doc_id, count(*) AS n_hits
    FROM grams g JOIN ev ON g.g = ev.g
    WHERE g.doc_id >= 5
    GROUP BY g.doc_id
    """,
    doc="Benchmark decontamination: flag training documents sharing any "
    "token 3-gram with the eval set (here: the first 5 docs by id — "
    "the stand-in for a held-out benchmark).  The eval gram set is "
    "SMALL by nature, so it is computed once and broadcast (ray.put) "
    "— membership is a per-batch vectorized searchsorted, no shuffle "
    "at all; the corpus-side gram explode never leaves its batch.  "
    "This is the one join shape where broadcast is ALWAYS right at "
    "100 TB (the build side is a benchmark, not data).",
)
def decontaminate(sf_dir: str, n_eval_docs: int = 5, n: int = 3):
    import ray

    from .stages.relational import bucketed_agg

    def grams_of(txt: str) -> set:
        tk = [t for t in txt.lower().split() if t]
        if len(tk) < n:
            return set()
        return {" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)}

    ev_parts = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .filter(expr=f"doc_id < {n_eval_docs}")
        .map_batches(
            lambda t: pa.table(
                {
                    "g": pa.array(
                        sorted(set().union(*[grams_of(x) for x in t["text"].to_pylist()]) if t.num_rows else set()),
                        type=pa.string(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    ev = np.unique(ev_parts["g"].to_numpy(dtype=object))
    eref = ray.put(ev)

    class Hits:
        def __init__(self):
            self.ev = ray.get(eref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, hits = [], []
            for did, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                if did < n_eval_docs:
                    continue
                gs = np.array(sorted(grams_of(x)), dtype=object)
                if not len(gs) or not len(self.ev):
                    continue
                idx = np.clip(np.searchsorted(self.ev, gs), 0, len(self.ev) - 1)
                h = int((self.ev[idx] == gs).sum())
                if h:
                    ids.append(did)
                    hits.append(h)
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "pn": pa.array(hits, type=pa.int64()),
                }
            )

    parts = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        Hits, batch_format="pyarrow", concurrency=4
    )
    return bucketed_agg(parts, ["doc_id"], {"pn": "n_hits"})


@register(
    "value_quantiles",
    """
    SELECT event_type, count(*) AS n,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.9) AS p90,
           quantile_disc(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    doc="EXACT distributed quantiles over DOUBLES (unbounded value "
    "cardinality — the case token_quantiles' value-histogram cannot "
    "cover): two-pass histogram selection.  Pass 1 buckets each value "
    "by the top 16 bits of its ORDER-PRESERVING uint64 transform "
    "(sign-flip trick: x^0x800... for positives, x^0xFFF... for "
    "negatives) and aggregates (event_type, prefix) counts — 65,536 "
    "bins regardless of data size, so the driver holds a histogram, "
    "never data.  The k-th element's bin is found by cumulative rank "
    "(k = ceil(q*n), quantile_disc's index rule); pass 2 collects ONLY "
    "candidate-bin rows (expected n/65536 per bin) and selects the "
    "exact element.  Bins still heavier than ``collect_cap`` RECURSE "
    "on the next 16 prefix bits (histogram output <= 65,536 rows per "
    "hot bin, whatever the row count) down to the full 64-bit key, "
    "where the prefix IS the value (inverted from the sortable key, "
    "zero rows collected) — so driver memory is O(bins) under ANY "
    "value distribution, including a constant column.  Result values "
    "are ELEMENTS of the data, so the oracle compare is bit-exact "
    "with no float-summation hazard.",
)
def value_quantiles(sf_dir: str, qs=(0.5, 0.9, 0.99), collect_cap: int = 65536):
    import math

    import ray

    from .stages.relational import bucketed_agg

    def to_key(v: np.ndarray) -> np.ndarray:
        b = v.view(np.uint64)
        mask = np.where(
            (b >> np.uint64(63)).astype(bool),
            np.uint64(0xFFFFFFFFFFFFFFFF),
            np.uint64(0x8000000000000000),
        )
        return b ^ mask

    def hist(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy().astype(np.float64)
        pfx = (to_key(v) >> np.uint64(48)).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_numpy(zero_copy_only=False), "pfx": pfx})
        g = df.groupby(["event_type", "pfx"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "c"}), preserve_index=False
        )

    ev = _read(sf_dir, "events", columns=["event_type", "value"]).materialize()
    h = (
        bucketed_agg(
            ev.map_batches(hist, batch_format="pyarrow"),
            ["event_type", "pfx"],
            {"c": "c"},
            key_dtypes={"event_type": "object"},
        )
        .to_pandas()
        .sort_values(["event_type", "pfx"])
    )

    # driver: locate each quantile's bin + rank-within-bin
    want: dict = {}  # (etype, prefix as python int) -> [(q, rank_in_bin)]
    counts: dict = {}  # (etype, prefix) -> bin row count
    totals: dict = {}
    for et, grp in h.groupby("event_type", sort=False):
        pfxs = grp["pfx"].to_numpy()
        cnts = grp["c"].to_numpy()
        n = int(cnts.sum())
        totals[et] = n
        cum = np.cumsum(cnts)
        for q in qs:
            k = math.ceil(q * n)  # quantile_disc's 1-based index rule
            i = int(np.searchsorted(cum, k))
            rank_in_bin = k - (int(cum[i - 1]) if i else 0)
            want.setdefault((et, int(pfxs[i])), []).append((q, rank_in_bin))
            counts[(et, int(pfxs[i]))] = int(cnts[i])

    _PACK = 1 << 48  # etype-code multiplier; prefixes stay <= 48 bits

    def _membership(w: dict):
        """(sorted names, sorted packed etcode*2^48+prefix keys)."""
        names = np.array(sorted({et for et, _ in w}), dtype=object)
        assert len(names) < 32768, "etype-code packing overflow"
        sel = np.sort(
            np.array(
                [int(np.searchsorted(names, et)) * _PACK + int(p) for et, p in w],
                dtype=np.int64,
            )
        )
        return names, sel

    def key_to_float(k: int) -> float:
        """Invert to_key: full 64-bit sortable key -> the double."""
        ku = np.uint64(k)
        bits = (
            ku ^ np.uint64(0x8000000000000000)
            if bool(ku >> np.uint64(63))
            else ~ku
        )
        return float(np.array([bits], dtype=np.uint64).view(np.float64)[0])

    def sub_hist(hot: dict, shift: int) -> pd.DataFrame:
        """Histogram the NEXT 16-bit chunk of rows inside hot bins:
        output <= 65,536 rows per hot bin regardless of row count."""
        names, sel = _membership(hot)
        ref = ray.put((names, sel))
        ns = shift - 16

        def hsub(t: pa.Table) -> pa.Table:
            nm, s = ray.get(ref)
            v = t["value"].to_numpy().astype(np.float64)
            key = to_key(v)
            et = t["event_type"].to_numpy(zero_copy_only=False)
            par = (key >> np.uint64(shift)).astype(np.int64)
            code = np.clip(np.searchsorted(nm, et), 0, len(nm) - 1)
            pk = code.astype(np.int64) * _PACK + par
            pos = np.clip(np.searchsorted(s, pk), 0, len(s) - 1)
            m = (nm[code] == et) & (s[pos] == pk)
            if not m.any():
                return pa.table(
                    {
                        "event_type": pa.array([], type=pa.string()),
                        "par": pa.array([], type=pa.int64()),
                        "chunk": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.int64()),
                    }
                )
            df = pd.DataFrame(
                {
                    "event_type": et[m],
                    "par": par[m],
                    "chunk": ((key[m] >> np.uint64(ns)) & np.uint64(0xFFFF)).astype(np.int64),
                }
            )
            g = df.groupby(["event_type", "par", "chunk"], as_index=False).size()
            return pa.Table.from_pandas(
                g.rename(columns={"size": "c"}), preserve_index=False
            )

        return bucketed_agg(
            ev.map_batches(hsub, batch_format="pyarrow"),
            ["event_type", "par", "chunk"],
            {"c": "c"},
            key_dtypes={"event_type": "object"},
        ).to_pandas()

    # recurse 16 bits at a time: cold bins (<= collect_cap rows) go to
    # the collect pass; hot bins re-histogram on their next chunk; at
    # shift 0 the prefix IS the key -> the value, zero rows collected
    results: dict = {}  # (etype, q) -> value
    collect_levels: dict = {}  # shift -> {(etype, prefix): [(q, rank)]}
    shift = 48
    while want:
        hot = {k: v for k, v in want.items() if counts[k] > collect_cap}
        cold = {k: v for k, v in want.items() if k not in hot}
        if cold:
            collect_levels.setdefault(shift, {}).update(cold)
        if not hot:
            break
        sub = sub_hist(hot, shift)
        nxt_want, nxt_counts = {}, {}
        for (et, par), lst in hot.items():
            sg = sub[(sub["event_type"] == et) & (sub["par"] == par)].sort_values("chunk")
            chunks = sg["chunk"].to_numpy()
            cs = sg["c"].to_numpy()
            cum = np.cumsum(cs)
            for q, r in lst:
                j = int(np.searchsorted(cum, r))
                child = int(par) * 65536 + int(chunks[j])
                nr = r - (int(cum[j - 1]) if j else 0)
                if shift - 16 == 0:
                    results[(et, q)] = key_to_float(child)
                else:
                    nxt_want.setdefault((et, child), []).append((q, nr))
                    nxt_counts[(et, child)] = int(cs[j])
        want, counts, shift = nxt_want, nxt_counts, shift - 16

    if collect_levels:
        # one collect pass over every cold bin; levels are disjoint by
        # construction (a cold bin is never recursed into), so each row
        # matches at most one (shift, bin)
        levels = [
            (s,) + _membership(w) for s, w in sorted(collect_levels.items())
        ]
        lref = ray.put(levels)

        def collect(t: pa.Table) -> pa.Table:
            lv = ray.get(lref)
            v = t["value"].to_numpy().astype(np.float64)
            key = to_key(v)
            et = t["event_type"].to_numpy(zero_copy_only=False)
            parts = {"event_type": [], "shift": [], "pfx": [], "value": []}
            for s, nm, sel in lv:
                par = (key >> np.uint64(s)).astype(np.int64)
                code = np.clip(np.searchsorted(nm, et), 0, len(nm) - 1)
                pk = code.astype(np.int64) * _PACK + par
                pos = np.clip(np.searchsorted(sel, pk), 0, len(sel) - 1)
                m = (nm[code] == et) & (sel[pos] == pk)
                parts["event_type"].append(et[m])
                parts["shift"].append(np.full(int(m.sum()), s, dtype=np.int64))
                parts["pfx"].append(par[m])
                parts["value"].append(v[m])
            return pa.table(
                {
                    "event_type": pa.array(np.concatenate(parts["event_type"]), type=pa.string()),
                    "shift": pa.array(np.concatenate(parts["shift"])),
                    "pfx": pa.array(np.concatenate(parts["pfx"])),
                    "value": pa.array(np.concatenate(parts["value"])),
                }
            )

        cand = ev.map_batches(collect, batch_format="pyarrow").to_pandas()
        for s, w in collect_levels.items():
            for (et, pfx), lst in w.items():
                vals = np.sort(
                    cand[
                        (cand["shift"] == s)
                        & (cand["event_type"] == et)
                        & (cand["pfx"] == pfx)
                    ]["value"].to_numpy()
                )
                for q, r in lst:
                    results[(et, q)] = float(vals[r - 1])

    rows = {et: {"event_type": et, "n": totals[et]} for et in totals}
    for (et, q), v in results.items():
        rows[et][f"p{int(q * 100)}"] = v
    out = pd.DataFrame(list(rows.values()))[
        ["event_type", "n"] + [f"p{int(q * 100)}" for q in qs]
    ]
    return pa.Table.from_pandas(out, preserve_index=False)


# =====================================================================
# Corpus-hygiene / window operators (round-3 session-3 additions)
# =====================================================================


@register(
    "group_topk",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) WHERE rk <= 3
    """,
    doc="Distributed per-group top-k (the window-function "
    "row_number()-OVER-PARTITION shape most engines answer with a full "
    "sort): each batch keeps its local 3-best per customer — a "
    "combiner, so the shuffle carries <= 3*customers_per_batch rows — "
    "then a per-customer merge keeps the global 3-best.  No global "
    "sort, no full-partition materialization; scales to billions of "
    "orders because only k rows per (customer, batch) move.  Ties "
    "broken by o_orderkey, matching the oracle's deterministic "
    "ORDER BY.",
)
def group_topk(sf_dir: str, k: int = 3):
    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="stable",
        )
        df = df.groupby("o_custkey", as_index=False, sort=False).head(k).copy()
        # coarse merge buckets: a per-CUSTOMER map_groups would pay
        # Ray's ~2ms/group overhead x |customers|; 64 hash buckets
        # amortize it (the repo-wide bucketed-agg trick)
        df["__b"] = (df["o_custkey"].to_numpy() % 64).astype("int32")
        return df

    def final_top(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "o_custkey": pd.Series([], dtype="int64"),
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "o_totalprice": pd.Series([], dtype="float64"),
                    "rk": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="stable",
        )
        g = g.assign(rk=g.groupby("o_custkey", sort=False).cumcount() + 1)
        g = g[g["rk"] <= k]
        return g[["o_custkey", "o_orderkey", "o_totalprice", "rk"]]

    return (
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(local_top, batch_format="pandas")
        .groupby("__b")
        .map_groups(final_top, batch_format="pandas")
    )


@register(
    "mixture_resample",
    """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS mn FROM c),
    t AS (SELECT lang, (mn * 1000000) // n AS thr FROM c, m)
    SELECT d.doc_id, d.lang FROM documents d JOIN t USING (lang)
    WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 1000000 < thr
    """,
    doc="Deterministic mixture resampling (rebalance a training corpus "
    "to a uniform language mix): phase 1 computes the per-language "
    "histogram with the combiner pattern (tiny), the driver derives "
    "per-language keep-rates rate = min_count/count as EXACT integer "
    "thresholds thr = (min*10^6)//count, phase 2 filters each batch by "
    "hash(doc_id) % 10^6 < thr[lang] — a reproducible Bernoulli "
    "sample, no shuffle, one scan.  Hash is md5_number_lower-"
    "compatible (shingles.md5_hash64) so DuckDB derives identical "
    "membership; all arithmetic is integral so the oracle is exact.",
)
def mixture_resample(sf_dir: str):
    import ray
    from ray.data.aggregate import Count

    counts = (
        _read(sf_dir, "documents", columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    mn = int(counts["n"].min())
    thr = {r["lang"]: (mn * 1000000) // int(r["n"]) for _, r in counts.iterrows()}
    tref = ray.put(thr)

    def keep(t: pa.Table) -> pa.Table:
        thr_map = ray.get(tref)
        ids = t["doc_id"].to_numpy()
        h = np.array(
            [shingles.md5_hash64(str(i)) % 1000000 for i in ids], dtype=np.int64
        )
        langs = t["lang"].to_numpy(zero_copy_only=False)
        lim = np.array([thr_map[l] for l in langs], dtype=np.int64)
        m = h < lim
        return pa.table(
            {"doc_id": pa.array(ids[m]), "lang": pa.array(langs[m])}
        )

    return _read(sf_dir, "documents", columns=["doc_id", "lang"]).map_batches(
        keep, batch_format="pyarrow"
    )


@register(
    "repetition_stats",
    """
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    b AS (SELECT doc_id, lang, len(ws) AS n, len(list_distinct(ws)) AS nd,
                 unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS bg
          FROM w),
    c AS (SELECT doc_id, lang, n, nd, bg, count(*) AS cnt FROM b GROUP BY ALL),
    m AS (SELECT doc_id, lang, any_value(n) AS n, any_value(nd) AS nd,
                 max(cnt) AS maxc
          FROM c GROUP BY doc_id, lang)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN 10 * maxc > n THEN 1 ELSE 0 END) AS BIGINT)
             AS flag_bigram,
           CAST(sum(CASE WHEN 10 * nd < 3 * n THEN 1 ELSE 0 END) AS BIGINT)
             AS flag_unique,
           CAST(sum(maxc) AS BIGINT) AS sum_top_bigram
    FROM m GROUP BY lang
    """,
    doc="Gopher-style repetition quality filter (Rae et al. 2021 §A1.1 "
    "repetition signals): per document, the most-frequent-bigram count "
    "and the distinct-token ratio; a doc is flagged when the top "
    "bigram covers >20%% of token positions (10*maxc > n, exact "
    "integer compare) or <30%% of tokens are distinct (10*nd < 3*n).  "
    "Everything is computed per-batch with vectorized dictionary-"
    "encode + lexsort run-length kernels (no Python loop over rows or "
    "tokens), then a tiny per-language combiner groupby — one scan, "
    "shuffle carries langs*batches partial rows.",
)
def repetition_stats(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        tok_list = pc.split_pattern(txt, " ")
        if isinstance(tok_list, pa.ChunkedArray):
            tok_list = tok_list.combine_chunks()
        lens = pc.list_value_length(tok_list).to_numpy().astype(np.int64)
        flat = tok_list.values  # zero-copy (fresh array, offsets start at 0)
        codes = pc.dictionary_encode(flat).indices.to_numpy().astype(np.int64)
        nrows = len(lens)
        rows = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        # distinct tokens per doc: sort (row, code), count run starts per row
        order = np.lexsort((codes, rows))
        r_s, c_s = rows[order], codes[order]
        first = np.ones(len(r_s), dtype=bool)
        first[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
        nd = np.bincount(r_s[first], minlength=nrows).astype(np.int64)
        # top-bigram count per doc: adjacent same-row pairs, run-length max
        adj = rows[:-1] == rows[1:]
        rb = rows[:-1][adj]
        V = int(codes.max()) + 1 if len(codes) else 1
        bk = codes[:-1][adj] * V + codes[1:][adj]
        order2 = np.lexsort((bk, rb))
        rb_s, bk_s = rb[order2], bk[order2]
        starts = np.flatnonzero(
            np.concatenate(
                ([True], (rb_s[1:] != rb_s[:-1]) | (bk_s[1:] != bk_s[:-1]))
            )
        )
        run_lens = np.diff(np.append(starts, len(rb_s)))
        maxc = np.zeros(nrows, dtype=np.int64)
        if len(starts):
            np.maximum.at(maxc, rb_s[starts], run_lens)
        out = pa.table(
            {
                "lang": t["lang"],
                "one": pa.array(np.ones(nrows, dtype=np.int64)),
                "fb": pa.array((10 * maxc > lens).astype(np.int64)),
                "fu": pa.array((10 * nd < 3 * lens).astype(np.int64)),
                "mx": pa.array(maxc),
            }
        )
        return make_partial_agg(["lang"], ["one", "fb", "fu", "mx"])(out)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("one_sum", alias_name="n_docs"),
            Sum("fb_sum", alias_name="flag_bigram"),
            Sum("fu_sum", alias_name="flag_unique"),
            Sum("mx_sum", alias_name="sum_top_bigram"),
        )
    )


# PII patterns shared by the Ray stage and (verbatim) the oracle SQL.
# Both sides execute them on RE2 (pyarrow.compute and DuckDB embed the
# same engine), so match semantics are identical by construction.
_PII_EMAIL = r"[a-z0-9._]+@[a-z0-9.-]+"
_PII_PHONE = r"\+1-555-[0-9]{4}"
_PII_IP = r"10\.0\.[0-9]+\.[0-9]+"


@register(
    "pii_scrub",
    f"""
    WITH aug AS (
      SELECT lang,
             text ||
             CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR)
                  || '@ex.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END ||
             CASE WHEN doc_id % 5 = 0 THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.1' ELSE '' END AS t
      FROM documents),
    red AS (
      SELECT lang, t,
             len(regexp_extract_all(t, '{_PII_EMAIL}')) AS ne,
             len(regexp_extract_all(t, '{_PII_PHONE}')) AS np,
             len(regexp_extract_all(t, '{_PII_IP}')) AS ni,
             regexp_replace(regexp_replace(regexp_replace(t,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IP}', '<IP>', 'g') AS r
      FROM aug)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(ne) AS BIGINT) AS n_emails,
           CAST(sum(np) AS BIGINT) AS n_phones,
           CAST(sum(ni) AS BIGINT) AS n_ips,
           CAST(sum(length(r)) AS BIGINT) AS redacted_chars
    FROM red GROUP BY lang
    """,
    doc="PII detection + redaction over a corpus: count and scrub "
    "emails / phone numbers / internal IPs with compiled RE2 patterns "
    "(pc.count_substring_regex / pc.replace_substring_regex — "
    "vectorized Arrow kernels, zero Python in the match path), then a "
    "per-language combiner.  The corpus is deterministically augmented "
    "with synthetic PII (mirrored verbatim in the oracle SQL, same "
    "trick as ngram_jaccard_sparse) because the testdata text itself "
    "is PII-free.  One scan, no shuffle beyond lang partials.",
)
def pii_scrub(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        # deterministic synthetic-PII augmentation (test harness only —
        # a real corpus skips this stage); mirrored in the oracle SQL
        sfx = [
            (f" contact u{d}@ex.com or +1-555-{d % 10000:04d}" if d % 3 == 0 else "")
            + (f" ip 10.0.{d % 256}.1" if d % 5 == 0 else "")
            for d in ids
        ]
        aug = pc.binary_join_element_wise(txt, pa.array(sfx, type=pa.string()), "")
        ne = pc.count_substring_regex(aug, _PII_EMAIL)
        np_ = pc.count_substring_regex(aug, _PII_PHONE)
        ni = pc.count_substring_regex(aug, _PII_IP)
        red = pc.replace_substring_regex(aug, _PII_EMAIL, "<EMAIL>")
        red = pc.replace_substring_regex(red, _PII_PHONE, "<PHONE>")
        red = pc.replace_substring_regex(red, _PII_IP, "<IP>")
        out = pa.table(
            {
                "lang": t["lang"],
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
                "ne": pc.cast(ne, pa.int64()),
                "np": pc.cast(np_, pa.int64()),
                "ni": pc.cast(ni, pa.int64()),
                "rc": pc.cast(pc.utf8_length(red), pa.int64()),
            }
        )
        return make_partial_agg(["lang"], ["one", "ne", "np", "ni", "rc"])(out)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("one_sum", alias_name="n_docs"),
            Sum("ne_sum", alias_name="n_emails"),
            Sum("np_sum", alias_name="n_phones"),
            Sum("ni_sum", alias_name="n_ips"),
            Sum("rc_sum", alias_name="redacted_chars"),
        )
    )


def _tfidf_join_regime(docs, df_ds, n_docs: int, k: int):
    """Past-the-broadcast-cap regime for tfidf_top_terms: the vocabulary
    stays a Dataset; per-doc (term, tf) rows pick up df via a term-keyed
    hash join (``Dataset.join``), then per-doc top-k runs in doc-hash
    buckets.  The fp score is the same expression in the same op order
    as the broadcast path (tf * (n_docs*1.0/df)), so the two regimes are
    row-identical (forced-regime test asserts it)."""

    def explode_tf(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        tok_list = pc.split_pattern(txt, " ")
        if isinstance(tok_list, pa.ChunkedArray):
            tok_list = tok_list.combine_chunks()
        lens = pc.list_value_length(tok_list).to_numpy().astype(np.int64)
        dct = pc.dictionary_encode(tok_list.values)
        codes = dct.indices.to_numpy().astype(np.int64)
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        order = np.lexsort((codes, rows))
        r_s, c_s = rows[order], codes[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])))
        )
        tf = np.diff(np.append(starts, len(r_s))).astype(np.int64)
        did = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(did[r_s[starts]]),
                "term": dct.dictionary.take(pa.array(c_s[starts])),
                "tf": pa.array(tf),
            }
        )

    # join orientation matters: bucketed_agg's map_groups output carries
    # schemaless EMPTY pandas blocks which the Arrow hash join rejects
    # on its RIGHT (build) side — so df goes LEFT and the clean Arrow
    # tf-explode goes RIGHT (same orientation as the ngram size joins).
    # materialize + adaptive partitions per the ngram-regime comment: a
    # 32-partition join demands a 4-CPU aggregator pool a small test
    # session can't grant.
    tf_rows = docs.map_batches(explode_tf, batch_format="pyarrow").materialize()
    num_partitions = int(np.clip(tf_rows.count() // 25_000, 2, 32))
    joined = df_ds.join(
        tf_rows,
        join_type="inner",
        num_partitions=num_partitions,
        on=("term",),
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            df = pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "term": pd.Series([], dtype="object"),
                    "tf": pd.Series([], dtype="int64"),
                    "df": pd.Series([], dtype="int64"),
                }
            )
        df = df.copy()
        df["__b"] = (df["doc_id"].to_numpy() % 64).astype("int32")
        return df

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int64"),
                "df": pd.Series([], dtype="int64"),
                "rk": pd.Series([], dtype="int64"),
            }
        )
        if g.shape[1] == 0 or len(g) == 0:
            return empty
        dfv = g["df"].to_numpy().astype(np.float64)
        score = g["tf"].to_numpy().astype(np.float64) * (n_docs * 1.0 / dfv)
        terms = g["term"].to_numpy(dtype=object)
        dids = g["doc_id"].to_numpy()
        order = np.lexsort((terms, -score, dids))
        d_o = dids[order]
        run_start = np.flatnonzero(np.concatenate(([True], d_o[1:] != d_o[:-1])))
        pos = np.arange(len(d_o)) - np.repeat(
            run_start, np.diff(np.append(run_start, len(d_o)))
        )
        keep = pos < k
        sel = order[keep]
        return pd.DataFrame(
            {
                "doc_id": pd.Series(dids[sel], dtype="int64"),
                "term": pd.Series(terms[sel], dtype="object"),
                "tf": pd.Series(g["tf"].to_numpy()[sel], dtype="int64"),
                "df": pd.Series(g["df"].to_numpy()[sel], dtype="int64"),
                "rk": pd.Series(pos[keep] + 1, dtype="int64"),
            }
        )

    return (
        joined.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(topk, batch_format="pandas")
    )


@register(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS nd FROM documents),
    s AS (SELECT t.doc_id, t.term, t.tf, d.df,
                 row_number() OVER (PARTITION BY t.doc_id
                   ORDER BY t.tf * (nd * 1.0 / d.df) DESC, t.term) AS rk
          FROM tfc t JOIN dfc d USING (term), n)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, rk
    FROM s WHERE rk <= 3
    """,
    doc="TF-IDF top terms per document (the salient-term extraction "
    "stage of a training-data pipeline): document frequencies via the "
    "string-keyed bucketed combiner (one shuffle of (term, partial_df) "
    "rows), broadcast once as a sorted vocab array + df vector "
    "(ray.put) while the vocabulary fits the vocab_broadcast_cap; past "
    "the cap the IMPLEMENTED join regime fires (_tfidf_join_regime: df "
    "stays a Dataset, per-doc (term, tf) rows pick up df via a "
    "term-keyed hash join, per-doc top-k in doc-hash buckets — "
    "forced-regime test asserts row equality), then a "
    "single scan computes per-doc tf (dictionary-encode + lexsort run "
    "lengths, no Python over tokens) and each doc's 3 best terms by "
    "score = tf * (N/df).  The idf stays the exact rational N/df "
    "(no ln — transcendentals are libm-dependent and would make the "
    "oracle fragile); the fp expression tf*(N*1.0/df) is evaluated "
    "with the same op order as the SQL so ranks match bit-exactly.",
)
def tfidf_top_terms(sf_dir: str, k: int = 3, vocab_broadcast_cap: int = 5_000_000):
    import ray
    from crawler_ray.stages.relational import bucketed_agg

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_distinct(t: pa.Table) -> pa.Table:
        # vectorized (doc, term)-distinct explode: split -> dictionary
        # codes -> lexsort -> run starts; no Python over tokens
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        tok_list = pc.split_pattern(txt, " ")
        if isinstance(tok_list, pa.ChunkedArray):
            tok_list = tok_list.combine_chunks()
        lens = pc.list_value_length(tok_list).to_numpy().astype(np.int64)
        dct = pc.dictionary_encode(tok_list.values)
        codes = dct.indices.to_numpy().astype(np.int64)
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        order = np.lexsort((codes, rows))
        r_s, c_s = rows[order], codes[order]
        first = np.ones(len(r_s), dtype=bool)
        first[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
        did = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(did[r_s[first]]),
                "term": dct.dictionary.take(pa.array(c_s[first])),
            }
        )

    df_ds = bucketed_agg(
        docs.map_batches(explode_distinct, batch_format="pyarrow"),
        keys=["term"],
        sum_cols={"__count__": "df"},
        key_dtypes={"term": "object"},
    ).materialize()
    n_docs = int(
        pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    )

    if df_ds.count() > vocab_broadcast_cap:
        return _tfidf_join_regime(docs, df_ds, n_docs, k)

    df_tbl = df_ds.to_pandas()
    vocab = np.sort(df_tbl["term"].to_numpy(dtype=object))
    dfv = (
        df_tbl.set_index("term").loc[vocab]["df"].to_numpy().astype(np.float64)
    )
    ratio = n_docs * 1.0 / dfv  # same fp expression as the oracle
    vref = ray.put((vocab, dfv.astype(np.int64), ratio))

    def top_terms(t: pa.Table) -> pa.Table:
        voc, dfi, rat = ray.get(vref)
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        tok_list = pc.split_pattern(txt, " ")
        if isinstance(tok_list, pa.ChunkedArray):
            tok_list = tok_list.combine_chunks()
        lens = pc.list_value_length(tok_list).to_numpy().astype(np.int64)
        # vocab lookup per DISTINCT token in the batch, not per token:
        # dictionary-encode, searchsorted only the (small) dictionary
        dct = pc.dictionary_encode(tok_list.values)
        uniq = np.asarray(dct.dictionary.to_pylist(), dtype=object)
        code = np.searchsorted(voc, uniq)[dct.indices.to_numpy().astype(np.int64)]
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        # per-(row, code) tf via lexsort run lengths
        order = np.lexsort((code, rows))
        r_s, c_s = rows[order], code[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])))
        )
        tf = np.diff(np.append(starts, len(r_s))).astype(np.int64)
        r_u, c_u = r_s[starts], c_s[starts]
        score = tf.astype(np.float64) * rat[c_u]
        terms_u = voc[c_u]
        # per-doc top-k by (score DESC, term ASC)
        order2 = np.lexsort((terms_u, -score, r_u))
        r_o = r_u[order2]
        pos_in_row = np.arange(len(r_o)) - np.repeat(
            np.flatnonzero(np.concatenate(([True], r_o[1:] != r_o[:-1]))),
            np.diff(
                np.append(
                    np.flatnonzero(np.concatenate(([True], r_o[1:] != r_o[:-1]))),
                    len(r_o),
                )
            ),
        )
        keep = pos_in_row < k
        sel = order2[keep]
        did = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(did[r_u[sel]]),
                "term": pa.array(terms_u[sel], type=pa.string()),
                "tf": pa.array(tf[sel]),
                "df": pa.array(dfi[c_u[sel]]),
                "rk": pa.array((pos_in_row[keep] + 1).astype(np.int64)),
            }
        )

    return docs.map_batches(top_terms, batch_format="pyarrow")


@register(
    "segment_dedup",
    """
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    segs AS (SELECT doc_id, lang,
                    unnest(range(CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS si, ws
             FROM w),
    s2 AS (SELECT doc_id, lang, si,
                  array_to_string(ws[si * 10 + 1 : si * 10 + 10], ' ') AS seg
           FROM segs),
    m AS (SELECT doc_id, lang, si, seg,
                 min(doc_id) OVER (PARTITION BY md5(seg)) AS fdoc
          FROM s2)
    SELECT doc_id, lang,
           count(*) AS n_segs,
           CAST(sum(CASE WHEN doc_id > fdoc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           coalesce(string_agg(CASE WHEN doc_id = fdoc THEN seg END,
                               ' ' ORDER BY si), '') AS new_text
    FROM m GROUP BY doc_id, lang
    """,
    doc="Cross-document segment-level dedup (the CCNet/RefinedWeb "
    "line-dedup operator reshaped for the space-tokenized testdata: "
    "the unit is a 10-token segment instead of a newline-delimited "
    "line).  First-wins: a segment occurrence survives iff its doc_id "
    "equals the corpus-wide min doc_id owning that segment; cleaned "
    "documents are re-assembled from surviving segments in order.  "
    "Distributed shape: (1) one scan explodes (doc_id, si, md5-128 as "
    "two int64) — segment TEXT never enters the shuffle (the same "
    "bytes-don't-move rule as the dataprep exact dedup); (2) a "
    "bucketed groupby on the 128-bit hash finds each segment's min "
    "owner and emits ONLY the loser occurrences (doc_id, si); (3) the "
    "loser set (sparse — bounded by cross-doc duplicate volume, not "
    "corpus size) is broadcast as one packed sorted int64 array and a "
    "second scan filters + rejoins each doc's surviving segments.  "
    "Past loser_broadcast_cap rows the IMPLEMENTED join regime fires "
    "(_segment_dedup_join_regime: losers pack into one si-string per "
    "affected doc and right-outer hash-join onto documents; "
    "forced-regime test asserts row equality).  Dedup key is the md5-128 of "
    "the segment (collision-safe in practice; the oracle dedups by "
    "md5(seg) too, so both sides agree by construction).",
)
def segment_dedup(sf_dir: str, seg_tokens: int = 10, loser_broadcast_cap: int = 100_000_000):
    import hashlib
    import math

    import ray

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def explode(t: pa.Table) -> pd.DataFrame:
        out_d, out_si, out_h1, out_h2 = [], [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = txt.split(" ")
            for si in range(math.ceil(len(ws) / seg_tokens)):
                seg = " ".join(ws[si * seg_tokens : si * seg_tokens + seg_tokens])
                dg = hashlib.md5(seg.encode()).digest()
                out_d.append(did)
                out_si.append(si)
                out_h1.append(int.from_bytes(dg[:8], "little", signed=False) - (1 << 63))
                out_h2.append(int.from_bytes(dg[8:], "little", signed=False) - (1 << 63))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "si": pd.Series(out_si, dtype="int64"),
                "h1": pd.Series(out_h1, dtype="int64"),
                "h2": pd.Series(out_h2, dtype="int64"),
            }
        )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("doc_id", "si", "h1", "h2")})
        df = df.copy()
        df["__bucket"] = (df["h1"].to_numpy() % 64).astype("int32")
        return df

    def losers_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"), "si": pd.Series([], dtype="int64")}
            )
        mn = g.groupby(["h1", "h2"])["doc_id"].transform("min")
        lose = g[g["doc_id"].to_numpy() > mn.to_numpy()]
        return lose[["doc_id", "si"]]

    losers_ds = (
        docs.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(losers_in_bucket, batch_format="pandas")
        .materialize()
    )
    if losers_ds.count() > loser_broadcast_cap:
        return _segment_dedup_join_regime(docs, losers_ds, seg_tokens)
    losers = losers_ds.to_pandas()
    if "doc_id" not in losers.columns:  # zero-row datasets lose schema
        losers = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "si": pd.Series([], dtype="int64")}
        )
    d = losers["doc_id"].to_numpy().astype(np.int64)
    s = losers["si"].to_numpy().astype(np.int64)
    assert len(s) == 0 or (s.max() < (1 << 20) and d.max() < (1 << 43)), "packed key overflow"
    removed = np.sort((d << 20) | s)
    rref = ray.put(removed)

    def rebuild(t: pa.Table) -> pa.Table:
        rem = ray.get(rref)
        out = {"doc_id": [], "lang": [], "n_segs": [], "n_removed": [], "new_text": []}
        for did, lang, txt in zip(
            t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["text"].to_pylist()
        ):
            ws = txt.split(" ")
            nseg = math.ceil(len(ws) / seg_tokens)
            keys = (np.int64(did) << 20) | np.arange(nseg, dtype=np.int64)
            pos = np.searchsorted(rem, keys)
            pos = np.clip(pos, 0, max(len(rem) - 1, 0))
            gone = (rem[pos] == keys) if len(rem) else np.zeros(nseg, dtype=bool)
            kept = [
                " ".join(ws[si * seg_tokens : si * seg_tokens + seg_tokens])
                for si in range(nseg)
                if not gone[si]
            ]
            out["doc_id"].append(did)
            out["lang"].append(lang)
            out["n_segs"].append(nseg)
            out["n_removed"].append(int(gone.sum()))
            out["new_text"].append(" ".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "lang": pa.array(out["lang"], type=pa.string()),
                "n_segs": pa.array(out["n_segs"], type=pa.int64()),
                "n_removed": pa.array(out["n_removed"], type=pa.int64()),
                "new_text": pa.array(out["new_text"], type=pa.string()),
            }
        )

    return docs.map_batches(rebuild, batch_format="pyarrow")


def _segment_dedup_join_regime(docs, losers_ds, seg_tokens: int):
    """Past-broadcast-cap regime for segment_dedup (the documented
    scale path, now real): loser (doc_id, si) rows never concentrate —
    they aggregate into one comma-joined si string per AFFECTED doc
    (bounded by duplicate volume) and LEFT-OUTER hash-join onto the
    documents table; unaffected docs get a null and keep every
    segment.  Forced-regime test asserts row equality."""
    import math

    def pack_sis(g: pd.DataFrame) -> pa.Table:
        if g.shape[1] == 0 or len(g) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "gone_sis": pa.array([], type=pa.string())}
            )
        g = g.sort_values(["doc_id", "si"], kind="stable")
        out = g.groupby("doc_id", as_index=False, sort=False).agg(
            gone_sis=("si", lambda s: ",".join(map(str, s)))
        )
        return pa.table(
            {"doc_id": pa.array(out["doc_id"].to_numpy(dtype=np.int64)),
             "gone_sis": pa.array(out["gone_sis"].tolist(), type=pa.string())}
        )

    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            df = pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"), "si": pd.Series([], dtype="int64")}
            )
        df = df.copy()
        df["__db"] = (df["doc_id"].to_numpy() % 64).astype("int32")
        return df

    packed = (
        losers_ds.map_batches(rebucket, batch_format="pandas")
        .groupby("__db")
        .map_groups(pack_sis, batch_format="pandas")
    )
    # the pandas map_groups side carries schemaless EMPTY blocks the
    # Arrow hash join rejects on its RIGHT (build) side — so packed
    # joins from the LEFT with right_outer keeping every doc (same
    # orientation rule as the tfidf join regime)
    # map_groups emits schemaless EMPTY pandas blocks that poison the
    # Arrow hash join; repartition concatenates them into typed blocks
    packed = packed.repartition(8)
    joined = packed.join(docs, join_type="right_outer", num_partitions=8, on=("doc_id",))

    def rebuild_joined(t: pa.Table) -> pa.Table:
        out = {"doc_id": [], "lang": [], "n_segs": [], "n_removed": [], "new_text": []}
        for did, lang, txt, sis in zip(
            t["doc_id"].to_pylist(), t["lang"].to_pylist(),
            t["text"].to_pylist(), t["gone_sis"].to_pylist(),
        ):
            ws = txt.split(" ")
            nseg = math.ceil(len(ws) / seg_tokens)
            gone = set(int(x) for x in sis.split(",")) if sis else set()
            kept = [
                " ".join(ws[si * seg_tokens : si * seg_tokens + seg_tokens])
                for si in range(nseg)
                if si not in gone
            ]
            out["doc_id"].append(did)
            out["lang"].append(lang)
            out["n_segs"].append(nseg)
            out["n_removed"].append(len(gone))
            out["new_text"].append(" ".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "lang": pa.array(out["lang"], type=pa.string()),
                "n_segs": pa.array(out["n_segs"], type=pa.int64()),
                "n_removed": pa.array(out["n_removed"], type=pa.int64()),
                "new_text": pa.array(out["new_text"], type=pa.string()),
            }
        )

    return joined.map_batches(rebuild_joined, batch_format="pyarrow")


# =====================================================================
# Time-series operators — as-of join, per-key running window
# =====================================================================


@register(
    "asof_join",
    """
    SELECT p.event_id,
           coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us,
           CAST(c.ts IS NOT NULL AS BIGINT) AS matched
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts FROM events
                    WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="Distributed AS-OF join (custom operator Ray Data lacks; the "
    "point-in-time lookup every event pipeline needs): for each "
    "purchase, the latest click at-or-before it by the same user, "
    "reported as gap_us (-1 when the user never clicked before).  "
    "Shape: ONE scan tags both roles, a single shuffle on "
    "hash(user_id) % 64 coarse buckets co-locates each user's full "
    "history, and the per-bucket kernel is pandas merge_asof (sorted "
    "C merge, no Python over rows).  Unlike the epoch trick in "
    "interval_join, as-of has an unbounded lookback so key "
    "co-location is the partitioning assumption: a bucket must hold "
    "its users' histories (balanced by user hash; as-of never needs "
    "cross-user data so buckets split freely by user at skew).  Gap "
    "is reported rather than the matched click's id so equal-ts "
    "click ties are semantics-free, matching ASOF JOIN's "
    "tie-nondeterminism.",
)
def asof_join(sf_dir: str):
    N_BUCKETS = 64

    def explode(t: pa.Table) -> pd.DataFrame:
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (typ == "purchase") | (typ == "click")
        us = t["ts"].cast(pa.int64()).to_numpy()[keep]
        uid = t["user_id"].to_numpy()[keep]
        eid = t["event_id"].to_numpy()[keep]
        role = (typ[keep] == "click").astype(np.int8)  # 0=purchase 1=click
        return pd.DataFrame(
            {
                "user_id": pd.Series(uid, dtype="int64"),
                "ts_us": pd.Series(us, dtype="int64"),
                "event_id": pd.Series(eid, dtype="int64"),
                "role": pd.Series(role, dtype="int8"),
                "__bucket": pd.Series((uid % N_BUCKETS).astype("int32")),
            }
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "gap_us": pd.Series([], dtype="int64"),
                    "matched": pd.Series([], dtype="int64"),
                }
            )
        p = g[g["role"] == 0].sort_values("ts_us", kind="stable")
        c = (
            g[g["role"] == 1][["user_id", "ts_us"]]
            .rename(columns={"ts_us": "cts_us"})
            .sort_values("cts_us", kind="stable")
        )
        m = pd.merge_asof(
            p, c, left_on="ts_us", right_on="cts_us", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        hit = m["cts_us"].notna().to_numpy()
        gap = np.where(
            hit, m["ts_us"].to_numpy() - m["cts_us"].fillna(0).to_numpy().astype(np.int64), -1
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "gap_us": gap,
                "matched": hit.astype(np.int64),
            }
        )

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    return (
        ev.map_batches(explode, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )


@register(
    "running_window",
    """
    SELECT event_id,
           sum(CAST(floor(value*100 + 0.5) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) / 100.0
             AS run_value,
           CAST(row_number()
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS rn
    FROM events
    """,
    doc="Per-key running-window aggregate (cumulative sum + running "
    "count ordered by event time): the unbounded-preceding window "
    "shape engines answer with a global sort.  Distributed shape: one "
    "scan converts value to exact integer cents (floor(x*100+.5), the "
    "repo-wide money rule, so accumulation order can't perturb the "
    "oracle compare) and buckets rows by hash(user_id); each bucket "
    "sorts its users' rows once by (user, ts, event_id) and runs "
    "vectorized pandas groupby-cumsum/cumcount — per-key sequential "
    "semantics with cross-key parallelism.  Partitioning assumption: "
    "a key's history fits its bucket (same keyed-state rule as "
    "stream.py windows); a single unbounded key degrades to the "
    "two-phase distributed prefix scan (stages/relational.py:59), "
    "documented not needed at fixture skew.",
)
def running_window(sf_dir: str):
    N_BUCKETS = 64

    def prep(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": pd.Series(uid, dtype="int64"),
                "ts_us": pd.Series(t["ts"].cast(pa.int64()).to_numpy(), dtype="int64"),
                "event_id": pd.Series(t["event_id"].to_numpy(), dtype="int64"),
                "vc": pd.Series(cents(t["value"]).to_numpy(), dtype="int64"),
                "__bucket": pd.Series((uid % N_BUCKETS).astype("int32")),
            }
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "run_value": pd.Series([], dtype="float64"),
                    "rn": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        gb = g.groupby("user_id", sort=False)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "run_value": gb["vc"].cumsum().to_numpy() / 100.0,
                "rn": (gb.cumcount() + 1).astype("int64"),
            }
        )

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )


@register(
    "semantic_dedup",
    """
    WITH ranked AS (
      SELECT vec_id, embedding,
             row_number() OVER (ORDER BY vec_id) - 1 AS rn
      FROM embeddings),
    cents AS (SELECT rn AS cid, embedding FROM ranked WHERE rn < 8),
    assign AS (
      SELECT vec_id, embedding, bucket FROM (
        SELECT e.vec_id, e.embedding, c.cid AS bucket,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.embedding) DESC,
                          c.cid) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1)
    SELECT a.vec_id, CAST(a.bucket AS BIGINT) AS bucket,
           CAST(EXISTS (
             SELECT 1 FROM assign b
             WHERE b.bucket = a.bucket AND b.vec_id < a.vec_id
               AND list_cosine_similarity(a.embedding, b.embedding) >= 0.4
           ) AS BIGINT) AS is_dup
    FROM assign a
    """,
    doc="SemDeDup-style semantic deduplication (Abbas et al. 2023, "
    "arXiv:2303.09540: cluster embeddings, drop within-cluster "
    "near-identical points): vectors are quantized to their nearest "
    "centroid (one broadcast-assign scan, stages/ann.py ivf_bucket — "
    "NO all-pairs across clusters), then each cluster group flags a "
    "vector as duplicate iff ANY earlier vector (lower vec_id, the "
    "first-wins rule used corpus-wide) in the same cluster has cosine "
    ">= 0.4.  The kernel sorts the group once by vec_id and runs "
    "TILED BLAS: each 1024-row tile's cosines are computed against "
    "the full cluster matrix and masked to strictly-earlier columns, "
    "so peak memory is tile x cluster, not cluster².  Scale contract "
    "(the paper's): the number of centroids grows with the corpus so "
    "per-cluster size stays bounded; hot clusters split by k-means "
    "refinement (train_centroids).  Centroids here are the "
    "deterministic seed set (first 8 by vec_id) so DuckDB derives the "
    "identical quantizer; FP safety: the nearest pair NOT >= tau is "
    "1.3e-4 from 0.4 and assignment margins are >=1.2e-4 vs <=2e-7 "
    "float32/float64 engine disagreement (measured at sf0.001/sf0.01), "
    "so no verdict can flip.  Flags (not a filtered corpus) are "
    "returned so the oracle checks every row's verdict.",
)
def _semantic_dedup_oracle(sf_dir: str):
    """Oracle-facing entry: pins n_centroids=8 to match the SQL's
    ``rn < 8`` quantizer.  The library default (``semantic_dedup``
    below) auto-scales k with corpus size — the SemDeDup scale
    contract — so the bounded-cluster path is what users get."""
    return semantic_dedup(sf_dir, n_centroids=8)


# target within-cluster size for the auto-scaled quantizer: per-cluster
# tiled-BLAS work is O(cluster²/tile) so holding clusters near this
# bound keeps total work ~linear in corpus size (measured: k=64 at 200k
# vecs cut 25.8 s → 12.7 s vs pinned k=8; tools/embedding_smoke.py)
SEMANTIC_DEDUP_TARGET_CLUSTER = 4096


def semantic_dedup(
    sf_dir: str,
    tau: float = 0.4,
    tile: int = 1024,
    n_centroids: int | None = None,
    target_cluster: int = SEMANTIC_DEDUP_TARGET_CLUSTER,
):
    # default posture auto-scales the centroid count so EXPECTED
    # cluster size stays ~target_cluster regardless of corpus size
    # (n_centroids=8 pinned only by the oracle wrapper above); the
    # count() is parquet-metadata-only, no scan
    from crawler_ray.stages.ann import ivf_bucket, list_col_to_matrix

    if n_centroids is None:
        n_vecs = _read(sf_dir, "embeddings", columns=["vec_id"]).count()
        n_centroids = max(8, -(-n_vecs // target_cluster))

    head = _head_by_id(sf_dir, n_centroids)
    cents = np.array(head["embedding"].to_list(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def per_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                    "is_dup": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values("vec_id", kind="stable")
        m = np.array(g["embedding"].to_list(), dtype=np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        n = len(mn)
        dup = np.zeros(n, dtype=bool)
        for lo in range(0, n, tile):
            hi = min(lo + tile, n)
            cos = mn[lo:hi] @ mn[:hi].T  # (tile, hi)
            # strictly-earlier mask: column j < row index (lo + r)
            col = np.arange(hi)
            row = np.arange(lo, hi)[:, None]
            dup[lo:hi] = ((cos >= tau) & (col < row)).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"].astype("int64").to_numpy(),
                "bucket": np.full(n, int(g["bucket"].iloc[0]), dtype=np.int64),
                "is_dup": dup.astype(np.int64),
            }
        )

    return (
        ivf_bucket(ds, cents)
        .groupby("bucket")
        .map_groups(per_cluster, batch_format="pandas")
    )


@register(
    "global_rank",
    """
    SELECT event_id, value,
           CAST(row_number() OVER (ORDER BY value DESC, event_id) AS BIGINT)
             AS rnk
    FROM events
    """,
    doc="Global rank over a distributed sort (the full-table ORDER BY + "
    "row_number shape): Ray's range-partitioned sort orders the blocks, "
    "then ranks are assigned by the two-phase scan pattern "
    "(stages/relational.py add_prefix_sum): phase 1 ships ONE "
    "(first-row key, row-count) summary per block to the driver — tiny "
    "at any scale — which computes exclusive block offsets; phase 2 "
    "re-walks the same materialized blocks adding offset + arange.  "
    "No row data ever concentrates; the only driver state is "
    "O(#blocks).  The block-boundary contract (batch_size=None over "
    "the materialized sorted blocks) is asserted, not assumed.",
)
def global_rank(sf_dir: str):
    import ray

    ds = (
        _read(sf_dir, "events", columns=["event_id", "value"])
        .sort(["value", "event_id"], descending=[True, False])
        .materialize()
    )

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "eid": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.float64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "eid": pa.array([t["event_id"][0].as_py()], type=pa.int64()),
                "v": pa.array([t["value"][0].as_py()], type=pa.float64()),
                "n": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    summ = (
        ds.map_batches(block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["v", "eid"], ascending=[False, True])
    )
    n = summ["n"].to_numpy(dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(n)[:-1]])
    omap = dict(zip(summ["eid"].to_numpy(dtype=np.int64).tolist(), offs.tolist()))
    oref = ray.put(omap)

    def add_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "value": pa.array([], type=pa.float64()),
                    "rnk": pa.array([], type=pa.int64()),
                }
            )
        m = ray.get(oref)
        first = int(t["event_id"][0].as_py())
        # same block-boundary contract as add_prefix_sum: phase-2
        # batches must start exactly at phase-1 block starts
        assert first in m, "global_rank block boundaries diverged"
        base = m[first]
        rnk = base + np.arange(1, t.num_rows + 1, dtype=np.int64)
        return pa.table(
            {"event_id": t["event_id"], "value": t["value"], "rnk": pa.array(rnk)}
        )

    return ds.map_batches(add_rank, batch_format="pyarrow", batch_size=None)


@register(
    "partitioned_export",
    """
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="Partitioned-parquet export, verified by reading the export "
    "back (the resumable-output contract: one directory per partition "
    "key so a failed run skips finished partitions; never one giant "
    "file).  Ray writes documents hash-partitioned BY LANG via "
    "write_parquet(partition_cols=['lang']) — each worker writes its "
    "own files, nothing routes through the driver — then the returned "
    "stats are computed by READING THE EXPORT BACK per partition "
    "directory, so the oracle green certifies the files on disk, not "
    "the in-flight dataset.  Hive-style partition dirs (lang=en/...) "
    "are the skip-unit for resume, mirroring dataprep's _SUCCESS "
    "convention.",
)
def partitioned_export(sf_dir: str, out_dir: str | None = None):
    import shutil
    import tempfile

    import ray
    from ray.data.aggregate import Count, Sum

    own = out_dir is None
    if own:
        out_dir = tempfile.mkdtemp(prefix="crawler_ray_export_", dir="/tmp")
    try:
        ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
        ds.write_parquet(out_dir, partition_cols=["lang"])
        back = ray.data.read_parquet(out_dir)
        out = (
            back.groupby("lang")
            .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
            .to_pandas()
        )
        # partition dirs exist per lang (the resume skip-unit)
        langs = set(out["lang"])
        on_disk = {
            d.split("=", 1)[1]
            for d in os.listdir(out_dir)
            if d.startswith("lang=")
        }
        assert on_disk == langs, (on_disk, langs)
        out["lang"] = out["lang"].astype(str)
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["total_chars"] = out["total_chars"].astype(np.int64)
        return pa.Table.from_pandas(out[["lang", "n_docs", "total_chars"]], preserve_index=False)
    finally:
        if own:
            shutil.rmtree(out_dir, ignore_errors=True)


@register(
    "chunk_documents",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    c AS (SELECT doc_id, ws,
                 unnest(generate_series(
                   0, CAST(floor((len(ws) - 1) / 6) AS BIGINT))) AS chunk_id
          FROM w)
    SELECT doc_id, chunk_id,
           array_to_string(ws[chunk_id * 6 + 1 : chunk_id * 6 + 12], ' ')
             AS chunk_text,
           CAST(least(12, len(ws) - chunk_id * 6) AS BIGINT) AS n_tokens
    FROM c
    """,
    doc="Strided sliding-window chunking (the context-window prep stage "
    "of an LLM training pipeline: window=12 tokens, stride=6, so "
    "consecutive chunks overlap by half and every token is covered; "
    "tail chunks run short).  Vectorized per CHUNK INDEX, not per row: "
    "iteration i filters docs with >i chunks and runs Arrow "
    "list_slice + binary_join over the whole column — the Python loop "
    "is O(max_chunks_per_doc), never O(rows) or O(tokens).  A pure "
    "flat_map: no shuffle, no state; output row count is "
    "sum(ceil(len_i/stride)) and streams straight to the next stage.",
)
def chunk_documents(sf_dir: str, window: int = 12, stride: int = 6):
    def chunk(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "chunk_id": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        tok = pc.split_pattern(txt, " ")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        lens = pc.list_value_length(tok).to_numpy().astype(np.int64)
        n_chunks = (lens - 1) // stride + 1  # split("") == [""], so lens >= 1
        did = t["doc_id"].to_numpy()
        parts = []
        for i in range(int(n_chunks.max())):
            mask = n_chunks > i
            sub = tok.filter(pa.array(mask))
            sl = pc.list_slice(sub, i * stride, i * stride + window)
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(did[mask]),
                        "chunk_id": pa.array(
                            np.full(int(mask.sum()), i, dtype=np.int64)
                        ),
                        "chunk_text": pc.binary_join(sl, " "),
                        "n_tokens": pa.array(
                            np.minimum(window, lens[mask] - i * stride).astype(np.int64)
                        ),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else empty

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        chunk, batch_format="pyarrow"
    )


@register(
    "text_normalize",
    """
    WITH aug AS (
      SELECT doc_id, lang,
             ' ' || upper(substr(text, 1, 8)) || chr(9) || text
                 || chr(10) || chr(10) || '  ' AS t
      FROM documents),
    n AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(t), '[\t\n\r ]+', ' ', 'g')) AS norm
      FROM aug)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(length(norm)) AS BIGINT) AS norm_chars,
           CAST(sum(CASE WHEN norm = lower(trim(norm)) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_idempotent
    FROM n GROUP BY lang
    """,
    doc="C4-style text normalization (lowercase, collapse whitespace "
    "runs, trim): the cleanup map every web-scraped corpus runs before "
    "tokenization.  Pure vectorized Arrow kernels — utf8_lower + "
    "replace_substring_regex (RE2, same engine as the DuckDB oracle) + "
    "utf8_trim — then a per-language combiner; one scan, no shuffle "
    "beyond lang partials.  The fixture text is already clean, so a "
    "deterministic messy augmentation (leading space, uppercased "
    "8-char prefix, tab/newline runs, trailing blanks — mirrored "
    "verbatim in the SQL, the pii_scrub trick) makes the kernels do "
    "real work; n_idempotent certifies normalize(normalize(x)) == "
    "normalize(x) on every row.  ASCII fixture assumption: substr "
    "is char-based in DuckDB vs codeunit-based in Arrow (identical "
    "on ASCII; a multilingual corpus would slice by codepoint).",
)
def text_normalize(sf_dir: str):
    def prep(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        n = len(txt)
        head = pc.utf8_upper(pc.utf8_slice_codeunits(txt, 0, 8))
        sp = pa.array([" "] * n, type=pa.string())
        tab = pa.array(["\t"] * n, type=pa.string())
        tail = pa.array(["\n\n  "] * n, type=pa.string())
        aug = pc.binary_join_element_wise(sp, head, tab, txt, tail, "")
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(aug), "[\t\n\r ]+", " "), " "
        )
        renorm = pc.utf8_trim(pc.utf8_lower(norm), " ")
        out = pa.table(
            {
                "lang": t["lang"],
                "one": pa.array(np.ones(n, dtype=np.int64)),
                "nc": pc.cast(pc.utf8_length(norm), pa.int64()),
                "idem": pc.cast(pc.equal(norm, renorm), pa.int64()),
            }
        )
        return make_partial_agg(["lang"], ["one", "nc", "idem"])(out)

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "documents", columns=["lang", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("one_sum", alias_name="n_docs"),
            Sum("nc_sum", alias_name="norm_chars"),
            Sum("idem_sum", alias_name="n_idempotent"),
        )
    )


@register(
    "funnel_conversion",
    """
    WITH c AS (SELECT user_id, min(ts) AS first_click FROM events
               WHERE event_type = 'click' GROUP BY user_id),
         p AS (SELECT user_id, max(ts) AS last_purchase FROM events
               WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT count(c.user_id) AS n_clickers,
           count(p.user_id) AS n_purchasers,
           CAST(sum(CASE WHEN p.last_purchase >= c.first_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM c FULL OUTER JOIN p USING (user_id)
    """,
    doc="Funnel conversion (the ordered-sequence analytics shape: did "
    "a click PRECEDE a purchase, per user): one scan reduces each "
    "(user, role) to its extreme timestamp inside the batch (a "
    "combiner — min first-click / max last-purchase merge "
    "associatively), one small shuffle on user buckets merges partials "
    "and scores the funnel per user, and three counters come back.  "
    "Per-user state is TWO timestamps regardless of event volume, so "
    "the shuffle carries 2 rows per (user, batch) — the same "
    "pre-aggregation rule as pricing_summary, applied to an "
    "order-sensitive predicate made associative by reducing to "
    "extremes.",
)
def funnel_conversion(sf_dir: str):
    def partials(t: pa.Table) -> pd.DataFrame:
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        us = t["ts"].cast(pa.int64()).to_numpy()
        uid = t["user_id"].to_numpy()
        out = []
        for role, is_r in (("c", typ == "click"), ("p", typ == "purchase")):
            if is_r.any():
                df = pd.DataFrame({"user_id": uid[is_r], "ts": us[is_r]})
                agg = df.groupby("user_id", as_index=False)["ts"].agg(
                    "min" if role == "c" else "max"
                )
                agg["role"] = role
                out.append(agg)
        if not out:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "ts": pd.Series([], dtype="int64"),
                    "role": pd.Series([], dtype="object"),
                    "__b": pd.Series([], dtype="int32"),
                }
            )
        df = pd.concat(out, ignore_index=True)
        df["__b"] = (df["user_id"].to_numpy() % 64).astype("int32")
        return df

    def score(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "nc": pd.Series([], dtype="int64"),
                    "np_": pd.Series([], dtype="int64"),
                    "nv": pd.Series([], dtype="int64"),
                }
            )
        c = g[g["role"] == "c"].groupby("user_id")["ts"].min()
        p = g[g["role"] == "p"].groupby("user_id")["ts"].max()
        j = pd.concat([c.rename("fc"), p.rename("lp")], axis=1)
        conv = (j["lp"] >= j["fc"]).sum()
        return pd.DataFrame(
            {
                "nc": [int(j["fc"].notna().sum())],
                "np_": [int(j["lp"].notna().sum())],
                "nv": [int(conv)],
            }
        )

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    per_bucket = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(score, batch_format="pandas")
    )
    out = (
        per_bucket.map_batches(
            lambda t: t.append_column("k", pa.array([0] * t.num_rows, type=pa.int32())),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(
            Sum("nc", alias_name="n_clickers"),
            Sum("np_", alias_name="n_purchasers"),
            Sum("nv", alias_name="n_converted"),
        )
    )
    return out.map_batches(
        lambda t: t.drop_columns(["k"]), batch_format="pyarrow"
    )


def _head_by_id(sf_dir: str, n: int, table: str = "embeddings", columns=("vec_id", "embedding")):
    """First ``n`` rows by id WITHOUT a distributed sort: each batch
    keeps its n smallest (a combiner — 'n smallest' merges
    associatively), the driver merges n*batches candidate rows.  The
    sort+limit form shuffles the whole table to take 8 rows."""
    import pandas as pd

    def local_head(t: pa.Table) -> pa.Table:
        ids = t[columns[0]].to_numpy()
        if len(ids) > n:
            sel = np.argpartition(ids, n - 1)[:n]
            t = t.take(pa.array(np.sort(sel)))
        return t

    parts = (
        _read(sf_dir, table, columns=list(columns))
        .map_batches(local_head, batch_format="pyarrow")
        .to_pandas()
    )
    return parts.sort_values(columns[0], kind="stable").head(n).reset_index(drop=True)


def _pagerank_sql(iters: int = 5) -> str:
    """Chained-CTE integer PageRank oracle: rank r0 = 10^6 everywhere;
    each iteration r'_t = 150000 + (85 * Σ_{u→t} (r_u // k_u)) // 100 —
    ALL integer arithmetic, so Ray and DuckDB agree bit-exactly (no
    float damping, no summation-order hazard)."""
    parts = [
        "WITH n AS (SELECT count(*) AS c FROM documents),",
        "e AS (SELECT d.doc_id AS src, d.doc_id % 5 + 3 AS k,",
        "             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target",
        "      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)),",
        "r0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS r FROM documents)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",r{i} AS (
      SELECT d.doc_id,
             CAST(150000 + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
      FROM documents d LEFT JOIN (
        SELECT e.target AS doc_id, sum(rp.r // e.k) AS s
        FROM e JOIN r{i - 1} rp ON rp.doc_id = e.src
        GROUP BY e.target) s USING (doc_id))"""
        )
    parts.append(f"SELECT doc_id, r AS rank_scaled FROM r{iters}")
    return "\n".join(parts)


# Auto-regime cap: above this node count the broadcast path's dense
# int64[n] rank vector (8 B/node, re-shipped per iteration) costs more
# than the Dataset regime's extra aggregation — 10^8 nodes = 800 MB.
PAGERANK_BROADCAST_CAP_NODES = 100_000_000


def _pagerank_dataset_regime(sf_dir: str, n: int, iters: int):
    """Past-vector-fits PageRank regime (the documented scale path, now
    real): the rank vector never materializes on the driver — ranks
    live as a Dataset of (doc_id, r) rows, each iteration scans it
    (every rank row carries everything needed to emit its own
    contributions, so there is NO broadcast at all in this derived
    graph), partial sums merge in the bucketed aggregation, and the
    next rank Dataset is (sums UNION per-node zeros) re-aggregated —
    a left join without the join.  Same integer arithmetic as the
    broadcast regime; forced-regime test asserts row equality."""
    import pandas as pd

    from crawler_ray.stages.relational import bucketed_agg

    rank_ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"],
             "r": pa.array(np.full(t.num_rows, 1_000_000, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()

    def zeros(t: pa.Table) -> pa.Table:
        return pa.table(
            {"target": t["doc_id"],
             "s": pa.array(np.zeros(t.num_rows, dtype=np.int64))}
        )

    zero_ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        zeros, batch_format="pyarrow"
    ).materialize()

    def contrib(df: pd.DataFrame) -> pa.Table:
        if df.shape[1] == 0 or len(df) == 0:
            return pa.table(
                {"target": pa.array([], type=pa.int64()), "s": pa.array([], type=pa.int64())}
            )
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        rr = df["r"].to_numpy(dtype=np.int64)
        k = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, k)
        j = np.arange(len(src)) - np.repeat(np.cumsum(k) - k, k)
        tgt = (src * 131 + j * 37 + j * j * 11 + 7) % n
        cc = np.repeat(rr // k, k)
        order = np.argsort(tgt, kind="stable")
        ts_, cs = tgt[order], cc[order]
        starts = np.flatnonzero(np.concatenate(([True], ts_[1:] != ts_[:-1])))
        return pa.table(
            {
                "target": pa.array(ts_[starts]),
                "s": pa.array(np.add.reduceat(cs, starts) if len(starts) else cs[:0]),
            }
        )

    def update(df: pd.DataFrame) -> pa.Table:
        if df.shape[1] == 0 or len(df) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()), "r": pa.array([], type=pa.int64())}
            )
        sv = df["s"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(df["target"].to_numpy(dtype=np.int64)),
                "r": pa.array(150_000 + (85 * sv) // 100),
            }
        )

    for _ in range(iters):
        partials = rank_ds.map_batches(contrib, batch_format="pandas")
        totals = bucketed_agg(partials.union(zero_ds), keys=["target"], sum_cols={"s": "s"})
        rank_ds = totals.map_batches(update, batch_format="pandas").materialize()

    return rank_ds.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "rank_scaled": t["r"]}),
        batch_format="pyarrow",
    )


@register(
    "pagerank",
    _pagerank_sql(5),
    doc="Distributed PageRank over the derived link graph (the "
    "iterative-graph-algorithm class: BSP power iteration).  EXACT "
    "INTEGER scheme so the oracle is bit-identical: ranks start at "
    "10^6, each of 5 iterations computes r'_t = 150000 + "
    "(85 * Σ contributions) // 100 with contribution r_u // outdeg_u "
    "— no float damping factor, no summation-order hazard.  Per "
    "iteration: ONE scan of the documents table explodes edges and "
    "pre-aggregates contributions per target inside the batch "
    "(sort + reduceat — a combiner, so the shuffle carries one row "
    "per (target, batch)), a bucketed merge produces the new sparse "
    "rank updates, and the driver assembles the dense rank vector "
    "for the next broadcast (valid while the NODE VECTOR fits — "
    "int64[n], ~8 GB at 10^9 nodes; past "
    "PAGERANK_BROADCAST_CAP_NODES the dispatch AUTO-SWITCHES to the "
    "dataset_regime, which keeps ranks as a (doc_id, r) Dataset with "
    "zero broadcast — sums UNION per-node zeros re-aggregated is the "
    "left-join-free update; forced-regime test asserts equality, and "
    "the bench sweep times both).  Out-degrees are arithmetic "
    "in this derived graph; a real graph carries them as a column.",
)
def pagerank(sf_dir: str, iters: int = 5, dataset_regime: bool | None = None):
    import ray
    from crawler_ray.stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    if dataset_regime is None:
        # auto-dispatch on node count (the repo's regime-switch pattern,
        # cf. _ngram_jaccard_join_regime): past the cap the dense
        # int64[n] vector re-broadcast per iteration (~8 GB at 10^9
        # nodes) stops being acceptable and ranks stay a Dataset
        dataset_regime = n > PAGERANK_BROADCAST_CAP_NODES
    if dataset_regime:
        return _pagerank_dataset_regime(sf_dir, n, iters)
    r = np.full(n, 1_000_000, dtype=np.int64)
    docs = _read(sf_dir, "documents", columns=["doc_id"]).materialize()

    for _ in range(iters):
        rref = ray.put(r)

        def contrib(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            k = (ids % 5 + 3).astype(np.int64)
            tgt = _explode_links(t, n)
            rr = ray.get(rref)
            cc = np.repeat(rr[ids] // k, k)
            order = np.argsort(tgt, kind="stable")
            ts_, cs = tgt[order], cc[order]
            starts = np.flatnonzero(
                np.concatenate(([True], ts_[1:] != ts_[:-1]))
            )
            return pa.table(
                {
                    "target": pa.array(ts_[starts]),
                    "s": pa.array(np.add.reduceat(cs, starts) if len(starts) else cs[:0]),
                }
            )

        sums = bucketed_agg(
            docs.map_batches(contrib, batch_format="pyarrow"),
            keys=["target"],
            sum_cols={"s": "s"},
        ).to_pandas()
        s = np.zeros(n, dtype=np.int64)
        if len(sums):
            s[sums["target"].to_numpy(dtype=np.int64)] = sums["s"].to_numpy(dtype=np.int64)
        r = 150_000 + (85 * s) // 100

    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "rank_scaled": pa.array(r),
        }
    )


@register(
    "distinct_kmv",
    """
    WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
                 FROM documents),
    h AS (SELECT DISTINCT lang, md5_number_lower(w) AS hv FROM tok),
    rk AS (SELECT lang, hv,
                  row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
           FROM h),
    kth AS (SELECT lang, max(CASE WHEN rn = 256 THEN hv END) AS hk
            FROM rk GROUP BY lang),
    ex AS (SELECT lang, count(*) AS exact FROM h GROUP BY lang)
    SELECT e.lang, CAST(e.exact AS BIGINT) AS exact_distinct,
           CAST(CASE WHEN k.hk IS NULL THEN e.exact
                ELSE (CAST(255 AS HUGEINT) * 18446744073709551616) // k.hk
                END AS BIGINT) AS kmv_estimate
    FROM ex e LEFT JOIN kth k USING (lang)
    """,
    doc="KMV (k-minimum-values) distinct-count sketch per language, "
    "k=256 — the mergeable-sketch class: each batch contributes its "
    "k smallest md5 hashes of its distinct tokens (sketch union is "
    "'keep the k smallest' — associative and commutative, so a "
    "sketch-only deployment prunes to ≤ k rows per (lang, batch); "
    "HERE the exact side-by-side count needs every distinct pair, so "
    "batches dedup but don't prune), buckets dedup hashes exactly, "
    "and the estimate is the "
    "DETERMINISTIC (k-1) * 2^64 // h_k — pure integer arithmetic on a "
    "fixed hash, which is why this sketch (unlike HLL's floats) "
    "carries a bit-exact SQL oracle.  The exact distinct count rides "
    "the same bucket pass for side-by-side accuracy reading.  Fewer "
    "than k distinct values -> the sketch IS exact (both sides "
    "branch identically).",
)
def distinct_kmv(sf_dir: str, k: int = 256, sketch_only: bool = False):
    # sketch_only=True is the scale posture: batches prune to their k
    # smallest per lang (shuffle <= k rows per (lang, batch)) and the
    # exact column reports -1 — the ESTIMATE is unchanged because the
    # global k smallest survive any per-batch k-smallest pruning
    # (union of k-minimum sketches is the k-minimum of the union)
    import hashlib

    docs = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        langs = t["lang"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        seen: dict[tuple, bool] = {}
        for lang, txt in zip(langs, texts):
            for w in set(txt.split(" ")):
                seen[(lang, w)] = True
        if not seen:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype="object"),
                    "hv": pd.Series([], dtype="uint64"),
                    "__b": pd.Series([], dtype="int32"),
                }
            )
        ls, hs = [], []
        # hash each DISTINCT (lang, token) once (vocab-bounded)
        for (lang, w) in seen:
            ls.append(lang)
            hs.append(
                int.from_bytes(hashlib.md5(w.encode()).digest()[8:16], "little")
            )
        hv = np.array(hs, dtype=np.uint64)
        df = pd.DataFrame({"lang": pd.Series(ls, dtype="object"), "hv": hv})
        if sketch_only:
            # prune to the k smallest per (lang, batch): the sketch
            # union keeps estimates identical, the exact leg is dropped
            df = df.sort_values("hv", kind="stable").groupby("lang", sort=False).head(k)
        # else NO pruning: the EXACT side-by-side count needs every
        # distinct pair (rows are deduped within the batch regardless)
        df["__b"] = (df["hv"].to_numpy() % np.uint64(64)).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype="object"),
                    "hv": pd.Series([], dtype="uint64"),
                    "n_exact": pd.Series([], dtype="int64"),
                }
            )
        d = g.drop_duplicates(["lang", "hv"])
        counts = d.groupby("lang", sort=False).size()
        d = d.sort_values("hv", kind="stable").groupby("lang", sort=False).head(k)
        d = d[["lang", "hv"]].copy()
        d["n_exact"] = d["lang"].map(counts).astype("int64")
        # n_exact repeats per row; the driver takes first-per-(bucket,lang)
        d["n_exact"] = np.where(
            d.groupby("lang", sort=False).cumcount() == 0, d["n_exact"], 0
        )
        return d

    merged = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out_rows = []
    for lang, g in merged.groupby("lang"):
        exact = -1 if sketch_only else int(g["n_exact"].sum())
        hv = np.sort(np.unique(g["hv"].to_numpy()))
        # NOTE: per-bucket combiners may under-collect below global k
        # only if a bucket held >k of the k-smallest — impossible to
        # distinguish here, so the union keeps everything the buckets
        # kept; with 64 buckets and k=256 the global k-smallest are
        # always present (each bucket kept its local k-smallest).
        if len(hv) < k or (not sketch_only and exact < k):
            est = len(hv) if sketch_only else exact
        else:
            est = int(((k - 1) << 64) // int(hv[k - 1]))
        out_rows.append({"lang": lang, "exact_distinct": exact, "kmv_estimate": est})
    out = pd.DataFrame(out_rows)
    return pa.table(
        {
            "lang": pa.array(out["lang"], type=pa.string()),
            "exact_distinct": pa.array(out["exact_distinct"], type=pa.int64()),
            "kmv_estimate": pa.array(out["kmv_estimate"], type=pa.int64()),
        }
    )


@register(
    "event_transitions",
    """
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS nxt
               FROM events)
    SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
    FROM s WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    """,
    doc="Event-sequence transition counts (the Markov/session-flow "
    "shape: for each user's time-ordered stream, count "
    "event_type -> next event_type pairs).  Per-user order is the "
    "only sequential dependency, so rows bucket by user hash, each "
    "bucket sorts once by (user, ts, event_id) and pairs adjacent "
    "rows vectorized (shifted-array compare — a per-bucket combiner "
    "emitting ≤ |types|² partial rows), and a tiny groupby merges.  "
    "The transition matrix itself is |types|² regardless of volume.",
)
def event_transitions(sf_dir: str):
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "from_type": pd.Series([], dtype="object"),
                    "to_type": pd.Series([], dtype="object"),
                    "pn": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy()
        same = u[:-1] == u[1:]
        df = pd.DataFrame({"from_type": t[:-1][same], "to_type": t[1:][same]})
        out = df.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "pn"})

    def prep(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": pd.Series(uid, dtype="int64"),
                "ts_us": pd.Series(t["ts"].cast(pa.int64()).to_numpy(), dtype="int64"),
                "event_id": pd.Series(t["event_id"].to_numpy(), dtype="int64"),
                "event_type": pd.Series(
                    t["event_type"].to_numpy(zero_copy_only=False), dtype="object"
                ),
                "__b": pd.Series((uid % 64).astype("int32")),
            }
        )

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"])
    partials = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
    )
    return partials.groupby(["from_type", "to_type"]).aggregate(Sum("pn", alias_name="n"))


@register(
    "bloom_semi_join",
    """
    SELECT l_linestatus, count(*) AS n,
           sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))/100.0 AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_linestatus
    """,
    doc="Bloom-prefiltered semi-join (the runtime-filter pattern big "
    "engines push into scans): the build side (urgent orders) emits "
    "ONE 128 KB bitmap per batch — set-bit union is associative, so "
    "bitmaps OR-merge (driver-merged here, tree-merge at scale) into "
    "a 2^20-bit Bloom filter broadcast once; the probe scan tests two "
    "multiplicative hashes per row VECTORIZED and drops definite "
    "non-members before any shuffle, so the exact semi Dataset.join "
    "(which settles Bloom false positives) sees only survivors.  "
    "Correctness never depends on the filter — it only cuts the "
    "join's input volume (~1/5 here: one priority class of orders).  "
    "All downstream money math is exact integer cents.",
)
def bloom_semi_join(sf_dir: str, m_bits_log2: int = 20):
    # m_bits_log2 is a test hook: shrinking the filter forces false
    # positives, which the exact join must settle (tested at 2^6 bits)
    import ray

    M_BITS = 1 << m_bits_log2
    MUL1 = np.uint64(0x9E3779B97F4A7C15)
    MUL2 = np.uint64(0xC2B2AE3D27D4EB4F)
    SHIFT = np.uint64(64 - m_bits_log2)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def build_bitmap(t: pa.Table) -> pa.Table:
        m = pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))
        keys = t["o_orderkey"].filter(m).to_numpy().astype(np.uint64)
        bits = np.zeros(M_BITS // 8, dtype=np.uint8)
        with np.errstate(over="ignore"):
            for mul in (MUL1, MUL2):
                pos = (keys * mul) >> SHIFT
                np.bitwise_or.at(bits, (pos // 8).astype(np.int64), (1 << (pos % 8)).astype(np.uint8))
        return pa.table({"bm": pa.array([bits.tobytes()], type=pa.large_binary())})

    parts = orders.map_batches(build_bitmap, batch_format="pyarrow").to_pandas()
    bloom = np.zeros(M_BITS // 8, dtype=np.uint8)
    for bm in parts["bm"]:
        bloom |= np.frombuffer(bm, dtype=np.uint8)
    bref = ray.put(bloom)

    def keys_only(t: pa.Table) -> pa.Table:
        m = pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))
        return pa.table({"o_orderkey": t["o_orderkey"].filter(m)})

    build_ds = orders.map_batches(keys_only, batch_format="pyarrow").materialize()

    def prefilter(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        keys = t["l_orderkey"].to_numpy().astype(np.uint64)
        ok = np.ones(len(keys), dtype=bool)
        with np.errstate(over="ignore"):
            for mul in (MUL1, MUL2):
                pos = (keys * mul) >> SHIFT
                ok &= (b[(pos // 8).astype(np.int64)] >> (pos % 8).astype(np.uint8)) & 1 == 1
        return t.filter(pa.array(ok))

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_quantity"])
    survivors = li.map_batches(prefilter, batch_format="pyarrow")
    num_partitions = int(np.clip(build_ds.count() // 25_000, 2, 16))
    joined = survivors.join(
        build_ds, join_type="inner", num_partitions=num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table({"l_linestatus": t["l_linestatus"], "qty_c": cents(t["l_quantity"])})
        return make_partial_agg(["l_linestatus"], ["qty_c"])(out)

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(Sum("partial_n", alias_name="n"), Sum("qty_c_sum", alias_name="qc"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "l_linestatus": t["l_linestatus"],
                "n": t["n"],
                "sum_qty": pc.divide(pc.cast(t["qc"], pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


@register(
    "session_coverage",
    """
    WITH s AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             max(epoch_us(ts) + 300000000) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM events),
    g AS (SELECT user_id, event_id, t,
                 CASE WHEN prev_end IS NULL OR t > prev_end THEN 1 ELSE 0 END
                   AS new_island
          FROM s),
    isl AS (SELECT user_id, t, sum(new_island) OVER (
              PARTITION BY user_id ORDER BY t, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM g),
    per AS (SELECT user_id, island,
                   max(t) + 300000000 - min(t) AS span_us
            FROM isl GROUP BY user_id, island)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(span_us) AS BIGINT) AS covered_us
    FROM per GROUP BY user_id
    """,
    doc="Gaps-and-islands (interval-union coverage): each event opens a "
    "300 s activity window; per user, merge overlapping windows into "
    "islands and report island count + total covered time — the "
    "'total active time' analytics shape that naive GROUP BYs can't "
    "express.  Distributed: user-hash buckets, one sort per bucket, "
    "then the island scan is pure vectorized numpy (island starts "
    "where t exceeds the running max end — computed with "
    "np.maximum.accumulate, no row loop); per-island spans reduce "
    "with add.reduceat.  All times integer microseconds -> exact "
    "oracle.  Per-user history in one bucket is the partitioning "
    "assumption (the keyed-state rule).",
)
def session_coverage(sf_dir: str, window_us: int = 300_000_000):
    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_islands": pd.Series([], dtype="int64"),
                    "covered_us": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        end = t + window_us
        # per-user running max of window ends, shifted to exclude the
        # current row — pandas grouped cummax/shift are vectorized C
        # with native per-group reset (no int64 banding tricks)
        df = pd.DataFrame({"u": u, "end": end})
        prev = df.groupby("u", sort=False)["end"].cummax().groupby(u).shift(1)
        new_island = (prev.isna() | (t > prev.to_numpy())).to_numpy()
        isl_start = np.flatnonzero(new_island)
        # island span = (max window end within the island) - (first t)
        max_end = np.maximum.reduceat(end, isl_start) if len(isl_start) else end[:0]
        span = max_end - t[isl_start]
        isl_user = u[isl_start]
        df = pd.DataFrame({"user_id": isl_user, "span": span})
        out = df.groupby("user_id", as_index=False).agg(
            n_islands=("span", "size"), covered_us=("span", "sum")
        )
        return out.astype({"user_id": "int64", "n_islands": "int64", "covered_us": "int64"})

    def prep(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": pd.Series(uid, dtype="int64"),
                "ts_us": pd.Series(t["ts"].cast(pa.int64()).to_numpy(), dtype="int64"),
                "event_id": pd.Series(t["event_id"].to_numpy(), dtype="int64"),
                "__b": pd.Series((uid % 64).astype("int32")),
            }
        )

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(kernel, batch_format="pandas")
    )


@register(
    "inverted_index",
    """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    d AS (SELECT DISTINCT term, doc_id FROM tok),
    agg AS (SELECT term, count(*) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM d GROUP BY term)
    SELECT term, CAST(df AS BIGINT) AS df, postings
    FROM agg WHERE df >= 5
    """,
    doc="Inverted-index construction (the search-engine build "
    "artifact: term → sorted posting list of documents holding it), "
    "materialized for terms with df >= 5.  One scan explodes "
    "(doc, term)-distinct pairs with the dictionary-encode + lexsort "
    "kernel (no Python over tokens), a single term-hash bucket "
    "shuffle co-locates each term's postings, and each bucket emits "
    "its posting strings with one grouped sort — at scale the "
    "postings write straight to term-bucket-partitioned parquet "
    "(partitioned_export's layout) instead of returning.  Posting "
    "lists are comma-joined sorted doc_ids so the oracle "
    "(string_agg ORDER BY) compares exactly.",
)
def inverted_index(sf_dir: str, min_df: int = 5):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_distinct(t: pa.Table) -> pd.DataFrame:
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        tok_list = pc.split_pattern(txt, " ")
        if isinstance(tok_list, pa.ChunkedArray):
            tok_list = tok_list.combine_chunks()
        lens = pc.list_value_length(tok_list).to_numpy().astype(np.int64)
        dct = pc.dictionary_encode(tok_list.values)
        codes = dct.indices.to_numpy().astype(np.int64)
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        order = np.lexsort((codes, rows))
        r_s, c_s = rows[order], codes[order]
        first = np.ones(len(r_s), dtype=bool)
        first[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
        did = t["doc_id"].to_numpy()
        terms = np.asarray(dct.dictionary.to_pylist(), dtype=object)[c_s[first]]
        df = pd.DataFrame(
            {
                "term": pd.Series(terms, dtype="object"),
                "doc_id": pd.Series(did[r_s[first]], dtype="int64"),
            }
        )
        df["__b"] = (
            pd.util.hash_pandas_object(df["term"], index=False).to_numpy() % 64
        ).astype("int32")
        return df

    def build(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "term": pd.Series([], dtype="object"),
                    "df": pd.Series([], dtype="int64"),
                    "postings": pd.Series([], dtype="object"),
                }
            )
        g = g.sort_values(["term", "doc_id"], kind="stable")
        out = g.groupby("term", as_index=False, sort=False).agg(
            df=("doc_id", "size"),
            postings=("doc_id", lambda s: ",".join(map(str, s))),
        )
        out = out[out["df"] >= min_df]
        return out.astype({"df": "int64"})

    return (
        docs.map_batches(explode_distinct, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(build, batch_format="pandas")
    )


@register(
    "typo_pairs",
    """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    aug AS (SELECT w FROM tok
            UNION ALL
            SELECT w || 'x' FROM (SELECT DISTINCT w FROM tok) u
            WHERE md5_number_lower(u.w) % 4 = 0),
    v AS (SELECT DISTINCT w FROM aug)
    SELECT a.w AS term_a, b.w AS term_b
    FROM v a JOIN v b ON a.w < b.w
    WHERE levenshtein(a.w, b.w) = 1
    """,
    doc="String-similarity self-join at edit distance exactly 1 (the "
    "typo-dedup class): find all vocabulary pairs one edit apart "
    "WITHOUT the quadratic all-pairs scan.  Deletion-neighborhood "
    "hashing: every term emits its |w|+1 single-deletion variants "
    "(plus itself); two terms at edit distance 1 are GUARANTEED to "
    "share a variant (substitution -> same deletion at the edited "
    "position; insert/delete -> one term IS the other's deletion), so "
    "candidates come from one variant-hash bucket shuffle and a "
    "per-bucket self-merge, then an exact Levenshtein verify prunes "
    "distance-2 collisions.  Cost is O(Σ|w|) candidate rows instead "
    "of O(|V|²) comparisons.  The fixture vocabulary is augmented "
    "with deterministic 'w'+'x' typos (mirrored in SQL, the pii_scrub "
    "trick) so real pairs exist.  Verify is per-candidate Python but "
    "candidate volume is deletion-bucket-bounded (the LSH-sparsity "
    "argument); DuckDB's levenshtein() is the oracle.",
)
def typo_pairs(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["text"])

    def vocab_batch(t: pa.Table) -> pd.DataFrame:
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        tok_list = pc.split_pattern(txt, " ")
        if isinstance(tok_list, pa.ChunkedArray):
            tok_list = tok_list.combine_chunks()
        uniq = set(tok_list.values.to_pylist())
        # deterministic typo augmentation (mirrored in the oracle)
        from crawler_ray.functions.shingles import md5_hash64

        aug = {w + "x" for w in uniq if md5_hash64(w) % 4 == 0}
        words = sorted(uniq | aug)
        return pd.DataFrame({"w": pd.Series(words, dtype="object")})

    def explode_deletions(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame(
                {
                    "w": pd.Series([], dtype="object"),
                    "var": pd.Series([], dtype="object"),
                    "__b": pd.Series([], dtype="int32"),
                }
            )
        ws, vs = [], []
        for w in df["w"].drop_duplicates():
            ws.append(w)
            vs.append(w)  # the term itself (covers insert/delete pairs)
            for i in range(len(w)):
                ws.append(w)
                vs.append(w[:i] + w[i + 1 :])
        out = pd.DataFrame(
            {"w": pd.Series(ws, dtype="object"), "var": pd.Series(vs, dtype="object")}
        )
        out["__b"] = (
            pd.util.hash_pandas_object(out["var"], index=False).to_numpy() % 64
        ).astype("int32")
        return out

    def pairs_in_bucket(g: pd.DataFrame):
        # Arrow empties (typed string), not all-object pandas empties —
        # Ray's block-size estimator warns on size-0 object columns
        empty = pa.table(
            {"term_a": pa.array([], type=pa.string()), "term_b": pa.array([], type=pa.string())}
        )
        if g.shape[1] == 0 or len(g) == 0:
            return empty
        g = g.drop_duplicates(["w", "var"])
        m = g.merge(g, on="var")
        m = m[m["w_x"] < m["w_y"]].drop_duplicates(["w_x", "w_y"])
        if len(m) == 0:
            return empty

        def ed1(a: str, b: str) -> bool:
            la, lb = len(a), len(b)
            if abs(la - lb) > 1 or a == b:
                return False
            if la == lb:  # substitution: differ at exactly one position
                return sum(x != y for x, y in zip(a, b)) == 1
            if la > lb:
                a, b, la, lb = b, a, lb, la
            i = 0
            while i < la and a[i] == b[i]:
                i += 1
            return a[i:] == b[i + 1 :]

        keep = [ed1(x, y) for x, y in zip(m["w_x"], m["w_y"])]
        m = m[np.array(keep, dtype=bool)]
        return pa.table(
            {
                "term_a": pa.array(m["w_x"].tolist(), type=pa.string()),
                "term_b": pa.array(m["w_y"].tolist(), type=pa.string()),
            }
        )

    pairs = (
        docs.map_batches(vocab_batch, batch_format="pyarrow")
        .map_batches(explode_deletions, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )

    # cross-bucket duplicate pairs are impossible: a pair is emitted
    # only in its shared variant's bucket; two DIFFERENT shared
    # variants would land the pair in two buckets, so distinct once
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            return pd.DataFrame(
                {"term_a": pd.Series([], dtype="object"), "term_b": pd.Series([], dtype="object")}
            )
        return df.drop_duplicates(["term_a", "term_b"])

    out = pairs.to_pandas()
    out = dedup_pairs(out)
    return pa.table(
        {
            "term_a": pa.array(out["term_a"], type=pa.string()),
            "term_b": pa.array(out["term_b"], type=pa.string()),
        }
    )


@register(
    "rolling_hour_sum",
    """
    SELECT event_id,
           sum(CAST(floor(value*100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) / 100.0 AS hour_sum
    FROM events
    """,
    doc="RANGE-frame moving window (rolling 1-hour sum per user — the "
    "time-based frame ROWS frames can't express: the frame holds "
    "every event within the trailing hour, however many there are).  "
    "Per-bucket kernel: sort once by (user, ts), exact-cents prefix "
    "sums, then per USER (the loop is over users; each user's rows "
    "are one vectorized searchsorted) frame start = first index with "
    "ts >= ts_i - 1h and frame end = the LAST PEER row (RANGE frames "
    "include all same-timestamp peers); hour_sum = prefix[end] - "
    "prefix[start-1].  All integer cents -> exact oracle.  (An "
    "earlier draft vectorized the searchsorted GLOBALLY across user "
    "spans with clamps — wrong at bucket sizes above the fixture; "
    "the sf0.01 oracle caught it.)",
)
def rolling_hour_sum(sf_dir: str, window_us: int = 3_600_000_000):
    def prep(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": pd.Series(uid, dtype="int64"),
                "ts_us": pd.Series(t["ts"].cast(pa.int64()).to_numpy(), dtype="int64"),
                "event_id": pd.Series(t["event_id"].to_numpy(), dtype="int64"),
                "vc": pd.Series(cents(t["value"]).to_numpy(), dtype="int64"),
                "__b": pd.Series((uid % 64).astype("int32")),
            }
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "hour_sum": pd.Series([], dtype="float64"),
                }
            )
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        t = g["ts_us"].to_numpy()
        v = g["vc"].to_numpy()
        pre = np.cumsum(v)
        n = len(u)
        user_start = np.ones(n, dtype=bool)
        user_start[1:] = u[1:] != u[:-1]
        starts_idx = np.flatnonzero(user_start)
        ends_idx = np.append(starts_idx[1:], n)
        s = np.empty(n, dtype=np.int64)
        # loop is over USERS (each iteration fully vectorized over that
        # user's rows); frames never cross users so per-span
        # searchsorted is exact.  RANGE frame end = last PEER (same ts).
        for lo, hi in zip(starts_idx, ends_idx):
            tt = t[lo:hi]
            st = lo + np.searchsorted(tt, tt - window_us, side="left")
            en = lo + np.searchsorted(tt, tt, side="right") - 1
            base = np.where(st > 0, pre[np.maximum(st - 1, 0)], 0)
            s[lo:hi] = pre[en] - base
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "hour_sum": s / 100.0,
            }
        )

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(kernel, batch_format="pandas")
    )


@register(
    "pivot_events",
    """
    SELECT user_id,
           sum(CASE WHEN event_type = 'click' THEN
             CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END)/100.0
             AS click_value,
           sum(CASE WHEN event_type = 'view' THEN
             CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END)/100.0
             AS view_value,
           sum(CASE WHEN event_type = 'purchase' THEN
             CAST(floor(value*100 + 0.5) AS BIGINT) ELSE 0 END)/100.0
             AS purchase_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
    doc="Pivot (rows → typed columns: per user, one value column per "
    "event type): implemented as CONDITIONAL AGGREGATION — each batch "
    "widens event_type into per-type cent columns with vectorized "
    "masks, partially aggregates per user inside the batch (the "
    "combiner), and one small groupby merges.  No per-type scans, no "
    "transpose materialization; unknown types fold into n_events "
    "only.  The pivot column set is fixed up front (the engine "
    "contract every SQL PIVOT shares — dynamic pivots need a first "
    "pass to enumerate types, same shape as heavy_hitters' key "
    "discovery).",
)
def pivot_events(sf_dir: str):
    TYPES = ("click", "view", "purchase")

    def prep(t: pa.Table) -> pa.Table:
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        vc = cents(t["value"]).to_numpy()
        cols = {"user_id": t["user_id"]}
        for ty in TYPES:
            cols[f"{ty}_c"] = pa.array(np.where(typ == ty, vc, 0))
        cols["one"] = pa.array(np.ones(len(typ), dtype=np.int64))
        out = pa.table(cols)
        return make_partial_agg(["user_id"], [f"{ty}_c" for ty in TYPES] + ["one"])(out)

    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "events", columns=["user_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            *[Sum(f"{ty}_c_sum", alias_name=f"{ty}_c") for ty in TYPES],
            Sum("one_sum", alias_name="n_events"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in TYPES:
            cols[f"{ty}_value"] = pc.divide(pc.cast(t[f"{ty}_c"], pa.float64()), 100.0)
        cols["n_events"] = t["n_events"]
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "shuffle_shards",
    """
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id)
             - 1 AS BIGINT) AS pos,
           CAST((row_number() OVER (
             ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id)
             - 1) // 64 AS BIGINT) AS shard
    FROM documents
    """,
    doc="Deterministic training-order shuffle + sharding (the data-"
    "ordering step before LLM training: a reproducible global "
    "permutation, cut into fixed-size shards): order = md5(doc_id) — "
    "a seeded permutation both engines derive identically — realized "
    "as a distributed RANGE-PARTITIONED SORT on the hash key plus the "
    "two-phase block-offset rank scan (global_rank's machinery: one "
    "(first-key, count) summary per block to the driver, offsets "
    "back).  Shard id = pos // shard_size, so shards are written "
    "independently by whichever worker holds the block — the "
    "partitioned-export layout.  No row data concentrates; the "
    "permutation is stable across runs and cluster sizes (it depends "
    "only on doc_id).",
)
def shuffle_shards(sf_dir: str, shard_size: int = 64):
    import ray
    from crawler_ray.functions.shingles import md5_hash64

    def add_key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = np.array([md5_hash64(str(i)) for i in ids], dtype=np.uint64)
        return pa.table({"doc_id": t["doc_id"], "h": pa.array(h)})

    ds = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(add_key, batch_format="pyarrow")
        .sort(["h", "doc_id"])
        .materialize()
    )

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "h": pa.array([], type=pa.uint64()),
                    "eid": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "h": pa.array([t["h"][0].as_py()], type=pa.uint64()),
                "eid": pa.array([t["doc_id"][0].as_py()], type=pa.int64()),
                "n": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    summ = (
        ds.map_batches(block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["h", "eid"])
    )
    n_arr = summ["n"].to_numpy(dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(n_arr)[:-1]])
    omap = dict(zip(summ["eid"].to_numpy(dtype=np.int64).tolist(), offs.tolist()))
    oref = ray.put(omap)

    def add_pos(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                    "shard": pa.array([], type=pa.int64()),
                }
            )
        m = ray.get(oref)
        first = int(t["doc_id"][0].as_py())
        assert first in m, "shuffle_shards block boundaries diverged"
        pos = m[first] + np.arange(t.num_rows, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pos": pa.array(pos),
                "shard": pa.array(pos // shard_size),
            }
        )

    return ds.map_batches(add_pos, batch_format="pyarrow", batch_size=None)


@register(
    "ohlc_hourly",
    """
    WITH b AS (
      SELECT event_id, ts, epoch_us(ts) // 3600000000 AS hb,
             CAST(floor(value*100 + 0.5) AS BIGINT) AS vc
      FROM events),
    r AS (
      SELECT hb, vc,
             row_number() OVER (PARTITION BY hb ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY hb ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b)
    SELECT hb AS hour_bucket,
           CAST(count(*) AS BIGINT) AS n,
           max(CASE WHEN rn_a = 1 THEN vc END)/100.0 AS open,
           max(vc)/100.0 AS high,
           min(vc)/100.0 AS low,
           max(CASE WHEN rn_d = 1 THEN vc END)/100.0 AS close
    FROM r GROUP BY hb
    """,
    doc="Temporal downsampling to hourly OHLC bars (the resample shape "
    "with FIRST/LAST-by-time semantics, not just min/max/sum): open = "
    "value at the bin's earliest (ts, event_id), close = at its "
    "latest.  The interesting bit is the MERGEABLE ARGMIN/ARGMAX "
    "combiner: each batch reduces every bin it touches to one partial "
    "row (earliest key + its value, latest key + its value, lo, hi, "
    "n) — first/last merge associatively by comparing keys, so the "
    "shuffle carries one row per (bin, batch) and a per-bin-bucket "
    "merge finishes.  Exact integer cents; tie-break by event_id "
    "mirrored in both engines.",
)
def ohlc_hourly(sf_dir: str):
    HOUR = 3_600_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        us = t["ts"].cast(pa.int64()).to_numpy()
        eid = t["event_id"].to_numpy()
        vc = cents(t["value"]).to_numpy()
        hb = us // HOUR
        df = pd.DataFrame({"hb": hb, "ts": us, "eid": eid, "vc": vc})
        df = df.sort_values(["hb", "ts", "eid"], kind="stable")
        g = df.groupby("hb", sort=False)
        out = pd.DataFrame(
            {
                "hb": g["hb"].first().to_numpy(dtype=np.int64),
                "ots": g["ts"].first().to_numpy(dtype=np.int64),
                "oeid": g["eid"].first().to_numpy(dtype=np.int64),
                "ovc": g["vc"].first().to_numpy(dtype=np.int64),
                "cts": g["ts"].last().to_numpy(dtype=np.int64),
                "ceid": g["eid"].last().to_numpy(dtype=np.int64),
                "cvc": g["vc"].last().to_numpy(dtype=np.int64),
                "lo": g["vc"].min().to_numpy(dtype=np.int64),
                "hi": g["vc"].max().to_numpy(dtype=np.int64),
                "n": g.size().to_numpy(dtype=np.int64),
            }
        )
        out["__b"] = (out["hb"].to_numpy() % 64).astype("int32")
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {
                    "hour_bucket": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "open": pd.Series([], dtype="float64"),
                    "high": pd.Series([], dtype="float64"),
                    "low": pd.Series([], dtype="float64"),
                    "close": pd.Series([], dtype="float64"),
                }
            )
        # pick each bin's partial with the earliest (ots, oeid) for
        # open and the latest (cts, ceid) for close — associative merge
        g = g.sort_values(["hb", "ots", "oeid"], kind="stable")
        opens = g.groupby("hb", sort=False).first()
        g2 = g.sort_values(["hb", "cts", "ceid"], kind="stable")
        closes = g2.groupby("hb", sort=False).last()
        agg = g.groupby("hb", sort=False).agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum"))
        return pd.DataFrame(
            {
                "hour_bucket": agg.index.to_numpy(dtype=np.int64),
                "n": agg["n"].to_numpy(dtype=np.int64),
                "open": opens["ovc"].to_numpy(dtype=np.int64) / 100.0,
                "high": agg["hi"].to_numpy(dtype=np.int64) / 100.0,
                "low": agg["lo"].to_numpy(dtype=np.int64) / 100.0,
                "close": closes["cvc"].to_numpy(dtype=np.int64) / 100.0,
            }
        )

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "value"])
    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(merge, batch_format="pandas")
    )


# =====================================================================
# Interleaved-payload axis: media decode over binary columns
# =====================================================================


@register(
    "media_decode_stats",
    """
    WITH m AS (
      SELECT CASE
               WHEN doc_id % 6 IN (0, 1, 2) THEN 'image'
               WHEN doc_id % 6 IN (3, 4) THEN 'video'
               ELSE 'audio' END AS kind,
             CASE WHEN doc_id % 6 IN (3, 4) THEN 2 + doc_id % 3
                  ELSE 1 END AS frames
      FROM documents)
    SELECT kind, count(*) AS n_docs, count(*) AS n_ok,
           CAST(sum(frames) AS BIGINT) AS total_frames
    FROM m GROUP BY kind
    """,
    doc="Interleaved-payload axis (input_hint: media spans as opaque "
    "binary + typed metadata): every document derives a deterministic "
    "media payload — extension by doc_id mod 6 over the nine REAL "
    "codecs (PNG / BMP / TIFF / JPEG / GIF / MP4-MJPEG / "
    "intra-H.264-in-MP4 / AVI-MJPEG / WAV, stages/codecs.py + "
    "media.py + h264.py), "
    "dimensions and frame counts pure "
    "doc_id arithmetic — then an actor-pool MediaDecoder stage "
    "(codec state per actor, SMALL batch_size for wide binary rows) "
    "decodes and per-kind partials aggregate.  The oracle mirrors the "
    "same arithmetic in SQL; n_ok == n_docs asserts every payload "
    "actually decoded (a codec regression breaks the value hash).",
)
def media_decode_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def synth_payloads(t: pa.Table) -> pa.Table:
        from .stages.codecs import (
            avi_mjpeg_encode,
            bmp_encode,
            gif_encode,
            jpeg_encode,
            mp4_h264_encode,
            mp4_mjpeg_encode,
            png_encode,
            tiff_encode,
        )
        from .stages.media import encode_wav

        payloads = []
        for did in t["doc_id"].to_pylist():
            rng = np.random.RandomState(did % (1 << 31))
            w = 16 + did % 16
            h = 12 + (did // 16) % 12
            sel = did % 6
            if sel in (3, 4):  # video: frame count is doc_id arithmetic
                n = 2 + did % 3
                vid = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
                if sel == 3 and w % 2 == 0 and h % 2 == 0:
                    # even-dim MP4 docs carry intra-only H.264 (avc1,
                    # stages/h264.py) — same kind/frame arithmetic, so
                    # the SQL mirror is unchanged and a regression in
                    # the seventh codec breaks the value hash too
                    payloads.append(mp4_h264_encode(vid, fps=10))
                    continue
                enc = mp4_mjpeg_encode if sel == 3 else avi_mjpeg_encode
                payloads.append(enc(vid, fps=10, quality=80))
            elif sel == 5:  # audio
                samples = rng.randint(-30000, 30000, size=400 + did % 100).astype(np.int16)
                payloads.append(encode_wav(samples, 16000))
            else:  # image: png / jpeg / gif
                img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
                if sel == 0:
                    # the PNG leg splits on independent hash bits to
                    # cover the EIGHTH and NINTH codecs (BMP, TIFF) —
                    # same kind/frame arithmetic, so the SQL mirror is
                    # unchanged and a BMP/TIFF regression breaks the
                    # value hash too
                    leg = (did // 6) % 3
                    if leg == 1:
                        payloads.append(bmp_encode(img))
                    elif leg == 2:
                        payloads.append(
                            tiff_encode(
                                img,
                                big_endian=(did // 18) % 2 == 1,
                                rows_per_strip=1 + did % 5,
                                packbits=(did // 36) % 2 == 1,
                            )
                        )
                    else:
                        payloads.append(png_encode(img))
                elif sel == 1:
                    payloads.append(jpeg_encode(img, 85))
                else:  # GIF needs ≤256 colors: palette-index the noise
                    pal = rng.randint(0, 256, size=(32, 3)).astype(np.uint8)
                    payloads.append(gif_encode(pal[rng.randint(0, 32, size=(h, w))]))
        return pa.table(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, type=pa.large_binary())}
        )

    import ray

    from .stages.media import MediaDecoder

    # size the decode pool to the session: reserving every CPU for the
    # actor pool starves the surrounding stages in small (4-cpu test)
    # sessions; at 32 cpus this still gives an 8-actor pool
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    decoded = ds.map_batches(synth_payloads, batch_format="pyarrow").map_batches(
        MediaDecoder,
        concurrency=max(2, min(8, ncpu // 4)),
        batch_size=64,
        batch_format="pyarrow",
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "kind": t["decoded_kind"].to_pylist(),
                "ok": t["decode_ok"].to_numpy(zero_copy_only=False).astype(np.int64),
                "frames": t["decoded_frames"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("kind", as_index=False).agg(
            n_p=("ok", "size"), ok_p=("ok", "sum"), fr_p=("frames", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = (
        decoded.map_batches(partial, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(
            Sum("n_p", alias_name="n_docs"),
            Sum("ok_p", alias_name="n_ok"),
            Sum("fr_p", alias_name="total_frames"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": t["kind"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "n_ok": pc.cast(t["n_ok"], pa.int64()),
                "total_frames": pc.cast(t["total_frames"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "video_frame_sample",
    """
    WITH m AS (
      SELECT CASE WHEN (doc_id % 16) % 2 = 0
                   AND ((doc_id // 16) % 12) % 2 = 0
             THEN 'avc1' ELSE 'jpeg' END AS codec,
             1 + doc_id % 5 AS frames
      FROM documents)
    SELECT codec, count(*) AS n_videos, count(*) AS n_ok,
           CAST(sum(frames) AS BIGINT) AS total_frames,
           CAST(sum(LEAST(2, frames)) AS BIGINT) AS sampled_frames
    FROM m GROUP BY codec
    """,
    doc="Selective keyframe sampling — the 100 TB video access "
    "pattern: every document derives a deterministic MP4 (MJPEG or "
    "intra-H.264 by doc_id arithmetic, 1-5 frames), then the "
    "FrameSampler actor pool demuxes the sample table and decodes "
    "ONLY <=2 evenly-spaced samples per clip "
    "(mp4_decode(sample_indices=...) — the skipped majority costs no "
    "codec CPU, unlike MediaFeaturizer's decode-then-sample).  The "
    "oracle mirrors the codec/frame/min(2,n) arithmetic in SQL; "
    "n_ok == n_videos makes a selective-decode regression a value-"
    "hash mismatch.  w = 16 + doc_id%16 is even iff doc_id%16 is "
    "even (and likewise h), so the codec CASE is pure arithmetic.",
)
def video_frame_sample(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def synth_payloads(t: pa.Table) -> pa.Table:
        from .stages.codecs import mp4_h264_encode, mp4_mjpeg_encode

        payloads = []
        for did in t["doc_id"].to_pylist():
            rng = np.random.RandomState(did % (1 << 31))
            w = 16 + did % 16
            h = 12 + (did // 16) % 12
            n = 1 + did % 5
            vid = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
            if w % 2 == 0 and h % 2 == 0:
                payloads.append(mp4_h264_encode(vid, fps=10))
            else:
                payloads.append(mp4_mjpeg_encode(vid, fps=10, quality=80))
        return pa.table(
            {"doc_id": t["doc_id"], "payload": pa.array(payloads, type=pa.large_binary())}
        )

    import ray

    from .stages.media import FrameSampler

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    sampled = ds.map_batches(synth_payloads, batch_format="pyarrow").map_batches(
        FrameSampler,
        fn_constructor_kwargs={"max_frames": 2},
        concurrency=max(2, min(8, ncpu // 4)),
        batch_size=64,
        batch_format="pyarrow",
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "codec": t["codec"].to_pylist(),
                "ok": t["decode_ok"].to_numpy(zero_copy_only=False).astype(np.int64),
                "total": t["n_samples"].to_numpy(zero_copy_only=False).astype(np.int64),
                "sampled": t["n_sampled"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("codec", as_index=False).agg(
            n_p=("ok", "size"), ok_p=("ok", "sum"),
            tf_p=("total", "sum"), sf_p=("sampled", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = (
        sampled.map_batches(partial, batch_format="pyarrow")
        .groupby("codec")
        .aggregate(
            Sum("n_p", alias_name="n_videos"),
            Sum("ok_p", alias_name="n_ok"),
            Sum("tf_p", alias_name="total_frames"),
            Sum("sf_p", alias_name="sampled_frames"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "codec": t["codec"],
                "n_videos": pc.cast(t["n_videos"], pa.int64()),
                "n_ok": pc.cast(t["n_ok"], pa.int64()),
                "total_frames": pc.cast(t["total_frames"], pa.int64()),
                "sampled_frames": pc.cast(t["sampled_frames"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "date_records_detect",
    """
    WITH m AS (
      SELECT lang,
             CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS found,
             CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 8 + doc_id % 13 END
               AS n_records
      FROM documents)
    SELECT lang, count(*) AS n_pages,
           CAST(sum(found) AS BIGINT) AS n_detected,
           CAST(sum(n_records) AS BIGINT) AS total_records
    FROM m GROUP BY lang
    """,
    doc="Date-indexed record discovery as a pipeline stage (the "
    "reference's results.html experiment, calibrated 20/20 on its "
    "labeled corpus — records.py + test_reference_pages.py): every "
    "document derives a deterministic listing page — 8 + doc_id%13 "
    "records; pages with doc_id%5==0 carry NO date stamps (below the "
    "0.7 threshold → undetected), all others date every record — then "
    "detect_records_batch runs the detector per page and per-lang "
    "partials aggregate (pages counted, listings detected, records "
    "recovered).  The oracle mirrors the doc_id arithmetic; a detector "
    "regression (missed page, wrong record count, false positive on "
    "the undated pages) breaks the value hash.",
)
def date_records_detect(sf_dir: str):
    from .records import detect_records_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def synth_pages(t: pa.Table) -> pa.Table:
        pages = []
        for did in t["doc_id"].to_pylist():
            n = 8 + did % 13
            dated = did % 5 != 0
            rows = []
            for i in range(n):
                stamp = (
                    f" <span class='when'>Dec {1 + (did + i) % 28}, 2013</span>"
                    if dated
                    else ""
                )
                rows.append(
                    f"<li class='post'><span class='title'>thread "
                    f"entry {i} alpha</span>{stamp}</li>"
                )
            pages.append(
                "<html><body><div class='wrap'><ul class='listing'>"
                + "".join(rows)
                + "</ul></div></body></html>"
            )
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"],
             "html": pa.array(pages, type=pa.string())}
        )

    detected = ds.map_batches(synth_pages, batch_format="pyarrow").map_batches(
        detect_records_batch, batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "found": t["records_found"].to_numpy(zero_copy_only=False).astype(np.int64),
                "nr": t["n_records"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("lang", as_index=False).agg(
            p_p=("found", "size"), d_p=("found", "sum"), r_p=("nr", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = (
        detected.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("p_p", alias_name="n_pages"),
            Sum("d_p", alias_name="n_detected"),
            Sum("r_p", alias_name="total_records"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "n_pages": pc.cast(t["n_pages"], pa.int64()),
                "n_detected": pc.cast(t["n_detected"], pa.int64()),
                "total_records": pc.cast(t["total_records"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# =====================================================================
# Round-5 additions: incremental snapshot diff, co-occurrence mining,
# leakage-safe split assignment
# =====================================================================


@register(
    "snapshot_diff",
    """
    WITH oldv AS (
      SELECT doc_id, md5_number_lower(text) % 4611686018427387904 AS fp
      FROM documents WHERE doc_id % 10 < 8),
    newv AS (
      SELECT doc_id,
             md5_number_lower(CASE WHEN doc_id % 7 = 0 THEN 'v2 ' || text
                                   ELSE text END) % 4611686018427387904 AS fp
      FROM documents WHERE doc_id % 10 >= 2)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id
    """,
    doc="Incremental recrawl snapshot diff (the re-crawl companion to "
    "pipelines/ingest.py): two corpus snapshots (old = doc_id%10<8, "
    "new = doc_id%10>=2 with a simulated edit on doc_id%7==0) are read "
    "as SEPARATE datasets, each row reduced to a (doc_id, side, "
    "fingerprint) triple batch-side — md5_number_lower-compatible "
    "(functions/shingles.py md5_hash64), masked to 2^62 so int64 sums "
    "never overflow — then one hash-partitioned union-aggregate on "
    "doc_id classifies every doc added/removed/changed/unchanged.  "
    "Document text NEVER crosses the shuffle; at 100 TB the exchange "
    "is 24 bytes/doc regardless of page size, and either side may be "
    "a different storage generation (the real recrawl case).",
)
def snapshot_diff(sf_dir: str):
    from .functions.shingles import md5_hash64
    from .stages.relational import bucketed_agg

    MASK = 1 << 62

    def _fps(texts: list[str]) -> np.ndarray:
        return np.fromiter(
            (md5_hash64(s) % MASK for s in texts), dtype=np.int64, count=len(texts)
        )

    def old_side(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        keep = (did % 10) < 8
        texts = [s for s, k in zip(t["text"].to_pylist(), keep) if k]
        fp = _fps(texts)
        n = int(keep.sum())
        return pa.table(
            {
                "doc_id": pa.array(did[keep]),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "fp_old": pa.array(fp),
                "fp_new": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def new_side(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        keep = (did % 10) >= 2
        texts = [
            ("v2 " + s) if d % 7 == 0 else s
            for s, d, k in zip(t["text"].to_pylist(), did, keep)
            if k
        ]
        fp = _fps(texts)
        n = int(keep.sum())
        return pa.table(
            {
                "doc_id": pa.array(did[keep]),
                "side": pa.array(np.full(n, 2, dtype=np.int64)),
                "fp_old": pa.array(np.zeros(n, dtype=np.int64)),
                "fp_new": pa.array(fp),
            }
        )

    ds_old = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        old_side, batch_format="pyarrow"
    )
    ds_new = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        new_side, batch_format="pyarrow"
    )
    # each doc appears once per side, so per-key sums ARE the values
    agg = bucketed_agg(
        ds_old.union(ds_new),
        keys=["doc_id"],
        sum_cols={"side": "side_sum", "fp_old": "fp_old", "fp_new": "fp_new"},
    )

    def classify(t: pa.Table) -> pa.Table:
        side = t["side_sum"].to_numpy()
        fo = t["fp_old"].to_numpy()
        fn_ = t["fp_new"].to_numpy()
        status = np.where(
            side == 2,
            "added",
            np.where(side == 1, "removed", np.where(fo == fn_, "unchanged", "changed")),
        )
        return pa.table(
            {"doc_id": t["doc_id"], "status": pa.array(status.astype(object), type=pa.string())}
        )

    return agg.map_batches(classify, batch_format="pyarrow")


@register(
    "term_cooccurrence",
    """
    WITH d AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    f AS (
      SELECT doc_id, term FROM d WHERE length(term) >= 4
      QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY term) <= 12),
    p AS (
      SELECT a.term AS t1, b.term AS t2
      FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.term < b.term)
    SELECT t1, t2, count(*) AS n FROM p GROUP BY t1, t2
    ORDER BY n DESC, t1, t2 LIMIT 100
    """,
    doc="Term co-occurrence mining (the counting core of PMI/word-"
    "association features): per doc the 12 lexicographically-first "
    "distinct terms of length>=4 form unordered pairs (a<b), counted "
    "corpus-wide.  The pair space is bounded batch-side by a Counter "
    "COMBINER (<=66 pairs/doc, merged within the batch before "
    "anything shuffles), global sums via the bucketed high-cardinality "
    "path, and a local top-k prune caps the all-to-all sort at 100 "
    "rows per block.  The per-doc cap is the documented skew guard: "
    "pair count grows O(k^2), so k is fixed, not corpus-dependent.",
)
def term_cooccurrence(sf_dir: str):
    from collections import Counter

    from .stages.relational import bucketed_agg

    def pairs(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            terms = sorted({w for w in txt.split(" ") if len(w) >= 4})[:12]
            for i in range(len(terms)):
                for j in range(i + 1, len(terms)):
                    c[(terms[i], terms[j])] += 1
        if not c:
            return pa.table(
                {
                    "t1": pa.array([], type=pa.string()),
                    "t2": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        t1, t2 = zip(*c.keys())
        return pa.table(
            {
                "t1": pa.array(list(t1), type=pa.string()),
                "t2": pa.array(list(t2), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["text"])
    agg = bucketed_agg(
        ds.map_batches(pairs, batch_format="pyarrow"),
        keys=["t1", "t2"],
        sum_cols={"n": "n"},
        key_dtypes={"t1": "object", "t2": "object"},
    )

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n", "t1", "t2"], ascending=[False, True, True]
        ).head(100)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        agg.map_batches(prune, batch_format="pyarrow")
        .sort(["n", "t1", "t2"], descending=[True, False, False])
        .limit(100)
    )


@register(
    "leakage_safe_split",
    """
    WITH s AS (
      SELECT lang, n_chars,
             CASE WHEN md5_number_lower(source) % 10 < 8 THEN 'train'
                  WHEN md5_number_lower(source) % 10 = 8 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split, lang
    """,
    doc="Leakage-safe train/valid/test assignment: the split key is the "
    "doc's SOURCE (the registrable-domain analog), hashed with the "
    "md5_number_lower-compatible md5_hash64, so exact and near "
    "duplicates — which overwhelmingly share a source — land on the "
    "same side of the split by construction (no eval contamination). "
    "Deterministic across runs and cluster sizes; per-batch the "
    "unique-source dictionary is hashed once, then a (split, lang) "
    "partial-sum combiner keeps the shuffle at O(splits x langs x "
    "batches).  Reports per-cell doc and char counts for mixture "
    "audit.",
)
def leakage_safe_split(sf_dir: str):
    from ray.data.aggregate import Sum

    from .functions.shingles import md5_hash64
    from .stages.relational import make_partial_agg

    def assign(t: pa.Table) -> pa.Table:
        src = t["source"].to_pylist()
        buckets = {s: md5_hash64(s) % 10 for s in set(src)}
        b = np.fromiter((buckets[s] for s in src), dtype=np.int64, count=len(src))
        split = np.where(b < 8, "train", np.where(b == 8, "valid", "test"))
        out = pa.table(
            {
                "split": pa.array(split.astype(object), type=pa.string()),
                "lang": t["lang"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )
        return make_partial_agg(["split", "lang"], ["n_chars"])(out)

    agg = (
        _read(sf_dir, "documents", columns=["source", "lang", "n_chars"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby(["split", "lang"])
        .aggregate(
            Sum("partial_n", alias_name="n_docs"),
            Sum("n_chars_sum", alias_name="total_chars"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "split": t["split"],
                "lang": t["lang"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "total_chars": pc.cast(t["total_chars"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "cross_corpus_neardup",
    """
    WITH ev AS (
      SELECT doc_id, regexp_replace(text, '^[^ ]+', 'evalword') AS text
      FROM documents WHERE doc_id % 3 = 0),
    tt AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    te AS (SELECT doc_id, string_split(text, ' ') AS t FROM ev),
    gt AS (
      SELECT DISTINCT doc_id, t[j]||' '||t[j+1]||' '||t[j+2]||' '||t[j+3] AS g
      FROM tt, unnest(generate_series(1, len(t)-3)) AS s(j)),
    ge AS (
      SELECT DISTINCT doc_id, t[j]||' '||t[j+1]||' '||t[j+2]||' '||t[j+3] AS g
      FROM te, unnest(generate_series(1, len(t)-3)) AS s(j)),
    szt AS (SELECT doc_id, count(*) AS sz FROM gt GROUP BY doc_id),
    sze AS (SELECT doc_id, count(*) AS sz FROM ge GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS train_id, b.doc_id AS eval_id, count(*) AS i
      FROM gt a JOIN ge b ON a.g = b.g GROUP BY 1, 2)
    SELECT train_id AS doc_id, count(*) AS n_eval_matches
    FROM inter
    JOIN szt ON train_id = szt.doc_id
    JOIN sze ON eval_id = sze.doc_id
    WHERE i/(1.0*(szt.sz + sze.sz - i)) >= 0.9
    GROUP BY train_id
    """,
    doc="Cross-corpus near-dup contamination sweep (the fuzzy "
    "complement of n-gram decontaminate): eval set = every third doc "
    "with its first token rewritten (a guaranteed J>=0.9 twin of its "
    "train original), train = the full corpus; report each train doc "
    "near-duplicate (4-gram Jaccard >= 0.9) to at least one eval doc "
    "with its eval-match count.  Pipeline: eval ids offset into a "
    "disjoint range, ONE union grams pass (stages/dedup.py "
    "doc_grams_table), banded-LSH candidate generation, distributed "
    "exact-Jaccard verify, then a cross-side filter + per-train-doc "
    "count — same-side (train-train / eval-eval) near-dups are "
    "dropped before anything aggregates.  ORACLE-CHECKED via the "
    "exhaustive cross-side similarity join (LSH miss probability at "
    "J>=0.9 is ~1e-25, the minhash_lsh_neardup recall argument).",
)
def cross_corpus_neardup(sf_dir: str):
    import re as _re

    from ray.data.aggregate import Count

    from crawler_ray.stages.dedup import (
        doc_grams_table,
        lsh_neardup_pairs,
        verify_pairs_joined,
    )

    _EVAL_BASE = 10_000_000

    def eval_side(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        keep = (did % 3) == 0
        txts = [
            _re.sub(r"^[^ ]+", "evalword", x, count=1)
            for x, k in zip(t["text"].to_pylist(), keep)
            if k
        ]
        return pa.table(
            {
                "doc_id": pa.array(did[keep] + _EVAL_BASE),
                "text": pa.array(txts, type=pa.string()),
            }
        )

    train = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ev = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        eval_side, batch_format="pyarrow"
    )
    grams = doc_grams_table(train.union(ev), with_minhash_input=True).materialize()
    pairs = lsh_neardup_pairs(None, threshold=0.9, grams_ds=grams)
    verified = verify_pairs_joined(
        pairs, grams.select_columns(["doc_id", "gb", "sz"]), threshold=0.9
    )

    def cross_side(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy()
        b = t["doc_b"].to_numpy()
        cross = (a < _EVAL_BASE) != (b < _EVAL_BASE)
        train_id = np.where(a < _EVAL_BASE, a, b)[cross]
        return pa.table({"doc_id": pa.array(train_id)})

    agg = (
        verified.map_batches(cross_side, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_eval_matches"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_eval_matches": pc.cast(t["n_eval_matches"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "bpe_train_merges",
    None,  # iterative re-segmentation after each merge is not SQL-expressible;
           # the driver records the rows-only check, and the merge SEQUENCE is
           # bit-equal to an exact sequential reference in tests/test_bpe.py
    doc="Distributed BPE tokenizer TRAINING (Sennrich et al. 2016; "
    "bpe_token_stats only applies a segmentation — this learns the "
    "merge table).  The corpus collapses to a (word, freq) table in "
    "one shuffle; each of the 25 merge rounds is a pair-count "
    "combiner -> bucketed sum -> top-1 prune -> one-row driver read "
    "-> broadcast merge apply, so driver state is O(n_merges) and no "
    "round touches document text.  Deterministic: max count, then "
    "lexicographically smallest pair.",
)
def bpe_train_merges(sf_dir: str):
    from crawler_ray.pipelines.bpe import train_bpe

    merges, _ = train_bpe(
        _read(sf_dir, "documents", columns=["text"]), n_merges=25
    )
    return pa.table(
        {
            "rank": pa.array(range(len(merges)), type=pa.int64()),
            "left": pa.array([m[0] for m in merges], type=pa.string()),
            "right": pa.array([m[1] for m in merges], type=pa.string()),
            "count": pa.array([m[2] for m in merges], type=pa.int64()),
        }
    )


@register(
    "token_rarity_buckets",
    """
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    rk AS (SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS r FROM cnt),
    doc AS (
      SELECT t.doc_id,
             any_value(t.lang) AS lang,
             count(*) AS n_tokens,
             sum(CASE WHEN rk.r <= 16 THEN rk.r ELSE 17 END) AS sum_rank
      FROM toks t JOIN rk ON t.tok = rk.tok
      GROUP BY t.doc_id
    )
    SELECT lang,
           CAST(LEAST((sum_rank * 8) // (n_tokens * 17), 7) AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM doc GROUP BY lang, bucket
    """,
    doc="Token-rarity quality scoring (CCNet-style perplexity filtering "
    "in integer-exact form: a doc's score is the mean Zipf RANK of its "
    "tokens instead of a float log-prob, so the oracle hash is exact). "
    "Shape: one token-count shuffle -> per-block top-V prune -> "
    "bounded top-V (V=1024) rank table broadcast to a scoring "
    "map_batches (factorize + np.add.reduceat, no per-token Python "
    "loop); unseen/rare tokens rank V+1; bucket = integer-floor of "
    "8*mean_rank/(V+1).  At 100 TB the broadcast stays V-bounded no "
    "matter the corpus vocabulary.  V=16 here so the synthetic "
    "31-token vocab exercises BOTH the ranked and the capped path; "
    "real corpora use V~10^5-10^6.",
)
def token_rarity_buckets(sf_dir: str, v_cap: int = 16):
    import heapq
    from collections import Counter

    from crawler_ray.stages.relational import bucketed_agg

    docs = _read(sf_dir, "documents", columns=["text", "lang"])

    def tok_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            c.update(txt.split())
        return pa.table(
            {
                "tok": pa.array(list(c.keys()), type=pa.string()),
                "c": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    cnt = bucketed_agg(
        docs.map_batches(tok_partial, batch_format="pyarrow"),
        keys=["tok"],
        sum_cols={"c": "c"},
        key_dtypes={"tok": "object"},
    )

    def local_topv(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tok" not in t.column_names:
            return pa.table(
                {"tok": pa.array([], type=pa.string()), "c": pa.array([], type=pa.int64())}
            )
        best = heapq.nsmallest(
            v_cap,
            zip(t["c"].to_pylist(), t["tok"].to_pylist()),
            key=lambda kv: (-kv[0], kv[1]),
        )
        return pa.table(
            {
                "tok": pa.array([tk for _, tk in best], type=pa.string()),
                "c": pa.array([c for c, _ in best], type=pa.int64()),
            }
        )

    # ≤ v_cap rows per block reach the driver; exact global top-V there
    cand = [
        (r["c"], r["tok"])
        for r in cnt.map_batches(local_topv, batch_format="pyarrow").take_all()
    ]
    top = heapq.nsmallest(v_cap, cand, key=lambda kv: (-kv[0], kv[1]))
    rank = {tok: i + 1 for i, (_, tok) in enumerate(top)}
    unk = v_cap + 1

    def score(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        toks = [txt.split() for txt in texts]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array(
            [w for doc in toks for w in doc], dtype=object
        )
        codes, uniq = pd.factorize(flat)
        uniq_rank = np.array([rank.get(u, unk) for u in uniq], dtype=np.int64)
        per_tok = uniq_rank[codes] if len(flat) else np.array([], dtype=np.int64)
        # sentinel 0 keeps reduceat offsets in bounds when a zero-token
        # doc lands at the end of the batch; its garbage sum is masked
        per_tok = np.append(per_tok, np.int64(0))
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sums = np.where(lens > 0, np.add.reduceat(per_tok, offsets)[: len(lens)], 0)
        bucket = np.minimum((sums * 8) // (np.maximum(lens, 1) * unk), 7)
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "bucket": bucket,
                "n_docs": np.ones(len(lens), dtype=np.int64),
                "total_tokens": lens,
            }
        )
        out = df.groupby(["lang", "bucket"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(score, batch_format="pyarrow")
        .groupby(["lang", "bucket"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("total_tokens", alias_name="total_tokens"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "bucket": pc.cast(t["bucket"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "total_tokens": pc.cast(t["total_tokens"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "host_quality_filter",
    """
    WITH doc AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the','a','of','to','and'))) AS n_stop
      FROM documents
    ),
    host AS (
      SELECT source, sum(n_stop) * 1000 >= sum(n_tokens) * 65 AS ok
      FROM doc GROUP BY source
    )
    SELECT d.lang,
           CAST(sum(CASE WHEN h.ok THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(sum(CASE WHEN h.ok THEN d.n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
           CAST(sum(CASE WHEN h.ok THEN 0 ELSE 1 END) AS BIGINT) AS dropped_docs
    FROM doc d JOIN host h USING (source)
    GROUP BY d.lang
    """,
    doc="Host-level quality filtering (RefinedWeb/DCLM-style: drop "
    "ENTIRE sources whose aggregate stopword ratio < 0.065 — spam "
    "hosts poison every page they serve, so the filter unit is the "
    "host, not the document).  Shape: one doc-metric pass with "
    "per-source partial sums -> bucketed per-source rollup (host "
    "cardinality ~10^7 at 100 TB, far below docs) -> the (source, ok) "
    "verdict table broadcast back into a second streaming pass that "
    "tallies survivors per lang.  Integer-exact: the ratio test is "
    "sum_stop*1000 >= sum_tokens*65, never a float.",
)
def host_quality_filter(sf_dir: str):
    from crawler_ray.functions import textstats
    from crawler_ray.stages.relational import bucketed_agg

    docs = _read(sf_dir, "documents", columns=["text", "lang", "source"])
    stopset = pa.array(list(textstats.STOPWORDS))

    def doc_metrics(t: pa.Table):
        txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        toks = pc.cast(pc.add(pc.count_substring(txt, " "), 1), pa.int64()).to_numpy()
        tok_list = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(tok_list)
        isstop = pc.is_in(flat, value_set=stopset).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(tok_list).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(len(lens)), lens)
        stop = np.bincount(rows, weights=isstop, minlength=len(lens)).astype(np.int64)
        return toks, stop

    def host_partial(t: pa.Table) -> pa.Table:
        toks, stop = doc_metrics(t)
        df = pd.DataFrame(
            {"source": t["source"].to_pylist(), "n_tokens": toks, "n_stop": stop}
        )
        out = df.groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    host = bucketed_agg(
        docs.map_batches(host_partial, batch_format="pyarrow"),
        keys=["source"],
        sum_cols={"n_tokens": "n_tokens", "n_stop": "n_stop"},
        key_dtypes={"source": "object"},
    )
    # verdict table: one row per host — tiny relative to docs; broadcast
    # (past a host-count cap the same shape runs as a semi-join, cf.
    # decontaminate / the tfidf vocab join)
    ok_set = {
        r["source"]
        for r in host.take_all()
        if r["n_stop"] * 1000 >= r["n_tokens"] * 65
    }

    def tally(t: pa.Table) -> pa.Table:
        toks, _ = doc_metrics(t)
        srcs = t["source"].to_pylist()
        ok = np.fromiter((s in ok_set for s in srcs), dtype=bool, count=len(srcs))
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "kept_docs": ok.astype(np.int64),
                "kept_tokens": np.where(ok, toks, 0),
                "dropped_docs": (~ok).astype(np.int64),
            }
        )
        out = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(tally, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("kept_docs", alias_name="kept_docs"),
            Sum("kept_tokens", alias_name="kept_tokens"),
            Sum("dropped_docs", alias_name="dropped_docs"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "kept_docs": pc.cast(t["kept_docs"], pa.int64()),
                "kept_tokens": pc.cast(t["kept_tokens"], pa.int64()),
                "dropped_docs": pc.cast(t["dropped_docs"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@lru_cache(maxsize=1 << 17)
def _dsir_bucket(tok: str, n_buckets: int = 64) -> int:
    from .functions.shingles import md5_hash64

    return md5_hash64(tok) % n_buckets


@register(
    "dsir_resample",
    """
    WITH tk AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    toks AS (SELECT doc_id, lang, md5_number_lower(tok) % 64 AS f FROM tk),
    feat AS (
      SELECT f, count(*) AS c_src,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
      FROM toks GROUP BY f
    ),
    tot AS (SELECT sum(c_src) AS s_tot, sum(c_tgt) AS t_tot FROM feat),
    sc AS (
      SELECT f,
             CAST(LEAST((CAST(c_tgt AS HUGEINT) * s_tot * 1024)
                        // (CAST(c_src AS HUGEINT) * t_tot), 8192) AS BIGINT) AS s
      FROM feat, tot
    ),
    doc AS (
      SELECT t.doc_id, any_value(t.lang) AS lang,
             count(*) AS n_tokens, sum(sc.s) AS score
      FROM toks t JOIN sc USING (f) GROUP BY t.doc_id
    )
    SELECT lang,
           CAST(CASE WHEN score >= n_tokens * 1024 THEN 1 ELSE 0 END AS BIGINT) AS kept,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM doc GROUP BY lang, kept
    """,
    doc="DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169): "
    "importance-resample raw docs toward a TARGET distribution (here "
    "lang='en') under a hashed bag-of-ngrams model.  Integer-exact "
    "quantization so the oracle hash is stable: each hashed feature "
    "f gets score s(f) = min(Q * p_target(f)/p_source(f), cap) "
    "computed as exact integer cross-multiplication (Q=1024, cap=8192 = "
    "an 8x max ratio), and a doc is kept iff its token-mean feature "
    "score >= Q, i.e. its target likelihood under the hashed model "
    "is at least the corpus average — the deterministic analog of "
    "sampling proportional to the likelihood ratio.  Shape: ONE "
    "streaming pass emits B-bounded (f, c_src, c_tgt) partials "
    "(B=64 hash buckets here, ~10^4 real; np.bincount per batch, "
    "never a per-token shuffle) -> groupby over <=B keys -> the "
    "B-row score table is computed driver-side in Python ints (no "
    "int64 overflow at any corpus size) and broadcast -> a second "
    "streaming pass scores docs via factorize + reduceat and "
    "emits (lang, kept) partial sums.  Token->bucket hashing is "
    "md5_number_lower-compatible (shingles.md5_hash64) so DuckDB "
    "derives identical features.  At 100 TB both shuffles are "
    "O(B x blocks) and O(langs x 2 x blocks); the doc text never "
    "moves.",
)
def dsir_resample(sf_dir: str, n_buckets: int = 64, q: int = 1024, cap: int = 8192):
    from ray.data.aggregate import Sum

    bucket_of = partial(_dsir_bucket, n_buckets=n_buckets)
    docs = _read(sf_dir, "documents", columns=["text", "lang"])

    def feat_partial(t: pa.Table) -> pa.Table:
        toks = [txt.split(" ") for txt in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array([w for doc in toks for w in doc], dtype=object)
        codes, uniq = pd.factorize(flat)
        f_of_uniq = np.array([bucket_of(u) for u in uniq], dtype=np.int64)
        f = f_of_uniq[codes] if len(flat) else np.array([], dtype=np.int64)
        is_tgt = np.repeat(
            np.array([l == "en" for l in t["lang"].to_pylist()], dtype=bool), lens
        )
        c_src = np.bincount(f, minlength=n_buckets).astype(np.int64)
        c_tgt = np.bincount(f[is_tgt], minlength=n_buckets).astype(np.int64)
        keep = c_src > 0
        return pa.table(
            {
                "f": pa.array(np.arange(n_buckets)[keep], type=pa.int64()),
                "c_src": pa.array(c_src[keep], type=pa.int64()),
                "c_tgt": pa.array(c_tgt[keep], type=pa.int64()),
            }
        )

    feat = (
        docs.map_batches(feat_partial, batch_format="pyarrow")
        .groupby("f")
        .aggregate(Sum("c_src", alias_name="c_src"), Sum("c_tgt", alias_name="c_tgt"))
        .take_all()
    )  # <= n_buckets rows ever reach the driver, at any corpus size
    s_tot = sum(r["c_src"] for r in feat)
    t_tot = sum(r["c_tgt"] for r in feat)
    # exact Python-int arithmetic: c_tgt*s_tot*q overflows int64 at
    # ~10^13 tokens, so the B-bounded table stays in bigints here
    s_arr = np.zeros(n_buckets, dtype=np.int64)
    for r in feat:
        s_arr[r["f"]] = min((r["c_tgt"] * s_tot * q) // (r["c_src"] * t_tot), cap)

    def score(t: pa.Table) -> pa.Table:
        toks = [txt.split(" ") for txt in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array([w for doc in toks for w in doc], dtype=object)
        codes, uniq = pd.factorize(flat)
        s_of_uniq = np.array([s_arr[bucket_of(u)] for u in uniq], dtype=np.int64)
        per_tok = s_of_uniq[codes] if len(flat) else np.array([], dtype=np.int64)
        per_tok = np.append(per_tok, np.int64(0))
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sums = np.where(lens > 0, np.add.reduceat(per_tok, offsets)[: len(lens)], 0)
        kept = (sums >= lens * q).astype(np.int64)
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "kept": kept,
                "n_docs": np.ones(len(lens), dtype=np.int64),
                "total_tokens": lens,
            }
        )
        out = df.groupby(["lang", "kept"], as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        docs.map_batches(score, batch_format="pyarrow")
        .groupby(["lang", "kept"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "kept": pc.cast(t["kept"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "total_tokens": pc.cast(t["total_tokens"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "bm25_topk",
    """
    WITH q(qid, qtext) AS (
      VALUES (0, 'data batch'), (1, 'sort merge join'), (2, 'filter group key')
    ),
    qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS tok FROM q),
    qtok AS (SELECT DISTINCT tok FROM qt),
    d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    stats AS (SELECT count(*) AS n FROM documents),
    df AS (
      SELECT qtok.tok, count(*) AS df
      FROM qtok JOIN d ON list_contains(d.tk, qtok.tok)
      GROUP BY qtok.tok
    ),
    idf AS (
      SELECT tok, LEAST((n - df) * 256 // df, 4096) AS idf FROM df, stats
    ),
    tf AS (
      SELECT d.doc_id, qt.qid, qt.tok,
             len(list_filter(d.tk, x -> x = qt.tok)) AS tf,
             len(d.tk) AS dl
      FROM d, qt
    ),
    sc AS (
      SELECT doc_id, qid,
             sum(idf.idf * tf.tf) * 1024 // (any_value(dl) + 50) AS score
      FROM tf JOIN idf USING (tok)
      GROUP BY doc_id, qid
    ),
    top AS (
      SELECT qid, doc_id, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id) AS rn
      FROM sc WHERE score > 0
    )
    SELECT CAST(qid AS BIGINT) AS qid, doc_id, CAST(score AS BIGINT) AS score
    FROM top WHERE rn <= 5
    """,
    doc="BM25-style sparse retrieval, integer-quantized so the oracle "
    "hash is exact: idf(t) = min(256*(N-df)/df, 4096) by integer "
    "cross-multiplication, doc score = sum(idf*tf) * 1024 // (dl+50) "
    "(the +50 pivot is the saturation/length-normalization analog of "
    "BM25's k1/b terms in pure-integer form).  The retrieval core of "
    "search-based curation and decontamination lookups.  Shape: the "
    "query set is tiny and BROADCAST; pass 1 streams the corpus once "
    "emitting per-block (term, df) partials for ONLY the query terms "
    "(bounded by total query length, never the vocab) -> driver sums; "
    "pass 2 re-streams scoring every doc against all queries "
    "vectorized (factorize + isin + bincount, no per-token loop) and "
    "prunes to a per-block top-k, so <= k x queries x blocks rows "
    "reach the driver for the exact global top-k.  At 100 TB both "
    "passes are embarrassingly parallel with O(1) driver state; ties "
    "break (score desc, doc_id asc) deterministically.",
)
def bm25_topk(sf_dir: str, k: int = 5):
    import heapq

    from ray.data.aggregate import Sum

    queries = [(0, "data batch"), (1, "sort merge join"), (2, "filter group key")]
    terms = sorted({t for _, qs in queries for t in qs.split(" ")})
    t_idx = {t: i for i, t in enumerate(terms)}
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        toks = [txt.split(" ") for txt in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array([w for doc in toks for w in doc], dtype=object)
        codes, uniq = pd.factorize(flat)
        rows = np.repeat(np.arange(len(toks)), lens)
        cnt = np.zeros(len(terms), dtype=np.int64)
        for ti, term in enumerate(terms):
            hit = np.where(uniq == term)[0]
            if len(hit):
                cnt[ti] = len(np.unique(rows[codes == hit[0]]))
        return pa.table(
            {
                "ti": pa.array(np.arange(len(terms)), type=pa.int64()),
                "df": pa.array(cnt, type=pa.int64()),
                "n_docs": pa.array(
                    np.full(len(terms), len(toks), dtype=np.int64), type=pa.int64()
                ),
            }
        )

    dfs = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("ti")
        .aggregate(Sum("df", alias_name="df"), Sum("n_docs", alias_name="n_docs"))
        .take_all()
    )  # <= |query terms| rows, at any corpus size
    n_corpus = dfs[0]["n_docs"] if dfs else 0
    idf = np.zeros(len(terms), dtype=np.int64)
    for r in dfs:
        if r["df"] > 0:
            idf[r["ti"]] = min((n_corpus - r["df"]) * 256 // r["df"], 4096)

    # per-query term-index lists, broadcast via closure
    q_terms = [
        (qid, np.array([t_idx[t] for t in qs.split(" ")], dtype=np.int64))
        for qid, qs in queries
    ]

    def score_topk(t: pa.Table) -> pa.Table:
        toks = [txt.split(" ") for txt in t["text"].to_pylist()]
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array([w for doc in toks for w in doc], dtype=object)
        codes, uniq = pd.factorize(flat)
        rows = np.repeat(np.arange(len(toks)), lens)
        # tf[ti, doc] for query terms only
        tf = np.zeros((len(terms), len(toks)), dtype=np.int64)
        for ti, term in enumerate(terms):
            hit = np.where(uniq == term)[0]
            if len(hit):
                sel = codes == hit[0]
                tf[ti] = np.bincount(rows[sel], minlength=len(toks))
        out_q, out_d, out_s = [], [], []
        for qid, tis in q_terms:
            num = (idf[tis, None] * tf[tis]).sum(axis=0)
            score = num * 1024 // (lens + 50)
            pos = np.where(score > 0)[0]
            best = heapq.nsmallest(
                k, zip(score[pos], ids[pos]), key=lambda sv: (-sv[0], sv[1])
            )
            out_q.extend(qid for _ in best)
            out_d.extend(int(d) for _, d in best)
            out_s.extend(int(s) for s, _ in best)
        return pa.table(
            {
                "qid": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "score": pa.array(out_s, type=pa.int64()),
            }
        )

    cand = docs.map_batches(score_topk, batch_format="pyarrow").take_all()
    out_q, out_d, out_s = [], [], []
    for qid, _ in q_terms:
        rows_q = [(r["score"], r["doc_id"]) for r in cand if r["qid"] == qid]
        for s, d in heapq.nsmallest(k, rows_q, key=lambda sv: (-sv[0], sv[1])):
            out_q.append(qid)
            out_d.append(d)
            out_s.append(s)
    return pa.table(
        {
            "qid": pa.array(out_q, type=pa.int64()),
            "doc_id": pa.array(out_d, type=pa.int64()),
            "score": pa.array(out_s, type=pa.int64()),
        }
    )


@register(
    "temperature_resample",
    """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS mn FROM c),
    h AS (
      SELECT doc_id, lang,
             md5_number_lower(CAST(doc_id AS VARCHAR)) % 100000 AS hv
      FROM documents
    )
    SELECT h.doc_id, h.lang
    FROM h JOIN c USING (lang), m
    WHERE CAST(h.hv AS HUGEINT) * h.hv * c.n
          < CAST(m.mn AS HUGEINT) * 100000 * 100000
    """,
    doc="Temperature-scaled mixture sampling (the multilingual "
    "alpha-sampling staple, alpha=1/2: language keep-rate proportional "
    "to count^(alpha-1), so low-resource languages are up-weighted "
    "RELATIVE to uniform-rebalancing but high-resource ones are not "
    "flattened away).  Integer-exact with NO sqrt anywhere: keep iff "
    "h^2 * n_lang < min_n * M^2 for h = md5(doc_id) % M — "
    "P(keep) = sqrt(min_n/n_lang) quantized to hash granularity, and "
    "the inequality is exact integer arithmetic on both sides "
    "(general rational alpha=p/q runs as h^q * n^(q-p) < mn^(q-p) * "
    "M^q).  Shape: per-language histogram via the combiner pattern "
    "-> driver derives per-lang thresholds T = (mn*M^2-1)//n + 1 in "
    "exact Python ints (T <= M^2+1, so the per-batch int64 test "
    "h^2 < T never overflows at ANY corpus size) -> one streaming "
    "filter pass, zero shuffle.  Hash is md5_number_lower-compatible "
    "so DuckDB derives identical membership.",
)
def temperature_resample(sf_dir: str, m_gran: int = 100000):
    import ray
    from ray.data.aggregate import Count

    counts = (
        _read(sf_dir, "documents", columns=["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    mn = int(counts["n"].min())
    # h^2*n < mn*M^2  <=>  h^2 < (mn*M^2 - 1)//n + 1 — exact rational
    # threshold folded into a bounded int64 (<= M^2+1) per language
    thr = {
        r["lang"]: (mn * m_gran * m_gran - 1) // int(r["n"]) + 1
        for _, r in counts.iterrows()
    }
    tref = ray.put(thr)

    def keep(t: pa.Table) -> pa.Table:
        thr_map = ray.get(tref)
        ids = t["doc_id"].to_numpy()
        h = np.array(
            [shingles.md5_hash64(str(i)) % m_gran for i in ids], dtype=np.int64
        )
        langs = t["lang"].to_numpy(zero_copy_only=False)
        lim = np.array([thr_map[l] for l in langs], dtype=np.int64)
        m = h * h < lim
        return pa.table({"doc_id": pa.array(ids[m]), "lang": pa.array(langs[m])})

    return _read(sf_dir, "documents", columns=["doc_id", "lang"]).map_batches(
        keep, batch_format="pyarrow"
    )


@register(
    "pq_ann_topk",
    None,
    doc="Product-quantization ANN (Jegou et al. 2011): the "
    "memory-bounded scale path for embedding search — 64-dim float32 "
    "vectors (256 B) compress to 16 uint8 sub-codes (16x), so at "
    "100 TB the code table fits in cluster RAM when raw vectors "
    "cannot.  Train: seeded Lloyd per contiguous subspace on a "
    "driver-side sample (stages/ann.py train_pq).  Encode: actor-pool "
    "map_batches, codebooks broadcast once.  Search: per-query "
    "(m_sub x k_sub) inner-product tables gathered against the code "
    "matrix (ADC, pure numpy), per-block top-R prune, then an EXACT "
    "cosine rerank of the global R-candidate shortlist (IVFADC-"
    "refine) fetching only shortlist vectors.  NO SQL oracle: "
    "codebook training is iterative k-means, outside DuckDB's "
    "vocabulary — the correctness gate is the pytest recall contract "
    "(measured 1.00 refined / 0.62 ADC-only recall@10 at m_sub=16, "
    "k_sub=32, R=100; refined recall vs brute force asserted >= 0.9, ADC-only "
    "recall asserted above chance, byte-exact determinism across "
    "runs).",
)
def pq_ann_topk(sf_dir: str):
    from crawler_ray.stages.ann import pq_encode, pq_topk, train_pq

    head = _head_by_id(sf_dir, 256)
    sample = np.array(head["embedding"].to_list(), dtype=np.float64)
    queries = sample[:5]
    books = train_pq(sample, m_sub=16, k_sub=32, iters=10, seed=0)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    enc = pq_encode(ds, books)
    out = pq_topk(enc, books, queries, k=10, refine=100)
    return out[["query_id", "vec_id", "rank"]]


@register(
    "ivfpq_ann_topk",
    None,
    doc="IVF + PQ composed (the FAISS IVFADC layout — the full 100 TB "
    "embedding-search answer): vectors are bucketed by coarse "
    "centroid (ivf_bucket, ONE shuffle, reused across query sets) AND "
    "PQ-encoded (16 uint8 codes, 16x compression), so a query touches "
    "only its nprobe buckets' code columns — bucket pruning multiplies "
    "with code compression, and at scale the bucketed code table is "
    "written partitioned-by-bucket parquet so non-probed buckets never "
    "leave storage.  ADC lookup-table scan inside the probed subset, "
    "exact-cosine rerank of the global shortlist (fetches shortlist "
    "vectors only).  NO SQL oracle: PQ codebook training is iterative "
    "k-means, outside DuckDB's vocabulary — the pytest contract pins "
    "(a) nprobe=all ≡ pq_topk exactly and (b) recall@10 >= 0.8 vs "
    "brute force at nprobe=4/8 buckets (stages/ann.py ivfpq_topk, "
    "tests/test_dedup_ann.py::test_ivfpq_composed_recall).",
)
def ivfpq_ann_topk(sf_dir: str):
    from crawler_ray.stages.ann import (
        ivf_bucket,
        ivfpq_topk,
        pq_encode,
        train_centroids,
        train_pq,
    )

    head = _head_by_id(sf_dir, 256)
    sample = np.array(head["embedding"].to_list(), dtype=np.float64)
    queries = sample[:5]
    cents = train_centroids(sample, n_centroids=8, seed=0)
    books = train_pq(sample, m_sub=16, k_sub=32, iters=10, seed=0)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    enc = pq_encode(ivf_bucket(ds, cents), books)
    out = ivfpq_topk(enc, cents, books, queries, k=10, nprobe=4, refine=100)
    return out[["query_id", "vec_id", "rank"]]


def _adjacent_bigrams(t: pa.Table):
    """Vectorized adjacent-bigram extraction shared by both
    bigram_lm_score regimes: split on ' ', gather w1/w2 by global
    index arithmetic (no Python over tokens), join into 'w1 w2' pair
    keys (tokens are space-split so the key is unambiguous).  Returns
    (pair_lens int64 per input row, pair-key StringArray in row
    order)."""
    txt = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
    tok_list = pc.split_pattern(txt, " ")
    if isinstance(tok_list, pa.ChunkedArray):
        tok_list = tok_list.combine_chunks()
    lens = pc.list_value_length(tok_list).to_numpy().astype(np.int64)
    pair_lens = np.maximum(lens - 1, 0)
    n = int(pair_lens.sum())
    if n == 0:
        return pair_lens, pa.array([], type=pa.string())
    flat = tok_list.values
    starts = np.cumsum(lens) - lens
    pstarts = np.cumsum(pair_lens) - pair_lens
    idx1 = (
        np.arange(n, dtype=np.int64)
        - np.repeat(pstarts, pair_lens)
        + np.repeat(starts, pair_lens)
    )
    w1 = flat.take(pa.array(idx1))
    w2 = flat.take(pa.array(idx1 + 1))
    pr = pc.binary_join_element_wise(w1, w2, " ")
    return pair_lens, pr


def _bigram_lm_join_regime(docs, c12, mean_c: int, q_gran: int):
    """Past-the-broadcast-cap regime for bigram_lm_score: the bigram
    table stays a Dataset.  Per-doc (pr, k) occurrence counts pick up
    their quantized conditional probability via a pair-keyed hash join
    (c1 derived from c12 by a second bucketed sum on w1, joined back on
    w1), then per-doc sums run in doc-hash buckets.  Integer math is
    identical to the broadcast path (forced-regime test asserts row
    equality)."""
    from crawler_ray.stages.relational import bucketed_agg

    def pair_rows(t: pa.Table) -> pa.Table:
        pair_lens, pr = _adjacent_bigrams(t)
        n = int(pair_lens.sum())
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "lang": pa.array([], type=pa.string()),
                    "pr": pa.array([], type=pa.string()),
                    "k": pa.array([], type=pa.int64()),
                }
            )
        rows = np.repeat(np.arange(len(pair_lens), dtype=np.int64), pair_lens)
        dct = pc.dictionary_encode(pr)
        codes = dct.indices.to_numpy().astype(np.int64)
        order = np.lexsort((codes, rows))
        r_s, c_s = rows[order], codes[order]
        first = np.flatnonzero(
            np.concatenate(([True], (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])))
        )
        k = np.diff(np.append(first, n)).astype(np.int64)
        did = t["doc_id"].to_numpy()
        langs = t["lang"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(did[r_s[first]]),
                "lang": pa.array(langs[r_s[first]], type=pa.string()),
                "pr": dct.dictionary.take(pa.array(c_s[first])),
                "k": pa.array(k),
            }
        )

    def add_w1(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:  # schemaless empty block from bucketed_agg
            df = pd.DataFrame(
                {
                    "pr": pd.Series([], dtype="object"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        df = df.copy()
        df["w1"] = df["pr"].str.split(" ", n=1).str[0]
        return df

    c12w = c12.map_batches(add_w1, batch_format="pandas").materialize()
    c1 = bucketed_agg(
        c12w, keys=["w1"], sum_cols={"c": "cw"}, key_dtypes={"w1": "object"}
    )

    def guard_c1(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            df = pd.DataFrame(
                {
                    "w1": pd.Series([], dtype="object"),
                    "cw": pd.Series([], dtype="int64"),
                }
            )
        return df

    c1 = c1.map_batches(guard_c1, batch_format="pandas").materialize()
    nparts = int(np.clip(c12w.count() // 25_000, 2, 32))
    q_ds = c1.join(c12w, join_type="inner", num_partitions=nparts, on=("w1",))

    def add_q(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy().astype(np.int64)
        cw = t["cw"].to_numpy().astype(np.int64)
        q = c * q_gran // cw
        return pa.table({"pr": t["pr"], "q": pa.array(q)})

    q_keep = q_ds.map_batches(add_q, batch_format="pyarrow").materialize()
    pairs = docs.map_batches(pair_rows, batch_format="pyarrow").materialize()
    nparts2 = int(np.clip(pairs.count() // 25_000, 2, 32))
    joined = q_keep.join(pairs, join_type="inner", num_partitions=nparts2, on=("pr",))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            df = pd.DataFrame(
                {
                    "pr": pd.Series([], dtype="object"),
                    "q": pd.Series([], dtype="int64"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "lang": pd.Series([], dtype="object"),
                    "k": pd.Series([], dtype="int64"),
                }
            )
        df = df.copy()
        df["__b"] = (df["doc_id"].to_numpy() % 64).astype("int32")
        return df

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "lang": pd.Series([], dtype="object"),
                "bucket": pd.Series([], dtype="int64"),
                "n_docs": pd.Series([], dtype="int64"),
                "total_pairs": pd.Series([], dtype="int64"),
            }
        )
        if g.shape[1] == 0 or len(g) == 0:
            return empty
        g = g.copy()
        g["kq"] = g["k"].to_numpy() * g["q"].to_numpy()
        d = g.groupby("doc_id", as_index=False).agg(
            lang=("lang", "first"), n_pairs=("k", "sum"), sum_q=("kq", "sum")
        )
        score = d["sum_q"].to_numpy() // d["n_pairs"].to_numpy()
        d["bucket"] = np.minimum(score * 4 // mean_c, 7)
        d["n_docs"] = np.int64(1)
        out = d.groupby(["lang", "bucket"], as_index=False).agg(
            n_docs=("n_docs", "sum"), total_pairs=("n_pairs", "sum")
        )
        return out[["lang", "bucket", "n_docs", "total_pairs"]]

    return (
        joined.map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_doc, batch_format="pandas")
    )


@register(
    "bigram_lm_score",
    """
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
    p AS (
      SELECT doc_id, lang,
             unnest(ts[1:len(ts)-1]) AS w1,
             unnest(ts[2:len(ts)]) AS w2
      FROM d WHERE len(ts) >= 2
    ),
    c12 AS (SELECT w1, w2, count(*) AS c FROM p GROUP BY w1, w2),
    c1  AS (SELECT w1, sum(c) AS cw FROM c12 GROUP BY w1),
    q0  AS (SELECT c12.w1, c12.w2, (c12.c * 1024) // c1.cw AS q, c12.c AS c
            FROM c12 JOIN c1 USING (w1)),
    tot AS (SELECT GREATEST(sum(q * c) // sum(c), 1) AS mean_c FROM q0),
    doc AS (
      SELECT p.doc_id, any_value(p.lang) AS lang,
             count(*) AS n_pairs, sum(q0.q) AS sum_q
      FROM p JOIN q0 ON p.w1 = q0.w1 AND p.w2 = q0.w2
      GROUP BY p.doc_id
    )
    SELECT lang,
           CAST(LEAST((sum_q // n_pairs) * 4 // tot.mean_c, 7) AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_pairs) AS BIGINT) AS total_pairs
    FROM doc, tot GROUP BY lang, bucket
    """,
    doc="Bigram language-model scoring (the CCNet/KenLM perplexity "
    "filter in integer-exact form): a doc's score is the mean QUANTIZED "
    "conditional probability of its adjacent token pairs, "
    "q(w1,w2) = (c12*1024)//c1 with c1 = sum_w2 c12 (so q <= 1024 by "
    "construction and the LM is trained on the corpus being scored, "
    "the CCNet in-domain setup); buckets are RELATIVE to the corpus "
    "mean pair probability (bucket = min(4*score/mean, 7)) so the "
    "scale is corpus-size independent and every division is exact "
    "integer arithmetic the DuckDB oracle replays bit-for-bit.  Shape: "
    "one bigram-count shuffle (per-block value_counts combiner -> "
    "string-keyed bucketed sum); under bigram_broadcast_cap the "
    "(pair -> q) table broadcasts once via ray.put and scoring is one "
    "streaming pass (dictionary-encode per batch, q looked up per "
    "DISTINCT pair, per-doc sums via reduceat — no Python over "
    "tokens); past the cap the IMPLEMENTED join regime fires "
    "(_bigram_lm_join_regime: per-doc (pair, k) rows pick up q via a "
    "pair-keyed hash join, per-doc sums in doc-hash buckets; "
    "forced-regime test asserts row equality).  Docs with <2 tokens "
    "have no pairs and are excluded, matching the SQL's doc CTE.",
)
def bigram_lm_score(sf_dir: str, q_gran: int = 1024, bigram_broadcast_cap: int = 2_000_000):
    import ray
    from ray.data.aggregate import Sum

    from crawler_ray.stages.relational import bucketed_agg

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        _, pr = _adjacent_bigrams(t)
        vc = pr.value_counts()
        return pa.table(
            {
                "pr": vc.field("values"),
                "c": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    c12 = bucketed_agg(
        docs.map_batches(count_partial, batch_format="pyarrow"),
        keys=["pr"],
        sum_cols={"c": "c"},
        key_dtypes={"pr": "object"},
    ).materialize()

    if c12.count() > bigram_broadcast_cap:
        # exact corpus totals: group c12 rows by w1-hash bucket so each
        # group sees ALL of a w1's bigrams (cw is the true c1 there),
        # emit one (sum q*c, sum c) partial per bucket, reduce driver-side
        def add_w1(df: pd.DataFrame) -> pd.DataFrame:
            if df.shape[1] == 0:
                df = pd.DataFrame(
                    {"pr": pd.Series([], dtype="object"), "c": pd.Series([], dtype="int64")}
                )
            df = df.copy()
            df["w1"] = df["pr"].str.split(" ", n=1).str[0]
            df["__b"] = (
                pd.util.hash_pandas_object(df["w1"], index=False).to_numpy() % 64
            ).astype("int32")
            return df

        def group_tot(g: pd.DataFrame) -> pd.DataFrame:
            if g.shape[1] == 0 or len(g) == 0:
                return pd.DataFrame({"sq": pd.Series([], dtype="int64"), "np_": pd.Series([], dtype="int64")})
            cw = g.groupby("w1")["c"].transform("sum").to_numpy().astype(np.int64)
            c = g["c"].to_numpy().astype(np.int64)
            q = c * q_gran // cw
            return pd.DataFrame({"sq": [int((q * c).sum())], "np_": [int(c.sum())]})

        tot = (
            c12.map_batches(add_w1, batch_format="pandas")
            .groupby("__b")
            .map_groups(group_tot, batch_format="pandas")
            .aggregate(Sum("sq", alias_name="sq"), Sum("np_", alias_name="np_"))
        )
        mean_c = max(int(tot["sq"]) // max(int(tot["np_"]), 1), 1)
        raw = _bigram_lm_join_regime(docs, c12, mean_c, q_gran)
    else:
        rows = c12.take_all()
        c1: dict = {}
        for r in rows:
            w1 = r["pr"].split(" ", 1)[0]
            c1[w1] = c1.get(w1, 0) + int(r["c"])
        qmap = {
            r["pr"]: int(r["c"]) * q_gran // c1[r["pr"].split(" ", 1)[0]]
            for r in rows
        }
        tot_q = sum(qmap[r["pr"]] * int(r["c"]) for r in rows)
        tot_n = sum(int(r["c"]) for r in rows)
        mean_c = max(tot_q // max(tot_n, 1), 1)
        qref = ray.put(qmap)

        def score(t: pa.Table) -> pa.Table:
            qm = ray.get(qref)
            pair_lens, pr = _adjacent_bigrams(t)
            mask = pair_lens > 0
            if int(pair_lens.sum()) == 0 or not mask.any():
                return pa.table(
                    {
                        "lang": pa.array([], type=pa.string()),
                        "bucket": pa.array([], type=pa.int64()),
                        "n_docs": pa.array([], type=pa.int64()),
                        "total_pairs": pa.array([], type=pa.int64()),
                    }
                )
            dct = pc.dictionary_encode(pr)
            codes = dct.indices.to_numpy().astype(np.int64)
            uq = np.array(
                [qm[u] for u in dct.dictionary.to_pylist()], dtype=np.int64
            )
            per_pair = np.append(uq[codes], np.int64(0))
            offsets = np.cumsum(pair_lens) - pair_lens
            sums = np.where(
                mask, np.add.reduceat(per_pair, offsets)[: len(pair_lens)], 0
            )
            score_v = sums[mask] // pair_lens[mask]
            bucket = np.minimum(score_v * 4 // mean_c, 7)
            langs = t["lang"].to_numpy(zero_copy_only=False)[mask]
            df = pd.DataFrame(
                {
                    "lang": langs,
                    "bucket": bucket,
                    "n_docs": np.ones(int(mask.sum()), dtype=np.int64),
                    "total_pairs": pair_lens[mask],
                }
            )
            out = df.groupby(["lang", "bucket"], as_index=False).sum()
            return pa.Table.from_pandas(out, preserve_index=False)

        raw = docs.map_batches(score, batch_format="pyarrow")

    agg = raw.groupby(["lang", "bucket"]).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_pairs", alias_name="total_pairs"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "bucket": pc.cast(t["bucket"], pa.int64()),
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "total_pairs": pc.cast(t["total_pairs"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "image_dhash_neardup",
    """
    WITH g AS (
      SELECT doc_id % 48 AS grp, count(*) AS sz, min(doc_id) AS keeper
      FROM documents GROUP BY grp
    )
    SELECT CAST(sz AS BIGINT) AS group_size,
           count(*) AS n_groups,
           CAST(sum(keeper) AS BIGINT) AS keepers_sum
    FROM g GROUP BY sz
    """,
    doc="Perceptual image near-dup (dHash): every document derives a "
    "deterministic image payload — base pixels from seed doc_id % 48, "
    "a brightness-shift VARIANT (+0/+8/+16 by doc_id arithmetic, "
    "pixel headroom so nothing clips) and an alternating REAL "
    "container (PNG for even doc_id, GIF for odd; both lossless, "
    "stages/codecs.py).  Byte-level exact dedup sees 48*3*2 distinct "
    "artifacts; the 64-bit difference hash (stages/media.py dhash64 — "
    "integer luma, 9x8 grid, adjacent-comparison bits, invariant "
    "under uniform brightness shift and lossless re-encode) collapses "
    "each seed group across variants AND containers.  Shape: actor-"
    "pool ImageDHasher (codec per actor, small batches for wide "
    "binary rows) -> groupby dhash (48 groups regardless of corpus "
    "size) -> group-size histogram + first-wins keeper sum.  The "
    "oracle mirrors the intended grouping as doc_id arithmetic; a "
    "codec or hash regression (groups fragmenting or merging) breaks "
    "row counts and the keeper sum.  The 48 base hashes are pinned "
    "pairwise-distinct by test, so hash-grouping == seed-grouping at "
    "every scale.",
)
def image_dhash_neardup(sf_dir: str):
    import ray
    from ray.data.aggregate import Count, Min, Sum

    from .stages.media import ImageDHasher

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        from .stages.codecs import gif_encode, png_encode

        payloads = []
        for did in t["doc_id"].to_pylist():
            grp = did % 48
            rng = np.random.RandomState(grp)
            h, w = 24 + grp % 8, 32 + grp % 12
            base = rng.randint(0, 224, size=(h, w)).astype(np.uint8)
            shift = np.uint8(((did // 48) % 3) * 8)
            img = np.stack([base + shift] * 3, axis=-1)
            payloads.append(png_encode(img) if did % 2 == 0 else gif_encode(img))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    hashed = ds.map_batches(synth, batch_format="pyarrow").map_batches(
        ImageDHasher,
        concurrency=max(2, min(8, ncpu // 4)),
        batch_size=64,
        batch_format="pyarrow",
    )

    groups = hashed.groupby("dhash").aggregate(
        Count(alias_name="sz"), Min("doc_id", alias_name="keeper")
    )

    def size_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "group_size": pc.cast(t["sz"], pa.int64()),
                "n_g": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "keeper": pc.cast(t["keeper"], pa.int64()),
            }
        )

    agg = (
        groups.map_batches(size_partial, batch_format="pyarrow")
        .groupby("group_size")
        .aggregate(Sum("n_g", alias_name="n_groups"), Sum("keeper", alias_name="keepers_sum"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "group_size": pc.cast(t["group_size"], pa.int64()),
                "n_groups": pc.cast(t["n_groups"], pa.int64()),
                "keepers_sum": pc.cast(t["keepers_sum"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


@register(
    "warc_roundtrip_stats",
    """
    SELECT lang, count(*) AS n_records,
           CAST(sum(strlen(text)) AS BIGINT) AS payload_bytes
    FROM documents GROUP BY lang
    """,
    doc="WARC interchange roundtrip (sources/warc.py — ISO 28500, the "
    "Common Crawl container, pure stdlib): documents become HTTP "
    "response records (utf-8 body, lang as the "
    "WARC-Identified-Content-Language header), sunk worker-side as "
    "one gzip-member-per-record .warc.gz PER BLOCK (content-hashed "
    "names, atomic publish — the resumable-output contract), then "
    "READ BACK via read_binary_files + vectorized record explode and "
    "aggregated per lang.  The oracle compares against the source "
    "table directly, so green certifies the bytes on disk roundtrip "
    "exactly (envelope parsing, Content-Length, member splitting, "
    "multibyte text) — not the in-flight dataset.",
)
def warc_roundtrip_stats(sf_dir: str, out_dir: str | None = None):
    import shutil
    import tempfile

    from ray.data.aggregate import Sum

    from .sources.warc import read_warc_dataset, write_warc_corpus

    own = out_dir is None
    if own:
        out_dir = tempfile.mkdtemp(prefix="crawler_ray_warc_", dir="/tmp")
    try:
        docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])

        def to_records(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": pa.array(
                        [
                            f"http://corpus.example/doc/{d}"
                            for d in t["doc_id"].to_pylist()
                        ],
                        type=pa.string(),
                    ),
                    "payload": pa.array(
                        [x.encode("utf-8") for x in t["text"].to_pylist()],
                        type=pa.large_binary(),
                    ),
                    "lang": t["lang"],
                }
            )

        rec = docs.map_batches(to_records, batch_format="pyarrow")
        # consume the sink (one tiny row per written file)
        write_warc_corpus(rec, out_dir, lang_col="lang").materialize()

        back = read_warc_dataset(out_dir)

        def partial(t: pa.Table) -> pa.Table:
            blen = pc.binary_length(t["payload"])
            return pa.table(
                {
                    "lang": t["lang"],
                    "n_r": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "b": pc.cast(blen, pa.int64()),
                }
            )

        agg = (
            back.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(
                Sum("n_r", alias_name="n_records"),
                Sum("b", alias_name="payload_bytes"),
            )
        )

        def finalize(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "lang": t["lang"],
                    "n_records": pc.cast(t["n_records"], pa.int64()),
                    "payload_bytes": pc.cast(t["payload_bytes"], pa.int64()),
                }
            )

        # per-lang rows are tiny; materialize before the tempdir vanishes
        out = agg.map_batches(finalize, batch_format="pyarrow").to_pandas()
        return pa.Table.from_pandas(out, preserve_index=False)
    finally:
        if own:
            shutil.rmtree(out_dir, ignore_errors=True)


TRIANGLE_BROADCAST_CAP_EDGES = 50_000_000  # int64 keys ≈ 400 MB broadcast


def _group_pairs(sort_key: np.ndarray, values: np.ndarray):
    """All unordered within-group pairs, fully vectorized.

    ``sort_key`` must be sorted; ``values`` are the pair elements, sorted
    within each group.  Returns (owner_index, v, w) where v < w are the
    values of each pair and owner_index points at the group via any of
    its rows.  Output size is Σ m_i·(m_i−1)/2 — the wedge count itself,
    so generation is O(output)."""
    n = len(sort_key)
    if n == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    starts = np.flatnonzero(np.concatenate(([True], sort_key[1:] != sort_key[:-1])))
    group_start = np.repeat(starts, np.diff(np.concatenate((starts, [n]))))
    q = np.arange(n) - group_start          # local position within group
    # row r (local pos q) pairs, as the LATER element, with its q
    # predecessors in the same group
    total = int(q.sum())
    w_idx = np.repeat(np.arange(n), q)
    v_idx = np.arange(total) - np.repeat(np.cumsum(q) - q, q) + np.repeat(group_start, q)
    return w_idx, values[v_idx], values[w_idx]


def _explode_edge_keys(t: pa.Table, n: int) -> np.ndarray:
    """Canonical (min·n+max) undirected edge keys of the triangle-test
    graph: the synthetic link formula (_explode_links — triangle-free
    in practice, exercises dedup at realistic ~7 degree) PLUS ring and
    conditional skip edges that provably close triangles with a varied
    per-node participation histogram:

      i—(i+1)%n            always          (ring)
      i—(i+2)%n            when i%2 == 0   (even skip-2)
      i—(i+3)%n            when i%5 == 0   (sparse skip-3)

    Self-loops dropped, batch-unique."""
    ids = t["doc_id"].to_numpy().astype(np.int64)
    k = (ids % 5 + 3).astype(np.int64)
    src = np.repeat(ids, k)
    j = np.arange(len(src)) - np.repeat(np.cumsum(k) - k, k)
    tgt = (src * 131 + j * 37 + j * j * 11 + 7) % n
    e2 = ids[ids % 2 == 0]
    e5 = ids[ids % 5 == 0]
    a_all = np.concatenate((src, ids, e2, e5))
    b_all = np.concatenate((tgt, (ids + 1) % n, (e2 + 2) % n, (e5 + 3) % n))
    a = np.minimum(a_all, b_all)
    b = np.maximum(a_all, b_all)
    m = a != b
    return np.unique(a[m] * n + b[m])


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 finalizer) — used to
    RANDOMIZE edge orientation in the join regime so adversarial id
    ordering can't concentrate wedge generation on one vertex."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


@register(
    "triangle_count",
    """
    WITH n AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)
      UNION ALL
      SELECT doc_id, (doc_id + 1) % (SELECT c FROM n) FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id + 3) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 5 = 0),
    e AS (
      SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
      FROM l WHERE src <> target),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1 JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    pn AS (
      SELECT v, count(*) AS triangles FROM (
        SELECT x AS v FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) GROUP BY v)
    SELECT triangles, count(*) AS n_nodes FROM pn GROUP BY triangles
    """,
    doc="Distributed triangle counting over the synthetic link graph "
    "(per-node triangle participation → histogram).  Wedge-closure "
    "algorithm: canonical-edge distinct (bucketed_agg, one shuffle) → "
    "oriented adjacency → within-group pair generation (vectorized, "
    "O(wedges)) → closure test → per-node counts.  TWO REGIMES: below "
    "TRIANGLE_BROADCAST_CAP_EDGES the sorted edge-key array broadcasts "
    "once (ray.put) and closure is a searchsorted inside the wedge "
    "pass, with DEGREE orientation (lower-degree endpoint owns the "
    "wedge — bounds per-vertex out-degree by O(√m), the classic wedge "
    "bound); past the cap, wedges and edges union-shuffle ONCE on the "
    "closing-edge key and close bucket-side, with splitmix64-hash "
    "orientation (randomized, stateless — no degree table to "
    "broadcast).  Regimes are result-equal (orientation only moves "
    "work).  Key encoding min·n+max requires n < 3·10⁹ per int64; "
    "shard the key into (hi, lo) columns past that.",
)
def triangle_count(sf_dir: str, broadcast: bool | None = None):
    import ray

    from .stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    edges = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    dist = bucketed_agg(edges, keys=["key"], sum_cols={"__count__": "c"})

    if broadcast is None:
        # bounded count, not a collect: avg degree is ~7 here, but the
        # dispatch reads the real distinct count
        broadcast = dist.count() <= TRIANGLE_BROADCAST_CAP_EDGES

    N_BUCKETS = 32

    if broadcast:
        # ---- broadcast regime: collect the (bounded) edge-key array,
        # derive degrees, close wedges against the broadcast in-pass
        parts = [
            b["key"].to_numpy()
            for b in dist.select_columns(["key"]).iter_batches(batch_format="pyarrow")
        ]
        ekeys = np.sort(np.concatenate(parts)) if parts else np.array([], dtype=np.int64)
        deg = (
            np.bincount(ekeys // n, minlength=n) + np.bincount(ekeys % n, minlength=n)
        ).astype(np.int64)
        ekeys_ref, deg_ref = ray.put(ekeys), ray.put(deg)

        def orient_deg(t: pa.Table) -> pa.Table:
            key = t["key"].to_numpy()
            a, b = key // n, key % n
            dg = ray.get(deg_ref)
            swap = (dg[b] < dg[a]) | ((dg[b] == dg[a]) & (b < a))
            u = np.where(swap, b, a)
            v = np.where(swap, a, b)
            return pa.table(
                {"u": u, "v": v, "__bucket": (u % N_BUCKETS).astype(np.int32)}
            )

        def wedge_close(g):
            import pandas as pd

            u = g["u"].to_numpy()
            v = g["v"].to_numpy()
            order = np.lexsort((v, u))
            u, v = u[order], v[order]
            owner, pv, pw = _group_pairs(u, v)
            ek = ray.get(ekeys_ref)
            wk = np.minimum(pv, pw) * n + np.maximum(pv, pw)
            pos = np.searchsorted(ek, wk)
            closed = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)
            nodes = np.concatenate((u[owner[closed]], pv[closed], pw[closed]))
            uniq, cnt = np.unique(nodes, return_counts=True)
            return pd.DataFrame({"node": uniq, "t": cnt.astype(np.int64)})

        per_node = (
            dist.map_batches(orient_deg, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(wedge_close, batch_format="pandas")
        )
    else:
        # ---- join regime: wedges and edges meet in ONE union shuffle
        # keyed by the closing edge; nothing global on the driver
        def to_wedges(t: pa.Table) -> pa.Table:
            key = t["key"].to_numpy()
            a, b = key // n, key % n
            ha, hb = _splitmix64(a), _splitmix64(b)
            swap = (hb < ha) | ((hb == ha) & (b < a))
            u = np.where(swap, b, a)
            v = np.where(swap, a, b)
            return pa.table({"u": u, "v": v})

        # wedge generation needs u-grouped adjacency: one shuffle on u
        def wedges_of(g):
            import pandas as pd

            u = g["u"].to_numpy()
            v = g["v"].to_numpy()
            order = np.lexsort((v, u))
            u, v = u[order], v[order]
            owner, pv, pw = _group_pairs(u, v)
            wk = np.minimum(pv, pw) * n + np.maximum(pv, pw)
            return pd.DataFrame({"key": wk, "apex": u[owner].astype(np.int64)})

        wedges = (
            dist.map_batches(to_wedges, batch_format="pyarrow")
            .map_batches(
                lambda t: t.append_column(
                    "__bucket",
                    pa.array((t["u"].to_numpy() % N_BUCKETS).astype(np.int32)),
                ),
                batch_format="pyarrow",
            )
            .groupby("__bucket")
            .map_groups(wedges_of, batch_format="pandas")
        )
        edge_rows = dist.map_batches(
            lambda t: pa.table(
                {
                    "key": t["key"],
                    "apex": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )

        def close_bucket(g):
            import pandas as pd

            key = g["key"].to_numpy()
            apex = g["apex"].to_numpy()
            is_edge = apex < 0
            ek = np.unique(key[is_edge])
            wk, wa = key[~is_edge], apex[~is_edge]
            if len(ek) == 0 or len(wk) == 0:
                return pd.DataFrame(
                    {"node": pd.Series([], dtype="int64"), "t": pd.Series([], dtype="int64")}
                )
            pos = np.searchsorted(ek, wk)
            closed = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)
            ck = wk[closed]
            nodes = np.concatenate((wa[closed], ck // n, ck % n))
            uniq, cnt = np.unique(nodes, return_counts=True)
            return pd.DataFrame({"node": uniq, "t": cnt.astype(np.int64)})

        def key_bucket(t: pa.Table) -> pa.Table:
            h = _splitmix64(t["key"].to_numpy())
            return t.append_column(
                "__bucket", pa.array((h % np.uint64(N_BUCKETS)).astype(np.int32))
            )

        per_node = (
            wedges.union(edge_rows)
            .map_batches(key_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(close_bucket, batch_format="pandas")
        )

    totals = bucketed_agg(per_node, keys=["node"], sum_cols={"t": "t"})

    from ray.data.aggregate import Count

    hist = totals.groupby("t").aggregate(Count(alias_name="n_nodes"))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "triangles": pc.cast(t["t"], pa.int64()),
                "n_nodes": pc.cast(t["n_nodes"], pa.int64()),
            }
        )

    return hist.map_batches(finalize, batch_format="pyarrow")


@register(
    "weighted_sample_topk",
    """
    WITH pri AS (
      SELECT doc_id, lang, greatest(n_chars, 1) AS w,
             CAST((md5_number_lower(CAST(doc_id AS VARCHAR)) >> 1)
                  // CAST(greatest(n_chars, 1) AS UBIGINT) AS BIGINT) AS p
      FROM documents)
    SELECT doc_id, lang, w, p FROM pri ORDER BY p, doc_id LIMIT 100
    """,
    doc="Weight-proportional priority sampling (Duffield/Lund/Thorup "
    "priority samples, PODS'05 family): each doc draws the "
    "deterministic 63-bit uniform h = md5(doc_id)>>1 and gets priority "
    "p = h // w (integer floor, w = max(n_chars,1)) — the k smallest "
    "priorities form a weighted-without-replacement sample whose "
    "inclusion probability is ~proportional to w, REPRODUCIBLE across "
    "runs and engines (hash is md5_number_lower-compatible, division "
    "is integer-exact, no floats anywhere).  Combiner shape: each "
    "batch keeps its local k-smallest (the shuffle carries <= k rows "
    "per batch), one global merge keeps the k-smallest overall — no "
    "stratum or corpus ever materializes, so the same plan runs at "
    "any corpus size.",
)
def weighted_sample_topk(sf_dir: str, k: int = 100):
    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [shingles.md5_hash64(str(i)) for i in df["doc_id"].to_numpy()],
            dtype=np.uint64,
        )
        w = np.maximum(df["n_chars"].to_numpy().astype(np.uint64), 1)
        p = ((h >> np.uint64(1)) // w).astype(np.int64)
        df = df.assign(w=w.astype(np.int64), p=p)
        df = df.sort_values(["p", "doc_id"], kind="stable").head(k)
        return df[["doc_id", "lang", "w", "p"]]

    def final_top(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["p", "doc_id"], kind="stable").head(k)

    return (
        _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
        .map_batches(local_top, batch_format="pandas")
        .map_batches(
            lambda df: df.assign(__one=np.int32(0)), batch_format="pandas"
        )
        .groupby("__one")
        .map_groups(
            lambda g: final_top(g).reset_index(drop=True), batch_format="pandas"
        )
        .select_columns(["doc_id", "lang", "w", "p"])
    )


KCORE_BROADCAST_CAP_NODES = 100_000_000  # dense int64[n] ≈ 800 MB at cap


def _h_index_rows(df):
    """Vectorized per-node H-index over (node, val) rows: with each
    node's neighbor values sorted descending, h = max_i min(i, v_i)
    (1-based i) — the update step of the h-index/coreness fixpoint."""
    import pandas as pd

    if len(df) == 0 or df.shape[1] == 0 or "node" not in df.columns:
        return pd.DataFrame(
            {"node": pd.Series([], dtype="int64"), "h": pd.Series([], dtype="int64")}
        )
    s = df["node"].to_numpy(dtype=np.int64)
    v = df["val"].to_numpy(dtype=np.int64)
    order = np.lexsort((-v, s))
    s, v = s[order], v[order]
    starts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
    gs = np.repeat(starts, np.diff(np.concatenate((starts, [len(s)]))))
    rank = np.arange(len(s)) - gs + 1
    hv = np.minimum(rank, v)
    h = np.maximum.reduceat(hv, starts)
    return pd.DataFrame({"node": s[starts], "h": h.astype(np.int64)})


@register(
    "kcore_decomposition",
    # The h-index FIXPOINT (not a peel order) IS SQL-expressible: a
    # recursive CTE carries the full (node, h) vector forward per
    # iteration (rows tagged by iteration, so UNION ALL recursion sees
    # the complete previous state), the per-node H-index is max k with
    # >=k qualifying neighbors via a generate_series lattice, and 24
    # unrolled iterations comfortably covers convergence (measured: 5
    # rounds at 500 nodes, 6 at 5000; once converged the vector is
    # stationary, so reading iteration 24 reads the fixpoint).  The Ray
    # side additionally DETECTS convergence rather than assuming it;
    # coreness is also asserted equal to an exact sequential peeling
    # reference at two graph shapes in tests/test_queries_hygiene.py.
    """
    WITH RECURSIVE n AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)
      UNION ALL
      SELECT doc_id, (doc_id + 1) % (SELECT c FROM n) FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id + 3) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 5 = 0),
    eu AS (
      SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
      FROM l WHERE src <> target),
    edges AS (SELECT a AS src, b AS dst FROM eu
              UNION ALL SELECT b, a FROM eu),
    h AS (
      SELECT 0 AS it, src AS node, count(*) AS hv FROM edges GROUP BY 2
      UNION ALL
      SELECT it + 1 AS it, node, max(k) AS hv FROM (
        SELECT h.it AS it, e.src AS node, g.k AS k
        FROM h JOIN edges e ON e.dst = h.node,
             unnest(generate_series(1, 64)) AS g(k)
        WHERE h.hv >= g.k AND h.it < 24
        GROUP BY 1, 2, 3
        HAVING count(*) >= g.k
      ) GROUP BY 1, 2)
    SELECT CAST(hv AS BIGINT) AS coreness, count(*) AS n_nodes
    FROM h WHERE it = 24 GROUP BY 1
    """,
    doc="k-core decomposition (coreness per node → histogram) of the "
    "triangle-test graph, via the distributed H-INDEX FIXPOINT (Lü, "
    "Zhou, Zhang & Stanley 2016: init c=degree; repeat c(v) = H-index "
    "of neighbors' c — converges exactly to coreness, no sequential "
    "peel order needed, so every round is ONE bucketed shuffle of "
    "(node, neighbor-value) pairs + a vectorized per-bucket H-index).  "
    "TWO REGIMES (pagerank pattern): below KCORE_BROADCAST_CAP_NODES "
    "the value vector is a dense int64[n] re-broadcast per round "
    "(ray.put) and edges stream against it; past the cap values live "
    "as a Dataset and each round is bucketed join (edges ⋈ values on "
    "dst) → H-index shuffle → bucketed delta count for convergence — "
    "nothing global ever sits on the driver.  Regimes are "
    "result-equal; convergence is detected, not assumed (round cap "
    "raises rather than returning a non-fixpoint).",
)
def kcore_decomposition(
    sf_dir: str, dataset_regime: bool | None = None, max_rounds: int = 100
):
    import ray

    from .stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    if dataset_regime is None:
        dataset_regime = n > KCORE_BROADCAST_CAP_NODES

    ekeys = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    dist = bucketed_agg(ekeys, keys=["key"], sum_cols={"__count__": "c"})

    def both_dirs(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        a, b = key // n, key % n
        return pa.table(
            {"src": np.concatenate((a, b)), "dst": np.concatenate((b, a))}
        )

    edges = dist.map_batches(both_dirs, batch_format="pyarrow").materialize()
    N_BUCKETS = 32

    def hist_table(vals: np.ndarray, cnts: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "coreness": pa.array(vals.astype(np.int64)),
                "n_nodes": pa.array(cnts.astype(np.int64)),
            }
        )

    if not dataset_regime:
        degs = bucketed_agg(
            edges.map_batches(
                lambda t: pa.table({"node": t["src"]}), batch_format="pyarrow"
            ),
            keys=["node"],
            sum_cols={"__count__": "d"},
        ).to_pandas()
        c = np.zeros(n, dtype=np.int64)
        if len(degs):
            c[degs["node"].to_numpy(dtype=np.int64)] = degs["d"].to_numpy(
                dtype=np.int64
            )
        for _ in range(max_rounds):
            cref = ray.put(c)

            def pairs(t: pa.Table) -> pa.Table:
                cc = ray.get(cref)
                src = t["src"].to_numpy()
                return pa.table(
                    {
                        "node": src,
                        "val": cc[t["dst"].to_numpy()],
                        "__bucket": (src % N_BUCKETS).astype(np.int32),
                    }
                )

            hdf = (
                edges.map_batches(pairs, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(_h_index_rows, batch_format="pandas")
            ).to_pandas()
            new = np.zeros(n, dtype=np.int64)
            if len(hdf):
                new[hdf["node"].to_numpy(dtype=np.int64)] = hdf["h"].to_numpy(
                    dtype=np.int64
                )
            if np.array_equal(new, c):
                break
            c = new
        else:
            raise RuntimeError("kcore: h-index fixpoint not reached in max_rounds")
        vals, cnts = np.unique(c, return_counts=True)
        return hist_table(vals, cnts)

    # ---- dataset regime: values live as a Dataset of (node, c) rows
    vals_ds = bucketed_agg(
        edges.map_batches(
            lambda t: pa.table({"node": t["src"]}), batch_format="pyarrow"
        ),
        keys=["node"],
        sum_cols={"__count__": "c"},
    ).materialize()

    edges_b = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "c": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "__bucket": pa.array(
                    (t["dst"].to_numpy() % N_BUCKETS).astype(np.int32)
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def val_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        return pa.table(
            {
                "src": pa.array(np.full(len(node), -1, dtype=np.int64)),
                "dst": node,
                "c": t["c"],
                "__bucket": pa.array((node % N_BUCKETS).astype(np.int32)),
            }
        )

    def join_group(df):
        import pandas as pd

        if len(df) == 0 or df.shape[1] == 0 or "src" not in df.columns:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"), "val": pd.Series([], dtype="int64")}
            )
        is_val = df["src"].to_numpy() < 0
        v, e = df[is_val], df[~is_val]
        if len(e) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"), "val": pd.Series([], dtype="int64")}
            )
        vd = v["dst"].to_numpy(dtype=np.int64)
        vc = v["c"].to_numpy(dtype=np.int64)
        o = np.argsort(vd)
        vd, vc = vd[o], vc[o]
        ed = e["dst"].to_numpy(dtype=np.int64)
        # every dst has a value row by construction (its degree >= 1)
        val = vc[np.searchsorted(vd, ed)]
        return pd.DataFrame(
            {"node": e["src"].to_numpy(dtype=np.int64), "val": val}
        )

    for _ in range(max_rounds):
        pairs_ds = (
            edges_b.union(vals_ds.map_batches(val_rows, batch_format="pyarrow"))
            .groupby("__bucket")
            .map_groups(join_group, batch_format="pandas")
        )
        new_ds = (
            pairs_ds.map_batches(
                lambda df: df.assign(
                    __bucket=(df["node"].to_numpy() % N_BUCKETS).astype(np.int32)
                )
                if len(df) and "node" in df.columns
                else df,
                batch_format="pandas",
            )
            .groupby("__bucket")
            .map_groups(
                lambda g: _h_index_rows(g).rename(columns={"h": "c"}),
                batch_format="pandas",
            )
            .materialize()
        )
        delta = bucketed_agg(
            vals_ds.map_batches(
                lambda t: pa.table(
                    {"node": t["node"], "s": pc.negate(pc.cast(t["c"], pa.int64()))}
                ),
                batch_format="pyarrow",
            ).union(
                new_ds.map_batches(
                    lambda t: pa.table(
                        {"node": t["node"], "s": pc.cast(t["c"], pa.int64())}
                    ),
                    batch_format="pyarrow",
                )
            ),
            keys=["node"],
            sum_cols={"s": "s"},
        )
        changed = delta.map_batches(
            lambda df: df[df["s"] != 0][["node"]]
            if len(df) and "s" in df.columns
            else df.iloc[:0][[c_ for c_ in ("node",) if c_ in df.columns]],
            batch_format="pandas",
        ).count()
        vals_ds = new_ds
        if changed == 0:
            break
    else:
        raise RuntimeError("kcore: h-index fixpoint not reached in max_rounds")

    hist = bucketed_agg(
        vals_ds.map_batches(
            lambda t: pa.table({"coreness": t["c"]}), batch_format="pyarrow"
        ),
        keys=["coreness"],
        sum_cols={"__count__": "n_nodes"},
    ).to_pandas()
    vals = hist["coreness"].to_numpy(dtype=np.int64)
    cnts = hist["n_nodes"].to_numpy(dtype=np.int64)
    n_iso = n - int(cnts.sum())
    if n_iso > 0:
        vals = np.concatenate(([0], vals))
        cnts = np.concatenate(([n_iso], cnts))
    o = np.argsort(vals)
    return hist_table(vals[o], cnts[o])


@register(
    "per_source_cap",
    """
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents)
    SELECT doc_id, source FROM r WHERE rk <= 10
    """,
    doc="Per-source document cap (the Common-Crawl-style per-host quota: "
    "no single domain may contribute more than CAP docs to the training "
    "mix): within each source keep the CAP docs with the smallest "
    "(md5(doc_id), doc_id) — a deterministic uniform choice that is "
    "REPRODUCIBLE across engines and independent of row order.  "
    "Combiner shape: each batch keeps its local per-source CAP-smallest "
    "(the shuffle carries <= CAP rows per source per batch — never the "
    "corpus), then one source-bucketed merge keeps the global CAP per "
    "source.  Skew-safe: a source with 10^9 docs still ships only "
    "CAP rows per batch.",
)
def per_source_cap(sf_dir: str, cap: int = 10):
    def local_cap(df: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [shingles.md5_hash64(str(i)) for i in df["doc_id"].to_numpy()],
            dtype=np.uint64,
        )
        df = df.assign(__h=h)
        df = df.sort_values(["__h", "doc_id"], kind="stable")
        return df.groupby("source", sort=False).head(cap)

    def final_cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", "doc_id"], kind="stable").head(cap)
        return g[["doc_id", "source"]]

    return (
        _read(sf_dir, "documents", columns=["doc_id", "source"])
        .map_batches(local_cap, batch_format="pandas")
        .groupby("source")
        .map_groups(
            lambda g: final_cap(g).reset_index(drop=True), batch_format="pandas"
        )
        .select_columns(["doc_id", "source"])
    )


BFS_BROADCAST_CAP_NODES = 100_000_000  # dist int32[n] ≈ 400 MB at cap


@register(
    "graph_bfs_layers",
    """
    WITH RECURSIVE nn AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM nn) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)
      UNION ALL
      SELECT doc_id, (doc_id + 1) % (SELECT c FROM nn) FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % (SELECT c FROM nn) FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id + 3) % (SELECT c FROM nn) FROM documents
      WHERE doc_id % 5 = 0),
    e AS (SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
          FROM l WHERE src <> target),
    ee AS (SELECT a AS s, b AS t FROM e UNION ALL SELECT b AS s, a AS t FROM e),
    bfs AS (
      SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
      UNION
      SELECT ee.t, bfs.dist + 1 FROM bfs JOIN ee ON ee.s = bfs.node
      WHERE bfs.dist < 32
    ),
    md AS (SELECT node, min(dist) AS dist FROM bfs GROUP BY node)
    SELECT dist, count(*) AS n_nodes FROM md GROUP BY dist
    """,
    doc="Single-source BFS layer histogram over the triangle-test graph "
    "(distance from node 0 -> node count; depth capped at MAX_DEPTH=32 "
    "as part of the CONTRACT, so the recursive-CTE oracle's walk bound "
    "is exact semantics, not an assumption).  This is the iterative-"
    "frontier showcase WITH a real SQL oracle (kcore's fixpoint is "
    "rows-only; BFS min-dist is walk-expressible, so DuckDB's "
    "UNION-distinct recursion mirrors it exactly).  TWO REGIMES "
    "(pagerank pattern): below BFS_BROADCAST_CAP_NODES the driver "
    "holds dist int32[n] and each round broadcasts the SORTED frontier "
    "(ray.put) — edges stream against it with a searchsorted membership "
    "test, one bucketed-distinct shuffle of candidate nodes per round "
    "(frontier-proportional, never O(n)); past the cap dist lives as a "
    "Dataset of (node, dist) rows and each round is edges-join-frontier "
    "then an anti-join against dist, both as ONE bucketed union-shuffle "
    "each — the driver sees only per-round counts.  Regimes are "
    "result-equal (asserted in tests vs an exact sequential BFS).",
)
def graph_bfs_layers(
    sf_dir: str,
    source_node: int = 0,
    max_depth: int = 32,
    dataset_regime: bool | None = None,
):
    import ray

    from .stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    if dataset_regime is None:
        dataset_regime = n > BFS_BROADCAST_CAP_NODES

    ekeys = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    dist_keys = bucketed_agg(ekeys, keys=["key"], sum_cols={"__count__": "c"})

    def both_dirs(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        a, b = key // n, key % n
        return pa.table(
            {"src": np.concatenate((a, b)), "dst": np.concatenate((b, a))}
        )

    edges = dist_keys.map_batches(both_dirs, batch_format="pyarrow").materialize()
    N_BUCKETS = 32

    def hist_from_pairs(nodes: np.ndarray, dists: np.ndarray) -> pa.Table:
        vals, cnts = np.unique(dists, return_counts=True)
        _ = nodes
        return pa.table(
            {
                "dist": pa.array(vals.astype(np.int64)),
                "n_nodes": pa.array(cnts.astype(np.int64)),
            }
        )

    if not dataset_regime:
        dist = np.full(n, -1, dtype=np.int32)
        dist[source_node] = 0
        frontier = np.array([source_node], dtype=np.int64)
        for d in range(1, max_depth + 1):
            fref = ray.put(np.sort(frontier))

            def expand(t: pa.Table) -> pa.Table:
                f = ray.get(fref)
                src = t["src"].to_numpy()
                idx = np.searchsorted(f, src)
                idx[idx == len(f)] = 0
                hit = f[idx] == src
                return pa.table({"node": t["dst"].to_numpy()[hit]})

            cand = bucketed_agg(
                edges.map_batches(expand, batch_format="pyarrow"),
                keys=["node"],
                sum_cols={"__count__": "c"},
            ).to_pandas()
            if len(cand) == 0:
                break
            nodes = cand["node"].to_numpy(dtype=np.int64)
            new = nodes[dist[nodes] < 0]
            if len(new) == 0:
                break
            dist[new] = d
            frontier = new
        reached = np.flatnonzero(dist >= 0)
        return hist_from_pairs(reached, dist[reached].astype(np.int64))

    # ---- dataset regime: dist lives as a Dataset of (node, dist) rows
    dist_ds = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([source_node], type=pa.int64()),
                "dist": pa.array([0], type=pa.int64()),
            }
        )
    ).materialize()
    frontier_ds = dist_ds

    edges_b = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "__bucket": pa.array(
                    (t["src"].to_numpy() % N_BUCKETS).astype(np.int32)
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def frontier_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        return pa.table(
            {
                "src": node,
                "dst": pa.array(np.full(len(node), -1, dtype=np.int64)),
                "__bucket": pa.array((node % N_BUCKETS).astype(np.int32)),
            }
        )

    def expand_group(df):
        if len(df) == 0 or df.shape[1] == 0 or "dst" not in df.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        is_f = df["dst"].to_numpy() < 0
        f = np.sort(df["src"].to_numpy(dtype=np.int64)[is_f])
        e = df[~is_f]
        if len(f) == 0 or len(e) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        src = e["src"].to_numpy(dtype=np.int64)
        idx = np.searchsorted(f, src)
        idx[idx == len(f)] = 0
        hit = f[idx] == src
        return pd.DataFrame(
            {"node": np.unique(e["dst"].to_numpy(dtype=np.int64)[hit])}
        )

    def seen_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        return pa.table(
            {
                "node": node,
                "is_seen": pa.array(np.ones(len(node), dtype=np.int8)),
                "__bucket": pa.array((node % N_BUCKETS).astype(np.int32)),
            }
        )

    def cand_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        return pa.table(
            {
                "node": node,
                "is_seen": pa.array(np.zeros(len(node), dtype=np.int8)),
                "__bucket": pa.array((node % N_BUCKETS).astype(np.int32)),
            }
        )

    def antijoin_group(df):
        if len(df) == 0 or df.shape[1] == 0 or "is_seen" not in df.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        seen = np.sort(
            df["node"].to_numpy(dtype=np.int64)[df["is_seen"].to_numpy() == 1]
        )
        cand = np.unique(
            df["node"].to_numpy(dtype=np.int64)[df["is_seen"].to_numpy() == 0]
        )
        if len(seen):
            idx = np.searchsorted(seen, cand)
            idx[idx == len(seen)] = 0
            cand = cand[seen[idx] != cand]
        return pd.DataFrame({"node": cand})

    for d in range(1, max_depth + 1):
        cand_ds = (
            edges_b.union(
                frontier_ds.map_batches(frontier_rows, batch_format="pyarrow")
            )
            .groupby("__bucket")
            .map_groups(expand_group, batch_format="pandas")
        )
        new_ds = (
            dist_ds.map_batches(seen_rows, batch_format="pyarrow")
            .union(cand_ds.map_batches(cand_rows, batch_format="pyarrow"))
            .groupby("__bucket")
            .map_groups(antijoin_group, batch_format="pandas")
            .materialize()
        )
        n_new = new_ds.count()
        if n_new == 0:
            break
        newd = new_ds.map_batches(
            lambda t, _d=d: pa.table(
                {
                    "node": pc.cast(t["node"], pa.int64()),
                    "dist": pa.array(
                        np.full(t.num_rows, _d, dtype=np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        dist_ds = dist_ds.union(newd).materialize()
        frontier_ds = newd.materialize()

    hist = bucketed_agg(
        dist_ds.map_batches(
            lambda t: pa.table({"dist": t["dist"]}), batch_format="pyarrow"
        ),
        keys=["dist"],
        sum_cols={"__count__": "n_nodes"},
    ).to_pandas()
    o = np.argsort(hist["dist"].to_numpy())
    return pa.table(
        {
            "dist": pa.array(hist["dist"].to_numpy(dtype=np.int64)[o]),
            "n_nodes": pa.array(hist["n_nodes"].to_numpy(dtype=np.int64)[o]),
        }
    )


@register(
    "audio_fingerprint_dedup",
    """
    WITH g AS (
      SELECT doc_id % 40 AS grp, count(*) AS sz, min(doc_id) AS keeper
      FROM documents GROUP BY grp
    )
    SELECT CAST(sz AS BIGINT) AS group_size,
           count(*) AS n_groups,
           CAST(sum(keeper) AS BIGINT) AS keepers_sum
    FROM g GROUP BY sz
    """,
    doc="Perceptual audio near-dup (energy-contour fingerprint): every "
    "document derives a deterministic mono 16-bit WAV payload — base "
    "waveform from seed doc_id % 40 (amplitude <= 8191, so the "
    "loudest variant still fits int16), a GAIN variant (x1/x2/x4 by "
    "doc_id arithmetic — exact integer scaling, the audio analogue of "
    "image brightness shift) and a trailing-silence variant (+0 or "
    "+4096 zero samples past the fingerprint window).  Byte-level "
    "exact dedup sees 40*3*2 distinct artifacts; the 64-bit "
    "energy-contour fingerprint (stages/media.py afp64 — 65 frame "
    "energies over a fixed 16,640-sample prefix, adjacent-comparison "
    "bits, exact int64 arithmetic, invariant under integer gain and "
    "trailing content) collapses each seed group across both variant "
    "axes.  Shape: actor-pool AudioFingerprinter (decoder per actor, "
    "small batches for wide binary rows) -> groupby afp (40 groups "
    "regardless of corpus size) -> group-size histogram + first-wins "
    "keeper sum.  The oracle mirrors the intended grouping as doc_id "
    "arithmetic; a RIFF or fingerprint regression (groups fragmenting "
    "or merging) breaks row counts and the keeper sum.  The 40 base "
    "fingerprints are pinned pairwise-distinct by test, so "
    "fingerprint-grouping == seed-grouping at every scale.",
)
def audio_fingerprint_dedup(sf_dir: str):
    import ray
    from ray.data.aggregate import Count, Min, Sum

    from .stages.media import AFP_WINDOW, AudioFingerprinter, encode_wav

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        payloads = []
        for did in t["doc_id"].to_pylist():
            grp = did % 40
            rng = np.random.RandomState(grp)
            base = rng.randint(-8191, 8192, size=AFP_WINDOW).astype(np.int64)
            gain = 1 << ((did // 40) % 3)
            samples = (base * gain).astype(np.int16)
            if (did // 120) % 2 == 1:
                samples = np.concatenate(
                    (samples, np.zeros(4096, dtype=np.int16))
                )
            payloads.append(encode_wav(samples, 16000))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    hashed = ds.map_batches(synth, batch_format="pyarrow").map_batches(
        AudioFingerprinter,
        concurrency=max(2, min(8, ncpu // 4)),
        batch_size=64,
        batch_format="pyarrow",
    )

    groups = hashed.groupby("afp").aggregate(
        Count(alias_name="sz"), Min("doc_id", alias_name="keeper")
    )

    def size_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "group_size": pc.cast(t["sz"], pa.int64()),
                "n_g": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "keeper": pc.cast(t["keeper"], pa.int64()),
            }
        )

    agg = (
        groups.map_batches(size_partial, batch_format="pyarrow")
        .groupby("group_size")
        .aggregate(
            Sum("n_g", alias_name="n_groups"),
            Sum("keeper", alias_name="keepers_sum"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "group_size": pc.cast(t["group_size"], pa.int64()),
                "n_groups": pc.cast(t["n_groups"], pa.int64()),
                "keepers_sum": pc.cast(t["keepers_sum"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


SRP_AUG_OFF = 1 << 25          # planted-copy id offset (ids must stay < 2^26)
SRP_PKEY_SHIFT = 27            # pair key = a << 27 | b  (fits int64 to 2^26 ids)
SRP_BROADCAST_CAP_VECS = 500_000  # 64-dim float64 ≈ 256 MB at cap


def _srp_aug(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic near-dup planting shared by both regimes: every
    vec_id % 4 == 0 vector gets a copy at vec_id + SRP_AUG_OFF scaled
    per-coordinate by (3 + ((j % 5) - 2)/100) — all factors positive,
    so the copy's direction moves ~0.006 rad (cosine ≥ 0.9999) while
    byte-level and exact dedup see a distinct vector.  Mirrored in SQL
    via list_transform's (x, i) lambda."""
    ids = t["vec_id"].to_numpy().astype(np.int64)
    m = list_col_to_matrix(t["embedding"])
    f = 3.0 + ((np.arange(m.shape[1]) % 5) - 2) / 100.0
    sel = ids % 4 == 0
    return (
        np.concatenate((ids, ids[sel] + SRP_AUG_OFF)),
        np.vstack((m, m[sel] * f)),
    )


@register(
    "srp_lsh_neardup",
    """
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 33554432,
             list_transform(embedding,
                            (x, i) -> x * (3 + ((i-1) % 5 - 2)/100.0))
      FROM embeddings WHERE vec_id % 4 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.98
    """,
    doc="Embedding near-dup via SIGNED RANDOM PROJECTION LSH (Charikar "
    "2002 hyperplane hashing — the cosine analogue of minhash LSH): "
    "24 bands x 16 sign bits from seeded Gaussian hyperplanes; only "
    "same-(band, code) pairs are candidates (never all-pairs), "
    "candidates dedup through one bucketed shuffle on the pair key, "
    "then exact float64 cosine verify >= 0.98.  The corpus is "
    "augmented with deterministic planted copies (cosine >= 0.9999; "
    "base pairs max ~0.6 at every sf, margin asserted in tests), so "
    "the exhaustive-join oracle equals the sweep: per-bit collision "
    "prob for a planted pair is >= 0.996, per-band 0.94, miss across "
    "24 bands < 1e-28.  VERIFY REGIMES: below SRP_BROADCAST_CAP_VECS "
    "the (ids, matrix) broadcasts once (ray.put) and pairs verify "
    "in-stream; past the cap vectors never leave the cluster — pairs "
    "explode to (id, pair_key, side) rows and TWO bucketed union-"
    "shuffles attach vectors then combine sides (the minhash "
    "verify_pairs_joined pattern).  Regimes are result-equal.",
)
def srp_lsh_neardup(
    sf_dir: str,
    threshold: float = 0.98,
    bands: int = 24,
    bits: int = 16,
    broadcast: bool | None = None,
    seed: int = 7,
):
    import ray

    from .stages.relational import bucketed_agg

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = pq.read_metadata(_pq(sf_dir, "embeddings")).num_rows
    if broadcast is None:
        broadcast = n + (n // 4 + 1) <= SRP_BROADCAST_CAP_VECS

    def codes(t: pa.Table) -> pa.Table:
        ids, m = _srp_aug(t)
        if len(ids) == 0:
            return pa.table(
                {
                    "gkey": pa.array([], type=pa.int64()),
                    "vid": pa.array([], type=pa.int64()),
                }
            )
        r = np.random.RandomState(seed).standard_normal(
            (m.shape[1], bands * bits)
        )
        s = (m @ r > 0).reshape(len(ids), bands, bits)
        w = (1 << np.arange(bits, dtype=np.int64))[::-1]
        code = s @ w  # (n, bands) int64
        band = np.broadcast_to(np.arange(bands, dtype=np.int64), code.shape)
        return pa.table(
            {
                "gkey": (band * (1 << bits) + code).ravel(),
                "vid": np.repeat(ids, bands),
            }
        )

    def group_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2 or "vid" not in df.columns:
            return pd.DataFrame({"pkey": pd.Series([], dtype="int64")})
        v = np.unique(df["vid"].to_numpy(dtype=np.int64))
        if len(v) < 2:
            return pd.DataFrame({"pkey": pd.Series([], dtype="int64")})
        ia, ib = np.triu_indices(len(v), k=1)
        return pd.DataFrame({"pkey": (v[ia] << SRP_PKEY_SHIFT) | v[ib]})

    cand = bucketed_agg(
        emb.map_batches(codes, batch_format="pyarrow")
        .groupby("gkey")
        .map_groups(group_pairs, batch_format="pandas"),
        keys=["pkey"],
        sum_cols={"__count__": "c"},
    )

    def pair_table(a: np.ndarray, b: np.ndarray) -> pa.Table:
        o = np.lexsort((b, a))
        return pa.table(
            {
                "id_a": pa.array(a[o], type=pa.int64()),
                "id_b": pa.array(b[o], type=pa.int64()),
            }
        )

    if broadcast:
        refs = [
            t
            for t in ray.get(emb.to_arrow_refs())
            if t.num_rows and t.num_columns
        ]
        all_ids, all_m = _srp_aug(pa.concat_tables(refs))
        o = np.argsort(all_ids)
        all_ids, all_m = all_ids[o], all_m[o]
        norms = np.maximum(np.linalg.norm(all_m, axis=1, keepdims=True), 1e-30)
        vref = ray.put((all_ids, all_m / norms))

        def verify(t: pa.Table) -> pa.Table:
            ids, mn = ray.get(vref)
            pk = t["pkey"].to_numpy()
            a = pk >> SRP_PKEY_SHIFT
            b = pk & ((1 << SRP_PKEY_SHIFT) - 1)
            va = mn[np.searchsorted(ids, a)]
            vb = mn[np.searchsorted(ids, b)]
            cos = np.einsum("ij,ij->i", va, vb)
            keep = cos >= threshold
            return pair_table(a[keep], b[keep])

        return cand.map_batches(verify, batch_format="pyarrow")

    # ---- join regime: vectors never leave the cluster
    N_BUCKETS = 32
    dim_probe = pq.read_schema(_pq(sf_dir, "embeddings"))
    _ = dim_probe

    def side_rows(t: pa.Table) -> pd.DataFrame:
        pk = t["pkey"].to_numpy()
        a = pk >> SRP_PKEY_SHIFT
        b = pk & ((1 << SRP_PKEY_SHIFT) - 1)
        vid = np.concatenate((a, b))
        return pd.DataFrame(
            {
                "vid": vid,
                "pkey": np.concatenate((pk, pk)),
                "side": np.concatenate(
                    (
                        np.zeros(len(pk), dtype=np.int8),
                        np.ones(len(pk), dtype=np.int8),
                    )
                ),
                # vectors ride as float64 BYTES (plain object column):
                # ndarray-valued columns become TensorArray extension
                # blocks that refuse to concat with the placeholder rows
                "vec": [b""] * (2 * len(pk)),
                "__bucket": (vid % N_BUCKETS).astype(np.int32),
            }
        )

    def vec_rows(t: pa.Table) -> pd.DataFrame:
        ids, m = _srp_aug(t)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        return pd.DataFrame(
            {
                "vid": ids,
                "pkey": np.full(len(ids), -1, dtype=np.int64),
                "side": np.full(len(ids), -1, dtype=np.int8),
                "vec": [row.tobytes() for row in mn],
                "__bucket": (ids % N_BUCKETS).astype(np.int32),
            }
        )

    def _empty_attach() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pkey": pd.Series([], dtype="int64"),
                "side": pd.Series([], dtype="int8"),
                "vec": pd.Series([], dtype="object"),
                "__bucket": pd.Series([], dtype="int32"),
            }
        )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "side" not in df.columns:
            return _empty_attach()
        is_vec = df["side"].to_numpy() < 0
        vtab = df[is_vec]
        ptab = df[~is_vec]
        if len(ptab) == 0:
            return _empty_attach()
        vid = vtab["vid"].to_numpy(dtype=np.int64)
        o = np.argsort(vid)
        vid = vid[o]
        vecs = vtab["vec"].to_numpy()[o]
        idx = np.searchsorted(vid, ptab["vid"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "pkey": ptab["pkey"].to_numpy(dtype=np.int64),
                "side": ptab["side"].to_numpy(),
                "vec": vecs[idx],
                "__bucket": (
                    ptab["pkey"].to_numpy(dtype=np.int64) % N_BUCKETS
                ).astype(np.int32),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "side" not in df.columns:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["pkey", "side"], kind="stable")
        pk = df["pkey"].to_numpy(dtype=np.int64)[::2]
        m = np.frombuffer(
            b"".join(df["vec"].tolist()), dtype=np.float64
        ).reshape(len(df), -1)
        cos = np.einsum("ij,ij->i", m[::2], m[1::2])
        keep = cos >= threshold
        a = (pk >> SRP_PKEY_SHIFT)[keep]
        b = (pk & ((1 << SRP_PKEY_SHIFT) - 1))[keep]
        out = pd.DataFrame({"id_a": a, "id_b": b})
        return out.sort_values(["id_a", "id_b"], kind="stable")

    joined = (
        cand.map_batches(side_rows, batch_format="pyarrow")
        .union(emb.map_batches(vec_rows, batch_format="pyarrow"))
        .groupby("__bucket")
        .map_groups(attach, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(combine, batch_format="pandas")
    )
    return joined.map_batches(
        lambda df: df[["id_a", "id_b"]]
        if len(df) and "id_a" in df.columns
        else pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
            }
        ),
        batch_format="pandas",
    )


# =====================================================================
# Interleaved span documents (the input_hint payload shape) under the
# SQL-oracle gate
# =====================================================================


def _build_span_column(t: pa.Table) -> pa.Table:
    """Vectorized construction of the input_hint nested column
    (spans: list<struct<kind,text,media_ref,offset:int32>>) from the
    flat documents table.  Synthesis contract (shared with the SQL
    oracle): doc text tiles into 64-char text spans (offset = j*64);
    after text span j where (doc_id*31 + j) % 5 == 0 an opaque media
    span is interleaved (kind = image/audio/video by (doc_id+j)%3,
    media_ref = media://<doc_id>/<j>, offset = end of the text span).

    ZERO-COPY text children: because consecutive span slices tile each
    doc's text exactly (media spans are empty strings at the shared
    boundaries), the span text child is a StringArray whose offsets
    index straight into the batch's EXISTING utf8 values buffer — no
    character is copied.  Guarded by an explicit adjacency + ASCII
    check with a (correct, slow) per-row fallback, so non-ASCII input
    degrades rather than mis-slices (char offsets == byte offsets only
    for ASCII; the testdata corpus is ASCII and n_chars == len(text)).
    """
    from .schemas import SPAN_STRUCT

    if t.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "spans": pa.array([], pa.list_(SPAN_STRUCT)),
            }
        )
    doc = t["doc_id"].to_numpy().astype(np.int64)
    n = t["n_chars"].to_numpy().astype(np.int64)
    col = t["text"]
    # combine_chunks COPIES even for one chunk; chunk(0) shares buffers
    arr = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    voff = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)

    k = (n + 63) // 64  # text spans per doc (0 for empty docs)
    tot_t = int(k.sum())
    rows_t = np.repeat(np.arange(len(n), dtype=np.int64), k)
    j_t = np.arange(tot_t, dtype=np.int64) - np.repeat(np.cumsum(k) - k, k)
    m_mask = (doc[rows_t] * 31 + j_t) % 5 == 0
    rows_m, j_m = rows_t[m_mask], j_t[m_mask]

    rows = np.concatenate((rows_t, rows_m))
    order = np.concatenate((2 * j_t, 2 * j_m + 1))
    is_media = np.zeros(len(rows), dtype=bool)
    is_media[tot_t:] = True
    perm = np.lexsort((order, rows))
    rows, order, is_media = rows[perm], order[perm], is_media[perm]
    j_all = order >> 1

    nrow = n[rows]
    end_off = np.minimum((j_all + 1) * 64, nrow)  # char end of text span j
    off_doc = np.where(is_media, end_off, j_all * 64)  # span offset field
    b0 = voff[rows] + off_doc  # byte start (ASCII: char == byte)
    b1 = voff[rows] + np.where(is_media, off_doc, end_off)

    ascii_ok = bool(
        np.array_equal(voff[1:] - voff[:-1], n)
    )  # byte len == char len for every doc
    adjacent = len(b0) == 0 or bool(np.array_equal(b1[:-1], b0[1:]))
    if ascii_ok and adjacent:
        offs = np.append(b0, b1[-1] if len(b1) else voff[0]).astype(np.int32)
        txt_child = pa.Array.from_buffers(
            pa.string(),
            len(rows),
            [None, pa.py_buffer(offs.tobytes()), arr.buffers()[2]],
        )
    else:  # correct-but-copying fallback (non-ASCII or non-tiling input)
        texts = arr.to_pylist()
        txt_child = pa.array(
            [
                ""
                if med
                else texts[r][j * 64 : min((j + 1) * 64, int(n[r]))]
                for r, j, med in zip(rows, j_all, is_media)
            ],
            pa.string(),
        )

    kind_code = np.where(is_media, (doc[rows] + j_all) % 3 + 1, 0).astype(np.int8)
    kind = pc.take(
        pa.array(["text", "image", "audio", "video"]), pa.array(kind_code)
    )
    ref_all = pc.binary_join_element_wise(
        pa.scalar("media://"),
        pc.cast(pa.array(doc[rows]), pa.string()),
        pa.scalar("/"),
        pc.cast(pa.array(j_all), pa.string()),
        pa.scalar(""),  # separator: plain concatenation
    )
    ref = pc.if_else(pa.array(is_media), ref_all, pa.scalar(""))

    struct = pa.StructArray.from_arrays(
        [kind, txt_child, ref, pa.array(off_doc.astype(np.int32))],
        fields=list(SPAN_STRUCT),
    )
    n_spans_per_doc = k + np.bincount(rows_m, minlength=len(n))
    list_off = np.zeros(len(n) + 1, dtype=np.int32)
    np.cumsum(n_spans_per_doc, out=list_off[1:])
    spans = pa.ListArray.from_arrays(pa.array(list_off), struct)
    return pa.table({"doc_id": t["doc_id"], "spans": spans})


@register(
    "interleaved_span_stats",
    """
    WITH ts AS (
      SELECT d.doc_id, d.n_chars, t.j
      FROM documents d,
           unnest(generate_series(0, (d.n_chars + 63) // 64 - 1)) AS t(j)
    ),
    sp AS (
      SELECT doc_id, 'text' AS kind,
             least(64, n_chars - j*64) AS tlen,
             j*64 AS off
      FROM ts
      UNION ALL
      SELECT doc_id,
             CASE (doc_id + j) % 3
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END,
             0,
             least((j+1)*64, n_chars)
      FROM ts WHERE (doc_id*31 + j) % 5 = 0
    )
    SELECT kind, count(*) AS n_spans,
           CAST(sum(tlen) AS BIGINT) AS text_chars,
           count(DISTINCT doc_id) AS n_docs,
           CAST(max(off) AS BIGINT) AS max_offset
    FROM sp GROUP BY kind
    """,
    doc="The input_hint payload shape itself under the SQL gate: build "
    "the interleaved documents table (doc_id, spans: list<struct<kind, "
    "text, media_ref, offset:int32>> — schemas.SPAN_STRUCT, the exact "
    "north-rule schema) as a REAL nested Arrow column, ship it through "
    "a map_batches boundary (it crosses the object store as "
    "list<struct>), then explode span-side with pc.list_flatten + "
    "pc.list_parent_indices and aggregate per kind.  Construction is "
    "zero-copy: span text children are offset views into the batch's "
    "existing utf8 buffer (media spans are empty strings at the tile "
    "boundaries), so no character is copied building OR exploding.  "
    "The Ray side measures the REAL sliced strings (pc.utf8_length of "
    "the flattened child) while the oracle derives lengths "
    "arithmetically — a genuine cross-check that the nested column "
    "carries the right payload.  Combiner shape: per-batch per-kind "
    "partial rows (n_docs summable because a doc's spans never leave "
    "its row), then a 4-group groupby — text never shuffles.",
)
def interleaved_span_stats(sf_dir: str):
    from ray.data.aggregate import Max, Sum

    def span_stats(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.array([], pa.string()),
                "n_spans": pa.array([], pa.int64()),
                "text_chars": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "max_offset": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        sc = t["spans"]
        spans = sc.chunk(0) if sc.num_chunks == 1 else sc.combine_chunks()
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans)
        df = pd.DataFrame(
            {
                "kind": flat.field("kind").to_pandas(),
                "tlen": pc.utf8_length(flat.field("text"))
                .to_numpy()
                .astype(np.int64),
                "off": flat.field("offset").to_numpy().astype(np.int64),
                "row": parent.to_numpy().astype(np.int64),
            }
        )
        g = df.groupby("kind", as_index=False).agg(
            n_spans=("tlen", "size"),
            text_chars=("tlen", "sum"),
            n_docs=("row", "nunique"),
            max_offset=("off", "max"),
        )
        return pa.table(
            {
                "kind": pa.array(g["kind"], pa.string()),
                "n_spans": pa.array(g["n_spans"].to_numpy(np.int64)),
                "text_chars": pa.array(g["text_chars"].to_numpy(np.int64)),
                "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
                "max_offset": pa.array(g["max_offset"].to_numpy(np.int64)),
            }
        )

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(_build_span_column, batch_format="pyarrow")
        .map_batches(span_stats, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(
            Sum(on="n_spans", alias_name="n_spans"),
            Sum(on="text_chars", alias_name="text_chars"),
            Sum(on="n_docs", alias_name="n_docs"),
            Max(on="max_offset", alias_name="max_offset"),
        )
    )


@register(
    "url_pattern_topk",
    """
    WITH u AS (
      SELECT source || '.example.com' AS host,
             CASE WHEN doc_id % 11 = 0
                  THEN '/tag/' || lang || '-' || CAST(doc_id AS VARCHAR)
                  WHEN doc_id % 3 = 0
                  THEN '/c' || CAST(doc_id % 7 AS VARCHAR) || '/item-'
                       || CAST(doc_id AS VARCHAR) || '?page='
                       || CAST(doc_id % 50 AS VARCHAR)
                  ELSE '/c' || CAST(doc_id % 7 AS VARCHAR) || '/item-'
                       || CAST(doc_id AS VARCHAR)
             END AS path
      FROM documents),
    p AS (
      SELECT host,
             regexp_replace('https://' || host || path, '[0-9]+', 'N', 'g')
               AS pattern,
             count(*) AS n
      FROM u GROUP BY 1, 2),
    r AS (
      SELECT host, pattern, n,
             row_number() OVER (
               PARTITION BY host ORDER BY n DESC, pattern) AS rk
      FROM p)
    SELECT host, pattern, n FROM r WHERE rk <= 3
    """,
    doc="URL template mining / crawler-trap detection (the frontier "
    "analysis a crawl operator runs before raising a host's budget: "
    "generalize every URL by collapsing digit runs to N, count "
    "distinct templates per host, keep the top-K — a host whose "
    "template count explodes or whose one template dominates is a "
    "calendar/session-id trap; reference's media-extension regex "
    "family, crawler.clj link filtering).  URLs synthesized "
    "deterministically from documents (three route shapes: tag pages, "
    "paginated items, plain items).  All-Arrow hot path: "
    "binary_join_element_wise concat -> ONE RE2 "
    "replace_substring_regex per batch -> per-batch (host,pattern) "
    "partial counts, ONE bucketed sum shuffle (counts only, never "
    "URLs), local per-host top-K prune before a final per-host "
    "merge — the shuffle carries <= K rows per host per block.",
)
def url_pattern_topk(sf_dir: str, k: int = 3):
    from .stages.relational import bucketed_agg

    def to_patterns(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"host": pa.array([], pa.string()),
                 "pattern": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        doc = t["doc_id"].to_numpy().astype(np.int64)
        host = pc.binary_join_element_wise(
            t["source"], pa.scalar(".example.com"), pa.scalar("")
        )
        d_s = pc.cast(pa.array(doc), pa.string())
        c7 = pc.cast(pa.array(doc % 7), pa.string())
        p50 = pc.cast(pa.array(doc % 50), pa.string())
        tag = pc.binary_join_element_wise(
            pa.scalar("/tag/"), t["lang"], pa.scalar("-"), d_s, pa.scalar("")
        )
        item = pc.binary_join_element_wise(
            pa.scalar("/c"), c7, pa.scalar("/item-"), d_s, pa.scalar("")
        )
        paged = pc.binary_join_element_wise(
            item, pa.scalar("?page="), p50, pa.scalar("")
        )
        path = pc.if_else(
            pa.array(doc % 11 == 0),
            tag,
            pc.if_else(pa.array(doc % 3 == 0), paged, item),
        )
        url = pc.binary_join_element_wise(
            pa.scalar("https://"), host, path, pa.scalar("")
        )
        pat = pc.replace_substring_regex(url, pattern="[0-9]+", replacement="N")
        part = (
            pa.table({"host": host, "pattern": pat})
            .group_by(["host", "pattern"])
            .aggregate([([], "count_all")])
        )
        return part.rename_columns(["host", "pattern", "c"])

    counts = bucketed_agg(
        _read(sf_dir, "documents", columns=["doc_id", "source", "lang"])
        .map_batches(to_patterns, batch_format="pyarrow"),
        keys=["host", "pattern"],
        sum_cols={"c": "n"},
        key_dtypes={"host": "object", "pattern": "object"},
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "host" not in df.columns:
            return pd.DataFrame(
                {"host": pd.Series([], dtype="object"),
                 "pattern": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}
            )
        df = df.sort_values(
            ["n", "pattern"], ascending=[False, True], kind="stable"
        )
        return df.groupby("host", sort=False).head(k)[["host", "pattern", "n"]]

    return (
        counts.map_batches(local_topk, batch_format="pandas")
        .groupby("host")
        .map_groups(
            lambda g: g.sort_values(
                ["n", "pattern"], ascending=[False, True], kind="stable"
            ).head(k).reset_index(drop=True),
            batch_format="pandas",
        )
        .select_columns(["host", "pattern", "n"])
    )


@register(
    "containment_join",
    """
    WITH base AS (SELECT doc_id, text FROM documents),
    derived AS (
      SELECT doc_id + 10000000 AS doc_id,
             array_to_string(t[1:greatest(3, (3*len(t))//5)], ' ') AS text
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE doc_id % 10 = 0),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM derived),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM u),
    grams AS (
      SELECT DISTINCT doc_id, t[j] || ' ' || t[j+1] AS g
      FROM toks, unnest(generate_series(1, len(t)-1)) AS s(j)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS containee, b.doc_id AS container, count(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT containee, container, i/(1.0*s.sz) AS containment
    FROM inter JOIN sizes s ON containee = s.doc_id
    WHERE i*5 >= 4*s.sz
    """,
    doc="Set-containment similarity join (PPJoin-family prefix filter, "
    "theta=0.8): find documents whose bigram set is >=80% contained in "
    "another document's — the quote-inclusion / excerpt-dedup case that "
    "SYMMETRIC near-dup (minhash/simhash LSH) structurally misses: a "
    "short doc fully quoted inside a 20x longer one has Jaccard ~0.05 "
    "but containment 1.0.  Planted containees: every doc_id%10==0 doc "
    "gets a derived excerpt (first max(3, 3n/5) tokens, id+10M) whose "
    "bigram set is a subset of its source's.  Scale shape: ONE gram "
    "pass builds (doc_id, sorted-unique 63-bit gram hashes, sz); "
    "candidates come from an inverted index over the PREFIX only — "
    "each doc probes its floor(sz/5)+1 smallest hashes (containment "
    ">= 4/5 leaves at most floor(sz/5) grams outside the container, so "
    "one probe gram MUST hit for ANY fixed p-subset: guaranteed-"
    "superset recall; probes are ordered by ASCENDING global df "
    "(PPJoin), with the containment size filter sz_b*5 >= 4*sz_a "
    "applied at pair generation.  DENSE-vocabulary corpora (distinct "
    "grams <= 16,384, where every df is huge and any prefix "
    "regenerates near-all-pairs) auto-dispatch to blocked bitset "
    "tiles (dense_bitset_containment_pairs, BLAS intersection "
    "counts, both directions per tile) — regime equality tested; "
    "sparse corpora keep the prefix-postings path at ~df^2/5 pair "
    "volume instead of df^2) while the index side is full postings; "
    "exact verification intersects the two docs' gram buffers "
    "(dedup.pair_intersection_counts, one vectorized sort) in an "
    "actor-pool stage reading a broadcast id->grams map below "
    "``grams_broadcast_cap`` candidate ids, or via two hash joins that "
    "attach gram buffers to pair rows past it (both regimes "
    "result-equal, forced in tests).  The >=4/5 filter is exact "
    "integer arithmetic (i*5 >= 4*sz) on both sides; the reported "
    "containment is the same int/int division in both engines.",
)
def containment_join(
    sf_dir: str,
    grams_broadcast_cap: int = 200_000,
    forced_regime: Optional[str] = None,
    df_order_cap: int = 50_000_000,
    dense_vocab_limit: int = 16_384,
):
    import ray
    import ray.data as rd

    from .stages.dedup import pair_intersection_counts
    from .stages.relational import bucketed_agg

    OFF = 10_000_000
    M63 = np.uint64(0x7FFFFFFFFFFFFFFF)
    N_BUCKETS = 64

    def with_derived(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        out_ids = list(ids)
        out_txt = list(texts)
        for did, txt in zip(ids, texts):
            if did % 10 == 0:
                tk = txt.split(" ")
                k = max(3, (3 * len(tk)) // 5)
                out_ids.append(int(did) + OFF)
                out_txt.append(" ".join(tk[:k]))
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(out_ids, dtype=np.int64)),
                "text": pa.array(out_txt, type=pa.string()),
            }
        )

    def gram_rows(t: pa.Table) -> pa.Table:
        ids, gbs, szs = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            tk = txt.split(" ")
            if len(tk) < 2:
                continue  # oracle's generate_series(1,0) excludes these
            h = np.unique(
                np.fromiter(
                    (shingles.stable_hash64(tk[i] + " " + tk[i + 1]) for i in range(len(tk) - 1)),
                    dtype=np.uint64,
                    count=len(tk) - 1,
                )
                & M63
            )
            ids.append(did)
            gbs.append(h.tobytes())
            szs.append(len(h))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "gb": pa.array(gbs, type=pa.binary()),
                "sz": pa.array(szs, type=pa.int64()),
            }
        )

    grams = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(with_derived, batch_format="pyarrow")
        .map_batches(gram_rows, batch_format="pyarrow")
        .materialize()
    )

    # PPJoin df-ASCENDING prefix ordering.  A Zipfian gram vocabulary
    # makes hash-ordered prefixes probe HOT grams (df in the hundreds),
    # degenerating candidates toward all-pairs (measured: 12.1M unique
    # pairs from 5,500 docs at sf0.1, 60s of verify).  The pigeonhole
    # guarantee holds for ANY fixed p-subset of a doc's grams, so order
    # every doc by ascending global df (tie: hash) and probe the RAREST
    # grams instead — candidate volume becomes Σ_probe df(g), dominated
    # by df≈1 grams.  The df table is a (gh, df) pair per DISTINCT gram
    # (vocab-bounded, not corpus-bounded); broadcast below df_order_cap,
    # falling back to hash order past it (correct, slower).
    def df_partial(t: pa.Table) -> pa.Table:
        hs = [
            np.frombuffer(gb, dtype=np.uint64).view(np.int64)
            for gb in t["gb"].to_pylist()
        ]
        allh = np.concatenate(hs) if hs else np.zeros(0, dtype=np.int64)
        u, c = np.unique(allh, return_counts=True)
        return pa.table({"gh": pa.array(u), "c": pa.array(c.astype(np.int64))})

    dfp = (
        grams.map_batches(df_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("gh", as_index=False, sort=True)["c"]
        .sum()
    )
    # DENSE-VOCABULARY dispatch (same rule as ngram_jaccard_neardup):
    # the df table IS the vocabulary, so the decision is free here.
    # With ~1k distinct grams every df is in the hundreds and prefix
    # probes regenerate near-all-pairs (measured 12M pairs / 60 s at
    # sf0.1) — blocked bitset tiles compute those intersections at
    # BLAS speed instead.  Sparse vocabularies (real web text) take
    # the PPJoin prefix-postings path below.
    vocab = dfp["gh"].to_numpy(np.int64)
    if (
        forced_regime in (None, "dense")
        and dense_vocab_limit
        and len(vocab) <= dense_vocab_limit
    ):
        from .stages.dedup import dense_bitset_containment_pairs

        meta = grams.select_columns(["doc_id", "sz"]).to_pandas()
        order = np.argsort(meta["doc_id"].to_numpy())
        ids_sorted = meta["doc_id"].to_numpy()[order].astype(np.int64)
        sz_sorted = meta["sz"].to_numpy()[order].astype(np.int64)

        def explode_gh(t: pa.Table) -> pa.Table:
            hs = [
                np.frombuffer(gb, dtype=np.uint64).view(np.int64)
                for gb in t["gb"].to_pylist()
            ]
            n = np.array([len(h) for h in hs], dtype=np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(np.repeat(t["doc_id"].to_numpy(), n)),
                    "gh": pa.array(
                        np.concatenate(hs) if hs else np.zeros(0, dtype=np.int64)
                    ),
                }
            )

        return dense_bitset_containment_pairs(
            grams.map_batches(explode_gh, batch_format="pyarrow"),
            vocab,
            ids_sorted,
            sz_sorted,
        )

    if len(dfp) <= df_order_cap:
        df_ref = ray.put(
            (dfp["gh"].to_numpy(np.int64), dfp["c"].to_numpy(np.int64))
        )
    else:
        df_ref = None

    class Postings:
        def __init__(self):
            self.df = ray.get(df_ref) if df_ref is not None else None

        def __call__(self, t: pa.Table) -> pa.Table:
            ghs, dids, prs, szs = [], [], [], []
            for did, gb, sz in zip(
                t["doc_id"].to_numpy(), t["gb"].to_pylist(), t["sz"].to_numpy()
            ):
                h = np.frombuffer(gb, dtype=np.uint64).view(np.int64)
                p = int(sz) // 5 + 1  # prefix budget at theta = 4/5
                pr = np.zeros(len(h), dtype=np.int8)
                if self.df is not None:
                    dfh = self.df[1][np.searchsorted(self.df[0], h)]
                    pr[np.lexsort((h, dfh))[:p]] = 1  # rarest-first prefix
                else:
                    pr[:p] = 1  # buffers are sorted: the p smallest hashes
                ghs.append(h)
                dids.append(np.full(len(h), did, dtype=np.int64))
                prs.append(pr)
                szs.append(np.full(len(h), sz, dtype=np.int64))
            gh = np.concatenate(ghs) if ghs else np.zeros(0, dtype=np.int64)
            return pa.table(
                {
                    "gh": pa.array(gh),
                    "doc_id": pa.array(
                        np.concatenate(dids) if dids else np.zeros(0, dtype=np.int64)
                    ),
                    "probe": pa.array(
                        np.concatenate(prs) if prs else np.zeros(0, dtype=np.int8)
                    ),
                    "sz": pa.array(
                        np.concatenate(szs) if szs else np.zeros(0, dtype=np.int64)
                    ),
                    "bkt": pa.array((gh % N_BUCKETS).astype(np.int32)),
                }
            )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "gh" not in g.columns:
            return pd.DataFrame({"pk": pd.Series([], dtype="int64")})
        probe = g[g["probe"] == 1][["gh", "doc_id", "sz"]]
        cand = probe.merge(
            g[["gh", "doc_id", "sz"]], on="gh", suffixes=("_a", "_b")
        )
        # containment >= 4/5 needs |B| >= ceil(4|A|/5): size filter
        cand = cand[
            (cand["doc_id_a"] != cand["doc_id_b"])
            & (cand["sz_b"].to_numpy() * 5 >= 4 * cand["sz_a"].to_numpy())
        ]
        pk = np.unique(
            (cand["doc_id_a"].to_numpy() << np.int64(32))
            | cand["doc_id_b"].to_numpy()
        )
        return pd.DataFrame({"pk": pk})

    cand_keys = bucketed_agg(
        grams.map_batches(Postings, batch_format="pyarrow", concurrency=2)
        .groupby("bkt")
        .map_groups(pairs_in_bucket, batch_format="pandas"),
        keys=["pk"],
        sum_cols={"__count__": "c"},
    )

    def unpack(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy() if t.num_rows else np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "containee": pa.array(pk >> np.int64(32)),
                "container": pa.array(pk & np.int64(0xFFFFFFFF)),
            }
        )

    pairs = cand_keys.map_batches(unpack, batch_format="pyarrow").materialize()

    empty = pa.table(
        {
            "containee": pa.array([], type=pa.int64()),
            "container": pa.array([], type=pa.int64()),
            "containment": pa.array([], type=pa.float64()),
        }
    )
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    id_parts = pairs.map_batches(
        lambda t: pa.table(
            {
                "id": np.unique(
                    np.concatenate(
                        [t["containee"].to_numpy(), t["container"].to_numpy()]
                    )
                )
            }
        ),
        batch_format="pyarrow",
    )
    cand_ids = np.unique(id_parts.to_pandas()["id"].to_numpy())

    def verdict(
        ca: np.ndarray, co: np.ndarray, inter: np.ndarray, sa: np.ndarray
    ) -> pa.Table:
        keep = inter * 5 >= 4 * sa  # exact integer theta = 4/5
        return pa.table(
            {
                "containee": pa.array(ca[keep], type=pa.int64()),
                "container": pa.array(co[keep], type=pa.int64()),
                "containment": pa.array(
                    inter[keep] / sa[keep].astype(np.float64), type=pa.float64()
                ),
            }
        )

    regime = forced_regime or (
        "broadcast" if len(cand_ids) <= grams_broadcast_cap else "join"
    )
    if regime == "broadcast":
        idref = ray.put(cand_ids)

        class SemiFilter:
            def __init__(self):
                self.ids = ray.get(idref)

            def __call__(self, t: pa.Table) -> pa.Table:
                keys = t["doc_id"].to_numpy()
                idx = np.clip(np.searchsorted(self.ids, keys), 0, len(self.ids) - 1)
                return t.filter(pa.array(self.ids[idx] == keys))

        cg = grams.map_batches(
            SemiFilter, batch_format="pyarrow", concurrency=2
        ).to_pandas()
        gref = ray.put({i: g for i, g in zip(cg["doc_id"], cg["gb"])})

        class Verify:
            def __init__(self):
                self.gmap = ray.get(gref)

            def __call__(self, t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "containee" not in t.column_names:
                    return empty
                ca = t["containee"].to_numpy()
                co = t["container"].to_numpy()
                inter, sa, _ = pair_intersection_counts(
                    [self.gmap[x] for x in ca], [self.gmap[x] for x in co]
                )
                return verdict(ca, co, inter, sa)

        return pairs.map_batches(
            Verify, batch_format="pyarrow", concurrency=2, batch_size=8192
        )

    # join regime: attach gram buffers to pair rows with two hash joins
    # (no driver-side grams map; same barrier/partition rules as
    # dedup.verify_pairs_joined)
    num_partitions = int(np.clip(pairs.count() // 25_000, 2, 8))
    j1 = pairs.join(
        grams,
        join_type="inner",
        num_partitions=num_partitions,
        on=("containee",),
        right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table(
            {
                "containee": t["containee"],
                "container": t["container"],
                "gb_a": t["gb"],
                "sz_a": t["sz"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    j2 = j1.join(
        grams,
        join_type="inner",
        num_partitions=num_partitions,
        on=("container",),
        right_on=("doc_id",),
    )

    def verify_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "containee" not in t.column_names:
            return empty
        ca = t["containee"].to_numpy()
        co = t["container"].to_numpy()
        inter, sa, _ = pair_intersection_counts(
            t["gb_a"].to_pylist(), t["gb"].to_pylist()
        )
        return verdict(ca, co, inter, sa)

    return j2.map_batches(verify_joined, batch_format="pyarrow")


@register(
    "rrf_fusion",
    """
    WITH q(qid, qtext) AS (
      VALUES (0, 'data batch'), (1, 'sort merge join'), (2, 'filter group key')
    ),
    qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS tok FROM q),
    qtok AS (SELECT DISTINCT tok FROM qt),
    d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    stats AS (SELECT count(*) AS n FROM documents),
    df AS (
      SELECT qtok.tok, count(*) AS df
      FROM qtok JOIN d ON list_contains(d.tk, qtok.tok)
      GROUP BY qtok.tok),
    idf AS (SELECT tok, LEAST((n - df) * 256 // df, 4096) AS idf FROM df, stats),
    tf AS (
      SELECT d.doc_id, qt.qid, qt.tok,
             len(list_filter(d.tk, x -> x = qt.tok)) AS tf, len(d.tk) AS dl
      FROM d, qt),
    sc AS (
      SELECT doc_id, qid,
             sum(idf.idf * tf.tf) * 1024 // (any_value(dl) + 50) AS score
      FROM tf JOIN idf USING (tok) GROUP BY doc_id, qid),
    sparse AS (
      SELECT qid, doc_id,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id) AS rnk
      FROM sc WHERE score > 0 QUALIFY rnk <= 20),
    qv AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 3),
    dense AS (
      SELECT qv.qid, e.vec_id AS doc_id,
             row_number() OVER (PARTITION BY qv.qid
               ORDER BY list_cosine_similarity(e.embedding, qv.embedding) DESC,
                        e.vec_id) AS rnk
      FROM embeddings e, qv WHERE e.vec_id != qv.qid QUALIFY rnk <= 20),
    legs AS (SELECT * FROM sparse UNION ALL SELECT * FROM dense),
    fused AS (
      SELECT qid, doc_id, sum(1048576 // (60 + rnk)) AS rrf
      FROM legs GROUP BY qid, doc_id),
    ranked AS (
      SELECT qid, doc_id, CAST(rrf AS BIGINT) AS rrf,
             row_number() OVER (PARTITION BY qid
                                ORDER BY rrf DESC, doc_id) AS rn
      FROM fused)
    SELECT CAST(qid AS BIGINT) AS qid, doc_id, rrf FROM ranked WHERE rn <= 10
    """,
    doc="Reciprocal-rank fusion of a sparse and a dense retriever "
    "(Cormack et al. RRF, the standard hybrid-retrieval merge for "
    "search-based curation): leg A = integer-quantized BM25 top-20 per "
    "text query (reuses bm25_topk's two-pass broadcast shape: bounded "
    "df pass + per-block top-k prune), leg B = brute-force cosine "
    "top-20 per query embedding (query matrix broadcast once, ONE "
    "batched matmul scores all queries per block, per-query local "
    "top-k prune -> <= legs x queries x k rows ever reach the driver). "
    "Fusion is exact integer arithmetic — rrf = sum over legs of "
    "2^20 // (60 + rank) — so the oracle hash cannot drift; dense "
    "ranks are FP-stable by the same data margin ann_cosine_topk "
    "documents (adjacent cosines >= 3e-4 apart vs <= 2e-7 engine "
    "disagreement).  Queries pair text i with reference embedding "
    "vec_id i (multi-modal query convention); the query's own vector "
    "is excluded from its dense leg.",
)
def rrf_fusion(sf_dir: str, k: int = 10, leg_k: int = 20):
    import heapq

    import ray

    RRF_C, Q = 60, 1 << 20
    sparse = bm25_topk(sf_dir, k=leg_k).to_pandas()
    # bm25_topk emits rows rank-ordered (score desc, doc_id) within qid
    sparse["rnk"] = sparse.groupby("qid").cumcount() + 1

    qe = pq.read_table(
        _pq(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 3)],
    )
    q_ids = qe["vec_id"].to_numpy()
    qm = np.array(qe["embedding"].to_pylist(), dtype=np.float64)
    qm = qm[np.argsort(q_ids)]
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    qref = ray.put(qm)
    n_q = len(q_ids)

    class DenseScore:
        def __init__(self):
            self.qm = ray.get(qref)  # (n_q, d) normalized

        def __call__(self, t: pa.Table) -> pa.Table:
            vids = t["vec_id"].to_numpy()
            m = list_col_to_matrix(t["embedding"])
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            cos = mn @ self.qm.T  # (n, n_q): one matmul for all queries
            out_q, out_d, out_c = [], [], []
            for qi in range(self.qm.shape[0]):
                mask = vids != qi  # query's own vector excluded
                c, v = cos[mask, qi], vids[mask]
                kk = min(leg_k, len(c))
                if kk == 0:
                    continue
                top = np.argpartition(-c, kk - 1)[:kk]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_d.append(v[top])
                out_c.append(c[top])
            if not out_q:
                return pa.table(
                    {"qid": pa.array([], type=pa.int64()),
                     "doc_id": pa.array([], type=pa.int64()),
                     "cos": pa.array([], type=pa.float64())}
                )
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_q)),
                    "doc_id": pa.array(np.concatenate(out_d)),
                    "cos": pa.array(np.concatenate(out_c)),
                }
            )

    cand = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(DenseScore, batch_format="pyarrow", concurrency=2)
        .take_all()
    )  # <= n_q * leg_k rows per block
    dense_rows = []
    for qi in range(n_q):
        rows_q = [(r["cos"], r["doc_id"]) for r in cand if r["qid"] == qi]
        best = heapq.nsmallest(leg_k, rows_q, key=lambda cv: (-cv[0], cv[1]))
        for rnk, (_, d) in enumerate(best, start=1):
            dense_rows.append((qi, int(d), rnk))
    dense = pd.DataFrame(dense_rows, columns=["qid", "doc_id", "rnk"])

    legs = pd.concat(
        [sparse[["qid", "doc_id", "rnk"]], dense], ignore_index=True
    )
    legs["part"] = Q // (RRF_C + legs["rnk"].to_numpy())
    fused = legs.groupby(["qid", "doc_id"], as_index=False)["part"].sum()
    fused = fused.rename(columns={"part": "rrf"})
    fused = fused.sort_values(
        ["qid", "rrf", "doc_id"], ascending=[True, False, True], kind="stable"
    )
    out = fused.groupby("qid", sort=False).head(k).reset_index(drop=True)
    out["qid"] = out["qid"].astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    out["rrf"] = out["rrf"].astype("int64")
    return out[["qid", "doc_id", "rrf"]]


@register(
    "anchor_text_agg",
    """
    WITH n AS (SELECT count(*) AS c FROM documents),
    d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    l AS (
      SELECT (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target,
             tk[1 + (d.doc_id + j*13) % len(tk)] AS term
      FROM d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)),
    cnt AS (SELECT target, term, count(*) AS cnt FROM l GROUP BY 1, 2),
    r AS (
      SELECT target, term, cnt,
             row_number() OVER (PARTITION BY target
                                ORDER BY cnt DESC, term) AS rk
      FROM cnt)
    SELECT target, term, cnt FROM r WHERE rk <= 3
    """,
    doc="Anchor-text aggregation per link target (the classic web-corpus "
    "enrichment: the terms OTHER pages use to link to a URL describe it "
    "better than its own body — reference's anchor-tags + "
    "tokenize-anchor-url family, dom.clj / rank.clj): explode each "
    "doc's outlinks over the shared deterministic edge convention "
    "(_LINK_SQL_CTE), anchor term = a position-hashed token of the "
    "SOURCE doc, then per-target top-3 terms by (count desc, term).  "
    "Scale shape: per-batch (target, term) partial counts combine "
    "BEFORE the shuffle; ONE bucketed sum on hash(target, term) "
    "(counts only — anchor strings are bounded, bodies never move); "
    "then a SECOND coarse shuffle on target%32 buckets co-locates each "
    "target's term rows for one vectorized per-bucket sort+head — no "
    "per-target Ray group overhead at web-graph target cardinality.",
)
def anchor_text_agg(sf_dir: str, k: int = 3):
    from .stages.relational import bucketed_agg

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode_terms(t: pa.Table) -> pa.Table:
        tgts, terms = [], []
        for did, txt in zip(t["doc_id"].to_numpy(), t["text"].to_pylist()):
            tk = txt.split(" ")
            nt = len(tk)
            nl = int(did) % 5 + 3
            j = np.arange(nl, dtype=np.int64)
            tg = (int(did) * 131 + j * 37 + j * j * 11 + 7) % n_docs
            pos = (int(did) + j * 13) % nt
            tgts.append(tg)
            terms.extend(tk[p] for p in pos)
        tgt = np.concatenate(tgts) if tgts else np.zeros(0, dtype=np.int64)
        part = (
            pa.table(
                {"target": pa.array(tgt), "term": pa.array(terms, type=pa.string())}
            )
            .group_by(["target", "term"])
            .aggregate([([], "count_all")])
        )
        return part.rename_columns(["target", "term", "c"])

    counts = bucketed_agg(
        _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
            explode_terms, batch_format="pyarrow"
        ),
        keys=["target", "term"],
        sum_cols={"c": "cnt"},
        key_dtypes={"target": "int64", "term": "object"},
    )

    def add_tbkt(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "target" not in df.columns:
            return pd.DataFrame(
                {"target": pd.Series([], dtype="int64"),
                 "term": pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64"),
                 "tb": pd.Series([], dtype="int32")}
            )
        df = df.copy()
        df["tb"] = (df["target"].to_numpy() % 32).astype("int32")
        return df

    def topk_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "target" not in g.columns:
            return pd.DataFrame(
                {"target": pd.Series([], dtype="int64"),
                 "term": pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(
            ["target", "cnt", "term"], ascending=[True, False, True], kind="stable"
        )
        return g.groupby("target", sort=False).head(k)[["target", "term", "cnt"]]

    return (
        counts.map_batches(add_tbkt, batch_format="pandas")
        .groupby("tb")
        .map_groups(topk_in_bucket, batch_format="pandas")
        .select_columns(["target", "term", "cnt"])
    )


@register(
    "image_text_pairs",
    """
    WITH ts AS (
      SELECT d.doc_id, d.n_chars, d.text, t.j
      FROM documents d,
           unnest(generate_series(0, (d.n_chars + 63) // 64 - 1)) AS t(j)
      WHERE (d.doc_id * 31 + t.j) % 5 = 0)
    SELECT doc_id,
           CASE (doc_id + j) % 3
             WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS kind,
           'media://' || CAST(doc_id AS VARCHAR) || '/'
             || CAST(j AS VARCHAR) AS media_ref,
           CAST(least((j + 1) * 64, n_chars) AS BIGINT) AS media_offset,
           substr(text, j * 64 + 1, least(64, n_chars - j * 64)) AS caption,
           CAST(least(64, n_chars - j * 64) AS BIGINT) AS caption_chars
    FROM ts
    """,
    doc="CLIP/LAION-style media-caption pair extraction from "
    "interleaved span documents (the multimodal contrastive-pretraining "
    "data operator: every media span pairs with its nearest PRECEDING "
    "text span — the alt-text/caption-before convention of MMC4 and "
    "OBELICS pair mining).  The Ray side works on the REAL nested "
    "input_hint column (spans: list<struct<kind,text,media_ref,"
    "offset>>, built zero-copy by _build_span_column and shipped "
    "through a map_batches boundary): flatten + list_parent_indices, "
    "then a vectorized last-preceding-text scan — "
    "np.maximum.accumulate over text positions, validated against the "
    "parent id so a media span at a document head can never steal the "
    "previous document's tail caption.  Captions are the REAL sliced "
    "strings carried by the span column (views into the original utf8 "
    "buffer), while the oracle re-derives them with substr() — a "
    "genuine cross-check that the nested payload carries the right "
    "bytes.  Scale shape: pairing is per-document-local, so the whole "
    "operator is ONE streamed map_batches chain with NO shuffle; "
    "output rows = media spans only.",
)
def image_text_pairs(sf_dir: str):
    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "kind": pa.array([], pa.string()),
                "media_ref": pa.array([], pa.string()),
                "media_offset": pa.array([], pa.int64()),
                "caption": pa.array([], pa.string()),
                "caption_chars": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        sc = t["spans"]
        spans = sc.chunk(0) if sc.num_chunks == 1 else sc.combine_chunks()
        flat = spans.flatten()
        if len(flat) == 0:
            return empty
        parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
        kind = flat.field("kind")
        is_media = pc.not_equal(kind, "text").to_numpy(zero_copy_only=False)
        pos = np.arange(len(parent), dtype=np.int64)
        prev_text = np.maximum.accumulate(np.where(is_media, -1, pos))
        sel = is_media & (prev_text >= 0)
        midx = pos[sel]
        cidx = prev_text[sel]
        same_doc = parent[midx] == parent[cidx]
        midx, cidx = midx[same_doc], cidx[same_doc]
        mi, ci = pa.array(midx), pa.array(cidx)
        caption = flat.field("text").take(ci)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(parent[midx])),
                "kind": kind.take(mi),
                "media_ref": flat.field("media_ref").take(mi),
                "media_offset": pc.cast(flat.field("offset").take(mi), pa.int64()),
                "caption": caption,
                "caption_chars": pc.cast(pc.utf8_length(caption), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(_build_span_column, batch_format="pyarrow")
        .map_batches(pairs, batch_format="pyarrow")
    )


@register(
    "interleaved_doc_filter",
    """
    WITH m AS (
      SELECT d.doc_id, d.n_chars,
             count(*) FILTER ((d.doc_id * 31 + t.j) % 5 = 0) AS n_media,
             count(*) FILTER ((d.doc_id * 31 + t.j) % 5 = 0
                              AND (d.doc_id + t.j) % 3 = 0) AS n_images
      FROM documents d,
           unnest(generate_series(0, (d.n_chars + 63) // 64 - 1)) AS t(j)
      GROUP BY 1, 2)
    SELECT doc_id, CAST(n_images AS BIGINT) AS n_images,
           CAST(n_media AS BIGINT) AS n_media,
           n_chars AS text_chars
    FROM m
    WHERE n_images >= 1 AND n_media <= 8 AND n_chars >= 96 * n_media
    """,
    doc="OBELICS/MMC4-style interleaved-document filtering (the "
    "multimodal corpus-curation gate: drop documents with no images, "
    "media-stuffed documents, and documents whose text is too thin to "
    "ground their media — keep iff n_images >= 1 AND n_media <= 8 AND "
    "text_chars >= 96 * n_media, the ratio test as an integer "
    "cross-multiplication, never a float).  The Ray side measures the "
    "REAL nested span column: per-batch flatten + list_parent_indices, "
    "np.bincount per parent for media/image counts, and text_chars as "
    "the sum of pc.utf8_length over the actual text-span slices (the "
    "oracle derives the same number arithmetically from n_chars — the "
    "tiling invariant is what makes them agree).  Per-document-local "
    "throughout: ONE streamed map_batches chain, NO shuffle; the "
    "filter drops rows before they ever reach the output stream.",
)
def interleaved_doc_filter(
    sf_dir: str, max_media: int = 8, min_chars_per_media: int = 96
):
    def doc_filter(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_images": pa.array([], pa.int64()),
                "n_media": pa.array([], pa.int64()),
                "text_chars": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        sc = t["spans"]
        spans = sc.chunk(0) if sc.num_chunks == 1 else sc.combine_chunks()
        flat = spans.flatten()
        nrows = t.num_rows
        parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
        kind = flat.field("kind")
        is_media = pc.not_equal(kind, "text").to_numpy(zero_copy_only=False)
        is_image = pc.equal(kind, "image").to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(flat.field("text")).to_numpy().astype(np.int64)
        n_media = np.bincount(parent[is_media], minlength=nrows)
        n_images = np.bincount(parent[is_image], minlength=nrows)
        text_chars = np.bincount(parent, weights=tlen, minlength=nrows).astype(
            np.int64
        )
        keep = (
            (n_images >= 1)
            & (n_media <= max_media)
            & (text_chars >= min_chars_per_media * n_media)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "n_images": pa.array(n_images[keep]),
                "n_media": pa.array(n_media[keep]),
                "text_chars": pa.array(text_chars[keep]),
            }
        )

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(_build_span_column, batch_format="pyarrow")
        .map_batches(doc_filter, batch_format="pyarrow")
    )


@register(
    "interleaved_serialize",
    """
    WITH sp AS (
      SELECT d.doc_id, t.j * 2 AS ord,
             substr(d.text, t.j * 64 + 1,
                    least(64, d.n_chars - t.j * 64)) AS seg
      FROM documents d,
           unnest(generate_series(0, (d.n_chars + 63) // 64 - 1)) AS t(j)
      UNION ALL
      SELECT d.doc_id, t.j * 2 + 1,
             '<' || CASE (d.doc_id + t.j) % 3
                      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
                    END || '>'
      FROM documents d,
           unnest(generate_series(0, (d.n_chars + 63) // 64 - 1)) AS t(j)
      WHERE (d.doc_id * 31 + t.j) % 5 = 0)
    SELECT doc_id,
           string_agg(seg, '' ORDER BY ord) AS train_text,
           CAST(sum(CASE WHEN ord % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sentinels,
           CAST(sum(length(seg)) AS BIGINT) AS train_chars
    FROM sp GROUP BY doc_id
    """,
    doc="Interleaved-document serialization to a training sequence "
    "(the OBELICS/MMC4 -> VLM-pretraining step: render each "
    "interleaved document as one string with media spans replaced by "
    "their sentinel token <image>/<audio>/<video>, preserving span "
    "order).  The Ray side renders from the REAL nested span column: "
    "flatten + list_parent_indices, sentinel substitution via ONE "
    "vectorized binary_join on the media subset, then an in-order "
    "per-document join (spans are stored in document order, so the "
    "concat is a grouped ''.join over an already-sorted stream — no "
    "sort, no shuffle, per-document-local).  The oracle rebuilds the "
    "same strings with substr + string_agg ORDER BY span order; "
    "comparing the full serialized text pins both the span ORDER and "
    "every payload byte carried by the nested column.",
)
def interleaved_serialize(sf_dir: str):
    def serialize(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "train_text": pa.array([], pa.string()),
                "n_sentinels": pa.array([], pa.int64()),
                "train_chars": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        sc = t["spans"]
        spans = sc.chunk(0) if sc.num_chunks == 1 else sc.combine_chunks()
        flat = spans.flatten()
        if len(flat) == 0:
            return empty
        parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
        kind = flat.field("kind")
        is_media = pc.not_equal(kind, "text").to_numpy(zero_copy_only=False)
        sentinel = pc.binary_join_element_wise(
            pa.scalar("<"), kind, pa.scalar(">"), pa.scalar("")
        )
        piece = pc.if_else(pa.array(is_media), sentinel, flat.field("text"))
        ser = pd.Series(piece.to_pandas().to_numpy(), copy=False)
        grouped = ser.groupby(parent, sort=True).agg("".join)
        docs_idx = grouped.index.to_numpy()
        n_sent = np.bincount(parent[is_media], minlength=t.num_rows)[docs_idx]
        train_text = pa.array(grouped.to_numpy(), pa.string())
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(docs_idx)),
                "train_text": train_text,
                "n_sentinels": pa.array(n_sent.astype(np.int64)),
                "train_chars": pc.cast(pc.utf8_length(train_text), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(_build_span_column, batch_format="pyarrow")
        .map_batches(serialize, batch_format="pyarrow")
    )


@register(
    "boilerplate_removal",
    """
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
    segs AS (SELECT doc_id, source,
                    unnest(range(CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS si, ws
             FROM w),
    s2 AS (SELECT doc_id, source, si,
                  array_to_string(ws[si * 10 + 1 : si * 10 + 10], ' ') AS seg
           FROM segs),
    inc AS (SELECT source, md5(seg) AS h, count(DISTINCT doc_id) AS nd
            FROM s2 GROUP BY 1, 2),
    m AS (SELECT s2.doc_id, s2.source, s2.si, s2.seg, inc.nd
          FROM s2 JOIN inc ON s2.source = inc.source AND md5(s2.seg) = inc.h)
    SELECT doc_id, source, count(*) AS n_segs,
           CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           coalesce(string_agg(CASE WHEN nd < 2 THEN seg END,
                               ' ' ORDER BY si), '') AS new_text
    FROM m GROUP BY doc_id, source
    """,
    doc="Per-source boilerplate removal (the RefinedWeb/trafilatura "
    "corpus-level template scrub, and the corpus-text analog of the "
    "reference's template-removal incidence rule, crawler.clj "
    "template blacklist at >=5 page incidence — stages/template.py "
    "implements it for xpaths; this operator applies the same "
    "incidence semantics to text): a 10-token segment that occurs in "
    ">= min_docs DISTINCT documents of the SAME source is boilerplate "
    "(header/footer/nav chrome) and is removed from EVERY document of "
    "that source — unlike segment_dedup's first-wins, even the first "
    "occurrence dies.  Distributed shape: (1) one scan explodes "
    "(doc_id, source, md5-128 as two int64) — segment TEXT never "
    "enters any shuffle; per-batch partial = drop within-doc repeats "
    "then count distinct docs per (source, hash) (exact because a "
    "document lives wholly inside one batch); (2) ONE bucketed sum "
    "shuffle of count rows; (3) keys with nd >= min_docs form the "
    "boilerplate set — sparse (bounded by per-source chrome volume, "
    "not corpus size), broadcast once as per-source sorted (h1,h2) "
    "arrays; a second scan re-hashes locally and reassembles surviving "
    "segments in order.  Past boiler_broadcast_cap keys the join "
    "regime fires: re-explode, inner hash-join on (source,h1,h2), "
    "pack gone-si lists per affected doc, right-outer join onto "
    "documents (forced-regime equality test).",
)
def boilerplate_removal(
    sf_dir: str, min_docs: int = 2, boiler_broadcast_cap: int = 10_000_000
):
    import hashlib
    import math

    import ray

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def explode(t: pa.Table) -> pd.DataFrame:
        out_d, out_s, out_si, out_h1, out_h2 = [], [], [], [], []
        for did, src, txt in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(), t["text"].to_pylist()
        ):
            ws = txt.split(" ")
            for si in range(math.ceil(len(ws) / 10)):
                seg = " ".join(ws[si * 10 : si * 10 + 10])
                dg = hashlib.md5(seg.encode()).digest()
                out_d.append(did)
                out_s.append(src)
                out_si.append(si)
                out_h1.append(int.from_bytes(dg[:8], "little") - (1 << 63))
                out_h2.append(int.from_bytes(dg[8:], "little") - (1 << 63))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "source": pd.Series(out_s, dtype="object"),
                "si": pd.Series(out_si, dtype="int64"),
                "h1": pd.Series(out_h1, dtype="int64"),
                "h2": pd.Series(out_h2, dtype="int64"),
            }
        )

    _KEYCOLS = ("source", "h1", "h2")

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame(
                {"source": pd.Series([], dtype="object"),
                 "h1": pd.Series([], dtype="int64"),
                 "h2": pd.Series([], dtype="int64"),
                 "nd": pd.Series([], dtype="int64"),
                 "__bucket": pd.Series([], dtype="int32")}
            )
        u = df.drop_duplicates(["doc_id", "h1", "h2"])
        g = u.groupby(list(_KEYCOLS), as_index=False, sort=False).size()
        g = g.rename(columns={"size": "nd"})
        g["__bucket"] = (g["h1"].to_numpy() % 64).astype("int32")
        return g

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {"source": pd.Series([], dtype="object"),
                 "h1": pd.Series([], dtype="int64"),
                 "h2": pd.Series([], dtype="int64"),
                 "nd": pd.Series([], dtype="int64")}
            )
        out = g.groupby(list(_KEYCOLS), as_index=False, sort=False)["nd"].sum()
        return out[out["nd"].to_numpy() >= min_docs][list(_KEYCOLS) + ["nd"]]

    boiler_ds = (
        docs.map_batches(explode, batch_format="pyarrow")
        .map_batches(partial_counts, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(sum_bucket, batch_format="pandas")
        .materialize()
    )
    if boiler_ds.count() > boiler_broadcast_cap:
        return _boilerplate_join_regime(docs, boiler_ds)
    bl = boiler_ds.to_pandas()
    if "source" not in bl.columns:  # zero-row datasets lose schema
        bl = pd.DataFrame(
            {"source": pd.Series([], dtype="object"),
             "h1": pd.Series([], dtype="int64"),
             "h2": pd.Series([], dtype="int64")}
        )
    per_src: dict[str, np.ndarray] = {}
    kdt = np.dtype([("a", "<i8"), ("b", "<i8")])
    for src, g in bl.groupby("source", sort=False):
        rec = np.empty(len(g), dtype=kdt)
        rec["a"] = g["h1"].to_numpy()
        rec["b"] = g["h2"].to_numpy()
        per_src[src] = np.sort(rec)
    bref = ray.put(per_src)

    def rebuild(t: pa.Table) -> pa.Table:
        table = ray.get(bref)
        out = {"doc_id": [], "source": [], "n_segs": [], "n_removed": [],
               "new_text": []}
        probe = np.empty(1, dtype=kdt)
        for did, src, txt in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(), t["text"].to_pylist()
        ):
            ws = txt.split(" ")
            nseg = math.ceil(len(ws) / 10)
            arr = table.get(src)
            kept, n_rm = [], 0
            for si in range(nseg):
                seg = " ".join(ws[si * 10 : si * 10 + 10])
                gone = False
                if arr is not None and len(arr):
                    dg = hashlib.md5(seg.encode()).digest()
                    probe["a"] = int.from_bytes(dg[:8], "little") - (1 << 63)
                    probe["b"] = int.from_bytes(dg[8:], "little") - (1 << 63)
                    p = int(np.searchsorted(arr, probe[0]))
                    gone = p < len(arr) and arr[p] == probe[0]
                if gone:
                    n_rm += 1
                else:
                    kept.append(seg)
            out["doc_id"].append(did)
            out["source"].append(src)
            out["n_segs"].append(nseg)
            out["n_removed"].append(n_rm)
            out["new_text"].append(" ".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "source": pa.array(out["source"], type=pa.string()),
                "n_segs": pa.array(out["n_segs"], type=pa.int64()),
                "n_removed": pa.array(out["n_removed"], type=pa.int64()),
                "new_text": pa.array(out["new_text"], type=pa.string()),
            }
        )

    return docs.map_batches(rebuild, batch_format="pyarrow")


def _boilerplate_join_regime(docs, boiler_ds):
    """Past-broadcast-cap regime for boilerplate_removal: re-explode
    the corpus to (doc_id, si, source, h1, h2) key rows, inner
    hash-join against the boilerplate key set on (source, h1, h2),
    pack the gone si-list per AFFECTED doc (bounded by boilerplate
    volume), and right-outer join onto documents — the same join
    orientation rules as _segment_dedup_join_regime."""
    import hashlib
    import math

    def explode_keys(t: pa.Table) -> pd.DataFrame:
        out_d, out_s, out_si, out_h1, out_h2 = [], [], [], [], []
        for did, src, txt in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(), t["text"].to_pylist()
        ):
            ws = txt.split(" ")
            for si in range(math.ceil(len(ws) / 10)):
                seg = " ".join(ws[si * 10 : si * 10 + 10])
                dg = hashlib.md5(seg.encode()).digest()
                out_d.append(did)
                out_s.append(src)
                out_si.append(si)
                out_h1.append(int.from_bytes(dg[:8], "little") - (1 << 63))
                out_h2.append(int.from_bytes(dg[8:], "little") - (1 << 63))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(out_d, dtype="int64"),
                "source": pd.Series(out_s, dtype="object"),
                "si": pd.Series(out_si, dtype="int64"),
                "h1": pd.Series(out_h1, dtype="int64"),
                "h2": pd.Series(out_h2, dtype="int64"),
            }
        )

    keys = docs.map_batches(explode_keys, batch_format="pyarrow")
    boiler = boiler_ds.repartition(8).drop_columns(["nd"])
    gone = keys.join(
        boiler, join_type="inner", num_partitions=8, on=("source", "h1", "h2")
    )

    def pack_sis(g: pd.DataFrame) -> pa.Table:
        if g.shape[1] == 0 or len(g) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "gone_sis": pa.array([], type=pa.string())}
            )
        g = g.sort_values(["doc_id", "si"], kind="stable")
        out = g.groupby("doc_id", as_index=False, sort=False).agg(
            gone_sis=("si", lambda s: ",".join(map(str, s)))
        )
        return pa.table(
            {"doc_id": pa.array(out["doc_id"].to_numpy(dtype=np.int64)),
             "gone_sis": pa.array(out["gone_sis"].tolist(), type=pa.string())}
        )

    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            df = pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "si": pd.Series([], dtype="int64")}
            )
        df = df.copy()
        df["__db"] = (df["doc_id"].to_numpy() % 64).astype("int32")
        return df

    packed = (
        gone.select_columns(["doc_id", "si"])
        .map_batches(rebucket, batch_format="pandas")
        .groupby("__db")
        .map_groups(pack_sis, batch_format="pandas")
        .repartition(8)
    )
    joined = packed.join(
        docs, join_type="right_outer", num_partitions=8, on=("doc_id",)
    )

    def rebuild_joined(t: pa.Table) -> pa.Table:
        out = {"doc_id": [], "source": [], "n_segs": [], "n_removed": [],
               "new_text": []}
        for did, src, txt, sis in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(),
            t["text"].to_pylist(), t["gone_sis"].to_pylist(),
        ):
            ws = txt.split(" ")
            nseg = math.ceil(len(ws) / 10)
            gone_set = set(int(x) for x in sis.split(",")) if sis else set()
            kept = [
                " ".join(ws[si * 10 : si * 10 + 10])
                for si in range(nseg)
                if si not in gone_set
            ]
            out["doc_id"].append(did)
            out["source"].append(src)
            out["n_segs"].append(nseg)
            out["n_removed"].append(len(gone_set))
            out["new_text"].append(" ".join(kept))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "source": pa.array(out["source"], type=pa.string()),
                "n_segs": pa.array(out["n_segs"], type=pa.int64()),
                "n_removed": pa.array(out["n_removed"], type=pa.int64()),
                "new_text": pa.array(out["new_text"], type=pa.string()),
            }
        )

    return joined.map_batches(rebuild_joined, batch_format="pyarrow")


@register(
    "dedup_keep_longest",
    """
    WITH corpus AS (
      SELECT doc_id, text, n_chars FROM documents
      UNION ALL
      SELECT doc_id + 1000000, substr(text, 1, 120), 120
      FROM documents WHERE doc_id % 10 = 0 AND n_chars >= 120),
    g AS (SELECT doc_id, n_chars, md5(substr(text, 1, 100)) AS h
          FROM corpus),
    r AS (SELECT doc_id, n_chars, h,
                 row_number() OVER (PARTITION BY h
                                    ORDER BY n_chars DESC, doc_id) AS rn,
                 count(*) OVER (PARTITION BY h) AS n_dups
          FROM g)
    SELECT doc_id, n_chars, CAST(n_dups AS BIGINT) AS n_dups
    FROM r WHERE rn = 1
    """,
    doc="Quality-aware dedup with the Dolma/Pile keep-LONGEST rule "
    "(representative selection: group same-article copies by a PREFIX "
    "key — md5 of the first 100 chars, the same-URL/different-clipping "
    "convention — and within each group keep the doc with max n_chars, "
    "tie-break min doc_id; a full-text key would make 'longest' "
    "vacuous since exact copies share length).  Clipped variants are "
    "synthesized deterministically (every 10th doc with >= 120 chars "
    "contributes a 120-char clip at doc_id + 1e6), so every variant "
    "group demonstrably collapses to the FULL original.  Distributed "
    "shape: per-batch partial argmax — each batch emits AT MOST ONE "
    "(candidate winner, partial count) row per md5-128 key it saw, so "
    "the shuffle carries winners and counts, never text; ONE bucketed "
    "merge re-runs the same argmax over partials (argmax is "
    "associative with the (n_chars desc, doc_id asc) total order) and "
    "sums the counts.  The md5-128 rides as two int64 columns, same "
    "convention as segment_dedup.",
)
def dedup_keep_longest(sf_dir: str):
    import hashlib

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = ("h1", "h2", "doc_id", "n_chars", "nd", "__bucket")
        if t.num_rows == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int32" if c == "__bucket" else "int64")
                 for c in cols}
            )
        ids, lens, texts = [], [], []
        for did, nch, txt in zip(
            t["doc_id"].to_pylist(), t["n_chars"].to_pylist(), t["text"].to_pylist()
        ):
            ids.append(did)
            lens.append(nch)
            texts.append(txt)
            if did % 10 == 0 and nch >= 120:  # the synthesized clip
                ids.append(did + 1_000_000)
                lens.append(120)
                texts.append(txt[:120])
        h1 = np.empty(len(ids), dtype=np.int64)
        h2 = np.empty(len(ids), dtype=np.int64)
        for i, txt in enumerate(texts):
            dg = hashlib.md5(txt[:100].encode()).digest()
            h1[i] = int.from_bytes(dg[:8], "little") - (1 << 63)
            h2[i] = int.from_bytes(dg[8:], "little") - (1 << 63)
        df = pd.DataFrame(
            {
                "h1": h1,
                "h2": h2,
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_chars": pd.Series(lens, dtype="int64"),
            }
        )
        df = df.sort_values(
            ["h1", "h2", "n_chars", "doc_id"],
            ascending=[True, True, False, True],
            kind="stable",
        )
        g = df.groupby(["h1", "h2"], as_index=False, sort=False)
        out = g.first()
        out["nd"] = g.size()["size"].to_numpy()
        out["__bucket"] = (out["h1"].to_numpy() % 64).astype("int32")
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("doc_id", "n_chars", "n_dups")
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        g = g.sort_values(
            ["h1", "h2", "n_chars", "doc_id"],
            ascending=[True, True, False, True],
            kind="stable",
        )
        grp = g.groupby(["h1", "h2"], as_index=False, sort=False)
        out = grp.first()
        out["n_dups"] = grp["nd"].sum()["nd"].to_numpy()
        return out[["doc_id", "n_chars", "n_dups"]].astype("int64")

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_bucket, batch_format="pandas")
        .select_columns(["doc_id", "n_chars", "n_dups"])
    )


@register(
    "memorization_scan",
    """
    WITH probes AS (
      SELECT doc_id AS probe_id,
             substr(text, 11, 40) AS probe
      FROM documents WHERE doc_id % 97 = 0 AND n_chars >= 50)
    SELECT p.probe_id,
           CAST(count(*) FILTER (position(p.probe IN d.text) > 0)
                AS BIGINT) AS n_docs_hit,
           CAST(coalesce(min(d.doc_id)
                  FILTER (position(p.probe IN d.text) > 0), -1)
                AS BIGINT) AS first_doc
    FROM probes p, documents d
    GROUP BY p.probe_id
    """,
    doc="Memorization / contamination probe scan (the eval-leak and "
    "copyright audit: given a small set of verbatim probe strings — "
    "eval answers, licensed passages, canary strings — count which "
    "corpus documents contain each, GPT-3-appendix style exact "
    "substring matching).  Probes are drawn deterministically from "
    "the corpus itself (every 97th doc contributes chars 11..50) so "
    "every probe has >= 1 guaranteed hit and exact-duplicate docs "
    "produce cross-hits.  Distributed shape: the probe set is tiny "
    "and BROADCAST once via ray.put; each batch runs ONE vectorized "
    "pc.match_substring per probe (C-level scan, no Python row loop) "
    "and emits per-probe partial (hits, min doc_id) rows — a "
    "fixed-width combiner independent of corpus size; final merge is "
    "a |probes|-row groupby.  An Aho-Corasick automaton is the drop-in "
    "upgrade past ~1k probes (single pass instead of per-probe scans); "
    "at the audit-typical probe count the per-probe kernel wins.",
)
def memorization_scan(sf_dir: str):
    import ray
    from ray.data.aggregate import Min, Sum

    pt = pq.read_table(
        _pq(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"],
        filters=[("n_chars", ">=", 50)],
    )
    mask = pa.array(pt["doc_id"].to_numpy() % 97 == 0)
    pt = pt.filter(mask)
    probe_ids = pt["doc_id"].to_pylist()
    probes = [s[10:50] for s in pt["text"].to_pylist()]
    pref = ray.put((probe_ids, probes))

    class ProbeScan:
        def __init__(self):
            self.ids, self.probes = ray.get(pref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out_pid, out_hits, out_first = [], [], []
            docs = t["doc_id"]
            for pid, probe in zip(self.ids, self.probes):
                hit = pc.match_substring(t["text"], probe)
                n = pc.sum(hit).as_py() or 0
                first = pc.min(docs.filter(hit)).as_py() if n else None
                out_pid.append(pid)
                out_hits.append(int(n))
                out_first.append(first if first is not None else (1 << 62))
            return pa.table(
                {
                    "probe_id": pa.array(out_pid, type=pa.int64()),
                    "hits": pa.array(out_hits, type=pa.int64()),
                    "first": pa.array(out_first, type=pa.int64()),
                }
            )

    agg = (
        _read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(ProbeScan, batch_format="pyarrow", concurrency=2)
        .groupby("probe_id")
        .aggregate(
            Sum("hits", alias_name="n_docs_hit"),
            Min("first", alias_name="first_doc"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        first = t["first_doc"]
        first = pc.if_else(
            pc.equal(first, 1 << 62), pa.scalar(-1, pa.int64()), first
        )
        return pa.table(
            {
                "probe_id": t["probe_id"],
                "n_docs_hit": t["n_docs_hit"],
                "first_doc": first,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


@register(
    "mutual_nn_pairs",
    """
    WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE label % 2 = 0),
    b AS (SELECT vec_id, embedding FROM embeddings WHERE label % 2 = 1),
    ab AS (
      SELECT a.vec_id AS aid, b.vec_id AS bid,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(a.embedding, b.embedding)
                 DESC, b.vec_id) AS rk
      FROM a, b),
    ba AS (
      SELECT a.vec_id AS aid, b.vec_id AS bid,
             row_number() OVER (PARTITION BY b.vec_id
               ORDER BY list_cosine_similarity(a.embedding, b.embedding)
                 DESC, a.vec_id) AS rk
      FROM a, b)
    SELECT ab.aid, ab.bid
    FROM ab JOIN ba ON ab.aid = ba.aid AND ab.bid = ba.bid
    WHERE ab.rk = 1 AND ba.rk = 1
    """,
    doc="Bitext / parallel-corpus mining by MUTUAL nearest neighbors "
    "(the MUSE/CCMatrix alignment rule: a cross-lingual pair (a, b) "
    "is mined iff b is a's top-1 cosine neighbor on the other side "
    "AND a is b's top-1 — mutuality kills the hub problem without "
    "the float-fragile Artetxe margin ratio; ranking ties break by "
    "vec_id).  Sides are label parity (the testdata's two-language "
    "convention).  Distributed shape: the B side is normalized ONCE "
    "and broadcast via ray.put (at two-corpora scale, broadcast the "
    "smaller language and stream the larger; past broadcast size the "
    "IVF-bucketed form of ivfpq_ann_topk is the drop-in); ONE stream "
    "over A computes BOTH directions per batch — a->b top-1 is final "
    "within the batch (all of B is present), b->a accumulates as "
    "per-b (best_cos, best_aid) partials merged by a bucketed argmax "
    "(associative under the (cos desc, aid asc) total order).  Only "
    "int pairs and per-b partials ever shuffle; float64 math and "
    "rank-only output, same FP-stability contract as ann_cosine_topk.",
)
def mutual_nn_pairs(sf_dir: str):
    import ray

    from crawler_ray.stages.ann import list_col_to_matrix

    emb = pq.read_table(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"])
    lab = emb["label"].to_numpy()
    bm = lab % 2 == 1
    b_ids = emb["vec_id"].to_numpy()[bm].astype(np.int64)
    bmat = list_col_to_matrix(emb["embedding"].filter(pa.array(bm)))
    bn = bmat / np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-30)
    bref = ray.put((b_ids, bn))

    class Score:
        def __init__(self):
            self.b_ids, self.bn = ray.get(bref)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            cols = {
                "kind": "int64", "aid": "int64", "bid": "int64",
                "cos": "float64", "__bucket": "int32",
            }
            lab = t["label"].to_numpy()
            am = lab % 2 == 0
            a_ids = t["vec_id"].to_numpy()[am].astype(np.int64)
            if len(a_ids) == 0:
                return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
            amat = list_col_to_matrix(t["embedding"].filter(pa.array(am)))
            an = amat / np.maximum(np.linalg.norm(amat, axis=1, keepdims=True), 1e-30)
            cos = an @ self.bn.T  # |a| x |b|
            # a->b top-1 (FINAL: every b is present in this batch).
            # argmax returns the FIRST max; b_ids ascending == tie by bid
            ab_best = np.argmax(cos, axis=1)
            # b->a per-batch partial argmax
            ba_best = np.argmax(cos, axis=0)
            out = pd.DataFrame(
                {
                    "kind": np.concatenate(
                        (np.zeros(len(a_ids), np.int64), np.ones(len(self.b_ids), np.int64))
                    ),
                    "aid": np.concatenate((a_ids, a_ids[ba_best])),
                    "bid": np.concatenate((self.b_ids[ab_best], self.b_ids)),
                    "cos": np.concatenate(
                        (cos[np.arange(len(a_ids)), ab_best], cos[ba_best, np.arange(len(self.b_ids))])
                    ),
                }
            )
            out["__bucket"] = (out["bid"].to_numpy() % 64).astype("int32")
            return out.astype(cols)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("kind", "aid", "bid")
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        ab = g[g["kind"] == 0][["aid", "bid"]]
        ba = g[g["kind"] == 1].sort_values(
            ["bid", "cos", "aid"], ascending=[True, False, True], kind="stable"
        ).groupby("bid", as_index=False, sort=False).first()[["aid", "bid"]]
        mutual = ab.merge(ba, on=["aid", "bid"], how="inner")
        mutual.insert(0, "kind", np.int64(2))
        return mutual.astype("int64")

    return (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
        .map_batches(Score, batch_format="pyarrow", concurrency=2)
        .groupby("__bucket")
        .map_groups(merge_bucket, batch_format="pandas")
        .select_columns(["aid", "bid"])
    )


@register(
    "cocitation_pairs",
    _LINK_SQL_CTE.replace(
        "SELECT (d.doc_id*131", "SELECT d.doc_id AS src, (d.doc_id*131"
    )
    + """,
    lu AS (SELECT DISTINCT src, target FROM l),
    deg AS (SELECT target FROM lu GROUP BY target HAVING count(*) <= 64),
    p AS (SELECT x.src AS sa, y.src AS sb
          FROM lu x JOIN lu y ON x.target = y.target AND x.src < y.src
          JOIN deg ON deg.target = x.target)
    SELECT sa, sb, count(*) AS shared
    FROM p GROUP BY sa, sb HAVING count(*) >= 2
    """,
    doc="Co-citation similarity over the web link graph (two pages are "
    "related if the SAME pages link to both — the classic "
    "link-structure relatedness signal used for crawl clustering and "
    "seed expansion; reference's link-extraction family feeding "
    "cluster-urls, dom.clj + cluster.clj).  Edges follow the shared "
    "deterministic convention (_LINK_SQL_CTE).  Distributed shape: "
    "(1) explode + per-doc dedup of (src, target) — int pairs only; "
    "(2) ONE shuffle co-locates each target's citers (bucket = "
    "target % 64); hub targets past in-degree 64 are DROPPED "
    "symmetric with the oracle (the standard hub cap: a page cited "
    "by everything relates nothing); (3) per-target pair generation "
    "is fully vectorized (sorted-run arange trick, no Python loop "
    "over pairs) and bounded by cap^2/2 per target; (4) ONE bucketed "
    "sum on (sa, sb) counts with the >= 2 co-citation floor applied "
    "before emit.  Text never appears anywhere — the whole operator "
    "moves int64 triples.",
)
def cocitation_pairs(sf_dir: str, hub_cap: int = 64, min_shared: int = 2):
    from .stages.relational import bucketed_agg

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy()
        k = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, k)
        j = np.arange(len(src)) - np.repeat(np.cumsum(k) - k, k)
        tgt = (src * 131 + j * 37 + j * j * 11 + 7) % n_docs
        packed = np.unique(src * np.int64(n_docs) + tgt)
        src_u, tgt_u = packed // n_docs, packed % n_docs
        return pd.DataFrame(
            {
                "src": pd.Series(src_u, dtype="int64"),
                "target": pd.Series(tgt_u, dtype="int64"),
                "__bucket": pd.Series((tgt_u % 64).astype(np.int32), dtype="int32"),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("sa", "sb", "c")
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        g = g.sort_values(["target", "src"], kind="stable")
        tgt = g["target"].to_numpy()
        src = g["src"].to_numpy()
        # run boundaries per target
        starts = np.flatnonzero(np.r_[True, tgt[1:] != tgt[:-1]])
        lens = np.diff(np.r_[starts, len(tgt)])
        ok = lens <= hub_cap  # hub cap, mirrored in the oracle
        # in-run position p of each row; row pairs with its p predecessors
        pos = np.arange(len(tgt)) - np.repeat(starts, lens)
        keep = np.repeat(ok, lens)
        pos = np.where(keep, pos, 0)
        total = int(pos.sum())
        if total == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        b_idx = np.repeat(np.arange(len(tgt)), pos)
        seq = np.arange(total) - np.repeat(np.cumsum(pos) - pos, pos)
        a_idx = np.repeat(np.repeat(starts, lens), pos) + seq
        df = pd.DataFrame({"sa": src[a_idx], "sb": src[b_idx]})
        out = df.groupby(["sa", "sb"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "c"}).astype("int64")

    pair_counts = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    summed = bucketed_agg(
        pair_counts.map_batches(
            lambda df: df.rename(columns={"c": "n"}), batch_format="pandas"
        ),
        keys=["sa", "sb"],
        sum_cols={"n": "shared"},
        key_dtypes={"sa": "int64", "sb": "int64"},
    )

    def floor_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "shared" not in t.column_names:
            return pa.table(
                {"sa": pa.array([], pa.int64()), "sb": pa.array([], pa.int64()),
                 "shared": pa.array([], pa.int64())}
            )
        t = t.filter(pc.greater_equal(t["shared"], min_shared))
        return t.select(["sa", "sb", "shared"])

    return summed.map_batches(floor_filter, batch_format="pyarrow")


@register(
    "hll_registers",
    """
    WITH h AS (
      SELECT event_type,
             md5_number_lower(CAST(user_id AS VARCHAR)) AS hv
      FROM events),
    r AS (
      SELECT event_type,
             CAST(hv % 64 AS BIGINT) AS bucket,
             59 - length(ltrim(bin(hv // 64), '0')) AS rho
      FROM h)
    SELECT event_type, bucket, CAST(max(rho) AS BIGINT) AS register
    FROM r GROUP BY event_type, bucket
    """,
    doc="HyperLogLog sketch registers for per-group distinct counting "
    "(Flajolet et al.: bucket = low 6 hash bits, register = max over "
    "the group of (leading-zero count of the remaining 58 bits + 1)) "
    "— the mergeable-sketch pattern for COUNT DISTINCT at 100 TB, "
    "where the exact distinct (a full shuffle of every key) is the "
    "thing being avoided; KMV (distinct_kmv) bounds from a sample of "
    "low hashes, HLL gets the same from 64 bytes/group.  The sketch "
    "itself is under the SQL gate: registers are EXACT integers "
    "(md5_number_lower hash both sides; rho via DuckDB's bin() "
    "bit-length idiom), so the oracle pins every register value, not "
    "an estimate.  Distributed shape: per-batch partial max per "
    "(event_type, bucket) — a fixed 64-rows-per-group-per-batch "
    "combiner regardless of corpus size (max is associative); ONE "
    "tiny groupby-max merge.  The cardinality estimate "
    "(alpha_64 * 64^2 / sum 2^-reg) is a driver-side formula over "
    "the returned registers; the relative-error contract is asserted "
    "against the exact distinct in tests.",
)
def hll_registers(sf_dir: str):
    import hashlib

    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"event_type": "object", "bucket": "int64", "register": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        uid = t["user_id"].to_numpy()
        hv = np.empty(len(uid), dtype=np.uint64)
        for i, u in enumerate(uid):
            hv[i] = int.from_bytes(
                hashlib.md5(str(int(u)).encode()).digest()[8:16], "little"
            )
        bucket = (hv % 64).astype(np.int64)
        rest = hv // 64
        # exact bit_length (float log2 is inexact near powers of two):
        # vectorized binary-search over the 6 halving steps
        bl = np.zeros(len(rest), dtype=np.int64)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(shift))
            bl[big] += shift
            v[big] >>= np.uint64(shift)
        bl[rest != 0] += 1  # bit_length = floor(log2)+1
        rho = 59 - bl
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas().to_numpy(),
                "bucket": bucket,
                "register": rho,
            }
        )
        return df.groupby(["event_type", "bucket"], as_index=False, sort=False)[
            "register"
        ].max()

    return (
        _read(sf_dir, "events", columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Max("register", alias_name="register"))
    )


@register(
    "interleaved_data_prep",
    """
    WITH ts AS (
      SELECT d.doc_id, d.n_chars, d.text, t.j
      FROM documents d,
           unnest(generate_series(0, (d.n_chars + 63) // 64 - 1)) AS t(j)),
    agg AS (
      SELECT doc_id, any_value(n_chars) AS n_chars,
             count(*) FILTER ((doc_id * 31 + j) % 5 = 0) AS n_media,
             count(*) FILTER ((doc_id * 31 + j) % 5 = 0
                              AND (doc_id + j) % 3 = 0) AS n_images
      FROM ts GROUP BY doc_id),
    kept AS (
      SELECT doc_id FROM agg
      WHERE n_images >= 1 AND n_media <= 8 AND n_chars >= 96 * n_media),
    sp AS (
      SELECT ts.doc_id, ts.j * 2 AS ord,
             substr(ts.text, ts.j * 64 + 1,
                    least(64, ts.n_chars - ts.j * 64)) AS seg
      FROM ts JOIN kept USING (doc_id)
      UNION ALL
      SELECT ts.doc_id, ts.j * 2 + 1,
             '<' || CASE (ts.doc_id + ts.j) % 3
                      WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
                    END || '>'
      FROM ts JOIN kept USING (doc_id)
      WHERE (ts.doc_id * 31 + ts.j) % 5 = 0),
    ser AS (
      SELECT doc_id, string_agg(seg, '' ORDER BY ord) AS train_text,
             sum(CASE WHEN ord % 2 = 1 THEN 1 ELSE 0 END) AS n_sent,
             sum(length(seg)) AS train_chars
      FROM sp GROUP BY doc_id),
    ded AS (
      SELECT doc_id, n_sent, train_chars,
             min(doc_id) OVER (PARTITION BY md5(substr(train_text, 1, 128)))
               AS fdoc
      FROM ser),
    win AS (
      SELECT doc_id, (train_chars + 3) // 4 + 252 * n_sent AS tok
      FROM ded WHERE doc_id = fdoc),
    s AS (
      SELECT doc_id, tok,
             sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok
               AS cb
      FROM win),
    c AS (SELECT tok, cb, cb // 2048 AS fc, (cb + tok - 1) // 2048 AS lc
          FROM s)
    SELECT (SELECT count(*) FROM documents) AS n_in,
           (SELECT count(*) FROM kept) AS n_kept,
           CAST(count(*) AS BIGINT) AS n_out,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           CAST((max(cb + tok) + 2047) // 2048 AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN fc != lc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddlers
    FROM c
    """,
    doc="END-TO-END multimodal (interleaved) training-data prep — the "
    "VLM-corpus flagship composing this round's interleaved operators "
    "into one streamed pipeline over the input_hint nested schema: "
    "(1) build the spans column (zero-copy _build_span_column); "
    "(2) OBELICS gate per doc (n_images >= 1, n_media <= 8, "
    "text_chars >= 96*n_media, all integer tests); (3) serialize "
    "survivors to training text with <image>/<audio>/<video> "
    "sentinels; (4) cross-corpus first-wins dedup on the HEAD "
    "fingerprint (md5 of the first 128 serialized chars — the "
    "same-article/different-tail key; full-text keys never fire on "
    "real crawls where copies differ in chrome); (5) media-aware "
    "token costing (ceil(chars/4) + 252 tokens per media sentinel, "
    "the fixed vision-token budget convention) and concat-and-chunk "
    "packing at context 2048 via the distributed two-phase prefix "
    "scan (stages/relational.add_prefix_sum).  Stages (1)-(4) are "
    "ONE fused map_batches chain per batch — text never crosses a "
    "shuffle: the dedup moves only (fp128, doc_id, tok) int rows "
    "through a bucketed min merge, and packing moves (doc_id, tok).  "
    "Output is the one-row corpus report: docs in/kept/out, total "
    "tokens, chunks, boundary straddlers.",
)
def interleaved_data_prep(sf_dir: str, ctx: int = 2048, media_tok: int = 252):
    import hashlib

    from crawler_ray.stages.relational import add_prefix_sum

    n_in = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def stage1(t: pa.Table) -> pd.DataFrame:
        cols = {"fp1": "int64", "fp2": "int64", "doc_id": "int64",
                "tok": "int64", "__bucket": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        sc = t["spans"]
        spans = sc.chunk(0) if sc.num_chunks == 1 else sc.combine_chunks()
        flat = spans.flatten()
        if len(flat) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
        kind = flat.field("kind")
        is_media = pc.not_equal(kind, "text").to_numpy(zero_copy_only=False)
        is_image = pc.equal(kind, "image").to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(flat.field("text")).to_numpy().astype(np.int64)
        nrows = t.num_rows
        n_media = np.bincount(parent[is_media], minlength=nrows)
        n_images = np.bincount(parent[is_image], minlength=nrows)
        text_chars = np.bincount(parent, weights=tlen, minlength=nrows).astype(np.int64)
        keep = (n_images >= 1) & (n_media <= 8) & (text_chars >= 96 * n_media)
        keep_span = keep[parent]
        # serialize only the kept docs (sentinels for media spans)
        sentinel = pc.binary_join_element_wise(
            pa.scalar("<"), kind, pa.scalar(">"), pa.scalar("")
        )
        piece = pc.if_else(pa.array(is_media), sentinel, flat.field("text"))
        ser = pd.Series(piece.to_pandas().to_numpy(), copy=False)[keep_span]
        grouped = ser.groupby(parent[keep_span], sort=True).agg("".join)
        docs_idx = grouped.index.to_numpy()
        did = t["doc_id"].to_numpy()[docs_idx]
        # train_chars = text chars + sentinel chars, per kept doc
        sent_len = pc.utf8_length(piece).to_numpy().astype(np.int64)
        train_chars = np.bincount(parent[keep_span], weights=sent_len[keep_span],
                                  minlength=nrows).astype(np.int64)[docs_idx]
        n_sent = n_media[docs_idx]
        tok = (train_chars + 3) // 4 + media_tok * n_sent
        fp1 = np.empty(len(docs_idx), dtype=np.int64)
        fp2 = np.empty(len(docs_idx), dtype=np.int64)
        for i, s in enumerate(grouped.to_numpy()):
            dg = hashlib.md5(s[:128].encode()).digest()
            fp1[i] = int.from_bytes(dg[:8], "little") - (1 << 63)
            fp2[i] = int.from_bytes(dg[8:], "little") - (1 << 63)
        return pd.DataFrame(
            {"fp1": fp1, "fp2": fp2, "doc_id": did, "tok": tok,
             "__bucket": (fp1 % 64).astype(np.int32)}
        )

    def winners_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("doc_id", "tok")
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        g = g.sort_values(["fp1", "fp2", "doc_id"], kind="stable")
        w = g.groupby(["fp1", "fp2"], as_index=False, sort=False).first()
        return w[["doc_id", "tok"]].astype("int64")

    kept_meta = (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(_build_span_column, batch_format="pyarrow")
        .map_batches(stage1, batch_format="pyarrow")
        .materialize()
    )
    n_kept = kept_meta.count()
    winners = (
        kept_meta.groupby("__bucket")
        .map_groups(winners_in_bucket, batch_format="pandas")
    )
    scanned = add_prefix_sum(winners, col="tok", out_col="cb", order_col="doc_id")

    def part_stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()), "tok": pa.array([0], pa.int64()),
                 "end_max": pa.array([0], pa.int64()),
                 "straddlers": pa.array([0], pa.int64())}
            )
        cb = t["cb"].to_numpy()
        tk = t["tok"].to_numpy()
        fc, lc = cb // ctx, (cb + tk - 1) // ctx
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "tok": pa.array([int(tk.sum())], pa.int64()),
                "end_max": pa.array([int((cb + tk).max())], pa.int64()),
                "straddlers": pa.array([int((fc != lc).sum())], pa.int64()),
            }
        )

    sp = scanned.map_batches(
        part_stats, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    return pa.table(
        {
            "n_in": pa.array([n_in], pa.int64()),
            "n_kept": pa.array([n_kept], pa.int64()),
            "n_out": pa.array([int(sp["n"].sum())], pa.int64()),
            "total_tokens": pa.array([int(sp["tok"].sum())], pa.int64()),
            "n_chunks": pa.array([int((sp["end_max"].max() + ctx - 1) // ctx)], pa.int64()),
            "n_straddlers": pa.array([int(sp["straddlers"].sum())], pa.int64()),
        }
    )


@register(
    "graph_random_walks",
    """
    WITH RECURSIVE nn AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM nn) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)),
    lu AS (SELECT DISTINCT src, target FROM l WHERE src <> target),
    adj AS (
      SELECT src, target,
             row_number() OVER (PARTITION BY src ORDER BY target) - 1 AS idx,
             count(*) OVER (PARTITION BY src) AS deg
      FROM lu),
    walks AS (
      SELECT doc_id AS seed, CAST(0 AS BIGINT) AS step, doc_id AS node
      FROM documents WHERE doc_id % 50 = 0
      UNION ALL
      SELECT w.seed, w.step + 1, a.target
      FROM walks w JOIN adj a ON a.src = w.node
       AND a.idx = CAST(md5_number_lower(CAST(w.node * 1000 + w.step
                                              AS VARCHAR)) % a.deg AS BIGINT)
      WHERE w.step < 4)
    SELECT seed, step, node FROM walks
    """,
    doc="Deterministic random-walk corpus generation over the web link "
    "graph (the DeepWalk/node2vec preprocessing step: emit fixed-length "
    "walks per seed node to feed a skip-gram embedder; also the "
    "random-surfer sampling primitive).  Next hop from node v at step "
    "t is the idx-th smallest distinct neighbor with idx = "
    "md5(v*1000 + t) % deg(v) — a seeded hash walk, so the oracle is "
    "a recursive CTE applying the SAME rule (md5_number_lower both "
    "sides), exact to the row.  Distributed shape: the ranked "
    "adjacency (src, target, idx, deg) is built ONCE — explode + "
    "per-doc dedup, one bucketed per-src shuffle that sorts and ranks "
    "neighbors (int64 quads only).  Then per step, TWO REGIMES "
    "(pagerank/bfs pattern): below walk_broadcast_cap unique frontier "
    "nodes, the SORTED frontier broadcasts and the adjacency STREAMS "
    "against it (searchsorted membership + one vectorized hash-match "
    "filter — no shuffle; matched next-hop table, <= |frontier| rows, "
    "returns to the driver and broadcasts back); past the cap the "
    "frontier stays a Dataset and each step is ONE hash join against "
    "the ranked adjacency with the idx filter applied batch-side.  "
    "Regimes are result-equal (forced-regime test).  Walk state is "
    "(seed, node) int pairs — walk text/features never exist here.",
)
def graph_random_walks(
    sf_dir: str,
    n_steps: int = 4,
    seed_mod: int = 50,
    walk_broadcast_cap: int = 50_000_000,
    forced_regime: Optional[str] = None,
):
    import ray
    import ray.data as rd

    from crawler_ray.functions.shingles import md5_hash64

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy()
        k = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, k)
        j = np.arange(len(src)) - np.repeat(np.cumsum(k) - k, k)
        tgt = (src * 131 + j * 37 + j * j * 11 + 7) % n_docs
        keep = src != tgt
        packed = np.unique(src[keep] * np.int64(n_docs) + tgt[keep])
        return pd.DataFrame(
            {
                "src": pd.Series(packed // n_docs, dtype="int64"),
                "target": pd.Series(packed % n_docs, dtype="int64"),
                "__bucket": pd.Series(
                    ((packed // n_docs) % 64).astype(np.int32), dtype="int32"
                ),
            }
        )

    def rank_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("src", "target", "idx", "deg")
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
        g = g.sort_values(["src", "target"], kind="stable")
        src = g["src"].to_numpy()
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        lens = np.diff(np.r_[starts, len(src)])
        idx = np.arange(len(src)) - np.repeat(starts, lens)
        deg = np.repeat(lens, lens)
        return pd.DataFrame(
            {"src": src, "target": g["target"].to_numpy(),
             "idx": idx.astype(np.int64), "deg": deg.astype(np.int64)}
        )

    adj = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(rank_in_bucket, batch_format="pandas")
        # map_groups emits schemaless EMPTY pandas blocks that poison
        # the Arrow hash join; repartition concatenates into typed blocks
        .repartition(8)
        .materialize()
    )

    seeds0 = pq.read_table(_pq(sf_dir, "documents"), columns=["doc_id"])
    sd = seeds0["doc_id"].to_numpy()
    sd = np.sort(sd[sd % seed_mod == 0]).astype(np.int64)
    frontier = rd.from_arrow(
        pa.table({"seed": pa.array(sd), "node": pa.array(sd)})
    )
    out_parts = [pa.table(
        {"seed": pa.array(sd), "step": pa.array(np.zeros(len(sd), np.int64)),
         "node": pa.array(sd)}
    )]
    out_ds_parts = []  # join-regime steps stay Datasets (never collected)

    for step in range(n_steps):
        fdf = None
        regime = forced_regime
        if regime is None:
            regime = "broadcast"  # cap checked on the unique node count
        if regime == "broadcast":
            fdf = frontier.to_pandas()
            fnodes = np.unique(fdf["node"].to_numpy())
            if forced_regime is None and len(fnodes) > walk_broadcast_cap:
                regime = "join"
        if regime == "broadcast":
            fref = ray.put(fnodes)

            class NextHop:
                def __init__(self):
                    self.f = ray.get(fref)

                def __call__(self, t: pa.Table) -> pa.Table:
                    src = t["src"].to_numpy()
                    pos = np.clip(np.searchsorted(self.f, src), 0, len(self.f) - 1)
                    m = (len(self.f) > 0) & (self.f[pos] == src)
                    if not m.any():
                        return pa.table(
                            {"node": pa.array([], pa.int64()),
                             "next": pa.array([], pa.int64())}
                        )
                    src, tgt = src[m], t["target"].to_numpy()[m]
                    idx, deg = t["idx"].to_numpy()[m], t["deg"].to_numpy()[m]
                    want = np.fromiter(
                        (md5_hash64(str(int(s) * 1000 + step)) % int(d)
                         for s, d in zip(src, deg)),
                        dtype=np.int64, count=len(src),
                    )
                    hit = idx == want
                    return pa.table(
                        {"node": pa.array(src[hit]), "next": pa.array(tgt[hit])}
                    )

            nh = adj.map_batches(
                NextHop, batch_format="pyarrow", concurrency=2
            ).to_pandas()
            nmap = dict(zip(nh["node"], nh["next"]))
            nxt = fdf["node"].map(nmap)
            alive = nxt.notna()
            fdf = pd.DataFrame(
                {"seed": fdf["seed"][alive].to_numpy(),
                 "node": nxt[alive].to_numpy().astype(np.int64)}
            )
            out_parts.append(pa.table(
                {"seed": pa.array(fdf["seed"].to_numpy()),
                 "step": pa.array(np.full(len(fdf), step + 1, np.int64)),
                 "node": pa.array(fdf["node"].to_numpy())}
            ))
            frontier = rd.from_arrow(
                pa.table({"seed": pa.array(fdf["seed"].to_numpy()),
                          "node": pa.array(fdf["node"].to_numpy())})
            )
        else:  # join regime: frontier stays a Dataset

            def add_want(t: pa.Table) -> pa.Table:
                nodes = t["node"].to_numpy()
                want = np.fromiter(
                    (md5_hash64(str(int(v) * 1000 + step)) for v in nodes),
                    dtype=np.uint64, count=len(nodes),
                ).view(np.int64)
                return t.append_column("hsh", pa.array(want))

            fr = frontier.map_batches(add_want, batch_format="pyarrow")
            joined = fr.join(
                adj, join_type="inner", num_partitions=8,
                on=("node",), right_on=("src",),
            )

            def pick(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return pa.table(
                        {"seed": pa.array([], pa.int64()),
                         "node": pa.array([], pa.int64())}
                    )
                hsh = t["hsh"].to_numpy().view(np.uint64)
                deg = t["deg"].to_numpy().astype(np.uint64)
                hit = (hsh % deg).view(np.int64) == t["idx"].to_numpy()
                return pa.table(
                    {"seed": t["seed"].filter(pa.array(hit)),
                     "node": t["target"].filter(pa.array(hit))}
                )

            # Ray's join emits SCHEMALESS zero-row blocks for empty
            # partitions and map_batches passes them through without
            # calling the UDF — repartition concatenates them into
            # typed blocks before the next round's join (established
            # idiom, cf. _segment_dedup_join_regime)
            frontier = (
                joined.map_batches(pick, batch_format="pyarrow")
                .repartition(4)
                .materialize()
            )
            s_now = step + 1

            def stamp(t: pa.Table, _s=s_now) -> pa.Table:
                if t.num_rows == 0 or "seed" not in t.column_names:
                    return pa.table(
                        {"seed": pa.array([], pa.int64()),
                         "step": pa.array([], pa.int64()),
                         "node": pa.array([], pa.int64())}
                    )
                return pa.table(
                    {"seed": t["seed"],
                     "step": pa.array(np.full(t.num_rows, _s, np.int64)),
                     "node": t["node"]}
                )

            out_ds_parts.append(frontier.map_batches(stamp, batch_format="pyarrow"))

    base = rd.from_arrow(pa.concat_tables(out_parts))
    for p in out_ds_parts:
        base = base.union(p)
    return base


@register(
    "pmi_topk",
    """
    WITH d AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    f AS (
      SELECT doc_id, term FROM d WHERE length(term) >= 4
      QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY term) <= 12),
    n AS (SELECT count(DISTINCT doc_id) AS nd FROM f),
    u AS (SELECT term, count(*) AS c FROM f GROUP BY term),
    p AS (
      SELECT a.term AS t1, b.term AS t2, count(*) AS c_ab
      FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2),
    s AS (
      SELECT p.t1, p.t2, p.c_ab,
             CAST((p.c_ab * n.nd * 1024) // (ua.c * ub.c) AS BIGINT) AS score
      FROM p, n
      JOIN u ua ON ua.term = p.t1
      JOIN u ub ON ub.term = p.t2
      WHERE p.c_ab >= 2)
    SELECT t1, t2, CAST(c_ab AS BIGINT) AS c_ab, score
    FROM s ORDER BY score DESC, t1, t2 LIMIT 50
    """,
    doc="PMI collocation ranking (the word-association scorer on top of "
    "term_cooccurrence's counting core: PMI = log P(ab)/(P(a)P(b)); "
    "ranking needs only the RATIO, so the score is the integer-exact "
    "quantization (c_ab * N * 1024) // (c_a * c_b) — no log, no float, "
    "the oracle hash cannot drift; pairs with c_ab < 2 are noise and "
    "dropped).  Same per-doc 12-term cap as term_cooccurrence (the "
    "documented O(k^2) skew guard).  Distributed shape: ONE pass emits "
    "pair/unigram/doc-count partials as a single tagged stream "
    "(Counter-combined batch-side), split into three aggregates — two "
    "bucketed sums + one scalar; the unigram count table (vocab-"
    "bounded, counts only) broadcasts below uni_broadcast_cap and "
    "scores apply batch-side with a local top-k prune before the "
    "global sort; past the cap the join regime attaches (c_a, c_b) "
    "via TWO hash joins (bigram_lm_score pattern, forced-regime "
    "equality test).  Python-int scoring on aggregated count rows "
    "keeps c_ab * N * 1024 exact at any corpus size (int64 would "
    "overflow past ~9e15).",
)
def pmi_topk(
    sf_dir: str, k: int = 50, uni_broadcast_cap: int = 50_000_000,
    forced_regime: Optional[str] = None,
):
    from collections import Counter

    import ray

    from .stages.relational import bucketed_agg

    def tagged(t: pa.Table) -> pd.DataFrame:
        cols = {"kind": "int64", "t1": "object", "t2": "object", "c": "int64"}
        pairs: Counter = Counter()
        unis: Counter = Counter()
        nd = 0
        for txt in t["text"].to_pylist():
            terms = sorted({w for w in txt.split(" ") if len(w) >= 4})[:12]
            if not terms:
                continue
            nd += 1
            unis.update(terms)
            for i in range(len(terms)):
                for j in range(i + 1, len(terms)):
                    pairs[(terms[i], terms[j])] += 1
        rows = (
            [(0, a, b, c) for (a, b), c in pairs.items()]
            + [(1, w, "", c) for w, c in unis.items()]
            + [(2, "", "", nd)]
        )
        df = pd.DataFrame(rows, columns=list(cols))
        return df.astype(cols)

    stream = (
        _read(sf_dir, "documents", columns=["text"])
        .map_batches(tagged, batch_format="pyarrow")
        .materialize()
    )
    pair_counts = bucketed_agg(
        stream.filter(lambda r: r["kind"] == 0),
        keys=["t1", "t2"],
        sum_cols={"c": "c_ab"},
        key_dtypes={"t1": "object", "t2": "object"},
    )
    uni_counts = bucketed_agg(
        stream.filter(lambda r: r["kind"] == 1),
        keys=["t1"],
        sum_cols={"c": "cu"},
        key_dtypes={"t1": "object"},
    ).materialize()
    nd_total = int(
        stream.filter(lambda r: r["kind"] == 2).sum("c") or 0
    )

    def score_rows(t1, t2, c_ab, c_a, c_b):
        sc = [
            (int(ab) * nd_total * 1024) // (int(a) * int(b))
            for ab, a, b in zip(c_ab, c_a, c_b)
        ]
        out = pa.table(
            {
                "t1": pa.array(list(t1), pa.string()),
                "t2": pa.array(list(t2), pa.string()),
                "c_ab": pa.array(np.asarray(c_ab, dtype=np.int64)),
                "score": pa.array(np.asarray(sc, dtype=np.int64)),
            }
        )
        order = np.lexsort(
            (out["t2"].to_numpy(zero_copy_only=False),
             out["t1"].to_numpy(zero_copy_only=False),
             -out["score"].to_numpy())
        )[:k]
        return out.take(pa.array(np.sort(order)))

    empty = pa.table(
        {"t1": pa.array([], pa.string()), "t2": pa.array([], pa.string()),
         "c_ab": pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
    )

    regime = forced_regime or (
        "broadcast" if uni_counts.count() <= uni_broadcast_cap else "join"
    )
    if regime == "broadcast":
        u = uni_counts.to_pandas()
        if "t1" not in u.columns:
            u = pd.DataFrame({"t1": pd.Series([], dtype="object"),
                              "cu": pd.Series([], dtype="int64")})
        uref = ray.put(dict(zip(u["t1"], u["cu"])))

        class Score:
            def __init__(self):
                self.u = ray.get(uref)

            def __call__(self, t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "t1" not in t.column_names:
                    return empty
                t = t.filter(pc.greater_equal(t["c_ab"], 2))
                if t.num_rows == 0:
                    return empty
                t1 = t["t1"].to_pylist()
                t2 = t["t2"].to_pylist()
                return score_rows(
                    t1, t2, t["c_ab"].to_numpy(),
                    [self.u[w] for w in t1], [self.u[w] for w in t2],
                )

        scored = pair_counts.map_batches(
            Score, batch_format="pyarrow", concurrency=2
        )
    else:  # join regime: attach c_a, c_b via two hash joins
        pc_ds = pair_counts.map_batches(
            lambda df: df if len(df) else pd.DataFrame(
                {"t1": pd.Series([], dtype="object"),
                 "t2": pd.Series([], dtype="object"),
                 "c_ab": pd.Series([], dtype="int64")}
            ),
            batch_format="pandas",
        ).filter(lambda r: r["c_ab"] >= 2).repartition(8)
        ua = uni_counts.map_batches(
            lambda df: df.rename(columns={"cu": "c_a"}), batch_format="pandas"
        ).repartition(8)
        ub = uni_counts.map_batches(
            lambda df: df.rename(columns={"t1": "t2", "cu": "c_b"}),
            batch_format="pandas",
        ).repartition(8)
        j = pc_ds.join(ua, join_type="inner", num_partitions=8, on=("t1",))
        j = j.repartition(8).join(
            ub, join_type="inner", num_partitions=8, on=("t2",)
        )

        def score_batch(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "t1" not in t.column_names:
                return empty
            return score_rows(
                t["t1"].to_pylist(), t["t2"].to_pylist(),
                t["c_ab"].to_numpy(), t["c_a"].to_numpy(), t["c_b"].to_numpy(),
            )

        scored = j.map_batches(score_batch, batch_format="pyarrow")

    return (
        scored.repartition(4)
        .sort(["score", "t1", "t2"], descending=[True, False, False])
        .limit(k)
    )


@register(
    "dataset_card_stats",
    """
    WITH s AS (
      SELECT source, lang, n_chars,
             len(string_split(text, ' ')) AS ntok
      FROM documents),
    per AS (
      SELECT source, lang, count(*) AS n, sum(ntok) AS tok,
             sum(n_chars) AS ch,
             sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS short
      FROM s GROUP BY source, lang),
    roll AS (
      SELECT source,
             CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS total_tokens,
             CAST(sum(ch) AS BIGINT) AS total_chars,
             count(*) AS n_langs,
             CAST(sum(short) AS BIGINT) AS n_short
      FROM per GROUP BY source),
    top AS (
      SELECT source, lang AS top_lang
      FROM per
      QUALIFY row_number() OVER (PARTITION BY source
                                 ORDER BY n DESC, lang) = 1)
    SELECT roll.source, n_docs, total_tokens, total_chars,
           CAST(n_langs AS BIGINT) AS n_langs, n_short, top_lang
    FROM roll JOIN top ON roll.source = top.source
    """,
    doc="Per-source dataset card / datasheet rollup (the Dolma/"
    "RedPajama-style corpus report a curator publishes per source: "
    "docs, token and char volume, language spread, dominant language, "
    "short-doc fraction numerator).  Distributed shape: per-batch "
    "partial sums per (source, lang) — a Counter-free vectorized "
    "pandas groupby, so a billion-doc source ships ONE row per batch; "
    "ONE bucketed (source, lang) sum, then a second coarse "
    "source-hash shuffle co-locates each source's language rows for "
    "the vectorized per-bucket rollup + top-language pick (count "
    "desc, lang asc) — the anchor_text_agg two-stage shape; counts "
    "only, text never moves.",
)
def dataset_card_stats(sf_dir: str):
    import hashlib

    from .stages.relational import bucketed_agg

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"source": "object", "lang": "object", "n": "int64",
                "tok": "int64", "ch": "int64", "short": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ntok = pc.add(pc.count_substring(t["text"], " "), 1).to_numpy()
        df = pd.DataFrame(
            {
                "source": t["source"].to_pandas().to_numpy(),
                "lang": t["lang"].to_pandas().to_numpy(),
                "n": np.ones(t.num_rows, dtype=np.int64),
                "tok": ntok.astype(np.int64),
                "ch": t["n_chars"].to_numpy().astype(np.int64),
                "short": (t["n_chars"].to_numpy() < 200).astype(np.int64),
            }
        )
        return df.groupby(["source", "lang"], as_index=False, sort=False).sum()

    summed = bucketed_agg(
        _read(sf_dir, "documents", columns=["source", "lang", "text", "n_chars"])
        .map_batches(partial, batch_format="pyarrow"),
        keys=["source", "lang"],
        sum_cols={"n": "n", "tok": "tok", "ch": "ch", "short": "short"},
        key_dtypes={"source": "object", "lang": "object"},
    )

    def add_sbkt(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("source", "lang", "n", "tok", "ch", "short")
        if len(df) == 0 or "source" not in df.columns:
            df = pd.DataFrame(
                {c: pd.Series([], dtype="object" if c in ("source", "lang") else "int64")
                 for c in cols}
            )
        df = df.copy()
        df["sb"] = pd.Series(
            [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 32
             for s in df["source"]],
            index=df.index, dtype="int32",
        )
        return df

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": "object", "n_docs": "int64", "total_tokens": "int64",
                "total_chars": "int64", "n_langs": "int64", "n_short": "int64",
                "top_lang": "object"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        agg = g.groupby("source", as_index=False, sort=False).agg(
            n_docs=("n", "sum"), total_tokens=("tok", "sum"),
            total_chars=("ch", "sum"), n_langs=("lang", "size"),
            n_short=("short", "sum"),
        )
        top = (
            g.sort_values(["source", "n", "lang"],
                          ascending=[True, False, True], kind="stable")
            .groupby("source", as_index=False, sort=False)
            .first()[["source", "lang"]]
            .rename(columns={"lang": "top_lang"})
        )
        out = agg.merge(top, on="source")
        return out.astype(cols)

    return (
        summed.map_batches(add_sbkt, batch_format="pandas")
        .groupby("sb")
        .map_groups(rollup, batch_format="pandas")
        .select_columns(
            ["source", "n_docs", "total_tokens", "total_chars",
             "n_langs", "n_short", "top_lang"]
        )
    )


@register(
    "cms_registers",
    """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    cells AS (
      SELECT CAST(r.r AS BIGINT) AS row_id,
             CAST(md5_number_lower(CAST(r.r AS VARCHAR) || ':' || tok) % 256
                  AS BIGINT) AS cell
      FROM toks, unnest(range(4)) AS r(r))
    SELECT row_id, cell, count(*) AS register
    FROM cells GROUP BY row_id, cell
    """,
    doc="Count-Min sketch registers for token-frequency estimation "
    "(Cormode & Muthukrishnan: depth d=4 hash rows x width w=256 "
    "counters; register[r][c] = total occurrences of tokens with "
    "hash_r(tok) %% w == c; point estimate = min over rows — always "
    ">= the true count, within eps*N w.h.p.) — the mergeable "
    "FREQUENCY sketch completing the sketch family (hll_registers = "
    "distinct count, distinct_kmv = bounded-sample distinct, "
    "heavy_hitters = candidate-recount top-k): at 100 TB a CMS is "
    "what lets every worker answer 'roughly how often does this "
    "token/URL/host occur' from 8 KB of state, no shuffle per probe.  "
    "The sketch itself is under the SQL gate: registers are EXACT "
    "integers (md5_number_lower both sides, the hll_registers hash "
    "recipe) so the oracle pins every counter, not an estimate.  "
    "Distributed shape: per-batch factorize (tokens counted once per "
    "unique-per-batch, 4 md5s per UNIQUE token) -> np.add.at "
    "accumulate into the 4x256 grid -> emit nonzero cells: a fixed "
    "<= 1024-rows-per-batch combiner at ANY corpus size (sum is "
    "associative); ONE tiny groupby-sum merge.  The overestimate "
    "contract (estimate >= true count; tight for heavy tokens) is "
    "asserted against exact counts in tests.",
)
def cms_registers(sf_dir: str, depth: int = 4, width: int = 256):
    import hashlib

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"row_id": "int64", "cell": "int64", "register": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        toks: list[str] = []
        for txt in t["text"].to_pylist():
            toks.extend(txt.split(" "))
        codes, uniq = pd.factorize(pd.Series(toks, dtype="object"))
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        out_r, out_c, out_v = [], [], []
        for r in range(depth):
            pre = f"{r}:".encode()
            cells = np.empty(len(uniq), dtype=np.int64)
            for i, w in enumerate(uniq):
                cells[i] = (
                    int.from_bytes(
                        hashlib.md5(pre + w.encode()).digest()[8:16], "little"
                    )
                    % width
                )
            acc = np.zeros(width, dtype=np.int64)
            np.add.at(acc, cells, cnt)
            nz = np.nonzero(acc)[0]
            out_r.append(np.full(len(nz), r, dtype=np.int64))
            out_c.append(nz.astype(np.int64))
            out_v.append(acc[nz])
        return pd.DataFrame(
            {
                "row_id": np.concatenate(out_r),
                "cell": np.concatenate(out_c),
                "register": np.concatenate(out_v),
            }
        )

    return (
        _read(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["row_id", "cell"])
        .aggregate(Sum("register", alias_name="register"))
    )


@register(
    "overlap_stitch",
    """
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 20000000,
             substr(text, n_chars - 31, 32) || ' ' || substr(text, 1, 40)
      FROM documents WHERE doc_id % 7 = 0),
    tails AS (SELECT doc_id AS a_id,
                     substr(text, length(text) - 31, 32) AS k FROM aug),
    heads AS (SELECT doc_id AS b_id, substr(text, 1, 32) AS k FROM aug)
    SELECT a_id, b_id FROM tails JOIN heads USING (k) WHERE a_id <> b_id
    """,
    doc="Suffix/prefix overlap stitching: find ordered pairs (a, b) "
    "where the last 32 chars of a equal the first 32 chars of b — the "
    "shard-boundary repair / continued-page detection pass a crawl "
    "corpus needs before packing (a page split across two fetches, a "
    "WET record clipped at a shard boundary, 'continue reading' "
    "pagination bodies).  Planted continuations (doc_id%%7==0 spawns "
    "doc_id+20M whose text OPENS with the parent's 32-char tail) are "
    "mirrored by the oracle with substr arithmetic, so recall is "
    "pinned, and natural tail==head collisions in the corpus are "
    "found identically by both sides.  Distributed shape: ONE scan "
    "emits two fp128 key streams — (md5(tail32) as two int64, a_id) "
    "and (md5(head32) as two int64, b_id) — then ONE hash join on "
    "the fp128; 24 bytes/doc/side crosses the shuffle, text never "
    "moves (contrast a sort-based suffix join, which ships the "
    "strings).  fp128 equality stands in for string equality at the "
    "same collision odds the dedup family already accepts.",
)
def overlap_stitch(sf_dir: str):
    import hashlib

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def aug_texts(t: pa.Table):
        ids = t["doc_id"].to_pylist()
        txts = t["text"].to_pylist()
        out_i, out_t = list(ids), list(txts)
        for did, txt in zip(ids, txts):
            if did % 7 == 0:
                out_i.append(did + 20_000_000)
                out_t.append(txt[-32:] + " " + txt[:40])
        return out_i, out_t

    def side(t: pa.Table, which: str) -> pd.DataFrame:
        idc = "a_id" if which == "tail" else "b_id"
        if t.num_rows == 0:
            return pd.DataFrame(
                {idc: pd.Series([], dtype="int64"),
                 "h1": pd.Series([], dtype="int64"),
                 "h2": pd.Series([], dtype="int64")}
            )
        ids, txts = aug_texts(t)
        h1 = np.empty(len(ids), dtype=np.int64)
        h2 = np.empty(len(ids), dtype=np.int64)
        for i, txt in enumerate(txts):
            key = txt[-32:] if which == "tail" else txt[:32]
            dg = hashlib.md5(key.encode()).digest()
            h1[i] = int.from_bytes(dg[:8], "little") - (1 << 63)
            h2[i] = int.from_bytes(dg[8:], "little") - (1 << 63)
        return pd.DataFrame(
            {idc: pd.Series(ids, dtype="int64"), "h1": h1, "h2": h2}
        )

    tails = docs.map_batches(partial(side, which="tail"), batch_format="pyarrow")
    heads = docs.map_batches(partial(side, which="head"), batch_format="pyarrow")
    j = tails.repartition(8).join(
        heads.repartition(8), join_type="inner", num_partitions=8,
        on=("h1", "h2"),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame(
                {"a_id": pd.Series([], dtype="int64"),
                 "b_id": pd.Series([], dtype="int64")}
            )
        df = df[df["a_id"].to_numpy() != df["b_id"].to_numpy()]
        return df[["a_id", "b_id"]].astype("int64")

    # repartition first: Ray joins emit schemaless zero-row blocks for
    # empty partitions (see graph_random_walks) — concatenate into
    # typed blocks before the projection
    return j.repartition(4).map_batches(finish, batch_format="pandas")


LPA_BROADCAST_CAP_NODES = 100_000_000  # labels int64[n] ≈ 800 MB at cap


@register(
    "label_prop_rounds",
    """
    WITH nn AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM nn) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)
      UNION ALL
      SELECT doc_id, (doc_id + 1) % (SELECT c FROM nn) FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % (SELECT c FROM nn) FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id + 3) % (SELECT c FROM nn) FROM documents
      WHERE doc_id % 5 = 0),
    e AS (SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
          FROM l WHERE src <> target),
    ee AS (SELECT a AS s, b AS t FROM e UNION ALL SELECT b AS s, a AS t FROM e),
    l0 AS (SELECT doc_id AS node, doc_id AS lab FROM documents),
    v1 AS (SELECT ee.s AS node, l0.lab AS lab, count(*) AS c
           FROM ee JOIN l0 ON l0.node = ee.t GROUP BY 1, 2),
    l1 AS (SELECT node, lab FROM v1
           QUALIFY row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, lab) = 1),
    v2 AS (SELECT ee.s AS node, l1.lab AS lab, count(*) AS c
           FROM ee JOIN l1 ON l1.node = ee.t GROUP BY 1, 2),
    l2 AS (SELECT node, lab FROM v2
           QUALIFY row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, lab) = 1),
    v3 AS (SELECT ee.s AS node, l2.lab AS lab, count(*) AS c
           FROM ee JOIN l2 ON l2.node = ee.t GROUP BY 1, 2),
    l3 AS (SELECT node, lab FROM v3
           QUALIFY row_number() OVER (PARTITION BY node
                                      ORDER BY c DESC, lab) = 1)
    SELECT lab AS label, count(*) AS n_nodes FROM l3 GROUP BY lab
    """,
    doc="Label-propagation community detection (Raghavan et al. 2007) "
    "over the triangle-test graph, SYNCHRONOUS variant with a "
    "deterministic vote (new label = the most frequent label among "
    "neighbors' current labels, tie -> smallest label) so the oracle "
    "can UNROLL the n_rounds=3 contract as three join+window CTEs — "
    "the standard async-random LPA is unverifiable; this is the "
    "de-facto community pass for grouping near-dup clusters, mirror "
    "sites and template families a crawl discovers.  Distributed "
    "shape per round: vote partials combine batch-side ((node, lab) "
    "size — bounded by batch edges), ONE bucketed (node, lab) count "
    "sum, then a coarse node%%64 shuffle for the vectorized per-node "
    "argmax (sort by c desc, lab asc; <= 1 row/node emerges).  TWO "
    "REGIMES (pagerank pattern): below LPA_BROADCAST_CAP_NODES the "
    "label vector int64[n] lives on the driver and is ray.put per "
    "round (edges stream against it, votes as above); past the cap "
    "labels live as a Dataset and each round is ONE hash join "
    "(edges x labels-on-dst) + the same two count shuffles — the "
    "driver never sees a per-node row.  Regimes are result-equal "
    "(asserted in tests, along with convergence on planted cliques).",
)
def label_prop_rounds(
    sf_dir: str, n_rounds: int = 3, dataset_regime: bool | None = None
):
    import ray

    from .stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    if dataset_regime is None:
        dataset_regime = n > LPA_BROADCAST_CAP_NODES

    ekeys = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    dist_keys = bucketed_agg(ekeys, keys=["key"], sum_cols={"__count__": "c"})

    def both_dirs(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        a, b = key // n, key % n
        return pa.table(
            {"src": np.concatenate((a, b)), "dst": np.concatenate((b, a))}
        )

    edges = dist_keys.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def add_nb(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "lab": pd.Series([], dtype="int64"),
                 "c": pd.Series([], dtype="int64"),
                 "nb": pd.Series([], dtype="int32")}
            )
        df = df.copy()
        df["nb"] = (df["node"].to_numpy() % 64).astype("int32")
        return df

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "lab": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["node", "c", "lab"],
                          ascending=[True, False, True], kind="stable")
        out = g.groupby("node", as_index=False, sort=False).first()
        return out[["node", "lab"]].astype("int64")

    if not dataset_regime:
        labels = np.arange(n, dtype=np.int64)
        for _ in range(n_rounds):
            lref = ray.put(labels)

            def vote(t: pa.Table) -> pd.DataFrame:
                lab = ray.get(lref)
                df = pd.DataFrame(
                    {"node": t["src"].to_numpy(),
                     "lab": lab[t["dst"].to_numpy()]}
                )
                g = df.groupby(["node", "lab"], as_index=False, sort=False).size()
                return g.rename(columns={"size": "c"})

            summed = bucketed_agg(
                edges.map_batches(vote, batch_format="pyarrow"),
                keys=["node", "lab"],
                sum_cols={"c": "c"},
            )
            picked = (
                summed.map_batches(add_nb, batch_format="pandas")
                .groupby("nb")
                .map_groups(pick, batch_format="pandas")
                .to_pandas()
            )
            nxt = labels.copy()
            nxt[picked["node"].to_numpy(dtype=np.int64)] = picked[
                "lab"
            ].to_numpy(dtype=np.int64)
            labels = nxt
        vals, cnts = np.unique(labels, return_counts=True)
        return pa.table(
            {"label": pa.array(vals.astype(np.int64)),
             "n_nodes": pa.array(cnts.astype(np.int64))}
        )

    # ---- dataset regime: labels live as a Dataset of (node, lab) rows
    labels_ds = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table(
            {"node": t["doc_id"], "lab": t["doc_id"]}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(n_rounds):
        lab_dst = labels_ds.map_batches(
            lambda t: pa.table({"dst": t["node"], "lab": t["lab"]}),
            batch_format="pyarrow",
        ).repartition(8)
        j = edges.repartition(8).join(
            lab_dst, join_type="inner", num_partitions=8, on=("dst",)
        )

        def vote_join(df: pd.DataFrame) -> pd.DataFrame:
            if df.shape[1] == 0 or len(df) == 0 or "src" not in df.columns:
                return pd.DataFrame(
                    {"node": pd.Series([], dtype="int64"),
                     "lab": pd.Series([], dtype="int64"),
                     "c": pd.Series([], dtype="int64")}
                )
            g = (
                df.rename(columns={"src": "node"})
                .groupby(["node", "lab"], as_index=False, sort=False)
                .size()
            )
            return g.rename(columns={"size": "c"})

        summed = bucketed_agg(
            j.repartition(8).map_batches(vote_join, batch_format="pandas"),
            keys=["node", "lab"],
            sum_cols={"c": "c"},
        )
        labels_ds = (
            summed.map_batches(add_nb, batch_format="pandas")
            .groupby("nb")
            .map_groups(pick, batch_format="pandas")
            .materialize()
        )

    from ray.data.aggregate import Count

    return (
        labels_ds.groupby("lab")
        .aggregate(Count(alias_name="n_nodes"))
        .map_batches(
            lambda t: pa.table({"label": t["lab"], "n_nodes": t["n_nodes"]}),
            batch_format="pyarrow",
        )
    )


@register(
    "embedding_gram",
    """
    WITH q AS (
      SELECT vec_id, g.i AS i,
             CAST(floor(embedding[g.i + 1] * 1024) AS BIGINT) AS qv
      FROM embeddings, unnest(generate_series(0, 63)) AS g(i))
    SELECT a.i AS i, b.i AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS g
    FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
    """,
    doc="Distributed Gram matrix over quantized embeddings — the "
    "linear-algebra reduce behind PCA / whitening / covariance "
    "estimation of an embedding corpus (subtract the mean outer "
    "product, computable from the same sums, and G/n IS the "
    "covariance; top eigenvectors = the PCA basis for dim-reduction "
    "before clustering/ANN).  Embeddings quantize to int64 "
    "(floor(x*1024) — float32->float64 widening is exact, so both "
    "sides floor the same doubles) and every partial is an EXACT "
    "integer, immune to distributed summation order: the classic "
    "float-PCA pitfall under the value-hash gate.  Distributed shape: "
    "per batch ONE int64 BLAS-shaped Q^T Q (d=64: 2080 upper-triangle "
    "cells) -> a FIXED 2080-rows-per-batch combiner at any corpus "
    "size; ONE tiny groupby-sum merge.  The d x d result is "
    "driver-sized by construction (the n x d data never concentrates "
    "anywhere).  At int64 the diagonal saturates around 1e12 vectors "
    "x unit-norm inputs (sum |q_i|^2 <= n * 2^20 < 2^63); past that, "
    "widen the merge to Python ints like pmi_topk.  Sequential "
    "numpy equality + eigen-sanity pinned in tests.",
)
def embedding_gram(sf_dir: str, dim: int = 64, scale: int = 1024):
    from ray.data.aggregate import Sum

    iu0, iu1 = np.triu_indices(dim)

    def gram_partial(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {"i": pd.Series([], dtype="int64"),
                 "j": pd.Series([], dtype="int64"),
                 "g": pd.Series([], dtype="int64")}
            )
        M = list_col_to_matrix(t["embedding"])
        Q = np.floor(M.astype(np.float64) * float(scale)).astype(np.int64)
        G = Q.T @ Q
        return pd.DataFrame(
            {"i": iu0.astype(np.int64), "j": iu1.astype(np.int64),
             "g": G[iu0, iu1]}
        )

    return (
        _read(sf_dir, "embeddings", columns=["embedding"])
        .map_batches(gram_partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("g", alias_name="g"))
    )


@register(
    "cohort_retention",
    """
    WITH p AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
    c AS (SELECT user_id, min(d) AS c0 FROM p GROUP BY user_id),
    a AS (SELECT DISTINCT p.user_id, c.c0, p.d - c.c0 AS age
          FROM p JOIN c USING (user_id))
    SELECT c0 AS cohort_day, age, count(*) AS n_users
    FROM a GROUP BY c0, age
    """,
    doc="Cohort retention (the product-analytics classic, and the "
    "recrawl-scheduling signal for a crawl corpus: cohort = the day a "
    "user/host first appeared, retention = how many are still active "
    "k days later): cohort_day x age -> distinct active users.  "
    "Distributed shape: ONE coarse user%%64 shuffle co-locates each "
    "user's (user, day) rows, then a single vectorized per-bucket "
    "pass does dedup -> per-user min -> age join -> (cohort, age) "
    "partial counts IN PANDAS (per-user work never leaves the "
    "bucket, no per-user Ray group overhead), and ONE bucketed "
    "(cohort, age) count sum merges partials — two count-only "
    "shuffles total; timestamps reduce to int64 epoch-days batch-"
    "side, so hot users cost their row count, not a driver loop.",
)
def cohort_retention(sf_dir: str):
    from .stages.relational import bucketed_agg

    DAY_US = 86_400_000_000

    def to_days(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "d": pd.Series([], dtype="int64"),
                 "ub": pd.Series([], dtype="int32")}
            )
        uid = t["user_id"].to_numpy().astype(np.int64)
        d = (t["ts"].cast(pa.int64()).to_numpy() // DAY_US).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "d": d}).drop_duplicates()
        df["ub"] = (df["user_id"].to_numpy() % 64).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"cohort_day": "int64", "age": "int64", "n_users": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.drop_duplicates(["user_id", "d"])
        c0 = g.groupby("user_id")["d"].transform("min")
        out = pd.DataFrame(
            {"cohort_day": c0.to_numpy(), "age": g["d"].to_numpy() - c0.to_numpy()}
        )
        out = out.groupby(["cohort_day", "age"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "n_users"})

    partials = (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(to_days, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return bucketed_agg(
        partials, keys=["cohort_day", "age"], sum_cols={"n_users": "n_users"}
    )


@register(
    "event_path_topk",
    """
    WITH s AS (
      SELECT event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    p AS (SELECT t1 || '>' || t2 || '>' || t3 AS path FROM s
          WHERE t3 IS NOT NULL)
    SELECT path, count(*) AS n FROM p GROUP BY path
    ORDER BY n DESC, path LIMIT 10
    """,
    doc="Sequential path mining: the top event-type TRIGRAMS along "
    "per-user timelines (the clickstream-analysis / session-flow "
    "classic; over a crawl log the same op surfaces dominant "
    "fetch->redirect->error paths).  Order within a user is the "
    "deterministic (ts, event_id) — the oracle's window frame "
    "exactly.  Distributed shape: ONE coarse user%%64 shuffle "
    "co-locates each user's rows; per bucket a single vectorized "
    "pandas pass sorts (user, ts, event_id), shift(-1)/shift(-2) "
    "WITHIN user (groupby-transform-free: boundary rows are masked "
    "by comparing the shifted user column), and emits (path, n) "
    "partial counts — path cardinality is bounded by "
    "n_event_types^3, so partials are tiny; ONE bucketed sum + "
    "global sort/limit over <= 125 rows finishes.",
)
def event_path_topk(sf_dir: str, k: int = 10):
    from .stages.relational import bucketed_agg

    def add_ub(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "ts": pd.Series([], dtype="int64"),
                 "event_id": pd.Series([], dtype="int64"),
                 "event_type": pd.Series([], dtype="object"),
                 "ub": pd.Series([], dtype="int32")}
            )
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy().astype(np.int64),
                "ts": t["ts"].cast(pa.int64()).to_numpy(),
                "event_id": t["event_id"].to_numpy().astype(np.int64),
                "event_type": t["event_type"].to_pandas().to_numpy(),
            }
        )
        df["ub"] = (df["user_id"].to_numpy() % 64).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame(
                {"path": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        et = g["event_type"].to_numpy()
        uid = g["user_id"].to_numpy()
        t2 = np.roll(et, -1)
        t3 = np.roll(et, -2)
        u2 = np.roll(uid, -1)
        u3 = np.roll(uid, -2)
        ok = np.zeros(len(g), dtype=bool)
        if len(g) >= 3:
            ok[:-2] = (uid[:-2] == u2[:-2]) & (uid[:-2] == u3[:-2])
        paths = pd.Series(
            np.char.add(
                np.char.add(
                    np.char.add(np.char.add(et[ok].astype(str), ">"),
                                t2[ok].astype(str)),
                    ">",
                ),
                t3[ok].astype(str),
            ),
            dtype="object",
        )
        out = paths.value_counts().rename_axis("path").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out[["path", "n"]]

    summed = bucketed_agg(
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
        .map_batches(add_ub, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas"),
        keys=["path"],
        sum_cols={"n": "n"},
        key_dtypes={"path": "object"},
    )
    return (
        summed.repartition(4)
        .sort(["n", "path"], descending=[True, False])
        .limit(k)
    )


@register(
    "source_overlap_matrix",
    """
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
               FROM documents),
    segs AS (SELECT doc_id, source,
                    unnest(range(CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS si,
                    ws
             FROM w),
    s2 AS (SELECT source,
                  md5(array_to_string(ws[si * 10 + 1 : si * 10 + 10], ' '))
                    AS h
           FROM segs),
    sh AS (SELECT DISTINCT source, h FROM s2)
    SELECT a.source AS sa, b.source AS sb, count(*) AS n_shared
    FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
    """,
    doc="Inter-source duplication audit (the source x source overlap "
    "table a Dolma/RedPajama-style corpus report publishes, and the "
    "decision input for which source to drop when two feeds mirror "
    "each other): n_shared = DISTINCT 10-token segments present in "
    "BOTH sources, for every source pair.  Distributed shape: one "
    "scan explodes (source, md5-128 as two int64) — segment text "
    "never shuffles — with per-batch dedup; ONE bucketed "
    "(source, h) distinct; then ONE h%%64 shuffle co-locates each "
    "hash's source set for vectorized sorted-run pair generation "
    "(_group_pairs arange trick, lex order within hash = pair "
    "canonicalization) + per-bucket (sa, sb) partial counts; ONE "
    "final bucketed sum.  Pair volume per hash is O(k^2) in the "
    "number of sources CONTAINING that segment — bounded by source "
    "cardinality (a per-source report presumes it is small), never "
    "by corpus size.",
)
def source_overlap_matrix(sf_dir: str):
    import hashlib
    import math

    from .stages.relational import bucketed_agg

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"source": "object", "h1": "int64", "h2": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out_s, out_h1, out_h2 = [], [], []
        seen = set()
        for src, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            ws = txt.split(" ")
            for si in range(math.ceil(len(ws) / 10)):
                seg = " ".join(ws[si * 10 : si * 10 + 10])
                dg = hashlib.md5(seg.encode()).digest()
                key = (src, dg)
                if key in seen:
                    continue
                seen.add(key)
                out_s.append(src)
                out_h1.append(int.from_bytes(dg[:8], "little") - (1 << 63))
                out_h2.append(int.from_bytes(dg[8:], "little") - (1 << 63))
        return pd.DataFrame(
            {"source": pd.Series(out_s, dtype="object"),
             "h1": pd.Series(out_h1, dtype="int64"),
             "h2": pd.Series(out_h2, dtype="int64")}
        )

    distinct = bucketed_agg(
        _read(sf_dir, "documents", columns=["source", "text"]).map_batches(
            explode, batch_format="pyarrow"
        ),
        keys=["source", "h1", "h2"],
        sum_cols={"__count__": "c"},
        key_dtypes={"source": "object"},
    )

    def add_hb(df: pd.DataFrame) -> pd.DataFrame:
        cols = ("source", "h1", "h2")
        if df.shape[1] == 0 or len(df) == 0:
            df = pd.DataFrame(
                {"source": pd.Series([], dtype="object"),
                 "h1": pd.Series([], dtype="int64"),
                 "h2": pd.Series([], dtype="int64")}
            )
        df = df[list(cols)].copy()
        df["hb"] = (df["h1"].to_numpy() % 64).astype("int32")
        return df

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"sa": "object", "sb": "object", "n_shared": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["h1", "h2", "source"], kind="stable")
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        chg = np.concatenate(
            ([False], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1]))
        )
        key = np.cumsum(chg)
        _, v, w = _group_pairs(key, np.arange(len(g), dtype=np.int64))
        src = g["source"].to_numpy()
        out = pd.DataFrame({"sa": src[v], "sb": src[w]})
        out = out.groupby(["sa", "sb"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "n_shared"})

    partials = (
        distinct.map_batches(add_hb, batch_format="pandas")
        .groupby("hb")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    return bucketed_agg(
        partials,
        keys=["sa", "sb"],
        sum_cols={"n_shared": "n_shared"},
        key_dtypes={"sa": "object", "sb": "object"},
    )


@register(
    "media_context_stats",
    """
    WITH ts AS (
      SELECT d.doc_id, d.n_chars, (d.n_chars + 63) // 64 AS k, t.j
      FROM documents d,
           unnest(generate_series(0, (d.n_chars + 63) // 64 - 1)) AS t(j)),
    m AS (
      SELECT CASE (doc_id + j) % 3
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
             END AS kind,
             least(64, n_chars - j*64) AS prevc,
             CASE WHEN j + 1 < k THEN least(64, n_chars - (j+1)*64)
                  ELSE 0 END AS nextc,
             CASE WHEN j + 1 < k THEN 0 ELSE 1 END AS tail
      FROM ts WHERE (doc_id*31 + j) % 5 = 0)
    SELECT kind, count(*) AS n_media,
           CAST(sum(prevc) AS BIGINT) AS prev_chars,
           CAST(sum(nextc) AS BIGINT) AS next_chars,
           CAST(sum(tail) AS BIGINT) AS n_tail
    FROM m GROUP BY kind
    """,
    doc="Two-sided media context measurement over the REAL nested span "
    "column (the MMC4/OBELICS curation signal image_text_pairs' "
    "preceding-caption scan does not capture: media ALSO needs text "
    "after it, and trailing media with no following text is the "
    "classic low-quality-pair symptom): per media kind, the summed "
    "lengths of the text spans immediately BEFORE and AFTER each "
    "media span, plus how many media spans sit at the document tail.  "
    "Ray measures the real zero-copy slices — flatten via "
    "pc.list_flatten + list_parent_indices, pc.utf8_length of the "
    "flat neighbors at p-1 / p+1 with a same-parent guard — while "
    "the oracle re-derives both windows arithmetically from the "
    "synthesis contract: a genuine cross-check of span ORDER, not "
    "just content.  Per-document-local, ONE streamed map_batches "
    "chain, per-batch per-kind partials -> a 3-group groupby; NO "
    "shuffle touches text.",
)
def media_context_stats(sf_dir: str):
    from ray.data.aggregate import Sum

    def measure(t: pa.Table) -> pd.DataFrame:
        cols = {"kind": "object", "n": "int64", "prevc": "int64",
                "nextc": "int64", "tail": "int64"}
        st = _build_span_column(t)
        if st.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        spans = st["spans"].combine_chunks()
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy()
        kind = flat.field("kind").to_pandas().to_numpy()
        tlen = pc.utf8_length(flat.field("text")).to_numpy()
        is_media = kind != "text"
        p = np.flatnonzero(is_media)
        if len(p) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        prevc = tlen[p - 1]  # a media span always follows its text span
        has_next = (p + 1 < len(kind))
        nxt = np.where(has_next, np.minimum(p + 1, len(kind) - 1), 0)
        same_parent = has_next & (parent[nxt] == parent[p])
        nextc = np.where(same_parent, tlen[nxt], 0)
        df = pd.DataFrame(
            {
                "kind": kind[p],
                "n": np.ones(len(p), dtype=np.int64),
                "prevc": prevc.astype(np.int64),
                "nextc": nextc.astype(np.int64),
                "tail": (~same_parent).astype(np.int64),
            }
        )
        return df.groupby("kind", as_index=False, sort=False).sum()

    agg = (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(measure, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(
            Sum("n", alias_name="n_media"),
            Sum("prevc", alias_name="prev_chars"),
            Sum("nextc", alias_name="next_chars"),
            Sum("tail", alias_name="n_tail"),
        )
    )
    return agg


@register(
    "kwic_contexts",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    p AS (SELECT doc_id, ws, unnest(range(len(ws))) AS i FROM w),
    hit AS (SELECT ws[i+1] AS probe,
                   coalesce(array_to_string(ws[greatest(1, i-1) : i], ' '),
                            '') AS lctx,
                   coalesce(array_to_string(ws[i+2 : least(len(ws), i+3)],
                                            ' '), '') AS rctx
            FROM p WHERE ws[i+1] IN ('order', 'window', 'hash')),
    c AS (SELECT probe, lctx || '|' || rctx AS ctx, count(*) AS n
          FROM hit GROUP BY 1, 2)
    SELECT probe, ctx, n FROM c
    QUALIFY row_number() OVER (PARTITION BY probe
                               ORDER BY n DESC, ctx) <= 5
    """,
    doc="Concordance / KWIC extraction (keyword-in-context, the "
    "qualitative audit tool a curator runs before writing a filter "
    "rule: HOW is this term used?): for each probe term, every "
    "occurrence's 2-token left and right context, aggregated to the "
    "top-5 contexts per probe by (count desc, ctx asc).  Complements "
    "memorization_scan (which counts probe hits but discards the "
    "surroundings).  Distributed shape: per-batch Python-loop doc "
    "scan is fine here — the work is per-token string slicing "
    "bounded by hit count, not a kernel — emitting (probe, ctx) "
    "Counter partials; ONE bucketed (probe, ctx) sum (contexts are "
    "short strings, ~40 bytes/distinct-context/batch, text bodies "
    "never move); the per-probe top-5 runs in a 3-group groupby.  "
    "Probe lists past ~1k should switch to the documented "
    "Aho-Corasick upgrade shared with memorization_scan.",
)
def kwic_contexts(sf_dir: str, k: int = 5):
    import collections

    from .stages.relational import bucketed_agg

    PROBES = ("order", "window", "hash")

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"probe": "object", "ctx": "object", "n": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        cnt: collections.Counter = collections.Counter()
        pset = set(PROBES)
        for txt in t["text"].to_pylist():
            toks = txt.split(" ")
            for i, tok in enumerate(toks):
                if tok in pset:
                    lctx = " ".join(toks[max(0, i - 2) : i])
                    rctx = " ".join(toks[i + 1 : i + 3])
                    cnt[(tok, lctx + "|" + rctx)] += 1
        if not cnt:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        keys = list(cnt.keys())
        return pd.DataFrame(
            {"probe": pd.Series([k0 for k0, _ in keys], dtype="object"),
             "ctx": pd.Series([k1 for _, k1 in keys], dtype="object"),
             "n": pd.Series(list(cnt.values()), dtype="int64")}
        )

    summed = bucketed_agg(
        _read(sf_dir, "documents", columns=["text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=["probe", "ctx"],
        sum_cols={"n": "n"},
        key_dtypes={"probe": "object", "ctx": "object"},
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"probe": "object", "ctx": "object", "n": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["n", "ctx"], ascending=[False, True], kind="stable")
        return g.head(k)[["probe", "ctx", "n"]]

    return summed.groupby("probe").map_groups(topk, batch_format="pandas")


# =====================================================================
# Session-13 additions: skyline, gap-fill, winsorize, debounce, rank
# agreement
# =====================================================================


def _pareto_skyline_df(df: pd.DataFrame) -> pd.DataFrame:
    """2-D Pareto skyline (minimize price_c, maximize p_size), vectorized.

    Sort by (price_c asc, p_size desc); a row survives iff it carries
    its price-group's max size AND that size strictly beats the best
    size among all strictly-cheaper rows (prefix running max over
    price groups).  Duplicate (price, size) points all survive —
    matching the oracle's strict-dominance NOT EXISTS.
    """
    cols = {"p_partkey": "int64", "p_size": "int64", "price_c": "int64"}
    if df.shape[1] == 0 or len(df) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
    df = df.sort_values(["price_c", "p_size"], ascending=[True, False], kind="stable")
    price = df["price_c"].to_numpy()
    size = df["p_size"].to_numpy().astype(np.int64)
    new_grp = np.empty(len(df), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = price[1:] != price[:-1]
    gidx = np.cumsum(new_grp) - 1
    grp_max = size[new_grp]  # first row of each price group = its max size
    gmax = grp_max[gidx]
    run = np.maximum.accumulate(grp_max)
    m_prev = np.concatenate(([np.iinfo(np.int64).min], run[:-1]))[gidx]
    keep = (size == gmax) & (size > m_prev)
    out = df.loc[keep, ["p_partkey", "p_size", "price_c"]].copy()
    out["p_size"] = out["p_size"].astype("int64")
    return out.reset_index(drop=True)


@register(
    "skyline_pareto",
    """
    WITH p AS (
      SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
             CAST(floor(p_retailprice*100 + 0.5) AS BIGINT) AS price_c
      FROM part)
    SELECT a.p_partkey, a.p_size, a.price_c
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
        AND (b.price_c < a.price_c OR b.p_size > a.p_size))
    """,
    doc="Distributed Pareto skyline (multi-objective filtering: the "
    "cheapest-for-their-size frontier; same shape picks 'best quality "
    "per token cost' documents in a curation sweep).  The oracle is "
    "the quadratic NOT-EXISTS dominance join; the Ray side never "
    "goes quadratic: per batch a vectorized sort + prefix-running-max "
    "local skyline (O(b log b)), then ONE repartition(1) merge that "
    "re-runs the same kernel over the union of local skylines.  "
    "Skyline-of-skylines is exact: dominance is a strict partial "
    "order, so any globally dominated point is dominated by a chain "
    "terminating in a point that survives its own batch, and every "
    "global-skyline point survives everywhere.  Local skylines of "
    "random 2-D data are O(log b), so the merge input is ~blocks x "
    "log(block) rows — driver-sized at any corpus size; for "
    "adversarial (anti-correlated) inputs swap the final merge for a "
    "tree of the same kernel.",
)
def skyline_pareto(sf_dir: str):
    def batch_sky(t: pa.Table) -> pd.DataFrame:
        cols = {"p_partkey": "int64", "p_size": "int64", "price_c": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame(
            {
                "p_partkey": t["p_partkey"].to_numpy().astype(np.int64),
                "p_size": t["p_size"].to_numpy().astype(np.int64),
                "price_c": cents(t["p_retailprice"]).to_numpy().astype(np.int64),
            }
        )
        return _pareto_skyline_df(df)

    return (
        _read(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])
        .map_batches(batch_sky, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_pareto_skyline_df, batch_format="pandas")
    )


@register(
    "timeseries_gapfill",
    """
    WITH p AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS d, count(*) AS n
      FROM events GROUP BY user_id, d),
    b AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM p GROUP BY user_id),
    g AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day FROM b)
    SELECT g.user_id, g.day, coalesce(p.n, 0) AS n
    FROM g LEFT JOIN p ON p.user_id = g.user_id AND p.d = g.day
    """,
    doc="Time-series gap-fill: densify each user's daily activity "
    "series over [first_day, last_day] with explicit zero rows (the "
    "prerequisite for rolling windows / recrawl scheduling over "
    "sparse logs — a missing day and an idle day must be "
    "distinguishable downstream).  Distributed shape: per-batch "
    "(user, day) partial counts (timestamps reduce to int64 "
    "epoch-days batch-side), ONE coarse user%%64 shuffle, then per "
    "bucket a single vectorized pass: sum partials, per-user "
    "min/max, and a repeat+arange dense-grid explode merged against "
    "the observed counts.  Only (user, day, n) triples ever move; "
    "the explode is bounded by each user's ACTIVE SPAN in days, not "
    "by corpus size, and happens after the shuffle so grid rows "
    "never cross the wire.",
)
def timeseries_gapfill(sf_dir: str):
    DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"user_id": "int64", "d": "int64", "n": "int64", "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy().astype(np.int64),
                "d": (t["ts"].cast(pa.int64()).to_numpy() // DAY_US).astype(np.int64),
            }
        )
        out = df.groupby(["user_id", "d"], as_index=False, sort=False).size()
        out = out.rename(columns={"size": "n"})
        out["ub"] = (out["user_id"].to_numpy() % 64).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "day": "int64", "n": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.groupby(["user_id", "d"], as_index=False, sort=False)["n"].sum()
        b = g.groupby("user_id", as_index=False, sort=False).agg(
            d0=("d", "min"), d1=("d", "max")
        )
        lens = (b["d1"].to_numpy() - b["d0"].to_numpy() + 1).astype(np.int64)
        total = int(lens.sum())
        idx = np.arange(total, dtype=np.int64)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        grid = pd.DataFrame(
            {
                "user_id": np.repeat(b["user_id"].to_numpy(), lens),
                "day": idx - starts + np.repeat(b["d0"].to_numpy(), lens),
            }
        )
        out = grid.merge(
            g.rename(columns={"d": "day"}), on=["user_id", "day"], how="left"
        )
        out["n"] = out["n"].fillna(0).astype("int64")
        return out[["user_id", "day", "n"]]

    return (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


@register(
    "winsorized_stats",
    """
    WITH r AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents),
    q AS (
      SELECT lang,
             max(CASE WHEN rk = (n + 19) // 20 THEN n_chars END) AS lo,
             max(CASE WHEN rk = (19*n + 19) // 20 THEN n_chars END) AS hi
      FROM r GROUP BY lang)
    SELECT d.lang, count(*) AS n_docs,
           CAST(sum(least(greatest(d.n_chars, q.lo), q.hi)) AS BIGINT) AS clipped_sum,
           CAST(sum(CASE WHEN d.n_chars < q.lo OR d.n_chars > q.hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM documents d JOIN q USING (lang)
    GROUP BY d.lang
    """,
    doc="Per-group winsorized aggregate (outlier-robust corpus "
    "stats: clip each doc's length to its language's exact "
    "[p5, p95] before summing — the Gopher/RefinedWeb trick of "
    "bounding heavy-tail contributions without dropping rows).  "
    "Percentiles are EXACT rank statistics — lo = value at rank "
    "ceil(n/20), hi = value at rank ceil(19n/20), ordered by value — "
    "computed WITHOUT a per-group sort: pass 1 builds a (lang, "
    "value) count histogram via per-batch partials + one bucketed "
    "sum (cardinality bounded by distinct metric values, not rows; "
    "quantize the metric first when it's unbounded, as "
    "value_quantiles does), the driver cumsums the tiny histogram "
    "into per-lang (lo, hi), and pass 2 broadcasts the thresholds "
    "into a clip+partial-sum combiner with one final low-cardinality "
    "groupby.  Two count/sum-only shuffles; text and full rows never "
    "move.",
)
def winsorized_stats(sf_dir: str):
    from ray.data.aggregate import Sum

    from .stages.relational import bucketed_agg

    hist = bucketed_agg(
        _read(sf_dir, "documents", columns=["lang", "n_chars"]).map_batches(
            lambda t: (
                pd.DataFrame(
                    {
                        "lang": pd.Series([], dtype="object"),
                        "v": pd.Series([], dtype="int64"),
                        "c": pd.Series([], dtype="int64"),
                    }
                )
                if t.num_rows == 0
                else pd.DataFrame(
                    {
                        "lang": t["lang"].to_pandas().to_numpy(),
                        "v": t["n_chars"].to_numpy().astype(np.int64),
                    }
                )
                .groupby(["lang", "v"], as_index=False, sort=False)
                .size()
                .rename(columns={"size": "c"})
            ),
            batch_format="pyarrow",
        ),
        keys=["lang", "v"],
        sum_cols={"c": "c"},
        key_dtypes={"lang": "object"},
    )
    h = hist.to_pandas()  # bounded: distinct (lang, value) pairs only

    bounds: dict[str, tuple[int, int]] = {}
    for lang, grp in h.groupby("lang"):
        grp = grp.sort_values("v")
        c = grp["c"].to_numpy().astype(np.int64)
        v = grp["v"].to_numpy().astype(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        lo_rk = (n + 19) // 20
        hi_rk = (19 * n + 19) // 20
        lo = int(v[np.searchsorted(cum, lo_rk)])
        hi = int(v[np.searchsorted(cum, hi_rk)])
        bounds[str(lang)] = (lo, hi)

    def clip_partial(t: pa.Table) -> pd.DataFrame:
        cols = {
            "lang": "object",
            "n_docs": "int64",
            "clipped_sum": "int64",
            "n_clipped": "int64",
        }
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pandas().to_numpy(),
                "v": t["n_chars"].to_numpy().astype(np.int64),
            }
        )
        lo = df["lang"].map({k: b[0] for k, b in bounds.items()}).to_numpy(dtype=np.int64)
        hi = df["lang"].map({k: b[1] for k, b in bounds.items()}).to_numpy(dtype=np.int64)
        v = df["v"].to_numpy()
        df["clipped"] = np.minimum(np.maximum(v, lo), hi)
        df["is_clip"] = ((v < lo) | (v > hi)).astype(np.int64)
        out = df.groupby("lang", as_index=False, sort=False).agg(
            n_docs=("v", "size"),
            clipped_sum=("clipped", "sum"),
            n_clipped=("is_clip", "sum"),
        )
        return out

    return (
        _read(sf_dir, "documents", columns=["lang", "n_chars"])
        .map_batches(clip_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("clipped_sum", alias_name="clipped_sum"),
            Sum("n_clipped", alias_name="n_clipped"),
        )
    )


@register(
    "event_debounce",
    """
    WITH s AS (
      SELECT user_id, event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT user_id, event_type,
           CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 86400000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS kept,
           CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= 86400000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS dropped
    FROM s GROUP BY user_id, event_type
    """,
    doc="Per-key throttle dedup (log/event debouncing: collapse "
    "repeats of the same (user, event_type) arriving within 24 h of "
    "the PREVIOUS occurrence — the recrawl/retry-collapse rule over "
    "a fetch log; lag-based, so the rule is stateless given sorted "
    "order and exactly mirrors the oracle's window frame (ts, "
    "event_id)).  Distributed shape: ONE coarse user%%64 shuffle "
    "co-locates each user's rows; per bucket a single vectorized "
    "sort + shift comparison (boundary rows masked by comparing the "
    "shifted key columns) emits (user, type, kept, dropped) — no "
    "per-key Ray group overhead, no second shuffle (the bucket owns "
    "every row of its keys, so bucket partials ARE the final "
    "counts).",
)
def event_debounce(sf_dir: str, window_us: int = 86_400_000_000):
    def add_ub(t: pa.Table) -> pd.DataFrame:
        cols = {
            "user_id": "int64",
            "event_type": "object",
            "us": "int64",
            "event_id": "int64",
            "ub": "int32",
        }
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy().astype(np.int64),
                "event_type": t["event_type"].to_pandas().to_numpy(),
                "us": t["ts"].cast(pa.int64()).to_numpy(),
                "event_id": t["event_id"].to_numpy().astype(np.int64),
            }
        )
        df["ub"] = (df["user_id"].to_numpy() % 64).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "user_id": "int64",
            "event_type": "object",
            "kept": "int64",
            "dropped": "int64",
        }
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(
            ["user_id", "event_type", "us", "event_id"], kind="stable"
        )
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        us = g["us"].to_numpy()
        same = np.zeros(len(g), dtype=bool)
        same[1:] = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = 0
        gap[1:] = us[1:] - us[:-1]
        drop = same & (gap <= window_us)
        out = pd.DataFrame(
            {
                "user_id": uid,
                "event_type": et,
                "dropped": drop.astype(np.int64),
            }
        )
        out["kept"] = 1 - out["dropped"]
        agg = out.groupby(["user_id", "event_type"], as_index=False, sort=False)[
            ["kept", "dropped"]
        ].sum()
        return agg

    return (
        _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
        .map_batches(add_ub, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )

@register(
    "rank_agreement",
    """
    WITH p AS (
      SELECT p_brand, CAST(p_size AS BIGINT) AS x,
             CAST(floor(p_retailprice*100 + 0.5) AS BIGINT) AS y
      FROM part),
    r AS (
      SELECT p_brand,
             2*rank() OVER (PARTITION BY p_brand ORDER BY x)
               + count(*) OVER (PARTITION BY p_brand, x) - 1 AS dx,
             2*rank() OVER (PARTITION BY p_brand ORDER BY y)
               + count(*) OVER (PARTITION BY p_brand, y) - 1 AS dy,
             count(*) OVER (PARTITION BY p_brand) AS n
      FROM p)
    SELECT p_brand, any_value(n) AS n,
           CAST(sum((dx - dy) * (dx - dy)) AS BIGINT) AS d2x4,
           CAST(1024 - (1536 * sum((dx - dy) * (dx - dy)))
                  // (any_value(n) * (any_value(n) * any_value(n) - 1)) AS BIGINT) AS rho_q
    FROM r GROUP BY p_brand HAVING any_value(n) > 1
    """,
    doc="Per-group rank agreement (tie-aware Spearman between two "
    "attributes — does size predict price within a brand?  The same "
    "op scores agreement between two document-quality rankings "
    "before fusing them).  Integer-exact throughout: average ranks "
    "are DOUBLED (avg rank of a tie run starting at min-rank r with "
    "c peers is r + (c-1)/2, so 2*avg = 2*rank + c - 1 — always an "
    "integer), the statistic is D = sum((dx-dy)^2) = 4*sum(d^2), and "
    "the quantized coefficient rho_q = 1024 - (1536*D) // (n(n^2-1)) "
    "mirrors 1 - 6*sum(d^2)/(n(n^2-1)) with no float anywhere.  "
    "Distributed shape: ONE coarse brand-hash shuffle of (brand, x, "
    "y) int64 triples; per bucket a single vectorized pandas pass "
    "(groupby rank(method='min') + tie-size transform) ranks every "
    "brand in the bucket at once — no per-group sort-shuffle, no "
    "quadratic pair counting (the Kendall alternative needs O(n^2) "
    "or a sequential Fenwick pass; Spearman stays fully vectorized).",
)
def rank_agreement(sf_dir: str):
    def add_ub(t: pa.Table) -> pd.DataFrame:
        cols = {"p_brand": "object", "x": "int64", "y": "int64", "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        brand = t["p_brand"].to_pandas().to_numpy()
        df = pd.DataFrame(
            {
                "p_brand": brand,
                "x": t["p_size"].to_numpy().astype(np.int64),
                "y": cents(t["p_retailprice"]).to_numpy().astype(np.int64),
            }
        )
        df["ub"] = (
            pd.util.hash_pandas_object(df["p_brand"], index=False).to_numpy() % 32
        ).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"p_brand": "object", "n": "int64", "d2x4": "int64", "rho_q": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        gb = g.groupby("p_brand")
        dx = (
            2 * gb["x"].rank(method="min").to_numpy()
            + g.groupby(["p_brand", "x"])["x"].transform("size").to_numpy()
            - 1
        ).astype(np.int64)
        dy = (
            2 * gb["y"].rank(method="min").to_numpy()
            + g.groupby(["p_brand", "y"])["y"].transform("size").to_numpy()
            - 1
        ).astype(np.int64)
        d = dx - dy
        out = pd.DataFrame({"p_brand": g["p_brand"].to_numpy(), "d2": d * d})
        agg = out.groupby("p_brand", as_index=False, sort=False).agg(
            n=("d2", "size"), d2x4=("d2", "sum")
        )
        agg = agg[agg["n"] > 1].copy()
        n = agg["n"].to_numpy().astype(np.int64)
        agg["rho_q"] = 1024 - (1536 * agg["d2x4"].to_numpy()) // (n * (n * n - 1))
        return agg[["p_brand", "n", "d2x4", "rho_q"]]

    return (
        _read(sf_dir, "part", columns=["p_brand", "p_size", "p_retailprice"])
        .map_batches(add_ub, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


@register(
    "two_hop_reach",
    _LINK_SQL_CTE.replace(
        "SELECT (d.doc_id*131", "SELECT d.doc_id AS src, (d.doc_id*131"
    )
    + """,
    lu AS (SELECT DISTINCT src, target FROM l WHERE target != src),
    deg AS (SELECT src AS mid FROM lu GROUP BY src HAVING count(*) <= 64),
    h2 AS (
      SELECT DISTINCT a.src, b.target AS t2
      FROM lu a JOIN deg ON deg.mid = a.target
      JOIN lu b ON b.src = a.target
      WHERE b.target != a.src
        AND NOT EXISTS (SELECT 1 FROM lu c
                        WHERE c.src = a.src AND c.target = b.target)),
    c1 AS (SELECT src, count(*) AS n1 FROM lu GROUP BY src),
    c2 AS (SELECT src, count(*) AS n2 FROM h2 GROUP BY src)
    SELECT c1.src AS node, c1.n1, coalesce(c2.n2, 0) AS n2,
           CAST(1024*c1.n1 + 512*coalesce(c2.n2, 0) AS BIGINT) AS harmonic_q
    FROM c1 LEFT JOIN c2 ON c2.src = c1.src
    """,
    doc="Two-hop neighborhood reach per node (the truncated harmonic "
    "centrality / HyperBall round-2 exact form: n1 = distinct direct "
    "neighbors, n2 = distinct NEW nodes at exactly distance 2, "
    "harmonic_q = 1024*n1 + 512*n2 — integer 1/d weights).  Edges "
    "follow the shared deterministic convention (_LINK_SQL_CTE).  "
    "Distributed shape: (1) per-batch link explode + dedup -> int "
    "(src, target) pairs; (2) ONE mid-keyed shuffle co-locates each "
    "node's IN-edges and OUT-edges (tagged rows, bucket = mid %% 64); "
    "per-mid candidate generation is a per-bucket pandas hash join "
    "(in-citers x out-targets, C-level per-key cross product) gated "
    "by the out-degree <= 64 hub cap symmetric with the oracle — at "
    "web scale the cap bounds the explode at in_deg(mid) x 64; (3) "
    "ONE src-keyed shuffle unions candidates with the node's own "
    "edge set; per bucket a single vectorized anti-join "
    "(drop_duplicates + merge indicator) computes n1/n2 for every "
    "src at once.  Only int64 pairs ever move; no N^2 term anywhere "
    "below the cap.",
)
def two_hop_reach(sf_dir: str, hub_cap: int = 64):
    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"src": "int64", "tgt": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        tgt = _explode_links(t, n_docs)
        ids = t["doc_id"].to_numpy()
        k = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, k)
        keep = src != tgt
        packed = np.unique(src[keep] * np.int64(n_docs) + tgt[keep])
        return pd.DataFrame(
            {"src": (packed // n_docs).astype(np.int64),
             "tgt": (packed % n_docs).astype(np.int64)}
        )

    def tag_mid(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"mid": "int64", "other": "int64", "dir": "int8", "mb": "int32"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = pd.DataFrame(
            {
                "mid": np.concatenate((df["tgt"].to_numpy(), df["src"].to_numpy())),
                "other": np.concatenate((df["src"].to_numpy(), df["tgt"].to_numpy())),
                "dir": np.concatenate(
                    (np.zeros(len(df), np.int8), np.ones(len(df), np.int8))
                ),
            }
        )
        out["mb"] = (out["mid"].to_numpy() % 64).astype("int32")
        return out

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "int64", "t2": "int64", "kind": "int8", "sb": "int32"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        outs = g[g["dir"] == 1][["mid", "other"]].drop_duplicates()
        deg = outs.groupby("mid")["other"].transform("size")
        outs = outs[deg <= hub_cap]
        ins = g[g["dir"] == 0][["mid", "other"]].drop_duplicates()
        cand = ins.merge(outs, on="mid", suffixes=("_s", "_t"))
        cand = cand[cand["other_s"] != cand["other_t"]]
        cand = cand[["other_s", "other_t"]].drop_duplicates()
        out = pd.DataFrame(
            {"src": cand["other_s"].to_numpy(), "t2": cand["other_t"].to_numpy()}
        )
        out["kind"] = np.int8(1)
        out["sb"] = (out["src"].to_numpy() % 64).astype("int32")
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"node": "int64", "n1": "int64", "n2": "int64", "harmonic_q": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        edges = g[g["kind"] == 0][["src", "t2"]].drop_duplicates()
        cand = g[g["kind"] == 1][["src", "t2"]].drop_duplicates()
        n1 = edges.groupby("src", as_index=False, sort=False).size()
        n1 = n1.rename(columns={"size": "n1", "src": "node"})
        anti = cand.merge(edges, on=["src", "t2"], how="left", indicator=True)
        anti = anti[anti["_merge"] == "left_only"]
        n2 = anti.groupby("src", as_index=False, sort=False).size()
        n2 = n2.rename(columns={"size": "n2", "src": "node"})
        out = n1.merge(n2, on="node", how="left")
        out["n2"] = out["n2"].fillna(0).astype("int64")
        out["harmonic_q"] = 1024 * out["n1"].to_numpy() + 512 * out["n2"].to_numpy()
        return out[["node", "n1", "n2", "harmonic_q"]]

    import ray.data as rd

    edges = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow")
        .materialize()  # consumed twice (mid view + src view); pairs only
    )
    cand = (
        edges.map_batches(tag_mid, batch_format="pandas")
        .groupby("mb")
        .map_groups(candidates, batch_format="pandas")
    )

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"src": "int64", "t2": "int64", "kind": "int8", "sb": "int32"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = df.rename(columns={"tgt": "t2"}).copy()
        out["kind"] = np.int8(0)
        out["sb"] = (out["src"].to_numpy() % 64).astype("int32")
        return out[["src", "t2", "kind", "sb"]]

    both = edges.map_batches(edge_rows, batch_format="pandas").union(cand)
    return both.groupby("sb").map_groups(finish, batch_format="pandas")


@register(
    "colbert_maxsim",
    """
    WITH qv AS (
      SELECT vec_id AS qid, label AS qlabel, embedding
      FROM embeddings WHERE vec_id % 37 = 0),
    eq AS (
      SELECT qid, qlabel, g.i AS i,
             CAST(floor(embedding[g.i + 1] * 1024) AS BIGINT) AS v
      FROM qv, unnest(generate_series(0, 63)) AS g(i)),
    ed AS (
      SELECT vec_id AS did, label AS dlabel, g.i AS i,
             CAST(floor(embedding[g.i + 1] * 1024) AS BIGINT) AS v
      FROM embeddings, unnest(generate_series(0, 63)) AS g(i)),
    dots AS (
      SELECT eq.qid, eq.qlabel, ed.did, ed.dlabel, sum(eq.v * ed.v) AS dot
      FROM eq JOIN ed USING (i)
      GROUP BY eq.qid, eq.qlabel, ed.did, ed.dlabel),
    mx AS (
      SELECT qid, qlabel, dlabel, max(dot) AS m
      FROM dots GROUP BY qid, qlabel, dlabel)
    SELECT qlabel, dlabel, CAST(sum(m) AS BIGINT) AS score
    FROM mx GROUP BY qlabel, dlabel
    """,
    doc="Late-interaction retrieval scoring (ColBERT MaxSim: a query "
    "is a BAG of token vectors, a document is a bag of token "
    "vectors, score = sum over query tokens of the max dot product "
    "against any document token — the multi-vector ranking family "
    "between brute-cosine (1 vector) and cross-encoders).  Here "
    "query bags = the label groups of the sampled query vectors "
    "(vec_id %% 37 == 0) and document bags = the label groups of the "
    "full corpus; dot products are integer-exact (floor(x*1024) on "
    "float64-widened values, products bounded by 64*1024^2 << "
    "int64).  Distributed shape: the quantized query matrix (Q x 64 "
    "int64) broadcasts ONCE via ray.put; each batch runs ONE int64 "
    "matmul scoring every query token against every batch vector, "
    "then a vectorized per-(qid, dlabel) partial max — the combiner "
    "emits <= Q x labels_in_batch rows per batch at ANY corpus "
    "size; ONE bucketed max merge + a tiny (qlabel, dlabel) sum "
    "finish.  Document vectors never shuffle and never concentrate; "
    "the only state is the broadcast query matrix.",
)
def colbert_maxsim(sf_dir: str):
    import ray

    from .stages.relational import bucketed_agg

    emb = pq.read_table(_pq(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"])
    qm = (emb["vec_id"].to_numpy() % 37) == 0
    qids = emb["vec_id"].to_numpy()[qm].astype(np.int64)
    qlabels = emb["label"].to_numpy()[qm].astype(np.int64)
    qmat = np.floor(
        list_col_to_matrix(emb["embedding"].filter(pa.array(qm))).astype(np.float64)
        * 1024.0
    ).astype(np.int64)
    qref = ray.put((qids, qlabels, qmat))

    class PartialMax:
        def __init__(self):
            self.qids, self.qlabels, self.qmat = ray.get(qref)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            cols = {"qid": "int64", "dlabel": "int64", "m": "int64"}
            if t.num_rows == 0:
                return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
            dmat = np.floor(
                list_col_to_matrix(t["embedding"]).astype(np.float64) * 1024.0
            ).astype(np.int64)
            dlab = t["label"].to_numpy().astype(np.int64)
            dots = self.qmat @ dmat.T  # Q x B int64
            out = []
            for lab in np.unique(dlab):
                sel = dots[:, dlab == lab]
                out.append(
                    pd.DataFrame(
                        {"qid": self.qids, "dlabel": np.int64(lab),
                         "m": sel.max(axis=1)}
                    )
                )
            return pd.concat(out, ignore_index=True)

    def merge_max(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"qid": "int64", "qlabel": "int64", "dlabel": "int64", "m": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = g.groupby(["qid", "dlabel"], as_index=False, sort=False)["m"].max()
        ql = pd.Series(dict(zip(qids, qlabels)))
        out["qlabel"] = ql.loc[out["qid"]].to_numpy()
        return out[["qid", "qlabel", "dlabel", "m"]]

    partials = (
        _read(sf_dir, "embeddings", columns=["embedding", "label"])
        .map_batches(PartialMax, batch_format="pyarrow", concurrency=2)
        .map_batches(
            lambda df: df.assign(
                gb=((df["qid"] * 131 + df["dlabel"]) % 32).astype("int32")
            )
            if len(df)
            else df.assign(gb=pd.Series([], dtype="int32")),
            batch_format="pandas",
        )
        .groupby("gb")
        .map_groups(merge_max, batch_format="pandas")
    )
    return bucketed_agg(
        partials.map_batches(
            lambda df: df[["qlabel", "dlabel", "m"]].rename(columns={"m": "score"})
            if df.shape[1] > 0
            else pd.DataFrame(
                {"qlabel": pd.Series([], dtype="int64"),
                 "dlabel": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="int64")}
            ),
            batch_format="pandas",
        ),
        keys=["qlabel", "dlabel"],
        sum_cols={"score": "score"},
    )


@register(
    "cdc_upsert_merge",
    """
    WITH log AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(floor(value*100 + 0.5) AS BIGINT) AS value_c,
             (event_id % 10 = 0) AS is_del
      FROM events),
    last AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM log)
    SELECT user_id, event_type, value_c
    FROM last WHERE rn = 1 AND NOT is_del
    """,
    doc="Change-data-capture upsert merge (the Iceberg/Delta MERGE "
    "INTO semantics: a log of upserts and deletes keyed by entity, "
    "last-wins by (ts, event_id); final state = the last op per "
    "entity, dropped entirely if that op is a DELETE — here entity "
    "= (user_id, event_type) and rows with event_id %% 10 == 0 are "
    "tombstones).  Distributed shape: per-batch vectorized "
    "last-op-per-entity partial (sort + tail, <= 1 row per entity "
    "per batch at ANY log size — the argmax combiner of "
    "dedup_keep_longest generalized to a composite ordering key), "
    "ONE bucketed entity-hash merge re-applies the same argmax, "
    "tombstone filter at the very end so a delete correctly beats "
    "earlier upserts.  Values quantize to exact integer cents; the "
    "log's payload column never moves more than once per "
    "(entity, batch).",
)
def cdc_upsert_merge(sf_dir: str):
    def partial_last(t: pa.Table) -> pd.DataFrame:
        cols = {
            "user_id": "int64", "event_type": "object", "us": "int64",
            "event_id": "int64", "value_c": "int64", "is_del": "bool",
            "eb": "int32",
        }
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy().astype(np.int64),
                "event_type": t["event_type"].to_pandas().to_numpy(),
                "us": t["ts"].cast(pa.int64()).to_numpy(),
                "event_id": t["event_id"].to_numpy().astype(np.int64),
                "value_c": cents(t["value"]).to_numpy().astype(np.int64),
            }
        )
        df["is_del"] = (df["event_id"].to_numpy() % 10) == 0
        df = df.sort_values(["user_id", "event_type", "us", "event_id"], kind="stable")
        df = df.groupby(["user_id", "event_type"], as_index=False, sort=False).tail(1)
        df["eb"] = (
            pd.util.hash_pandas_object(
                df[["user_id", "event_type"]], index=False
            ).to_numpy()
            % 64
        ).astype("int32")
        return df

    def merge_last(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "event_type": "object", "value_c": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["user_id", "event_type", "us", "event_id"], kind="stable")
        g = g.groupby(["user_id", "event_type"], as_index=False, sort=False).tail(1)
        g = g[~g["is_del"]]
        return g[["user_id", "event_type", "value_c"]].reset_index(drop=True)

    return (
        _read(sf_dir, "events",
              columns=["user_id", "event_type", "ts", "event_id", "value"])
        .map_batches(partial_last, batch_format="pyarrow")
        .groupby("eb")
        .map_groups(merge_last, batch_format="pandas")
    )


@register(
    "media_layout_dedup",
    """
    WITH s AS (
      SELECT doc_id, j, (doc_id + j) % 3 AS kindno
      FROM documents,
           unnest(generate_series(0, (n_chars + 63)//64 - 1)) AS t(j)
      WHERE (doc_id*31 + j) % 5 = 0 AND n_chars > 0),
    sig AS (
      SELECT doc_id,
             string_agg(CASE kindno WHEN 0 THEN 'image'
                                    WHEN 1 THEN 'audio'
                                    ELSE 'video' END, ',' ORDER BY j) AS msig
      FROM s GROUP BY doc_id),
    alldocs AS (
      SELECT d.doc_id, coalesce(sig.msig, '') AS msig
      FROM documents d LEFT JOIN sig USING (doc_id))
    SELECT msig, count(*) AS n_docs, min(doc_id) AS keeper
    FROM alldocs GROUP BY msig
    """,
    doc="Interleaved-document media-layout dedup (group multimodal "
    "docs by their media-kind SEQUENCE — the image/audio/video "
    "pattern in span order; the template-detection signal for "
    "interleaved corpora: identical layouts with different text are "
    "near-template pages, and the keeper (min doc_id) is the "
    "canonical representative).  The Ray side measures the REAL "
    "nested span column (_build_span_column -> flatten -> media "
    "rows -> vectorized in-order per-doc kind join) while the "
    "oracle derives the same sequence arithmetically from the "
    "synthesis contract.  Distributed shape: signatures are built "
    "per batch with NO shuffle (spans are doc-local), then ONE "
    "bucketed (msig) merge sums counts and takes min keepers — "
    "signature strings are bounded by media-per-doc, and text never "
    "moves at all.",
)
def media_layout_dedup(sf_dir: str):
    def sig_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"msig": "object", "n_docs": "int64", "keeper": "int64", "sb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        st = _build_span_column(t)
        doc = st["doc_id"].to_numpy().astype(np.int64)
        spans = st["spans"].combine_chunks()
        flat = spans.flatten()
        parents = np.asarray(pa.compute.list_parent_indices(spans))
        kind = flat.field("kind").to_pandas().to_numpy()
        is_media = kind != "text"
        mdf = pd.DataFrame(
            {"doc": doc[parents[is_media]], "kind": kind[is_media]}
        )
        # spans are already in document order; groupby preserves it
        sig = mdf.groupby("doc", sort=False)["kind"].agg(",".join)
        out = pd.DataFrame({"doc_id": doc})
        out["msig"] = out["doc_id"].map(sig).fillna("")
        agg = out.groupby("msig", as_index=False, sort=False).agg(
            n_docs=("doc_id", "size"), keeper=("doc_id", "min")
        )
        agg["sb"] = (
            pd.util.hash_pandas_object(agg["msig"], index=False).to_numpy() % 32
        ).astype("int32")
        return agg

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"msig": "object", "n_docs": "int64", "keeper": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        return g.groupby("msig", as_index=False, sort=False).agg(
            n_docs=("n_docs", "sum"), keeper=("keeper", "min")
        )

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(sig_partial, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(merge, batch_format="pandas")
    )


@register(
    "basket_rules",
    """
    WITH li AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    nb AS (SELECT count(DISTINCT ok) AS n FROM li),
    ca AS (SELECT b, count(*) AS c FROM li GROUP BY b),
    pairs AS (
      SELECT x.b AS antecedent, y.b AS consequent, count(*) AS support
      FROM li x JOIN li y ON x.ok = y.ok AND x.b != y.b
      GROUP BY x.b, y.b)
    SELECT p.antecedent, p.consequent, p.support,
           CAST((p.support * 1024) // ca.c AS BIGINT) AS conf_q,
           CAST((p.support * (SELECT n FROM nb) * 1024)
                // (ca.c * cb.c) AS BIGINT) AS lift_q
    FROM pairs p
    JOIN ca ON ca.b = p.antecedent
    JOIN ca cb ON cb.b = p.consequent
    WHERE p.support >= 5
    """,
    doc="Market-basket association rules (Agrawal support / "
    "confidence / lift over order baskets: antecedent brand -> "
    "consequent brand, integer-quantized conf_q = 1024*c_ab/c_a and "
    "lift_q = 1024*N*c_ab/(c_a*c_b) so the oracle hash cannot "
    "drift; the same shape mines co-accessed hosts from a crawl "
    "log).  Distributed shape: the part->brand dimension broadcasts "
    "ONCE via ray.put (document the join regime past a broadcast "
    "cap, as bigram_lm_score does); per batch: map partkeys to "
    "brands + (order, brand) dedup partial; ONE order-keyed shuffle "
    "co-locates baskets, per bucket a pandas self-merge generates "
    "both-direction pairs (bounded by basket_size^2 per order) and "
    "emits pair/brand/order-count partials as tagged rows; ONE "
    "bucketed tagged sum + a single-partition finish computes the "
    "quotients over the <= |brands|^2 rule table.  Bodies never "
    "move; everything after the first shuffle is counts.",
)
def basket_rules(sf_dir: str, min_support: int = 5):
    import ray

    from .stages.relational import bucketed_agg

    part = pq.read_table(_pq(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    bmap = pd.Series(part["p_brand"].to_pandas().to_numpy(), index=pk)
    bref = ray.put(bmap)

    class Baskets:
        def __init__(self):
            self.bmap = ray.get(bref)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            cols = {"ok": "int64", "b": "object", "ob": "int32"}
            if t.num_rows == 0:
                return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
            df = pd.DataFrame(
                {
                    "ok": t["l_orderkey"].to_numpy().astype(np.int64),
                    "b": self.bmap.loc[
                        t["l_partkey"].to_numpy().astype(np.int64)
                    ].to_numpy(),
                }
            ).drop_duplicates()
            df["ob"] = (df["ok"].to_numpy() % 64).astype("int32")
            return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"kind": "int64", "a": "object", "b": "object", "c": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        li = g[["ok", "b"]].drop_duplicates()
        pairs = li.merge(li, on="ok", suffixes=("_a", "_b"))
        pairs = pairs[pairs["b_a"] != pairs["b_b"]]
        pc = pairs.groupby(["b_a", "b_b"], as_index=False, sort=False).size()
        out = [
            pd.DataFrame(
                {"kind": np.int64(0), "a": pc["b_a"], "b": pc["b_b"],
                 "c": pc["size"].astype("int64")}
            )
        ]
        bc = li.groupby("b", as_index=False, sort=False).size()
        out.append(
            pd.DataFrame(
                {"kind": np.int64(1), "a": bc["b"], "b": "",
                 "c": bc["size"].astype("int64")}
            )
        )
        out.append(
            pd.DataFrame(
                {"kind": [np.int64(2)], "a": [""], "b": [""],
                 "c": [np.int64(li["ok"].nunique())]}
            )
        )
        return pd.concat(out, ignore_index=True)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "antecedent": "object", "consequent": "object",
            "support": "int64", "conf_q": "int64", "lift_q": "int64",
        }
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        n = int(df.loc[df["kind"] == 2, "c"].sum())
        ca = dict(zip(df.loc[df["kind"] == 1, "a"], df.loc[df["kind"] == 1, "c"]))
        rules = df[df["kind"] == 0].copy()
        rules = rules[rules["c"] >= min_support]
        c_a = rules["a"].map(ca).to_numpy(dtype=np.int64)
        c_b = rules["b"].map(ca).to_numpy(dtype=np.int64)
        sup = rules["c"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "antecedent": rules["a"].to_numpy(),
                "consequent": rules["b"].to_numpy(),
                "support": sup,
                "conf_q": (sup * 1024) // c_a,
                "lift_q": (sup * n * 1024) // (c_a * c_b),
            }
        )

    partials = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
        .map_batches(Baskets, batch_format="pyarrow", concurrency=2)
        .groupby("ob")
        .map_groups(per_bucket, batch_format="pandas")
    )
    summed = bucketed_agg(
        partials,
        keys=["kind", "a", "b"],
        sum_cols={"c": "c"},
        key_dtypes={"a": "object", "b": "object"},
    )
    return summed.repartition(1).map_batches(finish, batch_format="pandas")


@register(
    "dup_size_histogram",
    """
    WITH f AS (SELECT md5(substr(text, 1, 128)) AS fp FROM documents),
    c AS (SELECT fp, count(*) AS sz FROM f GROUP BY fp)
    SELECT sz, count(*) AS n_clusters FROM c GROUP BY sz
    """,
    doc="Duplicate-cluster size histogram (the dedup datasheet: how "
    "many exact-duplicate clusters of each size exist, by the "
    "128-char head fingerprint — the number a curation run reports "
    "before deciding its dedup policy, and the skew signal for "
    "sizing the dedup shuffle itself).  Distributed shape: "
    "per-batch md5 fingerprint + partial (fp, count) — text never "
    "leaves the batch; ONE bucketed fp-keyed count sum; then a "
    "second tiny count-of-counts shuffle over (size) — output "
    "cardinality is the number of DISTINCT cluster sizes, "
    "essentially constant at any corpus scale.",
)
def dup_size_histogram(sf_dir: str):
    import hashlib

    from .stages.relational import bucketed_agg

    def fp_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"fp": "object", "n": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        heads = pc.utf8_slice_codeunits(t["text"], 0, 128).to_pandas()
        fps = [hashlib.md5(h.encode()).hexdigest() for h in heads]
        out = pd.DataFrame({"fp": fps})
        return (
            out.groupby("fp", as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )

    clusters = bucketed_agg(
        _read(sf_dir, "documents", columns=["text"]).map_batches(
            fp_partial, batch_format="pyarrow"
        ),
        keys=["fp"],
        sum_cols={"n": "n"},
        key_dtypes={"fp": "object"},
    )
    return bucketed_agg(
        clusters.map_batches(
            lambda df: df.rename(columns={"n": "sz"})[["sz"]].assign(n_clusters=1)
            if df.shape[1] > 0 and len(df) > 0
            else pd.DataFrame(
                {"sz": pd.Series([], dtype="int64"),
                 "n_clusters": pd.Series([], dtype="int64")}
            ),
            batch_format="pandas",
        ),
        keys=["sz"],
        sum_cols={"n_clusters": "n_clusters"},
    )


@register(
    "personalized_pagerank",
    _LINK_SQL_CTE.replace(
        "SELECT (d.doc_id*131", "SELECT d.doc_id AS src, (d.doc_id*131"
    )
    + """,
    lu AS (SELECT DISTINCT src, target FROM l WHERE target != src),
    deg AS (SELECT src, count(*) AS d FROM lu GROUP BY src),
    r0 AS (SELECT doc_id AS v, 1000000 AS r FROM documents WHERE doc_id % 97 = 0),
    in1 AS (
      SELECT lu.target AS v, CAST(sum(r0.r // deg.d) AS BIGINT) AS inflow
      FROM r0 JOIN lu ON lu.src = r0.v JOIN deg ON deg.src = r0.v
      GROUP BY lu.target),
    n1 AS (SELECT v FROM r0 UNION SELECT v FROM in1),
    r1 AS (
      SELECT n1.v,
             (85 * coalesce(in1.inflow, 0)) // 100
             + CASE WHEN n1.v % 97 = 0 THEN 150000 ELSE 0 END AS r
      FROM n1 LEFT JOIN in1 USING (v)),
    in2 AS (
      SELECT lu.target AS v, CAST(sum(r1.r // deg.d) AS BIGINT) AS inflow
      FROM r1 JOIN lu ON lu.src = r1.v JOIN deg ON deg.src = r1.v
      WHERE r1.r > 0 GROUP BY lu.target),
    n2 AS (SELECT v FROM r1 WHERE r > 0 UNION SELECT v FROM in2),
    r2 AS (
      SELECT n2.v,
             (85 * coalesce(in2.inflow, 0)) // 100
             + CASE WHEN n2.v % 97 = 0 THEN 150000 ELSE 0 END AS r
      FROM n2 LEFT JOIN in2 USING (v))
    SELECT v AS node, CAST(r AS BIGINT) AS r FROM r2 WHERE r > 0
    """,
    doc="Personalized PageRank (seed-restart random walk, the "
    "seed-expansion / related-page scoring primitive: restart mass "
    "pinned to the seed set doc_id %% 97 == 0, two synchronous "
    "rounds, damping 0.85).  Integer-exact: per-node contribution "
    "is r // deg and the damped update is (85*inflow)//100 + "
    "150000*is_seed — floor placement identical on both sides, so "
    "the unrolled-CTE oracle pins every score (dangling mass is "
    "dropped by both, documented).  Distributed shape: PPR mass "
    "stays LOCAL to the seed neighborhood for bounded rounds, so "
    "the frontier regime broadcasts the tiny (node, score) table "
    "via ray.put and streams the edge explode ONCE per round — "
    "per-batch (target, contribution) partial sums -> ONE bucketed "
    "sum per round; the frontier after k rounds is bounded by "
    "|seeds| * deg^k, never corpus size.  Past a frontier cap, "
    "switch to the bucketed-join regime exactly as graph_bfs_layers "
    "and label_prop_rounds dispatch (same edge convention, same "
    "join shape).",
)
def personalized_pagerank(sf_dir: str, rounds: int = 2):
    import ray

    from .stages.relational import bucketed_agg

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"src": "int64", "tgt": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        tgt = _explode_links(t, n_docs)
        ids = t["doc_id"].to_numpy()
        k = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, k)
        keep = src != tgt
        packed = np.unique(src[keep] * np.int64(n_docs) + tgt[keep])
        return pd.DataFrame(
            {"src": (packed // n_docs).astype(np.int64),
             "tgt": (packed % n_docs).astype(np.int64)}
        )

    edges = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow")
        .materialize()  # int pairs only; consumed once per round
    )
    # out-degrees: tiny (node, d) aggregate, bounded by node count
    degs = bucketed_agg(
        edges.map_batches(
            lambda df: df.assign(d=1)[["src", "d"]]
            if df.shape[1] > 0
            else pd.DataFrame({"src": pd.Series([], dtype="int64"),
                               "d": pd.Series([], dtype="int64")}),
            batch_format="pandas",
        ),
        keys=["src"],
        sum_cols={"d": "d"},
    ).to_pandas()
    deg_map = dict(zip(degs["src"].astype(np.int64), degs["d"].astype(np.int64)))

    seeds = np.arange(0, n_docs, 97, dtype=np.int64)
    r = {int(v): 1_000_000 for v in seeds}

    for _ in range(rounds):
        contrib = {
            int(v): int(s) // deg_map[int(v)]
            for v, s in r.items()
            if s > 0 and int(v) in deg_map
        }
        cref = ray.put(contrib)

        def inflow_partial(df: pd.DataFrame) -> pd.DataFrame:
            cols = {"v": "int64", "inflow": "int64"}
            if df.shape[1] == 0 or len(df) == 0:
                return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
            cm = ray.get(cref)
            c = df["src"].map(cm)
            m = c.notna()
            out = pd.DataFrame(
                {"v": df["tgt"].to_numpy()[m.to_numpy()],
                 "inflow": c[m].to_numpy(dtype=np.int64)}
            )
            return out.groupby("v", as_index=False, sort=False)["inflow"].sum()

        inflow = bucketed_agg(
            edges.map_batches(inflow_partial, batch_format="pandas"),
            keys=["v"],
            sum_cols={"inflow": "inflow"},
        ).to_pandas()  # bounded by frontier size, not corpus
        nxt = {}
        for v, infl in zip(inflow["v"].astype(np.int64), inflow["inflow"].astype(np.int64)):
            nxt[int(v)] = (85 * int(infl)) // 100
        for v in seeds:
            nxt[int(v)] = nxt.get(int(v), 0) + 150_000
        r = {v: s for v, s in nxt.items() if s > 0}

    import ray.data as rd

    out = pd.DataFrame(
        {"node": np.array(sorted(r), dtype=np.int64),
         "r": np.array([r[v] for v in sorted(r)], dtype=np.int64)}
    )
    return rd.from_pandas(out)


@register(
    "growth_accounting",
    """
    WITH p AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
    du AS (SELECT DISTINCT user_id, d FROM p),
    f AS (SELECT user_id, min(d) AS f0 FROM du GROUP BY user_id),
    daily AS (SELECT d, count(*) AS dau FROM du GROUP BY d),
    news AS (SELECT f0 AS d, count(*) AS new_users FROM f GROUP BY f0)
    SELECT daily.d AS day, daily.dau,
           coalesce(news.new_users, 0) AS new_users,
           CAST(sum(coalesce(news.new_users, 0))
                OVER (ORDER BY daily.d) AS BIGINT) AS cum_users
    FROM daily LEFT JOIN news ON news.d = daily.d
    """,
    doc="Growth accounting (the product/corpus health datasheet: per "
    "day, distinct active users, NEW users — first-ever-seen that "
    "day — and the cumulative user count; over a crawl log the same "
    "op tracks newly discovered hosts per round).  Distributed "
    "shape: per-batch (user, day) dedup partials, ONE user-keyed "
    "shuffle (a user's global first-day and distinct days are "
    "bucket-local facts once co-located), per bucket ONE vectorized "
    "pass emits (day, dau_partial, new_partial) count rows; ONE "
    "bucketed day sum + a single-partition sort/cumsum over the "
    "day-bounded result.  Timestamps reduce to int64 epoch-days "
    "batch-side; only counts shuffle.",
)
def growth_accounting(sf_dir: str):
    from .stages.relational import bucketed_agg

    DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"user_id": "int64", "d": "int64", "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy().astype(np.int64),
                "d": (t["ts"].cast(pa.int64()).to_numpy() // DAY_US).astype(np.int64),
            }
        ).drop_duplicates()
        df["ub"] = (df["user_id"].to_numpy() % 64).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"day": "int64", "dau": "int64", "new_users": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g[["user_id", "d"]].drop_duplicates()
        dau = g.groupby("d", as_index=False, sort=False).size()
        dau = dau.rename(columns={"d": "day", "size": "dau"})
        f0 = g.groupby("user_id", as_index=False, sort=False)["d"].min()
        news = f0.groupby("d", as_index=False, sort=False).size()
        news = news.rename(columns={"d": "day", "size": "new_users"})
        out = dau.merge(news, on="day", how="outer")
        for c in ("dau", "new_users"):
            out[c] = out[c].fillna(0).astype("int64")
        return out

    summed = bucketed_agg(
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas"),
        keys=["day"],
        sum_cols={"dau": "dau", "new_users": "new_users"},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"day": "int64", "dau": "int64", "new_users": "int64",
                "cum_users": "int64"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.sort_values("day").reset_index(drop=True)
        df["cum_users"] = df["new_users"].cumsum().astype("int64")
        return df[["day", "dau", "new_users", "cum_users"]]

    return summed.repartition(1).map_batches(finish, batch_format="pandas")


@register(
    "jsonl_roundtrip_stats",
    """
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(strlen(text)) AS BIGINT) AS text_bytes
    FROM documents GROUP BY lang, source
    """,
    doc="JSONL interchange roundtrip (sources/jsonl.py — the LLM-corpus "
    "shard format of Dolma/RedPajama/The-Pile): documents are sunk "
    "worker-side as content-hashed .jsonl.gz shards (one per block, "
    "atomic publish — the resumable-output contract; pandas C-level "
    "line serialization, byte-deterministic gzip), then READ BACK via "
    "read_binary_files + pyarrow.json's vectorized C++ NDJSON parser "
    "and aggregated per (lang, source) with an id-sum and text-byte "
    "checksum.  The oracle compares against the source table "
    "directly, so green certifies the bytes on disk roundtrip "
    "exactly (JSON string escaping, unicode, gzip framing) — not the "
    "in-flight dataset.",
)
def jsonl_roundtrip_stats(sf_dir: str, out_dir: str | None = None):
    import shutil
    import tempfile

    from ray.data.aggregate import Sum

    from .sources.jsonl import read_jsonl_dataset, write_jsonl_corpus

    own = out_dir is None
    if own:
        out_dir = tempfile.mkdtemp(prefix="crawler_ray_jsonl_", dir="/tmp")
    try:
        docs = _read(sf_dir, "documents",
                     columns=["doc_id", "text", "lang", "source"])
        write_jsonl_corpus(docs, out_dir).materialize()

        back = read_jsonl_dataset(out_dir)

        def partial(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "lang": t["lang"],
                    "source": t["source"],
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "ids": pc.cast(t["doc_id"], pa.int64()),
                    "tb": pc.cast(pc.binary_length(t["text"]), pa.int64()),
                }
            )

        return (
            back.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "source"])
            .aggregate(
                Sum("n", alias_name="n_docs"),
                Sum("ids", alias_name="id_sum"),
                Sum("tb", alias_name="text_bytes"),
            )
            .materialize()
        )
    finally:
        if own:
            shutil.rmtree(out_dir, ignore_errors=True)


@register(
    "custdist_histogram",
    """
    WITH oc AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey)
    SELECT n_orders, count(*) AS n_customers
    FROM oc GROUP BY n_orders
    """,
    doc="Customer order-count distribution (TPC-H Q13's shape: a LEFT "
    "join that must PRESERVE zero-activity entities, then a "
    "count-of-counts histogram — the same shape audits zero-fetch "
    "hosts in a crawl frontier or zero-duplicate docs in a dedup "
    "report; the zero bucket is the part an inner join silently "
    "loses).  Distributed shape: per-batch (custkey) partial counts "
    "over orders — ONE bucketed custkey sum gives active customers; "
    "the zero bucket comes from COUNTS ONLY (total customers from "
    "parquet metadata num_rows minus active customers — no customer "
    "row ever moves); a second tiny count-of-counts shuffle "
    "finishes.  Output cardinality = distinct order counts, "
    "constant at scale.",
)
def custdist_histogram(sf_dir: str):
    from .stages.relational import bucketed_agg

    n_customers = pq.read_metadata(_pq(sf_dir, "customer")).num_rows

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"ck": "int64", "n": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame({"ck": t["o_custkey"].to_numpy().astype(np.int64)})
        return (
            df.groupby("ck", as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )

    active = bucketed_agg(
        _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys=["ck"],
        sum_cols={"n": "n"},
    )

    def to_hist(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_orders": "int64", "n_customers": "int64"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = (
            df.groupby("n", as_index=False, sort=False)
            .size()
            .rename(columns={"n": "n_orders", "size": "n_customers"})
        )
        out["n_customers"] = out["n_customers"].astype("int64")
        return out

    hist = bucketed_agg(
        active.map_batches(to_hist, batch_format="pandas"),
        keys=["n_orders"],
        sum_cols={"n_customers": "n_customers"},
    )

    def add_zero_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_orders": "int64", "n_customers": "int64"}
        if df.shape[1] == 0:
            df = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        n_active = int((df["n_orders"].to_numpy() > 0).astype(np.int64)
                       @ df["n_customers"].to_numpy()) if len(df) else 0
        zero = n_customers - n_active
        if zero > 0:
            df = pd.concat(
                [df, pd.DataFrame({"n_orders": [0], "n_customers": [zero]})],
                ignore_index=True,
            )
        return df.astype({"n_orders": "int64", "n_customers": "int64"})

    return hist.repartition(1).map_batches(add_zero_bucket, batch_format="pandas")


@register(
    "session_stats",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
    l AS (
      SELECT user_id, tus, event_id,
             CASE WHEN lag(tus) OVER w IS NULL
                    OR tus - lag(tus) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
    s AS (
      SELECT user_id, tus,
             sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM l),
    per AS (
      SELECT user_id, sid, count(*) AS ne,
             max(tus) - min(tus) AS dur
      FROM s GROUP BY user_id, sid)
    SELECT ne AS session_events, count(*) AS n_sessions,
           CAST(sum(dur) AS BIGINT) AS total_duration_us
    FROM per GROUP BY ne
    """,
    doc="Sessionization (the clickstream classic; over a crawl log the "
    "same 30-minute-gap rule segments fetch bursts per host for "
    "politeness auditing): split each user's timeline at >30 min "
    "gaps, then a session-size histogram with summed durations.  "
    "Order within a user is the deterministic (ts, event_id) — the "
    "oracle's window frame exactly.  Distributed shape: ONE coarse "
    "user%%64 shuffle co-locates each user's (user, ts) rows; per "
    "bucket a single vectorized pandas pass sorts, diffs, marks "
    "breaks (user-change OR gap), assigns session ids by cumsum, and "
    "collapses to (session_events, n_sessions, dur) partials — "
    "per-user work never leaves the bucket; ONE bucketed count sum "
    "merges.  Output cardinality = distinct session sizes, constant "
    "at scale.",
)
def session_stats(sf_dir: str, gap_us: int = 1_800_000_000):
    from .stages.relational import bucketed_agg

    def add_ub(t: pa.Table) -> pd.DataFrame:
        cols = {"user_id": "int64", "tus": "int64", "event_id": "int64",
                "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        uid = t["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": uid,
                "tus": t["ts"].cast(pa.int64()).to_numpy(),
                "event_id": t["event_id"].to_numpy().astype(np.int64),
                "ub": (uid % 64).astype("int32"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"session_events": "int64", "n_sessions": "int64",
                "total_duration_us": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["user_id", "tus", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        tus = g["tus"].to_numpy()
        brk = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            same_user = uid[1:] == uid[:-1]
            brk[1:] = (~same_user | (tus[1:] - tus[:-1] > gap_us)).astype(np.int64)
        sid = np.cumsum(brk)  # globally unique session id within bucket
        per = pd.DataFrame({"sid": sid, "tus": tus}).groupby("sid")["tus"].agg(
            ["size", "min", "max"]
        )
        out = pd.DataFrame(
            {"session_events": per["size"].to_numpy().astype(np.int64),
             "dur": (per["max"] - per["min"]).to_numpy().astype(np.int64)}
        )
        hist = out.groupby("session_events", as_index=False, sort=False).agg(
            n_sessions=("dur", "size"), total_duration_us=("dur", "sum")
        )
        return hist.astype(cols)

    partials = (
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
        .map_batches(add_ub, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return bucketed_agg(
        partials,
        keys=["session_events"],
        sum_cols={"n_sessions": "n_sessions",
                  "total_duration_us": "total_duration_us"},
    )


@register(
    "funnel_stages",
    """
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
           JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
           WHERE e.event_type = 'click' GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
           JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
           WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT 1 AS stage, 'signup' AS step, (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    """,
    doc="Ordered funnel conversion (signup -> click -> purchase, each "
    "step STRICTLY after the user's earliest completion of the "
    "previous step — the product-analytics classic; over a crawl log "
    "the same shape measures seed -> listing -> leaf progression per "
    "host).  Distributed shape: one pass filters to the 3 step types "
    "and projects (user, ts, type) only; ONE coarse user%%64 shuffle "
    "co-locates each user's rows; per bucket three vectorized "
    "groupby-min passes chain the strictly-after rule (per-user work "
    "never leaves the bucket), emitting (stage, n_users) partials; "
    "ONE bucketed sum -> 3 rows.  Output is constant-size at any "
    "corpus scale.",
)
def funnel_stages(sf_dir: str, steps: tuple = ("signup", "click", "purchase")):
    from .stages.relational import bucketed_agg

    def add_ub(t: pa.Table) -> pd.DataFrame:
        cols = {"user_id": "int64", "tus": "int64", "et": "object", "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        mask = pc.is_in(t["event_type"], value_set=pa.array(list(steps)))
        t = t.filter(mask)
        uid = t["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": uid,
                "tus": t["ts"].cast(pa.int64()).to_numpy(),
                "et": t["event_type"].to_pandas().to_numpy(),
                "ub": (uid % 64).astype("int32"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"stage": "int64", "step": "object", "n_users": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        prev = None  # Series: user_id -> completion time of previous stage
        rows = []
        for i, step in enumerate(steps):
            sub = g[g["et"] == step]
            if prev is not None:
                sub = sub.merge(prev.rename("tprev"), left_on="user_id",
                                right_index=True)
                sub = sub[sub["tus"] > sub["tprev"]]
            cur = sub.groupby("user_id")["tus"].min()
            rows.append({"stage": i + 1, "step": step, "n_users": len(cur)})
            prev = cur
        return pd.DataFrame(rows).astype(cols)

    partials = (
        _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
        .map_batches(add_ub, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return bucketed_agg(
        partials,
        keys=["stage", "step"],
        sum_cols={"n_users": "n_users"},
        key_dtypes={"stage": "int64", "step": "object"},
    )


@register(
    "mg_topk_terms",
    """
    WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
    c AS (SELECT term, count(*) AS n FROM t GROUP BY term)
    SELECT term, n FROM c ORDER BY n DESC, term LIMIT 20
    """,
    doc="Exact top-k heavy hitters via a Misra-Gries sketch + exact "
    "recount (the bounded-memory frequent-items pattern: at 100 TB a "
    "full term-count shuffle moves the whole vocabulary; MG moves "
    "<= capacity counters per block).  Pass 1: per-batch "
    "value_counts compressed to MG capacity C (subtract the (C+1)-th "
    "largest count, drop <=0; per-batch decrement d_b recorded) -> "
    "repartition(1) merge (groupby-sum of underestimates).  Any term "
    "with true count > DELTA = sum(d_b) has a positive estimate in "
    "some batch, so the merged summary contains every such term.  "
    "Pass 2: broadcast the candidate set, exact per-batch counts of "
    "candidates ONLY, one bucketed sum, top-k by (n desc, term).  "
    "The result is CERTIFIED exact iff the k-th count > DELTA "
    "(asserted in tests; holds for Zipf text at C=4096).  Shuffle "
    "volume: pass 1 <= C rows/block, pass 2 <= |candidates| "
    "rows/block — text and vocabulary never move.",
)
def mg_topk_terms(sf_dir: str, k: int = 20, capacity: int = 4096):
    import ray
    from .stages.relational import bucketed_agg

    docs = _read(sf_dir, "documents", columns=["text"])

    def mg_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"term": "object", "est": "int64", "dec": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        vc = pd.Series(toks.to_pandas().to_numpy(), dtype="object").value_counts()
        dec = 0
        if len(vc) > capacity:
            dec = int(vc.iloc[capacity])  # (C+1)-th largest
            vc = vc - dec
            vc = vc[vc > 0]
        out = pd.DataFrame({"term": vc.index.to_numpy(dtype="object"),
                            "est": vc.to_numpy().astype(np.int64)})
        out["dec"] = np.int64(0)
        if len(out):
            out.loc[out.index[0], "dec"] = np.int64(dec)
        else:
            out = pd.DataFrame({"term": pd.Series([""], dtype="object"),
                                "est": pd.Series([0], dtype="int64"),
                                "dec": pd.Series([dec], dtype="int64")})
        return out

    def mg_merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"term": "object", "est": "int64", "delta": "int64"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        delta = int(df["dec"].sum())
        m = df.groupby("term", as_index=False, sort=False)["est"].sum()
        m = m[m["est"] > 0]
        m["delta"] = np.int64(delta)
        return m.astype(cols)

    summary = (
        docs.map_batches(mg_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(mg_merge, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    cand = summary["term"].to_numpy(dtype="object")
    cand_ref = ray.put(set(cand.tolist()))

    def exact_counts(t: pa.Table) -> pd.DataFrame:
        cols = {"term": "object", "n": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        cs = ray.get(cand_ref)
        toks = pd.Series(
            pc.list_flatten(pc.split_pattern(t["text"], " ")).to_pandas().to_numpy(),
            dtype="object",
        )
        vc = toks[toks.isin(cs)].value_counts()
        return pd.DataFrame({"term": vc.index.to_numpy(dtype="object"),
                             "n": vc.to_numpy().astype(np.int64)})

    exact = bucketed_agg(
        docs.map_batches(exact_counts, batch_format="pyarrow"),
        keys=["term"],
        sum_cols={"n": "n"},
        key_dtypes={"term": "object"},
    )
    return (
        exact.repartition(4)
        .sort(["n", "term"], descending=[True, False])
        .limit(k)
    )


@register(
    "terasort_rank",
    """
    SELECT event_id,
           row_number() OVER (ORDER BY value, event_id) AS rnk
    FROM events
    """,
    doc="Sample-partitioned global ranking (the TeraSort pattern: "
    "curriculum ordering / global quantile assignment at 100 TB "
    "cannot ds.sort-then-enumerate on the driver).  Phase 0: a "
    "deterministic per-block sample (every 64th row) -> driver "
    "computes B-1 range cutpoints (tiny).  Phase 1: batches assign "
    "partition ids by searchsorted (side='right', so EQUAL values "
    "always land in ONE partition and within-partition (value, "
    "event_id) order is globally correct).  Phase 2: per-partition "
    "COUNTS (tiny) -> driver exclusive prefix offsets.  Phase 3: one "
    "range shuffle; each partition sorts locally and adds its "
    "offset.  Rows cross the wire ONCE; the driver only ever sees "
    "samples and counts.  Boundary choice affects balance, never "
    "correctness.",
)
def terasort_rank(sf_dir: str, n_parts: int = 32, sample_every: int = 64):
    import ray
    from .stages.relational import bucketed_agg

    ev = _read(sf_dir, "events", columns=["event_id", "value"]).materialize()

    def sample(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], type=pa.float64())})
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(v[::sample_every], type=pa.float64())})

    samp = np.sort(
        ev.map_batches(sample, batch_format="pyarrow").to_pandas()["v"].to_numpy()
    )
    if len(samp) >= n_parts:
        cuts = samp[np.linspace(1, len(samp) - 1, n_parts - 1).astype(int)]
    else:
        cuts = samp[:0]
    cuts_ref = ray.put(np.unique(cuts))

    def add_pid(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], type=pa.int64()),
                 "value": pa.array([], type=pa.float64()),
                 "pid": pa.array([], type=pa.int32())}
            )
        c = ray.get(cuts_ref)
        v = t["value"].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(c, v, side="right").astype(np.int32)
        return pa.table(
            {"event_id": t["event_id"].cast(pa.int64()),
             "value": t["value"].cast(pa.float64()),
             "pid": pa.array(pid, type=pa.int32())}
        )

    withpid = ev.map_batches(add_pid, batch_format="pyarrow").materialize()

    def pid_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pid": pa.array([], type=pa.int32()),
                             "cnt": pa.array([], type=pa.int64())})
        c = pa.table({"pid": t["pid"]}).group_by("pid").aggregate([([], "count_all")])
        return c.rename_columns(["pid", "cnt"])

    counts = (
        withpid.map_batches(pid_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby("pid")["cnt"]
        .sum()
        .sort_index()
    )
    pids = counts.index.to_numpy(dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(counts.to_numpy(dtype=np.int64))[:-1]])
    offs_ref = ray.put(dict(zip(pids.tolist(), offs.tolist())))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": "int64", "rnk": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        base = ray.get(offs_ref)[int(g["pid"].iloc[0])]
        g = g.sort_values(["value", "event_id"], kind="stable")
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy().astype(np.int64),
             "rnk": np.arange(1, len(g) + 1, dtype=np.int64) + np.int64(base)}
        )

    return withpid.groupby("pid").map_groups(rank_part, batch_format="pandas")


@register(
    "shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5)
               AS BIGINT)) AS BIGINT) AS revenue_cents,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_cents DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping-priority: the classic 3-table star join "
    "(dim filter -> fact semi-join -> fact-fact hash join -> top-k).  "
    "Distributed shape: customer is filtered to ONE segment and only "
    "its custkeys broadcast (a sorted int64 array, ~1/5 of customers "
    "— past a broadcast cap this side becomes a bucketed join like "
    "bigram_lm_score's); orders filters by date + broadcast-isin and "
    "projects 4 columns; lineitem filters by shipdate and "
    "pre-aggregates per-batch (orderkey, revenue_cents) partials "
    "BEFORE any shuffle (the Q1 combiner pattern), so the join "
    "carries partial sums, never line items.  ONE orderkey%%64 "
    "co-shuffle of both tiny streams, per-bucket pandas merge + "
    "final sum, then a global top-10 by (revenue desc, date, "
    "orderkey).  Revenue is exact integer cents (floor(x*100+0.5)) "
    "so distributed summation order cannot change the hash.",
)
def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      date: str = "1998-06-01", k: int = 10):
    import ray

    D = pd.Timestamp(date)

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: pa.table(
                {"ck": t.filter(pc.equal(t["c_mktsegment"], segment))["c_custkey"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["ck"]
        .to_numpy()
    )
    ck_ref = ray.put(np.sort(cust))

    def orders_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "o_orderdate": "datetime64[us]",
                "o_orderpriority": "object", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(D)))
        cks = ray.get(ck_ref)
        keep = np.isin(t["o_custkey"].to_numpy().astype(np.int64), cks)
        ok = t["o_orderkey"].to_numpy().astype(np.int64)[keep]
        return pd.DataFrame(
            {"ok": ok,
             "o_orderdate": t["o_orderdate"].to_pandas().to_numpy()[keep],
             "o_orderpriority": t["o_orderpriority"].to_pandas().to_numpy()[keep],
             "ob": (ok % 64).astype("int32")}
        )

    def lineitem_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "rev": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(D)))
        rev = cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"])))
        df = pd.DataFrame({"ok": t["l_orderkey"].to_numpy().astype(np.int64),
                           "rev": rev.to_numpy().astype(np.int64)})
        out = df.groupby("ok", as_index=False, sort=False)["rev"].sum()
        out["ob"] = (out["ok"].to_numpy() % 64).astype("int32")
        return out

    ords = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_side, batch_format="pyarrow")
    lis = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(lineitem_side, batch_format="pyarrow")

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    both = ords.map_batches(tag("o"), batch_format="pandas").union(
        lis.map_batches(tag("l"), batch_format="pandas")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"l_orderkey": "int64", "revenue_cents": "int64",
                "o_orderdate": "datetime64[us]", "o_orderpriority": "object"}
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        o = g[g["side"] == "o"]
        l = g[g["side"] == "l"]
        if len(o) == 0 or len(l) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        lsum = l.groupby("ok", as_index=False, sort=False)["rev"].sum()
        m = lsum.merge(o[["ok", "o_orderdate", "o_orderpriority"]], on="ok")
        if len(m) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = pd.DataFrame(
            {"l_orderkey": m["ok"].to_numpy().astype(np.int64),
             "revenue_cents": m["rev"].to_numpy().astype(np.int64),
             "o_orderdate": m["o_orderdate"].to_numpy(),
             "o_orderpriority": m["o_orderpriority"].to_numpy()}
        )
        # local top-k prune: only k rows per bucket can reach the global top-k
        out = out.sort_values(
            ["revenue_cents", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True], kind="stable",
        ).head(k)
        return out.astype(cols)

    joined = both.groupby("ob").map_groups(join_bucket, batch_format="pandas")
    return (
        joined.repartition(4)
        .sort(["revenue_cents", "o_orderdate", "l_orderkey"],
              descending=[True, False, False])
        .limit(k)
    )


# =====================================================================
# Session 15 — span integrity audit, politeness schedule, budget
# apportionment
# =====================================================================


def _audit_spans(t: pa.Table) -> pa.Table:
    """Per-batch span-integrity partials (module-level so tests can
    feed a deliberately corrupted span column through the REAL
    measurement kernel and assert the violation counters fire)."""
    empty = pa.table(
        {
            "kind": pa.array([], pa.string()),
            "n_spans": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "total_chars": pa.array([], pa.int64()),
            "n_nonmono": pa.array([], pa.int64()),
            "max_offset": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    sc = t["spans"]
    spans = sc.chunk(0) if sc.num_chunks == 1 else sc.combine_chunks()
    flat = spans.flatten()
    if len(flat) == 0:
        return empty
    parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
    kind = flat.field("kind").to_pandas().to_numpy()
    off = flat.field("offset").to_numpy().astype(np.int64)
    chars = pc.utf8_length(flat.field("text")).to_numpy().astype(np.int64)
    # monotonicity within a document: previous span's offset
    nonmono = np.zeros(len(off), dtype=bool)
    if len(off) > 1:
        nonmono[1:] = (parent[1:] == parent[:-1]) & (off[1:] < off[:-1])
    kcodes, kinv = np.unique(kind, return_inverse=True)
    rows = []
    for ki, kname in enumerate(kcodes):
        m = kinv == ki
        rows.append(
            {
                "kind": str(kname),
                "n_spans": int(m.sum()),
                "n_docs": int(len(np.unique(parent[m]))),
                "total_chars": int(chars[m].sum()),
                "n_nonmono": int(nonmono[m].sum()),
                "max_offset": int(off[m].max()),
            }
        )
    out = pd.DataFrame(rows)
    return pa.Table.from_pandas(out, preserve_index=False)


@register(
    "span_integrity_audit",
    """
    WITH ts AS (
      SELECT d.doc_id, d.n_chars, t.j
      FROM documents d,
           unnest(generate_series(0, (d.n_chars + 63) // 64 - 1)) AS t(j)),
    sp AS (
      SELECT doc_id, 'text' AS kind, CAST(j * 64 AS BIGINT) AS off,
             CAST(least(64, n_chars - j * 64) AS BIGINT) AS chars,
             2 * j AS ord
      FROM ts
      UNION ALL
      SELECT doc_id,
             CASE (doc_id + j) % 3
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
             END,
             CAST(least((j + 1) * 64, n_chars) AS BIGINT),
             CAST(0 AS BIGINT), 2 * j + 1
      FROM ts WHERE (doc_id * 31 + j) % 5 = 0),
    w AS (SELECT *,
                 lag(off) OVER (PARTITION BY doc_id ORDER BY ord) AS poff
          FROM sp)
    SELECT kind,
           count(*) AS n_spans,
           count(DISTINCT doc_id) AS n_docs,
           CAST(sum(chars) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN poff IS NOT NULL AND off < poff
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_nonmono,
           max(off) AS max_offset
    FROM w GROUP BY kind
    """,
    doc="Span-sequence integrity audit over the REAL nested input_hint "
    "column (spans: list<struct<kind,text,media_ref,offset>>) — the "
    "per-row invariant the graft's input_hint names (span kind / text "
    "/ order / offset consistency) certified END-TO-END: the Ray side "
    "MEASURES per-kind span counts, distinct owning docs, total text "
    "chars, offset-monotonicity violations and max offset off the "
    "actual flattened struct child arrays (flatten + "
    "list_parent_indices + a shifted same-parent offset comparison), "
    "while the oracle RE-DERIVES the same figures from the synthesis "
    "contract arithmetic (generate_series tiling + lag window).  Any "
    "span builder bug — wrong interleave order, off-by-one offsets, "
    "dropped/duplicated spans, mis-sliced text — shows up as a "
    "count/chars/monotonicity mismatch.  Distributed shape: spans are "
    "document-local, so the audit is ONE streamed map_batches chain "
    "emitting <=4 fixed partial rows per batch (kind, sums, max); the "
    "final groupby touches a few dozen rows.  n_docs is summable "
    "because each document's span list lives in exactly one row.",
)
def span_integrity_audit(sf_dir: str):
    from ray.data.aggregate import Max, Sum

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(_build_span_column, batch_format="pyarrow")
        .map_batches(_audit_spans, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(
            Sum("n_spans", alias_name="n_spans"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
            Sum("n_nonmono", alias_name="n_nonmono"),
            Max("max_offset", alias_name="max_offset"),
        )
    )


@register(
    "politeness_schedule",
    """
    WITH e AS (
      SELECT user_id % 64 AS host, ts, event_id,
             50 + (event_id % 97) AS d
      FROM events),
    s AS (
      SELECT host,
             coalesce(sum(d) OVER (PARTITION BY host ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS fetch_at
      FROM e)
    SELECT host, count(*) AS n_urls,
           CAST(max(fetch_at) AS BIGINT) AS makespan_ms,
           CAST(sum(fetch_at) AS BIGINT) AS total_wait_ms
    FROM s GROUP BY host
    """,
    doc="Per-host politeness scheduling — the reference's "
    "PolitenessClock semantics (get-and-wait crawl.clj sleeps; "
    "stages/fetch.py:141) as an oracle-gated query: every URL owed to "
    "a host is scheduled at the CUMULATIVE sum of the per-URL crawl "
    "delays of the URLs dequeued before it (per-URL delay = 50 + "
    "event_id %% 97 ms, a robots Crawl-delay that varies per URL), in "
    "the deterministic discovery order (ts, event_id).  Reported per "
    "host: queue length, makespan (last fetch start) and total wait — "
    "the figures a frontier scheduler needs to balance host shards.  "
    "Distributed shape: ONE coarse host shuffle (hosts are the "
    "partition key exactly as the crawl frontier partitions); per "
    "bucket a single vectorized pass sorts (host, ts, event_id) and "
    "takes a segmented exclusive cumsum (np.cumsum minus own delay, "
    "rebased per host via the first-index trick) — no per-URL Python "
    "loop; partial rows per bucket are one per host, so the final "
    "merge is tiny.  Integer-exact throughout (ms as int64).",
)
def politeness_schedule(sf_dir: str):
    def add_hb(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {"host": pd.Series([], dtype="int64"),
                 "ts": pd.Series([], dtype="int64"),
                 "event_id": pd.Series([], dtype="int64"),
                 "d": pd.Series([], dtype="int64"),
                 "hb": pd.Series([], dtype="int32")}
            )
        eid = t["event_id"].to_numpy().astype(np.int64)
        host = (t["user_id"].to_numpy().astype(np.int64)) % 64
        return pd.DataFrame(
            {
                "host": host,
                "ts": t["ts"].cast(pa.int64()).to_numpy(),
                "event_id": eid,
                "d": 50 + (eid % 97),
                "hb": (host % 32).astype("int32"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"host": "int64", "n_urls": "int64",
                "makespan_ms": "int64", "total_wait_ms": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["host", "ts", "event_id"], kind="stable")
        host = g["host"].to_numpy()
        d = g["d"].to_numpy()
        # segmented EXCLUSIVE prefix sum: rebase the running cumsum at
        # each host boundary (first index of each host segment)
        cs = np.cumsum(d) - d
        first = np.zeros(len(g), dtype=bool)
        first[0] = True
        first[1:] = host[1:] != host[:-1]
        base = np.where(first, cs, 0)
        np.maximum.accumulate(base, out=base)
        fetch_at = cs - base
        out = pd.DataFrame({"host": host, "fa": fetch_at})
        gb = out.groupby("host", as_index=False, sort=False)["fa"]
        agg = gb.agg(["count", "max", "sum"])
        return pd.DataFrame(
            {"host": agg["host"].to_numpy().astype(np.int64),
             "n_urls": agg["count"].to_numpy().astype(np.int64),
             "makespan_ms": agg["max"].to_numpy().astype(np.int64),
             "total_wait_ms": agg["sum"].to_numpy().astype(np.int64)}
        )

    return (
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
        .map_batches(add_hb, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(per_bucket, batch_format="pandas")
    )


@register(
    "crawl_budget_allocation",
    _LINK_SQL_CTE
    + """,
    h AS (SELECT target % 101 AS host, count(*) AS c
          FROM l GROUP BY target % 101),
    t AS (SELECT sum(c) AS tc FROM h),
    q AS (SELECT host, c,
                 (1000000 * c) // (SELECT tc FROM t) AS base,
                 (1000000 * c) % (SELECT tc FROM t) AS rem
          FROM h),
    lft AS (SELECT 1000000 - sum(base) AS lv FROM q),
    r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, host ASC) AS rk
          FROM q)
    SELECT host, CAST(c AS BIGINT) AS n_pages,
           CAST(base + CASE WHEN rk <= (SELECT lv FROM lft)
                            THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM r
    """,
    doc="Crawl-budget apportionment: distribute a fixed fetch budget "
    "(B = 1,000,000) across hosts proportionally to their observed "
    "page mass using the LARGEST-REMAINDER method (Hamilton "
    "apportionment), so per-host quotas are integers that sum to "
    "EXACTLY B — the frontier-scheduler allocation step for a "
    "fixed-size crawl round.  quota_i = B*c_i // C plus one bonus "
    "unit for the (B - sum(base)) largest remainders (ties broken by "
    "smaller host id) — integer-exact on both sides, no floats "
    "anywhere.  Distributed shape: per-batch partial (host, count) "
    "over the exploded link graph (the same count-combiner shape as "
    "link_graph_degree), ONE tiny groupby sum bounded by the host "
    "space (101 rows), then the apportionment itself runs vectorized "
    "on the driver over that bounded host table (np.argsort on "
    "(−rem, host)) — driver state is O(hosts), never O(links).",
)
def crawl_budget_allocation(sf_dir: str, budget: int = 1_000_000):
    from ray.data.aggregate import Sum

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"host": pa.array([], pa.int64()),
                             "pn": pa.array([], pa.int64())})
        host = _explode_links(t, n_docs) % 101
        hu, cnt = np.unique(host, return_counts=True)
        return pa.table({"host": pa.array(hu.astype(np.int64)),
                         "pn": pa.array(cnt.astype(np.int64))})

    counts = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("pn", alias_name="c"))
        .to_pandas()  # bounded by the host space (101 rows), not links
    )
    host = counts["host"].to_numpy().astype(np.int64)
    c = counts["c"].to_numpy().astype(np.int64)
    total = int(c.sum())
    base = (budget * c) // total
    rem = (budget * c) % total
    leftover = budget - int(base.sum())
    # largest-remainder winners: top-`leftover` by (rem desc, host asc)
    order = np.lexsort((host, -rem))
    bonus = np.zeros(len(host), dtype=np.int64)
    bonus[order[:leftover]] = 1
    return pa.table(
        {
            "host": pa.array(host),
            "n_pages": pa.array(c),
            "quota": pa.array(base + bonus),
        }
    )


@register(
    "edit_distance_neardup",
    """
    WITH v AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 40000000, 'zqzq' || substr(text, 5)
      FROM documents WHERE doc_id % 10 = 0),
    b AS (SELECT doc_id, text, md5(right(text, 24)) AS bh FROM v),
    cand AS (
      SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
             a.text AS ta, b2.text AS tb
      FROM b a JOIN b b2 ON a.bh = b2.bh AND a.doc_id < b2.doc_id)
    SELECT id_a, id_b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(ta, tb) <= 8
    """,
    doc="Edit-distance near-duplicate detection — the CHARACTER-level "
    "dedup modality (OCR noise, boilerplate injections, small "
    "head-edits) that token-set similarity (minhash/ngram Jaccard) "
    "and SimHash structurally miss: a 4-char head substitution leaves "
    "Levenshtein <= 4 while shifting every token boundary.  Planted "
    "variants (doc_id%%10==0 -> id+40M, first 4 chars replaced) must "
    "all surface at dist <= 4.  Candidates: docs sharing the md5-128 "
    "of their LAST 24 chars (a head-edit-invariant blocking key; both "
    "sides group on the identical key so candidate sets agree by "
    "construction), verified with the exact bit-parallel Myers "
    "Levenshtein (functions/similarity.py::levenshtein — fuzzed equal "
    "to the DP and to DuckDB's levenshtein()).  Distributed shape: "
    "pass 1 ships only (h1, h2, doc_id) 24-byte rows (text never "
    "enters the blocking shuffle); candidate pairs come from a "
    "bucketed group on the 128-bit key; BELOW verify_broadcast_cap "
    "candidate texts are fetched by a broadcast-id filter scan and "
    "verified in an actor-pool map over the pair table (gmap via "
    "ray.put, once per actor); past the cap the IMPLEMENTED join "
    "regime attaches text_a/text_b with two hash joins (the "
    "containment_join shape) — forced-regime equality is tested.",
)
def edit_distance_neardup(
    sf_dir: str, threshold: int = 8, verify_broadcast_cap: int = 100_000
):
    import hashlib

    import ray

    from .functions.similarity import levenshtein

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        m = ids % 10 == 0
        if not m.any():
            return t.select(["doc_id", "text"])
        txt = t["text"].to_pandas().to_numpy()
        vids = ids[m] + 40_000_000
        vtxt = np.array(["zqzq" + s[4:] for s in txt[m]], dtype=object)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([ids, vids])),
                "text": pa.array(np.concatenate([txt, vtxt]), type=pa.string()),
            }
        )

    planted = docs.map_batches(plant, batch_format="pyarrow")

    def block_keys(t: pa.Table) -> pd.DataFrame:
        cols = {"h1": "int64", "h2": "int64", "doc_id": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ids = t["doc_id"].to_numpy().astype(np.int64)
        h1 = np.empty(len(ids), dtype=np.int64)
        h2 = np.empty(len(ids), dtype=np.int64)
        for i, s in enumerate(t["text"].to_pandas().to_numpy()):
            dg = hashlib.md5(s[-24:].encode()).digest()
            h1[i] = int.from_bytes(dg[:8], "little") - (1 << 63)
            h2[i] = int.from_bytes(dg[8:], "little") - (1 << 63)
        return pd.DataFrame({"h1": h1, "h2": h2, "doc_id": ids})

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("h1", "h2", "doc_id")})
        df = df.copy()
        df["__b"] = (df["h1"].to_numpy() % 64).astype("int32")
        return df

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"id_a": "int64", "id_b": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["h1", "h2", "doc_id"], kind="stable")
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        ids = g["doc_id"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        gid = np.cumsum(first) - 1
        # vectorized within-group pair generation over sorted runs
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(g)))
        out_a, out_b = [], []
        for s, z in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            seg = ids[s : s + z]
            ia, ib = np.triu_indices(z, k=1)
            out_a.append(seg[ia])
            out_b.append(seg[ib])
        if not out_a:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a).astype(np.int64),
             "id_b": np.concatenate(out_b).astype(np.int64)}
        )

    pairs = (
        planted.map_batches(block_keys, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .materialize()  # id pairs only — bounded by blocking-key collisions
    )

    cand_df = pairs.to_pandas()
    if len(cand_df) == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "dist": pa.array([], pa.int64())}
        )
    cand_ids = np.unique(
        np.concatenate([cand_df["id_a"].to_numpy(), cand_df["id_b"].to_numpy()])
    ).astype(np.int64)

    empty_out = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
         "dist": pa.array([], pa.int64())}
    )

    if len(cand_ids) <= verify_broadcast_cap:
        idref = ray.put(cand_ids)

        def fetch(t: pa.Table) -> pa.Table:
            want = ray.get(idref)
            ids = t["doc_id"].to_numpy().astype(np.int64)
            pos = np.searchsorted(want, ids)
            pos[pos >= len(want)] = len(want) - 1
            m = want[pos] == ids
            return pa.table({"doc_id": pa.array(ids[m]), "text": t["text"].filter(pa.array(m))})

        texts = planted.map_batches(fetch, batch_format="pyarrow").to_pandas()
        gmap = dict(zip(texts["doc_id"].astype(np.int64), texts["text"]))
        gref = ray.put(gmap)

        class Verify:
            def __init__(self):
                self.g = ray.get(gref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                if df.shape[1] == 0 or len(df) == 0:
                    return pd.DataFrame(
                        {"id_a": pd.Series([], dtype="int64"),
                         "id_b": pd.Series([], dtype="int64"),
                         "dist": pd.Series([], dtype="int64")}
                    )
                d = np.fromiter(
                    (levenshtein(self.g[a], self.g[b])
                     for a, b in zip(df["id_a"], df["id_b"])),
                    dtype=np.int64, count=len(df),
                )
                m = d <= threshold
                return pd.DataFrame(
                    {"id_a": df["id_a"].to_numpy()[m].astype(np.int64),
                     "id_b": df["id_b"].to_numpy()[m].astype(np.int64),
                     "dist": d[m]}
                )

        out = pairs.map_batches(Verify, batch_format="pandas", concurrency=2)
        res = out.to_pandas()
        return pa.Table.from_pandas(
            res.astype({"id_a": "int64", "id_b": "int64", "dist": "int64"}),
            preserve_index=False,
        ) if len(res) else empty_out

    # join regime: attach text_a / text_b with two hash joins, verify
    # inside the join output batches — no driver-side text table
    texts_ds = planted.materialize()
    n_parts = max(2, min(16, len(cand_df) // 25_000))
    j1 = pairs.join(
        texts_ds, join_type="inner", num_partitions=n_parts,
        on=("id_a",), right_on=("doc_id",),
    ).map_batches(
        lambda t: pa.table({"id_a": t["id_a"], "id_b": t["id_b"], "ta": t["text"]})
        if t.num_rows
        else pa.table({"id_a": pa.array([], pa.int64()),
                       "id_b": pa.array([], pa.int64()),
                       "ta": pa.array([], pa.string())}),
        batch_format="pyarrow",
    ).materialize()
    j2 = j1.join(
        texts_ds, join_type="inner", num_partitions=n_parts,
        on=("id_b",), right_on=("doc_id",),
    )

    def verify_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return empty_out
        ta = t["ta"].to_pandas().to_numpy()
        tb = t["text"].to_pandas().to_numpy()
        d = np.fromiter(
            (levenshtein(a, b) for a, b in zip(ta, tb)),
            dtype=np.int64, count=len(ta),
        )
        m = d <= threshold
        return pa.table(
            {"id_a": pa.array(t["id_a"].to_numpy().astype(np.int64)[m]),
             "id_b": pa.array(t["id_b"].to_numpy().astype(np.int64)[m]),
             "dist": pa.array(d[m])}
        )

    return j2.map_batches(verify_joined, batch_format="pyarrow")


@register(
    "ngram_novelty",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, t[j]||' '||t[j+1]||' '||t[j+2]||' '||t[j+3] AS g
      FROM toks, unnest(generate_series(1, len(t)-3)) AS s(j)),
    own AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY g) AS owner
            FROM grams)
    SELECT doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN doc_id = owner THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel
    FROM own GROUP BY doc_id
    """,
    doc="N-gram novelty scoring — the data-pruning / curriculum signal "
    "(how much of a document's 4-gram vocabulary is FIRST INTRODUCED "
    "by that document, first-owner = corpus-wide min doc_id): docs "
    "with near-zero novelty are recombinations of earlier text and "
    "prime prune candidates; the same statistic ranks crawl frontiers "
    "by expected new-content yield.  Distributed shape: ONE gram pass "
    "emits per-doc DISTINCT (h1, h2, doc_id) md5-128 triples (gram "
    "TEXT never shuffles — the segment_dedup rule); a bucketed group "
    "on the hash marks each occurrence novel iff its doc_id equals "
    "the group min and emits per-doc partial (n, novel) counts; ONE "
    "bucketed sum keyed by doc_id finishes.  Both sides dedup grams "
    "per doc and group by the identical 128-bit key, so they agree "
    "by construction.",
)
def ngram_novelty(sf_dir: str, n: int = 4):
    import hashlib

    from .stages.relational import bucketed_agg

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"h1": "int64", "h2": "int64", "doc_id": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out_h1, out_h2, out_d = [], [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            tk = txt.split(" ")
            seen = {
                " ".join(tk[j : j + n]) for j in range(len(tk) - n + 1)
            }
            for g in seen:
                dg = hashlib.md5(g.encode()).digest()
                out_h1.append(int.from_bytes(dg[:8], "little") - (1 << 63))
                out_h2.append(int.from_bytes(dg[8:], "little") - (1 << 63))
                out_d.append(did)
        return pd.DataFrame(
            {"h1": pd.Series(out_h1, dtype="int64"),
             "h2": pd.Series(out_h2, dtype="int64"),
             "doc_id": pd.Series(out_d, dtype="int64")}
        )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("h1", "h2", "doc_id")})
        df = df.copy()
        df["__b"] = (df["h1"].to_numpy() % 64).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": "int64", "n_grams": "int64", "n_novel": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["h1", "h2", "doc_id"], kind="stable")
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        ids = g["doc_id"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        # group min doc_id = the id at each group's first (sorted) row
        starts = np.flatnonzero(first)
        owner = np.repeat(ids[starts], np.diff(np.append(starts, len(g))))
        df = pd.DataFrame({"doc_id": ids, "novel": (ids == owner).astype(np.int64)})
        gb = df.groupby("doc_id", as_index=False, sort=False)["novel"]
        agg = gb.agg(["count", "sum"])
        return pd.DataFrame(
            {"doc_id": agg["doc_id"].to_numpy().astype(np.int64),
             "n_grams": agg["count"].to_numpy().astype(np.int64),
             "n_novel": agg["sum"].to_numpy().astype(np.int64)}
        )

    partials = (
        docs.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return bucketed_agg(
        partials, keys=["doc_id"],
        sum_cols={"n_grams": "n_grams", "n_novel": "n_novel"},
    )


@register(
    "hits_scores",
    _LINK_SQL_CTE.replace(
        "SELECT (d.doc_id*131", "SELECT d.doc_id AS src, (d.doc_id*131"
    )
    + """,
    lu AS (SELECT DISTINCT src, target FROM l WHERE target != src),
    a1 AS (SELECT target AS v, 1000 * count(*) AS a FROM lu GROUP BY target),
    h1 AS (SELECT lu.src AS v, CAST(sum(a1.a) AS BIGINT) AS h
           FROM lu JOIN a1 ON a1.v = lu.target GROUP BY lu.src),
    a2 AS (SELECT lu.target AS v, CAST(sum(h1.h) AS BIGINT) AS a
           FROM lu JOIN h1 ON h1.v = lu.src GROUP BY lu.target)
    SELECT coalesce(h1.v, a2.v) AS node,
           coalesce(h1.h, 0) AS hub,
           coalesce(a2.a, 0) AS auth
    FROM h1 FULL OUTER JOIN a2 ON h1.v = a2.v
    """,
    doc="HITS hubs & authorities (Kleinberg) — the link-analysis "
    "complement to PageRank's random surfer: auth(p) = sum of hub "
    "scores linking TO p, hub(p) = sum of auth scores p links to, "
    "two synchronous half-rounds unrolled (hub0 = 1000 for every "
    "node, so a1 = 1000*indeg, then h1 = sum_out a1, a2 = sum_in "
    "h1) with NO normalization — bounded rounds keep raw integer "
    "sums exact on both sides, so the unrolled-CTE oracle pins "
    "every score.  Distributed shape: the deduped edge table "
    "materializes once (int64 pairs); each half-round broadcasts "
    "the previous score vector as ONE dense int64 array via "
    "ray.put (8 bytes/node — 800 MB at 100M nodes, the documented "
    "broadcast cap) and streams the edges ONCE with per-batch "
    "(node, partial-sum) combiners into a bucketed sum; past the "
    "cap the bucketed-join regime applies exactly as "
    "label_prop_rounds implements for the same dense-propagation "
    "shape.  The hub/auth outer merge is a tagged union + ONE "
    "bucketed two-column sum — no driver-side join.",
)
def hits_scores(sf_dir: str):
    import ray

    from .stages.relational import bucketed_agg

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"src": "int64", "tgt": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        tgt = _explode_links(t, n_docs)
        ids = t["doc_id"].to_numpy()
        k = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, k)
        keep = src != tgt
        packed = np.unique(src[keep] * np.int64(n_docs) + tgt[keep])
        return pd.DataFrame(
            {"src": (packed // n_docs).astype(np.int64),
             "tgt": (packed % n_docs).astype(np.int64)}
        )

    edges = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow")
        .materialize()  # int64 pairs; streamed once per half-round
    )

    def halfround(score_ref, from_col: str, to_col: str):
        """ONE edge stream: out[v] = sum over edges of score[from] grouped
        by to — the dense-broadcast propagation shape."""

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            cols = {"v": "int64", "s": "int64"}
            if df.shape[1] == 0 or len(df) == 0:
                return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
            vec = ray.get(score_ref)
            s = vec[df[from_col].to_numpy()]
            m = s != 0
            out = pd.DataFrame({"v": df[to_col].to_numpy()[m], "s": s[m]})
            return out.groupby("v", as_index=False, sort=False)["s"].sum()

        return bucketed_agg(
            edges.map_batches(partial, batch_format="pandas"),
            keys=["v"], sum_cols={"s": "s"},
        )

    hub0 = np.full(n_docs, 1000, dtype=np.int64)
    a1_df = halfround(ray.put(hub0), "src", "tgt").to_pandas()
    a1 = np.zeros(n_docs, dtype=np.int64)
    a1[a1_df["v"].to_numpy().astype(np.int64)] = a1_df["s"].to_numpy()
    h1_ds = halfround(ray.put(a1), "tgt", "src")
    h1_df = h1_ds.to_pandas()
    h1 = np.zeros(n_docs, dtype=np.int64)
    h1[h1_df["v"].to_numpy().astype(np.int64)] = h1_df["s"].to_numpy()
    a2_ds = halfround(ray.put(h1), "src", "tgt")

    # outer merge hub/auth: tagged union + ONE bucketed two-column sum
    def tag_h(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("node", "hub", "auth")})
        return pd.DataFrame({"node": df["v"].astype(np.int64),
                             "hub": df["s"].astype(np.int64),
                             "auth": np.zeros(len(df), dtype=np.int64)})

    def tag_a(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("node", "hub", "auth")})
        return pd.DataFrame({"node": df["v"].astype(np.int64),
                             "hub": np.zeros(len(df), dtype=np.int64),
                             "auth": df["s"].astype(np.int64)})

    both = h1_ds.map_batches(tag_h, batch_format="pandas").union(
        a2_ds.map_batches(tag_a, batch_format="pandas")
    )
    return bucketed_agg(both, keys=["node"],
                        sum_cols={"hub": "hub", "auth": "auth"})


@register(
    "semantic_decontamination",
    """
    WITH ev AS (
      SELECT vec_id AS eid, embedding FROM embeddings WHERE vec_id % 37 = 0),
    tr AS (
      SELECT vec_id AS did, embedding FROM embeddings WHERE vec_id % 37 != 0
      UNION ALL
      SELECT eid + 50000000, list_transform(embedding, x -> x * 2) FROM ev),
    eq AS (SELECT eid, g.i AS i,
                  CAST(floor(CAST(embedding[g.i + 1] AS DOUBLE) * 256) AS BIGINT) AS v
           FROM ev, unnest(generate_series(0, 63)) AS g(i)),
    tq AS (SELECT did, g.i AS i,
                  CAST(floor(CAST(embedding[g.i + 1] AS DOUBLE) * 256) AS BIGINT) AS v
           FROM tr, unnest(generate_series(0, 63)) AS g(i)),
    en AS (SELECT eid, sum(v * v) AS n2 FROM eq GROUP BY eid),
    tn AS (SELECT did, sum(v * v) AS n2 FROM tq GROUP BY did),
    dots AS (SELECT eid, did, CAST(sum(eq.v * tq.v) AS BIGINT) AS dot
             FROM eq JOIN tq USING (i) GROUP BY eid, did)
    SELECT did, CAST(count(*) AS BIGINT) AS n_hits
    FROM dots JOIN en USING (eid) JOIN tn USING (did)
    WHERE dot > 0 AND dot * dot * 65536 >= 243 * 243 * en.n2 * tn.n2
    GROUP BY did
    """,
    doc="Embedding-space decontamination — the SEMANTIC complement to "
    "the n-gram `decontamination` op (paraphrased eval leakage that "
    "token overlap misses): flag every training vector whose cosine "
    "against ANY eval-set vector (vec_id %% 37 == 0) reaches theta = "
    "243/256 ~ 0.949.  NO sqrt anywhere: cos >= theta iff dot > 0 AND "
    "dot^2 * 256^2 >= thq^2 * |a|^2 * |b|^2 over floor(x*256) "
    "integer-quantized components (bounds: dot <= 64*256^2 so every "
    "term < 2^62).  Planted contamination: each eval vector re-enters "
    "the training side at id+50M SCALED BY 2 — cosine-invariant, so "
    "the norm cross-multiplication (not raw dot compare) is what the "
    "oracle certifies.  Distributed shape: the quantized eval matrix "
    "+ its norm vector broadcast ONCE via ray.put; each training "
    "batch runs ONE int64 matmul against all eval vectors and emits "
    "only flagged (did, n_hits) rows — NO shuffle at all; eval sets "
    "are fixed-size benchmark suites in practice, so the broadcast "
    "is O(|eval|), independent of corpus size.",
)
def semantic_decontamination(sf_dir: str, thq: int = 243):
    import ray

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    # eval side: bounded benchmark set — ONE filtered scan, quantize
    ev = emb.filter(lambda r: r["vec_id"] % 37 == 0).to_pandas()
    eids = ev["vec_id"].to_numpy().astype(np.int64)
    E = np.floor(
        np.stack([np.asarray(v, dtype=np.float64) for v in ev["embedding"]]) * 256
    ).astype(np.int64)
    en2 = (E * E).sum(axis=1)
    eref = ray.put((E, en2))

    def scan(t: pa.Table) -> pd.DataFrame:
        cols = {"did": "int64", "n_hits": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ids = t["vec_id"].to_numpy().astype(np.int64)
        M = np.floor(list_col_to_matrix(t["embedding"]).astype(np.float64) * 256).astype(np.int64)
        is_ev = ids % 37 == 0
        # training side: non-eval rows + planted x2-scaled eval copies
        tm = np.concatenate([M[~is_ev], np.floor(
            list_col_to_matrix(t["embedding"]).astype(np.float64)[is_ev] * 2 * 256
        ).astype(np.int64)])
        tid = np.concatenate([ids[~is_ev], ids[is_ev] + 50_000_000])
        if len(tid) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        Eq, en2_ = ray.get(eref)
        dots = tm @ Eq.T  # ONE matmul scores the whole batch
        tn2 = (tm * tm).sum(axis=1)
        ok = (dots > 0) & (
            dots * dots * 65536 >= (thq * thq) * tn2[:, None] * en2_[None, :]
        )
        n = ok.sum(axis=1)
        m = n > 0
        return pd.DataFrame({"did": tid[m], "n_hits": n[m].astype(np.int64)})

    return emb.map_batches(scan, batch_format="pyarrow")


@register(
    "corpus_diversity",
    """
    WITH s AS (SELECT doc_id, text FROM documents
               WHERE doc_id % 17 = 0 AND doc_id < 1700),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM s),
    grams AS (
      SELECT DISTINCT doc_id, t[j]||' '||t[j+1]||' '||t[j+2]||' '||t[j+3] AS g
      FROM toks, unnest(generate_series(1, len(t)-3)) AS s2(j)),
    sz AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
    pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, a.sz AS sa, b.sz AS sb
              FROM sz a JOIN sz b ON a.doc_id < b.doc_id),
    inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM grams a JOIN grams b
                ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    jq AS (SELECT p.da, p.db,
                  (1024 * coalesce(i.i, 0))
                    // (p.sa + p.sb - coalesce(i.i, 0)) AS q
           FROM pairs p LEFT JOIN inter i
             ON p.da = i.da AND p.db = i.db)
    SELECT q // 128 AS bucket, count(*) AS n_pairs
    FROM jq GROUP BY q // 128
    """,
    doc="Corpus diversity datasheet (the self-BLEU-style redundancy "
    "probe of generation-quality and corpus-health reports): a "
    "BOUNDED deterministic sample (doc_id %% 17 == 0 AND doc_id < "
    "1700 — at most 100 docs at ANY corpus size) is measured "
    "all-pairs for 4-gram Jaccard, quantized to (1024*i)//(union) "
    "and histogrammed in 8 buckets — a right-shifted histogram "
    "means the corpus is self-repetitive.  ZERO-intersection pairs "
    "are counted too (the LEFT JOIN both sides — a join-only "
    "intersection histogram silently drops disjoint pairs).  "
    "Distributed shape: gram extraction runs in the scan "
    "(per-batch, per-doc distinct gram hashes); only the sampled "
    "docs' bounded hash lists reach the driver (<= 100 sorted int64 "
    "arrays), where the all-pairs intersection is vectorized "
    "np.intersect1d — O(sample^2) driver work on an O(1) sample, "
    "independent of corpus size.",
)
def corpus_diversity(sf_dir: str, n: int = 4):
    import hashlib

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_lists(t: pa.Table) -> pd.DataFrame:
        cols = {"doc_id": "int64", "hashes": "object"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ids = t["doc_id"].to_numpy().astype(np.int64)
        m = (ids % 17 == 0) & (ids < 1700)
        if not m.any():
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out_id, out_h = [], []
        for did, txt in zip(ids[m], t["text"].to_pandas().to_numpy()[m]):
            tk = txt.split(" ")
            gs = {" ".join(tk[j : j + n]) for j in range(len(tk) - n + 1)}
            hs = np.sort(np.fromiter(
                (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
                 - (1 << 63) for g in gs),
                dtype=np.int64, count=len(gs),
            ))
            out_id.append(int(did))
            out_h.append(hs)
        return pd.DataFrame({"doc_id": pd.Series(out_id, dtype="int64"),
                             "hashes": pd.Series(out_h, dtype="object")})

    sampled = docs.map_batches(gram_lists, batch_format="pyarrow").to_pandas()
    sampled = sampled.sort_values("doc_id").reset_index(drop=True)
    hs = list(sampled["hashes"])
    k = len(hs)
    counts = np.zeros(9, dtype=np.int64)  # jq/128 in 0..8 (jq <= 1024)
    for a in range(k):
        sa = len(hs[a])
        for b in range(a + 1, k):
            i = len(np.intersect1d(hs[a], hs[b], assume_unique=True))
            jq = (1024 * i) // (sa + len(hs[b]) - i)
            counts[jq // 128] += 1
    nz = np.flatnonzero(counts)
    return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                     "n_pairs": pa.array(counts[nz])})


@register(
    "retrieval_eval",
    """
    WITH probes AS (
      SELECT doc_id AS qid,
             array_to_string((string_split(text, ' '))[11:15], ' ') AS phrase
      FROM documents
      WHERE doc_id % 23 = 0 AND doc_id < 2300
        AND len(string_split(text, ' ')) >= 15),
    m AS (
      SELECT p.qid, d.doc_id,
             (len(d.text) - len(replace(d.text, p.phrase, '')))
               // len(p.phrase) AS occ
      FROM probes p JOIN documents d ON contains(d.text, p.phrase)),
    r AS (
      SELECT qid, doc_id, occ,
             row_number() OVER (PARTITION BY qid
                                ORDER BY occ DESC, doc_id) AS rk
      FROM m),
    g AS (
      SELECT qid, max(CASE WHEN doc_id = qid THEN rk END) AS grk
      FROM r WHERE rk <= 10 GROUP BY qid)
    SELECT count(*) AS n_queries,
           CAST(sum(CASE WHEN grk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hit_at_10,
           CAST(sum(coalesce(1024 // grk, 0)) AS BIGINT) AS mrr_q
    FROM probes LEFT JOIN g USING (qid)
    """,
    doc="Retrieval evaluation harness — the EVAL-side operator every "
    "retrieval/dedup stack needs (recall@k + integer-quantized MRR "
    "against planted gold): probe queries are 5-token phrases sliced "
    "from a BOUNDED deterministic doc sample (doc_id %% 23 == 0 AND "
    "< 2300, <= 100 probes at any corpus size), gold = the source "
    "doc; retrieval ranks docs by exact non-overlapping phrase "
    "occurrence count (ties -> doc_id) — pc.count_substring on the "
    "Ray side, the length-difference replace() idiom in SQL, "
    "fuzz-equal counting conventions.  MRR is integer-exact: "
    "sum(1024 // gold_rank) over ranks <= 10.  Distributed shape: "
    "the bounded probe set broadcasts once; ONE corpus scan runs "
    "|probes| vectorized count_substring kernels per batch and "
    "emits only MATCHING (qid, doc_id, occ) rows (sparse — phrase "
    "matches are rare); per-qid ranking is a tiny groupby over "
    "match sets; the metrics row is a bounded fold.",
)
def retrieval_eval(sf_dir: str, k: int = 10):
    import ray

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def probe_scan(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        m = (ids % 23 == 0) & (ids < 2300)
        out_q, out_p = [], []
        if m.any():
            for did, txt in zip(ids[m], t["text"].to_pandas().to_numpy()[m]):
                tk = txt.split(" ")
                if len(tk) >= 15:
                    out_q.append(int(did))
                    out_p.append(" ".join(tk[10:15]))
        return pa.table({"qid": pa.array(out_q, type=pa.int64()),
                         "phrase": pa.array(out_p, type=pa.string())})

    probes = docs.map_batches(probe_scan, batch_format="pyarrow").to_pandas()
    plist = list(zip(probes["qid"].astype(int), probes["phrase"]))
    pref = ray.put(plist)

    def match_scan(t: pa.Table) -> pa.Table:
        empty = pa.table({"qid": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "occ": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        ids = t["doc_id"].to_numpy().astype(np.int64)
        txt = t["text"]
        out_q, out_d, out_o = [], [], []
        for qid, phrase in ray.get(pref):
            occ = pc.count_substring(txt, phrase).to_numpy().astype(np.int64)
            nz = np.flatnonzero(occ)
            out_q.append(np.full(len(nz), qid, dtype=np.int64))
            out_d.append(ids[nz])
            out_o.append(occ[nz])
        if not out_q:
            return empty
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d)),
                         "occ": pa.array(np.concatenate(out_o))})

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"qid": "int64", "grk": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["occ", "doc_id"], ascending=[False, True], kind="stable")
        qid = int(g["qid"].iloc[0])
        ranks = np.arange(1, len(g) + 1)
        gold = ranks[g["doc_id"].to_numpy() == qid]
        grk = int(gold[0]) if len(gold) else 0  # 0 = gold missing entirely
        return pd.DataFrame({"qid": [qid], "grk": [grk]})

    ranks = (
        docs.map_batches(match_scan, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(rank_group, batch_format="pandas")
        .to_pandas()  # one row per probe — bounded
    )
    grk = dict(zip(ranks["qid"].astype(int), ranks["grk"].astype(int)))
    n_hit = sum(1 for q, _ in plist if 1 <= grk.get(q, 0) <= k)
    mrr = sum(1024 // grk[q] for q, _ in plist if 1 <= grk.get(q, 0) <= k)
    return pa.table({"n_queries": pa.array([len(plist)], type=pa.int64()),
                     "n_hit_at_10": pa.array([n_hit], type=pa.int64()),
                     "mrr_q": pa.array([mrr], type=pa.int64())})


@register(
    "recrawl_priority",
    """
    WITH mx AS (SELECT max(ts) AS m FROM events),
    e AS (SELECT user_id % 64 AS host,
                 (epoch_us((SELECT m FROM mx)) - epoch_us(ts))
                   // 86400000000 AS age
          FROM events)
    SELECT host, count(*) AS n_events,
           CAST(sum(1 << CAST(greatest(9 - age, 0) AS INTEGER)) AS BIGINT)
             AS score
    FROM e GROUP BY host
    """,
    doc="Recrawl priority scoring — freshness-decayed host activity "
    "(the change-rate signal a crawl scheduler uses to decide which "
    "hosts to revisit first): each observed event contributes "
    "2^max(0, 9 - age_days) so today's activity weighs 512x a "
    "ten-day-old one, with decay as EXACT integer bit-shifts (no "
    "exp(), no floats — the halving-per-day analog of exponential "
    "decay both sides mirror bit-for-bit).  age_days is floor "
    "microsecond arithmetic against the corpus max timestamp, NOT "
    "calendar-day diffs (date_diff counts boundary crossings and "
    "would diverge).  Distributed shape: one bounded max(ts) "
    "aggregate; then per-batch (host, score, n) partials -> ONE "
    "tiny groupby sum bounded by the host space.",
)
def recrawl_priority(sf_dir: str):
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    mx = ev.max("ts")  # bounded scalar aggregate
    mx_us = int(pd.Timestamp(mx).value // 1000)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"host": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        host = t["user_id"].to_numpy().astype(np.int64) % 64
        tus = t["ts"].cast(pa.int64()).to_numpy()
        age = (mx_us - tus) // 86_400_000_000
        shift = np.maximum(9 - age, 0)
        w = np.int64(1) << shift
        df = pd.DataFrame({"host": host, "score": w})
        gb = df.groupby("host", as_index=False, sort=False)["score"]
        agg = gb.agg(["count", "sum"])
        return pa.table({"host": pa.array(agg["host"].to_numpy().astype(np.int64)),
                         "n_events": pa.array(agg["count"].to_numpy().astype(np.int64)),
                         "score": pa.array(agg["sum"].to_numpy().astype(np.int64))})

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("score", alias_name="score"))
    )


@register(
    "alias_resolution",
    """
    WITH n AS (SELECT count(*) AS c FROM documents),
    f AS (SELECT doc_id AS v,
                 CASE WHEN doc_id % 7 = 0
                      THEN (doc_id * 17 + 3) % (SELECT c FROM n)
                      ELSE doc_id END AS t
          FROM documents),
    j1 AS (SELECT a.v, b.t FROM f a JOIN f b ON b.v = a.t),
    j2 AS (SELECT a.v, b.t FROM j1 a JOIN j1 b ON b.v = a.t),
    j3 AS (SELECT a.v, b.t FROM j2 a JOIN j2 b ON b.v = a.t)
    SELECT v, t AS resolved FROM j3 WHERE v % 7 = 0
    """,
    doc="Redirect/alias chain resolution by POINTER JUMPING (path "
    "doubling) — the classic O(log L) distributed primitive for "
    "functional graphs (redirect chains, canonical-URL aliases, "
    "symlink forests): alias nodes (doc_id %% 7 == 0) point at "
    "(v*17+3) %% n, everything else is a fixpoint; THREE squaring "
    "rounds compose f^2, f^4, f^8, so chains up to 8 hops resolve in "
    "3 shuffles instead of 8 sequential lookups (cycles are fine — "
    "both sides compute the same f^8).  Distributed shape: each "
    "round is ONE left-outer hash self-join of the CURRENT pointer "
    "table on t = v (Ray Dataset.join; the alias table is sparse — "
    "n/7 rows — and rows never grow across rounds), coalescing "
    "unmatched t (pointer already at a fixpoint) — no dense array, "
    "no driver state, no broadcast cap.  The SQL mirror is the same "
    "three self-joins unrolled.",
)
def alias_resolution(sf_dir: str, rounds: int = 3):
    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def pointers(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        ids = t["doc_id"].to_numpy().astype(np.int64)
        tgt = np.where(ids % 7 == 0, (ids * 17 + 3) % n_docs, ids)
        return pa.table({"v": pa.array(ids), "t": pa.array(tgt)})

    cur = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(pointers, batch_format="pyarrow")
        .materialize()
    )
    n_parts = max(2, min(8, n_docs // 25_000))
    for _ in range(rounds):
        joined = cur.join(
            cur, join_type="left_outer", num_partitions=n_parts,
            on=("t",), right_on=("v",), right_suffix="_r",
        )

        def square(t: pa.Table) -> pa.Table:
            empty = pa.table({"v": pa.array([], pa.int64()),
                              "t": pa.array([], pa.int64())})
            if t.num_rows == 0 or "v" not in t.column_names:
                return empty
            tt = t["t_r" if "t_r" in t.column_names else "t"]
            # unmatched rows keep their current pointer (fixpoint)
            new_t = pc.coalesce(t["t_r"], t["t"]) if "t_r" in t.column_names else t["t"]
            return pa.table({"v": pc.cast(t["v"], pa.int64()),
                             "t": pc.cast(new_t, pa.int64())})

        # repartition concatenates the join's schemaless empty blocks
        # into typed ones (see graph_random_walks) before the next join
        cur = joined.map_batches(square, batch_format="pyarrow").repartition(
            n_parts
        ).materialize()

    def only_aliases(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "v" not in t.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "resolved": pa.array([], pa.int64())})
        v = t["v"].to_numpy().astype(np.int64)
        m = v % 7 == 0
        return pa.table({"v": pa.array(v[m]),
                         "resolved": pa.array(t["t"].to_numpy().astype(np.int64)[m])})

    return cur.map_batches(only_aliases, batch_format="pyarrow")


@register(
    "edge_reciprocity",
    _LINK_SQL_CTE.replace(
        "SELECT (d.doc_id*131", "SELECT d.doc_id AS src, (d.doc_id*131"
    )
    + """,
    lu AS (SELECT DISTINCT src, target FROM l WHERE src != target),
    p AS (SELECT least(src, target) AS a, greatest(src, target) AS b,
                 count(*) AS c
          FROM lu GROUP BY 1, 2)
    SELECT (SELECT count(*) FROM lu) AS n_edges,
           CAST(coalesce(sum(CASE WHEN c = 2 THEN 2 ELSE 0 END), 0) AS BIGINT)
             AS n_reciprocal
    FROM p
    """,
    doc="Link-graph reciprocity — the fraction of directed edges whose "
    "reverse edge also exists (mutual-link density separates organic "
    "link graphs from link farms; on a social graph it is the "
    "follow-back rate).  Exact, not sampled: distinct directed edges "
    "group by their UNORDERED pair key (least, greatest — two int64 "
    "key columns, no packing, so node ids up to 2^63 never overflow), "
    "a pair with both directions has group count 2.  Distributed "
    "shape: per-batch distinct edge explode (int pairs only), ONE "
    "bucketed count on the unordered key, then a fixed-width "
    "per-batch fold (n_pairs, n_recip partials) into a single row.  "
    "No driver state beyond two counters.",
)
def edge_reciprocity(sf_dir: str):
    from ray.data.aggregate import Sum

    from .stages.relational import bucketed_agg

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        tgt = _explode_links(t, n_docs)
        ids = t["doc_id"].to_numpy()
        k = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, k)
        keep = src != tgt
        packed = np.unique(src[keep] * np.int64(n_docs) + tgt[keep])
        s = (packed // n_docs).astype(np.int64)
        g = (packed % n_docs).astype(np.int64)
        return pd.DataFrame({"a": np.minimum(s, g), "b": np.maximum(s, g)})

    pairs = bucketed_agg(
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow"),
        keys=["a", "b"], sum_cols={"__count__": "c"},
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_edges": "int64", "n_reciprocal": "int64"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        c = df["c"].to_numpy()
        return pd.DataFrame({"n_edges": [int(c.sum())],
                             "n_reciprocal": [int(2 * (c == 2).sum())]})

    from ray.data.aggregate import Sum as _S

    out = (
        pairs.map_batches(fold, batch_format="pandas")
        .groupby(None)
        .aggregate(_S("n_edges", alias_name="n_edges"),
                   _S("n_reciprocal", alias_name="n_reciprocal"))
        .to_pandas()
    )
    return pa.table({"n_edges": pa.array(out["n_edges"].astype("int64")),
                     "n_reciprocal": pa.array(out["n_reciprocal"].astype("int64"))})


@register(
    "host_graph_condense",
    _LINK_SQL_CTE.replace(
        "SELECT (d.doc_id*131", "SELECT d.doc_id AS src, (d.doc_id*131"
    )
    + """
    SELECT src % 101 AS hs, target % 101 AS ht, count(*) AS n_links
    FROM l GROUP BY 1, 2
    ORDER BY n_links DESC, hs, ht LIMIT 20
    """,
    doc="Host-graph condensation — collapse the page-level link graph "
    "onto its host partition (src host -> target host, link "
    "multiplicity preserved) and report the top inter-host edges: "
    "the summarization a crawl scheduler uses for cross-shard "
    "traffic estimates and host-level politeness budgeting.  "
    "Distributed shape: the condensed edge space is BOUNDED by "
    "hosts^2 (not pages), so per-batch partial (hs, ht, n) counts "
    "are fixed-width; ONE tiny groupby sum + a 20-row sort/limit "
    "finish.  Page-level links never shuffle — only bounded host-"
    "pair counts.",
)
def host_graph_condense(sf_dir: str, k: int = 20):
    from ray.data.aggregate import Sum

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def explode(t: pa.Table) -> pa.Table:
        empty = pa.table({"hs": pa.array([], pa.int64()),
                          "ht": pa.array([], pa.int64()),
                          "pn": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        tgt = _explode_links(t, n_docs)
        ids = t["doc_id"].to_numpy()
        kk = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, kk)
        key = (src % 101) * 101 + (tgt % 101)
        ku, cnt = np.unique(key, return_counts=True)
        return pa.table({"hs": pa.array((ku // 101).astype(np.int64)),
                         "ht": pa.array((ku % 101).astype(np.int64)),
                         "pn": pa.array(cnt.astype(np.int64))})

    summed = (
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["hs", "ht"])
        .aggregate(Sum("pn", alias_name="n_links"))
    )
    return (
        summed.repartition(4)
        .sort(["n_links", "hs", "ht"], descending=[True, False, False])
        .limit(k)
    )


@register(
    "corpus_drift",
    """
    WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
    c AS (SELECT source, w, count(*) AS c FROM t GROUP BY 1, 2),
    n AS (SELECT source, sum(c) AS n FROM c GROUP BY 1),
    p AS (SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
          FROM n a JOIN n b ON a.source < b.source),
    allw AS (SELECT DISTINCT w FROM c),
    grid AS (SELECT p.sa, p.sb, p.na, p.nb, allw.w
             FROM p CROSS JOIN allw),
    j AS (SELECT g.sa, g.sb, g.na, g.nb,
                 abs(coalesce(ca.c, 0) * g.nb - coalesce(cb.c, 0) * g.na)
                   AS dev
          FROM grid g
          LEFT JOIN c ca ON ca.source = g.sa AND ca.w = g.w
          LEFT JOIN c cb ON cb.source = g.sb AND cb.w = g.w)
    SELECT sa, sb,
           CAST((1024 * sum(dev)) // (any_value(na) * any_value(nb))
                AS BIGINT) AS drift_q
    FROM j GROUP BY sa, sb
    """,
    doc="Inter-source distribution drift — the corpus-health monitor "
    "that catches a scraper change, a source gone spammy, or a "
    "mixture shift between snapshots: pairwise L1 distance between "
    "per-source term distributions, INTEGER-exact via cross-"
    "multiplication (|c_a*n_b - c_b*n_a| summed over the term union, "
    "quantized (1024*sum)//(n_a*n_b) — 0 = identical mix, 2048 = "
    "disjoint).  Distributed shape: ONE bucketed (source, term) "
    "count shuffle (counts only — text never moves); the folded "
    "count table is bounded by sources x vocabulary and the pairwise "
    "fold runs vectorized on the driver in EXACT Python ints (no "
    "int64 overflow at any corpus size, the dsir_resample rule).  "
    "At open web vocabulary, prune to the top-V terms by a first "
    "count pass (the token_rarity_buckets shape) before folding — "
    "the testdata vocabulary is bounded, so the exact path is the "
    "oracle contract here.",
)
def corpus_drift(sf_dir: str):
    from .stages.relational import bucketed_agg

    docs = _read(sf_dir, "documents", columns=["source", "text"])

    def counts(t: pa.Table) -> pd.DataFrame:
        cols = {"source": "object", "w": "object", "c": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        src = t["source"].to_pandas().to_numpy()
        out = {}
        for s, txt in zip(src, t["text"].to_pandas().to_numpy()):
            for w in txt.split(" "):
                out[(s, w)] = out.get((s, w), 0) + 1
        ks = list(out)
        return pd.DataFrame(
            {"source": pd.Series([k[0] for k in ks], dtype="object"),
             "w": pd.Series([k[1] for k in ks], dtype="object"),
             "c": pd.Series([out[k] for k in ks], dtype="int64")}
        )

    tbl = bucketed_agg(
        docs.map_batches(counts, batch_format="pyarrow"),
        keys=["source", "w"], sum_cols={"c": "c"},
        key_dtypes={"source": "object", "w": "object"},
    ).to_pandas()  # bounded by sources x vocabulary

    sources = sorted(tbl["source"].unique())
    vocab = {w: i for i, w in enumerate(sorted(tbl["w"].unique()))}
    V = len(vocab)
    mats = {s: np.zeros(V, dtype=np.int64) for s in sources}
    for s, w, c in zip(tbl["source"], tbl["w"], tbl["c"]):
        mats[s][vocab[w]] = c
    totals = {s: int(mats[s].sum()) for s in sources}
    out_a, out_b, out_d = [], [], []
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            na, nb = totals[sa], totals[sb]
            # exact Python ints: c*n products can exceed int64 at scale
            dev = sum(
                abs(int(ca) * nb - int(cb) * na)
                for ca, cb in zip(mats[sa], mats[sb])
            )
            out_a.append(sa)
            out_b.append(sb)
            out_d.append((1024 * dev) // (na * nb))
    return pa.table({"sa": pa.array(out_a, type=pa.string()),
                     "sb": pa.array(out_b, type=pa.string()),
                     "drift_q": pa.array(out_d, type=pa.int64())})


@register(
    "host_burstiness",
    """
    WITH e AS (SELECT user_id % 64 AS host, ts, event_id FROM events),
    g AS (SELECT host,
                 (epoch_us(ts) - epoch_us(lag(ts) OVER
                    (PARTITION BY host ORDER BY ts, event_id)))
                   // 1000000 AS d
          FROM e),
    s AS (SELECT host, count(*) AS n, sum(d) AS sd, sum(d * d) AS sdd
          FROM g WHERE d IS NOT NULL GROUP BY host)
    SELECT host, CAST(n AS BIGINT) AS n_gaps,
           CAST((1024 * n * sdd) // (sd * sd) AS BIGINT) AS cv2_q
    FROM s WHERE sd > 0
    """,
    doc="Per-host temporal burstiness — the squared coefficient of "
    "variation of inter-event gaps (quantized 1024*n*sum(d^2) // "
    "(sum d)^2: ~1024 for a Poisson host, >>1024 for bursty "
    "crawl-trap-like traffic, <1024 for metronomic schedules): the "
    "signal a politeness scheduler uses to distinguish steady "
    "publishers from bursty ones when budgeting revisits.  Gaps in "
    "whole seconds via floor division (epoch microsecond arithmetic "
    "— both sides identical).  Distributed shape: ONE coarse host "
    "shuffle; per bucket a vectorized sort + segmented diff "
    "(boundary rows masked by comparing the shifted host column) "
    "and per-host (n, sum, sumsq) int64 partials; the final CV "
    "quotient is computed per host in exact Python ints (the "
    "products exceed int64 at large time spans).",
)
def host_burstiness(sf_dir: str):
    def add_hb(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {"host": pd.Series([], dtype="int64"),
                 "tus": pd.Series([], dtype="int64"),
                 "event_id": pd.Series([], dtype="int64"),
                 "hb": pd.Series([], dtype="int32")}
            )
        host = t["user_id"].to_numpy().astype(np.int64) % 64
        return pd.DataFrame(
            {"host": host,
             "tus": t["ts"].cast(pa.int64()).to_numpy(),
             "event_id": t["event_id"].to_numpy().astype(np.int64),
             "hb": (host % 32).astype("int32")}
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"host": "int64", "n_gaps": "int64", "cv2_q": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["host", "tus", "event_id"], kind="stable")
        host = g["host"].to_numpy()
        tus = g["tus"].to_numpy()
        d = np.empty(len(g), dtype=np.int64)
        d[0] = -1
        d[1:] = np.where(host[1:] == host[:-1],
                         (tus[1:] - tus[:-1]) // 1_000_000, -1)
        m = d >= 0
        df = pd.DataFrame({"host": host[m], "d": d[m], "dd": d[m] * d[m]})
        gb = df.groupby("host", sort=False)
        out_h, out_n, out_cv = [], [], []
        for h, gg in gb:
            n = len(gg)
            sd = int(gg["d"].sum())
            sdd = int(gg["dd"].sum())
            if sd > 0:
                out_h.append(int(h))
                out_n.append(n)
                out_cv.append((1024 * n * sdd) // (sd * sd))
        return pd.DataFrame({"host": pd.Series(out_h, dtype="int64"),
                             "n_gaps": pd.Series(out_n, dtype="int64"),
                             "cv2_q": pd.Series(out_cv, dtype="int64")})

    return (
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
        .map_batches(add_hb, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(per_bucket, batch_format="pandas")
    )


@register(
    "weak_label_vote",
    """
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS tk
               FROM documents),
    r AS (
      SELECT doc_id, lang,
             sign(len(list_filter(tk, x -> x = 'fast'))
                  - len(list_filter(tk, x -> x = 'slow'))) AS r1,
             sign(len(list_filter(tk, x -> x = 'big'))
                  - len(list_filter(tk, x -> x = 'small'))) AS r2,
             sign(len(list_filter(tk, x -> x = 'batch'))
                  - len(list_filter(tk, x -> x = 'row'))) AS r3
      FROM d),
    v AS (SELECT lang, sign(r1 + r2 + r3) AS vote,
                 CASE WHEN r1 != 0 AND r1 = r2 AND r2 = r3
                      THEN 1 ELSE 0 END AS unanimous
          FROM r)
    SELECT lang,
           CAST(sum(CASE WHEN vote = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           CAST(sum(CASE WHEN vote = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg,
           CAST(sum(CASE WHEN vote = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_abstain,
           CAST(sum(unanimous) AS BIGINT) AS n_unanimous
    FROM v GROUP BY lang
    """,
    doc="Weak-supervision label model (the Snorkel-style programmatic "
    "labeling step of classifier-based quality filtering: K noisy "
    "keyword labeling functions vote per document, majority wins, "
    "ties abstain): three token-count sign rules (fast vs slow, big "
    "vs small, batch vs row) combine by sign-of-sum; per-lang tallies "
    "plus the unanimity count (all three rules fire AND agree — the "
    "high-precision subset a seed classifier trains on).  Counting "
    "is whole-TOKEN exact on both sides (factorize + bincount per "
    "batch on the Ray side, list_filter on split tokens in SQL — "
    "substring counting would differ).  Distributed shape: pure "
    "per-batch map emitting <=|langs| fixed partial rows; ONE tiny "
    "groupby sum; labels never materialize per doc outside the "
    "scan.",
)
def weak_label_vote(sf_dir: str):
    from ray.data.aggregate import Sum

    TERMS = ["fast", "slow", "big", "small", "batch", "row"]

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"lang": "object", "n_pos": "int64", "n_neg": "int64",
                "n_abstain": "int64", "n_unanimous": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        toks = [txt.split(" ") for txt in t["text"].to_pylist()]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array([w for doc in toks for w in doc], dtype=object)
        codes, uniq = pd.factorize(flat)
        rows = np.repeat(np.arange(len(toks)), lens)
        cnt = np.zeros((6, len(toks)), dtype=np.int64)
        for ti, term in enumerate(TERMS):
            hit = np.where(uniq == term)[0]
            if len(hit):
                sel = codes == hit[0]
                cnt[ti] = np.bincount(rows[sel], minlength=len(toks))
        r1 = np.sign(cnt[0] - cnt[1])
        r2 = np.sign(cnt[2] - cnt[3])
        r3 = np.sign(cnt[4] - cnt[5])
        vote = np.sign(r1 + r2 + r3)
        unan = (r1 != 0) & (r1 == r2) & (r2 == r3)
        df = pd.DataFrame(
            {"lang": t["lang"].to_pandas().to_numpy(),
             "n_pos": (vote == 1).astype(np.int64),
             "n_neg": (vote == -1).astype(np.int64),
             "n_abstain": (vote == 0).astype(np.int64),
             "n_unanimous": unan.astype(np.int64)}
        )
        return df.groupby("lang", as_index=False, sort=False).sum()

    return (
        _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_pos", alias_name="n_pos"),
                   Sum("n_neg", alias_name="n_neg"),
                   Sum("n_abstain", alias_name="n_abstain"),
                   Sum("n_unanimous", alias_name="n_unanimous"))
    )


@register(
    "calibration_bins",
    """
    WITH b AS (
      SELECT least(greatest(CAST(floor(CAST(embedding[1] AS DOUBLE) * 8)
                                 AS BIGINT) + 4, 0), 7) AS bin,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos
      FROM embeddings)
    SELECT bin, count(*) AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos
    FROM b GROUP BY bin
    """,
    doc="Model calibration bins — the reliability-diagram input of "
    "classifier-quality auditing (does a score bucket's empirical "
    "positive rate track the score?): predictions are binned by the "
    "first embedding component (floor(x*8)+4 clamped to 8 bins — "
    "the quantization both sides mirror on float64-widened values), "
    "actual = label == 0; output (bin, n, n_pos) is the exact "
    "integer contingency the ECE/reliability curve derives from.  "
    "Distributed shape: pure per-batch map -> 8 fixed partial rows "
    "per batch -> ONE tiny groupby sum; O(1) driver state.",
)
def calibration_bins(sf_dir: str):
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"bin": "int64", "n": "int64", "n_pos": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        M = list_col_to_matrix(t["embedding"]).astype(np.float64)
        b = np.clip(np.floor(M[:, 0] * 8).astype(np.int64) + 4, 0, 7)
        pos = (t["label"].to_numpy().astype(np.int64) == 0).astype(np.int64)
        df = pd.DataFrame({"bin": b, "n": np.ones(len(b), dtype=np.int64),
                           "n_pos": pos})
        return df.groupby("bin", as_index=False, sort=False).sum()

    return (
        _read(sf_dir, "embeddings", columns=["embedding", "label"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("n_pos", alias_name="n_pos"))
    )


@register(
    "regional_volume",
    """
    SELECT n.n_name,
           CAST(sum(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5)
               AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA' AND ns.n_regionkey = r.r_regionkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-shape regional volume: the 6-table snowflake join "
    "(region -> nation -> customer AND supplier, orders, lineitem) "
    "with an intra-region supplier constraint.  Distributed shape: "
    "region+nation are read driver-side (25 rows at ANY scale); the "
    "region's customer keys -> nationkey map and supplier-key set "
    "are filtered BEFORE broadcast (sorted int64 arrays via ray.put, "
    "~1/5 of each dim; past a broadcast cap these sides become "
    "bucketed joins like bigram_lm_score's).  orders filters by the "
    "date window + searchsorted custkey lookup and emits (orderkey, "
    "cust_nation); lineitem filters by the supplier set and "
    "pre-aggregates (orderkey, revenue_cents) partials per batch "
    "BEFORE the shuffle.  ONE orderkey%%64 co-shuffle joins the two "
    "tiny streams; per-bucket partials are (nationkey, cents) rows; "
    "the final groupby is |nations-in-region| wide.  Revenue is "
    "exact integer cents so summation order cannot change the hash.",
)
def regional_volume(sf_dir: str, region: str = "ASIA",
                    lo: str = "1996-01-01", hi: str = "1999-01-01"):
    import ray
    from ray.data.aggregate import Sum

    LO, HI = pd.Timestamp(lo), pd.Timestamp(hi)

    # tiny dims, driver-side (25 nations / 5 regions at any scale)
    reg = pq.read_table(_pq(sf_dir, "region")).to_pandas()
    nat = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    rk = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nat_in = nat[nat["n_regionkey"] == rk]
    nk_set = np.sort(nat_in["n_nationkey"].to_numpy().astype(np.int64))
    nk_name = dict(zip(nat_in["n_nationkey"].astype(int), nat_in["n_name"]))

    def _keyed_filter(tbl: str, key: str, natcol: str):
        """(sorted keys, nationkeys) for dim rows whose nation is in-region."""
        df = (
            _read(sf_dir, tbl, columns=[key, natcol])
            .map_batches(
                lambda t: pa.table({
                    "k": t[key].cast(pa.int64()),
                    "n": t[natcol].cast(pa.int64()),
                }).filter(pc.is_in(pc.cast(t[natcol], pa.int64()),
                                   value_set=pa.array(nk_set))),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        order = np.argsort(df["k"].to_numpy())
        return df["k"].to_numpy().astype(np.int64)[order], df["n"].to_numpy().astype(np.int64)[order]

    ck, cnk = _keyed_filter("customer", "c_custkey", "c_nationkey")
    sk, _ = _keyed_filter("supplier", "s_suppkey", "s_nationkey")
    cust_ref = ray.put((ck, cnk))
    supp_ref = ray.put(sk)

    def orders_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "cnk": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], pa.scalar(LO)),
                             pc.less(t["o_orderdate"], pa.scalar(HI))))
        cks, cnks = ray.get(cust_ref)
        c = t["o_custkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(cks, c)
        pos[pos >= len(cks)] = 0 if len(cks) else 0
        hit = len(cks) > 0
        keep = (cks[pos] == c) if hit else np.zeros(len(c), dtype=bool)
        ok = t["o_orderkey"].to_numpy().astype(np.int64)[keep]
        return pd.DataFrame({"ok": ok, "cnk": cnks[pos[keep]],
                             "ob": (ok % 64).astype("int32")})

    def lineitem_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "rev": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        sks = ray.get(supp_ref)
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(sks, s)
        pos[pos >= len(sks)] = 0 if len(sks) else 0
        keep = (sks[pos] == s) if len(sks) else np.zeros(len(s), dtype=bool)
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        rev = cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"])))
        df = pd.DataFrame({"ok": t["l_orderkey"].to_numpy().astype(np.int64),
                           "rev": rev.to_numpy().astype(np.int64)})
        out = df.groupby("ok", as_index=False, sort=False)["rev"].sum()
        out["ob"] = (out["ok"].to_numpy() % 64).astype("int32")
        return out

    ords = _read(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"]
                 ).map_batches(orders_side, batch_format="pyarrow")
    lis = _read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                         "l_discount"]
                ).map_batches(lineitem_side, batch_format="pyarrow")

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    both = ords.map_batches(tag("o"), batch_format="pandas").union(
        lis.map_batches(tag("l"), batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_name": "object", "revenue_cents": "int64"}
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        o = g[g["side"] == "o"]
        l = g[g["side"] == "l"]
        if len(o) == 0 or len(l) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        lsum = l.groupby("ok", as_index=False, sort=False)["rev"].sum()
        m = lsum.merge(o[["ok", "cnk"]], on="ok")
        if len(m) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        agg = m.groupby("cnk", as_index=False, sort=False)["rev"].sum()
        return pd.DataFrame(
            {"n_name": [nk_name[int(x)] for x in agg["cnk"]],
             "revenue_cents": agg["rev"].to_numpy().astype(np.int64)})

    return (
        both.groupby("ob").map_groups(join_bucket, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )


@register(
    "large_order_customers",
    """
    WITH s AS (
      SELECT l_orderkey,
             CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT)
               AS qty_q
      FROM lineitem GROUP BY l_orderkey)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT) AS totalprice_cents,
           s.qty_q
    FROM s
    JOIN orders o ON o.o_orderkey = s.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE s.qty_q > 25000
    ORDER BY s.qty_q DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18-shape large-volume customers: heavy-hitter orders "
    "by total quantity, enriched with their order + customer rows.  "
    "Distributed shape: lineitem pre-aggregates (orderkey, qty) "
    "partials per batch, ONE bucketed_agg shuffle sums them, the "
    "> threshold filter leaves only the heavy-hitter tail (winners "
    "are a vanishing fraction at any scale BY CONSTRUCTION of the "
    "threshold; the broadcast-winners posture documented here flips "
    "to a bucketed join if a pathological threshold made them "
    "large).  orders and customer are then semi-joined by "
    "broadcast-isin map_batches (each emits only matching rows — "
    "bounded by the winner count), merged driver-side, top-20 by "
    "(qty desc, orderkey).  Quantities and prices are exact "
    "integers (floor(x*100+0.5)).",
)
def large_order_customers(sf_dir: str, thresh_q: int = 25000, k: int = 20):
    import ray
    from .stages.relational import bucketed_agg

    def li_partial(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "q": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        q = cents(t["l_quantity"])
        df = pd.DataFrame({"ok": t["l_orderkey"].to_numpy().astype(np.int64),
                           "q": q.to_numpy().astype(np.int64)})
        return df.groupby("ok", as_index=False, sort=False)["q"].sum()

    sums = bucketed_agg(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
        .map_batches(li_partial, batch_format="pyarrow"),
        keys=["ok"], sum_cols={"q": "qty_q"},
    )

    def win_filter(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"ok": "int64", "qty_q": "int64"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        return df[df["qty_q"] > thresh_q][["ok", "qty_q"]]

    winners = sums.map_batches(win_filter, batch_format="pandas").to_pandas()
    wok = np.sort(winners["ok"].to_numpy().astype(np.int64))
    wok_ref = ray.put(wok)

    def isin_side(key: str, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            w = ray.get(wok_ref)
            v = t[key].to_numpy().astype(np.int64)
            pos = np.searchsorted(w, v)
            pos[pos >= len(w)] = 0 if len(w) else 0
            keep = (w[pos] == v) if len(w) else np.zeros(len(v), dtype=bool)
            return t.select(cols).filter(pa.array(keep))
        return fn

    ords = (
        _read(sf_dir, "orders",
              columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(isin_side("o_orderkey",
                               ["o_orderkey", "o_custkey", "o_orderdate",
                                "o_totalprice"]),
                     batch_format="pyarrow")
        .to_pandas()
    )
    wck = np.sort(ords["o_custkey"].unique().astype(np.int64))
    wck_ref = ray.put(wck)

    def cust_side(t: pa.Table) -> pa.Table:
        w = ray.get(wck_ref)
        v = t["c_custkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(w, v)
        pos[pos >= len(w)] = 0 if len(w) else 0
        keep = (w[pos] == v) if len(w) else np.zeros(len(v), dtype=bool)
        return t.select(["c_custkey", "c_name"]).filter(pa.array(keep))

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(cust_side, batch_format="pyarrow")
        .to_pandas()
    )
    m = winners.merge(ords, left_on="ok", right_on="o_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey")
    m["totalprice_cents"] = np.floor(
        m["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    m = m.sort_values(["qty_q", "o_orderkey"], ascending=[False, True],
                      kind="stable").head(k)
    return m[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
              "totalprice_cents", "qty_q"]].reset_index(drop=True)


@register(
    "late_shipment_priority",
    """
    SELECT o.o_orderpriority, count(*) AS n_late
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4-shape late-shipment audit: count orders per "
    "priority having ANY line item shipped more than 60 days after "
    "the order date (EXISTS semi-join).  Distributed shape: EXISTS "
    "against a > comparison is equivalent to max(l_shipdate) > "
    "o_orderdate + 60d, so lineitem pre-reduces to ONE (orderkey, "
    "max_shipdate) row per order per batch (per-batch max combiner "
    "— line items never shuffle); orders emits (orderkey, "
    "orderdate_us, priority).  ONE orderkey%%64 co-shuffle, "
    "per-bucket max-merge + integer microsecond comparison, "
    "per-priority partial counts, final |priorities|-wide groupby "
    "sum.  All date arithmetic is exact int64 microseconds.",
)
def late_shipment_priority(sf_dir: str, grace_days: int = 60):
    from ray.data.aggregate import Sum

    GRACE_US = np.int64(grace_days) * 86400 * 1_000_000

    def li_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "ms": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ship = t["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        df = pd.DataFrame({"ok": t["l_orderkey"].to_numpy().astype(np.int64),
                           "ms": ship.astype(np.int64)})
        out = df.groupby("ok", as_index=False, sort=False)["ms"].max()
        out["ob"] = (out["ok"].to_numpy() % 64).astype("int32")
        return out

    def ord_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "od": "int64", "prio": "object", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ok = t["o_orderkey"].to_numpy().astype(np.int64)
        od = t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        return pd.DataFrame({"ok": ok, "od": od.astype(np.int64),
                             "prio": t["o_orderpriority"].to_pandas().to_numpy(),
                             "ob": (ok % 64).astype("int32")})

    lis = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]
                ).map_batches(li_side, batch_format="pyarrow")
    ords = _read(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
                 ).map_batches(ord_side, batch_format="pyarrow")

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    both = ords.map_batches(tag("o"), batch_format="pandas").union(
        lis.map_batches(tag("l"), batch_format="pandas"))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderpriority": "object", "n_late": "int64"}
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        o = g[g["side"] == "o"]
        l = g[g["side"] == "l"]
        if len(o) == 0 or len(l) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        lmax = l.groupby("ok", as_index=False, sort=False)["ms"].max()
        m = o[["ok", "od", "prio"]].merge(lmax, on="ok")
        late = m[m["ms"].to_numpy() > m["od"].to_numpy() + GRACE_US]
        if len(late) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = late.groupby("prio", as_index=False, sort=False).size()
        return pd.DataFrame({"o_orderpriority": out["prio"].to_numpy(),
                             "n_late": out["size"].to_numpy().astype(np.int64)})

    return (
        both.groupby("ob").map_groups(bucket, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_late", alias_name="n_late"))
    )


@register(
    "props_json_stats",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured property extraction — the log-enrichment "
    "step every event pipeline starts with (JSON props column -> "
    "typed field -> per-type stats).  Ray side extracts $.k with ONE "
    "vectorized regex per batch (pandas str.extract on the C path; "
    "a full json.loads per row would be the Python-loop antipattern "
    "— the extraction contract is the integer value of key k, which "
    "the synthesis emits as flat one-key objects), then per-batch "
    "(event_type, n, sum, max) partials; final |types|-wide groupby "
    "merges with Sum/Sum/Max.  Text crosses no shuffle; partial "
    "rows are fixed-width.",
)
def props_json_stats(sf_dir: str):
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"event_type": "object", "n": "int64", "sum_k": "int64",
                "max_k": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        k = (
            t["props"].to_pandas().str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
            .astype(np.int64)
        )
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas().to_numpy(),
                           "k": k.to_numpy()})
        g = df.groupby("event_type", sort=False)["k"]
        out = g.agg(n="size", sum_k="sum", max_k="max").reset_index()
        return out.astype(cols)

    return (
        _read(sf_dir, "events", columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_k", alias_name="sum_k"),
                   Max("max_k", alias_name="max_k"))
    )


@register(
    "returned_item_report",
    """
    WITH rev AS (
      SELECT o.o_custkey AS ck,
             CAST(sum(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5)
                 AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1)
    SELECT c.c_custkey, c.c_name, n.n_name, r.revenue_cents
    FROM rev r
    JOIN customer c ON c.c_custkey = r.ck
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    ORDER BY r.revenue_cents DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10-shape returned-item report: top customers by "
    "revenue on returned line items.  Distributed shape: lineitem "
    "filters l_returnflag='R' at the scan and pre-aggregates "
    "(orderkey, cents) per batch; orders projects (orderkey, "
    "custkey); ONE orderkey%%64 co-shuffle joins them into "
    "(custkey, cents) partials; a SECOND bucketed_agg on custkey "
    "completes per-customer sums (hash buckets hold complete keys, "
    "so the per-block top-20 prune is safe); global sort+limit sees "
    "<= 20 rows per block.  Only the 20 winners' customer rows are "
    "then fetched by a broadcast-isin semi-join pass; nation is "
    "driver-side (25 rows at any scale).  Revenue is exact integer "
    "cents.",
)
def returned_item_report(sf_dir: str, k: int = 20):
    import ray
    from .stages.relational import bucketed_agg

    def li_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "rev": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        rev = cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"])))
        df = pd.DataFrame({"ok": t["l_orderkey"].to_numpy().astype(np.int64),
                           "rev": rev.to_numpy().astype(np.int64)})
        out = df.groupby("ok", as_index=False, sort=False)["rev"].sum()
        out["ob"] = (out["ok"].to_numpy() % 64).astype("int32")
        return out

    def ord_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "ck": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ok = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame({"ok": ok,
                             "ck": t["o_custkey"].to_numpy().astype(np.int64),
                             "ob": (ok % 64).astype("int32")})

    lis = _read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_extendedprice", "l_discount",
                         "l_returnflag"]
                ).map_batches(li_side, batch_format="pyarrow")
    ords = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]
                 ).map_batches(ord_side, batch_format="pyarrow")

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    both = ords.map_batches(tag("o"), batch_format="pandas").union(
        lis.map_batches(tag("l"), batch_format="pandas"))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"ck": "int64", "rev": "int64"}
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        o = g[g["side"] == "o"]
        l = g[g["side"] == "l"]
        if len(o) == 0 or len(l) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        lsum = l.groupby("ok", as_index=False, sort=False)["rev"].sum()
        m = lsum.merge(o[["ok", "ck"]], on="ok")
        if len(m) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        # the tagged union NaN-fills each side's missing columns (float
        # upcast) — restore exact int64 before the custkey shuffle
        out = m.groupby("ck", as_index=False, sort=False)["rev"].sum()
        return out.astype(cols)

    per_cust = bucketed_agg(
        both.groupby("ob").map_groups(bucket, batch_format="pandas"),
        keys=["ck"], sum_cols={"rev": "revenue_cents"},
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"ck": "int64", "revenue_cents": "int64"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        return df.sort_values(["revenue_cents", "ck"],
                              ascending=[False, True], kind="stable").head(k)

    winners = (
        per_cust.map_batches(prune, batch_format="pandas")
        .to_pandas()
        .sort_values(["revenue_cents", "ck"], ascending=[False, True],
                     kind="stable")
        .head(k)
    )
    wck = np.sort(winners["ck"].to_numpy().astype(np.int64))
    wck_ref = ray.put(wck)

    def cust_side(t: pa.Table) -> pa.Table:
        w = ray.get(wck_ref)
        v = t["c_custkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(w, v)
        pos[pos >= len(w)] = 0 if len(w) else 0
        keep = (w[pos] == v) if len(w) else np.zeros(len(v), dtype=bool)
        return t.select(["c_custkey", "c_name", "c_nationkey"]).filter(pa.array(keep))

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
        .map_batches(cust_side, batch_format="pyarrow")
        .to_pandas()
    )
    nat = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    m = (winners.merge(cust, left_on="ck", right_on="c_custkey")
                .merge(nat, left_on="c_nationkey", right_on="n_nationkey"))
    m = m.sort_values(["revenue_cents", "c_custkey"],
                      ascending=[False, True], kind="stable").head(k)
    return m[["c_custkey", "c_name", "n_name", "revenue_cents"]].reset_index(drop=True)


@register(
    "brand_supplier_counts",
    """
    SELECT p.p_brand, p.p_type,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1, 2
    """,
    doc="TPC-H Q16-shape parts/supplier relationship: distinct "
    "supplier count per (brand, type) — the COUNT DISTINCT "
    "aggregation shape.  Distributed shape: the part dim is read "
    "ONCE and (partkey -> group-code) broadcast as sorted int64 "
    "arrays (a dim table; past a broadcast cap this becomes a "
    "bucketed join); lineitem batches map partkey -> code and emit "
    "per-batch UNIQUE (code, suppkey) pairs (the distinct "
    "pre-dedup); ONE bucketed_agg shuffle on the pair completes "
    "global dedup; per-(code) counts of the surviving unique rows "
    "sum in a |groups|-wide final groupby; group codes decode to "
    "(brand, type) strings only at the tiny end.  Suppliers and "
    "line items never shuffle raw.",
)
def brand_supplier_counts(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum
    from .stages.relational import bucketed_agg

    pt = pq.read_table(_pq(sf_dir, "part"),
                       columns=["p_partkey", "p_brand", "p_type"]).to_pandas()
    # factorize (brand, type) TUPLES — pandas string concat silently
    # drops NUL bytes, so a joined-string key would collide groups
    codes, uniq = pd.factorize(list(zip(pt["p_brand"], pt["p_type"])))
    order = np.argsort(pt["p_partkey"].to_numpy())
    pk_sorted = pt["p_partkey"].to_numpy().astype(np.int64)[order]
    code_sorted = codes.astype(np.int64)[order]
    dim_ref = ray.put((pk_sorted, code_sorted))
    decode = list(uniq)

    def li_pairs(t: pa.Table) -> pd.DataFrame:
        cols = {"bt": "int64", "sk": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        pks, cds = ray.get(dim_ref)
        pkv = t["l_partkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(pks, pkv)
        pos[pos >= len(pks)] = 0 if len(pks) else 0
        keep = (pks[pos] == pkv) if len(pks) else np.zeros(len(pkv), dtype=bool)
        code = cds[pos[keep]]
        sk = t["l_suppkey"].to_numpy().astype(np.int64)[keep]
        packed = np.unique(code * np.int64(1 << 32) + sk)
        return pd.DataFrame({"bt": (packed >> 32).astype(np.int64),
                             "sk": (packed & ((1 << 32) - 1)).astype(np.int64)})

    uniq_pairs = bucketed_agg(
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
        .map_batches(li_pairs, batch_format="pyarrow"),
        keys=["bt", "sk"], sum_cols={"__count__": "c"},
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"bt": "int64", "n": "int64"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = df.groupby("bt", as_index=False, sort=False).size()
        return pd.DataFrame({"bt": out["bt"].to_numpy().astype(np.int64),
                             "n": out["size"].to_numpy().astype(np.int64)})

    final = (
        uniq_pairs.map_batches(count_partial, batch_format="pandas")
        .groupby("bt")
        .aggregate(Sum("n", alias_name="supplier_cnt"))
        .to_pandas()
    )
    final["p_brand"] = [decode[int(b)][0] for b in final["bt"]]
    final["p_type"] = [decode[int(b)][1] for b in final["bt"]]
    return final[["p_brand", "p_type", "supplier_cnt"]]


@register(
    "promo_revenue_share",
    """
    WITH j AS (
      SELECT CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5)
               AS BIGINT) AS rev,
             CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS promo
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01')
    SELECT CAST(sum(promo*rev) AS BIGINT) AS promo_cents,
           CAST(sum(rev) AS BIGINT) AS total_cents,
           CAST((1000 * sum(promo*rev)) // sum(rev) AS BIGINT)
             AS promo_permille
    FROM j
    """,
    doc="TPC-H Q14-shape promo revenue share: what fraction of the "
    "window's revenue came from PROMO-type parts.  Distributed "
    "shape: the PROMO partkeys are filtered driver-side from the "
    "part dim and broadcast as ONE sorted int64 array; lineitem "
    "filters the ship-date window at the scan and folds each batch "
    "to a single (promo_cents, total_cents) partial row; a "
    "global-null groupby sums the two counters; the permille "
    "quotient is computed once, in exact Python ints, on the final "
    "2-integer row.  No shuffle carries more than one row per "
    "batch.",
)
def promo_revenue_share(sf_dir: str, lo: str = "1997-01-01",
                        hi: str = "1998-01-01"):
    import ray
    from ray.data.aggregate import Sum

    LO, HI = pd.Timestamp(lo), pd.Timestamp(hi)
    pt = pq.read_table(_pq(sf_dir, "part"),
                       columns=["p_partkey", "p_type"]).to_pandas()
    promo = np.sort(pt.loc[pt["p_type"] == "PROMO", "p_partkey"]
                    .to_numpy().astype(np.int64))
    promo_ref = ray.put(promo)

    def fold(t: pa.Table) -> pd.DataFrame:
        cols = {"promo_cents": "int64", "total_cents": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(LO)),
                             pc.less(t["l_shipdate"], pa.scalar(HI))))
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        rev = cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"]))
                    ).to_numpy().astype(np.int64)
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        pr = ray.get(promo_ref)
        pos = np.searchsorted(pr, pk)
        pos[pos >= len(pr)] = 0 if len(pr) else 0
        isp = (pr[pos] == pk) if len(pr) else np.zeros(len(pk), dtype=bool)
        return pd.DataFrame({"promo_cents": [int(rev[isp].sum())],
                             "total_cents": [int(rev.sum())]})

    tot = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_extendedprice", "l_discount",
                       "l_shipdate"])
        .map_batches(fold, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("promo_cents", alias_name="promo_cents"),
                   Sum("total_cents", alias_name="total_cents"))
        .to_pandas()
    )
    p = int(tot["promo_cents"].iloc[0])
    s = int(tot["total_cents"].iloc[0])
    return pd.DataFrame({"promo_cents": [p], "total_cents": [s],
                         "promo_permille": [(1000 * p) // s if s else 0]})


@register(
    "link_prediction_ra",
    _LINK_SQL_CTE.replace(
        "SELECT (d.doc_id*131", "SELECT d.doc_id AS src, (d.doc_id*131"
    )
    + """,
    e AS (SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
          FROM l WHERE src != target),
    sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    w AS (SELECT s1.v AS wa, s2.v AS wb, (1048576 // dg.d) AS wt
          FROM sym s1
          JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
          JOIN deg dg ON dg.u = s1.u
          WHERE dg.d <= 64)
    SELECT w.wa AS a, w.wb AS b, CAST(sum(w.wt) AS BIGINT) AS ra_q
    FROM w
    LEFT JOIN e ON e.a = w.wa AND e.b = w.wb
    WHERE e.a IS NULL
    GROUP BY w.wa, w.wb
    ORDER BY ra_q DESC, a, b
    LIMIT 50
    """,
    doc="Link prediction by the resource-allocation index (Zhou/Lü/ "
    "Zhang 2009: score(a,b) = sum over common neighbors z of "
    "1/deg(z), here integer-quantized 1048576//deg) over the "
    "symmetrized deterministic link graph, excluding already- "
    "connected pairs — the seed-expansion / related-page signal.  "
    "Distributed shape: (1) per-batch link explode + packed "
    "undirected dedup; ONE bucketed_agg completes global edge "
    "dedup; (2) the distinct-edge set broadcasts once as a packed "
    "sorted int64 array (|E| ~ 4n; past a broadcast cap the "
    "exclusion becomes an anti-join like graph_bfs_layers'); "
    "(3) symmetric adjacency co-locates per common-neighbor u "
    "(bucket u%%32), per-bucket wedge pairs are generated by the "
    "sorted-run arange trick (no Python pair loop) with the hub cap "
    "deg<=64 mirrored in the oracle, weight = 1048576//deg exact; "
    "(4) ONE bucketed (a,b) sum completes scores; per-block top-50 "
    "prune is safe because hash buckets hold complete pairs.",
)
def link_prediction_ra(sf_dir: str, hub_cap: int = 64, k: int = 50):
    import ray
    from .stages.relational import bucketed_agg

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    N = np.int64(n_docs)

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        tgt = _explode_links(t, n_docs)
        ids = t["doc_id"].to_numpy()
        kk = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, kk)
        keep = src != tgt
        lo = np.minimum(src[keep], tgt[keep])
        hi = np.maximum(src[keep], tgt[keep])
        packed = np.unique(lo * N + hi)
        return pd.DataFrame({"a": (packed // N).astype(np.int64),
                             "b": (packed % N).astype(np.int64)})

    edges = bucketed_agg(
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow"),
        keys=["a", "b"], sum_cols={"__count__": "c"},
    ).materialize()

    epk = edges.to_pandas()
    packed_edges = np.sort(epk["a"].to_numpy().astype(np.int64) * N
                           + epk["b"].to_numpy().astype(np.int64))
    edge_ref = ray.put(packed_edges)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"u": "int64", "v": "int64", "ub": "int32"}
        if df.shape[1] == 0 or len(df) == 0 or "a" not in df.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        u = np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]).astype(np.int64)
        v = np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()]).astype(np.int64)
        return pd.DataFrame({"u": u, "v": v, "ub": (u % 32).astype("int32")})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"pa": "int64", "pb": "int64", "w": "int64"}
        if g.shape[1] == 0 or len(g) == 0 or "u" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["u", "v"], kind="stable")
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, len(u)])
        ok = lens <= hub_cap
        pos = np.arange(len(u)) - np.repeat(starts, lens)
        keep = np.repeat(ok, lens)
        pos = np.where(keep, pos, 0)
        total = int(pos.sum())
        if total == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        wt = np.repeat((np.int64(1048576) // lens.astype(np.int64)), lens)
        b_idx = np.repeat(np.arange(len(u)), pos)
        seq = np.arange(total) - np.repeat(np.cumsum(pos) - pos, pos)
        a_idx = np.repeat(np.repeat(starts, lens), pos) + seq
        pa_, pb_ = v[a_idx], v[b_idx]
        w = wt[b_idx]
        # drop pairs that are already edges (broadcast packed set)
        pe = ray.get(edge_ref)
        pk = pa_ * N + pb_
        ppos = np.searchsorted(pe, pk)
        ppos[ppos >= len(pe)] = 0 if len(pe) else 0
        isedge = (pe[ppos] == pk) if len(pe) else np.zeros(len(pk), dtype=bool)
        df = pd.DataFrame({"pa": pa_[~isedge], "pb": pb_[~isedge],
                           "w": w[~isedge]})
        return df.groupby(["pa", "pb"], as_index=False, sort=False)["w"].sum()

    scores = bucketed_agg(
        edges.map_batches(sym, batch_format="pandas")
        .groupby("ub")
        .map_groups(wedges, batch_format="pandas"),
        keys=["pa", "pb"], sum_cols={"w": "ra_q"},
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64", "ra_q": "int64"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = df.rename(columns={"pa": "a", "pb": "b"})
        return df.sort_values(["ra_q", "a", "b"],
                              ascending=[False, True, True],
                              kind="stable").head(k)[["a", "b", "ra_q"]]

    return (
        scores.map_batches(prune, batch_format="pandas")
        .repartition(2)
        .sort(["ra_q", "a", "b"], descending=[True, False, False])
        .limit(k)
    )


# =====================================================================
# Session-17 relational shapes: Q21/Q17/Q7/Q22 analogues over the
# reduced TPC-H tables (no partsupp/receiptdate in the driver data —
# lateness is shipdate vs orderdate + grace, as late_shipment_priority)
# =====================================================================


@register(
    "waiting_suppliers",
    """
    WITH j AS (
      SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                 THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY 1, 2),
    g AS (SELECT ok FROM j GROUP BY ok
          HAVING count(*) >= 2 AND sum(late) = 1)
    SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM j JOIN g USING (ok) JOIN supplier s ON s.s_suppkey = j.sk
    WHERE j.late = 1
    GROUP BY 1, 2
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21-shape blame assignment: suppliers who were the SOLE "
    "late shipper in finished multi-supplier orders (the multi-EXISTS "
    "/ NOT-EXISTS correlated-subquery shape).  Distributed shape: "
    "lineitem pre-aggregates (orderkey, suppkey, any-late needs the "
    "order date, so lateness resolves in-bucket) and orders projects "
    "(orderkey, orderdate) filtered to status F at the scan; ONE "
    "orderkey%%64 co-shuffle; per bucket a vectorized merge computes "
    "per-(ok,sk) lateness, per-ok distinct-supplier and late-supplier "
    "counts, and emits (suppkey, 1) only for qualifying orders' late "
    "supplier; a suppkey bucketed_agg completes counts.  supplier is "
    "a dim (10k x sf rows) fetched driver-side for the <=20 winners "
    "(past a broadcast cap this becomes the returned_item_report "
    "semi-join fetch).  Raw line items never cross a shuffle twice.",
)
def waiting_suppliers(sf_dir: str, grace_days: int = 60, k: int = 20):
    from .stages.relational import bucketed_agg

    GRACE_US = np.int64(grace_days) * 86400 * 1_000_000

    def li_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "sk": "int64", "ms": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ship = t["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        df = pd.DataFrame({"ok": t["l_orderkey"].to_numpy().astype(np.int64),
                           "sk": t["l_suppkey"].to_numpy().astype(np.int64),
                           "ms": ship.astype(np.int64)})
        out = df.groupby(["ok", "sk"], as_index=False, sort=False)["ms"].max()
        out["ob"] = (out["ok"].to_numpy() % 64).astype("int32")
        return out

    def ord_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "od": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ok = t["o_orderkey"].to_numpy().astype(np.int64)
        od = t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        return pd.DataFrame({"ok": ok, "od": od.astype(np.int64),
                             "ob": (ok % 64).astype("int32")})

    lis = _read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_suppkey", "l_shipdate"]
                ).map_batches(li_side, batch_format="pyarrow")
    ords = _read(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate", "o_orderstatus"]
                 ).map_batches(ord_side, batch_format="pyarrow")

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    both = ords.map_batches(tag("o"), batch_format="pandas").union(
        lis.map_batches(tag("l"), batch_format="pandas"))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"sk": "int64", "n": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return empty
        o = g[g["side"] == "o"]
        l = g[g["side"] == "l"]
        if len(o) == 0 or len(l) == 0:
            return empty
        # per-(ok,sk) latest ship across batches, join the order date
        lmax = l.groupby(["ok", "sk"], as_index=False, sort=False)["ms"].max()
        m = lmax.merge(o[["ok", "od"]], on="ok")
        if len(m) == 0:
            return empty
        m["late"] = (m["ms"].to_numpy()
                     > m["od"].to_numpy() + GRACE_US).astype(np.int64)
        per_ok = m.groupby("ok", sort=False)["late"].agg(["size", "sum"])
        okset = per_ok[(per_ok["size"] >= 2) & (per_ok["sum"] == 1)].index
        win = m[m["late"].to_numpy().astype(bool) & m["ok"].isin(okset)]
        if len(win) == 0:
            return empty
        out = win.groupby("sk", as_index=False, sort=False).size()
        return pd.DataFrame({"sk": out["sk"].to_numpy().astype(np.int64),
                             "n": out["size"].to_numpy().astype(np.int64)})

    per_supp = bucketed_agg(
        both.groupby("ob").map_groups(bucket, batch_format="pandas"),
        keys=["sk"], sum_cols={"n": "numwait"},
    ).to_pandas()

    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_name"]).to_pandas()
    m = per_supp.merge(supp, left_on="sk", right_on="s_suppkey")
    m = m.sort_values(["numwait", "s_name"], ascending=[False, True],
                      kind="stable").head(k)
    return m[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)


@register(
    "small_qty_revenue",
    """
    WITH q AS (SELECT l_partkey,
                      CAST(floor(l_quantity*100 + 0.5) AS BIGINT) AS qc,
                      CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS epc
               FROM lineitem),
    s AS (SELECT l_partkey, count(*) AS c, sum(qc) AS sq FROM q GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(coalesce(sum(q.epc), 0) AS BIGINT) AS revenue_cents
    FROM q JOIN s USING (l_partkey)
    WHERE q.qc * 5 * s.c < s.sq
    """,
    doc="TPC-H Q17-shape small-quantity audit: revenue of line items "
    "whose quantity is below 1/5 of their part's average (the "
    "correlated-AVG-subquery shape).  The comparison is the exact "
    "integer cross-multiplication qc*5*cnt < sum_qc over centiunit "
    "quantities — no float average exists on either side.  "
    "Distributed shape: ONE partkey%%64 shuffle co-locates each "
    "part's line items; per bucket a vectorized groupby computes "
    "(cnt, sum_qc) per part, a transform-broadcast applies the "
    "cross-multiplied filter IN BUCKET (no second shuffle, no join "
    "— the correlated subquery dissolves into bucket locality), and "
    "only (n, revenue) partials leave; a final 1-row sum merges "
    "buckets.",
)
def small_qty_revenue(sf_dir: str):
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"pk": "int64", "qc": "int64", "epc": "int64", "pb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        qc = cents(t["l_quantity"]).to_numpy().astype(np.int64)
        epc = cents(t["l_extendedprice"]).to_numpy().astype(np.int64)
        return pd.DataFrame({"pk": pk, "qc": qc, "epc": epc,
                             "pb": (pk % 64).astype("int32")})

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_items": "int64", "revenue_cents": "int64"}
        if g.shape[1] == 0 or len(g) == 0 or "pk" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        grp = g.groupby("pk", sort=False)["qc"]
        cnt = grp.transform("size").to_numpy().astype(np.int64)
        sq = grp.transform("sum").to_numpy().astype(np.int64)
        keep = g["qc"].to_numpy() * 5 * cnt < sq
        return pd.DataFrame({"n_items": [np.int64(keep.sum())],
                             "revenue_cents": [g["epc"].to_numpy()[keep].sum()
                                               .astype(np.int64)]})

    parts = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame({
        "n_items": [np.int64(parts["n_items"].sum() if len(parts) else 0)],
        "revenue_cents": [np.int64(parts["revenue_cents"].sum()
                                   if len(parts) else 0)],
    })


@register(
    "nation_trade_volume",
    """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5)
               AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE c.c_nationkey <> s.s_nationkey
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7-shape cross-border trade volume: revenue between "
    "every (supplier nation, customer nation) pair per ship year.  "
    "Distributed shape: customer and supplier key->nationkey maps "
    "are broadcast ONCE as sorted int64 arrays (ray.put; customer "
    "is 150k x sf — past a broadcast cap the custkey resolution "
    "becomes a bucketed join like returned_item_report); lineitem "
    "batches resolve supp nation + year + cents locally, orders "
    "batches resolve cust nation; ONE orderkey%%64 co-shuffle joins "
    "them and pre-aggregates (sn, cn, year, cents) IN BUCKET, so "
    "the final groupby sees <= 25*25*years rows per bucket; nation "
    "names decode driver-side (25 rows at any scale).",
)
def nation_trade_volume(sf_dir: str):
    import ray

    cust = pq.read_table(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    order_ = np.argsort(ck, kind="stable")
    cmap_ref = ray.put((ck[order_],
                        cust["c_nationkey"].to_numpy().astype(np.int64)[order_]))
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    sorder = np.argsort(sk, kind="stable")
    smap_ref = ray.put((sk[sorder],
                        supp["s_nationkey"].to_numpy().astype(np.int64)[sorder]))

    def _lookup(keys_sorted, vals, q):
        pos = np.searchsorted(keys_sorted, q)
        pos[pos >= len(keys_sorted)] = 0
        return vals[pos]

    def li_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "sn": "int64", "yr": "int64", "rev": "int64",
                "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ks, vs = ray.get(smap_ref)
        ok = t["l_orderkey"].to_numpy().astype(np.int64)
        sn = _lookup(ks, vs, t["l_suppkey"].to_numpy().astype(np.int64))
        yr = pc.year(t["l_shipdate"]).to_numpy().astype(np.int64)
        rev = cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"])))
        df = pd.DataFrame({"ok": ok, "sn": sn, "yr": yr,
                           "rev": rev.to_numpy().astype(np.int64)})
        out = df.groupby(["ok", "sn", "yr"], as_index=False, sort=False)["rev"].sum()
        out["ob"] = (out["ok"].to_numpy() % 64).astype("int32")
        return out

    def ord_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "cn": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ks, vs = ray.get(cmap_ref)
        ok = t["o_orderkey"].to_numpy().astype(np.int64)
        cn = _lookup(ks, vs, t["o_custkey"].to_numpy().astype(np.int64))
        return pd.DataFrame({"ok": ok, "cn": cn,
                             "ob": (ok % 64).astype("int32")})

    lis = _read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_suppkey", "l_shipdate",
                         "l_extendedprice", "l_discount"]
                ).map_batches(li_side, batch_format="pyarrow")
    ords = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]
                 ).map_batches(ord_side, batch_format="pyarrow")

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    both = ords.map_batches(tag("o"), batch_format="pandas").union(
        lis.map_batches(tag("l"), batch_format="pandas"))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"sn": "int64", "cn": "int64", "yr": "int64", "rev": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return empty
        o = g[g["side"] == "o"]
        l = g[g["side"] == "l"]
        if len(o) == 0 or len(l) == 0:
            return empty
        m = l[["ok", "sn", "yr", "rev"]].merge(o[["ok", "cn"]], on="ok")
        m = m[m["sn"].to_numpy() != m["cn"].to_numpy()]
        if len(m) == 0:
            return empty
        out = m.groupby(["sn", "cn", "yr"], as_index=False, sort=False)["rev"].sum()
        return out.astype(cols)

    # per-bucket partials are bounded by nations^2 x years (<= ~5k rows
    # per bucket at ANY corpus scale), so the cross-bucket merge is a
    # driver-side pandas groupby — Ray's per-group aggregate overhead
    # (~2 ms/group) would dominate at this cardinality
    partials = (
        both.groupby("ob").map_groups(bucket, batch_format="pandas")
        .to_pandas()
    )
    agg = (partials.groupby(["sn", "cn", "yr"], as_index=False, sort=False)
           ["rev"].sum().rename(columns={"rev": "revenue_cents"}))
    nat = pq.read_table(_pq(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    return pd.DataFrame({
        "supp_nation": agg["sn"].map(nmap).to_numpy(),
        "cust_nation": agg["cn"].map(nmap).to_numpy(),
        "l_year": agg["yr"].to_numpy().astype(np.int64),
        "revenue_cents": agg["revenue_cents"].to_numpy().astype(np.int64),
    })


@register(
    "idle_customer_balance",
    """
    WITH p AS (SELECT count(*) AS c,
                      sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS s
               FROM customer WHERE c_acctbal > 0),
    cand AS (SELECT c_custkey, c_nationkey,
                    CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal
             FROM customer, p
             WHERE CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) * p.c > p.s),
    idle AS (SELECT * FROM cand WHERE NOT EXISTS
               (SELECT 1 FROM orders o WHERE o.o_custkey = cand.c_custkey
                  AND o.o_orderpriority = '1-URGENT'))
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(bal) AS BIGINT) AS total_bal_cents
    FROM idle GROUP BY 1
    """,
    doc="TPC-H Q22-shape dormant-capital report: customers with "
    "above-average positive balance and no URGENT-priority orders, "
    "rolled up per nation (scalar-subquery threshold + NOT EXISTS "
    "anti-join; the filtered-subquery predicate keeps the result "
    "non-vacuous on the driver data, where every customer has SOME "
    "order).  "
    "The threshold bal*cnt > sum is resolved ONCE driver-side as "
    "thr = sum//cnt + 1 in exact Python ints (no float average, no "
    "per-row bigint product — equivalent for integer bal since "
    "bal*c > s iff bal >= floor(s/c)+1), then broadcast as a plain "
    "int64 compare.  Distributed shape: pass 1 is a (cnt, sum) "
    "partial-aggregate scan of customer (two int64s per batch); "
    "pass 2 re-scans customer filtering bal >= thr and anti-joins "
    "orders on ONE custkey%%64 tagged-union co-shuffle (orders "
    "pre-dedups custkeys per batch); surviving (nationkey, bal) "
    "rows collapse to <= 25 output rows via per-bucket partials.",
)
def idle_customer_balance(sf_dir: str):
    from ray.data.aggregate import Sum

    def pos_partial(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"c": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64")})
        t = t.filter(pc.greater(t["c_acctbal"], 0.0))
        bal = cents(t["c_acctbal"]).to_numpy().astype(np.int64)
        return pd.DataFrame({"c": [np.int64(len(bal))],
                             "s": [np.int64(bal.sum()) if len(bal) else np.int64(0)]})

    parts = (
        _read(sf_dir, "customer", columns=["c_acctbal"])
        .map_batches(pos_partial, batch_format="pyarrow")
        .to_pandas()
    )
    cnt = int(parts["c"].sum()) if len(parts) else 0
    tot = int(parts["s"].sum()) if len(parts) else 0
    if cnt == 0:
        return pd.DataFrame({"nationkey": pd.Series([], dtype="int64"),
                             "n_cust": pd.Series([], dtype="int64"),
                             "total_bal_cents": pd.Series([], dtype="int64")})
    thr = tot // cnt + 1  # bal*c > s  <=>  bal >= floor(s/c)+1 (exact ints)

    def cand_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ck": "int64", "nk": "int64", "bal": "int64", "cb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        bal = cents(t["c_acctbal"]).to_numpy().astype(np.int64)
        keep = bal >= thr
        ck = t["c_custkey"].to_numpy().astype(np.int64)[keep]
        return pd.DataFrame({"ck": ck,
                             "nk": t["c_nationkey"].to_numpy().astype(np.int64)[keep],
                             "bal": bal[keep],
                             "cb": (ck % 64).astype("int32")})

    def ord_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ck": "int64", "cb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        ck = np.unique(t["o_custkey"].to_numpy().astype(np.int64))
        return pd.DataFrame({"ck": ck, "cb": (ck % 64).astype("int32")})

    cands = _read(sf_dir, "customer",
                  columns=["c_custkey", "c_nationkey", "c_acctbal"]
                  ).map_batches(cand_side, batch_format="pyarrow")
    ords = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]
                 ).map_batches(ord_side, batch_format="pyarrow")

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    both = cands.map_batches(tag("c"), batch_format="pandas").union(
        ords.map_batches(tag("o"), batch_format="pandas"))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"nationkey": "int64", "n_cust": "int64",
                "total_bal_cents": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return empty
        c = g[g["side"] == "c"]
        if len(c) == 0:
            return empty
        active = g.loc[g["side"] == "o", "ck"].to_numpy()
        idle = c[~c["ck"].isin(active)]
        if len(idle) == 0:
            return empty
        out = idle.groupby("nk", sort=False)["bal"].agg(["size", "sum"]).reset_index()
        return pd.DataFrame({"nationkey": out["nk"].to_numpy().astype(np.int64),
                             "n_cust": out["size"].to_numpy().astype(np.int64),
                             "total_bal_cents": out["sum"].to_numpy().astype(np.int64)})

    out = (
        both.groupby("cb").map_groups(bucket, batch_format="pandas")
        .groupby("nationkey")
        .aggregate(Sum("n_cust", alias_name="n_cust"),
                   Sum("total_bal_cents", alias_name="total_bal_cents"))
        .to_pandas()
    )
    # an all-empty bucket fan-in yields a schemaless frame — pin the
    # contract columns/dtypes so empty == empty against the oracle
    cols = {"nationkey": "int64", "n_cust": "int64", "total_bal_cents": "int64"}
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
    return out.astype(cols)


@register(
    "top_supplier_revenue",
    """
    WITH r AS (SELECT l_suppkey AS sk,
                      sum(CAST(floor(l_extendedprice*(1-l_discount)*100 + 0.5)
                          AS BIGINT)) AS rev
               FROM lineitem
               WHERE l_shipdate >= DATE '1996-01-01'
                 AND l_shipdate <  DATE '1996-04-01'
               GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, CAST(r.rev AS BIGINT) AS total_revenue_cents
    FROM r JOIN supplier s ON s.s_suppkey = r.sk
    WHERE r.rev = (SELECT max(rev) FROM r)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15-shape top supplier: the supplier(s) with maximum "
    "revenue in a quarter (the view + scalar-max self-reference "
    "shape).  Distributed shape: lineitem filters the date window "
    "at the scan and pre-aggregates (suppkey, cents) per batch; ONE "
    "suppkey bucketed_agg completes per-supplier revenue; the "
    "global max is a scalar Dataset aggregate (no driver "
    "materialization of the revenue table); a second streaming "
    "filter emits only suppliers AT the max (ties preserved, "
    "matching SQL), whose dim rows are fetched driver-side.",
)
def top_supplier_revenue(sf_dir: str):
    from .stages.relational import bucketed_agg

    LO = np.datetime64("1996-01-01").astype("datetime64[us]").astype(np.int64)
    HI = np.datetime64("1996-04-01").astype("datetime64[us]").astype(np.int64)

    def li_side(t: pa.Table) -> pd.DataFrame:
        cols = {"sk": "int64", "rev": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ship = t["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        keep = (ship >= LO) & (ship < HI)
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        rev = cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"])))
        df = pd.DataFrame({"sk": t["l_suppkey"].to_numpy().astype(np.int64),
                           "rev": rev.to_numpy().astype(np.int64)})
        return df.groupby("sk", as_index=False, sort=False)["rev"].sum()

    per_supp = bucketed_agg(
        _read(sf_dir, "lineitem",
              columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                       "l_discount"]
              ).map_batches(li_side, batch_format="pyarrow"),
        keys=["sk"], sum_cols={"rev": "rev"},
    ).materialize()

    mx = per_supp.max("rev")

    def at_max(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"sk": "int64", "rev": "int64"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        return df[df["rev"].to_numpy() == mx][["sk", "rev"]]

    winners = per_supp.map_batches(at_max, batch_format="pandas").to_pandas()
    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_name"]).to_pandas()
    m = winners.merge(supp, left_on="sk", right_on="s_suppkey")
    m = m.sort_values("s_suppkey", kind="stable")
    return pd.DataFrame({
        "s_suppkey": m["s_suppkey"].to_numpy().astype(np.int64),
        "s_name": m["s_name"].to_numpy(),
        "total_revenue_cents": m["rev"].to_numpy().astype(np.int64),
    })


@register(
    "clustering_coefficient",
    _LINK_SQL_CTE.replace(
        "SELECT (d.doc_id*131", "SELECT d.doc_id AS src, (d.doc_id*131"
    )
    + """,
    l2 AS (SELECT src, target FROM l
           UNION ALL
           SELECT doc_id AS src, (doc_id + 50) % (SELECT c FROM n) AS target
           FROM documents
           UNION ALL
           SELECT doc_id AS src, (doc_id + 100) % (SELECT c FROM n) AS target
           FROM documents),
    e AS (SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
          FROM l2 WHERE src != target),
    sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    tri AS (SELECT s1.u AS u, count(*) AS t
            FROM sym s1
            JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
            JOIN e ON e.a = s1.v AND e.b = s2.v
            GROUP BY s1.u),
    cc AS (SELECT d.u, (2048 * coalesce(t.t, 0)) // (d.d * (d.d - 1)) AS ccq
           FROM deg d LEFT JOIN tri t ON t.u = d.u
           WHERE d.d >= 2)
    SELECT CAST(ccq AS BIGINT) AS ccq, CAST(count(*) AS BIGINT) AS n_nodes
    FROM cc GROUP BY 1
    """,
    doc="Local clustering coefficient histogram (Watts/Strogatz "
    "cc(u) = 2*tri(u)/(deg(u)*(deg(u)-1)), integer-quantized x1024 "
    "keyed by exact ccq, <= 1025 keys) over the symmetrized deterministic link graph "
    "— the community-structure signal next to triangle_count's "
    "global closure histogram.  The hashed link graph is locally "
    "tree-like (no triangles), so the edge set is augmented with "
    "two deterministic stride edges per node (u -> u+50, u -> u+100 "
    "mod n; consecutive stride trios close), mirrored exactly in "
    "the oracle — the histogram then spans real closure levels.  "
    "Distributed shape: distinct "
    "undirected edges via ONE bucketed_agg (the link_prediction_ra "
    "edge pass); the packed edge set broadcasts once as a sorted "
    "int64 array (past a broadcast cap: the triangle_count "
    "closing-edge join regime); symmetric adjacency co-locates per "
    "center u (bucket u%%32), wedges come from the sorted-run "
    "arange trick, closure is ONE searchsorted per bucket, and "
    "per-u (deg, tri) collapses IN BUCKET to (ccq, count) "
    "partials; the final groupby sees <= 1025 keys.",
)
def clustering_coefficient(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum
    from .stages.relational import bucketed_agg

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    N = np.int64(n_docs)

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        tgt = _explode_links(t, n_docs)
        ids = t["doc_id"].to_numpy()
        kk = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, kk)
        # stride augmentation: u -> u+50, u -> u+100 (mod n) so local
        # closure is non-degenerate (mirrored in the oracle's l2 CTE)
        src = np.concatenate([src, ids, ids])
        tgt = np.concatenate([tgt, (ids + 50) % n_docs, (ids + 100) % n_docs])
        keep = src != tgt
        lo = np.minimum(src[keep], tgt[keep])
        hi = np.maximum(src[keep], tgt[keep])
        packed = np.unique(lo * N + hi)
        return pd.DataFrame({"a": (packed // N).astype(np.int64),
                             "b": (packed % N).astype(np.int64)})

    edges = bucketed_agg(
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow"),
        keys=["a", "b"], sum_cols={"__count__": "c"},
    ).materialize()

    epk = edges.to_pandas()
    packed_edges = np.sort(epk["a"].to_numpy().astype(np.int64) * N
                           + epk["b"].to_numpy().astype(np.int64))
    edge_ref = ray.put(packed_edges)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"u": "int64", "v": "int64", "ub": "int32"}
        if df.shape[1] == 0 or len(df) == 0 or "a" not in df.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        u = np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]).astype(np.int64)
        v = np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()]).astype(np.int64)
        return pd.DataFrame({"u": u, "v": v, "ub": (u % 32).astype("int32")})

    def per_center(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"cc_bucket": "int64", "n": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if g.shape[1] == 0 or len(g) == 0 or "u" not in g.columns:
            return empty
        g = g.sort_values(["u", "v"], kind="stable")
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, len(u)])
        deg2 = lens >= 2
        if not deg2.any():
            return empty
        # wedge pairs per center via the sorted-run arange trick
        pos = np.arange(len(u)) - np.repeat(starts, lens)
        b_idx = np.repeat(np.arange(len(u)), pos)
        total = int(pos.sum())
        if total == 0:
            return empty
        seq = np.arange(total) - np.repeat(np.cumsum(pos) - pos, pos)
        a_idx = np.repeat(np.repeat(starts, lens), pos) + seq
        wa, wb = v[a_idx], v[b_idx]  # wa < wb (adjacency run is sorted)
        pe = ray.get(edge_ref)
        pk = wa * N + wb
        ppos = np.searchsorted(pe, pk)
        ppos[ppos >= len(pe)] = 0 if len(pe) else 0
        closed = (pe[ppos] == pk) if len(pe) else np.zeros(len(pk), dtype=bool)
        # triangles per center = closed wedges per run
        run_id = np.repeat(np.arange(len(starts)), lens)      # per sym row
        tri = np.bincount(run_id[b_idx][closed], minlength=len(starts))
        d = lens[deg2].astype(np.int64)
        t = tri[deg2].astype(np.int64)
        ccq = (2048 * t) // (d * (d - 1))
        out = pd.DataFrame({"ccq": ccq.astype(np.int64)})
        out = out.groupby("ccq", as_index=False, sort=False).size()
        return pd.DataFrame({"ccq": out["ccq"].to_numpy().astype(np.int64),
                             "n": out["size"].to_numpy().astype(np.int64)})

    return (
        edges.map_batches(sym, batch_format="pandas")
        .groupby("ub")
        .map_groups(per_center, batch_format="pandas")
        .groupby("ccq")
        .aggregate(Sum("n", alias_name="n_nodes"))
    )


@register(
    "degree_assortativity",
    _LINK_SQL_CTE.replace(
        "SELECT (d.doc_id*131", "SELECT d.doc_id AS src, (d.doc_id*131"
    )
    + """,
    e AS (SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
          FROM l WHERE src != target),
    sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e),
    deg AS (SELECT u, count(*) AS d FROM sym GROUP BY u),
    j AS (SELECT da.d AS dx, db.d AS dy
          FROM sym s
          JOIN deg da ON da.u = s.u
          JOIN deg db ON db.u = s.v),
    t AS (SELECT CAST(count(*) AS HUGEINT) AS m,
                 CAST(sum(dx) AS HUGEINT) AS sx,
                 CAST(sum(dx*dy) AS HUGEINT) AS sxy,
                 CAST(sum(dx*dx) AS HUGEINT) AS sxx
          FROM j)
    SELECT CAST(m // 2 AS BIGINT) AS n_edges,
           CAST((1024 * (m*sxy - sx*sx)) // (m*sxx - sx*sx) AS BIGINT) AS r_q
    FROM t
    """,
    doc="Degree assortativity (Newman 2002) of the undirected link "
    "graph: the Pearson correlation of endpoint degrees over the "
    "symmetrized edge list — hub-attachment structure in one "
    "number, quantized x1024 with NO sqrt or float anywhere "
    "(identical marginals make the correlation a ratio of two "
    "integer moments: r = (M*Sxy - Sx^2)/(M*Sxx - Sx^2)).  "
    "Distributed shape: distinct edges via ONE bucketed_agg; "
    "degrees via a second bucketed count; the degree vector "
    "broadcasts once as a dense int64 array indexed by doc_id "
    "(|V|*8 bytes; past a broadcast cap: two hash joins like "
    "label_prop_rounds); edge batches then fold to FIVE int64 "
    "moment partials each, summed driver-side in exact Python ints "
    "(the cross products exceed int64), with the final quotient "
    "truncated toward zero to match DuckDB's // on signed values.",
)
def degree_assortativity(sf_dir: str):
    import ray
    from .stages.relational import bucketed_agg

    n_docs = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    N = np.int64(n_docs)

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        tgt = _explode_links(t, n_docs)
        ids = t["doc_id"].to_numpy()
        kk = (ids % 5 + 3).astype(np.int64)
        src = np.repeat(ids, kk)
        keep = src != tgt
        lo = np.minimum(src[keep], tgt[keep])
        hi = np.maximum(src[keep], tgt[keep])
        packed = np.unique(lo * N + hi)
        return pd.DataFrame({"a": (packed // N).astype(np.int64),
                             "b": (packed % N).astype(np.int64)})

    edges = bucketed_agg(
        _read(sf_dir, "documents", columns=["doc_id"])
        .map_batches(explode, batch_format="pyarrow"),
        keys=["a", "b"], sum_cols={"__count__": "c"},
    ).materialize()

    def sym_count(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"u": "int64", "d": "int64"}
        if df.shape[1] == 0 or len(df) == 0 or "a" not in df.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        u = np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]).astype(np.int64)
        out = pd.DataFrame({"u": u}).groupby("u", as_index=False, sort=False).size()
        return pd.DataFrame({"u": out["u"].to_numpy().astype(np.int64),
                             "d": out["size"].to_numpy().astype(np.int64)})

    degs = bucketed_agg(
        edges.map_batches(sym_count, batch_format="pandas"),
        keys=["u"], sum_cols={"d": "d"},
    ).to_pandas()
    dense = np.zeros(n_docs, dtype=np.int64)
    dense[degs["u"].to_numpy().astype(np.int64)] = degs["d"].to_numpy().astype(np.int64)
    deg_ref = ray.put(dense)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"m": "int64", "sx": "int64", "sxy": "int64", "sxx": "int64"}
        if df.shape[1] == 0 or len(df) == 0 or "a" not in df.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        dv = ray.get(deg_ref)
        dx = dv[df["a"].to_numpy().astype(np.int64)]
        dy = dv[df["b"].to_numpy().astype(np.int64)]
        # symmetrized: each undirected edge contributes both directions
        return pd.DataFrame({"m": [np.int64(2 * len(dx))],
                             "sx": [np.int64((dx + dy).sum())],
                             "sxy": [np.int64(2 * (dx * dy).sum())],
                             "sxx": [np.int64((dx * dx + dy * dy).sum())]})

    parts = edges.map_batches(moments, batch_format="pandas").to_pandas()
    m = int(parts["m"].sum())
    sx = int(parts["sx"].sum())
    sxy = int(parts["sxy"].sum())
    sxx = int(parts["sxx"].sum())
    num = 1024 * (m * sxy - sx * sx)
    den = m * sxx - sx * sx
    # DuckDB's // truncates toward zero on signed values; Python floors
    q = abs(num) // den
    r_q = q if num >= 0 else -q
    return pd.DataFrame({"n_edges": [np.int64(m // 2)],
                         "r_q": [np.int64(r_q)]})


@register(
    "cusum_change_points",
    """
    WITH e AS (SELECT user_id % 64 AS host,
                      epoch_us(ts) // 86400000000 AS day
               FROM events),
    c AS (SELECT host, day, CAST(count(*) AS BIGINT) AS x FROM e GROUP BY 1, 2),
    t AS (SELECT host, count(*) AS nd, sum(x) AS sx FROM c GROUP BY 1),
    w AS (SELECT c.host, c.day, c.x - (t.sx // t.nd) AS d
          FROM c JOIN t USING (host)),
    s AS (SELECT host, day,
                 sum(d) OVER (PARTITION BY host ORDER BY day) AS cs
          FROM w),
    r AS (SELECT host, day,
                 cs - least(CAST(0 AS BIGINT),
                            min(cs) OVER (PARTITION BY host ORDER BY day)) AS sv
          FROM s),
    m AS (SELECT host, max(sv) AS s_max FROM r GROUP BY host)
    SELECT CAST(m.host AS BIGINT) AS host, CAST(m.s_max AS BIGINT) AS s_max,
           CAST(min(r.day) AS BIGINT) AS peak_day
    FROM m JOIN r ON r.host = m.host AND r.sv = m.s_max
    GROUP BY 1, 2
    """,
    doc="CUSUM change-point detection over per-host daily event "
    "counts (Page 1954): S_i = max(0, S_(i-1) + x_i - k) with k = "
    "the host's floor-mean daily count; reports each host's peak "
    "cumulative deviation and its first day — the level-shift / "
    "burst-onset detector behind recrawl scheduling and abuse "
    "flagging.  The recurrence is computed CLOSED-FORM as cs_i - "
    "min(0, running_min(cs_i)) (prefix sums minus running minimum), "
    "which is what makes it vectorizable AND expressible as SQL "
    "window functions for the oracle.  Distributed shape: per-batch "
    "(host, day, count) combiner partials -> ONE host%%32 co-shuffle "
    "(counts only, 24 bytes/day-slot); per bucket a vectorized "
    "segmented cumsum/cummin over day-sorted rows computes every "
    "host's full CUSUM path and collapses to (host, s_max, "
    "peak_day) — one row per host leaves the bucket.",
)
def cusum_change_points(sf_dir: str):
    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"host": "int64", "day": "int64", "x": "int64", "hb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        host = t["user_id"].to_numpy().astype(np.int64) % 64
        day = t["ts"].cast(pa.int64()).to_numpy() // 86400000000
        df = pd.DataFrame({"host": host, "day": day.astype(np.int64)})
        out = df.groupby(["host", "day"], as_index=False, sort=False).size()
        out = out.rename(columns={"size": "x"})
        out["x"] = out["x"].astype(np.int64)
        out["hb"] = (out["host"].to_numpy() % 32).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"host": "int64", "s_max": "int64", "peak_day": "int64"}
        if g.shape[1] == 0 or len(g) == 0 or "host" not in g.columns:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        # merge cross-batch partials, then walk each host's day series
        c = g.groupby(["host", "day"], as_index=False, sort=False)["x"].sum()
        c = c.sort_values(["host", "day"], kind="stable").reset_index(drop=True)
        grp = c.groupby("host", sort=False)
        nd = grp["x"].transform("size").to_numpy().astype(np.int64)
        sx = grp["x"].transform("sum").to_numpy().astype(np.int64)
        d = c["x"].to_numpy().astype(np.int64) - sx // nd
        cs = pd.Series(d).groupby(c["host"].to_numpy()).cumsum().to_numpy()
        runmin = (pd.Series(cs).groupby(c["host"].to_numpy()).cummin()
                  .to_numpy())
        sv = cs - np.minimum(0, runmin)
        c["sv"] = sv
        smax = c.groupby("host", sort=False)["sv"].transform("max").to_numpy()
        at = c[c["sv"].to_numpy() == smax]
        out = at.groupby("host", as_index=False, sort=False).agg(
            s_max=("sv", "max"), peak_day=("day", "min"))
        return pd.DataFrame({"host": out["host"].to_numpy().astype(np.int64),
                             "s_max": out["s_max"].to_numpy().astype(np.int64),
                             "peak_day": out["peak_day"].to_numpy().astype(np.int64)})

    return (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(per_bucket, batch_format="pandas")
        .map_batches(lambda df: df[["host", "s_max", "peak_day"]],
                     batch_format="pandas")
    )


@register(
    "late_event_audit",
    """
    WITH a AS (SELECT user_id % 64 AS host, epoch_us(ts) AS tus,
                      epoch_us(ts) + (event_id % 7) * 3600000000 AS arr,
                      event_id
               FROM events),
    w AS (SELECT host, tus,
                 max(tus) OVER (ORDER BY arr, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS wm
          FROM a),
    l AS (SELECT host, wm - tus AS late_us FROM w
          WHERE wm IS NOT NULL AND wm - tus > 3600000000)
    SELECT CAST(host AS BIGINT) AS host, CAST(count(*) AS BIGINT) AS n_late,
           CAST(max(late_us) AS BIGINT) AS max_late_us
    FROM l GROUP BY 1
    """,
    doc="Streaming late-arrival audit: events are delivered with a "
    "deterministic per-event delay (event_id%%7 hours — the "
    "out-of-order model), the watermark is the running max event "
    "time in ARRIVAL order, and an event is late when it arrives "
    "more than 1h behind the watermark — the accounting a windowed "
    "aggregator needs to size its allowed-lateness buffer "
    "(stages/stream.py's knob).  Distributed shape: the arrival "
    "ordering is a global sort; the watermark is then a distributed "
    "EXCLUSIVE prefix-MAX — the add_prefix_sum two-phase scan with "
    "max instead of sum: phase 1 collects one (first-key, block "
    "max) row per block, the driver computes exclusive running "
    "maxima (tiny), phase 2 re-walks the SAME blocks combining the "
    "block offset with a within-block exclusive cummax; lateness "
    "collapses to per-host (n, max) partials in the same pass.",
)
def late_event_audit(sf_dir: str, lateness_us: int = 3_600_000_000):
    import ray
    from ray.data.aggregate import Max, Sum

    HOUR = 3_600_000_000

    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"host": "int64", "tus": "int64", "arr": "int64", "eid": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        tus = t["ts"].cast(pa.int64()).to_numpy()
        eid = t["event_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"host": t["user_id"].to_numpy().astype(np.int64) % 64,
                             "tus": tus.astype(np.int64),
                             "arr": tus + (eid % 7) * HOUR, "eid": eid})

    ds = (
        _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .sort(["arr", "eid"])
        .materialize()
    )

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a0": pa.array([], type=pa.int64()),
                             "e0": pa.array([], type=pa.int64()),
                             "mx": pa.array([], type=pa.int64())})
        # sorted by (arr, eid): row 0 holds the block's minimal key
        return pa.table({"a0": pa.array([t["arr"][0].as_py()], type=pa.int64()),
                         "e0": pa.array([t["eid"][0].as_py()], type=pa.int64()),
                         "mx": pa.array([pc.max(t["tus"]).as_py()], type=pa.int64())})

    summ = (
        ds.map_batches(block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["a0", "e0"])
    )
    mxs = summ["mx"].to_numpy(dtype=np.int64)
    NEG = np.int64(-(2 ** 62))
    offs = np.concatenate([[NEG], np.maximum.accumulate(mxs)[:-1]])
    oref = ray.put((summ["a0"].to_numpy(dtype=np.int64),
                    summ["e0"].to_numpy(dtype=np.int64), offs))

    def scan(t: pa.Table) -> pd.DataFrame:
        cols = {"host": "int64", "n_late": "int64", "max_late_us": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        a0s, e0s, os_ = ray.get(oref)
        a0, e0 = t["arr"][0].as_py(), t["eid"][0].as_py()
        i = np.searchsorted(a0s, a0)
        while i < len(a0s) and a0s[i] == a0 and e0s[i] != e0:
            i += 1
        assert i < len(a0s) and a0s[i] == a0 and e0s[i] == e0, \
            "prefix-max block boundaries diverged"
        base = os_[i]
        tus = t["tus"].to_numpy(zero_copy_only=False).astype(np.int64)
        excl = np.concatenate([[NEG], np.maximum.accumulate(tus)[:-1]])
        wm = np.maximum(base, excl)
        late = wm - tus
        keep = late > lateness_us
        if not keep.any():
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        host = t["host"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        df = pd.DataFrame({"host": host, "late": late[keep]})
        out = df.groupby("host", sort=False)["late"].agg(["size", "max"]).reset_index()
        return pd.DataFrame({"host": out["host"].to_numpy().astype(np.int64),
                             "n_late": out["size"].to_numpy().astype(np.int64),
                             "max_late_us": out["max"].to_numpy().astype(np.int64)})

    return (
        ds.map_batches(scan, batch_format="pyarrow", batch_size=None)
        .groupby("host")
        .aggregate(Sum("n_late", alias_name="n_late"),
                   Max("max_late_us", alias_name="max_late_us"))
    )


@register(
    "zipf_slope",
    """
    WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS f
           FROM toks GROUP BY 1, 2),
    rk AS (SELECT source, f,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY f DESC, term) AS r
           FROM tc),
    lg AS (SELECT source,
                  CAST(length(bin(r)) - 1 AS BIGINT) AS lr,
                  CAST(length(bin(f)) - 1 AS BIGINT) AS lf
           FROM rk WHERE r <= 64),
    s AS (SELECT source, CAST(count(*) AS BIGINT) AS k,
                 sum(lr) AS sl, sum(lf) AS sf2,
                 sum(lr*lf) AS slf, sum(lr*lr) AS sl2
          FROM lg GROUP BY 1)
    SELECT source, k,
           CAST((1024 * (k*slf - sl*sf2)) // (k*sl2 - sl*sl) AS BIGINT)
             AS slope_q
    FROM s
    """,
    doc="Zipf slope per source (power-law corpus-health monitor: the "
    "log-log rank-frequency regression slope over each source's top "
    "64 terms, ~-1024 for natural language at x1024 quantization, "
    "near 0 for degenerate/boilerplate sources).  NO log or float "
    "anywhere: floor(log2) is the bin() bit-length idiom "
    "(length(bin(x))-1, the hll_registers trick) on both sides, and "
    "the least-squares slope is a ratio of integer moments with "
    "truncation-toward-zero matching DuckDB's signed //.  "
    "Distributed shape: per-batch (source, term) partial counts -> "
    "ONE bucketed_agg completes term frequencies (text never "
    "shuffles); a second source%%32 shuffle co-locates each "
    "source's terms; per bucket a vectorized (f desc, term) sort + "
    "segmented rank keeps top-64/source and folds the five "
    "regression moments — one row per source leaves.",
)
def zipf_slope(sf_dir: str, topk: int = 64):
    from .stages.relational import bucketed_agg

    def explode(t: pa.Table) -> pd.DataFrame:
        cols = {"source": "object", "term": "object", "f": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        srcs, terms = [], []
        for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for w in txt.split(" "):
                srcs.append(s)
                terms.append(w)
        df = pd.DataFrame({"source": srcs, "term": terms})
        out = df.groupby(["source", "term"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "f"}).astype(cols)

    tc = bucketed_agg(
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(explode, batch_format="pyarrow"),
        keys=["source", "term"], sum_cols={"f": "f"},
        key_dtypes={"source": "object", "term": "object"},
    )

    def add_sb(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": "object", "term": "object", "f": "int64",
                "sb": "int32"}
        if df.shape[1] == 0 or len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        h = pd.util.hash_pandas_object(df["source"], index=False).to_numpy()
        df = df.copy()
        df["sb"] = (h % 32).astype("int32")
        return df

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": "object", "k": "int64", "slope_q": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if g.shape[1] == 0 or len(g) == 0 or "source" not in g.columns:
            return empty
        g = g.sort_values(["source", "f", "term"],
                          ascending=[True, False, True], kind="stable")
        rows = []
        for src, gg in g.groupby("source", sort=False):
            f = gg["f"].to_numpy().astype(np.int64)[:topk]
            k = len(f)
            lr = np.array([int(r).bit_length() - 1 for r in range(1, k + 1)],
                          dtype=np.int64)
            lf = np.array([int(x).bit_length() - 1 for x in f], dtype=np.int64)
            sl, sf2 = int(lr.sum()), int(lf.sum())
            slf, sl2 = int((lr * lf).sum()), int((lr * lr).sum())
            num = 1024 * (k * slf - sl * sf2)
            den = k * sl2 - sl * sl
            q = abs(num) // den
            rows.append((src, k, q if num >= 0 else -q))
        return pd.DataFrame(rows, columns=["source", "k", "slope_q"]
                            ).astype(cols)

    return (
        tc.map_batches(add_sb, batch_format="pandas")
        .groupby("sb")
        .map_groups(per_source, batch_format="pandas")
        .map_batches(lambda df: df[["source", "k", "slope_q"]],
                     batch_format="pandas")
    )


@register(
    "ks_length_drift",
    """
    WITH l AS (SELECT source, length(text) // 16 AS v FROM documents),
    n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM l GROUP BY 1),
    c AS (SELECT source, v, CAST(count(*) AS BIGINT) AS k FROM l GROUP BY 1, 2),
    grid AS (SELECT s.source, g.v
             FROM (SELECT DISTINCT source FROM l) s
             CROSS JOIN (SELECT DISTINCT v FROM l) g),
    cum AS (SELECT grid.source, grid.v,
                   sum(coalesce(c.k, 0)) OVER (PARTITION BY grid.source
                                               ORDER BY grid.v) AS cum
            FROM grid LEFT JOIN c ON c.source = grid.source
                                 AND c.v = grid.v),
    p AS (SELECT a.source AS src_a, b.source AS src_b,
                 max(abs(a.cum * nb.n - b.cum * na.n)) AS d,
                 max(na.n) AS na_, max(nb.n) AS nb_
          FROM cum a
          JOIN cum b ON b.v = a.v AND b.source > a.source
          JOIN n na ON na.source = a.source
          JOIN n nb ON nb.source = b.source
          GROUP BY 1, 2)
    SELECT src_a, src_b, CAST((1024 * d) // (na_ * nb_) AS BIGINT) AS ks_q
    FROM p ORDER BY ks_q DESC, src_a, src_b LIMIT 50
    """,
    doc="Two-sample Kolmogorov-Smirnov drift between every source "
    "pair's document-length distributions (order-statistic "
    "complement to corpus_drift's term-space L1): KS = max over the "
    "merged value grid of |F_a - F_b|, computed EXACTLY as the "
    "integer cross-multiplication max|cum_a*n_b - cum_b*n_a| // "
    "(n_a*n_b), quantized x1024; lengths quantize to 16-char bins "
    "so the grid stays bounded at any corpus size (mirrored in the "
    "oracle).  Distributed shape: per-batch (source, bin) partial "
    "counts -> ONE bucketed_agg (24 bytes/bin-slot, text never "
    "moves); the counts table is bounded |sources| x |grid|, so the "
    "cumulative-and-pairwise fold runs driver-side as ONE "
    "vectorized (S x G) matrix sweep — sources are a dataset-level "
    "entity like nations, not a per-row one.",
)
def ks_length_drift(sf_dir: str, k: int = 50):
    from .stages.relational import bucketed_agg

    def partial(t: pa.Table) -> pd.DataFrame:
        cols = {"source": "object", "v": "int64", "k": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        v = pc.utf8_length(t["text"]).to_numpy().astype(np.int64) // 16
        df = pd.DataFrame({"source": t["source"].to_pandas().to_numpy(), "v": v})
        out = df.groupby(["source", "v"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "k"}).astype(cols)

    counts = bucketed_agg(
        _read(sf_dir, "documents", columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow"),
        keys=["source", "v"], sum_cols={"k": "k"},
        key_dtypes={"source": "object"},
    ).to_pandas()

    srcs = np.sort(counts["source"].unique())
    grid = np.sort(counts["v"].unique())
    S, G = len(srcs), len(grid)
    C = np.zeros((S, G), dtype=np.int64)
    si = {s: i for i, s in enumerate(srcs)}
    gi = {v: i for i, v in enumerate(grid)}
    for s, v, kk in counts[["source", "v", "k"]].itertuples(index=False):
        C[si[s], gi[v]] = kk
    cum = np.cumsum(C, axis=1)
    n = cum[:, -1]
    rows = []
    for i in range(S):
        # one vectorized (S-i-1, G) sweep per anchor source
        d = np.abs(cum[i][None, :] * n[i + 1:, None]
                   - cum[i + 1:] * n[i, None]).max(axis=1)
        for j0, dv in enumerate(d):
            j = i + 1 + j0
            rows.append((srcs[i], srcs[j],
                         int(1024 * int(dv)) // int(n[i] * n[j])))
    out = pd.DataFrame(rows, columns=["src_a", "src_b", "ks_q"])
    out = out.sort_values(["ks_q", "src_a", "src_b"],
                          ascending=[False, True, True], kind="stable").head(k)
    out["ks_q"] = out["ks_q"].astype(np.int64)
    return out.reset_index(drop=True)


@register(
    "market_share",
    """
    WITH mkt AS (
      SELECT CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5)
                 AS BIGINT) AS rev,
             (s.s_nationkey = (SELECT n_nationkey FROM nation
                               WHERE n_name = 'NATION_1')) AS is_target
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
                   AND r.r_name = 'AMERICA'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey)
    SELECT l_year,
           CAST(sum(CASE WHEN is_target THEN rev ELSE 0 END) AS BIGINT)
             AS target_cents,
           CAST(sum(rev) AS BIGINT) AS total_cents,
           CAST((1000 * sum(CASE WHEN is_target THEN rev ELSE 0 END))
                // sum(rev) AS BIGINT) AS share_permille
    FROM mkt GROUP BY 1
    """,
    doc="TPC-H Q8-shape market share: one supplier nation's permille "
    "share of revenue sold into a region's customer market, per ship "
    "year (the conditional-share aggregation).  Distributed shape: "
    "region/nation resolve driver-side (25 rows); the region's "
    "customer keys broadcast once as a sorted int64 membership array "
    "(past a broadcast cap: the bucketed semi-join posture); "
    "supplier -> is-target broadcasts the same way; orders filter to "
    "in-market custkeys AT THE SCAN, lineitem resolves (year, cents, "
    "is_target) locally; ONE ok%%64 co-shuffle joins them and folds "
    "to (year, target, total) partials — two int64s per year per "
    "bucket; the permille quotient runs once driver-side in exact "
    "Python ints.",
)
def market_share(sf_dir: str, region: str = "AMERICA",
                 target_nation: str = "NATION_1"):
    import ray

    nat = pq.read_table(_pq(sf_dir, "nation")).to_pandas()
    reg = pq.read_table(_pq(sf_dir, "region")).to_pandas()
    rk = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nk = set(nat.loc[nat["n_regionkey"] == rk, "n_nationkey"].astype(int))
    target_nk = int(nat.loc[nat["n_name"] == target_nation,
                            "n_nationkey"].iloc[0])

    cust = pq.read_table(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"])
    in_mkt = np.isin(cust["c_nationkey"].to_numpy().astype(np.int64),
                     np.array(sorted(region_nk), dtype=np.int64))
    mkt_ck = np.sort(cust["c_custkey"].to_numpy().astype(np.int64)[in_mkt])
    ck_ref = ray.put(mkt_ck)

    supp = pq.read_table(_pq(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy().astype(np.int64)
    so = np.argsort(sk, kind="stable")
    smap_ref = ray.put((sk[so], (supp["s_nationkey"].to_numpy().astype(np.int64)
                                 == target_nk)[so]))

    def li_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "yr": "int64", "rev": "int64", "tgt": "int64",
                "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ks, tv = ray.get(smap_ref)
        q = t["l_suppkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(ks, q)
        pos[pos >= len(ks)] = 0
        tgt = tv[pos] & (ks[pos] == q)
        ok = t["l_orderkey"].to_numpy().astype(np.int64)
        yr = pc.year(t["l_shipdate"]).to_numpy().astype(np.int64)
        rev = cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"])))
        return pd.DataFrame({"ok": ok, "yr": yr,
                             "rev": rev.to_numpy().astype(np.int64),
                             "tgt": tgt.astype(np.int64),
                             "ob": (ok % 64).astype("int32")})

    def ord_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        w = ray.get(ck_ref)
        q = t["o_custkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(w, q)
        pos[pos >= len(w)] = 0 if len(w) else 0
        keep = (w[pos] == q) if len(w) else np.zeros(len(q), dtype=bool)
        ok = t["o_orderkey"].to_numpy().astype(np.int64)[keep]
        return pd.DataFrame({"ok": ok, "ob": (ok % 64).astype("int32")})

    lis = _read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_suppkey", "l_shipdate",
                         "l_extendedprice", "l_discount"]
                ).map_batches(li_side, batch_format="pyarrow")
    ords = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]
                 ).map_batches(ord_side, batch_format="pyarrow")

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    both = ords.map_batches(tag("o"), batch_format="pandas").union(
        lis.map_batches(tag("l"), batch_format="pandas"))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"yr": "int64", "target": "int64", "total": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return empty
        o = g[g["side"] == "o"]
        l = g[g["side"] == "l"]
        if len(o) == 0 or len(l) == 0:
            return empty
        m = l[["ok", "yr", "rev", "tgt"]].merge(o[["ok"]], on="ok")
        if len(m) == 0:
            return empty
        m["target"] = m["rev"].to_numpy() * m["tgt"].to_numpy().astype(np.int64)
        out = m.groupby("yr", as_index=False, sort=False).agg(
            target=("target", "sum"), total=("rev", "sum"))
        return out.astype(cols)

    parts = (
        both.groupby("ob").map_groups(bucket, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("yr", as_index=False, sort=False)[["target", "total"]].sum()
    return pd.DataFrame({
        "l_year": agg["yr"].to_numpy().astype(np.int64),
        "target_cents": agg["target"].to_numpy().astype(np.int64),
        "total_cents": agg["total"].to_numpy().astype(np.int64),
        "share_permille": np.array(
            [(1000 * int(t)) // int(d)
             for t, d in zip(agg["target"], agg["total"])], dtype=np.int64),
    })


@register(
    "power_iteration_embed",
    """
    WITH q AS (
      SELECT vec_id, g.i AS i,
             CAST(floor(embedding[g.i + 1] * 1024) AS BIGINT) AS qv
      FROM embeddings, unnest(generate_series(0, 63)) AS g(i)),
    gU AS (SELECT a.i AS i, b.i AS j,
                  CAST(sum(a.qv * b.qv) AS HUGEINT) AS g
           FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
           GROUP BY 1, 2),
    gF AS (SELECT i, j, g FROM gU
           UNION ALL
           SELECT j AS i, i AS j, g FROM gU WHERE i < j),
    v1 AS (SELECT i, sum(g) AS v FROM gF GROUP BY i),
    v2 AS (SELECT gF.i, sum(gF.g * v1.v) AS v
           FROM gF JOIN v1 ON v1.i = gF.j GROUP BY gF.i),
    m AS (SELECT max(abs(v)) AS mx FROM v2)
    SELECT CAST(v2.i AS BIGINT) AS i,
           CAST((1024 * v2.v) // m.mx AS BIGINT) AS v_q
    FROM v2, m
    """,
    doc="Distributed power iteration toward the embedding corpus' top "
    "principal direction: two unrolled integer matvec rounds v2 = "
    "G^2 * 1 over the EXACT integer Gram matrix (the PCA/spectral "
    "step after embedding_gram's reduce), reported as the direction "
    "quantized to x1024 of its max |component| — every value an "
    "exact integer, so the eigen-direction is hash-stable under the "
    "oracle (float PCA never would be).  Distributed shape: the "
    "corpus-wide work IS embedding_gram (per-batch Q^T Q, fixed "
    "2080-cell combiner, one tiny groupby); both matvecs then run "
    "driver-side over the d x d = 64 x 64 matrix in exact Python "
    "ints (v2 components exceed int64; d^2 driver state is the "
    "documented bound, independent of corpus size).  DuckDB "
    "mirrors with HUGEINT sums; the signed final quotient uses "
    "truncation-toward-zero to match //.",
)
def power_iteration_embed(sf_dir: str, dim: int = 64):
    gt = embedding_gram(sf_dir).to_pandas()
    G = [[0] * dim for _ in range(dim)]
    for i, j, g in gt[["i", "j", "g"]].itertuples(index=False):
        G[int(i)][int(j)] = int(g)
        G[int(j)][int(i)] = int(g)
    v1 = [sum(row) for row in G]
    v2 = [sum(G[i][j] * v1[j] for j in range(dim)) for i in range(dim)]
    mx = max(abs(x) for x in v2)
    out = []
    for i, x in enumerate(v2):
        num = 1024 * x
        q = abs(num) // mx
        out.append((i, q if num >= 0 else -q))
    return pd.DataFrame({"i": np.array([r[0] for r in out], dtype=np.int64),
                         "v_q": np.array([r[1] for r in out], dtype=np.int64)})


# =====================================================================
# Session 18 — TPC-H gap closers (Q12, Q19 shapes over derived columns)
# =====================================================================

_SHIP_MODES = ["AIR", "MAIL", "RAIL", "SHIP", "TRUCK"]


@register(
    "shipmode_priority",
    """
    WITH li AS (
      SELECT l_orderkey AS ok,
             (['AIR','MAIL','RAIL','SHIP','TRUCK'])
               [CAST((l_orderkey*7 + l_linenumber) % 5 AS INT) + 1]
               AS shipmode,
             CAST(l_partkey % 30 AS BIGINT) AS cd,
             CAST(l_suppkey % 45 AS BIGINT) AS rd,
             epoch_us(l_shipdate) AS ship_us
      FROM lineitem),
    f AS (
      SELECT ok, shipmode FROM li
      WHERE shipmode IN ('MAIL','SHIP')
        AND cd > 0 AND cd < rd
        AND ship_us + rd*86400000000 >= epoch_us(TIMESTAMP '1996-01-01')
        AND ship_us + rd*86400000000 <  epoch_us(TIMESTAMP '1998-01-01'))
    SELECT f.shipmode,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM f JOIN orders o ON o.o_orderkey = f.ok
    GROUP BY f.shipmode
    """,
    doc="TPC-H Q12-shape shipping-mode service audit: for late-capable "
    "ship modes, how many line items belonged to high- vs low-priority "
    "orders.  The testdata lineitem has no shipmode/commit/receipt "
    "columns, so they are DERIVED deterministically from keys (mode = "
    "modes[(ok*7+ln)%5], commit = ship + (pk%30)d, receipt = ship + "
    "(sk%45)d) and the oracle mirrors the same arithmetic.  "
    "Distributed shape: lineitem applies the whole mode/date "
    "predicate AT THE SCAN (pure key arithmetic, no other table "
    "needed) and projects (ok, mode); orders projects (ok, is_high); "
    "ONE ok%64 tagged-union co-shuffle resolves the priority-class "
    "join in-bucket and folds to <=2 (mode, high, low) partial rows "
    "per bucket; the driver sums 128 tiny partials in exact ints.  "
    "Raw line items cross the wire once, pre-filtered.",
)
def shipmode_priority(sf_dir: str, lo: str = "1996-01-01",
                      hi: str = "1998-01-01"):
    LO = int(pd.Timestamp(lo).value // 1000)
    HI = int(pd.Timestamp(hi).value // 1000)
    DAY_US = 86400_000_000

    def li_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "mode": "object", "ob": "int32"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if t.num_rows == 0:
            return empty
        ok = t["l_orderkey"].to_numpy().astype(np.int64)
        ln = t["l_linenumber"].to_numpy().astype(np.int64)
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        ship = t["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        mode_i = (ok * 7 + ln) % 5
        cd = pk % 30
        rd = sk % 45
        recv = ship + rd * DAY_US
        keep = (
            ((mode_i == 1) | (mode_i == 3))  # MAIL, SHIP
            & (cd > 0) & (cd < rd)
            & (recv >= LO) & (recv < HI)
        )
        if not keep.any():
            return empty
        modes = np.array(_SHIP_MODES, dtype=object)
        return pd.DataFrame({"ok": ok[keep],
                             "mode": modes[mode_i[keep]],
                             "ob": (ok[keep] % 64).astype("int32")})

    def ord_side(t: pa.Table) -> pd.DataFrame:
        cols = {"ok": "int64", "hi": "int64", "ob": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ok = t["o_orderkey"].to_numpy().astype(np.int64)
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        hi_ = np.isin(pr, np.array(["1-URGENT", "2-HIGH"], dtype=object)).astype(np.int64)
        return pd.DataFrame({"ok": ok, "hi": hi_,
                             "ob": (ok % 64).astype("int32")})

    lis = _read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_linenumber", "l_partkey",
                         "l_suppkey", "l_shipdate"]
                ).map_batches(li_side, batch_format="pyarrow")
    ords = _read(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderpriority"]
                 ).map_batches(ord_side, batch_format="pyarrow")

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    both = ords.map_batches(tag("o"), batch_format="pandas").union(
        lis.map_batches(tag("l"), batch_format="pandas"))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"shipmode": "object", "h": "int64", "l": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return empty
        o = g[g["side"] == "o"]
        li = g[g["side"] == "l"]
        if len(o) == 0 or len(li) == 0:
            return empty
        m = li[["ok", "mode"]].merge(o[["ok", "hi"]], on="ok")
        if len(m) == 0:
            return empty
        agg = m.groupby("mode", sort=False)["hi"].agg(["sum", "size"])
        return pd.DataFrame({"shipmode": agg.index.to_numpy(dtype=object),
                             "h": agg["sum"].to_numpy().astype(np.int64),
                             "l": (agg["size"] - agg["sum"]).to_numpy().astype(np.int64)})

    parts = both.groupby("ob").map_groups(bucket, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"shipmode": pd.Series([], dtype=object),
                             "high_line_count": pd.Series([], dtype=np.int64),
                             "low_line_count": pd.Series([], dtype=np.int64)})
    out = parts.groupby("shipmode", as_index=False, sort=True).agg(
        high_line_count=("h", "sum"), low_line_count=("l", "sum"))
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return out


_CONTAINERS = ["SM CASE", "SM BOX", "SM PACK", "SM PKG",
               "MED BAG", "MED BOX", "MED PKG", "MED PACK",
               "LG CASE", "LG BOX", "LG PACK", "LG PKG"]


@register(
    "disjunctive_revenue",
    """
    WITH p AS (
      SELECT p_partkey, p_brand, p_size,
             CAST(p_partkey % 12 AS BIGINT) AS ci
      FROM part),
    j AS (
      SELECT CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5)
               AS BIGINT) AS rev
      FROM lineitem l JOIN p ON p.p_partkey = l.l_partkey
      WHERE
        (p.p_brand = 'Brand#12' AND p.ci BETWEEN 0 AND 3
         AND l.l_quantity >= 1 AND l.l_quantity <= 11
         AND p.p_size BETWEEN 1 AND 5)
        OR
        (p.p_brand = 'Brand#23' AND p.ci BETWEEN 4 AND 7
         AND l.l_quantity >= 10 AND l.l_quantity <= 20
         AND p.p_size BETWEEN 1 AND 10)
        OR
        (p.p_brand = 'Brand#24' AND p.ci BETWEEN 8 AND 11
         AND l.l_quantity >= 20 AND l.l_quantity <= 30
         AND p.p_size BETWEEN 1 AND 15))
    SELECT CAST(coalesce(sum(rev), 0) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM j
    """,
    doc="TPC-H Q19-shape disjunctive predicate join: revenue from "
    "three OR-ed (brand, container-class, quantity-range, size-range) "
    "clauses.  Container is DERIVED (containers[p_partkey %% 12]; the "
    "clause container sets are exactly the SM/MED/LG index ranges, so "
    "the oracle mirrors with ci BETWEEN).  Distributed shape: the "
    "part dim is filtered driver-side to the three clause brands "
    "(~12%% of part) and broadcast ONCE via ray.put as three sorted "
    "(partkey, size) arrays, one per clause; each lineitem batch "
    "applies its clause's quantity range + searchsorted membership + "
    "size range and folds to a single (revenue, count) partial row — "
    "zero shuffle, no join.  Past a broadcast cap the same predicate "
    "runs as a pk%%64 tagged-union co-shuffle (the waiting_suppliers "
    "regime); the cap posture matches promo_revenue_share.",
)
def disjunctive_revenue(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    pt = pq.read_table(_pq(sf_dir, "part"),
                       columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    pk_ = pt["p_partkey"].to_numpy().astype(np.int64)
    ci = pk_ % 12
    sz = pt["p_size"].to_numpy().astype(np.int64)
    br = pt["p_brand"].to_numpy(dtype=object)
    clauses = []
    for brand, clo, chi, qlo, qhi, slo, shi in [
        ("Brand#12", 0, 3, 1, 11, 1, 5),
        ("Brand#23", 4, 7, 10, 20, 1, 10),
        ("Brand#24", 8, 11, 20, 30, 1, 15),
    ]:
        sel = (br == brand) & (ci >= clo) & (ci <= chi) & (sz >= slo) & (sz <= shi)
        clauses.append((np.sort(pk_[sel]), qlo, qhi))
    ref = ray.put(clauses)

    def fold(t: pa.Table) -> pd.DataFrame:
        cols = {"revenue_cents": "int64", "n_lines": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        cl = ray.get(ref)
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        qty = t["l_quantity"].to_numpy()
        keep = np.zeros(len(pk), dtype=bool)
        for keys, qlo, qhi in cl:
            if len(keys) == 0:
                continue
            pos = np.searchsorted(keys, pk)
            pos[pos >= len(keys)] = 0
            hit = (keys[pos] == pk) & (qty >= qlo) & (qty <= qhi)
            keep |= hit
        if not keep.any():
            return pd.DataFrame({"revenue_cents": [0], "n_lines": [0]})
        rev = cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"]))
                    ).to_numpy().astype(np.int64)
        return pd.DataFrame({"revenue_cents": [int(rev[keep].sum())],
                             "n_lines": [int(keep.sum())]})

    tot = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity", "l_extendedprice",
                       "l_discount"])
        .map_batches(fold, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                   Sum("n_lines", alias_name="n_lines"))
        .to_pandas()
    )
    return pd.DataFrame({
        "revenue_cents": [int(tot["revenue_cents"].iloc[0])],
        "n_lines": [int(tot["n_lines"].iloc[0])],
    })


# =====================================================================
# Session 18 — interval union, concentration, autocorrelation
# =====================================================================


@register(
    "interval_coverage",
    """
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + (1 + event_id % 7) * 60000000 AS e
      FROM events),
    w AS (
      SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax
      FROM iv),
    g AS (
      SELECT user_id, s, e,
             sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS isl
      FROM w),
    m AS (SELECT user_id, isl, max(e) - min(s) AS len
          FROM g GROUP BY 1, 2)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(len) AS BIGINT) AS covered_us
    FROM m GROUP BY user_id
    """,
    doc="Union-of-intervals session coverage: each event opens a "
    "[ts, ts + (1 + event_id%7) minutes) activity interval; per user, "
    "overlapping/touching intervals merge and the query reports the "
    "merged-island count and total covered microseconds — the classic "
    "gaps-and-islands shape (uptime/session-time accounting).  "
    "Touching intervals (s == prev max end) MERGE (strict > opens an "
    "island).  Distributed shape: ONE coarse user-bucket shuffle; per "
    "bucket a single vectorized pass — sort by (user, s, e), "
    "per-user running max of interval ends via grouped cummax, "
    "island ids via cumsum of boundary flags, then a (user, island) "
    "groupby for min-start/max-end — no Python loop over rows.  The "
    "oracle mirrors with the runmax window idiom; island identity is "
    "tie-safe because the (s, e) sort makes equal rows adjacent and "
    "merge order over duplicates is symmetric.",
)
def interval_coverage(sf_dir: str):
    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"u": "int64", "s": "int64", "e": "int64", "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        u = t["user_id"].to_numpy().astype(np.int64)
        s = t["ts"].cast(pa.int64()).to_numpy()
        dur = (1 + t["event_id"].to_numpy().astype(np.int64) % 7) * 60_000_000
        return pd.DataFrame({"u": u, "s": s, "e": s + dur,
                             "ub": (u % 32).astype("int32")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_islands": "int64", "covered_us": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["u", "s", "e"], kind="stable").reset_index(drop=True)
        pmax = g.groupby("u", sort=False)["e"].cummax().shift(1)
        first = g["u"].ne(g["u"].shift(1))
        new_isl = first | (g["s"] > pmax)
        isl = new_isl.cumsum()
        m = g.assign(isl=isl).groupby(["u", "isl"], sort=False).agg(
            s=("s", "min"), e=("e", "max"))
        out = m.assign(len=m["e"] - m["s"]).groupby(level="u").agg(
            n_islands=("len", "size"), covered_us=("len", "sum"))
        return pd.DataFrame({
            "user_id": out.index.to_numpy().astype(np.int64),
            "n_islands": out["n_islands"].to_numpy().astype(np.int64),
            "covered_us": out["covered_us"].to_numpy().astype(np.int64),
        })

    return (
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


@register(
    "gini_concentration",
    """
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events
               GROUP BY user_id),
    r AS (SELECT cnt,
                 row_number() OVER (ORDER BY cnt, user_id) AS rk
          FROM c),
    s AS (SELECT count(*) AS n, sum(cnt) AS s0, sum(rk * cnt) AS s1
          FROM r)
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(s0 AS BIGINT) AS total_events,
           CAST((1000000 * (2*s1 - (n+1)*s0)) // (n*s0) AS BIGINT)
             AS gini_q
    FROM s
    """,
    doc="Gini coefficient of per-user event-volume concentration "
    "(x1e6 quantized; 0 = uniform load, ->1e6 = one user dominates) "
    "— the workload-skew diagnostic a crawl scheduler reads before "
    "assigning politeness budgets.  Exact integer identity G = "
    "(2*Sum(i*x_i) - (n+1)*Sum(x)) / (n*Sum(x)) over ascending-"
    "sorted counts; ranks over ties are permutation-invariant "
    "(equal x contribute x*Sum(i) regardless of order), so the "
    "statistic is hash-stable.  Distributed shape: per-user counts "
    "via bucketed_agg (combiner before the shuffle); the counts "
    "dataset gets a DISTRIBUTED rank via the add_prefix_sum "
    "two-phase scan over a unique (cnt<<32 | user) sort key; each "
    "block folds to one (n, Sum x, Sum rank*x) partial and the "
    "driver computes the final quotient from three exact Python "
    "ints.  The raw event stream crosses one combiner'd shuffle; "
    "the scan moves only (key, count) pairs.",
)
def gini_concentration(sf_dir: str):
    from ray.data.aggregate import Sum

    from .stages.relational import add_prefix_sum, bucketed_agg

    counts = bucketed_agg(
        _read(sf_dir, "events", columns=["user_id"]).map_batches(
            lambda t: pd.DataFrame(
                {"user_id": t["user_id"].to_numpy().astype(np.int64),
                 "one": np.ones(t.num_rows, dtype=np.int64)}),
            batch_format="pyarrow"),
        keys=["user_id"], sum_cols={"one": "cnt"},
    )

    def keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"okey": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64()),
                             "one": pa.array([], type=pa.int64())})
        u = pc.cast(t["user_id"], pa.int64())
        cnt = pc.cast(t["cnt"], pa.int64())
        okey = pc.add(pc.multiply(cnt, pa.scalar(1 << 32, type=pa.int64())), u)
        return pa.table({"okey": okey, "cnt": cnt,
                         "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    ranked = add_prefix_sum(
        counts.map_batches(keyed, batch_format="pyarrow"),
        col="one", out_col="rk0", order_col="okey")

    def fold(t: pa.Table) -> pd.DataFrame:
        cols = {"n": "int64", "s0": "int64", "s1": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        cnt = t["cnt"].to_numpy().astype(np.int64)
        rk = t["rk0"].to_numpy().astype(np.int64) + 1
        return pd.DataFrame({"n": [len(cnt)], "s0": [int(cnt.sum())],
                             "s1": [int((rk * cnt).sum())]})

    tot = (
        ranked.map_batches(fold, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n", alias_name="n"), Sum("s0", alias_name="s0"),
                   Sum("s1", alias_name="s1"))
        .to_pandas()
    )
    n = int(tot["n"].iloc[0])
    s0 = int(tot["s0"].iloc[0])
    s1 = int(tot["s1"].iloc[0])
    gini_q = (1_000_000 * (2 * s1 - (n + 1) * s0)) // (n * s0) if n and s0 else 0
    return pd.DataFrame({"n_users": [np.int64(n)],
                         "total_events": [np.int64(s0)],
                         "gini_q": [np.int64(gini_q)]})


@register(
    "lag1_autocorr",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS tus, event_id,
             CAST(floor(value*100 + 0.5) AS HUGEINT) AS x
      FROM events),
    l AS (
      SELECT user_id, x,
             lead(x) OVER (PARTITION BY user_id
                           ORDER BY tus, event_id) AS nx,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY tus, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM e),
    s AS (
      SELECT user_id, max(n) AS n, sum(x) AS sx, sum(x*x) AS q,
             sum(CASE WHEN nx IS NOT NULL THEN x*nx ELSE 0 END) AS p,
             sum(CASE WHEN rn = 1 THEN x ELSE 0 END) AS xh,
             sum(CASE WHEN rn = n THEN x ELSE 0 END) AS xt
      FROM l GROUP BY user_id)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(n AS BIGINT) AS n_events,
           CAST((1024 * (n*n*p - n*sx*(2*sx - xh - xt) + (n-1)*sx*sx))
                // (n*n*q - n*sx*sx) AS BIGINT) AS r1_q
    FROM s
    WHERE n >= 3 AND (n*n*q - n*sx*sx) > 0
    """,
    doc="Per-user lag-1 autocorrelation of the event value series "
    "(ordered by ts, event_id; values in exact cents), quantized "
    "x1024 — the serial-dependence signal that separates trending "
    "metrics from white noise in per-host monitoring.  Exact integer "
    "cross-multiplication: r1 = Sum(x_t-mu)(x_{t+1}-mu) / "
    "Sum(x_t-mu)^2 scaled by n^2 gives num = n^2*P - n*S*(2S-x1-xn) "
    "+ (n-1)*S^2 and den = n^2*Q - n*S^2 (P = adjacent products, "
    "Q = sum of squares, S = sum) — both exceed int64 at long "
    "series, so per-user finals run in exact Python ints (HUGEINT "
    "in the oracle) with truncation-toward-zero matching DuckDB's "
    "signed //.  Distributed shape: ONE coarse user-bucket shuffle "
    "of (user, tus, event_id, cents) rows; per bucket a vectorized "
    "sort + segmented adjacent-product mask (shifted user compare), "
    "per-user int64-safe partial moments, then the tiny per-user "
    "quotient loop.  Constant series (den = 0) and n < 3 are "
    "filtered, mirroring the oracle.",
)
def lag1_autocorr(sf_dir: str):
    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"u": "int64", "tus": "int64", "eid": "int64", "x": "int64",
                "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        u = t["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "u": u,
            "tus": t["ts"].cast(pa.int64()).to_numpy(),
            "eid": t["event_id"].to_numpy().astype(np.int64),
            "x": cents(t["value"]).to_numpy().astype(np.int64),
            "ub": (u % 32).astype("int32"),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_events": "int64", "r1_q": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if g.shape[1] == 0 or len(g) == 0:
            return empty
        g = g.sort_values(["u", "tus", "eid"], kind="stable").reset_index(drop=True)
        u = g["u"].to_numpy()
        x = g["x"].to_numpy()
        same = np.empty(len(g), dtype=bool)
        same[:-1] = u[:-1] == u[1:]
        same[-1] = False
        prod = np.where(same, x * np.roll(x, -1), 0)
        df = pd.DataFrame({"u": u, "x": x, "xx": x * x, "p": prod})
        gb = df.groupby("u", sort=False)
        agg = gb.agg(n=("x", "size"), sx=("x", "sum"), q=("xx", "sum"),
                     p=("p", "sum"), xh=("x", "first"), xt=("x", "last"))
        out_u, out_n, out_r = [], [], []
        for uid, row in agg.iterrows():
            n = int(row["n"])
            if n < 3:
                continue
            S, Q, P = int(row["sx"]), int(row["q"]), int(row["p"])
            xh, xt = int(row["xh"]), int(row["xt"])
            den = n * n * Q - n * S * S
            if den <= 0:
                continue
            num = 1024 * (n * n * P - n * S * (2 * S - xh - xt)
                          + (n - 1) * S * S)
            q_ = abs(num) // den
            out_u.append(int(uid))
            out_n.append(n)
            out_r.append(q_ if num >= 0 else -q_)
        return pd.DataFrame({"user_id": pd.Series(out_u, dtype="int64"),
                             "n_events": pd.Series(out_n, dtype="int64"),
                             "r1_q": pd.Series(out_r, dtype="int64")})

    return (
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


# =====================================================================
# Session 18 — TPC-H Q9/Q20/Q2 shapes over a DERIVED partsupp bridge
# (the testdata has no partsupp table; ps rows are generated
# deterministically: part pk supplies via sk_j = (pk*13 + j*29) % NS
# for j in 0..3, availqty = (pk*7 + sk*11) % 1000, supplycost cents =
# 100 + (pk*37 + sk*61) % 99901 — every derivation mirrored in SQL)
# =====================================================================


def _supplier_count(sf_dir: str) -> int:
    return pq.read_metadata(_pq(sf_dir, "supplier")).num_rows


@register(
    "product_profit",
    """
    WITH fp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
    j AS (
      SELECT n.n_name AS nation,
             year(l.l_shipdate) AS o_year,
             CAST(floor(l.l_extendedprice*(1-l.l_discount)*100 + 0.5)
                  AS BIGINT)
             - (100 + (l.l_partkey*37 + l.l_suppkey*61) % 99901)
               * CAST(floor(l.l_quantity) AS BIGINT) AS profit_c
      FROM lineitem l
      JOIN fp ON fp.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey)
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
           CAST(sum(profit_c) AS BIGINT) AS profit_cents
    FROM j GROUP BY 1, 2
    """,
    doc="TPC-H Q9-shape product-type profit: per (supplier nation, "
    "ship year), revenue minus supply cost x quantity for parts whose "
    "name contains 'red'.  Supply cost is the derived-partsupp "
    "formula evaluated at the line item's own (partkey, suppkey) — "
    "pure key arithmetic, so the classic 6-way join collapses to "
    "TWO dim broadcasts.  Distributed shape: the name-filtered "
    "partkey set (~1/8 of part) and the supplier→nation int array "
    "are ray.put once; each lineitem batch filters by searchsorted "
    "membership, computes exact profit cents, and pre-aggregates to "
    "(nation, year) partials (<=25 nations x years rows per batch); "
    "a tiny groupby finishes.  No fact-to-fact shuffle at all; the "
    "nation-name join happens driver-side on the bounded final "
    "frame.",
)
def product_profit(sf_dir: str):
    import ray
    from ray.data.aggregate import Sum

    pt = pq.read_table(_pq(sf_dir, "part"),
                       columns=["p_partkey", "p_name"]).to_pandas()
    red = np.sort(pt.loc[pt["p_name"].str.contains("red"), "p_partkey"]
                  .to_numpy().astype(np.int64))
    sup = pq.read_table(_pq(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    natmap = np.zeros(int(sup["s_suppkey"].max()) + 1, dtype=np.int64)
    natmap[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    ref = ray.put((red, natmap))

    def fold(t: pa.Table) -> pd.DataFrame:
        cols = {"nk": "int64", "o_year": "int64", "profit_c": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        red_, nm = ray.get(ref)
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(red_, pk)
        pos[pos >= len(red_)] = 0
        keep = (red_[pos] == pk) if len(red_) else np.zeros(len(pk), bool)
        if not keep.any():
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        t = t.filter(pa.array(keep))
        pk = pk[keep]
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        qty = np.floor(t["l_quantity"].to_numpy()).astype(np.int64)
        rev = cents(pc.multiply(t["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0), t["l_discount"]))
                    ).to_numpy().astype(np.int64)
        cost = 100 + (pk * 37 + sk * 61) % 99901
        prof = rev - cost * qty
        yr = pd.DatetimeIndex(t["l_shipdate"].to_pandas()).year.to_numpy().astype(np.int64)
        df = pd.DataFrame({"nk": nm[sk], "o_year": yr, "profit_c": prof})
        return df.groupby(["nk", "o_year"], as_index=False, sort=False)["profit_c"].sum()

    parts = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_quantity",
                       "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(fold, batch_format="pyarrow")
        .groupby(["nk", "o_year"])
        .aggregate(Sum("profit_c", alias_name="profit_cents"))
        .to_pandas()
    )
    nat = pq.read_table(_pq(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    m = parts.merge(nat, left_on="nk", right_on="n_nationkey")
    return pd.DataFrame({"nation": m["n_name"].to_numpy(dtype=object),
                         "o_year": m["o_year"].to_numpy().astype(np.int64),
                         "profit_cents": m["profit_cents"].to_numpy().astype(np.int64)})


@register(
    "excess_stock_suppliers",
    """
    WITH ns AS (SELECT count(*) AS c FROM supplier),
    fp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'),
    ps AS (
      SELECT p_partkey AS pk,
             (p_partkey*13 + j*29) % (SELECT c FROM ns) AS sk,
             (p_partkey*7
              + ((p_partkey*13 + j*29) % (SELECT c FROM ns))*11) % 1000
               AS avail
      FROM fp, unnest(generate_series(0, 3)) AS t(j)),
    q AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             sum(CAST(floor(l_quantity) AS BIGINT)) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2),
    x AS (
      SELECT ps.sk, count(*) AS n_excess
      FROM ps LEFT JOIN q ON q.pk = ps.pk AND q.sk = ps.sk
      WHERE ps.avail > 0 AND 2*ps.avail > coalesce(q.qty, 0)
      GROUP BY ps.sk)
    SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
           CAST(x.n_excess AS BIGINT) AS n_excess
    FROM x JOIN supplier s ON s.s_suppkey = x.sk
    """,
    doc="TPC-H Q20-shape excess-stock audit: per supplier, how many "
    "'blue' (pk, sk) stock positions exceed half the year's shipped "
    "quantity (avail > 0 guards the no-shipment case; a COUNT "
    "rather than Q20's bare EXISTS so the hash certifies "
    "discriminative per-supplier values — membership alone is "
    "near-vacuous on this data).  The partsupp bridge "
    "is GENERATED, not stored: the name-filtered part stream "
    "explodes to 4 (pk, sk, avail) rows per part inside map_batches "
    "(derivation is per-row key arithmetic, so generation is "
    "embarrassingly parallel and never materializes the bridge).  "
    "Distributed shape: lineitem pre-filters the ship-year at the "
    "scan and combiner-aggregates quantity per (pk, sk) via "
    "bucketed_agg; generated partsupp and the quantity sums meet in "
    "ONE pk%64 tagged-union co-shuffle; the in-bucket left merge "
    "applies the half-stock predicate and emits surviving suppkeys; "
    "a distinct + the bounded supplier-dim name fetch finish "
    "driver-side.  Mirrors the reference's correlated NOT-EXISTS "
    "dissolve into bucket locality.",
)
def excess_stock_suppliers(sf_dir: str, lo: str = "1997-01-01",
                           hi: str = "1998-01-01"):
    from .stages.relational import bucketed_agg

    NS = _supplier_count(sf_dir)
    LO, HI = pd.Timestamp(lo), pd.Timestamp(hi)

    def explode_ps(t: pa.Table) -> pd.DataFrame:
        cols = {"pk": "int64", "sk": "int64", "avail": "int64", "pb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        name = t["p_name"].to_pandas()
        t = t.filter(pa.array(name.str.contains("blue").to_numpy()))
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        pk = np.repeat(t["p_partkey"].to_numpy().astype(np.int64), 4)
        j = np.tile(np.arange(4, dtype=np.int64), t.num_rows)
        sk = (pk * 13 + j * 29) % NS
        avail = (pk * 7 + sk * 11) % 1000
        return pd.DataFrame({"pk": pk, "sk": sk, "avail": avail,
                             "pb": (pk % 64).astype("int32")})

    def li_prep(t: pa.Table) -> pd.DataFrame:
        cols = {"pk": "int64", "sk": "int64", "qty": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(LO)),
                             pc.less(t["l_shipdate"], pa.scalar(HI))))
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        return pd.DataFrame({
            "pk": t["l_partkey"].to_numpy().astype(np.int64),
            "sk": t["l_suppkey"].to_numpy().astype(np.int64),
            "qty": np.floor(t["l_quantity"].to_numpy()).astype(np.int64),
        })

    qsum = bucketed_agg(
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
              ).map_batches(li_prep, batch_format="pyarrow"),
        keys=["pk", "sk"], sum_cols={"qty": "qty"},
    ).map_batches(
        lambda df: df.assign(pb=(df["pk"].to_numpy() % 64).astype("int32"),
                             side="q") if len(df) else df.assign(
                                 pb=pd.Series([], dtype="int32"),
                                 side=pd.Series([], dtype=object)),
        batch_format="pandas")

    psds = _read(sf_dir, "part", columns=["p_partkey", "p_name"]).map_batches(
        explode_ps, batch_format="pyarrow").map_batches(
        lambda df: df.assign(side="p"), batch_format="pandas")

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.shape[1] == 0 or len(g) == 0 or "side" not in g.columns:
            return pd.DataFrame({"sk": pd.Series([], dtype="int64")})
        ps = g[g["side"] == "p"]
        if len(ps) == 0:
            return pd.DataFrame({"sk": pd.Series([], dtype="int64")})
        q = g[g["side"] == "q"]
        m = ps[["pk", "sk", "avail"]].merge(q[["pk", "sk", "qty"]],
                                            on=["pk", "sk"], how="left")
        qty = m["qty"].fillna(0).to_numpy().astype(np.int64)
        av = m["avail"].to_numpy().astype(np.int64)
        win = m.loc[(av > 0) & (2 * av > qty), "sk"]
        cnt = win.value_counts().sort_index()
        return pd.DataFrame({"sk": cnt.index.to_numpy().astype(np.int64),
                             "n": cnt.to_numpy().astype(np.int64)})

    sks = (
        psds.union(qsum).groupby("pb")
        .map_groups(bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(sks) == 0:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype=object),
                             "n_excess": pd.Series([], dtype="int64")})
    per_sk = sks.groupby("sk", as_index=False)["n"].sum()
    sup = pq.read_table(_pq(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_name"]).to_pandas()
    out = per_sk.merge(sup, left_on="sk", right_on="s_suppkey").sort_values("sk")
    return pd.DataFrame({"s_suppkey": out["s_suppkey"].to_numpy().astype(np.int64),
                         "s_name": out["s_name"].to_numpy(dtype=object),
                         "n_excess": out["n"].to_numpy().astype(np.int64)})


@register(
    "min_cost_supplier",
    """
    WITH ns AS (SELECT count(*) AS c FROM supplier),
    rs AS (
      SELECT s.s_suppkey FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'),
    ps AS (
      SELECT p.p_partkey AS pk,
             (p.p_partkey*13 + j*29) % (SELECT c FROM ns) AS sk
      FROM part p, unnest(generate_series(0, 3)) AS t(j)
      WHERE p.p_size % 10 = 5),
    pcost AS (
      SELECT ps.pk, ps.sk,
             100 + (ps.pk*37 + ps.sk*61) % 99901 AS cost_c
      FROM ps JOIN rs ON rs.s_suppkey = ps.sk),
    mn AS (SELECT pk, min(cost_c) AS mc FROM pcost GROUP BY 1)
    SELECT CAST(mn.pk AS BIGINT) AS p_partkey,
           CAST(min(pcost.sk) AS BIGINT) AS s_suppkey,
           CAST(mn.mc AS BIGINT) AS cost_cents
    FROM mn JOIN pcost ON pcost.pk = mn.pk AND pcost.cost_c = mn.mc
    GROUP BY mn.pk, mn.mc
    """,
    doc="TPC-H Q2-shape minimum-cost supplier: for each size-filtered "
    "part, the cheapest ASIA-region supplier among its 4 derived "
    "partsupp suppliers (tie broken by smallest suppkey — the "
    "correlated MIN subquery of Q2).  Distributed shape: the "
    "region's supplier membership is a broadcast boolean array "
    "(region x nation x supplier dims resolved driver-side, bounded "
    "by the supplier dim); each part batch explodes its own 4 "
    "candidate (sk, cost) columns and takes a vectorized masked "
    "argmin per row via a (cost << 20 | sk) combined key — the "
    "bridge rows for a part never leave the batch that generated "
    "them, so the whole query is ZERO-shuffle and emits one row per "
    "qualifying part.",
)
def min_cost_supplier(sf_dir: str, region: str = "ASIA"):
    import ray

    NS = _supplier_count(sf_dir)
    sup = pq.read_table(_pq(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(_pq(sf_dir, "nation"),
                        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = pq.read_table(_pq(sf_dir, "region"),
                        columns=["r_regionkey", "r_name"]).to_pandas()
    rks = set(reg.loc[reg["r_name"] == region, "r_regionkey"].tolist())
    nks = set(nat.loc[nat["n_regionkey"].isin(rks), "n_nationkey"].tolist())
    mask = np.zeros(NS, dtype=bool)
    insk = sup.loc[sup["s_nationkey"].isin(nks), "s_suppkey"].to_numpy()
    mask[insk] = True
    mref = ray.put(mask)

    def per_batch(t: pa.Table) -> pd.DataFrame:
        cols = {"p_partkey": "int64", "s_suppkey": "int64",
                "cost_cents": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if t.num_rows == 0:
            return empty
        sz = t["p_size"].to_numpy().astype(np.int64)
        t = t.filter(pa.array(sz % 10 == 5))
        if t.num_rows == 0:
            return empty
        m = ray.get(mref)
        pk = t["p_partkey"].to_numpy().astype(np.int64)
        j = np.arange(4, dtype=np.int64)[None, :]
        sk = (pk[:, None] * 13 + j * 29) % NS
        cost = 100 + (pk[:, None] * 37 + sk * 61) % 99901
        key = (cost << 20) | sk
        SENT = np.int64(1) << 62
        key = np.where(m[sk], key, SENT)
        best = key.min(axis=1)
        ok = best < SENT
        if not ok.any():
            return empty
        best = best[ok]
        return pd.DataFrame({"p_partkey": pk[ok],
                             "s_suppkey": best & ((1 << 20) - 1),
                             "cost_cents": best >> 20})

    return (
        _read(sf_dir, "part", columns=["p_partkey", "p_size"])
        .map_batches(per_batch, batch_format="pyarrow")
    )


# =====================================================================
# Session 18 — forensic / robust-stats / spectral-graph primitives
# =====================================================================


@register(
    "benford_digits",
    """
    WITH c AS (SELECT CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS v
               FROM orders WHERE o_totalprice > 0),
    d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM c),
    t AS (SELECT count(*) AS tot FROM d)
    SELECT digit, CAST(count(*) AS BIGINT) AS n,
           CAST((1000*count(*)) // (SELECT tot FROM t) AS BIGINT)
             AS permille
    FROM d GROUP BY 1
    """,
    doc="Benford first-significant-digit audit over order totals (the "
    "classic fraud/synthetic-data forensic: natural multiplicative "
    "amounts follow log10(1+1/d), fabricated ones don't) — on this "
    "testdata the distribution visibly BREAKS Benford (uniform-ish "
    "1-4, cliff at 5+), which is exactly the signal the audit "
    "exists to surface.  Distributed shape: each batch folds to "
    "<=9 (digit, count) partial rows (digit extracted from exact "
    "integer cents via decimal string head — no float log10 "
    "boundary risk); one 9-key groupby merges partials; permille "
    "shares are computed driver-side on the 9-row final.",
)
def benford_digits(sf_dir: str):
    from ray.data.aggregate import Sum

    def fold(t: pa.Table) -> pd.DataFrame:
        cols = {"digit": "int64", "n": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        tp = t["o_totalprice"].to_numpy()
        v = cents(t["o_totalprice"]).to_numpy().astype(np.int64)[tp > 0]
        if len(v) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        first = pd.Series(v).astype(str).str[0].astype(np.int64)
        cnt = first.value_counts().sort_index()
        return pd.DataFrame({"digit": cnt.index.to_numpy().astype(np.int64),
                             "n": cnt.to_numpy().astype(np.int64)})

    per = (
        _read(sf_dir, "orders", columns=["o_totalprice"])
        .map_batches(fold, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tot = int(per["n"].sum())
    per = per.sort_values("digit").reset_index(drop=True)
    return pd.DataFrame({
        "digit": per["digit"].to_numpy().astype(np.int64),
        "n": per["n"].to_numpy().astype(np.int64),
        "permille": np.array([(1000 * int(x)) // tot for x in per["n"]],
                             dtype=np.int64),
    })


@register(
    "mad_outliers",
    """
    WITH x AS (SELECT event_type,
                      CAST(floor(value*100 + 0.5) AS BIGINT) AS v
               FROM events),
    r AS (SELECT event_type, v,
                 row_number() OVER (PARTITION BY event_type ORDER BY v)
                   AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM x),
    med AS (SELECT event_type, v AS med FROM r WHERE rn = (n-1)//2 + 1),
    a AS (SELECT x.event_type, abs(x.v - med.med) AS av
          FROM x JOIN med USING (event_type)),
    r2 AS (SELECT event_type, av,
                  row_number() OVER (PARTITION BY event_type ORDER BY av)
                    AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM a),
    mad AS (SELECT event_type, av AS mad FROM r2 WHERE rn = (n-1)//2 + 1)
    SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(med.med AS BIGINT) AS med_cents,
           CAST(mad.mad AS BIGINT) AS mad_cents,
           CAST(sum(CASE WHEN a.av > 3*mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM a JOIN med USING (event_type) JOIN mad USING (event_type)
    GROUP BY 1, med.med, mad.mad
    """,
    doc="Robust outlier census per event type: exact LOW-median and "
    "median-absolute-deviation over integer cents (median = "
    "sorted[(n-1)//2], deterministic for even n — no averaging, so "
    "the statistic is hash-exact), outlier = |x - med| > 3*MAD — "
    "the heavy-tail-safe alternative to z-scores (winsorized_stats' "
    "sibling; MAD ignores outliers that would inflate a stddev "
    "threshold).  Distributed shape: ONE event-type shuffle (5 "
    "keys); each group computes median, re-centered absolute "
    "deviations, their median, and the outlier count in a single "
    "vectorized numpy pass.  The two-level median makes this "
    "genuinely non-combinable — the per-group sort is the "
    "documented cost, bounded by the largest type's row count "
    "(salt the shuffle if one type dominates at scale).",
)
def mad_outliers(sf_dir: str):
    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"event_type": "object", "v": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        return pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "v": cents(t["value"]).to_numpy().astype(np.int64),
        })

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": "object", "n_events": "int64",
                "med_cents": "int64", "mad_cents": "int64",
                "n_outliers": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = []
        for et, gg in g.groupby("event_type", sort=False):
            v = np.sort(gg["v"].to_numpy())
            n = len(v)
            med = int(v[(n - 1) // 2])
            av = np.sort(np.abs(v - med))
            mad = int(av[(n - 1) // 2])
            out.append((et, n, med, mad, int((av > 3 * mad).sum())))
        return pd.DataFrame({
            "event_type": pd.Series([r[0] for r in out], dtype=object),
            "n_events": pd.Series([r[1] for r in out], dtype="int64"),
            "med_cents": pd.Series([r[2] for r in out], dtype="int64"),
            "mad_cents": pd.Series([r[3] for r in out], dtype="int64"),
            "n_outliers": pd.Series([r[4] for r in out], dtype="int64"),
        })

    return (
        _read(sf_dir, "events", columns=["event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(per_type, batch_format="pandas")
    )


@register(
    "katz_centrality",
    """
    WITH n AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)
      UNION ALL
      SELECT doc_id, (doc_id + 1) % (SELECT c FROM n) FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id + 3) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 5 = 0),
    eu AS (
      SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
      FROM l WHERE src <> target),
    edges AS (SELECT a AS src, b AS dst FROM eu
              UNION ALL SELECT b, a FROM eu),
    d1 AS (SELECT src AS node, CAST(count(*) AS HUGEINT) AS w
           FROM edges GROUP BY 1),
    d2 AS (SELECT e.src AS node, sum(d1.w) AS w
           FROM edges e JOIN d1 ON d1.node = e.dst GROUP BY 1),
    d3 AS (SELECT e.src AS node, sum(d2.w) AS w
           FROM edges e JOIN d2 ON d2.node = e.dst GROUP BY 1)
    SELECT CAST(d1.node AS BIGINT) AS node,
           CAST(64 + 16*d1.w + 4*d2.w + d3.w AS BIGINT) AS katz
    FROM d1 JOIN d2 ON d2.node = d1.node JOIN d3 ON d3.node = d1.node
    ORDER BY katz DESC, node LIMIT 20
    """,
    doc="Katz-style walk-count centrality over the triangle-test "
    "graph: katz(v) = sum over walk lengths 0..3 of (1/4)^len walks "
    "from v, scaled by 4^3 = 64 so every term is an EXACT integer "
    "(64 + 16*A1 + 4*A^2 1 + A^3 1) — the truncated Katz/attenuated "
    "path count, top-20 nodes with (katz desc, node) total-order "
    "tie-break.  Distributed shape: the same derived edge Dataset "
    "as kcore/triangle_count; two matvec rounds in the broadcast "
    "regime (value vector ray.put once per round, edges stream "
    "against it, per-batch bincount partials merged by a bounded "
    "node-keyed groupby — the kcore sub-cap posture; past the cap "
    "the kcore dataset-regime bucketed join applies verbatim).  "
    "The final argsort runs driver-side on the bounded value "
    "vector.",
)
def katz_centrality(sf_dir: str, k: int = 20):
    import ray

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    ekeys = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    from .stages.relational import bucketed_agg

    dist = bucketed_agg(ekeys, keys=["key"], sum_cols={"__count__": "c"})

    def both_dirs(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        a, b = key // n, key % n
        return pa.table(
            {"src": np.concatenate((a, b)), "dst": np.concatenate((b, a))}
        )

    edges = dist.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def vec_fold(partials) -> np.ndarray:
        # per-batch bincount partials (node, w) merge into the bounded
        # broadcast-regime vector DRIVER-side — the same n-sized driver
        # state the final argsort already holds; this replaces three
        # flat-overhead Ray sort-groupbys with np.add.at over tiny
        # partial frames
        v = np.zeros(n, dtype=np.int64)
        df = partials.to_pandas()
        if len(df):
            np.add.at(v, df["node"].to_numpy(dtype=np.int64),
                      df["w"].to_numpy(dtype=np.int64))
        return v

    def deg_fold(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        cnt = np.bincount(t["src"].to_numpy(), minlength=n)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame({"node": nz.astype(np.int64),
                             "w": cnt[nz].astype(np.int64)})

    w1 = vec_fold(edges.map_batches(deg_fold, batch_format="pyarrow"))

    def matvec(w: np.ndarray) -> np.ndarray:
        wref = ray.put(w)

        def fold(t: pa.Table) -> pd.DataFrame:
            if t.num_rows == 0:
                return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                     "w": pd.Series([], dtype="int64")})
            ww = ray.get(wref)
            acc = np.bincount(t["src"].to_numpy(),
                              weights=ww[t["dst"].to_numpy()].astype(np.float64),
                              minlength=n)
            # bincount weights go through float64; exact below 2^53 —
            # assert the headroom rather than assume it
            assert acc.max() < 2**53
            nz = np.nonzero(acc)[0]
            return pd.DataFrame({"node": nz.astype(np.int64),
                                 "w": acc[nz].astype(np.int64)})

        return vec_fold(edges.map_batches(fold, batch_format="pyarrow"))

    w2 = matvec(w1)
    w3 = matvec(w2)
    katz = 64 + 16 * w1 + 4 * w2 + w3
    order = np.lexsort((np.arange(n), -katz))[:k]
    return pd.DataFrame({"node": order.astype(np.int64),
                         "katz": katz[order].astype(np.int64)})


@register(
    "rfm_segments",
    """
    WITH ref AS (SELECT max(o_orderdate) AS mx FROM orders),
    c AS (SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS f,
            sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS m,
            max(o_orderdate) AS last
          FROM orders GROUP BY 1),
    n AS (SELECT count(*) AS cnt FROM c),
    r AS (SELECT ck, f, m,
            epoch_us((SELECT mx FROM ref)) - epoch_us(last) AS rec
          FROM c),
    t AS (SELECT ck,
            ((row_number() OVER (ORDER BY rec, ck) - 1) * 4)
              // (SELECT cnt FROM n) AS rt,
            ((row_number() OVER (ORDER BY f, ck) - 1) * 4)
              // (SELECT cnt FROM n) AS ft,
            ((row_number() OVER (ORDER BY m, ck) - 1) * 4)
              // (SELECT cnt FROM n) AS mt
          FROM r)
    SELECT CAST(rt*100 + ft*10 + mt AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM t GROUP BY 1
    """,
    doc="RFM customer segmentation (recency / frequency / monetary "
    "quartiles -> 4x4x4 segment histogram — the classic cohorting "
    "operator).  Quartile = exact rank arithmetic tile = "
    "(rank-1)*4 // n over a (metric, custkey) total order (NOT SQL "
    "ntile, whose uneven-remainder block sizes differ — the same "
    "closed form runs on both sides), recency measured from the "
    "global max order date so the result is deterministic.  "
    "Distributed shape: per-customer (f, m, last) via ONE combiner'd "
    "custkey bucketed_agg; then THREE add_prefix_sum two-phase "
    "rank scans over unique packed (metric << 21 | ck) int64 keys "
    "(bound asserted), each a distributed sort + counting scan "
    "adding one rank column in place — no driver materialization of "
    "the customer table; tiles and the <=64-row segment histogram "
    "fold per batch.",
)
def rfm_segments(sf_dir: str):
    from .stages.relational import add_prefix_sum

    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"ck": "int64", "f": "int64", "m": "int64", "last": "int64",
                "cb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame({
            "ck": t["o_custkey"].to_numpy().astype(np.int64),
            "m": cents(t["o_totalprice"]).to_numpy().astype(np.int64),
            "last": t["o_orderdate"].cast(pa.int64()).to_numpy(),
        })
        # per-batch combiner + coarse-bucket shuffle (bucketed_agg
        # posture; Ray's sort groupby costs flat seconds)
        out = df.groupby("ck", as_index=False, sort=False).agg(
            f=("m", "size"), m=("m", "sum"), last=("last", "max"))
        out["f"] = out["f"].astype(np.int64)
        out["cb"] = (out["ck"].to_numpy() % 32).astype("int32")
        return out[["ck", "f", "m", "last", "cb"]]

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"ck": "int64", "f": "int64", "m": "int64", "last": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = g.groupby("ck", as_index=False, sort=False).agg(
            f=("f", "sum"), m=("m", "sum"), last=("last", "max"))
        out["f"] = out["f"].astype(np.int64)
        return out

    per_cust = (
        _read(sf_dir, "orders",
              columns=["o_custkey", "o_totalprice", "o_orderdate"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(bucket_merge, batch_format="pandas")
        .materialize()
    )
    n_cust = per_cust.count()
    ref_us = int(per_cust.max("last"))

    def keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in ("ck", "rkey", "fkey", "mkey", "one")})
        ck = pc.cast(t["ck"], pa.int64()).to_numpy()
        f = pc.cast(t["f"], pa.int64()).to_numpy()
        m = pc.cast(t["m"], pa.int64()).to_numpy()
        rec_us = ref_us - np.asarray(t["last"].to_numpy(), dtype=np.int64)
        # order dates are day-granular, so ranking by whole DAYS equals
        # the oracle's microsecond order while fitting the packed key;
        # both the granularity and the headroom are asserted, not assumed
        assert (rec_us % 86_400_000_000 == 0).all()
        rec = rec_us // 86_400_000_000
        assert ck.max(initial=0) < (1 << 21)
        for v in (rec, f, m):
            assert v.max(initial=0) < (1 << 41)
        return pa.table({
            "ck": pa.array(ck),
            "rkey": pa.array((rec << 21) | ck),
            "fkey": pa.array((f << 21) | ck),
            "mkey": pa.array((m << 21) | ck),
            "one": pa.array(np.ones(len(ck), dtype=np.int64)),
        })

    ds = per_cust.map_batches(keys, batch_format="pyarrow")
    ds = add_prefix_sum(ds, col="one", out_col="r_rank", order_col="rkey")
    ds = add_prefix_sum(ds, col="one", out_col="f_rank", order_col="fkey")
    ds = add_prefix_sum(ds, col="one", out_col="m_rank", order_col="mkey")

    def fold(t: pa.Table) -> pd.DataFrame:
        cols = {"segment": "int64", "n_customers": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        rt = t["r_rank"].to_numpy() * 4 // n_cust
        ft = t["f_rank"].to_numpy() * 4 // n_cust
        mt = t["m_rank"].to_numpy() * 4 // n_cust
        seg = rt * 100 + ft * 10 + mt
        cnt = pd.Series(seg).value_counts().sort_index()
        return pd.DataFrame({"segment": cnt.index.to_numpy().astype(np.int64),
                             "n_customers": cnt.to_numpy().astype(np.int64)})

    # <=64 segments x blocks partial rows — fold driver-side
    out = (
        ds.map_batches(fold, batch_format="pyarrow")
        .to_pandas()
        .groupby("segment", as_index=False)["n_customers"].sum()
    )
    out["segment"] = out["segment"].astype(np.int64)
    out["n_customers"] = out["n_customers"].astype(np.int64)
    return out


@register(
    "user_first_seen_curve",
    """
    WITH fs AS (SELECT user_id, min(ts) AS first_ts FROM events
                GROUP BY 1),
    d AS (SELECT epoch_us(first_ts) // 3600000000 AS hour,
                 count(*) AS novel
          FROM fs GROUP BY 1)
    SELECT CAST(hour AS BIGINT) AS hour, CAST(novel AS BIGINT) AS n_new,
           CAST(sum(novel) OVER (ORDER BY hour
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_users
    FROM d
    """,
    doc="First-touch user-growth curve: each user attributed to the "
    "hour of their FIRST event (min ts per user), hourly new-user "
    "counts plus the cumulative audience size — the acquisition "
    "curve behind growth_accounting.  Distributed shape: ONE "
    "combiner'd user groupby (Min aggregate) — the only shuffle; "
    "hourly novel counts fold per batch into a bounded (<= hours "
    "in the data span) frame and the cumulative sum runs driver-"
    "side over that bounded curve, documented as the time-span "
    "bound (an unbounded-span variant would reuse the "
    "add_prefix_sum scan).",
)
def user_first_seen_curve(sf_dir: str):
    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"user_id": "int64", "tus": "int64", "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy().astype(np.int64),
                           "tus": t["ts"].cast(pa.int64()).to_numpy()})
        # per-batch combiner, then ONE coarse-bucket shuffle (Ray's
        # sort-based groupby().aggregate() costs seconds of flat
        # overhead at any size — the repo-wide bucketed_agg posture)
        df = df.groupby("user_id", as_index=False, sort=False)["tus"].min()
        df["ub"] = (df["user_id"].to_numpy() % 32).astype("int32")
        return df

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "first_tus": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out = g.groupby("user_id", as_index=False, sort=False)["tus"].min()
        return out.rename(columns={"tus": "first_tus"})

    first = (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(bucket_min, batch_format="pandas")
    )

    def fold(t: pa.Table) -> pd.DataFrame:
        cols = {"hour": "int64", "n_new": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        hr = np.asarray(t["first_tus"].to_numpy(), dtype=np.int64) // 3_600_000_000
        cnt = pd.Series(hr).value_counts().sort_index()
        return pd.DataFrame({"hour": cnt.index.to_numpy().astype(np.int64),
                             "n_new": cnt.to_numpy().astype(np.int64)})

    # hourly partials are bounded by the data time span — fold the
    # (<= span-hours x blocks) partial rows driver-side
    per_hour = (
        first.map_batches(fold, batch_format="pyarrow")
        .to_pandas()
        .groupby("hour", as_index=False)["n_new"].sum()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    return pd.DataFrame({
        "hour": per_hour["hour"].to_numpy().astype(np.int64),
        "n_new": per_hour["n_new"].to_numpy().astype(np.int64),
        "cum_users": per_hour["n_new"].to_numpy().astype(np.int64).cumsum(),
    })


@register(
    "salted_hot_key_agg",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY event_type
    """,
    doc="Two-phase SALTED aggregation for pathologically hot keys — "
    "the explicit form of the north rule's 'salt hot keys': the "
    "events table has only ~5 event types over the whole stream, so "
    "a naive groupby sends every row of a hot key to ONE reducer.  "
    "Phase 1 groups by (key, salt) with salt = event_id % 16, "
    "spreading each hot key over 16 reducers (after the per-batch "
    "combiner has already collapsed batch-local duplicates); phase "
    "2 merges the <= keys x 16 salted partials — a shuffle whose "
    "width no longer depends on the key skew.  The oracle is the "
    "PLAIN groupby: salting must be observationally invisible.  "
    "The crawl frontier applies the same trick per hot HOST "
    "(state/frontier.py hot_threshold salting); this entry pins the "
    "algebra-level invariant.",
)
def salted_hot_key_agg(sf_dir: str, n_salt: int = 16):
    from ray.data.aggregate import Sum

    def combine(t: pa.Table) -> pd.DataFrame:
        cols = {"event_type": "object", "salt": "int64", "n": "int64",
                "sum_cents": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame({
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "salt": t["event_id"].to_numpy().astype(np.int64) % n_salt,
            "sum_cents": cents(t["value"]).to_numpy().astype(np.int64),
        })
        out = df.groupby(["event_type", "salt"], as_index=False,
                         sort=False).agg(n=("sum_cents", "size"),
                                         sum_cents=("sum_cents", "sum"))
        out["n"] = out["n"].astype(np.int64)
        return out[["event_type", "salt", "n", "sum_cents"]]

    salted = (
        _read(sf_dir, "events", columns=["event_type", "event_id", "value"])
        .map_batches(combine, batch_format="pyarrow")
        .groupby(["event_type", "salt"])
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_cents", alias_name="sum_cents"))
    )
    return (
        salted.groupby("event_type")
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_cents", alias_name="sum_cents"))
    )


@register(
    "important_stock",
    """
    WITH ns AS (SELECT count(*) AS c FROM supplier),
    rs AS (
      SELECT s.s_suppkey FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'),
    ps AS (
      SELECT p.p_partkey AS pk,
             (p.p_partkey*13 + j*29) % (SELECT c FROM ns) AS sk
      FROM part p, unnest(generate_series(0, 3)) AS t(j)),
    v AS (
      SELECT ps.pk,
             sum((100 + (ps.pk*37 + ps.sk*61) % 99901)
                 * ((ps.pk*7 + ps.sk*11) % 1000)) AS val
      FROM ps JOIN rs ON rs.s_suppkey = ps.sk
      GROUP BY 1),
    tot AS (SELECT sum(val) AS t FROM v)
    SELECT CAST(pk AS BIGINT) AS p_partkey, CAST(val AS BIGINT) AS value_c
    FROM v WHERE val * 1000 > (SELECT t FROM tot)
    """,
    doc="TPC-H Q11-shape important stock: parts whose EUROPE-held "
    "inventory value (derived-partsupp cost x availqty summed over "
    "the part's in-region suppliers) exceeds 1/1000 of the total — "
    "the correlated scalar-subquery HAVING of Q11.  With this entry "
    "the registry covers ALL 22 TPC-H query shapes.  Distributed "
    "shape: region supplier membership broadcast as a boolean "
    "array; each part batch computes its own bridge rows' masked "
    "value sum batch-locally (zero shuffle — same locality as "
    "min_cost_supplier); the global threshold is ONE scalar "
    "aggregate over the per-part values Dataset (materialized once, "
    "reused for the filter pass), and the filter streams.",
)
def important_stock(sf_dir: str, region: str = "EUROPE", frac_den: int = 1000):
    import ray

    NS = _supplier_count(sf_dir)
    sup = pq.read_table(_pq(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(_pq(sf_dir, "nation"),
                        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = pq.read_table(_pq(sf_dir, "region"),
                        columns=["r_regionkey", "r_name"]).to_pandas()
    rks = set(reg.loc[reg["r_name"] == region, "r_regionkey"].tolist())
    nks = set(nat.loc[nat["n_regionkey"].isin(rks), "n_nationkey"].tolist())
    mask = np.zeros(NS, dtype=bool)
    mask[sup.loc[sup["s_nationkey"].isin(nks), "s_suppkey"].to_numpy()] = True
    mref = ray.put(mask)

    def per_batch(t: pa.Table) -> pd.DataFrame:
        cols = {"p_partkey": "int64", "value_c": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        m = ray.get(mref)
        pk = t["p_partkey"].to_numpy().astype(np.int64)
        j = np.arange(4, dtype=np.int64)[None, :]
        sk = (pk[:, None] * 13 + j * 29) % NS
        cost = 100 + (pk[:, None] * 37 + sk * 61) % 99901
        avail = (pk[:, None] * 7 + sk * 11) % 1000
        val = np.where(m[sk], cost * avail, 0).sum(axis=1)
        keep = val > 0
        return pd.DataFrame({"p_partkey": pk[keep],
                             "value_c": val[keep].astype(np.int64)})

    vals = (
        _read(sf_dir, "part", columns=["p_partkey"])
        .map_batches(per_batch, batch_format="pyarrow")
        .materialize()
    )
    total = int(vals.sum("value_c"))

    def flt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.filter(pc.greater(
            pc.multiply(t["value_c"], pa.scalar(frac_den, type=pa.int64())),
            pa.scalar(total, type=pa.int64())))

    return vals.map_batches(flt, batch_format="pyarrow")


@register(
    "hourly_active_users",
    """
    WITH hu AS (SELECT DISTINCT epoch_us(ts) // 3600000000 AS hour,
                                user_id
                FROM events),
    r AS (SELECT a.hour,
                 CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS ret
          FROM hu a LEFT JOIN hu b
            ON b.user_id = a.user_id AND b.hour = a.hour - 1)
    SELECT CAST(hour AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(ret) AS BIGINT) AS n_returning
    FROM r GROUP BY 1
    """,
    doc="Hourly active users with hour-over-hour retention: distinct "
    "users per hour plus how many of them were also active the "
    "PREVIOUS hour — the HAU/DAU + returning-user split every "
    "engagement dashboard starts from.  Distributed shape: per-batch "
    "(hour, user) dedup combiner, then ONE user-bucket shuffle so "
    "each user's full hour set is co-resident; per bucket a single "
    "vectorized pass over (user, hour)-sorted uniques marks "
    "returning hours via the adjacent-diff == 1 trick (no isin "
    "probes), folds to (hour, n_active, n_returning) partials; the "
    "final merge is driver-side over the time-span-bounded hour "
    "grid (documented bound — an unbounded-span variant would "
    "finish with a bounded groupby instead).",
)
def hourly_active_users(sf_dir: str):
    HOUR_US = 3_600_000_000

    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"u": "int64", "h": "int64", "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        df = pd.DataFrame({
            "u": t["user_id"].to_numpy().astype(np.int64),
            "h": t["ts"].cast(pa.int64()).to_numpy() // HOUR_US,
        }).drop_duplicates()
        df["ub"] = (df["u"].to_numpy() % 32).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"hour": "int64", "n_active": "int64", "n_returning": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g[["u", "h"]].drop_duplicates().sort_values(["u", "h"],
                                                        kind="stable")
        u = g["u"].to_numpy()
        h = g["h"].to_numpy()
        ret = np.zeros(len(g), dtype=np.int64)
        if len(g) > 1:
            ret[1:] = ((u[1:] == u[:-1]) & (h[1:] - h[:-1] == 1)).astype(np.int64)
        df = pd.DataFrame({"hour": h, "ret": ret})
        out = df.groupby("hour", as_index=False).agg(
            n_active=("ret", "size"), n_returning=("ret", "sum"))
        out["n_active"] = out["n_active"].astype(np.int64)
        out["n_returning"] = out["n_returning"].astype(np.int64)
        return out

    parts = (
        _read(sf_dir, "events", columns=["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame({"hour": pd.Series([], dtype="int64"),
                             "n_active": pd.Series([], dtype="int64"),
                             "n_returning": pd.Series([], dtype="int64")})
    out = parts.groupby("hour", as_index=False)[["n_active", "n_returning"]].sum()
    return out.astype({"hour": np.int64, "n_active": np.int64,
                       "n_returning": np.int64})


@register(
    "sorted_neighborhood_neardup",
    """
    WITH k AS (SELECT doc_id, substr(text, 1, 16) AS pfx, n_chars
               FROM documents),
    r AS (SELECT doc_id, pfx, n_chars,
                 row_number() OVER (PARTITION BY pfx ORDER BY doc_id)
                   AS rk
          FROM k)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM r a JOIN r b
      ON b.pfx = a.pfx AND b.rk - a.rk BETWEEN 1 AND 4
    WHERE abs(a.n_chars - b.n_chars)*10 <= least(a.n_chars, b.n_chars)
    """,
    doc="Sorted-neighborhood near-duplicate candidates (Hernandez & "
    "Stolfo's SNM — the classic record-linkage alternative to LSH "
    "blocking): records sorted by a 16-char prefix key, candidate "
    "pairs limited to a sliding window of 5 in sort order, verified "
    "by a cheap length-ratio predicate (within 10%).  Because equal "
    "prefixes are CONTIGUOUS under (prefix, doc_id) order, "
    "global-window equal-prefix pairs equal per-prefix-run windows — "
    "which makes the operator shuffle-local: ONE prefix-hash bucket "
    "shuffle co-locates each run, an in-bucket sort + four "
    "vectorized shifted compares emit the window pairs, and no "
    "cross-bucket boundary replication is needed (the documented "
    "contrast with a raw rank-window SNM, which would replicate w-1 "
    "boundary rows per block).  Complements the LSH / simhash / "
    "ngram / embedding dedup family with the sort-based classic.",
)
def sorted_neighborhood_neardup(sf_dir: str, window: int = 5):
    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"doc_id": "int64", "pfx": "object", "n_chars": "int64",
                "pb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        txt = t["text"].to_pandas()
        pfx = txt.str.slice(0, 16)
        h = pd.util.hash_pandas_object(pfx, index=False).to_numpy()
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy().astype(np.int64),
            "pfx": pfx.to_numpy(dtype=object),
            "n_chars": t["n_chars"].to_numpy().astype(np.int64),
            "pb": (h % 32).astype("int32"),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_a": "int64", "doc_b": "int64"}
        empty = pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        if g.shape[1] == 0 or len(g) == 0:
            return empty
        g = g.sort_values(["pfx", "doc_id"], kind="stable").reset_index(drop=True)
        pfx = g["pfx"].to_numpy(dtype=object)
        did = g["doc_id"].to_numpy()
        ln = g["n_chars"].to_numpy()
        out_a, out_b = [], []
        for d in range(1, window):
            if d >= len(g):
                break
            same = pfx[:-d] == pfx[d:]
            la, lb = ln[:-d], ln[d:]
            okl = np.abs(la - lb) * 10 <= np.minimum(la, lb)
            m = same & okl
            out_a.append(did[:-d][m])
            out_b.append(did[d:][m])
        if not out_a:
            return empty
        return pd.DataFrame({"doc_a": np.concatenate(out_a).astype(np.int64),
                             "doc_b": np.concatenate(out_b).astype(np.int64)})

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(per_bucket, batch_format="pandas")
    )


@register(
    "graph_transitivity",
    """
    WITH n AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)
      UNION ALL
      SELECT doc_id, (doc_id + 1) % (SELECT c FROM n) FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id + 3) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 5 = 0),
    e AS (SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
          FROM l WHERE src <> target),
    deg AS (SELECT v, count(*) AS d FROM
              (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
    w AS (SELECT sum(d*(d-1)//2) AS wedges FROM deg),
    tri AS (SELECT count(*) AS t
            FROM e e1 JOIN e e2 ON e2.a = e1.b
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT CAST((SELECT wedges FROM w) AS BIGINT) AS wedges,
           CAST((SELECT t FROM tri) AS BIGINT) AS triangles,
           CAST((1024 * 3 * (SELECT t FROM tri))
                // (SELECT wedges FROM w) AS BIGINT) AS transitivity_q
    """,
    doc="Global graph transitivity (Newman's global clustering "
    "coefficient: 3 x triangles / wedges, x1024 quantized) over the "
    "triangle-test graph — the one-number density-of-closure summary "
    "next to the per-node clustering_coefficient histogram.  "
    "Distributed shape: wedges = sum d(d-1)/2 from the node-degree "
    "bucketed_agg (per-batch integer partials, driver scalar fold); "
    "the triangle total REUSES the registered triangle_count "
    "pipeline's per-node histogram (sum t*n = 3T — each triangle is "
    "counted once per corner), so the expensive closure join is "
    "computed once and shared between the two registered views of "
    "the same statistic.",
)
def graph_transitivity(sf_dir: str):
    from .stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    ekeys = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    dist = bucketed_agg(ekeys, keys=["key"], sum_cols={"__count__": "c"})

    def endpoints(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        return pa.table({"node": np.concatenate((key // n, key % n))})

    degs = bucketed_agg(
        dist.map_batches(endpoints, batch_format="pyarrow"),
        keys=["node"], sum_cols={"__count__": "d"},
    )

    def wedge_fold(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame({"w": pd.Series([], dtype="int64")})
        d = t["d"].to_numpy().astype(np.int64)
        return pd.DataFrame({"w": [int((d * (d - 1) // 2).sum())]})

    wparts = degs.map_batches(wedge_fold, batch_format="pyarrow").to_pandas()
    wedges = int(wparts["w"].sum())

    hist = triangle_count(sf_dir)
    if hasattr(hist, "to_pandas"):
        hist = hist.to_pandas()
    incidences = int((hist["triangles"].to_numpy().astype(np.int64)
                      * hist["n_nodes"].to_numpy().astype(np.int64)).sum())
    assert incidences % 3 == 0
    tri = incidences // 3
    return pd.DataFrame({"wedges": [np.int64(wedges)],
                         "triangles": [np.int64(tri)],
                         "transitivity_q": [np.int64((1024 * 3 * tri) // wedges)]})


@register(
    "ab_test_chi2",
    """
    WITH conv AS (
      SELECT user_id, user_id % 2 AS grp,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS c
      FROM events GROUP BY 1),
    ct AS (SELECT
            sum(CASE WHEN grp=0 AND c=1 THEN 1 ELSE 0 END) AS a,
            sum(CASE WHEN grp=0 AND c=0 THEN 1 ELSE 0 END) AS b,
            sum(CASE WHEN grp=1 AND c=1 THEN 1 ELSE 0 END) AS c2,
            sum(CASE WHEN grp=1 AND c=0 THEN 1 ELSE 0 END) AS d
           FROM conv)
    SELECT CAST(a AS BIGINT) AS conv_ctrl, CAST(b AS BIGINT) AS nonconv_ctrl,
           CAST(c2 AS BIGINT) AS conv_test, CAST(d AS BIGINT) AS nonconv_test,
           CAST((1000000 * (a+b+c2+d) * (a*d - b*c2) * (a*d - b*c2))
                // (CAST((a+b) AS HUGEINT)*(c2+d)*(a+c2)*(b+d))
                AS BIGINT) AS chi2_ppm
    FROM ct
    """,
    doc="A/B experiment contingency + exact-integer Pearson chi-square "
    "(x1e6): users split by id parity, 'converted' = >= 14 purchase "
    "events (the per-user median on this data, non-degenerate at "
    "every sf); chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) computed "
    "in exact Python ints (the numerator exceeds int64; HUGEINT in "
    "the oracle) — the experiment-analysis primitive with no float "
    "in the pipeline, so the statistic is hash-stable.  Distributed "
    "shape: per-batch (user, purchase-count) combiner, ONE "
    "user-bucket shuffle completing per-user counts, per-bucket "
    "fold to 2x2 contingency partials, 4-integer driver fold + one "
    "quotient.",
)
def ab_test_chi2(sf_dir: str, thresh: int = 14):
    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"u": "int64", "p": "int64", "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        u = t["user_id"].to_numpy().astype(np.int64)
        isp = (t["event_type"].to_numpy(zero_copy_only=False)
               == "purchase").astype(np.int64)
        df = pd.DataFrame({"u": u, "p": isp}).groupby(
            "u", as_index=False, sort=False)["p"].sum()
        df["ub"] = (df["u"].to_numpy() % 32).astype("int32")
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64", "c": "int64", "d": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        per = g.groupby("u", as_index=False, sort=False)["p"].sum()
        grp = per["u"].to_numpy() % 2
        conv = (per["p"].to_numpy() >= thresh)
        return pd.DataFrame({
            "a": [int(((grp == 0) & conv).sum())],
            "b": [int(((grp == 0) & ~conv).sum())],
            "c": [int(((grp == 1) & conv).sum())],
            "d": [int(((grp == 1) & ~conv).sum())],
        })

    parts = (
        _read(sf_dir, "events", columns=["user_id", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    a = int(parts["a"].sum())
    b = int(parts["b"].sum())
    c = int(parts["c"].sum())
    d = int(parts["d"].sum())
    den = (a + b) * (c + d) * (a + c) * (b + d)
    num = 1_000_000 * (a + b + c + d) * (a * d - b * c) ** 2
    chi2 = num // den if den else 0
    return pd.DataFrame({"conv_ctrl": [np.int64(a)],
                         "nonconv_ctrl": [np.int64(b)],
                         "conv_test": [np.int64(c)],
                         "nonconv_test": [np.int64(d)],
                         "chi2_ppm": [np.int64(chi2)]})


@register(
    "sssp_distances",
    """
    WITH RECURSIVE n AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)
      UNION ALL
      SELECT doc_id, (doc_id + 1) % (SELECT c FROM n) FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id + 3) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 5 = 0),
    eu AS (SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
           FROM l WHERE src <> target),
    edges2 AS (
      SELECT a AS src, b AS dst, 1 + (a + b) % 7 AS w FROM eu
      UNION ALL SELECT b, a, 1 + (a + b) % 7 FROM eu
      UNION ALL SELECT doc_id, doc_id, 0 FROM documents),
    d AS (
      SELECT 0 AS it, CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
      UNION ALL
      SELECT it + 1 AS it, node, dist FROM (
        SELECT d.it AS it, e.dst AS node, min(d.dist + e.w) AS dist
        FROM d JOIN edges2 e ON e.src = d.node
        WHERE d.it < 16
        GROUP BY 1, 2))
    SELECT CAST(dist AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_nodes
    FROM d WHERE it = 16 GROUP BY 1
    """,
    doc="Weighted single-source shortest paths (Bellman-Ford rounds of "
    "min-plus relaxation from node 0 over the triangle-test graph "
    "with integer edge weights 1 + (a+b)%7), reported as the "
    "distance histogram.  The oracle unrolls 16 iterations in a "
    "recursive CTE — the single-reference restriction on recursive "
    "terms is sidestepped by adding weight-0 SELF-LOOPS to the edge "
    "relation, which makes carry-forward a special case of "
    "relaxation (measured convergence: 8 rounds at 500 nodes, 10 at "
    "5000; stationary past the fixpoint).  Distributed shape: the "
    "kcore/katz broadcast posture — the distance vector is ray.put "
    "per round, edge batches emit per-batch min-relaxation partials "
    "via np.minimum.at, the driver folds mins into the bounded "
    "vector, and convergence is DETECTED (round cap raises rather "
    "than returning a non-fixpoint); past the node cap the kcore "
    "dataset-regime bucketed join applies verbatim.",
)
def sssp_distances(sf_dir: str, source: int = 0, max_rounds: int = 64):
    import ray

    from .stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    ekeys = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    dist_keys = bucketed_agg(ekeys, keys=["key"], sum_cols={"__count__": "c"})

    def both_dirs_w(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        a, b = key // n, key % n
        w = 1 + (a + b) % 7
        return pa.table({"src": np.concatenate((a, b)),
                         "dst": np.concatenate((b, a)),
                         "w": np.concatenate((w, w))})

    edges = dist_keys.map_batches(both_dirs_w, batch_format="pyarrow").materialize()

    INF = np.int64(1) << 40
    dist = np.full(n, INF, dtype=np.int64)
    dist[source] = 0
    for _ in range(max_rounds):
        dref = ray.put(dist)

        def relax(t: pa.Table) -> pd.DataFrame:
            if t.num_rows == 0:
                return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                     "d": pd.Series([], dtype="int64")})
            dd = ray.get(dref)
            src = t["src"].to_numpy()
            cand = dd[src] + t["w"].to_numpy()
            vec = np.full(n, INF, dtype=np.int64)
            np.minimum.at(vec, t["dst"].to_numpy(), cand)
            nz = np.nonzero(vec < INF)[0]
            return pd.DataFrame({"node": nz.astype(np.int64),
                                 "d": vec[nz]})

        parts = edges.map_batches(relax, batch_format="pyarrow").to_pandas()
        new = dist.copy()
        if len(parts):
            np.minimum.at(new, parts["node"].to_numpy(dtype=np.int64),
                          parts["d"].to_numpy(dtype=np.int64))
        if np.array_equal(new, dist):
            break
        dist = new
    else:
        raise RuntimeError("sssp: relaxation fixpoint not reached")
    reach = dist[dist < INF]
    vals, cnts = np.unique(reach, return_counts=True)
    return pd.DataFrame({"dist": vals.astype(np.int64),
                         "n_nodes": cnts.astype(np.int64)})


@register(
    "graph_modularity",
    """
    WITH n AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)
      UNION ALL
      SELECT doc_id, (doc_id + 1) % (SELECT c FROM n) FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id + 3) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 5 = 0),
    e AS (SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
          FROM l WHERE src <> target),
    m AS (SELECT count(*) AS m FROM e),
    ein AS (SELECT sum(CASE WHEN a*8//(SELECT c FROM n)
                             = b*8//(SELECT c FROM n)
                       THEN 1 ELSE 0 END) AS s FROM e),
    deg AS (SELECT v*8//(SELECT c FROM n) AS comm, count(*) AS d FROM
              (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
    dc AS (SELECT sum(d*d) AS s2 FROM deg)
    SELECT CAST((SELECT m FROM m) AS BIGINT) AS n_edges,
           CAST((SELECT s FROM ein) AS BIGINT) AS intra_edges,
           CAST((1024 * (4*(SELECT m FROM m)*(SELECT s FROM ein)
                         - (SELECT s2 FROM dc)))
                // (4*(SELECT m FROM m)*(SELECT m FROM m)) AS BIGINT)
             AS modularity_q
    """,
    doc="Newman modularity Q of a fixed 8-block contiguous partition "
    "of the triangle-test graph (ring + skip edges make contiguous "
    "blocks genuine communities: Q ~ +0.22 here vs the -1/16 "
    "baseline of a hash partition — measured before registering; a "
    "node%%16 partition has ZERO intra edges on this graph and was "
    "rejected as degenerate).  Exact integer identity Q * 4m^2 = "
    "4m*intra - sum_c deg_c^2, quantized x1024 — the community-"
    "quality evaluation primitive behind Louvain-family methods.  "
    "Distributed shape: ONE distinct-edge bucketed_agg; per-batch "
    "partials for (edge count, intra count, per-community degree "
    "sums — 8 communities, fixed width); driver folds three "
    "integers + an 8-vector and computes the quotient in exact "
    "Python ints.",
)
def graph_modularity(sf_dir: str, n_comm: int = 8):
    from .stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    ekeys = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    dist = bucketed_agg(ekeys, keys=["key"], sum_cols={"__count__": "c"})

    def fold(t: pa.Table) -> pd.DataFrame:
        cols = {"m": "int64", "intra": "int64",
                **{f"d{i}": "int64" for i in range(n_comm)}}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        key = t["key"].to_numpy()
        a, b = key // n, key % n
        ca = a * n_comm // n
        cb = b * n_comm // n
        degs = np.bincount(np.concatenate((ca, cb)), minlength=n_comm)
        row = {"m": [len(key)], "intra": [int((ca == cb).sum())]}
        for i in range(n_comm):
            row[f"d{i}"] = [int(degs[i])]
        return pd.DataFrame(row)

    parts = dist.map_batches(fold, batch_format="pyarrow").to_pandas()
    m = int(parts["m"].sum())
    intra = int(parts["intra"].sum())
    s2 = sum(int(parts[f"d{i}"].sum()) ** 2 for i in range(n_comm))
    q = (1024 * (4 * m * intra - s2)) // (4 * m * m)
    return pd.DataFrame({"n_edges": [np.int64(m)],
                         "intra_edges": [np.int64(intra)],
                         "modularity_q": [np.int64(q)]})


@register(
    "minimum_spanning_tree",
    None,  # Kruskal/Boruvka need union-find component merging — not
           # SQL-expressible (the recursive-CTE tricks used for kcore/
           # sssp carry per-NODE state; MST state is per-COMPONENT and
           # merges non-monotonically).  The driver records rows-only;
           # correctness is pinned by an exact sequential-Kruskal
           # union-find replay test (unique edge weights make the MST
           # unique, so total weight + edge count are deterministic).
    doc="Minimum spanning tree via distributed BORUVKA rounds over the "
    "triangle-test graph with UNIQUE integer edge weights (w = "
    "((a*131 + b*17) %% 100003) * 2^33 + a*n + b — uniqueness makes "
    "the MST unique and the statistic hash-stable): each round every "
    "component picks its minimum outgoing edge (a per-batch masked "
    "min partial per component over the streamed edge Dataset — the "
    "kcore broadcast posture with the component-label vector "
    "ray.put per round), the driver folds component minima, unions "
    "the picked edges into the forest, and contracts components via "
    "pointer jumping over the (bounded) label vector; O(log n) "
    "rounds, convergence DETECTED when no outgoing edges remain.  "
    "Returns one row: MST edge count, total weight, and rounds "
    "taken (n-1 edges on this connected graph).",
)
def minimum_spanning_tree(sf_dir: str, max_rounds: int = 64):
    import ray

    from .stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    ekeys = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    dist = bucketed_agg(ekeys, keys=["key"], sum_cols={"__count__": "c"})

    def weighted(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        a, b = key // n, key % n
        w = ((a * 131 + b * 17) % 100003).astype(np.int64) * (1 << 33) + key
        return pa.table({"a": a, "b": b, "w": w})

    edges = dist.map_batches(weighted, batch_format="pyarrow").materialize()

    labels = np.arange(n, dtype=np.int64)
    mst_keys: set[int] = set()
    total_w = 0
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        lref = ray.put(labels)

        def comp_min(t: pa.Table) -> pd.DataFrame:
            cols = {"comp": "int64", "w": "int64", "a": "int64", "b": "int64"}
            if t.num_rows == 0:
                return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
            lab = ray.get(lref)
            a = t["a"].to_numpy()
            b = t["b"].to_numpy()
            w = t["w"].to_numpy()
            ca, cb = lab[a], lab[b]
            m = ca != cb
            if not m.any():
                return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
            comp = np.concatenate((ca[m], cb[m]))
            ww = np.concatenate((w[m], w[m]))
            aa = np.concatenate((a[m], a[m]))
            bb = np.concatenate((b[m], b[m]))
            df = pd.DataFrame({"comp": comp, "w": ww, "a": aa, "b": bb})
            idx = df.groupby("comp", sort=False)["w"].idxmin()
            return df.loc[idx].reset_index(drop=True)

        parts = edges.map_batches(comp_min, batch_format="pyarrow").to_pandas()
        if len(parts) == 0:
            rounds -= 1
            break
        # driver fold: min edge per component, then union picked edges
        idx = parts.groupby("comp", sort=False)["w"].idxmin()
        picked = parts.loc[idx]
        for a_, b_, w_ in picked[["a", "b", "w"]].itertuples(index=False):
            key = int(a_) * n + int(b_)
            if key not in mst_keys:
                mst_keys.add(key)
                total_w += int(w_)
        # contract: point each component at the root of its picked edge's
        # other side, then pointer-jump the (bounded) label vector
        nxt = np.arange(n, dtype=np.int64)
        for a_, b_ in picked[["a", "b"]].itertuples(index=False):
            ca_, cb_ = labels[int(a_)], labels[int(b_)]
            lo, hi = (ca_, cb_) if ca_ < cb_ else (cb_, ca_)
            nxt[hi] = min(nxt[hi], lo)
        # resolve pick chains (a->b picked and b->c picked) by jumping
        for _ in range(40):
            nn2 = nxt[nxt]
            if np.array_equal(nn2, nxt):
                break
            nxt = nn2
        labels = nxt[labels]
    else:
        raise RuntimeError("boruvka: did not converge in max_rounds")
    return pd.DataFrame({
        "n_mst_edges": [np.int64(len(mst_keys))],
        "total_weight": [np.int64(total_w)],
        "rounds": [np.int64(rounds)],
    })


@register(
    "vocab_growth_curve",
    """
    WITH nd AS (SELECT count(*) AS c FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
    tokn AS (SELECT doc_id*16//(SELECT c FROM nd) AS ck,
                    count(*) AS toks
             FROM toks GROUP BY 1),
    fo AS (SELECT term, min(doc_id) AS fd FROM toks GROUP BY 1),
    newt AS (SELECT fd*16//(SELECT c FROM nd) AS ck, count(*) AS novel
             FROM fo GROUP BY 1),
    grid AS (SELECT g.ck FROM unnest(generate_series(0, 15)) AS g(ck))
    SELECT CAST(g.ck AS BIGINT) AS checkpoint,
           CAST(coalesce((SELECT sum(t.toks) FROM tokn t
                          WHERE t.ck <= g.ck), 0) AS BIGINT) AS cum_tokens,
           CAST(coalesce((SELECT sum(nw.novel) FROM newt nw
                          WHERE nw.ck <= g.ck), 0) AS BIGINT) AS cum_vocab
    FROM grid g
    """,
    doc="Vocabulary growth curve (Heaps'-law diagnostic): cumulative "
    "token count vs cumulative DISTINCT vocabulary at 16 corpus "
    "checkpoints in doc_id order.  Natural corpora grow V ~ N^0.5; "
    "this synthetic corpus SATURATES at the first checkpoint (Heaps "
    "slope 0, measured before registering) — precisely the "
    "templated/synthetic-data signal a dataset datasheet flags, and "
    "the 16-row curve certifies the whole saturation shape rather "
    "than one vacuous slope.  Distributed shape: token counts per "
    "checkpoint are per-batch partials (a 16-wide fold); vocabulary "
    "first-occurrence is a per-term MIN doc_id — per-batch combiner "
    "then ONE term-hash bucket shuffle (the high-cardinality min "
    "posture from user_first_seen_curve); novel-per-checkpoint "
    "partials fold driver-side over the fixed 16-point grid.",
)
def vocab_growth_curve(sf_dir: str, n_ck: int = 16):
    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows

    def tok_counts(t: pa.Table) -> pd.DataFrame:
        cols = {"ck": "int64", "toks": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        did = t["doc_id"].to_numpy().astype(np.int64)
        txt = t["text"].to_pandas()
        ntok = txt.str.count(" ").to_numpy().astype(np.int64) + 1
        df = pd.DataFrame({"ck": did * n_ck // n, "toks": ntok})
        return df.groupby("ck", as_index=False)["toks"].sum()

    def term_first(t: pa.Table) -> pd.DataFrame:
        cols = {"term": "object", "fd": "int64", "tb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        did = t["doc_id"].to_numpy().astype(np.int64)
        txt = t["text"].to_pandas()
        terms = txt.str.split(" ")
        lens = terms.str.len().to_numpy().astype(np.int64)
        flat = pd.DataFrame({
            "term": np.concatenate(terms.to_numpy()),
            "fd": np.repeat(did, lens),
        }).groupby("term", as_index=False)["fd"].min()
        h = pd.util.hash_pandas_object(flat["term"], index=False).to_numpy()
        flat["tb"] = (h % 32).astype("int32")
        return flat

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"ck": "int64", "novel": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        fo = g.groupby("term", as_index=False, sort=False)["fd"].min()
        ck = fo["fd"].to_numpy().astype(np.int64) * n_ck // n
        cnt = pd.Series(ck).value_counts().sort_index()
        return pd.DataFrame({"ck": cnt.index.to_numpy().astype(np.int64),
                             "novel": cnt.to_numpy().astype(np.int64)})

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tokp = docs.map_batches(tok_counts, batch_format="pyarrow").to_pandas()
    novp = (
        docs.map_batches(term_first, batch_format="pyarrow")
        .groupby("tb")
        .map_groups(bucket_min, batch_format="pandas")
        .to_pandas()
    )
    toks_by = tokp.groupby("ck")["toks"].sum() if len(tokp) else pd.Series(dtype="int64")
    nov_by = novp.groupby("ck")["novel"].sum() if len(novp) else pd.Series(dtype="int64")
    cum_t = 0
    cum_v = 0
    rows = []
    for ck in range(n_ck):
        cum_t += int(toks_by.get(ck, 0))
        cum_v += int(nov_by.get(ck, 0))
        rows.append((ck, cum_t, cum_v))
    return pd.DataFrame({
        "checkpoint": np.array([r[0] for r in rows], dtype=np.int64),
        "cum_tokens": np.array([r[1] for r in rows], dtype=np.int64),
        "cum_vocab": np.array([r[2] for r in rows], dtype=np.int64),
    })


@register(
    "mann_whitney_u",
    """
    WITH g AS (SELECT CAST(substr(source, 4) AS BIGINT) % 2 AS grp,
                      n_chars AS v FROM documents),
    c AS (SELECT v, sum(CASE WHEN grp=0 THEN 1 ELSE 0 END) AS ca,
                 count(*) AS ct FROM g GROUP BY 1),
    w AS (SELECT v, ca, ct,
                 coalesce(sum(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                    PRECEDING AND 1 PRECEDING), 0) AS cum_lt
          FROM c),
    s AS (SELECT sum(ca) AS na, sum(ct) - sum(ca) AS nb,
                 sum(ca * (2*cum_lt + ct + 1)) AS s2 FROM w)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(s2 - na*(na+1) AS BIGINT) AS u2,
           CAST((1000 * (s2 - na*(na+1))) // (2*na*nb) AS BIGINT)
             AS auc_permille
    FROM s
    """,
    doc="Mann-Whitney U rank-sum test between even- and odd-numbered "
    "sources' document lengths, EXACT under ties: doubled midranks "
    "keep every quantity integer (rank2(v) = 2*|{<v}| + |{=v}| + 1, "
    "so u2 = 2*U and auc_permille = 1000*U/(na*nb) is the "
    "probability-of-superiority / AUC up to quantization) — the "
    "nonparametric two-sample location test next to ks_length_drift's "
    "distribution-shape test.  Distributed shape: per-batch "
    "(value, group) count partials -> ONE bucketed_agg on the "
    "16-char-bounded length-value grid; the rank-sum folds "
    "driver-side over the bounded distinct-value frame (same bound "
    "as ks_length_drift's grid) in exact Python ints.",
)
def mann_whitney_u(sf_dir: str):
    from .stages.relational import bucketed_agg

    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"v": "int64", "ca": "int64", "ct": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        src = t["source"].to_pandas()
        grp = src.str.slice(3).astype(np.int64) % 2
        v = t["n_chars"].to_numpy().astype(np.int64)
        df = pd.DataFrame({"v": v, "ca": (grp == 0).astype(np.int64),
                           "ct": np.ones(len(v), dtype=np.int64)})
        return df.groupby("v", as_index=False)[["ca", "ct"]].sum()

    counts = bucketed_agg(
        _read(sf_dir, "documents", columns=["source", "n_chars"]).map_batches(
            prep, batch_format="pyarrow"),
        keys=["v"], sum_cols={"ca": "ca", "ct": "ct"},
    ).to_pandas().sort_values("v").reset_index(drop=True)
    ca = counts["ca"].to_numpy().astype(np.int64)
    ct = counts["ct"].to_numpy().astype(np.int64)
    cum_lt = np.concatenate([[0], np.cumsum(ct)[:-1]])
    na = int(ca.sum())
    nb = int(ct.sum()) - na
    s2 = int((ca * (2 * cum_lt + ct + 1)).sum())
    u2 = s2 - na * (na + 1)
    return pd.DataFrame({"n_a": [np.int64(na)], "n_b": [np.int64(nb)],
                         "u2": [np.int64(u2)],
                         "auc_permille": [np.int64((1000 * u2) // (2 * na * nb))]})


@register(
    "maximal_independent_set",
    """
    WITH RECURSIVE n AS (SELECT count(*) AS c FROM documents),
    l AS (
      SELECT d.doc_id AS src,
             (d.doc_id*131 + j*37 + j*j*11 + 7) % (SELECT c FROM n) AS target
      FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS t(j)
      UNION ALL
      SELECT doc_id, (doc_id + 1) % (SELECT c FROM n) FROM documents
      UNION ALL
      SELECT doc_id, (doc_id + 2) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, (doc_id + 3) % (SELECT c FROM n) FROM documents
      WHERE doc_id % 5 = 0),
    eu AS (SELECT DISTINCT least(src, target) AS a, greatest(src, target) AS b
           FROM l WHERE src <> target),
    edges2 AS (SELECT a AS src, b AS dst FROM eu
               UNION ALL SELECT b, a FROM eu
               UNION ALL SELECT doc_id, doc_id FROM documents),
    d AS (
      SELECT 0 AS it, doc_id AS node, CAST(0 AS BIGINT) AS st FROM documents
      UNION ALL
      SELECT it + 1 AS it, node,
             CASE WHEN own_st <> 0 THEN own_st
                  WHEN mis_nb > 0 THEN 2
                  WHEN und_nb = 0 OR my_key < min_und_key THEN 1
                  ELSE 0 END AS st
      FROM (
        SELECT d.it AS it, e.dst AS node,
          max(CASE WHEN e.src = e.dst THEN d.st END) AS own_st,
          max(CASE WHEN e.src <> e.dst AND d.st = 1 THEN 1 ELSE 0 END)
            AS mis_nb,
          sum(CASE WHEN e.src <> e.dst AND d.st = 0 THEN 1 ELSE 0 END)
            AS und_nb,
          min(CASE WHEN e.src <> e.dst AND d.st = 0
               THEN ((e.src*2654435761) % 2147483647)
                    * (SELECT c FROM n) + e.src END) AS min_und_key,
          max(CASE WHEN e.src = e.dst
               THEN ((e.src*2654435761) % 2147483647)
                    * (SELECT c FROM n) + e.src END) AS my_key
        FROM d JOIN edges2 e ON e.src = d.node
        WHERE d.it < 12
        GROUP BY 1, 2))
    SELECT CAST(count(*) AS BIGINT) AS n_mis,
           CAST(sum(node) AS BIGINT) AS sum_node_ids
    FROM d WHERE it = 12 AND st = 1
    """,
    doc="Maximal independent set via DETERMINISTIC Luby rounds "
    "(priority = Knuth-hash (v*2654435761) %% 2^31-1 with node-id "
    "tie-break — unique keys make the randomized algorithm "
    "deterministic and hash-stable): each round an undecided node "
    "joins the MIS if its key beats every undecided neighbor's, and "
    "MIS neighbors exclude; measured convergence 9 rounds at both "
    "500 and 5000 nodes.  The oracle unrolls 12 iteration-tagged "
    "recursive-CTE rounds where weight-free SELF-LOOPS let one "
    "d-to-edges join gather own-state AND neighbor aggregates "
    "(the sssp trick extended to three CASE aggregates).  "
    "Distributed shape: the kcore broadcast posture — state vector "
    "ray.put per round, edge batches emit per-batch (min undecided "
    "neighbor key, has-MIS-neighbor) partials, driver folds and "
    "transitions; convergence DETECTED.  Returns MIS size + the "
    "node-id checksum; independence and per-node maximality are "
    "asserted in the replay test.",
)
def maximal_independent_set(sf_dir: str, max_rounds: int = 64):
    import ray

    from .stages.relational import bucketed_agg

    n = pq.read_metadata(_pq(sf_dir, "documents")).num_rows
    ekeys = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda t: pa.table({"key": _explode_edge_keys(t, n)}),
        batch_format="pyarrow",
    )
    dist = bucketed_agg(ekeys, keys=["key"], sum_cols={"__count__": "c"})

    def both_dirs(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        a, b = key // n, key % n
        return pa.table({"src": np.concatenate((a, b)),
                         "dst": np.concatenate((b, a))})

    edges = dist.map_batches(both_dirs, batch_format="pyarrow").materialize()
    pkey = ((np.arange(n, dtype=np.int64) * 2654435761) % 2147483647) * n \
        + np.arange(n, dtype=np.int64)
    INF = np.int64(1) << 62
    st = np.zeros(n, dtype=np.int64)
    for _ in range(max_rounds):
        if not (st == 0).any():
            break
        sref = ray.put(st)

        def fold(t: pa.Table) -> pd.DataFrame:
            cols = {"node": "int64", "mn": "int64", "misnb": "int64"}
            if t.num_rows == 0:
                return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
            ss = ray.get(sref)
            src = t["src"].to_numpy()
            dst = t["dst"].to_numpy()
            mn = np.full(n, INF, dtype=np.int64)
            und = ss[src] == 0
            np.minimum.at(mn, dst[und], pkey[src[und]])
            misnb = np.zeros(n, dtype=np.int64)
            misnb[dst[ss[src] == 1]] = 1
            nz = np.nonzero((mn < INF) | (misnb > 0))[0]
            return pd.DataFrame({"node": nz.astype(np.int64),
                                 "mn": mn[nz], "misnb": misnb[nz]})

        parts = edges.map_batches(fold, batch_format="pyarrow").to_pandas()
        mn = np.full(n, INF, dtype=np.int64)
        misnb = np.zeros(n, dtype=bool)
        if len(parts):
            nodes = parts["node"].to_numpy(dtype=np.int64)
            np.minimum.at(mn, nodes, parts["mn"].to_numpy(dtype=np.int64))
            misnb[nodes[parts["misnb"].to_numpy(dtype=np.int64) > 0]] = True
        und = st == 0
        new = st.copy()
        new[und & misnb] = 2
        new[und & ~misnb & (pkey < mn)] = 1
        if np.array_equal(new, st):
            raise RuntimeError("mis: no progress before fixpoint")
        st = new
    else:
        raise RuntimeError("mis: not converged in max_rounds")
    mis = np.nonzero(st == 1)[0]
    return pd.DataFrame({"n_mis": [np.int64(len(mis))],
                         "sum_node_ids": [np.int64(mis.sum())]})


@register(
    "span_redaction",
    """
    WITH ts AS (
      SELECT d.doc_id, d.n_chars, t.j
      FROM documents d,
           unnest(generate_series(0, (d.n_chars + 63) // 64 - 1)) AS t(j)),
    sp AS (
      SELECT doc_id, 'text' AS kind,
             least(64, n_chars - j*64) AS tlen, j*64 AS off
      FROM ts
      UNION ALL
      SELECT doc_id,
             CASE (doc_id + j) % 3
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END,
             0, least((j+1)*64, n_chars)
      FROM ts WHERE (doc_id*31 + j) % 5 = 0),
    w AS (SELECT doc_id, kind, tlen, off,
            CASE WHEN kind = 'text' AND (doc_id + off//64) % 7 = 0
                 THEN 1 ELSE 0 END AS rm
          FROM sp),
    sh AS (SELECT doc_id, kind, tlen, off, rm,
            coalesce(sum(CASE WHEN rm = 1 THEN tlen ELSE 0 END) OVER
              (PARTITION BY doc_id ORDER BY off
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS shift
           FROM w)
    SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS spans_before,
           CAST(sum(1 - rm) AS BIGINT) AS spans_after,
           CAST(sum(rm * tlen) AS BIGINT) AS chars_removed,
           CAST(sum(CASE WHEN rm = 0 THEN off - shift ELSE 0 END)
                AS BIGINT) AS sum_new_offsets
    FROM sh
    """,
    doc="Span redaction with offset rebasing over the input_hint "
    "nested column: flagged text spans (tile hash (doc_id + "
    "offset//64) %% 7 == 0 — the PII-tile stand-in) are REMOVED from "
    "each document's spans list<struct> and every surviving span's "
    "offset shifts left by the redacted character count strictly "
    "before it (media spans at a removed tile's start do NOT shift "
    "— strict-less semantics, RANGE window in the oracle).  The Ray "
    "side performs the REAL nested rewrite: flatten the list column, "
    "compute per-doc group-exclusive removal prefix sums, rebuild a "
    "new list<struct> column with pa.ListArray.from_arrays, and "
    "derive the certified aggregates FROM THE REBUILT COLUMN — so "
    "the oracle certifies the transform's output, not a shortcut "
    "computation.  Per-batch single-row partials, one tiny global "
    "sum; a doc's spans never leave their row.",
)
def span_redaction(sf_dir: str):
    from ray.data.aggregate import Sum

    def redact(t: pa.Table) -> pd.DataFrame:
        cols = {"n_docs": "int64", "spans_before": "int64",
                "spans_after": "int64", "chars_removed": "int64",
                "sum_new_offsets": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        sc = t["spans"]
        spans = sc.chunk(0) if sc.num_chunks == 1 else sc.combine_chunks()
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy().astype(np.int64)
        did = t["doc_id"].to_numpy().astype(np.int64)[parent]
        kind = flat.field("kind").to_pandas().to_numpy(dtype=object)
        tlen = pc.utf8_length(flat.field("text")).to_numpy().astype(np.int64)
        off = flat.field("offset").to_numpy().astype(np.int64)
        rm = (kind == "text") & ((did + off // 64) % 7 == 0)
        # group-exclusive removal prefix per (doc, offset) group with
        # strict-less semantics: removed lengths at the SAME offset do
        # not shift their cohabitants
        df = pd.DataFrame({"row": parent, "off": off,
                           "val": np.where(rm, tlen, 0)})
        order = np.lexsort((off, parent))
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        ds = df.iloc[order].reset_index(drop=True)
        # group-exclusive running sum: per-row inclusive cumsum minus the
        # within-(row, off)-group inclusive cumsum leaves exactly the
        # removed mass at strictly smaller offsets of the same doc
        incl = ds.groupby("row", sort=False)["val"].cumsum()
        within = ds.groupby(["row", "off"], sort=False)["val"].cumsum()
        shift = (incl - within).to_numpy()[inv]
        keep = ~rm
        new_off = (off - shift)[keep]
        # rebuild the nested column for the kept spans
        keep_idx = np.nonzero(keep)[0]
        new_flat = pa.StructArray.from_arrays(
            [flat.field("kind").take(pa.array(keep_idx)),
             flat.field("text").take(pa.array(keep_idx)),
             flat.field("media_ref").take(pa.array(keep_idx)),
             pa.array(new_off.astype(np.int32), type=pa.int32())],
            names=["kind", "text", "media_ref", "offset"],
        )
        counts = np.bincount(parent[keep], minlength=t.num_rows)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        rebuilt = pa.ListArray.from_arrays(pa.array(offsets), new_flat)
        # certified aggregates FROM the rebuilt column
        rflat = rebuilt.flatten()
        return pd.DataFrame({
            "n_docs": [int(t.num_rows)],
            "spans_before": [int(len(flat))],
            "spans_after": [int(len(rflat))],
            "chars_removed": [int(tlen[rm].sum())],
            "sum_new_offsets": [int(rflat.field("offset").to_numpy()
                                    .astype(np.int64).sum())],
        })

    return (
        _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
        .map_batches(_build_span_column, batch_format="pyarrow")
        .map_batches(redact, batch_format="pyarrow")
        .groupby(None)
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("spans_before", alias_name="spans_before"),
                   Sum("spans_after", alias_name="spans_after"),
                   Sum("chars_removed", alias_name="chars_removed"),
                   Sum("sum_new_offsets", alias_name="sum_new_offsets"))
    )


@register(
    "consistent_hash_balance",
    """
    WITH ring AS (
      SELECT s.s AS shard,
             (((s.s*1000 + v.v) * 2654435761) % 2147483647) * 128
               + s.s*16 + v.v AS p
      FROM unnest(generate_series(0, 7)) AS s(s),
           unnest(generate_series(0, 15)) AS v(v)),
    u AS (SELECT DISTINCT user_id,
            ((user_id * 2654435761) % 2147483647) * 128 AS h FROM events),
    d AS (SELECT u.user_id, r.shard,
            ((r.p - u.h) % 274877906816 + 274877906816) % 274877906816
              AS dist
          FROM u, ring r),
    mn AS (SELECT user_id, min(dist) AS md FROM d GROUP BY 1)
    SELECT CAST(d.shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM d JOIN mn ON mn.user_id = d.user_id AND d.dist = mn.md
    GROUP BY 1
    """,
    doc="Consistent-hashing ring balance audit: 8 shards x 16 virtual "
    "nodes on a Knuth-hash ring (positions made collision-free by "
    "appending the vnode ordinal), every distinct user assigned to "
    "its clockwise successor — the elastic-resharding routing the "
    "frontier/seen/near-dup checkpoint restore relies on, and the "
    "audit shows exactly the low-V imbalance (2 vs 35 keys at "
    "sf0.01) that motivates raising virtual-node counts.  "
    "Distributed shape: the 128-point ring is broadcast sorted via "
    "ray.put; distinct users come from a bucketed_agg dedup; each "
    "batch assigns by ONE searchsorted (wraparound = position 0) "
    "and folds to <=8 (shard, count) partials; an 8-key groupby "
    "finishes.  The oracle mirrors with the wraparound-distance "
    "argmin formulation (DuckDB 1.0 rejects the correlated-min "
    "form).",
)
def consistent_hash_balance(sf_dir: str, n_shards: int = 8, n_vnodes: int = 16):
    import ray
    from ray.data.aggregate import Sum

    from .stages.relational import bucketed_agg

    s = np.repeat(np.arange(n_shards, dtype=np.int64), n_vnodes)
    v = np.tile(np.arange(n_vnodes, dtype=np.int64), n_shards)
    p = (((s * 1000 + v) * 2654435761) % 2147483647) * 128 + s * 16 + v
    order = np.argsort(p)
    ring_p = p[order]
    ring_s = s[order]
    ref = ray.put((ring_p, ring_s))

    users = bucketed_agg(
        _read(sf_dir, "events", columns=["user_id"]).map_batches(
            lambda t: pd.DataFrame(
                {"user_id": t["user_id"].to_numpy().astype(np.int64)}),
            batch_format="pyarrow"),
        keys=["user_id"], sum_cols={"__count__": "n"},
    )

    def assign(t: pa.Table) -> pd.DataFrame:
        cols = {"shard": "int64", "n_keys": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        rp, rs = ray.get(ref)
        u = pc.cast(t["user_id"], pa.int64()).to_numpy()
        h = ((u * 2654435761) % 2147483647) * 128
        pos = np.searchsorted(rp, h)
        pos[pos >= len(rp)] = 0  # wraparound to the ring's first point
        cnt = np.bincount(rs[pos], minlength=len(np.unique(rs)))
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame({"shard": nz.astype(np.int64),
                             "n_keys": cnt[nz].astype(np.int64)})

    return (
        users.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Sum("n_keys", alias_name="n_keys"))
    )


@register(
    "spatial_grid_join",
    """
    WITH p AS (
      SELECT vec_id,
             CAST(floor((embedding[1] + 1.0) * 1024) AS BIGINT) AS x,
             CAST(floor((embedding[2] + 1.0) * 1024) AS BIGINT) AS y
      FROM embeddings),
    c AS (SELECT vec_id, x, y, x // 32 AS cx, y // 32 AS cy FROM p),
    pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM c a JOIN c b
        ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
       AND a.vec_id < b.vec_id
      WHERE abs(a.x - b.x) < 32 AND abs(a.y - b.y) < 32)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(coalesce(sum(va + vb), 0) AS BIGINT) AS id_checksum
    FROM pairs
    """,
    doc="Spatial grid epsilon-join (the classic grid-partitioned "
    "similarity join, here Chebyshev distance < 32 on integer-"
    "quantized 2-D embedding projections; +1.0 shift keeps "
    "coordinates positive so // floor-vs-truncate semantics can't "
    "diverge between numpy and DuckDB).  Distributed shape: each "
    "point shuffles to its home grid cell and GHOST-replicates to "
    "the 8 neighbor cells (bounded 9x blowup of (id, x, y) triples "
    "— vectors never move); per cell a vectorized home x all "
    "candidate cross generates each pair EXACTLY ONCE via the "
    "'home endpoint has the smaller id' ownership rule, then the "
    "exact distance filter; single-row (count, checksum) partials "
    "fold globally.  The oracle mirrors with a 3x3 cell-range "
    "self-join.",
)
def spatial_grid_join(sf_dir: str, eps: int = 32):
    from ray.data.aggregate import Sum

    CELL = eps  # cell width = eps => neighbors live within one cell ring

    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"vec_id": "int64", "x": "int64", "y": "int64",
                "cell": "int64", "home": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        emb = list_col_to_matrix(t["embedding"])
        x = np.floor((emb[:, 0].astype(np.float64) + 1.0) * 1024).astype(np.int64)
        y = np.floor((emb[:, 1].astype(np.float64) + 1.0) * 1024).astype(np.int64)
        vid = t["vec_id"].to_numpy().astype(np.int64)
        cx, cy = x // CELL, y // CELL
        frames = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                frames.append(pd.DataFrame({
                    "vec_id": vid, "x": x, "y": y,
                    "cell": (cx + dx) * 4096 + (cy + dy),
                    "home": np.full(len(vid), 1 if (dx == 0 and dy == 0)
                                    else 0, dtype=np.int64),
                }))
        return pd.concat(frames, ignore_index=True)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"n_pairs": "int64", "id_checksum": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        out_n = 0
        out_s = 0
        for _, cg in g.groupby("cell", sort=False):
            home = cg[cg["home"] == 1]
            if len(home) == 0:
                continue
            hv = home["vec_id"].to_numpy()
            hx = home["x"].to_numpy()
            hy = home["y"].to_numpy()
            av = cg["vec_id"].to_numpy()
            ax = cg["x"].to_numpy()
            ay = cg["y"].to_numpy()
            na, nh = len(av), len(hv)
            ia = np.repeat(np.arange(nh), na)
            ib = np.tile(np.arange(na), nh)
            m = ((hv[ia] < av[ib])
                 & (np.abs(hx[ia] - ax[ib]) < eps)
                 & (np.abs(hy[ia] - ay[ib]) < eps))
            out_n += int(m.sum())
            out_s += int((hv[ia][m] + av[ib][m]).sum())
        return pd.DataFrame({"n_pairs": [out_n], "id_checksum": [out_s]})

    res = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(per_cell, batch_format="pandas")
        .groupby(None)
        .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                   Sum("id_checksum", alias_name="id_checksum"))
        .to_pandas()
    )
    return pd.DataFrame({"n_pairs": [np.int64(res["n_pairs"].iloc[0])],
                         "id_checksum": [np.int64(res["id_checksum"].iloc[0])]})


@register(
    "column_dict_audit",
    """
    WITH cols AS (
      SELECT 'lang' AS col, lang AS v FROM documents
      UNION ALL SELECT 'source', source FROM documents
      UNION ALL SELECT 'text', text FROM documents),
    s AS (SELECT col, count(*) AS n, count(DISTINCT v) AS d,
                 sum(length(v)) AS raw_chars
          FROM cols GROUP BY col),
    du AS (SELECT col, sum(length(v)) AS dict_chars
           FROM (SELECT DISTINCT col, v FROM cols) GROUP BY col)
    SELECT s.col, CAST(s.n AS BIGINT) AS n_rows,
           CAST(s.d AS BIGINT) AS n_distinct,
           CAST(s.raw_chars AS BIGINT) AS raw_chars,
           CAST(du.dict_chars
                + (s.n * length(bin(s.d - 1)) + 7) // 8 AS BIGINT)
             AS dict_est_bytes
    FROM s JOIN du USING (col)
    """,
    doc="Columnar dictionary-encoding audit — the storage-layout "
    "planning pass a 100 TB corpus needs before choosing encodings: "
    "per string column, row count, exact distinct count, raw "
    "character mass, and the estimated dictionary-encoded size "
    "(distinct-value chars + n rows x ceil-bits codes, bits = "
    "decimal bin() length of d-1 so the d=1 edge mirrors DuckDB's "
    "bin(0)='0').  On this corpus it shows lang/source compress "
    "5-11x while text (all-distinct) gains nothing — exactly the "
    "split Parquet/Lance writers must know.  Distributed shape: "
    "per-batch (col, value) dedup + per-batch (n, chars) counters; "
    "ONE value-hash bucket shuffle completes global distincts and "
    "dictionary mass (values cross the wire once, deduped); "
    "3-row driver fold.",
)
def column_dict_audit(sf_dir: str):
    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"col": "object", "v": "object", "n": "int64",
                "chars": "int64", "vb": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        frames = []
        for col in ("lang", "source", "text"):
            s = t[col].to_pandas()
            per = pd.DataFrame({"v": s}).groupby("v", as_index=False).size()
            ln = per["v"].str.len().to_numpy().astype(np.int64)
            h = pd.util.hash_pandas_object(per["v"], index=False).to_numpy()
            frames.append(pd.DataFrame({
                "col": col, "v": per["v"].to_numpy(dtype=object),
                "n": per["size"].to_numpy().astype(np.int64),
                "chars": ln * per["size"].to_numpy(),
                "vb": (h % 32).astype("int32"),
            }))
        return pd.concat(frames, ignore_index=True)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"col": "object", "n": "int64", "d": "int64",
                "raw": "int64", "dict_chars": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        per_v = g.groupby(["col", "v"], as_index=False).agg(
            n=("n", "sum"), chars=("chars", "sum"))
        per_v["vlen"] = per_v["v"].str.len().astype(np.int64)
        out = per_v.groupby("col", as_index=False).agg(
            n=("n", "sum"), d=("v", "size"), raw=("chars", "sum"),
            dict_chars=("vlen", "sum"))
        for c in ("n", "d", "raw", "dict_chars"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = (
        _read(sf_dir, "documents", columns=["lang", "source", "text"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("col", as_index=False).sum(numeric_only=True)
    rows = []
    for _, r in agg.iterrows():
        n, d = int(r["n"]), int(r["d"])
        bits = len(bin(d - 1)) - 2 if d > 1 else 1  # matches bin() varchar length
        rows.append((r["col"], n, d, int(r["raw"]),
                     int(r["dict_chars"]) + (n * bits + 7) // 8))
    return pd.DataFrame({
        "col": pd.Series([x[0] for x in rows], dtype=object),
        "n_rows": np.array([x[1] for x in rows], dtype=np.int64),
        "n_distinct": np.array([x[2] for x in rows], dtype=np.int64),
        "raw_chars": np.array([x[3] for x in rows], dtype=np.int64),
        "dict_est_bytes": np.array([x[4] for x in rows], dtype=np.int64),
    })


@register(
    "tail_gap_p99",
    """
    WITH g AS (SELECT user_id,
                 (epoch_us(ts) - epoch_us(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)))
                   // 1000000 AS d
               FROM events),
    v AS (SELECT user_id, d FROM g WHERE d IS NOT NULL),
    r AS (SELECT user_id, d,
                 row_number() OVER (PARTITION BY user_id ORDER BY d) AS rk,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM v)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(n AS BIGINT) AS n_gaps,
           CAST(d AS BIGINT) AS p99_gap_s
    FROM r WHERE n >= 20 AND rk = (n - 1) * 99 // 100 + 1
    """,
    doc="Per-user p99 inter-event gap (whole seconds) — the canonical "
    "tail-latency SLO statistic, as an EXACT discrete order statistic "
    "sorted[(n-1)*99//100] (no interpolation, so hash-stable; the "
    "same low-rank convention as mad_outliers' medians), hosts with "
    "fewer than 20 gaps excluded.  Distributed shape: ONE coarse "
    "user-bucket shuffle of (user, ts, id) triples; per bucket a "
    "single vectorized sort + segmented diff (host_burstiness' "
    "kernel) followed by a per-user partitioned sort of gaps and "
    "direct order-statistic indexing — one row per qualifying user "
    "leaves the bucket.  The oracle mirrors with lag + row_number "
    "windows.",
)
def tail_gap_p99(sf_dir: str, min_gaps: int = 20, pct: int = 99):
    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"u": "int64", "tus": "int64", "eid": "int64", "ub": "int32"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        u = t["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "u": u, "tus": t["ts"].cast(pa.int64()).to_numpy(),
            "eid": t["event_id"].to_numpy().astype(np.int64),
            "ub": (u % 32).astype("int32"),
        })

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"user_id": "int64", "n_gaps": "int64", "p99_gap_s": "int64"}
        if g.shape[1] == 0 or len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        g = g.sort_values(["u", "tus", "eid"], kind="stable")
        u = g["u"].to_numpy()
        tus = g["tus"].to_numpy()
        d = np.empty(len(g), dtype=np.int64)
        d[0] = -1
        d[1:] = np.where(u[1:] == u[:-1], (tus[1:] - tus[:-1]) // 1_000_000, -1)
        m = d >= 0
        df = pd.DataFrame({"u": u[m], "d": d[m]}).sort_values(
            ["u", "d"], kind="stable").reset_index(drop=True)
        uu = df["u"].to_numpy()
        starts = np.nonzero(np.concatenate([[True], uu[1:] != uu[:-1]]))[0]
        counts = np.diff(np.concatenate([starts, [len(uu)]]))
        keep = counts >= min_gaps
        idx = starts[keep] + (counts[keep] - 1) * pct // 100
        return pd.DataFrame({
            "user_id": uu[starts[keep]].astype(np.int64),
            "n_gaps": counts[keep].astype(np.int64),
            "p99_gap_s": df["d"].to_numpy()[idx].astype(np.int64),
        })

    return (
        _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(per_bucket, batch_format="pandas")
    )


@register(
    "lpt_shard_plan",
    """
    WITH RECURSIVE w AS (SELECT source, sum(n_chars) AS wt
                         FROM documents GROUP BY 1),
    r AS (SELECT source, wt,
                 row_number() OVER (ORDER BY wt DESC, source) AS rk
          FROM w),
    ass AS (
      SELECT 0 AS step,
             CAST(0 AS BIGINT) AS l0, CAST(0 AS BIGINT) AS l1,
             CAST(0 AS BIGINT) AS l2, CAST(0 AS BIGINT) AS l3,
             CAST(NULL AS VARCHAR) AS src, CAST(NULL AS BIGINT) AS shard,
             CAST(0 AS BIGINT) AS wt
      UNION ALL
      SELECT step + 1,
             l0 + CASE WHEN pick = 0 THEN wt ELSE 0 END,
             l1 + CASE WHEN pick = 1 THEN wt ELSE 0 END,
             l2 + CASE WHEN pick = 2 THEN wt ELSE 0 END,
             l3 + CASE WHEN pick = 3 THEN wt ELSE 0 END,
             source, pick, wt
      FROM (
        SELECT a.step, a.l0, a.l1, a.l2, a.l3, r.source, r.wt,
               CASE WHEN a.l0 <= a.l1 AND a.l0 <= a.l2 AND a.l0 <= a.l3
                    THEN 0
                    WHEN a.l1 <= a.l2 AND a.l1 <= a.l3 THEN 1
                    WHEN a.l2 <= a.l3 THEN 2 ELSE 3 END AS pick
        FROM ass a JOIN r ON r.rk = a.step + 1) t)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_sources,
           CAST(sum(wt) AS BIGINT) AS load_chars
    FROM ass WHERE shard IS NOT NULL GROUP BY 1
    """,
    doc="Graham's LPT (longest-processing-time) shard plan: sources "
    "sorted by total character mass descending, each greedily "
    "assigned to the least-loaded of 4 shards (lowest-id tie-break) "
    "— the 4/3-approximation load balancer a repartition planner "
    "runs on per-key weights before a skewed shuffle.  The greedy "
    "recurrence is SEQUENTIAL, yet oracle-able: a recursive CTE "
    "carries the four shard loads AS COLUMNS and a rank-joined item "
    "per iteration (the kcore/sssp iteration-tag family extended to "
    "accumulator state).  Distributed shape: per-source weights via "
    "ONE combiner'd bucketed_agg over the document stream — the "
    "corpus-scale work; the plan itself folds driver-side over the "
    "BOUNDED source list (the nations-style dim bound, documented), "
    "mirroring how a real planner treats per-key statistics.",
)
def lpt_shard_plan(sf_dir: str, n_shards: int = 4):
    from .stages.relational import bucketed_agg

    weights = bucketed_agg(
        _read(sf_dir, "documents", columns=["source", "n_chars"]).map_batches(
            lambda t: pd.DataFrame(
                {"source": t["source"].to_numpy(zero_copy_only=False),
                 "wt": t["n_chars"].to_numpy().astype(np.int64)}),
            batch_format="pyarrow"),
        keys=["source"], sum_cols={"wt": "wt"},
        key_dtypes={"source": "object"},
    ).to_pandas()
    weights = weights.sort_values(["wt", "source"],
                                  ascending=[False, True], kind="stable")
    loads = np.zeros(n_shards, dtype=np.int64)
    n_items = np.zeros(n_shards, dtype=np.int64)
    for wt in weights["wt"].astype(np.int64):
        pick = int(np.argmin(loads))  # lowest index on ties, matching SQL
        loads[pick] += int(wt)
        n_items[pick] += 1
    return pd.DataFrame({"shard": np.arange(n_shards, dtype=np.int64),
                         "n_sources": n_items,
                         "load_chars": loads})


@register(
    "theil_sen_trend",
    """
    WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
               FROM events GROUP BY 1),
    p AS (SELECT CAST(1024 * (b.cnt - a.cnt) AS BIGINT) AS num,
                 CAST(b.day - a.day AS BIGINT) AS den
          FROM d a JOIN d b ON b.day > a.day),
    q AS (SELECT CASE WHEN num >= 0 THEN num // den
                 ELSE -((-num) // den) END AS s FROM p),
    r AS (SELECT s, row_number() OVER (ORDER BY s) AS rk,
                 count(*) OVER () AS m
          FROM q)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           CAST(m AS BIGINT) AS n_pairs, CAST(s AS BIGINT) AS slope_q
    FROM r WHERE rk = (m - 1) // 2 + 1
    """,
    doc="Theil-Sen robust trend of daily event volume (the median of "
    "all pairwise slopes x1024, LOW median, truncation-toward-zero "
    "per pair — the breakdown-point-0.29 alternative to least "
    "squares that one outlier day cannot move).  Distributed shape: "
    "daily counts are per-batch (day, count) partials merged by a "
    "bounded groupby — the corpus-scale pass; the pairwise-slope "
    "median then folds driver-side over the TIME-SPAN-BOUNDED day "
    "grid (O(days^2) pairs, 435 at 30 days — the same documented "
    "bound as ks_length_drift's grid sweep).  Oracle mirrors with a "
    "self-join + signed-truncation CASE.",
)
def theil_sen_trend(sf_dir: str):
    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pd.DataFrame:
        cols = {"day": "int64", "cnt": "int64"}
        if t.num_rows == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        day = t["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000
        c = pd.Series(day).value_counts().sort_index()
        return pd.DataFrame({"day": c.index.to_numpy().astype(np.int64),
                             "cnt": c.to_numpy().astype(np.int64)})

    days = (
        _read(sf_dir, "events", columns=["ts"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    d = days["day"].to_numpy().astype(np.int64)
    c = days["cnt"].to_numpy().astype(np.int64)
    n = len(d)
    i, j = np.triu_indices(n, k=1)
    num = 1024 * (c[j] - c[i])
    den = d[j] - d[i]
    s = np.where(num >= 0, num // den, -((-num) // den))
    s.sort()
    m = len(s)
    return pd.DataFrame({"n_days": [np.int64(n)], "n_pairs": [np.int64(m)],
                         "slope_q": [np.int64(s[(m - 1) // 2])]})
