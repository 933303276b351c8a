"""The Ray-Data-native BSP crawl loop — the engine's flagship.

Round-based frontier advancement (SURVEY.md §7.1): each round takes a
wave of frontier entries in (depth, discovery_seq) priority order — the
reference's depth-then-discovery-time policy (crawl.clj FIFO append,
§2.11) — and runs

    wave → map_batches(Fetcher actor pool)      politeness + robots +
                                                redirect aliasing
         → map_batches(enrich)                  spans, state-action leaf,
                                                minhash, links (ONE DOM
                                                parse per page)
         → NearDupIndex.process (crawl order)   LSH + exact Jaccard 0.9
         → explode links → wave dedup (first-wins by (parent_seq, idx))
         → SeenSet.test_and_set                 sharded bloom/cuckoo
         → next frontier rows (seq assigned in priority order)

Conformance mode (wave_size=1) reproduces the sequential oracle's total
crawl order and URL-seen membership EXACTLY (asserted in tests).
Throughput mode (wave_size=None → whole frontier per round, i.e. one
BFS depth level) keeps the same URL-seen semantics with intra-round
first-wins dedup; ordering is the documented per-(depth, seq)
relaxation.

Checkpointing: every round writes corpus rows (parquet, one dir per
round), the next frontier, metrics and a lineage manifest; seen-shard
and near-dup-index snapshots every ``snapshot_every`` rounds.  Resume
loads the latest complete round (state/checkpoint.py) and continues —
kill-and-resume is exercised in tests.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray

from .. import dom, schemas
from ..extractor import leaf_by_richness, state_action
from ..functions import shingles
from ..functions.urlnorm import url_host
from ..stages.dedup import NearDupIndex
from ..stages.fetch import Fetcher, PolitenessClock
from ..stages.seen import SeenSet
from ..state.checkpoint import CheckpointStore


@dataclass
class CrawlConfig:
    wave_size: int | None = None          # None = whole frontier (BFS level)
    num_leaves: int = 10**9
    budget: int = 10**9
    n_seen_shards: int = 4
    seen_kind: str = "bloom"
    exact_audit: bool = True              # False at 10^10 scale
    fetch_concurrency: int = 2
    fetch_batch_size: int = 64
    politeness_ms: int = 0
    n_politeness_shards: int = 2
    minhash_perms: int = 64
    lsh_bands: int = 16
    neardup_threshold: float = 0.9
    blacklist: frozenset = frozenset()
    checkpoint_dir: str | None = None
    snapshot_every: int = 5
    max_rounds: int = 10**6


@dataclass
class CrawlResult:
    trace: list[dict] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)
    corpus_paths: list[str] = field(default_factory=list)

    def trace_table(self) -> pa.Table:
        return pa.Table.from_pylist(self.trace)

    def visited(self, seen: SeenSet) -> set[str]:
        return seen.members()


LINKS_ITEM = pa.struct(
    [pa.field("url", pa.string()), pa.field("text", pa.string()), pa.field("xpath", pa.string())]
)


def make_enrich(minhash_perms: int, blacklist: frozenset):
    """One DOM parse per page → spans, links, leaf flag, shingles, LSH
    keys.  Pure function of the page → safe at any wave parallelism."""
    params = shingles.minhash_params(minhash_perms)

    def enrich(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        bodies = batch["body"].to_pylist()
        statuses = batch["status"].to_pylist()
        redirects = batch["redirects"].to_pylist()
        spans_col, links_col, leaf_col, grams_col, keys_col, nlinks_col = [], [], [], [], [], []
        for u, b, st, chain in zip(urls, bodies, statuses, redirects):
            if not b:
                spans_col.append([])
                links_col.append([])
                leaf_col.append(False)
                grams_col.append([])
                keys_col.append([])
                nlinks_col.append(0)
                continue
            base = chain[-1] if st == "redirect" else u
            root = dom.parse_page(b)
            spans_col.append(dom.extract_spans(b, base))
            links = dom.extract_links(root, base, blacklist=blacklist)
            sa = state_action(links)
            is_leaf = leaf_by_richness(sa)
            leaf_col.append(is_leaf)
            nlinks_col.append(len(links))
            links_col.append([{"url": l["url"], "text": l["text"], "xpath": l["xpath"]} for l in links])
            if is_leaf:
                text = " ".join(root.text().split())
                grams = sorted(shingles.token_ngrams(text, 4))
                sig = shingles.minhash_signature(text, num_perm=minhash_perms, params=params)
                grams_col.append(grams)
                keys_col.append(shingles.lsh_band_keys(sig, bands=16))
            else:
                grams_col.append([])
                keys_col.append([])
        out = batch.append_column("spans", pa.array(spans_col, type=schemas.SPANS_TYPE))
        out = out.append_column("links", pa.array(links_col, type=pa.list_(LINKS_ITEM)))
        out = out.append_column("is_leaf", pa.array(leaf_col, type=pa.bool_()))
        out = out.append_column("n_links", pa.array(nlinks_col, type=pa.int32()))
        out = out.append_column("grams", pa.array(grams_col, type=pa.list_(pa.string())))
        out = out.append_column("band_keys", pa.array(keys_col, type=pa.list_(pa.uint64())))
        return out

    return enrich


@ray.remote
class FetchEnrichWorker:
    """Persistent per-crawl worker: Fetcher (politeness clocks, robots
    cache, page index — built ONCE) + enrich kernel.  The BSP loop
    reuses one pool across every round; Ray Data's map_batches would
    rebuild the actor pool per round-execution, which dominates
    wall-time when rounds are small.  Offline/corpus-wide operators
    stay Ray Data Datasets (see stages/, queries.py)."""

    def __init__(self, graph_ref, politeness, interval_ms, minhash_perms, blacklist):
        self.fetcher = Fetcher(graph_ref, politeness, interval_ms)
        self.enrich = make_enrich(minhash_perms, blacklist)

    def process(self, tbl: pa.Table) -> pa.Table:
        return self.enrich(self.fetcher(tbl))


def crawl(
    pages: pa.Table,
    seeds: list[str],
    cfg: CrawlConfig = CrawlConfig(),
    resume: bool = False,
) -> CrawlResult:
    """Run the BSP crawl over the synthetic site graph ``pages``.

    Ray must already be initialised (library code never owns the
    session).  Returns the trace + metrics; corpus parquet lands under
    ``cfg.checkpoint_dir`` (or a temp dir) one directory per round."""
    graph_ref = ray.put(pages)
    seen = SeenSet(cfg.n_seen_shards, kind=cfg.seen_kind, exact_audit=cfg.exact_audit)
    neardup = NearDupIndex.remote(cfg.neardup_threshold, cfg.lsh_bands)
    politeness = (
        [PolitenessClock.remote(cfg.politeness_ms) for _ in range(cfg.n_politeness_shards)]
        if cfg.politeness_ms > 0
        else []
    )
    ckpt = CheckpointStore(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    workers = [
        FetchEnrichWorker.remote(
            graph_ref, politeness, cfg.politeness_ms, cfg.minhash_perms, cfg.blacklist
        )
        for _ in range(cfg.fetch_concurrency)
    ]

    res = CrawlResult()
    metrics = {
        "fetched": 0, "ok": 0, "redirect": 0, "robots_denied": 0, "missing": 0,
        "leaves": 0, "near_dups": 0, "links_seen": 0, "links_new": 0, "rounds": 0,
        "consecutive_dups": 0,
    }

    if resume and ckpt is not None and ckpt.latest_round() is not None:
        state = ckpt.load(seen, neardup)
        frontier = state["frontier"]
        next_seq = state["next_seq"]
        step = state["step"]
        metrics.update(state["metrics"])
        start_round = state["round"] + 1
    else:
        frontier = pa.Table.from_pylist(
            [
                {
                    "url": s, "host": url_host(s), "depth": 0, "discovery_seq": i,
                    "src_url": "", "src_xpath": [],
                }
                for i, s in enumerate(seeds)
            ],
            schema=_frontier_schema(),
        )
        seen.test_and_set(seeds)
        next_seq = len(seeds)
        step = 0
        start_round = 0

    for rnd in range(start_round, cfg.max_rounds):
        if frontier.num_rows == 0:
            break
        if metrics["leaves"] >= cfg.num_leaves or step >= cfg.budget:
            break

        # ---- wave selection: (depth, discovery_seq) priority ----------
        order = np.lexsort(
            (frontier.column("discovery_seq").to_numpy(), frontier.column("depth").to_numpy())
        )
        wave_n = frontier.num_rows if cfg.wave_size is None else min(cfg.wave_size, frontier.num_rows)
        wave_n = min(wave_n, cfg.budget - step)
        wave = frontier.take(pa.array(order[:wave_n]))
        rest = frontier.take(pa.array(order[wave_n:]))

        # ---- fetch + enrich (the distributed part of the round) -------
        chunks = [
            wave.slice(o, cfg.fetch_batch_size)
            for o in range(0, wave.num_rows, cfg.fetch_batch_size)
        ]
        futs = [workers[i % len(workers)].process.remote(c) for i, c in enumerate(chunks)]
        wave_tbl = pa.concat_tables(ray.get(futs), promote_options="default")
        # order wave results by priority for trace/near-dup sequencing
        wsort = np.lexsort(
            (wave_tbl.column("discovery_seq").to_numpy(), wave_tbl.column("depth").to_numpy())
        )
        wave_tbl = wave_tbl.take(pa.array(wsort))

        # ---- near-dup marking in crawl order --------------------------
        leaf_mask = wave_tbl.column("is_leaf").to_numpy(zero_copy_only=False)
        entries = [
            (wave_tbl.column("url")[i].as_py(), wave_tbl.column("grams")[i].as_py(),
             wave_tbl.column("band_keys")[i].as_py())
            for i in np.where(leaf_mask)[0]
        ]
        dup_flags = ray.get(neardup.process.remote(entries)) if entries else []
        near_dup = np.zeros(wave_tbl.num_rows, dtype=bool)
        near_dup[np.where(leaf_mask)[0]] = dup_flags
        wave_tbl = wave_tbl.append_column("near_dup", pa.array(near_dup))

        # ---- redirect hops into URL-seen (utils.clj:218-223) ----------
        hop_urls = []
        for chain in wave_tbl.column("redirects").to_pylist():
            hop_urls.extend(chain)
        if hop_urls:
            seen.test_and_set(list(dict.fromkeys(hop_urls)))

        # ---- trace + metrics ------------------------------------------
        statuses = wave_tbl.column("status").to_pylist()
        for i in range(wave_tbl.num_rows):
            step += 1
            st = statuses[i]
            metrics["fetched"] += 1
            metrics[st] = metrics.get(st, 0) + 1
            if leaf_mask[i]:
                metrics["leaves"] += 1
                if near_dup[i]:
                    metrics["near_dups"] += 1
                    metrics["consecutive_dups"] += 1
                else:
                    metrics["consecutive_dups"] = 0
            res.trace.append(
                {
                    "step": step,
                    "url": wave_tbl.column("url")[i].as_py(),
                    "depth": wave_tbl.column("depth")[i].as_py(),
                    "src_url": wave_tbl.column("src_url")[i].as_py(),
                    "status": st,
                    "is_leaf": bool(leaf_mask[i]),
                    "near_dup": bool(near_dup[i]),
                    "n_links": wave_tbl.column("n_links")[i].as_py(),
                }
            )

        # dup-stop heuristic (crawl.clj:346-349): ≥1000 corpus ∧ 30
        # consecutive near-dups
        stop_dups = metrics["fetched"] >= 1000 and metrics["consecutive_dups"] >= 30

        # ---- explode links, wave-level first-wins dedup ---------------
        cand: list[dict] = []
        cand_seen: set[str] = set()
        for i in range(wave_tbl.num_rows):
            if statuses[i] not in ("ok", "redirect"):
                continue
            src_url = wave_tbl.column("url")[i].as_py()
            depth = wave_tbl.column("depth")[i].as_py()
            page_seen: set[str] = set()
            for l in wave_tbl.column("links")[i].as_py():
                u = l["url"]
                metrics["links_seen"] += 1
                if u in page_seen or u in cand_seen:
                    continue
                page_seen.add(u)
                cand_seen.add(u)
                cand.append(
                    {"url": u, "host": url_host(u), "depth": depth + 1,
                     "src_url": src_url, "src_xpath": [l["xpath"]]}
                )

        # ---- sharded seen filter (test-and-set) -----------------------
        fresh: list[dict] = []
        if cand:
            new_mask = seen.test_and_set([c["url"] for c in cand])
            for c, new in zip(cand, new_mask):
                if new:
                    c["discovery_seq"] = next_seq
                    next_seq += 1
                    fresh.append(c)
        metrics["links_new"] += len(fresh)

        new_rows = pa.Table.from_pylist(fresh, schema=_frontier_schema()) if fresh else _empty_frontier()
        frontier = pa.concat_tables([rest, new_rows]) if new_rows.num_rows else rest
        metrics["rounds"] += 1

        # ---- checkpoint -----------------------------------------------
        if ckpt is not None:
            corpus_tbl = wave_tbl.select(
                ["url", "host", "depth", "discovery_seq", "src_url", "status",
                 "is_leaf", "near_dup", "spans"]
            )
            path = ckpt.write_round(
                rnd, corpus_tbl, frontier, metrics, step, next_seq,
                seen=seen if (rnd % cfg.snapshot_every == 0) else None,
                neardup=neardup if (rnd % cfg.snapshot_every == 0) else None,
            )
            res.corpus_paths.append(path)

        if stop_dups:
            break

    res.metrics = metrics
    res.metrics["next_seq"] = next_seq
    res.metrics["steps"] = step
    return res


def _frontier_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("host", pa.string()),
            pa.field("depth", pa.int32()),
            pa.field("discovery_seq", pa.int64()),
            pa.field("src_url", pa.string()),
            pa.field("src_xpath", pa.list_(pa.string())),
        ]
    )


def _empty_frontier() -> pa.Table:
    return pa.Table.from_pylist([], schema=_frontier_schema())
