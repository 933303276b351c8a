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
         → NearDupShards (band-sharded, async)  LSH + exact Jaccard 0.9
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
import pyarrow.compute as pc
import ray

from .. import dom, schemas
from ..extractor import leaf_by_richness, state_action
from ..functions import shingles
from ..functions.urlnorm import url_host
from ..stages.dedup import NearDupShards
from ..stages.fetch import Fetcher, PolitenessClock
from ..stages.seen import SeenSet
from ..state.checkpoint import CheckpointStore


@dataclass
class CrawlConfig:
    wave_size: int | None = None          # None = whole frontier (BFS level)
    # "bfs" (depth-then-discovery priority) or "random" — the
    # reference's crawl-random head-or-tail seeded dequeue
    # (crawl.clj:781-801, utils/random-dequeue utils.clj:35-43)
    mode: str = "bfs"
    random_seed: int = 0
    num_leaves: int = 10**9
    budget: int = 10**9
    n_seen_shards: int = 4
    seen_kind: str = "bloom"
    exact_audit: bool = True              # False at 10^10 scale
    fetch_concurrency: int = 2
    fetch_batch_size: int = 64
    fetch_cache_size: int = 0   # per-actor document LRU (0 = off)
    politeness_ms: int = 0
    n_politeness_shards: int = 2
    n_cookie_shards: int = 2
    minhash_perms: int = 64
    lsh_bands: int = 16
    neardup_threshold: float = 0.9
    n_neardup_shards: int = 4
    # dup-stop rule (crawl.clj:346-349): stop at corpus ≥ dup_stop_corpus
    # AND dup_stop_consecutive consecutive near-dup leaves
    dup_stop_corpus: int = 1000
    dup_stop_consecutive: int = 30
    blacklist: frozenset = frozenset()
    # extension surface (SURVEY.md §2.12): the reference injects leaf?/
    # extract/stop? closures (crawl.clj:63-66); here they are pickled
    # into the worker actors / consulted by the driver loop.
    leaf_fn: object = None    # Callable[[html, url, state_action], bool]
    extract_fn: object = None  # Callable[[html, url, links], state-action list]
    stop_fn: object = None    # Callable[[metrics dict], bool]
    # production network hook: a small picklable zero-arg callable
    # returning a transport (stages/fetch.py HTTPTransport or any
    # object with resolve/body).  None → SyntheticTransport over the
    # pages table.  Built once per worker actor, in its process.
    transport_factory: object = None
    checkpoint_dir: str | None = None
    snapshot_every: int = 5
    max_rounds: int = 10**6
    # False → per-wave trace rows are NOT accumulated in driver memory
    # (metrics + corpus checkpoints still record everything); the
    # 100 TB setting, where the trace is itself a big dataset
    keep_trace: bool = True


class CrawlResult:
    """Crawl output: trace kept as per-round Arrow tables (zero per-row
    Python on the driver); ``.trace`` materializes lazily for tests."""

    def __init__(self):
        self.trace_tables: list[pa.Table] = []
        self.metrics: dict = {}
        self.corpus_paths: list[str] = []
        self._trace_cache: list[dict] | None = None

    def trace_table(self) -> pa.Table:
        if not self.trace_tables:
            return pa.Table.from_pylist([])
        return pa.concat_tables(self.trace_tables)

    @property
    def trace(self) -> list[dict]:
        if self._trace_cache is None:
            self._trace_cache = (
                self.trace_table().to_pylist() if self.trace_tables else []
            )
        return self._trace_cache

    def visited(self, seen: SeenSet) -> set[str]:
        return seen.members()


LINKS_ITEM = pa.struct(
    [pa.field("url", pa.string()), pa.field("text", pa.string()), pa.field("xpath", pa.string())]
)


def make_enrich(minhash_perms: int, blacklist: frozenset, keep_spans: bool = True, leaf_fn=None, extract_fn=None):
    """One DOM parse per page → spans, links, leaf flag, shingles, LSH
    keys.  Pure function of the page → safe at any wave parallelism.
    Drops ``body`` from the output (downstream uses spans/links only);
    span extraction itself is skipped when ``keep_spans`` is False
    (no corpus checkpoint → nobody reads them).

    ``extract_fn`` is the reference's injected ``extract`` closure
    (crawl.clj:63-66): (body, url, links) → state-action groups; the
    default is the rich extractor's ``state_action``.  ``leaf_fn``
    consumes whatever the extractor produced."""
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
            root = dom.parse_page(b)  # ONE parse feeds spans+links+leaf
            spans_col.append(dom.extract_spans_from_root(root, base) if keep_spans else [])
            links = dom.extract_links(root, base, blacklist=blacklist)
            sa = extract_fn(b, base, links) if extract_fn is not None else state_action(links)
            is_leaf = leaf_fn(b, base, sa) if leaf_fn is not None else leaf_by_richness(sa)
            leaf_col.append(is_leaf)
            nlinks_col.append(len(links))
            links_col.append([{"url": l["url"], "text": l["text"], "xpath": l["xpath"]} for l in links])
            if is_leaf:
                text = " ".join(root.text().split())
                # hashed shingles: 4x smaller on the wire, vectorized
                # exact-Jaccard downstream (shingles.shingle_hash_set)
                h = shingles.shingle_hash_set(text, 4)
                sig = shingles.minhash_from_hashes(h, num_perm=minhash_perms, params=params)
                grams_col.append(h)
                keys_col.append(shingles.lsh_band_keys(sig, bands=16))
            else:
                grams_col.append([])
                keys_col.append([])
        out = batch.drop_columns(["body"])
        out = out.append_column("spans", pa.array(spans_col, type=schemas.SPANS_TYPE))
        out = out.append_column("links", pa.array(links_col, type=pa.list_(LINKS_ITEM)))
        out = out.append_column("is_leaf", pa.array(leaf_col, type=pa.bool_()))
        out = out.append_column("n_links", pa.array(nlinks_col, type=pa.int32()))
        out = out.append_column("grams", pa.array([list(map(int, g)) for g in grams_col], type=pa.list_(pa.uint64())))
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
    stay Ray Data Datasets (see stages/, queries.py).

    Scale topology (round 2): the heavy per-page payloads never reach
    the driver.  Each worker
      * offers its chunk's exploded links DIRECTLY to the URL-seen
        shards (stages/seen.py offer/commit — first-wins made
        deterministic by a global priority key, so RPC arrival order
        doesn't matter),
      * puts its (grams, band_keys) table in plasma and hands only the
        ObjectRef back (the near-dup band shards pull it),
      * caches its corpus rows (spans included) and writes them to the
        checkpoint's parquet as its OWN part file on request.
    The driver sees just a small meta table (url/status/counters) per
    chunk plus the frontier winners."""

    def __init__(self, graph_ref, politeness, interval_ms, minhash_perms, blacklist, keep_spans=True, leaf_fn=None, extract_fn=None, cache_size=0, cookie_shards=None, transport_factory=None):
        # transport_factory (a small picklable callable) wins over the
        # graph table: the production hook for a live network
        # (stages/fetch.py HTTPTransport) — the transport is built HERE,
        # once per worker, because transports hold unpicklable state
        # (urllib openers, sockets)
        target = transport_factory() if transport_factory is not None else graph_ref
        self.fetcher = Fetcher(target, politeness, interval_ms, cache_size=cache_size, cookie_shards=cookie_shards)
        self.enrich = make_enrich(minhash_perms, blacklist, keep_spans, leaf_fn, extract_fn)
        self._corpus_cache: dict[tuple[int, int], pa.Table] = {}

    def cache_info(self) -> dict:
        return self.fetcher.cache_info()

    def process(self, tbl, ctx: dict | None = None):
        if isinstance(tbl, list):
            # polite-mode host partition: one plasma piece per seen
            # shard (pop_wave_parts) — pull them HERE (shard → plasma →
            # worker, driver passed refs only) and restore (depth, seq)
            # priority order across the shard pieces
            pieces = ray.get(tbl)
            tbl = pa.concat_tables(pieces, promote_options="default")
            order = np.lexsort(
                (tbl.column("discovery_seq").to_numpy(), tbl.column("depth").to_numpy())
            )
            if not np.array_equal(order, np.arange(tbl.num_rows)):
                tbl = tbl.take(pa.array(order))
        self.fetcher.wave_ctx = None if ctx is None else ctx.get("wave_ctx")
        full = self.enrich(self.fetcher(tbl))
        if ctx is None:
            return full  # bare fetch+enrich (bench warmup, tests)

        acks, links_seen = self._offer_links(full, ctx)
        leaf_np = full.column("is_leaf").to_numpy(zero_copy_only=False)
        nd_ref = ray.put(full.select(["grams", "band_keys"]))
        rnd = ctx.get("round")
        if rnd is not None:
            # keep only this round's cached chunks (an aborted round's
            # leftovers would pin span memory forever)
            for k in [k for k in self._corpus_cache if k[0] != rnd]:
                del self._corpus_cache[k]
            self._corpus_cache[(rnd, ctx["chunk_idx"])] = full.select(
                ["url", "host", "depth", "discovery_seq", "src_url",
                 "src_xpath", "status", "is_leaf", "spans"]
            )
        meta = full.select(
            ["url", "host", "depth", "discovery_seq", "src_url",
             "status", "redirects", "is_leaf", "n_links"]
        )
        return {
            "meta": meta,
            "acks": acks,
            "nd_ref": nd_ref,
            "links_seen": links_seen,
            "n_leaves": int(leaf_np.sum()),
        }

    def _offer_links(self, full: pa.Table, ctx: dict):
        """Explode the chunk's link lists (vectorized), key each link
        with the global first-wins priority — parent discovery_seq ×
        2^24 + within-document link order, totally ordered across the
        wave as (candidate depth, prio) without any driver-assigned
        wave rank — chunk-local dedup, and offer per-owner-shard tables
        to the URL-seen shards.  Returns (ack futures, raw link count)."""
        from ..stages.seen import LINK_CANDIDATE_SCHEMA, shard_route

        statuses = full.column("status").combine_chunks()
        ok_mask = pc.is_in(
            statuses, value_set=pa.array(["ok", "redirect"])
        ).to_numpy(zero_copy_only=False)
        links_col = full.column("links").combine_chunks()
        n_per_row = pc.list_value_length(links_col).fill_null(0).to_numpy(zero_copy_only=False)
        n_per_row = np.where(ok_mask, n_per_row, 0)
        links_seen = int(n_per_row.sum())
        if links_seen == 0:
            return [], 0
        keep_rows = np.where(n_per_row > 0)[0]
        sub = links_col.take(pa.array(keep_rows))
        flat = pc.list_flatten(sub)
        counts = n_per_row[keep_rows]
        src_idx = np.repeat(keep_rows, counts)
        starts = np.cumsum(counts) - counts
        within = np.arange(len(src_idx)) - np.repeat(starts, counts)
        pseq = full.column("discovery_seq").to_numpy(zero_copy_only=False)[src_idx]
        # the packed key gives the within-document index 24 bits; a page
        # yielding ≥2^24 links would silently bleed into the next seq's
        # key space and corrupt first-wins ordering — fail loudly instead
        assert counts.max() < (1 << 24), f"page link count {counts.max()} overflows 24-bit prio"
        assert pseq.max() < (1 << 39), "discovery_seq overflows the packed prio key"
        prio = pseq.astype(np.int64) * (1 << 24) + within
        cand_depth = (
            full.column("depth").to_numpy(zero_copy_only=False)[src_idx] + 1
        ).astype(np.int32)
        cand = pa.table(
            {
                "url": flat.field("url"),
                "xpath": flat.field("xpath"),
                "src_url": pc.take(full.column("url"), pa.array(src_idx)),
                "depth": pa.array(cand_depth),
                "prio": pa.array(prio, type=pa.int64()),
            },
            schema=LINK_CANDIDATE_SCHEMA,
        )
        order = np.lexsort((prio, cand_depth))
        cand = cand.take(pa.array(order))
        # Arrow-native first-wins: dictionary-encode once, mask the
        # first occurrence of each code (rows are already in global
        # (depth, prio) order), and hash only the DICTIONARY for shard
        # routing — no per-occurrence PyObject boxing on the per-link
        # hot path (VERDICT r3 item 4)
        enc = cand.column("url").dictionary_encode().combine_chunks()
        codes = enc.indices.to_numpy()
        _, fi = np.unique(codes, return_index=True)
        if len(fi) != len(codes):
            first = np.zeros(len(codes), dtype=bool)
            first[fi] = True
            cand = cand.filter(pa.array(first))
            codes = codes[first]
        shards = ctx["seen_shards"]
        sid = shard_route(enc.dictionary.to_pandas(), len(shards))[codes]
        acks = []
        for s in range(len(shards)):
            sel = np.where(sid == s)[0]
            if len(sel):
                acks.append(shards[s].offer.remote(cand.take(pa.array(sel))))
        return acks, links_seen

    def write_corpus(self, rnd: int, corpus_dir: str, flags_by_chunk: dict) -> int:
        """Write this worker's cached corpus chunks for ``rnd`` as
        parquet part files (near-dup flags patched in), then drop the
        cache.  Spans go disk-direct — never through the driver."""
        import pyarrow.parquet as pq

        total = 0
        for ci, flags in flags_by_chunk.items():
            tbl = self._corpus_cache.pop((rnd, ci))
            tbl = tbl.append_column(
                "near_dup", pa.array(np.asarray(flags, dtype=bool))
            )
            pq.write_table(tbl, os.path.join(corpus_dir, f"part-{ci:05d}.parquet"))
            total += tbl.num_rows
        return total


def make_workers(graph_ref, cfg: CrawlConfig, politeness=None, cookie_shards=None):
    """Create the persistent fetch+enrich pool (separable so benchmarks
    can warm the pool before timing the crawl proper).  A shared
    CookieStore (sharded) is created unless supplied, so session
    continuity spans the whole pool like the reference's global cookie
    jar (utils.clj:197)."""
    from ..stages.fetch import CookieStore

    if cookie_shards is None:
        cookie_shards = [
            CookieStore.options(num_cpus=0).remote()
            for _ in range(cfg.n_cookie_shards)
        ]
    return [
        FetchEnrichWorker.remote(
            graph_ref, politeness or [], cfg.politeness_ms, cfg.minhash_perms,
            cfg.blacklist, cfg.checkpoint_dir is not None, cfg.leaf_fn, cfg.extract_fn,
            cfg.fetch_cache_size, cookie_shards, cfg.transport_factory,
        )
        for _ in range(cfg.fetch_concurrency)
    ]


def crawl(
    pages: pa.Table,
    seeds: list[str],
    cfg: CrawlConfig = CrawlConfig(),
    resume: bool = False,
    graph_ref=None,
    workers=None,
) -> CrawlResult:
    """Run the BSP crawl over the synthetic site graph ``pages`` — or,
    with ``cfg.transport_factory`` set, over whatever network that
    transport reaches (``pages=None``; the graph table is only the
    SyntheticTransport's backing store, never consulted by the loop).

    Ray must already be initialised (library code never owns the
    session).  Returns the trace + metrics; corpus parquet lands under
    ``cfg.checkpoint_dir`` (or a temp dir) one directory per round."""
    if graph_ref is None and pages is not None:
        graph_ref = ray.put(pages)
    if graph_ref is None and cfg.transport_factory is None and workers is None:
        raise ValueError("crawl() needs pages/graph_ref, a transport_factory, or workers")
    seen = SeenSet(cfg.n_seen_shards, kind=cfg.seen_kind, exact_audit=cfg.exact_audit)
    neardup = NearDupShards(cfg.n_neardup_shards, cfg.neardup_threshold, cfg.lsh_bands)
    politeness = (
        [PolitenessClock.options(num_cpus=0).remote(cfg.politeness_ms) for _ in range(cfg.n_politeness_shards)]
        if cfg.politeness_ms > 0
        else []
    )
    ckpt = CheckpointStore(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    cookie_shards = None
    if workers is None:
        from ..stages.fetch import CookieStore

        # crawl() owns the jar shards so it can checkpoint/restore them;
        # an externally-supplied worker pool keeps its own jar (its
        # session state is then outside the checkpoint, documented)
        cookie_shards = [
            CookieStore.options(num_cpus=0).remote()
            for _ in range(cfg.n_cookie_shards)
        ]
        workers = make_workers(graph_ref, cfg, politeness, cookie_shards)

    res = CrawlResult()
    metrics = {
        "fetched": 0, "ok": 0, "redirect": 0, "robots_denied": 0, "missing": 0,
        "leaves": 0, "near_dups": 0, "links_seen": 0, "links_new": 0, "rounds": 0,
        "consecutive_dups": 0,
    }

    # The frontier lives IN the seen shards (round-3 north-rule change):
    # rows are born at commit time in their owner shard, bucketed by
    # depth, and leave as plasma chunk refs straight to the fetch
    # workers.  The driver tracks only a row COUNT plus per-round int
    # key arrays — flat memory w.r.t. frontier size.
    if resume and ckpt is not None and ckpt.latest_round() is not None:
        state = ckpt.load(seen, neardup)
        # one-time re-route of the checkpointed frontier into the shards
        # (the only moment resume touches frontier rows centrally)
        frontier_total = seen.add_frontier_routed(state["frontier"])
        next_seq = state["next_seq"]
        step = state["step"]
        metrics.update(state["metrics"])
        start_round = state["round"] + 1
        if state.get("cookies") and cookie_shards:
            # re-seed session continuity: each host's jar entry goes
            # back to its owner shard (host_hash routing, fetch.py);
            # legacy manifests carry a flat synth map, current ones a
            # {"synth", "http"} pair (live Set-Cookie jars checkpoint too)
            ck = state["cookies"]
            if "synth" not in ck and "http" not in ck:
                ck = {"synth": ck, "http": {}}
            from ..functions.urlnorm import host_hash

            n = len(cookie_shards)
            per_shard: dict[int, dict] = {}
            for h, v in ck.get("synth", {}).items():
                per_shard.setdefault(host_hash(h, n), {"synth": {}, "http": {}})["synth"][h] = v
            for h, v in ck.get("http", {}).items():
                per_shard.setdefault(host_hash(h, n), {"synth": {}, "http": {}})["http"][h] = v
            ray.get(
                [cookie_shards[s].restore.remote(d) for s, d in per_shard.items()]
            )
    else:
        seed_rows = pa.Table.from_pylist(
            [
                {
                    "url": s, "host": url_host(s), "depth": 0, "discovery_seq": i,
                    "src_url": "", "src_xpath": [],
                }
                for i, s in enumerate(seeds)
            ],
            schema=_frontier_schema(),
        )
        frontier_total = seen.add_frontier_routed(seed_rows)
        seen.test_and_set(seeds)
        next_seq = len(seeds)
        step = 0
        start_round = 0

    import random as _random

    rng_random = _random.Random(cfg.random_seed) if cfg.mode == "random" else None

    pending_nd: list = []
    for rnd in range(start_round, cfg.max_rounds):
        if frontier_total == 0:
            break
        if metrics["leaves"] >= cfg.num_leaves or step >= cfg.budget:
            break
        if cfg.stop_fn is not None and cfg.stop_fn(dict(metrics)):
            break

        _prof = os.environ.get("CRAWL_PROFILE")
        _t = time.time()
        # ---- wave selection ------------------------------------------
        # BFS: (depth, discovery_seq) priority — the driver picks a
        # packed (depth, seq) CUTOFF from per-shard int key arrays; the
        # shards pop their own rows and put chunk tables straight into
        # plasma (no frontier rows on the driver).
        # Random: the reference's crawl-random seeded head-or-tail
        # dequeue — the queue is always seq-sorted, so head ≡ min seq
        # and tail ≡ max seq across the shard frontiers.
        if rng_random is not None:
            bounds = [
                b for b in ray.get([s.seq_bounds.remote() for s in seen.shards]) if b
            ]
            target = (
                min(b[0] for b in bounds)
                if rng_random.random() < 0.5
                else max(b[1] for b in bounds)
            )
            rows = [
                r for r in ray.get([s.pop_seq.remote(target) for s in seen.shards])
                if r is not None
            ]
            assert len(rows) == 1, target
            chunks, popped = rows, 1
            from ..stages.seen import login_wave_keys

            wave_logins = login_wave_keys(rows[0])
            frontier_total -= 1
        else:
            wave_n = frontier_total if cfg.wave_size is None else min(cfg.wave_size, frontier_total)
            wave_n = min(wave_n, cfg.budget - step)
            if wave_n <= 0:
                break
            cutoff = None if wave_n >= frontier_total else seen.peek_cutoff(wave_n)
            # Under politeness, the wave leaves the shards already
            # grouped by salted host partition (pop_wave_parts in
            # stages/seen.py): a host's URLs stay chunk-local (one
            # clock reserve per chunk) while hot hosts are salted
            # across chunks; the driver merges per-partition ref lists
            # only — no frontier rows ever gather here.  Each fetch
            # worker concats + (depth, seq)-sorts its own partition.
            if cfg.politeness_ms > 0 and wave_n > 1:
                chunks, popped, wave_logins = seen.pop_wave_hosted(
                    cutoff, n_partitions=max(8, len(workers) * 2)
                )
            else:
                # adaptive chunking: ~3 chunks per worker for load
                # balance, but never tiny chunks (RPC overhead) nor
                # giant ones (stragglers)
                chunk_n = int(np.clip(wave_n // (3 * len(workers)) + 1, 8, 512))
                chunks, popped, wave_logins = seen.pop_wave(cutoff, chunk_n)
            assert popped == wave_n, (popped, wave_n)
            frontier_total -= popped

        # ---- fetch + enrich (the distributed part of the round) -------
        # wave_ctx makes gated-page visibility deterministic at any wave
        # parallelism: each shard reported its wave rows' per-host min
        # login (depth, seq) keys at pop time (login_wave_keys — no
        # driver row scan), and every Fetcher applies the rule "session
        # from a PRIOR wave, or this wave's login key < row key" —
        # ≡ the sequential cookie jar regardless of fetch timing.
        ctx_base = {
            "seen_shards": seen.shards,
            "round": rnd if ckpt is not None else None,
            "wave_ctx": {"wave": rnd, "login_keys": wave_logins},
        }
        futs = [
            workers[i % len(workers)].process.remote(c, {**ctx_base, "chunk_idx": i})
            for i, c in enumerate(chunks)
        ]
        outs = ray.get(futs)
        wave_meta = pa.concat_tables([o["meta"] for o in outs], promote_options="default")
        chunk_rows = [o["meta"].num_rows for o in outs]
        n_leaves_wave = sum(o["n_leaves"] for o in outs)
        links_seen_wave = sum(o["links_seen"] for o in outs)
        offer_acks = [a for o in outs for a in o["acks"]]
        nd_refs = [o["nd_ref"] for o in outs]
        if _prof: print(f"[prof r{rnd}] fetch+enrich {time.time()-_t:.2f}s rows={wave_meta.num_rows}"); _t=time.time()
        # fold in near-dup verdicts from PREVIOUS rounds (they ran
        # concurrently with the fetch we just finished)
        if pending_nd:
            _resolve_pending(pending_nd, res, metrics)
        if _prof: print(f"[prof r{rnd}] nd-resolve {time.time()-_t:.2f}s"); _t=time.time()
        # Chunk emission order is per-shard (each shard's chunks are
        # (depth, seq)-sorted, but shards interleave arbitrarily) — a
        # per-wave int lexsort restores global priority order for the
        # trace and the near-dup stream.  perm=None when already sorted
        # (single shard / wave=1), letting downstream skip the gather.
        perm = np.lexsort(
            (wave_meta.column("discovery_seq").to_numpy(), wave_meta.column("depth").to_numpy())
        )
        if np.array_equal(perm, np.arange(wave_meta.num_rows)):
            perm = None
            trace_meta = wave_meta
        else:
            trace_meta = wave_meta.take(pa.array(perm))

        # ---- near-dup marking in crawl order --------------------------
        # Worker-plasma handoff: each chunk's (grams, band_keys) table
        # was ray.put BY ITS WORKER; the band shards pull the refs and
        # concat in chunk order (+ perm → priority order), so the grams
        # never materialize on the driver.  Submission is ASYNC when not
        # checkpointing — the flags never gate frontier construction, so
        # verification overlaps the next round's fetch (actor mailboxes
        # are FIFO per caller → crawl order preserved); flags are folded
        # into trace/metrics when they arrive.
        leaf_mask = trace_meta.column("is_leaf").to_numpy(zero_copy_only=False)
        nd_futs = neardup.submit_refs(nd_refs, perm) if n_leaves_wave else []
        if ckpt is not None:
            # checkpointed runs resolve synchronously: the round's
            # manifest must carry final near_dup values
            dup_flags = neardup.resolve(nd_futs) if nd_futs else np.zeros(wave_meta.num_rows, dtype=bool)
            nd_futs = []
        else:
            dup_flags = None  # resolved later
        if _prof: print(f"[prof r{rnd}] neardup {time.time()-_t:.2f}s leaves={n_leaves_wave}"); _t=time.time()
        near_dup = (
            dup_flags if dup_flags is not None else np.zeros(wave_meta.num_rows, dtype=bool)
        )

        # ---- redirect hops into URL-seen (utils.clj:218-223) ----------
        # Inserted BEFORE the link commit, matching the sequential
        # semantics (a link to an intermediate hop URL is not new).
        red = wave_meta.column("redirects").combine_chunks()
        multi = np.where(pc.list_value_length(red).to_numpy(zero_copy_only=False) > 1)[0]
        if len(multi):
            # pc.unique keeps first-occurrence order, so this matches the
            # previous dict.fromkeys dedup while staying Arrow-side until
            # the shard RPC (which routes Python strings anyway).
            hops = pc.unique(pc.list_flatten(red.take(pa.array(multi))))
            seen.test_and_set(hops.to_pylist())

        # ---- trace + metrics (vectorized, trace stays Arrow) ----------
        statuses_arr = trace_meta.column("status").combine_chunks()
        vc = pc.value_counts(statuses_arr)
        for st, cnt in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
            metrics[st] = metrics.get(st, 0) + cnt
        n_rows = trace_meta.num_rows
        metrics["fetched"] += n_rows
        metrics["leaves"] += int(leaf_mask.sum())
        max_run = metrics["consecutive_dups"]
        if dup_flags is not None:
            metrics["near_dups"] += int(near_dup.sum())
            # consecutive-near-dup run across waves (leaf rows only —
            # non-leaf pages never touch the counter)
            cur = metrics["consecutive_dups"]
            for f in dup_flags[leaf_mask]:
                cur = cur + 1 if f else 0
                max_run = max(max_run, cur)
            metrics["consecutive_dups"] = cur
        else:
            pending_nd.append(
                (len(res.trace_tables) if cfg.keep_trace else None, nd_futs, leaf_mask)
            )
        if cfg.keep_trace:
            res.trace_tables.append(
                pa.table(
                    {
                        "step": pa.array(np.arange(step + 1, step + n_rows + 1), type=pa.int64()),
                        "url": trace_meta.column("url"),
                        "depth": trace_meta.column("depth"),
                        "src_url": trace_meta.column("src_url"),
                        "status": trace_meta.column("status"),
                        "is_leaf": trace_meta.column("is_leaf"),
                        "near_dup": pa.array(near_dup),
                        "n_links": trace_meta.column("n_links"),
                    }
                )
            )
        step += n_rows
        if _prof: print(f"[prof r{rnd}] hops+trace {time.time()-_t:.2f}s"); _t=time.time()
        # dup-stop heuristic (crawl.clj:346-349): ≥1000 corpus ∧ 30
        # consecutive near-dups (one-round lag in async mode)
        max_run = max(max_run, metrics.pop("_max_dup_run", 0))
        stop_dups = (
            metrics["fetched"] >= cfg.dup_stop_corpus
            and max_run >= cfg.dup_stop_consecutive
        )

        # ---- frontier from the shards' link commit --------------------
        # The workers already offered every candidate link (with its
        # global priority) straight to the owner seen shards; the ack
        # barrier guarantees the buffers are complete, then commit runs
        # first-wins dedup + test-and-set IN the shards, in parallel.
        # Winner ROWS never leave their shard: the driver ranks the
        # per-shard (depth, prio) int key arrays to assign dense
        # discovery seqs, and the shards append their own frontier rows
        # (host computed shard-side).
        metrics["links_seen"] += links_seen_wave
        if links_seen_wave:
            ray.get(offer_acks)
            n_new = seen.commit_and_rank(next_seq)
            metrics["links_new"] += n_new
            next_seq += n_new
            frontier_total += n_new
        if _prof: print(f"[prof r{rnd}] links+seen {time.time()-_t:.2f}s"); _t=time.time()
        metrics["rounds"] += 1

        # ---- checkpoint (workers write their own corpus parts) --------
        if ckpt is not None:
            tmp = ckpt.begin_round(rnd)
            corpus_dir = os.path.join(tmp, "corpus")
            # flags per chunk, in chunk-concat order (invert perm first)
            if perm is not None:
                flags_chunk = np.empty_like(near_dup)
                flags_chunk[perm] = near_dup
            else:
                flags_chunk = near_dup
            offs = np.cumsum([0] + chunk_rows)
            by_worker: dict[int, dict[int, np.ndarray]] = {}
            for ci in range(len(chunks)):
                by_worker.setdefault(ci % len(workers), {})[ci] = flags_chunk[offs[ci]:offs[ci + 1]]
            wrote = ray.get(
                [workers[w].write_corpus.remote(rnd, corpus_dir, fb) for w, fb in by_worker.items()]
            )
            # shards write their own frontier parts (parallel, driver
            # sees only the row count)
            frontier_rows = seen.write_frontier(os.path.join(tmp, "frontier"))
            cookies = None
            if cookie_shards:
                cookies = {"synth": {}, "http": {}}
                for d in ray.get([s.dump.remote() for s in cookie_shards]):
                    cookies["synth"].update(d["synth"])
                    cookies["http"].update(d["http"])
            path = ckpt.finish_round(
                rnd, None, metrics, step, next_seq,
                seen=seen if (rnd % cfg.snapshot_every == 0) else None,
                neardup=neardup if (rnd % cfg.snapshot_every == 0) else None,
                corpus_rows=int(sum(wrote)),
                frontier_rows=frontier_rows,
                cookies=cookies,
            )
            res.corpus_paths.append(path)

        if stop_dups:
            break

    if pending_nd:
        _resolve_pending(pending_nd, res, metrics)
    metrics.pop("_max_dup_run", None)
    res.metrics = metrics
    res.metrics["next_seq"] = next_seq
    res.metrics["steps"] = step
    return res


def _resolve_pending(pending_nd: list, res: CrawlResult, metrics: dict) -> None:
    """Fold async near-dup verdicts into the trace tables + metrics
    (patches the placeholder near_dup column written at wave time;
    trace-less mode updates metrics only)."""
    for tidx, futs, leaf_mask in pending_nd:
        nd = (
            NearDupShards.resolve(futs)
            if futs
            else np.zeros(len(leaf_mask), dtype=bool)
        )
        if tidx is not None:
            tbl = res.trace_tables[tidx]
            col_i = tbl.schema.get_field_index("near_dup")
            res.trace_tables[tidx] = tbl.set_column(col_i, "near_dup", pa.array(nd))
        metrics["near_dups"] += int(nd.sum())
        cur = metrics["consecutive_dups"]
        mr = cur
        for f in nd[leaf_mask]:
            cur = cur + 1 if f else 0
            mr = max(mr, cur)
        metrics["consecutive_dups"] = cur
        metrics["_max_dup_run"] = max(metrics.get("_max_dup_run", 0), mr)
    pending_nd.clear()
    res._trace_cache = None
    return


def _frontier_schema() -> pa.Schema:
    from ..stages.seen import FRONTIER_SCHEMA

    return FRONTIER_SCHEMA


def _empty_frontier() -> pa.Table:
    return pa.Table.from_pylist([], schema=_frontier_schema())
