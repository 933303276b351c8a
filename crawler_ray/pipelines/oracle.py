"""Pure-Python sequential crawl oracle — the conformance reference.

Mirrors the reference's BFS learn-crawler loop (crawl.clj:46-198):
  * FIFO queue, new links appended at the tail (crawl.clj:134-135, 178)
  * dedup at ENQUEUE time against visited ∪ queue (crawl.clj:124-129);
    queued entries are fetched even if an alias made them "visited"
    meanwhile — the reference has no dequeue-time check
  * within-page candidate dedup keeps the first occurrence
    (utils/distinct-by-key, crawl.clj:25-36)
  * redirect hop URLs are all unioned into visited (crawl.clj:743-745,
    utils.clj:218-223)
  * stop at num_leaves (main.clj:24-28 default 300) or fetch budget
    (main.clj:29-33 default 1000)

plus the sandbox robots rule (every host disallows /private — robots
checks are a north_rule addition; the reference never calls clj-robots).

The Ray BSP pipeline (pipelines/crawl.py) must reproduce this loop's
total crawl order exactly in conformance mode (wave=1) and its URL-seen
membership in wave-parallel mode.  Near-dup marking uses the SAME
LSH-candidates + exact-Jaccard-verify procedure as the pipeline so the
corpus near_dup column is comparable bit-for-bit.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from .. import dom
from ..extractor import leaf_by_richness, state_action
from ..functions import shingles
from ..functions.urlnorm import url_host
from ..stages.fetch import (
    SYNTH_LOGIN_PATH,
    SYNTH_LOGIN_WALL,
    SYNTH_ROBOTS_DISALLOW,
    SYNTH_SESSION_PREFIX,
)


@dataclass
class OracleResult:
    trace: list[dict] = field(default_factory=list)  # step,url,depth,src_url,status,is_leaf,near_dup
    visited: set = field(default_factory=set)
    frontier_left: list = field(default_factory=list)

    def trace_table(self) -> pa.Table:
        return pa.Table.from_pylist(self.trace)


def _robots_denied(url: str) -> bool:
    host = url_host(url)
    path = url.split(host, 1)[-1] if host else url
    return any(path.startswith(p) for p in SYNTH_ROBOTS_DISALLOW)


def crawl_bfs_oracle(
    pages: pa.Table,
    seeds: list[str],
    num_leaves: int = 10**9,
    budget: int = 10**9,
    blacklist: frozenset = frozenset(),
    minhash_perms: int = 64,
    lsh_bands: int = 16,
    leaf_fn=None,
    extract_fn=None,
) -> OracleResult:
    idx = {u: i for i, u in enumerate(pages.column("doc_id").to_pylist())}
    bodies = pages.column("html").to_pylist()
    redirect = pages.column("redirect_to").to_pylist()

    res = OracleResult()
    queue: list[dict] = []
    queued: set[str] = set()
    mh_params = shingles.minhash_params(minhash_perms)
    band_index: dict[int, list[tuple[str, object]]] = {}  # band_key → [(url, shingleset)]
    jar: set[str] = set()  # hosts with a live session (global cookie jar)

    seq = 0
    for s in seeds:
        queue.append({"url": s, "depth": 0, "src_url": "", "seq": seq})
        queued.add(s)
        seq += 1

    leaves = 0
    step = 0
    while queue and leaves < num_leaves and step < budget:
        ds = queue.pop(0)
        url = ds["url"]
        step += 1

        if _robots_denied(url):
            res.visited.add(url)
            res.trace.append(
                {"step": step, "url": url, "depth": ds["depth"], "src_url": ds["src_url"],
                 "status": "robots_denied", "is_leaf": False, "near_dup": False, "n_links": 0}
            )
            continue

        # resolve redirects; every hop enters visited (utils.clj:218-223)
        chain = [url]
        cur = url
        status = "ok"
        for _ in range(5):
            i = idx.get(cur)
            if i is None:
                status = "missing"
                break
            if not redirect[i]:
                break
            chain.append(redirect[i])
            cur = redirect[i]
        if status == "ok" and len(chain) > 1:
            status = "redirect"
        res.visited.update(chain)
        body = bodies[idx[cur]] if status in ("ok", "redirect") else ""
        if body:
            # session convention (stages/fetch.py): /login sets the host
            # cookie; /account/* without it serves the login wall
            host = url_host(cur)
            path = cur.split(host, 1)[-1] if host else cur
            if path == SYNTH_LOGIN_PATH:
                jar.add(host)
            elif path.startswith(SYNTH_SESSION_PREFIX) and host not in jar:
                body = SYNTH_LOGIN_WALL

        # extract + decide
        links, is_leaf, near_dup, n_links = [], False, False, 0
        if body:
            root = dom.parse_page(body)
            base = cur if status == "redirect" else url
            links = dom.extract_links(root, base, blacklist=blacklist)
            sa = extract_fn(body, base, links) if extract_fn is not None else state_action(links)
            is_leaf = leaf_fn(body, base, sa) if leaf_fn is not None else leaf_by_richness(sa)
            n_links = len(links)
            if is_leaf:
                leaves += 1
                # near-dup: LSH candidates then exact Jaccard ≥ 0.9
                # (shingles.clj:31-36 threshold; LSH replaces the
                # reference's O(corpus) seen? scan, crawl.clj:237-244)
                text = body_text(body)
                grams = shingles.shingle_hash_set(text, 4)
                sig = shingles.minhash_from_hashes(grams, num_perm=minhash_perms, params=mh_params)
                keys = shingles.lsh_band_keys(sig, bands=lsh_bands)
                cand: dict[str, object] = {}
                for k in keys:
                    for u2, g2 in band_index.get(k, []):
                        cand[u2] = g2
                near_dup = any(
                    shingles.jaccard_hashes(grams, g2) >= 0.9 for g2 in cand.values()
                )
                for k in keys:
                    band_index.setdefault(k, []).append((url, grams))

        res.trace.append(
            {"step": step, "url": url, "depth": ds["depth"], "src_url": ds["src_url"],
             "status": status, "is_leaf": is_leaf, "near_dup": near_dup, "n_links": n_links}
        )

        # enqueue: within-page dedup (first wins) then anti-join vs
        # visited ∪ queued (crawl.clj:124-129)
        page_seen: set[str] = set()
        for l in links:
            u = l["url"]
            if u in page_seen or u in res.visited or u in queued:
                continue
            page_seen.add(u)
            queue.append({"url": u, "depth": ds["depth"] + 1, "src_url": url, "seq": seq})
            queued.add(u)
            seq += 1

    res.frontier_left = queue
    return res


def body_text(body: str) -> str:
    """Page text for shingling: concatenated text spans (the reference
    shingles rendered page text, shingles.clj:16-26)."""
    return " ".join(dom.parse_page(body).text().split())


def crawl_random_oracle(
    pages: pa.Table,
    seeds: list[str],
    seed: int = 0,
    budget: int = 10**9,
) -> OracleResult:
    """``crawl-random`` (crawl.clj:781-801): dequeue head-or-tail by a
    SEEDED coin flip (utils/random-dequeue, utils.clj:35-43) — the
    reference's unseeded rand made its ordering irreproducible; the
    explicit seed is the conformance firming-up (SURVEY.md §7.5)."""
    import random

    from ..functions.sampling import random_dequeue

    rng = random.Random(seed)
    idx = {u: i for i, u in enumerate(pages.column("doc_id").to_pylist())}
    bodies = pages.column("html").to_pylist()
    redirect = pages.column("redirect_to").to_pylist()

    res = OracleResult()
    queue = [{"url": s, "depth": 0, "src_url": ""} for s in seeds]
    queued = set(seeds)
    step = 0
    while queue and step < budget:
        ds, queue = random_dequeue(queue, rng)
        queue = list(queue)
        url = ds["url"]
        step += 1
        if _robots_denied(url):
            res.visited.add(url)
            res.trace.append({"step": step, "url": url, "depth": ds["depth"],
                              "src_url": ds["src_url"], "status": "robots_denied",
                              "is_leaf": False, "near_dup": False, "n_links": 0})
            continue
        chain, cur, status = [url], url, "ok"
        for _ in range(5):
            i = idx.get(cur)
            if i is None:
                status = "missing"
                break
            if not redirect[i]:
                break
            chain.append(redirect[i])
            cur = redirect[i]
        if status == "ok" and len(chain) > 1:
            status = "redirect"
        res.visited.update(chain)
        body = bodies[idx[cur]] if status in ("ok", "redirect") else ""
        links = []
        if body:
            links = dom.extract_links(dom.parse_page(body), cur if status == "redirect" else url)
        res.trace.append({"step": step, "url": url, "depth": ds["depth"],
                          "src_url": ds["src_url"], "status": status,
                          "is_leaf": False, "near_dup": False, "n_links": len(links)})
        page_seen: set[str] = set()
        for l in links:
            u = l["url"]
            if u in page_seen or u in res.visited or u in queued:
                continue
            page_seen.add(u)
            queue.append({"url": u, "depth": ds["depth"] + 1, "src_url": url})
            queued.add(u)
    res.frontier_left = queue
    return res
