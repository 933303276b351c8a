"""Model replay (harvest) — the reference's ``crawl-model`` loop
(crawl.clj:246-530, driven by execute.clj:25-86 / main.clj:198-280).

Two queues with the reference's ordering semantics (SURVEY.md §2.11):
  * CONTENT queue: new model-matched links are inserted at the HEAD
    (crawl.clj:508-512) → depth-first within an action path.  A leaf's
    pagination link is also cons'ed to the head (crawl.clj:386-395).
  * PAGING queue: non-leaf pagination candidates; drained only when the
    content queue empties, deepest src-xpath first (crawl.clj:433-456).
  * a page reached via pagination CONTINUES its source's action path
    (pagination is a lateral move, not a step).

Per page: depth = len(action path); if the path equals a full model
action_seq → leaf (execute.clj:19-23 path-equality leaf?): store +
near-dup check (the 1000-corpus/30-consecutive-dups stop,
crawl.clj:346-349); else evaluate ONLY the model's next action xpath,
restricted by the learned {only, avoid} positional refinement
(dom.clj:520-643 eval-anchor-xpath-refined).  Budget stop: fetches ≥
budget (execute.clj:50-58).

``replay_sequential`` is the oracle-grade loop; ``replay_parallel``
runs waves on a Ray actor pool with block-LIFO + intra-block-FIFO
priority so wave=1 reproduces the sequential head-insertion order
exactly, and wave-parallel mode harvests the identical URL set
(asserted in tests).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from .. import dom
from ..functions.urlnorm import url_host
from ..stages.fetch import SYNTH_ROBOTS_DISALLOW
from .model import _seq_key


@dataclass
class ReplayResult:
    trace: list[dict] = field(default_factory=list)
    harvested: list[str] = field(default_factory=list)
    visited: set = field(default_factory=set)


def _denied(url: str) -> bool:
    host = url_host(url)
    path = url.split(host, 1)[-1] if host else url
    return any(path.startswith(p) for p in SYNTH_ROBOTS_DISALLOW)


def _model_next_actions(model: dict, path: list[str]) -> list[str]:
    """Next xpaths for pages at ``path`` (actions whose seq extends it)."""
    out = []
    for a in model["actions"]:
        seq = a["action_seq"]
        if len(seq) > len(path) and seq[: len(path)] == path:
            out.append(seq[len(path)])
    return list(dict.fromkeys(out))


def _refinement_for(model: dict, path: list[str], axn: str) -> dict | None:
    key = _seq_key(path + [axn])
    for a in model["actions"]:
        r = a.get("refined", {}).get(key)
        if r:
            return r
    return None


def _is_full_path(model: dict, path: list[str]) -> bool:
    return any(a["action_seq"] == path for a in model["actions"])


def _pick_pagination(links: list[dict], pag_xpath: str | None) -> dict | None:
    """Numeric-min anchor among pagination-action links
    (crawl.clj:479-486); falls back to lexicographic min
    (crawl.clj:204-209) when anchors are not all numeric."""
    cands = [
        l
        for l in links
        if (pag_xpath is None or l["xpath"] == pag_xpath) and l["text"].strip().isdigit()
    ]
    if cands:
        return min(cands, key=lambda l: (int(l["text"].strip()), l["url"]))
    cands = [l for l in links if pag_xpath is not None and l["xpath"] == pag_xpath]
    if cands:
        return min(cands, key=lambda l: (l["text"], l["url"]))
    return None


def replay_sequential(
    pages: pa.Table,
    seeds: list[str],
    model: dict,
    budget: int = 10**9,
) -> ReplayResult:
    idx = {u: i for i, u in enumerate(pages.column("doc_id").to_pylist())}
    bodies = pages.column("html").to_pylist()
    redirect = pages.column("redirect_to").to_pylist()
    pag_actions = model["pagination"]["paging_actions"]

    res = ReplayResult()
    content: list[dict] = [{"url": s, "path": [], "seq": i} for i, s in enumerate(seeds)]
    paging: list[dict] = []
    queued = {s for s in seeds}
    seq = len(seeds)
    step = 0

    while (content or paging) and step < budget:
        if content:
            ds = content.pop(0)
        else:
            # deepest src-xpath first (crawl.clj:433-456)
            paging.sort(key=lambda d: (-len(d["path"]), d["seq"]))
            ds = paging.pop(0)
        url, path = ds["url"], ds["path"]
        step += 1

        status = "ok"
        body = ""
        if _denied(url):
            status = "robots_denied"
            res.visited.add(url)
        else:
            chain = [url]
            cur = url
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
            if status in ("ok", "redirect"):
                body = bodies[idx[cur]]

        is_leaf = bool(body) and _is_full_path(model, path)
        res.trace.append(
            {"step": step, "url": url, "path": list(path), "status": status, "is_leaf": is_leaf}
        )

        if not body:
            continue
        links = dom.extract_links(dom.parse_page(body), url)

        if is_leaf:
            res.harvested.append(url)
            # leaf pagination cons'ed to head (crawl.clj:386-395)
            pag = _pick_pagination(links, pag_actions.get(_seq_key(path)))
            if pag and pag["url"] not in queued and pag["url"] not in res.visited:
                queued.add(pag["url"])
                content.insert(0, {"url": pag["url"], "path": list(path), "seq": seq})
                seq += 1
            continue

        # model-driven expansion: only the next action's xpath links
        new_block: list[dict] = []
        for axn in _model_next_actions(model, path):
            ref = _refinement_for(model, path, axn)
            for l in links:
                if l["xpath"] != axn:
                    continue
                if ref:
                    if ref["only"] and l["xpath_pos"] not in ref["only"]:
                        continue
                    if l["xpath_pos"] in ref["avoid"]:
                        continue
                u = l["url"]
                if u in queued or u in res.visited:
                    continue
                queued.add(u)
                new_block.append({"url": u, "path": path + [axn], "seq": seq})
                seq += 1
        # head insertion, document order preserved (crawl.clj:508-512)
        content[:0] = new_block

        # pagination candidate for THIS page (non-leaf) → paging queue
        pag = _pick_pagination(links, pag_actions.get(_seq_key(path)))
        if pag and pag["url"] not in queued and pag["url"] not in res.visited:
            queued.add(pag["url"])
            paging.append({"url": pag["url"], "path": list(path), "seq": seq})
            seq += 1

    return res




def _process_one(idx, bodies, redirect, model, pag_actions, url, path):
    """Pure per-item fetch + model-driven extraction (shared by the
    sequential loop, the inline fallback, and ReplayWorker actors).
    Returns (status, chain, is_leaf, candidates) where candidates are
    PRE-dedup [{url, path, kind}] in document order — global dedup
    against queued/visited is driver state."""
    status, body = "ok", ""
    chain = [url]
    if _denied(url):
        return "robots_denied", chain, False, []
    cur = url
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
    if status in ("ok", "redirect"):
        body = bodies[idx[cur]]
    if not body:
        return status, chain, False, []
    is_leaf = _is_full_path(model, path)
    links = dom.extract_links(dom.parse_page(body), url)
    pag_actions_key = pag_actions.get(_seq_key(path))
    cands: list[dict] = []
    if is_leaf:
        pag = _pick_pagination(links, pag_actions_key)
        if pag:
            cands.append({"url": pag["url"], "path": list(path), "kind": "content"})
    else:
        for axn in _model_next_actions(model, path):
            ref = _refinement_for(model, path, axn)
            for l in links:
                if l["xpath"] != axn:
                    continue
                if ref:
                    if ref["only"] and l["xpath_pos"] not in ref["only"]:
                        continue
                    if l["xpath_pos"] in ref["avoid"]:
                        continue
                cands.append({"url": l["url"], "path": path + [axn], "kind": "content"})
        pag = _pick_pagination(links, pag_actions_key)
        if pag:
            cands.append({"url": pag["url"], "path": list(path), "kind": "paging"})
    return status, chain, is_leaf, cands


class _ReplayWorkerImpl:
    def __init__(self, pages: pa.Table, model: dict):
        self.idx = {u: i for i, u in enumerate(pages.column("doc_id").to_pylist())}
        self.bodies = pages.column("html").to_pylist()
        self.redirect = pages.column("redirect_to").to_pylist()
        self.model = model
        self.pag_actions = model["pagination"]["paging_actions"]

    def process(self, items: list[tuple[str, list[str]]]) -> list[tuple]:
        return [
            _process_one(
                self.idx, self.bodies, self.redirect, self.model, self.pag_actions, u, p
            )
            for u, p in items
        ]


def replay_parallel(
    pages: pa.Table,
    seeds: list[str],
    model: dict,
    budget: int = 10**9,
    wave_size: int | None = None,
    concurrency: int = 4,
) -> ReplayResult:
    """BSP replay: waves over the content frontier with LIFO priority
    (block LIFO + intra-block FIFO) so wave_size=1 reproduces
    head-insertion DFS exactly; the paging frontier drains when content
    empties, deepest path first.  Wave items are fetched+extracted on a
    persistent Ray actor pool (model + page index loaded once per
    actor); global enqueue-dedup (queued ∪ visited, first-wins in block
    order) is driver state, exactly as in the sequential loop.
    Wave-parallel mode relaxes total order but harvests the identical
    URL set (asserted in tests)."""
    import ray

    use_ray = ray.is_initialized() and concurrency > 0
    if use_ray:
        Worker = ray.remote(_ReplayWorkerImpl)
        pages_ref = ray.put(pages)
        workers = [Worker.remote(pages_ref, model) for _ in range(concurrency)]
    else:
        local = _ReplayWorkerImpl(pages, model)

    pag_actions = model["pagination"]["paging_actions"]  # noqa: F841 (doc parity)
    res = ReplayResult()
    content: list[dict] = [
        {"url": s, "path": [], "blk": 0, "idx": i} for i, s in enumerate(seeds)
    ]
    paging: list[dict] = []
    queued = set(seeds)
    blk = 1
    step = 0

    while (content or paging) and step < budget:
        if content:
            content.sort(key=lambda d: (-d["blk"], d["idx"]))
            take = len(content) if wave_size is None else min(wave_size, len(content))
            wave, content = content[:take], content[take:]
        else:
            paging.sort(key=lambda d: (-len(d["path"]), d["blk"], d["idx"]))
            take = 1 if wave_size is not None else len(paging)
            wave, paging = paging[:take], paging[take:]
        wave = wave[: max(0, budget - step)]

        items = [(d["url"], d["path"]) for d in wave]
        if use_ray and len(items) > 1:
            chunk = max(8, len(items) // (3 * len(workers)) + 1)  # bound RPC count on small waves
            futs = [
                workers[i % len(workers)].process.remote(items[o : o + chunk])
                for i, o in enumerate(range(0, len(items), chunk))
            ]
            results = [r for part in ray.get(futs) for r in part]
        elif use_ray:
            results = ray.get(workers[0].process.remote(items))
        else:
            results = local.process(items)

        # driver: trace/visited/harvest + first-wins block construction
        for d, (status, chain, is_leaf, cands) in zip(wave, results):
            url, path = d["url"], d["path"]
            step += 1
            res.visited.update(chain)
            res.trace.append(
                {"step": step, "url": url, "path": list(path), "status": status, "is_leaf": is_leaf}
            )
            if is_leaf:
                res.harvested.append(url)
            block: list[dict] = []
            for c in cands:
                if c["url"] in queued or c["url"] in res.visited:
                    continue
                queued.add(c["url"])
                block.append(dict(c))
            for i, item in enumerate(block):
                item["blk"] = blk
                item["idx"] = i
            blk += 1
            for item in block:
                if item.pop("kind") == "paging":
                    paging.append(item)
                else:
                    content.append(item)

    return res


def replay_per_host(
    pages: pa.Table,
    seeds: list[str],
    model: dict,
    budget_per_host: int = 10**9,
) -> dict[str, ReplayResult]:
    """EXACT-order parallel replay: model-replay link extraction is
    same-host (SURVEY.md §2.3 in-host state-action), so the global
    sequential head-insertion loop decomposes into independent
    per-host sequential replays — each host's crawl runs the exact
    two-queue DFS in its own Ray task while hosts interleave freely.
    Per-host total order equals the sequential oracle's per-host
    projection (asserted in tests); this removes ``replay_parallel``'s
    wave-mode ordering relaxation at the cost of per-host (not global)
    budget semantics.

    Returns {host: ReplayResult}."""
    import ray

    from ..functions.urlnorm import url_host

    import numpy as np

    by_host: dict[str, list[str]] = {}
    for s in seeds:
        by_host.setdefault(url_host(s), []).append(s)

    # ONE pass over the pages table: sort by host, slice each host's
    # contiguous run (a filter per host would rescan the whole table
    # H times on the driver)
    hosts_np = np.asarray(pages.column("host").to_pylist(), dtype=object)
    order = np.argsort(hosts_np, kind="stable")
    sorted_pages = pages.take(pa.array(order))
    sorted_hosts = hosts_np[order]
    uniq, first = np.unique(sorted_hosts, return_index=True)
    bounds = {h: (int(f), int(l)) for h, f, l in zip(uniq, first, list(first[1:]) + [len(sorted_hosts)])}

    run = ray.remote(replay_sequential)
    futs = {}
    for host, host_seeds in sorted(by_host.items()):
        f, l = bounds.get(host, (0, 0))
        futs[host] = run.remote(sorted_pages.slice(f, l - f), host_seeds, model, budget_per_host)
    return {h: r for h, r in zip(futs, ray.get(list(futs.values())))}
