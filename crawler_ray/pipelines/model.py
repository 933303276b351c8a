"""Model learning — the reference's estimated-model build
(``discussion_forum.clj:28-46`` estimate-model, ``corpus.clj`` post-
processing).

A *model* is the reference's learned site navigation program
(SURVEY.md §1.1 #6):

    {"actions":    [{"action_seq": [xpath…]   # root-first
                     "count": int,            # leaf-path frequency
                     "refined": {"only": {...}, "avoid": {...}},
                     "yield": float}],
     "pagination": {"paging_actions": {src_seq_key: action_xpath},
                    "refine": {}}}

Components, with reference semantics:
  * leaf action-path frequencies — ``(frequencies leaf-paths)``
    (crawl.clj:108): Ray groupby on the serialized action path.
  * pagination detection (corpus.clj:123-217): candidate = a link with
    a NUMERIC anchor (corpus.clj:127-131) whose target page is
    structurally similar to its source (RTDM > 0.8 —
    rich_extractor.clj:213-215); ``frequencies`` of (src-action-path,
    link-xpath) pairs, spurious candidates dropped when the composed
    path already appears as a content action (corpus.clj:55-75), best
    candidate per src-action kept by similarity (corpus.clj:158-185).
  * refinement (corpus.clj:219-310, dom.clj:1018-1061): per action
    step, positional-xpath variants that led to leaves (``only``) vs
    only to non-leaves (``avoid``); modal refinement across parents
    (corpus.clj:300-302).
  * yield estimation (corpus.clj:324-407): product over path steps of
    the max per-parent link count, ×10 when the step is paginated
    (corpus.clj:401-403).
  * plan ordering (execute.clj:10-17, main.clj:206-216): actions
    sorted by (len(action_seq), −yield).
"""
from __future__ import annotations

from collections import Counter, defaultdict

import pyarrow as pa

from .. import dom
from ..functions.similarity import rtdm_similarity


def _seq_key(seq: list[str]) -> str:
    return "␟".join(seq)  # unit separator joined action path


def _compose(src_key: str, axn: str) -> str:
    """Append one action to a serialized path key ('' = empty path)."""
    return axn if not src_key else src_key + "␟" + axn


def trace_link_maps(
    trace_urls: list[str],
    pages: pa.Table,
    body_of: dict,
    distributed: bool | None = None,
    graph_ref=None,
):
    """(parent, link-url) → xpath / text / positional-xpath maps for
    every traced page — the model learner's DOM-parse fan-out.

    ``distributed=None`` auto-selects: traces past a few hundred pages
    parse in a Ray actor pool (page store loaded once per actor from a
    single ``ray.put``, one map_batches over the url list) and only the
    extracted LINK STRINGS return to the driver; small fixtures stay on
    the serial loop (actor startup would dominate)."""
    import ray

    if distributed is None:
        distributed = ray.is_initialized() and len(trace_urls) >= 256

    link_xpath: dict[tuple[str, str], str] = {}
    link_text: dict[tuple[str, str], str] = {}
    link_xpath_pos: dict[tuple[str, str], str] = {}

    if not distributed:
        for u in trace_urls:
            b = body_of.get(u, "")
            if not b:
                continue
            for l in dom.extract_links(dom.parse_page(b), u):
                key = (u, l["url"])
                if key not in link_xpath:
                    link_xpath[key] = l["xpath"]
                    link_text[key] = l["text"]
                    link_xpath_pos[key] = l["xpath_pos"]
        return link_xpath, link_text, link_xpath_pos

    import ray.data as rd

    if graph_ref is None:
        graph_ref = ray.put(pages)

    class LinkExtract:
        def __init__(self, ref):
            tbl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.idx = {u: i for i, u in enumerate(tbl.column("doc_id").to_pylist())}
            self.bodies = tbl.column("html").to_pylist()

        def __call__(self, t: pa.Table) -> pa.Table:
            srcs, urls, xps, txts, poss = [], [], [], [], []
            for u in t["url"].to_pylist():
                i = self.idx.get(u)
                b = self.bodies[i] if i is not None else ""
                if not b:
                    continue
                seen: set[str] = set()
                for l in dom.extract_links(dom.parse_page(b), u):
                    if l["url"] in seen:  # first wins, as in the serial loop
                        continue
                    seen.add(l["url"])
                    srcs.append(u)
                    urls.append(l["url"])
                    xps.append(l["xpath"])
                    txts.append(l["text"])
                    poss.append(l["xpath_pos"])
            return pa.table(
                {
                    "src": pa.array(srcs, type=pa.string()),
                    "url": pa.array(urls, type=pa.string()),
                    "xpath": pa.array(xps, type=pa.string()),
                    "text": pa.array(txts, type=pa.string()),
                    "xpath_pos": pa.array(poss, type=pa.string()),
                }
            )

    # pages WITH bodies only (body_of already resolved redirects/misses)
    with_body = [u for u in trace_urls if body_of.get(u)]
    ds = rd.from_arrow(
        pa.table({"url": pa.array(with_body, type=pa.string())})
    ).map_batches(
        LinkExtract,
        fn_constructor_args=(graph_ref,),
        batch_format="pyarrow",
        batch_size=128,
        concurrency=2,
    )
    # ONE batched ray.get: per-ref gets in a loop pay an owner-lookup
    # RPC each (seconds at 100+ worker-owned refs)
    for tbl in ray.get(ds.to_arrow_refs()):
        for s, u, xp, tx, ps in zip(
            tbl["src"].to_pylist(), tbl["url"].to_pylist(), tbl["xpath"].to_pylist(),
            tbl["text"].to_pylist(), tbl["xpath_pos"].to_pylist(),
        ):
            link_xpath[(s, u)] = xp
            link_text[(s, u)] = tx
            link_xpath_pos[(s, u)] = ps
    return link_xpath, link_text, link_xpath_pos


def learn_model(
    trace: list[dict],
    pages: pa.Table,
    pagination_sim_threshold: float = 0.8,
    distributed: bool | None = None,
) -> dict:
    """Learn the model from a finished learn-crawl: ``trace`` rows carry
    url/src_url/is_leaf/status; page bodies come from the site graph.

    The wide steps are expressed as groupbys over the trace (the
    frequencies and candidate counts); similarity verification runs
    only on candidate pairs.  The per-page DOM parse fan-out
    (link-xpath extraction) runs distributed for big traces
    (``trace_link_maps``), as does pagination-candidate verification."""
    idx = {u: i for i, u in enumerate(pages.column("doc_id").to_pylist())}
    bodies = pages.column("html").to_pylist()

    # reconstruct each url's action path root-first by walking src links
    src_of = {t["url"]: t["src_url"] for t in trace}
    leaf_of = {t["url"]: t["is_leaf"] for t in trace}
    body_of = {
        t["url"]: bodies[idx[t["url"]]] if t["url"] in idx else "" for t in trace
    }

    # per-link xpath: parent body → extract links → url → xpath
    link_xpath, link_text, link_xpath_pos = trace_link_maps(
        [t["url"] for t in trace], pages, body_of, distributed=distributed
    )

    def action_path(url: str) -> list[str]:
        path: list[str] = []
        cur = url
        seen = set()
        while cur in src_of and src_of[cur] and cur not in seen:
            seen.add(cur)
            parent = src_of[cur]
            xp = link_xpath.get((parent, cur))
            if xp is None:
                break
            path.append(xp)
            cur = parent
        path.reverse()
        return path

    paths = {t["url"]: action_path(t["url"]) for t in trace}

    # ---- leaf action-path frequencies (crawl.clj:108) ----------------
    leaf_paths = Counter(
        _seq_key(paths[t["url"]]) for t in trace if t["is_leaf"] and paths[t["url"]]
    )

    # ---- pagination candidates (corpus.clj:123-217) ------------------
    # numeric anchor filter first (cheap), then the RTDM similarity
    # verification fanned over a Ray actor pool (the expensive kernel)
    cand_pairs: list[tuple[str, str]] = []
    for t in trace:
        url, parent = t["url"], t["src_url"]
        if not parent:
            continue
        key = (parent, url)
        if not link_text.get(key, "").strip().isdigit():
            continue
        if not body_of.get(url, "") or not body_of.get(parent, ""):
            continue
        cand_pairs.append((parent, url))
    sims = verify_pagination_candidates_distributed(cand_pairs, pages)
    pag_counter: Counter = Counter()
    pag_sim: dict[tuple[str, str], float] = {}
    for (parent, url), sim in zip(cand_pairs, sims):
        if sim < pagination_sim_threshold:
            continue
        key = (parent, url)
        src_seq = _seq_key(paths[parent])
        axn = link_xpath[key]
        pag_counter[(src_seq, axn)] += 1
        pag_sim[(src_seq, axn)] = max(pag_sim.get((src_seq, axn), 0.0), sim)

    # spurious-composition filter (corpus.clj:55-75): drop a pagination
    # candidate whose composed path is itself a leaf action path
    content_paths = set(leaf_paths)
    pag_filtered = {
        k: v for k, v in pag_counter.items() if _compose(k[0], k[1]) not in content_paths
    }
    # best per src-action by similarity (corpus.clj:158-185)
    paging_actions: dict[str, str] = {}
    best_sim: dict[str, float] = {}
    for (src_seq, axn), _n in pag_filtered.items():
        s = pag_sim[(src_seq, axn)]
        if s > best_sim.get(src_seq, -1.0):
            best_sim[src_seq] = s
            paging_actions[src_seq] = axn

    # ---- refinement (corpus.clj:219-310) -----------------------------
    # per (action path prefix, action): positional variants → leaf vs not
    refined: dict[str, dict[str, list]] = {}
    pos_outcomes: dict[tuple[str, str], dict[str, set]] = defaultdict(
        lambda: {"leaf": set(), "nonleaf": set()}
    )
    for t in trace:
        url, parent = t["url"], t["src_url"]
        if not parent:
            continue
        key = (parent, url)
        if key not in link_xpath:
            continue
        step_key = (_seq_key(paths[parent]), link_xpath[key])
        pos_xp = link_xpath_pos[key]
        # does any leaf live at-or-below this link?  approximation:
        # outcome of the immediate target (the reference probes stored
        # corpus bodies the same one-step way, model.clj:30-160)
        bucket = "leaf" if leaf_of.get(url) else "nonleaf"
        pos_outcomes[step_key][bucket].add(pos_xp)
    for (src_seq, axn), oc in pos_outcomes.items():
        only = sorted(oc["leaf"] - oc["nonleaf"])
        avoid = sorted(oc["nonleaf"] - oc["leaf"])
        if only or avoid:
            refined[_compose(src_seq, axn)] = {"only": only, "avoid": avoid}

    # ---- yield estimation (corpus.clj:324-407) -----------------------
    # per action path: product over steps of max per-parent child count
    children_at: dict[tuple[str, str], Counter] = defaultdict(Counter)
    for t in trace:
        parent = t["src_url"]
        if not parent:
            continue
        key = (parent, t["url"])
        if key in link_xpath:
            children_at[(_seq_key(paths[parent]), link_xpath[key])][parent] += 1

    def estimate_yield(seq: list[str]) -> float:
        y = 1.0
        for k in range(len(seq)):
            prefix = _seq_key(seq[:k])
            step = (prefix, seq[k])
            per_parent = children_at.get(step)
            y *= max(per_parent.values()) if per_parent else 1.0
            if prefix in paging_actions:
                y *= 10.0  # corpus.clj:401-403
        return y

    actions = []
    for seq_key, count in leaf_paths.items():
        seq = seq_key.split("␟") if seq_key else []
        actions.append(
            {
                "action_seq": seq,
                "count": count,
                "refined": {
                    _seq_key(seq[: k + 1]): refined[_compose(_seq_key(seq[:k]), seq[k])]
                    for k in range(len(seq))
                    if _compose(_seq_key(seq[:k]), seq[k]) in refined
                },
                "yield": estimate_yield(seq),
            }
        )

    # plan ordering (execute.clj:10-17): (length, −yield)
    actions.sort(key=lambda a: (len(a["action_seq"]), -a["yield"]))
    return {"actions": actions, "pagination": {"paging_actions": paging_actions, "refine": {}}}


def remove_pagination_from_actions(model: dict) -> dict:
    """corpus.clj:409-438 (fix-model): strip content actions whose path
    is a pagination-composed variant of a shorter action."""
    pag = model["pagination"]["paging_actions"]
    composed = {_compose(src, axn) for src, axn in pag.items()}
    kept = [a for a in model["actions"] if _seq_key(a["action_seq"]) not in composed]
    return {"actions": kept, "pagination": model["pagination"]}


def learn_leaf_paths_distributed(checkpoint_dir: str, max_depth: int = 6):
    """The (frequencies leaf-paths) model build (crawl.clj:108) as RAY
    DATA operations over a checkpointed corpus — the 100 TB-corpus
    shape of ``learn_model``'s first stage.

    Action paths are reconstructed by an ITERATIVE PARENT JOIN
    (SURVEY.md §2.5 ":parent-set walk — iterative semi-join per model
    depth; depths are small"): each round joins the working set to the
    corpus on (child.src_url = parent.url) to prepend the parent's
    edge xpath, at most ``max_depth`` times.  The final leaf-path
    frequencies are one groupby over the serialized paths.

    Returns a pandas DataFrame (action_path_key, count) equal to the
    driver-side ``learn_model``'s leaf_paths counter (asserted in
    tests).  Edge xpaths come from the corpus's src_xpath column (the
    frontier recorded the generalized xpath each URL was discovered
    through), so no page re-parsing is needed.
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..state.checkpoint import CheckpointStore

    # STREAMING corpus read (worker-written parquet parts) — the corpus
    # never materializes on the driver.  Arrow hash joins reject
    # list-typed payload columns, so the edge xpath serializes to a
    # string inside the batch transform.
    cds = CheckpointStore(checkpoint_dir).corpus_dataset()

    def to_base(t: pa.Table) -> pa.Table:
        edge = pa.array(
            ["␟".join(x) if x else "" for x in t["src_xpath"].to_pylist()],
            type=pa.string(),
        )
        return pa.table(
            {
                "url": t["url"],
                "src_url": t["src_url"],
                "edge": edge,
                "is_leaf": t["is_leaf"],
            }
        )

    base = cds.map_batches(to_base, batch_format="pyarrow").materialize()

    # edges: url → (src_url, edge); seeds have src_url "" / empty edge
    edges = base.map_batches(
        lambda t: t.select(["url", "src_url", "edge"]), batch_format="pyarrow"
    ).materialize()

    # working set: leaves, path accumulated root-FIRST by prepending
    def to_work(t: pa.Table) -> pa.Table:
        lv = t.filter(pa.compute.equal(t["is_leaf"], True))
        return pa.table(
            {"leaf_url": lv["url"], "cursor": lv["src_url"], "path": lv["edge"]}
        )

    work = base.map_batches(to_work, batch_format="pyarrow")

    for _ in range(max_depth):
        # split: done (cursor is a seed / unknown) vs pending.
        # (materialize pins the schema — hash-join finalization chokes
        # on empty schemaless partitions from a lazy map_batches)
        work = work.materialize()
        joined = work.join(
            edges,
            join_type="left_outer",
            num_partitions=4,
            on=("cursor",),
            right_on=("url",),
        )

        def step(t: pa.Table) -> pa.Table:
            cursors, paths = [], []
            for cur_src, edge, path in zip(
                t["src_url"].to_pylist(),
                t["edge"].to_pylist(),
                t["path"].to_pylist(),
            ):
                if cur_src is None or cur_src == "":
                    cursors.append("")          # reached a seed → done
                    paths.append(path)
                else:
                    edge = edge or ""
                    cursors.append(cur_src)
                    paths.append(edge + "␟" + path if edge and path else (edge or path))
            return pa.table(
                {
                    "leaf_url": t["leaf_url"],
                    "cursor": pa.array(cursors, type=pa.string()),
                    "path": pa.array(paths, type=pa.string()),
                }
            )

        nxt = joined.map_batches(step, batch_format="pyarrow").repartition(2).materialize()
        work = nxt
        # early exit when every cursor is resolved
        remaining = nxt.map_batches(
            lambda t: pa.table(
                {"n": pa.array([int(pa.compute.sum(
                    pa.compute.cast(pa.compute.not_equal(t["cursor"], ""), pa.int64())
                ).as_py() or 0)], type=pa.int64())}
            ),
            batch_format="pyarrow",
        ).to_pandas()["n"].sum()
        if remaining == 0:
            break

    freqs = (
        work.map_batches(
            lambda t: t.filter(pa.compute.not_equal(t["path"], "")).select(["path"]),
            batch_format="pyarrow",
        )
        .groupby("path")
        .aggregate(Count(alias_name="count"))
        .to_pandas()
    )
    return freqs.rename(columns={"path": "action_path_key"})


def fix_model(model: dict, trace: list[dict], pages: pa.Table) -> dict:
    """``fix-model`` (main.clj:182-196 → model.clj:30-160
    fix-model-restrictions + dom.clj:779-815 probe-refinements-onlies):
    strip pagination-composed actions, then PROBE each refinement
    against the stored corpus — an ``avoid`` positional xpath whose
    target turned out to be (or lead to) a leaf is repaired (dropped),
    and an ``only`` entry whose targets were never leaves is dropped.
    Marks the model ``fixed``."""
    model = remove_pagination_from_actions(model)
    idx = {u: i for i, u in enumerate(pages.column("doc_id").to_pylist())}
    bodies = pages.column("html").to_pylist()
    leaf_of = {t["url"]: t["is_leaf"] for t in trace}
    src_of = {t["url"]: t["src_url"] for t in trace}

    # positional-xpath → observed leaf outcome, probed from the corpus
    pos_leaf: dict[str, bool] = {}
    for t in trace:
        parent = t["src_url"]
        if not parent or parent not in idx:
            continue
        b = bodies[idx[parent]]
        if not b:
            continue
        for l in dom.extract_links(dom.parse_page(b), parent):
            if l["url"] == t["url"]:
                pos_leaf[l["xpath_pos"]] = pos_leaf.get(l["xpath_pos"], False) or t["is_leaf"]

    fixed_actions = []
    for a in model["actions"]:
        refined = {}
        for key, r in a.get("refined", {}).items():
            only = [p for p in r.get("only", []) if pos_leaf.get(p, True)]
            avoid = [p for p in r.get("avoid", []) if not pos_leaf.get(p, False)]
            if only or avoid:
                refined[key] = {"only": only, "avoid": avoid}
        fixed_actions.append({**a, "refined": refined})
    return {"actions": fixed_actions, "pagination": model["pagination"], "fixed": True}


class _PagVerifyImpl:
    """Worker: page store loaded once; verifies RTDM similarity for
    candidate (parent, child) pagination pairs — the expensive kernel
    of pagination detection, distributed (corpus.clj:123-217 does this
    per pair inline)."""

    def __init__(self, pages: pa.Table):
        self.idx = {u: i for i, u in enumerate(pages.column("doc_id").to_pylist())}
        self.bodies = pages.column("html").to_pylist()

    def verify(self, pairs: list[tuple[str, str]]) -> list[float]:
        out = []
        for parent, child in pairs:
            bi, bj = self.idx.get(parent), self.idx.get(child)
            if bi is None or bj is None or not self.bodies[bi] or not self.bodies[bj]:
                out.append(-1.0)
                continue
            out.append(rtdm_similarity(self.bodies[bi], self.bodies[bj]))
        return out


def verify_pagination_candidates_distributed(
    pairs: list[tuple[str, str]], pages: pa.Table, concurrency: int = 4
) -> list[float]:
    """Fan the candidate pairs over a Ray actor pool (page store in
    plasma, one index build per actor); inline fallback without Ray."""
    import ray

    if not pairs:
        return []
    if not ray.is_initialized() or concurrency <= 0 or len(pairs) < 8:
        return _PagVerifyImpl(pages).verify(pairs)
    Worker = ray.remote(_PagVerifyImpl)
    ref = ray.put(pages)
    workers = [Worker.remote(ref) for _ in range(concurrency)]
    chunk = max(1, len(pairs) // (3 * concurrency) + 1)
    futs = [
        workers[i % concurrency].verify.remote(pairs[o : o + chunk])
        for i, o in enumerate(range(0, len(pairs), chunk))
    ]
    return [s for part in ray.get(futs) for s in part]
