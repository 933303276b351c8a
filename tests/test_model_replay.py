"""Model learning + crawl-model replay conformance.

Learn a model from a BFS learn-crawl over the synthetic graph, then
replay it: the sequential replay is the semantic reference
(crawl.clj:246-530 two-queue loop); the parallel replay must reproduce
its total order at wave=1 and its harvested/visited sets wave-parallel.
"""

import pytest

from crawler_ray import synth
from crawler_ray.pipelines.model import learn_model, remove_pagination_from_actions
from crawler_ray.pipelines.oracle import crawl_bfs_oracle
from crawler_ray.pipelines.replay import replay_parallel, replay_sequential


@pytest.fixture(scope="module")
def learned():
    pages = synth.generate_site_graph(num_hosts=2, base_pages=40, seed=42)
    seeds = synth.seeds_for(pages)
    oracle = crawl_bfs_oracle(pages, seeds)
    model = learn_model(oracle.trace, pages)
    return pages, seeds, model


def test_model_structure(learned):
    pages, seeds, model = learned
    post_xp = "//html/body/div[contains(@class,'content')]/a[contains(@class,'post')]"
    pager_xp = "//html/body/div[contains(@class,'pager')]/a[contains(@class,'page')]"
    # the dominant leaf action is the single-step post-link path
    top = max(model["actions"], key=lambda a: a["count"])
    assert top["action_seq"] == [post_xp]
    # pagination learned at the seed level with the pager xpath
    assert model["pagination"]["paging_actions"].get("") == pager_xp
    # plan ordering: shortest action sequences first
    lens = [len(a["action_seq"]) for a in model["actions"]]
    assert lens == sorted(lens)
    # yields positive; paginated root path gets the ×10 multiplier
    assert top["yield"] >= 10


def test_replay_harvests_all_leaves(learned):
    pages, seeds, model = learned
    res = replay_sequential(pages, seeds, model)
    leaf_urls = {
        r["doc_id"] for r in pages.to_pylist() if r["is_leaf"]
    }
    harvested = set(res.harvested)
    # every generator leaf is harvested (pagination traversal reaches
    # the leaves hanging off index?page≥2) — aliases may add extras
    missing = leaf_urls - harvested
    assert not missing, f"missed {len(missing)}: {sorted(missing)[:5]}"
    # replay never touches robots-denied or unrelated pages
    assert all("/private/" not in u for u in harvested)


def test_parallel_wave1_order_equals_sequential(learned):
    pages, seeds, model = learned
    seq = replay_sequential(pages, seeds, model)
    par = replay_parallel(pages, seeds, model, wave_size=1)
    assert [t["url"] for t in par.trace] == [t["url"] for t in seq.trace]
    assert par.harvested == seq.harvested


def test_parallel_set_equality(learned):
    pages, seeds, model = learned
    seq = replay_sequential(pages, seeds, model)
    par = replay_parallel(pages, seeds, model, wave_size=None)
    assert set(par.harvested) == set(seq.harvested)
    assert par.visited == seq.visited
    assert len(par.trace) == len(seq.trace)


def test_budget_stop(learned):
    pages, seeds, model = learned
    res = replay_sequential(pages, seeds, model, budget=7)
    assert len(res.trace) == 7


def test_remove_pagination_from_actions(learned):
    pages, seeds, model = learned
    fixed = remove_pagination_from_actions(model)
    pag = model["pagination"]["paging_actions"]
    for a in fixed["actions"]:
        key = "␟".join(a["action_seq"])
        assert key not in {
            (s + "␟" + x if s else x) for s, x in pag.items()
        }


def test_refinement_learning_and_enforcement():
    """Handcrafted site: two positional variants of one generalized
    xpath — position 1 leads to leaf pages, position 2 to hub pages.
    The learned refinement must avoid position 2 and the replay must
    obey it."""
    import pyarrow as pa

    from crawler_ray import schemas

    def page(url, html):
        return {
            "doc_id": url, "host": "h.test", "html": html, "spans": [],
            "is_leaf": False, "disallowed": False, "redirect_to": "",
        }

    hub_links = "\n".join(
        f'<a class="item" href="/hub{i}">hub {i}</a>' for i in range(8)
    )
    root_html = f"""<html>
<body>
<div class="list">
<a class="item" href="/leafA">to leaf</a>
<a class="item" href="/hub0">to hub</a>
</div>
</body>
</html>"""
    leaf_html = """<html>
<body>
<p>long leaf text one two three four five six seven eight nine ten</p>
</body>
</html>"""
    hub_html = f"""<html>
<body>
<div class="list">
{hub_links}
</div>
</body>
</html>"""
    rows = [page("http://h.test/", root_html), page("http://h.test/leafA", leaf_html)]
    for i in range(8):
        rows.append(page(f"http://h.test/hub{i}", hub_html))
    pages = pa.Table.from_pylist(rows, schema=schemas.SITE_PAGES)

    oracle = crawl_bfs_oracle(pages, ["http://h.test/"])
    model = learn_model(oracle.trace, pages)
    item_xp = "//html/body/div[contains(@class,'list')]/a[contains(@class,'item')]"
    act = next(a for a in model["actions"] if a["action_seq"] == [item_xp])
    ref = act["refined"].get(item_xp)
    assert ref is not None
    assert any("[1]" in p for p in ref["only"])   # position 1 → leaf
    assert any("[2]" in p for p in ref["avoid"])  # position 2 → hub

    res = replay_sequential(pages, ["http://h.test/"], model)
    assert res.harvested == ["http://h.test/leafA"]
    # the avoided hub position was never fetched
    assert all("/hub" not in t["url"] for t in res.trace)


def test_distributed_leaf_paths_match_driver_side(ray_session, tmp_path, learned):
    """The Ray-Data iterative-parent-join model build equals the
    driver-side learn_model leaf-path frequencies."""
    from collections import Counter

    from crawler_ray.pipelines.crawl import CrawlConfig, crawl
    from crawler_ray.pipelines.model import learn_leaf_paths_distributed, learn_model

    pages, seeds, _ = learned
    ck = str(tmp_path / "ck")
    res = crawl(pages, seeds, CrawlConfig(checkpoint_dir=ck))
    dist = learn_leaf_paths_distributed(ck)
    got = dict(zip(dist["action_path_key"], dist["count"]))
    model = learn_model(res.trace, pages)
    want = {"␟".join(a["action_seq"]): a["count"] for a in model["actions"]}
    assert got == want, (got, want)


def test_distributed_link_extraction_matches_serial(ray_session, learned):
    """trace_link_maps: the actor-pool DOM-parse fan-out produces the
    exact (parent, url) → xpath/text/pos maps of the serial loop, and a
    full learn_model run is identical either way."""
    from crawler_ray.pipelines.model import learn_model, trace_link_maps
    from crawler_ray.pipelines.oracle import crawl_bfs_oracle

    pages, seeds, _ = learned
    oracle = crawl_bfs_oracle(pages, seeds)
    idx = {u: i for i, u in enumerate(pages.column("doc_id").to_pylist())}
    bodies = pages.column("html").to_pylist()
    body_of = {
        t["url"]: bodies[idx[t["url"]]] if t["url"] in idx else ""
        for t in oracle.trace
    }
    urls = [t["url"] for t in oracle.trace]
    ser = trace_link_maps(urls, pages, body_of, distributed=False)
    dist = trace_link_maps(urls, pages, body_of, distributed=True)
    assert ser == dist
    m_ser = learn_model(oracle.trace, pages, distributed=False)
    m_dist = learn_model(oracle.trace, pages, distributed=True)
    assert m_ser == m_dist


def test_per_host_replay_exact_order(ray_session, learned):
    """replay_per_host: each host's trace equals the global sequential
    replay's per-host projection EXACTLY (order included), and the
    union of harvests matches."""
    from collections import defaultdict

    from crawler_ray.pipelines.replay import replay_per_host, replay_sequential

    pages, seeds, model = learned
    seq = replay_sequential(pages, seeds, model)
    per = replay_per_host(pages, seeds, model)
    assert len(per) >= 2  # multi-host fixture

    from crawler_ray.functions.urlnorm import url_host

    proj = defaultdict(list)
    for t in seq.trace:
        proj[url_host(t["url"])].append((t["url"], t["status"], t["is_leaf"]))
    for host, res in per.items():
        got = [(t["url"], t["status"], t["is_leaf"]) for t in res.trace]
        assert got == proj[host], host
    assert set().union(*(set(r.harvested) for r in per.values())) == set(seq.harvested)
