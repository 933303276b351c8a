"""Execution driver (plan + budget fold), extension hooks, seed replay."""

from crawler_ray import synth
from crawler_ray.pipelines.execute import (
    discussion_forum_stop,
    execute_model,
    plan,
    structure_driven_leaf_fn,
)
from crawler_ray.pipelines.model import learn_model
from crawler_ray.pipelines.oracle import crawl_bfs_oracle


def _learned():
    pages = synth.generate_site_graph(num_hosts=2, base_pages=36, seed=21)
    seeds = synth.seeds_for(pages)
    oracle = crawl_bfs_oracle(pages, seeds)
    return pages, seeds, learn_model(oracle.trace, pages)


def test_plan_and_budget_fold():
    pages, seeds, model = _learned()
    ordered = plan(model)
    assert all(
        len(a["action_seq"]) <= len(b["action_seq"])
        for a, b in zip(ordered, ordered[1:])
    )
    full = execute_model(pages, seeds, model, budget=10**6)
    assert len(full.harvested) > 10
    capped = execute_model(pages, seeds, model, budget=20)
    assert len(capped.trace) <= 20
    assert set(capped.harvested) <= set(full.harvested)


def test_structure_driven_leaf_hook(ray_session):
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl

    pages = synth.generate_site_graph(num_hosts=2, base_pages=24, seed=8)
    seeds = synth.seeds_for(pages)
    rows = pages.to_pylist()
    example = next(r for r in rows if r["is_leaf"])
    cfg = CrawlConfig(leaf_fn=structure_driven_leaf_fn(example["html"], 0.8))
    res = crawl(pages, seeds, cfg)
    leaf_urls = {t["url"] for t in res.trace if t["is_leaf"]}
    true_leaves = {r["doc_id"] for r in rows if r["is_leaf"]}
    # structural-similarity leaf? finds the leaf class (all leaves share
    # the template family of the example)
    fetched_true = true_leaves & {t["url"] for t in res.trace}
    assert fetched_true and fetched_true <= leaf_urls


def test_stop_hook(ray_session):
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl

    pages = synth.generate_site_graph(num_hosts=2, base_pages=24, seed=8)
    seeds = synth.seeds_for(pages)
    res = crawl(pages, seeds, CrawlConfig(stop_fn=discussion_forum_stop(5)))
    # stops at wave granularity once ≥5 leaves observed
    assert res.metrics["leaves"] >= 5
    full = crawl(pages, seeds, CrawlConfig())
    assert res.metrics["fetched"] <= full.metrics["fetched"]


def test_seed_replay(ray_session, tmp_path):
    from crawler_ray.pipelines.seedlist import replay_seed_list

    pages = synth.generate_site_graph(num_hosts=3, base_pages=24, seed=2)
    urls = pages.column("doc_id").to_pylist()[:30]
    out = str(tmp_path / "docs")
    ds = replay_seed_list(pages, urls, out_dir=out)
    assert ds.count() == 30
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(out + "/*.parquet")
    assert files
    t = pq.read_table(files[0])
    assert "doc_id" in t.column_names and "spans" in t.column_names
