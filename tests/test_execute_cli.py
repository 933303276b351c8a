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


def test_seed_replay_spans_match_golden(ray_session, tmp_path):
    """Seed-list replay emits the golden span sequences (input_hint
    invariant on the streaming pipeline too)."""
    from crawler_ray.pipelines.seedlist import replay_seed_list

    pages = synth.generate_site_graph(num_hosts=2, base_pages=24, seed=13)
    rows = {r["doc_id"]: r for r in pages.to_pylist()}
    urls = [u for u, r in rows.items() if r["html"]][:20]
    ds = replay_seed_list(pages, urls)
    for rec in ds.take_all():
        assert rec["spans"] == rows[rec["doc_id"]]["spans"], rec["doc_id"]


def test_seeded_ray_sampling_deterministic(ray_session):
    """Seeded Ray-native sampling (the random-take analog at Dataset
    level, SURVEY.md §2.7): same seed → same sample/shuffle."""
    import ray.data as rd

    # seeded shuffle/sample are deterministic only for an IDENTICAL
    # block layout; range() block splits vary with session state, so
    # pin override_num_blocks (a long pytest session flaked here once)
    ds = rd.range(1000, override_num_blocks=8)
    a = sorted(r["id"] for r in ds.random_sample(0.05, seed=7).take_all())
    b = sorted(
        r["id"]
        for r in rd.range(1000, override_num_blocks=8)
        .random_sample(0.05, seed=7)
        .take_all()
    )
    assert a == b and 20 <= len(a) <= 90
    s1 = [
        r["id"]
        for r in rd.range(50, override_num_blocks=4).random_shuffle(seed=3).take_all()
    ]
    s2 = [
        r["id"]
        for r in rd.range(50, override_num_blocks=4).random_shuffle(seed=3).take_all()
    ]
    assert s1 == s2 and s1 != list(range(50))


def test_export_corpus_partitioned(ray_session, tmp_path):
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl
    from crawler_ray.state.checkpoint import CheckpointStore

    pages = synth.generate_site_graph(num_hosts=3, base_pages=24, seed=9)
    seeds = synth.seeds_for(pages)
    ck = str(tmp_path / "ck")
    res = crawl(pages, seeds, CrawlConfig(checkpoint_dir=ck))
    out = str(tmp_path / "corpus_by_host")
    paths = CheckpointStore(ck).export_corpus_partitioned(out, n_partitions=8)
    import pyarrow.parquet as pq

    total = sum(pq.read_metadata(p).num_rows for p in paths)
    assert total == len(res.trace)
