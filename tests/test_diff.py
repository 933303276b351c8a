"""Corpus snapshot diff over REAL crawl checkpoints (pipelines/diff.py;
the SQL-oracle-checked shuffle twin is queries.py::snapshot_diff)."""

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from crawler_ray import synth
from crawler_ray.pipelines.crawl import CrawlConfig, crawl
from crawler_ray.pipelines.diff import diff_checkpoints


def _crawl_to(pages, tmp_path, name):
    seeds = synth.seeds_for(pages)
    d = str(tmp_path / name)
    cfg = CrawlConfig(wave_size=None, n_seen_shards=2, fetch_concurrency=2,
                      checkpoint_dir=d, snapshot_every=100)
    crawl(pages, seeds, cfg)
    return d


def test_diff_checkpoints_flags_exactly_the_edited_pages(ray_session, tmp_path):
    pages = synth.generate_site_graph(num_hosts=3, base_pages=30, seed=11,
                                      leaf_text_words=40, leaves_per_index=8)
    dir_a = _crawl_to(pages, tmp_path, "ckpt_a")

    # recrawl after 3 specific leaves change content (span-visible edit)
    ids = pages.column("doc_id").to_pylist()
    htmls = pages.column("html").to_pylist()
    leaf_mask = pages.column("is_leaf").to_pylist()
    edited = [u for u, lf in zip(ids, leaf_mask) if lf][:3]
    htmls2 = [
        h.replace("</body>", "<p>revised in the second snapshot</p></body>")
        if u in edited
        else h
        for u, h in zip(ids, htmls)
    ]
    pages2 = pages.set_column(
        pages.schema.get_field_index("html"), "html", pa.array(htmls2)
    )
    dir_b = _crawl_to(pages2, tmp_path, "ckpt_b")

    out = diff_checkpoints(dir_a, dir_b).to_pandas()
    by = out.set_index("url")["status"]
    # redirect-alias rows carry their TARGET's content, so an edited
    # leaf also changes every alias resolving to it — the diff is
    # content-true, not url-pattern-true
    rto = pages.column("redirect_to").to_pylist()
    expect_changed = {
        u for u, rt in zip(ids, rto) if u in edited or rt in edited
    } & set(by.index)
    assert set(by[by == "changed"].index) == expect_changed
    assert (by[~by.index.isin(expect_changed)] == "unchanged").all()
    assert not (by == "added").any() and not (by == "removed").any()
    # both crawls cover every page URL (the corpus also carries media /
    # status rows beyond the pages table, diffed like any other row)
    assert set(ids) <= set(by.index)


def test_diff_round_prefix_shows_later_rounds_as_added(ray_session, tmp_path):
    pages = synth.generate_site_graph(num_hosts=2, base_pages=25, seed=12,
                                      leaf_text_words=30, leaves_per_index=6)
    d = _crawl_to(pages, tmp_path, "ckpt")
    from crawler_ray.state.checkpoint import CheckpointStore

    first = CheckpointStore(d).corpus_table(upto_round=0)
    out = diff_checkpoints(d, d, upto_round_old=0).to_pandas()
    by = out.set_index("url")["status"]
    early = set(first.column("url").to_pylist())
    assert set(by[by == "unchanged"].index) == early
    assert set(by[by == "added"].index) == set(by.index) - early
    assert not (by == "changed").any() and not (by == "removed").any()
