"""CLI: the modes that don't own a Ray session (gen-graph,
corpus-to-json) run in-process; the crawl modes are smoked end-to-end
as subprocesses in CI-style runs (they init/shutdown their own Ray)."""

import json
import os
import subprocess
import sys

from crawler_ray import cli


def test_gen_graph_and_corpus_to_json(tmp_path, ray_session):
    graph = str(tmp_path / "graph.parquet")
    rc = cli.main(["gen-graph", "--hosts", "2", "--pages-per-host", "16", "--out", graph])
    assert rc == 0 and os.path.exists(graph)

    # produce a checkpointed crawl for corpus-to-json (in-process crawl,
    # reusing the session fixture's Ray)
    import pyarrow.parquet as pq

    from crawler_ray import synth
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl

    pages = pq.read_table(graph)
    ck = str(tmp_path / "ck")
    crawl(pages, synth.seeds_for(pages), CrawlConfig(checkpoint_dir=ck))

    out = str(tmp_path / "json")
    rc = cli.main(
        ["corpus-to-json", "--graph", graph, "--checkpoint-dir", ck, "--out", out]
    )
    assert rc == 0
    lines = open(os.path.join(out, "corpus.jsonl")).read().splitlines()
    assert len(lines) > 10
    row = json.loads(lines[0])
    assert set(row) == {"url", "depth", "status", "is_leaf"}


def test_cli_bfs_subprocess(tmp_path):
    """Full bfs mode in a subprocess (owns its Ray session)."""
    out = str(tmp_path / "bfs")
    r = subprocess.run(
        [sys.executable, "-m", "crawler_ray.cli", "bfs", "--hosts", "2",
         "--pages-per-host", "16", "--num-cpus", "4", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
    )
    assert r.returncode == 0, r.stderr[-500:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["fetched"] > 10 and summary["leaves"] > 0


def test_fix_model_cli(tmp_path, ray_session):
    """fix-model mode round-trips a learned model through the CLI using
    the checkpointed corpus as the observed trace (main.clj:347-349)."""
    import pyarrow.parquet as pq

    from crawler_ray import synth
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl
    from crawler_ray.pipelines.model import learn_model

    graph = str(tmp_path / "graph.parquet")
    rc = cli.main(["gen-graph", "--hosts", "2", "--pages-per-host", "20", "--out", graph])
    assert rc == 0
    pages = pq.read_table(graph)
    ck = str(tmp_path / "ck")
    res = crawl(pages, synth.seeds_for(pages), CrawlConfig(checkpoint_dir=ck))
    model = learn_model(res.trace, pages)
    mp = str(tmp_path / "model.json")
    with open(mp, "w") as f:
        json.dump(model, f)

    out = str(tmp_path / "fixed")
    os.makedirs(out, exist_ok=True)
    rc = cli.main(["fix-model", "--graph", graph, "--model", mp,
                   "--checkpoint-dir", ck, "--out", out])
    assert rc == 0
    fixed = json.load(open(os.path.join(out, "model_fixed.json")))
    assert fixed["fixed"] is True
    assert "actions" in fixed and "pagination" in fixed


def test_prep_data_cli_subprocess(tmp_path):
    """prep-data mode end-to-end in a subprocess (owns its Ray session):
    documents parquet in → kept partitioned parquet + stats JSON out."""
    out = str(tmp_path / "prep")
    r = subprocess.run(
        [sys.executable, "-m", "crawler_ray.cli", "prep-data",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--num-cpus", "4", "--out", out],
        capture_output=True, text=True, cwd="/root/repo", timeout=240,
    )
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_kept"] > 100 and summary["total_tokens"] > 1000
    import pyarrow.parquet as pq

    kept = pq.read_table(os.path.join(out, "kept"))
    assert kept.num_rows == summary["n_kept"]


def test_diff_cli(tmp_path, ray_session):
    """diff mode: two in-process crawls (edited leaf between them), then
    the CLI classifies the edit + its redirect alias as changed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_ray import synth
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl

    pages = synth.generate_site_graph(num_hosts=2, base_pages=18, seed=6,
                                      leaf_text_words=25, leaves_per_index=5)
    ids = pages.column("doc_id").to_pylist()
    leaf = pages.column("is_leaf").to_pylist()
    target = [u for u, lf in zip(ids, leaf) if lf][0]
    htmls = pages.column("html").to_pylist()
    pages2 = pages.set_column(
        pages.schema.get_field_index("html"), "html",
        pa.array([h.replace("</body>", "<p>edited</p></body>") if u == target else h
                  for u, h in zip(ids, htmls)]),
    )
    ck_a, ck_b = str(tmp_path / "a"), str(tmp_path / "b")
    for pg, ck in [(pages, ck_a), (pages2, ck_b)]:
        crawl(pg, synth.seeds_for(pg),
              CrawlConfig(n_seen_shards=2, fetch_concurrency=2, checkpoint_dir=ck))

    out = str(tmp_path / "out")
    rc = cli.main(["diff", "--old", ck_a, "--new", ck_b, "--out", out, "--num-cpus", "4"])
    assert rc == 0
    parts = pq.read_table(os.path.join(out, "diff"))
    st = dict(zip(parts.column("url").to_pylist(), parts.column("status").to_pylist()))
    assert st[target] == "changed"
    rto = dict(zip(ids, pages.column("redirect_to").to_pylist()))
    for u, s in st.items():
        want = "changed" if (u == target or rto.get(u) == target) else "unchanged"
        assert s == want, (u, s)
