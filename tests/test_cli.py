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
