"""CLI — the reference's main.clj modes re-expressed
(``--structure-driven / --discussion-forum / --execute /
--execute-budget / --corpus-to-json``, main.clj:17-38, 307-352) plus
``--bfs`` and ``--seed-replay``.

The synthetic site graph stands in for the live web: pass ``--graph``
(a parquet file of SITE_PAGES rows, e.g. written by
``python -m crawler_ray.cli gen-graph``) or let the CLI generate one.

Owns the Ray session (guarded init; the library never calls ray.init).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def _load_graph(args):
    import pyarrow.parquet as pq

    from crawler_ray import synth

    if args.graph:
        return pq.read_table(args.graph)
    return synth.generate_site_graph(
        num_hosts=args.hosts, base_pages=args.pages_per_host, seed=args.seed
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="crawler_ray", description=__doc__)
    p.add_argument("mode", choices=[
        "bfs", "structure-driven", "discussion-forum", "execute",
        "execute-budget", "seed-replay", "gen-graph", "corpus-to-json",
        "fix-model", "prep-data", "compact", "ingest", "diff",
        "corpus-to-warc", "warc-to-corpus",
    ])
    p.add_argument("--warc-dir", help="WARC directory (warc-to-corpus input)")
    p.add_argument("--old", help="old checkpoint dir (diff)")
    p.add_argument("--new", help="new checkpoint dir (diff)")
    p.add_argument("--target-rows", type=int, default=1_000_000,
                   help="rows per output file (compact)")
    p.add_argument("--round-id", type=int, default=1,
                   help="ingest round number (idempotent per round)")
    p.add_argument("--input", help="documents parquet (prep-data)")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-tokens", type=int, default=100_000)
    p.add_argument("--neardup-threshold", type=float, default=0.9)
    p.add_argument("--graph", help="SITE_PAGES parquet file")
    p.add_argument("--hosts", type=int, default=4)
    p.add_argument("--pages-per-host", type=int, default=40)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--start", help="seed URL (default: every host's index page 1)")
    p.add_argument("--example", help="example leaf URL (structure-driven)")
    p.add_argument("--model", help="model JSON path (execute modes)")
    p.add_argument("--num-leaves", type=int, default=300)   # main.clj:24-28
    p.add_argument("--budget", type=int, default=1000)      # main.clj:29-33
    p.add_argument("--out", default="/tmp/crawler_ray_out")
    p.add_argument("--checkpoint-dir")
    p.add_argument("--num-cpus", type=int, default=8)
    p.add_argument("--politeness-ms", type=int, default=0)
    p.add_argument("--transport", choices=["synthetic", "http"], default="synthetic",
                   help="http = crawl the REAL network via HTTPTransport "
                        "(seeds must be reachable URLs; --graph is ignored)")
    p.add_argument("--seeds-from-sitemap", action="store_true",
                   help="expand --start into the host's sitemap URLs "
                        "(robots.txt Sitemap: lines, fallback /sitemap.xml)")
    args = p.parse_args(argv)

    from crawler_ray import synth

    if args.mode == "gen-graph":
        import pyarrow.parquet as pq

        pages = _load_graph(args)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        pq.write_table(pages, args.out)
        print(json.dumps({"pages": pages.num_rows, "out": args.out}))
        return 0

    if args.mode == "prep-data":
        # LLM training-data preparation over a documents parquet:
        # quality filter → exact dedup → near-dup removal → partitioned
        # parquet export + stats (pipelines/dataprep.py)
        if not args.input:
            p.error("prep-data requires --input (documents parquet)")
        _init_ray(args.num_cpus)
        import ray
        import ray.data as rd

        from crawler_ray.pipelines.dataprep import prepare_training_data

        try:
            docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
            out_dir = os.path.join(args.out, "kept")
            _, _, stats = prepare_training_data(
                docs,
                min_tokens=args.min_tokens,
                max_tokens=args.max_tokens,
                neardup_threshold=args.neardup_threshold,
                out_dir=out_dir,
            )
            print(json.dumps({**stats, "out": out_dir}))
            return 0
        finally:
            ray.shutdown()

    if args.mode == "ingest":
        # incremental corpus ingest: append --input docs as --round-id,
        # exact-deduped against everything already in --out
        if not args.input:
            p.error("ingest requires --input (documents parquet)")
        _init_ray(args.num_cpus)
        import ray
        import ray.data as rd

        from crawler_ray.pipelines.ingest import incremental_ingest

        try:
            docs = rd.read_parquet(args.input)
            stats = incremental_ingest(docs, args.out, args.round_id)
            print(json.dumps({**stats, "out": args.out}))
            return 0
        finally:
            ray.shutdown()

    if args.mode == "diff":
        # incremental recrawl diff: classify every URL of two crawl
        # checkpoints added/removed/changed/unchanged by span-content
        # fingerprint (pipelines/diff.py; spans never cross the shuffle)
        if not args.old or not args.new:
            p.error("diff requires --old and --new (checkpoint dirs)")
        _init_ray(args.num_cpus)
        import ray

        from crawler_ray.pipelines.diff import diff_checkpoints

        try:
            ds = diff_checkpoints(args.old, args.new)
            os.makedirs(args.out, exist_ok=True)
            out_dir = os.path.join(args.out, "diff")
            ds = ds.materialize()
            counts: dict[str, int] = {}
            for b in ds.iter_batches(batch_format="pyarrow"):
                import pyarrow.compute as pc

                vc = pc.value_counts(b.column("status"))
                for sv, cv in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
                    counts[sv] = counts.get(sv, 0) + cv
            ds.write_parquet(out_dir)
            print(json.dumps({**counts, "rows": ds.count(), "out": out_dir}))
            return 0
        finally:
            ray.shutdown()

    if args.mode == "compact":
        # table maintenance: merge fragmented parquet parts (one per
        # worker per crawl round) into target-size files
        if not args.input:
            p.error("compact requires --input (fragmented parquet dir)")
        _init_ray(args.num_cpus)
        import ray

        from crawler_ray.pipelines.compact import compact_dir

        try:
            stats = compact_dir(args.input, args.out, target_rows_per_file=args.target_rows)
            print(json.dumps({**stats, "out": args.out}))
            return 0
        finally:
            ray.shutdown()

    pages = _load_graph(args)
    seeds = [args.start] if args.start else synth.seeds_for(pages)
    os.makedirs(args.out, exist_ok=True)

    if args.mode == "corpus-to-json":
        # corpus EDN → JSON analog (corpus.clj:82-90): checkpointed
        # corpus parquet → JSON lines
        from crawler_ray.state.checkpoint import CheckpointStore

        corpus = CheckpointStore(args.checkpoint_dir).corpus_table()
        out = os.path.join(args.out, "corpus.jsonl")
        with open(out, "w") as f:
            for row in corpus.select(["url", "depth", "status", "is_leaf"]).to_pylist():
                f.write(json.dumps(row) + "\n")
        print(json.dumps({"rows": corpus.num_rows, "out": out}))
        return 0

    if args.mode == "fix-model":
        # main.clj:347-349 --fix-model: load a learned model + the
        # crawl's checkpointed corpus (url/src_url/is_leaf stand in for
        # the trace) and repair refinements against observed outcomes
        if not args.model or not args.checkpoint_dir:
            p.error("fix-model requires --model and --checkpoint-dir")
        from crawler_ray.pipelines.model import fix_model
        from crawler_ray.state.checkpoint import CheckpointStore

        with open(args.model) as f:
            model = json.load(f)
        corpus = CheckpointStore(args.checkpoint_dir).corpus_table()
        trace = corpus.select(["url", "src_url", "is_leaf"]).to_pylist()
        fixed = fix_model(model, trace, pages)
        mp = os.path.join(args.out, "model_fixed.json")
        with open(mp, "w") as f:
            json.dump(fixed, f, indent=1)
        print(json.dumps({"fixed": True, "actions": len(fixed["actions"]), "out": mp}))
        return 0

    _init_ray(args.num_cpus)
    import ray

    try:
        import ray.data  # noqa: F401 (ensure the data subpackage is bound)

        if args.mode == "corpus-to-warc":
            # checkpointed crawl corpus → WET-style WARC conversion
            # records (extracted text, one gzip member per record; the
            # Common Crawl WET convention) — the interchange twin of
            # corpus-to-json
            if not args.checkpoint_dir:
                p.error("corpus-to-warc requires --checkpoint-dir")
            import pyarrow as pa

            from crawler_ray.sources.warc import write_warc_corpus
            from crawler_ray.state.checkpoint import CheckpointStore

            corpus = CheckpointStore(args.checkpoint_dir).corpus_table()

            def to_wet(t: pa.Table) -> pa.Table:
                payloads = []
                for spans in t.column("spans").to_pylist():
                    text = "\n".join(
                        s["text"] for s in spans if s["kind"] == "text"
                    )
                    payloads.append(text.encode("utf-8"))
                return pa.table(
                    {
                        "url": t.column("url"),
                        "payload": pa.array(payloads, type=pa.large_binary()),
                    }
                )

            wet_dir = os.path.join(args.out, "wet")
            os.makedirs(wet_dir, exist_ok=True)
            wet = ray.data.from_arrow(corpus.select(["url", "spans"])).map_batches(
                to_wet, batch_format="pyarrow"
            )
            stats = write_warc_corpus(wet, wet_dir, warc_type="conversion").to_pandas()
            print(json.dumps({
                "records": int(stats["n_records"].sum()),
                "files": len(stats),
                "out": wet_dir,
            }))
            return 0

        if args.mode == "warc-to-corpus":
            # WARC archive(s) → documents parquet (doc_id + a single
            # text span per record): bring third-party crawl archives
            # into every pipeline that consumes the documents schema
            if not args.warc_dir:
                p.error("warc-to-corpus requires --warc-dir")
            import pyarrow as pa

            from crawler_ray import schemas
            from crawler_ray.sources.warc import read_warc_dataset

            def to_docs(t: pa.Table) -> pa.Table:
                spans = [
                    [{
                        "kind": "text",
                        "text": bytes(pl).decode("utf-8", errors="replace"),
                        "media_ref": "",
                        "offset": 0,
                    }]
                    for pl in t.column("payload").to_pylist()
                ]
                return pa.table(
                    {
                        "doc_id": t.column("url"),
                        "spans": pa.array(spans, type=schemas.SPANS_TYPE),
                    }
                )

            docs_dir = os.path.join(args.out, "documents")
            ds = read_warc_dataset(args.warc_dir).map_batches(
                to_docs, batch_format="pyarrow"
            )
            ds.write_parquet(docs_dir)
            n = ray.data.read_parquet(docs_dir).count()
            print(json.dumps({"documents": n, "out": docs_dir}))
            return 0

        if args.mode == "seed-replay":
            from crawler_ray.pipelines.seedlist import replay_seed_list

            ds = replay_seed_list(
                pages, seeds, out_dir=os.path.join(args.out, "documents"),
                politeness_ms=args.politeness_ms,
            )
            print(json.dumps({"documents": ds.count(), "out": args.out}))
            return 0

        from crawler_ray.pipelines.crawl import CrawlConfig, crawl

        if args.mode in ("bfs", "structure-driven", "discussion-forum"):
            leaf_fn = None
            if args.mode == "structure-driven":
                if not args.example:
                    p.error("--structure-driven requires --example")
                idx = pages.column("doc_id").to_pylist().index(args.example)
                example_html = pages.column("html")[idx].as_py()
                from crawler_ray.pipelines.execute import structure_driven_leaf_fn

                leaf_fn = structure_driven_leaf_fn(example_html)
            transport_factory = None
            if args.transport == "http":
                from crawler_ray.stages.fetch import HTTPTransport

                transport_factory = HTTPTransport
                if not args.start:
                    p.error("--transport http requires --start (a live seed URL)")
                if args.seeds_from_sitemap:
                    from crawler_ray.sources.sitemap import discover_seeds

                    found = discover_seeds(args.start, HTTPTransport())
                    seeds = found or seeds  # fall back to --start alone
            cfg = CrawlConfig(
                num_leaves=args.num_leaves,
                budget=args.budget,
                politeness_ms=args.politeness_ms,
                checkpoint_dir=args.checkpoint_dir,
                leaf_fn=leaf_fn,
                transport_factory=transport_factory,
            )
            res = crawl(None if transport_factory else pages, seeds, cfg)
            summary = {k: v for k, v in res.metrics.items()}
            if args.mode == "discussion-forum":
                # learn phase → dump the model (main.clj dump-state-model-corpus)
                from crawler_ray.pipelines.model import learn_model

                model = learn_model(res.trace, pages)
                mp = os.path.join(args.out, "model.json")
                with open(mp, "w") as f:
                    json.dump(model, f, indent=1)
                # reference-interop twin: the same model in the EDN
                # fixed-model shape crawler.model/read-model loads
                from crawler_ray.sources.edn import write_model_file

                write_model_file(model, os.path.join(args.out, "model.model"))
                summary["model"] = mp
                summary["actions"] = len(model["actions"])
            print(json.dumps(summary))
            return 0

        if args.mode in ("execute", "execute-budget"):
            if not args.model:
                p.error("execute modes require --model")
            if args.model.endswith((".model", ".edn")):
                # reference-shipped EDN artifact (model.clj:14-17 read-model)
                from crawler_ray.sources.edn import read_model_file

                model = read_model_file(args.model)
            else:
                with open(args.model) as f:
                    model = json.load(f)
            from crawler_ray.pipelines.execute import execute_model

            budget = args.budget if args.mode == "execute-budget" else 10**9
            res = execute_model(pages, seeds, model, budget=budget)
            cp = os.path.join(args.out, "harvest.jsonl")
            with open(cp, "w") as f:
                for t in res.trace:
                    f.write(json.dumps(t) + "\n")
            print(
                json.dumps(
                    {"harvested": len(res.harvested), "fetches": len(res.trace), "out": cp}
                )
            )
            return 0
    finally:
        ray.shutdown()
    return 1


if __name__ == "__main__":
    sys.exit(main())
