"""crawler_ray — a Ray-Data-native crawl / data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of shriphani/crawler (the CMU "Discussions Crawler",
reference at /root/reference) expressed as ``ray.data.Dataset``
pipelines: ``map_batches`` over zero-copy Arrow batches, actor pools
for stateful stages (fetcher politeness, URL-seen bloom shards, leaf
scorers), and groupby/sort/shuffle for the wide steps.

Layout:
  schemas     — explicit pyarrow schemas for every logical table
  functions/  — pure vectorizable kernels (urlnorm, shingles, text stats,
                similarity, features)
  dom         — stdlib HTML parser + DOM-path/XPath generalization
                (semantics of reference src/crawler/dom.clj)
  synth/      — deterministic synthetic web-graph generator (the sandbox
                substitute for live HTTP; FIXTURES.md §1)
  sources/    — readers/writers (lance-or-parquet abstraction)
  stages/     — map_batches stages: extract, fetch, seen, leaf, dedup, ann
  state/      — bloom/cuckoo filters, frontier, checkpoint/lineage
  pipelines/  — end-to-end crawl loop + pure-Python conformance oracle
"""

__version__ = "0.1.0"
