"""Seed-list replay — the gplus downloader reimagined as one Ray Data
pipeline (reference ``gplus/core.clj:21-40``: read link file → fetch
each with UA header + 3 s sleep → write bodies).

Here: ``read_text(seeds)`` → ``map_batches(Fetcher actor pool)`` with
per-host politeness clocks → span extraction → partitioned parquet
sink.  This is the pure streaming (non-iterative) fetch shape, so it
uses the Dataset API end-to-end — no BSP loop needed."""
from __future__ import annotations

import pyarrow as pa
import ray

from ..functions.urlnorm import url_host
from ..stages.extract import extract_spans_batch
from ..stages.fetch import Fetcher, PolitenessClock


def replay_seed_list(
    pages: pa.Table,
    seed_urls: list[str],
    out_dir: str | None = None,
    politeness_ms: int = 0,
    concurrency: int = 4,
    batch_size: int = 64,
):
    """Fetch every seed URL once, emit interleaved-span documents.

    Returns the documents Dataset (and writes partitioned parquet when
    ``out_dir`` is given — one directory, many part files → a rerun can
    skip finished partitions)."""
    import ray.data as rd

    graph_ref = ray.put(pages)
    politeness = (
        [PolitenessClock.options(num_cpus=0).remote(politeness_ms) for _ in range(2)]
        if politeness_ms > 0
        else []
    )
    frontier = pa.table(
        {
            "url": pa.array(seed_urls, type=pa.string()),
            "host": pa.array([url_host(u) for u in seed_urls], type=pa.string()),
            "depth": pa.array([0] * len(seed_urls), type=pa.int32()),
            "discovery_seq": pa.array(range(len(seed_urls)), type=pa.int64()),
            "src_url": pa.array([""] * len(seed_urls), type=pa.string()),
            "src_xpath": pa.array([[] for _ in seed_urls], type=pa.list_(pa.string())),
        }
    )
    ds = (
        rd.from_arrow(frontier)
        .map_batches(
            Fetcher,
            fn_constructor_args=(graph_ref, politeness, politeness_ms),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        .map_batches(extract_spans_batch, batch_format="pyarrow")
    )
    if out_dir:
        ds = ds.materialize()
        ds.write_parquet(out_dir)
    return ds
