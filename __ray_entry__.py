"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in crawler_ray) calls ``ray.init()`` / ``ray.shutdown()``.

``entry()``   — flagship pipeline over /root/testdata/sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2),
                registry in crawler_ray/queries.py.
``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible query.
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: derive the deterministic site graph from the driver's
    documents table, run the span-extraction + link-explosion pipeline
    (the crawl's stateless core) and return the interleaved-span
    documents dataset (input_hint schema)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray import synth
    from crawler_ray.stages.extract import extract_spans_batch

    docs = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"))
    pages = synth.derive_from_documents(docs)
    ds = rd.from_arrow(pages.select(["doc_id", "html"]))
    return ds.map_batches(extract_spans_batch, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from crawler_ray.queries import REGISTRY

    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from crawler_ray.queries import REGISTRY

    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
