"""Stateless extraction stages (map_batches kernels over Arrow batches).

Per SURVEY.md §7.3 these are plain functions (stateless tasks): HTML
parse, span extraction, link explode+canonicalize+filter, state-action
scoring.  DOM parse happens ONCE per row per stage and is never stored
(reference re-parses repeatedly, dom.clj:19-25/289-300 — we keep the
parse transient but single)."""
from __future__ import annotations

import pyarrow as pa

from .. import dom, schemas
from ..functions.urlnorm import url_host


def extract_spans_batch(batch: pa.Table) -> pa.Table:
    """pages(url, body…) → documents(doc_id, spans) — the input_hint
    output table.  Rows with empty bodies (redirect hops, fetch
    failures) produce empty span lists."""
    urls = batch["url"].to_pylist() if "url" in batch.column_names else batch["doc_id"].to_pylist()
    bodies = batch["body"].to_pylist() if "body" in batch.column_names else batch["html"].to_pylist()
    spans = [dom.extract_spans(b, u) if b else [] for u, b in zip(urls, bodies)]
    return pa.table(
        {
            "doc_id": pa.array(urls, type=pa.string()),
            "spans": pa.array(spans, type=schemas.SPANS_TYPE),
        }
    )


def explode_links_batch(batch: pa.Table, blacklist: frozenset = frozenset()) -> pa.Table:
    """pages → one row per surviving anchor (the dom.clj:304-376 filter
    chain), carrying source url/depth/xpath for frontier construction."""
    urls = batch["url"].to_pylist()
    bodies = batch["body"].to_pylist()
    depths = (
        batch["depth"].to_pylist()
        if "depth" in batch.column_names
        else [0] * len(urls)
    )
    src_xp = (
        batch["src_xpath"].to_pylist()
        if "src_xpath" in batch.column_names
        else [[] for _ in urls]
    )
    out = {k: [] for k in ("src_url", "src_depth", "src_xpath", "url", "host", "text", "xpath", "is_pagination")}
    for u, b, d, xp in zip(urls, bodies, depths, src_xp):
        if not b:
            continue
        root = dom.parse_page(b)
        for link in dom.extract_links(root, u, blacklist=blacklist):
            out["src_url"].append(u)
            out["src_depth"].append(d)
            out["src_xpath"].append(list(xp or []))
            out["url"].append(link["url"])
            out["host"].append(url_host(link["url"]))
            out["text"].append(link["text"])
            out["xpath"].append(link["xpath"])
            # numeric-anchor pagination heuristic (crawl.clj:479-486
            # parses page numbers from anchor text)
            out["is_pagination"].append(link["text"].strip().isdigit())
    return pa.table(
        {
            "src_url": pa.array(out["src_url"], type=pa.string()),
            "src_depth": pa.array(out["src_depth"], type=pa.int32()),
            "src_xpath": pa.array(out["src_xpath"], type=pa.list_(pa.string())),
            "url": pa.array(out["url"], type=pa.string()),
            "host": pa.array(out["host"], type=pa.string()),
            "text": pa.array(out["text"], type=pa.string()),
            "xpath": pa.array(out["xpath"], type=pa.string()),
            "is_pagination": pa.array(out["is_pagination"], type=pa.bool_()),
        }
    )
