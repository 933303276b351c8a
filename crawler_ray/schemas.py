"""Explicit Arrow schemas for every logical table.

The reference keeps everything as schemaless Clojure maps persisted as
EDN (SURVEY.md §1); declaring fixed ``pyarrow.Schema``s is the single
biggest semantic firming-up of the rewrite.  Schemas follow SURVEY.md
§1.1 and the driver input_hint:

  documents: (doc_id:string, spans:list<struct<kind:string, text:string,
             media_ref:string, offset:int32>>)
"""
from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- spans
# kind ∈ {"text", "link", "media"}; link spans carry the anchor
# (text = anchor text, media_ref = canonical target URL); media spans
# carry media_ref = asset URL (the reference's ignored-media regex,
# dom.clj:302, becomes a first-class span kind); offset = char offset
# of the span's element in the serialized page.
SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)
SPANS_TYPE = pa.list_(SPAN_STRUCT)

# ------------------------------------------------------- documents table
# The authoritative input (driver input_hint): interleaved text + media
# span documents.  ``doc_id`` is the canonical URL of the page.
DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", SPANS_TYPE),
    ]
)

# Auxiliary site-graph columns the synthetic generator also emits (used
# by tests and the fetch stage; NOT part of the conformance surface).
SITE_PAGES = pa.schema(
    [
        pa.field("doc_id", pa.string()),          # canonical URL
        pa.field("host", pa.string()),            # partition key
        pa.field("html", pa.large_string()),      # serialized page body
        pa.field("spans", SPANS_TYPE),            # golden span sequence
        pa.field("is_leaf", pa.bool_()),          # generator label
        pa.field("disallowed", pa.bool_()),       # robots.txt disallows
        pa.field("redirect_to", pa.string()),     # "" or canonical target
    ]
)

# -------------------------------------------------------------- frontier
# URL-frontier entry — the reference's ``url-ds`` map (crawl.clj:21-44)
# with the priority key made explicit: (depth, discovery_seq) is the
# depth-then-discovery-time policy of the north_rule (SURVEY.md §2.11).
FRONTIER = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("discovery_seq", pa.int64()),
        pa.field("src_url", pa.string()),
        pa.field("src_xpath", pa.list_(pa.string())),  # discovery edge xpath(s)
        pa.field("src_text", pa.string()),             # anchor text
        pa.field("is_pagination", pa.bool_()),
    ]
)

# ----------------------------------------------------------- fetch output
# One row per attempted fetch.  Fetch failures become ``status`` values,
# never silent drops (the reference drops exceptions as nil,
# crawl.clj:93-94 — we make that explicit, SURVEY.md §4).
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("discovery_seq", pa.int64()),
        pa.field("src_url", pa.string()),
        pa.field("src_xpath", pa.list_(pa.string())),
        pa.field("status", pa.string()),  # ok|redirect|robots_denied|missing
        pa.field("redirects", pa.list_(pa.string())),  # alias chain
        pa.field("body", pa.large_string()),
    ]
)

# ------------------------------------------------------------ link rows
# Exploded link-extraction output (dom.clj:304-376 per-anchor record).
LINKS = pa.schema(
    [
        pa.field("src_url", pa.string()),
        pa.field("src_depth", pa.int32()),
        pa.field("src_xpath", pa.list_(pa.string())),
        pa.field("url", pa.string()),       # canonicalized target
        pa.field("host", pa.string()),
        pa.field("text", pa.string()),      # anchor text
        pa.field("xpath", pa.string()),     # generalized source xpath
        pa.field("is_pagination", pa.bool_()),
    ]
)

# --------------------------------------------------------------- corpus
CORPUS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("depth", pa.int32()),
        pa.field("discovery_seq", pa.int64()),
        pa.field("src_url", pa.string()),
        pa.field("src_xpath", pa.list_(pa.string())),
        pa.field("is_leaf", pa.bool_()),
        pa.field("spans", SPANS_TYPE),
        pa.field("minhash", pa.list_(pa.uint64())),
        pa.field("near_dup", pa.bool_()),
        pa.field("round", pa.int32()),
    ]
)
