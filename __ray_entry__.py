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
    documents table, run the FULL BSP crawl (sharded URL-seen frontier,
    politeness/robots, redirect aliasing, near-dup marking, per-round
    checkpoints) and return the crawled corpus as an interleaved-span
    documents dataset (input_hint schema: doc_id + spans)."""
    import tempfile

    import pyarrow.parquet as pq
    import ray.data as rd

    from crawler_ray import synth
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl
    from crawler_ray.state.checkpoint import CheckpointStore

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = pq.read_table(os.path.join(SF_SMOKE, "documents.parquet"))
    pages = synth.derive_from_documents(docs)
    # seed pick: FIRST non-leaf row per host in table order, all Arrow
    # kernels (no driver-side Python row loop over the pages table)
    non_leaf = pages.filter(pc.invert(pages["is_leaf"]))
    non_leaf = non_leaf.append_column("_idx", pa.array(np.arange(non_leaf.num_rows)))
    first_idx = non_leaf.group_by("host").aggregate([("_idx", "min")])["_idx_min"]
    seeds = sorted(pc.take(non_leaf["doc_id"], first_idx).to_pylist())

    ckpt_dir = tempfile.mkdtemp(prefix="entry_crawl_")
    cfg = CrawlConfig(
        wave_size=None, n_seen_shards=4, fetch_concurrency=4,
        checkpoint_dir=ckpt_dir, snapshot_every=5,
    )
    crawl(pages, seeds, cfg)
    # streaming consumable: read the worker-written corpus parts as a
    # Dataset (no driver materialization of spans); the distributed
    # sort restores crawl-priority row order, matching the old
    # corpus_table contract
    ds = CheckpointStore(ckpt_dir).corpus_dataset()
    return (
        ds.sort(["depth", "discovery_seq"])
        .map_batches(
            lambda t: t.select(["url", "spans"]).rename_columns(["doc_id", "spans"]),
            batch_format="pyarrow",
        )
        .materialize()
    )


# The driver's per-round oracle sweep is capped at 50 entries (dict
# order), so rotate: expose the entries whose last driver certification
# is STALEST first.  r4 certified CORRECTNESS_r04.json's 50; these 23
# (certified r3, some with code changes since) go first this round, plus
# anything newly registered.  The r4-certified 50 follow in registry
# order.
_CERTIFY_FIRST = [
    "theil_sen_trend",         # new in r5 session 18, never certified
    "lpt_shard_plan",          # new in r5 session 18, never certified
    "tail_gap_p99",            # new in r5 session 18, never certified
    "column_dict_audit",       # new in r5 session 18, never certified
    "spatial_grid_join",       # new in r5 session 18, never certified
    "consistent_hash_balance", # new in r5 session 18, never certified
    "span_redaction",          # new in r5 session 18, never certified
    "maximal_independent_set", # new in r5 session 18, never certified
    "mann_whitney_u",          # new in r5 session 18, never certified
    "vocab_growth_curve",      # new in r5 session 18, never certified
    "minimum_spanning_tree",   # new in r5 s18 (rows-only: union-find not SQL)
    "graph_modularity",        # new in r5 session 18, never certified
    "sssp_distances",          # new in r5 session 18, never certified
    "graph_transitivity",      # new in r5 session 18, never certified
    "ab_test_chi2",            # new in r5 session 18, never certified
    "hourly_active_users",     # new in r5 session 18, never certified
    "sorted_neighborhood_neardup",  # new in r5 session 18, never certified
    "important_stock",         # new in r5 session 18, never certified
    "salted_hot_key_agg",      # new in r5 session 18, never certified
    "benford_digits",          # new in r5 session 18, never certified
    "mad_outliers",            # new in r5 session 18, never certified
    "katz_centrality",         # new in r5 session 18, never certified
    "rfm_segments",            # new in r5 session 18, never certified
    "user_first_seen_curve",   # new in r5 session 18, never certified
    "product_profit",          # new in r5 session 18, never certified
    "excess_stock_suppliers",  # new in r5 session 18, never certified
    "min_cost_supplier",       # new in r5 session 18, never certified
    "kcore_decomposition",     # oracle added r5 s18 (recursive-CTE h-index)
    "interval_coverage",       # new in r5 session 18, never certified
    "gini_concentration",      # new in r5 session 18, never certified
    "lag1_autocorr",           # new in r5 session 18, never certified
    "shipmode_priority",       # new in r5 session 18, never certified
    "disjunctive_revenue",     # new in r5 session 18, never certified
    "market_share",            # new in r5 session 17, never certified
    "power_iteration_embed",   # new in r5 session 17, never certified
    "late_event_audit",        # new in r5 session 17, never certified
    "zipf_slope",              # new in r5 session 17, never certified
    "ks_length_drift",         # new in r5 session 17, never certified
    "top_supplier_revenue",    # new in r5 session 17, never certified
    "clustering_coefficient",  # new in r5 session 17, never certified
    "degree_assortativity",    # new in r5 session 17, never certified
    "cusum_change_points",     # new in r5 session 17, never certified
    "waiting_suppliers",       # new in r5 session 17, never certified
    "small_qty_revenue",       # new in r5 session 17, never certified
    "nation_trade_volume",     # new in r5 session 17, never certified
    "idle_customer_balance",   # new in r5 session 17, never certified
    "returned_item_report",    # new in r5 session 16, never certified
    "brand_supplier_counts",   # new in r5 session 16, never certified
    "promo_revenue_share",     # new in r5 session 16, never certified
    "link_prediction_ra",      # new in r5 session 16, never certified
    "regional_volume",         # new in r5 session 16, never certified
    "large_order_customers",   # new in r5 session 16, never certified
    "late_shipment_priority",  # new in r5 session 16, never certified
    "props_json_stats",        # new in r5 session 16, never certified
    "weak_label_vote",         # new in r5 session 15, never certified
    "calibration_bins",        # new in r5 session 15, never certified
    "corpus_drift",            # new in r5 session 15, never certified
    "host_burstiness",         # new in r5 session 15, never certified
    "alias_resolution",        # new in r5 session 15, never certified
    "edge_reciprocity",        # new in r5 session 15, never certified
    "host_graph_condense",     # new in r5 session 15, never certified
    "retrieval_eval",          # new in r5 session 15, never certified
    "recrawl_priority",        # new in r5 session 15, never certified
    "hits_scores",             # new in r5 session 15, never certified
    "semantic_decontamination",  # new in r5 session 15, never certified
    "corpus_diversity",        # new in r5 session 15, never certified
    "edit_distance_neardup",   # new in r5 session 15, never certified
    "ngram_novelty",           # new in r5 session 15, never certified
    "span_integrity_audit",    # new in r5 session 15, never certified
    "politeness_schedule",     # new in r5 session 15, never certified
    "crawl_budget_allocation", # new in r5 session 15, never certified
    "session_stats",           # new in r5 session 14, never certified
    "funnel_stages",           # new in r5 session 14, never certified
    "mg_topk_terms",           # new in r5 session 14, never certified
    "terasort_rank",           # new in r5 session 14, never certified
    "shipping_priority",       # new in r5 session 14, never certified
    "custdist_histogram",      # new in r5 session 13, never certified
    "jsonl_roundtrip_stats",   # new in r5 session 13, never certified
    "personalized_pagerank",   # new in r5 session 13, never certified
    "growth_accounting",       # new in r5 session 13, never certified
    "basket_rules",            # new in r5 session 13, never certified
    "dup_size_histogram",      # new in r5 session 13, never certified
    "two_hop_reach",           # new in r5 session 13, never certified
    "colbert_maxsim",          # new in r5 session 13, never certified
    "cdc_upsert_merge",        # new in r5 session 13, never certified
    "media_layout_dedup",      # new in r5 session 13, never certified
    "skyline_pareto",          # new in r5 session 13, never certified
    "timeseries_gapfill",      # new in r5 session 13, never certified
    "winsorized_stats",        # new in r5 session 13, never certified
    "event_debounce",          # new in r5 session 13, never certified
    "rank_agreement",          # new in r5 session 13, never certified
    "cms_registers",           # new in r5 session 12, never certified
    "overlap_stitch",          # new in r5 session 12, never certified
    "label_prop_rounds",       # new in r5 session 12, never certified
    "embedding_gram",          # new in r5 session 12, never certified
    "cohort_retention",        # new in r5 session 12, never certified
    "event_path_topk",         # new in r5 session 12, never certified
    "source_overlap_matrix",   # new in r5 session 12, never certified
    "media_context_stats",     # new in r5 session 12, never certified
    "kwic_contexts",           # new in r5 session 12, never certified
    "dataset_card_stats",      # new in r5 session 11, never certified
    "pmi_topk",                # new in r5 session 11, never certified
    "graph_random_walks",      # new in r5 session 11, never certified
    "hll_registers",           # new in r5 session 11, never certified
    "interleaved_data_prep",   # new in r5 session 11, never certified
    "dedup_keep_longest",      # new in r5 session 11, never certified
    "memorization_scan",       # new in r5 session 11, never certified
    "mutual_nn_pairs",         # new in r5 session 11, never certified
    "cocitation_pairs",        # new in r5 session 11, never certified
    "image_text_pairs",        # new in r5 session 11, never certified
    "interleaved_doc_filter",  # new in r5 session 11, never certified
    "interleaved_serialize",   # new in r5 session 11, never certified
    "boilerplate_removal",     # new in r5 session 11, never certified
    "anchor_text_agg",         # new in r5 session 10, never certified
    "rrf_fusion",              # new in r5 session 10, never certified
    "containment_join",        # new in r5 session 10, never certified
    "url_pattern_topk",        # new in r5 session 10, never certified
    "interleaved_span_stats",  # new in r5 session 10, never certified
    "srp_lsh_neardup",      # new in r5 session 9, never certified
    "audio_fingerprint_dedup",  # new in r5 session 9, never certified
    "per_source_cap",       # new in r5 session 9, never certified
    "graph_bfs_layers",     # new in r5 session 9, never certified
    "weighted_sample_topk", # new in r5 session 9, never certified
    "triangle_count",       # new in r5 session 8, never certified
    "warc_roundtrip_stats", # new in r5 session 7, never certified
    "bigram_lm_score",      # new in r5 session 6, never certified
    "image_dhash_neardup",  # new in r5 session 6, never certified
    "ivfpq_ann_topk",       # new in r5 session 6 (rows-only: no SQL)
    "pq_ann_topk",          # new in r5, never certified (rows-only: no SQL)
    "temperature_resample", # new in r5, never certified
    "bm25_topk",            # new in r5, never certified
    "dsir_resample",        # new in r5, never certified
    "host_quality_filter",  # new in r5, never certified
    "token_rarity_buckets", # new in r5, never certified
    "bpe_train_merges",     # new in r5, never certified (rows-only: no SQL)
    "cross_corpus_neardup", # new in r5, never certified
    "snapshot_diff",        # new in r5, never certified
    "term_cooccurrence",    # new in r5, never certified
    "leakage_safe_split",   # new in r5, never certified
    "date_records_detect",  # new in r5, never certified
    "video_frame_sample",   # new in r5, never certified
    "media_decode_stats",   # r5 added the intra-H.264 payload mix
    "training_data_prep", "simhash_neardup", "langid_heuristic",
    "rolling_fingerprints", "ann_ivf_topk", "crawl_bfs", "window_rank",
    "union_distinct", "json_props_stats", "filter_sum_scan",
    "semi_join_exists", "duplicate_substrings", "stratified_sample",
    "kmeans_clusters", "heavy_hitters", "dedup_components", "interval_join",
    "bpe_token_stats", "decontaminate", "value_quantiles", "group_topk",
    "mixture_resample", "repetition_stats",
]


def _ordered_registry():
    from crawler_ray.queries import REGISTRY

    head = [n for n in _CERTIFY_FIRST if n in REGISTRY]
    return {n: REGISTRY[n] for n in head} | {
        n: qd for n, qd in REGISTRY.items() if n not in head
    }


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: qd.fn for name, qd in _ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: qd.sql
        for name, qd in _ordered_registry().items()
        if qd.sql is not None
    }
