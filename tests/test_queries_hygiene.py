"""Semantic property tests for the corpus-hygiene operators (the
DuckDB-oracle equivalence is covered by test_queries.py + the driver
sweep; these pin the *behavioral* contracts on adversarial corpora)."""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _write_docs(tmp_path, texts, langs=None):
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs or ["en"] * n, type=pa.string()),
            "source": pa.array(["s"] * n, type=pa.string()),
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_segment_dedup_exact_copy_loses_everything(ray_session, tmp_path):
    base = " ".join(f"w{i}" for i in range(30))  # 3 full segments
    other = " ".join(f"x{i}" for i in range(25))  # unique doc
    sf = _write_docs(tmp_path, [base, other, base])
    from crawler_ray.queries import segment_dedup

    out = segment_dedup(sf).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_removed"] == 0 and out.loc[0, "new_text"] == base
    assert out.loc[1, "n_removed"] == 0 and out.loc[1, "new_text"] == other
    # doc 2 is a byte-copy of doc 0: every segment is a loser
    assert out.loc[2, "n_removed"] == out.loc[2, "n_segs"] == 3
    assert out.loc[2, "new_text"] == ""


def test_segment_dedup_partial_overlap_keeps_order(ray_session, tmp_path):
    seg_a = " ".join(f"a{i}" for i in range(10))
    seg_b = " ".join(f"b{i}" for i in range(10))
    seg_c = " ".join(f"c{i}" for i in range(10))
    sf = _write_docs(tmp_path, [f"{seg_a} {seg_b}", f"{seg_b} {seg_c}"])
    from crawler_ray.queries import segment_dedup

    out = segment_dedup(sf).to_pandas().set_index("doc_id")
    # doc 1 loses its first segment (seg_b, owned by doc 0) but keeps
    # seg_c, re-joined without a dangling separator
    assert out.loc[1, "n_removed"] == 1
    assert out.loc[1, "new_text"] == seg_c


def test_repetition_stats_flags_pathological_docs(ray_session, tmp_path):
    loop = "spam ham " * 20  # one bigram dominates, few distinct tokens
    clean = " ".join(f"tok{i}" for i in range(40))
    sf = _write_docs(tmp_path, [loop.strip(), clean], langs=["en", "en"])
    from crawler_ray.queries import repetition_stats

    out = repetition_stats(sf).to_pandas()
    row = out[out["lang"] == "en"].iloc[0]
    assert row["n_docs"] == 2
    assert row["flag_bigram"] == 1  # only the loop doc
    assert row["flag_unique"] == 1


def test_mixture_resample_keeps_all_of_min_language(ray_session, tmp_path):
    texts = [f"doc {i}" for i in range(40)]
    langs = ["en"] * 30 + ["fr"] * 10
    sf = _write_docs(tmp_path, texts, langs=langs)
    from crawler_ray.queries import mixture_resample

    out = mixture_resample(sf).to_pandas()
    # the minority language keeps every row (rate == 1); the majority
    # is hash-thinned toward min_count in expectation
    assert (out["lang"] == "fr").sum() == 10
    assert (out["lang"] == "en").sum() < 30


def test_pii_scrub_counts_and_redacts(ray_session, tmp_path):
    # doc_id 0 hits both the %3 (email+phone) and %5 (ip) augmentations
    sf = _write_docs(tmp_path, ["plain text here", "more text"], langs=["en", "fr"])
    from crawler_ray.queries import pii_scrub

    out = pii_scrub(sf).to_pandas().set_index("lang")
    assert out.loc["en", "n_emails"] == 1
    assert out.loc["en", "n_phones"] == 1
    assert out.loc["en", "n_ips"] == 1
    assert out.loc["fr", "n_emails"] == 0
    # redaction shrank the augmented text (emails are longer than <EMAIL>)
    aug_len = len("plain text here contact u0@ex.com or +1-555-0000 ip 10.0.0.1")
    assert out.loc["en", "redacted_chars"] < aug_len


def test_tfidf_rare_term_outranks_common(ray_session, tmp_path):
    # 'rare' appears in one doc only; 'common' in all — the doc holding
    # 'rare' must rank it first even at equal tf
    texts = ["common rare", "common alpha", "common beta"]
    sf = _write_docs(tmp_path, texts)
    from crawler_ray.queries import tfidf_top_terms

    out = tfidf_top_terms(sf).to_pandas()
    top0 = out[(out["doc_id"] == 0) & (out["rk"] == 1)].iloc[0]
    assert top0["term"] == "rare" and top0["df"] == 1


def test_group_topk_matches_pandas(ray_session):
    import pandas as pd

    from crawler_ray.queries import group_topk

    sf = "/root/testdata/sf0.001"
    got = (
        group_topk(sf)
        .to_pandas()
        .sort_values(["o_custkey", "rk"])
        .reset_index(drop=True)
    )
    orders = pq.read_table(
        os.path.join(sf, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    ).to_pandas()
    orders = orders.sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
    )
    want = orders.groupby("o_custkey", as_index=False).head(3)
    want = want.assign(rk=want.groupby("o_custkey").cumcount() + 1).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        got[["o_custkey", "o_orderkey", "o_totalprice", "rk"]].astype(
            {"rk": "int64"}
        ),
        want[["o_custkey", "o_orderkey", "o_totalprice", "rk"]].astype(
            {"rk": "int64"}
        ),
    )
