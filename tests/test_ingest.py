"""Incremental corpus ingest: cross-round exact dedup, within-round
first-wins, idempotent round commit, crash-orphan convergence."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


def _corpus_rows(corpus_dir):
    import glob

    rows = []
    for p in sorted(glob.glob(os.path.join(corpus_dir, "round=*", "*.parquet"))):
        rows += pq.read_table(p).to_pydict()["doc_id"]
    return sorted(rows)


def test_incremental_ingest_rounds(ray_session, tmp_path):
    from crawler_ray.pipelines.ingest import incremental_ingest

    corpus = str(tmp_path / "corpus")
    r1 = incremental_ingest(_ds([(1, "aa"), (2, "bb"), (3, "aa")]), corpus, 1)
    # doc 3 is a within-round duplicate of doc 1
    assert r1 == {"ingested": 2, "dup_existing": 0, "dup_within": 1, "skipped": False}
    assert _corpus_rows(corpus) == [1, 2]

    # round 2: one known text, one new, one repeated new (first-wins)
    r2 = incremental_ingest(_ds([(10, "bb"), (11, "cc"), (12, "cc")]), corpus, 2)
    assert r2 == {"ingested": 1, "dup_existing": 1, "dup_within": 1, "skipped": False}
    assert _corpus_rows(corpus) == [1, 2, 11]

    # idempotency: re-running a committed round is a no-op
    r2b = incremental_ingest(_ds([(99, "zz")]), corpus, 2)
    assert r2b["skipped"] is True
    assert _corpus_rows(corpus) == [1, 2, 11]

    # crash convergence: fingerprints written but manifest lost
    # (delete the manifest entry) — re-running the round accepts 0 and
    # the corpus converges (no duplicate text ever ingested twice)
    import json

    m = json.load(open(os.path.join(corpus, "_manifest.json")))
    del m["rounds"]["2"]
    json.dump(m, open(os.path.join(corpus, "_manifest.json"), "w"))
    r2c = incremental_ingest(_ds([(11, "cc")]), corpus, 2)
    assert r2c["ingested"] == 0 and r2c["dup_existing"] == 1
    assert _corpus_rows(corpus) == [1, 2]  # round dir rewritten empty... 


def test_incremental_ingest_fuzz_vs_dict_oracle(ray_session, tmp_path):
    """Random texts split across random rounds: the corpus must equal
    first-wins-by-(round, doc_id) over text, whatever the split."""
    import numpy as np

    from crawler_ray.pipelines.ingest import incremental_ingest

    rng = np.random.default_rng(55)
    corpus = str(tmp_path / "fuzzcorpus")
    texts = [f"t{int(v)}" for v in rng.integers(0, 40, size=120)]  # heavy dups
    rows = list(enumerate(texts))
    cut1, cut2 = 40, 80
    seen: dict[str, int] = {}
    expected_ids = []
    for rnd, chunk in ((1, rows[:cut1]), (2, rows[cut1:cut2]), (3, rows[cut2:])):
        stats = incremental_ingest(_ds(chunk), corpus, rnd)
        exp_new = 0
        for did, txt in sorted(chunk):
            if txt not in seen:
                seen[txt] = did
                expected_ids.append(did)
                exp_new += 1
        assert stats["ingested"] == exp_new, rnd
    assert _corpus_rows(corpus) == sorted(expected_ids)


def test_ingest_join_regime_matches_broadcast(ray_session, tmp_path):
    """Force the past-cap hash-join membership regime and assert the
    same rounds produce the same corpus as the broadcast regime."""
    from crawler_ray.pipelines.ingest import incremental_ingest

    r1 = [(i, f"t{i % 15}") for i in range(30)]
    r2 = [(100 + i, f"t{i % 25}") for i in range(30)]
    out = {}
    for mode, cap in (("bcast", 10**9), ("join", 0)):
        corpus = str(tmp_path / mode)
        s1 = incremental_ingest(_ds(r1), corpus, 1, fp_broadcast_cap=cap)
        s2 = incremental_ingest(_ds(r2), corpus, 2, fp_broadcast_cap=cap)
        out[mode] = (s1["ingested"], s2["ingested"], s2["dup_existing"], _corpus_rows(corpus))
    assert out["bcast"] == out["join"]
    assert out["bcast"][0] == 15  # 15 distinct texts in round 1
