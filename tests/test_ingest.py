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

    # crash recovery: fingerprints committed but manifest lost (crash
    # between the two renames) — the round dir holds the ONLY accepted
    # copies, so re-running must commit it back, not delete it
    import json

    m = json.load(open(os.path.join(corpus, "_manifest.json")))
    del m["rounds"]["2"]
    json.dump(m, open(os.path.join(corpus, "_manifest.json"), "w"))
    r2c = incremental_ingest(_ds([(11, "cc")]), corpus, 2)
    assert r2c["recovered"] is True and r2c["ingested"] == 1
    assert _corpus_rows(corpus) == [1, 2, 11]  # no data loss
    # and the recovered commit is durable: a re-run now skips
    r2d = incremental_ingest(_ds([(11, "cc")]), corpus, 2)
    assert r2d["skipped"] is True
    assert _corpus_rows(corpus) == [1, 2, 11]


def test_ingest_crash_before_fp_commit_redoes_round(ray_session, tmp_path):
    """Orphan round dir whose fingerprints were NEVER committed (crash
    between write_parquet and the fp rename): the dir is deleted and
    the round redone from the input — nothing blocks re-ingest."""
    from crawler_ray.pipelines.ingest import incremental_ingest

    corpus = str(tmp_path / "corpus")
    incremental_ingest(_ds([(1, "aa")]), corpus, 1)

    # simulate: round 2's data landed but the fp rename never happened
    round_dir = os.path.join(corpus, "round=0002")
    os.makedirs(round_dir)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([7], type=pa.int64()),
                "text": pa.array(["orphan-text"], type=pa.string()),
            }
        ),
        os.path.join(round_dir, "part-0.parquet"),
    )
    r2 = incremental_ingest(_ds([(5, "bb"), (6, "aa")]), corpus, 2)
    assert r2 == {"ingested": 1, "dup_existing": 1, "dup_within": 0, "skipped": False}
    assert _corpus_rows(corpus) == [1, 5]  # orphan replaced by the redo


def test_ingest_recovery_join_regime(ray_session, tmp_path):
    """Recovery's fp-coverage check also works in the past-cap join
    regime (fp_broadcast_cap=0 forces it)."""
    import json

    from crawler_ray.pipelines.ingest import incremental_ingest

    corpus = str(tmp_path / "corpus")
    incremental_ingest(_ds([(1, "aa"), (2, "bb")]), corpus, 1, fp_broadcast_cap=0)
    incremental_ingest(_ds([(3, "cc"), (4, "aa")]), corpus, 2, fp_broadcast_cap=0)
    mpath = os.path.join(corpus, "_manifest.json")
    m = json.load(open(mpath))
    del m["rounds"]["2"]
    json.dump(m, open(mpath, "w"))
    r = incremental_ingest(_ds([(3, "cc"), (4, "aa")]), corpus, 2, fp_broadcast_cap=0)
    assert r["recovered"] is True and r["ingested"] == 1
    assert _corpus_rows(corpus) == [1, 2, 3]


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
