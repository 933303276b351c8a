"""Leaf-classifier training pipeline (leaf_pages.clj:245-340 analog):
labeled corpus → feature export (parquet + ARFF) → logistic training →
held-out accuracy eval through the LeafScorer actor-pool stage."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_export_train_eval_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from crawler_ray import synth
    from crawler_ray.stages.leaf import (
        evaluate_corpus,
        export_training_data,
        train_logistic,
    )

    import zlib

    pages = synth.generate_site_graph(num_hosts=4, base_pages=40, seed=11)
    tbl = pages.select(["doc_id", "html", "is_leaf"])
    # deterministic split on the url hash (crc32 — builtin hash() is
    # randomized per process by PYTHONHASHSEED)
    h = np.array([zlib.crc32(u.encode()) % 2 for u in tbl["doc_id"].to_pylist()])
    train = tbl.filter(pa.array(h == 0))
    test = tbl.filter(pa.array(h == 1))
    assert train.num_rows > 20 and test.num_rows > 20

    feat_dir = str(tmp_path / "feat")
    arff = str(tmp_path / "train.arff")
    n = export_training_data(rd.from_arrow(train), feat_dir, arff_path=arff)
    assert n == train.num_rows

    # ARFF text artifact: header + one data row per page
    lines = open(arff).read().splitlines()
    assert lines[0] == "@RELATION leaf_pages"
    assert sum(1 for l in lines if l and not l.startswith("@")) == train.num_rows

    # train on the parquet export (the ARFF-equivalent), eval held-out
    ft = pq.read_table(feat_dir)
    X = np.array(ft["features"].to_pylist())
    y = ft["is_leaf"].to_numpy(zero_copy_only=False)
    mp = str(tmp_path / "model.npz")
    train_logistic(X, y, model_path=mp)

    rep = evaluate_corpus(rd.from_arrow(test), model_path=mp)
    assert rep["n"] == test.num_rows
    # structural leaves separate cleanly on the 10-dim features; the
    # reference's own eval quotes 17/20 ≈ 0.85 — require at least that
    assert rep["accuracy"] >= 0.85, rep

    # the trained npz is consumable by the LeafScorer actor stage — the
    # eval above already exercised it via model_path
    loaded = np.load(mp)
    assert loaded["weights"].shape == (10,)
