"""Leaf-page scoring: featurizer stage + scorer actor pool.

The reference loads a libsvm classifier once per process then predicts
per page (discussion_forum.clj:10-14, 73-84); here the model weights
load once per ACTOR (``__init__``) and every batch is scored
vectorized — the canonical Ray Data stateful-stage shape
(``map_batches(LeafScorer, concurrency=N, batch_size=B)``).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import features as F


def featurize_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Stateless 10-dim featurizer (leaf_pages.clj:141-243)."""
    feats = [F.leaf_features(h) if h else np.zeros(10) for h in batch[html_col].to_pylist()]
    m = np.vstack(feats)
    return batch.append_column(
        "features", pa.array([row.tolist() for row in m], type=pa.list_(pa.float64(), 10))
    )


def export_training_data(ds, out_dir: str, html_col: str = "html", label_col: str = "is_leaf", id_col: str = "doc_id", arff_path: str | None = None):
    """Labeled-corpus → feature-vector export (the reference's
    download-corpus + generate-arff-file, leaf_pages.clj:245-303):
    featurize every page in a map_batches pass and write partitioned
    parquet of (id, features, label) — the ARFF equivalent at scale.
    ``arff_path`` additionally writes a literal Weka-style .arff text
    file (driver-side; only sensible for small labeled corpora, which
    is what ARFF was for).  Returns the exported row count."""
    import os

    import pyarrow.parquet as pq  # noqa: F401  (write_parquet sink below)

    feat = ds.map_batches(
        lambda t: featurize_batch(t, html_col=html_col).select(
            [id_col, "features", label_col]
        ),
        batch_format="pyarrow",
    )
    os.makedirs(out_dir, exist_ok=True)
    feat = feat.materialize()
    feat.write_parquet(out_dir)
    if arff_path:
        tbl = feat.to_arrow_refs()
        import pyarrow as pa_
        import ray

        full = pa_.concat_tables(ray.get(tbl))
        with open(arff_path, "w") as f:
            f.write("@RELATION leaf_pages\n\n")
            for name in "ABCDEFGHIJ":
                f.write(f"@ATTRIBUTE feat_{name} NUMERIC\n")
            f.write("@ATTRIBUTE class {leaf,nonleaf}\n\n@DATA\n")
            for row in full.to_pylist():
                vals = ",".join(f"{v:.6f}" for v in row["features"])
                f.write(f"{vals},{'leaf' if row[label_col] else 'nonleaf'}\n")
    return feat.count()


def train_logistic(features: np.ndarray, labels: np.ndarray, iters: int = 300, lr: float = 0.05, model_path: str | None = None):
    """Deterministic logistic-regression training over exported feature
    vectors — the stand-in for the reference's external libsvm training
    run (leaf_pages.clj:306-317; the .model artifact is a binary blob).
    Features are z-normalized internally; the saved weights fold the
    normalization back in so LeafScorer consumes raw features."""
    x = np.asarray(features, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64)
    mu = x.mean(axis=0)
    sd = np.maximum(x.std(axis=0), 1e-9)
    xn = (x - mu) / sd
    w = np.zeros(x.shape[1])
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xn @ w + b)))
        g = p - y
        w -= lr * (xn.T @ g) / len(y)
        b -= lr * float(g.mean())
    # fold normalization: score(raw) = ((raw-mu)/sd)@w + b
    w_raw = w / sd
    b_raw = b - float((mu / sd) @ w)
    if model_path:
        np.savez(model_path, weights=w_raw, bias=b_raw)
    return w_raw, b_raw


def evaluate_corpus(ds, model_path: str | None = None, html_col: str = "html", label_col: str = "is_leaf", threshold: float = 0.5, concurrency: int = 2):
    """test-corpus analog (leaf_pages.clj:319-340): score a labeled
    corpus with the actor-pool LeafScorer and report accuracy /
    precision / recall — the reference's '17/20'-style eval, computed
    distributed (featurize + score in map_batches, confusion counts
    reduced per batch)."""
    import pyarrow.compute as pc

    scored = ds.map_batches(
        lambda t: featurize_batch(t, html_col=html_col), batch_format="pyarrow"
    ).map_batches(
        LeafScorer,
        fn_constructor_kwargs={"model_path": model_path, "threshold": threshold},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def confusion(t: pa.Table) -> pa.Table:
        y = t[label_col].to_numpy(zero_copy_only=False).astype(bool)
        p = t["is_leaf_scored"].to_numpy(zero_copy_only=False).astype(bool)
        return pa.table(
            {
                "tp": pa.array([int((y & p).sum())], type=pa.int64()),
                "fp": pa.array([int((~y & p).sum())], type=pa.int64()),
                "fn": pa.array([int((y & ~p).sum())], type=pa.int64()),
                "tn": pa.array([int((~y & ~p).sum())], type=pa.int64()),
            }
        )

    import pandas as pd

    c = scored.map_batches(confusion, batch_format="pyarrow").to_pandas().sum()
    tp, fp, fn, tn = int(c["tp"]), int(c["fp"]), int(c["fn"]), int(c["tn"])
    total = tp + fp + fn + tn
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn, "n": total,
        "accuracy": (tp + tn) / total if total else 0.0,
        "precision": tp / (tp + fp) if tp + fp else 0.0,
        "recall": tp / (tp + fn) if tp + fn else 0.0,
    }


class LeafScorer:
    """Actor-pool stage: model weights loaded once per actor.

    In production the ``model_path`` would deserialize real trained
    weights; the default is the calibrated linear stand-in
    (functions/features.py).  Usage:

        ds.map_batches(LeafScorer, concurrency=8, batch_size=256,
                       batch_format="pyarrow")
    """

    def __init__(self, model_path: str | None = None, threshold: float = 0.5):
        if model_path:
            loaded = np.load(model_path)
            self.weights, self.bias = loaded["weights"], float(loaded["bias"])
        else:
            self.weights, self.bias = F.DEFAULT_WEIGHTS, F.DEFAULT_BIAS
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = np.array(batch["features"].to_pylist(), dtype=np.float64)
        if m.size == 0:
            scores = np.zeros(0)
        else:
            scores = 1.0 / (1.0 + np.exp(-(m @ self.weights + self.bias)))
        out = batch.append_column("leaf_score", pa.array(scores, type=pa.float64()))
        return out.append_column(
            "is_leaf_scored", pa.array(scores >= self.threshold, type=pa.bool_())
        )
