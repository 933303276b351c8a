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
