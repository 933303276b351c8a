"""Leaf-page feature vector — the reference's 10-dim featurizer
(``leaf-pages/generate-features[-map]``, leaf_pages.clj:141-243).

Features (A–J, same definitions, computed from one DOM parse):
  A  avg chars per text-bearing xpath
  B  avg chars per anchor-bearing xpath
  C  #text-xpaths − #anchor-xpaths
  D  #anchor-xpaths
  E  max avg text length over text-xpaths
  F  formatting-tag count (b/i/em/strong/u)
  G  <p> count
  H  <br> count
  I  punctuation density in page text
  J  anchor-text chars / total text chars

Used by the LeafScorer actor-pool stage (stages/leaf.py); a logistic
threshold over these replaces the reference's external libsvm model
(gaps_between_links.train.libsvm.model — binary blob, semantics
reconstructed from the feature contract, SURVEY.md §7.5).
"""
from __future__ import annotations

import numpy as np

from .. import dom

_FORMAT_TAGS = frozenset({"b", "i", "em", "strong", "u"})
_PUNCT = set(".,;:!?'\"()-")


def leaf_features(html: str) -> np.ndarray:
    root = dom.parse_page(html)
    memo = dom.XPathMemo()
    text_xp: dict[str, list[int]] = {}
    anchor_xp: dict[str, list[int]] = {}
    fmt_count = p_count = br_count = 0
    anchor_chars = 0
    all_text: list[str] = []

    def walk(n: dom.Node):
        nonlocal fmt_count, p_count, br_count, anchor_chars
        if n.tag in _FORMAT_TAGS:
            fmt_count += 1
        if n.tag == "p":
            p_count += 1
        if n.tag == "br":
            br_count += 1
        if n.tag == "a":
            xp = memo.nopos(n)
            t = n.text()
            anchor_xp.setdefault(xp, []).append(len(t))
            anchor_chars += len(t)
            all_text.append(t)
            return
        for kind, payload, _off in n.content:
            if kind == "text":
                s = payload.strip()
                if s:
                    xp = memo.nopos(n)
                    text_xp.setdefault(xp, []).append(len(s))
                    all_text.append(s)
            else:
                walk(payload)

    walk(root)
    text = " ".join(all_text)
    n_text_xp = len(text_xp)
    n_anchor_xp = len(anchor_xp)
    avg_text = (
        float(np.mean([sum(v) for v in text_xp.values()])) if text_xp else 0.0
    )
    avg_anchor = (
        float(np.mean([sum(v) for v in anchor_xp.values()])) if anchor_xp else 0.0
    )
    max_avg_text = (
        float(max(np.mean(v) for v in text_xp.values())) if text_xp else 0.0
    )
    punct_density = (
        sum(1 for c in text if c in _PUNCT) / len(text) if text else 0.0
    )
    anchor_ratio = anchor_chars / len(text) if text else 0.0
    return np.array(
        [
            avg_text,            # A
            avg_anchor,          # B
            float(n_text_xp - n_anchor_xp),  # C
            float(n_anchor_xp),  # D
            max_avg_text,        # E
            float(fmt_count),    # F
            float(p_count),      # G
            float(br_count),     # H
            punct_density,       # I
            anchor_ratio,        # J
        ],
        dtype=np.float64,
    )


# Hand-calibrated linear scorer standing in for the reference's libsvm
# model: leaves have long text per xpath (A, E high), few anchor groups
# (D low), low anchor-text share (J low).
DEFAULT_WEIGHTS = np.array([0.01, -0.002, 0.3, -0.5, 0.005, 0.1, 0.2, 0.05, 2.0, -4.0])
DEFAULT_BIAS = 0.0


def leaf_score(features: np.ndarray, weights=DEFAULT_WEIGHTS, bias=DEFAULT_BIAS) -> float:
    return 1.0 / (1.0 + np.exp(-(features @ weights + bias)))
