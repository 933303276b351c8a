"""Similarity / distance kernels (SURVEY.md §2.9).

  * RTDM restricted tree-edit-distance over DOM trees
    (reference similarity.clj:60-125, duplicated at
    tree_edit_distance.clj:55-108), used with sim > 0.8 on > 50% of
    samples for pagination detection (rich_extractor.clj:204-215)
  * page-signature similarities over {xpath → count} maps: cosine,
    cardinality, manhattan-ish distance, weighted cosine
    (page.clj:15-155)
  * xpath-text char-frequency cosine — reimplementation of the
    external `structural_similarity` dep from its call-site contracts
    (corpus.clj:11,22-23,150; crawl.clj:587-589,916-918); threshold
    0.8 calibrated on synthetic fixtures (SURVEY.md §7.5 flags this as
    an approximation)

All are per-pair scalar kernels invoked inside map_groups on LSH/bucket
candidate pairs — never all-pairs over the corpus.
"""
from __future__ import annotations

import math
from collections import Counter

from .. import dom


# ------------------------------------------------------ RTDM tree edit


def _tree_of(node: dom.Node) -> tuple:
    """(label, children) shape tree from a DOM node."""
    return (node.tag, tuple(_tree_of(c) for c in node.children))


def _tree_size(t: tuple) -> int:
    return 1 + sum(_tree_size(c) for c in t[1])


def rtdm_distance(t1: tuple, t2: tuple, ins: float = 1.0, dele: float = 1.0, sub: float = 1.0) -> float:
    """Restricted top-down mapping edit distance (Reis et al., WWW'04 —
    the algorithm the reference implements in similarity.clj:60-125):
    DP over the two root's child forests; subtrees can only map to
    subtrees at the same depth with matching ancestors."""

    memo: dict = {}

    def forest_dist(f1: tuple, f2: tuple) -> float:
        key = (id(f1), id(f2))
        if key in memo:
            return memo[key]
        m, n = len(f1), len(f2)
        # DP table over child prefixes
        d = [[0.0] * (n + 1) for _ in range(m + 1)]
        for i in range(1, m + 1):
            d[i][0] = d[i - 1][0] + dele * _tree_size(f1[i - 1])
        for j in range(1, n + 1):
            d[0][j] = d[0][j - 1] + ins * _tree_size(f2[j - 1])
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                a, b = f1[i - 1], f2[j - 1]
                if a[0] == b[0]:
                    rep = d[i - 1][j - 1] + forest_dist(a[1], b[1])
                else:
                    rep = d[i - 1][j - 1] + sub + dele * (_tree_size(a) - 1) + ins * (_tree_size(b) - 1)
                d[i][j] = min(
                    rep,
                    d[i - 1][j] + dele * _tree_size(a),
                    d[i][j - 1] + ins * _tree_size(b),
                )
        memo[key] = d[m][n]
        return d[m][n]

    if t1[0] != t2[0]:
        base = sub
    else:
        base = 0.0
    return base + forest_dist(t1[1], t2[1])


def rtdm_similarity(html1: str, html2: str) -> float:
    """Normalized similarity 1 − d/(|t1|+|t2|) (similarity.clj:118-125)."""
    t1 = _tree_of(dom.parse_page(html1))
    t2 = _tree_of(dom.parse_page(html2))
    d = rtdm_distance(t1, t2)
    return 1.0 - d / (_tree_size(t1) + _tree_size(t2))


# --------------------------------------------- page signature kernels


def page_signature(html: str) -> dict[str, int]:
    """{generalized anchor xpath → count} (dom.clj:264-286 histogram —
    the page.clj signature representation)."""
    return dom.anchor_xpath_histogram(dom.parse_page(html))


def cosine_sim(a: dict, b: dict) -> float:
    """page.clj cosine over sparse count maps."""
    if not a or not b:
        return 1.0 if not a and not b else 0.0
    dot = sum(v * b.get(k, 0) for k, v in a.items())
    na = math.sqrt(sum(v * v for v in a.values()))
    nb = math.sqrt(sum(v * v for v in b.values()))
    return dot / (na * nb) if na and nb else 0.0


def cardinality_sim(a: dict, b: dict) -> float:
    """|keys∩| / |keys∪| (page.clj cardinality similarity)."""
    ka, kb = set(a), set(b)
    if not ka and not kb:
        return 1.0
    return len(ka & kb) / len(ka | kb)


def manhattan_distance(a: dict, b: dict) -> float:
    """Σ|a_k − b_k| over the key union (page.clj)."""
    return float(sum(abs(a.get(k, 0) - b.get(k, 0)) for k in set(a) | set(b)))


def weighted_cosine_sim(a: dict, b: dict, weights: dict | None = None) -> float:
    """Cosine with per-key weights (page.clj weighted variant)."""
    w = weights or {}
    aw = {k: v * w.get(k, 1.0) for k, v in a.items()}
    bw = {k: v * w.get(k, 1.0) for k, v in b.items()}
    return cosine_sim(aw, bw)


# ------------------------------------- structural similarity (approx.)


def xpath_text_signature(html: str) -> dict[str, Counter]:
    """Per-text-bearing-xpath character frequency maps — the
    `structural_similarity` page representation reconstructed from call
    sites (page-text-xpaths + char-frequency-representation)."""
    root = dom.parse_page(html)
    memo = dom.XPathMemo()
    sig: dict[str, Counter] = {}

    def walk(n: dom.Node):
        for kind, payload, _off in n.content:
            if kind == "text":
                stripped = payload.strip()
                if stripped:
                    xp = memo.nopos(n)
                    sig.setdefault(xp, Counter()).update(stripped)
            else:
                walk(payload)

    walk(root)
    return sig


def structural_similarity(html1: str, html2: str) -> float:
    """Cosine over the flattened (xpath, char) → count vectors."""
    s1 = xpath_text_signature(html1)
    s2 = xpath_text_signature(html2)
    v1 = {(xp, ch): c for xp, cnt in s1.items() for ch, c in cnt.items()}
    v2 = {(xp, ch): c for xp, cnt in s2.items() for ch, c in cnt.items()}
    return cosine_sim(v1, v2)


def structurally_similar(html1: str, html2: str, threshold: float = 0.8) -> bool:
    """`similar?` predicate (thresholded; SURVEY.md §2.9)."""
    return structural_similarity(html1, html2) >= threshold


def signature_edit_distance(a: dict, b: dict) -> float:
    """page.clj signature-edit-distance: edit distance over the two
    signatures' xpath sequences (sorted for determinism), with unit
    ins/del/sub costs — the 5th page-signature kernel."""
    ka, kb = sorted(a), sorted(b)
    m, n = len(ka), len(kb)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        d[i][0] = i
    for j in range(1, n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = 0 if ka[i - 1] == kb[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + sub)
    return float(d[m][n])


def levenshtein(a: str, b: str) -> int:
    """Exact Levenshtein distance via Myers' bit-parallel algorithm
    (Myers 1999, "A fast bit-vector algorithm for approximate string
    matching") using Python's arbitrary-precision ints as the bit
    vector, so any pattern length runs in O(len(b)) big-int ops —
    ~60x faster than the classic DP on ~600-char documents.  Used by
    the edit-distance near-dup verify stage; agreement with DuckDB's
    levenshtein() is pinned by the oracle gate and a DP-equality
    test."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    m = len(a)
    peq: dict[str, int] = {}
    for i, ch in enumerate(a):
        peq[ch] = peq.get(ch, 0) | (1 << i)
    mask = (1 << m) - 1
    high = 1 << (m - 1)
    vp, vn, score = mask, 0, m
    for ch in b:
        eq = peq.get(ch, 0)
        xv = eq | vn
        d0 = ((((eq & vp) + vp) & mask) ^ vp) | xv
        hp = vn | (~(d0 | vp) & mask)
        hn = d0 & vp
        if hp & high:
            score += 1
        if hn & high:
            score -= 1
        hp = ((hp << 1) | 1) & mask
        hn = (hn << 1) & mask
        vp = hn | (~(d0 | hp) & mask)
        vn = d0 & hp
    return score
