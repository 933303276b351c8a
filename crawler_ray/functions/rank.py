"""Ranking kernels — reference ``src/crawler/rank.clj`` (SURVEY.md §2.6).

Per-page (row-local) kernels; the corpus-wide mean×variance groupby
variant lives in queries.py (``mean_var_score``) with a DuckDB oracle.
"""
from __future__ import annotations

import math

from .urlnorm import url_host
from .shingles import tokenize


def _url_tokens(url: str) -> set[str]:
    """utils/tokenize-url (utils.clj:191-195): path-segment slug tokens."""
    host = url_host(url)
    path = url.split(host, 1)[-1] if host else url
    out: set[str] = set()
    for seg in path.replace("?", "/").replace("&", "/").split("/"):
        for tok in seg.replace("-", " ").replace("_", " ").replace("=", " ").split():
            if tok:
                out.add(tok.lower())
    return out


def score_xpaths_1(xpath_groups: dict[str, list[dict]]) -> dict[str, float]:
    """rank.clj:132-170: per xpath, token-count per link (url ∪ anchor
    tokens) → mean × variance (population)."""
    out = {}
    for xp, links in xpath_groups.items():
        counts = [
            len(_url_tokens(l["url"]) | set(tokenize(l.get("text", ""))))
            for l in links
        ]
        n = len(counts)
        if n == 0:
            out[xp] = 0.0
            continue
        mean = sum(counts) / n
        var = sum((c - mean) ** 2 for c in counts) / n
        out[xp] = mean * var
    return out


def rank_by_uniqueness(xpath_groups: dict[str, list[dict]]) -> list[tuple[str, float]]:
    """rank.clj:76-130: xpaths sorted desc by the mean×variance
    uniqueness score."""
    scores = score_xpaths_1(xpath_groups)
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def enum_candidate_score(n_hrefs: int, df: int, novelty: float = 1.0, update: float = 1.0) -> float:
    """rank.clj:8-24: log(#hrefs+10)/df × novelty × update."""
    return math.log(n_hrefs + 10) / max(df, 1) * novelty * update


def enum_candidate_score_no_df(n_hrefs: int, novelty: float = 1.0, update: float = 1.0) -> float:
    """rank.clj:26-44 variant without document frequency."""
    return math.log(n_hrefs + 10) * novelty * update


def rank_content_xpaths(xpath_groups: dict[str, list[dict]]) -> list[tuple[str, float]]:
    """rank.clj:55-74: mean × variance × count product ranking."""
    scores = score_xpaths_1(xpath_groups)
    out = [(xp, scores[xp] * len(xpath_groups[xp])) for xp in xpath_groups]
    return sorted(out, key=lambda kv: (-kv[1], kv[0]))


def updated_hrefs(groups_a: dict[str, set], groups_b: dict[str, set]) -> int:
    """rich-extractor/updated (rich_extractor.clj:217-226): Σ of
    per-xpath href set differences between two pages."""
    return sum(
        len(groups_a.get(xp, set()) - groups_b.get(xp, set()))
        for xp in set(groups_a) | set(groups_b)
    )
