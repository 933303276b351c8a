"""Per-page scored decision space — ``rich-char-extractor/state-action``
(reference src/crawler/rich_char_extractor.clj:29-124) reimplemented as
a pure per-row kernel invoked from map_batches stages.

Semantics preserved faithfully (SURVEY.md §2.3, §7.5):
  * group page links by generalized xpath (path->xpath-no-position)
  * subtract template links (template-removal blacklist)
  * dedup within an xpath group by href
  * score = LINK COUNT (char count is computed but the final :score is
    the count — rich_char_extractor.clj:96-110)
  * drop zero-score groups
  * drop xpath groups with identical href sets, keeping the first
    (utils/distinct-by-fn, rich_char_extractor.clj:119-123)
  * remove-subsets: drop any xpath whose href set ⊆ another's
    (rich_char_extractor.clj:9-27; candidates ordered by href count so
    elimination order matches)
  * sort descending by score (ties: xpath string, for determinism)
"""
from __future__ import annotations

from . import dom


def state_action(links: list[dict], template_hrefs: frozenset = frozenset()) -> dict:
    """links = output of dom.extract_links (document order).  Returns
    ``{"total_nav_info": int, "xpath_nav_info": [{"xpath", "score",
    "hrefs_and_texts": [{"href","text"}…]}…]}``."""
    groups: dict[str, list[dict]] = {}
    order: list[str] = []
    for l in links:
        if l["url"] in template_hrefs:
            continue
        xp = l["xpath"]
        if xp not in groups:
            groups[xp] = []
            order.append(xp)
        groups[xp].append(l)

    infos = []
    for xp in order:
        seen_hrefs = set()
        items = []
        for l in groups[xp]:
            if l["url"] in seen_hrefs:
                continue  # per-xpath href dedup
            seen_hrefs.add(l["url"])
            items.append({"href": l["url"], "text": l["text"]})
        if not items:
            continue  # zero-score dropped
        infos.append({"xpath": xp, "score": len(items), "hrefs_and_texts": items})

    # distinct-by-fn on href-sets (first wins)
    seen_sets: list[frozenset] = []
    uniq = []
    for info in infos:
        hs = frozenset(i["href"] for i in info["hrefs_and_texts"])
        if hs in seen_sets:
            continue
        seen_sets.append(hs)
        uniq.append((info, hs))

    # remove-subsets: ascending by href count, drop any set contained in
    # a later (≥-size) one — elimination order matches the reference's
    # sort-by-count (rich_char_extractor.clj:25-27)
    uniq.sort(key=lambda p: (len(p[1]), p[0]["xpath"]))
    result = [
        info
        for i, (info, hs) in enumerate(uniq)
        if not any(hs <= other for _, other in uniq[i + 1 :])
    ]
    result.sort(key=lambda x: (-x["score"], x["xpath"]))
    return {
        "total_nav_info": sum(x["score"] for x in result),
        "xpath_nav_info": result,
    }


def extract_above_average_richest(sa: dict) -> list[dict]:
    """``extract-above-average-richest`` (rich_extractor.clj:133-202):
    the exploration selection — keep every xpath group whose score is
    strictly above the MEAN group score (vs ``rank_content_xpaths``'s
    single argmax used for extraction).  Returns the kept groups in the
    state-action's score-descending order."""
    infos = sa["xpath_nav_info"]
    if not infos:
        return []
    mean = sum(x["score"] for x in infos) / len(infos)
    return [x for x in infos if x["score"] > mean]


def leaf_by_richness(sa: dict, max_group_score: int = 3) -> bool:
    """Stateless leaf predicate: a page is a leaf when its richest
    pagelet holds ≤ ``max_group_score`` distinct links.

    The reference's ``rich-extractor/leaf?`` compares a page's richness
    to 0.75× the mean over sampled pages (rich_extractor.clj:393-397) —
    running-mean state that would break wave-parallel conformance; the
    fixed threshold is calibrated the way the reference calibrated its
    0.75 (index pages have ≥5-link pagelets, leaves ≤3)."""
    infos = sa["xpath_nav_info"]
    return not infos or infos[0]["score"] <= max_group_score


def page_state_action(html: str, url: str, template_hrefs: frozenset = frozenset(), blacklist: frozenset = frozenset()) -> dict:
    root = dom.parse_page(html)
    return state_action(dom.extract_links(root, url, blacklist=blacklist), template_hrefs)
