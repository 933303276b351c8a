"""Template/boilerplate link removal — reference
``src/crawler/template_removal.clj:18-100``.

Semantics preserved: sample up to 2 links per xpath group (take 2,
template_removal.clj:27-34), fetch the samples, extract their links,
count each href's incidence across ≥ ``min_incidence`` sampled pages
(threshold 5, :70, :92) → the blacklist of template hrefs consumed by
the extractor (state_action subtracts them).

Ray shape: sample (limit per group) → fetch via the graph → explode
links → groupby(href) incidence count → broadcastable frozenset.
"""
from __future__ import annotations

import pyarrow as pa

from .. import dom


def template_blacklist_from_pages(
    sample_bodies: list[tuple[str, str]], min_incidence: int = 5
) -> frozenset[str]:
    """Pure kernel: [(url, html)] sampled pages → hrefs appearing on at
    least ``min_incidence`` distinct sampled pages."""
    counts: dict[str, int] = {}
    for url, html in sample_bodies:
        if not html:
            continue
        links = dom.extract_links(dom.parse_page(html), url)
        for u in {l["url"] for l in links}:  # distinct per page
            counts[u] = counts.get(u, 0) + 1
    return frozenset(u for u, c in counts.items() if c >= min_incidence)


def build_template_blacklist(
    pages: pa.Table,
    seed_page_urls: list[str],
    per_xpath_samples: int = 2,
    min_incidence: int = 5,
) -> frozenset[str]:
    """Full flow over the synthetic graph: from the seed pages, take up
    to ``per_xpath_samples`` links per xpath group (template_removal.clj
    take-2), resolve their bodies, count incidence."""
    idx = {u: i for i, u in enumerate(pages.column("doc_id").to_pylist())}
    bodies = pages.column("html").to_pylist()

    sampled: list[str] = []
    seen = set()
    for su in seed_page_urls:
        i = idx.get(su)
        if i is None or not bodies[i]:
            continue
        links = dom.extract_links(dom.parse_page(bodies[i]), su)
        per_xpath: dict[str, int] = {}
        for l in links:
            xp = l["xpath"]
            if per_xpath.get(xp, 0) >= per_xpath_samples:
                continue
            per_xpath[xp] = per_xpath.get(xp, 0) + 1
            if l["url"] not in seen:
                seen.add(l["url"])
                sampled.append(l["url"])

    sample_bodies = [
        (u, bodies[idx[u]]) for u in sampled if u in idx and bodies[idx[u]]
    ]
    return template_blacklist_from_pages(sample_bodies, min_incidence)
