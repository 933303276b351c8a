"""Seeded sampling utilities (SURVEY.md §2.7).

Every sampler takes an explicit ``random.Random``/seed — the
reference's bare ``rand`` calls (utils.clj:279-298, crawl.clj:560-565,
781-801) are what make its ordering irreproducible; seeding is the
firming-up required for conformance replays.
"""
from __future__ import annotations

import random
from typing import Sequence


def random_take(items: Sequence, n: int, rng: random.Random) -> list:
    """utils/random-take (utils.clj:279-298): uniform sample without
    replacement, input order not preserved."""
    if n >= len(items):
        return list(items)
    return rng.sample(list(items), n)


def sample_proportional(weighted: list[tuple[object, float]], rng: random.Random):
    """utils/sample-proportional (utils.clj:86-104): one categorical
    draw proportional to weights."""
    total = sum(w for _, w in weighted)
    if total <= 0:
        return weighted[rng.randrange(len(weighted))][0] if weighted else None
    r = rng.random() * total
    acc = 0.0
    for item, w in weighted:
        acc += w
        if r <= acc:
            return item
    return weighted[-1][0]


def random_dequeue(queue: list, rng: random.Random):
    """utils/random-dequeue (utils.clj:35-43): pop head or tail by coin
    flip (crawl-random's queue policy, crawl.clj:781-801)."""
    if not queue:
        return None, queue
    if rng.random() < 0.5:
        return queue[0], queue[1:]
    return queue[-1], queue[:-1]


def exploration_sample(links: list, rng: random.Random, cap: int = 10, frac: int = 4) -> list:
    """crawl.clj:560-565: sample max(cap, ceil(n/frac)) links per xpath
    group for exploration."""
    n = max(cap, -(-len(links) // frac))
    return random_take(links, n, rng)


def sample_some_links(links: list, blacklist: frozenset, rng: random.Random) -> list:
    """sample/sample-some-links (sample.clj:12-29): up to
    max(4, ceil(n/10)) distinct non-blacklisted links."""
    cand = [l for l in dict.fromkeys(links) if l not in blacklist]
    n = max(4, -(-len(cand) // 10))
    return random_take(cand, n, rng)
