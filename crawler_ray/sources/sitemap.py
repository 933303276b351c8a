"""Sitemap-driven seed discovery — the standard entry point a real
crawl uses before falling back to homepage BFS (robots.txt ``Sitemap:``
lines → sitemapindex → urlsets).  The reference seeds from hand-made
lists (gplus/core.clj, main.clj --start); this closes the gap for live
``--transport http`` crawls while staying transport-agnostic (works
against SyntheticTransport too if the graph serves sitemap URLs).

Scope: XML ``<urlset>`` / ``<sitemapindex>`` (namespace-tolerant, with
a regex fallback for tag-soup feeds) and plain-text sitemaps (one URL
per line).  Gzip *payload* sitemaps (.xml.gz files) are out of scope —
the transport contract returns decoded text (Content-Encoding gzip IS
handled transparently by HTTPTransport).

Discovered URLs are canonicalized (functions/urlnorm.py) and filtered
to the seed host, bounded by ``max_sitemaps`` / ``max_urls`` so a
hostile sitemapindex cannot recurse or amplify unboundedly.
"""
from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from urllib.parse import urlsplit

from ..functions.urlnorm import canonicalize, same_host

_LOC_RE = re.compile(r"<loc>\s*([^<>\s][^<>]*?)\s*</loc>", re.IGNORECASE)
_SITEMAP_LINE_RE = re.compile(r"^\s*sitemap\s*:\s*(\S+)", re.IGNORECASE | re.MULTILINE)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(text: str) -> tuple[list[str], list[str]]:
    """``(page_urls, child_sitemap_urls)`` from one sitemap document.

    XML path distinguishes ``urlset`` (leaf pages) from ``sitemapindex``
    (children); malformed XML degrades to a ``<loc>`` scan treated as
    page URLs; non-XML input is read as a plain-text sitemap."""
    body = text.strip()
    if not body:
        return [], []
    if body.startswith("<"):
        try:
            root = ET.fromstring(body)
        except ET.ParseError:
            return [m.group(1) for m in _LOC_RE.finditer(body)], []
        kind = _local(root.tag)
        locs = [
            el.text.strip()
            for entry in root
            for el in entry
            if _local(el.tag) == "loc" and el.text and el.text.strip()
        ]
        if kind == "sitemapindex":
            return [], locs
        return locs, []
    # plain-text sitemap: one URL per line, junk lines skipped
    urls = [ln.strip() for ln in body.splitlines()]
    return [u for u in urls if u.startswith(("http://", "https://"))], []


def sitemaps_from_robots(robots_text: str) -> list[str]:
    """Every ``Sitemap:`` directive in a robots.txt (case-insensitive;
    the directive is host-wide per the robots convention)."""
    return [m.group(1) for m in _SITEMAP_LINE_RE.finditer(robots_text or "")]


def _fetch_text(transport, url: str) -> str:
    status, final, _hops = transport.resolve(url, [url])
    if status in ("ok", "redirect"):
        return transport.body(final)
    return ""


def discover_seeds(
    base_url: str,
    transport,
    max_sitemaps: int = 32,
    max_urls: int = 10_000,
) -> list[str]:
    """Seed list for ``base_url``'s host: robots.txt ``Sitemap:`` lines
    (fallback ``/sitemap.xml``), sitemapindex recursion bounded by
    ``max_sitemaps`` fetches, URLs canonicalized, off-host dropped,
    first-occurrence order preserved, capped at ``max_urls``."""
    parts = urlsplit(base_url)
    root = f"{parts.scheme}://{parts.netloc}"
    queue = sitemaps_from_robots(_fetch_text(transport, root + "/robots.txt"))
    if not queue:
        queue = [root + "/sitemap.xml"]

    seen_maps: set[str] = set()
    out: list[str] = []
    out_seen: set[str] = set()
    fetched = 0
    while queue and fetched < max_sitemaps and len(out) < max_urls:
        sm = queue.pop(0)
        if sm in seen_maps:
            continue
        seen_maps.add(sm)
        fetched += 1
        pages, children = parse_sitemap(_fetch_text(transport, sm))
        queue.extend(c for c in children if c not in seen_maps)
        for u in pages:
            cu = canonicalize(u)
            if not cu or not same_host(cu, base_url) or cu in out_seen:
                continue
            out_seen.add(cu)
            out.append(cu)
            if len(out) >= max_urls:
                break
    return out
