"""URL canonicalization + link-filter predicates.

Reproduces the semantics of the reference link extractor's URL handling
(reference ``src/crawler/dom.clj:304-376``):

  * require an ``href`` attribute                         (dom.clj:315)
  * drop ``rel=nofollow`` anchors                         (dom.clj:321-327)
  * drop ``javascript:`` (and mailto:) scheme links       (dom.clj:329-335)
  * unescape HTML entities in the href                    (dom.clj:347-351)
  * resolve relative hrefs against the page URL           (dom.clj:353-362)
  * strip the fragment                                    (dom.clj:364-368)
  * drop off-host links (``utils/in-domain?``,
    utils.clj:23-33) and blacklisted hosts                (dom.clj:337-345)

plus stable host extraction/hashing used as THE partition key for the
frontier, politeness and URL-seen shards (SURVEY.md §7.4).
"""
from __future__ import annotations

import hashlib
import html as _html
import re
from functools import lru_cache
from urllib.parse import urljoin, urlsplit, urlunsplit

# Media-extension regex — the reference defines it but never uses it
# (dom.clj:302); here it classifies span kind "media".
MEDIA_EXT_RE = re.compile(r"\.(?:jpg|jpeg|css|gif|png|xml|mp4|mp3|webm|svg|ico)(?:\?.*)?$", re.I)

_BAD_SCHEME_RE = re.compile(r"^\s*(?:javascript|mailto|tel|data):", re.I)


def canonicalize(href: str, base_url: str = "") -> str:
    """Unescape → resolve against base → strip fragment → normalize.

    Normalization: lowercase scheme+host, drop default ports, keep path
    and query verbatim, empty path → "/".  Returns "" for unusable hrefs
    (bad scheme, empty).

    Memoized (pure function): site nav/footer hrefs repeat on every
    page of a host, and absolute hrefs resolve independently of the
    base, so those cache on the href alone."""
    if not href:
        return ""
    low = href[:8].lower()
    if low.startswith("http://") or low.startswith("https://"):
        return _canonicalize_cached(href, "")
    return _canonicalize_cached(href, base_url)


@lru_cache(maxsize=1 << 16)
def _canonicalize_cached(href: str, base_url: str) -> str:
    href = _html.unescape(href).strip()
    if not href or _BAD_SCHEME_RE.match(href):
        return ""
    absu = urljoin(base_url, href) if base_url else href
    try:
        parts = urlsplit(absu)
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https", ""):
        return ""
    netloc = parts.netloc.lower()
    if netloc.endswith(":80") and scheme == "http":
        netloc = netloc[:-3]
    elif netloc.endswith(":443") and scheme == "https":
        netloc = netloc[:-4]
    path = parts.path or "/"
    # fragment stripped (dom.clj:364-368)
    return urlunsplit((scheme, netloc, path, parts.query, ""))


@lru_cache(maxsize=1 << 16)
def url_host(url: str) -> str:
    """Lowercased host of a canonical URL ('' when relative).
    Memoized: ``same_host`` re-reads the page URL's host once per
    anchor on the page."""
    try:
        return urlsplit(url).netloc.lower()
    except ValueError:
        return ""


def same_host(url: str, base_url: str) -> bool:
    """``utils/in-domain?`` (utils.clj:23-33): relative or same netloc."""
    h = url_host(url)
    return h == "" or h == url_host(base_url)


def is_media_url(url: str) -> bool:
    return bool(MEDIA_EXT_RE.search(urlsplit(url).path))


def url_hash64(url: str) -> int:
    """Stable 64-bit hash of a canonical URL (blake2b — NOT Python's
    per-process-seeded ``hash``).  Shard key for the URL-seen filter."""
    return int.from_bytes(hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "little")


def host_hash(host: str, num_partitions: int) -> int:
    """Frontier partition id: hash(host) % P (SURVEY.md §7.4)."""
    h = int.from_bytes(hashlib.blake2b(host.encode("utf-8"), digest_size=8).digest(), "little")
    return h % num_partitions
