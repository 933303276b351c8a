"""Deterministic synthetic web-graph generator (FIXTURES.md §1).

The sandbox substitute for live HTTP: one row per page, "fetching" a
URL = row lookup.  Every knob is seeded/deterministic:

  * Zipf-skewed pages-per-host (exercises hot-host salting, SURVEY.md §4)
  * template nav links shared across a host's pages (template_removal.clj)
  * near-duplicate leaf pairs with token-4-gram Jaccard ≥ 0.9
    (shingles.clj:31-36)
  * redirect aliases inserted into URL-seen (utils.clj:218-223)
  * nofollow / javascript: / off-host / fragment links
    (dom.clj:315-368 filter semantics)
  * numeric-anchor pagination chains (corpus.clj:127-131)
  * leaf vs index page classes (leaf = long text spans, few links;
    index = many links — mirrors leaf_pages.clj:141-228 features)
  * robots-disallowed paths (/private/...) for the politeness stage

The generator emits BOTH the serialized HTML page and the golden span
sequence with hand-computed char offsets; ``dom.extract_spans(html)``
must reproduce the golden spans byte-for-byte (the driver input_hint
per-row invariant) — that equality is asserted in tests, so the two
constructions are independent checks of each other.
"""
from __future__ import annotations

import random

import pyarrow as pa

from .. import schemas
from ..functions.urlnorm import canonicalize, is_media_url

_VOCAB = (
    "forum thread reply post topic user board sticky archive page view "
    "message quote index discussion member profile search recent popular "
    "question answer comment vote badge tag wiki meta help about contact "
    "crawl frontier fetch parse extract dedup shard bloom filter queue "
    "token bucket robots polite depth breadth order seed host link anchor"
).split()


class _PageBuilder:
    """Accumulates one-element-per-line HTML while tracking the golden
    span list with absolute char offsets (newline-joined lines)."""

    def __init__(self, url: str):
        self.url = url
        self.lines: list[str] = []
        self.pos = 0
        self.spans: list[dict] = []

    def line(self, s: str):
        self.lines.append(s)
        self.pos += len(s) + 1  # + newline

    def text(self, s: str):
        off = self.pos + 3  # len("<p>")
        self.line(f"<p>{s}</p>")
        self.spans.append({"kind": "text", "text": s, "media_ref": "", "offset": off})

    def link(self, href: str, anchor: str, cls: str = "", rel: str = ""):
        off = self.pos
        attrs = ""
        if cls:
            attrs += f' class="{cls}"'
        if rel:
            attrs += f' rel="{rel}"'
        self.line(f'<a{attrs} href="{href}">{anchor}</a>')
        canon = canonicalize(href, self.url)
        kind = "media" if canon and is_media_url(canon) else "link"
        self.spans.append({"kind": kind, "text": anchor, "media_ref": canon, "offset": off})

    def img(self, src: str):
        off = self.pos
        self.line(f'<img src="{src}"/>')
        self.spans.append(
            {"kind": "media", "text": "", "media_ref": canonicalize(src, self.url), "offset": off}
        )

    def html(self) -> str:
        return "\n".join(self.lines)


def _words(rng: random.Random, n: int) -> list[str]:
    return [_VOCAB[rng.randrange(len(_VOCAB))] for _ in range(n)]


def _host_name(h: int) -> str:
    return f"h{h:02d}.example.com"


def generate_site_graph(
    num_hosts: int = 4,
    base_pages: int = 36,
    seed: int = 42,
    zipf: float = 0.7,
    leaf_text_words: int = 120,
    leaves_per_index: int = 6,
    neardup_pairs_per_host: int = 1,
    redirects_per_host: int = 1,
    private_per_host: int = 1,
    flat_index_hub: bool = False,
    session_gated_per_host: int = 0,
) -> pa.Table:
    """Build the full site graph → Arrow table with schema
    ``schemas.SITE_PAGES``.  Deterministic for a given arg tuple."""
    rows: list[dict] = []
    for h in range(num_hosts):
        host = _host_name(h)
        base_url = f"http://{host}"
        rng = random.Random(seed * 1_000_003 + h)  # platform-stable seeding
        n_pages = max(8, int(base_pages / (h + 1) ** zipf))
        n_index = max(2, n_pages // leaves_per_index)
        n_leaf = n_pages - n_index

        leaf_urls = [f"{base_url}/leaf/{i}" for i in range(n_leaf)]
        index_urls = [f"{base_url}/index?page={p + 1}" for p in range(n_index)]
        template_links = [
            ("/", "Home"),
            ("/index?page=1", "Forum Index"),
            ("/about", "About"),
        ]
        # deterministic leaf texts; near-dup pairs copy with one word changed
        leaf_words: list[list[str]] = []
        for i in range(n_leaf):
            dup_src = i - 1
            if (
                neardup_pairs_per_host
                and i % max(2, n_leaf // (neardup_pairs_per_host + 1)) == 1
                and dup_src >= 0
                and leaf_words
            ):
                w = list(leaf_words[dup_src])
                w[rng.randrange(len(w))] = _VOCAB[rng.randrange(len(_VOCAB))]
            else:
                w = _words(rng, leaf_text_words)
            leaf_words.append(w)

        alias_urls = [f"{base_url}/alias/{r}" for r in range(redirects_per_host)]

        # ---- index pages: template nav + content links + noise + pager
        per_index = max(1, n_leaf // n_index + 1)
        for p, url in enumerate(index_urls):
            b = _PageBuilder(url)
            b.line("<html>")
            b.line("<body>")
            b.line('<div class="nav-bar">')
            for href, txt in template_links:
                b.link(href, txt, cls="nav-item")
            b.line("</div>")
            b.line('<div class="content-list">')
            b.text(" ".join(_words(rng, 12)))
            for i in range(p * per_index, min((p + 1) * per_index, n_leaf)):
                b.link(f"/leaf/{i}", f"thread {i}: " + " ".join(leaf_words[i][:3]), cls="post-link")
            # noise links exercising the filter chain (dom.clj:315-368)
            b.link("javascript:void(0)", "expand", cls="js-toggle")
            b.link(f"http://offsite{p}.example.org/x", "partner", cls="ext-link")
            b.link(f"/leaf/{p * per_index}#comment-3", "latest comment", cls="frag-link")
            b.link("/tracking/click", "ad", cls="sponsored", rel="nofollow")
            if private_per_host:
                b.link(f"/private/{p}", "mod queue", cls="priv-link")
            if p == 0:
                for r in range(redirects_per_host):
                    b.link(f"/alias/{r}", f"shortcut {r}", cls="alias-link")
                if session_gated_per_host:
                    # login linked BEFORE the gated pages: a sequential
                    # (or wave=1) crawl logs in first, so /account pages
                    # serve their real bodies (stages/fetch.py session
                    # convention)
                    b.link("/login", "Log in", cls="login-link")
                    for g in range(session_gated_per_host):
                        b.link(f"/account/{g}", f"my account {g}", cls="account-link")
            b.img(f"/media/banner{p}.png")
            b.line("</div>")
            if flat_index_hub:
                # hub topology (bench): page 1 pager links to EVERY other
                # index page -> BFS depth ~3 instead of an O(n_index)
                # pagination chain; numeric anchors preserved
                if p == 0 and n_index > 1:
                    b.line('<div class="pager">')
                    for q in range(1, n_index):
                        b.link(f"/index?page={q + 1}", str(q + 1), cls="page-next")
                    b.line("</div>")
            elif p + 1 < n_index:
                b.line('<div class="pager">')
                b.link(f"/index?page={p + 2}", str(p + 2), cls="page-next")
                b.line("</div>")
            b.line("</body>")
            b.line("</html>")
            rows.append(
                {
                    "doc_id": url,
                    "host": host,
                    "html": b.html(),
                    "spans": b.spans,
                    "is_leaf": False,
                    "disallowed": False,
                    "redirect_to": "",
                }
            )

        # ---- leaf pages: long text, media, few links
        for i, url in enumerate(leaf_urls):
            b = _PageBuilder(url)
            b.line("<html>")
            b.line("<body>")
            b.line('<div class="nav-bar">')
            for href, txt in template_links:
                b.link(href, txt, cls="nav-item")
            b.line("</div>")
            b.line('<div class="post-body">')
            w = leaf_words[i]
            third = len(w) // 3
            b.text(" ".join(w[:third]))
            b.img(f"/media/photo{i}.jpg")
            b.text(" ".join(w[third : 2 * third]))
            b.link(f"/media/attachment{i}.png", "attachment", cls="media-link")
            b.text(" ".join(w[2 * third :]))
            b.line("</div>")
            b.line("</body>")
            b.line("</html>")
            rows.append(
                {
                    "doc_id": url,
                    "host": host,
                    "html": b.html(),
                    "spans": b.spans,
                    "is_leaf": True,
                    "disallowed": False,
                    "redirect_to": "",
                }
            )

        # ---- private (robots-disallowed) pages
        for p in range(min(private_per_host * n_index, n_index)):
            url = f"{base_url}/private/{p}"
            b = _PageBuilder(url)
            b.line("<html>")
            b.line("<body>")
            b.text("moderation queue " + " ".join(_words(rng, 20)))
            b.line("</body>")
            b.line("</html>")
            rows.append(
                {
                    "doc_id": url,
                    "host": host,
                    "html": b.html(),
                    "spans": b.spans,
                    "is_leaf": False,
                    "disallowed": True,
                    "redirect_to": "",
                }
            )

        # ---- session pages: /login sets the host cookie; /account/*
        # serve their REAL body (below) only to cookie-holding fetchers
        # (stages/fetch.py SYNTH_LOGIN_WALL otherwise) — the testable
        # in-sandbox form of utils/download-with-cookie (utils.clj:197)
        if session_gated_per_host:
            lb = _PageBuilder(f"{base_url}/login")
            lb.line("<html>")
            lb.line("<body>")
            lb.text("signed in " + " ".join(_words(rng, 8)))
            lb.link("/", "Home", cls="nav-item")
            lb.line("</body>")
            lb.line("</html>")
            rows.append(
                {"doc_id": f"{base_url}/login", "host": host, "html": lb.html(),
                 "spans": lb.spans, "is_leaf": False, "disallowed": False, "redirect_to": ""}
            )
            for g in range(session_gated_per_host):
                gb = _PageBuilder(f"{base_url}/account/{g}")
                gb.line("<html>")
                gb.line("<body>")
                gb.line('<div class="post-body">')
                gb.text("account dashboard " + " ".join(_words(rng, 60)))
                gb.line("</div>")
                gb.line("</body>")
                gb.line("</html>")
                rows.append(
                    {"doc_id": f"{base_url}/account/{g}", "host": host, "html": gb.html(),
                     "spans": gb.spans, "is_leaf": True, "disallowed": False, "redirect_to": ""}
                )

        # ---- redirect aliases (utils.clj:218-223 alias caching semantics);
        # discoverable via the "shortcut" links on each host's first index page
        for r, url in enumerate(alias_urls):
            target = leaf_urls[r % n_leaf]
            rows.append(
                {
                    "doc_id": url,
                    "host": host,
                    "html": "",
                    "spans": [],
                    "is_leaf": False,
                    "disallowed": False,
                    "redirect_to": target,
                }
            )

    return pa.Table.from_pylist(rows, schema=schemas.SITE_PAGES)


def seeds_for(pages: pa.Table) -> list[str]:
    """Seed list = page-1 index of every host (the gplus seed-list
    replay shape, gplus/core.clj:21-40)."""
    urls = pages.column("doc_id").to_pylist()
    return sorted(u for u in urls if u.endswith("/index?page=1"))


def derive_from_documents(documents: pa.Table, links_per_index: int = 8) -> pa.Table:
    """Derive a deterministic site graph FROM the driver's
    ``documents`` parquet table (doc_id:int64, text, lang, source,
    n_chars) so ``entry()`` runs the flagship crawl over driver data.

    host = ``source``; page URL = http://{source}.example/doc/{doc_id};
    every 5th doc of a source is an index page linking to
    ``links_per_index`` same-source docs at deterministic arithmetic
    offsets (target = docs[(i*131 + j*17 + 7) % n]); other docs are
    leaves whose text is chunked into spans.
    """
    by_source: dict[str, list[tuple[int, str]]] = {}
    ids = documents.column("doc_id").to_pylist()
    texts = documents.column("text").to_pylist()
    sources = documents.column("source").to_pylist()
    for did, txt, src in zip(ids, texts, sources):
        by_source.setdefault(src, []).append((did, txt))

    rows = []
    for src, docs in sorted(by_source.items()):
        docs.sort()
        host = f"{src}.example"
        base = f"http://{host}"
        n = len(docs)
        urlof = {i: f"{base}/doc/{docs[i][0]}" for i in range(n)}
        for i, (did, txt) in enumerate(docs):
            url = urlof[i]
            is_index = i % 5 == 0
            b = _PageBuilder(url)
            b.line("<html>")
            b.line("<body>")
            b.line('<div class="nav-bar">')
            b.link("/doc/" + str(docs[0][0]), "Home", cls="nav-item")
            b.line("</div>")
            if is_index:
                b.line('<div class="content-list">')
                for j in range(links_per_index):
                    t = (i * 131 + j * 17 + 7) % n
                    b.link(f"/doc/{docs[t][0]}", f"doc {docs[t][0]}", cls="post-link")
                b.line("</div>")
                # chain to the next index page (numeric anchor) so every
                # source's docs are reachable from its first index page
                nxt = i + 5
                if nxt < n:
                    b.line('<div class="pager">')
                    b.link(f"/doc/{docs[nxt][0]}", str(nxt // 5 + 2), cls="page-next")
                    b.line("</div>")
            else:
                b.line('<div class="post-body">')
                words = txt.split()
                step = max(1, len(words) // 3)
                for k in range(0, len(words), step):
                    chunk = " ".join(words[k : k + step])
                    if chunk:
                        b.text(chunk)
                b.img(f"/media/{did}.jpg")
                b.line("</div>")
            b.line("</body>")
            b.line("</html>")
            rows.append(
                {
                    "doc_id": url,
                    "host": host,
                    "html": b.html(),
                    "spans": b.spans,
                    "is_leaf": not is_index,
                    "disallowed": False,
                    "redirect_to": "",
                }
            )
    return pa.Table.from_pylist(rows, schema=schemas.SITE_PAGES)
