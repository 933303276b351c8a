"""Stdlib HTML → DOM tree + the reference's DOM-path / XPath semantics.

From-scratch reimplementation (stdlib ``html.parser`` only — no lxml in
this environment) of the extraction semantics of the reference's
``src/crawler/dom.clj``:

  * parse page, prune ``script``/``style``, omit comments (dom.clj:19-25)
  * ``format-attr``: normalize a class token — strip trailing digits,
    take the prefix before the first ``-``/``_``       (dom.clj:101-108)
  * ``tag-id-class``: node → (tag, first normalized class,
    position among same tag+class siblings)            (dom.clj:110-179)
  * ``path->xpath`` / ``path->xpath-no-position``: DOM path →
    generalized XPath ``tag[contains(@class,'c')]([pos])``
    — the no-position variant defines pagelet identity (dom.clj:378-410)
  * link extractor ``page-nodes-hrefs-text`` filter chain
    (require href / nofollow / javascript / unescape / resolve /
    defragment / same-host / blacklist)                (dom.clj:304-376)
  * anchor-xpath histogram (dom.clj:264-286)

plus interleaved **span extraction** (text / link / media spans with
char offsets into the serialized page) per the driver input_hint — the
media-extension regex the reference defines but never uses
(dom.clj:302) classifies spans of kind "media".

Everything here is pure per-page Python invoked from vectorized
``map_batches`` stages (one call per row, batched at the Arrow level);
no Ray imports.
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .functions.urlnorm import (
    MEDIA_EXT_RE,
    canonicalize,
    is_media_url,
    same_host,
    url_host,
)

_SKIP_TAGS = frozenset({"script", "style"})           # pruned, dom.clj:21-24
_VOID_TAGS = frozenset(
    {"img", "br", "hr", "meta", "link", "input", "source", "area", "base", "col", "embed", "track", "wbr"}
)
_MEDIA_TAGS = frozenset({"img", "video", "audio", "embed", "source"})

_TRAILING_DIGITS_RE = re.compile(r"\d+$")


@dataclass
class Node:
    tag: str
    attrs: dict
    parent: "Node | None" = None
    children: list = field(default_factory=list)
    # (kind, payload, offset) children interleaved with element children:
    # kind "text" payload is the raw text run
    content: list = field(default_factory=list)
    offset: int = 0  # char offset of the start tag in the raw page

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    def iter_text(self):
        for kind, payload, _off in self.content:
            if kind == "text":
                yield payload
            elif kind == "node":
                yield from payload.iter_text()

    def text(self) -> str:
        return "".join(self.iter_text())


class _TreeBuilder(HTMLParser):
    """Builds a Node tree with absolute char offsets (via line starts)."""

    def __init__(self, raw: str):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {})
        self.stack = [self.root]
        self.skip_depth = 0
        # line start offsets so getpos() → absolute offset (str.find is
        # a C-level scan; a per-char Python loop here was 19% of total
        # parse time on real pages)
        self.line_starts = starts = [0]
        pos = raw.find("\n")
        while pos != -1:
            starts.append(pos + 1)
            pos = raw.find("\n", pos + 1)

    def _abs(self) -> int:
        line, col = self.getpos()
        return self.line_starts[line - 1] + col

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        node = Node(tag, dict(attrs), parent=self.stack[-1], offset=self._abs())
        self.stack[-1].children.append(node)
        self.stack[-1].content.append(("node", node, node.offset))
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self.skip_depth or tag in _SKIP_TAGS:
            return
        node = Node(tag, dict(attrs), parent=self.stack[-1], offset=self._abs())
        self.stack[-1].children.append(node)
        self.stack[-1].content.append(("node", node, node.offset))

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        # tolerant close: pop to nearest matching open tag
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if self.skip_depth:
            return
        if data:
            self.stack[-1].content.append(("text", data, self._abs()))

    # comments omitted (dom.clj:23 omit-comments)
    def handle_comment(self, data):
        pass


def _parse_stdlib(raw_html: str) -> Node:
    tb = _TreeBuilder(raw_html)
    tb.feed(raw_html)
    return tb.root


# --------------------------------------------------------- fast tokenizer

# html.parser's own tolerant regexes — REUSED (not re-derived) so the
# fast path tokenizes byte-for-byte like the stdlib tree builder
import html.parser as _hp_mod
from html import unescape as _unescape

_CDATA_CLOSE = {
    t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE) for t in _SKIP_TAGS
}
_AMP_TAIL_RE = re.compile(r"[\s;]")
_MARKEDSECTION_NAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*")
_MARKEDSECTION_CLOSE = re.compile(r"]\s*]\s*>")
_MS_MARKEDSECTION_CLOSE = re.compile(r"]\s*>")


def _tolerant_pop(stack: list, tag: str):
    # tolerant close: pop to nearest matching open tag (builder rule)
    for idx in range(len(stack) - 1, 0, -1):
        if stack[idx].tag == tag:
            del stack[idx:]
            break


def _parse_fast(raw: str) -> Node:
    """Offset-native single-pass tokenizer fused with the tree-builder
    actions.  Tokenization mirrors one ``HTMLParser.feed(raw)`` with
    ``convert_charrefs=True`` and NO ``close()`` — same tolerant
    regexes (imported from html.parser, not re-derived), same
    incomplete-construct-at-EOF drops, same junk-start-tag literal
    data, same script/style CDATA scan — but skips the stdlib's
    buffering, line/col bookkeeping (updatepos/getpos) and bound-method
    dispatch, which is ~50% of its wall time.  Char offsets come free
    from the scan position.  Tree equality vs _parse_stdlib is pinned
    by tests over every fixture, the saved reference pages, and
    generated tag soup."""
    root = Node("#document", {})
    stack = [root]
    n = len(raw)
    i = 0
    find = raw.find
    startswith = raw.startswith
    tagfind = _hp_mod.tagfind_tolerant.match
    attrfind = _hp_mod.attrfind_tolerant.match
    locatestart = _hp_mod.locatestarttagend_tolerant.match
    endtagfind = _hp_mod.endtagfind.match
    commentclose = _hp_mod.commentclose.search
    while i < n:
        j = find("<", i)
        if j < 0:
            # possibly-cut charref near EOF: stdlib holds (drops) the tail
            amppos = raw.rfind("&", max(i, n - 34))
            if amppos >= 0 and not _AMP_TAIL_RE.search(raw, amppos):
                return root
            j = n
        if i < j:
            data = raw[i:j]
            if "&" in data:
                data = _unescape(data)
            if data:
                stack[-1].content.append(("text", data, i))
        i = j
        if i >= n:
            break
        c = raw[i + 1 : i + 2]
        if c.isascii() and c.isalpha():
            # ---- start tag (parse_starttag + check_for_whole_start_tag)
            # (a tried single-regex fast path for attr-less tags was
            # NET SLOWER: real pages are attribute-heavy, so the extra
            # failed match per attributed tag outweighed the win)
            m = locatestart(raw, i)
            j2 = m.end()
            nxt = raw[j2 : j2 + 1]
            if nxt == ">":
                endpos = j2 + 1
            elif nxt == "/":
                if startswith("/>", j2):
                    endpos = j2 + 2
                else:
                    return root  # stdlib: incomplete (-1) → tail dropped
            elif nxt == "":
                return root  # end of input mid-tag
            elif nxt in (
                "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
            ):
                return root  # stdlib: end of input in attribute value
            else:
                endpos = j2 if j2 > i else i + 1
            mt = tagfind(raw, i + 1)
            k = mt.end()
            tag = mt.group(1).lower()
            attrs: dict = {}
            while k < endpos:
                ma = attrfind(raw, k)
                if not ma:
                    break
                attrname, rest, attrvalue = ma.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif (
                    attrvalue[:1] == "'" == attrvalue[-1:]
                    or attrvalue[:1] == '"' == attrvalue[-1:]
                ):
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = _unescape(attrvalue)
                attrs[attrname.lower()] = attrvalue
                k = ma.end()
            end_str = raw[k:endpos].strip()
            if end_str not in (">", "/>"):
                # junk start tag → literal data, NOT unescaped (stdlib)
                data = raw[i:endpos]
                if data:
                    stack[-1].content.append(("text", data, i))
                i = endpos
                continue
            if end_str == "/>":
                if tag not in _SKIP_TAGS:
                    node = Node(tag, attrs, parent=stack[-1], offset=i)
                    stack[-1].children.append(node)
                    stack[-1].content.append(("node", node, i))
                i = endpos
                continue
            if tag in _SKIP_TAGS:
                # CDATA content element: content dropped (skip_depth),
                # scan straight to the close tag like set_cdata_mode
                mc = _CDATA_CLOSE[tag].search(raw, endpos)
                if not mc:
                    return root  # unclosed CDATA: stdlib drops the tail
                i = mc.end()
                continue
            node = Node(tag, attrs, parent=stack[-1], offset=i)
            stack[-1].children.append(node)
            stack[-1].content.append(("node", node, i))
            if tag not in _VOID_TAGS:
                stack.append(node)
            i = endpos
        elif startswith("</", i):
            # ---- end tag (parse_endtag, cdata never active here)
            gt = find(">", i + 1)
            if gt < 0:
                return root
            me = endtagfind(raw, i)
            if me:
                tag = me.group(1).lower()
                if tag not in _SKIP_TAGS:  # stray </script>: no pop
                    _tolerant_pop(stack, tag)
                i = gt + 1
                continue
            mn = tagfind(raw, i + 2)
            if not mn:
                if startswith("</>", i):
                    i += 3
                else:  # bogus comment: consume through '>'
                    pos = find(">", i + 2)
                    if pos < 0:
                        return root
                    i = pos + 1
                continue
            tag = mn.group(1).lower()
            gt2 = find(">", mn.end())
            if tag not in _SKIP_TAGS:
                _tolerant_pop(stack, tag)
            i = gt2 + 1
        elif startswith("<!--", i):
            mc2 = commentclose(raw, i + 4)
            if not mc2:
                return root
            i = mc2.end()
        elif startswith("<?", i):
            gt = find(">", i + 2)
            if gt < 0:
                return root
            i = gt + 1
        elif startswith("<!", i):
            if startswith("<![", i):
                # marked section (<![CDATA[ / <![if ...): name decides
                # the close pattern; a failed name scan degrades to a
                # bogus-comment skip (stdlib raises there)
                mn2 = _MARKEDSECTION_NAME.match(raw, i + 3)
                name = mn2.group().lower() if mn2 else ""
                pat = (
                    _MS_MARKEDSECTION_CLOSE
                    if name in ("if", "else", "endif")
                    else _MARKEDSECTION_CLOSE
                )
                mc3 = pat.search(raw, i + 3)
                if not mc3:
                    return root
                i = mc3.end()
            elif raw[i : i + 9].lower() == "<!doctype":
                gt = find(">", i + 9)
                if gt < 0:
                    return root
                i = gt + 1
            else:  # bogus comment
                pos = find(">", i + 2)
                if pos < 0:
                    return root
                i = pos + 1
        elif i + 1 < n:
            stack[-1].content.append(("text", "<", i))
            i += 1
        else:
            break
    return root


def _parse_fast_safe(raw: str) -> Node:
    """Fast tokenizer with a stdlib fallback on ANY internal error —
    the conservative default backend."""
    try:
        return _parse_fast(raw)
    except Exception:
        return _parse_stdlib(raw)


def _parse_lxml(raw_html: str) -> Node:  # pragma: no cover — lxml absent here
    """lxml.html → Node tree (same pruning/comment rules as stdlib).

    NO char offsets (lxml exposes source lines, not offsets), so this
    backend serves the xpath/link path only — ``extract_spans`` always
    parses via stdlib (see parse_page)."""
    import lxml.html as LH

    def convert(el, parent: Node):
        if not isinstance(el.tag, str):  # comment / PI: omit, keep tail
            return None
        if el.tag in _SKIP_TAGS:
            return None
        node = Node(el.tag, dict(el.attrib), parent=parent, offset=-1)
        parent.children.append(node)
        parent.content.append(("node", node, -1))
        if el.text:
            node.content.append(("text", el.text, -1))
        for ch in el:
            convert(ch, node)
            if ch.tail:  # tail text belongs to THIS node's content
                node.content.append(("text", ch.tail, -1))
        return node

    root = Node("#document", {})
    doc = LH.document_fromstring(raw_html) if raw_html.strip() else None
    if doc is not None:
        convert(doc, root)
    return root


def _parse_selectolax(raw_html: str) -> Node:  # pragma: no cover — absent here
    """selectolax (lexbor) → Node tree; xpath/link path only, like
    _parse_lxml (no char offsets)."""
    from selectolax.parser import HTMLParser as SxParser

    def convert(sx, parent: Node):
        tag = sx.tag
        if tag == "-text":
            txt = sx.text(deep=False)
            if txt:
                parent.content.append(("text", txt, -1))
            return
        if tag.startswith(("_", "!")) or tag in _SKIP_TAGS:  # comments etc.
            return
        node = Node(tag, dict(sx.attributes or {}), parent=parent, offset=-1)
        # selectolax attribute values can be None (bare attrs): '' like stdlib
        node.attrs = {k: (v if v is not None else "") for k, v in node.attrs.items()}
        parent.children.append(node)
        parent.content.append(("node", node, -1))
        ch = sx.child
        while ch is not None:
            convert(ch, node)
            ch = ch.next
        return

    root = Node("#document", {})
    sx_root = SxParser(raw_html).root
    if sx_root is not None:
        convert(sx_root, root)
    return root


def _probe_backends() -> dict:
    """Optional fast parser backends, probed like stages/media.py
    probes PIL — neither ships in this container, so the stdlib tree
    builder is the tested default; where one is installed the
    backend-parametrized dom tests assert identical xpath/link output."""
    out = {}
    try:  # pragma: no cover — not installed in this container
        import selectolax.parser  # noqa: F401

        out["selectolax"] = _parse_selectolax
    except ImportError:
        pass
    try:  # pragma: no cover — not installed in this container
        import lxml.html  # noqa: F401

        out["lxml"] = _parse_lxml
    except ImportError:
        pass
    return out


PARSER_BACKENDS = _probe_backends()
PARSER_BACKENDS["fast"] = _parse_fast_safe  # always available, offset-native
# 'fast' (default) carries char offsets like stdlib, so it serves the
# span path too; C backends (selectolax/lxml), where installed, carry
# NO offsets and accelerate xpath/link-only workloads — span
# extraction always routes through an offset-carrying backend.
import os as _os

DOM_BACKEND = _os.environ.get("CRAWLER_RAY_DOM_BACKEND", "fast")


def parse_page(raw_html: str, backend: str | None = None) -> Node:
    """``process-page`` (dom.clj:19-25): parse, prune script/style.

    ``backend``: None → the DOM_BACKEND module default ('fast', the
    offset-native tokenizer mirroring html.parser's tolerance with an
    automatic stdlib fallback; CRAWLER_RAY_DOM_BACKEND=stdlib pins the
    HTMLParser tree builder); 'lxml' / 'selectolax' parse faster still
    where installed but produce offset-free trees (xpath/link
    semantics identical, asserted by the backend-parametrized dom
    tests)."""
    b = backend or DOM_BACKEND
    fn = PARSER_BACKENDS.get(b) if b != "stdlib" else None
    return fn(raw_html) if fn else _parse_stdlib(raw_html)


# ------------------------------------------------------------------ paths


def format_attr(token: str) -> str:
    """Class-token normalization (dom.clj:101-108): strip trailing
    digits, then keep the prefix before the first ``-`` or ``_``."""
    if not token:
        return ""
    t = _TRAILING_DIGITS_RE.sub("", token)
    for i, ch in enumerate(t):
        if ch in "-_":
            return t[:i]
    return t


def node_class(node: Node) -> str:
    """First normalized class token ('' when classless)."""
    cls = node.attrs.get("class") or ""
    toks = cls.split()
    return format_attr(toks[0]) if toks else ""


def child_position(node: Node) -> int:
    """1-based position among siblings with the same (tag, class)
    (dom.clj:124-179)."""
    if node.parent is None:
        return 1
    key = (node.tag, node_class(node))
    pos = 0
    for sib in node.parent.children:
        if (sib.tag, node_class(sib)) == key:
            pos += 1
            if sib is node:
                return pos
    return max(pos, 1)


def tag_id_class(node: Node) -> tuple[str, str, int]:
    return node.tag, node_class(node), child_position(node)


def path_root_seq(node: Node) -> list[Node]:
    """Node → root path, root first (dom.clj:52-99), excluding #document."""
    path = []
    cur = node
    while cur is not None and cur.tag != "#document":
        path.append(cur)
        cur = cur.parent
    path.reverse()
    return path


def _xpath_component(node: Node, with_position: bool) -> str:
    tag, cls, pos = tag_id_class(node)
    comp = tag
    if cls:
        comp += f"[contains(@class,'{cls}')]"
    if with_position:
        comp += f"[{pos}]"
    return comp


def path_to_xpath(node: Node, with_position: bool = True) -> str:
    """``path->xpath`` / ``path->xpath-no-position`` (dom.clj:378-410).

    The no-position variant is the pagelet identity used for grouping
    links, scoring and the learned model."""
    return "//" + "/".join(_xpath_component(n, with_position) for n in path_root_seq(node))


class XPathMemo:
    """Memoized xpath computation for MANY nodes of ONE tree,
    value-identical to ``path_to_xpath`` but with each distinct node's
    component (and each node's class token, which ``child_position``
    re-reads for every sibling) computed once per memo, so a hub page
    with hundreds of anchors under one container costs O(distinct
    nodes + siblings) instead of O(anchors x depth x siblings) — 5.4x
    on the bench graph's index pages.  Caches key on ``id(node)`` —
    safe because callers hold the tree alive for the memo's lifetime.
    """

    __slots__ = ("_ncls", "_pairs")

    def __init__(self):
        self._ncls: dict[int, str] = {}
        self._pairs: dict[int, tuple[str, str]] = {}

    def _cls(self, n: Node) -> str:
        c = self._ncls.get(id(n))
        if c is None:
            c = node_class(n)
            self._ncls[id(n)] = c
        return c

    def _pair(self, n: Node) -> tuple[str, str]:
        if n is None or n.tag == "#document":
            return "", ""
        got = self._pairs.get(id(n))
        if got is not None:
            return got
        pn, pp = self._pair(n.parent)
        cls = self._cls(n)
        # child_position, inlined with the memoized class lookup
        pos = 0
        if n.parent is not None:
            key = (n.tag, cls)
            for sib in n.parent.children:
                if (sib.tag, self._cls(sib)) == key:
                    pos += 1
                    if sib is n:
                        break
        pos = max(pos, 1)
        comp = n.tag + (f"[contains(@class,'{cls}')]" if cls else "")
        got = (
            (pn + "/" + comp) if pn else comp,
            (pp + "/" + comp + f"[{pos}]") if pp else comp + f"[{pos}]",
        )
        self._pairs[id(n)] = got
        return got

    def nopos(self, node: Node) -> str:
        return "//" + self._pair(node)[0]

    def pair(self, node: Node) -> tuple[str, str]:
        a, b = self._pair(node)
        return "//" + a, "//" + b


def xpath_pair_many(nodes: list[Node]) -> list[tuple[str, str]]:
    """(no-position, with-position) xpaths for many nodes of one tree
    through a shared :class:`XPathMemo`."""
    memo = XPathMemo()
    return [memo.pair(n) for n in nodes]


# ------------------------------------------------------------------ links


def anchor_tags(root: Node) -> list[Node]:
    """All ``<a>`` nodes in document order (dom.clj:27-31)."""
    out = []

    def walk(n: Node):
        for c in n.children:
            if c.tag == "a":
                out.append(c)
            walk(c)

    walk(root)
    return out


def extract_links(
    root: Node,
    page_url: str,
    blacklist: frozenset[str] | set[str] = frozenset(),
    keep_offsite: bool = False,
) -> list[dict]:
    """THE link extractor — ``page-nodes-hrefs-text`` (dom.clj:304-376).

    Per anchor: require href (:315); drop rel=nofollow (:321-327); drop
    javascript:/mailto: (:329-335); unescape + resolve + strip fragment
    (:347-368); drop off-host (:353, utils.clj:23-33) and blacklisted
    hosts/urls (:337-345).  Emits dicts
    ``{url, text, xpath, xpath_pos, offset}`` in document order.
    """
    kept: list[tuple[Node, str]] = []
    for a in anchor_tags(root):
        href = a.attrs.get("href")
        if href is None:
            continue
        rel = (a.attrs.get("rel") or "").lower()
        if "nofollow" in rel:
            continue
        url = canonicalize(href, page_url)
        if not url:
            continue  # javascript:/mailto:/empty
        if not keep_offsite and not same_host(url, page_url):
            continue
        if url in blacklist or url_host(url) in blacklist:
            continue
        kept.append((a, url))
    xps = xpath_pair_many([a for a, _ in kept])
    return [
        {
            "url": url,
            "text": a.text(),
            "xpath": xp,
            "xpath_pos": xp_pos,
            "offset": a.offset,
        }
        for (a, url), (xp, xp_pos) in zip(kept, xps)
    ]


def anchor_xpath_histogram(root: Node) -> dict[str, int]:
    """Generalized xpath → anchor count (dom.clj:264-286)."""
    hist: dict[str, int] = {}
    for xp, _ in xpath_pair_many(anchor_tags(root)):
        hist[xp] = hist.get(xp, 0) + 1
    return hist


# ------------------------------------------------------------------ spans


def extract_spans(raw_html: str, page_url: str = "") -> list[dict]:
    """Serialize a page into interleaved (kind, text, media_ref, offset)
    spans — the driver input_hint document representation.

    kind="link"  : every <a href> anchor (text = anchor text,
                   media_ref = canonical target)
    kind="media" : media tags (img/video/audio/embed/source src) or
                   anchors whose target matches the media-extension
                   regex (dom.clj:302)
    kind="text"  : non-whitespace text runs outside anchors

    Spans appear in document order; offset = absolute char offset of
    the element start tag (link/media) or of the text run.

    Always parses via the stdlib builder — the optional fast backends
    produce offset-free trees, and offsets are part of the golden
    span invariant.
    """
    # pinned to an OFFSET-CARRYING backend (fast == stdlib tree with
    # stdlib fallback) regardless of DOM_BACKEND: the C backends have
    # no offsets and offsets are part of the golden span invariant
    return extract_spans_from_root(parse_page(raw_html, backend="fast"), page_url)


def extract_spans_from_root(root: Node, page_url: str = "") -> list[dict]:
    """Span extraction from an already-parsed tree (hot stages parse
    ONCE and feed both the link extractor and this)."""
    spans: list[dict] = []

    def walk(n: Node):
        if n.tag == "a":
            href = n.attrs.get("href")
            if href is not None:
                url = canonicalize(href, page_url)
                if url and is_media_url(url):
                    spans.append({"kind": "media", "text": n.text(), "media_ref": url, "offset": n.offset})
                else:
                    spans.append({"kind": "link", "text": n.text(), "media_ref": url, "offset": n.offset})
            return  # anchor text lives on the link span, not a text span
        if n.tag in _MEDIA_TAGS:
            src = n.attrs.get("src") or n.attrs.get("data-src") or ""
            url = canonicalize(src, page_url)
            spans.append({"kind": "media", "text": n.attrs.get("alt") or "", "media_ref": url, "offset": n.offset})
            return
        for kind, payload, off in n.content:
            if kind == "text":
                stripped = payload.strip()
                if stripped:
                    # offset points at the first non-ws char of the run
                    lead = len(payload) - len(payload.lstrip())
                    spans.append({"kind": "text", "text": stripped, "media_ref": "", "offset": off + lead})
            else:
                walk(payload)

    walk(root)
    return spans
