"""Unit tests for the DOM kernel — modeled on the reference's
``test/crawler/dom_test.clj`` (anchor counting, path-to-root,
tag/id/class parsing, xpath generation) plus the link-filter chain
(dom.clj:304-376) and span extraction."""

from crawler_ray import dom
from crawler_ray.functions import urlnorm

FIXTURE = """<html>
<body>
<div class="nav-bar2">
<a class="nav-item" href="/">Home</a>
<a class="nav-item" href="/about">About</a>
</div>
<div class="content-list">
<p>hello world</p>
<a class="post-link" href="/leaf/1">thread one</a>
<a class="post-link" href="/leaf/2#frag">thread two</a>
<a class="js-x" href="javascript:void(0)">expand</a>
<a class="ext" href="http://other.example.org/z">offsite</a>
<a class="spam" rel="nofollow" href="/track">ad</a>
<a href="/leaf/3">bare anchor</a>
<img src="/media/x.png"/>
</div>
</body>
</html>"""

BASE = "http://h00.example.com/index?page=1"


def test_format_attr():
    # dom.clj:101-108: strip trailing digits, prefix before -/_
    assert dom.format_attr("nav-bar2") == "nav"
    assert dom.format_attr("post_link") == "post"
    assert dom.format_attr("content99") == "content"
    assert dom.format_attr("simple") == "simple"
    assert dom.format_attr("") == ""


def test_anchor_count():
    root = dom.parse_page(FIXTURE)
    assert len(dom.anchor_tags(root)) == 8


def test_path_and_xpath():
    root = dom.parse_page(FIXTURE)
    a = dom.anchor_tags(root)[2]  # thread one
    path = dom.path_root_seq(a)
    assert [n.tag for n in path] == ["html", "body", "div", "a"]
    assert (
        dom.path_to_xpath(a, with_position=False)
        == "//html/body/div[contains(@class,'content')]/a[contains(@class,'post')]"
    )
    assert dom.path_to_xpath(a, with_position=True).endswith("a[contains(@class,'post')][1]")
    b = dom.anchor_tags(root)[3]  # thread two → position 2
    assert dom.path_to_xpath(b, with_position=True).endswith("a[contains(@class,'post')][2]")


def test_link_filter_chain():
    root = dom.parse_page(FIXTURE)
    links = dom.extract_links(root, BASE)
    urls = [l["url"] for l in links]
    # javascript:, offsite, nofollow dropped; fragment stripped; resolved
    assert urls == [
        "http://h00.example.com/",
        "http://h00.example.com/about",
        "http://h00.example.com/leaf/1",
        "http://h00.example.com/leaf/2",
        "http://h00.example.com/leaf/3",
    ]
    assert links[2]["text"] == "thread one"
    # same generalized xpath for the two post links
    assert links[2]["xpath"] == links[3]["xpath"]
    # blacklist drops
    assert all(
        l["url"] != "http://h00.example.com/about"
        for l in dom.extract_links(root, BASE, blacklist={"http://h00.example.com/about"})
    )


def test_canonicalize():
    assert urlnorm.canonicalize("/a?x=1#frag", BASE) == "http://h00.example.com/a?x=1"
    assert urlnorm.canonicalize("b.html", "http://h.com/dir/p.html") == "http://h.com/dir/b.html"
    assert urlnorm.canonicalize("javascript:void(0)", BASE) == ""
    assert urlnorm.canonicalize("HTTP://H.COM:80/P", "") == "http://h.com/P"
    # html entity unescape (dom.clj:347-351)
    assert urlnorm.canonicalize("/a?x=1&amp;y=2", BASE) == "http://h00.example.com/a?x=1&y=2"


def test_spans_extraction():
    spans = dom.extract_spans(FIXTURE, BASE)
    kinds = [s["kind"] for s in spans]
    # nav links, text, post links, js link, offsite link, nofollow link,
    # bare link, then media img
    assert kinds == ["link", "link", "text", "link", "link", "link", "link", "link", "link", "media"]
    txt = [s for s in spans if s["kind"] == "text"][0]
    assert txt["text"] == "hello world"
    assert FIXTURE[txt["offset"] : txt["offset"] + 11] == "hello world"
    link = spans[3]
    assert link["media_ref"] == "http://h00.example.com/leaf/1"
    assert FIXTURE[link["offset"] : link["offset"] + 2] == "<a"
    media = spans[-1]
    assert media["media_ref"] == "http://h00.example.com/media/x.png"


def test_xpath_histogram():
    hist = dom.anchor_xpath_histogram(dom.parse_page(FIXTURE))
    post_xp = "//html/body/div[contains(@class,'content')]/a[contains(@class,'post')]"
    assert hist[post_xp] == 2


def _xpath_link_view(root, base):
    """Backend-comparable view of a parse: every anchor's
    (xpath, no-position xpath, text) plus the filtered link list."""
    view = [
        (
            dom.path_to_xpath(a),
            dom.path_to_xpath(a, with_position=False),
            a.text().strip(),
        )
        for a in dom.anchor_tags(root)
    ]
    links = [
        (d["url"], d["xpath"], d["xpath_pos"], d["text"])
        for d in dom.extract_links(root, base)
    ]
    return view, links


def test_parser_backends_match_stdlib():
    """Every probed fast backend must produce the SAME xpath/link
    output as the stdlib tree builder on the fixture corpus (backends
    are offset-free, so spans are out of scope by contract — see
    dom.parse_page).  Skips backends absent from this container; the
    dispatch itself (env/per-call override, stdlib fallback for unknown
    names) is asserted unconditionally."""
    import pytest

    from crawler_ray import synth

    # unknown / default names fall back to stdlib
    want = _xpath_link_view(dom.parse_page(FIXTURE, backend="stdlib"), BASE)
    assert _xpath_link_view(dom.parse_page(FIXTURE), BASE) == want
    assert _xpath_link_view(dom.parse_page(FIXTURE, backend="nope"), BASE) == want

    if not dom.PARSER_BACKENDS:
        pytest.skip("no fast parser backend installed in this container")

    pages = synth.generate_site_graph(num_hosts=2, base_pages=10, seed=7)
    htmls = [FIXTURE] + pages.column("html").to_pylist()[:40]
    urls = [BASE] + pages.column("doc_id").to_pylist()[:40]
    for name in dom.PARSER_BACKENDS:
        for raw, url in zip(htmls, urls):
            got = _xpath_link_view(dom.parse_page(raw, backend=name), url)
            assert got == _xpath_link_view(dom.parse_page(raw, backend="stdlib"), url), (name, url)
