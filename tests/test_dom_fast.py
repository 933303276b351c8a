"""The fast offset-native tokenizer (dom._parse_fast) must produce a
tree IDENTICAL to the stdlib HTMLParser builder — tags, attrs, char
offsets, and interleaved text content — on every page family we have:
synthetic graph pages, the saved reference corpus, handcrafted soup
covering each tokenizer branch, and hypothesis-generated tag soup.
The 'fast' backend is the module default, so this equality IS the
parser's correctness contract."""
import glob
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ray import dom
from crawler_ray.dom import _parse_fast, _parse_stdlib, extract_spans_from_root


def _tree_repr(n, out):
    out.append((n.tag, tuple(sorted(n.attrs.items(), key=lambda kv: kv[0])), n.offset))
    for kind, payload, off in n.content:
        if kind == "text":
            out.append(("#text", payload, off))
        else:
            _tree_repr(payload, out)
    return out


def assert_equal_trees(raw):
    a = _tree_repr(_parse_stdlib(raw), [])
    b = _tree_repr(_parse_fast(raw), [])
    assert a == b, (
        f"fast/stdlib trees diverge on {raw[:120]!r}...\n"
        f"first diff: {next(((x, y) for x, y in zip(a, b) if x != y), (len(a), len(b)))}"
    )


SOUP_CASES = [
    # every tokenizer branch, one case each
    "<html><body><p class='x'>hi &amp; bye</p></body></html>",
    "plain text only, no tags & an amp",
    "<div><br/><img src='a.png'><span a b=c d=\"e&gt;f\">t</span></div>",
    "<p>unclosed <b>bold <i>italic</p><p>next</p>",
    "<!DOCTYPE html><!-- comment --><div>x</div><!-- unterminated",
    "<?php echo 1 ?><div>pi</div><?broken",
    "<script>var a = '<div>not a tag</div>';</script><p>after</p>",
    "<style>p { color: red; }</style><p>styled</p>",
    "<script src='x.js'/><p>selfclosed script</p>",
    "<SCRIPT>UPPER</SCRIPT><p>ok</p>",
    "</div><p>stray close</p></html></body>",
    "</>bogus</ >more<//>stuff",
    "<div 'junk>literal?</div>",
    "<a href='x>y'>gt in quoted attr</a>",
    "<a href=bare>bare value</a><a checked>flag</a>",
    "<a href='a&amp;b' title=\"q&quot;q\">entity attrs</a>",
    "text &lt;escaped&gt; &#65; &#x42; &unknown; end",
    "1 < 2 and <3 hearts",
    "<![CDATA[ raw <b>stuff</b> ]]><p>after cdata</p>",
    "<![if !IE]><p>cond</p><![endif]>",
    "<!bogus declaration><p>after</p>",
    "<div a=1 a=2>dup attr</div>",
    "<p>tail drop &am",
    "<div",
    "<div class=",
    "trailing <",
    "<em></em  ><p>space in close</p>",
    "</div junk><p>tolerant close</p>",
    "<td nowrap>none-valued</td>",
    "\n<ul>\n  <li>a</li>\n  <li>b</li>\n</ul>\n",
    "<a href=''></a><b></b><a href=\"\"></a>",
    "<p>&#x1F600; emoji &#128512;</p>",
]


@pytest.mark.parametrize("raw", SOUP_CASES)
def test_fast_equals_stdlib_soup(raw):
    assert_equal_trees(raw)


def test_fast_equals_stdlib_synthetic_graph():
    from crawler_ray import synth

    pages = synth.generate_site_graph(num_hosts=3, base_pages=40, seed=11)
    for raw in pages.column("html").to_pylist():
        assert_equal_trees(raw)


REF_DIR = "/root/reference/resources"


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference corpus absent")
def test_fast_equals_stdlib_reference_pages():
    files = sorted(glob.glob(os.path.join(REF_DIR, "date-indexed-data/*/*.html")))
    files += sorted(glob.glob(os.path.join(REF_DIR, "stack-overflow/*.html")))
    assert len(files) >= 26
    for f in files:
        raw = open(f, encoding="utf-8", errors="replace").read()
        assert_equal_trees(raw)
        # and the span invariant end-to-end: same spans either way
        sa = extract_spans_from_root(_parse_stdlib(raw), "http://x.test/")
        sb = extract_spans_from_root(_parse_fast(raw), "http://x.test/")
        assert sa == sb


_soup_atoms = st.sampled_from(
    ["<div>", "</div>", "<p class='a b-2'>", "</p>", "<br/>", "text",
     "&amp;", "&#65;", "&bogus", "<", ">", "<!--c-->", "<!--", "-->",
     "<script>", "</script>", "x='y'", '"', "'", " ", "\n", "<a href=",
     "<![CDATA[", "]]>", "<!doctype html>", "</ div>", "<b", "=", "/>",
     "<?pi?>", "&", ";", "<em a=1 a=2>", "é", "<td nowrap>"]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_soup_atoms, min_size=0, max_size=30))
def test_fast_equals_stdlib_hypothesis(parts):
    assert_equal_trees("".join(parts))


def test_fast_is_default_and_safe():
    assert dom.DOM_BACKEND == "fast"
    assert dom.PARSER_BACKENDS["fast"] is dom._parse_fast_safe
    # the safe wrapper falls back on internal errors (simulate by a
    # non-string input that str methods reject)
    root = dom.parse_page("<p>ok</p>")
    assert root.children[0].tag == "p"
