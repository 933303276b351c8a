"""Synthesize a crawlable site from a learned model's xpaths.

Golden-artifact conformance support: the reference ships real learned
models (``models/*/*.model``, ``www.*/*.model``,
``resources/blog.shriphani.com-true.model``) whose action sequences
are xpaths over real sites.  ``site_from_model`` inverts those xpaths
back into HTML — one element per xpath component, anchors at each
action step — producing a deterministic pages table that
``pipelines/replay.py`` can crawl, so a reference-shipped model drives
an end-to-end replay and the harvested action paths can be asserted
against the model itself (VERDICT r3 item 8).

Only action sequences whose every step is an ``a`` component can be
instantiated as anchors (a handful of reference paths end in ``span``
— artifacts of the reference's pagelet grouping); they stay in the
model (fidelity) but get no links on the synthetic site.
"""
from __future__ import annotations

import re

import pyarrow as pa

_COMP_RE = re.compile(r"(?P<tag>[a-z][a-z0-9]*)(?:\[contains\(@class,'(?P<cls>[^']*)'\)\])?$")


def _seq_key(seq: list[str]) -> str:  # mirror of pipelines/model.py:45
    return "␟".join(seq)


def _components(xpath: str) -> list[tuple[str, str | None]]:
    """Normalized no-position xpath → [(tag, class|None), ...]."""
    assert xpath.startswith("//"), xpath
    out = []
    for seg in xpath[2:].split("/"):
        m = _COMP_RE.match(seg)
        if not m:
            raise ValueError(f"cannot invert xpath component {seg!r}")
        out.append((m.group("tag"), m.group("cls")))
    return out


def _anchor_step(xpath: str) -> bool:
    return _components(xpath)[-1][0] == "a"


class _Trie:
    __slots__ = ("children", "anchors")

    def __init__(self):
        self.children: dict[tuple[str, str | None], _Trie] = {}
        self.anchors: list[tuple[str | None, str, str]] = []  # (cls, href, text)


def _render_html(anchor_specs: list[tuple[str, str, str]], title: str) -> str:
    """anchor_specs: (anchor_xpath, href, text) → one HTML document whose
    anchors sit at exactly those no-position xpaths (shared component
    prefixes merge into one element, like a real page template)."""
    root = _Trie()
    for xp, href, text in anchor_specs:
        comps = _components(xp)
        assert comps[-1][0] == "a", xp
        node = root
        for comp in comps[:-1]:
            node = node.children.setdefault(comp, _Trie())
        node.anchors.append((comps[-1][1], href, text))

    def render(node: _Trie) -> str:
        parts = []
        for (tag, cls), child in node.children.items():
            attr = f" class=\"{cls}\"" if cls else ""
            parts.append(f"<{tag}{attr}>{render(child)}</{tag}>")
        for cls, href, text in node.anchors:
            attr = f" class=\"{cls}\"" if cls else ""
            parts.append(f"<a{attr} href=\"{href}\">{text}</a>")
        return "".join(parts)

    if not root.children:  # leaf page: no outgoing anchors
        return f"<html><body><p>{title}</p></body></html>"
    body = render(root)
    # xpaths always start //html/body/... so the trie already contains
    # the full document shell; inject the title text into the body node.
    return body


def site_from_model(
    model: dict,
    host: str = "golden.test",
    fanout: int = 2,
    n_pagination: int = 2,
) -> tuple[pa.Table, dict]:
    """Deterministic pages table crawlable by ``replay_sequential``.

    Per model-prefix page kind: anchors for every next action step
    (``fanout`` links each), plus a pagination CHAIN when the model's
    paging_actions has this prefix: page k carries one anchor with
    numeric text ``k+1`` to the next results page (the reference
    follows exactly one numeric-min pagination link per page,
    crawl.clj:479-486 — a chain is the shape that makes the expected
    visit set exact).  Full-path pages are leaves.

    Returns (pages, expected) where expected carries the ground truth
    the replay must reproduce: ``leaf_urls`` (exact harvest set),
    ``paths`` (url → root-first action path) and ``pagination_urls``.
    """
    seqs = [tuple(a["action_seq"]) for a in model["actions"]]
    usable = [s for s in seqs if all(_anchor_step(x) for x in s)]
    paging = model["pagination"]["paging_actions"]

    rows: list[dict] = []
    expected = {"leaf_urls": set(), "paths": {}, "pagination_urls": []}
    counter = [0]

    def new_url() -> str:
        counter[0] += 1
        return f"http://{host}/p{counter[0]}.html"

    def emit(url: str, path: tuple[str, ...], pag_remaining: int):
        is_leaf = path in usable
        expected["paths"][url] = list(path)
        anchor_specs: list[tuple[str, str, str]] = []
        children: list[tuple[str, tuple[str, ...], int]] = []
        if not is_leaf:
            next_steps: list[str] = []
            for s in usable:
                if len(s) > len(path) and s[: len(path)] == path:
                    step = s[len(path)]
                    if step not in next_steps:
                        next_steps.append(step)
            for step in next_steps:
                for _ in range(fanout):
                    cu = new_url()
                    anchor_specs.append((step, cu, f"item {cu.rsplit('/p',1)[1]}"))
                    children.append((cu, path + (step,), n_pagination))
        pag_xp = paging.get(_seq_key(list(path)))
        if pag_xp is not None and pag_remaining > 0 and _anchor_step(pag_xp):
            cu = new_url()
            page_no = 2 + n_pagination - pag_remaining
            anchor_specs.append((pag_xp, cu, str(page_no)))
            children.append((cu, path, pag_remaining - 1))
            expected["pagination_urls"].append(cu)
        if is_leaf:
            expected["leaf_urls"].add(url)
        rows.append(
            {
                "doc_id": url,
                "html": _render_html(anchor_specs, title=f"leaf {url}"),
                "redirect_to": "",
                "is_leaf": is_leaf,
            }
        )
        for cu, cpath, cpag in children:
            emit(cu, cpath, cpag)

    entry = f"http://{host}/index.html"
    expected["entry"] = entry
    emit(entry, (), n_pagination)
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows]),
            "html": pa.array([r["html"] for r in rows], type=pa.large_string()),
            "redirect_to": pa.array([r["redirect_to"] for r in rows]),
            "is_leaf": pa.array([r["is_leaf"] for r in rows]),
        }
    ), expected
