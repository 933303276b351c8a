"""Date-indexed record discovery over parsed pages.

Rebuilds the reference's record-detection experiment (results.html:
"Date-detection success threshold: 0.7", success = a record xpath was
discovered on 17/20 labeled forum/listing index pages in
``resources/date-indexed-data/positive``) as a library kernel:

  1. Group every element node by its generalized no-position xpath
     (dom.py path_to_xpath — the pagelet identity the reference uses
     for links, dom.clj:378-410).
  2. A group is a RECORD CANDIDATE when it repeats (>= min_records
     sibling-aligned nodes) and at least ``threshold`` of its nodes'
     subtree text contains a date (functions/dates.py).
  3. Records contain their date stamps, so every ancestor-chain of
     qualifying groups collapses to its SHALLOWEST member (the record
     container, not the date span inside it); among the surviving
     candidates the one with the most dated records wins.

Pure per-page Python — invoked from ``map_batches`` stages batched at
the Arrow level (see ``detect_records_batch``), no Ray imports.
"""
from __future__ import annotations

from .dom import Node, parse_page, path_root_seq, path_to_xpath
from .functions.dates import contains_date


def _iter_elements(root: Node):
    stack = list(root.children)
    while stack:
        n = stack.pop()
        yield n
        stack.extend(n.children)


def candidate_record_xpaths(
    root: Node, threshold: float = 0.7, min_records: int = 5
) -> list[dict]:
    """All qualifying record-xpath candidates, unfiltered for ancestry:
    ``{"xpath", "n_records", "n_dated", "frac_dated", "depth"}``."""
    from .dom import XPathMemo

    memo = XPathMemo()
    groups: dict[str, list[Node]] = {}
    for n in _iter_elements(root):
        groups.setdefault(memo.nopos(n), []).append(n)
    out = []
    for xp, nodes in groups.items():
        if len(nodes) < min_records:
            continue
        n_dated = sum(1 for n in nodes if contains_date(n.text()))
        frac = n_dated / len(nodes)
        if frac >= threshold:
            out.append(
                {
                    "xpath": xp,
                    "n_records": len(nodes),
                    "n_dated": n_dated,
                    "frac_dated": frac,
                    "depth": len(path_root_seq(nodes[0])),
                }
            )
    return out


def detect_date_indexed_records(
    root: Node, threshold: float = 0.7, min_records: int = 5
) -> dict | None:
    """Best record xpath for the page, or None (no date-indexed record
    list detected).  Ancestor-chain collapse keeps the shallowest
    qualifying group (the record CONTAINER — its date spans deeper in
    the chain also qualify with frac 1.0 but are not records); the
    survivor with the most dated records wins, depth as tie-break."""
    cands = candidate_record_xpaths(root, threshold, min_records)
    if not cands:
        return None
    # ancestor collapse on component-tuple prefixes
    keyed = {tuple(c["xpath"].lstrip("/").split("/")): c for c in cands}
    roots = [
        c
        for key, c in keyed.items()
        if not any(key[:k] in keyed for k in range(1, len(key)))
    ]
    return max(roots, key=lambda c: (c["n_dated"], -c["depth"], c["xpath"]))


def detect_records_page(
    raw_html: str, threshold: float = 0.7, min_records: int = 5
) -> dict | None:
    return detect_date_indexed_records(parse_page(raw_html), threshold, min_records)


def detect_records_batch(batch, html_col: str = "html", **kw):
    """Arrow-batch adapter: pages table → one row per page with the
    detection verdict (map_batches(detect_records_batch,
    batch_format="pyarrow"))."""
    import pyarrow as pa

    xpaths, n_recs, fracs, found = [], [], [], []
    for raw in batch[html_col].to_pylist():
        r = detect_records_page(raw or "", **kw)
        found.append(r is not None)
        xpaths.append(r["xpath"] if r else None)
        n_recs.append(r["n_records"] if r else 0)
        fracs.append(r["frac_dated"] if r else 0.0)
    cols = {
        name: batch[name]
        for name in batch.column_names
        if name != html_col  # pages don't need to travel with verdicts
    }
    cols.update(
        {
            "records_found": pa.array(found, type=pa.bool_()),
            "record_xpath": pa.array(xpaths, type=pa.string()),
            "n_records": pa.array(n_recs, type=pa.int64()),
            "frac_dated": pa.array(fracs, type=pa.float64()),
        }
    )
    return pa.table(cols)
