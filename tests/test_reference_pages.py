"""Calibration against the reference's own labeled real-web HTML.

The reference ships two labeled corpora this engine must handle
(the last reference ground-truth family previously untouched by tests):

  * ``resources/date-indexed-data/{positive,negative}`` — 20 positive
    forum/listing index pages + 6 negative pages, with published
    per-page record-detection outcomes in ``results.html`` ("Date-
    detection success threshold: 0.7", Success Rate 17/20, and the
    discovered record xpath per success).
  * ``resources/stack-overflow`` — 2 saved Stack Overflow pages.

These tests pin per-page extraction snapshots (parse → links → spans),
drive the leaf featurizer / structural-similarity / state-action
extractors over every page with no errors, and hold the date-indexed
record detector (crawler_ray/records.py) to the reference's published
figure: >= 17/20 positives at threshold 0.7 (measured: 20/20 — the
reference's three davita failures are genuine vBulletin record lists
our detector finds), 0/6 negatives flagged, and tag-sequence agreement
with every one of the 17 reference-discovered xpaths.

Environment-gated: skipped when /root/reference is not mounted.
"""
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference/resources"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "date-indexed-data")),
    reason="reference resources not mounted",
)

# (n_links keep_offsite, n_spans, n_records@0.7/min8, record-xpath last component)
SNAPSHOT = {
    "date-indexed-data/positive/4chan_vg.html": (925, 2773, 30, "div[contains(@class,'thread')]"),
    "date-indexed-data/positive/apple_imovie_subforum.html": (160, 301, 25, "tr[contains(@class,'jive')]"),
    "date-indexed-data/positive/ars_technica.html": (290, 685, 41, "tr"),
    "date-indexed-data/positive/davita_activity.html": (231, 495, 30, "li[contains(@class,'activitybit')]"),
    "date-indexed-data/positive/davita_dialysis_subforum.html": (364, 694, 20, "li[contains(@class,'threadbit')]"),
    "date-indexed-data/positive/davita_index.html": (297, 544, 12, "li[contains(@class,'threadbit')]"),
    "date-indexed-data/positive/fmylife_index.html": (193, 472, 14, "div[contains(@class,'post')]"),
    "date-indexed-data/positive/gaia_index.html": (486, 872, 20, "tr[contains(@class,'rowon')]"),
    "date-indexed-data/positive/gaia_mini_shops_index.html": (650, 1235, 20, "tr[contains(@class,'rowon')]"),
    "date-indexed-data/positive/gist_discover.html": (83, 561, 10, "div[contains(@class,'gist')]"),
    "date-indexed-data/positive/hn_front.html": (136, 305, 30, "td[contains(@class,'subtext')]"),
    "date-indexed-data/positive/invisionpower_subforum.html": (143, 428, 30, "tr"),
    "date-indexed-data/positive/kineyspace_index.html": (130, 337, 21, "tr"),
    "date-indexed-data/positive/phpbb_general.html": (255, 641, 25, "li[contains(@class,'row')]"),
    "date-indexed-data/positive/phpbb_support_index.html": (367, 1014, 50, "li[contains(@class,'row')]"),
    "date-indexed-data/positive/questions": (194, 419, 15, "div[contains(@class,'question')]"),
    "date-indexed-data/positive/reddit_index.html": (373, 1007, 25, "div[contains(@class,'thing')]"),
    "date-indexed-data/positive/stackoverflow_landing.html": (619, 1275, 89, "div[contains(@class,'question')]"),
    "date-indexed-data/positive/topix_carrizo_springs_tx_index.html": (381, 943, 51, "tr[contains(@class,'alt')]"),
    "date-indexed-data/positive/topix_west_helena_ar.html": (392, 808, 51, "tr[contains(@class,'alt')]"),
    "date-indexed-data/negative/4chan.html": (99, 144, 0, ""),
    "date-indexed-data/negative/amazon_affiliates.html": (30, 120, 0, ""),
    "date-indexed-data/negative/amazon_home.html": (336, 599, 0, ""),
    "date-indexed-data/negative/kindle_amazon.html": (40, 86, 0, ""),
    "date-indexed-data/negative/urbandictionary_4chan.html": (249, 340, 0, ""),
    "date-indexed-data/negative/vbulletin_home.html": (40, 86, 0, ""),
    "stack-overflow/index.html": (634, 1289, 90, "div[contains(@class,'question')]"),
    "stack-overflow/questions.html": (204, 434, 15, "div[contains(@class,'question')]"),
}


def _page(rel: str) -> str:
    with open(os.path.join(REF, rel), encoding="utf-8", errors="replace") as f:
        return f.read()


def _results_labels() -> dict[str, tuple[bool, str]]:
    """Parse the reference's published results.html → {positive page:
    (discovered?, record xpath)}."""
    with open("/root/reference/results.html", encoding="utf-8") as f:
        h = f.read()
    items = re.findall(
        r'<li>\s*<p><a href="[^"]*/positive/([^"]+)">.*?XPath: (.*?)</p>'
        r"\s*<p>Records Discovered\? (\w+)</p>",
        h,
        re.S,
    )
    return {f: (res == "Success", xp) for f, xp, res in items}


def _tagseq(xp: str) -> list[str]:
    """Tag sequence of an xpath, predicates stripped.  The reference's
    parser inserts the HTML5 implied <tbody>; stdlib html.parser does
    not, so tbody is dropped on both sides before comparing."""
    return [
        c.split("[")[0]
        for c in xp.lstrip("/").split("/")
        if c and c != "#document" and c.split("[")[0] != "tbody"
    ]


def test_all_reference_pages_parse_and_extract_pinned():
    """Every saved page parses; link/span extraction counts are pinned
    per page (regression snapshot over real tag soup)."""
    from crawler_ray.dom import anchor_xpath_histogram, extract_links, extract_spans, parse_page

    for rel, (n_links, n_spans, _, _) in SNAPSHOT.items():
        raw = _page(rel)
        root = parse_page(raw)
        links = extract_links(root, "http://fixture.test/", keep_offsite=True)
        spans = extract_spans(raw, "http://fixture.test/")
        assert len(links) == n_links, rel
        assert len(spans) == n_spans, rel
        # spans carry monotonically non-decreasing offsets into the page
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs), rel
        assert sum(anchor_xpath_histogram(root).values()) >= len(links), rel


def test_date_indexed_record_detection_matches_published_figure():
    """The reference's experiment (results.html): detection threshold
    0.7, success 17/20 positives.  Our detector: 20/20 (the three
    reference failures — the davita vBulletin pages — ARE labeled
    positive and contain dated thread/activity listings it finds),
    0/6 negatives, and the detected xpath's tag sequence agrees with
    the reference's on every one of its 17 successes."""
    from crawler_ray.records import detect_records_page

    labels = _results_labels()
    assert len(labels) == 20

    hits = {}
    for rel, (_, _, n_records, last_comp) in SNAPSHOT.items():
        if "stack-overflow" in rel:
            continue
        r = detect_records_page(_page(rel), threshold=0.7, min_records=8)
        hits[rel] = r
        # pinned per-page verdict snapshot
        assert (r["n_records"] if r else 0) == n_records, rel
        assert (r["xpath"].split("/")[-1] if r else "") == last_comp, rel

    pos = {k: v for k, v in hits.items() if "/positive/" in k}
    neg = {k: v for k, v in hits.items() if "/negative/" in k}
    n_pos = sum(1 for v in pos.values() if v is not None)
    assert n_pos >= 17, f"below the reference's published 17/20: {n_pos}/20"
    assert n_pos == 20  # measured figure, pinned
    assert all(v is None for v in neg.values())

    agree = 0
    for fname, (succ, ref_xp) in labels.items():
        if not succ:
            continue
        got = pos[f"date-indexed-data/positive/{fname}"]
        assert got is not None, fname
        a, b = _tagseq(ref_xp), _tagseq(got["xpath"])
        # record container vs a column inside it: prefix agreement
        assert a == b or a == b[: len(a)] or b == a[: len(b)], (fname, a, b)
        agree += 1
    assert agree == 17


def _dominant_url(raw: str) -> str:
    """Saved pages lost their source URL; recover the page's own host as
    the most common host among its links (the same-host filter chain
    needs it — a dummy host would drop every absolute same-site link)."""
    from collections import Counter

    from crawler_ray.dom import extract_links, parse_page
    from crawler_ray.functions.urlnorm import url_host

    root = parse_page(raw)
    hosts = Counter(
        url_host(l["url"])
        for l in extract_links(root, "http://fixture.test/", keep_offsite=True)
        if url_host(l["url"]) != "fixture.test"
    )
    return f"http://{hosts.most_common(1)[0][0]}/" if hosts else "http://fixture.test/"


def test_leaf_featurizer_and_state_action_over_real_pages():
    """The 10-dim leaf featurizer and the state-action extractor run
    error-free over all 28 saved pages; every positive (a listing/index
    page by label) is classified NON-leaf by the richness rule."""
    from crawler_ray.extractor import leaf_by_richness, page_state_action
    from crawler_ray.functions.features import leaf_features

    for rel in SNAPSHOT:
        raw = _page(rel)
        fv = leaf_features(raw)
        assert fv.shape == (10,) and np.all(np.isfinite(fv)), rel
        sa = page_state_action(raw, _dominant_url(raw))
        assert sa["total_nav_info"] >= 0, rel
        if "/positive/" in rel:
            assert not leaf_by_richness(sa), rel


def test_structural_similarity_threshold_on_real_pages():
    """Calibrates the reference's 0.8 structural-similarity threshold
    (SURVEY §7.5 approximation) on real same-engine page pairs: phpbb
    and gaia sister pages clear it; cross-site pairs score ~0."""
    from crawler_ray.functions.similarity import structural_similarity

    same_engine = [
        ("date-indexed-data/positive/phpbb_general.html",
         "date-indexed-data/positive/phpbb_support_index.html"),
        ("date-indexed-data/positive/gaia_index.html",
         "date-indexed-data/positive/gaia_mini_shops_index.html"),
        # NOT stack-overflow/questions.html vs positive/questions: same
        # site, different crawl eras — markup diverged (sim 0.04), a
        # true negative for the template identity the threshold guards
    ]
    cross_site = [
        ("date-indexed-data/positive/phpbb_general.html",
         "date-indexed-data/negative/amazon_home.html"),
        ("date-indexed-data/positive/gaia_index.html",
         "date-indexed-data/negative/kindle_amazon.html"),
        ("date-indexed-data/positive/hn_front.html",
         "date-indexed-data/negative/urbandictionary_4chan.html"),
    ]
    for a, b in same_engine:
        assert structural_similarity(_page(a), _page(b)) >= 0.8, (a, b)
    for a, b in cross_site:
        assert structural_similarity(_page(a), _page(b)) < 0.5, (a, b)


def test_record_detection_as_ray_stage(ray_session):
    """detect_records_batch drives the same kernel through a Ray Data
    map_batches stage (pyarrow batches; html column dropped from the
    output so verdicts travel without page payloads)."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.records import detect_records_batch

    rels = [
        "date-indexed-data/positive/hn_front.html",
        "date-indexed-data/positive/reddit_index.html",
        "date-indexed-data/negative/amazon_home.html",
    ]
    t = pa.table({"doc_id": rels, "html": [_page(r) for r in rels]})
    out = (
        rd.from_arrow(t)
        .map_batches(
            lambda b: detect_records_batch(b, min_records=8),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert "html" not in out.columns
    assert bool(out.loc[rels[0], "records_found"]) is True
    assert bool(out.loc[rels[1], "records_found"]) is True
    assert bool(out.loc[rels[2], "records_found"]) is False
    assert out.loc[rels[0], "n_records"] == 30
