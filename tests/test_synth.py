"""Synthetic-graph generator invariants: the golden span sequence must
equal ``dom.extract_spans(html)`` byte-for-byte (kind, text, media_ref,
order — the driver input_hint per-row invariant), and the graph must be
deterministic across calls."""

import pyarrow.parquet as pq

from crawler_ray import dom, synth


def test_span_sequence_equality():
    pages = synth.generate_site_graph(num_hosts=2, base_pages=24, seed=7)
    checked = 0
    for row in pages.to_pylist():
        if not row["html"]:
            continue  # redirect alias rows have no body
        got = dom.extract_spans(row["html"], row["doc_id"])
        assert got == row["spans"], row["doc_id"]
        checked += 1
    assert checked > 20


def test_deterministic():
    a = synth.generate_site_graph(num_hosts=2, base_pages=20, seed=11)
    b = synth.generate_site_graph(num_hosts=2, base_pages=20, seed=11)
    assert a.equals(b)
    c = synth.generate_site_graph(num_hosts=2, base_pages=20, seed=12)
    assert not a.equals(c)


def test_graph_features_present():
    pages = synth.generate_site_graph(num_hosts=3, base_pages=30, seed=42)
    rows = pages.to_pylist()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    # zipf skew: host 0 has more pages than host 2
    per_host = {}
    for r in rows:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    assert per_host["h00.example.com"] > per_host["h02.example.com"]
    assert any(r["redirect_to"] for r in rows)  # aliases
    assert any(r["disallowed"] for r in rows)  # robots
    assert any(r["is_leaf"] for r in rows)
    seeds = synth.seeds_for(pages)
    assert len(seeds) == 3 and all(s.endswith("page=1") for s in seeds)


def test_derive_from_driver_documents():
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pages = synth.derive_from_documents(docs)
    assert pages.num_rows == docs.num_rows
    rows = pages.to_pylist()
    for row in rows[:40]:
        assert dom.extract_spans(row["html"], row["doc_id"]) == row["spans"]
    hosts = {r["host"] for r in rows}
    assert len(hosts) == 20  # one host per source
