"""Property-based tests (hypothesis) for the pure kernels."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ray import dom
from crawler_ray.functions import shingles, urlnorm

urls = st.text(
    alphabet=string.ascii_letters + string.digits + ":/?#&.=%-_~",
    min_size=0,
    max_size=60,
)
texts = st.text(alphabet=string.ascii_lowercase + " ", max_size=200)


@settings(max_examples=200, deadline=None)
@given(urls)
def test_canonicalize_idempotent(href):
    once = urlnorm.canonicalize(href, "http://base.example/dir/")
    twice = urlnorm.canonicalize(once) if once else ""
    assert twice == once
    # canonical urls never carry fragments
    assert "#" not in once.split("?")[-1] or "#" not in once


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + string.digits + "-_", max_size=20))
def test_format_attr_properties(tok):
    # NOT idempotent by the reference's own definition ("1-a" → "1" →
    # ""): digits are stripped before the -/_ split, so a numeric
    # prefix survives one pass.  Guaranteed: deterministic, separator-
    # free, and a fixpoint within two applications.
    once = dom.format_attr(tok)
    assert once == dom.format_attr(tok)
    assert "-" not in once and "_" not in once
    twice = dom.format_attr(once)
    assert dom.format_attr(twice) == twice


@settings(max_examples=100, deadline=None)
@given(texts, texts)
def test_jaccard_bounds_and_symmetry(a, b):
    ga, gb = shingles.token_ngrams(a, 4), shingles.token_ngrams(b, 4)
    j = shingles.jaccard(ga, gb)
    assert 0.0 <= j <= 1.0
    assert j == shingles.jaccard(gb, ga)
    assert shingles.jaccard(ga, ga) == 1.0
    # hashed variant agrees with the set variant (no collisions at this size)
    ha, hb = shingles.shingle_hash_set(a, 4), shingles.shingle_hash_set(b, 4)
    assert abs(shingles.jaccard_hashes(ha, hb) - j) < 1e-9


@settings(max_examples=50, deadline=None)
@given(texts)
def test_minhash_deterministic_and_bounded(t):
    s1 = shingles.minhash_signature(t, num_perm=32)
    s2 = shingles.minhash_signature(t, num_perm=32)
    assert (s1 == s2).all() and len(s1) == 32
    keys = shingles.lsh_band_keys(s1, bands=8)
    assert len(keys) == 8
    assert keys == shingles.lsh_band_keys(s2, bands=8)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=string.printable, max_size=300))
def test_parser_never_crashes(html):
    root = dom.parse_page(html)
    dom.extract_links(root, "http://h.example/")
    dom.extract_spans(html, "http://h.example/")
    # span offsets always index into the raw string
    for s in dom.extract_spans(html, "http://h.example/"):
        assert 0 <= s["offset"] <= len(html)


def test_md5_hash64_equals_duckdb_md5_number_lower_hypothesis():
    """Many oracles mirror Python hashing with DuckDB's
    md5_number_lower — property-test the equivalence over arbitrary
    unicode (the foundation under simhash/kmv/mixture oracles)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawler_ray.functions.shingles import md5_hash64

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=0, max_size=64).filter(lambda s: "\x00" not in s))
    def prop(s):
        want = con.execute("SELECT md5_number_lower(?)", [s]).fetchone()[0]
        assert md5_hash64(s) == want, repr(s)

    prop()
