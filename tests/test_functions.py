"""Unit tests for shingles / minhash / simhash / textstats kernels."""

import numpy as np

from crawler_ray.functions import shingles, textstats


def test_tokenize_and_ngrams():
    assert shingles.tokenize("Hello  World FOO") == ["hello", "world", "foo"]
    g = shingles.token_ngrams("a b c d e", 4)
    assert g == {"a b c d", "b c d e"}
    # punctuation stripped, ws collapsed (shingles.clj:5-14)
    assert shingles.normalize_text("A,  b!c   d") == "a bc d"


def test_jaccard_and_neardup_threshold():
    base = " ".join(f"w{i}" for i in range(120))
    toks = base.split()
    toks[60] = "CHANGED"
    mod = " ".join(toks)
    j = shingles.jaccard(shingles.token_ngrams(base, 4), shingles.token_ngrams(mod, 4))
    assert j >= 0.9  # the reference's near-dup threshold (shingles.clj:31-36)
    other = " ".join(f"x{i}" for i in range(120))
    j2 = shingles.jaccard(shingles.token_ngrams(base, 4), shingles.token_ngrams(other, 4))
    assert j2 < 0.1


def test_minhash_estimates_jaccard():
    a = " ".join(f"w{i}" for i in range(200))
    t = a.split()
    t[10] = "zz"
    t[100] = "qq"
    b = " ".join(t)
    true_j = shingles.jaccard(shingles.token_ngrams(a, 4), shingles.token_ngrams(b, 4))
    sa = shingles.minhash_signature(a, num_perm=128)
    sb = shingles.minhash_signature(b, num_perm=128)
    est = shingles.est_jaccard(sa, sb)
    assert abs(est - true_j) < 0.15
    # deterministic across calls
    assert np.array_equal(sa, shingles.minhash_signature(a, num_perm=128))


def test_lsh_bands_collide_for_neardups():
    base = " ".join(f"w{i}" for i in range(150))
    t = base.split()
    t[5] = "CH"
    near = " ".join(t)
    far = " ".join(f"y{i}" for i in range(150))
    ka = shingles.lsh_band_keys(shingles.minhash_signature(base, 64), bands=16)
    kb = shingles.lsh_band_keys(shingles.minhash_signature(near, 64), bands=16)
    kf = shingles.lsh_band_keys(shingles.minhash_signature(far, 64), bands=16)
    assert set(ka) & set(kb)  # near-dups share a band
    assert not (set(ka) & set(kf))


def test_simhash():
    a = " ".join(f"tok{i}" for i in range(150))
    t = a.split()
    t[40] = "changed"
    b = " ".join(t)
    ha, hb = shingles.simhash64(a), shingles.simhash64(b)
    assert shingles.hamming64(ha, hb) <= 10  # 2 of 149 grams changed
    hc = shingles.simhash64(" ".join(f"other{i}" for i in range(150)))
    assert shingles.hamming64(ha, hc) > 20


def test_textstats():
    assert textstats.space_token_count("a b c") == 3
    assert textstats.stopword_count("the cat of a hat") == 3
    assert textstats.fingerprint(" A  b ") == textstats.fingerprint("a b")
    f = textstats.quality_features("the cat, sat!")
    assert f["n_tokens"] == 3 and f["n_punct"] == 2
    fps = textstats.rolling_fingerprints("a b c d e f g h i j", window=8)
    assert len(fps) == 3 and len(set(fps)) == 3
    assert textstats.detect_lang("这是一个中文文档 测试") == "zh"


def test_canonicalize_cache_never_collides_across_bases():
    """The memo keys on (href, base): an identical RELATIVE href from
    two bases resolves differently; an absolute href resolves the same
    from any base (keyed base-free on the fast path)."""
    from crawler_ray.functions.urlnorm import canonicalize

    a = canonicalize("sub/page", "http://one.com/dir/")
    b = canonicalize("sub/page", "http://two.com/other/")
    assert a == "http://one.com/dir/sub/page"
    assert b == "http://two.com/other/sub/page"
    # warm-cache re-reads stay correct
    assert canonicalize("sub/page", "http://one.com/dir/") == a
    assert (
        canonicalize("http://abs.com/x", "http://one.com/")
        == canonicalize("http://abs.com/x", "http://two.com/")
        == canonicalize("http://abs.com/x")
        == "http://abs.com/x"
    )
