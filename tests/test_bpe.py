"""Distributed BPE training (pipelines/bpe.py) vs the exact sequential
reference — the merge SEQUENCE must be bit-equal (same counts, same
tie-breaks)."""

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from crawler_ray.pipelines.bpe import train_bpe, train_bpe_sequential


def _ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({"text": pa.array(texts, type=pa.string())}))


def test_bpe_matches_sequential_reference(ray_session):
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low new wide lowest newest",
    ] * 3  # repetition across docs exercises the word-count shuffle
    merges, wf = train_bpe(_ds(texts), n_merges=12)
    ref = train_bpe_sequential(texts, n_merges=12)
    assert merges == ref
    assert len(merges) == 12
    # learned subwords behave: 'low</w>' must have merged fully (it is
    # the most frequent word) — its final symbol list is one token
    rows = {r["word"]: r["syms"] for r in wf.take_all()}
    assert rows["low"] == ["low</w>"]


def test_bpe_tie_break_and_stop(ray_session):
    # two pairs tied at count 2: lexicographically smallest wins on
    # BOTH sides; min_pair_count stops before degenerate merges
    texts = ["ab xy", "ab xy", "q"]
    merges, _ = train_bpe(_ds(texts), n_merges=10, min_pair_count=2)
    ref = train_bpe_sequential(texts, n_merges=10, min_pair_count=2)
    assert merges == ref
    # min_pair_count stop in the distributed regime too
    m_dist, _ = train_bpe(
        _ds(texts), n_merges=10, min_pair_count=2, small_vocab_cap=0
    )
    assert m_dist == ref
    # ('a','b</w>') < ('x','y</w>') lexicographically -> merged first
    assert merges[0][:2] == ("a", "b</w>")
    assert all(m[2] >= 2 for m in merges)


def test_bpe_regime_equality(ray_session):
    # the past-cap distributed combiner rounds (small_vocab_cap=0) must
    # produce the identical merge table AND final segmentation as the
    # default single-task regime
    texts = ["low lower lowest low low", "new newer newest new newer"] * 3
    m_small, wf_small = train_bpe(_ds(texts), n_merges=8)
    m_dist, wf_dist = train_bpe(_ds(texts), n_merges=8, small_vocab_cap=0)
    assert m_small == m_dist == train_bpe_sequential(texts, 8)
    a = {r["word"]: r["syms"] for r in wf_small.take_all()}
    b = {r["word"]: r["syms"] for r in wf_dist.take_all()}
    assert a == b


def test_bpe_encode_reproduces_training_segmentation(ray_session):
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
    ] * 2
    merges, wf = train_bpe(_ds(texts), n_merges=10)
    from crawler_ray.pipelines.bpe import encode_corpus

    trained = {r["word"]: r["syms"] for r in wf.take_all()}
    enc = encode_corpus(_ds(texts), merges, concurrency=2)
    for row in enc.take_all():
        words = row["text"].split()
        # per-word segmentation must equal the training-time final syms
        got, j = [], 0
        for w in words:
            k = len(trained[w])
            assert row["bpe_tokens"][j : j + k] == trained[w]
            j += k
        assert j == len(row["bpe_tokens"]) == row["n_bpe_tokens"]


def test_bpe_encode_unseen_word_matches_inorder_replay(ray_session):
    from crawler_ray.pipelines.bpe import _encode_word, _word_symbols

    merges3, _ = train_bpe(_ds(["low lower lowest low low"] * 2), n_merges=6)
    pairs = [(a, b) for a, b, _ in merges3]
    # unseen word: replay merges in rank order by hand (no guard) and
    # compare to the guarded _encode_word
    for w in ["slow", "lowly", "owl", "l", "zzz"]:
        syms = _word_symbols(w)
        for a, b in pairs:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert _encode_word(w, pairs) == syms, w


def test_bpe_empty_and_single_char_words(ray_session):
    merges, wf = train_bpe(_ds(["a b c", "a b", ""]), n_merges=5)
    ref = train_bpe_sequential(["a b c", "a b", ""], n_merges=5)
    assert merges == ref  # single-char words produce no pairs -> no merges
    assert merges == []


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=30
    ),
    st.integers(min_value=0, max_value=12),
)
def test_bpe_encode_fuzz_reproduces_training(words, n_merges):
    """Pure-python fuzz (no Ray): for ANY corpus, _encode_word on a
    training word must reproduce the training segmentation, and the
    guarded encoder must equal the unguarded in-order replay on
    arbitrary unseen words."""
    from collections import Counter

    from crawler_ray.pipelines.bpe import (
        _encode_word,
        _word_symbols,
        train_bpe_sequential,
    )

    texts = [" ".join(words)]
    merges = train_bpe_sequential(texts, n_merges, min_pair_count=1)
    pairs = [(a, b) for a, b, _ in merges]

    # replay training by hand to recover per-word final segmentations
    freq = Counter(words)
    table = {w: _word_symbols(w) for w in freq}
    for a, b in pairs:
        for w, syms in table.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            table[w] = out
    for w in freq:
        assert _encode_word(w, pairs) == table[w], (w, pairs)
    # unseen words: guard must not change the result
    for w in ["cab", "bbbb", "ac", "a", "abcabc"]:
        syms = _word_symbols(w)
        for a, b in pairs:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert _encode_word(w, pairs) == syms, (w, pairs)
