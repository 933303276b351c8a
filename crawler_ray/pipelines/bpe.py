"""Distributed BPE tokenizer training (Sennrich et al. 2016, the
published subword-NMT algorithm) — the tokenizer-TRAINING stage of a
training-data pipeline (bpe_token_stats in queries.py only *applies* a
BPE-ish segmentation; this learns the merge table).

Scale shape: the corpus collapses to a (word, freq) table in ONE
word-count shuffle — every later round runs over unique words, not
documents (English-scale text is ~10^6-10^8 unique words at 100 TB vs
10^12+ tokens).  Each merge round is
    map_batches(pair partial-counts weighted by freq)
      -> bucketed groupby sum -> local top-1 prune -> tiny global sort
      -> driver reads ONE row (the winning pair)
      -> map_batches(apply merge to symbol lists)
so driver state is O(n_merges) and each round's shuffle carries pair
partials, never corpus text.  The same iterate-with-combiner pattern
as queries.py::kmeans_clusters / pagerank.

Determinism: winner = max count, tie-broken by lexicographically
smallest (left, right) — both sides of the conformance test implement
exactly this rule, so the distributed merge SEQUENCE is bit-equal to
the sequential reference.

Word symbols: characters with a terminal ``</w>`` marker (the paper's
setup), so merges never cross word boundaries.
"""
from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray


def _word_symbols(word: str) -> list[str]:
    syms = list(word)
    syms[-1] = syms[-1] + "</w>"
    return syms


def _merge_loop(freq: dict, n_merges: int, min_pair_count: int):
    """The exact merge loop over a (word -> freq) table — shared by the
    sequential test oracle and the small-vocab single-task regime, so
    both regimes are the same code by construction."""
    words = {w: _word_symbols(w) for w in freq}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            f = freq[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        ab = a + b
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


@ray.remote(num_cpus=1)
def _merge_loop_task(refs, n_merges: int, min_pair_count: int):
    """Small-vocab regime: the whole merge loop in one task over the
    collapsed (word, freq) blocks — the vocab never touches the driver."""
    freq: Counter = Counter()
    for t in ray.get(refs):
        if t.num_rows == 0:  # bucketed_agg can emit schemaless empties
            continue
        for w, f in zip(t["word"].to_pylist(), t["freq"].to_pylist()):
            freq[w] += f
    return _merge_loop(freq, n_merges, min_pair_count)


def train_bpe_sequential(texts: list[str], n_merges: int, min_pair_count: int = 2):
    """Exact sequential reference (test oracle): same tokenization,
    same tie-break, plain dicts."""
    freq: Counter = Counter()
    for t in texts:
        freq.update(t.split())
    return _merge_loop(freq, n_merges, min_pair_count)


def _apply_merge_batch(a: str, b: str):
    ab = a + b

    def fn(t: pa.Table) -> pa.Table:
        out = []
        for syms in t["syms"].to_pylist():
            i, ns = 0, []
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    ns.append(ab)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            out.append(ns)
        return pa.table(
            {
                "word": t["word"],
                "freq": t["freq"],
                "syms": pa.array(out, type=pa.list_(pa.string())),
            }
        )

    return fn


def _pair_partials(t: pa.Table) -> pa.Table:
    c: Counter = Counter()
    freqs = t["freq"].to_numpy()
    for syms, f in zip(t["syms"].to_pylist(), freqs):
        f = int(f)
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += f
    if not c:
        return pa.table(
            {
                "a": pa.array([], type=pa.string()),
                "b": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    aa, bb = zip(*c.keys())
    return pa.table(
        {
            "a": pa.array(list(aa), type=pa.string()),
            "b": pa.array(list(bb), type=pa.string()),
            "n": pa.array(list(c.values()), type=pa.int64()),
        }
    )


def _encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word by applying the trained merges IN RANK ORDER
    (each merge once, all occurrences left-to-right) — the exact replay
    of training, so any word seen at training time reproduces its
    training segmentation bit-for-bit.  A cheap substring guard skips
    merges whose fused text cannot occur in the word."""
    syms = _word_symbols(word)
    probe = word + "\x00"  # terminal marker stand-in for the guard
    for a, b in merges:
        if len(syms) < 2:
            break
        fused = (a + b).replace("</w>", "\x00")
        if fused not in probe:
            continue
        i, out = 0, []
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class BPEEncoder:
    """Actor-pool encode stage: pass to ``map_batches(BPEEncoder,
    fn_constructor_args=(merges,), concurrency=N)``.  The merge table
    is installed once per actor in ``__init__``; a per-unique-word memo
    makes Zipfian corpora cheap (most tokens are repeat words).  Input
    needs a ``text`` column; output adds ``bpe_tokens``
    (list<string>) and ``n_bpe_tokens``."""

    def __init__(self, merges: list[tuple]):
        # accept (a, b) or (a, b, count) rows
        self.merges = [(m[0], m[1]) for m in merges]
        self._memo: dict[str, list[str]] = {}

    def _word(self, w: str) -> list[str]:
        got = self._memo.get(w)
        if got is None:
            got = self._memo[w] = _encode_word(w, self.merges)
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        toks, counts = [], np.empty(t.num_rows, dtype=np.int64)
        for i, txt in enumerate(t["text"].to_pylist()):
            doc: list[str] = []
            for w in txt.split():
                doc.extend(self._word(w))
            toks.append(doc)
            counts[i] = len(doc)
        return t.append_column(
            "bpe_tokens", pa.array(toks, type=pa.list_(pa.string()))
        ).append_column("n_bpe_tokens", pa.array(counts))


def encode_corpus(docs_ds, merges: list[tuple], concurrency: int = 4):
    """Tokenize a corpus with a trained merge table: actor-pool
    map_batches so the table and the word memo live once per actor."""
    return docs_ds.map_batches(
        BPEEncoder,
        fn_constructor_args=(merges,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def train_bpe(
    docs_ds,
    n_merges: int = 30,
    min_pair_count: int = 2,
    small_vocab_cap: int = 2_000_000,
):
    """Distributed BPE training over a Dataset with a ``text`` column.

    Returns ``(merges, word_freq_ds)``: the ordered merge table
    ``[(left, right, count), ...]`` and the final symbolized word-freq
    Dataset (word, freq, syms) for downstream vocabulary export.

    Regime dispatch (same pattern as queries.py::pagerank /
    ngram_jaccard): after the one word-count shuffle the working set is
    UNIQUE WORDS, which is tiny relative to the corpus (Heaps' law —
    ~10^6-10^8 at 100 TB English vs 10^12+ tokens).  If the vocab count
    (a bounded ``count()``, not a collect) is ≤ ``small_vocab_cap``, the
    whole merge loop runs inside ONE Ray task over the collapsed table
    (~2 MB/100k words) — zero per-round dataset overhead, driver state
    still O(n_merges).  Past the cap, per-round distributed combiner
    rounds: pair partial-counts -> bucketed sum -> per-block top-1 prune
    -> driver min over ≤1 row/block -> broadcast merge apply."""
    from ..stages.relational import bucketed_agg

    def words_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            c.update(txt.split())
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "freq": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    wf = bucketed_agg(
        docs_ds.map_batches(words_partial, batch_format="pyarrow"),
        keys=["word"],
        sum_cols={"freq": "freq"},
        key_dtypes={"word": "object"},
    )

    def symbolize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "word": t["word"],
                "freq": t["freq"],
                "syms": pa.array(
                    [_word_symbols(w) for w in t["word"].to_pylist()],
                    type=pa.list_(pa.string()),
                ),
            }
        )

    wf = wf.materialize()
    if wf.count() <= small_vocab_cap:
        merges = ray.get(
            _merge_loop_task.remote(wf.to_arrow_refs(), n_merges, min_pair_count)
        )
        pairs = [(a, b) for a, b, _ in merges]

        def replay(t: pa.Table) -> pa.Table:
            words = (
                t["word"].to_pylist() if "word" in t.column_names else []
            )  # schemaless empty block
            return pa.table(
                {
                    "word": pa.array(words, type=pa.string()),
                    "freq": t["freq"]
                    if words
                    else pa.array([], type=pa.int64()),
                    "syms": pa.array(
                        [_encode_word(w, pairs) for w in words],
                        type=pa.list_(pa.string()),
                    ),
                }
            )

        return merges, wf.map_batches(replay, batch_format="pyarrow")

    wf = wf.map_batches(symbolize, batch_format="pyarrow").materialize()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        agg = bucketed_agg(
            wf.map_batches(_pair_partials, batch_format="pyarrow"),
            keys=["a", "b"],
            sum_cols={"n": "n"},
            key_dtypes={"a": "object", "b": "object"},
        )

        def prune(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            df = t.to_pandas().sort_values(
                ["n", "a", "b"], ascending=[False, True, True]
            ).head(1)
            return pa.Table.from_pandas(df, preserve_index=False)

        # ≤1 row per block after prune — the driver min is O(n_blocks)
        top = agg.map_batches(prune, batch_format="pyarrow").take_all()
        if not top:
            break
        best = min(top, key=lambda r: (-r["n"], r["a"], r["b"]))
        if best["n"] < min_pair_count:
            break
        a, b, cnt = best["a"], best["b"], int(best["n"])
        merges.append((a, b, cnt))
        wf = wf.map_batches(
            _apply_merge_batch(a, b), batch_format="pyarrow"
        ).materialize()
    return merges, wf
