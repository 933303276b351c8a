"""Shingling / MinHash / LSH / SimHash kernels.

Reference semantics reproduced:
  * ``utils/tokenize`` — lowercase whitespace tokenizer (utils.clj:179-189)
  * ``shingles/html-doc-4-grams`` — lowercase, strip punctuation,
    collapse whitespace → set of token 4-grams       (shingles.clj:5-26)
  * 4-gram Jaccard near-duplicate test, threshold 0.9 (shingles.clj:28-43)

The reference's ``seen?`` scans the whole old corpus per page
(crawl.clj:237-244 — O(corpus) per doc); here the scale path is a
MinHash signature column + banded-LSH groupby that generates candidate
pairs, then exact-Jaccard verification (SURVEY.md §2.8).

All hashes are process-stable (blake2b), never Python's salted
``hash()`` — signatures must agree across Ray workers.
"""
from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import numpy as np
import pandas as pd

_PUNCT_RE = re.compile(r"[^\w\s]+", re.U)
_WS_RE = re.compile(r"\s+")

# 31-bit Mersenne prime: (a*x+b) with a,x < 2^31 fits in uint64, so the
# whole (num_perm × n_shingles) permutation grid stays vectorized numpy.
_MERSENNE = (1 << 31) - 1


def tokenize(text: str) -> list[str]:
    """``utils/tokenize`` (utils.clj:179-189): lowercase + whitespace split."""
    return text.lower().split()


def normalize_text(text: str) -> str:
    """shingles.clj:5-14 normalization: lowercase, strip punctuation,
    collapse whitespace."""
    return _WS_RE.sub(" ", _PUNCT_RE.sub("", text.lower())).strip()


def normalize_tokens(text: str) -> list[str]:
    """``normalize_text(text).split()`` without the redundant
    whitespace-collapse regex pass (``str.split()`` already splits on
    runs) — 2.4x on the crawl's leaf pages; list-equal by contract
    (asserted across the soak corpus)."""
    return _PUNCT_RE.sub("", text.lower()).split()


def token_ngrams(text: str, n: int = 4) -> set[str]:
    """``html-doc-4-grams`` (shingles.clj:16-26): set of space-joined
    token n-grams of the normalized text."""
    toks = normalize_tokens(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    """shingles.clj:28-36."""
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


@lru_cache(maxsize=1 << 17)
def stable_hash64(s: str) -> int:
    # memoized: natural-language token distributions are Zipfian, so a
    # per-process cache turns most token hashes into dict hits
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


# position multipliers + murmur3-style finalizer for the vectorized
# window combine below (odd constants, so each is invertible mod 2^64
# and content-equal windows — and only those — share a hash)
_WINDOW_C = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5,
     0x85EBCA6B2545F491, 0xC2B2AE3500000001, 0x9E3779B97F4A7C55, 0x165667B19E3779D1],
    dtype=np.uint64,
)
_FMIX = np.uint64(0xFF51AFD7ED558CCD)

# Wire-format version of the gram-hash family.  Near-dup index
# snapshots store raw _shingle_hashes values; a checkpoint written
# under one hash family silently under-reports Jaccard against grams
# computed under another, so every snapshot embeds this version and
# restore REFUSES a mismatch (rebuild the index from the corpus
# instead).  Bump whenever _shingle_hashes' output values change:
#   1 = per-gram blake2b (rounds 1-2)
#   2 = position-weighted window combine + murmur finalizer (round 3+)
SHINGLE_WIRE_VERSION = 2


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Stable 31-bit shingle hashes (uint64 dtype for overflow-free math).

    Vectorized: blake2b once per DISTINCT token, then every length-n
    window combines its token hashes with position-weighted odd
    multipliers + a murmur-style finalizer — one numpy pass instead of
    one string-join + one blake2b PER GRAM (2.4x faster on the crawl's
    700-word leaf pages, where this was 58% of enrich time).  Two
    windows hash equal iff their token sequences are equal (up to the
    ~1e-9 31-bit collision odds the docstring of shingle_hash_set
    already accepts); values are process-stable like before, but NOT
    equal to the old per-gram-blake2b values (internal wire format
    only — the sequential oracle shares this function, and the SQL
    oracles hash raw gram strings on their own path)."""
    assert n <= len(_WINDOW_C), "extend _WINDOW_C for larger shingle sizes"
    toks = normalize_tokens(text)
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    # hash-based C-speed vocab mapping, insertion-ordered exactly like
    # the old dict loop (np.unique's string SORT measured slower);
    # stable_hash64 is memoized so repeated tokens across pages cost a
    # dict hit, not a blake2b
    codes, uniques = pd.factorize(np.asarray(toks, dtype=object), sort=False)
    th = np.fromiter(
        (stable_hash64(t) for t in uniques), dtype=np.uint64, count=len(uniques)
    )
    h = th[codes]
    with np.errstate(over="ignore"):
        if len(toks) < n:
            acc = np.zeros(1, dtype=np.uint64)
            for j in range(len(toks)):
                acc += h[j] * _WINDOW_C[j]
        else:
            W = len(toks) - n + 1
            acc = np.zeros(W, dtype=np.uint64)
            for j in range(n):
                acc += h[j : j + W] * _WINDOW_C[j]
        acc *= _FMIX
        acc ^= acc >> np.uint64(33)
    return acc & _MERSENNE


@lru_cache(maxsize=64)
def minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficients for h_i(x) = (a_i*x + b_i) mod p.
    Memoized (RandomState construction costs ~0.3 ms); the returned
    arrays are write-protected because they are shared."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    a.setflags(write=False)
    b.setflags(write=False)
    return a, b


def minhash_signature(text: str, num_perm: int = 64, ngram: int = 4, params=None) -> np.ndarray:
    """MinHash signature over token n-gram shingles (vectorized: one
    (num_perm × n_shingles) broadcast-min per doc, pure uint64)."""
    a, b = params if params is not None else minhash_params(num_perm)
    h = _shingle_hashes(text, ngram)
    sig = ((a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)).min(axis=1)
    return sig.astype(np.uint64)


def minhash_signatures_batch(
    texts: list[str], num_perm: int = 64, ngram: int = 4, seed: int = 1
) -> np.ndarray:
    """(len(texts), num_perm) uint64 signature matrix."""
    params = minhash_params(num_perm, seed)
    return np.vstack([minhash_signature(t, num_perm, ngram, params) for t in texts])


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Banded LSH: split the signature into ``bands`` rows-per-band
    groups; key = stable hash of (band_id, band values).  Docs sharing
    any band key are candidate near-dup pairs."""
    num_perm = len(sig)
    rows = num_perm // bands
    keys = []
    for bidx in range(bands):
        chunk = sig[bidx * rows : (bidx + 1) * rows]
        payload = bidx.to_bytes(4, "little") + chunk.tobytes()
        keys.append(
            int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        )
    return keys


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def simhash64(text: str, ngram: int = 2) -> int:
    """64-bit SimHash over token n-grams (weight = 1 per distinct gram)."""
    grams = token_ngrams(text, ngram)
    if not grams:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for g in grams:
        h = stable_hash64(g)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def md5_hash64(s: str) -> int:
    """Low 64 bits of md5, little-endian — EXACTLY DuckDB's
    ``md5_number_lower(s)`` (verified byte-order), so SimHash built on
    this gram hash has a SQL oracle."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def ws_token_ngrams(text: str, n: int = 2) -> set[str]:
    """Token n-gram set over a plain lowercase whitespace split (no
    punctuation stripping) — the SQL-mirrorable gram family
    (string_split_regex(lower(text), '\\s+')); short docs collapse to
    one gram of all tokens, empty docs to none."""
    toks = [t for t in _WS_RE.split(text.lower()) if t]
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def simhash64_md5(text: str, ngram: int = 2) -> int:
    """64-bit SimHash over whitespace-split token n-grams with the
    md5_number_lower gram hash — value-identical to the DuckDB mirror
    in queries.py (simhash_neardup oracle).  Vectorized: one md5 per
    gram, then a single (n_grams × 64) bit unpack + column sum."""
    grams = ws_token_ngrams(text, ngram)
    if not grams:
        return 0
    hs = np.fromiter((md5_hash64(g) for g in grams), dtype=np.uint64, count=len(grams))
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = np.where(bits.astype(bool), 1, -1).sum(axis=0)
    out = 0
    for i in np.nonzero(acc > 0)[0]:
        out |= 1 << int(i)
    return out


def shingle_hash_set(text: str, n: int = 4) -> np.ndarray:
    """Sorted unique 31-bit shingle hashes — the wire format for
    near-dup state.  Hashed shingles cut serialized size ~4x vs strings
    and make exact-Jaccard verification a vectorized
    ``np.intersect1d``; collision probability at 10^5 shingles is
    ~1e-9 (documented approximation vs string sets)."""
    return np.unique(_shingle_hashes(text, n))


def minhash_from_hashes(h: np.ndarray, num_perm: int = 64, params=None) -> np.ndarray:
    """MinHash signature from precomputed shingle hashes (avoids
    re-shingling when both the signature and the hash set are needed)."""
    a, b = params if params is not None else minhash_params(num_perm)
    if len(h) == 0:
        h = np.zeros(1, dtype=np.uint64)
    return ((a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)).min(axis=1).astype(np.uint64)


def jaccard_hashes(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over sorted-unique hash arrays (vectorized)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
