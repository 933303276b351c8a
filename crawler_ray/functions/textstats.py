"""Text-analysis kernels for the training-data pipeline operators:
token counting, quality scoring, language-ID heuristic, document
fingerprinting.  All vectorizable per batch; the SQL-oracle-facing
variants are defined so DuckDB can express the identical computation
(see crawler_ray/queries.py).
"""
from __future__ import annotations

import hashlib
import re

import numpy as np

# Small fixed stopword list shared verbatim with the SQL oracle.
STOPWORDS = ("the", "a", "of", "to", "and")

_WS_RE = re.compile(r"\s+")
_PUNCT_CHARS = set(".,;:!?'\"()[]{}-")


def space_token_count(text: str) -> int:
    """Number of single-space-separated fields — matches DuckDB
    ``len(string_split(text, ' '))`` exactly (NOT Python str.split())."""
    return text.count(" ") + 1 if text else 0


def stopword_count(text: str) -> int:
    """Count of space-separated tokens that are stopwords (same
    single-space split as the SQL oracle's list_filter)."""
    return sum(1 for t in text.split(" ") if t in STOPWORDS)


def fingerprint(text: str) -> str:
    """Document fingerprint = md5 of the normalized text (lower, collapse
    whitespace, trim) — mirrors DuckDB
    ``md5(lower(trim(regexp_replace(text,'\\s+',' ','g'))))``."""
    norm = _WS_RE.sub(" ", text).strip().lower()
    return hashlib.md5(norm.encode("utf-8")).hexdigest()


def rolling_fingerprints(text: str, window: int = 8, keep_mod: int = 0) -> list[int]:
    """Winnowing-style rolling polynomial hash fingerprints over tokens:
    hash every ``window``-token run; keep those ≡ 0 (mod 2^keep_mod) for
    a sparse sketch (keep_mod=0 keeps all)."""
    toks = text.lower().split()
    B, M = 1_000_003, (1 << 61) - 1
    out = []
    if len(toks) < window:
        runs = [toks] if toks else []
    else:
        runs = (toks[i : i + window] for i in range(len(toks) - window + 1))
    mask = (1 << keep_mod) - 1
    for run in runs:
        h = 0
        for t in run:
            th = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            h = (h * B + th) % M
        if (h & mask) == 0:
            out.append(h)
    return out


def md5_window_fingerprints(text: str, window: int = 8) -> list[str]:
    """Winnowing-style window fingerprints with an SQL-mirrorable hash:
    md5 hex of every ``window``-token run (tokens = lowercased text split
    on whitespace runs); docs shorter than ``window`` hash the whole
    token list.  The rolling polynomial variant above stays for hot
    paths; this one exists so DuckDB computes the IDENTICAL value
    (md5(array_to_string(tk[j:j+window-1], ' '))) and the fingerprint
    operator gets a real oracle."""
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    if not toks:
        return []
    if len(toks) < window:
        runs = [toks]
    else:
        runs = [toks[i : i + window] for i in range(len(toks) - window + 1)]
    import hashlib as _hl

    return [_hl.md5(" ".join(r).encode("utf-8")).hexdigest() for r in runs]


def quality_features(text: str) -> dict:
    """Quality-scoring features (length / punctuation / stopword ratios)
    — the large-scale analog of the reference's 10-dim leaf features
    (leaf_pages.clj:141-228 uses the same length/punctuation signals)."""
    n_chars = len(text)
    toks = text.split(" ") if text else []
    n_tokens = len(toks)
    n_stop = sum(1 for t in toks if t in STOPWORDS)
    n_punct = sum(1 for c in text if c in _PUNCT_CHARS)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_stopwords": n_stop,
        "n_punct": n_punct,
        "mean_token_len": (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0,
        "stopword_ratio": (n_stop / n_tokens) if n_tokens else 0.0,
    }


# ---------------------------------------------------------------- lang-id
# Character-bigram profile heuristic: score each language by overlap of
# the doc's top bigrams with a tiny per-language profile.  Deterministic,
# dependency-free; a real deployment would swap in fastText via the same
# actor-pool stage.
_LANG_PROFILES = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "es": ["de", "en", "os", "es", "la", "ar", "el", "ra", "as", "ci"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "ou", "ai", "ti"],
    "de": ["en", "er", "ch", "de", "ei", "te", "in", "ie", "ge", "un"],
    "zh": [],  # CJK detected by codepoint range below
}


def detect_lang(text: str) -> str:
    if any("一" <= c <= "鿿" for c in text[:400]):
        return "zh"
    t = re.sub(r"[^a-z ]", "", text.lower()[:1000])
    bigrams: dict[str, int] = {}
    for i in range(len(t) - 1):
        bg = t[i : i + 2]
        if " " in bg:
            continue
        bigrams[bg] = bigrams.get(bg, 0) + 1
    top = sorted(bigrams, key=lambda k: (-bigrams[k], k))[:20]
    best, best_score = "en", -1
    for lang, prof in _LANG_PROFILES.items():
        if not prof:
            continue
        score = sum(1 for bg in prof if bg in top)
        if score > best_score:
            best, best_score = lang, score
    return best


def cosine_matrix(q: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Row-normalized cosine of query rows vs matrix rows → (|q|, |m|)."""
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    return qn @ mn.T
