"""Text-analysis kernels for large-scale training-data pipelines.

These extend the engine beyond the reference's operator set (SURVEY.md notes
the reference is batch record linkage only): language identification, quality
scoring, token counting, and document fingerprinting over a ``documents``
table. All are vectorized per batch; the stopword/profile tables are the
module-level compiled state an actor pool amortizes (SURVEY.md T2 analog —
the reference's nicknames dimension table broadcast).
"""

from __future__ import annotations

import re

import numpy as np

from nhse_probabilistic_linkage_ray.functions.hashing import mix64

_WORD = re.compile(r"[^\W\d_]+", re.U)
_TOKEN_WS = re.compile(r"\S+")
# BPE-ish subword split: words, numbers, punctuation runs, whitespace runs
_BPE_ISH = re.compile(r"[^\W\d_]+|\d+|[^\w\s]+|\s+", re.U)
_PUNCT = re.compile(r"[^\w\s]", re.U)

# tiny per-language stopword profiles (n-gram heuristic seed lists; public
# common-word lists, truncated). Deliberately small: this is a heuristic
# language ID, not a model.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with", "on", "as", "are"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein", "eine", "zu", "im", "auf"},
    "fr": {"le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour", "qui", "pas", "sur", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "en", "que", "por", "con", "para", "del", "se"},
    "it": {"il", "la", "di", "e", "che", "un", "una", "per", "con", "del", "non", "sono", "come"},
}
_EN_STOP = _LANG_PROFILES["en"]


def token_count_ws(texts: list) -> np.ndarray:
    """Whitespace token count per document (int64)."""
    return np.fromiter(
        (len(_TOKEN_WS.findall(t)) if t else 0 for t in texts), dtype=np.int64, count=len(texts)
    )


def token_count_bpe_ish(texts: list) -> np.ndarray:
    """Subword-ish token count: words / digit runs / punctuation runs
    (whitespace runs excluded) — a cheap proxy for BPE token budgets."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        out[i] = sum(1 for m in _BPE_ISH.finditer(t) if not m.group().isspace()) if t else 0
    return out


def language_id(texts: list) -> list:
    """Heuristic language ID by stopword-hit voting; 'unknown' when no
    profile scores above zero or the text is empty."""
    out = []
    for t in texts:
        if not t:
            out.append("unknown")
            continue
        words = set(w.lower() for w in _WORD.findall(t[:4000]))
        best, best_score = "unknown", 0
        for lang, prof in _LANG_PROFILES.items():
            s = len(words & prof)
            if s > best_score:
                best, best_score = lang, s
        out.append(best)
    return out


def quality_scores(texts: list) -> dict:
    """Per-document quality features: length, mean word length, punctuation
    ratio, stopword ratio, alpha ratio. Returns dict of numpy arrays
    (map_batches-ready)."""
    n = len(texts)
    length = np.empty(n, dtype=np.int64)
    mean_word_len = np.zeros(n, dtype=np.float64)
    punct_ratio = np.zeros(n, dtype=np.float64)
    stop_ratio = np.zeros(n, dtype=np.float64)
    alpha_ratio = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        length[i] = len(t)
        if not t:
            continue
        words = _WORD.findall(t)
        n_alpha = sum(len(w) for w in words)
        alpha_ratio[i] = n_alpha / len(t)
        punct_ratio[i] = len(_PUNCT.findall(t)) / len(t)
        if words:
            mean_word_len[i] = n_alpha / len(words)
            stop_ratio[i] = sum(1 for w in words if w.lower() in _EN_STOP) / len(words)
    return {
        "length": length,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
    }


def fingerprint_rolling(texts: list, window: int = 64) -> np.ndarray:
    """Document fingerprint: uint64 mix of the document's rolling-window byte
    hashes (min-sampled) — stable under small shifts at window granularity.
    A cheap whole-doc near-identity key (winnowing-style, public technique)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        b = np.frombuffer(t.encode("utf-8", "surrogatepass"), dtype=np.uint8)
        if len(b) < window:
            out[i] = mix64(np.array([len(b)], dtype=np.uint64) * np.uint64(0x100000001B3)
                           + np.uint64(int(b.sum())))[0]
            continue
        # sum-based rolling window (order-weak but shift-stable), then min-sample
        c = np.cumsum(b.astype(np.int64))
        wins = (c[window - 1 :] - np.concatenate(([0], c[:-window]))).astype(np.uint64)
        pos = np.arange(len(wins), dtype=np.uint64) // np.uint64(window)
        h = mix64(wins + mix64(pos))
        # min hash per stride-block, XOR-combined: stable to local edits
        out[i] = np.bitwise_xor.reduce(np.minimum.reduceat(h, np.arange(0, len(h), window)))
    return out
