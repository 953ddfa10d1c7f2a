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


# --------------------------------------------------------------------------
# Vectorized Arrow column twins of the scalar kernels above. One RE2 split /
# count per batch + numpy segment reductions — no per-row Python. ASCII
# CONTRACT: RE2 classes \w/\W are ASCII, the scalar kernels' re.U classes
# are Unicode; on ASCII text the two agree exactly (the equivalence is
# pinned by tests), on non-ASCII word characters they diverge — same caveat
# as word_hashes_column (ADVICE r2).

def _word_fragments(col):
    """Split an Arrow string column on non-word runs -> (flat fragments,
    row offsets, fragment byte lengths, valid mask). Every row yields >= 1
    fragment (splitting "" gives [""]) so reduceat offsets are safe."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    text = pc.fill_null(col, "")
    lists = pc.split_pattern_regex(text, pattern=r"[\W\d_]+")
    offs = np.asarray(lists.offsets, dtype=np.int64)
    offs = offs - offs[0]  # sliced batches
    flat = lists.flatten()
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    return text, flat, offs, wlen, wlen > 0


def quality_scores_column(col) -> dict:
    """Vectorized ``quality_scores``: length, mean word length, punctuation
    ratio, EN-stopword ratio, alpha ratio — Arrow kernels + reduceat."""
    import pyarrow.compute as pc

    text, flat, offs, wlen, valid = _word_fragments(col)
    n = len(text)
    if n == 0:
        z = np.zeros(0)
        return {"length": np.zeros(0, np.int64), "mean_word_len": z,
                "punct_ratio": z, "stop_ratio": z, "alpha_ratio": z}
    length = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    n_punct = pc.count_substring_regex(text, r"[^\w\s]") \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    n_words = np.add.reduceat(valid.astype(np.int64), offs[:-1])
    n_alpha = np.add.reduceat(np.where(valid, wlen, 0), offs[:-1])
    # stopword hits: hash only the (small) batch vocabulary
    enc = pc.utf8_lower(flat).dictionary_encode()
    dvals = enc.dictionary.to_pylist()
    dstop = np.fromiter((v in _EN_STOP for v in dvals), bool, count=len(dvals))
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_stop = np.add.reduceat((dstop[idx] & valid).astype(np.int64), offs[:-1])
    fl = length.astype(np.float64)
    return {
        "length": length,
        "mean_word_len": np.divide(n_alpha, n_words,
                                   out=np.zeros(n), where=n_words > 0),
        "punct_ratio": np.divide(n_punct, fl, out=np.zeros(n), where=length > 0),
        "stop_ratio": np.divide(n_stop, n_words,
                                out=np.zeros(n), where=n_words > 0),
        "alpha_ratio": np.divide(n_alpha, fl, out=np.zeros(n), where=length > 0),
    }


def language_id_column(col) -> list:
    """Vectorized ``language_id``: per-row DISTINCT lowered words (first
    4000 chars) voted against the stopword profiles; ties break in profile
    order (en, de, fr, es, it), zero score -> 'unknown' — byte-identical to
    the scalar kernel on ASCII text."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    head = pc.utf8_slice_codeunits(pc.fill_null(col, ""), 0, 4000)
    _, flat, offs, wlen, valid = _word_fragments(head)
    n = len(head)
    if n == 0:
        return []
    enc = pc.utf8_lower(flat).dictionary_encode()
    dvals = enc.dictionary.to_pylist()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    d = max(len(dvals), 1)
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    key = np.unique(row_of[valid] * d + idx[valid])  # distinct (row, word)
    rows, dids = key // d, key % d
    langs = list(_LANG_PROFILES)
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        prof = _LANG_PROFILES[lang]
        dmask = np.fromiter((v in prof for v in dvals), bool, count=len(dvals))
        hits = dmask[dids]
        scores[:, j] = np.bincount(rows[hits], minlength=n)
    best = np.argmax(scores, axis=1)  # first max == profile order ties
    best_score = scores[np.arange(n), best]
    out = np.array(langs, dtype=object)[best]
    out[best_score == 0] = "unknown"
    return out.tolist()
