"""Longest-common-substring fraction over token-hash sequences.

The near-miss rescue tier named by the north star ("suffix-array
longest-common-substring verification"); analog of the reference's
levenshtein/jaro-winkler near-miss comparison levels
(``/root/reference/utils/parameter_lists.py:108,25``).

Algorithm: binary search on the LCS length L; the predicate "do a and b share
a common substring of length L" is answered by intersecting the sets of
rolling polynomial hashes of all L-grams — O((n+m) log min(n,m)) total, fully
vectorized. Substrings are over the *token-hash sequence* (order-preserving,
duplicates kept), so the measure is whitespace/format-insensitive, matching
the normalize->tokenize front end. Two independent 31-bit modular hashes make
false-positive probability ~ (n*m)/2^62 — negligible and one-sided (can only
overestimate LCS, never underestimate; the tests pin exact values on
adversarial fixtures).

This replaces an O(n*m) suffix-automaton/difflib scan with a vectorized
numpy kernel — the per-pair cost matters because the rescue pair set can be
large under skew.
"""

from __future__ import annotations

import numpy as np

_P1 = np.int64(2147483629)  # primes < 2^31
_P2 = np.int64(2147483587)
_B1 = np.int64(1000003)
_B2 = np.int64(1000033)

_pow_cache: dict = {}


def _powers(base: np.int64, mod: np.int64, n: int) -> np.ndarray:
    """pow table base^i mod p, grown geometrically and cached per process
    (the 'compile once per worker' state of SURVEY.md T1)."""
    key = (int(base), int(mod))
    arr = _pow_cache.get(key)
    if arr is None or len(arr) < n + 1:
        size = max(1024, 1 << (n + 1).bit_length())
        arr = np.empty(size, dtype=np.int64)
        arr[0] = 1
        # sequential but data-independent and cached; vectorized per block
        for i in range(1, size):
            arr[i] = (arr[i - 1] * base) % mod
        _pow_cache[key] = arr
    return arr


def _prefix_hashes(x: np.ndarray, base: np.int64, mod: np.int64) -> np.ndarray:
    """pref[t] = hash of x[:t] under (base, mod), computed without a Python
    loop: pref[t] = (cumsum(x[s] * base^-s) * base^(t-1)) mod p, using the
    cached inverse-power table."""
    n = len(x)
    inv_base = pow(int(base), int(mod) - 2, int(mod))
    invp = _powers(np.int64(inv_base), mod, n)
    powp = _powers(base, mod, n)
    xm = (x.astype(np.uint64) % np.uint64(mod)).astype(np.int64)
    c = (xm * invp[:n]) % mod          # both factors < 2^31 => product < 2^62, fits int64
    pref = np.empty(n + 1, dtype=np.int64)
    pref[0] = 0
    # cumulative sum of values < 2^31: int64-safe up to ~2^32 tokens per doc
    acc = np.add.accumulate(c, dtype=np.int64)
    pref[1:] = ((acc % mod) * powp[:n]) % mod
    return pref


def _gram_hashes(pref: np.ndarray, L: int, base: np.int64, mod: np.int64) -> np.ndarray:
    """Hashes of all L-grams from prefix hashes: h[i] = (pref[i+L] - pref[i]*base^L) mod p."""
    n = len(pref) - 1
    if L > n:
        return np.empty(0, dtype=np.int64)
    bl = _powers(base, mod, L)[L]
    h = (pref[L:] - (pref[: n - L + 1] * bl) % mod) % mod
    return h


def _shares_gram(pa_: np.ndarray, pb: np.ndarray, qa: np.ndarray, qb: np.ndarray, L: int) -> bool:
    ha1 = _gram_hashes(pa_, L, _B1, _P1)
    hb1 = _gram_hashes(pb, L, _B1, _P1)
    if len(ha1) == 0 or len(hb1) == 0:
        return False
    ha2 = _gram_hashes(qa, L, _B2, _P2)
    hb2 = _gram_hashes(qb, L, _B2, _P2)
    ca = ha1 * np.int64(1) + (ha2 << np.int64(31))
    cb = hb1 + (hb2 << np.int64(31))
    return np.intersect1d(ca, cb).size > 0


def multiset_overlap(a: np.ndarray, b: np.ndarray) -> int:
    """Size of the token MULTISET intersection — a cheap, always-valid upper
    bound on ``lcs_length``: a common substring of length L consumes L tokens
    (with multiplicity) present in both sequences. Unlike a distinct-shingle
    bound it is exact under periodic content (``aaaa…`` shares one distinct
    shingle but has an unbounded LCS). ~4 numpy calls vs the ~80 of a full
    binary-search LCS — the prefilter that keeps the scorer's near-miss
    rescue loop linear in pairs that can actually clear the threshold."""
    if len(a) == 0 or len(b) == 0:
        return 0
    ua, ca = np.unique(a, return_counts=True)
    ub, cb = np.unique(b, return_counts=True)
    common, ia, ib = np.intersect1d(ua, ub, assume_unique=True,
                                    return_indices=True)
    if common.size == 0:
        return 0
    return int(np.minimum(ca[ia], cb[ib]).sum())


def lcs_length(a: np.ndarray, b: np.ndarray, hi_cap: int | None = None) -> int:
    """Length (in tokens) of the longest common substring of two uint64
    token-hash sequences. ``hi_cap``: optional known upper bound (e.g.
    ``multiset_overlap``) that shrinks the binary-search range — the result
    is exact for any valid bound."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0
    pa1 = _prefix_hashes(a, _B1, _P1)
    pb1 = _prefix_hashes(b, _B1, _P1)
    pa2 = _prefix_hashes(a, _B2, _P2)
    pb2 = _prefix_hashes(b, _B2, _P2)
    lo, hi = 0, min(n, m)  # invariant: length lo always achievable
    if hi_cap is not None:
        hi = min(hi, int(hi_cap))
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _shares_gram(pa1, pb1, pa2, pb2, mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def prefix_pair(x: np.ndarray) -> tuple:
    """Both independent prefix-hash arrays for one token sequence — the
    cacheable per-side half of an LCS evaluation (the same file appears in
    many candidate pairs; the scorer caches these by file id per batch)."""
    return _prefix_hashes(x, _B1, _P1), _prefix_hashes(x, _B2, _P2)


def _boundary_length(thr: float, mn: int) -> int:
    """Smallest integer L with (L / mn) >= thr under FLOAT comparison — the
    exact decision boundary _score_arrays applies to the exported fraction
    (a naive ceil(thr*mn) disagrees with it on float-rounding edges like
    thr=0.8, mn=5)."""
    L0 = int(np.ceil(thr * mn))
    while L0 > 1 and (L0 - 1) / mn >= thr:
        L0 -= 1
    while L0 <= mn and L0 / mn < thr:
        L0 += 1
    return L0


def lcs_fraction_thresholded(
    a: np.ndarray, b: np.ndarray, thr: float,
    hi_cap: int | None = None,
    pref_a: tuple | None = None, pref_b: tuple | None = None,
) -> float:
    """``lcs_fraction`` under the scorer's export contract: EXACT at/above
    the decision threshold ``thr``, 0.0 where provably below. Pairs below
    threshold — the common case in the rescue loop — are decided by ONE
    shared-gram test at the boundary length instead of a full binary search
    (~9 gram tests); pairs at/above it binary-search only [boundary, cap]
    for the exact value. ``pref_a``/``pref_b``: optional precomputed
    ``prefix_pair`` results (per-side cache across pairs)."""
    n, m = len(a), len(b)
    mn = min(n, m)
    if mn == 0:
        return 0.0
    hi = mn if hi_cap is None else min(mn, int(hi_cap))
    L0 = _boundary_length(thr, mn)
    if L0 > hi:
        return 0.0
    pa1, pa2 = prefix_pair(a) if pref_a is None else pref_a
    pb1, pb2 = prefix_pair(b) if pref_b is None else pref_b
    if not _shares_gram(pa1, pb1, pa2, pb2, L0):
        return 0.0
    lo = L0
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _shares_gram(pa1, pb1, pa2, pb2, mid):
            lo = mid
        else:
            hi = mid - 1
    return lo / mn


def lcs_fraction(a: np.ndarray, b: np.ndarray) -> float:
    """LCS length / min(len) — 1.0 means one file's token stream is wholly
    contained in the other."""
    if len(a) == 0 or len(b) == 0:
        return 0.0
    return lcs_length(a, b) / min(len(a), len(b))
