"""Exact Jaccard over sorted-unique uint64 shingle sets.

The decisive comparison level (analog of the token-intersect level
``array_intersect``/``size`` at ``/root/reference/utils/parameter_lists.py:33,41``):
|A ∩ B| / |A ∪ B| on the shingle-hash sets produced by shingle.py.
"""

from __future__ import annotations

import numpy as np


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 arrays via a merge-style
    intersect. Both-empty => 1.0 (two empty files are identical — but they are
    routed to the exact tier by sha256 before this is ever called)."""
    na, nb = len(a), len(b)
    if na == 0 and nb == 0:
        return 1.0
    if na == 0 or nb == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (na + nb - inter)


def jaccard_pairs(
    left_sets: list[np.ndarray], right_sets: list[np.ndarray]
) -> np.ndarray:
    """Vectorized-per-pair exact Jaccard for a batch of candidate pairs."""
    out = np.empty(len(left_sets), dtype=np.float32)
    for i in range(len(left_sets)):
        out[i] = jaccard_sorted(left_sets[i], right_sets[i])
    return out


def intersect_sizes_flat(
    lf: np.ndarray, lo: np.ndarray, rf: np.ndarray, ro: np.ndarray
) -> np.ndarray:
    """|A_i ∩ B_i| for a batch of pairs in flat ragged layout: left sets are
    ``lf[lo[i]:lo[i+1]]``, right sets ``rf[ro[i]:ro[i+1]]``, each sorted-unique.

    Fully vectorized (no per-pair Python): tag every token with its pair id,
    lexsort the combined (pair, token) stream once, and count adjacent
    duplicates — a duplicate within a pair can only be one left + one right
    occurrence because each side is unique."""
    n = len(lo) - 1
    la = np.diff(lo)
    lb = np.diff(ro)
    pid = np.concatenate([
        np.repeat(np.arange(n, dtype=np.int64), la),
        np.repeat(np.arange(n, dtype=np.int64), lb),
    ])
    tok = np.concatenate([np.asarray(lf, np.uint64), np.asarray(rf, np.uint64)])
    order = np.lexsort((tok, pid))
    pid_s = pid[order]
    tok_s = tok[order]
    dup = (pid_s[1:] == pid_s[:-1]) & (tok_s[1:] == tok_s[:-1])
    return np.bincount(pid_s[1:][dup], minlength=n).astype(np.int64)


def jaccard_flat(
    lf: np.ndarray, lo: np.ndarray, rf: np.ndarray, ro: np.ndarray
) -> np.ndarray:
    """Exact per-pair Jaccard over the flat ragged pair layout (float64).
    Both-empty pairs => 1.0 (the jaccard_sorted convention)."""
    la = np.diff(lo)
    lb = np.diff(ro)
    inter = intersect_sizes_flat(lf, lo, rf, ro)
    union = la + lb - inter
    out = np.ones(len(la), dtype=np.float64)
    nz = union > 0
    out[nz] = inter[nz] / union[nz]
    return out
