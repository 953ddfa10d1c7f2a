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
