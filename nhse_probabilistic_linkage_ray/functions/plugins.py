"""Reference scorer plugins (SURVEY.md §2.10 user-extension surface).

A scorer plugin is ``fn(shingles_l, shingles_r, tokens_l, tokens_r) ->
np.ndarray`` — one float score per candidate pair, given each side's sorted
shingle-hash set and ordered token-hash sequence. Select one per run with
``PipelineConfig(plugin_scorer="module.path:callable", plugin_threshold=t)``:
ELSE-tier pairs scoring >= t lift to the rescue tier (the analog of adding a
comparison level; ref custom UDF registration at
``/root/reference/predict_dedupe.py:11``).
"""

from __future__ import annotations

import numpy as np


def token_overlap_scorer(shL, shR, thL, thR) -> np.ndarray:
    """Order-insensitive token-SET Jaccard — catches reordered/refactored
    files whose k-gram shingles diverge but whose vocabulary matches."""
    out = np.zeros(len(thL), dtype=np.float64)
    for i in range(len(thL)):
        a = np.unique(thL[i])
        b = np.unique(thR[i])
        if len(a) == 0 and len(b) == 0:
            continue
        inter = np.intersect1d(a, b, assume_unique=True).size
        out[i] = inter / (len(a) + len(b) - inter)
    return out


def size_ratio_scorer(shL, shR, thL, thR) -> np.ndarray:
    """min/max token-count ratio — a cheap structural-similarity prior."""
    out = np.zeros(len(thL), dtype=np.float64)
    for i in range(len(thL)):
        la, lb = len(thL[i]), len(thR[i])
        if max(la, lb):
            out[i] = min(la, lb) / max(la, lb)
    return out
