"""Shingling: normalized content -> per-row sets of uint64 shingle hashes.

The analog of the reference's name preprocessing into comparable token arrays
(``preprocess_name`` + ``array_distinct``,
``/root/reference/utils/preprocessing_utils.py:129-224``): each file becomes a
*set* of k-token shingle hashes, the unit of Jaccard similarity.

Vectorization strategy (hot path, called for every file):

1. tokenize per row (C-speed regex findall).
2. Flatten all tokens in the batch; ``np.unique`` gives the batch vocabulary;
   only *unique* tokens are hashed with blake2b (vocabulary << token count),
   then mapped back through the inverse index — the standard
   hash-the-vocabulary trick.
3. k-gram shingle hashes are computed over the concatenated token-hash array
   with k vectorized multiply-adds + a splitmix64 finalizer; windows that
   straddle row boundaries are masked out.
4. Per-row de-dup of shingles is one global ``np.unique`` over (row, shingle)
   pairs — no Python loop over rows.
"""

from __future__ import annotations

import numpy as np

from nhse_probabilistic_linkage_ray.functions.hashing import hash_strings_u64, mix64
from nhse_probabilistic_linkage_ray.functions.normalize import tokenize

_U64 = np.uint64
# Fixed odd multipliers for positional mixing inside a shingle window.
_POS_MULT = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
     0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D],
    dtype=_U64,
)


def token_hashes_batch(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize + hash a batch of normalized contents.

    Returns (flat_token_hashes: uint64[N], row_offsets: int64[rows+1]) where
    row i's token-hash sequence is flat[offsets[i]:offsets[i+1]] in document
    order (duplicates preserved — the LCS kernel needs the ordered sequence).
    """
    tok_lists = [tokenize(t) for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    offsets = np.zeros(len(tok_lists) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = [t for toks in tok_lists for t in toks]
    if not flat:
        return np.empty(0, dtype=_U64), offsets
    # C-speed vocabulary build: Arrow dictionary-encode the token stream,
    # hash only the (small) dictionary, gather through the index column
    import pyarrow as pa

    enc = pa.array(flat, type=pa.string()).dictionary_encode()
    vocab_hashes = hash_strings_u64(enc.dictionary.to_pylist())
    inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return vocab_hashes[inv], offsets


def shingle_hashes(
    flat_tokens: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """k-gram shingle hash *sets* per row, from the flat token-hash layout.

    Returns (flat_shingles: uint64[M] sorted unique within each row,
    row_offsets: int64[rows+1]). Rows with fewer than k tokens get zero
    shingles (they fall to the null tier downstream, like the reference's
    null comparison level /root/reference/utils/parameter_lists.py:8).
    """
    n_rows = len(offsets) - 1
    n = len(flat_tokens)
    if n == 0 or k <= 0:
        return np.empty(0, dtype=_U64), np.zeros(n_rows + 1, dtype=np.int64)

    mult = _POS_MULT[:k] if k <= len(_POS_MULT) else mix64(np.arange(k, dtype=_U64)) | _U64(1)

    # windowed combine: s[i] = mix( sum_j flat[i+j] * mult[j] ) for i in [0, n-k]
    n_win = n - k + 1
    if n_win <= 0:
        return np.empty(0, dtype=_U64), np.zeros(n_rows + 1, dtype=np.int64)
    acc = np.zeros(n_win, dtype=_U64)
    for j in range(k):
        acc += flat_tokens[j : j + n_win] * mult[j]
    acc = mix64(acc)

    # row id per window start; keep only windows fully inside one row
    row_of = np.searchsorted(offsets, np.arange(n, dtype=np.int64), side="right") - 1
    win_row = row_of[:n_win]
    valid = (np.arange(n_win, dtype=np.int64) + k) <= offsets[win_row + 1]
    acc = acc[valid]
    win_row = win_row[valid]

    # global per-row unique: sort by (row, shingle), drop duplicates
    order = np.lexsort((acc, win_row))
    acc, win_row = acc[order], win_row[order]
    if len(acc):
        keep = np.ones(len(acc), dtype=bool)
        keep[1:] = (acc[1:] != acc[:-1]) | (win_row[1:] != win_row[:-1])
        acc, win_row = acc[keep], win_row[keep]

    out_counts = np.bincount(win_row, minlength=n_rows)
    out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(out_counts, out=out_offsets[1:])
    return acc, out_offsets


def shingle_set(text: str, k: int) -> np.ndarray:
    """Single-document convenience (tests + brute-force oracle): sorted unique
    uint64 shingle hashes. MUST agree exactly with the batch path — the oracle
    and the pipeline share this code so 'same shingle/signature config' holds."""
    flat, offs = token_hashes_batch([text])
    sh, _ = shingle_hashes(flat, offs, k)
    return sh
