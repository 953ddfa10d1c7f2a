"""SimHash 64-bit sketches + Hamming distance.

The code-dedup analog of the reference's phonetic fuzzy-match features
(``double_metaphone_as_list`` at
``/root/reference/utils/preprocessing_utils.py:427-433`` and soundex at
``:211-212``): a compact per-record fingerprint under which *similar* inputs
collide/differ-by-little. Used as a verification tier (Hamming distance <= h)
and as a standalone near-dup dedup operator.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_CHUNK = 2_000_000  # shingles per chunk: chunk x 64 int8 ~ 128 MB


def simhash(flat_shingles: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(rows,) uint64 SimHash from the flat per-row shingle layout: per bit,
    sign of the sum of (2*bit-1) over the row's shingle hashes. Rows with no
    shingles get 0."""
    n_rows = len(offsets) - 1
    out = np.zeros(n_rows, dtype=_U64)
    if len(flat_shingles) == 0:
        return out
    shifts = np.arange(64, dtype=_U64)
    counts = np.diff(offsets)
    totals = np.zeros((n_rows, 64), dtype=np.int64)

    # chunked bit-unpack; accumulate per-row bit sums with add.reduceat
    row_of = np.repeat(np.arange(n_rows), counts)
    for lo in range(0, len(flat_shingles), _CHUNK):
        hi = min(lo + _CHUNK, len(flat_shingles))
        bits = ((flat_shingles[lo:hi, None] >> shifts[None, :]) & _U64(1)).astype(np.int8)
        np.add.at(totals, row_of[lo:hi], bits)

    # sign: bit set iff ones outnumber zeros (strictly, for determinism)
    nhalf = counts[:, None]  # ones*2 > count  <=>  sum(2b-1) > 0
    bitmat = (totals * 2 > nhalf) & (counts[:, None] > 0)
    weights = (_U64(1) << np.arange(64, dtype=_U64))[None, :]
    out = (bitmat.astype(_U64) * weights).sum(axis=1, dtype=_U64)
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a XOR b) over uint64 arrays -> uint8."""
    x = (np.asarray(a, dtype=_U64) ^ np.asarray(b, dtype=_U64))
    bytes_view = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1).astype(np.uint8)
