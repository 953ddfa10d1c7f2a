"""MinHash signatures + LSH band hashes.

The code-dedup analog of the reference's Splink blocking machinery:

- The permutation matrix is the per-worker state the reference keeps as
  registered UDFs / the Splink linker (SURVEY.md T1/T3): constructed ONCE per
  actor from the config seed, reused across every batch.
- Band hashes play the role of the 17 equality blocking rules at
  ``/root/reference/parameters_dedupe.py:26-44``: two files sharing any band
  hash become a candidate pair; the band index is the ``match_key``
  provenance column (Splink semantics, SURVEY.md J4/D4).

All math is vectorized uint64 with wraparound multiply-add (a universal-ish
hash family h_p(x) = mix64(a_p * x + b_p)); per-row minima are taken with
``np.minimum.reduceat`` over the concatenated shingle layout — no Python loop
over rows or permutations.
"""

from __future__ import annotations

import numpy as np

from nhse_probabilistic_linkage_ray.functions.hashing import mix64

_U64 = np.uint64
EMPTY_SLOT = np.iinfo(np.uint64).max  # signature fill for shingle-less rows

# chunk shingle columns so perms x chunk stays ~128 MB of uint64
_CHUNK_ELEMS = 16_000_000


class MinHasher:
    """Holds the permutation state (a, b coefficient vectors). Pure compute —
    the Ray actor in stages/signature.py wraps this."""

    def __init__(self, num_perms: int, seed: int):
        rng = np.random.default_rng(seed)
        # odd multipliers for bijectivity mod 2^64
        self.a = rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) * _U64(2) + _U64(1)
        self.b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
        self.num_perms = num_perms

    def signatures(self, flat_shingles: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """(rows, P) uint64 signature matrix from the flat per-row shingle-set
        layout. Rows with zero shingles get EMPTY_SLOT everywhere."""
        n_rows = len(offsets) - 1
        P = self.num_perms
        out = np.full((n_rows, P), EMPTY_SLOT, dtype=_U64)
        if len(flat_shingles) == 0:
            return out

        counts = np.diff(offsets)
        nonempty = np.flatnonzero(counts > 0)
        if len(nonempty) == 0:
            return out

        # process row-ranges whose total shingle count fits the chunk budget
        max_cols = max(1, _CHUNK_ELEMS // P)
        start = 0
        while start < len(nonempty):
            end = start
            total = 0
            while end < len(nonempty) and (total == 0 or total + counts[nonempty[end]] <= max_cols):
                total += counts[nonempty[end]]
                end += 1
            rows = nonempty[start:end]
            lo, hi = offsets[rows[0]], offsets[rows[-1] + 1]
            seg = flat_shingles[lo:hi]
            # (P, seg) permuted hashes
            H = mix64(self.a[:, None] * seg[None, :] + self.b[:, None])
            local_offsets = (offsets[rows] - lo).astype(np.int64)
            mins = np.minimum.reduceat(H, local_offsets, axis=1)  # (P, len(rows))
            out[rows, :] = mins.T
            start = end
        return out

    def band_hashes(self, sigs: np.ndarray, num_bands: int) -> np.ndarray:
        """(rows, B) uint64 band hashes: each band = mix of its r signature
        slots + the band index, so identical row-slices in different bands
        never collide (band index == match_key, SURVEY.md J4)."""
        n, P = sigs.shape
        r = P // num_bands
        bands = sigs.reshape(n, num_bands, r)
        acc = np.zeros((n, num_bands), dtype=_U64)
        for j in range(r):
            acc = mix64(acc + bands[:, :, j])
        acc += np.arange(num_bands, dtype=_U64)[None, :] * _U64(0x9E3779B97F4A7C15)
        return mix64(acc)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """MinHash Jaccard estimate for aligned signature matrices (n, P):
    fraction of agreeing slots. The cheap first verification tier
    (analog of the jaro_winkler>0.88 level, /root/reference/utils/parameter_lists.py:25)."""
    return (sig_a == sig_b).mean(axis=1).astype(np.float32)
