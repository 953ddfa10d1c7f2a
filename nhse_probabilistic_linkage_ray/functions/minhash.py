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
    """Holds the signature state. Pure compute — the Ray actor in
    stages/signature.py wraps this.

    Signature scheme: **one-permutation hashing** (Li, Owen & Zhang 2012) with
    rotation densification (Shrivastava & Li 2014) — both public techniques.
    Each shingle hash is re-randomized once with the seeded multiply-add
    permutation, binned by its top log2(P) bits, and the per-bin minimum forms
    the signature. One O(|shingles|) pass instead of O(P x |shingles|) — the
    difference between feasible and not at 10^12-file scale. Empty bins
    (short documents) are filled by cyclic rotation from the nearest occupied
    bin so the per-slot collision probability still estimates Jaccard.
    """

    def __init__(self, num_perms: int, seed: int):
        if num_perms < 1:
            raise ValueError("num_perms must be positive")
        rng = np.random.default_rng(seed)
        # one seeded bijection of Z_2^64 (odd multiplier) re-randomizes the
        # shingle space so different seeds give independent signatures
        self.a = _U64(rng.integers(1, 2**63, dtype=np.uint64) * 2 + 1)
        self.b = _U64(rng.integers(0, 2**63, dtype=np.uint64))
        self.num_perms = num_perms
        # power-of-two P bins by the hash's top bits (the original scheme —
        # preserved so existing signatures/checkpoints are unchanged);
        # other P (the r=5/r=6 banding tiers: 130, 222) use fixed-point range
        # reduction bin = (h>>32) * P >> 32 (Lemire's fastrange, public) —
        # uniform over [0, P) from the same top bits
        self.pow2 = num_perms & (num_perms - 1) == 0
        self.bin_shift = _U64(64 - int(np.log2(num_perms))) if self.pow2 else _U64(0)

    def signatures(self, flat_shingles: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """(rows, P) uint64 signature matrix from the flat per-row shingle-set
        layout. Rows with zero shingles get EMPTY_SLOT everywhere."""
        n_rows = len(offsets) - 1
        P = self.num_perms
        out = np.full((n_rows, P), EMPTY_SLOT, dtype=_U64)
        if len(flat_shingles) == 0 or n_rows == 0:
            return out

        h = self.a * flat_shingles + self.b          # one pass, uint64 wrap
        if self.pow2:
            bins = (h >> self.bin_shift).astype(np.int64)
        else:
            bins = (((h >> _U64(32)) * _U64(P)) >> _U64(32)).astype(np.int64)
        counts = np.diff(offsets)
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), counts)

        # scatter-min via sort: first value per (row, bin) after sorting by
        # (row, bin, value) is the minimum — no scalar .at loops
        key = row_of * P + bins
        order = np.lexsort((h, key))
        k_sorted, h_sorted = key[order], h[order]
        first = np.ones(len(k_sorted), dtype=bool)
        first[1:] = k_sorted[1:] != k_sorted[:-1]
        out.reshape(-1)[k_sorted[first]] = h_sorted[first]

        # rotation densification: fill each empty bin from the nearest
        # occupied bin to its left, cyclically (vectorized over the matrix)
        counts_pos = counts > 0
        filled = out != EMPTY_SLOT
        need = counts_pos & ~filled.all(axis=1)
        rows_need = np.flatnonzero(need & counts_pos)
        if len(rows_need):
            sub = out[rows_need]                      # (m, P)
            dbl = np.concatenate([sub, sub], axis=1)  # cyclic via doubling
            occ = dbl != EMPTY_SLOT
            idx = np.where(occ, np.arange(2 * P)[None, :], -1)
            last_occ = np.maximum.accumulate(idx, axis=1)  # nearest occupied <= j
            take = last_occ[:, P:]                    # positions P..2P-1 wrap the row
            rowsel = np.arange(len(rows_need))[:, None]
            out[rows_need] = dbl[rowsel, take]
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
