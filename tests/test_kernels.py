"""Kernel unit tests — inline golden values, mirroring the reference's unit
style (/root/reference/tests/preprocessing_tests.py inline golden DataFrames)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions.hashing import (
    file_id_column,
    hash_strings_u64,
    mix64,
    stable_bucket,
)
from nhse_probabilistic_linkage_ray.functions.jaccard import jaccard_sorted
from nhse_probabilistic_linkage_ray.functions.lcs import (lcs_fraction, lcs_length,
                                                multiset_overlap)
from nhse_probabilistic_linkage_ray.functions.minhash import EMPTY_SLOT, MinHasher, estimate_jaccard
from nhse_probabilistic_linkage_ray.functions.normalize import (
    lang_from_path,
    normalize_content,
    standardise_whitespace,
    strip_license_header,
    tokenize,
)
from nhse_probabilistic_linkage_ray.functions.shingle import (
    shingle_hashes,
    shingle_set,
    token_hashes_batch,
)
from nhse_probabilistic_linkage_ray.functions.simhash import hamming_distance, simhash


class TestNormalize:
    # analog: whitespace standardisation tests, reference preprocessing_tests.py:111-139
    def test_crlf_and_trailing_ws(self):
        assert normalize_content("a  \r\nb\t\r") == "a\nb\n"

    def test_blank_line_collapse(self):
        assert normalize_content("a\n\n\n\n\nb") == "a\n\nb"

    def test_none_passthrough(self):
        assert normalize_content(None) is None

    def test_lowercase_opt_in(self):
        assert normalize_content("AbC", lowercase=True) == "abc"
        assert normalize_content("AbC") == "AbC"

    def test_standardise_whitespace(self):
        # ref: standardise_white_space 'one' mode, preprocessing_utils.py:307-371
        assert standardise_whitespace("  a \t b  ") == "a b"
        assert standardise_whitespace(None) is None

    def test_strip_license_header(self):
        # ref analog: clean_name boilerplate removal, preprocessing_utils.py:264-303
        assert strip_license_header("# c1\n# c2\ncode\n") == "code\n"
        assert strip_license_header("/* lic */\nint x;") == "int x;"
        assert strip_license_header("int x;") == "int x;"

    def test_tokenize(self):
        assert tokenize("def f(a):") == ["def", "f", "(", "a", ")", ":"]
        assert tokenize("") == []
        assert tokenize(None) == []

    def test_lang_from_path(self):
        # ref analog: extract_outcode regex capture, preprocessing_utils.py:17-31
        assert lang_from_path("src/a.py") == "python"
        assert lang_from_path("a.tsx") == "js"
        assert lang_from_path("Makefile") == "text"
        assert lang_from_path(None) == "unknown"


class TestHashing:
    def test_file_id_deterministic_and_positive(self):
        r = pa.array(["r", "r"]); p = pa.array(["a", "b"]); c = pa.array(["x", "x"])
        f1 = file_id_column(r, p, c)
        f2 = file_id_column(r, p, c)
        assert np.array_equal(f1, f2)
        assert f1.dtype == np.int64 and (f1 >= 0).all() and f1[0] != f1[1]

    def test_mix64_avalanche(self):
        a = mix64(np.array([1, 2], dtype=np.uint64))
        assert a[0] != a[1] and a[0] != 1

    def test_hash_strings_stable(self):
        assert np.array_equal(hash_strings_u64(["x", "y"]), hash_strings_u64(["x", "y"]))

    def test_stable_bucket_range(self):
        b = stable_bucket(np.arange(1000, dtype=np.int64), 7)
        assert b.min() >= 0 and b.max() < 7


class TestShingle:
    def test_batch_matches_single(self):
        texts = ["a b c d e f g", "h i j k l m"]
        flat, offs = token_hashes_batch(texts)
        sh, so = shingle_hashes(flat, offs, 3)
        for i, t in enumerate(texts):
            assert np.array_equal(shingle_set(t, 3), sh[so[i]:so[i + 1]])

    def test_cross_batch_determinism(self):
        a = shingle_set("x y z w v u t", 4)
        flat, offs = token_hashes_batch(["noise here", "x y z w v u t"])
        sh, so = shingle_hashes(flat, offs, 4)
        assert np.array_equal(a, sh[so[1]:so[2]])

    def test_short_rows_no_shingles(self):
        flat, offs = token_hashes_batch(["a b", ""])
        sh, so = shingle_hashes(flat, offs, 5)
        assert len(sh) == 0 and list(np.diff(so)) == [0, 0]

    def test_shingle_sets_are_sorted_unique(self):
        s = shingle_set("a b a b a b a b a b", 2)
        assert np.array_equal(s, np.unique(s))

    def test_no_cross_row_windows(self):
        # shingles of ["a b c", "d e f"] must not contain the "c d" boundary gram
        flat, offs = token_hashes_batch(["a b c", "d e f"])
        sh, so = shingle_hashes(flat, offs, 2)
        joined = shingle_set("a b c d e f", 2)
        boundary = set(joined.tolist()) - set(shingle_set("a b c", 2).tolist()) \
            - set(shingle_set("d e f", 2).tolist())
        assert boundary  # the boundary gram exists in the joined text
        assert not (set(sh.tolist()) & boundary)


class TestMinHash:
    def test_signature_deterministic_same_seed(self):
        texts = ["one two three four five six seven"]
        flat, offs = token_hashes_batch(texts)
        sh, so = shingle_hashes(flat, offs, 3)
        s1 = MinHasher(64, 42).signatures(sh, so)
        s2 = MinHasher(64, 42).signatures(sh, so)
        s3 = MinHasher(64, 7).signatures(sh, so)
        assert np.array_equal(s1, s2)
        assert not np.array_equal(s1, s3)

    def test_empty_row_sentinel(self):
        flat, offs = token_hashes_batch([""])
        sh, so = shingle_hashes(flat, offs, 3)
        sig = MinHasher(16, 42).signatures(sh, so)
        assert (sig == EMPTY_SLOT).all()

    def test_estimate_tracks_true_jaccard(self):
        # identical sets -> estimate 1; disjoint -> 0
        a = shingle_set("q w e r t y u i o p a s d f g", 3)
        flat, offs = token_hashes_batch(["q w e r t y u i o p a s d f g"] * 2)
        sh, so = shingle_hashes(flat, offs, 3)
        sig = MinHasher(128, 42).signatures(sh, so)
        assert estimate_jaccard(sig[:1], sig[1:])[0] == 1.0

    def test_band_hashes_distinct_bands(self):
        sigs = np.zeros((1, 8), dtype=np.uint64)
        bh = MinHasher(8, 42).band_hashes(sigs, 4)
        assert len(set(bh[0].tolist())) == 4  # same slots, different band index

    def test_lsh_recall_curve(self):
        # banding config must give >=0.99 collision prob at the dup threshold
        cfg = PipelineConfig()
        assert cfg.lsh_collision_probability(cfg.jaccard_threshold) >= 0.99


class TestSimHash:
    def test_identical_zero_distance(self):
        flat, offs = token_hashes_batch(["a b c d e f g h i j"] * 2)
        sh, so = shingle_hashes(flat, offs, 3)
        s = simhash(sh, so)
        assert hamming_distance(s[:1], s[1:])[0] == 0

    def test_empty_is_zero(self):
        flat, offs = token_hashes_batch([""])
        sh, so = shingle_hashes(flat, offs, 3)
        assert simhash(sh, so)[0] == 0

    def test_hamming_known(self):
        a = np.array([0b1011], dtype=np.uint64)
        b = np.array([0b0010], dtype=np.uint64)
        assert hamming_distance(a, b)[0] == 2


class TestJaccard:
    def test_golden_values(self):
        a = np.array([1, 2, 3, 4], dtype=np.uint64)
        b = np.array([3, 4, 5, 6], dtype=np.uint64)
        assert jaccard_sorted(a, b) == pytest.approx(2 / 6)
        assert jaccard_sorted(a, a) == 1.0
        assert jaccard_sorted(a, np.array([], dtype=np.uint64)) == 0.0
        assert jaccard_sorted(np.array([], dtype=np.uint64), np.array([], dtype=np.uint64)) == 1.0


class TestLCS:
    def test_exact_values(self):
        a = np.array([1, 2, 3, 4, 5, 6], dtype=np.uint64)
        b = np.array([9, 3, 4, 5, 9, 9], dtype=np.uint64)
        assert lcs_length(a, b) == 3
        assert lcs_length(a, a) == 6
        assert lcs_length(a, np.array([7, 8], dtype=np.uint64)) == 0

    def test_repeated_tokens(self):
        a = np.array([1, 1, 1, 1], dtype=np.uint64)
        b = np.array([1, 1], dtype=np.uint64)
        assert lcs_length(a, b) == 2
        assert lcs_fraction(a, b) == 1.0

    def test_adversarial_interleave(self):
        a = np.array([1, 2, 1, 2, 1, 2, 3], dtype=np.uint64)
        b = np.array([2, 1, 2, 1, 2, 3, 9], dtype=np.uint64)
        # common substring [2,1,2,1,2,3]? a has ...1,2,1,2,3 at end (len 5: 2,1,2,1? )
        # brute-force check against reference implementation
        def brute(x, y):
            best = 0
            for i in range(len(x)):
                for j in range(len(y)):
                    k = 0
                    while i + k < len(x) and j + k < len(y) and x[i + k] == y[j + k]:
                        k += 1
                    best = max(best, k)
            return best
        assert lcs_length(a, b) == brute(a.tolist(), b.tolist())

    def test_matches_bruteforce_random(self):
        rng = np.random.default_rng(0)
        def brute(x, y):
            best = 0
            for i in range(len(x)):
                for j in range(len(y)):
                    k = 0
                    while i + k < len(x) and j + k < len(y) and x[i + k] == y[j + k]:
                        k += 1
                    best = max(best, k)
            return best
        for _ in range(25):
            a = rng.integers(0, 5, size=rng.integers(1, 40)).astype(np.uint64)
            b = rng.integers(0, 5, size=rng.integers(1, 40)).astype(np.uint64)
            assert lcs_length(a, b) == brute(a.tolist(), b.tolist())


class TestMultisetOverlapBound:
    """multiset_overlap is the scorer's LCS prefilter: it must be an upper
    bound on lcs_length ALWAYS (skipping a pair that could clear the rescue
    threshold would silently drop duplicates), and lcs_length(hi_cap=bound)
    must stay exact."""

    def test_upper_bound_property_random(self):
        rng = np.random.default_rng(1234)
        for _ in range(400):
            a = rng.integers(0, 10, size=rng.integers(0, 50), dtype=np.uint64)
            b = rng.integers(0, 10, size=rng.integers(0, 50), dtype=np.uint64)
            true_len = lcs_length(a, b)
            ub = multiset_overlap(a, b)
            assert true_len <= ub
            assert lcs_length(a, b, hi_cap=ub) == true_len

    def test_periodic_content(self):
        # the case a distinct-shingle bound gets WRONG: one distinct token,
        # unbounded LCS — the multiset bound stays valid (and tight)
        a = np.full(100, 7, dtype=np.uint64)
        b = np.full(40, 7, dtype=np.uint64)
        assert multiset_overlap(a, b) == 40
        assert lcs_length(a, b, hi_cap=40) == 40
        assert lcs_fraction(a, b) == 1.0

    def test_disjoint_and_empty(self):
        a = np.array([1, 2, 3], dtype=np.uint64)
        b = np.array([4, 5], dtype=np.uint64)
        assert multiset_overlap(a, b) == 0
        assert multiset_overlap(a, np.empty(0, np.uint64)) == 0

    def test_tightness_on_permutation(self):
        # a permutation shares the full multiset but may have a short LCS —
        # the bound is loose here by design (it only needs to be an upper
        # bound; the DP still runs when the bound clears the threshold)
        a = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.uint64)
        b = a[::-1].copy()
        assert multiset_overlap(a, b) == 8
        assert lcs_length(a, b) == 1


class TestLCSThresholded:
    """lcs_fraction_thresholded is the scorer's rescue evaluator: it must be
    EXACTLY lcs_fraction at/above the threshold and 0.0 below it (the
    documented export contract), under float-boundary semantics identical to
    the gamma comparison ``frac >= thr``, for any valid hi_cap."""

    def test_matches_reference_random(self):
        from nhse_probabilistic_linkage_ray.functions.lcs import (
            lcs_fraction_thresholded,
            multiset_overlap,
        )

        rng = np.random.default_rng(99)
        for _ in range(400):
            a = rng.integers(0, 8, size=rng.integers(1, 40), dtype=np.uint64)
            b = rng.integers(0, 8, size=rng.integers(1, 40), dtype=np.uint64)
            thr = float(rng.choice([0.3, 0.5, 0.8, 0.9, 1.0]))
            ref = lcs_fraction(a, b)
            got = lcs_fraction_thresholded(a, b, thr,
                                           hi_cap=multiset_overlap(a, b))
            if ref >= thr:
                assert got == ref
            else:
                assert got == 0.0
            # gamma decision identical either way
            assert (got >= thr) == (ref >= thr)

    def test_float_boundary_exact(self):
        # thr=0.8, mn=5: 4/5 == 0.8 in floats must PASS (ceil(0.8*5) can
        # round to 5 and wrongly demand L=5)
        from nhse_probabilistic_linkage_ray.functions.lcs import (
            lcs_fraction_thresholded,
        )

        a = np.array([1, 2, 3, 4, 9], dtype=np.uint64)
        b = np.array([7, 1, 2, 3, 4, 8], dtype=np.uint64)  # LCS=4, mn=5
        assert lcs_fraction(a, b) == 0.8
        assert lcs_fraction_thresholded(a, b, 0.8) == 0.8

    def test_prefix_cache_form(self):
        from nhse_probabilistic_linkage_ray.functions.lcs import (
            lcs_fraction_thresholded,
            prefix_pair,
        )

        a = np.array([1, 2, 3, 4, 5, 6], dtype=np.uint64)
        b = np.array([9, 3, 4, 5, 9, 9], dtype=np.uint64)
        assert lcs_fraction_thresholded(
            a, b, 0.5, pref_a=prefix_pair(a), pref_b=prefix_pair(b)
        ) == lcs_fraction_thresholded(a, b, 0.5)


class TestFlatRaggedHelpers:
    """Buffer-level ragged helpers in stages/score.py: subset, Arrow binary
    pack/unpack round-trip (incl. a SLICED column, whose offsets don't start
    at byte 0)."""

    def test_subset_ragged(self):
        from nhse_probabilistic_linkage_ray.stages.score import _subset_ragged

        flat = np.array([10, 11, 20, 30, 31, 32], dtype=np.uint64)
        offs = np.array([0, 2, 3, 3, 6], dtype=np.int64)  # rows: [10,11],[20],[],[30,31,32]
        sel = np.array([3, 0, 2], dtype=np.int64)
        f, o = _subset_ragged(flat, offs, sel)
        assert o.tolist() == [0, 3, 5, 5]
        assert f.tolist() == [30, 31, 32, 10, 11]

    def test_binary_pack_unpack_roundtrip(self):
        from nhse_probabilistic_linkage_ray.stages.score import (
            _binary_from_flat,
            _binary_to_flat,
        )

        vals = np.arange(7, dtype=np.uint64) * 1_000_003
        offs = np.array([0, 3, 3, 7], dtype=np.int64)
        arr = _binary_from_flat(vals, offs)
        assert arr.type == pa.large_binary() and len(arr) == 3
        assert arr[0].as_py() == vals[0:3].tobytes()
        assert arr[1].as_py() == b""
        f, o = _binary_to_flat(arr)
        assert f.tolist() == vals.tolist() and o.tolist() == offs.tolist()

    def test_binary_to_flat_on_sliced_column(self):
        from nhse_probabilistic_linkage_ray.stages.score import (
            _binary_from_flat,
            _binary_to_flat,
        )

        vals = np.arange(10, dtype=np.uint64)
        offs = np.array([0, 2, 5, 9, 10], dtype=np.int64)
        arr = _binary_from_flat(vals, offs)
        sl = arr.slice(1, 2)  # rows [2..5), [5..9)
        f, o = _binary_to_flat(sl)
        assert o.tolist() == [0, 3, 7]
        assert f.tolist() == list(range(2, 9))

    def test_binary_to_flat_empty_and_chunked(self):
        from nhse_probabilistic_linkage_ray.stages.score import (
            _binary_from_flat,
            _binary_to_flat,
        )

        empty = _binary_from_flat(np.empty(0, np.uint64), np.zeros(1, np.int64))
        f, o = _binary_to_flat(empty)
        assert len(f) == 0 and o.tolist() == [0]
        a = _binary_from_flat(np.array([1, 2], np.uint64), np.array([0, 2], np.int64))
        b = _binary_from_flat(np.array([3], np.uint64), np.array([0, 1], np.int64))
        ch = pa.chunked_array([a, b])
        f, o = _binary_to_flat(ch)
        assert f.tolist() == [1, 2, 3] and o.tolist() == [0, 2, 3]
