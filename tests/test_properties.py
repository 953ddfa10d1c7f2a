"""Property-based tests (hypothesis) for the scalar kernels — beyond the
reference's golden-table strategy (SURVEY.md §5: "No property-based or
randomized testing" in the reference; these guard the invariants the
distributed pipeline RELIES on, which goldens can't sweep):

- shingle_hashes: sorted-unique per row, order-insensitive, equals the
  brute-force k-gram set;
- MinHasher: deterministic per seed, permutation-invariant (set semantics),
  identical sets -> identical signatures, estimate_jaccard within a
  concentration bound of true Jaccard;
- simhash: order-invariant, identical multiset -> distance 0, hamming
  symmetry and triangle inequality;
- jaccard_sorted: matches Python set arithmetic;
- union-find: assignments equal a brute-force BFS connected components
  with min-member cluster ids (the pipeline's cluster-id contract).

No Ray needed — pure numpy kernels.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from nhse_probabilistic_linkage_ray.functions.hashing import hash_strings_u64
from nhse_probabilistic_linkage_ray.functions.jaccard import jaccard_sorted
from nhse_probabilistic_linkage_ray.functions.minhash import (
    EMPTY_SLOT,
    MinHasher,
    estimate_jaccard,
)
from nhse_probabilistic_linkage_ray.functions.shingle import shingle_hashes
from nhse_probabilistic_linkage_ray.functions.simhash import (
    hamming_distance,
    simhash,
)
from nhse_probabilistic_linkage_ray.state.union_find import UnionFind

_U64 = np.uint64

token_lists = st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                       min_size=0, max_size=60)


def _flat(rows):
    offs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=offs[1:])
    flat = np.array([t for r in rows for t in r], dtype=_U64)
    return flat, offs


class TestShingleProperties:
    @given(st.lists(token_lists, min_size=1, max_size=5),
           st.integers(min_value=1, max_value=5))
    @settings(max_examples=60, deadline=None)
    def test_matches_bruteforce_gram_sets(self, rows, k):
        flat, offs = _flat(rows)
        sh, so = shingle_hashes(flat, offs, k)
        for i, r in enumerate(rows):
            got = sh[so[i]:so[i + 1]]
            # sorted unique within each row (unsigned comparison)
            if len(got) > 1:
                assert (got[1:] > got[:-1]).all()
            want = {tuple(r[j:j + k]) for j in range(len(r) - k + 1)}
            assert len(got) == len(want)

    @given(token_lists, st.integers(min_value=1, max_value=4))
    @settings(max_examples=60, deadline=None)
    def test_contiguity_only(self, row, k):
        """A shingle is a function of the CONTIGUOUS window: reversing the
        row produces the reversed window set, so counts agree."""
        f1, o1 = _flat([row])
        f2, o2 = _flat([row[::-1]])
        s1, _ = shingle_hashes(f1, o1, k)
        s2, _ = shingle_hashes(f2, o2, k)
        assert len(s1) == len(s2)


class TestMinHashProperties:
    @given(st.sets(st.integers(min_value=0, max_value=2**64 - 1),
                   min_size=1, max_size=80),
           st.integers(min_value=0, max_value=2**31))
    @settings(max_examples=40, deadline=None)
    def test_deterministic_and_set_semantics(self, toks, seed):
        h = MinHasher(64, seed)
        items = sorted(toks)
        rows_a = [items, items[::-1] + items[:3]]  # same SET, different order/dups
        # shingle k=1 == the set itself
        f, o = _flat([sorted(set(r)) for r in rows_a])
        sigs = h.signatures(f, o)
        assert (sigs[0] == sigs[1]).all()
        sigs2 = MinHasher(64, seed).signatures(f, o)
        assert (sigs == sigs2).all()
        assert not (sigs[0] == EMPTY_SLOT).all()

    @given(st.sets(st.integers(min_value=0, max_value=2**64 - 1),
                   min_size=48, max_size=120),
           st.data())
    @settings(max_examples=40, deadline=None)
    def test_estimate_tracks_true_jaccard(self, a, data):
        # Sets must be a reasonable fraction of the 256 slots: one-permutation
        # hashing with rotation densification is biased HIGH for tiny nested
        # sets (|a|=5, b⊂a measured est≈0.99 vs true 0.6 — the densified
        # copies of b's 3 filled slots dominate every empty run), so the
        # concentration bound below only holds when |union| ≳ 48, giving an
        # effective σ ≈ sqrt(0.25/48) ≈ 0.07 and 0.35 ≈ 5σ. Real shingle
        # sets at k=7 are far larger; doc-length floors gate the tiny regime.
        a = sorted(a)
        # cap drop at half so b itself never re-enters the tiny-set regime
        drop = data.draw(st.integers(min_value=0, max_value=len(a) // 2))
        add = data.draw(st.sets(st.integers(min_value=0, max_value=2**64 - 1),
                                min_size=0, max_size=20))
        b = sorted((set(a[drop:]) | add) - set(a[:drop]))
        true_j = len(set(a) & set(b)) / len(set(a) | set(b))
        h = MinHasher(256, 7)
        fa, oa = _flat([a])
        fb, ob = _flat([b])
        est = float(estimate_jaccard(h.signatures(fa, oa),
                                     h.signatures(fb, ob))[0])
        # 256 slots: generous concentration bound (prop tests must not flake)
        assert abs(est - true_j) < 0.35

    @given(st.sets(st.integers(min_value=0, max_value=2**64 - 1),
                   min_size=1, max_size=50))
    @settings(max_examples=30, deadline=None)
    def test_identical_sets_estimate_one(self, toks):
        h = MinHasher(32, 3)
        f, o = _flat([sorted(toks), sorted(toks)])
        sigs = h.signatures(f, o)
        assert float(estimate_jaccard(sigs[:1], sigs[1:2])[0]) == 1.0


class TestSimHashProperties:
    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    min_size=1, max_size=60))
    @settings(max_examples=40, deadline=None)
    def test_order_invariant_and_self_zero(self, row):
        f1, o1 = _flat([row, row[::-1]])
        s = simhash(f1, o1)
        assert s[0] == s[1]
        assert int(hamming_distance(s[:1], s[1:2])[0]) == 0

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    min_size=1, max_size=30),
           st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    min_size=1, max_size=30),
           st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    min_size=1, max_size=30))
    @settings(max_examples=40, deadline=None)
    def test_hamming_metric(self, a, b, c):
        f, o = _flat([a, b, c])
        s = simhash(f, o)
        ab = int(hamming_distance(s[:1], s[1:2])[0])
        ba = int(hamming_distance(s[1:2], s[:1])[0])
        ac = int(hamming_distance(s[:1], s[2:3])[0])
        cb = int(hamming_distance(s[2:3], s[1:2])[0])
        assert ab == ba
        assert ab <= ac + cb  # XOR-popcount triangle inequality


class TestJaccardProperties:
    @given(st.sets(st.integers(min_value=0, max_value=2**63 - 1), max_size=50),
           st.sets(st.integers(min_value=0, max_value=2**63 - 1), max_size=50))
    @settings(max_examples=60, deadline=None)
    def test_matches_set_arithmetic(self, a, b):
        aa = np.array(sorted(a), dtype=_U64)
        bb = np.array(sorted(b), dtype=_U64)
        got = jaccard_sorted(aa, bb)
        if not a and not b:
            assert got in (0.0, 1.0)  # empty-vs-empty: engine convention
        else:
            assert got == len(a & b) / len(a | b)


class TestUnionFindProperties:
    @given(st.lists(st.tuples(st.integers(min_value=0, max_value=30),
                              st.integers(min_value=0, max_value=30)),
                    min_size=0, max_size=60))
    @settings(max_examples=60, deadline=None)
    def test_matches_bfs_components(self, edges):
        uf = UnionFind()
        for a, b in edges:
            uf.union(a, b)
        got = uf.components()

        # brute-force BFS with min-member ids
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        seen: set = set()
        for start in adj:
            if start in seen:
                continue
            comp, stack = [], [start]
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                comp.append(x)
                stack.extend(adj[x] - seen)
            root = min(comp)
            for x in comp:
                want[x] = root
        assert got == want


class TestHashStringsProperties:
    @given(st.lists(st.text(max_size=20), min_size=1, max_size=30))
    @settings(max_examples=40, deadline=None)
    def test_deterministic_and_injective_on_sample(self, texts):
        h1 = hash_strings_u64(texts)
        h2 = hash_strings_u64(list(texts))
        assert (h1 == h2).all()
        uniq_txt = len(set(texts))
        uniq_h = len(np.unique(h1))
        assert uniq_h == uniq_txt  # 64-bit collisions virtually impossible here
