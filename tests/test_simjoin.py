"""Exact prefix-filtered Jaccard similarity join (pipelines/simjoin.py):
equivalence vs a brute-force all-pairs oracle, on both the df-ranked order
and the hash-order fallback, plus tokenization contract checks."""

from __future__ import annotations

import re

import numpy as np
import pytest


def _brute_force_pairs(docs: list[tuple[int, str]], threshold: float):
    word = re.compile(r"\w+")
    sets = {i: frozenset(word.findall((t or "").lower())) for i, t in docs}
    sets = {i: s for i, s in sets.items() if s}
    ids = sorted(sets)
    out = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            inter = len(sets[i] & sets[j])
            jac = inter / (len(sets[i]) + len(sets[j]) - inter)
            if jac >= threshold:
                out[(i, j)] = round(jac, 6)
    return out


def _docs_fixture():
    # duplicate-heavy texts, near-misses below threshold, an empty doc and a
    # punctuation-only doc (both zero-token -> excluded by contract)
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = [
        (0, base),
        (1, base),                                   # exact dup
        (2, base + " today"),                        # high overlap
        (3, "quick brown fox jumps over lazy dog"),  # subset
        (4, "a completely different sentence about graph algorithms"),
        (5, "graph algorithms on distributed systems with ray data"),
        (6, ""),                                     # zero tokens
        (7, "?!... ---"),                            # zero tokens
        (8, "the the the THE tHe"),                  # one distinct token
        (9, "the"),                                  # identical single-token set
        (10, "distributed systems with ray data at scale"),
    ]
    return docs


def _run_join(docs, threshold, ray):
    import pyarrow as pa

    import ray.data

    from nhse_probabilistic_linkage_ray.pipelines.simjoin import jaccard_similarity_join

    t = pa.table({"doc_id": pa.array([i for i, _ in docs], pa.int64()),
                  "text": pa.array([s for _, s in docs], pa.string())})
    ds = ray.data.from_arrow(t).repartition(3)
    got = jaccard_similarity_join(ds, threshold=threshold).to_pandas()
    return {(int(r.left_id), int(r.right_id)): float(r.jaccard)
            for r in got.itertuples()}


@pytest.mark.parametrize("threshold", [0.5, 0.7, 0.9])
def test_matches_brute_force(ray_session, threshold):
    docs = _docs_fixture()
    want = _brute_force_pairs(docs, threshold)
    got = _run_join(docs, threshold, ray_session)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_hash_order_fallback_is_still_exact(ray_session, monkeypatch):
    """Vocabulary above the broadcast limit -> frequency-blind hash order;
    candidates grow but the verified result is identical."""
    from nhse_probabilistic_linkage_ray.pipelines import simjoin

    monkeypatch.setattr(simjoin, "VOCAB_BROADCAST_LIMIT", 0)
    docs = _docs_fixture()
    want = _brute_force_pairs(docs, 0.5)
    got = _run_join(docs, 0.5, ray_session)
    assert got.keys() == want.keys()


def test_randomized_corpus_completeness(ray_session):
    """Adversarial-ish random token sets: skewed token frequencies (Zipf) so
    prefixes actually prune, set sizes 1..30, threshold at an awkward 0.62."""
    rng = np.random.default_rng(7)
    vocab = [f"w{v}" for v in range(120)]
    docs = []
    for i in range(150):
        n = int(rng.integers(1, 30))
        idx = np.minimum((rng.zipf(1.3, size=n) - 1), len(vocab) - 1)
        docs.append((i, " ".join(vocab[j] for j in idx)))
    want = _brute_force_pairs(docs, 0.62)
    got = _run_join(docs, 0.62, ray_session)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_zero_token_docs_excluded(ray_session):
    docs = [(0, ""), (1, ""), (2, "... !!"), (3, "real words here")]
    got = _run_join(docs, 0.5, ray_session)
    assert got == {}
