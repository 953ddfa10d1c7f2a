"""End-to-end pipeline tests against the brute-force oracle — the
cluster-assignment / pair-recall gate of BASELINE.md (dup-pair recall >= 0.99
at the same shingle/signature config; per-row content sha256 invariant)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.oracle import brute_force, cluster_pairs


@pytest.fixture(scope="module")
def pipeline_result(ray_session, small_corpus):
    import ray.data

    from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset

    cfg = PipelineConfig()
    out = dedupe_dataset(ray.data.from_arrow(small_corpus), cfg)
    clusters = out["clusters"].take_all()
    scored = out["scored_pairs"].take_all()
    return {"clusters": clusters, "scored": scored, "cfg": cfg}


@pytest.fixture(scope="module")
def oracle_result(small_corpus):
    return brute_force(small_corpus, PipelineConfig())


def test_every_input_row_assigned(pipeline_result, small_corpus):
    assert len(pipeline_result["clusters"]) == small_corpus.num_rows


def test_dup_pair_recall_and_precision(pipeline_result, oracle_result):
    got = cluster_pairs({r["file_id"]: r["cluster_id"] for r in pipeline_result["clusters"]})
    want = cluster_pairs(oracle_result.clusters)
    recall = len(got & want) / max(1, len(want))
    precision = len(got & want) / max(1, len(got))
    assert recall >= 0.99, f"recall {recall}"
    assert precision >= 0.99, f"precision {precision}"


def test_cluster_assignments_match_oracle(pipeline_result, oracle_result):
    got = {r["file_id"]: r["cluster_id"] for r in pipeline_result["clusters"]}
    agree = sum(1 for k, v in got.items() if oracle_result.clusters.get(k) == v)
    assert agree / len(got) >= 0.99


def test_sha256_invariant(pipeline_result, small_corpus, oracle_result):
    # content sha256 computed at ingest survives to the final table unchanged
    fid = oracle_result.file_ids
    want = {}
    for i, c in enumerate(small_corpus["content"].to_pylist()):
        want[int(fid[i])] = hashlib.sha256((c or "").encode("utf-8", "surrogatepass")).hexdigest()
    for r in pipeline_result["clusters"]:
        assert r["content_sha256"] == want[r["file_id"]]


def test_scored_pairs_schema_and_ranges(pipeline_result):
    for r in pipeline_result["scored"][:200]:
        assert r["left_id"] < r["right_id"]
        assert 0.0 <= r["jaccard_exact"] <= 1.0
        assert 0.0 <= r["match_probability"] <= 1.0
        assert r["gamma"] in (-1, 0, 1, 2, 3, 4)
        assert r["tier"] in ("null", "else", "rescued", "jaccard_lo", "jaccard_hi", "exact")
        assert r["gamma_pattern"] == str(r["gamma"])


def test_pipeline_deterministic_across_runs(ray_session, small_corpus):
    """Same input, two executions -> identical cluster assignment (determinism
    pinned by SURVEY.md §7.4 across parallelism and resume)."""
    import ray.data

    from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset

    cfg = PipelineConfig(num_perms=64, num_bands=16)  # smaller = faster second run
    a = dedupe_dataset(ray.data.from_arrow(small_corpus), cfg)["clusters"].take_all()
    b = dedupe_dataset(ray.data.from_arrow(small_corpus), cfg)["clusters"].take_all()
    da = {r["file_id"]: r["cluster_id"] for r in a}
    db = {r["file_id"]: r["cluster_id"] for r in b}
    assert da == db


def test_null_rows_stay_singletons(pipeline_result, small_corpus, oracle_result):
    """Empty / whitespace-only rows must never join a near-dup cluster
    (reference null-level semantics, utils/parameter_lists.py:8)."""
    got = {r["file_id"]: r["cluster_id"] for r in pipeline_result["clusters"]}
    paths = small_corpus["path"].to_pylist()
    fid = oracle_result.file_ids
    for i, p in enumerate(paths):
        if p in ("empty.py", "ws_only.py"):
            others = [got[int(fid[j])] for j in range(len(paths)) if j != i]
            assert got[int(fid[i])] == int(fid[i]) or got[int(fid[i])] not in others


def test_all_unique_corpus_singletons(ray_session):
    """A corpus with no duplicates at all: the component map is EMPTY and the
    broadcast cluster-assignment path must still assign every file its own
    singleton cluster (regression: empty-array searchsorted IndexError)."""
    import pyarrow as pa

    import ray.data

    from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset

    n = 64
    t = pa.table({
        "repo": [f"org/r{i % 4}" for i in range(n)],
        "path": [f"src/f{i}.py" for i in range(n)],
        "commit": ["c" * 40] * n,
        "lang": ["python"] * n,
        "content": [f"def fn_{i}():\n    return {i} * {i * 7 + 1}\n" for i in range(n)],
    })
    out = dedupe_dataset(ray.data.from_arrow(t), PipelineConfig())
    clusters = out["clusters"].take_all()
    assert len(clusters) == n
    assert all(r["cluster_id"] == r["file_id"] for r in clusters)
