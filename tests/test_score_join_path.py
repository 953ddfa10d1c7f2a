"""The partitioned-join scoring path (large-side fallback) must produce the
same scored pairs as the broadcast path."""

from __future__ import annotations

import pytest

from nhse_probabilistic_linkage_ray.config import PipelineConfig


def test_join_strategy_matches_broadcast(ray_session, small_corpus):
    import ray.data

    from nhse_probabilistic_linkage_ray.stages.candidates import candidate_pairs
    from nhse_probabilistic_linkage_ray.stages.ingest import (
        exact_group_stage,
        ingest_stage,
        representatives,
    )
    from nhse_probabilistic_linkage_ray.stages.score import score_stage
    from nhse_probabilistic_linkage_ray.stages.signature import signature_stage

    cfg = PipelineConfig(num_perms=64, num_bands=16)
    mapped = exact_group_stage(ingest_stage(ray.data.from_arrow(small_corpus), cfg), cfg).materialize()
    sigs = signature_stage(representatives(mapped), cfg).materialize()
    pairs = candidate_pairs(sigs, cfg).materialize()

    def key(rows):
        return {
            (r["left_id"], r["right_id"]): (
                r["gamma"], round(r["jaccard_exact"], 5), r["tier"], r["capped"],
            )
            for r in rows
        }

    bcast = key(score_stage(pairs, sigs, cfg, strategy="broadcast").take_all())
    joined = key(score_stage(pairs, sigs, cfg, strategy="join").take_all())
    assert bcast == joined
    assert len(bcast) == pairs.count()


def test_auto_strategy_is_byte_based(ray_session, small_corpus, monkeypatch):
    """The auto switch must consider BYTES (per-node plasma budget), not just
    a row count: a tiny byte limit forces the join path even at tiny row
    counts, and the join result still matches broadcast."""
    import ray.data

    from nhse_probabilistic_linkage_ray.stages.candidates import candidate_pairs
    from nhse_probabilistic_linkage_ray.stages.ingest import (
        exact_group_stage,
        ingest_stage,
        representatives,
    )
    from nhse_probabilistic_linkage_ray.stages.score import score_stage
    from nhse_probabilistic_linkage_ray.stages.signature import signature_stage

    cfg = PipelineConfig(num_perms=64, num_bands=16)
    mapped = exact_group_stage(ingest_stage(ray.data.from_arrow(small_corpus), cfg), cfg).materialize()
    sigs = signature_stage(representatives(mapped), cfg).materialize()
    pairs = candidate_pairs(sigs, cfg).materialize()

    def key(rows):
        return {(r["left_id"], r["right_id"]): (r["gamma"], r["tier"]) for r in rows}

    want = key(score_stage(pairs, sigs, cfg, strategy="broadcast").take_all())

    monkeypatch.setenv("GRAFT_SCORE_BROADCAST_BYTES", "1")
    got = key(score_stage(pairs, sigs, cfg, strategy="auto").take_all())
    assert got == want

    monkeypatch.setenv("GRAFT_SCORE_BROADCAST_BYTES", str(1 << 40))
    got2 = key(score_stage(pairs, sigs, cfg, strategy="auto").take_all())
    assert got2 == want
