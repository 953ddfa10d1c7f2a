"""Tests for the extras: multimodal plumbing, model store, training
estimation, text-analysis kernels, report aggregates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions import textstats
from nhse_probabilistic_linkage_ray.pipelines.training import average_m_values, estimate_m_em
from nhse_probabilistic_linkage_ray.sources.model_store import get_model, save_model
from nhse_probabilistic_linkage_ray.stages.multimodal import (
    DeterministicFakeDecoder,
    MediaDecoder,
    MediaFeatureActor,
    media_feature_stage,
    synthetic_media_table,
)


class TestTextstats:
    def test_token_counts(self):
        assert textstats.token_count_ws(["a b  c", "", None]).tolist() == [3, 0, 0]
        assert textstats.token_count_bpe_ish(["foo_bar 12, x!"]).tolist() [0] >= 5

    def test_language_id(self):
        out = textstats.language_id([
            "the cat and the dog of a house that it was",
            "der hund und die katze ist nicht ein tier",
            "", "zzz qqq www",
        ])
        assert out[0] == "en" and out[1] == "de"
        assert out[2] == "unknown"

    def test_quality_scores_ranges(self):
        s = textstats.quality_scores(["Hello, world! The test.", ""])
        assert s["length"][0] > 0 and s["length"][1] == 0
        assert 0 <= s["punct_ratio"][0] <= 1
        assert 0 <= s["stop_ratio"][0] <= 1
        assert s["alpha_ratio"][1] == 0

    def test_fingerprint_shift_stability_shape(self):
        fp = textstats.fingerprint_rolling(["x" * 500, "x" * 500, "y" * 500])
        assert fp[0] == fp[1] and fp[0] != fp[2]


class TestMultimodal:
    def test_base_decoder_raises(self):
        with pytest.raises(NotImplementedError):
            MediaDecoder().decode([b"x"], ["image/png"])

    def test_fake_decoder_deterministic(self):
        d = DeterministicFakeDecoder()
        a = d.decode([b"abc", b""], ["image/png", "audio/wav"])
        b = d.decode([b"abc", b""], ["image/png", "audio/wav"])
        assert np.array_equal(a["digest"], b["digest"])
        assert np.array_equal(a["embedding"], b["embedding"])

    def test_actor_batch_schema(self):
        t = synthetic_media_table(8)
        out = MediaFeatureActor()(t)
        assert out.column_names == ["media_id", "media_type", "byte_size",
                                    "width", "height", "digest", "embedding"]
        assert "payload" not in out.column_names  # dropped after decode

    def test_stage_end_to_end(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(synthetic_media_table(32))
        out = media_feature_stage(ds, concurrency=2)
        rows = out.take_all()
        assert len(rows) == 32
        assert all(len(r["embedding"]) == 16 for r in rows)


class TestModelStore:
    def test_save_and_load_roundtrip(self, tmp_path):
        cfg = PipelineConfig(num_perms=64, num_bands=16)
        save_model(str(tmp_path), cfg, "first")
        cfg2 = PipelineConfig(num_perms=128, num_bands=32)
        save_model(str(tmp_path), cfg2, "second")
        latest = get_model(str(tmp_path))
        assert latest.config_hash == cfg2.config_hash
        by_desc = get_model(str(tmp_path), description="first")
        assert by_desc.config_hash == cfg.config_hash

    def test_missing_raises(self, tmp_path):
        save_model(str(tmp_path), PipelineConfig(), "x")
        with pytest.raises(FileNotFoundError):
            get_model(str(tmp_path), description="nope")


class TestTraining:
    def test_em_converges_to_sensible_params(self):
        cfg = PipelineConfig()
        # candidate pairs: 100 obvious dups (gamma 3), 900 non (gamma 0)
        m, u, prior = estimate_m_em({3: 100, 0: 900}, cfg)
        assert abs(sum(m) - 1) < 1e-9
        assert 0.05 < prior < 0.2           # ~10% of candidates are matches
        assert m[3] > 0.9                   # matches concentrate at gamma 3
        assert u[0] > 0.9                   # non-matches concentrate at gamma 0

    def test_em_empty_histogram(self):
        cfg = PipelineConfig()
        m, u, prior = estimate_m_em({}, cfg)
        assert abs(sum(m) - 1) < 1e-9 and prior == cfg.prior

    def test_average_m_clamping(self):
        out = average_m_values([(0.0, 0.1, 0.2, 0.3, 0.4), (0.2, 0.1, 0.2, 0.3, 0.2)])
        assert abs(sum(out) - 1) < 1e-9
        assert all(x > 0 for x in out)

    def test_u_estimation_on_corpus(self, ray_session, small_corpus):
        import ray.data

        from nhse_probabilistic_linkage_ray.pipelines.training import estimate_u, sample_random_pairs
        from nhse_probabilistic_linkage_ray.stages.ingest import (
            exact_group_stage,
            ingest_stage,
            representatives,
        )
        from nhse_probabilistic_linkage_ray.stages.signature import signature_stage

        cfg = PipelineConfig(num_perms=64, num_bands=16)
        mapped = exact_group_stage(ingest_stage(ray.data.from_arrow(small_corpus), cfg), cfg)
        sigs = signature_stage(representatives(mapped), cfg).materialize()
        pairs = sample_random_pairs(sigs, cfg, max_pairs=2000)
        assert 0 < pairs.count() <= 2000
        u = estimate_u(sigs, cfg, max_pairs=2000)
        assert abs(sum(u) - 1) < 1e-6
        assert u[0] > 0.9  # random pairs are overwhelmingly non-duplicates


class TestFellegiSunterMath:
    def test_weight_probability_roundtrip(self):
        cfg = PipelineConfig()
        for g in range(5):
            w = cfg.match_weight(g)
            p = cfg.weight_to_probability(w)
            assert 0 <= p <= 1
        # stronger tiers -> higher weight
        ws = [cfg.match_weight(g) for g in range(5)]
        assert ws == sorted(ws)

    def test_clamping(self):
        cfg = PipelineConfig(m_probabilities=(0, 0.1, 0.2, 0.3, 0.4),
                             u_probabilities=(0.5, 0, 0.2, 0.2, 0.1))
        m, u = cfg.clamped_mu()
        assert m[0] > 0 and u[1] == 1e-9
        assert abs(sum(m) - 1) < 1e-9


class TestCsvDictionary:
    def test_csv_roundtrip_and_broadcast_annotation(self, ray_session, tmp_path):
        import ray.data

        from nhse_probabilistic_linkage_ray.sources.dictionaries import (
            apply_dictionary_column,
            load_csv_dictionary,
        )

        p = tmp_path / "nick.csv"
        p.write_text("name,nickname\nrobert,bob\nrobert,rob\nsusan,sue\n")
        ref = load_csv_dictionary(str(p), "name", "nickname")
        ds = ray.data.from_items([{"name": "robert"}, {"name": "x"}])
        rows = {r["name"]: r["nicks"] for r in
                apply_dictionary_column(ds, ref, "name", "nicks").take_all()}
        assert sorted(rows["robert"]) == ["bob", "rob"]
        assert rows["x"] == []
