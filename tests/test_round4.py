"""Round-4 additions: scale-aware banding policy + two-phase score gather."""

from __future__ import annotations

import numpy as np
import pytest

from nhse_probabilistic_linkage_ray.config import PipelineConfig, scaled_banding


class TestScaledBanding:
    @pytest.mark.parametrize("n", [10_000, 1_000_000, 100_000_000])
    def test_recall_bound_holds_every_tier(self, n):
        cfg = scaled_banding(n)
        assert cfg.lsh_collision_probability(cfg.jaccard_threshold) >= 0.99
        assert cfg.num_perms == cfg.num_bands * cfg.rows_per_band

    def test_noise_collisions_shrink_with_scale(self):
        """The point of the policy: at template-noise similarity the
        candidate probability must drop monotonically across tiers."""
        tiers = [scaled_banding(n) for n in (10_000, 1_000_000, 100_000_000)]
        probs = [c.lsh_collision_probability(0.3) for c in tiers]
        assert probs[0] > probs[1] > probs[2]
        assert probs[1] < probs[0] / 3    # r=5 cuts s=0.3 noise >= 3x
        assert probs[2] < probs[0] / 8    # r=6 cuts it >= 8x

    def test_default_tier_is_the_default_config(self):
        assert scaled_banding(10_000).num_perms == PipelineConfig().num_perms
        assert scaled_banding(10_000).num_bands == PipelineConfig().num_bands


class TestTwoPhaseGather:
    def test_gather_fixed_and_ragged_match_full_gather(self):
        """gather_fixed + gather_ragged over a subset must equal the
        corresponding slices of the full gather."""
        import pyarrow as pa

        from nhse_probabilistic_linkage_ray.stages.score import FeatureIndex

        rng = np.random.default_rng(3)
        P = 16
        n = 500

        def block(ids):
            m = len(ids)
            lens = rng.integers(0, 30, size=m)
            offs = np.concatenate(([0], np.cumsum(lens)))
            flat = rng.integers(0, 2**60, size=int(offs[-1]), dtype=np.int64)
            sig = rng.integers(0, 2**60, size=(m, P), dtype=np.int64)
            return pa.table({
                "file_id": pa.array(ids, pa.int64()),
                "minhash": pa.LargeListArray.from_arrays(
                    pa.array(np.arange(m + 1) * P, pa.int64()),
                    pa.array(sig.ravel().view(np.uint64), pa.uint64())),
                "simhash": pa.array(
                    rng.integers(0, 2**60, size=m, dtype=np.int64).view(np.uint64),
                    pa.uint64()),
                "shingles": pa.LargeListArray.from_arrays(
                    pa.array(offs, pa.int64()),
                    pa.array(flat.view(np.uint64), pa.uint64())),
                "token_hashes": pa.LargeListArray.from_arrays(
                    pa.array(offs, pa.int64()),
                    pa.array((flat + 7).view(np.uint64), pa.uint64())),
            })

        ids = np.arange(n, dtype=np.int64)
        rng.shuffle(ids)
        idx = FeatureIndex([block(ids[:200]), block(ids[200:])], P)

        probe = rng.choice(n, size=120, replace=True).astype(np.int64)
        sig_f, sim_f, sh_f, th_f = idx.gather(probe, P)
        sig2, sim2 = idx.gather_fixed(probe, P)
        assert np.array_equal(sig_f, sig2)
        assert np.array_equal(sim_f, sim2)

        sub = probe[::3]
        flat, offs = idx.gather_ragged(sub, "shingles")
        full_flat, full_offs = sh_f
        for j, i in enumerate(range(0, len(probe), 3)):
            want = full_flat[full_offs[i]:full_offs[i + 1]]
            got = flat[offs[j]:offs[j + 1]]
            assert np.array_equal(want, got)
        flat_t, offs_t = idx.gather_ragged(sub, "tokens")
        full_flat_t, full_offs_t = th_f
        for j, i in enumerate(range(0, len(probe), 3)):
            assert np.array_equal(full_flat_t[full_offs_t[i]:full_offs_t[i + 1]],
                                  flat_t[offs_t[j]:offs_t[j + 1]])
