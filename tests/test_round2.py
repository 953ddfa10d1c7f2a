"""Round-2 regression tests: iterative union-find, data-derived resume
fingerprints, bounded u-sampling, scale-safe SimHash / embedding near-dup
(pytest equivalence vs brute force)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


class TestUnionFindIterative:
    def test_deep_chain_no_recursion_error(self):
        from nhse_probabilistic_linkage_ray.state.union_find import UnionFind

        uf = UnionFind()
        n = 5000
        # descending union order builds a parent chain of depth ~n
        for i in range(n - 1, 0, -1):
            uf.union(i - 1, i)
        comp = uf.components()
        assert set(comp.values()) == {0}
        assert len(comp) == n

    def test_min_member_semantics(self):
        from nhse_probabilistic_linkage_ray.state.union_find import connected_components_small

        comp = connected_components_small(np.array([[5, 9], [9, 2], [7, 8]]))
        assert comp[5] == comp[9] == comp[2] == 2
        assert comp[7] == comp[8] == 7


class TestInputFingerprint:
    def test_changes_with_data(self, tmp_path):
        import os
        import time

        from nhse_probabilistic_linkage_ray.state.manifests import input_fingerprint

        d = tmp_path / "in"
        d.mkdir()
        (d / "a.parquet").write_bytes(b"x" * 10)
        fp1 = input_fingerprint(str(d))
        assert fp1 == input_fingerprint(str(d))  # stable when unchanged
        time.sleep(0.01)
        (d / "a.parquet").write_bytes(b"y" * 11)
        assert input_fingerprint(str(d)) != fp1  # size/mtime change invalidates
        os.utime(d / "a.parquet")
        (d / "b.parquet").write_bytes(b"z")
        assert input_fingerprint(str(d)) != fp1  # new file invalidates


class TestBoundedUSampling:
    def test_sample_bound_and_determinism(self, ray_session, small_corpus):
        import math

        import ray.data

        from nhse_probabilistic_linkage_ray.config import PipelineConfig
        from nhse_probabilistic_linkage_ray.pipelines.training import (
            sample_bucket_ids,
            sample_random_pairs,
        )
        from nhse_probabilistic_linkage_ray.stages.ingest import (
            exact_group_stage,
            ingest_stage,
            representatives,
        )
        from nhse_probabilistic_linkage_ray.stages.signature import signature_stage

        cfg = PipelineConfig(num_perms=64, num_bands=16)
        mapped = exact_group_stage(ingest_stage(ray.data.from_arrow(small_corpus), cfg), cfg)
        sigs = signature_stage(representatives(mapped), cfg).materialize()
        n = sigs.count()
        max_pairs = 500
        s = max(2, min(n, int(math.isqrt(max_pairs))))
        a = sample_bucket_ids(sigs, max(1, n // s), 0, s)
        # structural bound: only the bucket-filtered sample reaches the driver
        assert len(a) <= s
        assert np.all(np.diff(a) > 0)  # sorted unique -> parallelism-stable
        pairs = sample_random_pairs(sigs, cfg, max_pairs=max_pairs)
        assert 0 < pairs.count() <= max_pairs
        # deterministic across invocations
        p1 = sorted((r["left_id"], r["right_id"]) for r in pairs.take_all())
        p2 = sorted((r["left_id"], r["right_id"])
                    for r in sample_random_pairs(sigs, cfg, max_pairs=max_pairs).take_all())
        assert p1 == p2


def _mix64_signatures():
    """(ids, sigs) with the mix64 3-shingle scale kernel over sf0.001 docs."""
    from nhse_probabilistic_linkage_ray.functions.shingle import (
        shingle_hashes,
        token_hashes_batch,
    )
    from nhse_probabilistic_linkage_ray.functions.simhash import simhash as simhash_fn

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = [(x or "").lower() for x in t["text"].to_pylist()]
    flat, offs = token_hashes_batch(texts)
    sh, so = shingle_hashes(flat, offs, 3)
    sigs = simhash_fn(sh, so)
    ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
    return ids, sigs


def _md5_signatures():
    """(ids, sigs) with the md5-token oracle-parity kernel over sf0.001."""
    import hashlib
    import re

    from nhse_probabilistic_linkage_ray.functions.simhash import simhash as simhash_fn

    word = re.compile(r"\w+")
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    flat_parts, offs, total = [], [0], 0
    for x in t["text"].to_pylist():
        toks = set(word.findall((x or "").lower()))
        hs = np.array([int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
                       for tok in toks], np.uint64)
        flat_parts.append(hs)
        total += len(hs)
        offs.append(total)
    flat = np.concatenate(flat_parts) if flat_parts else np.empty(0, np.uint64)
    sigs = simhash_fn(flat, np.asarray(offs, np.int64))
    ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
    return ids, sigs


def _brute_simhash_pairs(hamming_max=6, signatures=_md5_signatures):
    """All-pairs reference over the sf0.001 documents, pure numpy."""
    from nhse_probabilistic_linkage_ray.functions.simhash import hamming_distance

    ids, sigs = signatures()
    order = np.argsort(ids)
    ids, sigs = ids[order], sigs[order]
    li, ri = np.triu_indices(len(ids), k=1)
    d = hamming_distance(sigs[li], sigs[ri])
    keep = d <= hamming_max
    return sorted(zip(ids[li[keep]].tolist(), ids[ri[keep]].tolist(),
                      d[keep].astype(int).tolist()))


class TestSubstringGramPairs:
    def test_equivalent_to_bruteforce(self, ray_session):
        """Distributed gram-collision pairs == all-pairs distinct-window-set
        intersection counts over the sf0.001 documents."""
        from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import (
            q_substring_gram_pairs,
        )
        from nhse_probabilistic_linkage_ray.functions.normalize import tokenize

        L = 12
        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        grams = {}
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = tokenize(text or "")
            grams[did] = {tuple(toks[i:i + L]) for i in range(len(toks) - L + 1)}
        ids = sorted(grams)
        want = sorted(
            (a, b, len(grams[a] & grams[b]))
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if grams[a] & grams[b]
        )
        got = sorted((r["left_id"], r["right_id"], r["n_shared_grams"])
                     for r in q_substring_gram_pairs(SF, gram_len=L).take_all())
        assert got == want
        assert len(got) > 0


class TestSimhashPigeonhole:
    def test_equivalent_to_bruteforce(self, ray_session):
        from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import q_simhash_near_pairs

        got = sorted((r["left_id"], r["right_id"], r["hamming"])
                     for r in q_simhash_near_pairs(SF).take_all())
        assert got == _brute_simhash_pairs()
        assert len(got) > 0  # fixture has near-dups; test is non-vacuous

    def test_mix64_kernel_pigeonhole_equivalence(self, ray_session):
        """The scale kernel (mix64 3-shingle) through the same distributed
        pigeonhole engine also matches all-pairs brute force."""
        import ray.data

        from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import (
            _simhash_signatures,
            simhash_near_pairs,
        )

        got = sorted((r["left_id"], r["right_id"], r["hamming"])
                     for r in simhash_near_pairs(_simhash_signatures(SF),
                                                 hamming_max=6).take_all())
        assert got == _brute_simhash_pairs(signatures=_mix64_signatures)


class TestEmbeddingBlockPairs:
    def test_equivalent_to_bruteforce(self, ray_session):
        from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import (
            q_embedding_near_dup_pairs,
        )

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
        col = t["embedding"].combine_chunks()
        V = np.asarray(col.values, dtype=np.float64).reshape(len(ids), -1)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        S = Vn @ Vn.T
        li, ri = np.triu_indices(len(ids), k=1)
        keep = S[li, ri] >= 0.4
        want = sorted(zip(ids[li[keep]].tolist(), ids[ri[keep]].tolist(),
                          np.round(S[li[keep], ri[keep]], 5).tolist()))
        got = sorted((r["left_id"], r["right_id"], r["cosine"])
                     for r in q_embedding_near_dup_pairs(SF).take_all())
        assert got == want
        assert len(got) > 0


class TestTermFrequencyAdjustment:
    def test_splink_formula_hand_computed(self):
        import math

        from nhse_probabilistic_linkage_ray.config import GAMMA_EXACT, PipelineConfig

        cfg = PipelineConfig(tf_adjustment_weight=1.0, tf_minimum_u_value=0.001)
        m, u = cfg.clamped_mu()
        # Splink 3.9: w = log2(prior odds) + log2(m/u) + w_tf * log2(u / max(tf, tf_min))
        tf = 0.01
        want = (math.log2(cfg.prior / (1 - cfg.prior))
                + math.log2(m[GAMMA_EXACT] / u[GAMMA_EXACT])
                + 1.0 * math.log2(u[GAMMA_EXACT] / tf))
        got = cfg.tf_adjusted_match_weight(GAMMA_EXACT, tf)
        assert abs(got - want) < 1e-12
        # the tf floor (ref tf_minimum_u_value): tiny tf clamps to the floor
        floored = cfg.tf_adjusted_match_weight(GAMMA_EXACT, 1e-9)
        want_floor = (math.log2(cfg.prior / (1 - cfg.prior))
                      + math.log2(m[GAMMA_EXACT] / u[GAMMA_EXACT])
                      + math.log2(u[GAMMA_EXACT] / 0.001))
        assert abs(floored - want_floor) < 1e-12
        # weight 0 == off (the reference's null level sets weight 0)
        off = PipelineConfig(tf_adjustment_weight=0.0)
        assert off.tf_adjusted_match_weight(GAMMA_EXACT, tf) == off.match_weight(GAMMA_EXACT)
        # rare value (tf < u, above the floor) boosts; common value penalizes
        low_floor = PipelineConfig(tf_adjustment_weight=1.0, tf_minimum_u_value=1e-5)
        assert low_floor.tf_adjusted_match_weight(GAMMA_EXACT, 1e-4) \
            > low_floor.match_weight(GAMMA_EXACT)
        assert cfg.tf_adjusted_match_weight(GAMMA_EXACT, 0.5) < cfg.match_weight(GAMMA_EXACT)

    def test_exact_scored_pairs_tf(self, ray_session):
        import ray.data

        from nhse_probabilistic_linkage_ray.config import GAMMA_EXACT, PipelineConfig
        from nhse_probabilistic_linkage_ray.stages.score import exact_scored_pairs

        # 10 rows: one exact group of 4 (rep 1), one of 2 (rep 5), 4 singletons
        mapped = ray.data.from_arrow(pa.table({
            "file_id": pa.array(list(range(1, 11)), pa.int64()),
            "rep_id": pa.array([1, 1, 1, 1, 5, 5, 7, 8, 9, 10], pa.int64()),
        }))
        cfg = PipelineConfig(tf_adjustment_weight=1.0, tf_minimum_u_value=0.001)
        rows = exact_scored_pairs(mapped, cfg).take_all()
        assert sorted((r["left_id"], r["right_id"]) for r in rows) == \
            [(1, 2), (1, 3), (1, 4), (5, 6)]
        by_left = {r["left_id"]: r for r in rows}
        assert by_left[1]["tf_value"] == 0.4 and by_left[5]["tf_value"] == 0.2
        # the bigger (more common) group gets the LOWER adjusted weight
        assert by_left[1]["match_weight"] < by_left[5]["match_weight"]
        assert by_left[1]["match_weight"] == pytest.approx(
            cfg.tf_adjusted_match_weight(GAMMA_EXACT, 0.4))


class TestCumulativePairsPerBand:
    def test_fixture_with_known_band_overlap(self, ray_session):
        import ray.data

        from nhse_probabilistic_linkage_ray.stages.report import cumulative_pairs_per_band

        # deduped pairs with min-band provenance: band0 found 3 pairs,
        # band1 found 2 NEW pairs, band3 found 1 (band2 contributed none)
        pairs = ray.data.from_arrow(pa.table({
            "left_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "right_id": pa.array([11, 12, 13, 14, 15, 16], pa.int64()),
            "match_key": pa.array([0, 0, 0, 1, 1, 3], pa.int32()),
        }))
        t = cumulative_pairs_per_band(pairs)
        assert t["match_key"].to_pylist() == [0, 1, 3]
        assert t["n_new_pairs"].to_pylist() == [3, 2, 1]
        assert t["cumulative_pairs"].to_pylist() == [3, 5, 6]


class TestLinkingMode:
    def test_link_vs_bruteforce(self, ray_session, small_corpus):
        """link_datasets on a corpus split vs an exhaustive all-pairs
        reference sharing the same kernels (ref predict_linking flow)."""
        import pyarrow.compute as pc
        import ray.data

        from nhse_probabilistic_linkage_ray.config import PipelineConfig
        from nhse_probabilistic_linkage_ray.functions.hashing import file_id_column
        from nhse_probabilistic_linkage_ray.functions.jaccard import jaccard_sorted
        from nhse_probabilistic_linkage_ray.functions.normalize import normalize_content
        from nhse_probabilistic_linkage_ray.functions.shingle import shingle_set
        from nhse_probabilistic_linkage_ray.pipelines.linking import link_datasets

        cfg = PipelineConfig(num_perms=128, num_bands=64, rescue_low=0.2)
        t = small_corpus
        fid = file_id_column(t["repo"].combine_chunks(), t["path"].combine_chunks(),
                             t["commit"].combine_chunks())
        # split: every 5th row external, rest corpus
        ext_mask = np.arange(len(t)) % 5 == 0
        ext_t = t.filter(pa.array(ext_mask))
        cor_t = t.filter(pa.array(~ext_mask))

        res = link_datasets(ray.data.from_arrow(ext_t), ray.data.from_arrow(cor_t),
                            cfg, close_matches_threshold=0.5,
                            match_weight_threshold=5.0).take_all()
        got = {r["ext_id"]: r for r in res}

        # brute force: per external record, best corpus match at gamma >= 2
        # (exact-Jaccard tiers; the pipeline's rescue tier is below these)
        norm = [normalize_content(c, strip_trailing_ws=cfg.strip_trailing_ws,
                                  collapse_blank_lines=cfg.collapse_blank_lines,
                                  lowercase=cfg.lowercase) or ""
                for c in t["content"].to_pylist()]
        sh = [shingle_set(x, cfg.shingle_k) for x in norm]
        ext_idx = np.flatnonzero(ext_mask)
        cor_idx = np.flatnonzero(~ext_mask)
        # every external row must be present (outer-join completion)
        assert set(got) == set(int(fid[i]) for i in ext_idx)
        n_checked = 0
        for i in ext_idx:
            # zero-shingle rows are null-tier (exact-only) by pipeline
            # contract — no near-dup candidates (stages/candidates.py drops
            # them from banding)
            jacs = np.array([jaccard_sorted(sh[i], sh[j]) if len(sh[i]) and len(sh[j])
                             else 0.0
                             for j in cor_idx])
            gam = np.zeros(len(jacs), np.int64)
            gam[jacs >= cfg.jaccard_threshold] = 2
            gam[jacs >= cfg.jaccard_hi] = 3
            r = got[int(fid[i])]
            if gam.max() >= 2:
                best_g = gam.max()
                cands = np.asarray([int(fid[cor_idx[k]]) for k in np.flatnonzero(gam == best_g)])
                assert r["gamma"] == best_g, (i, r)
                assert r["best_match_id"] in cands
                assert r["n_close"] == len(cands)
                assert r["close_match"] == (len(cands) > 1 and r["match_weight"] >= 5.0)
                n_checked += 1
            else:
                # no gamma>=2 corpus candidate: either rescue-tier match or none
                assert r["gamma"] < 2
        assert n_checked >= 3  # fixture must actually exercise the match path


class TestNumpyMediaDecoder:
    def test_ppm_roundtrip_dims_and_embedding(self):
        from nhse_probabilistic_linkage_ray.stages.multimodal import (
            NumpyMediaDecoder,
            synthetic_ppm,
        )

        dec = NumpyMediaDecoder()
        p = synthetic_ppm(20, 12, seed=7)
        out = dec.decode([p], ["image/x-portable-pixmap"])
        assert out["width"][0] == 20 and out["height"][0] == 12
        assert out["embedding"].shape == (1, 16)
        assert 0.0 <= out["embedding"].min() and out["embedding"].max() <= 1.0
        # deterministic
        out2 = dec.decode([p], ["image/x-portable-pixmap"])
        assert np.array_equal(out["embedding"], out2["embedding"])
        # a solid-black image pools to all-zero features
        black = b"P6\n8 8\n255\n" + b"\x00" * (8 * 8 * 3)
        ob = dec.decode([black], ["image/x-portable-pixmap"])
        assert np.allclose(ob["embedding"], 0.0)

    def test_wav_parse_and_energy(self):
        from nhse_probabilistic_linkage_ray.stages.multimodal import (
            NumpyMediaDecoder,
            synthetic_wav,
        )

        dec = NumpyMediaDecoder()
        p = synthetic_wav(3200, sample_rate=8000, seed=3)
        out = dec.decode([p], ["audio/wav"])
        assert out["width"][0] == 3200      # n_samples
        assert out["height"][0] == 8000     # sample rate
        assert out["embedding"].shape == (1, 16)
        assert out["embedding"].max() > 0   # noise has energy
        # silence -> zero energy everywhere
        silent = synthetic_wav(1600, seed=0)
        import numpy as _np
        silent = silent[:44] + b"\x00" * (len(silent) - 44)
        os_ = dec.decode([silent], ["audio/wav"])
        assert _np.allclose(os_["embedding"], 0.0)

    def test_unknown_type_raises_seam(self):
        from nhse_probabilistic_linkage_ray.stages.multimodal import NumpyMediaDecoder

        with pytest.raises(NotImplementedError):
            NumpyMediaDecoder().decode([b"x"], ["image/png"])

    def test_end_to_end_stage_with_real_decoder(self, ray_session):
        import ray.data

        from nhse_probabilistic_linkage_ray.stages.multimodal import (
            NumpyMediaDecoder,
            media_feature_stage,
            synthetic_decodable_media_table,
        )

        t = synthetic_decodable_media_table(n=24)
        out = media_feature_stage(ray.data.from_arrow(t),
                                  decoder_cls=NumpyMediaDecoder,
                                  concurrency=2).take_all()
        assert len(out) == 24
        assert all(len(r["embedding"]) == 16 for r in out)
        assert all(r["width"] > 0 for r in out)


class TestIvfPartitionPrunedIndex:
    def test_indexed_probe_matches_inflight_ivf(self, ray_session, tmp_path):
        """build_ivf_index + ann_ivf_topk_indexed (partition-pruned read)
        must return exactly what the in-flight IVF path returns for the same
        centroids/probe config — same deterministic k-means, same candidate
        cells, same top-k."""
        import ray.data

        from nhse_probabilistic_linkage_ray.pipelines.similarity import (
            ann_ivf_topk,
            ann_ivf_topk_indexed,
            build_ivf_index,
        )

        emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        idx_dir = str(tmp_path / "ivf")
        build_ivf_index(emb, idx_dir, n_centroids=16, sample_limit=2048)

        q_rows = [r for r in emb.take_all() if r["vec_id"] < 5]
        q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
        Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in q_rows])

        got = sorted((r["query_id"], r["neighbor_id"], r["cosine"])
                     for r in ann_ivf_topk_indexed(idx_dir, Q, q_ids, k=10, nprobe=4).take_all())
        want = sorted((r["query_id"], r["neighbor_id"], r["cosine"])
                      for r in ann_ivf_topk(SF, n_queries=5, k=10, n_centroids=16,
                                            nprobe=4).take_all())
        assert got == want
        assert len(got) == 50
        # structural pruning evidence: the index directory is partitioned by
        # centroid and a probe touches only its selected partitions
        import os

        parts = [d for d in os.listdir(idx_dir) if d.startswith("centroid=")]
        assert len(parts) > 4  # more cells exist than one probe reads


class TestCrossPartitioningDeterminism:
    def test_same_clusters_any_block_structure(self, ray_session, small_corpus):
        """Cluster output must be a pure function of (config, data) — not of
        block structure or batch size (SURVEY §7.4: identical outputs at any
        parallelism level; the reference's monotonically_increasing_id breaks
        exactly this, which file_id = hash64(identity) fixes)."""
        import ray.data

        from nhse_probabilistic_linkage_ray.config import PipelineConfig
        from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset

        base = PipelineConfig(num_perms=64, num_bands=16)
        small_batches = PipelineConfig(num_perms=64, num_bands=16, batch_size=64)

        a = dedupe_dataset(ray.data.from_arrow(small_corpus), base)["clusters"].take_all()
        b = dedupe_dataset(ray.data.from_arrow(small_corpus).repartition(7),
                           small_batches)["clusters"].take_all()
        da = {r["file_id"]: r["cluster_id"] for r in a}
        db = {r["file_id"]: r["cluster_id"] for r in b}
        assert da == db


class TestScorerPlugin:
    def test_plugin_lifts_else_pairs_to_rescue(self, ray_session):
        """User-registered comparison level (SURVEY §2.10; ref custom UDF
        registration predict_dedupe.py:11): a token-overlap plugin lifts a
        below-threshold pair into the rescue tier; without the plugin the
        same pair stays at ELSE."""
        import ray.data

        from nhse_probabilistic_linkage_ray.config import (
            GAMMA_ELSE,
            GAMMA_RESCUED,
            PipelineConfig,
        )
        from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset

        plugin = ("nhse_probabilistic_linkage_ray.functions.plugins"
                  ":token_overlap_scorer")

        # shared 60-word prefix + distinct 30-word suffixes: shingle Jaccard
        # ~0.5 (bands collide at r=2, below the 0.7 link tier) while token
        # overlap ~0.5 clears the plugin threshold
        prefix = " ".join(f"w{i}" for i in range(60))
        a = prefix + " " + " ".join(f"a{i}" for i in range(30))
        b = prefix + " " + " ".join(f"b{i}" for i in range(30))
        filler = [" ".join(f"x{i}{j}" for j in range(40)) for i in range(6)]
        t = pa.table({
            "repo": pa.array(["r"] * 8),
            "path": pa.array([f"f{i}.txt" for i in range(8)]),
            "commit": pa.array(["c"] * 8),
            "lang": pa.array(["text"] * 8),
            "content": pa.array([a, b] + filler, pa.large_string()),
        })
        base = PipelineConfig(num_perms=64, num_bands=32, rescue_low=0.0,
                              simhash_hamming_max=0, lcs_frac_threshold=1.01)
        plug = PipelineConfig(num_perms=64, num_bands=32, rescue_low=0.0,
                              simhash_hamming_max=0, lcs_frac_threshold=1.01,
                              plugin_scorer=plugin, plugin_threshold=0.4)

        def gammas(cfg):
            out = dedupe_dataset(ray.data.from_arrow(t), cfg)["scored_pairs"].take_all()
            return {(r["left_id"], r["right_id"]): r["gamma"] for r in out}

        gb = gammas(base)
        gp = gammas(plug)
        # the shuffled pair must be a candidate in both runs (identical
        # banding) and lift only under the plugin
        assert any(g == GAMMA_ELSE for g in gb.values())
        lifted = [k for k in gb if gb[k] == GAMMA_ELSE and gp.get(k) == GAMMA_RESCUED]
        assert lifted, (gb, gp)


class TestEvaluatePipeline:
    def test_metrics_vs_oracle(self, ray_session, small_corpus):
        """evaluate_dedupe over the flagship run vs the brute-force oracle's
        truth pairs: perfect recall/agreement on the fixture, empty missed
        list; injecting a fake truth pair surfaces it as missed (ref
        missed-duplicate analysis, evaluation_dedupe.py:112-126)."""
        import ray.data

        from nhse_probabilistic_linkage_ray.config import PipelineConfig
        from nhse_probabilistic_linkage_ray.oracle import brute_force
        from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset
        from nhse_probabilistic_linkage_ray.pipelines.evaluate import evaluate_dedupe

        cfg = PipelineConfig(num_perms=64, num_bands=16)
        out = dedupe_dataset(ray.data.from_arrow(small_corpus), cfg)
        oracle = brute_force(small_corpus, cfg)

        m = evaluate_dedupe(out["scored_pairs"], out["clusters"], oracle.dup_pairs,
                            exact_mapped_ds=out["exact_mapped"], config=cfg)
        assert m["cluster_pair_agreement"] == 1.0
        assert m["n_missed"] == 0 and m["missed_pairs"] == []
        assert m["pair_precision"] == 1.0
        assert m["pair_recall"] > 0  # the gamma-based decision finds real pairs
        assert m["confusion"].num_rows == 5  # one row per threshold
        rec = m["confusion"]["recall"].to_pylist()
        assert rec[0] >= rec[-1]  # recall monotone non-increasing in threshold
        assert rec[0] > 0  # lowest weight threshold captures scored truth pairs

        # inject an impossible truth pair -> must be reported missed
        fids = sorted({r["file_id"] for r in out["clusters"].take_all()})
        fake = (fids[0], fids[-1])
        truth2 = set(oracle.dup_pairs) | {fake}
        m2 = evaluate_dedupe(out["scored_pairs"], out["clusters"], truth2)
        if fake not in {tuple(sorted(p)) for p in oracle.dup_pairs}:
            assert m2["n_missed"] == 1
            assert tuple(m2["missed_pairs"][0]) == (min(fake), max(fake))


class TestMediaResizeAndVideo:
    def test_resize_roundtrip(self):
        from nhse_probabilistic_linkage_ray.stages.multimodal import (
            NumpyMediaDecoder,
            resize_ppm,
            synthetic_ppm,
        )

        p = synthetic_ppm(40, 24, seed=1)
        small = resize_ppm(p, 10, 6)
        w, h, e = NumpyMediaDecoder._decode_ppm(small)
        assert (w, h) == (10, 6)
        # a solid-color image resizes to the same solid color
        solid = b"P6\n9 9\n255\n" + bytes([100, 150, 200]) * 81
        rs = resize_ppm(solid, 3, 3)
        import numpy as _np
        img = _np.frombuffer(rs[rs.index(b"255\n") + 4:], dtype=_np.uint8).reshape(3, 3, 3)
        assert (img == [100, 150, 200]).all()

    def test_video_frame_sampling(self):
        from nhse_probabilistic_linkage_ray.stages.multimodal import (
            sample_video_frames,
            synthetic_ppm,
        )

        frames = [synthetic_ppm(8, 8, seed=i) for i in range(7)]
        stream = b"".join(frames)
        got = sample_video_frames(stream, every_k=2)
        assert got == frames[::2]
        assert sample_video_frames(stream, every_k=1) == frames

    def test_video_decoder_end_to_end(self, ray_session):
        import ray.data

        from nhse_probabilistic_linkage_ray.stages.multimodal import (
            VideoFrameFeatureDecoder,
            media_feature_stage,
            synthetic_ppm,
        )

        rows = []
        for i in range(6):
            frames = b"".join(synthetic_ppm(16, 12, seed=10 * i + j) for j in range(4))
            rows.append({"media_id": i, "media_type": "video/x-ppm-stream",
                         "payload": frames, "byte_size": len(frames)})
        t = pa.table({
            "media_id": pa.array([r["media_id"] for r in rows], pa.int64()),
            "media_type": pa.array([r["media_type"] for r in rows], pa.string()),
            "payload": pa.array([r["payload"] for r in rows], pa.large_binary()),
            "byte_size": pa.array([r["byte_size"] for r in rows], pa.int64()),
        })
        out = media_feature_stage(ray.data.from_arrow(t),
                                  decoder_cls=VideoFrameFeatureDecoder,
                                  concurrency=2, every_k=2).take_all()
        assert len(out) == 6
        assert all(r["width"] == 16 and r["height"] == 12 for r in out)
        assert all(len(r["embedding"]) == 16 for r in out)


class TestIncrementalDedupe:
    def test_matches_full_rerun(self, ray_session, small_corpus, tmp_path):
        """run_dedupe(A) + incremental_dedupe(B) must produce exactly the
        clusters of a full run over A ∪ B (deterministic signatures make the
        incremental band space a superset of what the full run builds)."""
        import pyarrow.parquet as _pq
        import ray.data

        from nhse_probabilistic_linkage_ray.config import PipelineConfig
        from nhse_probabilistic_linkage_ray.pipelines.dedupe import (
            dedupe_dataset,
            incremental_dedupe,
            run_dedupe,
        )

        cfg = PipelineConfig(num_perms=64, num_bands=16)
        n = len(small_corpus)
        mask = np.arange(n) % 5 == 0      # every 5th row is the NEW batch
        old_t = small_corpus.filter(pa.array(~mask))
        new_t = small_corpus.filter(pa.array(mask))

        old_path = tmp_path / "old.parquet"
        _pq.write_table(old_t, old_path)
        run_dedupe(str(old_path), str(tmp_path / "wd"), cfg)

        inc = incremental_dedupe(str(tmp_path / "wd"),
                                 ray.data.from_arrow(new_t), cfg)
        got = {r["file_id"]: r["cluster_id"] for r in inc["clusters"].take_all()}

        full = dedupe_dataset(ray.data.from_arrow(small_corpus), cfg)
        want = {r["file_id"]: r["cluster_id"] for r in full["clusters"].take_all()}
        assert got == want
        assert len(got) == n


class TestEmbeddingLshNearDup:
    def test_subset_of_exact_and_recall(self, ray_session):
        """Hyperplane-LSH scale path: every emitted pair is exact-cosine
        verified (subset of the brute-force truth, with identical cosine),
        and banding recall clears 0.9 at the configured S-curve."""
        from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import (
            q_embedding_near_dup_lsh,
        )

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))
        col = t["embedding"].combine_chunks()
        V = np.asarray(col.values, dtype=np.float64).reshape(len(ids), -1)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        S = Vn @ Vn.T
        li, ri = np.triu_indices(len(ids), k=1)
        keep = S[li, ri] >= 0.4
        want = {(int(a), int(b)): float(c) for a, b, c in
                zip(ids[li[keep]], ids[ri[keep]], np.round(S[li[keep], ri[keep]], 5))}

        got = {(r["left_id"], r["right_id"]): r["cosine"]
               for r in q_embedding_near_dup_lsh(SF).take_all()}
        assert set(got) <= set(want)                       # exact precision
        for p, c in got.items():
            assert abs(c - want[p]) <= 1e-9               # verified cosine
        assert len(got) / max(1, len(want)) >= 0.9        # banding recall
        assert len(want) > 0
