"""Tiered verification + Fellegi-Sunter-style scoring of candidate pairs.

The code-dedup recast of Splink's comparison levels + match-weight arithmetic
(SURVEY.md §2.9 steps 2-3; levels at ``/root/reference/utils/parameter_lists.py``):

    gamma 4  exact         sha256 equal            (handled in the pre-pass)
    gamma 3  jaccard_hi    exact Jaccard >= 0.9    (≙ jaro_winkler > 0.88)
    gamma 2  jaccard_lo    exact Jaccard >= tau    (≙ token-intersect level)
    gamma 1  rescued       SimHash Hamming <= h OR LCS fraction >= lambda
                                                   (≙ nickname / given-only levels)
    gamma 0  else          non-duplicate           (≙ ELSE)
    gamma -1 null          no shingle material     (≙ null level)

match_weight = log2 prior odds + log2(m/u) for the observed gamma, with the
reference's m/u clamping (``/root/reference/utils/model_utils.py:87-94``);
match_probability = sigmoid (Splink semantics). The concatenated
``gamma_pattern`` mirrors ``add_agreement_pattern``
(``/root/reference/utils/eval_utils.py:207-215``, M18).

Feature attachment: pair rows carry only ids; the shingle/token material lives
in the signatures table. Two strategies, chosen by signature row count:

- **broadcast** (small side): the features table is ``ray.put`` ONCE and every
  scorer actor reads it in ``__init__`` — never re-shipped per batch
  (SURVEY.md J3, the nicknames-dimension pattern).
- **partitioned join** (large side): two hash-partitioned ``Dataset.join``
  passes on left_id / right_id (SURVEY.md J4 fallback), no driver residency.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nhse_probabilistic_linkage_ray.config import GAMMA_ELSE, GAMMA_JACCARD_HI, GAMMA_JACCARD_LO, GAMMA_RESCUED, PipelineConfig, TIER_NAMES
from nhse_probabilistic_linkage_ray.functions.jaccard import jaccard_sorted
from nhse_probabilistic_linkage_ray.functions.lcs import lcs_fraction
from nhse_probabilistic_linkage_ray.functions.simhash import hamming_distance

BROADCAST_ROW_LIMIT = 300_000  # feature rows below this are ray.put-broadcast


def _features_to_dict(sig_table: pa.Table, num_perms: int) -> dict:
    """file_id -> (minhash row, simhash, shingles, token_hashes) as numpy."""
    fid = sig_table["file_id"].to_numpy(zero_copy_only=False)
    sigs = np.asarray(sig_table["minhash"].combine_chunks().flatten()).reshape(len(fid), num_perms)
    simh = sig_table["simhash"].to_numpy(zero_copy_only=False)
    sh = sig_table["shingles"].combine_chunks()
    th = sig_table["token_hashes"].combine_chunks()
    sh_vals = np.asarray(sh.values)
    sh_offs = np.asarray(sh.offsets)
    th_vals = np.asarray(th.values)
    th_offs = np.asarray(th.offsets)
    out = {}
    for i in range(len(fid)):
        out[int(fid[i])] = (
            sigs[i],
            np.uint64(simh[i]),
            sh_vals[sh_offs[i]:sh_offs[i + 1]],
            th_vals[th_offs[i]:th_offs[i + 1]],
        )
    return out


def _score_arrays(cfg: PipelineConfig, est, jac, ham, lcs):
    """Vectorized gamma/tier/weight assignment from per-pair feature arrays."""
    n = len(jac)
    gamma = np.zeros(n, dtype=np.int8)
    gamma[jac >= cfg.jaccard_threshold] = GAMMA_JACCARD_LO
    gamma[jac >= cfg.jaccard_hi] = GAMMA_JACCARD_HI
    rescue = (gamma == GAMMA_ELSE) & (
        (ham <= cfg.simhash_hamming_max) | (lcs >= cfg.lcs_frac_threshold)
    )
    gamma[rescue] = GAMMA_RESCUED
    weights = np.array([cfg.match_weight(g) for g in range(5)], dtype=np.float64)
    w = weights[gamma]
    prob = (2.0 ** w) / (1.0 + 2.0 ** w)
    tier = np.array([TIER_NAMES[g] for g in gamma.tolist()], dtype=object)
    return gamma, w, prob, tier


class PairScorer:
    """Actor-pool callable: broadcast feature dict fetched once per actor."""

    def __init__(self, cfg_json: str, features_ref):
        self.cfg = PipelineConfig.from_json(cfg_json)
        self.features = ray.get(features_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_pair_batch(self.cfg, batch, self.features)


def score_pair_batch(cfg: PipelineConfig, batch: pa.Table, features: dict) -> pa.Table:
    left = batch["left_id"].to_numpy(zero_copy_only=False)
    right = batch["right_id"].to_numpy(zero_copy_only=False)
    n = len(left)
    P = cfg.num_perms

    sigL = np.empty((n, P), dtype=np.uint64)
    sigR = np.empty((n, P), dtype=np.uint64)
    simL = np.empty(n, dtype=np.uint64)
    simR = np.empty(n, dtype=np.uint64)
    jac = np.zeros(n, dtype=np.float32)
    shL, shR, thL, thR = [], [], [], []
    for i in range(n):
        fl = features[int(left[i])]
        fr = features[int(right[i])]
        sigL[i], simL[i] = fl[0], fl[1]
        sigR[i], simR[i] = fr[0], fr[1]
        shL.append(fl[2]); shR.append(fr[2])
        thL.append(fl[3]); thR.append(fr[3])

    est = (sigL == sigR).mean(axis=1).astype(np.float32)
    ham = hamming_distance(simL, simR)

    # exact Jaccard only where the estimate clears the rescue floor — pairs far
    # below threshold are decided cheap (est is within ~4/sqrt(P) whp)
    need_exact = est >= cfg.rescue_low
    for i in np.flatnonzero(need_exact):
        jac[i] = jaccard_sorted(shL[i], shR[i])

    # LCS rescue only for near-misses that fail both Jaccard and SimHash
    lcs = np.zeros(n, dtype=np.float32)
    need_lcs = need_exact & (jac < cfg.jaccard_threshold) & (ham > cfg.simhash_hamming_max)
    for i in np.flatnonzero(need_lcs):
        lcs[i] = lcs_fraction(thL[i], thR[i])

    gamma, w, prob, tier = _score_arrays(cfg, est, jac, ham, lcs)
    out = pa.table({
        "left_id": pa.array(left, pa.int64()),
        "right_id": pa.array(right, pa.int64()),
        "match_key": batch["match_key"].combine_chunks(),
        "capped": batch["capped"].combine_chunks(),
        "jaccard_minhash": pa.array(est, pa.float32()),
        "jaccard_exact": pa.array(jac, pa.float32()),
        "hamming_simhash": pa.array(ham, pa.uint8()),
        "lcs_frac": pa.array(lcs, pa.float32()),
        "gamma": pa.array(gamma, pa.int8()),
        "gamma_pattern": pa.array([str(g) for g in gamma.tolist()], pa.string()),
        "tier": pa.array(tier.tolist(), pa.string()),
        "match_weight": pa.array(w, pa.float64()),
        "match_probability": pa.array(prob, pa.float64()),
    })
    return out


def score_stage(
    pairs_ds: "ray.data.Dataset",
    signatures_ds: "ray.data.Dataset",
    config: PipelineConfig,
    *,
    strategy: str = "auto",
    signature_rows: int | None = None,
    pairs_hint: int | None = None,
) -> "ray.data.Dataset":
    """Candidate pairs + signatures -> scored pairs."""
    if strategy == "auto":
        rows = signature_rows if signature_rows is not None else signatures_ds.count()
        strategy = "broadcast" if rows <= BROADCAST_ROW_LIMIT else "join"

    if strategy == "broadcast":
        feat_cols = signatures_ds.select_columns(
            ["file_id", "minhash", "simhash", "shingles", "token_hashes"]
        )
        # one driver-side materialize of the SMALL side, ray.put once
        tbl = pa.concat_tables(feat_cols.iter_batches(batch_format="pyarrow"))
        features = _features_to_dict(tbl, config.num_perms)
        ref = ray.put(features)
        # half the CPUs: pair generation (sort + aggregate + emit) runs
        # concurrently upstream in the same streaming plan; capped by the
        # work available so tiny pair lists don't pay big pool startups
        cpus = int(ray.cluster_resources().get("CPU", 8))
        pool = max(2, cpus // 2)
        if pairs_hint is not None:
            pool = max(2, min(pool, -(-pairs_hint // 4096)))
        return pairs_ds.map_batches(
            PairScorer,
            fn_constructor_args=(config.to_json(), ref),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=pool,
            num_cpus=1,
            zero_copy_batch=True,
        )

    # ---- large-side path: two hash-partitioned joins, then stateless scoring
    from nhse_probabilistic_linkage_ray.stages.cluster import join_partitions

    feat = signatures_ds.select_columns(
        ["file_id", "minhash", "simhash", "shingles", "token_hashes"]
    )
    k = join_partitions(config)
    joined = pairs_ds.join(
        feat, join_type="inner", num_partitions=k,
        on=("left_id",), right_on=("file_id",), right_suffix="_l",
    )
    joined = joined.join(
        feat, join_type="inner", num_partitions=k,
        on=("right_id",), right_on=("file_id",),
        left_suffix="_L", right_suffix="_r",
    )

    cfg_json = config.to_json()

    def score_joined(batch: pa.Table) -> pa.Table:
        cfg = PipelineConfig.from_json(cfg_json)
        cols = batch.column_names

        def pick(base: str, side: str) -> pa.ChunkedArray:
            for cand in (base + side, base):
                if cand in cols:
                    return batch[cand]
            raise KeyError(f"{base}{side} not in {cols}")

        n = len(batch)

        # build a per-batch mini feature dict from the joined columns
        def side_feats(side):
            P = cfg.num_perms
            mh = np.asarray(pick("minhash", side).combine_chunks().flatten()).reshape(n, P)
            sim = pick("simhash", side).to_numpy(zero_copy_only=False)
            sh = pick("shingles", side).combine_chunks()
            th = pick("token_hashes", side).combine_chunks()
            shv, sho = np.asarray(sh.values), np.asarray(sh.offsets)
            thv, tho = np.asarray(th.values), np.asarray(th.offsets)
            return mh, sim, (shv, sho), (thv, tho)

        mhL, simL, (shv, sho), (thv, tho) = side_feats("_L") if "minhash_L" in cols else side_feats("")
        mhR, simR, (shv2, sho2), (thv2, tho2) = side_feats("_r")

        ids_l = batch["left_id"].to_numpy(zero_copy_only=False)
        ids_r = batch["right_id"].to_numpy(zero_copy_only=False)
        # reuse score_pair_batch via a transient dict keyed by id — ids can
        # repeat across rows; last write wins is fine (same features)
        fdict = {}
        for i in range(n):
            fdict[int(ids_l[i])] = (mhL[i], np.uint64(simL[i]), shv[sho[i]:sho[i+1]], thv[tho[i]:tho[i+1]])
            fdict[int(ids_r[i])] = (mhR[i], np.uint64(simR[i]), shv2[sho2[i]:sho2[i+1]], thv2[tho2[i]:tho2[i+1]])
        slim = pa.table({k2: batch[k2] for k2 in ("left_id", "right_id", "match_key", "capped")})
        return score_pair_batch(cfg, slim, fdict)

    return joined.map_batches(score_joined, batch_format="pyarrow", batch_size=4096)
