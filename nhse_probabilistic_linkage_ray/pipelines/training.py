"""Fellegi-Sunter parameter estimation — the training phase.

Parity with the reference's Splink training notebooks (SURVEY.md A8/A9/A10,
``/root/reference/notebooks_dedupe/training_dedupe.py``):

- ``estimate_u``: random-pair sampling capped at ``max_pairs``
  (ref ``estimate_u_using_random_sampling(max_pairs=1e8)``, :105). Sampling is
  hash-deterministic (SURVEY.md O2: no order-dependent RNG).
- ``estimate_m_em``: expectation-maximisation over candidate pairs
  (ref ``estimate_parameters_using_expectation_maximisation``, :112-129).
  Key simplification our tiered model affords: p(match | gamma) is identical
  for every pair with the same gamma, so after ONE distributed gamma
  histogram the EM loop is pure driver-side arithmetic over 5 bins — no
  per-iteration cluster jobs (the reference launches one Spark job per EM
  round).
- ``average_m_values``: mean m across models + the reference's clamping rules
  (m=0 -> 1e-6, u -> 1e-9, renormalize; ref ``utils/model_utils.py:35-103``).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions.hashing import stable_bucket


def sample_bucket_ids(
    signatures_ds: "ray.data.Dataset", bucket_count: int, offset: int, limit: int
) -> np.ndarray:
    """Deterministic hash-bucket sample of the id column, as DATASET ops: the
    bucket predicate runs inside map_batches and only the ~n/bucket_count
    surviving ids are collected (sorted, truncated to ``limit``). The round-1
    version collected every file_id to the driver — ~8 TB at 10^12 rows."""
    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["file_id"].to_numpy(zero_copy_only=False)
        m = stable_bucket(ids + offset, bucket_count) == 0
        return batch.filter(pa.array(m))

    sub = signatures_ds.select_columns(["file_id"]).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True)
    chunks = [b["file_id"].to_numpy(zero_copy_only=False)
              for b in sub.iter_batches(batch_format="pyarrow")]
    ids = np.concatenate(chunks) if chunks else np.empty(0, np.int64)
    return np.sort(ids)[:limit]  # sorted: stable across parallelism levels


def sample_random_pairs(
    signatures_ds: "ray.data.Dataset", config: PipelineConfig, max_pairs: int = 1_000_000
) -> "ray.data.Dataset":
    """Deterministic pseudo-random record pairs: two hash-bucket samples of
    the id space, crossed. Sample sizes chosen so s1*s2 <= max_pairs; only
    the two bounded samples (<= isqrt(max_pairs) ids each) ever reach the
    driver (ref cap semantics: estimate_u_using_random_sampling(max_pairs),
    /root/reference/notebooks_dedupe/training_dedupe.py:105)."""
    n = signatures_ds.count()
    if n < 2:
        return ray.data.from_arrow(pa.table({"left_id": pa.array([], pa.int64()),
                                             "right_id": pa.array([], pa.int64()),
                                             "match_key": pa.array([], pa.int32()),
                                             "capped": pa.array([], pa.uint8())}))
    s = max(2, min(n, int(math.isqrt(max_pairs))))
    k = max(1, n // s)
    a = sample_bucket_ids(signatures_ds, k, 0, s)
    b = sample_bucket_ids(signatures_ds, k, 1, s)
    li, ri = np.meshgrid(a, b, indexing="ij")
    li, ri = li.ravel(), ri.ravel()
    mask = li < ri
    li, ri = li[mask], ri[mask]
    t = pa.table({
        "left_id": pa.array(li, pa.int64()),
        "right_id": pa.array(ri, pa.int64()),
        "match_key": pa.array(np.full(len(li), -1, np.int32)),
        "capped": pa.array(np.zeros(len(li), np.uint8)),
    })
    return ray.data.from_arrow(t)


def gamma_histogram(scored_ds: "ray.data.Dataset") -> dict:
    """{gamma: count} via one distributed aggregate."""
    agg = scored_ds.select_columns(["gamma"]).groupby("gamma").aggregate(Count(alias_name="n"))
    return {int(r["gamma"]): int(r["n"]) for r in agg.take_all()}


def estimate_u(
    signatures_ds: "ray.data.Dataset", config: PipelineConfig, max_pairs: int = 1_000_000
) -> tuple:
    """u probabilities = tier frequencies among (overwhelmingly non-match)
    random pairs; zero-count tiers fall to the clamping floor."""
    from nhse_probabilistic_linkage_ray.stages.score import score_stage

    pairs = sample_random_pairs(signatures_ds, config, max_pairs)
    scored = score_stage(pairs, signatures_ds, config)
    hist = gamma_histogram(scored)
    total = sum(v for g, v in hist.items() if g >= 0)
    u = [hist.get(g, 0) / total if total else 0.0 for g in range(5)]
    return tuple(u)


def estimate_m_em(
    gamma_hist: dict,
    config: PipelineConfig,
    *,
    iterations: int = 30,
    tol: float = 1e-8,
) -> tuple:
    """EM over the gamma histogram of CANDIDATE pairs. Returns (m, u, prior).
    Driver-side by design: the sufficient statistics are 5 counts."""
    m, u = list(config.clamped_mu()[0]), list(config.clamped_mu()[1])
    counts = {g: c for g, c in gamma_hist.items() if g >= 0}
    total = sum(counts.values())
    if total == 0:
        return tuple(m), tuple(u), config.prior
    # initialize the prior from the strong-agreement fraction of the CANDIDATE
    # pairs (blocked pairs are match-enriched; starting from the corpus-level
    # prior collapses EM into the all-non-match local optimum)
    strong = sum(c for g, c in counts.items() if g >= 2)
    prior = min(max(strong / total, config.prior, 1e-4), 1 - 1e-6)
    for _ in range(iterations):
        # E: responsibility per gamma bin
        resp = {}
        for g, c in counts.items():
            pm = prior * m[g]
            pu = (1 - prior) * u[g]
            resp[g] = pm / (pm + pu) if pm + pu > 0 else 0.0
        # M: weighted frequencies
        wm = sum(resp[g] * c for g, c in counts.items())
        wu = sum((1 - resp[g]) * c for g, c in counts.items())
        new_prior = min(max(wm / total, 1e-12), 1 - 1e-12)
        new_m = [max((resp.get(g, 0.0) * counts.get(g, 0)) / wm if wm else m[g], 1e-6) for g in range(5)]
        new_u = [max(((1 - resp.get(g, 0.0)) * counts.get(g, 0)) / wu if wu else u[g], 1e-9) for g in range(5)]
        sm = sum(new_m)
        new_m = [x / sm for x in new_m]
        delta = abs(new_prior - prior) + sum(abs(a - b) for a, b in zip(new_m, m))
        m, u, prior = new_m, new_u, new_prior
        if delta < tol:
            break
    return tuple(m), tuple(u), prior


def average_m_values(models: list) -> tuple:
    """Mean m per tier across models + reference clamping
    (ref utils/model_utils.py:35-103: m=0 -> 1e-6, NaN u -> 1e-9, sum(m)=1)."""
    ms = np.array([mod if not isinstance(mod, PipelineConfig) else mod.m_probabilities
                   for mod in models], dtype=np.float64)
    mean = np.nanmean(ms, axis=0)
    mean = np.where(np.isnan(mean) | (mean == 0), 1e-6, mean)
    mean = mean / mean.sum()
    return tuple(float(x) for x in mean)


def run_training(
    files_ds: "ray.data.Dataset",
    config: PipelineConfig,
    *,
    n_training_rules: int = 4,
    max_u_pairs: int = 1_000_000,
    store_dir: str | None = None,
    description: str = "trained model",
) -> dict:
    """Orchestrated multi-rule training end-to-end — the composed form of the
    reference's training lifecycle (SURVEY.md §3.1 step 5,
    ``/root/reference/notebooks_dedupe/training_dedupe.py:105-155``):

    1. ingest -> exact groups -> signatures (shared stages, run once),
    2. ``estimate_u`` from capped deterministic random pairs (ref :105),
    3. EM **per training blocking rule** — the ref loops 7 training blocking
       rules, re-running EM per rule (:112-129). Here a training rule is a
       band-subset: pairs carry ``match_key`` = the (minimum) band that found
       them, and rule i owns bands ``i, i+n, i+2n, ...`` — n disjoint
       candidate-pair strata from ONE banding pass instead of n re-blockings,
    4. ``average_m_values`` across the per-rule models + mean prior
       (ref ``get_average_m_values_from_models``, :139-155),
    5. optional save to the model store (ref ``save_model_to_json``).

    Returns {"config": trained PipelineConfig, "per_rule_m": [...],
    "u": tuple, "prior": float, "model_path": str | None}.
    """
    from nhse_probabilistic_linkage_ray.stages.candidates import candidate_pairs
    from nhse_probabilistic_linkage_ray.stages.ingest import (
        exact_group_stage,
        ingest_stage,
        representatives,
    )
    from nhse_probabilistic_linkage_ray.stages.score import score_stage
    from nhse_probabilistic_linkage_ray.stages.signature import signature_stage

    mapped = exact_group_stage(ingest_stage(files_ds, config), config).materialize()
    sigs = signature_stage(representatives(mapped), config).materialize()

    u = estimate_u(sigs, config, max_u_pairs)
    u = tuple(x if x > 0 else 1e-9 for x in u)
    cfg_u = dataclasses.replace(config, u_probabilities=u)

    # one banding pass; scored once; rules are disjoint match_key strata
    pairs = candidate_pairs(sigs, config).materialize()
    scored = score_stage(pairs, sigs, cfg_u,
                         signature_rows=sigs.count()).materialize()

    n_rules = max(1, min(n_training_rules, config.num_bands))
    per_rule_m, priors = [], []
    for i in range(n_rules):
        def in_rule(batch: pa.Table, rule=i) -> pa.Table:
            mk = batch["match_key"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(mk % n_rules == rule))

        hist = gamma_histogram(scored.map_batches(
            in_rule, batch_format="pyarrow", zero_copy_batch=True))
        if not any(c for g, c in hist.items() if g >= 0):
            continue  # rule found no pairs — ref's try/except skip (:114-117)
        m_i, _u_i, prior_i = estimate_m_em(hist, cfg_u)
        per_rule_m.append(m_i)
        priors.append(prior_i)

    m_avg = average_m_values(per_rule_m) if per_rule_m else cfg_u.clamped_mu()[0]
    prior = float(np.mean(priors)) if priors else config.prior
    trained = dataclasses.replace(config, m_probabilities=m_avg,
                                  u_probabilities=u, prior=prior)

    model_path = None
    if store_dir:
        from nhse_probabilistic_linkage_ray.sources.model_store import save_model

        model_path = save_model(store_dir, trained, description)
    return {"config": trained, "per_rule_m": per_rule_m, "u": u,
            "prior": prior, "model_path": model_path}


def train_config(
    signatures_ds: "ray.data.Dataset",
    scored_pairs_ds: "ray.data.Dataset",
    config: PipelineConfig,
    *,
    max_u_pairs: int = 1_000_000,
) -> PipelineConfig:
    """Full training pass: u from random pairs, (m, prior) from EM over the
    candidate-pair gamma histogram; returns a new config (the 'model')."""
    u = estimate_u(signatures_ds, config, max_u_pairs)
    u = tuple(x if x > 0 else 1e-9 for x in u)
    hist = gamma_histogram(scored_pairs_ds)
    cfg_u = dataclasses.replace(config, u_probabilities=u)
    m, u2, prior = estimate_m_em(hist, cfg_u)
    return dataclasses.replace(config, m_probabilities=m, u_probabilities=u2, prior=prior)
