"""Evaluation pipeline: predictions vs ground truth.

Parity with the reference's evaluation notebooks (SURVEY.md §3.3,
``/root/reference/notebooks_dedupe/evaluation_dedupe.py``):

- expected-vs-found pair accounting (ref outer join + flags,
  ``utils/model_utils.py:162-190`` / ``utils/eval_utils.py:451-481``),
- per-threshold confusion counts in ONE streaming pass (ref 4 filtered
  counts per threshold, flagged "~40 minutes" at ``evaluation_dedupe.py:135``),
- missed-duplicate analysis (ref ``evaluation_dedupe.py:112-126``): the truth
  pairs the pipeline never scored, with a bounded sample surfaced,
- cluster-agreement check against truth clusters (Rand-style pair agreement).

Truth pair sets are evaluation-scale by contract (the reference evaluates on
a 100k-record slice, ``mps_comparison_evaluation.py:77``) — they broadcast;
the PREDICTION side streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from nhse_probabilistic_linkage_ray.functions.hashing import (
    pair_member_mask,
    sorted_pair_keys,
)
from nhse_probabilistic_linkage_ray.stages.report import confusion_one_pass


def _norm_pairs(pairs: set) -> set:
    return {(min(a, b), max(a, b)) for a, b in pairs}


def evaluate_dedupe(
    scored_ds: "ray.data.Dataset",
    clusters_ds: "ray.data.Dataset",
    truth_pairs: set,
    *,
    exact_mapped_ds: "ray.data.Dataset | None" = None,
    config=None,
    thresholds: list | None = None,
    link_min_gamma: int = 2,
    missed_sample: int = 100,
) -> dict:
    """Returns {pair_recall, pair_precision, confusion (pa.Table),
    n_missed, missed_pairs (list, bounded), cluster_pair_agreement}.

    Pass ``exact_mapped_ds`` (+ config) to include the EXACT tier in the
    pairwise accounting: exact duplicates are collapsed in the pre-pass and
    never reach ``scored_ds``, so without it a truth set containing exact
    pairs shows pairwise recall 0 while cluster agreement is 1. Note the
    pairwise metrics count the emitted member->rep star pairs (like the
    reference's pairwise-prediction table); transitively-implied member
    pairs are covered by ``cluster_pair_agreement``."""
    if exact_mapped_ds is not None:
        from nhse_probabilistic_linkage_ray.config import PipelineConfig
        from nhse_probabilistic_linkage_ray.stages.score import exact_scored_pairs

        exact = exact_scored_pairs(exact_mapped_ds, config or PipelineConfig()) \
            .select_columns(["left_id", "right_id", "gamma", "match_weight"])
        scored_ds = scored_ds.select_columns(
            ["left_id", "right_id", "gamma", "match_weight"]).union(exact)
    truth = _norm_pairs(truth_pairs)
    truth_ref = ray.put(sorted_pair_keys(truth) if truth else np.empty(0, "V16"))
    # confusion thresholds are in MATCH-WEIGHT space (log2 Bayes factor) —
    # the reference thresholds weights (MATCH_WEIGHT_THRESHOLD = 5,
    # parameters_dedupe.py:22); absolute match_probability is prior-dominated
    # before training, so a probability axis degenerates under the default
    # untrained prior
    thresholds = thresholds or [-10.0, -5.0, 0.0, 5.0, 10.0]

    # ---- found-pair accounting: one streaming pass over scored pairs.
    # "linked" uses the PIPELINE's decision boundary (gamma >= the cluster
    # tier), exactly what connected components consumed.
    def tally(batch: pa.Table) -> pa.Table:
        truth_keys = ray.get(truth_ref)
        l = batch["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = batch["gamma"].to_numpy(zero_copy_only=False)
        linked = g >= link_min_gamma
        is_true = pair_member_mask(truth_keys, l, r)
        return pa.table({
            "tp": pa.array([int((linked & is_true).sum())], pa.int64()),
            "fp": pa.array([int((linked & ~is_true).sum())], pa.int64()),
            "found_true": pa.array([int(is_true.sum())], pa.int64()),
        })

    agg = scored_ds.map_batches(tally, batch_format="pyarrow").aggregate(
        Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
        Sum("found_true", alias_name="found_true"))
    tp = int(agg.get("tp") or 0)
    fp = int(agg.get("fp") or 0)

    # ---- missed duplicates: truth pairs whose BOTH endpoints never linked
    # into the same cluster. Checked against the cluster assignment (the
    # product surface), not just the pair list — a pair can be missed by
    # blocking yet still correctly clustered via a third file.
    assign: dict = {}
    ids_needed = frozenset(x for ab in truth for x in ab)
    need_ref = ray.put(ids_needed)

    def pick(batch: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        m = np.fromiter((int(x) in need for x in fid), dtype=bool, count=len(fid))
        return pa.table({"file_id": pa.array(fid[m], pa.int64()),
                         "cluster_id": batch["cluster_id"].filter(pa.array(m))})

    for b in clusters_ds.map_batches(pick, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        assign.update(zip(b["file_id"].to_pylist(), b["cluster_id"].to_pylist()))

    missed = [(a, b) for a, b in sorted(truth)
              if assign.get(a) is None or assign.get(a) != assign.get(b)]
    together = len(truth) - len(missed)

    conf = confusion_one_pass(scored_ds, truth, thresholds,
                              score_col="match_weight")

    return {
        "pair_recall": tp / len(truth) if truth else 1.0,
        "pair_precision": tp / (tp + fp) if tp + fp else 1.0,
        "confusion": conf,
        "n_truth": len(truth),
        "n_missed": len(missed),
        "missed_pairs": missed[:missed_sample],
        "cluster_pair_agreement": together / len(truth) if truth else 1.0,
    }
