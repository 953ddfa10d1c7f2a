"""Reporting / evaluation aggregates.

Ray-native recasts of the reference's evaluation notebooks (SURVEY.md §2.5,
§2.6): every metric is a streaming aggregate — in particular the per-threshold
confusion matrix is ONE pass of partial per-batch count matrices + a sum,
instead of the reference's 4 filtered ``.count()`` jobs per threshold
(``/root/reference/utils/eval_utils.py:485-520``, flagged "~40 minutes" at
``notebooks_dedupe/evaluation_dedupe.py:135``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from nhse_probabilistic_linkage_ray.config import PipelineConfig


def cluster_size_histogram(clusters_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Count-of-counts (A1, ref select_training_data_dedupe.py:45-48):
    (cluster_size, n_clusters) sorted by size."""
    sizes = clusters_ds.groupby("cluster_id").aggregate(Count(alias_name="cluster_size"))
    return sizes.groupby("cluster_size").aggregate(Count(alias_name="n_clusters")) \
                .sort("cluster_size")


def candidate_count_histogram(
    bands_counts_ds: "ray.data.Dataset", bins: tuple = (2, 5, 10, 100, 1000, 10_000)
) -> "ray.data.Dataset":
    """Pairs-per-band skew monitor (A2/A6, ref blocking_evaluation_dedupe.py:91-116):
    bucket member counts of each (band, hash) group into bins, count groups."""
    edges = np.asarray(bins, dtype=np.int64)

    def binit(batch: pa.Table) -> pa.Table:
        n = batch["n_members"].to_numpy(zero_copy_only=False)
        idx = np.digitize(n, edges)
        labels = ["<" + str(edges[0])] + [
            f"{edges[i]}-{edges[i+1]-1}" for i in range(len(edges) - 1)
        ] + [f">={edges[-1]}"]
        lab = np.array(labels, dtype=object)[idx]
        return pa.table({"bin": pa.array(lab.tolist(), pa.string()),
                         "n_groups": pa.array(np.ones(len(n), np.int64), pa.int64())})

    return bands_counts_ds.map_batches(binit, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("n_groups", alias_name="n_groups")).sort("bin")


def confusion_one_pass(
    scored_ds: "ray.data.Dataset",
    truth_pairs: set,
    thresholds: list,
    score_col: str = "match_probability",
) -> "pa.Table":
    """Per-threshold TP/FP (+ FN derived from truth size) in ONE streaming
    pass: each batch contributes a (threshold x outcome) partial count matrix;
    matrices are summed (A4 one-pass design). ``truth_pairs`` is the oracle
    dup-pair set (small by construction at evaluation scale)."""
    th = np.asarray(sorted(thresholds), dtype=np.float64)
    import ray

    from nhse_probabilistic_linkage_ray.functions.hashing import (
        pair_member_mask,
        sorted_pair_keys,
    )

    # broadcast the truth set as a sorted canonical V16 key array: membership
    # per batch is one searchsorted + memcmp, not a per-row Python set probe
    truth_ref = ray.put(sorted_pair_keys(truth_pairs)
                        if truth_pairs else np.empty(0, "V16"))

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        truth_keys = _ray.get(truth_ref)
        l = batch["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch[score_col].to_numpy(zero_copy_only=False)
        is_true = pair_member_mask(truth_keys, l, r)
        above = p[None, :] >= th[:, None]          # (T, n)
        tp = (above & is_true[None, :]).sum(axis=1)
        fp = (above & ~is_true[None, :]).sum(axis=1)
        return pa.table({
            "threshold": pa.array(th, pa.float64()),
            "tp": pa.array(tp, pa.int64()),
            "fp": pa.array(fp, pa.int64()),
        })

    agg = scored_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("threshold").aggregate(Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp")) \
        .sort("threshold")
    t = pa.concat_tables(agg.iter_batches(batch_format="pyarrow")) if agg.count() \
        else pa.table({"threshold": pa.array(th), "tp": pa.array(np.zeros(len(th), np.int64)),
                       "fp": pa.array(np.zeros(len(th), np.int64))})
    n_truth = len(truth_pairs)
    tp = t["tp"].to_numpy()
    fn = n_truth - tp
    recall = np.divide(tp, n_truth, out=np.ones_like(tp, dtype=np.float64), where=n_truth > 0)
    return t.append_column("fn", pa.array(fn, pa.int64())) \
            .append_column("recall", pa.array(recall, pa.float64()))


def elect_representatives(clusters_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-cluster canonical representative = min(file_id) (O1 recast: the
    reference's get_best_match top-1 window, utils/model_utils.py:194-254)."""
    return clusters_ds.groupby("cluster_id").aggregate(
        Min("file_id", alias_name="representative"),
        Count(alias_name="cluster_size"),
    )


def close_matches(scored_ds: "ray.data.Dataset", config: PipelineConfig) -> "ray.data.Dataset":
    """Gamma-1 pairs: similar but below the link threshold — the reference's
    close-match list within CLOSE_MATCHES_THRESHOLD
    (/root/reference/parameters_dedupe.py:23-24)."""
    return scored_ds.map_batches(
        lambda t: t.filter(pa.array(t["gamma"].to_numpy(zero_copy_only=False) == 1)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def capped_band_report(scored_ds: "ray.data.Dataset") -> "pa.Table":
    """Surfaced skew metric: how many surviving pairs came from capped
    (over-sized) band buckets — the explicit version of what the reference
    only monitors after the fact."""
    agg = scored_ds.map_batches(
        lambda t: pa.table({
            "capped_pairs": pa.array([int((t["capped"].to_numpy(zero_copy_only=False) > 0).sum())], pa.int64()),
            "pairs": pa.array([len(t)], pa.int64()),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).aggregate(Sum("capped_pairs", alias_name="capped_pairs"), Sum("pairs", alias_name="pairs"))
    return agg


def cumulative_pairs_per_band(pairs_ds: "ray.data.Dataset") -> "pa.Table":
    """Cumulative comparisons per blocking rule (A6 second half, ref
    ``cumulative_comparisons_from_blocking_rules_records`` usage at
    /root/reference/notebooks_dedupe/blocking_evaluation_dedupe.py:162-175):
    for each band (≙ blocking rule), how many NEW pairs it contributed — a
    pair counts for the band that is its min ``match_key``, which is exactly
    the provenance the pair-dedup aggregate already keeps (D4) — plus the
    running cumulative total. One distributed groupby; the cumsum runs over
    the <= num_bands result rows on the driver."""
    per = pairs_ds.groupby("match_key").aggregate(Count(alias_name="n_new_pairs")) \
        .sort("match_key")
    batches = list(per.iter_batches(batch_format="pyarrow"))
    t = pa.concat_tables(batches) if batches else pa.table(
        {"match_key": pa.array([], pa.int32()), "n_new_pairs": pa.array([], pa.int64())})
    cum = np.cumsum(t["n_new_pairs"].to_numpy(zero_copy_only=False))
    return t.append_column("cumulative_pairs", pa.array(cum, pa.int64()))


def gamma_pattern_table(scored_ds: "ray.data.Dataset", gamma_cols: list | None = None) -> "ray.data.Dataset":
    """Generic agreement-pattern concat over any set of gamma_* columns (M18,
    ref add_agreement_pattern utils/eval_utils.py:207-215; contract incl.
    gamma=-1 and ignoring non-gamma columns pinned by tests/eval_tests.py:584-693)."""

    def add_pattern(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = gamma_cols or [c for c in batch.column_names if c.startswith("gamma_")]
        if not cols:
            pat = pa.array([""] * len(batch), pa.string())
        else:
            # vectorized concat: cast each gamma col to string, join element-wise
            str_cols = [batch[c].combine_chunks().cast(pa.string()) for c in cols]
            pat = pc.binary_join_element_wise(*str_cols, "")
        return batch.append_column("agreement_pattern", pat)

    return scored_ds.map_batches(add_pattern, batch_format="pyarrow")
