"""Linking mode: link an external files table against a corpus.

The dual of the dedupe pipeline — parity with the reference's link flow
(``/root/reference/predict_linking.py:142-155``: ``match_probabilities_output``
outer join + ``get_best_match``; window semantics at
``/root/reference/utils/model_utils.py:194-254``; thresholds
``MATCH_WEIGHT_THRESHOLD``/``CLOSE_MATCHES_THRESHOLD`` at
``/root/reference/parameters_dedupe.py:22-23``):

1. ingest both tables (same normalize/hash front end as dedupe),
2. signature the UNION (one actor pool; signatures are side-agnostic),
3. LSH candidate pairs, then keep only CROSS-dataset pairs (Splink
   ``link_only`` semantics) via a broadcast of the external id set — the
   external table is the small side by contract (ref ``load_data_to_link``),
4. tiered scoring (same comparison levels as dedupe),
5. per external record: best match by ``match_weight`` (tie-break: lowest
   corpus file_id), close-match count within ``close_matches_threshold`` of
   the best weight (difference rounded to 4 dp like the reference's
   ``mp_difference``), and the reference's ``splink_close_match`` flag
   (close list > 1 AND best weight >= ``match_weight_threshold``),
6. full-outer semantics: every external record appears in the output;
   records with no candidate get best_match_id = -1 and null-ish scores
   (ref ``match_probabilities_output`` outer join).

Note on the exact tier: dedupe routes sha-equal files through the exact
pre-pass (gamma 4); in link mode identical contents simply score
jaccard_exact = 1.0 (gamma 3) — same decision, one code path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.stages.candidates import candidate_pairs
from nhse_probabilistic_linkage_ray.stages.ingest import ingest_stage
from nhse_probabilistic_linkage_ray.stages.score import score_stage
from nhse_probabilistic_linkage_ray.stages.signature import signature_stage

# the external table must broadcast (ray.put id set); the corpus side is
# unbounded. Mirrors the reference's shape: a bounded externally-supplied
# table linked against the full PDS corpus.
EXTERNAL_BROADCAST_LIMIT = 50_000_000


def link_datasets(
    external_ds: "ray.data.Dataset",
    corpus_ds: "ray.data.Dataset",
    config: PipelineConfig | None = None,
    *,
    close_matches_threshold: float = 5.0,
    match_weight_threshold: float = 5.0,
) -> "ray.data.Dataset":
    """Two files-shaped Datasets -> one row per external record:
    (ext_id, best_match_id, gamma, match_weight, match_probability,
    n_close, close_match)."""
    config = config or PipelineConfig()

    ing_ext = ingest_stage(external_ds, config).materialize()
    ing_cor = ingest_stage(corpus_ds, config)

    # broadcast external id set — the cross-side filter and the outer-join
    # completion both need it; collected once, bounded by contract. Sorted
    # int64 array, not a Python set: membership tests below are vectorized
    # np.isin over pair batches, never a per-row Python loop
    chunks = [b["file_id"].to_numpy(zero_copy_only=False)
              for b in ing_ext.select_columns(["file_id"]).iter_batches(batch_format="pyarrow")]
    ext_ids = np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.int64)
    if len(ext_ids) > EXTERNAL_BROADCAST_LIMIT:
        raise ValueError(
            f"external side has {len(ext_ids)} rows; linking expects the "
            f"bounded external table on the left (ref load_data_to_link)")
    ext_ref = ray.put(ext_ids)

    both = ing_ext.union(ing_cor)
    sigs = signature_stage(both, config).materialize()

    pairs = candidate_pairs(sigs, config)

    def cross_side(batch: pa.Table) -> pa.Table:
        ids = ray.get(ext_ref)
        l = batch["left_id"].to_numpy(zero_copy_only=False)
        r = batch["right_id"].to_numpy(zero_copy_only=False)
        lm = np.isin(l, ids, assume_unique=False)
        rm = np.isin(r, ids, assume_unique=False)
        return batch.filter(pa.array(lm != rm))  # exactly one endpoint external

    cross = pairs.map_batches(cross_side, batch_format="pyarrow", zero_copy_batch=True)
    scored = score_stage(cross, sigs, config)

    def orient(batch: pa.Table) -> pa.Table:
        ids = ray.get(ext_ref)
        l = batch["left_id"].to_numpy(zero_copy_only=False)
        r = batch["right_id"].to_numpy(zero_copy_only=False)
        lm = np.isin(l, ids)
        return pa.table({
            "ext_id": pa.array(np.where(lm, l, r), pa.int64()),
            "match_id": pa.array(np.where(lm, r, l), pa.int64()),
            "gamma": batch["gamma"].combine_chunks(),
            "match_weight": batch["match_weight"].combine_chunks(),
            "match_probability": batch["match_probability"].combine_chunks(),
        })

    oriented = scored.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)

    # per-external-record top-1 via ONE sort + vectorized segment scan (the
    # scale-safe grouped apply of stages/segments.py) — rows arrive sorted by
    # (weight desc, match_id asc), so the group's first row IS the best match
    def best_seg(g: dict) -> dict:
        w = np.asarray(g["match_weight"], dtype=np.float64)
        max_w = w[0]
        # ref mp_difference: round(max - w, 4) < threshold (incl. the best)
        n_close = int((np.round(max_w - w, 4) < close_matches_threshold).sum())
        return {
            "ext_id": [int(np.asarray(g["ext_id"])[0])],
            "best_match_id": [int(np.asarray(g["match_id"])[0])],
            "gamma": [int(np.asarray(g["gamma"])[0])],
            "match_weight": [float(max_w)],
            "match_probability": [float(np.asarray(g["match_probability"])[0])],
            "n_close": [n_close],
            "close_match": [bool(n_close > 1 and max_w >= match_weight_threshold)],
        }

    from nhse_probabilistic_linkage_ray.stages.segments import grouped_segment_apply

    best_schema = pa.schema([
        ("ext_id", pa.int64()), ("best_match_id", pa.int64()),
        ("gamma", pa.int64()), ("match_weight", pa.float64()),
        ("match_probability", pa.float64()), ("n_close", pa.int64()),
        ("close_match", pa.bool_()),
    ])
    matched = grouped_segment_apply(
        oriented, "ext_id", ["ext_id", "match_weight", "match_id"],
        [False, True, False], best_seg, best_schema).materialize()

    # outer-join completion: external records with no candidates
    mchunks = [b["ext_id"].to_numpy(zero_copy_only=False)
               for b in matched.select_columns(["ext_id"]).iter_batches(batch_format="pyarrow")]
    matched_ids = np.unique(np.concatenate(mchunks)) if mchunks else np.empty(0, np.int64)
    matched_ref = ray.put(matched_ids)

    def unmatched(batch: pa.Table) -> pa.Table:
        got = ray.get(matched_ref)
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        fid = fid[~np.isin(fid, got)]
        n = len(fid)
        return pa.table({
            "ext_id": pa.array(fid, pa.int64()),
            "best_match_id": pa.array(np.full(n, -1, np.int64)),
            "gamma": pa.array(np.full(n, -1, np.int8)),
            "match_weight": pa.array(np.full(n, np.nan), pa.float64()),
            "match_probability": pa.array(np.full(n, np.nan), pa.float64()),
            "n_close": pa.array(np.zeros(n, np.int64)),
            "close_match": pa.array(np.zeros(n, bool)),
        })

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "ext_id": batch["ext_id"].combine_chunks().cast(pa.int64()),
            "best_match_id": batch["best_match_id"].combine_chunks().cast(pa.int64()),
            "gamma": batch["gamma"].combine_chunks().cast(pa.int8()),
            "match_weight": batch["match_weight"].combine_chunks().cast(pa.float64()),
            "match_probability": batch["match_probability"].combine_chunks().cast(pa.float64()),
            "n_close": batch["n_close"].combine_chunks().cast(pa.int64()),
            "close_match": batch["close_match"].combine_chunks().cast(pa.bool_()),
        })

    no_match = ing_ext.select_columns(["file_id"]).map_batches(
        unmatched, batch_format="pyarrow", zero_copy_batch=True)
    return matched.map_batches(cast, batch_format="pyarrow").union(
        no_match.map_batches(cast, batch_format="pyarrow"))


def run_link(
    external_path: str,
    corpus_path: str,
    workdir: str,
    config: PipelineConfig | None = None,
    *,
    close_matches_threshold: float = 5.0,
    match_weight_threshold: float = 5.0,
    resume: bool = True,
) -> dict:
    """Checkpointed linking run over two Parquet files tables — the analog of
    ``predict_linking`` writing its MATCH_PROBABILITIES and BEST_MATCH tables
    (``/root/reference/predict_linking.py:142-160``): ``best_matches/`` is
    written under ``workdir`` with a manifest keyed by (config hash, combined
    input fingerprint); an unchanged rerun reuses it, a changed input or
    config recomputes."""
    import os

    import ray.data

    from nhse_probabilistic_linkage_ray.state import manifests

    config = config or PipelineConfig()
    os.makedirs(workdir, exist_ok=True)
    fp = (manifests.input_fingerprint(external_path) + "+"
          + manifests.input_fingerprint(corpus_path)
          + f"+cmt{close_matches_threshold}+mwt{match_weight_threshold}")
    ch = config.config_hash

    d = os.path.join(workdir, "best_matches")
    if resume and manifests.is_complete(d, ch, fp):
        return {"best_matches": manifests.load(d), "workdir": workdir}
    res = link_datasets(
        ray.data.read_parquet(external_path), ray.data.read_parquet(corpus_path),
        config, close_matches_threshold=close_matches_threshold,
        match_weight_threshold=match_weight_threshold)
    out = manifests.checkpoint(res, d, stage="best_matches", config_hash=ch,
                               input_fingerprint=fp)
    return {"best_matches": out, "workdir": workdir}
