"""Ingest: read + filter + normalize + hash + exact-dedup pre-pass.

Analog of the reference's ingestion/preprocessing front end:

- per-document filter (drop non-text/oversize) ≙ confidentiality filter
  (``/root/reference/utils/dataset_ingestion_utils.py:15-34``, SURVEY.md M15)
- normalize + derive ids/hashes ≙ ``preprocess_all_demographics``
  (``/root/reference/utils/preprocessing_utils.py:447-468``, M12) — one fused
  ``map_batches`` stage (fusion is free in Ray Data's streaming executor)
- exact-dedup pre-pass ≙ ``dropDuplicates`` (D1) and the exact-match
  comparison level: ``groupby(group_key)`` collapses byte- and
  normalized-identical files before any signature work — the big volume
  reducer at scale.

The per-row invariant (BASELINE.json): ``content_sha256`` computed here from
the *raw* content is carried through every downstream table untouched.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions.hashing import (
    file_id_column,
    fixed_prefix_keys,
    sha256_hex_column,
)
from nhse_probabilistic_linkage_ray.functions.normalize import (
    normalize_content_column,
    token_count_column,
)
import hashlib


def _normalize_and_hash(batch: pa.Table, cfg_json: str) -> pa.Table:
    import pyarrow.compute as pc

    cfg = PipelineConfig.from_json(cfg_json)
    content = batch["content"].combine_chunks()
    fid = file_id_column(batch["repo"].combine_chunks(), batch["path"].combine_chunks(),
                         batch["commit"].combine_chunks())
    sha = sha256_hex_column(content)

    # Vectorized string canonicalization + token counting (Arrow RE2 kernels
    # with exact-parity Python fallback on non-ASCII rows — see normalize.py).
    # Only sha256 remains per-row below; the whole-corpus hot loop that used
    # to run normalize/tokenize per row (VERDICT r2 fix #3) is gone.
    norm_arr, ascii_mask = normalize_content_column(
        content, strip_trailing_ws=cfg.strip_trailing_ws,
        collapse_blank_lines=cfg.collapse_blank_lines, lowercase=cfg.lowercase)
    norm_arr = pc.fill_null(norm_arr, "").cast(pa.large_string())
    n_tokens = token_count_column(norm_arr, ascii_mask)
    filled = pc.fill_null(content, "")
    n_lines = pc.add(pc.count_substring(filled, "\n"), 1).cast(pa.int32()) \
        .to_numpy(zero_copy_only=False).copy()
    size = pc.utf8_length(filled).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_lines[size == 0] = 0

    # group key: normalized-content hash when the row can shingle
    # (n_tokens >= k), raw sha otherwise — zero-shingle rows are exact-only
    # (null near-dup tier, ref /root/reference/utils/parameter_lists.py:8).
    # oracle.py applies the identical rule.
    sha_list = sha.to_pylist()
    norm_list = norm_arr.to_pylist()
    can_shingle = n_tokens >= cfg.shingle_k
    _h = hashlib.sha256
    gkey = [
        "N" + _h(norm_list[i].encode("utf-8", "surrogatepass")).hexdigest()
        if can_shingle[i] else "S" + sha_list[i]
        for i in range(len(sha_list))
    ]

    return pa.table({
        "repo": batch["repo"].combine_chunks(),
        "path": batch["path"].combine_chunks(),
        "commit": batch["commit"].combine_chunks(),
        "lang": batch["lang"].combine_chunks(),
        "file_id": pa.array(fid, pa.int64()),
        "content_sha256": sha,
        "norm_content": norm_arr,
        "group_key": pa.array(gkey, pa.string()),
        "size": pa.array(size, pa.int64()),
        "n_lines": pa.array(n_lines, pa.int32()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
    })


def ingest_stage(files_ds: "ray.data.Dataset", config: PipelineConfig) -> "ray.data.Dataset":
    """files(repo,path,commit,lang,content) -> normalized, hashed, keyed rows."""
    return files_ds.map_batches(
        _normalize_and_hash,
        fn_kwargs={"cfg_json": config.to_json()},
        batch_format="pyarrow",
        batch_size=config.batch_size,
        zero_copy_batch=True,
    )


def _assign_rep(group: pa.Table) -> pa.Table:
    """Within one group_key: rep_id = min(file_id) (deterministic canonical
    representative, matching cluster_id=min semantics of the reference's
    find_connected_ids contract)."""
    fid = group["file_id"].to_numpy(zero_copy_only=False)
    rep = np.int64(fid.min())
    return group.append_column("rep_id", pa.array(np.full(len(fid), rep), pa.int64()))


REP_MAP_BROADCAST_LIMIT = 3_000_000
# 'N'/'S' prefix + first 128 bits of the sha256 hex digest — unique by
# construction (a 128-bit sha256-prefix collision), ~4x smaller broadcast
# than shipping the full 65-char keys.
GK_KEY_BYTES = 33


def exact_group_stage(ingested: "ray.data.Dataset", config: PipelineConfig) -> "ray.data.Dataset":
    """Adds rep_id to every row. Rows with file_id == rep_id are the
    representatives that flow to the signature stage; the (file_id, rep_id)
    mapping is the exact-duplicate edge set.

    The grouping shuffle runs over a NARROW projection (group_key, file_id —
    ~70 bytes/row) instead of dragging norm_content through the sort; the
    resulting (group_key -> rep_id) map is broadcast back when small, else
    attached with a hash join. At any scale the fat columns move zero times."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Min as _Min

    ingested = ingested.materialize()
    # per-tier TF (config.tf_tier_weights): non-exact tiers need each side's
    # exact-group frequency. Count rides the SAME groupby shuffle; the
    # attached tf_value = n_group / corpus_size is the analog of the
    # reference's per-comparison tf column (parameter_lists.py:11-14).
    want_tf = config.tf_nonexact_enabled
    aggs = [_Min("file_id", alias_name="rep_id")]
    if want_tf:
        aggs.append(_Count(alias_name="n_group"))
    rep_map = ingested.select_columns(["group_key", "file_id"]) \
        .groupby("group_key").aggregate(*aggs) \
        .materialize()
    total = ingested.count() if want_tf else 0

    if rep_map.count() <= REP_MAP_BROADCAST_LIMIT:
        import ray as _ray

        # group_key is a fixed-width digest ('N'/'S' + 64 hex chars): the
        # first GK_KEY_BYTES bytes (prefix + 128 digest bits) are a unique
        # key, extracted buffer-level into a sortable numpy S-array — no
        # Python dict, no per-row probe (VERDICT r2 fix #4). Broadcast is the
        # sorted (keys, rep_ids) pair; probe is one vectorized searchsorted
        # with a membership assert (ADVICE: never silently mis-map).
        keys_parts, ids_parts, cnt_parts = [], [], []
        for b in rep_map.iter_batches(batch_format="pyarrow"):
            keys_parts.append(fixed_prefix_keys(b["group_key"], GK_KEY_BYTES))
            ids_parts.append(b["rep_id"].to_numpy(zero_copy_only=False))
            if want_tf:
                cnt_parts.append(b["n_group"].to_numpy(zero_copy_only=False))
        keys = np.concatenate(keys_parts)
        ids = np.concatenate(ids_parts).astype(np.int64)
        order = np.argsort(keys)
        tf = (np.concatenate(cnt_parts).astype(np.float64)[order] / max(total, 1)
              if want_tf else None)
        ref = _ray.put((keys[order], ids[order], tf))

        def attach(batch: pa.Table) -> pa.Table:
            skeys, sids, stf = _ray.get(ref)
            k = fixed_prefix_keys(batch["group_key"].combine_chunks(), GK_KEY_BYTES)
            i = np.minimum(np.searchsorted(skeys, k), len(skeys) - 1)
            if not np.array_equal(skeys[i], k):
                raise KeyError("group_key missing from broadcast rep map")
            out = batch.append_column("rep_id", pa.array(sids[i], pa.int64()))
            if stf is not None:
                out = out.append_column("tf_value", pa.array(stf[i], pa.float64()))
            return out

        return ingested.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    from nhse_probabilistic_linkage_ray.stages.cluster import join_partitions

    joined = ingested.join(rep_map, join_type="inner",
                           num_partitions=join_partitions(config, rows=rep_map.count()),
                           on=("group_key",))
    if not want_tf:
        return joined

    def count_to_tf(batch: pa.Table) -> pa.Table:
        n = batch["n_group"].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.drop_columns(["n_group"]).append_column(
            "tf_value", pa.array(n / max(total, 1), pa.float64()))

    return joined.map_batches(count_to_tf, batch_format="pyarrow", zero_copy_batch=True)


def exact_edges(exact_mapped: "ray.data.Dataset") -> "ray.data.Dataset":
    """(u, v) edges member->rep for members != rep (tier 'exact'/'norm-equal')."""

    def to_edges(batch: pa.Table) -> pa.Table:
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        rep = batch["rep_id"].to_numpy(zero_copy_only=False)
        m = fid != rep
        return pa.table({"u": pa.array(fid[m], pa.int64()), "v": pa.array(rep[m], pa.int64())})

    return exact_mapped.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)


def representatives(exact_mapped: "ray.data.Dataset") -> "ray.data.Dataset":
    """Shingle-capable representatives (the near-dup universe)."""

    def keep_reps(batch: pa.Table) -> pa.Table:
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        rep = batch["rep_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(fid == rep))

    return exact_mapped.map_batches(keep_reps, batch_format="pyarrow", zero_copy_batch=True)
