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
from nhse_probabilistic_linkage_ray.functions.hashing import file_id_column, sha256_hex_column
from nhse_probabilistic_linkage_ray.functions.normalize import normalize_content, tokenize
import hashlib


def _normalize_and_hash(batch: pa.Table, cfg_json: str) -> pa.Table:
    cfg = PipelineConfig.from_json(cfg_json)
    fid = file_id_column(batch["repo"].combine_chunks(), batch["path"].combine_chunks(),
                         batch["commit"].combine_chunks())
    contents = batch["content"].to_pylist()
    sha = sha256_hex_column(batch["content"].combine_chunks())

    norm, n_tokens, n_lines, size, gkey = [], [], [], [], []
    sha_list = sha.to_pylist()
    for i, c in enumerate(contents):
        c = c or ""
        nc = normalize_content(
            c, strip_trailing_ws=cfg.strip_trailing_ws,
            collapse_blank_lines=cfg.collapse_blank_lines, lowercase=cfg.lowercase,
        ) or ""
        norm.append(nc)
        nt = len(tokenize(nc))
        n_tokens.append(nt)
        n_lines.append(c.count("\n") + 1 if c else 0)
        size.append(len(c))
        # group key: normalized-content hash when the row can shingle
        # (n_tokens >= k), raw sha otherwise — zero-shingle rows are exact-only
        # (null near-dup tier, ref /root/reference/utils/parameter_lists.py:8).
        # oracle.py applies the identical rule.
        if nt >= cfg.shingle_k:
            gkey.append("N" + hashlib.sha256(nc.encode("utf-8", "surrogatepass")).hexdigest())
        else:
            gkey.append("S" + sha_list[i])

    return pa.table({
        "repo": batch["repo"].combine_chunks(),
        "path": batch["path"].combine_chunks(),
        "commit": batch["commit"].combine_chunks(),
        "lang": batch["lang"].combine_chunks(),
        "file_id": pa.array(fid, pa.int64()),
        "content_sha256": sha,
        "norm_content": pa.array(norm, pa.large_string()),
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


def exact_group_stage(ingested: "ray.data.Dataset", config: PipelineConfig) -> "ray.data.Dataset":
    """Adds rep_id to every row. Rows with file_id == rep_id are the
    representatives that flow to the signature stage; the (file_id, rep_id)
    mapping is the exact-duplicate edge set.

    The grouping shuffle runs over a NARROW projection (group_key, file_id —
    ~70 bytes/row) instead of dragging norm_content through the sort; the
    resulting (group_key -> rep_id) map is broadcast back when small, else
    attached with a hash join. At any scale the fat columns move zero times."""
    from ray.data.aggregate import Min as _Min

    ingested = ingested.materialize()
    rep_map = ingested.select_columns(["group_key", "file_id"]) \
        .groupby("group_key").aggregate(_Min("file_id", alias_name="rep_id")) \
        .materialize()

    if rep_map.count() <= REP_MAP_BROADCAST_LIMIT:
        import ray as _ray

        lookup = {}
        for b in rep_map.iter_batches(batch_format="pyarrow"):
            lookup.update(zip(b["group_key"].to_pylist(), b["rep_id"].to_pylist()))
        ref = _ray.put(lookup)

        def attach(batch: pa.Table) -> pa.Table:
            m = _ray.get(ref)
            reps = [m[k] for k in batch["group_key"].to_pylist()]
            return batch.append_column("rep_id", pa.array(reps, pa.int64()))

        return ingested.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)

    from nhse_probabilistic_linkage_ray.stages.cluster import join_partitions

    return ingested.join(rep_map, join_type="inner",
                         num_partitions=join_partitions(config, rows=rep_map.count()),
                         on=("group_key",))


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
