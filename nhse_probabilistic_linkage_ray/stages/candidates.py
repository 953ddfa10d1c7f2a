"""Banding + candidate-pair generation — the central shuffle.

The code-dedup recast of Splink's blocking self-joins (SURVEY.md J4): each of
the 17 equality blocking rules at ``/root/reference/parameters_dedupe.py:26-44``
becomes one LSH band; two files sharing a band hash become a candidate pair;
``match_key`` = band index records which "rule" produced the pair, and
cross-band de-dup keeps the minimum match_key (Splink's pair-dedup semantics,
SURVEY.md D4). The ``l.NHS_NO != r.NHS_NO`` guard becomes ``left_id < right_id``.

Skew policy (north_rule: explicit handling of skewed mega-bands): a
(band, hash) bucket larger than ``config.max_band_group`` does NOT emit all
C(n,2) pairs; it emits a star to its minimum member (n-1 pairs, preserving
cluster connectivity — over-cap buckets are overwhelmingly boilerplate
variants that are mutually similar) and flags the pairs ``capped`` so the
report stage can surface every capped bucket (the reference leaves hot keys
silently unhandled and monitors after the fact,
``/root/reference/notebooks_dedupe/blocking_evaluation_dedupe.py:91-116``).
The per-bucket pair budget ``max_pairs_per_band_group`` bounds worst-case
memory for any single group task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions.minhash import MinHasher


def band_explode(signatures_ds: "ray.data.Dataset", config: PipelineConfig) -> "ray.data.Dataset":
    """signatures -> (band_idx, band_hash, file_id) rows, B per file.
    flat_map semantics expressed as a vectorized map_batches explode."""
    cfg_json = config.to_json()

    def explode(batch: pa.Table) -> pa.Table:
        cfg = PipelineConfig.from_json(cfg_json)
        mh = MinHasher(cfg.num_perms, cfg.seed)  # only used for band mixing (stateless math)
        n = len(batch)
        sigs = np.asarray(batch["minhash"].combine_chunks().flatten()).reshape(n, cfg.num_perms)
        bh = mh.band_hashes(sigs, cfg.num_bands)  # (n, B)
        B = cfg.num_bands
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        # int64 keys: Ray's hash-shuffle groupby needs native dtypes
        return pa.table({
            "band_idx": pa.array(np.tile(np.arange(B, dtype=np.int32), n), pa.int32()),
            "band_hash": pa.array(bh.ravel().view(np.int64), pa.int64()),
            "file_id": pa.array(np.repeat(fid, B), pa.int64()),
        })

    # drop shingle-less rows: their signature is all-EMPTY_SLOT and must not band
    def shingled_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pa.array(batch["n_shingles"].to_numpy(zero_copy_only=False) > 0)
        ).select(["file_id", "minhash"])

    return signatures_ds.map_batches(
        shingled_only, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(explode, batch_format="pyarrow", batch_size=8192, zero_copy_batch=True)


def _emit_pairs(group: dict, max_band_group: int, max_pairs: int) -> dict:
    """Within one (band_idx, band_hash) bucket: all pairs (l<r) under the cap,
    star-to-min + capped flag above it."""
    fid = np.sort(group["file_id"].astype(np.int64))
    n = len(fid)
    empty = {
        "left_id": np.empty(0, np.int64), "right_id": np.empty(0, np.int64),
        "match_key": np.empty(0, np.int32), "capped": np.empty(0, np.uint8),
    }
    if n < 2:
        return empty
    band_idx = np.int32(group["band_idx"][0])
    if n <= max_band_group and n * (n - 1) // 2 <= max_pairs:
        li, ri = np.triu_indices(n, k=1)
        left, right = fid[li], fid[ri]
        capped = np.zeros(len(left), dtype=np.uint8)
    else:
        left = np.full(n - 1, fid[0], dtype=np.int64)
        right = fid[1:]
        capped = np.ones(n - 1, dtype=np.uint8)
    return {
        "left_id": left, "right_id": right,
        "match_key": np.full(len(left), band_idx, dtype=np.int32),
        "capped": capped,
    }


def colliding_band_hashes(bands: "ray.data.Dataset") -> "ray.data.Dataset":
    """(band_hash, n_members) for hashes shared by >= 2 files. The vast
    majority of band buckets are singletons that can never produce a pair;
    filtering them out BEFORE the per-group pair emission turns millions of
    useless map_groups calls into one vectorized aggregate. Band hashes
    already encode the band index (minhash.band_hashes mixes it in), so a
    single int64 key suffices."""
    from ray.data.aggregate import Count

    counts = bands.select_columns(["band_hash"]).groupby("band_hash") \
        .aggregate(Count(alias_name="n_members"))
    return counts.map_batches(
        lambda t: t.filter(pa.array(t["n_members"].to_numpy(zero_copy_only=False) >= 2)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def candidate_pairs(signatures_ds: "ray.data.Dataset", config: PipelineConfig) -> "ray.data.Dataset":
    """signatures -> deduped candidate pairs
    (left_id, right_id, match_key=min band, capped).

    Collision-hash handling: the colliding-hash set is broadcast via ray.put
    (it is proportional to the candidate volume, not the corpus). At scales
    where even that set outgrows worker memory, swap the broadcast filter for
    a semi-join of bands against colliding_band_hashes — the surrounding
    plan is unchanged."""
    from nhse_probabilistic_linkage_ray.stages.util import ensure_blocks

    bands = ensure_blocks(band_explode(signatures_ds, config).materialize())
    colliding = colliding_band_hashes(bands)
    hash_set = set()
    for b in colliding.iter_batches(batch_format="pyarrow"):
        hash_set.update(b["band_hash"].to_pylist())
    import ray as _ray

    ref = _ray.put(frozenset(hash_set))

    def keep_colliding(batch: pa.Table) -> pa.Table:
        keys = _ray.get(ref)
        bh = batch["band_hash"].to_pylist()
        return batch.filter(pa.array([h in keys for h in bh]))

    hot = bands.map_batches(keep_colliding, batch_format="pyarrow", zero_copy_batch=True)
    raw_pairs = hot.groupby("band_hash").map_groups(
        _emit_pairs,
        fn_kwargs={"max_band_group": config.max_band_group,
                   "max_pairs": config.max_pairs_per_band_group},
        batch_format="numpy",
    )
    # cross-band dedup: min match_key wins (Splink match_key provenance, D4)
    return raw_pairs.groupby(["left_id", "right_id"]).aggregate(
        Min("match_key", alias_name="match_key"),
        Max("capped", alias_name="capped"),
    )


def pairs_per_band_counts(bands_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(band_idx, band_hash) -> member count; feeds the A2/A6 skew histograms
    in stages/report.py (the reference's candidate-count monitor)."""
    from ray.data.aggregate import Count

    return bands_ds.groupby(["band_idx", "band_hash"]).aggregate(Count(alias_name="n_members"))
