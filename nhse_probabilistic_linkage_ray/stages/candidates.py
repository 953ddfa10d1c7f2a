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

    # batch_size=None => one task per input block. A row-count batch size
    # here makes Ray BUNDLE blocks into ~batch_size-row tasks, collapsing a
    # 16-block input to 3-4 tasks and starving the sort that follows
    # (observed in ds.stats(): "3 tasks executed" on an 8-CPU run).
    return signatures_ds.map_batches(
        shingled_only, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(explode, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


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


def _emit_segment(fid: np.ndarray, band_idx: int, max_band_group: int, max_pairs: int):
    """Pairs for one complete (band_hash) segment; star + cap above limits."""
    fid = np.sort(fid)
    n = len(fid)
    if n <= max_band_group and n * (n - 1) // 2 <= max_pairs:
        li, ri = np.triu_indices(n, k=1)
        return fid[li], fid[ri], np.zeros(n * (n - 1) // 2, dtype=np.uint8), band_idx
    return np.full(n - 1, fid[0], dtype=np.int64), fid[1:], np.ones(n - 1, dtype=np.uint8), band_idx


def _scan_sorted_block(batch: pa.Table, max_band_group: int, max_pairs: int) -> pa.Table:
    """One block of the band table, globally sorted by band_hash. Interior
    key-segments are complete (sort range-partitions by key), so their pairs
    are emitted vectorized here; rows of the block's first and last key are
    DEFERRED (tag=1, they may straddle blocks) to a tiny second pass.
    Singleton interior keys cost one numpy comparison — never a Python call
    (the overwhelmingly common case: most band hashes are unique)."""
    n = len(batch)
    empty = pa.table({
        "left_id": pa.array([], pa.int64()), "right_id": pa.array([], pa.int64()),
        "match_key": pa.array([], pa.int32()), "capped": pa.array([], pa.uint8()),
        "tag": pa.array([], pa.uint8()),
    })
    if n == 0:
        return empty
    bh = batch["band_hash"].to_numpy(zero_copy_only=False)
    fid = batch["file_id"].to_numpy(zero_copy_only=False)
    bidx = batch["band_idx"].to_numpy(zero_copy_only=False)

    # rows belonging to the first / last key in this block -> deferred
    defer_mask = (bh == bh[0]) | (bh == bh[-1])
    L, R, K, C = [], [], [], []
    interior = ~defer_mask
    if interior.any():
        ibh = bh[interior]
        ifid = fid[interior]
        ibidx = bidx[interior]
        # segment boundaries among interior rows (sorted by key)
        bounds = np.flatnonzero(np.diff(ibh)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(ibh)]))
        multi = np.flatnonzero(ends - starts >= 2)
        for s in multi:
            l, r, c, k = _emit_segment(ifid[starts[s]:ends[s]], int(ibidx[starts[s]]),
                                       max_band_group, max_pairs)
            L.append(l); R.append(r); C.append(c)
            K.append(np.full(len(l), k, dtype=np.int32))
    pair_tbl = pa.table({
        "left_id": pa.array(np.concatenate(L) if L else np.empty(0, np.int64), pa.int64()),
        "right_id": pa.array(np.concatenate(R) if R else np.empty(0, np.int64), pa.int64()),
        "match_key": pa.array(np.concatenate(K) if K else np.empty(0, np.int32), pa.int32()),
        "capped": pa.array(np.concatenate(C) if C else np.empty(0, np.uint8), pa.uint8()),
        "tag": pa.array(np.zeros(sum(len(x) for x in L), np.uint8), pa.uint8()),
    })
    # deferred band rows ride along in the same schema:
    # (left_id=file_id, right_id=band_hash, match_key=band_idx, tag=1)
    d = np.flatnonzero(defer_mask)
    defer_tbl = pa.table({
        "left_id": pa.array(fid[d], pa.int64()),
        "right_id": pa.array(bh[d], pa.int64()),
        "match_key": pa.array(bidx[d].astype(np.int32), pa.int32()),
        "capped": pa.array(np.zeros(len(d), np.uint8), pa.uint8()),
        "tag": pa.array(np.ones(len(d), np.uint8), pa.uint8()),
    })
    return pa.concat_tables([pair_tbl, defer_tbl])


def candidate_pairs(signatures_ds: "ray.data.Dataset", config: PipelineConfig) -> "ray.data.Dataset":
    """signatures -> deduped candidate pairs
    (left_id, right_id, match_key=min band, capped).

    ONE global sort of the narrow band table is the central shuffle (this is
    the scalable layout at 10^12 files: 20-byte rows, range-partitioned by
    band_hash); pairs are then emitted by a vectorized segment scan per
    sorted block. Only the ~2 keys per block that may straddle block
    boundaries take a (tiny) groupby second pass — no driver-side state, no
    per-singleton-group Python calls."""
    # no materialize before the sort: band_explode is a narrow map over the
    # (already materialized, >=2x-CPUs-wide) signature blocks, so the sort's
    # map phase has full parallelism and the explode fuses into it — one
    # fewer full pass over the band table
    bands = band_explode(signatures_ds, config)
    return pairs_from_bands(bands, config.max_band_group, config.max_pairs_per_band_group)


# Boundary rows (block-straddling keys after a global sort) are ~2 keys per
# block — thousands of rows, not millions. Below this limit they are reduced
# driver-side in one numpy pass instead of paying a full groupby shuffle's
# fixed scheduling floor (two such tiny groupbys were part of the measured
# ~17 s fixed floor at 8 CPUs, BASELINE.md). Above it (pathological skew:
# one key spanning many blocks repeatedly) the distributed groupby runs.
BOUNDARY_DRIVER_LIMIT = 2_000_000


def _collect_deferred(deferred: "ray.data.Dataset", limit: int):
    """Collect the (tiny) deferred rows to the driver as numpy columns;
    returns None if they exceed ``limit`` (fall back to the groupby path)."""
    cols: dict = {"left_id": [], "right_id": [], "match_key": [], "capped": []}
    n = 0
    for b in deferred.iter_batches(batch_format="pyarrow"):
        n += len(b)
        if n > limit:
            return None
        for k in cols:
            cols[k].append(b[k].to_numpy(zero_copy_only=False))
    return {k: (np.concatenate(v) if v else np.empty(0, np.int64))
            for k, v in cols.items()}


def raw_band_pairs(
    bands: "ray.data.Dataset", max_band_group: int, max_pairs: int
) -> "ray.data.Dataset":
    """Pre-dedup pair stream: one (left_id, right_id, match_key, capped) row
    per (band_hash, pair) collision — a pair sharing k band hashes appears k
    times. ``pairs_from_bands`` wraps this with the min-match-key dedup; the
    substring-gram operator counts the multiplicity instead (shared-gram
    count). Sort + vectorized segment scan + tiny boundary pass (driver-side
    numpy under BOUNDARY_DRIVER_LIMIT, distributed groupby above)."""
    scanned = bands.sort("band_hash").map_batches(
        _scan_sorted_block,
        fn_kwargs={"max_band_group": max_band_group,
                   "max_pairs": max_pairs},
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    ).materialize()

    interior = scanned.map_batches(
        lambda t: t.filter(pa.array(t["tag"].to_numpy(zero_copy_only=False) == 0))
                   .select(["left_id", "right_id", "match_key", "capped"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    deferred = scanned.map_batches(
        lambda t: t.filter(pa.array(t["tag"].to_numpy(zero_copy_only=False) == 1)),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    d = _collect_deferred(deferred, BOUNDARY_DRIVER_LIMIT)
    if d is not None:
        # deferred schema: left_id=file_id, right_id=band_hash,
        # match_key=band_idx. One lexsort groups by band_hash; each complete
        # segment emits pairs exactly as the interior scan does.
        bh = d["right_id"]
        fid = d["left_id"]
        bidx = d["match_key"]
        order = np.argsort(bh, kind="stable")
        bh, fid, bidx = bh[order], fid[order], bidx[order]
        L, R, C, K = [], [], [], []
        if len(bh):
            starts = np.concatenate(([0], np.flatnonzero(np.diff(bh)) + 1))
            ends = np.concatenate((starts[1:], [len(bh)]))
            for s, e in zip(starts.tolist(), ends.tolist()):
                u = np.unique(fid[s:e])
                if len(u) < 2:
                    continue
                l, r, c, k = _emit_segment(u, int(bidx[s]), max_band_group, max_pairs)
                L.append(l); R.append(r); C.append(c)
                K.append(np.full(len(l), k, dtype=np.int32))
        boundary_tbl = pa.table({
            "left_id": pa.array(np.concatenate(L) if L else np.empty(0, np.int64), pa.int64()),
            "right_id": pa.array(np.concatenate(R) if R else np.empty(0, np.int64), pa.int64()),
            "match_key": pa.array(np.concatenate(K) if K else np.empty(0, np.int32), pa.int32()),
            "capped": pa.array(np.concatenate(C) if C else np.empty(0, np.uint8), pa.uint8()),
        })
        return interior.union(ray.data.from_arrow(boundary_tbl))

    def emit_deferred(group: dict) -> dict:
        fid = np.asarray(group["left_id"], dtype=np.int64)
        if len(fid) < 2:
            return {"left_id": np.empty(0, np.int64), "right_id": np.empty(0, np.int64),
                    "match_key": np.empty(0, np.int32), "capped": np.empty(0, np.uint8)}
        l, r, c, k = _emit_segment(np.unique(fid), int(group["match_key"][0]),
                                   max_band_group, max_pairs)
        return {"left_id": l, "right_id": r,
                "match_key": np.full(len(l), k, dtype=np.int32), "capped": c}

    boundary_pairs = deferred.groupby("right_id").map_groups(emit_deferred, batch_format="numpy")
    return interior.union(boundary_pairs)


def _dedup_scan_block(batch: pa.Table) -> pa.Table:
    """One block of the raw pair table, globally sorted by (left_id,
    right_id): interior pair-keys reduce to min(match_key)/max(capped) via
    reduceat — zero per-group Python; rows of the block's first and last key
    are deferred (tag=1) to the tiny boundary pass."""
    n = len(batch)
    if n == 0:
        return batch.append_column("tag", pa.array([], pa.uint8()))
    l = batch["left_id"].to_numpy(zero_copy_only=False)
    r = batch["right_id"].to_numpy(zero_copy_only=False)
    mk = batch["match_key"].to_numpy(zero_copy_only=False)
    cp = batch["capped"].to_numpy(zero_copy_only=False)
    defer = ((l == l[0]) & (r == r[0])) | ((l == l[-1]) & (r == r[-1]))
    interior = np.flatnonzero(~defer)
    if len(interior):
        il, ir, imk, icp = l[interior], r[interior], mk[interior], cp[interior]
        starts = np.concatenate(
            ([0], np.flatnonzero((il[1:] != il[:-1]) | (ir[1:] != ir[:-1])) + 1))
        out_l, out_r = il[starts], ir[starts]
        out_mk = np.minimum.reduceat(imk, starts)
        out_cp = np.maximum.reduceat(icp, starts)
    else:
        out_l = out_r = np.empty(0, l.dtype)
        out_mk = np.empty(0, mk.dtype)
        out_cp = np.empty(0, cp.dtype)
    d = np.flatnonzero(defer)
    return pa.table({
        "left_id": pa.array(np.concatenate([out_l, l[d]]), pa.int64()),
        "right_id": pa.array(np.concatenate([out_r, r[d]]), pa.int64()),
        "match_key": pa.array(np.concatenate([out_mk, mk[d]]), pa.int32()),
        "capped": pa.array(np.concatenate([out_cp, cp[d]]), pa.uint8()),
        "tag": pa.array(np.concatenate([np.zeros(len(out_l), np.uint8),
                                        np.ones(len(d), np.uint8)]), pa.uint8()),
    })


def pairs_from_bands(
    bands: "ray.data.Dataset", max_band_group: int, max_pairs: int
) -> "ray.data.Dataset":
    """General grouped-pair engine: (band_hash, file_id, band_idx) rows ->
    deduped (left_id, right_id, match_key=min band_idx, capped) pairs of
    files sharing a band_hash. The LSH candidate stage uses it with MinHash
    band hashes; the exact similarity join (pipelines/simjoin.py) uses it
    with prefix tokens and caps disabled. Sort + vectorized segment scan +
    tiny boundary pass, as documented on candidate_pairs.

    Cross-band dedup (min match_key wins — Splink match_key provenance, D4)
    is ALSO sort + reduceat segment scan: a hash groupby-aggregate here pays
    the hash-shuffle aggregator floor on the pre-dedup pair stream (measured
    19.6s vs ~3s for the sort path on a 1.1M-row pair table), while the sort
    reuses the same range-partitioned machinery as the band scan."""
    raw_pairs = raw_band_pairs(bands, max_band_group, max_pairs)

    scanned = raw_pairs.sort(["left_id", "right_id"]).map_batches(
        _dedup_scan_block, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).materialize()

    interior = scanned.map_batches(
        lambda t: t.filter(pa.array(t["tag"].to_numpy(zero_copy_only=False) == 0))
                   .select(["left_id", "right_id", "match_key", "capped"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    deferred = scanned.map_batches(
        lambda t: t.filter(pa.array(t["tag"].to_numpy(zero_copy_only=False) == 1))
                   .select(["left_id", "right_id", "match_key", "capped"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    d = _collect_deferred(deferred, BOUNDARY_DRIVER_LIMIT)
    if d is not None:
        # one driver-side lexsort + reduceat over the handful of
        # block-straddling pair keys — replaces a full groupby shuffle
        l, r = d["left_id"], d["right_id"]
        mk, cp = d["match_key"], d["capped"]
        order = np.lexsort((r, l))
        l, r, mk, cp = l[order], r[order], mk[order], cp[order]
        if len(l):
            starts = np.concatenate(
                ([0], np.flatnonzero((l[1:] != l[:-1]) | (r[1:] != r[:-1])) + 1))
            out = pa.table({
                "left_id": pa.array(l[starts], pa.int64()),
                "right_id": pa.array(r[starts], pa.int64()),
                "match_key": pa.array(np.minimum.reduceat(mk, starts).astype(np.int32),
                                      pa.int32()),
                "capped": pa.array(np.maximum.reduceat(cp, starts).astype(np.uint8),
                                   pa.uint8()),
            })
        else:
            out = pa.table({"left_id": pa.array([], pa.int64()),
                            "right_id": pa.array([], pa.int64()),
                            "match_key": pa.array([], pa.int32()),
                            "capped": pa.array([], pa.uint8())})
        return interior.union(ray.data.from_arrow(out))

    def reduce_boundary(group: dict) -> dict:
        return {
            "left_id": [np.asarray(group["left_id"])[0]],
            "right_id": [np.asarray(group["right_id"])[0]],
            "match_key": [np.min(np.asarray(group["match_key"]))],
            "capped": [np.max(np.asarray(group["capped"]))],
        }

    boundary = deferred.groupby(["left_id", "right_id"]).map_groups(
        reduce_boundary, batch_format="numpy")

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "left_id": t["left_id"].combine_chunks().cast(pa.int64()),
            "right_id": t["right_id"].combine_chunks().cast(pa.int64()),
            "match_key": t["match_key"].combine_chunks().cast(pa.int32()),
            "capped": t["capped"].combine_chunks().cast(pa.uint8()),
        })

    return interior.union(boundary.map_batches(cast, batch_format="pyarrow"))


def pairs_per_band_counts(bands_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(band_idx, band_hash) -> member count; feeds the A2/A6 skew histograms
    in stages/report.py (the reference's candidate-count monitor)."""
    from ray.data.aggregate import Count

    return bands_ds.groupby(["band_idx", "band_hash"]).aggregate(Count(alias_name="n_members"))
