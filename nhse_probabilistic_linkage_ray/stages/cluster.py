"""Distributed connected components over the duplicate-edge Dataset.

Replaces the reference's driver-memory BFS ``find_connected_ids``
(``/root/reference/utils/dataset_ingestion_utils.py:487-540`` — it collects the
entire edge set to the driver, SURVEY.md §4 "driver-memory hazards") and
matches the output contract of Splink's
``cluster_pairwise_predictions_at_threshold``: every node mapped to a
deterministic ``cluster_id = min(member id)`` of its component.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", public) — converges in
O(log n) rounds. Round 4 rebuilt the distributed path on the repo's
sort + vectorized-segment-scan engine (stages/candidates.py pattern):

- a shuffle-free **partition-local union-find contraction** (map_batches)
  collapses each block's subgraph to a star forest before round 1 — the ~10x
  band-duplicate edges and most within-block structure disappear without
  moving a byte;
- each star step is ONE ``sort`` of the narrow edge table followed by a
  vectorized reduceat segment scan (block-straddling keys deferred to a tiny
  driver-side numpy pass, groupby fallback above a limit) — global (u, v)
  dedup is FREE because every copy of an edge lands in its key's segment;
- the previous formulation (groupby.map_groups per star + a groupby dedup
  per star = 4 hash shuffles and millions of per-group Python calls per
  round) measured ~30x the driver union-find at 2.3M edges (BASELINE.md);
  this one removes both the per-group Python and half the shuffles.

Nothing is collected to the driver except an 8-byte checksum per round and
the (tiny) block-boundary segments.

Determinism/resume: every round is a pure function of the previous edge set;
the pipeline checkpoints the converged components (north_rule clustering
resume).

Convergence: (row count, sum of per-edge mix64 % 1e9+7) stable across a
round; ``max_cc_iterations`` is a hard stop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min, Sum

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions.hashing import hash_pair_u64

_CHECK_MOD = np.uint64(1_000_000_007)


JOIN_ROWS_PER_PARTITION = 250_000


def join_partitions(config: PipelineConfig, rows: int | None = None) -> int:
    """Hash-join partition count bounded by cluster CPUs — Ray spawns one
    aggregator actor per partition; more partitions than CPUs deadlocks small
    clusters and adds overhead on big ones. When the caller knows the larger
    side's row count, partitions scale with DATA (~250k rows each, measured
    sweet spot: 8 partitions beat 32 by ~40% on a 600k-row join because
    actor spin-up dominates small shuffles) and the CPU bound is only the
    cap — the right shape at 100x too."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    cap = max(2, min(config.num_buckets, cpus))
    if rows is not None:
        return max(2, min(cap, -(-rows // JOIN_ROWS_PER_PARTITION)))
    return cap


def _canon(batch: pa.Table) -> pa.Table:
    """Orient every edge (hi, lo), drop self-loops, in-batch dedup."""
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    m = hi != lo
    hi, lo = hi[m], lo[m]
    if len(hi):
        pairs = np.unique(np.stack([hi, lo], axis=1), axis=0)
        hi, lo = pairs[:, 0], pairs[:, 1]
    return pa.table({"u": pa.array(hi, pa.int64()), "v": pa.array(lo, pa.int64())})


def _dedup_edges(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Global (u, v) dedup: in-batch np.unique, then one groupby."""
    return (
        ds.map_batches(_canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"]).aggregate(Count(alias_name="_c"))
        .select_columns(["u", "v"])
    )


def _edge_stats(ds: "ray.data.Dataset") -> tuple:
    def cs(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        h = hash_pair_u64(u, v) % _CHECK_MOD
        return pa.table({"cs": pa.array([int(h.sum())], pa.int64()),
                         "n": pa.array([len(u)], pa.int64())})

    agg = ds.map_batches(cs, batch_format="pyarrow", zero_copy_batch=True) \
            .aggregate(Sum("cs", alias_name="cs"), Sum("n", alias_name="n"))
    return (agg.get("n") or 0, agg.get("cs") or 0)


def _large_star_group(group: dict) -> dict:
    """One node's neighborhood (groupby fallback for block-straddling keys):
    m = min(N(u) ∪ {u}); emit (v, m) ∀ v ∈ N(u), v > u."""
    src = np.int64(group["u"][0])
    dst = np.unique(np.asarray(group["v"], dtype=np.int64))
    m = min(np.int64(dst[0]), src)
    big = dst[dst > src]
    return {"u": big, "v": np.full(len(big), m, dtype=np.int64)}


def _small_star_group(group: dict) -> dict:
    """One hi-node's smaller neighbors (groupby fallback): m = min;
    emit (v, m) ∀ v ≠ m plus (u, m) — the v = m exclusion keeps the fixpoint
    self-loop-free so the convergence checksum stabilizes."""
    u = np.int64(group["u"][0])
    v = np.unique(np.asarray(group["v"], dtype=np.int64))
    m = np.int64(v[0])
    keep = v[v != m]
    out_u = np.concatenate([keep, [u]])
    out_v = np.full(len(keep) + 1, m, dtype=np.int64)
    return {"u": out_u, "v": out_v}


def _local_contract(batch: pa.Table) -> pa.Table:
    """Shuffle-free pre-pass: one block's edges -> the star forest of its
    BLOCK-LOCAL components (node -> local min member, roots omitted).
    Connectivity is preserved (a node shared by two blocks appears in both
    blocks' star forests), while band-duplicate edges and dense within-block
    structure collapse before the first global sort. Union-find runs on the
    block's np.unique-deduped edge list only."""
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi, lo = np.maximum(u, v), np.minimum(u, v)
    m = hi != lo
    hi, lo = hi[m], lo[m]
    empty = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    if not len(hi):
        return empty
    pairs = np.unique(np.stack([hi, lo], axis=1), axis=0)
    from nhse_probabilistic_linkage_ray.state.union_find import UnionFind

    uf = UnionFind()
    for a, b in pairs.tolist():
        uf.union(a, b)
    comp = uf.components()
    nodes = np.fromiter(comp.keys(), np.int64, len(comp))
    roots = np.fromiter(comp.values(), np.int64, len(comp))
    mm = nodes != roots
    return pa.table({"u": pa.array(nodes[mm], pa.int64()),
                     "v": pa.array(roots[mm], pa.int64())})


def _star_emit_sorted(ik: np.ndarray, iw: np.ndarray, small: bool):
    """Vectorized star emission over complete key-segments. Input: (k, w)
    edge arrays lexsorted by (k, w) and (k, w)-deduped — so ``w[start]`` is
    each segment's min and duplicates of an edge are already collapsed.
    large star: per key k, m = min(min(w), k); emit (w, m) ∀ w > k.
    small star: per key k (k > all w by orientation), m = min(w);
    emit (w, m) ∀ w ≠ m, plus (k, m)."""
    if not len(ik):
        z = np.empty(0, np.int64)
        return z, z
    starts = np.concatenate(([0], np.flatnonzero(ik[1:] != ik[:-1]) + 1))
    seglen = np.diff(np.concatenate((starts, [len(ik)])))
    segmin = iw[starts]
    ku = ik[starts]
    if small:
        mrow = np.repeat(segmin, seglen)
        emit = iw != mrow
        out_u = np.concatenate([iw[emit], ku])
        out_v = np.concatenate([mrow[emit], segmin])
    else:
        m = np.minimum(segmin, ku)
        mrow = np.repeat(m, seglen)
        emit = iw > ik
        out_u = iw[emit]
        out_v = mrow[emit]
    return out_u.astype(np.int64), out_v.astype(np.int64)


def _star_scan_block(batch: pa.Table, small: bool) -> pa.Table:
    """One block of the (k, w) edge table, globally sorted by k. Interior
    key-segments are complete (sort range-partitions by key), so their star
    edges are emitted fully vectorized here — in-block (k, w) dedup doubles
    as GLOBAL edge dedup for them, since every copy of an edge shares its
    key. Rows of the block's first and last key are deferred (tag=1)."""
    n = len(batch)
    empty = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                      "tag": pa.array([], pa.uint8())})
    if n == 0:
        return empty
    k = batch["k"].to_numpy(zero_copy_only=False)
    w = batch["w"].to_numpy(zero_copy_only=False)
    defer = (k == k[0]) | (k == k[-1])
    interior = ~defer
    out_u = out_v = np.empty(0, np.int64)
    if interior.any():
        ik, iw = k[interior], w[interior]
        order = np.lexsort((iw, ik))
        ik, iw = ik[order], iw[order]
        keep = np.concatenate(([True], (ik[1:] != ik[:-1]) | (iw[1:] != iw[:-1])))
        out_u, out_v = _star_emit_sorted(ik[keep], iw[keep], small)
    d = np.flatnonzero(defer)
    return pa.table({
        "u": pa.array(np.concatenate([out_u, k[d]]), pa.int64()),
        "v": pa.array(np.concatenate([out_v, w[d]]), pa.int64()),
        "tag": pa.array(np.concatenate([np.zeros(len(out_u), np.uint8),
                                        np.ones(len(d), np.uint8)]), pa.uint8()),
    })


# Block-straddling star keys (~2 per sorted block) are reduced driver-side in
# one numpy pass below this many rows; above it the groupby fallback runs
# (same policy as candidates.BOUNDARY_DRIVER_LIMIT).
STAR_BOUNDARY_DRIVER_LIMIT = 2_000_000


def _collect_uv(ds: "ray.data.Dataset", limit: int):
    us, vs, n = [], [], 0
    for b in ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
        n += len(b)
        if n > limit:
            return None
        us.append(b["u"].to_numpy(zero_copy_only=False))
        vs.append(b["v"].to_numpy(zero_copy_only=False))
    return (np.concatenate(us).astype(np.int64) if us else np.empty(0, np.int64),
            np.concatenate(vs).astype(np.int64) if vs else np.empty(0, np.int64))


def _star_pass(edges: "ray.data.Dataset", small: bool) -> "ray.data.Dataset":
    """One star step = one sort of the narrow edge table + vectorized segment
    scan + tiny boundary pass. Global (u, v) dedup is fused in (see
    _star_scan_block) — no separate dedup shuffle per round."""

    def small_key(batch: pa.Table) -> pa.Table:
        return pa.table({"k": batch["u"].combine_chunks().cast(pa.int64()),
                         "w": batch["v"].combine_chunks().cast(pa.int64())})

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(np.concatenate([u, v]), pa.int64()),
            "w": pa.array(np.concatenate([v, u]), pa.int64()),
        })

    keyed = edges.map_batches(small_key if small else both_dirs,
                              batch_format="pyarrow", zero_copy_batch=True)
    scanned = keyed.sort("k").map_batches(
        _star_scan_block, fn_kwargs={"small": small}, batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True).materialize()
    interior = scanned.map_batches(
        lambda t: t.filter(pa.array(t["tag"].to_numpy(zero_copy_only=False) == 0))
                   .select(["u", "v"]),
        batch_format="pyarrow", zero_copy_batch=True)
    deferred = scanned.map_batches(
        lambda t: t.filter(pa.array(t["tag"].to_numpy(zero_copy_only=False) == 1))
                   .select(["u", "v"]),
        batch_format="pyarrow", zero_copy_batch=True)
    d = _collect_uv(deferred, STAR_BOUNDARY_DRIVER_LIMIT)
    if d is not None:
        k, w = d
        order = np.lexsort((w, k))
        k, w = k[order], w[order]
        if len(k):
            keep = np.concatenate(([True], (k[1:] != k[:-1]) | (w[1:] != w[:-1])))
            k, w = k[keep], w[keep]
        out_u, out_v = _star_emit_sorted(k, w, small)
        t = pa.table({"u": pa.array(out_u, pa.int64()),
                      "v": pa.array(out_v, pa.int64())})
        return interior.union(ray.data.from_arrow(t))
    boundary = deferred.groupby("u").map_groups(
        _small_star_group if small else _large_star_group, batch_format="numpy")
    return interior.union(boundary)


def _min_reduce_by_key(ds: "ray.data.Dataset", key: str, val: str) -> "ray.data.Dataset":
    """(key, val) -> per-key min(val), sort + reduceat + tiny boundary pass —
    the same engine as the star steps; replaces a hash-shuffle groupby whose
    aggregator-actor floor dominates small clusters."""

    def to_kw(batch: pa.Table) -> pa.Table:
        return pa.table({"k": batch[key].combine_chunks().cast(pa.int64()),
                         "w": batch[val].combine_chunks().cast(pa.int64())})

    def scan(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "tag": pa.array([], pa.uint8())})
        k = batch["k"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        defer = (k == k[0]) | (k == k[-1])
        interior = np.flatnonzero(~defer)
        if len(interior):
            ik, iw = k[interior], w[interior]
            starts = np.concatenate(([0], np.flatnonzero(ik[1:] != ik[:-1]) + 1))
            ok, ow = ik[starts], np.minimum.reduceat(iw, starts)
        else:
            ok = ow = np.empty(0, np.int64)
        d = np.flatnonzero(defer)
        return pa.table({
            "k": pa.array(np.concatenate([ok, k[d]]), pa.int64()),
            "w": pa.array(np.concatenate([ow, w[d]]), pa.int64()),
            "tag": pa.array(np.concatenate([np.zeros(len(ok), np.uint8),
                                            np.ones(len(d), np.uint8)]), pa.uint8()),
        })

    scanned = ds.map_batches(to_kw, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("k").map_batches(scan, batch_format="pyarrow", batch_size=None,
                               zero_copy_batch=True).materialize()

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({key: t["k"], val: t["w"]})

    interior = scanned.map_batches(
        lambda t: rename(t.filter(pa.array(t["tag"].to_numpy(zero_copy_only=False) == 0))),
        batch_format="pyarrow", zero_copy_batch=True)
    deferred = scanned.map_batches(
        lambda t: t.filter(pa.array(t["tag"].to_numpy(zero_copy_only=False) == 1)),
        batch_format="pyarrow", zero_copy_batch=True)
    dcol = _collect_uv(deferred.map_batches(
        lambda t: pa.table({"u": t["k"], "v": t["w"]}),
        batch_format="pyarrow", zero_copy_batch=True), STAR_BOUNDARY_DRIVER_LIMIT)
    if dcol is not None:
        k, w = dcol
        order = np.argsort(k, kind="stable")
        k, w = k[order], w[order]
        if len(k):
            starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
            k, w = k[starts], np.minimum.reduceat(w, starts)
        t = pa.table({key: pa.array(k, pa.int64()), val: pa.array(w, pa.int64())})
        return interior.union(ray.data.from_arrow(t))
    boundary = deferred.groupby("k").aggregate(Min("w", alias_name="w")) \
        .map_batches(rename, batch_format="pyarrow")
    return interior.union(boundary)


# Driver/distributed CC switch, in RAW edges (env-overridable). The driver
# path pulls only (u, v) int64 pairs (16 B/edge — 128 MB at the 8M default),
# np.unique-dedups them in C, and union-finds the DISTINCT edges (a few
# seconds); the distributed large/small-star path costs several sort+groupby
# barriers per iteration — measured 104.8-189.8 s at 2.3M raw edges (525k
# files, 8 pinned CPUs, calm window) where the driver path runs in ~5 s, a
# ~30x cliff. The switch exists for true scale (node-memory bound), so set
# it as high as one driver's memory honestly allows, not lower.
DRIVER_CC_EDGE_LIMIT = int(__import__("os").environ.get(
    "GRAFT_DRIVER_CC_EDGES", str(8_000_000)))


def connected_components(
    edges_ds: "ray.data.Dataset",
    config: PipelineConfig,
    *,
    mode: str = "auto",
    size_hint: int | None = None,
) -> "ray.data.Dataset":
    """Edge Dataset (u, v) -> assignment Dataset (file_id, cluster_id).

    mode='auto': a provably small graph (< DRIVER_CC_EDGE_LIMIT raw edges,
    established from ``size_hint`` when the caller already knows its pair
    counts, else by counting) is solved with a driver union-find — the
    pattern the Ray Data guidance endorses for small candidate sets — while
    anything larger runs the distributed star passes. mode='distributed' /
    'driver' force a path (tests exercise both). The two paths produce
    identical assignments (cluster_id = min member).

    Materializes the edge set between rounds (it is the small derived table of
    the pipeline — never the input corpus)."""
    if mode == "auto":
        n = size_hint if size_hint is not None else _dedup_edges(edges_ds).materialize().count()
        mode = "driver" if n <= DRIVER_CC_EDGE_LIMIT else "distributed"
    if mode == "driver":
        import pyarrow as _pa

        from nhse_probabilistic_linkage_ray.state.union_find import UnionFind

        from nhse_probabilistic_linkage_ray.functions.hashing import pair_keys_v16

        # vectorized pre-dedup before the Python union loop (VERDICT r2 #9):
        # raw band edges repeat heavily across bands; np.unique over packed
        # canonical V16 pairs collapses them in C, so the per-edge Python
        # loop runs once per DISTINCT edge only. Bounded by
        # DRIVER_CC_EDGE_LIMIT raw edges, so driver memory is fine.
        chunks = []
        for batch in edges_ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = u != v
            if m.any():
                chunks.append(pair_keys_v16(u[m], v[m]))
        uf = UnionFind()
        if chunks:
            uniq = np.unique(np.concatenate(chunks))
            for a, b in uniq.view(np.int64).reshape(-1, 2).tolist():
                uf.union(a, b)
        comp = uf.components()
        t = _pa.table({
            "file_id": _pa.array(list(comp.keys()), _pa.int64()),
            "cluster_id": _pa.array(list(comp.values()), _pa.int64()),
        })
        return ray.data.from_arrow(t)
    # partition-local contraction (no shuffle), then alternating star rounds
    # — each ONE sort + segment scan with dedup fused in (module docstring)
    cur = edges_ds.map_batches(_local_contract, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    prev_stats = _edge_stats(cur)
    for _ in range(config.max_cc_iterations):
        cur = _star_pass(cur, small=False).materialize()
        cur = _star_pass(cur, small=True).materialize()
        stats = _edge_stats(cur)
        if stats == prev_stats:
            break
        prev_stats = stats

    # At the fixpoint the edge set is a star forest rooted at component minima:
    # u -> root. A final min-reduce guards determinism if multiple roots linger.
    assign = _min_reduce_by_key(cur, "u", "v")

    def finish(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        # roots themselves: cluster_id = self
        return pa.table({
            "file_id": pa.array(np.concatenate([u, c]), pa.int64()),
            "cluster_id": pa.array(np.concatenate([c, c]), pa.int64()),
        })

    out = assign.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    return _min_reduce_by_key(out, "file_id", "cluster_id")


COMPONENT_BROADCAST_LIMIT = 5_000_000


def assign_clusters(
    all_ids_ds: "ray.data.Dataset",
    components_ds: "ray.data.Dataset",
    config: PipelineConfig,
    *,
    components_hint: int | None = None,
) -> "ray.data.Dataset":
    """Left-join every file_id against the component map; unmatched files are
    their own singleton cluster (contract parity with find_connected_ids +
    the full-table join at
    /root/reference/notebooks_dedupe/select_training_data_dedupe.py:111).

    The component map is proportional to the DUPLICATED subset, not the
    corpus — when provably small it is broadcast (ray.put once, dict lookup
    per batch, no shuffle); otherwise a hash-partitioned left-outer join."""
    n = components_hint
    if n is None:
        try:
            n = components_ds.count()
        except Exception:
            n = None
    if n is not None and n <= COMPONENT_BROADCAST_LIMIT:
        fch, cch = [], []
        for b in components_ds.iter_batches(batch_format="pyarrow"):
            fch.append(b["file_id"].to_numpy(zero_copy_only=False))
            cch.append(b["cluster_id"].to_numpy(zero_copy_only=False))
        keys = np.concatenate(fch) if fch else np.empty(0, np.int64)
        vals = np.concatenate(cch) if cch else np.empty(0, np.int64)
        order = np.argsort(keys)
        ref = ray.put((keys[order], vals[order]))

        def fill_bcast(batch: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            fid = batch["file_id"].to_numpy(zero_copy_only=False)
            # vectorized lookup-with-default: files outside the component map
            # are their own singleton cluster
            if len(k) == 0:
                cl = fid.astype(np.int64)
            else:
                idx = np.minimum(np.searchsorted(k, fid), len(k) - 1)
                cl = np.where(k[idx] == fid, v[idx], fid).astype(np.int64)
            return batch.append_column("cluster_id", pa.array(cl, pa.int64()))

        return all_ids_ds.map_batches(fill_bcast, batch_format="pyarrow", zero_copy_batch=True)

    joined = all_ids_ds.join(
        components_ds, join_type="left_outer",
        num_partitions=join_partitions(config, rows=n), on=("file_id",),
    )

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fid = batch["file_id"].combine_chunks().cast(pa.int64())
        cl = batch["cluster_id"].combine_chunks().cast(pa.int64())
        filled = pc.if_else(pc.is_null(cl), fid, cl)
        cols = {n: batch[n] for n in batch.column_names if n != "cluster_id"}
        cols["cluster_id"] = filled
        return pa.table(cols)

    return joined.map_batches(fill, batch_format="pyarrow")
