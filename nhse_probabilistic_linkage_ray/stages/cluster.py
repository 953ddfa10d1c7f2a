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


def _numpy_cc_labels(a: np.ndarray, b: np.ndarray, n_nodes: int) -> np.ndarray:
    """Connected components over COMPACT node indices, fully vectorized:
    min-label propagation with pointer jumping (Shiloach-Vishkin shape —
    O(log n) rounds, each one argsort-reuse + reduceat + gather, no per-edge
    Python; VERDICT r4 #3). ``a``/``b`` are edge endpoints as indices into
    [0, n_nodes); returns per-node label = compact index of the component's
    minimum member (np.unique's sorted order makes compact-min == id-min)."""
    lab = np.arange(n_nodes, dtype=np.int64)
    if not len(a):
        return lab
    # the (node -> incident edges) segments never change: sort ONCE
    k = np.concatenate([a, b])
    order = np.argsort(k, kind="stable")
    ks = k[order]
    starts = np.concatenate(([0], np.flatnonzero(ks[1:] != ks[:-1]) + 1))
    seg_nodes = ks[starts]
    while True:
        e = np.minimum(lab[a], lab[b])         # per-edge min label
        v2 = np.concatenate([e, e])[order]     # aligned to the sorted segments
        segmin = np.minimum.reduceat(v2, starts)
        new = lab.copy()
        np.minimum(new[seg_nodes], segmin, out=segmin)
        new[seg_nodes] = segmin
        while True:                            # pointer jumping (compress)
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, lab):
            return new
        lab = new


def _local_contract(batch: pa.Table) -> pa.Table:
    """Shuffle-free pre-pass: one block's edges -> the star forest of its
    BLOCK-LOCAL components (node -> local min member, roots omitted).
    Connectivity is preserved (a node shared by two blocks appears in both
    blocks' star forests), while band-duplicate edges and dense within-block
    structure collapse before the first global sort. Runs the vectorized
    label-propagation CC (``_numpy_cc_labels``) on the block's
    np.unique-deduped edge list — no per-edge Python (VERDICT r4 #3)."""
    u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    hi, lo = np.maximum(u, v), np.minimum(u, v)
    m = hi != lo
    hi, lo = hi[m], lo[m]
    empty = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    if not len(hi):
        return empty
    # compact nodes FIRST, then dedup edges as single int64 keys — 4x faster
    # than np.unique(axis=0)'s structured-void sort at 4M raw edges
    nodes, inv = np.unique(np.concatenate([hi, lo]), return_inverse=True)
    a, b = inv[:len(hi)], inv[len(hi):]
    key = np.unique(a * np.int64(len(nodes)) + b)
    lab = _numpy_cc_labels(key // len(nodes), key % len(nodes), len(nodes))
    roots = nodes[lab]
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


# Block-straddling star keys (~2 per sorted block) are reduced driver-side in
# one numpy pass below this many rows; above it the groupby fallback runs
# (same policy as candidates.BOUNDARY_DRIVER_LIMIT).
STAR_BOUNDARY_DRIVER_LIMIT = 2_000_000


@ray.remote(num_cpus=0)
class _BoundaryCollector:
    """Side-channel for the sorted-scan passes (round 5, VERDICT r4 #4):
    each scan task pushes its block-boundary (k, w) rows here and returns
    ONLY interior output — the scanned table is no longer materialized with
    a tag column and double-filtered (that cost a pinned full copy + two
    extra passes per star step). Boundary volume is tiny by construction
    (rows of ~2 keys per block; hub buckets are star-capped upstream), and
    duplicate adds from task retries are harmless — every consumer dedups
    before emitting. One collector per connected_components call, entries
    keyed by a per-pass token."""

    def __init__(self):
        self.tables: dict = {}

    def add(self, token: str, table: pa.Table) -> None:
        self.tables.setdefault(token, []).append(table)

    def drain(self, token: str) -> list:
        return self.tables.pop(token, [])


def _drain_boundary(collector, token: str):
    """(k, w) numpy columns of a pass's deferred rows, or a Dataset when they
    exceed STAR_BOUNDARY_DRIVER_LIMIT (the distributed-fallback regime)."""
    tables = ray.get(collector.drain.remote(token))
    tables = [t for t in tables if len(t)]
    total = sum(len(t) for t in tables)
    if total > STAR_BOUNDARY_DRIVER_LIMIT:
        return None, ray.data.from_arrow(tables)
    if not tables:
        return (np.empty(0, np.int64), np.empty(0, np.int64)), None
    k = np.concatenate([t["k"].to_numpy(zero_copy_only=False) for t in tables])
    w = np.concatenate([t["w"].to_numpy(zero_copy_only=False) for t in tables])
    return (k.astype(np.int64), w.astype(np.int64)), None


def _star_scan_block(batch: pa.Table, small: bool, collector, token: str,
                     want_stats: bool = False) -> pa.Table:
    """One block of the (k, w) edge table, globally sorted by k. Interior
    key-segments are complete (sort range-partitions by key), so their star
    edges are emitted fully vectorized here — in-block (k, w) dedup doubles
    as GLOBAL edge dedup for them, since every copy of an edge shares its
    key. Rows of the block's first and last key (which may straddle blocks)
    go to the boundary collector; only interior (u, v) rows are returned.
    With ``want_stats`` the block also pushes its (row count, checksum)
    partial so the round's convergence check costs no extra dataset pass."""
    n = len(batch)
    empty = pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
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
    if len(d):
        ray.get(collector.add.remote(token, pa.table({
            "k": pa.array(k[d], pa.int64()), "w": pa.array(w[d], pa.int64())})))
    if want_stats and len(out_u):
        h = hash_pair_u64(out_u.astype(np.uint64), out_v.astype(np.uint64)) % _CHECK_MOD
        ray.get(collector.add.remote(token + "#s", pa.table({
            "n": pa.array([len(out_u)], pa.int64()),
            "cs": pa.array([int(h.sum())], pa.int64())})))
    return pa.table({"u": pa.array(out_u, pa.int64()),
                     "v": pa.array(out_v, pa.int64())})


def _star_pass(edges: "ray.data.Dataset", small: bool, collector,
               token: str, want_stats: bool = False) -> tuple:
    """One star step = one sort of the narrow edge table + ONE vectorized
    segment-scan pass (interior rows out, boundary rows to the collector) +
    tiny boundary reduce. Global (u, v) dedup is fused in (see
    _star_scan_block) — no separate dedup shuffle per round. Returns
    (dataset, stats): with ``want_stats`` the output edge set's (count,
    checksum) is assembled from per-block partials + the boundary edges —
    the round's convergence check without an extra dataset pass; stats is
    None otherwise (and on the distributed-boundary fallback)."""

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
    # materialize BEFORE draining the collector: it guarantees every scan
    # task has run (and pushed its boundary rows)
    interior = keyed.sort("k").map_batches(
        _star_scan_block,
        fn_kwargs={"small": small, "collector": collector, "token": token,
                   "want_stats": want_stats},
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True).materialize()
    d, deferred_ds = _drain_boundary(collector, token)
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
        stats = None
        if want_stats:
            n_i, cs_i = 0, 0
            for s in ray.get(collector.drain.remote(token + "#s")):
                n_i += int(s["n"][0].as_py())
                cs_i += int(s["cs"][0].as_py())
            if len(out_u):
                h = hash_pair_u64(out_u.astype(np.uint64),
                                  out_v.astype(np.uint64)) % _CHECK_MOD
                n_i += len(out_u)
                cs_i += int(h.sum())
            stats = (n_i, cs_i)
        return interior.union(ray.data.from_arrow(t)), stats
    if want_stats:
        ray.get(collector.drain.remote(token + "#s"))  # discard partials
    boundary = deferred_ds.map_batches(
        lambda t: pa.table({"u": t["k"], "v": t["w"]}), batch_format="pyarrow",
    ).groupby("u").map_groups(
        _small_star_group if small else _large_star_group, batch_format="numpy")
    return interior.union(boundary), None


def _min_scan_block(batch: pa.Table, key: str, val: str, collector,
                    token: str) -> pa.Table:
    """Sorted-block scan of _min_reduce_by_key: interior per-key minima out,
    boundary rows to the collector (same single-pass shape as the star scan)."""
    n = len(batch)
    if n == 0:
        return pa.table({key: pa.array([], pa.int64()),
                         val: pa.array([], pa.int64())})
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
    if len(d):
        ray.get(collector.add.remote(token, pa.table({
            "k": pa.array(k[d], pa.int64()), "w": pa.array(w[d], pa.int64())})))
    return pa.table({key: pa.array(ok, pa.int64()),
                     val: pa.array(ow, pa.int64())})


def _min_reduce_by_key(ds: "ray.data.Dataset", key: str, val: str, collector,
                       token: str) -> "ray.data.Dataset":
    """(key, val) -> per-key min(val), sort + reduceat + tiny boundary pass —
    the same engine as the star steps; replaces a hash-shuffle groupby whose
    aggregator-actor floor dominates small clusters."""

    def to_kw(batch: pa.Table) -> pa.Table:
        return pa.table({"k": batch[key].combine_chunks().cast(pa.int64()),
                         "w": batch[val].combine_chunks().cast(pa.int64())})

    interior = ds.map_batches(to_kw, batch_format="pyarrow", zero_copy_batch=True) \
        .sort("k").map_batches(
            _min_scan_block,
            fn_kwargs={"key": key, "val": val, "collector": collector,
                       "token": token},
            batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True).materialize()
    d, deferred_ds = _drain_boundary(collector, token)
    if d is not None:
        k, w = d
        order = np.argsort(k, kind="stable")
        k, w = k[order], w[order]
        if len(k):
            starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
            k, w = k[starts], np.minimum.reduceat(w, starts)
        t = pa.table({key: pa.array(k, pa.int64()), val: pa.array(w, pa.int64())})
        return interior.union(ray.data.from_arrow(t))
    boundary = deferred_ds.groupby("k").aggregate(Min("w", alias_name="w")) \
        .map_batches(lambda t: pa.table({key: t["k"], val: t["w"]}),
                     batch_format="pyarrow")
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

        # fully vectorized driver CC (round 5 — replaces the per-distinct-edge
        # Python union loop): compact node ids, dedup edges as int64 keys,
        # then the same label-propagation kernel the block contraction uses.
        # Bounded by DRIVER_CC_EDGE_LIMIT raw edges, so driver memory is fine.
        uc, vc = [], []
        for batch in edges_ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = u != v
            if m.any():
                uc.append(u[m])
                vc.append(v[m])
        if not uc:
            return ray.data.from_arrow(_pa.table({
                "file_id": _pa.array([], _pa.int64()),
                "cluster_id": _pa.array([], _pa.int64())}))
        nodes, inv = np.unique(np.concatenate(uc + vc), return_inverse=True)
        ne = sum(len(c) for c in uc)
        key = np.unique(inv[:ne] * np.int64(len(nodes)) + inv[ne:])
        lab = _numpy_cc_labels(key // len(nodes), key % len(nodes), len(nodes))
        t = _pa.table({
            "file_id": _pa.array(nodes, _pa.int64()),
            "cluster_id": _pa.array(nodes[lab], _pa.int64()),
        })
        return ray.data.from_arrow(t)
    # partition-local contraction (no shuffle), then alternating star rounds
    # — each ONE sort + segment scan with dedup fused in (module docstring).
    # One boundary-collector actor serves every pass of this call (per-pass
    # tokens); killed after the final result is materialized.
    collector = _BoundaryCollector.remote()
    try:
        cur = edges_ds.map_batches(_local_contract, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
        prev_stats = _edge_stats(cur)
        for i in range(config.max_cc_iterations):
            cur, _ = _star_pass(cur, small=False, collector=collector,
                                token=f"ls{i}")
            cur = cur.materialize()
            # convergence stats fused into the small-star scan — no extra
            # dataset pass per round (round 5); _edge_stats only as the
            # fallback when the boundary went distributed
            cur, stats = _star_pass(cur, small=True, collector=collector,
                                    token=f"ss{i}", want_stats=True)
            cur = cur.materialize()
            if stats is None:
                stats = _edge_stats(cur)
            if stats == prev_stats:
                break
            prev_stats = stats

        # At the fixpoint the edge set is a star forest rooted at component
        # minima: u -> root. A final min-reduce guards determinism if
        # multiple roots linger.
        assign = _min_reduce_by_key(cur, "u", "v", collector, "mr1")

        def finish(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            # roots themselves: cluster_id = self
            return pa.table({
                "file_id": pa.array(np.concatenate([u, c]), pa.int64()),
                "cluster_id": pa.array(np.concatenate([c, c]), pa.int64()),
            })

        out = assign.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        # materialize before killing the collector: the returned dataset must
        # not retain lineage onto a dead actor
        return _min_reduce_by_key(out, "file_id", "cluster_id",
                                  collector, "mr2").materialize()
    finally:
        ray.kill(collector)


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
