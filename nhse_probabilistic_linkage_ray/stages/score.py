"""Tiered verification + Fellegi-Sunter-style scoring of candidate pairs.

The code-dedup recast of Splink's comparison levels + match-weight arithmetic
(SURVEY.md §2.9 steps 2-3; levels at ``/root/reference/utils/parameter_lists.py``):

    gamma 4  exact         sha256 equal            (handled in the pre-pass)
    gamma 3  jaccard_hi    exact Jaccard >= 0.9    (≙ jaro_winkler > 0.88)
    gamma 2  jaccard_lo    exact Jaccard >= tau    (≙ token-intersect level)
    gamma 1  rescued       SimHash Hamming <= h OR LCS fraction >= lambda
                                                   (≙ nickname / given-only levels)
    gamma 0  else          non-duplicate           (≙ ELSE)
    gamma -1 null          no shingle material     (≙ null level)

match_weight = log2 prior odds + log2(m/u) for the observed gamma, with the
reference's m/u clamping (``/root/reference/utils/model_utils.py:87-94``);
match_probability = sigmoid (Splink semantics). The concatenated
``gamma_pattern`` mirrors ``add_agreement_pattern``
(``/root/reference/utils/eval_utils.py:207-215``, M18).

Feature attachment: pair rows carry only ids; the shingle/token material lives
in the signatures table. Two strategies, chosen by signature row count:

- **broadcast** (small side): the features table is ``ray.put`` ONCE and every
  scorer actor reads it in ``__init__`` — never re-shipped per batch
  (SURVEY.md J3, the nicknames-dimension pattern).
- **partitioned join** (large side): two hash-partitioned ``Dataset.join``
  passes on left_id / right_id (SURVEY.md J4 fallback), no driver residency.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nhse_probabilistic_linkage_ray.config import GAMMA_ELSE, GAMMA_JACCARD_HI, GAMMA_JACCARD_LO, GAMMA_RESCUED, PipelineConfig, TIER_NAMES
from nhse_probabilistic_linkage_ray.functions.jaccard import jaccard_flat
from nhse_probabilistic_linkage_ray.functions.lcs import (lcs_fraction, lcs_fraction_thresholded,
                                                lcs_length, multiset_overlap,
                                                prefix_pair)

_SCORE_DEBUG = bool(__import__("os").environ.get("GRAFT_SCORE_DEBUG"))
from nhse_probabilistic_linkage_ray.functions.simhash import hamming_distance

# Broadcast/join switch. The broadcast path's real constraint is BYTES, not
# rows: the signature blocks live once in plasma and every node that scores
# pulls a copy into its local store, so the whole table must fit comfortably
# in ONE node's object store (shared zero-copy across that node's workers —
# per-worker heap cost is only the 24 B/row id index). The join path exists
# for the regime where it doesn't fit (billions of docs / 100 TB); its two
# hash-partitioned shuffles move every fat payload byte, so switching too
# early is a cliff (measured: 315k files scored in ~40 s broadcast vs ~150 s
# join at 8 CPUs). Defaults: half a node's plasma, 30M-row id-index cap
# (~0.7 GB worker heap); both env-overridable.
BROADCAST_ROW_LIMIT = int(__import__("os").environ.get("GRAFT_SCORE_BROADCAST_ROWS", str(30_000_000)))
BROADCAST_STORE_FRACTION = 0.5


def _broadcast_byte_limit() -> float:
    import os

    env = os.environ.get("GRAFT_SCORE_BROADCAST_BYTES")
    if env:
        return float(env)
    try:
        total = float(ray.cluster_resources().get("object_store_memory", 0.0))
        nodes = max(1, len([n for n in ray.nodes() if n.get("Alive", True)]))
        if total > 0:
            return BROADCAST_STORE_FRACTION * total / nodes
    except Exception:
        pass
    return float(4 << 30)

# ---------------------------------------------------------------- plugins
# User-extension surface (SURVEY.md §2.10): the analog of the reference's
# custom UDF registration (``jaro_winkler_udf`` at
# /root/reference/predict_dedupe.py:11). A plugin is a callable
# ``fn(shingles_l, shingles_r, tokens_l, tokens_r) -> np.ndarray[float]``
# (one score per pair, given each side's shingle-hash set and ordered token
# hashes). Selected per run via ``config.plugin_scorer`` + threshold: pairs
# the built-in tiers leave at ELSE whose plugin score clears
# ``plugin_threshold`` are lifted to the rescue tier — a user-defined
# comparison level without touching engine code. Registration is per
# process; Ray workers import this module, so register at import time of
# YOUR module (the same deployment contract as Spark UDF registration).
TIER_SCORERS: dict = {}


def register_tier_scorer(name: str, fn) -> None:
    TIER_SCORERS[name] = fn


def _plugin_scores(name: str, shL, shR, thL, thR) -> np.ndarray:
    fn = TIER_SCORERS.get(name)
    if fn is None and ":" in name:
        # "module.path:callable" — resolvable in ANY worker process and
        # JSON-serializable through the config (callables are not); the
        # form a deployment should prefer
        import importlib

        mod, attr = name.split(":", 1)
        fn = getattr(importlib.import_module(mod), attr)
        TIER_SCORERS[name] = fn
    if fn is None:
        raise KeyError(
            f"plugin scorer {name!r} is not registered in this worker — "
            f"use a 'module:function' path or call register_tier_scorer() "
            f"at module import time")
    return np.asarray(fn(shL, shR, thL, thR), dtype=np.float64)


def _batch_views(rb: "pa.RecordBatch", num_perms: int) -> tuple:
    """Zero-copy numpy views over one RecordBatch of the signatures table.

    Operates on record batches, NEVER on chunked columns: the round-5
    diagnosis found each Arrow block arriving with ~3 chunks per column, so
    the previous ``combine_chunks`` here silently memcpy'd the ~8 GB of
    ragged shingle/token payloads into EVERY scorer worker's private heap
    (measured 10.2 s per worker at 872k reps, 8 identical concurrent builds
    — the flat score-stage term in the r5a hunt; also the private-heap
    growth behind the r4 worker-heap accumulation). Per record batch,
    ``.offsets`` is a zero-copy slice holding ABSOLUTE indices into the
    full child array and ``.values`` returns that full child unsliced, so
    (values, offsets) pairs index correctly with no copy; fixed-size-list
    ``flatten()`` is likewise slice-aware and copy-free for null-free data."""
    fid = rb.column("file_id").to_numpy(zero_copy_only=False)
    sigs = np.asarray(rb.column("minhash").flatten()).reshape(len(fid), num_perms)
    simh = rb.column("simhash").to_numpy(zero_copy_only=False)
    sh = rb.column("shingles")
    th = rb.column("token_hashes")
    return (fid, sigs, simh,
            np.asarray(sh.values), np.asarray(sh.offsets),
            np.asarray(th.values), np.asarray(th.offsets))


class FeatureIndex:
    """id -> (minhash row, simhash, shingles, token_hashes) over a list of
    Arrow blocks WITHOUT copying them: a sorted file_id array maps ids to
    (block, row); every feature access is a view into the (shared-memory)
    block buffers. Construction is O(n log n) on 8-byte ids only — replacing
    a per-actor Python dict build that serialized the whole scoring stage."""

    def __init__(self, blocks: list, num_perms: int):
        batches = [rb for b in blocks if len(b) for rb in b.to_batches() if len(rb)]
        self.views = [_batch_views(rb, num_perms) for rb in batches]
        # optional per-rep TF column (per-tier TF adjustments): kept as a
        # parallel list of per-batch float64 views, gathered via gather_tf
        self.tf_views = [
            rb.column("tf_value").to_numpy(zero_copy_only=False)
            if "tf_value" in rb.schema.names else None
            for rb in batches
        ]
        if not self.views:
            self.sorted_fid = np.empty(0, np.int64)
            self.sorted_loc = np.empty((0, 2), np.int64)
            return
        fids = [v[0] for v in self.views]
        all_fid = np.concatenate(fids)
        loc = np.empty((len(all_fid), 2), dtype=np.int64)
        loc[:, 0] = np.repeat(np.arange(len(fids)), [len(f) for f in fids])
        loc[:, 1] = np.concatenate([np.arange(len(f)) for f in fids])
        order = np.argsort(all_fid, kind="stable")
        self.sorted_fid = all_fid[order]
        self.sorted_loc = loc[order]

    def __getitem__(self, fid: int):
        i = int(np.searchsorted(self.sorted_fid, fid))
        if i >= len(self.sorted_fid) or self.sorted_fid[i] != fid:
            raise KeyError(fid)
        b, r = self.sorted_loc[i]
        fid_, sigs, simh, shv, sho, thv, tho = self.views[b]
        return (sigs[r], np.uint64(simh[r]),
                shv[sho[r]:sho[r + 1]], thv[tho[r]:tho[r + 1]])

    def gather(self, ids: np.ndarray, num_perms: int):
        """Vectorized batch gather: ONE searchsorted over all ids + per-block
        fancy indexing (replaces a per-row Python __getitem__ loop). Ragged
        shingle/token sets come back as flat (values, offsets) pair layouts —
        row i is ``flat[offs[i]:offs[i+1]]`` — built with the repeat/arange
        ragged copy (no per-row Python)."""
        n = len(ids)
        i = np.searchsorted(self.sorted_fid, ids)
        if len(self.sorted_fid) == 0 or np.any(i >= len(self.sorted_fid)) \
                or np.any(self.sorted_fid[np.minimum(i, len(self.sorted_fid) - 1)] != ids):
            missing = ids[(i >= len(self.sorted_fid))
                          | (self.sorted_fid[np.minimum(i, len(self.sorted_fid) - 1)] != ids)]
            raise KeyError(int(missing[0]))
        locs = self.sorted_loc[i]
        b_arr, r_arr = locs[:, 0], locs[:, 1]
        blocks = np.unique(b_arr)
        sig = np.empty((n, num_perms), dtype=np.uint64)
        sim = np.empty(n, dtype=np.uint64)
        sh_lens = np.empty(n, dtype=np.int64)
        th_lens = np.empty(n, dtype=np.int64)
        for b in blocks:
            m = b_arr == b
            rows = r_arr[m]
            _fid, sigs, simh, shv, sho, thv, tho = self.views[b]
            sig[m] = sigs[rows]
            sim[m] = np.asarray(simh, dtype=np.uint64)[rows]
            sh_lens[m] = np.asarray(sho, np.int64)[rows + 1] - np.asarray(sho, np.int64)[rows]
            th_lens[m] = np.asarray(tho, np.int64)[rows + 1] - np.asarray(tho, np.int64)[rows]
        sh_offs = np.zeros(n + 1, np.int64)
        np.cumsum(sh_lens, out=sh_offs[1:])
        th_offs = np.zeros(n + 1, np.int64)
        np.cumsum(th_lens, out=th_offs[1:])
        sh_flat = np.empty(int(sh_offs[-1]), np.uint64)
        th_flat = np.empty(int(th_offs[-1]), np.uint64)
        for b in blocks:
            m = np.flatnonzero(b_arr == b)
            rows = r_arr[m]
            _fid, _sigs, _simh, shv, sho, thv, tho = self.views[b]
            _ragged_copy(shv, np.asarray(sho, np.int64), rows, sh_flat, sh_offs, m, sh_lens)
            _ragged_copy(thv, np.asarray(tho, np.int64), rows, th_flat, th_offs, m, th_lens)
        return sig, sim, (sh_flat, sh_offs), (th_flat, th_offs)

    def gather_fixed(self, ids: np.ndarray, num_perms: int):
        """Fixed-width half of ``gather``: (signature rows, simhash) only.
        The ragged shingle/token payloads are ~10-15x the fixed bytes, and
        the cheap-decision tier (est below rescue_low) never reads them —
        the two-phase scorer (score_pair_batch) gathers ragged features only
        for the pairs that need them. Measured: a noise-dominated 100k-pair
        batch spends 1.91 s in the full gather vs 0.13 s in this one."""
        n = len(ids)
        i = np.searchsorted(self.sorted_fid, ids)
        if len(self.sorted_fid) == 0 or np.any(i >= len(self.sorted_fid)) \
                or np.any(self.sorted_fid[np.minimum(i, len(self.sorted_fid) - 1)] != ids):
            missing = ids[(i >= len(self.sorted_fid))
                          | (self.sorted_fid[np.minimum(i, len(self.sorted_fid) - 1)] != ids)]
            raise KeyError(int(missing[0]))
        locs = self.sorted_loc[i]
        b_arr, r_arr = locs[:, 0], locs[:, 1]
        sig = np.empty((n, num_perms), dtype=np.uint64)
        sim = np.empty(n, dtype=np.uint64)
        for b in np.unique(b_arr):
            m = b_arr == b
            rows = r_arr[m]
            _fid, sigs, simh, _shv, _sho, _thv, _tho = self.views[b]
            sig[m] = sigs[rows]
            sim[m] = np.asarray(simh, dtype=np.uint64)[rows]
        return sig, sim

    def gather_ragged(self, ids: np.ndarray, which: str):
        """Second phase of the two-phase gather: (flat, offs) of ONE ragged
        feature (``'shingles'`` for exact Jaccard, ``'tokens'`` for the LCS
        rescue) for exactly ``ids`` — called with the need_exact / need_lcs
        subset only."""
        n = len(ids)
        i = np.searchsorted(self.sorted_fid, ids)
        # same missing-id validation as gather/gather_fixed — without it a
        # stray id silently reads a clamped/neighboring row (ADVICE r4)
        if len(self.sorted_fid) == 0 or np.any(i >= len(self.sorted_fid)) \
                or np.any(self.sorted_fid[np.minimum(i, len(self.sorted_fid) - 1)] != ids):
            missing = ids[(i >= len(self.sorted_fid))
                          | (self.sorted_fid[np.minimum(i, len(self.sorted_fid) - 1)] != ids)]
            raise KeyError(int(missing[0]))
        locs = self.sorted_loc[i]
        b_arr, r_arr = locs[:, 0], locs[:, 1]
        blocks = np.unique(b_arr)
        vi = 3 if which == "shingles" else 5  # view tuple index of (vals, offs)
        lens = np.empty(n, dtype=np.int64)
        for b in blocks:
            m = b_arr == b
            offs = np.asarray(self.views[b][vi + 1], np.int64)
            rows = r_arr[m]
            lens[m] = offs[rows + 1] - offs[rows]
        out_offs = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=out_offs[1:])
        flat = np.empty(int(out_offs[-1]), np.uint64)
        for b in blocks:
            m = np.flatnonzero(b_arr == b)
            v = self.views[b]
            _ragged_copy(np.asarray(v[vi]), np.asarray(v[vi + 1], np.int64),
                         r_arr[m], flat, out_offs, m, lens)
        return flat, out_offs

    def gather_tf(self, ids: np.ndarray) -> "np.ndarray | None":
        """Per-id tf_value (exact-group frequency) when the signature blocks
        carry it; None when the TF plumbing is off."""
        if not self.views or any(v is None for v in self.tf_views):
            return None
        i = np.searchsorted(self.sorted_fid, ids)
        locs = self.sorted_loc[i]
        b_arr, r_arr = locs[:, 0], locs[:, 1]
        out = np.empty(len(ids), np.float64)
        for b in np.unique(b_arr):
            m = b_arr == b
            out[m] = self.tf_views[b][r_arr[m]]
        return out


def _ragged_copy(src_vals, src_offs, rows, dst_flat, dst_offs, dst_rows, all_lens):
    """Copy ragged rows ``rows`` of (src_vals, src_offs) into their slots
    ``dst_rows`` of the flat output — pure repeat/arange index arithmetic."""
    rl = all_lens[dst_rows]
    tot = int(rl.sum())
    if tot == 0:
        return
    within = np.arange(tot, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(rl)[:-1])), rl)
    src = np.repeat(src_offs[rows], rl) + within
    dst = np.repeat(dst_offs[dst_rows], rl) + within
    dst_flat[dst] = src_vals[src]


def _subset_ragged(flat: np.ndarray, offs: np.ndarray, sel: np.ndarray):
    """Rows ``sel`` of a flat ragged layout as a new compact flat layout."""
    lens = np.diff(offs)[sel]
    new_offs = np.zeros(len(sel) + 1, np.int64)
    np.cumsum(lens, out=new_offs[1:])
    tot = int(new_offs[-1])
    within = np.arange(tot, dtype=np.int64) - np.repeat(new_offs[:-1], lens)
    src = np.repeat(np.asarray(offs, np.int64)[sel], lens) + within
    return flat[src], new_offs


def _binary_from_flat(vals: np.ndarray, elem_offs: np.ndarray) -> pa.LargeBinaryArray:
    """large_binary column from a flat uint64 layout WITHOUT per-row tobytes:
    the Arrow values buffer is the flat array's bytes, offsets are elem*8."""
    byte_offs = np.ascontiguousarray(elem_offs, dtype=np.int64) * 8
    return pa.Array.from_buffers(
        pa.large_binary(), len(elem_offs) - 1,
        [None, pa.py_buffer(byte_offs.tobytes()), pa.py_buffer(vals.tobytes())])


def _binary_to_flat(col) -> tuple:
    """Inverse of _binary_from_flat: (flat uint64 values, element offsets)
    views over a large_binary column's buffers — zero-copy, no to_pylist."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    bufs = arr.buffers()
    byte_offs = np.frombuffer(bufs[1], np.int64)[arr.offset:arr.offset + len(arr) + 1]
    if len(arr) == 0 or bufs[2] is None:
        return np.empty(0, np.uint64), np.zeros(len(arr) + 1, np.int64)
    raw = np.frombuffer(bufs[2], np.uint8)
    seg = raw[byte_offs[0]:byte_offs[-1]]
    return seg.view(np.uint64), (byte_offs - byte_offs[0]) // 8


def _apply_tf_and_emit(
    cfg: PipelineConfig, batch: pa.Table,
    left: np.ndarray, right: np.ndarray,
    est, jac, ham, lcs, gamma, w, prob, tier,
    tf_pair: "np.ndarray | None",
) -> pa.Table:
    """Shared tail of BOTH scoring paths (two-phase ``score_pair_batch`` and
    full-gather ``_score_from_flat``): the per-tier term-frequency adjustment
    over the FINAL gamma — vectorized ``cfg.tf_adjusted_match_weight``,
    ``w += weight[gamma] * log2(u[gamma] / max(tf, tf_min))`` with tf the
    pair's shared-value frequency (max of sides for fuzzy tiers) — plus the
    13-column output table. One copy so schema / TF semantics cannot drift
    between the paths (ADVICE r4)."""
    if tf_pair is not None:
        tw = np.array([cfg.tf_weight_for(g) for g in range(5)], dtype=np.float64)
        if tw.any():
            _, u = cfg.clamped_mu()
            u_arr = np.asarray(u, dtype=np.float64)
            sel = (tw[gamma] != 0.0) & (tf_pair > 0)
            if sel.any():
                g2 = gamma[sel]
                tfv = np.maximum(tf_pair[sel], cfg.tf_minimum_u_value)
                w = w.copy()
                w[sel] += tw[g2] * np.log2(u_arr[g2] / tfv)
                prob = (2.0 ** w) / (1.0 + 2.0 ** w)
    return pa.table({
        "left_id": pa.array(left, pa.int64()),
        "right_id": pa.array(right, pa.int64()),
        "match_key": batch["match_key"].combine_chunks(),
        "capped": batch["capped"].combine_chunks(),
        "jaccard_minhash": pa.array(est, pa.float32()),
        "jaccard_exact": pa.array(jac.astype(np.float32), pa.float32()),
        "hamming_simhash": pa.array(ham, pa.uint8()),
        "lcs_frac": pa.array(lcs.astype(np.float32), pa.float32()),
        "gamma": pa.array(gamma, pa.int8()),
        "gamma_pattern": pa.array(gamma, pa.int8()).cast(pa.string()),
        "tier": pa.array(tier.tolist(), pa.string()),
        "match_weight": pa.array(w, pa.float64()),
        "match_probability": pa.array(prob, pa.float64()),
    })


def _rescore_from_gamma(cfg: PipelineConfig, gamma: np.ndarray):
    """Recompute (weight, probability, tier) from an already-decided gamma
    array (used after a plugin lifts tiers)."""
    weights = np.array([cfg.match_weight(g) for g in range(5)], dtype=np.float64)
    w = weights[gamma]
    prob = (2.0 ** w) / (1.0 + 2.0 ** w)
    tier = np.array([TIER_NAMES[g] for g in gamma.tolist()], dtype=object)
    return gamma, w, prob, tier


def _score_arrays(cfg: PipelineConfig, est, jac, ham, lcs):
    """Vectorized gamma/tier/weight assignment from per-pair feature arrays."""
    n = len(jac)
    gamma = np.zeros(n, dtype=np.int8)
    gamma[jac >= cfg.jaccard_threshold] = GAMMA_JACCARD_LO
    gamma[jac >= cfg.jaccard_hi] = GAMMA_JACCARD_HI
    rescue = (gamma == GAMMA_ELSE) & (
        (ham <= cfg.simhash_hamming_max) | (lcs >= cfg.lcs_frac_threshold)
    )
    gamma[rescue] = GAMMA_RESCUED
    weights = np.array([cfg.match_weight(g) for g in range(5)], dtype=np.float64)
    w = weights[gamma]
    prob = (2.0 ** w) / (1.0 + 2.0 ** w)
    tier = np.array([TIER_NAMES[g] for g in gamma.tolist()], dtype=object)
    return gamma, w, prob, tier


class PairScorer:
    """Actor-pool callable. Each actor receives the signature table as a list
    of Arrow block refs (zero-copy plasma reads) and builds its id->features
    index ONCE in __init__."""

    def __init__(self, cfg_json: str, block_refs):
        self.cfg = PipelineConfig.from_json(cfg_json)
        blocks = ray.get(list(block_refs))
        self.features = FeatureIndex(blocks, self.cfg.num_perms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_pair_batch(self.cfg, batch, self.features)


# Worker-process-global FeatureIndex cache for the task-based scorer: Ray
# task workers persist across tasks, so the index (0.6s to build, zero-copy
# over plasma blocks) is built once per worker per run — actor-pool
# amortization without paying a fresh actor-process spawn per pool (measured
# ~30-40s per pipeline on a 32-CPU node).
_WORKER_INDEX_CACHE: dict = {}


def _score_task(batch: pa.Table, cfg_json: str, block_refs: tuple, cache_key: str) -> pa.Table:
    entry = _WORKER_INDEX_CACHE.get(cache_key)
    if entry is None:
        import time as _time

        t0 = _time.time()
        cfg = PipelineConfig.from_json(cfg_json)
        blocks = ray.get(list(block_refs))
        t1 = _time.time()
        entry = (cfg, FeatureIndex(blocks, cfg.num_perms))
        _WORKER_INDEX_CACHE.clear()  # hold at most one run's index per worker
        _WORKER_INDEX_CACHE[cache_key] = entry
        if os.environ.get("GRAFT_SCORE_TIMING"):
            import sys as _sys

            print(f"[score-index] get={t1 - t0:.2f}s build={_time.time() - t1:.2f}s "
                  f"blocks={len(blocks)} rows={sum(len(b) for b in blocks)}",
                  file=_sys.stderr, flush=True)
    cfg, idx = entry
    return score_pair_batch(cfg, batch, idx)


def score_pair_batch(cfg: PipelineConfig, batch: pa.Table, features: FeatureIndex) -> pa.Table:
    """Two-phase scoring (round 4): phase 1 gathers only the fixed-width
    features (minhash rows + simhash) for every pair and decides the cheap
    tiers; phase 2 gathers shingle sets for the ``need_exact`` subset and
    token sequences for the ``need_lcs`` subset only. On noise-dominated
    pair batches (large corpora: most candidates are sub-threshold template
    collisions) the ragged gathers were ~93% of score-stage time; skipping
    them for decided pairs measured 7x on a mixed batch, output-identical.
    The plugin path still needs every pair's ragged features and takes the
    original full-gather route."""
    left = batch["left_id"].to_numpy(zero_copy_only=False)
    right = batch["right_id"].to_numpy(zero_copy_only=False)
    P = cfg.num_perms
    if cfg.plugin_scorer:
        sigL, simL, shL, thL = features.gather(left, P)
        sigR, simR, shR, thR = features.gather(right, P)
        tf_pair = None
        if cfg.tf_nonexact_enabled:
            tfL, tfR = features.gather_tf(left), features.gather_tf(right)
            if tfL is not None and tfR is not None:
                tf_pair = np.maximum(tfL, tfR)
        return _score_from_flat(cfg, batch, left, right,
                                sigL, simL, shL, thL, sigR, simR, shR, thR,
                                tf_pair=tf_pair)
    n = len(left)
    # unique-id gathers (VERDICT r4 #5): hub files appear in thousands of
    # pairs within a skewed band's batch — gather each DISTINCT id once and
    # index per pair, instead of re-copying a hub's features per pair. The
    # fixed-width expansion is one fancy-index; the ragged layouts are
    # indexed per-side (jaccard_flat sel/sel_r), never expanded.
    uL, invL = np.unique(left, return_inverse=True)
    uR, invR = np.unique(right, return_inverse=True)
    usigL, usimL = features.gather_fixed(uL, P)
    usigR, usimR = features.gather_fixed(uR, P)
    tf_pair = None
    if cfg.tf_nonexact_enabled:
        tfL, tfR = features.gather_tf(uL), features.gather_tf(uR)
        if tfL is not None and tfR is not None:
            tf_pair = np.maximum(tfL[invL], tfR[invR])

    est = (usigL[invL] == usigR[invR]).mean(axis=1).astype(np.float32)
    ham = hamming_distance(usimL[invL], usimR[invR])

    jac = np.zeros(n, dtype=np.float64)
    sel = np.flatnonzero(est >= cfg.rescue_low)
    if sel.size:
        selL_u, selL_inv = np.unique(left[sel], return_inverse=True)
        selR_u, selR_inv = np.unique(right[sel], return_inverse=True)
        shLf, shLo = features.gather_ragged(selL_u, "shingles")
        shRf, shRo = features.gather_ragged(selR_u, "shingles")
        jac[sel] = jaccard_flat(shLf, shLo, shRf, shRo, selL_inv, selR_inv)

    lcs = np.zeros(n, dtype=np.float64)
    need_lcs = np.zeros(n, dtype=bool)
    need_lcs[sel] = True
    need_lcs &= (jac < cfg.jaccard_threshold) & (ham > cfg.simhash_hamming_max)
    nl = np.flatnonzero(need_lcs)
    n_lcs_run = 0
    thr = cfg.lcs_frac_threshold
    if nl.size:
        nlL_u, nlL_inv = np.unique(left[nl], return_inverse=True)
        nlR_u, nlR_inv = np.unique(right[nl], return_inverse=True)
        thLf, thLo = features.gather_ragged(nlL_u, "tokens")
        thRf, thRo = features.gather_ragged(nlR_u, "tokens")
        pref_cache: dict = {}

        def _pref(fid: int, seq: np.ndarray):
            p = pref_cache.get(fid)
            if p is None:
                p = prefix_pair(seq)
                pref_cache[fid] = p
            return p

        for j in range(len(nl)):
            il = nlL_inv[j]
            ir = nlR_inv[j]
            a = thLf[thLo[il]:thLo[il + 1]]
            b = thRf[thRo[ir]:thRo[ir + 1]]
            mn = min(len(a), len(b))
            if mn == 0:
                continue
            ub = multiset_overlap(a, b)
            if ub < thr * mn:
                continue
            n_lcs_run += 1
            i = nl[j]
            lcs[i] = lcs_fraction_thresholded(
                a, b, thr, hi_cap=ub,
                pref_a=_pref(int(left[i]), a), pref_b=_pref(int(right[i]), b))
    if _SCORE_DEBUG:
        import sys as _sys

        print(f"[score] n={n} need_exact={len(sel)} "
              f"need_lcs={len(nl)} lcs_run={n_lcs_run}",
              file=_sys.stderr, flush=True)

    gamma, w, prob, tier = _score_arrays(cfg, est, jac, ham, lcs)
    return _apply_tf_and_emit(cfg, batch, left, right, est, jac, ham, lcs,
                              gamma, w, prob, tier, tf_pair)


def _score_from_flat(
    cfg: PipelineConfig, batch: pa.Table,
    left: np.ndarray, right: np.ndarray,
    sigL, simL, shL, thL, sigR, simR, shR, thR,
    tf_pair: "np.ndarray | None" = None,
) -> pa.Table:
    """Vectorized scoring core over flat ragged feature layouts: ``shL`` /
    ``thL`` (and R) are (flat_values, offsets) pairs; row i's set is
    ``flat[offs[i]:offs[i+1]]``."""
    n = len(left)
    shLf, shLo = shL
    thLf, thLo = thL
    shRf, shRo = shR
    thRf, thRo = thR

    est = (sigL == sigR).mean(axis=1).astype(np.float32)
    ham = hamming_distance(simL, simR)

    # exact Jaccard only where the estimate clears the rescue floor — pairs far
    # below threshold are decided cheap (est is within ~4/sqrt(P) whp).
    # threshold comparisons at DOUBLE precision (a float32 round of an exact
    # rational like 7/10 lands below the 0.7 threshold); stored as float32
    jac = np.zeros(n, dtype=np.float64)
    need_exact = est >= cfg.rescue_low
    sel = np.flatnonzero(need_exact)
    if sel.size:
        # sel-indexed form: per-pair views into the flat layout — no
        # _subset_ragged copy (the copy + lexsort pair was 86% of the
        # score stage at code-shaped shingle sets)
        jac[sel] = jaccard_flat(shLf, shLo, shRf, shRo, sel)

    # LCS rescue only for near-misses that fail both Jaccard and SimHash.
    # The per-pair binary-search kernel costs ~80 numpy calls; under heavy
    # template similarity (large corpora put many borderline est>=rescue_low
    # pairs here) that loop dominated the whole score stage. The token
    # MULTISET overlap is an always-valid upper bound on lcs_length (see
    # functions/lcs.py:multiset_overlap), so pairs whose bound cannot reach
    # lcs_frac_threshold are skipped at ~4 numpy calls — decision-identical:
    # gamma only consumes lcs >= threshold, and skipped pairs are provably
    # below it. The exported lcs_frac column is exact at/above the decision
    # boundary and 0.0 where provably below.
    lcs = np.zeros(n, dtype=np.float64)
    need_lcs = need_exact & (jac < cfg.jaccard_threshold) & (ham > cfg.simhash_hamming_max)
    n_lcs_run = 0
    thr = cfg.lcs_frac_threshold
    # per-side prefix hashes are cacheable across pairs (template-similar
    # corpora repeat the same file in many near-miss pairs within a batch)
    pref_cache: dict = {}

    def _pref(fid: int, seq: np.ndarray):
        p = pref_cache.get(fid)
        if p is None:
            p = prefix_pair(seq)
            pref_cache[fid] = p
        return p

    for i in np.flatnonzero(need_lcs):
        a = thLf[thLo[i]:thLo[i + 1]]
        b = thRf[thRo[i]:thRo[i + 1]]
        mn = min(len(a), len(b))
        if mn == 0:
            continue
        ub = multiset_overlap(a, b)
        if ub < thr * mn:
            continue
        n_lcs_run += 1
        # threshold-first: one gram test decides the (common) below-threshold
        # case; exact binary search only above it — decision-identical, and
        # the exported column keeps its documented contract (exact at/above
        # the boundary, 0.0 where provably below)
        lcs[i] = lcs_fraction_thresholded(
            a, b, thr, hi_cap=ub,
            pref_a=_pref(int(left[i]), a), pref_b=_pref(int(right[i]), b))
    if _SCORE_DEBUG:
        import sys as _sys

        print(f"[score] n={n} need_exact={int(need_exact.sum())} "
              f"need_lcs={int(need_lcs.sum())} lcs_run={n_lcs_run}",
              file=_sys.stderr, flush=True)

    gamma, w, prob, tier = _score_arrays(cfg, est, jac, ham, lcs)

    # user-registered comparison level (§2.10): lift ELSE pairs whose plugin
    # score clears the threshold into the rescue tier. The plugin API contract
    # is per-pair array lists; materialize the (zero-copy) slices only here.
    if cfg.plugin_scorer:
        shL_l = [shLf[shLo[i]:shLo[i + 1]] for i in range(n)]
        shR_l = [shRf[shRo[i]:shRo[i + 1]] for i in range(n)]
        thL_l = [thLf[thLo[i]:thLo[i + 1]] for i in range(n)]
        thR_l = [thRf[thRo[i]:thRo[i + 1]] for i in range(n)]
        ps = _plugin_scores(cfg.plugin_scorer, shL_l, shR_l, thL_l, thR_l)
        lift = (gamma == GAMMA_ELSE) & (ps >= cfg.plugin_threshold)
        if lift.any():
            gamma = gamma.copy()
            gamma[lift] = GAMMA_RESCUED
            gamma, w, prob, tier = _rescore_from_gamma(cfg, gamma)

    # TF adjustment over the FINAL gamma (after plugin lifts) + output table
    # — shared with the two-phase path so the tails cannot drift
    return _apply_tf_and_emit(cfg, batch, left, right, est, jac, ham, lcs,
                              gamma, w, prob, tier, tf_pair)


def exact_scored_pairs(
    exact_mapped: "ray.data.Dataset",
    config: PipelineConfig,
    *,
    total_rows: int | None = None,
) -> "ray.data.Dataset":
    """Gamma-4 (exact tier) scored pair rows from the exact-dup groups, with
    term-frequency-adjusted match weights.

    The TF column is the content hash (``config.tf_adjustment_column``): every
    member of an exact group agrees on it by construction, and its relative
    frequency is group_size / corpus_size — computed inside the same narrow
    ``groupby(rep_id)`` that emits the star pairs (no extra shuffle). Weight
    arithmetic is ``config.tf_adjusted_match_weight`` (Splink 3.9 semantics,
    ref /root/reference/utils/parameter_lists.py:11-14). With
    ``tf_adjustment_weight == 0`` every pair scores the plain exact-tier
    weight (backward compatible)."""
    from nhse_probabilistic_linkage_ray.config import GAMMA_EXACT

    total = total_rows if total_rows is not None else exact_mapped.count()
    cfg_json = config.to_json()

    def emit(group: dict) -> dict:
        cfg = PipelineConfig.from_json(cfg_json)
        fid = np.sort(np.asarray(group["file_id"], dtype=np.int64))
        n = len(fid)
        if n < 2:
            return {"left_id": np.empty(0, np.int64), "right_id": np.empty(0, np.int64),
                    "gamma": np.empty(0, np.int8), "tf_value": np.empty(0, np.float64),
                    "match_weight": np.empty(0, np.float64),
                    "match_probability": np.empty(0, np.float64)}
        tf = n / total if total else 0.0
        w = cfg.tf_adjusted_match_weight(GAMMA_EXACT, tf)
        p = cfg.weight_to_probability(w)
        return {
            "left_id": np.full(n - 1, fid[0], np.int64),
            "right_id": fid[1:],
            "gamma": np.full(n - 1, GAMMA_EXACT, np.int8),
            "tf_value": np.full(n - 1, tf, np.float64),
            "match_weight": np.full(n - 1, w, np.float64),
            "match_probability": np.full(n - 1, p, np.float64),
        }

    narrow = exact_mapped.select_columns(["rep_id", "file_id"])
    return narrow.groupby("rep_id").map_groups(emit, batch_format="numpy")


def score_stage(
    pairs_ds: "ray.data.Dataset",
    signatures_ds: "ray.data.Dataset",
    config: PipelineConfig,
    *,
    strategy: str = "auto",
    signature_rows: int | None = None,
    pairs_hint: int | None = None,
) -> "ray.data.Dataset":
    """Candidate pairs + signatures -> scored pairs."""
    rows = signature_rows
    if strategy == "auto":
        rows = rows if rows is not None else signatures_ds.count()
        # size_bytes() is free metadata on the materialized signatures the
        # pipeline passes here; on a lazy dataset it executes — same cost as
        # the count() this path already paid.
        try:
            sig_bytes = signatures_ds.size_bytes() or 0
        except Exception:
            sig_bytes = 0
        fits = rows <= BROADCAST_ROW_LIMIT and sig_bytes <= _broadcast_byte_limit()
        strategy = "broadcast" if fits else "join"

    if strategy == "broadcast":
        # hand tasks the signature table's OWN Arrow block refs — blocks stay
        # in the object store, each (warm, reused) worker reads them zero-copy
        # and caches its FeatureIndex in a process-global keyed by run.
        # FeatureIndex picks the columns it needs by name, so no projection
        # pass / extra materialize is paid; the unused columns are shared
        # plasma memory, not copies.
        import uuid

        block_refs = tuple(r[0] if isinstance(r, tuple) else r
                           for r in signatures_ds.materialize().to_arrow_refs())
        cache_key = uuid.uuid4().hex
        # full-width scorer tasks: the per-worker FeatureIndex build is
        # zero-copy views over the shared plasma blocks (0.2 s at 872k reps —
        # see _batch_views; the old ~8-way cap existed because combine_chunks
        # made each build memcpy ~8 GB, measured 22 s/build at 32-way)
        per_task_cpus = 1
        # batch size: the two-phase gather cut per-pair cost ~7x, leaving
        # 4096-pair tasks only ~10-15 ms of compute each — 1,610 dispatches
        # at 6.6M pairs. 32k pairs (~70 MB fixed-gather heap per task, still
        # >= 100 tasks at 1M-file corpora) cuts dispatch 8x; measured
        # wall-neutral at this node scale (the dispatch cost overlaps
        # compute) but it is the right task granularity for a multi-node
        # pool. NOTE: the score stage's remaining non-scaling term on the
        # bench host is a ~+13 s second-full-run-in-session inflation
        # (plasma accumulation), independent of this batch size — see
        # BASELINE.md r4b row.
        batch_rows = int(os.environ.get("GRAFT_SCORE_BATCH", "32768"))
        return pairs_ds.map_batches(
            _score_task,
            fn_kwargs={"cfg_json": config.to_json(), "block_refs": block_refs,
                       "cache_key": cache_key},
            batch_format="pyarrow",
            batch_size=batch_rows,
            num_cpus=per_task_cpus,
            zero_copy_batch=True,
        )

    # ---- large-side path: two hash-partitioned joins, then stateless scoring.
    # pyarrow's hash join cannot carry (large_)list payload columns, so the
    # variable-length features travel as large_binary (offsets*8 + raw uint64
    # bytes — a zero-copy reinterpretation both ways).
    from nhse_probabilistic_linkage_ray.stages.cluster import join_partitions

    def pack_lists(batch: pa.Table) -> pa.Table:
        # uint64 simhash -> int64 bit-reinterpretation (Arrow cast range-checks)
        n = len(batch)
        sim_i64 = batch["simhash"].combine_chunks().to_numpy(zero_copy_only=False).view(np.int64)
        cols = {"file_id": batch["file_id"].combine_chunks(),
                "simhash": pa.array(sim_i64, pa.int64())}
        if "tf_value" in batch.column_names:
            cols["tf_value"] = batch["tf_value"].combine_chunks()
        mh = batch["minhash"].combine_chunks()
        mh_vals = np.ascontiguousarray(np.asarray(mh.flatten()), dtype=np.uint64)
        P = len(mh_vals) // n if n else 0
        cols["minhash_bin"] = _binary_from_flat(mh_vals, np.arange(n + 1, dtype=np.int64) * P)
        for name in ("shingles", "token_hashes"):
            col = batch[name].combine_chunks()
            vals = np.ascontiguousarray(np.asarray(col.values), dtype=np.uint64)
            offs = np.asarray(col.offsets, dtype=np.int64)
            cols[name + "_bin"] = _binary_from_flat(vals, offs)
        return pa.table(cols)

    feat_cols = ["file_id", "minhash", "simhash", "shingles", "token_hashes"]
    sig_schema = signatures_ds.schema()
    if config.tf_nonexact_enabled and sig_schema is not None \
            and "tf_value" in sig_schema.names:
        feat_cols.append("tf_value")
    feat = signatures_ds.select_columns(feat_cols) \
        .map_batches(pack_lists, batch_format="pyarrow", zero_copy_batch=True)

    k = join_partitions(config, rows=rows)
    joined = pairs_ds.join(
        feat, join_type="inner", num_partitions=k,
        on=("left_id",), right_on=("file_id",),
    )
    joined = joined.join(
        feat, join_type="inner", num_partitions=k,
        on=("right_id",), right_on=("file_id",),
        left_suffix="_L", right_suffix="_r",
    )

    cfg_json = config.to_json()

    def score_joined(batch: pa.Table) -> pa.Table:
        # the joined row ALREADY carries both sides' features in row order —
        # no id lookup at all; unpack the binary payloads zero-copy (the
        # values buffer of each large_binary column IS the flat uint64 layout)
        cfg = PipelineConfig.from_json(cfg_json)
        cols = batch.column_names

        def pick(base: str, side: str):
            for cand in (base + side, base):
                if cand in cols:
                    return batch[cand]
            raise KeyError(f"{base}{side} not in {cols}")

        n = len(batch)

        def side_feats(side):
            P = cfg.num_perms
            mh_flat, _ = _binary_to_flat(pick("minhash_bin", side))
            sig = mh_flat.reshape(n, P) if n else mh_flat.reshape(0, P)
            sim = pick("simhash", side).combine_chunks().to_numpy(
                zero_copy_only=False).view(np.uint64)
            sh = _binary_to_flat(pick("shingles_bin", side))
            th = _binary_to_flat(pick("token_hashes_bin", side))
            return sig, sim, sh, th

        sigL, simL, shL, thL = side_feats("_L")
        sigR, simR, shR, thR = side_feats("_r")
        left = batch["left_id"].to_numpy(zero_copy_only=False)
        right = batch["right_id"].to_numpy(zero_copy_only=False)
        tf_pair = None
        if cfg.tf_nonexact_enabled and ("tf_value_L" in cols or "tf_value" in cols):
            tfL = pick("tf_value", "_L").to_numpy(zero_copy_only=False)
            tfR = pick("tf_value", "_r").to_numpy(zero_copy_only=False)
            tf_pair = np.maximum(tfL, tfR)
        slim = pa.table({k2: batch[k2] for k2 in ("left_id", "right_id", "match_key", "capped")})
        return _score_from_flat(cfg, slim, left, right,
                                sigL, simL, shL, thL, sigR, simR, shR, thR,
                                tf_pair=tf_pair)

    return joined.map_batches(score_joined, batch_format="pyarrow", batch_size=4096)
