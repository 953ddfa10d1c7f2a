"""Distributed-vs-driver connected-components benchmark (VERDICT r3 task #2).

Builds a synthetic edge table with the pipeline's shape — components of
skewed sizes, each edge duplicated with band multiplicity, randomly
interleaved — and times ``connected_components`` in both modes on the same
Ray session. Run:

    taskset -c 8-27 python tools/cc_bench.py [raw_edges] [num_cpus]

Success bar (VERDICT round 3): mode='distributed' within ~3x of
mode='driver' wall time on a 2-8M-raw-edge fixture.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# runnable as `python tools/cc_bench.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_edges(n_raw: int, seed: int = 7) -> np.ndarray:
    """(n_raw, 2) int64 raw edges: skewed component sizes (many pairs, a few
    thousand-node stars), ~3x band-duplicate multiplicity, shuffled order."""
    rng = np.random.default_rng(seed)
    edges = []
    n_distinct = n_raw // 3
    next_id = 0
    while sum(len(e) for e in edges) < n_distinct:
        # component size: 2 w.p. 0.7, 3-10 w.p. 0.25, 100-2000 w.p. 0.05
        r = rng.random()
        if r < 0.7:
            size = 2
        elif r < 0.95:
            size = int(rng.integers(3, 11))
        else:
            size = int(rng.integers(100, 2001))
        ids = np.arange(next_id, next_id + size, dtype=np.int64)
        next_id += size + 1
        # random spanning tree + extra chords (the dup-pair graph is denser
        # than a tree but far from complete)
        parents = ids[rng.integers(0, np.arange(1, size))] if size > 2 else ids[:1]
        tree = np.stack([ids[1:], parents], axis=1)
        n_chords = min(size, 3 * size // 2)
        chords = ids[rng.integers(0, size, size=(n_chords, 2))]
        chords = chords[chords[:, 0] != chords[:, 1]]
        edges.append(np.concatenate([tree, chords]))
    distinct = np.concatenate(edges)
    mult = rng.integers(1, 6, size=len(distinct))  # band multiplicity 1-5
    raw = np.repeat(distinct, mult, axis=0)[:n_raw]
    rng.shuffle(raw)
    return raw


def main() -> None:
    n_raw = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR", object_store_memory=2 << 30)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    ray.data.DataContext.get_current().min_parallelism = 2 * ncpu

    from nhse_probabilistic_linkage_ray.config import PipelineConfig
    from nhse_probabilistic_linkage_ray.stages.cluster import connected_components

    import pyarrow as pa

    raw = make_edges(n_raw)
    t = pa.table({"u": pa.array(raw[:, 0], pa.int64()),
                  "v": pa.array(raw[:, 1], pa.int64())})
    # many blocks so the distributed path has real parallelism to exploit
    ds = ray.data.from_arrow(t).repartition(4 * ncpu).materialize()
    cfg = PipelineConfig()

    results = {"raw_edges": n_raw, "num_cpus": ncpu}
    sums = {}
    for mode in ("driver", "distributed", "driver", "distributed"):
        t0 = time.time()
        out = connected_components(ds, cfg, mode=mode).materialize()
        dt = time.time() - t0
        # correctness cross-check: same (file_id -> cluster_id) multiset
        h = 0
        n = 0
        for b in out.iter_batches(batch_format="pyarrow"):
            f = b["file_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            c = b["cluster_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            # partition-invariant: plain modular addition over per-row mixes
            h = (h + int((f * np.uint64(0x9E3779B97F4A7C15) ^ c).sum())) & 0xFFFFFFFFFFFFFFFF
            n += len(f)
        sums.setdefault(mode, (n, h))
        assert sums[mode] == (n, h), f"{mode} nondeterministic"
        results.setdefault(mode, []).append(round(dt, 2))
        print(json.dumps({"mode": mode, "sec": round(dt, 2), "rows": n}),
              file=sys.stderr, flush=True)
    assert sums["driver"] == sums["distributed"], \
        f"mode mismatch: {sums['driver']} vs {sums['distributed']}"
    d_best = min(results["driver"])
    s_best = min(results["distributed"])
    results["ratio_distributed_over_driver"] = round(s_best / d_best, 2)
    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()
