"""Execution-shape helpers shared by the stages.

Ray Data schedules one map task per input block; a materialized small
intermediate often coalesces to ONE block, which serializes the map phase of
any downstream sort/shuffle (measured ~6x slower on a 32-CPU node). These
helpers keep intermediates wide enough for the cluster without touching
naturally-wide large runs.
"""

from __future__ import annotations

import ray
import ray.data


def cluster_cpus() -> int:
    return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8


def trim_worker_heaps(timeout_s: float = 5.0) -> int:
    """Release accumulated glibc heap in Ray worker processes (VERDICT r4 #7).

    Long-lived workers under large MALLOC_TRIM_THRESHOLD_ keep every freed
    scratch block resident; on a multi-job cluster the second/third full
    pipeline in one session then allocates beside tens of GB of dead heap
    plus a full object store, and score-stage scratch allocation collapses
    (measured 19.3 -> 36.9 -> 170.7 s across three consecutive 600k-file
    runs; with trimming 20.4 -> 37.7 -> 23.6, BASELINE.md r4b). This hook
    runs ``malloc_trim(0)`` on the driver and broadcasts it best-effort to
    the worker pool: one ``num_cpus=1`` task per cluster CPU, so an IDLE
    pool (the state at end-of-run, when this is called) spreads them across
    distinct worker processes. Gated by GRAFT_TRIM_AFTER_RUN (default on);
    returns the number of worker trims that completed."""
    import ctypes
    import os as _os

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.malloc_trim(0)
    except Exception:
        pass
    if _os.environ.get("GRAFT_TRIM_AFTER_RUN", "1") == "0" or not ray.is_initialized():
        return 0

    @ray.remote(num_cpus=1)
    def _trim() -> int:
        import ctypes as _ct
        try:
            _ct.CDLL("libc.so.6", use_errno=True).malloc_trim(0)
            return 1
        except Exception:
            return 0

    n = int(ray.cluster_resources().get("CPU", 0))
    if n <= 0:
        return 0
    refs = [_trim.remote() for _ in range(n)]
    done, pending = ray.wait(refs, num_returns=len(refs), timeout=timeout_s)
    for r in pending:
        try:
            ray.cancel(r, force=True)
        except Exception:
            pass
    return len(done)


def ensure_blocks(ds: "ray.data.Dataset", target: int | None = None) -> "ray.data.Dataset":
    """Split a MATERIALIZED dataset into at least ``target`` blocks (default
    2x cluster CPUs). No-op when already wide — never coalesces the natural
    block count of a large run."""
    target = target or 2 * cluster_cpus()
    try:
        nb = ds.num_blocks()
    except Exception:
        return ds
    if nb is not None and nb < target:
        return ds.repartition(target).materialize()
    return ds
