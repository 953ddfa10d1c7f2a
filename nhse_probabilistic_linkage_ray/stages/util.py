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
