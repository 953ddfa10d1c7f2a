"""Connected-components tests: the distributed large-star/small-star pass must
reproduce the reference's find_connected_ids contract
(/root/reference/utils/dataset_ingestion_utils.py:487-540 — undirected edges ->
components, deterministic cluster id) on chains, cycles, singletons and
multi-component graphs (FIXTURES.md F4 union-find cases)."""

from __future__ import annotations

import numpy as np
import pytest

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.state.union_find import connected_components_small


def _run_cc(ray_session, edges, mode="distributed"):
    import ray.data

    from nhse_probabilistic_linkage_ray.stages.cluster import connected_components

    cfg = PipelineConfig()
    ds = ray.data.from_items([{"u": int(u), "v": int(v)} for u, v in edges])
    out = connected_components(ds, cfg, mode=mode)
    return {r["file_id"]: r["cluster_id"] for r in out.take_all()}


CASES = {
    "chain": [(1, 2), (2, 3), (3, 4), (4, 5)],
    "cycle": [(1, 2), (2, 3), (3, 1)],
    "two_components": [(1, 2), (2, 3), (10, 11), (12, 11)],
    "star": [(5, 1), (5, 2), (5, 3), (5, 4)],
    "dup_edges_and_reversed": [(2, 1), (1, 2), (2, 3), (3, 2)],
    "long_chain": [(i, i + 1) for i in range(1, 40)],
    "bridge": [(1, 2), (3, 4), (2, 3)],
}


@pytest.mark.parametrize("name", ["chain", "two_components", "dup_edges_and_reversed"])
def test_cc_distributed_matches_driver_union_find(ray_session, name):
    """The distributed star passes on representative topologies."""
    edges = CASES[name]
    got = _run_cc(ray_session, edges, mode="distributed")
    want = connected_components_small(np.array(edges))
    assert got == want
    for node, cid in got.items():
        assert cid <= node


@pytest.mark.parametrize("name", sorted(CASES))
def test_cc_auto_matches_driver_union_find(ray_session, name):
    edges = CASES[name]
    got = _run_cc(ray_session, edges, mode="auto")
    want = connected_components_small(np.array(edges))
    assert got == want


def test_cc_large_random_graph_distributed(ray_session):
    rng = np.random.default_rng(42)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 400, size=(600, 2)) if a != b]
    got = _run_cc(ray_session, edges, mode="distributed")
    want = connected_components_small(np.array(edges))
    assert got == want


def test_assign_clusters_fills_singletons(ray_session):
    import ray.data

    from nhse_probabilistic_linkage_ray.stages.cluster import assign_clusters

    cfg = PipelineConfig()
    allf = ray.data.from_items([{"file_id": i} for i in [1, 2, 3, 99]])
    comp = ray.data.from_items([{"file_id": 2, "cluster_id": 1},
                                {"file_id": 1, "cluster_id": 1}])
    out = {r["file_id"]: r["cluster_id"] for r in assign_clusters(allf, comp, cfg).take_all()}
    assert out == {1: 1, 2: 1, 3: 3, 99: 99}


@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_cc_empty_and_self_loops(ray_session, mode):
    """The sort+segment-scan star path must handle zero edges and pure
    self-loops exactly like the driver union-find (no assignments)."""
    import pyarrow as pa

    import ray.data

    from nhse_probabilistic_linkage_ray.stages.cluster import connected_components

    cfg = PipelineConfig()
    empty = ray.data.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))
    assert connected_components(empty, cfg, mode=mode).take_all() == []
    loops = ray.data.from_arrow(
        pa.table({"u": pa.array([5, 7], pa.int64()),
                  "v": pa.array([5, 7], pa.int64())}))
    assert connected_components(loops, cfg, mode=mode).take_all() == []
