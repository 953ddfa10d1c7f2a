"""Driver-side union-find.

Mirrors the connected-components contract of the reference's
``find_connected_ids`` (``/root/reference/utils/dataset_ingestion_utils.py:487-540``:
undirected edges -> components, every member mapped to its component) with the
deterministic cluster id = min(member id) that our distributed pass also
produces. Used ONLY for small graphs: the brute-force oracle and unit tests.
The production path is stages/cluster.py (distributed large-star/small-star);
keeping this driver-side version for big data would be the reference's
driver-memory bug (SURVEY.md §4), which the distributed pass exists to fix.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        # iterative two-pass (walk to root, then compress): a chain-shaped
        # component would blow Python's recursion limit at ~1000 nodes, and
        # the driver CC path streams up to 2M edges through this class
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins (cluster_id = min(member))
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def components(self) -> dict:
        """{node: cluster_id} with cluster_id = min(component member)."""
        return {x: self.find(x) for x in list(self.parent)}


def connected_components_small(edges: np.ndarray) -> dict:
    """edges: (n, 2) array-like of node ids -> {node: min-member cluster id}."""
    uf = UnionFind()
    for u, v in edges:
        uf.union(int(u), int(v))
    return uf.components()
