"""Tests: cartesian explode contract (D5, ref 2x2x2 -> 8), array set ops,
and the IVF ANN path's recall against the brute-force baseline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nhse_probabilistic_linkage_ray.functions.arrays import (
    array_distinct,
    cartesian_explode_batch,
    remove_empty,
)


class TestArrays:
    def test_cartesian_2x2x2_is_8(self):
        # the explode_pds contract pinned at
        # /root/reference/tests/dataset_ingestion_tests.py:249-309
        t = pa.table({
            "key": ["k1"],
            "given": [["ann", "anne"]],
            "family": [["smith", "smyth"]],
            "postcode": [["AB1", "AB2"]],
        })
        out = cartesian_explode_batch(t, ["given", "family", "postcode"])
        assert len(out) == 8
        combos = set(zip(out["given"].to_pylist(), out["family"].to_pylist(),
                         out["postcode"].to_pylist()))
        assert len(combos) == 8
        assert all(k == "k1" for k in out["key"].to_pylist())

    def test_cartesian_empty_list_keeps_null_row(self):
        # explode_outer: one null per empty history
        t = pa.table({"key": ["k"], "a": [["x"]], "b": [[]]})
        out = cartesian_explode_batch(t, ["a", "b"])
        assert len(out) == 1
        assert out["b"].to_pylist() == [None]

    def test_cartesian_multiple_rows(self):
        t = pa.table({"key": ["a", "b"], "l": [["1", "2"], ["3"]]})
        out = cartesian_explode_batch(t, ["l"])
        assert out["key"].to_pylist() == ["a", "a", "b"]
        assert out["l"].to_pylist() == ["1", "2", "3"]

    def test_array_distinct_and_remove_empty(self):
        assert array_distinct(np.array([3, 1, 3, 2])).tolist() == [1, 2, 3]
        assert remove_empty(["a", "", None, "b"]) == ["a", "b"]


class TestIVF:
    def test_ivf_recall_vs_brute_force(self, ray_session):
        from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import q_ann_cosine_topk
        from nhse_probabilistic_linkage_ray.pipelines.similarity import ann_ivf_topk

        sf = "/root/testdata/sf0.001"
        brute = q_ann_cosine_topk(sf).take_all()
        ivf = ann_ivf_topk(sf).take_all()
        b = {}
        for r in brute:
            b.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        a = {}
        for r in ivf:
            a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [len(a.get(q, set()) & ns) / len(ns) for q, ns in b.items()]
        assert np.mean(recalls) >= 0.5, f"IVF recall too low: {recalls}"

    def test_centroid_training_deterministic(self):
        from nhse_probabilistic_linkage_ray.pipelines.similarity import train_centroids

        rng = np.random.default_rng(1)
        x = rng.standard_normal((300, 8))
        c1 = train_centroids(x, 8)
        c2 = train_centroids(x, 8)
        assert np.array_equal(c1, c2)
