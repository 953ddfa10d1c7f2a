"""Skew handling tests (north_rule: explicit salted/capped handling of
mega-bands): a band bucket larger than max_band_group must be star-capped
with the pairs flagged, while cluster connectivity is preserved."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.oracle import cluster_pairs


def _mega_corpus(n_variants: int = 60) -> pa.Table:
    """One base file + many NEAR-identical variants (distinct normalized
    content so the exact pre-pass cannot collapse them): a guaranteed
    mega-band at every banding config."""
    base_lines = [f"line {i} alpha beta gamma delta value {i*7}" for i in range(40)]
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for v in range(n_variants):
        lines = list(base_lines)
        lines[v % len(lines)] += f" v{v}"   # one-token difference per variant
        rows["repo"].append(f"org/r{v % 5}")
        rows["path"].append(f"src/f{v}.txt")
        rows["commit"].append(f"{v:040d}")
        rows["lang"].append("text")
        rows["content"].append("\n".join(lines))
    return pa.table({k: pa.array(v, pa.large_string() if k == "content" else pa.string())
                     for k, v in rows.items()})


@pytest.fixture(scope="module")
def capped_run(ray_session):
    import ray.data

    from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset

    cfg = PipelineConfig(num_perms=64, num_bands=16, max_band_group=8)
    out = dedupe_dataset(ray.data.from_arrow(_mega_corpus()), cfg)
    return {
        "clusters": out["clusters"].take_all(),
        "scored": out["scored_pairs"].take_all(),
    }


def test_mega_band_pairs_are_capped(capped_run):
    capped = [r for r in capped_run["scored"] if r["capped"]]
    assert capped, "a 60-member near-identical group must exceed max_band_group=8"


def test_capped_cluster_still_connects(capped_run):
    """Star-capping must not fragment the true cluster: all 60 variants are
    mutually near-identical and must land in ONE cluster."""
    ids = {r["cluster_id"] for r in capped_run["clusters"]}
    assert len(ids) == 1


def test_capped_report_metric(ray_session, capped_run):
    import ray.data

    from nhse_probabilistic_linkage_ray.stages.report import capped_band_report

    scored_ds = ray.data.from_items(
        [{"capped": int(r["capped"]), "left_id": r["left_id"]} for r in capped_run["scored"]]
    )
    rep = capped_band_report(scored_ds)
    assert rep["capped_pairs"] > 0
    assert rep["pairs"] >= rep["capped_pairs"]


def test_pair_volume_bounded_by_cap(capped_run):
    """With capping, emitted pairs are O(n x bands), never C(n,2) per band."""
    n = 60
    assert len(capped_run["scored"]) < n * (n - 1) // 2


def test_run_manifest_surfaces_capped_buckets(ray_session, tmp_path):
    """run_dedupe must write the over-cap bucket table into skew.json
    (VERDICT r3 #7): every star-capped (band_idx, band_hash) bucket with its
    member count, alongside the per-band pair counts."""
    import json

    import pyarrow.parquet as pq

    from nhse_probabilistic_linkage_ray.pipelines.dedupe import run_dedupe

    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(_mega_corpus(), corpus)
    cfg = PipelineConfig(num_perms=64, num_bands=16, max_band_group=8)
    wd = str(tmp_path / "wd")
    run_dedupe(corpus, wd, cfg)
    skew = json.load(open(f"{wd}/metrics/skew.json"))
    assert skew["capped_pairs"] > 0
    assert skew["max_band_group"] == 8
    buckets = skew["capped_buckets"]
    assert buckets, "the 60-member mega-band must appear as an over-cap bucket"
    assert all(b["n_members"] > 8 for b in buckets)
    # sorted by size descending, and the top bucket holds most of the group
    sizes = [b["n_members"] for b in buckets]
    assert sizes == sorted(sizes, reverse=True)
    assert sizes[0] > 30
    assert {"band_idx", "band_hash", "n_members"} <= set(buckets[0])
    # per-band pair table rides along
    assert skew["pairs_per_band"]["match_key"]
