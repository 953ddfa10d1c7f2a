"""Checkpointed-resume tests (north_rule: resumable signature / banding /
clustering stages; FIXTURES.md F5 resume fixture): a run interrupted after the
signature stage must complete from checkpoints and produce output identical to
an uninterrupted run; a config change must invalidate the checkpoints."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from nhse_probabilistic_linkage_ray.config import PipelineConfig


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory, small_corpus):
    d = tmp_path_factory.mktemp("corpus")
    p = str(d / "files.parquet")
    pq.write_table(small_corpus, p)
    return p


def _clusters_of(result) -> dict:
    return {r["file_id"]: r["cluster_id"] for r in result["clusters"].take_all()}


def test_full_run_then_resume_identical(ray_session, corpus_path, tmp_path):
    from nhse_probabilistic_linkage_ray.pipelines.dedupe import run_dedupe

    cfg = PipelineConfig(num_perms=64, num_bands=16)
    wd1 = str(tmp_path / "run1")
    first = _clusters_of(run_dedupe(corpus_path, wd1, cfg))

    # simulate a crash after the signature stage: delete all later checkpoints
    for stage in ("pairs", "scored", "components", "clusters"):
        shutil.rmtree(os.path.join(wd1, stage))
    resumed = _clusters_of(run_dedupe(corpus_path, wd1, cfg))
    assert resumed == first

    # stage manifests exist and record the config hash
    for stage in ("exact", "signature", "pairs", "scored", "components", "clusters"):
        m = json.load(open(os.path.join(wd1, stage, "manifest.json")))
        assert m["config_hash"] == cfg.config_hash
        assert m["rows"] > 0
        assert m["partitions"]


def test_resume_skips_completed_stages(ray_session, corpus_path, tmp_path):
    from nhse_probabilistic_linkage_ray.pipelines.dedupe import run_dedupe

    cfg = PipelineConfig(num_perms=64, num_bands=16)
    wd = str(tmp_path / "run")
    run_dedupe(corpus_path, wd, cfg)
    sig_manifest = os.path.join(wd, "signature", "manifest.json")
    mtime = os.path.getmtime(sig_manifest)
    run_dedupe(corpus_path, wd, cfg)  # full resume: nothing rebuilt
    assert os.path.getmtime(sig_manifest) == mtime


def test_config_change_invalidates_checkpoints(ray_session, corpus_path, tmp_path):
    from nhse_probabilistic_linkage_ray.pipelines.dedupe import run_dedupe
    from nhse_probabilistic_linkage_ray.state import manifests

    wd = str(tmp_path / "run")
    cfg1 = PipelineConfig(num_perms=64, num_bands=16)
    run_dedupe(corpus_path, wd, cfg1)
    cfg2 = PipelineConfig(num_perms=64, num_bands=8)
    assert not manifests.is_complete(os.path.join(wd, "signature"),
                                     cfg2.config_hash, corpus_path)


def test_truncated_checkpoint_is_not_resumed(ray_session, corpus_path, tmp_path):
    """A stage dir without a manifest (crash mid-write) must be rebuilt."""
    from nhse_probabilistic_linkage_ray.pipelines.dedupe import run_dedupe

    cfg = PipelineConfig(num_perms=64, num_bands=16)
    wd = str(tmp_path / "run")
    first = _clusters_of(run_dedupe(corpus_path, wd, cfg))
    os.remove(os.path.join(wd, "signature", "manifest.json"))
    for stage in ("pairs", "scored", "components", "clusters"):
        shutil.rmtree(os.path.join(wd, stage))
    again = _clusters_of(run_dedupe(corpus_path, wd, cfg))
    assert again == first
