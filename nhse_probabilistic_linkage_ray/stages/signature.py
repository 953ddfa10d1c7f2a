"""Signature stage: MinHash + SimHash + shingle features via an actor pool.

The stateful stage of SURVEY.md T1: the MinHash permutation matrix (P pairs of
uint64 coefficients) is the per-worker state the reference keeps as registered
UDFs / the Splink linker — constructed ONCE per actor in ``__init__`` from the
config seed, reused for every batch. Signatures are deterministic functions of
(config, content): identical at any parallelism level and across resumes.

Output schema (content is DROPPED here — SURVEY.md §7.4 "very wide rows"):

- ``file_id`` uint64
- ``minhash`` fixed_size_list<uint64, P>
- ``simhash`` uint64
- ``n_tokens`` / ``n_shingles`` int64
- ``shingles`` large_list<uint64>      (sorted unique; exact-Jaccard material)
- ``token_hashes`` large_list<uint64>  (ordered; LCS-rescue material)

At 10^12-file scale ``shingles``/``token_hashes`` rival the content in size;
they are carried because the verify stage consumes them directly. The
alternative (re-join raw content for the pair set only) trades this storage
for an extra shuffle — the checkpoint layout keeps that swap localized here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions.minhash import MinHasher
from nhse_probabilistic_linkage_ray.functions.shingle import shingle_hashes, token_hashes_batch
from nhse_probabilistic_linkage_ray.functions.simhash import simhash


class SignatureActor:
    """Callable class for map_batches: permutation state built once per actor."""

    def __init__(self, cfg_json: str):
        self.cfg = PipelineConfig.from_json(cfg_json)
        self.hasher = MinHasher(self.cfg.num_perms, self.cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["norm_content"].to_pylist()
        flat, offs = token_hashes_batch(texts)
        sh, soffs = shingle_hashes(flat, offs, self.cfg.shingle_k)
        sigs = self.hasher.signatures(sh, soffs)
        sims = simhash(sh, soffs)

        n = len(texts)
        minhash_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel(), pa.uint64()), self.cfg.num_perms
        )
        shingles_col = pa.LargeListArray.from_arrays(
            pa.array(soffs, pa.int64()), pa.array(sh, pa.uint64())
        )
        tokens_col = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), pa.array(flat, pa.uint64())
        )
        cols = {
            "file_id": batch["file_id"].combine_chunks(),
            "content_sha256": batch["content_sha256"].combine_chunks(),
            "minhash": minhash_col,
            "simhash": pa.array(sims, pa.uint64()),
            "n_tokens": pa.array(np.diff(offs), pa.int64()),
            "n_shingles": pa.array(np.diff(soffs), pa.int64()),
            "shingles": shingles_col,
            "token_hashes": tokens_col,
        }
        # per-tier TF plumbing (config.tf_tier_weights): the rep's exact-group
        # frequency rides along to the scorer when the exact-group stage
        # attached it
        if "tf_value" in batch.column_names:
            cols["tf_value"] = batch["tf_value"].combine_chunks()
        return pa.table(cols)


# Worker-process-global per-worker state for the task-based path: Ray task
# workers persist across tasks, so the MinHasher/config state is constructed
# once per worker per config — the once-per-worker amortization of an actor
# pool without the pool. Measured on the bench corpus (29k reps, 8 CPUs):
# task path 4.8-8.0 s vs actor pool 20.5 s — a fresh actor POOL per stage
# call pays ~6 process spawns plus per-actor queueing, while the state it
# amortizes (a 2-coefficient permutation, microseconds to build) never
# justified it. The actor-pool path remains selectable
# (config.signature_concurrency > 0) for stages whose per-worker state is
# genuinely expensive (model weights, big dictionaries — SURVEY.md T1).
_SIG_CACHE: dict = {}


def _signature_task(batch: pa.Table, cfg_json: str) -> pa.Table:
    actor = _SIG_CACHE.get(cfg_json)
    if actor is None:
        _SIG_CACHE.clear()  # hold one config's state per worker
        actor = SignatureActor(cfg_json)
        _SIG_CACHE[cfg_json] = actor
    return actor(batch)


def signature_stage(
    reps_ds: "ray.data.Dataset", config: PipelineConfig, *, rows_hint: int | None = None
) -> "ray.data.Dataset":
    """Representatives -> signatures. Default: task pool with worker-global
    state (scales with whatever CPUs exist — the N -> 4N criterion — and
    pays zero pool-startup); set ``config.signature_concurrency`` for an
    explicit actor pool."""
    if config.signature_concurrency > 0:
        return reps_ds.map_batches(
            SignatureActor,
            fn_constructor_args=(config.to_json(),),
            batch_format="pyarrow",
            batch_size=config.batch_size,
            concurrency=config.signature_concurrency,
            num_cpus=1,
            zero_copy_batch=True,
        )
    return reps_ds.map_batches(
        _signature_task,
        fn_kwargs={"cfg_json": config.to_json()},
        batch_format="pyarrow",
        batch_size=config.batch_size,
        zero_copy_batch=True,
    )
