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
        return pa.table({
            "file_id": batch["file_id"].combine_chunks(),
            "content_sha256": batch["content_sha256"].combine_chunks(),
            "minhash": minhash_col,
            "simhash": pa.array(sims, pa.uint64()),
            "n_tokens": pa.array(np.diff(offs), pa.int64()),
            "n_shingles": pa.array(np.diff(soffs), pa.int64()),
            "shingles": shingles_col,
            "token_hashes": tokens_col,
        })


def signature_stage(
    reps_ds: "ray.data.Dataset", config: PipelineConfig, *, rows_hint: int | None = None
) -> "ray.data.Dataset":
    """Representatives -> signatures. Actor pool sized to the cluster's CPUs
    (so throughput scales with cluster size, the N -> 4N criterion) and capped
    by the work available (rows_hint) so small runs don't pay 30 actor
    startups for 9 batches."""
    if config.signature_concurrency > 0:
        pool = config.signature_concurrency
    else:
        # leave headroom for the upstream read/filter tasks — an actor pool
        # that reserves every CPU starves its own input and deadlocks
        cpus = int(ray.cluster_resources().get("CPU", 8))
        pool = max(2, cpus - 2)
        if rows_hint is not None:
            pool = max(2, min(pool, -(-rows_hint // config.batch_size)))
    return reps_ds.map_batches(
        SignatureActor,
        fn_constructor_args=(config.to_json(),),
        batch_format="pyarrow",
        batch_size=config.batch_size,
        concurrency=pool,
        num_cpus=1,
        zero_copy_batch=True,
    )
