"""Adapter: the generic ``documents`` test table -> the engine's canonical
files shape ``(repo, path, commit, lang, content)`` (BASELINE.json input_hint).

Deterministic: file identity derives only from doc_id/source, so pipeline
outputs over the adapter are stable across runs and parallelism levels.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data


def _files_batch(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"].to_pylist()
    source = batch["source"].to_pylist()
    lang = batch["lang"].to_pylist()
    text = batch["text"].to_pylist()
    commits = [hashlib.sha256(f"doc:{d}".encode()).hexdigest()[:40] for d in doc_id]
    return pa.table({
        "repo": pa.array([f"corpus/{s}" for s in source], pa.string()),
        "path": pa.array([f"docs/{d:08d}.md" for d in doc_id], pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "content": pa.array(text, pa.large_string()),
        "doc_id": batch["doc_id"].combine_chunks(),
    })


def files_from_documents(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return ds.map_batches(_files_batch, batch_format="pyarrow", zero_copy_batch=True)
