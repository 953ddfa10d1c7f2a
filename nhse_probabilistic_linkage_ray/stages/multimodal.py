"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media payloads next to text; this
module provides the Ray-side plumbing — schema, actor-pool stage shape,
batch sizing, output layout — with the codec work stubbed (no image/audio
libraries in this environment; the decoder seam is one class).

Design (mirrors the dedup signature stage, SURVEY.md T1):
- payloads are ``large_binary`` columns with sidecar metadata
  (``media_type``, ``byte_size``);
- decode / feature-extract is an actor-pool ``map_batches`` stage: codecs
  load once per actor in ``__init__``; batches are kept SMALL
  (``MEDIA_BATCH_SIZE``) because each row can be megabytes — batch x
  concurrency must fit the worker heap;
- a deterministic fake decoder stands in for the real codec so the plumbing
  is testable end-to-end; the real thing replaces ONE class.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

MEDIA_BATCH_SIZE = 32  # rows per batch: payloads are large, keep batches small

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # e.g. image/png, audio/wav
    ("payload", pa.large_binary()),
    ("byte_size", pa.int64()),
])


class MediaDecoder:
    """The codec seam. ``decode`` must return a dict of numpy feature arrays
    for a batch of payloads. The default implementation raises — this
    environment has no image/audio libraries; subclass with a real codec
    (PIL / torchaudio / ffmpeg) in production."""

    def decode(self, payloads: list, media_types: list) -> dict:
        raise NotImplementedError(
            "no media codecs in this environment — use DeterministicFakeDecoder "
            "for tests or plug a real codec here"
        )


class DeterministicFakeDecoder(MediaDecoder):
    """Deterministic stand-in: 'decodes' payload bytes into stable
    pseudo-features (dimensions + a content digest + a fake embedding seeded
    by the digest), so schemas/partitioning are exercised end-to-end."""

    def __init__(self, embed_dim: int = 16):
        self.embed_dim = embed_dim

    def decode(self, payloads: list, media_types: list) -> dict:
        n = len(payloads)
        width = np.zeros(n, dtype=np.int32)
        height = np.zeros(n, dtype=np.int32)
        digest = np.zeros(n, dtype=np.int64)
        emb = np.zeros((n, self.embed_dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            p = p or b""
            d = hashlib.sha256(p).digest()
            digest[i] = int.from_bytes(d[:8], "little") & 0x7FFFFFFFFFFFFFFF
            width[i] = 16 + d[8] % 240
            height[i] = 16 + d[9] % 240
            rng = np.random.default_rng(int(digest[i]))
            emb[i] = rng.standard_normal(self.embed_dim, dtype=np.float32)
        return {"width": width, "height": height, "digest": digest, "embedding": emb}


class MediaFeatureActor:
    """Actor-pool callable: codec constructed once per actor."""

    def __init__(self, decoder_cls=DeterministicFakeDecoder, **decoder_kwargs):
        self.decoder = decoder_cls(**decoder_kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist()
        feats = self.decoder.decode(payloads, mtypes)
        emb = feats["embedding"]
        return pa.table({
            "media_id": batch["media_id"].combine_chunks(),
            "media_type": batch["media_type"].combine_chunks(),
            "byte_size": batch["byte_size"].combine_chunks(),
            "width": pa.array(feats["width"], pa.int32()),
            "height": pa.array(feats["height"], pa.int32()),
            "digest": pa.array(feats["digest"], pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), emb.shape[1]),
        })


def media_feature_stage(
    media_ds: "ray.data.Dataset",
    *,
    decoder_cls=DeterministicFakeDecoder,
    concurrency: int | None = None,
    **decoder_kwargs,
) -> "ray.data.Dataset":
    """Binary media table -> per-item features. Actor pool with small batches
    (large rows); drop the payload column immediately after decode."""
    from nhse_probabilistic_linkage_ray.stages.util import cluster_cpus

    return media_ds.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"decoder_cls": decoder_cls, **decoder_kwargs},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency or max(2, cluster_cpus() - 2),
        num_cpus=1,
        zero_copy_batch=True,
    )


def synthetic_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic binary fixture in MEDIA_SCHEMA shape."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, sizes = [], [], [], []
    for i in range(n):
        size = int(rng.integers(100, 5000))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        ids.append(i)
        types.append("image/png" if i % 3 else "audio/wav")
        payloads.append(payload)
        sizes.append(size)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "byte_size": pa.array(sizes, pa.int64()),
    })
