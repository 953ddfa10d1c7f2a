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


class NumpyMediaDecoder(MediaDecoder):
    """REAL decoders for the container formats that need no codec library:

    - ``image/x-portable-pixmap`` (binary PPM / P6): header parse + raw RGB
      frame; features = true (width, height), mean-pooled 4x4 grayscale grid
      as the 16-dim embedding (area pooling == the classic thumbnail-dedup
      feature).
    - ``audio/wav`` (PCM16 RIFF): chunk walk to the fmt/data chunks; features
      = (n_samples as width, sample_rate as height), per-segment RMS energy
      over 16 equal slices as the embedding (an audio fingerprint in the
      chromaprint spirit, energy-only).

    Anything else (png/jpeg/mp4...) raises NotImplementedError — the honest
    codec seam; at deployment those route to PIL/ffmpeg subclasses."""

    EMBED_DIM = 16

    def decode(self, payloads: list, media_types: list) -> dict:
        n = len(payloads)
        width = np.zeros(n, dtype=np.int32)
        height = np.zeros(n, dtype=np.int32)
        digest = np.zeros(n, dtype=np.int64)
        emb = np.zeros((n, self.EMBED_DIM), dtype=np.float32)
        for i, (p, mt) in enumerate(zip(payloads, media_types)):
            p = p or b""
            d = hashlib.sha256(p).digest()
            digest[i] = int.from_bytes(d[:8], "little") & 0x7FFFFFFFFFFFFFFF
            if mt == "image/x-portable-pixmap":
                w, h, e = self._decode_ppm(p)
            elif mt == "audio/wav":
                w, h, e = self._decode_wav(p)
            else:
                raise NotImplementedError(f"no codec for {mt} in this environment")
            width[i], height[i], emb[i] = w, h, e
        return {"width": width, "height": height, "digest": digest, "embedding": emb}

    @staticmethod
    def _decode_ppm(p: bytes):
        # P6 header: magic, whitespace-separated width height maxval, raw RGB
        parts = p.split(maxsplit=4)
        if len(parts) < 5 or parts[0] != b"P6":
            raise ValueError("not a binary PPM (P6) payload")
        w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
        raw = p[len(p) - w * h * 3:]
        img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        gray = img.astype(np.float32).mean(axis=2) / max(maxval, 1)
        # area mean-pool to a 4x4 grid (pad to divisible dims by edge-crop)
        gh, gw = (h // 4) * 4, (w // 4) * 4
        g = gray[:gh, :gw].reshape(4, gh // 4, 4, gw // 4).mean(axis=(1, 3))
        return w, h, g.ravel().astype(np.float32)

    @staticmethod
    def _decode_wav(p: bytes):
        if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos, rate, data = 12, 0, b""
        while pos + 8 <= len(p):
            cid = p[pos:pos + 4]
            size = int.from_bytes(p[pos + 4:pos + 8], "little")
            body = p[pos + 8:pos + 8 + size]
            if cid == b"fmt ":
                rate = int.from_bytes(body[4:8], "little")
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)
        samples = np.frombuffer(data[:len(data) // 2 * 2], dtype=np.int16) \
            .astype(np.float32) / 32768.0
        nseg = NumpyMediaDecoder.EMBED_DIM
        if len(samples) >= nseg:
            cut = len(samples) // nseg * nseg
            seg = samples[:cut].reshape(nseg, -1)
            rms = np.sqrt((seg ** 2).mean(axis=1))
        else:
            rms = np.zeros(nseg, dtype=np.float32)
        return len(samples), rate, rms.astype(np.float32)


def _parse_ppm(p: bytes):
    parts = p.split(maxsplit=4)
    if len(parts) < 5 or parts[0] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    w, h = int(parts[1]), int(parts[2])
    raw = p[len(p) - w * h * 3:]
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3), w, h


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Pure-numpy PPM resize (area-mean downsample / nearest upsample) —
    the media 'resize' transform, re-emitting a valid P6 payload."""
    img, w, h = _parse_ppm(payload)
    ys = (np.arange(out_h) * h // out_h)
    xs = (np.arange(out_w) * w // out_w)
    ye = np.maximum((np.arange(1, out_h + 1) * h) // out_h, ys + 1)
    xe = np.maximum((np.arange(1, out_w + 1) * w) // out_w, xs + 1)
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    f = img.astype(np.float32)
    for yi in range(out_h):  # out_h is the (small) TARGET height, not data-sized
        rows = f[ys[yi]:ye[yi]]
        csum = rows.mean(axis=0)
        for xi in range(out_w):
            out[yi, xi] = csum[xs[xi]:xe[xi]].mean(axis=0)
    return b"P6\n%d %d\n255\n" % (out_w, out_h) + out.tobytes()


def media_resize_stage(
    media_ds: "ray.data.Dataset", out_w: int = 64, out_h: int = 64
) -> "ray.data.Dataset":
    """Resize every PPM payload to (out_w, out_h); non-image rows pass
    through untouched. Same actor/batch shape as decode (small batches,
    payloads are fat)."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist()
        out = [resize_ppm(p, out_w, out_h)
               if mt == "image/x-portable-pixmap" else p
               for p, mt in zip(payloads, mtypes)]
        sizes = [len(p) for p in out]
        return pa.table({
            "media_id": batch["media_id"].combine_chunks(),
            "media_type": batch["media_type"].combine_chunks(),
            "payload": pa.array(out, pa.large_binary()),
            "byte_size": pa.array(sizes, pa.int64()),
        })

    return media_ds.map_batches(fn, batch_format="pyarrow",
                                batch_size=MEDIA_BATCH_SIZE, zero_copy_batch=True)


def sample_video_frames(payload: bytes, every_k: int = 2) -> list:
    """Frame-sample a 'video' payload: the codec-free container is a
    concatenated stream of P6 frames (``video/x-ppm-stream``); P6 headers are
    self-delimiting so frames parse sequentially. Returns every k-th frame's
    raw PPM bytes — the frame-sampling primitive a real video pipeline runs
    before per-frame feature extraction."""
    frames = []
    pos = 0
    while pos < len(payload):
        if payload[pos:pos + 2] != b"P6":
            raise ValueError(f"bad frame header at byte {pos}")
        # header: P6 \n w h \n maxval \n  (three whitespace-separated ints)
        j = pos + 2
        vals = []
        while len(vals) < 3:
            while payload[j:j + 1].isspace():
                j += 1
            k = j
            while not payload[k:k + 1].isspace():
                k += 1
            vals.append(int(payload[j:k]))
            j = k
        j += 1  # single whitespace after maxval
        w, h, _ = vals
        end = j + w * h * 3
        frames.append(payload[pos:end])
        pos = end
    return frames[::every_k]


class VideoFrameFeatureDecoder(NumpyMediaDecoder):
    """Video decode = frame-sample + per-frame PPM decode + temporal mean of
    the 4x4 gray-pool embeddings. width/height report the FIRST frame's
    dims; a 'frames' count is folded into the digest path upstream."""

    def __init__(self, every_k: int = 2):
        self.every_k = every_k

    def decode(self, payloads: list, media_types: list) -> dict:
        n = len(payloads)
        width = np.zeros(n, dtype=np.int32)
        height = np.zeros(n, dtype=np.int32)
        digest = np.zeros(n, dtype=np.int64)
        emb = np.zeros((n, self.EMBED_DIM), dtype=np.float32)
        for i, (p, mt) in enumerate(zip(payloads, media_types)):
            d = hashlib.sha256(p or b"").digest()
            digest[i] = int.from_bytes(d[:8], "little") & 0x7FFFFFFFFFFFFFFF
            if mt != "video/x-ppm-stream":
                if mt != "image/x-portable-pixmap":
                    raise NotImplementedError(f"no codec for {mt}")
                w, h, e = NumpyMediaDecoder._decode_ppm(p)
                width[i], height[i], emb[i] = w, h, e
                continue
            frames = sample_video_frames(p, self.every_k)
            feats = [NumpyMediaDecoder._decode_ppm(f) for f in frames]
            if feats:
                width[i], height[i] = feats[0][0], feats[0][1]
                emb[i] = np.mean([e for _w, _h, e in feats], axis=0)
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


def synthetic_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary PPM (P6) payload."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (width, height) + pixels.tobytes()


def synthetic_wav(n_samples: int, sample_rate: int = 16000, seed: int = 0) -> bytes:
    """Deterministic PCM16 mono RIFF/WAVE payload."""
    rng = np.random.default_rng(seed)
    samples = (rng.standard_normal(n_samples) * 8000).astype(np.int16)
    data = samples.tobytes()
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    chunks = fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def synthetic_decodable_media_table(n: int = 24, seed: int = 42) -> pa.Table:
    """Fixture of REAL decodable payloads (PPM images + WAV audio)."""
    rng = np.random.default_rng(seed)
    ids, types, payloads, sizes = [], [], [], []
    for i in range(n):
        if i % 2:
            w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
            payload = synthetic_ppm(w, h, seed=i)
            types.append("image/x-portable-pixmap")
        else:
            payload = synthetic_wav(int(rng.integers(500, 4000)), seed=i)
            types.append("audio/wav")
        ids.append(i)
        payloads.append(payload)
        sizes.append(len(payload))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "byte_size": pa.array(sizes, pa.int64()),
    })


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
