"""Content + identity hashing kernels.

Analog of the reference's synthetic-id and equality machinery:

- ``file_id`` replaces Spark's ``monotonically_increasing_id`` at
  ``/root/reference/utils/dataset_ingestion_utils.py:141,450``. Spark's id is
  partition-dependent; ours is a *deterministic* 64-bit hash of
  (repo, path, commit) so ids are stable across cluster sizes and resumes
  (SURVEY.md M20 design note). At true 10^12-file scale a 128-bit id would be
  used to keep birthday collisions negligible; the engine treats the id as an
  opaque uint64 key so widening it is a localized change.
- ``content_sha256`` is the per-row invariant pinned by BASELINE.json: sha256
  of the raw (un-normalized) content must be preserved through the pipeline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_U64 = np.uint64

# splitmix64 constants — public-domain finalizer (Steele et al., used by
# java.util.SplittableRandom); standard choice for avalanche mixing.
_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: avalanches a uint64 array in place-ish."""
    x = x.astype(_U64, copy=True)
    x += _SM_GAMMA
    x ^= x >> _U64(30)
    x *= _SM_M1
    x ^= x >> _U64(27)
    x *= _SM_M2
    x ^= x >> _U64(31)
    return x


def hash_strings_u64(values: list | np.ndarray) -> np.ndarray:
    """uint64 blake2b hash per string. Python loop, but only ever applied to
    *unique* vocabulary entries per batch (see shingle.py), never per token."""
    out = np.empty(len(values), dtype=_U64)
    h = hashlib.blake2b
    for i, v in enumerate(values):
        out[i] = int.from_bytes(h(v.encode("utf-8", "surrogatepass"), digest_size=8).digest(), "little")
    return out


def sha256_bytes(content: str | bytes) -> bytes:
    if isinstance(content, str):
        content = content.encode("utf-8", "surrogatepass")
    return hashlib.sha256(content).digest()


def sha256_hex_column(contents: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Per-row sha256 hex of a string column. hashlib releases the GIL-light
    C path; this runs once at ingest only."""
    vals = contents.to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(None)
        else:
            out.append(hashlib.sha256(v.encode("utf-8", "surrogatepass")).hexdigest())
    return pa.array(out, type=pa.string())


def file_id_column(repo: pa.Array, path: pa.Array, commit: pa.Array) -> np.ndarray:
    """Deterministic int64 id = first 63 bits of sha256(repo\\x00path\\x00commit),
    kept positive so numpy / Arrow / DuckDB / Python all agree on ordering
    (cluster_id = min(member id) must be identical everywhere).

    Replaces monotonically_increasing_id (SURVEY.md M20): identical ids at any
    parallelism level, any resume point. int64 (not uint64) because shuffle
    keys must stay a native Arrow/pandas dtype end-to-end.
    """
    r, p, c = repo.to_pylist(), path.to_pylist(), commit.to_pylist()
    out = np.empty(len(r), dtype=np.int64)
    for i in range(len(r)):
        d = hashlib.sha256(
            (r[i] or "").encode() + b"\x00" + (p[i] or "").encode() + b"\x00" + (c[i] or "").encode()
        ).digest()
        out[i] = int.from_bytes(d[:8], "little") & 0x7FFFFFFFFFFFFFFF
    return out


def fixed_prefix_keys(col: pa.Array | pa.ChunkedArray, nbytes: int) -> np.ndarray:
    """First ``nbytes`` bytes of every string in a null-free Arrow string
    column as a numpy fixed-width bytes array (dtype ``S{nbytes}``) — a
    sortable, searchsorted-able key with zero per-row Python objects.

    Built straight from the column's offsets/data buffers (the repo's
    buffer-level pattern, cf. score._binary_to_flat). Every value must be at
    least ``nbytes`` long (asserted); group keys are fixed-width digests so
    this always holds where it's used.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype=f"S{nbytes}")
    assert col.null_count == 0
    bufs = col.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(bufs[1], off_dtype)[col.offset: col.offset + len(col) + 1]
    assert int(np.diff(offs).min()) >= nbytes, "string shorter than key width"
    data = np.frombuffer(bufs[2], np.uint8)
    idx = offs[:-1].astype(np.int64)[:, None] + np.arange(nbytes)
    return np.ascontiguousarray(data[idx]).view(f"S{nbytes}").ravel()


def hash_pair_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive mix of two uint64 arrays into one (used for edge-set
    checksums in the connected-components convergence test)."""
    return mix64(a.astype(_U64) * _U64(0x9E3779B97F4A7C15) ^ mix64(b.astype(_U64)))


def pair_keys_v16(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Canonical unordered (min,max) int64 pairs packed as a fixed-width
    16-byte void array — sortable / searchsorted-able with EXACT equality
    (memcmp, no hashing), the vectorized replacement for per-row
    ``(l, r) in truth_set`` probes (VERDICT r2 fix #8)."""
    m = np.empty((len(left), 2), np.int64)
    np.minimum(left, right, out=m[:, 0])
    np.maximum(left, right, out=m[:, 1])
    return np.ascontiguousarray(m).view("V16").ravel()


def sorted_pair_keys(pairs) -> np.ndarray:
    """Iterable of (u, v) int pairs -> sorted canonical V16 key array for
    broadcast + ``pair_member_mask`` probing."""
    arr = np.asarray(list(pairs) if not isinstance(pairs, np.ndarray) else pairs,
                     dtype=np.int64).reshape(-1, 2)
    return np.sort(pair_keys_v16(arr[:, 0], arr[:, 1]))


def pair_member_mask(sorted_keys: np.ndarray, left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Vectorized membership of each (left, right) pair (order-insensitive)
    in a ``sorted_pair_keys`` array."""
    if len(sorted_keys) == 0:
        return np.zeros(len(left), dtype=bool)
    k = pair_keys_v16(left, right)
    i = np.minimum(np.searchsorted(sorted_keys, k), len(sorted_keys) - 1)
    return sorted_keys[i] == k


def stable_bucket(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic hash bucket for partitioned joins / salting — replaces
    the reference's rand()-bucket subsampling (SURVEY.md O2: hash-based, never
    order-dependent RNG)."""
    return (mix64(ids.astype(_U64)) % _U64(num_buckets)).astype(np.int64)
