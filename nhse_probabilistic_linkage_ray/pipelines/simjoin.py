"""Exact set-similarity self-join via prefix filtering (AllPairs-style).

The scale-safe form of the word/n-gram Jaccard pair operator: unlike the
bounded oracle-parity query ``q_word_jaccard_pairs`` (driver-side all-pairs by
contract) this is EXACT at any scale with no quadratic stage and no driver
materialization of the corpus.

Algorithm (public literature: Bayardo/Ma/Srikant, "Scaling Up All Pairs
Similarity Search", WWW'07; Chaudhuri/Ganti/Kaushik SSJoin; Xiao et al.
PPJoin): impose one global total order on tokens (ascending document
frequency — rarest first — so hot tokens land at the ends of prefixes and
candidate groups stay small). For Jaccard threshold t, any pair with
jaccard >= t must share a token inside each side's PREFIX of length
``n - ceil(t*n) + 1`` under that order, so grouping docs by prefix token
yields a COMPLETE candidate set; an exact merge-intersect verify then keeps
the true pairs. Completeness does not depend on the order chosen — a
frequency-blind fallback order (raw token hash) is used when the vocabulary
exceeds the broadcast limit, trading candidate-count optimality, never
correctness.

Ray shape: tokenize (map_batches, dictionary-encoded hashing) -> token df
(narrow groupby over exploded uint64 tokens) -> prefix emission (vectorized,
broadcast rank map) -> the shared sort+segment-scan pair engine
(stages/candidates.pairs_from_bands, caps disabled: capping would break
exactness) -> broadcast verify against the token table's own Arrow blocks
(the stages/score.py zero-copy pattern).

Reference parity: generalizes the token-intersect comparison level
(array_intersect/size at /root/reference/utils/parameter_lists.py:33,41)
from a per-candidate-pair predicate into a standalone exact similarity-join
operator.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray
import ray.data

from nhse_probabilistic_linkage_ray.functions.hashing import hash_strings_u64
from nhse_probabilistic_linkage_ray.functions.jaccard import jaccard_flat
from nhse_probabilistic_linkage_ray.stages.candidates import pairs_from_bands

_WORD = re.compile(r"\w+")

# df ranks are broadcast (ray.put once, read per worker) below this vocab
# size; above it the hash-order fallback keeps the join exact with zero
# driver residency (see module docstring)
VOCAB_BROADCAST_LIMIT = 4_000_000

_NO_CAP = 1 << 31


def word_token_table(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """(doc_id, text) -> (doc_id, n_tokens, tokens: list<uint64>) with tokens
    the sorted-unique hashes of the doc's distinct lowercase ``\\w+`` words
    (the q_word_jaccard_pairs / SQL ``list_distinct(regexp_extract_all(
    lower(text), '\\w+'))`` tokenization). Zero-token docs are dropped — the
    join contract excludes them (stated in the oracle SQL too)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        per_doc = [sorted(set(_WORD.findall((t or "").lower()))) for t in texts]
        counts = np.fromiter((len(w) for w in per_doc), dtype=np.int64, count=len(per_doc))
        flat = [w for ws in per_doc for w in ws]
        if flat:
            # hash only the batch-local dictionary, gather through indices
            enc = pa.array(flat, pa.string()).dictionary_encode()
            vh = hash_strings_u64(enc.dictionary.to_pylist())
            flat_h = vh[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        else:
            flat_h = np.empty(0, np.uint64)
        # per-row ascending hash order (jaccard_sorted's merge-intersect needs it)
        row_ids = np.repeat(np.arange(len(per_doc)), counts)
        order = np.lexsort((flat_h, row_ids))
        offsets = np.zeros(len(per_doc) + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        tokens = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(flat_h[order], pa.uint64()))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "n_tokens": pa.array(counts, pa.int64()),
                      "tokens": tokens})
        return t.filter(pa.array(counts > 0))

    return docs_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _token_df(toks_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Document frequency per token: one narrow groupby over the exploded
    (token) column — 8-byte rows, the only all-to-all this stage adds."""
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        col = batch["tokens"].combine_chunks()
        vals = np.asarray(col.values, dtype=np.uint64)
        return pa.table({"token": pa.array(vals.view(np.int64), pa.int64())})

    return toks_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("token").aggregate(Count(alias_name="df"))


def _rank_ref(toks_ds: "ray.data.Dataset"):
    """ray.put((vocab_hashes_sorted, rank)) where rank[i] is vocab i's
    position under (df asc, hash asc) — the global prefix order. Returns
    None (hash-order fallback) for vocabularies above the broadcast limit."""
    df_ds = _token_df(toks_ds)
    if df_ds.count() > VOCAB_BROADCAST_LIMIT:
        return None
    toks, dfs = [], []
    for b in df_ds.iter_batches(batch_format="pyarrow"):
        toks.append(b["token"].to_numpy(zero_copy_only=False))
        dfs.append(b["df"].to_numpy(zero_copy_only=False))
    vocab = np.concatenate(toks).view(np.uint64)
    df = np.concatenate(dfs)
    by_hash = np.argsort(vocab)
    vocab, df = vocab[by_hash], df[by_hash]
    perm = np.lexsort((vocab, df))          # df asc, hash tiebreak
    rank = np.empty(len(vocab), np.int64)
    rank[perm] = np.arange(len(vocab))
    return ray.put((vocab, rank))


def _prefix_bands(toks_ds: "ray.data.Dataset", threshold: float, rank_ref) -> "ray.data.Dataset":
    """Emit (band_hash=token, file_id=doc_id, band_idx=0) rows for each doc's
    prefix tokens: the first ``n - ceil(t*n) + 1`` tokens under the global
    order. Fully vectorized — one lexsort + offset arithmetic per batch."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        col = batch["tokens"].combine_chunks()
        vals = np.asarray(col.values, dtype=np.uint64)
        offs = np.asarray(col.offsets, dtype=np.int64)
        counts = np.diff(offs)
        row_ids = np.repeat(np.arange(len(ids)), counts)
        if rank_ref is not None:
            vocab, rank = ray.get(rank_ref)
            key = rank[np.searchsorted(vocab, vals)]
            vals_o = vals[np.lexsort((key, row_ids))]
        else:
            vals_o = vals  # already hash-sorted within each row
        # ceil with a safety epsilon DOWN: an over-long prefix is still
        # complete, an under-long one is not
        p = counts - np.ceil(threshold * counts - 1e-9).astype(np.int64) + 1
        pos = np.arange(len(vals)) - np.repeat(offs[:-1], counts)
        mask = pos < np.repeat(p, counts)
        return pa.table({
            "band_hash": pa.array(vals_o[mask].view(np.int64), pa.int64()),
            "file_id": pa.array(np.repeat(ids, counts)[mask].astype(np.int64), pa.int64()),
            "band_idx": pa.array(np.zeros(int(mask.sum()), np.int32), pa.int32()),
        })

    return toks_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class _TokenIndex:
    """doc_id -> sorted-unique token view over the token table's own Arrow
    blocks (zero-copy; the stages/score.FeatureIndex pattern)."""

    def __init__(self, blocks: list):
        views = []
        fids = []
        for b in blocks:
            if not len(b):
                continue
            col = b["tokens"].combine_chunks()
            views.append((np.asarray(col.values, dtype=np.uint64),
                          np.asarray(col.offsets, dtype=np.int64)))
            fids.append(b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        self.views = views
        if not fids:
            self.sorted_fid = np.empty(0, np.int64)
            self.sorted_loc = np.empty((0, 2), np.int64)
            return
        all_fid = np.concatenate(fids)
        loc = np.empty((len(all_fid), 2), np.int64)
        loc[:, 0] = np.repeat(np.arange(len(fids)), [len(f) for f in fids])
        loc[:, 1] = np.concatenate([np.arange(len(f)) for f in fids])
        order = np.argsort(all_fid, kind="stable")
        self.sorted_fid = all_fid[order]
        self.sorted_loc = loc[order]

    def get(self, fid: int) -> np.ndarray:
        i = int(np.searchsorted(self.sorted_fid, fid))
        b, r = self.sorted_loc[i]
        vals, offs = self.views[b]
        return vals[offs[r]:offs[r + 1]]

    def gather_flat(self, ids: np.ndarray):
        """Vectorized ragged gather: token sets of ``ids`` as one flat uint64
        array + offsets — one searchsorted for the whole batch, one fancy-index
        copy per source block, no per-row Python."""
        n = len(ids)
        i = np.minimum(np.searchsorted(self.sorted_fid, ids),
                       max(len(self.sorted_fid) - 1, 0))
        if len(self.sorted_fid) == 0 or not np.array_equal(self.sorted_fid[i], ids):
            raise KeyError("doc_id missing from token index")
        locs = self.sorted_loc[i]
        b_arr, r_arr = locs[:, 0], locs[:, 1]
        lens = np.empty(n, np.int64)
        for b in np.unique(b_arr):
            m = b_arr == b
            _, offs = self.views[b]
            lens[m] = offs[r_arr[m] + 1] - offs[r_arr[m]]
        out_offs = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=out_offs[1:])
        flat = np.empty(out_offs[-1], np.uint64)
        for b in np.unique(b_arr):
            m = np.flatnonzero(b_arr == b)
            vals, offs = self.views[b]
            rl = lens[m]
            tot = int(rl.sum())
            if tot == 0:
                continue
            within = np.arange(tot, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(rl)[:-1])), rl)
            src = np.repeat(offs[r_arr[m]], rl) + within
            dst = np.repeat(out_offs[m], rl) + within
            flat[dst] = vals[src]
        return flat, out_offs


_VERIFY_CACHE: dict = {}


def _verify_task(batch: pa.Table, block_refs: tuple, threshold: float, cache_key: str) -> pa.Table:
    idx = _VERIFY_CACHE.get(cache_key)
    if idx is None:
        idx = _TokenIndex(ray.get(list(block_refs)))
        _VERIFY_CACHE.clear()
        _VERIFY_CACHE[cache_key] = idx
    left = batch["left_id"].to_numpy(zero_copy_only=False)
    right = batch["right_id"].to_numpy(zero_copy_only=False)
    lf, lo = idx.gather_flat(left)
    rf, ro = idx.gather_flat(right)
    jac = jaccard_flat(lf, lo, rf, ro)
    keep = jac >= threshold
    return pa.table({
        "left_id": pa.array(left[keep], pa.int64()),
        "right_id": pa.array(right[keep], pa.int64()),
        "jaccard": pa.array(np.round(jac[keep], 6), pa.float64()),
    })


def jaccard_similarity_join(
    docs_ds: "ray.data.Dataset", threshold: float = 0.5
) -> "ray.data.Dataset":
    """All pairs of documents with word-set Jaccard >= threshold — exact,
    with prefix-filtered candidate generation (no quadratic stage).
    Output: (left_id, right_id, jaccard) with left_id < right_id."""
    import uuid

    toks = word_token_table(docs_ds).materialize()
    rank_ref = _rank_ref(toks)
    bands = _prefix_bands(toks, threshold, rank_ref)
    # caps disabled: star-capping trades pairs for provenance in the LSH
    # pipeline, but here every candidate must be verified or exactness is lost
    pairs = pairs_from_bands(bands, _NO_CAP, _NO_CAP)
    block_refs = tuple(r[0] if isinstance(r, tuple) else r for r in toks.to_arrow_refs())
    return pairs.map_batches(
        _verify_task,
        fn_kwargs={"block_refs": block_refs, "threshold": threshold,
                   "cache_key": uuid.uuid4().hex},
        batch_format="pyarrow",
        batch_size=8192,
        zero_copy_batch=True,
    ).select_columns(["left_id", "right_id", "jaccard"])
