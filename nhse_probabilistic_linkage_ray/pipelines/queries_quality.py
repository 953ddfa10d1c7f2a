"""Training-data quality screens over the documents table.

Two first-class LLM-pipeline operators beyond the reference's own surface
(SURVEY.md §2-beyond; same family as the textstats queries):

- ``q_contamination_ngram_overlap`` — benchmark-contamination screening: the
  fraction of each training document's distinct word n-grams that appear in a
  held-out benchmark set (the standard n-gram decontamination check run
  before LLM training). The "benchmark" is a deterministic slice of the
  corpus itself (doc_id % bench_mod == 0) so the operator needs no external
  data; in production the benchmark grams come from the eval suites and are
  orders of magnitude smaller than the corpus — the broadcast contract below.

- ``q_repetition_stats`` — Gopher-style repetition quality signals (Rae et
  al. 2021, "Scaling Language Models", Table A1): per-document duplicate-line
  fraction and top-bigram fraction, the two cheapest of the repetition
  filters used to drop boilerplate/spam before training.

Both stream the corpus through stateless vectorized ``map_batches`` (Arrow
RE2 kernels + numpy segment scans — no per-row Python in the hot path) and
have exact DuckDB oracles (pipelines/queries.py). Word tokenization is
RE2 ``\\w+`` over ``lower(text)`` on BOTH sides (Arrow and DuckDB both use
RE2, so ``\\w`` is ASCII on both — the ADVICE-r2 parity caveat does not
apply here). Gram/line identity is compared through 64-bit hashes of the
vectorized kernels; as with ``substring_gram_pairs``, a false hit needs a
blake2b-64 collision (~2^-64 per gram pair) — negligible at any real scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from nhse_probabilistic_linkage_ray.functions.hashing import hash_strings_u64, mix64
from nhse_probabilistic_linkage_ray.functions.shingle import shingle_hashes
from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import _docs

_U64 = np.uint64
# positional multipliers for the bigram combine (distinct from shingle's
# _POS_MULT so a k=2 shingle and a bigram never collide by construction)
_BG_M0 = _U64(0xA0761D6478BD642F)
_BG_M1 = _U64(0xE7037ED1A0B428DB)


def word_hashes_column(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """``\\w+`` word-hash sequences per row, fully vectorized.

    Arrow RE2 split on ``\\W+`` over ``lower(text)`` (== DuckDB
    ``regexp_extract_all(lower(text), '\\w+')`` after dropping the empty
    fragments the split form produces at punctuation boundaries), then one
    dictionary-encode so only the unique vocabulary is hashed in Python.
    Returns (flat: uint64[N], offsets: int64[rows+1]) in document order with
    duplicates preserved — the same layout as ``token_hashes_batch``.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(pc.fill_null(col, ""))
    lists = pc.split_pattern_regex(lowered, pattern=r"\W+")
    raw_offs = np.asarray(lists.offsets, dtype=np.int64)
    raw_offs = raw_offs - raw_offs[0]  # sliced batches: offsets don't start at 0
    flat_vals = lists.flatten()
    if len(flat_vals) == 0:
        return np.empty(0, dtype=_U64), np.zeros(len(lists) + 1, dtype=np.int64)
    nonempty = pc.greater(pc.utf8_length(flat_vals), 0)
    mask = nonempty.to_numpy(zero_copy_only=False)
    # every row yields >= 1 raw fragment (splitting "" gives [""]), so the
    # reduceat start indices are strictly increasing and safe
    kept_counts = np.add.reduceat(mask.astype(np.int64), raw_offs[:-1])
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=offsets[1:])
    kept = flat_vals.filter(nonempty)
    if len(kept) == 0:
        return np.empty(0, dtype=_U64), offsets
    enc = kept.dictionary_encode()
    vocab = hash_strings_u64(enc.dictionary.to_pylist())
    inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return vocab[inv], offsets


def q_contamination_ngram_overlap(sf_dir: str, gram_len: int = 8, bench_mod: int = 50):
    """Per non-benchmark document: distinct word ``gram_len``-grams, how many
    occur in the benchmark slice (doc_id % bench_mod == 0), and the overlap
    fraction — the n-gram decontamination screen.

    Plan: one streaming pass extracts the benchmark slice's distinct gram
    hashes (the benchmark side is small BY CONTRACT — eval suites vs a
    training corpus — so it broadcasts via ray.put, the repo's standard
    small-side pattern); a second streaming pass computes each corpus
    document's distinct grams (``shingle_hashes`` = sorted-unique per row)
    and counts membership with one vectorized searchsorted per batch. The
    corpus is never materialized."""

    def bench_grams(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(did % bench_mod == 0))
        flat, offs = word_hashes_column(sub["text"])
        sh, _ = shingle_hashes(flat, offs, gram_len)
        return pa.table({"g": pa.array(np.unique(sh).view(np.int64), pa.int64())})

    docs = _docs(sf_dir, ["doc_id", "text"])
    parts = [b["g"].to_numpy(zero_copy_only=False).view(_U64)
             for b in docs.map_batches(bench_grams, batch_format="pyarrow",
                                       zero_copy_batch=True)
                          .iter_batches(batch_format="pyarrow")]
    bench = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, dtype=_U64))
    bench_ref = ray.put(bench)

    def overlap(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(did % bench_mod != 0))
        flat, offs = word_hashes_column(sub["text"])
        sh, so = shingle_hashes(flat, offs, gram_len)
        counts = np.diff(so)
        if len(bench) and len(sh):
            idx = np.minimum(np.searchsorted(bench, sh), len(bench) - 1)
            hit = bench[idx] == sh
        else:
            hit = np.zeros(len(sh), dtype=bool)
        rows_idx = np.repeat(np.arange(len(counts)), counts)
        n_hit = np.bincount(rows_idx, weights=hit,
                            minlength=len(counts)).astype(np.int64)
        frac = np.round(np.divide(n_hit, counts, out=np.zeros(len(counts)),
                                  where=counts > 0), 6)
        return pa.table({
            "doc_id": sub["doc_id"],
            "n_grams": pa.array(counts, pa.int64()),
            "n_hit": pa.array(n_hit, pa.int64()),
            "overlap_frac": pa.array(frac, pa.float64()),
        })

    return docs.map_batches(overlap, batch_format="pyarrow", zero_copy_batch=True)


def q_stratified_sample_per_lang(sf_dir: str, k: int = 20):
    """Deterministic stratified sample: the ``k`` documents per language with
    the smallest ``md5(doc_id)`` — hash-ordered so the sample is stable
    across runs and machines (the curation analog of the reference's
    seeded training-data subsample, SURVEY.md O2/O3, recast without RNG
    state). Returns (lang, doc_id, rn) with rn = 1-based rank in the
    stratum's hash order.

    Scale plan: a per-batch PARTIAL top-k per language (combiner) bounds the
    exchanged rows to k x n_langs x n_blocks regardless of corpus size —
    top-k is associative, so the final exact pass runs over that bounded
    candidate set on one partition (same bounded-reduce contract as the pair
    engine's boundary pass). No global sort of the corpus, no per-group
    pandas. A giant-stratum skew cannot occur: every batch contributes at
    most k rows per language."""
    import hashlib as _hl

    def _topk(langs: np.ndarray, md5s: np.ndarray, dids: np.ndarray):
        """Indices of the <= k smallest (md5, doc_id) rows per lang value."""
        order = np.lexsort((dids, md5s, langs))
        sl = langs[order]
        new = np.ones(len(sl), dtype=bool)
        new[1:] = sl[1:] != sl[:-1]
        starts = np.flatnonzero(new)
        rank = np.arange(len(sl)) - np.repeat(starts, np.diff(np.append(starts, len(sl))))
        return order[rank < k], rank[rank < k]

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "md5h": pa.array([], pa.string())})
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        md5s = np.array([_hl.md5(str(i).encode()).hexdigest() for i in did],
                        dtype="S32")
        langs = np.asarray(batch["lang"].to_pylist(), dtype="S32")
        keep, _ = _topk(langs, md5s, did)
        sub = batch.take(pa.array(keep, pa.int64()))
        return pa.table({
            "lang": sub["lang"],
            "doc_id": sub["doc_id"],
            "md5h": pa.array([m.decode() for m in md5s[keep]], pa.string()),
        })

    def final(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64())})
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        md5s = np.asarray(batch["md5h"].to_pylist(), dtype="S32")
        langs = np.asarray(batch["lang"].to_pylist(), dtype="S32")
        keep, rank = _topk(langs, md5s, did)
        sub = batch.take(pa.array(keep, pa.int64()))
        return pa.table({
            "lang": sub["lang"],
            "doc_id": sub["doc_id"],
            "rn": pa.array(rank + 1, pa.int64()),
        })

    cand = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    # candidate set is <= k x n_langs x n_blocks rows BY CONSTRUCTION — the
    # single-partition exact pass is a bounded reduce, not a materialization
    return cand.repartition(1).map_batches(final, batch_format="pyarrow")


# PII / secret patterns: pure-RE2 (no backrefs/lookaround), so the Arrow
# kernels and the DuckDB oracle run the IDENTICAL engine — exact parity on
# any corpus. Counts are taken on the ORIGINAL text; redaction is applied
# sequentially (emails, then hex secrets) — both sides share that contract.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SECRET_RE = r"\b[0-9a-fA-F]{32,}\b"


def q_pii_redaction(sf_dir: str):
    """PII / credential scrubbing screen: per document, how many email
    addresses and long-hex secrets (32+ hex chars — API keys, tokens,
    md5/sha hashes) appear, plus the redacted text with each replaced by a
    typed placeholder. The standard pre-training scrub (e.g. BigCode/The
    Stack PII pipeline shape) expressed as a stateless vectorized
    map_batches — Arrow RE2 kernels only, no per-row Python."""

    def redact(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        n_emails = pc.count_substring_regex(text, pattern=EMAIL_RE)
        n_secrets = pc.count_substring_regex(text, pattern=SECRET_RE)
        red = pc.replace_substring_regex(text, pattern=EMAIL_RE,
                                         replacement="<EMAIL>")
        red = pc.replace_substring_regex(red, pattern=SECRET_RE,
                                         replacement="<SECRET>")
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_secrets": pc.cast(n_secrets, pa.int64()),
            "redacted": red,
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        redact, batch_format="pyarrow", zero_copy_batch=True)


DUP_LINE_BROADCAST_LIMIT = 50_000_000


def _binary_col_to_flat_i64(col) -> tuple:
    """(flat int64 values, per-row element offsets) views over a
    (large_)binary column's buffers; null rows read as empty (zero-copy —
    the score stage's packed-payload layout, score.py:_binary_to_flat)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        arr = pc.fill_null(arr, b"")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    width = np.int64 if arr.type == pa.large_binary() else np.int32
    byte_offs = np.frombuffer(bufs[1], width)[arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    if len(arr) == 0 or bufs[2] is None:
        return np.empty(0, np.int64), np.zeros(len(arr) + 1, np.int64)
    raw = np.frombuffer(bufs[2], np.uint8)
    seg = raw[byte_offs[0]:byte_offs[-1]]
    return seg.view(np.int64), (byte_offs - byte_offs[0]) // 8


def q_line_dedup_global(sf_dir: str, strategy: str = "auto"):
    """Corpus-wide exact duplicated-line removal (the CCNet / RefinedWeb
    paragraph-dedup shape): a line is dropped when its exact text occurs
    more than once across the ENTIRE corpus (multiplicity counted within a
    document too); per document the survivor lines are re-joined in order.

    Plan: pass 1 streams per-batch PARTIAL line-hash counts (np.unique
    combiner — the shuffle moves per-batch line vocabularies, not the raw
    line stream) through one groupby-sum. Two membership strategies
    (VERDICT r4 #2 — both real, auto-switched on the measured vocabulary):

    - **broadcast** (vocabulary <= DUP_LINE_BROADCAST_LIMIT): duplicated
      hashes come to the driver once, ``ray.put``, and pass 2 re-streams
      the corpus membership-checking each line with one vectorized
      searchsorted — the common case (boilerplate lines are sublinear in
      corpus size).
    - **join** (above the limit — the 100-TB regime): lines explode to a
      NARROW (doc_id, line_idx, h) stream that inner-joins the duplicated
      vocabulary hash-partitioned on the line hash (the repo's J7 pattern);
      hits pack per doc into an int64 drop-list (binary payload, the score
      stage's packed layout) and ONE hash join on doc_id brings them to the
      documents, which rebuild exactly as the broadcast path does. The fat
      text moves through one shuffle — the honest cost of exceeding every
      node's memory; per-group Python touches only the narrow per-doc hit
      lists.

    Outputs are byte-identical between strategies (same hashes -> same keep
    mask -> same rebuild). Line identity is blake2b-64; a false drop needs
    a 64-bit collision between two distinct corpus lines (negligible; same
    contract as substring_gram_pairs)."""

    def _line_hashes(text: pa.Array | pa.ChunkedArray):
        """(flat line values, per-row int64 offsets, uint64 hashes)."""
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        lines = pc.split_pattern(text, pattern="\n")
        offs = np.asarray(lines.offsets, dtype=np.int64)
        offs = offs - offs[0]  # sliced batches
        flat = lines.flatten()
        if len(flat) == 0:
            return flat, offs, np.empty(0, dtype=_U64)
        enc = flat.dictionary_encode()
        vocab = hash_strings_u64(enc.dictionary.to_pylist())
        h = vocab[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        return flat, offs, h

    def partial_counts(batch: pa.Table) -> pa.Table:
        _, _, h = _line_hashes(batch["text"])
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table({"h": pa.array(uniq.view(np.int64), pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    docs = _docs(sf_dir, ["doc_id", "text"])
    # duplicated-vocab dataset, materialized ONCE: both strategies read it
    # (count is then free metadata, and the broadcast pull re-reads blocks
    # instead of re-running the groupby)
    counted = docs.map_batches(partial_counts, batch_format="pyarrow",
                               zero_copy_batch=True).groupby("h").sum("n")
    dup_ds = counted.map_batches(
        lambda t: (t.filter(pa.array(
            t["sum(n)"].to_numpy(zero_copy_only=False) >= 2)).select(["h"])
            if len(t) and "h" in t.column_names
            else pa.table({"h": pa.array([], pa.int64())})),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_dup = dup_ds.count()
    if strategy == "auto":
        strategy = "broadcast" if n_dup <= DUP_LINE_BROADCAST_LIMIT else "join"
    if n_dup == 0:
        # nothing to drop anywhere — either strategy degenerates to a pass
        # through (and an all-empty vocab dataset has only degenerate
        # zero-column blocks, which a hash join cannot consume)
        strategy = "broadcast"

    def _rebuild(batch: pa.Table, flat, offs, h, keep) -> pa.Table:
        n_lines = np.diff(offs)
        # every row yields >= 1 line (splitting "" gives [""]) so the
        # reduceat start indices are strictly increasing and safe
        n_kept = (np.add.reduceat(keep.astype(np.int64), offs[:-1])
                  if len(h) else np.zeros(len(batch), np.int64))
        kept_offs = np.zeros(len(batch) + 1, dtype=np.int64)
        np.cumsum(n_kept, out=kept_offs[1:])
        kept_flat = flat.filter(pa.array(keep)) if len(h) else flat
        kept_lists = pa.ListArray.from_arrays(
            pa.array(kept_offs, pa.int32()), kept_flat)
        cleaned = pc.binary_join(kept_lists, "\n")
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "cleaned": cleaned,
        })

    if strategy == "broadcast":
        dup_parts = [b["h"].to_numpy(zero_copy_only=False).view(_U64)
                     for b in dup_ds.iter_batches(batch_format="pyarrow")
                     if len(b)]
        dup = np.sort(np.concatenate(dup_parts)) if dup_parts else np.empty(0, _U64)
        dup_ref = ray.put(dup)

        def clean(batch: pa.Table) -> pa.Table:
            dup = ray.get(dup_ref)
            flat, offs, h = _line_hashes(batch["text"])
            if len(dup) and len(h):
                idx = np.minimum(np.searchsorted(dup, h), len(dup) - 1)
                keep = dup[idx] != h
            else:
                keep = np.ones(len(h), dtype=bool)
            return _rebuild(batch, flat, offs, h, keep)

        return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)

    # ---- hash-partitioned join path (vocabulary too large to broadcast) ----
    from nhse_probabilistic_linkage_ray.config import PipelineConfig
    from nhse_probabilistic_linkage_ray.stages.cluster import join_partitions

    cfg = PipelineConfig()

    def explode_lines(batch: pa.Table) -> pa.Table:
        _, offs, h = _line_hashes(batch["text"])
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_lines = np.diff(offs)
        tot = int(offs[-1])
        line_idx = np.arange(tot, dtype=np.int64) - np.repeat(offs[:-1], n_lines)
        return pa.table({
            "doc_id": pa.array(np.repeat(did, n_lines), pa.int64()),
            "line_idx": pa.array(line_idx, pa.int64()),
            "h": pa.array(h.view(np.int64), pa.int64()),
        })

    k = join_partitions(cfg, rows=n_dup)
    # groupby/map_groups outputs carry zero-column EMPTY partitions (the
    # repo's known degenerate-schema contract) which Acero's hash join
    # rejects; a narrow repartition normalizes the block schemas
    hits = docs.map_batches(explode_lines, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .join(dup_ds.repartition(k).materialize(), join_type="inner",
              num_partitions=k, on=("h",))

    def pack(group: pa.Table) -> pa.Table:
        idx = np.sort(group["line_idx"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({
            "doc_id": group["doc_id"].slice(0, 1),
            "drop_bin": pa.array([idx.tobytes()], pa.large_binary()),
        })

    droplists = hits.select_columns(["doc_id", "line_idx"]) \
        .groupby("doc_id").map_groups(pack, batch_format="pyarrow")
    joined = docs.join(droplists.repartition(k).materialize(), join_type="left_outer",
                       num_partitions=k, on=("doc_id",))

    def clean_joined(batch: pa.Table) -> pa.Table:
        flat, offs, h = _line_hashes(batch["text"])
        keep = np.ones(len(h), dtype=bool)
        if "drop_bin" in batch.column_names and len(batch):
            dflat, doffs = _binary_col_to_flat_i64(batch["drop_bin"])
            per_row = np.diff(doffs)
            row_of = np.repeat(np.arange(len(batch), dtype=np.int64), per_row)
            if len(dflat):
                keep[offs[:-1][row_of] + dflat] = False
        return _rebuild(batch.select(["doc_id", "text"]), flat, offs, h, keep)

    return joined.map_batches(clean_joined, batch_format="pyarrow")


def q_sequence_packing(sf_dir: str, budget: int = 2048):
    """Fixed-boundary sequence packing: documents in doc_id order are packed
    into training chunks of ``budget`` whitespace tokens;
    ``chunk_id = floor(tokens_before_this_doc / budget)`` — the
    deterministic, order-stable contract (a doc that straddles a boundary
    belongs to the chunk it started in).

    This is a distributed prefix-scan, which the Dataset API cannot express
    directly (SURVEY.md's "drop to raw Ray tasks only where Dataset can't"):
    the NARROW (doc_id, n_tokens) table is range-sorted by doc_id, then one
    tiny remote task per block computes its token sum (block sums are
    n_blocks numbers — the only thing the driver ever holds), the driver
    prefix-sums them into per-block offsets, and one remote task per block
    adds its offset to the block's internal cumsum. The fat text column
    never moves; output re-enters Ray Data via from_arrow_refs, still one
    block per input block."""
    from nhse_probabilistic_linkage_ray.functions import textstats

    def tokens(batch: pa.Table) -> pa.Table:
        n = textstats.token_count_ws(batch["text"].to_pylist())
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "n_tokens": pa.array(n, pa.int64()),
        })

    narrow = (_docs(sf_dir, ["doc_id", "text"])
              .map_batches(tokens, batch_format="pyarrow")
              .sort("doc_id")
              .materialize())

    # empty range-sort partitions carry a degenerate schema (no columns) —
    # the repo's known empty-partition contract; both tasks guard for it
    @ray.remote(num_cpus=0.5)
    def block_sum(t: pa.Table) -> int:
        if len(t) == 0 or "n_tokens" not in t.column_names:
            return 0
        return int(pc.sum(t["n_tokens"]).as_py() or 0)

    @ray.remote(num_cpus=0.5)
    def assign(t: pa.Table, offset: int, budget: int) -> pa.Table:
        if len(t) == 0 or "n_tokens" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_id": pa.array([], pa.int64())})
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        cum_before = offset + np.cumsum(n) - n
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "n_tokens": t["n_tokens"].combine_chunks(),
            "chunk_id": pa.array(cum_before // budget, pa.int64()),
        })

    refs = narrow.to_arrow_refs()
    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(sums[:-1]))) if sums else []
    out = [assign.remote(r, int(off), budget) for r, off in zip(refs, offsets)]
    import ray.data as rd

    return rd.from_arrow_refs(out)


def q_repetition_stats(sf_dir: str):
    """Per document: duplicate-line fraction and top-bigram fraction (the
    Gopher repetition filters). Lines split on ``\\n`` as-is; bigrams over
    the lowered ``\\w+`` word stream. Stateless vectorized map_batches —
    one dictionary-encode per batch for lines, numpy lexsort segment scans
    for per-row distinct counts and per-row max bigram frequency."""

    def stats(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")

        # --- duplicate-line fraction ---------------------------------------
        lines = pc.split_pattern(text, pattern="\n")
        loffs = np.asarray(lines.offsets, dtype=np.int64)
        loffs = loffs - loffs[0]
        lflat = lines.flatten()
        n_rows = len(lines)
        n_lines = np.diff(loffs)  # >= 1 for every row (splitting "" -> [""])
        if len(lflat):
            enc = lflat.dictionary_encode()
            lvocab = hash_strings_u64(enc.dictionary.to_pylist())
            lh = lvocab[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
        else:
            lh = np.empty(0, dtype=_U64)
        rows_idx = np.repeat(np.arange(n_rows), n_lines)
        order = np.lexsort((lh, rows_idx))
        sh, sr = lh[order], rows_idx[order]
        first = np.ones(len(sh), dtype=bool)
        first[1:] = (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])
        n_distinct = np.bincount(sr[first], minlength=n_rows)
        dup_line_frac = np.round((n_lines - n_distinct) / n_lines, 6)

        # --- top-bigram fraction --------------------------------------------
        flat, offs = word_hashes_column(batch["text"])
        n_words = np.diff(offs)
        topc = np.zeros(n_rows, dtype=np.int64)
        n = len(flat)
        if n >= 2:
            bg = mix64(flat[:-1] * _BG_M0 + flat[1:] * _BG_M1)
            row_of = np.searchsorted(offs, np.arange(n, dtype=np.int64),
                                     side="right") - 1
            win_row = row_of[: n - 1]
            valid = (np.arange(n - 1, dtype=np.int64) + 2) <= offs[win_row + 1]
            bg, win_row = bg[valid], win_row[valid]
            if len(bg):
                order = np.lexsort((bg, win_row))
                bg, win_row = bg[order], win_row[order]
                starts = np.ones(len(bg), dtype=bool)
                starts[1:] = (bg[1:] != bg[:-1]) | (win_row[1:] != win_row[:-1])
                start_idx = np.flatnonzero(starts)
                run_len = np.diff(np.append(start_idx, len(bg)))
                np.maximum.at(topc, win_row[start_idx], run_len)
        denom = np.maximum(n_words - 1, 1)
        top_bigram_frac = np.round(
            np.where(n_words >= 2, topc / denom, 0.0), 6)

        return pa.table({
            "doc_id": batch["doc_id"],
            "dup_line_frac": pa.array(dup_line_frac, pa.float64()),
            "top_bigram_frac": pa.array(top_bigram_frac, pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True)


def q_code_quality_screens(sf_dir: str):
    """StarCoder/BigCode-style generated- and data-file screens per document
    (Li et al. 2023 "StarCoder", §3.1 filtering: line-length and
    alphanumeric-fraction heuristics that drop minified/generated code and
    data blobs before training).

    All columns are INTEGER counts so the DuckDB oracle compares exactly
    (no float rounding surface): per document the line count, max/total
    line length (lines split on ``\\n`` as-is), total characters, alnum and
    digit character counts, and the keep verdict as integer arithmetic —
    keep = max_line_len <= 1000 AND mean line length <= 100 (sum <= 100*n)
    AND alnum fraction >= 0.25 (4*n_alnum >= n_chars). Stateless vectorized
    map_batches: Arrow split + utf8_length + RE2 count kernels, numpy
    reduceat segment scans; no per-row Python."""

    def screens(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")

        lines = pc.split_pattern(text, pattern="\n")
        loffs = np.asarray(lines.offsets, dtype=np.int64)
        loffs = loffs - loffs[0]
        llen = pc.utf8_length(lines.flatten()).to_numpy(zero_copy_only=False)
        n_rows = len(lines)
        n_lines = np.diff(loffs)  # >= 1 per row: splitting "" yields [""]
        if len(llen):
            max_line = np.maximum.reduceat(llen, loffs[:-1])
            sum_line = np.add.reduceat(llen, loffs[:-1])
        else:
            max_line = np.zeros(n_rows, dtype=np.int64)
            sum_line = np.zeros(n_rows, dtype=np.int64)

        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        n_alnum = pc.count_substring_regex(
            text, pattern="[a-zA-Z0-9]").to_numpy(zero_copy_only=False)
        n_digit = pc.count_substring_regex(
            text, pattern="[0-9]").to_numpy(zero_copy_only=False)
        keep = ((max_line <= 1000) & (sum_line <= 100 * n_lines)
                & (4 * n_alnum >= n_chars)).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_lines": pa.array(n_lines, pa.int64()),
            "max_line_len": pa.array(max_line, pa.int64()),
            "sum_line_len": pa.array(sum_line, pa.int64()),
            "n_chars": pa.array(n_chars.astype(np.int64), pa.int64()),
            "n_alnum": pa.array(n_alnum.astype(np.int64), pa.int64()),
            "n_digit": pa.array(n_digit.astype(np.int64), pa.int64()),
            "keep": pa.array(keep, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        screens, batch_format="pyarrow", zero_copy_batch=True)


_LICENSE_RE = (r"(?i)(spdx-license-identifier|apache license|mit license"
               r"|gnu general public license|bsd license"
               r"|mozilla public license|licensed under)")


def q_license_header_screen(sf_dir: str):
    """Per-source license tally: how many documents carry a recognizable
    license/SPDX marker in their first 512 characters (the cheap header scan
    code-curation pipelines run before applying per-license routing).

    Partial counts are combined INSIDE map_batches (in-batch group-by via
    dictionary_encode + bincount), so the groupby shuffle moves one tiny row
    per (batch, source) instead of one per document — the repo's standard
    pre-aggregation pattern. RE2 on both sides: Arrow match_substring_regex
    here, DuckDB regexp_matches in the oracle; the 512-char head is
    codepoint-sliced on both sides."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        head = pc.utf8_slice_codeunits(pc.fill_null(text, ""), 0, 512)
        hit = pc.match_substring_regex(head, pattern=_LICENSE_RE)
        hit = hit.to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_src = len(enc.dictionary)
        return pa.table({
            "source": enc.dictionary,
            "n_docs_part": pa.array(np.bincount(idx, minlength=n_src),
                                    pa.int64()),
            "n_licensed_part": pa.array(
                np.bincount(idx, weights=hit, minlength=n_src).astype(np.int64),
                pa.int64()),
        })

    agg = (_docs(sf_dir, ["source", "text"])
           .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
           .groupby("source")
           .aggregate(Sum("n_docs_part", alias_name="n_docs"),
                      Sum("n_licensed_part", alias_name="n_licensed")))
    return agg


# Knuth multiplicative hash over doc_id for sampling / shard routing: exact
# integer arithmetic available on BOTH sides (numpy uint64 here; DuckDB
# BIGINT in the oracle — doc_id * 2654435761 stays < 2^63 for any
# doc_id < 2^31, and the testdata ids are dense small ints), so assignment
# is bit-identical with no hashing UDF and no per-row Python md5 loop.
_KNUTH32 = 2654435761  # floor(2^32 / golden ratio), Knuth TAOCP v3 §6.4


def q_mixture_sample(sf_dir: str):
    """Deterministic weighted mixture sampling across sources — the corpus
    mixing step of an LLM data pipeline (sample source s at rate w_s when
    assembling the training mix). Rates are derived from the source name so
    the operator needs no external weight table: w = ((suffix % 4) + 1) / 8,
    i.e. sources cycle through 12.5% / 25% / 37.5% / 50%.

    A document is kept iff (doc_id * 2654435761) mod 2^32 < w * 2^32 — a
    multiplicative hash threshold, so membership is a pure function of the
    row (stable across runs, machines, partitionings; the same no-RNG-state
    contract as ``q_stratified_sample_per_lang`` and SURVEY.md O2/O3).
    Fully vectorized single-pass filter: no shuffle, no state; at 10^12 rows
    this is a streaming map over (doc_id, source) only — text never loads.
    """

    def fn(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
        h = (did * _U64(_KNUTH32)) % _U64(1 << 32)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        suf = pc.cast(pc.utf8_slice_codeunits(pc.fill_null(src, "src0"), 3, 16),
                      pa.int64()).to_numpy(zero_copy_only=False)
        thr = ((suf % 4 + 1).astype(_U64)) * _U64(1 << 29)
        keep = pa.array(h < thr)
        return batch.filter(keep).select(["doc_id", "source"])

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


def q_shard_manifest(sf_dir: str, n_shards: int = 32):
    """Training-shard export manifest: route every document to a
    deterministic output shard (hash(doc_id) mod ``n_shards`` — the
    resumable-export layout the north rule's "partitioned Parquet, one
    directory per key range" calls for) and report per-shard document and
    character totals, i.e. the manifest a sharded `write_parquet` export
    would record per partition (see ``state/manifests.py``).

    Scale shape: per-batch partial sums via ``np.bincount`` (one row per
    (batch, shard) leaves the map stage), then a tiny ``groupby('shard_id')``
    over <= n_shards x n_blocks partial rows — the repo's standard
    pre-aggregation pattern (``q_license_header_screen``,
    ``q_returnflag_totals``). n_chars sums stay < 2^53, so the float64
    bincount weights are exact.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
        h = (did * _U64(_KNUTH32)) % _U64(1 << 32)
        sh = (h % _U64(n_shards)).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        nd = np.bincount(sh, minlength=n_shards)
        nc = np.bincount(sh, weights=nch, minlength=n_shards)
        nz = np.flatnonzero(nd)
        return pa.table({
            "shard_id": pa.array(nz, pa.int64()),
            "n_docs_part": pa.array(nd[nz], pa.int64()),
            "n_chars_part": pa.array(nc[nz].astype(np.int64), pa.int64()),
        })

    return (_docs(sf_dir, ["doc_id", "n_chars"])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("shard_id")
            .aggregate(Sum("n_docs_part", alias_name="n_docs"),
                       Sum("n_chars_part", alias_name="n_chars")))


def q_ngram_novelty(sf_dir: str, gram_len: int = 8, strategy: str = "auto"):
    """Per-document n-gram novelty (the corpus-level duplication analysis of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): for each document, how many of its distinct word
    ``gram_len``-grams also occur in at least one OTHER document, and the
    novelty fraction 1 - dup/total (empty docs are fully novel).

    Plan — the line-dedup shape lifted to grams: pass 1 streams per-batch
    gram-hash doc-frequency partials (``shingle_hashes`` is sorted-unique
    per doc, so the flat stream counts DOCS per gram) through one narrow
    groupby-sum. Membership (VERDICT r4 #2 — both strategies real,
    auto-switched on the measured vocabulary):

    - **broadcast** (df>=2 vocabulary <= DUP_LINE_BROADCAST_LIMIT): hashes
      to the driver once, ``ray.put``; pass 2 re-streams the corpus and
      counts membership per doc with one vectorized searchsorted + bincount.
    - **join** (above the limit): the NARROW (doc_id, gram_hash) stream
      inner-joins the duplicated vocabulary hash-partitioned on the gram
      hash (J7); per-doc hit counts come from one groupby, and a final
      doc_id-keyed join against the (doc_id, n_grams) totals fills the
      zero-hit docs. Only 16-byte rows shuffle — the fat text NEVER moves.

    Outputs are identical between strategies (same hashes -> same counts)."""

    def partials(batch: pa.Table) -> pa.Table:
        flat, offs = word_hashes_column(batch["text"])
        sh, _ = shingle_hashes(flat, offs, gram_len)
        uniq, cnt = np.unique(sh, return_counts=True)
        return pa.table({"h": pa.array(uniq.view(np.int64), pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    docs = _docs(sf_dir, ["doc_id", "text"])
    counted = docs.map_batches(partials, batch_format="pyarrow",
                               zero_copy_batch=True).groupby("h").sum("n")
    dup_ds = counted.map_batches(
        lambda t: (t.filter(pa.array(
            t["sum(n)"].to_numpy(zero_copy_only=False) >= 2)).select(["h"])
            if len(t) and "h" in t.column_names
            else pa.table({"h": pa.array([], pa.int64())})),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_dup = dup_ds.count()
    if strategy == "auto":
        strategy = "broadcast" if n_dup <= DUP_LINE_BROADCAST_LIMIT else "join"
    if n_dup == 0:
        strategy = "broadcast"  # degenerate: nothing duplicated anywhere

    if strategy == "broadcast":
        dup_parts = [b["h"].to_numpy(zero_copy_only=False).view(_U64)
                     for b in dup_ds.iter_batches(batch_format="pyarrow")
                     if len(b)]
        dup = np.sort(np.concatenate(dup_parts)) if dup_parts else np.empty(0, _U64)
        dup_ref = ray.put(dup)

        def novelty(batch: pa.Table) -> pa.Table:
            dup = ray.get(dup_ref)
            flat, offs = word_hashes_column(batch["text"])
            sh, so = shingle_hashes(flat, offs, gram_len)
            counts = np.diff(so)
            if len(dup) and len(sh):
                idx = np.minimum(np.searchsorted(dup, sh), len(dup) - 1)
                hit = dup[idx] == sh
            else:
                hit = np.zeros(len(sh), dtype=bool)
            rows_idx = np.repeat(np.arange(len(counts)), counts)
            n_dup_g = np.bincount(rows_idx, weights=hit,
                                  minlength=len(counts)).astype(np.int64)
            frac = np.round(np.where(
                counts > 0, 1.0 - np.divide(n_dup_g, counts,
                                            out=np.zeros(len(counts)),
                                            where=counts > 0), 1.0), 6)
            return pa.table({
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(counts, pa.int64()),
                "n_dup_grams": pa.array(n_dup_g, pa.int64()),
                "novelty_frac": pa.array(frac, pa.float64()),
            })

        return docs.map_batches(novelty, batch_format="pyarrow", zero_copy_batch=True)

    # ---- hash-partitioned join path (vocabulary too large to broadcast) ----
    from ray.data.aggregate import Count

    from nhse_probabilistic_linkage_ray.config import PipelineConfig
    from nhse_probabilistic_linkage_ray.stages.cluster import join_partitions

    k = join_partitions(PipelineConfig(), rows=n_dup)

    def explode_grams(batch: pa.Table) -> pa.Table:
        flat, offs = word_hashes_column(batch["text"])
        sh, so = shingle_hashes(flat, offs, gram_len)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(did, np.diff(so)), pa.int64()),
            "h": pa.array(sh.view(np.int64), pa.int64()),
        })

    def totals_of(batch: pa.Table) -> pa.Table:
        flat, offs = word_hashes_column(batch["text"])
        _, so = shingle_hashes(flat, offs, gram_len)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_grams": pa.array(np.diff(so), pa.int64()),
        })

    hits = docs.map_batches(explode_grams, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .join(dup_ds.repartition(k).materialize(), join_type="inner",
              num_partitions=k, on=("h",)) \
        .groupby("doc_id").aggregate(Count(alias_name="n_dup_grams"))
    totals = docs.map_batches(totals_of, batch_format="pyarrow",
                              zero_copy_batch=True)
    joined = totals.join(hits.repartition(k).materialize(),
                         join_type="left_outer", num_partitions=k,
                         on=("doc_id",))

    def finish(batch: pa.Table) -> pa.Table:
        counts = batch["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = batch["n_dup_grams"].combine_chunks().fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        frac = np.round(np.where(
            counts > 0, 1.0 - np.divide(nd, counts,
                                        out=np.zeros(len(counts)),
                                        where=counts > 0), 1.0), 6)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "n_grams": pa.array(counts, pa.int64()),
            "n_dup_grams": pa.array(nd, pa.int64()),
            "novelty_frac": pa.array(frac, pa.float64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


# GPT-2-style pre-tokenizer, restricted to RE2 (no lookahead — both Arrow
# and DuckDB run RE2, so the two sides count the IDENTICAL segmentation):
# contractions, space-prefixed letter runs, space-prefixed digit runs,
# space-prefixed punctuation runs, then residual whitespace runs.
BPE_SEGMENT_RE = (r"'(?:s|t|re|ve|m|ll|d)"
                  r"| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+")


def q_bpe_token_counts(sf_dir: str):
    """Token-budget estimation per document with a BPE-ish pre-tokenizer
    (the GPT-2 pattern minus its RE2-incompatible lookahead) next to the
    plain whitespace count — the pair of numbers a training-data pipeline
    uses to budget sequence packing and price a corpus in tokens.

    Fully vectorized: one ``pc.count_substring_regex`` per column per batch
    (zero-copy Arrow in, two int64 + one float64 column out); stateless
    map_batches, streams at any scale."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        text = pc.fill_null(text, "")
        n_seg = pc.count_substring_regex(text, BPE_SEGMENT_RE) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_ws = pc.count_substring_regex(text, r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = np.round(np.divide(n_seg, n_ws, out=np.zeros(len(n_seg)),
                                   where=n_ws > 0), 6)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "n_bpe_segments": pa.array(n_seg, pa.int64()),
            "n_ws_tokens": pa.array(n_ws, pa.int64()),
            "segments_per_word": pa.array(ratio, pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)
