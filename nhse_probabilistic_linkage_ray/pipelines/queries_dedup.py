"""Dedup / text-analysis / similarity queries over the ``documents`` and
``embeddings`` test tables — the training-data-pipeline operator set
(exact dedup, MinHash-LSH, SimHash, n-gram Jaccard, embedding near-dup,
ANN top-k, language-ID, quality scoring, token counting, fingerprinting).

Each ``q_*`` takes ``sf_dir`` and returns a Dataset / pandas DataFrame whose
column names + values match the DuckDB oracle SQL in ``oracle_sql()`` where
one exists (non-SQL-expressible ops are rows-only checked by the driver and
pinned instead by the pytest oracle suite).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions import textstats
from nhse_probabilistic_linkage_ray.functions.simhash import hamming_distance


def _docs(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------- exact dedup

def _with_md5(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    h = [hashlib.md5((t or "").encode("utf-8", "surrogatepass")).hexdigest() for t in texts]
    return batch.append_column("group_hash", pa.array(h, pa.string()))


def q_exact_dedup_groups(sf_dir: str):
    """Exact-duplicate groups by content hash: the D1 pre-pass as a query
    (ref dropDuplicates, /root/reference/utils/dataset_ingestion_utils.py:257)."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_with_md5, batch_format="pyarrow")
        .select_columns(["doc_id", "group_hash"])
        .groupby("group_hash")
        .aggregate(Min("doc_id", alias_name="rep_id"), Count(alias_name="n_members"))
    )


def q_exact_dedup_keep_first(sf_dir: str):
    """Deduplicated id list: min doc_id per distinct content."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_with_md5, batch_format="pyarrow")
        .groupby("group_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )


def q_exact_cluster_size_histogram(sf_dir: str):
    """Count-of-counts over exact groups (A1, ref select_training_data_dedupe.py:45-48)."""
    return (
        q_exact_dedup_groups(sf_dir)
        .groupby("n_members")
        .aggregate(Count(alias_name="n_clusters"))
        .select_columns(["n_members", "n_clusters"])
    )


# ------------------------------------------------------------- text analysis

def q_token_counts(sf_dir: str):
    """Whitespace token counting per document — one vectorized RE2 count
    kernel per batch (the scalar ``textstats.token_count_ws`` twin)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        n = pc.count_substring_regex(text, r"\S+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "n_tokens": pa.array(n, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def q_doc_normalize(sf_dir: str):
    """Whitespace-collapse + lowercase normalization (M4/M7 analogs, ref
    standardise_white_space /root/reference/utils/preprocessing_utils.py:307-371).
    Fully vectorized Arrow RE2 kernels — after the \\s+ collapse only plain
    spaces can remain at the edges, so trim == trim_whitespace."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        out = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.replace_substring_regex(text, pattern=r"\s+", replacement=" ")))
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "norm_text": out,
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def _round_half_away(v: np.ndarray, dp: int = 6) -> np.ndarray:
    """Round-half-away-from-zero for non-negative arrays (SQL ROUND
    semantics; numpy rounds half-to-even, which differs on exact ties
    like 0.8203125)."""
    s = 10.0 ** dp
    return np.floor(v * s + 0.5) / s


def q_quality_scores(sf_dir: str):
    """Quality features (length / punct / stopword / alpha ratios) with a
    DuckDB oracle (regexp_extract_all + list kernels)."""

    def fn(batch: pa.Table) -> pa.Table:
        s = textstats.quality_scores_column(batch["text"])
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "length": pa.array(s["length"], pa.int64()),
            "mean_word_len": pa.array(_round_half_away(s["mean_word_len"]), pa.float64()),
            "punct_ratio": pa.array(_round_half_away(s["punct_ratio"]), pa.float64()),
            "stop_ratio": pa.array(_round_half_away(s["stop_ratio"]), pa.float64()),
            "alpha_ratio": pa.array(_round_half_away(s["alpha_ratio"]), pa.float64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def q_lang_id(sf_dir: str):
    """Heuristic language ID (stopword-profile voting) — rows-only."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "lang_pred": pa.array(textstats.language_id_column(batch["text"]), pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def q_fingerprints(sf_dir: str):
    """Document fingerprints, winnowing-family: the minimum hash over all
    character 8-gram windows (min-sampling of a rolling window — stable under
    edits that don't touch the minimizing window). md5 is the window hash so
    a DuckDB oracle can replay it exactly; the high-throughput uint64
    rolling-hash variant is ``functions/textstats.fingerprint_rolling``
    (same operator family, pinned by pytest kernel tests)."""
    import hashlib as _hl

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            t = t or ""
            if len(t) < 8:
                out.append(_hl.md5(t.encode()).hexdigest())
            else:
                # character windows (matches SQL substr semantics)
                out.append(min(_hl.md5(t[i:i + 8].encode()).hexdigest()
                               for i in range(len(t) - 7)))
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "fingerprint": pa.array(out, pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def q_fingerprints_rolling(sf_dir: str):
    """uint64 rolling-window fingerprints (the scale kernel) — rows-only;
    the mix64 arithmetic has no SQL analog."""

    def fn(batch: pa.Table) -> pa.Table:
        fp = textstats.fingerprint_rolling(batch["text"].to_pylist())
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "fingerprint": pa.array(fp.view(np.int64), pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------- near-dup (word sets)

def q_substring_gram_pairs(sf_dir: str, gram_len: int = 12):
    """Exact shared-substring near-dup pairs — the standalone 'suffix-array
    substring' dedup operator the north rule names (BASELINE.json): two
    documents pair iff they share at least one exact ``gram_len``-token
    substring, with the count of DISTINCT shared grams as the score.

    Distributed plan (winnowing-style fingerprint blocking): per doc, the
    sorted-unique mix64 hashes of every L-token window (the vectorized
    ``shingle_hashes`` kernel, order-preserving duplicates kept upstream) ->
    (gram_hash, doc_id) rows -> the shared sort+segment-scan pair engine
    emits one row per (gram, pair) collision -> groupby(pair).count = number
    of shared grams. No driver materialization; caps disabled because the
    operator is exact by contract (mega-gram skew belongs to the capped LSH
    path). SQL oracle replays the same windows as strings via list kernels
    (hash collisions would need ~2^64 grams to matter)."""
    from nhse_probabilistic_linkage_ray.functions.shingle import (
        shingle_hashes,
        token_hashes_batch,
    )
    from nhse_probabilistic_linkage_ray.stages.candidates import raw_band_pairs

    def grams(batch: pa.Table) -> pa.Table:
        # raw text (NOT lowered): the oracle regex runs on text as-is
        flat, offs = token_hashes_batch(batch["text"].to_pylist())
        sh, so = shingle_hashes(flat, offs, gram_len)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        counts = np.diff(so)
        return pa.table({
            "band_hash": pa.array(sh.view(np.int64), pa.int64()),
            "file_id": pa.array(np.repeat(did, counts).astype(np.int64), pa.int64()),
            "band_idx": pa.array(np.zeros(len(sh), np.int32), pa.int32()),
        })

    bands = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        grams, batch_format="pyarrow", zero_copy_batch=True)
    raw = raw_band_pairs(bands, max_band_group=1 << 30, max_pairs=1 << 62)
    return raw.groupby(["left_id", "right_id"]).aggregate(
        Count(alias_name="n_shared_grams"))


def q_word_jaccard_pairs(sf_dir: str):
    """All-pairs word-set Jaccard >= 0.5 among doc_id < 300 — an n-gram-
    Jaccard dedup operator small enough for an exact SQL oracle. Tokens are
    lowercase \\w+ words, de-duplicated per doc (matching the SQL's
    list_distinct(regexp_extract_all(lower(text), '\\w+'))).

    SCALE LABEL: this is deliberately an ORACLE-PARITY query, bounded to
    doc_id < 300 by contract — the broadcast word-set table and per-pair set
    loops are sized to that bound, not to a corpus. The at-scale n-gram
    Jaccard path is the shingle pipeline (shingle_k=1 == word sets):
    LSH banding -> candidate pairs -> exact-Jaccard verification, exercised
    end-to-end by minhash_dedup_clusters and link_best_match."""
    import re

    word = re.compile(r"\w+")

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) < 300)),
        batch_format="pyarrow",
    )
    rows = ds.take_all()
    sets = {r["doc_id"]: frozenset(word.findall((r["text"] or "").lower())) for r in rows}
    ids = sorted(sets)
    id_arr = np.array(ids, dtype=np.int64)
    set_list = [sets[i] for i in ids]
    ref = ray.put((id_arr, set_list))

    def pair_block(batch: pa.Table) -> pa.Table:
        ids_, sets_ = ray.get(ref)
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        out_l, out_r, out_j = [], [], []
        for i in lo:
            si = sets_[i]
            for j in range(i + 1, len(ids_)):
                sj = sets_[j]
                if not si and not sj:
                    jac = 1.0
                else:
                    inter = len(si & sj)
                    union = len(si) + len(sj) - inter
                    jac = inter / union if union else 0.0
                if jac >= 0.5:
                    out_l.append(int(ids_[i])); out_r.append(int(ids_[j])); out_j.append(round(jac, 6))
        return pa.table({
            "left_id": pa.array(out_l, pa.int64()),
            "right_id": pa.array(out_r, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        })

    idx = ray.data.from_items([{"lo": i} for i in range(len(ids))])
    return idx.map_batches(pair_block, batch_format="pyarrow", batch_size=16)


# --------------------------------------------------------- MinHash / SimHash

def q_minhash_dedup_clusters(sf_dir: str):
    """Flagship: full MinHash-LSH dedup pipeline over the files-shaped
    adapter of documents -> one row per document with its cluster.

    Now carries a FULL value-hash DuckDB oracle: on this corpus (ASCII words,
    whitespace-separated) the pipeline's cluster assignment equals exact
    5-token-shingle-Jaccard >= 0.7 connected components, which SQL can
    compute with list kernels + a recursive CTE. The LSH banding config
    (b=32 x r=4, P(candidate | j=0.7) ~ 0.99984 per band set) plus the
    rescue_low exact-verification gate make recall exact on the test corpus
    (deterministic seed; pinned). Output ids are doc-level (cluster id =
    min doc_id of the component — recovered from the adapter's path layout);
    at scale the engine's identity is the 64-bit file_id and this remap is a
    reporting concern."""
    from ray.data.aggregate import Min as _Min

    from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset
    from nhse_probabilistic_linkage_ray.sources.documents import files_from_documents

    out = dedupe_dataset(files_from_documents(sf_dir), PipelineConfig())
    cl = out["clusters"].select_columns(["path", "cluster_id", "content_sha256"])

    def with_doc(batch: pa.Table) -> pa.Table:
        # adapter layout: path == f"docs/{doc_id:08d}.md"
        doc = np.array([int(p[5:13]) for p in batch["path"].to_pylist()], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "cluster_id": batch["cluster_id"].combine_chunks(),
            "content_sha256": batch["content_sha256"].combine_chunks(),
        })

    cl = cl.map_batches(with_doc, batch_format="pyarrow", zero_copy_batch=True).materialize()
    mins = cl.groupby("cluster_id").aggregate(_Min("doc_id", alias_name="cluster_doc_id"))
    kchunks, vchunks = [], []
    for b in mins.iter_batches(batch_format="pyarrow"):
        kchunks.append(b["cluster_id"].to_numpy(zero_copy_only=False))
        vchunks.append(b["cluster_doc_id"].to_numpy(zero_copy_only=False))
    keys = np.concatenate(kchunks) if kchunks else np.empty(0, np.int64)
    vals = np.concatenate(vchunks) if vchunks else np.empty(0, np.int64)
    order = np.argsort(keys)
    ref = ray.put((keys[order], vals[order]))

    def remap(batch: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        c = batch["cluster_id"].to_numpy(zero_copy_only=False)
        cd = v[np.searchsorted(k, c)]  # every cluster_id is in the map
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "cluster_doc_id": pa.array(cd, pa.int64()),
            "content_sha256": batch["content_sha256"].combine_chunks(),
        })

    return cl.map_batches(remap, batch_format="pyarrow", zero_copy_batch=True)


def _simhash_signatures(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, simhash) over documents: 3-token shingle SimHash."""
    from nhse_probabilistic_linkage_ray.functions.shingle import shingle_hashes, token_hashes_batch
    from nhse_probabilistic_linkage_ray.functions.simhash import simhash as simhash_fn

    def sig(batch: pa.Table) -> pa.Table:
        texts = [(t or "").lower() for t in batch["text"].to_pylist()]
        flat, offs = token_hashes_batch(texts)
        sh, so = shingle_hashes(flat, offs, 3)
        s = simhash_fn(sh, so)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "simhash": pa.array(s.view(np.int64), pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(sig, batch_format="pyarrow")


def _simhash_signatures_md5(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, simhash) with an md5-derived token hash so DuckDB can
    recompute the signature exactly (md5 hex -> first 16 chars -> uint64 per
    DISTINCT lowercase \\w+ token, then the same strict-majority bit rule as
    the scale kernel). Token-level (1-shingle) by design: SQL list kernels
    can't window shingles cheaply, and the oracle must replay every step."""
    import hashlib as _hl
    import re as _re

    word = _re.compile(r"\w+")

    def sig(batch: pa.Table) -> pa.Table:
        from nhse_probabilistic_linkage_ray.functions.simhash import simhash as simhash_fn

        cache: dict = {}
        flat_parts, offs = [], [0]
        total = 0
        for t in batch["text"].to_pylist():
            toks = set(word.findall((t or "").lower()))
            hs = np.empty(len(toks), np.uint64)
            for i, tok in enumerate(toks):
                h = cache.get(tok)
                if h is None:
                    h = cache[tok] = int(_hl.md5(tok.encode()).hexdigest()[:16], 16)
                hs[i] = h
            flat_parts.append(hs)
            total += len(hs)
            offs.append(total)
        flat = np.concatenate(flat_parts) if flat_parts else np.empty(0, np.uint64)
        s = simhash_fn(flat, np.asarray(offs, np.int64))
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks(),
            "simhash": pa.array(s.view(np.int64), pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(sig, batch_format="pyarrow")


def simhash_near_pairs(
    sigs_ds: "ray.data.Dataset", hamming_max: int = 6
) -> "ray.data.Dataset":
    """Distributed SimHash near-dup pairs via pigeonhole banding.

    Split the 64-bit simhash into ``hamming_max + 1`` bit chunks: any pair
    within Hamming distance ``hamming_max`` agrees EXACTLY on at least one
    chunk (pigeonhole), so candidate generation is a groupby on
    (chunk_id, chunk_value) — the same blocking shuffle as MinHash-LSH bands
    (SURVEY.md J4) — followed by vectorized in-group Hamming verification and
    a cross-chunk pair dedup. Nothing is collected to the driver; work is
    O(sum of group^2) instead of the round-1 all-pairs O(N^2) take_all."""
    n_chunks = hamming_max + 1
    # chunk bit boundaries over the 64-bit hash
    bounds = np.linspace(0, 64, n_chunks + 1).astype(np.int64)
    shifts = bounds[:-1]
    widths = np.diff(bounds)

    def explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].combine_chunks().to_numpy(zero_copy_only=False).view(np.uint64)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(h)
        keys = np.empty((n, n_chunks), dtype=np.int64)
        for c in range(n_chunks):
            val = (h >> np.uint64(shifts[c])) & np.uint64((1 << int(widths[c])) - 1)
            # chunk_id in the top bits keeps chunk key spaces disjoint
            keys[:, c] = (np.int64(c) << np.int64(56)) | val.view(np.int64)
        return pa.table({
            "chunk_key": pa.array(keys.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(did, n_chunks), pa.int64()),
            "simhash": pa.array(np.repeat(h.view(np.int64), n_chunks), pa.int64()),
        })

    def verify(group: dict) -> dict:
        did = np.asarray(group["doc_id"], dtype=np.int64)
        h = np.asarray(group["simhash"], dtype=np.int64).view(np.uint64)
        n = len(did)
        if n < 2:
            return {"left_id": np.empty(0, np.int64), "right_id": np.empty(0, np.int64),
                    "hamming": np.empty(0, np.int64)}
        order = np.argsort(did)
        did, h = did[order], h[order]
        # blockwise upper triangle: memory stays O(block x n) even for a hot
        # chunk value shared by a huge group (exact output, no n^2 cliff)
        B = 1024
        L, R, D = [], [], []
        for s in range(0, n - 1, B):
            e = min(s + B, n)
            rows = np.arange(s, e)
            d = hamming_distance(h[rows][:, None], h[None, :])  # (b, n)
            li, ri = np.nonzero((d <= hamming_max) & (rows[:, None] < np.arange(n)[None, :]))
            L.append(did[rows[li]]); R.append(did[ri])
            D.append(d[li, ri].astype(np.int64))
        return {"left_id": np.concatenate(L) if L else np.empty(0, np.int64),
                "right_id": np.concatenate(R) if R else np.empty(0, np.int64),
                "hamming": np.concatenate(D) if D else np.empty(0, np.int64)}

    exploded = sigs_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    pairs = exploded.groupby("chunk_key").map_groups(verify, batch_format="numpy")
    # cross-chunk dedup (a pair can collide in several chunks)
    return pairs.groupby(["left_id", "right_id"]).aggregate(
        Min("hamming", alias_name="hamming"))


def q_simhash_near_pairs(sf_dir: str):
    """SimHash-based near-dup pairs (Hamming <= 6) among documents — the
    standalone SimHash dedup operator, distributed via pigeonhole banding.

    Full value-hash DuckDB oracle: the signature uses md5-derived token
    hashes (``_simhash_signatures_md5``) so SQL can replay signature ->
    XOR popcount -> threshold exactly. The pair engine is EXACT (pigeonhole
    guarantees every Hamming<=6 pair collides on >=1 chunk), so Ray and SQL
    agree bit-for-bit. The mix64 3-shingle scale kernel stays exercised by
    the dedupe tiers and pytest brute-force equivalence."""
    return simhash_near_pairs(_simhash_signatures_md5(sf_dir), hamming_max=6)


def q_tf_adjusted_weights(sf_dir: str):
    """Term-frequency-adjusted exact-tier match weights with an exact SQL
    oracle (Splink 3.9 arithmetic; ref tf_adjustment_* keys,
    /root/reference/utils/parameter_lists.py:11-14).

    The documents corpus has no exact-content duplicates, so the agreed
    value here is the ``source`` column: per source-group star pairs
    (min doc_id -> member) scored at the exact tier with
    tf = group_size / corpus_size, weight = prior odds + log2(m4/u4) +
    w_tf * log2(u4 / max(tf, tf_min)) — the identical arithmetic the dedupe
    pipeline applies to content-hash groups, value-hash-checked against
    DuckDB's log2."""
    from nhse_probabilistic_linkage_ray.stages.score import exact_scored_pairs

    cfg = PipelineConfig(tf_adjustment_weight=1.0, tf_minimum_u_value=0.001)

    def as_mapped(batch: pa.Table) -> pa.Table:
        return pa.table({
            "file_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "group": batch["source"].combine_chunks(),
        })

    docs = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        as_mapped, batch_format="pyarrow", zero_copy_batch=True).materialize()
    total = docs.count()

    # rep per group: distributed groupby-min; only the (tiny) one-row-per-group
    # result reaches the driver for the broadcast lookup (numpy chunk collect —
    # no Arrow concat, so empty shuffle blocks with degenerate schemas are fine)
    gch, ich = [], []
    for b in docs.groupby("group").min("file_id").iter_batches(batch_format="pyarrow"):
        if len(b) == 0 or "group" not in b.column_names:
            continue
        gch.append(b["group"].to_numpy(zero_copy_only=False))
        ich.append(b["min(file_id)"].to_numpy(zero_copy_only=False))
    g_all = np.concatenate(gch) if gch else np.empty(0, object)
    rep_all = (np.concatenate(ich) if ich else np.empty(0)).astype(np.int64)
    order = np.argsort(g_all)
    rep_groups = g_all[order]
    rep_ids = rep_all[order]
    ref = ray.put((rep_groups, rep_ids))

    def attach(batch: pa.Table) -> pa.Table:
        groups, ids = ray.get(ref)
        g = batch["group"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(groups, g), max(len(groups) - 1, 0))
        if len(groups) == 0 or not (groups[idx] == g).all():
            raise KeyError("group key missing from broadcast rep map")
        rep = ids[idx]
        return pa.table({
            "file_id": batch["file_id"].combine_chunks(),
            "rep_id": pa.array(rep, pa.int64()),
        })

    mapped = docs.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
    res = exact_scored_pairs(mapped, cfg, total_rows=total)

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "left_id": batch["left_id"].combine_chunks(),
            "right_id": batch["right_id"].combine_chunks(),
            "tf_value": pa.array(_round_half_away(
                batch["tf_value"].to_numpy(zero_copy_only=False)), pa.float64()),
            "match_weight": pa.array(_round_half_away(
                batch["match_weight"].to_numpy(zero_copy_only=False)), pa.float64()),
        })

    return res.map_batches(fin, batch_format="pyarrow")


# ------------------------------------------------------------- linking mode

def q_link_best_match(sf_dir: str):
    """Linking mode end-to-end as a driver query WITH an exact SQL oracle:
    documents with doc_id % 10 == 0 form the external table, the rest the
    corpus; ``link_datasets`` blocks across the two, scores, and picks the
    best match per external record (ref ``predict_linking.py:142-155`` +
    ``get_best_match`` ``utils/model_utils.py:194-254``).

    Oracle-parity choices (the SQL cannot express MinHash/SimHash/LCS):
    - content is pre-tokenized to \\w+ words (the pairing proven hash-equal
      in ``word_jaccard_pairs``) and shingle_k=1, so exact-Jaccard == SQL
      word-set Jaccard;
    - banding r=2 x b=64 makes P(miss | jaccard >= 0.7) ~ 1e-19 and
      rescue_low=0.2 guarantees the exact-Jaccard tier is always evaluated;
    - output keeps only gamma >= 2 (the SQL-expressible tiers) and masks the
      winner id to -1 when several candidates tie at the top tier (tie-break
      among equal weights is by internal hash id — implementation-defined —
      while n_close and best_gamma stay exact).
    """
    import re

    from nhse_probabilistic_linkage_ray.functions.hashing import file_id_column
    from nhse_probabilistic_linkage_ray.pipelines.linking import link_datasets

    word = re.compile(r"\w+")

    def files_batch(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        content = [" ".join(word.findall((t or "").lower())) for t in texts]
        repo = ["linkcorpus"] * len(doc_id)
        path = [f"docs/{d:08d}.md" for d in doc_id]
        commit = ["0" * 40] * len(doc_id)
        return pa.table({
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(["text"] * len(doc_id), pa.string()),
            "content": pa.array(content, pa.large_string()),
            "doc_id": batch["doc_id"].combine_chunks(),
            "file_id": pa.array(
                file_id_column(pa.array(repo, pa.string()), pa.array(path, pa.string()),
                               pa.array(commit, pa.string())), pa.int64()),
        })

    adapted = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        files_batch, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # file_id <-> doc_id map (test-scale documents table; bounded)
    id_map: dict = {}
    for b in adapted.select_columns(["file_id", "doc_id"]).iter_batches(batch_format="pyarrow"):
        id_map.update(zip(b["file_id"].to_pylist(), b["doc_id"].to_pylist()))
    map_ref = ray.put(id_map)

    def side(pred):
        return adapted.map_batches(
            lambda t: t.filter(pa.array(pred(t["doc_id"].to_numpy(zero_copy_only=False))))
                       .select(["repo", "path", "commit", "lang", "content"]),
            batch_format="pyarrow", zero_copy_batch=True)

    ext = side(lambda d: d % 10 == 0)
    cor = side(lambda d: d % 10 != 0)

    cfg = PipelineConfig(shingle_k=1, num_perms=128, num_bands=64, rescue_low=0.2)
    res = link_datasets(ext, cor, cfg, close_matches_threshold=0.5,
                        match_weight_threshold=5.0)

    def fin(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        g = batch["gamma"].to_numpy(zero_copy_only=False)
        keep = g >= 2
        sub = batch.filter(pa.array(keep))
        ext_doc = np.array([m[x] for x in sub["ext_id"].to_pylist()], dtype=np.int64)
        n_close = sub["n_close"].to_numpy(zero_copy_only=False)
        best_doc = np.array(
            [m[x] if nc == 1 else -1
             for x, nc in zip(sub["best_match_id"].to_pylist(), n_close.tolist())],
            dtype=np.int64)
        return pa.table({
            "ext_doc_id": pa.array(ext_doc, pa.int64()),
            "best_doc_id": pa.array(best_doc, pa.int64()),
            "best_gamma": sub["gamma"].combine_chunks().cast(pa.int64()),
            "n_close": pa.array(n_close, pa.int64()),
        })

    return res.map_batches(fin, batch_format="pyarrow")


# ------------------------------------------------------- embeddings / ANN

def _load_embeddings(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def q_ann_cosine_topk(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Brute-force cosine top-k similarity search: query matrix = embeddings
    of vec_id < n_queries, broadcast once; per-batch numpy matmul; global
    top-k per query via groupby. Matches the DuckDB list_cosine_similarity
    oracle (cosine rounded to 5 dp; ties broken by neighbor_id)."""
    emb = _load_embeddings(sf_dir)

    q_rows = emb.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], n_queries)),
        batch_format="pyarrow", zero_copy_batch=True).take_all()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in q_rows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((q_ids, Qn))

    def score(batch: pa.Table) -> pa.Table:
        qids, Qn_ = ray.get(ref)
        vec_id = batch["vec_id"].to_numpy(zero_copy_only=False)
        e = batch["embedding"].combine_chunks()
        V = np.asarray(e.values, dtype=np.float64).reshape(len(vec_id), -1)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        S = Qn_ @ Vn.T  # (q, n)
        nq, n = S.shape
        # partial top-k inside the batch (combiner before the shuffle): the
        # global top-k of per-batch top-ks is exact as long as the batch-level
        # cut uses the SAME (cosine desc, id asc) tie-break as the global
        # pass; shuffle volume drops from q x N rows to q x k x n_batches.
        # Keep k+1 to survive the self-hit.
        keep = min(k + 1, n)
        idx = np.empty((nq, keep), dtype=np.int64)
        for qi in range(nq):  # nq is the (small) query count, not data-sized
            idx[qi] = np.lexsort((vec_id, -S[qi]))[:keep]
        rowsel = np.arange(nq)[:, None]
        return pa.table({
            "query_id": pa.array(np.repeat(qids, keep), pa.int64()),
            "neighbor_id": pa.array(vec_id[idx].ravel(), pa.int64()),
            "cosine": pa.array(S[rowsel, idx].ravel(), pa.float64()),
        })

    scored = emb.map_batches(score, batch_format="pyarrow", batch_size=2048)

    def topk(group: dict) -> dict:
        qid = group["query_id"][0]
        nid = np.asarray(group["neighbor_id"])
        cos = np.asarray(group["cosine"])
        mask = nid != qid
        nid, cos = nid[mask], cos[mask]
        order = np.lexsort((nid, -cos))[:k]
        return {
            "query_id": np.full(len(order), qid, dtype=np.int64),
            "neighbor_id": nid[order].astype(np.int64),
            "cosine": np.round(cos[order], 5),
        }

    return scored.groupby("query_id").map_groups(topk, batch_format="numpy")


def q_embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-duplicate pairs (cosine >= threshold) — exact,
    with an exact SQL oracle, via DISTRIBUTED block-pair products.

    The normalized embedding table is materialized as Arrow blocks in the
    object store; one task per block-pair (i <= j) fetches its two blocks
    zero-copy, runs a single matmul and keeps pairs over the threshold. The
    driver holds only block refs (the round-1 version take_all'd the whole
    table). Work is inherently all-pairs — that is what 'exact at any
    threshold' costs; the scale path for near-dup at high thresholds is the
    IVF/LSH approximate route in pipelines/similarity.py."""
    def normalize(batch: pa.Table) -> pa.Table:
        col = batch["embedding"].combine_chunks()
        V = np.asarray(col.values, dtype=np.float64).reshape(len(batch), -1)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        return pa.table({
            "vec_id": batch["vec_id"].combine_chunks().cast(pa.int64()),
            "embedding": pa.array(list(Vn), pa.list_(pa.float64())),
        })

    emb = _load_embeddings(sf_dir).map_batches(normalize, batch_format="pyarrow")
    refs = [r[0] if isinstance(r, tuple) else r
            for r in emb.materialize().to_arrow_refs()]
    nb = len(refs)

    def _mat(tbl: pa.Table):
        ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
        col = tbl["embedding"].combine_chunks()
        return ids, np.asarray(col.values, dtype=np.float64).reshape(len(ids), -1)

    def block_pair(batch: pa.Table) -> pa.Table:
        out = []
        for bi, bj in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_a, A = _mat(ray.get(refs[bi]))
            ids_b, B = (ids_a, A) if bj == bi else _mat(ray.get(refs[bj]))
            if not len(ids_a) or not len(ids_b):
                continue
            S = A @ B.T
            li, rj = np.nonzero(S >= threshold)
            la, rb = ids_a[li], ids_b[rj]
            if bi == bj:
                # diagonal block: symmetric matrix — keep one orientation
                keep = la < rb
                la, rb, s = la[keep], rb[keep], S[li[keep], rj[keep]]
            else:
                # off-diagonal: ids are disjoint; orient by id
                s = S[li, rj]
                lo = np.minimum(la, rb)
                rb = np.maximum(la, rb)
                la = lo
            out.append((la, rb, s))
        if not out:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        L = np.concatenate([o[0] for o in out])
        R = np.concatenate([o[1] for o in out])
        C = np.concatenate([o[2] for o in out])
        return pa.table({
            "left_id": pa.array(L, pa.int64()),
            "right_id": pa.array(R, pa.int64()),
            "cosine": pa.array(np.round(C, 5), pa.float64()),
        })

    tasks = ray.data.from_items(
        [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)])
    return tasks.map_batches(block_pair, batch_format="pyarrow", batch_size=1)


def q_embedding_near_dup_lsh(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-dup pairs via random-hyperplane LSH — the scale
    path dual of ``q_embedding_near_dup_pairs``: narrow band shuffle through
    the shared sort+segment-scan pair engine, exact-cosine verification via
    packed-payload hash joins (pipelines/similarity.embedding_near_dup_lsh).
    Rows-only for the driver (banding recall is probabilistic by design);
    subset-of-exact + recall >= 0.9 pinned by tests/test_round2.py."""
    from nhse_probabilistic_linkage_ray.pipelines.similarity import embedding_near_dup_lsh

    return embedding_near_dup_lsh(_load_embeddings(sf_dir), threshold)


def q_embedding_near_dup_lsh_checked(
    sf_dir: str, threshold: float = 0.4, recall_floor: float = 0.9
):
    """Hyperplane-LSH near-dup with a DRIVER-CHECKABLE quality gate (VERDICT
    r3 #4, mirroring ``similarity.ann_ivf_topk_checked``): runs the LSH scale
    path AND the exact block-pair path over the same embeddings, RAISES
    unless the LSH pair set is a subset of the exact set (precision is exact
    by construction — every emitted pair is verified with a true cosine) with
    set recall >= ``recall_floor``, then returns the exact rows so the SQL
    oracle can hash-verify values. A banding-recall regression now fails the
    driver's correctness row instead of passing rows-only."""
    lsh = q_embedding_near_dup_lsh(sf_dir, threshold).take_all()
    exact_rows = q_embedding_near_dup_pairs(sf_dir, threshold).take_all()
    got = {(r["left_id"], r["right_id"]) for r in lsh}
    want = {(r["left_id"], r["right_id"]) for r in exact_rows}
    if not got <= want:
        raise AssertionError(
            f"LSH emitted {len(got - want)} pairs outside the exact set — "
            "the exact-cosine verification stage is broken")
    recall = len(got & want) / max(1, len(want))
    if recall < recall_floor:
        raise AssertionError(
            f"LSH recall {recall:.3f} < floor {recall_floor}")
    return pa.table({
        "left_id": pa.array([r["left_id"] for r in exact_rows], pa.int64()),
        "right_id": pa.array([r["right_id"] for r in exact_rows], pa.int64()),
        "cosine": pa.array([r["cosine"] for r in exact_rows], pa.float64()),
    })


# ------------------------------------------------- corpus statistics (scale)

def q_vocab_top_tokens(sf_dir: str, k: int = 20):
    """Corpus vocabulary heavy-hitters: the top-k most frequent word tokens.

    The combiner pattern for counting at 100 TB (SURVEY.md §2.5 guidance —
    "pre-aggregate inside map_batches before a groupby"): each batch emits
    its OWN (token, n) partial counts via np.unique, so the shuffle moves
    per-batch vocabularies (bounded by distinct tokens) instead of the raw
    token stream (one row per token occurrence); the global groupby-sum then
    reduces partials, and only (n desc, token asc) top-k survives the sort.

    ASCII-only tokenization contract: the DuckDB oracle's regexp engine (RE2)
    treats ``\\w`` as ``[0-9A-Za-z_]``, so this side compiles with
    ``re.ASCII`` to match it exactly on ANY corpus, not just ASCII ones
    (ADVICE r2). Non-ASCII word characters are token separators on both
    sides by definition of the query.
    """
    import re

    word = re.compile(r"\w+", re.ASCII)

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks: list = []
        for t in batch["text"].to_pylist():
            toks.extend(word.findall((t or "").lower()))
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table({"token": pa.array(uniq.tolist(), pa.string()),
                         "n": pa.array(cnt, pa.int64())})

    from ray.data.aggregate import Sum

    totals = (_docs(sf_dir, ["text"])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n", alias_name="n")))
    return totals.sort(["n", "token"], descending=[True, False]).limit(k)


def q_doc_token_quantiles(sf_dir: str):
    """Per-language exact token-count quantiles (p25/p50/p75/p95) WITHOUT a
    global sort: distributed value-histogram, driver-side cumulative walk.

    The n_tokens domain is bounded (distinct counts ≪ documents), so exact
    quantiles reduce to: per-batch partial (lang, n, c) histograms ->
    groupby((lang, n)).sum(c) -> tiny cumulative scan. Quantile definition
    (shared with the SQL oracle): smallest n whose cumulative count reaches
    ceil(q * total) — i.e. quantile_disc semantics spelled out explicitly.
    """
    from nhse_probabilistic_linkage_ray.functions import textstats

    def partial_hist(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        n = textstats.token_count_ws(batch["text"].to_pylist())
        lang_u, lang_code = np.unique(langs, return_inverse=True)
        key = lang_code.astype(np.int64) << np.int64(32) | n
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "lang": pa.array(lang_u[(uk >> np.int64(32))].tolist(), pa.string()),
            "n": pa.array(uk & np.int64(0xFFFFFFFF), pa.int64()),
            "c": pa.array(cnt, pa.int64()),
        })

    from ray.data.aggregate import Sum

    hist = (_docs(sf_dir, ["lang", "text"])
            .map_batches(partial_hist, batch_format="pyarrow")
            .groupby(["lang", "n"]).aggregate(Sum("c", alias_name="c")))

    # the reduced histogram is bounded by (languages x distinct counts) —
    # a driver-side walk over it is the point of the histogram reduction
    rows = hist.take_all()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((int(r["n"]), int(r["c"])))

    qs = (0.25, 0.50, 0.75, 0.95)
    out = {"lang": [], "p25": [], "p50": [], "p75": [], "p95": []}
    for lang in sorted(by_lang):
        pairs = sorted(by_lang[lang])
        ns = np.array([p[0] for p in pairs], dtype=np.int64)
        cum = np.cumsum([p[1] for p in pairs], dtype=np.int64)
        tot = int(cum[-1])
        out["lang"].append(lang)
        for q, col in zip(qs, ("p25", "p50", "p75", "p95")):
            rank = int(np.ceil(q * tot))
            out[col].append(int(ns[int(np.searchsorted(cum, rank))]))
    return pa.table({
        "lang": pa.array(out["lang"], pa.string()),
        "p25": pa.array(out["p25"], pa.int64()),
        "p50": pa.array(out["p50"], pa.int64()),
        "p75": pa.array(out["p75"], pa.int64()),
        "p95": pa.array(out["p95"], pa.int64()),
    })


def q_embedding_dedup_keep_one(sf_dir: str, threshold: float = 0.4):
    """SemDeDup-shaped semantic dedup over the embedding column: exact cosine
    near-dup pair graph -> connected components -> one keeper per semantic
    group (cluster_id = min vec_id; kept = vec_id == cluster_id).

    Composes two already-verified distributed pieces: the blockwise exact
    cosine pair product (q_embedding_near_dup_pairs) and the pipeline's
    connected-components stage (driver union-find below the proven edge
    bound, large-star/small-star above it). The at-scale variant swaps the
    exact pair product for the hyperplane-LSH path (embedding_near_dup_lsh)
    feeding the same components stage."""
    from nhse_probabilistic_linkage_ray.config import PipelineConfig
    from nhse_probabilistic_linkage_ray.stages.cluster import assign_clusters, connected_components

    pairs = q_embedding_near_dup_pairs(sf_dir, threshold)
    edges = pairs.map_batches(
        lambda t: t.select(["left_id", "right_id"]).rename_columns(["u", "v"]),
        batch_format="pyarrow", zero_copy_batch=True)
    comps = connected_components(edges, PipelineConfig())
    ids = _load_embeddings(sf_dir).map_batches(
        lambda t: pa.table({"file_id": t["vec_id"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")
    assigned = assign_clusters(ids, comps, PipelineConfig())

    def finish(t: pa.Table) -> pa.Table:
        vid = t["file_id"].to_numpy(zero_copy_only=False)
        cl = t["cluster_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(vid, pa.int64()),
            "cluster_id": pa.array(cl, pa.int64()),
            "kept": pa.array(vid == cl, pa.bool_()),
        })

    return assigned.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- bloom incremental dedup

def q_bloom_incremental_dedup(sf_dir: str, n_bits: int = 1 << 17,
                              n_probes: int = 4):
    """Bloom-prefiltered incremental dedup: which NEW documents duplicate a
    BASE corpus, where duplicate means equal *word set* (the M9
    order-insensitive signature — sorted distinct ``\\w+`` words of
    ``lower(text)``). The deterministic split is new = doc_id % 5 == 0,
    base = the rest.

    This is the 10^12-scale membership pattern: the base corpus's keys are
    folded into a fixed-size Bloom bitmap (one streaming pass, per-batch
    partial bitmaps OR-combined), the new side probes the broadcast bitmap
    (vectorized bit tests), and only the tiny surviving candidate set —
    true duplicates plus the Bloom false-positive residue — is confirmed
    EXACTLY against a second base scan. The result is therefore exact (the
    Bloom filter only prunes), while neither side's key set is ever
    materialized in full: driver memory is the bitmap (n_bits/8 bytes)
    plus the candidate set (dup_rate + FPR of the new side).

    Key equality is compared through a 64-bit order-insensitive set hash
    (sum of splitmix64-finalized blake2b-64 word hashes); as elsewhere
    (substring_gram_pairs), a false equality needs a ~2^-64 collision.
    """
    from nhse_probabilistic_linkage_ray.functions.hashing import mix64
    from nhse_probabilistic_linkage_ray.functions.shingle import shingle_hashes
    from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
        word_hashes_column,
    )

    _U64 = np.uint64
    n_words = n_bits // 64
    # probe salts: distinct odd multipliers -> n_probes independent positions
    salts = mix64(np.arange(1, n_probes + 1, dtype=_U64) * _U64(0x9E3779B97F4A7C15))

    def set_keys(batch: pa.Table) -> np.ndarray:
        """Order-insensitive word-set hash per row (uint64)."""
        flat, offs = word_hashes_column(batch["text"])
        sh, so = shingle_hashes(flat, offs, 1)
        mixed = mix64(sh)
        keys = np.zeros(len(so) - 1, dtype=_U64)
        nz = np.flatnonzero(np.diff(so) > 0)
        if len(nz):
            keys[nz] = np.add.reduceat(mixed, so[nz])
        return keys

    def probe_positions(keys: np.ndarray) -> np.ndarray:
        """(len(keys), n_probes) int64 bit positions."""
        return np.stack([
            (mix64(keys * s) % _U64(n_bits)).astype(np.int64) for s in salts
        ], axis=1)

    docs = _docs(sf_dir, ["doc_id", "text"])

    # pass A: base-side partial Bloom bitmaps, OR-combined on the driver
    # (sparse per-batch encoding: only nonzero words ship; the combined
    # bitmap is n_bits/8 bytes regardless of corpus size)
    def base_bitmap(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(did % 5 != 0))
        bm = np.zeros(n_words, dtype=_U64)
        if len(sub):
            pos = probe_positions(set_keys(sub)).ravel()
            np.bitwise_or.at(bm, pos >> 6, _U64(1) << (pos & 63).astype(_U64))
        nz = np.flatnonzero(bm)
        return pa.table({"idx": pa.array(nz, pa.int64()),
                         "val": pa.array(bm[nz].view(np.int64), pa.int64())})

    bitmap = np.zeros(n_words, dtype=_U64)
    for b in docs.map_batches(base_bitmap, batch_format="pyarrow",
                              zero_copy_batch=True).iter_batches(
                                  batch_format="pyarrow"):
        idx = b["idx"].to_numpy(zero_copy_only=False)
        val = b["val"].to_numpy(zero_copy_only=False).view(_U64)
        np.bitwise_or.at(bitmap, idx, val)
    bm_ref = ray.put(bitmap)

    # pass B: new-side probe -> candidate (doc_id, key); tiny by contract
    def probe_new(batch: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(did % 5 == 0))
        if len(sub) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "key": pa.array([], pa.int64())})
        keys = set_keys(sub)
        pos = probe_positions(keys)
        hit = ((bm[pos >> 6] >> (pos & 63).astype(_U64)) & _U64(1)).astype(bool)
        cand = hit.all(axis=1)
        return pa.table({
            "doc_id": sub["doc_id"].combine_chunks().filter(pa.array(cand)),
            "key": pa.array(keys[cand].view(np.int64), pa.int64()),
        })

    cand_batches = list(docs.map_batches(
        probe_new, batch_format="pyarrow",
        zero_copy_batch=True).iter_batches(batch_format="pyarrow"))
    cand = (pa.concat_tables(cand_batches) if cand_batches
            else pa.table({"doc_id": pa.array([], pa.int64()),
                           "key": pa.array([], pa.int64())}))
    cand_keys = np.unique(cand["key"].to_numpy(zero_copy_only=False).view(_U64))
    ck_ref = ray.put(cand_keys)

    # pass C: exact confirm — which candidate keys truly occur base-side
    def confirm(batch: pa.Table) -> pa.Table:
        ck = ray.get(ck_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(did % 5 != 0))
        out = np.empty(0, dtype=np.int64)
        if len(sub) and len(ck):
            keys = set_keys(sub)
            i = np.minimum(np.searchsorted(ck, keys), len(ck) - 1)
            out = np.unique(keys[ck[i] == keys]).view(np.int64)
        return pa.table({"key": pa.array(out, pa.int64())})

    conf_parts = [b["key"].to_numpy(zero_copy_only=False).view(_U64)
                  for b in docs.map_batches(
                      confirm, batch_format="pyarrow",
                      zero_copy_batch=True).iter_batches(batch_format="pyarrow")]
    confirmed = (np.unique(np.concatenate(conf_parts)) if conf_parts
                 else np.empty(0, dtype=_U64))

    ckeys = cand["key"].to_numpy(zero_copy_only=False).view(_U64)
    if len(confirmed) and len(ckeys):
        i = np.minimum(np.searchsorted(confirmed, ckeys), len(confirmed) - 1)
        dup = confirmed[i] == ckeys
    else:
        dup = np.zeros(len(ckeys), dtype=bool)
    out = cand.filter(pa.array(dup)).select(["doc_id"])
    return ray.data.from_arrow(out)


def q_repo_overlap_pairs(sf_dir: str, gram_len: int = 5, min_shared: int = 3):
    """Repo-granularity duplicate detection (vendored-directory / fork
    screening — the north rule's "skewed mega-repos" concern at the REPO
    level, BASELINE.json): pairs of repos sharing >= ``min_shared`` distinct
    ``gram_len``-token substrings, scored by overlap = shared /
    min(|grams_1|, |grams_2|). The ``documents`` table's ``source`` column
    plays the repo key.

    Distributed plan — fat text never shuffles:
    1. per batch: token-window hashes per doc (the vectorized shingle
       kernels) -> in-batch-distinct (gram_hash, repo_id) rows;
    2. global distinct via a narrow groupby (a repo's grams recur across
       blocks, so the combiner alone cannot finish the job);
    3. the shared sort + segment-scan pair engine (``raw_band_pairs``)
       emits one row per (gram, repo-pair) collision; groupby(pair).count
       = shared-gram count;
    4. per-repo distinct-gram totals are a tiny aggregate (one row per
       repo) collected to the driver and broadcast for the overlap ratio
       and the id -> name attach. CONTRACT: the repo dimension is small
       relative to the corpus (names + totals fit the driver); at 10^8+
       repos the name attach becomes a narrow join, the math is unchanged.
    Repo ids are blake2b-64 of the name (order-free, cluster-stable);
    output pair order is lexicographic by NAME to match the SQL oracle.
    """
    from nhse_probabilistic_linkage_ray.functions.hashing import hash_strings_u64
    from nhse_probabilistic_linkage_ray.functions.shingle import (
        shingle_hashes,
        token_hashes_batch,
    )
    from nhse_probabilistic_linkage_ray.stages.candidates import raw_band_pairs

    def grams(batch: pa.Table) -> pa.Table:
        flat, offs = token_hashes_batch(batch["text"].to_pylist())
        sh, so = shingle_hashes(flat, offs, gram_len)
        rid = hash_strings_u64(batch["source"].to_pylist()).view(np.int64)
        rep = np.repeat(rid, np.diff(so))
        # in-batch distinct (combiner): cut the shuffle before the groupby
        both = np.empty(len(sh), dtype=[("g", "<u8"), ("r", "<i8")])
        both["g"], both["r"] = sh, rep
        both = np.unique(both)
        return pa.table({
            "band_hash": pa.array(both["g"].view(np.int64), pa.int64()),
            "file_id": pa.array(both["r"], pa.int64()),
        })

    distinct = _docs(sf_dir, ["text", "source"]) \
        .map_batches(grams, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby(["band_hash", "file_id"]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"]) \
        .map_batches(lambda t: t.append_column(
            "band_idx", pa.array(np.zeros(len(t), np.int32), pa.int32())),
            batch_format="pyarrow", zero_copy_batch=True)

    # per-repo distinct-gram totals + id->name map (tiny by contract)
    totals: dict = {}
    for b in distinct.groupby("file_id").aggregate(Count(alias_name="n")) \
            .iter_batches(batch_format="pyarrow"):
        for i, n in zip(b["file_id"].to_pylist(), b["n"].to_pylist()):
            totals[i] = n
    import pyarrow.compute as pc

    names: dict = {}
    for b in _docs(sf_dir, ["source"]).iter_batches(batch_format="pyarrow"):
        uniq = pc.unique(b["source"]).to_pylist()
        ids = hash_strings_u64(uniq).view(np.int64)
        names.update(zip(ids.tolist(), uniq))
    sorted_ids = np.array(sorted(totals), dtype=np.int64)
    n_arr = np.array([totals[i] for i in sorted_ids], dtype=np.int64)
    name_arr = np.array([names[i] for i in sorted_ids], dtype=object)
    ref = ray.put((sorted_ids, n_arr, name_arr))

    shared = raw_band_pairs(distinct, max_band_group=1 << 30, max_pairs=1 << 62) \
        .groupby(["left_id", "right_id"]).aggregate(Count(alias_name="shared"))

    def attach(batch: pa.Table) -> pa.Table:
        ids, n_by, nm_by = ray.get(ref)
        sh = batch["shared"].to_numpy(zero_copy_only=False)
        keep = sh >= min_shared
        l = batch["left_id"].to_numpy(zero_copy_only=False)[keep]
        r = batch["right_id"].to_numpy(zero_copy_only=False)[keep]
        sh = sh[keep]
        il = np.searchsorted(ids, l)
        ir = np.searchsorted(ids, r)
        if len(l) and not ((ids[il] == l).all() and (ids[ir] == r).all()):
            raise KeyError("repo id missing from broadcast totals")
        ov = np.round(sh / np.minimum(n_by[il], n_by[ir]), 6)
        nl, nr = nm_by[il], nm_by[ir]
        swap = nl > nr
        r1 = np.where(swap, nr, nl)
        r2 = np.where(swap, nl, nr)
        return pa.table({
            "r1": pa.array(r1.tolist(), pa.string()),
            "r2": pa.array(r2.tolist(), pa.string()),
            "shared": pa.array(sh.astype(np.int64), pa.int64()),
            "overlap": pa.array(ov, pa.float64()),
        })

    return shared.map_batches(attach, batch_format="pyarrow")
