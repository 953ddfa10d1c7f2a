"""Brute-force all-pairs reference implementation.

The test oracle the pipeline's cluster assignments are checked against
(BASELINE.md: dup-pair recall >= 0.99 at the same shingle/signature config) —
the analog of the reference's expected-duplicates evaluation join
(``/root/reference/utils/eval_utils.py:451-481``) with the expected pairs
computed exhaustively instead of from a supersession table.

Shares the *exact same kernels* (normalize/shingle/jaccard) as the pipeline,
so "same shingle/signature config" holds by construction; what it does NOT
share is any of the LSH/banding machinery under test. Driver-side and O(n^2)
by design — small corpora only.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from nhse_probabilistic_linkage_ray.config import PipelineConfig
from nhse_probabilistic_linkage_ray.functions.hashing import file_id_column
from nhse_probabilistic_linkage_ray.functions.jaccard import jaccard_sorted
from nhse_probabilistic_linkage_ray.functions.normalize import normalize_content
from nhse_probabilistic_linkage_ray.functions.shingle import shingle_set, token_hashes_batch
from nhse_probabilistic_linkage_ray.state.union_find import UnionFind


@dataclass
class OracleResult:
    dup_pairs: set          # {(l, r)} l<r, member-level, is_dup only
    pair_rows: list         # dicts: left_id,right_id,jaccard_exact,is_dup,tier
    clusters: dict          # {file_id: cluster_id=min member}
    file_ids: np.ndarray


def brute_force(files: pa.Table, config: PipelineConfig | None = None) -> OracleResult:
    config = config or PipelineConfig()
    fid = file_id_column(files["repo"].combine_chunks(), files["path"].combine_chunks(),
                         files["commit"].combine_chunks())
    contents = files["content"].to_pylist()
    n = len(contents)

    sha = [hashlib.sha256((c or "").encode("utf-8", "surrogatepass")).hexdigest() for c in contents]
    norm = [normalize_content(c, strip_trailing_ws=config.strip_trailing_ws,
                              collapse_blank_lines=config.collapse_blank_lines,
                              lowercase=config.lowercase) or "" for c in contents]
    shingles = [shingle_set(t, config.shingle_k) for t in norm]
    n_tok = [len(token_hashes_batch([t])[0]) for t in norm]

    # group key: norm-content hash when shingled, raw sha otherwise
    # (zero-shingle rows are null-tier for near-dup, exact-only — see
    # stages/ingest.py which applies the identical rule)
    gkey = []
    for i in range(n):
        if len(shingles[i]) > 0:
            gkey.append("N" + hashlib.sha256(norm[i].encode("utf-8", "surrogatepass")).hexdigest())
        else:
            gkey.append("S" + sha[i])

    groups: dict = {}
    for i in range(n):
        groups.setdefault(gkey[i], []).append(i)
    reps = {k: min(v, key=lambda i: fid[i]) for k, v in groups.items()}

    uf = UnionFind()
    for i in range(n):
        uf.find(int(fid[i]))
    pair_rows, dup_pairs = [], set()

    def record(i, j, jac, tier):
        a, b = int(fid[i]), int(fid[j])
        if a == b:
            return
        l, r = (a, b) if a < b else (b, a)
        is_dup = tier == "exact" or jac >= config.jaccard_threshold
        pair_rows.append({"left_id": l, "right_id": r, "jaccard_exact": float(jac),
                          "is_dup": bool(is_dup), "tier": tier})
        if is_dup:
            dup_pairs.add((l, r))
            uf.union(l, r)

    # intra-group pairs: exact (same sha) or jaccard 1.0 (same normalized form)
    for k, members in groups.items():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                record(i, j, 1.0, "exact" if sha[i] == sha[j] else "near")

    # cross-group pairs among shingled representatives
    rep_idx = [i for k, i in reps.items() if len(shingles[i]) > 0]
    for x in range(len(rep_idx)):
        for y in range(x + 1, len(rep_idx)):
            i, j = rep_idx[x], rep_idx[y]
            jac = jaccard_sorted(shingles[i], shingles[j])
            if jac >= config.rescue_low:  # only record interesting pairs
                record(i, j, jac, "near")
                # expand dup verdicts to all group members
                if jac >= config.jaccard_threshold:
                    for mi in groups[gkey[i]]:
                        for mj in groups[gkey[j]]:
                            if mi != i or mj != j:
                                record(mi, mj, jac, "near")

    clusters = {int(f): int(c) for f, c in uf.components().items()}
    return OracleResult(dup_pairs=dup_pairs, pair_rows=pair_rows, clusters=clusters, file_ids=fid)


def cluster_pairs(clusters: dict) -> set:
    """Expand a {node: cluster_id} assignment to the set of co-member pairs —
    the unit 'dup-pair recall' is measured in (cluster co-membership, matching
    the reference's cluster-assignment contract)."""
    from collections import defaultdict

    byc = defaultdict(list)
    for f, c in clusters.items():
        byc[c].append(f)
    out = set()
    for members in byc.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                out.add((members[x], members[y]))
    return out
