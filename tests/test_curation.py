"""Code-curation screens (round 3): brute-force Python references for
q_code_quality_screens, q_license_header_screen and
q_bloom_incremental_dedup over a hand-built corpus whose edge cases the
synthetic tables may not hit (empty text, >1000-char minified line, digit
blobs, license headers past/inside the 512-char window, word-set duplicates
straddling the incremental split, tiny Bloom bitmaps with real false
positives)."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import (
    q_bloom_incremental_dedup,
)
from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
    _LICENSE_RE,
    q_code_quality_screens,
    q_license_header_screen,
)

_WORD = re.compile(r"\w+", re.ASCII)

# (doc_id, text, source); new side of the incremental split = doc_id % 5 == 0
DOCS = [
    (0, "unique new doc zero", "src_a"),
    (1, "alpha beta gamma", "src_a"),                      # base
    (2, "x" * 1200, "src_a"),                              # one minified line
    (3, "// SPDX-License-Identifier: MIT\nint main() {}", "src_b"),
    (4, "", "src_b"),                                      # empty
    (5, "beta gamma alpha alpha", "src_b"),                # new; word set == doc 1
    (6, "1234567890" * 30, "src_b"),                       # digit blob, 1 line of 300
    (7, "Licensed under the Apache License, Version 2.0\n" + "y " * 400, "src_c"),
    (8, "z " * 300 + "spdx-license-identifier: gpl",       # marker past 512 chars
     "src_c"),
    (9, "short\nlines\nonly", "src_c"),                    # base
    (10, "gamma beta alpha", "src_c"),                     # new; word set == doc 1
    (11, "alpha beta gamma", "src_c"),                     # base dup of base (not in result)
    (15, "totally novel words here", "src_c"),             # new; no base match
]


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("curation")
    t = pa.table({
        "doc_id": pa.array([x[0] for x in DOCS], pa.int64()),
        "text": pa.array([x[1] for x in DOCS], pa.string()),
        "lang": pa.array(["py"] * len(DOCS), pa.string()),
        "source": pa.array([x[2] for x in DOCS], pa.string()),
        "n_chars": pa.array([len(x[1]) for x in DOCS], pa.int64()),
    })
    pq.write_table(t, f"{d}/documents.parquet")
    return str(d)


def _brute_screens(text: str) -> dict:
    lines = text.split("\n")
    n_lines = len(lines)
    lens = [len(ln) for ln in lines]
    max_line, sum_line = max(lens), sum(lens)
    n_chars = len(text)
    n_alnum = sum(c.isascii() and c.isalnum() for c in text)
    n_digit = sum(c.isdigit() and c.isascii() for c in text)
    keep = int(max_line <= 1000 and sum_line <= 100 * n_lines
               and 4 * n_alnum >= n_chars)
    return {"n_lines": n_lines, "max_line_len": max_line,
            "sum_line_len": sum_line, "n_chars": n_chars,
            "n_alnum": n_alnum, "n_digit": n_digit, "keep": keep}


class TestCodeQualityScreens(object):
    def test_matches_brute_force(self, docs_dir):
        got = {r["doc_id"]: r for r in q_code_quality_screens(docs_dir).take_all()}
        assert set(got) == {d for d, _, _ in DOCS}
        for did, text, _ in DOCS:
            exp = _brute_screens(text)
            for k, v in exp.items():
                assert got[did][k] == v, (did, k)

    def test_edge_verdicts(self, docs_dir):
        got = {r["doc_id"]: r for r in q_code_quality_screens(docs_dir).take_all()}
        assert got[2]["keep"] == 0          # 1200-char line
        assert got[4]["keep"] == 1          # empty text passes everything
        assert got[6]["keep"] == 0          # 300-char single line > 100 avg
        assert got[9]["keep"] == 1


class TestLicenseHeaderScreen(object):
    def test_matches_brute_force(self, docs_dir):
        got = {r["source"]: (r["n_docs"], r["n_licensed"])
               for r in q_license_header_screen(docs_dir).take_all()}
        pat = re.compile(_LICENSE_RE.replace("(?i)", ""), re.IGNORECASE)
        exp: dict = {}
        for _, text, src in DOCS:
            n, lic = exp.get(src, (0, 0))
            exp[src] = (n + 1, lic + bool(pat.search(text[:512])))
        assert got == exp

    def test_window_semantics(self, docs_dir):
        got = {r["source"]: r["n_licensed"]
               for r in q_license_header_screen(docs_dir).take_all()}
        # src_b: doc 3 (SPDX header) only; src_c: doc 7 in-window, doc 8's
        # marker sits past the 512-char head and must NOT count
        assert got["src_b"] == 1
        assert got["src_c"] == 1
        assert got["src_a"] == 0


class TestBloomIncrementalDedup(object):
    def _expected(self):
        sets = {d: frozenset(_WORD.findall(t.lower())) for d, t, _ in DOCS}
        base = {sets[d] for d, _, _ in DOCS if d % 5 != 0}
        return sorted(d for d, _, _ in DOCS if d % 5 == 0 and sets[d] in base)

    def test_matches_brute_force(self, docs_dir):
        got = sorted(r["doc_id"]
                     for r in q_bloom_incremental_dedup(docs_dir).take_all())
        assert got == self._expected() == [5, 10]

    def test_exact_despite_tiny_bitmap(self, docs_dir):
        # 64-bit bitmap with 1 probe: false-positive candidates are near
        # certain, but the exact confirm pass must keep the result identical
        got = sorted(r["doc_id"] for r in q_bloom_incremental_dedup(
            docs_dir, n_bits=64, n_probes=1).take_all())
        assert got == self._expected()


# ---------------------------------------------------------------- mixture /
# shard routing (round 3): sources follow the documents-table contract
# ("src<k>"), doc_ids include values near 2^31 so the Knuth multiplicative
# hash is exercised across the full 32-bit product range on both the numpy
# uint64 path and (in the driver harness) DuckDB's BIGINT path.
MIX_DOCS = [
    (did, f"doc {did} body", f"src{s}")
    for did, s in [
        (0, 0), (1, 1), (2, 2), (3, 3), (4, 10), (5, 11), (6, 12), (7, 13),
        (17, 0), (40, 1), (99, 2), (123, 3), (1000, 7), (54321, 5),
        (2**31 - 1, 9), (2**31 - 2, 8), (123456789, 4), (7777777, 6),
    ]
]

_KNUTH32 = 2654435761


def _mix_hash(did: int) -> int:
    return (did * _KNUTH32) % (1 << 32)


@pytest.fixture(scope="module")
def mix_docs_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("mixture")
    t = pa.table({
        "doc_id": pa.array([x[0] for x in MIX_DOCS], pa.int64()),
        "text": pa.array([x[1] for x in MIX_DOCS], pa.string()),
        "lang": pa.array(["py"] * len(MIX_DOCS), pa.string()),
        "source": pa.array([x[2] for x in MIX_DOCS], pa.string()),
        "n_chars": pa.array([len(x[1]) for x in MIX_DOCS], pa.int64()),
    })
    pq.write_table(t, f"{d}/documents.parquet")
    return str(d)


class TestMixtureSample(object):
    def _expected(self):
        keep = []
        for did, _, src in MIX_DOCS:
            w = int(src[3:]) % 4 + 1
            if _mix_hash(did) < w * (1 << 29):
                keep.append((did, src))
        return sorted(keep)

    def test_matches_brute_force(self, mix_docs_dir):
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import q_mixture_sample
        got = sorted((r["doc_id"], r["source"])
                     for r in q_mixture_sample(mix_docs_dir).take_all())
        exp = self._expected()
        assert got == exp
        # the fixture must actually exercise both verdicts
        assert 0 < len(exp) < len(MIX_DOCS)

    def test_rate_monotonicity(self, mix_docs_dir):
        # same doc_id under a higher-rate source can only become MORE likely
        # to be kept: verify the threshold ordering directly on the kernel
        for did, _, _ in MIX_DOCS:
            h = _mix_hash(did)
            kept = [h < w * (1 << 29) for w in (1, 2, 3, 4)]
            assert kept == sorted(kept)


class TestShardManifest(object):
    def test_matches_brute_force(self, mix_docs_dir):
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import q_shard_manifest
        got = {r["shard_id"]: (r["n_docs"], r["n_chars"])
               for r in q_shard_manifest(mix_docs_dir).take_all()}
        exp: dict = {}
        for did, text, _ in MIX_DOCS:
            sh = _mix_hash(did) % 32
            n, c = exp.get(sh, (0, 0))
            exp[sh] = (n + 1, c + len(text))
        assert got == exp

    def test_totals_conserved(self, mix_docs_dir):
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import q_shard_manifest
        rows = q_shard_manifest(mix_docs_dir, n_shards=8).take_all()
        assert sum(r["n_docs"] for r in rows) == len(MIX_DOCS)
        assert sum(r["n_chars"] for r in rows) == sum(len(t) for _, t, _ in MIX_DOCS)
        assert all(0 <= r["shard_id"] < 8 for r in rows)
