"""Quality-screen queries (queries_quality.py): brute-force Python references
for the vectorized contamination / repetition kernels, plus edge cases the
synthetic corpus may not hit (empty text, punctuation-only, short docs,
all-duplicate lines)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nhse_probabilistic_linkage_ray.functions.hashing import hash_strings_u64
from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
    q_contamination_ngram_overlap,
    q_repetition_stats,
    word_hashes_column,
)

# RE2 \w is ASCII — the reference tokenizer must match (ADVICE r2)
_WORD = re.compile(r"\w+", re.ASCII)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),          # bench (0 % 3 == 0)
    (1, "the quick brown fox jumps over the lazy dog today"),          # exact copy of bench
    (2, "a b c"),                                                      # < gram_len tokens
    (3, "x\ny\nx\nz\nx"),                                              # dup lines (3 % 3 == 0 -> bench)
    (4, ""),                                                           # empty
    (5, "!!! ... ???"),                                                # punctuation only
    (6, "go go go go go go go go"),                                    # one repeated word
    (7, "the quick brown fox jumps over the lazy cat yesterday"),      # partial overlap
    (8, "same\nsame\nsame"),                                           # all-dup lines
]


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("qualdocs")
    ids, texts = zip(*DOCS)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(ids)),
                  "source": pa.array(["t"] * len(ids)),
                  "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        d / "documents.parquet")
    return str(d)


def _words(text: str) -> list:
    return _WORD.findall(text.lower())


class TestWordHashesColumn:
    def test_counts_match_re_ascii(self):
        texts = [t for _, t in DOCS] + ["a!b", "!a", "  ", "one"]
        flat, offs = word_hashes_column(pa.array(texts))
        assert list(np.diff(offs)) == [len(_words(t)) for t in texts]

    def test_same_word_same_hash_across_rows(self):
        flat, offs = word_hashes_column(pa.array(["alpha beta", "beta alpha"]))
        r0 = flat[offs[0]:offs[1]]
        r1 = flat[offs[1]:offs[2]]
        assert r0[0] == r1[1] and r0[1] == r1[0] and r0[0] != r0[1]

    def test_hashes_are_vocab_blake2b(self):
        flat, _ = word_hashes_column(pa.array(["zig zag"]))
        expect = hash_strings_u64(["zig", "zag"])
        assert list(flat) == list(expect)

    def test_sliced_batch_offsets(self):
        col = pa.array(["a b", "c d e", "f"]).slice(1, 2)
        flat, offs = word_hashes_column(col)
        assert list(np.diff(offs)) == [3, 1]


def _brute_repetition(text: str) -> tuple:
    lines = text.split("\n")
    dup = round((len(lines) - len(set(lines))) / len(lines), 6)
    ws = _words(text)
    if len(ws) < 2:
        top = 0.0
    else:
        bgs = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        best = max(bgs.count(b) for b in set(bgs))
        top = round(best / (len(ws) - 1), 6)
    return dup, top


def _brute_contamination(gram_len: int, bench_mod: int) -> dict:
    grams = {}
    for did, text in DOCS:
        ws = _words(text)
        grams[did] = {tuple(ws[i:i + gram_len])
                      for i in range(len(ws) - gram_len + 1)}
    bench = set().union(*(grams[d] for d, _ in DOCS if d % bench_mod == 0))
    out = {}
    for did, _ in DOCS:
        if did % bench_mod == 0:
            continue
        g = grams[did]
        hit = len(g & bench)
        out[did] = (len(g), hit, round(hit / len(g), 6) if g else 0.0)
    return out


class TestRepetitionStats(object):
    def test_matches_brute_force(self, docs_dir):
        got = {r["doc_id"]: (r["dup_line_frac"], r["top_bigram_frac"])
               for r in q_repetition_stats(docs_dir).take_all()}
        assert set(got) == {d for d, _ in DOCS}
        for did, text in DOCS:
            assert got[did] == pytest.approx(_brute_repetition(text)), did

    def test_edge_values(self, docs_dir):
        got = {r["doc_id"]: r for r in q_repetition_stats(docs_dir).take_all()}
        assert got[4]["dup_line_frac"] == 0.0 and got[4]["top_bigram_frac"] == 0.0
        assert got[8]["dup_line_frac"] == pytest.approx(round(2 / 3, 6))
        assert got[6]["top_bigram_frac"] == 1.0  # "go go" is every bigram


class TestStratifiedSample(object):
    def test_matches_brute_force_and_is_deterministic(self, tmp_path):
        import hashlib

        rng = np.random.default_rng(3)
        n = 400
        ids = np.arange(n, dtype=np.int64)
        langs = rng.choice(["en", "de", "fr"], size=n)
        pq.write_table(pa.table({"doc_id": pa.array(ids),
                                 "lang": pa.array(langs)}),
                       tmp_path / "documents.parquet")
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
            q_stratified_sample_per_lang,
        )
        k = 7
        rows = q_stratified_sample_per_lang(str(tmp_path), k=k).take_all()
        got = {(r["lang"], r["doc_id"], r["rn"]) for r in rows}
        expect = set()
        for lang in ("en", "de", "fr"):
            members = sorted(
                (hashlib.md5(str(i).encode()).hexdigest(), int(i))
                for i in ids[langs == lang])
            expect |= {(lang, did, rn + 1)
                       for rn, (_, did) in enumerate(members[:k])}
        assert got == expect
        # partial top-k per block must not depend on block layout
        rows2 = q_stratified_sample_per_lang(str(tmp_path), k=k).take_all()
        assert got == {(r["lang"], r["doc_id"], r["rn"]) for r in rows2}


class TestPiiRedaction(object):
    DOCS = [
        (0, "mail me at alice.smith+dev@example.co.uk or bob@x.io thanks"),
        (1, "key=deadbeefdeadbeefdeadbeefdeadbeef rest"),
        (2, "short hex deadbeef is fine; DEADBEEFdeadbeefDEADBEEFdeadbeefAA too long"),
        (3, ""),
        (4, "no pii here\njust text"),
        (5, "a@b.co c@d.ee e@f.gg"),
    ]

    @pytest.fixture(scope="class")
    def pii_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("piidocs")
        ids, texts = zip(*self.DOCS)
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts, pa.string())}),
                       d / "documents.parquet")
        return str(d)

    def test_matches_python_re(self, pii_dir):
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
            EMAIL_RE,
            SECRET_RE,
            q_pii_redaction,
        )
        email = re.compile(EMAIL_RE)
        secret = re.compile(SECRET_RE)
        got = {r["doc_id"]: r for r in q_pii_redaction(pii_dir).take_all()}
        assert set(got) == {d for d, _ in self.DOCS}
        for did, text in self.DOCS:
            assert got[did]["n_emails"] == len(email.findall(text)), did
            assert got[did]["n_secrets"] == len(secret.findall(text)), did
            expect = secret.sub("<SECRET>", email.sub("<EMAIL>", text))
            assert got[did]["redacted"] == expect, did

    def test_specific_counts(self, pii_dir):
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
            q_pii_redaction,
        )
        got = {r["doc_id"]: r for r in q_pii_redaction(pii_dir).take_all()}
        assert got[0]["n_emails"] == 2 and got[0]["n_secrets"] == 0
        assert got[1]["n_secrets"] == 1
        assert got[2]["n_secrets"] == 1  # only the 34-char run; 8-char ignored
        assert got[5]["n_emails"] == 3
        assert got[5]["redacted"] == "<EMAIL> <EMAIL> <EMAIL>"


class TestLineDedupGlobal(object):
    DOCS = [
        (0, "unique one\nshared line\nunique two"),
        (1, "shared line\nonly here"),
        (2, "self dup\nself dup\nlonely"),   # within-doc multiplicity counts
        (3, ""),                             # one empty line; dup iff another
        (4, "tail\n"),                       # trailing \n -> empty last line
        (5, "solo"),
    ]

    @pytest.fixture(scope="class")
    def line_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("linedocs")
        ids, texts = zip(*self.DOCS)
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts, pa.string())}),
                       d / "documents.parquet")
        return str(d)

    def test_matches_brute_force(self, line_dir):
        from collections import Counter

        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
            q_line_dedup_global,
        )
        counts = Counter(ln for _, t in self.DOCS for ln in t.split("\n"))
        got = {r["doc_id"]: r for r in q_line_dedup_global(line_dir).take_all()}
        assert set(got) == {d for d, _ in self.DOCS}
        for did, text in self.DOCS:
            lines = text.split("\n")
            kept = [ln for ln in lines if counts[ln] == 1]
            assert got[did]["n_lines"] == len(lines), did
            assert got[did]["n_kept"] == len(kept), did
            assert got[did]["cleaned"] == "\n".join(kept), did

    def test_edge_semantics(self, line_dir):
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
            q_line_dedup_global,
        )
        got = {r["doc_id"]: r for r in q_line_dedup_global(line_dir).take_all()}
        # "shared line" appears in docs 0 and 1 -> dropped from both
        assert got[0]["cleaned"] == "unique one\nunique two"
        assert got[1]["cleaned"] == "only here"
        # within-doc duplicate counts toward the corpus total
        assert got[2]["cleaned"] == "lonely"
        # the empty line occurs in doc 3 and doc 4's trailing split -> dup
        assert got[3]["n_kept"] == 0 and got[3]["cleaned"] == ""
        assert got[4]["cleaned"] == "tail"


class TestSequencePacking(object):
    def test_matches_brute_force_prefix_scan(self, tmp_path):
        rng = np.random.default_rng(11)
        n = 500
        ids = np.arange(n, dtype=np.int64)
        texts = [" ".join(["tok"] * int(k)) for k in rng.integers(0, 90, n)]
        pq.write_table(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts, pa.string())}),
                       tmp_path / "documents.parquet")
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
            q_sequence_packing,
        )
        budget = 256
        rows = q_sequence_packing(str(tmp_path), budget=budget).take_all()
        got = {r["doc_id"]: (r["n_tokens"], r["chunk_id"]) for r in rows}
        cum = 0
        for did, text in zip(ids, texts):
            nt = len(text.split()) if text.strip() else 0
            assert got[int(did)] == (nt, cum // budget), did
            cum += nt
        # chunks are contiguous: ids 0..max all present
        chunk_ids = sorted({v[1] for v in got.values()})
        assert chunk_ids == list(range(chunk_ids[-1] + 1))

    def test_doc_straddling_boundary_stays_in_starting_chunk(self, tmp_path):
        texts = ["a " * 10, "b " * 10, "c " * 10]  # budget 16: doc1 straddles
        pq.write_table(pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                                 "text": pa.array([t.strip() for t in texts])}),
                       tmp_path / "documents.parquet")
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
            q_sequence_packing,
        )
        got = {r["doc_id"]: r["chunk_id"]
               for r in q_sequence_packing(str(tmp_path), budget=16).take_all()}
        assert got == {0: 0, 1: 0, 2: 1}


class TestContamination(object):
    def test_matches_brute_force(self, docs_dir):
        expect = _brute_contamination(gram_len=8, bench_mod=3)
        got = {r["doc_id"]: (r["n_grams"], r["n_hit"], r["overlap_frac"])
               for r in q_contamination_ngram_overlap(
                   docs_dir, gram_len=8, bench_mod=3).take_all()}
        assert got == {k: (v[0], v[1], pytest.approx(v[2]))
                       for k, v in expect.items()}

    def test_exact_copy_fully_contaminated(self, docs_dir):
        got = {r["doc_id"]: r for r in q_contamination_ngram_overlap(
            docs_dir, gram_len=8, bench_mod=3).take_all()}
        # doc 1 is an exact copy of bench doc 0 -> every gram hits
        assert got[1]["n_grams"] == 3 and got[1]["overlap_frac"] == 1.0
        # doc 2 has < 8 tokens -> zero grams, zero overlap
        assert got[2]["n_grams"] == 0 and got[2]["overlap_frac"] == 0.0


class TestNgramNovelty(object):
    def test_matches_brute_force(self, docs_dir):
        from collections import Counter

        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
            q_ngram_novelty,
        )

        L = 4
        grams = {i: {tuple(_words(t)[j:j + L])
                     for j in range(len(_words(t)) - L + 1)}
                 for i, t in DOCS}
        df = Counter(g for gs in grams.values() for g in gs)
        expect = {}
        for i, gs in grams.items():
            n_dup = sum(1 for g in gs if df[g] >= 2)
            frac = 1.0 if not gs else round(1.0 - n_dup / len(gs), 6)
            expect[i] = (len(gs), n_dup, frac)

        got = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["novelty_frac"])
               for r in q_ngram_novelty(docs_dir, gram_len=L).take_all()}
        assert got == {k: (v[0], v[1], pytest.approx(v[2]))
                       for k, v in expect.items()}
        # doc 1 duplicates doc 0 exactly -> zero novelty; doc 4 empty -> 1.0
        assert got[1][2] == 0.0 and got[0][2] == 0.0
        assert got[4] == (0, 0, 1.0)


class TestBpeTokenCounts(object):
    def test_matches_python_re(self, tmp_path):
        from nhse_probabilistic_linkage_ray.pipelines.queries_quality import (
            BPE_SEGMENT_RE,
            q_bpe_token_counts,
        )

        texts = [
            "He said it's fine, we'll go — they've left!",
            "x=42; print('hi')  # 3.14 isn't bad",
            "",
            "   ",
            "word",
            "CamelCase under_score kebab-case 100x 2nd",
        ]
        pq.write_table(
            pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            tmp_path / "documents.parquet")

        seg = re.compile(BPE_SEGMENT_RE)
        ws = re.compile(r"\S+")
        got = {r["doc_id"]: r for r in q_bpe_token_counts(str(tmp_path)).take_all()}
        for i, t in enumerate(texts):
            n_seg = len(seg.findall(t))
            n_ws = len(ws.findall(t))
            assert got[i]["n_bpe_segments"] == n_seg, (i, t)
            assert got[i]["n_ws_tokens"] == n_ws
            want = round(n_seg / n_ws, 6) if n_ws else 0.0
            assert got[i]["segments_per_word"] == pytest.approx(want)
        # contractions split off: "it's" -> " it" + "'s" = 2 segments
        assert got[0]["n_bpe_segments"] > got[0]["n_ws_tokens"]


class TestVectorizedTextstatsTwins(object):
    """The Arrow column kernels must equal the scalar re.U kernels on ASCII
    text (the documented contract; they diverge on non-ASCII word chars)."""

    TEXTS = [
        "The quick brown fox, it is FAST!",
        "",
        "   ",
        "der und die das ist von mit nicht",
        "le la les et des est une dans que pour",
        "x=42; __private_var = f(a_b, 3.14)",
        "a",
        "!!! ??? ...",
        "the the the and and of",
        "word " * 500,  # long doc
    ]

    def test_quality_scores_equal(self):
        from nhse_probabilistic_linkage_ray.functions.textstats import (
            quality_scores,
            quality_scores_column,
        )

        want = quality_scores(self.TEXTS)
        got = quality_scores_column(pa.array(self.TEXTS, pa.string()))
        for k in want:
            assert np.allclose(got[k], want[k]), k

    def test_language_id_equal(self):
        from nhse_probabilistic_linkage_ray.functions.textstats import (
            language_id,
            language_id_column,
        )

        assert language_id_column(pa.array(self.TEXTS, pa.string())) == \
            language_id(self.TEXTS)

    def test_sliced_chunked_input(self):
        from nhse_probabilistic_linkage_ray.functions.textstats import (
            quality_scores,
            quality_scores_column,
        )

        arr = pa.chunked_array([self.TEXTS[:4], self.TEXTS[4:]])
        sl = pa.table({"t": arr}).slice(2, 6)["t"]
        want = quality_scores(self.TEXTS[2:8])
        got = quality_scores_column(sl)
        for k in want:
            assert np.allclose(got[k], want[k]), k
