"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Generates the pipeline's input table ``(repo, path, commit, lang, content)``
with controlled duplicate structure and a known ground-truth duplicate graph:

- base files: templated token streams per language
- exact duplicates: verbatim copies into other repos/paths
  (analog of the reference's exact-match comparison level,
  ``/root/reference/utils/parameter_lists.py:17``)
- near duplicates: seeded edits (whitespace/comment churn, identifier rename,
  line insert/delete) at controlled rates so true Jaccard falls in known
  bands above/below the pipeline threshold
- vendored subtree: ~20 files duplicated verbatim across many repos
  (mega-band / skew case) and a mega-repo holding ~30% of rows
- null/edge rows: empty, whitespace-only, single-line, non-ASCII
  (analog of the reference's null-level handling)

Everything derives from a single seed with per-entity ``default_rng`` streams
keyed by stable indices — identical output at any generation parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_LANGS = ["python", "js", "c", "text"]

_PY_TMPL = (
    "def {fn}({args}):\n"
    "    \"\"\"{doc}\"\"\"\n"
    "    {var} = {expr}\n"
    "    if {var} > {n}:\n"
    "        return {var} {op} {n2}\n"
    "    return {fallback}\n"
)
_JS_TMPL = (
    "function {fn}({args}) {{\n"
    "  // {doc}\n"
    "  const {var} = {expr};\n"
    "  if ({var} > {n}) {{ return {var} {op} {n2}; }}\n"
    "  return {fallback};\n"
    "}}\n"
)
_C_TMPL = (
    "static int {fn}(int {args_c}) {{\n"
    "    /* {doc} */\n"
    "    int {var} = {expr};\n"
    "    if ({var} > {n}) return {var} {op} {n2};\n"
    "    return {fallback};\n"
    "}}\n"
)
_TEXT_TMPL = "{doc} section {n}: value {var} equals {expr} with weight {n2}.\n"

_WORDS = [
    "alpha", "beta", "gamma", "delta", "omega", "parse", "merge", "index",
    "count", "total", "score", "batch", "chunk", "frame", "token", "shard",
    "node", "edge", "graph", "hashv", "state", "queue", "stack", "value",
]


def _commit_hex(key: str) -> str:
    return hashlib.sha256(("commit:" + key).encode()).hexdigest()[:40]


def _gen_base_content(rng: np.random.Generator, lang: str) -> str:
    n_funcs = int(rng.integers(4, 30))
    parts = []
    for f in range(n_funcs):
        w = lambda: _WORDS[int(rng.integers(0, len(_WORDS)))]
        fn = f"{w()}_{w()}{int(rng.integers(0, 100))}"
        a1, a2, var = w(), w(), w()
        sub = {
            "fn": fn, "args": f"{a1}, {a2}", "args_c": f"{a1}, int {a2}",
            "doc": f"{w()} {w()} {w()}", "var": var,
            "expr": f"{a1} {'+' if rng.integers(0, 2) else '*'} {a2}",
            "n": int(rng.integers(0, 1000)), "n2": int(rng.integers(0, 1000)),
            "op": ["+", "-", "*", "%"][int(rng.integers(0, 4))],
            "fallback": int(rng.integers(0, 10)),
        }
        tmpl = {"python": _PY_TMPL, "js": _JS_TMPL, "c": _C_TMPL, "text": _TEXT_TMPL}[lang]
        parts.append(tmpl.format(**sub))
    return "\n".join(parts)


def _edit_variant(rng: np.random.Generator, content: str, edit_rate: float) -> str:
    """Apply seeded line-level edits at the given rate (fraction of lines
    touched): delete / duplicate / comment-churn / whitespace-churn."""
    lines = content.split("\n")
    out = []
    for ln in lines:
        r = rng.random()
        if r < edit_rate * 0.25:
            continue                      # delete line
        if r < edit_rate * 0.5:
            out.append(ln)
            out.append(ln)                # duplicate line
        elif r < edit_rate * 0.75:
            out.append(ln + "  # v" + str(int(rng.integers(0, 99))))  # comment churn
        elif r < edit_rate:
            out.append("    " + ln)       # indentation churn (survives ws-normalization as tokens unchanged? no: indent isn't a token — pure ws churn)
            out.append("")
        else:
            out.append(ln)
    return "\n".join(out)


def generate_corpus(
    n_base: int = 400,
    seed: int = 42,
    exact_dup_frac: float = 0.25,
    near_dup_frac: float = 0.25,
    vendored_files: int = 20,
    vendored_repos: int = 12,
    n_repos: int = 40,
) -> pa.Table:
    """Build the files table. Deterministic in all parameters."""
    repos = [f"org{i % 7}/repo{i}" for i in range(n_repos)]
    repos[0] = "org0/mega"  # the mega-repo
    ext = {"python": "py", "js": "js", "c": "c", "text": "md"}

    rows = {k: [] for k in ("repo", "path", "commit", "lang", "content")}

    def add(repo, path, lang, content):
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(_commit_hex(f"{repo}/{path}"))
        rows["lang"].append(lang)
        rows["content"].append(content)

    base_contents = []
    for i in range(n_base):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        lang = _LANGS[i % len(_LANGS)]
        content = _gen_base_content(rng, lang)
        base_contents.append((lang, content))
        # ~30% of base rows land in the mega-repo (hash-assigned, FIXTURES.md)
        repo = repos[0] if (i * 2654435761) % 10 < 3 else repos[1 + (i * 40503) % (n_repos - 1)]
        add(repo, f"src/mod{i}/file{i}.{ext[lang]}", lang, content)

    # exact duplicates: first exact_dup_frac of base copied verbatim elsewhere
    for i in range(int(n_base * exact_dup_frac)):
        lang, content = base_contents[i]
        repo = repos[1 + (i * 7919) % (n_repos - 1)]
        add(repo, f"copy/of{i}.{ext[lang]}", lang, content)

    # near duplicates: next near_dup_frac of base get 1-3 edited variants
    lo = int(n_base * exact_dup_frac)
    for i in range(lo, lo + int(n_base * near_dup_frac)):
        lang, content = base_contents[i]
        rng = np.random.default_rng(seed * 9_000_017 + i)
        for v in range(1 + (i % 3)):
            # alternate tight edits (above threshold) and loose (below)
            rate = 0.04 if v % 2 == 0 else 0.5
            variant = _edit_variant(rng, content, rate)
            repo = repos[1 + ((i + v) * 104729) % (n_repos - 1)]
            add(repo, f"variant/v{v}_of{i}.{ext[lang]}", lang, variant)

    # vendored subtree copied verbatim into many repos (skew case)
    for f in range(vendored_files):
        rng = np.random.default_rng(seed * 77_003 + f)
        content = _gen_base_content(rng, "python")
        for rset in range(vendored_repos):
            repo = repos[(f + rset * 3) % n_repos]
            add(repo, f"vendor/lib/tool{f}.py", "python", content)

    # edge rows
    add(repos[2], "empty.py", "python", "")
    add(repos[2], "ws_only.py", "python", "   \n\t\n  \n")
    add(repos[3], "one_liner.py", "python", "x = 1")
    add(repos[3], "unicode.md", "text", "título: 数据 ≥ öäü — §42\nvalue naïve\n")

    return pa.table({
        "repo": pa.array(rows["repo"], pa.string()),
        "path": pa.array(rows["path"], pa.string()),
        "commit": pa.array(rows["commit"], pa.string()),
        "lang": pa.array(rows["lang"], pa.string()),
        "content": pa.array(rows["content"], pa.large_string()),
    })


def write_corpus_parquet(path: str, **kw) -> pa.Table:
    import pyarrow.parquet as pq

    t = generate_corpus(**kw)
    pq.write_table(t, path)
    return t
