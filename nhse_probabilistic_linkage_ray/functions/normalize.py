"""Content normalization kernels.

Code-dedup analog of the reference's cleaning functions
(``/root/reference/utils/preprocessing_utils.py``):

- ``preprocess_postcode`` (:71-125, strip/upper/0->O canonicalization) and
  ``standardise_white_space`` (:307-371, trim + collapse ``\\s+``) become
  content canonicalization that merges trivially-differing file variants:
  newline canonicalization, trailing-whitespace strip, blank-line collapse,
  optional lowercasing.
- ``clean_name`` (:264-303, regexp-remove boilerplate words) becomes optional
  license-header / shebang boilerplate stripping before shingling.

All functions operate on Python string lists / numpy object arrays with
compiled regexes (compiled once at module import — the per-actor state the
reference keeps in registered UDFs, SURVEY.md T1/T2).
"""

from __future__ import annotations

import re

_CRLF = re.compile(r"\r\n?")
_TRAILING_WS = re.compile(r"[ \t]+(?=\n)|[ \t]+\Z")
_MANY_BLANK = re.compile(r"\n{3,}")
_WS_RUN = re.compile(r"[ \t]+")
# Leading comment block styles covering the langs in the fixture corpus;
# analog of the reference's NAMES_TO_IGNORE regex removal
# (/root/reference/utils/preprocessing_utils.py:161-168).
_LICENSE_HEADER = re.compile(
    r"\A(?:(?:#[^\n]*\n)+|/\*.*?\*/\s*|(?://[^\n]*\n)+)", re.S
)
_TOKEN = re.compile(r"\w+|[^\w\s]", re.U)


def normalize_content(
    text: str | None,
    *,
    strip_trailing_ws: bool = True,
    collapse_blank_lines: bool = True,
    lowercase: bool = False,
) -> str | None:
    """Canonicalize one file's content. None/empty stays None-ish ('' -> '')."""
    if text is None:
        return None
    t = _CRLF.sub("\n", text)
    if strip_trailing_ws:
        t = _TRAILING_WS.sub("", t)
    if collapse_blank_lines:
        t = _MANY_BLANK.sub("\n\n", t)
    if lowercase:
        t = t.lower()
    return t


def normalize_batch(texts: list, **kw) -> list:
    return [normalize_content(t, **kw) for t in texts]


def normalize_content_column(col, *, strip_trailing_ws: bool = True,
                             collapse_blank_lines: bool = True,
                             lowercase: bool = False):
    """Arrow-vectorized ``normalize_content`` over a whole string column.

    Uses RE2 kernels (``pc.replace_substring_regex``) for the three
    normalization regexes — all Unicode-agnostic patterns, verified
    equivalent to the Python ``re`` forms — and ``pc.utf8_lower``. Rows that
    are not pure ASCII are re-run through the scalar ``normalize_content``
    so Unicode case-mapping edge cases (utf8proc vs CPython) can never
    diverge from the oracle's Python-kernel definition.

    Returns (normalized pa.Array, ascii_mask numpy bool array).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = pc.replace_substring_regex(col, pattern=r"\r\n?", replacement="\n")
    if strip_trailing_ws:
        # RE2 multiline '[ \t]+$' == Python '[ \t]+(?=\n)|[ \t]+\Z' (both
        # zero-width anchors; \r already canonicalized away above)
        t = pc.replace_substring_regex(t, pattern=r"(?m)[ \t]+$", replacement="")
    if collapse_blank_lines:
        t = pc.replace_substring_regex(t, pattern=r"\n{3,}", replacement="\n\n")
    if lowercase:
        t = pc.utf8_lower(t)

    ascii_mask = pc.fill_null(pc.string_is_ascii(col), True).to_numpy(zero_copy_only=False)
    if not ascii_mask.all():
        vals = t.to_pylist()
        src = col.to_pylist()
        for i in np.flatnonzero(~ascii_mask):
            vals[i] = normalize_content(
                src[i], strip_trailing_ws=strip_trailing_ws,
                collapse_blank_lines=collapse_blank_lines, lowercase=lowercase)
        t = pa.array(vals, type=col.type)
    return t, ascii_mask


def token_count_column(norm_col, ascii_mask=None):
    """Arrow-vectorized ``len(tokenize(text))`` per row (RE2 count of the
    token regex). RE2's ``\\w`` is ASCII-only while Python's is Unicode-aware,
    so non-ASCII rows (per ``ascii_mask``, or detected here) fall back to the
    scalar ``tokenize`` — bit-identical counts on any corpus."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(norm_col, pa.ChunkedArray):
        norm_col = norm_col.combine_chunks()
    cnt = pc.fill_null(
        pc.count_substring_regex(norm_col, pattern=r"\w+|[^\w\s]"), 0
    ).cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
    if ascii_mask is None:
        ascii_mask = pc.fill_null(pc.string_is_ascii(norm_col), True).to_numpy(
            zero_copy_only=False)
    if not ascii_mask.all():
        vals = norm_col.to_pylist()
        for i in np.flatnonzero(~ascii_mask):
            cnt[i] = len(tokenize(vals[i]))
    return cnt


def strip_license_header(text: str | None) -> str | None:
    """Remove a leading comment block (license/shebang boilerplate) so that
    files differing only in header don't block on it (analog of clean_name,
    /root/reference/utils/preprocessing_utils.py:264-303)."""
    if text is None:
        return None
    return _LICENSE_HEADER.sub("", text, count=1)


def standardise_whitespace(text: str | None, replace_with: str = " ") -> str | None:
    """Trim + collapse horizontal whitespace runs; direct parity with the
    reference's standardise_white_space 'one'/'none' modes
    (/root/reference/utils/preprocessing_utils.py:307-371)."""
    if text is None:
        return None
    return _WS_RUN.sub(replace_with, text).strip()


def tokenize(text: str | None) -> list:
    """Split normalized content into tokens: identifier/number words plus
    single punctuation chars. The analog of split_names + array handling at
    /root/reference/utils/preprocessing_utils.py:173-183; shingles are built
    from these tokens (SURVEY.md M5)."""
    if not text:
        return []
    return _TOKEN.findall(text)


def lang_from_path(path: str | None) -> str:
    """Map a file path extension to a language family — the code-dedup recast
    of extract_outcode_from_postcode (/root/reference/utils/preprocessing_utils.py:17-31):
    a cheap regex-derived categorical used as an auxiliary key."""
    if not path:
        return "unknown"
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    return _EXT_LANG.get(ext, "text")


_EXT_LANG = {
    "py": "python", "pyi": "python",
    "c": "c", "h": "c", "cc": "cpp", "cpp": "cpp", "hpp": "cpp",
    "js": "js", "jsx": "js", "ts": "js", "tsx": "js",
    "java": "java", "go": "go", "rs": "rust", "rb": "ruby",
    "sh": "shell", "md": "text", "txt": "text", "json": "config",
    "yml": "config", "yaml": "config", "toml": "config",
}
