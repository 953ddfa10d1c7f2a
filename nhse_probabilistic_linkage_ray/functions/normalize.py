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
