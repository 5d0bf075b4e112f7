"""Per-turn text normalization — the engine's `clean_text` contract.

Reproduces, step-ordered, the reference's `postprocess_text` pipeline
(reference: app/services/analyze/text_extractor.py:286-346; SURVEY.md
§2.8 X1-X7) transplanted to transcript turns:

  X1 split to lines, strip, drop empties
  X2 char substitutions: 0→O 1→I 5→S, em/en dash → '-', curly quotes →
     straight (applied to the whole line including digits — lossy by
     design, faithful to the reference)
  X3 drop non-printable characters (Python str.isprintable semantics)
  X4 collapse whitespace runs to one space, trim
  X5 punctuation whitelist: keep only [\\w\\s.,!?:;'"-]; a line that
     cleans to '' is dropped (reference: `if final_line:`,
     text_extractor.py:333-336)
  X7 re-join lines with '\\n'

This module is **the single source of truth**: the Spark side calls it
inside an Arrow-vectorized scalar pandas_udf and the pandas oracle
calls the very same function, so the per-turn text-equality invariant
is byte-identical by construction (SURVEY.md §7.4: Python
`str.isprintable` differs subtly from Java regex classes — never
re-implement X2-X5 in JVM regex).
"""

from __future__ import annotations

import re

import pandas as pd

_CHAR_MAP = str.maketrans(
    {
        "0": "O",
        "1": "I",
        "5": "S",
        "—": "-",  # em dash
        "–": "-",  # en dash
        "‘": "'",  # left single curly
        "’": "'",  # right single curly
        "“": '"',  # left double curly
        "”": '"',  # right double curly
    }
)
_WS_RE = re.compile(r"\s+")
_WHITELIST_RE = re.compile(r"[^\w\s.,!?:;'\"-]")


def clean_text_py(s: str | None) -> str | None:
    """Normalize one turn's text. None stays None (not '')."""
    if s is None:
        return None
    lines = []
    for line in s.split("\n"):  # X1
        line = line.strip()
        if not line:
            continue
        line = line.translate(_CHAR_MAP)  # X2
        if not line.isprintable():  # X3 (C-speed precheck: the
            # per-char filter only runs on lines that actually contain
            # a non-printable — semantics unchanged, ~10× faster on
            # typical corpora where such lines are rare)
            line = "".join(ch for ch in line if ch.isprintable())
        line = _WS_RE.sub(" ", line).strip()  # X4
        line = _WHITELIST_RE.sub("", line)  # X5
        if line:  # reference keeps a processed line only `if final_line:`
            # (text_extractor.py:333-336) — a line the X5 whitelist
            # reduces to '' is dropped, not kept as an empty line
            lines.append(line)
    return "\n".join(lines)  # X7


def clean_text_series(s: pd.Series) -> pd.Series:
    """Vectorized wrapper used by both the Spark pandas_udf and oracle."""
    return s.map(clean_text_py, na_action="ignore").astype(object)


def txt_len_series(clean: pd.Series) -> pd.Series:
    """X6 length feature over cleaned text (nullable Int32)."""
    return clean.str.len().astype("Int32")


def txt_words_series(clean: pd.Series) -> pd.Series:
    """Whitespace-token count over cleaned text; '' → 0 (nullable Int32)."""
    return clean.str.split().str.len().astype("Int32")


def len_class_py(txt_len) -> str | None:
    """3-way threshold binning of a length feature.

    Faithful analog of the reference's font-weight binning thresholds
    (font_detector.py:83-107: mean intensity ≥250 Light, >190 Regular,
    else Bold) applied to txt_len. Null length → None.
    """
    if txt_len is None or pd.isna(txt_len):
        return None
    if txt_len >= 250:
        return "Light"
    if txt_len > 190:
        return "Regular"
    return "Bold"
