"""Snippet extraction + query-term highlighting (reference Q11).

Functional re-expression of the reference's snippet service
(snippet_extractor.py / text_highlighter.py / snippet_strategies.py /
japanese_snippet_processor.py): best-window selection around query-term
matches, ``**term**`` markdown highlighting, and the strategy surface:

- ``strategy="fixed"``     density window, word-boundary-snapped (the
                           default; has a full DuckDB oracle)
- ``strategy="sentence"``  fixed window adjusted to end at a sentence
                           boundary — JP-aware: 。！？ endings when the
                           window contains Japanese characters
                           (japanese_snippet_processor.py:20-35,92-114),
                           else the last ``[.!?]\\s+`` match
                           (snippet_strategies.py:132-154); falls back
                           to the fixed window when the adjusted text
                           drops below 50% of the target length
                           (snippet_strategies.py:126-130)
- ``strategy="paragraph"`` sentence result adjusted to the last
                           ``\\n\\s*\\n`` break, 30% fallback
                           (snippet_strategies.py:183-230)

All strategies run as a vectorized Arrow UDF over hydrated top-k rows
(k rows per query, so this never touches the big-data path).
"""

from __future__ import annotations

import re
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


_JP_CHARS = re.compile(r"[぀-ゟ゠-ヿ一-龯]")
_JP_SENT_END = re.compile(r"[。！？]")
_EN_SENT_END = re.compile(r"[.!?]\s+")
_PARA_BREAK = re.compile(r"\n\s*\n")


def _avoid_word_breaks(text: str) -> str:
    """reference snippet_strategies.py:156-180 (its forward rescan is
    unreachable — if the backward scan finds no non-alnum char there is
    none — so it is not reproduced here)."""
    if not text:
        return text
    if text[-1].isalnum():
        for i in range(len(text) - 1, -1, -1):
            if not text[i].isalnum():
                return text[: i + 1].strip()
    return text.strip()


def _sentence_adjust(text: str) -> str:
    """Cut at the last sentence boundary, JP-aware
    (snippet_strategies.py:95-154, japanese_snippet_processor.py)."""
    if _JP_CHARS.search(text):
        ends = [m.end() for m in _JP_SENT_END.finditer(text)]
        return text[: ends[-1]].strip() if ends else text
    matches = list(_EN_SENT_END.finditer(text))
    if matches:
        return text[: matches[-1].end()].strip()
    return _avoid_word_breaks(text)


def _paragraph_adjust(text: str) -> str:
    """Cut at the last paragraph break (snippet_strategies.py:217-240);
    the JP variant uses the same \\n\\s*\\n pattern."""
    matches = list(_PARA_BREAK.finditer(text))
    if matches:
        return text[: matches[-1].start()].strip()
    return _sentence_adjust(text)


def py_snippet(
    text: str | None,
    terms: Sequence[str],
    length: int = 160,
    highlight: bool = True,
    strategy: str = "fixed",
) -> str:
    """Best window of ``length`` chars by query-term match density,
    optionally boundary-adjusted per ``strategy`` (see module doc)."""
    if not text:
        return ""
    if not terms:
        return text[:length]
    # DISTINCT terms: a duplicated query token must not double-weight
    # its positions in the density window (keeps the engine identical
    # to the oracle SQL, which scans per distinct term)
    terms = list(dict.fromkeys(terms))
    lowered = text.lower()
    positions: list[int] = []
    for t in terms:
        start = 0
        tl = t.lower()
        while True:
            i = lowered.find(tl, start)
            if i < 0:
                break
            positions.append(i)
            start = i + 1
    if not positions:
        snippet = text[:length]
    else:
        positions.sort()
        # densest window: two-pointer over match positions
        best_start, best_count = positions[0], 1
        j = 0
        for i in range(len(positions)):
            while positions[i] - positions[j] >= length:
                j += 1
            if i - j + 1 > best_count:
                best_count = i - j + 1
                best_start = positions[j]
        start = max(0, best_start - 20)
        # snap to a word boundary
        if start > 0:
            sp = text.rfind(" ", max(0, start - 20), start)
            if sp >= 0:
                start = sp + 1
        snippet = text[start : start + length]
    if strategy == "sentence":
        adjusted = _sentence_adjust(snippet)
        if len(adjusted) >= length * 0.5:  # snippet_strategies.py:126-130
            snippet = adjusted
    elif strategy == "paragraph":
        base = _sentence_adjust(snippet)
        if len(base) < length * 0.5:
            base = snippet
        adjusted = _paragraph_adjust(base)
        snippet = adjusted if len(adjusted) >= length * 0.3 else base
    elif strategy != "fixed":
        raise ValueError(f"unknown snippet strategy {strategy!r}")
    if highlight:
        # (-len, term) not plain len: set iteration order is process-
        # dependent, and equal-length ties must replace in a fixed
        # order for cross-engine (oracle) reproducibility
        for t in sorted(set(terms), key=lambda s: (-len(s), s)):
            snippet = re.sub(
                re.escape(t), lambda m: f"**{m.group(0)}**", snippet,
                flags=re.IGNORECASE,
            )
    return snippet


def with_snippets(
    results: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    out_col: str = "snippet",
    length: int = 160,
    highlight: bool = True,
    strategy: str = "fixed",
) -> DataFrame:
    terms = list(terms)

    @F.pandas_udf(T.StringType())
    def _snip(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: py_snippet(t, terms, length, highlight, strategy)
        )

    return results.withColumn(out_col, _snip(F.col(text_col)))
