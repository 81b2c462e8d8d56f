"""Snippet extraction + query-term highlighting (reference Q11).

Functional re-expression of the reference's snippet service
(snippet_extractor.py / text_highlighter.py — best-window selection
around query-term matches, ``**term**`` markdown highlighting). The
reference's full behavior spans ~580 LoC of strategy classes; this
implements the core contract — deterministic best window by match
density, word-boundary-snapped, all query-term occurrences highlighted
case-insensitively — as a vectorized Arrow UDF over hydrated top-k rows
(k rows per query, so this never touches the big-data path).
"""

from __future__ import annotations

import re
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def py_snippet(
    text: str | None,
    terms: Sequence[str],
    length: int = 160,
    highlight: bool = True,
) -> str:
    """Best window of ``length`` chars by query-term match density."""
    if not text:
        return ""
    if not terms:
        return text[:length]
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
) -> DataFrame:
    terms = list(terms)

    @F.pandas_udf(T.StringType())
    def _snip(s: pd.Series) -> pd.Series:
        return s.map(lambda t: py_snippet(t, terms, length, highlight))

    return results.withColumn(out_col, _snip(F.col(text_col)))
