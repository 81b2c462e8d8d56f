"""Search filters (reference SearchFilters — Q8/Q9).

DateRangeFilter and PathFilter from the reference
(src/oboyu/common/types/search_filters.py:17-110): date bounds on a
timestamp column, include/exclude glob patterns on a path-like column.
Globs are translated to Java regex (``*`` → ``.*``, ``?`` → ``.``,
other chars quoted) and applied as `rlike` — pushdown-friendly column
predicates, applied PRE-limit (documented deviation from the
reference's post-limit SQL quirk, SURVEY §2.7 Q8).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def glob_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def path_filter(
    col: Column,
    include: Sequence[str] | None = None,
    exclude: Sequence[str] | None = None,
) -> Column:
    """Boolean column: matches any include glob (if given) and no
    exclude glob."""
    cond = F.lit(True)
    if include:
        inc = F.lit(False)
        for p in include:
            inc = inc | col.rlike(glob_to_regex(p))
        cond = cond & inc
    for p in exclude or []:
        cond = cond & ~col.rlike(glob_to_regex(p))
    return cond


def date_range_filter(
    col: Column, start: str | None = None, end: str | None = None
) -> Column:
    cond = F.lit(True)
    if start:
        cond = cond & (col >= F.lit(start).cast("timestamp"))
    if end:
        cond = cond & (col < F.lit(end).cast("timestamp"))
    return cond


def apply_filters(
    docs: DataFrame,
    path_col: str | None = None,
    include: Sequence[str] | None = None,
    exclude: Sequence[str] | None = None,
    ts_col: str | None = None,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    out = docs
    if path_col and (include or exclude):
        out = out.filter(path_filter(F.col(path_col), include, exclude))
    if ts_col and (start or end):
        out = out.filter(date_range_filter(F.col(ts_col), start, end))
    return out
