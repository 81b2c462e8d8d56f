"""Sliding-window document chunker (reference C1 semantics).

Behavioral spec pinned from the reference DocumentChunker
(/root/reference/src/oboyu/indexer/core/document_chunker.py:27-113):

- empty / whitespace-only text → one empty chunk [""]
- text ≤ chunk_size → single chunk, verbatim
- otherwise windows of chunk_size chars with chunk_overlap overlap;
  each window's end snaps to the best break before `end`:
  paragraph "\n\n" first, else the LATEST of {". ", "。", "! ", "？",
  "? ", "！", "\n"} (+1 to include the punctuation) — a break only
  counts if it lies past start + chunk_size//2; chunks are stripped
  and empty ones dropped; forced-progress guard mirrors the
  reference's infinite-loop escape (start bumped by chunk_size//2).

Spark surface: a vectorized Arrow pandas UDF producing array<string>,
plus ``chunk_documents`` which posexplodes into one row per chunk with
a deterministic chunk id ``doc_id#chunk_idx`` (the reference's uuid4
ids are deliberately replaced — SURVEY §2.3 C2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHUNK_SIZE_DEFAULT = 1024  # reference processing_config.py:13
CHUNK_OVERLAP_DEFAULT = 256  # reference processing_config.py:14

_SENTENCE_BREAKS = [". ", "。", "! ", "？", "? ", "！", "\n"]


def py_chunk_text(
    text: str | None,
    chunk_size: int = CHUNK_SIZE_DEFAULT,
    chunk_overlap: int = CHUNK_OVERLAP_DEFAULT,
) -> list[str]:
    """Pure-Python chunker — reference-behavior parity target."""
    if not text or not text.strip():
        return [""]
    if len(text) <= chunk_size:
        return [text]

    chunks: list[str] = []
    start = 0
    n = len(text)
    iters = 0
    while start < n and iters < 10_000:
        iters += 1
        end = start + chunk_size
        if end < n:
            end = _best_break(text, start, end, chunk_size)
        chunk = text[start:end].strip()
        if chunk:
            chunks.append(chunk)
        old_start = start
        start = end - chunk_overlap if end < n else n
        if start <= old_start and iters > 1:
            start = old_start + max(1, chunk_size // 2)
    return chunks


def _best_break(text: str, start: int, end: int, chunk_size: int) -> int:
    half = start + chunk_size // 2
    para = text.rfind("\n\n", start, end)
    if para != -1 and para > half:
        return para
    breaks = [text.rfind(b, start, end) for b in _SENTENCE_BREAKS]
    valid = [b for b in breaks if b != -1 and b > half]
    if valid:
        return max(valid) + 1
    return end


def chunks_udf(
    chunk_size: int = CHUNK_SIZE_DEFAULT,
    chunk_overlap: int = CHUNK_OVERLAP_DEFAULT,
):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _chunk(s: pd.Series) -> pd.Series:
        return s.map(lambda t: py_chunk_text(t, chunk_size, chunk_overlap))

    return _chunk


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE_DEFAULT,
    chunk_overlap: int = CHUNK_OVERLAP_DEFAULT,
) -> DataFrame:
    """One row per chunk: (chunk_id, doc_id, chunk_index, text)."""
    arr = chunks_udf(chunk_size, chunk_overlap)(F.col(text_col))
    return _explode_chunks(docs, arr, id_col)


def chunk_documents_fixed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = CHUNK_SIZE_DEFAULT,
    chunk_overlap: int = CHUNK_OVERLAP_DEFAULT,
) -> DataFrame:
    """Fixed-stride chunker, FULLY RELATIONAL (VERDICT r3 #7): windows
    of ``chunk_size`` chars every ``chunk_size − chunk_overlap`` chars,
    no boundary snapping — sequence + transform + substring, zero
    Python in the plan (whole-stage-codegen'd, unlike the snapping
    chunker's Arrow UDF), and therefore exactly reproducible in DuckDB
    (the snap-free twin the driver oracle checks).

    Edge contract mirrors the reference chunker where snapping plays no
    role: empty/whitespace-only text → one empty chunk; text ≤
    chunk_size → single verbatim chunk; windows are space-trimmed and
    empty ones dropped, chunk_index renumbering the kept ones."""
    step = chunk_size - chunk_overlap
    if step < 1:
        raise ValueError(
            f"chunk_overlap={chunk_overlap} must be smaller than "
            f"chunk_size={chunk_size}"
        )
    t = F.col(text_col)
    windows = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.length(t), F.lit(step)),
            lambda i: F.trim(t.substr(i, F.lit(chunk_size))),
        ),
        lambda x: x != "",
    )
    arr = (
        F.when(t.isNull() | (F.trim(t) == ""), F.array(F.lit("")))
        .when(F.length(t) <= chunk_size, F.array(t))
        .otherwise(windows)
    )
    return _explode_chunks(docs, arr, id_col)


def _explode_chunks(docs: DataFrame, arr, id_col: str) -> DataFrame:
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(arr).alias("chunk_index", "text")
    )
    return exploded.select(
        F.concat_ws(
            "#", F.col("doc_id").cast("string"), F.col("chunk_index").cast("string")
        ).alias("chunk_id"),
        "doc_id",
        "chunk_index",
        "text",
    )
