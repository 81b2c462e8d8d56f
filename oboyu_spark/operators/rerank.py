"""Cross-encoder reranking stage (reference:
src/oboyu/retriever/services/reranker.py — CrossEncoderReranker /
ONNXCrossEncoderReranker scoring (query, content) pairs, sigmoid-
normalized to [0, 1], sorted desc, threshold + top_k cuts; prefetch
arithmetic at search_orchestrator.py:76-95 = limit × multiplier,
already mirrored by fusion.rerank_expansion).

No model runtime exists in this container, so — like operators/embed —
this operator ships the SPARK SHAPE with two backends:

- ``model="hashing"`` (default, always available): the pair logit is
  u32(md5(query ␟ truncated_content)[:8 hex]) / 2^31 − 1 ∈ [−1, 1),
  then the reference's sigmoid normalization. Deterministic and
  reproducible in DuckDB (md5 of the same UTF-8 bytes; values compared
  at the driver's 6-dp rounding, same risk class as the sqrt/ln every
  other scoring oracle already carries) — this makes the rerank
  pipeline exact-oracle checkable instead of rows-only.
- any other ``model``: the cross-encoder slot, gated behind an
  import-try that raises loudly (the janorm/embed degradation
  contract). The mapInPandas ITERATOR prologue is where a real model
  would load ONCE per python worker — a cross-encoder load is seconds
  and must not be paid per Arrow batch.

Reference semantics kept: content truncated to ``max_length * 3``
characters before scoring (reranker.py:113-116), sigmoid
normalization (reranker.py:145-146), threshold means ``>=`` on the
normalized score (reranker.py:152-154), top_k after threshold.
Documented deviation: the reference's descending sort is a stable
python sort (ties keep retrieval order); a distributed engine has no
retrieval order to be stable against, so ties break on
(rerank_score desc, doc_id asc) — the engine-wide tie-break.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference separator between query and content in the hashing pair
#: key — an ASCII unit separator, vanishingly unlikely in text
_PAIR_SEP = "\x1f"


def _hash_rerank_batch(query: str, texts: pd.Series,
                       max_length: int) -> np.ndarray:
    """Deterministic pair scores: logit = u32(md5)[:8]/2^31 − 1 over
    the truncated pair, then sigmoid — every pre-sigmoid step is exact
    (integer < 2^32, division by a power of two), matching DuckDB's
    md5()/substr()/exp() chain at the driver's rounding."""
    cut = max_length * 3
    out = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        content = (t or "")[:cut]
        h = hashlib.md5(
            f"{query}{_PAIR_SEP}{content}".encode("utf-8")
        ).hexdigest()
        out[i] = int(h[:8], 16) / 2147483648.0 - 1.0
    return 1.0 / (1.0 + np.exp(-out))


def rerank(
    candidates: DataFrame,
    query: str,
    top_k: Optional[int] = None,
    threshold: Optional[float] = None,
    model: str = "hashing",
    max_length: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int | None = None,
) -> DataFrame:
    """(id, rerank_score) over a candidate frame — the distributed twin
    of RerankerService.rerank. Candidates are a top-k list (tens to
    hundreds of rows), so the scoring pass is one narrow mapInPandas
    over however few partitions the list arrives in; no shuffle is
    introduced before the final (tiny) top-k sort."""
    if model != "hashing":
        try:  # pragma: no cover - not installed in this container
            import sentence_transformers  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                f"model={model!r} needs a cross-encoder runtime on the "
                "executors — only the deterministic 'hashing' backend "
                "is available in this environment"
            ) from exc
        raise NotImplementedError  # pragma: no cover — real-model slot

    id_field = candidates.schema[id_col]
    out_schema = (
        f"{id_col} {id_field.dataType.simpleString()}, rerank_score double"
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # prologue: model init happens HERE, once per worker — the
        # hashing backend has nothing to load, a cross-encoder would
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "rerank_score": _hash_rerank_batch(
                    query, pdf[text_col], max_length
                ),
            })

    scored = candidates.select(id_col, text_col).mapInPandas(
        _score, out_schema
    )
    if round_digits is not None:
        scored = scored.select(
            id_col,
            F.round("rerank_score", round_digits).alias("rerank_score"),
        )
    if threshold is not None:
        scored = scored.filter(F.col("rerank_score") >= threshold)
    out = scored.orderBy(
        F.col("rerank_score").desc(), F.col(id_col).asc()
    )
    return out.limit(top_k) if top_k is not None else out


def rerank_search(
    docs: DataFrame,
    query: str,
    limit: int = 10,
    multiplier: int = 2,
    threshold: Optional[float] = None,
    model: str = "hashing",
    max_length: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int | None = None,
) -> DataFrame:
    """The reference's rerank-enabled search pipeline
    (search_orchestrator.py:76-95): BM25-prefetch limit × multiplier
    candidates (H5 arithmetic, fusion.rerank_expansion), hydrate their
    text, cross-encode, return the top ``limit`` by rerank score.

    Scale shape: the prefetch is the existing BM25 top-k machinery (or
    the persisted index via searchidx — any top-k frame with an id and
    text column reranks the same way); the rerank stage only ever sees
    limit × multiplier rows, so model inference cost is bounded by the
    serving contract, not the corpus."""
    from .bm25 import bm25_search, hydrate
    from .fusion import rerank_expansion

    prefetch = rerank_expansion(limit, multiplier)
    top = bm25_search(docs, query, k=prefetch, id_col=id_col,
                      text_col=text_col, round_digits=round_digits)
    hydrated = hydrate(top, docs, [text_col])
    return rerank(
        hydrated, query, top_k=limit, threshold=threshold, model=model,
        max_length=max_length, id_col=id_col, text_col=text_col,
        round_digits=round_digits,
    )
