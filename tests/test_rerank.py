"""Rerank stage: hashing-backend determinism vs a pure-python twin,
reference semantics (truncation, sigmoid, threshold-then-top_k), the
gated real-model slot, and the prefetch pipeline arithmetic."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from oboyu_spark.operators import rerank as R


def _py_score(query: str, text: str, max_length: int = 512) -> float:
    content = (text or "")[: max_length * 3]
    h = hashlib.md5(f"{query}\x1f{content}".encode("utf-8")).hexdigest()
    logit = int(h[:8], 16) / 2147483648.0 - 1.0
    return float(1.0 / (1.0 + np.exp(-logit)))


@pytest.fixture(scope="module")
def cand_df(spark):
    rows = [
        (1, "spark joins tables fast"),
        (2, "unrelated text about cooking"),
        (3, "query planning in spark"),
        (4, ""),
        (5, None),
        (6, "x" * 5000),  # exercises the max_length*3 truncation
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rerank_matches_python_twin(spark, cand_df):
    q = "spark query"
    got = {r["doc_id"]: r["rerank_score"]
           for r in R.rerank(cand_df, q).collect()}
    rows = {r["doc_id"]: r["text"] for r in cand_df.collect()}
    for did, text in rows.items():
        assert got[did] == pytest.approx(_py_score(q, text), abs=1e-12)
    # truncation is real: scoring the full 5000-char text differs
    full = hashlib.md5(f"{q}\x1f{'x' * 5000}".encode()).hexdigest()
    trunc = hashlib.md5(f"{q}\x1f{'x' * 1536}".encode()).hexdigest()
    assert full != trunc
    assert got[6] == pytest.approx(_py_score(q, "x" * 1536), abs=1e-12)


def test_rerank_order_threshold_topk(spark, cand_df):
    q = "spark query"
    allr = R.rerank(cand_df, q).collect()
    scores = [r["rerank_score"] for r in allr]
    assert scores == sorted(scores, reverse=True)

    thr = scores[2]  # keep exactly the top 3 (>= semantics)
    kept = R.rerank(cand_df, q, threshold=thr).collect()
    assert [r["doc_id"] for r in kept] == [r["doc_id"] for r in allr[:3]]

    top2 = R.rerank(cand_df, q, top_k=2, threshold=thr).collect()
    assert [r["doc_id"] for r in top2] == [r["doc_id"] for r in allr[:2]]


def test_rerank_model_slot_gated(spark, cand_df):
    with pytest.raises((ImportError, NotImplementedError)):
        R.rerank(cand_df, "q", model="cl-nagoya/ruri-reranker-small")


def test_rerank_search_pipeline(spark):
    """rerank_search = BM25 top limit×mult → hydrate → rerank → top
    limit: the output ids are a subset of the prefetch candidates and
    ordered by rerank score."""
    from oboyu_spark.operators.bm25 import bm25_search

    docs_df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    q = "spark query join table"
    out = R.rerank_search(docs_df, q, limit=5, multiplier=2,
                          round_digits=6).collect()
    assert len(out) == 5
    prefetch = {r["doc_id"] for r in
                bm25_search(docs_df, q, k=10, round_digits=6).collect()}
    assert {r["doc_id"] for r in out} <= prefetch
    scores = [r["rerank_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
