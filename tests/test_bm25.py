"""BM25 invariants from the reference test suite (FIXTURES.md F3/F4),
asserted against BOTH the Spark engine and the pure-Python oracle, plus
rank+score agreement between the two on a larger synthetic corpus."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from oboyu_spark.operators import bm25 as B
from oboyu_spark.operators import termindex as TI
from oboyu_spark.oracle.pybm25 import PyBM25

# F3: verbatim corpus from reference tests/indexer/algorithm/test_bm25_indexer.py:20-80
F3 = [
    (1, "Python programming language Python"),
    (2, "Java programming language"),
    (3, "Python data science analysis"),
    (4, "machine learning Python TensorFlow"),
    (5, "web development JavaScript Python"),
]


def _docs_df(spark, corpus):
    return spark.createDataFrame(corpus, "doc_id long, text string")


@pytest.fixture(scope="module")
def f3_tables(spark):
    docs = _docs_df(spark, F3)
    tf = TI.term_frequencies(docs)
    ds = TI.document_stats(tf)
    vocab = TI.vocabulary(tf)
    cs = TI.collection_stats(docs, ds)
    return docs, tf, ds, vocab, cs


def test_document_frequencies(f3_tables):
    _, _, _, vocab, _ = f3_tables
    dfm = {r["term"]: r["document_frequency"] for r in vocab.collect()}
    assert dfm["python"] == 4
    assert dfm["programming"] == 2
    assert dfm["javascript"] == 1


def test_term_frequency_case_folded(f3_tables):
    _, tf, _, _, _ = f3_tables
    row = tf.filter((F.col("doc_id") == 1) & (F.col("term") == "python")).collect()
    assert row[0]["tf"] == 2


def test_collection_stats_counts_empty_docs(spark):
    docs = _docs_df(spark, [(1, "")])
    tf = TI.term_frequencies(docs)
    cs = TI.collection_stats(docs, TI.document_stats(tf)).collect()[0]
    assert cs["total_documents"] == 1
    assert cs["total_terms"] == 0


def test_negative_idf_allowed(spark):
    # term in >N/2 docs → negative IDF (reference test_bm25_indexer.py:176-178)
    corpus = [(i, "common word here") for i in range(1, 7)] + [
        (7, "rare thing"),
    ]
    docs = _docs_df(spark, corpus)
    tf = TI.term_frequencies(docs)
    vocab = TI.vocabulary(tf)
    cs = TI.collection_stats(docs, TI.document_stats(tf))
    idf = {r["term"]: r["idf"] for r in TI.idf_scores(vocab, cs).collect()}
    assert idf["common"] < 0
    assert idf["rare"] > 0
    # exact formula
    assert idf["common"] == pytest.approx(math.log((7 - 6 + 0.5) / (6 + 0.5)))


def test_score_matches_oracle_f3(spark, f3_tables):
    docs, tf, ds, vocab, cs = f3_tables
    oracle = PyBM25()
    oracle.index(F3)

    for q in ["python", "tensorflow", "python programming", "python python"]:
        res = B.bm25_search(docs, q, k=10).collect()
        exp = oracle.search(q, k=10)
        assert [r["doc_id"] for r in res] == [d for d, _ in exp], q
        for r, (_, s) in zip(res, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9), q


def test_duplicate_query_terms_double_score(spark, f3_tables):
    """Query terms are a LIST (reference semantics): a term appearing
    twice contributes twice, so 'python python' scores exactly 2× the
    single-term query per doc. Pinned here since the dedicated driver
    entry (bm25_topk_dup_terms) was retired for the r5 50-entry cap."""
    docs, *_ = f3_tables
    one = {r["doc_id"]: r["score"]
           for r in B.bm25_search(docs, "python", k=10).collect()}
    two = {r["doc_id"]: r["score"]
           for r in B.bm25_search(docs, "python python", k=10).collect()}
    assert set(one) == set(two) and one
    for d, s in one.items():
        assert two[d] == pytest.approx(2 * s, rel=1e-9)


def test_tensorflow_scores_doc4_only(spark, f3_tables):
    docs, *_ = f3_tables
    res = B.bm25_search(docs, "tensorflow", k=10).collect()
    assert len(res) == 1
    assert res[0]["doc_id"] == 4
    assert res[0]["score"] > 0


def test_length_normalization(spark):
    # reference test_bm25_indexer.py:330-399 — shorter doc with same tf
    # scores higher; with b=0 the length effect disappears.
    corpus = [
        (1, "specialword other"),
        (2, "specialword " + " ".join(["other"] * 10)),
        (3, "unrelated content here"),
        (4, "more unrelated content"),
        (5, "entirely different text"),
    ]
    docs = _docs_df(spark, corpus)
    res = {r["doc_id"]: r["score"] for r in B.bm25_search(docs, "specialword", k=5).collect()}
    assert res[1] > res[2]

    res0 = {r["doc_id"]: r["score"] for r in B.bm25_search(docs, "specialword", k=5, b=0.0).collect()}
    assert res0[1] == pytest.approx(res0[2], rel=1e-9)


def test_rank_and_score_identity_on_synthetic_corpus(spark):
    rng = random.Random(42)
    vocab_pool = (
        "python java spark data index search engine query token score "
        "学習 検索 索引 日本語 形態素 分散 処理 高速 大規模 文書"
    ).split()
    corpus = []
    for i in range(300):
        n = rng.randint(0, 40)
        corpus.append((i, " ".join(rng.choice(vocab_pool) for _ in range(n))))
    docs = _docs_df(spark, corpus)
    oracle = PyBM25()
    oracle.index(corpus)

    queries = ["python spark", "検索 索引", "data 処理 engine", "score",
               "python python java", "missingterm", "高速 大規模 文書 index"]
    for q in queries:
        res = B.bm25_search(docs, q, k=20).collect()
        exp = oracle.search(q, k=20)
        assert [r["doc_id"] for r in res] == [d for d, _ in exp], q
        for r, (_, s) in zip(res, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9), q


def test_like_search(spark, f3_tables):
    docs, *_ = f3_tables
    res = B.like_search(docs, ["programming", "language"], k=10).collect()
    assert [r["doc_id"] for r in res] == [1, 2]
    assert all(r["score"] == 1.0 for r in res)


def test_search_plan_rewrite_matches_composed_operators(spark):
    """r8: bm25_search's two-pass plan (one stats aggregate + one
    query-term-filtered explode) must score identically to the
    composed term_frequencies/document_stats/vocabulary/
    collection_stats pipeline it replaced, across modes, IDF variants
    and duplicate query terms. Compared the way the driver compares
    (round_digits=6, sort on the ROUNDED score) — raw-float summation
    order differs between any two plans and flips exact-tie order."""
    from oboyu_spark.functions.text import py_tokenize
    from oboyu_spark.operators.termindex import (
        collection_stats, document_stats, term_frequencies, vocabulary,
    )

    rows = [
        (f"d{i:02d}",
         ("spark query join " * (1 + i % 3))
         + ("table scan " if i % 4 == 0 else "filter push ")
         + ("" if i % 5 else "rare_gem "))
        for i in range(40)
    ] + [("dempty", ""), ("dshort", "xy")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    def composed(q, mode, variant):
        terms = py_tokenize(q, min_token_length=2)
        tf = term_frequencies(docs)
        ds = document_stats(tf)
        cs = collection_stats(docs, ds)
        return B.topk(
            B.bm25_scores(tf, vocabulary(tf), ds, cs, terms, mode=mode,
                          idf_variant=variant), 20, round_digits=6)

    for q, mode, variant in [
        ("spark join rare_gem", "or", "raw_ln"),
        ("spark join rare_gem", "and", "raw_ln"),
        ("spark spark query", "or", "raw_ln"),
        ("table rare_gem", "or", "lucene_log10"),
        ("absentterm spark", "and", "raw_ln"),
        ("absentterm spark", "or", "raw_ln"),
    ]:
        a = [(r["doc_id"], r["score"]) for r in
             composed(q, mode, variant).collect()]
        got = [(r["doc_id"], r["score"]) for r in
               B.bm25_search(docs, q, k=20, mode=mode, round_digits=6,
                             idf_variant=variant).collect()]
        assert a == got, (q, mode, variant)
