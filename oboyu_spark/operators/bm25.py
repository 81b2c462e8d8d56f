"""BM25 scoring + top-k as a declarative Spark plan (the relational path).

Semantics pinned to the reference's in-memory implementation — the one
its unit tests execute (SURVEY §0.1 impl (1)):

    score(D, Q) = Σ_{t in Q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    idf(t)      = ln((N − df + 0.5) / (df + 0.5))        # may be negative
    k1 = 1.2, b = 0.75                                   # bm25_indexer.py:32-33

Reference quirks preserved:
- query terms are a LIST — a term repeated in the query contributes once
  per occurrence (bm25_indexer.py:332 ``for term in query_terms``); we
  fold duplicates into a qtf multiplier (same sum, one join).
- df == 0 → term contributes 0 (calculate_bm25_term_score early return).
- dl == 0 → doc scores 0 (bm25_indexer.py:327-329) — automatic here,
  since such docs have no postings.
- tie-break: the reference leaves ordering of equal scores undefined; we
  fix (score DESC, doc_id ASC) on both engine and oracle (SURVEY §0.1).

Scale shape: query terms + their (df, idf) are tiny → broadcast; the
only big-data operand is the postings relation filtered by term
(partition-prunable when the index is bucketed by hash(term) — see
operators/postings.py). The per-doc SUM is a hash aggregate with
map-side partials; top-k is TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import B_DEFAULT, K1_DEFAULT
from ..functions.text import py_tokenize
from .termindex import (
    collection_stats,
    document_stats,
    idf_expr,
    term_frequencies,
    vocabulary,
)


def query_term_weights(
    spark: SparkSession, query_terms: Sequence[str]
) -> DataFrame:
    """(term, qtf) — list semantics folded into a multiplicity column."""
    counts = Counter(query_terms)
    rows = [(t, int(c)) for t, c in sorted(counts.items())]
    if not rows:
        rows = []
    return spark.createDataFrame(rows, "term string, qtf long")


def bm25_scores(
    tf: DataFrame,
    vocab: DataFrame,
    doc_stats: DataFrame,
    cstats: DataFrame,
    query_terms: Sequence[str],
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    mode: str = "or",
    idf_variant: str = "raw_ln",
) -> DataFrame:
    """(doc_id, score).

    ``mode="or"`` (reference semantics): every doc matching ≥1 query
    term, disjunctive SUM. ``mode="and"`` (north-rule posting-list
    intersection): only docs containing ALL distinct query terms — if
    any query term is absent from the corpus the result is empty.

    ``tf``: (doc_id, term, tf); ``vocab``: (term, document_frequency, _);
    ``doc_stats``: (doc_id, total_terms, ...); ``cstats``: singleton.
    """
    spark = tf.sparkSession
    qdf = query_term_weights(spark, query_terms)
    n_distinct_terms = len(set(query_terms))

    # Tiny per-term side: query terms ⋈ vocabulary ⋈ collection scalars.
    qterm = (
        vocab.join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(cstats))
        .select(
            "term",
            "qtf",
            idf_expr(
                F.col("document_frequency"), F.col("total_documents"),
                idf_variant,
            ).alias("idf"),
            F.col("avg_document_length").alias("avgdl"),
        )
    )

    matched = tf.join(F.broadcast(qterm), "term")
    with_dl = matched.join(
        doc_stats.select("doc_id", F.col("total_terms").alias("dl")), "doc_id"
    )
    term_score = (
        F.col("qtf")
        * F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))
        )
    )
    agg = with_dl.groupBy("doc_id").agg(
        F.sum(term_score).alias("score"),
        F.count(F.lit(1)).alias("_nt"),  # (doc,term) rows are distinct
    )
    if mode == "and":
        agg = agg.filter(F.col("_nt") == n_distinct_terms)
    elif mode != "or":
        raise ValueError(f"unknown mode {mode!r}")
    return agg.drop("_nt")


def topk(scores: DataFrame, k: int, round_digits: int | None = None) -> DataFrame:
    """Deterministic top-k: (score DESC, doc_id ASC), optional rounding.

    Rounding (default off) is used by the oracle-comparison harness so
    float summation-order noise (~1e-15) can't flip boundary rows: the
    sort key is the ROUNDED score on both engine and oracle.
    """
    if round_digits is not None:
        scores = scores.select(
            "doc_id", F.round(F.col("score"), round_digits).alias("score")
        )
    return scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def hydrate(topk_df: DataFrame, docs: DataFrame, doc_cols: Sequence[str]) -> DataFrame:
    """Join top-k ids back to the docs table (reference Q10).

    The k-row side broadcasts; the docs scan prunes to the join keys.
    """
    return (
        docs.select("doc_id", *doc_cols)
        .join(F.broadcast(topk_df), "doc_id")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_digits: int | None = None,
    min_token_length: int = 2,
    mode: str = "or",
    idf_variant: str = "raw_ln",
) -> DataFrame:
    """End-to-end BM25 over a raw docs DataFrame (index built inline).

    This is the correctness-gate path: it recomputes tf/vocab/stats from
    the corpus each call. Production uses the persisted bucketed index
    (operators/postings.py) instead.

    r8 plan shape (guide §1.2/§2.3 — same scores, fewer corpus passes):
    the r1-r7 composition derived tf, document_stats, vocabulary and
    collection_stats as four independent subtrees, so one query plan
    tokenized + exploded + hash-aggregated the FULL corpus 3-4× (15
    Exchanges, zero ReusedExchange — column pruning makes each subtree
    unique, defeating exchange reuse). Now:

    1. ONE un-exploded corpus pass aggregates every collection
       statistic the scorer needs — N (every doc counts, empty docs
       included), total token mass, and per-query-term df via
       array_contains — into a single broadcastable row.
    2. The scoring explode FILTERS to query terms BEFORE its
       aggregate, so the only wide exchange carries matched (doc, dl,
       term) rows instead of the whole corpus's (doc, term) pairs
       (project early / aggregate small, guide §2.3); dl rides the
       row (size(tokens), carried through the explode exactly like
       the index build), so no document_stats join.

    Per-term arithmetic, tie-break and the reference quirks (dup query
    terms as qtf, df==0 contributes nothing, N counts empty docs,
    mode="and" counts absent terms toward the requirement) are
    unchanged — pinned score-identical to the composed plan by
    test_bm25's oracle parity and the driver's exact DuckDB twins.
    """
    from ..functions.text import tokens_expr

    terms = py_tokenize(query, min_token_length=min_token_length)
    counts = Counter(terms)
    uniq = sorted(counts)
    n_distinct_terms = len(uniq)
    if not uniq:
        return docs.select(
            F.col(id_col).alias("doc_id"), F.lit(0.0).alias("score")
        ).limit(0)
    if mode not in ("or", "and"):
        raise ValueError(f"unknown mode {mode!r}")

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_expr(F.col(text_col), min_token_length, None).alias("tokens"),
    ).select(
        "doc_id", "tokens", F.size("tokens").cast("long").alias("dl")
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("total_documents"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_terms"),
        *[
            F.sum(F.array_contains("tokens", t).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(uniq)
        ],
    )

    tfq = (
        toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(uniq))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    matched = tfq.crossJoin(F.broadcast(stats)).withColumn(
        "avgdl", F.col("total_terms") / F.col("total_documents")
    )

    # per-term (idf, qtf) as CASE over the small distinct query term
    # set — the per-term side is already ON the broadcast stats row,
    # so no (term, weight) relation is needed at all. df==0 terms
    # simply have no matched rows (no doc contains them), preserving
    # the reference's "df==0 contributes 0" early return.
    idf_c = None
    qtf_c = None
    for i, t in enumerate(uniq):
        cond = F.col("term") == F.lit(t)
        iv = idf_expr(
            F.coalesce(F.col(f"df_{i}"), F.lit(0)),
            F.col("total_documents"), idf_variant,
        )
        qv = F.lit(int(counts[t])).cast("long")
        idf_c = F.when(cond, iv) if idf_c is None else idf_c.when(cond, iv)
        qtf_c = F.when(cond, qv) if qtf_c is None else qtf_c.when(cond, qv)
    matched = matched.withColumn("idf", idf_c).withColumn("qtf", qtf_c)

    term_score = (
        F.col("qtf")
        * F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * (F.col("dl") / F.col("avgdl")))
        )
    )
    agg = matched.groupBy("doc_id").agg(
        F.sum(term_score).alias("score"),
        F.count(F.lit(1)).alias("_nt"),  # (doc,term) rows are distinct
    )
    if mode == "and":
        agg = agg.filter(F.col("_nt") == n_distinct_terms)
    return topk(agg.drop("_nt"), k, round_digits=round_digits)


def like_search(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The reference's shipping fallback search (Q7): substring match of
    the space-joined terms, constant score 1.0, LIMIT k
    (database_search_service.py:105-161)."""
    needle = " ".join(query_terms)
    return (
        docs.filter(F.col(text_col).contains(needle))
        .select(
            F.col(id_col).alias("doc_id"),
            F.lit(1.0).alias("score"),
        )
        .orderBy(F.col("doc_id").asc())
        .limit(k)
    )
