"""Inverted-index statistics as declarative DataFrame aggregations.

Reference semantics (all pinned by tests):
- term frequencies per doc      — tokenizer.py:294-302 / term_frequency_analyzer.py:27-37
- document length = sum(tf)     — bm25_statistics_calculator.py:73-77
- document frequency df         — bm25_statistics_calculator.py:79-81
- collection frequency cf       — bm25_statistics_calculator.py:83-85
- collection totals N / avgdl   — bm25_statistics_calculator.py:123-148
- IDF = ln((N-df+0.5)/(df+0.5)) — bm25_statistics_calculator.py:26-47 (natural
  log, NO +1; negative for df > N/2 — asserted by the reference's own tests)
- min_doc_frequency pruning     — bm25_indexer.py:37 (declared there, enforced here)

Scale notes: ``term_frequencies`` is scan -> codegen'd tokenize ->
explode -> hash-aggregate on (doc_id, term). The groupBy gives Spark a
map-side partial aggregate before the term shuffle, so the shuffle
carries (doc, term, tf) — already the smallest possible record.
``vocabulary`` reuses the same (term)-clustered shuffle. Everything
downstream of the single explode is one exchange on term plus one on
doc_id; no RDDs, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import MIN_TOKEN_LENGTH, tokens_expr


def with_tokens(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
    min_token_length: int = MIN_TOKEN_LENGTH,
    stop_words=None,
) -> DataFrame:
    """Attach the token array (JVM tokenizer) to a documents DataFrame."""
    return docs.withColumn(
        out_col, tokens_expr(F.col(text_col), min_token_length, stop_words)
    )


def term_frequencies(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_length: int = MIN_TOKEN_LENGTH,
    stop_words=None,
) -> DataFrame:
    """(doc_id, term, tf) — the relational inverted-index rows.

    Equivalent of the reference's in-memory
    ``Dict[term, List[(chunk_id, tf)]]`` flattened to rows.
    """
    toks = with_tokens(docs, text_col, "tokens", min_token_length, stop_words)
    return (
        toks.select(F.col(id_col).alias("doc_id"), F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def document_stats(tf: DataFrame) -> DataFrame:
    """(doc_id, total_terms, unique_terms, avg_term_frequency).

    Mirrors the reference's document_stats table
    (schema.py:134-142, consolidated_queries.py:432-445).
    """
    return tf.groupBy("doc_id").agg(
        F.sum("tf").alias("total_terms"),
        F.count(F.lit(1)).cast("long").alias("unique_terms"),
        (F.sum("tf") / F.count(F.lit(1))).alias("avg_term_frequency"),
    )


def vocabulary(tf: DataFrame, min_doc_frequency: int = 1) -> DataFrame:
    """(term, document_frequency, collection_frequency) — schema.py:96-102."""
    vocab = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("document_frequency"),
        F.sum("tf").alias("collection_frequency"),
    )
    if min_doc_frequency > 1:
        vocab = vocab.filter(F.col("document_frequency") >= min_doc_frequency)
    return vocab


def collection_stats(
    docs: DataFrame, doc_stats: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Singleton row (total_documents, total_terms, avg_document_length).

    Reference collection_stats table schema.py:151-159. NB: EVERY input
    document counts toward N, including ones that tokenize to nothing —
    the reference increments ``document_count`` unconditionally
    (bm25_statistics_calculator.py:77) and its empty-chunk test pins
    ``document_count == 1`` for a corpus of one empty doc
    (test_bm25_indexer.py:116-134). Hence N comes from ``docs`` (all
    rows), while total token mass comes from ``doc_stats`` (empty docs
    contribute 0).
    """
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("total_documents"))
    totals = doc_stats.agg(
        F.coalesce(F.sum("total_terms"), F.lit(0)).cast("long").alias("total_terms")
    )
    return n.crossJoin(totals).select(
        "total_documents",
        "total_terms",
        (F.col("total_terms") / F.col("total_documents")).alias(
            "avg_document_length"
        ),
    )


def idf_expr(df_col: Column, n_docs: Column, variant: str = "raw_ln") -> Column:
    """IDF, two variants per SURVEY §0.1:

    - "raw_ln" (default): ln((N-df+0.5)/(df+0.5)) — the reference's
      in-memory implementation; no +1, negative for df > N/2.
    - "lucene_log10": log10((N-df+0.5)/(df+0.5) + 1) — the reference's
      SQL specification (consolidated_queries.py:383, DuckDB LOG is
      base-10); non-negative, rank-compatible with the +1-free natural
      log only when no term crosses df > N/2.
    """
    ratio = (n_docs - df_col + 0.5) / (df_col + 0.5)
    if variant == "raw_ln":
        return F.log(ratio)
    if variant == "lucene_log10":
        return F.log10(ratio + 1.0)
    raise ValueError(f"unknown idf variant {variant!r}")


def corpus_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    group_col: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """A7: database-statistics rollup (reference
    StatisticsQueries.get_database_statistics,
    consolidated_queries.py:466-480): row count, distinct ids, the
    distinct group values concatenated, latest timestamp."""
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct(id_col).alias("n_docs"),
    ]
    if group_col:
        aggs.append(
            F.concat_ws(
                ",", F.array_sort(F.collect_set(group_col))
            ).alias("groups")
        )
    if ts_col:
        aggs.append(F.max(ts_col).alias("last_modified"))
    return docs.agg(*aggs)


def idf_scores(vocab: DataFrame, cstats: DataFrame) -> DataFrame:
    """(term, idf) for every vocabulary term (A5)."""
    return vocab.crossJoin(F.broadcast(cstats.select("total_documents"))).select(
        "term",
        idf_expr(F.col("document_frequency"), F.col("total_documents")).alias("idf"),
    )
