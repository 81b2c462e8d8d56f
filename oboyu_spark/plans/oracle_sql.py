"""DuckDB oracle SQL builders — the relational specification of every
engine operator, runnable by the driver's DuckDB harness on the same
parquet tables.

These are the ANSI-SQL equivalents the driver compares against
(CORRECTNESS_r{N}.json). They re-state the reference's SQL
specification (consolidated_queries.py:365-425) with the ln-IDF variant
actually pinned by the reference's unit tests (SURVEY §0.1), and with
tokenization spelled in RE2 for DuckDB's regexp_extract_all.

Float columns are rounded to 6 decimals on BOTH sides (engine + oracle)
so cross-engine libm 1-ulp noise can't break the driver's value-hash.
"""

from __future__ import annotations

from collections import Counter

from ..functions.text import DUCKDB_TOKEN_PATTERN, MIN_TOKEN_LENGTH, py_tokenize

ROUND = 6


def tf_cte(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = MIN_TOKEN_LENGTH,
) -> str:
    """CTE chain producing tf(doc_id, term, tf) from a raw text table."""
    return f"""
tok AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_col}), '{DUCKDB_TOKEN_PATTERN}')) AS term
  FROM {table}
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM tok WHERE length(term) >= {min_len}
  GROUP BY doc_id, term
)"""


def term_frequencies_sql(table: str = "documents") -> str:
    return f"WITH {tf_cte(table)} SELECT doc_id, term, tf FROM tf"


def document_stats_sql(table: str = "documents") -> str:
    return f"""WITH {tf_cte(table)}
SELECT doc_id,
       sum(tf)::BIGINT AS total_terms,
       count(*)::BIGINT AS unique_terms,
       round(sum(tf)::DOUBLE / count(*), {ROUND}) AS avg_term_frequency
FROM tf GROUP BY doc_id"""


def vocabulary_sql(table: str = "documents", min_df: int = 1) -> str:
    having = f"HAVING count(*) >= {min_df}" if min_df > 1 else ""
    return f"""WITH {tf_cte(table)}
SELECT term,
       count(*)::BIGINT AS document_frequency,
       sum(tf)::BIGINT AS collection_frequency
FROM tf GROUP BY term {having}"""


def collection_stats_sql(table: str = "documents") -> str:
    # N counts ALL docs (incl. token-empty ones) — reference
    # bm25_statistics_calculator.py:77.
    return f"""WITH {tf_cte(table)}
SELECT (SELECT count(*) FROM {table})::BIGINT AS total_documents,
       (SELECT coalesce(sum(tf), 0) FROM tf)::BIGINT AS total_terms,
       round((SELECT coalesce(sum(tf), 0) FROM tf)::DOUBLE
             / (SELECT count(*) FROM {table}), {ROUND}) AS avg_document_length"""


def idf_scores_sql(table: str = "documents") -> str:
    return f"""WITH {tf_cte(table)},
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS n FROM {table})
SELECT term, round(ln((n.n - df + 0.5) / (df + 0.5)), {ROUND}) AS idf
FROM vocab CROSS JOIN n"""


def _query_values(query: str) -> str:
    """VALUES clause of (term, qtf) with list semantics (duplicates →
    multiplicity), matching operators/bm25.query_term_weights."""
    counts = Counter(py_tokenize(query))
    if not counts:
        return "SELECT NULL AS term, NULL::BIGINT AS qtf WHERE FALSE"
    rows = ", ".join(
        f"('{t}', {c})" for t, c in sorted(counts.items())
    )
    return f"SELECT * FROM (VALUES {rows}) AS q(term, qtf)"


def bm25_topk_sql(
    query: str,
    k: int = 10,
    table: str = "documents",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Full BM25 top-k: the reference's search_by_bm25 SQL
    (consolidated_queries.py:365-425) restated with ln-IDF and the fixed
    (score DESC, doc_id ASC) tie-break applied to ROUNDED scores so the
    boundary is float-noise-proof on both engines."""
    return f"""WITH {tf_cte(table)},
q AS ({_query_values(query)}),
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
c AS (SELECT (SELECT count(*) FROM {table})::DOUBLE AS n,
             (SELECT coalesce(sum(tf),0) FROM tf)::DOUBLE
             / (SELECT count(*) FROM {table}) AS avgdl),
scored AS (
  SELECT tf.doc_id,
         sum(q.qtf * ln((c.n - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({k1} + 1.0))
             / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / c.avgdl)))) AS score
  FROM tf
  JOIN q USING (term)
  JOIN vocab USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN c
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, {ROUND}) AS score
FROM scored
ORDER BY round(score, {ROUND}) DESC, doc_id ASC
LIMIT {k}"""


TRANSCRIPTS_CTE = """
transcripts AS (
  SELECT printf('conv_%04d', (doc_id % 97)::INT) AS conv_id,
         (doc_id // 97)::INT AS turn_idx,
         CASE (doc_id % 3) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
              ELSE 'tool' END AS role,
         text,
         NULL AS tool,
         TIMESTAMP '2025-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS ts
  FROM documents
),
turn_docs AS (
  SELECT conv_id || '#' || turn_idx::VARCHAR AS doc_id, text, role, tool, ts
  FROM transcripts
)"""


def _bm25_scored_cte(query: str, k1: float = 1.2, b: float = 0.75) -> str:
    """scored(doc_id, score) over a pre-existing tf/dl/vocab-free corpus
    named turn_docs(doc_id, text, ...)."""
    return f"""
tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{DUCKDB_TOKEN_PATTERN}')) AS term
  FROM turn_docs
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
  WHERE length(term) >= {MIN_TOKEN_LENGTH} GROUP BY doc_id, term
),
q AS ({_query_values(query)}),
vocab AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY doc_id),
c AS (SELECT (SELECT count(*) FROM turn_docs)::DOUBLE AS n,
             (SELECT coalesce(sum(tf),0) FROM tf)::DOUBLE
             / (SELECT count(*) FROM turn_docs) AS avgdl),
scored AS (
  SELECT tf.doc_id,
         sum(q.qtf * ln((c.n - vocab.df + 0.5) / (vocab.df + 0.5))
             * (tf.tf * ({k1} + 1.0))
             / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / c.avgdl)))) AS score
  FROM tf
  JOIN q USING (term) JOIN vocab USING (term) JOIN dl USING (doc_id)
  CROSS JOIN c
  GROUP BY tf.doc_id
)"""


def transcripts_bm25_topk_sql(query: str, k: int = 10) -> str:
    """BM25 top-k over per-turn documents derived from ``documents``."""
    return f"""WITH {TRANSCRIPTS_CTE}, {_bm25_scored_cte(query)}
SELECT doc_id, round(score, {ROUND}) AS score
FROM scored
ORDER BY round(score, {ROUND}) DESC, doc_id ASC
LIMIT {k}"""


def transcripts_role_filter_bm25_sql(query: str, role: str, k: int = 10) -> str:
    """Q8 analog: score on the FULL corpus, filter by role PRE-limit
    (documented deviation from the reference's post-limit quirk)."""
    return f"""WITH {TRANSCRIPTS_CTE}, {_bm25_scored_cte(query)}
SELECT s.doc_id, round(s.score, {ROUND}) AS score
FROM scored s JOIN turn_docs d ON s.doc_id = d.doc_id
WHERE d.role = '{role}'
ORDER BY round(s.score, {ROUND}) DESC, s.doc_id ASC
LIMIT {k}"""


def transcripts_date_range_sql(start: str, end: str) -> str:
    """Q9 analog: date-range filter + per-role rollup."""
    return f"""WITH {TRANSCRIPTS_CTE}
SELECT role, count(*)::BIGINT AS n_turns
FROM turn_docs
WHERE ts >= TIMESTAMP '{start}' AND ts < TIMESTAMP '{end}'
GROUP BY role"""


def like_search_sql(terms: list[str], k: int = 10, table: str = "documents") -> str:
    needle = " ".join(terms).replace("'", "''")
    return f"""SELECT doc_id, 1.0::DOUBLE AS score
FROM {table}
WHERE contains(text, '{needle}')
ORDER BY doc_id ASC LIMIT {k}"""
