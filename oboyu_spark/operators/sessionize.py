"""Gap-based conversation sessionization over transcript turns.

A transcripts pipeline's classic enrichment: split each conversation
into sessions wherever the inactivity gap between consecutive turns
exceeds a threshold, and give every turn a stable session id.

Plan shape: ONE shuffle (partition by conv_id), then two partition-
local window functions (lag → gap flag → running sum). No UDFs, no
driver-side state — at 100 TB this is a single exchange keyed by the
natural conversation key, and AQE handles whale conversations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_turns(
    transcripts: DataFrame,
    gap_minutes: int = 30,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreak_col: str = "turn_idx",
) -> DataFrame:
    """Adds (session_idx int, session_id string): session_idx is the
    0-based session ordinal within the conversation; a new session
    starts when the gap to the previous turn exceeds ``gap_minutes``.
    Gap arithmetic uses floored epoch seconds (ts cast to long) so the
    DuckDB oracle can reproduce it bit-exactly."""
    w = Window.partitionBy(conv_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    prev_ts = F.lag(ts_col).over(w)
    # double cast: TIMESTAMP_NTZ (parquet naive ts) cannot cast to long
    # directly; via TIMESTAMP it resolves in the session tz (UTC),
    # matching DuckDB's epoch() of the same naive value
    def _epoch(c):
        return c.cast("timestamp").cast("long")

    new_session = F.when(prev_ts.isNull(), F.lit(0)).when(
        (_epoch(F.col(ts_col)) - _epoch(prev_ts)) > gap_minutes * 60,
        F.lit(1),
    ).otherwise(F.lit(0))
    with_flag = transcripts.withColumn("_new_s", new_session)
    w2 = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_flag.withColumn(
            "session_idx", F.sum("_new_s").over(w2).cast("int")
        )
        .withColumn(
            "session_id",
            F.concat_ws("#", F.col(conv_col), F.col("session_idx")),
        )
        .drop("_new_s")
    )


def session_stats(sessions: DataFrame, conv_col: str = "conv_id") -> DataFrame:
    """(conv_id, session_idx, n_turns, started, ended) rollup."""
    return sessions.groupBy(conv_col, "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.min("ts").alias("started"),
        F.max("ts").alias("ended"),
    )
