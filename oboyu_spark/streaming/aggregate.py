"""Structured-Streaming windowed aggregation with a late-data
watermark — the operational monitoring side of the transcript stream
(per-role turn rates over event-time tumbling windows).

The reference has no streaming surface at all (SURVEY §2.9); this is
the Spark-native "what is arriving right now" companion to the
incremental index ingest (ingest.py). Semantics are the standard
watermark contract:

- events later than ``watermark`` behind the max seen event time are
  dropped;
- in append output mode a window row is emitted exactly once, when the
  watermark passes the window end (so the sink only ever holds
  FINALIZED windows — safe to join/serve without read-side dedup).

At scale this is the canonical one-shuffle streaming plan: the state
store is keyed by (window, role) and bounded by the watermark horizon,
not by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def windowed_turn_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, window_end, role, n_turns) over event time."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            F.col("n_turns").cast("long").alias("n_turns"),
        )
    )


def stream_turn_rates(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    schema: str = TRANSCRIPT_SCHEMA,
    trigger_once: bool = True,
):
    """Start (and by default run-once) the windowed-rate stream writing
    finalized windows to parquet. Returns the StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_turn_counts(stream, window, watermark)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
