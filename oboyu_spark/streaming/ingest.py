"""Structured-Streaming incremental index ingest.

The reference has NO streaming operators (SURVEY §2.9) — its
"new data arrives" story is the file-metadata change detector
(change_detector.py:64-105) re-run as a batch. The Spark-native
equivalent of that story is a stream of transcript files feeding the
incremental index builder:

    readStream(new transcript parquet files)
      → foreachBatch: append_docs(batch, index_dir)

Each micro-batch claims fresh id ranges / build partitions (see
operators/postings.append_docs), so existing shards stay immutable and
a crash mid-batch is recovered by the streaming checkpoint re-running
the batch (append_docs re-stages idempotently only if the batch's
parts were not finalized — the staged integrity check raises on a
partial duplicate, surfacing the conflict instead of corrupting).

Batch mode stays the primary path (the north rule is batch); this is
the operational "keep the index fresh" add-on.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.transcripts import turns_as_docs


def stream_transcripts_into_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    ),
    trigger_once: bool = True,
):
    """Start (and by default run-once) the ingest stream. Returns the
    StreamingQuery."""
    from ..operators.postings import append_docs

    stream = (
        spark.readStream.schema(schema).parquet(input_dir)
    )
    docs = turns_as_docs(stream).select("doc_id", "text")

    def handle_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_docs(batch_df, index_dir)

    writer = (
        docs.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
