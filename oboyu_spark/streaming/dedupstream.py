"""Structured-Streaming exact deduplication — the ingestion-side guard
a training-data pipeline puts in front of its raw document stream.

The batch operator (operators/dedup.dedup_exact) sees the whole corpus;
on a stream, duplicates arrive across micro-batches, so the drop must
carry STATE (the set of fingerprints already seen). Two modes, the
standard Spark state/size trade-off made explicit:

- ``watermark=None`` (exact-forever): ``dropDuplicates`` on the
  content fingerprint — every duplicate is dropped no matter how far
  apart the copies arrive, but the state store grows with the number
  of DISTINCT documents ever seen (one fingerprint row each). Right
  when distinct cardinality is bounded or re-crawl gaps are unbounded.
- ``watermark="2 hours"`` (bounded-state): ``dropDuplicatesWithin
  Watermark`` — fingerprints are evicted once the watermark passes
  them, so state is bounded by the arrival-rate × horizon, and a
  duplicate is guaranteed dropped only if it arrives within the
  horizon of the first copy. Right for the 100 TB firehose, where
  duplicate copies cluster in time (re-posts, mirror lag) and a
  trickle of far-apart misses is acceptable (a batch dedup pass
  downstream catches them).

The emitted rows are the SURVIVORS (first arrival per fingerprint,
content fingerprint = md5 of whitespace-collapsed text — the same
fingerprint the batch operator and the docmap use, so survivors feed
straight into append_docs / prepare_corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textstats import fingerprint_md5

DOC_SCHEMA = "doc_id string, text string, ts timestamp"


def dedup_stream_frame(
    stream: DataFrame,
    watermark: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """(doc_id, text, ts, fingerprint) survivors of streaming exact
    dedup; see the module docstring for the two state modes."""
    fp = stream.withColumn("fingerprint", fingerprint_md5(F.col(text_col)))
    if watermark is None:
        return fp.dropDuplicates(["fingerprint"])
    return fp.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(["fingerprint"])


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str | None = None,
    schema: str = DOC_SCHEMA,
    trigger_once: bool = True,
):
    """Start (and by default run-once) the dedup stream writing
    surviving documents to parquet. Re-running with the same checkpoint
    resumes the seen-fingerprint state, so duplicates are dropped
    across restarts too."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = dedup_stream_frame(stream, watermark=watermark)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def curate_and_index_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    min_quality: float | None = 0.3,
    watermark: str | None = None,
    schema: str = DOC_SCHEMA,
    trigger_once: bool = True,
):
    """ONE stream from raw documents to a live BM25 index: quality gate
    (stateless, fused before the state store) → stateful exact dedup →
    ``append_docs`` per micro-batch via the replay-guarded ingest
    handler (batch manifest + docmap anti-join — streaming/ingest).
    The full curate-on-arrival deployment shape: junk and duplicates
    never reach the index, and the resulting index equals a batch
    build over the batch-curated corpus (pinned by test_streaming).

    Near-dedup intentionally stays a batch pass (pair joins need
    corpus-wide candidate generation); compose ``sync_docs`` or
    ``delete_docs``+``compact_index`` downstream for removal."""
    from ..operators.textstats import quality_score

    from .ingest import handle_batch_factory

    stream = spark.readStream.schema(schema).parquet(input_dir)
    if min_quality is not None:
        stream = stream.filter(quality_score(F.col("text")) >= min_quality)
    survivors = dedup_stream_frame(stream, watermark=watermark) \
        .select("doc_id", "text")
    handler = handle_batch_factory(index_dir)
    writer = (
        survivors.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def prepare_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    min_quality: float | None = 0.3,
    watermark: str | None = None,
    schema: str = DOC_SCHEMA,
    trigger_once: bool = True,
):
    """Curate-on-arrival: streaming exact dedup composed with the
    quality gate in ONE streaming plan (the quality predicate is a
    stateless column expression, so it fuses into the scan before the
    stateful dedup — junk never enters the fingerprint state), writing
    curated documents to parquet. The streaming face of
    pipeline.prepare_corpus's exact+quality stages; near-dedup stays a
    batch pass over the curated output (pair joins need corpus-wide
    candidate generation).

    ORDERING DIVERGENCE vs the batch pipeline (ADVICE r4, deliberate):
    the stream filters quality BEFORE the stateful dedup (junk must not
    enter — or evict useful entries from — the fingerprint state),
    while prepare_corpus dedups first and filters after. The survivor
    sets differ exactly when a below-threshold doc and an
    above-threshold doc share a fingerprint (whitespace-only text
    difference) and the low-quality copy has the min id / arrives
    first: the stream keeps the later good copy, the batch pipeline
    drops both. On corpora without cross-quality fingerprint
    collisions the two are identical (the parity the tests pin)."""
    from ..operators.textstats import quality_score

    stream = spark.readStream.schema(schema).parquet(input_dir)
    if min_quality is not None:
        stream = stream.filter(quality_score(F.col("text")) >= min_quality)
    out = dedup_stream_frame(stream, watermark=watermark)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
