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
straight into append_docs / prepare_corpus). "First arrival" is
guaranteed at micro-batch granularity: across batches the fingerprint
STATE keeps the earlier batch's copy; WITHIN one micro-batch Spark's
``dropDuplicates`` keeps an arbitrary copy (the batch operator keeps
min id) — the only survivor-identity divergence vs ``dedup_exact``,
and only for copies landing in the same batch.
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


NEAR_DROP_ISIN_MAX = 10_000


def _curation_gates(stream: DataFrame, min_quality: float | None,
                    max_dup_line_frac: float | None,
                    max_top_bigram_frac: float | None,
                    max_pii_count: int | None = None) -> DataFrame:
    """The stateless curation predicates (quality + repetition + PII
    density), fused into the stream's scan BEFORE the stateful dedup —
    junk never enters (or evicts useful entries from) the fingerprint
    state. Same expressions as the batch pipeline's gates."""
    from ..operators.textstats import (
        dup_line_frac, pii_match_count, quality_score, top_bigram_frac,
    )

    if min_quality is not None:
        stream = stream.filter(quality_score(F.col("text")) >= min_quality)
    if max_dup_line_frac is not None:
        stream = stream.filter(
            dup_line_frac(F.col("text")) <= max_dup_line_frac
        )
    if max_top_bigram_frac is not None:
        stream = stream.filter(
            top_bigram_frac(F.col("text")) <= max_top_bigram_frac
        )
    if max_pii_count is not None:
        # PII density gate (r7, batch parity): counted on the ORIGINAL
        # text — the scrub, when enabled, rewrites later (post-dedup,
        # like the batch pipeline)
        stream = stream.filter(
            pii_match_count(F.col("text")) <= max_pii_count
        )
    return stream


def _near_dedup_handler(base, index_dir: str, minhash_dir: str,
                        threshold: float, num_perm: int, bands: int):
    """Wrap the ingest handler with a streaming NEAR-dedup stage
    backed by the persisted incremental MinHash index (VERDICT r5 #7).

    Per micro-batch: sign the batch and band-join it against the index
    (``minhash_index_append_pairs`` — old corpus ∪ the batch itself,
    O(batch) work), then apply the batch pipeline's drop-higher-id
    policy. Every (doc_a < doc_b) pair is discovered exactly when its
    LATER-arriving member lands, so applying the drop per batch
    reconstructs the full-corpus drop set regardless of arrival order:

    - doc_b in the batch → not indexed (its SIGNATURE stays in the
      MinHash index — the batch policy computes pairs over the full
      corpus including dropped docs, so future docs pairing only with
      a dropped doc are still dropped);
    - doc_b already indexed (a lower-id near-dup arrived late) →
      ``delete_docs`` tombstones it retroactively.

    Net: the live index holds exactly the docs
    ``prepare_corpus(near_threshold=...)`` would keep over the same
    corpus (pinned by test_streaming), compaction deferred to the
    usual ``compact_index`` maintenance. Replays are safe: a finalized
    batch id short-circuits; a crash between the MinHash append and
    the index append re-appends the signatures into a fresh batch dir
    (newest-batch-wins resolution) and recomputes identical pairs from
    the frozen files."""
    import os

    from ..operators.dedup import (
        minhash_index_append_pairs, minhash_index_build,
    )
    from ..operators.postings import delete_docs, load_tombstones
    from .ingest import _done_batches

    def handler(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if int(batch_id) in _done_batches(index_dir):
            return  # replay of a fully-finalized batch
        spark = batch_df.sparkSession
        if not os.path.exists(f"{minhash_dir}/minhash.json"):
            # EMPTY bootstrap (sidecar + schema'd empty batch=0): the
            # first real batch then takes the same append path as every
            # other — in-batch pairs included
            minhash_index_build(batch_df.limit(0), minhash_dir,
                                num_perm=num_perm, bands=bands)
        pairs = minhash_index_append_pairs(batch_df, minhash_dir,
                                           threshold=threshold)
        # keep the drop set a DATAFRAME (ADVICE r6): a boilerplate
        # batch can produce 10^6+ near-dup pairs, and collecting the
        # whole id set to the driver just to decide the filter shape
        # would materialize it all in driver memory. count() picks the
        # isin/anti-join cutover; the only collects are the bounded
        # isin literal list (<= NEAR_DROP_ISIN_MAX) and the
        # delete_docs id list AFTER the docmap semi-join has reduced
        # it to already-indexed ids.
        drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        drops.persist()
        try:
            n_drop = drops.count()
            if n_drop:
                small = n_drop <= NEAR_DROP_ISIN_MAX
                if small:
                    drop_ids = sorted(r["doc_id"] for r in drops.collect())
                    batch_df = batch_df.filter(
                        ~F.col("doc_id").isin(drop_ids)
                    )
                else:
                    batch_df = batch_df.join(drops, "doc_id", "left_anti")
                # retroactive branch: ids already in the live index
                # (same isin/join cutover as the batch filter — a
                # 10^5-literal In over the docmap scan is the same
                # driver-plan bloat either way)
                if os.path.isdir(f"{index_dir}/docmap"):
                    tomb = {int(t) for t in load_tombstones(index_dir)}
                    dm = spark.read.parquet(f"{index_dir}/docmap")
                    dm = (dm.filter(F.col("doc_id").isin(drop_ids))
                          if small
                          else dm.join(drops, "doc_id", "left_semi"))
                    hit = dm.select("doc_id", "doc_int").collect()
                    indexed = sorted(
                        {r["doc_id"] for r in hit
                         if int(r["doc_int"]) not in tomb}
                    )
                    if indexed:
                        delete_docs(spark, index_dir, indexed)
            base(batch_df, batch_id)
        finally:
            drops.unpersist()

    return handler


def _span_dedup_handler(base, index_dir: str, span_dir: str, n: int,
                        min_token_length: int = 2):
    """Wrap the ingest handler with the streaming exact-span-dedup
    stage (``dedup.span_filter_and_append``): every micro-batch has
    already-seen n-token spans removed (first-ARRIVED occurrence
    survives; within one batch the batch rule (doc_id, pos) applies)
    and its own span hashes appended to the persisted store. Runs on
    the exact-dedup SURVIVORS (the doc-level drop is cheaper than
    span-hashing a duplicate), so the indexed text is the
    span-rewritten token stream. Replay-safe: a finalized batch
    short-circuits; a crash between the span append and the index
    append replays against the pre-append store view (the lookup reads
    only committed batches with ordinal < batch_id)."""
    from ..operators.dedup import span_filter_and_append
    from .ingest import _done_batches

    def handler(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if int(batch_id) in _done_batches(index_dir):
            return  # replay of a fully-finalized batch
        # persist (ADVICE r6): the downstream handler chain fires ~4
        # actions per micro-batch (isEmpty, minhash signing, docmap
        # lookup, index append) and each would otherwise re-run the
        # span explode + aggregation and the store semi-join from
        # scratch — deterministic (frozen store paths) but a real
        # per-batch cost multiplier
        cleaned = span_filter_and_append(
            batch_df, span_dir, n, int(batch_id),
            min_token_length=min_token_length,
        ).select("doc_id", "text")
        cleaned.persist()
        try:
            base(cleaned, batch_id)
        finally:
            cleaned.unpersist()

    return handler


def curate_and_index_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    min_quality: float | None = 0.3,
    max_dup_line_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    watermark: str | None = None,
    schema: str = DOC_SCHEMA,
    trigger_once: bool = True,
    near_threshold: float | None = None,
    minhash_dir: str | None = None,
    num_perm: int = 16,
    bands: int = 8,
    span_n: int | None = None,
    span_dir: str | None = None,
    max_pii_count: int | None = None,
    pii_kinds: "tuple[str, ...] | None" = None,
):
    """ONE stream from raw documents to a live BM25 index: quality gate
    (stateless, fused before the state store) → stateful exact dedup →
    [optional streaming NEAR-dedup against a persisted MinHash index]
    → ``append_docs`` per micro-batch via the replay-guarded ingest
    handler (batch manifest + docmap anti-join — streaming/ingest).
    The full curate-on-arrival deployment shape: junk and duplicates
    never reach the index, and the resulting index equals a batch
    build over the batch-curated corpus (pinned by test_streaming).

    ``near_threshold`` + ``minhash_dir`` enable the near-dedup lens
    (VERDICT r5 #7): each batch is signed once into the incremental
    MinHash index and band-joined against it — O(batch) per refresh —
    and the batch pipeline's drop-higher-id policy is applied,
    retroactively tombstoning an indexed doc when a lower-id near-dup
    arrives later (see ``_near_dedup_handler``). Ordering caveat: the
    stream's stateless gates — quality, repetition, AND the r7 PII
    density gate (``max_pii_count``) — run BEFORE near-dedup (fused
    at the scan), while ``prepare_corpus`` near-dedups the pre-gate
    corpus — survivor sets diverge only when a gated-out doc (e.g. a
    PII-dense lower-id doc) near-pairs a surviving one: batch lets it
    participate in drop-higher-id survivorship before gating it out,
    the stream never admits it to the MinHash store, so its higher-id
    near-dups survive (ADVICE r7; same deliberate divergence as the
    exact stage, documented on ``prepare_stream``)."""
    from .ingest import handle_batch_factory

    if (near_threshold is None) != (minhash_dir is None):
        raise ValueError(
            "near_threshold and minhash_dir must be set together"
        )
    if (span_n is None) != (span_dir is None):
        raise ValueError("span_n and span_dir must be set together")
    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = _curation_gates(stream, min_quality, max_dup_line_frac,
                             max_top_bigram_frac, max_pii_count)
    survivors = dedup_stream_frame(stream, watermark=watermark) \
        .select("doc_id", "text")
    if pii_kinds is not None:
        # PII scrub (r7, batch parity): rewrite AFTER the stateful
        # dedup so fingerprints see the original text; the indexed
        # text is the masked one. Note the span store, when enabled,
        # then hashes MASKED token streams — consistent within one
        # stream, same caveat as mixing raw/pretokenized index builds.
        from ..operators.textstats import redact_pii

        survivors = survivors.select(
            "doc_id", redact_pii(F.col("text"), pii_kinds).alias("text")
        )
    handler = handle_batch_factory(index_dir)
    if near_threshold is not None:
        handler = _near_dedup_handler(handler, index_dir, minhash_dir,
                                      near_threshold, num_perm, bands)
    if span_n is not None:
        # outermost wrapper: span rewrite feeds the (optional) near-
        # dedup stage, mirroring the batch job's span-first ordering
        handler = _span_dedup_handler(handler, index_dir, span_dir,
                                      span_n)
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
    max_dup_line_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    max_pii_count: int | None = None,
    pii_kinds: "tuple[str, ...] | None" = None,
    watermark: str | None = None,
    schema: str = DOC_SCHEMA,
    trigger_once: bool = True,
):
    """Curate-on-arrival: streaming exact dedup composed with the
    quality + repetition gates in ONE streaming plan (the predicates
    are stateless column expressions, so they fuse into the scan before
    the stateful dedup — junk never enters the fingerprint state),
    writing curated documents to parquet. The streaming face of
    pipeline.prepare_corpus's exact+quality+repetition stages;
    near-dedup stays a batch pass over the curated output (pair joins
    need corpus-wide candidate generation).

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
    stream = spark.readStream.schema(schema).parquet(input_dir)
    stream = _curation_gates(stream, min_quality, max_dup_line_frac,
                             max_top_bigram_frac, max_pii_count)
    out = dedup_stream_frame(stream, watermark=watermark)
    if pii_kinds is not None:
        # scrub AFTER the stateful dedup (fingerprint column keeps the
        # ORIGINAL text's hash — batch pipeline semantics, where dedup
        # sees pre-redaction content)
        from ..operators.textstats import redact_pii

        out = out.withColumn("text",
                             redact_pii(F.col("text"), pii_kinds))
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
