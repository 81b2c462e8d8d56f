"""spark-submit job: training-data corpus preparation.

    spark-submit --master local[32] oboyu_spark/jobs/prepare_corpus.py \
        --input /data/documents.parquet --output /data/prepared \
        [--sample-fraction 0.1 --sample-seed 42] \
        [--drop-span-dups 50] \
        [--no-exact] [--near-threshold 0.5 | --no-near] \
        [--near-method minhash|winnow|simhash] \
        [--near-policy greedy|components] \
        [--min-quality 0.3] [--max-dup-line-frac 0.3] \
        [--max-top-bigram-frac 0.2] [--redact-pii email,ipv4,phone] \
        [--langs en,ja] \
        [--chunk-size 1024] [--chunk-overlap 256] \
        [--embed-dim 64] [--pack-budget 2048]

Runs operators/pipeline.prepare_corpus (optional deterministic sample →
exact dedup → [exact span dedup] → near dedup under the chosen
lens+policy → quality/repetition/PII gates → language filter → chunk →
embed → optional sequence packing; exact dedup runs BEFORE the span
stage, matching the streaming curate path's order — ADVICE r6) and
writes:

    <output>/docs/        cleaned documents
    <output>/chunks/      chunked rows (unless --no-chunk)
    <output>/embeddings/  chunk embeddings (if --embed-dim)
    <output>/packing/     sequence assignment (if --pack-budget; over
                          chunks when chunking is on, else docs)

Prints one JSON line with per-stage counts (each count is one Spark
action over the already-written parquet, not a recomputation of the
lineage)."""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--no-exact", action="store_true")
    ap.add_argument("--no-near", action="store_true")
    ap.add_argument("--near-threshold", type=float, default=0.5)
    ap.add_argument("--near-method", default="minhash",
                    choices=["minhash", "winnow", "simhash"])
    ap.add_argument("--near-policy", default="greedy",
                    choices=["greedy", "components"])
    ap.add_argument("--min-quality", type=float)
    ap.add_argument("--max-dup-line-frac", type=float,
                    help="repetition gate: drop docs whose duplicate-"
                         "line fraction exceeds this")
    ap.add_argument("--max-top-bigram-frac", type=float,
                    help="repetition gate: drop docs whose most "
                         "frequent word-bigram holds more than this "
                         "fraction of bigram slots")
    ap.add_argument("--langs",
                    help="comma-separated language_id values to keep")
    ap.add_argument("--redact-pii",
                    help="comma-separated PII kinds to mask in the "
                         "output text (email,ipv4,phone,ssn,"
                         "credit_card) — applied after the dedup "
                         "stages")
    ap.add_argument("--max-pii-count", type=int,
                    help="PII density gate: drop docs with more than "
                         "this many PII matches (all kinds) in the "
                         "ORIGINAL text")
    ap.add_argument("--sample-fraction", type=float,
                    help="deterministic hash-gate pre-sample")
    ap.add_argument("--sample-seed", type=int, default=42)
    ap.add_argument("--drop-span-dups", type=int, metavar="N",
                    help="exact span dedup pre-stage (Lee et al.): "
                         "remove every non-first occurrence of a "
                         "corpus-repeated N-token span; output text is "
                         "rebuilt from the surviving token stream")
    ap.add_argument("--pack-budget", type=int,
                    help="write a fixed-token-budget sequence "
                         "assignment (concat-and-split mode)")
    ap.add_argument("--no-chunk", action="store_true")
    ap.add_argument("--chunk-size", type=int, default=1024)
    ap.add_argument("--chunk-overlap", type=int, default=256)
    ap.add_argument("--embed-dim", type=int)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oboyu_spark.operators.pipeline import prepare_corpus

    spark = SparkSession.builder.appName(
        "oboyu_spark.prepare_corpus"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.time()
    from oboyu_spark.sources.io import read_input

    docs = read_input(spark, args.input)
    n_in = docs.count()
    report: dict[str, object] = {"input_docs": n_in}
    if args.sample_fraction is not None:
        from oboyu_spark.operators.sampling import deterministic_sample

        docs = deterministic_sample(docs, args.sample_fraction,
                                    seed=args.sample_seed,
                                    id_col=args.id_col)
        report["sample_fraction"] = args.sample_fraction
    span_ran_exact = False
    span_ran_pii = False
    if args.drop_span_dups:
        from pyspark.sql import functions as F

        from oboyu_spark.operators.dedup import (
            dedup_exact, drop_duplicated_spans,
        )

        # PII gate + scrub BEFORE the span stage (ADVICE r7, medium):
        # the span rewrite rebuilds every doc's text from the
        # lowercased/punct-stripped token stream, so separator-
        # dependent PII patterns (123-45-6789, 555-123-4567, a@b.c)
        # no longer match the rewritten text — gating/scrubbing after
        # it would let PII ship unmasked. The stream already orders
        # gates → scrub → span (dedupstream.curate_and_index_stream);
        # this keeps the batch job on the same order. The gate counts
        # on the TRUE original text; prepare_corpus below must then
        # skip both stages (span_ran_pii).
        if args.max_pii_count is not None or args.redact_pii:
            from oboyu_spark.operators.pipeline import apply_pii_stage

            docs = apply_pii_stage(
                docs, args.max_pii_count,
                (tuple(args.redact_pii.split(","))
                 if args.redact_pii else None),
                text_col=args.text_col,
            )
            span_ran_pii = True

        # exact dedup FIRST (ADVICE r6): an exact duplicate with >= N
        # tokens would otherwise have its whole token stream
        # span-removed, changing its fingerprint so the later exact
        # stage can no longer drop it against the original — and the
        # streaming path (curate_and_index_stream) already runs
        # exact-first, span-second; this keeps batch == stream order
        if not args.no_exact:
            docs = dedup_exact(docs, id_col=args.id_col,
                               text_col=args.text_col)
            span_ran_exact = True
        cleaned_spans = drop_duplicated_spans(
            docs, n=args.drop_span_dups, id_col=args.id_col,
            text_col=args.text_col,
        )
        report["span_tokens_removed"] = int(
            cleaned_spans.agg(
                F.coalesce(F.sum("n_tokens_removed"), F.lit(0))
            ).collect()[0][0]
        )
        docs = cleaned_spans.select(
            F.col("doc_id").alias(args.id_col),
            F.col("text").alias(args.text_col),
        )
    # document stages only here — chunk/embed run below, each over the
    # previous stage's written parquet
    res = prepare_corpus(
        docs,
        # the span pre-stage already ran exact dedup (exact-first, the
        # stream's order); re-running it here would additionally
        # collapse docs that only BECAME identical after the span
        # rewrite — which the stream does not do
        exact=(not args.no_exact) and not span_ran_exact,
        near_threshold=None if args.no_near else args.near_threshold,
        near_method=args.near_method,
        near_policy=args.near_policy,
        min_quality=args.min_quality,
        max_dup_line_frac=args.max_dup_line_frac,
        max_top_bigram_frac=args.max_top_bigram_frac,
        # when the span pre-stage ran, the PII gate+scrub already ran
        # BEFORE it (on the true original text) — see span_ran_pii
        max_pii_count=None if span_ran_pii else args.max_pii_count,
        pii_kinds=None if span_ran_pii else (
            tuple(args.redact_pii.split(","))
            if args.redact_pii else None),
        langs=tuple(args.langs.split(",")) if args.langs else None,
        chunk_size=None,
        embed_dim=None,
        id_col=args.id_col,
        text_col=args.text_col,
    )
    res["docs"].write.mode("overwrite").parquet(f"{args.output}/docs")
    cleaned = spark.read.parquet(f"{args.output}/docs")
    report["kept_docs"] = cleaned.count()
    # derive each downstream stage from the PREVIOUS stage's WRITTEN
    # parquet, not from the lazy pipeline output — otherwise every
    # write would re-execute the dedup aggregates and LSH band joins
    # (the expensive stages) from the raw input
    from oboyu_spark.operators.chunker import chunk_documents
    from oboyu_spark.operators.embed import embed_docs

    embed_src, embed_id, embed_text = cleaned, args.id_col, args.text_col
    if not args.no_chunk:
        chunk_documents(
            cleaned, id_col=args.id_col, text_col=args.text_col,
            chunk_size=args.chunk_size, chunk_overlap=args.chunk_overlap,
        ).write.mode("overwrite").parquet(f"{args.output}/chunks")
        chunks = spark.read.parquet(f"{args.output}/chunks")
        report["chunks"] = chunks.count()
        embed_src, embed_id, embed_text = chunks, "chunk_id", "text"
    if args.embed_dim:
        embed_docs(
            embed_src, dim=args.embed_dim, id_col=embed_id,
            text_col=embed_text,
        ).write.mode("overwrite").parquet(f"{args.output}/embeddings")
        report["embeddings"] = spark.read.parquet(
            f"{args.output}/embeddings"
        ).count()
    if args.pack_budget:
        from pyspark.sql import functions as F

        from oboyu_spark.operators.packing import (
            pack_sequences, sequence_fill_stats,
        )

        packed = pack_sequences(embed_src, args.pack_budget,
                                id_col=embed_id, text_col=embed_text)
        packed.write.mode("overwrite").parquet(f"{args.output}/packing")
        stats = sequence_fill_stats(
            spark.read.parquet(f"{args.output}/packing"), args.pack_budget
        ).agg(F.sum("n_sequences").alias("n_sequences")).collect()
        report["pack_sequences"] = int(stats[0]["n_sequences"])
    report["seconds"] = round(time.time() - t0, 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
