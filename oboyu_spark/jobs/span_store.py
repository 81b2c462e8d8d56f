"""spark-submit job: drive the incremental exact-span-dedup store.

    # filter a batch against the persisted span store (already-seen
    # n-token spans removed, first-arrived occurrence survives),
    # write the rewritten docs, append the batch's span hashes
    spark-submit --master local[32] oboyu_spark/jobs/span_store.py \
        filter --docs /new/batch.parquet --store /path/to/spans \
        --batch-id 7 --out /clean/batch7 [--n 50] [--max-tokens 100000]

    # fold the store's batch dirs into one distinct batch=0 dir
    # (run on a quiesced stream — see dedup.span_store_compact)
    spark-submit ... span_store.py compact --store /path/to/spans

The batch-mode ops surface of the streaming span dedup
(operators/dedup.span_filter_and_append / span_store_compact): a
scheduled ``filter`` per arriving batch keeps cross-corpus span dedup
O(batch), with ``compact`` as the periodic maintenance pass — the
span-store mirror of jobs/minhash_index.py.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("action", choices=["filter", "compact"])
    ap.add_argument("--store", required=True)
    ap.add_argument("--docs", help="parquet path or table:<name> (filter)")
    ap.add_argument("--out", help="write the rewritten docs here (filter)")
    ap.add_argument("--batch-id", type=int,
                    help="monotone batch ordinal (filter); lookups read "
                         "only committed store batches below it")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n", type=int, default=50, help="span length (tokens)")
    ap.add_argument("--max-tokens", type=int,
                    help="bound the per-doc span explode")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from oboyu_spark.operators import dedup as D

    spark = SparkSession.builder.appName(
        "oboyu_spark.span_store").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.action == "filter":
        if not args.docs or args.batch_id is None or not args.out:
            ap.error("filter needs --docs, --batch-id and --out")
        from oboyu_spark.sources.io import read_input

        batch = read_input(spark, args.docs)
        cleaned = D.span_filter_and_append(
            batch, args.store, args.n, args.batch_id,
            id_col=args.id_col, text_col=args.text_col,
            max_tokens=args.max_tokens,
        )
        cleaned.write.mode("overwrite").parquet(args.out)
        written = spark.read.parquet(args.out)
        removed = written.agg(
            F.coalesce(F.sum("n_tokens_removed"), F.lit(0))
        ).collect()[0][0]
        print(json.dumps({
            "action": "filter", "store": args.store,
            "batch_id": args.batch_id, "n": args.n,
            "docs": written.count(), "tokens_removed": int(removed),
            "out": args.out,
        }))
    else:
        D.span_store_compact(spark, args.store)
        print(json.dumps({
            "action": "compact", "store": args.store,
            "batches": D._span_store_batches(args.store),
        }))
    # no spark.stop(): spark-submit tears the session down; in-process
    # callers (tests) keep their shared session (same as minhash_index)


if __name__ == "__main__":
    main()
