"""spark-submit job: build / append / compact the incremental MinHash
near-duplicate index.

    # sign the corpus once, persist signatures + band keys
    spark-submit --master local[32] oboyu_spark/jobs/minhash_index.py \
        build --docs /path/to/documents.parquet --index /path/to/mh \
        [--num-perm 16] [--bands 4] [--n 3]

    # sign ONLY the new batch, band-join it against the persisted
    # index (O(batch) per refresh), emit the new near-dup pairs
    spark-submit ... minhash_index.py append \
        --docs /new/batch.parquet --index /path/to/mh \
        [--threshold 0.5] [--pairs-out /path/to/pairs_parquet]

    # fold replay/superseded signature rows into one clean batch dir
    spark-submit ... minhash_index.py compact --index /path/to/mh

Completes the ops surface for the incremental near-dedup family (the
mirror of build_index/sync_index for BM25 and ann_index for IVF): a
scheduled append per arriving batch keeps near-dup detection O(batch)
instead of O(corpus), with compact as the periodic maintenance pass
(operators/dedup.minhash_index_*).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("action", choices=["build", "append", "compact"])
    ap.add_argument("--index", required=True)
    ap.add_argument("--docs",
                    help="parquet path or table:<name> (build/append)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--num-perm", type=int, default=16)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--n", type=int, default=3, help="shingle size")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="estimated-Jaccard cut for append pairs")
    ap.add_argument("--pairs-out",
                    help="write append's pair frame to this parquet dir "
                         "instead of only counting it")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oboyu_spark.operators import dedup as D

    spark = SparkSession.builder.appName(
        "oboyu_spark.minhash_index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.action in ("build", "append") and not args.docs:
        ap.error(f"{args.action} needs --docs")

    if args.action == "build":
        from oboyu_spark.sources.io import read_input

        docs = read_input(spark, args.docs)
        D.minhash_index_build(docs, args.index, num_perm=args.num_perm,
                              bands=args.bands, n=args.n,
                              id_col=args.id_col, text_col=args.text_col)
        print(json.dumps({
            "action": "build", "index": args.index,
            "n_docs": D.minhash_index_signatures(spark, args.index).count(),
            "num_perm": args.num_perm, "bands": args.bands, "n": args.n,
        }))
    elif args.action == "append":
        from oboyu_spark.sources.io import read_input

        batch = read_input(spark, args.docs)
        pairs = D.minhash_index_append_pairs(
            batch, args.index, threshold=args.threshold,
            id_col=args.id_col, text_col=args.text_col,
        )
        if args.pairs_out:
            pairs.write.mode("overwrite").parquet(args.pairs_out)
            n_pairs = spark.read.parquet(args.pairs_out).count()
        else:
            n_pairs = pairs.count()
        print(json.dumps({
            "action": "append", "index": args.index,
            "n_pairs": int(n_pairs),
            "pairs_out": args.pairs_out,
        }))
    else:
        D.minhash_index_compact(spark, args.index)
        print(json.dumps({
            "action": "compact", "index": args.index,
            "n_docs": D.minhash_index_signatures(spark, args.index).count(),
            "batches": D._signature_batches(args.index),
        }))
    # no spark.stop(): spark-submit tears the session down; in-process
    # callers (tests) keep their shared session (same as ann_index)


if __name__ == "__main__":
    main()
