"""spark-submit job: build (or resume) the BM25 index.

    spark-submit --master local[32] \
        --py-files oboyu_spark.zip \
        oboyu_spark/jobs/build_index.py \
        --input  /path/to/transcripts_or_docs.parquet  (or table:<name>) \
        --output /path/to/index_dir \
        [--input-kind transcripts|documents] \
        [--shard-size 100000] [--salt-chunk 200000] [--shards-per-part 8]

Re-running after a crash resumes from the per-partition manifest.
Prints the build metrics JSON (also persisted at stats/meta.json).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--input-kind", choices=["transcripts", "documents"],
                    default="transcripts")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--shard-size", type=int, default=100_000)
    ap.add_argument("--salt-chunk", type=int, default=200_000)
    ap.add_argument("--shards-per-part", type=int, default=8)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oboyu_spark.operators.postings import build_index
    from oboyu_spark.sources.transcripts import turns_as_docs

    spark = SparkSession.builder.appName("oboyu_spark.build_index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from oboyu_spark.sources.io import read_input

    src = read_input(spark, args.input)
    if args.input_kind == "transcripts":
        docs = turns_as_docs(src).select("doc_id", "text")
        id_col, text_col = "doc_id", "text"
    else:
        docs = src
        id_col, text_col = args.id_col, args.text_col

    meta = build_index(
        docs,
        args.output,
        id_col=id_col,
        text_col=text_col,
        shard_size=args.shard_size,
        salt_chunk=args.salt_chunk,
        shards_per_part=args.shards_per_part,
        k1=args.k1,
        b=args.b,
    )
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
