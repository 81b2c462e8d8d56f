"""Compressed, doc-sharded inverted index — build side.

Layout (north rule: "shuffled by term into partition-local inverted
indexes with delta-gap + varbyte-compressed posting lists and per-block
max-score metadata, merged into a global index with explicit salting
for skewed high-DF terms"):

    index_dir/
      postings/shard=K/*.parquet   one row per (term, salt-chunk):
          term string, salt int, df long, n long,
          gaps binary   — delta-gap+varbyte doc ints (shard-local order)
          tfs binary    — varbyte term frequencies
          dls binary    — varbyte doc lengths (denormalized ⇒ no
                          query-time join against document_stats)
          block_last array<long>   — last doc_int per 128-posting block
          block_maxw array<double> — max of tf·(k1+1)/(tf+k1·(1−b+b·dl/avgdl))
                                     per block (the tf-part upper bound;
                                     × idf at query = block-max WAND UB)
      docmap/    (doc_id <orig key>, doc_int long, dl long) sorted by doc_int
      vocabulary/ (term, document_frequency, collection_frequency)
      stats/meta.json — N, avgdl, k1/b used for block metadata,
                        shard_size, tokenizer config, codec version,
                        build metrics (docs/sec, postings, bytes)

Sharding is RANGE on dense doc ids (shard = doc_int // shard_size):
- each shard is a partition-local index over a contiguous doc range →
  the query-side accumulator can be a dense array (local = doc_int %
  shard_size),
- appends get fresh id ranges → fresh shards, existing shards immutable
  (incremental build, operators/manifest.py).

Salting: a term whose global df exceeds ``salt_chunk`` is split into
``ceil(df / salt_chunk)`` range-disjoint sub-chunks per shard BEFORE the
build shuffle, so no single reducer group exceeds
~shard_size/salt_count postings even for stop-word-grade terms. Chunks
stay sorted and disjoint, so block-max skipping still sees an ordered
stream.

Every stage is DataFrame-declarative; the only Python is the Arrow
``applyInPandas`` group encoder (numpy-vectorized codec).
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import B_DEFAULT, K1_DEFAULT, MIN_TOKEN_LENGTH_DEFAULT
from .codec import encode_doc_ids, encode_varbyte
from .ids import assign_dense_ids
from .termindex import collection_stats, document_stats, term_frequencies, vocabulary

BLOCK = 128
CODEC_VERSION = 1

POSTINGS_SCHEMA = (
    "shard long, term string, salt int, df long, n long, "
    "gaps binary, tfs binary, dls binary, "
    "block_last array<long>, block_maxw array<double>"
)


def _make_encoder(k1: float, b: float, avgdl: float):
    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_int")
        ids = pdf["doc_int"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        wtf = (
            tfs * (k1 + 1.0)
            / (tfs + k1 * (1.0 - b + b * (dls / avgdl)))
        )
        n = ids.size
        n_blocks = (n + BLOCK - 1) // BLOCK
        block_last = [int(ids[min((i + 1) * BLOCK, n) - 1]) for i in range(n_blocks)]
        block_maxw = [
            float(wtf[i * BLOCK : (i + 1) * BLOCK].max()) for i in range(n_blocks)
        ]
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "term": [pdf["term"].iloc[0]],
                "salt": [int(pdf["salt"].iloc[0])],
                "df": [int(pdf["df"].iloc[0])],
                "n": [n],
                "gaps": [encode_doc_ids(ids.astype(np.uint64))],
                "tfs": [encode_varbyte(tfs.astype(np.uint64))],
                "dls": [encode_varbyte(dls.astype(np.uint64))],
                "block_last": [block_last],
                "block_maxw": [block_maxw],
            }
        )

    return encode_group


def build_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_size: int = 100_000,
    salt_chunk: int = 200_000,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    min_token_length: int = MIN_TOKEN_LENGTH_DEFAULT,
    stop_words: Iterable[str] | None = None,
    id_assign_partitions: int | None = None,
) -> dict:
    """Build the full compressed index under ``index_dir``; returns
    build metrics (also persisted to stats/meta.json)."""
    t0 = time.time()
    spark = docs.sparkSession

    # 1. dense doc ids (deterministic: ordered by original key)
    keyed = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    with_ids = assign_dense_ids(
        keyed, ["doc_id"], "doc_int", num_partitions=id_assign_partitions
    )
    with_ids.persist()

    # 2. relational postings + stats
    tf0 = term_frequencies(with_ids, id_col="doc_int", text_col="text",
                           min_token_length=min_token_length,
                           stop_words=stop_words)
    ds0 = document_stats(tf0)
    tf = tf0.withColumnRenamed("doc_id", "doc_int")
    ds = ds0.withColumnRenamed("doc_id", "doc_int")
    vocab = vocabulary(tf)
    cs = collection_stats(with_ids, ds).collect()[0]
    n_docs = int(cs["total_documents"])
    total_terms = int(cs["total_terms"])
    avgdl = float(cs["avg_document_length"]) if n_docs else 0.0

    # 3. docmap (every doc, incl. token-empty ones with dl=0)
    docmap = (
        with_ids.join(ds.select("doc_int", F.col("total_terms").alias("dl")),
                      "doc_int", "left")
        .select("doc_id", "doc_int", F.coalesce("dl", F.lit(0)).alias("dl"))
    )
    docmap.repartitionByRange("doc_int").sortWithinPartitions("doc_int") \
        .write.mode("overwrite").parquet(f"{index_dir}/docmap")

    vocab.write.mode("overwrite").parquet(f"{index_dir}/vocabulary")

    # 4. enrich postings: dl (shuffle on doc) then df (shuffle on term)
    enriched = (
        tf.join(ds.select("doc_int", F.col("total_terms").alias("dl")), "doc_int")
        .join(vocab.select("term", F.col("document_frequency").alias("df")), "term")
    )
    salt_count = F.least(
        F.greatest(F.ceil(F.col("df") / F.lit(salt_chunk)), F.lit(1)), F.lit(64)
    ).cast("long")
    enriched = enriched.select(
        "term", "doc_int", "tf", "dl", "df",
        (F.col("doc_int") / shard_size).cast("long").alias("shard"),
        (
            (F.pmod(F.col("doc_int"), F.lit(shard_size)) * salt_count)
            / F.lit(shard_size)
        ).cast("int").alias("salt"),
    )

    if avgdl <= 0:
        # empty corpus: write empty postings frame
        postings = spark.createDataFrame([], POSTINGS_SCHEMA)
    else:
        postings = enriched.groupBy("shard", "term", "salt").applyInPandas(
            _make_encoder(k1, b, avgdl), schema=POSTINGS_SCHEMA
        )

    (
        postings.repartition("shard")
        .sortWithinPartitions("term", "salt")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{index_dir}/postings")
    )

    # 5. stats + metrics
    written = spark.read.parquet(f"{index_dir}/postings")
    agg = written.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("postings"),
        F.coalesce(
            F.sum(F.length("gaps") + F.length("tfs") + F.length("dls")), F.lit(0)
        ).alias("bytes"),
    ).collect()[0]
    n_terms = vocab.count()
    elapsed = time.time() - t0
    meta = {
        "codec_version": CODEC_VERSION,
        "block": BLOCK,
        "k1": k1,
        "b": b,
        "min_token_length": min_token_length,
        "shard_size": shard_size,
        "salt_chunk": salt_chunk,
        "n_docs": n_docs,
        "total_terms": total_terms,
        "avgdl": avgdl,
        "n_vocab_terms": int(n_terms),
        "posting_rows": int(agg["rows"]),
        "n_postings": int(agg["postings"]),
        "compressed_payload_bytes": int(agg["bytes"]),
        "build_seconds": round(elapsed, 3),
        "docs_per_sec": round(n_docs / elapsed, 2) if elapsed > 0 else None,
        "tokens_per_sec": round(total_terms / elapsed, 2) if elapsed > 0 else None,
    }
    os.makedirs(f"{index_dir}/stats", exist_ok=True)
    with open(f"{index_dir}/stats/meta.json", "w") as fh:
        json.dump(meta, fh, indent=2)
    with_ids.unpersist()
    return meta


def load_meta(index_dir: str) -> dict:
    with open(f"{index_dir}/stats/meta.json") as fh:
        return json.load(fh)
