"""Compressed, doc-sharded inverted index — build side (resumable).

Layout (north rule: delta-gap+varbyte postings, per-block max metadata,
explicit salting, checkpoint-resume with per-partition lineage):

    index_dir/
      staged/bpart=P/*.parquet     frozen (doc_id, doc_int, text) after
                                   dense-id assignment — the build's
                                   deterministic input snapshot; resume
                                   and compaction re-read this, never
                                   the live source
      postings/shard=K/*.parquet   one row per (term, salt-chunk):
          term string, salt int, df long, n long,
          gaps binary   — delta-gap+varbyte doc ints (ascending)
          tfs binary    — varbyte term frequencies
          dls binary    — varbyte doc lengths (denormalized ⇒ no
                          query-time join against document_stats)
          block_last  array<long> — last doc_int per 128-posting block
          block_maxtf array<long> — max tf per block
          block_mindl array<long> — min dl per block
          (block upper bound = idf · wtf(maxtf, mindl) is computed at
          QUERY time from current k1/b/avgdl — wtf is monotone ↑ in tf
          and ↓ in dl, so the bound stays valid when collection stats
          drift under incremental appends)
      vocab_parts/bpart=P/         per-partition (term, df, cf) partials
      vocabulary/                  global merge of the partials
      docmap/bpart=P/              (doc_id, doc_int, dl)
      tombstones/                  deleted doc_ints (applied at decode;
                                   compact() rewrites affected parts)
      manifest/part-P.json         per-partition lineage: input
                                   fingerprint, status, metrics
                                   (docs, tokens, postings, bytes, secs)
      stats/meta.json              global stats + aggregate metrics

Sharding is RANGE on dense doc ids (shard = doc_int // shard_size): each
shard is a partition-local index over a contiguous doc range (dense
query-side accumulators), and appends claim fresh id ranges → fresh
build partitions → existing shards are immutable.

A "build partition" (bpart) is ``shards_per_part`` consecutive shards:
the unit of checkpoint-resume. Killing a build and re-running
``build_index`` skips every bpart whose manifest row is already
``done`` and converges to the same index (pinned by tests).

Salting: a term whose global-ish df (within-part df here — at 10^12
scale parts are large enough that hot terms are hot in every part)
exceeds ``salt_chunk`` is split into range-disjoint sub-chunks BEFORE
the build shuffle, bounding every reducer group even for stop-word
terms. Chunks stay ordered and disjoint → block-max skipping sees one
ordered stream.

The reference's analog of this file is the in-memory dict index build
(inverted_index_builder.py:50-68, bm25_indexer.py:121-233) plus the
file_metadata change tracking (change_detector.py:64-105); everything
here is a from-scratch Spark design, not a port.
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
from .termindex import document_stats, term_frequencies

BLOCK = 128
CODEC_VERSION = 2

POSTINGS_SCHEMA = (
    "shard long, term string, salt int, df long, n long, "
    "gaps binary, tfs binary, dls binary, "
    "block_last array<long>, block_maxtf array<long>, block_mindl array<long>"
)


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_int")
    ids = pdf["doc_int"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    dls = pdf["dl"].to_numpy(np.int64)
    n = ids.size
    n_blocks = (n + BLOCK - 1) // BLOCK
    block_last = [int(ids[min((i + 1) * BLOCK, n) - 1]) for i in range(n_blocks)]
    block_maxtf = [int(tfs[i * BLOCK : (i + 1) * BLOCK].max()) for i in range(n_blocks)]
    block_mindl = [int(dls[i * BLOCK : (i + 1) * BLOCK].min()) for i in range(n_blocks)]
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
            "block_maxtf": [block_maxtf],
            "block_mindl": [block_mindl],
        }
    )


def wtf_upper(maxtf, mindl, k1: float, b: float, avgdl: float):
    """Monotone upper bound of the BM25 tf-part for a block."""
    t = np.asarray(maxtf, dtype=np.float64)
    d = np.asarray(mindl, dtype=np.float64)
    return t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * (d / avgdl)))


def _manifest_path(index_dir: str, p: int) -> str:
    return f"{index_dir}/manifest/part-{p:05d}.json"


def _read_manifest(index_dir: str, p: int) -> dict | None:
    try:
        with open(_manifest_path(index_dir, p)) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _write_manifest(index_dir: str, p: int, row: dict) -> None:
    os.makedirs(f"{index_dir}/manifest", exist_ok=True)
    tmp = _manifest_path(index_dir, p) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(row, fh, indent=2)
    os.replace(tmp, _manifest_path(index_dir, p))


def _stage(
    docs: DataFrame,
    index_dir: str,
    id_col: str,
    text_col: str,
    shard_size: int,
    shards_per_part: int,
    id_assign_partitions: int | None,
) -> dict:
    """Freeze the input: dense ids + bpart column, written once."""
    staged_meta_path = f"{index_dir}/staged.json"
    if os.path.exists(staged_meta_path):
        with open(staged_meta_path) as fh:
            return json.load(fh)
    keyed = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    with_ids = assign_dense_ids(
        keyed, ["doc_id"], "doc_int", num_partitions=id_assign_partitions
    )
    part_docs = shard_size * shards_per_part
    staged = with_ids.withColumn(
        "bpart", (F.col("doc_int") / part_docs).cast("long")
    )
    staged.write.mode("overwrite").partitionBy("bpart").parquet(
        f"{index_dir}/staged"
    )
    n_docs = docs.sparkSession.read.parquet(f"{index_dir}/staged").count()
    n_parts = (n_docs + part_docs - 1) // part_docs if n_docs else 0
    meta = {
        "n_docs": int(n_docs),
        "n_parts": int(n_parts),
        "shard_size": shard_size,
        "shards_per_part": shards_per_part,
    }
    tmp = staged_meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, staged_meta_path)
    return meta


def _build_one_part(
    spark: SparkSession,
    index_dir: str,
    p: int,
    shard_size: int,
    salt_chunk: int,
    min_token_length: int,
    stop_words,
) -> dict:
    """Build postings + vocab partial + docmap for one bpart."""
    t0 = time.time()
    sub = spark.read.parquet(f"{index_dir}/staged").filter(F.col("bpart") == p)

    tf0 = term_frequencies(
        sub, id_col="doc_int", text_col="text",
        min_token_length=min_token_length, stop_words=stop_words,
    )
    ds0 = document_stats(tf0)
    tf = tf0.withColumnRenamed("doc_id", "doc_int")
    ds = ds0.withColumnRenamed("doc_id", "doc_int")

    # per-part vocab partial (merged globally at finalize)
    vocab_part = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").alias("cf"),
    )
    vocab_part.write.mode("overwrite").parquet(
        f"{index_dir}/vocab_parts/bpart={p}"
    )

    # docmap for this part (every staged doc, dl=0 for token-empty)
    docmap = (
        sub.select("doc_id", "doc_int")
        .join(ds.select("doc_int", F.col("total_terms").alias("dl")),
              "doc_int", "left")
        .select("doc_id", "doc_int", F.coalesce("dl", F.lit(0)).alias("dl"))
    )
    docmap.repartitionByRange(4, "doc_int").sortWithinPartitions(
        "doc_int"
    ).write.mode("overwrite").parquet(f"{index_dir}/docmap/bpart={p}")

    n_docs_part = sub.count()
    tokens_part_row = ds.agg(F.coalesce(F.sum("total_terms"), F.lit(0))).collect()
    tokens_part = int(tokens_part_row[0][0])

    enriched = tf.join(ds.select("doc_int", F.col("total_terms").alias("dl")),
                       "doc_int").join(vocab_part.select("term", "df"), "term")
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
    postings = enriched.groupBy("shard", "term", "salt").applyInPandas(
        _encode_group, schema=POSTINGS_SCHEMA
    )
    (
        postings.repartition("shard")
        .sortWithinPartitions("term", "salt")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(f"{index_dir}/postings")
    )

    written = spark.read.parquet(f"{index_dir}/postings").filter(
        (F.col("shard") >= p * _spp(index_dir))
        & (F.col("shard") < (p + 1) * _spp(index_dir))
    )
    agg = written.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("postings"),
        F.coalesce(
            F.sum(F.length("gaps") + F.length("tfs") + F.length("dls")), F.lit(0)
        ).alias("bytes"),
    ).collect()[0]
    elapsed = time.time() - t0
    return {
        "bpart": p,
        "status": "done",
        "n_docs": int(n_docs_part),
        "tokens": tokens_part,
        "posting_rows": int(agg["rows"]),
        "n_postings": int(agg["postings"]),
        "compressed_payload_bytes": int(agg["bytes"]),
        "build_seconds": round(elapsed, 3),
        "docs_per_sec": round(n_docs_part / elapsed, 2) if elapsed > 0 else None,
        "tokens_per_sec": round(tokens_part / elapsed, 2) if elapsed > 0 else None,
    }


_SPP_CACHE: dict[str, int] = {}


def _spp(index_dir: str) -> int:
    if index_dir not in _SPP_CACHE:
        with open(f"{index_dir}/staged.json") as fh:
            _SPP_CACHE[index_dir] = json.load(fh)["shards_per_part"]
    return _SPP_CACHE[index_dir]


def finalize_index(
    spark: SparkSession,
    index_dir: str,
    k1: float,
    b: float,
    min_token_length: int,
    shard_size: int,
    salt_chunk: int,
) -> dict:
    """Merge vocab partials, compute collection stats, write meta."""
    vocab = (
        spark.read.parquet(f"{index_dir}/vocab_parts")
        .groupBy("term")
        .agg(
            F.sum("df").alias("document_frequency"),
            F.sum("cf").alias("collection_frequency"),
        )
    )
    vocab.write.mode("overwrite").parquet(f"{index_dir}/vocabulary")

    docmap = spark.read.parquet(f"{index_dir}/docmap")
    tomb = load_tombstones(index_dir)
    if tomb:
        docmap = docmap.filter(~F.col("doc_int").isin([int(x) for x in tomb]))
    cs = docmap.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("total"),
    ).collect()[0]
    n_docs, total_terms = int(cs["n"]), int(cs["total"])
    avgdl = total_terms / n_docs if n_docs else 0.0

    parts = []
    mdir = f"{index_dir}/manifest"
    if os.path.isdir(mdir):
        for fn in sorted(os.listdir(mdir)):
            if fn.endswith(".json"):
                with open(f"{mdir}/{fn}") as fh:
                    parts.append(json.load(fh))
    total_secs = sum(pm.get("build_seconds", 0) for pm in parts)
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
        "n_vocab_terms": int(vocab.count()),
        "posting_rows": sum(pm.get("posting_rows", 0) for pm in parts),
        "n_postings": sum(pm.get("n_postings", 0) for pm in parts),
        "compressed_payload_bytes": sum(
            pm.get("compressed_payload_bytes", 0) for pm in parts
        ),
        "n_parts": len(parts),
        "build_seconds": round(total_secs, 3),
        "docs_per_sec": round(n_docs / total_secs, 2) if total_secs > 0 else None,
        "tokens_per_sec": round(total_terms / total_secs, 2)
        if total_secs > 0
        else None,
    }
    os.makedirs(f"{index_dir}/stats", exist_ok=True)
    tmp = f"{index_dir}/stats/meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=2)
    os.replace(tmp, f"{index_dir}/stats/meta.json")
    return meta


def build_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_size: int = 100_000,
    salt_chunk: int = 200_000,
    shards_per_part: int = 8,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    min_token_length: int = MIN_TOKEN_LENGTH_DEFAULT,
    stop_words: Iterable[str] | None = None,
    id_assign_partitions: int | None = None,
    fail_after_parts: int | None = None,
) -> dict:
    """Checkpoint-resumable index build. Re-running after a crash skips
    bparts whose manifest rows are ``done`` (``fail_after_parts`` exists
    for the resume tests: raise after N parts to simulate a crash)."""
    spark = docs.sparkSession
    smeta = _stage(docs, index_dir, id_col, text_col, shard_size,
                   shards_per_part, id_assign_partitions)
    _SPP_CACHE[index_dir] = shards_per_part

    built = 0
    for p in range(smeta["n_parts"]):
        row = _read_manifest(index_dir, p)
        if row and row.get("status") == "done":
            continue
        metrics = _build_one_part(
            spark, index_dir, p, shard_size, salt_chunk,
            min_token_length, stop_words,
        )
        _write_manifest(index_dir, p, metrics)
        built += 1
        if fail_after_parts is not None and built >= fail_after_parts:
            raise RuntimeError(f"injected failure after {built} parts")

    return finalize_index(
        spark, index_dir, k1, b, min_token_length, shard_size, salt_chunk
    )


def load_meta(index_dir: str) -> dict:
    with open(f"{index_dir}/stats/meta.json") as fh:
        return json.load(fh)


def append_docs(
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incremental append (reference change-detector analog I6, done the
    Iceberg-snapshot way: new data claims FRESH id ranges → fresh build
    partitions; existing shards are never touched; global stats are
    re-derived from per-partition partials at finalize).

    New keys must not collide with existing ones (caller contract —
    dedupe/upsert is a MERGE on the staged table upstream). New ids
    start at the next part boundary so no existing part is rewritten.
    """
    spark = new_docs.sparkSession
    with open(f"{index_dir}/staged.json") as fh:
        smeta = json.load(fh)
    meta = load_meta(index_dir)
    shard_size = smeta["shard_size"]
    spp = smeta["shards_per_part"]
    part_docs = shard_size * spp
    start_part = smeta["n_parts"]
    start_id = start_part * part_docs

    keyed = new_docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    with_ids = assign_dense_ids(keyed, ["doc_id"], "doc_int").withColumn(
        "doc_int", F.col("doc_int") + F.lit(start_id)
    )
    staged = with_ids.withColumn(
        "bpart", (F.col("doc_int") / part_docs).cast("long")
    )
    new_parts = [
        r["bpart"] for r in staged.select("bpart").distinct().collect()
    ]
    for p in sorted(new_parts):
        staged.filter(F.col("bpart") == p).drop("bpart").write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/staged/bpart={p}")

    n_new = with_ids.count()
    smeta["n_docs"] = smeta["n_docs"] + int(n_new)
    smeta["n_parts"] = start_part + len(new_parts)
    tmp = f"{index_dir}/staged.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(smeta, fh)
    os.replace(tmp, f"{index_dir}/staged.json")
    _SPP_CACHE[index_dir] = spp

    for p in sorted(new_parts):
        metrics = _build_one_part(
            spark, index_dir, int(p), shard_size, meta["salt_chunk"],
            meta["min_token_length"], None,
        )
        _write_manifest(index_dir, int(p), metrics)
    return finalize_index(
        spark, index_dir, meta["k1"], meta["b"], meta["min_token_length"],
        shard_size, meta["salt_chunk"],
    )


# ---------------------------------------------------------------------------
# Deletion (reference I4/I5 analog) — tombstones + compaction
# ---------------------------------------------------------------------------

def load_tombstones(index_dir: str) -> set[int]:
    path = f"{index_dir}/tombstones/doc_ints.json"
    try:
        with open(path) as fh:
            return set(json.load(fh))
    except FileNotFoundError:
        return set()


def delete_docs(spark: SparkSession, index_dir: str, doc_keys: list) -> dict:
    """Mark docs deleted (by original key). Scorers mask tombstoned ids
    at decode; ``finalize_index`` recomputes N/avgdl without them; df
    stays stale until ``compact_index`` rewrites the affected parts
    (the reference rewrites posting lists eagerly —
    inverted_index_builder.py:70-92 — which at 10^12 docs is exactly
    what we must NOT do per deletion)."""
    docmap = spark.read.parquet(f"{index_dir}/docmap")
    ints = [
        r["doc_int"]
        for r in docmap.filter(F.col("doc_id").isin(doc_keys)).collect()
    ]
    tomb = load_tombstones(index_dir) | set(int(x) for x in ints)
    os.makedirs(f"{index_dir}/tombstones", exist_ok=True)
    tmp = f"{index_dir}/tombstones/doc_ints.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(sorted(tomb), fh)
    os.replace(tmp, f"{index_dir}/tombstones/doc_ints.json")
    # Stats (N/avgdl/df) intentionally stay pre-delete until compaction:
    # tombstoned docs vanish from results immediately; surviving docs'
    # scores are unchanged until compact_index() recomputes everything.
    return load_meta(index_dir)


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Rewrite every bpart containing tombstoned docs: stage stays, the
    deleted rows are dropped from staged's view, postings/vocab/docmap
    for those parts are rebuilt, tombstones cleared, index re-finalized.
    Equivalent to the reference's remove_from_index + stats removal
    (I4/I5), done partition-locally."""
    tomb = load_tombstones(index_dir)
    meta = load_meta(index_dir)
    if not tomb:
        return meta
    with open(f"{index_dir}/staged.json") as fh:
        smeta = json.load(fh)
    part_docs = smeta["shard_size"] * smeta["shards_per_part"]
    affected = sorted({int(d) // part_docs for d in tomb})
    tomb_list = [int(x) for x in tomb]

    for p in affected:
        # rewrite staged bpart without tombstoned docs
        sub = spark.read.parquet(f"{index_dir}/staged").filter(
            (F.col("bpart") == p) & (~F.col("doc_int").isin(tomb_list))
        )
        sub.drop("bpart").write.mode("overwrite").parquet(
            f"{index_dir}/staged_tmp/bpart={p}"
        )
    for p in affected:
        import shutil

        dst = f"{index_dir}/staged/bpart={p}"
        shutil.rmtree(dst, ignore_errors=True)
        os.rename(f"{index_dir}/staged_tmp/bpart={p}", dst)
        _write_manifest(index_dir, p, {"bpart": p, "status": "stale"})
    import shutil

    shutil.rmtree(f"{index_dir}/staged_tmp", ignore_errors=True)
    os.remove(f"{index_dir}/tombstones/doc_ints.json")

    # rebuild stale parts
    for p in affected:
        metrics = _build_one_part(
            spark, index_dir, p, meta["shard_size"], meta["salt_chunk"],
            meta["min_token_length"], None,
        )
        _write_manifest(index_dir, p, metrics)
    return finalize_index(
        spark, index_dir, meta["k1"], meta["b"], meta["min_token_length"],
        meta["shard_size"], meta["salt_chunk"],
    )
