"""BMW-vs-TAAT where it pays: kernel isolation + batched A/B (r7).

Why this experiment exists (VERDICT r6 #3): at sf0.1 the single-query
p50 is dominated by the Spark job floor (~0.3-1.5 s on this box) while
the per-shard scoring KERNEL — the thing block-max pruning accelerates,
and the thing that scales with corpus size per task at 100 TB — is
single-digit milliseconds, invisible end-to-end. Two measurements make
the win (or its absence) legible:

1. KERNEL: run the exact applyInPandas scorer closures
   (make_taat_scorer / make_bmw_scorer) driver-side over the REAL
   per-shard postings frames of the built index, timing nothing but
   the scoring. Reported per workload (selective = one rare high-IDF
   term + hot terms, the BMW shape; hot = all-hot terms, BMW's
   worst case since nothing can be pruned).
2. BATCH END-TO-END: the same index queried with 120 queries in ONE
   job (reader.search), where the job floor is amortized and kernel
   time is the marginal cost — interleaved best-of per the BENCH.md
   noise protocol.

Run:  python exp_bmw_kernel.py   (prints one JSON line)
"""
from __future__ import annotations

import json
import math
import shutil
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

from oboyu_spark.functions.hashing import (
    spark_xxhash64_str, spark_xxhash64_str_int,
)
from oboyu_spark.operators.postings import TERM_HASH_SEED2, build_index, load_meta
from oboyu_spark.operators.searchidx import IndexReader, _query_maps, make_taat_scorer
from oboyu_spark.operators.wand import make_bmw_scorer
from oboyu_spark.session import get_spark
from oboyu_spark.sources.queries import generate_queries
from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs

KERNEL_REPS = 5
BATCH_REPS = 3


def host_bw():
    try:
        from host_controls import run_level

        run_level("bw", 8, 0.5)  # warm: first-touch fault tax
        return round(max(run_level("bw", 8, 2.0) for _ in range(2)) / 1e9, 2)
    except Exception:
        return None


def kernel_setup(spark, idx, queries, meta):
    """(qmap on hash keys, idf_map, shard pandas frames) — the same
    inputs _search hands the scorer, fetched once."""
    qmap, all_terms = _query_maps(queries, meta["min_token_length"])
    t2h = {t: (spark_xxhash64_str(t),
               spark_xxhash64_str_int(t, TERM_HASH_SEED2))
           for t in all_terms}
    h1s = sorted({h[0] for h in t2h.values()})
    vocab = (
        spark.read.parquet(f"{idx}/vocabulary")
        .filter(F.col("th1").isin(h1s)).collect()
    )
    df_by_hash = {(r["th1"], r["th2"]): int(r["document_frequency"])
                  for r in vocab}
    n = meta["n_docs"]
    idf = {h: math.log((n - df + 0.5) / (df + 0.5))
           for h, df in df_by_hash.items()}
    hq = {qid: [(t2h[t], qtf) for t, qtf in qterms if t2h[t] in idf]
          for qid, qterms in qmap.items()}
    pdf = (
        spark.read.parquet(f"{idx}/postings")
        .filter(F.col("th1").isin(h1s)).toPandas()
    )
    shards = [g for _, g in pdf.groupby("shard")]
    return hq, idf, shards


def time_kernel(make, hq, idf, meta, shards, k=10):
    fn = make(hq, idf, meta["k1"], meta["b"], meta["avgdl"], k,
              meta["shard_size"])
    best = None
    for _ in range(KERNEL_REPS):
        t0 = time.perf_counter()
        rows = sum(len(fn(s)) for s in shards)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best * 1000, 2), rows


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--shard-size", type=int, default=10_000)
    ap.add_argument("--convs", type=int, default=12_000)
    ap.add_argument("--skip-batch", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="bmw_kernel_ab", cores="32")
    out: dict = {"bw_before": host_bw(), "shard_size": args.shard_size}

    tr = synthesize_transcripts(spark, n_convs=args.convs, max_turns=20,
                                seed=42)
    docs = turns_as_docs(tr).select("doc_id", "text")
    rare = spark.range(400).select(
        F.format_string("rare#%04d", F.col("id")).alias("doc_id"),
        F.concat(
            F.format_string("zsel%02d", F.pmod(F.col("id"), F.lit(20))),
            F.lit(" spark index search engine 検索 分散"),
        ).alias("text"),
    )
    docs = docs.unionByName(rare)

    idx = tempfile.mkdtemp(prefix="bmw_ab_idx_")
    try:
        t0 = time.time()
        meta = build_index(docs, idx, shard_size=args.shard_size,
                           salt_chunk=500_000, shards_per_part=16)
        out["build_seconds"] = round(time.time() - t0, 1)
        out["n_docs"] = meta["n_docs"]
        meta = load_meta(idx)

        hot_queries = [q["text"] for q in generate_queries()][:10]
        sel_queries = [f"zsel{i:02d} spark index engine" for i in range(10)]

        for wname, qs in (("selective", sel_queries), ("hot", hot_queries)):
            hq, idf, shards = kernel_setup(spark, idx, qs, meta)
            out[f"kernel_{wname}_postings_rows"] = int(
                sum(len(s) for s in shards))
            taat_ms, taat_rows = time_kernel(make_taat_scorer, hq, idf,
                                             meta, shards)
            bmw_ms, bmw_rows = time_kernel(make_bmw_scorer, hq, idf,
                                           meta, shards)
            assert taat_rows == bmw_rows  # same candidates emitted
            out[f"kernel_{wname}_taat_ms"] = taat_ms
            out[f"kernel_{wname}_bmw_ms"] = bmw_ms
            out[f"kernel_{wname}_speedup"] = round(taat_ms / bmw_ms, 2)

        if args.skip_batch:
            print(json.dumps(out))
            return
        # batched end-to-end: 120 selective queries, one job per rep
        reader = IndexReader(spark, idx)
        batch = [f"zsel{i % 20:02d} spark index engine {j}words"[:64]
                 for j in range(6) for i in range(20)]
        batch = [f"zsel{i % 20:02d} spark index engine"
                 for i in range(120)]
        reader.search(batch[:10], k=10, scorer="taat").count()  # warm
        reader.search(batch[:10], k=10, scorer="bmw").count()
        reps = {"taat": [], "bmw": []}
        for _ in range(BATCH_REPS):
            for name in ("taat", "bmw"):
                t1 = time.time()
                reader.search(batch, k=10, scorer=name).count()
                reps[name].append(round(time.time() - t1, 3))
        out["batch_selective_reps"] = reps
        out["batch_selective_taat_s"] = min(reps["taat"])
        out["batch_selective_bmw_s"] = min(reps["bmw"])
        out["batch_selective_speedup"] = round(
            min(reps["taat"]) / min(reps["bmw"]), 2)
        reader.close()
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    out["bw_after"] = host_bw()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
