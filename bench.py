"""Headline benchmark — run by the driver each round.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {component: sec, ...}, "sf": ..., ...extras}

Components:
    build_index      — full compressed-index build over a synthesized
                       transcript corpus sized by sf (~120k turns at
                       sf0.1): tokenize → term shuffle → varbyte encode
                       → sharded parquet + manifest (one-shot; phase
                       decomposition in build_phase_seconds)
    build_widevocab  — the same build over a ~200k-distinct-term corpus
                       (sf0.1) so the encoder's posting-group scaling
                       is regression-gated in the artifact (the
                       transcript vocabulary is only 44 words)
    build_bigshard   — the same corpus at shard_size=130k, the geometry
                       where block-max pruning pays (VERDICT r6 #3)
    query_taat_p50 / query_bmw_p50 / *_selective_p50 / query_warm_p50
                     — p50 single-query latency over the built index
    query_batch      — all 120 fixture queries in ONE batched job
    batch_selective_{taat,bmw}_bigshard
                     — 120 selective queries (rare term + hot terms)
                       on the big-shard index, one job each: the BMW
                       separation row (bmw_selective_batch_speedup)
    bm25_relational  — inline relational BM25 top-k over the driver's
                       documents.parquet (no prebuilt index)

Noise protocol (round-4, per VERDICT r3 #1): this box is a shared host
whose minute-to-minute wall-clock noise reaches 2x. Every query
component is therefore measured REPS times in an interleaved
round-robin (component order rotates inside each rep so one degraded
minute cannot sink a single component), and the reported number is the
BEST rep. All reps are published under "query_reps" so a degraded
window is visible in the JSON itself: tight spreads mean the best is
representative; a wide spread means the host was noisy and the best is
the defensible capability number. The build stays one-shot (it is the
first timed action in a fresh JVM and dominates total wall; its phase
decomposition + scaling_bench.py carry its noise story).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import tempfile
import time

REPS = 3  # interleaved best-of-N for every query component


def _host_bw_gbps(n: int = 8, dur: float = 2.0):
    """Same-run host control (VERDICT r5 #1): the shared box's
    multi-core streaming bandwidth, measured by host_controls' probe.
    Recorded before and after the suite so a degraded host window is
    self-evident IN the artifact (r5's in-artifact regression was
    cleared only by out-of-band reruns). Healthy ≈ 30-80 GB/s at 8
    workers.

    Warm-then-measure (r7): the FIRST memory sweep after the VM sits
    idle pays a first-touch page-fault tax — measured on this box as a
    2 s probe taking ~20 s wall and reading 0.4-1 GB/s, with the
    immediately repeated probe reading 60-68 GB/s. A single cold probe
    therefore reports the fault path, not streaming bandwidth (this
    contaminated the r6 'collapse' readings). One 0.5 s throwaway
    sweep first, then best-of-2 measured probes."""
    try:
        from host_controls import run_level

        run_level("bw", n, 0.5)  # absorb the first-touch fault tax
        return round(
            max(run_level("bw", n, dur) for _ in range(2)) / 1e9, 2
        )
    except Exception:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1

    from oboyu_spark.operators.bm25 import bm25_search
    from oboyu_spark.operators.postings import build_index
    from oboyu_spark.operators.searchidx import IndexReader, search_index
    from oboyu_spark.session import get_spark
    from oboyu_spark.sources.queries import generate_queries
    from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs

    spark = get_spark(app_name="oboyu_spark_bench", cores=cpus)

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}
    extras["host_bw_gbps_before"] = _host_bw_gbps()

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

        # --- wide-vocabulary build (VERDICT r4 #6) ---
        # The transcript corpus has a 44-word vocabulary, so the main
        # build never exercises the streaming encoder's group-count
        # scaling (one posting group per distinct term). This corpus
        # draws ~30 words/doc from a ~2M·sf-term vocabulary (~200k
        # distinct terms at sf0.1), regression-gating the encode
        # stage's group scaling inside the recorded artifact instead
        # of a one-off microbench.
        wv_n_docs = max(2_000, int(600_000 * sf))
        wv_vocab = max(10_000, int(2_000_000 * sf))
        wv_docs = spark.range(wv_n_docs).select(
            F.format_string("wv#%07d", F.col("id")).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(30)),
                    lambda j: F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64(F.col("id"), j), F.lit(wv_vocab)),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        wv_dir = tempfile.mkdtemp(prefix="oboyu_bench_wv_")
        try:
            t0 = time.time()
            wv_meta = build_index(
                wv_docs, wv_dir,
                shard_size=10_000, salt_chunk=50_000, shards_per_part=16,
            )
            timings["build_widevocab"] = round(time.time() - t0, 3)
            extras["widevocab_vocab_target"] = wv_vocab
            extras["widevocab_docs"] = wv_meta["n_docs"]
            extras["widevocab_tokens_per_sec"] = round(
                wv_meta["total_terms"] / timings["build_widevocab"], 1
            )
            extras["widevocab_phase_seconds"] = wv_meta.get("phase_seconds")
            extras["widevocab_postings"] = wv_meta["n_postings"]
        finally:
            shutil.rmtree(wv_dir, ignore_errors=True)

        queries = [q["text"] for q in generate_queries()]
        # selective workload: one rare high-idf term + hot terms — the
        # shape block-max pruning exists for (VERDICT r1 asked BMW to
        # beat TAAT on at least one measured workload)
        sel_queries = [f"zsel{i:02d} spark index engine" for i in range(10)]

        # --- big-shard index: the geometry where BMW pays (VERDICT r6
        # #3, measured by exp_bmw_kernel.py) ---
        # At the default 10k-doc shards the vectorized TAAT accumulate
        # beats BMW's cell bookkeeping (short lists); at 130k-doc
        # shards a selective query's kernel is ~5× cheaper under BMW
        # (the rare term confines candidates, the hot 126k-entry lists
        # get block-skipped) and a 120-query batch — where the job
        # floor is amortized — separates end-to-end. These two rows
        # put that separation in the per-round artifact.
        bs_dir = tempfile.mkdtemp(prefix="oboyu_bench_bs_")
        t0 = time.time()
        build_index(docs, bs_dir, shard_size=130_000, salt_chunk=500_000,
                    shards_per_part=16)
        timings["build_bigshard"] = round(time.time() - t0, 3)
        reader_bs = IndexReader(spark, bs_dir)
        sel_batch = [f"zsel{i % 20:02d} spark index engine"
                     for i in range(120)]

        reader = IndexReader(spark, idx_dir)
        ddocs = spark.read.parquet(f"{sf_dir}/documents.parquet")

        # --- hybrid serving branch: IVF index over the same corpus ---
        # (VERDICT r5 #5: the warm hybrid p50 belongs in the artifact;
        # r5 measured it out-of-band at 1.27 s pre-fold)
        from oboyu_spark.operators.embed import embed_docs, embed_text
        from oboyu_spark.operators.hybrid import hybrid_search_folded
        from oboyu_spark.operators.similarity import IvfReader, ivf_build

        ivf_dir = tempfile.mkdtemp(prefix="oboyu_bench_ivf_")
        t0 = time.time()
        emb = embed_docs(docs, dim=16).withColumnRenamed("doc_id", "vec_id")
        ivf_build(emb, ivf_dir, n_lists=64, sample=50_000, iters=5, seed=3)
        extras["ivf_build_seconds"] = round(time.time() - t0, 3)
        ivf = IvfReader(spark, ivf_dir)

        def run_hybrid(q):
            hybrid_search_folded(reader, ivf, q, embed_text(q, dim=16),
                                 k_each=20, limit=10, nprobe=4)

        def lat_p50(run_one, qs):
            lat = []
            for q in qs:
                t1 = time.time()
                run_one(q)
                lat.append(time.time() - t1)
            return statistics.median(lat)

        def run_taat(q):
            search_index(spark, idx_dir, q, k=10, scorer="taat").collect()

        def run_bmw(q):
            search_index(spark, idx_dir, q, k=10, scorer="bmw").collect()

        def run_warm(q):
            # the serving path shape (serve_index uses search_rows):
            # driver-cut winners consumed as rows, no result-frame job
            reader.search_rows(q, k=10)

        # Each component closure returns the seconds to report for one rep.
        # 5 queries per latency rep x 3 reps = 15 samples per component,
        # interleaved so host noise hits all components evenly.
        components: list[tuple[str, object]] = [
            ("query_taat_p50", lambda: lat_p50(run_taat, queries[:5])),
            ("query_bmw_p50", lambda: lat_p50(run_bmw, queries[:5])),
            ("query_taat_selective_p50", lambda: lat_p50(run_taat, sel_queries[:5])),
            ("query_bmw_selective_p50", lambda: lat_p50(run_bmw, sel_queries[:5])),
            ("query_warm_p50", lambda: lat_p50(run_warm, queries[:5])),
            ("query_hybrid_p50", lambda: lat_p50(run_hybrid, queries[:5])),
        ]

        def run_batch():
            t1 = time.time()
            n = reader.search(queries, k=10, scorer="taat").count()
            extras["batch_result_rows"] = int(n)
            return time.time() - t1

        def run_relational():
            t1 = time.time()
            bm25_search(ddocs, "spark query join table", k=20).collect()
            return time.time() - t1

        def run_batch_sel_taat():
            t1 = time.time()
            reader_bs.search(sel_batch, k=10, scorer="taat").count()
            return time.time() - t1

        def run_batch_sel_bmw():
            t1 = time.time()
            reader_bs.search(sel_batch, k=10, scorer="bmw").count()
            return time.time() - t1

        def run_batch_sel_auto():
            # the product default path for this geometry: auto must
            # flip to BMW here (selective batch + 130k shard) and the
            # row should track the explicit-bmw row
            t1 = time.time()
            reader_bs.search(sel_batch, k=10, scorer="auto").count()
            return time.time() - t1

        components.append(("query_batch", run_batch))
        components.append(("batch_selective_taat_bigshard", run_batch_sel_taat))
        components.append(("batch_selective_bmw_bigshard", run_batch_sel_bmw))
        components.append(("batch_selective_auto_bigshard", run_batch_sel_auto))
        components.append(("bm25_relational", run_relational))

        # warmup: JIT + parquet footer caches, outside any timed rep
        # (reference protocol style: bench/config.py:72-77 warms before
        # measuring)
        for q in queries[:2]:
            run_taat(q)
            run_bmw(q)
            run_warm(q)
            run_hybrid(q)
        run_relational()
        reader_bs.search(sel_batch[:10], k=10, scorer="taat").count()
        reader_bs.search(sel_batch[:10], k=10, scorer="bmw").count()

        reps: dict[str, list[float]] = {name: [] for name, _ in components}
        for r in range(REPS):
            # rotate start offset so a monotonically degrading window
            # doesn't always hit the same components last
            order = components[r % len(components):] + components[: r % len(components)]
            for name, fn in order:
                reps[name].append(fn())

        for name, _ in components:
            timings[name] = round(min(reps[name]), 3)
        extras["query_reps"] = {
            name: [round(x, 3) for x in vals] for name, vals in reps.items()
        }
        extras["query_rep_protocol"] = (
            f"interleaved best-of-{REPS}; latency components report p50 over 5 "
            "queries per rep; spread across reps is the host-noise floor"
        )
        extras["batch_queries_per_sec"] = round(
            len(queries) / timings["query_batch"], 2
        )
        extras["bmw_selective_batch_speedup"] = round(
            timings["batch_selective_taat_bigshard"]
            / timings["batch_selective_bmw_bigshard"], 2
        )
        reader.close()
        reader_bs.close()
        shutil.rmtree(bs_dir, ignore_errors=True)
        ivf.close()
        shutil.rmtree(ivf_dir, ignore_errors=True)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    extras["host_bw_gbps_after"] = _host_bw_gbps()
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
