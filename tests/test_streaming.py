"""Structured-Streaming incremental ingest: two file drops → index
equals a batch build over the union (gated oracle comparison)."""

from __future__ import annotations

import pytest

from oboyu_spark.operators.postings import build_index, load_meta
from oboyu_spark.operators.searchidx import search_index
from oboyu_spark.oracle.pybm25 import PyBM25
from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs
from oboyu_spark.streaming.ingest import stream_transcripts_into_index


def test_streaming_ingest_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    inp = str(tmp_path / "in")
    idx = str(tmp_path / "idx")
    chk = str(tmp_path / "chk")

    tr1 = synthesize_transcripts(spark, n_convs=25, max_turns=6, seed=3)
    tr2 = synthesize_transcripts(spark, n_convs=15, max_turns=6, seed=5).select(
        F.concat(F.lit("x"), "conv_id").alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )

    # bootstrap the index with the first batch (streaming appends need
    # an existing staged index)
    base_docs = turns_as_docs(tr1).select("doc_id", "text")
    build_index(base_docs, idx, shard_size=50, salt_chunk=60,
                shards_per_part=2, id_assign_partitions=4)

    # drop batch 2 as files, run the stream once
    tr2.write.mode("overwrite").parquet(inp)
    q = stream_transcripts_into_index(spark, inp, idx, chk)
    q.awaitTermination(120)

    meta = load_meta(idx)
    n1, n2 = base_docs.count(), tr2.count()
    assert meta["n_docs"] == n1 + n2

    # rank identity vs the oracle over the union corpus
    union = [(r["doc_id"], r["text"]) for r in base_docs.collect()] + [
        (r["doc_id"], r["text"])
        for r in turns_as_docs(tr2).select("doc_id", "text").collect()
    ]
    oracle = PyBM25()
    oracle.index(union)
    for query in ["spark index", "検索 分散"]:
        got = search_index(spark, idx, query, k=10).collect()
        exp = oracle.search(query, k=10)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], query
        for r, (_, s) in zip(got, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9)


def test_replay_of_finalized_batch_is_skipped(spark, tmp_path):
    """Crash between a completed append and the checkpoint commit
    replays the batch; the batch manifest must make the replay a no-op
    instead of silently double-indexing."""
    from pyspark.sql import functions as F

    from oboyu_spark.streaming.ingest import _done_batches, handle_batch_factory

    idx = str(tmp_path / "idx")
    base = synthesize_transcripts(spark, n_convs=10, max_turns=4, seed=3)
    base_docs = turns_as_docs(base).select("doc_id", "text")
    build_index(base_docs, idx, shard_size=50, salt_chunk=60,
                shards_per_part=2, id_assign_partitions=4)
    n0 = load_meta(idx)["n_docs"]

    extra = turns_as_docs(
        synthesize_transcripts(spark, n_convs=5, max_turns=4, seed=9).select(
            F.concat(F.lit("y"), "conv_id").alias("conv_id"),
            "turn_idx", "role", "text", "tool", "ts",
        )
    ).select("doc_id", "text")
    n_extra = extra.count()

    handler = handle_batch_factory(idx)
    handler(extra, 0)
    assert load_meta(idx)["n_docs"] == n0 + n_extra
    assert _done_batches(idx) == {0}
    # simulated checkpoint replay of the SAME finalized batch id
    handler(extra, 0)
    assert load_meta(idx)["n_docs"] == n0 + n_extra  # not double-indexed


def test_windowed_turn_counts_with_watermark(spark, tmp_path):
    """Append-mode watermark semantics: only FINALIZED windows (end <
    watermark) reach the sink, their counts equal the batch groupBy,
    and a replayed/late drop can't double-count them."""
    from pyspark.sql import functions as F

    from oboyu_spark.streaming.aggregate import (
        stream_turn_rates, windowed_turn_counts,
    )

    inp, outp, chk = (str(tmp_path / d) for d in ("in", "out", "chk"))
    tr = synthesize_transcripts(spark, n_convs=40, max_turns=8, seed=21)
    tr.write.mode("overwrite").parquet(inp)

    q = stream_turn_rates(spark, inp, outp, chk,
                          window="10 minutes", watermark="30 minutes")
    q.awaitTermination(120)

    got = spark.read.parquet(outp)
    batch = (
        tr.groupBy(F.window("ts", "10 minutes").alias("w"), "role")
        .agg(F.count(F.lit(1)).cast("long").alias("n_turns"))
        .select(F.col("w.start").alias("window_start"), "role", "n_turns")
    )
    max_ts = tr.agg(F.max("ts")).collect()[0][0]
    g = {(r["window_start"], r["role"]): r["n_turns"] for r in got.collect()}
    b = {(r["window_start"], r["role"]): r["n_turns"] for r in batch.collect()}
    assert g, "no finalized windows emitted"
    for k, v in g.items():
        assert b[k] == v, k                    # exact counts
        assert k[0] < max_ts                   # only closed windows
    # tail windows (within the watermark horizon) are withheld
    assert len(g) < len(b)


def test_stateful_sessionization_across_runs(spark, tmp_path):
    """applyInPandasWithState sessionization: session ordinals carry
    across file drops AND across query restarts (state store restored
    from the checkpoint), matching the batch operator over the full
    stream prefix."""
    from pyspark.sql import functions as F

    from oboyu_spark.operators.sessionize import sessionize_turns
    from oboyu_spark.streaming.sessions import sessionize_stream

    inp, outp, chk = (str(tmp_path / d) for d in ("in", "out", "chk"))
    rows1 = [
        ("c1", 0, "2025-01-01 10:00:00"),
        ("c1", 1, "2025-01-01 10:10:00"),
        ("c2", 0, "2025-01-01 09:00:00"),
    ]
    rows2 = [
        ("c1", 2, "2025-01-01 10:15:00"),   # within gap → same session
        ("c1", 3, "2025-01-01 12:00:00"),   # 105 min → new session
        ("c2", 1, "2025-01-01 11:00:00"),   # 120 min → new session
    ]

    def _df(rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, ts string"
        ).select(
            "conv_id", "turn_idx",
            F.lit(None).cast("string").alias("role"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.col("ts").cast("timestamp").alias("ts"),
        ).select("conv_id", "turn_idx", "role", "text", "tool", "ts")

    _df(rows1).write.mode("append").parquet(inp)
    q = sessionize_stream(spark, inp, outp, chk, gap_minutes=30)
    q.awaitTermination(120)
    _df(rows2).write.mode("append").parquet(inp)
    q = sessionize_stream(spark, inp, outp, chk, gap_minutes=30)  # restart
    q.awaitTermination(120)

    got = {(r["conv_id"], r["turn_idx"]): r["session_id"]
           for r in spark.read.parquet(outp).collect()}
    # batch operator over the union is the oracle
    full = _df(rows1 + rows2)
    exp = {(r["conv_id"], r["turn_idx"]): r["session_id"]
           for r in sessionize_turns(full, gap_minutes=30).collect()}
    assert got == exp
    assert got[("c1", 2)] == got[("c1", 0)]      # continued across runs
    assert got[("c1", 3)] != got[("c1", 2)]      # gap opened new session
