"""Transcript corpus: the engine's primary input shape.

Input table (BASELINE.json input_hint):
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Each turn is one BM25 document with the stable key
``doc_key = conv_id || '#' || turn_idx`` (reference chunk-id analog;
deterministic instead of uuid4, SURVEY §2.3 C2).

``synthesize_transcripts`` generates a deterministic corpus of any size
entirely with JVM expressions over ``spark.range`` — xxhash64-seeded
template text (mixed Japanese + English, per FIXTURES.md F1: empty
turns, >1024-char turns, CRLF / double-space dirt for the normalization
paths), no Python in the loop, so the same generator scales from 1k
turns (unit tests) to bench corpora. No wall-clock, no RNG state —
regeneration is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Mixed EN+JP template vocabulary (style of the reference's synthetic
# bench generator bench/speed/generate_test_data.py — our own word list).
WORDS = (
    "spark index search query token engine distributed shuffle partition "
    "broadcast executor driver parquet iceberg snapshot manifest posting "
    "inverted score rank document corpus merge compress varbyte block "
    "検索 索引 分散 処理 高速 大規模 文書 形態素 日本語 学習 "
    "モデル データ 解析 変換 圧縮 統計 言語 抽出 評価 構築"
).split()

ROLES = ["user", "assistant", "tool"]
TOOLS = [None, "bash", "search", "python", "browser"]
EPOCH = "2025-01-01 00:00:00"


def _word_at(ix: Column) -> Column:
    pool = F.array(*[F.lit(w) for w in WORDS])
    return F.element_at(pool, (F.pmod(ix, F.lit(len(WORDS))) + 1).cast("int"))


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    max_turns: int = 20,
    seed: int = 42,
    num_partitions: int | None = None,
    words_scale: int = 1,
) -> DataFrame:
    """Deterministic transcripts DataFrame, one row per turn.

    ``words_scale`` multiplies every turn's word count (same
    distribution shape) — used by the scaling benches to make per-core
    compute dominate fixed orchestration costs."""
    # turns per conversation: 1..max_turns, hash-derived
    convs = spark.range(0, n_convs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    convs = convs.select(
        F.col("id").alias("conv_num"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(max_turns)) + 1)
        .cast("int")
        .alias("n_turns"),
    )
    turns = convs.select(
        "conv_num",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    gid = F.xxhash64(F.col("conv_num"), F.col("turn_idx"), F.lit(seed))
    # text length in words: 0 for ~1/41 of turns (empty-doc path),
    # ~300 words for ~1/37 (long-turn/chunker path), else 1..60.
    n_words = (
        F.when(F.pmod(gid, F.lit(41)) == 0, F.lit(0))
        .when(F.pmod(gid, F.lit(37)) == 0, F.lit(300))
        .otherwise(F.pmod(gid, F.lit(60)) + 1)
    ) * F.lit(int(words_scale))
    # NB: F.sequence(1, 0) DESCENDS ([1, 0]) rather than being empty —
    # guard the zero-word case explicitly.
    words = F.when(n_words > 0, F.transform(
        F.sequence(F.lit(1), n_words.cast("int")),
        lambda i: _word_at(F.xxhash64(gid, i)),
    )).otherwise(F.array().cast("array<string>"))
    base_text = F.concat_ws(" ", words)
    # dirt: CRLF + double spaces on ~1/31 of turns (normalization N4/N5)
    text = F.when(
        F.pmod(gid, F.lit(31)) == 0,
        F.concat(base_text, F.lit("\r\nline  two\r\n\r\n\r\nline three　full")),
    ).otherwise(base_text)

    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]),
        (F.pmod(gid, F.lit(len(ROLES))) + 1).cast("int"),
    )
    tool = F.element_at(
        F.array(*[F.lit(t) for t in TOOLS]),
        (F.pmod(F.xxhash64(gid, F.lit(7)), F.lit(len(TOOLS))) + 1).cast("int"),
    )
    ts = F.to_timestamp(F.lit(EPOCH)) + F.make_dt_interval(
        F.lit(0), F.lit(0), (F.col("conv_num") * 1440 + F.col("turn_idx") * 3).cast("int"), F.lit(0)
    )

    return turns.select(
        F.format_string("conv_%08d", F.col("conv_num")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def doc_key(conv_id: Column, turn_idx: Column) -> Column:
    """Stable per-turn document key (reference chunk id analog)."""
    return F.concat_ws("#", conv_id, turn_idx.cast("string"))


def turns_as_docs(transcripts: DataFrame) -> DataFrame:
    """(doc_id string, text, role, tool, ts) — one BM25 doc per turn.

    Text passes through UNCHANGED (per-turn text-equality invariant —
    BASELINE.json input_hint; normalization happens inside the
    index-build operators, never on this mapping).
    """
    return transcripts.select(
        doc_key(F.col("conv_id"), F.col("turn_idx")).alias("doc_id"),
        "text",
        "role",
        "tool",
        "ts",
    )


def transcripts_from_documents(docs: DataFrame, convs: int = 97) -> DataFrame:
    """Deterministically reshape the driver's ``documents`` table into
    transcript shape (used by driver-checked queries; DuckDB twin in
    plans/oracle_sql.transcripts_cte — keep in sync)."""
    return docs.select(
        F.format_string("conv_%04d", F.pmod(F.col("doc_id"), F.lit(convs))).alias(
            "conv_id"
        ),
        (F.col("doc_id") / convs).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        (
            F.to_timestamp(F.lit(EPOCH))
            + F.make_dt_interval(F.lit(0), F.lit(0), F.col("doc_id").cast("int"), F.lit(0))
        ).alias("ts"),
    )
