"""Pure-Python XXH64 pinned against Spark's F.xxhash64."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from oboyu_spark.functions.hashing import (
    spark_xxhash64_str,
    spark_xxhash64_str_int,
)


def _random_strings(n=120):
    rng = random.Random(99)
    pool = "abc XYZ 検索索引 0123 ひらがな カタカナ 🚀 ß é \n\t"
    out = [""]
    for _ in range(n):
        k = rng.randint(0, 60)
        out.append("".join(rng.choice(pool) for _ in range(k)))
    # long strings exercise the 32-byte stripe loop
    out.append("x" * 1000)
    out.append("検索" * 300)
    return out


def test_xxh64_matches_spark(spark):
    strings = _random_strings()
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h1"),
        F.xxhash64("s", F.lit(7)).alias("h2"),
    ).collect()
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h1"], repr(r["s"])
        assert spark_xxhash64_str_int(r["s"], 7) == r["h2"], repr(r["s"])
