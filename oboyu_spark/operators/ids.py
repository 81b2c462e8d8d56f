"""Deterministic dense int64 doc-id assignment — the scale-correct way.

The compressed posting-list layout (operators/postings.py) wants dense
int64 doc ids (delta-gap encoding needs small gaps; 64-bit random
hashes would (a) waste gap bits and (b) collide at 10^12 docs —
birthday bound gives ~27k expected collisions at 1e12 keys on 64 bits,
unacceptable for rank identity).

``assign_dense_ids`` produces a deterministic, collision-free, dense
mapping without ever funneling data through one partition:

1. range-repartition by the key + sort within partitions,
2. ONE pass tags every row with its (partition id, local row index)
   and — when ``scratch_dir`` is given — MATERIALIZES that tagging to
   parquet. This is the crucial step: deriving per-partition offsets
   from a *recomputable* plan is unsound, because the offset-collection
   action and the consuming action may recompute the range shuffle with
   different boundaries (AQE coalescing, sampling), silently assigning
   duplicate/skipped ids. Freezing (pid, rn) on disk makes both
   downstream reads see the same partitioning by construction.
   (This exact bug was observed: the same corpus produced indexes with
   2,511,139 vs 2,554,482 postings at local[32] vs local[8].)
3. per-pid counts → offsets (tiny collect) → id = offset[pid] + rn via
   a broadcast join.

Without ``scratch_dir`` (small/test inputs) the tagged frame is
persisted in memory instead — same single-computation guarantee as
long as the cache holds, which callers must know is only best-effort.

The reference has no analog (single-node uuid4 chunk ids,
document_processor.py:55-127 — explicitly replaced per SURVEY §2.3 C2:
uuid4 would break reproducibility).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def _tag_partitions(df: DataFrame) -> DataFrame:
    """Append (_pid, _rn): stage partition id + local row index."""
    schema = StructType(
        list(df.schema.fields)
        + [StructField("_pid", IntegerType(), False),
           StructField("_rn", LongType(), False)]
    )

    def tag(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in it:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["_pid"] = pid
            pdf["_rn"] = range(seen, seen + n)
            seen += n
            yield pdf

    return df.mapInPandas(tag, schema=schema)


def assign_dense_ids(
    df: DataFrame,
    key_cols: Sequence[str],
    out_col: str = "doc_int",
    num_partitions: int | None = None,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Attach a dense 0-based int64 id ordered by ``key_cols``.

    Keys must be unique (one row per key) — callers dedupe first.
    Callers that feed multiple downstream actions should pass
    ``scratch_dir`` (files make the tagging immutable).
    """
    spark = df.sparkSession
    keys = list(key_cols)
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    tagged = _tag_partitions(
        df.repartitionByRange(num_partitions, *keys).sortWithinPartitions(*keys)
    )

    if scratch_dir:
        tagged.write.mode("overwrite").parquet(scratch_dir)
        tagged = spark.read.parquet(scratch_dir)
    else:
        tagged = tagged.persist()

    counts = {
        r["_pid"]: r["count"]
        for r in tagged.groupBy("_pid").count().collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    return (
        tagged.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_pid", "_rn", "_off")
    )
