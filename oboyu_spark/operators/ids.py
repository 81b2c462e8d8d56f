"""Deterministic dense int64 doc-id assignment — the scale-correct way.

The compressed posting-list layout (operators/postings.py) wants dense
int64 doc ids (delta-gap encoding needs small gaps; 64-bit random
hashes would (a) waste gap bits and (b) collide at 10^12 docs —
birthday bound gives ~27k expected collisions at 1e12 keys on 64 bits,
unacceptable for rank identity).

``assign_dense_ids`` produces a deterministic, collision-free, dense
mapping without ever funneling data through one partition:

1. range-repartition by the key (global order established by Spark's
   sampled range partitioner),
2. sort within partitions,
3. one tiny action collects per-partition row counts (#partitions
   rows) to the driver,
4. a mapInPandas pass adds (partition offset + local index).

Two passes over the data, no global sort-to-single-node, deterministic
for a fixed input set — re-running on the same snapshot yields the same
ids, which is what checkpoint-resume (operators/manifest.py) needs.

The reference has no analog (single-node uuid4 chunk ids,
document_processor.py:55-127 — explicitly replaced per SURVEY §2.3 C2:
uuid4 would break reproducibility).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    key_cols: Sequence[str],
    out_col: str = "doc_int",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a dense 0-based int64 id ordered by ``key_cols``.

    Keys must be unique (one row per key) — callers dedupe first.
    """
    keys = list(key_cols)
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *keys)
    else:
        part = df.repartitionByRange(*keys)
    local_sorted = part.sortWithinPartitions(*keys)

    counts_df = local_sorted.select(F.spark_partition_id().alias("pid")).groupBy(
        "pid"
    ).count()
    counts = {r["pid"]: r["count"] for r in counts_df.collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(local_sorted.schema.fields) + [StructField(out_col, LongType(), False)]
    )
    b_offsets = local_sorted.sparkSession.sparkContext.broadcast(offsets)

    def add_ids(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # spark_partition_id is stable between the count pass and this
        # pass because both consume the same shuffled+sorted RDD output.
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = b_offsets.value.get(pid, 0)
        seen = 0
        for pdf in it:
            n = len(pdf)
            pdf = pdf.copy()
            pdf[out_col] = range(base + seen, base + seen + n)
            seen += n
            yield pdf

    return local_sorted.mapInPandas(add_ids, schema=schema)
