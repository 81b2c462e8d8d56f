"""Input-source resolution shared by the spark-submit jobs.

The north-star deployment reads turn-level text from Iceberg
transcript tables (`spark.read.table("transcripts")` — SURVEY §1.3
S1). This sandbox ships no Iceberg runtime jars, so the tests and the
driver exercise the parquet branch; the table branch is the SAME
DataFrame lineage behind `spark.read.table`, which resolves any
catalog-registered source (Iceberg, Delta, Hive, temp views) when the
session is configured with the matching catalog. Iceberg-SPECIFIC
maintenance (MERGE upserts, snapshot-diff change detection) is
re-expressed engine-side as staging generations + the docmap
fingerprint diff (operators/postings: append/sync/compact), which
runs on plain parquet and needs no table format at all.

Spec grammar:
    table:<catalog.db.name>   -> spark.read.table(...)
    anything else             -> spark.read.parquet(path)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_PREFIX = "table:"


def read_input(spark: SparkSession, spec: str) -> DataFrame:
    """Resolve ``spec`` to a DataFrame: ``table:<name>`` reads a
    catalog table (Iceberg et al.), anything else a parquet path."""
    if spec.startswith(TABLE_PREFIX):
        return spark.read.table(spec[len(TABLE_PREFIX):])
    return spark.read.parquet(spec)
