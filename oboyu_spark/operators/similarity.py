"""Similarity search over embedding columns (array<float>).

Two paths, per the training-data-pipeline requirements:

- ``cosine_topk``       — exact brute-force top-k for one query vector:
                          dot products as built-in higher-order
                          functions (zip_with + aggregate, JVM-side),
                          TakeOrderedAndProject top-k. The baseline and
                          the verifier for the ANN path.
- ``lsh_*``             — the scale path: random-hyperplane (sign) LSH.
                          Hyperplanes are DETERMINISTIC (seeded numpy
                          inside the UDF factory, shipped via closure).
                          Bucketing is a vectorized Arrow UDF (one
                          matmul per batch); candidate generation is an
                          equi-join on (table, bucket); exact cosine
                          re-verification inside the bucket join.

At 100 TB the brute-force path is a full scan per query — only for
oracle checks and small candidate sets; LSH buckets cut the scanned
fraction to ~1/2^bits per table while the verify step keeps results
exact-over-candidates.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_expr(col, qvec: Sequence[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(col, q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_expr(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Exact cosine top-k, fully JVM-side."""
    qnorm = float(np.sqrt(np.dot(query_vec, query_vec)))
    cos = _dot_expr(F.col(vec_col).cast("array<double>"), query_vec) / (
        _norm_expr(F.col(vec_col).cast("array<double>")) * F.lit(qnorm)
    )
    out = embeddings.select(
        F.col(id_col).alias("vec_id"), cos.alias("cosine")
    )
    if round_digits is not None:
        out = out.select("vec_id", F.round("cosine", round_digits).alias("cosine"))
    return out.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, bits: int, table: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed * 1_000_003 + table)
    return rng.standard_normal((bits, dim))


def lsh_bucket_udf(dim: int, bits: int = 12, n_tables: int = 2,
                   seed: int = 42):
    """array<float> -> array<long> of per-table sign-bucket ids."""
    planes = [_hyperplanes(dim, bits, t, seed) for t in range(n_tables)]
    powers = (2 ** np.arange(bits)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _bucket(s: pd.Series) -> pd.Series:
        mat = np.stack(s.to_numpy())  # (batch, dim)
        out = []
        per_table = [
            ((mat @ p.T) > 0).astype(np.int64) @ powers for p in planes
        ]
        stacked = np.stack(per_table, axis=1)  # (batch, tables)
        return pd.Series(list(stacked))

    return _bucket


def lsh_bucketize(
    embeddings: DataFrame,
    dim: int,
    bits: int = 12,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, table, bucket) — one row per table."""
    b = lsh_bucket_udf(dim, bits, n_tables, seed)(F.col(vec_col))
    return embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"),
        F.posexplode(b).alias("table", "bucket"),
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    bits: int = 12,
    n_tables: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: score only vectors sharing a bucket with the query in
    any table (exact cosine over the candidate set)."""
    dim = len(query_vec)
    q = np.asarray(query_vec, dtype=np.float64)
    probes = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, bits, t, seed)
        bucket = int(((planes @ q) > 0).astype(np.int64)
                     @ (2 ** np.arange(bits)).astype(np.int64))
        probes.append((t, bucket))
    bucketed = lsh_bucketize(embeddings, dim, bits, n_tables, seed,
                             id_col, vec_col)
    probe_df = bucketed.sparkSession.createDataFrame(
        probes, "table int, bucket long"
    )
    cand = bucketed.join(F.broadcast(probe_df), ["table", "bucket"]) \
        .select("vec_id", "embedding").dropDuplicates(["vec_id"])
    return cosine_topk(cand, query_vec, k, "vec_id", "embedding")


def lsh_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    bits: int = 10,
    n_tables: int = 2,
    seed: int = 42,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket-join candidates, exact
    cosine verify ≥ threshold. (doc_a, doc_b, cosine)."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    bucketed = lsh_bucketize(embeddings, dim, bits, n_tables, seed,
                             id_col, vec_col)
    a = bucketed.select(F.col("vec_id").alias("doc_a"),
                        F.col("embedding").alias("ea"), "table", "bucket")
    b = bucketed.select(F.col("vec_id").alias("doc_b"),
                        F.col("embedding").alias("eb"), "table", "bucket")
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ea = F.col("ea").cast("array<double>")
    eb = F.col("eb").cast("array<double>")
    dot = F.aggregate(F.zip_with(ea, eb, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    cos = dot / (_norm_expr(ea) * _norm_expr(eb))
    return cand.select(
        "doc_a", "doc_b", F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine") >= threshold)
