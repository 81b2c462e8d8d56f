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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path besides LSH
# ---------------------------------------------------------------------------

def ivf_train_centroids(
    embeddings: DataFrame,
    n_lists: int = 16,
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse quantizer: Lloyd k-means in numpy over a
    seeded sample collected to the driver (the FAISS-style IVF recipe —
    training is always a small-sample, single-node step; only
    assignment and search are distributed). Returns (n_lists, dim)."""
    frac_rows = embeddings.select(vec_col).limit(sample).collect()
    x = np.asarray([r[0] for r in frac_rows], dtype=np.float64)
    if x.shape[0] < n_lists:
        raise ValueError(
            f"need at least n_lists={n_lists} vectors to train, "
            f"got {x.shape[0]}"
        )
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(x.shape[0], size=n_lists, replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, list_id) — nearest-centroid assignment via a
    vectorized Arrow UDF (one matmul per batch). At 100 TB this is the
    partitioning key: write the table bucketed/partitioned by list_id
    and searches scan only the probed lists."""
    cent = np.asarray(centroids, dtype=np.float64)
    cent_sq = (cent ** 2).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def _assign(s: pd.Series) -> pd.Series:
        mat = np.stack(s.to_numpy()).astype(np.float64)
        d = (mat ** 2).sum(axis=1)[:, None] - 2.0 * (mat @ cent.T) + cent_sq
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        _assign(F.col(vec_col)).alias("list_id"),
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """IVF ANN top-k: exact cosine over only the ``nprobe`` inverted
    lists whose centroids are nearest the query — scanned fraction
    ≈ nprobe/n_lists. Pass precomputed ``centroids`` in production
    (train once, search many)."""
    if centroids is None:
        centroids = ivf_train_centroids(
            embeddings, n_lists, sample, iters, seed, vec_col
        )
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(d)[:nprobe]]
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("list_id").isin(probes)).select(
        "vec_id", "embedding"
    )
    return cosine_topk(cand, query_vec, k, "vec_id", "embedding",
                       round_digits=round_digits)


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
