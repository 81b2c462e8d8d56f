"""Result fusion / set-like operators (reference §2.8 H1-H5).

Semantics pinned from the reference:
- RRF (H1):   score(d) = Σ_i 1/(rrf_k + rank_i(d)), rank 1-based per
              input list, absent list contributes 0; rrf_k=60
              (hybrid_search_combiner.py:33-112, search_config.py:11)
- weighted (H2): weights normalized to sum 1, missing side contributes
              0 (hybrid_search.py:14-60)
- merge/dedup (H3): union, keep MAX score per doc (result_merger.py:14-55)
- score normalization (H4): min-max to [0,1] (clamped); z-score +
              sigmoid; rank-based (n-i)/n (score_normalizer.py:65-155)

All are expressed as window/aggregate plans over (doc_id, score)
DataFrames. Ranks use the engine-wide deterministic tie-break
(score DESC, doc_id ASC). These run over top-k lists (small), but the
plans are size-agnostic — windows are unpartitioned only where the
reference's semantics are inherently global (a ranked result list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K_DEFAULT = 60  # reference search_config.py:11


def _rank_window():
    # built lazily — Window.orderBy needs an active SparkContext
    return Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())


def with_rank(results: DataFrame) -> DataFrame:
    """1-based rank by (score desc, doc_id asc)."""
    return results.withColumn("rank", F.row_number().over(_rank_window()))


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    rrf_k: int = RRF_K_DEFAULT,
    limit: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two (doc_id, score) result lists."""
    ra = with_rank(a).select("doc_id", F.col("rank").alias("rank_a"))
    rb = with_rank(b).select("doc_id", F.col("rank").alias("rank_b"))
    joined = ra.join(rb, "doc_id", "full_outer")
    score = (
        F.when(F.col("rank_a").isNotNull(), 1.0 / (rrf_k + F.col("rank_a")))
        .otherwise(0.0)
        + F.when(F.col("rank_b").isNotNull(), 1.0 / (rrf_k + F.col("rank_b")))
        .otherwise(0.0)
    )
    return (
        joined.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(limit)
    )


def weighted_fuse(
    a: DataFrame,
    b: DataFrame,
    weight_a: float = 0.7,
    weight_b: float = 0.3,
    limit: int = 10,
) -> DataFrame:
    """Legacy weighted-score fusion; weights normalized to sum 1,
    missing side contributes 0."""
    total = weight_a + weight_b
    wa, wb = (weight_a / total, weight_b / total) if total > 0 else (0.7, 0.3)
    sa = a.select("doc_id", (F.col("score") * wa).alias("sa"))
    sb = b.select("doc_id", (F.col("score") * wb).alias("sb"))
    joined = sa.join(sb, "doc_id", "full_outer")
    return (
        joined.select(
            "doc_id",
            (F.coalesce("sa", F.lit(0.0)) + F.coalesce("sb", F.lit(0.0))).alias(
                "score"
            ),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# Driver-side twins (serving latency path)
#
# Fusion always runs over two TOP-K lists — a handful of driver-known
# rows after the branch searches collect. The serving fold (VERDICT r5
# #5) fuses those rows in pure python instead of spending Spark jobs on
# 20-row window/join plans. Each twin replicates its DataFrame
# sibling's arithmetic EXPRESSION-FOR-EXPRESSION (same IEEE-754 op
# order), so results are bit-identical — pinned by test_fusion.
# ---------------------------------------------------------------------------

def rrf_fuse_rows(a, b, rrf_k: int = RRF_K_DEFAULT, limit: int = 10):
    """Pure-python twin of :func:`rrf_fuse` over collected
    (doc_id, score) tuples; returns fused (doc_id, score) tuples."""
    ra = {d: i + 1 for i, (d, _) in
          enumerate(sorted(a, key=lambda t: (-t[1], t[0])))}
    rb = {d: i + 1 for i, (d, _) in
          enumerate(sorted(b, key=lambda t: (-t[1], t[0])))}
    fused = []
    for d in set(ra) | set(rb):
        s = (1.0 / (rrf_k + ra[d]) if d in ra else 0.0) \
            + (1.0 / (rrf_k + rb[d]) if d in rb else 0.0)
        fused.append((d, s))
    fused.sort(key=lambda t: (-t[1], t[0]))
    return fused[:limit]


def normalize_scores_rows(rows):
    """Pure-python twin of :func:`normalize_scores` (min_max)."""
    if not rows:
        return []
    scores = [s for _, s in rows]
    mn, mx = min(scores), max(scores)
    if mx == mn:
        return list(rows)
    return [(d, min(1.0, max(0.0, (s - mn) / (mx - mn)))) for d, s in rows]


def weighted_fuse_rows(a, b, weight_a: float = 0.7, weight_b: float = 0.3,
                       limit: int = 10):
    """Pure-python twin of :func:`weighted_fuse`."""
    total = weight_a + weight_b
    wa, wb = (weight_a / total, weight_b / total) if total > 0 else (0.7, 0.3)
    sa = {d: s * wa for d, s in a}
    sb = {d: s * wb for d, s in b}
    fused = [(d, sa.get(d, 0.0) + sb.get(d, 0.0)) for d in set(sa) | set(sb)]
    fused.sort(key=lambda t: (-t[1], t[0]))
    return fused[:limit]


def merge_dedup(*results: DataFrame, limit: int | None = None) -> DataFrame:
    """Union result lists, keep the max score per doc, sort desc."""
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    merged = out.groupBy("doc_id").agg(F.max("score").alias("score")).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return merged.limit(limit) if limit else merged


def normalize_scores(results: DataFrame, method: str = "min_max") -> DataFrame:
    """H4 score normalization over the whole result list."""
    w = Window.partitionBy()
    if method == "min_max":
        mn, mx = F.min("score").over(w), F.max("score").over(w)
        norm = F.when(mx == mn, F.col("score")).otherwise(
            F.least(
                F.lit(1.0),
                F.greatest(F.lit(0.0), (F.col("score") - mn) / (mx - mn)),
            )
        )
    elif method == "z_score":
        mean, sd = F.mean("score").over(w), F.stddev_pop("score").over(w)
        z = (F.col("score") - mean) / sd
        norm = F.when(sd == 0, F.col("score")).otherwise(
            1.0 / (1.0 + F.exp(-z))
        )
    elif method == "rank":
        n = F.count(F.lit(1)).over(w)
        rank = F.row_number().over(_rank_window())
        norm = (n - rank + 1) / n
    else:
        raise ValueError(f"unknown normalization {method!r}")
    return results.select("doc_id", norm.alias("score"))


def rerank_expansion(limit: int, multiplier: int = 2) -> int:
    """H5: retrieve limit × multiplier before an (external) reranker,
    truncate after (search_orchestrator.py:76-95)."""
    return limit * multiplier
