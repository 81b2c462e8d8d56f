"""Hybrid search: relational composition vs the indexed serving path.

The documents/embeddings fixtures mirror the driver tables: doc_id and
vec_id align 1:1. The indexed path (IndexReader BM25 branch + exact
cosine) must be rank-identical to the relational hybrid_search over
the same corpus."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oboyu_spark.operators.hybrid import hybrid_search, hybrid_search_indexed
from oboyu_spark.operators.postings import build_index
from oboyu_spark.operators.searchidx import IndexReader

QVEC = [((i * 37) % 19 - 9) / 10.0 for i in range(16)]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rng = np.random.default_rng(11)
    n = docs.count()
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.standard_normal(16)])
         for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    return docs, emb


def test_hybrid_modes_and_shapes(spark, corpus):
    docs, emb = corpus
    for mode in ("rrf", "weighted"):
        out = hybrid_search(docs, emb, "spark query join", QVEC,
                            k_each=15, limit=8, mode=mode).collect()
        assert 0 < len(out) <= 8
        scores = [r["score"] for r in out]
        assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError):
        hybrid_search(docs, emb, "spark", QVEC, mode="bogus")


def test_indexed_hybrid_matches_relational(spark, corpus, tmp_path):
    docs, emb = corpus
    sdocs = docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    d = str(tmp_path / "hidx")
    build_index(sdocs, d, shard_size=100, salt_chunk=60,
                id_assign_partitions=4)
    reader = IndexReader(spark, d)
    try:
        rel = hybrid_search(
            docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                        "text"),
            emb.select(F.col("vec_id").cast("string").alias("vec_id"),
                       "embedding"),
            "spark query join", QVEC, k_each=15, limit=8, ann=False,
        ).collect()
        idx = hybrid_search_indexed(
            reader, emb, "spark query join", QVEC, k_each=15, limit=8,
            ann=False,
        ).collect()
        assert [r["doc_id"] for r in rel] == [r["doc_id"] for r in idx]
        for a, b in zip(rel, idx):
            assert a["score"] == pytest.approx(b["score"], rel=1e-12)

        # fully index-backed deployment shape: vector branch through a
        # persisted IVF index with every list probed == exact cosine,
        # so the fused output must stay rank-identical
        from oboyu_spark.operators.similarity import ivf_build

        ivf_d = str(tmp_path / "hivf")
        ivf_build(emb, ivf_d, n_lists=4, sample=emb.count(), iters=4,
                  seed=5)
        both = hybrid_search_indexed(
            reader, emb, "spark query join", QVEC, k_each=15, limit=8,
            ivf_dir=ivf_d, nprobe=4,
        ).collect()
        assert [r["doc_id"] for r in rel] == [r["doc_id"] for r in both]
    finally:
        reader.close()
