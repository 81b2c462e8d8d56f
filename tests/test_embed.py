"""Embedding generation operator: mapInPandas plumbing, deterministic
hashing backend, loud real-model gate, and composition with the
similarity operators (the embeddings it makes are first-class inputs
to cosine_topk / lsh / ivf)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from oboyu_spark.operators import embed as E


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document number {i} about topic {i % 5}") for i in range(40)]
    rows.append((40, ""))  # empty text must embed, not crash
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_embed_docs_shape_and_determinism(spark, docs):
    e = E.embed_docs(docs, dim=16)
    assert e.schema["embedding"].dataType.simpleString() == "array<float>"
    rows = e.collect()
    assert len(rows) == 41
    assert all(len(r["embedding"]) == 16 for r in rows)
    # deterministic across runs and partitionings
    again = {r["doc_id"]: r["embedding"]
             for r in E.embed_docs(docs.repartition(7), dim=16).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["embedding"]


def test_embed_matches_python_twin(spark, docs):
    # md5 oracle backend: the per-(doc, dim) spec the DuckDB twin pins
    got = {r["doc_id"]: r["embedding"]
           for r in E.embed_docs(docs, dim=4, model="hashing").collect()}
    for d, t in [(0, "document number 0 about topic 0"), (40, "")]:
        exp = []
        for i in range(4):
            h = hashlib.md5(f"{t}:{i}".encode()).hexdigest()
            exp.append(np.float32(int(h[:8], 16) / 2147483648.0 - 1.0))
        assert got[d] == pytest.approx([float(x) for x in exp], abs=0)


def _splitmix64_ref(seed: int, i: int) -> int:
    """Scalar splitmix64 reference (Steele et al. 2014)."""
    m = (1 << 64) - 1
    z = (seed + i * 0x9E3779B97F4A7C15) & m
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & m
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & m
    return z ^ (z >> 31)


def test_embed_hashing64_matches_scalar_twin(spark, docs):
    """Default vectorized backend: one md5 seed per doc + splitmix64
    expansion, checked against a scalar python reference."""
    got = {r["doc_id"]: r["embedding"]
           for r in E.embed_docs(docs, dim=4).collect()}
    for d, t in [(0, "document number 0 about topic 0"), (40, "")]:
        seed = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
        exp = [
            np.float32(
                (_splitmix64_ref(seed, i + 1) & 0xFFFFFFFF)
                / 2147483648.0 - 1.0
            )
            for i in range(4)
        ]
        assert got[d] == pytest.approx([float(x) for x in exp], abs=0)
    # deterministic across partitionings
    again = {r["doc_id"]: r["embedding"]
             for r in E.embed_docs(docs.repartition(5), dim=4).collect()}
    assert again == got


def test_hashing64_backend_is_fast():
    """VERDICT r3 #6 'done' bar: >=10x over the md5 per-dim loop on a
    100k-row batch (pure-backend microbench, no Spark, generous margin
    for a noisy shared host: the measured gap is ~30-50x at dim 64)."""
    import time

    import pandas as pd

    texts = pd.Series([f"document body {i} " * 10 for i in range(100_000)])
    # warm pass: this box charges multi-second first-touch page-fault
    # stalls to fresh large allocations; steady-state (batch 2+ in any
    # real mapInPandas stream) is what the backend comparison is about
    E._hash64_embed_batch(texts, 64)
    t0 = time.time()
    E._hash64_embed_batch(texts, 64)
    fast = time.time() - t0
    t0 = time.time()
    E._hash_embed_batch(texts[:10_000], 64)  # 1/10 of the rows
    slow_tenth = time.time() - t0
    # fast over 100k must beat md5 over 10k → >=10x per-row
    assert fast < slow_tenth, (
        f"hashing64 {fast:.2f}s/100k vs md5 {slow_tenth:.2f}s/10k"
    )


def test_embedding_rows_projection(spark, docs):
    rows = E.embedding_rows(docs, dim=4).collect()
    assert len(rows) == 41 * 4
    assert {r["dim_idx"] for r in rows} == {0, 1, 2, 3}
    assert all(-1.0 <= r["value"] <= 1.0 for r in rows)


def test_embeddings_feed_similarity(spark, docs):
    """embed_docs output slots straight into the ANN operators."""
    from oboyu_spark.operators.similarity import cosine_topk

    emb = E.embed_docs(docs, dim=16).withColumnRenamed("doc_id", "vec_id")
    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    top = cosine_topk(emb, [float(x) for x in q], k=3).collect()
    assert top[0]["vec_id"] == 3 and top[0]["cosine"] == pytest.approx(1.0)


def test_real_model_gate_is_loud(spark, docs):
    with pytest.raises(ImportError, match="sentence-transformers"):
        E.embed_docs(docs, dim=16, model="all-MiniLM-L6-v2")


def test_embed_text_matches_embed_docs(spark):
    """embed_text (the serve loop's driver-side query embedder) must
    produce EXACTLY the vector embed_docs computes for the same text
    under both backends — the hybrid serving contract: a query embeds
    into the same space as the corpus in the IVF index."""
    text = "spark query join table 検索"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    for model in ("hashing", "hashing64"):
        corpus_vec = E.embed_docs(df, dim=24, model=model) \
            .first()["embedding"]
        query_vec = E.embed_text(text, dim=24, model=model)
        assert [float(x) for x in corpus_vec] == query_vec, model
    with pytest.raises(ImportError, match="sentence-transformers"):
        E.embed_text(text, dim=24, model="all-MiniLM-L6-v2")
