"""Corpus-preparation pipeline: each stage removes exactly the planted
documents; chunk/embedding outputs have the composed shape."""

from __future__ import annotations

import pytest

from oboyu_spark.operators.pipeline import near_dup_drop_ids, prepare_corpus

LOREM = ("spark shuffles partition data across executors while the "
         "optimizer prunes columns and pushes filters down to the scan "
         "so only needed bytes move over the network ") * 4


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, LOREM + "alpha"),
        (2, LOREM + "alpha"),            # exact dup of 1 (drop, higher id)
        (3, LOREM + "alpha beta"),       # near dup of 1 (drop via LSH)
        (4, "completely different text about cooking rice and beans "
            "with a long enough body to pass the quality length gate "
            * 5),
        (5, "!!! ??? !!! ??? !!!"),       # junk → quality filter
        (6, "short"),                     # low length score
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stage_by_stage(spark, corpus):
    # exact only
    r = prepare_corpus(corpus, exact=True, near_threshold=None,
                       min_quality=None, chunk_size=None)
    ids = {x["doc_id"] for x in r["docs"].collect()}
    assert ids == {1, 3, 4, 5, 6}  # 2 dropped (exact dup, keep min id)

    # near-dup drop set contains 3 (pairs with 1), policy drops higher id
    drop = {x["doc_id"] for x in
            near_dup_drop_ids(corpus, threshold=0.5).collect()}
    assert 3 in drop and 1 not in drop

    # full doc pipeline
    r = prepare_corpus(corpus, exact=True, near_threshold=0.5,
                       min_quality=0.3, chunk_size=None)
    ids = {x["doc_id"] for x in r["docs"].collect()}
    assert 1 in ids and 4 in ids
    assert 2 not in ids and 3 not in ids      # dedup stages
    assert 5 not in ids                        # punctuation junk
    assert r["chunks"] is None and r["embeddings"] is None


def test_chunk_and_embed_shapes(spark, corpus):
    r = prepare_corpus(corpus, exact=True, near_threshold=0.5,
                       min_quality=0.3, chunk_size=200, chunk_overlap=50,
                       embed_dim=8)
    chunks = r["chunks"].collect()
    assert set(r["chunks"].columns) == {"chunk_id", "doc_id",
                                        "chunk_index", "text"}
    kept = {x["doc_id"] for x in r["docs"].collect()}
    assert {c["doc_id"] for c in chunks} == kept
    # the long survivors must split into multiple chunks at size 200
    assert sum(1 for c in chunks if c["doc_id"] == 1) > 1

    emb = r["embeddings"].collect()
    assert set(r["embeddings"].columns) == {"chunk_id", "embedding"}
    assert len(emb) == len(chunks)
    assert all(len(e["embedding"]) == 8 for e in emb)


def test_read_input_table_and_parquet(spark, corpus, tmp_path):
    """read_input resolves table:<name> via the catalog and plain
    paths via parquet (the Iceberg-deployment seam; no Iceberg runtime
    in this sandbox, so the catalog branch is pinned on a temp view)."""
    from oboyu_spark.sources.io import read_input

    p = str(tmp_path / "docs_pq")
    corpus.write.mode("overwrite").parquet(p)
    assert read_input(spark, p).count() == corpus.count()

    corpus.createOrReplaceTempView("io_docs_view")
    assert read_input(spark, "table:io_docs_view").count() == corpus.count()
