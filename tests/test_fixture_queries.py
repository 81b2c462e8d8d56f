"""Headline rank-identity claim: the FULL reference-style 120-query
fixture set (50 JA + 50 EN + 20 mixed, FIXTURES.md F6) evaluated over a
synthesized transcript corpus — index-path results must be
rank-identical with scores ≤1e-9 vs the pure-python oracle, at
top-k ∈ {1, 5, 10} (reference protocol ks, bench/config.py:75)."""

from __future__ import annotations

import pytest

from oboyu_spark.operators.postings import build_index
from oboyu_spark.operators.searchidx import IndexReader
from oboyu_spark.oracle.pybm25 import PyBM25
from oboyu_spark.sources.queries import generate_queries
from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs


def test_all_fixture_queries_rank_identical(spark, tmp_path):
    tr = synthesize_transcripts(spark, n_convs=120, max_turns=8, seed=17)
    docs = turns_as_docs(tr).select("doc_id", "text")
    d = str(tmp_path / "idx")
    build_index(docs, d, shard_size=150, salt_chunk=120,
                shards_per_part=3, id_assign_partitions=4)

    oracle = PyBM25()
    oracle.index([(r["doc_id"], r["text"]) for r in docs.collect()])

    queries = [q["text"] for q in generate_queries()]
    assert len(queries) == 120

    reader = IndexReader(spark, d)
    try:
        for k in (1, 5, 10):
            rows = reader.search(queries, k=k).collect()
            by_q: dict[int, list] = {}
            for r in rows:
                by_q.setdefault(r["query_id"], []).append(
                    (r["doc_id"], r["score"])
                )
            n_nonempty = 0
            for qid, q in enumerate(queries):
                exp = oracle.search(q, k=k)
                got = by_q.get(qid, [])
                assert [x[0] for x in got] == [x[0] for x in exp], (k, q)
                for (_, gs), (_, es) in zip(got, exp):
                    assert gs == pytest.approx(es, rel=1e-9), (k, q)
                if exp:
                    n_nonempty += 1
            # the fixture vocabulary is drawn from the corpus pool —
            # the vast majority of queries must actually match docs
            assert n_nonempty >= 100, n_nonempty
    finally:
        reader.close()
