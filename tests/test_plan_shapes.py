"""Physical-plan audits: the properties that make the 100 TB story
real must be visible in `.explain`, not just asserted in docstrings.

- the query-side postings scan pushes the term-hash filter into the
  parquet source (row-group pruning via sorted th1)
- docmap hydration pushes the winner-id IN filter down
- the relational BM25 query-term join is a BROADCAST join, never a
  sort-merge or cartesian over the corpus
- no CartesianProduct anywhere in the flagship plans
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from oboyu_spark.operators import bm25 as B
from oboyu_spark.operators.postings import build_index
from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus(spark):
    tr = synthesize_transcripts(spark, n_convs=40, max_turns=6, seed=23)
    return turns_as_docs(tr).select("doc_id", "text")


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx"))
    build_index(corpus, d, shard_size=100, salt_chunk=60,
                id_assign_partitions=4)
    return d


def test_postings_scan_pushes_term_filter(spark, index_dir):
    postings = spark.read.parquet(f"{index_dir}/postings").filter(
        F.col("th1").isin([1, 2, 3])
    )
    plan = _plan(postings)
    assert "PushedFilters" in plan and "In(th1" in plan, plan


def test_docmap_scan_pushes_id_filter(spark, index_dir):
    docmap = spark.read.parquet(f"{index_dir}/docmap").filter(
        F.col("doc_int").isin([5, 9])
    )
    plan = _plan(docmap)
    assert "In(doc_int" in plan, plan


def test_relational_bm25_joins_are_broadcast(spark, corpus):
    plan = _plan(B.bm25_search(corpus, "spark index", k=5))
    assert "CartesianProduct" not in plan, plan
    # the (term, qtf) side and stats singleton must broadcast; the only
    # acceptable nested-loop is the broadcast one against 1-row stats
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_scan_prunes_columns(spark, index_dir):
    # a 2-column projection must not read the gaps/tfs/dls payload
    df = spark.read.parquet(f"{index_dir}/postings").select("th1", "shard")
    plan = _plan(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "gaps" not in read_schema[0], plan
