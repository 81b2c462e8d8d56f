"""Compressed-index build + scatter-gather search: round-trip vs the
relational rows, salting/sharding behavior, rank+score identity vs the
oracle, and build metrics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oboyu_spark.operators import termindex as TI
from oboyu_spark.operators.codec import decode_doc_ids, decode_varbyte
from oboyu_spark.operators.postings import build_index, load_meta
from oboyu_spark.operators.searchidx import search_index
from oboyu_spark.oracle.pybm25 import PyBM25
from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs

QUERIES = [
    "spark index search",
    "検索 索引",
    "分散 shuffle partition engine",
    "圧縮 varbyte posting",
    "missing_term_xyz",
    "spark spark query",
]


@pytest.fixture(scope="module")
def corpus(spark):
    tr = synthesize_transcripts(spark, n_convs=80, max_turns=10, seed=42)
    return turns_as_docs(tr).select("doc_id", "text")


@pytest.fixture(scope="module")
def index_dir(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    # tiny shard/salt sizes to force multi-shard + salting paths
    meta = build_index(corpus, d, shard_size=100, salt_chunk=50,
                       id_assign_partitions=4)
    assert meta["n_docs"] == corpus.count()
    return d


def test_meta_metrics(index_dir):
    meta = load_meta(index_dir)
    assert meta["n_postings"] > 0
    assert meta["posting_rows"] > 0
    assert meta["compressed_payload_bytes"] > 0
    assert meta["docs_per_sec"] > 0
    assert meta["avgdl"] > 0


def test_sharding_and_salting(spark, index_dir):
    postings = spark.read.parquet(f"{index_dir}/postings")
    assert postings.select("shard").distinct().count() > 1
    # hot terms (df > salt_chunk=50) must be split into >1 salt chunk
    vocab = spark.read.parquet(f"{index_dir}/vocabulary")
    hot_h1 = [
        r["th1"]
        for r in vocab.filter(F.col("document_frequency") > 50).collect()
    ]
    assert hot_h1
    max_salts = (
        postings.filter(F.col("th1").isin(hot_h1))
        .groupBy("shard", "th1")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_salts > 1, "expected salted chunks for high-df terms"
    # chunk sizes bounded: no group hugely over salt target within shard
    assert postings.agg(F.max("n")).collect()[0][0] <= 100  # <= shard_size


def test_decode_roundtrip_vs_relational(spark, corpus, index_dir):
    """Decompressed postings == the relational (doc, term, tf) rows."""
    from oboyu_spark.operators.ids import assign_dense_ids

    postings = spark.read.parquet(f"{index_dir}/postings").collect()
    got = {}
    meta = load_meta(index_dir)
    for r in postings:
        ids = decode_doc_ids(bytes(r["gaps"])).tolist()
        tfs = decode_varbyte(bytes(r["tfs"])).tolist()
        dls = decode_varbyte(bytes(r["dls"])).tolist()
        assert len(ids) == r["n"] == len(tfs) == len(dls)
        assert ids == sorted(ids)
        # block metadata shape
        n_blocks = (r["n"] + 127) // 128
        assert len(r["block_last"]) == n_blocks == len(r["block_maxtf"])
        assert len(r["block_mindl"]) == n_blocks
        assert r["block_last"][-1] == ids[-1]
        assert max(tfs) == max(r["block_maxtf"])
        assert min(dls) == min(r["block_mindl"])
        for d, t in zip(ids, tfs):
            key = ((r["th1"], r["th2"]), d)
            got[key] = got.get(key, 0) + t

    docmap = {
        r["doc_id"]: r["doc_int"]
        for r in spark.read.parquet(f"{index_dir}/docmap").collect()
    }
    tf_rows = TI.term_frequencies(corpus).collect()
    # map expected term strings to the build's 128-bit hash pairs
    from oboyu_spark.operators.postings import term_hash_cols

    terms = sorted({r["term"] for r in tf_rows})
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    t2h = {
        r["term"]: (r["th1"], r["th2"])
        for r in tdf.select("term", *term_hash_cols(F.col("term"))).collect()
    }
    expected = {
        (t2h[r["term"]], docmap[r["doc_id"]]): r["tf"] for r in tf_rows
    }
    assert got == expected


def test_search_matches_oracle(spark, corpus, index_dir):
    docs_local = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    oracle = PyBM25()
    oracle.index(docs_local)

    res = search_index(spark, index_dir, QUERIES, k=12).collect()
    by_q: dict[int, list] = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in enumerate(QUERIES):
        exp = oracle.search(q, k=12)
        got = by_q.get(qid, [])
        assert [d for d, _ in got] == [d for d, _ in exp], q
        for (_, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-9), q


def test_search_single_query_string(spark, index_dir):
    res = search_index(spark, index_dir, "spark index", k=5).collect()
    assert 0 < len(res) <= 5
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_search_no_matching_terms(spark, index_dir):
    assert search_index(spark, index_dir, "zzz qqq", k=5).count() == 0


def test_conjunctive_mode(spark, corpus, index_dir):
    docs_local = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    oracle = PyBM25()
    oracle.index(docs_local)
    for q in ["spark index", "検索 索引", "spark zzz_missing", "分散 処理 高速"]:
        got = search_index(spark, index_dir, q, k=15, mode="and").collect()
        exp = oracle.search(q, k=15, mode="and")
        assert [r["doc_id"] for r in got] == [d for d, _ in exp], q
        for r, (_, s) in zip(got, exp):
            assert r["score"] == pytest.approx(s, rel=1e-9), q
        # AND results ⊆ OR results
        or_docs = {r["doc_id"]
                   for r in search_index(spark, index_dir, q, k=1000).collect()}
        assert {r["doc_id"] for r in got} <= or_docs


def test_search_legacy_layout_without_vocab_parts(spark, corpus,
                                                  index_dir, tmp_path):
    """The three df-lookup layouts must all search identically:
    r7 (merged vocabulary CARRIES bparts — pruning works even with
    vocab_parts deleted), r6 (vocabulary without bparts + vocab_parts
    partials — pruning via the partial fan-out), and true legacy
    (neither — merged-vocabulary fallback, no pruning); search_rows
    matches the DataFrame path on the legacy layout."""
    import shutil

    from oboyu_spark.operators.searchidx import IndexReader, _LAST_SCAN_INFO

    def _strip_bparts(d):
        voc = spark.read.parquet(f"{d}/vocabulary").drop("bparts")
        tmpv = f"{d}/vocabulary_tmp"
        voc.write.parquet(tmpv)
        shutil.rmtree(f"{d}/vocabulary")
        shutil.move(tmpv, f"{d}/vocabulary")

    # r7 layout minus the partials: pruning info survives in the
    # merged vocabulary
    nopartials = str(tmp_path / "nopartials_idx")
    shutil.copytree(index_dir, nopartials)
    shutil.rmtree(f"{nopartials}/vocab_parts")
    # r6 layout: partials present, merged vocabulary without bparts
    r6style = str(tmp_path / "r6_idx")
    shutil.copytree(index_dir, r6style)
    _strip_bparts(r6style)
    # true legacy: neither source of part info
    legacy = str(tmp_path / "legacy_idx")
    shutil.copytree(nopartials, legacy)
    _strip_bparts(legacy)

    for q in ["spark index", "検索 索引"]:
        exp = [(r["doc_id"], r["score"])
               for r in search_index(spark, index_dir, q, k=8).collect()]
        base_parts = _LAST_SCAN_INFO["live_parts"]
        got = [(r["doc_id"], r["score"])
               for r in search_index(spark, nopartials, q, k=8).collect()]
        assert got == exp, q
        assert _LAST_SCAN_INFO["live_parts"] == base_parts  # still prunes
        got = [(r["doc_id"], r["score"])
               for r in search_index(spark, r6style, q, k=8).collect()]
        assert got == exp, q
        assert _LAST_SCAN_INFO["live_parts"] == base_parts
        got = [(r["doc_id"], r["score"])
               for r in search_index(spark, legacy, q, k=8).collect()]
        assert got == exp, q
        assert _LAST_SCAN_INFO["live_parts"] is None  # no pruning info
    reader = IndexReader(spark, legacy)
    try:
        rows = reader.search_rows("spark index", k=8)
        assert [(d, s) for _, d, s in rows] == [
            (r["doc_id"], r["score"])
            for r in search_index(spark, legacy, "spark index", k=8)
            .collect()
        ]
    finally:
        reader.close()


def test_index_reader_matches_oneshot(spark, index_dir):
    from oboyu_spark.operators.searchidx import IndexReader

    reader = IndexReader(spark, index_dir)
    try:
        for q in ["spark index", "検索 索引", "zzz"]:
            a = [(r["doc_id"], r["score"])
                 for r in search_index(spark, index_dir, q, k=8).collect()]
            b = [(r["doc_id"], r["score"])
                 for r in reader.search(q, k=8).collect()]
            assert a == b, q
    finally:
        reader.close()


def test_gather_paths_identical(spark, corpus, index_dir, monkeypatch):
    """The driver-side rank cut (small candidate sets) and the Spark
    window path (cluster scale) must return identical results."""
    from oboyu_spark.operators import searchidx as SI

    fast = search_index(spark, index_dir, QUERIES, k=7).collect()
    reader = SI.IndexReader(spark, index_dir, cache=False)
    fast_rows = reader.search_rows(QUERIES, k=7)
    monkeypatch.setattr(SI, "DRIVER_CUT_MAX_ROWS", 0)  # force Spark window
    slow = search_index(spark, index_dir, QUERIES, k=7).collect()
    slow_rows = reader.search_rows(QUERIES, k=7)
    reader.close()
    key = lambda r: (r["query_id"], r["doc_id"], round(r["score"], 12))
    assert sorted(map(key, fast)) == sorted(map(key, slow))
    # the rows API returns the same results through BOTH gather paths
    rkey = lambda t: (t[0], t[1], round(t[2], 12))
    assert sorted(map(rkey, fast_rows)) == sorted(map(key, fast))
    assert sorted(map(rkey, slow_rows)) == sorted(map(rkey, fast_rows))


def test_part_pruning_equivalence(spark, corpus, tmp_path, monkeypatch):
    """Part pruning is a pure optimization: on a genuinely multi-part
    index, every query shape (rare-only — where pruning engages,
    mixed, hot-only, conjunctive, BMW scorer) returns results
    identical to the legacy scan-everything path (the plan gate
    test_search_prunes_parts_by_term pins the plan; this pins the
    RESULTS at realistic corpus shape)."""
    from oboyu_spark.operators import searchidx as SI

    rare = spark.createDataFrame(
        [(f"rare#{i:02d}",
          f"zz{'abcdef'[i % 6]} spark index search engine")
         for i in range(24)],
        "doc_id string, text string",
    )
    docs = corpus.unionByName(rare)
    d = str(tmp_path / "multi")
    meta = build_index(docs, d, shard_size=100, salt_chunk=50,
                       shards_per_part=2, id_assign_partitions=4)
    assert meta["n_parts"] >= 3, "need a multi-part index for this pin"

    queries = [
        "zzabc zzb",            # rare-only (terms min_token_length>=2)
        "zza zzc",              # rare-only pair
        "zza spark index",      # mixed rare + hot
        "spark index search",   # hot-only
        "missing_term_xyz",     # no match
    ]

    def run(**kw):
        out = []
        for q in queries:
            rows = search_index(spark, d, q, k=12, **kw).collect()
            out.append((q, tuple(kw.items()), sorted(
                (r["query_id"], r["doc_id"], round(r["score"], 12))
                for r in rows)))
        return out

    pruned = run() + run(scorer="bmw") + run(mode="and")
    # the rare-only query really pruned: strict subset of parts
    search_index(spark, d, "zza zzb", k=5).collect()
    live = SI._LAST_SCAN_INFO["live_parts"]
    assert live is not None and 0 < len(live) < meta["n_parts"], \
        SI._LAST_SCAN_INFO

    monkeypatch.setattr(SI, "PART_PRUNE_MAX_UNION", -1)  # legacy scan
    legacy = run() + run(scorer="bmw") + run(mode="and")
    assert SI._LAST_SCAN_INFO["live_parts"] is None
    assert pruned == legacy


def test_pretokenized_build_matches_text_build(spark, corpus, index_dir,
                                               tmp_path):
    """A build over a PRE-TOKENIZED corpus (array<string> text column,
    produced by the same tokenizer) must yield the identical index —
    same meta counts, same search results — with the tokenizer pass
    skipped (the compute-phase isolation path scaling_bench measures;
    VERDICT r6 #7)."""
    from oboyu_spark.operators.termindex import with_tokens

    pre = with_tokens(corpus).select("doc_id",
                                     F.col("tokens").alias("text"))
    d = str(tmp_path / "pretok_idx")
    meta = build_index(pre, d, shard_size=100, salt_chunk=50,
                       id_assign_partitions=4)
    base = load_meta(index_dir)
    assert meta["n_docs"] == base["n_docs"]
    assert meta["total_terms"] == base["total_terms"]
    assert meta["n_postings"] == base["n_postings"]
    for q in ["spark query join", "table scan fast"]:
        a = [(r["doc_id"], round(r["score"], 9)) for r in
             search_index(spark, index_dir, q, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in
             search_index(spark, d, q, k=10).collect()]
        assert a == b, q
