"""Checkpoint-resume, incremental append, delete + compaction.

north rule: "resumable from checkpoint with per-partition lineage +
metrics" — a killed build re-run must skip completed partitions and
converge to the same index as a fresh full build (FIXTURES.md F7)."""

from __future__ import annotations

import json
import os

import pytest

from oboyu_spark.operators.postings import (
    append_docs,
    build_index,
    compact_index,
    delete_docs,
    load_meta,
)
from oboyu_spark.operators.searchidx import search_index
from oboyu_spark.oracle.pybm25 import PyBM25
from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs

QUERIES = ["spark index search", "検索 分散", "posting 圧縮 merge"]
KW = dict(shard_size=50, salt_chunk=60, shards_per_part=2,
          id_assign_partitions=4)


def _corpus(spark, n_convs=60, seed=11):
    tr = synthesize_transcripts(spark, n_convs=n_convs, max_turns=8, seed=seed)
    return turns_as_docs(tr).select("doc_id", "text")


def _results(spark, d, k=10, scorer="taat"):
    rows = search_index(spark, d, QUERIES, k=k, scorer=scorer).collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["doc_id"], round(r["score"], 9)))
    return out


def test_resume_converges_to_fresh_build(spark, tmp_path):
    docs = _corpus(spark)
    fresh_dir, resume_dir = str(tmp_path / "fresh"), str(tmp_path / "resume")

    meta_fresh = build_index(docs, fresh_dir, **KW)
    assert meta_fresh["n_parts"] > 2, "need multiple parts for this test"

    # crash after 1 part, then resume
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(docs, resume_dir, fail_after_parts=1, **KW)
    done = [f for f in os.listdir(f"{resume_dir}/manifest") if f.endswith(".json")]
    assert len(done) == 1
    # index is not finalized yet
    assert not os.path.exists(f"{resume_dir}/stats/meta.json")

    meta_resumed = build_index(docs, resume_dir, **KW)
    for key in ["n_docs", "total_terms", "n_postings", "n_vocab_terms",
                "compressed_payload_bytes", "avgdl"]:
        assert meta_resumed[key] == meta_fresh[key], key
    assert _results(spark, resume_dir) == _results(spark, fresh_dir)


def test_manifest_lineage_and_metrics(spark, tmp_path):
    docs = _corpus(spark)
    d = str(tmp_path / "idx")
    meta = build_index(docs, d, **KW)
    rows = []
    for fn in sorted(os.listdir(f"{d}/manifest")):
        with open(f"{d}/manifest/{fn}") as fh:
            rows.append(json.load(fh))
    assert len(rows) == meta["n_parts"]
    assert all(r["status"] == "done" for r in rows)
    assert sum(r["n_docs"] for r in rows) == meta["n_docs"]
    assert sum(r["n_postings"] for r in rows) == meta["n_postings"]
    assert all(r["tokens_per_sec"] is not None for r in rows)


def test_manifest_counts_match_written_files(spark, tmp_path):
    """r8: the per-part manifest counters ride the postings write as an
    Observation instead of a separate read-back job — pin that the
    claimed counts still equal what is actually ON DISK for each part
    (the finalize integrity gate compares only the global sum)."""
    from pyspark.sql import functions as F

    docs = _corpus(spark)
    d = str(tmp_path / "idx")
    meta = build_index(docs, d, **KW)
    assert meta["n_parts"] > 1
    for fn in sorted(os.listdir(f"{d}/manifest")):
        with open(f"{d}/manifest/{fn}") as fh:
            row = json.load(fh)
        disk = (
            spark.read.parquet(f"{d}/postings/bpart={row['bpart']}")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("postings"),
                F.coalesce(
                    F.sum(
                        F.length("gaps") + F.length("tfs") + F.length("dls")
                    ),
                    F.lit(0),
                ).alias("bytes"),
            )
            .collect()[0]
        )
        assert row["posting_rows"] == int(disk["rows"])
        assert row["n_postings"] == int(disk["postings"])
        assert row["compressed_payload_bytes"] == int(disk["bytes"])
        ndocs_disk = (
            spark.read.parquet(f"{d}/docmap/bpart={row['bpart']}").count()
        )
        assert row["n_docs"] == ndocs_disk


def test_append_matches_full_rebuild_oracle(spark, tmp_path):
    from pyspark.sql import functions as F

    base = _corpus(spark, n_convs=40, seed=11)
    # appended keys must not collide with existing ones (API contract)
    extra = _corpus(spark, n_convs=20, seed=99).select(
        F.concat(F.lit("x"), "doc_id").alias("doc_id"), "text"
    )
    d = str(tmp_path / "idx")
    build_index(base, d, **KW)
    meta2 = append_docs(extra, d)
    assert meta2["n_docs"] == base.count() + extra.count()

    both = [(r["doc_id"], r["text"]) for r in base.collect()] + [
        (r["doc_id"], r["text"]) for r in extra.collect()
    ]
    oracle = PyBM25()
    oracle.index(both)
    got = _results(spark, d, k=12)
    for qid, q in enumerate(QUERIES):
        exp = oracle.search(q, k=12)
        assert [x[0] for x in got.get(qid, [])] == [x[0] for x in exp], q
        for (_, gs), (_, es) in zip(got.get(qid, []), exp):
            assert gs == pytest.approx(es, rel=1e-9, abs=1e-8)


def test_update_docs_via_delete_append(spark, tmp_path):
    """FIXTURES.md F7: 'modified' turns = delete + append — after
    compaction the index equals a fresh build over the updated corpus."""
    from pyspark.sql import functions as F

    docs = _corpus(spark, n_convs=30)
    d = str(tmp_path / "idx")
    build_index(docs, d, **KW)

    victims = [r["doc_id"] for r in docs.limit(5).collect()]
    updated = docs.filter(F.col("doc_id").isin(victims)).select(
        "doc_id", F.concat(F.col("text"), F.lit(" updated revision text")).alias("text")
    )
    delete_docs(spark, d, victims)
    compact_index(spark, d)
    append_docs(updated, d)

    final_corpus = [
        (r["doc_id"],
         r["text"] + " updated revision text" if r["doc_id"] in set(victims)
         else r["text"])
        for r in docs.collect()
    ]
    oracle = PyBM25()
    oracle.index(final_corpus)
    got = _results(spark, d, k=10)
    for qid, q in enumerate(QUERIES):
        exp = oracle.search(q, k=10)
        assert [x[0] for x in got.get(qid, [])] == [x[0] for x in exp], q
        for (_, gs), (_, es) in zip(got.get(qid, []), exp):
            assert gs == pytest.approx(es, rel=1e-9, abs=1e-8)


def test_delete_then_compact(spark, tmp_path):
    docs = _corpus(spark, n_convs=40)
    d = str(tmp_path / "idx")
    build_index(docs, d, **KW)
    before = _results(spark, d, k=20)
    victims = sorted({x[0] for res in before.values() for x in res[:3]})[:4]

    delete_docs(spark, d, victims)
    after = _results(spark, d, k=20)
    surviving_pre = {
        qid: [x for x in res if x[0] not in victims] for qid, res in before.items()
    }
    for qid in after:
        got_docs = [x[0] for x in after[qid]]
        assert not set(got_docs) & set(victims), "deleted docs must vanish"
        # surviving docs keep pre-delete scores and order (stats frozen);
        # docs beyond the old top-20 may now surface — prefix must match
        exp = surviving_pre[qid]
        assert after[qid][: len(exp)] == exp

    # both scorers respect tombstones
    assert _results(spark, d, scorer="bmw", k=20) == after

    # compaction: exact oracle over the surviving corpus
    compact_index(spark, d)
    remaining = [
        (r["doc_id"], r["text"])
        for r in docs.collect()
        if r["doc_id"] not in set(victims)
    ]
    oracle = PyBM25()
    oracle.index(remaining)
    meta = load_meta(d)
    assert meta["n_docs"] == len(remaining)
    got = _results(spark, d, k=12)
    for qid, q in enumerate(QUERIES):
        exp = oracle.search(q, k=12)
        assert [x[0] for x in got.get(qid, [])] == [x[0] for x in exp], q
        for (_, gs), (_, es) in zip(got.get(qid, []), exp):
            assert gs == pytest.approx(es, rel=1e-9, abs=1e-8)


def test_compact_crash_windows_recover(spark, tmp_path, monkeypatch):
    """A crash ANYWHERE mid-compact must never resurface deleted docs
    or wedge the index: tombstones are cleared LAST (so every
    mid-compact crash leaves the delete mask in force), and a slice
    orphaned between the swap's rmtree and rename rolls FORWARD on the
    next compact (same class as the minhash/IVF _recover_swap
    windows, ADVICE r5 #2)."""
    import bisect
    import shutil

    from oboyu_spark.operators import postings as P

    docs = _corpus(spark, n_convs=40)
    d = str(tmp_path / "crash")
    build_index(docs, d, **KW)
    before = _results(spark, d, k=20)
    victims = sorted({x[0] for res in before.values() for x in res[:2]})[:3]
    delete_docs(spark, d, victims)
    masked = _results(spark, d, k=12)

    # expected end state: a clean compact on a byte-identical clone
    clone = str(tmp_path / "clone")
    shutil.copytree(d, clone)
    compact_index(spark, clone)
    expected = _results(spark, clone, k=12)

    # crash window 1: staged rewrite done, part rebuild blows up —
    # tombstones must still be in force afterwards
    real_build = P._build_one_part

    def boom(*a, **k):
        raise RuntimeError("injected compact crash")

    monkeypatch.setattr(P, "_build_one_part", boom)
    with pytest.raises(RuntimeError, match="injected compact crash"):
        compact_index(spark, d)
    monkeypatch.setattr(P, "_build_one_part", real_build)
    assert os.path.exists(f"{d}/tombstones/doc_ints.json"), \
        "tombstones must survive a mid-compact crash"
    assert _results(spark, d, k=12) == masked, \
        "deleted docs must stay masked after a mid-compact crash"

    # crash window 2 on the SAME index: a staged slice orphaned
    # between rmtree(live) and rename(tmp, live) — manufacture the
    # state for one (gen, pid) holding a tombstoned doc
    with open(f"{d}/staged.json") as fh:
        smeta = json.load(fh)
    with open(f"{d}/tombstones/doc_ints.json") as fh:
        tomb = json.load(fh)
    g = smeta["gens"][0]
    offs = sorted((int(v), int(k)) for k, v in g["offsets"].items())
    starts = [v for v, _ in offs]
    dint = int(tomb[0])
    pid = offs[bisect.bisect_right(starts, dint) - 1][1]
    src = f"{d}/staged/gen=0/pid={pid}"
    tmp = f"{d}/staged_tmp/gen=0/pid={pid}"
    os.makedirs(os.path.dirname(tmp), exist_ok=True)
    os.rename(src, tmp)
    assert not os.path.exists(src)

    # re-running compact rolls the slice forward, rebuilds, finalizes,
    # and only then clears the tombstones; results match the clean run
    compact_index(spark, d)
    assert not os.path.exists(f"{d}/tombstones/doc_ints.json")
    assert not os.path.exists(f"{d}/staged_tmp")
    assert _results(spark, d, k=12) == expected
    meta = load_meta(d)
    assert meta["n_docs"] == docs.count() - len(victims)
    # idempotent once clean
    compact_index(spark, d)
    assert _results(spark, d, k=12) == expected


def test_append_tiebreak_on_original_key(spark, tmp_path):
    """Appended docs get HIGHER doc_ints even when their keys sort
    before existing ones; exact score-ties at the k boundary must still
    resolve by ORIGINAL doc_id asc (the engine-wide contract), not by
    doc_int age."""
    d = str(tmp_path / "idx")
    text = "zztie spark index engine"
    base = spark.createDataFrame(
        [(f"b{i}", text) for i in range(8)], "doc_id string, text string"
    )
    build_index(base, d, **KW)
    extra = spark.createDataFrame(
        [(f"a{i}", text) for i in range(4)], "doc_id string, text string"
    )
    append_docs(extra, d)
    for scorer in ("taat", "bmw"):
        rows = search_index(spark, d, "zztie", k=5, scorer=scorer).collect()
        got = [r["doc_id"] for r in rows]
        # all 12 docs tie exactly; doc_id asc wins: a0..a3 then b0
        assert got == ["a0", "a1", "a2", "a3", "b0"], (scorer, got)


def test_sync_docs_change_detection(spark, tmp_path):
    """sync_docs = the reference change-detector in one call: hash-diff
    against the docmap fp column → new/modified/deleted classified,
    tombstone + append + compact — final scores equal a fresh build
    over the updated corpus (so a modified doc's score CHANGES and N
    stays exact)."""
    from pyspark.sql import functions as F

    from oboyu_spark.operators.postings import sync_docs

    docs = _corpus(spark, n_convs=30)
    d = str(tmp_path / "idx")
    build_index(docs, d, **KW)

    rows = docs.collect()
    mod_keys = {rows[0]["doc_id"], rows[1]["doc_id"]}
    del_keys = {rows[2]["doc_id"]}
    updated = [
        (r["doc_id"],
         r["text"] + " updated revision text" if r["doc_id"] in mod_keys
         else r["text"])
        for r in rows if r["doc_id"] not in del_keys
    ] + [("brand#new1", "completely new spark index document")]
    incoming = spark.createDataFrame(updated, "doc_id string, text string")

    out = sync_docs(incoming, d, compact=True)
    assert out["new"] == 1 and out["modified"] == 2 and out["deleted"] == 1
    assert out["meta"]["n_docs"] == len(updated)

    oracle = PyBM25()
    oracle.index(updated)
    got = _results(spark, d, k=10)
    for qid, q in enumerate(QUERIES):
        exp = oracle.search(q, k=10)
        assert [x[0] for x in got.get(qid, [])] == [x[0] for x in exp], q
        for (_, gs), (_, es) in zip(got.get(qid, []), exp):
            assert gs == pytest.approx(es, rel=1e-9, abs=1e-8)

    # idempotence: syncing the same corpus again is a no-op
    out2 = sync_docs(incoming, d)
    assert (out2["new"], out2["modified"], out2["deleted"]) == (0, 0, 0)
    assert out2["meta"]["n_docs"] == len(updated)


def test_stale_df_guard_raises_clear_error(spark, tmp_path):
    """A half-finalized index (N recomputed under stale df, e.g. manual
    finalize after heavy deletion without compaction) must fail with an
    explicit run-compact error, not a math domain error."""
    from oboyu_spark.operators.postings import delete_docs, finalize_index

    docs = spark.createDataFrame(
        [(f"d{i}", "zz common text") for i in range(4)],
        "doc_id string, text string",
    )
    d = str(tmp_path / "idx")
    build_index(docs, d, **KW)
    delete_docs(spark, d, ["d0", "d1", "d2"])
    finalize_index(spark, d, 1.2, 0.75, 2, KW["shard_size"], KW["salt_chunk"])
    with pytest.raises(ValueError, match="compact_index"):
        search_index(spark, d, "zz", k=5).collect()
    # compaction restores a consistent, queryable index
    compact_index(spark, d)
    assert search_index(spark, d, "zz", k=5).count() == 1
