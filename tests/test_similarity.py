"""Similarity search: exact cosine top-k baseline vs numpy brute force,
LSH-ANN recall against the exact path, LSH near-pair correctness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oboyu_spark.operators import similarity as S

DIM = 16
N = 300


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N, DIM)).astype(np.float32)
    # plant near-duplicates: vec 10 ~ 11, 20 ~ 21
    base[11] = base[10] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
    base[21] = base[20] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
    return base


@pytest.fixture(scope="module")
def emb_df(spark, vectors):
    rows = [(i, [float(x) for x in vectors[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _brute_topk(vectors, q, k):
    vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    qn = np.asarray(q) / np.linalg.norm(q)
    cos = vn @ qn
    order = sorted(range(len(cos)), key=lambda i: (-cos[i], i))[:k]
    return [(i, float(cos[i])) for i in order]


def test_cosine_topk_exact(spark, emb_df, vectors):
    q = [float(x) for x in vectors[10]]
    got = S.cosine_topk(emb_df, q, k=8).collect()
    exp = _brute_topk(vectors.astype(np.float64), q, 8)
    assert [r["vec_id"] for r in got] == [i for i, _ in exp]
    for r, (_, c) in zip(got, exp):
        assert r["cosine"] == pytest.approx(c, rel=1e-6)
    assert got[0]["vec_id"] == 10  # self
    assert got[1]["vec_id"] == 11  # planted near-dup


def test_lsh_ann_recall(spark, emb_df, vectors):
    q = [float(x) for x in vectors[20]]
    exact = {r["vec_id"] for r in S.cosine_topk(emb_df, q, k=5).collect()}
    ann = {
        r["vec_id"]
        for r in S.lsh_ann_topk(emb_df, q, k=5, bits=6, n_tables=4).collect()
    }
    # recall@5 with 4 tables of 6 bits should catch the planted pair
    assert 20 in ann and 21 in ann
    assert len(exact & ann) >= 3


def test_lsh_near_pairs(spark, emb_df):
    pairs = S.lsh_near_pairs(emb_df, threshold=0.98, bits=6, n_tables=4,
                             dim=DIM).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (10, 11) in got and (20, 21) in got
    for r in pairs:
        assert r["cosine"] >= 0.98


def test_deterministic_buckets(spark, emb_df):
    a = sorted(map(tuple, S.lsh_bucketize(emb_df, DIM, bits=8,
                                          n_tables=2).select(
        "vec_id", "table", "bucket").collect()))
    b = sorted(map(tuple, S.lsh_bucketize(emb_df, DIM, bits=8,
                                          n_tables=2).select(
        "vec_id", "table", "bucket").collect()))
    assert a == b


def test_lsh_band_join_is_slim(spark, emb_df):
    """The (table, bucket) band-join exchanges must carry only ids —
    embeddings are re-attached after candidate dedup (VERDICT r2 #4)."""
    import contextlib
    import io
    import re

    df = S.lsh_near_pairs(emb_df, threshold=0.9, bits=6, n_tables=4, dim=DIM)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    band_exchanges = [
        blk for blk in re.split(r"\n\(\d+\) ", plan)
        if blk.startswith("Exchange") and "hashpartitioning(table" in blk
    ]
    assert band_exchanges, plan  # the band join does shuffle on (table, bucket)
    for blk in band_exchanges:
        assert "embedding" not in blk and "ea#" not in blk and "eb#" not in blk, blk


def test_ivf_train_sample_deterministic_across_partitioning(spark, emb_df):
    """hash-ordered take: same centroids whatever the layout (ADVICE)."""
    a = S.ivf_train_centroids(emb_df, n_lists=4, sample=100, iters=3, seed=9)
    b = S.ivf_train_centroids(
        emb_df.repartition(7), n_lists=4, sample=100, iters=3, seed=9
    )
    c = S.ivf_train_centroids(
        emb_df.coalesce(1), n_lists=4, sample=100, iters=3, seed=9
    )
    assert np.allclose(a, b) and np.allclose(a, c)


def test_ivf_build_search(spark, emb_df, vectors, tmp_path):
    """ivf_build persists assignment partitioned by list_id;
    ivf_search over the persisted index returns exactly what the
    in-memory path returns with the same centroids, and finds the
    planted near-dup."""
    d = str(tmp_path / "ivfidx")
    cent = S.ivf_build(emb_df, d, n_lists=8, sample=N, iters=8, seed=5)
    q = [float(x) for x in vectors[10]]
    got = S.ivf_search(spark, d, q, k=5, nprobe=3).collect()
    mem = S.ivf_topk(emb_df, q, k=5, n_lists=8, nprobe=3,
                     centroids=cent).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in mem
    ]
    assert got[0]["vec_id"] == 10 and 11 in {r["vec_id"] for r in got}
    # recall@5 vs the exact path
    exact = {r["vec_id"] for r in S.cosine_topk(emb_df, q, k=5).collect()}
    assert len(exact & {r["vec_id"] for r in got}) >= 3
    # centroid sidecar round-trips
    assert np.allclose(S.ivf_load_centroids(d), cent)


def test_ivf_delete_and_compact(spark, emb_df, vectors, tmp_path):
    """VERDICT r4 #7: ivf_delete masks vectors from search immediately
    (tombstones), ivf_compact rewrites the lists without them and
    clears the tombstones — searches identical before/after compact,
    and the rewritten layout physically drops the deleted rows."""
    import glob

    d = str(tmp_path / "ivfdel")
    S.ivf_build(emb_df, d, n_lists=8, sample=N, iters=8, seed=5)
    q = [float(x) for x in vectors[10]]
    before = S.ivf_search(spark, d, q, k=5, nprobe=3).collect()
    assert before[0]["vec_id"] == 10
    S.ivf_delete(d, [10, 21])
    S.ivf_delete(d, [10])  # idempotent re-delete
    assert S.ivf_load_tombstones(d) == [10, 21]
    masked = S.ivf_search(spark, d, q, k=5, nprobe=3).collect()
    got_ids = {r["vec_id"] for r in masked}
    assert 10 not in got_ids and 21 not in got_ids
    assert masked[0]["vec_id"] == 11  # the planted near-dup leads now
    # compact: same results, tombstones cleared, rows physically gone
    n_before = spark.read.parquet(f"{d}/lists").count()
    S.ivf_compact(spark, d)
    assert S.ivf_load_tombstones(d) == []
    lists = spark.read.parquet(f"{d}/lists")
    assert lists.count() == n_before - 2
    assert lists.filter(F.col("vec_id").isin([10, 21])).count() == 0
    after = S.ivf_search(spark, d, q, k=5, nprobe=3).collect()
    assert [(r["vec_id"], r["cosine"]) for r in after] == [
        (r["vec_id"], r["cosine"]) for r in masked
    ]
    # partitioned layout survived the rewrite (pruning still possible)
    assert glob.glob(f"{d}/lists/list_id=*"), "partition dirs lost"
    assert not glob.glob(f"{d}/lists_old") and not glob.glob(
        f"{d}/lists_compacting")


def test_ivf_compact_crash_window_recovery(spark, emb_df, vectors, tmp_path):
    """ADVICE r5 #2 (IVF flavor): a crash between ivf_compact's two
    renames leaves no ``lists/`` at the live path; the next search,
    append, or compact rolls forward to the completed
    ``lists_compacting`` rewrite automatically."""
    import os

    d = str(tmp_path / "ivfcrash")
    S.ivf_build(emb_df, d, n_lists=8, sample=N, iters=8, seed=5)
    q = [float(x) for x in vectors[10]]
    before = [(r["vec_id"], r["cosine"])
              for r in S.ivf_search(spark, d, q, k=5, nprobe=3).collect()]
    # simulate the window: rewrite complete, live renamed aside,
    # second rename never ran
    spark.read.parquet(f"{d}/lists").write.mode("overwrite").partitionBy(
        "list_id").parquet(f"{d}/lists_compacting")
    os.rename(f"{d}/lists", f"{d}/lists_old")
    assert not os.path.exists(f"{d}/lists")
    after = [(r["vec_id"], r["cosine"])
             for r in S.ivf_search(spark, d, q, k=5, nprobe=3).collect()]
    assert after == before
    assert os.path.isdir(f"{d}/lists")
    assert not os.path.exists(f"{d}/lists_old")
    assert not os.path.exists(f"{d}/lists_compacting")


def test_ivf_search_prunes_partitions(spark, emb_df, vectors, tmp_path):
    """The probed-list filter must land in the scan's PartitionFilters
    (directory pruning), and the executed scan must touch only files
    under the probed list_id= directories — the VERDICT r2 #1 'IVF
    realizes its own pruning' gate."""
    import contextlib
    import io
    import re

    d = str(tmp_path / "ivfidx2")
    S.ivf_build(emb_df, d, n_lists=8, sample=N, iters=8, seed=5)
    q = [float(x) for x in vectors[20]]
    res = S.ivf_search(spark, d, q, k=5, nprobe=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "list_id" in m.group(1), plan
    # executed scan: every touched file is inside a probed partition dir
    probes = set(S._probe_lists(S.ivf_load_centroids(d), q, 3))
    cand = spark.read.parquet(f"{d}/lists").filter(
        F.col("list_id").isin([int(p) for p in probes])
    )
    files = {
        r[0] for r in cand.select(F.input_file_name()).distinct().collect()
    }
    touched_lists = {
        int(re.search(r"list_id=(\d+)", f).group(1)) for f in files
    }
    assert touched_lists <= probes and touched_lists


def test_ivf_topk_recall_and_determinism(spark, emb_df, vectors):
    """IVF: scanned fraction = nprobe/n_lists; the planted near-dup and
    the query's own vector must fall in probed lists, and training is
    deterministic (same seed → same centroids → same results)."""
    q = [float(x) for x in vectors[10]]
    cent = S.ivf_train_centroids(emb_df, n_lists=8, sample=N, iters=8, seed=5)
    cent2 = S.ivf_train_centroids(emb_df, n_lists=8, sample=N, iters=8, seed=5)
    assert np.allclose(cent, cent2)

    got = S.ivf_topk(emb_df, q, k=5, n_lists=8, nprobe=3,
                     centroids=cent).collect()
    assert got[0]["vec_id"] == 10  # self lands in its own list
    assert 11 in {r["vec_id"] for r in got}  # planted near-dup
    exact = {r["vec_id"] for r in S.cosine_topk(emb_df, q, k=5).collect()}
    assert len(exact & {r["vec_id"] for r in got}) >= 3

    # the probed candidate set is a strict subset of the corpus
    assigned = S.ivf_assign(emb_df, cent)
    sizes = dict(
        (r["list_id"], r["n"]) for r in
        assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert len(sizes) > 1 and sum(sizes.values()) == N


def test_ivf_quantized_assignment_matches_numpy(spark, emb_df, vectors):
    """quantize=True assignment (the exact-oracle path) must equal a
    pure-numpy twin of the same fixed-point arithmetic — per-vector
    list_id identity, ties toward the lowest list index."""
    cent = S.ivf_seeded_centroids(DIM, n_lists=8, seed=42)
    assert np.array_equal(cent, np.floor(cent))  # integer-valued
    got = {
        r["vec_id"]: r["list_id"]
        for r in S.ivf_assign(emb_df, cent, quantize=True).collect()
    }
    qv = np.floor(vectors.astype(np.float64) * S.LSH_VEC_SCALE + 0.5)
    d = (cent ** 2).sum(axis=1)[None, :] - 2.0 * (qv @ cent.T)
    exp = d.argmin(axis=1)
    assert got == {i: int(exp[i]) for i in range(N)}


def test_ivf_quantized_topk_exact_over_candidates(spark, emb_df, vectors):
    """ivf_topk(quantize=True) == exact cosine top-k restricted to the
    numpy-computed candidate set (the contract the DuckDB oracle
    verifies end-to-end at driver time)."""
    q = [float(x) for x in vectors[20]]
    cent = S.ivf_seeded_centroids(DIM, n_lists=8, seed=42)
    probes = S._probe_lists(cent, q, nprobe=3, quantize=True)
    qv = np.floor(vectors.astype(np.float64) * S.LSH_VEC_SCALE + 0.5)
    d = (cent ** 2).sum(axis=1)[None, :] - 2.0 * (qv @ cent.T)
    cand = [i for i in range(N) if int(d[i].argmin()) in probes]
    assert 0 < len(cand) < N

    got = S.ivf_topk(emb_df, q, k=5, n_lists=8, nprobe=3,
                     centroids=cent, quantize=True).collect()
    vn = vectors.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    qn = np.asarray(q) / np.linalg.norm(q)
    cos = vn @ qn
    exp = sorted(cand, key=lambda i: (-cos[i], i))[:5]
    assert [r["vec_id"] for r in got] == exp
    assert 20 in {r["vec_id"] for r in got}  # query's own vector probed


def test_ivf_build_search_quantized_unified(spark, emb_df, vectors, tmp_path):
    """VERDICT r3 #3: the persisted path must serve the same quantizer
    it was built with. A quantize=True/seeded-centroid build records the
    mode in the sidecar; ivf_search probes quantized and returns exactly
    ivf_topk(quantize=True); ivf_append assigns quantized too."""
    d = str(tmp_path / "ivfq")
    cent = S.ivf_seeded_centroids(DIM, n_lists=8, seed=42)
    base = emb_df.filter("vec_id < 250")
    extra = emb_df.filter("vec_id >= 250")
    S.ivf_build(base, d, centroids=cent, quantize=True)
    assert S.ivf_load_sidecar(d)["quantize"] is True
    q = [float(x) for x in vectors[20]]
    got = S.ivf_search(spark, d, q, k=5, nprobe=3).collect()
    mem = S.ivf_topk(base, q, k=5, n_lists=8, nprobe=3,
                     centroids=cent, quantize=True).collect()
    assert [(r["vec_id"], r["cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in mem
    ]
    # append honors the recorded mode: appended list_ids equal a fresh
    # quantized assignment
    S.ivf_append(extra, d)
    lists = spark.read.parquet(f"{d}/lists")
    got_ids = {r["vec_id"]: r["list_id"]
               for r in lists.filter("vec_id >= 250").collect()}
    exp_ids = {r["vec_id"]: r["list_id"]
               for r in S.ivf_assign(extra, cent, quantize=True).collect()}
    assert got_ids == exp_ids


def test_ivf_quantize_rejects_float_centroids(spark, emb_df):
    """ADVICE r3: quantize=True with k-means (unscaled float) centroids
    silently mixes scales — it must raise instead."""
    cent = S.ivf_train_centroids(emb_df, n_lists=4, sample=100, iters=2,
                                 seed=9)
    assert not np.array_equal(cent, np.floor(cent))
    with pytest.raises(ValueError, match="integer-valued"):
        S.ivf_assign(emb_df, cent, quantize=True)
    with pytest.raises(ValueError, match="integer-valued"):
        S._probe_lists(cent, [0.0] * DIM, nprobe=2, quantize=True)
    with pytest.raises(ValueError, match="integer-space"):
        S.ivf_build(emb_df, "/tmp/never", quantize=True)


def test_ann_index_job_lifecycle(spark, emb_df, vectors, tmp_path,
                                 monkeypatch, capsys):
    """jobs/ann_index.py build -> search -> append drive the persisted
    IVF lifecycle through the spark-submit surface (argv-level)."""
    import json
    import sys

    from oboyu_spark.jobs import ann_index

    d = str(tmp_path / "jobivf")
    p = str(tmp_path / "emb_pq")
    emb_df.write.mode("overwrite").parquet(p)
    q = [float(x) for x in vectors[20]]

    monkeypatch.setattr(sys, "argv", [
        "ann_index.py", "build", "--index", d, "--embeddings", p,
        "--n-lists", "8", "--sample", "300", "--seeded", "--quantize",
    ])
    ann_index.main()
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_lists"] == 8 and built["quantize"] is True

    monkeypatch.setattr(sys, "argv", [
        "ann_index.py", "search", "--index", d,
        "--query-json", json.dumps(q), "--k", "5", "--nprobe", "3",
    ])
    ann_index.main()
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    exp = S.ivf_search(spark, d, q, k=5, nprobe=3).collect()
    assert [r["vec_id"] for r in res["results"]] == \
        [r["vec_id"] for r in exp]

    monkeypatch.setattr(sys, "argv", [
        "ann_index.py", "append", "--index", d, "--embeddings", p,
    ])
    ann_index.main()
    app = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert app["n_added"] == N
    assert spark.read.parquet(f"{d}/lists").count() == 2 * N

    # the append doubled every vec_id; tombstone one id and compact —
    # both of its rows must go
    monkeypatch.setattr(sys, "argv", [
        "ann_index.py", "delete", "--index", d, "--vec-ids-json", "[20]",
    ])
    ann_index.main()
    dele = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert dele["n_tombstones"] == 1
    monkeypatch.setattr(sys, "argv", [
        "ann_index.py", "compact", "--index", d,
    ])
    ann_index.main()
    comp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert comp["n_vectors"] == 2 * N - 2
    assert S.ivf_load_tombstones(d) == []


def test_ivf_append(spark, emb_df, vectors, tmp_path):
    """ivf_append assigns against the frozen centroids and lands in the
    existing partitioned layout: searches see old + new vectors, and
    appended assignments equal what a fresh build would compute."""
    d = str(tmp_path / "ivf_app")
    base = emb_df.filter("vec_id < 250")
    extra = emb_df.filter("vec_id >= 250")
    cent = S.ivf_build(base, d, n_lists=8, sample=250, iters=8, seed=5)
    S.ivf_append(extra, d)

    lists = spark.read.parquet(f"{d}/lists")
    assert lists.count() == N
    # appended rows carry the same list_id a fresh assign computes
    got = {r["vec_id"]: r["list_id"]
           for r in lists.filter("vec_id >= 250").collect()}
    exp = {r["vec_id"]: r["list_id"]
           for r in S.ivf_assign(extra, cent).collect()}
    assert got == exp

    # a query whose nearest neighbors live in the appended half finds them
    q = [float(x) for x in vectors[260]]
    found = {r["vec_id"]
             for r in S.ivf_search(spark, d, q, k=3, nprobe=8).collect()}
    assert 260 in found


def test_lsh_multiprobe_recall(spark, emb_df, vectors):
    """Multi-probe supersets the single-probe candidate set and lifts
    recall at fixed table count; probe list shape and determinism."""
    q = [float(x) for x in vectors[20]]
    probes0 = S.lsh_query_buckets(q, bits=8, n_tables=2, seed=42)
    probes3 = S.lsh_query_buckets(q, bits=8, n_tables=2, seed=42,
                                  multi_probe=3)
    assert len(probes0) == 2 and len(probes3) == 2 * 4
    assert set(probes0) <= set(probes3)
    assert probes3 == S.lsh_query_buckets(q, bits=8, n_tables=2, seed=42,
                                          multi_probe=3)  # deterministic
    single = {r["vec_id"] for r in S.lsh_ann_topk(
        emb_df, q, k=10, bits=8, n_tables=2).collect()}
    multi = {r["vec_id"] for r in S.lsh_ann_topk(
        emb_df, q, k=10, bits=8, n_tables=2, multi_probe=3).collect()}
    exact = {r["vec_id"] for r in S.cosine_topk(emb_df, q, k=10).collect()}
    assert len(multi & exact) >= len(single & exact)
    assert 20 in multi and 21 in multi  # planted pair found
