"""Dedup suite: exact, n-gram Jaccard, MinHash+LSH, SimHash — checked
against brute-force python computations on the same corpus."""

from __future__ import annotations

import hashlib
import itertools

import pytest
from pyspark.sql import functions as F

from oboyu_spark.functions.text import py_normalize_text, py_tokenize
from oboyu_spark.operators import dedup as D

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),      # exact dup of 1
    (3, "the  quick  brown fox jumps over the lazy dog"),    # ws-normalized dup
    (4, "the quick brown fox jumps over the sleepy dog"),    # near dup
    (5, "completely different content about spark indexes"),
    (6, "spark indexes content completely different about"), # same tokens, diff order
    (7, "日本語のテキスト処理と形態素解析の話題です"),
    (8, "日本語のテキスト処理と形態素解析の話題です"),          # exact dup of 7
    (9, ""),
]


def _shingles(text, n=3):
    toks = py_tokenize(text)
    return {" ".join(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))}


def _jaccard(a, b, n=3):
    sa, sb = _shingles(a, n), _shingles(b, n)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_exact_dup_groups(spark, docs):
    groups = D.exact_dup_groups(docs).collect()
    got = {(r["keep_doc_id"], r["n_docs"]) for r in groups}
    assert got == {(1, 3), (7, 2)}  # {1,2,3} ws-normalized, {7,8}


def test_dedup_exact(spark, docs):
    kept = sorted(r["doc_id"] for r in D.dedup_exact(docs).collect())
    assert kept == [1, 4, 5, 6, 7, 9]


def test_ngram_jaccard_pairs(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    texts = dict(CORPUS)
    # brute force expectation
    exp = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        j = _jaccard(texts[a], texts[b])
        if j >= 0.3:
            exp[(a, b)] = j
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(round(exp[k], 6))


def test_ngram_jaccard_hot_shingle_guard(spark):
    """1000 docs sharing one boilerplate shingle must NOT produce a
    quadratic pair set — the df cap drops the hot shingle from
    candidate generation. Pairs that also share a rare shingle still
    come out with the TRUE Jaccard (hot shingle counted in |A∩B|)."""
    boiler = "legal notice applies"  # one hot 3-gram in every doc
    rows = [(i, f"{boiler} unique{i:04d} tail{i:04d} body{i:04d}")
            for i in range(1000)]
    # docs 0 and 1 additionally share a rare run → a real near-pair
    rows[0] = (0, f"{boiler} shared alpha beta gamma ending zero")
    rows[1] = (1, f"{boiler} shared alpha beta gamma ending one")
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = D.ngram_jaccard_pairs(docs, n=3, threshold=0.3,
                                  max_shingle_df=100).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    # only the genuinely-near pair survives; no boilerplate pair storm
    assert set(got) == {(0, 1)}
    # and its Jaccard is EXACT over the full sets (hot shingle included)
    exp = _jaccard(rows[0][1], rows[1][1])
    assert got[(0, 1)] == pytest.approx(round(exp, 6))
    # plan-shape guard: candidate join input excludes the hot shingle
    sh = D.doc_shingles(docs, 3, max_shingle_df=100)
    hot = " ".join(py_tokenize(boiler))
    assert sh.filter(F.col("shingle") == hot).count() == 0


def test_simhash_bits_guard():
    with pytest.raises(ValueError):
        D.simhash(None, bits=64)


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = D.minhash_lsh_pairs(docs, num_perm=16, bands=8, threshold=0.4)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # exact dups must always collide in every band
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    # NB: docs 7/8 are a single JP token run → fewer than n=3 tokens →
    # no shingles → invisible to MinHash (exact dedup catches them)
    assert (7, 8) not in got
    # near dup (jaccard ~0.5) should be caught with 8 bands of 2 rows
    assert (1, 4) in got or (2, 4) in got
    # unrelated docs must not appear
    assert (5, 7) not in got and (1, 5) not in got


def test_minhash_signature_semantics(spark, docs):
    sig = D.minhash_signatures(docs, num_perm=4).collect()
    by_id = {r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(4)) for r in sig}
    # brute-force: min md5(shingle:i)
    for doc_id, text in CORPUS:
        sh = _shingles(text)
        if not sh:
            assert doc_id not in by_id
            continue
        for i in range(4):
            exp = min(hashlib.md5(f"{s}:{i}".encode()).hexdigest() for s in sh)
            assert by_id[doc_id][i] == exp, (doc_id, i)


def test_simhash(spark, docs):
    rows = D.simhash(docs, bits=32).collect()
    by_id = {r["doc_id"]: r["simhash"] for r in rows}
    assert by_id[1] == by_id[2] == by_id[3]  # identical token multisets
    assert by_id[7] == by_id[8]
    assert by_id[5] == by_id[6]  # order-insensitive (bag of words)
    assert 9 not in by_id  # no tokens → no row
    # near-dup pair has small hamming distance
    h14 = bin(by_id[1] ^ by_id[4]).count("1")
    h15 = bin(by_id[1] ^ by_id[5]).count("1")
    assert h14 < h15


def test_simhash_near_pairs(spark, docs):
    pairs = D.simhash_near_pairs(docs, bits=32, max_hamming=6).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    assert got[(1, 2)] == 0 and got[(7, 8)] == 0 and got[(5, 6)] == 0
    assert (1, 4) in got
    assert (1, 5) not in got


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing property (Schleimer et al.): two docs sharing a
    normalized substring of length ≥ k + window − 1 must share at least
    one selected fingerprint hash."""
    k, w = 8, 4
    shared = "identical plagiarised passage of text"  # len >> k+w-1
    rows = [
        (1, f"prefix one {shared} suffix alpha"),
        (2, f"completely different lead-in {shared} and another tail"),
        (3, "no overlap with the others at all in this document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = D.winnowing_fingerprints(docs, k=k, window=w).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"
    # sanity: fingerprints are a strict subset of all k-gram hashes
    import hashlib
    norm = " ".join(rows[0][1].split()).lower()
    all_kg = {hashlib.md5(norm[i:i + k].encode()).hexdigest()
              for i in range(len(norm) - k + 1)}
    assert by_doc[1] < all_kg

    # xxh64 long-hash mode: same MOSS guarantee, 8-byte fingerprints
    fps64 = D.winnowing_fingerprints(docs, k=k, window=w,
                                     hash_mode="xxh64").collect()
    by64 = {}
    for r in fps64:
        by64.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by64[1] & by64[2], "xxh64 mode must keep the shared-run guarantee"
    assert all(isinstance(v, int) for v in by64[1]), "long fingerprints"
    assert not (by64[3] & by64[1]) and not (by64[3] & by64[2])


def test_winnowing_max_chars_truncation(spark):
    """max_chars is operator-owned: fingerprints of a max_chars-capped
    run equal those of the pre-truncated text, and a long tail beyond
    the cap contributes no rows (bounding the explode blowup)."""
    head = "a shared deterministic head of text for the cap test"
    rows_full = [(1, head + " " + ("tail " * 500))]
    rows_cut = [(1, (head + " " + ("tail " * 500))[:60])]
    # NB the engine truncates AFTER whitespace-collapse; this fixture
    # has no runs of whitespace, so raw slicing matches.
    docs_full = spark.createDataFrame(rows_full, "doc_id long, text string")
    docs_cut = spark.createDataFrame(rows_cut, "doc_id long, text string")
    capped = {r["fp"] for r in
              D.winnowing_fingerprints(docs_full, k=8, window=4,
                                       max_chars=60).collect()}
    pre = {r["fp"] for r in
           D.winnowing_fingerprints(docs_cut, k=8, window=4).collect()}
    assert capped == pre and capped
    uncapped = {r["fp"] for r in
                D.winnowing_fingerprints(docs_full, k=8, window=4).collect()}
    assert len(uncapped) > len(capped)


def test_winnowing_bad_hash_mode(spark, docs):
    with pytest.raises(ValueError):
        D.winnowing_fingerprints(docs, hash_mode="sha1")


def test_winnow_near_pairs_planted_overlap(spark):
    """VERDICT r3 #5: the pair operator must surface exactly the
    planted local-overlap pair (shared run >> k + window − 1), score it
    by true common-fingerprint count over the FULL sets, and miss the
    disjoint doc; xxh64 mode finds the same pair."""
    shared = ("a long identical plagiarised passage that runs well past "
              "the winnowing guarantee length and then some more words")
    rows = [
        (1, f"unique preamble for doc one {shared} unique tail one"),
        (2, f"another beginning here {shared} and a different ending"),
        (3, "entirely unrelated text with no shared runs whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = D.winnow_near_pairs(docs, k=8, window=4, min_common=2,
                              max_fp_df=None).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in got}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)  # doc 3 pairs with nobody
    r = pairs[(1, 2)]
    # common_fp is the true intersection of the full fingerprint sets
    f1 = {x["fp"] for x in
          D.winnowing_fingerprints(docs, k=8, window=4).collect()
          if x["doc_id"] == 1}
    f2 = {x["fp"] for x in
          D.winnowing_fingerprints(docs, k=8, window=4).collect()
          if x["doc_id"] == 2}
    assert r["common_fp"] == len(f1 & f2)
    assert r["overlap"] == pytest.approx(
        len(f1 & f2) / min(len(f1), len(f2)), abs=1e-6
    )
    # xxh64 (narrow-shuffle) mode keeps the detection
    got64 = D.winnow_near_pairs(docs, k=8, window=4, min_common=2,
                                hash_mode="xxh64", max_fp_df=None).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got64} == {(1, 2)}


def test_winnow_near_pairs_hot_fp_guard(spark):
    """max_fp_df excludes boilerplate fingerprints from CANDIDATE
    generation but still counts them in common_fp for surviving
    candidates (exact-over-candidates, like ngram_jaccard_pairs)."""
    boiler = "this exact boilerplate header appears in every document "
    # docs 1 and 2 additionally share a rare run; 3 and 4 share ONLY
    # the boilerplate (no other ≥ k+window−1 char run in common)
    rare = "a rare shared run found only in documents one and two"
    rows = [
        (1, boiler + rare + " alpha ending"),
        (2, boiler + rare + " beta finish"),
        (3, boiler + "wholly distinct narrative on mountain weather"),
        (4, boiler + "separate tale regarding oceanic currents"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cap 3 < 4 docs → the boilerplate fps can't generate candidates
    got = D.winnow_near_pairs(docs, k=8, window=4, min_common=1,
                              max_fp_df=3).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in got}
    assert (1, 2) in pairs  # found via the rare run
    # (3,4) share ONLY boilerplate → not even candidates
    assert (3, 4) not in pairs
    # but the (1,2) common count includes the boilerplate fps too
    uncapped = {(r["doc_a"], r["doc_b"]): r for r in
                D.winnow_near_pairs(docs, k=8, window=4, min_common=1,
                                    max_fp_df=None).collect()}
    assert pairs[(1, 2)]["common_fp"] == uncapped[(1, 2)]["common_fp"]


def test_simhash64_halves_and_pairs(spark, docs):
    """sim_lo must equal the 32-bit simhash exactly (same md5 slice);
    the banded 64-bit pair generation must equal a brute-force 64-bit
    hamming scan (pigeonhole completeness), and exact dups sit at
    hamming 0."""
    sh32 = {r["doc_id"]: r["simhash"]
            for r in D.simhash(docs, bits=32).collect()}
    rows = D.simhash64(docs).collect()
    sh64 = {r["doc_id"]: (r["sim_lo"], r["sim_hi"]) for r in rows}
    for d, (lo, _) in sh64.items():
        assert lo == sh32[d], d
    # brute-force oracle over all pairs
    def ham(a, b):
        return (bin(sh64[a][0] ^ sh64[b][0]).count("1")
                + bin(sh64[a][1] ^ sh64[b][1]).count("1"))
    ids = sorted(sh64)
    budget = 8
    exp = {(a, b): ham(a, b) for a, b in itertools.combinations(ids, 2)
           if ham(a, b) <= budget}
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in D.simhash64_near_pairs(docs, max_hamming=budget).collect()}
    assert got == exp
    assert got.get((1, 2)) == 0 and got.get((7, 8)) == 0  # exact dups


def test_simhash_hot_bucket_cap(spark):
    """max_bucket_df (VERDICT r4 #3): a degenerate segment shared by
    many boilerplate docs is dropped from candidate generation (the
    band self-join stays sub-quadratic), while pairs in cool buckets
    are still found; cap=None keeps exhaustive pigeonhole recall."""
    boiler = [(i, "identical boilerplate footer text repeated verbatim "
               "across the whole scraped site every single page")
              for i in range(1, 31)]
    pair = [(101, "a genuinely unique pair of near duplicate rows here"),
            (102, "a genuinely unique pair of near duplicate rows here")]
    docs = spark.createDataFrame(boiler + pair, "doc_id long, text string")
    for fn in (D.simhash_near_pairs, D.simhash64_near_pairs):
        capped = {(r["doc_a"], r["doc_b"])
                  for r in fn(docs, max_bucket_df=5).collect()}
        # every boilerplate bucket holds 30 docs > cap → those pairs
        # are traded away; the cool (101,102) pair survives
        assert capped == {(101, 102)}, (fn.__name__, capped)
        full = {(r["doc_a"], r["doc_b"])
                for r in fn(docs, max_bucket_df=None).collect()}
        assert (1, 2) in full and (101, 102) in full
        assert len(full) == 30 * 29 // 2 + 1, fn.__name__


def test_minhash_incremental_index(spark, tmp_path):
    """minhash_index_build + append_pairs: the pairs returned for an
    appended batch equal the full-recompute pair set restricted to
    pairs touching the batch, and a second append sees the first
    append's docs (the index grew)."""
    d = str(tmp_path / "mhidx")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    rows_old = [
        (1, base + " alpha"),
        (2, base + " alpha beta"),
        (5, "completely different content about spark indexes today"),
    ]
    rows_new = [
        (3, base + " alpha gamma"),       # near-dup of 1 and 2
        (6, "yet another unrelated piece of text entirely here"),
    ]
    rows_new2 = [
        (4, base + " alpha gamma delta"),  # near-dup of 3 (an APPENDED doc)
    ]
    old = spark.createDataFrame(rows_old, "doc_id long, text string")
    new = spark.createDataFrame(rows_new, "doc_id long, text string")
    new2 = spark.createDataFrame(rows_new2, "doc_id long, text string")

    D.minhash_index_build(old, d, num_perm=16, bands=8)
    got1 = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
            for r in D.minhash_index_append_pairs(new, d,
                                                  threshold=0.4).collect()}
    # full-recompute oracle over old ∪ new, restricted to pairs
    # touching the batch
    union = spark.createDataFrame(rows_old + rows_new,
                                  "doc_id long, text string")
    full = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
            for r in D.minhash_lsh_pairs(union, num_perm=16, bands=8,
                                         threshold=0.4).collect()}
    new_ids = {3, 6}
    exp1 = {p: j for p, j in full.items()
            if p[0] in new_ids or p[1] in new_ids}
    assert got1 == exp1 and (1, 3) in got1
    # second append: doc 4 must pair with doc 3 (which arrived via the
    # FIRST append — proves the index grew)
    got2 = {(r["doc_a"], r["doc_b"])
            for r in D.minhash_index_append_pairs(new2, d,
                                                  threshold=0.4).collect()}
    assert (3, 4) in got2


def test_minhash_index_replay_and_compact(spark, tmp_path):
    """Replay an append → identical pairs, deterministic resolution
    (newest batch wins), and minhash_index_compact shrinks the layout
    to one batch dir holding exactly one row per doc — with
    append_pairs still correct afterwards (VERDICT r4 #4 / ADVICE)."""
    import os

    d = str(tmp_path / "mhidx2")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    old = spark.createDataFrame(
        [(1, base + " alpha"), (2, base + " alpha beta")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(3, base + " alpha gamma")], "doc_id long, text string")
    D.minhash_index_build(old, d, num_perm=16, bands=8)
    p1 = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
          for r in D.minhash_index_append_pairs(new, d,
                                                threshold=0.4).collect()}
    # replay the SAME batch: pairs identical, index stays resolvable
    p2 = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
          for r in D.minhash_index_append_pairs(new, d,
                                                threshold=0.4).collect()}
    assert p1 == p2 and (1, 3) in p1
    assert len(D._signature_batches(d)) == 3  # build + 2 appends
    resolved = D.minhash_index_signatures(spark, d)
    assert resolved.count() == 3  # one row per doc despite the replay
    # re-append doc 3 with CHANGED text: newest batch must win
    changed = spark.createDataFrame(
        [(3, "entirely unrelated replacement content about parquet")],
        "doc_id long, text string")
    p3 = {(r["doc_a"], r["doc_b"])
          for r in D.minhash_index_append_pairs(changed, d,
                                                threshold=0.4).collect()}
    assert p3 == set()  # the new text pairs with nothing
    sig3 = D.minhash_index_signatures(spark, d).filter("doc_id = 3")
    direct = D._banded_signatures(changed, 16, 8, 3, "doc_id", "text")
    assert sig3.collect() == direct.collect()
    # compact: one batch dir, file rows == distinct docs, still correct
    D.minhash_index_compact(spark, d)
    assert D._signature_batches(d) == [0]
    flat = spark.read.parquet(f"{d}/signatures")
    assert flat.count() == 3 and "batch" in flat.columns
    assert sorted(r["doc_id"] for r in flat.select("doc_id").collect()) \
        == [1, 2, 3]
    post = spark.createDataFrame(
        [(4, base + " alpha gamma epsilon")], "doc_id long, text string")
    p4 = {(r["doc_a"], r["doc_b"])
          for r in D.minhash_index_append_pairs(post, d,
                                                threshold=0.4).collect()}
    assert (1, 4) in p4 and all(4 in p for p in p4)
    # a crash-debris dir without _SUCCESS is swept before the next read
    os.makedirs(f"{d}/signatures/batch=99")
    D._clean_partial_batches(d)
    assert 99 not in D._signature_batches(d)


def test_minhash_compact_crash_window_recovery(spark, tmp_path):
    """ADVICE r5 #2: a crash BETWEEN minhash_index_compact's two
    renames leaves NO dir at the live signatures path (only
    signatures_old + signatures_compacting). _recover_swap — run on
    entry to the read, append, and compact paths — must roll forward
    to the completed compacting dir automatically, not wedge reads
    until manual repair."""
    import os

    d = str(tmp_path / "mhcrash")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    docs = spark.createDataFrame(
        [(1, base + " alpha"), (2, base + " beta"), (3, base + " gamma")],
        "doc_id long, text string")
    D.minhash_index_build(docs, d, num_perm=16, bands=8)
    before = sorted(map(tuple, D.minhash_index_signatures(spark, d)
                        .collect()))
    # simulate the window: rewrite written and COMPLETE, live renamed
    # aside, second rename never happened
    spark.read.parquet(f"{d}/signatures/batch=0").write.mode(
        "overwrite").parquet(f"{d}/signatures_compacting/batch=0")
    os.rename(f"{d}/signatures", f"{d}/signatures_old")
    assert not os.path.exists(f"{d}/signatures")
    # the read path self-heals (roll forward) and sweeps the debris
    after = sorted(map(tuple, D.minhash_index_signatures(spark, d)
                       .collect()))
    assert after == before
    assert os.path.isdir(f"{d}/signatures")
    assert not os.path.exists(f"{d}/signatures_old")
    assert not os.path.exists(f"{d}/signatures_compacting")
    # defensive roll-BACK branch: only the old layout survives
    os.rename(f"{d}/signatures", f"{d}/signatures_old")
    D._recover_swap(d, "signatures")
    assert os.path.isdir(f"{d}/signatures")
    assert sorted(map(tuple, D.minhash_index_signatures(spark, d)
                      .collect())) == before
    # with the live dir present, leftover siblings are pre/post-swap
    # debris and are swept
    os.makedirs(f"{d}/signatures_old")
    D._recover_swap(d, "signatures")
    assert not os.path.exists(f"{d}/signatures_old")


def test_minhash_index_job_lifecycle(spark, tmp_path, monkeypatch, capsys):
    """jobs/minhash_index.py build -> append -> compact drive the
    incremental near-dup index through the spark-submit surface."""
    import json
    import sys

    from oboyu_spark.jobs import minhash_index as J

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    old = spark.createDataFrame(
        [(1, base + " alpha"), (2, base + " alpha beta")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(3, base + " alpha gamma")], "doc_id long, text string")
    d = str(tmp_path / "jobmh")
    p_old, p_new = str(tmp_path / "old_pq"), str(tmp_path / "new_pq")
    p_pairs = str(tmp_path / "pairs_pq")
    old.write.parquet(p_old)
    new.write.parquet(p_new)

    monkeypatch.setattr(sys, "argv", [
        "minhash_index.py", "build", "--index", d, "--docs", p_old,
        "--num-perm", "16", "--bands", "8",
    ])
    J.main()
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_docs"] == 2 and built["bands"] == 8

    monkeypatch.setattr(sys, "argv", [
        "minhash_index.py", "append", "--index", d, "--docs", p_new,
        "--threshold", "0.4", "--pairs-out", p_pairs,
    ])
    J.main()
    app = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {(r["doc_a"], r["doc_b"])
           for r in spark.read.parquet(p_pairs).collect()}
    assert app["n_pairs"] == len(got) and (1, 3) in got

    monkeypatch.setattr(sys, "argv", [
        "minhash_index.py", "compact", "--index", d,
    ])
    J.main()
    comp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert comp["n_docs"] == 3 and comp["batches"] == [0]


def test_shingles_long_doc_smoke(spark):
    """A 30k-token document shingles in ~1 s with the zip_with
    construction; the old transform+slice shape re-tokenized per
    shingle (O(tokens²), 244 s for this same doc) — a revert shows up
    as a visible stall right here. Values pinned."""
    from pyspark.sql import functions as F

    doc = " ".join(f"word{i % 3000}" for i in range(30_000))
    docs = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    sh = docs.select(
        F.size(D.shingles_expr(F.col("text"), 3, 2)).alias("n"),
        F.array_contains(
            D.shingles_expr(F.col("text"), 3, 2), "word0 word1 word2"
        ).alias("has_first"),
    ).collect()[0]
    # 3000-token period -> every trigram repeats; distinct = 3000
    assert sh["n"] == 3000 and sh["has_first"]


def test_shingles_randomized_python_parity(spark):
    """The zip_with shingle construction equals the python twin
    (py_tokenize n-grams) over 200 seeded-random docs spanning the edge
    shapes: empty, < n tokens, exactly n tokens, unicode/JP text, long
    runs, varied n."""
    import random

    rng = random.Random(20260817)
    vocab = ["spark", "索引", "index", "ほげ", "a1", "xx", "データ",
             "merge", "shuffle", "圧縮", "b2c3", "ワード"]
    docs = []
    for i in range(200):
        k = rng.choice([0, 1, 2, 3, 4, 5, 8, 20, 100])
        words = [rng.choice(vocab) for _ in range(k)]
        sep = rng.choice([" ", "  ", "\t", "\n", "、", " 　"])
        docs.append((i, sep.join(words)))
    for n in (2, 3, 5):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: set(r["sh"])
            for r in df.select(
                "doc_id", D.shingles_expr(F.col("text"), n).alias("sh")
            ).collect()
        }
        for i, text in docs:
            assert got[i] == _shingles(text, n), (n, i, text)


def _py_drop_spans(rows, n):
    """Brute-force twin of drop_duplicated_spans over py_tokenize."""
    toks = {d: py_tokenize(t) for d, t in rows}
    occ: dict = {}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - n + 1):
            occ.setdefault(tuple(tk[p:p + n]), []).append((d, p))
    removed = {d: set() for d, _ in rows}
    for occs in occ.values():
        if len(occs) < 2:
            continue
        for d, p in sorted(occs)[1:]:
            removed[d].update(range(p, p + n))
    return {
        d: (" ".join(t for i, t in enumerate(tk) if i not in removed[d]),
            len(removed[d]))
        for d, tk in toks.items()
    }


def test_drop_duplicated_spans(spark):
    """Lee-et-al exact span dedup: the globally-first occurrence of a
    repeated n-token span survives, every later occurrence's tokens are
    removed (cross-doc AND within-doc), untouched docs keep their full
    token stream. Hand pins + a seeded-random python-twin sweep."""
    shared = " ".join(f"boiler{i}" for i in range(12))
    rows = [
        ("a", "alpha unique one " + shared + " tail aaa bbb"),
        ("b", "beta other words " + shared + " different end here"),
        ("c", "no shared content at all in this document body"),
        ("d", shared + " " + shared),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: (r.text, r.n_tokens_removed)
           for r in D.drop_duplicated_spans(docs, n=10).collect()}
    assert got["a"][1] == 0 and "boiler0" in got["a"][0]  # first kept
    assert got["b"] == ("beta other words different end here", 12)
    assert got["c"][1] == 0
    assert got["d"] == ("", 24)  # both copies are non-first (a owns it)
    # detection surface: rank-1 rows name doc a as the keeper
    dup = D.duplicated_spans(docs, n=10)
    keepers = {r.doc_id for r in dup.filter(F.col("rank") == 1).collect()}
    assert keepers == {"a"}
    # short docs (< n tokens) produce no spans and pass through
    tiny = spark.createDataFrame([("t", "few words only")],
                                 "doc_id string, text string")
    t = D.drop_duplicated_spans(tiny, n=10).collect()[0]
    assert t.text == "few words only" and t.n_tokens_removed == 0

    # seeded-random sweep vs the python twin (natural repeats from a
    # tiny vocabulary; n=3)
    import random

    rng = random.Random(99)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rrows = [(f"r{i:02d}", " ".join(rng.choice(vocab) for _ in
                                    range(rng.randint(0, 40))))
             for i in range(40)]
    rdocs = spark.createDataFrame(rrows, "doc_id string, text string")
    got = {r.doc_id: (r.text, r.n_tokens_removed)
           for r in D.drop_duplicated_spans(rdocs, n=3).collect()}
    exp = _py_drop_spans(rrows, 3)
    assert got == exp


def test_drop_duplicated_spans_hot_span(spark):
    """Skew shape (VERDICT r6 #2): ONE boilerplate span shared by
    every document — the 100 TB license-header/template case. The
    aggregation-shaped drop path must still keep exactly the
    (doc_id, pos)-first occurrence and strip every other copy,
    including many occurrences inside one document."""
    shared = " ".join(f"lic{i}" for i in range(6))
    rows = [("d000", f"{shared} unique head")] + [
        # every later doc carries the span TWICE plus its own tail
        (f"d{i:03d}", f"{shared} mid{i} {shared} tail{i} extra{i}")
        for i in range(1, 200)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: (r.text, r.n_tokens_removed)
           for r in D.drop_duplicated_spans(docs, n=6).collect()}
    assert got["d000"] == (f"{shared} unique head", 0)
    for i in range(1, 200):
        assert got[f"d{i:03d}"] == (f"mid{i} tail{i} extra{i}", 12), i
    # python-twin cross-check on a slice (same brute-force oracle as
    # the randomized sweep)
    exp = _py_drop_spans(rows[:20], 6)
    assert {d: got[d] for d in exp} == exp


def test_span_store_compact_and_crash_recovery(spark, tmp_path):
    """span_store_compact folds committed batch dirs into one batch=0
    with identical lookup results; the between-renames crash window
    (no dir at the live path) self-heals via _recover_swap on the next
    filter or compact, like the minhash/IVF compactors."""
    import os

    sp = str(tmp_path / "spans")
    boiler = " ".join(f"sb{i}" for i in range(10))
    b1 = spark.createDataFrame(
        [("a", "one " + boiler + " tail")], "doc_id string, text string")
    b2 = spark.createDataFrame(
        [("b", "two " + boiler + " end")], "doc_id string, text string")
    D.span_filter_and_append(b1, sp, 8, batch_id=1).collect()
    D.span_filter_and_append(b2, sp, 8, batch_id=2).collect()

    probe = spark.createDataFrame(
        [("p", "probe " + boiler + " zz")], "doc_id string, text string")

    def run_probe():
        return sorted(map(tuple, D.span_filter_and_append(
            probe, sp, 8, batch_id=10).select(
            "doc_id", "text", "n_tokens_removed").collect()))

    before = run_probe()
    assert before[0][2] >= 10  # store-known boiler removed
    os.path.isdir(f"{sp}/batch=10") and __import__("shutil").rmtree(
        f"{sp}/batch=10")  # drop the probe's own append between runs

    D.span_store_compact(spark, sp)
    dirs = [d for d in os.listdir(sp) if d.startswith("batch=")]
    assert dirs == ["batch=0"], dirs
    assert run_probe() == before

    # crash window: complete compacting dir written, live renamed away,
    # second rename never happened — the next filter call rolls forward
    import shutil

    shutil.rmtree(f"{sp}/batch=10", ignore_errors=True)
    spark.read.parquet(f"{sp}/batch=0").write.mode("overwrite").parquet(
        f"{sp}_compacting/batch=0")
    os.rename(sp, f"{sp}_old")
    assert not os.path.exists(sp)
    assert run_probe() == before
    assert os.path.isdir(sp)
    assert not os.path.exists(f"{sp}_old")
    assert not os.path.exists(f"{sp}_compacting")


def test_span_store_job_lifecycle(spark, tmp_path, monkeypatch, capsys):
    """jobs/span_store.py filter -> filter -> compact drive the span
    store through the spark-submit surface: the second batch loses the
    span the first batch owns; compact folds to batch=0."""
    import json
    import sys

    from oboyu_spark.jobs import span_store as J

    boiler = " ".join(f"jb{i}" for i in range(12))
    b1 = spark.createDataFrame(
        [("a", "owner one " + boiler + " tail")],
        "doc_id string, text string")
    b2 = spark.createDataFrame(
        [("b", "copy two " + boiler + " end")],
        "doc_id string, text string")
    st = str(tmp_path / "jobspans")
    p1, p2 = str(tmp_path / "b1_pq"), str(tmp_path / "b2_pq")
    o1, o2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    b1.write.parquet(p1)
    b2.write.parquet(p2)

    monkeypatch.setattr(sys, "argv", [
        "span_store.py", "filter", "--store", st, "--docs", p1,
        "--batch-id", "1", "--out", o1, "--n", "10",
    ])
    J.main()
    r1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r1["tokens_removed"] == 0 and r1["docs"] == 1

    monkeypatch.setattr(sys, "argv", [
        "span_store.py", "filter", "--store", st, "--docs", p2,
        "--batch-id", "2", "--out", o2, "--n", "10",
    ])
    J.main()
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r2["tokens_removed"] == 12
    txt = spark.read.parquet(o2).collect()[0]["text"]
    assert "jb0" not in txt and "copy two" in txt

    monkeypatch.setattr(sys, "argv", [
        "span_store.py", "compact", "--store", st,
    ])
    J.main()
    rc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc["batches"] == [0]
