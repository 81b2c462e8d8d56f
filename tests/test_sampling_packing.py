"""Deterministic sampling + sequence packing (training-data ops)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from oboyu_spark.operators.packing import pack_sequences, sequence_fill_stats
from oboyu_spark.operators.sampling import (
    GATE_SPACE, deterministic_sample, stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ("word " * (5 + i % 40)).strip(),
             "en" if i % 3 else "ja") for i in range(1, 601)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _py_gate(doc_id, seed, salt="sample"):
    h = int(hashlib.md5(
        f"{doc_id}#{salt}#{seed}".encode()).hexdigest()[:8], 16)
    return h % GATE_SPACE


def test_deterministic_sample_membership_and_stability(spark, corpus):
    """Membership == the pure-python md5 gate, identical across
    repartitionings (the property df.sample() lacks), monotone in
    fraction, and roughly the asked rate."""
    frac, seed = 0.3, 7
    got = {r["doc_id"]
           for r in deterministic_sample(corpus, frac, seed).collect()}
    exp = {i for i in range(1, 601)
           if _py_gate(i, seed) < int(frac * GATE_SPACE)}
    assert got == exp
    re7 = {r["doc_id"] for r in deterministic_sample(
        corpus.repartition(7), frac, seed).collect()}
    re1 = {r["doc_id"] for r in deterministic_sample(
        corpus.coalesce(1), frac, seed).collect()}
    assert got == re7 == re1
    assert 0.2 < len(got) / 600 < 0.4
    # monotone: smaller fraction is a SUBSET at the same seed
    small = {r["doc_id"]
             for r in deterministic_sample(corpus, 0.1, seed).collect()}
    assert small <= got
    # xxh64 fast path: stable and similar rate (different membership)
    x1 = {r["doc_id"] for r in deterministic_sample(
        corpus, frac, seed, hash_mode="xxh64").collect()}
    x2 = {r["doc_id"] for r in deterministic_sample(
        corpus.repartition(5), frac, seed, hash_mode="xxh64").collect()}
    assert x1 == x2 and 0.2 < len(x1) / 600 < 0.4


def test_deterministic_sample_duckdb_twin(spark, corpus):
    """The md5 gate is exactly reproducible in DuckDB — the same
    oracle-parity contract as the dedup family's hashes (cell-exact
    membership, not just similar rates)."""
    import duckdb

    frac, seed = 0.25, 9
    got = sorted(r["doc_id"] for r in
                 deterministic_sample(corpus, frac, seed).collect())
    pdf = corpus.select("doc_id").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    cut = int(frac * GATE_SPACE)
    exp = [r[0] for r in con.sql(f"""
        SELECT doc_id FROM docs
        WHERE ('0x' || substr(md5(doc_id::VARCHAR || '#sample#{seed}'),
               1, 8))::UBIGINT % {GATE_SPACE} < {cut}
        ORDER BY doc_id""").fetchall()]
    assert got == exp


def test_stratified_sample(spark, corpus):
    """Per-stratum cuts: keep all ja, 20% of en; unlisted strata use
    the default (0 → dropped)."""
    got = stratified_sample(corpus, {"ja": 1.0, "en": 0.2},
                            strata_col="lang", seed=3).collect()
    ja = [r for r in got if r["lang"] == "ja"]
    en = [r for r in got if r["lang"] == "en"]
    assert len(ja) == 200  # every ja row survives
    assert 0.1 < len(en) / 400 < 0.3
    en_ids = {r["doc_id"] for r in en}
    exp_en = {i for i in range(1, 601) if i % 3
              and _py_gate(i, 3, salt="strat") < int(0.2 * GATE_SPACE)}
    assert en_ids == exp_en
    none = stratified_sample(corpus, {"ja": 0.5}, strata_col="lang",
                             seed=3).collect()
    assert all(r["lang"] == "ja" for r in none)  # en fell to default 0


def test_sampling_composition_decorrelated(spark, corpus):
    """ADVICE r5 #4: chaining deterministic_sample → stratified_sample
    at the SAME seed thins multiplicatively (independent salted gates),
    instead of the old fully-correlated behavior where a stratum cut ≥
    the pre-sample fraction kept 100% of the survivors."""
    seed = 11
    pre = deterministic_sample(corpus, 0.5, seed)
    out = stratified_sample(pre, {"en": 0.5, "ja": 0.5},
                            strata_col="lang", seed=seed)
    n_pre, n_out = pre.count(), out.count()
    # correlated gates would keep ALL of pre (cut == fraction); the
    # salted gates keep ~ half of it
    assert 0.35 < n_out / n_pre < 0.65
    # and SAME-operator composition stays monotone (subset property)
    a = {r["doc_id"] for r in
         deterministic_sample(corpus, 0.1, seed).collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(corpus, 0.5, seed).collect()}
    assert a <= b
    # explicit same-salt opt-in restores correlation across operators
    corr = stratified_sample(pre, {"en": 0.5, "ja": 0.5},
                             strata_col="lang", seed=seed, salt="sample")
    assert corr.count() == n_pre


def test_pack_sequences_split_tiles_exactly(spark, corpus):
    """Concat-and-split mode: within every bucket the doc spans tile
    the token stream with no gaps/overlaps, and the arithmetic
    (seq_first/seq_last/offset) matches a python re-derivation."""
    budget = 97
    packed = pack_sequences(corpus, budget, n_buckets=4).collect()
    by_bucket: dict[int, list] = {}
    for r in packed:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert sum(len(v) for v in by_bucket.values()) == 600
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: r["doc_id"])
        csum = 0
        for r in rows:
            assert r["seq_first"] == csum // budget, r
            assert r["offset"] == csum % budget, r
            csum += r["n_tokens"]
            assert r["seq_last"] == (csum - 1) // budget, r
    stats = {r["bucket"]: r for r in
             sequence_fill_stats(
                 spark.createDataFrame(packed), budget).collect()}
    # split mode fills every sequence but the bucket's last one
    for bucket, rows in by_bucket.items():
        total = sum(r["n_tokens"] for r in rows)
        nseq = stats[bucket]["n_sequences"]
        assert nseq == (total + budget - 1) // budget
        assert stats[bucket]["fill_ratio"] > 0.9


def test_pack_sequences_greedy_respects_budget(spark, corpus):
    """Greedy no-split mode: every sequence total ≤ budget (no doc in
    this corpus exceeds it), ids pack in order, and an oversized doc
    still gets its own sequence."""
    budget = 120
    packed = pack_sequences(corpus, budget, n_buckets=4,
                            split=False).collect()
    assert len(packed) == 600
    totals: dict[tuple, int] = {}
    seq_of: dict[tuple, list] = {}
    for r in packed:
        key = (r["bucket"], r["seq_id"])
        totals[key] = totals.get(key, 0) + r["n_tokens"]
        seq_of.setdefault(r["bucket"], []).append((r["doc_id"], r["seq_id"]))
    assert all(t <= budget for t in totals.values())
    for rows in seq_of.values():  # seq_id non-decreasing in id order
        rows.sort()
        seqs = [s for _, s in rows]
        assert seqs == sorted(seqs)
    # oversized doc → its own sequence, nothing else joins it
    big = spark.createDataFrame(
        [(1, "tok " * 50), (2, "tok " * 500), (3, "tok " * 50)],
        "doc_id long, text string")
    bp = pack_sequences(big, budget=100, n_buckets=1, split=False,
                        min_token_length=1).collect()
    seq_by_id = {r["doc_id"]: r["seq_id"] for r in bp}
    assert seq_by_id[2] not in {v for k, v in seq_by_id.items() if k != 2}


def test_pack_sequences_bucket_enforcement_and_md5_mode(spark, corpus):
    """VERDICT r5 #3: bucket sizing is enforced — greedy mode raises
    on a bucket above max_bucket_rows instead of silently OOM-ing;
    n_buckets=None auto-derives the count. And bucket_hash_mode='md5'
    reproduces the bucket assignment in pure python (oracle parity)."""
    with pytest.raises(Exception, match="max_bucket_rows"):
        pack_sequences(corpus, 100, n_buckets=1, split=False,
                       max_bucket_rows=100).collect()
    # split mode has no per-bucket frame — the same corpus passes
    assert pack_sequences(corpus, 100, n_buckets=1,
                          max_bucket_rows=100).count() == 600
    # n_buckets=None ≈ rows / rows_per_bucket buckets
    auto = pack_sequences(corpus, 100, n_buckets=None, rows_per_bucket=100)
    assert auto.select("bucket").distinct().count() == 6
    got = {(r["doc_id"], r["bucket"]) for r in
           pack_sequences(corpus, 100, n_buckets=4,
                          bucket_hash_mode="md5").collect()}
    exp = {(i, int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 4)
           for i in range(1, 601)}
    assert {d: b for d, b in got} == {d: b for d, b in exp}
    with pytest.raises(ValueError, match="bucket_hash_mode"):
        pack_sequences(corpus, 100, bucket_hash_mode="sha9").count()


def test_pack_sequences_precomputed_token_col(spark):
    """token_col= skips tokenization (the chunker already counted)."""
    df = spark.createDataFrame(
        [(1, 40), (2, 40), (3, 40)], "doc_id long, n_tok long")
    packed = pack_sequences(df, budget=100, n_buckets=1,
                            token_col="n_tok", split=False).collect()
    seqs = {r["doc_id"]: r["seq_id"] for r in packed}
    assert seqs[1] == seqs[2] and seqs[3] != seqs[1]
