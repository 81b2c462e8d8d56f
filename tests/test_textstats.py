"""Text-analysis operators: language ID, quality, counts, fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from oboyu_spark.operators.textstats import text_profile

ROWS = [
    (1, "The quick brown fox jumps over the lazy dog."),
    (2, "日本語のテキストです。形態素解析を行います。"),
    (3, "mixed 日本語 and english テキスト with 数字 123"),
    (4, ""),
    (5, "!!! ??? ... ###"),
    (6, "word " * 200),
]


def test_text_profile(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    prof = {r["doc_id"]: r for r in text_profile(docs).collect()}

    assert prof[1]["lang"] == "en"
    assert prof[2]["lang"] == "ja"
    assert prof[4]["lang"] == "und"
    assert prof[4]["n_tokens"] == 0
    assert prof[1]["n_words"] == 9
    assert prof[5]["punct_ratio"] > 0.5
    assert prof[5]["quality"] < prof[1]["quality"]
    assert prof[6]["quality"] > prof[4]["quality"]
    # en stopwords present in doc 1
    assert prof[1]["stopword_ratio"] > 0
    # fingerprint: stable + whitespace-normalization-invariant
    docs2 = spark.createDataFrame(
        [(1, "The  quick\tbrown fox   jumps over the lazy dog.")],
        "doc_id long, text string",
    )
    fp2 = text_profile(docs2).collect()[0]["fingerprint"]
    assert fp2 == prof[1]["fingerprint"]


def test_word_count_nbsp_matches_oracle_class(spark):
    """NBSP (\\u00a0) and ideographic space (\\u3000) are word
    separators on BOTH sides (engine class comes from _WS_CLASS_JAVA;
    oracle WS_RE2 includes them) — a latent driver hash mismatch if
    they ever diverge."""
    docs = spark.createDataFrame(
        [(1, "one two　three four")], "doc_id long, text string"
    )
    assert text_profile(docs).collect()[0]["n_words"] == 4


def test_unigram_logprob_scores(spark):
    """Corpus-trained unigram mean log-likelihood: brute-force python
    twin; a gibberish (all-rare-token) doc scores far below docs made
    of corpus-common tokens, and empty docs are excluded."""
    import math

    import pytest

    from oboyu_spark.functions.text import py_tokenize
    from oboyu_spark.operators.textstats import unigram_logprob_scores

    rows = [
        (1, "spark query spark query spark join"),
        (2, "spark query join table"),
        (3, "zzqx wvrk bbnp qqrs"),  # gibberish: every token unique
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
           for r in unigram_logprob_scores(docs).collect()}
    # python twin
    toks = {d: py_tokenize(t) for d, t in rows}
    from collections import Counter
    cf = Counter(t for ts in toks.values() for t in ts)
    total = sum(cf.values())
    for d, ts in toks.items():
        if not ts:
            assert d not in got
            continue
        exp = sum(math.log(cf[t] / total) for t in ts) / len(ts)
        assert got[d][0] == len(ts)
        assert got[d][1] == pytest.approx(exp, rel=1e-12)
    assert got[3][1] < got[1][1]  # gibberish scores lower


def test_top_terms_per_doc(spark):
    """tf-idf keyword extraction: rare distinguishing terms outrank
    corpus-common ones; k bound and deterministic tie-break hold."""
    from oboyu_spark.operators.textstats import top_terms_per_doc

    rows = [
        (1, "spark spark spark quantum flux"),
        (2, "spark table join query engine"),
        (3, "spark table join query engine"),
        (4, "spark table join query engine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in top_terms_per_doc(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    for d in got:
        got[d] = [t for _, t in sorted(got[d])]
        assert len(got[d]) <= 2
    # doc 1's distinguishing rare terms beat 'spark' (df=4 of 4 ->
    # strongly negative idf) despite tf=3
    assert set(got[1]) == {"quantum", "flux"}


def test_discover_stopwords_feeds_tokenizer(spark):
    """The discovered list plugs into term_frequencies(stop_words=...):
    terms above the df-ratio cut are found, and feeding them back
    removes exactly those terms from the tf rows."""
    from oboyu_spark.operators.termindex import term_frequencies
    from oboyu_spark.operators.textstats import discover_stopwords

    rows = [(i, f"common filler unique{i:02d}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sw = discover_stopwords(docs, max_df_ratio=0.5).collect()
    found = {r["term"] for r in sw}
    assert found == {"common", "filler"}
    assert all(r["df_ratio"] == 1.0 for r in sw)
    tf = term_frequencies(docs, stop_words=found)
    terms = {r["term"] for r in tf.collect()}
    assert terms.isdisjoint(found) and len(terms) == 10
