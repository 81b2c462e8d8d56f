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


def test_repetition_stats(spark):
    """Gopher-style repetition lens: hand-computed pins on planted
    repetition plus an exact DuckDB twin over a mixed corpus
    (including sf0.01 documents) — the same rigor as the driver gate,
    enforced locally since the 50-entry registry is full."""
    import duckdb

    from oboyu_spark.operators.textstats import repetition_stats
    from oboyu_spark.plans.oracle_sql import WS_RE2

    rows = [
        (1, "alpha beta\nalpha beta\ngamma delta"),       # 1 dup line of 3
        (2, "no repeats here\nat all today"),
        (3, "spam spam spam spam spam"),                  # one bigram rules
        (4, ""),
        (5, "single"),
        (6, "a b\r\na b\r\n\r\n  \r\nc d"),               # CRLF + blank lines
        (7, "x y x y x y z w"),                           # top bigram "x y" x3... and "y x" x2
        (8, "line one\nline one\nline one\nline two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}

    assert got[1]["n_lines"] == 3
    assert got[1]["dup_line_frac"] == round(1 / 3, 6)
    # "alpha beta" = 10 chars x2, "gamma delta" = 11 -> dup 10 of 31
    assert got[1]["dup_line_char_frac"] == round(10 / 31, 6)
    assert got[2]["dup_line_frac"] == 0.0
    # doc 3: bigrams = 4x "spam spam" -> top fraction 1.0
    assert got[3]["top_bigram_frac"] == 1.0
    assert got[4] == (4, 0, 0.0, 0.0, 0.0) or got[4]["n_lines"] == 0
    assert got[5]["n_lines"] == 1 and got[5]["top_bigram_frac"] == 0.0
    assert got[6]["n_lines"] == 3  # blank/whitespace-only lines dropped
    assert got[6]["dup_line_frac"] == round(1 / 3, 6)
    # doc 7: 7 bigram slots, "x y" appears 3 times
    assert got[7]["top_bigram_frac"] == round(3 / 7, 6)
    assert got[8]["dup_line_frac"] == round(2 / 4, 6)

    # exact DuckDB twin over planted rows + real sf0.01 documents
    sf_docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        # shift ids out of the planted 1-8 range — a doc_id collision
        # makes the sorted row-by-row comparison order-ambiguous
        .select((F.col("doc_id").cast("long") + 1_000_000).alias("doc_id"),
                "text")
        .limit(300)
    )
    both = docs.unionByName(sf_docs)
    spark_pdf = (
        repetition_stats(both).toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("docs_in", both.toPandas())
    twin = f"""
    WITH L AS (
      SELECT doc_id,
             list_filter(list_transform(string_split_regex(text, '\\r?\\n'),
                                        x -> trim(x)),
                         x -> length(x) > 0) AS lines,
             list_filter(string_split_regex(text, '{WS_RE2}+'),
                         x -> length(x) > 0) AS w
      FROM docs_in
    ), M AS (
      SELECT doc_id, lines, w,
             len(lines) AS n_lines,
             len(list_distinct(lines)) AS n_dl,
             coalesce(list_sum(list_transform(lines, x -> length(x))), 0) AS lc,
             coalesce(list_sum(list_transform(list_distinct(lines),
                                              x -> length(x))), 0) AS dc,
             CASE WHEN len(w) >= 2
                  THEN list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i + 1])
                  ELSE CAST([] AS VARCHAR[]) END AS bg
      FROM L
    )
    SELECT doc_id,
           CAST(n_lines AS INT) AS n_lines,
           round(CASE WHEN n_lines = 0 THEN 0.0
                 ELSE (n_lines - n_dl) / CAST(n_lines AS DOUBLE) END, 6)
             AS dup_line_frac,
           round(CASE WHEN lc = 0 THEN 0.0
                 ELSE (lc - dc) / CAST(lc AS DOUBLE) END, 6)
             AS dup_line_char_frac,
           round(CASE WHEN len(bg) = 0 THEN 0.0
                 ELSE list_max(list_transform(list_distinct(bg),
                        x -> len(list_filter(bg, y -> y = x))))
                      / CAST(len(bg) AS DOUBLE) END, 6)
             AS top_bigram_frac
    FROM M ORDER BY doc_id
    """
    duck_pdf = con.sql(twin).df()
    assert len(spark_pdf) == len(duck_pdf)
    for col in ["n_lines", "dup_line_frac", "dup_line_char_frac",
                "top_bigram_frac"]:
        assert list(spark_pdf[col]) == list(duck_pdf[col]), col


def test_pii_redaction(spark):
    """PII scrub: emails/IPv4/phones/SSNs masked, credit cards
    Luhn-CHECKED then masked, counts exact, and the pattern strings +
    checksum behave IDENTICALLY in DuckDB (RE2) — pinned over planted
    PII plus real sf0.01 documents."""
    import duckdb

    from oboyu_spark.operators.textstats import pii_stats
    from oboyu_spark.plans.oracle_sql import pii_stats_sql

    rows = [
        (1, "contact me at jane.doe+spam@example.co.jp or call "
            "555-123-4567 today"),
        (2, "server at 10.0.255.3 and backup at 192.168.1.1 ok"),
        (3, "intl +81345678901 and email a@b.io and ip 1.2.3.4"),
        (4, "nothing sensitive here, just 3.14 and v1.2 and a@ b"),
        (5, ""),
        (6, "ssn 123-45-6789 on file"),
        # Luhn-valid visa (plain + separated) and amex; the 16-digit
        # run in doc 9 FAILS the checksum and must survive unmasked
        (7, "card 4111111111111111 exp 12/28"),
        (8, "pay 4111-1111-1111-1111 or 378282246310005 now"),
        (9, "order id 1234567890123456 is not a card"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (got[1]["n_email"], got[1]["n_phone"]) == (1, 1)
    assert "<EMAIL>" in got[1]["redacted_text"]
    assert "<PHONE>" in got[1]["redacted_text"]
    assert "jane.doe" not in got[1]["redacted_text"]
    assert got[2]["n_ipv4"] == 2
    assert got[2]["redacted_text"].count("<IPV4>") == 2
    assert (got[3]["n_email"], got[3]["n_ipv4"], got[3]["n_phone"]) \
        == (1, 1, 1)
    # version strings / floats / malformed emails are NOT matched
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) \
        == (0, 0, 0)
    assert got[4]["redacted_text"] == rows[3][1]
    assert got[6]["n_ssn"] == 1 and "<SSN>" in got[6]["redacted_text"]
    assert "123-45-6789" not in got[6]["redacted_text"]
    assert got[7]["n_credit_card"] == 1
    assert got[7]["redacted_text"] == "card <CREDIT_CARD> exp 12/28"
    assert got[8]["n_credit_card"] == 2
    assert got[8]["redacted_text"] == "pay <CREDIT_CARD> or " \
                                      "<CREDIT_CARD> now"
    # Luhn-invalid 16-digit run: counted 0, text untouched
    assert got[9]["n_credit_card"] == 0
    assert got[9]["redacted_text"] == rows[8][1]

    # cross-engine twin: identical counts + redacted text in DuckDB
    # (the SAME SQL the driver runs — pii_stats_sql over a view)
    sf_docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select((F.col("doc_id").cast("long") + 1_000_000).alias("doc_id"),
                "text")
        .limit(200)
    )
    both = docs.unionByName(sf_docs)
    spark_pdf = pii_stats(both).toPandas().sort_values(
        "doc_id", ignore_index=True)
    con = duckdb.connect()
    con.register("docs_in", both.toPandas())
    duck_pdf = con.sql(
        pii_stats_sql(table="docs_in") + " ORDER BY doc_id"
    ).df()
    for col in ["n_email", "n_ipv4", "n_phone", "n_ssn",
                "n_credit_card", "redacted_text"]:
        assert list(spark_pdf[col]) == list(duck_pdf[col]), col
