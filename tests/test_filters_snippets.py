"""Path/date filters (Q8/Q9) and snippet/highlight (Q11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oboyu_spark.operators.filters import apply_filters, glob_to_regex
from oboyu_spark.operators.snippets import py_snippet, with_snippets
from oboyu_spark.operators.termindex import corpus_stats


def test_glob_translation():
    assert glob_to_regex("*.md") == "^.*\\.md$"
    assert glob_to_regex("src?") == "^src.$"
    assert glob_to_regex("docs/*/x") == "^docs/.*/x$"


def test_apply_filters(spark):
    rows = [
        (1, "docs/a.md", "2025-01-01 10:00:00"),
        (2, "docs/b.txt", "2025-01-02 10:00:00"),
        (3, "src/c.md", "2025-01-03 10:00:00"),
        (4, "docs/sub/d.md", "2025-01-04 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, path string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    got = apply_filters(df, path_col="path", include=["docs/*"],
                        exclude=["*.txt"]).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [1, 4]
    got = apply_filters(df, ts_col="ts", start="2025-01-02 00:00:00",
                        end="2025-01-04 00:00:00").collect()
    assert sorted(r["doc_id"] for r in got) == [2, 3]


def test_corpus_stats(spark):
    rows = [(1, "en", "2025-01-01"), (2, "ja", "2025-02-01"),
            (3, "en", "2025-03-01"), (3, "en", "2025-03-01")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    r = corpus_stats(df, group_col="lang", ts_col="ts").collect()[0]
    assert r["n_rows"] == 4 and r["n_docs"] == 3
    assert r["groups"] == "en,ja"
    assert str(r["last_modified"]).startswith("2025-03-01")


def test_py_snippet():
    text = "aaa " * 50 + "the spark index engine " + "bbb " * 50
    s = py_snippet(text, ["spark", "engine"], length=60)
    assert "**spark**" in s and "**engine**" in s
    assert len(s) <= 60 + 8 * 4  # highlight markers add length
    # no terms → prefix
    assert py_snippet("hello world", []) == "hello world"
    # no match → prefix window
    assert py_snippet("hello world", ["zzz"], length=5) == "hello"
    # case-insensitive highlighting
    assert "**Spark**" in py_snippet("Spark rules", ["spark"])
    assert py_snippet("", ["x"]) == ""


def test_with_snippets(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "no match here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["snippet"]
            for r in with_snippets(df, ["quick", "fox"]).collect()}
    assert "**quick**" in rows[1] and "**fox**" in rows[1]
    assert rows[2] == "no match here"


def test_py_snippet_sentence_strategy():
    # EN: cut at the last ". " boundary inside the window
    text = ("The spark engine indexes documents. It scores them well. "
            "Trailing fragment without an end")
    s = py_snippet(text, ["spark"], length=80, highlight=False,
                   strategy="sentence")
    assert s.endswith("scores them well.")
    # JP: 。！？ endings take precedence when the window holds JP chars
    jtext = "検索の話です。索引を作ります！未完の断片"
    j = py_snippet(jtext, ["検索"], length=30, highlight=False,
                   strategy="sentence")
    assert j.endswith("！") and "未完" not in j
    # fallback: adjusted shorter than 50% of target → keep fixed window
    frag = "spark " + "a" * 100 + ". " + "b" * 200
    f = py_snippet(frag, ["spark"], length=40, highlight=False,
                   strategy="sentence")
    assert len(f) > 20  # did not collapse to a tiny sentence cut


def test_py_snippet_paragraph_strategy():
    text = ("First paragraph mentions spark and keeps going with plenty "
            "of words so the cut survives the 30% floor.\n\n"
            "Second paragraph continues. More filler text")
    s = py_snippet(text, ["spark"], length=120, highlight=False,
                   strategy="paragraph")
    assert s.endswith("30% floor.") and "Second" not in s
    # 30% fallback: a tiny leading paragraph keeps the sentence result
    tiny = "spark.\n\nSecond paragraph is long and informative enough."
    t = py_snippet(tiny, ["spark"], length=50, highlight=False,
                   strategy="paragraph")
    assert "Second" in t
    with pytest.raises(ValueError):
        py_snippet("x", ["x"], strategy="bogus")


def test_py_snippet_duplicate_terms_match_distinct():
    """Duplicate query tokens must not double-weight the density window
    (the DuckDB oracle scans per DISTINCT term)."""
    text = ("spark appears here twice spark and join shows up far away "
            + "x" * 200 + " join join join cluster")
    a = py_snippet(text, ["spark", "spark", "join"], length=60,
                   highlight=False)
    b = py_snippet(text, ["spark", "join"], length=60, highlight=False)
    assert a == b
