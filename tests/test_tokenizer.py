"""Tokenizer parity: py_tokenize == tokens_expr == tokenize_udf, and all
three == the reference FallbackTokenizer (imported read-only from
/root/reference for behavioral comparison — no code copied)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

from oboyu_spark.functions.text import (
    py_normalize_text,
    py_tokenize,
    tokenize_udf,
    tokens_expr,
)

CASES = [
    "Python programming language Python",
    "Pythonで日本語のNLP処理を行います。",
    "ＰＹＴＨＯＮプログラミング",
    "a b c",
    "",
    "machine  learning\r\nPython TensorFlow",
    "カタカナとひらがなと漢字MIXED123tokens",
    "x1 y2 zz 99 Q",
    "日本語　の　全角　スペース",
    "line1\nline2\n\n\n\nline3\ttab",
]


def _reference_tokenizer():
    sys.path.insert(0, "/root/reference/src")
    try:
        from oboyu.common.services.tokenizer import FallbackTokenizer

        return FallbackTokenizer(stop_words=set(), min_token_length=2)
    except Exception:
        return None
    finally:
        sys.path.remove("/root/reference/src")


def test_pinned_fixtures():
    assert py_tokenize("Python programming language Python") == [
        "python",
        "programming",
        "language",
        "python",
    ]
    assert py_tokenize("a b c") == []
    assert py_tokenize("") == []
    assert py_tokenize(None) == []
    # mixed-script Japanese: one token per contiguous JP-script run
    assert py_tokenize("Pythonで日本語のNLP処理を行います。") == [
        "python",
        "で日本語の",
        "nlp",
        "処理を行います",
    ]


def test_reference_parity():
    ref = _reference_tokenizer()
    if ref is None:
        pytest.skip("reference tokenizer not importable")
    for text in CASES:
        assert py_tokenize(text) == ref.tokenize(text), text
    # term frequencies too
    from oboyu_spark.functions.text import py_term_frequencies

    for text in CASES:
        assert py_term_frequencies(text) == ref.get_term_frequencies(text), text


def test_stopwords_and_minlen():
    assert py_tokenize("python java python", stop_words={"java"}) == [
        "python",
        "python",
    ]
    assert py_tokenize("abc de f", min_token_length=3) == ["abc"]


def test_normalize():
    assert py_normalize_text("  a\r\n b\t\tc　 ") == "a b c"
    assert py_normalize_text(None) == ""
    assert py_normalize_text("") == ""


def test_spark_expr_and_udf_parity(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "id int, text string")
    out = (
        df.select(
            "id",
            tokens_expr(F.col("text")).alias("jvm"),
            tokenize_udf()(F.col("text")).alias("arrow"),
        )
        .orderBy("id")
        .collect()
    )
    for row in out:
        expected = py_tokenize(CASES[row["id"]])
        assert list(row["jvm"]) == expected, CASES[row["id"]]
        assert list(row["arrow"]) == expected, CASES[row["id"]]


def test_spark_normalize_parity(spark):
    from oboyu_spark.functions.text import normalize_text_expr

    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "id int, text string")
    rows = df.select("id", normalize_text_expr(F.col("text")).alias("n")).orderBy("id").collect()
    for row in rows:
        assert row["n"] == py_normalize_text(CASES[row["id"]])
