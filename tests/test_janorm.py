"""Lib-free JP normalization lite tier (reference N1-N3 fallback):
pinned against the reference's own normalization test fixtures
(/root/reference/tests/crawler/test_japanese.py:35-57 and
tests/crawler/services/test_encoding_detector.py:163) — the assertions
below restate those tests literally."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from oboyu_spark.functions.janorm import (
    ja_normalize_lite_udf,
    py_ja_normalize_lite,
    zen_to_han_expr,
)


def test_reference_fixture_fullwidth_and_line_endings():
    # test_japanese.py:35-42
    out = py_ja_normalize_lite("１２３４５ ＡＢＣ　テスト\r\nテスト")
    assert "12345" in out
    assert "ABC" in out
    assert "　テスト" not in out
    assert "\r\n" not in out


def test_reference_fixture_width_conversion():
    # test_japanese.py:49-52
    assert "ABC 123" in py_ja_normalize_lite("ＡＢＣ　１２３")


def test_reference_fixture_wave_dash_removed():
    # test_japanese.py:54-57 — neologdn removes wave dash/tilde chars
    assert py_ja_normalize_lite("テスト～テスト") == "テストテスト"
    assert py_ja_normalize_lite("テスト〜テスト") == "テストテスト"


def test_reference_fixture_excess_newlines():
    # test_encoding_detector.py:163-170
    out = py_ja_normalize_lite("全角数字１２３\r\n\r\n\r\n全角英字ＡＢＣ\r\n日本語テキスト")
    assert "\n\n\n" not in out and "\r\n" not in out
    assert "123" in out and "ABC" in out


def test_prolonged_sound_run_collapse():
    assert py_ja_normalize_lite("スーーーパーー") == "スーパー"
    assert py_ja_normalize_lite("スーパー") == "スーパー"  # single kept


def test_halfwidth_kana_folds_to_fullwidth():
    # NFKC (like neologdn's NFKC pass) folds half-width kana
    assert py_ja_normalize_lite("ｶﾀｶﾅ") == "カタカナ"


def test_zen_to_han_expr_matches_nfkc_width_slice(spark):
    """The JVM translate fast path must agree with python NFKC on the
    pure width-conversion domain (full-width ASCII/digits + ideographic
    space; kana untouched by both mojimoji(kana=False) and translate)."""
    rows = [
        (1, "ＡＢＣ　１２３"),
        (2, "ｘｙｚ！？（）＋－＝"),
        (3, "mixed ＷＩＤＴＨ ４２ and ascii"),
        (4, "カタカナはそのまま１０割"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["out"] for r in
           df.select("id", zen_to_han_expr(F.col("text")).alias("out")).collect()}
    for i, t in rows:
        exp = "".join(
            unicodedata.normalize("NFKC", ch)
            if ("！" <= ch <= "～" or ch == "　") else ch
            for ch in t
        )
        assert got[i] == exp, (i, got[i], exp)


def test_lite_udf_matches_python_twin(spark):
    rows = [
        (1, "１２３４５ ＡＢＣ　テスト\r\nテスト"),
        (2, "テスト～テスト〰"),
        (3, "スーーパーー\n\n\n\nok"),
        (4, None),
        (5, "plain ascii stays"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["out"] for r in
           df.select("id", ja_normalize_lite_udf()(F.col("text")).alias("out"))
           .collect()}
    for i, t in rows:
        assert got[i] == py_ja_normalize_lite(t), i


def test_zen_to_han_expr_matches_python_translate(spark):
    """The JVM translate fast path folds full-width ASCII/digits (and
    the ideographic space) exactly like a python str.translate over the
    same tables — kana untouched (mojimoji zen_to_han(kana=False))."""
    from pyspark.sql import functions as F

    from oboyu_spark.functions.janorm import _HAN_ASCII, _ZEN_ASCII, zen_to_han_expr

    cases = [
        "１２３ＡＢＣ！？",          # digits + letters + punctuation
        "ｈｅｌｌｏ　ｗｏｒｌｄ",     # ideographic space
        "カタカナはそのまま１",      # kana untouched, digit folded
        "", "mixed ＡscｉiＺ９",
    ]
    table = str.maketrans("　" + _ZEN_ASCII, " " + _HAN_ASCII)
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "i long, t string")
    got = {r["i"]: r["o"] for r in
           df.select("i", zen_to_han_expr(F.col("t")).alias("o")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == c.translate(table), c
    assert got[0] == "123ABC!?"
    assert got[2] == "カタカナはそのまま1"
