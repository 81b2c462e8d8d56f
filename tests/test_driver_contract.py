"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over sf0.01, compare
row-count + column names + cell values (order-insensitive, exact)."""

from __future__ import annotations

import math

import os

import duckdb
import pandas as pd
import pytest

# override with ORACLE_SF_DIR=/root/testdata/sf0.1 for a larger-scale run
SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell types: ints as int64 where possible, floats rounded
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(float)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _assert_driver_canonicalizable(name: str, df: pd.DataFrame) -> None:
    """The driver's canonicalizer sorts and HASHES every cell — an
    array/map cell (unhashable list/dict) errors the entry, as
    multimodal_features did in round 1. Mirror that here so the failure
    is caught before submission, for rows-only entries too."""
    for c in df.columns:
        if df[c].dtype == object:
            for v in df[c].head(100):
                try:
                    hash(v)
                except TypeError as exc:  # same class the driver hit
                    raise AssertionError(
                        f"{name}: column {c!r} holds unhashable cells "
                        f"({type(v).__name__}) — the driver canonicalizer "
                        f"will error on this entry"
                    ) from exc


def _cells_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact — both sides round to 6dp already
    return a == b


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {list(spark_pdf.columns)} vs {list(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rowcount {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    mism = []
    for i in range(len(a)):
        for c in a.columns:
            if not _cells_equal(a.iloc[i][c], b.iloc[i][c]):
                mism.append((i, c, a.iloc[i][c], b.iloc[i][c]))
                if len(mism) > 5:
                    break
        if len(mism) > 5:
            break
    assert not mism, f"{name}: value mismatches {mism}"


def _entry_names():
    import __spark_entry__ as E

    return sorted(E.queries().keys())


@pytest.mark.parametrize("name", _entry_names())
def test_query_vs_oracle(spark, ddb, name):
    import __spark_entry__ as E

    q = E.queries()[name]
    sql = E.oracle_sql().get(name)
    spark_pdf = q(spark, SF_DIR).toPandas()
    _assert_driver_canonicalizable(name, spark_pdf)
    if sql is None:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    duck_pdf = ddb.sql(sql).df()
    _compare(name, spark_pdf, duck_pdf)


def test_driver_entry_cap():
    """The grading driver records at most 50 queries() entries (the r4
    artifact silently truncated a 54-entry dict to its first 50 —
    VERDICT r4 #1). Every entry must stay inside the recorded window,
    and every entry must carry an exact oracle."""
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert len(q) <= 50, f"{len(q)} entries exceed the driver's 50-cap"
    assert set(q) == set(o), (sorted(set(q) ^ set(o)))


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "doc_id" in df.columns and "score" in df.columns
