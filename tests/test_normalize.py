"""Per-row invariant: the three normalizer implementations agree byte-for-byte."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from addressparser_spark.functions.normalize import (
    normalize_col,
    normalize_py,
    normalize_sql_duckdb,
)

CASES = [
    "Hello,  World!!",
    "ЁлКа ёжик\tснег",
    "  mixed   ПуНкТ.:a-b_c  123  ",
    "",
    "a",
    "прё-м №5 (дом) 12/3",
    "line1\nline2\r\nline3",
    "ALL CAPS ??? !!!",
    "unicode ümlaut ø emoji 🎉 done",
]


def test_python_normalizer_idempotent():
    for c in CASES:
        once = normalize_py(c)
        assert normalize_py(once) == once


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], ["text"])
    got = [r["n"] for r in df.select(normalize_col(F.col("text")).alias("n")).collect()]
    assert got == [normalize_py(c) for c in CASES]


def test_duckdb_matches_python():
    con = duckdb.connect()
    expr = normalize_sql_duckdb("text")
    got = [
        con.execute(f"SELECT {expr} FROM (SELECT ? AS text)", [c]).fetchone()[0]
        for c in CASES
    ]
    assert got == [normalize_py(c) for c in CASES]


def test_null_passthrough(spark):
    assert normalize_py(None) is None
    df = spark.createDataFrame([(None,)], "text string")
    assert df.select(normalize_col(F.col("text")).alias("n")).collect()[0]["n"] is None
