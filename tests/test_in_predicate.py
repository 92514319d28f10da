"""Edge-case gate for table._in_predicate (ADVICE r11): the SQL-text
IN rendering must return exactly what isin returns for EVERY input —
including strings with quotes/backslashes under the legacy parser
config, int/float subclasses (numpy scalars), and out-of-int64 ints —
falling back to the per-literal isin path wherever a safe spelling
does not exist.
"""

from __future__ import annotations

import pytest

from nimble_spark.sources.table import _in_predicate


def _filter_ids(df, pred):
    return sorted(r["id"] for r in df.filter(pred).collect())


@pytest.fixture(scope="module")
def str_df(spark):
    rows = [(0, "a'b"), (1, "c\\d"), (2, "plain"), (3, "x\\'y")]
    return spark.createDataFrame(rows, "id long, k string")


def test_quoted_strings_match_isin_default_parser(spark, str_df):
    vals = ["a'b", "c\\d", "plain", "x\\'y"]
    from pyspark.sql import functions as F

    want = _filter_ids(str_df, F.col("k").isin(vals))
    assert _filter_ids(str_df, _in_predicate("k", vals)) == want == [0, 1, 2, 3]


def test_quoted_strings_match_isin_legacy_escapes(spark, str_df):
    """With escapedStringLiterals=true, backslash escapes are taken
    literally — strings containing \\ or ' must take the isin path so
    no row is silently dropped (the r11 ADVICE repro)."""
    vals = ["a'b", "c\\d", "plain"]
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        assert _filter_ids(str_df, _in_predicate("k", vals)) == [0, 1, 2]
    finally:
        spark.conf.unset("spark.sql.parser.escapedStringLiterals")


def test_numpy_scalars_roundtrip(spark):
    np = pytest.importorskip("numpy")
    df = spark.createDataFrame([(0, 1.5), (1, 2.0), (2, 3.25)], "id long, v double")
    got = _filter_ids(df, _in_predicate("v", [np.float64(1.5), np.float64(3.25)]))
    assert got == [0, 2]
    dfi = spark.createDataFrame([(0, 10), (1, 20)], "id long, v long")
    assert _filter_ids(dfi, _in_predicate("v", [np.int64(20)])) == [1]


def test_out_of_int64_falls_back(spark):
    df = spark.createDataFrame([(0, 10), (1, 20)], "id long, v long")
    big = 1 << 70
    # isin raises on the unrepresentable literal — the predicate must
    # surface the SAME behavior (per-literal path), not silently parse
    # the huge value as DECIMAL and return an empty match.
    with pytest.raises(Exception):
        _filter_ids(df, _in_predicate("v", [10, big]))
