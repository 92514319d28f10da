"""Property-based storage tests (hypothesis): the connector and the
mutation surface must hold their contracts for ARBITRARY data, not
just the driver corpus — nulls, empty strings, negative keys,
duplicate rows, unicode, single-row tables.

Properties:
- write → read is the identity on multisets of rows;
- merge_into equals the relational merge (anti-join ∪ source);
- update_where equals the relational CASE projection.

Examples are kept small (Spark job per example); the value is the
GENERATOR's reach, not the row count.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from nimble_spark.sources.merge import merge_into, update_where
from nimble_spark.sources.table import WriteOptions, read_table, write_table
import pytest

# Long-running fuzz/soak/drill tier: excluded from the driver-window
# default run (pytest.ini addopts); the FULL suite (-m "") remains the
# builder's round-exit gate.
pytestmark = pytest.mark.slow

# (key, category, value) rows — nullable strings incl. unicode/empty,
# nullable doubles, keys over a small range so duplicates/matches occur
_rows = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=20),
        st.one_of(st.none(), st.text(alphabet="aé 日\n'\"", max_size=4)),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
    ),
    min_size=1,
    max_size=12,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_SCHEMA = "k LONG, cat STRING, v DOUBLE"


def _df(spark, rows):
    return spark.createDataFrame([(int(k), c, v) for k, c, v in rows], _SCHEMA)


def _bag(df):
    return sorted(
        ((r["k"], r["cat"], r["v"]) for r in df.collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or "", t[2] is None, t[2] or 0.0),
    )


@given(_rows)
@_SETTINGS
def test_roundtrip_identity(spark, rows):
    d = tempfile.mkdtemp(prefix="nimble_prop_")
    try:
        src = _df(spark, rows)
        write_table(src, f"{d}/t", WriteOptions())
        assert _bag(read_table(spark, f"{d}/t")) == _bag(src)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(_rows, _rows)
@_SETTINGS
def test_merge_matches_relational(spark, target_rows, source_rows):
    d = tempfile.mkdtemp(prefix="nimble_prop_")
    try:
        # merge requires unique keys per side (upsert semantics)
        tgt = _df(spark, target_rows).dropDuplicates(["k"])
        src = _df(spark, source_rows).dropDuplicates(["k"])
        write_table(tgt, f"{d}/t", WriteOptions())
        merge_into(spark, f"{d}/t", src, "k")
        expected = tgt.join(src.select("k"), "k", "left_anti").unionByName(src)
        assert _bag(read_table(spark, f"{d}/t")) == _bag(expected)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(_rows, st.integers(min_value=-5, max_value=20))
@_SETTINGS
def test_update_where_matches_case(spark, rows, pivot):
    d = tempfile.mkdtemp(prefix="nimble_prop_")
    try:
        src = _df(spark, rows)
        write_table(src, f"{d}/t", WriteOptions())
        update_where(spark, f"{d}/t", f"k >= {pivot}", {"v": "CAST(0.0 AS DOUBLE)"})
        expected = src.withColumn(
            "v", F.when(F.col("k") >= pivot, F.lit(0.0)).otherwise(F.col("v"))
        )
        assert _bag(read_table(spark, f"{d}/t")) == _bag(expected)
    finally:
        shutil.rmtree(d, ignore_errors=True)
