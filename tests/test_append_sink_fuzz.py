"""Append mode, per-column encoding knobs, streaming sink, and the
reference-style randomized round-trip fuzz (SURVEY.md §5: VectorFuzzer
writer round-trips → hypothesis-generated schemas/rows here)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nimble_spark.sources.table import (
    WriteOptions,
    read_manifest,
    read_table,
    write_table,
)
from tests.conftest import SF_SMALL

# Long-running fuzz/soak/drill tier: excluded from the driver-window
# default run (pytest.ini addopts); the FULL suite (-m "") remains the
# builder's round-exit gate.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="nimble_app_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_append_mode_accumulates(spark, tmpdir):
    src = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    path = f"{tmpdir}/nation_app"
    write_table(src, path, WriteOptions())
    m2 = write_table(src.limit(5), path, WriteOptions(), mode="append")
    assert m2["rows"] == src.count() + 5
    assert read_table(spark, path).count() == src.count() + 5
    # manifest stats refreshed over the whole table
    m = read_manifest(path)
    assert m["rows"] == src.count() + 5


def test_no_dictionary_cols_knob(spark, tmpdir):
    src = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    path = f"{tmpdir}/nation_plain"
    write_table(src, path, WriteOptions(no_dictionary_cols=["n_name"]))
    from nimble_spark.tools import show_encodings

    enc = {r["column"]: r["encodings"] for r in show_encodings(spark, path).collect()}
    assert "PLAIN_DICTIONARY" not in enc["n_name"] and "RLE_DICTIONARY" not in enc["n_name"]
    # an untouched low-cardinality column still dictionary-encodes
    assert "DICTIONARY" in enc["n_regionkey"]


def test_stream_to_table_sink(spark, tmpdir):
    from nimble_spark.streaming.sink import stream_to_table
    from nimble_spark.streaming.windows import read_events_stream

    stream = read_events_stream(spark, f"{SF_SMALL}/events.parquet")
    path = f"{tmpdir}/events_sink"
    q = stream_to_table(stream, path, f"{tmpdir}/ckpt")
    q.awaitTermination(120)
    from nimble_spark.tables import load

    want = load(spark, SF_SMALL, "events").count()
    got = read_table(spark, path)
    assert got.count() == want
    # manifest exists with stats → the sink table is a real nimble table
    m = read_manifest(path)
    assert m["rows"] == want and "event_id" in m["column_stats"]


# ---------------------------------------------------------------------------
# Randomized round-trip fuzz (hypothesis), bounded for CI speed
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:
    scalars = st.one_of(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.text(max_size=12),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.booleans(),
        st.none(),
    )
    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.one_of(st.text(max_size=20), st.none()),
            st.one_of(st.floats(allow_nan=False, allow_infinity=False), st.none()),
            st.lists(st.integers(min_value=-1000, max_value=1000), max_size=5),
        ),
        min_size=1,
        max_size=40,
    )

    @given(rows=rows_strategy)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fuzz_roundtrip(spark, tmp_path_factory, rows):
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("s", T.StringType()),
                T.StructField("d", T.DoubleType()),
                T.StructField("arr", T.ArrayType(T.LongType())),
            ]
        )
        df = spark.createDataFrame(rows, schema)
        d = tempfile.mkdtemp(prefix="nimble_fuzz_")
        try:
            write_table(df, d, WriteOptions())
            back = read_table(spark, d)
            a = sorted(map(repr, df.collect()))
            b = sorted(map(repr, back.collect()))
            assert a == b
        finally:
            shutil.rmtree(d, ignore_errors=True)

    @given(
        vals=st.lists(
            st.one_of(st.integers(min_value=-100, max_value=100), st.none()),
            min_size=1,
            max_size=20,
        )
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_fuzz_flatmap_presence(spark, vals):
        """Present-null vs absent-key survives flatten→restore for any
        null pattern (the inMap semantics fuzz)."""
        from nimble_spark.sources.flatmap import flatten_map_column, restore_map_column

        rows = []
        for i, v in enumerate(vals):
            if i % 3 == 0:
                rows.append((i, {}))  # absent key
            else:
                rows.append((i, {"a": v}))  # present (possibly null) value
        df = spark.createDataFrame(
            rows, T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
            ])
        )
        flat, keys = flatten_map_column(df, "m", keys=["a"])
        back = restore_map_column(flat, keys, "m")
        got = {r["id"]: r["m"] for r in back.collect()}
        for i, v in enumerate(vals):
            if i % 3 == 0:
                assert got[i] == {}
            else:
                assert "a" in got[i] and got[i]["a"] == v


def test_stream_sink_carries_synopses(spark, tmpdir):
    """r8: micro-batch appends through the streaming sink keep every
    synopsis kind current — the first batch declares them, every later
    batch's files compute theirs, and the folds stay exact."""
    from nimble_spark.sources.compaction import fast_ndv, fast_sum, fast_value_counts
    from nimble_spark.sources.table import WriteOptions
    from nimble_spark.streaming.sink import stream_to_table

    src = f"{tmpdir}/src"
    spark.range(0, 200).selectExpr(
        "id AS k", "CAST(id % 7 AS STRING) AS tag"
    ).repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("k LONG, tag STRING")
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(src)
    )
    path = f"{tmpdir}/sink"
    q = stream_to_table(
        stream, path, f"{tmpdir}/ckpt2",
        opts=WriteOptions(ndv_columns=["tag"], sum_columns=["k"],
                          histogram_columns=["tag"]),
    )
    q.awaitTermination(120)
    assert fast_sum(path, "k")["sum"] == sum(range(200))
    assert fast_ndv(path, "tag") == {"ndv": 7, "exact": True, "k": 256}
    from collections import Counter

    assert dict(fast_value_counts(path, "tag")) == dict(
        Counter(str(i % 7) for i in range(200))
    )


def test_pyds_stream_sink_carries_synopses(spark, tmpdir):
    """r8 probe: writeStream.format('nimble') micro-batch appends keep
    sum + histogram synopses fold-exact (the stream writer delegates
    to the batch writer's commit, which carries prior declarations)."""
    from collections import Counter

    from nimble_spark.sources.compaction import fast_sum, fast_value_counts
    from nimble_spark.sources.datasource import register_nimble_source
    from nimble_spark.sources.table import WriteOptions, write_table

    register_nimble_source(spark)
    src = f"{tmpdir}/src2"
    spark.range(0, 120).selectExpr(
        "id AS k", "CAST(id % 5 AS STRING) AS tag"
    ).repartition(3).write.parquet(src)
    dst = f"{tmpdir}/dst2"
    write_table(
        spark.range(120, 130).selectExpr("id AS k", "CAST(id % 5 AS STRING) AS tag"),
        dst,
        WriteOptions(sum_columns=["k"], histogram_columns=["tag"]),
    )
    q = (
        spark.readStream.schema("k LONG, tag STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("nimble")
        .option("checkpointLocation", f"{tmpdir}/ck2")
        .trigger(availableNow=True)
        .start(dst)
    )
    q.awaitTermination(120)
    assert fast_sum(dst, "k")["sum"] == sum(range(130))
    assert dict(fast_value_counts(dst, "tag")) == dict(
        Counter(str(i % 5) for i in range(130))
    )
