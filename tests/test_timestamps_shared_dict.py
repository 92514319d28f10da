"""Unit tests for the TimestampMicroNano split and SharedDictionary
analogues — the edge cases the differential queries don't reach:
pre-epoch (negative) nanos, residual boundaries, and nulls through
dictionary encode/decode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nimble_spark.sources.shared_dictionary import (
    build_dictionary,
    decode_shared_dictionary,
    encode_shared_dictionary,
)
from nimble_spark.sources.timestamps import (
    restore_timestamp_nanos,
    split_timestamp_nanos,
)

NANO_CASES = [
    0,
    1,
    999,
    1000,
    123456789123456789,
    -1,  # pre-epoch: floor semantics keep residual in 0..999
    -999,
    -1000,
    -123456789123456789,
]


def test_nanos_split_restore_exact(spark):
    df = spark.createDataFrame([(n,) for n in NANO_CASES], "ns LONG")
    back = restore_timestamp_nanos(split_timestamp_nanos(df, "ns"), "ns")
    got = sorted(r.ns for r in back.collect())
    assert got == sorted(NANO_CASES)


def test_nanos_residual_range(spark):
    df = spark.createDataFrame([(n,) for n in NANO_CASES], "ns LONG")
    s = split_timestamp_nanos(df, "ns")
    resid = [r[0] for r in s.select("ns_nanos").collect()]
    assert all(0 <= v <= 999 for v in resid), resid
    assert dict(s.dtypes)["ns_nanos"] == "smallint"
    assert dict(s.dtypes)["ns_us"].startswith("timestamp")


def test_shared_dictionary_dense_deterministic(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",), (None,)], "v STRING"
    )
    d = build_dictionary(df, "v").collect()
    assert {(r.value, r.code) for r in d} == {("a", 0), ("b", 1), ("c", 2)}


def test_shared_dictionary_roundtrip_with_nulls(spark):
    rows = [(1, "x"), (2, None), (3, "y"), (4, "x")]
    df = spark.createDataFrame(rows, "id LONG, v STRING")
    enc, alphabet = encode_shared_dictionary(df, "v")
    assert "v" not in enc.columns and "v__code" in enc.columns
    # null value → null code, not a dictionary entry
    assert alphabet.count() == 2
    dec = decode_shared_dictionary(enc, alphabet, "v")
    got = {(r.id, r.v) for r in dec.collect()}
    assert got == set(rows)


def test_shared_dictionary_codes_compact(spark):
    df = spark.createDataFrame([(s,) for s in "aabbccdd"], "v STRING")
    _, alphabet = encode_shared_dictionary(df, "v")
    codes = sorted(r.code for r in alphabet.collect())
    assert codes == [0, 1, 2, 3]
