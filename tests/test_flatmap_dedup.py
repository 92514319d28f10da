"""Flat-map and dedup-column transform tests — FIXTURES.md F4/F5
shapes (the reference's signature features)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from nimble_spark.sources.flatmap import (
    dedup_array_column,
    flatten_map_column,
    project_map_keys,
    restore_array_column,
    restore_map_column,
)


@pytest.fixture(scope="module")
def feature_df(spark):
    # F4 shape: sparse per-row key subsets, incl. present-null vs absent
    rows = [
        Row(id=0, features={"f1": 1.0, "f2": 2.0}),
        Row(id=1, features={"f2": None, "f3": 3.0}),  # f2 present-but-null
        Row(id=2, features={}),
        Row(id=3, features={"f1": 9.0, "f3": None}),
    ]
    return spark.createDataFrame(rows, "id long, features map<string, double>")


def test_flatten_restore_roundtrip(spark, feature_df):
    flat, keys = flatten_map_column(feature_df, "features")
    assert keys == ["f1", "f2", "f3"]
    assert "features__f1" in flat.columns and "features__f1__in" in flat.columns
    back = restore_map_column(flat, keys, "features")
    orig = {r["id"]: r["features"] for r in feature_df.collect()}
    rt = {r["id"]: r["features"] for r in back.collect()}
    assert orig == rt  # present-null vs absent preserved exactly


def test_presence_semantics(spark, feature_df):
    flat, keys = flatten_map_column(feature_df, "features")
    rows = {r["id"]: r for r in flat.collect()}
    # id=1: f2 present with null value → in=True, value=None
    assert rows[1]["features__f2__in"] is True
    assert rows[1]["features__f2"] is None
    # id=0: f3 absent → in=False
    assert rows[0]["features__f3__in"] is False


def test_key_projection(spark, feature_df):
    flat, keys = flatten_map_column(feature_df, "features")
    proj = project_map_keys(flat, ["f1"], "features")
    assert set(proj.columns) == {"id", "features__f1", "features__f1__in"}


def test_dynamic_keys_across_writes(spark):
    # file A has keys a,b; file B has keys b,c — union discovers all
    a = spark.createDataFrame([Row(id=0, m={"a": 1})], "id long, m map<string,int>")
    b = spark.createDataFrame([Row(id=1, m={"b": 2, "c": 3})], "id long, m map<string,int>")
    flat, keys = flatten_map_column(a.unionByName(b), "m")
    assert keys == ["a", "b", "c"]


def test_dedup_array_roundtrip(spark):
    # F5 shape: consecutive rows repeat the same array
    rows = [Row(id=i, arr=[i // 3, i // 3 + 1]) for i in range(12)]
    rows.append(Row(id=12, arr=None))
    df = spark.createDataFrame(rows, "id long, arr array<bigint>")
    main, dictionary = dedup_array_column(df, "arr")
    # 4 distinct arrays ([0,1],[1,2],[2,3],[3,4]) + the null entry
    assert dictionary.count() == 5
    back = restore_array_column(main, dictionary, "arr")
    orig = {r["id"]: r["arr"] for r in df.collect()}
    rt = {r["id"]: r["arr"] for r in back.collect()}
    assert orig == rt
