"""Duplicate-column storage dedup — the TabletWriter stream-dedup
analogue (dwio/nimble/tablet/TabletWriter.cpp:98-109,313: streams with
identical bytes are stored once per stripe, found by SpookyHash +
exact compare; readers are served from the single stored copy).

Spark mapping: the dedup unit is the COLUMN. ``WriteOptions(
dedup_columns=True)`` fingerprints same-typed columns in one
aggregation pass, confirms exact equality with a null-safe per-row
compare, stores one physical copy, and records ``column_aliases`` +
``logical_columns`` in the manifest; ``read_table`` restores the
logical schema as zero-cost projections of the stored twin.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nimble_spark.sources.table import (
    WriteOptions,
    read_manifest,
    read_table,
    write_table,
)


def _dup_df(spark, n=500):
    return spark.range(n).selectExpr(
        "id AS k",
        "id * 3 AS v",
        "id * 3 AS v_copy",          # exact duplicate of v
        "CAST(id % 5 AS STRING) AS tag",
        "CAST(id % 5 AS STRING) AS tag_copy",   # exact duplicate of tag
        "CAST(id % 7 AS STRING) AS other",      # same type, different data
        "id * 3 + (CASE WHEN id = 42 THEN 1 ELSE 0 END) AS v_near",  # 1 row differs
    )


def test_dedup_write_stores_one_copy_and_read_restores(spark, tmpdir):
    path = f"{tmpdir}/dedup"
    df = _dup_df(spark)
    m = write_table(df, path, WriteOptions(dedup_columns=True))

    assert m["column_aliases"] == {"v_copy": "v", "tag_copy": "tag"}
    assert m["logical_columns"] == df.columns
    # the physical files genuinely lack the duplicates
    for f in m["files"]:
        phys = pq.read_schema(os.path.join(path, f["path"])).names
        assert "v_copy" not in phys and "tag_copy" not in phys
        assert "v" in phys and "other" in phys and "v_near" in phys

    out = read_table(spark, path)
    assert out.columns == df.columns  # logical order restored
    assert out.count() == 500
    assert out.filter("v_copy != v OR tag_copy != tag").count() == 0
    # near-duplicate (one differing row) must NOT have been aliased
    assert out.filter("v_near != v").count() == 1
    # projection on a deduplicated name works
    assert read_table(spark, path, columns=["v_copy", "k"]).columns == ["v_copy", "k"]
    assert (
        read_table(spark, path, columns=["v_copy"]).agg(F.sum("v_copy")).first()[0]
        == df.agg(F.sum("v")).first()[0]
    )


def test_dedup_point_and_range_lookup_on_aliased_column(spark, tmpdir):
    """Index probes on a deduplicated name serve from the stored twin
    (cluster pruning on v == pruning on v_copy), and stats-answered
    fast paths map through the alias."""
    from nimble_spark.sources.compaction import fast_count, fast_minmax

    path = f"{tmpdir}/dedup_idx"
    write_table(
        _dup_df(spark),
        path,
        WriteOptions(dedup_columns=True, cluster_by=["v"], n_cluster_files=4),
    )
    got = read_table(spark, path, range_scan=("v_copy", 300, 600))
    assert got.count() == 101  # v = 3k in [300, 600] → k in [100, 200]
    pts = read_table(spark, path, point_lookup=("v_copy", [300, 303, 1]))
    assert sorted(r["k"] for r in pts.collect()) == [100, 101]
    assert fast_count(spark, path, ("v_copy", 300, 600)) == 101
    assert fast_minmax(spark, path, "v_copy") == (0, 1497)


def test_dedup_append_validates_and_preserves_aliases(spark, tmpdir):
    path = f"{tmpdir}/dedup_app"
    write_table(_dup_df(spark, 100), path, WriteOptions(dedup_columns=True))

    good = spark.range(100, 150).selectExpr(
        "id AS k", "id * 3 AS v", "id * 3 AS v_copy",
        "CAST(id % 5 AS STRING) AS tag", "CAST(id % 5 AS STRING) AS tag_copy",
        "CAST(id % 7 AS STRING) AS other", "id * 3 AS v_near",
    )
    write_table(good, path, WriteOptions(), mode="append")
    out = read_table(spark, path)
    assert out.count() == 150
    assert out.filter("v_copy != v").count() == 0

    bad = good.withColumn("v_copy", F.col("v") + 1)
    with pytest.raises(ValueError, match="violates column alias"):
        write_table(bad, path, WriteOptions(), mode="append")
    assert read_table(spark, path).count() == 150  # nothing committed


def test_dedup_compaction_carries_aliases_and_rewrites_reject(spark, tmpdir):
    from nimble_spark.sources.compaction import compact_table
    from nimble_spark.sources.merge import merge_into, update_where

    path = f"{tmpdir}/dedup_compact"
    write_table(_dup_df(spark, 100), path, WriteOptions(dedup_columns=True))
    for lo in (100, 200, 300):
        df = spark.range(lo, lo + 100).selectExpr(
            "id AS k", "id * 3 AS v", "id * 3 AS v_copy",
            "CAST(id % 5 AS STRING) AS tag", "CAST(id % 5 AS STRING) AS tag_copy",
            "CAST(id % 7 AS STRING) AS other", "id * 3 AS v_near",
        )
        write_table(df, path, WriteOptions(), mode="append")

    compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    m = read_manifest(path)
    assert m["column_aliases"] == {"v_copy": "v", "tag_copy": "tag"}
    out = read_table(spark, path)
    assert out.count() == 400
    assert out.filter("v_copy != v OR tag_copy != tag").count() == 0

    src = spark.range(5).selectExpr("id AS k", "id AS v")
    with pytest.raises(ValueError, match="dedup"):
        merge_into(spark, path, src, key="k")
    with pytest.raises(ValueError, match="dedup"):
        update_where(spark, path, "k < 10", {"v": "v + 1"})


def test_dedup_datasource_append_rejected(spark, tmpdir):
    from nimble_spark.sources.datasource import register_nimble_source

    path = f"{tmpdir}/dedup_pyds"
    write_table(_dup_df(spark, 50), path, WriteOptions(dedup_columns=True))
    register_nimble_source(spark)
    df = read_table(spark, path)
    with pytest.raises(Exception, match="dedup_columns"):
        df.write.format("nimble").mode("append").save(path)


def test_dedup_layout_keys_never_dropped(spark, tmpdir):
    """A column serving as a layout/index key stays physical even if a
    twin exists — the twin is dropped instead (or neither, if both are
    protected)."""
    path = f"{tmpdir}/dedup_prot"
    write_table(
        _dup_df(spark),
        path,
        WriteOptions(dedup_columns=True, cluster_by=["v_copy"], n_cluster_files=2),
    )
    m = read_manifest(path)
    # v_copy is the cluster key → protected; its twin v gets dropped
    assert m["column_aliases"]["v"] == "v_copy"
    out = read_table(spark, path)
    assert out.filter("v != v_copy").count() == 0
    assert out.columns[:3] == ["k", "v", "v_copy"]


def test_describe_shows_logical_schema_with_alias_attribute(spark, tmpdir):
    import json as _json

    from nimble_spark import tools

    path = f"{tmpdir}/dedup_desc"
    write_table(_dup_df(spark, 50), path, WriteOptions(dedup_columns=True))
    rows = {r["column"]: r for r in tools.describe(spark, path).collect()}
    assert list(rows) == ["k", "v", "v_copy", "tag", "tag_copy", "other", "v_near"]
    assert _json.loads(rows["v_copy"]["attributes"])["alias_of"] == "v"
    assert rows["v_copy"]["type"] == rows["v"]["type"]
    assert "alias_of" not in _json.loads(rows["v"]["attributes"])


def test_dedup_skips_map_columns_and_handles_nested(spark, tmpdir):
    """Maps are neither hashable nor orderable in Spark — two
    same-typed map columns must be skipped (not crash the fingerprint
    agg); arrays and structs ARE hashable/comparable and dedup."""
    path = f"{tmpdir}/dedup_nested"
    df = spark.range(100).selectExpr(
        "id AS k",
        "map('a', id) AS m1",
        "map('a', id) AS m2",             # same-typed map twin: skipped
        "array(id, id * 2) AS arr1",
        "array(id, id * 2) AS arr2",      # exact duplicate array
        "named_struct('x', id) AS s1",
        "named_struct('x', id) AS s2",    # exact duplicate struct
    )
    m = write_table(df, path, WriteOptions(dedup_columns=True))
    assert m["column_aliases"] == {"arr2": "arr1", "s2": "s1"}
    out = read_table(spark, path)
    assert out.columns == df.columns
    assert out.filter("arr1 != arr2 OR s1.x != s2.x").count() == 0
    assert out.selectExpr("m2['a']").collect() == out.selectExpr("m1['a']").collect()


def test_materialize_columns_enables_rewrites(spark, tmpdir):
    """materialize_columns rewrites the aliased table with physical
    copies; merge/update work afterwards and data is unchanged."""
    from nimble_spark.sources.merge import update_where
    from nimble_spark.sources.table import materialize_columns

    path = f"{tmpdir}/dedup_mat"
    write_table(
        _dup_df(spark, 100),
        path,
        WriteOptions(dedup_columns=True, cluster_by=["v"], n_cluster_files=2),
    )
    before = sorted(tuple(r) for r in read_table(spark, path).collect())
    m = materialize_columns(spark, path)
    assert "column_aliases" not in m
    assert m["indexes"]["cluster"]["keys"] == ["v"]  # layout preserved
    after = sorted(tuple(r) for r in read_table(spark, path).collect())
    assert after == before
    # physical files now hold every column
    for f in m["files"]:
        assert "v_copy" in pq.read_schema(os.path.join(path, f["path"])).names
    update_where(spark, path, "k < 10", {"v": "v + 1"})  # no longer rejected
    assert read_table(spark, path).filter("v = k * 3 + 1").count() == 10
    # idempotent no-op on a plain table
    assert "column_aliases" not in materialize_columns(spark, path)


def test_append_preserves_logical_column_order(spark, tmpdir):
    """ADVICE r5: an append whose DataFrame has REORDERED columns must
    not change the table's logical read order for existing readers."""
    path = f"{tmpdir}/dedup_order"
    write_table(_dup_df(spark, 100), path, WriteOptions(dedup_columns=True))
    order_before = list(read_manifest(path)["logical_columns"])
    cols_before = read_table(spark, path).columns
    # append with reversed column order (same data contract)
    batch = _dup_df(spark, 50).select(*reversed(_dup_df(spark, 1).columns))
    write_table(batch, path, mode="append")
    assert read_manifest(path)["logical_columns"] == order_before
    assert read_table(spark, path).columns == cols_before
