"""Executable USAGE.md: every API the migration guide shows must run
exactly as written (a switch guide that drifts from the code is worse
than none)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_usage_write_read_surface(spark, tmpdir):
    from nimble_spark.sources.table import (
        WriteOptions,
        read_table,
        seek_to_row,
        write_table,
    )

    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    path = f"{tmpdir}/usage_orders"
    write_table(src, path, WriteOptions(cluster_by=["o_orderkey"]))
    write_table(src.limit(0), path, mode="append")  # stripe append

    assert read_table(spark, path, columns=["o_orderkey"]).columns == ["o_orderkey"]
    n_rng = read_table(spark, path, range_scan=("o_orderkey", 10, 50)).count()
    assert n_rng == src.filter(F.col("o_orderkey").between(10, 50)).count()
    hits = read_table(spark, path, point_lookup=("o_orderkey", [1, 7]))
    assert hits.count() == src.filter(F.col("o_orderkey").isin([1, 7])).count()
    assert read_table(spark, path, row_range=(10, 20)).count() == 10
    assert seek_to_row(spark, path, 5).count() == src.count() - 5
    assert read_table(spark, path, as_of_commit=0).count() == src.count()

    from nimble_spark.sources.serde import serialize_partitioned

    payload = serialize_partitioned(hits)
    assert payload.count() >= 1  # one Arrow IPC slice per partition


def test_usage_mutation_surface(spark, tmpdir):
    from nimble_spark.sources.deletes import delete_rows, read_with_deletes
    from nimble_spark.sources.merge import update_where
    from nimble_spark.sources.table import WriteOptions, read_changes, write_table

    src = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    path = f"{tmpdir}/usage_docs"
    write_table(src, path, WriteOptions())
    delete_rows(spark, path, "doc_id", [1, 2, 3])
    assert read_with_deletes(spark, path).count() == src.count() - 3

    path2 = f"{tmpdir}/usage_docs2"
    write_table(src, path2, WriteOptions(cluster_by=["doc_id"]))
    update_where(spark, path2, "doc_id < 5", {"n_chars": "0"})
    assert read_changes(spark, path2, since_commit=0).count() > 0


def test_usage_dsl_surface(spark, tmpdir):
    from nimble_spark.sources.table import WriteOptions, write_table
    from nimble_spark.tools import run_command

    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    path = f"{tmpdir}/usage_dsl"
    write_table(src, path, WriteOptions(cluster_by=["o_orderkey"]))
    for cmd in (
        "DESCRIBE",
        "SHOW STATS",
        "SHOW FILES",
        "SHOW HISTORY",
        "SHOW TRASH",
        "EXPLAIN PRUNING o_orderkey BETWEEN 100 AND 200",
        "SELECT o_orderkey, o_totalprice LIMIT 10",
    ):
        assert run_command(spark, path, cmd).count() >= 0
    assert run_command(spark, path, "VACUUM").count() == 0  # nothing to reclaim


def test_usage_registry_invocation(spark):
    from nimble_spark.registry import query_map

    df = query_map()["q_dedup_exact"](spark, SF_SMALL)
    assert df.count() > 0


def test_usage_constraints_and_interop(spark, tmpdir):
    import duckdb
    import pytest as _pytest

    from nimble_spark.sources.interop import arrow_dataset, duckdb_relation
    from nimble_spark.sources.table import WriteOptions, write_table

    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    path = f"{tmpdir}/usage_checked"
    write_table(src, path, WriteOptions(
        check_constraints={"price_pos": "o_totalprice > 0"},
    ))
    with _pytest.raises(ValueError, match="price_pos"):
        write_table(src.withColumn("o_totalprice", F.lit(-1.0)), path, mode="append")

    assert arrow_dataset(path).count_rows() == src.count()
    con = duckdb.connect()  # hold the connection past the relation's use
    rel = duckdb_relation(con, path)
    assert rel.count("*").fetchone()[0] == src.count()
