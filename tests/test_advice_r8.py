"""Pins for the round-7 ADVICE findings (fixed in round 8).

1. (medium) duckdb_relation on a hash-bucketed table leaked the
   internal __nimble_bucket column through hive path parsing.
2. (low) show_sums crashed (float(None)) on an empty table, and cast
   exact integer sums to DOUBLE — silently lossy above 2^53.
3. (low) fast_ndv returned an estimate when every per-file synopsis
   was untruncated and the exact answer len(union) was derivable.
4. (low) file paths interpolated into DuckDB SQL with bare quotes —
   a path containing ' broke constraint validation / mask reads.
5. (low) DuckDB hive autocast could return a partition column typed
   by its VALUES (k='1' → BIGINT) instead of the declared schema.
"""

from __future__ import annotations

import duckdb
import pytest

from nimble_spark.sources.table import WriteOptions, write_table


def test_bucketed_interop_no_internal_column(spark, tmp_path):
    """ADVICE #1: the logical view of a hash-bucketed table has no
    __nimble_bucket — interop must match Spark's read_table columns."""
    from nimble_spark.sources.interop import arrow_dataset, duckdb_relation
    from nimble_spark.sources.table import read_table

    path = str(tmp_path / "b")
    write_table(
        spark.range(0, 200).selectExpr("id AS k", "id * 2 AS v"),
        path,
        WriteOptions(bucket_by="k", n_buckets=4),
    )
    spark_cols = read_table(spark, path).columns
    assert "__nimble_bucket" not in spark_cols

    con = duckdb.connect()
    rel = duckdb_relation(con, path)
    assert sorted(rel.columns) == sorted(spark_cols)
    assert rel.aggregate("COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s").fetchone() == (
        200,
        sum(2 * i for i in range(200)),
    )
    # bucket keys live in file bytes → arrow_dataset serves the logical
    # view too (pre-fix it refused, claiming path-derived columns)
    ds = arrow_dataset(path)
    assert sorted(ds.schema.names) == sorted(spark_cols)


def test_partitioned_and_bucketed_interop(spark, tmp_path):
    """Partition key recovered from paths, bucket ordinal still hidden,
    on a table with BOTH layouts."""
    from nimble_spark.sources.interop import duckdb_relation

    path = str(tmp_path / "pb")
    write_table(
        spark.range(0, 120).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS part", "id * 10 AS v"
        ),
        path,
        WriteOptions(partition_by=["part"], bucket_by="k", n_buckets=2),
    )
    con = duckdb.connect()
    rel = duckdb_relation(con, path)
    assert "__nimble_bucket" not in rel.columns
    assert sorted(rel.columns) == ["k", "part", "v"]
    got = rel.aggregate(
        "part, COUNT(*) AS n", "part"
    ).order("part").fetchall()
    assert got == [("0", 40), ("1", 40), ("2", 40)]


def test_hive_partition_declared_type_pinned(spark, tmp_path):
    """ADVICE #5: a STRING-declared partition key with numeric-looking
    values must come back VARCHAR, not autocast BIGINT."""
    from nimble_spark.sources.interop import duckdb_relation

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 30).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p"),
        path,
        WriteOptions(partition_by=["p"]),
    )
    con = duckdb.connect()
    rel = duckdb_relation(con, path)
    types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    assert types["p"] == "VARCHAR", types
    # values compare as strings, same as Spark's logical view
    assert rel.filter("p = '2'").aggregate("COUNT(*) AS n").fetchone()[0] == 10


def test_show_sums_empty_table_and_exactness(spark, tmp_path):
    """ADVICE #2: SHOW SUMS on an empty table emits NULL avg instead of
    crashing; integer sums surface as exact strings above 2^53."""
    from nimble_spark.tools import run_command

    path = str(tmp_path / "e")
    write_table(
        spark.range(0, 0).selectExpr("id AS k"),
        path,
        WriteOptions(sum_columns=["k"]),
    )
    rows = run_command(spark, path, "SHOW SUMS").collect()
    assert len(rows) == 1
    assert rows[0]["sum"] == "0" and rows[0]["rows"] == 0
    assert rows[0]["avg"] is None

    big = str(tmp_path / "big")
    # two values whose exact sum (2^53 + 2^53+2 = 2^54+2) is NOT a
    # representable double — the old DOUBLE cast rounded it silently
    write_table(
        spark.createDataFrame([(2**53,), (2**53 + 2,)], "k LONG"),
        big,
        WriteOptions(sum_columns=["k"]),
    )
    rows = run_command(spark, big, "SHOW SUMS").collect()
    assert rows[0]["sum"] == str(2**54 + 2)
    assert float(rows[0]["sum"]) != 2**54 + 2  # the DOUBLE form is lossy


def test_fast_ndv_exact_above_k_when_untruncated(spark, tmp_path):
    """ADVICE #3: many small files, each under NDV_K distincts, whose
    union exceeds NDV_K → the union is provably complete, so fast_ndv
    must return the exact count."""
    from nimble_spark.sources.compaction import fast_ndv
    from nimble_spark.sources.table import NDV_K

    n = NDV_K + 200  # global NDV above the sketch size
    path = str(tmp_path / "n")
    write_table(
        spark.range(0, n).selectExpr("id AS k", "CAST(id AS STRING) AS s"),
        path,
        WriteOptions(cluster_by=["k"], n_cluster_files=8, ndv_columns=["s"]),
    )
    # each of the 8 cluster files holds ~n/8 < NDV_K distincts
    r = fast_ndv(path, "s")
    assert r == {"ndv": n, "exact": True, "k": NDV_K}


def test_quoted_path_mask_read(spark, tmp_path):
    """ADVICE #4: a table path containing a single quote must not break
    the mask-file SQL duckdb_relation builds."""
    from nimble_spark.sources.deletes import delete_rows
    from nimble_spark.sources.interop import duckdb_relation

    path = str(tmp_path / "it's a table")
    write_table(spark.range(0, 50).selectExpr("id AS k", "id*2 AS v"), path)
    delete_rows(spark, path, "k", [1, 2, 3])
    con = duckdb.connect()
    rel = duckdb_relation(con, path)
    assert rel.aggregate("COUNT(*) AS n").fetchone()[0] == 47


def test_quoted_path_pyds_constraint_append(spark, tmp_path):
    """ADVICE #4: the DS-worker constraint validation interpolates
    staged-file paths into SQL — a quoted table path must validate,
    not die with a bind error."""
    from nimble_spark.sources.datasource import register_nimble_source
    from nimble_spark.sources.table import read_manifest, read_table

    register_nimble_source(spark)
    path = str(tmp_path / "o'brien")
    write_table(
        spark.range(0, 10).selectExpr("id AS k"),
        path,
        WriteOptions(check_constraints={"k_nonneg": "k >= 0"}),
    )
    (
        spark.range(10, 20)
        .selectExpr("id AS k")
        .write.format("nimble")
        .mode("append")
        .save(path)
    )
    assert read_table(spark, path).count() == 20
    # and a violating append still refuses through the quoted path
    with pytest.raises(Exception, match="k_nonneg"):
        (
            spark.range(0, 5)
            .selectExpr("-id - 1 AS k")
            .write.format("nimble")
            .mode("append")
            .save(path)
        )
    assert read_manifest(path)["rows"] == 20


def test_combined_flavor_interop(spark, tmp_path):
    """Combined probe: partitioned + hash-bucketed + alter-renamed +
    delete-masked, all at once, through duckdb_relation — the logical
    view (renamed column, no internal bucket ordinal, declared
    partition type, masks applied) must match Spark's exactly."""
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.sources.deletes import delete_rows, read_with_deletes
    from nimble_spark.sources.interop import duckdb_relation

    path = str(tmp_path / "combo")
    write_table(
        spark.range(0, 120).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS part", "id * 2 AS v"
        ),
        path,
        WriteOptions(partition_by=["part"], bucket_by="k", n_buckets=2),
    )
    alter_table(path, rename={"v": "val"})
    delete_rows(spark, path, "k", [0, 1, 2, 3])
    con = duckdb.connect()
    rel = duckdb_relation(con, path)
    assert sorted(rel.columns) == ["k", "part", "val"]
    types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    assert types["part"] == "VARCHAR"
    sdf = read_with_deletes(spark, path)
    assert rel.aggregate("COUNT(*) AS n").fetchone()[0] == sdf.count() == 116
    duck_sum = rel.aggregate("CAST(SUM(val) AS BIGINT) AS s").fetchone()[0]
    spark_sum = sum(r[0] for r in sdf.select("val").collect())
    assert duck_sum == spark_sum
