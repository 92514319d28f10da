"""format('nimble') reads of an ALTERED Hive-partitioned table — the
least-obvious composition: partition values come from directory names,
data columns from files under physical names, added columns from
nowhere (typed null fill), all surfaced under logical names with
pushed filters mapped back to physical for stats pruning."""

import pyspark.sql.functions as F

from nimble_spark.sources.alter import alter_table
from nimble_spark.sources.datasource import register_nimble_source
from nimble_spark.sources.table import WriteOptions, read_table, write_table


def test_pyds_partitioned_altered_read(spark, tmp_path):
    register_nimble_source(spark)
    path = str(tmp_path / "t")
    rows = spark.range(0, 300).selectExpr(
        "id AS k",
        "CASE WHEN id % 2 = 0 THEN '01' ELSE '02' END AS p",
        "CAST(id AS DOUBLE) AS v",
    )
    write_table(rows, path, WriteOptions(partition_by=["p"]))
    # rename a non-key data column; add a column (p is protected)
    alter_table(path, rename={"v": "value"}, add={"note": "string"})
    write_table(
        spark.createDataFrame(
            [(9000, "01", 1.5, "hi")], "k long, p string, value double, note string"
        ),
        path,
        WriteOptions(partition_by=["p"]),
        mode="append",
    )

    d = spark.read.format("nimble").option("pushdown", "true").load(path)
    assert set(d.columns) == {"k", "p", "value", "note"}
    assert d.count() == 301
    # partition value survives as the declared string ('01', not 1)
    assert d.filter("p = '01'").count() == 151
    # pushed filter on the RENAMED column maps to physical for pruning
    assert d.filter(F.col("value") >= 250.0).count() == 50
    # added column: null on pre-add files, real on the appended one
    assert d.filter("note = 'hi'").count() == 1
    assert d.filter("note IS NULL").count() == 300
    # parity with the library read path
    # the SAFE default reader surfaces the same logical view
    d_safe = spark.read.format("nimble").load(path)
    assert set(d_safe.columns) == set(d.columns)
    assert d_safe.count() == 301
    lib = read_table(spark, path)
    assert sorted(d.columns) == sorted(lib.columns)
    # parity aggregate through the SAFE reader: the pushdown reader's
    # contract is fresh-load-per-query (the Spark 4.1 plan-cache
    # hazard its docstring describes), and `d` above has already been
    # scanned with filters
    assert d_safe.agg(F.sum("value")).first()[0] == lib.agg(F.sum("value")).first()[0]
