"""Metadata-only schema evolution (sources/alter.py): rename / drop /
add without rewriting data, across every read and mutation surface."""

import os

import pyspark.sql.functions as F
import pytest

from nimble_spark.sources.alter import alter_table
from nimble_spark.sources.table import (
    WriteOptions,
    read_changes,
    read_manifest,
    read_table,
    write_table,
)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = spark.range(0, 200).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v", "CAST(id % 7 AS STRING) AS tag"
    )
    write_table(rows, path, WriteOptions(cluster_by=["k"], n_cluster_files=2))
    return path


def test_rename_is_metadata_only_and_reads_logical(spark, table):
    files_before = {
        f["path"]: f["sha256"] for f in read_manifest(table)["files"]
    }
    alter_table(table, rename={"v": "value"})
    m = read_manifest(table)
    # not a byte moved
    assert {f["path"]: f["sha256"] for f in m["files"]} == files_before
    t = read_table(spark, table)
    assert t.columns == ["k", "value", "tag"]
    assert t.agg(F.sum("value")).first()[0] == float(sum(range(200)))
    # the alter is a data_change=false commit: CDC skips it
    assert m["commits"][-1]["mode"] == "alter"
    assert read_changes(spark, table, since_commit=len(m["commits"]) - 2).count() == 0


def test_drop_and_add(spark, table):
    alter_table(table, drop=["tag"], add={"score": "double"})
    t = read_table(spark, table)
    assert t.columns == ["k", "v", "score"]
    assert t.filter("score IS NULL").count() == 200
    with pytest.raises(ValueError, match="dropped"):
        read_table(spark, table, columns=["tag"])
    # dead names stay dead
    with pytest.raises(ValueError, match="collides"):
        alter_table(table, add={"tag": "string"})
    with pytest.raises(ValueError, match="collides"):
        alter_table(table, rename={"v": "tag"})


def test_append_maps_logical_to_physical(spark, table):
    alter_table(table, rename={"v": "value"}, add={"note": "string"})
    extra = spark.createDataFrame(
        [(1000, 5.0, "3", "hi")], "k long, value double, tag string, note string"
    )
    write_table(extra, table, mode="append")
    t = read_table(spark, table)
    assert t.count() == 201
    assert t.filter("note = 'hi'").count() == 1
    assert t.filter("note IS NULL").count() == 200  # pre-add files null-fill
    # physical consistency: the new file stores the PHYSICAL name
    m = read_manifest(table)
    assert "v" in m["column_stats"] and "value" not in m["column_stats"]
    # stale producers fail loudly
    with pytest.raises(ValueError, match="pre-rename"):
        write_table(extra.withColumnRenamed("value", "v"), table, mode="append")
    # writes to a dropped column fail loudly
    alter_table(table, drop=["tag"])
    with pytest.raises(ValueError, match="dropped"):
        write_table(extra, table, mode="append")


def test_protected_columns_refuse(spark, table):
    from nimble_spark.sources.deletes import delete_rows

    with pytest.raises(ValueError, match="cluster index key"):
        alter_table(table, rename={"k": "key"})
    with pytest.raises(ValueError, match="cluster index key"):
        alter_table(table, drop=["k"])
    delete_rows(spark, table, "tag", ["3"])
    with pytest.raises(ValueError, match="pending delete masks"):
        alter_table(table, drop=["tag"])


def test_rename_carries_pending_mask(spark, table):
    """Masks keep applying across ANY number of renames: directories
    are named by the PHYSICAL column name (stable), and reads resolve
    them through the rename map — no dir move, no crash window."""
    from nimble_spark.sources.deletes import delete_rows, read_with_deletes

    delete_rows(spark, table, "tag", ["3"])
    masked = read_with_deletes(spark, table).count()
    alter_table(table, rename={"tag": "label"})
    t = read_with_deletes(spark, table)
    assert "label" in t.columns and t.count() == masked  # mask still applies
    # a mask recorded BETWEEN renames also lands under the physical dir
    delete_rows(spark, table, "label", ["5"])
    alter_table(table, rename={"label": "category"})
    t2 = read_with_deletes(spark, table)
    assert "category" in t2.columns
    assert t2.filter("category IN ('3','5')").count() == 0
    assert os.path.isdir(os.path.join(table, "_nimble", "deletes", "tag"))
    # dropping the twice-renamed masked column still refuses
    with pytest.raises(ValueError, match="pending delete masks"):
        alter_table(table, drop=["category"])


def test_merge_update_compact_on_altered_table(spark, table):
    from nimble_spark.sources.compaction import compact_table
    from nimble_spark.sources.merge import merge_into, update_where

    alter_table(table, rename={"v": "value"}, add={"note": "string"})
    src = spark.createDataFrame(
        [(7, 700.0, "x", "merged"), (999, 1.0, "y", "new")],
        "k long, value double, tag string, note string",
    )
    merge_into(spark, table, src, key="k")
    t = read_table(spark, table)
    assert t.count() == 201
    assert t.filter("k = 7").first()["value"] == 700.0
    assert t.filter("note = 'new'").count() == 1
    update_where(spark, table, "k = 3", {"value": "0.0"})
    assert read_table(spark, table).filter("k = 3").first()["value"] == 0.0
    # the mapping survives partial rewrites
    assert read_manifest(table).get("schema_mapping")
    write_table(
        spark.createDataFrame([(2000, 1.0, "z", None)], src.schema),
        table, mode="append",
    )
    compact_table(spark, table, target_file_bytes=256 * 1024 * 1024)
    t2 = read_table(spark, table)
    assert t2.columns == ["k", "value", "tag", "note"]
    assert t2.count() == 202


def test_full_rewrite_materializes_mapping(spark, table):
    from nimble_spark.sources.deletes import compact_deletes, delete_rows

    alter_table(table, rename={"v": "value"}, drop=["tag"])
    delete_rows(spark, table, "k", [5])
    compact_deletes(spark, table)
    m = read_manifest(table)
    assert m.get("schema_mapping") is None  # materialized
    t = read_table(spark, table)
    assert t.columns == ["k", "value"] and t.count() == 199
    # physical == logical now
    assert [f["name"] for f in m["schema"]["fields"]] == ["k", "value"]


def test_pyds_reads_logical_and_refuses_append(spark, table):
    from nimble_spark.sources.datasource import register_nimble_source

    register_nimble_source(spark)
    alter_table(table, rename={"v": "value"}, drop=["tag"], add={"note": "string"})
    d = spark.read.format("nimble").option("pushdown", "true").load(table)
    assert d.columns == ["k", "value", "note"]
    assert d.filter(F.col("value") > 100).count() == read_table(
        spark, table
    ).filter("value > 100").count()
    assert d.filter("note IS NULL").count() == 200
    with pytest.raises(Exception, match="alter_table|write_table"):
        spark.createDataFrame(
            [(1, 1.0, None)], "k long, value double, note string"
        ).write.format("nimble").mode("append").save(table)


def test_clone_carries_mapping(spark, table, tmp_path):
    from nimble_spark.sources.clone import clone_table

    alter_table(table, rename={"v": "value"})
    cl = str(tmp_path / "cl")
    clone_table(spark, table, cl, shallow=True)
    t = read_table(spark, cl)
    assert "value" in t.columns
    assert t.agg(F.sum("value")).first()[0] == float(sum(range(200)))


@pytest.mark.parametrize("seed", [5, 83])
def test_alter_lifecycle_fuzz(spark, tmp_path, seed):
    """Seeded interleaving of renames/adds with appends, merges,
    updates and compactions, checked against a dict model after every
    step. The invariant: the logical view — under whatever name the
    value column currently has — always equals the model, and the
    stored physical name never changes (zero data rewritten by any
    alter)."""
    import random

    from nimble_spark.sources.compaction import compact_table
    from nimble_spark.sources.merge import merge_into, update_where

    rng = random.Random(seed)
    path = str(tmp_path / "t")
    model = {k: float(k) for k in range(50)}
    vname = "v"
    extra_cols: list[str] = []
    next_key = 50
    gen = 0

    def _df(rows):
        cols = f"k long, {vname} double" + "".join(
            f", {c} string" for c in extra_cols
        )
        return spark.createDataFrame(
            [(k, v) + (None,) * len(extra_cols) for k, v in rows], cols
        )

    write_table(
        _df(model.items()).selectExpr("k", f"{vname}"),
        path,
        WriteOptions(cluster_by=["k"], n_cluster_files=2),
    )
    for _step in range(12):
        op = rng.choice(["rename", "add", "append", "merge", "update", "compact"])
        if op == "rename":
            gen += 1
            new = f"v{gen}"
            alter_table(path, rename={vname: new})
            vname = new
        elif op == "add":
            gen += 1
            c = f"c{gen}"
            alter_table(path, add={c: "string"})
            extra_cols.append(c)
        elif op == "append":
            fresh = {next_key + i: float(next_key + i) for i in range(3)}
            next_key += 3
            write_table(_df(fresh.items()), path, mode="append")
            model.update(fresh)
        elif op == "merge":
            ups = {
                k: float(rng.randint(0, 999))
                for k in rng.sample(sorted(model), 3)
            }
            merge_into(spark, path, _df(ups.items()), key="k")
            model.update(ups)
        elif op == "update":
            pivot = rng.randint(0, next_key)
            update_where(spark, path, f"k >= {pivot}", {vname: f"{vname} + 1"})
            model.update({k: v + 1 for k, v in model.items() if k >= pivot})
        elif op == "compact":
            try:
                compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
            except ValueError:
                pass  # single file — nothing to do
        t = read_table(spark, path)
        got = {r["k"]: r[vname] for r in t.collect()}
        assert got == model, f"step {_step} op {op} seed {seed}"
        assert set(t.columns) == {"k", vname, *extra_cols}
    # every alter was metadata-only: the stored physical name is still
    # the original (or the rename map says so)
    m = read_manifest(path)
    if vname != "v":
        ren = (m.get("schema_mapping") or {}).get("renames") or {}
        assert any(l == vname for l in ren.values())


def test_dsl_alter_and_logical_describe(spark, table):
    from nimble_spark.tools import run_command

    d = run_command(spark, table, "ALTER RENAME v TO value")
    cols = {r.column: r.attributes for r in d.collect()}
    assert "value" in cols and "v" not in cols
    assert '"stored_as": "v"' in cols["value"]
    run_command(spark, table, "ALTER DROP tag")
    run_command(spark, table, "ALTER ADD note string")
    got = {r.column for r in run_command(spark, table, "DESCRIBE").collect()}
    assert got == {"k", "value", "note"}
    tree = {r.path for r in run_command(spark, table, "SHOW SCHEMA").collect()}
    assert "value" in tree and "tag" not in tree
    t = read_table(spark, table)
    assert t.columns == ["k", "value", "note"]


def test_time_travel_and_range_scan_on_renamed(spark, table):
    alter_table(table, rename={"v": "value"})
    # time travel to the pre-alter commit still surfaces the CURRENT
    # logical view (the mapping is a table property, not snapshot state)
    t0 = read_table(spark, table, as_of_commit=0)
    assert "value" in t0.columns and t0.count() == 200
    # residual range scan on the renamed (unindexed) column
    n = read_table(spark, table, range_scan=("value", 10.0, 20.0)).count()
    assert n == 11
    with pytest.raises(ValueError, match="nothing to do"):
        alter_table(table)


def test_alter_widen(spark, tmp_path):
    """Persisted type widening (r8): metadata-only declared-type
    change; files keep narrow bytes, reads upcast, appends may land
    the wide type, narrowing and protected keys refuse."""
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.sources.table import WriteOptions, read_table, write_table

    path = str(tmp_path / "w")
    write_table(
        spark.createDataFrame([(1, 1.5), (2, 2.5)], "k INT, v FLOAT"),
        path,
        WriteOptions(),
    )
    alter_table(path, widen={"k": "bigint", "v": "double"})
    got = read_table(spark, path)
    assert dict(got.dtypes) == {"k": "bigint", "v": "double"}
    assert {r.k for r in got.collect()} == {1, 2}

    # appends may now land the wide type directly — beyond int32 range
    write_table(
        spark.createDataFrame([(2**40, 9.5)], "k LONG, v DOUBLE"),
        path,
        WriteOptions(),
        mode="append",
    )
    rows = {(r.k, r.v) for r in read_table(spark, path).collect()}
    assert (2**40, 9.5) in rows and (1, 1.5) in rows

    # narrowing refuses (declared is now bigint)
    with pytest.raises(ValueError, match="lossless"):
        alter_table(path, widen={"k": "int"})
    # unknown column refuses
    with pytest.raises(ValueError, match="no column"):
        alter_table(path, widen={"zzz": "bigint"})

    # widen composes with rename: the NEW logical name resolves
    alter_table(path, rename={"v": "val"})
    # v was already double; widen a fresh narrow column instead
    alter_table(path, add={"extra": "int"})
    # added columns are declared-typed only (no file bytes): widening
    # them is legal and trivially lossless
    alter_table(path, widen={"extra": "bigint"})
    assert dict(read_table(spark, path).dtypes)["extra"] == "bigint"


def test_alter_widen_refuses_protected_keys(spark, tmp_path):
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.sources.table import WriteOptions, read_table, write_table

    path = str(tmp_path / "p")
    write_table(
        spark.createDataFrame([(i, i) for i in range(10)], "k INT, v INT"),
        path,
        WriteOptions(bucket_by="k", n_buckets=2),
    )
    # hash routing and parquet blooms hash the STORED width — a
    # widened probe would route/filter wrong
    with pytest.raises(ValueError, match="hash index key"):
        alter_table(path, widen={"k": "bigint"})
    alter_table(path, widen={"v": "bigint"})  # non-key fine
    assert dict(read_table(spark, path).dtypes)["v"] == "bigint"


def test_dsl_alter_widen(spark, tmp_path):
    from nimble_spark.sources.table import WriteOptions, read_table, write_table
    from nimble_spark.tools import run_command

    path = str(tmp_path / "dw")
    write_table(
        spark.createDataFrame([(1, 2)], "k INT, v INT"), path, WriteOptions()
    )
    out = run_command(spark, path, "ALTER WIDEN v bigint")
    types = {r.column: r.type for r in out.collect()} if "column" in out.columns else {}
    assert dict(read_table(spark, path).dtypes)["v"] == "bigint"


def test_pyds_reads_widened_table(spark, tmp_path):
    """format('nimble') honors the widened declared schema: Spark
    validates Arrow batches against the DS schema (the manifest), so
    narrow file vectors must upcast worker-side — before the fix the
    vectorized accessor crashed (getLong on an int32 vector)."""
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.sources.datasource import register_nimble_source
    from nimble_spark.sources.table import WriteOptions, write_table

    register_nimble_source(spark)
    path = str(tmp_path / "wp")
    write_table(
        spark.createDataFrame([(1, 1.5), (2, 2.5)], "k INT, v FLOAT"),
        path,
        WriteOptions(),
    )
    alter_table(path, widen={"k": "bigint", "v": "double"})
    df = spark.read.format("nimble").load(path)
    assert dict(df.dtypes) == {"k": "bigint", "v": "double"}
    assert sorted((r.k, r.v) for r in df.collect()) == [(1, 1.5), (2, 2.5)]


def test_duckdb_relation_widened_table(tmp_path, spark, duck):
    """Cross-engine read of a widened table: mixed file widths need
    union_by_name, and every declared-typed column pins to the
    manifest type — DuckDB must see the same logical schema Spark
    serves."""
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.sources.interop import duckdb_relation
    from nimble_spark.sources.table import WriteOptions, write_table

    path = str(tmp_path / "dk")
    write_table(
        spark.createDataFrame([(1, 10)], "k INT, v INT"), path, WriteOptions()
    )
    alter_table(path, widen={"k": "bigint"})
    write_table(
        spark.createDataFrame([(2**40, 20)], "k LONG, v INT"),
        path,
        WriteOptions(),
        mode="append",
    )
    rel = duckdb_relation(duck, path)
    types = dict(zip(rel.columns, [str(t) for t in rel.types]))
    assert types["k"] == "BIGINT", types
    assert sorted(r[0] for r in rel.fetchall()) == [1, 2**40]
