"""Per-file KMV NDV synopses (WriteOptions.ndv_columns →
compaction.fast_ndv): the mergeable-sketch answer to SURVEY §7's
flagged "exact-NDV at 100 TB" hard part. Exact below NDV_K distincts,
standard KMV estimator above; synopses stay complete across appends,
compaction, and full rewrites; masked tables and undeclared columns
refuse loudly."""

import pytest

from nimble_spark.sources.compaction import compact_table, fast_ndv
from nimble_spark.sources.table import (
    NDV_K,
    WriteOptions,
    read_manifest,
    write_table,
)


def _opts(**kw):
    return WriteOptions(cluster_by=["k"], n_cluster_files=4, ndv_columns=["tag"], **kw)


def _rows(spark, lo, hi, mod):
    return spark.range(lo, hi).selectExpr("id AS k", f"CAST(id % {mod} AS STRING) AS tag")


def test_exact_regime_and_append_freshness(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(_rows(spark, 0, 500, 40), path, _opts())
    r = fast_ndv(path, "tag")
    assert r == {"ndv": 40, "exact": True, "k": NDV_K}
    # append introduces 10 new tag values (40..49); the fold sees them
    write_table(
        spark.range(0, 100).selectExpr("id AS k", "CAST(40 + id % 10 AS STRING) AS tag"),
        path,
        mode="append",
    )
    assert fast_ndv(path, "tag") == {"ndv": 50, "exact": True, "k": NDV_K}
    # every entry carries a synopsis (append computed only its own)
    m = read_manifest(path)
    assert all("ndv" in f for f in m["files"])
    assert m["ndv_columns"] == ["tag"]


def test_estimator_regime_accuracy(spark, tmp_path):
    path = str(tmp_path / "t")
    n = 20000  # >> NDV_K distincts
    write_table(
        spark.range(0, n).selectExpr("id AS k", "CAST(id AS STRING) AS tag"),
        path,
        _opts(),
    )
    r = fast_ndv(path, "tag")
    assert not r["exact"]
    # KMV with K=256 has ~1/sqrt(K) ≈ 6% relative error; allow 4 sigma
    assert abs(r["ndv"] - n) / n < 0.25, r


def test_maintenance_keeps_synopses_complete(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(_rows(spark, 0, 200, 13), path, _opts())
    write_table(_rows(spark, 200, 400, 13), path, mode="append")
    res = compact_table(spark, path, target_file_bytes=1 << 30)
    assert res["files_after"] < res["files_before"]
    assert all("ndv" in f for f in read_manifest(path)["files"])
    assert fast_ndv(path, "tag") == {"ndv": 13, "exact": True, "k": NDV_K}


def test_full_rewrite_carries_declaration(spark, tmp_path):
    from nimble_spark.sources.deletes import compact_deletes, delete_rows

    path = str(tmp_path / "t")
    write_table(_rows(spark, 0, 300, 7), path, _opts())
    delete_rows(spark, path, "k", [0, 1])
    # masked tables refuse (the synopsis cannot un-count masked rows)
    with pytest.raises(ValueError, match="delete masks"):
        fast_ndv(path, "tag")
    compact_deletes(spark, path)  # full rewrite via layout_options_of
    assert fast_ndv(path, "tag")["ndv"] == 7
    assert read_manifest(path)["ndv_columns"] == ["tag"]


def test_undeclared_and_renamed_columns(spark, tmp_path):
    from nimble_spark.sources.alter import alter_table

    path = str(tmp_path / "t")
    write_table(_rows(spark, 0, 100, 5), path, _opts())
    with pytest.raises(ValueError, match="no NDV synopsis"):
        fast_ndv(path, "k")
    alter_table(path, rename={"tag": "label"})
    # current logical name resolves to the physical synopsis
    assert fast_ndv(path, "label")["ndv"] == 5
    with pytest.raises(ValueError, match="pre-rename|dropped"):
        fast_ndv(path, "tag")


def test_show_ndv_dsl(spark, tmp_path):
    from nimble_spark.tools import run_command

    path = str(tmp_path / "t")
    write_table(_rows(spark, 0, 100, 9), path, _opts())
    rows = {r["column"]: r for r in run_command(spark, path, "SHOW NDV").collect()}
    assert rows["tag"]["ndv"] == 9 and rows["tag"]["exact"]
    one = run_command(spark, path, "show ndv tag").collect()
    assert len(one) == 1 and one[0]["ndv"] == 9


# ----------------------------------------------------------- fast_sum


def test_fast_sum_exact_int_and_double(spark, tmp_path):
    from nimble_spark.sources.compaction import fast_sum

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 1000).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) / 7 AS v"
        ),
        path,
        WriteOptions(cluster_by=["k"], n_cluster_files=4,
                     sum_columns=["k", "v"]),
    )
    r = fast_sum(path, "k")
    assert r["sum"] == sum(range(1000)) and r["rows"] == 1000
    # doubles: per-value FLOOR(x*1e6+0.5) quantization, exact int fold
    expect = sum(int(x / 7 * 1e6 + 0.5) for x in range(1000)) / 1e6
    assert fast_sum(path, "v")["sum"] == expect
    # append keeps the fold exact
    write_table(
        spark.range(1000, 1100).selectExpr("id AS k", "CAST(0.5 AS DOUBLE) AS v"),
        path,
        mode="append",
    )
    r2 = fast_sum(path, "k")
    assert r2["sum"] == sum(range(1100)) and r2["rows"] == 1100


def test_fast_sum_fences(spark, tmp_path):
    from nimble_spark.sources.compaction import fast_sum
    from nimble_spark.sources.deletes import delete_rows

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
        path,
        WriteOptions(sum_columns=["k"]),
    )
    with pytest.raises(ValueError, match="no SUM synopsis"):
        fast_sum(path, "v")
    delete_rows(spark, path, "k", [1])
    with pytest.raises(ValueError, match="delete masks"):
        fast_sum(path, "k")


def test_fast_sum_survives_maintenance(spark, tmp_path):
    from nimble_spark.sources.compaction import compact_table, fast_sum

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 300).selectExpr("id AS k"),
        path,
        WriteOptions(cluster_by=["k"], n_cluster_files=3, sum_columns=["k"]),
    )
    write_table(spark.range(300, 400).selectExpr("id AS k"), path, mode="append")
    compact_table(spark, path, target_file_bytes=1 << 30)
    assert fast_sum(path, "k")["sum"] == sum(range(400))
    assert read_manifest(path)["sum_columns"] == ["k"]


def test_show_sums_dsl(spark, tmp_path):
    from nimble_spark.tools import run_command

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 100).selectExpr("id AS k"),
        path,
        WriteOptions(sum_columns=["k"]),
    )
    rows = run_command(spark, path, "SHOW SUMS").collect()
    assert len(rows) == 1
    # integer sums surface as exact decimal STRINGs (lossless > 2^53)
    assert rows[0]["sum"] == str(sum(range(100)))
    assert rows[0]["avg"] == sum(range(100)) / 100.0


def test_sum_columns_refuse_inexact_types(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(Exception, match="integer and floating"):
        write_table(
            spark.range(0, 10).selectExpr(
                "id AS k", "CAST(id AS DECIMAL(10,2)) AS d"
            ),
            path,
            WriteOptions(sum_columns=["d"]),
        )


def test_fast_grouped_sum(spark, tmp_path):
    from nimble_spark.sources.compaction import fast_grouped_sum

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 120).selectExpr(
            "CAST(id % 3 AS STRING) AS p", "id AS k"
        ),
        path,
        WriteOptions(partition_by=["p"], sum_columns=["k"]),
    )
    got = dict(fast_grouped_sum(path, "k"))
    want = {str(g): sum(i for i in range(120) if i % 3 == g) for g in range(3)}
    assert got == want
    # append keeps groups exact (new partition value appears)
    write_table(
        spark.createDataFrame([("9", 1000), ("9", 1)], "p STRING, k LONG"),
        path,
        WriteOptions(partition_by=["p"]),
        mode="append",
    )
    got2 = dict(fast_grouped_sum(path, "k"))
    assert got2["9"] == 1001 and got2["0"] == want["0"]
    # fences: unpartitioned / multi-key tables refuse
    flat = str(tmp_path / "flat")
    write_table(
        spark.range(0, 10).selectExpr("id AS k"), flat,
        WriteOptions(sum_columns=["k"]),
    )
    with pytest.raises(ValueError, match="partition key"):
        fast_grouped_sum(flat, "k")


def test_rollback_recomputes_synopses(spark, tmp_path):
    from nimble_spark.sources.compaction import compact_table, fast_sum
    from nimble_spark.sources.table import rollback_table

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 200).selectExpr("id AS k"),
        path,
        WriteOptions(cluster_by=["k"], n_cluster_files=2, sum_columns=["k"]),
    )
    write_table(spark.range(200, 300).selectExpr("id AS k"), path, mode="append")
    compact_table(spark, path, target_file_bytes=1 << 30)
    # roll back past the compaction: tombstoned originals re-home and
    # their synopses recompute, so the stats paths keep answering
    rollback_table(spark, path, commit=1)
    assert fast_sum(path, "k")["sum"] == sum(range(300))
    assert all("sums" in f for f in read_manifest(path)["files"])


def test_show_ndv_sums_after_rename(spark, tmp_path):
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.tools import run_command

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 50).selectExpr("id AS k", "CAST(id % 5 AS STRING) AS tag"),
        path,
        WriteOptions(ndv_columns=["tag"], sum_columns=["k"]),
    )
    alter_table(path, rename={"tag": "label", "k": "key"})
    ndv = run_command(spark, path, "SHOW NDV").collect()
    assert [r["column"] for r in ndv] == ["label"] and ndv[0]["ndv"] == 5
    sums = run_command(spark, path, "SHOW SUMS").collect()
    assert [r["column"] for r in sums] == ["key"]
    assert sums[0]["sum"] == str(sum(range(50)))


def test_show_grouped_sums_dsl(spark, tmp_path):
    """r8: SHOW GROUPED SUMS col — the metadata-answered per-partition
    rollup through the DSL string interface, sums as exact strings."""
    from nimble_spark.tools import run_command

    path = str(tmp_path / "g")
    write_table(
        spark.range(0, 60).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p"),
        path,
        WriteOptions(partition_by=["p"], sum_columns=["k"]),
    )
    rows = run_command(spark, path, "SHOW GROUPED SUMS k").collect()
    got = {(r["group"], r["rows"], r["sum"]) for r in rows}
    want = {
        (str(g), 20, str(sum(i for i in range(60) if i % 3 == g)))
        for g in range(3)
    }
    assert got == want


def test_show_grouped_sums_refuses_multikey(spark, tmp_path):
    """r9 (VERDICT r8 nit #1): SHOW GROUPED SUMS on a MULTI-key
    partitioned table refuses loudly — the per-group counts are keyed
    on the single declared partition key, and a naive first-`key=`
    path split must never silently count the wrong segment."""
    import pytest as _pytest

    from nimble_spark.tools import run_command

    path = str(tmp_path / "mk")
    write_table(
        spark.range(0, 40).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS a", "CAST(id % 4 AS STRING) AS b"
        ),
        path,
        WriteOptions(partition_by=["a", "b"], sum_columns=["k"]),
    )
    with _pytest.raises(ValueError, match="single Hive partition"):
        run_command(spark, path, "SHOW GROUPED SUMS k")


def test_show_grouped_sums_ambient_kv_segment(spark, tmp_path):
    """r9: a `key=value`-shaped directory segment ABOVE the table root
    (exp=9/) must not confuse the per-group counts — they key on the
    DECLARED partition key via the canonical Hive parser, not on the
    first `=` in the path."""
    import os as _os

    from nimble_spark.tools import run_command

    base = str(tmp_path / "exp=9")
    _os.makedirs(base, exist_ok=True)
    path = f"{base}/g"
    write_table(
        spark.range(0, 30).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p"),
        path,
        WriteOptions(partition_by=["p"], sum_columns=["k"]),
    )
    rows = run_command(spark, path, "SHOW GROUPED SUMS k").collect()
    got = {(r["group"], r["rows"], r["sum"]) for r in rows}
    want = {
        (str(g), 10, str(sum(i for i in range(30) if i % 3 == g)))
        for g in range(3)
    }
    assert got == want


def test_dsl_select_count_star_statistics(spark, tmp_path):
    """r8: DSL SELECT COUNT(*) is answered from manifest statistics
    with an explain column — and refuses under pending delete masks
    (the fast_count fence), never over-reports."""
    import pytest as _pytest

    from nimble_spark.sources.deletes import delete_rows
    from nimble_spark.tools import run_command

    path = str(tmp_path / "c")
    write_table(spark.range(0, 123).selectExpr("id AS k"), path, WriteOptions())
    row = run_command(spark, path, "SELECT COUNT(*)").collect()[0]
    assert row["count"] == 123
    assert "statistics" in row["answered_by"]
    # FROM is accepted and ignored, like the SELECT grammar
    assert run_command(spark, path, "SELECT COUNT(*) FROM t").collect()[0]["count"] == 123
    delete_rows(spark, path, "k", [1, 2])
    with _pytest.raises(ValueError, match="delete masks"):
        run_command(spark, path, "SELECT COUNT(*)")


def test_fast_count_mask_fence(spark, tmp_path):
    """r8: fast_count gained the same pending-delete-mask fence as
    every other fast_* (it was the one member without it — manifest
    rows over-report against merge-on-read masks)."""
    import pytest as _pytest

    from nimble_spark.sources.compaction import fast_count
    from nimble_spark.sources.deletes import compact_deletes, delete_rows

    path = str(tmp_path / "f")
    write_table(spark.range(0, 100).selectExpr("id AS k"), path, WriteOptions())
    assert fast_count(spark, path) == 100
    delete_rows(spark, path, "k", [5])
    with _pytest.raises(ValueError, match="over-report"):
        fast_count(spark, path)
    compact_deletes(spark, path)
    assert fast_count(spark, path) == 99


def test_dsl_select_sum_and_count_distinct(spark, tmp_path):
    """r8: DSL SELECT SUM(col) / COUNT(DISTINCT col) route through the
    synopsis paths with answered_by explain columns; undeclared
    columns refuse with the declaration remedy."""
    import pytest as _pytest

    from nimble_spark.tools import run_command

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 200).selectExpr("id AS k", "CAST(id % 9 AS STRING) AS tag"),
        path,
        WriteOptions(sum_columns=["k"], ndv_columns=["tag"]),
    )
    r = run_command(spark, path, "SELECT SUM(k)").collect()[0]
    assert r["sum"] == str(sum(range(200))) and "statistics" in r["answered_by"]
    r = run_command(spark, path, "SELECT COUNT(DISTINCT tag) FROM t").collect()[0]
    assert r["count"] == 9 and r["exact"] and "exact" in r["answered_by"]
    with _pytest.raises(ValueError, match="no SUM synopsis"):
        run_command(spark, path, "SELECT SUM(tag)")
    with _pytest.raises(ValueError, match="no NDV synopsis"):
        run_command(spark, path, "SELECT COUNT(DISTINCT k)")
