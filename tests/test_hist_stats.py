"""Per-file value-histogram synopses (WriteOptions.histogram_columns →
compaction.fast_value_counts / fast_mode / fast_median): exact value
distributions for low-cardinality columns from metadata alone. Exact
or loud — overflowed files, masked tables, undeclared/stale names all
refuse; appends and maintenance keep every entry's histogram current.
"""

import pytest

from nimble_spark.sources.compaction import (
    compact_table,
    fast_median,
    fast_mode,
    fast_value_counts,
)
from nimble_spark.sources.table import (
    HIST_K,
    WriteOptions,
    read_manifest,
    write_table,
)


def _opts(**kw):
    return WriteOptions(
        cluster_by=["k"], n_cluster_files=4, histogram_columns=["tag"], **kw
    )


def _rows(spark, lo, hi, mod):
    return spark.range(lo, hi).selectExpr(
        "id AS k", f"CAST(id % {mod} AS STRING) AS tag"
    )


def test_exact_counts_and_append_freshness(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(_rows(spark, 0, 300, 3), path, _opts())
    assert fast_value_counts(path, "tag") == [("0", 100), ("1", 100), ("2", 100)]
    write_table(
        spark.range(0, 50).selectExpr("id AS k", "'9' AS tag"), path, mode="append"
    )
    got = dict(fast_value_counts(path, "tag"))
    assert got == {"0": 100, "1": 100, "2": 100, "9": 50}
    assert all("hist" in f for f in read_manifest(path)["files"])
    assert read_manifest(path)["histogram_columns"] == ["tag"]


def test_mode_and_median(spark, tmp_path):
    path = str(tmp_path / "m")
    # values 0..9 with frequency id%10<5 doubled: mode tie broken low
    write_table(
        spark.range(0, 100).selectExpr(
            "id AS k", "CAST(id % 4 AS INT) AS v"  # 25 each → tie → min
        ),
        path,
        WriteOptions(histogram_columns=["v"]),
    )
    assert fast_mode(path, "v") == (0, 25)
    # median of 0,1,2,3 × 25 each = (1+2)/2
    assert fast_median(path, "v") == 1.5
    odd = str(tmp_path / "o")
    write_table(
        spark.range(0, 101).selectExpr("id AS k", "CAST(id % 3 AS INT) AS v"),
        odd,
        WriteOptions(histogram_columns=["v"]),
    )
    # 101 values of 0(34),1(34),2(33): middle rank 50 → value 1
    assert fast_median(odd, "v") == 1.0
    # string histograms are fine — only MEDIAN refuses on them
    s_path = str(tmp_path / "s2")
    write_table(
        spark.range(0, 10).selectExpr("id AS k", "CAST(id % 2 AS STRING) AS s"),
        s_path,
        WriteOptions(histogram_columns=["s"]),
    )
    with pytest.raises(ValueError, match="integer column"):
        fast_median(s_path, "s")


def test_overflow_refuses_loudly(spark, tmp_path):
    # per-FILE overflow: one file with > HIST_K distincts stores an
    # overflow marker and the fold refuses
    path = str(tmp_path / "t")
    write_table(
        spark.range(0, HIST_K * 4).coalesce(1).selectExpr(
            "id AS k", "CAST(id AS STRING) AS tag"
        ),
        path,
        WriteOptions(histogram_columns=["tag"]),
    )
    with pytest.raises(ValueError, match="HIST_K"):
        fast_value_counts(path, "tag")
    # table-level overflow: per-file histograms each under the cap,
    # but the UNION exceeds it — must refuse identically (the contract
    # cannot depend on file layout)
    path2 = str(tmp_path / "u")
    write_table(
        spark.range(0, HIST_K * 4).repartition(32).selectExpr(
            "id AS k", "CAST(id AS STRING) AS tag"
        ),
        path2,
        WriteOptions(histogram_columns=["tag"]),
    )
    with pytest.raises(ValueError, match="HIST_K"):
        fast_value_counts(path2, "tag")


def test_fences_mask_undeclared_rename(spark, tmp_path):
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.sources.deletes import delete_rows

    path = str(tmp_path / "t")
    write_table(_rows(spark, 0, 100, 5), path, _opts())
    with pytest.raises(ValueError, match="no value histogram"):
        fast_value_counts(path, "k")
    alter_table(path, rename={"tag": "label"})
    assert dict(fast_value_counts(path, "label"))["0"] == 20
    delete_rows(spark, path, "k", [1, 2])
    with pytest.raises(ValueError, match="delete masks"):
        fast_value_counts(path, "label")


def test_maintenance_keeps_histograms_complete(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(_rows(spark, 0, 200, 4), path, _opts())
    write_table(_rows(spark, 200, 400, 4), path, mode="append")
    res = compact_table(spark, path, target_file_bytes=1 << 30)
    assert res["files_after"] < res["files_before"]
    assert all("hist" in f for f in read_manifest(path)["files"])
    assert dict(fast_value_counts(path, "tag")) == {str(i): 100 for i in range(4)}


def test_boolean_histogram_and_type_refusal(spark, tmp_path):
    path = str(tmp_path / "b")
    write_table(
        spark.range(0, 30).selectExpr("id AS k", "id % 3 = 0 AS flag"),
        path,
        WriteOptions(histogram_columns=["flag"]),
    )
    assert fast_value_counts(path, "flag") == [(False, 20), (True, 10)]
    with pytest.raises(ValueError, match="integer/string/boolean"):
        write_table(
            spark.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS d"),
            str(tmp_path / "d"),
            WriteOptions(histogram_columns=["d"]),
        )


def test_show_value_counts_dsl(spark, tmp_path):
    from nimble_spark.tools import run_command

    path = str(tmp_path / "t")
    write_table(_rows(spark, 0, 90, 3), path, _opts())
    rows = run_command(spark, path, "SHOW VALUE COUNTS tag").collect()
    assert {(r["value"], r["count"]) for r in rows} == {
        ("0", 30), ("1", 30), ("2", 30)
    }


def test_declarations_normalize_and_refuse(spark, tmp_path):
    """r8 probe fixes: synopsis declarations (ndv/sum/hist alike) on a
    partition key refuse at WRITE (values live in paths, not file
    bytes — pre-fix: silently empty synopses, misleading error later);
    dedup-alias names resolve to their stored twin; nonexistent
    columns refuse; alter-renamed logical names resolve to physical."""
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.sources.compaction import fast_ndv

    with pytest.raises(ValueError, match="partition key"):
        write_table(
            spark.range(0, 30).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p"),
            str(tmp_path / "p"),
            WriteOptions(partition_by=["p"], histogram_columns=["p"]),
        )
    with pytest.raises(ValueError, match="partition key"):
        write_table(
            spark.range(0, 30).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p"),
            str(tmp_path / "p2"),
            WriteOptions(partition_by=["p"], sum_columns=["p"]),
        )
    with pytest.raises(ValueError, match="not a stored column"):
        write_table(
            spark.range(0, 5).selectExpr("id AS k"),
            str(tmp_path / "x"),
            WriteOptions(ndv_columns=["nope"]),
        )
    # dedup alias twin: declared under the alias, stored physically once
    d = str(tmp_path / "a")
    write_table(
        spark.range(0, 40).selectExpr(
            "CAST(id%4 AS STRING) AS tag", "CAST(id%4 AS STRING) AS tag2", "id AS k"
        ),
        d,
        WriteOptions(dedup_columns=True, histogram_columns=["tag2"], ndv_columns=["tag2"]),
    )
    m = read_manifest(d)
    assert m["histogram_columns"] == ["tag"] and m["ndv_columns"] == ["tag"]
    assert dict(fast_value_counts(d, "tag2")) == dict(fast_value_counts(d, "tag"))
    assert fast_ndv(d, "tag2")["ndv"] == 4
    # alter-renamed append: logical declaration lands under physical
    r = str(tmp_path / "r")
    write_table(
        spark.range(0, 30).selectExpr("id AS k", "CAST(id%3 AS STRING) AS tag"), r,
        WriteOptions(),
    )
    alter_table(r, rename={"tag": "label"})
    write_table(
        spark.range(30, 60).selectExpr("id AS k", "CAST(id%3 AS STRING) AS label"),
        r,
        WriteOptions(histogram_columns=["label"]),
        mode="append",
    )
    assert read_manifest(r)["histogram_columns"] == ["tag"]
    # pre-declaration files still fence loudly with the remedy
    with pytest.raises(ValueError, match="compact or"):
        fast_value_counts(r, "label")
    compact_table(spark, r, target_file_bytes=1 << 30)
    assert sum(dict(fast_value_counts(r, "label")).values()) == 60


def test_show_info_lists_synopsis_declarations(spark, tmp_path):
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.tools import run_command

    path = str(tmp_path / "i")
    write_table(
        _rows(spark, 0, 30, 3), path,
        WriteOptions(ndv_columns=["tag"], sum_columns=["k"], histogram_columns=["tag"]),
    )
    alter_table(path, rename={"tag": "label"})
    info = {r["key"]: r["value"] for r in run_command(spark, path, "SHOW INFO").collect()}
    assert info["synopses.ndv_columns"] == "label"
    assert info["synopses.sum_columns"] == "k"
    assert info["synopses.histogram_columns"] == "label"


def test_rename_then_full_rewrite_carries_synopses(spark, tmp_path):
    """r8 soak catch: a full rewrite (compact_deletes / recluster)
    materializes the LOGICAL view, so synopsis declarations carried
    under stale PHYSICAL names must translate — pre-fix the rewrite
    silently skipped the absent column and fast_* later misblamed
    'written before declared'."""
    from nimble_spark.sources.alter import alter_table
    from nimble_spark.sources.compaction import fast_ndv, fast_sum, recluster_table
    from nimble_spark.sources.deletes import compact_deletes, delete_rows

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 60).selectExpr("id AS k", "id * 10 AS v"),
        path,
        WriteOptions(
            cluster_by=["k"], n_cluster_files=2,
            ndv_columns=["k"], sum_columns=["v"], histogram_columns=["v"],
        ),
    )
    alter_table(path, rename={"v": "val"})
    delete_rows(spark, path, "k", [0])
    compact_deletes(spark, path)  # full rewrite, logical view stored
    assert fast_sum(path, "val")["sum"] == sum(i * 10 for i in range(1, 60))
    assert fast_ndv(path, "k")["ndv"] == 59
    assert sum(dict(fast_value_counts(path, "val")).values()) == 59
    # a second full-rewrite flavor on the now-clean table
    recluster_table(spark, path, n_files=3)
    assert fast_sum(path, "val")["sum"] == sum(i * 10 for i in range(1, 60))


def test_fast_partition_stats(spark, tmp_path):
    """r8: partition-scoped metadata folds — rows/sum/ndv/value-counts
    of one Hive partition from its file synopses alone; typos on the
    partition key refuse rather than folding the whole table."""
    from nimble_spark.sources.compaction import fast_partition_stats

    path = str(tmp_path / "p")
    write_table(
        spark.range(0, 90).selectExpr(
            "id AS k", "CAST(id % 3 AS STRING) AS part", "CAST(id % 5 AS STRING) AS tag"
        ),
        path,
        WriteOptions(
            partition_by=["part"],
            sum_columns=["k"],
            ndv_columns=["tag"],
            histogram_columns=["tag"],
        ),
    )
    st = fast_partition_stats(path, ("part", "1"))
    want_keys = [i for i in range(90) if i % 3 == 1]
    assert st["rows"] == 30
    assert st["min"]["k"] == min(want_keys) and st["max"]["k"] == max(want_keys)
    assert st["sums"]["k"] == sum(want_keys)
    assert st["ndv"]["tag"] == len({str(i % 5) for i in want_keys})
    from collections import Counter

    assert st["value_counts"]["tag"] == dict(Counter(str(i % 5) for i in want_keys))
    with pytest.raises(ValueError, match="not a partition key"):
        fast_partition_stats(path, ("tag", "1"))


def test_show_partition_stats_dsl(spark, tmp_path):
    from nimble_spark.tools import run_command

    path = str(tmp_path / "d")
    write_table(
        spark.range(0, 60).selectExpr(
            "id AS k", "CAST(id % 2 AS STRING) AS part", "CAST(id % 3 AS STRING) AS tag"
        ),
        path,
        WriteOptions(partition_by=["part"], sum_columns=["k"], histogram_columns=["tag"]),
    )
    rows = {
        r["stat"]: r["value"]
        for r in run_command(spark, path, "SHOW PARTITION STATS part=1").collect()
    }
    odd = [i for i in range(60) if i % 2 == 1]
    assert rows["rows"] == "30"
    assert rows["sums.k"] == str(sum(odd))
    assert rows["min.k"] == "1" and rows["max.k"] == "59"
    from collections import Counter

    want = Counter(str(i % 3) for i in odd)
    for v, n in want.items():
        assert rows[f"value_counts.tag[{v}]"] == str(n)


def test_clone_carries_all_synopses(spark, tmp_path):
    """r8 probe: shallow clone answers fast_* from carried entries;
    deepen + clone-append stay exact; the source never moves."""
    from nimble_spark.sources.clone import clone_table, deepen_clone
    from nimble_spark.sources.compaction import fast_sum

    src = str(tmp_path / "s")
    write_table(
        spark.range(0, 50).selectExpr("id AS k", "CAST(id % 4 AS STRING) AS tag"),
        src,
        WriteOptions(sum_columns=["k"], histogram_columns=["tag"]),
    )
    dst = str(tmp_path / "c")
    clone_table(spark, src, dst, shallow=True)
    assert fast_sum(dst, "k")["sum"] == sum(range(50))
    deepen_clone(spark, dst)
    write_table(
        spark.range(50, 60).selectExpr("id AS k", "'9' AS tag"), dst, mode="append"
    )
    assert fast_sum(dst, "k")["sum"] == sum(range(60))
    assert fast_sum(src, "k")["sum"] == sum(range(50))
    assert dict(fast_value_counts(dst, "tag"))["9"] == 10


def test_fast_topk_and_dsl(spark, tmp_path):
    """fast_topk: exact k heaviest values, ties to the smaller value;
    DSL SHOW TOP k col renders the same; bad k refuses."""
    from nimble_spark.sources.compaction import fast_topk
    from nimble_spark.tools import run_command

    path = str(tmp_path / "topk")
    # frequencies: '0' x200, '1' x100, '2' x100, '3' x50 — '1'/'2' tie
    df = spark.sql(
        "SELECT id AS k, CASE WHEN id < 200 THEN '0' WHEN id < 300 THEN '1' "
        "WHEN id < 400 THEN '2' ELSE '3' END AS tag FROM range(450)"
    )
    write_table(df, path, _opts())
    assert fast_topk(path, "tag", 3) == [("0", 200), ("1", 100), ("2", 100)]
    assert fast_topk(path, "tag", 1) == [("0", 200)]
    # k beyond the domain returns the whole distribution, rank-ordered
    assert [v for v, _ in fast_topk(path, "tag", 99)] == ["0", "1", "2", "3"]
    with pytest.raises(ValueError, match="k must be"):
        fast_topk(path, "tag", 0)
    got = run_command(spark, path, "SHOW TOP 2 tag").collect()
    assert [(r.value, r["count"]) for r in got] == [("0", 200), ("1", 100)]
