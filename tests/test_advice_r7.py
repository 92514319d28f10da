"""Round-7 advisor regressions: mixed-schema rewrites, clone snapshot
consistency, and the alter contract on the remaining mutation paths.

Each test pins one of the round-6 ADVICE findings:
- compaction/recluster/fast_count must read rewrite bins with the
  manifest's DECLARED schema (single-file inference silently drops a
  column only newer files carry — durable data loss after alter ADD);
- clone_table must capture ONE consistent source snapshot (lock held
  across manifest read + mask copy) and never mutate the shared
  manifest cache entry;
- overwrite_partitions and delete_rows/delete_where must refuse
  stale/dropped/unknown column names loudly (the alter contract).
"""

import threading
import time

import pytest

from nimble_spark.sources.alter import alter_table
from nimble_spark.sources.clone import clone_table
from nimble_spark.sources.compaction import compact_table, fast_count
from nimble_spark.sources.deletes import delete_rows, read_with_deletes
from nimble_spark.sources.merge import overwrite_partitions
from nimble_spark.sources.table import (
    WriteOptions,
    read_manifest,
    read_table,
    table_write_lock,
    write_table,
)


@pytest.fixture()
def mixed_schema_table(spark, tmp_path):
    """Two appends straddling an alter ADD: the first file lacks the
    added column, the second carries real (non-null) values in it —
    the exact shape where one-footer schema inference loses data."""
    path = str(tmp_path / "t")
    old = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    write_table(old, path, WriteOptions(cluster_by=["k"], n_cluster_files=1))
    alter_table(path, add={"score": "double"})
    new = spark.range(100, 200).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v", "CAST(id * 2 AS DOUBLE) AS score"
    )
    write_table(new, path, mode="append")
    return path


def test_compaction_preserves_added_column_values(spark, mixed_schema_table):
    path = mixed_schema_table
    before = read_table(spark, path).filter("score IS NOT NULL").count()
    assert before == 100
    res = compact_table(spark, path, target_file_bytes=1 << 30)
    assert res["bins"] >= 1 and res["files_after"] < res["files_before"]
    t = read_table(spark, path)
    # real values in the newer file survived the merge; older rows null
    assert t.filter("score IS NOT NULL").count() == 100
    assert t.filter("score = k * 2").count() == 100
    assert t.count() == 200


def test_recluster_preserves_added_column_values(spark, mixed_schema_table):
    from nimble_spark.sources.compaction import _recluster_partial

    path = mixed_schema_table
    m = read_manifest(path)
    _recluster_partial(spark, path, m, target_file_bytes=1 << 30)
    t = read_table(spark, path)
    assert t.filter("score = k * 2").count() == 100
    assert t.count() == 200


def test_fast_count_boundary_read_survives_added_column(spark, mixed_schema_table):
    # range straddles both files; boundary files are opened — the scan
    # must not blow up (or miscount) on the file lacking `score`
    n = fast_count(spark, mixed_schema_table, range_filter=("k", 50, 150))
    assert n == 101


def test_clone_holds_source_lock(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_table(spark.range(0, 50).selectExpr("id AS k"), src, WriteOptions())
    done = threading.Event()

    def _clone():
        clone_table(spark, src, dst, shallow=True)
        done.set()

    with table_write_lock(src):
        th = threading.Thread(target=_clone, daemon=True)
        th.start()
        time.sleep(1.0)
        # a concurrent writer holds the source: the snapshot capture
        # must wait for one consistent version, not read through it
        assert not done.is_set()
    th.join(timeout=120)
    assert done.is_set()
    assert read_manifest(dst)["rows"] == 50


def test_deep_clone_does_not_poison_manifest_cache(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_table(spark.range(0, 10).selectExpr("id AS k"), src, WriteOptions())
    out = clone_table(spark, src, dst, shallow=False)
    out["user_metadata"]["poison"] = "x"
    fresh = read_manifest(dst, materialize=False)
    assert "poison" not in (fresh.get("user_metadata") or {})


def test_overwrite_partitions_refuses_stale_physical_name(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = spark.range(0, 40).selectExpr(
        "CAST(id % 4 AS STRING) AS p", "id AS k", "CAST(id AS DOUBLE) AS v"
    )
    write_table(rows, path, WriteOptions(partition_by=["p"]))
    alter_table(path, rename={"v": "value"})
    stale = spark.range(0, 10).selectExpr(
        "CAST(0 AS STRING) AS p", "id AS k", "CAST(id AS DOUBLE) AS v"
    )
    with pytest.raises(ValueError, match="pre-rename"):
        overwrite_partitions(spark, stale, path)
    # the logical name works
    ok = stale.withColumnRenamed("v", "value")
    overwrite_partitions(spark, ok, path)
    assert read_table(spark, path).filter("p = '0'").count() == 10


def test_delete_rows_validates_key(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = spark.range(0, 30).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    write_table(rows, path, WriteOptions())
    with pytest.raises(ValueError, match="not a column"):
        delete_rows(spark, path, "nope", [1, 2])
    alter_table(path, rename={"v": "value"}, add={"tag": "string"})
    alter_table(path, drop=["tag"])
    # dropped and stale-physical names both refuse (silent-no-op class)
    with pytest.raises(ValueError, match="not a column"):
        delete_rows(spark, path, "tag", ["x"])
    with pytest.raises(ValueError, match="not a column"):
        delete_rows(spark, path, "v", [1.0])
    # the current logical name applies for real
    delete_rows(spark, path, "value", [1.0, 2.0])
    assert read_with_deletes(spark, path).count() == 28


def test_stats_paths_resolve_alter_renames(spark, tmp_path):
    """r7 probe: fast_count/fast_minmax must answer under the CURRENT
    logical name after a metadata-only rename, and refuse the stale
    physical name (the alter contract every other read path follows)."""
    from nimble_spark.sources.compaction import fast_count, fast_minmax

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
        path,
        WriteOptions(cluster_by=["k"], n_cluster_files=4),
    )
    alter_table(path, rename={"v": "value"})
    assert fast_count(spark, path, range_filter=("value", 10.0, 20.5)) == 11
    assert fast_minmax(spark, path, "value") == (0.0, 99.0)
    with pytest.raises(ValueError, match="pre-rename|dropped"):
        fast_count(spark, path, range_filter=("v", 10.0, 20.0))
    with pytest.raises(ValueError, match="pre-rename|dropped"):
        fast_minmax(spark, path, "v")


def test_inverted_index_survives_rename(spark, tmp_path):
    """r7 probe: inverted-index sidecars are directory-named at build
    time; a later metadata-only rename must keep searches working
    under the NEW logical name (physical-name-stable directories, the
    delete-mask rule) and refuse stale/unknown names loudly."""
    from nimble_spark.sources.inverted import (
        build_doclen_sidecar,
        build_inverted_index,
        search_bm25,
    )

    path = str(tmp_path / "docs")
    rows = spark.createDataFrame(
        [(1, "the quick fox"), (2, "the slow fox"), (3, "a quick dog")],
        "doc_id LONG, text STRING",
    )
    write_table(rows, path, WriteOptions(cluster_by=["doc_id"]))
    build_inverted_index(spark, path, col="text")
    build_doclen_sidecar(spark, path, col="text")
    alter_table(path, rename={"text": "body"})
    hits = search_bm25(spark, path, ["quick"], col="body").collect()
    assert {r["doc_id"] for r in hits} == {1, 3}
    with pytest.raises(ValueError, match="not a column"):
        search_bm25(spark, path, ["quick"], col="text")


def test_show_stats_logical_view(spark, tmp_path):
    from nimble_spark.tools import run_command

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 20).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v", "CAST(id AS STRING) AS tag"
        ),
        path,
        WriteOptions(),
    )
    alter_table(path, rename={"v": "value"}, drop=["tag"])
    cols = {r["column"] for r in run_command(spark, path, "SHOW STATS").collect()}
    assert "value" in cols and "v" not in cols and "tag" not in cols
