"""Clustering-health metric + OPTIMIZE-style recluster.

clustering_depth is pure manifest arithmetic (zero data IO, O(F log F)
driver work — bounded metadata); recluster_table is the full-rewrite
maintenance op it justifies. Reference: the ClusterIndex keeps depth 1
by construction because stripes are written key-ordered
(dwio/nimble/index/ClusterIndex.h:76-197); appends break that here, so
the depth metric + recluster restore it retroactively (Delta OPTIMIZE
ZORDER analogue).
"""

from __future__ import annotations

import pytest

from nimble_spark.sources.compaction import clustering_depth, recluster_table
from nimble_spark.sources.table import (
    WriteOptions,
    read_manifest,
    read_table,
    write_table,
)


def _mf(ranges, key="k"):
    files = []
    for i, r in enumerate(ranges):
        if r is None:
            files.append({"path": f"f{i}.parquet", "min": {}, "max": {}})
        else:
            files.append({"path": f"f{i}.parquet", "min": {key: r[0]}, "max": {key: r[1]}})
    return {"files": files, "indexes": {"cluster": {"keys": [key]}}}


def test_depth_disjoint_is_one():
    d = clustering_depth(_mf([(0, 9), (10, 19), (20, 29)]))
    assert d["max_depth"] == 1 and d["avg_depth"] == 1.0 and d["files"] == 3


def test_depth_interleaved_commits():
    # 2 commits × 3 files each, both spanning [0,30): every point is
    # covered by one file per commit
    d = clustering_depth(_mf([(0, 9), (10, 19), (20, 29), (0, 11), (12, 21), (22, 29)]))
    assert d["max_depth"] == 2
    assert 1.5 <= d["avg_depth"] <= 2.0


def test_depth_touching_ranges_overlap():
    # a probe AT key 10 must open both files
    d = clustering_depth(_mf([(0, 10), (10, 20)]))
    assert d["max_depth"] == 2


def test_depth_unranged_file_counts_everywhere():
    d = clustering_depth(_mf([(0, 9), (10, 19), None]))
    assert d["max_depth"] == 2 and d["ranged_files"] == 2
    assert d["avg_depth"] == 2.0  # 1 ranged + 1 unprunable at every point


def test_depth_string_key_event_mean():
    d = clustering_depth(_mf([("a", "f"), ("c", "k"), ("m", "z")]))
    assert d["max_depth"] == 2 and d["files"] == 3


def test_depth_requires_key():
    with pytest.raises(ValueError, match="cluster/zorder key"):
        clustering_depth({"files": [], "indexes": {}})


def test_recluster_restores_depth_and_rows(spark, tmpdir):
    path = f"{tmpdir}/recluster"
    rows = spark.range(0, 4000).selectExpr("id AS k", "id * 1.5 AS v")
    opts = WriteOptions(cluster_by=["k"], n_cluster_files=4)
    write_table(rows.filter("k % 4 = 0"), path, opts)
    for i in (1, 2, 3):
        write_table(rows.filter(f"k % 4 = {i}"), path, opts, mode="append")
    before = clustering_depth(read_manifest(path))
    assert before["max_depth"] >= 4  # one covering file per commit

    m = recluster_table(spark, path, n_files=4)
    after = clustering_depth(m)
    assert after["max_depth"] <= 2 and after["avg_depth"] <= 2
    assert m["user_metadata"]["recluster.files_before"] == str(before["files"])
    got = read_table(spark, path)
    assert got.count() == 4000
    # the restored index prunes: a 10% range opens ~1 of 4 files
    hit = read_table(spark, path, range_scan=("k", 100, 400))
    assert hit.count() == 301


def test_recluster_carries_constraints_and_layout(spark, tmpdir):
    path = f"{tmpdir}/recluster_part"
    rows = spark.range(0, 1000).selectExpr(
        "id AS k", "CASE WHEN id % 2 = 0 THEN '01' ELSE '02' END AS p", "id * 1.0 AS v"
    )
    opts = WriteOptions(
        cluster_by=["k"], n_cluster_files=3, partition_by=["p"],
        check_constraints={"v_nonneg": "v >= 0"},
    )
    write_table(rows.filter("k < 500"), path, opts)
    write_table(rows.filter("k >= 500"), path, opts, mode="append")
    m = recluster_table(spark, path, n_files=3)
    assert m["constraints"] == {"v_nonneg": "v >= 0"}
    assert all(f["path"].startswith("p=") for f in m["files"])
    got = read_table(spark, path)
    assert dict(got.dtypes)["p"] == "string"  # declared type survives
    assert got.count() == 1000
    # the carried constraint still gates appends (frame typed to the
    # table's declared schema — the r6 append type gate fires first on
    # a mistyped frame, which is its own test below)
    bad = spark.createDataFrame(
        [(1, "01", -5.0)], "k LONG, p STRING, v DOUBLE"
    ).selectExpr("k", "p", "CAST(v AS DECIMAL(23,1)) AS v")
    with pytest.raises(Exception, match="v_nonneg"):
        write_table(bad, path, WriteOptions(partition_by=["p"]), mode="append")
    # a type-incompatible append is refused BEFORE any byte lands
    untyped = spark.createDataFrame([(1, "01", 5.0)], "k LONG, p STRING, v DOUBLE")
    with pytest.raises(ValueError, match="incompatible"):
        write_table(untyped, path, WriteOptions(partition_by=["p"]), mode="append")


def test_recluster_refusals(spark, tmpdir):
    plain = f"{tmpdir}/plain"
    write_table(spark.range(5).selectExpr("id AS k"), plain, WriteOptions())
    with pytest.raises(ValueError, match="no cluster/zorder"):
        recluster_table(spark, plain)

    masked = f"{tmpdir}/masked"
    write_table(
        spark.range(10).selectExpr("id AS k"), masked,
        WriteOptions(cluster_by=["k"]),
    )
    from nimble_spark.sources.deletes import delete_rows

    delete_rows(spark, masked, "k", [3])
    with pytest.raises(ValueError, match="delete masks"):
        recluster_table(spark, masked)


def test_show_clustering_dsl(spark, tmpdir):
    from nimble_spark.tools import run_command

    path = f"{tmpdir}/dsl_cluster"
    opts = WriteOptions(cluster_by=["k"], n_cluster_files=2)
    write_table(spark.range(100).selectExpr("id AS k"), path, opts)
    write_table(spark.range(100).selectExpr("id AS k"), path, opts, mode="append")
    row = run_command(spark, path, "SHOW CLUSTERING").collect()[0]
    assert row.key == "k" and row.max_depth == 2 and row.files == 4
    row2 = run_command(spark, path, "SHOW CLUSTERING KEY k").collect()[0]
    assert row2.max_depth == 2


def test_staged_swap_failure_leaves_table_intact(spark, tmpdir):
    """staged_swap_rewrite must be crash-safe: if the staging write
    fails, the live table is untouched and no staging debris remains
    (the in-place mode='overwrite' alternative deletes the target
    before the job runs — total data loss on failure)."""
    import glob

    from pyspark.sql import functions as F

    from nimble_spark.sources.table import staged_swap_rewrite

    path = f"{tmpdir}/swap_victim"
    write_table(spark.range(100).selectExpr("id AS k"), path, WriteOptions())

    @F.udf("long")
    def boom(v):
        raise RuntimeError("mid-job failure")

    bad = read_table(spark, path).select(boom("k").alias("k"))
    with pytest.raises(Exception):
        staged_swap_rewrite(spark, path, bad, WriteOptions())
    assert read_table(spark, path).count() == 100  # old table intact
    assert glob.glob(f"{path}-rewrite-*") == []  # staging cleaned up


def test_compact_deletes_preserves_layout_and_constraints(spark, tmpdir):
    """The guards that say 'run compact_deletes first' must not be a
    dead end: compact_deletes carries the declared layout (cluster
    keys, partitions) and CHECK constraints through the rewrite, so
    recluster_table / merge_into work afterwards."""
    from nimble_spark.sources.compaction import recluster_table
    from nimble_spark.sources.deletes import compact_deletes, delete_rows

    path = f"{tmpdir}/masked_clustered"
    rows = spark.range(0, 400).selectExpr(
        "id AS k", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS p", "id * 1.0 AS v"
    )
    opts = WriteOptions(
        cluster_by=["k"], n_cluster_files=2, partition_by=["p"],
        check_constraints={"v_nonneg": "v >= 0"},
    )
    write_table(rows.filter("k < 200"), path, opts)
    write_table(rows.filter("k >= 200"), path, opts, mode="append")
    delete_rows(spark, path, "k", [7])

    m = compact_deletes(spark, path)
    assert "cluster" in m["indexes"] and "partition" in m["indexes"]
    assert m["constraints"] == {"v_nonneg": "v >= 0"}
    assert all(f["path"].startswith("p=") for f in m["files"])
    assert read_table(spark, path).count() == 399  # mask materialized

    # the advice chain recluster -> compact_deletes -> recluster works
    m2 = recluster_table(spark, path, n_files=2)
    assert clustering_depth(m2)["max_depth"] <= 2
    assert read_table(spark, path).count() == 399


def test_materialize_columns_preserves_partition_layout(spark, tmpdir):
    """materialize_columns now reproduces directory layouts instead of
    refusing them (it used the layout-preserving options helper)."""
    from nimble_spark.sources.table import materialize_columns

    path = f"{tmpdir}/aliased_part"
    rows = spark.createDataFrame(
        [(1, "a", 5.0, 5.0), (2, "b", 6.0, 6.0)],
        "k LONG, p STRING, v DOUBLE, v_copy DOUBLE",
    )
    write_table(rows, path, WriteOptions(partition_by=["p"], dedup_columns=True))
    m0 = read_manifest(path)
    if not m0.get("column_aliases"):
        pytest.skip("dedup did not alias (stats hash missed)")
    m = materialize_columns(spark, path)
    assert "column_aliases" not in m
    assert all(f["path"].startswith("p=") for f in m["files"])
    got = read_table(spark, path)
    assert sorted(got.columns) == ["k", "p", "v", "v_copy"]
    assert got.count() == 2


def test_maintenance_advisor_and_dsl(spark, tmpdir):
    """advise_maintenance fires each action on its debt and goes quiet
    on a healthy table; SHOW MAINTENANCE is the DSL face."""
    from nimble_spark.sources.compaction import (
        advise_maintenance,
        compact_table,
        recluster_table,
        vacuum_table,
    )
    from nimble_spark.sources.deletes import compact_deletes, delete_rows
    from nimble_spark.tools import run_command

    path = f"{tmpdir}/maint"
    opts = WriteOptions(cluster_by=["k"], n_cluster_files=2)
    rows = spark.range(0, 1000).selectExpr("id AS k", "id * 1.0 AS v")
    write_table(rows.filter("k % 3 = 0"), path, opts)
    for i in (1, 2):
        write_table(rows.filter(f"k % 3 = {i}"), path, opts, mode="append")
    delete_rows(spark, path, "k", [5])

    actions = {r["action"] for r in advise_maintenance(path)}
    assert {"compact_table", "recluster_table", "compact_deletes"} <= actions
    dsl = {r.action for r in run_command(spark, path, "SHOW MAINTENANCE").collect()}
    assert dsl == actions

    # pay the debts in the advised order; the advisor goes quiet
    compact_deletes(spark, path)
    recluster_table(spark, path, n_files=2)
    compact_table(spark, path)  # no-op or merge; either way quiet after
    vacuum_table(path, min_age_s=0.0)
    assert advise_maintenance(path) == []
    assert run_command(spark, path, "SHOW MAINTENANCE").count() == 0


def test_run_maintenance_executes_and_goes_quiet(spark, tmpdir):
    """run_maintenance pays the advised debts in dependency order,
    re-advising between steps, and leaves the advisor quiet; content
    (minus masked keys) is untouched. RUN MAINTENANCE is the DSL face,
    and without VACUUM it never reclaims history."""
    from nimble_spark.sources.compaction import advise_maintenance, run_maintenance
    from nimble_spark.sources.deletes import delete_rows
    from nimble_spark.tools import run_command

    path = f"{tmpdir}/automaint"
    opts = WriteOptions(cluster_by=["k"], n_cluster_files=2)
    rows = spark.range(0, 1000).selectExpr("id AS k", "id * 1.0 AS v")
    write_table(rows.filter("k % 3 = 0"), path, opts)
    for i in (1, 2):
        write_table(rows.filter(f"k % 3 = {i}"), path, opts, mode="append")
    delete_rows(spark, path, "k", [5])

    done = run_maintenance(spark, path, vacuum=True, min_age_s=0.0)
    acts = [r["action"] for r in done]
    assert acts and acts[0] == "compact_deletes"  # masks first
    assert acts == sorted(set(acts), key=acts.index)  # no action repeats
    assert advise_maintenance(path) == []
    got = read_table(spark, path)
    assert got.count() == 999 and got.filter("k = 5").count() == 0
    assert got.selectExpr("sum(v)").first()[0] == float(sum(range(1000)) - 5)

    # DSL face on a freshly indebted table, without VACUUM: trash (if
    # any) survives, and a second run reports nothing to do
    delete_rows(spark, path, "k", [7])
    ran = {r.action for r in run_command(spark, path, "RUN MAINTENANCE").collect()}
    assert "compact_deletes" in ran
    assert run_command(spark, path, "RUN MAINTENANCE").count() == 0


def test_maintenance_rebuilds_stale_sorted_index(spark, tmpdir):
    """An append stales the sorted-index fence (reads fall back to
    stats pruning — correct but unpruned); the advisor flags it and
    run_maintenance rebuilds, after which the fence matches again."""
    from nimble_spark.sources.compaction import advise_maintenance, run_maintenance
    from nimble_spark.sources.table import (
        _files_fingerprint,
        create_sorted_index,
        read_manifest,
    )

    path = f"{tmpdir}/sortedidx"
    rows = spark.range(0, 500).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    write_table(rows.filter("k < 400").coalesce(1), path, WriteOptions())
    create_sorted_index(spark, path, "k")
    assert advise_maintenance(path) == []  # fresh index: healthy
    write_table(rows.filter("k >= 400").coalesce(1), path, mode="append")
    recs = {r["action"]: r for r in advise_maintenance(path)}
    assert recs["rebuild_sorted_index"]["keys"] == ["k"]
    done = run_maintenance(spark, path, vacuum=True, min_age_s=0.0)
    assert any(d["action"] == "rebuild_sorted_index" for d in done)
    assert advise_maintenance(path) == []
    m = read_manifest(path)
    assert m["indexes"]["sorted_fence"]["k"] == _files_fingerprint(m)
    got = read_table(spark, path, point_lookup=("k", [450]))
    assert got.count() == 1


def test_materialize_columns_refuses_pending_masks(spark, tmpdir):
    """materialize_columns reads UNMASKED rows and the swap discards
    the deletes dir — it must refuse rather than resurrect."""
    from nimble_spark.sources.deletes import delete_rows
    from nimble_spark.sources.table import materialize_columns

    path = f"{tmpdir}/alias_masked"
    rows = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 6.0, 6.0)], "k LONG, v DOUBLE, v_copy DOUBLE"
    )
    write_table(rows, path, WriteOptions(dedup_columns=True))
    if not read_manifest(path).get("column_aliases"):
        pytest.skip("dedup did not alias")
    delete_rows(spark, path, "k", [2])
    with pytest.raises(ValueError, match="delete masks"):
        materialize_columns(spark, path)


def test_merge_rejects_narrowing_source_types(spark, tmpdir):
    """A LONG source against an INT table must raise, not wrap: the
    non-ANSI cast would silently truncate 2^35 to 0 and merge onto the
    wrong key."""
    from nimble_spark.sources.merge import merge_into

    path = f"{tmpdir}/narrow"
    write_table(
        spark.createDataFrame([(1, "a")], "k INT, name STRING"), path, WriteOptions()
    )
    src = spark.createDataFrame([(2**35, "boom")], "k LONG, name STRING")
    with pytest.raises(ValueError, match="losslessly widen"):
        merge_into(spark, path, src, key="k")


def test_interrupted_swap_repairs_forward(spark, tmpdir):
    """A crash between staged_swap_rewrite's two renames leaves the
    marker + the complete staging dir; the next read (or write, or
    vacuum) completes the swap forward instead of failing forever."""
    import json
    import os

    from nimble_spark.sources.table import _swap_marker

    path = f"{tmpdir}/swap_crash"
    write_table(spark.range(10).selectExpr("id AS k"), path, WriteOptions())

    # simulate: successor fully staged, marker written, first rename
    # done (table dir gone), then crash before the second rename
    staging = f"{path}-rewrite-deadbeef"
    write_table(spark.range(20).selectExpr("id AS k"), staging, WriteOptions())
    old = f"{path}-old-deadbeef"
    with open(_swap_marker(path), "w") as fh:
        json.dump({"old": old, "staging": staging}, fh)
    os.rename(path, old)

    got = read_table(spark, path)  # read-side repair completes forward
    assert got.count() == 20  # the STAGED successor won (marker = staged complete)
    assert not os.path.exists(_swap_marker(path))
    assert not os.path.isdir(old) and not os.path.isdir(staging)


def test_vacuum_sweeps_swap_debris(spark, tmpdir):
    """Staging dirs from rewrites that failed before their marker
    existed live OUTSIDE the table root; vacuum reclaims them."""
    import os

    from nimble_spark.sources.compaction import vacuum_table

    path = f"{tmpdir}/debris_owner"
    write_table(spark.range(5).selectExpr("id AS k"), path, WriteOptions())
    debris = f"{path}-rewrite-0123abcd"
    os.makedirs(debris)
    open(os.path.join(debris, "part-junk.parquet"), "w").close()
    vacuum_table(path, min_age_s=0.0)
    assert not os.path.isdir(debris)
    assert read_table(spark, path).count() == 5


def test_maintenance_advisor_zorder_baseline(spark, tmpdir):
    """Z-layouts overlap on any single key BY DESIGN — a fresh
    z-ordered table must NOT trip the recluster advice; interleaved
    appends beyond the geometric baseline must."""
    from nimble_spark.sources.compaction import advise_maintenance

    rows = spark.range(0, 20000).selectExpr(
        "id AS x", "(id * 37) % 20000 AS y", "id * 1.0 AS v"
    )
    fresh = f"{tmpdir}/z_fresh"
    write_table(rows, fresh, WriteOptions(zorder_by=["x", "y"], n_cluster_files=8))
    assert "recluster_table" not in {r["action"] for r in advise_maintenance(fresh)}

    degraded = f"{tmpdir}/z_degraded"
    opts = WriteOptions(zorder_by=["x", "y"], n_cluster_files=8)
    write_table(rows.filter("x % 4 = 0"), degraded, opts)
    for i in (1, 2, 3):
        write_table(rows.filter(f"x % 4 = {i}"), degraded, opts, mode="append")
    assert "recluster_table" in {r["action"] for r in advise_maintenance(degraded)}


# ---------------------------------------------------------------------------
# Incremental (partial) recluster
# ---------------------------------------------------------------------------


def test_incremental_recluster_rewrites_only_overlap(spark, tmpdir):
    path = f"{tmpdir}/increc"
    rows = spark.range(0, 4000).selectExpr("id AS k", "id * 1.5 AS v")
    # base: 4 disjoint range files over [0, 4000)
    write_table(rows, path, WriteOptions(cluster_by=["k"], n_cluster_files=4))
    # a narrow append: only overlaps the first ~quarter of the space
    extra = spark.range(0, 900).selectExpr("id AS k", "id * 1.5 AS v")
    write_table(extra, path, WriteOptions(cluster_by=["k"], n_cluster_files=1), mode="append")
    m0 = read_manifest(path)
    untouched_before = {
        f["path"] for f in m0["files"] if f["min"]["k"] >= 1000
    }
    assert untouched_before, "fixture must leave some files disjoint"
    assert clustering_depth(m0)["max_depth"] >= 2

    s = recluster_table(spark, path, incremental=True)
    assert s["groups"] >= 1
    assert s["files_rewritten"] < s["files_before"]  # partial, not full
    m1 = read_manifest(path)
    after_paths = {f["path"] for f in m1["files"]}
    assert untouched_before <= after_paths  # disjoint files untouched
    assert clustering_depth(m1)["max_depth"] <= 2
    # content preserved (4000 base + 900 duplicate-key rows)
    got = read_table(spark, path)
    assert got.count() == 4900
    assert got.selectExpr("sum(k) AS s").first()["s"] == sum(range(4000)) + sum(range(900))
    # history KEPT: a data_change=false 'recluster' commit appended
    c = m1["commits"][-1]
    assert c["mode"] == "recluster" and c["data_change"] is False
    assert len(m1["commits"]) == len(m0["commits"]) + 1
    # the restored index prunes a narrow range
    assert read_table(spark, path, range_scan=("k", 2000, 2100)).count() == 101


def test_incremental_recluster_noop_on_disjoint_table(spark, tmpdir):
    path = f"{tmpdir}/increc_clean"
    rows = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
    write_table(rows, path, WriteOptions(cluster_by=["k"], n_cluster_files=3))
    m0 = read_manifest(path)
    s = recluster_table(spark, path, incremental=True)
    assert s["groups"] == 0 and s["files_rewritten"] == 0
    m1 = read_manifest(path)
    assert [f["path"] for f in m1["files"]] == [f["path"] for f in m0["files"]]
    assert len(m1.get("commits", [])) == len(m0.get("commits", []))


def test_incremental_recluster_keeps_delete_masks(spark, tmpdir):
    # delete masks are VALUE sets, so a partial physical rewrite cannot
    # resurrect rows — unlike the full rewrite, which resets history
    # and therefore refuses pending masks
    from nimble_spark.sources.deletes import delete_rows

    path = f"{tmpdir}/increc_masked"
    rows = spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    write_table(rows, path, WriteOptions(cluster_by=["k"], n_cluster_files=2))
    write_table(
        spark.range(0, 400).selectExpr("id + 1000 AS k", "CAST(id AS DOUBLE) AS v"),
        path, WriteOptions(cluster_by=["k"], n_cluster_files=1), mode="append",
    )
    delete_rows(spark, path, "k", [5, 6, 7])
    # force overlap so something rewrites: append over the full span
    write_table(
        spark.range(0, 1400, 100).selectExpr("id AS k", "CAST(0 AS DOUBLE) AS v"),
        path, WriteOptions(cluster_by=["k"], n_cluster_files=1), mode="append",
    )
    s = recluster_table(spark, path, incremental=True)
    assert s["files_rewritten"] >= 2
    from nimble_spark.sources.deletes import read_with_deletes

    got = read_with_deletes(spark, path)
    assert got.filter("k IN (5, 6, 7)").count() == 0  # masks still apply
    assert got.count() == 1000 + 400 + 14 - 3


def test_incremental_recluster_respects_partition_dirs(spark, tmpdir):
    path = f"{tmpdir}/increc_part"
    rows = spark.range(0, 2000).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS p", "id * 1.0 AS v"
    )
    opts = WriteOptions(cluster_by=["k"], n_cluster_files=2, partition_by=["p"])
    write_table(rows, path, opts)
    # degrade only partition p=0
    write_table(
        spark.range(0, 500, 2).selectExpr("id AS k", "'0' AS p", "id * 1.0 AS v"),
        path, opts, mode="append",
    )
    m0 = read_manifest(path)
    p1_before = {f["path"] for f in m0["files"] if f["path"].startswith("p=1")}
    s = recluster_table(spark, path, incremental=True)
    assert s["groups"] >= 1
    m1 = read_manifest(path)
    # every rewritten file stayed inside its partition dir
    assert all(f["path"].startswith(("p=0", "p=1")) for f in m1["files"])
    assert p1_before == {f["path"] for f in m1["files"] if f["path"].startswith("p=1")}
    got = read_table(spark, path)
    assert got.count() == 2000 + 250
    assert dict(got.dtypes)["p"] == "string"


def test_incremental_recluster_refusals(spark, tmpdir):
    zpath = f"{tmpdir}/increc_z"
    rows = spark.range(0, 500).selectExpr("id AS a", "id % 7 AS b")
    write_table(rows, zpath, WriteOptions(zorder_by=["a", "b"]))
    write_table(rows, zpath, WriteOptions(zorder_by=["a", "b"]), mode="append")
    with pytest.raises(ValueError, match="range cluster layout"):
        recluster_table(spark, zpath, incremental=True)

    plain = f"{tmpdir}/increc_plain"
    write_table(spark.range(5).selectExpr("id AS k"), plain, WriteOptions())
    with pytest.raises(ValueError, match="range cluster layout"):
        recluster_table(spark, plain, incremental=True)


def test_advisor_hints_incremental_when_overlap_localized(spark, tmpdir):
    from nimble_spark.sources.compaction import advise_maintenance

    path = f"{tmpdir}/advise_inc"
    rows = spark.range(0, 4000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    write_table(rows, path, WriteOptions(cluster_by=["k"], n_cluster_files=8))
    # two narrow appends: depth breaches but overlap stays localized
    for _ in range(2):
        write_table(
            spark.range(0, 400).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
            path, WriteOptions(cluster_by=["k"], n_cluster_files=1), mode="append",
        )
    recs = {r["action"]: r for r in advise_maintenance(path)}
    assert "recluster_table" in recs
    assert "incremental=True" in recs["recluster_table"]["reason"]
