"""Snapshot tags + history-preserving rollback (Delta RESTORE /
Iceberg refs parity), riding the commit-log machinery: tags name
commits and survive appends/rewrites/compactions; rollback republishes
an earlier snapshot as a NEW commit (mode="rollback"), re-homing
tombstoned members from trash and tombstoning rolled-back-past files,
so time travel still reaches both sides until VACUUM."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nimble_spark.sources.table import (
    WriteOptions,
    delete_tag,
    read_manifest,
    read_table,
    rollback_table,
    tag_commit,
    write_table,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id AS k", "id * 10 AS v")


@pytest.fixture()
def tagged(spark, tmpdir):
    path = f"{tmpdir}/tags"
    write_table(_df(spark, 0, 100), path, WriteOptions())
    tag_commit(path, "v1")  # commit 0
    write_table(_df(spark, 100, 200), path, WriteOptions(), mode="append")
    tag_commit(path, "v2")  # commit 1
    write_table(_df(spark, 200, 300), path, WriteOptions(), mode="append")
    return path


def test_tags_name_snapshots_and_are_immutable(spark, tagged):
    assert read_table(spark, tagged, as_of_tag="v1").count() == 100
    assert read_table(spark, tagged, as_of_tag="v2").count() == 200
    assert read_table(spark, tagged).count() == 300
    with pytest.raises(ValueError, match="already points"):
        tag_commit(tagged, "v1", commit=1)
    with pytest.raises(ValueError, match="no tag"):
        read_table(spark, tagged, as_of_tag="nope")
    delete_tag(tagged, "v1")
    with pytest.raises(ValueError, match="no tag"):
        read_table(spark, tagged, as_of_tag="v1")


def test_tags_survive_append_update_and_compaction(spark, tagged):
    from nimble_spark.sources.compaction import compact_table
    from nimble_spark.sources.merge import update_where

    write_table(_df(spark, 300, 350), tagged, WriteOptions(), mode="append")
    update_where(spark, tagged, "k < 10", {"v": "v + 1"})
    compact_table(spark, tagged, target_file_bytes=64 * 1024 * 1024)
    m = read_manifest(tagged)
    assert m["tags"] == {"v1": 0, "v2": 1}
    # v1 predates the update — its rows are the ORIGINAL values,
    # served from the trash tombstones
    snap = read_table(spark, tagged, as_of_tag="v1")
    assert snap.count() == 100
    assert snap.filter("v != k * 10").count() == 0


def test_rollback_restores_and_preserves_history(spark, tagged):
    path = tagged
    pre_commits = len(read_manifest(path)["commits"])  # 3

    m = rollback_table(spark, path, tag="v2")
    assert m["commits"][-1]["mode"] == "rollback"
    assert m["commits"][-1]["rolled_back_to"] == 1
    assert len(m["commits"]) == pre_commits + 1
    assert read_table(spark, path).count() == 200  # live = v2 snapshot
    live = read_table(spark, path)
    assert live.agg(F.max("k")).first()[0] == 199

    # history on BOTH sides of the rollback still reads
    assert read_table(spark, path, as_of_commit=0).count() == 100
    assert read_table(spark, path, as_of_commit=2).count() == 300  # pre-rollback
    assert read_table(spark, path, as_of_commit=3).count() == 200

    # roll FORWARD again: the pre-rollback state is itself a commit
    m2 = rollback_table(spark, path, commit=2)
    assert read_table(spark, path).count() == 300
    assert m2["rows"] == 300

    # appends continue normally after a rollback (commit-log row
    # arithmetic survives the negative rows_added entry)
    write_table(_df(spark, 300, 320), path, WriteOptions(), mode="append")
    assert read_table(spark, path).count() == 320
    h = read_manifest(path)["commits"]
    assert h[-1]["rows_added"] == 20


def test_rollback_noop_and_vacuumed_target_raises(spark, tagged):
    from nimble_spark.sources.compaction import vacuum_table
    from nimble_spark.sources.merge import update_where

    path = tagged
    before = len(read_manifest(path)["commits"])
    m = rollback_table(spark, path, commit=before - 1)  # current state
    assert len(m["commits"]) == before  # no-op: no new commit

    # rewrite then vacuum: the old snapshot's files are reclaimed
    update_where(spark, path, "k >= 0", {"v": "v + 1"})
    vacuum_table(path, min_age_s=0.0)
    with pytest.raises(ValueError, match="gone|vacuum"):
        rollback_table(spark, path, tag="v1")


def test_show_tags_dsl(spark, tagged):
    from nimble_spark import tools

    rows = {r["tag"]: r["commit"] for r in tools.run_command(spark, tagged, "SHOW TAGS").collect()}
    assert rows == {"v1": 0, "v2": 1}
    assert "SHOW TAGS" in " ".join(
        r["commands"] for r in tools.run_command(spark, tagged, "HELP").collect()
    )


def test_read_changes_with_commit_provenance(spark, tmpdir):
    """with_commit=True: each row carries the commit that delivered it
    (Delta _commit_version analogue) via a broadcast file→commit map;
    default output shape is unchanged."""
    from nimble_spark.sources.table import read_changes

    path = f"{tmpdir}/cdc_prov"
    write_table(_df(spark, 0, 50), path, WriteOptions())
    write_table(_df(spark, 50, 80), path, WriteOptions(), mode="append")
    write_table(_df(spark, 80, 100), path, WriteOptions(), mode="append")

    plain = read_changes(spark, path, since_commit=-1)
    assert "_commit" not in plain.columns and plain.count() == 100

    ch = read_changes(spark, path, since_commit=0, with_commit=True)
    by_commit = {r["_commit"]: r["n"] for r in ch.groupBy("_commit").agg(F.count("*").alias("n")).collect()}
    assert by_commit == {1: 30, 2: 20}
    assert ch.filter("k >= 80 AND _commit != 2").count() == 0

    empty = read_changes(spark, path, since_commit=2, with_commit=True)
    assert empty.count() == 0 and "_commit" in empty.columns


def test_rollback_past_append_emits_delete_events(spark, tmpdir):
    """A rollback past an APPEND removes rows — upsert-only replay
    would resurrect them (caught by the r6 reader-race soak). The
    default feed refuses such a window; with_change_type=True emits
    'delete' events for exactly the rolled-back rows, and the
    documented reduction (newest _commit, insert beats delete within
    a commit, drop delete winners) reproduces the live table."""
    from nimble_spark.sources.table import read_changes

    path = f"{tmpdir}/rb_append_cdc"
    write_table(_df(spark, 0, 10), path, WriteOptions())
    write_table(_df(spark, 100, 103), path, WriteOptions(), mode="append")
    rollback_table(spark, path, commit=0)

    with pytest.raises(ValueError, match="REMOVED rows"):
        read_changes(spark, path, since_commit=-1)

    rows = read_changes(
        spark, path, since_commit=-1, with_commit=True, with_change_type=True
    ).collect()
    dels = {r["k"] for r in rows if r["_change_type"] == "delete"}
    assert dels == {100, 101, 102}
    best: dict = {}
    for r in rows:
        rank = (r["_commit"], 1 if r["_change_type"] == "insert" else 0)
        if r["k"] not in best or rank >= best[r["k"]][0]:
            best[r["k"]] = (rank, r["v"])
    reduced = {k: v for k, ((_c, ins), v) in best.items() if ins == 1}
    live = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    assert reduced == live

    # rollback past an UPDATE only (no net row change): re-adds cover
    # the upsert view, so the default feed stays usable
    path2 = f"{tmpdir}/rb_update_cdc"
    write_table(_df(spark, 0, 10), path2, WriteOptions())
    from nimble_spark.sources.merge import update_where

    update_where(spark, path2, "k < 5", {"v": "v + 1"})
    rollback_table(spark, path2, commit=0)
    rows2 = read_changes(spark, path2, since_commit=-1, with_commit=True).collect()
    best2: dict = {}
    for r in rows2:
        if r["k"] not in best2 or r["_commit"] >= best2[r["k"]][0]:
            best2[r["k"]] = (r["_commit"], r["v"])
    assert {k: v for k, (_c, v) in best2.items()} == {
        r["k"]: r["v"] for r in read_table(spark, path2).collect()
    }


def test_rollback_partitioned_table_preserves_layout(spark, tmpdir):
    """Rollback on a Hive-partitioned table: file paths include
    partition subdirectories; tombstones keep the relative path shape
    so history on both sides of the rollback stays replayable, and
    partition pruning still works on the restored table."""
    from nimble_spark.sources.table import read_changes

    path = f"{tmpdir}/part_rb"
    d0 = spark.range(100).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p")
    write_table(d0, path, WriteOptions(partition_by=["p"]))
    d1 = spark.range(100, 160).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p")
    write_table(d1, path, WriteOptions(partition_by=["p"]), mode="append")
    assert read_table(spark, path).count() == 160

    m = rollback_table(spark, path, commit=0)
    assert read_table(spark, path).count() == 100
    # partition pruning works on the restored table
    assert read_table(spark, path).filter("p = '1'").count() == 33
    # both sides of the rollback stay replayable
    assert read_table(spark, path, as_of_commit=1).count() == 160
    assert read_table(spark, path, as_of_commit=2).count() == 100
    # roll forward from the trash tombstones (subdir shape preserved)
    rollback_table(spark, path, commit=1)
    out = read_table(spark, path)
    assert out.count() == 160
    assert out.filter("p = '0'").count() == 54
    # CDC across the whole history resolves every window EXACTLY:
    # c0 adds 100, c1 adds 60, c2 (rollback→0) REMOVES the 60 — a
    # row-removing window needs the typed feed (the default upsert
    # view refuses it rather than resurrect rows) — and c3
    # (roll-forward→1) re-delivers the 60 (attributed to c3)
    with pytest.raises(ValueError, match="REMOVED rows"):
        read_changes(spark, path, since_commit=-1)
    feed = read_changes(
        spark, path, since_commit=-1, with_commit=True, with_change_type=True
    )
    ins = feed.filter("_change_type = 'insert'")
    assert ins.count() == 220
    by_commit = {
        r["_commit"]: r["n"]
        for r in ins.groupBy("_commit").agg(F.count("*").alias("n")).collect()
    }
    assert by_commit == {0: 100, 1: 60, 3: 60}
    dels = feed.filter("_change_type = 'delete'")
    assert dels.count() == 60
    assert [r["_commit"] for r in dels.select("_commit").distinct().collect()] == [2]


def test_partitioned_delete_events_keep_partition_columns(spark, tmpdir):
    """Typed-feed delete events on a Hive-partitioned table: the
    removed files resolve from trash/commit-N/p=X/… , and basePath
    grouping must recover the partition column — a delete with p=NULL
    could never match its insert downstream."""
    from nimble_spark.sources.table import read_changes

    path = f"{tmpdir}/part_del_cdc"
    d0 = spark.range(30).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p")
    write_table(d0, path, WriteOptions(partition_by=["p"]))
    d1 = spark.range(100, 112).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS p")
    write_table(d1, path, WriteOptions(partition_by=["p"]), mode="append")
    rollback_table(spark, path, commit=0)  # removes the append's rows

    feed = read_changes(
        spark, path, since_commit=-1, with_commit=True, with_change_type=True
    )
    dels = feed.filter("_change_type = 'delete'").collect()
    assert {r["k"] for r in dels} == set(range(100, 112))
    assert all(r["p"] is not None for r in dels)  # partition col recovered
    # directory-value inference may type p as int — value equality is
    # what matters for downstream key matching
    assert {str(r["p"]) for r in dels} == {"0", "1", "2"}
    # the documented reduction over (k) reproduces the live table
    best: dict = {}
    for r in feed.collect():
        rank = (r["_commit"], 1 if r["_change_type"] == "insert" else 0)
        if r["k"] not in best or rank >= best[r["k"]][0]:
            best[r["k"]] = (rank, r["p"])
    reduced = {k for k, ((_c, ins), _p) in best.items() if ins == 1}
    assert reduced == set(range(30))
    # snapshot read across the trashed append keeps partition columns
    snap = read_table(spark, path, as_of_commit=1)
    assert snap.count() == 42 and snap.filter("p IS NULL").count() == 0


def test_partition_type_inference_conflict_across_trash(spark, tmpdir):
    """Per-group Hive partition-type inference can DISAGREE: a live
    group of p='x' infers STRING while the trash group of p='1'
    infers INT — unioning raw would crash (CAST_INVALID_INPUT, ANSI)
    or silently retype p. Grouped reads must cast each group to the
    declared schema first."""
    from nimble_spark.sources.table import read_changes

    path = f"{tmpdir}/part_type_conflict"
    d0 = spark.createDataFrame([(1, "x"), (2, "y")], "k LONG, p STRING")
    write_table(d0, path, WriteOptions(partition_by=["p"]))
    d1 = spark.createDataFrame([(100, "1"), (101, "1")], "k LONG, p STRING")
    write_table(d1, path, WriteOptions(partition_by=["p"]), mode="append")
    rollback_table(spark, path, commit=0)  # p=1 files land in trash

    feed = read_changes(
        spark, path, since_commit=-1, with_commit=True, with_change_type=True
    )
    assert dict(feed.dtypes)["p"] == "string"  # declared type wins
    rows = feed.collect()  # pre-fix: SparkNumberFormatException here
    dels = [r for r in rows if r["_change_type"] == "delete"]
    assert {(r["k"], r["p"]) for r in dels} == {(100, "1"), (101, "1")}

    snap = read_table(spark, path, as_of_commit=1)
    assert dict(snap.dtypes)["p"] == "string"
    assert snap.count() == 4 and snap.filter("p = '1'").count() == 2


def test_stream_starting_commit_skips_rollback(spark, tmpdir):
    """startingCommit (Delta startingVersion analogue): a table whose
    history holds a row-removing rollback refuses to stream from the
    beginning — the documented re-bootstrap is snapshot + stream from
    the rollback commit onward, which must work."""
    from pyspark.sql.types import StructType

    from nimble_spark.sources.datasource import NimbleStreamReader
    from nimble_spark.sources.table import read_manifest

    path = f"{tmpdir}/stream_start"
    write_table(_df(spark, 0, 10), path, WriteOptions())
    write_table(_df(spark, 100, 103), path, WriteOptions(), mode="append")
    rollback_table(spark, path, commit=0)  # commit 2: removes rows
    write_table(_df(spark, 200, 205), path, WriteOptions(), mode="append")  # commit 3

    schema = StructType.fromJson(read_manifest(path)["schema"])
    # from the beginning: the row-removing window must fail loudly
    r0 = NimbleStreamReader(path, schema)
    assert r0.initialOffset() == {"commit": -1}
    with pytest.raises(ValueError, match="removed rows"):
        r0.partitions({"commit": -1}, r0.latestOffset())
    # re-bootstrapped: start AFTER the rollback → only commit 3 flows
    r1 = NimbleStreamReader(path, schema, starting_commit=2)
    assert r1.initialOffset() == {"commit": 2}
    end = r1.latestOffset()
    assert end == {"commit": 3}
    parts = r1.partitions({"commit": 2}, end)
    assert len(parts) == len(read_manifest(path)["commits"][3]["files"])
    # a typo'd startingCommit must fail loudly, not stream emptily
    r2 = NimbleStreamReader(path, schema, starting_commit=99)
    with pytest.raises(ValueError, match="beyond the table"):
        r2.latestOffset()


def test_rollback_append_compact_contention(spark, tmpdir):
    """8 threads interleave appends, compactions, tags, and rollbacks
    on one table. Every mutation serializes on the table write lock,
    so the final state must be internally consistent: commit-log row
    arithmetic sums to the manifest total, the live read matches the
    manifest, and every live file exists."""
    import os as _os
    import random as _random
    import threading

    from nimble_spark.sources.compaction import compact_table
    from nimble_spark.sources.table import rollback_table, tag_commit

    path = f"{tmpdir}/contend"
    write_table(_df(spark, 0, 50), path, WriteOptions())
    errors: list = []

    def worker(wid: int) -> None:
        rng = _random.Random(wid)
        try:
            for i in range(4):
                op = rng.choice(["append", "append", "compact", "rollback", "tag"])
                if op == "append":
                    lo = 1000 * wid + 100 * i
                    write_table(
                        _df(spark, lo, lo + 20), path, WriteOptions(), mode="append"
                    )
                elif op == "compact":
                    try:
                        compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
                    except ValueError:
                        pass  # single file — nothing to do
                elif op == "rollback":
                    n = len(read_manifest(path).get("commits", []))
                    try:
                        rollback_table(spark, path, commit=rng.randrange(n))
                    except ValueError:
                        pass  # racing vacuum/rollback moved a member — acceptable
                else:
                    try:
                        tag_commit(path, f"w{wid}i{i}")
                    except ValueError:
                        pass  # name collision across retries
        except Exception as exc:  # noqa: BLE001 — collected for the assert
            errors.append((wid, repr(exc)))

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    m = read_manifest(path)
    commits = m.get("commits", [])
    assert sum(c.get("rows_added", 0) for c in commits) == m["rows"]
    live = read_table(spark, path)
    assert live.count() == m["rows"]
    for f in m["files"]:
        assert _os.path.exists(_os.path.join(path, f["path"]))
    # every tag still resolves to a replayable commit index
    for name, ci in m.get("tags", {}).items():
        assert 0 <= ci < len(commits), (name, ci)
