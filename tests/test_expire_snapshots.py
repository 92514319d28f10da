"""expire_snapshots (r9): bound commit-log growth with stable commit
numbers (Iceberg expireSnapshots analogue). The retained window keeps
full semantics — time travel, tags, rollback, CDC — while reads before
the fold base refuse loudly and CDC cursors behind it must
re-bootstrap."""

from __future__ import annotations

import pytest

from nimble_spark.sources.table import (
    WriteOptions,
    expire_snapshots,
    read_changes,
    read_manifest,
    read_table,
    rollback_table,
    tag_commit,
    write_table,
)


def _mk(spark, path, n_appends=3):
    write_table(spark.range(0, 10).selectExpr("id AS k"), path, WriteOptions())
    for i in range(n_appends):
        write_table(
            spark.range(10 * (i + 1), 10 * (i + 2)).selectExpr("id AS k"),
            path, WriteOptions(), mode="append",
        )


def test_expire_folds_and_preserves_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=3)  # commits 0..3, 40 rows
    m = expire_snapshots(path, keep_last=2)  # retain 2,3; base=2
    commits = m["commits"]
    assert [c["commit"] for c in commits] == [2, 3]
    assert commits[0]["mode"] == "expire_base"
    # head read unchanged
    assert read_table(spark, path).count() == 40
    # retained time travel exact; the fold base IS commit 2's state
    assert read_table(spark, path, as_of_commit=2).count() == 30
    assert read_table(spark, path, as_of_commit=3).count() == 40
    with pytest.raises(ValueError, match="expired"):
        read_table(spark, path, as_of_commit=0)
    # rows_added ledger stays exact through the fold
    assert sum(c["rows_added"] for c in commits) == 40


def test_numbering_continues_after_expiry(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=3)
    expire_snapshots(path, keep_last=2)
    write_table(
        spark.range(40, 45).selectExpr("id AS k"), path, WriteOptions(),
        mode="append",
    )
    m = read_manifest(path)
    assert [c["commit"] for c in m["commits"]] == [2, 3, 4]
    assert m["commits"][-1]["rows_added"] == 5  # delta, not cumulative
    assert read_table(spark, path, as_of_commit=4).count() == 45
    # second expiry composes
    expire_snapshots(path, keep_last=2)
    m = read_manifest(path)
    assert [c["commit"] for c in m["commits"]] == [3, 4]
    assert read_table(spark, path).count() == 45
    assert sum(c["rows_added"] for c in m["commits"]) == 45


def test_tags_guard_and_retained_tags_resolve(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=3)
    tag_commit(path, "early", commit=0)
    with pytest.raises(ValueError, match="early"):
        expire_snapshots(path, keep_last=2)
    from nimble_spark.sources.table import delete_tag

    delete_tag(path, "early")
    tag_commit(path, "late", commit=3)
    expire_snapshots(path, keep_last=2)
    assert read_table(spark, path, as_of_tag="late").count() == 40


def test_rollback_within_retained_window(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=3)
    expire_snapshots(path, keep_last=3)  # retain 1..3
    rollback_table(spark, path, commit=2)
    assert read_table(spark, path).count() == 30
    with pytest.raises(ValueError, match="expired"):
        rollback_table(spark, path, commit=0)
    m = read_manifest(path)
    assert m["commits"][-1]["commit"] == 4  # rollback is commit 4


def test_cdc_cursors(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=5)  # commits 0..5, 60 rows
    expire_snapshots(path, keep_last=2)  # retain 4,5; base=4
    # in-window incremental: only commit 5's rows
    assert read_changes(spark, path, since_commit=4).count() == 10
    # -1 is the bootstrap spelling: full replay from the fold base
    assert read_changes(spark, path, since_commit=-1).count() == 60
    # base-1 LITERALLY is ambiguous (ADVICE r9): a consumer checkpointed
    # there needs commit 4's true delta, which the fold made
    # unrecoverable — refuse unless the re-bootstrap is acknowledged
    with pytest.raises(ValueError, match="fold boundary"):
        read_changes(spark, path, since_commit=3)
    assert read_changes(spark, path, since_commit=3, bootstrap=True).count() == 60
    # a cursor further behind the fold must re-bootstrap
    with pytest.raises(ValueError, match="expired"):
        read_changes(spark, path, since_commit=1)


def test_dsl_expire(spark, tmp_path):
    from nimble_spark.tools import run_command

    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=3)
    row = run_command(spark, path, "EXPIRE SNAPSHOTS KEEP 2").collect()[0]
    assert row["retained_commits"] == 2 and row["base_commit"] == 2
    assert read_table(spark, path).count() == 40


def test_stream_offsets_stable_across_expiry(spark, tmp_path):
    """Streaming offsets are commit NUMBERS in the checkpoint WAL: a
    mid-stream expiry must not shift what a cursor means. A cursor
    inside the retained window keeps streaming; one behind the fold
    base fails loudly with the re-bootstrap instruction."""
    from nimble_spark.sources.datasource import NimbleStreamReader, _logical_struct
    from nimble_spark.sources.table import expire_snapshots

    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=4)  # commits 0..4
    rdr = NimbleStreamReader(path, _logical_struct(read_manifest(path)))
    assert rdr.latestOffset() == {"commit": 4}
    expire_snapshots(path, keep_last=2)  # retain [3(base), 4]
    assert rdr.latestOffset() == {"commit": 4}  # number, not position
    parts = rdr.partitions({"commit": 3}, {"commit": 4})
    assert len(parts) >= 1  # exactly commit 4's file(s)
    with pytest.raises(ValueError, match="fell behind"):
        rdr.partitions({"commit": 0}, {"commit": 4})
    # the fold BOUNDARY (base-1): a silent checkpoint replay would
    # re-deliver the full pre-fold state as inserts — refuse; an
    # explicit startingCommit on a fresh query is the acknowledgment
    with pytest.raises(ValueError, match="fold boundary"):
        rdr.partitions({"commit": 2}, {"commit": 4})
    rdr2 = NimbleStreamReader(
        path, _logical_struct(read_manifest(path)), starting_commit=2
    )
    assert len(rdr2.partitions({"commit": 2}, {"commit": 4})) >= 1


def test_noop_and_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=1)  # 2 commits
    m = expire_snapshots(path, keep_last=5)  # nothing to fold
    assert [c["commit"] for c in m["commits"]] == [0, 1]
    with pytest.raises(ValueError, match="keep_last"):
        expire_snapshots(path, keep_last=0)
