"""Replication across source schema evolution (r11, VERDICT r10 #1)
and the pending-mask fences (ADVICE r10 #3).

``read_changes`` presents every row in the source's CURRENT logical
schema — the reference's offset-stable evolution reads
(dwio/nimble/velox/SchemaReader.h:27-39: renamed/widened columns
resolve through the live map, missing columns read as null) — so a
sync window that crosses an ``alter`` must first bring the replica to
that schema (replaying the window's alter commits, idempotently) and
only then apply the data. A key DROPPED on the source refuses loudly.
"""

from __future__ import annotations

import pytest

from nimble_spark.sources.alter import alter_table
from nimble_spark.sources.deletes import (
    delete_rows,
    has_pending_masks,
    read_with_deletes,
)
from nimble_spark.sources.merge import replicate_table
from nimble_spark.sources.table import (
    WriteOptions,
    read_manifest,
    read_table,
    write_table,
)


def _df(spark, rows, schema="k LONG, v LONG"):
    return spark.createDataFrame(rows, schema)


def _state(spark, path):
    df = read_with_deletes(spark, path)
    cols = tuple(sorted(df.columns))
    return cols, sorted(tuple(r[c] for c in cols) for r in df.collect())


def _boot(spark, tmp_path, rows=None):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_table(
        _df(spark, rows or [(k, k * 10) for k in range(6)]), src, WriteOptions()
    )
    r = replicate_table(spark, src, dst, key="k")
    assert r["mode"] == "bootstrap"
    return src, dst


def test_sync_across_rename(spark, tmp_path):
    src, dst = _boot(spark, tmp_path)
    write_table(_df(spark, [(6, 60)]), src, mode="append")
    alter_table(src, rename={"v": "val"})
    write_table(
        _df(spark, [(7, 70)], "k LONG, val LONG"), src, mode="append"
    )
    r = replicate_table(spark, src, dst, key="k")
    assert r["mode"] == "incremental"
    assert _state(spark, dst) == _state(spark, src)
    assert "val" in read_with_deletes(spark, dst).columns


def test_sync_across_add_column(spark, tmp_path):
    src, dst = _boot(spark, tmp_path)
    alter_table(src, add={"tag": "string"})
    write_table(
        _df(spark, [(6, 60, "x")], "k LONG, v LONG, tag STRING"),
        src,
        mode="append",
    )
    replicate_table(spark, src, dst, key="k")
    assert _state(spark, dst) == _state(spark, src)
    # pre-add rows null-fill on BOTH sides
    assert (
        read_with_deletes(spark, dst).filter("tag IS NULL").count()
        == read_with_deletes(spark, src).filter("tag IS NULL").count()
        == 6
    )


def test_sync_across_widen(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_table(
        _df(spark, [(k, k) for k in range(4)], "k LONG, v INT"),
        src,
        WriteOptions(),
    )
    assert replicate_table(spark, src, dst, key="k")["mode"] == "bootstrap"
    alter_table(src, widen={"v": "bigint"})
    write_table(
        _df(spark, [(4, 2**40)], "k LONG, v LONG"), src, mode="append"
    )
    replicate_table(spark, src, dst, key="k")
    assert _state(spark, dst) == _state(spark, src)
    assert dict(read_with_deletes(spark, dst).dtypes)["v"] == "bigint"


def test_sync_across_drop_nonkey(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_table(
        _df(spark, [(k, k * 10, k) for k in range(4)], "k LONG, v LONG, extra LONG"),
        src,
        WriteOptions(),
    )
    replicate_table(spark, src, dst, key="k")
    alter_table(src, drop=["extra"])
    write_table(_df(spark, [(4, 40)]), src, mode="append")
    replicate_table(spark, src, dst, key="k")
    assert _state(spark, dst) == _state(spark, src)
    assert "extra" not in read_with_deletes(spark, dst).columns


def test_key_renamed_in_window_follows(spark, tmp_path):
    """The caller may pass EITHER spelling of a key renamed inside the
    window — the replay maps it forward before apply_changes runs."""
    src, dst = _boot(spark, tmp_path)
    alter_table(src, rename={"k": "id"})
    write_table(_df(spark, [(6, 60)], "id LONG, v LONG"), src, mode="append")
    r = replicate_table(spark, src, dst, key="k")  # OLD name
    assert r["mode"] == "incremental"
    assert _state(spark, dst) == _state(spark, src)
    from nimble_spark.sources.table import table_properties

    assert table_properties(dst)["nimble.replica.key"] == "id"
    # next sync with the NEW name just noops
    write_table(_df(spark, [(7, 70)], "id LONG, v LONG"), src, mode="append")
    replicate_table(spark, src, dst, key="id")
    assert _state(spark, dst) == _state(spark, src)


def test_key_dropped_refuses(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_table(
        _df(spark, [(k, k * 10, k) for k in range(4)], "k LONG, v LONG, k2 LONG"),
        src,
        WriteOptions(),
    )
    replicate_table(spark, src, dst, key="k2")
    alter_table(src, drop=["k2"])
    write_table(_df(spark, [(4, 40)]), src, mode="append")
    with pytest.raises(ValueError, match="dropped the replication key"):
        replicate_table(spark, src, dst, key="k2")
    # the refusal left the replica untouched and re-runnable on a
    # surviving key into a fresh path
    dst2 = str(tmp_path / "dst2")
    replicate_table(spark, src, dst2, key="k")
    assert _state(spark, dst2) == _state(spark, src)


def test_alter_replay_is_idempotent(spark, tmp_path):
    """A crash between the alter replay and the cursor publish leaves
    the replica already altered; the retry must skip the applied
    alters instead of re-raising."""
    from nimble_spark.sources.merge import _replay_window_alters

    src, dst = _boot(spark, tmp_path)
    alter_table(src, rename={"v": "val"}, add={"tag": "string"})
    commits = read_manifest(src).get("commits", [])
    # simulate the crash: replay applied, cursor not advanced
    assert _replay_window_alters(dst, commits, cursor=0, key="k") == "k"
    assert "val" in read_with_deletes(spark, dst).columns
    # the retry (full sync) replays over the already-altered replica
    write_table(
        _df(spark, [(6, 60, "x")], "k LONG, val LONG, tag STRING"),
        src,
        mode="append",
    )
    r = replicate_table(spark, src, dst, key="k")
    assert r["mode"] == "incremental"
    assert _state(spark, dst) == _state(spark, src)


def test_bootstrap_excludes_masked_rows(spark, tmp_path):
    """ADVICE r10 #3: bootstrap snapshots the source's VISIBLE state —
    mask-hidden rows must not seed the replica (no later sync could
    ever remove them: masks produce no CDC events)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_table(_df(spark, [(k, k * 10) for k in range(6)]), src, WriteOptions())
    delete_rows(spark, src, "k", [1, 3])
    assert has_pending_masks(src)
    r = replicate_table(spark, src, dst, key="k")
    assert r["mode"] == "bootstrap" and r["rows_applied"] == 4
    assert {x[0] for x in _state(spark, dst)[1]} == {0, 2, 4, 5}


def test_incremental_sync_refuses_on_pending_masks(spark, tmp_path):
    """ADVICE r10 #3: masks are commit-log-invisible, so a sync over a
    masked source would silently diverge — refuse loudly, even when
    the commit cursor says 'nothing to do'."""
    src, dst = _boot(spark, tmp_path)
    delete_rows(spark, src, "k", [2])
    with pytest.raises(ValueError, match="pending delete masks"):
        replicate_table(spark, src, dst, key="k")
    # visible states HAVE diverged — exactly what the fence guards
    assert read_table(spark, src).count() == 6
    assert read_with_deletes(spark, src).count() == 5
    assert read_with_deletes(spark, dst).count() == 6
