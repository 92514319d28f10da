"""Per-file-stats generation (STATS_GEN): manifests written before
the all-null-row-group null-count fix can record nulls=0 for files
that DO contain null rows — the r5-high wrong-answer bug. Three-part
containment drilled here:

  * new writes stamp ``stats_gen`` = current;
  * the pushdown reader DISABLES null-count pruning on pre-fix
    manifests (degrades to keep-file, the residual stays row-exact);
  * the first append over a pre-fix manifest refuses entry reuse and
    re-describes every file through the fixed path — a one-time
    footer-read cost that permanently repairs the manifest.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

import nimble_spark.sources.table as tbl
from nimble_spark.sources.table import (
    STATS_GEN,
    WriteOptions,
    read_manifest,
    write_table,
)


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="nimble_statsgen_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_nullable(spark, path: str) -> int:
    rows = [(i, None if i % 3 == 0 else float(i)) for i in range(90)]
    df = spark.createDataFrame(rows, "k LONG, v DOUBLE").repartition(3)
    write_table(df, path, WriteOptions())
    return sum(1 for _, v in rows if v is None)


def _poison(path: str) -> None:
    """Rewrite the manifest as a PRE-FIX one: no stats_gen, and the
    wrong nulls=0 the old describe recorded for all-null row groups."""
    m = dict(read_manifest(path))
    m.pop("stats_gen", None)
    m["files"] = [dict(f, nulls=dict(f["nulls"], v=0)) for f in m["files"]]
    tbl._write_manifest(path, m)
    tbl._MANIFEST_CACHE.clear()


def test_write_stamps_stats_gen(spark, tmpdir):
    path = f"{tmpdir}/stamped"
    _write_nullable(spark, path)
    assert read_manifest(path)["stats_gen"] == STATS_GEN


def test_pre_fix_manifest_disables_null_pruning(spark, tmpdir):
    """IS NULL over a poisoned pre-fix manifest must return every
    null row — the reader must not trust the recorded null counts."""
    from nimble_spark.sources.datasource import register_nimble_source

    path = f"{tmpdir}/prefix_read"
    n_nulls = _write_nullable(spark, path)
    _poison(path)
    register_nimble_source(spark)
    got = spark.read.format("nimble").option("pushdown", "true").load(path).filter("v IS NULL").count()
    assert got == n_nulls  # nulls=0 pruning would have returned 0


def test_append_repairs_pre_fix_manifest(spark, tmpdir):
    """The first append re-describes every pre-fix file: the manifest
    comes out current-gen with CORRECT per-file null counts, so
    null-count pruning is trustworthy again afterwards."""
    path = f"{tmpdir}/repair"
    n_nulls = _write_nullable(spark, path)
    _poison(path)
    extra = spark.createDataFrame([(1000, 1.0)], "k LONG, v DOUBLE")
    write_table(extra, path, mode="append")
    m = read_manifest(path)
    assert m["stats_gen"] == STATS_GEN
    assert sum(f["nulls"].get("v", 0) for f in m["files"]) == n_nulls


def test_update_where_repairs_pre_fix_manifest(spark, tmpdir):
    """Copy-on-write rewrites stamp the current gen, so they must not
    carry poisoned entries: update_where over a pre-fix manifest
    re-describes the untouched files too."""
    from nimble_spark.sources.merge import update_where

    path = f"{tmpdir}/update_repair"
    n_nulls = _write_nullable(spark, path)
    _poison(path)
    update_where(spark, path, "k = 1", {"v": "99.0"})
    m = read_manifest(path)
    assert m["stats_gen"] == STATS_GEN
    assert sum(f["nulls"].get("v", 0) for f in m["files"]) == n_nulls


def test_compaction_carries_stats_gen(spark, tmpdir):
    """Compaction passes untouched entries through verbatim, so it
    carries the PRIOR generation — a pre-fix table stays guarded, a
    healthy table is not downgraded."""
    from nimble_spark.sources.compaction import compact_table

    healthy = f"{tmpdir}/compact_healthy"
    _write_nullable(spark, healthy)
    compact_table(spark, healthy)
    assert read_manifest(healthy).get("stats_gen", 1) == STATS_GEN

    prefix = f"{tmpdir}/compact_prefix"
    _write_nullable(spark, prefix)
    _poison(prefix)
    compact_table(spark, prefix)
    assert read_manifest(prefix).get("stats_gen", 1) < STATS_GEN  # still guarded


def test_empty_append_commit_over_pre_fix_manifest(spark, tmpdir):
    """A zero-new-file commit (empty streaming micro-batch shape) on a
    pre-fix table must not crash on the repair gate: with a prior
    manifest it is a valid republish, and the re-describe repairs."""
    from nimble_spark.sources.datasource import register_nimble_source

    path = f"{tmpdir}/empty_append"
    n_nulls = _write_nullable(spark, path)
    _poison(path)
    register_nimble_source(spark)
    empty = spark.createDataFrame([], "k LONG, v DOUBLE").repartition(1)
    empty.write.format("nimble").mode("append").save(path)
    m = read_manifest(path)
    assert m["stats_gen"] == STATS_GEN  # repaired by the re-describe
    assert sum(f["nulls"].get("v", 0) for f in m["files"]) == n_nulls
    got = spark.read.format("nimble").load(path).count()
    assert got == 90


def test_current_gen_append_still_reuses_entries(spark, tmpdir):
    """The repair path must not tax healthy tables: appending to a
    current-gen manifest reuses prior entries verbatim (no re-hash)."""
    path = f"{tmpdir}/reuse_ok"
    _write_nullable(spark, path)
    before = {f["path"]: f for f in read_manifest(path)["files"]}
    extra = spark.createDataFrame([(2000, 2.0)], "k LONG, v DOUBLE")
    write_table(extra, path, mode="append")
    after = {f["path"]: f for f in read_manifest(path)["files"]}
    for p, entry in before.items():
        assert after[p] == entry  # carried verbatim, not re-described
