"""Layout-preserving copy-on-write on directory-shaped tables.

Hive partitions and hash buckets are directory indexes: merge_into /
update_where / compact_table must keep every rewritten row inside the
directory its pruning paths visit, preserve untouched files verbatim
(byte identity — the 100 TB contract is rewrite-what-changed), and
keep partition values at their declared type (the staged rewrite
writes directory names from live values, so '01' must never become
'1' on the way through).

Reference: the mutation story is scan-time masks
(dwio/nimble/velox/selective/SelectiveNimbleReader.cpp:334-338);
layout-preserving rewrites are the table-layer operation a lakehouse
builds on top (Delta partitioned MERGE / OPTIMIZE analogue).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nimble_spark.sources.compaction import compact_table, plan_compaction
from nimble_spark.sources.merge import merge_into, update_where
from nimble_spark.sources.table import (
    BUCKET_COL,
    WriteOptions,
    read_manifest,
    read_table,
    write_table,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _file_identity(path, manifest):
    """relpath → (inode, mtime_ns): byte-identity proxy for
    untouched-file assertions."""
    out = {}
    for e in manifest["files"]:
        st = os.stat(os.path.join(path, e["path"]))
        out[os.path.normpath(e["path"])] = (st.st_ino, st.st_mtime_ns)
    return out


def test_merge_partitioned_preserves_layout_and_untouched_bytes(spark, tmpdir):
    path = f"{tmpdir}/merge_part"
    d0 = spark.createDataFrame(
        [(1, "01", 10.0), (2, "01", 20.0), (3, "02", 30.0), (4, "03", 40.0)],
        "k LONG, p STRING, v DOUBLE",
    )
    write_table(d0, path, WriteOptions(partition_by=["p"]))
    before = _file_identity(path, read_manifest(path))

    src = spark.createDataFrame(
        [(2, "01", 99.0), (5, "04", 50.0)], "k LONG, p STRING, v DOUBLE"
    )
    m1 = merge_into(spark, path, src, key="k")

    # layout preserved: every live file sits under its partition dir,
    # including the brand-new p=04 partition
    for e in m1["files"]:
        rel = os.path.normpath(e["path"])
        assert rel.split(os.sep)[0].startswith("p="), rel
    # untouched partitions keep their exact bytes (inode + mtime)
    after = _file_identity(path, m1)
    untouched = {r: i for r, i in before.items() if not r.startswith("p=01")}
    assert untouched and all(after[r] == i for r, i in untouched.items())
    # file-granular: only p=01 files (the partition holding key 2)
    # were replaced, and at least one was
    removed = m1["commits"][-1]["removed"]
    assert removed and all(r.startswith("p=01") for r in removed)

    got = read_table(spark, path)
    assert dict(got.dtypes)["p"] == "string"  # declared type survives
    assert _rows(got) == [
        (1, "01", 10.0),
        (2, "01", 99.0),
        (3, "02", 30.0),
        (4, "03", 40.0),
        (5, "04", 50.0),
    ]
    # partition pruning still works post-merge
    assert _rows(read_table(spark, path, range_scan=("p", "01", "01"))) == [
        (1, "01", 10.0),
        (2, "01", 99.0),
    ]
    # the pre-merge snapshot replays from the rel-path-preserving trash
    snap = read_table(spark, path, as_of_commit=0)
    assert _rows(snap) == _rows(d0)


def test_update_partitioned_moves_rows_across_partitions(spark, tmpdir):
    path = f"{tmpdir}/upd_part"
    d0 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)], "k LONG, p STRING, v DOUBLE"
    )
    write_table(d0, path, WriteOptions(partition_by=["p"]))

    # updating the PARTITION column moves the row to its new directory
    update_where(spark, path, "k = 2", {"p": "'c'", "v": "v * 10"})
    got = read_table(spark, path)
    assert _rows(got) == [(1, "a", 1.0), (2, "c", 20.0), (3, "b", 3.0)]
    assert _rows(read_table(spark, path, range_scan=("p", "c", "c"))) == [(2, "c", 20.0)]
    m = read_manifest(path)
    moved = [e["path"] for e in m["files"] if e["path"].startswith("p=c")]
    assert moved, m["files"]


def test_merge_bucketed_preserves_buckets_and_prunes_discovery(spark, tmpdir):
    path = f"{tmpdir}/merge_bucket"
    d0 = spark.createDataFrame(
        [(i, f"n{i}") for i in range(200)], "k LONG, name STRING"
    )
    write_table(d0, path, WriteOptions(bucket_by="k", n_buckets=8))
    before = _file_identity(path, read_manifest(path))

    src = spark.createDataFrame([(7, "SEVEN"), (500, "new")], "k LONG, name STRING")
    hit = {
        r.b
        for r in src.select(
            F.pmod(F.xxhash64(F.col("k")), F.lit(8)).alias("b")
        ).collect()
    }
    m1 = merge_into(spark, path, src, key="k")

    # every live file still lives in a bucket directory
    assert all(
        os.path.normpath(e["path"]).split(os.sep)[0].startswith(f"{BUCKET_COL}=")
        for e in m1["files"]
    )
    # only files in the source keys' bucket directories were replaced
    # (merging ON the bucket key prunes discovery to those dirs)
    removed = set(m1["commits"][-1]["removed"])
    assert removed
    for rel in removed:
        b = int(os.path.normpath(rel).split(os.sep)[0].split("=", 1)[1])
        assert b in hit, (rel, hit)
    # untouched buckets keep their exact bytes
    after = _file_identity(path, m1)
    for rel, ident in before.items():
        b = int(rel.split(os.sep)[0].split("=", 1)[1])
        if b not in hit:
            assert after[rel] == ident

    got = dict((r.k, r.name) for r in read_table(spark, path).collect())
    assert len(got) == 201 and got[7] == "SEVEN" and got[500] == "new"
    # the hash index (directory point lookup) still prunes and answers
    assert [r.name for r in read_table(spark, path, point_lookup=("k", [500])).collect()] == ["new"]
    assert [r.name for r in read_table(spark, path, point_lookup=("k", [13])).collect()] == ["n13"]


def test_compact_partitioned_bins_within_directories(spark, tmpdir):
    path = f"{tmpdir}/compact_part"
    d0 = spark.createDataFrame(
        [(i, "01" if i % 2 else "02", float(i)) for i in range(40)],
        "k LONG, p STRING, v DOUBLE",
    )
    write_table(d0, path, WriteOptions(partition_by=["p"]))
    # pile small-file debt onto both partitions
    for i in range(40, 52):
        write_table(
            spark.createDataFrame([(i, "01" if i % 2 else "02", float(i))],
                                  "k LONG, p STRING, v DOUBLE"),
            path, WriteOptions(partition_by=["p"]), mode="append",
        )
    m = read_manifest(path)
    bins = plan_compaction(m, target_file_bytes=1 << 20)
    assert bins
    for b in bins:  # a bin never crosses a partition directory
        dirs = {os.path.dirname(os.path.normpath(f["path"])) for f in b}
        assert len(dirs) == 1, dirs

    expect = _rows(read_table(spark, path))
    res = compact_table(spark, path, target_file_bytes=1 << 20)
    assert res["files_after"] < res["files_before"]
    m2 = read_manifest(path)
    # merged outputs live inside their partition directory
    assert all(
        os.path.normpath(e["path"]).split(os.sep)[0].startswith("p=")
        for e in m2["files"]
    )
    got = read_table(spark, path)
    assert dict(got.dtypes)["p"] == "string"
    assert _rows(got) == expect
    assert _rows(read_table(spark, path, range_scan=("p", "02", "02"))) == [
        r for r in expect if r[1] == "02"
    ]
    # snapshot across the compaction replays from rel-preserving trash
    assert _rows(read_table(spark, path, as_of_commit=0)) == _rows(d0)


def test_compact_bucketed_keeps_point_lookup(spark, tmpdir):
    path = f"{tmpdir}/compact_bucket"
    write_table(
        spark.createDataFrame([(i, f"n{i}") for i in range(100)], "k LONG, name STRING"),
        path, WriteOptions(bucket_by="k", n_buckets=4),
    )
    for i in range(100, 112):
        write_table(
            spark.createDataFrame([(i, f"n{i}")], "k LONG, name STRING"),
            path, WriteOptions(bucket_by="k", n_buckets=4), mode="append",
        )
    res = compact_table(spark, path, target_file_bytes=1 << 20)
    assert res["files_after"] < res["files_before"]
    assert read_table(spark, path).count() == 112
    assert [r.name for r in read_table(spark, path, point_lookup=("k", [107])).collect()] == ["n107"]


def test_rewrites_refuse_pending_delete_masks(spark, tmpdir):
    from nimble_spark.sources.deletes import delete_rows

    path = f"{tmpdir}/masked"
    write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k LONG, name STRING"),
        path, WriteOptions(),
    )
    delete_rows(spark, path, "k", [2])
    src = spark.createDataFrame([(2, "B")], "k LONG, name STRING")
    # (a) source carries a masked value — the standing mask would swallow it
    with pytest.raises(ValueError, match="pending delete"):
        merge_into(spark, path, src, key="k")
    # (b) rewriting the mask COLUMN moves rows into/out of the mask's shadow
    with pytest.raises(ValueError, match="delete masks"):
        update_where(spark, path, "name = 'a'", {"k": "k + 10"})
    # rewriting a NON-mask column is safe: masked rows ride through under
    # the still-standing mask — no resurrection, no raise
    update_where(spark, path, "k = 1", {"name": "'A'"})
    from nimble_spark.sources.deletes import read_with_deletes

    assert [
        (r.k, r.name) for r in read_with_deletes(spark, path).orderBy("k").collect()
    ] == [(1, "A")]


def test_stream_sink_partitioned_layout(spark, tmp_path):
    """A partitioned streaming ingest (the canonical 100 TB shape:
    date/type-partitioned append-only feed): stream_to_table with
    WriteOptions(partition_by=...) must land every micro-batch's rows
    under their partition directories, keep partition pruning exact
    across batches, and preserve declared partition types ('01' stays
    the STRING '01')."""
    import os
    import time

    from nimble_spark.streaming.sink import stream_to_table

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "01", 10.0), (2, "02", 20.0)], "k LONG, p STRING, v DOUBLE"
    ).coalesce(1).write.parquet(src + "/b0")
    time.sleep(1.1)
    spark.createDataFrame(
        [(3, "01", 30.0), (4, "03", 40.0)], "k LONG, p STRING, v DOUBLE"
    ).coalesce(1).write.parquet(src + "/b1")
    for d in ("b0", "b1"):
        for f in os.listdir(f"{src}/{d}"):
            if f.endswith(".parquet"):
                os.rename(f"{src}/{d}/{f}", f"{src}/{d}_{f}")

    stream = (
        spark.readStream.schema("k LONG, p STRING, v DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    table = str(tmp_path / "table")
    q = stream_to_table(
        stream, table, checkpoint=str(tmp_path / "ckpt"),
        opts=WriteOptions(partition_by=["p"]),
    )
    q.awaitTermination()

    m = read_manifest(table)
    assert len(m["commits"]) == 2  # one commit per micro-batch
    assert all(f["path"].startswith("p=") for f in m["files"])
    got = read_table(spark, table)
    assert dict(got.dtypes)["p"] == "string"
    assert _rows(got) == [
        (1, "01", 10.0), (2, "02", 20.0), (3, "01", 30.0), (4, "03", 40.0)
    ]
    # partition pruning spans both batches' files
    assert _rows(read_table(spark, table, range_scan=("p", "01", "01"))) == [
        (1, "01", 10.0), (3, "01", 30.0)
    ]


def test_crashed_compaction_orphan_in_partition_dir_not_adopted(spark, tmpdir):
    """A crashed partitioned compaction leaves its merged output
    INSIDE a partition directory (p=01/compact-*.parquet) before the
    manifest publish. The next append's stray guard must exclude it —
    adopting it would double-count every row it duplicates."""
    import shutil

    path = f"{tmpdir}/orphaned"
    write_table(
        spark.createDataFrame([(1, "01", 1.0), (2, "02", 2.0)],
                              "k LONG, p STRING, v DOUBLE"),
        path, WriteOptions(partition_by=["p"]),
    )
    # plant the orphan: a byte-copy of a live file under its dir,
    # named like compaction's staged output
    m = read_manifest(path)
    victim = next(f["path"] for f in m["files"] if f["path"].startswith("p=01"))
    orphan = os.path.join(path, "p=01", "compact-deadbeef0000.parquet")
    shutil.copyfile(os.path.join(path, victim), orphan)

    write_table(
        spark.createDataFrame([(3, "01", 3.0)], "k LONG, p STRING, v DOUBLE"),
        path, WriteOptions(partition_by=["p"]), mode="append",
    )
    m2 = read_manifest(path)
    assert "p=01/compact-deadbeef0000.parquet" not in {
        os.path.normpath(f["path"]) for f in m2["files"]
    }
    got = read_table(spark, path)
    assert got.count() == 3  # no phantom duplicate of key 1
    assert _rows(got) == [(1, "01", 1.0), (2, "02", 2.0), (3, "01", 3.0)]


def test_merge_bucketed_casts_mismatched_source_types(spark, tmpdir):
    """xxhash64 is width-sensitive: an INT source key hashes to a
    different bucket than the declared LONG. merge_into must align the
    source to the table schema before any hashing, or discovery misses
    matches and rewritten rows land in directories point lookups never
    read."""
    path = f"{tmpdir}/bucket_types"
    write_table(
        spark.createDataFrame([(i, f"n{i}") for i in range(50)], "k LONG, name STRING"),
        path, WriteOptions(bucket_by="k", n_buckets=4),
    )
    src = spark.createDataFrame([(7, "SEVEN"), (99, "new")], "k INT, name STRING")
    merge_into(spark, path, src, key="k")
    got = dict((r.k, r.name) for r in read_table(spark, path).collect())
    assert len(got) == 51 and got[7] == "SEVEN" and got[99] == "new"
    # the hash index still answers point lookups for both rows
    assert [r.name for r in read_table(spark, path, point_lookup=("k", [7])).collect()] == ["SEVEN"]
    assert [r.name for r in read_table(spark, path, point_lookup=("k", [99])).collect()] == ["new"]
