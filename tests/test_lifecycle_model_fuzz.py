"""Model-based randomized drill of the full table lifecycle.

The reference exercises its writer/reader stack with randomized
end-to-end tests (dwio/nimble/velox/tests/VeloxReaderTests.cpp's
fuzzer-driven write/read/seek loops); the table-format analogue here
is an OPERATION-SEQUENCE fuzz: a seeded random interleaving of every
mutation the format supports — append, upsert merge, update-where,
logical delete, delete compaction, file compaction, vacuum — checked
after EVERY step against a plain Python dict model of the expected
rows, plus snapshot (time travel) reconstruction checks for every
recorded commit before vacuum reclaims history.

Invariants drilled:
  * live view (read_with_deletes) == model at every step
  * manifest `rows` matches the committed (pre-mask) row count
  * as_of_commit snapshots reconstruct every recorded historical
    state, across merges/updates/compactions (trash tombstones), until
    VACUUM trades history for space
  * CDC: read_changes(since=last) is empty after a compaction
    (data_change=false), non-empty after data commits
"""

from __future__ import annotations

import random

import pytest

from nimble_spark.sources.table import (
    WriteOptions,
    read_manifest,
    read_table,
    write_table,
)


def _df(spark, rows):
    return spark.createDataFrame([(k, v) for k, v in rows], "k LONG, v LONG")


def _live(spark, path) -> dict[int, int]:
    from nimble_spark.sources.deletes import read_with_deletes

    return {r["k"]: r["v"] for r in read_with_deletes(spark, path).collect()}


def _raw(spark, path) -> dict[int, int]:
    return {r["k"]: r["v"] for r in read_table(spark, path).collect()}


@pytest.mark.parametrize("seed", [11, 42, 2026])
def test_lifecycle_model(spark, tmpdir, seed):
    _run_lifecycle(spark, f"{tmpdir}/life_{seed}", seed)


@pytest.mark.parametrize("seed", [7, 42])
def test_lifecycle_model_sharded_manifest(spark, tmpdir, seed, monkeypatch):
    """r6: the same lifecycle drill with the manifest SHARDED from the
    first few files on (threshold forced down): every mutation, time
    travel, CDC and vacuum invariant must hold identically when the
    per-file stats live in content-addressed page files."""
    import os

    import nimble_spark.sources.table as tbl

    monkeypatch.setattr(tbl, "SHARD_FILE_THRESHOLD", 4)
    monkeypatch.setattr(tbl, "MANIFEST_PAGE_SIZE", 2)
    path = f"{tmpdir}/life_sh_{seed}"
    _run_lifecycle(spark, path, seed)
    # the drill must actually have crossed into sharded territory
    assert os.path.isdir(os.path.join(path, "_nimble", "pages"))


def _run_lifecycle(spark, path, seed):
    from nimble_spark.sources.compaction import compact_table, vacuum_table
    from nimble_spark.sources.deletes import compact_deletes, delete_rows
    from nimble_spark.sources.merge import merge_into, update_where
    from nimble_spark.sources.table import read_changes

    rng = random.Random(seed)

    committed: dict[int, int] = {k: k * 10 for k in range(20)}
    masked: set[int] = set()
    next_key = 20
    write_table(_df(spark, committed.items()), path, WriteOptions())

    # snapshots[commit_index] = committed (pre-mask) state at that commit
    snapshots: dict[int, dict[int, int]] = {
        len(read_manifest(path)["commits"]) - 1: dict(committed)
    }

    def check():
        assert _live(spark, path) == {
            k: v for k, v in committed.items() if k not in masked
        }
        assert read_manifest(path)["rows"] == len(committed)

    ops = [
        "append", "merge", "update", "delete",
        "compact_deletes", "compact", "rollback",
    ]
    for step in range(12):
        op = rng.choice(ops)
        if op == "append":
            n = rng.randint(1, 8)
            fresh = {next_key + i: (next_key + i) * 10 for i in range(n)}
            next_key += n
            write_table(_df(spark, fresh.items()), path, WriteOptions(), mode="append")
            committed.update(fresh)
            snapshots[len(read_manifest(path)["commits"]) - 1] = dict(committed)
        elif op == "merge":
            # upsert: half existing UNMASKED keys (new values), half new.
            # Masked keys are excluded — a mask hides its key by value
            # regardless of later re-inserts until compact_deletes
            # materializes it, so re-upserting one is user error.
            live_keys = [k for k in committed if k not in masked]
            ups = {
                k: rng.randint(0, 999)
                for k in rng.sample(live_keys, min(3, len(live_keys)))
            }
            news = {next_key + i: rng.randint(0, 999) for i in range(2)}
            next_key += 2
            merge_into(spark, path, _df(spark, {**ups, **news}.items()), key="k")
            committed.update(ups)
            committed.update(news)
            snapshots[len(read_manifest(path)["commits"]) - 1] = dict(committed)
        elif op == "update":
            pivot = rng.randint(0, next_key)
            update_where(spark, path, f"k >= {pivot}", {"v": "v + 1"})
            committed.update(
                {k: v + 1 for k, v in committed.items() if k >= pivot}
            )
            snapshots[len(read_manifest(path)["commits"]) - 1] = dict(committed)
        elif op == "delete":
            live_keys = [k for k in committed if k not in masked]
            if not live_keys:
                continue
            victims = rng.sample(live_keys, min(2, len(live_keys)))
            delete_rows(spark, path, "k", victims)
            masked.update(victims)
        elif op == "compact_deletes":
            compact_deletes(spark, path)
            committed = {k: v for k, v in committed.items() if k not in masked}
            masked = set()
            # materialization rewrites the whole table: new history root
            snapshots = {len(read_manifest(path)["commits"]) - 1: dict(committed)}
        elif op == "compact":
            before = len(read_manifest(path)["commits"]) - 1
            try:
                compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
            except ValueError:
                continue  # nothing to compact (single file) — fine
            # data_change=false: CDC feed over the compact commit is empty
            assert read_changes(spark, path, since_commit=before).count() == 0
            snapshots[len(read_manifest(path)["commits"]) - 1] = dict(committed)
        elif op == "rollback":
            # restore a random recorded snapshot; the rollback is
            # itself a commit, so it too lands in `snapshots`. Delete
            # masks are NOT commit-logged: pending masks keep hiding
            # their keys across the rollback (modeled by `masked`).
            from nimble_spark.sources.table import rollback_table

            target_ci = rng.choice(sorted(snapshots))
            rollback_table(spark, path, commit=target_ci)
            committed = dict(snapshots[target_ci])
            snapshots[len(read_manifest(path)["commits"]) - 1] = dict(committed)
        check()

    # Every recorded snapshot reconstructs (compaction tombstoned its
    # sources into trash, so pre-compact commits stay readable)
    for ci, want in snapshots.items():
        got = {
            r["k"]: r["v"]
            for r in read_table(spark, path, as_of_commit=ci).collect()
        }
        assert got == want, f"snapshot at commit {ci} diverged (seed {seed})"

    # VACUUM trades history for space; the live view must be unchanged
    vacuum_table(path, min_age_s=0.0)
    check()
    assert _raw(spark, path) == committed


@pytest.mark.parametrize("seed", [5, 1234])
def test_lifecycle_model_dedup_table(spark, tmpdir, seed):
    """The aliased-table (dedup_columns) variant: appends must keep
    satisfying the alias contract, compactions must carry it forward,
    snapshots must reconstruct the LOGICAL schema at every commit, and
    the CDC feed over the compact commit stays empty."""
    from nimble_spark.sources.compaction import compact_table, vacuum_table
    from nimble_spark.sources.table import read_changes

    rng = random.Random(seed)
    path = f"{tmpdir}/life_dedup_{seed}"

    def _ddf(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id AS k", "id * 2 AS v", "id * 2 AS v_copy",
            "CAST(id % 3 AS STRING) AS tag"
        )

    from nimble_spark.sources.table import WriteOptions as WO

    write_table(_ddf(0, 50), path, WO(dedup_columns=True))
    assert read_manifest(path)["column_aliases"] == {"v_copy": "v"}
    hi = 50
    committed = {k: k * 2 for k in range(50)}
    snapshots = {len(read_manifest(path)["commits"]) - 1: dict(committed)}

    for _ in range(8):
        op = rng.choice(["append", "append", "compact"])
        if op == "append":
            n = rng.randint(5, 30)
            write_table(_ddf(hi, hi + n), path, WO(), mode="append")
            committed.update({k: k * 2 for k in range(hi, hi + n)})
            hi += n
            snapshots[len(read_manifest(path)["commits"]) - 1] = dict(committed)
        else:
            before = len(read_manifest(path)["commits"]) - 1
            try:
                compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
            except ValueError:
                continue
            assert read_changes(spark, path, since_commit=before).count() == 0
            assert read_manifest(path)["column_aliases"] == {"v_copy": "v"}
            snapshots[len(read_manifest(path)["commits"]) - 1] = dict(committed)
        out = read_table(spark, path)
        assert out.columns == ["k", "v", "v_copy", "tag"]
        assert {r["k"]: r["v"] for r in out.collect()} == committed
        assert out.filter("v_copy != v").count() == 0

    for ci, want in snapshots.items():
        snap = read_table(spark, path, as_of_commit=ci)
        assert {r["k"]: r["v_copy"] for r in snap.collect()} == want, (
            f"snapshot at commit {ci} diverged (seed {seed})"
        )

    vacuum_table(path, min_age_s=0.0)
    out = read_table(spark, path)
    assert {r["k"]: r["v_copy"] for r in out.collect()} == committed
