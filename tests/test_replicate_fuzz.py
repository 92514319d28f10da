"""Replication soak: a replica synced after EVERY random source
mutation must always equal the source's commit-logged state, and the
only acceptable interruptions are the LOUD fences (history rewrite →
re-bootstrap; pending masks → compact + re-bootstrap; nothing silent,
nothing stale). r11 adds source schema evolution to the lifecycle mix
(random ALTER renames interleaved with data mutations — the sync must
replay them onto the replica before applying data, VERDICT r10 #1)
and pending-mask windows (ADVICE r10 #3: masks produce no CDC events,
so a sync over a masked source must refuse, never diverge)."""

from __future__ import annotations

import random

import pytest

from nimble_spark.sources.alter import alter_table
from nimble_spark.sources.deletes import compact_deletes, delete_rows
from nimble_spark.sources.merge import merge_into, replicate_table, update_where
from nimble_spark.sources.table import (
    WriteOptions,
    expire_snapshots,
    read_manifest,
    read_table,
    rollback_table,
    write_table,
)

# Long-running fuzz/soak/drill tier: excluded from the driver-window
# default run (pytest.ini addopts); the FULL suite (-m "") remains the
# builder's round-exit gate.
pytestmark = pytest.mark.slow

_FENCES = (
    "history was rewritten",
    "expired",
    "fold boundary",
    "pending delete masks",
)


def _df(spark, rows, vname="v"):
    return spark.createDataFrame(rows, f"k LONG, {vname} LONG")


def _logged_state(spark, path, vname):
    """The source's COMMIT-LOGGED state (pending masks excluded: masks
    are scan-time, not commit events, so the CDC feed cannot carry
    them until compact_deletes materializes — which resets history and
    forces the re-bootstrap the fuzzer exercises)."""
    return {r["k"]: r[vname] for r in read_table(spark, path).collect()}


def _replica_state(spark, path, vname):
    from nimble_spark.sources.deletes import read_with_deletes

    df = read_with_deletes(spark, path)
    assert vname in df.columns, f"replica missed the rename to {vname!r}"
    return {r["k"]: r[vname] for r in df.collect()}


@pytest.mark.parametrize("seed", [42, 4242])
def test_replication_tracks_random_lifecycle(spark, tmp_path, seed):
    rng = random.Random(seed)
    src = str(tmp_path / "src")
    write_table(_df(spark, [(k, k * 10) for k in range(10)]), src, WriteOptions())
    next_key = 10
    vname = ["v"]  # the value column's CURRENT logical name
    ren_n = [0]
    gen = [0]  # replica generation (bumped on re-bootstrap)
    dst = str(tmp_path / f"dst{gen[0]}")
    replicate_table(spark, src, dst, key="k")

    def sync():
        nonlocal dst
        try:
            replicate_table(spark, src, dst, key="k")
        except ValueError as e:
            # the loud fences — anything else is a real failure
            assert any(f in str(e) for f in _FENCES), e
            if "pending delete masks" in str(e):
                # the documented remedy: materialize the masks (a
                # history reset), then re-bootstrap into a fresh path
                compact_deletes(spark, src)
            gen[0] += 1
            dst = str(tmp_path / f"dst{gen[0]}")
            replicate_table(spark, src, dst, key="k")
        assert _replica_state(spark, dst, vname[0]) == _logged_state(
            spark, src, vname[0]
        )

    for step in range(12):
        op = rng.choice(
            [
                "append", "merge", "update", "mask_and_compact",
                "mask_pending", "rollback", "expire", "alter_rename",
            ]
        )
        if op == "append":
            n = rng.randint(1, 4)
            write_table(
                _df(
                    spark,
                    [(next_key + i, (next_key + i) * 10) for i in range(n)],
                    vname[0],
                ),
                src, mode="append",
            )
            next_key += n
        elif op == "merge":
            keys = list(_logged_state(spark, src, vname[0]))
            ups = [(k, rng.randint(0, 999)) for k in rng.sample(keys, min(2, len(keys)))]
            ups.append((next_key, next_key * 10))
            next_key += 1
            merge_into(spark, src, _df(spark, ups, vname[0]), key="k")
        elif op == "update":
            update_where(
                spark, src, f"k % 7 = {rng.randint(0, 6)}",
                {vname[0]: f"{vname[0]} + 1"},
            )
        elif op == "mask_and_compact":
            keys = list(_logged_state(spark, src, vname[0]))
            if not keys:
                continue
            delete_rows(spark, src, "k", rng.sample(keys, min(2, len(keys))))
            compact_deletes(spark, src)  # history reset → fence fires
        elif op == "mask_pending":
            keys = list(_logged_state(spark, src, vname[0]))
            if not keys:
                continue
            # masks left PENDING: the next sync must hit the loud
            # mask fence (silent divergence is the failure mode)
            delete_rows(spark, src, "k", rng.sample(keys, min(1, len(keys))))
        elif op == "rollback":
            commits = read_manifest(src).get("commits", [])
            if len(commits) < 2:
                continue
            target = int(commits[rng.randrange(len(commits) - 1)].get("commit"))
            # a rollback BEHIND an alter would resurrect the old schema
            # under the new mapping — the engine refuses those; keep the
            # fuzz to rollbacks that stay after the newest alter
            alters = [
                int(c.get("commit", -1))
                for c in commits
                if c.get("mode") == "alter"
            ]
            if alters and target < max(alters):
                continue
            rollback_table(spark, src, commit=target)
        elif op == "expire":
            n = len(read_manifest(src).get("commits", []))
            if n < 3:
                continue
            expire_snapshots(src, keep_last=rng.randint(2, n - 1))
        elif op == "alter_rename":
            # fresh target name every time: dead physical names stay
            # reserved (old files hold bytes under them)
            new = f"v_{ren_n[0]}"
            ren_n[0] += 1
            alter_table(src, rename={vname[0]: new})
            vname[0] = new
        sync()

    # final convergence, and the cursor really is the head
    from nimble_spark.sources.table import _next_commit, table_properties

    head = _next_commit(read_manifest(src).get("commits", [])) - 1
    assert int(table_properties(dst)["nimble.replica.synced_commit"]) == head
