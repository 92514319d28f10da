"""Replication soak: a replica synced after EVERY random source
mutation must always equal the source's commit-logged state, and the
only acceptable interruptions are the LOUD fences (history rewrite →
re-bootstrap; nothing silent, nothing stale)."""

from __future__ import annotations

import random

import pytest

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


def _df(spark, rows):
    return spark.createDataFrame(rows, "k LONG, v LONG")


def _logged_state(spark, path):
    """The source's COMMIT-LOGGED state (pending masks excluded: masks
    are scan-time, not commit events, so the CDC feed cannot carry
    them until compact_deletes materializes — which resets history and
    forces the re-bootstrap the fuzzer exercises)."""
    return {r["k"]: r["v"] for r in read_table(spark, path).collect()}


def _replica_state(spark, path):
    from nimble_spark.sources.deletes import read_with_deletes

    return {r["k"]: r["v"] for r in read_with_deletes(spark, path).collect()}


@pytest.mark.parametrize("seed", [42, 4242])
def test_replication_tracks_random_lifecycle(spark, tmp_path, seed):
    rng = random.Random(seed)
    src = str(tmp_path / "src")
    write_table(_df(spark, [(k, k * 10) for k in range(10)]), src, WriteOptions())
    next_key = 10
    gen = [0]  # replica generation (bumped on re-bootstrap)
    dst = str(tmp_path / f"dst{gen[0]}")
    replicate_table(spark, src, dst, key="k")

    def sync():
        nonlocal dst
        try:
            replicate_table(spark, src, dst, key="k")
        except ValueError as e:
            # the loud fences: history rewritten or cursor expired —
            # anything else is a real failure
            assert "history was rewritten" in str(e) or "expired" in str(
                e
            ) or "fold boundary" in str(e), e
            gen[0] += 1
            dst = str(tmp_path / f"dst{gen[0]}")
            replicate_table(spark, src, dst, key="k")
        assert _replica_state(spark, dst) == _logged_state(spark, src)

    for step in range(10):
        op = rng.choice(
            ["append", "merge", "update", "mask_and_compact", "rollback", "expire"]
        )
        if op == "append":
            n = rng.randint(1, 4)
            write_table(
                _df(spark, [(next_key + i, (next_key + i) * 10) for i in range(n)]),
                src, mode="append",
            )
            next_key += n
        elif op == "merge":
            keys = list(_logged_state(spark, src))
            ups = [(k, rng.randint(0, 999)) for k in rng.sample(keys, min(2, len(keys)))]
            ups.append((next_key, next_key * 10))
            next_key += 1
            merge_into(spark, src, _df(spark, ups), key="k")
        elif op == "update":
            update_where(spark, src, f"k % 7 = {rng.randint(0, 6)}", {"v": "v + 1"})
        elif op == "mask_and_compact":
            keys = list(_logged_state(spark, src))
            if not keys:
                continue
            delete_rows(spark, src, "k", rng.sample(keys, min(2, len(keys))))
            compact_deletes(spark, src)  # history reset → fence fires
        elif op == "rollback":
            commits = read_manifest(src).get("commits", [])
            if len(commits) < 2:
                continue
            target = int(commits[rng.randrange(len(commits) - 1)].get("commit"))
            rollback_table(spark, src, commit=target)
        elif op == "expire":
            n = len(read_manifest(src).get("commits", []))
            if n < 3:
                continue
            expire_snapshots(src, keep_last=rng.randint(2, n - 1))
        sync()

    # final convergence, and the cursor really is the head
    from nimble_spark.sources.table import _next_commit, table_properties

    head = _next_commit(read_manifest(src).get("commits", [])) - 1
    assert int(table_properties(dst)["nimble.replica.synced_commit"]) == head
