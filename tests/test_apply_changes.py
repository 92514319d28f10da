"""APPLY CHANGES INTO (merge.apply_changes) — r10.

The CDC consumer contract read_changes documents in prose, as one
operator: per-key newest-event reduction (insert beats delete within
a commit), insert-winners upserted, delete-winners masked. Edge
semantics drilled here; the end-to-end oracle gate is
q_apply_changes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nimble_spark.sources.deletes import delete_rows, read_with_deletes
from nimble_spark.sources.merge import apply_changes
from nimble_spark.sources.table import WriteOptions, read_table, write_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "k LONG, v LONG")


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "k LONG, v LONG, _commit LONG, _change_type STRING"
    )


def _state(spark, path):
    return {
        r["k"]: r["v"] for r in read_with_deletes(spark, path).collect()
    }


@pytest.fixture
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(_df(spark, [(k, k * 10) for k in range(6)]), path, WriteOptions())
    return path


def test_newest_event_wins_per_key(spark, table):
    window = _ev(spark, [
        (1, 111, 4, "insert"),   # then deleted at 5 → gone
        (1, 0, 5, "delete"),
        (2, 0, 5, "delete"),     # then reinserted at 6 → survives new
        (2, 222, 6, "insert"),
        (3, 333, 5, "insert"),   # plain update
        (9, 999, 5, "insert"),   # brand-new key
    ])
    apply_changes(spark, table, window, key="k")
    assert _state(spark, table) == {
        0: 0, 4: 40, 5: 50,      # untouched
        2: 222, 3: 333, 9: 999,  # reinsert / update / new
    }


def test_insert_beats_delete_within_one_commit(spark, table):
    window = _ev(spark, [
        (1, 0, 5, "delete"),
        (1, 111, 5, "insert"),   # same commit: insert wins (contract)
    ])
    apply_changes(spark, table, window, key="k")
    assert _state(spark, table)[1] == 111


def test_delete_only_window_masks_without_rewrite(spark, table):
    before = read_table(spark, table).count()
    m = apply_changes(
        spark, table, _ev(spark, [(1, 0, 5, "delete")]), key="k"
    )
    assert 1 not in _state(spark, table)
    # logical delete: the manifest still accounts the masked row
    assert m["rows"] == before


def test_upsert_onto_pending_mask_materializes_first(spark, table):
    """A pending mask hides its key BY VALUE — an upsert landing under
    it would be invisible (the documented landmine). apply_changes
    materializes pending masks before upserting."""
    delete_rows(spark, table, "k", [2])
    assert 2 not in _state(spark, table)
    apply_changes(
        spark, table, _ev(spark, [(2, 222, 7, "insert")]), key="k"
    )
    s = _state(spark, table)
    assert s[2] == 222  # visible — masks were materialized first
    assert s[0] == 0 and s[5] == 50


def test_missing_cdc_columns_refuse(spark, table):
    with pytest.raises(ValueError, match="_change_type"):
        apply_changes(spark, table, _df(spark, [(1, 1)]), key="k")


def test_replicate_table_bootstrap_incremental_noop(spark, tmp_path):
    """replicate_table: bootstrap copies the snapshot, later calls
    apply only the commits after the cursor (stored in the replica's
    own property bag), synced calls no-op."""
    from nimble_spark.sources.merge import merge_into, replicate_table
    from nimble_spark.sources.table import table_properties

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_table(_df(spark, [(k, k) for k in range(5)]), src, WriteOptions())

    r = replicate_table(spark, src, dst, key="k")
    assert r["mode"] == "bootstrap" and r["rows_applied"] == 5
    assert _state(spark, dst) == _state(spark, src)

    # source evolves: append + upsert; one incremental sync converges
    write_table(_df(spark, [(10, 10), (11, 11)]), src, mode="append")
    merge_into(spark, src, _df(spark, [(1, 111)]), key="k")
    r = replicate_table(spark, src, dst, key="k")
    assert r["mode"] == "incremental" and r["rows_applied"] > 0
    assert _state(spark, dst) == _state(spark, src)
    assert _state(spark, dst)[1] == 111

    r = replicate_table(spark, src, dst, key="k")
    assert r == {"mode": "noop", "rows_applied": 0,
                 "synced_commit": r["synced_commit"]}
    props = table_properties(dst)
    assert props["nimble.replica.of"] == src
    assert int(props["nimble.replica.synced_commit"]) >= 2


def test_replicate_refuses_wrong_source_and_rewritten_history(spark, tmp_path):
    from nimble_spark.sources.deletes import compact_deletes
    from nimble_spark.sources.merge import replicate_table

    src = str(tmp_path / "src")
    other = str(tmp_path / "other")
    dst = str(tmp_path / "dst")
    write_table(_df(spark, [(k, k) for k in range(5)]), src, WriteOptions())
    write_table(_df(spark, [(9, 9)]), other, WriteOptions())
    replicate_table(spark, src, dst, key="k")
    with pytest.raises(ValueError, match="cross the streams"):
        replicate_table(spark, other, dst, key="k")

    # a full rewrite resets the source's commit log: the stale cursor
    # must refuse loudly, never silently no-op against a new history
    write_table(_df(spark, [(10, 10)]), src, mode="append")
    replicate_table(spark, src, dst, key="k")
    delete_rows(spark, src, "k", [2])
    compact_deletes(spark, src)  # history root reset
    with pytest.raises(ValueError, match="history was rewritten|does not match"):
        replicate_table(spark, src, dst, key="k")


def test_replicate_survives_source_expiry_inside_window(spark, tmp_path):
    """expire_snapshots keeps commit numbers stable: a replica synced
    inside the retained window keeps syncing; one whose cursor's true
    delta was folded refuses via read_changes' fold-boundary guard."""
    from nimble_spark.sources.merge import replicate_table
    from nimble_spark.sources.table import expire_snapshots

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_table(_df(spark, [(0, 0)]), src, WriteOptions())
    replicate_table(spark, src, dst, key="k")  # cursor = 0
    for i in range(1, 5):
        write_table(_df(spark, [(i, i)]), src, mode="append")
    replicate_table(spark, src, dst, key="k")  # cursor = 4
    expire_snapshots(src, keep_last=2)  # retain [3(base), 4]
    write_table(_df(spark, [(9, 9)]), src, mode="append")  # commit 5
    r = replicate_table(spark, src, dst, key="k")  # 4 >= base: in-window
    assert r["mode"] == "incremental"
    assert _state(spark, dst) == _state(spark, src)

    # a replica stuck BEFORE the fold cannot recover the folded delta
    stale = str(tmp_path / "stale")
    write_table(_df(spark, [(0, 0)]), stale, WriteOptions())
    from nimble_spark.sources.table import set_table_property

    set_table_property(stale, "nimble.replica.of", src)
    set_table_property(stale, "nimble.replica.synced_commit", "1")
    with pytest.raises(ValueError, match="expired|fold boundary"):
        replicate_table(spark, src, stale, key="k")


def test_apply_changes_model_fuzz(spark, tmp_path):
    """Model-based fuzz: random typed event windows (unique
    (key, commit, kind); at most one insert per (key, commit)) applied
    in one or two sequential calls must leave the table equal to the
    dict model's newest-event reduction. The two-call split exercises
    the cross-call interplay: a delete masked by call 1 then
    re-inserted by call 2 forces the pending-mask materialization."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    events = st.lists(
        st.tuples(
            st.integers(0, 7),            # key
            st.integers(2, 6),            # commit
            st.booleans(),                # True = insert
            st.integers(100, 999),        # value (inserts)
        ),
        min_size=1, max_size=12,
        unique_by=lambda e: (e[0], e[1], e[2]),
    )

    counter = [0]

    @given(events, st.integers(2, 7))
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(evs, split_commit):
        counter[0] += 1
        path = str(tmp_path / f"fz{counter[0]}")
        base = {k: k * 10 for k in range(6)}
        write_table(_df(spark, list(base.items())), path, WriteOptions())

        def frame(sub):
            return _ev(spark, [
                (k, v if ins else 0, c, "insert" if ins else "delete")
                for (k, c, ins, v) in sub
            ])

        first = [e for e in evs if e[1] < split_commit]
        second = [e for e in evs if e[1] >= split_commit]
        for sub in (first, second):
            if sub:
                apply_changes(spark, path, frame(sub), key="k")

        # model: within each applied window independently, newest event
        # per key wins (insert beats delete at equal commit)
        state = dict(base)
        for sub in (first, second):
            winners: dict[int, tuple] = {}
            for (k, c, ins, v) in sub:
                cur = winners.get(k)
                cand = (c, 1 if ins else 0, v)
                if cur is None or cand[:2] > cur[:2]:
                    winners[k] = cand
            for k, (c, rank, v) in winners.items():
                if rank:
                    state[k] = v
                else:
                    state.pop(k, None)
        assert _state(spark, path) == state, (evs, split_commit)

    check()


def test_replicate_dsl_surface(spark, tmp_path):
    from nimble_spark.tools import run_command

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_table(_df(spark, [(k, k) for k in range(4)]), src, WriteOptions())
    r = run_command(spark, dst, f"REPLICATE FROM '{src}' KEY k").collect()[0]
    assert r["mode"] == "bootstrap" and r["rows_applied"] == 4
    write_table(_df(spark, [(9, 9)]), src, mode="append")
    r = run_command(spark, dst, f"REPLICATE FROM '{src}' KEY k").collect()[0]
    assert r["mode"] == "incremental"
    r = run_command(spark, dst, f"REPLICATE FROM '{src}' KEY k").collect()[0]
    assert r["mode"] == "noop" and r["rows_applied"] == 0
    assert _state(spark, dst) == _state(spark, src)


def test_feed_from_read_changes_roundtrip(spark, tmp_path):
    """End-to-end: one table's own change feed applied into a replica
    reproduces it (the replication pattern), including across a
    row-removing rollback whose removals arrive as delete events."""
    from nimble_spark.sources.table import read_changes, rollback_table

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_table(_df(spark, [(k, k) for k in range(4)]), src, WriteOptions())
    write_table(_df(spark, [(k, k) for k in range(4, 8)]), src, mode="append")
    rollback_table(spark, src, commit=0)  # removes keys 4..7
    write_table(_df(spark, [(8, 8)]), src, mode="append")

    write_table(_df(spark, []), dst, WriteOptions())
    feed = read_changes(
        spark, src, since_commit=-1, with_commit=True, with_change_type=True
    )
    apply_changes(spark, dst, feed, key="k")
    assert _state(spark, dst) == _state(spark, src)
    assert _state(spark, dst) == {0: 0, 1: 1, 2: 2, 3: 3, 8: 8}


def test_same_commit_duplicate_events_apply_deterministically(spark, tmp_path):
    """ADVICE r10 #4: several events of the same type for one key
    within ONE commit used to tie on (_commit, insert-beats-delete)
    and row_number picked an arbitrary row. The winner is now a pure
    function of the feed's rows (content-hash tiebreaker): applying
    the same duplicate-carrying window to two identical tables — with
    opposite feed row orders — must land the SAME value."""
    window = [
        (1, 111, 5, "insert"),
        (1, 222, 5, "insert"),  # same key, same commit, same type
        (1, 333, 5, "insert"),
    ]
    got = []
    for name, rows in (("a", window), ("b", list(reversed(window)))):
        path = str(tmp_path / name)
        write_table(_df(spark, [(1, 10)]), path, WriteOptions())
        # skew the physical row order too: repartition differently
        ev = _ev(spark, rows).repartition(3 if name == "a" else 1)
        apply_changes(spark, path, ev, key="k")
        got.append(_state(spark, path)[1])
    assert got[0] == got[1], f"nondeterministic winner: {got}"


def test_apply_changes_holds_lock_for_whole_span(spark, table):
    """ADVICE r10 #2: the materialize→upsert→mask span holds the table
    write lock (non-reentrant — the inner mutations are the unwrapped
    callables), so a concurrent mutation cannot interleave between the
    upsert and the mask write."""
    import threading

    from nimble_spark.sources.table import table_write_lock

    entered = threading.Event()
    release = threading.Event()
    holder_done = threading.Event()

    def _hold():
        with table_write_lock(table):
            entered.set()
            release.wait(timeout=30)
        holder_done.set()

    t = threading.Thread(target=_hold)
    t.start()
    assert entered.wait(timeout=10)
    done = threading.Event()

    def _apply():
        apply_changes(
            spark, table, _ev(spark, [(0, 0, 9, "delete")]), key="k"
        )
        done.set()

    a = threading.Thread(target=_apply)
    a.start()
    # while the foreign lock is held, apply_changes must not have
    # committed its mask
    a.join(timeout=3)
    assert not done.is_set(), "apply_changes mutated without the lock"
    assert 0 in _state(spark, table)  # nothing applied yet
    release.set()
    a.join(timeout=60)
    assert done.is_set()
    assert 0 not in _state(spark, table)
    t.join(timeout=10)
