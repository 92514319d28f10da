"""Cross-PROCESS drills for table_write_lock.

The thread-based stress tests (test_concurrency_stress.py) share one
interpreter; the lock's real job is serializing SEPARATE writer
processes on shared storage (driver A and driver B both committing to
the same table path). These drills run real child processes — no Spark
needed, the lock is pure file ops — and check the two properties every
commit depends on:

  * mutual exclusion: N processes × M read-modify-write cycles on a
    shared counter lose no update (a lost update here IS the lost
    commit the lock exists to prevent);
  * stale-lock break is race-free: many waiters confronted with the
    same crashed-writer lockfile elect exactly one breaker (the atomic
    rename tombstone), and still serialize correctly afterwards.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os


def _hammer(path: str, counter: str, cycles: int) -> None:
    import sys

    sys.path.insert(0, "/root/repo")
    from nimble_spark.sources.table import table_write_lock

    for _ in range(cycles):
        with table_write_lock(path):
            with open(counter) as f:
                n = json.load(f)["n"]
            # non-atomic read-modify-write: only the lock protects it
            with open(counter + ".tmp", "w") as f:
                json.dump({"n": n + 1}, f)
            os.replace(counter + ".tmp", counter)


def test_lock_mutual_exclusion_across_processes(tmpdir):
    path = f"{tmpdir}/mp_lock"
    os.makedirs(path, exist_ok=True)
    counter = os.path.join(path, "counter.json")
    with open(counter, "w") as f:
        json.dump({"n": 0}, f)

    nproc, cycles = 8, 25
    ctx = mp.get_context("spawn")  # fresh interpreters, like real drivers
    procs = [
        ctx.Process(target=_hammer, args=(path, counter, cycles))
        for _ in range(nproc)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=300)
        assert p.exitcode == 0
    with open(counter) as f:
        assert json.load(f)["n"] == nproc * cycles  # zero lost updates


def _make_flavor_lock(flavor: str, path: str):
    """Build a commit lock of the requested flavor — the VERDICT r8 #1
    matrix: {LocalFS, ObjectStoreSimFS, FsspecFS-conditional,
    FsspecFS-lease}. Runs in CHILD processes, so everything is built
    from the flavor string (no pickled FS objects)."""
    from nimble_spark.sources.fs import LocalFS, ObjectStoreSimFS
    from nimble_spark.sources.fs_fsspec import FsspecFS, _MiniLocalFsspec

    if flavor == "local":
        return LocalFS().commit_lock(path)
    if flavor == "objectstore_sim":
        return ObjectStoreSimFS().commit_lock(path)
    if flavor == "fsspec_conditional":
        return FsspecFS(_MiniLocalFsspec()).commit_lock(path)
    if flavor == "fsspec_lease":
        return FsspecFS(_LeaseOnlyFsspec()).commit_lock(path)
    raise ValueError(flavor)


class _LeaseOnlyFsspec:
    """Plain-S3-shaped backend: no conditional PUT, no exclusive
    create — forces the create-then-verify lease path. Module-level so
    spawn children can unpickle the hammer that references it."""

    def __init__(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from nimble_spark.sources.fs_fsspec import _MiniLocalFsspec

        self._inner = _MiniLocalFsspec()

    def open(self, path, mode="rb"):
        if "x" in mode:
            raise ValueError("exclusive create not supported")
        return self._inner.open(path, mode)

    def __getattr__(self, name):
        if name == "put_if_absent":
            raise AttributeError(name)  # no conditional PUT either
        return getattr(self._inner, name)


def _hammer_flavor(flavor: str, path: str, counter: str, cycles: int,
                   expect_mode: str) -> None:
    import sys

    sys.path.insert(0, "/root/repo")
    for _ in range(cycles):
        lock = _make_flavor_lock(flavor, path)
        with lock:
            mode = getattr(lock, "mode", None)
            if expect_mode and mode is not None:
                assert mode == expect_mode, (flavor, mode)
            with open(counter) as f:
                n = json.load(f)["n"]
            with open(counter + ".tmp", "w") as f:
                json.dump({"n": n + 1}, f)
            os.replace(counter + ".tmp", counter)


def test_one_winner_across_processes_all_lock_flavors(tmpdir):
    """Mutual-exclusion drill over every commit-lock flavor: N child
    processes × M read-modify-write cycles lose no update. For the
    fsspec CONDITIONAL flavor this proves the new put_if_absent path
    end-to-end across real processes (the r8 verdict's top action);
    the LEASE flavor exercises the documented-fallback path at low
    contention (its race window is why conditional is preferred, so
    its drill stays small)."""
    import pytest  # noqa: F401

    flavors = [
        ("local", 6, 20, ""),
        ("objectstore_sim", 6, 20, ""),
        ("fsspec_conditional", 6, 20, "conditional"),
        ("fsspec_lease", 3, 6, "lease"),
    ]
    ctx = mp.get_context("spawn")
    for flavor, nproc, cycles, expect_mode in flavors:
        path = f"{tmpdir}/flavor_{flavor}"
        os.makedirs(path, exist_ok=True)
        counter = os.path.join(path, "counter.json")
        with open(counter, "w") as f:
            json.dump({"n": 0}, f)
        procs = [
            ctx.Process(
                target=_hammer_flavor,
                args=(flavor, path, counter, cycles, expect_mode),
            )
            for _ in range(nproc)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join(timeout=300)
            assert p.exitcode == 0, flavor
        with open(counter) as f:
            assert json.load(f)["n"] == nproc * cycles, flavor


def _break_and_hammer(path: str, counter: str, barrier_dir: str) -> None:
    import sys
    import time

    sys.path.insert(0, "/root/repo")
    from nimble_spark.sources.table import table_write_lock

    # crude start barrier: wait until every sibling has registered, so
    # all waiters confront the stale lockfile TOGETHER
    open(os.path.join(barrier_dir, f"ready-{os.getpid()}"), "w").close()
    while len(os.listdir(barrier_dir)) < 6:
        time.sleep(0.01)
    with table_write_lock(path, stale_s=0.5):
        with open(counter) as f:
            n = json.load(f)["n"]
        with open(counter + ".tmp", "w") as f:
            json.dump({"n": n + 1}, f)
        os.replace(counter + ".tmp", counter)


def test_stale_lock_break_elects_one_winner_across_processes(tmpdir):
    """A crashed writer's lockfile (old mtime) faces 6 fresh waiter
    processes at once. The atomic rename-to-tombstone break must let
    exactly one in at a time — the counter ends at exactly 6."""
    import time

    path = f"{tmpdir}/mp_stale"
    os.makedirs(os.path.join(path, "_nimble"), exist_ok=True)
    counter = os.path.join(path, "counter.json")
    with open(counter, "w") as f:
        json.dump({"n": 0}, f)

    # plant the crashed writer's stale lock
    from nimble_spark.sources.table import table_write_lock

    probe = table_write_lock(path)
    with open(probe.lock_path, "w") as f:
        f.write("crashed-writer")
    old = time.time() - 3600
    os.utime(probe.lock_path, (old, old))

    barrier_dir = f"{tmpdir}/mp_stale_barrier"
    os.makedirs(barrier_dir, exist_ok=True)
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_break_and_hammer, args=(path, counter, barrier_dir))
        for _ in range(6)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=300)
        assert p.exitcode == 0
    with open(counter) as f:
        assert json.load(f)["n"] == 6
    assert not os.path.exists(probe.lock_path)  # released, not stranded


def test_live_holder_never_broken_despite_old_mtime(tmpdir):
    """A stalled-but-ALIVE writer's lock (same host, same process
    incarnation) is never broken regardless of mtime age: a suspended
    holder (SIGSTOP / VM pause) stops heartbeating too, and breaking
    it would risk two concurrent publishers when it resumes."""
    import time

    import pytest

    from nimble_spark.sources.table import table_write_lock

    path = f"{tmpdir}/live_holder"
    os.makedirs(path, exist_ok=True)
    holder = table_write_lock(path)
    holder.__enter__()
    try:
        old = time.time() - 3600
        os.utime(holder.lock_path, (old, old))
        waiter = table_write_lock(path, timeout_s=1.5, stale_s=0.5)
        t0 = time.monotonic()
        with pytest.raises(TimeoutError):
            waiter.__enter__()
        assert time.monotonic() - t0 >= 1.0  # waited, didn't break
        assert os.path.exists(holder.lock_path)
    finally:
        holder.__exit__()


def test_recycled_pid_lock_broken_by_starttime_mismatch(tmpdir):
    """A crashed holder whose pid the OS recycled to an unrelated
    live process must NOT wedge the table: the lockfile records the
    holder's process START TIME, and a same-pid process with a
    different start time is a different incarnation — broken once
    mtime-stale."""
    import socket
    import time

    from nimble_spark.sources.fs import PosixCommitLock
    from nimble_spark.sources.table import table_write_lock

    path = f"{tmpdir}/recycled_pid"
    os.makedirs(path, exist_ok=True)
    probe = table_write_lock(path)
    ours = PosixCommitLock._proc_start_ticks(os.getpid())
    assert ours is not None  # linux test host
    # "recycled": a genuinely live pid (ours) recorded with the START
    # TIME of a different incarnation
    with open(probe.lock_path, "w") as f:
        f.write(f"{os.getpid()}@0@{socket.gethostname()}@{ours + 777}")
    old = time.time() - 3600
    os.utime(probe.lock_path, (old, old))
    with table_write_lock(path, timeout_s=5.0, stale_s=0.5):
        pass  # acquired: the impostor pid did not wedge the table
    assert not os.path.exists(probe.lock_path)


def test_foreign_host_lock_falls_back_to_mtime(tmpdir):
    """A lockfile recording another HOST's pid is not probeable here:
    liveness must fall back to mtime (the foreign pid number being
    coincidentally alive locally must not veto the break)."""
    import time

    from nimble_spark.sources.table import table_write_lock

    path = f"{tmpdir}/foreign_host"
    os.makedirs(path, exist_ok=True)
    probe = table_write_lock(path)
    with open(probe.lock_path, "w") as f:
        f.write(f"{os.getpid()}@0@some-other-host")  # live pid, wrong host
    old = time.time() - 10
    os.utime(probe.lock_path, (old, old))
    with table_write_lock(path, timeout_s=5.0, stale_s=0.5):
        pass  # mtime-stale + unprobeable host → broken
    assert not os.path.exists(probe.lock_path)


def test_heartbeat_keeps_held_lock_fresh_then_stops(tmpdir):
    """While held, the lock's mtime refreshes at stale_s/4 — a live
    writer inside a LONG critical section (materialize_columns-scale
    rewrite) never looks stale to cross-host waiters. The heartbeat
    thread dies with the release."""
    import time

    from nimble_spark.sources.table import table_write_lock

    path = f"{tmpdir}/heartbeat"
    os.makedirs(path, exist_ok=True)
    lock = table_write_lock(path, stale_s=2.0)  # beat every 0.5 s
    with lock:
        first = os.path.getmtime(lock.lock_path)
        time.sleep(1.3)
        assert os.path.getmtime(lock.lock_path) > first  # refreshed
        assert lock._hb.is_alive()
    lock._hb.join(timeout=2.0)
    assert not lock._hb.is_alive()


def test_aged_tombstones_swept_on_release(tmpdir):
    """Tombstones from lost-contention stale breaks are litter once
    the involved writers exit: any lock release sweeps those older
    than 2x stale_s (and leaves fresh ones alone)."""
    import time

    from nimble_spark.sources.table import table_write_lock

    path = f"{tmpdir}/tomb_sweep"
    os.makedirs(path, exist_ok=True)
    probe = table_write_lock(path, stale_s=1.0)
    aged = f"{probe.lock_path}.stale.999.111"
    fresh = f"{probe.lock_path}.stale.999.222"
    for fp in (aged, fresh):
        with open(fp, "w") as f:
            f.write("tomb")
    old = time.time() - 3600
    os.utime(aged, (old, old))
    with table_write_lock(path, stale_s=1.0):
        pass
    assert not os.path.exists(aged)
    assert os.path.exists(fresh)  # in-window evidence survives
    os.unlink(fresh)


def test_dead_holder_still_broken(tmpdir):
    """A crashed writer's lock (dead pid, old mtime) is still broken."""
    import subprocess
    import time

    from nimble_spark.sources.table import table_write_lock

    path = f"{tmpdir}/dead_holder"
    os.makedirs(path, exist_ok=True)
    probe = table_write_lock(path)
    # a real pid that has exited
    p = subprocess.Popen(["true"])
    p.wait()
    with open(probe.lock_path, "w") as f:
        f.write(f"{p.pid}@{time.time()}")
    old = time.time() - 3600
    os.utime(probe.lock_path, (old, old))
    with table_write_lock(path, timeout_s=5.0, stale_s=0.5):
        pass  # acquired by breaking the dead holder's lock
    assert not os.path.exists(probe.lock_path)
