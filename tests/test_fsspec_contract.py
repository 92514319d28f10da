"""Per-method contract suite for the fsspec adapter (FsspecFS), run
over BOTH contract doubles:

  * ``_MiniLocalFsspec`` — local-disk backed (POSIX under the hood);
  * ``_MiniMemoryFsspec`` — pure key→bytes store with object-store
    semantics: no real directories, prefix LISTs, copy+rm moves.

The memory double exists to break the self-referentiality the r8
verdict flagged: a POSIX-backed double can mask POSIX assumptions in
the adapter (real dirents, rename, inherited mtimes). Every MetadataFS
method the table layer calls is exercised here against key-value
semantics, so an adapter bug like "ls assumed a real directory
exists" fails in CI rather than on a real store.

Also pins the commit-lock ACQUISITION MODE ladder (VERDICT r8 #1):
conditional PUT when the backend has ``put_if_absent`` (atomic
win/lose — the multi-writer-safe path), exclusive-create next, and
the create-then-verify lease ONLY when the backend offers neither.
"""

from __future__ import annotations

import threading
import time

import pytest

from nimble_spark.sources.fs_fsspec import (
    FsspecFS,
    _MiniLocalFsspec,
    _MiniMemoryFsspec,
)


@pytest.fixture(params=["local_double", "memory_double"])
def fsx(request, tmp_path):
    """(FsspecFS, base_path) over each contract double. Paths for the
    memory double are plain keys — nothing on disk backs them."""
    if request.param == "local_double":
        return FsspecFS(_MiniLocalFsspec()), str(tmp_path / "base")
    return FsspecFS(_MiniMemoryFsspec()), "bucket/prefix/base"


def test_blob_roundtrip_version_mtime(fsx):
    fs, base = fsx
    fs.makedirs(base)
    p = f"{base}/manifest.json"
    assert not fs.exists(p)
    with pytest.raises(FileNotFoundError):
        fs.read_bytes(p)
    fs.write_atomic(p, b"v1")
    assert fs.exists(p)
    assert fs.read_bytes(p) == b"v1"
    v1 = fs.version(p)
    assert abs(time.time() - fs.mtime(p)) < 60
    fs.write_atomic(p, b"v2-longer")
    assert fs.read_bytes(p) == b"v2-longer"
    assert fs.version(p) != v1  # change token MUST move on rewrite


def test_namespace_list_and_walk(fsx):
    fs, base = fsx
    fs.makedirs(f"{base}/pages")
    fs.write_atomic(f"{base}/pages/p0.bin", b"a")
    fs.write_atomic(f"{base}/pages/p1.bin", b"b")
    fs.write_atomic(f"{base}/pages/sub/p2.bin", b"c")
    fs.write_atomic(f"{base}/root.json", b"r")
    # list_dir returns NAMES (seam contract), not full paths
    names = sorted(fs.list_dir(f"{base}/pages"))
    assert names == ["p0.bin", "p1.bin", "sub"]
    # walk is os.walk-shaped and reaches every file
    seen = []
    for root, dirs, files in fs.walk(base):
        assert isinstance(dirs, list) and isinstance(files, list)
        seen.extend(f"{root}/{f}" for f in files)
    assert sorted(p.rsplit("/", 1)[1] for p in seen) == [
        "p0.bin", "p1.bin", "p2.bin", "root.json",
    ]


def test_move_file_and_tree(fsx):
    fs, base = fsx
    fs.makedirs(f"{base}/live")
    fs.write_atomic(f"{base}/live/a.bin", b"a")
    fs.write_atomic(f"{base}/live/deep/b.bin", b"b")
    # file move
    fs.move(f"{base}/live/a.bin", f"{base}/trash/a.bin")
    assert not fs.exists(f"{base}/live/a.bin")
    assert fs.read_bytes(f"{base}/trash/a.bin") == b"a"
    # tree move (copy+rm on stores — adapter passes recursive)
    fs.move(f"{base}/live/deep", f"{base}/trash/deep")
    assert fs.read_bytes(f"{base}/trash/deep/b.bin") == b"b"
    assert not fs.exists(f"{base}/live/deep/b.bin")


def test_delete_and_delete_tree(fsx):
    fs, base = fsx
    fs.write_atomic(f"{base}/x.bin", b"x")
    fs.delete(f"{base}/x.bin")
    assert not fs.exists(f"{base}/x.bin")
    with pytest.raises(OSError):
        fs.delete(f"{base}/x.bin")
    fs.write_atomic(f"{base}/t/a", b"1")
    fs.write_atomic(f"{base}/t/d/b", b"2")
    fs.delete_tree(f"{base}/t")
    assert not fs.exists(f"{base}/t/a")
    fs.delete_tree(f"{base}/t")  # absent: best-effort, never raises


# ---------------------------------------------------------------- locks


class _NoConditional(_MiniLocalFsspec):
    """Backend with exclusive-create but NO conditional PUT."""

    put_if_absent = None  # not callable → conditional path skipped


class _LeaseOnly(_MiniLocalFsspec):
    """Backend with NEITHER atomic primitive — the plain-S3 shape that
    must select the (documented-race) lease fallback."""

    put_if_absent = None

    def open(self, path, mode="rb"):
        if "x" in mode:
            raise ValueError("exclusive create not supported")
        return super().open(path, mode)


def test_lock_mode_ladder(tmp_path):
    """The lock acquires through the STRONGEST primitive the backend
    offers, and the lease is selected only when nothing better exists
    (VERDICT r8 #1 'done =' condition)."""
    t = str(tmp_path / "t")
    for backend, want in [
        (_MiniLocalFsspec(), "conditional"),
        (_MiniMemoryFsspec(), "conditional"),
        (_NoConditional(), "exclusive"),
        (_LeaseOnly(), "lease"),
    ]:
        lock = FsspecFS(backend).commit_lock(f"{t}_{want}", timeout_s=5.0)
        with lock:
            assert lock.mode == want, (type(backend).__name__, lock.mode)


def test_conditional_lock_one_winner_threads():
    """One-winner drill on the CONDITIONAL path over the memory
    double: 8 threads × 20 read-modify-write cycles on a shared
    counter lose no update. The conditional PUT is the only mutual
    exclusion in play — no O_EXCL file underneath."""
    backend = _MiniMemoryFsspec()
    fs = FsspecFS(backend)
    counter = {"n": 0}

    def hammer():
        for _ in range(20):
            lock = fs.commit_lock("bucket/tbl", timeout_s=60.0)
            with lock:
                assert lock.mode == "conditional"
                n = counter["n"]
                time.sleep(0)  # widen the unprotected window
                counter["n"] = n + 1

    threads = [threading.Thread(target=hammer) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert counter["n"] == 8 * 20


def test_conditional_lock_stale_break_memory():
    """A crashed writer's lock KEY (old mtime, memory backend) is
    broken once stale_s elapses — staleness handling is mode-agnostic."""
    backend = _MiniMemoryFsspec()
    fs = FsspecFS(backend)
    lock_key = "bucket/tbl.__commit.lock"
    backend.pipe_file(lock_key, b"crashed@writer")
    backend._mtimes[lock_key] = time.time() - 10_000  # age the key
    with fs.commit_lock("bucket/tbl", timeout_s=5.0, stale_s=600.0) as lk:
        assert lk.mode == "conditional"
    assert not backend.exists(lock_key)  # released, not stranded


def test_conditional_lock_contention_timeout_and_reacquire():
    backend = _MiniMemoryFsspec()
    fs = FsspecFS(backend)
    with fs.commit_lock("b/t", timeout_s=5.0):
        with pytest.raises(TimeoutError):
            with fs.commit_lock("b/t", timeout_s=0.3):
                pass
    with fs.commit_lock("b/t", timeout_s=1.0):
        pass
