"""Metadata filesystem seam — the ``velox::ReadFile/WriteFile``
abstraction of this engine (dwio/nimble/velox/VeloxReader.h:91,
writer/VeloxWriter.h:55 take file abstractions, never paths, precisely
so warm-storage backends slot in without touching the reader/writer).

Everything the TABLE METADATA layer does to storage — manifest root
publish, content-addressed page files, trash tombstones, staged-swap
markers, the commit lock — routes through one small interface,
``MetadataFS``, with the POSIX implementation (``LocalFS``) as the
default. Data-plane IO (parquet scan/write) stays with Spark/pyarrow,
which already ride Hadoop filesystems.

Object-store mapping (how each primitive translates off POSIX — the
100 TB deployment story; see USAGE.md "Object stores"):

=====================  ==============================================
Primitive              S3 / GCS / ABFS translation
=====================  ==============================================
write_atomic           single PUT (objects are already atomic —
                       readers never see a partial object); the
                       tmp+fsync+rename dance is POSIX-only.
                       For the MANIFEST ROOT, a plain PUT is
                       last-writer-wins: pair it with the commit lock
                       (below) exactly as the POSIX impl pairs rename
                       with the lockfile, or use a conditional PUT
                       (If-Match on the prior ETag / x-goog-if-
                       generation-match) for a lock-free CAS commit.
page files             plain PUTs — content-addressed and immutable,
                       so overwrites are byte-identical idempotent
                       re-puts; zero-GET reuse (SCALE.md) carries.
move (trash/tombstone) server-side copy + delete. Not atomic, but the
                       tombstone protocol never requires atomicity:
                       files move to trash only AFTER the manifest
                       publish stops referencing them, so a crash
                       between copy and delete leaves harmless
                       double-located debris for vacuum.
move (staged swap)     object stores have no directory rename: the
                       staged-swap rewrite instead publishes a new
                       manifest root whose entries point at the
                       staging prefix (the manifest is the table —
                       directory shape is advisory), and vacuum
                       reclaims the old prefix.
commit_lock            O_EXCL has no object-store equivalent; use a
                       conditional-create of the lock object
                       (If-None-Match: *), a DynamoDB/etcd lease (the
                       S3A/Delta-on-S3 pattern), or drop the lock
                       entirely in favor of conditional-PUT CAS on
                       the manifest root. mtime heartbeats become
                       lease renewals.
version/mtime          ETag/generation + Last-Modified from HEAD.
list_dir/walk          LIST by prefix.
=====================  ==============================================

``set_fs`` swaps the active implementation process-wide;
``tests/test_fs_seam.py`` proves every metadata path routes through it
(a counting FS sees every manifest/page/lock/trash operation, and the
full lifecycle stays green on a wrapped FS).
"""

from __future__ import annotations

import os
import shutil
import threading
import time
from abc import ABC, abstractmethod


class MetadataFS(ABC):
    """The metadata-layer storage contract. Paths are plain strings
    (POSIX paths locally; keys/URIs on an object store). Every method
    maps to one storage primitive — no compound semantics — so an
    implementation is a thin client, not a protocol."""

    # ---- blobs -------------------------------------------------------
    @abstractmethod
    def read_bytes(self, path: str) -> bytes:
        """Read a whole object. Raises FileNotFoundError when absent."""

    @abstractmethod
    def write_atomic(self, path: str, data: bytes) -> None:
        """Durably publish an object: readers see the old content or
        the new, never a prefix. POSIX: tmp + fsync + rename. Object
        store: a single PUT (already atomic at object granularity)."""

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def version(self, path: str) -> tuple:
        """Cheap change token for cache validation ((mtime_ns, size)
        locally; ETag/generation on an object store). Raises
        FileNotFoundError when absent."""

    @abstractmethod
    def mtime(self, path: str) -> float:
        """Last-modified seconds (age gates: trash retention, page
        sweep, stale locks). Raises OSError when absent."""

    # ---- namespace ---------------------------------------------------
    @abstractmethod
    def list_dir(self, path: str) -> list:
        """Immediate children (names, not paths). Raises OSError when
        absent. Object store: one-level LIST by prefix."""

    @abstractmethod
    def walk(self, path: str):
        """os.walk-shaped recursive iteration. Object store: LIST by
        prefix, grouped into (root, dirs, files) tuples."""

    @abstractmethod
    def makedirs(self, path: str) -> None:
        """Ensure a directory exists (no-op namespace marker on object
        stores)."""

    # ---- mutation ----------------------------------------------------
    @abstractmethod
    def move(self, src: str, dst: str) -> None:
        """Relocate a file or directory tree. POSIX: atomic rename.
        Object store: server-side copy + delete — every caller in the
        metadata layer tolerates the non-atomic window (tombstones
        move only after the manifest stops referencing them; the
        staged swap publishes a new root instead; see module doc)."""

    @abstractmethod
    def delete(self, path: str) -> None:
        """Remove one object. Raises OSError when absent."""

    @abstractmethod
    def delete_tree(self, path: str) -> None:
        """Best-effort recursive removal (never raises)."""

    # True when ``move`` relocates a DIRECTORY atomically (rename(2)).
    # Object stores have no directory rename: implementations set this
    # False and the table layer switches full rewrites to the
    # root-republish path (table._republish_rewrite — per-object moves
    # + atomic manifest publish; no rename anywhere).
    supports_atomic_dir_move: bool = True

    # ---- concurrency -------------------------------------------------
    @abstractmethod
    def commit_lock(self, table_path: str, timeout_s: float = 120.0,
                    stale_s: float = 600.0):
        """Context manager serializing commits to one table. POSIX:
        O_EXCL lockfile + heartbeat + provable-stale break (below).
        Object store: conditional-create lease, or None-equivalent
        when the store's conditional PUT makes the manifest publish
        itself the CAS."""

    # True when ``write_if_version`` is implemented — the conditional
    # compare-and-swap publish (S3 ``PUT If-Match`` / GCS
    # ``if-generation-match``). Root-only manifest mutations (tags,
    # properties) can then commit LOCK-FREE with optimistic retry:
    # concurrent CAS writers never lose each other's updates, which is
    # strictly stronger than the lease lock a plain object store
    # otherwise falls back to. Table contract: all writers of a table
    # must use ONE commit discipline (all lock-based or all CAS for
    # the root-only ops) — the same homogeneity rule as Delta's S3
    # LogStore.
    supports_cas_publish: bool = False

    def write_if_version(self, path: str, data: bytes, expected_version) -> bool:
        """Atomically replace ``path`` with ``data`` iff its current
        ``version(path)`` token equals ``expected_version`` (None =
        create-if-absent). True = swapped, False = lost the race
        (caller re-reads and retries). Only meaningful when
        ``supports_cas_publish`` is True."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support conditional "
            f"(compare-and-swap) publishes"
        )


class PosixCommitLock:
    """Table-level commit lock: serializes writers so concurrent
    appends/rewrites cannot lose each other's commits (two writers
    both reading manifest v0 and publishing last-wins would silently
    drop the loser's files from the log). O_CREAT|O_EXCL lockfile in
    the metadata dir — correct on a local/posix FS, which is where
    this engine's multi-writer tests run; on an object store the same
    protocol rides a conditional-put of the manifest (ETag
    compare-and-swap), which is exactly how Delta commits on S3.
    Locks older than ``stale_s`` are broken (crashed writer)."""

    @staticmethod
    def _proc_start_ticks(pid: int) -> int | None:
        """The process's kernel start time (clock ticks since boot,
        /proc/<pid>/stat field 22): pid + start time uniquely identify
        a process INCARNATION, so a recycled pid — same number, new
        process — is distinguishable from the original holder. None
        where /proc is unavailable (parse is ')'-anchored: comm may
        contain spaces and parens)."""
        try:
            with open(f"/proc/{pid}/stat", "rb") as fh:
                data = fh.read()
            return int(data.rsplit(b") ", 1)[1].split()[19])
        except (OSError, ValueError, IndexError):
            return None

    @staticmethod
    def _holder_alive(lock_path: str) -> bool:
        """True when the lockfile names a LIVE process incarnation on
        THIS host. Single-host protection against breaking the lock of
        a stalled-but-alive writer: age alone cannot distinguish a
        crash from a long GC pause / SIGSTOP / VM freeze (which stops
        the heartbeat too), so a live local holder is never broken
        regardless of mtime age. Pid RECYCLING is caught by the
        recorded start time (a different incarnation is not the
        holder). A lockfile recording a DIFFERENT hostname is not
        probeable here — return False and let mtime decide; the
        holder's heartbeat keeps a live cross-host lock's mtime
        fresh, so there stale mtime ⇒ crashed (writers must share
        one stale_s config for that arithmetic to hold).

        Limitation: on hosts WITHOUT procfs (macOS/BSD) there is no
        start-time identity, so a crashed writer whose pid the OS
        recycled to a long-lived process keeps the veto alive —
        correctness over availability: delete the lockfile manually
        (it names the pid) rather than risk breaking a live stalled
        holder and publishing concurrently."""
        import socket

        try:
            with open(lock_path, "rb") as fh:
                data = fh.read(4096)  # lockfiles are < 1 KiB; a full
                # read keeps the trailing start-ticks field intact
                # even for maximal (253-char) hostnames — a truncated
                # tick value would wrongly fail the incarnation check
                # and break a live holder's lock
            parts = data.split(b"@")
            pid = int(parts[0])
            host = parts[2].decode() if len(parts) >= 3 else None
        except (OSError, ValueError):
            return False  # unreadable/unparseable → fall back to mtime
        if host is not None and host != socket.gethostname():
            return False  # foreign host's pid: meaningless locally
        try:
            os.kill(pid, 0)
        except PermissionError:
            pass  # the pid EXISTS (another user's) — keep checking
        except OSError:
            return False
        try:
            recorded = int(parts[3]) if len(parts) >= 4 and parts[3] else None
        except ValueError:
            recorded = None
        if recorded is not None:
            actual = PosixCommitLock._proc_start_ticks(pid)
            if actual is not None and actual != recorded:
                return False  # recycled pid: same number, new process
        return True

    def __init__(self, path: str, timeout_s: float = 120.0, stale_s: float = 600.0):
        # SIBLING of the table dir, not inside it: an overwrite write
        # deletes the table directory's contents (including _nimble),
        # which would destroy an in-flight lockfile held there and let
        # a second writer acquire a fresh lock mid-overwrite.
        self.lock_path = f"{path.rstrip('/')}.__commit.lock"
        self.timeout_s = timeout_s
        self.stale_s = stale_s

    # Serializes THIS process's acquisition attempts (open try + stale
    # break) across threads: without it, two threads can interleave
    # inside the rename-verify-restore sequence and re-take the path
    # mid-restore — the intra-process face of the documented
    # stat→rename race. Held only for the brief attempt, never across
    # a critical section. Cross-process, the tombstone protocol below
    # is the (narrowed, not closed) guard.
    _ACQUIRE_MUTEX = threading.Lock()

    def __enter__(self):
        os.makedirs(os.path.dirname(self.lock_path) or ".", exist_ok=True)
        deadline = time.monotonic() + self.timeout_s
        import socket

        while True:
            with PosixCommitLock._ACQUIRE_MUTEX:
                try:
                    fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    start = self._proc_start_ticks(os.getpid())
                    os.write(
                        fd,
                        f"{os.getpid()}@{time.time()}@{socket.gethostname()}"
                        f"@{'' if start is None else start}".encode(),
                    )
                    # remember OUR lockfile's identity: unlock releases
                    # only this exact inode, so a racing breaker that
                    # (wrongly) swapped the file out can never make us
                    # delete a lock that is not ours
                    self._ino = os.fstat(fd).st_ino
                    os.close(fd)
                    # Heartbeat: refresh the lockfile mtime while held,
                    # so a LIVE writer's lock never looks mtime-stale no
                    # matter how long the critical section runs (full-
                    # table rewrites like materialize_columns can exceed
                    # stale_s) — cross-host waiters, who cannot probe our
                    # pid, then see staleness only on a real crash.
                    self._hb_stop = threading.Event()
                    self._hb = threading.Thread(
                        target=self._heartbeat, daemon=True, name="nimble-lock-hb"
                    )
                    self._hb.start()
                    return self
                except FileExistsError:
                    self._maybe_break_stale()
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"could not acquire table write lock {self.lock_path} "
                    f"within {self.timeout_s}s"
                )
            time.sleep(0.05)

    def _heartbeat(self) -> None:
        # stale_s/4 cadence: three missed beats of margin before any
        # waiter can even consider the lock stale. Stops the moment the
        # path no longer holds OUR inode (released / broken / stolen) —
        # never refreshes someone else's lock.
        while not self._hb_stop.wait(self.stale_s / 4):
            try:
                if os.stat(self.lock_path).st_ino != self._ino:
                    return
                os.utime(self.lock_path, None)
            except OSError:
                return

    def _maybe_break_stale(self) -> None:
        """Break the holder's lockfile iff it is PROVABLY stale: old
        mtime AND no live holder pid. The break renames to a unique
        tombstone instead of unlinking (an unlink could delete another
        waiter's FRESH lock — the stat/unlink TOCTOU), then VERIFIES
        by inode that it moved exactly the lock it examined. The
        liveness probe is slow (file read + kill), so the lock is
        re-stat'ed after it — the rename only proceeds when the path
        provably hasn't changed hands — and a rename that still moved
        a replaced lock restores it atomically (link(2) never
        clobbers; on link failure the tombstone is KEPT as the live
        writer's only surviving record, ADVICE r5)."""
        try:
            st = os.stat(self.lock_path)
        except OSError:
            return  # holder released — retry the open
        if time.time() - st.st_mtime <= self.stale_s:
            return
        # Live-HOLDER veto, unconditional on age: a suspended holder
        # (SIGSTOP / VM pause) stops heartbeating too, and breaking it
        # risks two concurrent publishers when it resumes. Recycled
        # pids don't wedge the table — _holder_alive checks the
        # recorded process START TIME, so a different incarnation of
        # the same pid number is not the holder.
        if self._holder_alive(self.lock_path):
            return
        tomb = f"{self.lock_path}.stale.{os.getpid()}.{time.monotonic_ns()}"
        try:
            st2 = os.stat(self.lock_path)
            if (st2.st_ino, st2.st_mtime_ns) != (st.st_ino, st.st_mtime_ns):
                return  # changed hands during the slow liveness probe
            os.rename(self.lock_path, tomb)
            if os.stat(tomb).st_ino == st.st_ino:
                # moved exactly the stale lock we examined → discard
                os.unlink(tomb)
                return
        except OSError:
            return  # raced with another breaker/holder — retry later
        # The rename moved a lock that REPLACED the stale one inside
        # the stat→rename window: put it back.
        try:
            os.link(tomb, self.lock_path)
            os.unlink(tomb)
        except OSError:
            pass  # path re-taken: keep the tombstone (evidence; ages out)

    def __exit__(self, *exc):
        hb = getattr(self, "_hb", None)
        if hb is not None:
            self._hb_stop.set()
            hb.join(timeout=1.0)
        try:
            # release only OUR lockfile (inode match): if a confused
            # breaker swapped the path in the meantime, the newcomer's
            # lock must survive our unlock
            if os.stat(self.lock_path).st_ino == getattr(self, "_ino", None):
                os.unlink(self.lock_path)
        except OSError:
            pass  # lock already broken/stolen — nothing of ours to free
        self._sweep_tombstones()
        return False

    def _sweep_tombstones(self) -> None:
        """Aged tombstone cleanup (the rename-to-tombstone break keeps
        a lost-contention tombstone as the displaced writer's record;
        nothing reads it once the involved writers exit). 2x stale_s
        age gate — by then the displaced holder is either long done or
        its protection was already gone."""
        import glob as _glob

        now = time.time()
        for fp in _glob.glob(self.lock_path + ".stale.*"):
            try:
                if now - os.path.getmtime(fp) > 2 * self.stale_s:
                    os.unlink(fp)
            except OSError:
                continue  # raced with another sweeper


class LocalFS(MetadataFS):
    """POSIX implementation — the default, and the reference semantics
    every other implementation must preserve (see class docstrings)."""

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def write_atomic(self, path: str, data: bytes) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def version(self, path: str) -> tuple:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)

    def mtime(self, path: str) -> float:
        return os.stat(path).st_mtime

    def list_dir(self, path: str) -> list:
        return os.listdir(path)

    def walk(self, path: str):
        return os.walk(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def move(self, src: str, dst: str) -> None:
        os.rename(src, dst)

    def delete(self, path: str) -> None:
        os.unlink(path)

    def delete_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def commit_lock(self, table_path: str, timeout_s: float = 120.0,
                    stale_s: float = 600.0) -> PosixCommitLock:
        return PosixCommitLock(table_path, timeout_s=timeout_s, stale_s=stale_s)

    # POSIX CAS: compare + replace under a short flock(2) on a sidecar
    # — the local model of the store's server-side atomic conditional
    # PUT. The sidecar serializes only CAS writers with each other
    # (cross-process via the kernel lock table); plain write_atomic
    # writers are outside it, hence the one-discipline-per-table rule.
    supports_cas_publish = True

    def write_if_version(self, path: str, data: bytes, expected_version) -> bool:
        import fcntl

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(f"{path}.__cas.lock", "a+b") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                try:
                    cur = self.version(path)
                except FileNotFoundError:
                    cur = None
                if cur != expected_version:
                    return False
                self.write_atomic(path, data)
                return True
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)


_FS: MetadataFS = LocalFS()


def get_fs() -> MetadataFS:
    """The process-wide active metadata filesystem."""
    return _FS


def set_fs(fs: MetadataFS) -> MetadataFS:
    """Swap the active metadata FS; returns the previous one (callers
    restore it — the seam is process-global, like a Hadoop FS conf)."""
    global _FS
    prev = _FS
    _FS = fs
    return prev


class ObjectStoreSimFS(LocalFS):
    """Reference SIMULATION of object-store semantics over local disk —
    the executable form of the mapping table above, used by the test
    suite to prove no metadata protocol depends on rename(2):

    - ``move`` is server-side copy + delete (S3 has no rename). The
      non-atomic window is tolerated by protocol everywhere move is
      used: tombstones relocate only AFTER the published manifest stops
      referencing them, and the staged swap is bracketed by a marker
      that repairs the crash window forward.
    - everything else inherits LocalFS: ``write_atomic`` models the
      single PUT (atomic at object granularity either way), and the
      O_EXCL lock models a conditional-create (``If-None-Match: *``)
      — the same primitive, just spelled differently per store.

    With ``supports_atomic_dir_move = False`` the table layer routes
    full rewrites (compact_deletes, full recluster, materialize)
    through the root-republish path — per-object moves + atomic
    manifest publish — so NO code path depends on a directory rename
    at all (tests/test_fs_seam.py runs the whole lifecycle this way).

    A real S3/GCS client additionally swaps paths for keys and stat
    for HEAD; nothing in the metadata layer observes that difference.
    """

    supports_atomic_dir_move = False

    def move(self, src: str, dst: str) -> None:
        if os.path.isdir(src):
            shutil.copytree(src, dst)
            shutil.rmtree(src)
        else:
            shutil.copy2(src, dst)
            os.unlink(src)
