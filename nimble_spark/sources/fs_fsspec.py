"""``FsspecFS`` — the MetadataFS seam over any fsspec
``AbstractFileSystem`` (the third-party FS API the Python data
ecosystem standardizes on: s3fs, gcsfs, adlfs, local, memory, …).

This is the production half of the object-store story whose protocol
half is proven by ``ObjectStoreSimFS`` (fs.py): the table layer's
metadata protocol needs only the primitives below, and every one maps
to a documented fsspec method, so pointing the engine at S3/GCS/ABFS
is ``set_fs(FsspecFS(fsspec.filesystem("s3", ...)))`` — no table-layer
change. The reference draws the identical seam with
``velox::ReadFile/WriteFile`` (dwio/nimble/velox/VeloxReader.h:91,
VeloxWriter.h:55): reader/writer take file abstractions, never paths.

fsspec method surface the adapter relies on (all public/documented):
``cat_file, pipe_file, exists, info, checksum, modified, ls, walk,
makedirs, isdir, mv, rm_file, rm``. ``_MiniLocalFsspec`` below
implements exactly that surface over local disk so the adapter is
exercised in CI even where the fsspec package is absent (this
container), and doubles as the written-down contract; when fsspec IS
installed, the same seam tests also run against the real
``fsspec.filesystem("file")`` (tests/test_fs_seam.py).

Semantics notes (the honest parts):

- ``write_atomic`` is ``pipe_file`` — the single-PUT model. On object
  stores a PUT is atomic at object granularity, which is the
  guarantee the manifest protocol needs. On fsspec's LOCAL backend a
  pipe_file is open+write (not rename-atomic); use the native
  ``LocalFS`` for POSIX deployments — FsspecFS targets stores.
- ``supports_atomic_dir_move = False`` unconditionally: no object
  store renames directories, so the table layer routes full rewrites
  through the root-republish path (per-object moves + atomic manifest
  publish), the same discipline ObjectStoreSimFS enforces.
- ``commit_lock`` tries exclusive-create (``open(mode="xb")`` — real
  O_EXCL on backends that support it). Where the backend cannot
  exclusive-create (plain S3), it falls back to a create-then-verify
  lease with a DOCUMENTED race window: two writers racing inside the
  verify window can both believe they hold the lock — the same
  limitation as Delta-on-S3 without a coordination service. Stale
  locks (mtime older than ``stale_s``) are broken. Deployments that
  need true multi-writer safety subclass with the store's conditional
  PUT (If-None-Match: * / x-goog-if-generation-match) or an external
  lease (the S3A/DynamoDB pattern) — see fs.py's mapping table.
"""

from __future__ import annotations

import os
import posixpath
import shutil
import time
import uuid
from datetime import datetime, timezone

from nimble_spark.sources.fs import MetadataFS


class FsspecFS(MetadataFS):
    """MetadataFS over an fsspec AbstractFileSystem instance."""

    supports_atomic_dir_move = False  # no object store renames dirs

    def __init__(self, fs):
        self._fs = fs

    # ---- blobs -------------------------------------------------------
    def read_bytes(self, path: str) -> bytes:
        return self._fs.cat_file(path)

    def write_atomic(self, path: str, data: bytes) -> None:
        # the single-PUT model: atomic at object granularity on stores
        self._fs.pipe_file(path, data)

    def exists(self, path: str) -> bool:
        return self._fs.exists(path)

    def version(self, path: str) -> tuple:
        # checksum() is fsspec's cheap change token (ETag/generation on
        # stores, info-derived elsewhere); pair with size like LocalFS
        info = self._fs.info(path)
        return (self._fs.checksum(path), info.get("size"))

    def mtime(self, path: str) -> float:
        m = self._fs.modified(path)
        if isinstance(m, datetime):
            if m.tzinfo is None:
                m = m.replace(tzinfo=timezone.utc)
            return m.timestamp()
        return float(m)

    # ---- namespace ---------------------------------------------------
    def list_dir(self, path: str) -> list:
        # fsspec ls returns full paths; the seam contract is names
        return [posixpath.basename(p.rstrip("/")) for p in self._fs.ls(path, detail=False)]

    def walk(self, path: str):
        return self._fs.walk(path)

    def makedirs(self, path: str) -> None:
        self._fs.makedirs(path, exist_ok=True)

    # ---- mutation ----------------------------------------------------
    def move(self, src: str, dst: str) -> None:
        # fsspec mv = copy + rm on stores — exactly the non-atomic
        # window every metadata caller already tolerates (fs.py doc)
        self._fs.mv(src, dst, recursive=self._fs.isdir(src))

    def delete(self, path: str) -> None:
        self._fs.rm_file(path)

    def delete_tree(self, path: str) -> None:
        try:
            if self._fs.exists(path):
                self._fs.rm(path, recursive=True)
        except OSError:
            pass  # best-effort by contract (LocalFS: rmtree
            # ignore_errors=True); a racing vacuum/retry reclaims later

    # ---- concurrency -------------------------------------------------
    def commit_lock(self, table_path: str, timeout_s: float = 120.0,
                    stale_s: float = 600.0):
        return FsspecCommitLock(
            self._fs, f"{table_path.rstrip('/')}.__commit.lock",
            timeout_s=timeout_s, stale_s=stale_s,
        )


class FsspecCommitLock:
    """Commit lock over an fsspec backend.

    Preferred path: ``open(mode="xb")`` — true exclusive-create where
    the backend supports it (local files → O_EXCL; stores with
    conditional create). Fallback: create-then-verify lease — write a
    unique token, read it back after a settle delay, hold only if the
    token survived. The fallback has a documented race window (see
    module doc); production multi-writer on plain S3 should subclass
    with a conditional PUT or external lease."""

    _SETTLE_S = 0.05

    def __init__(self, fs, lock_path: str, timeout_s: float, stale_s: float):
        self._fs = fs
        self.lock_path = lock_path
        self.timeout_s = timeout_s
        self.stale_s = stale_s
        self._token = f"{os.getpid()}@{uuid.uuid4().hex}".encode()
        self._held = False

    def _try_exclusive(self) -> bool | None:
        """True acquired, False contended, None = mode unsupported."""
        try:
            with self._fs.open(self.lock_path, "xb") as fh:
                fh.write(self._token)
            return True
        except FileExistsError:
            return False
        except (ValueError, NotImplementedError):
            return None  # backend has no exclusive-create

    def _try_lease(self) -> bool:
        if self._fs.exists(self.lock_path):
            return False
        self._fs.pipe_file(self.lock_path, self._token)
        time.sleep(self._SETTLE_S)  # let a racing writer's PUT land
        try:
            return self._fs.cat_file(self.lock_path) == self._token
        except FileNotFoundError:
            return False  # broken as stale by a third party mid-verify

    def _break_if_stale(self) -> None:
        try:
            fs_mtime = self._fs.modified(self.lock_path)
            age = time.time() - (
                fs_mtime.replace(tzinfo=fs_mtime.tzinfo or timezone.utc).timestamp()
                if isinstance(fs_mtime, datetime) else float(fs_mtime)
            )
            if age > self.stale_s:
                self._fs.rm_file(self.lock_path)
        except FileNotFoundError:
            return  # already released/broken — retry the acquire

    def __enter__(self):
        deadline = time.monotonic() + self.timeout_s
        while True:
            got = self._try_exclusive()
            if got is None:
                got = self._try_lease()
            if got:
                self._held = True
                return self
            self._break_if_stale()
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"could not acquire commit lock {self.lock_path} "
                    f"within {self.timeout_s}s (holder alive or stale_s "
                    f"not yet elapsed)"
                )
            time.sleep(0.1)

    def __exit__(self, *exc):
        if not self._held:
            return False
        try:
            # only release our OWN lock: a stale-break may have handed
            # the path to another writer while we were paused
            if self._fs.cat_file(self.lock_path) == self._token:
                self._fs.rm_file(self.lock_path)
        except FileNotFoundError:
            return False  # broken as stale — nothing of ours to free
        return False


class _MiniLocalFsspec:
    """The fsspec AbstractFileSystem method surface FsspecFS relies on,
    implemented over local disk — both the CI stand-in where the
    fsspec package is not installed and the written-down contract of
    what the adapter calls. Method names, signatures and return shapes
    mirror fsspec's documented behavior exactly (ls returns full
    paths; walk yields (root, dirs, files); info returns a dict with
    'size'; checksum is a cheap change token; modified returns a
    datetime; rm_file/rm raise FileNotFoundError when absent)."""

    def cat_file(self, path):
        with open(path, "rb") as fh:
            return fh.read()

    def pipe_file(self, path, data):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(data)

    def exists(self, path):
        return os.path.exists(path)

    def info(self, path):
        st = os.stat(path)
        return {
            "name": path,
            "size": st.st_size,
            "type": "directory" if os.path.isdir(path) else "file",
            "mtime": st.st_mtime,
        }

    def checksum(self, path):
        st = os.stat(path)
        return hash((st.st_mtime_ns, st.st_size))

    def modified(self, path):
        return datetime.fromtimestamp(os.stat(path).st_mtime, tz=timezone.utc)

    def ls(self, path, detail=False):
        names = [os.path.join(path, n) for n in os.listdir(path)]
        if detail:
            return [self.info(p) for p in names]
        return names

    def walk(self, path):
        return os.walk(path)

    def makedirs(self, path, exist_ok=False):
        os.makedirs(path, exist_ok=exist_ok)

    def isdir(self, path):
        return os.path.isdir(path)

    def open(self, path, mode="rb"):
        if "x" in mode:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        return open(path, mode)

    def mv(self, src, dst, recursive=False):
        # like fsspec's generic mv: copy + rm (never rename) — the
        # object-store shape, so the adapter's tolerance is exercised
        if os.path.isdir(src):
            shutil.copytree(src, dst)
            shutil.rmtree(src)
        else:
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            shutil.copy2(src, dst)
            os.unlink(src)

    def rm_file(self, path):
        os.unlink(path)

    def rm(self, path, recursive=False):
        if os.path.isdir(path):
            if not recursive:
                raise IsADirectoryError(path)
            shutil.rmtree(path)
        else:
            os.unlink(path)


def fsspec_local_fs():
    """An FsspecFS over the best available local fsspec backend: the
    real ``fsspec.filesystem("file")`` when the package is installed,
    else the in-repo ``_MiniLocalFsspec`` contract double."""
    try:
        import fsspec  # gated: not in this container's baked set

        return FsspecFS(fsspec.filesystem("file"))
    except ImportError:
        return FsspecFS(_MiniLocalFsspec())
