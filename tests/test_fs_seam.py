"""The metadata-FS seam (sources/fs.py): every manifest / page /
trash / lock operation routes through the active MetadataFS, and the
whole table lifecycle stays green on a swapped-in implementation.

This is the ``velox::ReadFile/WriteFile`` seam of the engine
(VeloxReader.h:91): the POSIX impl is the default; an object-store
impl replaces rename with copy+delete / conditional PUT (fs.py module
doc). The CountingFS below is the proof that nothing in the metadata
layer bypasses the interface."""

import collections

import pytest

from nimble_spark.sources import fs as fsmod
from nimble_spark.sources.fs import LocalFS, get_fs, set_fs


class CountingFS(LocalFS):
    """LocalFS that tallies every call — behaviorally identical."""

    def __init__(self):
        self.calls = collections.Counter()

    def _bump(self, name):
        self.calls[name] += 1

    def read_bytes(self, path):
        self._bump("read_bytes")
        return super().read_bytes(path)

    def write_atomic(self, path, data):
        self._bump("write_atomic")
        return super().write_atomic(path, data)

    def exists(self, path):
        self._bump("exists")
        return super().exists(path)

    def version(self, path):
        self._bump("version")
        return super().version(path)

    def mtime(self, path):
        self._bump("mtime")
        return super().mtime(path)

    def list_dir(self, path):
        self._bump("list_dir")
        return super().list_dir(path)

    def walk(self, path):
        self._bump("walk")
        return super().walk(path)

    def makedirs(self, path):
        self._bump("makedirs")
        return super().makedirs(path)

    def move(self, src, dst):
        self._bump("move")
        return super().move(src, dst)

    def delete(self, path):
        self._bump("delete")
        return super().delete(path)

    def delete_tree(self, path):
        self._bump("delete_tree")
        return super().delete_tree(path)

    def commit_lock(self, table_path, timeout_s=120.0, stale_s=600.0):
        self._bump("commit_lock")
        return super().commit_lock(table_path, timeout_s=timeout_s, stale_s=stale_s)


@pytest.fixture()
def counting_fs():
    fs = CountingFS()
    prev = set_fs(fs)
    try:
        yield fs
    finally:
        set_fs(prev)


def test_default_is_local_fs():
    assert isinstance(get_fs(), LocalFS)
    assert fsmod._FS is get_fs()


def test_lifecycle_routes_through_seam(spark, tmp_path, counting_fs):
    """write → append → merge → delete-mask → compact → rollback →
    vacuum, all on the counting FS: results identical to LocalFS, and
    every metadata primitive is exercised through the interface."""
    from nimble_spark.sources.compaction import compact_table, vacuum_table
    from nimble_spark.sources.deletes import delete_rows, read_with_deletes
    from nimble_spark.sources.merge import merge_into
    from nimble_spark.sources.table import (
        WriteOptions,
        read_manifest,
        read_table,
        rollback_table,
        write_table,
    )

    path = str(tmp_path / "t")
    write_table(
        spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
        path,
        WriteOptions(cluster_by=["k"], n_cluster_files=2),
    )
    write_table(
        spark.range(100, 150).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
        path,
        mode="append",
    )
    merge_into(
        spark,
        path,
        spark.range(0, 10).selectExpr("id AS k", "CAST(-1.0 AS DOUBLE) AS v"),
        key="k",
    )
    assert read_table(spark, path).filter("v = -1.0").count() == 10
    delete_rows(spark, path, "k", [140, 141])
    assert read_with_deletes(spark, path).count() == 148
    compact_table(spark, path, target_file_bytes=1 << 30)
    n_commits = len(read_manifest(path)["commits"])
    rollback_table(spark, path, commit=n_commits - 2)  # undo the compact
    removed = vacuum_table(path, min_age_s=0.0)
    assert removed  # the compacted-away originals were reclaimed
    assert read_with_deletes(spark, path).count() == 148

    c = counting_fs.calls
    # the load-bearing primitives all flowed through the seam
    for op in (
        "write_atomic",   # manifest publishes
        "read_bytes",     # manifest reads
        "version",        # cache validation
        "commit_lock",    # every commit serialized through the FS lock
        "move",           # trash tombstones
        "makedirs",
        "walk",           # vacuum sweep
        "delete_tree",    # trash reclaim
        "exists",
    ):
        assert c[op] > 0, f"{op} never routed through the FS seam: {dict(c)}"


def test_sharded_manifest_pages_route_through_seam(spark, tmp_path, counting_fs, monkeypatch):
    """Force the page threshold low: page publish + page loads go
    through write_atomic/read_bytes, and the orphan sweep through
    list_dir/mtime."""
    import nimble_spark.sources.table as tbl
    from nimble_spark.sources.table import WriteOptions, read_manifest, write_table

    monkeypatch.setattr(tbl, "SHARD_FILE_THRESHOLD", 4)
    monkeypatch.setattr(tbl, "MANIFEST_PAGE_SIZE", 2)
    path = str(tmp_path / "sharded")
    write_table(
        spark.range(0, 64).selectExpr("id AS k"),
        path,
        WriteOptions(cluster_by=["k"], n_cluster_files=6),
    )
    counting_fs.calls.clear()
    m = read_manifest(path)  # materializes pages
    assert len(m["files"]) == 6
    assert counting_fs.calls["read_bytes"] >= 1  # root + pages via seam
    assert counting_fs.calls["version"] >= 1


@pytest.mark.parametrize("seed", [21, 4242])
def test_lifecycle_on_object_store_semantics(spark, tmpdir, seed):
    """The FULL lifecycle model (append/merge/update/delete/compact/
    rollback/maintain + snapshots + vacuum) on ObjectStoreSimFS: every
    metadata move is copy+delete — no protocol may depend on rename(2).
    This is the executable proof behind USAGE.md's object-store
    mapping."""
    from nimble_spark.sources.fs import ObjectStoreSimFS, set_fs
    from tests.test_lifecycle_model_fuzz import _run_lifecycle

    prev = set_fs(ObjectStoreSimFS())
    try:
        _run_lifecycle(spark, f"{tmpdir}/life_os_{seed}", seed)
    finally:
        set_fs(prev)


def _fsspec_variants():
    """The fsspec-backed seam implementations available here: the
    in-repo contract double always; the REAL fsspec local filesystem
    too when the package is installed (same tests, same assertions —
    proving the adapter holds against the actual third-party API)."""
    from nimble_spark.sources.fs_fsspec import FsspecFS, _MiniLocalFsspec

    variants = [pytest.param(lambda: FsspecFS(_MiniLocalFsspec()), id="mini_contract")]
    try:
        import fsspec

        variants.append(
            pytest.param(lambda: FsspecFS(fsspec.filesystem("file")), id="fsspec_file")
        )
    except ImportError:
        pass
    return variants


@pytest.mark.parametrize("make_fs", _fsspec_variants())
def test_lifecycle_on_fsspec_seam(spark, tmpdir, make_fs):
    """The FULL lifecycle model on the fsspec adapter — the seam holds
    against a third-party FS API shape, not just in-repo impls. With
    supports_atomic_dir_move=False the rewrites take the republish
    path, and every metadata move is the adapter's copy+rm."""
    from tests.test_lifecycle_model_fuzz import _run_lifecycle

    prev = set_fs(make_fs())
    try:
        _run_lifecycle(spark, f"{tmpdir}/life_fsspec", 4242)
    finally:
        set_fs(prev)


@pytest.mark.parametrize("make_fs", _fsspec_variants())
def test_fsspec_commit_lock(tmp_path, make_fs):
    """Exclusive-create lock: second acquirer times out while held,
    acquires after release, and a stale lock is broken."""
    fs = make_fs()
    table = str(tmp_path / "t")
    with fs.commit_lock(table, timeout_s=5.0):
        with pytest.raises(TimeoutError):
            with fs.commit_lock(table, timeout_s=0.3):
                pass
    # released: immediate re-acquire works
    with fs.commit_lock(table, timeout_s=1.0):
        pass
    # stale break: a leftover lock older than stale_s is removed
    lock_path = f"{table}.__commit.lock"
    with open(lock_path, "wb") as fh:
        fh.write(b"crashed@deadbeef")
    import os as _os

    old = _os.stat(lock_path).st_mtime - 10_000
    _os.utime(lock_path, (old, old))
    with fs.commit_lock(table, timeout_s=2.0, stale_s=600.0):
        pass


def test_fsspec_lease_fallback_lock(tmp_path):
    """A backend without exclusive-create (plain S3 shape) falls back
    to the create-then-verify lease and still serializes."""
    from nimble_spark.sources.fs_fsspec import FsspecFS, _MiniLocalFsspec

    class NoExclusive(_MiniLocalFsspec):
        def open(self, path, mode="rb"):
            if "x" in mode:
                raise ValueError("exclusive create not supported")
            return super().open(path, mode)

    fs = FsspecFS(NoExclusive())
    table = str(tmp_path / "t")
    with fs.commit_lock(table, timeout_s=5.0):
        with pytest.raises(TimeoutError):
            with fs.commit_lock(table, timeout_s=0.5):
                pass
    with fs.commit_lock(table, timeout_s=1.0):
        pass


class StrictObjectStoreFS(LocalFS):
    """Object-store semantics PLUS a tripwire: any directory move is a
    bug (no object store can do one). Proves the full-rewrite path
    never needs rename(2) when the FS says it lacks it."""

    supports_atomic_dir_move = False

    def move(self, src, dst):
        import os
        import shutil

        assert not os.path.isdir(src), f"directory move attempted: {src}"
        shutil.copy2(src, dst)
        os.unlink(src)


def test_full_rewrites_republish_without_dir_moves(spark, tmp_path):
    """compact_deletes + full recluster on a no-rename FS: the
    root-republish path relocates per-object and commits via the
    atomic manifest publish — results identical to the POSIX swap
    (history reset, masks cleared, layout preserved, old generation
    swept)."""
    from nimble_spark.sources.compaction import recluster_table
    from nimble_spark.sources.deletes import compact_deletes, delete_rows, read_with_deletes
    from nimble_spark.sources.fs import set_fs
    from nimble_spark.sources.table import (
        WriteOptions,
        read_manifest,
        read_table,
        write_table,
    )

    prev = set_fs(StrictObjectStoreFS())
    try:
        path = str(tmp_path / "t")
        write_table(
            spark.range(0, 200).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
            path,
            WriteOptions(cluster_by=["k"], n_cluster_files=3),
        )
        write_table(
            spark.range(200, 300).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
            path,
            mode="append",
        )
        delete_rows(spark, path, "k", [0, 1, 2])
        m = compact_deletes(spark, path)
        assert m["rows"] == 297
        assert len(m["commits"]) == 1  # history reset, like the swap
        assert "cluster" in m["indexes"]  # layout preserved
        assert read_with_deletes(spark, path).count() == 297
        assert read_table(spark, path).filter("k < 3").count() == 0
        # masks cleared; old generation gone from the live prefix
        import os

        assert not os.path.isdir(os.path.join(path, "_nimble", "deletes"))
        assert all(not os.path.isabs(f["path"]) for f in read_manifest(path)["files"])
        # a further mutation cycle works on the republished table
        recluster_table(spark, path, n_files=2)
        assert read_table(spark, path).count() == 297
    finally:
        set_fs(prev)
