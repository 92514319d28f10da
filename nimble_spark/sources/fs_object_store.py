"""Concrete conditional-PUT object-store adapters — the production
implementations of the duck-typed ``put_if_absent`` / ``put_if_match``
hooks that ``FsspecFS`` and ``FsspecCommitLock`` (fs_fsspec.py) select
their safe multi-writer paths on.

Until r10 those hooks had only in-repo doubles behind them — the
machinery was "safe on S3 by argument". These classes are the "safe by
code" half: each implements the full mini-fsspec surface the adapter
relies on directly over the store's own client API, with the
conditional-write semantics expressed in the store's native headers:

* ``S3ConditionalFsspec`` — over a boto3-S3-shaped client.
  ``put_if_absent`` = ``PUT If-None-Match: *`` (supported on S3 proper
  since 2024); ``put_if_match`` = ``PUT If-Match: <etag>``. An HTTP
  412 (PreconditionFailed) — or the 409 ConditionalRequestConflict S3
  returns when concurrent conditional writers collide — maps to
  ``False`` (caller lost, re-reads, retries); the change token is the
  object's ETag exactly as the store returns it, so ``version()``
  tokens and ``If-Match`` headers share one namespace.
* ``GcsConditionalFsspec`` — over a google-cloud-storage-shaped
  client. ``put_if_absent`` = ``if_generation_match=0``;
  ``put_if_match`` = ``if_generation_match=<generation>``; the change
  token is the blob generation.
* ``AbfsConditionalFsspec`` — over an azure-storage-blob-shaped
  service client. ``put_if_absent`` = ``upload_blob(overwrite=False)``
  (HTTP 409 ResourceExistsError → lost); ``put_if_match`` =
  ETag-conditional overwrite (HTTP 412 ResourceModifiedError → lost);
  the change token is the blob ETag.

None of the three SDKs is importable in this container, so the
factories gate the import and the live tests self-skip; the HTTP
412/409 semantics are contract-tested against client fakes that raise
the real response shapes (tests/test_object_store_adapters.py), and
the full FsspecFS contract suite runs over all three adapters.

Directory model: object stores have no directories — namespaces are
implicit key prefixes. ``makedirs`` records a process-local marker
only (so an empty "directory" lists as empty rather than missing
within the creating process); cross-process visibility starts with the
first object under the prefix, exactly like s3fs/gcsfs.

Reference seam: the reference leaves storage to the deployment behind
``velox::ReadFile/WriteFile`` (dwio/nimble/velox/VeloxReader.h:91) —
these adapters are that seam's object-store instantiations.
"""

from __future__ import annotations

import posixpath
import time
from datetime import datetime, timezone


def _split_bucket(path: str) -> tuple[str, str]:
    """'bucket/key/parts' or 's3://bucket/key' → (bucket, key)."""
    p = path
    for scheme in ("s3://", "gs://", "gcs://"):
        if p.startswith(scheme):
            p = p[len(scheme):]
            break
    p = p.strip("/")
    if "/" in p:
        b, k = p.split("/", 1)
        return b, k
    return p, ""


class _ObjectStoreMiniFsspec:
    """Shared mini-fsspec surface over six store primitives the
    subclass implements: ``_list_keys(bucket, prefix)``,
    ``_get(bucket, key)``, ``_put(bucket, key, data, if_none_match,
    if_match)``, ``_head(bucket, key) -> (size, token, mtime_s)``,
    ``_copy(bucket, src, dst)``, ``_del(bucket, key)``. All namespace
    operations (ls/walk/isdir/mv/rm) derive from key listings — the
    object-store shape, no directory assumptions anywhere."""

    def __init__(self):
        self._dirs: set[str] = set()  # process-local makedirs markers

    # ---- blobs ----
    def cat_file(self, path):
        b, k = _split_bucket(path)
        return self._get(b, k)

    def pipe_file(self, path, data):
        b, k = _split_bucket(path)
        self._put(b, k, bytes(data), if_none_match=False, if_match=None)

    def put_if_absent(self, path, data):
        b, k = _split_bucket(path)
        return self._put(b, k, bytes(data), if_none_match=True, if_match=None)

    def put_if_match(self, path, data, match_token):
        b, k = _split_bucket(path)
        return self._put(b, k, bytes(data), if_none_match=False, if_match=match_token)

    def exists(self, path):
        b, k = _split_bucket(path)
        try:
            self._head(b, k)
            return True
        except FileNotFoundError:
            return self.isdir(path)

    def info(self, path):
        b, k = _split_bucket(path)
        try:
            size, _tok, _mt = self._head(b, k)
            return {"name": self._norm(path), "size": size, "type": "file"}
        except FileNotFoundError:
            if self.isdir(path):
                return {"name": self._norm(path), "size": 0, "type": "directory"}
            raise

    def checksum(self, path):
        b, k = _split_bucket(path)
        return self._head(b, k)[1]

    def modified(self, path):
        b, k = _split_bucket(path)
        return datetime.fromtimestamp(self._head(b, k)[2], tz=timezone.utc)

    # ---- namespace (prefix listings; no real directories) ----
    @staticmethod
    def _norm(path):
        return path.rstrip("/")

    def _full_keys_under(self, path):
        """All object paths ('bucket/key') under a path prefix."""
        b, k = _split_bucket(path)
        pfx = f"{k}/" if k else ""
        return [f"{b}/{key}" for key in self._list_keys(b, pfx)]

    def isdir(self, path):
        if self._norm(path) in self._dirs:
            return True
        return bool(self._full_keys_under(path))

    def ls(self, path, detail=False):
        key = self._norm(path)
        b, k = _split_bucket(path)
        try:
            self._head(b, k)
            return [self.info(key)] if detail else [key]  # file: [itself]
        except FileNotFoundError:
            pass  # not an object: list it as a prefix below
        pfx = key + "/"
        children = set()
        for full in self._full_keys_under(path):
            children.add(pfx + full[len(pfx):].split("/", 1)[0])
        for d in self._dirs:
            if d.startswith(pfx):
                children.add(pfx + d[len(pfx):].split("/", 1)[0])
        if not children and key not in self._dirs:
            raise FileNotFoundError(path)
        if detail:
            return [self.info(c) for c in sorted(children)]
        return sorted(children)

    def walk(self, path):
        base = self._norm(path)
        pfx = base + "/"
        dirs_of: dict[str, set] = {"": set()}
        files_of: dict[str, list] = {"": []}
        for full in sorted(self._full_keys_under(path)):
            rel = full[len(pfx):]
            parts = rel.split("/")
            d = ""
            for p in parts[:-1]:
                dirs_of.setdefault(d, set()).add(p)
                files_of.setdefault(d, [])
                d = f"{d}/{p}" if d else p
                dirs_of.setdefault(d, set())
                files_of.setdefault(d, [])
            files_of.setdefault(d, []).append(parts[-1])
            dirs_of.setdefault(d, set())
        for d in sorted(dirs_of):
            root = base if not d else f"{base}/{d}"
            yield root, sorted(dirs_of[d]), sorted(files_of.get(d, []))

    def makedirs(self, path, exist_ok=False):
        key = self._norm(path)
        if not exist_ok and key in self._dirs:
            raise FileExistsError(path)
        self._dirs.add(key)

    # ---- mutation ----
    def mv(self, src, dst, recursive=False):
        sb, sk = _split_bucket(src)
        db, dk = _split_bucket(dst)
        try:
            self._head(sb, sk)
            self._copy(sb, sk, db, dk)
            self._del(sb, sk)
            return
        except FileNotFoundError:
            pass  # not an object: move the prefix's keys below
        moved = False
        spfx = f"{sk}/" if sk else ""
        for key in list(self._list_keys(sb, spfx)):
            rel = key[len(spfx):]
            self._copy(sb, key, db, f"{dk}/{rel}" if dk else rel)
            self._del(sb, key)
            moved = True
        if not moved:
            raise FileNotFoundError(src)

    def rm_file(self, path):
        b, k = _split_bucket(path)
        self._head(b, k)  # store deletes are idempotent; contract raises
        self._del(b, k)

    def rm(self, path, recursive=False):
        b, k = _split_bucket(path)
        try:
            self._head(b, k)
            self._del(b, k)
            return
        except FileNotFoundError:
            pass  # not an object: delete the prefix's keys below
        hits = list(self._list_keys(b, f"{k}/" if k else ""))
        if hits and not recursive:
            raise IsADirectoryError(path)
        if not hits and self._norm(path) not in self._dirs:
            raise FileNotFoundError(path)
        for key in hits:
            self._del(b, key)
        self._dirs.discard(self._norm(path))


def _aws_error(e) -> tuple:
    """(http_status, error_code) from a botocore-ClientError-shaped
    exception — shape-checked, not type-checked, so the mapping works
    against both the real SDK and the contract fakes."""
    r = getattr(e, "response", None)
    if not isinstance(r, dict):
        return (None, None)
    return (
        r.get("ResponseMetadata", {}).get("HTTPStatusCode"),
        r.get("Error", {}).get("Code"),
    )


class S3ConditionalFsspec(_ObjectStoreMiniFsspec):
    """Mini-fsspec surface + conditional PUTs over a boto3-S3-shaped
    client (``put_object/get_object/head_object/copy_object/
    delete_object/list_objects_v2``). Change token = the ETag string
    exactly as the store returns it (quoted), fed back verbatim as
    ``If-Match``."""

    def __init__(self, client):
        super().__init__()
        self._c = client

    def _raise_mapped(self, e, bucket, key):
        status, code = _aws_error(e)
        if status == 404 or code in ("404", "NoSuchKey", "NotFound"):
            raise FileNotFoundError(f"{bucket}/{key}") from e
        raise

    def _get(self, bucket, key):
        try:
            return self._c.get_object(Bucket=bucket, Key=key)["Body"].read()
        except Exception as e:  # noqa: BLE001 — mapped by response shape
            self._raise_mapped(e, bucket, key)

    def _put(self, bucket, key, data, if_none_match, if_match):
        kw = {"Bucket": bucket, "Key": key, "Body": data}
        if if_none_match:
            kw["IfNoneMatch"] = "*"
        if if_match is not None:
            kw["IfMatch"] = if_match
        try:
            self._c.put_object(**kw)
            return True
        except Exception as e:  # noqa: BLE001
            status, code = _aws_error(e)
            # 412 = precondition failed (lost outright); 409
            # ConditionalRequestConflict = concurrent conditional
            # writers collided mid-flight — either way this writer did
            # NOT land and must re-read before retrying: False.
            if (if_none_match or if_match is not None) and (
                status in (409, 412)
                or code in ("PreconditionFailed", "ConditionalRequestConflict")
            ):
                return False
            self._raise_mapped(e, bucket, key)

    def _head(self, bucket, key):
        try:
            h = self._c.head_object(Bucket=bucket, Key=key)
        except Exception as e:  # noqa: BLE001
            self._raise_mapped(e, bucket, key)
        mt = h.get("LastModified")
        mts = mt.timestamp() if isinstance(mt, datetime) else float(mt or time.time())
        return (int(h["ContentLength"]), h["ETag"], mts)

    def _copy(self, src_bucket, src_key, dst_bucket, dst_key):
        self._c.copy_object(
            Bucket=dst_bucket,
            Key=dst_key,
            CopySource={"Bucket": src_bucket, "Key": src_key},
        )

    def _del(self, bucket, key):
        self._c.delete_object(Bucket=bucket, Key=key)

    def _list_keys(self, bucket, prefix):
        token = None
        while True:
            kw = {"Bucket": bucket, "Prefix": prefix}
            if token:
                kw["ContinuationToken"] = token
            resp = self._c.list_objects_v2(**kw)
            for o in resp.get("Contents", []):
                yield o["Key"]
            if not resp.get("IsTruncated"):
                return
            token = resp.get("NextContinuationToken")


def _gcs_code(e):
    """HTTP status from a google-api-core-shaped exception (``.code``
    attribute / property on GoogleAPICallError subclasses)."""
    code = getattr(e, "code", None)
    if isinstance(code, int):
        return code
    return getattr(code, "value", None)  # enum-shaped in some versions


class GcsConditionalFsspec(_ObjectStoreMiniFsspec):
    """Mini-fsspec surface + conditional writes over a
    google-cloud-storage-shaped client (``bucket().blob()`` objects).
    Change token = blob generation; ``put_if_absent`` is
    ``if_generation_match=0`` and ``put_if_match`` is
    ``if_generation_match=<generation>`` — GCS's native CAS."""

    def __init__(self, client):
        super().__init__()
        self._c = client

    def _blob(self, bucket, key):
        return self._c.bucket(bucket).blob(key)

    def _get(self, bucket, key):
        try:
            return self._blob(bucket, key).download_as_bytes()
        except Exception as e:  # noqa: BLE001
            if _gcs_code(e) == 404:
                raise FileNotFoundError(f"{bucket}/{key}") from e
            raise

    def _put(self, bucket, key, data, if_none_match, if_match):
        kw = {}
        if if_none_match:
            kw["if_generation_match"] = 0
        if if_match is not None:
            kw["if_generation_match"] = int(if_match)
        try:
            self._blob(bucket, key).upload_from_string(data, **kw)
            return True
        except Exception as e:  # noqa: BLE001
            if (if_none_match or if_match is not None) and _gcs_code(e) == 412:
                return False
            raise

    def _head(self, bucket, key):
        blob = self._blob(bucket, key)
        try:
            blob.reload()
        except Exception as e:  # noqa: BLE001
            if _gcs_code(e) == 404:
                raise FileNotFoundError(f"{bucket}/{key}") from e
            raise
        mt = blob.updated
        mts = mt.timestamp() if isinstance(mt, datetime) else float(mt or time.time())
        return (int(blob.size), blob.generation, mts)

    def _copy(self, src_bucket, src_key, dst_bucket, dst_key):
        sb = self._c.bucket(src_bucket)
        sb.copy_blob(sb.blob(src_key), self._c.bucket(dst_bucket), dst_key)

    def _del(self, bucket, key):
        try:
            self._blob(bucket, key).delete()
        except Exception as e:  # noqa: BLE001
            if _gcs_code(e) == 404:
                raise FileNotFoundError(f"{bucket}/{key}") from e
            raise

    def _list_keys(self, bucket, prefix):
        for blob in self._c.list_blobs(bucket, prefix=prefix):
            yield blob.name


def _azure_status(e):
    """HTTP status from an azure-core-shaped exception
    (``HttpResponseError.status_code`` on ResourceExistsError /
    ResourceModifiedError / ResourceNotFoundError)."""
    return getattr(e, "status_code", None)


class AbfsConditionalFsspec(_ObjectStoreMiniFsspec):
    """Mini-fsspec surface + conditional writes over an
    azure-storage-blob-shaped service client
    (``get_blob_client(container, blob)`` /
    ``get_container_client(container)``). Azure spells the
    conditionals as ``upload_blob(overwrite=False)`` (ETag
    ``If-None-Match: *`` under the hood — an existing blob is HTTP
    409 ResourceExistsError) and ``upload_blob(overwrite=True,
    etag=..., match_condition=IfNotModified)`` (HTTP 412
    ResourceModifiedError on a moved ETag). Change token = the blob
    ETag. Copies go download→upload: the metadata plane's objects are
    small (roots, pages, locks), and ``start_copy_from_url`` would
    drag credentials/URL plumbing into the seam for no win there."""

    def __init__(self, client):
        super().__init__()
        self._c = client

    def _bc(self, bucket, key):
        return self._c.get_blob_client(bucket, key)

    def _get(self, bucket, key):
        try:
            return self._bc(bucket, key).download_blob().readall()
        except Exception as e:  # noqa: BLE001 — mapped by status shape
            if _azure_status(e) == 404:
                raise FileNotFoundError(f"{bucket}/{key}") from e
            raise

    def _put(self, bucket, key, data, if_none_match, if_match):
        kw = {}
        if if_none_match:
            kw["overwrite"] = False
        else:
            kw["overwrite"] = True
            if if_match is not None:
                kw["etag"] = if_match
                kw["match_condition"] = _azure_if_not_modified()
        try:
            self._bc(bucket, key).upload_blob(data, **kw)
            return True
        except Exception as e:  # noqa: BLE001
            status = _azure_status(e)
            # 409 ResourceExistsError = conditional create lost;
            # 412 ResourceModifiedError = ETag moved, swap lost
            if (if_none_match and status == 409) or (
                if_match is not None and status == 412
            ):
                return False
            raise

    def _head(self, bucket, key):
        try:
            p = self._bc(bucket, key).get_blob_properties()
        except Exception as e:  # noqa: BLE001
            if _azure_status(e) == 404:
                raise FileNotFoundError(f"{bucket}/{key}") from e
            raise
        mt = p.last_modified
        mts = mt.timestamp() if isinstance(mt, datetime) else float(mt or time.time())
        return (int(p.size), p.etag, mts)

    def _copy(self, src_bucket, src_key, dst_bucket, dst_key):
        data = self._get(src_bucket, src_key)
        self._bc(dst_bucket, dst_key).upload_blob(data, overwrite=True)

    def _del(self, bucket, key):
        try:
            self._bc(bucket, key).delete_blob()
        except Exception as e:  # noqa: BLE001
            if _azure_status(e) == 404:
                raise FileNotFoundError(f"{bucket}/{key}") from e
            raise

    def _list_keys(self, bucket, prefix):
        cc = self._c.get_container_client(bucket)
        for blob in cc.list_blobs(name_starts_with=prefix):
            yield blob.name


def _azure_if_not_modified():
    """azure.core.MatchConditions.IfNotModified when the SDK is
    present; the sentinel string otherwise (the contract fakes accept
    either — what matters is that the adapter REQUESTS the
    ETag-conditional write)."""
    try:
        from azure.core import MatchConditions

        return MatchConditions.IfNotModified
    except ImportError:
        return "IfNotModified"


def s3_metadata_fs(**client_kwargs):
    """FsspecFS over real S3 with the lock-free CAS publish path
    enabled: ``set_fs(s3_metadata_fs())``. Gated: boto3 is a
    deployment dependency, not a repo one."""
    import boto3  # gated: not in this container's baked set

    from nimble_spark.sources.fs_fsspec import FsspecFS

    return FsspecFS(S3ConditionalFsspec(boto3.client("s3", **client_kwargs)))


def gcs_metadata_fs(**client_kwargs):
    """FsspecFS over real GCS with generation-match CAS publishes."""
    from google.cloud import storage  # gated: deployment dependency

    from nimble_spark.sources.fs_fsspec import FsspecFS

    return FsspecFS(GcsConditionalFsspec(storage.Client(**client_kwargs)))


def abfs_metadata_fs(connection_string: str = None, **client_kwargs):
    """FsspecFS over real Azure Blob with ETag-conditional publishes."""
    from azure.storage.blob import BlobServiceClient  # gated

    from nimble_spark.sources.fs_fsspec import FsspecFS

    client = (
        BlobServiceClient.from_connection_string(connection_string)
        if connection_string
        else BlobServiceClient(**client_kwargs)
    )
    return FsspecFS(AbfsConditionalFsspec(client))


__all__ = [
    "S3ConditionalFsspec",
    "GcsConditionalFsspec",
    "AbfsConditionalFsspec",
    "s3_metadata_fs",
    "gcs_metadata_fs",
    "abfs_metadata_fs",
]
