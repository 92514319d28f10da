"""Delete masks — the Mutation-at-scan capability
(dwio/nimble/velox/selective/SelectiveNimbleReader.cpp:334-338: the
engine passes delete masks applied during the scan; the format itself
is append-only).

Spark mapping (Delta deletion-vector style, without Delta): deletes
are key sets persisted under ``_nimble/deletes/`` as parquet; scans
apply them as a broadcast anti-join — no rewrite of data files. The
table stays append-only; deletes compose across multiple delete
commits (union of keysets).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DELETES_DIR = "_nimble/deletes"
# A mask batch is visible ONLY once this marker object exists in its
# dir (publish_mask_batch writes it atomically last) — see
# mask_batch_dirs. The "_" prefix hides it from Spark's parquet reader.
MASK_COMMIT_MARKER = "_nimble_committed"


def mask_batch_dirs(path: str) -> list[str]:
    """Relative ``<keydir>/<batch>`` names of every COMMITTED mask
    batch on disk (one batch directory per delete_rows/delete_where/
    apply_changes call), sorted. A batch is committed iff it carries
    the :data:`MASK_COMMIT_MARKER` object — publish_mask_batch writes
    it atomically as the last step, so a crash mid-publish leaves an
    unmarked (invisible) dir, never a partially-applied mask. Disk
    state alone — callers that need the batches that still APPLY use
    :func:`pending_mask_batches`, which subtracts the manifest's
    consumed set."""
    root = os.path.join(path, DELETES_DIR)
    out: list[str] = []
    if not os.path.isdir(root):
        return out
    for key in sorted(os.listdir(root)):
        kdir = os.path.join(root, key)
        if not os.path.isdir(kdir):
            continue
        for b in sorted(os.listdir(kdir)):
            bdir = os.path.join(kdir, b)
            if os.path.isdir(bdir) and os.path.exists(
                os.path.join(bdir, MASK_COMMIT_MARKER)
            ):
                out.append(f"{key}/{b}")
    return out


def pending_mask_batches(path: str, manifest: dict | None = None) -> list[str]:
    """Mask batches that still apply to reads: on-disk batches minus
    the ones the manifest records as CONSUMED by a published full
    rewrite (``consumed_masks``). A rewrite that materialized the
    masks publishes its manifest atomically and clears the mask dirs
    AFTERWARDS — a crash in between leaves consumed batches on disk,
    and treating them as live would silently swallow a later
    re-append of a masked key (r8 fault-injection sweep). The
    manifest, not the directory, is the authority."""
    batches = mask_batch_dirs(path)
    if not batches:
        return []
    if manifest is None:
        from nimble_spark.sources.table import read_manifest

        try:
            manifest = read_manifest(path, materialize=False)
        except (OSError, KeyError, ValueError):
            manifest = {}
    consumed = set(manifest.get("consumed_masks") or [])
    return [b for b in batches if b not in consumed]


def has_pending_masks(path: str, manifest: dict | None = None) -> bool:
    """True when delete masks still apply to reads — the fence every
    stats-answered / raw-scan / rewrite-guard path shares."""
    return bool(pending_mask_batches(path, manifest))


def carry_consumed_masks(path: str, prior_manifest: dict) -> list[str] | None:
    """The consumed-mask entries a manifest REBUILD must carry: prior
    entries whose batch dirs still exist on disk (cleanup crashed).
    Entries whose dirs are gone self-prune; None when nothing carries.
    Dropping a live entry would resurrect an already-materialized
    mask against rows appended after the rewrite."""
    prior = prior_manifest.get("consumed_masks") or []
    live = [
        b for b in prior if os.path.isdir(os.path.join(path, DELETES_DIR, b))
    ]
    return live or None


def _physical_key(path: str, key: str) -> str:
    """Mask directories are ALWAYS named by the column's PHYSICAL name
    (stable across alter.py renames): resolve the caller's logical
    name through the manifest's rename map. Reads then map physical
    dir → current logical exactly once, so masks keep applying across
    any number of renames."""
    from nimble_spark.sources.table import logical_field_names, read_manifest

    try:
        m = read_manifest(path, materialize=False)
    except (OSError, KeyError):
        return key  # no manifest yet (raw-dir table): nothing to map
    # Refuse unknown / dropped / stale-physical names loudly: a mask
    # keyed by a name no read resolves would be silently ignored by
    # read_with_deletes forever — the requested deletes never apply
    # (the silent-no-op class alter.py otherwise refuses).
    logical = logical_field_names(m)
    if key not in logical:
        raise ValueError(
            f"delete key {key!r} is not a column of this table "
            f"(have {logical}); deletes keyed by a dropped or stale "
            f"physical name would silently never apply"
        )
    ren = (m.get("schema_mapping") or {}).get("renames") or {}
    inv = {l: p for p, l in ren.items()}
    return inv.get(key, key)


def publish_mask_batch(keys_df: DataFrame, path: str, key: str) -> str:
    """Publish one delete-mask batch with an ATOMIC visibility point
    (VERDICT r10 #2): the keyset parquet lands in its batch dir first
    (invisible — :func:`mask_batch_dirs` only reports batches carrying
    the commit marker), then a single marker object is written
    atomically as the LAST step. Readers see a complete batch or no
    batch. The previous direct write relied on Spark's job committer;
    a crash mid-job-commit could leave a PARTIAL mask visible (some
    matching keys masked, others not) for an operation that never
    completed. A one-object atomic PUT commits on every store — unlike
    a directory rename, which is copy+delete (a partial-visibility
    window) on object stores. The marker's ``_`` prefix keeps Spark's
    parquet reader from treating it as data. Returns the relative
    ``<keydir>/<batch>`` name."""
    from nimble_spark.sources.fs import get_fs

    phys = _physical_key(path, key)
    batch = uuid.uuid4().hex[:8]
    out = os.path.join(path, DELETES_DIR, phys, batch)
    keys_df.write.mode("overwrite").parquet(out)
    get_fs().write_atomic(  # ATOMIC visibility point
        os.path.join(out, MASK_COMMIT_MARKER), b""
    )
    return f"{phys}/{batch}"


def delete_rows(spark: SparkSession, path: str, key: str, values: list) -> int:
    """Record deletes for `key IN values` (logical delete, no rewrite)."""
    ddl_type = {int: "long", str: "string", float: "double"}.get(type(values[0]), "string")
    df = spark.createDataFrame([(v,) for v in values], f"{key} {ddl_type}")
    publish_mask_batch(df, path, key)
    return len(values)


def compact_deletes(spark: SparkSession, path: str) -> dict:
    """Materialize the delete masks: rewrite the table as its
    mask-applied view and clear ``_nimble/deletes/`` — the
    'compaction = rewrite + clear' step of the deletion-vector
    discipline, run when accumulated masks start to cost every scan
    their anti-join. Staged into a sibling dir and swapped whole
    (staged_swap_rewrite), so a concurrent reader sees the old table
    or the new, never a mix, and a crash leaves the old table intact.
    The declared layout and contracts survive (layout_options_of):
    cluster/zorder keys re-ranged, partitions/buckets re-derived,
    CHECK constraints carried — the guards that say 'run
    compact_deletes first' never cost the table its pruning paths.
    dedup_columns aliases are the one exception: the mask-applied view
    is written with aliases physically materialized (re-apply
    dedup_columns on a later write if wanted)."""
    from nimble_spark.sources.table import (
        layout_options_of,
        read_manifest,
        staged_swap_rewrite,
    )

    manifest = read_manifest(path)
    opts = layout_options_of(manifest)
    resolved = read_with_deletes(spark, path)
    return staged_swap_rewrite(spark, path, resolved, opts)


def read_with_deletes(spark: SparkSession, path: str, **read_kwargs) -> DataFrame:
    """Scan with delete masks applied (anti-join against the union of
    delete keysets; broadcast — keysets are small by design)."""
    from nimble_spark.sources.table import read_table

    df = read_table(spark, path, **read_kwargs)
    # Only PENDING batches apply: the manifest's consumed_masks fence
    # drops batches a published rewrite already materialized (their
    # dirs linger only when the rewrite crashed before cleanup).
    root = os.path.join(path, DELETES_DIR)
    pending = pending_mask_batches(path)
    if not pending:
        return df
    # Mask directories are recorded under the column's name AT MASK
    # TIME; a later metadata-only rename (alter.py) changes the
    # logical name without moving the directory — resolve through the
    # rename map so the mask keeps masking under the new name.
    from nimble_spark.sources.table import read_manifest

    try:
        _ren = (
            read_manifest(path, materialize=False).get("schema_mapping") or {}
        ).get("renames") or {}
    except (OSError, KeyError, ValueError):
        _ren = {}
    by_key: dict[str, list[str]] = {}
    for b in pending:
        key, _, batch = b.partition("/")
        by_key.setdefault(key, []).append(os.path.join(root, b))
    for key, subdirs in by_key.items():
        logical = _ren.get(key, key)  # dir name → current logical name
        masks = None
        for d in subdirs:
            # mask files store the key column under its WRITE-time
            # name — bind by position to the CURRENT logical name
            m = spark.read.parquet(d).toDF(logical)
            masks = m if masks is None else masks.unionByName(m)
        if masks is not None and logical in df.columns:
            df = df.join(F.broadcast(masks.distinct()), logical, "left_anti")
    return df


def delete_where(spark: SparkSession, path: str, key: str, condition: str) -> None:
    """Record deletes for every row matching a SQL ``condition`` —
    the predicate form of :func:`delete_rows`. The matching keyset is
    computed and persisted DISTRIBUTED (filter → distinct → parquet
    write into the mask dir); no key ever reaches the driver, so a
    predicate deleting millions of rows costs one filtered scan."""
    from nimble_spark.sources.table import read_table

    tgt = read_table(spark, path)
    keys = tgt.filter(F.expr(condition)).select(key).distinct()
    publish_mask_batch(keys, path, key)


# Delete-mask mutations serialize with every other table mutation:
# compact_deletes rewrites + swaps the whole table, and a delete_rows/
# delete_where racing that swap would land its mask in the directory
# that is about to be renamed away (silently lost). Hold the table
# write lock for the full span — same discipline as merge.py's
# _serialize_writes over merge/update/overwrite and compaction.py's
# compact/vacuum. The lockfile is a SIBLING of the table dir, so it
# survives compact_deletes' directory swap.
from nimble_spark.sources.merge import _serialize_writes  # noqa: E402

delete_rows = _serialize_writes(delete_rows, 1)
delete_where = _serialize_writes(delete_where, 1)
compact_deletes = _serialize_writes(compact_deletes, 1)
