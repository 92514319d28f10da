"""Streaming sink: write a stream into a nimble_spark table.

The reference is a batch format, but its tables are valid streaming
sinks (SURVEY.md §2.6 streaming row) — each micro-batch appends files
(stripes) and refreshes the manifest, exactly the append-only commit
discipline of the C++ writer. Exactly-once comes from the Structured
Streaming checkpoint + idempotent-per-batch appends."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from nimble_spark.sources.table import MANIFEST_DIR, MANIFEST_NAME, WriteOptions, write_table


def _sink_token(checkpoint: str) -> str:
    """Stable identity of one stream: its checkpoint location — the
    same thing Spark uses to resume it. Replays of a batch always
    carry the same (checkpoint, batch_id) pair."""
    import hashlib

    return hashlib.md5(os.path.abspath(checkpoint).encode()).hexdigest()[:12]


def _batch_already_committed(path: str, token: str, batch_id: int) -> bool:
    from nimble_spark.sources.table import read_manifest

    try:
        m = read_manifest(path, materialize=False)
    except (OSError, KeyError, ValueError):
        return False
    return any(
        c.get("stream_sink") == token and c.get("stream_batch_id") == batch_id
        for c in m.get("commits", [])
    )


def append_stream_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    checkpoint: str,
    opts: WriteOptions | None = None,
) -> bool:
    """Idempotent micro-batch commit — the exactly-once half
    foreachBatch does NOT provide on its own (Spark guarantees
    at-least-once delivery to the function; a crash between the table
    publish and the checkpoint write REPLAYS the batch). Every commit
    records its (stream_sink=checkpoint identity, stream_batch_id)
    inside the atomic manifest publish (WriteOptions.commit_metadata);
    a replayed batch finds its marker in the commit log and is
    skipped. Returns False for a skipped replay. The marker lives in
    the commit log, so the guarantee spans sink restarts and holds
    until a history-resetting rewrite (compact_deletes) — which only
    runs between batches, under the same table lock commits take."""
    import dataclasses

    token = _sink_token(checkpoint)
    manifest = os.path.join(path, MANIFEST_DIR, MANIFEST_NAME)
    exists = os.path.exists(manifest)
    if exists and _batch_already_committed(path, token, batch_id):
        return False
    o = dataclasses.replace(
        opts or WriteOptions(),
        commit_metadata={
            **((opts.commit_metadata if opts else None) or {}),
            "stream_sink": token,
            "stream_batch_id": batch_id,
        },
    )
    write_table(batch_df, path, o, mode="append" if exists else "overwrite")
    return True


def stream_to_table(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    opts: WriteOptions | None = None,
):
    """Start a stream writing micro-batches into a nimble table via
    foreachBatch: first batch creates the table, later batches append
    and rebuild the manifest (stats/min-max stay fresh for pruning).
    Returns the StreamingQuery (caller awaits/stops)."""
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_stream_batch(batch_df, batch_id, path, checkpoint, opts)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


COMMIT_COL = "_nimble_commit"


def stream_upsert_to_table(
    stream_df: DataFrame,
    path: str,
    key: str,
    order_cols: list[str],
    checkpoint: str,
    opts: WriteOptions | None = None,
):
    """Streaming UPSERT sink, merge-on-read (the mutation discipline
    of SelectiveNimbleReader's delete-mask scans, kept append-only):
    each micro-batch is reduced to its winner row per `key` (max by
    `order_cols`), stamped with the batch id in ``_nimble_commit``,
    and APPENDED — no data file is ever rewritten. ``read_upserted``
    resolves latest-per-key at scan time; compaction of the upsert
    history is a rewrite of the resolved view. State cost: appends are
    blind (no read-side lookup per batch), so sink throughput is
    identical to the plain append sink."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
        winners = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn(COMMIT_COL, F.lit(batch_id).cast("long"))
        )
        append_stream_batch(winners, batch_id, path, checkpoint, opts)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_upserts(
    spark, path: str, key: str, order_cols: list[str], opts: WriteOptions | None = None
) -> dict:
    """Materialize the merge-on-read view: rewrite the upsert table as
    its resolved latest-per-key rows (keeping ``_nimble_commit`` so
    later upserts keep composing), dropping every shadowed row. The
    read-side window then runs over one row per key — after
    compaction, merge-on-read costs what a plain scan costs. Rewrite
    is staged into a temp dir and swapped in, so a concurrent reader
    sees either the old files or the new, never a mix mid-rewrite."""
    import shutil
    import uuid

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nimble_spark.sources.table import read_table

    df = read_table(spark, path)
    w = Window.partitionBy(key).orderBy(
        F.col(COMMIT_COL).desc(), *[F.col(c).desc() for c in order_cols]
    )
    resolved = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    staging = f"{path}-rewrite-{uuid.uuid4().hex[:8]}"
    manifest = write_table(resolved, staging, opts)
    # swap: move the old table aside, promote the staging dir
    trash = f"{path}-old-{uuid.uuid4().hex[:8]}"
    os.rename(path, trash)
    os.rename(staging, path)
    shutil.rmtree(trash, ignore_errors=True)
    return manifest


def read_upserted(spark, path: str, key: str, order_cols: list[str]) -> DataFrame:
    """Scan the upsert table resolving latest-per-key: later commits
    shadow earlier ones; within a commit the `order_cols` ranking
    (already applied at write) breaks ties. One hash shuffle on the
    key — the merge-on-read cost; at scale, pre-bucket the table on
    the key so the window rides the storage partitioning."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nimble_spark.sources.table import read_table

    df = read_table(spark, path)
    w = Window.partitionBy(key).orderBy(
        F.col(COMMIT_COL).desc(), *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", COMMIT_COL)
    )
