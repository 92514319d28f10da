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
    manifest = os.path.join(path, MANIFEST_DIR, MANIFEST_NAME)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        mode = "append" if os.path.exists(manifest) else "overwrite"
        write_table(batch_df, path, opts, mode=mode)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
