"""Non-Spark consumer interop: open a nimble_spark table as a pyarrow
Dataset or query it from DuckDB, honoring the MANIFEST's file list.

The manifest is the table's source of truth; a naive ``*.parquet``
glob over the directory would also read debris from interrupted
writes and (pre-vacuum) superseded files — the exact failure the
reference's footer-last tablet discipline exists to prevent. These
helpers materialize the manifest's live file list so every engine
sees the same committed state Spark does:

    import duckdb
    from nimble_spark.sources.interop import arrow_dataset, duckdb_relation

    ds = arrow_dataset(path)              # pyarrow.dataset
    con = duckdb.connect()                # hold while querying
    rel = duckdb_relation(con, path)      # DuckDB relation

Cross-engine reads are read-only; writers go through write_table so
manifest, stats, and the commit log stay authoritative.
"""

from __future__ import annotations

import os

from nimble_spark.sources.table import read_manifest


def live_files(path: str) -> list[str]:
    """Absolute paths of the table's committed data files, in manifest
    order (cluster range order on clustered tables)."""
    m = read_manifest(path)
    return [os.path.join(path, f["path"]) for f in m["files"]]


def arrow_dataset(path: str):
    """The table as a ``pyarrow.dataset.Dataset`` over exactly the
    committed files — predicate/projection pushdown via pyarrow's
    scanner, zero Spark involvement."""
    import pyarrow.dataset as pa_ds

    return pa_ds.dataset(live_files(path), format="parquet")


def duckdb_relation(con, path: str):
    """A DuckDB relation over the committed files (``read_parquet`` on
    the explicit list, never a directory glob)."""
    return con.read_parquet(live_files(path))
