"""Python DataSource connector: ``spark.read.format("nimble")``.

The idiomatic-Spark face of the table layer (SURVEY §2.1 connectors):
read_table() is the library API; this DataSource makes the same
manifest-driven selective scan available to plain ``spark.read`` /
SQL users, with Catalyst integration doing the work the reference's
SelectiveNimbleReader does natively:

- **Filter pushdown** (``pushFilters``): every eq/in/range constraint
  on a column with per-file min/max stats prunes FILES before any
  partition is planned — the file-level analogue of the reference's
  stride skipping. Filters are also left in the plan (returned as
  unsupported) so Spark applies the exact row-level residual; pruning
  here is allowed to be conservative, never wrong.
- **Column pruning**: Spark hands the reader its pruned schema; each
  partition reads exactly those parquet columns (ReadSchema reaches
  the pyarrow scan).
- **Parallelism**: one InputPartition per manifest file (stripe-group
  = split), so a 1000-executor cluster fans out by file exactly like
  the native parquet source.

Partitions stream Arrow RecordBatches (no per-row Python), so the
only Python on the data path is pyarrow's C++ parquet reader.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from nimble_spark.sources.table import read_manifest


class NimbleFilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


class NimbleDataSource(DataSource):
    """``spark.read.format("nimble").load(path)`` over a nimble_spark
    table directory (write_table output)."""

    @classmethod
    def name(cls) -> str:
        return "nimble"

    def schema(self) -> StructType:
        manifest = read_manifest(self.options["path"])
        return StructType.fromJson(manifest["schema"])

    def reader(self, schema: StructType) -> "NimbleReader":
        return NimbleReader(self.options["path"], schema)

    def streamReader(self, schema: StructType) -> "NimbleStreamReader":  # noqa: N802
        return NimbleStreamReader(self.options["path"], schema)


def _file_might_match(entry: dict, col: str, kind: str, value) -> bool:
    """Conservative per-file stats check: False ONLY when the file's
    [min, max] for ``col`` provably excludes every row the filter can
    accept. Type-mismatched or missing stats keep the file."""
    fmin = (entry.get("min") or {}).get(col)
    fmax = (entry.get("max") or {}).get(col)
    if fmin is None or fmax is None:
        return True
    probe = value[0] if kind == "in" and value else value
    if not isinstance(fmin, (int, float, str)) or type(probe) is not type(fmin) and not (
        isinstance(probe, (int, float)) and isinstance(fmin, (int, float))
    ):
        return True
    if kind == "eq":
        return fmin <= value <= fmax
    if kind == "in":
        return any(fmin <= v <= fmax for v in value)
    if kind == "gt":
        return fmax > value
    if kind == "ge":
        return fmax >= value
    if kind == "lt":
        return fmin < value
    if kind == "le":
        return fmin <= value
    return True


class NimbleReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.manifest = read_manifest(path)
        self.columns = [f.name for f in schema.fields]
        self._constraints: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        """Record file-prunable constraints; report EVERY filter as
        unsupported so Spark keeps the exact row-level residual in the
        plan — stats pruning is a superset-safe file skip, not a row
        filter."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:  # nested columns: no file stats
                continue
            col = attr[0]
            if isinstance(f, EqualTo):
                self._constraints.append((col, "eq", f.value))
            elif isinstance(f, In):
                self._constraints.append((col, "in", tuple(f.value)))
            elif isinstance(f, GreaterThan):
                self._constraints.append((col, "gt", f.value))
            elif isinstance(f, GreaterThanOrEqual):
                self._constraints.append((col, "ge", f.value))
            elif isinstance(f, LessThan):
                self._constraints.append((col, "lt", f.value))
            elif isinstance(f, LessThanOrEqual):
                self._constraints.append((col, "le", f.value))
        return filters  # all residual — Spark re-applies row-exact

    def kept_files(self) -> list[str]:
        keep = []
        for entry in self.manifest["files"]:
            if all(
                _file_might_match(entry, col, kind, value)
                for col, kind, value in self._constraints
            ):
                keep.append(os.path.join(self.path, entry["path"]))
        return keep

    def partitions(self) -> list[NimbleFilePartition]:
        return [NimbleFilePartition(p) for p in self.kept_files()]

    def read(self, partition: NimbleFilePartition) -> Iterator:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path, columns=self.columns or None)
        yield from table.to_batches()


def register_nimble_source(spark) -> None:
    """Idempotently register the ``nimble`` format on a session.
    Python-source filter pushdown is opt-in in Spark 4 — enable it so
    pushFilters actually receives the predicates (runtime-settable;
    also set in session.py defaults, but the driver uses a plain
    session)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(NimbleDataSource)


class NimbleStreamReader(DataSourceStreamReader):
    """Commit-log CDC streaming source: each micro-batch is the file
    additions of the commits between the start and end offsets — the
    streaming face of ``read_changes``. Offsets are commit indices, so
    progress tracking is exactly the table's own provenance log:
    restart-safe (offsets live in the checkpoint), no directory
    diffing, O(changed data) per batch no matter the table size."""

    def __init__(self, path: str, schema: StructType):
        self.path = path
        self.columns = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:  # noqa: N802
        return {"commit": -1}

    def latestOffset(self) -> dict:  # noqa: N802
        return {"commit": len(read_manifest(self.path).get("commits", [])) - 1}

    def partitions(self, start: dict, end: dict):
        manifest = read_manifest(self.path)
        commits = manifest.get("commits", [])
        added = [
            f
            for c in commits[start["commit"] + 1 : end["commit"] + 1]
            for f in c.get("files", [])
        ]
        live = {os.path.normpath(f["path"]) for f in manifest["files"]}
        gone = [f for f in added if f not in live]
        if gone:
            raise ValueError(
                f"stream window ({start['commit']}, {end['commit']}] is gone "
                f"(compaction/vacuum/merge removed {gone[:3]}…)"
            )
        return [NimbleFilePartition(os.path.join(self.path, f)) for f in added]

    def read(self, partition: NimbleFilePartition) -> Iterator:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file_path, columns=self.columns or None)
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the table's own commit log
