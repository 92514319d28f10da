"""Flat-map and deduplicated-column write transforms — the reference
format's signature features (SURVEY.md §1.3), re-expressed as
DataFrame-level storage transforms.

FlatMap (dwio/nimble/velox/FieldWriter.cpp:1415, reader
selective/FlatMapColumnReader.cpp): a MAP column is stored exploded
into per-key value columns plus per-key presence ("inMap") columns, so
projecting a handful of keys touches only those streams. Spark
mapping: map<K,V> → columns ``<prefix>__<key>`` (value, null when
absent) + the presence distinction kept via a per-row key list — a
null value IN the map and an absent key are different states, exactly
the inMap semantics. Key discovery is dynamic at write (the union of
keys actually present), like the reference without a fixed-feature
config (writer/VeloxWriterOptions.h:129-138).

ArrayWithOffsets (FieldWriter.cpp:2177 / FieldReader.cpp:1261):
consecutive identical arrays are stored once with per-row offsets.
Spark mapping: the array column splits into a dictionary table of
distinct arrays (id → array) plus an int reference column — the
deduplication is global per write rather than consecutive-only, which
is strictly stronger compression with the same logical round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FLATMAP_NULL_SENTINEL = "__nimble_in_map"

# Dynamic key discovery is bounded like the reference's flat-map
# (dwio/nimble/velox/NimbleConfig.h:27 caps flatmap keys): beyond the
# cap a map column is the wrong storage shape — keep it as a map.
# Discovery is a WRITE-TIME metadata operation (once per table write,
# like footer construction), not a query-path action; readers get the
# key set from the manifest (write_flatmap_table/read_flatmap_table).
MAX_FLATMAP_KEYS = 200_000


def flatten_map_column(
    df: DataFrame, map_col: str, keys: list[str] | None = None, prefix: str | None = None
) -> tuple[DataFrame, list[str]]:
    """Explode ``map_col`` into per-key columns.

    Returns (flattened df, discovered keys). Per key ``k`` two columns
    are produced: ``{prefix}__{k}`` (the value, null if absent-or-null)
    and ``{prefix}__{k}__in`` (boolean inMap stream: present vs absent).
    """
    prefix = prefix or map_col
    if keys is None:
        keys = sorted(
            r[0]
            for r in df.select(F.explode(F.map_keys(map_col)).alias("k"))
            .distinct()
            .limit(MAX_FLATMAP_KEYS + 1)
            .collect()
        )
        if len(keys) > MAX_FLATMAP_KEYS:
            raise ValueError(
                f"flat-map key discovery exceeded {MAX_FLATMAP_KEYS} distinct keys"
                f" for column '{map_col}' — keep it as a map column instead"
            )
    out = df
    for k in keys:
        out = out.withColumn(f"{prefix}__{k}", F.col(map_col).getItem(k))
        out = out.withColumn(f"{prefix}__{k}__in", F.map_contains_key(F.col(map_col), F.lit(k)))
    return out.drop(map_col), keys


def restore_map_column(
    df: DataFrame, keys: list[str], map_col: str, prefix: str | None = None
) -> DataFrame:
    """Inverse of flatten_map_column: rebuild map<K,V> from per-key
    columns, honoring inMap presence (absent keys stay absent; present
    null values come back as present nulls)."""
    prefix = prefix or map_col
    entries = []
    for k in keys:
        entries.append(
            F.when(
                F.col(f"{prefix}__{k}__in"),
                F.struct(F.lit(k).alias("key"), F.col(f"{prefix}__{k}").alias("value")),
            )
        )
    arr = F.filter(F.array(*entries), lambda e: e.isNotNull())
    out = df.withColumn(map_col, F.map_from_entries(arr))
    drop = [c for k in keys for c in (f"{prefix}__{k}", f"{prefix}__{k}__in")]
    return out.drop(*drop)


def project_map_keys(df: DataFrame, keys: list[str], prefix: str) -> DataFrame:
    """Key projection on a flattened map: read N named keys as columns
    without touching the other key streams (the flat-map read
    optimization — Catalyst column pruning does the stream skipping)."""
    cols = [c for c in df.columns if not c.startswith(f"{prefix}__")]
    for k in keys:
        cols.append(f"{prefix}__{k}")
        cols.append(f"{prefix}__{k}__in")
    return df.select(*cols)


# ---------------------------------------------------------------------------
# Deduplicated arrays (ArrayWithOffsets) / maps (SlidingWindowMap)
# ---------------------------------------------------------------------------


def dedup_array_column(df: DataFrame, arr_col: str) -> tuple[DataFrame, DataFrame]:
    """Split ``arr_col`` into (main df with ``{arr_col}__ref``,
    dictionary df ``(ref, {arr_col})`` of distinct arrays).

    The ref is a 128-bit content hash (md5) of the serialized array —
    deterministic, partition-independent, and join-stable (no
    window/zipWithIndex sequencing needed at 100 TB). 128 bits matter:
    at billions of distinct arrays a 64-bit key has expected birthday
    collisions, and a collision here silently swaps one row's array
    for another on restore; at 2^64 distinct values the md5 collision
    probability is still ~1e-20. (The reference's ArrayWithOffsets
    dedups by true equality over a consecutive window —
    dwio/nimble/velox/FieldWriter.cpp:2177 — so its collision
    probability is 0; ours is bounded, not zero, and documented.)
    """
    ser = F.coalesce(F.to_json(F.struct(F.col(arr_col).alias("a"))), F.lit("null"))
    ref = F.md5(ser)
    main = df.withColumn(f"{arr_col}__ref", ref).drop(arr_col)
    dictionary = (
        df.select(ref.alias("ref"), F.col(arr_col))
        .dropDuplicates(["ref"])
    )
    return main, dictionary


def write_flatmap_table(df: DataFrame, map_col: str, path: str, opts=None) -> list[str]:
    """Write ``df`` with ``map_col`` stored flat-map style, persisting
    the discovered key set in the manifest (user_metadata) — readers
    never re-scan for keys. Returns the key list."""
    from nimble_spark.sources.table import WriteOptions, write_table

    opts = opts or WriteOptions()
    flat, keys = flatten_map_column(df, map_col)
    opts.user_metadata = dict(opts.user_metadata)
    opts.user_metadata[f"flatmap_keys:{map_col}"] = ",".join(keys)
    write_table(flat, path, opts)
    return keys


def read_flatmap_table(
    spark, path: str, map_col: str, keys: list[str] | None = None
) -> DataFrame:
    """Read a flat-map table back as its logical map column. ``keys``
    projects a subset (only those streams are read — Catalyst prunes
    the rest); default restores the full map using the manifest's
    persisted key set (no discovery scan)."""
    from nimble_spark.sources.table import read_manifest, read_table

    manifest = read_manifest(path)
    all_keys = manifest.get("user_metadata", {}).get(f"flatmap_keys:{map_col}", "")
    all_keys = all_keys.split(",") if all_keys else []
    use = keys if keys is not None else all_keys
    df = read_table(spark, path)
    df = project_map_keys(df, use, map_col)
    return restore_map_column(df, use, map_col)


def restore_array_column(main: DataFrame, dictionary: DataFrame, arr_col: str) -> DataFrame:
    """Re-attach the dictionary (broadcast when small) to restore the
    logical array column."""
    d = dictionary.withColumnRenamed("ref", f"{arr_col}__ref")
    return main.join(F.broadcast(d), f"{arr_col}__ref", "left").drop(f"{arr_col}__ref")
