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

# The practical knob for WIDE flat-maps (r8 drill): per-key expression
# extraction costs one GetMapValue per key, and Spark's GetMapValue is
# a linear scan of the map — O(keys²) work per row. Fine to ~1k keys;
# past the cap flatten switches to ONE Arrow-batched mapInPandas pass
# that iterates each row's entries once — O(total entries), the same
# single-pass shape as the reference's flat-map FieldWriter
# (dwio/nimble/velox/FieldWriter.cpp:1415). The narrow path stays
# expression-only (JVM-side, no Python) because below the cap the
# quadratic term is cheaper than the Arrow round-trip.
FLATMAP_EXTRACT_CAP = 1_000


def flatten_map_column(
    df: DataFrame, map_col: str, keys: list[str] | None = None, prefix: str | None = None
) -> tuple[DataFrame, list[str]]:
    """Explode ``map_col`` into per-key columns.

    Returns (flattened df, discovered keys). Per key ``k`` two columns
    are produced: ``{prefix}__{k}`` (the value, null if absent-or-null)
    and ``{prefix}__{k}__in`` (boolean inMap stream: present vs absent).

    Up to FLATMAP_EXTRACT_CAP keys: a single JVM-side projection (one
    Project node — never chained withColumn, whose per-key Project
    nesting overflows the optimizer at width). Beyond the cap: one
    linear mapInPandas pass (see FLATMAP_EXTRACT_CAP)."""
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
    if len(keys) > FLATMAP_EXTRACT_CAP:
        return _flatten_map_wide(df, map_col, keys, prefix), keys
    others = [c for c in df.columns if c != map_col]
    cols = [F.col(c) for c in others]
    for k in keys:
        cols.append(F.col(map_col).getItem(k).alias(f"{prefix}__{k}"))
        cols.append(
            F.map_contains_key(F.col(map_col), F.lit(k)).alias(f"{prefix}__{k}__in")
        )
    return df.select(*cols), keys


def _flatten_map_wide(
    df: DataFrame, map_col: str, keys: list[str], prefix: str
) -> DataFrame:
    """Linear-time flatten for wide maps: one Arrow-batched pass that
    walks each row's entries ONCE — O(sum of map sizes), not
    O(rows · keys²) like per-key GetMapValue extraction. This is the
    write-side ingest transform (paid once per table write), the Spark
    expression of the reference's single-pass flat-map FieldWriter."""
    import pyspark.sql.types as T

    others = [f for f in df.schema.fields if f.name != map_col]
    vtype = next(
        f.dataType.valueType for f in df.schema.fields if f.name == map_col
    )
    fields = list(others)
    for k in keys:
        fields.append(T.StructField(f"{prefix}__{k}", vtype, True))
        fields.append(T.StructField(f"{prefix}__{k}__in", T.BooleanType(), True))
    schema = T.StructType(fields)
    other_names = [f.name for f in others]
    key_set = set(keys)

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            vals: dict = {k: [None] * n for k in keys}
            pres: dict = {k: np.zeros(n, dtype=bool) for k in keys}
            for i, cell in enumerate(pdf[map_col]):
                if cell is None:
                    continue
                # Arrow hands MapType cells to pandas as dicts (or as
                # (key, value) tuple lists depending on the converter)
                items = cell.items() if isinstance(cell, dict) else cell
                for kk, vv in items:
                    if kk in key_set:
                        vals[kk][i] = vv
                        pres[kk][i] = True
            data = {c: pdf[c] for c in other_names}
            for k in keys:
                data[f"{prefix}__{k}"] = vals[k]
                data[f"{prefix}__{k}__in"] = pres[k]
            yield pd.DataFrame(data, columns=[f.name for f in fields])

    return df.mapInPandas(gen, schema=schema)


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


def write_flatmap_table(
    df: DataFrame,
    map_col: str,
    path: str,
    opts=None,
    row_key: str | None = None,
    keys_per_group: int = 1_000,
    mode: str = "overwrite",
) -> list[str]:
    """Write ``df`` with ``map_col`` stored flat-map style, persisting
    the discovered key set in the manifest (user_metadata) — readers
    never re-scan for keys. Returns the key list.

    Beyond ``keys_per_group`` keys the layout SHARDS VERTICALLY into
    key groups (pass ``row_key``): non-map columns land in ``base/``
    and each group of keys in ``fmgroup=NNNN/`` as its own table
    carrying ``row_key`` — because the substrate's writer cost is
    per-COLUMN (measured r8: Spark's parquet writer takes ~165 s for a
    20k-column file where a 5k-column one costs ~2 s; pyarrow proves
    the format itself is fine at ~3.6 s), so bounded-width file groups
    are what make reference-width flat-maps (200k keys,
    velox/NimbleConfig.h:27) practical on Spark+parquet. Per-key
    projected reads open ONLY the owning groups' files — IO still
    scales with the projection; keys co-accessed together should share
    a group. The reference's analogue is stream grouping inside the
    tablet (LayoutPlanner orders streams so co-read ones are
    adjacent); here the group boundary is a file boundary, which also
    bounds writer memory."""
    import json
    import os

    from nimble_spark.sources.table import WriteOptions, write_table

    if mode == "append":
        return _append_flatmap_table(df, map_col, path)
    opts = opts or WriteOptions()
    # discover once (shared by both layouts)
    keys = sorted(
        r[0]
        for r in df.select(F.explode(F.map_keys(map_col)).alias("k"))
        .distinct()
        .limit(MAX_FLATMAP_KEYS + 1)
        .collect()
    )
    if len(keys) > MAX_FLATMAP_KEYS:
        raise ValueError(
            f"flat-map key discovery exceeded {MAX_FLATMAP_KEYS} distinct "
            f"keys for column '{map_col}' — keep it as a map column instead"
        )
    if len(keys) <= keys_per_group:
        flat, keys = flatten_map_column(df, map_col, keys=keys)
        opts.user_metadata = dict(opts.user_metadata)
        opts.user_metadata[f"flatmap_keys:{map_col}"] = ",".join(keys)
        write_table(flat, path, opts)
        return keys
    if row_key is None:
        raise ValueError(
            f"{len(keys)} flat-map keys exceed keys_per_group="
            f"{keys_per_group}: the sharded layout needs a row_key "
            f"column to reassemble groups (pass row_key=...)"
        )
    if row_key not in df.columns or row_key == map_col:
        raise ValueError(f"row_key {row_key!r} is not a column of the frame")
    groups = [keys[i:i + keys_per_group] for i in range(0, len(keys), keys_per_group)]
    base_cols = [c for c in df.columns if c != map_col]
    opts.user_metadata = dict(opts.user_metadata)
    opts.user_metadata[f"flatmap_sharded:{map_col}"] = json.dumps(
        {"row_key": row_key, "n_groups": len(groups), "groups": groups}
    )
    write_table(df.select(*base_cols), os.path.join(path, "base"), opts)
    for gi, gkeys in enumerate(groups):
        # always the single-pass flatten here: the SOURCE map is wide
        # (that's why we're sharding), so even a 1000-key projection
        # via per-key GetMapValue would rescan the whole map per key
        flat = _flatten_map_wide(
            df.select(row_key, map_col), map_col, gkeys, map_col
        )
        write_table(flat, os.path.join(path, f"fmgroup={gi:04d}"), WriteOptions())
    return keys


def _append_flatmap_table(df: DataFrame, map_col: str, path: str) -> list[str]:
    """Append rows to an existing flat-map table (either layout). The
    batch's keys must be a SUBSET of the table's persisted key set —
    a new key would need a schema-widening rewrite, so it refuses with
    that remedy rather than silently landing a mismatched file. Keys
    persisted but absent from the batch store as absent (null value,
    inMap=false) — exact flat-map semantics.

    Sharded layout crash ordering: GROUP tables append first, the
    base table LAST. The base row is what makes a row visible (reads
    join groups onto base), so a crash mid-append leaves invisible
    group-side debris, never a visible row with silently-absent keys
    (the base-first ordering's failure mode)."""
    import json
    import os

    from nimble_spark.sources.table import read_manifest, write_table

    batch_keys = {
        r[0]
        for r in df.select(F.explode(F.map_keys(map_col)).alias("k"))
        .distinct()
        .limit(MAX_FLATMAP_KEYS + 1)
        .collect()
    }
    sharded_root = os.path.join(path, "base")
    if os.path.isdir(sharded_root):
        m = read_manifest(sharded_root)
        meta = json.loads(
            m.get("user_metadata", {}).get(f"flatmap_sharded:{map_col}", "{}")
        )
        if not meta:
            raise ValueError(f"{path} is not a flat-map table for {map_col!r}")
        groups, row_key = meta["groups"], meta["row_key"]
        all_keys = [k for g in groups for k in g]
        extra = sorted(batch_keys - set(all_keys))
        if extra:
            raise ValueError(
                f"append batch carries {len(extra)} key(s) outside the "
                f"table's persisted flat-map key set (e.g. {extra[:3]}); "
                f"rewrite the table (mode='overwrite') to widen the keys"
            )
        for gi, gkeys in enumerate(groups):
            flat = _flatten_map_wide(
                df.select(row_key, map_col), map_col, gkeys, map_col
            )
            write_table(flat, os.path.join(path, f"fmgroup={gi:04d}"), mode="append")
        base_cols = [c for c in df.columns if c != map_col]
        write_table(df.select(*base_cols), sharded_root, mode="append")
        return all_keys
    m = read_manifest(path)
    persisted = m.get("user_metadata", {}).get(f"flatmap_keys:{map_col}", "")
    if not persisted:
        raise ValueError(f"{path} is not a flat-map table for {map_col!r}")
    all_keys = persisted.split(",")
    extra = sorted(batch_keys - set(all_keys))
    if extra:
        raise ValueError(
            f"append batch carries {len(extra)} key(s) outside the "
            f"table's persisted flat-map key set (e.g. {extra[:3]}); "
            f"rewrite the table (mode='overwrite') to widen the keys"
        )
    flat, _ = flatten_map_column(df, map_col, keys=all_keys)
    write_table(flat, path, mode="append")
    return all_keys


def read_flatmap_table(
    spark, path: str, map_col: str, keys: list[str] | None = None
) -> DataFrame:
    """Read a flat-map table back as its logical map column. ``keys``
    projects a subset (only those streams are read — Catalyst prunes
    the rest); default restores the full map using the manifest's
    persisted key set (no discovery scan). On a sharded layout (see
    write_flatmap_table) only the groups OWNING requested keys are
    opened, each projected to just the requested streams, and joined
    back on the row key."""
    import json
    import os

    from nimble_spark.sources.table import read_manifest, read_table

    sharded_root = os.path.join(path, "base")
    if os.path.isdir(sharded_root):
        m = read_manifest(sharded_root)
        meta = json.loads(
            m.get("user_metadata", {}).get(f"flatmap_sharded:{map_col}", "{}")
        )
        if meta:
            row_key = meta["row_key"]
            groups: list[list[str]] = meta["groups"]
            all_keys = [k for g in groups for k in g]
            use = keys if keys is not None else all_keys
            use_set = set(use)
            df = read_table(spark, sharded_root)
            for gi, gkeys in enumerate(groups):
                wanted = [k for k in gkeys if k in use_set]
                if not wanted:
                    continue  # group never opened — per-key IO scaling
                cols = [row_key] + [
                    c
                    for k in wanted
                    for c in (f"{map_col}__{k}", f"{map_col}__{k}__in")
                ]
                g = read_table(
                    spark, os.path.join(path, f"fmgroup={gi:04d}"), columns=cols
                )
                df = df.join(g, on=row_key, how="left")
            return restore_map_column(df, use, map_col)

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
