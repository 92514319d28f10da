"""Bloom-filter index probing (SURVEY §2.4 BloomFilter row).

The reference attaches split-block bloom filters to its index streams
(dwio/nimble/index/BloomFilter.h:34) so point lookups on unsorted,
unbucketed data can skip whole stripes without touching values. The
Spark-native analogue: parquet's own column-level bloom filters,
written via ``parquet.bloom.filter.enabled#col`` (WriteOptions.
bloom_cols) and probed here straight from the file footers through the
JVM's ParquetFileReader — a metadata-only read (footer + bloom bytes,
no data pages).

``bloom_prune_files`` is the scan-path entry: given a probe set, keep
only the files whose bloom for the key column might contain at least
one probe value. On unsorted data min/max pruning keeps every file
(each file's range spans the whole key domain), so blooms are the only
skip mechanism — the exact niche the reference built its BloomFilter
index for.

Scale posture: probing is driver-side but metadata-bounded —
O(n_files × n_probe_values) bloom tests over footers that the
manifest-build step already reads; no data rows ever reach the
driver. A cluster deployment would additionally cache the bloom bytes
in the table manifest at write time (same lifecycle as the min/max
stats) so lookups touch no file at all; the probe API here is the
shape that cache would serve.
"""

from __future__ import annotations

import os
from typing import Any, Iterable

from pyspark.sql import SparkSession


def _hash_value(jvm, gw, bloom, primitive: str, v: Any):
    """Hash one probe value with the bloom's own hash function, forcing
    the overload that matches the column's parquet primitive type.

    py4j's automatic dispatch picks ``hash(int)`` for small Python
    ints, which silently disagrees with the ``hash(long)`` the writer
    used on INT64 columns — every membership test would come back
    False. Reflection with an explicit parameter-type array pins the
    right overload; Method.invoke unboxes the wrapper to the
    primitive.
    """
    if primitive == "INT64":
        cls, box = jvm.java.lang.Long.TYPE, jvm.java.lang.Long.valueOf(int(v))
    elif primitive == "INT32":
        cls, box = jvm.java.lang.Integer.TYPE, jvm.java.lang.Integer.valueOf(int(v))
    elif primitive == "DOUBLE":
        cls, box = jvm.java.lang.Double.TYPE, jvm.java.lang.Double.valueOf(float(v))
    elif primitive == "FLOAT":
        cls, box = jvm.java.lang.Float.TYPE, jvm.java.lang.Float.valueOf(float(v))
    elif primitive == "BINARY":
        cls = jvm.java.lang.Class.forName("org.apache.parquet.io.api.Binary")
        box = jvm.org.apache.parquet.io.api.Binary.fromString(str(v))
    else:
        return None
    cls_arr = gw.new_array(jvm.java.lang.Class, 1)
    cls_arr[0] = cls
    arg_arr = gw.new_array(jvm.java.lang.Object, 1)
    arg_arr[0] = box
    return bloom.getClass().getMethod("hash", cls_arr).invoke(bloom, arg_arr)


def bloom_probe_file(
    spark: SparkSession, file_path: str, column: str, values: Iterable[Any]
) -> dict[str, Any]:
    """Probe one parquet file's bloom filter(s) for `column`.

    Returns ``{"has_bloom": bool, "maybe": bool}`` — ``maybe`` is True
    when ANY row group's bloom might contain ANY probe value (or when
    no bloom / unsupported type, i.e. probing can never veto a read it
    isn't sure about).
    """
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(file_path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(jpath, conf)
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    has_bloom = False
    try:
        footer = reader.getFooter()
        for bi in range(footer.getBlocks().size()):
            block = footer.getBlocks().get(bi)
            cols = block.getColumns()
            kcol = None
            for ci in range(cols.size()):
                if cols.get(ci).getPath().toDotString() == column:
                    kcol = cols.get(ci)
                    break
            if kcol is None or kcol.getBloomFilterOffset() < 0:
                return {"has_bloom": has_bloom, "maybe": True}
            bloom = reader.getBloomFilterDataReader(block).readBloomFilter(kcol)
            if bloom is None:
                return {"has_bloom": has_bloom, "maybe": True}
            has_bloom = True
            primitive = kcol.getPrimitiveType().getPrimitiveTypeName().name()
            for v in values:
                h = _hash_value(jvm, gw, bloom, primitive, v)
                if h is None:  # unsupported type — cannot veto
                    return {"has_bloom": has_bloom, "maybe": True}
                if bloom.findHash(h):
                    return {"has_bloom": True, "maybe": True}
        return {"has_bloom": has_bloom, "maybe": False}
    finally:
        reader.close()


def bloom_prune_files(
    spark: SparkSession, manifest: dict, root: str, key: str, values: Iterable[Any]
) -> list[str] | None:
    """File list for a point lookup on a bloom-indexed column, or None
    when the table has no bloom index on `key` (caller falls back to
    min/max pruning). Files whose blooms definitively exclude every
    probe value are skipped."""
    bloom_keys = manifest.get("indexes", {}).get("bloom", {}).get("keys", [])
    if key not in bloom_keys:
        return None
    values = list(values)
    keep = []
    for f in manifest["files"]:
        fpath = os.path.join(root, f["path"])
        if bloom_probe_file(spark, fpath, key, values)["maybe"]:
            keep.append(fpath)
    return keep
