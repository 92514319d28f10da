"""SharedDictionary encoding analogue — indices into a shared alphabet.

The reference's SharedDictionaryEncoding (enum 22,
dwio/nimble/encodings/SharedDictionaryEncoding.h:53-189; builder +
velox/SharedDictionaryWriter.h) stores a stream as integer indices
into a dictionary owned *outside* the stream — shared per stripe,
file, or externally. Parquet's per-row-group dictionaries can't span
files, so the Spark-native mapping makes the alphabet a first-class
side table: ``encode`` builds one global dictionary for a column
(deterministic dense codes by value order) and rewrites the column to
int codes; ``decode`` restores values via a broadcast join.

Scale posture: the dictionary is NDV rows — built with one
distinct+sort over the column (shuffle of distinct values only, never
the table), applied and reversed as a broadcast hash join. The encoded
column is int32, so downstream shuffles/aggregations on it move a
fraction of the string bytes — the same read-side win the reference's
dictionary-preserving execution gets (SURVEY §2.3 row 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CODE_SUFFIX = "__code"


def build_dictionary(df: DataFrame, col: str) -> DataFrame:
    """The shared alphabet: (value, code) with dense codes 0..NDV-1
    assigned in value order — deterministic across engines/runs.
    Nulls are not dictionary entries (the encoded column keeps null)."""
    w = Window.orderBy(col)
    return (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .distinct()
        .select(F.col(col).alias("value"), (F.row_number().over(w) - 1).cast("int").alias("code"))
    )


def encode_shared_dictionary(df: DataFrame, col: str, dictionary: DataFrame | None = None) -> tuple[DataFrame, DataFrame]:
    """Replace ``col`` with ``col__code`` int indices into the shared
    dictionary. Returns (encoded df, dictionary df)."""
    d = dictionary if dictionary is not None else build_dictionary(df, col)
    enc = (
        df.join(F.broadcast(d), df[col] == d["value"], "left")
        .drop("value")
        .withColumnRenamed("code", col + CODE_SUFFIX)
        .drop(col)
    )
    return enc, d


def decode_shared_dictionary(encoded: DataFrame, dictionary: DataFrame, col: str) -> DataFrame:
    """Restore the original column from codes + alphabet."""
    code_col = col + CODE_SUFFIX
    dec = (
        encoded.join(
            F.broadcast(dictionary), encoded[code_col] == dictionary["code"], "left"
        )
        .drop("code")
        .withColumnRenamed("value", col)
        .drop(code_col)
    )
    return dec
