"""Test-table loaders for the driver's synthetic TPC-H-ish corpus."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a driver table.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark cannot map
    natively (PARQUET_TYPE_ILLEGAL on a default session). We read it
    as raw int64 nanos (`nanosAsLong`, runtime-settable) and truncate
    to microseconds with integer division — the exact semantics DuckDB
    applies when casting TIMESTAMP_NS → TIMESTAMP, so oracle
    comparisons stay bit-identical. The nanos residual policy mirrors
    the reference's TimestampMicroNano two-stream split
    (dwio/nimble/velox/FieldWriter.cpp:514): micros carry the value,
    nanos are a lossy residual documented as such.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
