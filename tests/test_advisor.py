"""Layout-advisor tests: plan-evidence extraction and the
recommendation rules (SURVEY §4.1 — write-time layout planning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimble_spark.plans.advisor import advise_layout, observe
from tests.conftest import SF_SMALL


def test_advisor_recommends_expected_layout(spark):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    c = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    workload = [
        o.filter((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") <= 200)),
        o.filter(F.col("o_orderkey").between(5, 50)),
        o.filter(F.col("o_orderstatus") == "F"),
        o.join(c, o.o_custkey == c.c_custkey),
        o.filter(F.col("o_custkey") == 77),
    ]
    recs = {(r.option, r.column) for r in advise_layout(spark, o, workload)}
    assert ("cluster_by", "o_orderkey") in recs      # range scans → cluster
    assert ("partition_by", "o_orderstatus") in recs  # low-NDV equality → dirs
    assert ("bucket_by", "o_custkey") in recs         # point + join key → buckets
    # never recommends columns the table doesn't have
    assert all(col in o.columns for _, col in recs)


def test_observe_counts_shapes(spark):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    ev = observe([o.filter(F.col("o_orderkey") > 10), o.filter(F.col("o_orderstatus") == "F")])
    assert ev["range"]["o_orderkey"] == 1
    assert ev["point"]["o_orderstatus"] == 1
