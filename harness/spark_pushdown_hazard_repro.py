"""Standalone repro of the Spark 4.1 python-DataSource planning-cache
wrong-answer hazard — zero nimble_spark involvement, stock pyspark only.

The bug (observed on 4.1.2): the JVM caches a python data source's
baked read plan (pickled read function + partition list) at the
RELATION level, and refreshes it only when a new scan pushes filters
into the reader. A filterless action on a reused DataFrame therefore
silently replays the PREVIOUS scan's pruned partitions:

    d = spark.read.format(src).load()
    d.count()                 # full: N rows
    d.filter(pred).count()    # reader prunes partitions: correct
    d.count()                 # WRONG on 4.1.2 — returns the PRUNED
                              # count; the stale scan never re-enters
                              # Python, so the source cannot detect it

The probe source below is the minimal shape: two static partitions,
a ``pushFilters`` that keeps only the first partition whenever any
filter arrives (reporting every filter unsupported, so Spark keeps the
exact row-level residual — pruning is superset-safe), and a generator
``read``. Any python DataSource whose ``partitions()`` depends on
pushed filters is exposed.

Why this file exists (round-7 verdict item): nimble_spark contains the
hazard by making stats pruning OPT-IN on ``format("nimble")``
(``option("pushdown","true")`` + a fresh-load-per-query contract,
sources/datasource.py). This script pins the upstream behavior so
(a) the bug is documented reproducibly for an upstream report, and
(b) ``tests/test_pushdown_hazard_gate.py`` flips LOUDLY when a Spark
upgrade fixes it — the signal that pruning can return to default-on,
restoring parity with the reference's always-selective reader
(dwio/nimble/velox/selective/SelectiveNimbleReader.cpp:123).

Run:  python -u harness/spark_pushdown_hazard_repro.py
Exit: 0 either way; prints HAZARD PRESENT or HAZARD ABSENT.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

N_FULL = 1000
N_FIRST = 10  # rows in the partition that survives pruning


class _Slice(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class _ProbeReader(DataSourceReader):
    """Two static partitions; any pushed filter prunes to the first."""

    def __init__(self):
        self._saw_filters = False

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        fs = list(filters)
        self._saw_filters = bool(fs)
        return iter(fs)  # ALL unsupported: Spark keeps the exact residual

    def partitions(self):
        if self._saw_filters:
            return [_Slice(0, N_FIRST)]
        return [_Slice(0, N_FIRST), _Slice(N_FIRST, N_FULL)]

    def read(self, part):
        for i in range(part.lo, part.hi):
            yield (i,)


class _ProbeSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pushdown_hazard_probe"

    def schema(self) -> str:
        return "k long"

    def reader(self, schema) -> _ProbeReader:
        return _ProbeReader()


def probe_hazard(spark) -> dict:
    """Run the three-action sequence on ONE reused DataFrame and
    report the counts. ``hazard_present`` is True when the final
    filterless count replays the pruned plan (Spark 4.1 behavior)."""
    spark.dataSource.register(_ProbeSource)
    d = spark.read.format("pushdown_hazard_probe").load()
    full_before = d.count()
    filtered = d.filter("k < %d" % N_FIRST).count()
    full_after = d.count()  # 4.1.2: returns N_FIRST, not N_FULL
    return {
        "spark_version": spark.version,
        "full_before": full_before,
        "filtered": filtered,
        "full_after": full_after,
        "hazard_present": full_after != N_FULL,
    }


if __name__ == "__main__":
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("hazard-repro")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    r = probe_hazard(spark)
    assert r["full_before"] == N_FULL and r["filtered"] == N_FIRST, r
    if r["hazard_present"]:
        print(
            f"HAZARD PRESENT on Spark {r['spark_version']}: filterless count "
            f"on a reused DataFrame returned {r['full_after']} (expected "
            f"{N_FULL}) — the stale pruned plan was replayed."
        )
    else:
        print(
            f"HAZARD ABSENT on Spark {r['spark_version']}: reused-DataFrame "
            f"count is correct ({r['full_after']}). format('nimble') stats "
            f"pruning can return to DEFAULT-ON (see sources/datasource.py)."
        )
    spark.stop()
