"""Order-independent exact aggregation helpers.

Summing doubles is order-dependent in the last ULP; Spark's partial
aggregation order varies with partitioning while DuckDB's differs
again — so ROUND(SUM(double),4) can flip a rounding boundary between
engines (observed: 73.9138 vs 73.9137 on a 10k-row window). The fix:
cast each row to DECIMAL(27,6) (exact, associative) before SUM, and
convert the exact total to double once at the end. The per-row cast
rounds the same input double under the same half-up rule on both
engines, so results are bit-identical regardless of execution order.

Bounds: 21 integer digits ≈ 1e21 total — room for 1e12 rows of 1e9
values; at larger scale widen the decimal, not the approach.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"
R4 = 4

# Portable rounding. ROUND(double, n) itself diverges between engines:
# the JVM rounds the shortest decimal string of the double (Spark's
# BigDecimal.valueOf → "73.91375" → 73.9138) while DuckDB rounds the
# binary value (73.9137499…  → 73.9137). FLOOR(x·10ⁿ + 0.5)/10ⁿ uses
# only IEEE ops, so both engines produce the same bits for the same
# input — round-half-up semantics, applied consistently everywhere.


def rnd(col: Column | str, scale: int = R4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    m = 10**scale
    return F.floor(c * m + F.lit(0.5)) / m


def rnd_sql(expr: str, scale: int = R4) -> str:
    m = 10**scale
    return f"FLOOR(({expr}) * {m} + 0.5) / {m}"


def dsum(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return rnd(F.sum(c.cast(DEC)).cast("double"))


def davg(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return rnd(F.sum(c.cast(DEC)).cast("double") / F.count(c))


def dsum_sql(expr: str) -> str:
    return rnd_sql(f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)")


def davg_sql(expr: str) -> str:
    return rnd_sql(f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) / COUNT({expr})")


# Scaled-int64 exact sums. The DECIMAL(27,6) path above relies on the
# JVM's double→decimal cast (BigDecimal.valueOf → shortest decimal
# string, then HALF_UP) agreeing with DuckDB's binary-value rounding —
# true for "decimal-ish" doubles (prices generated from 2-dp values)
# but NOT for arbitrary binary fractions: a float32-roundtripped
# 123456.78999996… casts to 123456.790000 on the JVM (shortest repr
# "123456.79") and 123456.789999 in DuckDB. FLOOR(x·10ⁿ + 0.5) uses
# only IEEE ops, so the scaled-long path is portable for ANY double.
# Bounds: |x|·10⁶ summed must stay under 2^63 ≈ 9.2e18 — ~9e12 rows
# of 1e6-scaled unit values; widen per-partition or split the scale
# before that.


def lsum(col: Column | str, scale: int = 6, out_scale: int = R4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    m = 10**scale
    total = F.sum(F.floor(c * m + F.lit(0.5)).cast("bigint")).cast("double") / m
    return rnd(total, out_scale)


def lsum_sql(expr: str, scale: int = 6, out_scale: int = R4) -> str:
    m = 10**scale
    return rnd_sql(
        f"CAST(SUM(CAST(FLOOR(({expr}) * {m} + 0.5) AS BIGINT)) AS DOUBLE) / {m}",
        out_scale,
    )
