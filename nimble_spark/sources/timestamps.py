"""TimestampMicroNano — the reference's two-stream timestamp split.

Nimble stores a nanosecond timestamp as TWO streams: a micros value
stream plus a nanos-residual stream (kind ``TimestampMicroNano``,
dwio/nimble/velox/LayoutPlanner.cpp:43-48; writer
dwio/nimble/velox/FieldWriter.cpp:514). Spark's TimestampType is
micros-only, so a Spark-native table preserves full nanosecond
precision the same way the reference does physically: a ``<col>_us``
TimestampType column (queryable, prunable, comparable — the "value")
and a ``<col>_nanos`` ShortType residual column (0..999, the sidecar
stream). The residual column is dictionary/RLE-friendly — mostly 0 in
real data — exactly the shape the reference's encoding selection
exploits.

``split``/``restore`` are exact inverses for any int64 epoch-nanos
value; all arithmetic is integer JVM-side (no UDFs, no doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US = "_us"
NS = "_nanos"


def split_timestamp_nanos(df: DataFrame, ns_col: str, out_prefix: str | None = None) -> DataFrame:
    """Split an int64 epoch-nanoseconds column into the two-stream
    form: ``{p}_us`` (TimestampType, micros floor) + ``{p}_nanos``
    (ShortType residual 0..999). Uses floor division so negative
    (pre-epoch) nanos keep a non-negative residual — the identity
    ``ns = unix_micros(us)*1000 + residual`` holds for all inputs."""
    p = out_prefix or ns_col
    ns = F.col(ns_col)
    # All-integer arithmetic: floor(ns / 1000.0) loses ULPs above 2^53
    # (any modern epoch-nanos ≈ 1.7e18), shifting the micros stream by
    # 1µs and pushing the residual outside 0..999. pmod keeps the
    # residual non-negative for pre-epoch values, and `div` on the
    # exact multiple (ns - resid) is integer division — exact for the
    # full int64 range.
    resid = F.pmod(ns, F.lit(1000))
    micros = F.expr(f"(`{ns_col}` - pmod(`{ns_col}`, 1000)) div 1000")
    return df.withColumn(p + US, F.timestamp_micros(micros)).withColumn(
        p + NS, resid.cast("short")
    ).drop(ns_col)


def restore_timestamp_nanos(df: DataFrame, prefix: str, out_col: str | None = None) -> DataFrame:
    """Recombine the two streams into exact int64 epoch-nanos."""
    out = out_col or prefix
    ns = F.unix_micros(F.col(prefix + US)) * 1000 + F.col(prefix + NS).cast("long")
    return df.withColumn(out, ns).drop(prefix + US, prefix + NS)
