"""Encoding-selection observability — the cost-model surface of the
reference's per-chunk encoding selection
(dwio/nimble/encodings/selection/EncodingSelectionPolicy.cpp: estimate
each candidate's encoded size from stream statistics, pick minimal
size × read-factor; EncodingSizeEstimation.h:43-150 for the per-
encoding estimators; tools/EncodingSelectionLogger.cpp for the
logging surface).

In the Spark mapping Parquet performs the actual encoding choice
inside the writer, so the *selection* itself is delegated — what this
module surfaces is the reference's observability contract: the same
statistics-driven size ESTIMATES per candidate encoding, the
predicted winner, and the ACTUAL encoding + encoded bytes from the
written footers, side by side. Disagreements (predicted dictionary,
actual plain) are exactly the signal the reference's logger exists to
catch.

Statistics are computed in ONE distributed aggregation over the
table (exact NDV per column — at 100 TB swap ``countDistinct`` for
``approx_count_distinct``, the estimates tolerate ±2% error).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pa_pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nimble_spark.sources.table import read_manifest

_WIDTHS = {
    T.LongType: 8, T.DoubleType: 8, T.TimestampType: 8,
    T.IntegerType: 4, T.FloatType: 4, T.DateType: 4,
    T.ShortType: 2, T.ByteType: 1, T.BooleanType: 1,
}


def _bits(n: int) -> int:
    return max(1, (int(n) - 1).bit_length()) if n and n > 0 else 1


def encoding_report(spark: SparkSession, path: str) -> DataFrame:
    """Per column: candidate-encoding size estimates from one stats
    pass, the predicted (min-size) encoding, and the parquet-actual
    encodings + encoded bytes from the footers."""
    from nimble_spark.sources.table import _scan_manifest_files

    manifest = read_manifest(path)
    df = _scan_manifest_files(spark, path, manifest)
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = [
        c for c, t in schema.items()
        if type(t) in _WIDTHS or isinstance(t, T.StringType)
    ]
    if not cols:
        return spark.createDataFrame(
            [], "column STRING, n BIGINT, ndv BIGINT, plain_bytes BIGINT, "
                "dict_bytes BIGINT, fbw_bytes BIGINT, constant_bytes BIGINT, "
                "predicted STRING, predicted_bytes BIGINT, "
                "actual_encodings STRING, actual_bytes BIGINT",
        )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.countDistinct(c).alias(f"{c}::ndv"))
        if isinstance(schema[c], T.StringType):
            aggs.append(F.sum(F.length(c)).alias(f"{c}::bytes"))
        elif not isinstance(schema[c], (T.DoubleType, T.FloatType, T.BooleanType,
                                        T.TimestampType, T.DateType)):
            aggs.append(F.min(c).alias(f"{c}::min"))
            aggs.append(F.max(c).alias(f"{c}::max"))
    stats = df.agg(*aggs).first().asDict()
    n = stats["__n"]

    # actual per-column encoded size + encodings from the footers
    actual: dict[str, list] = {c: [0, set()] for c in cols}
    for finfo in manifest["files"]:
        md = pa_pq.ParquetFile(os.path.join(path, finfo["path"])).metadata
        for rg_i in range(md.num_row_groups):
            rg = md.row_group(rg_i)
            for ci in range(rg.num_columns):
                col = rg.column(ci)
                name = col.path_in_schema.split(".")[0]
                if name in actual:
                    actual[name][0] += col.total_compressed_size
                    actual[name][1].update(str(e) for e in col.encodings)

    rows = []
    for c in cols:
        ndv = int(stats.get(f"{c}::ndv") or 0)
        t = schema[c]
        if isinstance(t, T.StringType):
            data_bytes = int(stats.get(f"{c}::bytes") or 0)
            plain = data_bytes + 4 * n  # values + offsets
            avg_len = data_bytes // max(ndv, 1)
            dict_est = ndv * (avg_len + 4) + (n * _bits(ndv) + 7) // 8
            fbw = None
        else:
            w = _WIDTHS[type(t)]
            plain = n * w
            dict_est = ndv * w + (n * _bits(ndv) + 7) // 8
            lo, hi = stats.get(f"{c}::min"), stats.get(f"{c}::max")
            fbw = (
                (n * _bits(int(hi) - int(lo) + 1) + 7) // 8
                if lo is not None and hi is not None and not isinstance(t, (T.DoubleType, T.FloatType))
                else None
            )
        constant = 8 if ndv <= 1 else None
        cands = {"plain": plain, "dictionary": dict_est}
        if fbw is not None:
            cands["fixed_bit_width"] = fbw
        if constant is not None:
            cands["constant"] = constant
        predicted = min(cands, key=cands.get)
        rows.append(
            (
                c, n, ndv, plain, dict_est, fbw, constant,
                predicted, cands[predicted],
                ",".join(sorted(actual[c][1])), actual[c][0],
            )
        )
    return spark.createDataFrame(
        rows,
        "column STRING, n BIGINT, ndv BIGINT, plain_bytes BIGINT, "
        "dict_bytes BIGINT, fbw_bytes BIGINT, constant_bytes BIGINT, "
        "predicted STRING, predicted_bytes BIGINT, "
        "actual_encodings STRING, actual_bytes BIGINT",
    )
