"""User-defined-function surface (SURVEY.md §2.6 UDF/UDAF/UDTF row):
the reference's extensibility is pluggable encodings/policies; the
engine-level equivalents in Spark are vectorized pandas UDFs (scalar),
applyInPandas (grouped UDAF), and Python UDTFs (table functions).

Each is demonstrated on a real pipeline task with a DuckDB oracle, so
the surface is differential-tested, not just smoke-tested:
- scalar pandas UDF: text normalization (Arrow-vectorized, the 10-100×
  path over row-at-a-time Python);
- grouped UDAF: per-group least-squares slope via numpy two-pass
  covariance (matches DuckDB regr_slope);
- UDTF: lateral explode of leading tokens with ordinal.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nimble_spark.registry import register
from nimble_spark.tables import load

_R4 = 10_000


@register(
    "q_pandas_udf_normalize",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_hash,
           LENGTH(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS n_chars
    FROM documents
    """,
    category="udf",
)
def q_pandas_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-batched): text normalization in
    vectorized pandas string ops. The hot path stays JVM-side (md5 /
    length on the normalized output); only the normalization crosses
    into Python, one Arrow batch at a time."""

    @F.pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)

    d = load(spark, sf_dir, "documents")
    norm = normalize("text")
    return d.select(
        "doc_id",
        F.md5(norm).alias("content_hash"),
        F.length(norm).cast("long").alias("n_chars"),
    )


@register(
    "q_grouped_udaf_slope",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           FLOOR((regr_slope(value, (epoch_ns(ts) // 1000) / 3600000000.0))
                 * 10000 + 0.5) / 10000 AS slope
    FROM events
    GROUP BY event_type
    """,
    category="udf",
)
def q_grouped_udaf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via applyInPandas: per-event-type least-squares
    slope of value over time (hours), computed with the two-pass
    covariance formula in numpy — the custom-aggregate surface. Groups
    shard by key across executors; each group's batch fits memory."""

    def slope_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy()
        y = pdf["value"].to_numpy()
        xc = x - x.mean()
        sl = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "slope": [math.floor(sl * _R4 + 0.5) / _R4],
            }
        )

    e = load(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.unix_micros("ts") / 3.6e9).alias("x"),
    )
    return e.groupBy("event_type").applyInPandas(
        slope_fn, "event_type string, n long, slope double"
    )


@register(
    "q_udtf_tokens",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    )
    SELECT doc_id,
           unnest(list_transform(range(least(5, len(toks))),
                  i -> {'tok_idx': i, 'token': toks[i + 1]}),
                  recursive := true)
    FROM t
    """,
    category="udf",
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) in a LATERAL join: explodes each
    document's first five tokens with their ordinal — the one-row-in,
    N-rows-out surface (fan-out decided per input row in Python)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok_idx: bigint, token: string")
    class LeadingTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.strip().split()[:5]):
                yield i, tok

    spark.udtf.register("nimble_leading_tokens", LeadingTokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("v_documents")
    return spark.sql(
        "SELECT d.doc_id, t.tok_idx, t.token "
        "FROM v_documents d, LATERAL nimble_leading_tokens(d.text) t"
    )
