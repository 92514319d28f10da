"""Inverted text index: a token → doc_id posting-list sidecar.

The reference's index family (ClusterIndex/HashIndex/SortedIndex/
BloomFilter, dwio/nimble/index/) serves point lookups on KEY columns;
an LLM-corpus engine also needs lookups INTO text — "which documents
contain this token" — without scanning every document. The sidecar
is itself a nimble table (posting rows clustered by token), so a
token probe reuses the cluster index machinery: manifest min/max
prunes posting files to the one(s) covering the token, and only
those postings are read.

Scale: the posting build is one explode + distinct (shuffle carries
(token, doc_id) pairs, never text); the sidecar is ~Σ|distinct tokens
per doc| rows — a fraction of corpus bytes. Probes read O(posting
list) + O(matched docs). Multi-token AND/OR compose as joins of
posting scans before any document is touched."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nimble_spark.sources.table import WriteOptions, read_table, write_table

INVERTED_DIR = "_nimble/index/inverted"


def build_inverted_index(
    spark: SparkSession, path: str, col: str = "text", key: str = "doc_id"
) -> dict:
    """Build the token→key posting sidecar for a stored documents
    table (whitespace tokens, exact match; swap the tokenizer
    expression for stemming/case-folding variants). Returns the
    sidecar manifest."""
    docs = read_table(spark, path)
    postings = (
        docs.select(key, F.explode(F.split(F.trim(F.col(col)), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token", key)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    out = os.path.join(path, INVERTED_DIR, col)
    return write_table(postings, out, WriteOptions(cluster_by=["token"]))


def lookup_token(
    spark: SparkSession, path: str, token: str, col: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Documents containing ``token``: probe the posting sidecar with
    a cluster-pruned point scan (only posting files whose token range
    covers the probe are read), then semi-join the doc table on the
    key — document text is only read for matching docs."""
    side = os.path.join(path, INVERTED_DIR, col)
    posting = read_table(spark, side, range_scan=("token", token, token)).select(key)
    return read_table(spark, path).join(posting, key, "left_semi")


def search_ranked(
    spark: SparkSession,
    path: str,
    tokens: list[str],
    col: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """TF-IDF-style ranked multi-token search (OR semantics): score(d)
    = Σ_t tf(d,t) · N/df(t) over the query tokens. Everything derives
    from pruned posting scans — tf rides the posting rows, df is a
    per-token aggregate of the same scan, N is a one-row broadcast —
    document text is never read for scoring. Rational idf (N/df, no
    log) keeps the score engine-portable; it is monotone in the usual
    ln(N/df) for ranking purposes."""
    side = os.path.join(path, INVERTED_DIR, col)
    posts = None
    for t in tokens:
        p = read_table(spark, side, range_scan=("token", t, t))
        posts = p if posts is None else posts.unionByName(p)
    dfreq = posts.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = read_table(spark, path).agg(F.count(F.lit(1)).alias("n"))
    scored = (
        posts.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            key,
            (
                F.col("tf").cast("double")
                * (F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("part"),
        )
        .groupBy(key)
        .agg(F.sum(F.floor(F.col("part") * 10000 + F.lit(0.5)).cast("bigint")).alias("sq"))
    )
    return scored.select(key, (F.col("sq").cast("double") / 10000).alias("score"))
