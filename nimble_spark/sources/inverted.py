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
        .distinct()
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
