"""LSH hot-bucket skew cap: a boilerplate-heavy corpus (many identical
documents collapsing into one band bucket) must not explode into B²
candidate pairs — oversized buckets are excluded from candidate
generation, while ordinary near-dup pairs in small buckets survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from nimble_spark.operators.dedup import (
    _md5_arrays_spark,
    _minhash_cols_spark,
    lsh_near_pairs,
)


def _sig_and_shingles(spark, docs):
    """docs: list[(doc_id, shingle-list)] → (signature df, shingle df)."""
    df = spark.createDataFrame(docs, "doc_id long, sh array<string>").coalesce(4)
    hashed = _md5_arrays_spark(df, ["doc_id"])
    sig = hashed.select("doc_id", *_minhash_cols_spark())
    return sig, df.select("doc_id", "sh")


def _boilerplate_corpus():
    # 80 identical docs (license-header boilerplate) + one genuine
    # near-dup pair with distinct content.
    boiler = [f"tok{i} tok{i+1} tok{i+2}" for i in range(10)]
    docs = [(i, boiler) for i in range(80)]
    pair_a = [f"uniq{i} uniq{i+1} x" for i in range(12)]
    pair_b = pair_a[:11] + ["changed tail y"]  # Jaccard 11/13 ≈ 0.846
    docs.append((1000, pair_a))
    docs.append((1001, pair_b))
    return docs


def test_oversized_bucket_excluded(spark):
    sig, sh = _sig_and_shingles(spark, _boilerplate_corpus())
    pairs = lsh_near_pairs(sig, sh, bucket_cap=64).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    # identical boilerplate docs all share every band bucket → bucket
    # size 80 > cap → none of the 80·79/2 = 3160 boilerplate pairs
    assert all(a >= 1000 for a, _ in ids), ids
    # the genuine near-dup pair lives in a 2-doc bucket and survives
    assert (1000, 1001) in ids


def test_cap_disabled_finds_boilerplate(spark):
    sig, sh = _sig_and_shingles(spark, _boilerplate_corpus())
    n = lsh_near_pairs(sig, sh, bucket_cap=1_000_000).count()
    # uncapped: all 3160 boilerplate pairs + the near-dup pair
    assert n == 80 * 79 // 2 + 1


def test_cap_boundary_inclusive(spark):
    # bucket of exactly `cap` docs is kept
    docs = [(i, ["a b c", "b c d", "c d e"]) for i in range(5)]
    sig, sh = _sig_and_shingles(spark, docs)
    assert lsh_near_pairs(sig, sh, bucket_cap=5).count() == 5 * 4 // 2
    assert lsh_near_pairs(sig, sh, bucket_cap=4).count() == 0
