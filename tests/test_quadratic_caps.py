"""Hot-cell skew caps for the two formerly-uncapped quadratic
operators (round-4 verdict items 2 & 3): fuzzy_prefix_pairs blocks and
semantic_dedup cells larger than the cap are excluded from pair
generation, so a boilerplate-heavy / under-clustered corpus cannot
turn one block into a B² straggler task. Same posture as
test_lsh_bucket_cap.py for MinHash-LSH."""

from __future__ import annotations

from nimble_spark.operators.corpus_pack import semantic_dedup
from nimble_spark.operators.dedup import fuzzy_prefix_pairs


def _fuzzy_corpus(spark):
    # 50 docs opening with identical boilerplate (one hot (lang, blk)
    # block) + one genuine near-dup pair with a distinctive prefix.
    boiler = [(i, "en", "Copyright 2024 Example Corp. All rights reserved.") for i in range(50)]
    pair = [
        (1000, "en", "ZQXJKVBWP unique opening sentence here"),
        (1001, "en", "ZQXJKVBWQ unique opening sentence here"),  # dist 1
    ]
    return spark.createDataFrame(boiler + pair, "doc_id long, lang string, text string")


def test_fuzzy_hot_block_excluded(spark):
    docs = _fuzzy_corpus(spark)
    pairs = fuzzy_prefix_pairs(docs, block_cap=32).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    # the 50-doc boilerplate block (> cap) contributes no pairs
    assert all(a >= 1000 for a, _ in ids), ids
    # the 2-doc block survives and verifies at distance 1
    assert (1000, 1001) in ids
    assert {r["dist"] for r in pairs if r["id_a"] == 1000} == {1}


def test_fuzzy_cap_disabled_finds_boilerplate(spark):
    docs = _fuzzy_corpus(spark)
    n = fuzzy_prefix_pairs(docs, block_cap=1_000_000).count()
    assert n == 50 * 49 // 2 + 1


def test_fuzzy_cap_boundary_inclusive(spark):
    docs = _fuzzy_corpus(spark)
    # block of exactly cap docs is kept
    assert fuzzy_prefix_pairs(docs, block_cap=50).count() == 50 * 49 // 2 + 1
    assert fuzzy_prefix_pairs(docs, block_cap=49).count() == 1


def _emb_corpus(spark):
    # label 7: 40 identical vectors (an under-clustered hot cell);
    # label 1: a 3-vector cell with one near-duplicate pair.
    rows = [(i, 7, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    rows += [
        (100, 1, [0.0, 1.0, 0.0, 0.0]),
        (101, 1, [0.0, 0.999, 0.01, 0.0]),  # cosine ≈ 1 vs 100
        (102, 1, [0.0, 0.0, 0.0, 1.0]),     # orthogonal
    ]
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")


def test_semantic_dedup_hot_cell_excluded(spark):
    out = {r["vec_id"]: r for r in semantic_dedup(_emb_corpus(spark), cell_cap=32).collect()}
    assert len(out) == 43  # every vector passes through exactly once
    # oversized cell: no pair generation → nothing dropped
    assert all(out[i]["dropped"] == 0 and out[i]["max_lower_sim"] == -1.0 for i in range(40))
    # small cell still dedups: 101 dropped against 100, 102 kept
    assert out[101]["dropped"] == 1
    assert out[100]["dropped"] == 0
    assert out[102]["dropped"] == 0


def test_semantic_dedup_cap_disabled_drops_in_hot_cell(spark):
    out = {r["vec_id"]: r for r in semantic_dedup(_emb_corpus(spark), cell_cap=10_000).collect()}
    # uncapped: the 39 clones above vec 0 are all dropped
    assert sum(out[i]["dropped"] for i in range(40)) == 39
    assert out[0]["dropped"] == 0
