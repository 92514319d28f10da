"""Learned encoding selection — LearnedEncodingSelectionPolicy
analogue (dwio/nimble/encodings/selection/EncodingSelectionPolicy.h:
339-365: offline-trained model over stream statistics; constants baked,
validated against measured outcomes).

The honest gate: the baked DEFAULT_ENCODING_MODEL must agree with the
MEASURED dictionary-on/off outcome (actual bytes on disk, both ways)
on clearly-separated held-out patterns, and the end-to-end
write_table_with_policy(learned_policy()) path must land the decision
in the manifest like any other policy.
"""

from __future__ import annotations

import pytest

from nimble_spark.sources.encoding_policy import (
    DEFAULT_ENCODING_MODEL,
    fit_encoding_model,
    learned_policy,
    measure_dictionary_outcomes,
    profile_columns,
    write_table_with_policy,
)


def test_default_model_matches_measured_outcomes(spark):
    """Held-out validation of the baked constants: uuid-like uniques
    must go no-dictionary, low-cardinality and long-run columns must
    keep it — as MEASURED by writing each both ways."""
    df = spark.range(60_000).selectExpr(
        "md5(CAST(id AS STRING)) AS uniq_str",
        "concat('segment_', CAST(id % 8 AS STRING)) AS low_card_str",
        "id DIV 2000 AS run_length_num",
        "id AS sequential_num",
    )
    outcomes = measure_dictionary_outcomes(df)
    assert len(outcomes) == 4
    wrong = [
        (p.name, label, DEFAULT_ENCODING_MODEL.score(p))
        for p, label in outcomes
        if DEFAULT_ENCODING_MODEL.predict_dictionary(p) != label
    ]
    assert not wrong, f"model disagrees with measured outcomes: {wrong}"


def test_fit_recovers_separable_labels(spark):
    """The trainer itself: fitting on measured outcomes must reach
    full agreement on its own (linearly separable) training set."""
    df = spark.range(30_000).selectExpr(
        "md5(CAST(id AS STRING)) AS u1",
        "CAST(id % 16 AS STRING) AS c1",
        "id % 64 AS c2",
        "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT) AS u2",
    )
    outcomes = measure_dictionary_outcomes(df)
    model = fit_encoding_model(outcomes)
    agree = sum(1 for p, l in outcomes if model.predict_dictionary(p) == l)
    assert agree == len(outcomes)


def test_learned_policy_end_to_end(spark, tmp_path):
    """write_table_with_policy(learned_policy()): decisions recorded
    in manifest metadata, high-NDV column actually written without a
    dictionary (SHOW ENCODING confirms)."""
    df = spark.range(50_000).selectExpr(
        "md5(CAST(id AS STRING)) AS doc_id",
        "CAST(id % 8 AS STRING) AS shard",
        "id AS seq",
    )
    path = f"{tmp_path}/learned"
    manifest, decision = write_table_with_policy(
        df, path, policy=learned_policy(), approx=False
    )
    assert "doc_id" in decision.no_dictionary_cols
    assert "shard" not in decision.no_dictionary_cols
    md = manifest["user_metadata"]
    assert "doc_id" in md["encoding_policy.no_dictionary_cols"]

    from nimble_spark import tools

    enc = {
        r["column"]: r["encodings"]
        for r in tools.show_encodings(spark, path).collect()
    }
    assert "PLAIN_DICTIONARY" not in enc["doc_id"] and "RLE_DICTIONARY" not in enc["doc_id"]
    assert "RLE_DICTIONARY" in enc["shard"] or "PLAIN_DICTIONARY" in enc["shard"]


def test_learned_and_rule_policy_agree_on_clear_cases(spark):
    """On unambiguous profiles the learned model and the rule policy
    must make the same call (the model refines the boundary, not the
    obvious cases)."""
    from nimble_spark.sources.encoding_policy import min_size_policy

    df = spark.range(40_000).selectExpr(
        "md5(CAST(id AS STRING)) AS unique_col",
        "CAST(id % 10 AS STRING) AS lowcard_col",
    )
    profiles = profile_columns(df, approx=False)
    learned = learned_policy()(profiles)
    ruled = min_size_policy()(profiles)
    assert set(learned.no_dictionary_cols) == set(ruled.no_dictionary_cols) == {"unique_col"}
