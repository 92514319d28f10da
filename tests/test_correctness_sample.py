"""Differential correctness spot-checks against DuckDB at sf0.001
(the full sweep runs via harness/check_correctness.py at sf0.01 —
this keeps `pytest -q` fast while still exercising the compare path).
"""

from __future__ import annotations

import pytest

from harness.check_correctness import table_hash
from tests.conftest import SF_SMALL

SAMPLE = [
    "q1_pricing_summary",
    "q_join_semi",
    "q_window_rank",
    "q_sessionize",
    "q_asof_join",
    "q_dedup_exact",
    "q_minhash_signatures",
    "q_token_stats",
    "q_cosine_topk",
    "q_train_split",
    "q_doc_chunking",
    "q_embedding_covariance",
    # regression: the recluster fixture's narrow append must stay
    # narrow at sf0.001 too (a fixed 1500 threshold once covered the
    # whole 0..1499 key range there, making partial_ok legitimately 0)
    "q_incremental_recluster",
]


@pytest.mark.parametrize("name", SAMPLE)
def test_matches_oracle(spark, duck, name):
    from nimble_spark.registry import QUERIES, _load_all

    _load_all()
    e = QUERIES[name]
    assert e.oracle is not None
    sdf = e.fn(spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    res = duck.sql(e.oracle)
    drows = res.fetchall()
    dcols = [c.lower() for c in res.columns]
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert table_hash(srows, scols) == table_hash(drows, dcols)
