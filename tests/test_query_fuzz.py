"""Whole-query random differential fuzz (pytest wrapper).

harness/query_fuzz.py generates seeded random SQL in the
Spark∩DuckDB portable dialect — six shapes (filter+order+limit,
group-agg, FK-join agg, window, IN-subquery, set ops) over typed
random expression trees — and runs the SAME string through both
engines, hash-comparing results. This is the relational widening of
tests/test_filter_fuzz.py (reference model:
velox/selective/tests/E2EFilterTest.cpp:851 — fixed data, generated
queries, two independent evaluations).

CI runs a fixed 48-seed band (deterministic — a red here replays with
`python harness/query_fuzz.py --n 1 --seed0 <seed>`); deep soaks run
the CLI (900 seeds green at the time of writing).
"""

from __future__ import annotations

import duckdb
import pytest

from harness.query_fuzz import (
    SCHEMAS,
    QueryGen,
    build_pools,
    register_views,
    run_fuzz,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fuzz_env(spark):
    con = duckdb.connect()
    register_views(spark, con, SF, via="parquet")
    yield spark, con
    con.close()


@pytest.mark.parametrize("band", [0, 1, 2, 3, 4, 5])
def test_fuzz_band(fuzz_env, band):
    """8 seeds per shape-aligned band; seeds 0..47 overall."""
    spark, con = fuzz_env
    failures = run_fuzz(
        spark, con, n=8, seed0=band * 8, verbose=False
    )
    assert not failures, "\n".join(
        f"seed={s} shape={sh}: {d}\nSQL: {q}" for s, sh, q, d in failures
    )


def test_fuzz_band_via_nimble_connector(spark, tmp_path):
    """Eight seeds with Spark reading format('nimble') tables while
    DuckDB reads the original parquet: same SQL, so any divergence is
    a CONNECTOR bug (schema/type drift, lost rows in the DS read
    path), not a dialect one. Tables are written fresh into tmp_path
    (the CLI run caches under /tmp for deep soaks)."""
    con = duckdb.connect()
    register_views(spark, con, SF, via="nimble", cache_dir=str(tmp_path))
    failures = run_fuzz(spark, con, n=8, seed0=900, verbose=False)
    con.close()
    assert not failures, "\n".join(
        f"seed={s} shape={sh}: {d}\nSQL: {q}" for s, sh, q, d in failures
    )


def test_generator_deterministic():
    """Same seed → same SQL (replayability is the debugging contract)."""
    pools = {t: {} for t in SCHEMAS}
    a = QueryGen(1234, pools).gen("group_agg")
    b = QueryGen(1234, pools).gen("group_agg")
    assert a == b


def test_generator_portable_surface():
    """The emitted SQL never contains the documented-divergent
    constructs (double SUM/AVG, division, CONCAT(), ROUND)."""
    pools = {t: {} for t in SCHEMAS}
    for seed in range(200):
        g = QueryGen(seed, pools)
        _, sql = g.gen()
        up = sql.upper()
        assert " / " not in up and "CONCAT(" not in up and "ROUND(" not in up
        assert "AVG(" not in up
        # every SUM is integer-typed and BIGINT-cast (HUGEINT fence)
        i = 0
        while True:
            i = up.find("SUM(", i)
            if i < 0:
                break
            assert up[max(0, i - 5):i].endswith("CAST(") or up[:i].rstrip().endswith("CAST"), sql
            i += 4
