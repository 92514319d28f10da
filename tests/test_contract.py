"""Driver-contract smoke tests: entry() runs, every registered query
has a callable, every oracle parses in DuckDB."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL


def test_entry_runs(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable schema


def test_queries_registered(spark):
    import __spark_entry__ as ent

    qs = ent.queries()
    assert len(qs) >= 20
    oracles = ent.oracle_sql()
    # every oracle key is a query key
    assert set(oracles) <= set(qs)
    # the vast majority of queries must be oracle-checked
    assert len(oracles) >= 0.8 * len(qs)


def test_oracles_parse_in_duckdb(duck):
    import __spark_entry__ as ent

    failures = []
    for name, sql in ent.oracle_sql().items():
        try:
            duck.sql(sql)  # lazy relation — parses + binds, no exec
        except Exception as e:
            failures.append((name, str(e)[:200]))
    assert not failures, failures


def test_every_query_has_an_oracle():
    """Invariant earned in round 4: zero rows-only queries. Every
    registered operator carries a DuckDB oracle, so the driver's gate
    always produces a hard (rows+schema+hash) signal. A new query
    without an oracle fails here, not silently in the round report."""
    import __spark_entry__ as ent

    qs, os_ = ent.queries(), ent.oracle_sql()
    assert set(qs) == set(os_), sorted(set(qs) ^ set(os_))
    assert all(isinstance(s, str) and s.strip() for s in os_.values())


@pytest.mark.parametrize("name", ["q1_pricing_summary", "q_topk", "q_dedup_exact"])
def test_query_runs_small(spark, name):
    import __spark_entry__ as ent

    df = ent.queries()[name](spark, SF_SMALL)
    assert df.count() > 0
