"""Registry-wide oracle dtype lint — the r7 red-row class, made
impossible to reintroduce.

Round 7 shipped three oracles whose output included a bare integer
``SUM(...)``.  DuckDB types that HUGEINT (int128); the driver
normalizes oracle results through pandas, where HUGEINT becomes
float64, so the value hash compared ``'499500.0'`` against Spark's
``'499500'`` and went red even though both engines computed the same
number (CORRECTNESS_r07: q_wide_5k_projection, q_fast_sum,
q_fast_grouped_sum).

This lint plans EVERY registered oracle under ``LIMIT 0`` (types only,
no data work) and asserts each output column's DuckDB type is in the
portable set — the types whose pandas image round-trips losslessly to
the same normalized string the Spark side produces.  Forbidden:
HUGEINT/UHUGEINT (→ float64), DECIMAL (→ object Decimal / float
depending on version), and any nested/list/struct type (hash-order
undefined).  A new oracle with a bare integer SUM (or a DECIMAL
literal) fails here in pytest, rounds before the driver ever sees it.

Fix pattern: wrap integer sums in ``CAST(... AS BIGINT)``; route
floating aggregates through functions/exact.py's lsum/dsum SQL.
"""

from __future__ import annotations

import pytest

from nimble_spark.registry import QUERIES, _load_all

# Types whose pandas normalization matches Spark's collected values.
# (INTEGER/SMALLINT/TINYINT widen to int64-compatible strings; DATE and
# TIMESTAMP str() identically from datetime64 and datetime objects.)
PORTABLE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
}


def _all_oracles():
    _load_all()
    return sorted((n, e.oracle) for n, e in QUERIES.items() if e.oracle is not None)


def test_every_query_has_an_oracle():
    # the repo's standing bar: zero rows-only checks
    _load_all()
    missing = [n for n, e in QUERIES.items() if e.oracle is None]
    assert missing == [], f"queries without oracles: {missing}"


def test_oracle_output_types_portable(duck):
    bad: list[tuple[str, str, str]] = []
    planned = 0
    for name, oracle in _all_oracles():
        rel = duck.sql(f"SELECT * FROM ({oracle}) __lint LIMIT 0")
        planned += 1
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) not in PORTABLE:
                bad.append((name, col, str(typ)))
    assert planned >= 283, f"lint only planned {planned} oracles — registry shrank?"
    assert bad == [], (
        "oracles produce non-portable DuckDB types (these normalize "
        "differently through the driver's pandas path than Spark's "
        "values do — wrap integer SUMs in CAST(... AS BIGINT), avoid "
        f"DECIMAL/HUGEINT): {bad}"
    )


def test_lint_catches_bare_integer_sum(duck):
    # prove the lint actually fires on the r7 bug shape
    rel = duck.sql("SELECT * FROM (SELECT SUM(range) AS s FROM range(10)) q LIMIT 0")
    assert str(rel.types[0]) == "HUGEINT" and "HUGEINT" not in PORTABLE


def test_harness_norm_matches_driver_pandas_view():
    """The internal differential harness must see DuckDB values the way
    the driver does (pandas), not the way fetchall() does — r7's
    internal-green/driver-red divergence."""
    import duckdb as _dd

    from harness.check_correctness import norm_cell

    pdf = _dd.sql("SELECT SUM(range) AS s FROM range(1000)").df()
    hugeint_cell = next(pdf.itertuples(index=False, name=None))[0]
    # HUGEINT arrives as float64 through pandas → normalizes with a
    # trailing '.0', which MUST differ from Spark's integer form
    assert norm_cell(hugeint_cell) != norm_cell(499500)
    # while a CAST ... AS BIGINT oracle normalizes identically
    pdf2 = _dd.sql(
        "SELECT CAST(SUM(range) AS BIGINT) AS s FROM range(1000)"
    ).df()
    bigint_cell = next(pdf2.itertuples(index=False, name=None))[0]
    assert norm_cell(bigint_cell) == norm_cell(499500)


@pytest.mark.parametrize(
    "name", ["q_wide_5k_projection", "q_fast_sum", "q_fast_grouped_sum"]
)
def test_r7_red_oracles_now_cast(duck, name):
    _load_all()
    rel = duck.sql(f"SELECT * FROM ({QUERIES[name].oracle}) __q LIMIT 0")
    for col, typ in zip(rel.columns, rel.types):
        assert str(typ) in PORTABLE, (name, col, str(typ))
