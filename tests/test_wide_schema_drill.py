"""Reference-scale wide-schema drill (r7 verdict #6): the reference
targets feature tables with THOUSANDS of columns (README.md:21-24) and
caps flat-maps at 200k keys (velox/NimbleConfig.h:27). These tests pin
the two properties that make that width workable on Spark/parquet:

- a 5,000-physical-column table writes under bounded memory and a
  3-column projected read's parquet ReadSchema carries ONLY the
  projected fields (IO scales with the projection, not the schema);
- a flat-map column projects per-KEY: reading 3 of 500 map keys scans
  3 physical streams, never the other 497.
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

from nimble_spark.plans.audit import plan_string
from tests.conftest import SF_SMALL


def _read_schemas(plan: str) -> list[str]:
    """The struct<...> tokens of every ReadSchema in the plan — just
    the schema, never trailing plan text (which contains 'plan_id')."""
    out = []
    for seg in plan.split("ReadSchema: ")[1:]:
        out.append(seg.split(">", 1)[0] + ">")
    return out


def test_wide_5k_write_and_projected_read(spark):
    from nimble_spark.operators.format_surface import (
        _W5K_PROJ,
        _W5K_ROWS,
        q_wide_5k_projection,
    )

    t0 = time.time()
    df = q_wide_5k_projection(spark, SF_SMALL)  # builds the cache on miss
    row = df.collect()[0]
    t_total = time.time() - t0
    print(f"# wide5k first-call (build+read) {t_total:.1f}s", file=sys.stderr)

    # closed-form check (the same arithmetic the DuckDB oracle runs)
    assert row["n"] == _W5K_ROWS
    for i in _W5K_PROJ:
        assert row[f"s_f{i:04d}"] == sum(
            (k * 31 + i) % 1000 for k in range(_W5K_ROWS)
        )

    # warm read: ReadSchema must carry exactly the 3 projected fields
    t1 = time.time()
    p = plan_string(q_wide_5k_projection(spark, SF_SMALL))
    print(f"# wide5k warm projected read {time.time() - t1:.1f}s", file=sys.stderr)
    schemas = _read_schemas(p)
    assert schemas, p
    for s in schemas:
        for i in _W5K_PROJ:
            assert f"f{i:04d}" in s, s
        # none of the other 4,997 columns reach the scan
        for other in ("f0000", "f0001", "f1000", "f2499", "f4999", "id:"):
            assert other not in s, s


def test_wide_flatmap_per_key_projection(spark, tmp_path):
    from nimble_spark.sources.flatmap import read_flatmap_table, write_flatmap_table

    n_keys, n_rows = 500, 200
    keys = [f"k{i:03d}" for i in range(n_keys)]
    m = F.create_map(
        *[x for i, k in enumerate(keys) for x in (F.lit(k), F.col("id") * 1000 + i)]
    )
    df = spark.range(n_rows).select("id", m.alias("feat"))
    path = str(tmp_path / "fm")
    got_keys = write_flatmap_table(df, "feat", path)
    assert got_keys == keys

    picked = ["k007", "k250", "k499"]
    out = read_flatmap_table(spark, path, "feat", keys=picked)
    # explain truncates metadata strings at 100 chars by default, which
    # would hide columns from the assertion either way — widen it
    saved = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "65536")
    try:
        p = plan_string(out)
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", saved)
    schemas = _read_schemas(p)
    assert schemas, p
    for s in schemas:
        for k in picked:
            assert f"feat__{k}" in s, s
        for other in ("feat__k000", "feat__k100", "feat__k251", "feat__k498"):
            assert other not in s, s  # unprojected streams never scanned

    rows = out.orderBy("id").limit(3).collect()
    for r in rows:
        assert set(r["feat"].keys()) == set(picked)
        assert r["feat"]["k250"] == r["id"] * 1000 + 250
