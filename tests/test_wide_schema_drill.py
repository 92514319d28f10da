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
import pytest

# Long-running fuzz/soak/drill tier: excluded from the driver-window
# default run (pytest.ini addopts); the FULL suite (-m "") remains the
# builder's round-exit gate.
pytestmark = pytest.mark.slow


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


def test_flatmap_10k_keys_sharded(spark, tmp_path):
    """r8 drill (r7 verdict #8): 10,000 dynamic keys — 20× the r6
    drill, on the road to the reference's 200k cap
    (velox/NimbleConfig.h:27). At this width the layout shards
    vertically into key groups (the substrate's parquet writer cost is
    per-column: ~165 s for one 20k-column file vs ~28 s for 10 sharded
    2k-column groups, measured r8), and a 3-key projected read must
    (a) open only the owning groups, (b) carry only the requested
    streams in every ReadSchema, and (c) round-trip values with inMap
    presence intact."""
    from nimble_spark.sources.flatmap import read_flatmap_table, write_flatmap_table

    n_keys, n_rows = 10_000, 100
    src = str(tmp_path / "src")
    # the map arrives FROM STORAGE (one compact constructor expression),
    # the realistic ingest shape — an inline create_map literal of 20k
    # child expressions would blow up the optimizer, not the engine
    spark.range(n_rows).coalesce(4).selectExpr(
        "id",
        f"map_from_arrays("
        f"transform(sequence(0,{n_keys - 1}), i -> concat('k', lpad(CAST(i AS STRING),5,'0'))), "
        f"transform(sequence(0,{n_keys - 1}), i -> id*1000 + CAST(i AS BIGINT))) AS feat",
    ).write.parquet(src)
    df = spark.read.parquet(src)

    path = str(tmp_path / "fm10k")
    t0 = time.time()
    keys = write_flatmap_table(df, "feat", path, row_key="id")
    print(f"# flatmap 10k-key sharded write {time.time() - t0:.1f}s", file=sys.stderr)
    assert len(keys) == n_keys
    # 10 groups of 1000 keys on disk, plus the base table
    import os

    groups = sorted(d for d in os.listdir(path) if d.startswith("fmgroup="))
    assert len(groups) == 10 and os.path.isdir(os.path.join(path, "base"))

    picked = ["k00007", "k05000", "k09999"]  # spans 3 of the 10 groups
    t1 = time.time()
    out = read_flatmap_table(spark, path, "feat", keys=picked)
    rows = out.orderBy("id").limit(3).collect()
    print(f"# flatmap 3-of-10k projected read {time.time() - t1:.1f}s", file=sys.stderr)
    for r in rows:
        assert set(r["feat"].keys()) == set(picked)
        assert r["feat"]["k05000"] == r["id"] * 1000 + 5000

    saved = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "1048576")
    try:
        p = plan_string(read_flatmap_table(spark, path, "feat", keys=picked))
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", saved)
    schemas = _read_schemas(p)
    assert schemas
    # no unprojected stream reaches ANY scan — not the picked groups'
    # sibling keys, not the untouched groups' keys
    for s in schemas:
        for other in ("feat__k00001", "feat__k01000", "feat__k04999",
                      "feat__k08000", "feat__k09998"):
            assert other not in s, s


def test_flatmap_sharded_requires_row_key(spark, tmp_path):
    from nimble_spark.sources.flatmap import write_flatmap_table

    df = spark.range(10).selectExpr(
        "id",
        "map_from_arrays(transform(sequence(0,30), i -> CAST(i AS STRING)), "
        "transform(sequence(0,30), i -> id + CAST(i AS BIGINT))) AS feat",
    )
    with __import__("pytest").raises(ValueError, match="row_key"):
        write_flatmap_table(df, "feat", str(tmp_path / "t"), keys_per_group=10)
    # and with a row key, small groups shard fine
    keys = write_flatmap_table(
        df, "feat", str(tmp_path / "t2"), row_key="id", keys_per_group=10
    )
    assert len(keys) == 31


def test_flatmap_append_both_layouts(spark, tmp_path):
    """r8: appends to flat-map tables — batch keys must be a subset of
    the persisted set (new keys refuse with the rewrite remedy); keys
    absent from the batch store as ABSENT (inMap=false), and sharded
    appends land group tables before base (crash → invisible debris,
    never a visible row with silently-missing keys)."""
    import pytest

    from nimble_spark.sources.flatmap import read_flatmap_table, write_flatmap_table

    def mkdf(lo, hi, keys_expr):
        return spark.range(lo, hi).selectExpr("id", f"{keys_expr} AS feat")

    # ---- single-table layout
    path = str(tmp_path / "single")
    full = "map_from_arrays(array('a','b','c'), array(id, id*2, id*3))"
    write_flatmap_table(mkdf(0, 20, full), "feat", path)
    # append a batch that only carries keys a,b — c must come back absent
    partial = "map_from_arrays(array('a','b'), array(id, id*2))"
    write_flatmap_table(mkdf(20, 30, partial), "feat", path, mode="append")
    back = read_flatmap_table(spark, path, "feat")
    assert back.count() == 30
    r = back.filter("id = 25").collect()[0]
    assert set(r["feat"].keys()) == {"a", "b"}  # c absent, not null
    r0 = back.filter("id = 5").collect()[0]
    assert r0["feat"]["c"] == 15
    # a new key refuses with the remedy
    with pytest.raises(ValueError, match="rewrite the table"):
        write_flatmap_table(
            mkdf(30, 31, "map_from_arrays(array('zz'), array(id))"),
            "feat", path, mode="append",
        )

    # ---- sharded layout
    sh = str(tmp_path / "sharded")
    wide = (
        "map_from_arrays(transform(sequence(0,39), i -> concat('k', lpad(CAST(i AS STRING),3,'0'))), "
        "transform(sequence(0,39), i -> id*100 + CAST(i AS BIGINT)))"
    )
    write_flatmap_table(mkdf(0, 10, wide), "feat", sh, row_key="id", keys_per_group=10)
    write_flatmap_table(mkdf(10, 15, wide), "feat", sh, mode="append")
    out = read_flatmap_table(spark, sh, "feat", keys=["k005", "k035"])
    assert out.count() == 15
    r = out.filter("id = 12").collect()[0]
    assert r["feat"]["k035"] == 12 * 100 + 35
    with pytest.raises(ValueError, match="rewrite the table"):
        write_flatmap_table(
            mkdf(15, 16, "map_from_arrays(array('zz'), array(id))"),
            "feat", sh, mode="append",
        )
