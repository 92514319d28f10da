"""Table properties (TBLPROPERTIES analogue) — r9.

Free-form string pairs plus the reserved ``nimble.*`` engine knobs,
committed through either discipline (table lock or the lock-free CAS
publish), surfaced through the DSL, and — for the reserved keys —
actually consumed by the engine (vacuum retention)."""

from __future__ import annotations

import os
import time

import pytest

from nimble_spark.sources.compaction import vacuum_table
from nimble_spark.sources.table import (
    WriteOptions,
    set_table_property,
    table_properties,
    unset_table_property,
    write_table,
)


@pytest.fixture
def tbl(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark.range(0, 20).selectExpr("id AS k"), path, WriteOptions())
    return path


def test_set_get_unset_roundtrip(tbl):
    # CAS first: the first root mutation stamps the table's commit
    # discipline (r10); subsequent lock-API calls auto-route to it
    set_table_property(tbl, "team.contact", "row-crew", optimistic=True)
    set_table_property(tbl, "owner", "data-eng")
    assert table_properties(tbl) == {
        "owner": "data-eng", "team.contact": "row-crew",
        "nimble.commit.root_discipline": "cas",
    }
    set_table_property(tbl, "owner", "ml-infra")  # overwrite
    assert table_properties(tbl)["owner"] == "ml-infra"
    unset_table_property(tbl, "team.contact", optimistic=True)
    assert table_properties(tbl) == {
        "owner": "ml-infra", "nimble.commit.root_discipline": "cas",
    }
    with pytest.raises(ValueError, match="no property"):
        unset_table_property(tbl, "team.contact")


def test_reserved_namespace_typo_refuses(tbl):
    """A nimble.* key the engine doesn't consume is a typo that would
    silently configure nothing — refuse loudly."""
    with pytest.raises(ValueError, match="unknown reserved"):
        set_table_property(tbl, "nimble.vacum.min_age_s", "0")
    with pytest.raises(ValueError, match="strings"):
        set_table_property(tbl, "owner", 42)  # type: ignore[arg-type]


def test_vacuum_retention_property_is_consumed(tbl):
    """The functional knob: fresh debris survives an argument-less
    vacuum under the 600 s default grace, and is reclaimed once the
    table carries nimble.vacuum.min_age_s='0'. An explicit argument
    still wins over the property."""
    debris = os.path.join(tbl, "zz-debris.parquet")
    with open(debris, "wb") as fh:
        fh.write(b"junk")
    assert vacuum_table(tbl) == []  # default grace: too fresh
    set_table_property(tbl, "nimble.vacuum.min_age_s", "0")
    with open(debris, "wb") as fh:
        fh.write(b"junk")
    assert vacuum_table(tbl) == ["zz-debris.parquet"]  # property-driven
    # explicit argument overrides the property
    set_table_property(tbl, "nimble.vacuum.min_age_s", "99999")
    with open(debris, "wb") as fh:
        fh.write(b"junk")
    old = time.time() - 10
    os.utime(debris, (old, old))
    assert vacuum_table(tbl, min_age_s=0.0) == ["zz-debris.parquet"]


def test_properties_on_sharded_manifest_rewrite(spark, tmp_path, monkeypatch):
    """Sharded root: the property carry across a full rewrite must be
    a ROOT-ONLY republish (pages reused, file entries intact) — a
    naive repagination-with-missing-files would publish an empty
    table."""
    import nimble_spark.sources.table as tblmod
    from nimble_spark.sources.deletes import compact_deletes, delete_rows
    from nimble_spark.sources.table import read_table

    monkeypatch.setattr(tblmod, "SHARD_FILE_THRESHOLD", 2)
    monkeypatch.setattr(tblmod, "MANIFEST_PAGE_SIZE", 2)
    path = str(tmp_path / "sh")
    write_table(spark.range(0, 30).selectExpr("id AS k"), path, WriteOptions())
    write_table(
        spark.range(30, 60).selectExpr("id AS k"), path, WriteOptions(),
        mode="append",
    )
    set_table_property(path, "owner", "data-eng")
    assert read_table(spark, path).count() == 60
    delete_rows(spark, path, "k", [1])
    compact_deletes(spark, path)
    assert table_properties(path).get("owner") == "data-eng"
    assert read_table(spark, path).count() == 59  # entries survived


def test_maintenance_knob_properties_consumed(spark, tmp_path):
    """r9: run_maintenance's None defaults resolve from the table's
    reserved properties — with nimble.compact.target_file_bytes=1 the
    small files are no longer 'small' and the compact step is skipped;
    with the default (128 MiB) it runs."""
    from nimble_spark.sources.compaction import run_maintenance

    def _mk(name):
        p = str(tmp_path / name)
        for i in range(4):  # four small files
            write_table(
                spark.range(i * 10, (i + 1) * 10).coalesce(1).selectExpr("id AS k"),
                p, WriteOptions(), mode="append" if i else "overwrite",
            )
        return p

    a = _mk("a")
    done = run_maintenance(spark, a)  # property-less: default target
    assert any(d["action"] == "compact_table" for d in done), done

    b = _mk("b")
    set_table_property(b, "nimble.compact.target_file_bytes", "1")
    done = run_maintenance(spark, b)  # 1-byte target: nothing is small
    assert not any(d["action"] == "compact_table" for d in done), done


def test_dsl_properties_surface(spark, tbl):
    from nimble_spark.tools import run_command

    run_command(spark, tbl, "SET PROPERTY owner = 'data-eng'")
    run_command(spark, tbl, "SET PROPERTY nimble.vacuum.min_age_s = 0")
    rows = {
        r["key"]: r["value"]
        for r in run_command(spark, tbl, "SHOW PROPERTIES").collect()
    }
    assert rows == {
        "owner": "data-eng",
        "nimble.vacuum.min_age_s": "0",
        # the first SET stamped the commit discipline (r10) — visible
        # in the bag by design, like any Iceberg reserved property
        "nimble.commit.root_discipline": "lock",
    }
    run_command(spark, tbl, "UNSET PROPERTY owner")
    assert run_command(spark, tbl, "SHOW PROPERTIES").count() == 2


def test_properties_survive_data_commits(spark, tbl):
    """Root-only properties ride through data commits and compaction
    untouched (the manifest merge carries the bag forward)."""
    from nimble_spark.sources.compaction import compact_table

    from nimble_spark.sources.deletes import compact_deletes, delete_rows
    from nimble_spark.sources.merge import update_where

    set_table_property(tbl, "owner", "data-eng")
    write_table(
        spark.range(20, 40).selectExpr("id AS k"), tbl, WriteOptions(),
        mode="append",
    )
    assert table_properties(tbl).get("owner") == "data-eng", "append dropped it"
    compact_table(spark, tbl, target_file_bytes=64 * 1024 * 1024)
    assert table_properties(tbl).get("owner") == "data-eng", "compact dropped it"
    update_where(spark, tbl, "k = 3", {"k": "k"})
    assert table_properties(tbl).get("owner") == "data-eng", "update dropped it"
    delete_rows(spark, tbl, "k", [5, 6])
    compact_deletes(spark, tbl)  # full rewrite, fresh history root
    assert table_properties(tbl).get("owner") == "data-eng", (
        "full rewrite dropped it — properties are not commit history"
    )
