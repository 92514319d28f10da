"""NimbleDSL-analogue inspection surface tests (golden-ish assertions
like tools/tests/NimbleDumpLibTest.cpp)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from nimble_spark import tools
from nimble_spark.sources.table import WriteOptions, write_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def table_path(spark):
    d = tempfile.mkdtemp(prefix="nimble_tools_")
    path = f"{d}/orders"
    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    write_table(src, path, WriteOptions(cluster_by=["o_orderkey"], n_cluster_files=4))
    yield path
    shutil.rmtree(d, ignore_errors=True)


def test_describe(spark, table_path):
    d = {r["column"]: r["type"] for r in tools.describe(spark, table_path).collect()}
    assert d["o_orderkey"] == "long"
    assert d["o_totalprice"] == "double"


def test_show_stats(spark, table_path):
    stats = {r["column"]: r for r in tools.show_stats(spark, table_path).collect()}
    assert int(stats["o_orderkey"]["min"]) >= 0
    assert stats["o_totalprice"]["null_count"] == 0


def test_show_files_and_stripes(spark, table_path):
    files = tools.show_files(spark, table_path).collect()
    assert len(files) >= 2
    stripes = tools.show_stripes(spark, table_path).collect()
    assert sum(r["rows"] for r in stripes) == sum(r["rows"] for r in files)
    assert all(r["compressed_bytes"] > 0 for r in stripes)


def test_show_encodings(spark, table_path):
    encs = tools.show_encodings(spark, table_path).collect()
    assert any("ZSTD" in r["codec"].upper() for r in encs)


def test_show_index(spark, table_path):
    idx = tools.show_index(spark, table_path).collect()
    assert any(r["index"] == "cluster" and r["key"] == "o_orderkey" for r in idx)


def test_select_limit_offset(spark, table_path):
    rows = tools.select(spark, table_path, columns=["o_orderkey"], limit=5).collect()
    assert len(rows) == 5
