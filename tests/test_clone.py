"""Table cloning (sources/clone.py): shallow zero-copy clones,
deepening, and how every mutation path composes with foreign entries.

The invariant under test throughout: NOTHING a clone does may create,
move, or delete a byte under the SOURCE table's root (checked by
fingerprinting the source tree around every mutation)."""

import os

import pyspark.sql.functions as F
import pytest

from nimble_spark.sources.clone import clone_table, deepen_clone, foreign_files
from nimble_spark.sources.table import (
    WriteOptions,
    read_changes,
    read_manifest,
    read_table,
    rollback_table,
    tag_commit,
    write_table,
)
from nimble_spark.tables import load

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return load(spark, SF, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _tree_fingerprint(root: str) -> dict:
    out = {}
    for r, _d, fs in os.walk(root):
        for f in fs:
            p = os.path.join(r, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns, st.st_ino)
    return out


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / "src")
    write_table(
        _orders(spark).filter("o_orderkey % 3 != 0"),
        path,
        WriteOptions(cluster_by=["o_orderkey"], n_cluster_files=4),
    )
    return path


def test_shallow_clone_is_zero_copy_and_reads_equal(spark, src, tmp_path):
    cl = str(tmp_path / "cl")
    m = clone_table(spark, src, cl, shallow=True)
    assert len(foreign_files(m)) == len(m["files"]) == 4
    # zero-copy: no local parquet at all
    assert not [
        f for _r, _d, fs in os.walk(cl) for f in fs if f.endswith(".parquet")
    ]
    a = read_table(spark, src).orderBy("o_orderkey").collect()
    b = read_table(spark, cl).orderBy("o_orderkey").collect()
    assert a == b
    # cluster index carried: range scan prunes and answers correctly
    n = read_table(spark, cl, range_scan=("o_orderkey", 10, 500)).count()
    exp = read_table(spark, src).filter("o_orderkey between 10 and 500").count()
    assert n == exp


def test_clone_refuses_existing_dst_and_partitioned_src(spark, src, tmp_path):
    cl = str(tmp_path / "cl")
    clone_table(spark, src, cl, shallow=True)
    with pytest.raises(ValueError, match="already exists"):
        clone_table(spark, src, cl, shallow=True)
    part = str(tmp_path / "part")
    write_table(
        _orders(spark), part, WriteOptions(partition_by=["o_orderstatus"])
    )
    with pytest.raises(ValueError, match="partition"):
        clone_table(spark, part, str(tmp_path / "clp"), shallow=True)
    # deep clone of a partitioned table is fine
    dp = str(tmp_path / "dpp")
    clone_table(spark, part, dp, shallow=False)
    assert read_table(spark, dp).count() == read_table(spark, part).count()


def test_append_divergence_leaves_source_untouched(spark, src, tmp_path):
    cl = str(tmp_path / "cl")
    clone_table(spark, src, cl, shallow=True)
    before = _tree_fingerprint(src)
    extra = _orders(spark).filter("o_orderkey % 3 = 0")
    write_table(extra, cl, mode="append")
    assert _tree_fingerprint(src) == before
    m = read_manifest(cl)
    assert len(foreign_files(m)) == 4  # foreign entries survived the append
    assert read_table(spark, cl).count() == _orders(spark).count()
    assert read_table(spark, src).count() == _orders(spark).filter(
        "o_orderkey % 3 != 0"
    ).count()
    # time travel to the clone snapshot still works
    assert (
        read_table(spark, cl, as_of_commit=0).count()
        == read_table(spark, src).count()
    )


def test_deepen_localizes_with_data_change_false(spark, src, tmp_path):
    cl = str(tmp_path / "cl")
    clone_table(spark, src, cl, shallow=True)
    write_table(_orders(spark).limit(10), cl, mode="append")
    before = _tree_fingerprint(src)
    last = len(read_manifest(cl)["commits"]) - 1
    m = deepen_clone(spark, cl)
    assert _tree_fingerprint(src) == before
    assert foreign_files(m) == []
    c = m["commits"][-1]
    assert c["mode"] == "deepen" and c["data_change"] is False
    # CDC consumers skip the deepen (no row changed)
    assert read_changes(spark, cl, since_commit=last).count() == 0
    assert (
        read_table(spark, cl).count()
        == read_table(spark, src).count() + 10
    )
    # idempotent
    assert foreign_files(deepen_clone(spark, cl)) == []


def test_rollback_past_deepen_reattaches_and_append_keeps_foreign(
    spark, src, tmp_path
):
    cl = str(tmp_path / "cl")
    clone_table(spark, src, cl, shallow=True)
    write_table(_orders(spark).filter("o_orderkey % 3 = 0"), cl, mode="append")
    deepen_clone(spark, cl)
    rollback_table(spark, cl, commit=1)
    m = read_manifest(cl)
    # the pre-deepen snapshot IS the source files — re-attached
    assert len(foreign_files(m)) == 4
    assert read_table(spark, cl).count() == _orders(spark).count()
    # a later append must carry the re-attached foreign entries
    write_table(_orders(spark).limit(7), cl, mode="append")
    m2 = read_manifest(cl)
    assert len(foreign_files(m2)) == 4
    assert read_table(spark, cl).count() == _orders(spark).count() + 7


def test_compaction_on_clone_localizes_and_spares_source(spark, src, tmp_path):
    from nimble_spark.sources.compaction import compact_table

    cl = str(tmp_path / "cl")
    clone_table(spark, src, cl, shallow=True)
    write_table(_orders(spark).limit(5), cl, mode="append")
    before = _tree_fingerprint(src)
    exp = read_table(spark, cl).orderBy("o_orderkey", "o_totalprice").collect()
    compact_table(spark, cl, target_file_bytes=256 * 1024 * 1024)
    assert _tree_fingerprint(src) == before
    m = read_manifest(cl)
    assert foreign_files(m) == []  # the rewrite localized what it touched
    # no foreign file may appear in the clone's trash (the source owns it)
    trash = os.path.join(cl, "_nimble", "trash")
    trash_files = [
        f for r, _d, fs in os.walk(trash) for f in fs if f.endswith(".parquet")
    ] if os.path.isdir(trash) else []
    assert trash_files == []
    got = read_table(spark, cl).orderBy("o_orderkey", "o_totalprice").collect()
    assert got == exp


def test_merge_and_update_on_clone_are_correct(spark, src, tmp_path):
    from nimble_spark.sources.merge import merge_into, update_where

    cl = str(tmp_path / "cl")
    clone_table(spark, src, cl, shallow=True)
    before = _tree_fingerprint(src)
    base = read_table(spark, cl)
    upd = base.filter("o_orderkey % 100 = 7").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merge_into(spark, cl, upd, key="o_orderkey")
    assert _tree_fingerprint(src) == before
    got = read_table(spark, cl)
    assert got.count() == read_table(spark, src).count()
    exp_tot = (
        read_table(spark, src)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 100 == 7, F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
        )
        .agg(F.sum("o_totalprice"))
        .first()[0]
    )
    assert abs(got.agg(F.sum("o_totalprice")).first()[0] - exp_tot) < 1e-6
    update_where(spark, cl, "o_orderkey = 4", {"o_totalprice": "0.0"})
    assert _tree_fingerprint(src) == before
    assert (
        read_table(spark, cl).filter("o_orderkey = 4").first()["o_totalprice"]
        == 0.0
    )


def test_vacuum_on_clone_never_reclaims_source(spark, src, tmp_path):
    from nimble_spark.sources.compaction import vacuum_table

    cl = str(tmp_path / "cl")
    clone_table(spark, src, cl, shallow=True)
    write_table(_orders(spark).limit(5), cl, mode="append")
    before = _tree_fingerprint(src)
    vacuum_table(cl, min_age_s=0.0)
    assert _tree_fingerprint(src) == before
    assert read_table(spark, cl).count() == read_table(spark, src).count() + 5


def test_source_rewritten_under_clone_raises_on_append(spark, src, tmp_path):
    cl = str(tmp_path / "cl")
    m = clone_table(spark, src, cl, shallow=True)
    os.remove(foreign_files(m)[0])  # simulate source vacuum/rewrite
    with pytest.raises(ValueError, match="source file is gone"):
        write_table(_orders(spark).limit(3), cl, mode="append")


def test_delete_masks_copy_and_diverge(spark, src, tmp_path):
    from nimble_spark.sources.deletes import delete_rows, read_with_deletes

    delete_rows(spark, src, "o_orderkey", [1, 2])
    cl = str(tmp_path / "cl")
    clone_table(spark, src, cl, shallow=True)
    src_n = read_with_deletes(spark, src).count()
    assert read_with_deletes(spark, cl).count() == src_n  # mask copied
    delete_rows(spark, cl, "o_orderkey", [4])
    assert read_with_deletes(spark, cl).count() == src_n - 1
    assert read_with_deletes(spark, src).count() == src_n  # masks diverged


def test_deep_clone_carries_history_and_tags(spark, src, tmp_path):
    tag_commit(src, "v1")
    write_table(_orders(spark).filter("o_orderkey % 3 = 0"), src, mode="append")
    dp = str(tmp_path / "dp")
    m = clone_table(spark, src, dp, shallow=False)
    assert foreign_files(m) == []
    assert len(m["commits"]) == 2 and m.get("tags", {}).get("v1") == 0
    assert (
        read_table(spark, dp, as_of_tag="v1").count()
        == _orders(spark).filter("o_orderkey % 3 != 0").count()
    )
    assert read_table(spark, dp).count() == _orders(spark).count()


@pytest.mark.parametrize("seed", [3, 91])
def test_clone_divergence_fuzz(spark, tmp_path, seed):
    """Model-based drill of a shallow clone diverging from its source:
    random appends/merges/updates/deletes/compactions/deepens run on
    the CLONE against a Python dict model, while the SOURCE tree is
    fingerprinted after every step — no clone operation may ever
    create, move or delete a source byte, and the source's live view
    must stay byte-identical throughout."""
    import random

    from nimble_spark.sources.compaction import compact_table, run_maintenance
    from nimble_spark.sources.deletes import delete_rows, read_with_deletes
    from nimble_spark.sources.merge import merge_into, update_where

    rng = random.Random(seed)
    src = str(tmp_path / "fsrc")
    cl = str(tmp_path / "fcl")

    def _df(rows):
        return spark.createDataFrame(list(rows), "k LONG, v LONG")

    model = {k: k * 10 for k in range(30)}
    write_table(
        _df(model.items()), src, WriteOptions(cluster_by=["k"], n_cluster_files=3)
    )
    clone_table(spark, src, cl, shallow=True)
    src_fp = _tree_fingerprint(src)
    src_model = dict(model)
    masked: set[int] = set()
    next_key = 30

    def _live() -> dict[int, int]:
        return {
            r["k"]: r["v"]
            for r in read_with_deletes(spark, cl).collect()
        }

    for _step in range(10):
        op = rng.choice(
            ["append", "merge", "update", "delete", "compact", "deepen", "maintain"]
        )
        if op == "append":
            fresh = {next_key + i: rng.randint(0, 999) for i in range(3)}
            next_key += 3
            write_table(_df(fresh.items()), cl, mode="append")
            model.update(fresh)
        elif op == "merge":
            live_keys = [k for k in model if k not in masked]
            ups = {
                k: rng.randint(0, 999)
                for k in rng.sample(live_keys, min(3, len(live_keys)))
            }
            merge_into(spark, cl, _df(ups.items()), key="k")
            model.update(ups)
        elif op == "update":
            pivot = rng.randint(0, next_key)
            update_where(spark, cl, f"k >= {pivot}", {"v": "v + 1"})
            model.update({k: v + 1 for k, v in model.items() if k >= pivot})
        elif op == "delete":
            live_keys = [k for k in model if k not in masked]
            victims = rng.sample(live_keys, min(2, len(live_keys)))
            delete_rows(spark, cl, "k", victims)
            masked.update(victims)
        elif op == "compact":
            try:
                compact_table(spark, cl, target_file_bytes=64 * 1024 * 1024)
            except ValueError:
                pass  # single file / nothing to merge — fine
        elif op == "deepen":
            assert foreign_files(deepen_clone(spark, cl)) == []
        elif op == "maintain":
            done = run_maintenance(spark, cl, vacuum=False)
            if any(d["action"] == "compact_deletes" for d in done):
                model = {k: v for k, v in model.items() if k not in masked}
                masked = set()
        assert _live() == {k: v for k, v in model.items() if k not in masked}
        assert _tree_fingerprint(src) == src_fp, f"source mutated (seed {seed})"

    # the source's live view never moved
    assert {
        r["k"]: r["v"] for r in read_table(spark, src).collect()
    } == src_model
    # final deepen: the clone must stand alone
    deepen_clone(spark, cl)
    assert foreign_files(read_manifest(cl)) == []


def test_dsl_clone(spark, src, tmp_path):
    from nimble_spark.tools import run_command

    dst = str(tmp_path / "dsl_cl")
    r = run_command(spark, src, f"CLONE TO '{dst}'").first()
    assert r.mode == "shallow" and r.foreign == r.files == 4
    assert read_table(spark, dst).count() == read_table(spark, src).count()
    dst2 = str(tmp_path / "dsl_deep")
    r2 = run_command(spark, src, f"CLONE TO '{dst2}' DEEP").first()
    assert r2.mode == "deep" and r2.foreign == 0
    assert read_table(spark, dst2).count() == read_table(spark, src).count()


def test_cdc_replay_on_clone(spark, src, tmp_path):
    cl = str(tmp_path / "cl")
    clone_table(spark, src, cl, shallow=True)
    write_table(_orders(spark).filter("o_orderkey % 3 = 0"), cl, mode="append")
    # full replay: the clone commit delivers the foreign rows, the
    # append delivers its own
    ch = read_changes(spark, cl, since_commit=-1, with_commit=True)
    per = {r["_commit"]: r["n"] for r in ch.groupBy("_commit").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per[0] == read_table(spark, src).count()
    assert per[1] == _orders(spark).filter("o_orderkey % 3 = 0").count()
