"""Shallow table clone (round-12 verdict item #7).

``clone_table(src, dst)`` births ``dst`` with ONE commit referencing
the source head snapshot's files, hard-linked (zero-copy). Vacuum
safety is structural: either side's rewrite/vacuum unlinks only its
own directory entry; the shared inode survives until both drop it.
"""

from __future__ import annotations

import os

import pytest

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    ConstraintViolation,
    Warehouse,
)


def _wh(spark, tmp_path, name="w"):
    root = os.path.join(str(tmp_path), name)
    os.makedirs(root, exist_ok=True)
    return Warehouse(spark, root)


def _seed(spark, wh, table="ev", files=4, per=10):
    with wh.transaction() as t:
        for i in range(files):
            t.append(spark.createDataFrame(
                [(i * per + j, f"u{i * per + j}") for j in range(per)],
                "id int, uid string").coalesce(1), table)


def test_clone_is_zero_copy_and_exact(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    src_rows = {r["id"] for r in wh.read("ev").collect()}
    n = wh.clone_table("ev", "ev2")
    assert n == 4
    assert {r["id"] for r in wh.read("ev2").collect()} == src_rows
    # zero-copy: every cloned file shares its inode with the source
    for rel in wh._manifest_files("ev2"):
        s = os.stat(os.path.join(wh.root, "ev", rel))
        d = os.stat(os.path.join(wh.root, "ev2", rel))
        assert s.st_ino == d.st_ino and s.st_nlink >= 2
    # stats carried: pruning and metadata counts work on the clone
    assert len(wh._manifest_stats("ev2")) == 4
    assert wh.count_rows("ev2") == 40
    got = wh.read("ev2", prune={"id": (15, 15)})
    assert len(got.inputFiles()) == 1


def test_clone_diverges_independently(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    wh.clone_table("ev", "ev2")
    wh.delete_where("ev2", "id < 10")          # clone-side DML
    wh.append(spark.createDataFrame(
        [(99, "new")], "id int, uid string"), "ev")  # source-side append
    assert wh.read("ev").count() == 41
    assert wh.read("ev2").count() == 30
    # source compaction + vacuum must not break the clone
    wh.compact("ev")
    wh.vacuum_orphans("ev")
    assert wh.read("ev2").count() == 30
    # clone compaction + vacuum must not break the source
    wh.compact("ev2")
    wh.vacuum_orphans("ev2")
    assert wh.read("ev").count() == 41
    assert wh.read("ev2").count() == 30


def test_clone_carries_metadata(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(1, "2021-03-01", 5.0), (2, "2021-03-02", 6.0)],
            "id int, dt string, amt double").coalesce(1),
            "ev", partition_by=["dt"])
    wh.add_constraint("ev", "amt_pos", "amt > 0")
    wh.add_columns("ev", {"tag": "string"})
    wh.clone_table("ev", "ev2")
    assert wh.table_partition_by("ev2") == ["dt"]
    assert wh.table_constraints("ev2") == {"amt_pos": "amt > 0"}
    assert "tag" in wh.read("ev2").columns
    with pytest.raises(ConstraintViolation, match="amt_pos"):
        wh.append(spark.createDataFrame(
            [(3, "2021-03-03", -1.0, None)],
            "id int, dt string, amt double, tag string"), "ev2")


def test_clone_carries_live_deletion_vectors(spark, tmp_path):
    wh = _wh(spark, tmp_path, "wdv")
    _seed(spark, wh)
    wh.delete_where("ev", "id in (3, 17)", mode="dv")
    assert wh._dv_state("ev")
    wh.clone_table("ev", "ev2")
    assert wh._dv_state("ev2")
    assert wh.read("ev2").count() == 38
    assert wh.live_dv_rows("ev2") == 2
    # folding the clone's dvs leaves the source's live
    wh.fold_dv("ev2")
    assert wh._dv_state("ev2") == {} and wh._dv_state("ev")
    assert wh.read("ev").count() == 38


def test_clone_guards_and_checkpoint(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    with pytest.raises(ValueError, match="not commit-log tracked"):
        wh.clone_table("ghost", "g2")
    wh.clone_table("ev", "ev2")
    with pytest.raises(ValueError, match="already exists"):
        wh.clone_table("ev", "ev2")
    # the clone entry's inline stats were folded to a checkpoint:
    # a cold replay parses zero entry JSONs
    cold = Warehouse(spark, wh.root)
    assert len(cold._manifest_files("ev2")) == 4
    assert cold.last_replay_parsed == 0
