"""Global deletion-vector budget (round-11 verdict item #3).

``dv_max_rows`` bounds ONE dv DML's sidecar; N successive dv commits
before a compact still accumulate an N× union that every read of
covered files broadcasts. The warehouse now tracks LIVE dv rows per
table in replay state (the ``dv_rows`` commit channel) and, when a dv
DML pushes the total past ``dv_max_rows_total``, auto-folds: one
targeted rewrite of just the covered files (``fold_dv``) — the dv map
empties and no future read broadcasts an over-budget union."""

from __future__ import annotations

import os

import pytest

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    SnapshotVacuumed,
    Warehouse,
)


def _seed(spark, wh, files=6, per=10, table="ev"):
    with wh.transaction() as t:
        for i in range(files):
            t.append(spark.createDataFrame(
                [(i * per + j, f"u{i * per + j}") for j in range(per)],
                "id int, uid string").coalesce(1), table)


def test_live_dv_rows_tracks_commits(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "w"), dv_max_rows_total=None)
    _seed(spark, wh)
    assert wh.live_dv_rows("ev") == 0
    wh.delete_where("ev", "id in (1, 2)", mode="dv")
    assert wh.live_dv_rows("ev") == 2
    wh.delete_where("ev", "id in (11, 12, 13)", mode="dv")
    assert wh.live_dv_rows("ev") == 5
    # survives a checkpoint + cold replay
    wh.write_checkpoint()
    cold = Warehouse(spark, wh.root, dv_max_rows_total=None)
    assert cold.live_dv_rows("ev") == 5
    assert cold.last_replay_parsed == 0


def test_budget_trips_and_auto_folds(spark, tmp_path):
    """N successive dv deletes trip the budget: the tripping DML lands,
    then the covered files are folded — dv map empty, read plan carries
    NO dv broadcast, data exact."""
    wh = Warehouse(spark, str(tmp_path / "w"), dv_max_rows_total=4)
    _seed(spark, wh)
    wh.delete_where("ev", "id in (1, 2)", mode="dv")          # 2 live
    wh.delete_where("ev", "id in (11, 12)", mode="dv")        # 4 live
    assert wh._dv_state("ev") and wh.live_dv_rows("ev") == 4
    with pytest.warns(UserWarning, match="auto-folding"):
        wh.delete_where("ev", "id = 21", mode="dv")           # 5 > 4
    assert wh._dv_state("ev") == {}
    assert wh.live_dv_rows("ev") == 0
    got = {r["id"] for r in wh.read("ev").collect()}
    assert got == set(range(60)) - {1, 2, 11, 12, 21}
    # no anti-join left in the read plan
    plan = wh.read("ev")._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan
    # untouched files were NOT rewritten: the 3 original files whose
    # ids (30-59) never matched a delete survive in the manifest
    live = wh._manifest_files("ev")
    assert len(live) >= 3


def test_fold_dv_rewrites_only_covered_files(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "w"), dv_max_rows_total=None)
    _seed(spark, wh)
    before = wh._manifest_files("ev")
    wh.delete_where("ev", "id = 5", mode="dv")   # covers 1 file
    wh.delete_where("ev", "id = 15", mode="dv")  # covers another
    folded = wh.fold_dv("ev")
    assert folded == 2
    after = wh._manifest_files("ev")
    # the 4 uncovered files carry verbatim (same relpaths)
    assert len(set(before) & set(after)) == 4
    assert wh._dv_state("ev") == {}
    assert wh.read("ev").count() == 58
    # carried-forward stats still serve pruning on untouched files
    st = wh._manifest_stats("ev")
    assert all(rel in st for rel in set(before) & set(after))
    # fold is file maintenance: retention advanced, dv sidecars gone
    assert wh.min_readable_seq("ev") == wh._latest_seq()
    dv_dir = os.path.join(wh.root, "ev", "_dv")
    if os.path.isdir(dv_dir):
        assert not [f for f in os.listdir(dv_dir)
                    if f.endswith(".parquet") and not f.startswith(".")]
    with pytest.raises(SnapshotVacuumed):
        wh.read_at("ev", 2)
    assert wh.fold_dv("ev") == 0  # idempotent: nothing live


def test_fold_composes_with_update_and_merge_dv(spark, tmp_path):
    """update_where and merge_when dv commits count toward the same
    budget and auto-fold identically."""
    from etl_pipeline_for_detection_banking_fraud_spark.operators import (
        merge as M,
    )

    wh = Warehouse(spark, str(tmp_path / "w"), dv_max_rows_total=3)
    _seed(spark, wh)
    wh.update_where("ev", "id = 3", {"uid": "'updated'"}, mode="dv")
    assert wh.live_dv_rows("ev") == 1
    src = spark.createDataFrame(
        [(13, "m13"), (23, "m23"), (33, "m33")], "id int, uid string")
    with pytest.warns(UserWarning, match="auto-folding"):
        wh.merge_when(
            "ev", src, ["id"],
            matched=[M.when_matched_update({"uid": "source.uid"})],
            mode="dv")
    assert wh._dv_state("ev") == {}
    got = {r["id"]: r["uid"] for r in wh.read("ev").collect()}
    assert got[3] == "updated" and got[13] == "m13" and got[33] == "m33"
    assert len(got) == 60


def test_legacy_dv_without_rows_channel_counts_via_footer(
        spark, tmp_path):
    """Pre-round-11 dv commits recorded no dv_rows: live_dv_rows falls
    back to the sidecar's parquet footer."""
    import json

    wh = Warehouse(spark, str(tmp_path / "w"), dv_max_rows_total=None)
    _seed(spark, wh, files=2)
    wh.delete_where("ev", "id in (1, 2, 3)", mode="dv")
    # strip the dv_rows channel from the entry (simulate a legacy log)
    seq = wh._latest_seq()
    p = os.path.join(wh.root, "_commitlog", f"{seq:09d}.json")
    entry = json.load(open(p))
    entry.pop("dv_rows", None)
    json.dump(entry, open(p, "w"))
    wh._invalidate_state()
    wh._entry_cache.clear()
    assert wh.live_dv_rows("ev") == 3


def test_auto_fold_is_non_destructive(spark, tmp_path):
    """The AUTOMATIC over-budget fold must not truncate time travel:
    unlike explicit fold_dv() maintenance it advances no retention
    boundary and deletes no file — pre-fold snapshots stay readable
    (dv applied as of that snapshot), reclamation stays an explicit
    maintenance decision."""
    wh = Warehouse(spark, str(tmp_path / "w"), dv_max_rows_total=2)
    _seed(spark, wh)
    wh.delete_where("ev", "id in (1, 2)", mode="dv")      # 2 live
    seq_dv = wh._latest_seq()
    with pytest.warns(UserWarning, match="auto-folding"):
        wh.delete_where("ev", "id = 21", mode="dv")       # 3 > 2
    # head is folded: no dv broadcast, data exact
    assert wh._dv_state("ev") == {}
    assert {r["id"] for r in wh.read("ev").collect()} == \
        set(range(60)) - {1, 2, 21}
    # no retention advance: every pre-fold snapshot still readable
    assert wh.min_readable_seq("ev") == 0
    at_dv = {r["id"] for r in wh.read_at("ev", seq_dv).collect()}
    assert at_dv == set(range(60)) - {1, 2}
    # explicit maintenance still reclaims later
    assert wh.fold_dv("ev") == 0  # nothing live to fold


def test_fold_dv_vacuum_false_keeps_history(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "w"), dv_max_rows_total=None)
    _seed(spark, wh)
    wh.delete_where("ev", "id = 5", mode="dv")
    seq_dv = wh._latest_seq()
    dv_dir = os.path.join(wh.root, "ev", "_dv")
    n_dv_files = len([f for f in os.listdir(dv_dir)
                      if f.endswith(".parquet") and not f.startswith(".")])
    assert n_dv_files == 1
    assert wh.fold_dv("ev", vacuum=False) == 1
    assert wh._dv_state("ev") == {}
    assert wh.read("ev").count() == 59
    assert wh.min_readable_seq("ev") == 0
    # the superseded data file and dv sidecar remain for time travel
    assert wh.read_at("ev", seq_dv).count() == 59
    assert wh.read_at("ev", seq_dv - 1).count() == 60
    # and a vacuum sweep does NOT reclaim them (still referenced)
    wh.vacuum_orphans("ev")
    assert wh.read_at("ev", seq_dv - 1).count() == 60
