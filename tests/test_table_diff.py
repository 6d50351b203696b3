"""Snapshot-to-snapshot changelog derivation (Warehouse.table_diff):
insert/delete/update classification, manifest-level file cancellation,
and the degenerate/error paths."""

from __future__ import annotations

import pytest

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    Warehouse,
)


def _wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _seed(spark, wh, rows):
    df = spark.createDataFrame(rows, "k long, name string, bal double")
    with wh.transaction():
        wh.append(df.coalesce(1), "accounts")
    return max(s["seq"] for s in wh.snapshots())


class TestTableDiff:
    def test_insert_delete_update_classification(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        seq1 = _seed(spark, wh, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)])
        changes = spark.createDataFrame(
            [(2, 1, "U", 99.0), (3, 1, "D", None), (4, 1, "I", 40.0)],
            "k long, v long, op string, bal double",
        )
        wh.merge_table("accounts", changes, key="k",
                       version_cols=("v",), payload_cols=("bal",))
        seq2 = max(s["seq"] for s in wh.snapshots())

        out = wh.table_diff("accounts", seq1, seq2, key_cols=["k"])
        got = {(r["k"], r["_change_type"]): r["bal"] for r in out.collect()}
        assert got == {
            (4, "insert"): 40.0,
            (3, "delete"): 30.0,
            (2, "update_preimage"): 20.0,
            (2, "update_postimage"): 99.0,
        }

    def test_append_only_diff_reads_no_old_files(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        seq1 = _seed(spark, wh, [(1, "a", 10.0)])
        seq2 = _seed(spark, wh, [(2, "b", 20.0)])
        # manifest cancellation: the unchanged first file never enters
        # the diff's read set
        only_a, only_b = wh._diff_file_sets("accounts", seq1, seq2)
        assert only_a == []
        assert len(only_b) == 1
        out = wh.table_diff("accounts", seq1, seq2, key_cols=["k"])
        rows = out.collect()
        assert [(r["k"], r["_change_type"]) for r in rows] == [(2, "insert")]

    def test_same_snapshot_diff_errors_cleanly(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        seq1 = _seed(spark, wh, [(1, "a", 10.0)])
        with pytest.raises(FileNotFoundError, match="nothing to diff"):
            wh.table_diff("accounts", seq1, seq1, key_cols=["k"])

    def test_moved_rows_cancel_on_full_rewrite(self, spark, tmp_path):
        # merge_table rewrites EVERY file (old ones retained for time
        # travel); rows that merely moved into new files must NOT be
        # reported — only the genuinely updated key appears
        wh = _wh(spark, tmp_path)
        seq1 = _seed(spark, wh, [(1, "a", 10.0), (2, "b", 20.0)])
        changes = spark.createDataFrame(
            [(2, 1, "U", 99.0)], "k long, v long, op string, bal double"
        )
        wh.merge_table("accounts", changes, key="k",
                       version_cols=("v",), payload_cols=("bal",))
        seq2 = max(s["seq"] for s in wh.snapshots())
        only_a, only_b = wh._diff_file_sets("accounts", seq1, seq2)
        assert only_a and only_b  # every file differs post-rewrite...
        out = wh.table_diff("accounts", seq1, seq2, key_cols=["k"])
        # ...but k=1 moved-without-change cancels; only k=2 reports
        got = sorted((r["k"], r["_change_type"]) for r in out.collect())
        assert got == [(2, "update_postimage"), (2, "update_preimage")]

    def test_vacuumed_snapshot_raises_typed_error(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            SnapshotVacuumed,
        )

        wh = _wh(spark, tmp_path)
        seq1 = _seed(spark, wh, [(1, "a", 10.0)])
        _seed(spark, wh, [(2, "b", 20.0)])
        wh.compact("accounts")  # deletes superseded files
        seq3 = max(s["seq"] for s in wh.snapshots())
        with pytest.raises(SnapshotVacuumed):
            wh.table_diff("accounts", seq1, seq3, key_cols=["k"])

    def test_bad_args_raise(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        seq1 = _seed(spark, wh, [(1, "a", 10.0)])
        with pytest.raises(ValueError, match="must be >="):
            wh.table_diff("accounts", seq1, seq1 - 1, key_cols=["k"])
        with pytest.raises(ValueError, match="no commit-log history"):
            wh.table_diff("untracked", 0, seq1, key_cols=["k"])


class TestSnapshotDiffOperator:
    """The pure-DataFrame row diff (operators.cdc.snapshot_diff) that
    table_diff delegates to, on its subtle corners."""

    def test_bag_multiplicity(self, spark):
        from etl_pipeline_for_detection_banking_fraud_spark.operators.cdc import (
            snapshot_diff,
        )

        old = spark.createDataFrame(
            [(1, "x"), (1, "x"), (2, "y"), (2, "y"), (2, "y")],
            "k long, v string",
        )
        new = spark.createDataFrame(
            [(1, "x"), (1, "x"), (1, "x"), (2, "y")], "k long, v string"
        )
        got = sorted(
            (r["k"], r["v"], r["change_type"])
            for r in snapshot_diff(old, new, ["k"]).collect()
        )
        # 2->3 copies of (1,x): ONE insert; 3->1 copies of (2,y): TWO
        # deletes — same-key same-value rows never pair as updates
        assert got == [
            (1, "x", "insert"),
            (2, "y", "delete"),
            (2, "y", "delete"),
        ]

    def test_diff_reconstructs_new_from_old(self, spark):
        """The CDF invariant: old ∖ (deletes ∪ preimages) ⊎ (inserts ∪
        postimages) == new, as multisets — on messy multiplicities."""
        from collections import Counter

        from etl_pipeline_for_detection_banking_fraud_spark.operators.cdc import (
            snapshot_diff,
        )

        old_rows = [(1, "a"), (1, "a"), (2, "b"), (3, "c"), (4, "d"),
                    (4, "e")]
        new_rows = [(1, "a"), (2, "B"), (3, "c"), (3, "c"), (5, "z"),
                    (4, "e"), (4, "e")]
        old = spark.createDataFrame(old_rows, "k long, v string")
        new = spark.createDataFrame(new_rows, "k long, v string")
        diff = snapshot_diff(old, new, ["k"]).collect()
        removed = Counter(
            (r["k"], r["v"]) for r in diff
            if r["change_type"] in ("delete", "update_preimage")
        )
        added = Counter(
            (r["k"], r["v"]) for r in diff
            if r["change_type"] in ("insert", "update_postimage")
        )
        rebuilt = Counter(old_rows) - removed + added
        assert rebuilt == Counter(new_rows)
        # and removals never exceed what old actually held
        assert not (removed - Counter(old_rows))

    def test_null_key_never_pairs_as_update(self, spark):
        from etl_pipeline_for_detection_banking_fraud_spark.operators.cdc import (
            snapshot_diff,
        )

        old = spark.createDataFrame([(None, "a"), (7, "p")], "k long, v string")
        new = spark.createDataFrame([(None, "b"), (7, "q")], "k long, v string")
        got = sorted(
            (
                (r["k"], r["v"], r["change_type"])
                for r in snapshot_diff(old, new, ["k"]).collect()
            ),
            key=lambda t: (t[0] is not None, t[0] or 0, t[1]),
        )
        # NULL keys classify insert/delete (SQL key-join semantics);
        # the non-null key pairs as an update
        assert got == [
            (None, "a", "delete"),
            (None, "b", "insert"),
            (7, "p", "update_preimage"),
            (7, "q", "update_postimage"),
        ]


class TestHiddenPartitionGuard:
    def test_txn_append_rejects_underscore_partition_col(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "wh"))
        df = spark.createDataFrame([(1, "aa")], "k long, _kp string")
        with pytest.raises(ValueError, match="hidden"):
            with wh.transaction():
                wh.append(df, "t", partition_by=["_kp"])
