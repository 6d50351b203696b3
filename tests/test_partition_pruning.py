"""Warehouse fact partitioning: per-day predicates must prune partitions
at the scan (the 100 TB read-path requirement, SURVEY §4)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark import schemas
from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import Warehouse


def test_fact_scan_prunes_day_partitions(spark, tmp_path):
    """r13: the fact sink lays out under HIDDEN days(transaction_date)
    partitioning — the derived transaction_date_day directories prune
    at the scan, and read_transactions' since/until band selects them
    through the BASE column without the caller knowing the layout."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rows = [
        (f"t{i}", datetime.datetime(2021, 3, 1 + (i % 3), 10, 0), Decimal("1.00"),
         "C1", "PAYMENT", "SUCCESS", "T")
        for i in range(30)
    ]
    tx = spark.createDataFrame(rows, schema=schemas.TRANSACTIONS)
    wh.append_transactions(tx)

    df = spark.read.parquet(str(tmp_path / "wh" / "dwh_fact_transactions"))
    pruned = df.where(F.col("transaction_date_day") == "2021-03-02")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter on the derived day key; 1 of 3 day dirs selected
    assert "PartitionFilters" in plan
    assert "transaction_date_day" in plan.split("PartitionFilters")[1][:200]
    assert pruned.count() == 10
    assert pruned.select("transaction_date_day").distinct().count() == 1
    # the hidden-partitioning read path: a day band through the BASE
    # column returns the day's rows and hides the layout column
    day = wh.read_transactions(since=datetime.date(2021, 3, 2),
                               until=datetime.date(2021, 3, 2))
    assert day.count() == 10
    assert "transaction_date_day" not in day.columns
    assert "dt" not in day.columns


def test_file_may_match_partition_width_guard():
    """Partition-path pruning is raw-lexicographic, which equals natural
    order only for fixed-width values: '9' vs bound '10' must KEEP the
    file (lexicographically '9' > '10' would wrongly prune it — and the
    same helper picks the DML rewrite set, where a wrong prune means
    rows silently survive a DELETE)."""
    from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
        _file_may_match,
    )

    # variable-width numeric partition values: never pruned on path
    assert _file_may_match("k=9/f.parquet", None, {"k": ("10", "20")})
    assert _file_may_match("k=100/f.parquet", None, {"k": ("20", "90")})
    # fixed-width (ISO dates, same-width digits): pruning stays active
    assert not _file_may_match(
        "dt=2021-03-05/f.parquet", None, {"dt": ("2021-03-01", "2021-03-02")})
    assert _file_may_match(
        "dt=2021-03-01/f.parquet", None, {"dt": ("2021-03-01", "2021-03-02")})
    assert not _file_may_match("k=95/f.parquet", None, {"k": ("20", "90")})
    # footer stats still prune independently of path widths
    assert not _file_may_match(
        "k=9/f.parquet", {"v": [100, 200]}, {"v": (0, 50)})


def test_entry_time_tolerates_concurrently_expired_entry(spark, tmp_path):
    """snapshots()/read_at_timestamp must skip (not crash on) an entry
    folded by a concurrent expire_log between the log listing and the
    mtime stat."""
    import json
    import os

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with wh.transaction():
        wh.append(df, "t1")
    with wh.transaction():
        wh.append(df, "t1")
    # strip the recorded commit time from entry 1 so _entry_time falls
    # back to the file mtime, then delete the file (the race window)
    mdir = wh._manifest_dir()
    p1 = os.path.join(mdir, "000000001.json")
    e1 = json.load(open(p1))
    e1.pop("ts", None)
    json.dump(e1, open(p1, "w"))
    assert wh._entry_time(1) is not None  # mtime fallback works
    # simulate the fold mid-call: entry dict loaded, file gone
    os.remove(p1)
    assert wh._entry_time(1, entry=e1) is None
    # a fresh handle (no entry cache) hits the missing file on both
    # the load and the stat — still None, not OSError
    assert Warehouse(spark, root)._entry_time(1) is None


class TestStructLeafPruning:
    """Nested-field data skipping (round-12): footer stats record
    struct leaves under their dotted path, DML/read predicates on
    ``struct.leaf`` derive bounds, and the column-mapping translation
    remaps the head segment."""

    @staticmethod
    def _seed(spark, wh):
        for base in (0, 100, 200):
            with wh.transaction() as t:
                t.append(spark.createDataFrame(
                    [(base + i, (float(base + i), f"u{base + i}"))
                     for i in range(10)],
                    "id int, meta struct<score:double,tag:string>"
                ).coalesce(1), "ev")

    def test_leaf_stats_recorded_and_read_prunes(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "w"))
        self._seed(spark, wh)
        st = wh._manifest_stats("ev")
        assert len(st) == 3
        assert all("meta.score" in v and "meta.tag" in v
                   for v in st.values())
        lows = sorted(v["meta.score"][0] for v in st.values())
        assert lows == [0.0, 100.0, 200.0]
        # read_where derives the leaf bound and opens ONE file
        df = wh.read_where("ev", "meta.score >= 200 AND meta.score <= 205")
        assert len(df.inputFiles()) == 1
        assert sorted(r["id"] for r in df.collect()) == \
            [200, 201, 202, 203, 204, 205]

    def test_dml_narrows_rewrite_set_by_leaf(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "w"))
        self._seed(spark, wh)
        before = wh._manifest_files("ev")
        n = wh.delete_where("ev", "meta.score = 105")
        assert n == 1
        after = wh._manifest_files("ev")
        # only the one covering file was rewritten
        assert len(set(before) & set(after)) == 2
        assert wh.read("ev").count() == 29

    def test_leaf_prune_translates_column_mapping(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "w"))
        self._seed(spark, wh)
        wh.rename_column("ev", "meta", "m2")
        # logical m2.score -> physical meta.score in the stats
        df = wh.read_where("ev", "m2.score >= 200")
        assert len(df.inputFiles()) == 1
        assert df.count() == 10
        # re-add 'meta' as a NEW struct: fresh physical slot, stale
        # leaf stats of the old bytes must not prune the new column
        wh.add_columns("ev", {"meta": "struct<score:double>"})
        assert wh.read_where("ev", "meta.score >= 0").count() == 0

    def test_alias_qualified_ref_not_mistaken(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            derive_prune_bounds,
        )

        wh = Warehouse(spark, str(tmp_path / "w"))
        self._seed(spark, wh)
        # 'ev.id' is a table-qualified TOP-LEVEL ref: with no struct
        # column named 'ev', no bound may attach (necessary-condition
        # discipline unchanged)
        b = derive_prune_bounds(spark, "ev.id = 5",
                                struct_cols=wh._struct_cols("ev"))
        assert b == {}
        b = derive_prune_bounds(spark, "meta.score = 5",
                                struct_cols=wh._struct_cols("ev"))
        assert b == {"meta.score": (5, 5)}
