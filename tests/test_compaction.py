"""Warehouse compaction: many small append files -> few, same rows."""

from __future__ import annotations

import datetime
import glob
import os
from decimal import Decimal

from etl_pipeline_for_detection_banking_fraud_spark import schemas
from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import Warehouse


def test_compact_partitioned_fact(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for batch in range(5):  # 5 appends -> many files per day partition
        rows = [
            (f"t{batch}_{i}", datetime.datetime(2021, 3, 1 + i % 2, 10, 0),
             Decimal("1.00"), "C1", "PAYMENT", "SUCCESS", "T")
            for i in range(4)
        ]
        wh.append_transactions(spark.createDataFrame(rows, schema=schemas.TRANSACTIONS))

    table_dir = str(tmp_path / "wh" / "dwh_fact_transactions")
    files_before = glob.glob(os.path.join(table_dir, "dt=*", "*.parquet"))
    n_before = wh.read_transactions().count()
    assert len(files_before) >= 10

    wh.compact("dwh_fact_transactions")
    files_after = glob.glob(os.path.join(table_dir, "dt=*", "*.parquet"))
    assert len(files_after) < len(files_before)
    assert wh.read_transactions().count() == n_before


def test_compact_partitioned_mart(spark, tmp_path):
    """Faithful mode re-inserts historical hits daily, so day N's mart
    append touches up to N event-day partitions — one small file each,
    O(days^2) files over a year. compact() folds each dt partition back
    to one file with identical rows."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for day in range(1, 4):  # day N re-reports event days 1..N
        rows = [
            (datetime.datetime(2021, 3, ev, 12, 0), f"P{ev}", "F", "7",
             "type", datetime.date(2021, 3, day))
            for ev in range(1, day + 1)
        ]
        wh.append_mart(spark.createDataFrame(rows, schema=schemas.REP_FRAUD))

    table_dir = str(tmp_path / "wh" / "rep_fraud")
    files_before = glob.glob(os.path.join(table_dir, "dt=*", "*.parquet"))
    rows_before = sorted(map(tuple, wh.read_mart().collect()))
    assert len(files_before) >= 6  # 1+2+3 (one per touched partition per day)

    wh.compact("rep_fraud")
    files_after = glob.glob(os.path.join(table_dir, "dt=*", "*.parquet"))
    assert len(files_after) == 3  # one per dt partition
    assert sorted(map(tuple, wh.read_mart().collect())) == rows_before


def test_legacy_mart_layout_guard_and_migration(spark, tmp_path):
    """A pre-round-4 warehouse holds an UNPARTITIONED rep_fraud; blindly
    appending dt= dirs next to root-level parquet files produces a mixed
    layout Spark partition discovery rejects. append_mart must refuse,
    and migrate_mart_layout must convert in place with identical rows."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    mart_dir = str(tmp_path / "wh" / "rep_fraud")
    legacy = spark.createDataFrame(
        [
            (datetime.datetime(2021, 3, 1, 10, 0), "11 11 111111", "A B C",
             "+7-1", "blacklisted_passport", datetime.date(2021, 3, 1)),
            (datetime.datetime(2021, 3, 2, 11, 0), "22 22 222222", "D E F",
             "+7-2", "expired_contract", datetime.date(2021, 3, 2)),
        ],
        schema=schemas.REP_FRAUD,
    )
    legacy.write.mode("overwrite").parquet(mart_dir)  # legacy flat layout

    new_day = spark.createDataFrame(
        [
            (datetime.datetime(2021, 3, 3, 12, 0), "33 33 333333", "G H I",
             "+7-3", "different_cities", datetime.date(2021, 3, 3)),
        ],
        schema=schemas.REP_FRAUD,
    )
    with pytest.raises(ValueError, match="legacy unpartitioned layout"):
        wh.append_mart(new_day)

    wh.migrate_mart_layout()
    assert glob.glob(os.path.join(mart_dir, "dt=*"))  # now partitioned
    assert not any(
        f.endswith(".parquet") for f in os.listdir(mart_dir)
    )  # no root-level data files left
    assert wh.read_mart().count() == 2

    wh.append_mart(new_day)  # appends cleanly post-migration
    assert wh.read_mart().count() == 3
    assert wh.read_mart(
        since=datetime.date(2021, 3, 3), until=datetime.date(2021, 3, 3)
    ).count() == 1
