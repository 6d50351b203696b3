"""Warehouse fact partitioning: per-day predicates must prune partitions
at the scan (the 100 TB read-path requirement, SURVEY §4)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark import schemas
from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import Warehouse


def test_fact_scan_prunes_day_partitions(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rows = [
        (f"t{i}", datetime.datetime(2021, 3, 1 + (i % 3), 10, 0), Decimal("1.00"),
         "C1", "PAYMENT", "SUCCESS", "T")
        for i in range(30)
    ]
    tx = spark.createDataFrame(rows, schema=schemas.TRANSACTIONS)
    wh.append_transactions(tx)

    df = spark.read.parquet(str(tmp_path / "wh" / "dwh_fact_transactions"))
    pruned = df.where(F.col("dt") == "2021-03-02")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter on dt present; only 1 of 3 day-partitions selected
    assert "PartitionFilters" in plan
    assert "dt" in plan.split("PartitionFilters")[1][:200]
    assert pruned.count() == 10
    assert pruned.select("dt").distinct().count() == 1


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
