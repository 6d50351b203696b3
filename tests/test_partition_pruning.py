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
