"""Metadata-only COUNT(*) (count_rows): commit entries carry parquet
footer row counts per file (reserved ``__rows`` stats key), so
counting a tracked table is a driver-side sum — zero Spark jobs —
with exact-scan fallbacks for stats-less adopted files, live deletion
vectors, and legacy layouts."""

import os

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import Warehouse
from etl_pipeline_for_detection_banking_fraud_spark.sql_door import warehouse_sql


def _wh(spark, tmp_path, name="w"):
    root = os.path.join(str(tmp_path), name)
    os.makedirs(root, exist_ok=True)
    return Warehouse(spark, root)


def test_count_matches_scan_through_lifecycle(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(i, float(i)) for i in range(100)],
            "k int, v double").repartition(4), "t")
    assert wh.count_rows("t") == 100 == wh.read("t").count()
    a = wh.snapshots()[-1]["seq"]

    wh.append(spark.createDataFrame([(100, 1.0), (101, 2.0)],
                                    "k int, v double"), "t")
    assert wh.count_rows("t") == 102

    assert wh.delete_where("t", "k < 10") == 10
    assert wh.count_rows("t") == 92 == wh.read("t").count()

    wh.update_where("t", "k = 50", {"v": "0.0"})
    assert wh.count_rows("t") == 92

    wh.compact("t")
    assert wh.count_rows("t") == 92

    # time travel: the count replays the OLD manifest
    assert wh.count_rows("t", at=a) == 100


def test_count_with_live_deletion_vectors_is_exact(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(i,) for i in range(50)], "k int").coalesce(2), "t")
    wh.delete_where("t", "k in (1, 2, 3)", mode="dv")
    # dv live: falls back to the dv-aware scan, stays exact
    assert wh.count_rows("t") == 47 == wh.read("t").count()
    wh.compact("t")  # folds the vectors; back to pure metadata
    assert wh.count_rows("t") == 47


def test_count_adopted_legacy_files_fallback(spark, tmp_path):
    """Adopted legacy files carry no stats: their rows are counted by
    one scan over JUST those files, summed with the metadata rows."""
    wh = _wh(spark, tmp_path)
    wh.append(spark.createDataFrame([(1,), (2,)], "k int"), "legacy")
    with wh.transaction() as t:  # adopts the raw files, appends more
        t.append(spark.createDataFrame([(3,)], "k int"), "legacy")
    assert wh.count_rows("legacy") == 3 == wh.read("legacy").count()


def test_describe_detail_carries_num_rows(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(i,) for i in range(7)],
                                       "k int"), "t")
    det = warehouse_sql(wh, "DESCRIBE DETAIL t").collect()[0]
    assert det["num_rows"] == 7
