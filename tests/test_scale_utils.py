"""Scale-utility tests: bucketed joins must read shuffle-free; salted
joins must produce exactly the unsalted result."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.operators import scale


def test_bucketed_join_has_no_exchange(spark, sf01):
    # session warehouse dir points at a temp dir (conftest)
    orders = spark.read.parquet(f"{sf01}/orders.parquet")
    customer = spark.read.parquet(f"{sf01}/customer.parquet")
    scale.write_bucketed(
        orders.select(F.col("o_custkey").alias("k"), "o_orderkey"), "b_orders", "k", 8
    )
    scale.write_bucketed(
        customer.select(F.col("c_custkey").alias("k"), "c_name"), "b_customer", "k", 8
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_customer"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() == 15000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_matches_plain_join(spark, sf01):
    orders = spark.read.parquet(f"{sf01}/orders.parquet").select(
        F.col("o_custkey").alias("k"), "o_orderkey"
    )
    customer = spark.read.parquet(f"{sf01}/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    plain = orders.join(customer, "k").select("k", "o_orderkey", "c_name")
    salted = scale.salted_join(orders, customer, "k").select("k", "o_orderkey", "c_name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
