"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's operator catalog (one entry per SURVEY §2 operator
family, plus the beyond-reference data-pipeline operators) over the
driver testdata, each paired with DuckDB oracle SQL in
``etl_pipeline_for_detection_banking_fraud_spark/plans/testdata_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_for_detection_banking_fraud_spark.plans import (  # noqa: E402
    oracle_sql_map,
    queries_map,
)

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the fraud-rule-4 shape (strictly-decreasing run of
    same-key events inside a time band) in its O(n log n) window
    formulation — the production path of the engine's hardest operator."""
    return queries_map()["decreasing_triple"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return queries_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
