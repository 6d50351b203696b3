"""META_LOADING audit trail (reference: comm_funcs.py:13-18, SNK3)."""

from __future__ import annotations

import datetime

from pyspark.sql import SparkSession

from . import schemas
from .sources.warehouse import Warehouse

TABLE = "meta_loading"


def log_meta(wh: Warehouse, table_name: str, event_dt: datetime.date | None,
             rows_processed: int, status: str = "SUCCESS") -> None:
    spark: SparkSession = wh.spark
    row = spark.createDataFrame(
        [(table_name, event_dt, int(rows_processed), status)], schema=schemas.META_LOADING
    )
    wh.append(row, TABLE)
