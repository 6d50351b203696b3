"""Transactions CSV source (reference: main.py:43-66, SURVEY §2 SRC1).

Distributed scan with an explicit schema — no inference pass. The
decimal-comma amount ('1046,40') is parsed JVM-side to Decimal(10,2)
(exact; the reference round-trips through float64, main.py:49). At
100 TB the CSV scan splits by HDFS block; all casts stay inside
whole-stage codegen.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..functions.scalars import decimal_comma_amount


def read_transactions(spark: SparkSession, path: str) -> DataFrame:
    """Read one daily transactions feed into the typed staging shape."""
    raw = spark.read.csv(path, sep=";", header=True, schema=schemas.TRANSACTIONS_RAW)
    return raw.select(
        F.col("transaction_id"),
        F.to_timestamp("transaction_date", "yyyy-MM-dd HH:mm:ss").alias("transaction_date"),
        decimal_comma_amount("amount").alias("amount"),
        F.col("card_num"),
        F.col("oper_type"),
        F.col("oper_result"),
        F.col("terminal"),
    )


def extract_date_global(transactions: DataFrame) -> datetime.date:
    """Report date = the (single) calendar date of the day's feed.

    The reference grabs row 0's date (main.py:53) and trusts the file to
    be single-date. min==max validates that assumption in one
    distributed pass instead of trusting row order.
    """
    return count_and_date_global(transactions)[1]


def count_and_date_global(transactions: DataFrame) -> tuple[int, datetime.date]:
    """Row count + the feed's (single) calendar date in ONE scan.

    The pipeline needs both per day (audit row + report date); computing
    them in separate jobs re-read the whole CSV feed twice a day — one
    combined aggregate halves the ingest scans (guide §2.4: don't
    compute in two passes what one pass carries for free)."""
    row = transactions.select(
        F.count("*").alias("n"),
        F.min(F.to_date("transaction_date")).alias("lo"),
        F.max(F.to_date("transaction_date")).alias("hi"),
    ).first()
    if row.lo != row.hi:
        raise ValueError(f"feed spans multiple dates: {row.lo}..{row.hi}")
    return int(row.n), row.lo
