"""META_LOADING audit trail (reference: comm_funcs.py:13-18, SNK3).

Rows are BUFFERED per warehouse and flushed as one parquet append per
pipeline run (``flush_meta``): the reference's INSERT-per-stage is free
in Postgres but a one-row-parquet-file-per-stage write here — at 100 TB
scale that is the classic small-files generator (stages x days files
degrade listing and scan parallelism on the audit table). Buffering
keeps the audit SURFACE identical (same rows, same order) while the
file count stays O(flushes) = O(days).

Durability posture: ``status`` values other than SUCCESS autoflush, so
a failing stage's ERROR row (and every buffered row before it) hits
disk before the exception propagates even if the driver dies — the
failure trail is never only in memory.
"""

from __future__ import annotations

import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import schemas
from .sources.warehouse import Warehouse

TABLE = "meta_loading"


def log_meta(wh: Warehouse, table_name: str, event_dt: datetime.date | None,
             rows_processed: int, status: str = "SUCCESS") -> None:
    """Buffer one audit row; non-SUCCESS statuses flush immediately."""
    buf = getattr(wh, "_meta_buffer", None)
    if buf is None:
        buf = []
        wh._meta_buffer = buf
    buf.append((table_name, event_dt, int(rows_processed), status))
    if status != "SUCCESS":
        flush_meta(wh)


def flush_meta(wh: Warehouse) -> None:
    """Write all buffered audit rows as ONE small-file-friendly append."""
    buf = getattr(wh, "_meta_buffer", None)
    if not buf:
        return
    spark: SparkSession = wh.spark
    # coalesce(1): createDataFrame slices local rows across the default
    # parallelism, which would write one file per non-empty slice and
    # defeat the point of buffering
    df = spark.createDataFrame(buf, schema=schemas.META_LOADING).coalesce(1)
    buf.clear()
    wh.append(df, TABLE)


def logged_stream_batches(wh: Warehouse, table_name: str) -> set[int]:
    """Batch ids with a COMMIT_BATCH_<id> marker row — the streaming
    sink's replay-detection set (read once at stream start)."""
    if not wh.exists(TABLE):
        return set()
    rows = (
        wh.read(TABLE)
        .where(
            (F.col("table_name") == table_name)
            & F.col("status").startswith("COMMIT_BATCH_")
        )
        .select("status")
        .collect()
    )
    return {int(r["status"].rsplit("_", 1)[1]) for r in rows}
