"""Parquet medallion warehouse (SURVEY §1 layer mapping).

The reference's warehouse is a Postgres schema; this engine's is a
directory of parquet tables:

- append tables (facts, report mart, audit): flat directory,
  ``mode=append`` writes. DWH_FACT_TRANSACTIONS is hive-partitioned by
  transaction day so per-day predicates prune partitions at 100 TB.
- rewrite tables (the SCD2 dimension): versioned subdirectories
  ``v=N/`` — Spark cannot overwrite a path it is currently reading, and
  version-swap gives atomic replace + history. On a production object
  store you would use Delta/Iceberg for this (same code shape, MERGE
  instead of union-rewrite); the jars are not in this image, so the
  versioned-dir backend keeps the engine dependency-free.
"""

from __future__ import annotations

import datetime
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table.lower())

    def exists(self, table: str) -> bool:
        """True iff the table directory holds actual DATA files.

        A partitioned append of an EMPTY DataFrame writes only a
        _SUCCESS marker (no partition dirs, no part files) — Spark then
        fails schema inference on the read. Such a table must read as
        empty-typed, so marker/hidden files don't count; one level of
        subdirectories covers the ``dt=``/``v=N`` layouts."""
        p = self._path(table)
        if not os.path.isdir(p):
            return False
        for entry in os.scandir(p):
            if entry.name.startswith(("_", ".")):
                continue
            if entry.is_file():
                return True
            for sub in os.scandir(entry.path):
                if not sub.name.startswith(("_", ".")):
                    return True
        return False

    # -- append tables ------------------------------------------------------

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        """Read a table; an absent table reads as an empty typed DataFrame.

        With ``schema`` given, the result is projected to exactly the
        schema's columns (in order): hive partition columns like ``dt``
        that the writer added for pruning are physical layout, not part
        of the logical table."""
        if not self.exists(table):
            if schema is None:
                raise FileNotFoundError(f"table {table} absent and no schema given")
            return self.spark.createDataFrame([], schema=schema)
        p = self._path(table)
        versions = _versions(p)
        if versions:
            df = self.spark.read.parquet(os.path.join(p, f"v={versions[-1]}"))
        else:
            df = self.spark.read.parquet(p)
        if schema is not None:
            df = df.select(*[f.name for f in schema.fields])
        return df

    # -- versioned rewrite tables -------------------------------------------

    def rewrite(self, df: DataFrame, table: str, keep_versions: int = 3) -> None:
        """Atomically replace a table's contents (for union-rewritten dims)."""
        p = self._path(table)
        os.makedirs(p, exist_ok=True)
        versions = _versions(p)
        nxt = (versions[-1] + 1) if versions else 1
        df.write.mode("overwrite").parquet(os.path.join(p, f"v={nxt}"))
        for old in versions[:-keep_versions + 1] if keep_versions > 1 else versions:
            shutil.rmtree(os.path.join(p, f"v={old}"), ignore_errors=True)

    def compact(self, table: str, target_files_per_partition: int = 1) -> None:
        """Rewrite an append table to coalesce small files.

        Daily appends accumulate one file-set per batch; at 100 TB the
        resulting small-files problem degrades scan parallelism and
        NameNode/listing pressure. Periodic compaction rewrites each
        hive partition into `target_files_per_partition` files.

        Append tables only: a versioned-rewrite table (v=N subdirs) is
        refused — read.parquet(root) would merge every version into one
        duplicated table. The two-rename swap below is atomic enough for
        a local/HDFS filesystem but NOT for object stores (no atomic
        rename); on S3-class storage route compaction through
        Delta/Iceberg OPTIMIZE instead.
        """
        if _versions(self._path(table)):
            raise ValueError(
                f"compact() is for append tables; {table} is a versioned "
                "rewrite table — its rewrite already replaces whole files"
            )
        df = self.spark.read.parquet(self._path(table))
        part_cols = [c for c in df.columns if c == "dt"]
        if part_cols:
            out = df.repartition(target_files_per_partition, *part_cols)
            tmp = self._path(table) + ".compact"
            out.write.mode("overwrite").partitionBy(*part_cols).parquet(tmp)
        else:
            out = df.coalesce(target_files_per_partition)
            tmp = self._path(table) + ".compact"
            out.write.mode("overwrite").parquet(tmp)
        final = self._path(table)
        trash = final + ".old"
        os.rename(final, trash)
        os.rename(tmp, final)
        shutil.rmtree(trash, ignore_errors=True)

    # -- transactions fact convenience ---------------------------------------

    def append_transactions(self, df: DataFrame, table: str = "dwh_fact_transactions") -> None:
        """Fact append, hive-partitioned by transaction day (partition pruning)."""
        self.append(
            df.withColumn("dt", F.to_date("transaction_date")),
            table,
            partition_by=["dt"],
        )

    # -- fraud-mart convenience ----------------------------------------------

    def append_mart(self, df: DataFrame, table: str = "rep_fraud") -> None:
        """Mart append, hive-partitioned by event day.

        The mart grows with every day's hits; the rules' NOT-EXISTS
        dedup joins on ``event_dt`` EQUALITY, so a day's dedup only ever
        needs the mart rows whose event day falls in that day's rule
        band. Partitioning by ``dt = date(event_dt)`` turns that into a
        partition-pruned read (``read_mart(since, until)``) — the dedup
        stays O(band), not O(all historical hits), at 100 TB.

        LAYOUT NOTE: the mart became dt-partitioned in round 4. A
        warehouse written by an older build holds an UNPARTITIONED
        ``rep_fraud`` — appending here would mix root-level files with
        ``dt=`` dirs, which Spark partition discovery rejects. Guarded:
        a legacy layout raises with a one-shot migration recipe
        (rewrite through ``migrate_mart_layout``) instead of silently
        corrupting the table."""
        path = self._path(table)
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            raise ValueError(
                f"{table} has a legacy unpartitioned layout at {path}; "
                "run Warehouse.migrate_mart_layout() once before appending"
            )
        self.append(
            df.withColumn("dt", F.to_date("event_dt")), table, partition_by=["dt"]
        )

    def migrate_mart_layout(self, table: str = "rep_fraud") -> None:
        """One-shot migration of a pre-round-4 UNPARTITIONED mart to the
        dt-partitioned layout (tmp-write + rename swap, same atomicity
        caveats as ``compact``). No-op if already partitioned/absent."""
        p = self._path(table)
        if not os.path.isdir(p) or not any(
            f.endswith(".parquet") for f in os.listdir(p)
        ):
            return
        df = self.spark.read.parquet(p)
        if "dt" not in df.columns:
            df = df.withColumn("dt", F.to_date("event_dt"))
        tmp = p + ".migrate"
        df.write.mode("overwrite").partitionBy("dt").parquet(tmp)
        trash = p + ".old"
        os.rename(p, trash)
        os.rename(tmp, p)
        shutil.rmtree(trash, ignore_errors=True)

    def read_mart(self, table: str = "rep_fraud",
                  since: "datetime.date | None" = None,
                  until: "datetime.date | None" = None) -> DataFrame:
        """Mart read; `since`/`until` prune on the `dt` partition column
        (same mechanics as ``read_transactions``)."""
        from .. import schemas

        if not self.exists(table):
            return self.spark.createDataFrame([], schema=schemas.REP_FRAUD)
        df = self.read(table)
        if since is not None:
            df = df.where(F.col("dt") >= F.lit(since))
        if until is not None:
            df = df.where(F.col("dt") <= F.lit(until))
        return df.select(*[f.name for f in schemas.REP_FRAUD.fields])

    def read_transactions(self, table: str = "dwh_fact_transactions",
                          since: "datetime.date | None" = None,
                          until: "datetime.date | None" = None) -> DataFrame:
        """Fact read; `since`/`until` filter on the `dt` partition column
        BEFORE it is dropped, so Catalyst turns them into PartitionFilters
        and the scan only lists the matching day directories — the read
        stays O(days requested), not O(history), at 100 TB."""
        from .. import schemas

        if not self.exists(table):
            return self.spark.createDataFrame([], schema=schemas.TRANSACTIONS)
        df = self.read(table)
        if since is not None:
            df = df.where(F.col("dt") >= F.lit(since))
        if until is not None:
            df = df.where(F.col("dt") <= F.lit(until))
        return df.drop("dt")


def _versions(path: str) -> list[int]:
    out = []
    for entry in os.listdir(path):
        m = re.fullmatch(r"v=(\d+)", entry)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)
