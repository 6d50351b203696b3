"""SparkSession factory with scale-aware defaults.

Local test runs use local[N]; the same configs are the ones that matter
on a 1000-executor cluster: AQE on (runtime re-plan, skew-join handling,
partition coalescing), UTC session timezone (oracle comparability),
Arrow enabled for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Open-row sentinel for SCD2 validity intervals. The reference uses
# Postgres 'infinity'::date (create_tables.sql:50); Spark has no date
# infinity, so 9999-12-31 is the engine-wide convention (SURVEY §1 S8).
SCD2_OPEN_END = "9999-12-31"


def get_spark(
    app_name: str = "fraud_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster, leave it unset and let spark-submit supply it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~cores. On a cluster this should be sized to the
        # data (targeting 128-256MB per shuffle partition); AQE coalesces
        # down from this value, so err high there.
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate synthesizes size(arr)>0 filters from
        # explode(); predicate pushdown then substitutes the FULL array
        # expression into the filter and pushes it below repartition
        # exchanges onto the (often single-task) scan — serializing the
        # heaviest per-row compute (tokenize/shingle/md5). Pure perf
        # heuristic, safe to exclude; explode drops empties anyway.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # zstd over default snappy: ~30% smaller parquet at comparable
        # scan speed — at 100 TB that is tens of TB less I/O per full
        # scan and proportionally fewer input partitions. (Runtime bloom
        # -filter join pruning and parquet filter pushdown are already on
        # by default in Spark 4 — asserted in tests/test_session_scale.py.)
        .config("spark.sql.parquet.compression.codec", "zstd")
        # TIMESTAMP_MICROS over legacy INT96: INT96 pages carry NO
        # parquet min/max statistics, which silently blinds both the
        # engine's manifest-stats file skipping (warehouse read(prune=))
        # and any other engine's row-group pruning on timestamp
        # predicates. Micros is the modern cross-engine representation
        # and lossless for Spark's internal microsecond timestamps.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # No _SUCCESS job markers: every reader in the engine ignores
        # '_'/'.'-prefixed files (warehouse.exists, the commit walk,
        # parquet scans), so the marker is a pure small-files tax — one
        # extra file + CRC per write at 100 TB append cadence — and the
        # ONLY file Spark rewrites IN PLACE in an existing directory,
        # which broke the hard-link-clone invariant the bench's
        # master-fingerprint guard enforces (legacy directory appends
        # truncate the shared _SUCCESS inode through a clone).
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
            "false",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
