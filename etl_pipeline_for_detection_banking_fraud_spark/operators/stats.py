"""Robust / distributional statistics operators.

Beyond-reference surface: per-group anomaly scoring (z-score outliers
— the statistical sibling of the reference's rule-based fraud flags,
reference `etl_processes.py` rule predicates) and robust location/
scale summaries (exact median + median-absolute-deviation). Both stay
in built-in aggregate/window functions — no UDFs, partial aggregation
map-side, one shuffle per grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zscore_outliers(df: DataFrame, key_col: str, value_col: str,
                    id_col: str, threshold: float = 2.0,
                    min_n: int = 5) -> DataFrame:
    """Per-key z-score anomaly flags: z = (x - avg_key) / stddev_key
    (sample stddev), keeping rows with |z| > threshold from keys with
    at least ``min_n`` observations.

    One window over the key — Spark plans a single hash-partitioned
    exchange on ``key_col`` and computes avg/stddev/count in the same
    window pass (no self-join). Skewed keys cost one straggler
    partition at worst; the window carries no ORDER BY so no per-key
    sort is needed beyond the exchange.
    """
    w = Window.partitionBy(key_col)
    x = F.col(value_col)
    z = (x - F.avg(x).over(w)) / F.stddev_samp(x).over(w)
    out = df.select(
        F.col(id_col), F.col(key_col), x.alias(value_col),
        F.count("*").over(w).alias("n_in_group"),
        z.alias("zscore"),
    )
    return out.where(
        (F.col("n_in_group") >= min_n) & (F.abs(F.col("zscore")) > threshold)
    )


def group_median_mad(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Exact per-group median and MAD (median absolute deviation) —
    the robust location/scale pair quality pipelines prefer over
    mean/stddev when the value column has heavy tails (a handful of
    giant documents should not move the 'typical document' estimate).

    Two grouped exact-percentile aggregations on the same key: the
    medians (one shuffle), broadcast back onto the rows (group
    cardinality is the number of keys, small by construction), then
    the median of |x - med| (second shuffle on the same key — AQE
    reuses the partitioning). ``F.median`` is Spark's exact
    interpolated percentile, matching DuckDB's quantile_cont(0.5).
    """
    med = df.groupBy(key_col).agg(F.median(F.col(value_col)).alias("med"))
    dev = df.join(F.broadcast(med), key_col).select(
        F.col(key_col),
        F.abs(F.col(value_col) - F.col("med")).alias("_absdev"),
    )
    mad = dev.groupBy(key_col).agg(F.median("_absdev").alias("mad"))
    counts = df.groupBy(key_col).agg(F.count("*").alias("n"))
    return (
        med.join(mad, key_col).join(counts, key_col)
        .select(key_col, "n", "med", "mad")
    )
