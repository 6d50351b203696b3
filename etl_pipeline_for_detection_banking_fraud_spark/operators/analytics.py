"""Behavioral analytics over event streams: ordered-funnel matching and
cohort retention.

Beyond-reference operators (the reference's mart answers "which
transactions are fraud"; an analytics engine over the same event model
must also answer "how do users move through steps" and "do they come
back"). Both are pure window/aggregate compositions — no joins, no UDFs,
one hash exchange on the user key — so they hold at 100 TB: the only
shuffle is partitionBy(user), and every subsequent window pass reuses
that partitioning (Catalyst plans one Exchange feeding chained
WindowExecs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def window_funnel(df: DataFrame, steps: Sequence[str],
                  window_us: int | None = None,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: per user, how many of ``steps`` completed IN
    ORDER, with the whole chain inside ``window_us`` of step 1 (the
    ClickHouse ``windowFunnel`` shape, greedy-earliest matching).

    Semantics: t1 = the user's earliest step-1 event; t_k = the
    earliest step-k event at/after t_{k-1} and within the window of t1.
    ``level`` = number of non-null t_k (the chain is monotone: a null
    t_k nulls everything after it). Greedy-earliest is deterministic
    and SQL-mirrorable; it can under-count versus full backtracking
    when an early step-1 event "uses up" the window — the standard
    trade every SQL funnel makes.

    One row per user with a step-1 event is NOT guaranteed — users with
    no step-1 event return level 0 rows too, so downstream conversion
    denominators are explicit rather than silently filtered.

    Scale: k sequential window passes over ONE partitionBy(user)
    exchange; no self-joins (a k-way self-join funnel is O(n^k) in the
    worst case — this is O(n log n) sort + k linear passes).
    """
    if not steps:
        raise ValueError("window_funnel needs at least one step")
    w = Window.partitionBy(user_col)
    cur = df.select(user_col, ts_col, type_col)
    for i, step in enumerate(steps):
        cond: Column = F.col(type_col) == step
        if i > 0:
            cond = cond & (F.col(ts_col) >= F.col(f"_t{i - 1}"))
            if window_us is not None:
                cond = cond & (
                    F.unix_micros(F.col(ts_col))
                    - F.unix_micros(F.col("_t0")) <= window_us
                )
        # one projection per step: each window reads the PREVIOUS
        # projection's materialized t-column (nesting windows in one
        # select diverges frame semantics — see sessionize's note)
        cur = cur.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
    level = F.lit(0)
    for i in range(len(steps)):
        level = F.when(F.col(f"_t{i}").isNotNull(), F.lit(i + 1)).otherwise(level)
    return cur.select(F.col(user_col), level.alias("level")).distinct()


def funnel_counts(df: DataFrame, steps: Sequence[str],
                  window_us: int | None = None,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Aggregate funnel report: users per deepest-level reached."""
    per_user = window_funnel(df, steps, window_us, user_col, ts_col,
                             type_col)
    return per_user.groupBy("level").agg(
        F.count("*").alias("n_users")
    )


def cohort_retention(df: DataFrame, bucket_days: int = 7,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST activity
    date (the cohort), counted per ``bucket_days``-sized offset bucket
    in which they were active again — the classic week-N retention
    triangle when ``bucket_days=7`` (offset 0 = the cohort bucket
    itself, so its count is the cohort size).

    Window form, not a firsts-table self-join: cohort_date rides a
    min-over-user window on the same exchange the distinct needs, so
    the whole matrix is one shuffle on user plus one aggregate.
    """
    if bucket_days < 1:
        raise ValueError("bucket_days must be >= 1")
    d = F.to_date(F.col(ts_col))
    w = Window.partitionBy(user_col)
    x = df.select(
        F.col(user_col).alias("_u"),
        d.alias("_d"),
        F.min(d).over(w).alias("cohort_date"),
    )
    offset = F.floor(F.datediff(F.col("_d"), F.col("cohort_date"))
                     / bucket_days).cast("long")
    return (
        x.select("_u", "cohort_date", offset.alias("bucket_offset"))
        .groupBy("cohort_date", "bucket_offset")
        .agg(F.count_distinct("_u").alias("n_users"))
    )
