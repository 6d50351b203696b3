"""Interval-overlap (range) join: match point events to the intervals
that contain them WITHOUT a nested-loop/cartesian plan.

Generalizes the fraud rules' fixed-width time-band joins
(`operators/fraud_rules.py` J5) to arbitrary-width intervals: the
equi-joinable coarse time bucket carries the join, the exact BETWEEN
predicate finishes it.

Scale shape: the point side maps each row to its single covering
bucket; the interval side explodes over the buckets its span touches
(``(end-start)/bucket + 1`` replicas — bounded by interval length, so
pick ``bucket_seconds`` near the TYPICAL interval length). The join is
then a plain shuffled equi-join on the bucket — partitionable, AQE-
skew-splittable, no BroadcastNestedLoopJoin anywhere. Each qualifying
(point, interval) pair matches EXACTLY once because the point's ts
lies in exactly one bucket, so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(points: DataFrame, intervals: DataFrame,
                          ts_col: str, start_col: str, end_col: str,
                          bucket_seconds: int = 3600,
                          how: str = "inner") -> DataFrame:
    """Join point rows to interval rows where
    ``start_col <= ts_col <= end_col`` (inclusive both ends).

    Columns from both inputs survive (bucket helpers are dropped);
    overlapping column names must be disambiguated by the caller
    beforehand. NULL timestamps/bounds never match (SQL semantics).

    ``how``: ``inner`` (matching pairs only) or ``left`` (every point
    survives; interval columns NULL where no interval contains it —
    exactly once per unmatched point, because a point's ts lies in one
    bucket). The BETWEEN predicate is part of the JOIN CONDITION, not a
    post-join filter — a post-filter would silently collapse the outer
    variant back to inner by dropping the NULL-bound unmatched rows.
    A left-outer on the INTERVALS side is not offered: the interval
    side is bucket-exploded, so its unmatched rows would surface once
    per spanned bucket; reverse the arguments' roles instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"interval_overlap_join: how={how!r} unsupported — 'inner' or "
            "'left' (points-preserving); interval-preserving outer joins "
            "would duplicate unmatched intervals per exploded bucket"
        )
    # Integer `div` (never float `/` + floor): bucket ids must be
    # computed EXACTLY the same on both sides or a boundary pair can
    # land in different buckets and silently vanish from the join.
    us = int(bucket_seconds) * 1_000_000
    p = points.withColumn("_pb", F.expr(f"unix_micros({ts_col}) div {us}"))
    iv = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) div {us}"),
                F.expr(f"unix_micros({end_col}) div {us}"),
            )
        ),
    )
    cond = (
        (F.col("_pb") == F.col("_ib"))
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    return p.join(iv, cond, how).drop("_pb", "_ib")
