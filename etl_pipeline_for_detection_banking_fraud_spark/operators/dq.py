"""Data-quality expectations: declarative checks evaluated in one pass.

A Deequ/Delta-constraints-style surface: each check is a named aggregate
metric over a table plus a comparison that decides pass/fail. All of a
table's metrics evaluate in a SINGLE global aggregate (one reduce
exchange regardless of how many checks ride on it), then unpivot to one
row per check — at 100 TB the cost is one scan of the table, identical
to computing a single count(*).

Cross-table checks (referential integrity) are just expectations over a
joined frame; ``union_all`` stitches suites from several tables into one
report. Output contract: (check string, value double, passed boolean),
deterministic — every metric is an aggregate, never a row sample.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = ("==", "<=", ">=")


@dataclass(frozen=True)
class Check:
    """One expectation: aggregate ``metric`` compared against ``bound``."""

    name: str
    metric: Column  # aggregate expression, cast to double by run
    op: str  # one of _OPS
    bound: float


def _passed(value: Column, op: str, bound: float) -> Column:
    if op == "==":
        return value == F.lit(bound)
    if op == "<=":
        return value <= F.lit(bound)
    if op == ">=":
        return value >= F.lit(bound)
    raise ValueError(f"op must be one of {_OPS}, got {op!r}")


def run_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregate over ``df``.

    Returns (check, value, passed), one row per check. The single agg
    row is unpivoted via an inline array-of-structs (no extra shuffle,
    no per-check job).
    """
    if not checks:
        raise ValueError("run_expectations needs at least one check")
    seen: set[str] = set()
    for c in checks:
        if c.name in seen:
            raise ValueError(f"duplicate check name {c.name!r}")
        seen.add(c.name)
    agg_row = df.agg(
        *[c.metric.cast("double").alias(c.name) for c in checks]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.col(c.name).alias("value"),
                _passed(F.col(c.name), c.op, c.bound).alias("passed"),
            )
            for c in checks
        ]
    )
    return agg_row.select(F.inline(rows))


def union_all(*reports: DataFrame) -> DataFrame:
    """Stitch per-table expectation reports into one suite result."""
    return reduce(lambda a, b: a.unionByName(b), reports)
