"""Local-rows -> DataFrame without the per-slice Python-worker tax.

``spark.createDataFrame(list, schema)`` parallelizes the rows across
``defaultParallelism`` Python slices. Every ACTION over such a frame
replays one Python-worker round-trip per slice — and a ``coalesce(1)``
(the natural shape for a tiny audit/metadata write) serializes all of
them into ONE task: measured ~0.19 s per slice x 32 slices ≈ 6 s per
action for a 10-row frame, vs 0.2 s through a single slice. Control
planes (audit flush, xlsx feeds, seed dims, TVF outputs, empty-table
reads) build many such frames per pipeline day, so the tax was the
single largest line item of the 3-day replay (~35 s of ~90 s).

Two shapes, both semantics-preserving:

- ``local_rows_df``: the normal row-verification path of
  ``createDataFrame`` (exact type coercion semantics — no pandas/Arrow
  dtype detours for date/None cells), just through ONE slice.
- ``empty_df``: a zero-partition RDD — the frame carries the schema
  verbatim (nullability included, asserted in tests) and no action on
  it ever launches a Python worker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame(rows, schema)`` through a single slice.

    One Python partition instead of ``defaultParallelism`` of them: a
    downstream single-task stage (coalesce(1), global agg, tiny write)
    pays ONE worker round-trip, not one per slice. Local rows are
    driver-resident by definition, so a single slice loses nothing —
    anything big enough to want parallel slices should not be a local
    list in the first place.
    """
    rows = list(rows)
    if not rows:
        return empty_df(spark, schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def empty_df(spark: SparkSession, schema) -> DataFrame:
    """Typed empty DataFrame over a ZERO-partition RDD: schema
    (nullability included) carried verbatim, and unions/actions over it
    never touch a Python worker — unlike ``createDataFrame([], schema)``,
    whose empty Python slices still each cost a worker round-trip in
    every job that scans them."""
    return spark.createDataFrame(spark.sparkContext.emptyRDD(), schema)
