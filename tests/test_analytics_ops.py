"""Planted fixtures for operators/analytics.py: funnel ordering /
window cutoffs / level-0 users, and retention bucket boundaries."""

from __future__ import annotations

import datetime

import pytest

from etl_pipeline_for_detection_banking_fraud_spark.operators.analytics import (
    cohort_retention,
    funnel_counts,
    window_funnel,
)

HOUR_US = 3600 * 1_000_000


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime.datetime(2024, 1, d, h, m), t)
         for (u, d, h, m, t) in rows],
        "user_id long, ts timestamp, event_type string",
    )


class TestWindowFunnel:
    STEPS = ("view", "click", "buy")

    def test_order_and_window_semantics(self, spark):
        rows = [
            # u1: full ordered chain inside 2h
            (1, 1, 10, 0, "view"), (1, 1, 10, 30, "click"), (1, 1, 11, 0, "buy"),
            # u2: click BEFORE view -> chain stalls at level 1
            (2, 1, 9, 0, "click"), (2, 1, 10, 0, "view"),
            # u3: click outside the 2h window of the earliest view
            (3, 1, 10, 0, "view"), (3, 1, 12, 30, "click"),
            # u4: no step-1 event at all -> level 0
            (4, 1, 10, 0, "buy"),
            # u5: greedy-earliest — a later view would qualify the click,
            # but the EARLIEST view anchors the window (documented trade)
            (5, 1, 8, 0, "view"), (5, 1, 10, 30, "view"), (5, 1, 10, 45, "click"),
        ]
        got = {
            r["user_id"]: r["level"]
            for r in window_funnel(_ev(spark, rows), self.STEPS,
                                   window_us=2 * HOUR_US).collect()
        }
        assert got == {1: 3, 2: 1, 3: 1, 4: 0, 5: 1}

    def test_same_timestamp_counts_in_order(self, spark):
        rows = [(1, 1, 10, 0, "view"), (1, 1, 10, 0, "click")]
        got = window_funnel(_ev(spark, rows), ("view", "click")).collect()
        assert got[0]["level"] == 2

    def test_no_window_means_unbounded(self, spark):
        rows = [(1, 1, 10, 0, "view"), (1, 28, 10, 0, "click")]
        got = window_funnel(_ev(spark, rows), ("view", "click")).collect()
        assert got[0]["level"] == 2

    def test_counts_aggregate(self, spark):
        rows = [
            (1, 1, 10, 0, "view"), (1, 1, 10, 5, "click"),
            (2, 1, 10, 0, "view"),
            (3, 1, 10, 0, "error"),
        ]
        got = {r["level"]: r["n_users"]
               for r in funnel_counts(_ev(spark, rows), self.STEPS).collect()}
        assert got == {2: 1, 1: 1, 0: 1}

    def test_empty_steps_rejected(self, spark):
        with pytest.raises(ValueError, match="at least one step"):
            window_funnel(_ev(spark, []), ())

    def test_single_exchange_plan(self, spark):
        rows = [(1, 1, 10, 0, "view"), (2, 1, 10, 0, "click")]
        plan = window_funnel(_ev(spark, rows), self.STEPS,
                             window_us=HOUR_US)._jdf.queryExecution() \
            .executedPlan().toString()
        # k chained windows must reuse ONE user-key exchange; the only
        # other exchange belongs to distinct()
        assert plan.count("Exchange hashpartitioning") <= 2


class TestCohortRetention:
    def test_bucket_boundaries(self, spark):
        rows = [
            (1, 1, 0, 0, "view"),    # cohort 2024-01-01, offset 0
            (1, 7, 0, 0, "view"),    # day 6 -> bucket 0
            (1, 8, 0, 0, "view"),    # day 7 -> bucket 1
            (1, 15, 0, 0, "view"),   # day 14 -> bucket 2
            (2, 8, 0, 0, "view"),    # own cohort 2024-01-08, bucket 0
        ]
        got = {
            (str(r["cohort_date"]), r["bucket_offset"]): r["n_users"]
            for r in cohort_retention(_ev(spark, rows)).collect()
        }
        assert got == {
            ("2024-01-01", 0): 1,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 2): 1,
            ("2024-01-08", 0): 1,
        }

    def test_distinct_within_bucket(self, spark):
        rows = [(1, 1, 0, 0, "view"), (1, 1, 5, 0, "click"),
                (1, 2, 0, 0, "view")]
        got = cohort_retention(_ev(spark, rows)).collect()
        assert len(got) == 1 and got[0]["n_users"] == 1

    def test_bad_bucket_rejected(self, spark):
        with pytest.raises(ValueError, match=">= 1"):
            cohort_retention(_ev(spark, []), bucket_days=0)


class TestSessionWindowTieSemantics:
    def test_exact_gap_merges_one_over_splits(self, spark):
        """Pins the convention the window_session_native catalog entry
        relies on (sf0.01 data may never produce an exact-gap pair —
        the DuckDB parity can't adjudicate the tie): Spark
        session_window MERGES a gap of EXACTLY the duration (sessions
        extend while next.ts <= prev.ts + gap) and splits one
        microsecond over it, so the lag-islands oracle's new-session
        flag must be STRICTLY greater — measured, not assumed: the
        half-open-interval reading (>= splits) is what this test
        originally asserted, and Spark refuted it."""
        from pyspark.sql import functions as F

        base = datetime.datetime(2021, 3, 1, 12, 0, 0)
        rows = [
            ("u1", base),
            ("u1", base + datetime.timedelta(minutes=30)),          # == gap
            ("u2", base),
            ("u2", base + datetime.timedelta(minutes=30,
                                             microseconds=1)),      # > gap
        ]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        got = {
            r["user_id"]: (r["n"], r["cnt"])
            for r in df.groupBy(F.session_window("ts", "30 minutes"),
                                "user_id")
            .agg(F.count("*").alias("cnt"))
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("cnt").alias("cnt"))
            .collect()
        }
        assert got == {"u1": (1, 2),   # exact gap: ONE 2-event session
                       "u2": (2, 2)}   # 1us over: two 1-event sessions
