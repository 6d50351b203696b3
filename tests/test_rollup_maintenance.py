"""Incremental rollup maintenance (streaming/rollup.py): the rollup
table equals the batch group-by after every maintained commit, survives
checkpoint restarts exactly-once, and a re-delivered microbatch no-ops
(the batch-id watermark commits atomically WITH the rollup state).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    Warehouse,
)
from etl_pipeline_for_detection_banking_fraud_spark.streaming import rollup

pytestmark = pytest.mark.slow

AGGS = {"value": ["sum", "count", "max"]}


def _events(spark, ids, etype="view"):
    return spark.createDataFrame(
        [(i, etype, float(i), datetime.date(2021, 3, 1 + i % 2))
         for i in ids],
        "event_id long, event_type string, value double, dt date",
    )


def _expected(wh):
    return {
        r["event_type"]: (r["s"], r["c"], r["m"])
        for r in wh.read("events")
        .groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count("value").alias("c"),
             F.max("value").alias("m"))
        .collect()
    }


def _got(wh):
    return {
        r["event_type"]: (r["value_sum"], r["value_count"], r["value_max"])
        for r in wh.read("agg_events").collect()
    }


class TestRollupMaintenance:
    def test_parity_restart_and_redelivery(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(_events(spark, [1, 2, 3], "view"), "events",
                      partition_by=["dt"])
        with wh.transaction():
            wh.append(_events(spark, [4, 5], "click"), "events",
                      partition_by=["dt"])

        q = rollup.maintain_rollup(
            spark, root, "events", "agg_events", ["event_type"], AGGS,
            ckpt, available_now=True)
        q.awaitTermination(180)
        assert _got(wh) == _expected(wh)

        # more facts, restart from the same checkpoint: only the new
        # commits fold in, totals stay exact
        with wh.transaction():
            wh.append(_events(spark, [6, 7], "view"), "events",
                      partition_by=["dt"])
        q2 = rollup.maintain_rollup(
            spark, root, "events", "agg_events", ["event_type"], AGGS,
            ckpt, available_now=True)
        q2.awaitTermination(180)
        assert _got(wh) == _expected(wh)

        # idle restart: nothing double-applies
        q3 = rollup.maintain_rollup(
            spark, root, "events", "agg_events", ["event_type"], AGGS,
            ckpt, available_now=True)
        q3.awaitTermination(180)
        assert _got(wh) == _expected(wh)

    def test_redelivered_batch_noops(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(_events(spark, [1, 2], "view"), "events",
                      partition_by=["dt"])
        batch = wh.read("events")
        assert rollup.apply_rollup_batch(
            wh, "agg_events", ["event_type"], AGGS, batch, 0) is True
        before = _got(wh)
        # at-least-once redelivery of the SAME batch id: watermark holds
        assert rollup.apply_rollup_batch(
            wh, "agg_events", ["event_type"], AGGS, batch, 0) is False
        assert _got(wh) == before
        # the next id folds in
        assert rollup.apply_rollup_batch(
            wh, "agg_events", ["event_type"], AGGS, batch, 1) is True
        after = _got(wh)
        assert after["view"][1] == before["view"][1] * 2  # count doubled

    def test_non_decomposable_rejected(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(_events(spark, [1]), "events", partition_by=["dt"])
        with pytest.raises(ValueError, match="not decomposable"):
            rollup.apply_rollup_batch(
                wh, "agg_events", ["event_type"], {"value": ["median"]},
                wh.read("events"), 0)


class TestCdfRollup:
    """CDF-driven rollup: exact under updates and deletes via signed
    adjustments from merge_table(cdf=True)'s change feed."""

    AGGS = {"bal": ["sum", "count"]}

    def _wh(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        snap = spark.createDataFrame(
            [(1, "x", 10.0, 0), (2, "x", 20.0, 0), (3, "y", 30.0, 0)],
            "k long, grp string, bal double, v long",
        )
        with wh.transaction():
            wh.append(snap.coalesce(1), "accounts")
        return wh

    def _expected(self, wh):
        from pyspark.sql import functions as F
        return {
            r["grp"]: (r["bal_sum"], r["bal_count"])
            for r in wh.read("accounts").groupBy("grp").agg(
                F.sum("bal").alias("bal_sum"),
                F.count("bal").alias("bal_count")).collect()
        }

    def _got(self, wh):
        return {
            r["grp"]: (r["bal_sum"], r["bal_count"])
            for r in wh.read("agg_acc").collect()
        }

    def test_updates_deletes_and_group_disappearance(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            rollup,
        )

        wh = self._wh(spark, tmp_path)
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")

        def merge(rows):
            wh.merge_table(
                "accounts",
                spark.createDataFrame(
                    rows, "k long, v long, op string, bal double, grp string"),
                key="k", version_cols=("v",),
                payload_cols=("bal", "grp"), cdf=True)

        def drain():
            q = rollup.maintain_rollup_cdf(
                spark, root, "accounts", "agg_acc", ["grp"], self.AGGS,
                ckpt, available_now=True)
            q.awaitTermination(180)

        # pre-feed rows never appear in the change feed: seed once
        assert rollup.bootstrap_rollup(
            wh, "agg_acc", ["grp"], self.AGGS, wh.read("accounts"))

        merge([(4, 1, "I", 40.0, "y")])           # insert
        drain()
        assert self._got(wh) == self._expected(wh)

        merge([(1, 1, "U", 15.0, "x"),            # update value
               (2, 1, "D", None, None)])          # delete
        drain()
        assert self._got(wh) == self._expected(wh)

        merge([(1, 2, "D", None, None)])          # group x fully deleted
        drain()
        got = self._got(wh)
        assert got == self._expected(wh) and "x" not in got

    def test_sum_only_group_disappearance(self, spark, tmp_path):
        """A fully-deleted group must drop even when aggs has NO count
        column: the internal _n row count (not a user aggregate) is the
        drop criterion, so a sum-only rollup can't leave a zero-sum
        residue row behind."""
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            rollup,
        )

        wh = self._wh(spark, tmp_path)
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        aggs = {"bal": ["sum"]}

        def merge(rows):
            wh.merge_table(
                "accounts",
                spark.createDataFrame(
                    rows, "k long, v long, op string, bal double, grp string"),
                key="k", version_cols=("v",),
                payload_cols=("bal", "grp"), cdf=True)

        def drain():
            q = rollup.maintain_rollup_cdf(
                spark, root, "accounts", "agg_sum", ["grp"], aggs,
                ckpt, available_now=True)
            q.awaitTermination(180)

        assert rollup.bootstrap_rollup(
            wh, "agg_sum", ["grp"], aggs, wh.read("accounts"))
        # delete the whole y group (single member k=3)
        merge([(3, 1, "D", None, None)])
        drain()
        got = {r["grp"]: r["bal_sum"]
               for r in wh.read("agg_sum").collect()}
        assert got == {"x": 30.0}  # no zero-sum residue row for y
        expected = {
            r["grp"]: r["s"] for r in wh.read("accounts").groupBy("grp")
            .agg(F.sum("bal").alias("s")).collect()
        }
        assert got == expected

    def test_sum_nulls_out_when_last_nonnull_deleted(self, spark, tmp_path):
        """Deleting a group's last NON-NULL value must take the sum back
        to NULL (SQL sum over only-NULLs), not leave a 0.0 residue:
        signed arithmetic alone cannot tell cancellation from absence —
        the internal _nn_<col> non-NULL count is the criterion."""
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        # group x: one non-NULL (k=1, 10.0) and one NULL (k=2) member
        snap = spark.createDataFrame(
            [(1, "x", 10.0, 0), (2, "x", None, 0)],
            "k long, grp string, bal double, v long",
        )
        with wh.transaction():
            wh.append(snap.coalesce(1), "accounts")
        aggs = {"bal": ["sum", "count"]}
        assert rollup.bootstrap_rollup(
            wh, "agg_null", ["grp"], aggs, wh.read("accounts"))
        wh.merge_table(
            "accounts",
            spark.createDataFrame([(1, 1, "D", None, None)],
                                  "k long, v long, op string, bal double, "
                                  "grp string"),
            key="k", version_cols=("v",), payload_cols=("bal", "grp"),
            cdf=True)
        ckpt = str(tmp_path / "ckpt")
        q = rollup.maintain_rollup_cdf(
            spark, str(tmp_path / "wh"), "accounts", "agg_null", ["grp"],
            aggs, ckpt, available_now=True)
        q.awaitTermination(180)
        got = {r["grp"]: (r["bal_sum"], r["bal_count"])
               for r in wh.read("agg_null").collect()}
        expected = {
            r["grp"]: (r["s"], r["c"])
            for r in wh.read("accounts").groupBy("grp").agg(
                F.sum("bal").alias("s"), F.count("bal").alias("c"))
            .collect()
        }
        assert got == expected == {"x": (None, 0)}

    def test_new_stream_against_existing_rollup_fails_fast(
            self, spark, tmp_path):
        """Fresh checkpoint dir => batch ids restart at 0; pairing them
        with the old watermark would silently no-op every batch. The
        stream identity stored beside the watermark turns that into a
        loud error instead."""
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            rollup,
        )

        wh = self._wh(spark, tmp_path)
        batch = wh.read("accounts")
        assert rollup.apply_rollup_batch(
            wh, "agg_id", ["grp"], {"bal": ["sum"]}, batch, 5,
            stream_id="stream-A") is True
        # same stream, replayed batch: silent no-op (the normal guard)
        assert rollup.apply_rollup_batch(
            wh, "agg_id", ["grp"], {"bal": ["sum"]}, batch, 5,
            stream_id="stream-A") is False
        # different stream, low batch id: fail fast, never no-op
        with pytest.raises(RuntimeError, match="maintained by streaming"):
            rollup.apply_rollup_batch(
                wh, "agg_id", ["grp"], {"bal": ["sum"]}, batch, 0,
                stream_id="stream-B")

    def test_sidecar_compaction_reemit_stays_exact(self, spark, tmp_path):
        """compact() of the __cdf sidecar mid-stream re-emits the whole
        feed under on_replace=reemit; the persisted applied-_txn set
        dedups the re-emission row-exactly, so the rollup still equals
        the batch group-by — no maintenance window needed."""
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            rollup,
        )

        wh = self._wh(spark, tmp_path)
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")

        def merge(rows):
            wh.merge_table(
                "accounts",
                spark.createDataFrame(
                    rows, "k long, v long, op string, bal double, grp string"),
                key="k", version_cols=("v",),
                payload_cols=("bal", "grp"), cdf=True)

        def drain():
            q = rollup.maintain_rollup_cdf(
                spark, root, "accounts", "agg_acc", ["grp"], self.AGGS,
                ckpt, available_now=True, on_replace="reemit")
            q.awaitTermination(180)

        assert rollup.bootstrap_rollup(
            wh, "agg_acc", ["grp"], self.AGGS, wh.read("accounts"))
        merge([(4, 1, "I", 40.0, "y")])
        drain()
        assert self._got(wh) == self._expected(wh)

        # unapplied merge, then a compaction that rewrites the feed's
        # file set, then another merge — the next batch re-emits
        # EVERYTHING; only the two new txns may fold
        merge([(5, 1, "I", 50.0, "x")])
        wh.compact("accounts__cdf")
        merge([(1, 1, "U", 15.0, "x")])
        drain()
        assert self._got(wh) == self._expected(wh)

        # and a pure re-emission (compact with nothing new) no-ops
        wh.compact("accounts__cdf")
        drain()
        assert self._got(wh) == self._expected(wh)

    def test_redelivery_noops_and_minmax_rejected(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            rollup,
        )

        wh = self._wh(spark, tmp_path)
        rollup.bootstrap_rollup(
            wh, "agg_acc", ["grp"], self.AGGS, wh.read("accounts"))
        wh.merge_table(
            "accounts",
            spark.createDataFrame([(4, 1, "I", 40.0, "y")],
                                  "k long, v long, op string, bal double, grp string"),
            key="k", version_cols=("v",), payload_cols=("bal", "grp"),
            cdf=True)
        feed = wh.read("accounts__cdf")
        assert rollup.apply_rollup_cdf_batch(
            wh, "agg_acc", ["grp"], self.AGGS, feed, 0) is True
        before = self._got(wh)
        assert rollup.apply_rollup_cdf_batch(
            wh, "agg_acc", ["grp"], self.AGGS, feed, 0) is False
        assert self._got(wh) == before
        with pytest.raises(ValueError, match="no inverse"):
            rollup.apply_rollup_cdf_batch(
                wh, "agg2", ["grp"], {"bal": ["max"]}, feed, 1)


class TestPipelineRollupIntegration:
    """The flagship composition: DailyBatch(atomic=True) commits each
    reference day as one transaction; a maintained rollup over the
    fraud mart tails those commits and stays equal to the batch
    group-by after every day — the downstream-dashboard read path that
    never rescans the mart."""

    def test_mart_rollup_tracks_daily_replay(self, spark, tmp_path):
        import os
        import tempfile

        from etl_pipeline_for_detection_banking_fraud_spark.pipeline import (
            DailyBatch,
        )
        from etl_pipeline_for_detection_banking_fraud_spark.sources.seed_dml import (
            load_seed_dims,
        )

        ref = "/root/reference/data"
        if not os.path.isdir(ref):
            pytest.skip("reference data absent")
        dims = load_seed_dims(spark, f"{ref}/ddl_dml.sql")
        root = tempfile.mkdtemp(dir=str(tmp_path))
        batch = DailyBatch(spark, root, dims, atomic=True)
        ckpt = str(tmp_path / "ckpt")
        aggs = {"event_type": ["count"]}

        def drain():
            q = rollup.maintain_rollup(
                spark, root, "rep_fraud", "agg_fraud", ["event_type"],
                aggs, ckpt, available_now=True)
            q.awaitTermination(300)

        def expected():
            return {
                r["event_type"]: r["n"]
                for r in batch.wh.read("rep_fraud")
                .groupBy("event_type").agg(F.count("*").alias("n"))
                .collect()
            }

        def got():
            return {
                r["event_type"]: r["event_type_count"]
                for r in batch.wh.read("agg_fraud").collect()
            }

        D = f"{ref}/data"
        for day in ("01032021", "02032021"):
            batch.run_day(
                f"{D}/transactions_{day}.txt",
                f"{D}/passport_blacklist_{day}.xlsx",
                f"{D}/terminals_{day}.xlsx",
            )
            drain()
            assert got() == expected()


class TestBootstrapAppendOnlyCompose:
    def test_bootstrap_then_append_only_fold(self, spark, tmp_path):
        """A rollup seeded by bootstrap_rollup carries the _n/_nn
        internals; the APPEND-ONLY fold must maintain them (not fail
        the union), and the rollup stays exact and CDF-resumable."""
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        aggs = {"value": ["sum", "count"]}
        with wh.transaction():
            wh.append(_events(spark, [1, 2, 3], "view"), "events",
                      partition_by=["dt"])
        assert rollup.bootstrap_rollup(
            wh, "agg_events", ["event_type"], aggs, wh.read("events"))
        stored = wh.read("agg_events")
        assert "_n" in stored.columns and "_nn_value" in stored.columns
        # append-only fold over the seeded rollup: maintains internals
        with wh.transaction():
            wh.append(_events(spark, [4, 5], "click"), "events",
                      partition_by=["dt"])
        batch = _events(spark, [4, 5], "click")
        assert rollup.apply_rollup_batch(
            wh, "agg_events", ["event_type"], aggs, batch, 0)
        got = {r["event_type"]: (r["value_sum"], r["value_count"],
                                 r["_n"], r["_nn_value"])
               for r in wh.read("agg_events").collect()}
        assert got["view"] == (6.0, 3, 3, 3)
        assert got["click"] == (9.0, 2, 2, 2)

    def test_plain_rollup_untouched_by_internals_path(self, spark, tmp_path):
        """A rollup built append-only (no internals) keeps its exact
        schema and values through further append-only folds."""
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        aggs = {"value": ["sum", "count"]}
        for i, ids in enumerate(([1, 2], [3])):
            batch = _events(spark, ids, "view")
            with wh.transaction():
                wh.append(batch, "events", partition_by=["dt"])
            assert rollup.apply_rollup_batch(
                wh, "agg_events", ["event_type"], aggs, batch, i)
        out = wh.read("agg_events")
        assert "_n" not in out.columns
        row = out.collect()[0]
        assert (row["value_sum"], row["value_count"]) == (6.0, 3)


class TestAvailableNowCapsWarning:
    def test_warns_on_available_now_with_caps(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(_events(spark, [1, 2], "view"), "events",
                      partition_by=["dt"])
        with pytest.warns(UserWarning, match="SINGLE-BATCH"):
            q = rollup.maintain_rollup(
                spark, root, "events", "agg_events", ["event_type"],
                {"value": ["sum"]}, str(tmp_path / "ckpt"),
                available_now=True, max_files_per_trigger=1)
            q.awaitTermination(120)
