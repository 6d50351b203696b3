"""Edge-case semantics for the round-5 lakehouse operators (the
catalog's oracle parity covers the happy path at sf0.01; these pin the
corners the testdata never hits)."""

from __future__ import annotations

import datetime
import hashlib

import pytest

from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.operators import (
    cdc,
    chunking,
    ranges,
    scale,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


class TestApplyChangelog:
    def test_update_delete_insert_passthrough(self, spark):
        snap = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, name string, bal double",
        )
        # key2: two updates out of version order -> v2 wins
        # key3: delete; key4: insert (not in snapshot); key1: untouched
        changes = spark.createDataFrame(
            [
                (2, 2, "U", 99.0),
                (2, 1, "U", 55.0),
                (3, 1, "D", None),
                (4, 1, "I", 40.0),
            ],
            "k long, v long, op string, bal double",
        )
        out = cdc.apply_changelog(
            snap, changes, key="k", version_cols=("v",),
            payload_cols=("bal",),
        )
        rows = {r["k"]: r for r in out.collect()}
        assert set(rows) == {1, 2, 4}
        assert rows[1]["bal"] == 10.0 and rows[1]["name"] == "a"
        assert rows[2]["bal"] == 99.0 and rows[2]["name"] == "b"
        assert rows[4]["bal"] == 40.0 and rows[4]["name"] is None
        assert out.columns == snap.columns

    def test_delete_then_reinsert_latest_wins(self, spark):
        snap = spark.createDataFrame([(1, 1.0)], "k long, bal double")
        changes = spark.createDataFrame(
            [(1, 1, "D", None), (1, 2, "I", 7.0)],
            "k long, v long, op string, bal double",
        )
        out = cdc.apply_changelog(
            snap, changes, key="k", version_cols=("v",),
            payload_cols=("bal",),
        ).collect()
        assert len(out) == 1 and out[0]["bal"] == 7.0


class TestChunkTokens:
    def _chunks(self, spark, text, size=4, stride=3):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return (
            chunking.chunk_tokens(df, size=size, stride=stride)
            .orderBy("chunk_no")
            .collect()
        )

    def test_empty_doc_yields_no_chunks(self, spark):
        assert self._chunks(spark, "   ") == []

    def test_exact_window_single_chunk(self, spark):
        rows = self._chunks(spark, "a b c d", size=4, stride=4)
        assert len(rows) == 1
        assert rows[0]["n_tokens"] == 4
        assert rows[0]["chunk_md5"] == hashlib.md5(b"a b c d").hexdigest()

    def test_overlap_and_clipping(self, spark):
        # 5 tokens, size 4, stride 3 -> starts 0 and 3
        rows = self._chunks(spark, "a b c d e", size=4, stride=3)
        assert [(r["chunk_no"], r["n_tokens"]) for r in rows] == [(0, 4), (1, 2)]
        assert rows[1]["chunk_md5"] == hashlib.md5(b"d e").hexdigest()

    def test_lowercased_whitespace_tokens(self, spark):
        rows = self._chunks(spark, "  A \t B\nc ", size=10, stride=10)
        assert rows[0]["n_tokens"] == 3
        assert rows[0]["chunk_md5"] == hashlib.md5(b"a b c").hexdigest()


class TestDedupChunks:
    def _run(self, spark, docs, size=2):
        df = spark.createDataFrame(docs, "doc_id long, text string")
        return {
            r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_clean"])
            for r in chunking.dedup_chunks(df, size=size).collect()
        }

    def test_first_occurrence_survives_later_repeats_drop(self, spark):
        got = self._run(
            spark,
            [(1, "a b c d"), (2, "a b x y"), (3, "c d a b")],
            size=2,
        )
        # chunks: doc1 ["a b","c d"], doc2 ["a b","x y"], doc3 ["c d","a b"]
        # "a b" first at (1,0); "c d" first at (1,1)
        assert got[1] == (2, 2, "a b c d")
        assert got[2] == (2, 1, "x y")
        assert got[3] == (2, 0, "")

    def test_within_doc_repeat_also_dedups(self, spark):
        got = self._run(spark, [(7, "p q p q")], size=2)
        assert got[7] == (2, 1, "p q")

    def test_clipped_tail_chunk_is_distinct(self, spark):
        # "a b" (full) vs trailing "a" (clipped) are different chunks
        got = self._run(spark, [(1, "a b a")], size=2)
        assert got[1] == (2, 2, "a b a")

    def test_empty_doc_absent_from_output(self, spark):
        got = self._run(spark, [(1, "   "), (2, "z z")], size=2)
        assert 1 not in got and got[2] == (1, 1, "z z")


class TestIntervalOverlapJoin:
    def test_matches_naive_cross_filter(self, spark):
        # Intervals spanning multiple 1h buckets + boundary-equal points
        points = spark.createDataFrame(
            [
                (1, _ts("2021-03-01 00:00:00")),
                (2, _ts("2021-03-01 00:59:59")),
                (3, _ts("2021-03-01 02:30:00")),
                (4, _ts("2021-03-01 05:00:00")),
                (5, _ts("2021-03-02 00:00:00")),
            ],
            "pid long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [
                (10, _ts("2021-03-01 00:00:00"), _ts("2021-03-01 05:00:00")),
                (11, _ts("2021-03-01 02:00:00"), _ts("2021-03-01 02:59:00")),
                (12, _ts("2021-03-03 00:00:00"), _ts("2021-03-03 01:00:00")),
            ],
            "ivid long, start_ts timestamp, end_ts timestamp",
        )
        got = sorted(
            (r["pid"], r["ivid"])
            for r in ranges.interval_overlap_join(
                points, intervals, "ts", "start_ts", "end_ts",
                bucket_seconds=3600,
            ).collect()
        )
        naive = sorted(
            (r["pid"], r["ivid"])
            for r in points.crossJoin(intervals)
            .where(
                (F.col("ts") >= F.col("start_ts"))
                & (F.col("ts") <= F.col("end_ts"))
            )
            .collect()
        )
        assert got == naive
        assert (1, 10) in got and (4, 10) in got  # inclusive both ends

    def test_null_ts_never_matches(self, spark):
        points = spark.createDataFrame(
            [(1, None)], "pid long, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [(10, _ts("2021-03-01 00:00:00"), _ts("2021-03-01 05:00:00"))],
            "ivid long, start_ts timestamp, end_ts timestamp",
        )
        assert (
            ranges.interval_overlap_join(
                points, intervals, "ts", "start_ts", "end_ts"
            ).count()
            == 0
        )

    def test_left_preserves_unmatched_points_once(self, spark):
        """Round-5 advisor: `how` used to be applied before a post-join
        BETWEEN filter, silently collapsing left to inner. The predicate
        now lives in the join condition: unmatched points (including
        NULL-ts ones) survive exactly once with NULL interval columns."""
        points = spark.createDataFrame(
            [
                (1, _ts("2021-03-01 02:30:00")),  # inside interval 10
                (2, _ts("2021-03-05 00:00:00")),  # matches nothing
                (3, None),                        # NULL ts: unmatched
            ],
            "pid long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [(10, _ts("2021-03-01 00:00:00"), _ts("2021-03-01 05:00:00"))],
            "ivid long, start_ts timestamp, end_ts timestamp",
        )
        rows = {
            r["pid"]: r["ivid"]
            for r in ranges.interval_overlap_join(
                points, intervals, "ts", "start_ts", "end_ts", how="left"
            ).collect()
        }
        assert rows == {1: 10, 2: None, 3: None}

    def test_interval_preserving_outer_refused(self, spark):
        points = spark.createDataFrame([(1, None)], "pid long, ts timestamp")
        with pytest.raises(ValueError, match="unsupported"):
            ranges.interval_overlap_join(
                points, points, "ts", "ts", "ts", how="right"
            )


class TestPrefilterSemiJoin:
    def test_exact_even_with_forced_collisions(self, spark):
        # buckets=2 makes nearly every probe row survive the prefilter;
        # the second-stage exact semi-join must still remove them all.
        probe = spark.range(0, 1000).select(F.col("id").alias("k"))
        build = spark.createDataFrame(
            [(3,), (500,), (999,), (1500,)], "bk long"
        )
        got = sorted(
            r["k"]
            for r in scale.prefilter_semi_join(
                probe, build, "k", "bk", buckets=2
            ).collect()
        )
        assert got == [3, 500, 999]

    def test_matches_plain_semi_join(self, spark, sf01):
        li = spark.read.parquet(f"{sf01}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber"
        )
        orders = spark.read.parquet(f"{sf01}/orders.parquet").where(
            F.col("o_totalprice") > 300000
        )
        got = scale.prefilter_semi_join(
            li, orders, "l_orderkey", "o_orderkey"
        )
        want = li.join(
            orders, li.l_orderkey == orders.o_orderkey, "left_semi"
        )
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0


class TestWarehouseMerge:
    def test_merge_is_atomic_and_time_travelable(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        snap = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, name string, bal double",
        )
        with wh.transaction():
            wh.append(snap.coalesce(1), "accounts")
        pre_seq = max(s["seq"] for s in wh.snapshots())

        changes = spark.createDataFrame(
            [(2, 1, "U", 99.0), (3, 1, "D", None), (4, 1, "I", 40.0)],
            "k long, v long, op string, bal double",
        )
        wh.merge_table(
            "accounts", changes, key="k", version_cols=("v",),
            payload_cols=("bal",),
        )
        rows = {r["k"]: r["bal"] for r in wh.read("accounts").collect()}
        assert rows == {1: 10.0, 2: 99.0, 4: 40.0}
        # the merge is one replace entry; the pre-merge snapshot is
        # still readable (old files are retained, not deleted)
        kinds = [s["op"] for s in wh.snapshots()]
        assert kinds.count("replace") == 1
        pre = {r["k"]: r["bal"]
               for r in wh.read_at("accounts", pre_seq).collect()}
        assert pre == {1: 10.0, 2: 20.0, 3: 30.0}

    def test_vacuum_keeps_merge_history_readable(self, spark, tmp_path):
        """vacuum_orphans must NOT strand time travel: merge_table's
        replace retains the pre-merge files as readable history (and
        runs vacuum itself on conflict retry), so only files no
        committed entry references — crashed/aborted txn leftovers —
        are orphans. Regression: keep used to be the HEAD manifest
        only, deleting every superseded-but-readable snapshot file."""
        import os

        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        snap = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, bal double"
        )
        with wh.transaction():
            wh.append(snap.coalesce(1), "accounts")
        pre_seq = max(s["seq"] for s in wh.snapshots())
        for v, bal in ((1, 99.0), (2, 77.0)):  # two logical replaces
            changes = spark.createDataFrame(
                [(2, v, "U", bal)], "k long, v long, op string, bal double"
            )
            wh.merge_table("accounts", changes, key="k",
                           version_cols=("v",), payload_cols=("bal",))
        # plant a genuine orphan (crashed-txn leftover: in no entry)
        orphan = os.path.join(wh._path("accounts"), "txn-dead-000-0.parquet")
        snap.limit(1).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "scratch"))
        import glob as _g
        os.replace(_g.glob(str(tmp_path / "scratch") + "/*.parquet")[0], orphan)

        assert wh.vacuum_orphans("accounts") == 1  # orphan only
        assert not os.path.exists(orphan)
        # every retained snapshot still reads exactly
        pre = {r["k"]: r["bal"] for r in wh.read_at("accounts", pre_seq).collect()}
        assert pre == {1: 10.0, 2: 20.0}
        assert {r["k"]: r["bal"] for r in wh.read("accounts").collect()} == \
            {1: 10.0, 2: 77.0}
        # compaction advances the retention boundary past the merges:
        # the two superseded snapshot files are now UNREACHABLE history
        # (read_at below the boundary raises the typed error), so
        # vacuum legitimately reclaims exactly those two
        wh.compact("accounts")
        assert wh.vacuum_orphans("accounts") == 2
        assert {r["k"]: r["bal"] for r in wh.read("accounts").collect()} == \
            {1: 10.0, 2: 77.0}
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            SnapshotVacuumed,
        )
        with pytest.raises(SnapshotVacuumed):
            wh.read_at("accounts", pre_seq)

    def test_merge_unknown_table_raises(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="unknown table"):
            wh.merge_table(
                "nope", spark.range(1), key="id", version_cols=("id",),
                payload_cols=(),
            )


class TestDeleteWhere:
    def _wh(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )
        import datetime as dt

        wh = Warehouse(spark, str(tmp_path / "wh"))
        for day, ids in ((1, (1, 2)), (2, (3, 4))):
            rows = spark.createDataFrame(
                [(i, float(i) if i != 2 else None,
                  dt.date(2021, 3, day)) for i in ids],
                "k long, v double, dt date",
            )
            with wh.transaction():
                wh.append(rows.coalesce(1), "t", partition_by=["dt"])
        return wh

    def test_delete_rows_history_and_null_semantics(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        pre = max(s["seq"] for s in wh.snapshots())
        # v > 2 matches k=3,4; k=2 has v NULL -> NOT matched (SQL DELETE)
        assert wh.delete_where("t", "v > 2") == 2
        assert sorted(r["k"] for r in wh.read("t").collect()) == [1, 2]
        # pre-delete snapshot stays readable (logical replace)
        assert wh.read_at("t", pre).count() == 4
        # nothing matches now: returns 0 and writes NO commit
        head = wh._latest_seq()
        assert wh.delete_where("t", "v > 2") == 0
        assert wh._latest_seq() == head

    def test_prune_carries_untouched_files_verbatim(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        before = set(wh._manifest_files("t"))
        d1 = [r for r in before if "dt=2021-03-01" in r]
        n = wh.delete_where(
            "t", "k = 3",
            prune={"dt": ("2021-03-02", "2021-03-02")})
        assert n == 1
        after = set(wh._manifest_files("t"))
        # the 03-01 partition's files were never rewritten
        assert set(d1) <= after
        # the 03-02 partition was: its old files left the manifest
        assert not any(r in after for r in before - set(d1))
        assert sorted(r["k"] for r in wh.read("t").collect()) == [1, 2, 4]
        # carried stats still prune: a 03-01-only read skips 03-02 files
        assert wh.read("t", prune={"dt": ("2021-03-01", "2021-03-01")}) \
            .count() == 2

    def test_cdf_delete_feeds_rollup(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            rollup,
        )

        wh = self._wh(spark, tmp_path)
        aggs = {"v": ["sum", "count"]}
        assert rollup.bootstrap_rollup(wh, "agg_t", ["dt"], aggs,
                                       wh.read("t"))
        assert wh.delete_where("t", "k IN (3, 4)", cdf=True) == 2
        feed = wh.read("t__cdf")
        assert feed.count() == 2
        assert {r["change_type"] for r in feed.collect()} == {"delete"}
        # the CDF fold absorbs the delete exactly: day-2 group vanishes
        assert rollup.apply_rollup_cdf_batch(
            wh, "agg_t", ["dt"], aggs, feed, 0)
        import datetime as dt
        got = {r["dt"]: (r["v_sum"], r["v_count"])
               for r in wh.read("agg_t").collect()}
        expected = {
            r["dt"]: (r["s"], r["c"])
            for r in wh.read("t").groupBy("dt").agg(
                F.sum("v").alias("s"), F.count("v").alias("c")).collect()
        }
        assert got == expected == {dt.date(2021, 3, 1): (1.0, 1)}


class TestUpdateWhere:
    def test_update_history_cdf_and_rollup(self, spark, tmp_path):
        import datetime as dt

        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            rollup,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        for day, ids in ((1, (1, 2)), (2, (3, 4))):
            rows = spark.createDataFrame(
                [(i, float(i), dt.date(2021, 3, day)) for i in ids],
                "k long, v double, dt date",
            )
            with wh.transaction():
                wh.append(rows.coalesce(1), "t", partition_by=["dt"])
        aggs = {"v": ["sum", "count"]}
        assert rollup.bootstrap_rollup(wh, "agg_t", ["dt"], aggs,
                                       wh.read("t"))
        pre_seq = max(s["seq"] for s in wh.snapshots())
        before = set(wh._manifest_files("t"))
        d1 = {r for r in before if "dt=2021-03-01" in r}
        # SET sees PRE-update values; prune skips the 03-01 partition
        n = wh.update_where(
            "t", "k >= 3", {"v": "v * 10"},
            prune={"dt": ("2021-03-02", "2021-03-02")}, cdf=True)
        assert n == 2
        got = {r["k"]: r["v"] for r in wh.read("t").collect()}
        assert got == {1: 1.0, 2: 2.0, 3: 30.0, 4: 40.0}
        # untouched partition carried verbatim; history readable
        assert d1 <= set(wh._manifest_files("t"))
        assert {r["k"]: r["v"]
                for r in wh.read_at("t", pre_seq).collect()}[3] == 3.0
        # CDF pre/post pairs absorb into the rollup exactly
        feed = wh.read("t__cdf")
        assert feed.groupBy("change_type").count().count() == 2
        assert rollup.apply_rollup_cdf_batch(
            wh, "agg_t", ["dt"], aggs, feed, 0)
        got = {r["dt"]: (r["v_sum"], r["v_count"])
               for r in wh.read("agg_t").collect()}
        assert got == {dt.date(2021, 3, 1): (3.0, 2),
                       dt.date(2021, 3, 2): (70.0, 2)}
        # unknown SET column refused; no-match writes no commit
        import pytest as _pytest
        with _pytest.raises(ValueError, match="not columns"):
            wh.update_where("t", "k = 1", {"nope": "1"})
        head = wh._latest_seq()
        assert wh.update_where("t", "k > 99", {"v": "0.0"}) == 0
        assert wh._latest_seq() == head


class TestStreamMerge:
    def test_file_stream_cdc_merge_and_replay_idempotence(
        self, spark, tmp_path
    ):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )
        from etl_pipeline_for_detection_banking_fraud_spark.streaming.ingest import (
            stream_merge_to_warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(
                spark.createDataFrame(
                    [(1, 10.0), (2, 20.0)], "k long, bal double"
                ).coalesce(1),
                "accounts",
            )

        inbox = tmp_path / "inbox"
        inbox.mkdir()
        schema = "k long, v long, op string, bal double"
        b1 = spark.createDataFrame([(2, 1, "U", 99.0), (3, 1, "I", 30.0)], schema)
        b1.coalesce(1).write.parquet(str(inbox / "b1"))
        stream = spark.readStream.schema(b1.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(inbox / "*"))
        q = stream_merge_to_warehouse(
            stream, wh, str(tmp_path / "ckpt"), "accounts",
            key="k", version_cols=("v",), payload_cols=("bal",),
        )
        try:
            q.processAllAvailable()
            got = {r["k"]: r["bal"] for r in wh.read("accounts").collect()}
            assert got == {1: 10.0, 2: 99.0, 3: 30.0}
            # second batch: delete + newer update
            spark.createDataFrame(
                [(1, 2, "D", None), (3, 2, "U", 33.0)], schema
            ).coalesce(1).write.parquet(str(inbox / "b2"))
            q.processAllAvailable()
            got = {r["k"]: r["bal"] for r in wh.read("accounts").collect()}
            assert got == {2: 99.0, 3: 33.0}
        finally:
            q.stop()
        # replay idempotence: re-merging batch 2's changelog directly
        # (the crash-replay path) leaves the snapshot unchanged
        wh.merge_table(
            "accounts",
            spark.createDataFrame([(1, 2, "D", None), (3, 2, "U", 33.0)], schema),
            key="k", version_cols=("v",), payload_cols=("bal",),
        )
        got = {r["k"]: r["bal"] for r in wh.read("accounts").collect()}
        assert got == {2: 99.0, 3: 33.0}

    def test_stream_merge_cdf_publishes_feed(self, spark, tmp_path):
        """stream_merge_to_warehouse(cdf=True): every microbatch merge
        also lands its row-level changes in the __cdf sidecar — the
        full composition: CDC stream -> atomic merge -> change feed."""
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )
        from etl_pipeline_for_detection_banking_fraud_spark.streaming.ingest import (
            stream_merge_to_warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(
                spark.createDataFrame(
                    [(1, 10.0, 0)], "k long, bal double, v long"
                ).coalesce(1),
                "accounts",
            )
        inbox = tmp_path / "inbox"
        inbox.mkdir()
        schema = "k long, v long, op string, bal double"
        spark.createDataFrame(
            [(1, 1, "U", 11.0), (2, 1, "I", 20.0)], schema
        ).coalesce(1).write.parquet(str(inbox / "b1"))
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1").parquet(str(inbox / "*"))
        q = stream_merge_to_warehouse(
            stream, wh, str(tmp_path / "ckpt"), "accounts",
            key="k", version_cols=("v",), payload_cols=("bal",), cdf=True,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        feed = wh.read("accounts__cdf").collect()
        types = sorted(r["change_type"] for r in feed)
        assert types == ["insert", "update_postimage", "update_preimage"]
        got = {r["k"]: r["bal"] for r in wh.read("accounts").collect()}
        assert got == {1: 11.0, 2: 20.0}

    def test_late_batches_converge_to_batch_merge(self, spark, tmp_path):
        """Round-5 verdict item #8: changelog versions arriving across
        microbatch boundaries in REVERSE must converge to the one-shot
        batch merge. The table schema carries the version column, so
        each microbatch merge runs version-aware: the late batch's
        older changes lose against the already-stored newer versions."""
        from etl_pipeline_for_detection_banking_fraud_spark.operators import cdc
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )
        from etl_pipeline_for_detection_banking_fraud_spark.streaming.ingest import (
            stream_merge_to_warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        schema = "k long, v long, op string, bal double"
        with wh.transaction():
            wh.append(
                spark.createDataFrame(
                    [(1, 0, 10.0), (2, 0, 20.0), (4, 0, 40.0)],
                    "k long, v long, bal double",
                ).coalesce(1),
                "accounts",
            )
        all_changes = [
            # NEWER half — arrives FIRST (the out-of-order delivery)
            (1, 2, "U", 111.0),   # newest update for 1
            (3, 2, "I", 30.0),    # newest insert for 3
            (4, 2, "D", None),    # newest: delete 4
            # OLDER half — arrives LATE in a second microbatch
            (1, 1, "U", 99.0),    # stale update: must lose
            (2, 1, "U", 22.0),    # only change for 2: must apply
        ]
        inbox = tmp_path / "inbox2"
        inbox.mkdir()
        spark.createDataFrame(all_changes[:3], schema).coalesce(1).write.parquet(
            str(inbox / "b1")
        )
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(inbox / "*"))
        q = stream_merge_to_warehouse(
            stream, wh, str(tmp_path / "ckpt2"), "accounts",
            key="k", version_cols=("v",), payload_cols=("bal",),
        )
        try:
            q.processAllAvailable()
            spark.createDataFrame(all_changes[3:], schema).coalesce(1)\
                .write.parquet(str(inbox / "b2"))
            q.processAllAvailable()
        finally:
            q.stop()

        got = {r["k"]: (r["bal"], r["v"]) for r in wh.read("accounts").collect()}
        oneshot = cdc.apply_changelog(
            spark.createDataFrame(
                [(1, 0, 10.0), (2, 0, 20.0), (4, 0, 40.0)],
                "k long, v long, bal double",
            ),
            spark.createDataFrame(all_changes, schema),
            key="k", version_cols=("v",), payload_cols=("bal",),
        )
        want = {r["k"]: (r["bal"], r["v"]) for r in oneshot.collect()}
        assert got == want == {1: (111.0, 2), 2: (22.0, 1), 3: (30.0, 2)}


class TestFileSkipping:
    def test_cluster_then_prune_skips_files_and_loses_no_rows(
        self, spark, tmp_path
    ):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        # keys deliberately shuffled so every unclustered file spans
        # nearly the whole key range -> pruning can skip nothing
        df = (
            spark.range(0, 4000)
            .select(
                F.col("id").alias("k"),
                F.md5(F.col("id").cast("string")).alias("payload"),
            )
            .repartition(8)  # round-robin: each file sees all key ranges
        )
        with wh.transaction():
            wh.append(df, "t")
        stats = wh._manifest_stats("t")
        assert stats and all("k" in s for s in stats.values())
        full = wh.read("t")
        assert full.count() == 4000

        pruned_before = wh.read("t", prune={"k": (100, 150)})
        n_files_before = pruned_before.select(
            F.input_file_name()
        ).distinct().count()

        wh.cluster_table("t", "k", n_files=8)
        assert wh.read("t").count() == 4000  # clustering loses nothing

        pruned = wh.read("t", prune={"k": (100, 150)})
        n_files_after = pruned.select(F.input_file_name()).distinct().count()
        # after range-clustering a 51-key band lives in 1 (maybe 2) of
        # the 8 files; before clustering every file overlapped the band
        assert n_files_before == 8
        assert n_files_after <= 2
        # and the pruned read is a superset that filters to the exact rows
        got = sorted(
            r["k"] for r in pruned.where(F.col("k").between(100, 150)).collect()
        )
        assert got == list(range(100, 151))

    def test_zorder_prunes_on_both_dimensions(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        # a full 64x64 grid: x the fast coordinate, y the slow one —
        # genuinely independent dimensions
        df = spark.range(0, 4096).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        ).repartition(8)
        with wh.transaction():
            wh.append(df, "t")

        def files(prune):
            return (
                wh.read("t", prune=prune)
                .select(F.input_file_name()).distinct().count()
            )

        assert files({"x": (0, 7)}) == 8  # round-robin: nothing skips

        # single-column clustering sharpens x but leaves y unprunable
        wh.cluster_table("t", "x", n_files=16)
        total_1d = wh.read("t").select(F.input_file_name()).distinct().count()
        assert files({"x": (0, 7)}) <= total_1d // 2
        assert files({"y": (0, 7)}) == total_1d

        # z-order sharpens BOTH: a 1/8-wide band on either axis hits
        # only the grid cells that overlap it
        wh.zorder_table("t", ["x", "y"], n_files=16)
        total = wh.read("t").select(F.input_file_name()).distinct().count()
        nx, ny = files({"x": (0, 7)}), files({"y": (0, 7)})
        assert nx <= total // 2 and ny <= total // 2
        # rewrites lose nothing and pruned reads stay supersets
        assert wh.read("t").count() == 4096
        band = wh.read("t", prune={"y": (0, 7)}).where(
            F.col("y").between(0, 7)
        )
        assert band.count() == 4096 // 8

    def test_zorder_timestamp_and_string_dimensions(self, spark, tmp_path):
        # the production combo: cluster facts by (event time, card id) —
        # time scales via epoch, the string via a stable hash (identical
        # cards co-locate, so raw-string manifest stats stay narrow and
        # string-range prunes still skip files)
        import datetime

        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        base = datetime.datetime(2021, 3, 1)
        df = spark.range(0, 4096).select(
            (F.lit(base) + F.make_dt_interval(
                mins=(F.col("id") % 64).cast("int"))).alias("ts"),
            F.concat(F.lit("card"),
                     F.lpad((F.col("id") / 64).cast("long").cast("string"),
                            3, "0")).alias("card"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        ).repartition(8)
        with wh.transaction():
            wh.append(df, "t")
        wh.zorder_table("t", ["ts", "card"], n_files=16)
        assert wh.read("t").count() == 4096
        total = wh.read("t").select(F.input_file_name()).distinct().count()
        t_band = wh.read("t", prune={
            "ts": ("2021-03-01T00:00:00", "2021-03-01T00:07:00")
        }).select(F.input_file_name()).distinct().count()
        c_band = wh.read("t", prune={
            "card": ("card000", "card007")
        }).select(F.input_file_name()).distinct().count()
        assert t_band <= total // 2 and c_band <= total // 2

    def test_zorder_rejects_unsupported_type_and_missing_column(
        self, spark, tmp_path
    ):
        import pytest

        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        df = spark.createDataFrame(
            [(1, 2, ["x"])], "a long, b long, arr array<string>"
        )
        with wh.transaction():
            wh.append(df, "t")
        with pytest.raises(ValueError, match="unsupported type"):
            wh.zorder_table("t", ["a", "arr"])
        with pytest.raises(ValueError, match="missing columns"):
            wh.zorder_table("t", ["a", "nope"])

    def test_zorder_requires_two_columns_and_tracked_table(
        self, spark, tmp_path
    ):
        import pytest

        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with pytest.raises(ValueError, match=">= 2 columns"):
            wh.zorder_table("t", ["x"])
        with pytest.raises(ValueError, match="not commit-log tracked"):
            wh.zorder_table("missing", ["x", "y"])

    def test_prune_with_no_stats_keeps_everything(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(spark.range(10).select(F.col("id").alias("k")), "t")
        # prune on a column with no recorded stats: nothing skipped
        assert wh.read("t", prune={"nope": (0, 1)}).count() == 10

    def test_all_files_skipped_reads_empty_with_schema(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(
                spark.range(10).select(F.col("id").alias("k")).coalesce(1), "t"
            )
        out = wh.read("t", prune={"k": (1000, 2000)})
        assert out.count() == 0
        assert out.columns == ["k"]


class TestZorderPerPartitionBounds:
    def test_intraday_resolution_survives_long_history(self, spark, tmp_path):
        """dt-partitioned z-order scales each dimension against its
        PER-PARTITION min/max. With global scaling, bits=4 over 16 days
        gives the time dimension <=1 bucket per day — intra-day
        ordering vanishes and a morning-band read hits every file of
        the day. Per-partition bounds keep the full 16-bucket intra-day
        resolution no matter how long the history grows."""
        import datetime

        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        days, per_day = 16, 256
        base = datetime.datetime(2021, 3, 1)
        df = spark.range(days * per_day).select(
            (F.lit(base)
             + F.make_dt_interval(days=(F.col("id") / per_day).cast("int"),
                                  mins=((F.col("id") % per_day)
                                        * (1440 / per_day)).cast("int"))
             ).alias("ts"),
            F.pmod(F.col("id") * 37, F.lit(997)).alias("k"),
        ).withColumn("dt", F.to_date("ts")).repartition(8)
        with wh.transaction():
            wh.append(df, "t", partition_by=["dt"])
        wh.zorder_table("t", ["ts", "k"], n_files=days * 4, bits=4)
        assert wh.read("t").count() == days * per_day

        last = base + datetime.timedelta(days=days - 1)
        lo, hi = last.isoformat(), (last
                                    + datetime.timedelta(hours=3)).isoformat()
        got = wh.read("t", prune={"ts": (lo, hi)})
        day_files = [f for f in got.select(F.input_file_name())
                     .distinct().toPandas()["input_file_name()"]
                     if f"dt={last.date()}" in f]
        # the last day holds ~4 files; a 3h/24h band must skip at least
        # half of them — impossible under global bits=4 scaling, where
        # every row of the day shares one time bucket
        assert len(day_files) <= 2, day_files
        # correctness: pruning is a superset, the row filter still holds
        n = got.where(F.col("ts").between(lo, hi)).count()
        want = sum(1 for j in range(per_day)
                   if int(j * (1440 / per_day)) <= 180)
        assert n == want


class TestCdfOnWrite:
    """merge_table(cdf=True): the row-level change feed publishes to an
    append-only <table>__cdf sidecar in the SAME commit as the merged
    state (Delta Change Data Feed shape) — one atomic entry, two ops
    (replace the table, append the feed)."""

    def _wh(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        snap = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, name string, bal double",
        )
        with wh.transaction():
            wh.append(snap.coalesce(1), "accounts")
        return wh

    def _merge(self, wh, spark, rows):
        changes = spark.createDataFrame(
            rows, "k long, v long, op string, bal double")
        wh.merge_table("accounts", changes, key="k", version_cols=("v",),
                       payload_cols=("bal",), cdf=True)

    def test_feed_rows_match_snapshot_diff_semantics(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        self._merge(wh, spark, [(2, 1, "U", 99.0), (3, 1, "D", None),
                                (4, 1, "I", 40.0)])
        feed = wh.read("accounts__cdf").collect()
        by_type = {}
        for r in feed:
            by_type.setdefault(r["change_type"], []).append((r["k"], r["bal"]))
        assert sorted(by_type["insert"]) == [(4, 40.0)]
        assert sorted(by_type["delete"]) == [(3, 30.0)]
        assert by_type["update_preimage"] == [(2, 20.0)]
        assert by_type["update_postimage"] == [(2, 99.0)]
        assert len({r["_txn"] for r in feed}) == 1

    def test_feed_is_append_only_across_merges(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        self._merge(wh, spark, [(4, 1, "I", 40.0)])
        self._merge(wh, spark, [(4, 2, "U", 44.0)])
        feed = wh.read("accounts__cdf").collect()
        # both merges' changes survive (second replace did NOT reset the
        # sidecar), each under its own txn id
        assert len({r["_txn"] for r in feed}) == 2
        types = sorted(r["change_type"] for r in feed)
        assert types == ["insert", "update_postimage", "update_preimage"]

    def test_feed_and_state_commit_atomically(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        self._merge(wh, spark, [(4, 1, "I", 40.0)])
        # ONE commit entry covers both tables, op=replace with the feed
        # marked append-only
        snap = wh.snapshots()[-1]
        assert snap["op"] == "replace"
        assert set(snap["tables"]) == {"accounts", "accounts__cdf"}

    def test_feed_streams_to_consumers(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            table_stream as ts,
        )

        wh = self._wh(spark, tmp_path)
        self._merge(wh, spark, [(4, 1, "I", 40.0)])
        self._merge(wh, spark, [(1, 1, "D", None)])
        rows = []
        q = (ts.stream_table(spark, str(tmp_path / "wh"), "accounts__cdf")
             .writeStream.foreachBatch(lambda df, _i: rows.extend(df.collect()))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        assert sorted(r["change_type"] for r in rows) == ["delete", "insert"]

    def test_without_cdf_no_sidecar(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        changes = spark.createDataFrame(
            [(4, 1, "I", 40.0)], "k long, v long, op string, bal double")
        wh.merge_table("accounts", changes, key="k", version_cols=("v",),
                       payload_cols=("bal",))
        assert not wh.exists("accounts__cdf")

    def test_feed_tails_across_merges(self, spark, tmp_path):
        """A checkpointed consumer tailing the change feed receives each
        later merge's rows: the feed rides REPLACE entries (marked
        append_tables), which must not trip the stream's
        mid-stream-replace guard."""
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            table_stream as ts,
        )

        wh = self._wh(spark, tmp_path)
        self._merge(wh, spark, [(4, 1, "I", 40.0)])
        rows = []

        def drain():
            q = (ts.stream_table(spark, str(tmp_path / "wh"),
                                 "accounts__cdf")
                 .writeStream
                 .foreachBatch(lambda df, _i: rows.extend(df.collect()))
                 .option("checkpointLocation", str(tmp_path / "ckpt2"))
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)

        drain()
        assert sorted(r["change_type"] for r in rows) == ["insert"]
        self._merge(wh, spark, [(4, 2, "D", None)])
        rows.clear()
        drain()  # tail from checkpoint: only the delete's feed rows
        assert sorted(r["change_type"] for r in rows) == ["delete"]


class TestRestore:
    """Warehouse.restore: metadata-only rollback to an earlier snapshot
    as a NEW replace commit (Delta RESTORE contract — history kept)."""

    def _wh(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(1, 10.0)], "k long, bal double").coalesce(1), "t")
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(2, 20.0)], "k long, bal double").coalesce(1), "t")
        return wh

    def test_restore_rolls_back_and_keeps_history(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        seq1 = wh.snapshots()[0]["seq"]
        head = wh._latest_seq()
        wh.restore("t", seq1)
        assert {r["k"] for r in wh.read("t").collect()} == {1}
        # the rolled-back state is still time-travelable (new commit,
        # nothing erased), and the restore itself is a replace commit
        assert {r["k"] for r in wh.read_at("t", head).collect()} == {1, 2}
        assert wh.snapshots()[-1]["op"] == "replace"
        # appends continue on top of the restored state
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(3, 30.0)], "k long, bal double").coalesce(1), "t")
        assert {r["k"] for r in wh.read("t").collect()} == {1, 3}

    def test_restore_behind_vacuum_rejected(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            SnapshotVacuumed,
        )

        wh = self._wh(spark, tmp_path)
        seq1 = wh.snapshots()[0]["seq"]
        wh.compact("t")  # deletes superseded files, advances retention
        with pytest.raises(SnapshotVacuumed, match="oldest restorable"):
            wh.restore("t", seq1)

    def test_restore_untracked_rejected(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="no commit-log history"):
            wh.restore("ghost", 1)


class TestReadChanges:
    def test_reads_only_feed_files_since_seq(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(1, 10.0, 0)], "k long, bal double, v long").coalesce(1),
                "accounts")

        def merge(rows):
            wh.merge_table(
                "accounts",
                spark.createDataFrame(rows, "k long, v long, op string, bal double"),
                key="k", version_cols=("v",), payload_cols=("bal",),
                cdf=True)

        merge([(2, 1, "I", 20.0)])
        seq_after_first = wh._latest_seq()
        merge([(1, 1, "U", 11.0)])

        all_changes = wh.read_changes("accounts", 0)
        assert sorted(r["change_type"] for r in all_changes.collect()) == [
            "insert", "update_postimage", "update_preimage"]
        tail = wh.read_changes("accounts", seq_after_first)
        assert sorted(r["change_type"] for r in tail.collect()) == [
            "update_postimage", "update_preimage"]
        head = wh.read_changes("accounts", wh._latest_seq())
        assert head.count() == 0 and "change_type" in head.columns

    def test_no_feed_raises(self, spark, tmp_path):
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with pytest.raises(ValueError, match="no cdf=True merge"):
            wh.read_changes("accounts", 0)

    @staticmethod
    def _merge(spark, wh, rows):
        wh.merge_table(
            "accounts",
            spark.createDataFrame(rows, "k long, v long, op string, bal double"),
            key="k", version_cols=("v",), payload_cols=("bal",),
            cdf=True)

    def test_since_below_expire_horizon_raises(self, spark, tmp_path):
        """A since_seq that predates the expire horizon must raise, not
        silently re-deliver the whole feed as 'new' (the replay at that
        seq yields an empty before-set once its entries are folded)."""
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            SnapshotExpired,
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(1, 10.0, 0)], "k long, bal double, v long").coalesce(1),
                "accounts")
        for i in range(4):
            self._merge(spark, wh, [(10 + i, 1, "I", float(i))])
        early = 2
        wh.expire_log(keep_entries=1)
        assert 0 < early < wh.expire_horizon()
        with pytest.raises(SnapshotExpired, match="expire horizon"):
            wh.read_changes("accounts", early)
        # since_seq=0 still means "the whole feed", which stays readable
        assert wh.read_changes("accounts", 0).count() == 4

    def test_compacted_sidecar_filters_by_txn(self, spark, tmp_path):
        """compact() of the __cdf sidecar between since_seq and head
        rewrites the feed's file set; the manifest diff would re-emit
        already-delivered rows, so the read must fall back to the exact
        _txn filter and return ONLY the post-since_seq changes."""
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(1, 10.0, 0)], "k long, bal double, v long").coalesce(1),
                "accounts")
        self._merge(spark, wh, [(2, 1, "I", 20.0)])
        since = wh._latest_seq()
        self._merge(spark, wh, [(3, 1, "I", 30.0)])
        wh.compact("accounts__cdf")
        self._merge(spark, wh, [(4, 1, "I", 40.0)])

        got = wh.read_changes("accounts", since)
        assert sorted(r["k"] for r in got.collect()) == [3, 4]
        assert {r["change_type"] for r in got.collect()} == {"insert"}
        # full-feed read (since 0) is unaffected by the fallback
        assert sorted(
            r["k"] for r in wh.read_changes("accounts", 0).collect()
        ) == [2, 3, 4]


class TestDmlRewriteNarrowing:
    """The two DML scale passes: stats/partition pruning DERIVED from
    the predicate, then a find-touched-files scan — so an unpruned
    selective delete rewrites only files that actually hold matches."""

    def _wh8(self, spark, tmp_path):
        import datetime as dt

        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            Warehouse,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            for i in range(8):  # 8 files, ids [10i .. 10i+9]
                rows = spark.createDataFrame(
                    [(10 * i + j, float(j), dt.date(2021, 3, 1 + i % 4))
                     for j in range(10)],
                    "k long, v double, dt date",
                )
                wh.append(rows.coalesce(1), "t")
        return wh

    def test_unpruned_delete_rewrites_only_matching_files(
            self, spark, tmp_path):
        wh = self._wh8(spark, tmp_path)
        before = set(wh._manifest_files("t"))
        assert len(before) == 8
        # k IN (42, 45) lives in exactly one file (ids 40..49); no
        # prune argument — the narrowing pass finds the touched file
        assert wh.delete_where("t", "k IN (42, 45)") == 2
        after = set(wh._manifest_files("t"))
        assert len(before - after) == 1  # exactly ONE file left the set
        assert len(after - before) == 1  # replaced by ONE rewrite
        got = sorted(r["k"] for r in wh.read("t").collect())
        assert got == [k for k in range(80) if k not in (42, 45)]

    def test_unpruned_update_rewrites_only_matching_files(
            self, spark, tmp_path):
        wh = self._wh8(spark, tmp_path)
        before = set(wh._manifest_files("t"))
        assert wh.update_where("t", "k = 13", {"v": "v + 100"}) == 1
        after = set(wh._manifest_files("t"))
        assert len(before - after) == 1
        assert {r["v"] for r in wh.read("t").where("k = 13").collect()} \
            == {103.0}

    def test_derived_prune_scans_only_matching_partition(
            self, spark, tmp_path):
        """delete_where("dt = ...") with NO explicit prune: the bounds
        derived from the predicate bound the find-touched-files scan to
        that partition's files (partition-path pruning)."""
        import datetime as dt

        from etl_pipeline_for_detection_banking_fraud_spark.sources import (
            warehouse as W,
        )

        wh = W.Warehouse(spark, str(tmp_path / "wh"))
        for day in (1, 2, 3):
            rows = spark.createDataFrame(
                [(day * 10 + j, float(j), dt.date(2021, 3, day))
                 for j in range(5)],
                "k long, v double, dt date",
            )
            with wh.transaction():
                wh.append(rows.coalesce(1), "t", partition_by=["dt"])
        # the derivation itself: equality -> tight bounds
        assert W.derive_prune_bounds(spark, "dt = '2021-03-02'") == \
            {"dt": ("2021-03-02", "2021-03-02")}
        # the derived bounds select only the matching partition's files
        mf = wh._manifest_files("t")
        stats = wh._manifest_stats("t")
        cand = [r for r in mf if W._file_may_match(
            r, stats.get(r), W.derive_prune_bounds(spark, "dt = '2021-03-02'"))]
        assert all("dt=2021-03-02" in r for r in cand) and cand
        # and the delete touches only that partition
        before = set(mf)
        assert wh.delete_where("t", "dt = '2021-03-02'") == 5
        after = set(wh._manifest_files("t"))
        assert all("dt=2021-03-02" in r for r in before - after)
        assert sorted(r["k"] for r in wh.read("t").collect()) == \
            [10, 11, 12, 13, 14, 30, 31, 32, 33, 34]

    def test_derived_bounds_are_necessary_only(self, spark, tmp_path):
        """Mixed-column OR / NOT / expressions never derive bounds (a
        sufficient-but-not-necessary prune would silently keep matching
        rows alive)."""
        from etl_pipeline_for_detection_banking_fraud_spark.sources import (
            warehouse as W,
        )

        assert W.derive_prune_bounds(spark, "a = 1 OR b = 2") == {}
        assert W.derive_prune_bounds(spark, "NOT (a = 1)") == {}
        assert W.derive_prune_bounds(spark, "upper(n) = 'X'") == {}
        # conjuncts still contribute around an unrecognized term
        assert W.derive_prune_bounds(
            spark, "dt = '2021-03-02' AND (a = 1 OR b = 2)") == \
            {"dt": ("2021-03-02", "2021-03-02")}
        # intersection of repeated bounds on one column
        assert W.derive_prune_bounds(spark, "k >= 3 AND k < 9") == \
            {"k": (3, 9)}
        assert W.derive_prune_bounds(
            spark, "dt BETWEEN '2021-01-01' AND '2021-02-01'") == \
            {"dt": ("2021-01-01", "2021-02-01")}

    def test_derived_bounds_same_column_or_union(self, spark):
        """A top-level OR whose every disjunct bounds the SAME column
        contributes the union interval — still a necessary condition."""
        from etl_pipeline_for_detection_banking_fraud_spark.sources import (
            warehouse as W,
        )
        from pyspark.sql import functions as F

        assert W.derive_prune_bounds(
            spark, "dt = '2021-03-01' OR dt = '2021-03-03'") == \
            {"dt": ("2021-03-01", "2021-03-03")}
        # three-way, mixed shapes (equality + IN) still union
        assert W.derive_prune_bounds(
            spark, "k = 1 OR k IN (5, 7) OR k = 3") == {"k": (1, 7)}
        # union with an open side stays open -> no bound derivable
        assert W.derive_prune_bounds(spark, "k = 1 OR k > 9") == \
            {"k": (1, None)}
        # OR term composes with conjuncts around it
        assert W.derive_prune_bounds(
            spark, "(dt = '2021-03-01' OR dt = '2021-03-02') AND k >= 4"
        ) == {"dt": ("2021-03-01", "2021-03-02"), "k": (4, None)}
        # Column-API form derives the same union
        assert W.derive_prune_bounds(
            spark, (F.col("dt") == "2021-03-01")
            | (F.col("dt") == "2021-03-03")) == \
            {"dt": ("2021-03-01", "2021-03-03")}
        # mixed-recognizable disjuncts poison the TERM, not the rest:
        # one disjunct on another column -> {} for that term
        assert W.derive_prune_bounds(
            spark, "(dt = '2021-03-01' OR upper(n) = 'X') AND k = 2") == \
            {"k": (2, 2)}
        # And-of-Or nesting inside a disjunct degrades safely
        assert W.derive_prune_bounds(
            spark, "(k = 1 AND v = 2.0) OR k = 5") == {}

    def test_derived_bounds_skip_multipart_attributes(self, spark):
        """A struct-field / qualified reference (s.x, t.x) must NOT
        derive a bound attributed to top-level column x — if such a
        column exists with stats, the prune would not be a necessary
        condition and DML would silently skip files holding matches."""
        from etl_pipeline_for_detection_banking_fraud_spark.sources import (
            warehouse as W,
        )

        assert W.derive_prune_bounds(spark, "s.x = 5") == {}
        assert W.derive_prune_bounds(spark, "t.dt = '2021-03-01'") == {}
        # but the plain single-part name still derives
        assert W.derive_prune_bounds(spark, "x = 5") == {"x": (5, 5)}
        # and a conjunct alongside a multi-part term still contributes
        assert W.derive_prune_bounds(
            spark, "s.x = 5 AND k = 2") == {"k": (2, 2)}
