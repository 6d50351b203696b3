"""Warehouse table-as-a-stream source (streaming/table_stream.py).

Pins the Delta-shape contract: offsets are commit seqs; the first
microbatch is the existing snapshot; each later commit arrives as the
file-set diff between offsets; restarts resume from the query
checkpoint exactly-once; replaces fail by default / re-emit on opt-in;
a stream behind the expire horizon raises SnapshotExpired.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    SnapshotExpired,
    Warehouse,
)
from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
    table_stream as ts,
)

pytestmark = pytest.mark.slow


def _rows(spark, ids, day=1):
    return spark.createDataFrame(
        [(i, f"n{i}", Decimal("1.50") * i,
          datetime.datetime(2021, 3, day, 10, 0, i % 60),
          datetime.date(2021, 3, day)) for i in ids],
        "id long, name string, amt decimal(12,2), ts timestamp, dt date",
    )


def _run_available(spark, sdf, name, ckpt):
    """Drain the stream once (availableNow) through a checkpointed
    foreachBatch sink (the memory sink cannot recover from a
    checkpoint) and return the collected rows."""
    rows = []
    q = (sdf.writeStream
         .foreachBatch(lambda df, _id: rows.extend(df.collect()))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return rows


class TestSnapshotThenTail:
    def test_snapshot_restart_tail_exactly_once(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(_rows(spark, [1, 2], day=1), "events",
                      partition_by=["dt"])
        with wh.transaction():
            wh.append(_rows(spark, [3], day=1), "events",
                      partition_by=["dt"])

        sdf = ts.stream_table(spark, root, "events")
        assert sdf.schema["dt"].dataType.simpleString() == "date"
        out = _run_available(spark, sdf, "tbl_snap", ckpt)
        assert sorted(r["id"] for r in out) == [1, 2, 3]
        # snapshot parity with the batch reader, partition column included
        batch = wh.read("events")
        assert sorted(sdf.columns) == sorted(batch.columns)
        assert {(r["id"], r["amt"], r["dt"]) for r in out} == \
               {(r["id"], r["amt"], r["dt"]) for r in batch.collect()}

        # two more commits, restart from the SAME checkpoint: only the
        # new files arrive (exactly-once tail, no re-snapshot)
        with wh.transaction():
            wh.append(_rows(spark, [4, 5], day=2), "events",
                      partition_by=["dt"])
        with wh.transaction():
            wh.append(_rows(spark, [6], day=2), "events",
                      partition_by=["dt"])
        out2 = _run_available(spark, ts.stream_table(spark, root, "events"),
                              "tbl_tail", ckpt)
        assert sorted(r["id"] for r in out2) == [4, 5, 6]
        assert {r["dt"] for r in out2} == {datetime.date(2021, 3, 2)}

        # nothing new: an availableNow restart emits zero rows
        out3 = _run_available(spark, ts.stream_table(spark, root, "events"),
                              "tbl_idle", ckpt)
        assert out3 == []

    def test_tail_only_skips_existing(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(_rows(spark, [1, 2]), "events", partition_by=["dt"])
        sdf = ts.stream_table(spark, root, "events", tail_only=True)
        out = _run_available(spark, sdf, "tbl_tailonly",
                             str(tmp_path / "c2"))
        assert out == []
        with wh.transaction():
            wh.append(_rows(spark, [7]), "events", partition_by=["dt"])
        out2 = _run_available(spark,
                              ts.stream_table(spark, root, "events",
                                              tail_only=True),
                              "tbl_tailonly2", str(tmp_path / "c2"))
        assert [r["id"] for r in out2] == [7]

    def test_untracked_table_has_no_schema(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        Warehouse(spark, root)  # creates root, commits nothing
        with pytest.raises(Exception, match="no committed files"):
            ts.stream_table(spark, root, "ghost").schema


class TestReplaceAndExpiry:
    def test_mid_stream_replace_fails_by_default(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(_rows(spark, [1, 2]), "events", partition_by=["dt"])
        _run_available(spark, ts.stream_table(spark, root, "events"),
                       "tbl_rf0", ckpt)
        wh.compact("events")  # replace entry after the consumed offset
        with pytest.raises(Exception, match="REPLACED table"):
            q = (ts.stream_table(spark, root, "events")
                 .writeStream.foreachBatch(lambda df, _id: None)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)
            if q.exception() is not None:
                raise q.exception()

    def test_reemit_opt_in_delivers_rewritten_files(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(_rows(spark, [1, 2]), "events", partition_by=["dt"])
        _run_available(spark,
                       ts.stream_table(spark, root, "events",
                                       on_replace="reemit"),
                       "tbl_re0", ckpt)
        wh.compact("events")
        out = _run_available(spark,
                             ts.stream_table(spark, root, "events",
                                             on_replace="reemit"),
                             "tbl_re1", ckpt)
        # ignoreChanges contract: the rewritten file set re-arrives
        assert sorted(r["id"] for r in out) == [1, 2]

    def test_offset_behind_expire_horizon_raises(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root, checkpoint_interval=0)
        for i in range(6):
            with wh.transaction():
                wh.append(_rows(spark, [i]), "events", partition_by=["dt"])
        wh.expire_log(keep_entries=2)  # horizon 4
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events"},
            *_schema_pair(root),
        )
        with pytest.raises(SnapshotExpired, match="expire horizon"):
            reader.partitions({"seq": 2}, {"seq": 6})
        # at/after the horizon: fine (snapshot diff over checkpointed state)
        parts = reader.partitions({"seq": 4}, {"seq": 6})
        assert len(parts) == 2
        # and a fresh snapshot (seq 0) over the expired log still works
        parts0 = reader.partitions({"seq": 0}, {"seq": 6})
        assert len(parts0) == 6


def _schema_pair(root):
    schema, parts = ts._resolve_schema({"root": root, "table": "events"})
    return schema, parts


class TestAdmissionControl:
    """max_files_per_trigger: every planned microbatch — the initial
    snapshot included — carries at most N files; chunk boundaries ride
    the offsets, so the sequence of batches is exactly-once and its
    union is exactly the table."""

    def _commits(self, spark, root, n_commits, files_per_commit):
        wh = Warehouse(spark, root)
        next_id = [0]
        for _ in range(n_commits):
            ids = [next_id[0] + j for j in range(files_per_commit)]
            next_id[0] += files_per_commit
            with wh.transaction():
                for i in ids:  # one file per append call
                    wh.append(_rows(spark, [i]).coalesce(1), "events",
                              partition_by=["dt"])
        return wh

    def _drive(self, reader, triggers=50, start=None):
        """Simulate the microbatch loop: initialOffset (or resume from
        ``start``), then repeated latestOffset/partitions until the
        offset stops moving. Returns the per-batch file lists; the
        reader's final position is ``reader._planned``."""
        batches = []
        cur = start if start is not None else reader.initialOffset()
        for _ in range(triggers):
            end = reader.latestOffset()
            if end == cur:
                break
            parts = reader.partitions(cur, end)
            batches.append([p.path for p in parts])
            cur = end
        return batches

    def test_snapshot_chunks_to_cap_and_unions_exactly(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        self._commits(spark, root, n_commits=3, files_per_commit=3)  # 9 files
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events", "max_files_per_trigger": "4"},
            *_schema_pair(root))
        batches = self._drive(reader)
        assert [len(b) for b in batches] == [4, 4, 1]
        flat = [p for b in batches for p in b]
        assert len(flat) == len(set(flat)) == 9  # no dupes, no losses

    def test_tail_commits_chunked_across_boundaries(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        wh = self._commits(spark, root, n_commits=1, files_per_commit=2)
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events", "max_files_per_trigger": "3"},
            *_schema_pair(root))
        assert [len(b) for b in self._drive(reader)] == [2]  # snapshot
        # three more commits x 2 files: budget 3 spans commit boundaries
        for i in range(3):
            with wh.transaction():
                for j in (0, 1):
                    wh.append(_rows(spark, [10 * i + j]).coalesce(1),
                              "events", partition_by=["dt"])
        batches = self._drive(reader, start=reader._planned)
        assert [len(b) for b in batches] == [3, 3]
        flat = [p for b in batches for p in b]
        assert len(flat) == len(set(flat)) == 6

    def test_foreign_commits_absorbed_without_emission(self, spark, tmp_path):
        """Commits to OTHER tables advance the capped offset to head in
        one step (no per-commit batches, nothing emitted) — the tail
        walk only counts commits touching the streamed table."""
        root = str(tmp_path / "wh")
        wh = self._commits(spark, root, n_commits=1, files_per_commit=2)
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events", "max_files_per_trigger": "3"},
            *_schema_pair(root))
        assert [len(b) for b in self._drive(reader)] == [2]
        for i in range(3):  # three commits to a different table
            with wh.transaction():
                wh.append(_rows(spark, [i]).coalesce(1), "other")
        # one offset hop to head, zero files emitted
        assert self._drive(reader, start=reader._planned) == [[]]
        assert reader._planned == {"seq": wh._latest_seq()}

    def test_byte_cap_paces_by_actual_file_sizes(self, spark, tmp_path):
        """max_bytes_per_trigger: batches stop at the byte budget
        (measured with real on-disk sizes), a cap smaller than any one
        file still admits exactly one per batch (progress, never a
        stall), and the two caps compose — whichever binds first."""
        import os as _os

        root = str(tmp_path / "wh")
        wh = self._commits(spark, root, n_commits=1, files_per_commit=5)
        rels = sorted(wh._manifest_files("events"))
        sizes = [_os.path.getsize(_os.path.join(root, "events", r))
                 for r in rels]
        # budget for exactly the first two files (all files are within
        # a few bytes of each other, so this also bounds later pairs)
        two = sizes[0] + sizes[1]
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events",
             "max_bytes_per_trigger": str(two)}, *_schema_pair(root))
        assert [len(b) for b in self._drive(reader)] == [2, 2, 1]
        # a cap below every file size -> one oversized file per batch
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events", "max_bytes_per_trigger": "1"},
            *_schema_pair(root))
        assert [len(b) for b in self._drive(reader)] == [1] * 5
        # composition: generous byte cap, binding file cap (and back)
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events",
             "max_files_per_trigger": "1",
             "max_bytes_per_trigger": str(sum(sizes))},
            *_schema_pair(root))
        assert [len(b) for b in self._drive(reader)] == [1] * 5
        # tail path: byte budget spans commit boundaries like files do
        # (drive the snapshot FIRST, then commit more and continue)
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events",
             "max_bytes_per_trigger": str(sizes[0] + sizes[1] + sizes[2] + 2)},
            *_schema_pair(root))
        snap = self._drive(reader)
        assert [len(b) for b in snap] == [3, 2]  # capped snapshot
        for i in range(2):
            with wh.transaction():
                for j in (0, 1):
                    wh.append(_rows(spark, [50 + 10 * i + j]).coalesce(1),
                              "events", partition_by=["dt"])
        tail = self._drive(reader, start=reader._planned)
        flat = [p for b in snap + tail for p in b]
        assert len(flat) == len(set(flat)) == 9  # exactly-once union
        # the ~3-file budget never admits more, and the 4 tail files
        # (2 commits x 2) arrive in at least two batches
        assert all(1 <= len(b) <= 3 for b in tail) and len(tail) >= 2

    def test_every_cap_and_restart_point_is_exact(self, spark, tmp_path):
        """Exhaustive invariant sweep (control-plane only, one table
        build): for EVERY cap and EVERY restart point, (a) no batch
        exceeds the cap, (b) the batch union is exactly the committed
        file set, no dupes, and (c) a fresh reader resumed from any
        intermediate checkpointed offset emits exactly the remaining
        files — the three properties that make admission control safe
        to enable on a 100 TB table."""
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        # irregular history: snapshot of 3, then tails of 1/4/2 files,
        # with a foreign-table commit wedged between
        for i, n in enumerate((3, 1, 4, 2)):
            with wh.transaction():
                for j in range(n):
                    wh.append(_rows(spark, [10 * i + j]).coalesce(1),
                              "events", partition_by=["dt"])
            if i == 1:
                with wh.transaction():
                    wh.append(_rows(spark, [99]).coalesce(1), "other")
        opts = {"root": root, "table": "events"}
        all_files = set(
            p.path for p in ts._WarehouseStreamReader(
                dict(opts), *_schema_pair(root)
            ).partitions({"seq": 0}, {"seq": wh._latest_seq()}))
        assert len(all_files) == 10
        for cap in (1, 2, 3, 5, 10):
            o = dict(opts, max_files_per_trigger=str(cap))
            reader = ts._WarehouseStreamReader(o, *_schema_pair(root))
            offsets = [reader.initialOffset()]
            batches = []
            for _ in range(40):
                end = reader.latestOffset()
                if end == offsets[-1]:
                    break
                batches.append({p.path for p in
                                reader.partitions(offsets[-1], end)})
                offsets.append(end)
            assert all(len(b) <= cap for b in batches), cap
            flat = [p for b in batches for p in b]
            assert len(flat) == 10 and set(flat) == all_files, cap
            for k in range(1, len(offsets)):    # every restart point
                # Spark's restart: replay the last planned batch through
                # partitions() (re-seeds the planner), then tail on
                r2 = ts._WarehouseStreamReader(dict(o),
                                               *_schema_pair(root))
                replay = {p.path for p in
                          r2.partitions(offsets[k - 1], offsets[k])}
                assert replay == batches[k - 1], (cap, k)
                cur, rest = offsets[k], set()
                for _ in range(40):
                    end = r2.latestOffset()
                    if end == cur:
                        break
                    new = {p.path for p in r2.partitions(cur, end)}
                    assert len(new) <= cap, (cap, k)
                    rest |= new
                    cur = end
                seen = set().union(*batches[:k - 1]) if k > 1 else set()
                assert replay | rest == all_files - seen, (cap, k)

    def test_compaction_mid_snapshot_raises_typed(self, spark, tmp_path):
        """compact() DELETES the files it supersedes, so a compaction
        landing mid-initial-snapshot strands the pinned manifest —
        partitions() must raise the typed SnapshotVacuumed (restart =
        fresh re-snapshot), not die executor-side with FileNotFound."""
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            SnapshotVacuumed,
        )

        root = str(tmp_path / "wh")
        wh = self._commits(spark, root, n_commits=3, files_per_commit=2)
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events", "max_files_per_trigger": "2"},
            *_schema_pair(root))
        cur = reader.initialOffset()
        end = reader.latestOffset()
        assert len(reader.partitions(cur, end)) == 2  # first chunk ok
        wh.compact("events")
        cur, end = end, reader.latestOffset()
        with pytest.raises(SnapshotVacuumed, match="mid-initial-snapshot"):
            reader.partitions(cur, end)

    def test_logical_replace_mid_snapshot_stays_consistent(
            self, spark, tmp_path):
        """merge_table retains its superseded files as readable history,
        so a merge landing mid-initial-snapshot does NOT strand the
        pinned manifest: the snapshot completes on the pre-merge file
        set (a consistent point-in-time image), and the TAIL crossing
        the replace entry then honors on_replace as usual."""
        root = str(tmp_path / "wh")
        wh = self._commits(spark, root, n_commits=2, files_per_commit=2)
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events", "max_files_per_trigger": "2"},
            *_schema_pair(root))
        cur = reader.initialOffset()
        end = reader.latestOffset()
        first = reader.partitions(cur, end)
        assert len(first) == 2
        changes = spark.createDataFrame(
            [(0, datetime.datetime(2021, 3, 9), "U", "zz")],
            "id long, ts timestamp, op string, name string",
        )
        wh.merge_table("events", changes, key="id",
                       version_cols=("ts",), payload_cols=("name",))
        # the remaining snapshot chunk still streams (pre-merge files
        # are retained history, not vacuumed)
        cur, end = end, reader.latestOffset()
        rest = reader.partitions(cur, end)
        assert len(rest) == 2
        assert len({p.path for p in first} | {p.path for p in rest}) == 4
        # tailing past the merge hits the replace guard (default: fail)
        cur, end = end, reader.latestOffset()
        while end != cur and "idx" not in end and "snap" not in end \
                and end.get("seq", 0) < wh._latest_seq():
            rest = reader.partitions(cur, end)
            cur, end = end, reader.latestOffset()
        with pytest.raises(RuntimeError, match="REPLACED table"):
            reader.partitions(cur, end)

    def test_restart_replay_is_exact_for_partial_offsets(self, spark, tmp_path):
        """A fresh reader (restart) handed checkpointed partial offsets
        must reproduce the same batches; and an uncapped jump from a
        mid-snapshot offset to a later head loses nothing."""
        root = str(tmp_path / "wh")
        wh = self._commits(spark, root, n_commits=2, files_per_commit=3)
        opts = {"root": root, "table": "events", "max_files_per_trigger": "4"}
        r1 = ts._WarehouseStreamReader(opts, *_schema_pair(root))
        o0 = r1.initialOffset()
        o1 = r1.latestOffset()
        first = [p.path for p in r1.partitions(o0, o1)]

        # restart: new reader replays the logged batch identically
        r2 = ts._WarehouseStreamReader(opts, *_schema_pair(root))
        assert [p.path for p in r2.partitions(o0, o1)] == first
        # and its NEXT trigger is capped (position re-seeded)
        o2 = r2.latestOffset()
        second = [p.path for p in r2.partitions(o1, o2)]
        assert len(second) == 2 and not set(second) & set(first)

        # uncapped-jump path (restart whose last batch committed): a
        # plain head offset from a partial start emits exactly the rest
        with wh.transaction():
            wh.append(_rows(spark, [99]).coalesce(1), "events",
                      partition_by=["dt"])
        r3 = ts._WarehouseStreamReader(opts, *_schema_pair(root))
        rest = [p.path for p in r3.partitions(o1, {"seq": wh._latest_seq()})]
        assert sorted(first + rest) == sorted(
            set(first) | set(second) | set(rest))
        assert len(first) + len(rest) == 7  # 6 snapshot + 1 tail file

    def test_streaming_e2e_paced_drains(self, spark, tmp_path):
        """End-to-end through a real streaming query: with a periodic
        trigger the 5-file snapshot arrives as 2+2+1 row batches (cap
        2), exactly-once. (availableNow can't pace — Spark's fallback
        runs Python sources as ONE batch there, as documented.)"""
        import time as _time

        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        self._commits(spark, root, n_commits=1, files_per_commit=5)
        batches: list[list[int]] = []

        def sink(df, _bid):
            rows = sorted(r["id"] for r in df.collect())
            if rows:
                batches.append(rows)

        q = (ts.stream_table(spark, root, "events",
                             max_files_per_trigger=2)
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(processingTime="300 milliseconds").start())
        try:
            deadline = _time.time() + 120
            while _time.time() < deadline and \
                    sum(len(b) for b in batches) < 5:
                _time.sleep(0.5)
        finally:
            q.stop()
        assert [len(b) for b in batches] == [2, 2, 1]
        assert sorted(i for b in batches for i in b) == [0, 1, 2, 3, 4]


class TestSchemaEvolution:
    def test_pre_evolution_files_read_as_nulls(self, spark, tmp_path):
        """Additive evolution: the stream schema comes from the NEWEST
        committed file, so a column ADDED by a later append is part of
        the stream; older, narrower files read it as typed NULLs
        (mergeSchema semantics) — never as pyarrow's silent
        negative-index of the last column."""
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        wh = Warehouse(spark, root)
        narrow = spark.createDataFrame([(2, "b")], "id long, name string")
        wide = spark.createDataFrame(
            [(1, "a", 10.0)], "id long, name string, score double")
        with wh.transaction():
            wh.append(narrow, "docs")
        with wh.transaction():
            wh.append(wide, "docs")
        sdf = ts.stream_table(spark, root, "docs")
        assert "score" in sdf.columns  # the added column IS in the stream
        out = _run_available(spark, sdf, "tbl_evo", ckpt)
        got = {r["id"]: r["score"] for r in out}
        assert got == {1: 10.0, 2: None}
        names = {r["id"]: r["name"] for r in out}
        assert names == {1: "a", 2: "b"}  # not shifted/negative-indexed

    def test_mid_run_widening_fails_then_restart_streams_column(
            self, spark, tmp_path):
        """A column added AFTER the stream resolved its schema must not
        be silently dropped: the batch that reaches the wide file fails
        loudly (Delta's mid-run schema-change contract); a RESTART
        re-resolves the schema from the newest file and delivers the
        column, with the checkpointed offsets intact (the failed batch
        replays — no rows lost or duplicated)."""
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(spark.createDataFrame([(1, "a")],
                                            "id long, name string"), "docs")
        # consume the snapshot with the narrow schema
        out = _run_available(spark, ts.stream_table(spark, root, "docs"),
                             "tbl_widen0", ckpt)
        assert [r["id"] for r in out] == [1]

        # open a stream (schema resolved NOW, narrow), then widen
        sdf = ts.stream_table(spark, root, "docs")
        assert "score" not in sdf.columns
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(2, "b", 20.0)], "id long, name string, score double"),
                "docs")
        with pytest.raises(Exception, match="schema changed mid-stream"):
            # the sink must MATERIALIZE the batch (collect) — a no-op
            # foreachBatch never runs read() and would pass vacuously
            q = (sdf.writeStream.foreachBatch(lambda df, _id: df.collect())
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(180)
            if q.exception() is not None:
                raise q.exception()

        # restart: fresh schema resolution picks the column up and the
        # failed batch replays exactly-once from the same checkpoint
        out2 = _run_available(spark, ts.stream_table(spark, root, "docs"),
                              "tbl_widen1", ckpt)
        assert [(r["id"], r["score"]) for r in out2] == [(2, 20.0)]


class TestRestartAfterCommit:
    """Restarts whose last batch COMMITTED: Spark then plans the next
    batch via latestOffset WITHOUT replaying the old one through
    partitions(), so a capped planner cannot learn the stream position
    from the replay. ``checkpoint_dir`` opts the reader into
    reconciling with the query's own offset log; without it, the
    partitions() guards fail loudly instead of duplicating rows."""

    def _snapshot(self, spark, root, n_files):
        wh = Warehouse(spark, root)
        with wh.transaction():
            for i in range(n_files):
                wh.append(_rows(spark, [i]).coalesce(1), "events",
                          partition_by=["dt"])
        return wh

    def test_checkpointed_offset_parses_real_checkpoint(
            self, spark, tmp_path):
        root, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
        self._snapshot(spark, root, 4)
        out = _run_available(
            spark, ts.stream_table(spark, root, "events",
                                   max_files_per_trigger=2,
                                   checkpoint_dir=ckpt),
            "rc_parse", ckpt)
        assert len(out) == 2  # availableNow fallback: ONE capped batch
        off = ts._checkpointed_offset(ckpt)
        assert off == {"snap": 1, "idx": 2}
        # fresh/absent checkpoints parse to None (fall back to preset)
        assert ts._checkpointed_offset(str(tmp_path / "nope")) is None

    def test_capped_available_now_drains_across_runs(self, spark, tmp_path):
        """Four availableNow runs against ONE checkpoint drain a 6-file
        snapshot as 2/2/2/0 — every run after the first is a
        restart-after-commit, resumed via checkpoint_dir."""
        root, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
        self._snapshot(spark, root, 6)
        seen = []
        for expect in (2, 2, 2, 0):
            out = _run_available(
                spark, ts.stream_table(spark, root, "events",
                                       max_files_per_trigger=2,
                                       checkpoint_dir=ckpt),
                "rc_drain", ckpt)
            assert len(out) == expect
            seen.extend(r["id"] for r in out)
        assert sorted(seen) == [0, 1, 2, 3, 4, 5]  # exactly-once union

    def test_restart_after_commit_with_new_commits(self, spark, tmp_path):
        """New commits landing while a capped stream is stopped
        mid-snapshot: the resumed planner keeps the PINNED snapshot
        target (no cross-target manifest diff), then tails the new
        commits after the snapshot completes."""
        root, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
        wh = self._snapshot(spark, root, 3)
        out1 = _run_available(
            spark, ts.stream_table(spark, root, "events",
                                   max_files_per_trigger=2,
                                   checkpoint_dir=ckpt),
            "rc_new1", ckpt)
        assert len(out1) == 2
        with wh.transaction():
            wh.append(_rows(spark, [100], day=2).coalesce(1), "events",
                      partition_by=["dt"])
        seen = [r["id"] for r in out1]
        for _ in range(3):
            out = _run_available(
                spark, ts.stream_table(spark, root, "events",
                                       max_files_per_trigger=2,
                                       checkpoint_dir=ckpt),
                "rc_new2", ckpt)
            seen.extend(r["id"] for r in out)
        assert sorted(seen) == [0, 1, 2, 100]

    def test_snap_target_mismatch_raises(self, spark, tmp_path):
        """A snap-form end pinned to a DIFFERENT target than the start
        would diff two differently-sorted manifests (txn-<uuid> names
        interleave) and silently re-deliver files — partitions() fails
        loudly instead. Unreachable through a real query on Spark 4.1
        (restart replays partitions() with the checkpointed offsets
        first, re-seeding the planner — pinned empirically by the
        tests above); the guard covers a future Spark that plans
        straight from latestOffset after a committed batch."""
        root = str(tmp_path / "wh")
        wh = self._snapshot(spark, root, 4)
        with wh.transaction():
            wh.append(_rows(spark, [100], day=2).coalesce(1), "events",
                      partition_by=["dt"])
        reader = ts._WarehouseStreamReader(
            {"root": root, "table": "events", "max_files_per_trigger": "2"},
            *_schema_pair(root))
        with pytest.raises(RuntimeError, match="snapshot target mismatch"):
            reader.partitions({"snap": 1, "idx": 2}, {"snap": 2, "idx": 2})
        # and the seq-start/snap-end pairing stays loud, pointing at
        # the checkpoint_dir remedy
        with pytest.raises(RuntimeError, match="checkpoint_dir"):
            reader.partitions({"seq": 1}, {"snap": 2, "idx": 2})


class TestDvStreaming:
    def test_on_dv_apply_survivors_exactly_once_across_restart(
            self, spark, tmp_path):
        """The top round-10 contract: a table with LIVE deletion
        vectors streams its surviving rows exactly — snapshot batch,
        then a tail where a dv delete lands on a file BEFORE it is
        emitted — across a checkpointed restart, exactly-once."""
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(_rows(spark, [1, 2, 3], day=1), "events",
                      partition_by=["dt"])
        with wh.transaction():
            wh.append(_rows(spark, [4, 5], day=2), "events",
                      partition_by=["dt"])
        # merge-on-read delete BEFORE the stream starts
        assert wh.delete_where("events", "id = 2", mode="dv") == 1
        out = _run_available(
            spark, ts.stream_table(spark, root, "events", on_dv="apply"),
            "dv_snap", ckpt)
        assert sorted(r["id"] for r in out) == [1, 3, 4, 5]
        # full-row parity with the batch reader (dv applied there too)
        assert {(r["id"], r["amt"], r["dt"]) for r in out} == \
               {(r["id"], r["amt"], r["dt"])
                for r in wh.read("events").collect()}

        # tail: new append, then a dv delete covering the NEW file
        # before it was ever emitted; the dv commit is a replace entry
        # but dv-only, so on_dv=apply tails through it cleanly
        with wh.transaction():
            wh.append(_rows(spark, [6, 7, 8], day=3), "events",
                      partition_by=["dt"])
        assert wh.delete_where("events", "id = 7", mode="dv") == 1
        out2 = _run_available(
            spark, ts.stream_table(spark, root, "events", on_dv="apply"),
            "dv_tail", ckpt)
        assert sorted(r["id"] for r in out2) == [6, 8]
        # and a third drain with nothing new emits nothing (no dup)
        out3 = _run_available(
            spark, ts.stream_table(spark, root, "events", on_dv="apply"),
            "dv_idle", ckpt)
        assert out3 == []

    def test_on_dv_apply_is_null_safe_and_removes_duplicates(
            self, spark, tmp_path):
        """The streamed anti-join must match NULLs null-safely (a dv
        row with NULL columns removes its physical row) WITHOUT
        over-matching a different row that also carries NULLs, and
        must remove duplicate identical rows like the batch reader."""
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        rows = spark.createDataFrame(
            [(1, None), (1, None), (2, 5.0), (3, None)],
            "k long, v double")
        with wh.transaction():
            wh.append(rows.coalesce(1), "t")
        assert wh.delete_where("t", "v IS NULL AND k = 1", mode="dv") == 2
        out = _run_available(
            spark, ts.stream_table(spark, root, "t", on_dv="apply"),
            "dv_nulls", str(tmp_path / "ck"))
        assert sorted((r["k"], r["v"]) for r in out) == \
            [(2, 5.0), (3, None)]

    def test_on_dv_apply_after_additive_schema_evolution(
            self, spark, tmp_path):
        """A column added AFTER the dv delete: the stream schema is the
        wide one (newest file), the dv is narrow — matching on the
        shared columns still removes exactly the recorded rows."""
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(1, 1.0), (2, 2.0)], "k long, v double").coalesce(1), "t")
        assert wh.delete_where("t", "k = 1", mode="dv") == 1
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(3, 3.0, "x")], "k long, v double, tag string"
            ).coalesce(1), "t")
        out = _run_available(
            spark, ts.stream_table(spark, root, "t", on_dv="apply"),
            "dv_evo", str(tmp_path / "ck"))
        assert sorted((r["k"], r["tag"]) for r in out) == \
            [(2, None), (3, "x")]

    def test_default_on_dv_fail_message_mentions_apply(
            self, spark, tmp_path):
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(spark.createDataFrame([(1,), (2,)], "k long")
                      .coalesce(1), "t")
        assert wh.delete_where("t", "k = 2", mode="dv") == 1
        q = (ts.stream_table(spark, root, "t")
             .writeStream.foreachBatch(lambda df, _i: df.collect())
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        with pytest.raises(Exception, match="on_dv=apply"):
            q.awaitTermination(120)
            if q.exception() is not None:
                raise q.exception()

    def test_on_dv_apply_composes_with_admission_caps(
            self, spark, tmp_path):
        """Capped snapshot chunks each anti-join their own files: the
        dv filter is per-partition, so pacing and merge-on-read deletes
        compose without special cases."""
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ck")
        wh = Warehouse(spark, root)
        for i in range(4):
            with wh.transaction():
                wh.append(_rows(spark, [10 * i + 1, 10 * i + 2], day=1)
                          .coalesce(1), "events", partition_by=["dt"])
        # dv rows scattered across two different files
        assert wh.delete_where("events", "id IN (2, 21)", mode="dv") == 2
        got = []
        # drain in 1-file batches across several availableNow runs
        # (Python sources fall back to single-batch under availableNow)
        for _ in range(6):
            got += _run_available(
                spark,
                ts.stream_table(spark, root, "events", on_dv="apply",
                                max_files_per_trigger=1,
                                checkpoint_dir=ckpt),
                "dv_capped", ckpt)
        assert sorted(r["id"] for r in got) == [1, 11, 12, 22, 31, 32]


class TestStreamingCDF:
    """stream_table(cdf=True): the STREAMING Change Data Feed read
    (round-11 verdict item #6) — tails the CDF sidecar the cdf=True
    DML paths write, with _change_type surfaced Delta-style."""

    def test_streamed_cdf_equals_batch_table_changes_across_restart(
            self, spark, tmp_path):
        root = str(tmp_path / "wh")
        ckpt = str(tmp_path / "ckpt")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(i, float(i)) for i in range(8)],
                "k long, v double").coalesce(1), "t")
        base = wh._latest_seq()

        # batch DML sequence, all CDF-on-write
        wh.delete_where("t", "k = 1", cdf=True)
        wh.update_where("t", "k = 2", {"v": "222.0"}, cdf=True)

        def _norm(rows):
            return sorted((r["_change_type"], r["k"], r["v"], r["_txn"])
                          for r in rows)

        sdf = ts.stream_table(spark, root, "t", cdf=True)
        assert "_change_type" in sdf.columns and "_txn" in sdf.columns
        first = _run_available(spark, sdf, "cdf1", ckpt)

        # more DML while the stream is down, then RESTART on the same
        # checkpoint: only the new changes arrive
        from etl_pipeline_for_detection_banking_fraud_spark.operators import (
            merge as M,
        )

        wh.merge_when(
            "t", spark.createDataFrame([(3, 333.0), (99, 99.0)],
                                       "k long, v double"), ["k"],
            matched=[M.when_matched_update(None)],
            not_matched=[M.when_not_matched_insert(None)], cdf=True)
        second = _run_available(
            spark, ts.stream_table(spark, root, "t", cdf=True), "cdf2",
            ckpt)

        batch = wh.read_changes("t", base).withColumnRenamed(
            "change_type", "_change_type").collect()
        assert _norm(first + second) == _norm(batch)
        assert {r["_change_type"] for r in second} == {
            "update_preimage", "update_postimage", "insert"}

    def test_cdf_stream_composes_with_dv_dml(self, spark, tmp_path):
        """A merge-on-read (mode='dv') delete with cdf=True feeds the
        same sidecar; the CDF stream tails it without tripping any
        dv/replace guard (the sidecar itself is a plain append table)."""
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(i, float(i)) for i in range(6)],
                "k long, v double").coalesce(1), "t")
        wh.delete_where("t", "k in (1, 4)", mode="dv", cdf=True)
        rows = _run_available(
            spark, ts.stream_table(spark, root, "t", cdf=True), "c",
            str(tmp_path / "ckpt"))
        assert sorted(r["k"] for r in rows) == [1, 4]
        assert {r["_change_type"] for r in rows} == {"delete"}

    def test_cdf_stream_requires_sidecar(self, spark, tmp_path):
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(spark.createDataFrame([(1,)], "k long"), "t")
        with pytest.raises(ValueError, match="no cdf=True DML"):
            ts.stream_table(spark, root, "t", cdf=True)

    def test_cdf_gate_untracked_vs_tracked_empty(self, spark, tmp_path):
        """The gate distinguishes an UNTRACKED sidecar (no cdf DML ever
        — the typed "no cdf=True DML" error) from a tracked-but-
        currently-empty one: there the gate passes and the stream
        source's own accurate no-committed-files contract speaks (the
        Python source needs one file for schema inference), never the
        misleading no-cdf-DML message."""
        root = str(tmp_path / "wh")
        wh = Warehouse(spark, root)
        with wh.transaction():
            wh.append(spark.createDataFrame([(1,)], "k long"), "t")
        # track the sidecar with an EMPTY manifest (no files)
        txn = wh.begin()
        txn.pending["t__cdf"] = []
        txn.commit()
        assert wh._manifest_files("t__cdf") == []
        with pytest.raises(Exception, match="no committed files"):
            ts.stream_table(spark, root, "t", cdf=True)
