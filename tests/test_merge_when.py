"""Conditional multi-clause MERGE (operators/merge.py +
Warehouse.merge_when).

Pins the Delta MERGE INTO contract: clause order (first hit wins),
conditional UPDATE/DELETE/INSERT/NOT-MATCHED-BY-SOURCE, cardinality
violation, insert-only merges rewriting nothing, file-level narrowing
(untouched files carried verbatim), CDF feed shape, deletion-vector
folding, and the reference's SCD2 close-then-insert
(incr_loading.py:79-101) expressed as one merge.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.operators import merge as M
from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    Warehouse,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double")


def _source(spark):
    return spark.createDataFrame(
        [(2, 200.0, "U"), (3, 0.0, "D"), (4, 40.0, "I")],
        "k long, nv double, op string")


class TestMergeClausesOperator:
    def test_update_delete_insert(self, spark):
        out = M.merge_clauses(
            _target(spark), _source(spark), ["k"],
            matched=[
                M.when_matched_update({"v": "source.nv"},
                                      condition="source.op = 'U'"),
                M.when_matched_delete(condition="source.op = 'D'"),
            ],
            not_matched=[M.when_not_matched_insert(
                {"k": "source.k", "name": F.lit("new"), "v": "source.nv"})],
        )
        assert sorted((r["k"], r["name"], r["v"]) for r in out.collect()) \
            == [(1, "a", 10.0), (2, "b", 200.0), (4, "new", 40.0)]

    def test_first_clause_wins(self, spark):
        """Both conditions true for k=2: the FIRST clause applies
        (update, not delete) — the SQL MERGE clause-order contract."""
        out = M.merge_clauses(
            _target(spark), _source(spark), ["k"],
            matched=[
                M.when_matched_update({"v": F.lit(-1.0)},
                                      condition="source.nv >= 0"),
                M.when_matched_delete(condition="source.nv >= 0"),
            ],
        )
        got = {r["k"]: r["v"] for r in out.collect()}
        assert got == {1: 10.0, 2: -1.0, 3: -1.0}

    def test_unconditional_clause_shadows_later(self, spark):
        out = M.merge_clauses(
            _target(spark), _source(spark), ["k"],
            matched=[
                M.when_matched_delete(),  # unconditional
                M.when_matched_update({"v": F.lit(0.0)}),
            ],
        )
        assert sorted(r["k"] for r in out.collect()) == [1]

    def test_insert_star_and_missing_values_null(self, spark):
        """INSERT * takes same-named source columns, NULL elsewhere."""
        src = spark.createDataFrame([(7, 70.0)], "k long, v double")
        out = M.merge_clauses(
            _target(spark), src, ["k"],
            not_matched=[M.when_not_matched_insert()],  # INSERT *
        )
        row = [r for r in out.collect() if r["k"] == 7][0]
        assert (row["v"], row["name"]) == (70.0, None)

    def test_not_matched_by_source(self, spark):
        out = M.merge_clauses(
            _target(spark),
            spark.createDataFrame([(2,)], "k long"), ["k"],
            not_matched_by_source=[
                M.when_not_matched_by_source_update(
                    {"name": F.lit("stale")}, condition="target.k = 1"),
                M.when_not_matched_by_source_delete(
                    condition="target.k = 3"),
            ],
        )
        assert sorted((r["k"], r["name"]) for r in out.collect()) == \
            [(1, "stale"), (2, "b")]

    def test_types_cast_back_to_target_schema(self, spark):
        """A SET expression never changes the target schema (UPDATE
        contract shared with update_where)."""
        out = M.merge_clauses(
            _target(spark), _source(spark), ["k"],
            matched=[M.when_matched_update({"v": F.lit("7")})],  # string
        )
        assert dict(out.dtypes)["v"] == "double"
        assert {r["v"] for r in out.collect() if r["k"] == 2} == {7.0}

    def test_bad_clause_and_reserved_names_raise(self, spark):
        with pytest.raises(ValueError, match="action"):
            M.merge_clauses(_target(spark), _source(spark), ["k"],
                            matched=[{"action": "insert"}])
        with pytest.raises(ValueError, match="ON column"):
            M.merge_clauses(_target(spark), _source(spark), ["zz"],
                            matched=[M.when_matched_delete()])
        bad = _target(spark).withColumn("__merge_t", F.lit(1))
        with pytest.raises(ValueError, match="reserved"):
            M.merge_clauses(bad, _source(spark), ["k"],
                            matched=[M.when_matched_delete()])


class TestWarehouseMergeWhen:
    def _wh(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(_target(spark).repartition(3, "k"), "t")
        with wh.transaction():
            wh.append(spark.createDataFrame([(9, "z", 90.0)],
                                            "k long, name string, v double")
                      .coalesce(1), "t")
        return wh

    def test_atomic_merge_with_cdf_and_carry(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        before = set(wh._manifest_files("t"))
        res = wh.merge_when(
            "t", _source(spark), ["k"],
            matched=[
                M.when_matched_update({"v": "source.nv"},
                                      condition="source.op = 'U'"),
                M.when_matched_delete(condition="source.op = 'D'"),
            ],
            not_matched=[M.when_not_matched_insert(
                {"k": "source.k", "name": F.lit("new"), "v": "source.nv"})],
            cdf=True,
        )
        assert res == {"updated": 1, "deleted": 1, "inserted": 1}
        got = sorted((r["k"], r["v"]) for r in wh.read("t").collect())
        assert got == [(1, 10.0), (2, 200.0), (4, 40.0), (9, 90.0)]
        # files without matching keys carried verbatim (k=9's file)
        assert before & set(wh._manifest_files("t"))
        # one atomic commit: pre-merge snapshot still readable
        assert wh.read_at("t", wh._latest_seq() - 1).count() == 4
        feed = sorted((r["change_type"], r["k"])
                      for r in wh.read("t__cdf").collect())
        assert feed == [("delete", 3), ("insert", 4),
                        ("update_postimage", 2), ("update_preimage", 2)]

    def test_insert_only_merge_rewrites_nothing(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        before = set(wh._manifest_files("t"))
        src = spark.createDataFrame(
            [(1, 999.0), (7, 70.0), (7, 71.0)], "k long, nv double")
        res = wh.merge_when(
            "t", src, ["k"],
            not_matched=[M.when_not_matched_insert(
                {"k": "source.k", "name": F.lit("i"), "v": "source.nv"})])
        # duplicate UNMATCHED source keys both insert (Delta contract);
        # the matched k=1 rides untouched, its file NOT rewritten
        assert res == {"updated": 0, "deleted": 0, "inserted": 2}
        assert before <= set(wh._manifest_files("t"))
        assert sorted(r["k"] for r in wh.read("t").collect()) == \
            [1, 2, 3, 7, 7, 9]

    def test_cardinality_violation_raises(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        src = spark.createDataFrame([(2, 1.0), (2, 2.0)],
                                    "k long, nv double")
        with pytest.raises(ValueError, match="cardinality"):
            wh.merge_when("t", src, ["k"],
                          matched=[M.when_matched_update({"v": "source.nv"})])
        # duplicate keys that match NOTHING are fine even with matched
        # clauses (no target row is doubly updated)
        src2 = spark.createDataFrame([(77, 1.0), (77, 2.0)],
                                     "k long, nv double")
        res = wh.merge_when(
            "t", src2, ["k"],
            matched=[M.when_matched_update({"v": "source.nv"})])
        assert res == {"updated": 0, "deleted": 0, "inserted": 0}

    def test_no_op_merge_commits_nothing(self, spark, tmp_path):
        wh = self._wh(spark, tmp_path)
        head = wh._latest_seq()
        res = wh.merge_when(
            "t", _source(spark), ["k"],
            matched=[M.when_matched_delete(condition="source.op = 'X'")])
        assert res == {"updated": 0, "deleted": 0, "inserted": 0}
        assert wh._latest_seq() == head

    def test_merge_folds_dv_on_touched_files(self, spark, tmp_path):
        """A live deletion vector on a touched file: the dv-deleted row
        cannot resurrect through the merge rewrite, and the dv entry
        folds away with its file."""
        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(_target(spark).coalesce(1), "t")
        assert wh.delete_where("t", "k = 1", mode="dv") == 1
        assert len(wh._dv_state("t")) == 1
        res = wh.merge_when(
            "t", _source(spark), ["k"],
            matched=[M.when_matched_update({"v": "source.nv"},
                                           condition="source.op = 'U'")])
        assert res["updated"] == 1
        assert wh._dv_state("t") == {}  # folded into the rewrite
        assert sorted((r["k"], r["v"]) for r in wh.read("t").collect()) \
            == [(2, 200.0), (3, 30.0)]  # k=1 stays deleted

    def test_dv_deleted_row_is_not_matched(self, spark, tmp_path):
        """A dv-deleted target row is DEAD: a source row with its key
        must take the NOT MATCHED path (insert), not update a ghost."""
        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(_target(spark).coalesce(1), "t")
        assert wh.delete_where("t", "k = 2", mode="dv") == 1
        res = wh.merge_when(
            "t", spark.createDataFrame([(2, 5.0)], "k long, nv double"),
            ["k"],
            matched=[M.when_matched_update({"v": "source.nv"})],
            not_matched=[M.when_not_matched_insert(
                {"k": "source.k", "name": F.lit("res"), "v": "source.nv"})])
        assert res == {"updated": 0, "deleted": 0, "inserted": 1}
        got = {r["k"]: (r["name"], r["v"]) for r in wh.read("t").collect()}
        assert got[2] == ("res", 5.0)  # the new row, not the ghost

    def test_partitioned_layout_preserved(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "wh"))
        rows = spark.createDataFrame(
            [(i, float(i), dt.date(2021, 3, 1 + i % 2)) for i in range(6)],
            "k long, v double, dt date")
        with wh.transaction():
            wh.append(rows, "t", partition_by=["dt"])
        res = wh.merge_when(
            "t", spark.createDataFrame([(1, 100.0)], "k long, nv double"),
            ["k"],
            matched=[M.when_matched_update({"v": "source.nv"})])
        assert res["updated"] == 1
        assert wh.table_partition_by("t") == ["dt"]
        assert all(r.startswith("dt=") for r in wh._manifest_files("t"))

    def test_scd2_close_then_insert_single_merge(self, spark, tmp_path):
        """The reference's SCD2 shape (incr_loading.py:79-101): close
        the current row when the payload changed AND insert the new
        version — one merge over the classic staged source (changed
        keys ride twice, once with a NULL merge key so they never
        match and always insert)."""
        inf = dt.date(9999, 12, 31)
        wh = Warehouse(spark, str(tmp_path / "wh"))
        dim = spark.createDataFrame(
            [(1, "p1", dt.date(2021, 1, 1), inf, 1),
             (2, "p2", dt.date(2021, 1, 1), inf, 1),
             (2, "old", dt.date(2020, 1, 1), dt.date(2020, 12, 31), 0)],
            "k long, payload string, start_dt date, end_dt date, "
            "is_current int")
        with wh.transaction():
            wh.append(dim.coalesce(1), "dim")
        day = dt.date(2021, 3, 5)
        changes = spark.createDataFrame(
            [(2, "p2-new"), (3, "p3")], "k long, payload string")
        cur = wh.read("dim").where("is_current = 1")
        changed = (changes.alias("c").join(
            cur.alias("t"),
            (F.col("c.k") == F.col("t.k"))
            & (F.col("c.payload") != F.col("t.payload")), "left_semi"))
        new_keys = changes.join(cur, "k", "left_anti")
        # staged source: closes match on mk; inserts carry mk NULL
        staged = (
            changed.select(F.col("k").alias("mk"), "k", "payload")
            .unionByName(
                changed.select(F.lit(None).cast("long").alias("mk"),
                               "k", "payload"))
            .unionByName(
                new_keys.select(F.lit(None).cast("long").alias("mk"),
                                "k", "payload"))
        )
        # ON k: matched only for the "close" copies (mk = k); the
        # NULL-mk copies never equal any target k -> INSERT
        src = staged.select(
            F.col("mk").alias("k"),
            F.col("k").alias("src_k"), "payload")
        res = wh.merge_when(
            "dim", src, ["k"],
            matched=[M.when_matched_update(
                {"end_dt": F.lit(day - dt.timedelta(days=1)),
                 "is_current": F.lit(0)},
                condition="target.is_current = 1")],
            not_matched=[M.when_not_matched_insert({
                "k": "source.src_k", "payload": "source.payload",
                "start_dt": F.lit(day), "end_dt": F.lit(inf),
                "is_current": F.lit(1)})],
        )
        assert res == {"updated": 1, "deleted": 0, "inserted": 2}
        got = {(r["k"], r["payload"]): (r["start_dt"], r["end_dt"],
                                        r["is_current"])
               for r in wh.read("dim").collect()}
        assert got[(1, "p1")] == (dt.date(2021, 1, 1), inf, 1)  # untouched
        assert got[(2, "p2")] == (dt.date(2021, 1, 1),
                                  day - dt.timedelta(days=1), 0)  # closed
        assert got[(2, "p2-new")] == (day, inf, 1)  # new version
        assert got[(3, "p3")] == (day, inf, 1)      # brand new key
        assert got[(2, "old")][2] == 0              # history untouched


class TestMergeWhenDvMode:
    def _seed(self, spark, tmp_path, sub):
        wh = Warehouse(spark, str(tmp_path / sub))
        with wh.transaction():
            wh.append(_target(spark).coalesce(2), "t")
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(9, "z", 90.0)], "k long, name string, v double")
                .coalesce(1), "t")
        return wh

    def test_merge_on_read_rewrites_nothing_and_matches_eager(
            self, spark, tmp_path):
        clauses = dict(
            matched=[
                M.when_matched_update({"v": "source.nv"},
                                      condition="source.op = 'U'"),
                M.when_matched_delete(condition="source.op = 'D'"),
            ],
            not_matched=[M.when_not_matched_insert(
                {"k": "source.k", "name": F.lit("new"), "v": "source.nv"})],
        )
        dv_wh = self._seed(spark, tmp_path, "dv")
        eager_wh = self._seed(spark, tmp_path, "eager")
        before = set(dv_wh._manifest_files("t"))
        res = dv_wh.merge_when("t", _source(spark), ["k"], mode="dv",
                               **clauses)
        assert res == {"updated": 1, "deleted": 1, "inserted": 1}
        after = set(dv_wh._manifest_files("t"))
        assert before <= after            # nothing rewritten or removed
        assert len(dv_wh._dv_state("t")) == 1
        assert eager_wh.merge_when("t", _source(spark), ["k"],
                                   **clauses) == res
        got = sorted((r["k"], r["name"], r["v"])
                     for r in dv_wh.read("t").collect())
        expect = sorted((r["k"], r["name"], r["v"])
                        for r in eager_wh.read("t").collect())
        assert got == expect == [(1, "a", 10.0), (2, "b", 200.0),
                                 (4, "new", 40.0), (9, "z", 90.0)]
        # compact folds the vector physically; rows unchanged
        dv_wh.compact("t")
        assert dv_wh._dv_state("t") == {}
        assert sorted((r["k"], r["v"]) for r in dv_wh.read("t").collect()) \
            == [(1, 10.0), (2, 200.0), (4, 40.0), (9, 90.0)]

    def test_dv_merge_stacks_on_existing_dv(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path, "wh")
        assert wh.delete_where("t", "k = 1", mode="dv") == 1
        res = wh.merge_when(
            "t", _source(spark), ["k"], mode="dv",
            matched=[M.when_matched_update({"v": "source.nv"},
                                           condition="source.op = 'U'")])
        assert res["updated"] == 1
        assert len(wh._dv_state("t")) == 2  # both vectors live
        got = sorted((r["k"], r["v"]) for r in wh.read("t").collect())
        assert got == [(2, 200.0), (3, 30.0), (9, 90.0)]

    def test_dv_merge_over_cap_falls_back(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "wh"))
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(i, "x", float(i)) for i in range(50)],
                "k long, name string, v double").coalesce(1), "t")
        src = spark.createDataFrame(
            [(i, float(1000 + i)) for i in range(40)], "k long, nv double")
        with pytest.warns(UserWarning, match="dv_max_rows"):
            res = wh.merge_when(
                "t", src, ["k"], mode="dv", dv_max_rows=5,
                matched=[M.when_matched_update({"v": "source.nv"})])
        assert res["updated"] == 40
        assert wh._dv_state("t") == {}  # eager rewrite, no sidecar
        assert wh.read("t").where("v >= 1000").count() == 40

    def test_dv_merge_time_travel(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path, "wh")
        pre = wh._latest_seq()
        wh.merge_when(
            "t", _source(spark), ["k"], mode="dv",
            matched=[M.when_matched_delete(condition="source.op = 'D'")])
        assert wh.read("t").count() == 3
        assert wh.read_at("t", pre).count() == 4  # snapshot unaffected


class TestMergeCdfRollup:
    def test_rollup_absorbs_merge_feed_exactly(self, spark, tmp_path):
        """merge_when(cdf=True) feeds the same change shape as
        delete_where/update_where: a CDF-maintained rollup absorbs the
        merge (update + delete + insert in one txn) exactly."""
        from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
            rollup,
        )

        wh = Warehouse(spark, str(tmp_path / "wh"))
        rows = spark.createDataFrame(
            [(i, "g%d" % (i % 2), float(i)) for i in range(10)],
            "k long, g string, v double")
        with wh.transaction():
            wh.append(rows.coalesce(2), "t")
        aggs = {"v": ["sum", "count"]}
        assert rollup.bootstrap_rollup(wh, "agg_t", ["g"], aggs,
                                       wh.read("t"))
        src = spark.createDataFrame(
            [(1, 100.0, "U"), (2, 0.0, "D"), (77, 7.0, "I")],
            "k long, nv double, op string")
        res = wh.merge_when(
            "t", src, ["k"],
            matched=[
                M.when_matched_update({"v": "source.nv"},
                                      condition="source.op = 'U'"),
                M.when_matched_delete(condition="source.op = 'D'"),
            ],
            not_matched=[M.when_not_matched_insert(
                {"k": "source.k", "g": F.lit("g1"), "v": "source.nv"})],
            cdf=True,
        )
        assert res == {"updated": 1, "deleted": 1, "inserted": 1}
        feed = wh.read("t__cdf")
        assert rollup.apply_rollup_cdf_batch(
            wh, "agg_t", ["g"], aggs, feed, 0)
        got = {r["g"]: (r["v_sum"], r["v_count"])
               for r in wh.read("agg_t").collect()}
        expect = {r["g"]: (r["s"], r["c"])
                  for r in wh.read("t").groupBy("g").agg(
                      F.sum("v").alias("s"),
                      F.count("v").alias("c")).collect()}
        assert got == expect
