"""ALTER TABLE ADD COLUMNS — declared-schema evolution.

``add_columns`` records the evolved schema in the commit log
(metadata-only, no file touched — Delta's contract); every read from
that commit on resolves against the DECLARED schema, so pre-evolution
files surface the new columns as typed NULLs with no footer-merge job,
time travel below the commit replays the old schema, and every
maintenance rewrite (compact / DML) carries the declaration through.
"""

import os

import pytest

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import Warehouse
from etl_pipeline_for_detection_banking_fraud_spark.sql_door import warehouse_sql


def _wh(spark, tmp_path, name="w"):
    root = os.path.join(str(tmp_path), name)
    os.makedirs(root, exist_ok=True)
    return Warehouse(spark, root)


def _seed(spark, wh, table="tx"):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)],
                               "id int, amt double")
    with wh.transaction() as t:
        t.append(df, table)


def test_add_columns_reads_nulls_and_new_appends(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    wh.add_columns("tx", {"score": "double", "tag": "string"})
    out = wh.read("tx")
    assert [f.name for f in out.schema.fields] == \
        ["id", "amt", "score", "tag"]
    rows = out.orderBy("id").collect()
    assert all(r["score"] is None and r["tag"] is None for r in rows)

    wh.append(spark.createDataFrame(
        [(3, 30.0, 0.5, "x")],
        "id int, amt double, score double, tag string"), "tx")
    rows = wh.read("tx").orderBy("id").collect()
    assert rows[2]["score"] == 0.5 and rows[2]["tag"] == "x"
    assert rows[0]["score"] is None  # old file, typed NULL

    # appends may still omit declared columns (reads fill NULLs)
    wh.append(spark.createDataFrame([(4, 40.0)],
                                    "id int, amt double"), "tx")
    assert wh.read("tx").count() == 4


def test_append_guards_unknown_and_drifted_columns(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    wh.add_columns("tx", {"score": "double"})
    with pytest.raises(ValueError, match="not in the table's declared"):
        wh.append(spark.createDataFrame(
            [(5, 5.0, True)], "id int, amt double, zz boolean"), "tx")
    with pytest.raises(ValueError, match="declared schema says"):
        wh.append(spark.createDataFrame(
            [(5, 5.0, "oops")], "id int, amt double, score string"), "tx")
    with pytest.raises(ValueError, match="already exists"):
        wh.add_columns("tx", {"amt": "double"})
    with pytest.raises(ValueError, match="reserved"):
        wh.add_columns("tx", {"_hidden": "int"})


def test_time_travel_replays_old_schema(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    pre = wh.snapshots()[-1]["seq"]
    wh.add_columns("tx", {"score": "double"})
    assert "score" not in wh.read_at("tx", pre).columns
    assert "score" in wh.read("tx").columns


def test_dml_and_compact_over_mixed_files(spark, tmp_path):
    """A predicate on the ADDED column must work across files that do
    and don't carry it physically (the footer-inference trap the
    declared schema exists to close)."""
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    wh.add_columns("tx", {"score": "double"})
    wh.append(spark.createDataFrame(
        [(3, 30.0, 0.9)], "id int, amt double, score double"), "tx")

    assert wh.delete_where("tx", "score > 0.5") == 1
    assert wh.read("tx").count() == 2

    n = wh.update_where("tx", "id = 1", {"score": "0.25"})
    assert n == 1
    assert wh.read("tx").where("id=1").collect()[0]["score"] == 0.25

    wh.compact("tx")
    rows = wh.read("tx").orderBy("id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    assert rows[0]["score"] == 0.25 and rows[1]["score"] is None
    # declaration survives the replace
    assert "score" in [f.name for f in wh.read("tx").schema.fields]


def test_partitioned_table_evolves(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    df = spark.createDataFrame(
        [(1, "2021-01-01"), (2, "2021-01-02")], "id int, dt string")
    with wh.transaction() as t:
        t.append(df, "facts", partition_by=["dt"])
    wh.add_columns("facts", {"flag": "boolean"})
    wh.append(spark.createDataFrame(
        [(3, "2021-01-03", True)], "id int, dt string, flag boolean"),
        "facts", partition_by=["dt"])
    rows = wh.read("facts").orderBy("id").collect()
    assert rows[0]["flag"] is None and rows[2]["flag"] is True
    # partition pruning still works with the declared schema
    got = wh.read("facts", prune={"dt": ("2021-01-03", "2021-01-03")})
    assert [r["id"] for r in got.collect()] == [3]


def test_replay_checkpoint_and_diff(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    a = wh.snapshots()[-1]["seq"]
    wh.add_columns("tx", {"score": "double"})
    wh.append(spark.createDataFrame(
        [(3, 30.0, 0.5)], "id int, amt double, score double"), "tx")
    b = wh.snapshots()[-1]["seq"]

    # table_diff across the evolution: both sides aligned to the newer
    # declared schema
    diff = wh.table_diff("tx", a, b, key_cols=["id"])
    add = [r for r in diff.collect() if r["_change_type"] == "insert"]
    assert len(add) == 1 and add[0]["score"] == 0.5

    wh.write_checkpoint()
    wh2 = Warehouse(spark, wh.root)
    assert "score" in wh2.read("tx").columns
    assert wh2._declared_schema("tx") is not None


def test_stream_resolves_declared_schema(spark, tmp_path):
    """A stream opened after ADD COLUMNS emits the declared columns:
    typed NULLs for pre-evolution files, values for files that carry
    them — matching the batch reader exactly."""
    from etl_pipeline_for_detection_banking_fraud_spark.streaming.table_stream import (
        stream_table,
    )
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    wh.add_columns("tx", {"score": "double"})
    wh.append(spark.createDataFrame(
        [(3, 30.0, 0.7)], "id int, amt double, score double"), "tx")
    q = (stream_table(spark, wh.root, "tx")
         .writeStream.format("memory").queryName("evo_declared")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from evo_declared order by id").collect()
    assert [r["score"] for r in rows] == [None, None, 0.7]


def test_sql_door_add_columns(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    warehouse_sql(wh, "ALTER TABLE tx ADD COLUMNS (score DOUBLE, tag STRING)")
    assert [f.name for f in wh.read("tx").schema.fields] == \
        ["id", "amt", "score", "tag"]
    # DESCRIBE TABLE shows the declared columns
    desc = warehouse_sql(wh, "DESCRIBE TABLE tx").collect()
    assert {r["col_name"] for r in desc} == {"id", "amt", "score", "tag"}
    # and SQL DML can reference them immediately
    warehouse_sql(wh, "UPDATE tx SET tag = 'new' WHERE id = 1")
    assert wh.read("tx").where("id=1").collect()[0]["tag"] == "new"


def test_add_columns_baseline_unions_all_footers(spark, tmp_path):
    """A table that previously evolved additively via merge_schema
    appends must declare the UNION of all footers when add_columns
    first snapshots it — one arbitrary footer could miss columns only
    newer files carry, permanently hiding them."""
    import os

    from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
        Warehouse,
    )

    wh = Warehouse(spark, os.path.join(str(tmp_path), "w"))
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(1,)], "id int"), "ev")
    # additive evolution the merge_schema way: a WIDER raw append
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(2, "x")],
                                       "id int, tag string"), "ev")
    assert set(wh.read("ev", merge_schema=True).columns) == {"id", "tag"}
    wh.add_columns("ev", {"score": "double"})
    cols = set(wh.read("ev").columns)
    assert cols == {"id", "tag", "score"}, cols
    # and tag is still appendable (declared), with old files NULL there
    wh.append(spark.createDataFrame([(3, "y", 0.5)],
                                    "id int, tag string, score double"),
              "ev")
    got = {r["id"]: (r["tag"], r["score"])
           for r in wh.read("ev").collect()}
    assert got[1] == (None, None) and got[3] == ("y", 0.5)
