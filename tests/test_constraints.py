"""CHECK constraints (Delta ``ALTER TABLE ADD CONSTRAINT`` analog).

Constraints are commit-log table metadata enforced INSIDE every write
job (``assert_true`` in an always-true filter — no extra Spark pass);
a violating write raises ConstraintViolation with nothing committed.
SQL semantics: TRUE and NULL pass, only FALSE violates. The SQL door
speaks the Spark-4 grammar forms (ADD/DROP CONSTRAINT, ALTER COLUMN
SET/DROP NOT NULL) plus SHOW TABLES / DESCRIBE TABLE / DESCRIBE DETAIL
/ OPTIMIZE ... ZORDER BY.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    ConstraintViolation,
    Warehouse,
)
from etl_pipeline_for_detection_banking_fraud_spark.sql_door import warehouse_sql


def _wh(spark, tmp_path, name="w"):
    root = os.path.join(str(tmp_path), name)
    os.makedirs(root, exist_ok=True)
    return Warehouse(spark, root)


def _seed(spark, wh, table="tx"):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "id int, amt double, k string")
    with wh.transaction() as t:
        t.append(df, table)
    return df


def test_add_enforce_drop_lifecycle(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    wh.add_constraint("tx", "amt_pos", "amt > 0")
    assert wh.table_constraints("tx") == {"amt_pos": "amt > 0"}

    # passing rows append fine
    wh.append(spark.createDataFrame([(4, 5.0, "d")],
                                    "id int, amt double, k string"), "tx")
    assert wh.read("tx").count() == 4

    # violating append raises and commits nothing
    head = wh.snapshots()[-1]["seq"]
    with pytest.raises(ConstraintViolation, match="amt_pos"):
        wh.append(spark.createDataFrame(
            [(5, -1.0, "e")], "id int, amt double, k string"), "tx")
    assert wh.snapshots()[-1]["seq"] == head
    assert wh.read("tx").count() == 4

    # SQL CHECK semantics: a NULL check result PASSES
    wh.append(spark.createDataFrame([(6, None, "f")],
                                    "id int, amt double, k string"), "tx")
    assert wh.read("tx").count() == 5

    wh.drop_constraint("tx", "amt_pos")
    wh.append(spark.createDataFrame([(7, -9.0, "g")],
                                    "id int, amt double, k string"), "tx")
    assert wh.read("tx").count() == 6
    with pytest.raises(KeyError):
        wh.drop_constraint("tx", "amt_pos")


def test_validate_existing_rows(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    with pytest.raises(ConstraintViolation, match="2 existing"):
        wh.add_constraint("tx", "id_small", "id < 2")
    assert wh.table_constraints("tx") == {}
    # validate=False records it anyway (caller accepts rewrite risk)
    wh.add_constraint("tx", "id_small", "id < 2", validate=False)
    assert wh.table_constraints("tx") == {"id_small": "id < 2"}


def test_syntax_error_fails_fast(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    with pytest.raises(Exception):
        wh.add_constraint("tx", "bad", "amt > ")
    assert wh.table_constraints("tx") == {}


def test_dml_paths_enforce(spark, tmp_path):
    """update_where and merge_when funnel through Transaction.append,
    so a DML write producing violating rows raises atomically."""
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    wh.add_constraint("tx", "amt_pos", "amt > 0")

    before = wh.read("tx").orderBy("id").collect()
    with pytest.raises(ConstraintViolation, match="amt_pos"):
        wh.update_where("tx", "id = 2", {"amt": "-amt"})
    assert wh.read("tx").orderBy("id").collect() == before

    src = spark.createDataFrame([(9, -3.0, "z")],
                                "id int, amt double, k string")
    from etl_pipeline_for_detection_banking_fraud_spark.operators import merge as M
    with pytest.raises(ConstraintViolation, match="amt_pos"):
        wh.merge_when("tx", src, ["id"],
                      not_matched=[M.when_not_matched_insert()])
    assert wh.read("tx").orderBy("id").collect() == before

    # a legal update still lands
    n = wh.update_where("tx", "id = 2", {"amt": "amt + 1"})
    assert n == 1
    assert wh.read("tx").where("id = 2").collect()[0]["amt"] == 21.0


def test_survives_compact_checkpoint_and_replay(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    wh.add_constraint("tx", "amt_pos", "amt > 0")
    wh.compact("tx")  # a replace must NOT reset the metadata channel
    assert wh.table_constraints("tx") == {"amt_pos": "amt > 0"}
    wh.write_checkpoint()
    wh2 = Warehouse(spark, wh.root)  # fresh replay (checkpoint path)
    assert wh2.table_constraints("tx") == {"amt_pos": "amt > 0"}
    with pytest.raises(ConstraintViolation):
        wh2.append(spark.createDataFrame(
            [(8, -1.0, "h")], "id int, amt double, k string"), "tx")


def test_legacy_table_adopted_by_add_constraint(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    df = spark.createDataFrame([(1, 1.0)], "id int, amt double")
    wh.append(df, "legacy")  # plain directory write, no commit log
    assert wh._manifest_files("legacy") is None
    wh.add_constraint("legacy", "amt_pos", "amt > 0")
    # table flipped to tracked reads, files intact
    assert wh._manifest_files("legacy") is not None
    assert wh.read("legacy").count() == 1
    with pytest.raises(ConstraintViolation):
        wh.append(spark.createDataFrame([(2, -1.0)],
                                        "id int, amt double"), "legacy")


def test_tracked_bare_append_goes_through_log(spark, tmp_path):
    """Appending to a TRACKED table outside a transaction must commit
    an entry (a raw directory write would be invisible to manifest
    reads) — and therefore be constraint-checked."""
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    head = wh.snapshots()[-1]["seq"]
    wh.append(spark.createDataFrame([(4, 4.0, "d")],
                                    "id int, amt double, k string"), "tx")
    assert wh.snapshots()[-1]["seq"] == head + 1
    assert wh.read("tx").count() == 4


def test_sql_door_constraint_statements(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    warehouse_sql(wh, "ALTER TABLE tx ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    assert wh.table_constraints("tx") == {"amt_pos": "amt > 0"}
    with pytest.raises(ConstraintViolation):
        warehouse_sql(wh, "INSERT INTO tx VALUES (9, -1.0, 'x')")

    warehouse_sql(wh, "ALTER TABLE tx ALTER COLUMN k SET NOT NULL")
    assert wh.table_constraints("tx")["nn__k"] == "k IS NOT NULL"
    with pytest.raises(ConstraintViolation):
        warehouse_sql(wh, "INSERT INTO tx VALUES (9, 1.0, NULL)")
    warehouse_sql(wh, "ALTER TABLE tx ALTER COLUMN k DROP NOT NULL")
    warehouse_sql(wh, "ALTER TABLE tx DROP CONSTRAINT amt_pos")
    warehouse_sql(wh, "INSERT INTO tx VALUES (9, -1.0, NULL)")
    assert wh.read("tx").count() == 4

    # re-adding with existing violations refuses (validate-on-add)
    with pytest.raises(ConstraintViolation):
        warehouse_sql(
            wh, "ALTER TABLE tx ADD CONSTRAINT amt_pos CHECK (amt > 0)")


def test_sql_door_show_describe_detail_zorder(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    df2 = spark.createDataFrame([(1, "2021-01-01")], "id int, dt string")
    with wh.transaction() as t:
        t.append(df2, "facts", partition_by=["dt"])
    wh.add_constraint("tx", "amt_pos", "amt > 0")

    st = warehouse_sql(wh, "SHOW TABLES").orderBy("table_name").collect()
    assert [r["table_name"] for r in st] == ["facts", "tx"]
    assert st[0]["partitioned_by"] == "dt"

    desc = warehouse_sql(wh, "DESCRIBE TABLE facts").collect()
    got = {r["col_name"]: (r["data_type"], r["comment"]) for r in desc}
    assert got["id"][0] == "int"
    assert got["dt"][1] == "partition"

    det = warehouse_sql(wh, "DESCRIBE DETAIL tx").collect()[0]
    assert det["name"] == "tx"
    assert det["num_files"] >= 1
    assert det["size_bytes"] > 0
    assert "amt_pos" in det["constraints"]

    warehouse_sql(wh, "OPTIMIZE tx ZORDER BY (id, amt)")
    assert wh.read("tx").count() == 3
    # constraints survive the zorder rewrite
    assert wh.table_constraints("tx") == {"amt_pos": "amt > 0"}


def test_streaming_sink_enforces_constraints(spark, tmp_path):
    """A streaming foreachBatch sink writing through the transactional
    API hits the same in-write enforcement: the violating microbatch
    fails the query and the target table commits NOTHING."""
    from etl_pipeline_for_detection_banking_fraud_spark.streaming.table_stream import (
        stream_table,
    )
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(1, 5.0), (2, -5.0)], "id int, amt double"), "src")
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(0, 1.0)],
                                       "id int, amt double"), "dst")
    wh.add_constraint("dst", "amt_pos", "amt > 0")
    head = wh.snapshots()[-1]["seq"]

    def _sink(df, _bid):
        with wh.transaction() as t:
            t.append(df, "dst")

    q = (stream_table(spark, wh.root, "src")
         .writeStream.foreachBatch(_sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="CHECK constraint|amt_pos"):
        q.awaitTermination(120)
    assert wh.snapshots()[-1]["seq"] == head
    assert wh.read("dst").count() == 1  # only the pre-stream row


def test_constraint_enforced_in_write_job_no_extra_pass(spark, tmp_path):
    """The enforcement guard rides the write's own plan: the staged
    write of a VALID frame succeeds with the constraint registered (no
    pre-scan job could have rejected it), and the physical plan of the
    constrained frame contains the assert_true filter."""
    wh = _wh(spark, tmp_path)
    _seed(spark, wh)
    wh.add_constraint("tx", "amt_pos", "amt > 0")
    t = wh.begin()
    try:
        g = t._constrained(wh.read("tx"), wh.table_constraints("tx"))
        plan = g._jdf.queryExecution().executedPlan().toString()
        assert "assert_true" in plan or "raise_error" in plan
    finally:
        t.abort()


def test_constraint_after_rename_readd_collision(spark, tmp_path):
    """CHECK enforcement must evaluate LOGICAL columns. After
    rename a->b + re-add a (logical 'a' binds a fresh physical slot
    while logical 'b' physically stores under 'a'), a CHECK on 'a'
    must judge the re-added column's data — never logical b's bytes
    that live under the physical name 'a'."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(1, 100), (2, 200)], "a int, k int"), "tx")
    wh.rename_column("tx", "a", "b")
    wh.add_columns("tx", {"a": "int"})
    phys = wh._schema_meta("tx")[1]
    assert phys.get("a", "a").lower() != "a"  # fresh physical slot
    wh.add_constraint("tx", "a_pos", "a > 0")

    # violating re-added column: must raise even though physical 'a'
    # (logical b) holds positive values
    head = wh.snapshots()[-1]["seq"]
    with pytest.raises(ConstraintViolation, match="a_pos"):
        wh.append(spark.createDataFrame(
            [(300, 3, -5)], "b int, k int, a int"), "tx")
    assert wh.snapshots()[-1]["seq"] == head

    # valid rows commit, and read back under logical names
    wh.append(spark.createDataFrame(
        [(300, 3, 7)], "b int, k int, a int"), "tx")
    rows = {r["k"]: (r["b"], r["a"])
            for r in wh.read("tx").collect()}
    assert rows[3] == (300, 7)
    assert rows[100] == (1, None)  # pre-evolution rows: typed NULL a
