"""SQL door (sql_door.warehouse_sql): DELETE / UPDATE / MERGE INTO /
INSERT / time travel / plain SELECT over auto-registered views —
parsed by Spark's own SQL parser, routed through the transactional
warehouse API. Closes the round-9 'no SQL door for DML/time travel'
gap."""

from __future__ import annotations

import pytest

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    Warehouse,
)
from etl_pipeline_for_detection_banking_fraud_spark.sql_door import (
    warehouse_sql,
)


@pytest.fixture()
def wh(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with wh.transaction():
        wh.append(spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(10)],
            "k long, name string, v double").coalesce(2), "t")
    return wh


class TestSqlDml:
    def test_delete_update_select(self, spark, wh):
        assert warehouse_sql(wh, "DELETE FROM t WHERE k >= 8") == 2
        assert warehouse_sql(
            wh, "UPDATE t SET v = v + 100, name = 'u' WHERE k < 2") == 2
        got = {r["k"]: (r["name"], r["v"])
               for r in warehouse_sql(wh, "SELECT * FROM t").collect()}
        assert len(got) == 8
        assert got[0] == ("u", 100.0) and got[7] == ("n7", 7.0)
        # full-table DELETE (no WHERE) is the Literal-true condition
        assert warehouse_sql(wh, "DELETE FROM t") == 8
        assert wh.read("t").count() == 0

    def test_time_travel_version_and_timestamp(self, spark, wh):
        v0 = wh._latest_seq()
        ts0 = [s for s in wh.snapshots() if s["seq"] == v0][0]
        warehouse_sql(wh, "DELETE FROM t WHERE k < 5")
        assert warehouse_sql(
            wh, f"SELECT count(*) AS n FROM t VERSION AS OF {v0}"
        ).collect()[0]["n"] == 10
        assert warehouse_sql(
            wh, "SELECT count(*) AS n FROM t").collect()[0]["n"] == 5
        if ts0.get("committed_at"):
            q = (f"SELECT count(*) AS n FROM t TIMESTAMP AS OF "
                 f"'{ts0['committed_at']}'")
            assert warehouse_sql(wh, q).collect()[0]["n"] == 10

    def test_insert_into_and_overwrite(self, spark, wh):
        warehouse_sql(
            wh, "INSERT INTO t SELECT 77 AS k, 'ins' AS name, 7.5 AS v")
        assert wh.read("t").where("k = 77").count() == 1
        warehouse_sql(
            wh, "INSERT OVERWRITE t SELECT 1 AS k, 'only' AS name, 1.0 AS v")
        assert [(r["k"], r["name"]) for r in wh.read("t").collect()] == \
            [(1, "only")]
        # overwrite is a logical replace: pre-overwrite snapshot readable
        assert wh.read_at("t", wh._latest_seq() - 1).count() == 11

    def test_merge_into_full_clause_surface(self, spark, wh):
        spark.createDataFrame(
            [(1, 11.0, "U"), (3, 0.0, "D"), (55, 5.0, "I"),
             (999, 1.0, "I")],
            "k long, nv double, op string").createOrReplaceTempView("chg")
        res = warehouse_sql(wh, """
            MERGE INTO t AS tg USING (SELECT * FROM chg) AS s
            ON tg.k = s.k
            WHEN MATCHED AND s.op = 'U' THEN UPDATE SET v = s.nv
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN NOT MATCHED AND s.k < 100
                 THEN INSERT (k, name, v) VALUES (s.k, 'new', s.nv)
            WHEN NOT MATCHED BY SOURCE AND tg.k = 7 THEN DELETE
        """)
        assert res == {"updated": 1, "deleted": 2, "inserted": 1}
        got = {r["k"]: r["v"] for r in wh.read("t").collect()}
        assert got[1] == 11.0 and got[55] == 5.0
        assert 3 not in got and 7 not in got and 999 not in got

    def test_merge_star_actions(self, spark, wh):
        spark.createDataFrame(
            [(2, "star", 222.0), (66, "s66", 66.0)],
            "k long, name string, v double").createOrReplaceTempView("chg2")
        res = warehouse_sql(wh, """
            MERGE INTO t USING chg2 ON t.k = chg2.k
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """)
        assert res == {"updated": 1, "deleted": 0, "inserted": 1}
        got = {r["k"]: (r["name"], r["v"]) for r in wh.read("t").collect()}
        assert got[2] == ("star", 222.0) and got[66] == ("s66", 66.0)

    def test_merge_rejects_non_equi_on(self, spark, wh):
        spark.createDataFrame([(1, 1.0)], "k long, nv double") \
            .createOrReplaceTempView("chg3")
        with pytest.raises(ValueError, match="equi"):
            warehouse_sql(wh, """
                MERGE INTO t USING chg3 ON t.k > chg3.k
                WHEN MATCHED THEN DELETE
            """)

    def test_existing_view_not_clobbered(self, spark, wh):
        spark.createDataFrame([(1,)], "only long") \
            .createOrReplaceTempView("t_custom")
        df = warehouse_sql(wh, "SELECT * FROM t_custom")
        assert df.columns == ["only"]

    def test_merge_bare_using_table_name_is_the_alias(self, spark, wh):
        """`USING chg` without AS: the statement references the source
        as `chg.<col>` — the table name must become the merge alias."""
        spark.createDataFrame([(1, 100.0), (99, 9.0)],
                              "k long, nv double") \
            .createOrReplaceTempView("chg")
        res = warehouse_sql(wh, """
            MERGE INTO t USING chg ON t.k = chg.k
            WHEN MATCHED THEN UPDATE SET v = chg.nv
            WHEN NOT MATCHED THEN INSERT (k, name, v)
                 VALUES (chg.k, 'ins', chg.nv)
        """)
        assert res == {"updated": 1, "deleted": 0, "inserted": 1}
        got = {r["k"]: r["v"] for r in wh.read("t").collect()}
        assert got[1] == 100.0 and got[99] == 9.0

    def test_insert_values_form(self, spark, wh):
        warehouse_sql(wh, "INSERT INTO t VALUES (55, 'val', 5.5)")
        got = wh.read("t").where("k = 55").collect()
        assert [(r["name"], r["v"]) for r in got] == [("val", 5.5)]

    def test_create_table_as_select(self, spark, wh):
        warehouse_sql(wh, """
            CREATE TABLE t_big PARTITIONED BY (name)
            AS SELECT k, name, v * 2 AS v2 FROM t WHERE k >= 8
        """)
        got = sorted((r["k"], r["v2"]) for r in wh.read("t_big").collect())
        assert got == [(8, 16.0), (9, 18.0)]
        # tracked + partitioned by the CTAS clause
        assert wh.table_partition_by("t_big") == ["name"]
        assert all(r.startswith("name=")
                   for r in wh._manifest_files("t_big"))
        with pytest.raises(ValueError, match="already exists"):
            warehouse_sql(wh, "CREATE TABLE t_big AS SELECT 1 AS x")
        # IF NOT EXISTS no-ops
        warehouse_sql(
            wh, "CREATE TABLE IF NOT EXISTS t_big AS SELECT 1 AS x")
        assert wh.read("t_big").count() == 2

    def test_maintenance_statements(self, spark, wh):
        warehouse_sql(wh, "DELETE FROM t WHERE k = 0")
        hist = warehouse_sql(wh, "DESCRIBE HISTORY t")
        rows = hist.orderBy("version").collect()
        assert [r["operation"] for r in rows] == ["add", "replace"]
        assert rows[-1]["committed_at"] is not None
        # OPTIMIZE compacts the 2-file table into 1
        assert len(wh._manifest_files("t")) >= 1
        warehouse_sql(wh, "OPTIMIZE t")
        assert len(wh._manifest_files("t")) == 1
        assert wh.read("t").count() == 9
        assert warehouse_sql(wh, "VACUUM t") >= 0

    def test_restore_statement(self, spark, wh):
        v0 = wh._latest_seq()
        warehouse_sql(wh, "DELETE FROM t WHERE k < 5")
        assert wh.read("t").count() == 5
        warehouse_sql(wh, f"RESTORE TABLE t TO VERSION AS OF {v0}")
        assert wh.read("t").count() == 10


class TestTableChanges:
    def test_table_changes_function(self, spark, wh):
        """Delta's table_changes('t', since) TVF: usable anywhere a
        relation is, Delta-named _change_type column, rows exactly the
        CDF sidecar entries after the given commit."""
        base = wh.snapshots()[-1]["seq"]
        assert warehouse_sql(
            wh, "DELETE FROM t WHERE k = 9") == 1  # no cdf: not in feed
        wh.delete_where("t", "k = 8", cdf=True)
        wh.update_where("t", "k = 1", {"v": "101.0"}, cdf=True)
        rows = warehouse_sql(
            wh,
            f"SELECT _change_type, k, v FROM table_changes('t', {base}) "
            "ORDER BY _change_type, k").collect()
        got = [(r["_change_type"], r["k"], r["v"]) for r in rows]
        assert got == [("delete", 8, 8.0),
                       ("update_postimage", 1, 101.0),
                       ("update_preimage", 1, 1.0)]
        # aggregable like any relation
        n = warehouse_sql(
            wh,
            f"SELECT count(*) AS n FROM table_changes('t', {base}) "
            "WHERE _change_type = 'delete'").collect()[0]["n"]
        assert n == 1
        # a later since excludes earlier changes
        mid = wh.snapshots()[-1]["seq"] - 1
        later = warehouse_sql(
            wh,
            f"SELECT _change_type FROM table_changes('t', {mid})"
        ).collect()
        assert {r["_change_type"] for r in later} == {
            "update_preimage", "update_postimage"}


class TestCatalogStatements:
    def test_show_create_table(self, spark, wh):
        wh.add_constraint("t", "v_pos", "v >= 0")
        ddl = warehouse_sql(
            wh, "SHOW CREATE TABLE t").collect()[0]["createtab_stmt"]
        assert "CREATE TABLE t" in ddl
        assert "k BIGINT" in ddl and "v DOUBLE" in ddl
        assert "CONSTRAINT v_pos CHECK (v >= 0)" in ddl

    def test_describe_history_filters_to_table(self, spark, wh):
        with wh.transaction():
            wh.append(spark.createDataFrame([(1,)], "x int"), "other")
        wh.add_constraint("t", "v_pos", "v >= 0")  # metadata commit
        hist_t = warehouse_sql(wh, "DESCRIBE HISTORY t").collect()
        hist_o = warehouse_sql(wh, "DESCRIBE HISTORY other").collect()
        # t's history: seed append + the constraint metadata commit
        assert len(hist_t) == 2
        assert len(hist_o) == 1
        assert all("other" not in r["tables"] for r in hist_t)


class TestRound11Fixes:
    def test_literal_containing_version_as_of_untouched(self, spark, wh):
        """A string literal containing 'VERSION AS OF n' is data —
        the time-travel rewrite must not fire inside it."""
        rows = warehouse_sql(
            wh,
            "SELECT 'FROM t VERSION AS OF 1' AS note, count(*) AS n "
            "FROM t").collect()
        assert rows[0]["note"] == "FROM t VERSION AS OF 1"
        assert rows[0]["n"] == 10
        # and the real clause still rewrites in the same statement
        v0 = wh._latest_seq()
        warehouse_sql(wh, "DELETE FROM t WHERE k = 0")
        rows = warehouse_sql(
            wh,
            "SELECT 'x JOIN t VERSION AS OF 99 y' AS note, count(*) AS n "
            f"FROM t VERSION AS OF {v0}").collect()
        assert rows[0]["n"] == 10
        assert "99" in rows[0]["note"]

    def test_literal_containing_table_changes_untouched(self, spark, wh):
        rows = warehouse_sql(
            wh, "SELECT 'table_changes(''t'', 1)' AS s FROM t LIMIT 1"
        ).collect()
        assert rows[0]["s"] == "table_changes('t', 1)"

    def test_describe_temp_view_falls_through(self, spark, wh):
        """DESCRIBE on a registered non-warehouse temp view must fall
        through to spark.sql, not raise FileNotFoundError."""
        spark.createDataFrame([(1, "a")], "id int, s string") \
            .createOrReplaceTempView("some_view")
        rows = warehouse_sql(wh, "DESCRIBE some_view").collect()
        cols = {r["col_name"] for r in rows}
        assert {"id", "s"} <= cols
        # warehouse tables still take the door's metadata path
        rows_t = warehouse_sql(wh, "DESCRIBE t").collect()
        assert {r["col_name"] for r in rows_t} == {"k", "name", "v"}

    def test_drop_not_null_never_set_is_noop(self, spark, wh):
        # never set through the door: Delta semantics = no-op
        assert warehouse_sql(
            wh, "ALTER TABLE t ALTER COLUMN name DROP NOT NULL") is None
        # set then dropped then dropped again: second drop is a no-op
        warehouse_sql(wh, "ALTER TABLE t ALTER COLUMN name SET NOT NULL")
        assert "nn__name" in wh.table_constraints("t")
        warehouse_sql(wh, "ALTER TABLE t ALTER COLUMN name DROP NOT NULL")
        assert "nn__name" not in wh.table_constraints("t")
        warehouse_sql(wh, "ALTER TABLE t ALTER COLUMN name DROP NOT NULL")


class TestCreateDropTable:
    """Round-11: CREATE TABLE (cols) — empty declared-schema table —
    and DROP TABLE, both one metadata commit."""

    def test_create_table_then_lifecycle(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "w2"))
        warehouse_sql(
            wh, "CREATE TABLE ev (id INT, dt STRING, v DOUBLE) "
                "PARTITIONED BY (dt)")
        # reads are empty-typed from the declaration
        df = wh.read("ev")
        assert df.count() == 0
        assert df.columns == ["id", "dt", "v"]
        assert "ev" in wh.tables()
        assert wh.count_rows("ev") == 0
        # IF NOT EXISTS no-ops; plain CREATE raises
        warehouse_sql(wh, "CREATE TABLE IF NOT EXISTS ev (id INT)")
        with pytest.raises(ValueError, match="already exists"):
            warehouse_sql(wh, "CREATE TABLE ev (id INT)")
        # appends validate against the declaration and follow the
        # recorded partition spec through the SQL INSERT path
        warehouse_sql(wh, "INSERT INTO ev VALUES (1, '2021-03-01', 1.5)")
        assert wh.table_partition_by("ev") == ["dt"]
        assert all(r.startswith("dt=")
                   for r in wh._manifest_files("ev"))
        with pytest.raises(ValueError, match="declared schema"):
            wh.append(spark.createDataFrame(
                [(2, "2021-03-01", "oops")],
                "id int, dt string, v string"), "ev")
        # declared-schema evolution composes
        wh.add_columns("ev", {"tag": "string"})
        assert wh.read("ev").columns == ["id", "dt", "v", "tag"]

    def test_drop_table_removes_catalog_and_files(self, spark, tmp_path):
        import os

        wh = Warehouse(spark, str(tmp_path / "w3"))
        with wh.transaction():
            wh.append(spark.createDataFrame(
                [(i,) for i in range(10)], "id int").coalesce(2), "t1")
        wh.add_constraint("t1", "id_pos", "id >= 0")
        wh.set_bloom_filter("t1", ["id"])
        drop_seq_before = wh._latest_seq()
        warehouse_sql(wh, "DROP TABLE t1")
        assert "t1" not in wh.tables()
        assert not os.path.isdir(os.path.join(wh.root, "t1"))
        assert wh.table_constraints("t1") == {}
        assert wh.table_bloom_filter("t1") is None
        with pytest.raises(FileNotFoundError):
            wh.read("t1")
        # time travel below the drop raises the typed retention error
        from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
            SnapshotVacuumed,
        )
        with pytest.raises(SnapshotVacuumed):
            wh.read_at("t1", drop_seq_before)
        # IF EXISTS no-ops, plain drop raises
        warehouse_sql(wh, "DROP TABLE IF EXISTS t1")
        with pytest.raises(FileNotFoundError):
            warehouse_sql(wh, "DROP TABLE t1")

    def test_drop_then_recreate_is_fresh_history(self, spark, tmp_path):
        wh = Warehouse(spark, str(tmp_path / "w4"))
        with wh.transaction():
            wh.append(spark.createDataFrame([(1, "old")],
                                            "id int, s string"), "t")
        wh.drop_table("t")
        warehouse_sql(wh, "CREATE TABLE t (id INT, n DOUBLE)")
        warehouse_sql(wh, "INSERT INTO t VALUES (7, 7.5)")
        rows = wh.read("t").collect()
        assert [(r["id"], r["n"]) for r in rows] == [(7, 7.5)]
        # the dropped generation's stats/ghosts never resurface
        assert set(wh._manifest_stats("t")) == set(wh._manifest_files("t"))
        # survives checkpoint + cold replay
        wh.write_checkpoint()
        cold = Warehouse(spark, wh.root)
        assert cold.read("t").count() == 1
        assert "s" not in cold.read("t").columns


def test_sql_door_clone_spec_vacuum_retain(spark, tmp_path):
    """Round-12 maintenance statements: SHALLOW CLONE, SET PARTITION
    SPEC, VACUUM RETAIN."""
    import os as _os

    wh = Warehouse(spark, str(tmp_path / "wh"))
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(1, "2021-03-01"), (2, "2021-03-02")],
            "id int, dt string").coalesce(1), "src")
    n = warehouse_sql(wh, "CREATE TABLE dst SHALLOW CLONE src")
    assert n == 1
    assert wh.read("dst").count() == 2
    warehouse_sql(wh, "ALTER TABLE dst SET PARTITION SPEC (dt)")
    assert wh.table_partition_by("dst") == ["dt"]
    wh.append(spark.createDataFrame(
        [(3, "2021-03-03")], "id int, dt string"), "dst")
    assert any(r.startswith("dt=") for r in wh._manifest_files("dst"))
    warehouse_sql(wh, "ALTER TABLE dst SET PARTITION SPEC ()")
    assert wh.table_partition_by("dst") == []
    # VACUUM RETAIN keeps a young orphan, bare VACUUM reclaims it
    orphan = _os.path.join(wh.root, "dst", "txn-crashed-000.parquet")
    committed = _os.path.join(
        wh.root, "src", wh._manifest_files("src")[0])
    import shutil as _sh
    _sh.copyfile(committed, orphan)
    assert warehouse_sql(wh, "VACUUM dst RETAIN 1 HOURS") == 0
    assert _os.path.exists(orphan)
    assert warehouse_sql(wh, "VACUUM dst") == 1
    assert not _os.path.exists(orphan)


def test_table_files_metadata_relation(spark, tmp_path):
    """table_files('t') — the Iceberg $files metadata relation as a
    TVF: one row per live file with partition values, footer row
    counts, sizes, bloom presence, dv coverage; composes in SQL."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with wh.transaction() as t:
        for d in (1, 2):
            t.append(spark.createDataFrame(
                [(d * 10 + i, f"2021-03-0{d}") for i in range(5)],
                "id int, dt string").coalesce(1),
                "ev", partition_by=["dt"])
    wh.delete_where("ev", "id = 11", mode="dv")
    rows = {r["file"]: r for r in warehouse_sql(
        wh, "SELECT * FROM table_files('ev')").collect()}
    assert len(rows) == 2
    assert all(r["row_count"] == 5 and r["size_bytes"] > 0
               for r in rows.values())
    parts = sorted(r["partition_values"] for r in rows.values())
    assert parts == ['{"dt": "2021-03-01"}', '{"dt": "2021-03-02"}']
    assert sorted(r["dv_covered"] for r in rows.values()) == \
        [False, True]
    # composes: small-file audit aggregate over the metadata relation
    n = warehouse_sql(
        wh, "SELECT count(*) AS n FROM table_files('ev') "
            "WHERE size_bytes < 1024*1024").collect()[0]["n"]
    assert n == 2
    # a string literal containing the call is untouched
    lit = warehouse_sql(
        wh, "SELECT 'table_files(''ev'')' AS s").collect()[0]["s"]
    assert lit == "table_files('ev')"


def test_table_files_column_stats_show_clustering_quality(spark,
                                                          tmp_path):
    """r12 verdict item #7: table_files surfaces the per-column
    [min, max] bounds the manifest already holds, so clustering
    quality is inspectable straight from the TVF — after
    cluster_table('ev', 'id') every file's id-range is narrow and the
    ranges are pairwise DISJOINT, where the pre-cluster round-robin
    files all spanned the full domain."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with wh.transaction() as t:
        # 4 round-robin files, each spanning ~the whole id domain
        t.append(spark.createDataFrame(
            [(i, float(i)) for i in range(400)],
            "id int, v double").repartition(4), "ev")

    def ranges():
        rows = warehouse_sql(
            wh, "SELECT file, column_stats FROM table_files('ev')"
        ).collect()
        out = []
        for r in rows:
            cs = r["column_stats"]
            assert cs is not None and "id" in cs
            lo, hi = cs["id"]
            out.append((int(lo), int(hi)))
        return sorted(out)

    before = ranges()
    assert len(before) == 4
    # round-robin: every file's range covers most of the domain
    assert all(hi - lo > 300 for lo, hi in before)

    wh.cluster_table("ev", "id", n_files=4)
    after = ranges()
    assert len(after) == 4
    assert all(hi - lo < 200 for lo, hi in after)
    # pairwise disjoint ranges = the clustering actually clusters
    for (lo1, hi1), (lo2, _hi2) in zip(after, after[1:]):
        assert hi1 < lo2
    # row_count still rides along and sums to the table
    tot = warehouse_sql(
        wh, "SELECT sum(row_count) AS n FROM table_files('ev')"
    ).collect()[0]["n"]
    assert tot == 400
