"""DDL-runner (SRC3) and xlsx/seed source unit tests."""

from __future__ import annotations

import datetime
import os

from etl_pipeline_for_detection_banking_fraud_spark.sources.ddl import (
    run_ddl_script,
    split_statements,
)
from etl_pipeline_for_detection_banking_fraud_spark.sources.seed_dml import parse_seed_dml
from etl_pipeline_for_detection_banking_fraud_spark.sources.xlsx import read_passport_blacklist

from tests.conftest import DDL_DML


def test_split_statements_quotes_and_comments():
    sql = """
    -- a comment; with a semicolon
    CREATE TABLE t1 (x STRING); /* block; comment */
    INSERT INTO t1 VALUES ('a;b');
    SELECT * FROM t1
    """
    stmts = split_statements(sql)
    assert len(stmts) == 3
    assert "a;b" in stmts[1]


def test_run_ddl_script(spark, tmp_path):
    p = tmp_path / "ddl.sql"
    p.write_text(
        "CREATE OR REPLACE TEMPORARY VIEW ddl_smoke AS SELECT 1 AS x;\n"
        "CREATE OR REPLACE TEMPORARY VIEW ddl_smoke2 AS SELECT x + 1 AS y FROM ddl_smoke;"
    )
    n = run_ddl_script(spark, str(p))
    assert n == 2
    assert spark.sql("SELECT y FROM ddl_smoke2").first().y == 2


def test_seed_dml_counts():
    parsed = parse_seed_dml(DDL_DML)
    assert len(parsed["cards"]) == 195
    assert len(parsed["accounts"]) == 77
    assert len(parsed["clients"]) == 50
    c = parsed["clients"][0]
    assert c["passport_valid_to"] is None or isinstance(
        c["passport_valid_to"], datetime.date
    )


def test_blacklist_serial_dates_and_null_rows(spark, ref_data):
    bl = read_passport_blacklist(spark, f"{ref_data}/passport_blacklist_01032021.xlsx")
    rows = bl.collect()
    assert len(rows) == 7  # 17 trailing all-NULL sheet rows dropped
    assert all(r.date == datetime.date(2021, 3, 1) for r in rows)


class TestDistributedXlsx:
    """Round-6 distributed many-file ingest: binaryFile + mapInPandas
    over the same stdlib parser — parity with the driver-side readers
    on the real reference feeds."""

    def test_terminals_many_matches_per_file_union(self, spark, ref_data):
        from etl_pipeline_for_detection_banking_fraud_spark.sources import xlsx

        many = xlsx.read_terminals_many(
            spark, os.path.join(ref_data, "terminals_*.xlsx")
        )
        plan = many._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan  # parse runs executor-side
        got = sorted(
            map(tuple, many.drop("src_file").collect())
        )
        want = []
        for d in ("01032021", "02032021", "03032021"):
            want.extend(
                map(tuple, xlsx.read_terminals(
                    spark, os.path.join(ref_data, f"terminals_{d}.xlsx")
                ).collect())
            )
        assert got == sorted(want)
        # src_file attribution: one distinct path per day file
        assert many.select("src_file").distinct().count() == 3

    def test_blacklist_many_serial_dates(self, spark, ref_data):
        from etl_pipeline_for_detection_banking_fraud_spark.sources import xlsx

        many = xlsx.read_passport_blacklist_many(
            spark, os.path.join(ref_data, "passport_blacklist_*.xlsx")
        )
        got = sorted(map(tuple, many.drop("src_file").collect()))
        want = []
        for d in ("01032021", "02032021", "03032021"):
            want.extend(
                map(tuple, xlsx.read_passport_blacklist(
                    spark, os.path.join(ref_data, f"passport_blacklist_{d}.xlsx")
                ).collect())
            )
        assert got == sorted(want)
        assert len(got) > 0
