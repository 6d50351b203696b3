"""Scale-utility tests: bucketed joins must read shuffle-free; salted
joins must produce exactly the unsalted result."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.operators import scale


def test_bucketed_join_has_no_exchange(spark, sf01):
    # session warehouse dir points at a temp dir (conftest)
    orders = spark.read.parquet(f"{sf01}/orders.parquet")
    customer = spark.read.parquet(f"{sf01}/customer.parquet")
    scale.write_bucketed(
        orders.select(F.col("o_custkey").alias("k"), "o_orderkey"), "b_orders", "k", 8
    )
    scale.write_bucketed(
        customer.select(F.col("c_custkey").alias("k"), "c_name"), "b_customer", "k", 8
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_customer"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() == 15000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_matches_plain_join(spark, sf01):
    orders = spark.read.parquet(f"{sf01}/orders.parquet").select(
        F.col("o_custkey").alias("k"), "o_orderkey"
    )
    customer = spark.read.parquet(f"{sf01}/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    plain = orders.join(customer, "k").select("k", "o_orderkey", "c_name")
    salted = scale.salted_join(orders, customer, "k").select("k", "o_orderkey", "c_name")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


class TestStrCurve:
    """Order preservation of the z-order string transform — the exact
    property raw-string file skipping depends on."""

    def test_monotone_over_random_strings(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from etl_pipeline_for_detection_banking_fraud_spark.operators.scale import (
            str_curve_pos,
        )

        @settings(max_examples=300, deadline=None)
        @given(st.lists(st.text(max_size=24), min_size=2, max_size=12),
               st.text(max_size=6))
        def check(vals, prefix):
            vals = [prefix + v for v in vals]
            lo, hi = min(vals), max(vals)
            blo, bhi = lo.encode("utf-8"), hi.encode("utf-8")
            p = 0
            while p < min(len(blo), len(bhi)) and blo[p] == bhi[p]:
                p += 1
            ranked = sorted(vals)
            pos = [str_curve_pos(v, p) for v in ranked]
            # a <= b (lex) => pos(a) <= pos(b); ties only allowed, never
            # inversions
            assert all(a <= b for a, b in zip(pos, pos[1:]))

        check()

    def test_spark_expr_matches_driver_pos(self, spark):
        from etl_pipeline_for_detection_banking_fraud_spark.operators.scale import (
            str_curve,
            str_curve_pos,
        )

        vals = ["card000", "card063", "cab", "car", "cards999x",
                "card", "cardZ", "caré", "cardé中"]
        lo, hi = min(vals), max(vals)
        blo, bhi = lo.encode("utf-8"), hi.encode("utf-8")
        p = 0
        while p < min(len(blo), len(bhi)) and blo[p] == bhi[p]:
            p += 1
        plo, phi, expr = str_curve(F.col("s"), lo, hi)
        assert (plo, phi) == (str_curve_pos(lo, p), str_curve_pos(hi, p))
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        got = {r["s"]: r["pos"] for r in
               df.select("s", expr.alias("pos")).collect()}
        for v in vals:
            assert got[v] == str_curve_pos(v, p), v

    def test_null_bounds_degenerate(self):
        from etl_pipeline_for_detection_banking_fraud_spark.operators.scale import (
            str_curve,
        )

        lo, hi, _ = str_curve(F.col("s"), None, None)
        assert lo is None and hi is None


class TestZorderKey:
    def test_matches_reference_morton_interleave(self, spark):
        """zorder_key == the textbook Morton code: bit i of column j
        lands at curve bit i*m + j. Cross-checked against an
        independent pure-Python interleave over random coordinates."""
        import random

        from etl_pipeline_for_detection_banking_fraud_spark.operators.scale import (
            zorder_key,
        )

        rnd = random.Random(7)
        bits, m = 8, 3
        rows = [tuple(rnd.randrange(1 << bits) for _ in range(m))
                for _ in range(64)]

        def morton(coords):
            z = 0
            for i in range(bits):
                for j, c in enumerate(coords):
                    z |= ((c >> i) & 1) << (i * m + j)
            return z

        df = spark.createDataFrame(rows, "x long, y long, z long")
        got = [r["zk"] for r in df.select(zorder_key(
            [F.col("x"), F.col("y"), F.col("z")], bits).alias("zk"),
            "x", "y", "z").orderBy("x", "y", "z").collect()]
        want = [morton(c) for c in sorted(rows)]
        assert got == want



class TestZorderScaleCol:
    def test_per_group_bounds_and_degenerate_groups(self, spark):
        """Per-group scaling uses each group's own min/max; all-NULL and
        single-value groups (NULL or zero range) map to the curve
        origin, mirroring zorder_scale's literal-bounds contract."""
        from pyspark.sql.window import Window

        from etl_pipeline_for_detection_banking_fraud_spark.operators.scale import (
            zorder_scale_col,
        )

        rows = [
            ("a", 0.0), ("a", 50.0), ("a", 100.0),   # full range
            ("b", 7.0), ("b", 7.0),                  # degenerate: rng 0
            ("c", None), ("c", None),                # degenerate: NULL
            ("d", -10.0), ("d", 10.0),               # shifted range
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        w = Window.partitionBy("g")
        out = df.select(
            "g", "v",
            zorder_scale_col(F.col("v"), F.min("v").over(w),
                             F.max("v").over(w), bits=8).alias("s"),
        ).collect()
        got = {(r["g"], r["v"]): r["s"] for r in out}
        assert got[("a", 0.0)] == 0
        assert got[("a", 50.0)] == 127   # floor(50/100 * 255)
        assert got[("a", 100.0)] == 255
        assert got[("b", 7.0)] == 0
        assert got[("c", None)] == 0
        assert got[("d", -10.0)] == 0 and got[("d", 10.0)] == 255


class TestZorderKeyOverflow:
    def test_sign_bit_guard(self):
        """bits*m > 63 would land the top interleaved bit in the long's
        sign bit — negative keys break the curve's ordering silently, so
        the construction refuses (round-7 advisor item)."""
        from etl_pipeline_for_detection_banking_fraud_spark.operators.scale import (
            zorder_key,
        )

        cols8 = [F.col(f"c{i}") for i in range(8)]
        with pytest.raises(ValueError, match="63"):
            zorder_key(cols8, bits=8)  # 64 bits: one too many
        zorder_key(cols8[:7], bits=9)  # 63: exactly fits
        with pytest.raises(ValueError, match="63"):
            zorder_key(cols8[:2], bits=32)
