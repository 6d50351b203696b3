"""Extended coverage catalog: aggregation shapes, string surface,
windows, sorts — engine completeness beyond the reference's minimal
operator set (the reference delegates all of this to Postgres; a
replacement engine must own it)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .testdata_queries import _q, _spread, _t


@_q(
    "pivot_agg",
    "pivot: groupBy + pivot on a low-cardinality column",
    """
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_linestatus = 'O') AS n_open,
           count(*) FILTER (WHERE l_linestatus = 'F') AS n_final,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'O')
                AS DOUBLE) AS qty_open,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'F')
                AS DOUBLE) AS qty_final
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    is_o = F.col("l_linestatus") == "O"
    is_f = F.col("l_linestatus") == "F"
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(is_o, 1)).alias("n_open"),
        F.count(F.when(is_f, 1)).alias("n_final"),
        F.sum(F.when(is_o, qty)).cast("double").alias("qty_open"),
        F.sum(F.when(is_f, qty)).cast("double").alias("qty_final"),
    )


@_q(
    "rollup_agg",
    "rollup: hierarchical subtotals (grouping sets)",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@_q(
    "distinct_count_agg",
    "exact distinct counts + conditional aggregation per group",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_big
    FROM orders GROUP BY o_orderstatus
    """,
)
def distinct_count_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
    )


@_q(
    "string_funcs",
    "string surface: substring / regexp_extract / LIKE / position / case",
    """
    SELECT p_partkey,
           substr(p_name, 1, 8) AS name_prefix,
           upper(p_brand) AS brand_uc,
           regexp_extract(p_type, '([A-Z]+)', 1) AS type_head,
           (p_name LIKE '%steel%') AS has_steel,
           length(p_name) AS name_len,
           strpos(p_type, 'BRASS') AS brass_pos
    FROM part
    """,
)
def string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.upper("p_brand").alias("brand_uc"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_head"),
        F.col("p_name").like("%steel%").alias("has_steel"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_type"), "BRASS").alias("brass_pos"),
    )


@_q(
    "global_topk",
    "global ORDER BY + LIMIT over a total order",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def global_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@_q(
    "running_window",
    "running aggregation: cumulative sum + moving row frame per key",
    """
    SELECT user_id, event_id,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS running_n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
    FROM events
    """,
)
def running_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("running_n"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w.rowsBetween(-2, 0))
        .cast("double")
        .alias("moving_sum3"),
    )


@_q(
    "lead_lag_window",
    "lead/lag navigation with defaults",
    """
    SELECT event_id, user_id,
           lag(event_id, 1, -1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_id,
           lead(event_id, 1, -1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_id
    FROM events
    """,
)
def lead_lag_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id", 1, -1).over(w).alias("prev_id"),
        F.lead("event_id", 1, -1).over(w).alias("next_id"),
    )


@_q(
    "rank_funcs",
    "ranking window surface: dense_rank / ntile / percent_rank / cume_dist "
    "over a deterministic total order",
    """
    SELECT o_orderkey,
           dense_rank() OVER w AS drk,
           ntile(4) OVER w AS quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
           CAST(cume_dist() OVER w AS DOUBLE) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def rank_funcs(spark, sf_dir):
    # percent_rank/cume_dist are exact rational arithmetic on (rank, n)
    # — both engines derive them from identical integer ranks over the
    # same total order, so the doubles are bit-identical
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@_q(
    "date_parts",
    "temporal extraction surface: date_trunc + year/month/day/hour + "
    "ISO weekday (convention-pinned across engines)",
    """
    SELECT event_id,
           CAST(date_trunc('month', ts) AS DATE) AS month_start,
           CAST(date_trunc('quarter', ts) AS DATE) AS quarter_start,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           CAST(isodow(ts) - 1 AS BIGINT) AS wd
    FROM events
    """,
)
def date_parts(spark, sf_dir):
    # weekday conventions differ per engine (Spark dayofweek: 1=Sunday;
    # DuckDB dayofweek: 0=Sunday; isodow: 1=Monday) — pinned to Spark's
    # weekday() == 0=Monday == DuckDB isodow - 1
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("month", "ts").cast("date").alias("month_start"),
        F.date_trunc("quarter", "ts").cast("date").alias("quarter_start"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.weekday("ts").cast("long").alias("wd"),
    )


@_q(
    "scalar_subquery",
    "scalar-subquery shape: rows above the global mean, in exact "
    "arithmetic (price * count > sum avoids double-averaging drift)",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,4)) * (SELECT count(*) FROM orders)
          > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders)
    """,
)
def scalar_subquery(spark, sf_dir):
    # the scalar aggregate rides as a broadcast 1-row crossJoin (same
    # zero-shuffle shape as text_tfidf_topk's corpus size N); the
    # comparison stays in exact decimal arithmetic so the predicate is
    # engine-independent
    o = _t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    stats = o.agg(F.sum(dec).alias("_sum"), F.count("*").alias("_n"))
    return (
        o.crossJoin(F.broadcast(stats))
        .where(dec * F.col("_n") > F.col("_sum"))
        .select("o_orderkey", "o_totalprice")
    )


@_q(
    "case_when_bucketing",
    "CASE WHEN bucketing + group count (histogramming)",
    """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'huge' END AS bucket,
           count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def case_when_bucketing(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("huge")
    )
    return o.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


@_q(
    "json_extract",
    "semi-structured: JSON field extraction from a string column",
    """
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


def approx_stats(spark, sf_dir):
    """HLL distinct + quantile sketches. RETIRED from the catalog in r8
    (it was the one rows-only entry): its sketch VALUES are pinned to
    their published error bounds by the exact-oracle ``approx_stats_bounds``
    entry below, and ``tests/test_oracle_parity.py::
    test_approx_stats_within_published_bounds`` asserts the same contract
    locally — so retiring it makes the catalog 100% exact-oracle without
    losing any checked behavior."""
    # Scalar quantile columns (not an array) so the driver's pandas-based
    # canonicalizer can sort/hash the frame (r1: array column -> unhashable).
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.95).alias("p95"),
        F.percentile_approx("l_extendedprice", 0.99).alias("p99"),
        F.count("*").alias("n"),
    )


@_q(
    "approx_stats_bounds",
    "approx_stats' sketches CLAMPED to their published error bounds vs "
    "the exact values — a deterministic boolean-per-metric frame, so "
    "the sketch entry gets an EXACT oracle: a correct engine yields "
    "all-TRUE, which is precisely what the oracle asserts",
    """
    SELECT l_returnflag,
           TRUE AS parts_ok, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_stats_bounds(spark, sf_dir):
    """Published bounds: approx_count_distinct's default rsd is 0.05
    (relative standard deviation — 3*rsd is a ~99.7% envelope);
    percentile_approx at the default accuracy 10000 returns a value
    whose RANK is within 1/10000 of the target, so the value must lie
    between the exact quantiles one full percent either side (margin
    100x the guarantee). If a sketch ever walks outside these bounds
    the booleans flip and the driver's hash check goes red."""
    li = _t(spark, sf_dir, "lineitem")
    price = 'CAST(l_extendedprice AS DOUBLE)'
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("ad"),
        F.countDistinct("l_partkey").alias("ed"),
        F.percentile_approx("l_extendedprice", 0.5).alias("a50"),
        F.percentile_approx("l_extendedprice", 0.95).alias("a95"),
        F.percentile_approx("l_extendedprice", 0.99).alias("a99"),
        F.expr(f"percentile({price}, 0.49)").alias("e49"),
        F.expr(f"percentile({price}, 0.51)").alias("e51"),
        F.expr(f"percentile({price}, 0.94)").alias("e94"),
        F.expr(f"percentile({price}, 0.96)").alias("e96"),
        F.expr(f"percentile({price}, 0.98)").alias("e98"),
        F.expr(f"percentile({price}, 1.0)").alias("e100"),
    )
    ok = lambda a, lo, hi: (F.col(a) >= F.col(lo)) & (F.col(a) <= F.col(hi))  # noqa: E731
    return agg.select(
        "l_returnflag",
        (
            F.abs(F.col("ad") - F.col("ed"))
            <= F.lit(3 * 0.05) * F.col("ed")
        ).alias("parts_ok"),
        ok("a50", "e49", "e51").alias("p50_ok"),
        ok("a95", "e94", "e96").alias("p95_ok"),
        ok("a99", "e98", "e100").alias("p99_ok"),
    )


@_q(
    "tpch_q3_shape",
    "TPC-H Q3 shape: selective join + grouped revenue + deterministic top-k",
    """
    WITH rev AS (
        SELECT l.l_orderkey, o.o_orderdate,
               CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,10)))
                    AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate
    )
    SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, revenue
    FROM rev ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def tpch_q3_shape(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .where(
            (F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
            ).cast("double").alias("revenue")
        )
    )
    return (
        rev.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .select("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "revenue")
        .limit(10)
    )


@_q(
    "quantiles_exact",
    "exact interpolated quantiles (Spark percentile == DuckDB "
    "quantile_cont, bit-identical on doubles) — the oracle-checked "
    "sibling of approx_stats' sketches",
    """
    SELECT l_returnflag,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS p25,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50) AS p50,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS p95,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantiles_exact(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.25)").alias("p25"),
        F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.50)").alias("p50"),
        F.expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.95)").alias("p95"),
        F.count("*").alias("n"),
    )


@_q(
    "cube_agg",
    "cube: all grouping-set combinations with grouping() markers",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("qty"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@_q(
    "skew_salted_agg",
    "scale: two-stage salted aggregation (hot grouping key scattered "
    "over salt reducers; bit-identical to the direct groupBy)",
    """
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_agg(spark, sf_dir):
    # l_returnflag has 3 values over 600k rows at sf0.1 — a genuinely
    # skewed reduce key; the salted plan must still match the plain
    # groupBy oracle exactly (decimal-exact sums, order-free min/max)
    from ..operators import scale

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "_qty_dec", F.col("l_quantity").cast("decimal(18,4)")
    )
    out = scale.salted_agg(
        li,
        "l_returnflag",
        {
            "n": "count(*)",
            "qty_dec": "sum(_qty_dec)",
            "first_ship": "min(l_shipdate)",
            "last_ship": "max(l_shipdate)",
        },
    )
    return out.select(
        "l_returnflag", "n", F.col("qty_dec").cast("double").alias("qty"),
        "first_ship", "last_ship",
    )


@_q(
    "string_agg_ordered",
    "ordered string aggregation (listagg/string_agg): deterministic via "
    "sort-before-join — collect_list alone is partition-order-dependent",
    """
    SELECT c_nationkey,
           string_agg(c_name, '|' ORDER BY c_name) AS names,
           count(*) AS n
    FROM customer WHERE c_custkey % 100 = 0
    GROUP BY c_nationkey
    """,
)
def string_agg_ordered(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") % 100 == 0)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("names"),
            F.count("*").alias("n"),
        )
    )


@_q(
    "intersect_key",
    "INTERSECT set op (completes the set-op family next to "
    "union_except's UNION/EXCEPT)",
    """
    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def intersect_key(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .intersect(
            o.where(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_custkey").alias("k"))
        )
    )


@_q(
    "window_tumbling",
    "event-time tumbling window (batch form of the streaming groupBy("
    "window(...)) aggregation; epoch-aligned 1h buckets == date_trunc)",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
           event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def window_tumbling(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "total"
        )
    )


@_q(
    "full_outer_join",
    "FULL OUTER join with unmatched rows on both sides (completes the "
    "join family: inner/left/semi/anti/asof are catalogued elsewhere)",
    """
    WITH c AS (SELECT c_nationkey AS k, count(*) AS n_cust
               FROM customer WHERE c_nationkey % 2 = 0 GROUP BY 1),
         s AS (SELECT s_nationkey AS k, count(*) AS n_supp
               FROM supplier WHERE s_nationkey % 3 = 0 GROUP BY 1)
    SELECT COALESCE(c.k, s.k) AS k, c.n_cust AS n_cust, s.n_supp AS n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
    """,
)
def full_outer_join(spark, sf_dir):
    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") % 2 == 0)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") % 3 == 0)
        .groupBy(F.col("s_nationkey").alias("ck"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.k == s.ck, "full_outer").select(
        F.coalesce(F.col("k"), F.col("ck")).alias("k"), "n_cust", "n_supp"
    )


@_q(
    "dq_checks",
    "data-quality expectations: a Deequ-style check suite (row count, "
    "null rate, key uniqueness, value range, referential integrity) — "
    "every per-table metric rides ONE global aggregate",
    """
    SELECT 'orders_nonempty' AS check,
           CAST((SELECT count(*) FROM orders) AS DOUBLE) AS value,
           (SELECT count(*) FROM orders) >= 1 AS passed
    UNION ALL
    SELECT 'o_custkey_nulls',
           CAST((SELECT count(*) FILTER (WHERE o_custkey IS NULL) FROM orders)
                AS DOUBLE),
           (SELECT count(*) FILTER (WHERE o_custkey IS NULL) FROM orders) = 0
    UNION ALL
    SELECT 'o_orderkey_dup',
           CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
                AS DOUBLE),
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) = 0
    UNION ALL
    SELECT 'o_totalprice_nonpositive',
           CAST((SELECT count(*) FILTER (WHERE o_totalprice <= 0) FROM orders)
                AS DOUBLE),
           (SELECT count(*) FILTER (WHERE o_totalprice <= 0) FROM orders) = 0
    UNION ALL
    SELECT 'orders_customer_orphans',
           CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
                 ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
                AS DOUBLE),
           (SELECT count(*) FROM orders o LEFT JOIN customer c
            ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) = 0
    """,
)
def dq_checks(spark, sf_dir):
    from ..operators import dq

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    per_table = dq.run_expectations(
        orders,
        [
            dq.Check("orders_nonempty", F.count("*"), ">=", 1.0),
            dq.Check(
                "o_custkey_nulls",
                F.sum(F.col("o_custkey").isNull().cast("long")),
                "==", 0.0,
            ),
            dq.Check(
                "o_orderkey_dup",
                F.count("*") - F.countDistinct("o_orderkey"),
                "==", 0.0,
            ),
            dq.Check(
                "o_totalprice_nonpositive",
                F.sum((F.col("o_totalprice") <= 0).cast("long")),
                "==", 0.0,
            ),
        ],
    )
    orphans = dq.run_expectations(
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        ),
        [
            dq.Check(
                "orders_customer_orphans",
                F.sum(F.col("c_custkey").isNull().cast("long")),
                "==", 0.0,
            )
        ],
    )
    return dq.union_all(per_table, orphans)


# ---------------------------------------------------------------------------
# Round 6 (cont.): skewed join, robust stats, anomaly scoring
# ---------------------------------------------------------------------------

@_q(
    "skew_salted_join",
    "scale: salted equi-join (hot probe key scattered over salt "
    "replicas of the build side; exact-identical to the plain join)",
    """
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority, o.o_custkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F' AND l.l_linenumber <= 2
    """,
)
def skew_salted_join(spark, sf_dir):
    # The salt scatters lineitem's repeated l_orderkey groups across
    # salt_buckets reducers while orders is replicated once per salt —
    # the standard rescue when one join key dominates a reducer. The
    # result must match the unsalted oracle join row-for-row.
    from ..operators import scale

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 2).select(
        F.col("l_orderkey"), F.col("l_linenumber")
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority", "o_custkey"
    )
    return scale.salted_join(li, o, "l_orderkey", salt_buckets=8)


@_q(
    "zscore_outliers",
    "stats: per-key z-score anomaly flags (one window pass — the "
    "statistical sibling of the rule-based fraud flags)",
    """
    WITH scored AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               count(*) OVER w AS n_in_group,
               (o_totalprice - avg(o_totalprice) OVER w)
                   / stddev_samp(o_totalprice) OVER w AS zscore
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey)
    )
    SELECT * FROM scored WHERE n_in_group >= 5 AND abs(zscore) > 2.0
    """,
)
def zscore_outliers(spark, sf_dir):
    from ..operators import stats

    return stats.zscore_outliers(
        _t(spark, sf_dir, "orders"),
        key_col="o_custkey", value_col="o_totalprice",
        id_col="o_orderkey", threshold=2.0, min_n=5,
    )


@_q(
    "group_median_mad",
    "stats: exact per-group median + MAD (robust location/scale for "
    "heavy-tailed value columns; F.median == quantile_cont(0.5))",
    """
    WITH med AS (
        SELECT o_orderpriority, median(o_totalprice) AS med
        FROM orders GROUP BY o_orderpriority
    ),
    mad AS (
        SELECT o.o_orderpriority,
               median(abs(o.o_totalprice - m.med)) AS mad
        FROM orders o JOIN med m USING (o_orderpriority)
        GROUP BY o.o_orderpriority
    )
    SELECT m.o_orderpriority, c.n, m.med, d.mad
    FROM med m
    JOIN mad d USING (o_orderpriority)
    JOIN (SELECT o_orderpriority, count(*) AS n FROM orders
          GROUP BY o_orderpriority) c USING (o_orderpriority)
    """,
)
def group_median_mad(spark, sf_dir):
    from ..operators import stats

    return stats.group_median_mad(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    )


@_q(
    "grouping_sets_agg",
    "GROUPING SETS: arbitrary non-hierarchical grouping combinations "
    "(the general form behind the rollup/cube entries)",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_linestatus), ())
    """,
)
def grouping_sets_agg(spark, sf_dir):
    """Three explicit sets — (flag, status), (status), () — NOT a
    rollup prefix chain, so only GROUPING SETS expresses it. One
    expand+aggregate pass (Spark's Expand node), same single-shuffle
    shape as rollup/cube."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
        "l_returnflag", "l_linestatus",
    ).agg(
        F.count("*").alias("n"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


@_q(
    "unpivot_melt",
    "UNPIVOT / melt: wide measure columns to long (metric, value) rows",
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def unpivot_melt(spark, sf_dir):
    """Spark's native unpivot (one Expand pass over the scan — the
    oracle's 4x UNION ALL rescans; the engine reads once). Zero
    shuffles: Expand is scan-local."""
    return _t(spark, sf_dir, "lineitem").unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric", "val",
    )


@_q(
    "events_funnel",
    "behavioral analytics: ordered window funnel (view->click->purchase)",
    """
    WITH s0 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t0
        FROM events
    ), s1 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t0
                            AND epoch_us(ts) - epoch_us(t0)
                                <= 604800000000::BIGINT
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t1
        FROM s0
    ), s2 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t1
                            AND epoch_us(ts) - epoch_us(t0)
                                <= 604800000000::BIGINT
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM s1
    ), lv AS (
        SELECT DISTINCT user_id,
               CASE WHEN t2 IS NOT NULL THEN 3
                    WHEN t1 IS NOT NULL THEN 2
                    WHEN t0 IS NOT NULL THEN 1
                    ELSE 0 END AS level
        FROM s2
    )
    SELECT level, count(*) AS n_users FROM lv GROUP BY level
    """,
)
def events_funnel(spark, sf_dir):
    """Greedy-earliest ordered funnel (ClickHouse windowFunnel shape):
    k chained window passes on ONE user-key exchange, no self-joins —
    an O(n^k)-worst-case k-way join re-expressed as O(n log n) sort +
    k linear passes (operators/analytics.py)."""
    from ..operators.analytics import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"),
        steps=("view", "click", "purchase"),
        window_us=7 * 24 * 3600 * 1_000_000,
    )


@_q(
    "events_retention",
    "behavioral analytics: weekly cohort retention triangle",
    """
    WITH x AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
                   AS cohort_date
        FROM events
    )
    SELECT cohort_date,
           CAST(date_diff('day', cohort_date, d) // 7 AS BIGINT)
               AS bucket_offset,
           count(DISTINCT user_id) AS n_users
    FROM x
    GROUP BY cohort_date, bucket_offset
    """,
)
def events_retention(spark, sf_dir):
    """Weekly retention triangle: cohort_date via min-over-user window
    on the same exchange the distinct-count needs — one shuffle total,
    never a firsts-table self-join (operators/analytics.py)."""
    from ..operators.analytics import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"), bucket_days=7)


@_q(
    "events_pathing",
    "behavioral analytics: next-event transition counts (Markov pathing "
    "— completes the funnel/retention family)",
    """
    WITH nxt AS (
        SELECT event_type AS src,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS dst
        FROM events
    )
    SELECT src, dst, count(*) AS n
    FROM nxt WHERE dst IS NOT NULL
    GROUP BY src, dst
    """,
)
def events_pathing(spark, sf_dir):
    """Transition matrix via ONE lead window on the user-key exchange
    (ts, event_id total order — no ties); last event per user has no
    successor and is dropped on both engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )


@_q(
    "window_hopping",
    "event-time HOPPING (sliding) window: 2h windows every 1h — each "
    "event lands in 2 overlapping buckets (the streaming "
    "window(ts, '2 hours', '1 hour') aggregation, batch form)",
    """
    WITH hops AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
               event_type, value FROM events
        UNION ALL
        SELECT CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP),
               event_type, value FROM events
    )
    SELECT win_start, event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM hops GROUP BY 1, 2
    """,
)
def window_hopping(spark, sf_dir):
    """Spark's native hopping window (ONE Expand pass over the scan —
    the oracle's 2x UNION ALL rescans; the engine reads once, then one
    partial-agg shuffle)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"),
                   "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("total"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n",
                "total")
    )


@_q(
    "tpch_q18_shape",
    "TPC-H Q18 shape: HAVING-filtered aggregate joined back to its "
    "parents (large-quantity orders) + deterministic top-k",
    """
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_sum
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 200
    )
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_totalprice, b.qty_sum
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def tpch_q18_shape(spark, sf_dir):
    """Scale shape: the lineitem aggregate is map-side-combinable and
    the HAVING filter shrinks it to a sliver BEFORE any join — at 100 TB
    the 'big orders' side broadcasts into orders/customer instead of
    shuffling the fact twice (AQE flips the join strategy from the
    runtime size). Decimal accumulation keeps the threshold exact on
    doubles (repo-wide float policy)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .where(F.col("q") > 200)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice", F.col("q").cast("double").alias("qty_sum"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@_q(
    "text_bigram_topk",
    "corpus-wide top-k bigram counts (the n-gram LM / tokenizer-prep "
    "statistic) via higher-order array functions, no Python UDFs",
    """
    WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
    b AS (
        SELECT unnest(list_transform(range(2, len(ws) + 1),
                                     i -> ws[i - 1] || ' ' || ws[i])) AS bigram
        FROM w
    )
    SELECT bigram, count(*) AS n
    FROM b GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
    """,
)
def text_bigram_topk(spark, sf_dir):
    """transform(sequence(...)) builds bigrams JVM-side from the split
    array (0-based Spark indexing vs the oracle's 1-based DuckDB
    lists); explode + count is one map-side-combinable exchange, and
    the deterministic (n DESC, bigram) tiebreak pins the top-k edge.
    At 100 TB the bigram space is heavy-tailed: partial aggregation
    absorbs the head mass before the shuffle."""
    docs = _t(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(sequence(1, size(ws) - 1), "
        "i -> concat(ws[i-1], ' ', ws[i]))"
    )
    return (
        docs.select(F.split("text", " ").alias("ws"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(50)
    )


@_q(
    "tpch_q5_shape",
    "TPC-H Q5 shape: six-table star join (region->nation fan-out, "
    "local-supplier co-nation constraint) + grouped revenue",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_shape(spark, sf_dir):
    """Scale shape: the deepest join tree in the catalog. The small
    dimensions (region 5 / nation 25 / supplier ~100 rows) broadcast
    as one pre-joined sliver, and the region filter prunes them
    BEFORE they reach the fact side; customer is O(SF) — too big to
    broadcast at 100 TB — so it exchanges on custkey like orders does
    (AQE flips it to broadcast at small SF where it fits). That
    leaves exactly the canonical Q5 exchanges: orders<->customer on
    custkey, orders<->lineitem on orderkey, and the 25-group
    aggregate; the o_orderdate range is pushed to the orders scan,
    and the co-nation constraint (c_nationkey = s_nationkey) rides
    the supplier broadcast as a second key — no extra shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(dims),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(28,10)")
            ).cast("double").alias("revenue")
        )
    )


@_q(
    "window_session_native",
    "session windows via Spark's NATIVE session_window operator (the "
    "streaming-ready formulation) — the oracle derives the same "
    "sessions independently from lag/cumsum gap islands",
    """
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000::BIGINT
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sess AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM gaps
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_no
    """,
)
def window_session_native(spark, sf_dir):
    """session_window(ts, gap) is the operator Structured Streaming
    uses for stateful sessionization (merging-session state store);
    in batch it is ONE exchange on the grouping key followed by a
    local sort-merge of overlapping session intervals — no lag /
    cumulative window pair, no second WindowExec pass. Tie semantics
    pinned by unit test (tests/test_analytics_ops.py): Spark MERGES a
    gap of EXACTLY the 30-min duration (sessions extend while
    next.ts <= prev.ts + gap), so the oracle's new-session flag is
    STRICTLY greater. Columns match the lag-islands oracle:
    start = min(ts), end = max(ts) + gap."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@_q(
    "approx_distinct_bounds",
    "HLL++ approx_count_distinct clamped against the exact distinct "
    "count (the sketch is non-deterministic only across Spark "
    "versions, not runs; the CLAMP is the oracle-stable value)",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY event_type
    """,
)
def approx_distinct_bounds(spark, sf_dir):
    """The 100 TB distinct-count path: HLL++ partial sketches merge
    map-side (one exchange, constant state per group) where exact
    COUNT(DISTINCT) needs a per-key dedup exchange first. The entry
    computes BOTH, emits the exact value plus a boolean that the
    sketch landed within 5x its published 5% relative-error target —
    the boolean (not the sketch) is what the oracle pins, so the
    check is exact while the estimator stays approximate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.05).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= F.lit(0.25) * F.col("exact_users")
            ).alias("approx_ok"),
        )
    )


@_q(
    "tpch_q17_shape",
    "TPC-H Q17 shape: correlated per-group average (small-quantity "
    "orders below 20% of the part's mean) via aggregate-then-join-back, "
    "threshold compared in exact decimal arithmetic",
    """
    WITH sel AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4' AND p.p_type = 'ECONOMY'
    ), st AS (
        SELECT l_partkey,
               sum(CAST(l_quantity AS DECIMAL(18,4))) AS qs,
               count(*) AS qn
        FROM sel GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(s.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               / 7.0 AS avg_yearly,
           count(*) AS n_rows
    FROM sel s JOIN st ON s.l_partkey = st.l_partkey
    WHERE CAST(s.l_quantity AS DECIMAL(18,4)) * 5 * st.qn < st.qs
    """,
)
def tpch_q17_shape(spark, sf_dir):
    """The correlated-scalar-subquery shape, decorrelated the way a
    100 TB plan wants it: filter lineitem ONCE by the broadcast part
    sliver (every row of a selected part survives, so the per-part
    mean is unchanged by the pushdown), aggregate that sliver by
    partkey — map-side combinable, output O(selected parts), itself
    broadcastable — and join the stats back for the threshold filter.
    The naive form re-scans lineitem per outer row. The comparison
    qty < 0.2 * avg is algebraically lifted to qty * 5 * n < sum in
    DECIMAL, so no float-division boundary can flip a row between
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#4") & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    sel = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    st = sel.groupBy("l_partkey").agg(
        F.sum(qty).alias("qs"), F.count("*").alias("qn"))
    return (
        sel.join(F.broadcast(st), "l_partkey")
        .where(qty * F.lit(5) * F.col("qn") < F.col("qs"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
             .cast("double") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


@_q(
    "tpch_q21_shape",
    "TPC-H Q21 shape: EXISTS + NOT EXISTS correlated semi/anti chain "
    "over a self-joined fact — suppliers who kept others waiting, "
    "re-keyed to the testdata columns (late = returnflag 'R')",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE l1.l_returnflag = 'R'
      AND o.o_orderstatus = 'F'
      AND n.n_name LIKE 'NATION_1%'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def tpch_q21_shape(spark, sf_dir):
    """The deepest TPC-H operator shape: a fact self-joined THREE ways
    (base + EXISTS + NOT EXISTS), decorrelated Spark-first as left_semi
    + left_anti on the PRE-AGGREGATED (order, supplier) fact — the
    row-level EXISTS is equivalent at pair granularity, and the
    pre-aggregation shrinks the self-join sides from |lineitem| to
    |distinct pairs| before any join. All three fact sides exchange on
    the same l_orderkey key; supplier and nation broadcast; no
    cartesian anywhere (plan-guarded in tests/test_plans.py). The
    reference's engine (Postgres) would run this as nested correlated
    subqueries — the Spark shape is two hash joins over one shuffle
    key. Reference parity: semi/anti join semantics per SURVEY §2
    J3/J8 (reference scd2/lookup NOT EXISTS at loading_*.py)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    fact = (
        li.select("l_orderkey", "l_suppkey",
                  (F.col("l_returnflag") == "R").alias("late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    )
    other = fact.select(F.col("l_orderkey").alias("ok2"),
                        F.col("l_suppkey").alias("sk2"))
    other_late = fact.where("late").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    waiting = (
        fact.where("late")
        .join(other, (F.col("l_orderkey") == F.col("ok2"))
              & (F.col("l_suppkey") != F.col("sk2")), "left_semi")
        .join(other_late, (F.col("l_orderkey") == F.col("ok3"))
              & (F.col("l_suppkey") != F.col("sk3")), "left_anti")
        .select("l_orderkey", "l_suppkey")
    )
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(waiting, ["l_orderkey", "l_suppkey"], "left_semi")
        .join(o.where(F.col("o_orderstatus") == "F")
              .select(F.col("o_orderkey").alias("l_orderkey")),
              "l_orderkey", "left_semi")
    )
    sn = (
        s.join(F.broadcast(n.where(F.col("n_name").like("NATION_1%"))),
               s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        l1.join(F.broadcast(sn), l1.l_suppkey == sn.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@_q(
    "tpch_q7_shape",
    "TPC-H Q7 shape: volume shipping between two nations — the same "
    "dimension (nation) joined twice in different ROLES (supplier "
    "side vs customer side), a symmetric OR pair filter, and a "
    "year-bucketed grouped revenue",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(volume AS DECIMAL(28,10))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_shape(spark, sf_dir):
    """Scale shape: nation appears TWICE — as the supplier's nation and
    the customer's nation — so both roles ride broadcasts (25 rows
    each) and the symmetric pair predicate is applied AFTER both are
    attached, exactly once, on the joined frame (pushing each side's
    half-filter independently would wrongly keep NATION_1/NATION_1
    pairs). supplier is small enough to broadcast with its nation
    pre-attached; the only exchanges are the canonical ones —
    lineitem<->orders on orderkey, orders<->customer on custkey, and
    the final tiny group-by. The l_shipdate band is pushed to the
    lineitem scan. Decimal-exact revenue accumulation keeps the sum
    bit-stable across partition counts and engines (oracle-exact).
    Reference parity: multi-role dimension joins per SURVEY §2 J1/J2
    (the reference joins DWH_DIM_TERMINALS_HIST twice — th1/th2 — in
    rule 3, loading_rep_fraud.py:80-82)."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    pair = F.col("supp_nation").isin("NATION_1", "NATION_2") & \
        F.col("cust_nation").isin("NATION_1", "NATION_2") & \
        (F.col("supp_nation") != F.col("cust_nation"))
    sn = (
        s.join(F.broadcast(
            n.select(F.col("n_nationkey").alias("s_nk"),
                     F.col("n_name").alias("supp_nation"))
             .where(F.col("supp_nation").isin("NATION_1", "NATION_2"))),
            s.s_nationkey == F.col("s_nk"))
        .select("s_suppkey", "supp_nation")
    )
    cn = (
        c.join(F.broadcast(
            n.select(F.col("n_nationkey").alias("c_nk"),
                     F.col("n_name").alias("cust_nation"))
             .where(F.col("cust_nation").isin("NATION_1", "NATION_2"))),
            c.c_nationkey == F.col("c_nk"))
        .select("c_custkey", "cust_nation")
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cn, F.col("o_custkey") == F.col("c_custkey"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(28,10)")
            ).cast("double").alias("revenue")
        )
    )


@_q(
    "tpch_q9_shape",
    "TPC-H Q9 shape: product-line profit by nation and year — a "
    "LIKE-filtered part dimension fans the fact down, supplier "
    "attaches the nation, orders attaches the year (re-keyed to the "
    "testdata columns: no partsupp table, profit = revenue)",
    """
    SELECT nation, o_year,
           CAST(sum(CAST(amount AS DECIMAL(28,10))) AS DOUBLE)
               AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9_shape(spark, sf_dir):
    """Scale shape: the part dimension is filtered by an un-pushable
    LIKE '%...%' BEFORE it broadcasts (a contains-filter never prunes
    at the scan, but shrinking the broadcast side is the next best
    thing — the fact rows it cannot match die at the join, not at the
    aggregate); supplier+nation pre-join into a second broadcast
    sliver. The only exchange left is lineitem<->orders on orderkey
    plus the ~nations x years group-by. At 100 TB part is O(SF) — AQE
    keeps the broadcast while it fits and falls back to a shuffle
    join beyond, with the same filtered cardinality win. Decimal-
    exact profit accumulation (oracle-exact). Reference parity: star
    fan-out + grouped metric per SURVEY §2 J1/A-family
    (loading_rep_fraud.py:25-28's cards->accounts->clients dim chain)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    pw = p.where(F.col("p_name").like("%widget%")).select("p_partkey")
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(pw), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "nation",
            F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(28,10)")
            ).cast("double").alias("sum_profit")
        )
    )


@_q(
    "tpch_q2_shape",
    "TPC-H Q2 shape: minimum-cost supplier per part in a region — the "
    "correlated-MIN subquery decorrelated into a per-key aggregate + "
    "equality join back (re-keyed to the testdata: lineitem is the "
    "part<->supplier relation; no partsupp table)",
    """
    SELECT DISTINCT p.p_partkey, s.s_suppkey, s.s_name,
           CAST(l.l_extendedprice AS DOUBLE) AS price
    FROM part p, lineitem l, supplier s, nation n, region r
    WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA' AND p.p_type = 'PROMO' AND p.p_size < 15
      AND l.l_extendedprice = (
          SELECT min(l2.l_extendedprice)
          FROM lineitem l2, supplier s2, nation n2, region r2
          WHERE l2.l_partkey = p.p_partkey
            AND s2.s_suppkey = l2.l_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'ASIA')
    """,
)
def tpch_q2_shape(spark, sf_dir):
    """Scale shape: the correlated MIN decorrelates into ONE window
    minimum over the partkey — the fact slice is scanned ONCE and
    exchanged ONCE (the decorrelated aggregate+join-back form would
    scan it twice; the window shares the scan with the filter).
    Region->nation->supplier folds to a broadcast sliver (the region
    filter cuts it first), the PROMO/size part filter broadcasts
    likewise, and the fact is reduced by BOTH broadcasts BEFORE the
    one partkey exchange. MIN equality is arithmetic-free (an element
    of the set, not a sum), so the double compare is bit-exact
    against the oracle. Reference parity: correlated-lookup
    decorrelation per SURVEY §2 A3/J1 (the reference's date_global
    scalar feeds every rule the same way, main.py:53)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    asia_nk = (n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
                      n.n_regionkey == r.r_regionkey)
                .select("n_nationkey"))
    s_asia = (s.join(F.broadcast(asia_nk),
                     s.s_nationkey == F.col("n_nationkey"))
               .select("s_suppkey", "s_name"))
    p_sel = p.where((F.col("p_type") == "PROMO")
                    & (F.col("p_size") < 15)).select("p_partkey")
    lp = (li.join(F.broadcast(p_sel),
                  li.l_partkey == F.col("p_partkey"))
            .join(F.broadcast(s_asia),
                  li.l_suppkey == F.col("s_suppkey"))
            .select("p_partkey", "s_suppkey", "s_name",
                    F.col("l_extendedprice").alias("price")))
    w = Window.partitionBy("p_partkey")
    return (lp.withColumn("__mn", F.min("price").over(w))
              .where(F.col("price") == F.col("__mn"))
              .select("p_partkey", "s_suppkey", "s_name", "price")
              .distinct())


@_q(
    "tpch_q16_shape",
    "TPC-H Q16 shape: supplier-count-per-part-class with a NOT-IN "
    "exclusion subquery — negated dimension filters + distinct-count "
    "after an anti-join",
    """
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_size
    """,
)
def tpch_q16_shape(spark, sf_dir):
    """Scale shape: NOT IN over a non-nullable key is a broadcast
    LEFT ANTI join (the handful of negative-balance suppliers ships to
    every executor; no shuffle added), the negated part filters shrink
    the part broadcast BEFORE the fact join, and the only exchange is
    the (brand, size) distinct-count aggregate — which Spark executes
    as expand+two-phase partial aggregation, never a global distinct.
    Reference parity: NOT-IN/anti-join dedup per SURVEY §2 J3/J4
    (loading_rep_fraud.py:86's NOT EXISTS mart-dedup guard)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    bad = s.where(F.col("s_acctbal") < 0.0).select("s_suppkey")
    p_sel = p.where((F.col("p_brand") != "Brand#1")
                    & (F.col("p_type") != "PROMO")) \
             .select("p_partkey", "p_brand", "p_size")
    return (li.join(F.broadcast(bad),
                    li.l_suppkey == F.col("s_suppkey"), "left_anti")
              .join(F.broadcast(p_sel),
                    li.l_partkey == F.col("p_partkey"))
              .groupBy("p_brand", "p_size")
              .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@_q(
    "tpch_q22_shape",
    "TPC-H Q22 shape: dormant high-balance customers — a scalar "
    "AVG subquery threshold + NOT EXISTS anti-join + grouped "
    "decimal-exact totals (threshold compared multiplicatively so "
    "the float average never decides a boundary row differently "
    "across engines)",
    """
    SELECT c.c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
               AS totacctbal
    FROM customer c
    WHERE CAST(c.c_acctbal AS DECIMAL(28,10))
          * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
        > (SELECT sum(CAST(c_acctbal AS DECIMAL(28,10)))
           FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_shape(spark, sf_dir):
    """Scale shape: the scalar 'above average' threshold is ONE
    1-row broadcast (count + exact-decimal sum over the positive
    balances) cross-joined in — and the comparison is the
    DENOMINATOR-FREE form ``bal * n > sum`` in exact decimals, because
    an average of doubles differs in the last ulp across engines and a
    boundary customer would flip the row set (the float-aggregation
    trap SURVEY §4 pins for every oracle). The no-orders predicate is
    a left-anti join against the URGENT orders' custkeys (the one
    real exchange beside the tiny nationkey aggregate; re-keyed to the
    testdata, where every customer ordered at least once — dormancy is
    'no urgent order'). Reference
    parity: scalar-threshold + NOT EXISTS per SURVEY §2 A3/J4 (rule
    4's amount comparisons + mart dedup,
    loading_rep_fraud.py:120-127)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pos = c.where(F.col("c_acctbal") > 0.0)
    thr = pos.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("c_acctbal").cast("decimal(28,10)")).alias("__s"))
    return (c.crossJoin(F.broadcast(thr))
             .where(F.col("c_acctbal").cast("decimal(28,10)")
                    * F.col("__n") > F.col("__s"))
             .join(o.where(F.col("o_orderpriority") == "1-URGENT")
                    .select("o_custkey"),
                   c.c_custkey == F.col("o_custkey"), "left_anti")
             .groupBy("c_nationkey")
             .agg(F.count(F.lit(1)).alias("numcust"),
                  F.sum(F.col("c_acctbal").cast("decimal(28,10)"))
                   .cast("double").alias("totacctbal")))


@_q(
    "tpch_q4_shape",
    "TPC-H Q4 shape: order-priority checking — EXISTS correlated "
    "subquery as a semi-join with a non-equi conjunct (late-shipping "
    "lineitem), counts per priority",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_shape(spark, sf_dir):
    """Scale shape: the EXISTS is ONE left-semi join keyed on the
    equality conjunct (orderkey) with the non-equi ship-after-order
    term riding as a residual join condition — never a per-row
    subquery and never a cartesian. The quarter filter pushes to the
    orders scan before the join, the lineitem side prunes to two
    columns, and the priority count is a tiny two-phase aggregate.
    Reference parity: NOT-EXISTS/EXISTS dedup joins per SURVEY §2 J4
    (loading_rep_fraud.py:86) with rule 3's time-banded non-equi
    conjunct shape (loading_rep_fraud.py:100-110)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o_sel = o.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp")))
    return (o_sel.join(
                li.select("l_orderkey", "l_shipdate"),
                (o_sel.o_orderkey == F.col("l_orderkey"))
                & (F.col("l_shipdate") > o_sel.o_orderdate),
                "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


@_q(
    "tpch_q11_shape",
    "TPC-H Q11 shape: important-stock identification — per-key value "
    "HAVING above a fraction of the GLOBAL total (scalar subquery "
    "threshold), denominator- and fraction-free exact-decimal compare",
    """
    WITH v AS (
        SELECT l.l_partkey,
               sum(CAST(l.l_extendedprice AS DECIMAL(28,10))) AS val
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey = 1
        GROUP BY l.l_partkey)
    SELECT l_partkey, CAST(val AS DOUBLE) AS value
    FROM v
    WHERE val * 10000 > (SELECT sum(val) FROM v)
    """,
)
def tpch_q11_shape(spark, sf_dir):
    """Scale shape: ONE partkey aggregate over the nation-filtered
    fact (the supplier filter broadcasts), then the global total is a
    1-row broadcast over the ALREADY-AGGREGATED frame — O(distinct
    partkeys), not a second fact scan. The HAVING compares
    ``val * 10000 > total`` in exact decimals (integer multiplier):
    the textbook ``val > total * 0.0001`` form decides boundary keys
    by float/decimal-scale luck and differs across engines — the same
    denominator-free discipline as tpch_q22_shape. Reference parity:
    scalar-threshold filters per SURVEY §2 A3 (rule 4's amount
    comparisons, loading_rep_fraud.py:120-127)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    v = (li.join(F.broadcast(
                s.where(F.col("s_nationkey") == 1).select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
           .groupBy("l_partkey")
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(28,10)"))
                 .alias("val")))
    tot = v.agg(F.sum("val").alias("__tot"))
    return (v.crossJoin(F.broadcast(tot))
             .where(F.col("val") * 10000 > F.col("__tot"))
             .select("l_partkey", F.col("val").cast("double")
                     .alias("value")))


@_q(
    "tpch_q14_shape",
    "TPC-H Q14 shape: promotion-effect ratio — conditional aggregate "
    "numerator over an unconditional denominator, one fact pass, "
    "exact-decimal sums divided only at the very end",
    """
    SELECT CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(l.l_extendedprice AS DECIMAL(28,10))
                              ELSE CAST(0 AS DECIMAL(28,10)) END)
                     AS DOUBLE) * 100.0
                / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(28,10)))
                       AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def tpch_q14_shape(spark, sf_dir):
    """Scale shape: one month-pruned fact scan (the ship-date filter
    reaches the parquet scan), the part type broadcasts, and BOTH
    sums ride one aggregate (conditional numerator via CASE — no
    second scan, no self-join). Division happens exactly once, at the
    very end, on two exact-decimal totals cast to double in the same
    order on both engines (double ops are IEEE-deterministic given
    identical operands; only ACCUMULATING in float drifts — SURVEY §4
    float-aggregation trap). Reference parity: conditional aggregation
    per SURVEY §2 A2/S9 (the audit row's tagged counts, main.py:78)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    dec = F.col("l_extendedprice").cast("decimal(28,10)")
    zero = F.lit(0).cast("decimal(28,10)")
    month = li.where(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp")))
    return (month.join(F.broadcast(p.select("p_partkey", "p_type")),
                       month.l_partkey == F.col("p_partkey"))
            .agg(F.sum(F.when(F.col("p_type") == "PROMO", dec)
                        .otherwise(zero)).alias("__num"),
                 F.sum(dec).alias("__den"))
            .select((F.col("__num").cast("double") * 100.0
                     / F.col("__den").cast("double"))
                    .cast("double").alias("promo_revenue")))


@_q(
    "tpch_q15_shape",
    "TPC-H Q15 shape: top supplier(s) by period revenue — the view + "
    "scalar MAX equality (ties kept), revenue summed in exact "
    "decimals so the max-equality is bit-exact",
    """
    WITH revenue AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1995-04-01'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def tpch_q15_shape(spark, sf_dir):
    """Scale shape: the revenue view is ONE quarter-pruned suppkey
    aggregate; the scalar MAX is a second aggregate over that
    ALREADY-REDUCED frame (O(suppliers) rows) broadcast back as a
    1-row cross join — never a global sort, never a window over one
    partition (which would serialize the whole frame through a single
    task), and ties survive exactly as SQL's equality does. Equality
    is safe because revenue accumulates in exact decimals (the float
    trap SURVEY §4 pins). The supplier name attaches by broadcast
    AFTER the reduction. Reference parity: first-row-scalar feeding a
    filter per SURVEY §2 A3 (date_global, incr_loading.py:41)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (li.where(
               (F.col("l_shipdate")
                >= F.lit("1995-01-01").cast("timestamp"))
               & (F.col("l_shipdate")
                  < F.lit("1995-04-01").cast("timestamp")))
             .groupBy("l_suppkey")
             .agg(F.sum(F.col("l_extendedprice").cast("decimal(28,10)"))
                   .alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    return (rev.crossJoin(F.broadcast(mx))
               .where(F.col("total_rev") == F.col("__mx"))
               .join(F.broadcast(s.select("s_suppkey", "s_name")),
                     F.col("l_suppkey") == F.col("s_suppkey"))
               .select("s_suppkey", "s_name",
                       F.col("total_rev").cast("double")
                        .alias("total_rev")))


@_q(
    "tpch_q8_shape",
    "TPC-H Q8 shape: national market share — a conditional-numerator "
    "ratio per year over one region-and-type-filtered fact pass, "
    "division of exact-decimal totals only at the very end",
    """
    SELECT o_year,
           CAST(CAST(sum(CASE WHEN n2.n_name = 'CHINA' THEN amount
                              ELSE CAST(0 AS DECIMAL(28,10)) END)
                     AS DOUBLE)
                / CAST(sum(amount) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(28,10)) AS amount,
               s.s_nationkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) x JOIN nation n2 ON n2.n_nationkey = x.s_nationkey
    GROUP BY o_year
    """,
)
def tpch_q8_shape(spark, sf_dir):
    """Scale shape: every dimension folds to a broadcast sliver
    (region->nation->customer-nationkey set, PROMO part keys, supplier
    nation names) so the fact is reduced BEFORE its one orderkey join
    with orders; numerator and denominator ride ONE aggregate
    (CASE — no second scan) and the only division happens on two
    exact-decimal totals cast to double at the very end (q14's
    discipline). Reference parity: conditional aggregation per SURVEY
    §2 A2/S9 (main.py:78's tagged audit counts)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    asia_nk = (n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
                      n.n_regionkey == r.r_regionkey)
                .select("n_nationkey"))
    cust = (c.join(F.broadcast(asia_nk),
                   c.c_nationkey == F.col("n_nationkey"))
             .select("c_custkey"))
    p_sel = p.where(F.col("p_type") == "PROMO").select("p_partkey")
    sup = (s.join(F.broadcast(n.select("n_nationkey", "n_name")),
                  s.s_nationkey == F.col("n_nationkey"))
            .select("s_suppkey", "n_name"))
    amount = F.col("l_extendedprice").cast("decimal(28,10)")
    zero = F.lit(0).cast("decimal(28,10)")
    fact = (li.join(F.broadcast(p_sel), li.l_partkey == F.col("p_partkey"))
              .join(F.broadcast(sup), li.l_suppkey == F.col("s_suppkey"))
              .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                    li.l_orderkey == F.col("o_orderkey"))
              .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
              .select(F.year("o_orderdate").cast("int").alias("o_year"),
                      amount.alias("amount"), F.col("n_name")))
    return (fact.groupBy("o_year")
                .agg(F.sum(F.when(F.col("n_name") == "CHINA",
                                  F.col("amount")).otherwise(zero))
                      .alias("__num"),
                     F.sum("amount").alias("__den"))
                .select("o_year",
                        (F.col("__num").cast("double")
                         / F.col("__den").cast("double"))
                        .cast("double").alias("mkt_share")))


@_q(
    "tpch_q10_shape",
    "TPC-H Q10 shape: returned-item revenue by customer — quarter + "
    "returnflag filters on the fact, customer/nation attach after the "
    "custkey aggregate",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(28,10))) AS DOUBLE)
               AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1995-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
)
def tpch_q10_shape(spark, sf_dir):
    """Scale shape: both fact filters (quarter on orders, 'R' on
    lineitem) push to their scans BEFORE the orderkey join; the
    aggregate keys on custkey ALONE (one exchange over the filtered
    fact) and the wide customer/nation attributes broadcast on AFTER
    the reduction — grouping by the full wide key would haul c_name
    through the shuffle for nothing. Reference parity: join-chain +
    group per SURVEY §2 J1/A1 (rule joins, loading_rep_fraud.py:60)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o_sel = o.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    rev = (li.where(F.col("l_returnflag") == "R")
             .select("l_orderkey",
                     F.col("l_extendedprice").cast("decimal(28,10)")
                      .alias("amount"))
             .join(o_sel, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_custkey")
             .agg(F.sum("amount").alias("__rev")))
    cn = (c.join(F.broadcast(n.select("n_nationkey", "n_name")),
                 c.c_nationkey == F.col("n_nationkey"))
           .select("c_custkey", "c_name", "n_name"))
    return (rev.join(F.broadcast(cn),
                     rev.o_custkey == F.col("c_custkey"))
               .select("c_custkey", "c_name", "n_name",
                       F.col("__rev").cast("double").alias("revenue")))


@_q(
    "tpch_q12_shape",
    "TPC-H Q12 shape: priority buckets per class — conditional counts "
    "(CASE inside SUM) after a banded fact filter and an orderkey join",
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                              ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_shape(spark, sf_dir):
    """Scale shape: the year band pushes to the lineitem scan, orders
    prunes to two columns, both partial-aggregate maps combine before
    the single tiny exchange (3 groups), and the two buckets are ONE
    pass of conditional sums — never two filtered scans. Reference
    parity: conditional tagged counts per SURVEY §2 A2/S9
    (main.py:78)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    band = li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    return (band.join(o.select("o_orderkey", "o_orderpriority"),
                      band.l_orderkey == F.col("o_orderkey"))
                .groupBy("l_returnflag")
                .agg(F.sum(F.when(hi, 1).otherwise(0))
                      .alias("high_line_count"),
                     F.sum(F.when(~hi, 1).otherwise(0))
                      .alias("low_line_count")))


@_q(
    "tpch_q13_shape",
    "TPC-H Q13 shape: customer order-count distribution — LEFT join "
    "preserving zero-order customers, then an aggregate OF an "
    "aggregate (count per customer, customers per count)",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                           AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) d
    GROUP BY c_count
    """,
)
def tpch_q13_shape(spark, sf_dir):
    """Scale shape: the classic double aggregate. The join-side filter
    rides the JOIN CONDITION (not a WHERE, which would turn the left
    join inner and silently drop zero-order customers); the first
    aggregate keys on custkey (the one real exchange), the second is a
    tiny distribution over distinct counts. count(o_orderkey) counts
    non-null MATCHES, so customers with no surviving order land in the
    c_count=0 bucket exactly as SQL does. Reference parity: left join
    + count per SURVEY §2 J2 (loading_rep_fraud.py:66's left-join
    terminal check)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    o_sel = o.where(F.col("o_orderpriority") != "1-URGENT") \
             .select("o_orderkey", "o_custkey")
    per_cust = (c.select("c_custkey")
                 .join(o_sel, c.c_custkey == o_sel.o_custkey, "left")
                 .groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
                    .agg(F.count(F.lit(1)).alias("custdist")))


@_q(
    "tpch_q19_shape",
    "TPC-H Q19 shape: disjunctive bracket predicates — an OR of "
    "conjunctive (brand, size-band, quantity-band) brackets evaluated "
    "in one fact pass over one broadcast dim join",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(28,10)))
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25
           AND l.l_quantity BETWEEN 5 AND 35)
    """,
)
def tpch_q19_shape(spark, sf_dir):
    """Scale shape: the OR-of-brackets stays ONE residual predicate on
    one broadcast hash join — never a UNION of per-bracket scans
    (which would read the fact twice), and the part side pre-filters
    to the union of the brackets' dimension terms before broadcasting.
    The fact-only term union (quantity 1..35) is still pushable to the
    scan. Reference parity: compound AND/OR predicates per SURVEY §2
    F8 (rule 1's composite predicate, loading_rep_fraud.py:33-40)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    p_sel = p.where(
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#2")
           & F.col("p_size").between(5, 25))
    ).select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#1")
         & F.col("p_size").between(1, 10) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2")
           & F.col("p_size").between(5, 25) & q.between(5, 35)))
    return (li.where(q.between(1, 35))
              .join(F.broadcast(p_sel), li.l_partkey == F.col("p_partkey"))
              .where(bracket)
              .agg(F.sum(F.col("l_extendedprice").cast("decimal(28,10)"))
                    .cast("double").alias("revenue"),
                   F.count(F.lit(1)).alias("n_lines")))


@_q(
    "tpch_q20_shape",
    "TPC-H Q20 shape: excess-share suppliers — per-supplier period "
    "quantity vs half their all-time quantity, BOTH sums in one "
    "conditional-aggregate fact pass, doubled-integer compare "
    "(no 0.5 multiplier)",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s JOIN (
        SELECT l.l_suppkey,
               sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1995-01-01'
                         AND l.l_shipdate < TIMESTAMP '1996-01-01'
                        THEN CAST(l.l_quantity AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS q_period,
               sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS q_total
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
        GROUP BY l.l_suppkey
    ) x ON x.l_suppkey = s.s_suppkey
    WHERE x.q_period * 2 > x.q_total
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def tpch_q20_shape(spark, sf_dir):
    """Scale shape: the original's correlated half-sum subquery
    decorrelates into ONE conditional aggregate (period sum and total
    sum in the same groupBy — a second fact scan would double the
    dominant cost), the half threshold compares as ``2 * period >
    total`` in exact decimals (multiplying by 0.5 would leave the
    boundary supplier to decimal-scale luck), and supplier names
    broadcast onto the already-reduced per-supplier frame. Reference
    parity: scalar-threshold comparisons per SURVEY §2 A3 (rule 4's
    amount thresholds, loading_rep_fraud.py:120-127)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    qty = F.col("l_quantity").cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    in_period = (
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")))
    promo = p.where(F.col("p_type") == "PROMO").select("p_partkey")
    per_sup = (li.join(F.broadcast(promo),
                       li.l_partkey == F.col("p_partkey"))
                 .groupBy("l_suppkey")
                 .agg(F.sum(F.when(in_period, qty).otherwise(zero))
                       .alias("q_period"),
                      F.sum(qty).alias("q_total"))
                 .where(F.col("q_period") * 2 > F.col("q_total")))
    return (per_sup.join(F.broadcast(s.select("s_suppkey", "s_name")),
                         per_sup.l_suppkey == F.col("s_suppkey"))
                   .select("s_suppkey", "s_name").distinct())


@_q(
    "tpch_q1_shape",
    "TPC-H Q1 shape: the pricing-summary report — one fact pass, six "
    "aggregates per (returnflag, linestatus), exact-decimal "
    "accumulation of per-row double products, averages divided once "
    "at the end",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10)))
                     AS DECIMAL(28,6)) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10)))
                     AS DECIMAL(28,6)) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(28,10)))
                     AS DECIMAL(28,6)) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              * (1 + l_tax) AS DECIMAL(28,10)))
                     AS DECIMAL(28,6)) AS DOUBLE) AS sum_charge,
           CAST(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10)))
                          AS DECIMAL(28,6)) AS DOUBLE)
                / count(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(CAST(sum(CAST(l_discount AS DECIMAL(28,10)))
                          AS DECIMAL(28,6)) AS DOUBLE)
                / count(*) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_shape(spark, sf_dir):
    """Scale shape: ONE partial-aggregated fact pass (map-side combine
    on the 6-ish (flag, status) groups — the shuffle moves a handful
    of rows per partition, not data), the ship-date filter pushed to
    the scan. Per-row products stay DOUBLE (IEEE-identical across
    engines given identical operands), accumulation is exact DECIMAL,
    and the averages divide two exact totals once at the end — the
    SURVEY §4 float-aggregation discipline that keeps the DuckDB
    oracle bit-exact. Averages are sum/count rather than engine AVG
    (whose internal accumulation order differs). Reference parity:
    the A2 tagged-count aggregate family (main.py:78) at TPC-H shape."""
    li = _t(spark, sf_dir, "lineitem")

    def dec(c):
        return c.cast("decimal(28,10)")

    def out(c):
        # re-quantize the EXACT sum to scale 6 (lossless: every per-row
        # product has <= 6 decimals) before the double cast — a scale-6
        # total's scaled integer fits 53 bits at this magnitude, so
        # decimal->double is ONE correctly-rounded conversion in both
        # engines; at scale 10 the conversion path differs by 1 ulp
        # (DuckDB scales in floating point, Spark rounds the exact
        # BigDecimal). Envelope: group totals stay < ~9e9 (53 bits at
        # scale 6) through sf1; beyond that, quantize to scale 2
        # (rounds exact cents identically — both engines round half
        # away from zero on positives)
        return c.cast("decimal(28,6)").cast("double")

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # spread the filtered+projected rows before the six exact-decimal
    # partial sums: the one-row-group testdata scan would otherwise run
    # the whole BigDecimal accumulation as a single task (identity at
    # real scale — see _spread in testdata_queries)
    filtered = _spread(
        spark,
        li.where(F.col("l_shipdate")
                 <= F.lit("1998-09-02").cast("timestamp"))
        .select("l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus"),
    )
    return (filtered
            .groupBy("l_returnflag", "l_linestatus")
            .agg(out(F.sum(dec(F.col("l_quantity")))).alias("sum_qty"),
                 out(F.sum(dec(F.col("l_extendedprice"))))
                  .alias("sum_base_price"),
                 out(F.sum(dec(disc_price))).alias("sum_disc_price"),
                 out(F.sum(dec(charge))).alias("sum_charge"),
                 (out(F.sum(dec(F.col("l_quantity"))))
                  / F.count(F.lit(1))).cast("double").alias("avg_qty"),
                 (out(F.sum(dec(F.col("l_discount"))))
                  / F.count(F.lit(1))).cast("double").alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order")))


@_q(
    "tpch_q6_shape",
    "TPC-H Q6 shape: the forecasting-revenue scan — a pure "
    "filter+aggregate with every predicate pushed to the scan, no "
    "join, no shuffle beyond the final 1-row combine",
    """
    SELECT CAST(CAST(sum(CAST(l_extendedprice * l_discount
                              AS DECIMAL(28,10)))
                     AS DECIMAL(28,6)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_shape(spark, sf_dir):
    """Scale shape: the canonical pushdown probe — all three
    predicates reach the parquet scan (PushedFilters), the projection
    reads exactly three columns (ReadSchema), and the aggregate is a
    map-side partial with a 1-row final combine: zero data shuffled.
    At 100 TB this query IS the scan; anything beyond a
    filter-complete single pass would be waste. Exact-decimal
    accumulation of per-row double products, same discipline as Q1."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24))
        .agg(F.sum((F.col("l_extendedprice") * F.col("l_discount"))
                   .cast("decimal(28,10)")).cast("decimal(28,6)")
             .cast("double").alias("revenue")))
