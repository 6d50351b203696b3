"""Operator catalog over the driver testdata, with DuckDB oracle SQL.

One entry per operator family from SURVEY §2 (plus the engine's
beyond-reference operators), each expressed twice:

- ``spark``: the engine's DataFrame implementation, the thing under test
- ``sql``: semantically identical ANSI SQL for DuckDB (the oracle)

Parity rules that keep the driver's order-insensitive value-hash stable:
- every computed column aliased identically on both sides
- integer/exact types wherever possible; time math via unix_micros /
  epoch_us (BIGINT), never float epochs
- double aggregation goes through DECIMAL (exact, associative) and is
  cast back to double, so partial-aggregation order can't change the
  result on either engine
- no nondeterministic picks: first-row-per-group is always
  row_number over a total order
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import scd2


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to TIMESTAMP.

    The testdata generator has shipped the same instants under different
    parquet physical types across rounds (NANOS adjusted-to-UTC, then
    plain us with isAdjustedToUTC=false, which Spark 4 infers as NTZ).
    The catalog's time math (unix_micros, timestamp-literal comparisons)
    is typed for TIMESTAMP; with the session TZ pinned to UTC the
    NTZ->LTZ cast re-labels the same wall-clock value as the same UTC
    instant, so query results are bit-identical whichever physical type
    the driver generated."""
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# Inferred parquet schemas, keyed by (sf_dir, table). Supplying the
# schema to spark.read skips the per-call footer-read/schema-merge job
# and its py4j round-trips — ~0.1 s of DRIVER time per table per query
# construction at sf0.1, which a 5-table join pays five times (guide
# §1.2: per-task work after algorithm; §5: the driver should do almost
# no work). Metadata only — never rows, never results: every query
# still computes from the parquet files on every invocation (the same
# class of caching as Spark's own per-session InMemoryFileIndex).
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table.

    events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses by
    default; read it as nano-longs and integer-divide to microsecond
    timestamps (exact — float division would lose precision on 1.7e18
    nanosecond epochs). DuckDB truncates ns->us identically.
    """
    # Pin session TZ: parquet timestamps are UTC instants and the DuckDB
    # oracle is TZ-naive; a non-UTC driver session would shift to_date()
    # and CAST(ts AS DATE) results.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Read naive (isAdjustedToUTC=false) parquet timestamps as TIMESTAMP
    # directly instead of NTZ: under the pinned UTC session the instants
    # are identical, and a native LTZ column keeps timestamp predicates
    # PUSHED DOWN to the parquet scan — the _ntz_to_ltz cast fallback
    # below would hide filters from the reader at 100 TB.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_cached_schema(spark, sf_dir, name)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _ntz_to_ltz(df)
    df = _read_cached_schema(spark, sf_dir, name)
    df = _ntz_to_ltz(df)
    if name in ("documents", "embeddings"):
        # single-file testdata reads as ONE split; these tables feed
        # compute-heavy per-row operators (hashing, shingling, dot
        # products), so spread them across the local cores. At real
        # scale the source has many splits and this is a no-op concern.
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Input-skew guard (guide §2.5: "one huge unsplittable file …
    repartition immediately after the read"): the testdata tables are
    ONE parquet file with ONE row group, so a scan — and everything
    before the first exchange, e.g. a partial decimal aggregation —
    runs as a single task however many cores the session has.

    When the input provides fewer files than cores, redistribute the
    (filtered, projected — always call this AFTER both, so the shuffle
    carries only surviving bytes) rows across the default parallelism.
    At real scale the condition is false (a 100 TB table has orders of
    magnitude more splits than cores) and this is the identity — the
    plan keeps zero extra exchanges, unlike an unconditional
    repartition. Scale-adaptive by construction: the driver's
    lower-core bench runs see the same rule, keyed to their own
    defaultParallelism. (Thin alias of operators.scale.spread_if_narrow
    so the catalog and the operators share one implementation.)"""
    from ..operators.scale import spread_if_narrow

    return spread_if_narrow(spark, df)


def _read_cached_schema(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """spark.read.parquet with the schema remembered from the first
    read of this (sf_dir, table): identical DataFrame, minus the
    footer-read job every schema-less parquet read runs up front."""
    path = f"{sf_dir}/{name}.parquet"
    key = (sf_dir, name)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


@dataclass
class QueryDef:
    name: str
    survey_ref: str  # SURVEY §2 row(s) this exercises
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => not SQL-expressible; driver does rows-only check
    tags: tuple[str, ...] = field(default=())


CATALOG: list[QueryDef] = []


def _q(name: str, survey_ref: str, sql: str | None, tags: tuple[str, ...] = ()):
    def deco(fn):
        CATALOG.append(QueryDef(name, survey_ref, fn, sql, tags))
        return fn

    return deco


# ---------------------------------------------------------------------------
# Scan / project / scalar expressions (SRC1, S1-S11, F1-F8)
# ---------------------------------------------------------------------------

@_q(
    "scan_filter_project",
    "S10/F1: projection + pushed-down predicates",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity < 10
    """,
)
def scan_filter_project(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@_q(
    "cast_project",
    "S2/S3: string/timestamp/date casts",
    """
    SELECT event_id, CAST(ts AS DATE) AS event_date,
           CAST(CAST(floor(value * 100 + 0.5) / 100.0 AS DECIMAL(10,2)) AS DOUBLE) AS value_dec,
           upper(event_type) AS type_uc
    FROM events
    """,
)
def cast_project(spark, sf_dir):
    # double->decimal rounding is engine-defined at .005 ties (Spark HALF_UP,
    # DuckDB half-even), so the rounding is pinned explicitly: scale in IEEE
    # double space (floor(x*100+0.5)), divide back, then cast.  Same primitive
    # ops on both engines -> bit-identical decimals.  Final cast back to DOUBLE
    # because DuckDB DECIMAL lands as float64 in pandas while Spark decimals
    # arrive as Decimal objects -> driver hash mismatch on type alone.
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_date("ts").alias("event_date"),
        (F.floor(F.col("value") * 100 + 0.5) / 100.0)
        .cast("decimal(10,2)")
        .cast("double")
        .alias("value_dec"),
        F.upper("event_type").alias("type_uc"),
    )


@_q(
    "concat_coalesce",
    "S4/S5: null-skipping concat via explicit coalesce",
    """
    SELECT c_custkey,
           concat(c_name, ' ', coalesce(nullif(c_mktsegment, 'BUILDING'), '')) AS label
    FROM customer
    """,
)
def concat_coalesce(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(
            F.col("c_name"),
            F.lit(" "),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("")),
        ).alias("label"),
    )


@_q(
    "date_arith",
    "S7/S8: date - interval arithmetic and sentinel dates",
    """
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 DAY AS DATE) AS od_minus1,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS od_plus30,
           DATE '9999-12-31' AS open_end
    FROM orders
    """,
)
def date_arith(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        od.alias("od"),
        F.date_sub(od, 1).alias("od_minus1"),
        F.date_add(od, 30).alias("od_plus30"),
        F.lit("9999-12-31").cast("date").alias("open_end"),
    )


@_q(
    "between_filter",
    "F3: BETWEEN temporal probe",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1994-03-01' AND TIMESTAMP '1994-06-30'
    """,
)
def between_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate").between(
            F.lit("1994-03-01").cast("timestamp"), F.lit("1994-06-30").cast("timestamp")
        )
    ).select("l_orderkey", "l_linenumber")


@_q(
    "null_filters",
    "F4/F5: IS NULL / IS NOT NULL on derived nullable",
    """
    SELECT event_id, nullif(event_type, 'error') AS maybe_type
    FROM events
    WHERE nullif(event_type, 'error') IS NULL OR value > 90
    """,
)
def null_filters(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    maybe = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select("event_id", maybe.alias("maybe_type")).where(
        maybe.isNull() | (F.col("value") > 90)
    )


@_q(
    "nullsafe_neq",
    "F6: IS DISTINCT FROM change detection (eqNullSafe)",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT user_id, count(*) AS n_changes
    FROM seq
    WHERE event_type IS DISTINCT FROM prev_type
    GROUP BY user_id
    """,
)
def nullsafe_neq(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.where(~F.col("event_type").eqNullSafe(F.col("prev_type")))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_changes"))
    )


# ---------------------------------------------------------------------------
# Joins (J1-J8)
# ---------------------------------------------------------------------------

@_q(
    "join_chain",
    "J1: fact -> dim broadcast equi-join chain",
    """
    SELECT l.l_orderkey, l.l_linenumber, c.c_custkey, n.n_name,
           l.l_extendedprice * (1 - l.l_discount) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    """,
)
def join_chain(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .select(
            "l_orderkey",
            "l_linenumber",
            "c_custkey",
            "n_name",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@_q(
    "left_join_count",
    "J2: left outer enrich + count per left key",
    """
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def left_join_count(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@_q(
    "anti_join",
    "J3/J4: NOT EXISTS as left_anti (set difference by key)",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@_q(
    "semi_join",
    "J8/F7: IN (subquery) as left_semi",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def semi_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "left_semi").select("o_orderkey", "o_custkey")


@_q(
    "timeband_self_join",
    "J5: same-key self theta-join with time-band residual (fraud rule 3 shape)",
    """
    SELECT e1.event_id AS first_id, e2.event_id AS second_id,
           (epoch_us(e2.ts) - epoch_us(e1.ts)) // 1000000 AS gap_sec
    FROM events e1
    JOIN events e2 ON e1.user_id = e2.user_id
         AND e1.ts < e2.ts
         AND epoch_us(e2.ts) - epoch_us(e1.ts) < 3600000000::BIGINT
    WHERE e1.event_type <> e2.event_type AND e2.event_type = 'purchase'
    """,
)
def timeband_self_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    e1 = ev.select(
        F.col("user_id").alias("u1"), F.col("ts").alias("ts1"),
        F.col("event_id").alias("first_id"), F.col("event_type").alias("type1"),
    )
    e2 = ev.select(
        F.col("user_id").alias("u2"), F.col("ts").alias("ts2"),
        F.col("event_id").alias("second_id"), F.col("event_type").alias("type2"),
    )
    us = F.unix_micros
    return (
        e1.join(
            e2,
            (F.col("u1") == F.col("u2"))
            & (F.col("ts1") < F.col("ts2"))
            & (us(F.col("ts2")) - us(F.col("ts1")) < 3600 * 1_000_000),
        )
        .where((F.col("type1") != F.col("type2")) & (F.col("type2") == "purchase"))
        .select(
            "first_id",
            "second_id",
            ((us(F.col("ts2")) - us(F.col("ts1"))) / F.lit(1_000_000)).cast("long").alias("gap_sec"),
        )
    )


@_q(
    "timeband_window",
    "J5 production form: trailing range frame instead of self-join",
    """
    WITH w AS (
        SELECT event_id, event_type, user_id,
               count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                              RANGE BETWEEN 3599999999 PRECEDING AND 1 PRECEDING) AS n_prior_hr
        FROM events
    )
    SELECT event_id, user_id, n_prior_hr FROM w
    WHERE event_type = 'purchase' AND n_prior_hr >= 2
    """,
)
def timeband_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_599_999_999, -1)
    )
    return (
        ev.withColumn("n_prior_hr", F.count("*").over(w))
        .where((F.col("event_type") == "purchase") & (F.col("n_prior_hr") >= 2))
        .select("event_id", "user_id", "n_prior_hr")
    )


@_q(
    "decreasing_triple",
    "J5 triple chain (fraud rule 4 shape): strictly-decreasing run inside a band",
    """
    SELECT e3.event_id AS hit_id, e3.user_id
    FROM events e1
    JOIN events e2 ON e1.user_id = e2.user_id AND e1.ts < e2.ts
         AND epoch_us(e2.ts) - epoch_us(e1.ts) < 14400000000::BIGINT
    JOIN events e3 ON e2.user_id = e3.user_id AND e2.ts < e3.ts
         AND epoch_us(e3.ts) - epoch_us(e2.ts) < 14400000000::BIGINT
    WHERE e1.value > e2.value AND e2.value > e3.value
      AND epoch_us(e3.ts) - epoch_us(e1.ts) < 14400000000::BIGINT
    GROUP BY e3.event_id, e3.user_id
    """,
)
def decreasing_triple(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros
    band = 14400 * 1_000_000
    e1 = ev.select(F.col("user_id").alias("u1"), F.col("ts").alias("ts1"),
                   F.col("value").alias("v1"))
    e2 = ev.select(F.col("user_id").alias("u2"), F.col("ts").alias("ts2"),
                   F.col("value").alias("v2"))
    e3 = ev
    return (
        e3.join(
            e2,
            (F.col("u2") == F.col("user_id")) & (F.col("ts2") < F.col("ts"))
            & (us(F.col("ts")) - us(F.col("ts2")) < band),
        )
        .join(
            e1,
            (F.col("u1") == F.col("user_id")) & (F.col("ts1") < F.col("ts2"))
            & (us(F.col("ts2")) - us(F.col("ts1")) < band)
            & (us(F.col("ts")) - us(F.col("ts1")) < band),
        )
        .where((F.col("v1") > F.col("v2")) & (F.col("v2") > F.col("value")))
        .select(F.col("event_id").alias("hit_id"), F.col("user_id"))
        .distinct()
    )


@_q(
    "asof_join",
    "J6: validity-interval (as-of) join to a derived SCD-style dim",
    """
    WITH dim AS (
        SELECT user_id, ts AS effective_from,
               coalesce(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        TIMESTAMP '9999-12-31 00:00:00') AS effective_to,
               event_id AS version_id
        FROM events WHERE event_type = 'signup'
    )
    SELECT p.event_id, d.version_id
    FROM events p JOIN dim d ON p.user_id = d.user_id
         AND p.ts >= d.effective_from AND p.ts < d.effective_to
    WHERE p.event_type = 'purchase'
    """,
)
def asof_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.where(F.col("event_type") == "signup")
        .withColumn(
            "effective_to",
            F.coalesce(F.lead("ts").over(w), F.lit("9999-12-31 00:00:00").cast("timestamp")),
        )
        .select(
            F.col("user_id").alias("d_user"), F.col("ts").alias("effective_from"),
            "effective_to", F.col("event_id").alias("version_id"),
        )
    )
    p = ev.where(F.col("event_type") == "purchase")
    return p.join(
        dim,
        (p.user_id == dim.d_user)
        & (p.ts >= dim.effective_from)
        & (p.ts < dim.effective_to),
    ).select("event_id", "version_id")


# ---------------------------------------------------------------------------
# SCD2 apply (J7) — the flagship composed operator, on testdata shapes
# ---------------------------------------------------------------------------

_SCD2_SQL = """
WITH hist AS (
    SELECT CAST(user_id AS VARCHAR) AS terminal_id,
           min(event_type) AS terminal_type,
           'city' AS terminal_city, 'addr' AS terminal_address,
           DATE '2024-01-01' AS effective_from,
           DATE '9999-12-31' AS effective_to, FALSE AS deleted_flg
    FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY user_id
), snap AS (
    SELECT CAST(user_id AS VARCHAR) AS terminal_id,
           min(event_type) AS terminal_type,
           'city' AS terminal_city, 'addr' AS terminal_address
    FROM events WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY user_id
), inc_new AS (
    SELECT s.* FROM snap s
    WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.terminal_id = s.terminal_id)
), inc_del AS (
    SELECT h.terminal_id, h.terminal_type, h.terminal_city, h.terminal_address
    FROM hist h
    WHERE NOT EXISTS (SELECT 1 FROM snap s WHERE s.terminal_id = h.terminal_id)
), inc_upd AS (
    SELECT s.* FROM snap s JOIN hist h USING (terminal_id)
    WHERE s.terminal_type IS DISTINCT FROM h.terminal_type
       OR s.terminal_city IS DISTINCT FROM h.terminal_city
       OR s.terminal_address IS DISTINCT FROM h.terminal_address
), closing AS (SELECT terminal_id FROM inc_upd UNION SELECT terminal_id FROM inc_del)
SELECT h.terminal_id, h.terminal_type, h.terminal_city, h.terminal_address,
       h.effective_from,
       CASE WHEN h.effective_to = DATE '9999-12-31'
                 AND h.terminal_id IN (SELECT terminal_id FROM closing)
            THEN DATE '2024-01-14' ELSE h.effective_to END AS effective_to,
       h.deleted_flg
FROM hist h
UNION ALL
SELECT terminal_id, terminal_type, terminal_city, terminal_address,
       DATE '2024-01-15', DATE '9999-12-31', FALSE FROM inc_new
UNION ALL
SELECT terminal_id, terminal_type, terminal_city, terminal_address,
       DATE '2024-01-15', DATE '9999-12-31', FALSE FROM inc_upd
UNION ALL
SELECT terminal_id, terminal_type, terminal_city, terminal_address,
       DATE '2024-01-15', DATE '9999-12-31', TRUE FROM inc_del
"""


@_q("scd2_apply", "J7/L4: SCD2 increment + union-rewrite apply", _SCD2_SQL)
def scd2_apply(spark, sf_dir):
    import datetime

    ev = _t(spark, sf_dir, "events")

    def state(df):
        return df.groupBy(F.col("user_id").cast("string").alias("terminal_id")).agg(
            F.min("event_type").alias("terminal_type"),
            F.lit("city").alias("terminal_city"),
            F.lit("addr").alias("terminal_address"),
        )

    split = F.lit("2024-01-15").cast("timestamp")
    hist = state(ev.where(F.col("ts") < split)).select(
        "*",
        F.lit("2024-01-01").cast("date").alias("effective_from"),
        F.lit("9999-12-31").cast("date").alias("effective_to"),
        F.lit(False).alias("deleted_flg"),
    )
    snap = state(ev.where(F.col("ts") >= split))
    return scd2.apply_increment(hist, snap, datetime.date(2024, 1, 15))


# ---------------------------------------------------------------------------
# Dedup / first-per-group / counts (A1-A3)
# ---------------------------------------------------------------------------

@_q(
    "first_per_group",
    "A1: DISTINCT ON made deterministic via row_number over a total order",
    """
    WITH ranked AS (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id, event_type, event_id AS first_event_id, value AS first_value
    FROM ranked WHERE rn = 1
    """,
)
def first_per_group(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id", "event_type",
            F.col("event_id").alias("first_event_id"), F.col("value").alias("first_value"),
        )
    )


@_q(
    "distinct_pairs",
    "A1: exact dedup of a projection (dropDuplicates)",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def distinct_pairs(spark, sf_dir):
    return _t(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@_q(
    "row_counts",
    "A2: audit row counts per group",
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
)
def row_counts(spark, sf_dir):
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(F.count("*").alias("n"))


@_q(
    "min_max_date",
    "A3: date_global extraction with homogeneity probe",
    """
    SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi,
           count(*) AS n FROM events
    """,
)
def min_max_date(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.to_date(F.min("ts")).alias("lo"),
        F.to_date(F.max("ts")).alias("hi"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Aggregation beyond the reference (engine completeness at scale)
# ---------------------------------------------------------------------------

@_q(
    "groupby_agg",
    "TPC-H Q1 shape: multi-agg with exact decimal accumulation",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE)
               AS sum_disc_price,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def groupby_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # exact-decimal accumulation is the per-row cost here (BigDecimal
    # path above precision 18); spread the filtered+projected rows so
    # the partial aggregate isn't one task on a one-row-group input
    # (identity at real scale — see _spread)
    filtered = _spread(
        spark,
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select("l_quantity", "l_extendedprice", "l_discount",
                "l_returnflag", "l_linestatus"),
    )
    return (
        filtered
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("sum_base"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,10)")
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("n"),
        )
    )


@_q(
    "topk_per_group",
    "top-K per group via ranked window (idiomatic replacement for DISTINCT ON)",
    """
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice FROM ranked WHERE rn <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@_q(
    "union_except",
    "set ops: UNION / EXCEPT by key (L-ops + J3 as keyed EXCEPT)",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def union_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    auto = c.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    mach = c.where(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    fin = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    return auto.union(mach).distinct().subtract(fin)


@_q(
    "sessionize",
    "sessionization: 30-min-gap sessions via lag + cumulative flag",
    """
    WITH gaps AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000000::BIGINT
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sess AS (
        SELECT user_id, event_id,
               CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM gaps
    )
    SELECT user_id, session_no, count(*) AS n_events
    FROM sess GROUP BY user_id, session_no
    """,
)
def sessionize(spark, sf_dir):
    # Two sequential projections mirroring the oracle's CTEs: materialize the
    # lag-derived new_session flag first, THEN the cumulative sum.  Nesting the
    # lag window inside sum(...).over(...) made Catalyst evaluate both windows
    # in one WindowExec pass with diverging frame semantics (r1 hash mismatch).
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    gaps = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sess = gaps.select(
        "user_id",
        "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    return sess.groupBy("user_id", "session_no").agg(F.count("*").alias("n_events"))


# Driver-facing ordering. The correctness driver evaluates the catalog in
# dict order and reports at most ~50 rows per round, so ordering IS evidence
# policy: LEAST-RECENTLY-VERIFIED first. Entries that have never produced a
# driver-side CORRECTNESS row go first, then entries whose newest driver row
# is oldest; the tail holds entries green in the MOST RECENT report — they
# are the ones that can afford to rotate out of a capped report. Tail
# entries that do rotate out are still evidenced by their last green driver
# row plus the local parity suite (tests/test_oracle_parity.py runs every
# catalog entry against its DuckDB oracle at sf0.01 each CI run).
_REPORT_FIRST = [
    # new in r13 — never reported: add new catalog entries HERE, above
    # the rotation block, so they get driver-oracle evidence this round
    "tpch_q1_shape", "tpch_q6_shape",
    # r13 rotation (r12 verdict ask #2): the 33 entries whose newest
    # evidence is r10 lead — nothing may go >2 rounds stale
    "approx_distinct_bounds", "asof_join", "bm25_topk",
    "decreasing_triple", "dedup_chunk_level", "dedup_clusters",
    "dedup_containment", "dedup_exact", "dedup_keep_canonical",
    "dedup_minhash_lsh", "distinct_count_agg", "distinct_pairs",
    "first_per_group", "fuzzy_match_pairs", "global_topk",
    "scan_filter_project", "semi_join", "semi_join_prefilter",
    "skew_salted_agg", "string_agg_ordered", "text_bigram_topk",
    "text_chunk", "text_decontaminate", "text_regex_scan",
    "text_repetition", "text_tokens_bpe", "text_winnow", "tpch_q17_shape",
    "tpch_q18_shape", "tpch_q5_shape", "window_count_distinct",
    "window_session_native", "window_tumbling",
    # newest evidence r11: next in line; whatever tails past the cap
    # stays r11-fresh and must lead the r14 rotation
    "anti_join", "approx_stats_bounds", "array_funcs", "between_filter",
    "case_when_bucketing", "cast_project", "cdc_upsert", "concat_coalesce",
    "corpus_mix", "cube_agg", "date_arith", "date_parts",
    "dedup_clusters_star", "dedup_minhash_incr", "dedup_ngram_incr",
    "dedup_ngram_jaccard", "dedup_semantic", "dedup_simhash",
    "dedup_simhash_pairs", "dq_checks", "embedding_centroids",
    "embedding_quantize", "events_funnel", "events_pathing",
    "events_retention", "freq_items_bounds", "full_outer_join",
    "group_median_mad", "groupby_agg", "grouping_sets_agg",
    "lead_lag_window", "multimodal_features", "pivot_agg", "rank_funcs",
    "rollup_agg", "running_window", "sample_hash", "sample_stratified_n",
    "sample_weighted", "scd2_apply", "sessionize", "sim_ann_ivf",
    "sim_ann_lsh", "sim_cosine_pairs", "sim_cosine_pairs_lsh",
    "sim_cosine_topk", "skew_salted_join", "tpch_q16_shape",
    "tpch_q22_shape", "tpch_q2_shape",
]
_REPORT_LAST = [
    # reported green in r12 — freshest evidence, can wait
    "graph_pagerank", "histogram_equiwidth", "intersect_key",
    "interval_overlap_join", "join_chain", "json_extract", "kmeans_iter2",
    "left_join_count", "merge_conditional", "min_max_date",
    "multimodal_image", "null_filters", "nullsafe_neq", "pack_sequences",
    "quantiles_exact", "range_frame_window", "ratio_to_report",
    "row_counts", "scalar_subquery", "snapshot_diff", "split_leakage_safe",
    "string_funcs", "text_char_entropy", "text_fingerprint",
    "text_lang_id", "text_pii_redact", "text_quality", "text_tfidf_topk",
    "text_token_stats", "timeband_self_join", "timeband_window",
    "topk_per_group", "tpch_q10_shape", "tpch_q11_shape", "tpch_q12_shape",
    "tpch_q13_shape", "tpch_q14_shape", "tpch_q15_shape", "tpch_q19_shape",
    "tpch_q20_shape", "tpch_q21_shape", "tpch_q3_shape", "tpch_q4_shape",
    "tpch_q7_shape", "tpch_q8_shape", "tpch_q9_shape", "union_except",
    "unpivot_melt", "window_hopping", "zscore_outliers",
]


def _ordered() -> list[QueryDef]:
    by_name = {q.name: q for q in CATALOG}
    first = [by_name[n] for n in _REPORT_FIRST if n in by_name]
    last = [by_name[n] for n in _REPORT_LAST if n in by_name]
    pinned = set(_REPORT_FIRST) | set(_REPORT_LAST)
    middle = [q for q in CATALOG if q.name not in pinned]
    return first + middle + last


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in _ordered()}


def oracle_sql_map() -> dict[str, str]:
    return {q.name: q.sql for q in _ordered() if q.sql is not None}
