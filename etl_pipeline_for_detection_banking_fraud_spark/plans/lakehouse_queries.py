"""Round-5 catalog additions: lakehouse-style maintenance (CDC merge),
range/interval joins, shuffle-prefiltered semi-joins, time-RANGE window
frames, and RAG chunking — each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .data_pipeline_queries import _TOK
from .testdata_queries import _q, _t


@_q(
    "cdc_upsert",
    "CDC changelog apply / MERGE-style upsert (generic form of the "
    "reference's per-table delta loops, incr_loading.py)",
    """
    WITH latest AS (
        SELECT o_custkey AS k,
               CASE WHEN o_orderkey % 97 = 0 THEN 'D' ELSE 'U' END AS op,
               CAST(o_totalprice AS DOUBLE) AS new_bal
        FROM orders
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
    )
    SELECT coalesce(c.c_custkey, l.k) AS c_custkey,
           c.c_name AS c_name,
           CAST(CASE WHEN l.op IS NOT NULL THEN l.new_bal
                     ELSE c.c_acctbal END AS DOUBLE) AS c_acctbal
    FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.k
    WHERE l.op IS NULL OR l.op <> 'D'
    """,
)
def cdc_upsert(spark, sf_dir):
    """orders as a synthetic changelog over the customer snapshot: each
    order updates its customer's balance to the order total (newest
    order wins; version = (o_orderdate, o_orderkey) — a total order);
    every 97th orderkey is a tombstone that deletes the customer."""
    from ..operators import cdc

    snapshot = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    changes = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("o_totalprice").cast("double").alias("c_acctbal"),
    )
    return cdc.apply_changelog(
        snapshot, changes, key="c_custkey",
        version_cols=("o_orderdate", "o_orderkey"),
        payload_cols=("c_acctbal",),
    )


@_q(
    "interval_overlap_join",
    "interval-overlap (range) join via coarse-bucket equi-join — "
    "generalizes the fraud rules' fixed time-band joins (J5)",
    """
    WITH iv AS (
        SELECT user_id AS iv_user, CAST(ts AS DATE) AS day,
               min(ts) AS start_ts, max(ts) AS end_ts
        FROM events WHERE user_id % 25 = 0
        GROUP BY 1, 2
    )
    SELECT iv.iv_user, iv.day,
           count(*) AS n_overlap,
           count(DISTINCT e.user_id) AS n_users
    FROM iv JOIN events e
      ON e.ts >= iv.start_ts AND e.ts <= iv.end_ts
     AND e.user_id <> iv.iv_user
    GROUP BY 1, 2
    """,
)
def interval_overlap_join(spark, sf_dir):
    """Activity intervals (per tracked user per day: first..last event)
    vs ALL other users' events landing inside them. The oracle states
    the naive inequality join; the engine runs the bucketed equi-join
    (operators/ranges.py) — same rows, no nested loop."""
    from ..operators import ranges

    ev = _t(spark, sf_dir, "events")
    iv = (
        ev.where(F.col("user_id") % 25 == 0)
        .groupBy(
            F.col("user_id").alias("iv_user"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    )
    joined = ranges.interval_overlap_join(
        ev.select("user_id", "ts"), iv, "ts", "start_ts", "end_ts",
        bucket_seconds=3600,
    ).where(F.col("user_id") != F.col("iv_user"))
    return joined.groupBy("iv_user", "day").agg(
        F.count("*").alias("n_overlap"),
        F.countDistinct("user_id").alias("n_users"),
    )


@_q(
    "semi_join_prefilter",
    "bloom-style broadcast prefilter ahead of a large-large semi-join "
    "(prunes the probe-side shuffle; result exact)",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def semi_join_prefilter(spark, sf_dir):
    from ..operators import scale

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    big_orders = _t(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 300000
    )
    return scale.prefilter_semi_join(
        li, big_orders, "l_orderkey", "o_orderkey"
    )


@_q(
    "range_frame_window",
    "time-RANGE window frame (RANGE BETWEEN n PRECEDING) — value-based "
    "frame, deterministic under ties (unlike ROWS)",
    """
    SELECT event_id, user_id,
           count(*) OVER w AS n_hour,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               AS sum_hour
    FROM (SELECT event_id, user_id, value,
                 epoch_us(ts) AS e_us FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY e_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def range_frame_window(spark, sf_dir):
    """Trailing-hour frame keyed on the VALUE of the ordering column
    (micros since epoch), not row position: all rows sharing a
    timestamp get the same frame, so the result is deterministic even
    with ties. The decimal round-trip keeps the double sum
    order-insensitive (catalog parity rule)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.col("value").cast("decimal(18,6)").alias("_v"),
        F.expr("unix_micros(ts)").alias("_e"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_e")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id",
        F.count("*").over(w).alias("n_hour"),
        F.sum("_v").over(w).cast("double").alias("sum_hour"),
    )


@_q(
    "text_chunk",
    "RAG chunking: fixed-size overlapping token windows per document "
    "(size 64, stride 48)",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
    starts AS (
        SELECT doc_id, t,
               CAST(unnest(range(0, len(t), 48)) AS BIGINT) AS s
        FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           s // 48 AS chunk_no,
           CAST(len(list_slice(t, s + 1, s + 64)) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(t, s + 1, s + 64), ' '))
               AS chunk_md5
    FROM starts
    """,
)
def text_chunk(spark, sf_dir):
    from ..operators import chunking

    return chunking.chunk_tokens(
        _t(spark, sf_dir, "documents"), size=64, stride=48
    )


@_q(
    "window_count_distinct",
    "cumulative COUNT(DISTINCT) over a window — Spark's window frames "
    "don't support distinct aggregates, so the engine uses the "
    "first-occurrence-marker + running-sum rewrite (exact)",
    """
    SELECT event_id, user_id,
           count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_types_seen
    FROM events
    """,
)
def window_count_distinct(spark, sf_dir):
    """Distinct event_types each user has seen up to each event. The
    rewrite: mark the first occurrence of each (user, type) along the
    (ts, event_id) total order with row_number()==1, then running-sum
    the markers — identical to the oracle's native windowed DISTINCT
    (DuckDB supports it; Spark doesn't). Costs two exchanges — the
    marker window hash-partitions by (user_id, event_type), the
    running sum by user_id — the price of the rewrite; a native
    distinct frame would shuffle once but keep a per-frame distinct
    set, so this trades one exchange for constant-memory frames."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id",
                                            "event_type", "ts")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # NULL-aware marker: COUNT(DISTINCT) ignores NULLs, but row_number
    # over the NULL partition would still emit a first-occurrence
    # marker — guard it so the rewrite matches the oracle's semantics
    # unconditionally, not just on NULL-free data.
    marked = ev.withColumn(
        "_first",
        ((F.row_number().over(w_first) == 1)
         & F.col("event_type").isNotNull()).cast("long"),
    )
    return marked.select(
        "event_id", "user_id",
        F.sum("_first").over(w_cum).alias("n_types_seen"),
    )


@_q(
    "ratio_to_report",
    "ratio-to-report window: each row's share of its group total "
    "(order-insensitive via the decimal-exact group sum)",
    """
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) /
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                PARTITION BY o_custkey) AS DOUBLE) AS spend_share
    FROM orders
    """,
)
def ratio_to_report(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    total = F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w)
    return o.select(
        "o_orderkey", "o_custkey",
        (F.col("o_totalprice").cast("double") / total.cast("double"))
        .alias("spend_share"),
    )


@_q(
    "histogram_equiwidth",
    "equi-width histogram: clamped arithmetic binning + one-shuffle "
    "count per bin",
    """
    SELECT least(greatest(CAST(floor(CAST(l_quantity AS DOUBLE) / 5.0)
                               AS BIGINT), 0), 9) AS bin,
           count(*) AS n,
           CAST(min(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS bin_min,
           CAST(max(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS bin_max
    FROM lineitem
    GROUP BY 1
    """,
)
def histogram_equiwidth(spark, sf_dir):
    """10 bins of width 5 over l_quantity's [0, 50) domain, clamped at
    both ends (out-of-domain values land in the edge bins rather than
    vanishing). Bin boundaries are exact multiples of 5 — exactly
    representable doubles — so the floor-divide binning agrees
    bit-for-bit across engines."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    bin_ = F.least(
        F.greatest(F.floor(q / 5.0).cast("long"), F.lit(0)), F.lit(9)
    )
    return li.groupBy(bin_.alias("bin")).agg(
        F.count("*").alias("n"),
        F.min(q).alias("bin_min"),
        F.max(q).alias("bin_max"),
    )


@_q(
    "freq_items_bounds",
    "heavy-hitters sketch (freqItems single-pass) clamped to its "
    "published guarantee vs the exact frequencies — the approx_stats_"
    "bounds pattern for the frequent-items family",
    """
    SELECT o_orderstatus, TRUE AS covered
    FROM (SELECT o_orderstatus, count(*) AS n,
                 (SELECT count(*) FROM orders) AS total
          FROM orders GROUP BY o_orderstatus)
    WHERE n > 0.2 * total
    ORDER BY o_orderstatus
    """,
)
def freq_items_bounds(spark, sf_dir):
    """freqItems(support=s) guarantees every item with true frequency
    > s*n is in the returned set (false positives allowed, false
    negatives not). The entry emits one row per EXACT heavy hitter with
    a containment boolean — the oracle asserts the all-TRUE frame, so
    a sketch that ever drops a true heavy hitter flips a boolean and
    the driver's hash goes red. The sketch side stays distributed; the
    one-row freqItems result is broadcast, never collected."""
    o = _t(spark, sf_dir, "orders")
    support = 0.2
    fi = o.stat.freqItems(["o_orderstatus"], support)
    counts = o.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    total = o.agg(F.count("*").alias("total"))
    heavy = counts.crossJoin(F.broadcast(total)).where(
        F.col("n") > F.lit(support) * F.col("total")
    )
    return (
        heavy.crossJoin(F.broadcast(fi))
        .select(
            "o_orderstatus",
            F.array_contains(
                F.col("o_orderstatus_freqItems"), F.col("o_orderstatus")
            ).alias("covered"),
        )
        .orderBy("o_orderstatus")
    )


@_q(
    "snapshot_diff",
    "change-data-feed derivation between two keyed snapshots "
    "(row-level diff behind Warehouse.table_diff's manifest pruning)",
    """
    WITH old AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer
    ), new AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 5 = 0 THEN c_acctbal * 2
                    ELSE c_acctbal END AS c_acctbal
        FROM old WHERE c_custkey % 97 <> 0
        UNION ALL
        SELECT s_suppkey + 500000, s_name, s_acctbal FROM supplier
    ), removed AS (
        SELECT * FROM old EXCEPT ALL SELECT * FROM new
    ), added AS (
        SELECT * FROM new EXCEPT ALL SELECT * FROM old
    ), upd AS (
        SELECT c_custkey FROM removed
        INTERSECT
        SELECT c_custkey FROM added
    )
    SELECT r.c_custkey, r.c_name, r.c_acctbal,
           CASE WHEN u.c_custkey IS NULL THEN 'delete'
                ELSE 'update_preimage' END AS change_type
    FROM removed r LEFT JOIN upd u ON r.c_custkey = u.c_custkey
    UNION ALL
    SELECT a.c_custkey, a.c_name, a.c_acctbal,
           CASE WHEN u.c_custkey IS NULL THEN 'insert'
                ELSE 'update_postimage' END AS change_type
    FROM added a LEFT JOIN upd u ON a.c_custkey = u.c_custkey
    """,
)
def snapshot_diff(spark, sf_dir):
    """Synthetic snapshot pair over customer: every 97th key deleted,
    every 5th key's balance doubled (the %97 deletes win — those rows
    are gone from ``new`` regardless), supplier rows key-shifted in as
    inserts; everything else is identical and must NOT be reported.
    The oracle states the textbook 2x EXCEPT ALL + key-INTERSECT form;
    the engine runs the one-aggregate signed-multiplicity form
    (operators/cdc.py snapshot_diff) — same rows."""
    from ..operators import cdc

    old = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    new = (
        old.where(F.col("c_custkey") % 97 != 0)
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") * 2)
            .otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            _t(spark, sf_dir, "supplier").select(
                (F.col("s_suppkey") + 500000).alias("c_custkey"),
                F.col("s_name").alias("c_name"),
                F.col("s_acctbal").alias("c_acctbal"),
            )
        )
    )
    return cdc.snapshot_diff(old, new, ["c_custkey"])


@_q(
    "dedup_chunk_level",
    "corpus-wide chunk-level (paragraph) dedup: keep each distinct "
    "chunk's first global occurrence, reassemble documents "
    "(Gopher/CCNet boilerplate removal at sub-document granularity)",
    f"""
    WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
    chunks AS (
        SELECT doc_id, s // 4 AS chunk_no,
               array_to_string(list_slice(t, s + 1, s + 4), ' ') AS chunk
        FROM (
            SELECT doc_id, t,
                   CAST(unnest(range(0, len(t), 4)) AS BIGINT) AS s
            FROM toks WHERE len(t) > 0
        )
    ),
    marked AS (
        SELECT *, row_number() OVER (
            PARTITION BY chunk ORDER BY doc_id, chunk_no) AS rn
        FROM chunks
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           count(*) FILTER (WHERE rn = 1) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                               ORDER BY chunk_no), '') AS text_clean
    FROM marked GROUP BY doc_id
    """,
)
def dedup_chunk_level(spark, sf_dir):
    """4-token chunks over the small-vocab synthetic docs so repeated
    chunks genuinely occur across documents; the oracle states the
    same first-occurrence-window + ordered-string_agg computation."""
    from ..operators import chunking

    return chunking.dedup_chunks(
        _t(spark, sf_dir, "documents"), size=4
    )


@_q(
    "merge_conditional",
    "conditional multi-clause MERGE (Delta MERGE INTO analog): WHEN "
    "MATCHED AND cond UPDATE/DELETE, WHEN NOT MATCHED AND cond INSERT, "
    "WHEN NOT MATCHED BY SOURCE DELETE — the reference's SCD2 "
    "close-then-insert (incr_loading.py:79-101) generalized",
    """
    WITH t AS (
        SELECT c_custkey, c_name, c_acctbal
        FROM customer WHERE c_custkey <= 1000
    ), s AS (
        SELECT o_custkey AS c_custkey, count(*) AS n_orders,
               sum(o_totalprice) AS spend
        FROM orders GROUP BY 1
    ), m AS (
        SELECT t.c_custkey AS tk, s.c_custkey AS sk, t.c_name,
               t.c_acctbal, s.n_orders, s.spend
        FROM t FULL OUTER JOIN s ON t.c_custkey = s.c_custkey
    )
    SELECT coalesce(tk, sk) AS c_custkey,
           CASE WHEN tk IS NOT NULL THEN c_name
                ELSE 'new-' || sk END AS c_name,
           CAST(CASE
                WHEN tk IS NOT NULL AND sk IS NOT NULL
                     AND spend > 150000 THEN c_acctbal + 1
                WHEN tk IS NOT NULL THEN c_acctbal
                ELSE spend END AS DOUBLE) AS c_acctbal
    FROM m
    WHERE CASE
          WHEN tk IS NOT NULL AND sk IS NOT NULL
               THEN NOT (spend <= 150000 AND n_orders <= 2)
          WHEN tk IS NOT NULL THEN c_acctbal >= 0
          ELSE sk <= 1200 END
    """,
)
def merge_conditional(spark, sf_dir):
    """Big-spender customers get a balance bump (first-clause-wins over
    the low-order-count delete), quiet small customers are deleted,
    unknown active custkeys under a cutoff insert as new rows, and
    order-less customers in the red are purged — four clauses, one
    full-outer join + one CASE projection (operators/merge.py; the
    oracle states the same CASE algebra declaratively). The
    transactional file-narrowed form is Warehouse.merge_when."""
    from ..operators import merge as M

    target = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") <= 1000)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    source = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count("*").alias("n_orders"),
             F.sum("o_totalprice").alias("spend"))
    )
    merged = M.merge_clauses(
        target, source, ["c_custkey"],
        matched=[
            M.when_matched_update({"c_acctbal": "target.c_acctbal + 1"},
                                  condition="source.spend > 150000"),
            M.when_matched_delete(condition="source.n_orders <= 2"),
        ],
        not_matched=[
            M.when_not_matched_insert(
                {
                    "c_custkey": "source.c_custkey",
                    "c_name": F.concat(
                        F.lit("new-"),
                        F.col("source.c_custkey").cast("string")),
                    "c_acctbal": "source.spend",
                },
                condition="source.c_custkey <= 1200",
            ),
        ],
        not_matched_by_source=[
            M.when_not_matched_by_source_delete(
                condition="target.c_acctbal < 0"),
        ],
    )
    return merged.select(
        "c_custkey", "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
