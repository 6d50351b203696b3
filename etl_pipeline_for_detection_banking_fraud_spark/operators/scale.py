"""Scale-path utilities: bucketed co-located joins and skew salting.

These are the knobs the 100 TB deployment turns that small-scale tests
never force (SURVEY §4 'shuffle / distribution'):

- bucketing: persist both sides of a recurring join pre-hashed on the
  key so the join runs with NO exchange at read time (Spark's bucketed
  scan satisfies the join's distribution requirement);
- salting: a hot key (one card with millions of transactions, one
  document shingle shared by everything) overloads a single reducer —
  explode the small side over salt replicas and scatter the big side's
  hot keys across them. AQE's skew-join handles sort-merge skew
  automatically; salting is for the cases AQE can't re-split (e.g.
  aggregations keyed on the hot key, broadcast-ineligible sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_if_narrow(spark, df: DataFrame) -> DataFrame:
    """Input-skew guard (optimization guide §2.5: "one huge unsplittable
    file ... repartition immediately after the read"): when the scan
    behind ``df`` provides fewer FILES than the session has cores, the
    stage that consumes it — a broadcast-join probe, a partial
    aggregation, a per-row CPU loop — runs on that handful of tasks no
    matter how wide the machine is (a one-row-group parquet file is one
    task, full stop). Redistribute across the default parallelism in
    that case; at real scale the file count dwarfs the core count and
    this is the identity, so plans keep zero extra exchanges there.
    Call it AFTER filters/projections so the shuffle carries only
    surviving bytes (guide §2.3)."""
    files = df.inputFiles()
    # derived frames (no backing files) report [] — leave them alone:
    # their partitioning comes from upstream exchanges, not the scan
    if files and len(files) < spark.sparkContext.defaultParallelism:
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _content_salt(df: DataFrame, salt_buckets: int):
    """Deterministic per-row salt derived from row CONTENT.

    Never salt from monotonically_increasing_id / rand: both are
    recomputed nondeterministically on task retry, so after a shuffle
    fetch failure the re-run map task can route the same row to a
    DIFFERENT reducer than the partials already fetched — rows double-
    count or vanish (the SPARK-23207 class of bug). A content hash is
    stable across retries; pmod (not abs(..)%n) because
    abs(Int.MinValue) is negative.  Duplicate rows share a salt, which
    only matters if the hot key's rows are near-identical — acceptable,
    since the alternative is incorrect under retry.
    """
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort_by: str | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def salted_join(big: DataFrame, small: DataFrame, key: str, salt_buckets: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join robust to heavy skew in ``big``'s key distribution.

    big gets a retry-stable content-derived salt (see ``_content_salt``);
    small is replicated once per salt value — a scan-local
    ``explode(sequence(...))``, no join operator in the replication step
    (a broadcast crossJoin against a salt range would put a benign but
    audit-visible nested loop in every salted plan). Join key becomes
    (key, salt).
    """
    salted_big = big.withColumn("_salt", _content_salt(big, salt_buckets))
    replicas = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("int"),
                             F.lit(salt_buckets - 1).cast("int"))),
    )
    out = salted_big.join(replicas, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg(df: DataFrame, key: str, agg_exprs: "dict[str, str]",
               salt_buckets: int = 8) -> DataFrame:
    """Two-stage aggregation robust to a hot grouping key.

    Stage 1 pre-aggregates by (key, salt) — the hot key's rows scatter
    over salt_buckets reducers instead of one; stage 2 merges the
    per-salt partials by key. Only ALGEBRAIC aggregates decompose this
    way (sum/count/min/max: merge(partial) == agg(all)); the result is
    bit-identical to the direct groupBy for integer/decimal sums and
    set-independent aggs. (Spark's own partial aggregation does the
    same map-side, but cannot help when one REDUCER key dominates —
    salting re-partitions the reduce itself.)

    agg_exprs: {output_col: "sum(col)" | "count(*)" | "min(col)" | "max(col)"}.
    """
    import re

    salted = df.withColumn("_salt", _content_salt(df, salt_buckets))
    partials, finals = [], []
    for out, expr in agg_exprs.items():
        m = re.fullmatch(r"(sum|count|min|max)\((.+)\)", expr.strip())
        if not m:
            raise ValueError(f"unsupported aggregate for salting: {expr}")
        fn, col = m.group(1), m.group(2)
        part = f"_p_{out}"
        partials.append(F.expr(f"{fn}({col})").alias(part))
        merge_fn = "sum" if fn in ("sum", "count") else fn
        finals.append(F.expr(f"{merge_fn}({part})").alias(out))
    return (
        salted.groupBy(key, "_salt").agg(*partials)
        .groupBy(key).agg(*finals)
    )


def prefilter_semi_join(probe: DataFrame, build: DataFrame,
                        probe_key: str, build_key: str,
                        buckets: int = 1 << 16) -> DataFrame:
    """Semi-join of a huge ``probe`` against a selective ``build`` with
    a broadcast bloom-style prefilter ahead of the shuffle.

    At 100 TB the dominant cost of ``probe SEMI JOIN build`` is
    shuffling the entire probe side; when the build side is selective,
    almost all of that shuffle is wasted on rows that match nothing.
    Stage 1 broadcasts the SET OF OCCUPIED HASH BUCKETS of the build
    keys (≤ ``buckets`` ints — a one-bit-per-bucket bloom filter
    expressed as a broadcast semi-join, since Spark doesn't register
    ``bloom_filter_agg`` for SQL use) and drops every probe row whose
    key hashes to an empty bucket BEFORE the exchange. Stage 2 is the
    exact semi-join over the survivors, so false positives from bucket
    collisions are eliminated and the result is bit-identical to the
    plain semi-join — the prefilter only prunes.

    False-positive rate ~ n_build_keys / buckets; size ``buckets`` at
    ~16x the expected build-key count to keep the pass-through under
    ~6% while the broadcast stays a few hundred KB of ints.
    """
    keys = build.select(F.col(build_key).alias("_bk")).distinct()
    occupied = keys.select(
        F.pmod(F.xxhash64(F.col("_bk")), F.lit(buckets)).alias("_kb")
    ).distinct()
    pruned = probe.join(
        F.broadcast(occupied),
        F.pmod(F.xxhash64(F.col(probe_key)), F.lit(buckets)) == F.col("_kb"),
        "left_semi",
    )
    return pruned.join(
        keys, F.col(probe_key) == F.col("_bk"), "left_semi"
    )


def zorder_key(scaled_cols: "list", bits: int = 8):
    """Interleave the low ``bits`` bits of already-scaled integer
    columns (each in ``[0, 2**bits)``) into one Morton/Z-order key:
    ``z = sum_i sum_j bit_i(col_j) << (i*m + j)``. Rows close in EVERY
    dimension get close z-values, so range-partitioning by z yields
    files whose min/max stats are narrow in ALL the interleaved
    columns at once — multi-dimensional file skipping from
    one-dimensional clustering (the Delta ``OPTIMIZE ZORDER BY``
    curve). Pure Column bit algebra: codegen, scan-local, no UDFs.
    """
    m = len(scaled_cols)
    if m == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * m > 63:
        # the top interleaved bit would land in the long's sign bit,
        # making high-end keys negative and breaking the curve's order
        raise ValueError(
            f"bits*len(scaled_cols) = {bits}*{m} = {bits * m} exceeds the "
            "63 value bits of a signed long; lower bits or drop columns"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * m + j))
    return z


def zorder_scale(col, lo, hi, bits: int = 8):
    """Min-max scale a numeric column into ``[0, 2**bits)`` for
    ``zorder_key``. ``lo``/``hi`` are the column's global min/max (one
    control-plane aggregate row, broadcast into the expression as
    literals). NULLs and degenerate ranges map to 0 — NULL rows
    cluster together at the curve's origin, which is exactly where a
    min/max-stats pruner can never skip them incorrectly."""
    top = (1 << bits) - 1
    if lo is None or hi is None or hi <= lo:
        return F.lit(0)
    scaled = F.floor(
        (col.cast("double") - float(lo)) * top / (float(hi) - float(lo))
    ).cast("long")
    return F.coalesce(F.least(F.greatest(scaled, F.lit(0)), F.lit(top)),
                      F.lit(0))


def str_curve(col, lo_s: "str | None", hi_s: "str | None"):
    """Order-preserving string → curve position for ``zorder_scale``:
    ``(lo, hi, expr)``.

    Drops the longest common byte-prefix of the column's min/max
    strings (one control-plane stats row — the whole table shares it by
    definition of min/max), then reads the next 8 utf-8 bytes as a
    big-endian integer. The slice is fixed-width, so lexicographic byte
    order equals numeric order (utf-8 preserves codepoint order
    byte-wise); right-padding the HEX with '0' pads the BYTES with
    0x00, keeping shorter strings ordered first. The same transform
    runs driver-side on the min/max strings for the scale bounds.

    Monotone by construction: a <= b (as strings) ⇒ pos(a) <= pos(b) —
    the property file skipping needs, and exactly what a hash mapping
    destroys (lex-adjacent values scatter, so every file's raw-string
    min/max spans the whole domain and nothing prunes). The Iceberg
    truncate-transform analog. NULLs propagate to NULL and
    ``zorder_scale`` sends them to the curve origin.
    """
    if lo_s is None or hi_s is None:
        return None, None, F.lit(0)
    blo, bhi = lo_s.encode("utf-8"), hi_s.encode("utf-8")
    p = 0
    while p < min(len(blo), len(bhi)) and blo[p] == bhi[p]:
        p += 1

    expr = F.conv(
        F.rpad(F.hex(F.substring(F.encode(col, "utf-8"), p + 1, 8)),
               16, "0"),
        16, 10).cast("double")
    return str_curve_pos(lo_s, p), str_curve_pos(hi_s, p), expr


def str_curve_pos(s: str, prefix_len: int) -> float:
    """Driver-side twin of ``str_curve``'s column expression: the
    big-endian integer of utf-8 bytes ``[prefix_len, prefix_len+8)``,
    zero-padded to 8. Exposed separately so the order-preservation
    property is unit-testable without a SparkSession."""
    b = s.encode("utf-8")[prefix_len:prefix_len + 8]
    return float(int.from_bytes(b.ljust(8, b"\0"), "big"))


def zorder_scale_col(col, lo, hi, bits: int = 8):
    """``zorder_scale`` with per-GROUP Column bounds (e.g. per-dt-
    partition ``min/max ... over (partition by dt)``) instead of driver
    literals.

    Why it exists: a hive-partitioned table's z-order curve is laid out
    WITHIN each dt directory, so only the within-partition ordering
    matters — but global min-max scaling spends the curve's ``bits``
    across the whole table's history. At 365 days × 8 bits a timestamp
    dimension gets ~0.7 buckets per day: every row in a day scales to
    the same value, intra-day ordering vanishes, and the midnight-band
    file skip stops working. Per-partition bounds give every partition
    the full ``2**bits`` resolution regardless of table history — the
    property that keeps z-order useful at years of retention.

    NULL bounds or degenerate ranges (all-NULL / single-value
    partitions) map to 0, matching ``zorder_scale``.
    """
    top = (1 << bits) - 1
    lo_d, hi_d = lo.cast("double"), hi.cast("double")
    rng = hi_d - lo_d
    scaled = F.floor((col.cast("double") - lo_d) * top / rng).cast("long")
    ok = lo_d.isNotNull() & hi_d.isNotNull() & (rng > 0)
    return F.when(
        ok,
        F.coalesce(F.least(F.greatest(scaled, F.lit(0)), F.lit(top)),
                   F.lit(0)),
    ).otherwise(F.lit(0))
