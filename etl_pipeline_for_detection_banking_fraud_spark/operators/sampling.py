"""Deterministic sampling for training-data curation.

`df.sample()` draws from a partition-seeded RNG: results change with
partitioning, executor count, and re-runs — useless for reproducible
dataset curation or cross-engine verification. These operators sample
by CONTENT HASH (md5, the engine's portability pin): the same row is
in or out everywhere, forever, on any engine, regardless of layout.

- hash_sample: Bernoulli keep-if-hash-below-threshold. Scan-local,
  zero shuffle, partition-independent; the filter pushes to the scan.
- stratified_sample_n: exactly-n rows per stratum, chosen by hash rank
  (a deterministic reservoir). One window shuffle on the stratum key.

Both are exactly expressible in DuckDB SQL, so they are oracle-checked
like every other operator (no rows-only carve-out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_BITS = 60  # 15 hex chars of md5 -> uniform 60-bit integer


def hash60(key: Column, seed: str = "s0") -> Column:
    """Uniform 60-bit hash of (seed | key), bit-identical in Spark and
    DuckDB (`CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)`)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "|"), key.cast("string"))), 1, 15),
        16, 10,
    ).cast("bigint")


def sample_bound(fraction: float) -> int:
    """The integer threshold for a keep-fraction (computed driver-side so
    both engines compare against the same literal, no float in the plan)."""
    return int(fraction * (1 << HASH_BITS))


def hash_sample(df: DataFrame, fraction: float, key_col: str = "doc_id",
                seed: str = "s0") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes below
    fraction * 2^60. Changing `seed` draws an independent sample;
    fractions are NESTED for a fixed seed (a 5% sample is a subset of
    the 10% sample — handy for scaling-law curves)."""
    return df.where(hash60(F.col(key_col), seed) < F.lit(sample_bound(fraction)))


def stratified_sample_n(df: DataFrame, n: int, strata_col: str,
                        key_col: str, seed: str = "s0") -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum — a deterministic
    reservoir: rank by (hash, key) inside each stratum and keep the
    first n. Total order (hash then key) makes ties impossible, so the
    selection is unique and engine-independent."""
    w = Window.partitionBy(strata_col).orderBy(
        hash60(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def weighted_mix(df: DataFrame, rates: dict[str, float],
                 source_col: str = "source", key_col: str = "doc_id",
                 default_rate: float = 0.0, seed: str = "mix0") -> DataFrame:
    """Deterministic weighted corpus mixing — the operator that builds a
    training mix ("2 parts wiki, 1 part web, drop the rest") as a
    reproducible per-source Bernoulli: keep a row iff its content hash
    falls below its source's rate threshold. Same properties as
    hash_sample: partition-independent, re-run-stable, nested across
    rates for a fixed seed (raising a source's weight only ADDS rows,
    never resamples — incremental mix tuning doesn't churn the corpus).

    Thresholds are INTEGER literals baked driver-side (no float
    arithmetic in the plan, so any SQL engine computes the identical
    mix); unlisted sources use ``default_rate``. Scan-local, zero
    shuffle; the hash filter evaluates next to the scan."""
    bounds = {s: sample_bound(r) for s, r in rates.items()}
    expr = F.lit(sample_bound(default_rate))
    for s, b in bounds.items():
        expr = F.when(F.col(source_col) == s, F.lit(b)).otherwise(expr)
    return df.where(hash60(F.col(key_col), seed) < expr)


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    key_col: str = "doc_id",
                    seed: str = "w0") -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of k rows
    (Efraimidis–Vitter A-Res): each row draws u from its content hash
    and ranks by u^(1/weight); the top-k ranks ARE a weighted sample
    without replacement. Rows with non-positive/NULL weight are
    excluded (they'd rank -inf anyway).

    Same determinism contract as the other samplers: u comes from
    md5(seed|key), so membership is partition-independent, re-run
    stable, and bit-reproducible in any engine with md5 + pow — the
    DuckDB oracle computes the identical keys. The selection executes
    as a global TakeOrdered (orderBy + limit): no single-partition
    window, each partition ships only its local top-k.

    Curation use: size-balanced corpus draws (weight = doc length gives
    token-proportional sampling; weight = 1/cluster_size flattens
    near-dup clusters).
    """
    two60 = float(1 << HASH_BITS)
    u = (hash60(F.col(key_col), seed).cast("double") + F.lit(0.5)) / F.lit(two60)
    es_key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_es", es_key)
        .orderBy(F.desc("_es"), F.col(key_col))
        .limit(k)
        .drop("_es")
    )


def leakage_safe_split(df: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       train_frac: float = 0.8, val_frac: float = 0.1,
                       seed: str = "split0") -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates
    across splits: every member of a near-dup cluster (connected
    components over ``pairs``, min-id labels) hashes by its CLUSTER id,
    so the whole cluster lands in one split. An eval set contaminated
    by paraphrases of training docs silently inflates benchmarks — the
    within-corpus sibling of `decontam`'s corpus-vs-benchmark check.

    Same determinism contract as the other samplers (content-hash
    thresholds, integer literals, engine-reproducible). Returns the
    input columns plus ``split`` ('train' | 'val' | 'test').
    """
    from .dedup import connected_components

    cc = connected_components(pairs).select(
        F.col("node_id").alias(id_col), "cluster_id"
    )
    b_train = sample_bound(train_frac)
    b_val = sample_bound(train_frac + val_frac)
    g = F.coalesce(F.col("cluster_id"), F.col(id_col))
    h = hash60(g, seed)
    return (
        df.join(cc, [id_col], "left")
        .withColumn(
            "split",
            F.when(h < F.lit(b_train), F.lit("train"))
            .when(h < F.lit(b_val), F.lit("val"))
            .otherwise(F.lit("test")),
        )
        .drop("cluster_id")
    )
