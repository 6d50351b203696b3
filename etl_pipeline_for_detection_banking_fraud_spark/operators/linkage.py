"""Blocked fuzzy record matching (entity-resolution primitive).

Training-data curation and warehouse hygiene both need "these two
records are the same thing spelled differently": near-identical titles,
vendor names, user handles. Edit distance over all pairs is O(n²); the
standard scale shape is BLOCKING — an equi-join on cheap deterministic
block keys (prefix, length band, phonetic code, brand+size, ...) that
only ever compares records inside a block, then the exact edit-distance
predicate inside each block.

Scale shape: one shuffled equi-join on the block keys; cost is
sum(block_size²), so pick keys that keep blocks small relative to the
corpus (the same sizing discipline as the LSH band buckets in
`dedup.py`). `F.levenshtein` is JVM codegen — no UDFs — and the same
function exists verbatim in DuckDB, so the operator is exact-oracle
checkable like everything else.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match_pairs(df: DataFrame, id_col: str, text_col: str,
                      block_cols: Sequence[str],
                      max_distance: int = 3) -> DataFrame:
    """Ordered pairs (id_a < id_b) within each block whose
    ``text_col`` Levenshtein distance is <= ``max_distance``.

    Returns (id_a, id_b, distance). NULL texts never match (SQL
    comparison semantics: levenshtein(NULL, x) is NULL, which fails the
    threshold predicate). Identical ids are excluded by the strict
    ordering, and each qualifying pair appears exactly once because a
    pair shares at most one block-key tuple (equality blocking).
    """
    # the blocked join is a BROADCAST join whenever the table is small
    # enough (both sides are the same table), so its parallelism is the
    # PROBE side's scan tasks — over a one-file input that is ONE task
    # running every banded-Levenshtein comparison. Spread the probe
    # side when the scan is narrower than the machine (identity at real
    # scale): measured 3.64 s -> 0.46 s at sf0.1, identical pairs.
    from ..operators.scale import spread_if_narrow

    a = spread_if_narrow(df.sparkSession, df.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("_t_a"),
        *[F.col(c) for c in block_cols],
    ))
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_t_b"),
        *[F.col(c) for c in block_cols],
    )
    # banded levenshtein (Spark 3.5+ threshold form): O(len * k) per
    # pair instead of O(len^2), with the length-difference early-out
    # built in — ~2x at sf0.1 (9.7 s -> 5.1 s), identical pairs and
    # distances. Returns -1 when the distance exceeds the threshold,
    # and the exact distance otherwise, so the kept rows carry the
    # same value the unbounded form produced; NULL texts still yield
    # NULL, which fails the >= 0 predicate exactly like the old
    # <= max_distance one (guide §1.2: per-task work, after the
    # blocking algorithm is right).
    return (
        a.join(b, list(block_cols))
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "distance", F.levenshtein("_t_a", "_t_b", max_distance)
        )
        .where(F.col("distance") >= 0)
        .select("id_a", "id_b", "distance")
    )
