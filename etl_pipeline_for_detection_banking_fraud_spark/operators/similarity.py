"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (fine up to ~10^5 x 10^5
with a pre-filter); the 100 TB scale path is LSH bucketing: deterministic
pseudo-random hyperplanes hash each vector to a small bucket code, the
shuffle happens on the code, and only co-bucketed vectors are compared.

All dot products widen float->double exactly, multiply in IEEE double,
and accumulate as an explicit LEFT FOLD over the array (F.aggregate
walks elements in index order; 0.0 + x == x in IEEE) — the result is
bit-stable across partition orders and engines (the DuckDB oracle uses
list_reduce, the same in-order fold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DEC = "decimal(38,18)"


def dot_decimal(a: Column, b: Column) -> Column:
    """Order-pinned dot product of two float arrays -> double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
    )


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` carries (query_id, qvec). The corpus side broadcasts the
    (small) query set; ranking is a window over query_id with a total
    order (cosine desc, neighbor id) so ties are deterministic.
    """
    q = F.broadcast(queries.select(F.col("query_id"), F.col("qvec")))
    joined = emb.crossJoin(q).where(F.col(id_col) != F.col("query_id"))
    cos = dot_decimal(F.col(vec_col), F.col("qvec")) / (
        l2_norm(F.col(vec_col)) * l2_norm(F.col("qvec"))
    )
    scored = joined.select(
        "query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def _plane_sign(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-random ±1 weight: parity of a md5 nibble.

    Engine-portable (md5 again) so buckets are reproducible anywhere.
    """
    nibble = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"p{plane}_"), dim_idx.cast("string"))), 1, 1), 16, 10
    ).cast("int")
    return F.when(nibble % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Random-hyperplane LSH code: one sign bit per plane."""
    code = None
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * _plane_sign(p, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    return code.cast("int")


def ann_lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5, n_planes: int = 6,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    The shuffle key is the bucket code — at scale only co-bucketed
    pairs are scored (vs the full cross join of the exact path).
    """
    corpus = emb.withColumn("bucket", lsh_bucket(F.col(vec_col), n_planes))
    q = queries.withColumn("bucket", lsh_bucket(F.col("qvec"), n_planes))
    joined = corpus.join(F.broadcast(q), "bucket").where(F.col(id_col) != F.col("query_id"))
    cos = dot_decimal(F.col(vec_col), F.col("qvec")) / (
        l2_norm(F.col(vec_col)) * l2_norm(F.col("qvec"))
    )
    scored = joined.select("query_id", F.col(id_col).alias("neighbor_id"), cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )
