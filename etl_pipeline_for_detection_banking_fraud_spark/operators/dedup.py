"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The beyond-reference dedup family for training-data pipelines. Scale
posture for 100 TB of documents:

- exact: one hash-groupBy shuffle on the content hash.
- MinHash signatures: per-row higher-order-function algebra (no
  explode, no shuffle); LSH banding then shuffles once on (band,
  band_key) — candidate pairs only ever materialize within a bucket.
- n-gram Jaccard: inverted-index join on shingles — one shuffle on the
  shingle; pair aggregation only over co-bucketed docs.
- SimHash: per-row bit algebra, zero shuffle; near-dup = hamming probe.

Hash function is md5 (pinned: available and bit-identical in Spark,
DuckDB, and Postgres) — signatures are engine-portable, which is what
makes the DuckDB oracle able to verify candidate generation exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical content; keep the min id as canonical."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def _minhash_component(tok: Column, seed: int) -> Column:
    """One signature component: min over tokens of md5(seed|token).

    String-min over hex digests == min over the underlying 128-bit
    values (hex is order-preserving), so this is a valid MinHash family
    and is reproducible in any engine with md5.
    """
    return F.array_min(F.transform(tok, lambda t: F.md5(F.concat(F.lit(f"{seed}|"), t))))


def minhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 8) -> DataFrame:
    tok = F.array_distinct(tokens(text_col))
    return df.select(
        F.col(id_col),
        *[_minhash_component(tok, i).alias(f"mh_{i}") for i in range(num_hashes)],
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on >= 1 LSH band.

    bands of r = num_hashes/bands rows each; band key = md5 of the
    concatenated components. Returns (id_a, id_b, n_shared_bands).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("key")).alias(f"b{b}")
        )
    exploded = (
        sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk"))
        .select(F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    left = exploded.select(F.col(id_col).alias("id_a"), "band", "key")
    right = exploded.select(F.col(id_col).alias("id_b"), "band", "key")
    return (
        left.join(right, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Doc pairs whose distinct word-n-gram Jaccard >= threshold.

    Inverted-index formulation: explode distinct shingles, self-join on
    the shingle (the only shuffle), count intersections, then
    |A ∪ B| = |A| + |B| - |A ∩ B|.
    """
    tok = tokens(text_col)
    # guard: Spark's sequence(0, stop) runs DESCENDING for stop < 0
    shingles = F.when(
        F.size(tok) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(tok) - n),
                lambda i: F.concat_ws(" ", *[F.element_at(tok, i + j + 1) for j in range(n)]),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = df.select(F.col(id_col), shingles.alias("sh")).where(F.size("sh") > 0)
    sizes = sh.select(F.col(id_col), F.size("sh").alias("n_sh"))
    inv = sh.select(F.col(id_col), F.explode("sh").alias("shingle"))
    a = inv.select(F.col(id_col).alias("id_a"), "shingle")
    b = inv.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """SimHash fingerprint over distinct tokens (md5-derived 60-bit
    token hashes; per-bit majority vote). Near-dups have small hamming
    distance; pure per-row algebra, zero shuffle."""
    tok = F.array_distinct(tokens(text_col))
    h = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint")  # noqa: E731
    n = F.size(tok)
    bit_votes = [
        F.size(F.filter(tok, lambda t: F.shiftright(h(t), b).bitwiseAND(F.lit(1)) == 1))
        for b in range(bits)
    ]
    fp = None
    for b, votes in enumerate(bit_votes):
        term = F.when(votes * 2 > n, F.lit(2**b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return df.select(F.col(id_col), fp.cast("bigint").alias("simhash"))


def embedding_cosine_pairs(emb: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.9) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold (brute-force
    baseline; the LSH-bucketed scale path lives in similarity.py).

    Dot products accumulate in DECIMAL(38,18) after exact float->double
    widening, so results are bit-stable across engines and partition
    orders.
    """
    from .similarity import dot_decimal, l2_norm

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = dot_decimal(F.col("va"), F.col("vb")) / (l2_norm(F.col("va")) * l2_norm(F.col("vb")))
    return pairs.select("id_a", "id_b", cos.alias("cosine")).where(F.col("cosine") >= threshold)
