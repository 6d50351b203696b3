"""Distributed k-means (Lloyd iterations) with engine-portable
determinism — the iterative-algorithm pattern on Spark.

Every round is two shapes:

1. **Assign** — centers ride as ONE broadcast collect_list row, so the
   argmin over centers is per-row array algebra (score every center
   inside the row, sort, take the first): ZERO shuffle of the corpus.
2. **Update** — posexplode to (center, dim_pos, value) and one
   partial-agg shuffle keyed (center, pos): the canonical distributed
   elementwise mean, map-side combined, never materializing a cluster's
   row set.

Determinism contract (what makes a k-means ORACLE-CHECKABLE, which
MLlib's is not): initial centers are a seed-pinned hash sample of the
corpus; distances are order-pinned left folds of IEEE-double terms;
ties break on center_id; component sums accumulate in DECIMAL (exact,
associative — partition order can't change the mean) and divide in
double. Two engines running this spec produce bit-identical centers
and assignments at every iteration.

At 100 TB: per iteration, one corpus scan + one (k x dim)-sized
shuffle. k stays broadcast-sized (the assign step holds k x dim doubles
per task); for k beyond broadcast limits you shard the centers and
union the per-shard argmins — not needed at the catalog's scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_sample


def _sq_dist(vec: Column, cvec: Column) -> Column:
    """Order-pinned squared euclidean distance: left fold of
    (x - c)^2 terms in index order (bit-stable across engines)."""
    diffs = F.zip_with(
        vec, cvec, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def _centers_row(centers: DataFrame) -> DataFrame:
    """Collapse (center_id, cvec) to ONE broadcast row, sorted by
    center_id so the collect order is deterministic."""
    return F.broadcast(
        centers.agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("center_id"), F.col("cvec")))
            ).alias("cts")
        )
    )


def _assign(emb: DataFrame, centers: DataFrame,
            id_col: str, vec_col: str) -> DataFrame:
    """Nearest center per vector (min distance, ties to the smaller
    center_id): per-row array algebra over the broadcast center row."""
    scored = F.transform(
        F.col("cts"),
        lambda c: F.struct(
            _sq_dist(F.col(vec_col), c["cvec"]).alias("dist"),
            c["center_id"].alias("center_id"),
        ),
    )
    best = F.sort_array(scored)[0]
    return (
        emb.crossJoin(_centers_row(centers))
        .select(
            F.col(id_col),
            F.col(vec_col),
            best["center_id"].alias("center_id"),
            best["dist"].alias("dist"),
        )
    )


def _update(assigned: DataFrame, centers: DataFrame,
            vec_col: str) -> DataFrame:
    """New center = elementwise mean of its members (decimal-exact
    sums); a center with no members keeps its previous position."""
    exploded = assigned.select(
        "center_id", F.posexplode(F.col(vec_col)).alias("_pos", "_v")
    )
    comp = exploded.groupBy("center_id", "_pos").agg(
        (
            F.sum(F.col("_v").cast("double").cast("decimal(27,9)")).cast("double")
            / F.count("*")
        ).alias("_mean")
    )
    new_centers = comp.groupBy("center_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("_pos"), F.col("_mean")))),
            lambda s: s["_mean"],
        ).alias("cvec")
    )
    # empty clusters: keep the old center vector (cast to the double
    # arrays the updated centers carry)
    kept = centers.select(
        "center_id",
        F.transform(F.col("cvec"), lambda x: x.cast("double")).alias("_old"),
    )
    return (
        kept.join(new_centers, "center_id", "left")
        .select(
            "center_id",
            F.coalesce(F.col("cvec"), F.col("_old")).alias("cvec"),
        )
    )


def kmeans_assign(emb: DataFrame, n_iter: int = 2,
                  center_fraction: float = 0.02,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """``n_iter`` Lloyd rounds from seed-pinned hash-sampled initial
    centers; returns the final assignment (vec_id, center_id, dist).

    ``center_id`` is the initial sample member's id (stable across
    iterations — centers move, identities don't)."""
    centers = hash_sample(emb, center_fraction, key_col=id_col, seed="ivf").select(
        F.col(id_col).alias("center_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cvec"),
    )
    for _ in range(n_iter):
        assigned = _assign(emb, centers, id_col, vec_col)
        centers = _update(assigned, centers, vec_col)
        # barrier: each iteration's centers are consumed twice next
        # round (assign + empty-cluster keep); persist keeps the
        # lineage from re-running every prior iteration per consumer
        centers = centers.persist()
    return _assign(emb, centers, id_col, vec_col).select(
        id_col, "center_id", "dist"
    )
