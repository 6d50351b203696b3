"""Graph analytics: PageRank (power iteration) beside dedup.py's
connected components.

Per iteration, the canonical two shapes:

- **Scatter** — each node's rank/out_degree flows down its edges: one
  join of the edge list with the rank table (shuffle keyed src), then a
  partial-agg groupBy dst (map-side combined). Cost O(|E|) per round.
- **Dangling correction** — rank sitting on nodes with no out-edges is
  redistributed uniformly (the standard random-surfer fix); its sum is
  a 1-row aggregate that rides back in as a broadcast scalar.

Determinism (what makes an iterative rank ORACLE-CHECKABLE): every
floating contribution is rounded into DECIMAL(38,18) before summation —
decimal addition is exact and associative, so partition order cannot
change a sum, and the double->decimal(…,18) rounding itself is
IEEE-defined identically on any engine. Node count N enters as an
integer; 1.0/N and the damping algebra are plain IEEE doubles computed
from identical operands.

At 100 TB: the edge list is the only data-sized table; ranks are
O(|V|). Each round is one edges-ranks join + one groupBy — same
shuffle budget as one SQL aggregate per iteration. The node count and
dangling mass are bounded control-plane scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,18)"


def pagerank(edges: DataFrame, n_iter: int = 3, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Ranks after ``n_iter`` power iterations from a uniform start.

    ``edges`` is a directed edge list (duplicates are deduped; an edge
    contributes once). Returns (node, rank) for every node appearing as
    source or destination; ranks sum to 1 up to float rounding.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded control-plane scalar: |V|
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        ranked = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank", "deg")
        # scatter: rank/deg down each edge, decimal-exact accumulation
        contrib = (
            e.join(
                ranked.where(F.col("deg").isNotNull()).select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("deg")).cast(_DEC).alias("c"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        # dangling mass: ranks with nowhere to go, spread uniformly
        dangling = F.broadcast(
            ranked.where(F.col("deg").isNull())
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast(_DEC)), F.lit(0).cast(_DEC)
                ).cast("double").alias("dm")
            )
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0))
                       + F.col("dm") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        ranks = ranks.persist()
    return ranks
