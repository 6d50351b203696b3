"""Sequence packing for LLM training-data assembly.

Training examples are fixed-length token windows; packing concatenates
documents into a token stream and cuts it at multiples of the context
length. The exact first-fit-decreasing bin packer is inherently
sequential; the shape that scales is CONTIGUOUS-FILL packing — pin a
deterministic document order per shard, take the running token sum, and
derive each document's byte/bin position arithmetically. Documents may
straddle a bin boundary (the trainer splits them — standard practice);
what matters is that every engine and every re-run derives the same
layout, which integer running sums over a pinned order guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_offsets(df: DataFrame, tokens_col: str = "n_tokens",
                 shard_col: str = "lang", order_col: str = "doc_id",
                 cap: int = 2048) -> DataFrame:
    """Assign each document its start offset and bin id in the packed
    per-shard token stream.

    One window shuffle on the shard key (shards pack independently and
    in parallel — exactly how a production packer distributes; a GLOBAL
    packing order would serialize into one partition). All integer
    arithmetic over a total order (order_col unique per shard), so the
    layout is deterministic on any engine at any parallelism.

    Returns order_col, shard_col, tokens_col, start_offset (tokens
    before this doc in its shard's stream), bin_id (floor division by
    cap), bin_spill (tokens of this doc that straddle past its bin's
    end — 0 when it fits; the trainer's split point)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("start_offset")
    out = df.select(order_col, shard_col, tokens_col, start)
    end_in_bin = (F.col("start_offset") % cap) + F.col(tokens_col)
    return out.select(
        order_col,
        shard_col,
        tokens_col,
        "start_offset",
        F.floor(F.col("start_offset") / cap).alias("bin_id"),
        F.greatest(F.lit(0), end_in_bin - cap).alias("bin_spill"),
    )
