"""Document chunking for retrieval / training pipelines: split each
document's token stream into fixed-size overlapping windows (the
standard RAG / context-window packing preprocessing step).

Beyond-reference operator (the reference has no text surface); pairs
with ``packing.pack_sequences`` (greedy bin-packing of whole docs) —
chunking is the other half: docs BIGGER than the window get split.

Scale shape: pure per-row higher-order functions (split / sequence /
slice) + one posexplode — no shuffle at all, no UDFs; output size is
``ceil(n_tokens / stride)`` rows per doc, fully streaming through
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_tokens(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", size: int = 64,
                 stride: int = 48) -> DataFrame:
    """Overlapping token-window chunks per document.

    Chunk ``k`` covers tokens ``[k*stride, k*stride + size)`` (0-based,
    last chunk clipped); chunk starts are every ``stride`` tokens while
    ``start < n_tokens``, so consecutive chunks overlap by
    ``size - stride`` tokens. Empty documents yield no chunks.

    Returns (id, chunk_no, n_tokens, chunk_md5) — the md5 of the
    space-rejoined window, which is what a dedup-at-chunk-level pass
    keys on.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = df.select(F.col(id_col), tokens(text_col).alias("_tok"))
    n = F.size("_tok")
    # sequence() needs start <= stop for a positive step; guard n == 0
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = toks.select(
        F.col(id_col), F.col("_tok"),
        F.posexplode(starts).alias("chunk_no", "_start"),
    )
    chunk = F.slice(F.col("_tok"), F.col("_start") + 1, F.lit(size))
    return exploded.select(
        F.col(id_col),
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )
