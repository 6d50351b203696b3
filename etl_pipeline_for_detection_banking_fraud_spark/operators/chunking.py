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
from pyspark.sql.window import Window

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


def dedup_chunks(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", size: int = 32) -> DataFrame:
    """Corpus-wide chunk-level (paragraph-level) deduplication — the
    Gopher/CCNet boilerplate-removal step at sub-document granularity:
    split each document into NON-overlapping ``size``-token chunks,
    keep only each distinct chunk's FIRST global occurrence (ordered by
    ``(id, chunk_no)`` — a total order, so survivors are deterministic
    under retries), and reassemble each document from its surviving
    chunks in order.

    Document-level dedup (``dedup.*``) misses repeated license
    headers / navigation boilerplate embedded in otherwise-unique
    documents; this pass removes the repeats while keeping the one
    canonical copy in the corpus.

    Returns ``(id, n_chunks, n_kept, text_clean)`` where ``text_clean``
    is the space-rejoined surviving chunks (``''`` when every chunk of
    a document was a repeat).

    Scale shape: chunking is scan-local codegen (no shuffle); the
    first-occurrence pass is ONE window hash-partitioned by chunk text
    (dup groups are tiny — no skew beyond a hot boilerplate chunk,
    which is exactly the row_number-over-bounded-group shape);
    reassembly is ONE groupBy the doc id. Two exchanges total, both
    sized by chunks, never all-pairs. collect_list here is per-DOCUMENT
    (bounded by doc length), not per-corpus.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    chunks = (
        df.select(F.col(id_col), tokens(text_col).alias("_tok"))
        .where(F.size("_tok") > 0)
        .select(
            F.col(id_col),
            F.posexplode(
                F.sequence(F.lit(0), F.size("_tok") - 1, F.lit(size))
            ).alias("chunk_no", "_start"),
            F.col("_tok"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.array_join(
                F.slice(F.col("_tok"), F.col("_start") + 1, F.lit(size)), " "
            ).alias("_chunk"),
        )
    )
    w = Window.partitionBy("_chunk").orderBy(id_col, "chunk_no")
    kept = chunks.withColumn("_rn", F.row_number().over(w))
    survivors = F.array_sort(
        F.collect_list(
            F.when(F.col("_rn") == 1,
                   F.struct(F.col("chunk_no"), F.col("_chunk")))
        )
    )
    return kept.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum((F.col("_rn") == 1).cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(survivors, lambda x: x["_chunk"]), " "
        ).alias("text_clean"),
    )
