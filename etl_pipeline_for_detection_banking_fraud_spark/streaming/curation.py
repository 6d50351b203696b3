"""Streaming corpus curation: near-dup-filtered document ingestion.

The streaming form of the daily incremental-dedup loop
(`operators.dedup.minhash_lsh_pairs_incremental` + the persisted band
index): documents arrive as a stream, each microbatch is near-dup
checked against everything ingested so far, and only novel documents
land in the corpus — with the corpus table and the band index updated
in ONE atomic commit-log transaction so crash/replay can never tear
them apart.

Exactly-once: foreachBatch is at-least-once (a crash after the commit
but before Spark's checkpoint advances re-delivers the batch). Here
the re-delivered batch's documents are already IN the band index, so
each doc collides with itself (a self-pair), classifies as a
duplicate, and is dropped — the commit-log atomicity guarantees the
index and corpus can't disagree about which docs made it in. No
markers needed: the index IS the idempotence ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup

_INDEX_PREFIX_LEN = 2


def ingest_batch(batch: DataFrame, wh, out_table: str, index_table: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 num_hashes: int = 8, bands: int = 4,
                 max_bucket: int | None = 64) -> None:
    """Ingest one batch of documents with near-dup filtering (the
    foreachBatch body; callable directly for batch backfills).

    A document is dropped when it (a) near-dup matches any already-
    ingested document (band collision against the index), or (b)
    matches a smaller-id document in the same batch (min-id canonical,
    same survivor rule as ``dedup.keep_canonical``). Survivors append
    to ``out_table`` and their band entries to ``index_table`` inside
    one atomic transaction.

    Scale shape: the index read is partition-pruned to the batch's
    touched key prefixes (bounded 16^prefix_len control-plane collect);
    the pair expansion is the incremental O(delta + touched buckets)
    path — the corpus is never re-hashed, never re-shuffled.
    """
    batch = batch.dropDuplicates([id_col]).localCheckpoint()
    if not batch.take(1):
        return
    delta_entries = dedup.minhash_band_index(
        batch, text_col, id_col, num_hashes, bands
    ).localCheckpoint()

    if wh.exists(index_table):
        prefixes = [
            r["_p"]
            for r in delta_entries.select(
                F.substring("key", 1, _INDEX_PREFIX_LEN).alias("_p")
            ).distinct().collect()
        ]
        index = (
            wh.read(index_table)
            .where(F.col("kp").isin(prefixes))
            .drop("kp")
        )
    else:
        index = delta_entries.limit(0)

    pairs = dedup.minhash_lsh_pairs_incremental(
        batch, index, text_col, id_col, num_hashes, bands,
        max_bucket=max_bucket,
    )
    batch_ids = batch.select(F.col(id_col).alias("_bid"))
    flagged = (
        pairs.join(
            batch_ids.withColumnRenamed("_bid", "id_a").withColumn(
                "a_in_batch", F.lit(True)
            ),
            "id_a", "left",
        )
        .join(
            batch_ids.withColumnRenamed("_bid", "id_b").withColumn(
                "b_in_batch", F.lit(True)
            ),
            "id_b", "left",
        )
        .select(
            "id_a", "id_b",
            F.coalesce("a_in_batch", F.lit(False)).alias("a_in_batch"),
            F.coalesce("b_in_batch", F.lit(False)).alias("b_in_batch"),
        )
    )
    # corpus match -> drop the batch side; batch-batch -> drop max id
    # (covers the re-delivery self-pair (x, x): both in batch, drop x)
    drops = (
        flagged.where(F.col("a_in_batch") & F.col("b_in_batch"))
        .select(F.greatest("id_a", "id_b").alias(id_col))
        .unionByName(
            flagged.where(F.col("a_in_batch") & ~F.col("b_in_batch"))
            .select(F.col("id_a").alias(id_col))
        )
        .unionByName(
            flagged.where(~F.col("a_in_batch") & F.col("b_in_batch"))
            .select(F.col("id_b").alias(id_col))
        )
        .distinct()
    )
    novel = batch.join(drops, id_col, "left_anti")
    novel_entries = delta_entries.join(
        novel.select(id_col), id_col, "left_semi"
    ).withColumn("kp", F.substring("key", 1, _INDEX_PREFIX_LEN))
    with wh.transaction():
        wh.append(novel, out_table)
        wh.append(novel_entries, index_table, partition_by=["kp"])


def stream_dedup_ingest(docs_stream: DataFrame, wh, checkpoint_dir: str,
                        out_table: str = "corpus_docs",
                        index_table: str = "corpus_band_index",
                        text_col: str = "text", id_col: str = "doc_id",
                        num_hashes: int = 8, bands: int = 4,
                        max_bucket: int | None = 64):
    """Start the streaming near-dup ingest: microbatches of documents
    flow through ``ingest_batch`` into an atomically-maintained
    (corpus, band index) pair. See the module docstring for the
    exactly-once argument."""

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch_df, wh, out_table, index_table,
            text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, max_bucket=max_bucket,
        )

    return (
        docs_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
