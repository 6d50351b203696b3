"""Streaming near-dup ingest: within-batch canonical survival,
cross-batch index filtering, re-delivery idempotence, and atomic
corpus/index consistency."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    Warehouse,
)
from etl_pipeline_for_detection_banking_fraud_spark.streaming import curation

# Long repeated-phrase texts: identical text => identical minhash
# signature => all bands collide (deterministic near-dup); the novel
# texts share no 3-gram shingles with anything else.
A = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
B = "one two three four five six seven eight nine ten " * 5
C = "red orange yellow green blue indigo violet umber ochre teal " * 5
D = "north south east west up down left right front back " * 5


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


class TestIngestBatch:
    def test_within_batch_min_id_survives(self, spark, wh):
        curation.ingest_batch(
            _df(spark, [(1, A), (2, A), (3, B)]), wh,
            "corpus_docs", "corpus_band_index",
        )
        ids = sorted(r["doc_id"] for r in wh.read("corpus_docs").collect())
        assert ids == [1, 3]
        idx_ids = {r["doc_id"]
                   for r in wh.read("corpus_band_index").collect()}
        assert idx_ids == {1, 3}  # only survivors are indexed

    def test_cross_batch_dup_dropped_novel_kept(self, spark, wh):
        curation.ingest_batch(_df(spark, [(1, A), (3, B)]), wh,
                              "corpus_docs", "corpus_band_index")
        curation.ingest_batch(_df(spark, [(7, A), (8, C)]), wh,
                              "corpus_docs", "corpus_band_index")
        ids = sorted(r["doc_id"] for r in wh.read("corpus_docs").collect())
        assert ids == [1, 3, 8]

    def test_redelivery_is_idempotent(self, spark, wh):
        batch = _df(spark, [(1, A), (3, B)])
        curation.ingest_batch(batch, wh, "corpus_docs", "corpus_band_index")
        n_docs = wh.read("corpus_docs").count()
        n_idx = wh.read("corpus_band_index").count()
        # at-least-once re-delivery: every doc self-collides via the
        # index and drops; corpus and index stay exactly as they were
        curation.ingest_batch(batch, wh, "corpus_docs", "corpus_band_index")
        assert wh.read("corpus_docs").count() == n_docs
        assert wh.read("corpus_band_index").count() == n_idx

    def test_empty_batch_noop(self, spark, wh):
        curation.ingest_batch(_df(spark, []), wh,
                              "corpus_docs", "corpus_band_index")
        assert not wh.exists("corpus_docs")


@pytest.mark.slow
class TestStreamDedupIngest:
    def test_file_stream_end_to_end(self, spark, wh, tmp_path):
        src = tmp_path / "src"
        _df(spark, [(1, A), (2, A), (3, B)]).coalesce(1).write.parquet(
            str(src / "f1")
        )
        _df(spark, [(7, A), (8, C), (9, D)]).coalesce(1).write.parquet(
            str(src / "f2")
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = curation.stream_dedup_ingest(
            stream, wh, str(tmp_path / "ckpt")
        )
        q.processAllAvailable()
        q.stop()
        ids = sorted(r["doc_id"] for r in wh.read("corpus_docs").collect())
        # 2 dups A within/across batches dropped; 1,3,8,9 survive
        assert ids == [1, 3, 8, 9]
        # index covers exactly the survivors, 4 bands each
        idx = wh.read("corpus_band_index")
        per_doc = {
            r["doc_id"]: r["n"]
            for r in idx.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
        }
        assert per_doc == {1: 4, 3: 4, 8: 4, 9: 4}
