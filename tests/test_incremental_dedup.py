"""Incremental MinHash dedup vs a persisted signature index.

The VERDICT r3 scale gap: a real 100 TB curation pipeline deduplicates
a daily delta against a persisted index instead of re-hashing the
corpus. Differential contract: the incremental operator must return
EXACTLY the pairs the batch operator finds on corpus ∪ delta that
involve >= 1 delta doc — tested on a day-1-corpus/day-2-delta split of
the testdata documents, plus the persisted-index round-trip with its
partition-pruned read.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # e2e/streaming/property lane

from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.operators import dedup


def _split(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)
    return docs, corpus, delta


def _batch_pairs_involving_delta(docs):
    batch = dedup.minhash_lsh_pairs(docs)
    return {
        (r.id_a, r.id_b, r.n_shared_bands)
        for r in batch.where(
            (F.col("id_a") % 10 == 0) | (F.col("id_b") % 10 == 0)
        ).collect()
    }


def test_incremental_matches_batch(spark, sf001):
    docs, corpus, delta = _split(spark, sf001)
    expected = _batch_pairs_involving_delta(docs)
    assert expected, "fixture must plant near-dup pairs touching the delta"

    index = dedup.minhash_band_index(corpus)
    incr = dedup.minhash_lsh_pairs_incremental(delta, index)
    got = {(r.id_a, r.id_b, r.n_shared_bands) for r in incr.collect()}
    assert got == expected


def test_incremental_against_persisted_index_prunes_partitions(spark, sf001, tmp_path):
    """Round-trip through write_band_index/read_band_index_for: same
    pairs, and the index scan carries a partition filter on the key
    prefix — the read literally touches only delta-addressable
    directories."""
    docs, corpus, delta = _split(spark, sf001)
    expected = _batch_pairs_involving_delta(docs)

    path = str(tmp_path / "band_index")
    dedup.write_band_index(dedup.minhash_band_index(corpus), path)

    delta_entries = dedup.minhash_band_index(delta)
    index = dedup.read_band_index_for(spark, path, delta_entries)
    plan = index._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_kp" in plan

    incr = dedup.minhash_lsh_pairs_incremental(delta, index)
    got = {(r.id_a, r.id_b, r.n_shared_bands) for r in incr.collect()}
    assert got == expected


def test_incremental_hot_bucket_guard(spark, sf001):
    """max_bucket drops over-threshold buckets BEFORE the collect, same
    contract as the batch guard: with a tiny cap most pairs disappear
    but the operator still completes and returns a subset."""
    docs, corpus, delta = _split(spark, sf001)
    index = dedup.minhash_band_index(corpus)
    unguarded = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs_incremental(delta, index).collect()
    }
    guarded = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs_incremental(
            delta, index, max_bucket=2
        ).collect()
    }
    assert guarded <= unguarded


def test_day_over_day_index_maintenance(spark, sf001, tmp_path):
    """The full daily loop across TWO deltas: day-2's entries are folded
    into the persisted index (append_band_index), so day-3's incremental
    pairs must equal the batch pairs involving day-3 docs over
    corpus ∪ day-2 ∪ day-3 — including day3-day2 pairs that exist only
    because the index was maintained."""
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 10 <= 7)
    d2 = docs.where(F.col("doc_id") % 10 == 8)
    d3 = docs.where(F.col("doc_id") % 10 == 9)

    batch = dedup.minhash_lsh_pairs(docs)
    expected = {
        (r.id_a, r.id_b, r.n_shared_bands)
        for r in batch.where(
            (F.col("id_a") % 10 == 9) | (F.col("id_b") % 10 == 9)
        ).collect()
    }
    assert expected, "fixture must plant near-dup pairs touching day 3"

    path = str(tmp_path / "band_index")
    dedup.write_band_index(dedup.minhash_band_index(corpus), path)

    # day 2: dedup delta vs index, then fold its entries in
    d2_entries = dedup.minhash_band_index(d2)
    dedup.minhash_lsh_pairs_incremental(
        d2, dedup.read_band_index_for(spark, path, d2_entries)
    ).collect()
    dedup.append_band_index(d2_entries, path)

    # day 3: the maintained index must surface day3-day2 pairs too
    d3_entries = dedup.minhash_band_index(d3)
    got = {
        (r.id_a, r.id_b, r.n_shared_bands)
        for r in dedup.minhash_lsh_pairs_incremental(
            d3, dedup.read_band_index_for(spark, path, d3_entries)
        ).collect()
    }
    assert got == expected


def test_ngram_incremental_matches_batch(spark, sf001):
    """Jaccard sibling of the minhash differential: the incremental
    operator over the corpus's persisted inverted index must return
    EXACTLY the batch Jaccard pairs involving delta docs — same values
    (n_inter, jaccard), not just the same ids."""
    docs, corpus, delta = _split(spark, sf001)
    batch = dedup.ngram_jaccard_pairs(docs, threshold=0.1)
    expected = {
        (r.id_a, r.id_b, r.n_inter, round(r.jaccard, 9))
        for r in batch.where(
            (F.col("id_a") % 10 == 0) | (F.col("id_b") % 10 == 0)
        ).collect()
    }
    assert expected, "fixture must plant near-dup pairs touching the delta"

    incr = dedup.ngram_jaccard_pairs_incremental(
        delta, dedup.ngram_shingle_index(corpus), threshold=0.1
    )
    got = {
        (r.id_a, r.id_b, r.n_inter, round(r.jaccard, 9)) for r in incr.collect()
    }
    assert got == expected


def test_index_compaction_preserves_pairs_and_bounds_files(spark, sf001, tmp_path):
    """90 simulated daily appends -> one file set per touched prefix per
    day (the small-files problem); compact_band_index folds each prefix
    back to one file with IDENTICAL incremental-dedup results."""
    import glob
    import os

    docs, corpus, delta = _split(spark, sf001)
    path = str(tmp_path / "band_index")
    dedup.write_band_index(dedup.minhash_band_index(corpus), path)

    # simulate daily maintenance: re-append tiny disjoint slices of the
    # corpus index (same layout as real day-folds; ids shifted so the
    # delta contract holds)
    base = dedup.minhash_band_index(corpus).localCheckpoint()
    for day in range(12):
        slice_day = base.where(F.col("doc_id") % 37 == day).withColumn(
            "doc_id", F.col("doc_id") + (1_000_000 + day * 10_000)
        )
        dedup.append_band_index(slice_day, path)

    delta_entries = dedup.minhash_band_index(delta)
    before_files = glob.glob(os.path.join(path, "_kp=*", "*.parquet"))
    idx_before = dedup.read_band_index_for(spark, path, delta_entries)
    pairs_before = {
        tuple(r) for r in dedup.minhash_lsh_pairs_incremental(
            delta, idx_before
        ).collect()
    }

    dedup.compact_band_index(spark, path)

    after_files = glob.glob(os.path.join(path, "_kp=*", "*.parquet"))
    assert len(after_files) < len(before_files)
    # bounded: exactly one file per prefix partition now
    per_prefix: dict[str, int] = {}
    for f in after_files:
        kp = os.path.basename(os.path.dirname(f))
        per_prefix[kp] = per_prefix.get(kp, 0) + 1
    assert max(per_prefix.values()) == 1

    idx_after = dedup.read_band_index_for(spark, path, delta_entries)
    pairs_after = {
        tuple(r) for r in dedup.minhash_lsh_pairs_incremental(
            delta, idx_after
        ).collect()
    }
    assert pairs_after == pairs_before
    # partition pruning survives compaction
    plan = idx_after._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_kp" in plan


def test_index_retirement_removes_docs(spark, sf001, tmp_path):
    """retire_from_band_index removes exactly the given ids' entries:
    pairs involving retired corpus docs disappear, every other pair
    survives, and re-ingesting a retired doc as a delta doesn't
    self-pair. Idempotent on re-run."""
    docs, corpus, delta = _split(spark, sf001)
    path = str(tmp_path / "band_index")
    dedup.write_band_index(dedup.minhash_band_index(corpus), path)

    delta_entries = dedup.minhash_band_index(delta)
    idx = dedup.read_band_index_for(spark, path, delta_entries)
    before = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs_incremental(delta, idx).collect()
    }
    assert before

    # retire every corpus doc that currently pairs with the delta
    retired_ids = sorted({i for pair in before for i in pair if i % 10 != 0})
    assert retired_ids
    ids_df = spark.createDataFrame([(i,) for i in retired_ids], "doc_id long")
    dedup.retire_from_band_index(spark, path, ids_df)

    idx2 = dedup.read_band_index_for(spark, path, delta_entries)
    after = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs_incremental(delta, idx2).collect()
    }
    survivors = {
        p for p in before
        if not any(i in retired_ids for i in p)
    }
    assert after == survivors

    # idempotent
    dedup.retire_from_band_index(spark, path, ids_df)
    idx3 = dedup.read_band_index_for(spark, path, delta_entries)
    again = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs_incremental(delta, idx3).collect()
    }
    assert again == survivors

    # re-ingestion flow: retired docs re-enter as a delta against the
    # cleaned index without meeting their own stale entries
    reingest = corpus.where(F.col("doc_id").isin(retired_ids))
    re_pairs = dedup.minhash_lsh_pairs_incremental(
        reingest, dedup.read_band_index_for(
            spark, path, dedup.minhash_band_index(reingest)
        ),
    )
    assert re_pairs.where(F.col("id_a") == F.col("id_b")).count() == 0
