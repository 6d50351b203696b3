"""Corner semantics for the round-6 curation operators (oracle parity
covers the happy path at sf0.01; these pin the corners the testdata
never hits)."""

from __future__ import annotations

from etl_pipeline_for_detection_banking_fraud_spark.operators import dedup, linkage, sampling


class TestContainmentPairs:
    def test_excerpt_fully_contained_low_jaccard(self, spark):
        """The operator's reason to exist: a short excerpt inside a long
        doc scores containment 1.0 while Jaccard stays below any usable
        threshold."""
        long_words = " ".join(f"w{i}" for i in range(200))
        excerpt = " ".join(f"w{i}" for i in range(40, 50))
        df = spark.createDataFrame(
            [(1, long_words), (2, excerpt), (3, "completely unrelated text here")],
            "doc_id long, text string",
        )
        got = dedup.containment_pairs(df, threshold=0.9).collect()
        assert len(got) == 1
        row = got[0]
        assert (row["id_a"], row["id_b"]) == (1, 2)
        assert row["containment"] == 1.0
        # the same pair is invisible to Jaccard at the catalog threshold
        jac = dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()
        assert all((r["id_a"], r["id_b"]) != (1, 2) for r in jac)

    def test_symmetric_direction(self, spark):
        """min(|A|,|B|) containment is order-free: which doc has the
        smaller set must not depend on id order."""
        long_words = " ".join(f"w{i}" for i in range(200))
        excerpt = " ".join(f"w{i}" for i in range(40, 50))
        df = spark.createDataFrame(
            [(2, long_words), (1, excerpt)], "doc_id long, text string"
        )
        got = dedup.containment_pairs(df, threshold=0.9).collect()
        assert len(got) == 1 and got[0]["containment"] == 1.0


class TestWeightedSample:
    def test_partition_independent_and_exact_k(self, spark):
        df = spark.createDataFrame(
            [(i, (i % 7) + 1) for i in range(500)], "doc_id long, w long"
        )
        a = sampling.weighted_sample(df.repartition(1), 50, "w")
        b = sampling.weighted_sample(df.repartition(13), 50, "w")
        sa = sorted(r["doc_id"] for r in a.collect())
        sb = sorted(r["doc_id"] for r in b.collect())
        assert sa == sb and len(sa) == 50

    def test_nonpositive_weights_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 0), (2, -5), (3, None), (4, 10), (5, 10)],
            "doc_id long, w long",
        )
        got = sorted(
            r["doc_id"] for r in sampling.weighted_sample(df, 10, "w").collect()
        )
        assert got == [4, 5]

    def test_weight_bias(self, spark):
        """A row with overwhelming weight is (nearly) always selected:
        u^(1/w) -> 1 as w grows. Deterministic check with one heavy row
        against many light ones."""
        rows = [(i, 1) for i in range(200)] + [(999, 1_000_000)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = {r["doc_id"] for r in sampling.weighted_sample(df, 20, "w").collect()}
        assert 999 in got


class TestFuzzyMatchPairs:
    def test_blocking_and_threshold(self, spark):
        df = spark.createDataFrame(
            [
                (1, "blue widget", "B1"),
                (2, "blue widgey", "B1"),   # distance 1, same block
                (3, "blue widget", "B2"),   # identical text, OTHER block
                (4, "red gizmo", "B1"),     # same block, far away
            ],
            "id long, name string, brand string",
        )
        got = [
            (r["id_a"], r["id_b"], r["distance"])
            for r in linkage.fuzzy_match_pairs(
                df, "id", "name", ["brand"], max_distance=2
            ).collect()
        ]
        assert got == [(1, 2, 1)]  # cross-block identical pair NOT compared

    def test_null_text_never_matches(self, spark):
        df = spark.createDataFrame(
            [(1, None, "B"), (2, "x", "B"), (3, None, "B")],
            "id long, name string, brand string",
        )
        assert (
            linkage.fuzzy_match_pairs(df, "id", "name", ["brand"], 5).count() == 0
        )


class TestKeepCanonical:
    def test_one_survivor_per_cluster(self, spark):
        df = spark.createDataFrame(
            [(i, f"d{i}") for i in (1, 2, 3, 7, 9)], "doc_id long, text string"
        )
        # clusters {1,2,3} (transitively) and {7,9}; min-id canonical
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
        )
        got = sorted(r["doc_id"] for r in
                     dedup.keep_canonical(df, pairs).collect())
        assert got == [1, 7]

    def test_unpaired_docs_untouched(self, spark):
        df = spark.createDataFrame([(i, "x") for i in range(10)],
                                   "doc_id long, text string")
        pairs = spark.createDataFrame([(3, 4)], "id_a long, id_b long")
        got = sorted(r["doc_id"] for r in
                     dedup.keep_canonical(df, pairs).collect())
        assert got == [0, 1, 2, 3, 5, 6, 7, 8, 9]  # only 4 dropped


class TestLeakageSafeSplit:
    def test_cluster_members_share_split_and_partition_invariance(self, spark):
        df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
        # chain 10-11-12 plus pair 100-250: all constrained
        pairs = spark.createDataFrame(
            [(10, 11), (11, 12), (100, 250)], "id_a long, id_b long"
        )
        out = {r["doc_id"]: r["split"] for r in
               sampling.leakage_safe_split(df, pairs).collect()}
        assert len(out) == 300
        assert out[10] == out[11] == out[12]
        assert out[100] == out[250]
        # every split non-empty at n=300 and fractions roughly honored
        from collections import Counter
        c = Counter(out.values())
        assert set(c) == {"train", "val", "test"}
        assert c["train"] > c["val"] and c["train"] > c["test"]
        # partition-independent determinism
        out2 = {r["doc_id"]: r["split"] for r in
                sampling.leakage_safe_split(df.repartition(17), pairs).collect()}
        assert out == out2
