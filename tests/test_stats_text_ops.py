"""Unit semantics for the round-6 additions: char entropy, PII
redaction, BM25, z-score outliers, median/MAD, salted join parity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.operators import scale, stats, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCharEntropy:
    def test_known_values(self, spark):
        df = _docs(spark, [
            (1, "aaaa"),            # one symbol -> H = 0
            (2, "abab"),            # two equiprobable -> H = 1
            (3, "abcd"),            # four equiprobable -> H = 2
            (4, "  a   b  "),       # ws-normalized to "a b": H over {a,' ',b}
        ])
        got = {r["doc_id"]: r for r in text.char_entropy(df).collect()}
        assert got[1]["char_entropy"] == pytest.approx(0.0)
        assert got[2]["char_entropy"] == pytest.approx(1.0)
        assert got[3]["char_entropy"] == pytest.approx(2.0)
        assert got[4]["n_chars_norm"] == 3
        assert got[4]["char_entropy"] == pytest.approx(math.log2(3))
        assert got[3]["n_distinct_chars"] == 4

    def test_empty_text(self, spark):
        got = text.char_entropy(_docs(spark, [(1, "")])).collect()[0]
        assert got["n_chars_norm"] == 0
        assert got["char_entropy"] == 0.0


class TestPiiRedact:
    def test_redaction_and_counts(self, spark):
        df = _docs(spark, [
            (1, "mail a.b@example.com and c@d.org now"),
            (2, "server 10.0.255.1 answered"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "clean text with no pii at all"),
        ])
        got = {r["doc_id"]: r for r in text.pii_redact(df).collect()}
        assert got[1]["n_email"] == 2
        assert got[1]["redacted"] == "mail <EMAIL> and <EMAIL> now"
        assert got[2]["n_ipv4"] == 1
        assert got[2]["redacted"] == "server <IP> answered"
        assert got[3]["n_phone"] == 1
        assert "<PHONE>" in got[3]["redacted"]
        assert got[4]["redacted"] == "clean text with no pii at all"
        assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (0, 0, 0)

    def test_email_digits_not_double_counted_as_phone(self, spark):
        # the email's digit run must not survive into the phone count
        df = _docs(spark, [(1, "reach 123456789a@example.com ok")])
        got = text.pii_redact(df).collect()[0]
        assert got["n_email"] == 1
        assert got["n_phone"] == 0


class TestBm25:
    def test_ranks_higher_tf_higher(self, spark):
        df = _docs(spark, [
            (1, "spark spark spark row row"),
            (2, "spark row row row row"),
            (3, "row row row row row"),
        ])
        out = text.bm25_topk(df, ["spark"], k=3).collect()
        assert [r["doc_id"] for r in out] == [1, 2, 3]
        assert out[0]["bm25"] > out[1]["bm25"] > out[2]["bm25"]
        # doc 3 has zero tf -> zero score
        assert out[2]["bm25"] == pytest.approx(0.0)

    def test_k_limits_and_tiebreak(self, spark):
        df = _docs(spark, [(i, "spark alike") for i in range(1, 6)])
        out = text.bm25_topk(df, ["spark"], k=3).collect()
        # identical scores -> doc_id ascending tie-break, top 3 only
        assert [r["doc_id"] for r in out] == [1, 2, 3]


class TestZscoreOutliers:
    def test_flags_only_extreme_rows(self, spark):
        rows = [(i, 1, 100.0) for i in range(9)] + [(9, 1, 1000.0)]
        df = spark.createDataFrame(rows, "oid long, key long, amount double")
        out = stats.zscore_outliers(
            df, key_col="key", value_col="amount", id_col="oid",
            threshold=2.0, min_n=5,
        ).collect()
        assert [r["oid"] for r in out] == [9]
        assert out[0]["n_in_group"] == 10
        assert out[0]["zscore"] > 2.0

    def test_min_n_suppresses_small_groups(self, spark):
        df = spark.createDataFrame(
            [(1, 1, 0.0), (2, 1, 100.0)], "oid long, key long, amount double"
        )
        assert stats.zscore_outliers(
            df, "key", "amount", "oid", min_n=5
        ).count() == 0


class TestGroupMedianMad:
    def test_known_median_mad(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
             ("b", 10.0), ("b", 20.0)],
            "k string, v double",
        )
        got = {r["k"]: r for r in stats.group_median_mad(df, "k", "v").collect()}
        assert got["a"]["med"] == pytest.approx(3.0)
        # |x-3| = [2,1,0,1,97] -> median 1
        assert got["a"]["mad"] == pytest.approx(1.0)
        assert got["a"]["n"] == 5
        # even-count group interpolates
        assert got["b"]["med"] == pytest.approx(15.0)
        assert got["b"]["mad"] == pytest.approx(5.0)


class TestSaltedJoinParity:
    def test_matches_plain_join(self, spark):
        big = spark.range(0, 2000).select(
            (F.col("id") % 7).alias("k"), F.col("id").alias("rid")
        )
        small = spark.createDataFrame(
            [(i, f"dim{i}") for i in range(7)], "k long, name string"
        )
        salted = scale.salted_join(big, small, "k", salt_buckets=8)
        plain = big.join(small, "k")
        assert salted.count() == plain.count() == 2000
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0
