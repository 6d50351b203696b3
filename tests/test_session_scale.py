"""The session factory's scale posture: the configs the 100 TB
deployment depends on are pinned (not silently defaulted)."""

from __future__ import annotations


def test_scale_configs_pinned(spark):
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    assert conf.get("spark.sql.parquet.filterPushdown") == "true"
    assert conf.get("spark.sql.parquet.compression.codec") == "zstd"
    assert conf.get("spark.sql.session.timeZone") == "UTC"
    excluded = conf.get("spark.sql.optimizer.excludedRules")
    assert "InferFiltersFromGenerate" in excluded


def test_zstd_roundtrip(spark, tmp_path):
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    df.write.parquet(str(tmp_path / "z"))
    import glob

    files = glob.glob(str(tmp_path / "z" / "*.zstd.parquet"))
    assert files, "parquet files are not zstd-compressed"
    assert spark.read.parquet(str(tmp_path / "z")).count() == 1000
