"""Per-file Bloom-filter file skipping (Delta bloom-index analog).

``set_bloom_filter(table, cols)`` records, beside each NEW file's
min/max stats, an m-bit/k-hash bitset of the column's values (one
column-pruned Spark job per write, stored under the reserved
``__bloom`` stats key so every stats-carrying rewrite path propagates
it for free). Equality probes — ``prune={col: (v, v)}`` and the
``col = v`` bounds ``derive_prune_bounds`` feeds DML — skip files
whose bitset provably lacks the value: sharper than min/max on
high-cardinality identifiers whose per-file ranges all overlap.
Strict superset contract: pre-config files (no bitset) and missing
columns always keep the file.
"""

import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import Warehouse


def _wh(spark, tmp_path, name="w"):
    root = os.path.join(str(tmp_path), name)
    os.makedirs(root, exist_ok=True)
    return Warehouse(spark, root)


def _seed_interleaved(spark, wh, base=0, files=6, per=40, table="ev"):
    """`files` one-file commits whose id ranges ALL overlap (ids
    interleave mod `files`), so min/max pruning can never separate
    them — only the bloom can."""
    with wh.transaction() as t:
        for f in range(files):
            ids = [base + f + files * j for j in range(per)]
            t.append(spark.createDataFrame(
                [(i, f"u{i}") for i in ids],
                "id int, uid string").coalesce(1), table)


def test_point_probe_skips_to_one_file(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    # configure FIRST so every file carries a bitset
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(0, "u0")],
                                       "id int, uid string"), "ev")
    wh.set_bloom_filter("ev", ["id", "uid"])
    _seed_interleaved(spark, wh, base=100)

    # min/max alone keeps all 6 interleaved files; bloom narrows to 1
    df = wh.read("ev", prune={"id": (103, 103)})
    assert len(df.inputFiles()) <= 2  # 1 bloom hit (+ tiny seed file)
    assert df.where("id = 103").count() == 1

    # string column probe
    df2 = wh.read("ev", prune={"uid": ("u217", "u217")})
    assert len(df2.inputFiles()) <= 2
    assert df2.where("uid = 'u217'").count() == 1

    # absent value: every bloom-covered file skipped
    df3 = wh.read("ev", prune={"id": (99999, 99999)})
    assert df3.count() == 0


def test_never_a_false_prune(spark, tmp_path):
    """Every present value must be found through a bloom-pruned read —
    ints at both ends, strings, and a value in each file."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(0, "u0")],
                                       "id int, uid string"), "ev")
    wh.set_bloom_filter("ev", ["id", "uid"])
    _seed_interleaved(spark, wh, base=100, files=6, per=40)
    for probe in (100, 101, 102, 103, 104, 105, 334, 339):
        got = wh.read("ev", prune={"id": (probe, probe)}) \
                .where(F.col("id") == probe).count()
        assert got == 1, f"id {probe} lost by bloom pruning"
    for probe in ("u100", "u333"):
        got = wh.read("ev", prune={"uid": (probe, probe)}) \
                .where(F.col("uid") == probe).count()
        assert got == 1, f"uid {probe} lost by bloom pruning"


def test_preconfig_files_always_kept(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed_interleaved(spark, wh, base=0, files=4)
    wh.set_bloom_filter("ev", ["id"])
    # old files carry no bitset: a mid-range equality probe (inside
    # every file's [min, max]) keeps all of them
    df = wh.read("ev", prune={"id": (17, 17)})
    assert len(df.inputFiles()) == 4
    assert df.where("id = 17").count() == 1


def test_compact_backfills_blooms(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    _seed_interleaved(spark, wh, base=0, files=4)
    wh.set_bloom_filter("ev", ["id"])
    wh.compact("ev", target_files_per_partition=4)
    st = wh._manifest_stats("ev")
    assert st and all("__bloom" in v for v in st.values())
    # and probes stay exact
    assert wh.read("ev", prune={"id": (13, 13)}) \
             .where("id = 13").count() == 1


def test_dml_derived_equality_uses_bloom(spark, tmp_path):
    """DELETE WHERE id = v derives (v, v) bounds; with blooms the
    find-touched-files scan starts from the bloom-matched candidates
    and the delete stays exact."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(0, "u0")],
                                       "id int, uid string"), "ev")
    wh.set_bloom_filter("ev", ["id"])
    _seed_interleaved(spark, wh, base=100)
    n = wh.delete_where("ev", "id = 217")
    assert n == 1
    assert wh.read("ev").where("id = 217").count() == 0
    assert wh.read("ev").count() == 240  # 1 seed + 240 - 1


def test_config_survives_replay_and_checkpoint(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(0, "u0")],
                                       "id int, uid string"), "ev")
    wh.set_bloom_filter("ev", ["id"], m=4096, k=4)
    wh.write_checkpoint()
    wh2 = Warehouse(spark, wh.root)
    cfg = wh2.table_bloom_filter("ev")
    assert cfg["m"] == 4096 and cfg["k"] == 4 and cfg["cols"] == ["id"]
    # writes through the fresh instance record bitsets
    wh2.append(spark.createDataFrame([(7, "u7")],
                                     "id int, uid string"), "ev")
    st = wh2._manifest_stats("ev")
    assert any("__bloom" in v for v in st.values())


def test_config_validation(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(0, "u0")],
                                       "id int, uid string"), "ev")
    with pytest.raises(ValueError, match="not columns"):
        wh.set_bloom_filter("ev", ["nope"])
    with pytest.raises(ValueError, match="multiple of 8"):
        wh.set_bloom_filter("ev", ["id"], m=1001)


def test_type_coercion_probe(spark, tmp_path):
    """Probe values are cast to the COLUMN's type before hashing: an
    int probe against a double column (or a string probe against an
    int column) still matches the written canonicalization."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(1.0, 5)],
                                       "d double, i int"), "ev")
    wh.set_bloom_filter("ev", ["d", "i"])
    with wh.transaction() as t:
        for v in range(10, 16):
            t.append(spark.createDataFrame(
                [(float(v), v)], "d double, i int").coalesce(1), "ev")
    # int probe against the double column
    df = wh.read("ev", prune={"d": (12, 12)})
    assert df.where("d = 12.0").count() == 1
    # string probe against the int column
    df2 = wh.read("ev", prune={"i": ("13", "13")})
    assert df2.where("i = 13").count() == 1


def test_reconfig_with_different_geometry_refused(spark, tmp_path):
    """Existing bitsets were built under (m, k); probing them under a
    different geometry would crash or silently false-prune — the
    reconfig is refused (column changes with the same m/k are fine)."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame([(0, "u0")],
                                       "id int, uid string"), "ev")
    wh.set_bloom_filter("ev", ["id"], m=4096, k=4)
    with pytest.raises(ValueError, match="already has a bloom config"):
        wh.set_bloom_filter("ev", ["id"], m=8192, k=4)
    with pytest.raises(ValueError, match="already has a bloom config"):
        wh.set_bloom_filter("ev", ["id"], m=4096, k=6)
    # same geometry, different columns: allowed
    wh.set_bloom_filter("ev", ["id", "uid"], m=4096, k=4)
    assert wh.table_bloom_filter("ev")["cols"] == ["id", "uid"]


def test_stale_geometry_blob_treated_as_missing():
    """A bitset whose size disagrees with the probing m must be
    ignored (kept file), never indexed out of range or false-pruned."""
    import base64

    from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
        _file_may_match,
    )

    blob_512 = base64.b64encode(bytes(64)).decode()  # 512-bit, all 0
    fs = {"__bloom": {"id": blob_512}}
    # probe under m=8192: positions may exceed 512 bits — blob skipped,
    # file KEPT (an all-zero matching-size blob would prune it)
    assert _file_may_match("f.parquet", fs, {"id": (5, 5)},
                           {"id": (8192, [1, 4000, 8000])})
    # matching-size all-zero blob: provably absent -> pruned
    assert not _file_may_match("f.parquet", fs, {"id": (5, 5)},
                               {"id": (512, [1, 200, 500])})


def test_timestamp_probe_stable_across_session_timezone(spark, tmp_path):
    """Timestamp blooms hash the absolute instant (unix_micros), so a
    reader in a different session timezone still finds the row — the
    legacy cast(string) canonicalization rendered the WRITER's session
    wall clock and would false-prune here."""
    wh = _wh(spark, tmp_path)
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # WRITE (and record bitsets) under New York time
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with wh.transaction() as t:
            t.append(spark.createDataFrame(
                [(0, "2021-03-01 00:00:00")],
                "id int, s string").selectExpr(
                    "id", "cast(s as timestamp) as ts"), "ev")
        wh.set_bloom_filter("ev", ["ts"])
        assert wh.table_bloom_filter("ev")["ts"] == "micros"
        with wh.transaction() as t:
            for h in (1, 2, 3):
                # NY wall clock 1h:00 == UTC 1h+5:00 (March 1: EST? no,
                # EST until Mar 14 2021 -> UTC-5)
                t.append(spark.createDataFrame(
                    [(10 + h, f"2021-03-01 1{h}:00:00")],
                    "id int, s string").selectExpr(
                        "id", "cast(s as timestamp) as ts"
                    ).coalesce(1), "ev")
        # READ under UTC with UTC-instant bounds in the manifest's own
        # aware-isoformat form: the 11:00-NY row is the 16:00-UTC
        # instant
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        iso = "2021-03-01T16:00:00+00:00"
        df = wh.read("ev", prune={"ts": (iso, iso)})
        assert df.where("ts = '2021-03-01 16:00:00'").count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
