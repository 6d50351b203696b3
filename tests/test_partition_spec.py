"""Partition-spec evolution (round-12 verdict item #6).

``set_partition_spec(table, cols)`` is a metadata-only commit — the
Iceberg spec-evolution contract: writes from that commit on lay out
under the new spec, existing files keep the layout they were written
with (nothing is rewritten), reads union the layout groups losslessly
(a naive basePath read over mixed layouts makes Spark's partition
discovery silently DROP the off-layout files' rows), pruning stays
per-file, and ``compact()`` normalizes everything to the current spec.
"""

from __future__ import annotations

import json
import os

import pytest

from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import (
    Warehouse,
)


def _wh(spark, tmp_path, name="w"):
    root = os.path.join(str(tmp_path), name)
    os.makedirs(root, exist_ok=True)
    return Warehouse(spark, root)


def _seed_flat(spark, wh, table="ev", days=(1, 2)):
    rows = [(d * 100 + i, f"2021-03-0{d}", float(i))
            for d in days for i in range(5)]
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            rows, "id int, dt string, v double").coalesce(1), table)
    return rows


class TestSpecEvolution:
    def test_metadata_only_commit_and_future_writes(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        _seed_flat(spark, wh)
        files_before = wh._manifest_files("ev")
        wh.set_partition_spec("ev", ["dt"])
        # metadata-only: no file rewritten, spec recorded
        assert wh._manifest_files("ev") == files_before
        assert wh.table_partition_by("ev") == ["dt"]
        entry = json.load(open(os.path.join(
            wh.root, "_commitlog", f"{wh._latest_seq():09d}.json")))
        assert entry["partition_by"] == {"ev": ["dt"]}
        assert not entry["tables"]

        # a bare append now lands under the NEW spec without the caller
        # passing partition_by
        wh.append(spark.createDataFrame(
            [(301, "2021-03-03", 9.0)], "id int, dt string, v double"),
            "ev")
        new = [r for r in wh._manifest_files("ev")
               if r not in files_before]
        assert new and all(r.startswith("dt=2021-03-03") for r in new)

    def test_mixed_layout_read_is_lossless(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        rows = _seed_flat(spark, wh)
        wh.set_partition_spec("ev", ["dt"])
        wh.append(spark.createDataFrame(
            [(301, "2021-03-03", 9.0), (302, "2021-03-03", 8.0)],
            "id int, dt string, v double"), "ev")
        got = {(r["id"], r["dt"], r["v"])
               for r in wh.read("ev").collect()}
        want = set(rows) | {(301, "2021-03-03", 9.0),
                            (302, "2021-03-03", 8.0)}
        assert got == want
        # dt keeps its DECLARED type (string) across both layouts
        assert dict(wh.read("ev").dtypes)["dt"] == "string"

    def test_prune_across_mixed_layouts(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        wh2 = None
        # two flat files (day 1, day 2), then two hive files (days 3, 4)
        with _wh(spark, tmp_path).transaction():
            pass
        wh = _wh(spark, tmp_path, "w2")
        for d in (1, 2):
            with wh.transaction() as t:
                t.append(spark.createDataFrame(
                    [(d * 100 + i, f"2021-03-0{d}", float(i))
                     for i in range(5)],
                    "id int, dt string, v double").coalesce(1), "ev")
        wh.set_partition_spec("ev", ["dt"])
        for d in (3, 4):
            wh.append(spark.createDataFrame(
                [(d * 100 + i, f"2021-03-0{d}", float(i))
                 for i in range(5)],
                "id int, dt string, v double").coalesce(1), "ev")
        # point-prune a FLAT day: footer stats skip the other flat file
        # and every hive file
        df = wh.read("ev", prune={"dt": ("2021-03-02", "2021-03-02")})
        assert sorted(r["id"] for r in df.where(
            "dt = '2021-03-02'").collect()) == [200 + i for i in range(5)]
        assert len(df.inputFiles()) == 1
        # point-prune a HIVE day: path value skips everything else
        df = wh.read("ev", prune={"dt": ("2021-03-04", "2021-03-04")})
        assert len(df.inputFiles()) == 1
        assert sorted(r["id"] for r in df.collect()) == \
            [400 + i for i in range(5)]
        assert wh2 is None

    def test_compact_normalizes_to_current_spec(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        rows = _seed_flat(spark, wh)
        wh.set_partition_spec("ev", ["dt"])
        wh.append(spark.createDataFrame(
            [(301, "2021-03-03", 9.0)], "id int, dt string, v double"),
            "ev")
        wh.compact("ev")
        live = wh._manifest_files("ev")
        assert live and all(r.startswith("dt=") for r in live)
        got = {(r["id"], r["dt"], r["v"])
               for r in wh.read("ev").collect()}
        assert got == set(rows) | {(301, "2021-03-03", 9.0)}
        # post-compact the layout is uniform: single-group read path
        assert len({tuple(sorted(k for k in [seg.split("=")[0]
                    for seg in r.split(os.sep)[:-1]]))
                    for r in live}) == 1

    def test_evolve_back_to_flat(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        _seed_flat(spark, wh)
        wh.set_partition_spec("ev", ["dt"])
        wh.append(spark.createDataFrame(
            [(301, "2021-03-03", 9.0)], "id int, dt string, v double"),
            "ev")
        wh.set_partition_spec("ev", None)
        wh.append(spark.createDataFrame(
            [(401, "2021-03-04", 1.0)], "id int, dt string, v double"),
            "ev")
        new = [r for r in wh._manifest_files("ev") if "dt=" not in r]
        assert wh.read("ev").count() == 12
        assert len(new) >= 2  # the two flat seeds + the new flat file
        assert wh.table_partition_by("ev") == []

    def test_spec_survives_checkpoint_and_time_travel(self, spark,
                                                      tmp_path):
        wh = _wh(spark, tmp_path)
        _seed_flat(spark, wh)
        pre = wh._latest_seq()
        wh.set_partition_spec("ev", ["dt"])
        wh.write_checkpoint()
        cold = Warehouse(spark, wh.root)
        assert cold.table_partition_by("ev") == ["dt"]
        assert cold.last_replay_parsed == 0
        # time travel below the spec commit replays the old (derived)
        # spec: no recorded entry -> layout-derived keys (flat = none)
        assert cold._replay_state(at=pre)["partition_by"].get("ev") is None

    def test_guards(self, spark, tmp_path):
        wh = _wh(spark, tmp_path)
        _seed_flat(spark, wh)
        with pytest.raises(ValueError, match="not a column"):
            wh.set_partition_spec("ev", ["nope"])
        with pytest.raises(ValueError, match="reserved/hidden"):
            wh.set_partition_spec("ev", ["_hidden"])
        with pytest.raises(ValueError, match="duplicate"):
            wh.set_partition_spec("ev", ["dt", "DT"])
        with pytest.raises(ValueError, match="not commit-log tracked"):
            wh.set_partition_spec("ghost", ["dt"])
        # renamed column: physical path keys would not match
        wh.rename_column("ev", "v", "val")
        wh.add_columns("ev", {"v": "double"})  # re-add: mapped slot
        with pytest.raises(ValueError, match="physical-name mapping"):
            wh.set_partition_spec("ev", ["v"])

    def test_dml_respects_mixed_layout(self, spark, tmp_path):
        """A DELETE over a mixed-layout table rewrites the touched file
        in ITS layout group without losing the other group's rows."""
        wh = _wh(spark, tmp_path)
        rows = _seed_flat(spark, wh)
        wh.set_partition_spec("ev", ["dt"])
        wh.append(spark.createDataFrame(
            [(301, "2021-03-03", 9.0), (302, "2021-03-03", 8.0)],
            "id int, dt string, v double"), "ev")
        n = wh.delete_where("ev", "id = 302")
        assert n == 1
        got = {(r["id"], r["dt"]) for r in wh.read("ev").collect()}
        assert (302, "2021-03-03") not in got
        assert len(got) == len(rows) + 1


def test_stream_reads_mixed_layouts_lossless(spark, tmp_path):
    """The table stream reads per FILE (pyarrow) with partition values
    recovered from each file's OWN relpath — a spec-evolved table's
    mixed flat+hive snapshot streams losslessly (no basePath partition
    discovery to misattribute rows)."""
    import tempfile

    from etl_pipeline_for_detection_banking_fraud_spark.streaming import (
        table_stream as ts,
    )

    root = os.path.join(str(tmp_path), "wh")
    wh = Warehouse(spark, root)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(1, "2021-03-01"), (2, "2021-03-02")],
            "id int, dt string").coalesce(1), "ev")
    wh.set_partition_spec("ev", ["dt"])
    wh.append(spark.createDataFrame(
        [(3, "2021-03-03")], "id int, dt string").coalesce(1), "ev")
    rows = []
    q = (ts.stream_table(spark, root, "ev")
         .writeStream.foreachBatch(lambda df, _i: rows.extend(df.collect()))
         .option("checkpointLocation", tempfile.mkdtemp())
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted((r["id"], r["dt"]) for r in rows) == [
        (1, "2021-03-01"), (2, "2021-03-02"), (3, "2021-03-03")]


def test_same_txn_later_append_inherits_staged_spec(spark, tmp_path):
    """Within one transaction, an append after an explicitly
    partitioned append to the same table inherits the STAGED spec —
    not the (older) committed one."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(1, "2021-03-01")], "id int, dt string").coalesce(1),
            "ev", partition_by=["dt"])
        t.append(spark.createDataFrame(
            [(2, "2021-03-02")], "id int, dt string").coalesce(1), "ev")
    assert all(r.startswith("dt=") for r in wh._manifest_files("ev"))
    assert wh.read("ev").count() == 2


def test_mixed_layout_special_chars_in_partition_values(spark, tmp_path):
    """Hive path escaping is %XX only — '+' is written literally, so
    the mixed-layout path decode must NOT form-decode it to a space;
    '%' round-trips through the hive escape."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(1, "plain")], "id int, tag string").coalesce(1), "ev")
    wh.set_partition_spec("ev", ["tag"])
    for v in ("a+b", "50%off", "two words"):
        wh.append(spark.createDataFrame(
            [(2, v)], "id int, tag string").coalesce(1), "ev")
    got = {r["tag"] for r in wh.read("ev").collect()}
    assert got == {"plain", "a+b", "50%off", "two words"}


def test_clone_concurrent_linking_raises_typed(spark, tmp_path):
    """A concurrent clone that already linked a file surfaces as a
    typed error — never a silent copy-over-link."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(1,)], "id int").coalesce(1), "ev")
    rel = wh._manifest_files("ev")[0]
    os.makedirs(os.path.join(wh.root, "ev2"), exist_ok=True)
    # pre-link one target name, simulating the racing clone mid-flight
    os.link(os.path.join(wh.root, "ev", rel),
            os.path.join(wh.root, "ev2", rel))
    with pytest.raises(ValueError, match="already exists|concurrently"):
        wh.clone_table("ev", "ev2")


def test_mixed_layout_adversarial_partition_values(spark, tmp_path):
    """Round-trip the full hive escape set through a mixed-layout
    read: '=', '/', ':', '#', unicode, and NULL (Spark's
    __HIVE_DEFAULT_PARTITION__ sentinel). The mixed read must agree
    with what a post-compact single-layout basePath read returns."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(0, "plain")], "id int, tag string").coalesce(1), "ev")
    wh.set_partition_spec("ev", ["tag"])
    vals = ["a=b", "x/y", "a:b", "q#r", "naïve", None]
    for i, v in enumerate(vals, start=1):
        wh.append(spark.createDataFrame(
            [(i, v)], "id int, tag string").coalesce(1), "ev")
    got = {r["id"]: r["tag"] for r in wh.read("ev").collect()}
    want = {0: "plain", **{i: v for i, v in enumerate(vals, start=1)}}
    assert got == want
    # the single-layout read after compact agrees exactly
    wh.compact("ev")
    got2 = {r["id"]: r["tag"] for r in wh.read("ev").collect()}
    assert got2 == want


def test_mixed_layout_ancestor_partition_lookalike_dir(spark, tmp_path):
    """A warehouse rooted under an ancestor directory that LOOKS like a
    hive partition dir (…/dt=archive/…) must not leak the ancestor's
    value into the lifted partition column — the extraction anchors to
    the LAST k=v/ path segment, the file's own (advisor r12, medium)."""
    root = os.path.join(str(tmp_path), "dt=archive", "nested", "w")
    os.makedirs(root, exist_ok=True)
    wh = Warehouse(spark, root)
    with wh.transaction() as t:
        t.append(spark.createDataFrame(
            [(1, "2021-03-01")], "id int, dt string").coalesce(1), "ev")
    wh.set_partition_spec("ev", ["dt"])
    wh.append(spark.createDataFrame(
        [(2, "2021-03-02")], "id int, dt string").coalesce(1), "ev")
    got = {r["id"]: r["dt"] for r in wh.read("ev").collect()}
    assert got == {1: "2021-03-01", 2: "2021-03-02"}
    assert "archive" not in got.values()


def test_mixed_layout_undeclared_keeps_native_dtype(spark, tmp_path):
    """Legacy explicit-partition_by mixes (no declared schema): the
    path-lifted partition column must come back at the dtype the flat
    group carries IN-FILE (int here), not silently coerce the whole
    unioned column to string (advisor r12)."""
    wh = _wh(spark, tmp_path)
    with wh.transaction() as t:  # flat: k is a real int data column
        t.append(spark.createDataFrame(
            [(1, 10), (2, 20)], "id int, k int").coalesce(1), "ev")
    with wh.transaction() as t:  # hive: k only in the path
        t.append(spark.createDataFrame(
            [(3, 30)], "id int, k int").coalesce(1), "ev",
            partition_by=["k"])
    df = wh.read("ev")
    assert dict(df.dtypes)["k"] == "int"
    assert {(r["id"], r["k"]) for r in df.collect()} == {
        (1, 10), (2, 20), (3, 30)}


def test_rewrite_part_cols_case_insensitive(spark, tmp_path):
    """A spec recorded in a different case than the rewritten frame
    still resolves (returning the FRAME's spelling), matching
    Transaction.append's case-insensitive resolution — so compact/
    fold_dv keep the per-partition file sizing path (advisor r12)."""
    wh = _wh(spark, tmp_path)
    _seed_flat(spark, wh)
    wh.set_partition_spec("ev", ["dt"])
    df = wh.read("ev").withColumnRenamed("dt", "DT")
    assert wh._rewrite_part_cols("ev", df) == ["DT"]
