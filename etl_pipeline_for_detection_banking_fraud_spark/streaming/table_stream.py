"""Stream a warehouse table: the commit log as a Structured Streaming
source (the Delta/Iceberg "table as a stream" read, re-expressed through
PySpark 4's Python Data Source API).

Why this exists: the warehouse's atomic commit log already gives batch
readers snapshot isolation and incremental consumers a batch CDF
(``snapshot_diff``). The missing piece was a PUSH-free tail — a
downstream Structured Streaming query that picks up each committed
append as a microbatch with exactly-once restart semantics. Reference
analog: the reference engine's consumers re-query Postgres tables it
loads (etl_process.py's mart reads); at 100 TB the Spark-native shape is
a log-tailing stream, not repeated full scans.

Semantics
---------
- **Offsets are commit-log sequence numbers.** ``initialOffset`` = 0
  (stream the EXISTING table state as the first microbatch, then tail —
  Delta's default) or the current head with ``tail_only=true``.
- **A microbatch (start, end] emits the file-set difference between the
  replayed states at the two offsets.** For append-only tables that is
  exactly the files the commits in range added. The diff rides
  ``Warehouse._replay_state``, so checkpoint folding bounds the offset
  computation at O(checkpoint_interval) entry parses — the stream never
  replays the whole log per trigger.
- **Replace entries** (CDC merge / compaction / clustering rewrites) in
  a tailed range raise by default: re-emitting rewritten files would
  duplicate already-streamed rows, and skipping them would silently
  drop merge output. ``on_replace=reemit`` opts into Delta's
  ``ignoreChanges`` contract (rewritten files re-emitted; consumer
  dedups downstream). The initial snapshot batch (start=0) is exempt —
  a snapshot has no double-delivery problem.
- **Expiry**: a stream that fell behind ``expire_log``'s horizon raises
  ``SnapshotExpired`` instead of silently re-snapshotting.

Scale shape: offset resolution is control-plane-only (driver-side JSON,
no Spark jobs); each emitted file is one ``InputPartition``, read
executor-side via pyarrow as Arrow RecordBatches (zero row-at-a-time
Python); hive partition values (``dt=...``) are recovered from the
relpath and attached as literal Arrow columns, matching the batch
reader's ``basePath`` behavior.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.pandas.types import from_arrow_schema, to_arrow_schema

from ..sources.warehouse import SnapshotExpired, Warehouse

SOURCE_NAME = "warehouse_stream"


def _partition_pairs(rel: str) -> list[tuple[str, str]]:
    """``dt=2021-03-01/part-0.parquet`` -> ``[("dt", "2021-03-01")]`` —
    the hive partition key=value directories of a committed relpath, in
    path order (the batch reader's ``basePath`` recovery, minus Spark's
    type inference, which ``_infer_type`` mirrors below)."""
    pairs = []
    for d in rel.split("/")[:-1]:
        if "=" in d:
            k, _, v = d.partition("=")
            pairs.append((k, v))
    return pairs


def _infer_type(value: str) -> T.DataType:
    """Spark's partition-value inference, reduced to the types the
    warehouse actually writes: int, date, else string."""
    try:
        int(value)
        return T.LongType()
    except ValueError:
        pass
    try:
        datetime.date.fromisoformat(value)
        return T.DateType()
    except ValueError:
        pass
    return T.StringType()


def _coerce(value: str, dt: T.DataType):
    if isinstance(dt, T.LongType):
        return int(value)
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat(value)
    return value


class _FilePartition(InputPartition):
    def __init__(self, path: str, part_values: list[tuple[str, str]]):
        self.path = path
        self.part_values = part_values


class _WarehouseStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, spark_schema: T.StructType,
                 part_fields: list[str]):
        self.root = options["root"]
        self.table = options["table"].lower()
        self.on_replace = options.get("on_replace", "fail")
        if self.on_replace not in ("fail", "reemit"):
            raise ValueError("on_replace must be 'fail' or 'reemit'")
        self.tail_only = str(options.get("tail_only", "false")).lower() == "true"
        self.spark_schema = spark_schema
        self.part_fields = part_fields
        # canonical Arrow schema every emitted batch is cast to (Spark's
        # own arrow convention, e.g. timestamp[us, tz=UTC])
        self.arrow_schema = to_arrow_schema(spark_schema)

    # control plane: driver-side, no Spark jobs --------------------------

    def _wh(self) -> Warehouse:
        return Warehouse(None, self.root, checkpoint_interval=0)

    def initialOffset(self) -> dict:
        if self.tail_only:
            return {"seq": self._wh()._latest_seq()}
        return {"seq": 0}

    def latestOffset(self) -> dict:
        return {"seq": self._wh()._latest_seq()}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        s, e = int(start["seq"]), int(end["seq"])
        if e <= s:
            return []
        wh = self._wh()
        horizon = wh.expire_horizon()
        if 0 < s < horizon:
            raise SnapshotExpired(
                f"stream offset {s} is below the expire horizon {horizon}: "
                "the commits it needs were folded by expire_log; restart "
                "the stream with a fresh checkpoint (full re-snapshot)"
            )
        if s > 0 and self.on_replace == "fail":
            entry_seqs, _ = wh._list_log()
            for seq in entry_seqs:
                if s < seq <= e:
                    entry = wh._load_entry(seq)
                    if entry and entry.get("op") == "replace" and \
                            self.table in entry.get("tables", {}) and \
                            self.table not in entry.get("append_tables", []):
                        # append_tables: this table rode a replace entry
                        # as an APPEND (e.g. a CDC merge's change-feed
                        # sidecar) — appends tail cleanly
                        raise RuntimeError(
                            f"commit {seq} REPLACED table {self.table} "
                            "(merge/compaction rewrite) mid-stream; "
                            "re-emitting would duplicate rows. Pass "
                            "on_replace=reemit to opt into Delta-style "
                            "ignoreChanges semantics"
                        )
        before = set(wh._manifest_files(self.table, at=s) or []) if s else set()
        after = wh._manifest_files(self.table, at=e) or []
        table_dir = os.path.join(self.root, self.table)
        return [
            _FilePartition(os.path.join(table_dir, rel), _partition_pairs(rel))
            for rel in after
            if rel not in before
        ]

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; the log is immutable

    # data plane: executor-side Arrow batches -----------------------------

    def read(self, partition: _FilePartition):
        part_map = dict(partition.part_values)
        pf = pq.ParquetFile(partition.path)
        known = set(self.arrow_schema.names)
        extra = [n for n in pf.schema_arrow.names if n not in known]
        if extra:
            # a file WIDER than the stream schema: a column was added
            # after this stream resolved its schema (or dropped from
            # the newest file). Emitting would silently lose the
            # column — fail the stream instead; a restart re-resolves
            # the schema from the newest file and streams the column
            # (Delta's contract for mid-run schema change).
            raise RuntimeError(
                f"schema changed mid-stream: {partition.path} carries "
                f"column(s) {extra} not in the stream schema "
                f"{sorted(known)}; restart the streaming query to pick "
                "up the evolved schema (offsets in the checkpoint are "
                "preserved)"
            )
        for batch in pf.iter_batches():
            cols = []
            for field in self.arrow_schema:
                if field.name in part_map:
                    sf = self.spark_schema[field.name].dataType
                    val = _coerce(part_map[field.name], sf)
                    cols.append(pa.array([val] * batch.num_rows,
                                         type=field.type))
                    continue
                idx = batch.schema.get_field_index(field.name)
                if idx < 0:
                    # additive schema evolution: a file written before
                    # the column existed reads as NULLs (mergeSchema
                    # semantics). Without this guard, pyarrow's -1
                    # would NEGATIVE-INDEX the last column — silently
                    # wrong data, not an error.
                    cols.append(pa.nulls(batch.num_rows, type=field.type))
                    continue
                col = batch.column(idx)
                if col.type != field.type:
                    col = pc.cast(col, field.type)
                cols.append(col)
            yield pa.RecordBatch.from_arrays(cols, schema=self.arrow_schema)


class WarehouseStreamDataSource(DataSource):
    """``spark.readStream.format("warehouse_stream")`` over a commit-log
    tracked warehouse table. Options: ``root`` (warehouse root path),
    ``table``, ``on_replace`` (fail|reemit), ``tail_only`` (true skips
    the initial snapshot batch)."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> T.StructType:
        return _resolve_schema(self.options)[0]

    def streamReader(self, schema: T.StructType) -> _WarehouseStreamReader:
        _, part_fields = _resolve_schema(self.options)
        return _WarehouseStreamReader(dict(self.options), schema, part_fields)


def _resolve_schema(options: dict) -> tuple[T.StructType, list[str]]:
    """Table schema = NEWEST committed file's parquet footer (data
    columns) + hive partition columns recovered from its relpath
    (appended last, matching the batch reader's column order). Newest,
    not first: a column ADDED by a later append (additive schema
    evolution) must be part of the stream schema — older, narrower
    files read as typed NULLs via the guard in ``read()`` (the batch
    reader's ``merge_schema=True`` behavior). The inverse case — a file
    WIDER than this schema, i.e. a column added after the stream
    started — fails the stream loudly in ``read()``; restarting
    re-resolves the schema and picks the column up (Delta's
    schema-change contract). Requires at least one committed file — a
    stream over a never-written table has no schema to offer."""
    root, table = options["root"], options["table"].lower()
    wh = Warehouse(None, root, checkpoint_interval=0)
    rels = wh._manifest_files(table)
    if not rels:
        raise ValueError(
            f"table {table} has no committed files in {root}; write at "
            "least one commit before opening a stream on it"
        )
    rel = rels[-1]
    footer = pq.ParquetFile(os.path.join(root, table, rel)).schema_arrow
    spark_schema = from_arrow_schema(footer)
    part_fields = []
    for k, v in _partition_pairs(rel):
        if k not in spark_schema.names:
            spark_schema = spark_schema.add(k, _infer_type(v))
            part_fields.append(k)
    return spark_schema, part_fields


def register(spark) -> None:
    """Idempotent registration of the ``warehouse_stream`` format."""
    spark.dataSource.register(WarehouseStreamDataSource)


def stream_table(spark, root: str, table: str, *,
                 on_replace: str = "fail", tail_only: bool = False):
    """Convenience: register + open a streaming DataFrame on ``table``."""
    register(spark)
    return (
        spark.readStream.format(SOURCE_NAME)
        .option("root", root)
        .option("table", table)
        .option("on_replace", on_replace)
        .option("tail_only", str(tail_only).lower())
        .load()
    )
