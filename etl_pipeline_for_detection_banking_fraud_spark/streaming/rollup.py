"""Incremental aggregate maintenance: a materialized rollup table kept
in sync with a warehouse table by tailing its commit log.

``maintain_rollup`` opens a ``warehouse_stream`` on the source table and
folds each microbatch's PARTIAL aggregates into a rollup table — the
lakehouse "materialized view maintenance" pattern: downstream dashboards
read a small pre-aggregated table that is always one commit behind the
facts, instead of re-scanning 100 TB of history per refresh.

Only DECOMPOSABLE aggregates are supported (count / sum / min / max —
mean derives from sum+count downstream): each batch contributes a
partial row per group, and "stored ⊕ delta" is itself a group-by with
the combine function (sum-of-sums, min-of-mins, ...). Non-decomposable
aggregates (exact distinct, median) need the full history by nature —
re-aggregate those from the facts, or use the sketch operators.

Exactly-once: foreachBatch is at-least-once — a crash after the rollup
commit but before Spark's offset checkpoint advances re-delivers the
batch. The guard is the Spark-docs batch-id watermark, made ATOMIC by
the commit log: the new rollup state and the applied ``batch_id`` (in a
``<rollup>__meta`` sidecar table) are published as ONE multi-table
replace transaction, so a re-delivered batch sees its own id at/below
the stored watermark and no-ops. The rollup and its watermark can never
tear apart — the same one-commit trick the streaming dedup index uses.

Scale shape: the per-batch delta aggregation is a map-side-combinable
group-by over ONLY the new files; the merge re-aggregates
stored ∪ delta, which is O(|groups|), not O(|facts|) — rollup tables
are small by construction (that's why you materialize them). Single
writer per rollup table (the stream); concurrent facts appends are
fine — they arrive as later microbatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.warehouse import Transaction, Warehouse
from .table_stream import stream_table

# agg -> (partial expr builder, combine fn for stored ∪ delta re-agg)
_DECOMPOSABLE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def _partial_exprs(aggs: dict) -> list:
    exprs = []
    for col, funcs in aggs.items():
        for fn in funcs:
            if fn not in _DECOMPOSABLE:
                raise ValueError(
                    f"{fn} is not decomposable; rollups support "
                    f"{sorted(_DECOMPOSABLE)} (mean = sum/count downstream)"
                )
            exprs.append(_DECOMPOSABLE[fn][0](col).alias(f"{col}_{fn}"))
    return exprs


def _combine_exprs(aggs: dict) -> list:
    return [
        _DECOMPOSABLE[fn][1](f"{col}_{fn}").alias(f"{col}_{fn}")
        for col, funcs in aggs.items()
        for fn in funcs
    ]


def apply_rollup_batch(wh: Warehouse, rollup_table: str, keys: list[str],
                       aggs: dict, batch: DataFrame, batch_id: int) -> bool:
    """Fold one microbatch into the rollup (the foreachBatch body;
    callable directly for backfills and tests). Returns False when the
    batch id is at/below the stored watermark (a checkpoint replay) and
    the rollup is left untouched."""
    meta_table = f"{rollup_table}__meta"
    if wh.exists(meta_table):
        last = wh.read(meta_table).agg(F.max("batch_id")).first()[0]
        if last is not None and batch_id <= last:
            return False
    if batch.isEmpty():
        return False  # nothing to fold; redelivery is equally empty
    delta = batch.groupBy(*keys).agg(*_partial_exprs(aggs))
    if wh.exists(rollup_table):
        stored = wh.read(rollup_table)
        combined = (
            stored.unionByName(delta)
            .groupBy(*keys)
            .agg(*_combine_exprs(aggs))
        )
    else:
        combined = delta
    meta = wh.spark.createDataFrame([(int(batch_id),)], "batch_id long")
    txn = Transaction(wh)
    txn.replace = True
    txn.append(combined, rollup_table)
    txn.append(meta, meta_table)
    txn.commit()
    return True


def maintain_rollup(spark: SparkSession, root: str, src_table: str,
                    rollup_table: str, keys: list[str], aggs: dict,
                    checkpoint_dir: str, *, available_now: bool = False,
                    on_replace: str = "fail"):
    """Start the maintenance stream: tail ``src_table``'s commit log and
    keep ``rollup_table`` = ``src.groupBy(keys).agg(aggs)`` one commit
    behind, exactly-once. ``aggs`` maps column -> list of decomposable
    aggregate names, e.g. ``{"value": ["sum", "count"], "ts": ["max"]}``.
    """
    wh = Warehouse(spark, root)
    sdf = stream_table(spark, root, src_table, on_replace=on_replace)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        apply_rollup_batch(wh, rollup_table, keys, aggs, batch_df, batch_id)

    w = (
        sdf.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
