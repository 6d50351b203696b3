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

Exactness note: ``sum`` over IEEE doubles accumulates one rounding per
fold — use DECIMAL columns where bit-exact long-horizon totals matter
(the repo-wide float policy); counts and min/max are exact by
construction.

Scale shape: the per-batch delta aggregation is a map-side-combinable
group-by over ONLY the new files; the merge re-aggregates
stored ∪ delta, which is O(|groups|), not O(|facts|) — rollup tables
are small by construction (that's why you materialize them). Single
writer per rollup table (the stream); concurrent facts appends are
fine — they arrive as later microbatches.
"""

from __future__ import annotations

import functools

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


# -- CDF-driven maintenance (updates/deletes, not just appends) -----------

_SIGNED = {"count", "sum"}  # aggregates with an inverse (group can shrink)


def bootstrap_rollup(wh: Warehouse, rollup_table: str, keys: list,
                     aggs: dict, snapshot: DataFrame) -> bool:
    """Seed a CDF-maintained rollup with the table state that PRECEDES
    the change feed (the feed only records changes since its first
    merge; pre-feed rows never appear in it). Seeds at batch_id -1 so
    the stream's batch 0 still applies. Call with the table's state
    from before the first ``cdf=True`` merge — the live table works if
    no merge has happened yet, else ``read_at`` the pre-feed snapshot
    (seeding from a LATER state would double-count the merges the
    stream is about to deliver)."""
    return apply_rollup_batch(wh, rollup_table, keys, aggs, snapshot, -1)


def apply_rollup_cdf_batch(wh: Warehouse, rollup_table: str,
                           keys: list, aggs: dict, feed: DataFrame,
                           batch_id: int,
                           change_col: str = "change_type") -> bool:
    """Fold one CDF microbatch (``merge_table(cdf=True)``'s sidecar
    rows: insert / delete / update_preimage / update_postimage) into a
    rollup that stays exact under UPDATES and DELETES — not just
    appends.

    Only SIGNED aggregates (count, sum) are supported: inserts and
    update-postimages contribute +1/+value, deletes and
    update-preimages contribute -1/-value, so the delta aggregate is
    the exact group adjustment. min/max have no inverse — a delete can
    reveal a smaller max that the rollup no longer knows — so they are
    rejected here (re-aggregate those from the table, or accept the
    append-only ``apply_rollup_batch`` semantics).

    Same exactly-once shape as ``apply_rollup_batch``: rollup state and
    the batch-id watermark commit as ONE multi-table replace
    transaction. Groups whose count reaches zero are dropped (a fully
    deleted group disappears, matching the batch group-by).
    """
    for col, funcs in aggs.items():
        bad = [fn for fn in funcs if fn not in _SIGNED]
        if bad:
            raise ValueError(
                f"{bad} have no inverse; CDF rollups support only "
                f"{sorted(_SIGNED)} (min/max need the append-only path "
                "or a table re-aggregate)"
            )
    meta_table = f"{rollup_table}__meta"
    if wh.exists(meta_table):
        last = wh.read(meta_table).agg(F.max("batch_id")).first()[0]
        if last is not None and batch_id <= last:
            return False
    if feed.isEmpty():
        return False
    sign = F.when(
        F.col(change_col).isin("insert", "update_postimage"), F.lit(1)
    ).when(
        F.col(change_col).isin("delete", "update_preimage"), F.lit(-1)
    )
    signed = feed.withColumn("_sign", sign).where(F.col("_sign").isNotNull())
    delta_exprs = []
    for col, funcs in aggs.items():
        for fn in funcs:
            if fn == "count":
                e = F.sum(F.when(F.col(col).isNotNull(), F.col("_sign"))
                          .otherwise(F.lit(0)))
            else:
                e = F.sum(F.col(col) * F.col("_sign"))
            delta_exprs.append(e.alias(f"{col}_{fn}"))
    delta = signed.groupBy(*keys).agg(*delta_exprs)
    if wh.exists(rollup_table):
        stored = wh.read(rollup_table)
        combined = (
            stored.unionByName(delta)
            .groupBy(*keys)
            .agg(*_combine_exprs(aggs))
        )
    else:
        combined = delta
    # drop fully-deleted groups: any count column at zero removes the
    # row (all-signed aggregates of an empty group are zero)
    count_cols = [f"{c}_count" for c, fns in aggs.items() if "count" in fns]
    if count_cols:
        keep = functools.reduce(
            lambda a, b: a | b, [F.col(c) > 0 for c in count_cols]
        )
        combined = combined.where(keep)
    meta = wh.spark.createDataFrame([(int(batch_id),)], "batch_id long")
    txn = Transaction(wh)
    txn.replace = True
    txn.append(combined, rollup_table)
    txn.append(meta, meta_table)
    txn.commit()
    return True


def maintain_rollup_cdf(spark: SparkSession, root: str, table: str,
                        rollup_table: str, keys: list, aggs: dict,
                        checkpoint_dir: str, *,
                        cdf_table: str | None = None,
                        available_now: bool = False):
    """Maintain an exact rollup of a table that receives CDC MERGES:
    tail the table's ``merge_table(cdf=True)`` change feed and apply
    signed adjustments — updates and deletes land in the aggregate
    without ever rescanning the table. ``aggs``: column -> subset of
    {count, sum}. Rows that predate the feed need ``bootstrap_rollup``
    once, with the pre-feed snapshot."""
    wh = Warehouse(spark, root)
    sdf = stream_table(spark, root, cdf_table or f"{table}__cdf")

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        apply_rollup_cdf_batch(wh, rollup_table, keys, aggs, batch_df,
                               batch_id)

    w = (
        sdf.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
