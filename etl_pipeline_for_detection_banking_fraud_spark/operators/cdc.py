"""Changelog (CDC) application: merge an insert/update/delete stream
onto a keyed snapshot — the generic form of the reference's per-table
upsert loops (reference `incr_loading.py` applies daily deltas to
`dwh_*` tables row-by-row through SQL; `scd2.py` covers the versioned
variant, this module covers the overwrite-in-place variant a lakehouse
MERGE would run).

Scale shape: one shuffle to pick the latest change per key (window over
the changelog only — the snapshot is never windowed), then one
outer join changelog-to-snapshot on the key. Both sides shuffle-hash on
the same key, so at 100 TB this is two exchanges total and the join can
ride an existing bucketing of the snapshot. No collect, no UDFs.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(changes: DataFrame, key: str,
                   version_cols: Sequence[str]) -> DataFrame:
    """Keep each key's newest changelog row.

    ``version_cols`` must form a TOTAL order within a key (include a
    unique tiebreaker such as the source LSN / txn id as the last
    column) — otherwise "latest" is nondeterministic and a task retry
    can legitimately produce a different merge result.
    """
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in version_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: Sequence[str],
                  change_col: str = "change_type") -> DataFrame:
    """Row-level changelog between two keyed snapshots — the
    Delta/Iceberg change-data-feed DERIVED from the data instead of
    stored: rows only in ``new`` are inserts, rows only in ``old`` are
    deletes, and a key appearing on both sides of the difference is an
    update pre/post image pair.

    Output: ``old``'s columns plus ``change_col`` in {'insert',
    'delete', 'update_preimage', 'update_postimage'}. Bag semantics:
    duplicate rows diff by multiplicity (2 copies -> 3 copies emits ONE
    insert), and rows identical in both snapshots are never reported.
    A row whose key columns contain NULL can never pair with "its"
    other side, so it classifies as insert/delete — the same semantics
    a key equi-join (or SQL INTERSECT on the key) would give.

    Scale shape: ONE union scan -> ONE full-row hash aggregate (the
    symmetric difference with signed multiplicities; identical rows
    cancel here and never reach later stages) -> ONE key-partitioned
    window to classify -> explode to multiplicity. This beats the
    textbook 2×``exceptAll`` + key-join form, which recomputes each
    exceptAll for the semi and anti branches. Everything after the
    aggregate is sized by CHANGED rows, not table rows —
    ``Warehouse.table_diff`` additionally cancels unchanged FILES from
    the manifests before the scan even starts.
    """
    cols = old.columns
    tagged = (
        old.select(*cols).withColumn("_a", F.lit(1)).withColumn("_b", F.lit(0))
        .unionByName(
            new.select(*cols)
            .withColumn("_a", F.lit(0)).withColumn("_b", F.lit(1))
        )
    )
    net = (
        tagged.groupBy(*cols)
        .agg((F.sum("_b") - F.sum("_a")).alias("_net"))
        .where(F.col("_net") != 0)
    )
    w = Window.partitionBy(*[F.col(c) for c in key_cols])
    key_ok = F.lit(True)
    for c in key_cols:
        key_ok = key_ok & F.col(c).isNotNull()
    sided = (
        net.withColumn(
            "_has_rem",
            F.max(F.when(F.col("_net") < 0, 1).otherwise(0)).over(w),
        )
        .withColumn(
            "_has_add",
            F.max(F.when(F.col("_net") > 0, 1).otherwise(0)).over(w),
        )
        .withColumn("_paired", key_ok & (F.col("_has_rem") == 1)
                    & (F.col("_has_add") == 1))
    )
    labeled = sided.withColumn(
        change_col,
        F.when(
            F.col("_net") < 0,
            F.when(F.col("_paired"), F.lit("update_preimage"))
            .otherwise(F.lit("delete")),
        ).otherwise(
            F.when(F.col("_paired"), F.lit("update_postimage"))
            .otherwise(F.lit("insert"))
        ),
    )
    return (
        labeled.withColumn(
            "_copies", F.explode(F.sequence(F.lit(1), F.abs("_net")))
        )
        .select(*cols, change_col)
    )


def apply_changelog(snapshot: DataFrame, changes: DataFrame, key: str,
                    version_cols: Sequence[str],
                    payload_cols: Sequence[str],
                    op_col: str = "op") -> DataFrame:
    """MERGE the newest change per key into ``snapshot``.

    Semantics (op values per row of the latest changelog entry):
      - ``'D'``: the key is removed from the result;
      - any other op (``'U'``/``'I'``): the key survives with each
        ``payload_cols`` column taken from the changelog, remaining
        snapshot columns carried over (NULL for keys new to the
        snapshot — an insert);
      - keys without a changelog entry pass through unchanged.

    These are log-compaction semantics: only each key's NEWEST change
    matters, so a delete-then-reinsert of a snapshot key keeps the
    snapshot's non-payload columns (the delete is superseded, never
    "executed"). A sequential-replay merge would instead null them —
    if that is the contract you need, apply the changelog in version-
    split batches. Pinned by tests/test_cdc_property.py.

    Output schema == snapshot schema. ``changes`` must contain
    ``key``, ``op_col`` and every ``payload_cols`` name (same names as
    the snapshot columns they replace).

    VERSION-AWARE mode (out-of-order safety): when the snapshot schema
    carries EVERY ``version_cols`` column, each key's stored version
    guards the merge — a change whose version is not strictly newer
    than the stored row's is ignored (stale updates AND stale deletes),
    and an applied change also writes its version columns. This is the
    ``MERGE ... WHEN MATCHED AND source.v > target.v`` CDC pattern: it
    makes applying changelog batches COMMUTE, so late/out-of-order
    microbatch delivery converges to the single-batch merge (pinned by
    tests/test_cdc_property.py::test_batched_merge_order_independent).
    A stored NULL version (or NULL-vs-NULL incomparability) lets the
    change win — unknown version means "no basis to refuse". Without
    the version columns in the snapshot there is nothing to compare:
    last-merged-batch wins, as before.
    """
    version_aware = all(c in snapshot.columns for c in version_cols)
    extra = [
        F.col(c).alias(f"_newv_{c}") for c in version_cols
    ] if version_aware else []
    latest = latest_per_key(changes, key, version_cols).select(
        F.col(key).alias("_ck"), F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_new_{c}") for c in payload_cols],
        *extra,
    )
    joined = snapshot.join(latest, snapshot[key] == latest["_ck"], "full_outer")
    if version_aware:
        # struct comparison is TOTAL (structs themselves are never
        # NULL; NULL fields order first), so `>` alone would silently
        # IGNORE a NULL-vs-NULL version pair. The documented contract
        # is "unknown version means no basis to refuse": an all-NULL
        # vs all-NULL comparison lets the change win explicitly.
        both_null = functools.reduce(
            operator.and_,
            [F.col(f"_newv_{c}").isNull() & snapshot[c].isNull()
             for c in version_cols],
        )
        newer = (
            F.struct(*[F.col(f"_newv_{c}") for c in version_cols])
            > F.struct(*[snapshot[c] for c in version_cols])
        ) | both_null
        applied = F.col("_op").isNotNull() & (snapshot[key].isNull() | newer)
    else:
        applied = F.col("_op").isNotNull()
    joined = joined.where(~(applied & (F.col("_op") == F.lit("D"))))
    out_cols = []
    for c in snapshot.columns:
        if c == key:
            out_cols.append(F.coalesce(F.col(key), F.col("_ck")).alias(key))
        elif c in payload_cols:
            out_cols.append(
                F.when(applied, F.col(f"_new_{c}")).otherwise(F.col(c)).alias(c)
            )
        elif version_aware and c in version_cols:
            out_cols.append(
                F.when(applied, F.col(f"_newv_{c}")).otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)
