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
        newer = F.coalesce(
            F.struct(*[F.col(f"_newv_{c}") for c in version_cols])
            > F.struct(*[snapshot[c] for c in version_cols]),
            F.lit(True),  # incomparable (NULL stored version): change wins
        )
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
