"""Property test: cdc.apply_changelog ≡ an independent Python model of
its declared contract — LAST-change-wins compaction of the changelog,
merged against the ORIGINAL snapshot (Kafka-log-compaction-style upsert:
only each key's newest change matters; intermediate deletes/updates are
superseded, and non-payload snapshot columns survive whenever the key
exists in the snapshot, even across a delete-then-reinsert).

Hypothesis plants the adversarial shapes: multiple changes per key,
delete-then-reinsert, changes for keys absent from the snapshot, keys
with no changes, empty snapshot, empty changelog.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_for_detection_banking_fraud_spark.operators import cdc

KEYS = list(range(6))

# change: (key, op, payload); versions are assigned by list position so
# every changelog is a total order with no ties
_chg_st = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["U", "I", "D"]),
    st.integers(0, 100),
)


def _model(snap_keys: set, changes: list) -> dict:
    """Compact the changelog to each key's LAST change, then merge."""
    last: dict = {}
    for key, op, payload in changes:  # version order == list order
        last[key] = (op, payload)
    out = {}
    for k in snap_keys:
        if k in last:
            op, payload = last[k]
            if op == "D":
                continue
            out[k] = (float(payload), f"n{k}")
        else:
            out[k] = (float(k * 10), f"n{k}")
    for k, (op, payload) in last.items():
        if k not in snap_keys and op != "D":
            out[k] = (float(payload), None)  # insert: no snapshot name
    return out


@given(
    snap_keys=st.sets(st.sampled_from(KEYS), max_size=4),
    changes=st.lists(_chg_st, max_size=12),
)
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_apply_changelog_matches_compaction_model(spark, snap_keys, changes):
    snap = spark.createDataFrame(
        [(k, f"n{k}", float(k * 10)) for k in sorted(snap_keys)],
        "k long, name string, bal double",
    )
    chg = spark.createDataFrame(
        [(k, v, op, float(p)) for v, (k, op, p) in enumerate(changes)],
        "k long, v long, op string, bal double",
    )
    out = cdc.apply_changelog(
        snap, chg, key="k", version_cols=("v",), payload_cols=("bal",)
    )
    got = {r["k"]: (r["bal"], r["name"]) for r in out.collect()}
    assert got == _model(snap_keys, changes)


# ---------------------------------------------------------------------------
# Version-aware mode: batch application order-independence (round 6)
# ---------------------------------------------------------------------------

def _final_versioned(snap_keys: set, changes: list) -> dict:
    """Expected end state when the snapshot CARRIES the version column:
    per key, the globally newest change wins regardless of how the
    changelog was batched. Returns {k: (bal, v)} — the convergence
    guarantee covers the key set, payload and version columns; a
    carried-over non-payload column (e.g. name) can legitimately differ
    across a delete/reinsert race, because an executed delete erases it
    while a reinsert-then-stale-delete keeps it."""
    last: dict = {}
    for v, (k, op, p) in enumerate(changes):
        last[k] = (v, op, p)
    out = {}
    for k in snap_keys:
        out[k] = (float(k * 10), None)
    for k, (v, op, p) in last.items():
        if op == "D":
            out.pop(k, None)
        else:
            out[k] = (float(p), v)
    return out


@given(
    snap_keys=st.sets(st.sampled_from(KEYS), max_size=4),
    changes=st.lists(_chg_st, min_size=1, max_size=12),
    batch_of=st.lists(st.integers(0, 2), min_size=12, max_size=12),
    apply_order=st.permutations([0, 1, 2]),
)
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_batched_merge_order_independent(spark, snap_keys, changes,
                                         batch_of, apply_order):
    """With stored versions, applying changelog BATCHES in any order
    converges to the single-batch merge — the out-of-order/late-batch
    guarantee the streaming CDC sink documents.

    Documented exception (the classic tombstone problem): a delete
    erases the stored row AND its version, so a stale non-delete
    arriving AFTER the delete was applied has nothing to compare
    against and re-inserts. Exact-once convergence across a delete
    needs retained tombstones, which the overwrite-in-place table shape
    doesn't keep; such interleavings are filtered out here and called
    out in apply_changelog's docstring."""
    from hypothesis import assume

    batches: list[list] = [[], [], []]
    for v, chg in enumerate(changes):
        batches[batch_of[v]].append((v, *chg))

    # filter the documented non-convergent shape: key has its newest
    # change 'D' in a batch applied before a batch holding an older
    # non-D change for the same key
    pos = {b: i for i, b in enumerate(apply_order)}
    for k in {c[0] for c in changes}:
        vs = [(v, b, op) for b in range(3) for (v, kk, op, _p) in batches[b]
              if kk == k]
        for v1, b1, op1 in vs:
            if op1 != "D":
                continue
            for v2, b2, op2 in vs:
                if v2 < v1 and op2 != "D" and pos[b2] > pos[b1]:
                    assume(False)

    snap = spark.createDataFrame(
        [(k, f"n{k}", float(k * 10), None) for k in sorted(snap_keys)],
        "k long, name string, bal double, v long",
    )
    state = snap
    for b in apply_order:
        if not batches[b]:
            continue
        chg = spark.createDataFrame(
            [(k, v, op, float(p)) for (v, k, op, p) in batches[b]],
            "k long, v long, op string, bal double",
        )
        state = cdc.apply_changelog(
            state, chg, key="k", version_cols=("v",), payload_cols=("bal",)
        ).localCheckpoint()
    got = {r["k"]: (r["bal"], r["v"]) for r in state.collect()}
    assert got == _final_versioned(snap_keys, changes)


def test_stale_update_and_delete_ignored(spark):
    """Deterministic core of the version guard: a change not strictly
    newer than the stored version is a no-op, both for updates and for
    deletes; a genuinely newer change still applies."""
    snap = spark.createDataFrame(
        [(1, "a", 10.0, 5), (2, "b", 20.0, 5)],
        "k long, name string, bal double, v long",
    )
    chg = spark.createDataFrame(
        [
            (1, 3, "U", 99.0),   # stale update: ignored
            (2, 4, "D", None),   # stale delete: ignored
        ],
        "k long, v long, op string, bal double",
    )
    out = cdc.apply_changelog(
        snap, chg, key="k", version_cols=("v",), payload_cols=("bal",)
    )
    got = {r["k"]: (r["bal"], r["v"]) for r in out.collect()}
    assert got == {1: (10.0, 5), 2: (20.0, 5)}

    newer = spark.createDataFrame(
        [(1, 6, "U", 99.0), (2, 7, "D", None)],
        "k long, v long, op string, bal double",
    )
    out2 = cdc.apply_changelog(
        snap, newer, key="k", version_cols=("v",), payload_cols=("bal",)
    )
    got2 = {r["k"]: (r["bal"], r["v"]) for r in out2.collect()}
    assert got2 == {1: (99.0, 6)}


def test_null_version_cases(spark):
    """The version guard's NULL ladder (round-7 advisor item): a stored
    NULL version loses to any non-NULL change (NULL orders first in the
    struct comparison); a NULL-change vs non-NULL-stored is stale and
    ignored; NULL-vs-NULL is incomparable and the change WINS — unknown
    version means no basis to refuse (the documented contract, now an
    explicit disjunct rather than dead coalesce code)."""
    snap = spark.createDataFrame(
        [(1, "a", 10.0, None), (2, "b", 20.0, 5), (3, "c", 30.0, None)],
        "k long, name string, bal double, v long",
    )
    chg = spark.createDataFrame(
        [
            (1, 2, "U", 91.0),       # non-NULL beats stored NULL
            (2, None, "U", 92.0),    # NULL change vs stored 5: ignored
            (3, None, "U", 93.0),    # NULL-vs-NULL: change wins
        ],
        "k long, v long, op string, bal double",
    )
    out = cdc.apply_changelog(
        snap, chg, key="k", version_cols=("v",), payload_cols=("bal",)
    )
    got = {r["k"]: (r["bal"], r["v"]) for r in out.collect()}
    assert got == {1: (91.0, 2), 2: (20.0, 5), 3: (93.0, None)}

    # NULL-vs-NULL delete also wins
    d = spark.createDataFrame(
        [(3, None, "D", None)], "k long, v long, op string, bal double"
    )
    out2 = cdc.apply_changelog(
        snap, d, key="k", version_cols=("v",), payload_cols=("bal",)
    )
    assert sorted(r["k"] for r in out2.collect()) == [1, 2]
