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
