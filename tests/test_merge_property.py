"""Property test: operators.merge.merge_clauses ≡ an independent Python
model of the SQL MERGE contract — per-target-row clause dispatch in
clause order (first hit wins), SQL NULL condition semantics (NULL =
no match), ON-key NULLs never matching, duplicate target rows treated
independently, unmatched source rows claimed by the first insert clause
or dropped, NOT MATCHED BY SOURCE touching only source-less rows.

Hypothesis plants the adversarial shapes: NULL keys and NULL payloads
on both sides, duplicate target keys, source keys absent from the
target, empty target, empty source, thresholds that flip clause
conditions between always/never/NULL.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_for_detection_banking_fraud_spark.operators import merge as M

_KEY = st.one_of(st.none(), st.integers(0, 7))
_VAL = st.one_of(st.none(), st.integers(0, 100))

# target: a LIST (duplicate keys allowed) of (k, v, g)
_tgt_st = st.lists(
    st.tuples(_KEY, _VAL, st.sampled_from(["a", "b"])), max_size=8)
# source: unique non-null keys -> (nv, op)
_src_st = st.dictionaries(
    st.integers(0, 9), st.tuples(_VAL, st.sampled_from(["U", "D", "X"])),
    max_size=8)


def _model(target: list, src: dict, t1: int) -> list:
    """Rows (k, v, g) after the four clauses below."""
    out = []
    for k, v, g in target:
        m = src.get(k) if k is not None else None  # NULL never matches
        if m is not None:
            nv, op = m
            if op == "U" and nv is not None and nv > t1:  # clause m0
                out.append((k, nv, g))
            elif op == "D":                               # clause m1
                continue
            else:
                out.append((k, v, g))                     # keep
        else:
            if v is None:                                 # clause b0
                continue
            out.append((k, v, g))                         # keep
    matched_keys = {k for k, _, _ in target if k is not None}
    for k, (nv, op) in src.items():
        if k not in matched_keys and op != "X":           # clause i0
            out.append((k, nv, "new"))
    return sorted(out, key=lambda r: (repr(r[0]), repr(r[1]), r[2]))


@given(target=_tgt_st, src=_src_st, t1=st.integers(-1, 101))
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_clauses_matches_model(spark, target, src, t1):
    tdf = spark.createDataFrame(target, "k long, v long, g string") \
        if target else spark.createDataFrame([], "k long, v long, g string")
    srows = [(k, nv, op) for k, (nv, op) in src.items()]
    sdf = spark.createDataFrame(srows, "k long, nv long, op string") \
        if srows else spark.createDataFrame([], "k long, nv long, op string")
    out = M.merge_clauses(
        tdf, sdf, ["k"],
        matched=[
            M.when_matched_update(
                {"v": "source.nv"},
                condition=f"source.op = 'U' AND source.nv > {t1}"),
            M.when_matched_delete(condition="source.op = 'D'"),
        ],
        not_matched=[M.when_not_matched_insert(
            {"k": "source.k", "v": "source.nv", "g": "'new'"},
            condition="source.op <> 'X'")],
        not_matched_by_source=[
            M.when_not_matched_by_source_delete(
                condition="target.v IS NULL")],
    )
    got = sorted(((r["k"], r["v"], r["g"]) for r in out.collect()),
                 key=lambda r: (repr(r[0]), repr(r[1]), r[2]))
    assert got == _model(target, src, t1)
