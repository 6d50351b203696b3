"""Conditional multi-clause MERGE — the Delta/Iceberg ``MERGE INTO``
analog as pure DataFrame algebra.

``WHEN MATCHED [AND cond] THEN UPDATE SET … | DELETE``,
``WHEN NOT MATCHED [AND cond] THEN INSERT …``,
``WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE … | DELETE``,
clauses evaluated in order, first hit wins, unaffected rows ride
through unchanged — exactly the SQL:2003 / Delta contract.

Reference analog: the reference's SCD2 close-then-insert
(``incr_loading.py:79-101``) is a two-clause conditional merge — WHEN
MATCHED AND payload-changed THEN UPDATE (close the current row), WHEN
NOT MATCHED THEN INSERT — re-expressed here declaratively so Catalyst
plans ONE full-outer join + one projection instead of per-key
statements.

Scale shape: a single equi-key full-outer join between the (already
file-narrowed, see ``Warehouse.merge_when``) target slice and the
source, then one CASE-per-column projection — no per-clause passes, no
window, no UDF; everything stays in whole-stage codegen. The
transactional wrapper (``sources.warehouse.Warehouse.merge_when``)
adds find-touched-files narrowing, deletion-vector folding, CDF and
the atomic replace commit on top of this operator.

Expression namespace: clause ``condition`` / ``set`` / ``values``
entries are Columns or SQL strings evaluated against the joined pair —
reference target columns as ``target.<col>`` and source columns as
``source.<col>`` (bare names work when unambiguous). ``NOT MATCHED BY
SOURCE`` conditions may reference ``target.*`` only (there is no
source row — its columns are NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# clause tag prefixes: m<i> matched, b<i> not-matched-by-source,
# i<i> not-matched (insert); 'keep' rides through, 'drop' is an
# unmatched source row no insert clause claimed
_T_FLAG, _S_FLAG, _ACT = "__merge_t", "__merge_s", "__merge_act"


def when_matched_update(set: dict | None = None,  # noqa: A002
                        condition=None) -> dict:
    """``set=None`` is UPDATE SET * : every target column takes the
    same-named source column, keeping its value when the source lacks
    it."""
    return {"when": "matched", "action": "update",
            "set": dict(set) if set is not None else None,
            "condition": condition}


def when_matched_delete(condition=None) -> dict:
    return {"when": "matched", "action": "delete", "condition": condition}


def when_not_matched_insert(values: dict | None = None,
                            condition=None) -> dict:
    """``values=None`` is INSERT * : each target column takes the
    same-named source column, NULL when the source lacks it."""
    return {"when": "not_matched", "action": "insert",
            "values": dict(values) if values is not None else None,
            "condition": condition}


def when_not_matched_by_source_update(set: dict,  # noqa: A002
                                      condition=None) -> dict:
    return {"when": "not_matched_by_source", "action": "update",
            "set": dict(set), "condition": condition}


def when_not_matched_by_source_delete(condition=None) -> dict:
    return {"when": "not_matched_by_source", "action": "delete",
            "condition": condition}


def _as_col(e) -> Column:
    return F.expr(e) if isinstance(e, str) else e


def _chain(clauses: list[dict], prefix: str, default: str) -> Column:
    """First-clause-wins tag: CASE WHEN c0 THEN '<p>0' WHEN c1 … ELSE
    default — a clause with no condition is unconditionally true (and
    shadows every later clause, like Delta)."""
    e = None
    for i, cl in enumerate(clauses):
        cond = _as_col(cl["condition"]) if cl.get("condition") is not None \
            else F.lit(True)
        e = F.when(cond, f"{prefix}{i}") if e is None else \
            e.when(cond, f"{prefix}{i}")
    return F.lit(default) if e is None else e.otherwise(default)


def _validate(name: str, clauses: list[dict], allowed: set) -> None:
    for cl in clauses:
        if cl.get("action") not in allowed:
            raise ValueError(
                f"{name} clause action must be one of {sorted(allowed)}, "
                f"got {cl.get('action')!r}"
            )


class MergePlan:
    """The tagged joined frame plus the projections the transactional
    wrapper needs (survivor rows, CDF slices, per-action counts).
    ``merge_clauses`` is the one-call form returning just the merged
    result."""

    def __init__(self, target: DataFrame, source: DataFrame,
                 on: list[str], matched: list[dict],
                 not_matched: list[dict], not_matched_by_source: list[dict],
                 target_alias: str = "target", source_alias: str = "source",
                 exclude_cols: tuple = ()):
        # exclude_cols: target columns carried through ``tagged`` for
        # the transactional wrapper (row provenance like ``_src``) but
        # excluded from every merge OUTPUT projection
        self.t_alias, self.s_alias = target_alias, source_alias
        _validate("matched", matched, {"update", "delete"})
        _validate("not_matched", not_matched, {"insert"})
        _validate("not_matched_by_source", not_matched_by_source,
                  {"update", "delete"})
        for k in on:
            if k not in target.columns or k not in source.columns:
                raise ValueError(
                    f"merge ON column {k!r} must exist in both target "
                    f"and source (target: {target.columns}, source: "
                    f"{source.columns})"
                )
        for flag in (_T_FLAG, _S_FLAG, _ACT):
            if flag in target.columns or flag in source.columns:
                raise ValueError(f"column name {flag!r} is reserved by merge")
        self.fields = [f for f in target.schema.fields
                       if f.name not in exclude_cols]
        self.source_cols = list(source.columns)
        self.matched = matched
        self.not_matched = not_matched
        self.nmbs = not_matched_by_source
        t = target.withColumn(_T_FLAG, F.lit(True)).alias(target_alias)
        s = source.withColumn(_S_FLAG, F.lit(True)).alias(source_alias)
        cond = None
        for k in on:
            c = F.col(f"{target_alias}.{k}") == F.col(f"{source_alias}.{k}")
            cond = c if cond is None else (cond & c)
        te = F.col(f"{target_alias}.{_T_FLAG}").isNotNull()
        se = F.col(f"{source_alias}.{_S_FLAG}").isNotNull()
        act = (
            F.when(te & se, _chain(matched, "m", "keep"))
            .when(te, _chain(not_matched_by_source, "b", "keep"))
            .otherwise(_chain(not_matched, "i", "drop"))
        )
        self.tagged = t.join(s, cond, "full_outer").withColumn(_ACT, act)
        self.update_tags = [f"m{i}" for i, c in enumerate(matched)
                            if c["action"] == "update"] + \
                           [f"b{i}" for i, c in enumerate(not_matched_by_source)
                            if c["action"] == "update"]
        self.delete_tags = [f"m{i}" for i, c in enumerate(matched)
                            if c["action"] == "delete"] + \
                           [f"b{i}" for i, c in enumerate(not_matched_by_source)
                            if c["action"] == "delete"]
        self.insert_tags = [f"i{i}" for i in range(len(not_matched))]

    def _value_for(self, cl: dict, name: str) -> Column:
        """The value a clause assigns to target column ``name``."""
        if cl["action"] == "update":
            sets = cl.get("set")
            if sets is None:  # UPDATE SET *
                return F.col(f"{self.s_alias}.{name}") \
                    if name in self.source_cols \
                    else F.col(f"{self.t_alias}.{name}")
            if name in sets:
                return _as_col(sets[name])
            return F.col(f"{self.t_alias}.{name}")
        # insert
        vals = cl.get("values")
        if vals is None:  # INSERT *
            return F.col(f"{self.s_alias}.{name}") \
                if name in self.source_cols else F.lit(None)
        return _as_col(vals[name]) if name in vals else F.lit(None)

    def _tagged_clauses(self):
        yield from ((f"m{i}", c) for i, c in enumerate(self.matched))
        yield from ((f"b{i}", c) for i, c in enumerate(self.nmbs))
        yield from ((f"i{i}", c) for i, c in enumerate(self.not_matched))

    def project(self, tagged: DataFrame) -> DataFrame:
        """Survivor rows in the target's schema: keeps ride through,
        updates apply their SET (cast back to the column's type — a
        merge never changes the schema), inserts materialize their
        VALUES; deletes and unclaimed source rows drop."""
        out = tagged.where(
            ~F.col(_ACT).isin(*self.delete_tags, "drop")
            if self.delete_tags else (F.col(_ACT) != "drop")
        )
        cols = []
        for f in self.fields:
            e = F.when(F.col(_ACT) == "keep",
                       F.col(f"{self.t_alias}.{f.name}"))
            for tag, cl in self._tagged_clauses():
                if cl["action"] == "delete":
                    continue
                e = e.when(F.col(_ACT) == tag, self._value_for(cl, f.name))
            cols.append(e.cast(f.dataType).alias(f.name))
        return out.select(*cols)

    def target_rows(self, tagged: DataFrame) -> DataFrame:
        """The pre-merge image of the target rows in ``tagged``."""
        return tagged.select(
            *[F.col(f"{self.t_alias}.{f.name}").cast(f.dataType)
              .alias(f.name) for f in self.fields])


def merge_clauses(target: DataFrame, source: DataFrame, on: list[str], *,
                  matched: list[dict] | None = None,
                  not_matched: list[dict] | None = None,
                  not_matched_by_source: list[dict] | None = None
                  ) -> DataFrame:
    """One-shot conditional merge over plain DataFrames: the merged
    target state (see module docstring for clause shapes and the
    ``target.``/``source.`` expression namespace). The transactional,
    file-narrowed form over warehouse tables is
    ``Warehouse.merge_when``."""
    plan = MergePlan(target, source, list(on), list(matched or []),
                     list(not_matched or []),
                     list(not_matched_by_source or []))
    return plan.project(plan.tagged)
