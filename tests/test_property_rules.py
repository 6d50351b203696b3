"""Property-based differential testing (SURVEY §5.4): randomized
transaction streams through the production window formulations of rules
3/4, checked against a DuckDB transcription of the reference SQL on the
exact same rows. Hypothesis shrinks any divergence to a minimal stream.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import duckdb
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # e2e/streaming/property lane
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_for_detection_banking_fraud_spark import schemas
from etl_pipeline_for_detection_banking_fraud_spark.functions.scalars import SCD2_OPEN_END_DATE
from etl_pipeline_for_detection_banking_fraud_spark.operators import fraud_rules as fr

D = datetime.date
BASE = datetime.datetime(2021, 3, 1, 10, 0, 0)

# one client/account per card, two terminals in different cities
CARDS = ["C1", "C2"]
TERMS = {"T_A": "CityA", "T_B": "CityB"}

tx_strategy = st.lists(
    st.tuples(
        st.sampled_from(CARDS),
        st.integers(min_value=0, max_value=90),          # minutes offset
        st.integers(min_value=0, max_value=59),          # seconds offset
        st.integers(min_value=1, max_value=5),           # amount (ties likely)
        st.sampled_from(["SUCCESS", "REJECT"]),
        st.sampled_from(list(TERMS)),
    ),
    min_size=0,
    max_size=14,
)


@pytest.fixture(scope="module")
def prop_dims(spark):
    cards = spark.createDataFrame(
        [("C1", "A1", D(2001, 1, 1), None), ("C2", "A2", D(2001, 1, 1), None)],
        schema=schemas.CARDS,
    )
    accounts = spark.createDataFrame(
        [("A1", D(2030, 1, 1), "CL1", D(1900, 1, 1), None),
         ("A2", D(2030, 1, 1), "CL2", D(1900, 1, 1), None)],
        schema=schemas.ACCOUNTS,
    )
    clients = spark.createDataFrame(
        [("CL1", "L1", "F1", None, D(1980, 1, 1), "P-C1", None, "ph1", D(1900, 1, 1), None),
         ("CL2", "L2", "F2", None, D(1980, 1, 1), "P-C2", None, "ph2", D(1900, 1, 1), None)],
        schema=schemas.CLIENTS,
    )
    hist = spark.createDataFrame(
        [(t, "POS", city, "addr", D(2021, 1, 1), SCD2_OPEN_END_DATE, False)
         for t, city in TERMS.items()],
        schema=schemas.TERMINALS_HIST,
    )
    empty_mart = spark.createDataFrame([], schema=schemas.REP_FRAUD)
    return cards, accounts, clients, hist, empty_mart


def _mk_tx(spark, raw):
    rows = [
        (f"t{i}", BASE + datetime.timedelta(minutes=m, seconds=s),
         Decimal(a).quantize(Decimal("0.01")), card, "PAYMENT", res, term)
        for i, (card, m, s, a, res, term) in enumerate(raw)
    ]
    return rows, spark.createDataFrame(rows, schema=schemas.TRANSACTIONS)


def _duck_rule3(rows) -> set:
    if not rows:
        return set()
    pdf = pd.DataFrame(
        [(r[3], r[1], TERMS[r[6]], r[5]) for r in rows],
        columns=["card", "ts", "city", "res"],
    )
    con = duckdb.connect()
    con.register("tx", pdf)
    got = con.sql(
        """
        SELECT DISTINCT 'P-' || t2.card, t2.ts
        FROM tx t1 JOIN tx t2 ON t1.card = t2.card
             AND t1.ts < t2.ts
             AND date_part('epoch', t2.ts - t1.ts) < 3600
        WHERE t1.city <> t2.city AND t2.res = 'SUCCESS'
        """
    ).fetchall()
    return set(got)


def _duck_rule4(rows) -> set:
    if not rows:
        return set()
    pdf = pd.DataFrame(
        [(r[3], r[1], float(r[2]), r[5]) for r in rows],
        columns=["card", "ts", "am", "res"],
    )
    con = duckdb.connect()
    con.register("tx", pdf)
    got = con.sql(
        """
        SELECT DISTINCT 'P-' || t3.card, t3.ts
        FROM tx t1
        JOIN tx t2 ON t1.card = t2.card AND t1.ts < t2.ts
             AND date_part('epoch', t2.ts - t1.ts) < 1200
        JOIN tx t3 ON t2.card = t3.card AND t2.ts < t3.ts
             AND date_part('epoch', t3.ts - t2.ts) < 1200
        WHERE t1.res = 'REJECT' AND t2.res = 'REJECT' AND t3.res = 'SUCCESS'
          AND t1.am > t2.am AND t2.am > t3.am
          AND date_part('epoch', t3.ts - t1.ts) < 1200
        """
    ).fetchall()
    return set(got)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(raw=tx_strategy)
def test_rule3_window_matches_oracle_on_random_streams(spark, prop_dims, raw):
    cards, accounts, clients, hist, mart = prop_dims
    rows, tx = _mk_tx(spark, raw)
    out = fr.rule3_diff_cities_window(tx, cards, accounts, clients, hist, mart,
                                      D(2021, 3, 1))
    got = {(r.passport, r.event_dt) for r in out.collect()}
    assert got == _duck_rule3(rows)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(raw=tx_strategy)
def test_rule4_window_matches_oracle_on_random_streams(spark, prop_dims, raw):
    cards, accounts, clients, hist, mart = prop_dims
    rows, tx = _mk_tx(spark, raw)
    out = fr.rule4_amount_guessing_window(tx, cards, accounts, clients, mart,
                                          D(2021, 3, 1))
    got = {(r.passport, r.event_dt) for r in out.collect()}
    assert got == _duck_rule4(rows)
