"""Planted-fixture boundary tests for the four fraud rules
(FIXTURES.md §8: each rule gets positives AND boundary negatives), plus
join-vs-window formulation equivalence for rules 3/4.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest

from etl_pipeline_for_detection_banking_fraud_spark import schemas
from etl_pipeline_for_detection_banking_fraud_spark.functions.scalars import SCD2_OPEN_END_DATE
from etl_pipeline_for_detection_banking_fraud_spark.operators import fraud_rules as fr

D = datetime.date
TS = datetime.datetime
REPORT_D = D(2021, 3, 3)


def _tx(spark, rows):
    data = [
        (f"t{i}", ts, Decimal(str(am)).quantize(Decimal("0.01")), card, "PAYMENT", res, term)
        for i, (ts, am, card, res, term) in enumerate(rows)
    ]
    return spark.createDataFrame(data, schema=schemas.TRANSACTIONS)


@pytest.fixture(scope="module")
def dims(spark):
    cards = spark.createDataFrame(
        [("C1", "A1", D(2001, 1, 1), None), ("C2", "A2", D(2001, 1, 1), None)],
        schema=schemas.CARDS,
    )
    accounts = spark.createDataFrame(
        [
            ("A1", D(2021, 3, 2), "CL1", D(1900, 1, 1), None),  # expires Mar 2
            ("A2", D(2030, 1, 1), "CL2", D(1900, 1, 1), None),
        ],
        schema=schemas.ACCOUNTS,
    )
    clients = spark.createDataFrame(
        [
            ("CL1", "Ivanov", "Ivan", None, D(1980, 1, 1), "1111 111111",
             D(2021, 3, 2), "+7 900 000-00-01", D(1900, 1, 1), None),
            ("CL2", "Petrov", "Petr", "Petrovich", D(1985, 1, 1), "2222 222222",
             None, "+7 900 000-00-02", D(1900, 1, 1), None),
        ],
        schema=schemas.CLIENTS,
    )
    return cards, accounts, clients


@pytest.fixture(scope="module")
def empty_mart(spark):
    return spark.createDataFrame([], schema=schemas.REP_FRAUD)


def test_rule1_expired_and_blacklist_boundaries(spark, dims):
    cards, accounts, clients = dims
    bl = spark.createDataFrame([(D(2021, 3, 2), "2222 222222")],
                               schema=schemas.PASSPORT_BLACKLIST)
    tx = _tx(spark, [
        # CL1 passport expires 2021-03-02: tx on Mar 2 NOT fraud (strict <), Mar 3 fraud
        (TS(2021, 3, 2, 10, 0, 0), 10, "C1", "SUCCESS", "P1"),
        (TS(2021, 3, 3, 10, 0, 0), 10, "C1", "SUCCESS", "P1"),
        # CL2 blacklisted Mar 2: tx ON the blacklist date not fraud (> not >=)
        (TS(2021, 3, 2, 12, 0, 0), 10, "C2", "SUCCESS", "P1"),
        (TS(2021, 3, 3, 12, 0, 0), 10, "C2", "SUCCESS", "P1"),
        # REJECT result never reported
        (TS(2021, 3, 3, 13, 0, 0), 10, "C2", "REJECT", "P1"),
    ])
    out = fr.rule1_passport(tx, cards, accounts, clients, bl, REPORT_D).collect()
    got = {(r.passport, r.event_dt) for r in out}
    assert got == {
        ("1111 111111", TS(2021, 3, 3, 10, 0, 0)),
        ("2222 222222", TS(2021, 3, 3, 12, 0, 0)),
    }
    fio = {r.passport: r.fio for r in out}
    assert fio["1111 111111"] == "Ivanov Ivan "  # NULL patronymic -> trailing space
    assert fio["2222 222222"] == "Petrov Petr Petrovich"


def test_rule2_contract_boundary(spark, dims):
    cards, accounts, clients = dims
    tx = _tx(spark, [
        (TS(2021, 3, 2, 9, 0, 0), 10, "C1", "SUCCESS", "P1"),   # on valid_to: ok
        (TS(2021, 3, 3, 9, 0, 0), 10, "C1", "SUCCESS", "P1"),   # after: fraud
        (TS(2021, 3, 3, 9, 30, 0), 10, "C1", "REJECT", "P1"),   # reject: ignored
        (TS(2021, 3, 3, 9, 0, 0), 10, "C2", "SUCCESS", "P1"),   # valid contract
    ])
    out = fr.rule2_contract(tx, cards, accounts, clients, REPORT_D).collect()
    assert [(r.passport, r.event_dt) for r in out] == [
        ("1111 111111", TS(2021, 3, 3, 9, 0, 0))
    ]


@pytest.fixture(scope="module")
def terminals_hist(spark):
    # T_A in CityA always; T_B in CityB, address-versioned; T_C changes CITY
    # on Mar 3 (old version closed Mar 2)
    rows = [
        ("T_A", "POS", "CityA", "addr1", D(2021, 1, 1), SCD2_OPEN_END_DATE, False),
        ("T_B", "POS", "CityB", "addr2", D(2021, 1, 1), SCD2_OPEN_END_DATE, False),
        ("T_C", "POS", "CityA", "addr3", D(2021, 1, 1), D(2021, 3, 2), False),
        ("T_C", "POS", "CityC", "addr3", D(2021, 3, 3), SCD2_OPEN_END_DATE, False),
    ]
    return spark.createDataFrame(rows, schema=schemas.TERMINALS_HIST)


@pytest.mark.parametrize("impl", [fr.rule3_diff_cities_join, fr.rule3_diff_cities_window])
def test_rule3_boundaries(spark, dims, terminals_hist, empty_mart, impl):
    cards, accounts, clients = dims
    tx = _tx(spark, [
        # pair 3599s apart in different cities -> fraud on the second tx
        (TS(2021, 3, 1, 10, 0, 0), 10, "C1", "SUCCESS", "T_A"),
        (TS(2021, 3, 1, 10, 59, 59), 10, "C1", "SUCCESS", "T_B"),
        # pair exactly 3600s apart -> NOT fraud (strict <)
        (TS(2021, 3, 1, 14, 0, 0), 10, "C2", "SUCCESS", "T_A"),
        (TS(2021, 3, 1, 15, 0, 0), 10, "C2", "SUCCESS", "T_B"),
    ])
    out = impl(tx, cards, accounts, clients, terminals_hist, empty_mart, REPORT_D).collect()
    assert [(r.passport, r.event_dt) for r in out] == [
        ("1111 111111", TS(2021, 3, 1, 10, 59, 59))
    ]


@pytest.mark.parametrize("impl", [fr.rule3_diff_cities_join, fr.rule3_diff_cities_window])
def test_rule3_scd2_version_correctness(spark, dims, terminals_hist, empty_mart, impl):
    """Same terminal, city changed between versions: two txs at T_C and T_A
    within an hour on Mar 1 (T_C then in CityA) must NOT fire; on Mar 3
    (T_C now CityC) they must."""
    cards, accounts, clients = dims
    tx = _tx(spark, [
        (TS(2021, 3, 1, 10, 0, 0), 10, "C1", "SUCCESS", "T_C"),
        (TS(2021, 3, 1, 10, 30, 0), 10, "C1", "SUCCESS", "T_A"),  # same city then
        (TS(2021, 3, 3, 10, 0, 0), 10, "C2", "SUCCESS", "T_C"),
        (TS(2021, 3, 3, 10, 30, 0), 10, "C2", "SUCCESS", "T_A"),  # diff city now
    ])
    out = impl(tx, cards, accounts, clients, terminals_hist, empty_mart, REPORT_D).collect()
    assert [(r.passport, r.event_dt) for r in out] == [
        ("2222 222222", TS(2021, 3, 3, 10, 30, 0))
    ]


@pytest.mark.parametrize("impl", [fr.rule3_diff_cities_join, fr.rule3_diff_cities_window])
def test_rule3_dedup_against_mart(spark, dims, terminals_hist, impl):
    cards, accounts, clients = dims
    tx = _tx(spark, [
        (TS(2021, 3, 1, 10, 0, 0), 10, "C1", "SUCCESS", "T_A"),
        (TS(2021, 3, 1, 10, 30, 0), 10, "C1", "SUCCESS", "T_B"),
    ])
    mart = spark.createDataFrame(
        [(TS(2021, 3, 1, 10, 30, 0), "1111 111111", "Ivanov Ivan ", "+7 900 000-00-01",
          fr.EVENT_CITIES, D(2021, 3, 1))],
        schema=schemas.REP_FRAUD,
    )
    out = impl(tx, cards, accounts, clients, terminals_hist, mart, REPORT_D).collect()
    assert out == []


@pytest.mark.parametrize("impl", [fr.rule4_amount_guessing_join, fr.rule4_amount_guessing_window])
def test_rule4_planted_triple(spark, dims, empty_mart, impl):
    cards, accounts, clients = dims
    tx = _tx(spark, [
        # decreasing REJECT,REJECT,SUCCESS inside 20 min -> fraud
        (TS(2021, 3, 1, 10, 0, 0), 300, "C1", "REJECT", "T_A"),
        (TS(2021, 3, 1, 10, 5, 0), 200, "C1", "REJECT", "T_A"),
        (TS(2021, 3, 1, 10, 10, 0), 100, "C1", "SUCCESS", "T_A"),
        # same pattern but total span exactly 1200s -> NOT fraud
        (TS(2021, 3, 1, 14, 0, 0), 300, "C2", "REJECT", "T_A"),
        (TS(2021, 3, 1, 14, 10, 0), 200, "C2", "REJECT", "T_A"),
        (TS(2021, 3, 1, 14, 20, 0), 100, "C2", "SUCCESS", "T_A"),
    ])
    out = impl(tx, cards, accounts, clients, empty_mart, REPORT_D).collect()
    assert [(r.passport, r.event_dt) for r in out] == [
        ("1111 111111", TS(2021, 3, 1, 10, 10, 0))
    ]


@pytest.mark.parametrize("impl", [fr.rule4_amount_guessing_join, fr.rule4_amount_guessing_window])
def test_rule4_negatives(spark, dims, empty_mart, impl):
    cards, accounts, clients = dims
    tx = _tx(spark, [
        # non-monotonic amounts
        (TS(2021, 3, 1, 10, 0, 0), 100, "C1", "REJECT", "T_A"),
        (TS(2021, 3, 1, 10, 5, 0), 200, "C1", "REJECT", "T_A"),
        (TS(2021, 3, 1, 10, 10, 0), 50, "C1", "SUCCESS", "T_A"),
        # wrong result pattern (REJECT, SUCCESS, SUCCESS)
        (TS(2021, 3, 1, 12, 0, 0), 300, "C2", "REJECT", "T_A"),
        (TS(2021, 3, 1, 12, 5, 0), 200, "C2", "SUCCESS", "T_A"),
        (TS(2021, 3, 1, 12, 10, 0), 100, "C2", "SUCCESS", "T_A"),
    ])
    out = impl(tx, cards, accounts, clients, empty_mart, REPORT_D).collect()
    assert out == []


def test_rule4_nonconsecutive_triple(spark, dims, empty_mart):
    """The reference joins ANY t1<t2<t3 — interleaved unrelated txs must
    not break detection. Both formulations must agree."""
    cards, accounts, clients = dims
    tx = _tx(spark, [
        (TS(2021, 3, 1, 10, 0, 0), 300, "C1", "REJECT", "T_A"),
        (TS(2021, 3, 1, 10, 2, 0), 50, "C1", "SUCCESS", "T_A"),   # interloper
        (TS(2021, 3, 1, 10, 5, 0), 200, "C1", "REJECT", "T_A"),
        (TS(2021, 3, 1, 10, 10, 0), 100, "C1", "SUCCESS", "T_A"),
    ])
    a = fr.rule4_amount_guessing_join(tx, cards, accounts, clients, empty_mart, REPORT_D)
    b = fr.rule4_amount_guessing_window(tx, cards, accounts, clients, empty_mart, REPORT_D)
    ra = sorted((r.passport, r.event_dt) for r in a.collect())
    rb = sorted((r.passport, r.event_dt) for r in b.collect())
    assert ra == rb == [("1111 111111", TS(2021, 3, 1, 10, 10, 0))]
