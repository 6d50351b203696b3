"""Hot-card memory guards for the window-form fraud rules.

A card with k transactions per band is the bot-attack shape — exactly
the scenario a fraud engine must survive. The rule-4 window form's
per-row trail is O(k) (O(k^2) per card total), so hot cards are routed
through an exact O(k)-memory applyInPandas scan instead; these tests
plant a 5k-tx/20-min card and assert (a) the hot path is taken and
detects, (b) it is bit-equivalent to the join form on mixed data, and
(c) rule 3's window (bounded collect_set) survives the same fixture.
"""

from __future__ import annotations

import datetime
import random
from decimal import Decimal

from etl_pipeline_for_detection_banking_fraud_spark import schemas
from etl_pipeline_for_detection_banking_fraud_spark.functions.scalars import SCD2_OPEN_END_DATE
from etl_pipeline_for_detection_banking_fraud_spark.operators import fraud_rules as fr

D = datetime.date
TS = datetime.datetime
REPORT_D = D(2021, 3, 3)
BASE = TS(2021, 3, 1, 10, 0, 0)


def _tx_df(spark, rows):
    data = [
        (f"t{i}", ts, Decimal(str(am)).quantize(Decimal("0.01")), card, "PAYMENT", res, term)
        for i, (ts, am, card, res, term) in enumerate(rows)
    ]
    return spark.createDataFrame(data, schema=schemas.TRANSACTIONS)


def _dims(spark):
    cards = spark.createDataFrame(
        [("C1", "A1", D(2001, 1, 1), None)], schema=schemas.CARDS
    )
    accounts = spark.createDataFrame(
        [("A1", D(2030, 1, 1), "CL1", D(1900, 1, 1), None)], schema=schemas.ACCOUNTS
    )
    clients = spark.createDataFrame(
        [("CL1", "Ivanov", "Ivan", None, D(1980, 1, 1), "1111 111111",
          None, "+7 900 000-00-01", D(1900, 1, 1), None)],
        schema=schemas.CLIENTS,
    )
    return cards, accounts, clients


def _empty_mart(spark):
    return spark.createDataFrame([], schema=schemas.REP_FRAUD)


def test_rule4_hot_card_5k_routes_and_detects(spark):
    """5000 same-card transactions inside one 20-minute band: the trail
    path would build ~5000 arrays of ~5000 structs on one task; the
    guard must route the card to the O(k) path and still find the
    planted decreasing REJECT,REJECT,SUCCESS triple."""
    cards, accounts, clients = _dims(spark)
    rows = []
    for i in range(4998):
        ts = BASE + datetime.timedelta(seconds=i // 5)  # ~1000s span
        rows.append((ts, 1000 + (i % 500), "C1", "REJECT", "T_A"))
    # SUCCESS above every REJECT amount: must NOT fire
    rows.append((BASE + datetime.timedelta(seconds=1050), 99999, "C1", "SUCCESS", "T_A"))
    # SUCCESS below a decreasing REJECT pair: must fire
    hit_ts = BASE + datetime.timedelta(seconds=1100)
    rows.append((hit_ts, 5, "C1", "SUCCESS", "T_A"))
    tx = _tx_df(spark, rows)

    out = fr.rule4_amount_guessing_window(
        tx, cards, accounts, clients, _empty_mart(spark), REPORT_D
    ).collect()
    assert [(r.passport, r.event_dt) for r in out] == [("1111 111111", hit_ts)]

    # the guard actually routed: peak REJECTs-per-band exceeds the default cap
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = (
        Window.partitionBy("card_num")
        .orderBy(F.col("transaction_date").cast("long"))
        .rangeBetween(-1199, -1)
    )
    peak = (
        tx.withColumn(
            "_n", F.count(F.when(F.col("oper_result") == "REJECT", 1)).over(w)
        )
        .agg(F.max("_n"))
        .first()[0]
    )
    assert peak > 512


def test_rule4_hot_path_matches_join_form(spark):
    """Random mixed traffic forced down the hot path (threshold=3) must
    reproduce the literal triple-join exactly — including ts ties,
    interleaved SUCCESS rows, and boundary spans."""
    rng = random.Random(42)
    rows = []
    for card in ("C1",):
        for _ in range(80):
            ts = BASE + datetime.timedelta(seconds=rng.randrange(0, 2400))
            am = rng.randrange(1, 40) * 10
            res = rng.choice(["REJECT", "REJECT", "SUCCESS"])
            rows.append((ts, am, card, res, "T_A"))
    cards, accounts, clients = _dims(spark)
    tx = _tx_df(spark, rows)
    mart = _empty_mart(spark)

    ref = fr.rule4_amount_guessing_join(tx, cards, accounts, clients, mart, REPORT_D)
    hot = fr.rule4_amount_guessing_window(
        tx, cards, accounts, clients, mart, REPORT_D, hot_card_threshold=3
    )
    cold = fr.rule4_amount_guessing_window(
        tx, cards, accounts, clients, mart, REPORT_D, hot_card_threshold=10_000
    )
    ra = sorted((r.passport, r.event_dt) for r in ref.collect())
    rh = sorted((r.passport, r.event_dt) for r in hot.collect())
    rc = sorted((r.passport, r.event_dt) for r in cold.collect())
    assert ra == rh == rc
    assert len(ra) > 0  # fixture actually plants hits


def test_rule3_window_survives_hot_card(spark):
    """Rule 3's collect_set trail is bounded by distinct cities, not by
    transactions — the same 5k-tx card must complete on the window path
    and flag exactly the cross-city rows."""
    cards, accounts, clients = _dims(spark)
    hist = spark.createDataFrame(
        [
            ("T_A", "POS", "CityA", "a1", D(2021, 1, 1), SCD2_OPEN_END_DATE, False),
            ("T_B", "POS", "CityB", "a2", D(2021, 1, 1), SCD2_OPEN_END_DATE, False),
        ],
        schema=schemas.TERMINALS_HIST,
    )
    rows = [
        (BASE + datetime.timedelta(seconds=i // 5), 10, "C1", "SUCCESS", "T_A")
        for i in range(5000)
    ]
    hit_ts = BASE + datetime.timedelta(seconds=1100)
    rows.append((hit_ts, 10, "C1", "SUCCESS", "T_B"))  # different city in-band
    tx = _tx_df(spark, rows)
    out = fr.rule3_diff_cities_window(
        tx, cards, accounts, clients, hist, _empty_mart(spark), REPORT_D
    ).collect()
    assert [(r.passport, r.event_dt) for r in out] == [("1111 111111", hit_ts)]


def test_rule3_many_cities_bot_routes_hot_and_matches_join(spark):
    """The round-4 advisory shape: a bot sweeping thousands of DISTINCT
    terminals/cities inside one hour grew the old collect_set trail
    without bound. The min/max form keeps per-row frame state constant,
    the guard routes the card to the exact O(k) two-pointer path, and
    all three formulations (literal self-join, cold window, hot window)
    agree exactly."""
    cards, accounts, clients = _dims(spark)
    n = 4500  # > default hot_card_threshold inside one band
    hist = spark.createDataFrame(
        [
            (f"T{i}", "POS", f"City{i}", "a", D(2021, 1, 1), SCD2_OPEN_END_DATE, False)
            for i in range(n)
        ],
        schema=schemas.TERMINALS_HIST,
    )
    rng = random.Random(11)
    rows = []
    for i in range(n):  # one tx per second, each on its own terminal
        ts = BASE + datetime.timedelta(seconds=i)
        res = "SUCCESS" if rng.random() < 0.2 else "REJECT"
        rows.append((ts, 10, "C1", res, f"T{i}"))
    tx = _tx_df(spark, rows)
    mart = _empty_mart(spark)

    ref = fr.rule3_diff_cities_join(tx, cards, accounts, clients, hist, mart, REPORT_D)
    hot = fr.rule3_diff_cities_window(
        tx, cards, accounts, clients, hist, mart, REPORT_D
    )  # default threshold: routed hot (peak band population ~3600 > 4096? no —
    # peak is min(n, 3599) prior rows; with n=4500 the peak is 3599 < 4096,
    # so force the route with an explicit low threshold below instead
    forced_hot = fr.rule3_diff_cities_window(
        tx, cards, accounts, clients, hist, mart, REPORT_D, hot_card_threshold=64
    )
    cold = fr.rule3_diff_cities_window(
        tx, cards, accounts, clients, hist, mart, REPORT_D,
        hot_card_threshold=10_000_000,
    )
    ra = sorted((r.passport, r.event_dt) for r in ref.collect())
    rh = sorted((r.passport, r.event_dt) for r in hot.collect())
    rf = sorted((r.passport, r.event_dt) for r in forced_hot.collect())
    rc = sorted((r.passport, r.event_dt) for r in cold.collect())
    assert ra == rh == rf == rc
    assert len(ra) > 100  # the sweep really plants cross-city hits


def test_rule3_hot_path_matches_join_form_random(spark):
    """Random mixed traffic — ts ties, null cities (a hist version with
    NULL terminal_city), interleaved results — forced down the hot path
    must reproduce the literal self-join exactly."""
    cards, accounts, clients = _dims(spark)
    hist = spark.createDataFrame(
        [
            ("T_A", "POS", "CityA", "a1", D(2021, 1, 1), SCD2_OPEN_END_DATE, False),
            ("T_B", "POS", "CityB", "a2", D(2021, 1, 1), SCD2_OPEN_END_DATE, False),
            ("T_C", "POS", "CityC", "a3", D(2021, 1, 1), SCD2_OPEN_END_DATE, False),
            ("T_N", "POS", None, "a4", D(2021, 1, 1), SCD2_OPEN_END_DATE, False),
        ],
        schema=schemas.TERMINALS_HIST,
    )
    rng = random.Random(23)
    rows = []
    for _ in range(300):
        ts = BASE + datetime.timedelta(seconds=rng.randrange(0, 7200))
        term = rng.choice(["T_A", "T_A", "T_B", "T_C", "T_N"])
        res = rng.choice(["SUCCESS", "SUCCESS", "REJECT"])
        rows.append((ts, 10, "C1", res, term))
    tx = _tx_df(spark, rows)
    mart = _empty_mart(spark)

    ref = fr.rule3_diff_cities_join(tx, cards, accounts, clients, hist, mart, REPORT_D)
    hot = fr.rule3_diff_cities_window(
        tx, cards, accounts, clients, hist, mart, REPORT_D, hot_card_threshold=3
    )
    cold = fr.rule3_diff_cities_window(
        tx, cards, accounts, clients, hist, mart, REPORT_D,
        hot_card_threshold=10_000_000,
    )
    ra = sorted((r.passport, r.event_dt) for r in ref.collect())
    rh = sorted((r.passport, r.event_dt) for r in hot.collect())
    rc = sorted((r.passport, r.event_dt) for r in cold.collect())
    assert ra == rh == rc
    assert len(ra) > 0


def test_rule4_success_flood_routes_cpu_axis(spark):
    """The second routing axis: 10k SUCCESS rows + 2 REJECTs in one
    band is memory-safe (trail holds only REJECTs) but the sliding
    frame recompute makes it an O(k^2)-CPU straggler — total band
    population must route it to the exact O(k) path, which still finds
    exactly the planted decreasing triple."""
    cards, accounts, clients = _dims(spark)
    rows = []
    for i in range(10000):  # flood: high-amount SUCCESS, never a hit
        ts = BASE + datetime.timedelta(seconds=i // 10)  # 1000s span
        rows.append((ts, 99999, "C1", "SUCCESS", "T_A"))
    rows.append((BASE + datetime.timedelta(seconds=1010), 300, "C1", "REJECT", "T_A"))
    rows.append((BASE + datetime.timedelta(seconds=1020), 200, "C1", "REJECT", "T_A"))
    hit_ts = BASE + datetime.timedelta(seconds=1030)
    rows.append((hit_ts, 100, "C1", "SUCCESS", "T_A"))
    tx = _tx_df(spark, rows)

    out = fr.rule4_amount_guessing_window(
        tx, cards, accounts, clients, _empty_mart(spark), REPORT_D
    ).collect()
    assert [(r.passport, r.event_dt) for r in out] == [("1111 111111", hit_ts)]

    # the REJECT axis alone would NOT have routed this card
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = (
        Window.partitionBy("card_num")
        .orderBy(F.col("transaction_date").cast("long"))
        .rangeBetween(-1199, -1)
    )
    peaks = tx.withColumn(
        "_rej", F.count(F.when(F.col("oper_result") == "REJECT", 1)).over(w)
    ).withColumn("_all", F.count(F.lit(1)).over(w)).agg(
        F.max("_rej"), F.max("_all")
    ).first()
    assert peaks[0] <= 512 and peaks[1] > 8192
