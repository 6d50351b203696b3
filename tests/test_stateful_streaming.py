"""Stateful streaming operator tests: the amount-guessing state machine,
including state carry-over ACROSS micro-batches (the thing the batch
window formulation never has to do)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # e2e/streaming/property lane

import datetime

from etl_pipeline_for_detection_banking_fraud_spark.streaming import ingest, stateful

HEADER = "transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal"


def _run_stream(spark, inbox, name):
    tx = ingest.read_transactions_stream(spark, str(inbox))
    hits = stateful.amount_guessing_stream(tx)
    q = (
        hits.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    q.processAllAvailable()
    return q


def test_triple_detected_within_batch(spark, tmp_path):
    inbox = tmp_path / "in1"
    inbox.mkdir()
    (inbox / "b1.csv").write_text(
        "\n".join([
            HEADER,
            "1;2021-03-01 10:00:00;300,00;C1;PAYMENT;REJECT;T",
            "2;2021-03-01 10:05:00;200,00;C1;PAYMENT;REJECT;T",
            "3;2021-03-01 10:10:00;100,00;C1;PAYMENT;SUCCESS;T",
            # span exactly 1200s -> no hit
            "4;2021-03-01 14:00:00;300,00;C2;PAYMENT;REJECT;T",
            "5;2021-03-01 14:10:00;200,00;C2;PAYMENT;REJECT;T",
            "6;2021-03-01 14:20:00;100,00;C2;PAYMENT;SUCCESS;T",
        ])
    )
    q = _run_stream(spark, inbox, "amount_hits_1")
    try:
        rows = spark.sql("SELECT card_num, event_ts FROM amount_hits_1").collect()
        assert [(r.card_num, r.event_ts) for r in rows] == [
            ("C1", datetime.datetime(2021, 3, 1, 10, 10))
        ]
    finally:
        q.stop()


def test_state_carries_across_microbatches(spark, tmp_path):
    """REJECTs arrive in batch 1; the completing SUCCESS in batch 2 —
    only per-card state makes the detection possible."""
    inbox = tmp_path / "in2"
    inbox.mkdir()
    (inbox / "b1.csv").write_text(
        "\n".join([
            HEADER,
            "1;2021-03-01 10:00:00;300,00;C1;PAYMENT;REJECT;T",
            "2;2021-03-01 10:05:00;200,00;C1;PAYMENT;REJECT;T",
        ])
    )
    tx = ingest.read_transactions_stream(spark, str(inbox), max_files_per_trigger=1)
    hits = stateful.amount_guessing_stream(tx)
    q = (
        hits.writeStream.outputMode("append").format("memory")
        .queryName("amount_hits_2").start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM amount_hits_2").count() == 0
        (inbox / "b2.csv").write_text(
            "\n".join([
                HEADER,
                "3;2021-03-01 10:10:00;100,00;C1;PAYMENT;SUCCESS;T",
            ])
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT card_num, event_ts FROM amount_hits_2").collect()
        assert [(r.card_num, r.event_ts) for r in rows] == [
            ("C1", datetime.datetime(2021, 3, 1, 10, 10))
        ]
    finally:
        q.stop()


def test_idle_card_state_is_evicted(spark, tmp_path):
    """A card whose trail can no longer complete a triple (watermark
    passed its last REJECT + band) must be EVICTED from the state store
    — otherwise state grows with every card ever seen. Also: a card
    that never stored a REJECT holds no state row at all."""
    inbox = tmp_path / "in3"
    inbox.mkdir()
    (inbox / "b1.csv").write_text(
        "\n".join([
            HEADER,
            "1;2021-03-01 10:00:00;300,00;C1;PAYMENT;REJECT;T",
            "2;2021-03-01 10:00:00;300,00;C2;PAYMENT;SUCCESS;T",  # no trail
        ])
    )
    tx = ingest.read_transactions_stream(spark, str(inbox), max_files_per_trigger=1)
    hits = stateful.amount_guessing_stream(tx)
    q = (
        hits.writeStream.outputMode("append").format("memory")
        .queryName("amount_hits_3").start()
    )

    def state_rows():
        progress = [p for p in q.recentProgress if p["stateOperators"]]
        return progress[-1]["stateOperators"][0]["numRowsTotal"]

    try:
        q.processAllAvailable()
        assert state_rows() == 1  # C1's trail; C2 stored nothing

        # a much later event advances the watermark (1h delay) far past
        # C1's 10:20 timeout; two triggers so the new watermark is
        # applied to the state store
        (inbox / "b2.csv").write_text(
            "\n".join([
                HEADER,
                "3;2021-03-02 10:00:00;50,00;C3;PAYMENT;SUCCESS;T",
            ])
        )
        q.processAllAvailable()
        (inbox / "b3.csv").write_text(
            "\n".join([
                HEADER,
                "4;2021-03-02 11:00:00;50,00;C3;PAYMENT;SUCCESS;T",
            ])
        )
        q.processAllAvailable()
        assert state_rows() == 0  # C1 evicted; C3 never stored
    finally:
        q.stop()


def test_detection_still_works_with_eviction_enabled(spark, tmp_path):
    """Eviction must not fire early: a SUCCESS inside the band (and
    inside the watermark) still completes the triple stored in state."""
    inbox = tmp_path / "in4"
    inbox.mkdir()
    (inbox / "b1.csv").write_text(
        "\n".join([
            HEADER,
            "1;2021-03-01 10:00:00;300,00;C1;PAYMENT;REJECT;T",
            "2;2021-03-01 10:05:00;200,00;C1;PAYMENT;REJECT;T",
        ])
    )
    tx = ingest.read_transactions_stream(spark, str(inbox), max_files_per_trigger=1)
    hits = stateful.amount_guessing_stream(tx)
    q = (
        hits.writeStream.outputMode("append").format("memory")
        .queryName("amount_hits_4").start()
    )
    try:
        q.processAllAvailable()
        (inbox / "b2.csv").write_text(
            "\n".join([
                HEADER,
                "3;2021-03-01 10:15:00;100,00;C1;PAYMENT;SUCCESS;T",
            ])
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT card_num, event_ts FROM amount_hits_4").collect()
        assert [(r.card_num, r.event_ts) for r in rows] == [
            ("C1", datetime.datetime(2021, 3, 1, 10, 15))
        ]
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# Rule 3 city-hop state machine
# ---------------------------------------------------------------------------


def _city_stream(spark, inbox, snapshot):
    from pyspark.sql import functions as F

    tx = ingest.read_transactions_stream(spark, str(inbox))
    enriched = tx.join(
        F.broadcast(snapshot), tx.terminal == snapshot.terminal_id, "left"
    ).withColumn("city", snapshot.terminal_city)
    return stateful.city_hop_stream(enriched)


def _snapshot(spark):
    return spark.createDataFrame(
        [("T_A", "CityA"), ("T_B", "CityB")], "terminal_id string, terminal_city string"
    )


def test_city_hop_detected_within_batch(spark, tmp_path):
    import datetime as dt

    inbox = tmp_path / "c1"
    inbox.mkdir()
    (inbox / "b1.csv").write_text(
        "\n".join([
            HEADER,
            "1;2021-03-01 10:00:00;10,00;C1;PAYMENT;SUCCESS;T_A",
            "2;2021-03-01 10:30:00;10,00;C1;PAYMENT;SUCCESS;T_B",  # hit
            # same card, >1h later in another city -> no hit
            "3;2021-03-01 12:00:00;10,00;C1;PAYMENT;SUCCESS;T_A",
            # REJECT in a different city is not a hit (only SUCCESS hits)
            "4;2021-03-01 12:20:00;10,00;C1;PAYMENT;REJECT;T_B",
            # ...but it IS a witness for a later SUCCESS
            "5;2021-03-01 12:40:00;10,00;C1;PAYMENT;SUCCESS;T_A",  # hit
        ])
    )
    hits = _city_stream(spark, inbox, _snapshot(spark))
    q = hits.writeStream.outputMode("append").format("memory").queryName("city_1").start()
    try:
        q.processAllAvailable()
        rows = sorted(
            (r.card_num, r.event_ts)
            for r in spark.sql("SELECT * FROM city_1").collect()
        )
        assert rows == [
            ("C1", dt.datetime(2021, 3, 1, 10, 30)),
            ("C1", dt.datetime(2021, 3, 1, 12, 40)),
        ]
    finally:
        q.stop()


def test_city_hop_state_across_microbatches(spark, tmp_path):
    import datetime as dt

    inbox = tmp_path / "c2"
    inbox.mkdir()
    (inbox / "b1.csv").write_text(
        "\n".join([
            HEADER,
            "1;2021-03-01 10:00:00;10,00;C1;PAYMENT;SUCCESS;T_A",
        ])
    )
    hits = _city_stream(spark, inbox, _snapshot(spark))
    q = hits.writeStream.outputMode("append").format("memory").queryName("city_2").start()
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM city_2").count() == 0
        (inbox / "b2.csv").write_text(
            "\n".join([
                HEADER,
                "2;2021-03-01 10:45:00;10,00;C1;PAYMENT;SUCCESS;T_B",
            ])
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM city_2").collect()
        assert [(r.card_num, r.event_ts) for r in rows] == [
            ("C1", dt.datetime(2021, 3, 1, 10, 45))
        ]
    finally:
        q.stop()


def test_city_hop_state_eviction(spark, tmp_path):
    """A card idle past watermark + band must leave the state store."""
    inbox = tmp_path / "c3"
    inbox.mkdir()
    (inbox / "b1.csv").write_text(
        "\n".join([
            HEADER,
            "1;2021-03-01 10:00:00;10,00;C1;PAYMENT;SUCCESS;T_A",
        ])
    )
    hits = _city_stream(spark, inbox, _snapshot(spark))
    q = hits.writeStream.outputMode("append").format("memory").queryName("city_3").start()

    def state_rows():
        progress = [p for p in q.recentProgress if p["stateOperators"]]
        return progress[-1]["stateOperators"][0]["numRowsTotal"]

    try:
        q.processAllAvailable()
        assert state_rows() == 1
        (inbox / "b2.csv").write_text(
            "\n".join([
                HEADER,
                "2;2021-03-02 10:00:00;10,00;C2;PAYMENT;SUCCESS;T_A",
            ])
        )
        q.processAllAvailable()
        (inbox / "b3.csv").write_text(
            "\n".join([
                HEADER,
                "3;2021-03-02 11:00:00;10,00;C2;PAYMENT;SUCCESS;T_A",
            ])
        )
        q.processAllAvailable()
        assert state_rows() <= 2  # C1 evicted (only C2's trail, maybe 1)
        assert state_rows() >= 1
    finally:
        q.stop()
