"""Stateful streaming operator tests: the amount-guessing state machine,
including state carry-over ACROSS micro-batches (the thing the batch
window formulation never has to do)."""

from __future__ import annotations

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
