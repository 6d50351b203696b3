"""Custom stateful streaming operator: the amount-guessing state machine.

Fraud rule 4 (reference: loading_rep_fraud.py:98-129) as a true
streaming operator: per-card state holds the trailing 20 minutes of
REJECT (ts, amount) attempts; a SUCCESS transaction emits a hit when
two prior REJECTs form a strictly-decreasing chain inside the span.
State is bounded in BOTH dimensions — per key (trail pruned to the
1200s band + row-capped) and in key count (event-time timeout evicts a
card once the watermark passes its last REJECT + band) — so it runs
indefinitely; this is the ``applyInPandasWithState`` shape Spark
prescribes for operators its built-in windows can't express.

Batch-mode equivalence is tested against the window formulation in
operators/fraud_rules.py on the same planted fixtures.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BAND_SECONDS = 1200
MAX_STATE_ROWS = 64  # hard cap per card: bounded state no matter the input

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("card_num", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("amount", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_list", T.ArrayType(T.LongType())),
        T.StructField("am_list", T.ArrayType(T.DoubleType())),
    ]
)


def _detect(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (card,) = key
    if state.hasTimedOut:
        # watermark passed this card's last-reject + band: no future
        # SUCCESS can pair with the stored trail — evict the key.
        state.remove()
        return
    if state.exists:
        ts_list, am_list = state.get
        ts_list, am_list = list(ts_list), list(am_list)
    else:
        ts_list, am_list = [], []

    hits_ts, hits_am = [], []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("ts_sec")
        for ts, am, res in zip(pdf["ts_sec"], pdf["amount"], pdf["oper_result"]):
            # prune state outside the band relative to the newest event
            while ts_list and ts - ts_list[0] >= BAND_SECONDS:
                ts_list.pop(0)
                am_list.pop(0)
            if res == "REJECT":
                # sorted insert: a later microbatch can deliver an older
                # (late-but-within-watermark) REJECT, so append would
                # leave the trail unordered — then ts_list[0]-based
                # pruning and ts_list[-1]-based eviction both key off
                # the wrong element.
                pos = bisect.bisect_right(ts_list, int(ts))
                ts_list.insert(pos, int(ts))
                am_list.insert(pos, float(am))
                if len(ts_list) > MAX_STATE_ROWS:
                    ts_list.pop(0)
                    am_list.pop(0)
            elif res == "SUCCESS":
                found = False
                n = len(ts_list)
                for j in range(n):  # t2 candidate
                    if found:
                        break
                    if not (am_list[j] > am and ts_list[j] < ts):
                        continue
                    for i in range(j):  # t1 candidate, earlier than t2
                        if am_list[i] > am_list[j] and ts_list[i] < ts_list[j]:
                            found = True
                            break
                if found:
                    hits_ts.append(ts)
                    hits_am.append(float(am))

    if ts_list:
        state.update((ts_list, am_list))
        # Event-time eviction: an idle card's trail is dead once the
        # watermark passes its newest REJECT + band (no later SUCCESS
        # can land inside the span). Without this, every card ever seen
        # holds state forever — unbounded KEY growth on a stream of
        # billions of cards, even with the per-key row cap.
        # max(), not [-1]: belt-and-braces with the sorted insert above —
        # eviction must key off the NEWEST reject or a late arrival
        # shortens the trail's lifetime and drops still-completable hits.
        timeout_at = (max(ts_list) + BAND_SECONDS) * 1000
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_at, wm + 1000))
    else:
        # empty trail == no state: don't keep a row for this card at all
        state.remove()
    if hits_ts:
        yield pd.DataFrame(
            {
                "card_num": [card] * len(hits_ts),
                "event_ts": pd.to_datetime(hits_ts, unit="s"),
                "amount": hits_am,
            }
        )


CITY_BAND_SECONDS = 3600
CITY_MAX_STATE_ROWS = 256  # trail holds ALL tx (any row can witness)

CITY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("card_num", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)

CITY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_list", T.ArrayType(T.LongType())),
        T.StructField("city_list", T.ArrayType(T.StringType())),
    ]
)


def _detect_city(key, pdf_iter: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    """Fraud rule 3 (reference: loading_rep_fraud.py:64-92) as a per-card
    state machine: the trail holds the trailing hour of (ts, city) for
    EVERY transaction (any row is a witness); a SUCCESS row emits a hit
    when a strictly-earlier trail entry inside 3599s carries a different
    non-null city. Same batch-form semantics as
    ``operators/fraud_rules.rule3_diff_cities_window`` (equal-second
    rows never witness each other; null cities neither hit nor
    witness); same state bounds as the rule-4 machine next door —
    per-key band-pruned + row-capped trail, event-time timeout evicting
    idle cards."""
    (card,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        ts_list, city_list = state.get
        ts_list, city_list = list(ts_list), list(city_list)
    else:
        ts_list, city_list = [], []

    hits_ts = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("ts_sec")
        for ts, city, res in zip(pdf["ts_sec"], pdf["city"], pdf["oper_result"]):
            ts = int(ts)
            city = city if isinstance(city, str) else None
            while ts_list and ts - ts_list[0] >= CITY_BAND_SECONDS:
                ts_list.pop(0)
                city_list.pop(0)
            if (
                res == "SUCCESS"
                and city is not None
                and any(
                    t < ts and c is not None and c != city
                    for t, c in zip(ts_list, city_list)
                )
            ):
                hits_ts.append(ts)
            pos = bisect.bisect_right(ts_list, ts)
            ts_list.insert(pos, ts)
            city_list.insert(pos, city)
            if len(ts_list) > CITY_MAX_STATE_ROWS:
                ts_list.pop(0)
                city_list.pop(0)

    if ts_list:
        state.update((ts_list, city_list))
        timeout_at = (max(ts_list) + CITY_BAND_SECONDS) * 1000
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_at, wm + 1000))
    else:
        state.remove()
    if hits_ts:
        yield pd.DataFrame(
            {
                "card_num": [card] * len(hits_ts),
                "event_ts": pd.to_datetime(hits_ts, unit="s"),
            }
        )


def city_hop_stream(tx_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Apply the rule-3 city-hop state machine to a (streaming)
    transactions DF already carrying a ``city`` column (stream-static
    broadcast join against the terminals dimension snapshot in effect —
    the streaming analogue of the batch rule's SCD2 as-of resolve; at
    100 TB the same topology joins against the latest dim version per
    microbatch).

    Input needs columns card_num, transaction_date, city, oper_result.
    State is bounded per key (hour-band-pruned, row-capped trail) and
    in key count (event-time timeout: a card evicts once the watermark
    passes its newest transaction + band)."""
    from pyspark.sql import functions as F

    # transaction_date stays in the projection: it carries the watermark
    prepared = tx_stream.withWatermark("transaction_date", watermark).select(
        "card_num",
        "transaction_date",
        F.col("transaction_date").cast("long").alias("ts_sec"),
        F.col("city"),
        "oper_result",
    )
    return prepared.groupBy("card_num").applyInPandasWithState(
        _detect_city,
        outputStructType=CITY_OUTPUT_SCHEMA,
        stateStructType=CITY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def amount_guessing_stream(tx_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Apply the per-card state machine to a (streaming) transactions DF.

    Input needs columns card_num, transaction_date, amount, oper_result.
    ``watermark`` bounds late data AND drives state-key eviction: a
    card's trail times out once the watermark passes its newest REJECT
    + the 20-minute band, so total state is O(cards active in the last
    watermark+band), not O(cards ever seen).
    """
    from pyspark.sql import functions as F

    # transaction_date stays in the projection: it CARRIES the watermark
    # (selecting it away would detach the event-time attribute and break
    # the event-time timeout).
    prepared = tx_stream.withWatermark("transaction_date", watermark).select(
        "card_num",
        "transaction_date",
        F.col("transaction_date").cast("long").alias("ts_sec"),
        F.col("amount").cast("double").alias("amount"),
        "oper_result",
    )
    return prepared.groupBy("card_num").applyInPandasWithState(
        _detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
