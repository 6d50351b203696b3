"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with
a noop sink (count() alone can let Catalyst prune column work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_for_detection_banking_fraud_spark.plans import queries_map  # noqa: E402
from etl_pipeline_for_detection_banking_fraud_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "scan_filter_project",
    "join_chain",
    "groupby_agg",
    "topk_per_group",
    "timeband_window",
    "decreasing_triple",
    "asof_join",
    "scd2_apply",
    "sessionize",
    "first_per_group",
    "tpch_q3_shape",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_quality",
    "sim_cosine_topk",
]


REF_DATA = "/root/reference/data"


def _replay_secs(spark, incremental: bool) -> float | None:
    """Time the engine's actual product — the 3-day banking replay —
    end-to-end: faithful mode re-scans full fact history per day (the
    reference's posture), incremental mode reads partition-pruned
    day/lookback bands. The pair makes the scale mode's win a recorded
    number and catches rule-level regressions the catalog queries
    can't see."""
    import tempfile

    from etl_pipeline_for_detection_banking_fraud_spark.pipeline import DailyBatch
    from etl_pipeline_for_detection_banking_fraud_spark.sources.seed_dml import (
        load_seed_dims,
    )

    if not os.path.isdir(os.path.join(REF_DATA, "data")):
        return None
    dims = load_seed_dims(spark, os.path.join(REF_DATA, "ddl_dml.sql"))
    batch = DailyBatch(
        spark, tempfile.mkdtemp(prefix="bench_wh_"), dims, incremental=incremental
    )
    days = ["01032021", "02032021", "03032021"]
    t0 = time.perf_counter()
    for d in days:
        batch.run_day(
            os.path.join(REF_DATA, "data", f"transactions_{d}.txt"),
            os.path.join(REF_DATA, "data", f"passport_blacklist_{d}.xlsx"),
            os.path.join(REF_DATA, "data", f"terminals_{d}.xlsx"),
        )
    return round(time.perf_counter() - t0, 4)


def _rules_history_curve(spark, day_counts=(30, 90, 365)) -> dict[str, float] | None:
    """Fraud-rules phase vs fact-history LENGTH — the scaling curve that
    makes the incremental mode's point legible: faithful mode re-scans
    the whole fact table every day (the reference's posture), so its
    one-day cost grows with history; incremental mode reads a
    partition-pruned day/lookback band, so its cost is flat. The 3-day
    replay can't show this (history ~= day there).

    One master warehouse is seeded with day 1 and extended in place by
    date-shifting the day-1 feed (one broadcast-range crossJoin per
    extension, not N unions); each timed point runs ONE day's rules in
    each mode against a fresh copy of the master (run_fraud_rules
    appends to the mart, so reusing a warehouse would let rules 3-4's
    NOT-EXISTS dedup see the previous timing's hits and skew the write
    volume)."""
    import datetime
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_pipeline_for_detection_banking_fraud_spark.pipeline import DailyBatch
    from etl_pipeline_for_detection_banking_fraud_spark.sources.csv_source import (
        read_transactions,
    )
    from etl_pipeline_for_detection_banking_fraud_spark.sources.seed_dml import (
        load_seed_dims,
    )

    if not os.path.isdir(os.path.join(REF_DATA, "data")):
        return None
    dims = load_seed_dims(spark, os.path.join(REF_DATA, "ddl_dml.sql"))
    master = tempfile.mkdtemp(prefix="bench_rules_master_")
    seed = DailyBatch(spark, master, dims)
    seed.run_day(  # seeds facts/blacklist/dim/mart for day 1
        os.path.join(REF_DATA, "data", "transactions_01032021.txt"),
        os.path.join(REF_DATA, "data", "passport_blacklist_01032021.xlsx"),
        os.path.join(REF_DATA, "data", "terminals_01032021.xlsx"),
    )
    tx = read_transactions(
        spark, os.path.join(REF_DATA, "data", "transactions_01032021.txt")
    )
    day1 = datetime.date(2021, 3, 1)
    out: dict[str, float] = {}
    have_days = 1
    for n_days in sorted(day_counts):
        if n_days > have_days:  # extend history: shifts have_days..n_days-1
            rng = spark.range(have_days, n_days).select(
                F.col("id").cast("int").alias("shift")
            )
            ext = (
                tx.crossJoin(F.broadcast(rng))
                .withColumn(
                    "transaction_date",
                    F.col("transaction_date")
                    + F.make_dt_interval(days=F.col("shift")),
                )
                .withColumn(
                    "transaction_id", F.concat_ws("_", "transaction_id", "shift")
                )
                .drop("shift")
            )
            seed.wh.append_transactions(ext)
            have_days = n_days
        target = day1 + datetime.timedelta(days=n_days - 1)
        for mode, flag in (("full", False), ("incremental", True)):
            run_root = tempfile.mkdtemp(prefix="bench_rules_run_")
            shutil.rmtree(run_root)
            shutil.copytree(master, run_root)
            batch = DailyBatch(spark, run_root, dims, incremental=flag)
            t0 = time.perf_counter()
            batch.run_fraud_rules(target)
            out[f"rules_{mode}_{n_days}d"] = round(time.perf_counter() - t0, 4)
            shutil.rmtree(run_root, ignore_errors=True)
    shutil.rmtree(master, ignore_errors=True)
    # r1-r3 recorded the 90-day pair under these names; keep them stable
    if "rules_full_90d" in out:
        out["rules_full_history"] = out["rules_full_90d"]
        out["rules_incremental_day"] = out["rules_incremental_90d"]
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="fraud_etl_bench")
    qmap = queries_map()

    names = [n for n in HEADLINE if n in qmap]
    # Warm the JVM so timings measure the PLANS, not one-time codegen/JIT
    # compilation: run every headline query shape once at the smallest SF
    # (the md5/higher-order-function/window codegen paths each cost ~1-2s
    # of first-touch compilation that is irrelevant at production scale).
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir) or warm_dir == sf_dir.rstrip("/"):
        warm_dir = None
    for name in names:
        try:
            qmap[name](spark, warm_dir or sf_dir).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass  # warmup is best-effort; the timed run surfaces real errors
        if warm_dir is None:
            break  # no small SF available: single-query JVM warmup only

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    # Pipeline replay pair (not folded into `value`, which stays the
    # headline-query total for round-over-round comparability).
    # Errors are RECORDED, not swallowed: a broken replay must not
    # masquerade as "reference data absent" in the bench JSON.
    replay = {}
    for mode, flag in (("replay_faithful", False), ("replay_incremental", True)):
        try:
            secs = _replay_secs(spark, flag)
        except Exception as e:
            replay[f"{mode}_error"] = str(e)[:300]
            secs = None
        if secs is not None:
            replay[mode] = secs
    try:
        replay.update(_rules_history_curve(spark) or {})
    except Exception as e:
        replay["rules_history_error"] = str(e)[:300]
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if replay:
        out["replay"] = replay
    print(json.dumps(out))


if __name__ == "__main__":
    main()
