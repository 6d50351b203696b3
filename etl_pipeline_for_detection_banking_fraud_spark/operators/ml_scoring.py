"""MLlib fraud scoring on top of the rule engine (north-star surface:
"DataFrame ops + MLlib for fraud detection").

The four reference rules are hard predicates; this module adds the
learned layer a production deployment puts beside them: per-transaction
behavioral features engineered with the SAME window machinery as the
rules (trailing-hour counts, amount deltas, reject streaks, city
changes), an assembled MLlib pipeline (scaler + logistic regression),
and a scoring API that appends a fraud probability to every
transaction. Labels come from the rule engine itself (weak
supervision), so the model generalizes the rules' signal to
near-misses. All feature engineering is JVM-side window algebra — the
ML boundary is the only place vectors appear.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FEATURE_COLS = [
    "amount_d", "hour_of_day", "is_reject", "n_prior_hr", "n_prior_rejects_hr",
    "amount_drop", "gap_since_prev", "city_changed",
]


def engineer_features(tx: DataFrame, terminals_hist: DataFrame | None = None) -> DataFrame:
    """Per-transaction behavioral features over the card's trailing hour."""
    from .fraud_rules import _city_asof

    base = tx
    if terminals_hist is not None:
        # left: every transaction keeps a feature row even when no
        # dimension version is in effect at its timestamp. dropDuplicates:
        # the faithful SCD2 apply can carry identical duplicate versions
        # (SURVEY §2 J7 quirk) which would multiply feature rows.
        base = _city_asof(tx, terminals_hist.dropDuplicates(), "c", how="left")
    else:
        base = base.withColumn("c_city", F.lit(None).cast("string"))

    base = base.withColumn("_ts", F.col("transaction_date").cast("long"))
    w_hr = Window.partitionBy("card_num").orderBy("_ts").rangeBetween(-3599, -1)
    w_seq = Window.partitionBy("card_num").orderBy("_ts", "transaction_id")

    prev_amount = F.lag(F.col("amount").cast("double")).over(w_seq)
    prev_ts = F.lag("_ts").over(w_seq)
    prev_city = F.lag("c_city").over(w_seq)
    return (
        base.withColumn("amount_d", F.col("amount").cast("double"))
        .withColumn("hour_of_day", F.hour("transaction_date").cast("double"))
        .withColumn("is_reject", (F.col("oper_result") == "REJECT").cast("double"))
        .withColumn("n_prior_hr", F.count("*").over(w_hr).cast("double"))
        .withColumn(
            "n_prior_rejects_hr",
            F.count(F.when(F.col("oper_result") == "REJECT", 1)).over(w_hr).cast("double"),
        )
        .withColumn(
            "amount_drop",
            F.coalesce(
                (prev_amount - F.col("amount").cast("double")) / F.greatest(prev_amount, F.lit(1.0)),
                F.lit(0.0),
            ),
        )
        .withColumn(
            "gap_since_prev",
            F.coalesce((F.col("_ts") - prev_ts).cast("double"), F.lit(86400.0)),
        )
        .withColumn(
            "city_changed",
            F.coalesce(
                (~F.col("c_city").eqNullSafe(prev_city)).cast("double"), F.lit(0.0)
            ),
        )
        .drop("_ts")
    )


def label_from_rules(features: DataFrame, rule_hits: DataFrame,
                     cards: DataFrame, accounts: DataFrame,
                     clients: DataFrame) -> DataFrame:
    """Weak supervision: label = 1 where the rule engine flagged the
    transaction's (card's client passport, event time).

    The feature rows are resolved to their client passport through the
    broadcast card->account->client chain (left joins: a card missing
    from the dims keeps its feature row, unlabeled) and matched to hits
    on BOTH passport and event time — a transaction on a different card
    that merely shares a timestamp with a hit stays label 0."""
    ca = F.broadcast(cards.select("card_num", "account"))
    ac = F.broadcast(accounts.select("account", "client"))
    cl = F.broadcast(clients.select("client_id", "passport_num"))
    enriched = (
        features.join(ca, "card_num", "left")
        .join(ac, "account", "left")
        .join(cl, F.col("client") == F.col("client_id"), "left")
    )
    hits = rule_hits.select(
        F.col("passport").alias("passport_num"),
        F.col("event_dt").alias("transaction_date"),
    ).distinct().withColumn("label", F.lit(1.0))
    return (
        enriched.join(hits, ["passport_num", "transaction_date"], "left")
        .fillna({"label": 0.0})
        .drop("account", "client", "client_id", "passport_num")
    )


def build_pipeline() -> Pipeline:
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features_raw")
    scaler = StandardScaler(inputCol="features_raw", outputCol="features")
    lr = LogisticRegression(featuresCol="features", labelCol="label",
                            probabilityCol="probability", maxIter=25, regParam=0.01)
    return Pipeline(stages=[assembler, scaler, lr])


def train_scorer(labeled: DataFrame) -> PipelineModel:
    return build_pipeline().fit(labeled)


def score(model: PipelineModel, features: DataFrame) -> DataFrame:
    """Append fraud_score (P(label=1)) to each transaction."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(features)
    return scored.withColumn(
        "fraud_score", vector_to_array("probability")[1]
    ).drop("features_raw", "features", "rawPrediction", "probability", "prediction")
