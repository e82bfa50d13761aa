"""Supervised repurchase predictor (beyond-reference ML).

The reference's "predictor" script is heuristic scoring (no fit —
``scripts/train_predictor.py:130-165``); this adds the real model a
training-data pipeline would run: a time-split label (did the client
purchase in the holdout window?) with features computed strictly BEFORE
the cutoff — no leakage — and a ``pyspark.ml`` LogisticRegression.

Distributed shape: feature building is the same single-shuffle groupBy as
gold features; the LR fit runs on per-client rows (dimension-sized), so at
100 TB the cost center remains the fact scan, not the model.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.functions.core import money_avg, money_sum
from big_data_elt_pipeline_spark.operators.gold import days_between

FEATURE_COLS = ["frequency", "monetary_total", "monetary_avg", "recency_days", "tenure_days"]


def labeled_features(fact: DataFrame, ref: dt.datetime, holdout_days: int = 90) -> DataFrame:
    """RFM features from before the cutoff; label = purchased after it."""
    cutoff = ref - dt.timedelta(days=holdout_days)
    cutoff_lit = F.lit(cutoff)
    past = fact.filter(F.col("date_achat") < cutoff_lit)
    future = fact.filter(F.col("date_achat") >= cutoff_lit)

    feats = past.groupBy("id_client").agg(
        F.count(F.lit(1)).alias("frequency"),
        money_sum("montant", "monetary_total"),
        money_avg("montant", "monetary_avg"),
        days_between(cutoff_lit, F.max("date_achat")).alias("recency_days"),
        days_between(cutoff_lit, F.min("date_achat")).alias("tenure_days"),
    )
    labels = future.select("id_client").distinct().withColumn("label", F.lit(1.0))
    return feats.join(labels, "id_client", "left").na.fill({"label": 0.0})


def fit_predict(
    labeled: DataFrame, seed: int = 42, evaluate: bool = True
) -> tuple[DataFrame, float]:
    """Scale → LogisticRegression; returns (per-client probabilities, AUC).

    AUC is computed on the training frame — this is a capability surface,
    not a leaderboard; a proper evaluation would hold out clients.

    ``evaluate=False`` skips the BinaryClassificationEvaluator action and
    returns ``nan`` for AUC (r14 optimization, guide §1.2 "don't compute
    things you throw away"): the gate query discards this float — it
    computes its own exact rank-sum AUC inside the returned plan — so the
    evaluator's extra full pass over the scored frame was pure waste.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    cast = labeled.select(
        "id_client", "label", *[F.col(c).cast("double").alias(c) for c in FEATURE_COLS]
    )
    pipeline = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="vec"),
            StandardScaler(inputCol="vec", outputCol="scaled", withMean=True, withStd=True),
            LogisticRegression(featuresCol="scaled", labelCol="label", maxIter=50),
        ]
    )
    model = pipeline.fit(cast)
    scored = model.transform(cast)
    if evaluate:
        auc = BinaryClassificationEvaluator(
            labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
        ).evaluate(scored)
    else:
        auc = float("nan")
    out = scored.select(
        "id_client",
        F.col("label").cast("int").alias("label"),
        vector_to_array("probability")[1].alias("p_repurchase"),
        F.col("prediction").cast("int").alias("predicted"),
    )
    return out, float(auc)
