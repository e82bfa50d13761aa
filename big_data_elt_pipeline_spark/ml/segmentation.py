"""KMeans client segmentation — the reference's ML advisor re-expressed on
``pyspark.ml`` (SURVEY.md §2.9 D3-D4).

The reference fits sklearn Impute→StandardScaler→KMeans(k=5) on pandas
RFM features (``scripts/train_advisor.py:71-126``); here the identical
pipeline runs distributed: the RFM build is a DataFrame aggregate (D4) and
the model is a ``pyspark.ml`` Pipeline (D3) — the one genuinely UDF-class
workload in the whole reference. Seeded for reproducibility; silhouette via
``ClusteringEvaluator`` mirrors the reference's quality gate.

At 100 TB: KMeans over RFM features is per-client data (dimension-sized
relative to the fact table); the expensive part is the RFM aggregate, which
is the same single-shuffle groupBy as gold features.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.functions.core import money_avg, money_sum
from big_data_elt_pipeline_spark.operators.gold import days_between

RFM_COLS = ["frequency", "monetary_total", "monetary_avg", "recency_days"]


def rfm_features(fact: DataFrame, ref: dt.datetime) -> DataFrame:
    """D4: per-client frequency / monetary total+avg / recency."""
    return fact.groupBy("id_client").agg(
        F.count(F.lit(1)).alias("frequency"),
        money_sum("montant", "monetary_total"),
        money_avg("montant", "monetary_avg"),
        days_between(F.lit(ref), F.max("date_achat")).alias("recency_days"),
    )


def kmeans_segment(
    features: DataFrame, k: int = 5, seed: int = 42
) -> tuple[DataFrame, float]:
    """D3: Impute→StandardScaler→KMeans pipeline + silhouette.

    Returns (features ⊕ ``segment`` column, silhouette score).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator
    from pyspark.ml.feature import Imputer, StandardScaler, VectorAssembler

    imputed_cols = [f"{c}_imp" for c in RFM_COLS]
    pipeline = Pipeline(
        stages=[
            Imputer(inputCols=RFM_COLS, outputCols=imputed_cols, strategy="median"),
            VectorAssembler(inputCols=imputed_cols, outputCol="rfm_vec"),
            StandardScaler(inputCol="rfm_vec", outputCol="rfm_scaled", withMean=True, withStd=True),
            KMeans(featuresCol="rfm_scaled", predictionCol="segment", k=k, seed=seed),
        ]
    )
    cast = features.select(
        "id_client", *[F.col(c).cast("double").alias(c) for c in RFM_COLS]
    )
    model = pipeline.fit(cast)
    assigned = model.transform(cast)
    silhouette = ClusteringEvaluator(
        featuresCol="rfm_scaled", predictionCol="segment", metricName="silhouette"
    ).evaluate(assigned)
    out = assigned.select("id_client", *RFM_COLS, F.col("segment").cast("int").alias("segment"))
    return out, float(silhouette)


def segment_profile(assigned: DataFrame) -> DataFrame:
    """Per-cluster profile: size + feature means (the advisor's report)."""
    return (
        assigned.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("clients"),
            *[F.avg(c).alias(f"avg_{c}") for c in RFM_COLS],
        )
        .orderBy("segment")
    )
