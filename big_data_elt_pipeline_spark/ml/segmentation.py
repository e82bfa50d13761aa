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


def compact_fit_input(df: DataFrame, rows_per_task: int = 65536) -> DataFrame:
    """Right-size an (already materialized, dimension-sized) fit input's
    partitioning for an iterative optimizer (r14 optimization, guide §2.2
    "fewer, larger partitions").

    pyspark.ml fitters launch one job per optimizer round (LBFGS step,
    Lloyd iteration); on a 1-2k-row frame spread over
    ``defaultParallelism`` partitions every such round pays a full
    task fan-out for microseconds of per-task work — measured as the
    dominant cost of both ml gate fits at bench scale. Scale-adaptive:
    the target is ``ceil(n / rows_per_task)`` capped at the CURRENT
    partition count, so a production-sized frame keeps its parallelism
    and only the tiny-frame case coalesces (coalesce moves no data).
    Call on a checkpointed frame — the row count here is one job over
    cached blocks, not a lineage replay.
    """
    n = df.count()
    cur = df.rdd.getNumPartitions()
    target = max(1, min(cur, (n + rows_per_task - 1) // rows_per_task))
    return df.coalesce(target) if target < cur else df


def rfm_features(fact: DataFrame, ref: dt.datetime) -> DataFrame:
    """D4: per-client frequency / monetary total+avg / recency."""
    return fact.groupBy("id_client").agg(
        F.count(F.lit(1)).alias("frequency"),
        money_sum("montant", "monetary_total"),
        money_avg("montant", "monetary_avg"),
        days_between(F.lit(ref), F.max("date_achat")).alias("recency_days"),
    )


def kmeans_segment(
    features: DataFrame, k: int = 5, seed: int = 42, evaluate: bool = True,
    impute: bool = True
) -> tuple[DataFrame, float]:
    """D3: Impute→StandardScaler→KMeans pipeline + silhouette.

    Returns (features ⊕ ``segment`` column, silhouette score).

    ``evaluate=False`` skips the ClusteringEvaluator action and returns
    ``nan`` (r14 optimization, guide §1.2 "don't compute things you throw
    away"): the ARI gate query discards the silhouette — its agreement
    bound is computed against the deterministic twin inside the returned
    plan — so the evaluator's extra pass over the assigned frame was
    pure waste there. The fitted model and assignments are unchanged.

    ``impute=False`` drops the Imputer stage (r15, same guide §1.2 rule):
    its median fit costs an approxQuantile pass per column — measured as
    HALF the whole pipeline fit — and on an input with no nulls the
    transform is the identity, so every downstream stage sees
    bit-identical vectors and the fitted model is unchanged. Callers may
    set it only when the input provably cannot hold nulls (the gate
    query's RFM aggregate output); the default keeps the reference's
    full Impute→Scale→KMeans pipeline.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator
    from pyspark.ml.feature import Imputer, StandardScaler, VectorAssembler

    imputed_cols = [f"{c}_imp" for c in RFM_COLS]
    vec_in = imputed_cols if impute else list(RFM_COLS)
    stages = [
        VectorAssembler(inputCols=vec_in, outputCol="rfm_vec"),
        StandardScaler(inputCol="rfm_vec", outputCol="rfm_scaled", withMean=True, withStd=True),
        KMeans(featuresCol="rfm_scaled", predictionCol="segment", k=k, seed=seed),
    ]
    if impute:
        stages.insert(
            0,
            Imputer(inputCols=RFM_COLS, outputCols=imputed_cols, strategy="median"),
        )
    pipeline = Pipeline(stages=stages)
    cast = features.select(
        "id_client", *[F.col(c).cast("double").alias(c) for c in RFM_COLS]
    )
    model = pipeline.fit(cast)
    assigned = model.transform(cast)
    if evaluate:
        silhouette = ClusteringEvaluator(
            featuresCol="rfm_scaled", predictionCol="segment", metricName="silhouette"
        ).evaluate(assigned)
    else:
        silhouette = float("nan")
    out = assigned.select("id_client", *RFM_COLS, F.col("segment").cast("int").alias("segment"))
    return out, float(silhouette)


def fixed_point_segments(
    features: DataFrame, k: int = 5, iters: int = 5
) -> DataFrame:
    """(id_client, cluster_id): the AUDIT-GRADE twin of ``kmeans_segment``
    — per-column standardized RFM vectors clustered by the deterministic
    exact-arithmetic Lloyd fixed point (``similarity.
    kmeans_lloyd_fixed_point``), then one map-side assignment of every
    client to its nearest final centroid. No RNG, no engine-defined
    optimizer: the same input always yields the same partition of
    clients, which is what lets the pyspark.ml fit be JUDGED against it
    (``segment_agreement``).

    Standardization is (x - mean) / stddev_samp per column — the same
    centering+scaling ``StandardScaler(withMean=True, withStd=True)``
    applies — computed as one broadcast one-row aggregate (zero-variance
    columns pass through centered, un-scaled). The scaled values feed
    the twin only (never an oracle hash), so plain double arithmetic is
    fine here.

    Scale shape: one stats row broadcast; Lloyd is the bounded-rounds
    map-pass + k*dim-key agg documented on the fixed-point operator; the
    final assignment is one more map pass against the k-row broadcast.
    """
    from big_data_elt_pipeline_spark.operators.similarity import (
        _dist2_snapped,
        kmeans_lloyd_fixed_point,
    )

    stats = features.agg(
        *[F.avg(F.col(c).cast("double")).alias(f"__mu_{c}") for c in RFM_COLS],
        *[F.stddev_samp(F.col(c).cast("double")).alias(f"__sd_{c}") for c in RFM_COLS],
    )
    scaled = features.crossJoin(F.broadcast(stats)).select(
        "id_client",
        F.array(
            *[
                F.when(
                    F.coalesce(F.col(f"__sd_{c}"), F.lit(0.0)) > 0.0,
                    (F.col(c).cast("double") - F.col(f"__mu_{c}"))
                    / F.col(f"__sd_{c}"),
                ).otherwise(F.col(c).cast("double") - F.col(f"__mu_{c}"))
                for c in RFM_COLS
            ]
        ).alias("rfm_vec"),
    )
    cents = kmeans_lloyd_fixed_point(
        scaled, dim=len(RFM_COLS), k=k, id_col="id_client", vec_col="rfm_vec"
    )
    cent_row = F.broadcast(
        cents.groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("i", "loading"))).alias("ps"))
        .select(
            "cluster_id",
            F.transform("ps", lambda s: s["loading"]).alias("c"),
        )
        .groupBy()
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("cluster_id").alias("cid"), "c"))
            ).alias("cs")
        )
    )
    best = F.array_min(
        F.transform(
            F.col("cs"),
            lambda s: F.struct(
                _dist2_snapped(F.col("rfm_vec"), s["c"]).alias("d"),
                s["cid"].alias("cid"),
            ),
        )
    )
    return scaled.crossJoin(cent_row).select(
        "id_client", best["cid"].alias("cluster_id")
    )


def segment_agreement(
    ml_assigned: DataFrame, twin_assigned: DataFrame
) -> DataFrame:
    """ONE row (n_clients, ari): Adjusted Rand Index (Hubert & Arabie
    1985) between the pyspark.ml segment labels and the deterministic
    twin's cluster ids — the standard label-free partition agreement
    (1 = identical partitions, ~0 = chance).

    Scale shape: the contingency table is a groupBy over at most k x k
    keys after one inner join on the client id; the pair-count sums
    (C(n_ij,2), row/column marginals) are three bounded aggregates
    crossed into one row — integer arithmetic until the final double
    division, no window, no collect."""
    pairs2 = lambda c: (F.sum(F.col(c) * (F.col(c) - 1)) / 2).cast("double")  # noqa: E731
    # eager checkpoint: the <= k x k contingency feeds THREE aggregates —
    # without it each one replays the join, the ml transform, and the
    # twin's Lloyd chain (the q15 bounded-result idiom)
    cont = (
        ml_assigned.select("id_client", "segment")
        .join(twin_assigned.select("id_client", "cluster_id"), "id_client")
        .groupBy("segment", "cluster_id")
        .agg(F.count(F.lit(1)).alias("nij"))
        .localCheckpoint(eager=True)
    )
    sij = cont.agg(
        pairs2("nij").alias("s_ij"), F.sum("nij").cast("long").alias("n")
    )
    sa = (
        cont.groupBy("segment")
        .agg(F.sum("nij").alias("ai"))
        .agg(pairs2("ai").alias("s_a"))
    )
    sb = (
        cont.groupBy("cluster_id")
        .agg(F.sum("nij").alias("bj"))
        .agg(pairs2("bj").alias("s_b"))
    )
    return (
        sij.crossJoin(sa)
        .crossJoin(sb)
        .select(
            F.col("n").alias("n_clients"),
            F.try_divide(
                F.col("s_ij")
                - F.col("s_a") * F.col("s_b")
                / (F.col("n") * (F.col("n") - 1) / 2.0),
                (F.col("s_a") + F.col("s_b")) / 2.0
                - F.col("s_a") * F.col("s_b")
                / (F.col("n") * (F.col("n") - 1) / 2.0),
            ).alias("ari"),
        )
    )


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
