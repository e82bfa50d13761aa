"""Salted aggregation must be bit-identical to the direct plan — on skewed
data (one key owning most rows) and under any partitioning."""

import pandas as pd
import numpy as np
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.functions.core import money_sum
from big_data_elt_pipeline_spark.functions.skew import (
    salted_count_distinct,
    salted_money_sum,
)


def _skewed_df(spark, n=20000):
    rng = np.random.default_rng(7)
    keys = np.where(rng.random(n) < 0.8, 1, rng.integers(2, 50, n))  # key 1 = 80%
    pdf = pd.DataFrame({
        "k": keys.astype("int64"),
        "v": np.round(rng.uniform(10, 500, n), 2),
        "item": rng.integers(0, 100, n).astype("int64"),
    })
    return spark.createDataFrame(pdf).repartition(32)


def test_salted_sum_equals_direct(spark):
    df = _skewed_df(spark)
    direct = (
        df.groupBy("k").agg(money_sum("v", "total"), F.count(F.lit(1)).alias("total_count"))
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    salted = (
        salted_money_sum(df, "k", "v", n_salt=16)
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert direct.k.tolist() == salted.k.tolist()
    assert (direct.total.values == salted.total.values).all()  # bit-identical
    assert (direct.total_count.values == salted.total_count.values).all()


def test_salted_count_distinct_equals_direct(spark):
    df = _skewed_df(spark)
    direct = (
        df.groupBy("k").agg(F.countDistinct("item").alias("n_distinct"))
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    salted = (
        salted_count_distinct(df, "k", "item", n_salt=16)
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert direct.equals(salted)


def test_aqe_splits_skewed_join_partitions(spark):
    """JOIN skew is handled by the ENGINE, not by hand: with AQE's skew
    join on (default in this engine's sessions), a hot-key sort-merge join
    gets its oversized partition split at runtime — the executed plan
    carries SortMergeJoin(skew=true). Manual salting (`functions/skew.py`)
    stays for AGGREGATION skew, which AQE does not rebalance; this test
    pins the complementary engine half. Thresholds are lowered to make a
    local-scale fixture 'skewed'; the mechanism is identical at 100 TB."""
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    saved = {k: conf.get(k) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(0, 400000).select(
            F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 60), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 400000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = left.join(right, "k")
        rows = joined.collect()  # executes THIS frame → AQE finalizes its plan
        assert len(rows) == 400000  # unique right keys: no fan-out
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
