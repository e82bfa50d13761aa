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
