"""Unit tests for expression helpers: pandas-parity of bucketize and
day-difference semantics."""

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.functions.core import bucketize, money_sum
from big_data_elt_pipeline_spark.operators.gold import days_between


def test_bucketize_matches_pd_cut(spark):
    vals = [10.0, 10.01, 123.45, 250.0, 499.99, 500.0]
    pdf = pd.DataFrame({"x": vals})
    expected = pd.cut(pdf.x, bins=12).cat.codes.tolist()
    mn, mx = min(vals), max(vals)
    out = (
        spark.createDataFrame(pdf)
        .select(bucketize(F.col("x"), mn, mx, 12).alias("b"))
        .toPandas()["b"]
        .tolist()
    )
    assert out == expected


def test_bucketize_interior_edge_values_match_pd_cut(spark):
    """Values landing EXACTLY on interior bin edges take the left
    (right-closed) bucket, same as pandas — previously a documented
    one-bucket divergence."""
    vals = [0.0, 1.0, 2.5, 3.0, 7.0, 11.0, 12.0]  # edges at 1.0, 2.0, ... 11.0
    pdf = pd.DataFrame({"x": vals})
    expected = pd.cut(pdf.x, bins=12).cat.codes.tolist()
    out = (
        spark.createDataFrame(pdf)
        .select(bucketize(F.col("x"), 0.0, 12.0, 12).alias("b"))
        .toPandas()["b"]
        .tolist()
    )
    assert out == expected


def test_days_between_is_pandas_floor(spark):
    # 2h into the next calendar day => pandas .days == 0, not 1
    ref = dt.datetime(2024, 3, 5, 1, 0, 0)
    d = dt.datetime(2024, 3, 4, 23, 0, 0)
    row = (
        spark.range(1)
        .select(days_between(F.lit(ref), F.lit(d)).alias("dd"))
        .first()
    )
    assert row.dd == (ref - d).days == 0


def test_money_sum_is_order_independent(spark):
    rng = np.random.default_rng(42)
    vals = np.round(rng.uniform(10, 500, 5000), 2)
    df = spark.createDataFrame(pd.DataFrame({"m": vals}))
    a = df.repartition(1).agg(money_sum("m", "s")).first().s
    b = df.repartition(32).agg(money_sum("m", "s")).first().s
    assert a == b  # bit-identical regardless of partitioning/order
