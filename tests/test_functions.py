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


def test_bucketize_null_and_nan_yield_null(spark):
    """pd.cut assigns NULL/NaN code -1 (missing), never a bucket; the
    when-ladder used to coerce NULL to bucket 0 and NaN (greatest under
    Spark ordering) to n_bins-1."""
    # explicit schema + Python None: pandas would coerce None -> NaN in a
    # float64 column, which silently skips the SQL-NULL branch of the
    # isNull()|isnan() guard — build the true NULL row Spark-side instead
    rows = [(5.0,), (None,), (float("nan"),), (0.0,), (12.0,)]
    out = (
        spark.createDataFrame(rows, "x double")
        .select(bucketize(F.col("x"), 0.0, 12.0, 12).alias("b"))
        .toPandas()["b"]
    )
    pdf = pd.DataFrame({"x": [5.0, None, float("nan"), 0.0, 12.0]})
    expected = pd.cut(pdf.x, bins=12).cat.codes  # -1 for missing
    assert out[1] is None or pd.isna(out[1])
    assert out[2] is None or pd.isna(out[2])
    assert [int(v) for v in out[[0, 3, 4]]] == [int(v) for v in expected[[0, 3, 4]]]


def test_topk_excludes_nan_cosine_and_accepts_string_ids(spark):
    """Zero-norm vectors produce 0/0 = NaN cosines; the bounded reducer
    must drop them (not misorder the selection) and must not assume
    numeric ids."""
    from big_data_elt_pipeline_spark.operators.similarity import brute_force_topk

    rows = [
        ("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0]),
        ("z", [0.0, 0.0]),  # zero norm -> NaN cosine against everything
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    out = brute_force_topk(df, df.filter("vec_id = 'a'"), k=3).toPandas()
    assert "z" not in set(out.vec_id)  # NaN candidate excluded
    assert list(out.sort_values("rank").vec_id) == ["b", "c"]
    assert not out.cosine.isna().any()


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


def test_kpis_approx_contract(spark):
    """Raw sketch values are engine-defined, so since r11 the REGISTERED
    kpis_approx returns exact twins + in-bound booleans (hash-checkable by
    the driver). This test keeps the raw-estimate contract on the
    underlying aggregates: each sketch lands within its documented error
    bound of the exact twin, and the result is run-to-run deterministic
    on fixed data."""
    from tests.conftest import SF_SMOKE
    from big_data_elt_pipeline_spark.plans import queries as Q
    from big_data_elt_pipeline_spark.plans.queries import _fact

    fact = _fact(spark, SF_SMOKE)
    raw = lambda: fact.agg(
        F.approx_count_distinct("id_client").alias("approx_clients"),
        F.percentile_approx("montant", 0.5, 10000).alias("approx_median_amount"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    approx = raw()
    exact_clients = fact.select("id_client").distinct().count()
    exact_median = fact.agg(F.median("montant")).first()[0]
    # HLL++ default relative standard deviation is 0.05; 3 sigma bound
    assert abs(approx.approx_clients - exact_clients) <= 0.15 * exact_clients
    # percentile_approx(accuracy=10000): rank error <= n/10000; translate
    # to a generous 5% value tolerance on this distribution
    assert abs(approx.approx_median_amount - exact_median) <= 0.05 * exact_median
    assert approx.n == fact.count()
    # determinism on fixed data: a second evaluation is bit-identical
    assert raw() == approx
    # and the registered bounded-assertion relation must hold its booleans
    reg = Q.spark_queries()["kpis_approx"](spark, SF_SMOKE).first()
    assert reg.hll_within_bound and reg.median_within_band
    assert reg.n == approx.n and reg.exact_clients == exact_clients
