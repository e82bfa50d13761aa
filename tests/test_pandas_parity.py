"""Parity with the reference's pandas idioms where SURVEY.md claims
equivalence — proven on real data, not assumed."""

import pandas as pd
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.sources import tpch
from tests.conftest import SF_SMOKE


def test_week_start_matches_pandas_to_period(spark):
    """`date_trunc('week')` must equal pandas `to_period('W').start_time`
    (both Monday-anchored) — the A4 weekly-rollup compatibility claim."""
    achats = tpch.achats_df(spark, SF_SMOKE).limit(500)
    got = achats.select(
        "date_achat",
        F.date_format(F.date_trunc("week", "date_achat"), "yyyy-MM-dd").alias("semaine"),
    ).toPandas()
    expected = (
        pd.to_datetime(got.date_achat)
        .dt.to_period("W")
        .map(lambda p: str(p.start_time.date()))
    )
    assert (got.semaine == expected).all()


def test_month_period_matches_pandas(spark):
    """`date_format(d, 'yyyy-MM')` == pandas `to_period('M').astype(str)`."""
    achats = tpch.achats_df(spark, SF_SMOKE).limit(500)
    got = achats.select(
        "date_achat", F.date_format("date_achat", "yyyy-MM").alias("mois")
    ).toPandas()
    expected = pd.to_datetime(got.date_achat).dt.to_period("M").astype(str)
    assert (got.mois == expected).all()
