"""End-to-end medallion run on CSVs derived from the test corpus."""

import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark import pipeline as P
from big_data_elt_pipeline_spark.sources import tpch
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def lake(spark):
    tmp = tempfile.mkdtemp(prefix="lake_")
    src = f"{tmp}/sources"
    clients = tpch.clients_df(spark, SF_SMOKE)
    achats = tpch.achats_df(spark, SF_SMOKE)
    (clients.coalesce(1).write.mode("overwrite")
     .option("header", True).csv(f"{src}/clients.csv"))
    (achats.coalesce(1).write.mode("overwrite")
     .option("header", True).option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
     .csv(f"{src}/achats.csv"))
    result = P.run_medallion(spark, src, f"{tmp}/lake",
                             min_date="1990-01-01", max_amount=1e9)
    return tmp, result


def test_medallion_runs_and_counts(spark, lake):
    tmp, result = lake
    assert result["bronze_rows"]["achats"] == 6000
    assert result["gold_rows"]["fact_achats"] == 6000  # clean corpus: no drops
    assert result["gold_rows"]["dim_clients"] == 150
    assert result["seconds"]["total"] > 0


def test_golden_check_green(spark, lake):
    tmp, _ = lake
    assert P.golden_check(spark, f"{tmp}/lake") == []


def test_gold_matches_direct_computation(spark, lake):
    tmp, _ = lake
    from big_data_elt_pipeline_spark import io as eio
    from big_data_elt_pipeline_spark.operators import gold

    clients = tpch.clients_df(spark, SF_SMOKE)
    achats = tpch.achats_df(spark, SF_SMOKE)
    direct = gold.aggregate_sales(gold.build_fact(achats, clients))[0].toPandas()
    from_lake = (
        eio.read_parquet(spark, f"{tmp}/lake/gold/ca_monthly")
        .orderBy("mois").toPandas()
    )
    assert direct.sort_values("mois").reset_index(drop=True).equals(
        from_lake.sort_values("mois").reset_index(drop=True)
    )


def test_distribution_labels_written(spark, lake):
    tmp, _ = lake
    from big_data_elt_pipeline_spark import io as eio

    dist = eio.read_parquet(spark, f"{tmp}/lake/gold/distribution").toPandas()
    assert set(dist.columns) == {"bucket", "count", "bucket_label"}
    assert dist.bucket_label.str.match(r"^\(.+, .+\]$").all()
    assert dist["count"].sum() == 6000
