"""Scale-path proofs: partition pruning and bucketed co-located joins —
asserted on the physical plan, not just on results."""

import tempfile

from pyspark.sql import functions as F

from big_data_elt_pipeline_spark import io as eio
from big_data_elt_pipeline_spark.sources import tpch
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_fact_prunes(spark):
    from big_data_elt_pipeline_spark.operators import gold

    clients = tpch.clients_df(spark, SF_SMOKE)
    achats = tpch.achats_df(spark, SF_SMOKE)
    fact = gold.build_fact(achats, clients)
    tmp = tempfile.mkdtemp(prefix="prune_")
    eio.write_parquet(fact, f"{tmp}/fact", partition_by=["annee"])

    pruned = eio.read_parquet(spark, f"{tmp}/fact").filter(F.col("annee") == 1997)
    plan = pruned.queryExecution() if False else pruned._jdf.queryExecution().toString()
    # the partition filter must reach the scan (directory-level pruning)
    assert "PartitionFilters" in plan and "annee" in plan
    got = pruned.select("annee").distinct().collect()
    assert [r.annee for r in got] == [1997]


def test_bucketed_join_has_no_exchange(spark):
    clients = tpch.clients_df(spark, SF_SMOKE)
    achats = tpch.achats_df(spark, SF_SMOKE)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        eio.write_bucketed(achats, "achats_bkt", "id_client", 8)
        eio.write_bucketed(
            clients.select("id_client", "pays"), "clients_bkt", "id_client", 8
        )
        joined = spark.table("achats_bkt").join(spark.table("clients_bkt"), "id_client")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS achats_bkt")
        spark.sql("DROP TABLE IF EXISTS clients_bkt")
