"""Gold → docstore publisher: every serving view round-trips through its
collection bit-exactly (the reference's publish_gold_to_mongo refresh,
engine-native), and a republish is a clean truncate-and-load."""

from pyspark.sql import functions as F

from big_data_elt_pipeline_spark import serving_publish as SP
from big_data_elt_pipeline_spark.sources import docstore
from tests.conftest import SF_SMOKE


def test_publish_all_views_roundtrip(spark, tmp_path):
    from big_data_elt_pipeline_spark.plans import queries as Q

    root = str(tmp_path / "serving")
    counts = SP.publish_gold(spark, SF_SMOKE, root)
    assert set(counts) == set(SP.GOLD_VIEWS)
    assert all(n > 0 for n in counts.values())
    registry = Q.spark_queries()
    # spot-check three shapes: monthly rollup, scored clients, 1-row KPIs
    for coll in ("gold_monthly", "gold_client_scores", "gold_kpis"):
        qname, _ = SP.GOLD_VIEWS[coll]
        expected = registry[qname](spark, SF_SMOKE)
        got = spark.read.format(docstore.FORMAT_NAME).load(f"{root}/{coll}")
        assert got.schema == expected.schema
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_republish_truncates(spark, tmp_path):
    root = str(tmp_path / "serving")
    views = {"gold_monthly": SP.GOLD_VIEWS["gold_monthly"]}
    first = SP.publish_gold(spark, SF_SMOKE, root, views)
    second = SP.publish_gold(spark, SF_SMOKE, root, views)
    assert first == second  # overwrite, not append-doubling
    got = spark.read.format(docstore.FORMAT_NAME).load(f"{root}/gold_monthly")
    assert got.count() == first["gold_monthly"]
    # and the serving access pattern works off the store: find + sort + limit
    top = got.orderBy(F.desc("ca")).limit(3).collect()
    assert len(top) == 3 and top[0].ca >= top[1].ca >= top[2].ca
