"""Gold → document-store publisher: the engine-native twin of the
reference's Mongo publisher (``serving_mongo/publish_gold_to_mongo.py``,
which truncate-and-loads every gold view into a collection and the Flask
tier then serves with find+sort+limit).

Each serving view becomes one docstore collection under
``<root>/<collection>/`` via an atomic overwrite commit — readers of a
collection never see a half-published refresh, and the Flask-tier access
pattern (point lookup / range on the key) is served by the docstore's
manifest-stats shard pruning when the view is written range-clustered on
its key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from big_data_elt_pipeline_spark.sources import docstore

# view name -> (registry query, document key column) — mirrors the
# reference's collection list (publish_gold_to_mongo.py) on this corpus
GOLD_VIEWS: dict[str, tuple[str, str]] = {
    "gold_monthly": ("ca_monthly", "mois"),
    "gold_by_country": ("ca_country", "pays"),
    "gold_by_product": ("ca_product", "produit"),
    "gold_daily": ("serving_daily", "jour"),
    "gold_weekly": ("serving_weekly", "semaine"),
    "gold_monthly_growth": ("monthly_growth", "mois"),
    "gold_distribution": ("serving_distribution", "bucket"),
    "gold_segment_summary": ("segment_summary", "segment_label"),
    "gold_client_scores": ("client_scores", "id_client"),
    "gold_cohort_first_purchase": ("cohort_first_purchase", "first_purchase_month"),
    "gold_kpis": ("kpis", "total_clients"),
}


def publish_gold(
    spark: SparkSession,
    sf_dir: str,
    store_root: str,
    views: dict[str, tuple[str, str]] | None = None,
) -> dict[str, int]:
    """Publish every serving view as a docstore collection (atomic
    truncate-and-load per collection, the reference's refresh semantics).
    Returns {collection: row count published}."""
    from big_data_elt_pipeline_spark.plans import queries as Q

    docstore.register(spark)
    registry = Q.spark_queries()
    out: dict[str, int] = {}
    for coll, (qname, key) in (views or GOLD_VIEWS).items():
        df: DataFrame = registry[qname](spark, sf_dir)
        if key not in df.columns:
            raise ValueError(f"{coll}: key {key!r} not in {df.columns}")
        path = f"{store_root}/{coll}"
        (
            df.write.format(docstore.FORMAT_NAME)
            .option("key", key)
            .mode("overwrite")
            .save(path)
        )
        out[coll] = spark.read.format(docstore.FORMAT_NAME).load(path).count()
    return out
