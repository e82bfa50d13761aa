"""ML + multimodal queries.

``multimodal_features`` runs real ``mapInPandas`` plumbing yet stays
oracle-checkable because the stub codec is deterministic (md5-derived).
``ml_kmeans_segments`` is iterative (no SQL form) → rows-only check; its
determinism is pinned by the fixed seed and asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.operators import multimodal as MM
from big_data_elt_pipeline_spark.plans.queries import register, _fact
from big_data_elt_pipeline_spark.sources.tpch import read_table

_MM_SQL = """
WITH media AS (
    SELECT doc_id AS media_id, encode(text) AS payload, md5(text) AS h
    FROM documents
)
SELECT media_id,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       h AS content_hash,
       CAST(('0x' || substr(h, 1, 4))::BIGINT % 1920 AS INTEGER) AS fake_width,
       CAST(('0x' || substr(h, 5, 4))::BIGINT % 1080 AS INTEGER) AS fake_height
FROM media
"""


@register("multimodal_features", _MM_SQL)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    media = MM.to_media_table(docs, "doc_id", "text", mime="text/plain")
    return MM.extract_features(media)


@register("ml_repurchase_predictor", None)  # iterative fit — rows-only check
def q_ml_predictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_elt_pipeline_spark.ml.predictor import fit_predict, labeled_features
    from big_data_elt_pipeline_spark.operators.gold import reference_date

    fact = _fact(spark, sf_dir)
    ref = reference_date(fact)
    labeled = labeled_features(fact, ref, holdout_days=90)
    scored, _auc = fit_predict(labeled)
    return scored


@register("ml_kmeans_segments", None)  # iterative — rows-only check
def q_ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_elt_pipeline_spark.ml.segmentation import kmeans_segment, rfm_features
    from big_data_elt_pipeline_spark.operators.gold import reference_date

    fact = _fact(spark, sf_dir)
    ref = reference_date(fact)
    rfm = rfm_features(fact, ref)
    assigned, _silhouette = kmeans_segment(rfm, k=5, seed=42)
    return assigned
