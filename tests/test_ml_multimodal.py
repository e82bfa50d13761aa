"""ML segmentation determinism + multimodal plumbing shape checks."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_kmeans_deterministic_and_scored(spark):
    from big_data_elt_pipeline_spark.ml.segmentation import (
        kmeans_segment,
        rfm_features,
        segment_profile,
    )
    from big_data_elt_pipeline_spark.operators.gold import reference_date
    from big_data_elt_pipeline_spark.plans.queries import _fact

    fact = _fact(spark, SF_SMOKE).persist()
    ref = reference_date(fact)
    rfm = rfm_features(fact, ref).persist()
    a1, s1 = kmeans_segment(rfm, k=5, seed=42)
    a2, s2 = kmeans_segment(rfm, k=5, seed=42)
    p1 = a1.toPandas().sort_values("id_client").reset_index(drop=True)
    p2 = a2.toPandas().sort_values("id_client").reset_index(drop=True)
    assert p1.equals(p2)  # fixed seed → identical assignment
    assert s1 == s2
    assert -1.0 <= s1 <= 1.0
    assert p1.segment.nunique() == 5
    prof = segment_profile(a1).toPandas()
    assert len(prof) == 5 and prof.clients.sum() == len(p1)


def test_multimodal_frame_sample_shape(spark):
    from big_data_elt_pipeline_spark.operators import multimodal as MM
    from big_data_elt_pipeline_spark.sources.tpch import read_table

    docs = read_table(spark, SF_SMOKE, "documents").limit(50)
    media = MM.to_media_table(docs, "doc_id", "text", mime="text/plain")
    frames = MM.frame_sample(media, every_n=10).toPandas()
    assert len(frames) == 50
    assert set(frames.columns) == {
        "media_id", "n_bytes", "content_hash", "fake_width", "fake_height", "frame_no"
    }
    assert frames.frame_no.between(0, 9).all()


def test_decode_image_stub_raises(spark):
    import pytest

    from big_data_elt_pipeline_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG fake")
