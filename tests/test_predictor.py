"""Supervised repurchase predictor: no label leakage, sane outputs."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_predictor_outputs(spark):
    from big_data_elt_pipeline_spark.ml.predictor import fit_predict, labeled_features
    from big_data_elt_pipeline_spark.operators.gold import reference_date
    from big_data_elt_pipeline_spark.plans.queries import _fact

    fact = _fact(spark, SF_SMOKE).persist()
    ref = reference_date(fact)
    labeled = labeled_features(fact, ref, holdout_days=90)
    scored, auc = fit_predict(labeled)
    pdf = scored.toPandas()
    assert 0.0 <= auc <= 1.0
    assert pdf.p_repurchase.between(0, 1).all()
    assert set(pdf.label.unique()) <= {0, 1}
    assert 0 < pdf.label.mean() < 1  # both classes present


def test_predictor_features_precede_cutoff(spark):
    """Leakage guard: feature recency must be non-negative vs the cutoff
    (all feature purchases strictly before it)."""
    import datetime as dt

    from big_data_elt_pipeline_spark.ml.predictor import labeled_features
    from big_data_elt_pipeline_spark.operators.gold import reference_date
    from big_data_elt_pipeline_spark.plans.queries import _fact

    fact = _fact(spark, SF_SMOKE)
    ref = reference_date(fact)
    labeled = labeled_features(fact, ref, holdout_days=90)
    assert labeled.filter(F.col("recency_days") < 0).count() == 0
    assert labeled.filter(F.col("tenure_days") < F.col("recency_days")).count() == 0
