"""Serving-edge helpers: sort-spec parsing (O5), JSON records (S11),
histogram label format, and property-based determinism checks."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark import io as eio
from big_data_elt_pipeline_spark.operators import serving


@pytest.fixture(scope="module")
def scores_like(spark):
    rows = [(i, float(i % 7) * 10, 365 - i) for i in range(50)]
    return spark.createDataFrame(rows, "id_client long, expected double, recency long")


def test_sort_spec_parses_and_limits(spark, scores_like):
    out = serving.sort_spec(scores_like, "expected:desc", limit=5).toPandas()
    assert len(out) == 5
    assert out.expected.is_monotonic_decreasing


def test_sort_spec_rejects_unknown_field(spark, scores_like):
    with pytest.raises(ValueError, match="unknown sort field"):
        serving.sort_spec(scores_like, "nope:asc")


def test_sort_spec_default_asc(spark, scores_like):
    out = serving.sort_spec(scores_like, "recency", limit=3).toPandas()
    assert out.recency.is_monotonic_increasing


def test_json_records_roundtrip(spark, scores_like):
    import json

    rows = eio.to_json_records(scores_like.limit(2)).collect()
    recs = [json.loads(r.json) for r in rows]
    assert {"id_client", "expected", "recency"} <= set(recs[0])


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=9999.99, allow_nan=False),
        min_size=2, max_size=40,
    ),
    bins=st.integers(min_value=2, max_value=20),
)
def test_bucketize_property_matches_pd_cut(vals, bins):
    """Property: our bucket ids equal pandas pd.cut codes for any input —
    including values that sit exactly on an interior bin edge (the
    linspace-edge arithmetic in bucketize reproduces pandas bit-for-bit)."""
    from big_data_elt_pipeline_spark.functions.core import bucketize

    vals = [round(v, 2) for v in vals]
    if min(vals) == max(vals):
        return
    mn, mx = min(vals), max(vals)
    spark = test_bucketize_property_matches_pd_cut._spark
    pdf = pd.DataFrame({"x": vals})
    expected = pd.cut(pdf.x, bins=bins).cat.codes.tolist()
    got = (
        spark.createDataFrame(pdf)
        .select(bucketize(F.col("x"), mn, mx, bins).alias("b"))
        .toPandas()["b"].tolist()
    )
    assert got == expected


@settings(max_examples=50, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=0.0001, max_value=99999.99, allow_nan=False),
        min_size=2, max_size=40,
    ),
    bins=st.integers(min_value=2, max_value=20),
)
def test_interval_labels_match_pd_cut_strings(vals, bins):
    """Property: interval_labels reproduces pandas' ADAPTIVE label precision
    — string-equal to pd.cut's categories, e.g. (10.49, 51.3], closing the
    last documented serving-parity simplification. Driver-side only, no
    Spark needed."""
    mn, mx = min(vals), max(vals)
    if mn == mx:
        return
    try:
        expected = [str(c) for c in pd.cut(pd.Series(vals), bins=bins).cat.categories]
    except ValueError:
        # degenerate span (edges collide at float64): pandas refuses to
        # bin — the engine's contract is to raise the identical error
        with pytest.raises(ValueError, match="Bin edges must be unique"):
            serving.interval_labels(mn, mx, bins)
        return
    got = serving.interval_labels(mn, mx, bins)
    assert got == expected


def test_interval_labels_degenerate_ulp_range_raises():
    """Regression: the exact Hypothesis counterexample from round 3 —
    min/max one ulp apart, where np.linspace edges collide and pd.cut
    raises ValueError('Bin edges must be unique'). interval_labels must
    mirror the raise, not emit duplicate-edge labels."""
    vals = [0.00010000000000000002, 0.0001]
    with pytest.raises(ValueError, match="Bin edges must be unique"):
        pd.cut(pd.Series(vals), bins=2)
    with pytest.raises(ValueError, match="Bin edges must be unique"):
        serving.interval_labels(min(vals), max(vals), 2)


def test_build_distribution_labels_are_pandas_exact(spark):
    vals = [10.52, 11.0, 51.3, 123.45, 250.0, 499.99, 500.0, 10.49]
    pdf = pd.DataFrame({"montant": vals, "id_achat": range(len(vals)),
                        "id_client": [1] * len(vals)})
    fact = spark.createDataFrame(pdf)
    out = serving.build_distribution(fact, bins=4).toPandas()
    cats = pd.cut(pdf.montant, bins=4)
    expected = (
        cats.cat.codes.value_counts().sort_index().rename_axis("bucket").reset_index(name="count")
    )
    assert out.bucket.tolist() == expected.bucket.tolist()
    assert out["count"].tolist() == expected["count"].tolist()
    labels = [str(c) for c in cats.cat.categories]
    assert out.bucket_label.tolist() == [labels[b] for b in out.bucket]


@pytest.fixture(autouse=True)
def _inject_spark(spark):
    test_bucketize_property_matches_pd_cut._spark = spark
