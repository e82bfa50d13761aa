"""Mergeable HLL distinct-count sketches: the persist-then-merge contract.

Sketch VALUES are engine-defined (no DuckDB oracle possible — see the
kpis_approx registration), so the contract is pinned here instead:
1. merging stored per-group sketches equals a from-scratch sketch of the
   union — BIT-IDENTICAL estimate, not merely close (HLL union is a
   register-wise max, lossless for HLL state);
2. every estimate lands within the lg_k-documented error of its exact
   twin;
3. fixed data → fixed estimates (register maxes commute, so partial
   aggregation order cannot change the result).
"""

import pytest

from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.functions import sketches as SK
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def fact(spark):
    from big_data_elt_pipeline_spark.plans.queries import _fact

    return _fact(spark, SF_SMOKE).select("mois", "id_client").localCheckpoint()


def test_merge_of_stored_sketches_equals_direct_build(spark, fact):
    monthly = SK.build_sketch_table(fact, ["mois"], "id_client")
    merged_est = SK.merge_sketches(monthly).select(SK.estimate().alias("e")).first().e
    direct_est = fact.agg(SK.distinct_sketch("id_client").alias("sketch")).select(
        SK.estimate().alias("e")
    ).first().e
    assert merged_est == direct_est  # lossless merge: exactly equal, not ~equal


def test_estimates_within_hll_error_of_exact(spark, fact):
    exact = {
        r.mois: r.d
        for r in fact.groupBy("mois").agg(F.countDistinct("id_client").alias("d")).collect()
    }
    est = {
        r.mois: r.e
        for r in SK.build_sketch_table(fact, ["mois"], "id_client")
        .select("mois", SK.estimate().alias("e"))
        .collect()
    }
    assert set(est) == set(exact)
    for mois, d in exact.items():
        # lg_k=12 → RSE ~1.6%; 5x slack keeps the bound meaningful but stable
        assert abs(est[mois] - d) <= max(3, 0.08 * d), (mois, est[mois], d)


def test_sketch_estimates_deterministic(spark, fact):
    q = lambda: sorted(
        SK.build_sketch_table(fact, ["mois"], "id_client")
        .select("mois", SK.estimate().alias("e"))
        .collect()
    )
    assert q() == q()


def test_registered_query_shape(spark):
    from big_data_elt_pipeline_spark.plans import queries as Q

    df = Q.spark_queries()["hll_monthly_distinct"](spark, SF_SMOKE)
    rows = df.collect()
    assert rows[-1].mois == "ALL"  # 'ALL' sorts after digit-leading months
    months = [r.mois for r in rows[:-1]]
    assert months == sorted(months) and len(months) >= 3
    total = next(r for r in rows if r.mois == "ALL")
    assert sum(r.n_orders for r in rows[:-1]) == total.n_orders  # additive measure sums
    # r11 bounded-assertion shape: exact distincts + in-bound booleans
    assert all(r.exact_clients > 0 for r in rows)
    assert all(r.hll_within_bound for r in rows)
