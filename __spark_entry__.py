"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (monthly revenue rollup) at sf0.001.
``queries()`` / ``oracle_sql()`` — the SURVEY.md §2 operator inventory as
named DataFrame plans with DuckDB oracle equivalents, registered in
``big_data_elt_pipeline_spark/plans/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_elt_pipeline_spark.plans import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.spark_queries()["ca_monthly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (keys missing here
    get the driver's weaker rows-only check)."""
    return _q.oracle_queries()
