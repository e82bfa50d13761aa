"""Table profiling: per-column statistics in ONE pass.

A training-data pipeline's first question about any 100 TB table is
"what's in it" — null rates, cardinalities, ranges. The naive form runs
one job per column; this builds a single wide aggregate (every stat for
every column in one scan, all map-side combinable) and unpivots the
scalar row into a (column, stat, value) long table driver-side — no
second job, no per-column scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.ShortType)


def profile_table(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """One-pass profile → rows of (column, dtype, n_nulls, n_distinct,
    min_value, max_value) with min/max stringified for heterogeneity.

    ``approx_distinct`` switches exact countDistinct (one expand per
    column) to HLL sketches — the 100 TB default; exact is the oracle-able
    test path.
    """
    spark = df.sparkSession
    n_distinct = F.approx_count_distinct if approx_distinct else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__total")]
    profiled = [f for f in df.schema.fields if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
    for f in profiled:
        c = F.col(f.name)
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"{f.name}__nulls"),
            n_distinct(c).alias(f"{f.name}__distinct"),
            F.min(c).cast("string").alias(f"{f.name}__min"),
            F.max(c).cast("string").alias(f"{f.name}__max"),
        ]
    row = df.agg(*aggs).first().asDict()
    out = [
        (
            f.name,
            f.dataType.simpleString(),
            int(row["__total"]),
            int(row[f"{f.name}__nulls"]),
            int(row[f"{f.name}__distinct"]),
            row[f"{f.name}__min"],
            row[f"{f.name}__max"],
        )
        for f in profiled
    ]
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "n_distinct long, min_value string, max_value string",
    )
