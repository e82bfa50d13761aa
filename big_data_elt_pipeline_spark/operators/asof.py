"""As-of (time-travel) join — an operator Spark lacks natively.

Implemented as the scalable union-merge form (SURVEY.md §7's "composition
of existing DataFrame ops" preference): tag both sides, union, and take
``last_value(..., ignoreNulls)`` of the right-side payload over a
(key, time)-ordered window. ONE shuffle + sort on (key, time) — no range
cross-join, no per-group pandas. This is the plan shape that survives
100 TB: it's exactly a sort-merge join's cost without the range-explosion
of the naive `ON b.ts <= a.ts` inequality join.

Ties (right row exactly at the probe time) match, like
``pd.merge_asof(direction='backward')`` / DuckDB ``ASOF JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same ``key``.

    ``right`` must be unique per (key, right_ts) — pre-aggregate if not,
    or the matched payload is nondeterministic.
    """
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in payload]).alias("s")).schema["s"].dataType
        ).alias("__rpay"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),  # right sorts BEFORE left at equal ts → ties match
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        F.struct(*[F.col(c) for c in payload]).alias("__rpay"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tag.unionByName(r_tag).withColumn(
        "__match", F.last("__rpay", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in payload],
    )
    return out
