"""Ordered-funnel analysis over the event stream: how many users reach
stage k having reached stage k-1 STRICTLY EARLIER — the sequential
constraint is the whole operator (an unordered count-distinct per type
needs no operator at all).

Semantics: a user reaches stage 0 at their earliest stage-0 event; they
reach stage k at their earliest stage-k event with ts strictly greater
than their stage-(k-1) reach time. One row per stage: (stage_idx, stage,
n_users, conversion) with conversion = n_users / previous stage's
n_users (1.0 for stage 0).

Scale shape: per stage, one filtered groupBy(user) min-aggregate (map-side
partial) plus one equi-join on user_id against the previous stage's
reach times — every exchange is keyed on user_id, so with AQE or an
explicit repartition the chain reuses one hash partitioning end-to-end;
nothing broadcasts (users scale with the corpus) and nothing is
quadratic. The final rollup is |stages| rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-stage reach counts under the strict-order constraint."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    reach = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("reach_ts"))
    )
    per_stage = [reach]
    for stage in stages[1:]:
        nxt = (
            events.filter(F.col(type_col) == stage)
            .select(F.col(user_col).alias("user"), F.col(ts_col))
            .join(per_stage[-1], "user")
            .filter(F.col(ts_col) > F.col("reach_ts"))
            .groupBy("user")
            .agg(F.min(ts_col).alias("reach_ts"))
        )
        per_stage.append(nxt)
    counted = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("stage_idx"), F.lit(stages[i]).alias("stage"), "n_users"
        )
        for i, df in enumerate(per_stage)
    ]
    out = reduce(lambda a, b: a.unionByName(b), counted)
    # |stages| rows total — the single-partition lag window is free
    prev = F.lag("n_users").over(Window.orderBy("stage_idx"))
    # Zero-guard: once a stage reaches 0 users, later conversions are 0/0 —
    # NULL under non-ANSI Spark but an ERROR under spark.sql.ansi.enabled
    # and engine-dependent in oracles. Pin the semantics to explicit NULL.
    return (
        out.withColumn(
            "conversion",
            F.when(F.col("stage_idx") == 0, F.lit(1.0))
            .when(prev > 0, F.col("n_users") / prev)
            .otherwise(F.lit(None).cast("double")),
        )
        .orderBy("stage_idx")
    )
