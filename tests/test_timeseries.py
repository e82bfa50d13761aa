"""Time-series query semantics on hand-checkable fixtures: the RANGE
interval frame (value-based aging) and the resample forward-fill rules
that the clean-corpus oracles exercise only statistically."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_range_frame_ages_out_by_value(spark):
    """A RANGE frame over day numbers must drop days older than 6 days by
    VALUE — a ROWS frame would keep the previous N rows regardless of the
    gap. Days 0, 3, 20: the day-20 window must contain only day 20."""
    rows = [(1, 0, 10.0), (1, 3, 20.0), (1, 20, 40.0)]
    df = spark.createDataFrame(rows, "id long, day_num int, v double")
    w = Window.partitionBy("id").orderBy("day_num").rangeBetween(-6, Window.currentRow)
    out = {r.day_num: r.s for r in df.select("day_num", F.sum("v").over(w).alias("s")).collect()}
    assert out[0] == 10.0
    assert out[3] == 30.0     # day 0 still inside [day-6, day]
    assert out[20] == 40.0    # both prior days aged out (a ROWS frame would say 70)


def test_resample_ffill_carries_last_observation(spark):
    """Gap hours carry the LAST observed value, not null and not an
    interpolation; hours before the first observation cannot exist
    because the grid starts at the user's min hour."""
    rows = [(7, 100, 5.0), (7, 103, 9.0)]
    h = spark.createDataFrame(rows, "user_id long, hour_idx long, hourly_value double")
    bounds = h.groupBy("user_id").agg(F.min("hour_idx").alias("hmin"), F.max("hour_idx").alias("hmax"))
    grid = bounds.select("user_id", F.explode(F.sequence("hmin", "hmax")).alias("hour_idx"))
    w = Window.partitionBy("user_id").orderBy("hour_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    out = (
        grid.join(h, ["user_id", "hour_idx"], "left")
        .select("hour_idx", F.last("hourly_value", ignorenulls=True).over(w).alias("v"),
                F.col("hourly_value").isNull().alias("gap"))
        .orderBy("hour_idx").collect()
    )
    assert [(r.hour_idx, r.v, r.gap) for r in out] == [
        (100, 5.0, False), (101, 5.0, True), (102, 5.0, True), (103, 9.0, False),
    ]


def test_outlier_moments_match_textbook_variance(spark):
    """The exact-decimal moment formula (Σx² - (Σx)²/n)/(n-1) must equal
    the textbook sample variance on a known set."""
    vals = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,4)")).cast("double").alias("s1"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,8)")).cast("double").alias("s2"),
    ).first()
    var = (row.s2 - row.s1 * row.s1 / row.n) / (row.n - 1)
    assert var == pytest.approx(32.0 / 7.0)  # textbook: mean 5, Σ(x-5)² = 32
