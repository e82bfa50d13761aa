"""Structured Streaming surface: the incremental tumbling aggregate must
agree with its batch twin on every finalized window."""

from big_data_elt_pipeline_spark.plans import queries as Q
from tests.conftest import SF_SMOKE


def test_stream_matches_batch_on_finalized_windows(spark):
    stream = Q.spark_queries()["stream_tumbling"](spark, SF_SMOKE).toPandas()
    batch = Q.spark_queries()["events_tumbling"](spark, SF_SMOKE).toPandas()
    assert len(stream) > 0
    # append mode: only watermark-finalized windows are emitted
    assert len(stream) <= len(batch)
    m = batch.merge(stream, on=["window_start", "event_type"], suffixes=("_b", "_s"))
    assert len(m) == len(stream)  # every emitted window exists in batch
    assert (m.n_b == m.n_s).all()
    assert (m.total_value_b == m.total_value_s).all()


def test_stateful_user_totals_match_batch(spark):
    """applyInPandasWithState across 2 micro-batches == batch groupBy."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.sources.tpch import events_df
    from big_data_elt_pipeline_spark.streaming.stateful import user_running_totals_stream

    stream = user_running_totals_stream(spark, SF_SMOKE).toPandas()
    batch = (
        events_df(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total_value"),
        )
        .toPandas()
    )
    m = batch.merge(stream, on="user_id", suffixes=("_b", "_s"))
    assert len(m) == len(batch) == len(stream)
    assert (m.n_b == m.n_s).all()
    assert (m.total_value_b == m.total_value_s).all()


def test_stream_stream_join_matches_batch(spark):
    """The watermarked stream-stream interval join emits exactly the batch
    join's pairs (complete single-batch arrival → no state eviction)."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.sources.tpch import events_df
    from big_data_elt_pipeline_spark.streaming.events import (
        attribution_join,
        stream_attribution_join,
    )

    stream = stream_attribution_join(spark, SF_SMOKE).toPandas()
    ev = events_df(spark, SF_SMOKE)
    batch = attribution_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    ).toPandas()
    assert len(batch) > 0
    key = ["purchase_id", "view_id"]
    s = stream.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s[key].values == b[key].values).all()
    assert (s.gap_sec.values == b.gap_sec.values).all()
    assert (s.user_id.values == b.user_id.values).all()


def test_stream_drops_only_trailing_watermark_windows(spark):
    stream = Q.spark_queries()["stream_tumbling"](spark, SF_SMOKE).toPandas()
    batch = Q.spark_queries()["events_tumbling"](spark, SF_SMOKE).toPandas()
    missing = batch.merge(
        stream[["window_start", "event_type"]],
        on=["window_start", "event_type"],
        how="left",
        indicator=True,
    )
    missing = missing[missing._merge == "left_only"]
    if len(missing):
        # all withheld windows sit within watermark horizon of max event time
        horizon = batch.window_start.max()
        import pandas as pd

        assert (missing.window_start >= horizon - pd.Timedelta(hours=2)).all()
