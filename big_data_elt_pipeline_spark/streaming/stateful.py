"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` (the escape hatch for operators Structured
Streaming's built-ins can't express — SURVEY.md §7 phase 6).

The fixture file is staged as TWO parquet chunks and consumed with
``maxFilesPerTrigger=1``, so the query really runs multiple micro-batches
and the state genuinely carries across them — the final per-user totals
must equal the batch groupBy (asserted in tests). On a cluster the source
becomes Kafka and the state store RocksDB; the operator body is unchanged.
"""

from __future__ import annotations

import pathlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from big_data_elt_pipeline_spark.streaming.events import events_raw_schema

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows into the per-user state and emit the
    updated running totals. Money is accumulated in integer cents —
    associative, overflow-safe, and float-drift-free across batches."""
    n, total_cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total_cents += int((pdf["value"] * 100).round().sum())
    state.update((n, total_cents))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total_cents": [total_cents]})


def _stage_two_chunks(spark: SparkSession, sf_dir: str) -> str:
    """Split the events fixture into two files so the stream runs >1 batch."""
    from big_data_elt_pipeline_spark.sources.tpch import ensure_nanos_conf

    ensure_nanos_conf(spark)
    stage = pathlib.Path("/tmp/spark_graft_stateful") / pathlib.Path(sf_dir).name
    if not (stage / "_SUCCESS").exists():
        # deliberate spread exemption: this once-per-process staging
        # splits events into single-file chunks (coalesce(1) below) for
        # the micro-batch source contract — a spread exchange would be
        # immediately undone by the coalesce
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        mid = df.agg(F.expr("percentile(event_id, 0.5)")).first()[0]
        df.filter(F.col("event_id") <= mid).coalesce(1).write.mode("overwrite").parquet(str(stage / "a"))
        df.filter(F.col("event_id") > mid).coalesce(1).write.mode("overwrite").parquet(str(stage / "b"))
        # flatten part files into one source dir, one file per chunk
        final = stage
        for sub in ("a", "b"):
            for f in (stage / sub).glob("part-*.parquet"):
                f.rename(final / f"{sub}.parquet")
        (stage / "_SUCCESS").touch()
    return str(stage)


def user_running_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful query to completion; return the FINAL totals per
    user (the last update each key emitted)."""
    stage = _stage_two_chunks(spark, sf_dir)
    raw = (
        spark.readStream.schema(events_raw_schema(spark, stage))
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    events = raw.select("user_id", "value")
    updates = events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "user_running_totals_sink"
    q = updates.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink = spark.table(name)
    # the memory sink accumulates every batch's updates; `n` is monotone per
    # user, so the final state is the max-n row
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n", (F.col("total_cents") / 100.0).alias("total_value"))
    )
