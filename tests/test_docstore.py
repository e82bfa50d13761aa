"""Document-store Python DataSource: the Mongo-parity surface (S7/S8/S10)
as a real engine format — roundtrip fidelity, atomic manifest commits,
upsert semantics, and manifest-stats shard pruning for key lookups."""

import json
import pathlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, LessThanOrEqual

from big_data_elt_pipeline_spark.sources import docstore as DS


@pytest.fixture()
def store(spark, tmp_path):
    DS.register(spark)
    return str(tmp_path / "store")


def _gold(spark, n=300):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.5).alias("v"),
        F.concat(F.lit("client_"), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 2 == 0).alias("active"),
    )


def test_roundtrip_schema_and_values(spark, store):
    df = _gold(spark)
    df.repartitionByRange(6, "k").write.format("docstore").option("key", "k").mode(
        "append"
    ).save(store)
    back = spark.read.format("docstore").load(store)
    assert back.schema == df.schema  # stored schema, no inference drift
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_overwrite_truncate_and_load(spark, store):
    _gold(spark, 100).write.format("docstore").option("key", "k").mode("append").save(store)
    fresh = _gold(spark, 10)
    fresh.write.format("docstore").option("key", "k").mode("overwrite").save(store)
    assert spark.read.format("docstore").load(store).count() == 10


def test_upsert_replaces_and_inserts(spark, store):
    _gold(spark, 100).write.format("docstore").option("key", "k").mode("append").save(store)
    up = spark.createDataFrame(
        [(7, 0.0, "updated", False), (1000, 1.0, "new", True)],
        "k long, v double, name string, active boolean",
    )
    DS.upsert(spark, store, up, "k")
    back = spark.read.format("docstore").load(store)
    assert back.count() == 101
    got = {r.k: r.name for r in back.filter(F.col("k").isin(7, 1000)).collect()}
    assert got == {7: "updated", 1000: "new"}
    # upsert into a nonexistent store bootstraps it
    fresh = str(pathlib.Path(store).parent / "fresh")
    DS.upsert(spark, fresh, up, "k")
    assert spark.read.format("docstore").load(fresh).count() == 2


def test_key_filter_prunes_shards_and_filters_rows(spark, store):
    # range-clustered write → disjoint key ranges per shard → a point
    # lookup must visit ONE shard (observable via the pure prune function)
    _gold(spark, 600).repartitionByRange(6, "k").write.format("docstore").option(
        "key", "k"
    ).mode("append").save(store)
    manifest = json.loads((pathlib.Path(store) / "manifest.json").read_text())
    assert len(manifest["shards"]) >= 4
    kept = DS.prune_shards(manifest["shards"], manifest["stats"], [EqualTo(("k",), 250)])
    assert len(kept) == 1
    kept_rng = DS.prune_shards(
        manifest["shards"], manifest["stats"],
        [GreaterThan(("k",), 100), LessThanOrEqual(("k",), 150)],
    )
    assert 1 <= len(kept_rng) <= 2
    # and the end-to-end filtered read is exact
    back = spark.read.format("docstore").load(store)
    assert [r.k for r in back.filter(F.col("k") == 250).collect()] == [250]
    assert back.filter((F.col("k") > 100) & (F.col("k") <= 150)).count() == 50
    # pushed-filter plan: the scan side carries no Spark-side key filter
    # only when the source accepted it — row results above prove it applied


def test_staged_files_invisible_until_commit(spark, store):
    _gold(spark, 50).write.format("docstore").option("key", "k").mode("append").save(store)
    # plant a stray staged file: readers must ignore anything off-manifest
    staging = pathlib.Path(store) / "_staging"
    staging.mkdir(exist_ok=True)
    (staging / "stray.jsonl").write_text('{"k": 999999, "v": 0.0, "name": "x", "active": true}\n')
    back = spark.read.format("docstore").load(store)
    assert back.count() == 50
    assert back.filter(F.col("k") == 999999).count() == 0


def test_timestamp_column_roundtrip(spark, store):
    df = spark.createDataFrame(
        [(1, "2024-03-01 10:30:00"), (2, "2024-03-02 00:00:00")], "k long, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    df.write.format("docstore").option("key", "k").mode("append").save(store)
    back = spark.read.format("docstore").load(store)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_vacuum_reclaims_orphaned_shards(spark, store):
    _gold(spark, 50).write.format("docstore").option("key", "k").mode("append").save(store)
    _gold(spark, 20).write.format("docstore").option("key", "k").mode("overwrite").save(store)
    shards_dir = pathlib.Path(store) / "shards"
    before = len(list(shards_dir.glob("*.jsonl")))
    deleted = DS.vacuum(store)
    assert deleted >= 1 and len(list(shards_dir.glob("*.jsonl"))) == before - deleted
    assert spark.read.format("docstore").load(store).count() == 20  # live rows intact


def test_append_schema_enforced(spark, store):
    _gold(spark, 10).write.format("docstore").option("key", "k").mode("append").save(store)
    other = spark.createDataFrame([(1, "x")], "k long, other string")
    with pytest.raises(Exception, match="does not match the.*stored schema|stored schema"):
        other.write.format("docstore").option("key", "k").mode("append").save(store)
    # overwrite replaces the schema legitimately
    other.write.format("docstore").option("key", "k").mode("overwrite").save(store)
    assert spark.read.format("docstore").load(store).columns == ["k", "other"]


def test_stream_sink_appends_batches(spark, store, tmp_path):
    src = str(tmp_path / "src")
    _gold(spark, 40).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(_gold(spark, 1).schema).parquet(src)
    q = (
        stream.writeStream.format("docstore")
        .option("path", store)
        .option("key", "k")
        .option("appId", "test-stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.format("docstore").load(store)
    assert back.count() == 40
    manifest = json.loads((pathlib.Path(store) / "manifest.json").read_text())
    assert manifest["txns"].get("test-stream")  # epoch tags recorded


def test_stream_sink_replayed_epoch_is_skipped(spark, store):
    """Crash-replay simulation: the same (appId, batchId) committed twice
    must publish once — the second commit drops its staged shards."""
    from pyspark.sql import types as T

    from big_data_elt_pipeline_spark.sources.docstore import DocStoreStreamWriter

    schema = T.StructType().add("k", T.LongType()).add("v", T.DoubleType())
    w = DocStoreStreamWriter({"path": store, "key": "k", "appid": "app1"}, schema)
    m1 = w.write(iter([(1, 1.0), (2, 2.0)]))
    w.commit([m1], batchId=0)
    m2 = w.write(iter([(1, 1.0), (2, 2.0)]))  # engine re-delivers epoch 0
    w.commit([m2], batchId=0)
    DS.register(spark)
    assert spark.read.format("docstore").load(store).count() == 2  # not 4
    m3 = w.write(iter([(3, 3.0)]))
    w.commit([m3], batchId=1)  # the NEXT epoch still lands
    assert spark.read.format("docstore").load(store).count() == 3


def test_stream_source_tails_appends(spark, store, tmp_path):
    """CDC tailing: a readStream over the collection emits exactly the
    appended rows batch over batch, and an overwrite mid-stream raises
    instead of silently replaying rewritten history."""
    _gold(spark, 10).write.format("docstore").option("key", "k").mode("append").save(store)
    q = (
        spark.readStream.format("docstore")
        .schema(_gold(spark, 1).schema)
        .load(store)
        .writeStream.format("memory")
        .queryName("docstore_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("docstore_tail").count() == 10
        # append a second wave: the running stream must pick up ONLY it
        extra = spark.createDataFrame(
            [(1000, 0.0, "late", True)], "k long, v double, name string, active boolean"
        )
        extra.write.format("docstore").option("key", "k").mode("append").save(store)
        q.processAllAvailable()
        assert spark.table("docstore_tail").count() == 11
        assert spark.table("docstore_tail").filter(F.col("k") == 1000).count() == 1
    finally:
        q.stop()


def test_stream_source_rejects_overwritten_history(spark, store, tmp_path):
    """Resuming a tail after the collection was overwritten must FAIL:
    the checkpointed offset indexes shards that no longer exist, and
    silently re-serving rewritten history would duplicate or lose rows."""
    _gold(spark, 10).write.format("docstore").option("key", "k").mode("append").save(store)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    def start():
        return (
            spark.readStream.format("docstore")
            .schema(_gold(spark, 1).schema)
            .load(store)
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt).outputMode("append").start()
        )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _gold(spark, 3).write.format("docstore").option("key", "k").mode("overwrite").save(store)
    q2 = start()
    try:
        with pytest.raises(Exception, match="overwritten|append-only"):
            q2.processAllAvailable()
    finally:
        q2.stop()
