"""Manifest-snapshot lakehouse emulation: commit log, time travel,
snapshot isolation (immutable files + explicit-file-list reads)."""

import pytest
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark import io as eio
from big_data_elt_pipeline_spark import lakehouse as lh


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("val")
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    assert lh.write_table(_df(spark, 0, 5), path, "append") == 0
    assert lh.write_table(_df(spark, 5, 8), path, "append") == 1
    assert lh.write_table(_df(spark, 100, 102), path, "overwrite") == 2

    assert sorted(r.id for r in lh.read_table(spark, path, 0).collect()) == list(range(5))
    assert sorted(r.id for r in lh.read_table(spark, path, 1).collect()) == list(range(8))
    assert sorted(r.id for r in lh.read_table(spark, path, 2).collect()) == [100, 101]
    # default = latest
    assert sorted(r.id for r in lh.read_table(spark, path).collect()) == [100, 101]
    assert lh.table_versions(path) == [0, 1, 2]


def test_snapshot_isolation_across_concurrent_commits(spark, tmp_path):
    """A snapshot DataFrame resolved at version N returns the same rows
    even after later appends AND a later overwrite — the files it pinned
    are never mutated or deleted."""
    path = str(tmp_path / "t")
    lh.write_table(_df(spark, 0, 5), path, "append")
    snap = lh.read_table(spark, path, 0)
    before = sorted(r.id for r in snap.collect())

    lh.write_table(_df(spark, 5, 50), path, "append")
    lh.write_table(_df(spark, 900, 903), path, "overwrite")

    # the old snapshot is stable; a fresh read sees the overwrite
    assert sorted(r.id for r in snap.collect()) == before == list(range(5))
    assert sorted(r.id for r in lh.read_table(spark, path).collect()) == [900, 901, 902]
    # and the pre-overwrite history is still reachable by version
    assert sorted(r.id for r in lh.read_table(spark, path, 1).collect()) == list(range(50))


def test_read_lakehouse_serves_manifest_tables(spark, tmp_path):
    path = str(tmp_path / "t")
    lh.write_table(_df(spark, 0, 3), path, "append")
    lh.write_table(_df(spark, 3, 6), path, "append")
    # first-class manifest format
    assert eio.read_lakehouse(spark, "manifest", path, version=0).count() == 3
    # delta jars are absent on this image — the manifest log at the same
    # path still serves the table (and its history)
    assert eio.read_lakehouse(spark, "delta", path).count() == 6
    assert eio.read_lakehouse(spark, "delta", path, version=0).count() == 3


def test_read_lakehouse_still_raises_without_a_log(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="connector jars"):
        eio.read_lakehouse(spark, "delta", str(tmp_path / "nope"))
    with pytest.raises(ValueError, match="unknown lakehouse format"):
        eio.read_lakehouse(spark, "parquetish", str(tmp_path))


def test_overwrite_with_empty_frame_keeps_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    lh.write_table(_df(spark, 0, 3), path, "append")
    lh.write_table(_df(spark, 0, 0), path, "overwrite")
    out = lh.read_table(spark, path)
    assert out.count() == 0
    assert out.columns == ["id", "val"]
    assert lh.read_table(spark, path, 0).count() == 3


def test_stream_ingest_commits_per_batch(spark, tmp_path):
    """Streaming → manifest table: one atomic commit per micro-batch;
    version history replays the stream prefix-by-prefix and the final
    table equals the batch union."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    path = str(tmp_path / "t")
    _df(spark, 0, 4).coalesce(1).write.mode("append").parquet(src)
    _df(spark, 4, 9).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("id long, val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = lh.stream_ingest(stream, path, checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    versions = lh.table_versions(path)
    assert len(versions) == 2  # one commit per micro-batch
    assert lh.read_table(spark, path).count() == 9
    v0 = lh.read_table(spark, path, versions[0]).count()
    assert v0 in (4, 5)  # one whole file, whichever arrived first
    # replaying history: each version adds exactly one batch
    assert lh.read_table(spark, path, versions[1]).count() == 9


def test_txn_commit_is_idempotent(spark, tmp_path):
    """Delta-style txn tags: re-delivering the same (app_id, epoch) — the
    crash-between-commit-and-checkpoint scenario — is a no-op; a different
    epoch or a different app commits normally."""
    path = str(tmp_path / "t")
    assert lh.write_table(_df(spark, 0, 4), path, "append", txn=("app", 0)) == 0
    # replay of epoch 0: skipped, no new version, no duplicate rows
    assert lh.write_table(_df(spark, 0, 4), path, "append", txn=("app", 0)) == -1
    assert lh.table_versions(path) == [0]
    assert lh.read_table(spark, path).count() == 4
    # next epoch and a different app both land
    assert lh.write_table(_df(spark, 4, 6), path, "append", txn=("app", 1)) == 1
    assert lh.write_table(_df(spark, 6, 7), path, "append", txn=("other", 0)) == 2
    assert lh.read_table(spark, path).count() == 7


def test_stream_ingest_replayed_epoch_not_duplicated(spark, tmp_path):
    """Simulated crash-replay: after stream_ingest finishes, committing the
    first epoch's batch again under the stream's txn app id (exactly what a
    restarted query would do before its checkpoint advanced) leaves the
    table unchanged."""
    src = str(tmp_path / "src")
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    _df(spark, 0, 4).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("id long, val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = lh.stream_ingest(stream, path, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert lh.read_table(spark, path).count() == 4

    # the replayed foreachBatch call: same app id (derived from ckpt), epoch 0
    replay = lh.write_table(
        _df(spark, 0, 4), path, "append", txn=(f"stream_ingest:{ckpt}", 0)
    )
    assert replay == -1
    assert lh.read_table(spark, path).count() == 4
    assert lh.table_versions(path) == [0]
