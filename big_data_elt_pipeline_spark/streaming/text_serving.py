"""Streaming ingest INTO the persisted BM25 index — the text twin of
``streaming/ann_serving.stream_index_ingest`` (beyond-reference surface;
the reference has no streaming and no retrieval).

A document stream lands in the index one ``append_to_text_index`` call
per micro-batch: the delta is tokenized alone (never the corpus), its
postings and (term, df) increments commit clustered-by-term, and the
stats row advances — txn-tagged per epoch, so a crash re-delivery is
skipped (or, if the original crashed mid-publish, CONVERGED) rather
than double-counted. Because BM25 index stats are exact (no frozen
quantizers — contrast the ANN ingest's immutable-codebook note), a
fully streamed corpus is bit-identical to a batch build of the same
corpus: ``text_index_audit`` hashes match, which is what the pytest
pins.

Single-writer contract inherited from ``append_to_text_index`` — a
micro-batch stream IS the single writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.operators import text_index as TIX


def stream_text_ingest(
    spark: SparkSession,
    sf_dir: str,
    index_path: str,
    lo: int,
    hi: int,
    n_files: int | None = None,
    checkpoint_dir: str | None = None,
) -> dict:
    """File-stream the documents rows [lo, hi) into an EXISTING text
    index; returns the post-ingest stats dict. Same idempotence contract
    as ``ann_serving.stream_index_ingest``: without ``checkpoint_dir``
    the txn app id keys on ``index_path`` and a re-invocation replays as
    converging no-ops; with one, restarts continue the epoch sequence.
    """
    from big_data_elt_pipeline_spark.streaming.scoring import _staged_docs_dir

    stage = _staged_docs_dir(sf_dir, "documents.parquet")
    schema = spark.read.parquet(stage).schema
    raw = (
        spark.readStream.schema(schema)
        .parquet(stage)
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
    )
    app_id = f"stream_text_ingest:{checkpoint_dir or index_path}"

    def _ingest(batch: DataFrame, epoch: int) -> None:
        TIX.append_to_text_index(
            batch, index_path, txn=(app_id, int(epoch)), n_files=n_files
        )

    writer = raw.writeStream.outputMode("append").foreachBatch(_ingest)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return TIX.load_text_index_stats(spark, index_path)
