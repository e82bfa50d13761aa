"""Corpus-level governance operators: benchmark-contamination detection and
deterministic stratified mixture sampling.

Beyond-reference surface — two steps every large-scale training-data
pipeline runs between "cleaned corpus" and "training mixture":

- ``benchmark_overlap``: find training documents that share enough word
  n-grams with a held-out benchmark/eval set to count as contaminated
  (the n-gram-overlap decontamination rule used by GPT-3/PaLM-style data
  cards, on the same shingle machinery as the dedup family).
- ``stratified_sample``: down/up-weight strata (language, source, domain)
  to target rates with a DETERMINISTIC per-row coin flip — a Knuth-style
  multiplicative hash of the id, not ``rand()`` — so the sampled corpus is
  reproducible run-to-run, engine-to-engine, and auditable by the DuckDB
  oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.operators.dedup import shingle_table

# Knuth multiplicative-hash constants for the sampling coin flip. The modulus
# is a power of two so ``(id * A + C) % M / M`` is exact integer→double math
# in both engines (no float rounding ambiguity at the rate boundary).
SAMPLE_A = 2654435761
SAMPLE_C = 12345
SAMPLE_M = 1 << 20


def benchmark_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_shared: int = 3,
) -> DataFrame:
    """(train_id, bench_id, n_shared) for every train doc sharing at least
    ``min_shared`` distinct word ``n``-grams with a benchmark doc.

    Scale shape: the benchmark side is SMALL by nature (eval sets are
    thousands of docs, the corpus is billions), so its shingle table is
    broadcast — the contamination scan is then a map-side hash join over
    the training shingles with NO shuffle of the 100 TB side; the only
    exchange is the tiny groupBy on (train_id, bench_id) candidate pairs.
    ``shingle_table`` emits distinct (doc, shingle) pairs by construction,
    so ``count(*)`` per pair IS the distinct-shared-shingle count.
    """
    tr = shingle_table(train, id_col, text_col, n).withColumnRenamed(id_col, "train_id")
    be = shingle_table(bench, id_col, text_col, n).withColumnRenamed(id_col, "bench_id")
    return (
        tr.join(F.broadcast(be), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def sample_flag(id_col: F.Column, rate_col: F.Column) -> F.Column:
    """Deterministic keep/drop decision: uniform-ish u in [0,1) from a
    multiplicative hash of the id, kept iff ``u < rate``. Pure bigint
    arithmetic + one exact division — bit-identical in any engine.

    The id is reduced mod ``SAMPLE_M`` BEFORE the multiply: the final
    reduction is also mod ``SAMPLE_M``, so ``((id % M) * A + C) % M ==
    (id * A + C) % M`` mathematically, but the pre-mod keeps the product
    under 2**51 — without it, ids above ~3.4e9 overflow int64 (a throw
    under Spark ANSI mode and DuckDB alike), which matters at the
    billions-of-docs scale this operator targets. Hash values for any id
    are identical to the un-pre-modded form.
    """
    u = ((id_col.cast("long") % F.lit(SAMPLE_M) * F.lit(SAMPLE_A) + F.lit(SAMPLE_C))
         % F.lit(SAMPLE_M)).cast("double") / F.lit(float(SAMPLE_M))
    return u < rate_col


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum summary of a deterministic mixture-sampling pass:
    (stratum, target_rate, n_docs, n_sampled, realized_rate, weight).

    ``weight`` = 1/rate is the importance weight a loss-reweighting
    trainer would attach to surviving rows. One map-only flag pass plus
    one tiny groupBy on the stratum — no other shuffle at any scale.
    """
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    flagged = docs.select(
        F.col(strata_col).alias("stratum"),
        rate.alias("target_rate"),
        sample_flag(F.col(id_col), rate).cast("int").alias("sampled"),
    )
    return (
        flagged.groupBy("stratum", "target_rate")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("sampled").cast("long").alias("n_sampled"),
            (F.sum("sampled").cast("double") / F.count(F.lit(1))).alias("realized_rate"),
        )
        .withColumn(
            "weight",
            F.when(F.col("target_rate") > 0, F.lit(1.0) / F.col("target_rate")).otherwise(F.lit(0.0)),
        )
        .orderBy("stratum")
    )


DSIR_BUCKETS = 1024


def _hashed_feats(df: DataFrame, id_col: str, text_col: str,
                  n: int, buckets: int) -> DataFrame:
    """(id, bucket) hashed n-gram feature occurrences — RAW counts (no
    within-doc dedup; DSIR features are frequencies, not sets). Map-only:
    shingle + hash + mod inside the row, explode is a generator."""
    from big_data_elt_pipeline_spark.functions.text import hash60, word_shingles

    return df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    ).select(id_col, F.pmod(hash60(F.col("sh")), F.lit(buckets)).alias("b"))


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how much its hashed n-gram feature distribution resembles a TARGET
    domain corpus. Returns (doc_id, n_feats, weight) with weight =
    sum over the doc's feature occurrences of the per-bucket log-ratio
    lambda_b = ln( p_target(b) / p_raw(b) ) under add-one smoothing —
    positive = target-like. Selection composes downstream (top-k, or
    ``sample_flag`` with a weight-derived rate); the operator's output is
    the full auditable weight table.

    Determinism contract (the BM25 idiom): each lambda_b is quantized to
    1e-6 (absorbing the JVM-vs-DuckDB 1-ulp ``ln`` divergence) and the
    per-doc sum runs as exact DECIMAL — weights are bit-stable under any
    partitioning and engine.

    Scale shape: two bucket-count aggregations (map-side partial, output
    bounded by ``buckets`` rows each); corpus totals ride a single-row
    broadcast crossJoin (never ``.collect()``); the lambda table is at
    most ``buckets`` rows and broadcasts into the per-doc rollup — the
    only corpus-sized shuffle is the final groupBy(doc). The feature
    relation is recomputed per consumer rather than cached (the
    ``shingle_table`` trade, measured there).
    """
    feats = _hashed_feats(docs, id_col, text_col, n, buckets)
    tfeats = _hashed_feats(target, id_col, text_col, n, buckets)
    rc = feats.groupBy("b").agg(F.count(F.lit(1)).alias("cnt_r"))
    tc = tfeats.groupBy("b").agg(F.count(F.lit(1)).alias("cnt_t"))
    tots = feats.agg(F.count(F.lit(1)).alias("tot_r")).crossJoin(
        tfeats.agg(F.count(F.lit(1)).alias("tot_t"))
    )
    lam = F.round(
        F.log(
            ((F.coalesce(F.col("cnt_t"), F.lit(0)) + F.lit(1)).cast("double")
             * (F.col("tot_r") + F.lit(buckets)).cast("double"))
            / ((F.col("cnt_r") + F.lit(1)).cast("double")
               * (F.col("tot_t") + F.lit(buckets)).cast("double"))
        ),
        6,
    )
    lam_tbl = (
        rc.join(tc, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select("b", lam.alias("lam"))
    )
    return (
        feats.join(F.broadcast(lam_tbl), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.col("lam").cast("decimal(25,6)")).cast("double").alias("weight"),
        )
        .orderBy(id_col)
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR SELECTION (the resampling step of Xie et al. 2023, closing the
    loop ``dsir_weights`` opens): keep the ``k`` most target-like
    documents by importance weight, in the deterministic exact-top-k form.
    Returns the selected-corpus audit (doc_id, n_feats, weight, rank) —
    rank 1 = most target-like; the order (weight DESC, doc_id ASC) is
    TOTAL, so the selection boundary is deterministic under weight ties
    (quantized lambdas make exact ties realistic) and invariant under any
    input partitioning — weights themselves are bit-stable by the decimal
    sum contract upstream.

    Scale shape: everything up to the weight table is ``dsir_weights``'
    plan (two bucket-bounded aggs, broadcast lambda join, one corpus-sized
    groupBy). Selection is ``orderBy(...).limit(k)`` — Spark executes
    TakeOrderedAndProject: each partition keeps its local top-k and only
    k-row heaps merge at the driver, NO global sort of the corpus. The
    rank window then runs on the k surviving rows only (the vocab_topk
    idiom). For budget-FRACTION selection at 100 TB (k itself
    corpus-sized), compose ``sample_flag`` with a weight-derived rate
    instead — ``stratified_sample`` shows the flag discipline.
    """
    from pyspark.sql import Window

    w = dsir_weights(docs, target, id_col, text_col, n, buckets)
    head = w.orderBy(F.desc("weight"), F.asc(id_col)).limit(k)
    win = Window.orderBy(F.desc("weight"), F.asc(id_col))
    return head.withColumn("rank", F.row_number().over(win).cast("int"))
