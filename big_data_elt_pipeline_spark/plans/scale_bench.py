"""Scaled-corpus benchmark for the dedup/ANN surface.

The correctness gate runs these operators on the base ``documents`` /
``embeddings`` tables; this module provides the SCALING evidence — the
same operators on deterministic x4 / x16 corpora min-of-2 plus a
single-shot x64 extrapolation pin (exactly the factors ``bench.py``
executes and records, so the artifact and this doc agree), built so the
true-result size grows ~linearly with the factor. The sf0.1 base corpus
is itself 10x the sf0.01 one (5,000 docs in the round-5 testdata drop),
so the x16 point spans 80,000 docs and the x64 pin 320,000:

- Text copies get a per-copy SALT suffixed onto every word
  (``a b c`` -> ``ac7 bc7 cc7``). Word n-gram shingles keep exactly the
  base corpus's within-copy structure (so each copy contributes exactly
  the base pair set), while no shingle ever matches across copies —
  corpus xK means work and output exactly xK, not xK² (which a naive
  concat-of-identical-copies corpus would produce and which no dedup
  design could survive). A between-words salt token was tried first and
  rejected: it degrades 3-gram shingles into effective unigrams
  (``s1 the s1`` matches every doc containing "the"), blowing up LSH
  buckets ~35x at x4.
- Embedding copies are multiplied elementwise by a per-copy ±1 mask — an
  orthogonal transform, so within-copy cosines (and the base copy's
  ground truth) are bit-preserved while cross-copy cosines scatter and
  sign-LSH buckets diverge. Queries stay FIXED (the base copy's probe
  set): the realistic ANN scaling axis is corpus growth under a constant
  query load.

Near-linear wall-time across factors is the 100 TB claim made empirical:
every stage is blocking-key equi-join / groupBy with no all-pairs term.
The governance composite (``training_mixture``) rides the same exhibit —
its result is a fixed per-language rollup (constant rows), so for that
point the linearity signal is wall-time alone.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.operators import dedup as D
from big_data_elt_pipeline_spark.operators import similarity as S
from big_data_elt_pipeline_spark.sources.tpch import read_table

_ID_STRIDE = 10_000_000


def _sign_mask(copy: int, dim: int) -> list[float]:
    """Deterministic ±1 mask per copy — fixed LCG, engine-independent."""
    x = (copy + 1) * 0x9E3779B97F4A7C15
    out = []
    for _ in range(dim):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(1.0 if (x >> 63) == 0 else -1.0)
    return out


def scaled_docs(spark: SparkSession, sf_dir: str, factor: int) -> DataFrame:
    """xK corpus as ONE constant-size plan: a broadcast crossJoin against a
    K-row copy dimension, per-copy salt applied with a column-valued
    regexp replacement. The first cut built a K-way UNION of K separate
    scans — plan size grew with K, and since the dedup operators re-derive
    the corpus per consumer (deliberately uncached, see
    ``dedup.shingle_table``), Catalyst re-optimized and re-codegen'd a
    64-branch union several times per query: measured 84 s for minhash at
    x64 vs 7.5 s at x16 (11x for 4x the data) with the union form. Plan
    growth, not data growth — the crossJoin form keeps the plan O(1) in K.

    lang rides along untouched (harmless for the dedup consumers, needed
    by the governance-mixture scaling point)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    if factor == 1:
        return docs
    copies = spark.range(factor).select(F.col("id").alias("copy_k"))
    return docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("copy_k") * F.lit(_ID_STRIDE)).alias("doc_id"),
        F.col("lang"),
        F.when(F.col("copy_k") == 0, F.col("text"))  # base copy bit-preserved
        .otherwise(
            F.regexp_replace(
                F.col("text"), F.lit(r"(\S+)"),
                F.concat(F.lit("$1c"), F.col("copy_k").cast("string")),
            )
        )
        .alias("text"),
    )


def scaled_embeddings(spark: SparkSession, sf_dir: str, factor: int, dim: int = 64) -> DataFrame:
    """Same constant-plan-size construction as ``scaled_docs``: the K
    per-copy ±1 masks become a K-row broadcast dimension carrying the mask
    ARRAY (copy 0 gets the all-ones mask, so the base copy's ground truth
    is bit-preserved), instead of K union branches each with its own
    literal array."""
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if factor == 1:
        return emb
    masks = [(k, [1.0] * dim if k == 0 else _sign_mask(k, dim)) for k in range(factor)]
    copies = emb.sparkSession.createDataFrame(masks, "copy_k long, mask array<double>")
    return emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("copy_k") * F.lit(_ID_STRIDE)).alias("vec_id"),
        F.zip_with("embedding", "mask", lambda a, b: (a * b).cast("float")).alias(
            "embedding"
        ),
    )


def run_scaled(
    spark: SparkSession, sf_dir: str, factors: tuple[int, ...] = (1, 4, 16),
    single_shot: tuple[int, ...] = (),
    progress=None,
    session_factory=None,
) -> dict[str, float]:
    """Time dedup_minhash / dedup_ngram_jaccard / dedup_winnow /
    dedup_clusters / ann_lsh_topk / training_mixture at each
    corpus factor, min-of-2 per point — single shots on this host showed
    2x swings (the same phantom the round-3 pipeline bench shipped), and
    a noisy point would distort the linearity trend this exhibit exists
    to demonstrate. Also records result rows so linear OUTPUT growth is
    auditable next to wall-time.

    Before the first timed factor, every operator runs ONCE untimed at
    that factor: the r05 artifact charged whole-stage codegen compilation
    and parquet-footer reads to the x1 points, inverting the trend
    (x1=18.9 s vs x4=6.7 s for minhash). Warm-up makes the x1 column a
    steady-state measurement like the others.

    ``single_shot`` factors (the x64 extrapolation pin) run once, no
    min-of-2 — they exist to bound the curve, not to be quotable to 2
    decimals, and a second ~3-minute pass would double the bench tail for
    no trend information.

    ``session_factory`` (no-arg -> SparkSession): when provided, each
    single-shot factor gets a FRESH session. Measured necessity: by x64
    the scale session has executed ~28 prior runs and its accumulated
    JVM/block-manager state swings the single-shot 2-4x run-to-run —
    identical ngram-x64 code measured 293 / 374 / 669 s across three
    in-suite bench runs vs 155 s reproducible on a dedicated session.
    The x1-x16 min-of-2 points stay on the shared session (they damp
    noise by repetition and their state burden is small)."""
    import shutil
    import tempfile

    out: dict[str, float] = {}
    stage_root = tempfile.mkdtemp(prefix="scale_corpus_")
    for i, factor in enumerate(tuple(factors) + tuple(single_shot)):
        one_shot = factor in single_shot
        if one_shot and session_factory is not None:
            spark.stop()
            spark = session_factory()
        # MATERIALIZE the xK corpus once per factor (setup, untimed): the
        # derived form re-ran the per-copy salting inside every consumer
        # pass of every operator — multi-pass operators (the governance
        # composite re-reads the corpus ~6x) were charged Kx corpus
        # construction instead of their own work, and the charge grew
        # superlinearly with K (column-replacement regexp is ~3x a literal
        # one). A stored corpus is also the realistic shape: real dedup
        # reads parquet, it does not re-synthesize its input per stage.
        scaled_docs(spark, sf_dir, factor).write.mode("overwrite").parquet(
            f"{stage_root}/docs_x{factor}")
        scaled_embeddings(spark, sf_dir, factor).write.mode("overwrite").parquet(
            f"{stage_root}/emb_x{factor}")
        docs = spark.read.parquet(f"{stage_root}/docs_x{factor}")
        emb = spark.read.parquet(f"{stage_root}/emb_x{factor}")
        queries = emb.filter(F.col("vec_id") < 64)  # base copy only: fixed probes
        from big_data_elt_pipeline_spark.plans.curation_queries import (
            governance_mixture,
        )

        runs = {
            "dedup_minhash": lambda: D.minhash_dedup(docs),
            # x64 runs the range-partitioned candidate passes (R=4): the
            # unsplit join is allocator-bound at 27M shingles in one JVM
            # (measured 205 s -> 155 s; R=8 and a checkpointed prefix both
            # measured WORSE — numbers in the operator's comment)
            "dedup_ngram_jaccard": lambda: D.ngram_jaccard_dedup(
                docs, candidate_passes=4 if factor >= 64 else 1
            ),
            "dedup_winnow": lambda: D.winnow_neardup(docs, threshold=0.4),
            # per-copy word salt => no window ever matches across copies:
            # repeated spans (and the window shuffle) grow exactly xK
            "dedup_substrings": lambda: D.substring_dedup(docs),
            # pairs -> components: the salted copies keep each base pair
            # inside its copy, so cluster count grows ~linearly too
            "dedup_clusters": lambda: D.neardup_clusters(
                D.minhash_dedup(docs).select("id1", "id2")
            ),
            "ann_lsh_topk": lambda: S.lsh_topk(emb, queries, k=5, n_bits=8),
            "training_mixture": lambda: governance_mixture(docs),
        }
        # every run frees whatever checkpoint blocks it pinned once its
        # count is materialized (the cluster-resolution runs keep their
        # final labels checkpoint alive otherwise — across the ~40 runs of
        # this exhibit the accumulation measurably slowed later factors)
        jsc = spark.sparkContext._jsc

        def _pinned() -> set:
            return set(jsc.getPersistentRDDs().keySet().toArray())

        for name, fn in runs.items():
            base_ids = _pinned()
            if i == 0:
                fn().count()  # untimed warm-up: codegen + footers off the clock
            best, n = None, 0
            for _ in range(1 if one_shot else 2):
                t0 = time.perf_counter()
                n = fn().count()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            reg = jsc.getPersistentRDDs()
            for rid in _pinned() - base_ids:
                rdd = reg.get(rid)
                if rdd is not None:
                    rdd.unpersist(False)
            out[f"scale_{name}_x{factor}"] = round(best, 4)
            out[f"scale_{name}_x{factor}_rows"] = float(n)
            if progress is not None:
                progress(f"scale_{name}_x{factor}", out[f"scale_{name}_x{factor}"])
        shutil.rmtree(f"{stage_root}/docs_x{factor}", ignore_errors=True)
        shutil.rmtree(f"{stage_root}/emb_x{factor}", ignore_errors=True)
    shutil.rmtree(stage_root, ignore_errors=True)
    return out
