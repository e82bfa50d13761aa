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


def hotkey_survivor_exhibit(spark: SparkSession, n_rows: int = 32_000_000,
                            hot_every: int = 1000) -> dict[str, float]:
    """Skew exhibit for the r8 survivor-selection fix (r7 verdict #1): a
    synthetic window relation where ONE hash carries 99.9% of the rows
    (~32M at the defaults — the web-boilerplate shape) amid a small
    unique-hash background, run through BOTH survivor-selection forms on
    the identical input (equivalence is pytest-pinned in
    test_dedup_skew.py). The background is deliberately small in DISTINCT
    count: a large unique background makes the final aggregate itself an
    AQE-coalesced narrow stage (small-data coalescing, not hot-key skew)
    and muddies the signal being exhibited.

    The claim under test is STRUCTURAL — "the hot-key corpus no longer
    serializes into one task" — so alongside wall-clock the exhibit
    SAMPLES the status tracker's active-task count during each run and
    reports the run's mean concurrency. The rejected rank-1 window form
    must sort every occurrence of the hot hash inside one unsplittable
    task (mean concurrency collapses toward 1 — on a 1000-executor
    cluster that task IS the job's wall-clock and its memory ceiling);
    the shipped min-struct aggregate form collapses the hot key map-side
    via partial aggregation and joins survivors back (broadcast here,
    AQE-skew-splittable SMJ at cluster scale), keeping every stage wide.
    Wall-clock on local[32] under-sells the gap — a single in-memory
    sort of the hot partition is cheap when the whole corpus fits in one
    JVM — which is exactly why the concurrency signal is recorded.
    min-of-2 after an untimed warm-up, like every other scale point."""
    import threading

    from big_data_elt_pipeline_spark.operators import dedup as DD

    wins = spark.range(n_rows).select(
        F.floor(F.col("id") / F.lit(100)).cast("long").alias("doc_id"),
        F.pmod(F.col("id"), F.lit(100)).cast("long").alias("off"),
        F.when(F.pmod(F.col("id"), F.lit(hot_every)) != 0, F.lit(42))
        .otherwise(F.col("id") + F.lit(1000))
        .cast("long")
        .alias("h"),
    )
    tracker = spark.sparkContext.statusTracker()

    def _sampled_run(fn) -> tuple[float, int, float]:
        samples: list[int] = []
        stop = threading.Event()

        def _sampler() -> None:
            while not stop.is_set():
                active = 0
                for sid in tracker.getActiveStageIds():
                    info = tracker.getStageInfo(sid)
                    if info is not None:
                        active += info.numActiveTasks
                samples.append(active)
                time.sleep(0.05)

        th = threading.Thread(target=_sampler, daemon=True)
        th.start()
        t0 = time.perf_counter()
        n = fn(wins).count()
        dt = time.perf_counter() - t0
        stop.set()
        th.join()
        busy = [x for x in samples if x > 0]
        mean = (sum(busy) / len(busy)) if busy else 0.0
        # dwell time with <=2 running tasks: the straggler signature —
        # a wide plan only touches it at stage boundaries
        serialized = 0.05 * sum(1 for x in busy if x <= 2)
        return dt, n, mean, serialized

    out: dict[str, float] = {}
    forms = (
        ("agg", DD._non_survivor_windows),
        ("window", DD._non_survivor_windows_window_form),
    )
    for key, fn in forms:
        fn(wins).count()  # untimed warm-up: codegen off the clock
        best, n, conc, ser = None, 0, 0.0, 0.0
        for _ in range(2):
            dt, n, c, sz = _sampled_run(fn)
            if best is None or dt < best:
                best, conc, ser = dt, c, sz
        out[f"hotkey_{key}_s"] = round(best, 4)
        out[f"hotkey_{key}_rows"] = float(n)
        out[f"hotkey_{key}_avg_active_tasks"] = round(conc, 1)
        out[f"hotkey_{key}_serialized_s"] = round(ser, 2)
    return out


def knn_scale_pin(
    spark: SparkSession,
    sf_dir: str,
    factors: tuple[int, ...] = (1, 4, 16, 64),
    progress=None,
) -> dict[str, float]:
    """Post-centering scale pin for the bucketed embedding SELF-JOIN
    family (r9 verdict #2): ``knn_graph`` (the operator the r9 centering
    fix was FOR) and ``embedding_neardup`` on the ±1-masked scaled corpus,
    with the ``component_means`` job broken out separately — the means
    pass is one corpus scan + a dims-bounded agg, so its cost must stay a
    small additive slice while the bucket self-join dominates and scales
    near-linearly (buckets stay balanced because copy 0's means-centered
    bits split ~half/half and the ±1 masks scatter the other copies).

    Min-of-2 per point after one untimed warm-up at the first factor:
    the r9/r10 single-shot discipline existed because the FIXED-bits x64
    point cost ~20 min; at the derived widths the whole pin is ~1 min, and
    single shots on this host swing 4x run-to-run (measured 7.7 s vs
    28.1 s for the same x64 point at load1 ~9) — min-of-2 is what the rest
    of the bench already uses for exactly this reason.
    Returns ``knnpin_{means,knn_graph,neardup}_x{f}`` seconds plus
    ``_rows`` and ``_bits`` audit columns.

    r11 change (the r10 verdict's weak mark): knn_graph / neardup run at
    their CORPUS-DERIVED default widths (``similarity.derive_bits``), not
    fixed bits — the pin now certifies that the pair space the defaults
    buy stays ~linear in n (x64 wall within ~4x of x16), where the r10
    fixed-8-bit pin measured the quadratic envelope (6.7 s -> 105 s). The
    derived widths are recorded per factor so the artifact shows the knob
    turning itself."""
    import shutil
    import tempfile

    out: dict[str, float] = {}
    stage_root = tempfile.mkdtemp(prefix="knn_scale_")
    warmed = False
    for factor in factors:
        # repartition before staging: the scaled frame inherits 1-2 input
        # splits from the tiny base table, and a 1-2-file stage would run
        # the timed passes nearly single-core (off the timers — staging
        # cost is the harness's, not the operator's)
        scaled_embeddings(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/emb_x{factor}")
        emb = spark.read.parquet(f"{stage_root}/emb_x{factor}")
        # derived widths recorded OUTSIDE the timers (the operators re-run
        # the same two-scalar aggregate inside — its cost is part of the
        # timed runs, as a real caller pays it)
        out[f"knnpin_knn_graph_x{factor}_bits"] = float(
            S.derive_bits(emb, S.KNN_TARGET_BUCKET_ROWS))
        out[f"knnpin_neardup_x{factor}_bits"] = float(
            S.derive_bits(emb, S.NEARDUP_TARGET_BUCKET_ROWS))
        runs = {
            # the means job alone: the one-row broadcast relation every
            # bucketed operator builds first (localCheckpoint'ed inside)
            "means": lambda: S.component_means(emb, 8),
            "knn_graph": lambda: S.knn_graph(emb, k=5),
            "neardup": lambda: S.embedding_neardup(emb),
        }
        for name, fn in runs.items():
            if not warmed:
                fn().count()
            best, n = None, 0
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn().count()
                dt = time.perf_counter() - t0
                if best is None or dt < best:
                    best = dt
            out[f"knnpin_{name}_x{factor}"] = round(best, 4)
            out[f"knnpin_{name}_x{factor}_rows"] = float(n)
            if progress is not None:
                progress(f"knnpin_{name}_x{factor}", out[f"knnpin_{name}_x{factor}"])
        warmed = True
        shutil.rmtree(f"{stage_root}/emb_x{factor}", ignore_errors=True)
    shutil.rmtree(stage_root, ignore_errors=True)
    return out


def ivf_scale_pin(
    spark: SparkSession,
    sf_dir: str,
    factors: tuple[int, ...] = (64, 256),
    n_queries: int = 16,
    progress=None,
) -> dict[str, float]:
    """Scale pin for the corpus-derived IVF cell counts (the auto_cells
    r11 change — the KNNPIN discipline applied to the coarse-quantizer
    family): ``ivfpq_topk`` at the AUTO default on the ±1-masked scaled
    corpus, factors chosen so the knob visibly turns (x64 = 128k rows →
    16 cells at the lo clamp; x256 = 512k rows → 32 derived cells). With
    the sqrt balance both the assignment pass (n × cells comparisons)
    and the probed candidate set (n_probe × n/cells rows per query) grow
    ~sqrt within the power-of-two quantization, so 4× the corpus must
    cost ~4× wall, not 16× — the claim the artifact records, next to a
    per-factor audit of the derived count and the exact probed-cell row
    total the scan pays for.

    Min-of-2 after one untimed warm-up at the first factor (the
    knn_scale_pin measurement discipline)."""
    import shutil
    import tempfile

    out: dict[str, float] = {}
    stage_root = tempfile.mkdtemp(prefix="ivf_scale_")
    warmed = False
    build_warmed = False
    for factor in factors:
        # repartition before staging (r11 advice): without it the staged
        # parquet inherits 1-2 splits from the tiny base table and the
        # timed passes run nearly single-core
        scaled_embeddings(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/emb_x{factor}")
        emb = spark.read.parquet(f"{stage_root}/emb_x{factor}")
        n = emb.count()
        cells = S.auto_cells(n)
        out[f"ivfpin_x{factor}_rows"] = float(n)
        out[f"ivfpin_x{factor}_cells"] = float(cells)
        queries = emb.filter(F.col("vec_id") < n_queries)

        # audit OUTSIDE the timers: total corpus rows living in the
        # n_probe cells each query probes — the row count the ADC scan
        # actually joins (the pair-space analogue of the knn bucket audit)
        cents1 = F.broadcast(S.fixed_centroid_cells(emb, cells))
        csizes = (
            emb.crossJoin(cents1)
            .select(
                (-F.array_max(
                    F.transform(
                        F.col("__cents"),
                        lambda ct: F.struct(
                            F.try_divide(
                                S.dot(F.col("embedding"), ct["cvec"]),
                                S.norm(F.col("embedding")) * ct["cvn"],
                            ).alias("cos"),
                            (-ct["cell"]).alias("negcell"),
                        ),
                    )
                )["negcell"]).alias("cell")
            )
            .groupBy("cell").count()
        )
        probes = (
            queries.crossJoin(cents1)
            .select(
                F.col("vec_id").alias("qid"),
                F.explode(
                    F.slice(
                        F.array_sort(
                            F.transform(
                                F.col("__cents"),
                                lambda ct: F.struct(
                                    (-F.try_divide(
                                        S.dot(F.col("embedding"), ct["cvec"]),
                                        S.norm(F.col("embedding")) * ct["cvn"],
                                    )).alias("negcos"),
                                    ct["cell"].alias("cell"),
                                ),
                            )
                        ),
                        1, 4,
                    )
                ).alias("pr"),
            )
            .select("qid", F.col("pr.cell").alias("cell"))
        )
        probed_rows = (
            probes.join(csizes, "cell").agg(F.sum("count")).head()[0]
        )
        out[f"ivfpin_x{factor}_probed_rows"] = float(probed_rows or 0)

        fn = lambda: S.ivfpq_topk(emb, queries, k=5)  # noqa: E731
        if not warmed:
            fn().count()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            nr = fn().count()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        out[f"ivfpin_ivfpq_x{factor}"] = round(best, 4)
        out[f"ivfpin_ivfpq_x{factor}_out_rows"] = float(nr)
        if progress is not None:
            progress(f"ivfpin_ivfpq_x{factor}", best)

        # build-once / probe-many split (r11 verdict #2): the one-shot
        # wall above is encode-dominated; time the persisted build
        # separately from the stored-index probe so the artifact shows
        # what amortizing the encode buys a serving workload
        from big_data_elt_pipeline_spark.operators import ann_index as AIX

        idx = f"{stage_root}/index_x{factor}"
        if not build_warmed:
            # untimed warm-up build: the FIRST build in a session pays
            # the lakehouse write path's codegen/footer costs — charged
            # to the x-first point, it inverted the build trend (the r05
            # x1 lesson applied to the write side)
            AIX.build_ivfpq_index(emb, f"{stage_root}/index_warm")
            shutil.rmtree(f"{stage_root}/index_warm", ignore_errors=True)
            build_warmed = True
        t0 = time.perf_counter()
        AIX.build_ivfpq_index(emb, idx)
        out[f"ivfpin_build_x{factor}"] = round(time.perf_counter() - t0, 4)
        if progress is not None:
            progress(f"ivfpin_build_x{factor}", out[f"ivfpin_build_x{factor}"])
        pfn = lambda: AIX.ivfpq_probe(spark, idx, queries, k=5)  # noqa: E731
        pfn().count()  # untimed warm-up: probe plan codegen + footers
        pbest = None
        for _ in range(2):
            t0 = time.perf_counter()
            pn = pfn().count()
            dt = time.perf_counter() - t0
            if pbest is None or dt < pbest:
                pbest = dt
        out[f"ivfpin_probe_x{factor}"] = round(pbest, 4)
        out[f"ivfpin_probe_x{factor}_out_rows"] = float(pn)
        if progress is not None:
            progress(f"ivfpin_probe_x{factor}", pbest)
        shutil.rmtree(idx, ignore_errors=True)
        warmed = True
        shutil.rmtree(f"{stage_root}/emb_x{factor}", ignore_errors=True)
    shutil.rmtree(stage_root, ignore_errors=True)
    return out


def bm25_scale_pin(
    spark: SparkSession,
    sf_dir: str,
    factors: tuple[int, ...] = (16, 64),
    progress=None,
) -> dict[str, float]:
    """Scale pin for the persisted BM25 index (r12 verdict #1's
    build/probe split — the IVFPIN discipline applied to text): per
    factor on the salted scaled corpus, the wall for the AD-HOC
    ``bm25_topk`` (recomputes tf/df/avgdl from the full corpus — the
    per-call serving bug the index closes), the one-time
    ``build_text_index``, and the stored-index ``bm25_index_probe``,
    plus the file-skipping AUDIT: of the postings files the probe COULD
    open, how many the manifest term-range fold keeps for the probe
    vocabulary. The salted copies rewrite every token (``scaled_docs``),
    so the corpus vocabulary grows with the factor while the probe's
    terms match only base-copy documents — exactly the serving shape the
    claim needs: ad-hoc wall tracks the corpus, the stored-index probe
    tracks the CANDIDATES (flat), and kept-files/total-files shows the
    pruning doing it.

    Min-of-2 after one untimed warm-up at the first factor; the first
    index build in the session is an untimed warm-up (lakehouse write
    codegen/footer costs — the ivf_scale_pin lesson)."""
    import shutil
    import tempfile

    from big_data_elt_pipeline_spark.operators import retrieval as RETR
    from big_data_elt_pipeline_spark.operators import text_index as TIX

    queries = spark.createDataFrame(
        [
            ("q_join", "shuffle join broadcast table"),
            ("q_scan", "parquet scan filter pushdown"),
            ("q_window", "window partition order row"),
        ],
        "query_id string, query_text string",
    )
    qvocab = [
        r["term"]
        for r in RETR.tokenize(queries, "query_id", "query_text")
        .select("term").distinct().collect()
    ]

    out: dict[str, float] = {}
    stage_root = tempfile.mkdtemp(prefix="bm25_scale_")
    warmed = False
    build_warmed = False
    for factor in factors:
        scaled_docs(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/docs_x{factor}")
        docs = spark.read.parquet(f"{stage_root}/docs_x{factor}").select(
            "doc_id", "text"
        )
        out[f"bm25pin_x{factor}_rows"] = float(docs.count())

        fn = lambda: RETR.bm25_topk(docs, queries, k=10)  # noqa: E731
        if not warmed:
            fn().count()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            nr = fn().count()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        out[f"bm25pin_adhoc_x{factor}"] = round(best, 4)
        out[f"bm25pin_adhoc_x{factor}_out_rows"] = float(nr)
        if progress is not None:
            progress(f"bm25pin_adhoc_x{factor}", best)

        idx = f"{stage_root}/index_x{factor}"
        if not build_warmed:
            TIX.build_text_index(docs, f"{stage_root}/index_warm")
            shutil.rmtree(f"{stage_root}/index_warm", ignore_errors=True)
            build_warmed = True
        t0 = time.perf_counter()
        TIX.build_text_index(docs, idx)
        out[f"bm25pin_build_x{factor}"] = round(time.perf_counter() - t0, 4)
        if progress is not None:
            progress(f"bm25pin_build_x{factor}", out[f"bm25pin_build_x{factor}"])

        kept, live = TIX.prune_term_files(f"{idx}/postings", qvocab)
        out[f"bm25pin_x{factor}_kept_files"] = float(len(kept))
        out[f"bm25pin_x{factor}_total_files"] = float(len(live))

        pfn = lambda: TIX.bm25_index_probe(spark, idx, queries, k=10)  # noqa: E731
        pfn().count()  # untimed warm-up: probe plan codegen + footers
        pbest = None
        for _ in range(2):
            t0 = time.perf_counter()
            pn = pfn().count()
            dt = time.perf_counter() - t0
            if pbest is None or dt < pbest:
                pbest = dt
        out[f"bm25pin_probe_x{factor}"] = round(pbest, 4)
        out[f"bm25pin_probe_x{factor}_out_rows"] = float(pn)
        if progress is not None:
            progress(f"bm25pin_probe_x{factor}", pbest)
        shutil.rmtree(idx, ignore_errors=True)
        warmed = True
        shutil.rmtree(f"{stage_root}/docs_x{factor}", ignore_errors=True)
    shutil.rmtree(stage_root, ignore_errors=True)
    return out


def hybrid_scale_pin(
    spark: SparkSession,
    sf_dir: str,
    factors: tuple[int, ...] = (16, 64),
    progress=None,
) -> dict[str, float]:
    """Scale pin for HYBRID serving from the two persisted indexes (r13
    verdict #7): BM25PIN and IVFPIN each pin one leg; this pins the
    COMPOSITION — the stored-BM25 lexical probe and the stored-IVF-PQ
    ADC probe, RRF-fused (exactly the ``hybrid_index_topk`` gate plan) —
    against the ad-hoc hybrid twin that re-tokenizes the corpus for
    BM25 stats AND re-encodes it for PQ codes on every call.

    The fused probe must inherit BOTH legs' flatness: its plan touches
    the term-range-pruned postings files, the cell-pruned code files,
    and two candidate-sized rankings — never the corpus text or the
    float vectors — so the wall tracks the (constant) query/candidate
    load while the ad-hoc twin tracks the corpus. Per factor the
    artifact records both walls (min-of-2 after an untimed warm-up at
    the first factor; both index builds are one-time costs recorded
    separately), the fused output rows, and the file-skipping audits of
    both legs (kept/total postings files by the probe vocabulary;
    kept/total code files follow the IVFPIN probe shape and ride the
    probe wall itself).

    Queries are FIXED base-copy documents (8 <= doc_id < 16 — the gate
    query's ids): the salted doc copies and ±1-masked embedding copies
    grow the corpus while the probe load and its true answer set stay
    base-sized — the serving shape the claim needs.
    """
    import shutil
    import tempfile

    from big_data_elt_pipeline_spark.operators import ann_index as AIX
    from big_data_elt_pipeline_spark.operators import retrieval as RETR
    from big_data_elt_pipeline_spark.operators import similarity as SIM
    from big_data_elt_pipeline_spark.operators import text_index as TIX
    from big_data_elt_pipeline_spark.operators.retrieval import rrf_fuse

    out: dict[str, float] = {}
    stage_root = tempfile.mkdtemp(prefix="hybrid_scale_")
    warmed = False
    build_warmed = False
    for factor in factors:
        scaled_docs(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/docs_x{factor}")
        docs = spark.read.parquet(f"{stage_root}/docs_x{factor}").select(
            "doc_id", "text"
        )
        scaled_embeddings(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/emb_x{factor}")
        emb = spark.read.parquet(f"{stage_root}/emb_x{factor}")
        out[f"hybridpin_x{factor}_rows"] = float(docs.count())

        queries = docs.filter(
            (F.col("doc_id") >= 8) & (F.col("doc_id") < 16)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.col("text").alias("query_text"),
        ).localCheckpoint(eager=True)
        vq = emb.filter(
            (F.col("vec_id") >= 8) & (F.col("vec_id") < 16)
        ).localCheckpoint(eager=True)

        # ad-hoc twin: corpus tokenize + stats for the lexical leg, full
        # corpus re-encode for the vector leg, fused — what serving pays
        # per query batch WITHOUT the indexes
        def adhoc():
            lex = RETR.bm25_topk(docs, queries, k=50).filter(
                F.col("doc_id") != F.col("query_id")
            )
            vec = SIM.ivfpq_topk(emb, vq, k=50, n_probe=4).select(
                "query_id", F.col("vec_id").alias("doc_id"), "rank"
            )
            return rrf_fuse(lex, vec, k=10, c=60)

        if not warmed:
            adhoc().count()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            nr = adhoc().count()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        out[f"hybridpin_adhoc_x{factor}"] = round(best, 4)
        out[f"hybridpin_adhoc_x{factor}_out_rows"] = float(nr)
        if progress is not None:
            progress(f"hybridpin_adhoc_x{factor}", best)

        # one-time builds (recorded, not part of the probe claim); the
        # first build of the session is an untimed warm-up (lakehouse
        # write codegen/footer costs — the ivf_scale_pin lesson)
        tix_idx = f"{stage_root}/tix_x{factor}"
        aix_idx = f"{stage_root}/aix_x{factor}"
        if not build_warmed:
            TIX.build_text_index(docs, f"{stage_root}/tix_warm")
            shutil.rmtree(f"{stage_root}/tix_warm", ignore_errors=True)
            build_warmed = True
        t0 = time.perf_counter()
        TIX.build_text_index(docs, tix_idx)
        out[f"hybridpin_text_build_x{factor}"] = round(
            time.perf_counter() - t0, 4
        )
        t0 = time.perf_counter()
        AIX.build_ivfpq_index(emb, aix_idx)
        out[f"hybridpin_ann_build_x{factor}"] = round(
            time.perf_counter() - t0, 4
        )

        qvocab = [
            r["term"]
            for r in RETR.tokenize(queries, "query_id", "query_text")
            .select("term").distinct().collect()
        ]
        kept, live = TIX.prune_term_files(f"{tix_idx}/postings", qvocab)
        out[f"hybridpin_x{factor}_kept_files"] = float(len(kept))
        out[f"hybridpin_x{factor}_total_files"] = float(len(live))

        def fused():
            lex = TIX.bm25_index_probe(spark, tix_idx, queries, k=50).filter(
                F.col("doc_id") != F.col("query_id")
            )
            vec = AIX.ivfpq_probe(
                spark, aix_idx, vq, k=50, n_probe=4
            ).select("query_id", F.col("vec_id").alias("doc_id"), "rank")
            return rrf_fuse(lex, vec, k=10, c=60)

        fused().count()  # untimed warm-up: probe plan codegen + footers
        pbest = None
        for _ in range(2):
            t0 = time.perf_counter()
            pn = fused().count()
            dt = time.perf_counter() - t0
            if pbest is None or dt < pbest:
                pbest = dt
        out[f"hybridpin_probe_x{factor}"] = round(pbest, 4)
        out[f"hybridpin_probe_x{factor}_out_rows"] = float(pn)
        if progress is not None:
            progress(f"hybridpin_probe_x{factor}", pbest)
        warmed = True
        for d in (tix_idx, aix_idx, f"{stage_root}/docs_x{factor}",
                  f"{stage_root}/emb_x{factor}"):
            shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(stage_root, ignore_errors=True)
    return out


def update_scale_pin(
    spark: SparkSession,
    sf_dir: str,
    factors: tuple[int, ...] = (16, 64),
    progress=None,
) -> dict[str, float]:
    """Scale pin for the r14 in-place update composites
    (``text_index.update_text_documents`` /
    ``ann_index.update_index_vectors``): both are delta-sized BY
    CONSTRUCTION — tombstone the victims' current generation, tokenize /
    encode only the revision batch, append, one stats/state publish —
    so a FIXED 8-document (8-vector) revision must cost the same wall
    at x16 and x64 while the only alternative without the composites, a
    full index rebuild, tracks the corpus. Per factor the artifact
    records four walls: the one-time builds (= the rebuild alternative,
    corpus-tracking), the 8-id update of each index (must be FLAT), and
    the probe-after-update of each index (must stay FLAT — the update
    must not degrade the served plan; BM25PIN/IVFPIN pinned the same
    probes pre-mutation).

    Measurement follows the pin discipline: ``.repartition(32)``
    staging, the session's first lakehouse build untimed, one untimed
    update + probe warm-up at the first factor, min-of-2 on every timed
    point. Each timed update re-replaces the SAME 8 ids (identical
    delta; generations advance, dead rows accumulate delta-sized — the
    steady-state serving shape between compactions).
    """
    import shutil
    import tempfile

    from big_data_elt_pipeline_spark.operators import ann_index as AIX
    from big_data_elt_pipeline_spark.operators import text_index as TIX

    out: dict[str, float] = {}
    stage_root = tempfile.mkdtemp(prefix="update_scale_")
    build_warmed = False
    warmed = False
    for factor in factors:
        scaled_docs(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/docs_x{factor}")
        docs = spark.read.parquet(f"{stage_root}/docs_x{factor}").select(
            "doc_id", "text"
        )
        scaled_embeddings(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/emb_x{factor}")
        emb = spark.read.parquet(f"{stage_root}/emb_x{factor}")
        out[f"updatepin_x{factor}_rows"] = float(docs.count())

        tix_idx = f"{stage_root}/tix_x{factor}"
        aix_idx = f"{stage_root}/aix_x{factor}"
        if not build_warmed:
            TIX.build_text_index(docs, f"{stage_root}/tix_warm")
            shutil.rmtree(f"{stage_root}/tix_warm", ignore_errors=True)
            AIX.build_ivfpq_index(emb, f"{stage_root}/aix_warm")
            shutil.rmtree(f"{stage_root}/aix_warm", ignore_errors=True)
            build_warmed = True
        t0 = time.perf_counter()
        TIX.build_text_index(docs, tix_idx)
        out[f"updatepin_text_build_x{factor}"] = round(
            time.perf_counter() - t0, 4
        )
        t0 = time.perf_counter()
        AIX.build_ivfpq_index(emb, aix_idx)
        out[f"updatepin_ann_build_x{factor}"] = round(
            time.perf_counter() - t0, 4
        )

        # the FIXED revision batch: base-copy ids 8..16 rewritten /
        # re-embedded — constant delta while the corpus scales
        rev = docs.filter(
            (F.col("doc_id") >= 8) & (F.col("doc_id") < 16)
        ).select(
            "doc_id",
            F.concat(F.lit("revised pin edition "), F.col("text")).alias(
                "text"
            ),
        ).localCheckpoint(eager=True)
        vrev = emb.filter(
            (F.col("vec_id") >= 8) & (F.col("vec_id") < 16)
        ).select(
            "vec_id",
            F.transform(
                "embedding", lambda x: (-x).cast("float")
            ).alias("embedding"),
        ).localCheckpoint(eager=True)

        if not warmed:
            TIX.update_text_documents(rev, tix_idx)
            AIX.update_index_vectors(vrev, aix_idx)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            r = TIX.update_text_documents(rev, tix_idx)
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        out[f"updatepin_text_update_x{factor}"] = round(best, 4)
        out[f"updatepin_x{factor}_text_n_updated"] = float(r["n_updated"])
        if progress is not None:
            progress(f"updatepin_text_update_x{factor}", best)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            r = AIX.update_index_vectors(vrev, aix_idx)
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        out[f"updatepin_ann_update_x{factor}"] = round(best, 4)
        out[f"updatepin_x{factor}_ann_n_updated"] = float(r["n_updated"])
        if progress is not None:
            progress(f"updatepin_ann_update_x{factor}", best)

        # probe-after-update: the served plans over the mutated indexes
        queries = spark.createDataFrame(
            [
                ("u_join", "shuffle join broadcast table"),
                ("u_scan", "parquet scan filter pushdown"),
                ("u_window", "window partition order row"),
            ],
            "query_id string, query_text string",
        )
        vq = emb.filter(
            (F.col("vec_id") >= 8) & (F.col("vec_id") < 16)
        ).localCheckpoint(eager=True)

        def text_probe():
            return TIX.bm25_index_probe(spark, tix_idx, queries, k=10)

        def ann_probe():
            return AIX.ivfpq_probe(spark, aix_idx, vq, k=10, n_probe=4)

        if not warmed:
            text_probe().count()
            ann_probe().count()
            warmed = True
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            nr = text_probe().count()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        out[f"updatepin_text_probe_x{factor}"] = round(best, 4)
        out[f"updatepin_text_probe_x{factor}_out_rows"] = float(nr)
        if progress is not None:
            progress(f"updatepin_text_probe_x{factor}", best)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            nr = ann_probe().count()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
        out[f"updatepin_ann_probe_x{factor}"] = round(best, 4)
        out[f"updatepin_ann_probe_x{factor}_out_rows"] = float(nr)
        if progress is not None:
            progress(f"updatepin_ann_probe_x{factor}", best)

        for d in (tix_idx, aix_idx, f"{stage_root}/docs_x{factor}",
                  f"{stage_root}/emb_x{factor}"):
            shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(stage_root, ignore_errors=True)
    return out


def loader_scale_pin(
    spark: SparkSession,
    sf_dir: str,
    factors: tuple[int, ...] = (16, 64),
    progress=None,
) -> dict[str, float]:
    """Scale pin for the training-loader chain (r11 verdict #5 — the
    KNNPIN discipline applied to ``pack_sequences`` + ``epoch_shuffle``):
    both ride the 256-bucket two-level prefix sum, whose ONLY global
    window is the 256-row bucket-offset relation, so wall must track
    rows ~linearly with a FLAT global-window fan-in as the corpus grows.

    Per factor the artifact records the corpus rows, the wall for
    token-level sequence packing and for the two-epoch deterministic
    order (min-of-2 after one untimed warm-up at the first factor), the
    output rows (packing fan-out is ~n_tokens/seq_len-bounded; epoch
    order is exactly 2n), and the AUDIT: the number of distinct hash
    buckets feeding the global offset window — the fan-in of the one
    non-distributed step, which must stay <= 256 at any corpus size
    (that constant is the whole scale argument)."""
    import shutil
    import tempfile

    from big_data_elt_pipeline_spark.operators import sharding as SH

    out: dict[str, float] = {}
    stage_root = tempfile.mkdtemp(prefix="loader_scale_")
    warmed = False
    for factor in factors:
        scaled_docs(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/docs_x{factor}")
        docs = spark.read.parquet(f"{stage_root}/docs_x{factor}")
        out[f"loaderpin_x{factor}_rows"] = float(docs.count())

        # AUDIT outside the timers: fan-in of the single global window
        okey = F.md5(F.col("doc_id").cast("string"))
        nbkt = (
            docs.select(
                F.conv(F.substring(okey, 1, 2), 16, 10).cast("int").alias("b")
            )
            .agg(F.count_distinct("b"))
            .head()[0]
        )
        out[f"loaderpin_x{factor}_window_rows"] = float(nbkt)

        runs = {
            "pack": lambda: SH.pack_training_sequences(docs, seq_len=256),
            "epoch": lambda: SH.epoch_order(
                docs.select("doc_id"), 0
            ).unionByName(SH.epoch_order(docs.select("doc_id"), 1)),
        }
        for name, fn in runs.items():
            if not warmed:
                fn().count()
            best, n = None, 0
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn().count()
                dt = time.perf_counter() - t0
                if best is None or dt < best:
                    best = dt
            out[f"loaderpin_{name}_x{factor}"] = round(best, 4)
            out[f"loaderpin_{name}_x{factor}_out_rows"] = float(n)
            if progress is not None:
                progress(f"loaderpin_{name}_x{factor}", best)
        warmed = True
        shutil.rmtree(f"{stage_root}/docs_x{factor}", ignore_errors=True)
    shutil.rmtree(stage_root, ignore_errors=True)
    return out


def run_scaled(
    spark: SparkSession, sf_dir: str, factors: tuple[int, ...] = (1, 4, 16),
    single_shot: tuple[int, ...] = (),
    progress=None,
    session_factory=None,
    should_run=None,
) -> tuple[dict[str, float], SparkSession]:
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
    noise by repetition and their state burden is small). Each swapped-in
    session gets an untimed corpus-count warm-up before its timed shot
    (codegen + parquet footers off the clock — the same cold-session
    artifact the first-factor warm-up removes from the x1 column).

    OWNERSHIP: when ``session_factory`` fires, the caller's session is
    STOPPED and replaced; the active session is therefore RETURNED
    alongside the timings — callers must rebind
    (``out, spark = run_scaled(spark, ...)``), never keep using the
    session they passed in.

    ``should_run`` (factor -> bool, optional): consulted immediately
    before each factor's corpus materialization — the bench deadline
    budget's shed hook (r8 verdict #1: expensive trailing factors drop
    first when wall-clock runs short; a skipped factor simply has no
    ``scale_*_x{f}`` keys in the result)."""
    import shutil
    import tempfile

    out: dict[str, float] = {}
    stage_root = tempfile.mkdtemp(prefix="scale_corpus_")
    warmed = False
    for factor in tuple(factors) + tuple(single_shot):
        if should_run is not None and not should_run(factor):
            continue
        one_shot = factor in single_shot
        fresh_session = one_shot and session_factory is not None
        if fresh_session:
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
        # repartition(32): both scaled frames inherit 1-2 input splits
        # from the tiny base tables — a 1-2-file stage runs the timed
        # passes nearly single-core (staging itself stays untimed)
        scaled_docs(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/docs_x{factor}")
        scaled_embeddings(spark, sf_dir, factor).repartition(32).write.mode(
            "overwrite").parquet(f"{stage_root}/emb_x{factor}")
        docs = spark.read.parquet(f"{stage_root}/docs_x{factor}")
        emb = spark.read.parquet(f"{stage_root}/emb_x{factor}")
        queries = emb.filter(F.col("vec_id") < 64)  # base copy only: fixed probes
        if fresh_session:
            # untimed warm-up on the swapped-in session: without it the
            # single-shot is measured fully cold (session startup, codegen
            # compilation, parquet footers) — the exact artifact that
            # inverted the r05 x1 points
            docs.count()
            emb.count()
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
            if not warmed:
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
        warmed = True
        shutil.rmtree(f"{stage_root}/docs_x{factor}", ignore_errors=True)
        shutil.rmtree(f"{stage_root}/emb_x{factor}", ignore_errors=True)
    shutil.rmtree(stage_root, ignore_errors=True)
    return out, spark
