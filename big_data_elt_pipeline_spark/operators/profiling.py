"""Table profiling: per-column statistics in ONE pass.

A training-data pipeline's first question about any 100 TB table is
"what's in it" — null rates, cardinalities, ranges. The naive form runs
one job per column; this builds a single wide aggregate (every stat for
every column in one scan, all map-side combinable) and unpivots the
scalar row into a (column, stat, value) long table driver-side — no
second job, no per-column scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.ShortType)


def profile_table(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """One-pass profile → rows of (column, dtype, n_nulls, n_distinct,
    min_value, max_value) with min/max stringified for heterogeneity.

    ``approx_distinct`` switches exact countDistinct (one expand per
    column) to HLL sketches — the 100 TB default; exact is the oracle-able
    test path.
    """
    spark = df.sparkSession
    n_distinct = F.approx_count_distinct if approx_distinct else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__total")]
    profiled = [f for f in df.schema.fields if not isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
    for f in profiled:
        c = F.col(f.name)
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"{f.name}__nulls"),
            n_distinct(c).alias(f"{f.name}__distinct"),
            F.min(c).cast("string").alias(f"{f.name}__min"),
            F.max(c).cast("string").alias(f"{f.name}__max"),
        ]
    row = df.agg(*aggs).first().asDict()
    out = [
        (
            f.name,
            f.dataType.simpleString(),
            int(row["__total"]),
            int(row[f"{f.name}__nulls"]),
            int(row[f"{f.name}__distinct"]),
            row[f"{f.name}__min"],
            row[f"{f.name}__max"],
        )
        for f in profiled
    ]
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "n_distinct long, min_value string, max_value string",
    )


def embedding_audit(
    emb: DataFrame,
    dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """(metric, value) rows: the hygiene audit a vector table needs before
    any similarity/clustering pass trusts it — NULL vectors, wrong
    dimensionality, non-finite components, exact-zero vectors (cosine is
    undefined on them; every ANN operator here precomputes norms), plus
    the norm distribution at p01/p50/p99. One corpus scan for the counts
    + one bounded histogram pass for the percentiles.

    Determinism: norms are exact-decimal sums of 12-dp-snapped squares
    under the IEEE-correctly-rounded sqrt (the covariance discipline),
    then quantized to 6 dp so the percentile histogram's state is bounded
    by the value domain, not the corpus (``quantized_percentiles``)."""
    from big_data_elt_pipeline_spark.operators.quality import (
        quantized_percentiles,
    )

    v = F.col(vec_col)
    # a NULL COMPONENT is flagged explicitly: without the isNull() arm,
    # Spark's `exists` returns NULL for such a vector (neither counted as
    # n_nonfinite nor kept by the norm filter) while DuckDB's list_filter
    # treats the NULL predicate as no-match and sums past the hole — the
    # one input the two engines would otherwise disagree on. Flagging it
    # as non-finite counts it once and keeps it out of the norms in BOTH
    # engines (the oracle mirrors the same predicate).
    nonfinite = F.exists(
        v,
        lambda x: x.isNull()
        | F.isnan(x.cast("double"))
        | (F.abs(x.cast("double")) > F.lit(1e308)),
    )
    zero = F.forall(v, lambda x: x.cast("double") == F.lit(0.0))
    flags = emb.select(
        F.when(v.isNull(), 1).otherwise(0).alias("is_null"),
        F.when(v.isNotNull() & (F.size(v) != F.lit(dim)), 1)
        .otherwise(0)
        .alias("wrong_dim"),
        F.when(v.isNotNull() & nonfinite, 1).otherwise(0).alias("bad_val"),
        F.when(v.isNotNull() & ~nonfinite & zero, 1).otherwise(0).alias("zero"),
    )
    counts = flags.agg(
        F.count(F.lit(1)).cast("double").alias("n_vectors"),
        F.sum("is_null").cast("double").alias("n_null"),
        F.sum("wrong_dim").cast("double").alias("n_wrong_dim"),
        F.sum("bad_val").cast("double").alias("n_nonfinite"),
        F.sum("zero").cast("double").alias("n_zero"),
    )
    long_counts = counts.selectExpr(
        "stack(5, 'n_vectors', n_vectors, 'n_null', n_null, "
        "'n_wrong_dim', n_wrong_dim, 'n_nonfinite', n_nonfinite, "
        "'n_zero', n_zero) AS (metric, value)"
    )
    sq = F.aggregate(
        F.zip_with(v, v, lambda a, b: F.round(
            a.cast("double") * b.cast("double"), 12).cast("decimal(38,12)")),
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, p: (acc + p).cast("decimal(38,12)"),
    )
    # non-finite vectors are excluded from the norm histogram (their norm
    # is undefined — NaN squares become NULL decimals mid-sum); they are
    # already counted under n_nonfinite. Wrong-dim vectors keep their
    # (well-defined) norm: the audit reports what is there.
    norms = emb.filter(v.isNotNull() & ~nonfinite).select(
        F.round(F.sqrt(sq.cast("double")), 6).alias("norm")
    )
    pct = quantized_percentiles(norms, "norm", [0.01, 0.5, 0.99]).select(
        F.concat(F.lit("norm_p"), F.lpad((F.col("p") * 100).cast("int"), 2, "0")
                 ).alias("metric"),
        F.col("value"),
    )
    return long_counts.unionByName(pct)


def token_fertility_by_lang(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(lang, n_docs, ws_tokens, bpe_tokens, n_chars, fertility,
    chars_per_token): tokenizer-efficiency audit per detected language —
    the standard multilingual-tokenizer health check (fertility =
    subword tokens per whitespace word; a language whose fertility blows
    up is being shredded by the vocabulary and will eat a multiple of
    its fair token budget at training time).

    Exactness: all sums are exact bigints; the two ratios are single
    correctly-rounded divisions of exact integers. Scale: map-only
    feature extraction (lang_id + two regex counts inside the row) into
    one language-domain-bounded aggregation — the doc_stats shape."""
    from big_data_elt_pipeline_spark.functions.text import (
        bpe_token_count,
        lang_id,
        token_count,
    )

    t = F.col(text_col)
    per_doc = docs.select(
        lang_id(t).alias("lang"),
        token_count(t).alias("ws"),
        bpe_token_count(t).alias("bpe"),
        F.length(t).cast("long").alias("chars"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("bpe").cast("long").alias("bpe_tokens"),
            F.sum("chars").cast("long").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            "n_chars",
            F.try_divide(
                F.col("bpe_tokens").cast("double"), F.col("ws_tokens").cast("double")
            ).alias("fertility"),
            F.try_divide(
                F.col("n_chars").cast("double"), F.col("bpe_tokens").cast("double")
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


def vocab_coverage(
    docs: DataFrame,
    ks: tuple[int, ...] = (10, 100, 1000),
    text_col: str = "text",
) -> DataFrame:
    """(top_k, n_words, covered_tokens, total_tokens, share): what share
    of all token OCCURRENCES the top-k most frequent words cover — the
    Zipf-curve summary that sizes vocabulary budgets and flags
    boilerplate-dominated corpora (a share(100) near 1.0 means the corpus
    is template noise).

    Scale shape: the wordcount is the canonical partial-agg groupBy; the
    top-max(ks) cut is ``orderBy(freq desc, word asc).limit(...)`` —
    Spark's TakeOrderedAndProject, a DISTRIBUTED top-k that never sorts
    the vocabulary globally (the naive rank-over-global-window form
    single-partitions a billion-word vocabulary). Only the max(ks)-row
    result takes a window; totals ride a broadcast row. Determinism: the
    (freq desc, word asc) total order makes every prefix exact."""
    from big_data_elt_pipeline_spark.functions.text import tokens

    kmax = max(ks)
    words = docs.select(
        F.explode(tokens(F.col(text_col))).alias("word")
    ).filter(F.col("word") != "")
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    total = F.broadcast(
        wc.agg(
            F.sum("freq").cast("long").alias("total_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
        )
    )
    top = wc.orderBy(F.desc("freq"), F.asc("word")).limit(kmax)
    w = (
        Window.orderBy(F.desc("freq"), F.asc("word"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = top.select(
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("word"))).alias("r"),
        F.sum("freq").over(w).cast("long").alias("cum"),
    )
    kdim = F.explode(F.array(*[F.lit(k) for k in ks])).alias("top_k")
    return (
        ranked.select(kdim, "r", "cum")
        .filter(F.col("r") <= F.col("top_k"))
        .groupBy("top_k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.max("cum").alias("covered_tokens"),
        )
        .crossJoin(total)
        .select(
            F.col("top_k").cast("long").alias("top_k"),
            "n_words",
            "covered_tokens",
            "total_tokens",
            (
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("share"),
        )
        .orderBy("top_k")
    )


# ln(2) as a shared literal: log2(x) = ln(x) / ln(2) with the snapped-ln
# idiom (BM25/LM discipline) keeps entropy cross-engine exact — both
# engines receive this identical constant rather than computing their own.
LN2 = 0.6931471805599453


def source_mixture(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(source, n_docs, doc_share, ws_tokens, token_share, entropy_bits):
    the mixture-design diversity audit — per-source corpus shares plus the
    Shannon entropy (bits) of the document distribution over sources, the
    number every data-mixing recipe (UniMax / temperature reweighting)
    starts from. entropy_bits repeats on every row (a corpus-level scalar
    carried alongside the per-source breakdown, value-hashable as one
    relation).

    Exactness: shares are single divisions of exact bigints; the entropy
    terms are ``round(ln(share), 6)`` on the SOURCE-BOUNDED table (the
    BM25 snapped-transcendental idiom), multiplied and re-snapped to 12
    dp, summed as DECIMAL, divided by the shared LN2 literal — both
    engines compute byte-identical bits. Scale: one partial-agg groupBy
    over the source domain; everything after is source-bounded."""
    per = docs.groupBy(F.col(group_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).cast("long"))
        .cast("long")
        .alias("ws_tokens"),
        # the source-bounded relation is instantiated in four plan
        # branches (totals, shares, entropy, output); the lazy checkpoint
        # makes the corpus scan happen once (the lm_scores discipline)
    ).localCheckpoint(eager=False)
    tot = F.broadcast(
        per.agg(
            F.sum("n_docs").cast("long").alias("t_docs"),
            F.sum("ws_tokens").cast("long").alias("t_tokens"),
        )
    )
    shared = per.crossJoin(tot).select(
        "source",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("t_docs").cast("double")).alias("doc_share"),
        "ws_tokens",
        (F.col("ws_tokens").cast("double") / F.col("t_tokens").cast("double")).alias("token_share"),
    )
    ent = F.broadcast(
        shared.select(
            F.round(
                F.col("doc_share") * F.round(F.log(F.col("doc_share")), 6), 12
            )
            .cast("decimal(25,12)")
            .alias("term")
        )
        .agg((-F.sum("term").cast("double") / F.lit(LN2)).alias("entropy_bits"))
    )
    return shared.crossJoin(ent).orderBy("source")


def vocab_drift(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """ONE summary row — (n_words_a, n_words_b, shared_words,
    vocab_jaccard, l1_distance): distribution shift between the two
    deterministic corpus halves (doc_id parity, the train/val split
    audit). l1_distance = sum |p_a(w) - p_b(w)| over the union vocabulary
    (0 = identical distributions, 2 = disjoint) — the standard drift gate
    before trusting a held-out split.

    Exactness: per-word shares are exact-bigint divisions; each |diff| is
    12-dp-snapped into a DECIMAL sum (associative); vocabulary Jaccard is
    pure integer arithmetic. Scale: two wordcount partial aggregations +
    one full-outer join keyed on word — vocabulary-sized, the wordcount
    shape."""
    words = docs.select(
        (F.col(id_col) % 2 == 0).alias("a"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    wc = words.groupBy("a", "word").agg(F.count(F.lit(1)).alias("cnt"))
    side_tot = wc.groupBy("a").agg(F.sum("cnt").alias("tot"))
    wa = (
        wc.filter("a").join(side_tot.filter("a"), "a")
        .select("word", (F.col("cnt").cast("double") / F.col("tot").cast("double")).alias("pa"))
    )
    wb = (
        wc.filter(~F.col("a")).join(side_tot.filter(~F.col("a")), "a")
        .select("word", (F.col("cnt").cast("double") / F.col("tot").cast("double")).alias("pb"))
    )
    joined = wa.join(wb, "word", "full_outer").select(
        F.col("pa").isNotNull().alias("in_a"),
        F.col("pb").isNotNull().alias("in_b"),
        F.round(
            F.abs(F.coalesce("pa", F.lit(0.0)) - F.coalesce("pb", F.lit(0.0))), 12
        ).cast("decimal(25,12)").alias("d"),
    )
    return joined.agg(
        F.sum(F.col("in_a").cast("long")).cast("long").alias("n_words_a"),
        F.sum(F.col("in_b").cast("long")).cast("long").alias("n_words_b"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).cast("long").alias("shared_words"),
        (
            F.sum((F.col("in_a") & F.col("in_b")).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("vocab_jaccard"),
        F.sum("d").cast("double").alias("l1_distance"),
    )
