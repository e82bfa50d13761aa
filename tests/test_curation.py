"""Unit tests for the governance operators (PII scrub, repetition signals,
contamination, deterministic sampling) on crafted rows — semantics the
clean synthetic corpus can't exercise. Oracle parity for the registered
queries is covered by tests/test_oracle_parity.py's full-registry sweep.
"""

from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.functions import text as TX
from big_data_elt_pipeline_spark.operators import privacy as PII
from big_data_elt_pipeline_spark.operators import sampling as SMP


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df


def test_redact_all_three_categories(spark):
    raw = "mail a.b+c@sub.example.org or +33-555-123 from 192.168.0.1 ok"
    row = _one(spark, raw).select(
        PII.redact(F.col("text")).alias("red"),
        *[c.alias(k) for k, c in PII.pii_counts(F.col("text")).items()],
    ).first()
    assert row.red == "mail <EMAIL> or <PHONE> from <IP> ok"
    assert (row.email, row.phone, row.ip) == (1, 1, 1)


def test_redact_email_before_ip_no_half_eaten_hosts(spark):
    # the host part of an email must be consumed by the EMAIL rule, never
    # partially matched by the IP rule (rule order contract)
    raw = "x user@10.0.0.1.net y"
    red = _one(spark, raw).select(PII.redact(F.col("text")).alias("r")).first().r
    assert red == "x <EMAIL> y"


def test_clean_text_untouched(spark):
    raw = "no pii here just words and numbers 1234"
    row = _one(spark, raw).select(
        PII.redact(F.col("text")).alias("red"),
        *[c.alias(k) for k, c in PII.pii_counts(F.col("text")).items()],
    ).first()
    assert row.red == raw and row.email == row.phone == row.ip == 0


def test_repetition_ratios_on_crafted_docs(spark):
    df = spark.createDataFrame(
        [("a a a a",), ("a b c d",), ("a b a b a b",)], "text string"
    )
    out = df.select(
        TX.top_token_ratio(F.col("text")).alias("top"),
        TX.dup_ngram_ratio(F.col("text"), 2).alias("dup2"),
    ).collect()
    # all-same doc: top ratio 1.0, bigrams all identical -> dup 2/3
    assert out[0].top == 1.0 and abs(out[0].dup2 - 2 / 3) < 1e-12
    # all-distinct doc: top 1/4, no duplicate bigrams
    assert out[1].top == 0.25 and out[1].dup2 == 0.0
    # alternating doc: 'a' is 3 of 6, bigrams {ab,ba} from 5 -> dup 3/5
    assert out[2].top == 0.5 and abs(out[2].dup2 - 3 / 5) < 1e-12


def test_sample_flag_deterministic_and_append_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    kept = (
        df.select("doc_id")
        .filter(SMP.sample_flag(F.col("doc_id"), F.lit(0.5)))
        .toPandas()["doc_id"]
    )
    # re-running yields the identical survivor set (no rand() anywhere)
    kept2 = (
        df.filter(SMP.sample_flag(F.col("doc_id"), F.lit(0.5)))
        .toPandas()["doc_id"]
    )
    assert list(kept) == list(kept2)
    # append-stability: sampling a prefix corpus is a subset relation
    prefix = (
        df.filter(F.col("doc_id") < 1000)
        .filter(SMP.sample_flag(F.col("doc_id"), F.lit(0.5)))
        .toPandas()["doc_id"]
    )
    assert set(prefix) == {k for k in kept if k < 1000}
    # the multiplicative hash is uniform-ish: 50% +/- 5pp on 2000 ids
    assert 0.45 < len(kept) / 2000 < 0.55


def test_stratified_sample_unknown_stratum_gets_default_rate(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "xx") for i in range(200)],
        "doc_id long, lang string",
    )
    out = {r.stratum: r for r in SMP.stratified_sample(df, {"en": 1.0}).collect()}
    assert out["en"].n_sampled == out["en"].n_docs == 100
    assert out["en"].weight == 1.0
    # 'xx' is not in the rate map -> default_rate 0: kept in the audit
    # output but nothing sampled, weight 0 (excluded from the mixture)
    assert out["xx"].target_rate == 0.0
    assert out["xx"].n_sampled == 0 and out["xx"].weight == 0.0


def test_benchmark_overlap_flags_planted_copy_only(spark):
    mk = "w%d"
    long_a = " ".join(mk % i for i in range(20))          # bench doc
    copy_a = " ".join(mk % i for i in range(1, 20))       # first token dropped
    other = " ".join(mk % (100 + i) for i in range(20))   # disjoint vocab
    bench = spark.createDataFrame([(1, long_a)], "doc_id long, text string")
    train = spark.createDataFrame(
        [(10, copy_a), (11, other)], "doc_id long, text string"
    )
    out = SMP.benchmark_overlap(train, bench, n=5, min_shared=3).collect()
    assert len(out) == 1
    assert (out[0].train_id, out[0].bench_id) == (10, 1)
    # dropped first token removes exactly one 5-gram: 16 -> 15 shared
    assert out[0].n_shared == 15


def test_doc_chunking_boundary_rules(spark):
    # plans.queries is the canonical import entry (tail-imports the plan
    # modules in order); importing a plan submodule first would hit the
    # registry while it's half-built
    import big_data_elt_pipeline_spark.plans.queries  # noqa: F401
    from big_data_elt_pipeline_spark.plans.curation_queries import (
        _CHUNK_S,
        _CHUNK_W,
        q_doc_chunking,
    )
    import big_data_elt_pipeline_spark.sources.tpch as tpch

    # craft docs around the boundary: exactly W, W+1, W+S, and tiny
    lens = {1: _CHUNK_W, 2: _CHUNK_W + 1, 3: _CHUNK_W + _CHUNK_S, 4: 5}
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(n))) for i, n in lens.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import big_data_elt_pipeline_spark.plans.curation_queries as CQ

    orig = tpch.read_table
    orig_cq = CQ.read_table
    try:
        tpch.read_table = lambda s, d, t: df  # noqa: ARG005
        CQ.read_table = lambda s, d, t: df  # noqa: ARG005
        rows_out = q_doc_chunking(spark, "unused").collect()
    finally:
        # both restores in finally: a throw mid-collect must not leak the
        # 4-row fake into every later test in the session
        tpch.read_table = orig
        CQ.read_table = orig_cq
    by_doc = {}
    for r in rows_out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # exactly-W doc: one chunk covering all tokens
    assert [(c.start_tok, c.n_chunk_tokens) for c in by_doc[1]] == [(0, _CHUNK_W)]
    # W+1 doc: second chunk starts at n-W (full window), not at stride
    assert [(c.start_tok, c.n_chunk_tokens) for c in sorted(by_doc[2], key=lambda c: c.chunk_id)] == [
        (0, _CHUNK_W), (1, _CHUNK_W)
    ]
    # W+S doc: stride-aligned second chunk, full window, no third chunk
    assert [(c.start_tok, c.n_chunk_tokens) for c in sorted(by_doc[3], key=lambda c: c.chunk_id)] == [
        (0, _CHUNK_W), (_CHUNK_S, _CHUNK_W)
    ]
    # tiny doc: one partial chunk
    assert [(c.start_tok, c.n_chunk_tokens) for c in by_doc[4]] == [(0, 5)]


def test_benchmark_overlap_broadcasts_bench_side(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[F.concat(F.lit("t"), ((F.col("id") + i) % 40).cast("string")) for i in range(12)]).alias("text"),
    )
    plan = SMP.benchmark_overlap(docs, docs.limit(5))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
