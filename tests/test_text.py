"""Text-pipeline operator invariants the oracle can't express directly."""

from tests.conftest import SF_SMOKE


def test_doc_packing_respects_capacity(spark):
    """Packing invariant: no bin exceeds the token capacity, except a bin
    holding a single clamped oversized document; bins are dense per shard
    (0..max with no gaps) and every doc is assigned exactly once."""
    from big_data_elt_pipeline_spark.plans import queries as Q
    from big_data_elt_pipeline_spark.plans.text_queries import _PACK_CAPACITY

    out = Q.spark_queries()["doc_packing"](spark, SF_SMOKE).toPandas()
    assert out.doc_id.is_unique
    clamped = out.assign(t=out.n_tokens.clip(upper=_PACK_CAPACITY))
    per_bin = clamped.groupby(["shard", "bin_in_shard"]).agg(
        tokens=("t", "sum"), docs=("doc_id", "count")
    )
    over = per_bin[per_bin.tokens > _PACK_CAPACITY]
    # a bin can only exceed capacity via the final doc that tipped it over
    # (first-fit semantics); it can never exceed 2x
    assert (over.tokens <= 2 * _PACK_CAPACITY).all()
    for shard, grp in clamped.groupby("shard"):
        bins = sorted(grp.bin_in_shard.unique())
        assert bins == list(range(len(bins)))  # dense, zero-based


def test_incremental_exact_dedup_decisions(spark):
    """Crafted index+batch covering every decision: an exact corpus dup
    maps to the CORPUS canonical (not its own id), a within-batch dup maps
    to the batch's first id, whitespace/case variants collapse to one
    fingerprint, and survivors ('new') carry a NULL dup_of. Appending the
    survivors keeps the index invariant (unique fingerprints, min id)."""
    from big_data_elt_pipeline_spark.operators.dedup import incremental_exact_dedup

    index_docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"), (7, "alpha beta gamma")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "  Alpha   BETA gamma "),  # corpus dup via normalization
            (11, "zeta eta"),               # new
            (12, "zeta eta"),               # dup of 11 within the batch
            (13, "theta iota"),             # new
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_exact_dedup(index_docs, batch).collect()}
    assert (out[10].status, out[10].dup_of) == ("dup_of_corpus", 1)  # min corpus id wins
    assert (out[11].status, out[11].dup_of) == ("new", None)
    assert (out[12].status, out[12].dup_of) == ("dup_in_batch", 11)
    assert (out[13].status, out[13].dup_of) == ("new", None)
    # fold survivors into the index: fingerprints stay unique
    from pyspark.sql import functions as F

    survivors = batch.join(
        incremental_exact_dedup(index_docs, batch).filter("status = 'new'").select("doc_id"),
        "doc_id",
    )
    new_index = index_docs.unionByName(survivors)
    from big_data_elt_pipeline_spark.functions.text import fingerprint

    fps = new_index.select(fingerprint(F.col("text")).alias("fp"))
    assert fps.count() - fps.distinct().count() == 1  # only the pre-existing 1/7 dup


def test_incremental_minhash_best_match_and_tiebreak(spark):
    """The per-ingest near-dup decision picks the BEST corpus match (max
    exact Jaccard), and equal scores break to the smallest index id —
    deterministic assignment either way. Novel docs come back 'new'."""
    from big_data_elt_pipeline_spark.operators.dedup import incremental_minhash_dedup

    index = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e g"), (9, "z1 z2 z3 z4 z5 z6")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, "a b c d e"),   # exact dup of 1 (J=1.0) and partial of 2
         (101, "q r s t u")],  # novel
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in incremental_minhash_dedup(index, batch).collect()}
    assert got[100].status == "near_dup_of_corpus"
    assert got[100].dup_of == 1 and got[100].jaccard == 1.0
    assert got[101].status == "new" and got[101].dup_of is None

    # best-match: "a b c d" scores J=2/3 against index 1 but only J=1/2
    # against index 2 — the higher exact Jaccard must win the assignment
    # (equal-score ties break to min index id via the same window order,
    # which the differential oracle pins structurally)
    probe = spark.createDataFrame([(200, "a b c d")], "doc_id long, text string")
    r = {x.doc_id: x for x in incremental_minhash_dedup(index, probe).collect()}[200]
    assert r.status == "near_dup_of_corpus" and r.dup_of == 1
    assert abs(r.jaccard - 2.0 / 3.0) < 1e-12


def test_winnow_guarantee_and_identity(spark):
    """The winnowing guarantee: two docs sharing a token run of length
    >= k + w - 1 (= 6 here) MUST share at least one selected fingerprint;
    identical docs must score exactly 1.0; token-disjoint docs never pair."""
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_neardup,
    )

    shared = "m1 m2 m3 m4 m5 m6"  # k + w - 1 tokens
    docs = spark.createDataFrame(
        [
            (1, f"p1 p2 p3 {shared} p4 p5 p6 p7"),
            (2, f"q1 q2 {shared} q3 q4 q5 q6 q7 q8"),
            (3, "r1 r2 r3 r4 r5 r6 r7 r8"),
            (4, f"p1 p2 p3 {shared} p4 p5 p6 p7"),  # identical to 1
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs)
    shared_fps = (
        fp.filter(F.col("doc_id").isin(1, 2))
        .groupBy("fhash").agg(F.countDistinct("doc_id").alias("n"))
        .filter(F.col("n") == 2).count()
    )
    assert shared_fps >= 1  # the substring guarantee

    pairs = {(r.id1, r.id2): r for r in winnow_neardup(docs, threshold=0.0).collect()}
    assert pairs[(1, 4)].score == 1.0  # identical docs: full overlap
    assert not any(3 in p for p in pairs)  # disjoint doc never pairs
