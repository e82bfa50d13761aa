"""BM25 ranked retrieval (operators/retrieval.py): ranking semantics on a
hand-checkable corpus, the quantized-decimal determinism contract, and
tie-break stability under repartitioning."""

import pytest
from pyspark.sql import functions as F

from big_data_elt_pipeline_spark.operators.retrieval import bm25_topk, tokenize


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark shuffle join spark join"),       # heavy on both terms
        (2, "spark filter scan"),                    # one query term
        (3, "join join join join join join"),        # tf saturation case
        (4, "window partition order"),               # no overlap with q1
        (5, "the quick brown fox"),                  # no overlap at all
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q(spark, qid, text):
    return spark.createDataFrame([(qid, text)], "query_id string, query_text string")


def test_tokenize_splits_on_non_letters(spark):
    df = spark.createDataFrame([(1, "Hello, World! 42 foo_bar")], "id long, t string")
    terms = [r.term for r in tokenize(df, "id", "t").collect()]
    assert terms == ["hello", "world", "foo", "bar"]


def test_bm25_ranks_overlap_above_partial(spark, corpus):
    out = bm25_topk(corpus, _q(spark, "q", "spark join"), k=5).collect()
    ids = [r.doc_id for r in out]
    # docs with no query term never appear
    assert 4 not in ids and 5 not in ids
    # doc 1 matches both terms; docs 2 and 3 match one each -> doc 1 first
    assert ids[0] == 1
    assert [r.rank for r in out] == list(range(1, len(out) + 1))


def test_bm25_tf_saturation(spark, corpus):
    """k1 bounds the tf factor: six repeats of 'join' must not outrank a
    doc matching BOTH query terms (BM25's core advantage over raw tf)."""
    out = {r.doc_id: r.score for r in bm25_topk(corpus, _q(spark, "q", "spark join"), k=5).collect()}
    assert out[1] > out[3]


def test_bm25_partitioning_invariant(spark, corpus):
    """The decimal-quantized sum is associative, so scores are bit-equal
    under any input partitioning — the determinism contract."""
    q = _q(spark, "q", "spark join scan")
    a = bm25_topk(corpus.coalesce(1), q, k=5).collect()
    b = bm25_topk(corpus.repartition(7, "doc_id"), q, k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_repeated_query_terms_count_once(spark, corpus):
    a = bm25_topk(corpus, _q(spark, "q", "join"), k=5).collect()
    b = bm25_topk(corpus, _q(spark, "q", "join join join"), k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
