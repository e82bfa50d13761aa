"""Exact substring dedup (dedup.substring_dedup): the detection
guarantee — any substring of >= window_tokens tokens repeated across or
within documents is covered by a reported span — plus the stride-s
aligned-copy guarantee and the short/empty-doc guard."""

import random

import pytest

from big_data_elt_pipeline_spark.operators.dedup import substring_dedup

W = 8  # small window keeps fixtures readable; the operator is w-generic


def _spans(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = substring_dedup(df, window_tokens=kw.pop("w", W), **kw).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    return by_doc


def _covered(spans, start, end):
    return any(s <= start and end <= e for s, e in spans)


def test_detects_cross_doc_misaligned_repeat(spark):
    # 10-token phrase at offset 3 of doc 1 and offset 7 of doc 2 —
    # block_dedup's tumbling grid misses this; the slider must not
    phrase = [f"p{i}" for i in range(10)]
    d1 = [f"a{i}" for i in range(3)] + phrase + [f"b{i}" for i in range(5)]
    d2 = [f"c{i}" for i in range(7)] + phrase + [f"d{i}" for i in range(4)]
    spans = _spans(spark, [(1, " ".join(d1)), (2, " ".join(d2))])
    # doc 1 holds the first occurrence -> survivor, no span there
    assert 1 not in spans
    # doc 2's copy spans tokens [7, 17) — fully covered
    assert _covered(spans[2], 7, 17)


def test_detects_within_doc_repeat(spark):
    phrase = [f"p{i}" for i in range(W)]
    doc = phrase + [f"x{i}" for i in range(4)] + phrase
    spans = _spans(spark, [(1, " ".join(doc))])
    assert _covered(spans[1], W + 4, W + 4 + W)


def test_short_and_empty_docs_emit_nothing(spark):
    rows = [(1, ""), (2, "a b c"), (3, " ".join(f"t{i}" for i in range(W - 1)))]
    assert _spans(spark, rows) == {}


def test_unique_corpus_emits_nothing(spark):
    rows = [(i, " ".join(f"u{i}_{j}" for j in range(20))) for i in range(5)]
    assert _spans(spark, rows) == {}


def test_property_random_planted_substrings(spark):
    # the guarantee, randomized: plant a shared substring of random
    # length >= W at random offsets in otherwise-unique docs; the later
    # copy must always be covered by one reported span
    rng = random.Random(7)
    rows, expect = [], []
    for case in range(12):
        plen = rng.randint(W, W + 12)
        phrase = [f"s{case}_{i}" for i in range(plen)]
        off1, off2 = rng.randint(0, 9), rng.randint(0, 9)
        d1 = [f"x{case}_{i}" for i in range(off1)] + phrase + [
            f"y{case}_{i}" for i in range(rng.randint(0, 8))]
        d2 = [f"z{case}_{i}" for i in range(off2)] + phrase + [
            f"q{case}_{i}" for i in range(rng.randint(0, 8))]
        rows.append((2 * case, " ".join(d1)))
        rows.append((2 * case + 1, " ".join(d2)))
        expect.append((2 * case + 1, off2, off2 + plen))
    spans = _spans(spark, rows)
    for doc, start, end in expect:
        assert _covered(spans.get(doc, []), start, end), (doc, start, end)


def test_stride_aligned_guarantee(spark):
    # stride s: substrings of >= w + s - 1 tokens repeated at offsets
    # congruent mod s are still detected
    s, w = 3, 6
    plen = w + s - 1
    phrase = [f"p{i}" for i in range(plen)]
    d1 = phrase + ["t1"]
    d2 = [f"f{i}" for i in range(s)] + phrase  # offset s = aligned mod s
    spans = _spans(spark, [(1, " ".join(d1)), (2, " ".join(d2))], w=w, stride=s)
    # the aligned window inside doc 2's copy starts at some multiple of s
    # within [s, s + plen - w]; any covering span is acceptable evidence
    assert 2 in spans and any(e - st >= w for st, e in spans[2])


def test_stride_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        substring_dedup(df, stride=0)


def _incr(spark, index_rows, batch_rows, **kw):
    from big_data_elt_pipeline_spark.operators.dedup import (
        incremental_substring_dedup,
    )

    idf = spark.createDataFrame(index_rows, "doc_id long, text string")
    bdf = spark.createDataFrame(batch_rows, "doc_id long, text string")
    out = incremental_substring_dedup(
        idf, bdf, window_tokens=kw.pop("w", W), **kw
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    return by_doc


def test_incremental_batch_vs_corpus_span(spark):
    phrase = [f"p{i}" for i in range(10)]
    corpus = [(1, " ".join([f"a{i}" for i in range(4)] + phrase))]
    batch = [(100, " ".join([f"b{i}" for i in range(7)] + phrase))]
    spans = _incr(spark, corpus, batch)
    # only BATCH docs appear, and the misaligned copy is fully covered
    assert set(spans) == {100}
    assert _covered(spans[100], 7, 17)


def test_incremental_within_batch_survivor(spark):
    phrase = [f"q{i}" for i in range(W)]
    corpus = [(1, " ".join(f"c{i}" for i in range(20)))]
    batch = [(100, " ".join(phrase)), (101, " ".join(phrase))]
    spans = _incr(spark, corpus, batch)
    # first batch occurrence survives; the second is the repeat
    assert set(spans) == {101}
    assert _covered(spans[101], 0, W)


def test_incremental_unique_batch_emits_nothing(spark):
    corpus = [(1, " ".join(f"c{i}" for i in range(20)))]
    batch = [(100, " ".join(f"u{i}" for i in range(20)))]
    assert _incr(spark, corpus, batch) == {}


def test_remove_repeated_spans_cleans_text(spark):
    from big_data_elt_pipeline_spark.operators.dedup import remove_repeated_spans

    phrase = [f"p{i}" for i in range(10)]
    d1 = phrase + ["tail1"]
    d2 = [f"x{i}" for i in range(3)] + phrase + ["tail2"]   # repeat at offset 3
    d3 = phrase                                              # exact dup, fully cut
    docs = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2)), (3, " ".join(d3))],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_spans(docs, window_tokens=W).collect()}
    # doc 1 holds all the survivors — untouched
    assert out[1].removed_tokens == 0 and out[1].cleaned == " ".join(d1)
    # doc 2 loses exactly the 10-token phrase, keeps its unique tokens
    assert out[2].cleaned == "x0 x1 x2 tail2"
    assert out[2].n_tokens == 14 and out[2].kept_tokens == 4
    # doc 3 is entirely a repeated span — empty after cleaning
    assert out[3].kept_tokens == 0 and out[3].cleaned == ""


def test_incremental_span_removal_trims_overlap(spark):
    from big_data_elt_pipeline_spark.operators.dedup import (
        remove_repeated_spans_incremental,
    )

    phrase = [f"p{i}" for i in range(10)]
    corpus = [(1, " ".join([f"a{i}" for i in range(4)] + phrase))]
    batch = [
        # partially overlaps corpus text: the misaligned phrase copy must
        # be cut, the unique prefix kept
        (100, " ".join([f"b{i}" for i in range(7)] + phrase)),
        # unique batch doc: untouched
        (101, " ".join(f"u{i}" for i in range(20))),
        # exact dup of an earlier-batch doc: fully cut
        (102, " ".join(f"u{i}" for i in range(20))),
    ]
    idf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_repeated_spans_incremental(
            idf, bdf, window_tokens=W
        ).collect()
    }
    # one row per BATCH doc only; the corpus is never rewritten
    assert set(out) == {100, 101, 102}
    assert out[100].cleaned == " ".join(f"b{i}" for i in range(7))
    assert out[100].n_tokens == 17 and out[100].removed_tokens == 10
    assert out[101].removed_tokens == 0
    assert out[101].cleaned == " ".join(f"u{i}" for i in range(20))
    assert out[102].kept_tokens == 0 and out[102].cleaned == ""
