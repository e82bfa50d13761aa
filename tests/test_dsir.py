"""DSIR importance weights (sampling.dsir_weights): a target-like doc must
outscore an off-target doc, feature counts must equal bigram counts, and
the weights must match an independent pure-Python recomputation."""

import hashlib
import math
import re

import pytest

from big_data_elt_pipeline_spark.operators.sampling import DSIR_BUCKETS, dsir_weights

EN = [
    "the cat is on the mat and the dog is here",
    "a tale of the sea and of the wind is told",
    "the ship is in the harbor and the tide is low",
]
XX = [
    "zork blem quux fizzle wump grok snarf blip",
    "vex jib quop marl dreb knish plonk trelm",
]


def _rows():
    docs = [(i, t) for i, t in enumerate(EN + XX)]
    return docs, [(i, t) for i, t in enumerate(EN)]  # target = the EN slice


def _bigrams(text):
    tok = re.split(r"\s+", text.lower().strip())
    if len(tok) < 2:
        return [" ".join(tok)]
    return [" ".join(tok[i:i + 2]) for i in range(len(tok) - 1)]


def _bucket(sh):
    return int(hashlib.md5(sh.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS


def _expected_weights(docs, target):
    raw = [(i, _bucket(s)) for i, t in docs for s in _bigrams(t)]
    tgt = [(i, _bucket(s)) for i, t in target for s in _bigrams(t)]
    cnt_r, cnt_t = {}, {}
    for _, b in raw:
        cnt_r[b] = cnt_r.get(b, 0) + 1
    for _, b in tgt:
        cnt_t[b] = cnt_t.get(b, 0) + 1
    tot_r, tot_t = len(raw), len(tgt)
    lam = {
        b: round(math.log(
            (cnt_t.get(b, 0) + 1) * (tot_r + DSIR_BUCKETS)
            / ((cnt_r[b] + 1) * (tot_t + DSIR_BUCKETS))), 6)
        for b in cnt_r
    }
    out = {}
    for i, b in raw:
        out[i] = out.get(i, 0.0) + lam[b]
    return out


def test_dsir_weights_match_reference_recompute(spark):
    docs, target = _rows()
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {r.doc_id: r for r in dsir_weights(sdf, tdf).collect()}
    expected = _expected_weights(docs, target)
    assert set(got) == set(expected)
    for i, t in docs:
        assert got[i].n_feats == len(_bigrams(t))
        # Python libm vs JVM ln may differ in the last ulp pre-round;
        # post-quantization sums agree to well under 1e-5
        assert got[i].weight == pytest.approx(expected[i], abs=1e-5)


def test_dsir_target_docs_outscore_off_target(spark):
    docs, target = _rows()
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    w = {r.doc_id: r.weight for r in dsir_weights(sdf, tdf).collect()}
    en_ids = range(len(EN))
    xx_ids = range(len(EN), len(EN) + len(XX))
    assert min(w[i] for i in en_ids) > max(w[i] for i in xx_ids)
    assert all(w[i] > 0 for i in en_ids) and all(w[i] < 0 for i in xx_ids)


def test_dsir_select_subset_rank_and_determinism(spark):
    from big_data_elt_pipeline_spark.operators.sampling import dsir_select

    docs, target = _rows()
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    sel = dsir_select(sdf, tdf, k=3).collect()
    # selected docs are a subset of the corpus, ranked 1..k with weights
    # descending under the total (weight DESC, doc_id) order
    assert [r.rank for r in sorted(sel, key=lambda r: r.rank)] == [1, 2, 3]
    assert {r.doc_id for r in sel} <= {i for i, _ in docs}
    ordered = sorted(sel, key=lambda r: r.rank)
    assert all(
        (a.weight, -a.doc_id) >= (b.weight, -b.doc_id)
        for a, b in zip(ordered, ordered[1:])
    )
    # the EN (target-like) docs outrank the off-target ones
    assert {r.doc_id for r in sel} == set(range(len(EN)))
    # deterministic under any input partitioning
    again = dsir_select(sdf.repartition(7), tdf.repartition(3), k=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, sel))
