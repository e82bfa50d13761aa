"""Property-based differential tests for the round-11 operators: random
inputs replayed against exact pure-Python references (the hypothesis
discipline of test_serving_api, applied to MMR / survivors / entropy).

Determinism notes baked into the strategies:
- MMR vectors are small INTEGERS: integer dot products are exact in
  doubles, IEEE sqrt/division/multiplication are correctly rounded, so
  the Python reference reproduces Spark's cosines BIT-exactly and the
  greedy argmax (ties to lowest id) must match id-for-id.
- entropy compares with a 1e-6-scale tolerance: the 6-dp quantization is
  engine-stable, but Python's math.log2 and the JVM's may differ in the
  last ulp, which the decimal snap absorbs except exactly ON a rounding
  boundary (never hit by random strings; tolerance documents it).
"""

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE

_PROP = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _int_vec(dim=4):
    return st.lists(
        st.integers(min_value=-3, max_value=3), min_size=dim, max_size=dim
    ).filter(lambda v: any(x != 0 for x in v))


@given(
    vecs=st.lists(_int_vec(), min_size=6, max_size=12),
    qidx=st.integers(min_value=0, max_value=5),
)
@_PROP
def test_mmr_matches_exact_python_greedy(spark, vecs, qidx):
    from big_data_elt_pipeline_spark.operators import similarity as S

    n = len(vecs)
    k, n_cand, lam = 3, 8, 0.7
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = df.filter(df.vec_id == qidx)

    def cos(a, b):
        # exact integer dot, correctly-rounded sqrt/mul/div — bit-equal
        # to the engine's in-order fold on integer-valued doubles
        d = float(sum(x * y for x, y in zip(a, b)))
        na = math.sqrt(float(sum(x * x for x in a)))
        nb = math.sqrt(float(sum(x * x for x in b)))
        return d / (na * nb)

    rel = sorted(
        ((cos(vecs[qidx], v), -i) for i, v in enumerate(vecs) if i != qidx),
        key=lambda t: (t[0], t[1]),
        reverse=True,
    )
    cand = [-negi for _, negi in rel[:n_cand]]
    relmap = {(-negi): c for c, negi in rel[:n_cand]}

    om = round(1.0 - lam, 10)
    sel = [max(cand, key=lambda i: (relmap[i], -i))]
    while len(sel) < min(k, len(cand)):
        rest = [i for i in cand if i not in sel]
        best = max(
            rest,
            key=lambda i: (
                lam * relmap[i]
                - om * max(cos(vecs[i], vecs[s]) for s in sel),
                -i,
            ),
        )
        sel.append(best)

    out = sorted(
        S.mmr_rerank(df, q, k=k, n_cand=n_cand, lam=lam).collect(),
        key=lambda r: r["mmr_rank"],
    )
    assert [r["vec_id"] for r in out] == sel


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=20,
    )
)
@_PROP
def test_quality_survivors_matches_union_find(spark, pairs):
    from pyspark.sql import functions as F

    from big_data_elt_pipeline_spark.functions.text import quality_score
    from big_data_elt_pipeline_spark.operators import dedup as DD

    ids = sorted({i for p in pairs for i in p})
    # distinct token counts -> distinct quality scores, id-keyed
    docs = spark.createDataFrame(
        [(i, " ".join(["the dog ran"] * (1 + (i * 7) % 5))) for i in ids],
        "doc_id int, text string",
    )
    pdf = spark.createDataFrame(
        [(a, b) for a, b in pairs], "id1 int, id2 int"
    )
    out = {r["cluster_id"]: r for r in DD.quality_survivors(docs, pdf).collect()}

    # python union-find
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for i in ids:
        comps.setdefault(find(i), []).append(i)

    quality = {
        r["doc_id"]: r["quality"]
        for r in docs.select(
            "doc_id", quality_score(F.col("text")).alias("quality")
        ).collect()
    }
    assert set(out) == {min(m) for m in comps.values()}
    for root, members in comps.items():
        cid = min(members)
        want = max(members, key=lambda i: (quality[i], -i))
        row = out[cid]
        assert row["survivor_id"] == want
        assert row["cluster_size"] == len(members)
        assert bool(row["differs_from_min_id"]) == (want != cid)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Lu", "Nd", "Zs", "Po")
            ),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@_PROP
def test_char_entropy_matches_python(spark, texts):
    from big_data_elt_pipeline_spark.operators.quality import char_entropy

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert set(out) == set(range(len(texts)))
    for i, t in enumerate(texts):
        counts = Counter(t)
        n = len(t)
        want = sum(
            round(-((c / n) * math.log2(c / n)), 6) for c in counts.values()
        )
        row = out[i]
        assert row["n_chars"] == n
        assert row["n_distinct_chars"] == len(counts)
        # 6-dp snap absorbs engine-log2 ulps except exactly on a rounding
        # boundary; allow one quantum per distinct char
        assert abs(row["entropy_bits"] - want) <= 1e-6 * (len(counts) + 1)
        assert row["top_char_share"] == max(counts.values()) / n
