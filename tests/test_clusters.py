"""Connected-component cluster resolution over near-dup pairs.

The operator must reproduce exact transitive closure semantics: chains
collapse end-to-end, triangles stay one cluster, separate components stay
separate, and the canonical is always the component-min id. A 64-node path
pins the pointer-jumping convergence guarantee (O(log d) rounds — the
default max_iter would be exceeded by plain propagation on this graph if
the doubling hop were broken).
"""

import pytest

from big_data_elt_pipeline_spark.operators.dedup import neardup_clusters


def _run(spark, pairs):
    sdf = spark.createDataFrame(pairs, "id1 long, id2 long")
    rows = neardup_clusters(sdf).collect()
    return {int(r.doc_id): (int(r.cluster_id), int(r.cluster_size), bool(r.is_canonical)) for r in rows}


def test_chain_triangle_and_separate_components(spark):
    pairs = [
        # chain 1-2-3-4-5 given as out-of-order pairs
        (2, 3), (1, 2), (4, 5), (3, 4),
        # triangle (redundant edges must not double-count the cluster)
        (20, 21), (21, 22), (20, 22),
        # isolated pair
        (10, 11),
    ]
    got = _run(spark, pairs)
    assert got == {
        1: (1, 5, True), 2: (1, 5, False), 3: (1, 5, False), 4: (1, 5, False), 5: (1, 5, False),
        20: (20, 3, True), 21: (20, 3, False), 22: (20, 3, False),
        10: (10, 2, True), 11: (10, 2, False),
    }


def test_long_path_converges_logarithmically(spark):
    # worst case for plain min propagation: a 64-hop path whose min sits at
    # one end. Pointer jumping must converge well inside max_iter.
    n = 65
    pairs = [(i + 1, i) for i in range(1, n)]  # reversed orientation too
    got = _run(spark, pairs)
    assert set(got) == set(range(1, n + 1))
    for node, (cid, size, canon) in got.items():
        assert cid == 1 and size == n and canon == (node == 1)


def test_empty_pairs_yield_empty_clusters(spark):
    sdf = spark.createDataFrame([], "id1 long, id2 long")
    assert neardup_clusters(sdf).count() == 0


def test_nonconvergence_guard_raises(spark):
    sdf = spark.createDataFrame([(i + 1, i) for i in range(1, 40)], "id1 long, id2 long")
    with pytest.raises(RuntimeError, match="did not converge"):
        neardup_clusters(sdf, max_iter=1)
