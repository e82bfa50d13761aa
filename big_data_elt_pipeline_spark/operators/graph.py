"""Graph analytics over document/link relations: fixed-point PageRank.

Beyond-reference surface — the link-centrality signal web-corpus pipelines
use for quality weighting (OpenWebText's karma cut, CommonCrawl harmonic
centrality). Complements the connected-components pointer-jumping loop in
``dedup.neardup_clusters``.

Determinism contract (the whole point of the fixed-point form): ranks are
BIGINTs at scale ``RANK_SCALE`` and every update is integer arithmetic —
``contrib = rank DIV out_degree``, ``rank' = (15 * r_init) DIV 100 +
(85 * sum(contrib)) DIV 100`` — so addition is associative/commutative
and the result is bit-identical under ANY partitioning, join order, or
engine (DuckDB mirrors it with ``//``). A double-precision PageRank can
NOT be oracle-hashed: float sums reorder across partitions. The floor
divisions leak O(1) mass per node per round; that bias is part of the
operator's documented semantics, not an accuracy bug.

Scale shape: each round is one equi-join (ranks ⨝ edges on src) + one
partial-aggregated groupBy(dst) + one left join back to the node list for
zero-in-degree nodes. Pre-partition ``edges`` by src and the per-round
join reuses the exchange; the groupBy combiner collapses hot dst keys
map-side (a celebrity page with 10^8 in-links arrives at the reducer as
one partial per map task, not 10^8 rows). Rounds are a fixed small
constant (default 5) — lineage stays Catalyst-friendly without
checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000_000_000  # 1e12: ~12 significant digits of rank

# Synthetic-graph quadratic map (the test fixture; real deployments bring
# their own edge list). dst_j(v) = (v*v + j*v + j*j) mod N for j=1..3 —
# non-affine, so in-degree is non-uniform (an affine map mod N would be a
# permutation and every node would have identical rank). v*v bounds the
# generator at N < ~3e9 before int64 overflow; the pagerank operator
# itself has no such bound.
FANOUT = 3


def synthetic_links(nodes: DataFrame, node_col: str = "node") -> DataFrame:
    """(src, dst) edge fixture: FANOUT quadratic-map out-edges per node.
    Self-loops possible and allowed (documented PageRank semantics)."""
    n = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    v = F.col(node_col).cast("long")
    edges = None
    for j in range(1, FANOUT + 1):
        e = nodes.crossJoin(n).select(
            v.alias("src"),
            ((v * v + F.lit(j) * v + F.lit(j * j)) % F.col("n")).alias("dst"),
        )
        edges = e if edges is None else edges.unionAll(e)
    return edges


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    node_col: str = "node",
) -> DataFrame:
    """(node, rank_scaled, rank): ``iters`` rounds of damped PageRank in
    pure bigint fixed-point (see module docstring for the exact update
    rule and why it is the only oracle-hashable form).

    Dangling nodes (no out-edges) simply donate nothing — the standard
    "dangling mass is dropped" simplification; with the damping base term
    every node keeps a rank floor.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").select("src", "dst", "deg")
    ed = ed.repartition(ed.sparkSession.sparkContext.defaultParallelism, "src")
    ed.persist()

    n_nodes = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n")))
    # DIV (not `/` + cast): `/` is IEEE double division, which can round a
    # .999… quotient UP across an integer boundary — DIV is exact bigint
    # floor division in both Spark and DuckDB (`//`)
    base = nodes.crossJoin(n_nodes).select(
        F.col(node_col).cast("long").alias("node"),
        F.expr(f"CAST({RANK_SCALE} AS BIGINT) DIV n").alias("r_init"),
    )
    base.persist()

    ranks = base.select("node", F.col("r_init").alias("r"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("r DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("insum"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .select(
                "node",
                F.expr(
                    "(15 * r_init) DIV 100 + (85 * coalesce(insum, 0)) DIV 100"
                ).alias("r"),
            )
        )
    out = ranks.select(
        "node",
        F.col("r").alias("rank_scaled"),
        (F.col("r").cast("double") / F.lit(float(RANK_SCALE))).alias("rank"),
    )
    return out
