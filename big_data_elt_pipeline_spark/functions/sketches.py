"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark's
built-in ``hll_sketch_agg`` family) — the 100 TB pattern this module exists
for is PERSIST-THEN-MERGE:

build per-partition (e.g. per-day, per-month) sketches ONCE, store the
binary sketch column next to the rollup, and answer any later
distinct-count question — arbitrary date ranges, region unions, cumulative
curves — by MERGING stored kilobyte sketches instead of rescanning the
fact table. Distinct counts don't sum (|A ∪ B| != |A| + |B|), so without
sketches every new range is a full shuffle of raw keys; with them it is a
metadata-sized aggregation. HLL union is lossless for HLL state: the
merged sketch's registers are the pairwise max, so merge(sketch(A),
sketch(B)) == sketch(A ∪ B) EXACTLY — re-merging stored sketches gives
bit-identical estimates to a from-scratch build over the union (pinned in
tests/test_sketches.py).

All aggregates here are JVM-side and map-side combinable: one shuffle of
(group, register-state), never of raw values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# log2 of HLL register count. 12 → 4096 registers ≈ 1.6 kB per sketch and
# ~1.6% relative standard error — the storage/accuracy trade documented by
# DataSketches; callers override per column cardinality.
DEFAULT_LG_K = 12


def distinct_sketch(value_col: str | Column, lg_k: int = DEFAULT_LG_K) -> Column:
    """Aggregate expression: binary HLL sketch of the column's distincts."""
    return F.hll_sketch_agg(value_col, F.lit(lg_k))


def build_sketch_table(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """One sketch row per group: (group_cols..., sketch, n_rows).

    This is the relation a lakehouse gold table would persist alongside
    its additive measures — the row count merges by SUM, the distinct
    count by ``merge_sketches``.
    """
    return df.groupBy(*group_cols).agg(
        distinct_sketch(value_col, lg_k).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def estimate(sketch_col: str | Column = "sketch") -> Column:
    """Point estimate (long) from a sketch column."""
    return F.hll_sketch_estimate(sketch_col)


def merge_sketches(
    sketches: DataFrame, group_cols: list[str] | None = None, sketch_col: str = "sketch"
) -> DataFrame:
    """Union stored sketches — to one row (group_cols=None) or a coarser
    grouping. ``allowDifferentLgConfigK`` stays False: silently unioning
    sketches built at different precisions is a data bug, not a merge."""
    agg = F.hll_union_agg(sketch_col, F.lit(False)).alias(sketch_col)
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)
