"""SCD Type-2 dimension maintenance (slowly-changing dimensions).

MERGE INTO needs Delta/Iceberg (jars absent here); the same semantics are
expressible with pure DataFrame ops — the documented emulation pattern:

  1. changed  = updates ⋈ current-open rows where any tracked column differs
  2. close    = current-open rows with a match → ``valid_to = effective_ts``
  3. insert   = changed/new update rows opened at ``effective_ts``
  4. result   = untouched ∪ closed ∪ inserted

One shuffle on the business key. At 100 TB the dimension is still
dimension-sized; the pattern's cost center is the key join, which AQE
broadcasts when the update wave is small.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# open-row sentinel: NOT 9999-12-31 — that overflows pandas/Arrow ns
# timestamps on collect; 2261-12-31 is the largest round date inside range
OPEN_END = dt.datetime(2261, 12, 31)


def scd2_init(snapshot: DataFrame, key: str, effective_ts: dt.datetime) -> DataFrame:
    """Open an initial history from a snapshot."""
    return snapshot.withColumn("valid_from", F.lit(effective_ts)).withColumn(
        "valid_to", F.lit(OPEN_END)
    ).withColumn("is_current", F.lit(True))


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_ts: dt.datetime,
) -> DataFrame:
    """Fold one update wave into the history (see module docstring).

    Cost note for multi-wave callers: each call builds its plan ON TOP of
    the previous history's plan, so folding N waves in one unbroken
    lineage pays every wave's joins again at the final action (the
    ``scd2_merge`` bench exhibit does exactly this over an inline VALUES
    fixture — its 79-exchange audit is N commits' worth of plans, not one
    merge's). Production callers should materialize between waves: write
    the history to a table (or ``localCheckpoint``) after each merge and
    read it back, so wave k+1 starts from a scan, not a k-deep plan.
    """
    open_rows = history.filter(F.col("is_current"))
    closed_rows = history.filter(~F.col("is_current"))

    u = updates.select(key, *tracked)
    # explicit match marker: inferring a join hit from tracked[0].isNotNull()
    # would silently drop an update whose first tracked column is
    # legitimately NULL (e.g. clearing an email)
    joined = open_rows.alias("c").join(
        u.withColumn("__hit", F.lit(True)).alias("u"), key, "left"
    )
    diff = F.lit(False)
    for c in tracked:
        diff = diff | ~F.col(f"u.{c}").eqNullSafe(F.col(f"c.{c}"))
    has_update = F.col("u.__hit").isNotNull()
    # rows whose tracked payload changed in this wave
    changed_keys = (
        joined.filter(has_update & diff).select(F.col(f"c.{key}").alias(key))
    )

    to_close = (
        open_rows.join(changed_keys, key, "left_semi")
        .withColumn("valid_to", F.lit(effective_ts))
        .withColumn("is_current", F.lit(False))
    )
    untouched_open = open_rows.join(changed_keys, key, "left_anti")

    new_keys = u.join(open_rows.select(key), key, "left_anti").select(key)
    to_insert = (
        u.join(changed_keys.unionByName(new_keys).distinct(), key, "left_semi")
        .withColumn("valid_from", F.lit(effective_ts))
        .withColumn("valid_to", F.lit(OPEN_END))
        .withColumn("is_current", F.lit(True))
    )
    return (
        closed_rows.unionByName(to_close)
        .unionByName(untouched_open)
        .unionByName(to_insert.select(*closed_rows.columns))
    )
